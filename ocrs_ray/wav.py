"""Pure-numpy RIFF/WAVE (WAV) codec.

Decode and encode of uncompressed WAV audio — the audio-side analog of
the repo's pure-numpy png/jpeg/webp codecs, closing the last multimodal
modality with a real implementation (the container has no audio
libraries; the stdlib ``wave`` module is used only in tests as an
independent conformance reference, the way libwebp pins ``vp8.py``).

Format coverage (RIFF spec + Microsoft WAVEFORMATEX docs):

- PCM (wFormatTag=1): unsigned 8-bit, signed 16/24/32-bit little-endian
- IEEE float (wFormatTag=3): float32 and float64
- WAVE_FORMAT_EXTENSIBLE (wFormatTag=0xFFFE) wrapping either, with the
  SubFormat GUID resolved from the fmt extension
- arbitrary chunk order; unknown chunks (LIST, fact, cue, ...) skipped;
  odd-sized chunks consume their RIFF pad byte
- a truncated final ``data`` chunk (size beyond EOF, common in streamed
  captures) decodes the frames actually present

Decoded samples are returned as an (n_frames, n_channels) numpy array
in the container's native dtype (u8 / i16 / i32 / f32 / f64; 24-bit
widens to i32 with the value range of 24 bits). ``normalize_samples``
maps any of those to float64 in [-1, 1) with the conventional
full-scale divisors — the canonical representation the feature ops and
the corpus goldens share.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav", "normalize_samples", "WavError"]

_PCM = 1
_IEEE_FLOAT = 3
_EXTENSIBLE = 0xFFFE

# SubFormat GUIDs: wFormatTag mapped into the standard Microsoft GUID
# namespace {XXXXXXXX-0000-0010-8000-00AA00389B71}.
_GUID_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


class WavError(ValueError):
    pass


def _pcm_dtype(bits: int) -> np.dtype:
    if bits == 8:
        return np.dtype("u1")
    if bits == 16:
        return np.dtype("<i2")
    if bits in (24, 32):
        return np.dtype("<i4")
    raise WavError(f"unsupported PCM bit depth {bits}")


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """Parse a RIFF/WAVE byte string -> (samples, sample_rate, bits).

    ``samples`` is (n_frames, n_channels) in the native container dtype
    (see module docstring); ``bits`` is the container bit depth (needed
    to normalize PCM24, which widens to i32). Raises WavError on
    malformed input.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise WavError("fmt chunk too short")
            tag, n_ch, rate, _bps, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag == _EXTENSIBLE:
                if len(body) < 40:
                    raise WavError("extensible fmt chunk too short")
                # cbSize(2) wValidBits(2) dwChannelMask(4) SubFormat(16)
                sub = body[24:40]
                if sub[2:] != _GUID_TAIL:
                    raise WavError("unknown SubFormat GUID namespace")
                tag = struct.unpack_from("<H", sub, 0)[0]
            fmt = (tag, n_ch, rate, bits)
        elif cid == b"data":
            # Truncated data chunk (size beyond EOF): keep what exists.
            raw = body
        # Chunks are word-aligned: odd sizes carry one pad byte.
        pos += 8 + size + (size & 1)
    if fmt is None:
        raise WavError("missing fmt chunk")
    if raw is None:
        raise WavError("missing data chunk")
    tag, n_ch, rate, bits = fmt
    if n_ch < 1:
        raise WavError("channel count must be >= 1")
    if rate < 1:
        raise WavError("sample rate must be >= 1")
    if tag == _PCM:
        if bits == 24:
            frame_bytes = 3 * n_ch
            n_frames = len(raw) // frame_bytes
            b = np.frombuffer(
                raw[: n_frames * frame_bytes], dtype=np.uint8
            ).reshape(-1, 3)
            # sign-extend 24 -> 32 via the top byte's sign
            vals = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int8).astype(np.int32) << 16)
            )
            return vals.reshape(n_frames, n_ch), rate, 24
        dt = _pcm_dtype(bits)
    elif tag == _IEEE_FLOAT:
        if bits == 32:
            dt = np.dtype("<f4")
        elif bits == 64:
            dt = np.dtype("<f8")
        else:
            raise WavError(f"unsupported IEEE float bit depth {bits}")
    else:
        raise WavError(f"unsupported wFormatTag {tag} (compressed WAV?)")
    frame_bytes = dt.itemsize * n_ch
    n_frames = len(raw) // frame_bytes
    samples = np.frombuffer(raw[: n_frames * frame_bytes], dtype=dt)
    return samples.reshape(n_frames, n_ch).copy(), rate, bits


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int | None = None
) -> bytes:
    """Encode (n_frames, n_channels) samples to canonical RIFF/WAVE.

    dtype selects the container format: u1 -> PCM8, i2 -> PCM16,
    i4 -> PCM32 (or PCM24 with bits=24; values must fit 24 bits),
    f4/f8 -> IEEE float. decode_wav(encode_wav(x)) == x exactly.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise WavError("samples must be (n_frames, n_channels)")
    n_frames, n_ch = samples.shape
    dt = samples.dtype
    if dt == np.uint8:
        tag, bits_out, payload = _PCM, 8, samples.tobytes()
    elif dt == np.int16:
        tag, bits_out = _PCM, 16
        payload = samples.astype("<i2").tobytes()
    elif dt == np.int32 and bits == 24:
        lo = int(samples.min()) if samples.size else 0
        hi = int(samples.max()) if samples.size else 0
        if lo < -(1 << 23) or hi >= (1 << 23):
            raise WavError("samples exceed 24-bit range")
        tag, bits_out = _PCM, 24
        flat = samples.astype("<i4").ravel()
        b = flat.view(np.uint8).reshape(-1, 4)
        payload = np.ascontiguousarray(b[:, :3]).tobytes()
    elif dt == np.int32:
        tag, bits_out = _PCM, 32
        payload = samples.astype("<i4").tobytes()
    elif dt == np.float32:
        tag, bits_out = _IEEE_FLOAT, 32
        payload = samples.astype("<f4").tobytes()
    elif dt == np.float64:
        tag, bits_out = _IEEE_FLOAT, 64
        payload = samples.astype("<f8").tobytes()
    else:
        raise WavError(f"unsupported sample dtype {dt}")
    block = n_ch * (bits_out // 8)
    fmt = struct.pack(
        "<HHIIHH", tag, n_ch, sample_rate, sample_rate * block, block, bits_out
    )
    chunks = b"".join(
        [
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(payload)),
            payload,
            b"\x00" * (len(payload) & 1),
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


_FULL_SCALE = {
    8: 128.0,  # u8 is offset-binary: (x - 128) / 128
    16: 32768.0,
    24: float(1 << 23),
    32: float(1 << 31),
}


def normalize_samples(samples: np.ndarray, bits: int | None = None) -> np.ndarray:
    """Canonical float64 representation in [-1, 1): PCM divides by its
    full scale (u8 recentres at 128); float passes through. ``bits``
    disambiguates i32 holding 24-bit values (decode_wav widens PCM24)."""
    dt = samples.dtype
    if dt == np.uint8:
        return (samples.astype(np.float64) - 128.0) / _FULL_SCALE[8]
    if dt == np.int16:
        return samples.astype(np.float64) / _FULL_SCALE[16]
    if dt == np.int32:
        return samples.astype(np.float64) / _FULL_SCALE[bits or 32]
    if dt in (np.float32, np.float64):
        return samples.astype(np.float64)
    raise WavError(f"unsupported sample dtype {dt}")
