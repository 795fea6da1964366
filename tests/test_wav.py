"""Pure-numpy WAV codec: round-trips, conformance vs the stdlib
``wave`` module (the independent reference, same role libwebp plays
for vp8.py), container robustness, and error handling. No Ray."""

from __future__ import annotations

import io
import struct
import wave as stdlib_wave

import numpy as np
import pytest

from ocrs_ray.wav import WavError, decode_wav, encode_wav, normalize_samples


def _tone(n: int, ch: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)[:, None]
    f = rng.uniform(0.01, 0.2, size=ch)[None, :]
    return np.sin(2 * np.pi * f * t) * rng.uniform(0.2, 0.9)


@pytest.mark.parametrize(
    "dtype,bits",
    [("u1", None), ("i2", None), ("i4", 24), ("i4", None), ("f4", None), ("f8", None)],
)
@pytest.mark.parametrize("ch", [1, 2])
def test_roundtrip_exact(dtype, bits, ch):
    x = _tone(473, ch)
    if dtype == "u1":
        s = np.clip((x * 127 + 128).round(), 0, 255).astype(np.uint8)
    elif dtype == "i2":
        s = np.clip((x * 32767).round(), -32768, 32767).astype(np.int16)
    elif dtype == "i4" and bits == 24:
        s = np.clip((x * ((1 << 23) - 1)).round(), -(1 << 23), (1 << 23) - 1).astype(np.int32)
    elif dtype == "i4":
        s = (x * ((1 << 30))).round().astype(np.int32)
    else:
        s = x.astype(dtype)
    blob = encode_wav(s, 16000, bits=bits)
    out, rate, got_bits = decode_wav(blob)
    assert rate == 16000
    assert out.shape == s.shape
    assert out.dtype == s.dtype
    np.testing.assert_array_equal(out, s)
    if bits == 24:
        assert got_bits == 24


@pytest.mark.parametrize("sampwidth", [1, 2, 3, 4])
@pytest.mark.parametrize("ch", [1, 2])
def test_decode_matches_stdlib_wave_writer(sampwidth, ch):
    """Decode streams written by the stdlib wave module (independent
    RIFF writer) — byte-level conformance of the parser."""
    n = 301
    rng = np.random.default_rng(sampwidth * 10 + ch)
    if sampwidth == 1:
        s = rng.integers(0, 256, size=(n, ch)).astype(np.uint8)
        raw = s.tobytes()
    elif sampwidth == 2:
        s = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
        raw = s.astype("<i2").tobytes()
    elif sampwidth == 3:
        s = rng.integers(-(1 << 23), 1 << 23, size=(n, ch)).astype(np.int32)
        b = s.astype("<i4").ravel().view(np.uint8).reshape(-1, 4)
        raw = np.ascontiguousarray(b[:, :3]).tobytes()
    else:
        s = rng.integers(-(1 << 31), 1 << 31, size=(n, ch)).astype(np.int64).astype(np.int32)
        raw = s.astype("<i4").tobytes()
    buf = io.BytesIO()
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sampwidth)
        w.setframerate(8000)
        w.writeframes(raw)
    out, rate, bits = decode_wav(buf.getvalue())
    assert (rate, bits) == (8000, sampwidth * 8)
    np.testing.assert_array_equal(out, s)


@pytest.mark.parametrize("sampwidth", [1, 2, 4])
def test_stdlib_wave_reads_our_encoder(sampwidth):
    """The stdlib reader accepts our encoder's output and returns the
    same frames (writer-side conformance)."""
    n, ch = 200, 2
    rng = np.random.default_rng(3)
    if sampwidth == 1:
        s = rng.integers(0, 256, size=(n, ch)).astype(np.uint8)
        want = s.tobytes()
    elif sampwidth == 2:
        s = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
        want = s.astype("<i2").tobytes()
    else:
        s = rng.integers(-(1 << 31), 1 << 31, size=(n, ch)).astype(np.int64).astype(np.int32)
        want = s.astype("<i4").tobytes()
    blob = encode_wav(s, 44100)
    with stdlib_wave.open(io.BytesIO(blob), "rb") as r:
        assert r.getnchannels() == ch
        assert r.getsampwidth() == sampwidth
        assert r.getframerate() == 44100
        assert r.readframes(r.getnframes()) == want


def test_extensible_format_and_unknown_chunks():
    """WAVE_FORMAT_EXTENSIBLE wrapping PCM16, with a LIST chunk before
    fmt and an odd-sized junk chunk (pad byte) before data."""
    s = np.array([[100, -200], [300, -400], [500, -600]], dtype=np.int16)
    rate, ch, bits = 22050, 2, 16
    block = ch * bits // 8
    guid = struct.pack("<H", 1) + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt = struct.pack(
        "<HHIIHHHHI", 0xFFFE, ch, rate, rate * block, block, bits, 22, bits, 3
    ) + guid
    payload = s.astype("<i2").tobytes()
    chunks = (
        b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"junk" + struct.pack("<I", 3) + b"ab\x00" + b"\x00"  # odd size + pad
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    out, got_rate, got_bits = decode_wav(blob)
    assert (got_rate, got_bits) == (rate, bits)
    np.testing.assert_array_equal(out, s)


def test_truncated_data_chunk_keeps_whole_frames():
    s = np.arange(20, dtype=np.int16).reshape(10, 2)
    blob = encode_wav(s, 8000)
    cut = blob[:-7]  # drop 3.5 frames' worth of bytes
    out, _, _ = decode_wav(cut)
    np.testing.assert_array_equal(out, s[: out.shape[0]])
    assert out.shape[0] == 8


def test_ieee_float_roundtrip_via_normalize():
    x = _tone(128, 1).astype(np.float32)
    out, _, bits = decode_wav(encode_wav(x, 48000))
    np.testing.assert_array_equal(out, x)
    np.testing.assert_allclose(
        normalize_samples(out, bits), x.astype(np.float64), rtol=0, atol=0
    )


def test_normalize_ranges():
    assert normalize_samples(np.array([0, 128, 255], dtype=np.uint8)).tolist() == [
        -1.0, 0.0, 127 / 128,
    ]
    assert normalize_samples(np.array([-32768, 0], dtype=np.int16)).tolist() == [-1.0, 0.0]
    assert normalize_samples(np.array([-(1 << 23)], dtype=np.int32), bits=24).tolist() == [-1.0]


def test_errors():
    with pytest.raises(WavError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(WavError):
        decode_wav(b"not a wav at all")
    # missing data chunk
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    with pytest.raises(WavError, match="data"):
        decode_wav(blob)
    # compressed (ADPCM) tag rejected loudly
    fmt2 = struct.pack("<HHIIHH", 2, 1, 8000, 16000, 2, 4)
    blob2 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt2) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt2)) + fmt2
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(WavError, match="wFormatTag"):
        decode_wav(blob2)
    # 24-bit range check
    encode_wav(np.zeros((4, 1), dtype=np.int32), 8000, bits=24)  # fits
    with pytest.raises(WavError, match="24-bit"):
        encode_wav(np.full((4, 1), 1 << 23, dtype=np.int32), 8000, bits=24)
