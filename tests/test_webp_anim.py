"""Animated WebP (VP8X + ANIM/ANMF) compositor tests.

The compositor targets libwebp's WebPAnimDecoder semantics
(demux/anim_decode.c): transparent canvas init, dispose-to-background
zero-fills the previous frame's rect, non-premultiplied integer alpha
blending. No libwebpdemux exists in this sandbox, so conformance is
pinned by (a) an INDEPENDENT per-pixel Python compositor implementing
the same published integer formulas, run against our own muxer's
lossless containers (frame decode itself is libwebp-bit-exact, see
test_vp8.py / test_webp.py), and (b) hand-assembled containers
exercising the ALPH-in-ANMF and lossy-VP8-in-ANMF payload shapes.

Reference parity: the `image` crate the reference decodes with
(/root/reference/ocrs-cli/src/main.rs:312-323) returns the FIRST frame
of an animation from its standard decode path; `decode_webp` does the
same, with `decode_webp_frames` exposing the full sequence.
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from ocrs_ray.webp import (
    decode_webp,
    decode_webp_frames,
    encode_webp_anim,
    encode_vp8l,
)


def _blend_px(dst, src):
    """Independent scalar reimplementation of anim_decode.c's
    BlendPixelRowNonPremult (floor division throughout)."""
    sa, da = int(src[3]), int(dst[3])
    if sa == 0:
        return dst.copy()
    scale = (da * (255 - sa)) // 255
    ba = sa + scale
    out = np.empty(4, dtype=np.uint8)
    for c in range(3):
        out[c] = (int(src[c]) * sa + int(dst[c]) * scale) // ba
    out[3] = ba
    return out


def _composite_reference(canvas_size, frames, offsets, blend, dispose):
    """Per-pixel oracle compositor (independent of the numpy one)."""
    cw, ch = canvas_size
    canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
    snaps = []
    prev = None
    for img, (x, y), bl, dis in zip(frames, offsets, blend, dispose):
        if prev is not None:
            (px, py, pw, ph), pdis = prev
            if pdis:
                canvas[py : py + ph, px : px + pw] = 0
        if img.shape[2] == 3:
            img = np.dstack([img, np.full(img.shape[:2] + (1,), 255, np.uint8)])
        fh, fw = img.shape[:2]
        for yy in range(fh):
            for xx in range(fw):
                if bl:
                    canvas[y + yy, x + xx] = _blend_px(canvas[y + yy, x + xx], img[yy, xx])
                else:
                    canvas[y + yy, x + xx] = img[yy, xx]
        snaps.append(canvas.copy())
        prev = ((x, y, fw, fh), dis)
    return snaps


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_roundtrip_matches_independent_compositor(seed):
    rng = np.random.default_rng(seed)
    n = 4
    frames, offsets, blend, dispose, durs = [], [], [], [], []
    for i in range(n):
        h, w = int(rng.integers(3, 14)), int(rng.integers(3, 14))
        c = 4 if rng.integers(0, 2) else 3
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
        if c == 4:
            # force the src_alpha == 0 and mid-alpha branches
            img[0, 0, 3] = 0
            img[-1, -1, 3] = 128
        frames.append(img)
        offsets.append((2 * int(rng.integers(0, 6)), 2 * int(rng.integers(0, 6))))
        blend.append(bool(rng.integers(0, 2)))
        dispose.append(bool(rng.integers(0, 2)))
        durs.append(int(rng.integers(10, 200)))
    cw = max(x + f.shape[1] for (x, _), f in zip(offsets, frames))
    ch = max(y + f.shape[0] for (_, y), f in zip(offsets, frames))
    blob = encode_webp_anim(
        frames, durs, offsets=offsets, blend=blend, dispose=dispose, canvas_size=(cw, ch)
    )
    got = decode_webp_frames(blob)
    exp = _composite_reference((cw, ch), frames, offsets, blend, dispose)
    assert len(got) == n
    for (canvas, dur), exp_canvas, exp_dur in zip(got, exp, durs):
        assert dur == exp_dur
        np.testing.assert_array_equal(canvas, exp_canvas)


def test_decode_webp_returns_first_composited_frame():
    f0 = np.full((6, 8, 3), 40, dtype=np.uint8)
    f1 = np.full((4, 4, 3), 200, dtype=np.uint8)
    blob = encode_webp_anim([f0, f1], [10, 10], offsets=[(0, 0), (2, 2)])
    first = decode_webp(blob)
    frames = decode_webp_frames(blob)
    np.testing.assert_array_equal(first, frames[0][0])
    # opaque frame over transparent canvas composites to itself + a=255
    np.testing.assert_array_equal(first[:, :, :3], f0)
    assert np.all(first[:, :, 3] == 255)
    assert len(frames) == 2


def test_decode_media_routes_animated_webp():
    from ocrs_ray.pipeline import decode_media

    f0 = np.full((5, 5, 3), 9, dtype=np.uint8)
    blob = encode_webp_anim([f0, f0 + 1], [10, 10])
    out = decode_media((blob, 5, 5, 4, "webp"))
    np.testing.assert_array_equal(out[:, :, :3], f0)


def test_lossy_vp8_frames_in_anmf():
    from ocrs_ray.vp8 import decode_vp8, encode_vp8

    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack([(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=2).astype(
        np.uint8
    )
    blob = encode_webp_anim([img, img[:16, :16]], [30, 30], offsets=[(0, 0), (8, 4)], lossy_q=20)
    frames = decode_webp_frames(blob)
    ref = decode_vp8(encode_vp8(img, q_index=20))
    np.testing.assert_array_equal(frames[0][0][:, :, :3], ref)
    assert np.all(frames[0][0][:, :, 3] == 255)


def test_alph_in_anmf_decodes_rgba():
    """Hand-assembled ANMF carrying ALPH (raw, unfiltered) + VP8."""
    from ocrs_ray.vp8 import decode_vp8, encode_vp8

    img = np.full((16, 16, 3), 90, dtype=np.uint8)
    vp8_payload = encode_vp8(img, q_index=10)
    alpha = (np.arange(256, dtype=np.uint8) % 200).reshape(16, 16)
    alph_payload = bytes([0]) + alpha.tobytes()

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    head = (0).to_bytes(3, "little") * 2
    head += (15).to_bytes(3, "little") * 2 + (25).to_bytes(3, "little") + bytes([0x02])
    anmf = head + chunk(b"ALPH", alph_payload) + chunk(b"VP8 ", vp8_payload)
    vp8x = bytes([0x12]) + b"\x00\x00\x00" + (15).to_bytes(3, "little") * 2
    anim = bytes([0, 0, 0, 0]) + struct.pack("<H", 0)
    body = chunk(b"VP8X", vp8x) + chunk(b"ANIM", anim) + chunk(b"ANMF", anmf)
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body

    frames = decode_webp_frames(blob)
    assert len(frames) == 1
    canvas = frames[0][0]
    np.testing.assert_array_equal(canvas[:, :, :3], decode_vp8(vp8_payload))
    np.testing.assert_array_equal(canvas[:, :, 3], alpha)


def test_container_gates():
    f = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="even"):
        encode_webp_anim([f], [10], offsets=[(1, 0)])
    with pytest.raises(ValueError, match="canvas"):
        encode_webp_anim([f], [10], canvas_size=(2, 2))
    # decoder-side rect check on a tampered container
    blob = bytearray(encode_webp_anim([f, f], [10, 10], canvas_size=(4, 4)))
    idx = blob.find(b"ANMF") + 8
    blob[idx : idx + 3] = (3).to_bytes(3, "little")  # x = 6 > canvas
    with pytest.raises(ValueError, match="exceeds"):
        decode_webp_frames(bytes(blob))


def test_still_webp_is_single_frame():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    blob = b"RIFF" + b"\x00\x00\x00\x00" + b"WEBP"
    payload = encode_vp8l(img)
    blob = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(payload) + (len(payload) & 1))
        + b"WEBP"
        + b"VP8L"
        + struct.pack("<I", len(payload))
        + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    frames = decode_webp_frames(blob)
    assert len(frames) == 1 and frames[0][1] == 0
    np.testing.assert_array_equal(frames[0][0][:, :, :3], img)


def test_video_frame_sampler_animated_webp():
    """The multimodal video sampler decodes animated WebP for real and
    samples evenly — called directly on an Arrow batch (no Ray)."""
    from ocrs_ray.ops.multimodal import VideoFrameSampler

    frames_in = [np.full((6, 6, 3), 10 * i, dtype=np.uint8) for i in range(5)]
    blob = encode_webp_anim(frames_in, [20] * 5)
    batch = pa.table(
        {
            "media_ref": pa.array(["m1"]),
            "image": pa.array([blob], type=pa.binary()),
            "height": pa.array([6], type=pa.int32()),
            "width": pa.array([6], type=pa.int32()),
            "channels": pa.array([4], type=pa.int32()),
            "format": pa.array(["webp"]),
        }
    )
    out = VideoFrameSampler(n_frames=3)(batch)
    assert out.column("frame_index").to_pylist() == [0, 1, 2]
    picks = [0, 2, 4]  # linspace(0, 4, 3)
    for row, pick in enumerate(picks):
        frame = np.frombuffer(out.column("frame")[row].as_py(), dtype=np.uint8).reshape(
            6, 6, 4
        )
        np.testing.assert_array_equal(frame[:, :, :3], frames_in[pick])
