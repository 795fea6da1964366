"""Lossy VP8 (WebP) codec tests — RFC 6386 keyframe decode + the
intra-only encoder.

Conformance strategy (no network, no Python imaging libs):
- A REAL libwebp-encoded lossy+alpha WebP (CPython's test-suite
  python.webp, 432 bytes) is embedded below; its decoded planes are
  pinned to hashes produced by libwebp's own decoder. Arithmetic
  coding desyncs on any wrong probability constant, so a bit-exact
  decode certifies every table entry on the stream's path.
- When the system libwebp shared library is present (ctypes), a
  conformance sweep encodes fresh images through libwebp (simple and
  advanced APIs: segments, multiple token partitions, simple/strong
  loop filters, sharpness) and requires OUR decode to be bit-identical
  to WebPDecodeYUV/RGB; our encoder's streams are cross-decoded by
  libwebp and must match our own decoder pixel-for-pixel.

No Ray needed — pure kernel tests.
"""

from __future__ import annotations

import base64
import ctypes
import ctypes.util
import hashlib
import random

import numpy as np
import pytest

from ocrs_ray import vp8
from ocrs_ray.webp import decode_alpha, decode_webp

# CPython test-suite python.webp (VP8X + ALPH + lossy VP8, 16x16),
# produced by real libwebp — the embedded conformance fixture.
FIXTURE_WEBP = base64.b64decode(
    "UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucYX+ff"
    "KpmImP90cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2bUYvTsZ2"
    "PLbtd/uvKa4hov9J0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGDtxoynjaCfx0p"
    "fk52CPuInrOR75lzRugygtv4zEiy90UwfSD9NheMITJWLaXWayO8XeOlWRXVnIGk2W6W"
    "dYoYMQ+KqixQNPowgt+6a1BSKbUtz+lUFAoBAAAAVlA4IL4AAACQAgCdASoQABAAAwA0"
    "JbACdDBPCIUMfAMdCCz96AD+/XSg/QKbH4r3Q3ycN/bSDK/T/zVo4u6nvclvG/SqxWOu"
    "up+XhN9BojvaW+Tv+MvxvX/hr/o/5Qns9LtmX/+qKdl/yWznhuasl7nkxvSTI4xf3Y85"
    "VSB/lU/8Ofj/b9JrA+ifvIOYZm2x1RP/dhfmsf5diuSfR7+z+r/+HR3zEo/+XM/B+vkY"
    "w73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA"
)


def _fixture_vp8_chunk() -> bytes:
    d = FIXTURE_WEBP
    pos = 12
    while pos + 8 <= len(d):
        tag = d[pos : pos + 4]
        size = int.from_bytes(d[pos + 4 : pos + 8], "little")
        if tag == b"VP8 ":
            return d[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("fixture missing VP8 chunk")


def _libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


LIBWEBP = _libwebp()
needs_libwebp = pytest.mark.skipif(
    LIBWEBP is None, reason="system libwebp not available"
)


# ---------------------------------------------------------------------------
# boolean coder
# ---------------------------------------------------------------------------


def test_bool_coder_roundtrip_random():
    rng = random.Random(7)
    for _ in range(100):
        seq = [(rng.randint(1, 254), rng.randint(0, 1))
               for _ in range(rng.randint(1, 500))]
        e = vp8.BoolEncoder()
        for p, b in seq:
            e.bool(p, b)
        d = vp8.BoolDecoder(e.finish())
        assert [d.bool(p) for p, _ in seq] == [b for _, b in seq]


def test_bool_coder_extreme_probs():
    # probs 1 and 255 stress renormalization + carry propagation
    seq = [(1, 1)] * 64 + [(255, 0)] * 64 + [(1, 0), (255, 1)] * 32
    e = vp8.BoolEncoder()
    for p, b in seq:
        e.bool(p, b)
    d = vp8.BoolDecoder(e.finish())
    assert [d.bool(p) for p, _ in seq] == [b for _, b in seq]


def test_literal_signed_tree_roundtrip():
    e = vp8.BoolEncoder()
    e.literal(7, 93)
    e.signed(4, -11)
    e.flagged_signed(6, 0)
    e.flagged_signed(6, 17)
    e.tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB, vp8.TM_PRED)
    e.tree(vp8.BMODE_TREE, vp8.KF_BMODE_PROB[3][7], vp8.B_HU_PRED)
    d = vp8.BoolDecoder(e.finish())
    assert d.literal(7) == 93
    assert d.signed(4) == -11
    assert d.flagged_signed(6) == 0
    assert d.flagged_signed(6) == 17
    assert d.tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROB) == vp8.TM_PRED
    assert d.tree(vp8.BMODE_TREE, vp8.KF_BMODE_PROB[3][7]) == vp8.B_HU_PRED


# ---------------------------------------------------------------------------
# transforms / token codec
# ---------------------------------------------------------------------------


def test_transform_inverse_pairs():
    rng = np.random.default_rng(0)
    for _ in range(30):
        b = rng.integers(-255, 256, (4, 4))
        assert np.abs(vp8.idct4x4(vp8.fdct4x4(b)) - b).max() <= 2
        assert np.abs(vp8.iwht4x4(vp8.fwht4x4(b)) - b).max() <= 2


def test_token_codec_roundtrip():
    rng = random.Random(3)
    probs = vp8.DEFAULT_COEFF_PROBS
    for _ in range(200):
        bt = rng.choice([0, 1, 2, 3])
        first = 1 if bt == 0 else 0
        ctx = rng.randint(0, 2)
        levels = np.zeros(16, dtype=np.int64)
        for _ in range(rng.randint(0, 16)):
            levels[rng.randint(0, 15)] = rng.choice(
                [1, -1, 2, -3, 4, 7, -15, 40, 300, -2000]
            )
        if first:
            levels[0] = 0
        be = vp8.BoolEncoder()
        vp8.encode_coeffs(be, probs, bt, first, ctx, levels)
        bd = vp8.BoolDecoder(be.finish())
        got, _ = vp8.decode_coeffs(bd, probs, bt, first, ctx, (1, 1))
        assert np.array_equal(got, levels)


# ---------------------------------------------------------------------------
# real-bitstream fixture conformance (works without libwebp: hashes
# below were produced by libwebp's own decoder on this stream)
# ---------------------------------------------------------------------------


def test_fixture_plane_decode_bit_exact():
    res = vp8.decode_frame(_fixture_vp8_chunk())
    assert (res.width, res.height) == (16, 16)
    assert res.mb_ymode[0, 0] == vp8.B_PRED
    y, u, v = res.planes()
    assert hashlib.md5(y.tobytes()).hexdigest() == "dfe4982372c6c01faa923c2d30af586d"
    assert hashlib.md5(u.tobytes()).hexdigest() == "5c048a58ac9d2fb87442e3c601232840"
    assert hashlib.md5(v.tobytes()).hexdigest() == "58be420aae529777874b3041d05200d9"


def test_fixture_container_rgba_bit_exact():
    rgba = decode_webp(FIXTURE_WEBP)
    assert rgba.shape == (16, 16, 4)
    assert (
        hashlib.md5(rgba.tobytes()).hexdigest()
        == "738a2f6e87d2928a79056d005b0f35a6"
    )


def test_animation_flag_without_frames_raises():
    # VP8X animation flag set but no ANMF frames: malformed, loud error
    # (full animation decode is covered in tests/test_webp_anim.py)
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + bytes([0x02] + [0] * 9)
    blob = b"RIFF" + (4 + len(vp8x)).to_bytes(4, "little") + b"WEBP" + vp8x
    with pytest.raises(ValueError, match="no ANMF frames"):
        decode_webp(blob)


def test_alpha_filters_roundtrip():
    # raw (uncompressed) ALPH payloads exercising all four filters:
    # filter the plane forward here, decode_alpha must invert exactly.
    rng = np.random.default_rng(4)
    plane = rng.integers(0, 256, (9, 7), dtype=np.uint8).astype(np.int64)
    h, w = plane.shape
    for filt in range(4):
        resid = np.zeros_like(plane)
        for y in range(h):
            for x in range(w):
                if filt == 0:
                    pred = 0
                elif y == 0 or filt == 1:
                    pred = 0 if (x == 0 and y == 0) else (
                        plane[y - 1, 0] if x == 0 else plane[y, x - 1]
                    )
                elif filt == 2:
                    pred = plane[y - 1, x]
                else:
                    left = plane[y, x - 1] if x else plane[y - 1, 0]
                    top = plane[y - 1, x]
                    tl = plane[y - 1, x - 1] if x else plane[y - 1, 0]
                    pred = min(255, max(0, int(left) + int(top) - int(tl)))
                resid[y, x] = (plane[y, x] - pred) & 0xFF
        payload = bytes([filt << 2]) + resid.astype(np.uint8).tobytes()
        out = decode_alpha(payload, w, h)
        assert np.array_equal(out, plane.astype(np.uint8)), filt


# ---------------------------------------------------------------------------
# our encoder round-trips
# ---------------------------------------------------------------------------


def _test_image(w: int, h: int) -> np.ndarray:
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         ((xx + yy) // 2) % 256], -1
    ).astype(np.uint8)
    img[h // 4 : h // 2, w // 4 : w // 2] = [200, 30, 60]
    return np.ascontiguousarray(img)


@pytest.mark.parametrize("w,h,q", [(32, 32, 8), (48, 36, 20), (16, 16, 40), (7, 5, 4)])
def test_encoder_self_roundtrip(w, h, q):
    img = _test_image(w, h)
    got = vp8.decode_vp8(vp8.encode_vp8(img, q_index=q))
    assert got.shape == img.shape
    mse = np.mean((got.astype(np.float64) - img.astype(np.float64)) ** 2)
    psnr = 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)
    assert psnr > 20.0, psnr


def test_encoder_container_roundtrip():
    img = _test_image(40, 24)
    blob = vp8.encode_webp_lossy(img, q_index=12)
    got = decode_webp(blob)
    assert got.shape == img.shape
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 20


# ---------------------------------------------------------------------------
# libwebp cross-validation (skipped when the system library is absent)
# ---------------------------------------------------------------------------


def _webp_encode_rgb(img: np.ndarray, q: float) -> bytes:
    LIBWEBP.WebPEncodeRGB.restype = ctypes.c_size_t
    LIBWEBP.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LIBWEBP.WebPEncodeRGB(
        img.tobytes(), img.shape[1], img.shape[0], img.shape[1] * 3,
        q, ctypes.byref(out),
    )
    assert n > 0
    return bytes(np.ctypeslib.as_array(out, (n,)))


def _webp_decode_yuv(data: bytes):
    LIBWEBP.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uvs = ctypes.c_int()
    yp = LIBWEBP.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v), ctypes.byref(stride),
        ctypes.byref(uvs),
    )
    W, H = w.value, h.value
    y = np.ctypeslib.as_array(yp, (H * stride.value,)).reshape(H, -1)[:, :W].copy()
    ch, cw = (H + 1) // 2, (W + 1) // 2
    uu = np.ctypeslib.as_array(u, (ch * uvs.value,)).reshape(ch, -1)[:, :cw].copy()
    vv = np.ctypeslib.as_array(v, (ch * uvs.value,)).reshape(ch, -1)[:, :cw].copy()
    return y, uu, vv


def _webp_decode_rgb(data: bytes):
    LIBWEBP.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = LIBWEBP.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p
    return np.ctypeslib.as_array(p, (h.value, w.value, 3)).copy()


def _extract_vp8(data: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if tag == b"VP8 ":
            return data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


@needs_libwebp
@pytest.mark.parametrize("q", [20.0, 75.0, 95.0])
def test_libwebp_conformance_sweep(q):
    rng = np.random.default_rng(42)
    cases = [_test_image(48, 32), _test_image(33, 17),
             rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)]
    for img in cases:
        data = _webp_encode_rgb(np.ascontiguousarray(img), q)
        ty, tu, tv = _webp_decode_yuv(data)
        res = vp8.decode_frame(_extract_vp8(data))
        y, u, v = res.planes()
        assert (y == ty).all() and (u == tu).all() and (v == tv).all()
        # full RGB path (fancy upsampler + fixed-point conversion)
        assert (decode_webp(data) == _webp_decode_rgb(data)).all()


@needs_libwebp
def test_libwebp_decodes_our_streams():
    for (w, h, q) in [(32, 32, 8), (100, 75, 20), (7, 5, 4)]:
        img = _test_image(w, h)
        blob = vp8.encode_webp_lossy(img, q_index=q)
        ours = decode_webp(blob)
        theirs = _webp_decode_rgb(blob)
        assert (ours == theirs).all()
