"""Pure-numpy PNG codec: round trips, filter coverage, spec edges, and
the real-codec media path through the engine."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ocrs_ray.png import decode_png, encode_png


def test_roundtrip_grey_rgb_rgba():
    rng = np.random.default_rng(3)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 17, c), dtype=np.uint8)
        out = decode_png(encode_png(img))
        np.testing.assert_array_equal(out, img)


def test_roundtrip_2d_input():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out[:, :, 0], img)


def _encode_with_filters(img: np.ndarray, ftype: int) -> bytes:
    """Hand-roll an encoder applying one filter type to every row, so
    the decoder's unfilter paths are each exercised against the spec
    definition (RFC 2083 §6)."""
    h, w, c = img.shape
    bpp = c
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    rows = []
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]]) if stride > bpp else np.zeros(stride, dtype=np.int32)
        ul = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]]) if stride > bpp else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = (cur - left) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            enc = (cur - ((left + prev) >> 1)) % 256
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
            enc = (cur - pred) % 256
        rows.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("c", [1, 3, 4])
def test_all_filters_decode(ftype, c):
    rng = np.random.default_rng(10 * ftype + c)
    img = rng.integers(0, 256, size=(9, 11, c), dtype=np.uint8)
    out = decode_png(_encode_with_filters(img, ftype))
    np.testing.assert_array_equal(out, img)


def test_palette_png():
    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = decode_png(data)
    np.testing.assert_array_equal(out, pal[idx])


def test_rejects_bad_inputs():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good)
    corrupted = bytearray(good)
    corrupted[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))
    with pytest.raises(ValueError, match="uint8"):
        encode_png(img.astype(np.float32))


def test_roundtrip_property():
    """Hypothesis: encode->decode is the identity for any u8 image
    shape/channel count the encoder accepts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.integers(min_value=1, max_value=24),
        st.integers(min_value=1, max_value=24),
        st.sampled_from([1, 2, 3, 4]),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def check(h, w, c, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(img)), img)

    check()


def test_decode_media_png_through_engine():
    """A real PNG payload flows through decode_media and OCRs to the
    same text as its raw8 twin."""
    from ocrs_ray.corpus import make_engine
    from ocrs_ray.pipeline import decode_media

    img = np.zeros((100, 200, 1), dtype=np.uint8)
    img[30:50, 0:50] = 255
    png_payload = (encode_png(img), 100, 200, 1, "png")
    raw_payload = (img.tobytes(), 100, 200, 1, "raw8-hwc")
    a = decode_media(png_payload)
    b = decode_media(raw_payload)
    np.testing.assert_array_equal(a, b)
    eng = make_engine()
    assert eng.get_text(eng.prepare_input(a, order="hwc")) == eng.get_text(
        eng.prepare_input(b, order="hwc")
    )
    # webp now routes to the real VP8L codec; junk bytes are a
    # container error, not a format gate
    with pytest.raises(ValueError):
        decode_media((b"x" * 16, 1, 1, 1, "webp"))
