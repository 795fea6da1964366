"""Minimal pure-numpy baseline JPEG codec (no native libraries) — the
same approach as `ocrs_ray.png`: a real decoder for the format subset
the engine's media path needs, honestly gated where the spec goes
beyond it.

The reference decodes JPEG via the `image` crate
(/root/reference/ocrs-cli/src/main.rs:312-323); this module closes that
real-user gap for baseline sequential JPEGs:

- decode: baseline (SOF0/1) AND progressive (SOF2) Huffman DCT —
  progressive covers spectral selection, successive approximation
  (DC/AC first + refinement scans with EOB runs), exactly what the
  reference's own example fixture (ocrs/examples/rust-book.jpg,
  1600x1200, 10 scans) uses — 8-bit, 1 or 3 components, sampling
  factors 1 or 2 (4:4:4 / 4:2:2 / 4:2:0), restart intervals, multiple
  DHT/DQT segments. Arithmetic coding, hierarchical modes, 12-bit, and
  CMYK raise NotImplementedError cleanly.
- encode: baseline sequential, 4:4:4 / 4:2:2 / 4:2:0 (box-averaged
  chroma), Annex-K standard
  quantization (quality-scaled, IJG curve) and Huffman tables — valid
  input for any decoder and the fixture generator for the tests.

Performance note: entropy decode is a per-symbol Python loop over a
16-bit prefix LUT — fine for the fixture/corpus image sizes this
sandbox uses; the heavy math (IDCT/DCT, color transforms, upsampling)
is vectorized numpy over all blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# --------------------------------------------------------------------------
# Shared tables

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

#: Annex K.1 luminance / chrominance quantization tables (zigzag order
#: when written to DQT; stored here in natural row-major order).
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

#: Annex K.3 standard Huffman tables: (bits[1..16], values).
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: Orthonormal 8x8 DCT-II basis: block_dct = T @ block @ T.T.
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _T[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _huff_lut(bits: list[int], values: list[int]) -> np.ndarray:
    """16-bit prefix LUT: index by the next 16 bits, get
    (symbol << 8) | code_length packed in int32 (-1 = invalid)."""
    lut = np.full(1 << 16, -1, dtype=np.int32)
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = values[idx]
            base = code << (16 - length)
            lut[base : base + (1 << (16 - length))] = (sym << 8) | length
            code += 1
            idx += 1
        code <<= 1
    return lut


# --------------------------------------------------------------------------
# Encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve: 50 = tables as-is."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = int(a).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(n, 8, 8) float blocks -> DCT coefficients."""
    return np.einsum("ij,njk,lk->nil", _T, plane, _T)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=2)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1] - 128.0
    cr = ycc[:, :, 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.rint(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


def _subsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """fy x fx box-average chroma subsampling (odd dims edge-replicated)."""
    h, w = plane.shape
    if h % fy or w % fx:
        ph, pw = h + (-h % fy), w + (-w % fx)
        padded = np.empty((ph, pw), dtype=plane.dtype)
        padded[:h, :w] = plane
        padded[h:, :w] = plane[h - 1 :, :]
        padded[:, w:] = padded[:, w - 1 : w]
        plane = padded
    return plane.reshape(
        plane.shape[0] // fy, fy, plane.shape[1] // fx, fx
    ).mean(axis=(1, 3))


def encode_jpeg(
    img: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode an (H, W) or (H, W, 1|3) uint8 array as baseline JPEG
    with Annex-K standard tables (quality-scaled). `subsampling` is
    "444" (one block grid for all components), "420" (2x2-sampled
    luma MCUs with box-averaged chroma — the ubiquitous photo layout)
    or "422" (horizontal-only) — together the round-trip pins for the
    decoder's sampling-factor-2 paths."""
    if img.dtype != np.uint8:
        raise ValueError(f"encode_jpeg wants uint8, got {img.dtype}")
    if subsampling not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsampling: {subsampling}")
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    grey = img.ndim == 2
    if not grey and img.shape[2] != 3:
        raise ValueError(f"unsupported channel count: {img.shape[2]}")
    h, w = img.shape[:2]
    sub = subsampling != "444" and not grey
    fx, fy = (2, 2) if subsampling == "420" else (2, 1)

    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)
    planes = (
        [img.astype(np.float64)]
        if grey
        else [p for p in np.moveaxis(_rgb_to_ycbcr(img), 2, 0)]
    )
    if sub:
        planes = [
            planes[0],
            _subsample(planes[1], fy, fx),
            _subsample(planes[2], fy, fx),
        ]
    qts = [qt_l] + ([qt_c, qt_c] if not grey else [])
    # (hi, vi) per component; MCU grid from the max factors.
    samps = [(fx, fy), (1, 1), (1, 1)] if sub else [(1, 1)] * len(planes)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    dc_tabs = [_huff_codes(*HUFF_DC_LUMA)] + (
        [_huff_codes(*HUFF_DC_CHROMA)] * 2 if not grey else []
    )
    ac_tabs = [_huff_codes(*HUFF_AC_LUMA)] + (
        [_huff_codes(*HUFF_AC_CHROMA)] * 2 if not grey else []
    )

    # Quantize all components up front. Each component's block grid is
    # padded to the full MCU extent (mcuy*vi x mcux*hi blocks) so the
    # interleaved scan below can index blocks uniformly.
    comp_coeffs = []
    comp_bw = []
    for plane, qt, (hi, vi) in zip(planes, qts, samps):
        gh, gw = mcuy * vi * 8, mcux * hi * 8
        ph, pw = plane.shape
        padded = np.empty((gh, gw), dtype=np.float64)
        padded[:ph, :pw] = plane
        padded[ph:, :pw] = padded[ph - 1 : ph, :pw]
        padded[:, pw:] = padded[:, pw - 1 : pw]
        blocks = (
            padded.reshape(gh // 8, 8, gw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 8, 8)
        )
        coefs = _fdct_blocks(blocks - 128.0)
        q = np.rint(coefs / qt.reshape(8, 8)).astype(np.int64)
        comp_coeffs.append(q.reshape(-1, 64)[:, ZIGZAG])
        comp_bw.append(gw // 8)

    bw_ = _BitWriter()
    prev_dc = [0] * len(planes)
    # Interleaved MCU scan: per MCU, each component contributes its
    # vi x hi raster of blocks (B.2.3) — for 4:4:4 this degenerates to
    # one block per component in raster order.
    scan_order: list[tuple[int, int]] = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hi, vi) in enumerate(samps):
                for dy in range(vi):
                    for dx in range(hi):
                        scan_order.append(
                            (ci, (my * vi + dy) * comp_bw[ci] + mx * hi + dx)
                        )
    for ci, bi in scan_order:
        coefs = comp_coeffs[ci]
        z = coefs[bi]
        diff = int(z[0]) - prev_dc[ci]
        prev_dc[ci] = int(z[0])
        cat, bits = _magnitude(diff)
        code, length = dc_tabs[ci][cat]
        bw_.write(code, length)
        if cat:
            bw_.write(bits, cat)
        run = 0
        nz = np.nonzero(z[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(z[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_tabs[ci][0xF0]  # ZRL
                bw_.write(code, length)
                run -= 16
            cat, bits = _magnitude(v)
            code, length = ac_tabs[ci][(run << 4) | cat]
            bw_.write(code, length)
            bw_.write(bits, cat)
            run = 0
        if last < 63:
            code, length = ac_tabs[ci][0x00]  # EOB
            bw_.write(code, length)
    scan = bw_.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    # APP0 / JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT
    for tid, qt in enumerate([qt_l] + ([qt_c] if not grey else [])):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in qt[ZIGZAG])
    # SOF0
    ncomp = 1 if grey else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samps[ci]
        out += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    # DHT
    tables = [(0x00, HUFF_DC_LUMA), (0x10, HUFF_AC_LUMA)]
    if not grey:
        tables += [(0x01, HUFF_DC_CHROMA), (0x11, HUFF_AC_CHROMA)]
    for tc, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes([tc])
        out += bytes(bits) + bytes(values)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder


class _BitReader:
    """MSB-first bit reader with an integer accumulator (refilled a
    byte at a time) — the entropy decode's inner loop, kept free of
    per-call numpy overhead."""

    def __init__(self, data: bytes):
        self.data = bytes(data)
        self.n = len(self.data)
        self.bytepos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        data, n = self.data, self.n
        while self.nbits < need:
            b = data[self.bytepos] if self.bytepos < n else 0
            self.bytepos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        if self.nbits < k:
            self._fill(k)
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        if self.nbits < k:
            self._fill(k)
        v = (self.acc >> (self.nbits - k)) & ((1 << k) - 1)
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_bit(self) -> int:
        return self.read(1)


def _extend(v: int, cat: int) -> int:
    """Undo magnitude coding."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _unstuff(scan: bytes) -> bytes:
    """Remove the 0x00 stuffed after each 0xFF in entropy-coded data."""
    arr = np.frombuffer(scan, dtype=np.uint8)
    if len(arr) == 0:
        return b""
    stuffed = np.zeros(len(arr), dtype=bool)
    stuffed[1:] = (arr[:-1] == 0xFF) & (arr[1:] == 0x00)
    return arr[~stuffed].tobytes()


def _split_restarts(scan: bytes) -> list[bytes]:
    """Split entropy-coded data on RSTn markers, unstuffing each
    interval."""
    parts: list[bytes] = []
    start = 0
    i = 0
    n = len(scan)
    while i < n - 1:
        if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7:
            parts.append(scan[start:i])
            start = i + 2
            i += 2
            continue
        i += 1
    parts.append(scan[start:])
    return [_unstuff(p) for p in parts]


def _decode_huff(br: _BitReader, lut: np.ndarray) -> int:
    packed = int(lut[br.peek16()])
    if packed < 0:
        raise ValueError("invalid Huffman code in scan data")
    br.skip(packed & 0xFF)
    return packed >> 8


class _Component:
    """Per-component decode state: geometry + the full quantized
    coefficient store (zigzag order per block), accumulated across
    scans (one scan for baseline, several for progressive)."""

    def __init__(self, cid: int, hi: int, vi: int, tq: int):
        self.id = cid
        self.h = hi
        self.v = vi
        self.tq = tq
        # set after SOF geometry is known:
        self.bx = 0       # block columns, padded to MCU multiples
        self.by = 0       # block rows, padded
        self.bw = 0       # true block columns (non-interleaved scans)
        self.bh = 0       # true block rows
        self.coef: np.ndarray | None = None

    def alloc(self, mcux: int, mcuy: int, w: int, h: int, hmax: int, vmax: int):
        self.bx = mcux * self.h
        self.by = mcuy * self.v
        cw = -(-(w * self.h) // hmax)   # ceil(w * hi / hmax)
        ch = -(-(h * self.v) // vmax)
        self.bw = -(-cw // 8)
        self.bh = -(-ch // 8)
        self.coef = np.zeros((self.by * self.bx, 64), dtype=np.int32)


def _scan_mcu_geometry(scan_comps, mcux, mcuy):
    """Block-iteration order for one scan: interleaved scans walk MCUs
    (each MCU holds h*v blocks per component); a single-component scan
    walks that component's TRUE block grid in raster order."""
    if len(scan_comps) > 1:
        return mcux * mcuy, None
    c = scan_comps[0]
    return c.bw * c.bh, c


def _decode_scan(
    br_intervals: list[bytes],
    scan_comps: list,
    spec: tuple[int, int, int, int],
    dc_luts: dict[int, np.ndarray],
    ac_luts: dict[int, np.ndarray],
    dc_sel: dict[int, int],
    ac_sel: dict[int, int],
    mcux: int,
    mcuy: int,
    restart_interval: int,
) -> None:
    """Decode one scan (baseline or any progressive pass) into the
    components' coefficient stores."""
    ss, se, ah, al = spec
    n_units, single = _scan_mcu_geometry(scan_comps, mcux, mcuy)
    unit = 0
    interval_iter = iter(br_intervals)
    br = _BitReader(next(interval_iter))
    pred = {c.id: 0 for c in scan_comps}
    eobrun = 0

    def next_interval():
        nonlocal br, pred, eobrun
        br = _BitReader(next(interval_iter))
        pred = {c.id: 0 for c in scan_comps}
        eobrun = 0

    def block_indices(c, u):
        if single is not None:
            byi, bxi = divmod(u, c.bw)
            yield byi * c.bx + bxi
            return
        my, mx = divmod(u, mcux)
        for by_ in range(c.v):
            for bx_ in range(c.h):
                yield (my * c.v + by_) * c.bx + (mx * c.h + bx_)

    def dc_first(c, idx):
        sym = _decode_huff(br, dc_luts[dc_sel[c.id]])
        diff = _extend(br.read(sym), sym)
        pred[c.id] += diff
        c.coef[idx, 0] = pred[c.id] << al

    def dc_refine(c, idx):
        if br.read_bit():
            c.coef[idx, 0] |= 1 << al

    def ac_first(c, idx):
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        z = c.coef[idx]
        k = ss
        lut = ac_luts[ac_sel[c.id]]
        while k <= se:
            rs = _decode_huff(br, lut)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read(r)
                return
            k += r
            if k > se:
                raise ValueError("AC run overflows spectral band")
            z[k] = _extend(br.read(s), s) << al
            k += 1

    def ac_refine(c, idx):
        nonlocal eobrun
        z = c.coef[idx]
        lut = ac_luts[ac_sel[c.id]]
        plus = 1 << al
        minus = -1 << al  # arithmetic: -(1 << al)
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = _decode_huff(br, lut)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:
                        # NOT pre-decremented: the current block still
                        # consumes its correction bits below, and the
                        # trailing section decrements after doing so.
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read(r)
                        break
                    # r == 15: skip 16 zero-history coefficients,
                    # refining nonzero ones along the way.
                    newval = 0
                else:
                    if s != 1:
                        raise ValueError("AC refinement size must be 1")
                    newval = plus if br.read_bit() else minus
                # Advance past `r` zero-history coefficients.
                while k <= se:
                    if z[k] != 0:
                        if br.read_bit() and (z[k] & plus) == 0:
                            z[k] += plus if z[k] > 0 else minus
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    z[k] = newval
                k += 1
        if eobrun > 0:
            # Refine every remaining nonzero coefficient in the band.
            while k <= se:
                if z[k] != 0:
                    if br.read_bit() and (z[k] & plus) == 0:
                        z[k] += plus if z[k] > 0 else minus
                k += 1
            eobrun -= 1

    def seq_block(c, idx):
        sym = _decode_huff(br, dc_luts[dc_sel[c.id]])
        pred[c.id] += _extend(br.read(sym), sym)
        z = c.coef[idx]
        z[0] = pred[c.id]
        k = 1
        lut = ac_luts[ac_sel[c.id]]
        while k < 64:
            rs = _decode_huff(br, lut)
            if rs == 0x00:
                break
            if rs == 0xF0:
                k += 16
                continue
            k += rs >> 4
            if k > 63:
                raise ValueError("AC run overflows block")
            s = rs & 0xF
            z[k] = _extend(br.read(s), s)
            k += 1

    progressive = not (ss == 0 and se == 63 and ah == 0 and al == 0)
    if not progressive:
        op = seq_block
    elif ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        op = dc_first if ah == 0 else dc_refine
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        op = ac_first if ah == 0 else ac_refine

    while unit < n_units:
        if restart_interval and unit and unit % restart_interval == 0:
            next_interval()
        for c in scan_comps:
            for idx in block_indices(c, unit):
                op(c, idx)
        unit += 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode JPEG bytes to an (H, W, C) uint8 array (C = 1 or 3).

    Supports baseline sequential (SOF0/1) and progressive (SOF2) DCT,
    8-bit, 1 or 3 components, sampling factors 1-2, restart intervals.
    Arithmetic coding, hierarchical modes, 12-bit, and 4-component
    (CMYK) raise NotImplementedError.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_luts: dict[int, np.ndarray] = {}
    ac_luts: dict[int, np.ndarray] = {}
    sof = None
    comps: list[_Component] = []
    restart_interval = 0
    hmax = vmax = mcux = mcuy = 1

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        # Optional 0xFF fill bytes may precede any marker (B.1.1.2).
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                prec, tid = body[o] >> 4, body[o] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.frombuffer(body, dtype=np.uint8, count=64, offset=o + 1)
                qts[tid] = tbl.astype(np.int64)[UNZIGZAG]
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, tid = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                values = list(body[o + 17 : o + 17 + nv])
                (ac_luts if tc else dc_luts)[tid] = _huff_lut(bits, values)
                o += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (baseline), SOF2 (progressive)
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG unsupported")
            sof = (h, w, ncomp, marker == 0xC2)
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factor {hi}x{vi} unsupported (1-2 only)"
                    )
                comps.append(_Component(cid, hi, vi, tq))
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for c in comps:
                c.alloc(mcux, mcuy, w, h, hmax, vmax)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG mode 0xFF{marker:02X} unsupported (baseline + "
                "progressive Huffman only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_comps = []
            dc_sel: dict[int, int] = {}
            ac_sel: dict[int, int] = {}
            for si in range(ns):
                cs, td_ta = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in comps if c.id == cs)
                scan_comps.append(comp)
                dc_sel[cs] = td_ta >> 4
                ac_sel[cs] = td_ta & 0xF
            ss, se, ahl = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0xF
            # Entropy-coded data runs to the next non-RST marker.
            end = pos
            while True:
                nxt = data.index(b"\xff", end)
                m = data[nxt + 1]
                if m == 0x00 or 0xD0 <= m <= 0xD7:
                    end = nxt + 2
                    continue
                break
            intervals = (
                _split_restarts(data[pos:nxt])
                if restart_interval
                else [_unstuff(data[pos:nxt])]
            )
            _decode_scan(
                intervals, scan_comps, (ss, se, ah, al),
                dc_luts, ac_luts, dc_sel, ac_sel,
                mcux, mcuy, restart_interval,
            )
            pos = nxt
        # APPn / COM / everything else: skipped.

    if sof is None:
        raise ValueError("JPEG missing SOF")
    h, w, ncomp, _prog = sof

    # Dequantize + IDCT + assemble planes, vectorized per component.
    planes = []
    for c in comps:
        qt = qts[c.tq].reshape(8, 8)
        coefs = c.coef[:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        coefs *= qt
        blocks = np.einsum("ji,njk,kl->nil", _T, coefs, _T) + 128.0
        plane = (
            blocks.reshape(c.by, c.bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.by * 8, c.bx * 8)
        )
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if ncomp == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    return _ycbcr_to_rgb(np.stack(planes, axis=2))
