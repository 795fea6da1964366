"""Output formatting: plain text, HierText-style JSON, annotated image.

Parity: /root/reference/ocrs-cli/src/output.rs:29-101 (text/JSON) and
output.rs:116-180 (annotated image). The annotated sink rasterizes
polygon outlines with pure numpy and returns the raw float tensor the
reference produces — encoding to an actual PNG container is the only
part that needs a codec, and the Ray sink stores the raw8 tensor bytes
in parquet instead (same layout as every other media payload here).
"""

from __future__ import annotations

import numpy as np

from .geometry import RotatedRect, min_area_rect, rust_round
from .text_items import TextLine

__all__ = [
    "format_text_output",
    "ocr_json",
    "draw_polygon",
    "generate_annotated_png",
]


def format_text_output(text_lines: list[TextLine | None]) -> str:
    """Recognized lines joined by newlines, skipping empty lines."""
    return "\n".join(str(line) for line in text_lines if line is not None)


def _rounded_vertex_coords(rr: RotatedRect) -> list[list[int]]:
    # Vertex order matches RotatedRect::corners / HierText convention.
    return [[rust_round(p.x), rust_round(p.y)] for p in rr.corners()]


def ocr_json(
    input_path: str, input_hw: tuple[int, int], text_lines: list[TextLine | None]
) -> dict:
    """HierText-style JSON document for one image.

    All lines live in a single paragraph, as in the reference
    (output.rs:70-74).
    """
    line_items = []
    for line in text_lines:
        if line is None:
            continue
        word_items = [
            {
                "text": str(word),
                "vertices": _rounded_vertex_coords(word.rotated_rect()),
            }
            for word in line.words()
        ]
        line_items.append(
            {
                "text": str(line),
                "words": word_items,
                "vertices": _rounded_vertex_coords(line.rotated_rect()),
            }
        )
    height, width = input_hw
    return {
        "url": input_path,
        "image_width": width,
        "image_height": height,
        "paragraphs": [{"lines": line_items}],
    }


# Colors from the reference (output.rs:126-137, CSS keywords): light
# for detection outputs, dark for the corresponding recognition output.
_LIGHT_GRAY = (200, 200, 200)
_DETECT_COLORS = ((255, 127, 80), (143, 188, 143), (100, 149, 237))
_RECOG_COLORS = ((220, 20, 60), (0, 100, 0), (0, 0, 139))


def _draw_line(img: np.ndarray, y0: int, x0: int, y1: int, x1: int, color) -> None:
    """1-px line stroke (DDA sampling), clipped to the image."""
    h, w = img.shape[:2]
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    ys = np.rint(np.linspace(y0, y1, n)).astype(np.int64)
    xs = np.rint(np.linspace(x0, x1, n)).astype(np.int64)
    ok = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    img[ys[ok], xs[ok]] = color


def draw_polygon(img: np.ndarray, corners, color) -> None:
    """Stroke a closed polygon outline onto an (H, W, 3) float image.

    `corners` is a sequence of (y, x) integer-ish pairs; consecutive
    corners are joined and the loop is closed, mirroring
    Painter::draw_polygon as used by the reference sink
    (output.rs:150-178).
    """
    m = len(corners)
    for i in range(m):
        y0, x0 = corners[i]
        y1, x1 = corners[(i + 1) % m]
        _draw_line(img, int(y0), int(x0), int(y1), int(x1), color)


def _trunc_corners(rr: RotatedRect) -> list[tuple[int, int]]:
    # The reference floors via Rust `as i32` (truncation toward zero).
    return [(int(p.y), int(p.x)) for p in rr.corners()]


def generate_annotated_png(
    img: np.ndarray,
    line_rects: list[list[RotatedRect]],
    text_lines: list[TextLine | None],
) -> np.ndarray:
    """Annotate the OCR input image with detected/recognized text boxes.

    Pure-numpy port of the reference sink (output.rs:116-180): the
    input HWC u8 image becomes a CHW f32 image in [0, 1]; light-gray
    min-area rects per layout line, per-line cycled light colors for
    detection word rects, dark colors for recognition word rects.
    """
    base = img.astype(np.float32) / 255.0
    if base.ndim == 2:
        base = base[:, :, None]
    if base.shape[2] == 1:
        base = np.repeat(base, 3, axis=2)
    ann = np.ascontiguousarray(base[:, :, :3])

    scale = lambda c: tuple(v / 255.0 for v in c)  # noqa: E731
    for line in line_rects:
        pts = [p for word_rect in line for p in word_rect.corners()]
        rect = min_area_rect(pts)
        if rect is not None:
            draw_polygon(ann, _trunc_corners(rect), scale(_LIGHT_GRAY))
    for i, line in enumerate(line_rects):
        color = scale(_DETECT_COLORS[i % len(_DETECT_COLORS)])
        for word_rect in line:
            draw_polygon(ann, _trunc_corners(word_rect), color)
    for i, line in enumerate(text_lines):
        if line is None:
            continue
        color = scale(_RECOG_COLORS[i % len(_RECOG_COLORS)])
        for word in line.words():
            draw_polygon(ann, _trunc_corners(word.rotated_rect()), color)
    return ann.transpose(2, 0, 1)
