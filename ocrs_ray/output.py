"""Output formatting: plain text and HierText-style JSON.

Parity: /root/reference/ocrs-cli/src/output.rs:29-101. The annotated-PNG
sink (output.rs:116-180) is debug-only in the reference and is stubbed
here pending an image encoder in the environment.
"""

from __future__ import annotations

from .geometry import RotatedRect, rust_round
from .text_items import TextLine

__all__ = ["format_text_output", "ocr_json", "generate_annotated_png"]


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


def generate_annotated_png(*args, **kwargs):
    """Debug-only annotated-image sink.

    The environment has no image codec; the reference equivalent
    (output.rs:116-180) draws word/line polygons on the input image.
    """
    raise NotImplementedError(
        "annotated-image output requires an image codec (PIL/cv2) "
        "not present in this environment"
    )
