"""Recognized-text items: chars, words, lines and their geometry.

Parity: /root/reference/ocrs/src/text_items.rs — non-empty char
sequences; words split on ASCII space; bounding/rotated rects derived
from char rects with a predictable upright orientation.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .geometry import Rect, RotatedRect, bounding_rect, min_area_rect

__all__ = ["TextChar", "TextLine", "TextWord"]


@dataclass(frozen=True)
class TextChar:
    """A recognized character and its bounding rect in image coords."""

    char: str
    rect: Rect


class _TextItem:
    chars: list[TextChar]

    def bounding_rect(self) -> Rect:
        br = bounding_rect([c.rect for c in self.chars])
        assert br is not None, "expected valid rect"
        return br

    def rotated_rect(self) -> RotatedRect:
        pts = np.array(
            [
                (p.x, p.y)
                for c in self.chars
                for p in c.rect.corners()
            ],
            dtype=np.float64,
        )
        rect = min_area_rect(pts)
        assert rect is not None, "expected valid rect"
        # Predictable upright orientation: up towards (-1, 0) in (y, x),
        # i.e. (0, -1) in (x, y). Parity: text_items.rs:28-30.
        return rect.orient_towards((0.0, -1.0))

    def __str__(self) -> str:
        return "".join(c.char for c in self.chars)


class TextLine(_TextItem):
    """A recognized line: non-empty char sequence."""

    def __init__(self, chars: list[TextChar]):
        assert chars, "Text lines must not be empty"
        self.chars = chars

    def words(self) -> list["TextWord"]:
        out: list[TextWord] = []
        current: list[TextChar] = []
        for c in self.chars:
            if c.char == " ":
                if current:
                    out.append(TextWord(current))
                current = []
            else:
                current.append(c)
        if current:
            out.append(TextWord(current))
        return out


class TextWord(_TextItem):
    """Maximal run of non-space chars within a line."""

    def __init__(self, chars: list[TextChar]):
        assert chars, "Text words must not be empty"
        self.chars = chars
