"""Layout analysis tests.

Ported from /root/reference/ocrs/src/layout_analysis.rs:242-350 and
/root/reference/ocrs/src/layout_analysis/empty_rects.rs:239-294.
"""

import random

from ocrs_ray.geometry import Point, Rect, RotatedRect
from ocrs_ray.layout import find_block_separators, find_text_lines, max_empty_rects

from .util import gen_rect_grid, union_rects


def test_max_empty_rects():
    page = Rect.from_tlbr(0, 0, 80, 90)
    left_col = gen_rect_grid(Point(0, 0), (10, 5), (5, 5), (3, 2))
    left_b = union_rects(left_col)
    assert page.contains(left_b)
    right_col = gen_rect_grid(Point(left_b.right + 20, 0), (10, 5), (5, 5), (3, 2))
    right_b = union_rects(right_col)
    assert page.contains(right_b)

    all_cols = left_col + right_col
    first = next(max_empty_rects(all_cols, page, lambda r: float(r.area()), 0, 0), None)
    assert first == Rect.from_tlbr(page.top, left_b.right, page.bottom, right_b.left)


def test_max_empty_rects_if_none():
    boundary = Rect.from_tlbr(0, 0, 5, 5)
    assert (
        next(max_empty_rects([boundary], boundary, lambda r: float(r.area()), 0, 0), None)
        is None
    )
    empty = Rect.from_hw(0, 0)
    assert next(max_empty_rects([], empty, lambda r: float(r.area()), 0, 0), None) is None


def test_find_block_separators():
    # Two lines of two overlapping words (negative word gap) -> 2 separators.
    words = [
        RotatedRect.from_rect(r.to_f32())
        for r in gen_rect_grid(Point(0, 0), (2, 2), (10, 20), (50, -5))
    ]
    separators = find_block_separators(words)
    assert len(separators) == 2


def test_find_text_lines_two_columns():
    page = Rect.from_tlbr(0, 0, 80, 90)
    col_rows, col_words = 10, 5
    line_gap, word_gap = 3, 2
    word_h, word_w = 5, 5

    left_col = gen_rect_grid(Point(0, 0), (col_rows, col_words), (word_h, word_w), (line_gap, word_gap))
    left_b = union_rects(left_col)
    assert page.contains(left_b)
    right_col = gen_rect_grid(
        Point(left_b.right + 20, 0), (col_rows, col_words), (word_h, word_w), (line_gap, word_gap)
    )
    right_b = union_rects(right_col)
    assert page.contains(right_b)

    words = [RotatedRect.from_rect(r.to_f32()) for r in left_col + right_col]
    rng = random.Random(1234)
    rng.shuffle(words)
    lines = find_text_lines(words)

    assert len(lines) == col_rows * 2
    for line in lines:
        assert len(line) == col_words
        br = None
        for r in line:
            rb = r.bounding_rect()
            br = rb if br is None else br.union(rb)
        assert abs(br.height() - word_h) <= 1.0
        expected_width = col_words * (word_w + word_gap) - word_gap
        assert abs(br.width() - expected_width) <= 1.0
