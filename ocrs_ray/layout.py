"""Layout analysis: word -> line grouping, separators, reading order.

Per-image, local analysis (no distributed state): this module runs as a
stateless function inside `map_batches` stages. Re-implements the
semantics of /root/reference/ocrs/src/layout_analysis.rs and its
`empty_rects` submodule (Breuel's maximal-empty-rectangle branch-and-
bound search, "Two Geometric Algorithms for Layout Analysis", DAS 2002).
"""

from __future__ import annotations

import heapq
import itertools
import math
from typing import Callable, Iterator

from .geometry import (
    Line,
    Point,
    Rect,
    RotatedRect,
    idiv,
    leftmost_edge,
    rightmost_edge,
    rust_round,
)

__all__ = [
    "group_into_lines",
    "find_block_separators",
    "find_text_lines",
    "max_empty_rects",
    "filter_overlapping",
]


def _rects_separated_by_line(a: RotatedRect, b: RotatedRect, l: Line) -> bool:
    # Parity: /root/reference/ocrs/src/layout_analysis.rs:8-11.
    a_to_b = Line(a.center(), b.center())
    return a_to_b.intersects(l)


def group_into_lines(
    rects: list[RotatedRect], separators: list[Line]
) -> list[list[RotatedRect]]:
    """Greedy left-to-right chaining of word rects into lines.

    Parity: /root/reference/ocrs/src/layout_analysis.rs:19-71 including
    the overlap thresholds (vertical >= 5, horizontal overlap <= 5) and
    the "min center-x eligible candidate" extension rule.
    """
    sorted_rects = sorted(rects, key=lambda r: int(r.bounding_rect().left))
    lines: list[list[RotatedRect]] = []
    overlap_threshold = 5.0
    max_h_overlap = 5.0

    while sorted_rects:
        line = [sorted_rects.pop(0)]
        while True:
            last = line[-1]
            last_edge = rightmost_edge(last)
            last_cx = last.center().x
            best_i = -1
            best_cx = None
            for i, r in enumerate(sorted_rects):
                edge = leftmost_edge(r)
                if (
                    r.center().x > last_cx
                    and edge.center().x - last_edge.center().x >= -max_h_overlap
                    and last_edge.vertical_overlap(edge) >= overlap_threshold
                    and not any(
                        _rects_separated_by_line(last, r, s) for s in separators
                    )
                ):
                    cx = int(r.center().x)
                    if best_cx is None or cx < best_cx:
                        best_cx = cx
                        best_i = i
            if best_i < 0:
                break
            line.append(sorted_rects.pop(best_i))
        lines.append(line)
    return lines


# ---------------------------------------------------------------------------
# Maximal empty rectangles (Breuel 2002) — lazy best-first search.
# ---------------------------------------------------------------------------


def max_empty_rects(
    obstacles: list[Rect],
    boundary: Rect,
    score: Callable[[Rect], float],
    min_width: int,
    min_height: int,
) -> Iterator[Rect]:
    """Yield empty rects within `boundary`, best-score first.

    `score` must be monotone: score(sub-rect) <= score(rect). Lazy
    branch-and-bound over a max-heap of partitions; the pivot is the
    middle obstacle of the (x, y)-center-sorted obstacle list.
    Parity: /root/reference/ocrs/src/layout_analysis/empty_rects.rs.
    """
    obstacles = sorted(obstacles, key=lambda o: (o.center().x, o.center().y))
    counter = itertools.count()  # heap tiebreaker, FIFO like BinaryHeap pops
    heap: list[tuple[float, int, Rect, list[Rect]]] = []
    if not boundary.is_empty():
        heapq.heappush(heap, (-score(boundary), next(counter), boundary, obstacles))

    while heap:
        neg_score, _, b, obs = heapq.heappop(heap)
        if not obs:
            yield b
            continue
        pivot = obs[len(obs) // 2]
        sub_rects = [
            Rect(b.top, b.left, pivot.top, b.right),  # top
            Rect(b.top, b.left, b.bottom, pivot.left),  # left
            Rect(pivot.bottom, b.left, b.bottom, b.right),  # bottom
            Rect(b.top, pivot.right, b.bottom, b.right),  # right
        ]
        for sr in sub_rects:
            if (
                max(sr.width(), 0) < min_width
                or max(sr.height(), 0) < min_height
                or sr.is_empty()
            ):
                continue
            sr_obs = [o for o in obs if o.intersects(sr)]
            heapq.heappush(heap, (-score(sr), next(counter), sr, sr_obs))


def filter_overlapping(rects: Iterator[Rect], factor: float) -> Iterator[Rect]:
    """Drop rects whose IoU with an already-yielded rect >= `factor`.

    Greedy and order-dependent (a reference quirk to reproduce):
    /root/reference/ocrs/src/layout_analysis/empty_rects.rs:170-229.
    """
    found: list[Rect] = []
    for r in rects:
        if any(f.iou(r) >= factor for f in found):
            continue
        found.append(r)
        yield r


# ---------------------------------------------------------------------------
# Block separators + reading order
# ---------------------------------------------------------------------------


def find_block_separators(words: list[RotatedRect]) -> list[Rect]:
    """Find separators between text blocks (columns / sections).

    Parity: /root/reference/ocrs/src/layout_analysis.rs:83-155,
    including the unsorted-median word height quirk (`words[len/2]`
    without sorting, :116-119) and the aspect-ratio scoring function
    from Shafait, Keysers & Breuel, TPAMI 2008 (10.1109/TPAMI.2007.70837).
    """
    if not words:
        return []
    page_rect = None
    for w in words:
        br = w.bounding_rect()
        page_rect = br if page_rect is None else page_rect.union(br)
    page_rect = page_rect.integral_bounding_rect()

    lines = group_into_lines(words, [])
    lines.sort(key=lambda l: rust_round(l[0].bounding_rect().top))

    all_word_spacings: list[int] = []
    for line in lines:
        if len(line) > 1:
            spacings = sorted(
                rust_round(max(nxt.bounding_rect().left - cur.bounding_rect().right, 0.0))
                for cur, nxt in zip(line, line[1:])
            )
            all_word_spacings.extend(spacings)
    all_word_spacings.sort()

    median_word_spacing = (
        all_word_spacings[len(all_word_spacings) // 2] if all_word_spacings else 10
    )
    # Reference quirk: middle element of the *unsorted* input word list.
    median_height = rust_round(words[len(words) // 2].height())

    def score(r: Rect) -> float:
        aspect_ratio = r.height() / r.width()
        a = abs(math.log2(aspect_ratio)) if aspect_ratio > 0 else math.inf
        if a < 3.0:
            weight = 0.5
        elif a < 5.0:
            weight = 1.5
        else:
            weight = a
        return math.sqrt(r.area() * weight)

    object_bboxes = [w.bounding_rect().integral_bounding_rect() for w in words]
    min_width = median_word_spacing * 3
    if min_width < 0:
        raise ValueError("negative separator min width")
    min_height = 3 * max(median_height, 0)

    gen = max_empty_rects(object_bboxes, page_rect, score, min_width, min_height)
    return list(itertools.islice(filter_overlapping(gen, 0.5), 80))


def _midpoint_line(words: list[RotatedRect]) -> Line:
    assert words
    return Line(
        words[0].bounding_rect().left_edge().center(),
        words[-1].bounding_rect().right_edge().center(),
    )


def find_text_lines(words: list[RotatedRect]) -> list[list[RotatedRect]]:
    """Group words into lines and sort into reading order.

    Parity: /root/reference/ocrs/src/layout_analysis.rs:158-233 —
    separator-aware line grouping, vertical sort, paragraph clustering by
    horizontal overlap chains, flattened to a line list.
    """
    separators = find_block_separators(words)
    vertical_separators = []
    horizontal_separators = []
    for r in separators:
        c = r.center()
        vertical_separators.append(
            Line(Point(float(c.x), float(r.top)), Point(float(c.x), float(r.bottom)))
        )
        horizontal_separators.append(
            Line(Point(float(r.left), float(c.y)), Point(float(r.right), float(c.y)))
        )

    lines = group_into_lines(words, vertical_separators)
    lines.sort(key=lambda ws: int(_midpoint_line(ws).center().y))

    def is_separated_by(line_a: Line, line_b: Line, seps: list[Line]) -> bool:
        a_to_b = Line(line_a.center(), line_b.center())
        return any(sep.intersects(a_to_b) for sep in seps)

    paragraphs: list[list[list[RotatedRect]]] = []
    while lines:
        seed = lines.pop(0)
        para = [seed]
        prev_line = _midpoint_line(seed)
        index = 0
        while index < len(lines):
            candidate_line = _midpoint_line(lines[index])
            if prev_line.horizontal_overlap(
                candidate_line
            ) > 0.0 and not is_separated_by(
                prev_line, candidate_line, horizontal_separators
            ):
                para.append(lines.pop(index))
                prev_line = candidate_line
            else:
                index += 1
        paragraphs.append(para)

    return [line for para in paragraphs for line in para]
