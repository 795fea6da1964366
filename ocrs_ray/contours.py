"""Connected components and outer-border tracing on binary masks.

Pure-numpy implementation of the public algorithms behind
`rten_imageproc::find_contours(mask, RetrievalMode::External)` as used by
word detection (/root/reference/ocrs/src/detection.rs:41-62): run-based
two-pass connected-component labeling (8-connectivity) + Moore-neighbor
border following per component.
"""

from __future__ import annotations

import numpy as np

__all__ = ["label_components", "outer_contours", "find_contours_external"]


def label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Label 8-connected components of a boolean mask.

    Returns (labels, n) where labels is int32 with 0 = background and
    components numbered 1..n in row-major discovery order of their first
    run (matches the scan order the reference's contour finder uses for
    emitting contours top-to-bottom).
    """
    mask = np.ascontiguousarray(mask, dtype=bool)
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    if not mask.any():
        return labels, 0

    # Extract runs per row, vectorized: a run is a maximal horizontal
    # strip of True pixels.
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = mask
    diff = np.diff(padded, axis=1)
    starts = np.argwhere(diff == 1)  # (row, col) with col = run start
    ends = np.argwhere(diff == -1)  # col = run end (exclusive)
    # argwhere returns row-major order, so starts/ends align per row.
    run_row = starts[:, 0]
    run_start = starts[:, 1]
    run_end = ends[:, 1]
    n_runs = len(run_row)

    parent = np.arange(n_runs, dtype=np.int64)

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    # Merge runs on adjacent rows that overlap under 8-connectivity
    # (overlap after extending one run by 1 pixel on each side).
    row_bounds = np.searchsorted(run_row, np.arange(h + 1))
    for r in range(1, h):
        a0, a1 = row_bounds[r - 1], row_bounds[r]
        b0, b1 = row_bounds[r], row_bounds[r + 1]
        if a0 == a1 or b0 == b1:
            continue
        ai = a0
        for bi in range(b0, b1):
            bs, be = run_start[bi] - 1, run_end[bi] + 1
            while ai < a1 and run_end[ai] <= bs:
                ai += 1
            aj = ai
            while aj < a1 and run_start[aj] < be:
                union(aj, bi)
                aj += 1
            if aj > a0 and aj == a1:
                # keep ai where it is for the next b run; runs are sorted.
                pass

    roots = np.array([find(i) for i in range(n_runs)], dtype=np.int64)
    uniq, inv = np.unique(roots, return_inverse=True)
    # Components numbered by first-run order (uniq is sorted by root
    # index, and root index == earliest run due to min-root union).
    comp_of_run = inv.astype(np.int32) + 1
    for i in range(n_runs):
        labels[run_row[i], run_start[i] : run_end[i]] = comp_of_run[i]
    return labels, len(uniq)


# Moore neighborhood in clockwise order starting from W:
# (dx, dy) pairs.
_MOORE = [(-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1)]


def _trace_border(comp_mask: np.ndarray, start_xy: tuple[int, int]) -> np.ndarray:
    """Moore-neighbor border trace (clockwise) of one component.

    `comp_mask` is a padded bool array; `start_xy` is the component's
    first pixel in row-major order (its top-left-most border pixel).
    Returns (N, 2) int array of (x, y) border pixel coordinates.
    """
    sx, sy = start_xy
    contour = [(sx, sy)]
    # Backtrack starts pointing W (we entered from the left).
    prev_dir = 0
    cx, cy = sx, sy
    while True:
        found = False
        # Search clockwise starting just after the backtrack direction.
        for k in range(1, 9):
            d = (prev_dir + k) % 8
            dx, dy = _MOORE[d]
            nx, ny = cx + dx, cy + dy
            if comp_mask[ny, nx]:
                contour.append((nx, ny))
                cx, cy = nx, ny
                # New backtrack: direction opposite of the move we just
                # made, i.e. pointing back at the previous pixel.
                prev_dir = (d + 4) % 8
                found = True
                break
        if not found:
            break  # isolated pixel
        if (cx, cy) == (sx, sy):
            break
    if len(contour) > 1 and contour[-1] == contour[0]:
        contour.pop()
    return np.array(contour, dtype=np.int64)


def outer_contours(labels: np.ndarray, n: int) -> list[np.ndarray]:
    """Trace the outer border of each labeled component.

    Returns one (N, 2) array of (x, y) border points per component, in
    component order (top-to-bottom discovery).
    """
    h, w = labels.shape
    out: list[np.ndarray] = []
    flat = labels.ravel()
    nz = np.flatnonzero(flat)
    labs = flat[nz]
    ys, xs = nz // w, nz % w
    # First pixel of each component in row-major order (labs is already
    # row-major, so the first occurrence per label is the start pixel).
    uniq, first = np.unique(labs, return_index=True)
    # Per-component bounding boxes, one vectorized pass — tracing then
    # works on a small crop instead of a full-size mask per component.
    x0 = np.full(n + 1, w, dtype=np.int64)
    x1 = np.zeros(n + 1, dtype=np.int64)
    y0 = np.full(n + 1, h, dtype=np.int64)
    y1 = np.zeros(n + 1, dtype=np.int64)
    np.minimum.at(x0, labs, xs)
    np.maximum.at(x1, labs, xs)
    np.minimum.at(y0, labs, ys)
    np.maximum.at(y1, labs, ys)
    first_of = dict(zip(uniq.tolist(), first.tolist()))
    for lab in range(1, n + 1):
        i = first_of[lab]
        fx, fy = int(xs[i]), int(ys[i])
        bx0, bx1 = int(x0[lab]), int(x1[lab])
        by0, by1 = int(y0[lab]), int(y1[lab])
        sub = labels[by0 : by1 + 1, bx0 : bx1 + 1] == lab
        padded = np.zeros((sub.shape[0] + 2, sub.shape[1] + 2), dtype=bool)
        padded[1:-1, 1:-1] = sub
        pts = _trace_border(padded, (fx - bx0 + 1, fy - by0 + 1))
        pts = pts - 1
        pts[:, 0] += bx0
        pts[:, 1] += by0
        out.append(pts)
    return out


def find_contours_external(mask: np.ndarray) -> list[np.ndarray]:
    """Outer contours of all 8-connected components in `mask`.

    Equivalent surface to `find_contours(mask, RetrievalMode::External)`
    (/root/reference/ocrs/src/detection.rs:46). Returns (N, 2) arrays of
    (x, y) border-pixel coordinates.
    """
    labels, n = label_components(mask)
    if n == 0:
        return []
    return outer_contours(labels, n)
