"""Connected-component detection tests.

Ported from /root/reference/ocrs/src/detection.rs:212-246.
"""

import numpy as np

from ocrs_ray.contours import find_contours_external, label_components
from ocrs_ray.detection import find_connected_component_rects
from ocrs_ray.geometry import Point

from .util import fill_rect, gen_rect_grid


def test_label_components_basic():
    mask = np.zeros((10, 10), dtype=bool)
    mask[1:3, 1:4] = True
    mask[5:8, 6:9] = True
    # Diagonal touch merges under 8-connectivity.
    mask[3, 4] = True
    labels, n = label_components(mask)
    assert n == 2
    assert labels[1, 1] == labels[3, 4]  # diagonal-connected
    assert labels[5, 6] != labels[1, 1]


def test_find_connected_component_rects():
    mask = np.zeros((400, 400), dtype=bool)
    grid_h, grid_w = 5, 5
    rect_h, rect_w = 10, 50
    rects = gen_rect_grid(
        Point(10, 10), (grid_h, grid_w), (rect_h, rect_w), (10, 5)
    )
    for r in rects:
        expanded = r.adjust_tlbr(0, 0, 1, 1)
        fill_rect(mask, expanded, True)

    components = find_connected_component_rects(mask, 0.0, 100.0)
    assert len(components) == grid_h * grid_w
    for c in components:
        shape = sorted([round(c.height()), round(c.width())])
        assert shape == sorted([rect_h, rect_w])


def test_contours_single_pixel():
    mask = np.zeros((5, 5), dtype=bool)
    mask[2, 3] = True
    contours = find_contours_external(mask)
    assert len(contours) == 1
    assert contours[0].tolist() == [[3, 2]]
