"""Engine-level tests with fake models.

Ported from /root/reference/ocrs/src/lib.rs:447-577 — the central test
trick of the reference: deterministic fake models make end-to-end
behavior exactly predictable.
"""

import numpy as np

from ocrs_ray.engine import OcrEngine, OcrEngineParams
from ocrs_ray.geometry import RectF, RotatedRect
from ocrs_ray.models import FakeDetectionModel, FakeRecognitionModel, make_fake_alphabet

from .util import gen_test_image


def expected_word_boxes() -> list[RectF]:
    # Parity: /root/reference/ocrs/src/lib.rs:437-445.
    top, height = 27, 25
    return [
        RectF.from_tlhw(top, -3, height, 56),
        RectF.from_tlhw(top, 66, height, 57),
        RectF.from_tlhw(top, 136, height, 57),
    ]


def test_engine_prepare_input():
    image = gen_test_image(3)
    engine = OcrEngine(OcrEngineParams(detection_model=FakeDetectionModel()))
    inp = engine.prepare_input(image, order="chw")
    chans, height, width = inp.image.shape
    assert (chans, height, width) == (1, image.shape[1], image.shape[2])


def test_engine_detect_words():
    n_words = 3
    image = gen_test_image(n_words)
    engine = OcrEngine(OcrEngineParams(detection_model=FakeDetectionModel()))
    inp = engine.prepare_input(image, order="chw")
    words = engine.detect_words(inp)
    assert len(words) == n_words

    boxes = sorted(
        (w.bounding_rect() for w in words), key=lambda b: (int(b.top), int(b.left))
    )
    for actual, expected in zip(boxes, expected_word_boxes()):
        assert (
            round(actual.top),
            round(actual.left),
            round(actual.bottom),
            round(actual.right),
        ) == (
            round(expected.top),
            round(expected.left),
            round(expected.bottom),
            round(expected.right),
        ), (actual, expected)


def run_recognition(engine: OcrEngine, image: np.ndarray) -> str:
    inp = engine.prepare_input(image, order="chw")
    h, w = image.shape[1], image.shape[2]
    line = [RotatedRect.from_rect(RectF.from_tlhw(0, 0, h, w))]
    lines = engine.recognize_text(inp, [line])
    assert len(lines) == 1
    assert lines[0] is not None
    return str(lines[0])


def test_engine_recognize_lines():
    image = np.zeros((1, 64, 32), dtype=np.float32)
    # Fill alphabet row for char '0' (label 2 -> row 2).
    image[:, 2, :] = 1.0
    engine = OcrEngine(
        OcrEngineParams(
            recognition_model=FakeRecognitionModel(), alphabet=make_fake_alphabet()
        )
    )
    assert run_recognition(engine, image) == "0"


def test_engine_filter_chars():
    image = np.zeros((1, 64, 32), dtype=np.float32)
    image[:, 2, :] = 0.7  # '0'
    image[:, 3, :] = 0.3  # '1'
    alphabet = make_fake_alphabet()

    engine = OcrEngine(
        OcrEngineParams(recognition_model=FakeRecognitionModel(), alphabet=alphabet)
    )
    assert run_recognition(engine, image) == "0"

    engine = OcrEngine(
        OcrEngineParams(
            recognition_model=FakeRecognitionModel(),
            alphabet=alphabet,
            allowed_chars="123456789",
        )
    )
    assert run_recognition(engine, image) == "1"


def test_engine_get_text_end_to_end():
    """Full pipeline smoke: detect + layout + recognize on a synthetic image."""
    image = gen_test_image(2)
    engine = OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            recognition_model=FakeRecognitionModel(),
            alphabet=make_fake_alphabet(),
        )
    )
    inp = engine.prepare_input(image, order="chw")
    text = engine.get_text(inp)
    # The fake recognition model produces *some* deterministic string for
    # the white-rect words; the key invariant is determinism.
    text2 = engine.get_text(engine.prepare_input(image, order="chw"))
    assert text == text2


def test_ctc_beam_sums_alignments_over_greedy():
    """The classic CTC case: per-frame argmax picks blank, but the
    total probability of 'label 1' summed over its alignments wins.
    Greedy returns empty; prefix beam search returns the label."""
    import numpy as np

    from ocrs_ray.ctc import decode_beam, decode_greedy

    # log P(blank)=log 0.6, log P(1)=log 0.4 on both frames.
    frame = np.log(np.array([0.6, 0.4], dtype=np.float64))
    scores = np.stack([frame, frame])
    assert decode_greedy(scores) == []
    steps = decode_beam(scores, beam_width=10)
    assert [s.label for s in steps] == [1]


def test_ctc_beam_matches_greedy_on_peaked_scores():
    """Near-one-hot log-probs: beam and greedy agree (labels and the
    collapse of repeats/blanks)."""
    import numpy as np

    from ocrs_ray.ctc import decode_beam, decode_greedy

    rng = np.random.default_rng(5)
    labels = [3, 3, 0, 2, 0, 0, 5, 5, 5, 1]
    T, C = len(labels), 6
    probs = np.full((T, C), 0.01)
    for t, lab in enumerate(labels):
        probs[t, lab] = 1.0
    probs /= probs.sum(axis=1, keepdims=True)
    scores = np.log(probs)
    g = decode_greedy(scores)
    b = decode_beam(scores, beam_width=100)
    assert [s.label for s in g] == [3, 2, 5, 1]
    assert [s.label for s in b] == [s.label for s in g]


def test_min_line_chars_filters_spurious_lines():
    """M16: the optional spurious-line filter from the reference
    example (hello_ocr.rs:85-91) drops lines at or below the length
    threshold; off by default."""
    import numpy as np

    from ocrs_ray.engine import OcrEngine, OcrEngineParams
    from ocrs_ray.models import (
        FakeDetectionModel,
        FakeRecognitionModel,
        make_fake_alphabet,
    )

    img = np.zeros((100, 200, 1), dtype=np.uint8)
    img[30:50, 0:50] = 255  # one short line (decodes to a single char)

    def build(min_chars):
        return OcrEngine(
            OcrEngineParams(
                detection_model=FakeDetectionModel(),
                recognition_model=FakeRecognitionModel(),
                alphabet=make_fake_alphabet(),
                min_line_chars=min_chars,
            )
        )

    default = build(0)
    text = default.get_text(default.prepare_input(img, order="hwc"))
    assert text != ""  # off by default: short line kept
    filtered = build(len(text))
    assert filtered.get_text(filtered.prepare_input(img, order="hwc")) == ""
