"""S7 (annotated image) and S8 (debug map/mask/line-crop) sinks:
kernel-level pixel checks plus the Ray tap at smoke scale."""

from __future__ import annotations

import numpy as np
import pytest


def test_draw_polygon_rectangle_pixels():
    from ocrs_ray.output import draw_polygon

    img = np.zeros((10, 12, 3), dtype=np.float32)
    color = (1.0, 0.5, 0.25)
    draw_polygon(img, [(2, 3), (2, 8), (6, 8), (6, 3)], color)
    # Edges stroked...
    for x in range(3, 9):
        assert tuple(img[2, x]) == color
        assert tuple(img[6, x]) == color
    for y in range(2, 7):
        assert tuple(img[y, 3]) == color
        assert tuple(img[y, 8]) == color
    # ...interior and exterior untouched.
    assert not img[3:6, 4:8].any()
    assert not img[0].any() and not img[9].any()


def test_draw_polygon_clips_out_of_bounds():
    from ocrs_ray.output import draw_polygon

    img = np.zeros((5, 5, 3), dtype=np.float32)
    draw_polygon(img, [(-3, -3), (-3, 10), (10, 10), (10, -3)], (1.0, 1.0, 1.0))
    assert not img.any()  # fully outside: nothing drawn, no crash


def test_generate_annotated_png_draws_word_boxes():
    from ocrs_ray.corpus import make_engine
    from ocrs_ray.output import generate_annotated_png

    img = np.zeros((100, 200, 1), dtype=np.uint8)
    img[30:50, 0:50] = 255  # one white word rect
    engine = make_engine()
    inp = engine.prepare_input(img, order="hwc")
    words = engine.detect_words(inp)
    lines = engine.find_text_lines(inp, words)
    text_lines = engine.recognize_text(inp, lines)
    assert lines, "fixture should detect at least one line"
    ann = generate_annotated_png(img, lines, text_lines)
    assert ann.shape == (3, 100, 200)
    assert ann.dtype == np.float32
    # On this fixture the line/detection/recognition rects coincide, so
    # the LAST stroke wins (reference draw order, output.rs:143-178):
    # the first recognition line's CRIMSON (220,20,60)/255.
    crimson = np.array([220, 20, 60], dtype=np.float32) / 255.0
    flat = ann.reshape(3, -1).T
    assert (np.abs(flat - crimson) < 1e-6).all(axis=1).any(), "no crimson stroke"
    # The stroke traces the recognition word rect outline exactly: the
    # midpoint of its top edge is crimson.
    rec_rect = text_lines[0].words()[0].rotated_rect()
    ys = [int(p.y) for p in rec_rect.corners()]
    xs = [int(p.x) for p in rec_rect.corners()]
    y_top = max(min(ys), 0)
    x_mid = (max(min(xs), 0) + min(max(xs), 199)) // 2
    assert np.abs(ann[:, y_top, x_mid] - crimson).max() < 1e-6
    # Background pixels away from any box are unchanged (still black).
    assert ann[:, 0, 199] == pytest.approx(0.0)


def test_annotated_unchanged_on_blank_image():
    from ocrs_ray.corpus import make_engine
    from ocrs_ray.output import generate_annotated_png

    img = np.zeros((64, 64, 1), dtype=np.uint8)
    engine = make_engine()
    inp = engine.prepare_input(img, order="hwc")
    words = engine.detect_words(inp)
    lines = engine.find_text_lines(inp, words)
    text_lines = engine.recognize_text(inp, lines)
    ann = generate_annotated_png(img, lines, text_lines)
    assert not ann.any()


def test_write_debug_sinks_roundtrip(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from ocrs_ray.corpus import ensure_corpus
    from ocrs_ray.sinks import write_debug_sinks

    paths = ensure_corpus("/tmp/ocrs_sinks_smoke", n_docs=20, n_templates=8)
    out = write_debug_sinks(paths["media"], str(tmp_path / "sinks"))
    assert set(out) == {"annotated", "text_maps", "line_images"}

    ann = pq.read_table(out["annotated"])
    assert ann.num_rows == 8
    r0 = ann.slice(0, 1).to_pylist()[0]
    assert len(r0["image"]) == r0["height"] * r0["width"] * r0["channels"]

    tm = pq.read_table(out["text_maps"])
    assert tm.num_rows == 8
    m0 = tm.slice(0, 1).to_pylist()[0]
    assert len(m0["text_map"]) == 4 * m0["map_height"] * m0["map_width"]
    assert len(m0["text_mask"]) == m0["map_height"] * m0["map_width"]
    mask = np.frombuffer(m0["text_mask"], dtype=np.uint8)
    assert set(np.unique(mask)) <= {0, 1}

    li = pq.read_table(out["line_images"])
    assert li.num_rows >= 8  # every template has at least one line
    l0 = li.slice(0, 1).to_pylist()[0]
    assert len(l0["line_image"]) == 4 * l0["height"] * l0["width"]

    # Resume semantics: a rerun skips completed sinks (no duplicated
    # rows), and a sink whose _SUCCESS marker is missing is redone
    # from scratch rather than appended to.
    out2 = write_debug_sinks(paths["media"], str(tmp_path / "sinks"))
    assert pq.read_table(out2["annotated"]).num_rows == 8
    import os

    os.remove(out["text_maps"] + "._SUCCESS")
    out3 = write_debug_sinks(paths["media"], str(tmp_path / "sinks"))
    assert pq.read_table(out3["text_maps"]).num_rows == 8


def test_annotated_png_encoding_roundtrips(ray_session, tmp_path):
    """S7 with encode='png': the sink emits genuine PNG payloads that
    decode_media round-trips back to the raw8 variant's pixels."""
    import numpy as np

    from ocrs_ray.corpus import ensure_corpus
    from ocrs_ray.pipeline import decode_media
    from ocrs_ray.sinks import annotated_media

    paths = ensure_corpus("/tmp/ocrs_sinks_smoke", n_docs=20, n_templates=8)
    raw = annotated_media(paths["media"]).to_pandas().set_index("media_ref")
    png = annotated_media(paths["media"], encode="png").to_pandas().set_index(
        "media_ref"
    )
    assert set(png["format"]) == {"png"}
    for ref in raw.index:
        r = raw.loc[ref]
        p = png.loc[ref]
        a = decode_media((r["image"], r["height"], r["width"], r["channels"], r["format"]))
        b = decode_media((p["image"], p["height"], p["width"], p["channels"], p["format"]))
        np.testing.assert_array_equal(a, b)
        assert bytes(p["image"])[:8] == b"\x89PNG\r\n\x1a\n"
