"""Pixel-volume-weighted partition balancing (skew control)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_lpt_binning_balances_skewed_weights():
    from ocrs_ray.pipeline import assign_weighted_partitions

    # Heavy-tailed weights: a few huge images among many small ones.
    rng = np.random.default_rng(3)
    w = np.concatenate(
        [rng.integers(1_000, 5_000, 500), rng.integers(500_000, 1_000_000, 8)]
    )
    batch = pa.table({"pixels": pa.array(w, type=pa.int64())})
    out = assign_weighted_partitions(batch, 4)
    parts = out.column("wpart").to_numpy()
    totals = np.zeros(4, dtype=np.int64)
    np.add.at(totals, parts, w)
    # LPT guarantee: max bin <= 4/3 * optimal; here just assert tight
    # balance relative to a naive row-count split, which would put all
    # 8 giants wherever they fall.
    assert totals.max() / totals.mean() < 1.1
    assert set(parts) == {0, 1, 2, 3}


def test_pixel_weigher_annotates_media_only():
    from ocrs_ray.pipeline import PixelWeigher

    batch = pa.table(
        {
            "doc_id": ["d1", "d1"],
            "offset": pa.array([0, 1], type=pa.int32()),
            "kind": ["text", "media"],
            "text": ["hello", ""],
            "media_ref": ["", "m1"],
        }
    )
    weigher = PixelWeigher({"m1": (b"", 100, 200, 1, "raw8-hwc")})
    out = weigher(batch)
    assert out.column("pixels").to_pylist() == [0, 20000]


def test_pipeline_equality_with_balancing(ray_session, tmp_path):
    """Balancing shuffles rows arbitrarily; output must still satisfy
    span-sequence equality."""
    import pyarrow.parquet as pq

    from ocrs_ray.corpus import ensure_corpus
    from ocrs_ray.pipeline import (
        OcrPipelineConfig,
        build_ocr_pipeline,
        load_media_store,
        read_spans,
    )

    paths = ensure_corpus("/tmp/ocrs_ray_bal_corpus", n_docs=120, row_group_docs=20)
    ds = read_spans(paths["spans"])
    media = load_media_store(paths["media"])
    cfg = OcrPipelineConfig(
        ocr_concurrency=(1, 2), reassemble_partitions=4, balance_partitions=4
    )
    got = build_ocr_pipeline(ds, media, cfg).to_pandas()
    exp = pq.read_table(paths["expected_flat"]).to_pandas()
    exp_docs = {
        d: list(zip(g.sort_values("offset")["kind"], g.sort_values("offset")["text"]))
        for d, g in exp.groupby("doc_id")
    }
    got_docs = {
        r["doc_id"]: [(s["kind"], s["text"]) for s in r["spans"]]
        for _, r in got.iterrows()
    }
    assert got_docs == exp_docs
