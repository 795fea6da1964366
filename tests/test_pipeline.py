"""End-to-end Ray pipeline tests: span-sequence equality on a
deterministic corpus (FIXTURES.md §5, smoke tier)."""

import pandas as pd
import pyarrow.parquet as pq
import pytest

from ocrs_ray.corpus import ensure_corpus
from ocrs_ray.pipeline import (
    OcrPipelineConfig,
    build_ocr_pipeline,
    explode_spans,
    load_media_store,
    read_spans,
    reassemble_block,
)

CORPUS_ROOT = "/tmp/ocrs_ray_test_corpus/docs100"


@pytest.fixture(scope="module")
def corpus():
    return ensure_corpus(CORPUS_ROOT, n_docs=100, n_templates=16)


def flatten_result(res: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, r in res.iterrows():
        for s in r["spans"]:
            rows.append((r["doc_id"], s["offset"], s["kind"], s["text"], s["media_ref"]))
    return (
        pd.DataFrame(rows, columns=["doc_id", "offset", "kind", "text", "media_ref"])
        .sort_values(["doc_id", "offset"])
        .reset_index(drop=True)
    )


def test_explode_reassemble_roundtrip(corpus):
    """Explode + reassemble is the identity on the spans table."""
    spans = pq.read_table(corpus["spans"])
    flat = explode_spans(spans)
    assert flat.num_rows == sum(len(s) for s in spans.column("spans").to_pylist())
    rebuilt = reassemble_block(flat)
    got = rebuilt.sort_by("doc_id").to_pylist()
    want = spans.sort_by("doc_id").to_pylist()
    assert got == want


def test_pipeline_span_equality(ray_session, corpus):
    """Full distributed pipeline output == per-image engine goldens."""
    ds = read_spans(corpus["spans"])
    media = load_media_store(corpus["media"])
    out = build_ocr_pipeline(
        ds, media, OcrPipelineConfig(ocr_concurrency=2, reassemble_partitions=4)
    )
    got = flatten_result(out.to_pandas())
    exp = (
        pq.read_table(corpus["expected_flat"])
        .to_pandas()
        .sort_values(["doc_id", "offset"])
        .reset_index(drop=True)
    )
    exp["offset"] = exp["offset"].astype(got["offset"].dtype)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp)


def test_pipeline_passthrough_docs(ray_session, corpus):
    """Docs without media spans come out byte-identical to their input."""
    spans = pq.read_table(corpus["spans"]).to_pylist()
    media_free = {
        r["doc_id"]: r["spans"]
        for r in spans
        if all(s["kind"] == "text" for s in r["spans"])
    }
    assert media_free, "corpus should include media-free docs"

    ds = read_spans(corpus["spans"])
    media = load_media_store(corpus["media"])
    out = build_ocr_pipeline(
        ds, media, OcrPipelineConfig(ocr_concurrency=2, reassemble_partitions=4)
    ).to_pandas()
    by_doc = {r["doc_id"]: list(r["spans"]) for _, r in out.iterrows()}
    for doc_id, in_spans in media_free.items():
        got = sorted(by_doc[doc_id], key=lambda s: s["offset"])
        assert [dict(s) for s in got] == in_spans


def test_pipeline_no_reassemble_flat_output(ray_session, corpus):
    """reassemble=False yields the flat span rows (debug tap)."""
    ds = read_spans(corpus["spans"])
    media = load_media_store(corpus["media"])
    flat = build_ocr_pipeline(
        ds, media, OcrPipelineConfig(ocr_concurrency=2), reassemble=False
    )
    df = flat.to_pandas().sort_values(["doc_id", "offset"]).reset_index(drop=True)
    exp = (
        pq.read_table(corpus["expected_flat"])
        .to_pandas()
        .sort_values(["doc_id", "offset"])
        .reset_index(drop=True)
    )
    assert list(df["text"]) == list(exp["text"])


def test_joined_pipeline_matches_broadcast(ray_session):
    """The shuffle-join media path (large-media-table mode) produces
    byte-identical span sequences to the broadcast path."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocrs_ray.corpus import ensure_corpus
    from ocrs_ray.pipeline import (
        OcrPipelineConfig,
        build_ocr_pipeline_joined,
        read_spans,
    )

    paths = ensure_corpus("/tmp/ocrs_ray_join_corpus", n_docs=80, row_group_docs=20)
    spans = read_spans(paths["spans"])
    media = rd.read_parquet(
        paths["media"],
        columns=["media_ref", "image", "height", "width", "channels", "format"],
    )
    cfg = OcrPipelineConfig(ocr_concurrency=(1, 2), reassemble_partitions=4)
    got = build_ocr_pipeline_joined(spans, media, cfg, join_partitions=4).to_pandas()
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


def test_doc_text_sink_matches_golden(ray_session, corpus):
    """Document-level plain-text sink (the reference's get_text shape,
    ocrs/src/lib.rs:290-300): span texts joined with '\n' in offset
    order, per document."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = read_spans(corpus["spans"])
    media = load_media_store(corpus["media"])
    docs = build_ocr_pipeline(
        ds, media, OcrPipelineConfig(ocr_concurrency=2, reassemble_partitions=4)
    )

    def join_text(t: pa.Table) -> pa.Table:
        import numpy as np

        t = t.combine_chunks()
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        texts = pc.list_flatten(spans).field("text")
        lengths = pc.fill_null(pc.list_value_length(spans), 0).to_numpy()
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(lengths)]), type=pa.int32()
        )
        lists = pa.ListArray.from_arrays(offsets, texts)
        return pa.table(
            {"doc_id": t.column("doc_id"), "doc_text": pc.binary_join(lists, "\n")}
        )

    got = (
        docs.map_batches(join_text, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp_flat = pq.read_table(corpus["expected_flat"]).to_pandas()
    want = (
        exp_flat.sort_values(["doc_id", "offset"])
        .groupby("doc_id")["text"]
        .agg("\n".join)
        .rename("doc_text")
        .reset_index()
    )
    pd.testing.assert_frame_equal(got, want)


def test_read_spans_lance_parquet_fallback(ray_session, tmp_path):
    """Without pylance installed the Lance-gated source/sink must run
    the exact parquet pipeline, end to end."""
    import pyarrow.parquet as pq

    from ocrs_ray.corpus import ensure_corpus
    from ocrs_ray.pipeline import (
        OcrPipelineConfig,
        _lance_available,
        build_ocr_pipeline,
        load_media_store,
        read_spans_lance,
        write_spans,
    )

    assert not _lance_available()  # this sandbox has no pylance
    paths = ensure_corpus(str(tmp_path / "corpus"), n_docs=30, n_templates=16,
                          row_group_docs=10)
    ds = read_spans_lance(paths["spans"])
    media = load_media_store(paths["media"])
    out = build_ocr_pipeline(
        ds, media, OcrPipelineConfig(ocr_concurrency=(1, 1), reassemble_partitions=2)
    )
    out_dir = str(tmp_path / "out")
    write_spans(out, out_dir)
    got = pq.read_table(out_dir)
    assert got.num_rows == 30


def test_first_file_rejects_lance_dir_without_pylance(tmp_path):
    from ocrs_ray.pipeline import _first_file

    d = tmp_path / "tbl.lance"
    d.mkdir()
    (d / "data").mkdir()
    (d / "file.lance").write_bytes(b"")
    with pytest.raises(RuntimeError, match="pylance"):
        _first_file(str(d))


def test_gpu_actor_pool_mapping_contract(ray_session, corpus, monkeypatch):
    """The north-star deployment holds detection/recognition weights in
    GPU actor pools; no GPU exists in this sandbox, so the seam is
    contract-tested: building the (lazy, never-executed) pipeline with
    ocr_num_gpus > 0 must pass num_gpus to the OCR actor stage, and
    with the default 0 it must NOT send the kwarg (a zero value would
    still make Ray schedule against the GPU resource)."""
    import ray.data as rd_mod

    calls = []
    orig = rd_mod.Dataset.map_batches

    def spy(self, fn, *a, **kw):
        name = getattr(fn, "__name__", type(fn).__name__ if not isinstance(fn, type) else fn.__name__)
        calls.append((name, dict(kw)))
        return orig(self, fn, *a, **kw)

    monkeypatch.setattr(rd_mod.Dataset, "map_batches", spy)
    ds = read_spans(corpus["spans"])
    media = load_media_store(corpus["media"])

    build_ocr_pipeline(
        ds, media, OcrPipelineConfig(ocr_concurrency=2, ocr_num_gpus=0.5)
    )
    ocr_calls = [kw for n, kw in calls if n.startswith("Ocr")]
    assert ocr_calls and ocr_calls[-1]["num_gpus"] == 0.5
    assert ocr_calls[-1]["num_cpus"] == 1.0

    calls.clear()
    build_ocr_pipeline(
        ds, media, OcrPipelineConfig(ocr_concurrency=2)
    )
    ocr_calls = [kw for n, kw in calls if n.startswith("Ocr")]
    assert ocr_calls and "num_gpus" not in ocr_calls[-1]
