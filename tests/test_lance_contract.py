"""Contract tests for the Lance capability-probed branch
(pipeline.read_spans_lance / write_spans).

The sandbox has no pylance, so the north-star input-format branch can
never execute for real here; these tests mock the `lance` module (Ray
2.49 itself DOES expose read_lance/write_lance) so the branch's
contract — probe order, schema validation against SPANS_SCHEMA before
reading, column pushdown forwarding, write-format selection before
execution — is executed rather than dead code.
"""

from __future__ import annotations

import sys
import types

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocrs_ray.corpus import ensure_corpus

CORPUS_ROOT = "/tmp/ocrs_ray_test_corpus/docs100"


@pytest.fixture(scope="module")
def corpus():
    return ensure_corpus(CORPUS_ROOT, n_docs=100, n_templates=16)


@pytest.fixture()
def fake_lance(monkeypatch, corpus):
    """Install a mock `lance` module whose dataset() serves the corpus
    spans schema, and reroute rd.read_lance to the parquet reader so
    the Lance branch executes end-to-end."""
    import ray.data as rd

    calls: dict = {}
    mod = types.ModuleType("lance")

    from ocrs_ray.pipeline import _first_file

    def dataset(path):
        calls["dataset_path"] = path
        ds = types.SimpleNamespace()
        ds.schema = pq.ParquetFile(_first_file(corpus["spans"])).schema_arrow
        return ds

    mod.dataset = dataset
    monkeypatch.setitem(sys.modules, "lance", mod)

    def read_lance(path, columns=None, **kwargs):
        calls["read_path"] = path
        calls["read_columns"] = columns
        return rd.read_parquet(corpus["spans"], columns=columns)

    monkeypatch.setattr(rd, "read_lance", read_lance)
    return calls, mod


def test_read_spans_lance_branch_executes(ray_session, corpus, fake_lance):
    from ocrs_ray.pipeline import _lance_available, read_spans_lance

    calls, _ = fake_lance
    assert _lance_available()  # probe sees the module + Ray surface
    ds = read_spans_lance("/fake/table.lance")
    # Schema validated against the LANCE dataset's schema, path and
    # column pushdown forwarded to rd.read_lance.
    assert calls["dataset_path"] == "/fake/table.lance"
    assert calls["read_path"] == "/fake/table.lance"
    assert calls["read_columns"] is None
    assert ds.count() == pq.read_table(corpus["spans"]).num_rows

    read_spans_lance("/fake/table.lance", columns=["doc_id"])
    assert calls["read_columns"] == ["doc_id"]


def test_read_spans_lance_validates_schema(ray_session, fake_lance, monkeypatch):
    """A Lance table with the wrong schema must fail BEFORE any read
    task launches — the same validate-at-read contract as parquet."""
    calls, mod = fake_lance

    def bad_dataset(path):
        ds = types.SimpleNamespace()
        ds.schema = pa.schema([("wrong", pa.int64())])
        return ds

    monkeypatch.setattr(mod, "dataset", bad_dataset)
    from ocrs_ray.pipeline import read_spans_lance

    with pytest.raises(ValueError):
        read_spans_lance("/fake/bad.lance")
    assert "read_path" not in calls  # never reached the reader


def test_read_spans_lance_falls_back_without_pylance(ray_session, corpus):
    """Without the lance module the same call serves parquet — the
    sandbox default path, asserted explicitly so the fallback can't
    silently break."""
    assert "lance" not in sys.modules or not hasattr(
        sys.modules.get("lance"), "__file__"
    )
    from ocrs_ray.pipeline import _lance_available, read_spans_lance

    assert not _lance_available()
    ds = read_spans_lance(corpus["spans"])
    assert ds.count() == pq.read_table(corpus["spans"]).num_rows


def test_write_spans_lance_branch(ray_session, corpus, fake_lance, monkeypatch):
    """write_spans picks Lance by capability probe BEFORE execution."""
    import ray.data as rd

    from ocrs_ray.pipeline import read_spans, write_spans

    ds = read_spans(corpus["spans"])
    written: dict = {}
    monkeypatch.setattr(
        rd.Dataset, "write_lance", lambda self, path: written.setdefault("path", path)
    )
    write_spans(ds, "/fake/out.lance")
    assert written["path"] == "/fake/out.lance"


def test_write_spans_parquet_fallback(ray_session, corpus, tmp_path):
    import ray.data as rd

    from ocrs_ray.pipeline import read_spans, write_spans

    out = str(tmp_path / "spans_out")
    write_spans(read_spans(corpus["spans"]), out)
    back = rd.read_parquet(out)
    assert back.count() == pq.read_table(corpus["spans"]).num_rows
