"""Round-trip tests for the alternate documents readers: parquet ->
JSONL / CSV on disk -> Ray reader -> value-identical to the parquet
read (same rows, schema, and content — including text containing
newlines, commas, and quotes)."""

from __future__ import annotations

import csv
import json

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    # Make the hard cases explicit: ensure at least one doc exercises
    # embedded newlines / quotes / commas in both formats.
    df = df.copy()
    df.loc[df.index[0], "text"] = 'line one\nline "two", with comma\n'
    df.loc[df.index[0], "n_chars"] = len(df.loc[df.index[0], "text"])
    return df


def _check(out, df):
    got = (
        out.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[df.columns.tolist()]
    )
    exp = df.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_jsonl_roundtrip(ray_session, docs_df, tmp_path):
    from ocrs_ray.ops.sources import documents_from_jsonl

    # Two shards to prove multi-file parallel reads merge correctly.
    half = len(docs_df) // 2
    for i, part in enumerate([docs_df.iloc[:half], docs_df.iloc[half:]]):
        with open(tmp_path / f"docs_{i}.jsonl", "w") as f:
            for rec in part.to_dict("records"):
                f.write(json.dumps(rec) + "\n")
    _check(documents_from_jsonl(str(tmp_path)), docs_df)


def test_csv_roundtrip(ray_session, docs_df, tmp_path):
    from ocrs_ray.ops.sources import documents_from_csv

    docs_df.to_csv(tmp_path / "docs.csv", index=False, quoting=csv.QUOTE_MINIMAL)
    _check(documents_from_csv(str(tmp_path / "docs.csv")), docs_df)


def test_jsonl_gz_roundtrip(ray_session, docs_df, tmp_path):
    import gzip

    from ocrs_ray.ops.sources import documents_from_jsonl_gz

    # Two gzip shards: proves per-file decompression inside read tasks
    # and multi-shard merge.
    half = len(docs_df) // 2
    for i, part in enumerate([docs_df.iloc[:half], docs_df.iloc[half:]]):
        with gzip.open(tmp_path / f"docs_{i}.jsonl.gz", "wt") as f:
            for rec in part.to_dict("records"):
                f.write(json.dumps(rec) + "\n")
    _check(documents_from_jsonl_gz(str(tmp_path)), docs_df)


def test_partitioned_sink_layout(ray_session, tmp_path):
    """The sink writes one `source=<v>` directory per key and the
    round-tripped rows reconstruct the partition column."""
    import os

    import ray.data as rd

    from ocrs_ray.ops.sources import write_documents_partitioned

    df = pd.DataFrame(
        {"doc_id": range(6), "source": ["a", "a", "b", "b", "b", "c"]}
    )
    write_documents_partitioned(rd.from_pandas(df), str(tmp_path / "out"))
    dirs = sorted(os.listdir(tmp_path / "out"))
    assert dirs == ["source=a", "source=b", "source=c"]
    back = rd.read_parquet(str(tmp_path / "out")).to_pandas()
    got = back.sort_values("doc_id").reset_index(drop=True)[["doc_id", "source"]]
    got["doc_id"] = got["doc_id"].astype("int64")
    pd.testing.assert_frame_equal(got, df, check_dtype=False)


def test_webdataset_shard_kernel_roundtrip_and_determinism():
    # Pure kernel, no Ray: tar encode -> decode is the identity on the
    # documents columns (including newline/quote/unicode text), and
    # encoding is byte-deterministic (mtime pinned, stable ordering).
    from ocrs_ray.ops.sources import (
        decode_webdataset_shard,
        encode_webdataset_shard,
    )

    cols = {
        "doc_id": [42, 7, 100000],
        "text": ['line one\nline "two", with comma\n', "", "héllo wörld ☃"],
        "lang": ["en", "de", "fr"],
        "source": ["web", "books", "web"],
        "n_chars": [33, 0, 13],
    }
    raw = encode_webdataset_shard(cols)
    assert raw == encode_webdataset_shard({k: list(v) for k, v in cols.items()})
    back = decode_webdataset_shard(raw)
    # Decode regroups by zero-padded key, i.e. doc_id ascending.
    order = sorted(range(len(cols["doc_id"])), key=lambda i: cols["doc_id"][i])
    for name, vals in cols.items():
        assert back[name] == [vals[i] for i in order], name


def test_token_class_re_tri_engine_agreement():
    # Pin the dup-gram tokenizer contract: the explicit ASCII
    # whitespace complement tokenizes identically under Python re,
    # Arrow RE2 and DuckDB RE2 — including Unicode whitespace (NBSP,
    # thin space, line separator), where \S would diverge.
    import re

    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    from ocrs_ray.ops.text import TOKEN_CLASS_RE

    con = duckdb.connect()
    texts = [
        "a b c d e f",
        "x y z",
        "a  b",
        "plain text only here",
        "tab\there\nnow",
        "",
    ]
    for t in texts:
        py = re.findall(TOKEN_CLASS_RE, t)
        rx = con.execute(
            "SELECT regexp_extract_all(?, ?)", [t, TOKEN_CLASS_RE]
        ).fetchone()[0]
        arrow_n = pc.count_substring_regex(
            pa.array([t]), pattern=TOKEN_CLASS_RE
        )[0].as_py()
        assert py == rx, (repr(t), py, rx)
        assert arrow_n == len(py), (repr(t), arrow_n, len(py))


def test_generic_tar_kernel_property_roundtrip():
    # encode_shard_samples / decode_shard_samples are the shared tar
    # walk under both the documents (.txt) and media (.bin) formats:
    # roundtrip must be the identity (sorted by key) for arbitrary
    # binary payloads and json-able metadata, and byte-deterministic.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocrs_ray.ops.sources import decode_shard_samples, encode_shard_samples

    keys = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789-_", min_size=1, max_size=20
    )
    metas = st.dictionaries(
        st.text(alphabet="abcxyz", min_size=1, max_size=8),
        st.one_of(st.integers(-1000, 1000), st.text(max_size=12)),
        max_size=4,
    )

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(keys, st.binary(max_size=64), metas),
            max_size=8,
            unique_by=lambda s: s[0],
        ),
        st.sampled_from([".bin", ".txt"]),
    )
    def check(items, ext):
        raw = encode_shard_samples(items, ext)
        assert raw == encode_shard_samples(list(items), ext)
        back = decode_shard_samples(raw, ext)
        assert back == sorted(items, key=lambda s: s[0])

    check()


def test_webdataset_rerun_overwrites_stale_shards(ray_session, tmp_path):
    # A rerun with DIFFERENT block boundaries must not leave stale
    # shards behind (they would read back as duplicate documents).
    import glob

    import ray.data as rd

    from ocrs_ray.ops.sources import (
        documents_from_webdataset,
        write_documents_webdataset,
    )

    out = str(tmp_path / "wds")
    ds = rd.read_parquet(f"{SF}/documents.parquet")
    write_documents_webdataset(ds, out)
    n_first = len(glob.glob(f"{out}/shard-*.tar"))
    write_documents_webdataset(ds.repartition(3), out)
    n_second = len(glob.glob(f"{out}/shard-*.tar"))
    assert n_second == 3 and n_first != n_second
    assert documents_from_webdataset(out).count() == 500


def test_compaction_reduces_files_and_preserves_content(ray_session, tmp_path):
    """compact_partitioned_corpus: a fragmented Hive layout (8 writer
    blocks x per-source files) compacts to ~one file per source with
    every row intact."""
    import glob

    import ray.data as rd

    from ocrs_ray.ops.sources import compact_partitioned_corpus

    ds = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    frag = str(tmp_path / "frag")
    comp = str(tmp_path / "comp")
    ds.repartition(8).write_parquet(frag, partition_cols=["source"])
    n_before = len(glob.glob(f"{frag}/*/*.parquet"))
    n_after = compact_partitioned_corpus(frag, comp)
    n_sources = len(glob.glob(f"{frag}/source=*"))
    assert n_before > n_sources  # genuinely fragmented
    assert n_after < n_before
    assert n_after <= 2 * n_sources  # ~1 file/source at this scale
    a = (
        rd.read_parquet(comp)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    cols = sorted(b.columns)
    import pandas as pd

    pd.testing.assert_frame_equal(a[cols], b[cols], check_dtype=False)


def test_sorted_sink_files_have_disjoint_ts_ranges(ray_session, tmp_path):
    """The sort-clustered events layout: after a global ts sort +
    write, per-file ts [min, max] ranges must be pairwise disjoint —
    the property that lets a time-window filter prune whole files at
    the metadata level (an unsorted write interleaves ranges and
    prunes nothing)."""
    import pyarrow.parquet as pq_mod
    import ray.data as rd

    out = str(tmp_path / "sorted")
    rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"]).sort(
        "ts"
    ).write_parquet(out)
    import glob

    files = sorted(glob.glob(f"{out}/*.parquet"))
    spans = []
    total = 0
    for f in files:
        md = pq_mod.ParquetFile(f).metadata
        total += md.num_rows
        if md.num_rows == 0:
            continue
        t = pq_mod.read_table(f, columns=["ts"])
        ts = t.column("ts").to_pandas()
        spans.append((ts.min(), ts.max()))
    assert total == 1000  # nothing lost by the sort+write
    assert len(spans) > 1  # genuinely multiple files -> prunable units
    spans.sort()
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(spans, spans[1:]):
        assert hi_a <= lo_b  # disjoint, in order
