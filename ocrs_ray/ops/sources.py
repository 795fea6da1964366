"""Alternate ingestion formats for the documents table.

The reference ingests one image file per process invocation
(`/root/reference/ocrs-cli/src/main.rs:319-323`); at corpus scale the
equivalent surface is "get external text shards into the engine's
documents schema". Parquet is the native format everywhere else in
this repo; these readers cover the two interchange formats corpora
actually arrive in — JSONL (one document object per line, the common
crawl-dump/export shape) and CSV — normalized to the exact
documents schema so every downstream operator runs unchanged.

Both map to Ray Data's native distributed readers (`read_json` /
`read_csv`): each input file becomes read task(s) that stream blocks
into the pipeline — no driver-side parsing, and a directory of shards
parallelizes across the cluster exactly like parquet row groups.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data as rd

__all__ = [
    "DOCUMENTS_SCHEMA",
    "documents_from_jsonl",
    "documents_from_csv",
]

#: The documents table contract (TESTDATA.md): every reader must land
#: exactly here so downstream ops are format-agnostic.
DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)

_COLUMNS = [f.name for f in DOCUMENTS_SCHEMA]


def _normalize(batch: pa.Table) -> pa.Table:
    """Project to the documents schema (column order AND types): JSON
    integers arrive as int64 already; CSV may infer int32/strings —
    cast instead of trusting inference."""
    arrays = [
        batch.column(name).cast(DOCUMENTS_SCHEMA.field(name).type)
        for name in _COLUMNS
    ]
    return pa.table(dict(zip(_COLUMNS, arrays)))


def documents_from_jsonl(path: str) -> rd.Dataset:
    """Documents from newline-delimited JSON (one object per line,
    `.jsonl` / `.json`). Text with embedded newlines is safe (JSON
    escapes them); unknown extra keys are dropped by the projection."""
    return rd.read_json(path, file_extensions=["jsonl", "json"]).map_batches(
        _normalize, batch_format="pyarrow"
    )


def documents_from_csv(path: str) -> rd.Dataset:
    """Documents from CSV with a header row. `newlines_in_values` is
    on because document text legitimately contains newlines inside
    quoted fields — without it the reader splits mid-document (the
    silent-corruption failure mode of naive CSV ingestion)."""
    return rd.read_csv(
        path,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
    ).map_batches(_normalize, batch_format="pyarrow")
