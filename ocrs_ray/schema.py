"""Declared Arrow schemas for the interleaved spans corpus.

The input shape is authoritative (BASELINE.json `input_hint`):
one row per document with a list of spans; `kind` is "text" or
"media"; `offset` is the span's position key used to restore order.
Schemas are fixed and validated on read, mirroring the reference's
fixed tensor shapes (/root/reference/ocrs/src/preprocess.rs:81-123).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

SPANS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

#: Flattened (exploded) span rows flowing through the OCR stages.
FLAT_SPANS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("offset", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
    ]
)

#: Sidecar media-payload table. Images are opaque binary columns with
#: typed metadata; `format` names the encoding ("raw8-hwc" = raw
#: uint8 height*width*channels bytes). PNG/JPEG decode is gated on an
#: image codec being present in the environment.
MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("image", pa.binary()),
        pa.field("height", pa.int32()),
        pa.field("width", pa.int32()),
        pa.field("channels", pa.int32()),
        pa.field("format", pa.string()),
        pa.field("expected_text", pa.string()),
    ]
)


def validate_schema(actual: pa.Schema, expected: pa.Schema, name: str) -> None:
    for field in expected:
        idx = actual.get_field_index(field.name)
        if idx < 0:
            raise ValueError(f"{name}: missing column {field.name!r}")
        if not actual.field(idx).type.equals(field.type):
            raise ValueError(
                f"{name}: column {field.name!r} has type {actual.field(idx).type}, "
                f"expected {field.type}"
            )
