"""The flagship Ray Data pipeline: interleaved spans -> OCR -> reassembly.

Target lifecycle (SURVEY.md §3.4):

    read spans table
      -> map_batches(explode_spans)            # flatten to one row/span
      -> map_batches(OcrSpanProcessor, ...)    # actor pool: decode +
             detect + layout + recognize media spans; text passthrough
      -> repartition(keys=["doc_id"])          # the one shuffle
      -> map_batches(reassemble_block)         # vectorized re-stitching
      -> write_parquet / return

Every output row satisfies span-sequence equality (kind, text,
media_ref, order) against the per-image engine's golden outputs.

Scale notes:
- media payloads are resolved from a broadcast store (`ray.put` once,
  `ray.get` in each actor's __init__) when the media table is small; a
  bucketed hash join path covers large media tables (see
  `ocrs_ray.media`).
- the reassembly shuffle is hash-partitioned by doc_id; within-block
  reassembly is fully vectorized (no per-doc Python calls).
- ordering never relies on block arrival order: every span carries
  (doc_id, offset), mirroring the reference's re-sort by line index
  (/root/reference/ocrs/src/recognition.rs:530-535).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from .corpus import make_engine
from .schema import FLAT_SPANS_SCHEMA, SPAN_STRUCT, SPANS_SCHEMA, validate_schema

__all__ = [
    "OcrPipelineConfig",
    "explode_spans",
    "OcrSpanProcessor",
    "OcrLayoutProcessor",
    "reassemble_block",
    "read_spans",
    "read_spans_lance",
    "write_spans",
    "build_ocr_pipeline",
    "build_ocr_pipeline_joined",
    "OcrInlineProcessor",
    "load_media_store",
]


@dataclass
class OcrPipelineConfig:
    """Tuning knobs for the OCR pipeline stages."""

    #: rows per batch into the OCR actor pool. Media rows carry decoded
    #: images transiently, so this bounds peak memory per actor. It is
    #: also the actor-pool TASK granularity: batches per stage must
    #: comfortably exceed pool size or stragglers bound the stage
    #: (measured at 8k docs / 24 actors: 256 -> 22 tasks, 8.8-9.2 s;
    #: 64 -> 64 tasks, 6.5-7.7 s in alternating same-session runs;
    #: 16 is past the knee - per-task overhead wins).
    ocr_batch_size: int = 64
    #: OCR actor pool size (fixed int or (min, max) tuple).
    ocr_concurrency: Any = 4
    #: CPUs reserved per OCR actor.
    ocr_num_cpus: float = 1.0
    #: GPUs reserved per OCR actor (north-star: detection/recognition
    #: weights live in GPU actor pools on a real cluster). 0 keeps the
    #: stage CPU-only — the only mode testable in this sandbox; >0 maps
    #: the SAME pipeline onto GPU actors (fractional values pack
    #: multiple actors per device).
    ocr_num_gpus: float = 0.0
    #: number of hash partitions for the reassembly shuffle. Scale to
    #: ~2-4x total cores; at cluster scale, to total cores across nodes.
    reassemble_partitions: int = 16
    #: memoize per-media_ref OCR results inside each actor (exact dedup
    #: of repeated media fetches; templates repeat in the corpus).
    cache_media: bool = True
    #: factory for the per-actor engine (fake models by default).
    engine_factory: Callable = make_engine
    #: name of a MetricsActor to flush per-batch lineage counters to
    #: (see ocrs_ray.state.metrics); None disables flushing.
    metrics_name: str | None = None
    #: pre-OCR skew control: LPT-balance spans across this many
    #: partitions by estimated pixel volume, then hash-shuffle on the
    #: bin id so no OCR partition carries a disproportionate pixel
    #: load (north-rule "repartitioning by estimated pixel volume").
    #: 0 disables (default: the actor pool's pull-based batch
    #: scheduling already absorbs moderate skew; enable for
    #: heavy-tailed media sizes where whole batches can be hot).
    #: Measured crossover (tools/whale_skew_proof.py, BASELINE.md): 8
    #: batch-clustered whales at 117x tile pixel volume — balancing
    #: HURTS (exchange overhead); at 469x it wins 2.4x and at 2930x
    #: 4.3x. Enable when whale_pixels x whales_per_batch rivals
    #: rest_of_corpus / pool_size AND the tail is clustered in the
    #: input order; randomly-placed whales rarely cross it.
    balance_partitions: int = 0
    #: "raise" aborts the job on a bad media span (exact-parity mode);
    #: "quarantine" emits the span with empty text, counts it in the
    #: poison_rows metric, and keeps the job running (SURVEY.md §4:
    #: poison-row quarantine instead of job abort — one corrupt
    #: payload must not kill a 10^12-row run).
    on_error: str = "raise"


def read_spans(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read the spans table, validating the declared schema."""
    import pyarrow.parquet as pq

    enable_hash_shuffle()
    validate_schema(pq.ParquetFile(_first_file(path)).schema_arrow, SPANS_SCHEMA, "spans")
    return rd.read_parquet(path, columns=columns)


def _lance_available() -> bool:
    """Capability probe (no execution wrapped in except): pylance
    importable AND this Ray version exposes the Lance IO surface."""
    try:
        import lance  # noqa: F401  (optional dependency)
    except ImportError:
        return False
    return hasattr(rd, "read_lance")


def read_spans_lance(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read the spans table from a Lance dataset (the north-star input
    format: fragment-aligned random access + column pruning), falling
    back to parquet when pylance is not installed (this sandbox).
    `ray.data.read_lance` streams fragments exactly like read_parquet
    streams row groups, so the rest of the pipeline is format-agnostic.
    Mirrors the `read_spans` contract: hash shuffle enabled BEFORE
    dataset creation (contexts snapshot at creation) and the declared
    schema validated at read time, not deep inside explode_spans.
    """
    if _lance_available():
        import lance

        enable_hash_shuffle()
        validate_schema(lance.dataset(path).schema, SPANS_SCHEMA, "spans")
        return rd.read_lance(path, columns=columns)
    return read_spans(path, columns)


def write_spans(ds: rd.Dataset, path: str) -> None:
    """Write the output spans table — Lance when available (fragment
    commits give the checkpoint granularity the resume path keys on),
    else partitioned parquet (same resumability via file-per-shard).
    Format is chosen by capability probe BEFORE execution so an
    exception raised inside an upstream UDF propagates instead of
    silently re-executing the pipeline into a mixed-format directory."""
    if _lance_available() and hasattr(ds, "write_lance"):
        ds.write_lance(path)
    else:
        ds.write_parquet(path)


def _first_file(path: str) -> str:
    import os

    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    return os.path.join(root, f)
        if any(f.endswith(".lance") for f in os.listdir(path)) or os.path.isdir(
            os.path.join(path, "data")
        ):
            raise RuntimeError(
                f"{path} looks like a Lance dataset but pylance is not "
                "installed; install it or re-write the table as parquet"
            )
    return path


def explode_spans(batch: pa.Table) -> pa.Table:
    """Flatten (doc_id, spans) rows to one row per span (vectorized)."""
    t = batch.combine_chunks()
    col = t.column("spans")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parent = pc.list_parent_indices(col)
    flat = pc.list_flatten(col)
    return pa.table(
        {
            "doc_id": pc.take(t.column("doc_id"), parent),
            "offset": flat.field("offset"),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )


def load_media_store(media_path: str) -> dict[str, tuple[bytes, int, int, int, str]]:
    """Load the media sidecar table into a payload dict."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        media_path, columns=["media_ref", "image", "height", "width", "channels", "format"]
    )
    return {
        r["media_ref"]: (r["image"], r["height"], r["width"], r["channels"], r["format"])
        for r in t.to_pylist()
    }


def decode_media(payload: tuple[bytes, int, int, int, str]) -> np.ndarray:
    """Decode an opaque media payload to an HWC uint8 array.

    "raw8-hwc" is a zero-parse numpy view; "png" decodes for real via
    the stdlib-zlib codec in `ocrs_ray.png` (grey/RGB/RGBA/palette,
    bit depths 1-16, all five filters, Adam7 interlacing); "jpeg"/
    "jpg" decodes for real via the
    pure-numpy codec in `ocrs_ray.jpeg` (baseline + progressive
    Huffman, 8-bit, the subset covering the reference's own fixture
    set — ocrs-cli decodes via the `image` crate,
    /root/reference/ocrs-cli/src/main.rs:312-323); "webp" decodes BOTH
    halves for real via pure-numpy codecs: lossless VP8L and lossy VP8
    keyframes (boolean arithmetic decoder, full intra prediction,
    normal+simple loop filters — `ocrs_ray.vp8`, bit-exact against
    libwebp in tests), VP8X containers with ALPH alpha planes, and
    animated WebP (ANIM/ANMF frame compositing — decode yields the
    first composited frame, like the `image` crate's `read_image`;
    `webp.decode_webp_frames` exposes the full sequence).
    """
    blob, h, w, c, fmt = payload
    if fmt == "raw8-hwc":
        return np.frombuffer(blob, dtype=np.uint8).reshape(h, w, c)
    if fmt == "png":
        from .png import decode_png

        return decode_png(blob)
    if fmt in ("jpeg", "jpg"):
        from .jpeg import decode_jpeg

        return decode_jpeg(blob)
    if fmt == "webp":
        from .webp import decode_webp

        return decode_webp(blob)
    raise ValueError(f"unknown media format: {fmt}")


class OcrSpanProcessor:
    """Actor-pool stage: OCR media spans, pass text spans through.

    State (media store + both models) is built once per actor in
    `__init__`; each `__call__` handles one Arrow batch of flattened
    span rows. Mirrors the stateful-stage mapping of SURVEY.md §2.3
    (A1/A2): model weights load once, work is per-batch.
    """

    def __init__(
        self,
        media_store: Any,
        engine_factory: Callable = make_engine,
        cache_media: bool = True,
        metrics_name: str | None = None,
        on_error: str = "raise",
    ):
        if on_error not in ("raise", "quarantine"):
            raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
        self.on_error = on_error
        self.n_poison = 0
        if isinstance(media_store, ray.ObjectRef):
            self.media = ray.get(media_store)
        elif isinstance(media_store, str):
            self.media = load_media_store(media_store)
        else:
            self.media = media_store
        self.engine = engine_factory()
        self.cache: dict[str, str] | None = {} if cache_media else None
        # lineage counters, flushed per batch (fire-and-forget) to the
        # named metrics actor when one is configured.
        self.n_media = 0
        self.n_pixels = 0
        self._metrics = None
        if metrics_name is not None:
            try:
                self._metrics = ray.get_actor(metrics_name)
            except ValueError:
                pass

    def _ocr_one(self, ref: str) -> str:
        self.n_media += 1  # spans processed (cache hits included)
        if self.cache is not None and ref in self.cache:
            return self.cache[ref]
        payload = self.media.get(ref)
        if payload is None:
            raise KeyError(f"unresolved media_ref: {ref}")
        img = decode_media(payload)
        inp = self.engine.prepare_input(img, order="hwc")
        text = self.engine.get_text(inp)
        self.n_pixels += img.shape[0] * img.shape[1]
        if self.cache is not None:
            self.cache[ref] = text
        return text

    def _ocr_or_quarantine(self, ref: str, doc_id: str) -> str:
        if self.on_error == "raise":
            return self._ocr_one(ref)
        try:
            return self._ocr_one(ref)
        except Exception as exc:  # poison row: empty text, keep going
            self.n_poison += 1
            import logging

            logging.getLogger(__name__).warning(
                "quarantined media span doc_id=%s media_ref=%s: %r", doc_id, ref, exc
            )
            return ""

    def _flush_metrics(self) -> None:
        if self._metrics is not None and (self.n_media or self.n_pixels or self.n_poison):
            self._metrics.add.remote(
                {
                    "media_spans": self.n_media,
                    "pixels": self.n_pixels,
                    "poison_rows": self.n_poison,
                }
            )
            self.n_media = 0
            self.n_pixels = 0
            self.n_poison = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        kind = batch.column("kind")
        media_mask = pc.equal(kind, "media")
        if pc.sum(media_mask).as_py() in (0, None):
            return batch
        idx = np.flatnonzero(media_mask.combine_chunks().to_numpy(zero_copy_only=False))
        refs = batch.column("media_ref").take(pa.array(idx)).to_pylist()
        docs = batch.column("doc_id").take(pa.array(idx)).to_pylist()
        ocr_texts = [
            self._ocr_or_quarantine(ref, doc) for ref, doc in zip(refs, docs)
        ]
        self._flush_metrics()
        text = batch.column("text").to_pylist()
        for i, t in zip(idx, ocr_texts):
            text[i] = t
        out = batch.set_column(
            batch.schema.get_field_index("text"), "text", pa.array(text, type=pa.string())
        )
        return out


class OcrLayoutProcessor:
    """Actor-pool stage: media spans -> HierText-style layout JSON.

    The Ray-level S6 sink (SURVEY.md §2.1): per media span, the full
    staged engine surface (detect_words -> find_text_lines ->
    recognize_text) with word/line rotated-rect vertices serialized as
    a deterministic JSON column, mirroring the reference's JSON output
    (/root/reference/ocrs-cli/src/output.rs:29-101).
    """

    def __init__(self, media_store: Any, engine_factory: Callable = make_engine):
        if isinstance(media_store, ray.ObjectRef):
            self.media = ray.get(media_store)
        elif isinstance(media_store, str):
            self.media = load_media_store(media_store)
        else:
            self.media = media_store
        self.engine = engine_factory()
        self.cache: dict[str, str] = {}

    def _layout_one(self, ref: str) -> str:
        import json

        if ref in self.cache:
            return self.cache[ref]
        payload = self.media.get(ref)
        if payload is None:
            raise KeyError(f"unresolved media_ref: {ref}")
        img = decode_media(payload)
        inp = self.engine.prepare_input(img, order="hwc")
        words = self.engine.detect_words(inp)
        lines = self.engine.find_text_lines(inp, words)
        text_lines = self.engine.recognize_text(inp, lines)
        from .output import ocr_json

        doc = ocr_json(ref, (img.shape[0], img.shape[1]), text_lines)
        out = json.dumps(doc, sort_keys=True, separators=(",", ":"))
        self.cache[ref] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "offset": batch.column("offset"),
                "media_ref": batch.column("media_ref"),
                "layout_json": pa.array(
                    [self._layout_one(r) for r in refs], type=pa.string()
                ),
            }
        )


class OcrInlineProcessor:
    """OCR media-span rows whose payload arrived inline via a shuffle
    join (columns image/height/width/channels/format joined onto the
    span rows). The large-media-table counterpart of OcrSpanProcessor:
    no broadcast store, state is just the engine."""

    def __init__(
        self,
        engine_factory: Callable = make_engine,
        cache_media: bool = True,
        on_error: str = "raise",
    ):
        if on_error not in ("raise", "quarantine"):
            raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
        self.engine = engine_factory()
        self.cache: dict[str, str] | None = {} if cache_media else None
        self.on_error = on_error

    def _ocr_payload(self, ref: str, payload: tuple) -> str:
        if self.cache is not None and ref in self.cache:
            return self.cache[ref]
        try:
            if payload[0] is None:
                # Left-outer join miss: the media table has no row for
                # this ref. Same semantics as the broadcast store miss.
                raise KeyError(f"unresolved media_ref: {ref}")
            img = decode_media(payload)
            inp = self.engine.prepare_input(img, order="hwc")
            text = self.engine.get_text(inp)
        except Exception:
            if self.on_error == "raise":
                raise
            text = ""
        if self.cache is not None:
            self.cache[ref] = text
        return text

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        blobs = batch.column("image").to_pylist()
        hs = batch.column("height").to_pylist()
        ws = batch.column("width").to_pylist()
        cs = batch.column("channels").to_pylist()
        fmts = batch.column("format").to_pylist()
        texts = [
            self._ocr_payload(r, (b, h, w, c, f))
            for r, b, h, w, c, f in zip(refs, blobs, hs, ws, cs, fmts)
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "offset": batch.column("offset"),
                "kind": batch.column("kind"),
                "text": pa.array(texts, type=pa.string()),
                "media_ref": batch.column("media_ref"),
            }
        )


def build_ocr_pipeline_joined(
    spans_ds: rd.Dataset,
    media_ds: rd.Dataset,
    config: OcrPipelineConfig | None = None,
    join_partitions: int = 8,
) -> rd.Dataset:
    """OCR pipeline resolving media via a distributed hash join instead
    of a broadcast store — the path for media tables that do NOT fit in
    worker memory (SURVEY.md §2.4: `Dataset.join` on media_ref for
    large). Text spans bypass the join entirely; only media span keys
    and payloads shuffle. The spans input is read twice (text branch +
    media branch) — cheaper than shipping payloads to every task when
    the media table dominates.
    """
    cfg = config or OcrPipelineConfig()
    flat = spans_ds.map_batches(explode_spans, batch_format="pyarrow")
    enable_hash_shuffle(flat)
    enable_hash_shuffle(media_ds)

    text_rows = flat.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "text")), batch_format="pyarrow"
    )
    media_rows = flat.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "media")), batch_format="pyarrow"
    )
    # LEFT join, not inner: an unresolvable media_ref must surface as
    # an error (or quarantined empty span) exactly like the broadcast
    # path — an inner join would silently delete the span and break
    # span-sequence completeness.
    joined = media_rows.join(
        media_ds,
        join_type="left_outer",
        num_partitions=join_partitions,
        on=("media_ref",),
    )
    ocr = joined.map_batches(
        OcrInlineProcessor,
        fn_constructor_kwargs={
            "engine_factory": cfg.engine_factory,
            "cache_media": cfg.cache_media,
            "on_error": cfg.on_error,
        },
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=cfg.ocr_concurrency,
        num_cpus=cfg.ocr_num_cpus,
        **({"num_gpus": cfg.ocr_num_gpus} if cfg.ocr_num_gpus > 0 else {}),
    )
    merged = text_rows.union(ocr)
    partitioned = merged.repartition(cfg.reassemble_partitions, keys=["doc_id"])
    return partitioned.map_batches(
        reassemble_block, batch_format="pyarrow", batch_size=None
    )


class PixelWeigher:
    """Annotate flat span rows with estimated pixel volume.

    Media dims come from a broadcast {media_ref: pixels} dict (built
    from the media table's typed metadata — no payload decode). At
    100 TB the dims column rides in the spans table at ingest or joins
    in by media_ref; the estimate only needs to be proportional, not
    exact (SURVEY.md §4 skew row).
    """

    def __init__(self, dims_store: Any):
        store = (
            ray.get(dims_store)
            if isinstance(dims_store, ray.ObjectRef)
            else dims_store
        )
        # Accept either a ready {ref: pixels} dict or a full media
        # store (payload tuples) — derive dims without decoding.
        first = next(iter(store.values()), None)
        self.dims = media_dims(store) if isinstance(first, tuple) else store

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        px = [
            self.dims.get(r, 0) if k == "media" else 0
            for k, r in zip(kinds, refs)
        ]
        return batch.append_column("pixels", pa.array(px, type=pa.int64()))


def assign_weighted_partitions(
    batch: pa.Table, num_partitions: int, weight_col: str = "pixels"
) -> pa.Table:
    """LPT-bin rows of one block into `num_partitions` weight-balanced
    bins (heaviest rows first onto the lightest bin). Per-block binning
    composes with the cross-block hash shuffle on the bin id: each
    block is balanced, so the union of blocks per bin is too.
    """
    import heapq

    w = batch.column(weight_col).to_numpy(zero_copy_only=False)
    order = np.argsort(-w, kind="stable")
    bins = [(0, b) for b in range(num_partitions)]
    heapq.heapify(bins)
    assignment = np.empty(len(w), dtype=np.int32)
    for i in order:
        total, b = heapq.heappop(bins)
        assignment[i] = b
        heapq.heappush(bins, (total + int(w[i]), b))
    return batch.append_column("wpart", pa.array(assignment, type=pa.int32()))


def media_dims(media_store: dict) -> dict[str, int]:
    """{media_ref: pixel count} from a loaded media store (metadata
    only, payload untouched)."""
    return {ref: p[1] * p[2] for ref, p in media_store.items()}


def reassemble_block(batch: pa.Table) -> pa.Table:
    """Re-stitch flattened span rows into per-document span lists.

    Requires all rows of a doc_id to be in the same batch (guaranteed by
    the preceding hash repartition on doc_id with batch_size=None).
    Sorts by (doc_id, offset) and builds the list column with run-length
    offsets — no per-doc Python.
    """
    t = batch.combine_chunks().sort_by(
        [("doc_id", "ascending"), ("offset", "ascending")]
    )
    if t.num_rows == 0:
        return pa.table({"doc_id": [], "spans": []}, schema=SPANS_SCHEMA)
    doc = t.column("doc_id").combine_chunks()
    d = doc.to_numpy(zero_copy_only=False)
    change = np.flatnonzero(d[1:] != d[:-1]) + 1
    offsets = np.concatenate([[0], change, [len(d)]]).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [
            t.column("kind").combine_chunks(),
            t.column("text").combine_chunks(),
            t.column("media_ref").combine_chunks(),
            t.column("offset").combine_chunks(),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
    doc_ids = doc.take(pa.array(offsets[:-1].astype(np.int64)))
    return pa.table({"doc_id": doc_ids, "spans": spans}, schema=SPANS_SCHEMA)


def cluster_ncpu(default: int = 8) -> int:
    """CPU budget of the current Ray cluster (fallback when Ray is not
    yet initialized). The single source of truth for pool/partition
    sizing — keep callers on this helper so the fallback can't diverge."""
    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", default))
    return default


def default_npart() -> int:
    """Default keyed-exchange partition count: scale with the cluster
    but cap at 16 — a larger hash exchange at a small test session
    starves the shuffle aggregators ("Limited available CPU resources
    for hash shuffle") and the query crawls. ONE copy of the test-
    scale rule; real deployments pass npart explicitly."""
    return max(2, min(16, cluster_ncpu()))


def enable_hash_shuffle(ds: rd.Dataset | None = None) -> bool:
    """Switch Ray Data to the hash-shuffle strategy (needed for
    key-based repartition; also the right all-to-all strategy for the
    reassembly exchange at scale). Returns False when unavailable.

    Datasets snapshot the DataContext at creation, so this must run
    before `read_parquet` — or pass the dataset to patch its captured
    context.
    """
    try:
        from ray.data.context import ShuffleStrategy

        ncpu = cluster_ncpu()
        contexts = [rd.DataContext.get_current()]
        if ds is not None and getattr(ds, "context", None) is not None:
            contexts.append(ds.context)
        for ctx in contexts:
            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            # Defaults (64 aggregators, 200 partitions, 300 s min wait)
            # are sized for big clusters; cap to the local CPU budget so
            # shuffle actors don't starve the map stages on a small node.
            # On a real multi-node cluster the defaults scale back up
            # with cluster_resources().
            # Aggregator actors poll even when idle; one per ~4 CPUs is
            # plenty for the small shuffle payloads here and keeps them
            # from stealing cycles from compute actors.
            ctx.max_hash_shuffle_aggregators = max(2, ncpu // 4)
            # Default shuffle parallelism is 200 partitions; at 200 x
            # 1/16 CPU the aggregators alone want 12.5 CPUs and starve
            # the map stages on a small node. Scale partitions to the
            # CPU budget (a real cluster raises this automatically).
            ctx.default_hash_shuffle_parallelism = max(8, ncpu)
            # Aggregators start in well under a second on a local
            # cluster; the 300 s default (and even 5 s) adds dead time
            # to every shuffle-bearing query.
            ctx.min_hash_shuffle_aggregator_wait_time_in_s = 1
        return True
    except Exception:
        return False


def build_ocr_pipeline(
    spans_ds: rd.Dataset,
    media_store: Any,
    config: OcrPipelineConfig | None = None,
    reassemble: bool = True,
) -> rd.Dataset:
    """Compose the full OCR pipeline lazily (nothing executes here).

    `media_store` may be a dict, a `ray.ObjectRef` to a dict (broadcast
    once — preferred), or a path to the media parquet (each actor loads
    it itself; useful when the object store is tight).
    """
    cfg = config or OcrPipelineConfig()
    if isinstance(media_store, dict):
        media_store = ray.put(media_store)

    flat = spans_ds.map_batches(explode_spans, batch_format="pyarrow")
    if cfg.balance_partitions > 0:
        enable_hash_shuffle(flat)
        flat = (
            flat.map_batches(
                PixelWeigher,
                fn_constructor_args=(media_store,),
                batch_format="pyarrow",
                concurrency=(1, 2),
            )
            .map_batches(
                assign_weighted_partitions,
                fn_kwargs={"num_partitions": cfg.balance_partitions},
                batch_format="pyarrow",
            )
            .repartition(cfg.balance_partitions, keys=["wpart"])
            .map_batches(
                lambda t: t.drop_columns(["pixels", "wpart"]),
                batch_format="pyarrow",
            )
        )
    ocr = flat.map_batches(
        OcrSpanProcessor,
        fn_constructor_kwargs={
            "media_store": media_store,
            "engine_factory": cfg.engine_factory,
            "cache_media": cfg.cache_media,
            "metrics_name": cfg.metrics_name,
            "on_error": cfg.on_error,
        },
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=cfg.ocr_concurrency,
        num_cpus=cfg.ocr_num_cpus,
        **({"num_gpus": cfg.ocr_num_gpus} if cfg.ocr_num_gpus > 0 else {}),
    )
    if not reassemble:
        return ocr
    if enable_hash_shuffle(ocr):
        partitioned = ocr.repartition(cfg.reassemble_partitions, keys=["doc_id"])
        return partitioned.map_batches(
            reassemble_block, batch_format="pyarrow", batch_size=None
        )
    # Fallback: sort-shuffle groupby; slower (per-group Python) but
    # identical semantics.
    return ocr.groupby("doc_id").map_groups(
        reassemble_block, batch_format="pyarrow"
    )
