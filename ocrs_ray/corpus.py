"""Deterministic synthetic corpus of interleaved text+media documents.

Mirrors the reference's test-fixture strategy (synthetic white-rect
images + fake models with exactly known outputs,
/root/reference/ocrs/src/lib.rs:315-422) scaled up to a corpus:

- a pool of distinct image templates (white word-rects on black, with
  occasional large canvases for pixel-volume skew);
- per-template golden `expected_text` computed once by the per-image
  engine (the same golden-update pattern as the reference's e2e
  harness, /root/reference/tools/test-e2e.py:68-71);
- documents whose spans interleave text spans with media spans that
  reference templates by `media_ref`.

Everything is seeded; the same (seed, n_docs) always produces
byte-identical parquet.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .engine import OcrEngine, OcrEngineParams
from .models import FakeDetectionModel, FakeRecognitionModel, make_fake_alphabet
from .schema import MEDIA_SCHEMA, SPANS_SCHEMA

__all__ = [
    "make_engine",
    "gen_media_templates",
    "gen_audio_clips",
    "generate_corpus",
    "corpus_paths",
    "ensure_corpus",
    "ensure_audio",
]

DEFAULT_SEED = 42


def make_engine(decode_method: str = "greedy") -> OcrEngine:
    """The deterministic fake-model engine used for goldens and stages."""
    return OcrEngine(
        OcrEngineParams(
            detection_model=FakeDetectionModel(),
            recognition_model=FakeRecognitionModel(),
            alphabet=make_fake_alphabet(),
            decode_method=decode_method,
        )
    )


def _render_template(rng: np.random.Generator, large: bool) -> np.ndarray:
    """One synthetic image: white word rects on a black canvas (HWC u8).

    Small canvases follow gen_test_image's geometry (100x200, 20x50
    words at y=30, x=k*70, /root/reference/ocrs/src/lib.rs:319-333);
    large canvases are 600x800 grids to exercise pixel-volume skew.
    """
    if large:
        h, w = 600, 800
        n_lines = int(rng.integers(2, 6))
        n_words = int(rng.integers(2, 6))
    else:
        h, w = 100, 200
        n_lines = int(rng.integers(1, 3))
        n_words = int(rng.integers(1, 3))
    channels = int(rng.choice([1, 3]))
    img = np.zeros((h, w, channels), dtype=np.uint8)
    for line in range(n_lines):
        y = 30 + line * 40
        if y + 20 >= h:
            break
        for k in range(n_words):
            x = k * 70
            if x + 50 >= w:
                break
            img[y : y + 20, x : x + 50, :] = 255
    return img


def gen_media_templates(
    n_templates: int = 64, seed: int = DEFAULT_SEED, large_frac: float = 0.05
) -> pa.Table:
    """Template pool with golden expected_text per template."""
    rng = np.random.default_rng(seed)
    engine = make_engine()
    refs, blobs, hs, ws, cs, fmts, texts = [], [], [], [], [], [], []
    for i in range(n_templates):
        large = rng.random() < large_frac
        img = _render_template(rng, large)
        golden = engine.get_text(engine.prepare_input(img, order="hwc"))
        refs.append(f"img-{i:04d}")
        blobs.append(img.tobytes())
        hs.append(img.shape[0])
        ws.append(img.shape[1])
        cs.append(img.shape[2])
        fmts.append("raw8-hwc")
        texts.append(golden)
    return pa.table(
        {
            "media_ref": refs,
            "image": blobs,
            "height": hs,
            "width": ws,
            "channels": cs,
            "format": fmts,
            "expected_text": texts,
        },
        schema=MEDIA_SCHEMA,
    )


def _gen_docs(
    n_docs: int, media: pa.Table, seed: int
) -> tuple[pa.Table, pa.Table]:
    """Spans table + expected flat output table.

    Per doc: 1-8 spans; most docs mix text and media, ~10% are
    media-free (pass-through check) and ~10% media-only.
    """
    rng = np.random.default_rng(seed + 1)
    n_templates = media.num_rows
    expected_by_ref = dict(
        zip(media.column("media_ref").to_pylist(), media.column("expected_text").to_pylist())
    )
    refs = media.column("media_ref").to_pylist()

    doc_ids = []
    spans_col = []
    f_doc, f_off, f_kind, f_text, f_ref = [], [], [], [], []
    for i in range(n_docs):
        doc_id = f"doc-{i:08d}"
        n_spans = int(rng.integers(1, 9))
        mode = rng.random()
        spans = []
        for off in range(n_spans):
            if mode < 0.1:
                kind = "text"  # media-free doc
            elif mode < 0.2:
                kind = "media"  # media-only doc
            else:
                kind = "media" if rng.random() < 0.4 else "text"
            if kind == "text":
                text = f"text {doc_id} span {off}"
                ref = ""
                out_text = text
            else:
                ref = refs[int(rng.integers(0, n_templates))]
                text = ""
                out_text = expected_by_ref[ref]
            spans.append(
                {"kind": kind, "text": text, "media_ref": ref, "offset": off}
            )
            f_doc.append(doc_id)
            f_off.append(off)
            f_kind.append(kind)
            f_text.append(out_text)
            f_ref.append(ref)
        doc_ids.append(doc_id)
        spans_col.append(spans)

    spans_table = pa.table({"doc_id": doc_ids, "spans": spans_col}, schema=SPANS_SCHEMA)
    expected_flat = pa.table(
        {
            "doc_id": f_doc,
            "offset": pa.array(f_off, type=pa.int32()),
            "kind": f_kind,
            "text": f_text,
            "media_ref": f_ref,
        }
    )
    return spans_table, expected_flat


def corpus_paths(root: str) -> dict[str, str]:
    return {
        "spans": os.path.join(root, "spans.parquet"),
        "media": os.path.join(root, "media.parquet"),
        "expected_flat": os.path.join(root, "expected_flat.parquet"),
        "expected_flat_beam": os.path.join(root, "expected_flat_beam.parquet"),
        "expected_layout": os.path.join(root, "expected_layout.parquet"),
        "expected_media_features": os.path.join(
            root, "expected_media_features.parquet"
        ),
        "expected_thumbnails": os.path.join(root, "expected_thumbnails.parquet"),
        "expected_ahash_neardup": os.path.join(
            root, "expected_ahash_neardup.parquet"
        ),
        "expected_ahash_survivors": os.path.join(
            root, "expected_ahash_survivors.parquet"
        ),
        "expected_video_frames": os.path.join(
            root, "expected_video_frames.parquet"
        ),
        "expected_annotated": os.path.join(root, "expected_annotated.parquet"),
        "expected_text_maps": os.path.join(root, "expected_text_maps.parquet"),
        "expected_line_images": os.path.join(
            root, "expected_line_images.parquet"
        ),
    }


def _media_payloads(media: pa.Table):
    from .sinks import _payloads  # deferred: sinks imports corpus.make_engine

    yield from _payloads(media)


def _golden_media_tables(
    media: pa.Table, expected_flat: pa.Table, max_hamming: int = 2
) -> dict[str, pa.Table]:
    """Single-process golden outputs for the media-derived driver
    queries — the same golden-update pattern as ``expected_flat``
    (reference /root/reference/tools/test-e2e.py:68-71), computed once
    per corpus with NO Ray: direct kernel application per template,
    brute-force all-pairs hamming (banding-free, so it independently
    pins the distributed op's lossless-blocking claim) and a plain
    union-find for survivors."""
    import json

    from .ops.multimodal import (
        MediaAHasher,
        MediaFeatureExtractor,
        MediaThumbnailer,
        VideoFrameSampler,
    )
    from .output import ocr_json
    from .pipeline import decode_media
    from .sinks import digest_blob_columns

    out: dict[str, pa.Table] = {}
    out["expected_media_features"] = MediaFeatureExtractor()(media)

    out["expected_thumbnails"] = digest_blob_columns(
        MediaThumbnailer()(media), {"image": "thumb_md5"}
    ).select(["media_ref", "height", "width", "thumb_md5"])

    out["expected_video_frames"] = VideoFrameSampler()(media).drop_columns(
        ["frame"]
    )

    # Brute-force aHash near-dup pairs + min-label survivors.
    hasher = MediaAHasher()
    refs, hashes = [], []
    for ref, payload in _media_payloads(media):
        refs.append(ref)
        hashes.append(hasher.hash_one(payload))
    order = np.argsort(np.asarray(refs, dtype=object))
    refs = [refs[i] for i in order]
    hashes = [hashes[i] for i in order]
    pa_a, pa_b, pa_d = [], [], []
    parent = {r: r for r in refs}

    def find(r: str) -> str:
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for i in range(len(refs)):
        for j in range(i + 1, len(refs)):
            d = int(bin(hashes[i] ^ hashes[j]).count("1"))
            if d <= max_hamming:
                pa_a.append(refs[i])
                pa_b.append(refs[j])
                pa_d.append(d)
                ra, rb = find(refs[i]), find(refs[j])
                if ra != rb:
                    lo, hi = min(ra, rb), max(ra, rb)
                    parent[hi] = lo
    out["expected_ahash_neardup"] = pa.table(
        {
            "media_a": pa.array(pa_a, type=pa.string()),
            "media_b": pa.array(pa_b, type=pa.string()),
            "hamming": pa.array(pa_d, type=pa.int64()),
        }
    )
    out["expected_ahash_survivors"] = pa.table(
        {
            "media_ref": pa.array(
                [r for r in refs if find(r) == r], type=pa.string()
            )
        }
    )

    # Debug/annotation sink goldens (S7/S8): the sink processors are
    # plain callables over a media table, so the golden IS one
    # single-process application per template, digested to md5.
    from .sinks import (
        AnnotatedImageProcessor,
        LineImageProcessor,
        TextMapProcessor,
    )

    out["expected_annotated"] = digest_blob_columns(
        AnnotatedImageProcessor()(media), {"image": "image_md5"}
    )
    out["expected_text_maps"] = digest_blob_columns(
        TextMapProcessor()(media),
        {"text_map": "text_map_md5", "text_mask": "text_mask_md5"},
    )
    out["expected_line_images"] = digest_blob_columns(
        LineImageProcessor()(media), {"line_image": "line_image_md5"}
    )

    # Layout JSON golden (S6 sink) per media span: the layout is a pure
    # function of the template, joined across the span structure.
    engine = make_engine()
    layout_by_ref: dict[str, str] = {}
    for ref, payload in _media_payloads(media):
        img = decode_media(payload)
        inp = engine.prepare_input(img, order="hwc")
        words = engine.detect_words(inp)
        lines = engine.find_text_lines(inp, words)
        text_lines = engine.recognize_text(inp, lines)
        doc = ocr_json(ref, (img.shape[0], img.shape[1]), text_lines)
        layout_by_ref[ref] = json.dumps(
            doc, sort_keys=True, separators=(",", ":")
        )
    flat = expected_flat
    is_media = np.asarray(flat.column("kind").to_pylist(), dtype=object) == "media"
    media_rows = flat.filter(pa.array(is_media))
    out["expected_layout"] = pa.table(
        {
            "doc_id": media_rows.column("doc_id"),
            "offset": media_rows.column("offset"),
            "media_ref": media_rows.column("media_ref"),
            "layout_json": pa.array(
                [
                    layout_by_ref[r]
                    for r in media_rows.column("media_ref").to_pylist()
                ],
                type=pa.string(),
            ),
        }
    )

    # Beam-decode flat golden: only media-span texts change vs greedy.
    beam_engine = make_engine(decode_method="beam")
    beam_by_ref = {
        ref: beam_engine.get_text(
            beam_engine.prepare_input(decode_media(payload), order="hwc")
        )
        for ref, payload in _media_payloads(media)
    }
    texts = flat.column("text").to_pylist()
    frefs = flat.column("media_ref").to_pylist()
    kinds = flat.column("kind").to_pylist()
    beam_texts = [
        beam_by_ref[r] if k == "media" else t
        for t, r, k in zip(texts, frefs, kinds)
    ]
    out["expected_flat_beam"] = pa.table(
        {
            "doc_id": flat.column("doc_id"),
            "offset": flat.column("offset"),
            "kind": flat.column("kind"),
            "text": pa.array(beam_texts, type=pa.string()),
            "media_ref": flat.column("media_ref"),
        }
    )
    return out


def generate_corpus(
    root: str,
    n_docs: int,
    n_templates: int = 64,
    seed: int = DEFAULT_SEED,
    row_group_docs: int = 2000,
    large_frac: float = 0.05,
    goldens: bool = True,
) -> dict[str, str]:
    """Write the corpus (spans + media + expected goldens) under `root`.

    The spans table is written as a DIRECTORY of one parquet file per
    `row_group_docs` documents (capped at 64 shards at test scale):
    Ray issues one read task per FILE, so a single-file table serializes
    the scan behind one task no matter how many row groups it has
    (measured: 1 task producing 64 split blocks). One-file-per-shard is
    also the 100 TB layout (Lance fragments / partitioned parquet), so
    test reads exercise the same parallel-scan path.
    """
    import shutil

    os.makedirs(root, exist_ok=True)
    paths = corpus_paths(root)
    media = gen_media_templates(
        n_templates=n_templates, seed=seed, large_frac=large_frac
    )
    spans, expected = _gen_docs(n_docs, media, seed)
    pq.write_table(media, paths["media"])
    shutil.rmtree(paths["spans"], ignore_errors=True)
    if os.path.exists(paths["spans"]):
        os.remove(paths["spans"])
    os.makedirs(paths["spans"])
    n_shards = min(64, max(1, -(-n_docs // row_group_docs)))
    per = -(-spans.num_rows // n_shards)
    for i in range(n_shards):
        shard = spans.slice(i * per, per)
        if shard.num_rows:
            pq.write_table(
                shard,
                os.path.join(paths["spans"], f"part-{i:04d}.parquet"),
                row_group_size=row_group_docs,
            )
    pq.write_table(expected, paths["expected_flat"], row_group_size=row_group_docs * 4)
    golden_names = [n for n in paths if n.startswith("expected_") and n != "expected_flat"]
    if goldens:
        # Media/layout/beam/sink golden tables — the correctness-gate
        # corpora need them; perf corpora (bench's 1024-template pool)
        # skip the ~minutes of single-process golden computation.
        for name, tbl in _golden_media_tables(media, expected).items():
            pq.write_table(tbl, paths[name])
    else:
        # A root regenerated in place must not keep golden files from a
        # previous generation: they'd describe a DIFFERENT media table
        # while the directory looks complete to direct readers.
        for name in golden_names:
            try:
                os.remove(paths[name])
            except OSError:
                pass
    return paths


_AUDIO_RATES = (8000, 16000, 22050, 44100)
#: (container, numpy quantize) pairs weighted toward PCM16 like a real
#: speech corpus; every `ocrs_ray.wav` format appears.
_AUDIO_DEPTHS = ("u8", "i16", "i16", "i24", "i32", "f32")


def gen_audio_clips(
    n_clips: int, seed: int = DEFAULT_SEED
) -> tuple[pa.Table, dict[str, pa.Table]]:
    """Deterministic WAV clip pool + goldens for the audio op family.

    Each clip is a seeded mix of 1-3 sine partials (+ optional noise)
    quantized to one of the five `ocrs_ray.wav` container formats;
    ~25% of PCM16 clips additionally emit a CROSS-CONTAINER duplicate
    (the identical samples re-encoded as IEEE float32 — int16 values
    are exact in f32, so the content is bit-equal after normalization),
    the re-encoding dup vector `audio_content_dedup` exists to catch.

    Goldens are computed by the SHARED kernels (`audio_feature_values`,
    `audio_content_key`, `audio_resample_values`) on the PRE-ENCODE
    quantized samples — the distributed ops recompute them from the
    encoded WAV bytes through `wav.decode_wav`, so a golden match pins
    the decoder exactly (same independence the expected_flat golden
    gives the OCR pipeline). The twin/parent key collision is asserted
    at generation (a loud guard on the cross-container claim)."""
    import hashlib

    from .ops.multimodal import (
        audio_content_key,
        audio_feature_values,
        audio_resample_values,
    )
    from .wav import encode_wav

    rng = np.random.default_rng(seed + 11)
    # (ref, quantized array, rate, golden bits, encode bits, parent_ref)
    clips: list[tuple] = []
    for i in range(n_clips):
        rate = int(_AUDIO_RATES[int(rng.integers(len(_AUDIO_RATES)))])
        ch = int(rng.integers(1, 3))
        n = int(rng.integers(400, 4001))
        t = np.arange(n, dtype=np.float64)[:, None] / rate
        wave = np.zeros((n, ch), dtype=np.float64)
        for _ in range(int(rng.integers(1, 4))):
            freq = float(rng.uniform(40.0, rate / 4))
            amp = float(rng.uniform(0.05, 0.45))
            phase = float(rng.uniform(0, 2 * np.pi))
            wave += amp * np.sin(2 * np.pi * freq * t + phase)
        if rng.random() < 0.3:
            wave += rng.normal(0, 0.02, size=wave.shape)
        np.clip(wave, -0.999, 0.999, out=wave)
        depth = _AUDIO_DEPTHS[int(rng.integers(len(_AUDIO_DEPTHS)))]
        bits = None
        if depth == "u8":
            q = np.clip((wave * 127 + 128).round(), 0, 255).astype(np.uint8)
            gbits = 8
        elif depth == "i16":
            q = np.clip((wave * 32767).round(), -32768, 32767).astype(np.int16)
            gbits = 16
        elif depth == "i24":
            q = np.clip(
                (wave * ((1 << 23) - 1)).round(), -(1 << 23), (1 << 23) - 1
            ).astype(np.int32)
            bits = gbits = 24
        elif depth == "i32":
            q = np.clip(
                (wave * ((1 << 31) - 256)).round(), -(1 << 31), (1 << 31) - 1
            ).astype(np.int32)
            gbits = 32
        else:
            q = wave.astype(np.float32)
            gbits = 32
        ref = f"aud-{i:04d}"
        clips.append((ref, q, rate, gbits, bits, None))
        if depth == "i16" and rng.random() < 0.25:
            twin = (q.astype(np.float64) / 32768.0).astype(np.float32)
            clips.append((f"{ref}-dup", twin, rate, 32, None, ref))

    refs, blobs, feat_rows, keys, res_rows = [], [], [], [], []
    key_by_ref: dict[str, str] = {}
    for ref, q, rate, gbits, bits, parent in clips:
        refs.append(ref)
        blobs.append(encode_wav(q, rate, bits=bits))
        feat_rows.append(audio_feature_values(q, rate, gbits))
        key = audio_content_key(q, rate, gbits)
        key_by_ref[ref] = key
        keys.append(key)
        if parent is not None and key != key_by_ref[parent]:
            raise AssertionError(
                f"cross-container twin {ref} does not collide with {parent}"
            )
        wav, n_out = audio_resample_values(q, rate, gbits)
        res_rows.append((n_out, hashlib.md5(wav).hexdigest()))

    audio = pa.table(
        {
            "media_ref": pa.array(refs, type=pa.string()),
            "audio": pa.array(blobs, type=pa.binary()),
            "format": pa.array(["wav"] * len(refs), type=pa.string()),
        }
    )
    goldens: dict[str, pa.Table] = {}
    goldens["expected_audio_features"] = pa.table(
        {
            "media_ref": pa.array(refs, type=pa.string()),
            **{
                c: pa.array([r[c] for r in feat_rows], type=pa.int64())
                for c in (feat_rows[0] if feat_rows else {})
            },
        }
    )
    # Dedup golden from the ground-truth group structure.
    by_key: dict[str, list[str]] = {}
    for r, k in zip(refs, keys):
        by_key.setdefault(k, []).append(r)
    surv = sorted((min(members), k, len(members)) for k, members in by_key.items())
    goldens["expected_audio_dedup"] = pa.table(
        {
            "media_ref": pa.array([s[0] for s in surv], type=pa.string()),
            "content_key": pa.array([s[1] for s in surv], type=pa.string()),
            "n_copies": pa.array([s[2] for s in surv], type=pa.int64()),
        }
    )
    goldens["expected_audio_resample"] = pa.table(
        {
            "media_ref": pa.array(refs, type=pa.string()),
            "dst_rate": pa.array([16000] * len(refs), type=pa.int64()),
            "n_frames": pa.array([r[0] for r in res_rows], type=pa.int64()),
            "wav_md5": pa.array([r[1] for r in res_rows], type=pa.string()),
        }
    )
    return audio, goldens


def ensure_audio(
    root: str, n_clips: int, seed: int = DEFAULT_SEED
) -> dict[str, str]:
    """Idempotent audio-pool generate under `root` (its OWN params
    manifest — independent of the main corpus manifest, so adding the
    audio tables does not invalidate cached corpora)."""
    import json

    paths = {
        "audio": os.path.join(root, "audio.parquet"),
        "expected_audio_features": os.path.join(
            root, "expected_audio_features.parquet"
        ),
        "expected_audio_dedup": os.path.join(
            root, "expected_audio_dedup.parquet"
        ),
        "expected_audio_resample": os.path.join(
            root, "expected_audio_resample.parquet"
        ),
    }
    manifest = os.path.join(root, "audio_params.json")
    # layout=2: cross-container duplicate twins + dedup/resample goldens.
    params = {"n_clips": n_clips, "seed": seed, "layout": 2}
    try:
        if all(os.path.exists(p) for p in paths.values()):
            with open(manifest) as f:
                if json.load(f) == params:
                    return paths
    except Exception:
        pass
    os.makedirs(root, exist_ok=True)
    audio, goldens = gen_audio_clips(n_clips, seed=seed)
    pq.write_table(audio, paths["audio"])
    for name, tbl in goldens.items():
        pq.write_table(tbl, paths[name])
    with open(manifest, "w") as f:
        json.dump(params, f)
    return paths


def ensure_corpus(root: str, n_docs: int, **kwargs) -> dict[str, str]:
    """Idempotent generate: reuse an existing corpus only when EVERY
    generation parameter matches (recorded in a params manifest) — a
    row-count-only check would silently serve stale data after a
    seed/large_frac/template change."""
    import json

    paths = corpus_paths(root)
    manifest = os.path.join(root, "corpus_params.json")
    # layout=4: sharded spans directory (one file per read task) plus
    # the media/layout/beam/sink golden tables; bumping it invalidates
    # cached corpora missing them.
    params = {"n_docs": n_docs, "layout": 4, **{k: kwargs[k] for k in sorted(kwargs)}}
    required = (
        paths.values()
        if kwargs.get("goldens", True)
        else [paths["spans"], paths["media"], paths["expected_flat"]]
    )
    try:
        if all(os.path.exists(p) for p in required):
            with open(manifest) as f:
                if json.load(f) == params:
                    return paths
    except Exception:
        pass
    out = generate_corpus(root, n_docs, **kwargs)
    with open(manifest, "w") as f:
        json.dump(params, f)
    return out
