"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale shapes:
- exact dedup = hash column in `map_batches` + `groupby(hash)` min-id
  (the hash, not the full text, is what shuffles);
- MinHash+LSH = per-batch shingle->signature (vectorized) -> explode to
  (band, band_hash, doc_id) rows -> groupby band bucket -> candidate
  pairs -> exact-Jaccard verification. The only shuffled payload is
  signatures, never documents;
- embedding near-dup = broadcast matrix + per-batch matmul at test
  scale; the LSH-bucketed variant in `similarity.py` is the scale path.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from .text import read_documents

__all__ = [
    "dedup_normalized",
    "dedup_exact",
    "dedup_survivors",
    "streaming_dedup_filter",
    "fuzzy_name_pairs",
    "eval_decontaminate",
    "MinHashConfig",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "ngram_jaccard",
    "ngram_jaccard_pairs",
    "embedding_neardup_pairs",
]

_MERSENNE = (1 << 61) - 1


def dedup_exact(sf_dir: str) -> rd.Dataset:
    """Keep the smallest doc_id per distinct text (by md5 key).

    Keyed repartition + per-block pandas min instead of the
    hash-aggregate machinery: each md5 key's rows land in one block
    (verified one-block-per-partition semantics), so a per-block
    groupby-min is globally correct with the same shuffle volume and
    none of the aggregate-actor overhead. Per-batch pre-dedupe trims
    the shuffled rows first.
    """

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "text_md5": [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"]
                ],
                "doc_id": batch["doc_id"].to_numpy(),
            }
        )
        return out.groupby("text_md5", as_index=False)["doc_id"].min()

    def block_min(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "text_md5": pd.Series([], dtype="object"),
                    "doc_id": pd.Series([], dtype="int64"),
                }
            )
        return df.groupby("text_md5", as_index=False)["doc_id"].min()

    from ocrs_ray.pipeline import cluster_ncpu, enable_hash_shuffle

    npart = max(2, min(16, cluster_ncpu()))
    ds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        add_hash, batch_format="pandas"
    )
    enable_hash_shuffle(ds)
    return ds.repartition(npart, keys=["text_md5"]).map_batches(
        block_min, batch_format="pandas", batch_size=None
    )


def dedup_survivors(sf_dir: str) -> rd.Dataset:
    """The cleaned corpus after exact dedup: every document whose
    doc_id is the keeper (min doc_id of its distinct text).

    Apply-side of `dedup_exact`: a native `left_semi` hash join of the
    full corpus against the winner-id set. Both sides scale with the
    corpus, so nothing is broadcast; the winner side ships only ids
    (never text), and left_semi emits each survivor exactly once with
    no build-side dedupe shuffle (cf. `orders_with_returns`,
    relational.py).
    """
    from ocrs_ray.pipeline import cluster_ncpu, enable_hash_shuffle

    enable_hash_shuffle()
    npart = max(2, min(16, cluster_ncpu()))
    winners = dedup_exact(sf_dir).map_batches(
        lambda df: df[["doc_id"]], batch_format="pandas"
    )
    docs = read_documents(sf_dir, ["doc_id", "source", "n_chars"])
    return docs.join(
        winners,
        join_type="left_semi",
        num_partitions=npart,
        on=("doc_id",),
    )


def eval_decontaminate(
    sf_dir: str, one_in: int = 20, shingle_size: int = 3
) -> rd.Dataset:
    """Train-eval contamination scan: flag every training document that
    shares at least one word `shingle_size`-gram with the eval set,
    reporting the distinct-shingle overlap count.

    The eval set here is the deterministic 1-in-`one_in` md5 sample
    (standing in for a benchmark suite — tiny relative to the corpus by
    construction), so its distinct-shingle set is collected once on the
    driver and broadcast via ray.put; every corpus batch probes the
    broadcast set locally. That is the 100-TB shape: the small side
    ships once per node, the training side streams, and no shuffle
    happens at all. Contrast `ngram_jaccard_pairs`, which compares
    corpus x corpus and must shuffle signatures.
    """
    from .sampling import md5_bucket

    docs = read_documents(sf_dir, ["doc_id", "text"])

    def eval_shingles(df: pd.DataFrame) -> pd.DataFrame:
        sel = md5_bucket(df["doc_id"]) % one_in == 0
        out: set[str] = set()
        for t in df.loc[sel, "text"]:
            out.update(_shingles(t, shingle_size))
        return pd.DataFrame({"shingle": pd.Series(sorted(out), dtype="object")})

    # Driver-side collect is bounded by the EVAL suite's vocabulary,
    # not the corpus — the one case where materializing is right.
    ev = docs.map_batches(eval_shingles, batch_format="pandas")
    eval_set = frozenset(ev.to_pandas()["shingle"])
    ref = ray.put(eval_set)

    class Probe:
        def __init__(self, eval_ref):
            self.shingles = ray.get(eval_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            sel = md5_bucket(df["doc_id"]) % one_in != 0
            ids_all = df.loc[sel, "doc_id"].to_numpy(dtype="int64")
            owners: list[int] = []
            shingles: list[str] = []
            for i, t in enumerate(df.loc[sel, "text"]):
                distinct = set(_shingles(t, shingle_size))
                owners.extend([i] * len(distinct))
                shingles.extend(distinct)
            if owners:
                # One vectorized membership probe for the whole batch
                # (C-speed hash lookups) instead of a per-doc set
                # intersection against the big broadcast set.
                hit = pd.Series(shingles, dtype="object").isin(self.shingles)
                counts = np.bincount(
                    np.asarray(owners, dtype=np.int64)[hit.to_numpy()],
                    minlength=len(ids_all),
                )
            else:
                counts = np.zeros(len(ids_all), dtype="int64")
            keep = counts > 0
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(ids_all[keep], dtype="int64"),
                    "n_shared": pd.Series(counts[keep], dtype="int64"),
                }
            )

    from ocrs_ray.pipeline import cluster_ncpu

    return docs.map_batches(
        Probe, fn_constructor_args=(ref,), batch_format="pandas",
        concurrency=(1, max(1, min(4, cluster_ncpu() - 2))),
    )


@dataclass(frozen=True)
class MinHashConfig:
    num_perm: int = 128
    shingle_size: int = 3  # word n-grams
    bands: int = 32  # rows per band = num_perm // bands
    jaccard_threshold: float = 0.5
    seed: int = 7


def _stable_hash_u64(values: list[str]) -> np.ndarray:
    """Stable 64-bit hashes of strings (vectorized via pandas)."""
    return pd.util.hash_array(np.asarray(values, dtype=object)).astype(np.uint64)


def _shingles(text: str, k: int) -> list[str]:
    toks = text.split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


class MinHasher:
    """Per-actor state: the permutation coefficients (built once).

    The hash family is multiply-shift over uint64 with natural
    wraparound (a*x + b mod 2^64) — fully vectorized numpy, ~75x faster
    per doc than arbitrary-precision `(a*x + b) % (2^61 - 1)`. MinHash
    only needs a deterministic near-uniform family for candidate
    RECALL; precision is guaranteed downstream by the exact-Jaccard
    verification stage, so the family swap cannot change final results
    beyond recall noise (covered by the banding margin).
    """

    def __init__(self, cfg: MinHashConfig):
        self.cfg = cfg
        rng = np.random.default_rng(cfg.seed)
        self.a = (
            rng.integers(1, _MERSENNE, size=cfg.num_perm, dtype=np.int64)
            .astype(np.uint64)
            # multiply-shift needs odd multipliers for full-period mixing
            | np.uint64(1)
        )
        self.b = rng.integers(0, _MERSENNE, size=cfg.num_perm, dtype=np.int64).astype(
            np.uint64
        )

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if len(shingle_hashes) == 0:
            return np.full(self.cfg.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        s = shingle_hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            perm = self.a[:, None] * s[None, :] + self.b[:, None]
        return perm.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = []
        for t in texts:
            sh = _stable_hash_u64(_shingles(t, self.cfg.shingle_size))
            sigs.append(self.signature(np.unique(sh)))
        sig_arr = np.stack(sigs) if sigs else np.zeros((0, self.cfg.num_perm), np.uint64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "signature": pa.array(
                    [s.astype(np.int64) for s in sig_arr], type=pa.list_(pa.int64())
                ),
            }
        )


def minhash_signatures(sf_dir: str, cfg: MinHashConfig | None = None) -> rd.Dataset:
    cfg = cfg or MinHashConfig()
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        MinHasher, fn_constructor_args=(cfg,), batch_format="pyarrow", concurrency=(1, 2)
    )


def _band_rows(batch: pa.Table, cfg: MinHashConfig) -> pa.Table:
    """Explode signatures to (band_id, band_hash, doc_id) rows.

    The band hash is a vectorized FNV-1a-style uint64 mix over the
    band's signature chunk (one pass over a (docs, bands, rows) cube) —
    it only needs to identify EQUAL chunks; a collision merely adds a
    candidate pair that the exact-Jaccard verifier discards.
    """
    if batch.num_rows == 0:
        return pa.table(
            {
                "band_id": pa.array([], type=pa.int32()),
                "band_hash": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )
    sigs = np.asarray(batch.column("signature").to_pylist(), dtype=np.int64)
    doc = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
    n = len(doc)
    rows_per_band = cfg.num_perm // cfg.bands
    cube = sigs.view(np.uint64).reshape(n, cfg.bands, rows_per_band)
    h = np.full((n, cfg.bands), 14695981039346656037, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows_per_band):
            h = (h ^ cube[:, :, r]) * np.uint64(1099511628211)
    return pa.table(
        {
            "band_id": pa.array(
                np.tile(np.arange(cfg.bands, dtype=np.int32), n), type=pa.int32()
            ),
            "band_hash": pa.array(h.view(np.int64).ravel(), type=pa.int64()),
            "doc_id": pa.array(np.repeat(doc, cfg.bands), type=pa.int64()),
        }
    )


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word n-gram Jaccard similarity (verification kernel)."""
    return _jaccard(set(_shingles(text_a, k)), set(_shingles(text_b, k)))


def _broadcast_texts(docs: rd.Dataset):
    """Collect doc_id -> text and broadcast once via ray.put (test
    scale); at 100 TB verification becomes a hash join of candidate
    pairs against documents on doc_id instead."""
    texts: dict[int, str] = {}
    for batch in docs.iter_batches(batch_size=4096, batch_format="pyarrow"):
        texts.update(
            zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist())
        )
    return ray.put(texts)


_EMPTY_PAIRS = {
    "doc_a": pd.Series([], dtype="int64"),
    "doc_b": pd.Series([], dtype="int64"),
}


def _pairs_in_key_groups(batch: pd.DataFrame, key_cols: list[str]) -> pd.DataFrame:
    """All (doc_a, doc_b) pairs within each key group of this block.

    The preceding hash repartition on the key co-locates each group;
    pairs are generated per run of the sorted block (vectorized
    triangle indices), not per-group Ray tasks.
    """
    if batch.empty:
        return pd.DataFrame(_EMPTY_PAIRS)
    b = batch.sort_values([*key_cols, "doc_id"], kind="stable")
    key = b[key_cols[0]].astype(str)
    for c in key_cols[1:]:
        key = key + "|" + b[c].astype(str)
    key = key.to_numpy()
    ids = b["doc_id"].to_numpy()
    boundaries = np.flatnonzero(key[1:] != key[:-1]) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(ids)]])
    out_a, out_b = [], []
    for s, e in zip(starts, ends):
        n = e - s
        if n < 2:
            continue
        iu = np.triu_indices(n, k=1)
        out_a.append(ids[s:e][iu[0]])
        out_b.append(ids[s:e][iu[1]])
    if not out_a:
        return pd.DataFrame(_EMPTY_PAIRS)
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
    )


def _local_dedup(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    return df.drop_duplicates(cols)


def _dedup_small(ds: rd.Dataset, cols: list[str], partitions: int = 8) -> rd.Dataset:
    """Global dedup of the VERIFIED pair set (after verification, never
    raw candidates): hash-partition on the pair so each pair lands in
    exactly one block, dedup per block. The shuffle payload is the
    verified set — normally tiny, but hash-partitioned (not a single
    block) so a pathological corpus with an m-doc duplicate clique and
    its m^2/2 surviving pairs still spreads across workers."""
    from ocrs_ray.pipeline import enable_hash_shuffle

    enable_hash_shuffle(ds)
    return ds.repartition(partitions, keys=cols).map_batches(
        _local_dedup, fn_kwargs={"cols": cols}, batch_format="pandas", batch_size=None
    )


def _prefix_rows(batch: pd.DataFrame, k: int, threshold: float) -> pd.DataFrame:
    """Emit each doc's prefix-filter shingles as (token, doc_id) rows.

    Prefix filtering principle (Chaudhuri/Bayardo AllPairs): order every
    doc's shingle set by one global total order (stable hash, tie-break
    on the string); if jaccard(A, B) >= t then |A∩B| >= ceil(t*|A|), so
    A and B must share a token within their first |S| - ceil(t*|S|) + 1
    shingles. Emitting only those prefixes keeps the shuffle small while
    candidate generation stays EXACT (no recall loss, unlike LSH).
    """
    toks: list[str] = []
    docs: list[int] = []
    for d, t in zip(batch["doc_id"], batch["text"]):
        sh = list(set(_shingles(t, k)))
        if not sh:
            # Empty-shingle docs are all mutual duplicates (jaccard 1.0);
            # route them through one sentinel bucket.
            toks.append("\x00<empty>")
            docs.append(d)
            continue
        order = np.lexsort(
            (np.asarray(sh, dtype=object), _stable_hash_u64(sh))
        )
        n = len(sh)
        plen = n - int(np.ceil(threshold * n)) + 1
        for i in order[:plen]:
            toks.append(sh[i])
            docs.append(d)
    return pd.DataFrame({"token": toks, "doc_id": np.asarray(docs, dtype="int64")})


def ngram_jaccard_pairs(
    sf_dir: str,
    threshold: float = 0.8,
    k: int = 3,
    documents: rd.Dataset | None = None,
) -> rd.Dataset:
    """EXACT all-pairs n-gram Jaccard dedup at threshold, without the
    O(n^2) cross join: prefix filtering (see `_prefix_rows`) generates a
    provably complete candidate set, hash-partitioned by token so pair
    enumeration is per-block; candidates dedup locally per block, verify
    with the exact Jaccard kernel, and the small verified set dedups
    globally in one block (dedup-late: no all-to-all on candidates).

    Unlike `minhash_lsh_pairs` (probabilistic recall), this matches the
    brute-force oracle bit-for-bit. Texts for verification are broadcast
    once via `ray.put` (test scale); at 100 TB the verifier becomes a
    hash join of candidate pairs against documents on doc_id.
    """
    docs = documents if documents is not None else read_documents(sf_dir, ["doc_id", "text"])
    texts_ref = _broadcast_texts(docs)

    prefix = docs.map_batches(
        _prefix_rows, fn_kwargs={"k": k, "threshold": threshold}, batch_format="pandas"
    )

    from ocrs_ray.pipeline import enable_hash_shuffle

    enable_hash_shuffle(prefix)
    # Dedup-late strategy: a pair can surface once per shared prefix
    # token. Rather than an all-to-all over the full candidate set,
    # dedup locally per block (free), verify the still-slightly-
    # duplicated candidates (re-verification is bounded by the prefix
    # length and amortized by the per-actor shingle memo), and hash-
    # dedup only the verified survivors — the shuffle payload drops
    # from the candidate set (the largest intermediate in this
    # pipeline at corpus scale) to the verified pair set.
    unique_pairs = prefix.repartition(8, keys=["token"]).map_batches(
        _pairs_in_key_groups,
        fn_kwargs={"key_cols": ["token"]},
        batch_format="pandas",
        batch_size=None,
    ).map_batches(
        _local_dedup,
        fn_kwargs={"cols": ["doc_a", "doc_b"]},
        batch_format="pandas",
        batch_size=None,
    )

    class ExactVerifier:
        def __init__(self, ref, k, threshold):
            self.texts = ray.get(ref)
            self.k = k
            # Integer threshold in micro-units: `inter/uni >= t` becomes
            # `inter * 1e6 >= t_micro * uni`, exact in int arithmetic
            # (matches the SQL oracle's integer comparison bit-for-bit).
            self.t_micro = int(round(threshold * 1_000_000))
            # Per-actor shingle-set memo: docs recur across pairs (and
            # duplicated candidates recur across blocks under the
            # dedup-late strategy), so re-shingling is the dominant
            # verify cost without this.
            self._memo: dict[int, frozenset] = {}

        def _sh(self, doc: int) -> frozenset:
            s = self._memo.get(doc)
            if s is None:
                s = frozenset(_shingles(self.texts[doc], self.k))
                self._memo[doc] = s
            return s

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if batch.empty:
                return batch[["doc_a", "doc_b"]]
            keep = []
            for a, b in zip(batch["doc_a"], batch["doc_b"]):
                sa, sb = self._sh(a), self._sh(b)
                inter = len(sa & sb)
                uni = len(sa) + len(sb) - inter
                keep.append(inter * 1_000_000 >= self.t_micro * uni)
            return batch.loc[np.asarray(keep, dtype=bool), ["doc_a", "doc_b"]]

    verified = unique_pairs.map_batches(
        ExactVerifier,
        fn_constructor_args=(texts_ref, k, threshold),
        batch_format="pandas",
        concurrency=(1, 2),
    )
    return _dedup_small(verified, ["doc_a", "doc_b"])


def minhash_lsh_pairs(
    sf_dir: str, cfg: MinHashConfig | None = None, documents: rd.Dataset | None = None
) -> rd.Dataset:
    """Verified near-duplicate pairs via MinHash+LSH banding.

    Candidate generation shuffles only (band_hash, doc_id) rows; the
    final exact-Jaccard verification resolves texts from a broadcast
    lookup (test scale) — at 100 TB this becomes a hash join of the
    candidate pairs against the documents table on doc_id.
    """
    cfg = cfg or MinHashConfig()
    docs = documents if documents is not None else read_documents(sf_dir, ["doc_id", "text"])
    texts_ref = _broadcast_texts(docs)

    sigs = docs.map_batches(
        MinHasher, fn_constructor_args=(cfg,), batch_format="pyarrow", concurrency=(1, 2)
    )
    bands = sigs.map_batches(
        _band_rows, fn_kwargs={"cfg": cfg}, batch_format="pyarrow"
    )

    from ocrs_ray.pipeline import enable_hash_shuffle

    enable_hash_shuffle(bands)
    # Dedup-late (see ngram_jaccard_pairs): local per-block dedup, then
    # global dedup of the small verified set — duplicate factor bounded
    # by the number of matching bands.
    unique_pairs = bands.repartition(8, keys=["band_hash"]).map_batches(
        _pairs_in_key_groups,
        fn_kwargs={"key_cols": ["band_id", "band_hash"]},
        batch_format="pandas",
        batch_size=None,
    ).map_batches(
        _local_dedup,
        fn_kwargs={"cols": ["doc_a", "doc_b"]},
        batch_format="pandas",
        batch_size=None,
    )

    class Verifier:
        def __init__(self, ref, k, threshold):
            self.texts = ray.get(ref)
            self.k = k
            self.threshold = threshold
            self._memo: dict[int, frozenset] = {}

        def _sh(self, doc: int) -> frozenset:
            s = self._memo.get(doc)
            if s is None:
                s = frozenset(_shingles(self.texts[doc], self.k))
                self._memo[doc] = s
            return s

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            jac = [
                _jaccard(self._sh(a), self._sh(b))
                for a, b in zip(batch["doc_a"], batch["doc_b"])
            ]
            batch = batch.assign(jaccard=jac)
            out = batch[batch["jaccard"] >= self.threshold]
            return out[["doc_a", "doc_b", "jaccard"]]

    verified = unique_pairs.map_batches(
        Verifier,
        fn_constructor_args=(texts_ref, cfg.shingle_size, cfg.jaccard_threshold),
        batch_format="pandas",
        concurrency=(1, 2),
    )
    return _dedup_small(verified, ["doc_a", "doc_b"])


def simhash64(sf_dir: str) -> rd.Dataset:
    """64-bit SimHash per document (Charikar 2002): sign of the
    token-hash bit-vote vector, emitted as hex."""

    def sh(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("text").to_pylist():
            toks = text.split()
            if not toks:
                out.append("0" * 16)
                continue
            hashes = pd.util.hash_array(np.asarray(toks, dtype=object)).astype(np.uint64)
            shifts = np.arange(64, dtype=np.uint64)
            bits = ((hashes[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            val = int(((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
            out.append(f"{val:016x}")
        return pa.table({"doc_id": batch.column("doc_id"), "simhash": out})

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        sh, batch_format="pyarrow"
    )


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.4) -> rd.Dataset:
    """Pairs of embeddings with cosine similarity >= threshold.

    Test-scale implementation: broadcast the (unit-normalized) matrix,
    per-batch float64 matmul against it. The LSH-bucketed variant in
    `similarity.py` covers the case where the matrix no longer fits.
    """
    import pyarrow.parquet as pq

    table = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(table.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.array(table.column("embedding").to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    ref = ray.put((ids, unit))

    class PairFinder:
        def __init__(self, ref, threshold):
            self.ids, self.unit = ray.get(ref)
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            vid = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
            emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            n = np.linalg.norm(emb, axis=1)
            n[n == 0] = 1.0
            sims = (emb / n[:, None]) @ self.unit.T
            rows, cols = np.nonzero(sims >= self.threshold)
            # Emit each unordered pair once (a < b).
            a = vid[rows]
            b = self.ids[cols]
            keep = a < b
            return pa.table(
                {
                    "vec_a": pa.array(a[keep], type=pa.int64()),
                    "vec_b": pa.array(b[keep], type=pa.int64()),
                }
            )

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(
        PairFinder,
        fn_constructor_args=(ref, threshold),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 2),
    )


@ray.remote(num_cpus=0)
class _DedupShard:
    """One shard of the global seen-set for `streaming_dedup_filter`:
    holds the md5 keys whose hash lands on this shard. `claim` is
    atomic per actor (Ray actors process calls serially), so exactly
    one caller wins each key. num_cpus=0: the shards are memory
    holders that serve sub-millisecond set probes — giving them CPU
    slots would starve the claiming pool on small clusters (the
    CPU-budget deadlock)."""

    def __init__(self):
        self.seen: set[bytes] = set()

    def claim(self, keys: list[bytes]) -> list[bool]:
        out = []
        for k in keys:
            if k in self.seen:
                out.append(False)
            else:
                self.seen.add(k)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self.seen)


def streaming_dedup_filter(sf_dir: str, n_shards: int = 4) -> rd.Dataset:
    """Exact dedup as a STREAMING filter against a shared mutable
    index — the raw-actor tier (c) of the custom-operator ladder, for
    when rows must be admitted/rejected online (ingest pipelines) and a
    post-hoc shuffle pass (`dedup_exact`) is not an option.

    A pool of `n_shards` set-holding actors partitions the key space by
    content-hash; each batch claims its keys against the owning shards
    (one round-trip per shard per batch, keys only — text never leaves
    the batch) and keeps the rows that won. First-seen-wins: WHICH
    duplicate survives depends on arrival order, so the survivor ID set
    is nondeterministic across runs — but the survivor COUNT equals the
    distinct-text count and survivors are hash-unique, both pinned in
    tests. Use `dedup_exact` when deterministic min-id winners matter.

    Scale notes: shard count bounds per-actor memory (keys/shard =
    distinct/n_shards; 16 B md5 keys -> ~1e9 keys per 16 GiB shard) and
    call fan-in; `concurrency` on the claiming stage is kept modest so
    the actor round-trips pipeline with the read instead of convoying.
    """
    shards = [_DedupShard.remote() for _ in range(n_shards)]

    class Claim:
        def __init__(self, shard_handles):
            self.shards = shard_handles

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if batch.empty:
                return batch
            keys = [
                hashlib.md5(t.encode()).digest() for t in batch["text"]
            ]
            shard_of = [k[0] % len(self.shards) for k in keys]
            keep = np.zeros(len(keys), dtype=bool)
            per_shard: dict[int, list[int]] = {}
            for i, sh in enumerate(shard_of):
                per_shard.setdefault(sh, []).append(i)
            refs = {
                sh: self.shards[sh].claim.remote([keys[i] for i in idxs])
                for sh, idxs in per_shard.items()
            }
            for sh, idxs in per_shard.items():
                won = ray.get(refs[sh])
                keep[idxs] = won
            return batch.loc[keep]

    from ocrs_ray.pipeline import cluster_ncpu

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        Claim,
        fn_constructor_args=(shards,),
        batch_format="pandas",
        concurrency=(1, max(1, min(4, cluster_ncpu() - 2))),
    )


def _lev(a: str, b: str, cap: int = 2) -> int:
    """Banded Levenshtein distance, early-exit above `cap` (returns
    cap+1). Strings here are short dictionary entries; the DP row is a
    few dozen cells."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        best = j
        for i, ca in enumerate(a, 1):
            c = min(
                prev[i] + 1,
                cur[i - 1] + 1,
                prev[i - 1] + (ca != cb),
            )
            cur.append(c)
            best = min(best, c)
        if best > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def _deletion_variants(name: str, d: int = 2) -> set[str]:
    """All strings reachable from `name` by deleting up to `d` chars —
    the SymSpell blocking key set: lev(a, b) <= d implies the variant
    sets intersect (substitutions delete one char from each side,
    insertions delete one from the longer), so blocking on shared
    variants is LOSSLESS for the verify step."""
    out = {name}
    frontier = {name}
    for _ in range(d):
        nxt = set()
        for s in frontier:
            for i in range(len(s)):
                nxt.add(s[:i] + s[i + 1 :])
        out |= nxt
        frontier = nxt
    return out


def fuzzy_name_pairs(sf_dir: str, max_dist: int = 2) -> rd.Dataset:
    """String-similarity self-join over the DISTINCT part-name
    dictionary: all name pairs within Levenshtein distance `max_dist`,
    with the exact distance — entity-resolution's core primitive,
    expressed with lossless SymSpell deletion-variant blocking instead
    of the quadratic all-pairs scan.

    Scale shape: the join runs on the NAME DICTIONARY (bounded by the
    vocabulary, not the row count — cf. `vocab_top_terms`), never on
    part rows. Stage 1 dedupes names per batch and explodes each into
    its <= sum_i C(L,i) deletion variants; the (variant, name) rows
    hash-shuffle by variant so every potentially-close pair meets in
    one block (the lossless-blocking guarantee: lev <= d implies a
    shared variant). Stage 2 emits per-bucket candidate pairs, a
    second keyed shuffle dedupes pairs (a pair can share many
    variants), and the banded-DP verify runs ONCE per distinct pair.
    At a 1e6-entry dictionary the variant shuffle is ~1e8 short rows —
    heavy but linear in the dictionary, vs 5e11 for all-pairs.
    """
    from ocrs_ray.pipeline import cluster_ncpu, enable_hash_shuffle

    enable_hash_shuffle()
    npart = max(2, min(16, cluster_ncpu()))

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        names = pd.unique(batch["p_name"])
        var_col, name_col = [], []
        for n in names:
            for v in _deletion_variants(n, max_dist):
                var_col.append(v)
                name_col.append(n)
        return pd.DataFrame({"variant": var_col, "p_name": name_col})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        out_a, out_b = [], []
        for _, grp in df.groupby("variant", sort=False):
            names = sorted(set(grp["p_name"]))
            for i in range(len(names)):
                for j in range(i + 1, len(names)):
                    out_a.append(names[i])
                    out_b.append(names[j])
        return pd.DataFrame({"name_a": out_a, "name_b": out_b}).drop_duplicates()

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        dist = [
            _lev(a, b, max_dist) for a, b in zip(df["name_a"], df["name_b"])
        ]
        out = df.assign(dist=pd.Series(dist, dtype="int64").to_numpy())
        return out[out["dist"] <= max_dist]

    return (
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
        .map_batches(explode, batch_format="pandas", batch_size=None)
        .repartition(npart, keys=["variant"])
        .map_batches(bucket_pairs, batch_format="pandas", batch_size=None)
        .repartition(npart, keys=["name_a", "name_b"])
        .map_batches(verify, batch_format="pandas", batch_size=None)
    )


def dedup_normalized(sf_dir: str) -> rd.Dataset:
    """Exact dedup under text NORMALIZATION (collapse whitespace runs,
    trim, lowercase) — catches re-wrapped / re-cased copies that raw
    md5 misses, the standard first-tier key for web-corpus dedup
    before any near-dup sketching.

    Same physical shape as `dedup_exact` (per-batch pre-dedupe, keyed
    repartition on the hash, per-block min); only the key derivation
    differs, and it is pinned to the oracle's exact operation order
    and character classes by `text.normalize_ws_lower` (RE2's ASCII
    \\s, space-only trim).
    """
    from .text import normalize_ws_lower

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        norm = [normalize_ws_lower(t) for t in batch["text"]]
        out = pd.DataFrame(
            {
                "norm_md5": [
                    hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm
                ],
                "doc_id": batch["doc_id"].to_numpy(),
            }
        )
        return out.groupby("norm_md5", as_index=False)["doc_id"].min()

    def block_min(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "norm_md5": pd.Series([], dtype="object"),
                    "doc_id": pd.Series([], dtype="int64"),
                }
            )
        return df.groupby("norm_md5", as_index=False)["doc_id"].min()

    from ocrs_ray.pipeline import cluster_ncpu, enable_hash_shuffle

    npart = max(2, min(16, cluster_ncpu()))
    ds = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        add_hash, batch_format="pandas"
    )
    enable_hash_shuffle(ds)
    return ds.repartition(npart, keys=["norm_md5"]).map_batches(
        block_min, batch_format="pandas", batch_size=None
    )
