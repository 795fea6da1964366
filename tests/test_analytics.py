"""Tests for corpus-analytics operators (ocrs_ray.ops.analytics).

SQL-expressible ops are checked here the same way the driver checks
them: run the Ray pipeline AND the registered DuckDB oracle over the
sf0.001 tables, sort, and compare values exactly. Sketch ops
(Misra-Gries) are pinned by their error bounds and a forced-eviction
unit test.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(name: str, sf_dir: str = SF) -> pd.DataFrame:
    from ocrs_ray.ops import registry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(registry.oracle_sql()[name]).df()


def assert_matches_oracle(name: str, out: pd.DataFrame) -> None:
    exp = run_oracle(name)
    cols = sorted(exp.columns)
    assert sorted(out.columns) == cols
    o = out[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(o, e, check_dtype=False)


# ---------------------------------------------------------------------------
# Oracle-checked operators


# Oracle parity for every SQL-expressible op (including all analytics
# ops) is covered exhaustively by tests/test_oracle_sweep.py.


# ---------------------------------------------------------------------------
# Misra-Gries sketch


def test_mg_update_forced_evictions():
    from ocrs_ray.ops.analytics import _mg_update

    counters: dict[int, int] = {}
    # capacity 2: stream 1,1,1,2,3 -> classic MG keeps 1 with count >= 2.
    for key in [1, 1, 1, 2, 3]:
        _mg_update(counters, key, 1, capacity=2)
    assert counters.get(1, 0) >= 1
    assert len(counters) <= 2
    # Weighted update larger than current minimum evicts and re-inserts.
    counters = {1: 5, 2: 1}
    _mg_update(counters, 3, 3, capacity=2)
    assert counters[1] == 4  # decremented by min eviction round
    assert 3 in counters and counters[3] == 2


def test_mg_summary_is_lower_bound_within_error():
    from ocrs_ray.ops.analytics import _mg_summarize

    rng = np.random.default_rng(7)
    keys = rng.zipf(1.5, size=5000).astype("int64")
    df = pd.DataFrame({"user_id": keys})
    capacity = 64
    summary = _mg_summarize(df, capacity)
    exact = df.groupby("user_id").size()
    err = len(df) / capacity
    for uid, n in zip(summary["user_id"], summary["n"]):
        true = int(exact.loc[uid])
        assert n <= true
        assert n >= true - err


def test_heavy_hitters_sketch_contains_true_topk(ray_session):
    from ocrs_ray.ops.analytics import heavy_hitters_exact, heavy_hitters_sketch

    exact = heavy_hitters_exact(SF, k=5).to_pandas()
    sketch = heavy_hitters_sketch(SF, k=20, capacity=256).to_pandas()
    # capacity (256) exceeds the distinct-user count at this scale, so
    # the sketch is exact here; the guarantee tested is containment.
    assert set(exact["user_id"]).issubset(set(sketch["user_id"]))
    merged = sketch.set_index("user_id")["n"]
    full_exact = heavy_hitters_exact(SF, k=20).to_pandas().set_index("user_id")["n"]
    for uid in exact["user_id"]:
        assert merged.loc[uid] <= full_exact.loc[uid]


# ---------------------------------------------------------------------------
# Connected components


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(ray_session):
    import ray.data as rd

    from ocrs_ray.ops.analytics import connected_components

    # Two chains, one triangle, assorted singleton-free edges.
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22), (5, 4)]
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "u": np.array([e[0] for e in edges], dtype="int64"),
                "v": np.array([e[1] for e in edges], dtype="int64"),
            }
        )
    )
    want = _union_find_components(edges)
    # Local union-find path (small edge set).
    assert connected_components(ds, partitions=2) == want
    # Distributed star-contraction path (forced).
    assert connected_components(ds, partitions=2, local_threshold=0) == want


def test_connected_components_empty(ray_session):
    import ray.data as rd

    from ocrs_ray.ops.analytics import connected_components

    ds = rd.from_pandas(
        pd.DataFrame(
            {"u": pd.Series([], dtype="int64"), "v": pd.Series([], dtype="int64")}
        )
    )
    assert connected_components(ds, partitions=2) == {}


def test_cc_star_map_matches_dict_form(ray_session):
    """cc_star_map (the Dataset form) must carry exactly the dict
    form's (node -> root) rows, on both the local and distributed
    convergence paths."""
    import ray.data as rd

    from ocrs_ray.ops.analytics import cc_star_map, connected_components

    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22), (5, 4)]
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "u": np.array([e[0] for e in edges], dtype="int64"),
                "v": np.array([e[1] for e in edges], dtype="int64"),
            }
        )
    )
    want = connected_components(ds, partitions=2)
    for threshold in (2_000_000, 0):  # local path, then forced star path
        tbl = cc_star_map(ds, partitions=2, local_threshold=threshold).to_pandas()
        got = dict(zip(tbl["node"], tbl["root"]))
        assert got == want, threshold
        assert len(tbl) == len(want)  # no duplicate node rows


def test_cluster_assign_cogroup_path_pinned_equal(ray_session):
    """The measured-size relabel strategies must agree: forcing the
    tagged-union cogroup (broadcast_limit_bytes=0) yields the exact
    rows of the broadcast searchsorted path, including singletons."""
    import ray.data as rd

    from ocrs_ray.ops.analytics import _cluster_assign

    edges = [(3, 9), (9, 12), (40, 41)]
    pairs = rd.from_pandas(
        pd.DataFrame(
            {
                "u": np.array([e[0] for e in edges], dtype="int64"),
                "v": np.array([e[1] for e in edges], dtype="int64"),
            }
        )
    )
    ids = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(50, dtype="int64")})
    )
    a = (
        _cluster_assign(pairs, ids, "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        _cluster_assign(pairs, ids, "doc_id", broadcast_limit_bytes=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 50
    lbl = a.set_index("doc_id")["cluster_id"]
    assert lbl.loc[3] == lbl.loc[9] == lbl.loc[12] == 3
    assert lbl.loc[40] == lbl.loc[41] == 40
    assert lbl.loc[7] == 7  # singleton labels itself


@pytest.mark.parametrize(
    "op,sort_cols",
    [
        ("lm_quality_score", ["doc_id"]),
        ("lm_bigram_score", ["doc_id"]),
        ("tfidf_top_terms", ["doc_id", "rank"]),
    ],
)
def test_vocab_scoring_paths_pinned_equal(ray_session, op, sort_cols):
    """The measured-size vocabulary strategies must agree: forcing the
    cogroup path (broadcast_limit_bytes=0) yields exactly the broadcast
    path's rows — the oracle sweep then certifies the broadcast path,
    transitively certifying both."""
    import ocrs_ray.ops.analytics as an

    fn = getattr(an, op)
    a = fn(SF).to_pandas()
    b = fn(SF, broadcast_limit_bytes=0).to_pandas()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(sort_cols).reset_index(drop=True)
    b = b[cols].sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) > 0


def test_neardup_best_survivors_paths_pinned_equal(ray_session):
    from ocrs_ray.ops.analytics import neardup_best_survivors

    a = (
        neardup_best_survivors(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        neardup_best_survivors(SF, broadcast_limit_bytes=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_dedup_clusters_consistent_with_pairs(ray_session):
    """Every near-dup pair must land in the same cluster; cluster id is
    the component min."""
    from ocrs_ray.ops import registry
    from ocrs_ray.ops.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(SF, threshold=0.8).to_pandas()
    clusters = registry.queries()["dedup_clusters"](SF).to_pandas()
    label = clusters.set_index("doc_id")["cluster_id"]
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert label.loc[a] == label.loc[b]
    # Union-find over the same edges gives identical labels for
    # non-singletons.
    want = _union_find_components(list(zip(pairs["doc_a"], pairs["doc_b"])))
    for node, root in want.items():
        assert label.loc[node] == root


# ---------------------------------------------------------------------------
# Embedding clustering


def test_embedding_clusters_matches_oracle(ray_session):
    from ocrs_ray.ops import registry

    out = registry.queries()["embedding_clusters"](SF).to_pandas()
    assert_matches_oracle("embedding_clusters", out)


def test_kmeans_embeddings_invariants(ray_session):
    from ocrs_ray.ops.similarity import kmeans_embeddings, load_embedding_matrix

    out = kmeans_embeddings(SF, k=8, iters=3).to_pandas()
    ids, mat = load_embedding_matrix(SF)
    assert len(out) == len(ids)
    assert set(out["vec_id"]) == set(ids)
    assert out["cluster_id"].between(0, 7).all()
    assert out["cluster_id"].nunique() > 1
    # Determinism: identical run -> identical assignment.
    out2 = kmeans_embeddings(SF, k=8, iters=3).to_pandas()
    a = out.sort_values("vec_id").reset_index(drop=True)
    b = out2.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_kmeans_assignment_is_nearest_centroid(ray_session):
    """Each point's label must be the argmin-distance centroid of the
    final model — verified by retraining the same deterministic
    iterations locally in numpy."""
    from ocrs_ray.ops.similarity import kmeans_embeddings, load_embedding_matrix

    k, iters, seed = 4, 2, 13
    out = (
        kmeans_embeddings(SF, k=k, iters=iters, seed=seed)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    ids, mat = load_embedding_matrix(SF)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    # Local reference: same init, full-batch Lloyd's.
    head = mat[np.argsort(ids)][: max(k * 64, 512)]
    rng = np.random.default_rng(seed)
    cents = head[rng.permutation(len(head))[:k]].copy()
    for _ in range(iters):
        d2 = (mat**2).sum(1)[:, None] - 2 * mat @ cents.T + (cents**2).sum(1)[None, :]
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            m = mat[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    d2 = (mat**2).sum(1)[:, None] - 2 * mat @ cents.T + (cents**2).sum(1)[None, :]
    want = np.argmin(d2, axis=1)
    got = out.set_index("vec_id").loc[ids, "cluster_id"].to_numpy()
    assert (got == want).mean() > 0.95  # float reduce-order tolerance


# ---------------------------------------------------------------------------
# BM25 retrieval


def test_bm25_topk_matches_local_reference(ray_session):
    import re

    import pyarrow.parquet as pq

    from ocrs_ray.ops.analytics import TOKEN_RE, bm25_topk

    query = "the quick brown fox"
    k1, b, k = 1.2, 0.75, 10
    out = bm25_topk(SF, query=query, k=k, k1=k1, b=b).to_pandas()

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "n_chars"]).to_pandas()
    tok = re.compile(TOKEN_RE)
    toks = docs["text"].map(lambda t: tok.findall(t.lower()))
    q_terms = sorted(set(tok.findall(query.lower())))
    n_docs = len(docs)
    avg_len = docs["n_chars"].sum() / n_docs
    dfm = {t: int(sum(t in set(ts) for ts in toks)) for t in q_terms}
    idf = {
        t: max(0.0, np.log((n_docs - dfm[t] + 0.5) / (dfm[t] + 0.5))) for t in q_terms
    }
    rows = []
    for doc_id, ts, n_chars in zip(docs["doc_id"], toks, docs["n_chars"]):
        counts = {t: ts.count(t) for t in q_terms if t in ts}
        if not counts:
            continue
        norm = k1 * (1 - b + b * n_chars / avg_len)
        s = sum(idf[t] * c * (k1 + 1) / (c + norm) for t, c in counts.items())
        rows.append((doc_id, s))
    rows.sort(key=lambda r: (-r[1], r[0]))
    want = pd.DataFrame(rows[:k], columns=["doc_id", "score"])
    got = out.reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-12)
    # Scores are returned best-first.
    assert (got["score"].diff().dropna() <= 1e-12).all()


def test_embedding_top_component_eigenpair(ray_session):
    """Power iteration must land on the top eigenpair of X^T X: small
    relative residual ||Gv - eigval*v||, unit norm, the pinned sign
    convention, and agreement with numpy's exact eigendecomposition."""
    from ocrs_ray.ops.similarity import (
        embedding_top_component,
        load_embedding_matrix,
    )

    out = embedding_top_component(SF).to_pandas().sort_values("dim")
    v = out["component"].to_numpy(dtype="float64")
    eigval = float(out["eigval"].iloc[0])
    _, mat = load_embedding_matrix(SF)
    g = mat.astype("float64").T @ mat.astype("float64")

    assert np.isclose(np.linalg.norm(v), 1.0, atol=1e-9)
    assert v[np.argmax(np.abs(v))] > 0
    resid = np.linalg.norm(g @ v - eigval * v) / eigval
    assert resid < 1e-6, resid
    w, vecs = np.linalg.eigh(g)
    assert abs(float(vecs[:, -1] @ v)) > 1 - 1e-8
    assert np.isclose(eigval, w[-1], rtol=1e-9)


def test_embedding_quantize_int8_bounds(ray_session):
    """Symmetric int8 quantization: per-coordinate error <= scale/2,
    codes within [-127, 127], and dequantized cosine vs the original
    vector >= 0.999 for every row."""
    from ocrs_ray.ops.similarity import (
        embedding_quantize_int8,
        load_embedding_matrix,
    )

    out = embedding_quantize_int8(SF).to_pandas().sort_values("vec_id")
    ids, mat = load_embedding_matrix(SF)
    order = np.argsort(ids)
    mat = mat[order]
    scale = out["scale"].to_numpy()
    codes = np.stack(out["codes"].to_numpy()).astype("float64")
    deq = codes * scale[:, None]
    err = np.abs(deq - mat)
    assert (np.abs(codes) <= 127).all()
    assert (err <= scale[:, None] / 2 + 1e-12).all()
    num = (deq * mat).sum(1)
    den = np.linalg.norm(deq, axis=1) * np.linalg.norm(mat, axis=1)
    nz = den > 0
    assert (num[nz] / den[nz] >= 0.999).all()


def test_source_distinct_shingles_exact_under_hot_key(ray_session, tmp_path):
    """The value-salted two-phase distinct count stays EXACT when one
    source owns most of the corpus — the hot-key case a group-keyed
    shuffle would concentrate on one worker. Compared against a
    single-process set-based reference on a skewed synthetic corpus."""
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocrs_ray.ops.analytics import source_distinct_shingles
    from ocrs_ray.ops.text import TOKEN_CLASS_RE

    rng = np.random.default_rng(7)
    n = 2000
    vocab = np.array([f"w{i:03d}" for i in range(300)])
    hot = rng.random(n) < 0.7  # one source owns 70% of docs
    sources = np.where(
        hot, "hot", np.char.add("cold", rng.integers(0, 5, n).astype(str))
    )
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), 20)]) for _ in range(n)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), type=pa.int64()),
                "source": pa.array(sources.tolist(), type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
            }
        ),
        f"{tmp_path}/documents.parquet",
    )
    tok = re.compile(TOKEN_CLASS_RE)
    ref: dict[str, set] = {}
    for s, t in zip(sources, texts):
        w = tok.findall(t)
        sset = ref.setdefault(s, set())
        for j in range(len(w) - 2):
            sset.add(" ".join(w[j : j + 3]))
    out = source_distinct_shingles(str(tmp_path)).to_pandas()
    got = dict(zip(out["source"], out["n_distinct_shingles"]))
    assert got == {s: len(v) for s, v in ref.items()}
    assert got["hot"] > max(v for k, v in got.items() if k != "hot")
