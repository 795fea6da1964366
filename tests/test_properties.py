"""Property-based tests (hypothesis) for the pure kernels.

The reference pins behavior with seeded randomized tests; these go
further and assert algebraic invariants over generated inputs for the
kernels whose correctness the pipeline leans on hardest: CTC decoding,
rect geometry, min-area rects, union-find, and the Misra-Gries sketch.
No Ray session required — everything here is kernel-level.
"""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# CTC


def _naive_ctc_greedy(scores: np.ndarray) -> list[tuple[int, int]]:
    """Independent re-derivation of best-path decoding: argmax per
    frame, collapse runs, drop blanks, keep first frame of each run."""
    labels = [int(np.argmax(row)) for row in scores]
    out = []
    prev = None
    for t, lab in enumerate(labels):
        if lab != 0 and lab != prev:
            out.append((t, lab))
        prev = lab
    return out


@st.composite
def score_matrices(draw):
    t = draw(st.integers(min_value=0, max_value=24))
    c = draw(st.integers(min_value=2, max_value=6))
    vals = draw(
        st.lists(
            st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
            min_size=t * c,
            max_size=t * c,
        )
    )
    return np.array(vals, dtype=np.float32).reshape(t, c)


@given(score_matrices())
@settings(max_examples=200, deadline=None)
def test_ctc_greedy_matches_naive(scores):
    from ocrs_ray.ctc import decode_greedy

    got = [(s.pos, s.label) for s in decode_greedy(scores)]
    assert got == _naive_ctc_greedy(scores)


@given(score_matrices())
@settings(max_examples=100, deadline=None)
def test_ctc_greedy_invariants(scores):
    from ocrs_ray.ctc import decode_greedy

    steps = decode_greedy(scores)
    poses = [s.pos for s in steps]
    assert poses == sorted(poses)
    assert len(set(poses)) == len(poses)
    assert all(s.label != 0 for s in steps)
    assert all(0 <= s.pos < len(scores) for s in steps)


@given(score_matrices(), st.integers(min_value=1, max_value=8))
@settings(max_examples=100, deadline=None)
def test_ctc_beam_invariants(scores, width):
    from ocrs_ray.ctc import decode_beam

    # Work in log-prob space (beam expects normalized-ish scores).
    if len(scores):
        logp = scores - scores.max(axis=1, keepdims=True)
        logp = logp - np.log(np.exp(logp).sum(axis=1, keepdims=True))
    else:
        logp = scores
    steps = decode_beam(logp, beam_width=width)
    poses = [s.pos for s in steps]
    assert poses == sorted(poses)
    assert all(s.label != 0 for s in steps)
    assert all(0 <= s.pos < len(scores) for s in steps)


@given(score_matrices(), st.integers(min_value=1, max_value=12))
@settings(max_examples=100, deadline=None)
@example(
    scores=np.array([[0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.],
           [0., 0.]], dtype=np.float32),
    width=2,
).via('discovered failure')
def test_ctc_beam_matches_reference_impl(scores, width):
    """Differential test: the vectorized beam search is bit-identical
    to the dict-of-prefix-tuples textbook implementation."""
    from ocrs_ray.ctc import _decode_beam_reference, decode_beam

    if len(scores):
        logp = scores - scores.max(axis=1, keepdims=True)
        logp = logp - np.log(np.exp(logp).sum(axis=1, keepdims=True))
    else:
        logp = scores
    fast = [(s.pos, s.label) for s in decode_beam(logp, beam_width=width)]
    ref = [(s.pos, s.label) for s in _decode_beam_reference(logp, beam_width=width)]
    assert fast == ref


@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=16),
    st.integers(min_value=2, max_value=16),
)
@settings(max_examples=100, deadline=None)
def test_ctc_beam_equals_greedy_on_onehot(path, width):
    """For (near-)deterministic frame distributions the best path IS
    the best labeling, so beam search at any width must agree with
    greedy."""
    from ocrs_ray.ctc import decode_beam, decode_greedy

    c = 6
    scores = np.full((len(path), c), -20.0)
    for t, lab in enumerate(path):
        scores[t, lab] = 0.0
    greedy = [(s.pos, s.label) for s in decode_greedy(scores)]
    beam = [(s.pos, s.label) for s in decode_beam(scores, beam_width=width)]
    assert [l for _, l in beam] == [l for _, l in greedy]


# ---------------------------------------------------------------------------
# Rect geometry


rect_ints = st.integers(min_value=-50, max_value=50)


@st.composite
def rects(draw):
    from ocrs_ray.geometry import Rect

    t, l = draw(rect_ints), draw(rect_ints)
    h = draw(st.integers(min_value=0, max_value=40))
    w = draw(st.integers(min_value=0, max_value=40))
    return Rect(t, l, t + h, l + w)


@given(rects(), rects())
@settings(max_examples=200, deadline=None)
def test_rect_iou_union_properties(a, b):
    assert a.iou(b) == b.iou(a)
    assert 0.0 <= a.iou(b) <= 1.0
    u = a.union(b)
    assert u.contains(a) and u.contains(b)
    assert a.intersection_area(b) == b.intersection_area(a)
    assert a.intersection_area(b) <= min(a.area(), b.area())
    # intersects() is consistent with a positive-area overlap for
    # non-degenerate rects.
    if a.intersection_area(b) > 0:
        assert a.intersects(b)


@given(rects())
@settings(max_examples=100, deadline=None)
def test_rect_self_identities(a):
    assert a.iou(a) in (0.0, 1.0)  # 0 only for zero-area rects
    assert a.union(a) == a
    assert a.intersection_area(a) == a.area()


# ---------------------------------------------------------------------------
# Min-area rect


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=24,
    )
)
@settings(max_examples=150, deadline=None)
def test_min_area_rect_contains_all_points(pts):
    from ocrs_ray.geometry import Point, min_area_rect

    rr = min_area_rect([Point(x, y) for x, y in pts])
    assert rr is not None
    # Every input point lies inside the rect: project onto the rect's
    # axes and compare to half-extents (with float tolerance).
    up = np.array([rr.up_x, rr.up_y])
    perp = np.array([-rr.up_y, rr.up_x])
    c = np.array([rr.cx, rr.cy])
    arr = np.array(pts, dtype=np.float64) - c
    eps = 1e-6 * (1 + np.abs(arr).max())
    assert np.all(np.abs(arr @ perp) <= rr.w / 2 + eps)
    assert np.all(np.abs(arr @ up) <= rr.h / 2 + eps)


@given(
    st.lists(
        st.tuples(rect_ints, rect_ints),
        min_size=3,
        max_size=24,
    )
)
@settings(max_examples=150, deadline=None)
def test_min_area_rect_no_larger_than_aabb(pts):
    """The oriented min-area rect is optimal, so it can never exceed
    the axis-aligned bounding box: area(min_rect) <= area(AABB)."""
    from ocrs_ray.geometry import Point, min_area_rect

    rr = min_area_rect([Point(x, y) for x, y in pts])
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    aabb_area = (max(xs) - min(xs)) * (max(ys) - min(ys))
    assert rr.area() <= aabb_area + 1e-6


# ---------------------------------------------------------------------------
# Union-find (connected components local path)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=15),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=0,
        max_size=30,
    )
)
@settings(max_examples=150, deadline=None)
def test_union_find_matches_bfs(edges):
    from ocrs_ray.ops.analytics import _union_find

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    u = np.array([e[0] for e in edges], dtype=np.int64)
    v = np.array([e[1] for e in edges], dtype=np.int64)
    got = _union_find(u, v)
    # BFS reference.
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict[int, int] = {}
    for start in sorted(adj):
        if start in want:
            continue
        comp, queue = {start}, [start]
        while queue:
            n = queue.pop()
            for m in adj[n]:
                if m not in comp:
                    comp.add(m)
                    queue.append(m)
        root = min(comp)
        for n in comp:
            want[n] = root
    assert got == want


# ---------------------------------------------------------------------------
# Misra-Gries sketch


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=300),
    st.integers(min_value=2, max_value=16),
)
@settings(max_examples=150, deadline=None)
def test_mg_bounds_hold_on_any_stream(stream, capacity):
    import pandas as pd

    from ocrs_ray.ops.analytics import _mg_summarize

    df = pd.DataFrame({"user_id": np.array(stream, dtype=np.int64)})
    summary = _mg_summarize(df, capacity)
    assert len(summary) <= capacity
    exact = df.groupby("user_id").size()
    err = len(stream) / capacity
    for uid, n in zip(summary["user_id"], summary["n"]):
        true = int(exact.loc[uid])
        assert n <= true, "MG estimate must be a lower bound"
        assert n >= true - err, "MG error bound violated"
    # Survival guarantee: every key with count > n/capacity is present.
    for uid, true in exact.items():
        if true > err:
            assert uid in set(summary["user_id"])


# ---------------------------------------------------------------------------
# Preprocess (greyscale normalize)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([1, 3, 4]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=100, deadline=None)
def test_prepare_image_range_and_shape(h, w, c, seed):
    from ocrs_ray.preprocess import BLACK_VALUE, prepare_image

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    out = prepare_image(img, order="hwc")
    assert out.shape == (1, h, w)
    assert out.dtype == np.float32
    assert np.all(out >= BLACK_VALUE - 1e-6)
    assert np.all(out <= BLACK_VALUE + 1 + 1e-6)
    # Uniform-value image -> uniform output (weights sum to 1).
    flat = np.full((h, w, c), 128, dtype=np.uint8)
    ref = prepare_image(flat, order="hwc")
    assert np.allclose(ref, ref.flat[0])


@given(
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
    st.sampled_from([1, 3, 4]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=50, deadline=None)
def test_prepare_image_layout_equivalence(h, w, c, seed):
    """HWC and CHW layouts of the same pixels must normalize
    identically."""
    from ocrs_ray.preprocess import prepare_image

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    a = prepare_image(img, order="hwc")
    b = prepare_image(np.ascontiguousarray(img.transpose(2, 0, 1)), order="chw")
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# Layout (line grouping partition property)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=400),  # left
            st.integers(min_value=0, max_value=200),  # top
            st.integers(min_value=5, max_value=60),   # width
            st.integers(min_value=5, max_value=20),   # height
        ),
        min_size=0,
        max_size=25,
    )
)
@settings(max_examples=100, deadline=None)
def test_find_text_lines_partitions_words(boxes):
    """Every word lands in exactly one line; no line is empty; lines
    appear in (roughly) reading order by their vertical position."""
    from ocrs_ray.geometry import Point, RectF, RotatedRect
    from ocrs_ray.layout import find_text_lines

    words = [
        RotatedRect.from_rect(RectF(t, l, t + hh, l + ww))
        for l, t, ww, hh in boxes
    ]
    lines = find_text_lines(words)
    assert all(len(line) > 0 for line in lines)
    flat = [w for line in lines for w in line]
    assert len(flat) == len(words)
    # Identity partition: every input object appears exactly once.
    assert {id(w) for w in flat} == {id(w) for w in words}
    # Within each line, words are ordered left-to-right by left edge.
    for line in lines:
        lefts = [w.bounding_rect().left for w in line]
        assert lefts == sorted(lefts)


def test_ntile_buckets_match_sql_semantics():
    """_ntile_buckets must reproduce SQL NTILE exactly, INCLUDING the
    cnt < n edge (fewer rows than buckets) the real tables never hit."""
    import duckdb
    import numpy as np

    from ocrs_ray.ops.analytics import _ntile_buckets

    con = duckdb.connect()
    for cnt in [1, 2, 3, 4, 5, 7, 8, 9, 100]:
        for n in [1, 2, 3, 4, 5]:
            exp = [
                r[0]
                for r in con.execute(
                    f"SELECT ntile({n}) OVER (ORDER BY x) FROM "
                    f"(SELECT unnest(generate_series(1, {cnt})) AS x) ORDER BY x"
                ).fetchall()
            ]
            got = _ntile_buckets(
                np.arange(cnt, dtype="int64"),
                np.full(cnt, cnt, dtype="int64"),
                n,
            ).tolist()
            assert got == exp, (cnt, n, got, exp)


def test_banded_levenshtein_and_symspell_blocking():
    """_lev must equal true Levenshtein (capped) and the deletion-
    variant blocking must be lossless: lev(a,b) <= 2 implies the
    variant sets intersect — the guarantee fuzzy_name_pairs rests on."""
    import random

    import duckdb

    from ocrs_ray.ops.dedup import _deletion_variants, _lev

    rng = random.Random(7)
    alpha = "abcde"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(3, 10)))
        for _ in range(60)
    ]
    con = duckdb.connect()
    for a in words[:30]:
        for b in words[30:]:
            true = con.execute(
                "SELECT levenshtein(?, ?)", [a, b]
            ).fetchone()[0]
            got = _lev(a, b, 2)
            assert got == min(true, 3), (a, b, true, got)
            if true <= 2:
                assert _deletion_variants(a) & _deletion_variants(b), (a, b)


@given(
    st.lists(
        st.integers(min_value=-200, max_value=200), min_size=0, max_size=60
    ),
    st.integers(min_value=1, max_value=25),
)
def test_band_join_exactly_once(values, eps):
    """The bucket + one-sided-ghost decomposition finds every |a-b|<=eps
    pair EXACTLY once (no dedup pass) — including boundary values that
    are exact multiples of eps, duplicates, and negatives."""
    import numpy as np
    import pandas as pd

    from ocrs_ray.ops.relational import band_bucketize, band_pairs

    v = np.asarray(values, dtype="int64")
    ids = np.arange(len(v), dtype="int64")
    got = band_pairs(band_bucketize(v, ids, eps), eps)
    got_pairs = list(zip(got["event_a"], got["event_b"], got["dv_micro"]))
    # No pair emitted twice (the exactly-once claim, pre-dedup).
    assert len(got_pairs) == len(set(got_pairs)) == len(
        set((a, b) for a, b, _ in got_pairs)
    )
    expect = set()
    for i in range(len(v)):
        for j in range(i + 1, len(v)):
            if abs(int(v[i]) - int(v[j])) <= eps:
                expect.add((min(i, j), max(i, j), abs(int(v[i]) - int(v[j]))))
    assert set(got_pairs) == expect


# ---------------------------------------------------------------------------
# Link-degree / anchor-profile combiners (extraction.py) — exchange
# independence: composing the per-block kernels over ANY partition of
# the rows (respecting each kernel's co-location contract) must equal
# the single-shot brute force.


@st.composite
def edge_lists(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    edges = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=9),
                st.integers(min_value=0, max_value=9),
            ).filter(lambda e: e[0] != e[1]),
            min_size=0,
            max_size=60,
        )
    )
    return n, edges


@given(edge_lists())
@settings(max_examples=60, deadline=None)
def test_degree_combiners_match_bruteforce(case):
    import pandas as pd

    from ocrs_ray.ops import extraction as ex

    n_docs, edges = case
    df = pd.DataFrame(
        {
            "src": pd.Series([e[0] for e in edges], dtype="int64"),
            "dst": pd.Series([e[1] for e in edges], dtype="int64"),
        }
    )
    paired = ex._degree_add_pair(df)
    # partition by pair (the exchange contract), grouped arbitrarily
    # into 3 buckets by a hash of the pair
    blocks = [
        ex._degree_pair_resolve(
            paired[(paired["lo"] * 31 + paired["hi"]) % 3 == b]
            if not paired.empty
            else paired
        )
        for b in range(3)
    ]
    zeros = ex._degree_zero_rows(
        pd.DataFrame({"doc_id": pd.Series(range(n_docs), dtype="int64")})
    )
    out = (
        ex._degree_final_sum(pd.concat(blocks + [zeros]))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # brute force over distinct edges
    dedup = {(s, d) for s, d in edges}
    exp_rows = []
    for doc in range(n_docs):
        outd = len({d for s, d in dedup if s == doc})
        ind = len({s for s, d in dedup if d == doc})
        rec = len(
            {d for s, d in dedup if s == doc and (d, s) in dedup}
        )
        exp_rows.append((doc, outd, ind, rec))
    exp = pd.DataFrame(
        exp_rows, columns=["doc_id", "out_degree", "in_degree", "reciprocal_degree"]
    ).astype("int64")
    # docs outside 0..n_docs-1 can appear in `out` when edges name
    # them; restrict to the zero-row-covered id space like the op does
    out = out[out["doc_id"] < n_docs].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


@st.composite
def anchor_lists(draw):
    rows = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),  # dst
                st.integers(min_value=0, max_value=9),  # src
                st.text(
                    alphabet="abcdXYZ []|", min_size=0, max_size=6
                ),  # anchor (ASCII incl. the join char — order only)
            ),
            min_size=1,
            max_size=50,
        )
    )
    k = draw(st.integers(min_value=1, max_value=4))
    nsplit = draw(st.integers(min_value=1, max_value=4))
    return rows, k, nsplit


@given(anchor_lists())
@settings(max_examples=60, deadline=None)
def test_anchor_combiners_match_bruteforce(case):
    import pandas as pd

    from ocrs_ray.ops import extraction as ex

    rows, k, nsplit = case
    df = pd.DataFrame(
        {
            "src": pd.Series([r[1] for r in rows], dtype="int64"),
            "dst": pd.Series([r[0] for r in rows], dtype="int64"),
            "anchor": [r[2] for r in rows],
        }
    )
    # arbitrary batch split (combiner has no co-location contract)
    partials = [
        ex._anchor_combine(df.iloc[i::nsplit].reset_index(drop=True), k=k)
        for i in range(nsplit)
    ]
    partials = [p for p in partials if hasattr(p, "empty") and not p.empty]
    out = (
        ex._anchor_finish(pd.concat(partials).reset_index(drop=True), k=k)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp_rows = []
    for dst in sorted({r[0] for r in rows}):
        grp = sorted(
            ((r[2], r[1]) for r in rows if r[0] == dst)
        )
        exp_rows.append(
            (dst, len(grp), "|".join(a for a, _ in grp[:k]))
        )
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "in_degree", "top_anchors"])
    exp["doc_id"] = exp["doc_id"].astype("int64")
    exp["in_degree"] = exp["in_degree"].astype("int64")
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


# ---------------------------------------------------------------------------
# URL canonicalization: idempotence + structural invariants over the
# rendered variant domain (arbitrary doc_id / srcN source)


@given(
    st.integers(min_value=0, max_value=10**12),
    st.integers(min_value=0, max_value=99_999),
)
@settings(max_examples=200, deadline=None)
def test_url_normalize_idempotent_and_clean(doc_id, src_k):
    import pyarrow as pa

    from ocrs_ray.ops import extraction as ex

    batch = pa.table(
        {
            "doc_id": pa.array([doc_id], type=pa.int64()),
            "source": pa.array([f"src{src_k}"]),
        }
    )
    t = ex._render_url_variants(batch)
    norm = t.column("href_norm").to_pylist()
    # idempotent on the rendered domain (<= 1 dot-segment per URL by
    # construction — the single-pass resolve step's documented bound)
    again = ex.normalize_urls(pa.array(norm)).to_pylist()
    assert again == norm
    for u in norm:
        assert "#" not in u
        assert "utm_" not in u
        assert "/../" not in u
        body = u.split("://", 1)[-1]
        assert "//" not in body
        assert u == "/" or not u.endswith("/")
        assert not u.endswith(("?", "&"))


# ---------------------------------------------------------------------------
# PDF dehyphenation: independent reference round-trips any corpus-like
# text through the hyphenated stream


@given(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz ",
        min_size=1,
        max_size=500,
    )
)
@settings(max_examples=200, deadline=None)
@example("a" * 39 + "xy")  # straddle exactly at the chunk boundary
@example("b" * 40 + " c")  # boundary after a full chunk, next is space
def test_pdf_dehyphenation_roundtrip(text):
    import re as _re

    from ocrs_ray.ops import extraction as ex

    stream = ex._pdf_hyphen_stream_for_text(text)
    runs = [
        (int(x), int(y), rt)
        for x, y, rt in _re.findall(ex.PDF_RUN_RE, stream)
    ]
    runs.sort(key=lambda r: (-r[1], r[0]))
    parts = []
    for k, (_x, _y, rt) in enumerate(runs):
        nxt = runs[k + 1][2] if k + 1 < len(runs) else None
        if rt.endswith("-") and nxt and not nxt.startswith(" "):
            parts.append(rt[:-1])
        else:
            parts.append(rt)
    assert "".join(parts) == text


@given(
    st.integers(min_value=1, max_value=60),  # members
    st.integers(min_value=2, max_value=16),  # dim
    st.floats(min_value=0.0, max_value=1.0),  # eps
    st.integers(min_value=0, max_value=2**31 - 1),  # seed
)
@settings(max_examples=150, deadline=None)
def test_semdedup_prune_properties(m, dim, eps, seed):
    """SemDeDup prune kernel invariants on random unit vectors:
    (1) CHUNK-SIZE INVARIANCE — the chunked-GEMM implementation must
    return the identical keep mask at chunk=1, 3, and 2048 (pins the
    earlier-rows/intra-chunk composition exactly);
    (2) the highest-priority member is always kept;
    (3) tau above the max pairwise cosine keeps everything;
    (4) tau at/below the min keeps ONLY the first-in-order member
    (triangular semantics: every later member has some predecessor at
    >= tau)."""
    import numpy as np

    from ocrs_ray.ops.similarity import (
        _unit,
        semdedup_prune,
        semdedup_prune_order,
    )

    rng = np.random.default_rng(seed)
    unit = _unit(rng.normal(size=(m, dim)))
    vid = rng.permutation(m).astype(np.int64)
    cent = _unit(rng.normal(size=(1, dim)))[0]
    order = semdedup_prune_order(unit, cent, vid)
    tau = 1.0 - eps

    ref = semdedup_prune(unit, order, tau, chunk=2048)
    for chunk in (1, 3):
        assert semdedup_prune(unit, order, tau, chunk=chunk).tolist() == ref.tolist()

    assert ref[order[0]]  # first-in-order always kept
    sims = unit @ unit.T
    np.fill_diagonal(sims, -np.inf)
    if m > 1:
        if tau > sims.max():
            assert ref.all()
        if tau <= sims.min():
            assert ref.sum() == 1 and ref[order[0]]
