"""Tests for mergeable-sketch operators (t-digest, Bloom semi-join)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# t-digest kernel


def test_tdigest_exact_on_small_inputs():
    from ocrs_ray.ops.sketch import TDigest

    d = TDigest.of(np.array([1.0]))
    assert d.quantile(0.5) == 1.0
    d = TDigest.of(np.array([1.0, 2.0, 3.0, 4.0]))
    assert 1.0 <= d.quantile(0.25) <= 2.5
    assert d.quantile(0.0) == 1.0
    assert d.quantile(1.0) == 4.0


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=500,
    ),
    st.sampled_from([0.1, 0.5, 0.9, 0.95]),
)
@settings(max_examples=60, deadline=None)
def test_tdigest_quantile_within_rank_error(values, q):
    from ocrs_ray.ops.sketch import TDigest

    arr = np.array(values)
    d = TDigest.of(arr, delta=100)
    est = d.quantile(q)
    # Rank-accuracy: estimate must fall within +-5% rank of q.
    s = np.sort(arr)
    lo = s[max(0, int(np.floor((q - 0.05) * (len(s) - 1))))]
    hi = s[min(len(s) - 1, int(np.ceil((q + 0.05) * (len(s) - 1))))]
    tol = 1e-9 * (1 + np.abs(arr).max())  # centroid means round in floats
    assert lo - tol <= est <= hi + tol


def test_tdigest_mergeability():
    from ocrs_ray.ops.sketch import TDigest, tdigest_merge_all

    rng = np.random.default_rng(3)
    vals = rng.lognormal(0, 1, size=20_000)
    whole = TDigest.of(vals)
    parts = [TDigest.of(c) for c in np.array_split(vals, 13)]
    merged = tdigest_merge_all(parts)
    for q in (0.5, 0.9, 0.95, 0.99):
        exact = np.quantile(vals, q)
        assert abs(merged.quantile(q) - exact) / exact < 0.05
        assert abs(whole.quantile(q) - exact) / exact < 0.05
    # Bounded size regardless of input count.
    assert len(merged.means) < 200


def test_tdigest_centroid_count_bounded():
    from ocrs_ray.ops.sketch import TDigest

    rng = np.random.default_rng(5)
    d = TDigest.of(rng.normal(size=50_000), delta=100)
    assert len(d.means) <= 120  # ~delta centroids


# ---------------------------------------------------------------------------
# t-digest operator


def test_events_value_tdigest_close_to_exact(ray_session):
    from ocrs_ray.ops.sketch import events_value_tdigest

    out = events_value_tdigest(SF).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "value"]).to_pandas()
    for etype, grp in ev.groupby("event_type"):
        vals = grp["value"].to_numpy()
        assert out.loc[etype, "n_events"] == len(vals)
        for col, q in (("p50_approx", 0.5), ("p95_approx", 0.95)):
            exact = np.quantile(vals, q)
            spread = vals.max() - vals.min()
            assert abs(out.loc[etype, col] - exact) <= 0.05 * spread


# ---------------------------------------------------------------------------
# Bloom filter kernel


def test_bloom_no_false_negatives_and_low_fpr():
    from ocrs_ray.ops.sketch import BloomFilter

    rng = np.random.default_rng(11)
    members = rng.integers(0, 1 << 40, size=5_000)
    others = rng.integers(1 << 41, 1 << 42, size=50_000)
    bf = BloomFilter(n_bits=1 << 17, k=5)
    bf.add(members)
    assert bf.contains(members).all(), "Bloom filters never false-negative"
    fpr = bf.contains(others).mean()
    # m/n ~ 26 bits/key, k=5 -> theoretical FPR ~ 0.001; allow 10x.
    assert fpr < 0.01


def test_bloom_union_equals_bulk_add():
    from ocrs_ray.ops.sketch import BloomFilter

    rng = np.random.default_rng(12)
    a_keys = rng.integers(0, 1 << 40, size=1000)
    b_keys = rng.integers(0, 1 << 40, size=1000)
    a = BloomFilter(1 << 14, 4)
    a.add(a_keys)
    b = BloomFilter(1 << 14, 4)
    b.add(b_keys)
    both = BloomFilter(1 << 14, 4)
    both.add(np.concatenate([a_keys, b_keys]))
    assert np.array_equal(a.union(b).bits, both.bits)


# ---------------------------------------------------------------------------
# Bloom semi-join operator


def test_active_customers_bloom_superset_of_exact(ray_session):
    from ocrs_ray.ops.sketch import active_customers_bloom

    out = active_customers_bloom(SF).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]).to_pandas()
    active = set(
        orders.loc[orders["o_orderdate"] >= pd.Timestamp("2001-01-01"), "o_custkey"]
    ) & set(cust["c_custkey"])
    got = set(out["c_custkey"])
    assert active.issubset(got), "semi-join must keep every true active customer"
    # False-positive rate over the inactive population stays tiny at
    # 2^20 bits for this key count.
    inactive = set(cust["c_custkey"]) - active
    if inactive:
        assert len(got - active) / len(inactive) < 0.01
