"""Windowed / grouped aggregates over the events and lineitem tables.

Demonstrates the at-scale aggregation pattern: vectorized partial
aggregation inside `map_batches` (one row per key per batch), then a
small `groupby` over the partials — the shuffle moves partial sums,
never raw rows. Float measures are aggregated as integer micro-units
so results compare bit-exactly against the SQL oracle regardless of
summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["events_tumbling_window", "lineitem_pricing_summary", "round_half_away"]

MICRO = 1_000_000


def round_half_away(v: np.ndarray) -> np.ndarray:
    """Round half away from zero (matches SQL ROUND), not banker's."""
    return np.sign(v) * np.floor(np.abs(v) + 0.5)


def events_tumbling_window(sf_dir: str, window_s: int = 300) -> rd.Dataset:
    """Tumbling-window aggregate per event_type.

    Events are batch data here (Ray Data has no event-time streaming);
    the window key is floor(epoch/window). Value sums are integer
    micro-units.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        epoch = batch["ts"].astype("int64") // 1_000_000
        win = (epoch // window_s).astype("int64")
        micro = round_half_away(batch["value"].to_numpy() * MICRO).astype("int64")
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "window_start": win * window_s,
                "value_micro": micro,
                "n": np.ones(len(batch), dtype="int64"),
            }
        )
        return df.groupby(["event_type", "window_start"], as_index=False).agg(
            value_micro=("value_micro", "sum"), n=("n", "sum")
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    ).map_batches(partial, batch_format="pandas")
    return ds.groupby(["event_type", "window_start"]).aggregate(
        Sum("value_micro", alias_name="sum_value_micro"),
        Sum("n", alias_name="n_events"),
    )


def lineitem_pricing_summary(sf_dir: str, cutoff: str = "1998-09-02") -> rd.Dataset:
    """TPC-H Q1-shaped pricing summary over lineitem.

    Row filter applied at the batch level; money measures carried as
    integer micro-units through the partial + final aggregation.
    """
    cutoff_ts = pd.Timestamp(cutoff)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["l_shipdate"] <= cutoff_ts]
        if b.empty:
            return pd.DataFrame(
                {
                    "l_returnflag": pd.Series([], dtype="object"),
                    "l_linestatus": pd.Series([], dtype="object"),
                    "sum_qty_micro": pd.Series([], dtype="int64"),
                    "sum_base_micro": pd.Series([], dtype="int64"),
                    "sum_disc_micro": pd.Series([], dtype="int64"),
                    "n_rows": pd.Series([], dtype="int64"),
                }
            )
        qty = round_half_away(b["l_quantity"].to_numpy() * MICRO).astype("int64")
        base = round_half_away(b["l_extendedprice"].to_numpy() * MICRO).astype("int64")
        disc = round_half_away(
            (b["l_extendedprice"] * (1.0 - b["l_discount"])).to_numpy() * MICRO
        ).astype("int64")
        df = pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"].to_numpy(),
                "l_linestatus": b["l_linestatus"].to_numpy(),
                "sum_qty_micro": qty,
                "sum_base_micro": base,
                "sum_disc_micro": disc,
                "n_rows": np.ones(len(b), dtype="int64"),
            }
        )
        return df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    ).map_batches(partial, batch_format="pandas")
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_micro", alias_name="sum_qty_micro"),
        Sum("sum_base_micro", alias_name="sum_base_micro"),
        Sum("sum_disc_micro", alias_name="sum_disc_micro"),
        Sum("n_rows", alias_name="n_rows"),
    )
