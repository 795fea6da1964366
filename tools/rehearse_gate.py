"""Driver-gate rehearsal: run gate queries() against their oracle_sql()
at the driver's scale (sf0.01) with the driver's compare semantics
(row count, column-name set, value hash over name-sorted columns).

Usage (from /root/repo):
    python tools/rehearse_gate.py                 # all 50 gate entries
    python tools/rehearse_gate.py name1 name2 ... # a subset

Owns its Ray session (the driver inits Ray itself; this mimic does the
same from the outside). Never run concurrently with a bench.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

# repo root on the path BEFORE ray.init — workers inherit the
# init-time import path (the CLAUDE.md silent-hang gotcha)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _hash_df(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    d = df[cols].sort_values(cols).reset_index(drop=True)
    # round-trip floats through a fixed repr so -0.0/0.0 and dtype
    # width don't flip the hash (the driver compares values, not bits)
    payload = d.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.md5(payload).hexdigest()


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=16,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    names = sys.argv[1:] or entry._GATE_ORDER
    q = entry.queries()
    o = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    fails = 0
    for name in names:
        rec: dict = {}
        try:
            res = q[name](SF)
            out = res.to_pandas() if hasattr(res, "to_pandas") else res
            if not isinstance(out, pd.DataFrame):
                out = out.to_pandas()
            exp = con.execute(o[name]).df()
            rec["rows_match"] = len(out) == len(exp)
            rec["schema_match"] = sorted(out.columns) == sorted(exp.columns)
            rec["hash_match"] = (
                rec["rows_match"]
                and rec["schema_match"]
                and _hash_df(out) == _hash_df(exp)
            )
            rec["rows"] = len(out)
            rec["err"] = None
        except Exception as e:  # noqa: BLE001 — rehearsal records, not raises
            rec = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "err": f"{type(e).__name__}: {e}"[:300],
            }
        ok = rec.get("hash_match", False)
        fails += 0 if ok else 1
        print(("PASS " if ok else "FAIL ") + name, flush=True)
        results[name] = rec
    ray.shutdown()
    print(json.dumps({"n": len(names), "fails": fails}))
    if fails:
        for k, v in results.items():
            if not v.get("hash_match"):
                print(k, v)
        sys.exit(1)


if __name__ == "__main__":
    main()
