"""Full oracle sweep: every SQL-expressible driver query, Ray vs
DuckDB, value-exact — the in-repo mirror of the driver's correctness
gate (`CORRECTNESS_r{N}.json`), so `python -m pytest -x -q` alone
certifies the contract at sf0.001.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _oracle_names():
    import __ray_entry__ as entry

    return sorted(entry.oracle_sql().keys())


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(ray_session, oracle_con, name):
    import __ray_entry__ as entry

    # The ocr_*/media_*/video_* oracles compare against deterministic
    # goldens that their queries generate under the sf0.01 corpus key
    # (the driver's gate scale); table-backed oracles run at sf0.001
    # for speed.
    sf = (
        "/root/testdata/sf0.01"
        if name.startswith(("ocr_", "media_", "video_", "audio_"))
        else SF
    )
    res = entry.queries()[name](sf)
    out = res.to_pandas() if hasattr(res, "to_pandas") else res
    exp = oracle_con.execute(entry.oracle_sql()[name]).df()
    cols = sorted(exp.columns)
    assert sorted(out.columns) == cols, f"{name}: column mismatch"
    a = out[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
