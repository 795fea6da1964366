"""Scale proof for the URL-canonicalization family: synthesize an
N-doc documents table (same schema as testdata), run
docs_url_canonical_groups / frontier_new_urls / source_crawl_budget
over it, and report wall + driver peak RSS. The point: the keyed
exchange carries per-batch-combined partials only, the anti-join is
Ray's native left_anti, and nothing corpus-proportional lands on the
driver — wall grows with N, RSS does not.

Usage (owns its Ray session — never run concurrently with a bench):
    python tools/scale_proof_urls.py [n_docs] [num_cpus]
"""

from __future__ import annotations

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
NCPU = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ROOT = "/tmp/ocrs_ray_urlproof"


def _synth(n: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(ROOT, exist_ok=True)
    path = os.path.join(ROOT, f"docs_{n}")
    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, "documents.parquet")
    if not os.path.exists(f):
        ids = np.arange(n, dtype=np.int64)
        t = pa.table(
            {
                "doc_id": ids,
                "text": pa.array(["w w w"] * n),
                "lang": pa.array(["en"] * n),
                "source": pa.array([f"src{i % 100}" for i in range(n)]),
            }
        )
        pq.write_table(t, f, row_group_size=max(1000, n // 64))
    return path


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def main() -> None:
    sf_dir = _synth(N)
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NCPU,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocrs_ray.ops.extraction import (
        docs_url_canonical_groups,
        frontier_new_urls,
        source_crawl_budget,
    )

    out = {"n_docs": N, "num_cpus": NCPU}
    for name, fn in (
        ("url_canonical_groups", docs_url_canonical_groups),
        ("frontier_new_urls", frontier_new_urls),
        ("source_crawl_budget", source_crawl_budget),
    ):
        t0 = time.time()
        n_rows = fn(sf_dir).count()
        out[name] = {
            "rows": n_rows,
            "wall_sec": round(time.time() - t0, 2),
            # ru_maxrss is the PROCESS-LIFETIME high-water mark (it
            # never decreases) — report the cumulative peak after each
            # op, not a misleading per-op before/after delta. A flat
            # sequence across ops and across N is the flat-driver
            # evidence.
            "driver_peak_rss_mb": round(_rss_mb(), 1),
        }
    ray.shutdown()
    import json

    print(json.dumps(out))


if __name__ == "__main__":
    main()
