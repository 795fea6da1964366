"""SemDeDup scale proof: run `similarity.semdedup_survivors` over a
large synthetic embedding table with PLANTED duplicate groups and
report wall, throughput, keep rate, collapse accuracy, and driver RSS.

Usage (from /root/repo, owns its Ray session):
    python tools/semdedup_scale_proof.py [n_rows] [num_cpus] [nlist]

Corpus: `n_rows` 64-dim vectors; 70% unique seeded gaussians, 30%
members of 4-member near-duplicate groups (one base + three copies
perturbed by 1e-3 noise — cosine >> 1-eps to the base, far from
everything else). Written in streaming row groups so the driver never
holds the table. Ground truth: every planted group should collapse to
exactly ONE survivor (its members are within eps of each other and
land in the same cosine cell); unique rows should all survive.
"""

from __future__ import annotations

import os
import resource
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
GROUP = 4  # members per planted dup group


def gen_table(path: str, n_rows: int, seed: int = 7) -> int:
    """Streaming parquet write; returns number of planted groups.

    Layout: rows [0, n_dup) are dup-group members (consecutive blocks
    of GROUP share a base), rows [n_dup, n) are unique. vec_ids are
    then SHUFFLED across the file via a seeded permutation written as
    the vec_id column (the table is not sorted by id), so group
    members do NOT share a block — collapse must survive the shuffle.
    """
    n_groups = int(n_rows * 0.30) // GROUP
    n_dup = n_groups * GROUP
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n_rows).astype(np.int64)  # row -> vec_id
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    chunk = 8192
    with pq.ParquetWriter(path, schema) as w:
        row = 0
        while row < n_rows:
            e = min(row + chunk, n_rows)
            out = np.empty((e - row, DIM), dtype=np.float64)
            for i in range(row, e):
                if i < n_dup:
                    g, m = divmod(i, GROUP)
                    base_rng = np.random.default_rng(seed * 1_000_003 + g)
                    v = base_rng.normal(size=DIM)
                    if m:
                        v = v + 1e-3 * np.random.default_rng(
                            seed * 7_000_003 + i
                        ).normal(size=DIM)
                else:
                    v = np.random.default_rng(seed * 13_000_017 + i).normal(
                        size=DIM
                    )
                out[i - row] = v
            w.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(perm[row:e]),
                        "embedding": pa.array(
                            [r.astype(np.float32).tolist() for r in out],
                            type=pa.list_(pa.float32()),
                        ),
                        "label": pa.array(
                            np.zeros(e - row, dtype=np.int32)
                        ),
                    },
                    schema=schema,
                )
            )
            row = e
    return n_groups


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_rows = int(args[0]) if len(args) > 0 else 200_000
    num_cpus = int(args[1]) if len(args) > 1 else 32
    nlist = int(args[2]) if len(args) > 2 else 128

    root = "/tmp/ocrs_ray_semdedup_proof"
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "embeddings.parquet")
    marker = os.path.join(root, f"params_{n_rows}.ok")
    t0 = time.time()
    if not os.path.exists(marker):
        for f in os.listdir(root):
            if f.startswith("params_"):
                os.remove(os.path.join(root, f))
        n_groups = gen_table(path, n_rows)
        open(marker, "w").write(str(n_groups))
        print(f"generated {n_rows} rows / {n_groups} groups "
              f"in {time.time()-t0:.1f}s", flush=True)
    n_groups = int(open(marker).read())
    n_dup = n_groups * GROUP

    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ocrs_ray.ops.similarity import semdedup_survivors

    t1 = time.time()
    out = semdedup_survivors(
        root, nlist=nlist, eps=0.05, npart=min(16, max(2, num_cpus // 2))
    )
    kept = out.to_pandas()  # n_rows-bounded: (vec_id, cluster_id) only
    wall = time.time() - t1
    ray.shutdown()

    kept_ids = set(kept["vec_id"].to_numpy().tolist())
    # reconstruct ground truth: row i < n_dup belongs to group i//GROUP,
    # vec_id = perm[i] — regenerate the permutation deterministically
    rng = np.random.default_rng(7)
    perm = rng.permutation(n_rows).astype(np.int64)
    collapsed = sum(
        1
        for g in range(n_groups)
        if len(kept_ids & set(perm[g * GROUP : (g + 1) * GROUP].tolist())) == 1
    )
    uniques = perm[n_dup:]
    uniq_kept = sum(1 for v in uniques.tolist() if v in kept_ids)
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

    import json

    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "num_cpus": num_cpus,
                "nlist": nlist,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n_rows / wall, 1),
                "n_survivors": len(kept_ids),
                "planted_groups": n_groups,
                "groups_collapsed_to_one": collapsed,
                "collapse_rate": round(collapsed / n_groups, 4),
                "uniques_kept": uniq_kept,
                "unique_keep_rate": round(uniq_kept / len(uniques), 4),
                "driver_peak_rss_mb": rss_mb,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
