"""Cluster-wide metrics counters (SURVEY.md §2.5 G6).

The reference prints per-run counts at the end of a CLI invocation
(/root/reference/ocrs-cli/src/main.rs:486-494). The distributed
equivalent is a named zero-CPU counter actor: pipeline actors flush
their per-batch deltas fire-and-forget; the driver snapshots around a
shard to produce per-partition lineage numbers.
"""

from __future__ import annotations

import ray

DEFAULT_METRICS_NAME = "ocrs_ray_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    """Additive counters keyed by name. Zero CPU so it never competes
    with pipeline stages for scheduling."""

    def __init__(self):
        self._counters: dict[str, int] = {}

    def add(self, deltas: dict[str, int]) -> None:
        for k, v in deltas.items():
            self._counters[k] = self._counters.get(k, 0) + int(v)

    def snapshot(self) -> dict[str, int]:
        return dict(self._counters)

    def reset(self) -> None:
        self._counters.clear()


def get_metrics_actor(name: str = DEFAULT_METRICS_NAME):
    """Get-or-create the named metrics actor (idempotent across
    processes in the same Ray cluster)."""
    return MetricsActor.options(name=name, get_if_exists=True).remote()


def metrics_snapshot(name: str = DEFAULT_METRICS_NAME) -> dict[str, int]:
    try:
        actor = ray.get_actor(name)
    except ValueError:
        return {}
    return ray.get(actor.snapshot.remote())
