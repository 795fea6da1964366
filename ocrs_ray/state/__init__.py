"""Execution state: metrics counters, checkpoint manifest, resumable runs."""

from .metrics import MetricsActor, get_metrics_actor, metrics_snapshot
from .checkpoint import (
    Manifest,
    ShardPlan,
    compact_job_output,
    plan_shards,
    run_ocr_job,
)

__all__ = [
    "MetricsActor",
    "get_metrics_actor",
    "metrics_snapshot",
    "Manifest",
    "ShardPlan",
    "compact_job_output",
    "plan_shards",
    "run_ocr_job",
]
