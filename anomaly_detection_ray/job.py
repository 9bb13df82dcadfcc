"""Job entry point: the `ray job submit` wrapper for a validation run.

Reference analogue: ``create_anomaly_detection_job`` /
``FreshnessChecker.create_job`` (reference detection.py:62-151,
freshness_checker.py:303-400) — there, a JSON-serialized config plus a
scheduled notebook task; here, a JSON/CLI config plus a plain module you
launch with

    ray job submit -- python -m anomaly_detection_ray.job \
        --clips /data/clips --transcripts /data/transcripts \
        --out /runs/2026-08-17 --config suite.json

On a fixed-size multi-node cluster the SAME command runs unchanged — Ray
Data schedules the stages across nodes; nothing here is single-node-aware.
The run is resumable: verdicts/violations land in a per-partition
checkpoint layout (state/checkpoint.py) and a rerun with the same --out
skips finished partitions.  A ``metrics.json`` run summary (status counts,
violation counts, wall time, throughput) is the K2 metrics-payload
analogue (reference metrics.py:9-45, utils/common_utils.py:522-546).

This module OWNS the Ray session (guarded init) — the library never calls
``ray.init()``.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_config(path: str | None):
    from anomaly_detection_ray.config import SuiteConfig

    if path:
        with open(path) as f:
            return SuiteConfig.from_dict(json.load(f))
    return SuiteConfig.from_env()


def run(args) -> dict:
    from anomaly_detection_ray.pipelines.validate import validate_clips
    from anomaly_detection_ray.state.checkpoint import RunCheckpoint

    cfg = build_config(args.config)
    eval_ts = args.eval_ts if args.eval_ts is not None else time.time()
    checkpoint = RunCheckpoint(args.out, cfg.dataset, eval_ts) if args.out else None
    already_done = len(checkpoint.completed) if checkpoint else 0

    baseline = None
    if args.baseline:
        import pandas as pd

        baseline = pd.read_parquet(args.baseline)

    t0 = time.perf_counter()
    res = validate_clips(
        args.clips,
        args.transcripts,
        config=cfg,
        baseline_stats=baseline,
        eval_ts=eval_ts,
        checkpoint=checkpoint,
    )
    wall = time.perf_counter() - t0

    n_rows = (int(res.stats.loc[res.stats["column"] == "clip_id", "count"].sum())
              if len(res.stats) else 0)
    status_counts = (res.verdicts.groupby("status").size().to_dict()
                     if len(res.verdicts) else {})
    check_counts = (res.violations.groupby("check").size().to_dict()
                    if len(res.violations) else {})
    from anomaly_detection_ray.metrics import (
        build_check_entries,
        emit_health_checks,
        file_sink,
    )

    entries = build_check_entries(res.verdicts, res.violations)
    metrics = {
        "dataset": cfg.dataset,
        "evaluated_at_epoch_s": int(eval_ts),  # epoch-seconds convention (M10)
        "wall_time_s": round(wall, 3),
        "rows_validated": n_rows,
        "rows_per_sec": round(n_rows / wall, 1) if wall > 0 else None,
        "partitions_skipped_resume": already_done,
        "verdict_status_counts": {str(k): int(v) for k, v in status_counts.items()},
        # key-exchange reducer sizing observability (SuiteConfig.key_num_buckets
        # sizing rule): raise the bucket count when max grows toward worker heap
        "key_bucket_distinct_keys": (
            {"num_buckets": len(res.key_bucket_distincts),
             "max": int(max(res.key_bucket_distincts)),
             "total": int(sum(res.key_bucket_distincts))}
            if res.key_bucket_distincts else None),
        "violation_counts_by_check": {str(k): int(v) for k, v in check_counts.items()},
        # K2 capped per-check entries (first-100 payloads, 500 ids, 500-char
        # errors — metrics.py cap semantics, reference freshness_checker.py)
        "check_entries": entries,
    }
    if args.out:
        with open(os.path.join(args.out, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2, default=str)
        # K3: batched health-check emission to the local JSONL sink
        metrics["health_check_emission"] = emit_health_checks(
            entries, file_sink(os.path.join(args.out, "health_checks.jsonl")))
        # K4: one quality-overview dashboard per output root, create-once
        from anomaly_detection_ray.visualization import create_dashboard_if_not_exists

        metrics["dashboard"] = create_dashboard_if_not_exists(args.out, res.verdicts)
    return metrics


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Run the clips validation suite")
    p.add_argument("--clips", required=True, help="clips table path (parquet dir)")
    p.add_argument("--transcripts", default=None, help="transcripts table path")
    p.add_argument("--baseline", default=None,
                   help="baseline stats snapshot parquet (enables drift check)")
    p.add_argument("--out", default=None,
                   help="output/checkpoint root; rerun with same value to resume")
    p.add_argument("--config", default=None, help="SuiteConfig JSON file")
    p.add_argument("--eval-ts", type=float, default=None, dest="eval_ts")
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:  # under `ray job submit` / tests the session exists
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True)
    try:
        print(json.dumps(run(args)))
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    main()
