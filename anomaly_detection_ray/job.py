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
    from anomaly_detection_ray.context import current_or_default
    from anomaly_detection_ray.pipelines.validate import validate_clips
    from anomaly_detection_ray.state.checkpoint import RunCheckpoint

    # execution-environment abstraction (§2.11, reference context.py):
    # paths, parallelism and metric sinks route through the active
    # context — a deployment swaps RuntimeContext.current, not this code
    ctx = current_or_default()
    args.clips = ctx.resolve_path(args.clips)
    if args.transcripts:
        args.transcripts = ctx.resolve_path(args.transcripts)
    if args.out:
        args.out = ctx.resolve_path(args.out)
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
        # K3: batched health-check emission to the context's sink (a
        # JSONL file locally; a deployment's context swaps the endpoint)
        metrics["health_check_emission"] = emit_health_checks(
            entries, ctx.metrics_sink(args.out))
        # K4: one quality-overview dashboard per output root, create-once
        from anomaly_detection_ray.visualization import create_dashboard_if_not_exists

        metrics["dashboard"] = create_dashboard_if_not_exists(args.out, res.verdicts)
    return metrics


def build_job_spec(args) -> dict:
    """Serialize one scheduled-validation job to a JSON-compatible spec —
    the reference's job-creation payload re-expressed for `ray job submit`
    (reference detection.py:62-151: configs serialized with a
    ``metric_type`` class marker, a periodic trigger, zero retries, then
    ``run_now``).  The spec is self-contained: ``job.py run --spec`` (the
    entrypoint it names) reconstructs the configs and arguments from it."""
    from anomaly_detection_ray.config import ForecastConfig, SuiteConfig

    cfg = build_config(args.config)
    fcfg = ForecastConfig.from_env()
    configs = []
    for c in (cfg, fcfg):
        d = c.to_dict()
        d["metric_type"] = type(c).__name__  # decode marker (detection.py:101)
        configs.append(d)
    return {
        "name": f"[quality anomaly detection] on dataset {cfg.dataset}",
        "entrypoint": ("python -m anomaly_detection_ray.job run "
                       "--spec <this file>"),
        "configs": configs,
        "args": {
            "clips": args.clips,
            "transcripts": args.transcripts,
            "baseline": args.baseline,
            "out": args.out,
            "eval_ts": args.eval_ts,
        },
        "schedule": {"interval_hours": args.interval_hours,
                     "pause_status": "UNPAUSED"},
        "email_notifications": {"on_failure": list(args.notify or ())},
        "timeout_seconds": 0,
        "max_retries": 0,  # reference default: no retries (detection.py:129)
    }


def load_job_spec(path: str):
    """Round-trip decode of :func:`build_job_spec`'s output: returns
    ``(run_args_namespace, SuiteConfig, ForecastConfig)`` with each config
    reconstructed through its class's ``from_dict`` via the
    ``metric_type`` marker."""
    from anomaly_detection_ray.config import ForecastConfig, SuiteConfig

    with open(path) as f:
        spec = json.load(f)
    decoders = {"SuiteConfig": SuiteConfig.from_dict,
                "ForecastConfig": ForecastConfig.from_dict}
    cfg, fcfg = None, None
    for d in spec.get("configs", []):
        kind = d.get("metric_type")
        obj = decoders[kind]({k: v for k, v in d.items()
                              if k != "metric_type"})
        if kind == "SuiteConfig":
            cfg = obj
        else:
            fcfg = obj
    a = spec.get("args", {})
    ns = argparse.Namespace(
        clips=a.get("clips"), transcripts=a.get("transcripts"),
        baseline=a.get("baseline"), out=a.get("out"),
        eval_ts=a.get("eval_ts"), config=None)
    return ns, cfg or SuiteConfig(), fcfg or ForecastConfig()


def submit(args) -> dict:
    """Create (and optionally trigger) a validation job: write the spec
    JSON, then — standing in for ``ray job submit`` in this sandbox —
    launch the run entrypoint as a local subprocess when ``--run-now``.
    Returns ``{"job_spec": path, "triggered": bool, ...}``; with
    ``--run-now`` the child's metrics JSON is included under ``"run"``."""
    import subprocess
    import sys

    spec = build_job_spec(args)
    spec_path = args.spec_out or os.path.join(args.out or ".",
                                              "job_spec.json")
    os.makedirs(os.path.dirname(spec_path) or ".", exist_ok=True)
    with open(spec_path, "w") as f:
        json.dump(spec, f, indent=2)
    result = {"job_spec": spec_path, "name": spec["name"],
              "triggered": bool(args.run_now)}
    if args.run_now:
        proc = subprocess.run(
            [sys.executable, "-m", "anomaly_detection_ray.job",
             "run", "--spec", spec_path],
            capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"triggered run failed (exit {proc.returncode}): "
                f"{proc.stderr[-2000:]}")
        result["run"] = json.loads(proc.stdout.strip().splitlines()[-1])
    return result


def _add_run_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--clips", default=None, help="clips table path (parquet dir)")
    p.add_argument("--transcripts", default=None, help="transcripts table path")
    p.add_argument("--baseline", default=None,
                   help="baseline stats snapshot parquet (enables drift check)")
    p.add_argument("--out", default=None,
                   help="output/checkpoint root; rerun with same value to resume")
    p.add_argument("--config", default=None, help="SuiteConfig JSON file")
    p.add_argument("--eval-ts", type=float, default=None, dest="eval_ts")


def main(argv=None) -> None:
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    # legacy flat CLI (pre-subcommand): `job.py --clips ...` means `run`
    if not argv or argv[0] not in ("run", "submit"):
        argv = ["run"] + argv
    p = argparse.ArgumentParser(description="Clips validation suite jobs")
    sub = p.add_subparsers(dest="cmd", required=True)
    pr = sub.add_parser("run", help="run the validation suite once")
    _add_run_args(pr)
    pr.add_argument("--spec", default=None,
                    help="job spec JSON (from `submit`); overrides the "
                         "other arguments")
    ps = sub.add_parser(
        "submit",
        help="serialize configs to a job spec (and optionally trigger it)")
    _add_run_args(ps)
    ps.add_argument("--spec-out", default=None, dest="spec_out",
                    help="where to write the job spec JSON "
                         "(default: <out>/job_spec.json)")
    ps.add_argument("--interval-hours", type=int, default=6,
                    dest="interval_hours",
                    help="periodic trigger interval (reference default 6h)")
    ps.add_argument("--notify", action="append", default=None,
                    help="on-failure notification address (repeatable)")
    ps.add_argument("--run-now", action="store_true", dest="run_now",
                    help="trigger the job immediately in a local "
                         "subprocess (the sandbox stand-in for "
                         "`ray job submit`)")
    args = p.parse_args(argv)

    if args.cmd == "submit":
        print(json.dumps(submit(args)))
        return

    if args.spec:
        import tempfile

        spec_args, cfg, _fcfg = load_job_spec(args.spec)
        # the spec carries the SuiteConfig inline; hand it to run() as a
        # config file (no env mutation — tests call main() in-process)
        tf = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
        json.dump(cfg.to_dict(), tf)
        tf.close()
        spec_args.config = tf.name
        args = spec_args
    if not args.clips:
        p.error("run requires --clips (or a --spec that provides it)")

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
