"""Benchmark harness.

Runs the headline clips validation suite plus representative operator
pipelines over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and
prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
     "clips": n, "clips_per_sec": ...}

``--scaling`` runs the same job twice in fresh processes (num_cpus=8 and
32) on the same input and reports both throughputs plus the scaling
efficiency (the sandbox proxy for the N vs 4N cluster-size criterion;
see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_of(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.1


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data.context import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from anomaly_detection_ray.config import SuiteConfig
    from anomaly_detection_ray.pipelines import relational, textops, vectors
    from anomaly_detection_ray.pipelines.validate import validate_clips
    from anomaly_detection_ray.sources.synth import clips_path, transcripts_path

    sf = _sf_of(sf_dir)
    n_clips = max(int(600_000 * sf), 500)

    # materialize synthetic clips (cached across runs; untimed) and warm
    # the page cache with one untimed read of the driver tables
    cp, tp = clips_path(n_clips), transcripts_path(n_clips)
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            with open(p, "rb") as f:
                while f.read(1 << 24):
                    pass

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # ---- headline: full constraint suite over the clips table ------------
    cfg = SuiteConfig(num_partitions=max(num_cpus, 8))
    res = timed("clips_suite", lambda: validate_clips(cp, tp, config=cfg))
    assert len(res.verdicts) > 0

    # ---- representative operator pipelines -------------------------------
    timed("q1_pricing_summary", lambda: relational.q1_pricing_summary(sf_dir))
    timed("hourly_window", lambda: relational.hourly_window(sf_dir))
    timed("revenue_by_orderstatus", lambda: relational.revenue_by_orderstatus(sf_dir))
    timed("latest_event_per_user", lambda: relational.latest_event_per_user(sf_dir))
    timed("distinct_counts", lambda: relational.distinct_counts(sf_dir))
    timed("token_counts_by_lang", lambda: textops.token_counts_by_lang(sf_dir))
    timed("doc_fingerprints", lambda: textops.doc_fingerprints(sf_dir))
    timed("embedding_topk", lambda: vectors.embedding_topk(sf_dir))
    timed("simhash_near_dups", lambda: textops.simhash_near_dups(sf_dir))

    total = round(sum(timings.values()), 3)
    return {
        "metric": "full constraint-suite + operator pipelines wall-time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "num_cpus": num_cpus,
        "clips": n_clips,
        "clips_per_sec": round(n_clips / timings["clips_suite"], 1),
    }


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo, r_hi = one(lo), one(hi)
    thr_lo = r_lo["clips"] / r_lo["queries"]["clips_suite"]
    thr_hi = r_hi["clips"] / r_hi["queries"]["clips_suite"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (clips suite)",
        f"sec_{lo}": r_lo["queries"]["clips_suite"],
        f"sec_{hi}": r_hi["queries"]["clips_suite"],
        f"clips_per_sec_{lo}": round(thr_lo, 1),
        f"clips_per_sec_{hi}": round(thr_hi, 1),
        f"total_sec_{lo}": r_lo["value"],
        f"total_sec_{hi}": r_hi["value"],
        "scaling_efficiency": round(eff, 3),
        "sf": r_lo["sf"],
        "clips": r_lo["clips"],
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
        return
    result = run_bench(sf_dir, num_cpus)
    import ray

    ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
