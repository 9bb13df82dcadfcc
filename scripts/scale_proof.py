"""10x-scale proof run (VERDICT r2 next-round #2): validate the O(bundles)
shuffle claims by running the suite and the near-dup/ANN family at 10x the
bench row count and recording wall-time, shuffle volume and max worker RSS.

Method
------
- Suite pair: 600k vs 6M clips, BOTH generated at ``dur_scale=0.25`` so
  the comparison isolates ROW scaling at identical per-row payload bytes
  (a full-size 6M table is ~140 GB and does not fit the sandbox disk; the
  payload-heavy regime is already measured at 600k full-size in
  BASELINE.md §3).  Recorded per run: wall, rows/s, partials rows+bytes
  (the suite's only shuffle), key-bucket reducer cardinalities, max
  single-worker RSS and max total worker RSS.
- Near-dup/ANN pair: synthetic documents/embeddings dirs at 1x (5k docs /
  2k vecs — the sf0.1 driver-table scale) and 10x (50k / 20k), same
  generator, for minhash_near_dups, simhash_near_dups and the LSH
  knn_label_counts.

Usage:  python scripts/scale_proof.py [--skip-suite] [--skip-docs]
Writes scale_proof.json next to this script's repo root.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class WorkerRssMonitor:
    """Polls /proc for ray worker processes; tracks peak single-process RSS
    and peak summed RSS across workers."""

    def __init__(self, interval: float = 2.0):
        self.interval = interval
        self.max_single = 0
        self.max_total = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _sample(self):
        total = 0
        single = 0
        for sd in glob.glob("/proc/[0-9]*"):
            try:
                with open(os.path.join(sd, "cmdline"), "rb") as f:
                    cmd = f.read()
                if b"ray::" not in cmd and b"default_worker.py" not in cmd:
                    continue
                with open(os.path.join(sd, "statm")) as f:
                    rss_pages = int(f.read().split()[1])
                rss = rss_pages * 4096
                total += rss
                single = max(single, rss)
            except (OSError, IndexError, ValueError):
                continue
        self.max_single = max(self.max_single, single)
        self.max_total = max(self.max_total, total)

    def _run(self):
        while not self._stop.is_set():
            self._sample()
            self._stop.wait(self.interval)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join(timeout=5)
        self._sample()


class DriverRssMonitor:
    """Polls THIS process's RSS (/proc/self/statm): the collapse phase
    must show a FLAT driver footprint between 1x and 10x (VERDICT r3
    task 6) — peak-minus-baseline during the phase is the evidence."""

    def __init__(self, interval: float = 0.2):
        self.interval = interval
        self.baseline = 0
        self.peak = 0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _rss() -> int:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * 4096

    def _run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, self._rss())
            self._stop.wait(self.interval)

    def __enter__(self):
        self.baseline = self._rss()
        self.peak = self.baseline
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join(timeout=5)
        self.peak = max(self.peak, self._rss())

    @property
    def delta_mb(self) -> float:
        return round(_mb(self.peak - self.baseline), 0)

    @property
    def peak_mb(self) -> float:
        return round(_mb(self.peak), 0)


def run_suite(n_rows: int, dur_scale: float) -> dict:
    from anomaly_detection_ray.config import SuiteConfig
    from anomaly_detection_ray.pipelines.validate import validate_clips
    from anomaly_detection_ray.sources.synth import clips_path, transcripts_path

    t0 = time.perf_counter()
    cpath = clips_path(n_rows, dur_scale=dur_scale)
    tpath = transcripts_path(n_rows)
    gen_s = time.perf_counter() - t0

    cfg = SuiteConfig(num_partitions=32)
    obs: dict = {}
    with WorkerRssMonitor() as mon:
        t0 = time.perf_counter()
        res = validate_clips(cpath, tpath, config=cfg, observe=obs)
        wall = time.perf_counter() - t0
    bd = res.key_bucket_distincts or []
    return {
        "rows": n_rows,
        "dur_scale": dur_scale,
        "gen_s": round(gen_s, 1),
        "wall_s": round(wall, 1),
        "rows_per_s": round(n_rows / wall, 0),
        "partials_rows": obs.get("partials_rows"),
        "partials_bytes": obs.get("partials_bytes"),
        "key_buckets": len(bd),
        "key_bucket_distinct_max": max(bd) if bd else None,
        "key_bucket_distinct_total": sum(bd) if bd else None,
        "n_verdicts": len(res.verdicts),
        "n_violations": len(res.violations),
        "max_worker_rss_mb": round(_mb(mon.max_single), 0),
        "max_total_worker_rss_mb": round(_mb(mon.max_total), 0),
    }


def run_docs(n_docs: int, n_vecs: int) -> dict:
    from anomaly_detection_ray.pipelines.textops import (
        minhash_near_dups,
        simhash_near_dups,
        winnow_near_dups,
    )
    from anomaly_detection_ray.pipelines.vectors import (
        embedding_near_dups,
        knn_label_counts,
    )
    from anomaly_detection_ray.sources.synth import docs_scale_dir

    d = docs_scale_dir(n_docs, n_vecs)
    out: dict = {"n_docs": n_docs, "n_vecs": n_vecs}
    with WorkerRssMonitor() as mon:
        # winnow + embedding are the r5-fixed candidate generators (chain
        # overflow / banded hyperplane LSH): their walls and row counts
        # scaling sanely 1x->10x is the bounded-bucket-overflow evidence
        for name, fn in (("minhash_near_dups", minhash_near_dups),
                         ("simhash_near_dups", simhash_near_dups),
                         ("winnow_near_dups", winnow_near_dups),
                         # dedup-grade threshold: the corpus-calibrated
                         # default (0.45) measures search, not dedup
                         ("embedding_near_dups",
                          lambda d: embedding_near_dups(d, threshold=0.95)),
                         ("knn_label_counts", knn_label_counts)):
            t0 = time.perf_counter()
            r = fn(d)
            out[name] = {"wall_s": round(time.perf_counter() - t0, 1),
                         "rows": int(len(r))}
    out["max_worker_rss_mb"] = round(_mb(mon.max_single), 0)
    # near-dup pipeline, instrumented per phase: candidate+verify first
    # (its own driver RSS — the gather/score path is the component under
    # the broadcast-vs-join threshold), then the COLLAPSE alone
    # (star-contraction components + loser filter): driver RSS during
    # the collapse must stay flat between 1x and 10x (VERDICT r3 task 6)
    from anomaly_detection_ray.pipelines.textops import ngram_jaccard_dups
    from anomaly_detection_ray.sources.readers import read_table
    from anomaly_detection_ray.stages.dedup import collapse_near_dups

    with DriverRssMonitor() as pmon:
        t0 = time.perf_counter()
        pairs = ngram_jaccard_dups(d)
    out["ngram_jaccard_pairs"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "rows": int(len(pairs)),
        "driver_rss_delta_mb": pmon.delta_mb,
        "driver_rss_peak_mb": pmon.peak_mb,
    }
    ids = read_table(os.path.join(d, "documents.parquet"),
                     columns=["doc_id"])
    with DriverRssMonitor() as dmon:
        t0 = time.perf_counter()
        kept = collapse_near_dups(ids, "doc_id", pairs)
        n_kept = int(kept.count())
    out["near_dup_collapse"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "kept_rows": n_kept,
        "driver_rss_delta_mb": dmon.delta_mb,
        "driver_rss_peak_mb": dmon.peak_mb,
    }
    return out


def run_audio(n_clips: int) -> dict:
    from anomaly_detection_ray.pipelines.audioops import audio_fingerprint_pairs
    from anomaly_detection_ray.sources.readers import read_table
    from anomaly_detection_ray.sources.synth import clips_dups_path

    p = clips_dups_path(n_clips)
    out: dict = {"n_clips": n_clips}
    with WorkerRssMonitor() as mon, DriverRssMonitor() as pmon:
        t0 = time.perf_counter()
        pairs = audio_fingerprint_pairs(
            read_table(p, columns=["clip_id", "bytes"])).materialize()
        out["audio_dup_pairs"] = {"wall_s": round(time.perf_counter() - t0, 1),
                                  "rows": int(pairs.count()),
                                  "driver_rss_delta_mb": None,
                                  "driver_rss_peak_mb": None}
    out["audio_dup_pairs"]["driver_rss_delta_mb"] = pmon.delta_mb
    out["audio_dup_pairs"]["driver_rss_peak_mb"] = pmon.peak_mb
    out["max_worker_rss_mb"] = round(_mb(mon.max_single), 0)
    # collapse phase on the already-materialized pair Dataset: driver RSS
    # must stay flat between 1x and 10x (pairs never land on the driver)
    from anomaly_detection_ray.stages.dedup import collapse_near_dups

    ids = read_table(p, columns=["clip_id"])
    with DriverRssMonitor() as dmon:
        t0 = time.perf_counter()
        kept = collapse_near_dups(ids, "clip_id", pairs)
        n_kept = int(kept.count())
    out["audio_dedup_collapse"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "kept_rows": n_kept,
        "driver_rss_delta_mb": dmon.delta_mb,
        "driver_rss_peak_mb": dmon.peak_mb,
    }
    return out


def _mb(b: float) -> float:
    return b / (1024 * 1024)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-suite", action="store_true")
    ap.add_argument("--skip-docs", action="store_true")
    ap.add_argument("--skip-audio", action="store_true")
    ap.add_argument("--small-only", action="store_true",
                    help="run only the 1x control runs (smoke)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")

    result: dict = {"num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", "32"))}
    if not args.skip_suite:
        result["suite_1x"] = run_suite(600_000, dur_scale=0.25)
        print(json.dumps({"suite_1x": result["suite_1x"]}), flush=True)
        if not args.small_only:
            result["suite_10x"] = run_suite(6_000_000, dur_scale=0.25)
            print(json.dumps({"suite_10x": result["suite_10x"]}), flush=True)
    if not args.skip_docs:
        result["docs_1x"] = run_docs(5_000, 2_000)
        print(json.dumps({"docs_1x": result["docs_1x"]}), flush=True)
        if not args.small_only:
            result["docs_10x"] = run_docs(50_000, 20_000)
            print(json.dumps({"docs_10x": result["docs_10x"]}), flush=True)
    if not args.skip_audio:
        result["audio_1x"] = run_audio(6_000)
        print(json.dumps({"audio_1x": result["audio_1x"]}), flush=True)
        if not args.small_only:
            result["audio_10x"] = run_audio(60_000)
            print(json.dumps({"audio_10x": result["audio_10x"]}), flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(root, "scale_proof.json")
    if os.path.exists(out_path):  # partial reruns keep the other phases
        with open(out_path) as f:
            prev = json.load(f)
        result = prev | result
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
