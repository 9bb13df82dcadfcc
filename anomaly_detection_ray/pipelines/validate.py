"""The flagship constraint-validation suite over the clips table.

Pipeline shape (all stages stream; the wide ``bytes`` column never crosses
a shuffle — it dies inside the decode actor stage):

    read_parquet(clips, pruned columns)
      → map_batches: derive partition_id = hash(clip_id) % P   (lineage key)
      → [resume] drop finished partitions at the read
      → map_batches(DecodeStats, actor pool, small batches)    (bytes → facts)
      → fork via materialized narrow facts (or checkpoint parquet):
           · per-(partition, column) partial sketches → tiny groupby merge
           · violation-row filters (decode errors, dur/sr/codec mismatches,
             null transcripts)
      + uniqueness on clip_id        (groupby count>1 — A6 pattern)
      + referential clips↔transcripts (bloom pre-pass + exact anti-join)
      + drift vs baseline snapshot    (KS / chi-square over sketches)
      → verdict rows (logging-table analogue) + violation rows, sorted by
        the reference's status-first ordering (O1/O2,
        freshness_utils.py:85-118, common_utils.py:35-91)

Per-partition failures become error-coded Unknown verdicts, never job
failures (reference error funnel, errors.py:33-42).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from anomaly_detection_ray.config import SuiteConfig
from anomaly_detection_ray.functions.hashing import bucket_of
from anomaly_detection_ray.functions.verdicts import (
    HEALTHY,
    HEALTH_STATUS_ORDER,
    UNHEALTHY,
    UNKNOWN,
    status_rank,
)
from anomaly_detection_ray.schema import CLIPS_SCHEMA, VERDICT_SCHEMA, VIOLATION_SCHEMA
from anomaly_detection_ray.sources.readers import read_table
from anomaly_detection_ray.stages.decode import decode_stage
from anomaly_detection_ray.stages.dedup import duplicate_key_counts
from anomaly_detection_ray.stages.drift import drift_verdicts
from anomaly_detection_ray.stages.join import referential_orphans
from anomaly_detection_ray.stages.stats import column_stats
from anomaly_detection_ray.state.checkpoint import RunCheckpoint, lineage_id, pending_partition_filter

PARTITION_COL = "partition_id"

_NUMERIC_STAT_COLS = ["sr_hz", "dur_ms", "decoded_ms", "rms", "peak", "clip_ratio"]
_ALL_STAT_COLS = _NUMERIC_STAT_COLS + ["codec", "transcript", "clip_id"]


@dataclass
class ValidationResult:
    verdicts: pd.DataFrame
    violations: pd.DataFrame
    stats: pd.DataFrame

    def verdict_table(self) -> pa.Table:
        return _verdicts_to_arrow(self.verdicts)

    def violation_table(self) -> pa.Table:
        cols = ["clip_id", "partition_id", "check", "detail"]
        return pa.Table.from_pandas(self.violations[cols], schema=VIOLATION_SCHEMA,
                                    preserve_index=False)


def _partition_name(idx: np.ndarray) -> np.ndarray:
    return np.char.add("p", np.char.zfill(idx.astype(str), 4))


def add_partition_id(num_partitions: int):
    def f(batch: pa.Table) -> pa.Table:
        idx = bucket_of(batch["clip_id"], num_partitions)
        return batch.append_column(PARTITION_COL, pa.array(_partition_name(idx)))

    return f


def partition_of_ids(ids, num_partitions: int) -> np.ndarray:
    return _partition_name(bucket_of(ids, num_partitions))


def validate_clips(
    clips_path: str,
    transcripts_path: Optional[str] = None,
    *,
    config: Optional[SuiteConfig] = None,
    baseline_stats: Optional[pd.DataFrame] = None,
    eval_ts: Optional[float] = None,
    checkpoint: Optional[RunCheckpoint] = None,
) -> ValidationResult:
    cfg = config or SuiteConfig.from_env()
    eval_ts = eval_ts if eval_ts is not None else 1_754_000_000.0
    evaluated_at = _dt.datetime.utcfromtimestamp(eval_ts)

    ds = read_table(clips_path)
    schema_ok, schema_detail = _check_schema(ds.schema())

    ds = ds.map_batches(add_partition_id(cfg.num_partitions), batch_format="pyarrow")
    if checkpoint is not None and checkpoint.completed:
        ds = ds.map_batches(pending_partition_filter(checkpoint.completed),
                            batch_format="pyarrow")

    # ---- decode actor pool: bytes → narrow facts, materialized once ------
    decoded = decode_stage(
        ds,
        batch_size=cfg.decode_batch_size,
        concurrency=cfg.decode_concurrency,
    ).materialize()
    # (at 10^12 rows: write facts to checkpoint parquet instead of
    # materialize() and re-read — same fork, spill-backed; see checkpoint.py)

    # ---- per-(partition, column) stats + sketches ------------------------
    stats_df = column_stats(
        decoded,
        _ALL_STAT_COLS,
        partition_col=PARTITION_COL,
        with_sketches=True,
        batch_size=cfg.stats_batch_size,
    ).to_pandas()

    if stats_df.empty:
        # fully-resumed run: every partition already checkpointed
        empty_v = pd.DataFrame(columns=["evaluated_at", "dataset", PARTITION_COL,
                                        "quality_check_type", "status",
                                        "downstream_impact", "additional_debug_info",
                                        "error_message", "lineage_id"])
        empty_vi = pd.DataFrame(columns=["clip_id", PARTITION_COL, "check", "detail"])
        return ValidationResult(empty_v, empty_vi, stats_df)

    verdict_rows: list[dict] = []
    violation_frames: list[pd.DataFrame] = []
    partitions = sorted(stats_df[PARTITION_COL].unique())

    # ---- schema check (dataset-level) ------------------------------------
    verdict_rows.append(
        _verdict("__all__", "schema", HEALTHY if schema_ok else UNHEALTHY,
                 {"schema": {"detail": schema_detail}}))

    # ---- null-rate / completeness check ----------------------------------
    if "null_rate" in cfg.checks:
        tr = stats_df[stats_df["column"] == "transcript"]
        for _, r in tr.iterrows():
            rate = float(r["null_rate"])
            st = HEALTHY if rate <= cfg.null_rate_threshold else UNHEALTHY
            verdict_rows.append(_verdict(
                r[PARTITION_COL], "null_rate", st,
                {"null_rate": {"column": "transcript",
                               "null_count": str(int(r["nulls"])),
                               "row_count": str(int(r["count"])),
                               "null_rate": str(round(rate, 6)),
                               "threshold": str(cfg.null_rate_threshold)}}))
        import pyarrow.compute as pc

        nulls = decoded.map_batches(
            lambda b: b.filter(pc.is_null(b["transcript"])),
            batch_format="pyarrow",
        ).select_columns(["clip_id", PARTITION_COL]).to_pandas()
        if len(nulls):
            violation_frames.append(nulls.assign(check="null_rate",
                                                 detail="transcript is null"))

    # ---- column-stats (informational) ------------------------------------
    if "column_stats" in cfg.checks:
        for pid, g in stats_df.groupby(PARTITION_COL):
            dbg = {}
            for _, r in g.iterrows():
                dbg[str(r["column"])] = {
                    "count": str(int(r["count"])),
                    "nulls": str(int(r["nulls"])),
                    "min": str(r["min"]),
                    "max": str(r["max"]),
                    "mean": str(r["mean"]),
                    "stddev": str(r["stddev"]),
                    "distinct_est": str(r["distinct_est"]),
                }
            verdict_rows.append(_verdict(pid, "column_stats", HEALTHY, dbg))

    # ---- audio decode / consistency --------------------------------------
    if "audio_decode" in cfg.checks:
        import pyarrow.compute as pc

        def _bad_rows(b: pa.Table) -> pa.Table:
            ok = pc.and_(pc.and_(b["decode_ok"], b["sr_match"]),
                         pc.and_(b["codec_match"], b["dur_match"]))
            return b.filter(pc.invert(ok))

        bad = decoded.map_batches(_bad_rows, batch_format="pyarrow").select_columns(
            ["clip_id", PARTITION_COL, "decode_ok", "decode_error",
             "sr_match", "codec_match", "dur_match", "decoded_ms", "dur_ms"]
        ).to_pandas()
        per_part_bad = bad.groupby(PARTITION_COL).size() if len(bad) else pd.Series(dtype=int)
        counts = stats_df[stats_df["column"] == "clip_id"].set_index(PARTITION_COL)["count"]
        for pid in partitions:
            nbad = int(per_part_bad.get(pid, 0))
            st = HEALTHY if nbad == 0 else UNHEALTHY
            verdict_rows.append(_verdict(
                pid, "audio_decode", st,
                {"audio_decode": {"violations": str(nbad),
                                  "row_count": str(int(counts.get(pid, 0)))}}))
        if len(bad):
            def _detail(r):
                if not r["decode_ok"]:
                    return f"decode failed: {r['decode_error']}"
                parts = []
                if not r["sr_match"]:
                    parts.append("sr_hz mismatch")
                if not r["codec_match"]:
                    parts.append("codec mismatch")
                if not r["dur_match"]:
                    parts.append(f"dur_ms {r['dur_ms']} vs decoded {r['decoded_ms']}")
                return "; ".join(parts)

            violation_frames.append(
                bad.assign(check="audio_decode", detail=bad.apply(_detail, axis=1))[
                    ["clip_id", PARTITION_COL, "check", "detail"]])

    # ---- uniqueness on clip_id -------------------------------------------
    if "uniqueness" in cfg.checks:
        dups = duplicate_key_counts(
            decoded.select_columns(["clip_id"]), "clip_id").to_pandas()
        dup_parts: dict[str, int] = {}
        if len(dups):
            dups[PARTITION_COL] = partition_of_ids(dups["clip_id"].to_numpy(), cfg.num_partitions)
            dup_parts = dups.groupby(PARTITION_COL).size().to_dict()
            violation_frames.append(
                dups.assign(check="uniqueness",
                            detail="clip_id count=" + dups["cnt"].astype(str))[
                    ["clip_id", PARTITION_COL, "check", "detail"]])
        for pid in partitions:
            n = int(dup_parts.get(pid, 0))
            verdict_rows.append(_verdict(
                pid, "uniqueness", HEALTHY if n == 0 else UNHEALTHY,
                {"uniqueness": {"duplicate_keys": str(n), "key": "clip_id"}}))

    # ---- referential integrity clips ↔ transcripts -----------------------
    if "referential" in cfg.checks and transcripts_path is not None:
        tds = read_table(transcripts_path)
        clips_keys = read_table(clips_path, columns=["clip_id"])
        missing = referential_orphans(clips_keys, tds.select_columns(["clip_id"]),
                                      "clip_id").to_pandas()
        orphan_tr = referential_orphans(tds.select_columns(["clip_id"]), clips_keys,
                                        "clip_id").to_pandas()
        ref_parts: dict[str, int] = {}
        for df, detail in ((missing, "clip has no transcript row"),
                           (orphan_tr, "transcript row has no clip")):
            if len(df):
                df = df.copy()
                df[PARTITION_COL] = partition_of_ids(df["clip_id"].to_numpy(),
                                                     cfg.num_partitions)
                for p, c in df.groupby(PARTITION_COL).size().items():
                    ref_parts[p] = ref_parts.get(p, 0) + int(c)
                violation_frames.append(df.assign(check="referential", detail=detail)[
                    ["clip_id", PARTITION_COL, "check", "detail"]])
        for pid in partitions:
            n = int(ref_parts.get(pid, 0))
            verdict_rows.append(_verdict(
                pid, "referential", HEALTHY if n == 0 else UNHEALTHY,
                {"referential": {"orphans": str(n)}}))

    # ---- drift vs baseline snapshot --------------------------------------
    if "drift" in cfg.checks and baseline_stats is not None:
        dcols = list(cfg.drift_columns)
        dv = drift_verdicts(stats_df[stats_df["column"].isin(dcols)],
                            baseline_stats[baseline_stats["column"].isin(dcols)],
                            ks_threshold=cfg.drift_ks_threshold,
                            chi2_pvalue=cfg.drift_chi2_pvalue)
        for pid, g in dv.groupby(PARTITION_COL):
            bad_cols = g[g["status"] == UNHEALTHY]
            st = (UNHEALTHY if len(bad_cols) else
                  HEALTHY if (g["status"] == HEALTHY).any() else UNKNOWN)
            dbg = {str(r["column"]): {
                "ks_stat": str(r["ks_stat"]),
                "chi2_pvalue": str(r["chi2_pvalue"]),
                "detail": str(r["detail"]),
            } for _, r in g.iterrows()}
            verdict_rows.append(_verdict(pid, "drift", st, dbg))

    # ---- assemble + reference ordering -----------------------------------
    verdicts = pd.DataFrame(verdict_rows)
    verdicts["evaluated_at"] = evaluated_at
    verdicts["dataset"] = cfg.dataset
    verdicts["lineage_id"] = [
        lineage_id(cfg.dataset, p, eval_ts) for p in verdicts[PARTITION_COL]
    ]
    verdicts["__rank__"] = [status_rank(s, HEALTH_STATUS_ORDER) for s in verdicts["status"]]
    verdicts = (verdicts
                .sort_values(["__rank__", "quality_check_type", PARTITION_COL])
                .drop(columns="__rank__")
                .reset_index(drop=True))

    if violation_frames:
        violations = pd.concat(violation_frames, ignore_index=True)[
            ["clip_id", PARTITION_COL, "check", "detail"]]
        violations = violations.sort_values(["check", PARTITION_COL, "clip_id"]).reset_index(drop=True)
    else:
        violations = pd.DataFrame(columns=["clip_id", PARTITION_COL, "check", "detail"])

    # ---- checkpoint per partition ----------------------------------------
    if checkpoint is not None:
        for pid in partitions:
            vt = _verdicts_to_arrow(verdicts[verdicts[PARTITION_COL] == pid])
            vio = violations[violations[PARTITION_COL] == pid]
            checkpoint.write_partition(
                pid, vt,
                pa.Table.from_pandas(vio, schema=VIOLATION_SCHEMA, preserve_index=False))

    return ValidationResult(verdicts, violations, stats_df.drop(
        columns=[c for c in ("hll", "tdigest", "freq") if c in stats_df]))


def _check_schema(schema) -> tuple[bool, str]:
    # ray.data.Schema exposes .names/.types; pyarrow.Schema works too
    types = dict(zip(schema.names, getattr(schema, "types", None) or [schema.field(n).type for n in schema.names]))
    missing = [f.name for f in CLIPS_SCHEMA if f.name not in types]
    wrong = [
        f"{f.name}:{types[f.name]}!={f.type}"
        for f in CLIPS_SCHEMA
        if f.name in types and types[f.name] != f.type
    ]
    if not missing and not wrong:
        return True, "ok"
    return False, f"missing={missing} wrong={wrong}"


def _verdict(pid: str, check: str, status: str, debug: dict,
             error: Optional[str] = None) -> dict:
    return {
        PARTITION_COL: pid,
        "quality_check_type": check,
        "status": status,
        "additional_debug_info": debug,
        "error_message": error,
        "downstream_impact": {
            "impact_level": 1 if status == UNHEALTHY else 4,
            "num_downstream_tables": 0,
            "num_queries_on_affected_tables": 0,
        },
    }


def _verdicts_to_arrow(df: pd.DataFrame) -> pa.Table:
    cols = {
        "evaluated_at": pa.array(df["evaluated_at"], pa.timestamp("us")),
        "dataset": pa.array(df["dataset"], pa.string()),
        "partition_id": pa.array(df[PARTITION_COL], pa.string()),
        "quality_check_type": pa.array(df["quality_check_type"], pa.string()),
        "status": pa.array(df["status"], pa.string()),
        "downstream_impact": pa.array(df["downstream_impact"].tolist(),
                                      VERDICT_SCHEMA.field("downstream_impact").type),
        "additional_debug_info": pa.array(
            [[(k, list(v.items())) for k, v in d.items()] for d in df["additional_debug_info"]],
            VERDICT_SCHEMA.field("additional_debug_info").type),
        "error_message": pa.array(df["error_message"], pa.string()),
        "lineage_id": pa.array(df["lineage_id"], pa.string()),
    }
    return pa.table(cols, schema=VERDICT_SCHEMA)
