"""The flagship constraint-validation suite over the clips table.

Single-pass fused pipeline (row-level data NEVER materializes or
shuffles; the wide ``bytes`` column dies inside the decode map):

    read_parquet(clips)                                     ─┐ ONE streaming
      → map_batches: partition_id = hash(clip_id) % P        │ execution
      → [resume] drop finished partitions at the read        │
      → map_batches(decode+QC features+SuitePartials fused)  │ emits ONLY
    read_parquet(transcripts) → key-count partials  ── union ─┘ partial rows
      → materialize tiny partials  (O(bundles × partitions × columns))
      → ONE groupby((kind, partition, column, bucket)) dispatcher merge:
           · stats+sketch partials  → per-(partition, column) stats (A7)
           · key-count dict blobs   → dup keys + orphans both directions
                                      (uniqueness A6 + referential J4 in
                                      one exchange instead of three)
           · violation-row blobs    → violation table
      → driver: verdict rules (null-rate F13/F14, decode, drift KS/χ²)
      → verdict rows (logging-table analogue) + violation rows, sorted by
        the reference's status-first ordering (O1/O2,
        freshness_utils.py:85-118, common_utils.py:35-91)

Per-partition failures become error-coded Unknown verdicts, never job
failures (reference error funnel, errors.py:33-42).  See
stages/fused.py for the partial/combiner design and the measured Ray
costs that motivated it.
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
    SKIPPED,
    UNHEALTHY,
    UNKNOWN,
    status_rank,
)
from anomaly_detection_ray.schema import CLIPS_SCHEMA, VERDICT_SCHEMA, VIOLATION_SCHEMA
from anomaly_detection_ray.sources.readers import read_table
from anomaly_detection_ray.config import DUR_MS_TOLERANCE
from anomaly_detection_ray.stages.decode import DecodeStats
from anomaly_detection_ray.stages.drift import drift_verdicts
from anomaly_detection_ray.stages.fused import (
    VIOL_EXAMPLES_MERGE_CAP,
    SuitePartials,
    collect_suite_partials,
    side_key_partials,
)
from anomaly_detection_ray.state.checkpoint import RunCheckpoint, lineage_id, pending_partition_filter

PARTITION_COL = "partition_id"

_NUMERIC_STAT_COLS = ["sr_hz", "dur_ms", "decoded_ms", "rms", "peak", "clip_ratio"]
_ALL_STAT_COLS = _NUMERIC_STAT_COLS + ["codec", "transcript", "clip_id"]


@dataclass
class ValidationResult:
    verdicts: pd.DataFrame
    violations: pd.DataFrame
    stats: pd.DataFrame
    #: key-exchange observability: per-bucket reducer-dict cardinalities
    #: (see SuiteConfig.key_num_buckets sizing rule); None when the run
    #: carried no key checks
    key_bucket_distincts: list | None = None

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
    lineage: Optional[dict] = None,
    popularity: Optional[dict] = None,
    observe: Optional[dict] = None,
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
    if cfg.partitions_to_skip:
        # user-configured skip (reference tables_to_skip): rows never enter
        # the pass; Skipped verdicts are emitted below
        ds = ds.map_batches(pending_partition_filter(set(cfg.partitions_to_skip)),
                            batch_format="pyarrow")

    # ---- single-pass fused suite -----------------------------------------
    # decode actors → SuitePartials in the SAME streaming execution: row
    # data never materializes; only mergeable partial rows (stats sketches,
    # hash-bucketed key counts, violation blobs) leave the pass.  The
    # transcripts side unions its key partials into the same stream, so
    # uniqueness + both referential directions + stats + violations cost
    # ONE execution and one tiny low-cardinality shuffle (stages/fused.py).
    need_unique = "uniqueness" in cfg.checks
    need_ref = "referential" in cfg.checks and transcripts_path is not None
    with_keys = need_unique or need_ref

    # resumed runs must count keys against the FULL clips table, not just
    # pending partitions — a transcript matching a completed partition's
    # clip is not an orphan.  Emit clip-key partials from a separate
    # full-table read in that (rare) case.
    fused_with_keys = with_keys and checkpoint is None
    from anomaly_detection_ray.checks import CheckContext, active_custom_checks

    custom_checks = active_custom_checks(cfg.checks)
    key_buckets = cfg.key_num_buckets or cfg.num_partitions
    suite_partials = SuitePartials(
        _ALL_STAT_COLS, PARTITION_COL, key_col="clip_id",
        num_buckets=key_buckets,
        with_keys=fused_with_keys, checks=cfg.checks,
        custom_checks=custom_checks,
        cps_bounds=(cfg.transcript_min_cps, cfg.transcript_max_cps),
        viol_examples_per_block=cfg.viol_examples_per_block)

    # decode + partials as ONE map operator at the decode batch size:
    # chaining them as separate map_batches with a larger partial batch
    # forces Ray's cross-block bundler to gather blocks from many upstream
    # tasks, which measured 3-4× slower than the whole decode itself.
    # Partial-row volume stays modest because decode batches are sized in
    # the thousands (rows/batch × partitions × columns).
    _decode_fn = DecodeStats(dur_tolerance_ms=DUR_MS_TOLERANCE)

    def decode_and_partials(batch: pa.Table) -> pa.Table:
        return suite_partials(_decode_fn(batch))

    partials = ds.map_batches(
        decode_and_partials,
        batch_format="pyarrow",
        batch_size=cfg.decode_batch_size,
    )
    if with_keys and not fused_with_keys:
        partials = partials.union(
            read_table(clips_path, columns=["clip_id"]).map_batches(
                side_key_partials("clip_id", 0, key_buckets),
                batch_format="pyarrow", batch_size=cfg.stats_batch_size))
    if need_ref:
        partials = partials.union(
            read_table(transcripts_path, columns=["clip_id"]).map_batches(
                side_key_partials("clip_id", 1, key_buckets),
                batch_format="pyarrow", batch_size=cfg.stats_batch_size))
    # pre-shuffle combine: ~50 bundles' partial rows fold into one row per
    # (partition, column) / (bucket, side) before the groupby-merge, so the
    # suite's one shuffle moves O(combiner-batches × groups) rows instead
    # of O(bundles × groups) (stages/fused.py:combine_partial_rows)
    from anomaly_detection_ray.stages.fused import combine_partial_rows

    partials = partials.map_batches(combine_partial_rows,
                                    batch_format="pyarrow", batch_size=8192)
    partials = partials.materialize()  # tiny: O(combiner batches × groups)
    if observe is not None:
        # scale-proof observability: the shuffle's actual row/byte volume
        # (stats/viol partials are O(bundles); keys are O(distinct ids))
        observe["partials_rows"] = int(partials.count())
        observe["partials_bytes"] = int(partials.size_bytes() or 0)

    stats_df, suspect_keys, row_violations, key_bucket_distincts, viol_counts = \
        collect_suite_partials(partials, with_keys=with_keys, with_ref=need_ref)

    def check_count(pid, check: str) -> int:
        """EXACT per-(partition, check) violation count — row_violations
        holds bounded examples only (VIOL_EXAMPLES_MERGE_CAP), so rules
        must never count its rows."""
        return int(viol_counts.get((pid, check), 0))

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

    # ---- user-configured skips (reference USER_CONFIGURED_SKIP) ----------
    if cfg.partitions_to_skip:
        from anomaly_detection_ray.errors import (
            ERROR_CODE_TO_MESSAGE,
            USER_CONFIGURED_SKIP,
        )

        for pid in sorted(cfg.partitions_to_skip):
            verdict_rows.append(_verdict(
                pid, "skip", SKIPPED,
                {"skip": {"error_code": USER_CONFIGURED_SKIP}},
                error=ERROR_CODE_TO_MESSAGE[USER_CONFIGURED_SKIP]))

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
        nulls = row_violations[row_violations["check"] == "null_rate"]
        if len(nulls):
            violation_frames.append(nulls)

    # ---- column-stats (informational) ------------------------------------
    if "column_stats" in cfg.checks:
        # 12 significant digits: below that is float-summation noise from
        # streaming bundle boundaries, which must not perturb the
        # (observable, golden-tested) stringified debug payload
        def _fmt(x) -> str:
            if x is None or (isinstance(x, float) and np.isnan(x)):
                return str(x)
            return f"{x:.12g}" if isinstance(x, float) else str(x)

        for pid, g in stats_df.groupby(PARTITION_COL):
            dbg = {}
            for _, r in g.iterrows():
                dbg[str(r["column"])] = {
                    "count": str(int(r["count"])),
                    "nulls": str(int(r["nulls"])),
                    "min": _fmt(r["min"]),
                    "max": _fmt(r["max"]),
                    "mean": _fmt(r["mean"]),
                    "stddev": _fmt(r["stddev"]),
                    "distinct_est": _fmt(r["distinct_est"]),
                }
            verdict_rows.append(_verdict(pid, "column_stats", HEALTHY, dbg))

    # ---- audio decode / consistency --------------------------------------
    if "audio_decode" in cfg.checks:
        bad = row_violations[row_violations["check"] == "audio_decode"]
        counts = stats_df[stats_df["column"] == "clip_id"].set_index(PARTITION_COL)["count"]
        for pid in partitions:
            nbad = check_count(pid, "audio_decode")
            st = HEALTHY if nbad == 0 else UNHEALTHY
            verdict_rows.append(_verdict(
                pid, "audio_decode", st,
                {"audio_decode": {"violations": str(nbad),
                                  "row_count": str(int(counts.get(pid, 0)))}}))
        if len(bad):
            violation_frames.append(bad)

    # ---- transcript/audio rate consistency --------------------------------
    if "transcript_rate" in cfg.checks:
        bad = row_violations[row_violations["check"] == "transcript_rate"]
        counts = stats_df[stats_df["column"] == "clip_id"].set_index(
            PARTITION_COL)["count"]
        for pid in partitions:
            nbad = check_count(pid, "transcript_rate")
            total = int(counts.get(pid, 0))
            frac = nbad / total if total else 0.0
            st = (HEALTHY if frac <= cfg.transcript_rate_threshold
                  else UNHEALTHY)
            verdict_rows.append(_verdict(
                pid, "transcript_rate", st,
                {"transcript_rate": {
                    "violations": str(nbad),
                    "row_count": str(total),
                    "violation_rate": str(round(frac, 6)),
                    "bounds_cps": f"[{cfg.transcript_min_cps}, "
                                  f"{cfg.transcript_max_cps}]",
                    "threshold": str(cfg.transcript_rate_threshold)}}))
        if len(bad):
            violation_frames.append(bad)

    # ---- uniqueness + referential, from the fused key partials -----------
    # (suspect_keys already holds ONLY dup/orphan keys — the single
    # bucketed shuffle in stages/fused.py replaced a dup-count groupby plus
    # two anti-joins; SURVEY.md §7.5 "pick ONE partitioning key")
    if need_unique or need_ref:
        bad_keys = suspect_keys.rename(columns={"key": "clip_id"})
        bad_keys[PARTITION_COL] = (
            partition_of_ids(bad_keys["clip_id"].to_numpy(), cfg.num_partitions)
            if len(bad_keys) else np.array([], dtype=object))

        if need_unique:
            dups = bad_keys[bad_keys["n_left"] > 1]
            dup_parts = dups.groupby(PARTITION_COL).size().to_dict() if len(dups) else {}
            if len(dups):
                # bounded EXAMPLES — the counts above stay exact; a fully-
                # duplicated table must not materialize O(keys) violation
                # rows on the driver (same storm rule as the fused checks)
                ex = dups.head(VIOL_EXAMPLES_MERGE_CAP)
                violation_frames.append(
                    ex.assign(check="uniqueness",
                              detail="clip_id count=" + ex["n_left"].astype(str))[
                        ["clip_id", PARTITION_COL, "check", "detail"]])
            for pid in partitions:
                n = int(dup_parts.get(pid, 0))
                verdict_rows.append(_verdict(
                    pid, "uniqueness", HEALTHY if n == 0 else UNHEALTHY,
                    {"uniqueness": {"duplicate_keys": str(n), "key": "clip_id"}}))

        if need_ref:
            ref_parts: dict[str, int] = {}
            # orphan counts stay one-per-ROW (the anti-join contract), but
            # counts come from a groupby-SUM and only a bounded example
            # prefix is row-expanded — a mis-joined table with millions of
            # orphans must not materialize them all on the driver
            miss = bad_keys[(bad_keys["n_left"] > 0) & (bad_keys["n_right"] == 0)]
            orph = bad_keys[bad_keys["n_left"] == 0]
            for df, reps, detail in (
                (miss, miss["n_left"] if len(miss) else None, "clip has no transcript row"),
                (orph, orph["n_right"] if len(orph) else None, "transcript row has no clip"),
            ):
                if len(df):
                    reps = reps.astype(int)
                    sums = df.assign(__n=reps).groupby(PARTITION_COL)["__n"].sum()
                    for p, c in sums.items():
                        ref_parts[p] = ref_parts.get(p, 0) + int(c)
                    k = int(np.searchsorted(reps.cumsum().to_numpy(),
                                            VIOL_EXAMPLES_MERGE_CAP) + 1)
                    sub = df.head(k)
                    rep = (sub.loc[sub.index.repeat(reps.head(k))]
                           .head(VIOL_EXAMPLES_MERGE_CAP))
                    violation_frames.append(rep.assign(check="referential", detail=detail)[
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

    # ---- registered Check plugins (§2.11, checks.py): driver-side verdict
    # hooks over the same merged stats/violations the built-ins consume ----
    if custom_checks:
        ctx = CheckContext(stats=stats_df, violations=row_violations,
                           partitions=partitions, config=cfg,
                           baseline=baseline_stats, viol_counts=viol_counts,
                           _verdict_fn=_verdict)
        for chk in custom_checks:
            try:
                verdict_rows.extend(chk.verdicts(ctx))
            except Exception as e:  # plugin failure → Unknown row, not a crash
                verdict_rows.append(_verdict(
                    "__all__", chk.name, UNKNOWN, {},
                    error=f"INTERNAL_ERROR: {e}"))
            chk_viol = row_violations[row_violations["check"] == chk.name]
            if len(chk_viol):
                violation_frames.append(chk_viol)

    # ---- blast radius on unhealthy partitions (reference F12 attaches it
    # only when the verdict is bad, freshness_utils.py:739-752) -----------
    if lineage is not None:
        from anomaly_detection_ray.functions.blast_radius import get_blast_radius

        br_cache: dict[str, dict] = {}
        for r in verdict_rows:
            if r["status"] == UNHEALTHY:
                pid = r[PARTITION_COL]
                try:
                    if pid not in br_cache:
                        br_cache[pid] = get_blast_radius(
                            pid, lineage, popularity or {}).as_struct()
                    r["downstream_impact"] = br_cache[pid]
                except Exception as e:
                    # keep the health status, surface the failure (reference
                    # BLAST_RADIUS_COMPUTATION_ERROR, freshness_utils.py:739-752)
                    from anomaly_detection_ray.errors import (
                        BLAST_RADIUS_COMPUTATION_ERROR,
                        ERROR_CODE_TO_MESSAGE,
                    )

                    r["error_message"] = (
                        f"{ERROR_CODE_TO_MESSAGE[BLAST_RADIUS_COMPUTATION_ERROR]}"
                        f": {e}")

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
            # stats WITH sketch bytes: the checkpoint's mergeable state
            # (lineage + stats metrics per the north rule)
            st = stats_df[stats_df[PARTITION_COL] == pid]
            checkpoint.write_partition(
                pid, vt,
                pa.Table.from_pandas(vio, schema=VIOLATION_SCHEMA, preserve_index=False),
                pa.Table.from_pandas(st, preserve_index=False))

    return ValidationResult(verdicts, violations, stats_df.drop(
        columns=[c for c in ("hll", "tdigest", "freq") if c in stats_df]),
        key_bucket_distincts=key_bucket_distincts or None)


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
