"""Distribution-drift checks: KS over t-digests, chi-square over frequency
sketches, versus a baseline snapshot.

The reference's forecast-vs-bound pattern (F6/F13) re-targeted per the
north rule: the "trained model" is a **baseline snapshot** of merged
per-column sketches; the verdict rule keeps the reference shape — violate
iff the statistic exceeds its threshold (SURVEY.md §7 step 7).

The snapshot is small (sketch bytes per (partition, column)) and is
broadcast into the scoring stage via ``ray.put`` — loaded once per actor,
never re-shipped per batch (reference J1 broadcast-model pattern,
third_party/common.py:253-269).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from anomaly_detection_ray.functions.forecast import chi2_sf, ks_pvalue
from anomaly_detection_ray.functions.verdicts import HEALTHY, UNHEALTHY, UNKNOWN
from anomaly_detection_ray.stages.stats import column_stats
from anomaly_detection_ray.state.sketches import Sketch, chi_square, ks_statistic


def build_baseline_snapshot(
    ds: ray.data.Dataset,
    columns: Sequence[str],
    *,
    partition_col: Optional[str] = None,
    batch_size: int = 8192,
) -> pd.DataFrame:
    """Merged per-(partition, column) stats + sketches of the baseline data
    — the drift check's 'model'. Small: O(partitions × columns) rows."""
    return column_stats(
        ds, columns, partition_col=partition_col, with_sketches=True, batch_size=batch_size
    ).to_pandas()


def save_snapshot(df: pd.DataFrame, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def load_snapshot(path: str) -> pd.DataFrame:
    return pq.read_table(path).to_pandas()


def drift_verdicts(
    target_stats: pd.DataFrame,
    baseline_stats: pd.DataFrame,
    *,
    ks_threshold: float = 0.15,
    chi2_pvalue: float = 0.01,
) -> pd.DataFrame:
    """Per-(partition, column) drift verdicts.

    Numeric columns: two-sample KS from the merged t-digests, Unhealthy iff
    statistic > ks_threshold (a fixed-bound rule, the F8/F14 constant-
    threshold shape).  Categorical columns: Pearson chi-square from the
    frequency sketches, Unhealthy iff p < chi2_pvalue (the probabilistic
    bound shape of F6/F13).
    """
    base = baseline_stats.set_index(["partition_id", "column"])
    rows = []
    for _, t in target_stats.iterrows():
        key = (t["partition_id"], t["column"])
        row = {
            "partition_id": t["partition_id"],
            "column": t["column"],
            "ks_stat": None,
            "ks_pvalue": None,
            "chi2_stat": None,
            "chi2_pvalue": None,
            "status": UNKNOWN,
            "detail": "",
        }
        if key not in base.index:
            row["detail"] = "no baseline for column"
            rows.append(row)
            continue
        b = base.loc[key]
        statuses = []
        numeric = t.get("tdigest") is not None and b.get("tdigest") is not None
        if numeric:
            ks = ks_statistic(Sketch.from_bytes(t["tdigest"]), Sketch.from_bytes(b["tdigest"]))
            row["ks_stat"] = round(ks, 6)
            row["ks_pvalue"] = round(
                ks_pvalue(ks, t["count"] - t["nulls"], b["count"] - b["nulls"]), 6
            )
            statuses.append(ks <= ks_threshold)
            if ks > ks_threshold:
                row["detail"] = f"KS {ks:.4f} > {ks_threshold}"
        # chi-square only for genuinely categorical columns: numeric columns
        # are covered by KS (a frequency sketch over thousands of distinct
        # numeric values is noise, not signal)
        if not numeric and t.get("freq") is not None and b.get("freq") is not None:
            stat, dof = chi_square(Sketch.from_bytes(t["freq"]), Sketch.from_bytes(b["freq"]))
            p = chi2_sf(stat, dof) if dof > 0 else float("nan")
            row["chi2_stat"] = round(stat, 6) if stat == stat else None
            row["chi2_pvalue"] = round(p, 6) if p == p else None
            if p == p:
                statuses.append(p >= chi2_pvalue)
                if p < chi2_pvalue:
                    row["detail"] = (row["detail"] + "; " if row["detail"] else "") + (
                        f"chi2 p={p:.2g} < {chi2_pvalue}"
                    )
        if statuses:
            row["status"] = HEALTHY if all(statuses) else UNHEALTHY
        rows.append(row)
    return pd.DataFrame(rows)
