"""Metrics payload caps (K2) and batched health-check emission (K3).

Reference-verbatim cap semantics:

- payload (commit-timestamp analogue) lists are included only for the
  first ``MAX_INFOS_WITH_PAYLOAD`` entries, counted in the
  violations-first display order (freshness_checker.py:48
  MAX_FRESHNESS_INFOS_WITH_COMMITS=100, :129-137 — "the freshness info is
  sorted with STALE first", so the capped tail is the healthy bulk);
- at most ``NUM_PAYLOAD_ITEMS_LOGGED`` payload items per entry
  (model_config.py:13 num_commit_timestamps_logged=500,
  freshness_utils.py:825-829);
- error messages clipped to ``MAX_ERROR_CHARS`` (freshness_info.py:213);
- health checks are PUT in batches of ``HEALTH_CHECK_BATCH_SIZE`` with one
  retry per batch, a failed batch is logged and skipped, never a job
  failure (freshness_checker.py:49 MAX_HEALTH_CHECKS_BATCH_SIZE=10,
  :716-764 _put_health_checks_batch + retry helper).

There is no quality-monitoring API endpoint in this engine; the default
sink appends JSON lines to a local file (the PUT body shape is kept), and
``emit_health_checks`` accepts any callable sink so a real deployment can
swap in its endpoint.
"""

from __future__ import annotations

import json
from typing import Callable, Optional

import pandas as pd

MAX_INFOS_WITH_PAYLOAD = 100
NUM_PAYLOAD_ITEMS_LOGGED = 500
MAX_ERROR_CHARS = 500
HEALTH_CHECK_BATCH_SIZE = 10

#: the PUT body field subset (freshness_checker.py:725-735)
HEALTH_CHECK_FIELDS = (
    "id",
    "result",
    "evaluated_at_timestamp",
    "partition_id",
    "quality_check_type",
    "error_message",
    "error_code",
)


def _clip_error(msg) -> Optional[str]:
    if msg is None or (isinstance(msg, float) and pd.isna(msg)):
        return None
    return str(msg)[:MAX_ERROR_CHARS]


def build_check_entries(verdicts: pd.DataFrame,
                        violations: pd.DataFrame) -> list[dict]:
    """Per-verdict metric entries with the reference's cap semantics.

    The payload analogue of the reference's per-table commit-timestamp
    list is the per-(partition, check) violation clip_id list.  Entries
    keep the verdicts' violations-first order; only the first
    ``MAX_INFOS_WITH_PAYLOAD`` entries carry a payload, and each payload
    is truncated to ``NUM_PAYLOAD_ITEMS_LOGGED`` ids."""
    vio_ids: dict = {}
    if len(violations):
        for (pid, chk), g in violations.groupby(["partition_id", "check"]):
            vio_ids[(pid, chk)] = g["clip_id"].tolist()

    entries = []
    n_with_payload = 0
    for _, r in verdicts.iterrows():
        e = {
            "id": r.get("lineage_id"),
            "partition_id": r["partition_id"],
            "quality_check_type": r["quality_check_type"],
            "result": r["status"],
            "evaluated_at_timestamp": (int(pd.Timestamp(r["evaluated_at"]).timestamp())
                                       if "evaluated_at" in r and pd.notna(r["evaluated_at"])
                                       else None),
            "error_message": _clip_error(r.get("error_message")),
            "error_code": r.get("error_code"),
        }
        if n_with_payload < MAX_INFOS_WITH_PAYLOAD:
            payload = vio_ids.get((r["partition_id"], r["quality_check_type"]), [])
            e["violation_clip_ids"] = payload[:NUM_PAYLOAD_ITEMS_LOGGED]
            n_with_payload += 1
        entries.append(e)
    return entries


def file_sink(path: str) -> Callable[[dict], None]:
    """Default K3 sink: append each PUT body as one JSON line."""

    def put(body: dict) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(body, default=str) + "\n")

    return put


def emit_health_checks(
    entries: list[dict],
    put_fn: Callable[[dict], None],
    *,
    batch_size: int = HEALTH_CHECK_BATCH_SIZE,
) -> dict:
    """Send health checks in batches with one retry per batch (K3,
    freshness_checker.py:716-764).  A batch that fails twice is recorded
    and skipped — emission never fails the run."""
    sent, failed = 0, []
    for i in range(0, len(entries), batch_size):
        batch = entries[i:i + batch_size]
        body = {
            "job_id": None,
            "run_id": None,
            "health_checks": [
                {f: d.get(f) for f in HEALTH_CHECK_FIELDS} for d in batch
            ],
        }
        idx = i // batch_size
        for attempt in (0, 1):  # one retry per batch
            try:
                put_fn(body)
                sent += len(batch)
                break
            except Exception:
                if attempt == 1:
                    failed.append(idx)
    return {"batches_total": (len(entries) + batch_size - 1) // batch_size,
            "checks_sent": sent, "failed_batches": failed}
