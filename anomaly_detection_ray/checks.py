"""User-extensible check plugin surface (reference §2.11:
base_checker.py:19-90 ``BaseChecker`` ABC + ``AnomalyDetector``
composition, and the algorithm ABC / transformer chain of
third_party/common.py:29-96).

A ``Check`` plugs into the fused single-pass suite (pipelines/validate.py)
without touching it:

- ``row_violations(batch)`` runs INSIDE the fused decode map — distributed,
  per Arrow batch, over the decoded clip rows (all decode/QC feature
  columns are visible).  Return violation tuples; they ride the existing
  ``kind="viol"`` partial blobs through the one suite shuffle.
- ``verdicts(ctx)`` runs driver-side over the MERGED per-(partition,
  column) stats + sketches — the same inputs the built-in null-rate /
  drift rules consume.  Return verdict dicts via ``ctx.verdict(...)``.

Register with ``register_check`` and reference the check's ``name`` in
``SuiteConfig.checks`` (configurable via the ``ADR_CONFIG`` env JSON, the
reference's LHM_AD_MODEL_CONFIG pattern).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Optional, Sequence

import pandas as pd
import pyarrow as pa


@dataclass
class CheckContext:
    """Everything a driver-side verdict rule can see after the merge."""

    #: merged per-(partition, column) stats incl. sketch bytes (hll/tdigest/freq)
    stats: pd.DataFrame
    #: merged row-violation EXAMPLES (clip_id, partition_id, check,
    #: detail) — bounded per check (stages/fused.py
    #: VIOL_EXAMPLES_MERGE_CAP); count from ``viol_counts``, never from
    #: ``len(violations)``
    violations: pd.DataFrame
    #: sorted partition ids observed in this run
    partitions: list
    #: the run's SuiteConfig
    config: object
    #: baseline snapshot (same shape as ``stats``) or None
    baseline: Optional[pd.DataFrame] = None
    #: EXACT (partition_id, check) → violation count, incl. rows beyond
    #: the example cap
    viol_counts: dict = field(default_factory=dict)
    _verdict_fn: object = field(default=None, repr=False)

    def verdict(self, partition_id: str, check: str, status: str,
                debug: dict, error: Optional[str] = None) -> dict:
        """Build a verdict row in the suite's (golden-tested) shape."""
        return self._verdict_fn(partition_id, check, status, debug, error)


class Check(ABC):
    """One pluggable quality check (reference BaseChecker semantics:
    ``name`` identifies it, the hooks produce violations + verdicts)."""

    #: unique name; referencing it in SuiteConfig.checks activates the check
    name: str = "custom"

    def row_violations(self, batch: pa.Table) -> list[tuple]:
        """Distributed hook: called inside the fused pass on each decoded
        batch.  Return ``(clip_id, partition_id, check_name, detail)``
        tuples (empty list = no violations).  Must be cheap + vectorized —
        this runs on every batch of the corpus."""
        return []

    @abstractmethod
    def verdicts(self, ctx: CheckContext) -> list[dict]:
        """Driver-side hook: produce verdict rows from the merged stats /
        violations via ``ctx.verdict(...)``."""


CHECK_REGISTRY: dict[str, Check] = {}


def register_check(check: Check) -> Check:
    """Register a Check instance (last registration wins, so tests can
    override).  Returns the instance for decorator-style use."""
    CHECK_REGISTRY[check.name] = check
    return check


def unregister_check(name: str) -> None:
    CHECK_REGISTRY.pop(name, None)


def active_custom_checks(checks: Sequence[str]) -> list[Check]:
    """The registered Check instances referenced by a config's check list
    (built-in names simply don't appear in the registry)."""
    return [CHECK_REGISTRY[n] for n in checks if n in CHECK_REGISTRY]
