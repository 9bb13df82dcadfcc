"""Engine configuration.

Thresholds and caps carried over verbatim from the reference's model config
(reference: model_config.py:10-94, utils/common_utils.py:32) because they are
observable pass/fail semantics, plus our engine-side execution knobs.

Config objects round-trip through plain dicts (reference pattern:
metric_config.py:9-124 serializes timedeltas as seconds) and can be
overridden via the ``ADR_CONFIG`` env var holding JSON (reference pattern:
LHM_AD_MODEL_CONFIG, model_config.py:112-131).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any


# ---------------------------------------------------------------------------
# Reference-verbatim model constants (model_config.py / common_utils.py)
# ---------------------------------------------------------------------------

#: 95% confidence (reference: utils/common_utils.py:32  DEFAULT_SENSITIVITY).
DEFAULT_ALPHA = 0.05

#: CI width in residual stddevs when using residual-based intervals
#: (reference: model_config.py:91-94  num_std_for_residuals=3).
NUM_STD_FOR_RESIDUALS = 3.0

#: Tables older than this are "static" → Fresh without prediction
#: (reference: model_config.py:18-19  static_table_age_days=30).
STATIC_TABLE_AGE_SECONDS = 30 * 24 * 3600

#: Training caps (reference: model_config.py:21-25).
MAX_COMMIT_TRAINING_POINTS = 1000
MAX_BACKTEST_TRAINING_POINTS = 200
MAX_EVENT_TRAINING_POINTS = 360

#: History fetch caps (reference: utils/table_history_utils.py:60-92).
MAX_HISTORY_COMMITS = 1000
MAX_LOOKBACK_DAYS = 14
#: Days-window probe fallback floor (reference: model_config.py:27
#: min_commit_training_points=2): a lookback window keeping <= this many
#: op-filtered commits falls back to the newest-1000-raw cap.
MIN_COMMIT_TRAINING_POINTS = 2

#: Completeness guards (reference: model_config.py:27,33).
MIN_COMMITS_FOR_COMPLETENESS = 2
MIN_DAILY_BUCKETS = 7          # ≤7 buckets → NOT_ENOUGH_TABLE_HISTORY

#: Seasonality inference (reference: utils/common_utils.py:209-277,
#: model_config.py:75-94).
ACF_MAX_LAGS = 52
ACF_SIGNIFICANCE = 0.65
MIN_TRAINING_POINTS_BEFORE_SYNTH = 250

#: Synthetic-jitter bound (reference: utils/common_utils.py:164-206):
#: uniform int jitter ±min(median//10, 600), np.random.seed(0).
SYNTH_JITTER_CAP_SECONDS = 600
SYNTH_SEED = 0

#: Grace-period heuristic breakpoints, seconds
#: (reference: freshness_utils.py:488-610 — exact observable semantics).
COMMIT_GRACE_SMALL_MEDIAN = 30 * 60      # Δmed < 30min branch
COMMIT_GRACE_FLOOR = 15 * 60             # grace = max(Δmed, 15min)
COMMIT_GRACE_CAP = 12 * 3600             # else grace = min(12h, 0.5·Δmed)
EVENT_GRACE_SMALL_MEDIAN = 60 * 60       # median latency < 60min branch
EVENT_GRACE_FLOOR = 30 * 60              # grace = max(median, 30min)

#: SPOT defaults (reference: third_party/spot.py — q, init level).
SPOT_RISK_Q = 1e-4
SPOT_INIT_LEVEL = 0.98
DSPOT_DEPTH = 10

#: Huber-deviation tolerance (reference: third_party/univariate.py:14-93
#: — anomaly iff residual beyond ±5·scale; <10 points → error).
HUBER_TOLERANCE = 5.0
HUBER_MIN_POINTS = 10
HUBER_MAX_ITER = 200

#: Update-operation whitelist (reference: utils/table_history_utils.py:17-28).
UPDATE_OPERATIONS = (
    "WRITE",
    "CREATE TABLE",
    "CREATE TABLE AS SELECT",
    "REPLACE TABLE AS SELECT",
    "COPY INTO",
    "STREAMING UPDATE",
    "MERGE",
    "UPDATE",
    "CREATE OR REPLACE TABLE AS SELECT",
    "CLONE",
)

#: operation → row-volume metric key (reference: completeness_utils.py:48-58).
OPERATION_ROW_METRIC = {
    "WRITE": "numOutputRows",
    "CREATE TABLE AS SELECT": "numOutputRows",
    "REPLACE TABLE AS SELECT": "numOutputRows",
    "CREATE OR REPLACE TABLE AS SELECT": "numOutputRows",
    "COPY INTO": "numOutputRows",
    "STREAMING UPDATE": "numOutputRows",
    # CLONE is deliberately ABSENT: it is whitelisted as an update op but the
    # reference's volume extraction (completeness_utils.py operation_to_metric)
    # omits it, so a CLONE commit contributes 0 added rows.
    "MERGE": "numTargetRowsInserted",
    "UPDATE": "numUpdatedRows",
}
DELETED_ROWS_METRIC = "numDeletedRows"

#: Audio-invariant threshold (BASELINE.json input_hint): decoded PCM must
#: match the reference decode with SNR ≥ 30 dB.
MIN_SNR_DB = 30.0

#: dur_ms consistency tolerance (ms) between the column and decoded length.
DUR_MS_TOLERANCE = 1


# ---------------------------------------------------------------------------
# Engine execution config
# ---------------------------------------------------------------------------


@dataclass
class SuiteConfig:
    """Configuration for one validation-suite run (reference analogue:
    MetricConfig / FreshnessConfig / CompletenessConfig, metric_config.py)."""

    dataset: str = "clips"
    #: number of logical partitions (lineage units) the table is split into
    num_partitions: int = 16
    #: salt fan-out for skewed group keys (codec/sr_hz); 1 = no salting
    skew_salt: int = 8
    #: checks to run; order is report order
    checks: tuple = (
        "schema",
        "null_rate",
        "column_stats",
        "uniqueness",
        "referential",
        "audio_decode",
        "transcript_rate",
        "drift",
    )
    #: transcript/audio consistency bounds: a transcript implausibly long
    #: (or empty-ish) for the clip's dur_ms is flagged as a row violation
    #: — chars-per-second outside [min, max].  400 cps sits well above any
    #: plausible speech/caption rate; the synthetic corpus' natural
    #: short-duration tail (~0.6% of rows) lands outside it by
    #: construction (an 8 ms clip carrying a 9-word transcript IS the
    #: inconsistency this check exists to catch).
    transcript_min_cps: float = 1.0
    transcript_max_cps: float = 400.0
    #: partition verdict flips Unhealthy when the flagged-row fraction
    #: exceeds this (rate, not any-violation: the check targets systemic
    #: transcript/audio misalignment, not the lone dirty row)
    transcript_rate_threshold: float = 0.01
    #: violation EXAMPLE rows shipped per check per decode batch —
    #: per-(partition, check) COUNTS stay exact regardless (the
    #: reference's first-N payload-cap pattern,
    #: freshness_checker.py:47-49); bounds the violation table when a
    #: table is systematically broken instead of OOMing the driver
    viol_examples_per_block: int = 100
    #: per-table constant-threshold overrides (reference:
    #: freshness_checker.py:63-65 per-table threshold overrides)
    null_rate_threshold: float = 0.005
    #: user-configured partition skip list (reference tables_to_skip,
    #: freshness_checker.py — skipped partitions get a Skipped verdict with
    #: USER_CONFIGURED_SKIP and never enter the pass)
    partitions_to_skip: tuple = ()
    uniqueness_key: str = "clip_id"
    #: Hash-bucket fan-out for the uniqueness/referential key exchange
    #: (None → ``num_partitions``).  Sizing rule (stages/join.py): each
    #: bucket's reducer dict holds ~total_distinct_keys / key_num_buckets
    #: entries at ~100 B each, and the whole bucket must fit one worker's
    #: heap — choose key_num_buckets ≥ total_distinct_keys × entry_bytes /
    #: worker_heap (10^12 unique ids at 100 B with 8 GiB workers → ≥ ~12k
    #: buckets).  Runs report per-bucket reducer cardinality to
    #: metrics.json (key_bucket_distinct_keys) so fat buckets are visible.
    key_num_buckets: int | None = None
    drift_ks_threshold: float = 0.15
    drift_chi2_pvalue: float = 0.01
    #: columns the drift check covers — numeric (KS) and low-cardinality
    #: categorical (chi-square); high-cardinality ids/text are excluded
    #: because frequency sketches of unique values carry no signal
    drift_columns: tuple = ("sr_hz", "dur_ms", "decoded_ms", "rms", "peak",
                            "clip_ratio", "codec")
    #: batch size for the binary-heavy decode stage.  ALIGN WITH THE SOURCE
    #: BLOCK (2000-row chunk files here): a batch that spans read blocks
    #: makes Ray's cross-block bundler gather upstream outputs (measured
    #: +30% on the fused pass), and a smaller batch multiplies the partial
    #: rows the suite shuffle carries (bundles = rows / batch).  Payload
    #: memory = batch × ~21 KB ≈ 42 MB per in-flight call — tune DOWN for
    #: longer clips (payload grows linearly with duration).
    decode_batch_size: int = 2000
    #: None → adaptive: max(1, cluster CPUs − 2), leaving read/shuffle headroom
    decode_concurrency: int | None = None
    #: generic stats batch size
    stats_batch_size: int = 8192
    alpha: float = DEFAULT_ALPHA

    def to_dict(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        d["checks"] = list(self.checks)
        d["partitions_to_skip"] = list(self.partitions_to_skip)
        return d

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "SuiteConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        for tup in ("checks", "partitions_to_skip", "drift_columns"):
            if tup in kwargs:
                kwargs[tup] = tuple(kwargs[tup])
        return cls(**kwargs)

    @classmethod
    def from_env(cls, base: "SuiteConfig | None" = None) -> "SuiteConfig":
        """Apply ``ADR_CONFIG`` JSON overrides (reference pattern:
        LHM_AD_MODEL_CONFIG env override, model_config.py:112-131)."""
        cfg = base or cls()
        raw = os.environ.get("ADR_CONFIG")
        if raw:
            d = cfg.to_dict()
            d.update(json.loads(raw))
            cfg = cls.from_dict(d)
        return cfg


@dataclass
class ForecastConfig:
    """Numpy AR-forecaster knobs (reference analogue: AutoArimaModelConfig,
    model_config.py:75-94 — semantics kept: seasonality via ACF, CI =
    ±num_std·std(residuals), min_val clamp)."""

    max_ar_order: int = 3
    alpha: float = DEFAULT_ALPHA
    num_std_for_residuals: float = NUM_STD_FOR_RESIDUALS
    acf_significance: float = ACF_SIGNIFICANCE
    acf_max_lags: int = ACF_MAX_LAGS
    min_points_before_synth: int = MIN_TRAINING_POINTS_BEFORE_SYNTH
    use_synthetic_data: bool = True
    #: Reference use_fourier_transform (model_config.py:89-90): seasonal
    #: structure as FourierFeaturizer harmonics on a non-seasonal model,
    #: BIC-raced against the plain candidates (common_utils.py:307-315 +
    #: fit_multiple_models).  The reference defaults this ON; this engine
    #: defaults it OFF because the pinned golden verdicts adopt the
    #: seasonal-LAG substitute (SURVEY §7.0) — flip to opt in.
    use_fourier_transform: bool = False
    max_grace_period_minutes: int = -1  # testing hook (model_config.py:14-15)
    #: S2 probe mode (reference model_config.py:48-49, default False):
    #: when on, history selection is the 14-day window with the
    #: newest-1000 fallback (table_history_utils.py:60-92) instead of the
    #: plain 1000-commit tail cap.
    enable_limit_history_by_timestamp: bool = False
    max_lookback_days: int = MAX_LOOKBACK_DAYS
    #: Per-partition constant-threshold override maps (reference checker
    #: args: freshness_checker.py:63-65 table_threshold_overrides /
    #: table_latency_threshold_overrides as timedelta→seconds,
    #: completeness_checker.py:57,68 as row volumes).  Freshness keys are
    #: partition ids; latency keys are event types (the repo's event-path
    #: unit); a key in BOTH freshness maps is ambiguous and rejected, as in
    #: the reference (freshness_checker.py:98-104).
    freshness_threshold_overrides: dict = field(default_factory=dict)
    latency_threshold_overrides: dict = field(default_factory=dict)
    completeness_threshold_overrides: dict = field(default_factory=dict)
    #: Seconds override for the static-table age cut
    #: (freshness_checker.py:65,81; freshness_utils.py:463-478).
    static_table_threshold_override: float | None = None

    def __post_init__(self):
        overlap = set(self.freshness_threshold_overrides) & set(
            self.latency_threshold_overrides)
        if overlap:
            raise ValueError(
                "freshness_threshold_overrides and latency_threshold_overrides "
                f"cannot share keys: {sorted(overlap)}")

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ForecastConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_env(cls) -> "ForecastConfig":
        """Overrides from the ``forecast`` sub-object of the ``ADR_CONFIG``
        env JSON (the reference's LHM_AD_MODEL_CONFIG pattern applied to
        model knobs, model_config.py:112-131) — threads the
        max_grace_period_minutes testing hook end-to-end."""
        cfg = cls()
        raw = os.environ.get("ADR_CONFIG")
        if raw:
            d = json.loads(raw).get("forecast", {})
            known = {f.name for f in dataclasses.fields(cls)}
            cfg = cls(**{**dataclasses.asdict(cfg),
                         **{k: v for k, v in d.items() if k in known}})
        return cfg
