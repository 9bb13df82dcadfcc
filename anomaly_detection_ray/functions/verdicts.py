"""Pass/fail verdict rules — pure functions over toy-sized series.

Re-implements the reference's freshness / completeness decision semantics
(rules F6-F14 in SURVEY.md §2.4) with its exact observable thresholds:

- Fresh iff eval_ts ≤ upper confidence bound on the next commit time
  (freshness_utils.py:139-231);
- static-table short-circuit at 30 days (freshness_utils.py:459-485);
- constant-threshold overrides (freshness_utils.py:431-456);
- grace-period alert heuristic with the 15min/30min/12h breakpoints
  (freshness_utils.py:488-610 — ported as semantics, not code);
- completeness: Unhealthy iff last daily volume < max(int(lower CI), 0),
  guards <2 commits / ≤7 buckets (completeness_utils.py:106-237).

Everything here is driver-free: these run inside per-partition
``map_groups`` / actor stages; errors are funneled into Unknown verdicts
by the caller (reference error funnel: errors.py:33-42).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from anomaly_detection_ray.config import (
    COMMIT_GRACE_CAP,
    COMMIT_GRACE_FLOOR,
    COMMIT_GRACE_SMALL_MEDIAN,
    EVENT_GRACE_FLOOR,
    EVENT_GRACE_SMALL_MEDIAN,
    MAX_COMMIT_TRAINING_POINTS,
    MIN_COMMITS_FOR_COMPLETENESS,
    MIN_DAILY_BUCKETS,
    NUM_STD_FOR_RESIDUALS,
    STATIC_TABLE_AGE_SECONDS,
)
from anomaly_detection_ray.functions.forecast import fit_ar

# ---------------------------------------------------------------------------
# Status enums + display ordering (reference: freshness_info.py:17-29,
# completeness_info.py:14-24; Fresh/Stale renamed Healthy/Unhealthy at
# output time behind a flag, freshness_checker.py:492-497 — we emit the
# renamed form by default, keeping the legacy names accessible)
# ---------------------------------------------------------------------------

FRESH = "Fresh"
STALE = "Stale"
HEALTHY = "Healthy"
UNHEALTHY = "Unhealthy"
UNKNOWN = "Unknown"
SKIPPED = "Skipped"

#: display ordering: violations first (freshness_info.py:24-29)
FRESHNESS_STATUS_ORDER = [STALE, FRESH, UNKNOWN, SKIPPED]
HEALTH_STATUS_ORDER = [UNHEALTHY, HEALTHY, UNKNOWN, SKIPPED]

#: error codes — full 11-code taxonomy in errors.py (reference errors.py:5-16)
from anomaly_detection_ray.errors import (  # noqa: E402
    FAILED_TO_PREDICT as ERR_FAILED_TO_PREDICT,
    NO_UPDATES_IN_TABLE_HISTORY as ERR_NO_UPDATES,
)
from anomaly_detection_ray.errors import (  # noqa: E402
    FAILED_TO_FIT_MODEL as ERR_FAILED_TO_FIT,
    INTERNAL_ERROR as ERR_INTERNAL,
    NOT_ENOUGH_TABLE_HISTORY as ERR_NOT_ENOUGH_HISTORY,
    NOT_ENOUGH_UPDATE_OP as ERR_NOT_ENOUGH_UPDATE_OP,
    PAYLOAD_DECODE_ERROR as ERR_DECODE,
)


def status_rank(status: str, order: list[str] = HEALTH_STATUS_ORDER) -> int:
    try:
        return order.index(status)
    except ValueError:
        return len(order)


def format_duration(seconds: Optional[float]) -> Optional[str]:
    """Seconds → 'N day(s) N hr N min' / 'N sec' (reference M6,
    freshness_utils.py:58-81; None-safe)."""
    if seconds is None or not np.isfinite(seconds):
        return None
    seconds = int(seconds)
    if seconds < 60:
        return f"{seconds} sec"
    days, rem = divmod(seconds, 86400)
    hrs, rem = divmod(rem, 3600)
    mins = rem // 60
    parts = []
    if days:
        parts.append(f"{days} day(s)")
    if hrs:
        parts.append(f"{hrs} hr")
    if mins or not parts:
        parts.append(f"{mins} min")
    return " ".join(parts)


# ---------------------------------------------------------------------------
# Freshness (commit cadence) — F6/F8/F10/F11/F12
# ---------------------------------------------------------------------------


@dataclass
class FreshnessVerdict:
    status: str
    predicted_upper_bound_ts: Optional[float] = None   # epoch seconds
    predicted_next_ts: Optional[float] = None
    last_update_ts: Optional[float] = None
    staleness_age_seconds: float = 0.0
    is_static: bool = False
    error_code: Optional[str] = None
    debug: dict = field(default_factory=dict)


def commit_grace_seconds(durations: np.ndarray) -> float:
    """Grace period from the median inter-commit gap (reference F11,
    freshness_utils.py:488-610): Δmed < 30min → max(Δmed, 15min);
    else min(12h, 0.5·Δmed)."""
    if durations.size == 0:
        return COMMIT_GRACE_FLOOR
    med = float(np.median(durations))
    if med < COMMIT_GRACE_SMALL_MEDIAN:
        return max(med, COMMIT_GRACE_FLOOR)
    return min(COMMIT_GRACE_CAP, 0.5 * med)


def event_grace_seconds(latencies: np.ndarray) -> float:
    """Event-latency variant with 30/60-min breakpoints (reference F11)."""
    if latencies.size == 0:
        return EVENT_GRACE_FLOOR
    med = float(np.median(latencies))
    if med < EVENT_GRACE_SMALL_MEDIAN:
        return max(med, EVENT_GRACE_FLOOR)
    return min(COMMIT_GRACE_CAP, 0.5 * med)


def check_commit_freshness(
    commit_ts: np.ndarray,
    eval_ts: float,
    *,
    constant_threshold_seconds: Optional[float] = None,
    static_age_seconds: float = STATIC_TABLE_AGE_SECONDS,
    max_grace_period_minutes: int = -1,
    num_std: float = NUM_STD_FOR_RESIDUALS,
    use_fourier: bool = False,
) -> FreshnessVerdict:
    """The freshness dispatcher (reference F12, freshness_utils.py:661-752):
    static? → constant override? → AR forecast of the next inter-commit
    duration + grace heuristic.  All timestamps are epoch seconds.
    """
    ts = np.sort(np.asarray(commit_ts, dtype=np.float64))
    if ts.size == 0:
        # zero update ops is its own code (reference NO_UPDATES_IN_TABLE_HISTORY)
        return FreshnessVerdict(UNKNOWN, error_code=ERR_NO_UPDATES)
    last = float(ts[-1])

    # F10: static-table short-circuit (Fresh, no prediction).  Runs FIRST,
    # before any constant-threshold override — the reference dispatcher
    # (freshness_utils.py:674-683) calls check_is_static_table up front and
    # only falls through to overrides when the table is not static.
    if eval_ts - last > static_age_seconds:
        return FreshnessVerdict(HEALTHY, last_update_ts=last, is_static=True,
                                debug={"reason": "static_table"})

    # F8: constant-threshold override
    if constant_threshold_seconds is not None:
        bound = last + constant_threshold_seconds
        ok = eval_ts <= bound
        return FreshnessVerdict(
            HEALTHY if ok else UNHEALTHY,
            predicted_upper_bound_ts=bound,
            last_update_ts=last,
            staleness_age_seconds=max(eval_ts - bound, 0.0),
            debug={"rule": "constant_threshold",
                   "threshold_seconds": str(int(constant_threshold_seconds))},
        )

    if ts.size < 2:
        # ≤1 update point → Unknown (reference F6 guard)
        return FreshnessVerdict(UNKNOWN, last_update_ts=last,
                                error_code=ERR_NOT_ENOUGH_UPDATE_OP)

    durations = np.diff(ts)[-MAX_COMMIT_TRAINING_POINTS:]
    try:
        model = fit_ar(durations, use_fourier=use_fourier)
    except Exception:
        return FreshnessVerdict(UNKNOWN, last_update_ts=last,
                                error_code=ERR_FAILED_TO_FIT)
    try:
        res = model.predict_next(num_std)
    except Exception:  # fit ok, prediction failed → its own code (reference)
        return FreshnessVerdict(UNKNOWN, last_update_ts=last,
                                error_code=ERR_FAILED_TO_PREDICT)
    predicted = max(res.forecast, res.min_val if res.forecast <= 0 else res.forecast)
    upper = last + max(res.upper, 0.0)

    # F11 grace-period adjustment: bound = max(CI upper, predicted + grace)
    grace = commit_grace_seconds(durations)
    if max_grace_period_minutes >= 0:
        grace = min(grace, max_grace_period_minutes * 60.0)
    upper = max(upper, last + predicted + grace)

    ok = eval_ts <= upper
    return FreshnessVerdict(
        HEALTHY if ok else UNHEALTHY,
        predicted_upper_bound_ts=upper,
        predicted_next_ts=last + predicted,
        last_update_ts=last,
        staleness_age_seconds=max(eval_ts - upper, 0.0),
        debug={
            "rule": "ar_forecast",
            "predicted_duration_seconds": str(int(predicted)),
            "grace_seconds": str(int(grace)),
            "residual_std": str(round(res.residual_std, 3)),
            "seasonal_period": str(res.period),
        },
    )


def check_event_freshness(
    latencies_seconds: np.ndarray,
    actual_latency_seconds: float,
    *,
    constant_threshold_seconds: Optional[float] = None,
    max_grace_period_minutes: int = -1,
    num_std: float = NUM_STD_FOR_RESIDUALS,
    use_fourier: bool = False,
) -> FreshnessVerdict:
    """Event-latency freshness (reference F7/F9, freshness_utils.py:350-428,
    613-658): train on historical latencies, Fresh iff the actual latest
    latency ≤ forecast upper bound (or a constant threshold)."""
    lat = np.asarray(latencies_seconds, dtype=np.float64)
    if constant_threshold_seconds is not None:
        ok = actual_latency_seconds <= constant_threshold_seconds
        # reference sets both predicted latencies to the threshold
        # (freshness_utils.py:651-652, int-truncated)
        return FreshnessVerdict(
            HEALTHY if ok else UNHEALTHY,
            predicted_upper_bound_ts=float(int(constant_threshold_seconds)),
            staleness_age_seconds=max(actual_latency_seconds - constant_threshold_seconds, 0.0),
            debug={"rule": "event_constant_threshold"},
        )
    if lat.size < 3:
        return FreshnessVerdict(UNKNOWN, error_code=ERR_NOT_ENOUGH_HISTORY)
    try:
        res = fit_ar(lat[:-1], use_fourier=use_fourier).predict_next(num_std)
    except Exception:
        return FreshnessVerdict(UNKNOWN, error_code=ERR_FAILED_TO_FIT)
    grace = event_grace_seconds(lat[:-1])
    if max_grace_period_minutes >= 0:  # testing hook, applied to the event
        grace = min(grace, max_grace_period_minutes * 60.0)  # path too
        # (reference freshness_utils.py:585-593)
    # Event path is ADDITIVE: grace goes on top of the CI upper bound
    # (freshness_utils.py:594-596 event_predicted_upper_bound_latency_seconds
    # = int(upper_CI + grace)) — unlike the commit path's max(CI, pred+grace).
    upper = float(int(res.upper + grace))
    ok = actual_latency_seconds <= upper
    return FreshnessVerdict(
        HEALTHY if ok else UNHEALTHY,
        predicted_upper_bound_ts=upper,
        staleness_age_seconds=max(actual_latency_seconds - upper, 0.0),
        debug={"rule": "event_ar_forecast",
               "predicted_latency_seconds": str(int(res.forecast)),
               "grace_seconds": str(int(grace))},
    )


# ---------------------------------------------------------------------------
# Completeness (daily row volumes) — F13/F14
# ---------------------------------------------------------------------------


@dataclass
class CompletenessVerdict:
    status: str
    actual_volume: Optional[int] = None
    predicted_lower_bound: Optional[int] = None
    error_code: Optional[str] = None
    debug: dict = field(default_factory=dict)


def check_completeness(
    daily_volumes: np.ndarray,
    *,
    num_commits: int | None = None,
    constant_threshold: Optional[float] = None,
    num_std: float = NUM_STD_FOR_RESIDUALS,
    use_fourier: bool = False,
) -> CompletenessVerdict:
    """Completeness rule (reference F13/F14, completeness_utils.py:81-237):

    - guards: <2 commits → NOT_ENOUGH_UPDATE_OPERATIONS; ≤7 daily buckets
      → NOT_ENOUGH_TABLE_HISTORY — guards run BEFORE the override branch
      (reference order, completeness_utils.py:117-155: the min-commits and
      training-size checks precede the table_threshold_overrides dispatch);
    - override: Healthy iff last volume ≥ constant threshold;
    - model: train on volumes[:-1], lower = max(int(lower CI), 0),
      Unhealthy iff volumes[-1] < lower.
    """
    vols = np.asarray(daily_volumes, dtype=np.float64)
    if vols.size == 0:
        return CompletenessVerdict(UNKNOWN, error_code=ERR_NOT_ENOUGH_HISTORY)
    actual = int(vols[-1])

    if num_commits is not None and num_commits < MIN_COMMITS_FOR_COMPLETENESS:
        return CompletenessVerdict(UNKNOWN, actual, error_code=ERR_NOT_ENOUGH_UPDATE_OP)
    if vols.size <= MIN_DAILY_BUCKETS:
        return CompletenessVerdict(UNKNOWN, actual, error_code=ERR_NOT_ENOUGH_HISTORY)
    if constant_threshold is not None:
        ok = actual >= constant_threshold
        return CompletenessVerdict(
            HEALTHY if ok else UNHEALTHY, actual, int(constant_threshold),
            debug={"rule": "constant_threshold"},
        )
    try:
        res = fit_ar(vols[:-1], use_fourier=use_fourier).predict_next(num_std)
    except Exception:
        return CompletenessVerdict(UNKNOWN, actual, error_code=ERR_FAILED_TO_FIT)
    lower = max(int(res.lower), 0)
    ok = actual >= lower
    return CompletenessVerdict(
        HEALTHY if ok else UNHEALTHY, actual, lower,
        debug={"rule": "ar_forecast",
               "forecast": str(int(res.forecast)),
               "residual_std": str(round(res.residual_std, 3))},
    )


def backtest_commit_freshness(
    commit_ts: np.ndarray,
    eval_points: np.ndarray,
    *,
    retrain_every: int = 10,
    lookback_seconds: float = 14 * 86400.0,
    max_train: int = 200,
    num_std: float = NUM_STD_FOR_RESIDUALS,
) -> list[dict]:
    """Rolling re-evaluation of the commit-freshness rule over a grid of
    past eval points (reference §3.2 backtesting,
    freshness_utils.py:850-930): cold-start training window = commits in
    the last ``lookback_seconds`` capped at ``max_train`` points with a
    min-2 fallback (reference 879-891); the fitted model is threaded WARM
    between grid points via ``ARModel.update`` with only the new
    durations (893-897) and retrained from scratch every
    ``retrain_every`` evals or on error (922-928, ModelParams pattern).

    Per grid point emits status + bound + the realized next commit, so
    callers can score forecast quality (rmse/smape over model-evaluated
    points, reference 933-954 — the known-anomaly precision/recall path
    is NOT replicated; it is degenerate in the reference, SURVEY.md §3.2).
    """
    from anomaly_detection_ray.functions.forecast import fit_ar

    ts = np.sort(np.asarray(commit_ts, dtype=np.float64))
    out: list[dict] = []
    model = None
    evals_since_fit = 0
    # Watermark: end-timestamp of the last duration fed to the warm model.
    # A count-based slice (durations[n_seen:]) breaks once the max_train cap
    # or the sliding lookback shifts the array left while keeping its length —
    # the slice goes empty and the model silently freezes.  Tracking the
    # timestamp instead matches the reference's ModelParams threading
    # (freshness_utils.py:893-897: update with durations strictly after the
    # last trained point).
    last_fed_ts = -np.inf

    for ep in np.asarray(eval_points, dtype=np.float64):
        hist = ts[ts < ep]
        row = {"eval_ts": float(ep), "status": UNKNOWN,
               "predicted_upper_bound_ts": None, "predicted_next_ts": None,
               "actual_next_ts": None, "abs_error_seconds": None,
               "warm": model is not None, "error_code": None}
        if hist.size < 2:
            from anomaly_detection_ray.errors import NOT_ENOUGH_UPDATE_OP_BACKTESTING

            row["error_code"] = NOT_ENOUGH_UPDATE_OP_BACKTESTING
            out.append(row)
            continue
        window = hist[hist >= ep - lookback_seconds]
        if window.size < 2:
            window = hist[-2:]  # min-2 fallback
        durations = np.diff(window)[-max_train:]
        dur_end_ts = window[1:][-max_train:]   # end timestamp of each duration
        try:
            if model is None or evals_since_fit >= retrain_every:
                model = fit_ar(durations)
                evals_since_fit = 0
                last_fed_ts = float(dur_end_ts[-1]) if dur_end_ts.size else -np.inf
                row["warm"] = False
            else:
                fresh = durations[dur_end_ts > last_fed_ts]
                if fresh.size:
                    model.update(fresh)
                    last_fed_ts = float(dur_end_ts[-1])
            res = model.predict_next(num_std)
            evals_since_fit += 1
        except Exception:
            model = None  # retrain next round (reference 922-928)
            row["status"] = UNKNOWN
            out.append(row)
            continue
        last = float(window[-1])
        predicted = max(res.forecast, res.min_val if res.forecast <= 0 else res.forecast)
        upper = last + max(res.upper, 0.0)
        upper = max(upper, last + predicted + commit_grace_seconds(durations))
        row["status"] = HEALTHY if ep <= upper else UNHEALTHY
        row["predicted_upper_bound_ts"] = float(upper)
        row["predicted_next_ts"] = float(last + predicted)
        nxt = ts[ts >= ep]
        if nxt.size:
            row["actual_next_ts"] = float(nxt[0])
            row["abs_error_seconds"] = abs(row["predicted_next_ts"] - float(nxt[0]))
        out.append(row)
    return out


def backtest_cadence_bucket_hours(commit_ts: np.ndarray) -> int:
    """Eval-grid interval in hours from the partition's MEDIAN commit
    cadence (reference FreshnessChecker._backtest_avg_cadence_bucket,
    freshness_checker.py:284-301): median duration-to-next ≤ 12h → 6h
    grid (frequently-updating tables); ≤ 3.5 days → 24h (somewhat-daily);
    else → 168h (weekly or longer).  With < 2 commits there is no
    cadence; fall back to the reference's DEFAULT_INTERVAL_HOURS = 6
    (its job scheduler default — the reference itself would NaN here)."""
    ts = np.sort(np.asarray(commit_ts, dtype=np.float64))
    if ts.size < 2:
        return 6
    med = float(np.median(np.diff(ts)))
    if med <= 12 * 3600.0:
        return 6
    if med <= 3.5 * 86400.0:
        return 24
    return 7 * 24


def backtest_quality(rows: list[dict]) -> dict:
    """rmse / smape over the model-evaluated grid points that have a
    realized next commit (reference freshness_utils.py:933-954)."""
    pts = [(r["predicted_next_ts"], r["actual_next_ts"], r["abs_error_seconds"])
           for r in rows
           if r["abs_error_seconds"] is not None and r["status"] in (HEALTHY, UNHEALTHY)]
    if not pts:
        return {"n_scored": 0, "rmse_seconds": None, "smape": None}
    err = np.array([p[2] for p in pts])
    pred = np.array([p[0] for p in pts])
    actual = np.array([p[1] for p in pts])
    denom = (np.abs(pred) + np.abs(actual)) / 2.0
    smape = float(np.mean(np.where(denom > 0, err / denom, 0.0)))
    return {"n_scored": len(pts),
            "rmse_seconds": float(np.sqrt(np.mean(err ** 2))),
            "smape": round(smape, 6)}
