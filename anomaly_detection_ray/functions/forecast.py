"""Pure-numpy time-series forecasting — the reference's pmdarima replacement.

pmdarima/statsmodels/scipy do not exist in this environment (SURVEY.md
§7.0), so the auto-ARIMA stack is re-expressed as:

- ACF-based seasonality inference (reference: utils/common_utils.py:209-277
  — period = argmax(acf[1:])+1, significant iff acf ≥ 0.65);
- deterministic jittered synthetic-data boost for short series
  (reference: utils/common_utils.py:164-206 — tile a whole-period prefix,
  uniform int jitter ±min(median//10, 600), np.random.seed(0));
- a least-squares AR(p)+drift forecaster with optional seasonal lag-m term;
- confidence intervals = forecast ± num_std·std(residuals)  (the
  reference's ``use_std_residuals`` path, utils/common_utils.py:425-463
  with num_std_for_residuals=3, model_config.py:91-94 — adopted as the
  defined CI semantics here);
- the reference's ``min_val`` clamp: a non-positive forecast is clamped to
  the training minimum (freshness_utils.py:199-201, common_utils.py:296).

Statistical tail functions (chi-square survival, KS asymptotic p-value) are
implemented from published approximations (Wilson–Hilferty; Kolmogorov
series) since scipy is unavailable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from anomaly_detection_ray.config import (
    ACF_MAX_LAGS,
    ACF_SIGNIFICANCE,
    MIN_TRAINING_POINTS_BEFORE_SYNTH,
    NUM_STD_FOR_RESIDUALS,
    SYNTH_JITTER_CAP_SECONDS,
    SYNTH_SEED,
)


# ---------------------------------------------------------------------------
# ACF / seasonality  (reference F1)
# ---------------------------------------------------------------------------


def acf(x: np.ndarray, nlags: int) -> np.ndarray:
    """Normalized autocorrelation for lags 0..nlags (biased estimator,
    matching the standard statsmodels default the reference relies on)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    nlags = min(nlags, n - 1)
    xc = x - x.mean()
    denom = float((xc**2).sum())
    if denom == 0 or n < 2:
        out = np.zeros(nlags + 1)
        out[0] = 1.0
        return out
    out = np.empty(nlags + 1)
    for k in range(nlags + 1):
        out[k] = float((xc[: n - k] * xc[k:]).sum()) / denom
    return out


def infer_period(x: np.ndarray, max_lags: int = ACF_MAX_LAGS,
                 significance: float = ACF_SIGNIFICANCE) -> int:
    """Seasonal period = argmax(acf[1:]) + 1 if that acf value ≥ the
    significance threshold, else 1 (reference: common_utils.py:209-277)."""
    if x.size < 4:
        return 1
    a = acf(x, min(max_lags, x.size - 1))
    if a.size < 2:
        return 1
    lag = int(np.argmax(a[1:])) + 1
    return lag if a[lag] >= significance else 1


def synthesize_training_data(x: np.ndarray, period: int,
                             min_points: int = MIN_TRAINING_POINTS_BEFORE_SYNTH,
                             seed: int = SYNTH_SEED) -> np.ndarray:
    """Deterministically extend a short seasonal series by tiling a
    whole-period prefix with small uniform integer jitter (reference:
    common_utils.py:164-206; the fixed seed is observable behavior)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size >= min_points or period <= 1 or x.size < period:
        return x
    reps = int(np.ceil((min_points - x.size) / period))
    prefix = np.tile(x[:period], reps)
    med = float(np.median(x))
    cap = min(abs(med) // 10, SYNTH_JITTER_CAP_SECONDS)
    rng = np.random.RandomState(seed)
    jitter = rng.randint(-int(cap), int(cap) + 1, size=prefix.size) if cap >= 1 else 0
    return np.concatenate([prefix + jitter, x])


# ---------------------------------------------------------------------------
# AR(p) + drift forecaster  (reference F3-F5)
# ---------------------------------------------------------------------------


@dataclass
class ForecastResult:
    forecast: float
    lower: float
    upper: float
    residual_std: float
    period: int
    order: int
    min_val: float
    n_train: int


def _fourier_design(t: np.ndarray, period: int, k: int) -> np.ndarray:
    """Fourier seasonal features at time indices ``t``: k sine and k
    cosine harmonics of ``period`` (the reference's
    pm.preprocessing.FourierFeaturizer(m), common_utils.py:307-315 —
    exogenous deterministic seasonality for a non-seasonal model)."""
    t = np.asarray(t, dtype=np.float64)
    w = 2.0 * np.pi * np.arange(1, k + 1) / period
    ang = t[:, None] * w[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1)


@dataclass
class ARModel:
    """Serializable fitted state (reference analogue: ModelParams,
    model_config.py:145-156 — the warm-reuse checkpoint unit).  ``coef``
    holds the lag coefficients followed by 2·fourier_k Fourier
    coefficients (sin 1..k then cos 1..k of the seasonal period); time
    index for the Fourier features is the position in ``history``, so
    warm ``update()`` appends keep the phase aligned."""

    coef: np.ndarray
    lags: tuple
    intercept: float
    residual_std: float
    period: int
    min_val: float
    n_train: int
    history: np.ndarray = field(default_factory=lambda: np.empty(0))
    fourier_k: int = 0

    def predict_next(self, num_std: float = NUM_STD_FOR_RESIDUALS) -> ForecastResult:
        h = self.history
        feats = np.array([h[-l] for l in self.lags]) if self.lags else np.empty(0)
        fk = getattr(self, "fourier_k", 0)  # pre-field checkpoints lack it
        if fk:
            feats = np.concatenate(
                [feats, _fourier_design(np.array([h.size]), self.period, fk)[0]])
        f = float(self.intercept + (feats @ self.coef if self.coef.size else 0.0))
        if f <= 0 and self.min_val > 0:
            # min_val clamp (reference: freshness_utils.py:199-201)
            f = self.min_val
        w = num_std * self.residual_std
        return ForecastResult(f, f - w, f + w, self.residual_std, self.period,
                              len(self.lags), self.min_val, self.n_train)

    def update(self, new_points: np.ndarray) -> "ARModel":
        """Warm update: append observations without refitting (reference:
        common_utils.py:298-304 model.update(y))."""
        self.history = np.concatenate([self.history, np.asarray(new_points, dtype=np.float64)])
        return self


def fit_ar(x: np.ndarray, max_order: int = 3, period: int | None = None,
           use_synth: bool = True, use_fourier: bool = False) -> ARModel:
    """Least-squares AR fit with drift and optional seasonal structure.

    Candidate lag sets {(1..p)} ∪ seasonal lag m are scored by BIC and the
    best kept (reference's dual-fit + BIC selection, common_utils.py:344-401).

    With ``use_fourier`` (the reference's use_fourier_transform path,
    model_config.py:89-90 + common_utils.py:307-315: FourierFeaturizer
    exogenous seasonality on a NON-seasonal model), candidates also
    include each short lag set augmented with 2k Fourier harmonic columns
    of the inferred period — the same BIC race then plays the reference's
    seasonal-vs-non-seasonal fit_multiple_models selection.  Off by
    default: the engine's pinned golden verdicts use the seasonal-LAG
    substitute (SURVEY §7.0); flip ForecastConfig.use_fourier_transform
    to opt in (the reference defaults it on)."""
    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if period is None:
        period = infer_period(x)
    if use_synth:
        x = synthesize_training_data(x, period)
    n = x.size
    min_val = float(x[x > 0].min()) if (x > 0).any() else 0.0
    if n < 3:
        mean = float(x.mean()) if n else 0.0
        std = float(x.std()) if n > 1 else (abs(mean) if mean else 1.0)
        return ARModel(np.empty(0), (), mean, std, period, min_val, n, x.copy())

    # candidates are (lag set, fourier_k) pairs racing on one BIC scale
    candidates: list[tuple] = [((), 0)]
    short_lag_sets: list[tuple] = []
    for p in range(1, max_order + 1):
        if n - p >= max(4, p + 2):
            short_lag_sets.append(tuple(range(1, p + 1)))
    candidates.extend((ls, 0) for ls in short_lag_sets)
    if period > 1 and n - period >= period + 2:
        candidates.append(((1, period), 0))
        candidates.append(((period,), 0))
    if use_fourier and period > 1:
        # k ≤ m//2 (the FourierFeaturizer bound); cap at 4 harmonics so the
        # parameter count stays sane on short series
        fk = min(4, period // 2)
        if fk >= 1:
            candidates.extend((ls, fk) for ls in [(), *short_lag_sets])

    best = None
    for lags, fk in candidates:
        maxlag = max(lags) if lags else 0
        rows = n - maxlag
        ncols = len(lags) + 2 * fk + 1
        if rows < ncols + 1:
            continue
        X = np.ones((rows, ncols))
        for j, l in enumerate(lags):
            X[:, j + 1] = x[maxlag - l : n - l]
        if fk:
            X[:, len(lags) + 1 :] = _fourier_design(
                np.arange(maxlag, n), period, fk)
        y = x[maxlag:]
        coef, *_ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ coef
        sse = float((resid**2).sum())
        k = ncols
        sigma2 = max(sse / rows, 1e-12)
        bic = rows * np.log(sigma2) + k * np.log(rows)
        if best is None or bic < best[0]:
            std = float(np.sqrt(sigma2))
            best = (bic, lags, fk, coef, std)
    _, lags, fk, coef, std = best
    return ARModel(np.asarray(coef[1:]), lags, float(coef[0]), std, period,
                   min_val, n, x.copy(), fourier_k=fk)


def forecast_next(x: np.ndarray, max_order: int = 3,
                  num_std: float = NUM_STD_FOR_RESIDUALS,
                  use_synth: bool = True, use_fourier: bool = False) -> ForecastResult:
    """Fit + one-step forecast with ±num_std·σ_resid interval (F5)."""
    return fit_ar(x, max_order=max_order, use_synth=use_synth,
                  use_fourier=use_fourier).predict_next(num_std)


# ---------------------------------------------------------------------------
# Tail probabilities (no scipy)
# ---------------------------------------------------------------------------


def _norm_sf(z: float) -> float:
    """Standard normal survival function via erfc-style approximation
    (Abramowitz & Stegun 7.1.26, |err| < 1.5e-7)."""
    x = abs(z) / np.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erfc = poly * np.exp(-x * x)
    sf = 0.5 * erfc
    return sf if z >= 0 else 1.0 - sf


def chi2_sf(stat: float, dof: int) -> float:
    """Chi-square survival function via the Wilson–Hilferty cube-root
    normal approximation (published approximation; adequate for drift
    verdicts at the 0.01/0.05 levels)."""
    if not np.isfinite(stat) or dof <= 0:
        return float("nan")
    z = ((stat / dof) ** (1.0 / 3.0) - (1 - 2.0 / (9 * dof))) / np.sqrt(2.0 / (9 * dof))
    return float(_norm_sf(z))


def ks_pvalue(stat: float, n1: float, n2: float) -> float:
    """Asymptotic two-sample KS p-value (Kolmogorov distribution series)."""
    if not np.isfinite(stat) or n1 <= 0 or n2 <= 0:
        return float("nan")
    ne = n1 * n2 / (n1 + n2)
    lam = (np.sqrt(ne) + 0.12 + 0.11 / np.sqrt(ne)) * stat
    if lam < 1e-3:
        return 1.0
    ks = np.arange(1, 101)
    terms = (-1.0) ** (ks - 1) * np.exp(-2.0 * (lam**2) * ks**2)
    return float(np.clip(2.0 * terms.sum(), 0.0, 1.0))
