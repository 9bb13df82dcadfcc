"""Streaming univariate anomaly detectors — SPOT/DSPOT and Huber deviation.

Re-implementations (from the published algorithms, not the reference code)
of the two third-party detectors the reference vendors:

- **SPOT / DSPOT** (Siffer et al., "Anomaly Detection in Streams with
  Extreme Value Theory", KDD 2017; reference: third_party/spot.py:42-525):
  initial threshold at the empirical ``level`` quantile, peaks over
  threshold fitted to a GPD via Grimshaw's method (roots found with numpy
  grid+bisection — no scipy here), extreme quantile ``z_q`` updated online;
  DSPOT subtracts a depth-window moving average first.
- **Huber deviation** (reference: third_party/univariate.py:14-93): robust
  location/scale via Huber's iterative M-estimator (MAD init, maxiter 200),
  anomaly iff residual beyond ±tolerance·scale, directional; <10 points →
  error.  tolerance=5.0 is the contract.

Both hold small mergeable-ish state and run per entity/key inside actor
stages (reference's per-entity adapter: third_party/common.py:78-333).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from anomaly_detection_ray.config import (
    DSPOT_DEPTH,
    HUBER_MAX_ITER,
    HUBER_MIN_POINTS,
    HUBER_TOLERANCE,
    SPOT_INIT_LEVEL,
    SPOT_RISK_Q,
)


# ---------------------------------------------------------------------------
# Grimshaw GPD fit (numpy only)
# ---------------------------------------------------------------------------


def _grimshaw(peaks: np.ndarray, epsilon: float = 1e-8, n_grid: int = 10) -> tuple[float, float]:
    """Fit GPD(γ, σ) to exceedances via Grimshaw's trick: solve
    u(x)·v(x) = 1 where u = 1 + mean(log(1+x·Y)), v = mean(1/(1+x·Y)),
    then γ = mean(log(1+x·Y)), σ = γ/x.  Roots searched on the standard
    two intervals with bisection; the x→0 (exponential) limit is always a
    candidate; best candidate by GPD log-likelihood."""
    y = np.asarray(peaks, dtype=np.float64)
    ymin, ymax, ymean = y.min(), y.max(), y.mean()

    def uv(x: float) -> float:
        s = 1.0 + x * y
        if (s <= 0).any():
            return np.nan
        u = 1.0 + np.log(s).mean()
        v = (1.0 / s).mean()
        return u * v - 1.0

    def loglik(gamma: float, sigma: float) -> float:
        if sigma <= 0:
            return -np.inf
        if abs(gamma) < 1e-12:
            return -y.size * np.log(sigma) - y.sum() / sigma
        s = 1.0 + gamma * y / sigma
        if (s <= 0).any():
            return -np.inf
        return -y.size * np.log(sigma) - (1.0 + 1.0 / gamma) * np.log(s).sum()

    def bisect(a: float, b: float) -> list[float]:
        xs = np.linspace(a, b, n_grid + 1)
        vals = np.array([uv(x) for x in xs])
        roots = []
        for i in range(n_grid):
            va, vb = vals[i], vals[i + 1]
            if np.isnan(va) or np.isnan(vb) or va * vb > 0:
                continue
            lo, hi = xs[i], xs[i + 1]
            for _ in range(60):
                mid = 0.5 * (lo + hi)
                vm = uv(mid)
                if np.isnan(vm):
                    break
                if va * vm <= 0:
                    hi = mid
                else:
                    lo, va = mid, vm
            roots.append(0.5 * (lo + hi))
        return roots

    a = -1.0 / ymax + epsilon
    b = 2.0 * (ymean - ymin) / (ymin * ymin + epsilon)
    candidates = bisect(a, -epsilon) + bisect(epsilon, b)

    # exponential limit (γ→0)
    best_gamma, best_sigma = 0.0, float(ymean)
    best_ll = loglik(best_gamma, best_sigma)
    for x in candidates:
        if abs(x) < 1e-12:
            continue
        gamma = float(np.log(1.0 + x * y).mean())
        sigma = gamma / x
        ll = loglik(gamma, sigma)
        if ll > best_ll:
            best_gamma, best_sigma, best_ll = gamma, sigma, ll
    return best_gamma, best_sigma


# ---------------------------------------------------------------------------
# SPOT / DSPOT
# ---------------------------------------------------------------------------


@dataclass
class SpotDetector:
    """One-sided (upper-tail) streaming SPOT.

    ``fit(init_data)`` sets the initial threshold at the empirical *level*
    quantile and fits the GPD to the exceedances; ``step(x)`` returns True
    when x exceeds the extreme quantile z_q (alarm; alarms are NOT added to
    the model), otherwise adds a new peak + refits when x exceeds the
    initial threshold.  Mirrors third_party/spot.py:481-525's update loop
    semantics.
    """

    q: float = SPOT_RISK_Q
    level: float = SPOT_INIT_LEVEL
    init_threshold: float = 0.0
    zq: float = np.inf
    gamma: float = 0.0
    sigma: float = 1.0
    n: int = 0
    peaks: list = field(default_factory=list)

    def fit(self, init_data: np.ndarray) -> "SpotDetector":
        x = np.asarray(init_data, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size < 10:
            raise ValueError("SPOT needs >= 10 calibration points")
        self.init_threshold = float(np.quantile(x, self.level, method="linear"))
        self.peaks = list(x[x > self.init_threshold] - self.init_threshold)
        self.n = int(x.size)
        self._refit()
        return self

    def _refit(self) -> None:
        if len(self.peaks) < 2:
            self.zq = self.init_threshold if not np.isfinite(self.zq) else self.zq
            return
        y = np.asarray(self.peaks)
        self.gamma, self.sigma = _grimshaw(y)
        r = self.n * self.q / len(self.peaks)
        if abs(self.gamma) < 1e-12:
            self.zq = self.init_threshold - self.sigma * np.log(r)
        else:
            self.zq = self.init_threshold + (self.sigma / self.gamma) * (r ** (-self.gamma) - 1.0)

    def step(self, x: float) -> bool:
        if x > self.zq:
            return True  # alarm — not absorbed into the model
        if x > self.init_threshold:
            self.peaks.append(x - self.init_threshold)
            self.n += 1
            self._refit()
        else:
            self.n += 1
        return False

    def score_series(self, values: np.ndarray) -> np.ndarray:
        return np.array([self.step(float(v)) for v in values], dtype=bool)


@dataclass
class DSpotDetector:
    """Drift-aware SPOT: subtract a depth-window moving average before the
    SPOT step (reference: DSPOT, third_party/spot.py — depth default 10)."""

    depth: int = DSPOT_DEPTH
    q: float = SPOT_RISK_Q
    level: float = SPOT_INIT_LEVEL

    def fit(self, init_data: np.ndarray) -> "DSpotDetector":
        x = np.asarray(init_data, dtype=np.float64)
        if x.size < self.depth + 10:
            raise ValueError("DSPOT needs depth+10 calibration points")
        self._window = list(x[-self.depth:])  # last depth points precede the stream
        resid = x[self.depth :] - np.convolve(x, np.ones(self.depth) / self.depth, mode="valid")[:-1]
        self._spot = SpotDetector(q=self.q, level=self.level).fit(resid)
        return self

    def step(self, x: float) -> bool:
        ma = float(np.mean(self._window))
        alarm = self._spot.step(x - ma)
        if not alarm:
            self._window.pop(0)
            self._window.append(x)
        return alarm

    def score_series(self, values: np.ndarray) -> np.ndarray:
        return np.array([self.step(float(v)) for v in values], dtype=bool)


# ---------------------------------------------------------------------------
# Huber deviation detector
# ---------------------------------------------------------------------------


def huber_location_scale(x: np.ndarray, c: float = 1.5,
                         max_iter: int = HUBER_MAX_ITER, tol: float = 1e-8) -> tuple[float, float]:
    """Huber's Proposal-2 joint location/scale M-estimator, MAD-initialized
    (reference semantics: third_party/univariate.py:62-64)."""
    x = np.asarray(x, dtype=np.float64)
    mu = float(np.median(x))
    mad = float(np.median(np.abs(x - mu)))
    s = mad * 1.4826 if mad > 0 else float(np.std(x)) or 1.0
    n = x.size
    # consistency constant for Proposal 2 with clip at c (standard normal)
    from anomaly_detection_ray.functions.forecast import _norm_sf

    phi_c = np.exp(-0.5 * c * c) / np.sqrt(2 * np.pi)
    beta = 1.0 - 2.0 * (c * phi_c + (1.0 - c * c) * _norm_sf(c))
    for _ in range(max_iter):
        r = (x - mu) / s
        w = np.clip(r, -c, c)
        mu_new = mu + s * w.mean()
        s_new = s * np.sqrt((w**2).mean() / beta) if beta > 0 else s
        if abs(mu_new - mu) < tol * s and abs(s_new - s) < tol * s:
            mu, s = mu_new, s_new
            break
        mu, s = mu_new, max(s_new, 1e-12)
    return mu, s


@dataclass
class HuberDetector:
    """Anomaly iff residual beyond ±tolerance·scale of the robust center,
    with direction; <min_points → ValueError (reference contract:
    third_party/univariate.py:14-93, tolerance 5.0, min 10 points)."""

    tolerance: float = HUBER_TOLERANCE
    min_points: int = HUBER_MIN_POINTS
    center: float = 0.0
    scale: float = 1.0

    def fit(self, x: np.ndarray) -> "HuberDetector":
        x = np.asarray(x, dtype=np.float64)
        x = x[~np.isnan(x)]
        if x.size < self.min_points:
            raise ValueError(f"HuberDetector needs >= {self.min_points} points")
        self.center, self.scale = huber_location_scale(x)
        return self

    def score(self, values: np.ndarray) -> np.ndarray:
        """Returns +1 (high anomaly), -1 (low anomaly), 0 (normal)."""
        v = np.asarray(values, dtype=np.float64)
        hi = v > self.center + self.tolerance * self.scale
        lo = v < self.center - self.tolerance * self.scale
        return hi.astype(np.int8) - lo.astype(np.int8)
