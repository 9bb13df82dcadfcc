"""Mergeable, serializable sketches — pure numpy.

These are the per-batch partial states the engine computes inside
``map_batches`` and merges in a small ``groupby`` stage (the
partial-then-final shape of the reference's bucket-sum-then-finalize,
completeness_utils.py:69-78, generalized).  All sketches are:

- **mergeable**: ``a.merge(b)`` is associative and commutative, so block
  order / partitioning (N vs 4N cluster layouts) cannot change results;
- **deterministic**: hashing via functions/hashing.py (fixed keys, no
  process-salted ``hash()``);
- **serializable**: ``to_bytes()`` / ``from_bytes()`` round-trip for
  checkpoints and shuffle transport.

Algorithms are from the published literature: HyperLogLog (Flajolet et al.
2007), t-digest (Dunning & Ertl 2019), Bloom filters (Bloom 1970),
MinHash (Broder 1997), SimHash (Charikar 2002).
"""

from __future__ import annotations

import pickle
from typing import Any, Iterable

import numpy as np

from anomaly_detection_ray.functions.hashing import hash64, k_hashes

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


class Sketch:
    """Base: dict-state serialization shared by all sketches."""

    def _state(self) -> dict[str, Any]:
        return self.__dict__

    @classmethod
    def _restore(cls, state: dict) -> "Sketch":
        obj = cls.__new__(cls)
        obj.__dict__.update(state)
        return obj

    def to_bytes(self) -> bytes:
        return pickle.dumps((type(self).__name__, self._state()), protocol=5)

    @staticmethod
    def from_bytes(raw: bytes) -> "Sketch":
        name, state = pickle.loads(raw)
        return _REGISTRY[name]._restore(state)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _clz64(v: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (6-step binary search)."""
    v = v.astype(np.uint64, copy=True)
    n = np.full(v.shape, 64, dtype=np.int64)
    shift = 32
    acc = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        hi = x >> np.uint64(shift)
        has_hi = hi != 0
        acc = np.where(has_hi, acc, acc + shift)
        x = np.where(has_hi, hi, x)
    return np.where(v == 0, n, acc)


class HyperLogLog(Sketch):
    """Dense HLL with p index bits (default 14 → 16 KiB, ~0.8% error)."""

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_many(self, values) -> "HyperLogLog":
        return self.add_hashes(hash64(values))

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        """Add precomputed ``hash64`` values — the fast path for partial
        builders (stages/fused.py) that hash a whole column ONCE and slice
        per partition group, instead of paying the fixed per-call hashing
        cost once per (partition, column) cell."""
        if h.size == 0:
            return self
        p = np.uint64(self.p)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        tail = (h << p) & _MASK64
        rank = (_clz64(tail) + 1).clip(max=64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def _state(self) -> dict[str, Any]:
        # Sparse wire format when few registers are set — a PARTIAL built
        # from a per-(partition, column) slice of one block touches ≤ rows
        # registers out of 2^p, so the dense 16 KiB array was >90% of the
        # suite's shuffle bytes.  Dense stays the format past 1/8 occupancy
        # (sparse would be bigger); old dense payloads restore unchanged.
        nz = np.flatnonzero(self.registers)
        if nz.size < self.m // 8:
            return {"p": self.p,
                    "sparse_idx": nz.astype(np.uint16 if self.p <= 16 else np.int64),
                    "sparse_val": self.registers[nz]}
        return self.__dict__

    @classmethod
    def _restore(cls, state: dict) -> "HyperLogLog":
        if "sparse_idx" in state:
            obj = cls(int(state["p"]))
            obj.registers[state["sparse_idx"].astype(np.int64)] = state["sparse_val"]
            return obj
        return super()._restore(state)

    def estimate(self) -> float:
        m = float(self.m)
        if m >= 128:
            alpha = 0.7213 / (1 + 1.079 / m)
        elif m == 64:
            alpha = 0.709
        elif m == 32:
            alpha = 0.697
        else:
            alpha = 0.673
        # The harmonic sum Σ 2^-reg is accumulated EXACTLY as the integer
        # Σ count(reg=r)·2^(64−r) then divided by 2^64 (one correctly-
        # rounded float op; /2^64 scaling is exact) instead of a float
        # reduction: float-sum order (numpy pairwise vs sequential) moves
        # the last ULP, and the DuckDB oracle for hll_distinct_users
        # replays this sum with the same HUGEINT accumulation, so both
        # sides land on the identical double.
        cnt = np.bincount(self.registers.astype(np.int64), minlength=65)
        num = 0
        for r, c in enumerate(cnt.tolist()):
            if c:
                num += c << (64 - r)
        raw = alpha * m * m / (num / float(1 << 64))
        zeros = int(cnt[0])
        if raw <= 2.5 * m and zeros > 0:
            return m * float(np.log(m / zeros))
        return float(raw)


# ---------------------------------------------------------------------------
# t-digest (merging variant, vectorized compression)
# ---------------------------------------------------------------------------


class TDigest(Sketch):
    """Merging t-digest with the k1 scale function (Dunning & Ertl 2019).

    Compression is fully vectorized: sort, map cumulative quantile through
    k1(q) = δ/(2π)·asin(2q−1), floor to integer cells, merge cells with
    ``np.add.reduceat``.  Accuracy concentrates at the tails, which is what
    the KS drift statistic needs.
    """

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.min = np.inf
        self.max = -np.inf
        self._buffer_limit = 8 * delta

    # -- building -----------------------------------------------------------

    def add_many(self, values) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, np.ones(v.size)])
        if self.means.size > self._buffer_limit:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._compress()
        return self

    def _compress(self) -> None:
        if self.means.size == 0:
            return
        order = np.argsort(self.means, kind="stable")
        m = self.means[order]
        w = self.weights[order]
        total = w.sum()
        # q at the midpoint of each centroid's mass
        cum = np.cumsum(w)
        qmid = (cum - 0.5 * w) / total
        qmid = np.clip(qmid, 1e-12, 1 - 1e-12)
        k = self.delta / (2 * np.pi) * np.arcsin(2 * qmid - 1)
        cell = np.floor(k).astype(np.int64)
        # boundaries where the cell id changes
        starts = np.flatnonzero(np.diff(cell, prepend=cell[0] - 1))
        wsum = np.add.reduceat(w, starts)
        msum = np.add.reduceat(w * m, starts)
        self.means = msum / wsum
        self.weights = wsum

    # -- queries ------------------------------------------------------------

    @property
    def total_weight(self) -> float:
        return float(self.weights.sum())

    def cdf(self, xs) -> np.ndarray:
        """P(X ≤ x) for each x (linear interpolation between centroids)."""
        self._compress()
        xs = np.asarray(xs, dtype=np.float64)
        if self.means.size == 0:
            return np.full(xs.shape, np.nan)
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - 0.5 * self.weights
        # anchor with min/max for the extremes
        grid = np.concatenate([[self.min], self.means, [self.max]])
        cdfv = np.concatenate([[0.0], cum / total, [1.0]])
        # grid must be increasing; collapse ties
        grid, idx = np.unique(grid, return_index=True)
        cdfv = cdfv[idx]
        return np.interp(xs, grid, cdfv, left=0.0, right=1.0)

    def quantile(self, qs) -> np.ndarray:
        self._compress()
        qs = np.asarray(qs, dtype=np.float64)
        if self.means.size == 0:
            return np.full(qs.shape, np.nan)
        total = self.weights.sum()
        cum = (np.cumsum(self.weights) - 0.5 * self.weights) / total
        grid = np.concatenate([[0.0], cum, [1.0]])
        vals = np.concatenate([[self.min], self.means, [self.max]])
        return np.interp(qs, grid, vals)


def ks_statistic(a: TDigest, b: TDigest) -> float:
    """Two-sample KS statistic sup|F_a − F_b| evaluated on the union of
    centroid supports (the drift check's distance, SURVEY.md §7 step 7)."""
    if a.total_weight == 0 or b.total_weight == 0:
        return float("nan")
    support = np.unique(np.concatenate([a.means, b.means, [a.min, a.max, b.min, b.max]]))
    return float(np.max(np.abs(a.cdf(support) - b.cdf(support))))


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


class BloomFilter(Sketch):
    """Standard Bloom filter sized for (capacity, fpp); k derived hashes."""

    def __init__(self, capacity: int, fpp: float = 0.01):
        capacity = max(capacity, 1)
        m = int(np.ceil(-capacity * np.log(fpp) / (np.log(2) ** 2)))
        m = max(64, (m + 7) // 8 * 8)
        self.num_bits = m
        self.k = max(1, int(round(m / capacity * np.log(2))))
        self.bits = np.zeros(m // 8, dtype=np.uint8)

    def add_many(self, values) -> "BloomFilter":
        hs = k_hashes(values, self.k) % np.uint64(self.num_bits)
        flat = hs.ravel().astype(np.int64)
        np.bitwise_or.at(self.bits, flat >> 3, np.uint8(1) << (flat & 7).astype(np.uint8))
        return self

    def contains_many(self, values) -> np.ndarray:
        hs = k_hashes(values, self.k) % np.uint64(self.num_bits)
        flat = hs.astype(np.int64)
        bitset = (self.bits[flat >> 3] >> (flat & 7).astype(np.uint8)) & 1
        return bitset.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.num_bits == other.num_bits and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


# ---------------------------------------------------------------------------
# Frequency sketch (exact up to a cap, then overflow bucket)
# ---------------------------------------------------------------------------


class FreqSketch(Sketch):
    """Category-count map for low-cardinality columns (codec, sr_hz, lang).

    Exact while distinct ≤ cap; beyond that new categories fall into an
    ``__other__`` overflow so merges stay bounded.  Chi-square drift
    (reference analogue: the frequency comparison our north rule adds) is
    computed from two merged sketches.
    """

    OTHER = "__other__"

    def __init__(self, cap: int = 10_000):
        self.cap = cap
        self.counts: dict[str, int] = {}
        self.total = 0

    def add_many(self, values: Iterable) -> "FreqSketch":
        import pandas as pd

        s = pd.Series(list(values) if not hasattr(values, "__array__") else values)
        vc = s.value_counts(dropna=False)
        for k, c in vc.items():
            key = "__null__" if (k is None or (isinstance(k, float) and np.isnan(k))) else str(k)
            self._bump(key, int(c))
        self.total += int(vc.sum())
        return self

    def add_counts(self, keys: Iterable, counts: Iterable[int]) -> "FreqSketch":
        """Add pre-counted (key, count) pairs — the fast path for partial
        builders that value-count a whole column once (one C-level unique/
        bincount) and slice per partition group.

        Pairs are inserted heaviest-first (ties broken by key) so that when
        the slice has more distinct values than ``cap``, the retained key
        set is the heavy hitters — matching ``add_many``'s value_counts
        admission order — with a deterministic tie rule on top.  The sort
        only matters when the batch can overflow the remaining capacity;
        below that, admission order cannot change the retained SET, so the
        hot path (per-(partition, column) suite slices, usually ≪ cap)
        skips the O(d log d) pass.  The dict ORDER is then value order,
        which is fine because ``merge`` re-sorts heaviest-first whenever
        a downstream merge could overflow."""
        pairs = list(zip(keys, counts))
        if len(pairs) > self.cap - len(self.counts):
            pairs = sorted(pairs, key=lambda kc: (-int(kc[1]), str(kc[0])))
        for k, c in pairs:
            key = "__null__" if (k is None or (isinstance(k, float) and np.isnan(k))) else str(k)
            self._bump(key, int(c))
            self.total += int(c)
        return self

    def _bump(self, key: str, c: int) -> None:
        if key in self.counts or len(self.counts) < self.cap:
            self.counts[key] = self.counts.get(key, 0) + c
        else:
            self.counts[self.OTHER] = self.counts.get(self.OTHER, 0) + c

    def merge(self, other: "FreqSketch") -> "FreqSketch":
        # heaviest-first admission when this merge could overflow: the
        # heavy-hitter retention property chi-square drift consumes must
        # hold HERE, independent of the incoming partial's dict order
        # (add_counts skips its sort for under-cap slices, leaving
        # np.unique value order)
        items = other.counts.items()
        if len(other.counts) > self.cap - len(self.counts):
            items = sorted(items, key=lambda kc: (-kc[1], kc[0]))
        for k, c in items:
            self._bump(k, c)
        self.total += other.total
        return self


def chi_square(observed: FreqSketch, expected: FreqSketch) -> tuple[float, int]:
    """Pearson chi-square of *observed* vs *expected* proportions.

    Returns (statistic, dof). Categories absent from one side get a small
    floor. p-value is computed by the caller via the Wilson–Hilferty
    approximation (functions/forecast.py:chi2_sf) — no scipy available.
    """
    keys = sorted(set(observed.counts) | set(expected.counts))
    if not keys or observed.total == 0 or expected.total == 0:
        return float("nan"), 0
    obs = np.array([observed.counts.get(k, 0) for k in keys], dtype=np.float64)
    exp_p = np.array([expected.counts.get(k, 0) for k in keys], dtype=np.float64)
    exp_p = np.maximum(exp_p, 0.5) / np.maximum(exp_p, 0.5).sum()
    exp = exp_p * obs.sum()
    stat = float(((obs - exp) ** 2 / exp).sum())
    return stat, len(keys) - 1


# ---------------------------------------------------------------------------
# MinHash / SimHash
# ---------------------------------------------------------------------------


class MinHasher:
    """Stateless vectorized minhash signatures over shingle hash sets.

    k permutations via the affine construction sig_i = min((a_i·h + b_i)
    mod 2^64) over the document's shingle hashes. Not a mergeable Sketch —
    a per-document signature generator used by the LSH dedup stage.
    """

    def __init__(self, num_perm: int = 128, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature of one document's shingle hashes."""
        if shingle_hashes.size == 0:
            return np.full(self.num_perm, _MASK64, dtype=np.uint64)
        h = shingle_hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            vals = (h[:, None] * self.a[None, :] + self.b[None, :]) & _MASK64
        return vals.min(axis=0)

class OnePermMinHasher:
    """One-permutation MinHash (Li, Owen & Zhang, NIPS 2012) with
    rotation densification (Shrivastava & Li, ICML 2014).

    Each shingle hash is binned by its TOP log2(k) bits; the signature
    component for a bin is the minimum hash landing in it; an empty bin
    borrows cyclically from the nearest non-empty bin to its left with a
    distance offset (collision on a densified component then requires the
    same source value AND the same borrow distance — the 2014 scheme).

    Versus the k-permutation affine construction (MinHasher), signature
    cost drops from O(s·k) multiply-adds to O(s) — at corpus scale the
    signature pass stops being the dedup family's CPU ceiling.  The
    estimator is the same: P(component collision) ≈ Jaccard, so LSH
    banding theory (pick_lsh_bands) applies unchanged.

    ``signatures`` requires each hash set SORTED ASCENDING UNIQUE
    (char_shingle_hashes' np.unique contract): top-bit binning then keeps
    (doc, bin) runs contiguous in the concatenated array, so the whole
    batch reduces with one np.diff + first-of-run take — no per-document
    Python work and no (s × k) intermediate at all."""

    def __init__(self, num_perm: int = 128):
        assert num_perm > 0 and (num_perm & (num_perm - 1)) == 0, \
            "num_perm must be a power of two (top-bit binning)"
        self.num_perm = num_perm
        self.shift = np.uint64(64 - int(num_perm).bit_length() + 1)
        self._C = np.uint64(0x9E3779B97F4A7C15)  # densification offset

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature of one document."""
        return self.signatures([shingle_hashes])[0]

    def signatures(self, hash_sets) -> np.ndarray:
        """(n_docs, num_perm) uint64 signatures for sorted-unique sets."""
        n = len(hash_sets)
        k = self.num_perm
        sig = np.full((n, k), _MASK64, dtype=np.uint64)
        sizes = np.array([h.size for h in hash_sets], dtype=np.int64)
        nz = np.flatnonzero(sizes)  # fully-empty docs stay all-MASK64
        if nz.size == 0:
            return sig
        concat = np.concatenate(
            [np.asarray(hash_sets[i], dtype=np.uint64) for i in nz])
        seg = np.repeat(np.arange(nz.size, dtype=np.int64), sizes[nz])
        bins = (concat >> self.shift).astype(np.int64)
        combined = seg * k + bins  # strictly non-decreasing (sorted sets)
        first = np.empty(combined.size, dtype=bool)
        first[0] = True
        np.not_equal(combined[1:], combined[:-1], out=first[1:])
        tmp = np.full((nz.size, k), _MASK64, dtype=np.uint64)
        tmp.reshape(-1)[combined[first]] = concat[first]  # min = run head
        sig[nz] = self._densify(tmp)
        return sig

    def _densify(self, sig: np.ndarray) -> np.ndarray:
        """Rotation-densify empty bins in place (rows have ≥1 filled)."""
        empty = sig == _MASK64
        if not empty.any():
            return sig
        k = self.num_perm
        cols = np.arange(k, dtype=np.int64)[None, :]
        idx = np.where(~empty, cols, -1)
        left = np.maximum.accumulate(idx, axis=1)  # nearest filled ≤ j
        src = np.where(left >= 0, left, left[:, -1:])  # wrap: last filled
        dist = ((cols - src) % k).astype(np.uint64)
        vals = np.take_along_axis(sig, src, axis=1)
        with np.errstate(over="ignore"):
            vals += dist * self._C
        return np.where(empty, vals, sig)


_SIMHASH_POWS = (np.uint64(1) << np.arange(64, dtype=np.uint64))
_simhash_bufs: dict[str, np.ndarray] = {}  # per-process warm scratch


def simhash64_concat(concat: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """(n_docs,) uint64 SimHashes over CONCATENATED token hashes with
    per-document ``sizes`` — batch-vectorized, bit-identical to unit-weight
    ``simhash64`` per document (bit i set ⇔ 2·(# tokens with bit i) >
    n_tokens; empty documents hash to 0).

    Per-bit counts come from 64 ``np.add.reduceat`` passes over a WARM
    per-process scratch buffer (see MinHasher.signatures on why warm), so
    no per-document Python work and no (tokens × 64) float matrix exists.
    Single-threaded per worker process (Ray map_batches' model) — the
    module-level scratch is not thread-safe."""
    sizes = np.asarray(sizes, dtype=np.int64)
    n = sizes.size
    out = np.zeros(n, dtype=np.uint64)
    nz = np.flatnonzero(sizes)
    if nz.size == 0:
        return out
    concat = np.asarray(concat, dtype=np.uint64)
    nz_sizes = sizes[nz]
    cap = 1 << 18  # tokens per chunk; scratch = 2 MB
    tmp = _simhash_bufs.get("tmp")
    if tmp is None or tmp.shape[0] < cap:
        tmp = _simhash_bufs["tmp"] = np.empty(cap, dtype=np.uint64)
    counts = np.empty((nz.size, 64), dtype=np.int64)
    dlo = rlo = 0
    while dlo < nz.size:
        dhi, rows = dlo, 0
        while dhi < nz.size and (rows == 0 or rows + nz_sizes[dhi] <= cap):
            rows += int(nz_sizes[dhi])
            dhi += 1
        m = rows
        t = tmp if m <= tmp.shape[0] else np.empty(m, dtype=np.uint64)
        starts = np.zeros(dhi - dlo, dtype=np.int64)
        np.cumsum(nz_sizes[dlo:dhi - 1], out=starts[1:])
        chunk = concat[rlo:rlo + m]
        for bit in range(64):
            np.right_shift(chunk, np.uint64(bit), out=t[:m])
            np.bitwise_and(t[:m], np.uint64(1), out=t[:m])
            counts[dlo:dhi, bit] = np.add.reduceat(t[:m], starts)
        dlo, rlo = dhi, rlo + m
    bits = (2 * counts > nz_sizes[:, None])
    out[nz] = (bits.astype(np.uint64) * _SIMHASH_POWS[None, :]).sum(
        axis=1, dtype=np.uint64)
    return out


def simhash64(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> np.uint64:
    """64-bit SimHash of one document's token hashes (Charikar 2002)."""
    if token_hashes.size == 0:
        return np.uint64(0)
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.float64
    )
    w = np.ones(token_hashes.size) if weights is None else np.asarray(weights, dtype=np.float64)
    votes = (bits * 2 - 1).T @ w
    out = np.uint64(0)
    for i in np.flatnonzero(votes > 0):
        out |= np.uint64(1) << np.uint64(i)
    return out


def hamming64(a: np.ndarray, b: np.uint64) -> np.ndarray:
    """Vectorized Hamming distance between uint64 array and one value."""
    x = np.bitwise_xor(a.astype(np.uint64), b)
    # popcount via bit tricks
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


_REGISTRY = {
    "HyperLogLog": HyperLogLog,
    "TDigest": TDigest,
    "BloomFilter": BloomFilter,
    "FreqSketch": FreqSketch,
}
