"""Deterministic, vectorized 64-bit hashing.

Everything sketch-related (HLL registers, bloom bits, minhash signatures,
hash-partition keys) must hash identically in every worker process and on
every run — Python's builtin ``hash`` on strings is salted per process and
must never be used.  We build on ``pandas.util.hash_array`` (SipHash-style,
C-vectorized, fixed default key, deterministic across processes/platforms)
and derive k independent hash functions with the Kirsch–Mitzenmacher
double-hashing construction h_i = h1 + i·h2 (mod 2^64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_KEY1 = "0123456789123456"  # pandas' documented default hash key
_KEY2 = "fedcba9876543210"

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _to_numpy(values) -> np.ndarray:
    """Coerce an Arrow array / ChunkedArray / pandas Series / ndarray to a
    numpy array suitable for ``pd.util.hash_array``."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        # to_pandas gives object dtype for strings/binary — fine for hashing
        values = values.to_pandas()
    if isinstance(values, pd.Series):
        values = values.to_numpy()
    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S"):
        arr = arr.astype(object)
    return arr


_SM64_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM64_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_M2 = np.uint64(0x94D049BB133111EB)
#: Karp-Rabin base for :func:`kr64_token_hashes` — the FNV-64 prime (odd,
#: full-period multiplier mod 2^64).
KR64_BASE = np.uint64(1099511628211)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (Steele/Lea/Flood, public-domain constants) over
    a uint64 array.  Used where a hash must be BOTH high-quality per bit
    (simhash majority votes read all 64 bits) AND exactly replayable in
    DuckDB SQL: every step is xor / right-shift / add / multiply mod 2^64,
    which DuckDB expresses with UBIGINT xor()/>> and HUGEINT modular
    arithmetic (see the ``simhash_near_dups`` oracle in __ray_entry__.py).
    ``pd.util.hash_array`` (SipHash-style, 4-round ARX on the byte stream)
    has no such SQL twin."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = x + _SM64_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SM64_M1
        z = (z ^ (z >> np.uint64(27))) * _SM64_M2
        return z ^ (z >> np.uint64(31))


def kr64_token_hashes(tokens) -> np.ndarray:
    """One uint64 hash per (non-empty) token string: codepoint Karp-Rabin
    polynomial ``sum(cp_i * KR64_BASE^(L-1-i)) mod 2^64`` finalized with
    :func:`splitmix64`.  Fully vectorized — ONE utf-32 decode of the
    concatenated tokens, a power table, and one ``np.add.reduceat``; no
    per-token Python beyond ``len``.  The polynomial alone is a weak hash
    (low bits depend on few chars); the SplitMix64 finalizer restores
    per-bit quality, and both halves replay exactly in SQL."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(t) for t in tokens), count=n, dtype=np.int64)
    cps = np.frombuffer("".join(tokens).encode("utf-32-le"),
                        dtype=np.uint32).astype(np.uint64)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    tok_idx = np.repeat(np.arange(n), lens)
    # char at global index g of token k carries exponent end_k - 1 - g
    exps = ((starts + lens)[tok_idx] - 1 - np.arange(cps.size))
    pw = np.empty(max(int(lens.max()), 1), dtype=np.uint64)
    pw[0] = 1
    with np.errstate(over="ignore"):
        for j in range(1, pw.size):
            pw[j] = pw[j - 1] * KR64_BASE
        kr = np.add.reduceat(cps * pw[exps], starts)
    return splitmix64(kr)


def hash64(values, key: str = _KEY1) -> np.ndarray:
    """Deterministic uint64 hash of each element (vectorized)."""
    arr = _to_numpy(values)
    if arr.dtype == object:
        # None/NaN hash to a fixed value via categorize=False default path
        return pd.util.hash_array(arr, hash_key=key).astype(np.uint64)
    return pd.util.hash_array(arr, hash_key=key).astype(np.uint64)


def hash64_pair(values) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hashes per element."""
    arr = _to_numpy(values)
    h1 = pd.util.hash_array(arr, hash_key=_KEY1).astype(np.uint64)
    h2 = pd.util.hash_array(arr, hash_key=_KEY2).astype(np.uint64)
    # h2 must be odd for double-hashing to cover the space
    h2 = np.bitwise_or(h2, np.uint64(1))
    return h1, h2


def k_hashes(values, k: int) -> np.ndarray:
    """(n, k) matrix of k derived hashes per element (Kirsch–Mitzenmacher)."""
    h1, h2 = hash64_pair(values)
    ks = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (h1[:, None] + ks[None, :] * h2[:, None]) & _MASK64


def bucket_of(values, num_buckets: int) -> np.ndarray:
    """Deterministic hash-partition bucket per element (int64 in [0, B))."""
    return (hash64(values) % np.uint64(num_buckets)).astype(np.int64)


def combine_columns(*cols) -> np.ndarray:
    """Hash of a tuple of columns (order-sensitive), vectorized."""
    acc = None
    for i, c in enumerate(cols):
        h = hash64(c, key=_KEY1 if i % 2 == 0 else _KEY2)
        if acc is None:
            acc = h
        else:
            with np.errstate(over="ignore"):
                acc = (acc * np.uint64(0x9E3779B97F4A7C15) + h) & _MASK64
    return acc


def blob_rows_frame(rows) -> "pd.DataFrame":
    """Typed ``(bucket:int64, blob:object)`` frame for blob-shuffle
    partials.  ``rows`` may be empty: a bare ``pd.DataFrame([], columns=…)``
    gives object-dtype ``bucket``, and the resulting schema-less empty
    block diverges from the int64 blocks of non-empty batches — tripping
    Ray's bundle-schema check downstream."""
    if not rows:
        return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                             "blob": pd.Series(dtype=object)})
    return pd.DataFrame(rows, columns=["bucket", "blob"])
