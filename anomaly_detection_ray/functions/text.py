"""Vectorized text analysis for the documents / transcript columns.

Training-data-pipeline text ops: token counting, quality scoring,
language-ID heuristic, fingerprinting, shingling for near-dup detection.
All batch-level (pandas Series in / numpy out) — no per-row Python in hot
paths except where a doc-level set operation is inherent (shingle sets),
and those loop over docs, not characters.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from anomaly_detection_ray.functions.hashing import hash64, kr64_token_hashes

_WS = re.compile(r"\s+")
#: BPE-ish pre-tokenizer: contractions, words, numbers, symbol runs, and
#: whitespace runs (GPT-2-style split, simplified to be lookahead-free so
#: the SAME pattern runs under RE2 — DuckDB's regexp engine — letting the
#: driver oracle count tokens with regexp_extract_all and match bit-exactly)
_BPEISH = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")
_PUNCT = re.compile(r"[^\w\s]")

#: tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "was"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "se", "no"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "zu", "mit", "den"},
    "fr": {"le", "la", "de", "et", "les", "des", "est", "un", "une", "que"},
    "zh": set(),  # han-script detection below
}


def token_count_ws(texts: pd.Series) -> np.ndarray:
    """Whitespace token counts (empty/null → 0)."""
    s = texts.fillna("").str.strip()
    n = s.str.split(_WS).map(len).to_numpy()
    return np.where(s.str.len().to_numpy() == 0, 0, n).astype(np.int64)


def token_count_bpeish(texts: pd.Series) -> np.ndarray:
    """Approximate subword token counts via a GPT-2-style pre-tokenizer."""
    return texts.fillna("").map(lambda t: len(_BPEISH.findall(t))).to_numpy(dtype=np.int64)


def quality_features(texts: pd.Series) -> pd.DataFrame:
    """Per-doc quality features: n_chars, n_tokens, mean token length,
    punctuation ratio, stopword ratio, alpha ratio."""
    s = texts.fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    toks = s.str.lower().str.split(_WS)
    toks = toks.map(lambda ws: [w for w in ws if w])
    n_tokens = toks.map(len).to_numpy(dtype=np.int64)
    mean_tok = np.where(
        n_tokens > 0,
        toks.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0).to_numpy(),
        0.0,
    )
    n_punct = s.str.count(_PUNCT).to_numpy(dtype=np.int64)
    stop = _LANG_PROFILES["en"]
    stop_ratio = np.where(
        n_tokens > 0,
        toks.map(lambda ws: sum(w in stop for w in ws)).to_numpy() / np.maximum(n_tokens, 1),
        0.0,
    )
    n_alpha = s.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "mean_token_len": mean_tok,
            "punct_ratio": n_punct / np.maximum(n_chars, 1),
            "stopword_ratio": stop_ratio,
            "alpha_ratio": n_alpha / np.maximum(n_chars, 1),
        }
    )


def quality_score(texts: pd.Series) -> np.ndarray:
    """Composite [0,1] quality score (length / punct / stopword mix)."""
    f = quality_features(texts)
    len_score = np.clip(f["n_tokens"].to_numpy() / 20.0, 0, 1)
    punct_ok = 1.0 - np.clip(f["punct_ratio"].to_numpy() * 4.0, 0, 1)
    alpha_ok = np.clip(f["alpha_ratio"].to_numpy() * 1.5, 0, 1)
    return np.round(0.5 * len_score + 0.2 * punct_ok + 0.3 * alpha_ok, 6)


def detect_language(texts: pd.Series) -> np.ndarray:
    """Heuristic language ID: han-script ratio → zh, else best stopword-
    profile hit (ties broken by profile order en→es→de→fr via strict->),
    else 'en' for all-ASCII tokens, else 'unknown'.  Deterministic and
    DuckDB-oracled: the language_id oracle mirrors this decision tree with
    list_filter/list_contains over the same profiles."""
    s = texts.fillna("")
    out = np.full(len(s), "unknown", dtype=object)
    han = s.str.count(r"[一-鿿]").to_numpy()
    n_chars = np.maximum(s.str.len().to_numpy(), 1)
    toks = s.str.lower().str.split(_WS).map(lambda ws: [w for w in ws if w])
    for i, ws in enumerate(toks):
        if han[i] / n_chars[i] > 0.2:
            out[i] = "zh"
            continue
        if not ws:
            continue
        best, best_hits = "unknown", 0
        for lang, prof in _LANG_PROFILES.items():
            if not prof:
                continue
            hits = sum(w in prof for w in ws)
            if hits > best_hits:
                best, best_hits = lang, hits
        out[i] = best if best_hits > 0 else "en" if all(w.isascii() for w in ws) else "unknown"
    return out


def md5_fingerprint(texts: pd.Series) -> np.ndarray:
    """Exact content fingerprint = md5 hex digest (oracle: DuckDB md5())."""
    return texts.fillna("").map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()).to_numpy()


_POLY_BASE = np.uint64(1099511628211)  # FNV-1a prime as polynomial base
_POW_CACHE: dict = {}


def _char_kgram_hashes(text: str, k: int) -> np.ndarray:
    """uint64 hash per character k-gram, computed WITHOUT materializing
    substring objects: the text becomes one uint64 codepoint array
    (utf-32 view), a strided (n−k+1, k) window is dotted with the
    polynomial power vector mod 2⁶⁴, and a murmur-style finalizer mixes
    the weak polynomial high bits (the LSH band fold consumes these).
    ~6× cheaper than the per-substring object-array hash it replaced
    (measured 0.50 s → 0.08 s hashing per 2k docs on this host)."""
    if k not in _POW_CACHE:
        _POW_CACHE[k] = _POLY_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    W = np.lib.stride_tricks.sliding_window_view(codes, k)
    with np.errstate(over="ignore"):
        h = (W * _POW_CACHE[k][None, :]).sum(axis=1, dtype=np.uint64)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h


_KR_MOD = np.uint64(2**31 - 1)   # Mersenne prime — classic Karp-Rabin modulus
_KR_BASE = np.uint64(131)


def _kr_kgram_hashes(text: str, k: int) -> np.ndarray:
    """Karp-Rabin k-gram hashes over codepoints, mod 2³¹−1 base 131.

    Deliberately NOT the murmur-mixed 64-bit polynomial the shingle/LSH
    family uses: every intermediate here fits in exact int64 arithmetic
    (h < 2³¹, h·131 + cp < 2³⁹), so a DuckDB oracle can replicate the
    value bit-for-bit with plain BIGINT folds — that is what makes
    ``winnow_near_dups`` hash-checkable end-to-end.  The price is a 2³¹
    value space: for winnowing that only merges colliding grams on both
    sides identically (a pair needs ≥ min_shared independent collisions
    to be invented, ~(n_fp²/2³²)^5 — negligible even at 100-TB shard
    sizes, and collisions merely lengthen one posting list)."""
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = codes.size - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):  # k (=8) vectorized Horner steps, not a per-gram loop
        h = (h * _KR_BASE + codes[j : j + n]) % _KR_MOD
    return h


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> np.ndarray:
    """Winnowing document fingerprints (Schleimer et al. 2003): k-gram
    rolling hashes, keep the min of each sliding window, dedup.  Hash =
    :func:`_kr_kgram_hashes` (SQL-replicable; see its collision note)."""
    if text is None or len(text) < k:
        return np.empty(0, dtype=np.uint64)
    h = _kr_kgram_hashes(text, k)
    if h.size <= window:
        return np.unique(h)
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(sw.min(axis=1))


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashed character k-shingles of one document (unique set)."""
    if text is None or len(text) < k:
        return np.empty(0, dtype=np.uint64)
    return np.unique(_char_kgram_hashes(text, k))


def word_ngram_strings(text: str, n: int = 3) -> set:
    """Distinct word n-gram STRINGS of one document — the unhashed sibling
    of :func:`word_ngram_hashes` for operators whose output must carry the
    grams themselves (top-ngram tables).  Token/gram construction matches
    the DuckDB oracle CTE exactly (split on \\s+ of the trimmed text;
    shorter-than-n docs yield their full join as one gram)."""
    ws = [w for w in _WS.split((text or "").strip()) if w]
    if not ws:
        return set()
    if len(ws) < n:
        return {" ".join(ws)}
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """Hashed word n-gram set of ONE document (sorted-unique uint64).

    Grams hash with :func:`kr64_token_hashes` (Karp-Rabin mod 2⁶⁴ +
    SplitMix64) rather than the keyed ``hash64``: the ARX form replays
    bit-for-bit in DuckDB SQL, which lets the ``ngram_jaccard_dups`` LSH
    pipeline be value-hash oracled end to end (the minhash/simhash
    precedent); Jaccard over the hash set is unchanged modulo 2⁻⁶⁴
    collisions either way."""
    ws = [w for w in _WS.split((text or "").strip()) if w]
    if not ws:
        return np.empty(0, dtype=np.uint64)
    if len(ws) < n:
        return np.unique(kr64_token_hashes([" ".join(ws)]))
    grams = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
    return np.unique(kr64_token_hashes(grams))


def word_ngram_sets(texts: pd.Series, n: int = 3) -> list[np.ndarray]:
    """Hashed word n-gram sets per document (for exact Jaccard verify)."""
    return [word_ngram_hashes(t, n) for t in texts.fillna("")]


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard similarity of two sorted-unique hash sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    if a.size == 0 or b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


def round_half_up6(x: float) -> float:
    """Round to 6 decimals with HALF-AWAY-FROM-ZERO — DuckDB's round()
    semantics (symmetric: -0.6015625 → -0.601563).  Python/numpy round
    half-to-even, so a dyadic score like 77/128 rounds to 0.601562 in
    Python but 0.601563 in the SQL oracle; every score column that an
    oracle mirrors must use this instead of round() or the value hash
    diverges on exact halves."""
    import math

    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6
