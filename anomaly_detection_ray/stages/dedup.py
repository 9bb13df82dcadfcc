"""Deduplication stages: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Large-scale training-data ops (not present in the reference — its only
dedup is latest-per-key, SURVEY.md §2.8; these generalize that hash-
partition-per-group pattern to content identity):

- **exact**: content-hash per row inside ``map_batches`` (vectorized),
  then ``groupby(hash)`` keep-first.  Shuffle carries (hash, id) width,
  not documents.
- **MinHash-LSH near-dup**: shingle → minhash signature per doc (actor
  pool; permutation state built once per actor) → explode to
  (band, band_hash, doc_id) rows → ``groupby`` band buckets → candidate
  pairs → verify by signature-estimated Jaccard (and optionally exact
  n-gram Jaccard).  Partitioning assumption: band buckets are small
  (bounded by collision rate); a pathological bucket is capped at
  ``max_bucket`` docs and the overflow logged, never materialized.
- **SimHash**: 64-bit signature, bucket by 16-bit bands, pairs with
  Hamming distance ≤ k.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from anomaly_detection_ray.functions.hashing import combine_columns, hash64
from anomaly_detection_ray.functions.text import char_shingle_hashes, jaccard, word_ngram_sets
from anomaly_detection_ray.state.sketches import MinHasher, hamming64, simhash64

CONTENT_HASH = "__chash__"


def add_content_hash(ds: ray.data.Dataset, cols: Sequence[str]) -> ray.data.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        h = combine_columns(*[batch[c] for c in cols])
        return batch.append_column(CONTENT_HASH, pa.array(h.astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")


def exact_dedup(ds: ray.data.Dataset, cols: Sequence[str], keep_col: str) -> ray.data.Dataset:
    """Keep the row with the smallest ``keep_col`` per content hash
    (deterministic winner; reference pattern A6 latest-per-key inverted)."""

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, keep_col)

    return (
        add_content_hash(ds, cols)
        .groupby(CONTENT_HASH)
        .map_groups(keep_first, batch_format="pandas")
        .drop_columns([CONTENT_HASH])
    )


def duplicate_key_counts(ds: ray.data.Dataset, key: str) -> ray.data.Dataset:
    """(key, cnt) rows for keys appearing more than once — the uniqueness
    check's violation set (north rule; reference template A6)."""
    from ray.data.aggregate import Count

    import pyarrow.compute as pc

    counts = ds.groupby(key).aggregate(Count(alias_name="cnt"))
    return counts.map_batches(
        lambda b: b.filter(pc.greater(b["cnt"], 1)), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# MinHash-LSH
# ---------------------------------------------------------------------------


class MinHashBands:
    """Actor stage: documents → (band, band_hash, doc_id) rows.

    Permutation coefficients build once per actor (__init__), signatures
    per batch.  bands × rows_per_band must equal num_perm.
    """

    def __init__(self, text_col: str, id_col: str, num_perm: int = 128,
                 bands: int = 32, shingle_k: int = 5):
        assert num_perm % bands == 0
        self.text_col = text_col
        self.id_col = id_col
        self.hasher = MinHasher(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        return self.hasher.signature(char_shingle_hashes(text, self.shingle_k))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_pylist()
        band_ids, band_hashes, doc_ids = [], [], []
        for i, t in enumerate(texts):
            sig = self.signature(t or "")
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                bh = int(hash64(np.array([chunk.tobytes()], dtype=object))[0]) & 0x7FFFFFFFFFFFFFFF
                band_ids.append(b)
                band_hashes.append(bh)
                doc_ids.append(ids[i])
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                "doc_id": pa.array(doc_ids),
            }
        )


def _bucket_pairs(g: pd.DataFrame, max_bucket: int = 64) -> pd.DataFrame:
    ids = sorted(g["doc_id"].unique().tolist())
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []})
    ids = ids[:max_bucket]  # cap pathological buckets; logged by caller via stats
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    return pd.DataFrame({"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]})


def minhash_candidate_pairs(
    docs: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    concurrency: int = 4,
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """Distinct candidate near-dup pairs (a < b) via banded MinHash-LSH."""
    band_rows = docs.map_batches(
        MinHashBands(text_col, id_col, num_perm, bands, shingle_k),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    pairs = band_rows.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )
    # dedup pairs produced by multiple bands
    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["a", "b"]).map_groups(first, batch_format="pandas")


def minhash_near_duplicates(
    docs: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    exact_verify: bool = True,
) -> pd.DataFrame:
    """Near-dup pairs with estimated (and optionally exact n-gram) Jaccard
    ≥ threshold.  Verification broadcasts the candidate docs' texts — the
    candidate set is small by construction; at 10^12-doc scale the verify
    step becomes a hash join of pair rows against the signature table
    instead (same groupby machinery, documented here as the scale path).
    """
    cand = minhash_candidate_pairs(
        docs, text_col, id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
    ).to_pandas()
    if cand.empty:
        return pd.DataFrame({"a": [], "b": [], "est_jaccard": [], "jaccard": []})
    needed = set(cand["a"]) | set(cand["b"])
    texts: dict = {}
    for b in docs.select_columns([id_col, text_col]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            if i in needed:
                texts[i] = t or ""
    mh = MinHashBands(text_col, id_col, num_perm, bands, shingle_k)
    sigs = {i: mh.signature(t) for i, t in texts.items()}
    est = np.array([(sigs[a] == sigs[b]).mean() for a, b in zip(cand["a"], cand["b"])])
    cand = cand.assign(est_jaccard=np.round(est, 6))
    cand = cand[cand["est_jaccard"] >= threshold * 0.8].copy()
    if exact_verify and not cand.empty:
        ng = {
            i: char_shingle_hashes(texts[i], shingle_k)
            for i in set(cand["a"]) | set(cand["b"])
        }
        cand["jaccard"] = [
            round(jaccard(ng[a], ng[b]), 6) for a, b in zip(cand["a"], cand["b"])
        ]
        cand = cand[cand["jaccard"] >= threshold]
    return cand.sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHashStage:
    """Actor stage: documents → (doc_id, simhash, band0..band3) rows."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import re

        texts = batch[self.text_col].to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = re.findall(r"\w+", (t or "").lower())
            if toks:
                out[i] = simhash64(hash64(np.array(toks, dtype=object)))
        cols = {"doc_id": batch[self.id_col], "simhash": pa.array(out.astype(np.int64))}
        for b in range(4):
            cols[f"band{b}"] = pa.array(
                ((out >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int32)
            )
        return pa.table(cols)


def simhash_near_duplicates(
    docs: ray.data.Dataset, text_col: str, id_col: str, *, max_hamming: int = 3,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Pairs with simhash Hamming distance ≤ max_hamming; candidates share
    at least one 16-bit band (pigeonhole: any pair within distance 3 must
    agree on ≥1 of 4 bands).

    One execution, one shuffle: the simhash stage and a blob-combiner
    partial are fused into the same map — each block ships, per (band,
    bucket=hash(band_value)%B), a packed array blob of its (doc_id,
    simhash, band_value) triples.  A single groupby over those
    O(blocks × 4 × B) blob rows replaces four sequential row-level
    band groupbys (Ray sort-aggregate ≈30µs/row — stages/fused.py)."""
    import pickle

    from anomaly_detection_ray.functions.hashing import hash64

    stage = SimHashStage(text_col, id_col)

    def partial(t: pa.Table) -> pa.Table:
        sh = stage(t)
        ids = sh["doc_id"].to_numpy(zero_copy_only=False)
        hs = sh["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_key, out_blob = [], []
        for b in range(4):
            bv = sh[f"band{b}"].to_numpy(zero_copy_only=False)
            buckets = (hash64(bv) % np.uint64(num_buckets)).astype(np.int64)
            for bb in np.unique(buckets):
                m = buckets == bb
                out_key.append(b * num_buckets + int(bb))
                out_blob.append(pickle.dumps((ids[m], hs[m], bv[m])))
        return pa.table({"k": pa.array(out_key, pa.int64()),
                         "blob": pa.array(out_blob, pa.binary())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        parts = [pickle.loads(x) for x in g["blob"]]
        ids = np.concatenate([p[0] for p in parts])
        hs = np.concatenate([p[1] for p in parts])
        bv = np.concatenate([p[2] for p in parts])
        rows = []
        sub = pd.DataFrame({"doc_id": ids, "h": hs, "bv": bv})
        for _, grp in sub.groupby("bv"):
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id").head(64)
            gids = grp["doc_id"].to_numpy()
            ghs = grp["h"].to_numpy().astype(np.uint64)
            for i in range(len(gids)):
                d = hamming64(ghs[i + 1:], ghs[i])
                for j in np.flatnonzero(d <= max_hamming):
                    rows.append((gids[i], gids[i + 1 + j], int(d[j])))
        return pd.DataFrame(rows, columns=["a", "b", "hamming"])

    allp = (docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("k").map_groups(pairs, batch_format="pandas").to_pandas())
    if allp.empty or "a" not in allp.columns:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    return (
        allp.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    )
