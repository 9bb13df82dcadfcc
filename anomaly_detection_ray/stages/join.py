"""Join / lookup stages: broadcast small sides, bloom pre-filters,
hash-partitioned anti-joins for referential integrity.

Reference analogues: the broadcast model-dict lookup (J1,
third_party/common.py:253-269) and the key-matching stitches (J2).  The
referential-integrity check itself is new per the north rule (SURVEY.md
§2.5 J4).

Strategy selection (documented partitioning assumptions):

- **Small right side** (fits comfortably in one object-store value —
  dimension tables, model dicts): ``ray.put`` once, each batch filters
  against the in-memory key set.  Zero shuffle.
- **Large right side**: serialized Bloom filter built distributively
  (one partial bloom per block, OR-merged), broadcast, used to classify
  rows: ``not in bloom`` → definite orphan (no false negatives), ``in
  bloom`` → verified with an exact hash-partitioned ``Dataset.join``
  (left_anti) only when exactness is required.  At 10^12 rows the exact
  pass is the dominant shuffle and the bloom pass exists to short-circuit
  the common all-valid case cheaply.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from anomaly_detection_ray.state.sketches import BloomFilter, Sketch


def broadcast_key_set(ds: ray.data.Dataset, key: str):
    """Collect the distinct keys of a SMALL dataset into one broadcast
    object-store value (ray.put once, read per task — never re-shipped
    per batch)."""
    keys = set()
    for batch in ds.select_columns([key]).iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys.update(batch[key].to_pylist())
    return ray.put(keys)


def semi_join_broadcast(left: ray.data.Dataset, key: str, key_set_ref,
                        anti: bool = False) -> ray.data.Dataset:
    """Filter left by membership of ``key`` in a broadcast key set."""

    def filt(batch: pa.Table) -> pa.Table:
        cache = filt.__dict__
        if "vs" not in cache:  # once per worker process
            cache["vs"] = pa.array(list(ray.get(key_set_ref)))
        mask = pc.is_in(batch[key], value_set=cache["vs"])
        if anti:
            mask = pc.invert(pc.fill_null(mask, False))
        return batch.filter(mask)

    return left.map_batches(filt, batch_format="pyarrow")


def build_bloom(ds: ray.data.Dataset, key: str, capacity: int,
                fpp: float = 0.001) -> BloomFilter:
    """Distributed Bloom build: one partial bloom per block inside
    map_batches, OR-merge of the (few, fixed-size) partials on the driver."""

    def partial(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity, fpp)
        col = batch[key].drop_null()
        if len(col):
            bf.add_many(col.to_pandas().to_numpy())
        return pa.table({"bloom": pa.array([bf.to_bytes()], pa.binary())})

    acc: Optional[BloomFilter] = None
    for b in ds.select_columns([key]).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).iter_batches(batch_size=16, batch_format="pyarrow"):
        for blob in b["bloom"].to_pylist():
            s = Sketch.from_bytes(blob)
            acc = s if acc is None else acc.merge(s)
    return acc if acc is not None else BloomFilter(capacity, fpp)


def key_integrity(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    *,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Uniqueness + both referential directions in ONE key shuffle.

    Tags each side with an indicator column, unions, and runs a single
    ``groupby(key).aggregate(Sum)`` — the all-to-all exchange that a
    dup-count groupby plus two anti-joins would otherwise pay three times
    over (SURVEY.md §7.5: pick ONE partitioning key and reuse it).  Output:
    one row per key with ``n_left`` / ``n_right`` occurrence counts; the
    caller derives duplicates (n_left>1), left orphans (n_right==0) and
    right orphans (n_left==0).  Null keys never enter the shuffle — filter
    them upstream (they are definitionally orphans).

    Implementation is the partial/combiner pattern (pre-aggregate inside
    map_batches, THEN shuffle): each block folds its keys into per-bucket
    count dicts shipped as pickled blobs, so the all-to-all moves
    ``O(blocks × num_partitions)`` blob rows instead of every raw key —
    Ray's sort-aggregate costs ~30µs/row, so shuffling raw keys is the
    difference between milliseconds and seconds per million keys.  Bucket =
    ``hash64(key) % P`` (uniform, skew-proof for id-like keys).

    Partitioning assumption: the distinct keys of ONE bucket fit in one
    worker's heap during the merge — choose ``num_partitions`` ≥
    ``total_distinct_keys × entry_bytes / worker_heap``.
    """
    import pickle

    from anomaly_detection_ray.functions.hashing import bucket_of

    def partial(side: int):
        def f(batch: pa.Table) -> pa.Table:
            col = batch[key].drop_null()
            if len(col) == 0:
                return pa.table({"bucket": pa.array([], pa.int64()),
                                 "blob": pa.array([], pa.binary())})
            vc = col.to_pandas().value_counts()
            keys = vc.index.to_numpy(dtype=object)
            counts = vc.to_numpy()
            buckets = bucket_of(keys, num_partitions)
            out_b, out_blob = [], []
            for b in np.unique(buckets):
                m = buckets == b
                out_b.append(int(b))
                out_blob.append(pickle.dumps(
                    (side, dict(zip(keys[m], counts[m].tolist())))))
            return pa.table({"bucket": pa.array(out_b, pa.int64()),
                             "blob": pa.array(out_blob, pa.binary())})

        return f

    tagged = left.select_columns([key]).map_batches(
        partial(0), batch_format="pyarrow"
    ).union(right.select_columns([key]).map_batches(partial(1), batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        from collections import defaultdict

        nl: dict = defaultdict(int)
        nr: dict = defaultdict(int)
        for blob in g["blob"]:
            side, d = pickle.loads(blob)
            tgt = nl if side == 0 else nr
            for k, c in d.items():
                tgt[k] += c
        all_keys = list(nl.keys() | nr.keys())
        return pd.DataFrame({
            key: all_keys,
            "n_left": [nl.get(k, 0) for k in all_keys],
            "n_right": [nr.get(k, 0) for k in all_keys],
        })

    return tagged.groupby("bucket").map_groups(merge, batch_format="pandas")


def referential_orphans(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    *,
    right_count_hint: Optional[int] = None,
    exact: bool = True,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Rows of ``left`` whose ``key`` has no match in ``right`` (J4).

    Bloom pre-pass classifies every left row without a shuffle; rows the
    bloom claims present are (optionally) verified with an exact
    hash-partitioned left_anti join on the key column only — the full left
    row never enters the shuffle, only (key) pairs, and survivors are
    recovered by a second bloom-free semi filter.
    """
    cap = right_count_hint or max(right.count(), 1)
    bloom = build_bloom(right, key, cap)
    bloom_ref = ray.put(bloom.to_bytes())

    # stateless tasks (not pinned actor pools): the bloom bytes live in the
    # object store once; each task deserializes lazily via a cached global
    def _get_bloom():
        cache = _get_bloom.__dict__
        if "b" not in cache:
            cache["b"] = Sketch.from_bytes(ray.get(bloom_ref))
        return cache["b"]

    def not_in_bloom(batch: pa.Table) -> pa.Table:
        col = batch[key]
        null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
        vals = col.to_pandas().to_numpy()
        present = _get_bloom().contains_many(vals)
        # nulls are orphans by definition; bloom-absent keys are
        # definite orphans (no false negatives)
        return batch.filter(pa.array(null_mask | ~present))

    definite = left.map_batches(not_in_bloom, batch_format="pyarrow")
    if not exact:
        return definite

    # exact pass: keys the bloom *might* know (false-positive candidates).
    def maybe_present(batch: pa.Table) -> pa.Table:
        vals = batch[key].to_pandas().to_numpy()
        mask = _get_bloom().contains_many(vals) & ~pc.is_null(batch[key]).to_numpy(
            zero_copy_only=False
        )
        return batch.filter(pa.array(mask))

    candidates = left.map_batches(maybe_present, batch_format="pyarrow")
    right_keys = right.select_columns([key])
    fp_orphans = candidates.join(
        right_keys, "left_anti", num_partitions=num_partitions, on=(key,)
    )
    return definite.union(fp_orphans)


def fact_dim_rollup(
    fact: ray.data.Dataset,
    dim: ray.data.Dataset,
    key: str,
    sum_cols: Sequence[str],
    dim_attr: str,
    *,
    num_partitions: int = 32,
    count_alias: str = "__cnt__",
) -> pd.DataFrame:
    """Fact ⋈ dim + rollup by a dimension attribute through ONE blob
    shuffle — the hash-partitioned join expressed in the repo's
    partial/combiner idiom instead of ``Dataset.join``.

    Each fact block pre-aggregates (key → partial sums + row count) and
    splits the partial frame by ``hash64(key) % P``; each dim block ships
    its (key → attr) pairs bucketed the same way; one ``groupby(bucket)``
    reduce joins the two sides per bucket and rolls up to
    O(distinct attr) rows.  The all-to-all moves O(blocks × buckets)
    pickled blobs — never a raw fact row — and the reducer output is tiny,
    so the caller's final combine is a driver-side formality.  Inner-join
    semantics: fact keys missing from dim are dropped (count surviving
    rows from the reducer if you need a coverage check).

    Partitioning assumption: one bucket's distinct keys (both sides) fit
    a worker heap — size ``num_partitions`` accordingly, exactly as for
    ``key_integrity`` above.
    """
    import math
    import pickle

    from anomaly_detection_ray.functions.hashing import bucket_of

    sum_cols = list(sum_cols)

    def fsum_rollup(df: pd.DataFrame) -> pd.DataFrame:
        # math.fsum per group: a pairwise pandas sum over ~50k 1e8-scale
        # partials drifts ~1e-5 per bucket — enough to flip a round(…, 4)
        # oracle comparison at the final 1e10 magnitude.  Exactly-rounded
        # sums keep the error at one ulp regardless of row order.
        return df.groupby(dim_attr, observed=True, as_index=False).agg(
            **{c: (c, math.fsum) for c in sum_cols},
            **{count_alias: (count_alias, "sum")})

    def fact_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(key, observed=True)[sum_cols].sum()
        g[count_alias] = df.groupby(key, observed=True).size()
        g = g.reset_index()
        buckets = bucket_of(g[key].to_numpy(), num_partitions)
        rows_b, rows_blob = [], []
        for b in np.unique(buckets):
            rows_b.append(int(b))
            rows_blob.append(pickle.dumps((0, g[buckets == b])))
        return pa.table({"bucket": pa.array(rows_b, pa.int64()),
                         "blob": pa.array(rows_blob, pa.binary())})

    def dim_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[[key, dim_attr]].drop_duplicates(key)
        buckets = bucket_of(df[key].to_numpy(), num_partitions)
        rows_b, rows_blob = [], []
        for b in np.unique(buckets):
            rows_b.append(int(b))
            rows_blob.append(pickle.dumps((1, df[buckets == b])))
        return pa.table({"bucket": pa.array(rows_b, pa.int64()),
                         "blob": pa.array(rows_blob, pa.binary())})

    tagged = fact.map_batches(fact_partial, batch_format="pyarrow").union(
        dim.map_batches(dim_partial, batch_format="pyarrow"))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        facts, dims = [], []
        for blob in g["blob"]:
            side, frame = pickle.loads(blob)
            (facts if side == 0 else dims).append(frame)
        if not facts or not dims:
            # typed empty frame: schema-less empty blocks trip Ray's
            # bundle-schema check (same fix as the window pipelines)
            return pd.DataFrame({dim_attr: pd.Series(dtype=object),
                                 **{c: pd.Series(dtype="float64") for c in sum_cols},
                                 count_alias: pd.Series(dtype="int64")})
        f = pd.concat(facts, ignore_index=True).groupby(
            key, observed=True)[sum_cols + [count_alias]].sum().reset_index()
        d = pd.concat(dims, ignore_index=True).drop_duplicates(key)
        j = f.merge(d, on=key, how="inner")
        return fsum_rollup(j)

    out = tagged.groupby("bucket").map_groups(
        reduce_bucket, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(columns=[dim_attr, *sum_cols, count_alias])
    return fsum_rollup(out)
