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

from typing import Optional

import numpy as np
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
        if "keys" not in cache:
            cache["keys"] = ray.get(key_set_ref)  # once per worker process
        keys = cache["keys"]
        mask = np.fromiter((k in keys for k in batch[key].to_pylist()),
                           dtype=bool, count=batch.num_rows)
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

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
