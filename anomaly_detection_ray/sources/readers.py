"""Table readers/writers — Lance-first design, Parquet in this sandbox.

The north rule targets Lance tables; this environment has no ``pylance``
(SURVEY.md §7.0), so ``read_table`` prefers ``ray.data.read_lance`` when
the dependency exists and the path looks like a Lance dataset, and falls
back to ``read_parquet`` otherwise.  All tests/benchmarks run on Parquet;
the Lance path is one-line switchable.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import ray.data


def _is_lance(path: str) -> bool:
    return path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def _clean_parquet_schema(path: str):
    """Footer schema with file-level metadata dropped.  Parquet files
    written by pandas carry a ``pandas`` metadata dict that makes
    ``pa.Schema`` unhashable; Ray Data's schema-dedup fast path then logs
    a "Failed to hash the schemas" warning on every block split/union
    (ray/data/_internal/arrow_ops/transform_pyarrow.py:181).  The metadata
    carries nothing this engine consumes — dtypes live in the Arrow schema
    proper — so reads pass an explicit metadata-free schema down to the
    scan (one local footer read on the driver; returns None for
    multi-file dirs with no parquet or unreadable footers, falling back
    to Ray's own inference)."""
    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        parts = sorted(x for x in os.listdir(path) if x.endswith(".parquet"))
        if not parts:
            return None
        f = os.path.join(path, parts[0])
    try:
        return pq.read_schema(f).remove_metadata()
    except Exception:
        return None


def read_table(
    path: str,
    *,
    columns: Optional[Sequence[str]] = None,
    filter=None,
    override_num_blocks: Optional[int] = None,
    **kwargs,
) -> ray.data.Dataset:
    """Read a table as a Dataset, pruning columns/rows at the read
    (a read that loads all columns for a 2-column transform is wrong at
    100 TB — push ``columns`` and ``filter`` down to the scan).

    Format dispatch by path: Lance dataset dirs / ``.lance`` (when the
    dependency exists), ``.csv`` / ``.json``(l) sidecar formats (CSV and
    JSON cannot push column pruning into the scan, so the projection is
    applied immediately after — the bytes still leave storage, which is
    why Parquet/Lance are the scale formats), Parquet otherwise."""
    if _is_lance(path):
        try:
            import lance  # noqa: F401

            if override_num_blocks is not None:
                kwargs["override_num_blocks"] = override_num_blocks
            ds = ray.data.read_lance(path, columns=list(columns) if columns else None, **kwargs)
            if filter is not None:
                # read_lance has no Arrow-expression pushdown parameter;
                # silently returning unfiltered rows would be a semantics
                # divergence (same contract as the CSV/JSON branch below)
                ds = ds.map_batches(lambda t, _f=filter: t.filter(_f),
                                    batch_format="pyarrow")
            return ds
        except ImportError:
            pass
    low = path.lower()
    if low.endswith((".csv", ".json", ".jsonl")):
        reader = ray.data.read_csv if low.endswith(".csv") else ray.data.read_json
        if override_num_blocks is not None:
            kwargs["override_num_blocks"] = override_num_blocks
        ds = reader(path, **kwargs)
        if filter is not None:
            # CSV/JSON scans cannot push row filters into the read like
            # Parquet does, but silently returning unfiltered rows would be
            # a semantics divergence — apply the same Arrow expression
            # post-scan so every format agrees on the result set.
            ds = ds.map_batches(lambda t, _f=filter: t.filter(_f),
                                batch_format="pyarrow")
        return ds.select_columns(list(columns)) if columns else ds
    if "schema" not in kwargs:
        clean = _clean_parquet_schema(path)
        if clean is not None and columns:
            # the explicit schema must match the pruned projection
            import pyarrow as pa

            names = set(clean.names)
            clean = (pa.schema([clean.field(c) for c in columns])
                     if all(c in names for c in columns) else None)
        if clean is not None:
            kwargs["schema"] = clean
    return ray.data.read_parquet(
        path,
        columns=list(columns) if columns else None,
        filter=filter,
        override_num_blocks=override_num_blocks,
        **kwargs,
    )


def sf_table(sf_dir: str, name: str, **kwargs) -> ray.data.Dataset:
    """Read one of the driver-provided testdata tables."""
    return read_table(os.path.join(sf_dir, f"{name}.parquet"), **kwargs)


def write_partitioned(ds: ray.data.Dataset, out_dir: str, **kwargs) -> None:
    """Partitioned-Parquet sink: a directory of part files (never one giant
    file) so a failed run can resume by skipping finished partitions."""
    ds.write_parquet(out_dir, **kwargs)
