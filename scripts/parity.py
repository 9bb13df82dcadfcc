"""Local oracle-parity harness mimicking the driver's correctness gate:
runs each queries()[name](sf_dir), runs oracle_sql()[name] in DuckDB over
the same parquet tables, and compares row count + schema + order-
insensitive values (columns sorted by name).

Usage: python scripts/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sort + row-sort only; datetimes canonicalised to [us].

    Deliberately does NOT coerce int<->float: the driver's value hash is
    dtype-sensitive (DuckDB HUGEINT sums land as float64; our int64 output
    must either match or the oracle must CAST AS BIGINT). This gate must be
    at least as strict as the driver's (VERDICT r1 'What's wrong' #1).
    """
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(ours), normalize(oracle)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns {list(a.columns)} != {list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"rows {len(a)} != {len(b)}")
        return problems
    for c in a.columns:
        ka = "f" if pd.api.types.is_float_dtype(a[c]) else (
            "i" if pd.api.types.is_integer_dtype(a[c]) else "o")
        kb = "f" if pd.api.types.is_float_dtype(b[c]) else (
            "i" if pd.api.types.is_integer_dtype(b[c]) else "o")
        if ka != kb:
            problems.append(
                f"col {c}: dtype kind mismatch {a[c].dtype} vs {b[c].dtype} "
                "(driver hash is dtype-sensitive)")
            continue
        if ka == "f":
            # exact float equality — the driver hashes exact values; our
            # pipelines round results, so exact match must hold.
            av = a[c].fillna(-1e308).to_numpy(dtype="float64")
            bv = b[c].fillna(-1e308).to_numpy(dtype="float64")
            eq = av == bv
        else:
            eq = (a[c].fillna("__n__") == b[c].fillna("__n__"))
        if not eq.all():
            i = int(np.flatnonzero(~np.asarray(eq))[0])
            problems.append(f"col {c}: {int((~eq).sum())} diffs, first at {i}: "
                            f"{a[c].iloc[i]!r} vs {b[c].iloc[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data.context import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as mod

    qs, sqls = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name}: rows={len(ours)} (rows-only, {dt:.1f}s)")
            continue
        oracle = con.sql(sqls[name]).df()
        problems = compare(name, ours, oracle)
        if problems:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s):")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"OK   {name}: rows={len(ours)} schema+values match ({dt:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
