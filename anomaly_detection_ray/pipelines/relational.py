"""Relational operator pipelines over the driver-provided testdata tables.

Each function takes ``sf_dir`` and returns a small result (pandas) whose
column names match the DuckDB oracle SQL in ``__ray_entry__.oracle_sql``
exactly.  Floating aggregates are rounded identically on both sides so the
driver's value-hash is robust to summation order.

Patterns exercised (SURVEY.md §2 inventory):

- pre-aggregated grouped sums (combine inside ``map_batches``, then a tiny
  ``groupby`` over partials — A1/A7's partial-then-final shape);
- vectorized filters/projections at the read (M1/M2);
- latest-per-key dedup (A6), status-domain fill (J3), multi-key rank sort
  (O1/O2), as-of lookup (S3);
- broadcast joins (J1/J2), hash-partitioned large joins and anti-joins (J4);
- exact distinct counts, uniqueness violations (§2.8).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from anomaly_detection_ray.sources.readers import sf_table
from anomaly_detection_ray.stages.join import referential_orphans

# ---------------------------------------------------------------------------
# generic pre-aggregated grouped sums (the combiner pattern)
# ---------------------------------------------------------------------------


def grouped_sums(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_alias: str = "__cnt__",
    num_buckets: int = 32,
    exact_sums: bool = False,
) -> ray.data.Dataset:
    """Grouped sums + count via the blob-combiner pattern: each block
    pre-aggregates with pandas, splits its partial frame into
    ``hash(key) % num_buckets`` pickled shards, and the shuffle moves
    O(blocks × buckets) blob rows — never one row per (block, key).
    Ray's sort-aggregate costs ~30µs per shuffled ROW (stages/fused.py),
    so for high-cardinality keys (e.g. (event_type, hour) windows) this is
    the difference between sub-second and tens of seconds.  Bucketing by
    key hash keeps hot keys (skew) spread only across blocks, never
    reducers, and each reducer merges with one C-level pandas groupby.

    ``exact_sums=True`` switches every float sum (partial AND merge) to
    ``math.fsum``: use it for LOW-cardinality keys whose totals reach
    magnitudes where pairwise-summation order drift (~1e-4 at 1e10 over
    millions of terms) would cross the oracle's rounding grain.  It costs
    one Python fsum per (block, key, column) — fine for a handful of
    groups, wrong for per-entity keys."""
    import math
    import pickle

    from anomaly_detection_ray.functions.hashing import blob_rows_frame, combine_columns, hash64

    keys = list(keys)
    sum_cols = list(sum_cols)

    def _gsum(g, cols):
        if not exact_sums:
            return g[cols].sum()
        # dropna first: pandas .sum() skips NaN, fsum would propagate it —
        # the exactness flag must not change null semantics
        return g[cols].agg(lambda s: math.fsum(s.dropna()))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, dropna=False, observed=True)
        out = _gsum(g, sum_cols) if sum_cols else pd.DataFrame(index=g.size().index)
        out[count_alias] = g.size()
        out = out.reset_index()
        kh = (combine_columns(*[out[k] for k in keys]) if len(keys) > 1
              else hash64(out[keys[0]]))
        buckets = (kh % np.uint64(num_buckets)).astype(np.int64)
        rows = [(int(b), pickle.dumps(out[buckets == b]))
                for b in np.unique(buckets)]
        return blob_rows_frame(rows)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        frames = [pickle.loads(b) for b in g["blob"]]
        cat = pd.concat(frames, ignore_index=True)
        gg = cat.groupby(keys, dropna=False, observed=True)
        out = _gsum(gg, sum_cols) if sum_cols else pd.DataFrame(index=gg.size().index)
        out[count_alias] = gg[count_alias].sum()
        return out.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    return partials.groupby("bucket").map_groups(merge, batch_format="pandas")


def latest_per_key(
    ds: ray.data.Dataset, key: str, ts_col: str, batch_size: int = 65536,
    num_buckets: int = 32
) -> ray.data.Dataset:
    """Latest row per key (reference A6 ROW_NUMBER()...rn=1 dedup): each
    block keeps only its own per-key latest row, splits the winners into
    ``hash(key) % B`` pickled frame blobs, and per-bucket reducers re-run
    the idxmax over their (disjoint) key slice.  The shuffle moves
    O(blocks × buckets) blob rows — shuffling the pre-reduced winners as
    raw ROWS cost ~30µs each in Ray's sort-aggregate, which was most of
    this operator's wall time once the read was warm."""
    import pickle

    from anomaly_detection_ray.functions.hashing import blob_rows_frame, bucket_of

    def block_latest(df: pd.DataFrame) -> pd.DataFrame:
        idx = df.groupby(key, observed=True)[ts_col].idxmax()
        return df.loc[idx]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return blob_rows_frame([])
        w = block_latest(df).reset_index(drop=True)
        buckets = bucket_of(w[key].to_numpy(), num_buckets)
        rows = [(int(b), pickle.dumps(w[buckets == b]))
                for b in np.unique(buckets)]
        return blob_rows_frame(rows)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        frames = [pickle.loads(b) for b in g["blob"]]
        return block_latest(pd.concat(frames, ignore_index=True))

    pre = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    return pre.groupby("bucket").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: filtered scan → pre-aggregated grouped sums."""
    ds = sf_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc_price = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "l_quantity": t["l_quantity"],
            "l_extendedprice": t["l_extendedprice"],
            "l_discount": t["l_discount"],
            "disc_price": disc_price,
        })

    # exact_sums: sum_disc_price reaches ~1e10 and is rounded to 4
    # decimals — pairwise-summation order drift (~1e-4) exceeds that
    # grain, so only exactly-rounded sums compare stably against the
    # DECIMAL-cast oracle
    agg = grouped_sums(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["l_quantity", "l_extendedprice", "disc_price", "l_discount"],
        exact_sums=True,
    ).to_pandas()
    n = agg["__cnt__"]
    out = pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "l_linestatus": agg["l_linestatus"],
        "sum_qty": agg["l_quantity"].round(2),
        "sum_base_price": agg["l_extendedprice"].round(2),
        "sum_disc_price": agg["disc_price"].round(4),
        "avg_qty": (agg["l_quantity"] / n).round(4),
        "avg_price": (agg["l_extendedprice"] / n).round(4),
        "avg_disc": (agg["l_discount"] / n).round(4),
        "count_order": n.astype("int64"),
    })
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def daily_volume(sf_dir: str) -> pd.DataFrame:
    """M5 analogue: day-bucket volumes over the events stream."""
    ds = sf_table(sf_dir, "events", columns=["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"day": pc.floor_temporal(t["ts"], unit="day"), "value": t["value"]})

    agg = grouped_sums(ds.map_batches(prep, batch_format="pyarrow"), ["day"], ["value"]).to_pandas()
    out = pd.DataFrame({
        "day": pd.to_datetime(agg["day"]),
        "sum_value": agg["value"].round(2),
        "n_events": agg["__cnt__"].astype("int64"),
    })
    return out.sort_values("day").reset_index(drop=True)


def latest_event_per_user(sf_dir: str) -> pd.DataFrame:
    ds = sf_table(sf_dir, "events", columns=["user_id", "ts", "event_type", "value"])
    df = latest_per_key(ds, "user_id", "ts").to_pandas()
    df["value"] = df["value"].round(6)
    return (df[["user_id", "ts", "event_type", "value"]]
            .sort_values("user_id").reset_index(drop=True))


_STATUS_DOMAIN = ["F", "O", "P", "X"]


def status_count_domain(sf_dir: str) -> pd.DataFrame:
    """J3: counts per status LEFT-JOINed onto a fixed domain (0-filled)."""
    ds = sf_table(sf_dir, "orders", columns=["o_orderstatus"])
    counts = grouped_sums(ds, ["o_orderstatus"], []).to_pandas()
    m = dict(zip(counts["o_orderstatus"], counts["__cnt__"]))
    return pd.DataFrame({
        "o_orderstatus": _STATUS_DOMAIN,
        "cnt": [int(m.get(s, 0)) for s in _STATUS_DOMAIN],
    })


_PRIORITY_RANK = {"1-URGENT": 1, "2-HIGH": 2, "3-MEDIUM": 3, "4-NOT SPECIFIED": 4, "5-LOW": 5}


def multi_key_sort(sf_dir: str, limit: int = 100) -> pd.DataFrame:
    """O1/O2: rank column + multi-key top-N.

    A top-N never needs a global sort (the only avoidable all-to-all in the
    repo, VERDICT r1 #5): each block keeps its own top ``limit`` rows by
    (rank, −price, key) — a vectorized dictionary-rank via ``pc.index_in``
    plus one pandas sort per block — and the driver merges the
    O(blocks × limit) partial rows.  Same shape as embedding_topk."""
    ds = sf_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    domain = pa.array(sorted(_PRIORITY_RANK, key=_PRIORITY_RANK.get))

    def block_topn(t: pa.Table) -> pa.Table:
        rank = pc.add(pc.fill_null(pc.index_in(t["o_orderpriority"],
                                               value_set=domain), 8), 1)
        t = t.append_column("priority_rank", pc.cast(rank, pa.int64()))
        df = t.to_pandas().sort_values(
            ["priority_rank", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True]).head(limit)
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = ds.map_batches(block_topn, batch_format="pyarrow").to_pandas()
    out = partials.sort_values(
        ["priority_rank", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True]).head(limit).copy()
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out[["o_orderkey", "o_orderpriority", "priority_rank", "o_totalprice"]].reset_index(drop=True)


def null_rate_documents(sf_dir: str) -> pd.DataFrame:
    """Null-rate check over every documents column (A7 partial pattern)."""
    from anomaly_detection_ray.stages.stats import column_stats

    ds = sf_table(sf_dir, "documents")
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    stats = column_stats(ds, cols, with_sketches=False).to_pandas()
    out = pd.DataFrame({
        "col_name": stats["column"],
        "null_count": stats["nulls"].astype("int64"),
        "row_count": stats["count"].astype("int64"),
        "null_rate": stats["null_rate"].round(6),
    })
    return out.sort_values("col_name").reset_index(drop=True)


def column_stats_lineitem(sf_dir: str) -> pd.DataFrame:
    """count/min/max/mean/stddev(sample) of l_quantity per returnflag."""
    ds = sf_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_returnflag", observed=True)["l_quantity"]
        out = g.agg(cnt="count", mn="min", mx="max", s="sum")
        out["ssq"] = g.apply(lambda v: float((v.to_numpy() ** 2).sum()))
        return out.reset_index()

    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    agg = partials.groupby("l_returnflag").aggregate(
        Sum("cnt", alias_name="cnt"), Min("mn", alias_name="mn"),
        Max("mx", alias_name="mx"), Sum("s", alias_name="s"),
        Sum("ssq", alias_name="ssq"),
    ).to_pandas()
    n = agg["cnt"].astype(float)
    mean = agg["s"] / n
    var = (agg["ssq"] - n * mean * mean) / (n - 1)
    return pd.DataFrame({
        "l_returnflag": agg["l_returnflag"],
        "cnt": agg["cnt"].astype("int64"),
        "min_qty": agg["mn"].round(2),
        "max_qty": agg["mx"].round(2),
        "mean_qty": mean.round(6),
        "std_qty": np.sqrt(var.clip(lower=0)).round(6),
    }).sort_values("l_returnflag").reset_index(drop=True)


def exact_distinct_count(ds: ray.data.Dataset, col: str, num_buckets: int = 32) -> int:
    """Exact distributed COUNT(DISTINCT col) — delegates to the
    multi-column plan (one packed-blob shuffle; see
    :func:`exact_distinct_counts`)."""
    return exact_distinct_counts(ds, [col], num_buckets=num_buckets)[col]


def exact_distinct_counts(ds: ray.data.Dataset, cols: Sequence[str],
                          num_buckets: int = 32) -> dict[str, int]:
    """Multi-column exact COUNT(DISTINCT): same packed-blob plan as
    :func:`exact_distinct_count` but ONE read and ONE shuffle for all
    columns — blobs are keyed (column, bucket), so per-(col, bucket)
    reducers stay disjoint and their counts sum exactly per column."""
    import pickle

    from anomaly_detection_ray.functions.hashing import hash64

    cols = list(cols)

    def partial(t: pa.Table) -> pa.Table:
        out_c, out_b, out_blob = [], [], []
        for ci, col in enumerate(cols):
            u = pc.unique(t[col]).to_numpy(zero_copy_only=False)
            b = (hash64(u) % np.uint64(num_buckets)).astype(np.int64)
            for bb in np.unique(b):
                out_c.append(ci)
                out_b.append(int(bb))
                out_blob.append(pickle.dumps(u[b == bb]))
        return pa.table({"col": pa.array(out_c, pa.int64()),
                         "bucket": pa.array(out_b, pa.int64()),
                         "blob": pa.array(out_blob, pa.binary())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        vals = np.concatenate([pickle.loads(x) for x in g["blob"]])
        return pd.DataFrame({"col": [int(g["col"].iloc[0])],
                             "n": [len(np.unique(vals))]})

    per = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
           .groupby(["col", "bucket"]).map_groups(merge, batch_format="pandas")
           .to_pandas())
    sums = per.groupby("col")["n"].sum()
    return {col: int(sums.get(ci, 0)) for ci, col in enumerate(cols)}


def distinct_counts(sf_dir: str) -> pd.DataFrame:
    cols = ("l_partkey", "l_suppkey", "l_orderkey")
    ds = sf_table(sf_dir, "lineitem", columns=list(cols))
    n = exact_distinct_counts(ds, cols)
    return pd.DataFrame([{f"distinct_{c}": n[c] for c in cols}])


def distinct_users_exact(sf_dir: str) -> pd.DataFrame:
    """Exact distinct users — the oracled twin of the HLL estimate in
    history.hll_distinct_users (tests tie the two within the HLL bound)."""
    ds = sf_table(sf_dir, "events", columns=["user_id"])
    return pd.DataFrame([{"distinct_user_id": exact_distinct_count(ds, "user_id")}])


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Referential anti-join (J4): bloom pre-pass + exact left_anti."""
    cust = sf_table(sf_dir, "customer", columns=["c_custkey"])
    orders = sf_table(sf_dir, "orders", columns=["o_custkey"])
    orders = orders.map_batches(
        lambda t: pa.table({"c_custkey": t["o_custkey"]}), batch_format="pyarrow")
    orphans = referential_orphans(cust, orders, "c_custkey").to_pandas()
    if "c_custkey" not in orphans.columns:  # empty result loses its schema
        return pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    out = orphans[["c_custkey"]].sort_values("c_custkey").reset_index(drop=True)
    return out.astype({"c_custkey": "int64"})


def top_customers(sf_dir: str) -> pd.DataFrame:
    """Broadcast join (J1/J2): aggregate the fact side, look the small
    dimension up from a ray.put map — no shuffle join."""
    orders = sf_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    agg = grouped_sums(orders, ["o_custkey"], ["o_totalprice"]).to_pandas()
    cust = sf_table(sf_dir, "customer", columns=["c_custkey", "c_name"]).to_pandas()
    name_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))
    names = ray.get(name_ref)
    agg["c_name"] = agg["o_custkey"].map(names)
    agg["revenue"] = agg["o_totalprice"].round(2)
    out = agg.rename(columns={"o_custkey": "c_custkey"})
    out = out.sort_values(["revenue", "c_custkey"], ascending=[False, True]).head(10)
    return out[["c_custkey", "c_name", "revenue"]].reset_index(drop=True)


def revenue_by_orderstatus(sf_dir: str) -> pd.DataFrame:
    """Hash-partitioned large join: lineitem ⋈ orders on the order key,
    expressed as ONE blob shuffle via ``fact_dim_rollup`` (stages/join.py):
    fact blocks pre-aggregate per order key, dim blocks ship key→status
    maps bucketed the same way, bucket reducers join + roll up to 3 rows
    each — no raw row ever shuffles (replaces the Dataset.join version,
    which moved ~3M keyed rows through Ray's sort-based exchange).
    n_items still counts lineitem ROWS (the pre-agg carries the per-key
    row count through the join)."""
    li = sf_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["l_orderkey"],
            "revenue": pc.multiply(t["l_extendedprice"],
                                   pc.subtract(pa.scalar(1.0), t["l_discount"])),
        })

    from anomaly_detection_ray.stages.join import fact_dim_rollup

    orders = sf_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus"])
    agg = fact_dim_rollup(li.map_batches(rev, batch_format="pyarrow"), orders,
                          "o_orderkey", ["revenue"], "o_orderstatus",
                          count_alias="n_rows")
    return pd.DataFrame({
        "o_orderstatus": agg["o_orderstatus"],
        "revenue": agg["revenue"].round(4),
        "n_items": agg["n_rows"].astype("int64"),
    }).sort_values("o_orderstatus").reset_index(drop=True)


def duplicate_user_event_pairs(sf_dir: str) -> pd.DataFrame:
    """Uniqueness-violation shape on a composite key (§2.8)."""
    ds = sf_table(sf_dir, "events", columns=["user_id", "event_type"])
    agg = grouped_sums(ds, ["user_id", "event_type"], []).to_pandas()
    out = agg[agg["__cnt__"] > 1].rename(columns={"__cnt__": "cnt"})
    out["cnt"] = out["cnt"].astype("int64")
    return (out[["user_id", "event_type", "cnt"]]
            .sort_values(["user_id", "event_type"]).reset_index(drop=True))


def hourly_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate: (event_type, hour) → count, sum."""
    ds = sf_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hour": pc.floor_temporal(t["ts"], unit="hour"),
            "value": t["value"],
        })

    agg = grouped_sums(ds.map_batches(prep, batch_format="pyarrow"),
                       ["event_type", "hour"], ["value"]).to_pandas()
    out = pd.DataFrame({
        "event_type": agg["event_type"],
        "hour": pd.to_datetime(agg["hour"]),
        "n_events": agg["__cnt__"].astype("int64"),
        "sum_value": agg["value"].round(2),
    })
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


_ASOF_CUTOFF = pd.Timestamp("2024-01-15")


def asof_latest_value(sf_dir: str) -> pd.DataFrame:
    """S3 as-of shape: last event at or before a cutoff, per user."""
    ds = sf_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    cutoff = pa.scalar(_ASOF_CUTOFF, pa.timestamp("us"))
    ds = ds.map_batches(lambda t: t.filter(pc.less_equal(t["ts"], cutoff)),
                        batch_format="pyarrow")
    df = latest_per_key(ds, "user_id", "ts").to_pandas()
    df["last_value"] = df["value"].round(6)
    return (df.rename(columns={"ts": "last_ts"})[["user_id", "last_ts", "last_value"]]
            .sort_values("user_id").reset_index(drop=True))


def props_k_by_type(sf_dir: str) -> pd.DataFrame:
    """JSON/string extraction (M3 map-lookup analogue): props.k sums."""
    ds = sf_table(sf_dir, "events", columns=["event_type", "props"])

    def extract(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k":\s*(\d+)', expand=False).astype("float64")
        return pd.DataFrame({"event_type": df["event_type"], "k": k})

    agg = grouped_sums(ds.map_batches(extract, batch_format="pandas"),
                       ["event_type"], ["k"]).to_pandas()
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "sum_k": agg["k"].astype("int64"),
        "n_events": agg["__cnt__"].astype("int64"),
    }).sort_values("event_type").reset_index(drop=True)


def exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Exact content dedup: min doc_id kept per distinct text."""
    from anomaly_detection_ray.stages.dedup import exact_dedup

    ds = sf_table(sf_dir, "documents", columns=["doc_id", "text"])
    kept = exact_dedup(ds, ["text"], "doc_id").to_pandas()
    return kept[["doc_id"]].sort_values("doc_id").reset_index(drop=True)
