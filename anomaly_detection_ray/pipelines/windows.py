"""Event-time window operators over the events stream: sessionization,
sliding windows, and a two-stream as-of join.

These are the "custom operators Ray Data lacks" family (build brief:
windowed aggregate / streaming window / as-of join), each expressed as a
composition of vectorized ``map_batches`` partials + ONE bucketed blob
shuffle — the repo's standard answer to Ray's ~30µs/shuffled-row
sort-aggregate (stages/fused.py).  Partitioning assumption, shared by all
three: one USER's events fit one reducer (true by construction for
behavioral streams — a single user's event count is bounded); users are
spread uniformly by ``hash64(user) % num_buckets``.

Each operator has a DuckDB oracle in ``__ray_entry__.oracle_sql`` (lag/
cumsum window functions, range self-join, ASOF JOIN).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from anomaly_detection_ray.functions.hashing import blob_rows_frame, hash64
from anomaly_detection_ray.sources.readers import sf_table

SESSION_GAP_S = 30 * 60


def _user_series_partials(num_buckets: int):
    """Per-block partial: pack each user's rows into per-bucket pickled
    frames keyed by hash64(user) % num_buckets."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        users = df["user_id"].to_numpy()
        buckets = (hash64(users.astype(object)) % np.uint64(num_buckets)).astype(np.int64)
        rows = [(int(b), pickle.dumps(df[buckets == b]))
                for b in np.unique(buckets)]
        return blob_rows_frame(rows)

    return partial


def session_windows(sf_dir: str, gap_s: float = SESSION_GAP_S) -> pd.DataFrame:
    """Sessionization: per user, events sorted by time split into sessions
    wherever the gap to the previous event exceeds ``gap_s``.  Emits one
    row per session with start/end/count/value-sum.

    Shape: vectorized per-block bucket partials → ONE groupby over
    O(blocks × buckets) blob rows → per-bucket vectorized sessionize
    (sort + diff + cumsum, no Python loop over events)."""
    num_buckets = 32
    ds = sf_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        cat = pd.concat([pickle.loads(b) for b in g["blob"]], ignore_index=True)
        cat = cat.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = cat["user_id"].ne(cat["user_id"].shift()).to_numpy()
        gap = cat["ts"].diff().dt.total_seconds().to_numpy()
        new_session = new_user | np.isnan(gap) | (gap > gap_s)
        sid = np.cumsum(new_session)
        out = (cat.assign(__sid=sid)
               .groupby(["user_id", "__sid"], as_index=False, sort=False)
               .agg(session_start=("ts", "min"), session_end=("ts", "max"),
                    n_events=("ts", "size"), sum_value=("value", "sum")))
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(2)
        return out.drop(columns="__sid")

    parts = ds.map_batches(_user_series_partials(num_buckets),
                           batch_format="pandas", batch_size=65536)
    out = parts.groupby("bucket").map_groups(sessionize, batch_format="pandas").to_pandas()
    if out.empty:  # empty stream: keep the typed schema
        return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                             "session_start": pd.Series(dtype="datetime64[us]"),
                             "session_end": pd.Series(dtype="datetime64[us]"),
                             "n_events": pd.Series(dtype="int64"),
                             "sum_value": pd.Series(dtype="float64")})
    return (out.sort_values(["user_id", "session_start"])
            .reset_index(drop=True))


def sliding_window_counts(sf_dir: str, window_hours: int = 3) -> pd.DataFrame:
    """Sliding-window aggregate: per event_type and hour h, the count and
    value-sum of events in (h − window, h] — a rolling sum over the dense
    hourly series.

    Shape: the heavy data reduces to per-(type, hour) partial sums via the
    blob combiner (grouped_sums); the rolling pass then runs over the TINY
    dense hourly series per type — O(types × hours), row-count
    independent."""
    from anomaly_detection_ray.pipelines.relational import grouped_sums

    ds = sf_table(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hour": pc.floor_temporal(t["ts"], unit="hour"),
            "value": t["value"],
        })

    hourly = grouped_sums(ds.map_batches(prep, batch_format="pyarrow"),
                          ["event_type", "hour"], ["value"]).to_pandas()
    out_frames = []
    for et, g in hourly.groupby("event_type"):
        g = g.sort_values("hour").set_index("hour")
        dense = g.reindex(pd.date_range(g.index.min(), g.index.max(), freq="h"),
                          fill_value=0.0)
        roll = dense[["value", "__cnt__"]].rolling(window_hours, min_periods=1).sum()
        out_frames.append(pd.DataFrame({
            "event_type": et,
            "hour": dense.index,
            "n_events": roll["__cnt__"].astype("int64").to_numpy(),
            "sum_value": roll["value"].round(2).to_numpy(),
        }))
    if not out_frames:
        return pd.DataFrame({"event_type": pd.Series(dtype=object),
                             "hour": pd.Series(dtype="datetime64[us]"),
                             "n_events": pd.Series(dtype="int64"),
                             "sum_value": pd.Series(dtype="float64")})
    out = pd.concat(out_frames, ignore_index=True)
    # emit only hours with ≥1 event in the window (dense zeros are noise)
    out = out[out["n_events"] > 0]
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def asof_join_events(sf_dir: str, probe_type: str = "click",
                     build_type: str = "purchase") -> pd.DataFrame:
    """Two-stream AS-OF join: for each ``probe_type`` event, the latest
    ``build_type`` event of the SAME user at or before it (classic
    point-in-time feature lookup; DuckDB oracle: ASOF JOIN).

    Shape: both streams bucket by user through ONE shared shuffle (the
    probe/build tag rides the blob), each reducer runs a vectorized
    merge: sort both sides by ts, ``np.searchsorted`` per user segment —
    no Python loop over events."""
    num_buckets = 32
    ds = sf_table(sf_dir, "events",
                  columns=["event_id", "user_id", "ts", "event_type", "value"])
    keep = pa.array([probe_type, build_type])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["event_type"], value_set=keep)),
        batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        users = df["user_id"].to_numpy()
        buckets = (hash64(users.astype(object)) % np.uint64(num_buckets)).astype(np.int64)
        rows = [(int(b), pickle.dumps(df[buckets == b]))
                for b in np.unique(buckets)]
        return blob_rows_frame(rows)

    empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                          "user_id": pd.Series(dtype="int64"),
                          "ts": pd.Series(dtype="datetime64[us]"),
                          "last_build_ts": pd.Series(dtype="datetime64[us]"),
                          "last_build_value": pd.Series(dtype="float64")})

    def merge_asof(g: pd.DataFrame) -> pd.DataFrame:
        cat = pd.concat([pickle.loads(b) for b in g["blob"]], ignore_index=True)
        probe = cat[cat["event_type"] == probe_type]
        build = cat[cat["event_type"] == build_type]
        if probe.empty:
            return empty.copy()
        # deterministic tie-break: per (user, ts) keep the max-event_id
        # build row (oracle mirrors with arg_max(value, event_id))
        build = (build.sort_values(["user_id", "ts", "event_id"])
                 .groupby(["user_id", "ts"], as_index=False).last())
        build = build.assign(bts=build["ts"])
        # merge_asof: both sides sorted by the on-key; per-user matching in C
        probe = probe.sort_values("ts", kind="mergesort")
        build = build.sort_values("ts", kind="mergesort")
        m = pd.merge_asof(
            probe, build[["user_id", "ts", "bts", "value"]],
            on="ts", by="user_id", suffixes=("", "_b"), direction="backward")
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["user_id"].astype("int64"),
            "ts": m["ts"],
            "last_build_ts": m["bts"],
            "last_build_value": m["value_b"].round(6),
        })

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    out = parts.groupby("bucket").map_groups(merge_asof, batch_format="pandas").to_pandas()
    if out.empty:  # no probe events anywhere: keep the typed schema
        return empty
    return out.sort_values("event_id").reset_index(drop=True)
