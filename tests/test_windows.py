"""Event-time window operators: sessionization gap semantics, sliding
windows, as-of join — planted-scenario tests plus DuckDB cross-checks on
the real testdata (the oracle gate runs them again at sf0.01)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from anomaly_detection_ray.pipelines.windows import (
    asof_join_events,
    session_windows,
    sliding_window_counts,
)

BASE = pd.Timestamp("2024-03-01 00:00:00")


def _norm_dt(df):
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df




@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """Two users with known session structure and a click/purchase
    interleaving with known as-of matches."""
    rows = []

    def ev(uid, minutes, etype, value, eid):
        rows.append({"event_id": eid, "ts": BASE + pd.Timedelta(minutes=minutes),
                     "user_id": uid, "event_type": etype, "value": float(value),
                     "props": "{}"})

    # user 1: events at 0,10,20 | gap 40min | 60,70  → two sessions (3, 2)
    for i, m in enumerate([0, 10, 20, 60, 70]):
        ev(1, m, "view", 1.0, i)
    # user 2: single event → one session
    ev(2, 5, "view", 2.0, 10)
    # as-of scenario, user 3: purchases at 0 and 30; clicks at 15, 30, 45, and
    # one click at minute 10 of the NEXT day with no later purchase
    ev(3, 0, "purchase", 100.0, 20)
    ev(3, 30, "purchase", 200.0, 21)
    ev(3, 15, "click", 0.0, 22)   # → purchase@0
    ev(3, 30, "click", 0.0, 23)   # ties ts with purchase@30 → that one (>=)
    ev(3, 45, "click", 0.0, 24)   # → purchase@30
    ev(4, 50, "click", 0.0, 25)   # user 4 has no purchases → null match
    d = tmp_path_factory.mktemp("win")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), str(d / "events.parquet"))
    return str(d)


class TestSessionWindows:
    def test_planted_sessions(self, planted_dir):
        out = session_windows(planted_dir)
        u1 = out[out["user_id"] == 1]
        assert u1["n_events"].tolist() == [3, 2]
        assert u1["session_start"].iloc[1] == BASE + pd.Timedelta(minutes=60)
        u2 = out[out["user_id"] == 2]
        assert len(u2) == 1 and u2["n_events"].iloc[0] == 1

    def test_exact_gap_boundary_stays_one_session(self, tmp_path):
        # gap of exactly 30min does NOT split (strict > semantics, both sides)
        rows = [{"event_id": i, "ts": BASE + pd.Timedelta(minutes=30 * i),
                 "user_id": 1, "event_type": "view", "value": 1.0, "props": "{}"}
                for i in range(4)]
        d = tmp_path / "gap"
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)),
                       str(d / "events.parquet"))
        out = session_windows(str(d))
        assert len(out) == 1 and out["n_events"].iloc[0] == 4

    def test_matches_duckdb_oracle(self, planted_dir):
        import duckdb

        import __ray_entry__ as mod

        sql = mod.oracle_sql()["session_windows"].replace(
            "FROM events", f"FROM '{planted_dir}/events.parquet'")
        oracle = duckdb.sql(sql).df()
        ours = session_windows(planted_dir)
        pd.testing.assert_frame_equal(
            _norm_dt(ours).reset_index(drop=True),
            _norm_dt(oracle[ours.columns]).reset_index(drop=True),
            check_dtype=False)


class TestSlidingWindow:
    def test_rolling_sums(self, tmp_path):
        # type A: 1 event in each of hours 0, 1, 2, 5 → 3h window counts
        rows = [{"event_id": i, "ts": BASE + pd.Timedelta(hours=h),
                 "user_id": 1, "event_type": "A", "value": 10.0, "props": "{}"}
                for i, h in enumerate([0, 1, 2, 5])]
        d = tmp_path / "slide"
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)),
                       str(d / "events.parquet"))
        out = sliding_window_counts(str(d), window_hours=3)
        got = dict(zip(out["hour"], out["n_events"]))
        assert got[BASE] == 1
        assert got[BASE + pd.Timedelta(hours=1)] == 2
        assert got[BASE + pd.Timedelta(hours=2)] == 3
        assert got[BASE + pd.Timedelta(hours=3)] == 2  # events at h1, h2
        assert got[BASE + pd.Timedelta(hours=4)] == 1
        assert got[BASE + pd.Timedelta(hours=5)] == 1


class TestAsofJoin:
    def test_planted_matches(self, planted_dir):
        out = asof_join_events(planted_dir)
        by_id = out.set_index("event_id")
        assert by_id.loc[22, "last_build_value"] == 100.0
        # tie at the same timestamp: >= semantics match the later purchase
        assert by_id.loc[23, "last_build_value"] == 200.0
        assert by_id.loc[24, "last_build_value"] == 200.0
        assert pd.isna(by_id.loc[25, "last_build_value"])  # user 4: no build
        assert pd.isna(by_id.loc[25, "last_build_ts"])

    def test_matches_duckdb_oracle(self, planted_dir):
        import duckdb

        import __ray_entry__ as mod

        sql = mod.oracle_sql()["asof_join_events"].replace(
            "FROM events", f"FROM '{planted_dir}/events.parquet'")
        oracle = duckdb.sql(sql).df()
        ours = asof_join_events(planted_dir)
        pd.testing.assert_frame_equal(
            _norm_dt(ours).reset_index(drop=True),
            _norm_dt(oracle[ours.columns]).reset_index(drop=True),
            check_dtype=False)


class TestEmptyStreams:
    def test_empty_inputs_keep_schema(self, tmp_path):
        # a table with no matching events must return typed empty frames
        rows = [{"event_id": 0, "ts": BASE, "user_id": 1,
                 "event_type": "other", "value": 1.0, "props": "{}"}]
        d = tmp_path / "empty"
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)),
                       str(d / "events.parquet"))
        a = asof_join_events(str(d))  # no clicks, no purchases
        assert list(a.columns) == ["event_id", "user_id", "ts",
                                   "last_build_ts", "last_build_value"]
        assert len(a) == 0
