"""Verdict rules F6-F14 as pure functions on toy series — the golden
semantics carried from the reference (thresholds cited in
anomaly_detection_ray/config.py)."""

import numpy as np
import pytest

from anomaly_detection_ray.functions.forecast import (
    fit_ar,
    infer_period,
    synthesize_training_data,
)
from anomaly_detection_ray.functions.verdicts import (
    HEALTHY,
    UNHEALTHY,
    UNKNOWN,
    check_commit_freshness,
    check_completeness,
    check_event_freshness,
    commit_grace_seconds,
    event_grace_seconds,
    format_duration,
)

rng = np.random.default_rng(7)
BASE = 1_700_000_000.0


def hourly(n=300, jitter=60):
    return BASE + np.cumsum(rng.normal(3600, jitter, n))


class TestCommitFreshness:
    def test_on_time_is_healthy(self):
        ts = hourly()
        assert check_commit_freshness(ts, ts[-1] + 1800).status == HEALTHY

    def test_very_late_is_unhealthy(self):
        ts = hourly()
        v = check_commit_freshness(ts, ts[-1] + 48 * 3600)
        assert v.status == UNHEALTHY
        assert v.staleness_age_seconds > 0

    def test_single_point_unknown(self):
        v = check_commit_freshness(np.array([BASE]), BASE + 10)
        assert v.status == UNKNOWN
        assert v.error_code == "NOT_ENOUGH_UPDATE_OPERATIONS"

    def test_empty_unknown(self):
        assert check_commit_freshness(np.array([]), BASE).status == UNKNOWN

    def test_static_table_short_circuit(self):
        # reference F10: >30 days old → Fresh/Healthy without prediction
        ts = hourly(50)
        v = check_commit_freshness(ts, ts[-1] + 31 * 86400)
        assert v.status == HEALTHY and v.is_static

    def test_static_beats_constant_threshold(self):
        # reference dispatcher (freshness_utils.py:674-683): the static check
        # runs FIRST — a >30-day-old table with a constant threshold is still
        # Fresh, not Unhealthy.
        ts = hourly(50)
        v = check_commit_freshness(ts, ts[-1] + 31 * 86400,
                                   constant_threshold_seconds=600)
        assert v.status == HEALTHY and v.is_static

    def test_constant_threshold_override(self):
        # reference F8: Fresh iff eval ≤ last + threshold
        ts = hourly(10)
        ok = check_commit_freshness(ts, ts[-1] + 500, constant_threshold_seconds=600)
        bad = check_commit_freshness(ts, ts[-1] + 700, constant_threshold_seconds=600)
        assert ok.status == HEALTHY and bad.status == UNHEALTHY
        assert bad.staleness_age_seconds == pytest.approx(100, abs=1)

    def test_grace_period_bounds(self):
        # reference F11 exact breakpoints
        fast = np.full(100, 600.0)       # 10-min cadence
        assert commit_grace_seconds(fast) == pytest.approx(15 * 60)  # floor
        slow = np.full(100, 4 * 86400.0)  # 4-day cadence
        assert commit_grace_seconds(slow) == pytest.approx(12 * 3600)  # cap
        mid = np.full(100, 2 * 3600.0)
        assert commit_grace_seconds(mid) == pytest.approx(3600)  # 0.5·Δmed
        # event variant (reference: branch at median<60min, floor 30min)
        lat_fast = np.full(50, 100.0)
        assert event_grace_seconds(lat_fast) == pytest.approx(30 * 60)  # floor
        lat_mid = np.full(50, 45 * 60.0)   # 45-min median latency
        assert event_grace_seconds(lat_mid) == pytest.approx(45 * 60)  # = median
        lat_slow = np.full(50, 4 * 86400.0)
        assert event_grace_seconds(lat_slow) == pytest.approx(12 * 3600)  # cap

    def test_max_grace_testing_hook(self):
        # reference model_config.py:14-15: testing hook caps the grace
        ts = hourly()
        # eval at +75 min: inside the 30-min grace window, outside the bare CI
        loose = check_commit_freshness(ts, ts[-1] + 4500)
        tight = check_commit_freshness(ts, ts[-1] + 4500, max_grace_period_minutes=0)
        assert loose.status == HEALTHY
        assert tight.status == UNHEALTHY


class TestEventFreshness:
    def test_latency_within_bound(self):
        lat = rng.normal(600, 30, 50)
        assert check_event_freshness(lat, 620).status == HEALTHY
        assert check_event_freshness(lat, 3 * 86400).status == UNHEALTHY

    def test_too_few_points(self):
        assert check_event_freshness(np.array([1.0, 2.0]), 1.0).status == UNKNOWN

    def test_constant_override(self):
        assert check_event_freshness(np.array([]), 50,
                                     constant_threshold_seconds=60).status == HEALTHY
        assert check_event_freshness(np.array([]), 70,
                                     constant_threshold_seconds=60).status == UNHEALTHY

    def test_grace_is_additive_on_ci_upper(self):
        # reference freshness_utils.py:594-596: event bound = int(CI upper +
        # grace), strictly looser than max(CI, forecast+grace).  A latency
        # just above the bare CI upper but within CI+grace must be Healthy.
        lat = rng.normal(600, 30, 50)
        v_ok = check_event_freshness(lat, 620)
        from anomaly_detection_ray.functions.forecast import fit_ar
        res = fit_ar(np.asarray(lat[:-1], dtype=float)).predict_next(3.0)
        probe = res.upper + 10 * 60  # above CI, inside the 30-min floor grace
        v = check_event_freshness(lat, probe)
        assert v.status == HEALTHY
        assert v_ok.predicted_upper_bound_ts == pytest.approx(
            int(res.upper + 30 * 60))


class TestCompleteness:
    def test_normal_volume_healthy(self):
        vols = np.concatenate([rng.normal(1000, 25, 30), [995]])
        assert check_completeness(vols, num_commits=100).status == HEALTHY

    def test_big_drop_unhealthy(self):
        vols = np.concatenate([rng.normal(1000, 25, 30), [300]])
        v = check_completeness(vols, num_commits=100)
        assert v.status == UNHEALTHY
        assert v.predicted_lower_bound >= 0  # reference F13 max(int(lower),0)

    def test_guards(self):
        # <2 commits → NOT_ENOUGH_UPDATE_OPERATIONS (reference F13 guard)
        v = check_completeness(rng.normal(100, 5, 20), num_commits=1)
        assert v.status == UNKNOWN and v.error_code == "NOT_ENOUGH_UPDATE_OPERATIONS"
        # ≤7 buckets → NOT_ENOUGH_TABLE_HISTORY
        v = check_completeness(rng.normal(100, 5, 7), num_commits=50)
        assert v.status == UNKNOWN and v.error_code == "NOT_ENOUGH_TABLE_HISTORY"

    def test_constant_threshold(self):
        vols = np.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 5.0])
        assert check_completeness(vols, constant_threshold=4).status == HEALTHY
        assert check_completeness(vols, constant_threshold=6).status == UNHEALTHY

    def test_guards_precede_override(self):
        # reference order (completeness_utils.py:117-155): the history
        # guards run BEFORE the table_threshold_overrides dispatch
        short = np.array([10.0, 20.0, 5.0])
        v = check_completeness(short, constant_threshold=4)
        assert v.status == UNKNOWN and v.error_code == "NOT_ENOUGH_TABLE_HISTORY"
        v = check_completeness(np.ones(20) * 5, num_commits=1, constant_threshold=4)
        assert v.status == UNKNOWN and v.error_code == "NOT_ENOUGH_UPDATE_OPERATIONS"


class TestForecaster:
    def test_seasonality_inferred(self):
        x = np.tile([10, 20, 30, 40, 50, 60, 70], 30) + rng.normal(0, 0.3, 210)
        assert infer_period(x) == 7

    def test_synth_is_deterministic(self):
        x = np.tile([100.0, 200.0, 300.0], 10)
        a = synthesize_training_data(x, 3)
        b = synthesize_training_data(x, 3)
        assert np.array_equal(a, b)
        assert a.size >= 250

    def test_ar_forecast_tracks_level(self):
        x = rng.normal(500, 10, 300)
        res = fit_ar(x).predict_next()
        assert 450 < res.forecast < 550
        assert res.lower < res.forecast < res.upper

    def test_warm_update(self):
        m = fit_ar(rng.normal(100, 5, 100))
        n0 = m.history.size
        m.update(np.array([101.0, 99.0]))
        assert m.history.size == n0 + 2
        assert 80 < m.predict_next().forecast < 120


class TestFourierPath:
    """Reference use_fourier_transform parity (model_config.py:89-90 +
    common_utils.py:307-315): Fourier harmonics of the ACF-inferred period
    race the plain/seasonal-lag candidates on BIC (fit_multiple_models)."""

    def _seasonal(self, n=120, period=12):
        t = np.arange(n, dtype=float)
        noise = np.sin(t * 977.0) * 1.5  # deterministic pseudo-noise
        return 100.0 + 30.0 * np.sin(2 * np.pi * t / period) + noise, t

    def test_fourier_wins_on_seasonal_series(self):
        x, t = self._seasonal()
        m = fit_ar(x, use_fourier=True, use_synth=False)
        assert m.fourier_k >= 1
        plain = fit_ar(x, use_fourier=False, use_synth=False)
        assert m.residual_std < plain.residual_std
        truth = 100.0 + 30.0 * np.sin(2 * np.pi * len(x) / 12)
        assert abs(m.predict_next().forecast - truth) < 8.0

    def test_warm_update_keeps_phase(self):
        x, t = self._seasonal()
        m = fit_ar(x, use_fourier=True, use_synth=False)
        nxt = np.array([100.0 + 30.0 * np.sin(2 * np.pi * len(x) / 12)])
        m.update(nxt)
        truth = 100.0 + 30.0 * np.sin(2 * np.pi * (len(x) + 1) / 12)
        assert abs(m.predict_next().forecast - truth) < 8.0

    def test_non_seasonal_series_stays_plain(self):
        x = rng.normal(500, 10, 300)  # period inferred 1 -> no harmonics
        m = fit_ar(x, use_fourier=True)
        assert m.fourier_k == 0

    def test_default_path_unchanged(self):
        x = np.tile([10, 20, 30, 40, 50, 60, 70], 30) + rng.normal(0, 0.3, 210)
        a = fit_ar(x)
        b = fit_ar(x, use_fourier=False)
        assert a.fourier_k == 0 and b.fourier_k == 0
        assert np.array_equal(a.coef, b.coef) and a.lags == b.lags

    def test_checker_passthrough_and_config_roundtrip(self):
        from anomaly_detection_ray.config import ForecastConfig
        from anomaly_detection_ray.functions.verdicts import check_completeness

        x, _ = self._seasonal(n=60)
        v = check_completeness(np.append(x, 100.0), num_commits=60,
                               use_fourier=True)
        assert v.status in ("Healthy", "Unhealthy")
        cfg = ForecastConfig(use_fourier_transform=True)
        assert ForecastConfig.from_dict(cfg.to_dict()).use_fourier_transform


def test_format_duration():
    # reference M6 semantics (freshness_utils.py:58-81)
    assert format_duration(None) is None
    assert format_duration(45) == "45 sec"
    assert format_duration(3660) == "1 hr 1 min"
    assert format_duration(90061) == "1 day(s) 1 hr 1 min"


class TestBacktest:
    def test_regular_cadence_all_healthy_and_warm(self):
        from anomaly_detection_ray.functions.verdicts import (
            backtest_commit_freshness,
            backtest_quality,
        )

        ts = 1_700_000_000.0 + 3600.0 * np.arange(200)  # hourly commits
        grid = ts[-1] - 6 * 3600.0 * np.arange(9, -1, -1)
        rows = backtest_commit_freshness(ts, grid)
        assert all(r["status"] == "Healthy" for r in rows)
        # first eval fits cold, later ones thread the warm model
        assert rows[0]["warm"] is False and any(r["warm"] for r in rows[1:])
        q = backtest_quality(rows)
        assert q["n_scored"] > 0
        # hourly cadence is perfectly predictable → error ≪ one period
        assert q["rmse_seconds"] < 600

    def test_stalled_partition_goes_unhealthy(self):
        from anomaly_detection_ray.functions.verdicts import backtest_commit_freshness

        ts = 1_700_000_000.0 + 3600.0 * np.arange(100)  # stops after ~4 days
        grid = ts[-1] + 86400.0 * np.arange(1, 4)  # evals a day+ after stall
        rows = backtest_commit_freshness(ts, grid)
        assert all(r["status"] == "Unhealthy" for r in rows)

    def test_too_few_points_unknown(self):
        from anomaly_detection_ray.functions.verdicts import backtest_commit_freshness

        rows = backtest_commit_freshness(np.array([1_700_000_000.0]),
                                         np.array([1_700_100_000.0]))
        assert rows[0]["status"] == "Unknown"

    def test_retrain_cycle(self):
        from anomaly_detection_ray.functions.verdicts import backtest_commit_freshness

        ts = 1_700_000_000.0 + 1800.0 * np.arange(400)
        grid = ts[-1] - 3600.0 * np.arange(24, 0, -1)
        rows = backtest_commit_freshness(ts, grid, retrain_every=5)
        cold = [i for i, r in enumerate(rows) if not r["warm"]]
        assert cold[0] == 0 and len(cold) >= 4  # retrain every 5 evals

    def test_warm_model_keeps_updating_past_train_cap(self, monkeypatch):
        # Regression for the frozen-warm-model bug: once the max_train cap is
        # hit the duration array shifts left at constant length, so a
        # count-based slice would go empty and model.update would never fire.
        # The timestamp-watermark threading must keep feeding new durations.
        from anomaly_detection_ray.functions import forecast
        from anomaly_detection_ray.functions.verdicts import backtest_commit_freshness

        update_calls = []
        orig_update = forecast.ARModel.update

        def spy(self, durations):
            update_calls.append(len(np.atleast_1d(durations)))
            return orig_update(self, durations)

        monkeypatch.setattr(forecast.ARModel, "update", spy)
        ts = 1_700_000_000.0 + 1800.0 * np.arange(3000)  # 30-min cadence
        # grid of hourly evals late in the series: every window is capped at
        # max_train=20 durations, so each eval sees a full, shifted window
        grid = ts[-1] - 3600.0 * np.arange(10, 0, -1)
        backtest_commit_freshness(ts, grid, retrain_every=1000, max_train=20)
        # one warm update per post-cold eval, each fed the ~2 new durations
        assert len(update_calls) == 9
        assert all(n >= 1 for n in update_calls)


class TestCadenceBucket:
    def test_reference_buckets_verbatim(self):
        # reference freshness_checker.py:284-301 thresholds
        from anomaly_detection_ray.functions.verdicts import (
            backtest_cadence_bucket_hours,
        )

        t0 = 1_700_000_000.0
        hourly = t0 + 3600.0 * np.arange(50)
        assert backtest_cadence_bucket_hours(hourly) == 6
        twelve = t0 + 12 * 3600.0 * np.arange(50)  # boundary: ≤ 12h → 6h
        assert backtest_cadence_bucket_hours(twelve) == 6
        daily = t0 + 86400.0 * np.arange(50)
        assert backtest_cadence_bucket_hours(daily) == 24
        half_week = t0 + 3.5 * 86400.0 * np.arange(50)  # boundary → 24h
        assert backtest_cadence_bucket_hours(half_week) == 24
        monthly = t0 + 30 * 86400.0 * np.arange(10)
        assert backtest_cadence_bucket_hours(monthly) == 168
        assert backtest_cadence_bucket_hours(np.array([t0])) == 6  # no cadence

    def test_backtest_grid_follows_partition_cadence(self, ray_session, tmp_path):
        """backtest_freshness picks each partition's grid from ITS median
        cadence: an hourly partition evaluates on a 6h grid, a daily one
        on 24h — and an explicit eval_interval_s pins both."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from anomaly_detection_ray.pipelines.history import backtest_freshness

        t_end = 1_700_000_000.0
        rows = []
        for pid, step, n in [("hourly", 3600.0, 400), ("daily", 86400.0, 90)]:
            for ts in t_end - step * np.arange(n):
                rows.append({"partition_id": pid,
                             "timestamp": int(ts * 1e6),
                             "operation": "WRITE",
                             "operationMetrics": {"numOutputRows": "5"}})
        path = str(tmp_path / "hist")
        pq.write_table(pa.Table.from_pylist(rows), path + ".parquet")
        out = backtest_freshness(path + ".parquet", eval_end_ts=t_end,
                                 num_evals=6)
        by = out.groupby("partition_id")["interval_hr"].first()
        assert by["hourly"] == 6 and by["daily"] == 24
        # grid spacing in eval_ts matches the per-partition interval
        for pid, hrs in [("hourly", 6), ("daily", 24)]:
            ev = np.sort(out.loc[out["partition_id"] == pid, "eval_ts"].unique())
            assert np.allclose(np.diff(ev), hrs * 3600.0)
        pinned = backtest_freshness(path + ".parquet", eval_end_ts=t_end,
                                    num_evals=6, eval_interval_s=6 * 3600.0)
        assert set(pinned["interval_hr"]) == {6}


class TestBlastRadius:
    def test_impact_thresholds_verbatim(self):
        from anomaly_detection_ray.functions.blast_radius import determine_impact_level

        assert [determine_impact_level(n) for n in (0, 30, 31, 300, 301, 3000, 3001)] == \
            [1, 1, 2, 2, 3, 3, 4]

    def test_closure_bfs_and_cycles(self):
        from anomaly_detection_ray.functions.blast_radius import downstream_closure

        lineage = {"a": ["b", "c"], "b": ["d"], "c": ["d"], "d": ["a"]}  # cycle back
        assert downstream_closure(lineage, "a") == ["a", "b", "c", "d"]
        assert downstream_closure(lineage, "d") == ["d", "a", "b", "c"]
        assert downstream_closure({}, "x") == ["x"]

    def test_get_blast_radius(self):
        from anomaly_detection_ray.functions.blast_radius import get_blast_radius

        lineage = {"p0": ["gold", "ml"], "gold": ["dash"]}
        pop = {"p0": 5, "gold": 200, "dash": 2000, "ml": 1}
        br = get_blast_radius("p0", lineage, pop)
        assert br.num_downstream_tables == 3
        assert br.num_queries_on_affected_tables == 2206
        assert br.impact_level == 3


def test_clone_contributes_zero_volume():
    # reference completeness_utils operation_to_metric omits CLONE: it is a
    # whitelisted update op (freshness) but adds 0 rows (completeness).
    from anomaly_detection_ray.pipelines.history import _row_volume

    assert _row_volume("CLONE", {"numOutputRows": "500"}) == 0
    assert _row_volume("WRITE", {"numOutputRows": "500"}) == 500
    assert _row_volume("MERGE", {"numTargetRowsInserted": "10",
                                 "numDeletedRows": "3"}) == 7
