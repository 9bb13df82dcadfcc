"""K4 visualization: bar-color rule, window shading, grouping, exclusion
of Unknown/Skipped, and create-once dashboard semantics (reference
visualization/visualization.py + dashboard.py)."""

import numpy as np
import pandas as pd

from anomaly_detection_ray.visualization import (
    SCENARIO_COLOR_MAP,
    build_plot_rows,
    create_dashboard_if_not_exists,
    dashboard_url,
    decide_bar_color,
    plot_freshness_summary,
    render_freshness_svg,
)

EVAL = pd.Timestamp("2025-08-01 12:30")


def _verdicts(n=3, status="Healthy"):
    return pd.DataFrame({
        "partition_id": [f"p{i:04d}" for i in range(n)],
        "status": [status] * n,
        "evaluated_at": [EVAL] * n,
        "predicted_next_ts": [EVAL.timestamp() + 600] * n,
        "predicted_upper_bound_ts": [EVAL.timestamp() + 7200] * n,
    })


def _history(n=3, commits_per_hour=1):
    rows = []
    for i in range(n):
        for h in range(48):
            for c in range(commits_per_hour):
                rows.append({"partition_id": f"p{i:04d}",
                             "timestamp": EVAL - pd.Timedelta(hours=h, minutes=c)})
    return pd.DataFrame(rows)


class TestBarColor:
    def test_reference_breakpoints(self):
        # visualization.py:45-64: 0 / 1 / 2-6 / 7+ buckets
        assert decide_bar_color(0) == "#EDF0F3"
        assert decide_bar_color(1) == "#44C970"
        assert decide_bar_color(2) == decide_bar_color(6) == "#277C43"
        assert decide_bar_color(7) == decide_bar_color(100) == "#054B1C"


class TestPlotRows:
    def test_unknown_and_skipped_excluded(self):
        v = _verdicts(4)
        v.loc[1, "status"] = "Unknown"
        v.loc[2, "status"] = "Skipped"
        rows = build_plot_rows(v, _history(4))
        assert [r.name for r in rows] == ["p0000", "p0003"]

    def test_hourly_counts_and_window(self):
        rows = build_plot_rows(_verdicts(1), _history(1, commits_per_hour=3))
        r = rows[0]
        # 7-day + 1-day window at hourly grain
        assert r.hourly_counts.index[0] == EVAL.floor("h") - pd.Timedelta(days=7)
        assert r.hourly_counts.index[-1] == EVAL.floor("h") + pd.Timedelta(days=1)
        # the populated 48h carry 3 commits/hour
        assert r.hourly_counts.max() == 3
        assert r.last_update == EVAL


class TestSvg:
    def test_fresh_gets_predicted_window_stale_gets_stale_window(self):
        fresh = render_freshness_svg(build_plot_rows(_verdicts(1, "Healthy"),
                                                     _history(1)))
        stale = render_freshness_svg(build_plot_rows(_verdicts(1, "Unhealthy"),
                                                     _history(1)))
        assert SCENARIO_COLOR_MAP["predicted_window"] in fresh
        assert SCENARIO_COLOR_MAP["stale_window"] not in fresh
        assert SCENARIO_COLOR_MAP["stale_window"] in stale
        # commit bars + now line present in both
        for svg in (fresh, stale):
            assert decide_bar_color(1) in svg
            assert "stroke-dasharray" in svg

    def test_grouping_of_ten_per_figure(self, tmp_path):
        out = str(tmp_path / "report.html")
        nfigs = plot_freshness_summary(_verdicts(23), _history(23), out)
        assert nfigs == 3  # ceil(23 / 10)
        content = open(out).read()
        assert content.count("<svg") == 3
        assert "p0022" in content


class TestDashboard:
    def test_create_once(self, tmp_path):
        root = str(tmp_path)
        v = _verdicts(2)
        v["quality_check_type"] = "freshness"
        p1 = create_dashboard_if_not_exists(root, v)
        mtime = __import__("os").path.getmtime(p1)
        p2 = create_dashboard_if_not_exists(root, _verdicts(5))
        assert p1 == p2
        assert __import__("os").path.getmtime(p2) == mtime  # not recreated
        assert "Quality Overview" in open(p1).read()
        assert "logging_table=mytable" in dashboard_url(p1, "mytable")
