"""K4 visualization: past-week commit-heat strips + freshness windows,
rendered as dependency-free SVG/HTML (the sandbox has no plotly; the
observable semantics mirror the reference exactly —
visualization/visualization.py:17-30 color map, :45-64 bar-color rule,
:67-130 predicted/stale window shading, :350-381 7-day window, groups of
``n_tables_per_plot``, Unknown/Skipped excluded — while the renderer is a
plain SVG writer).

Dashboard parity (visualization/dashboard.py:72-97): one dashboard per
"workspace" (here: a shared output root), created only if absent, id
returned; the engine has no BI service, so the dashboard is a static HTML
page over the latest verdicts.
"""

from __future__ import annotations

import html
import os
from dataclasses import dataclass
from typing import Optional

import numpy as np
import pandas as pd

#: reference SCENARIO_COLOR_MAP verbatim (observable output contract)
SCENARIO_COLOR_MAP = {
    "past_update_0_commits": "#EDF0F3",
    "past_update_1_commit": "#44C970",
    "past_update_2_6_commits": "#277C43",
    "past_update_7+_commits": "#054B1C",
    "stale_window": "rgba(250, 203, 102, 0.5)",
    "predicted_window": "rgba(138, 202, 255, 0.5)",
    "now": "grey",
    "background": "white",
    "day_divider": "#e8e8e8",
}

LOOKBACK_DAYS = 7
N_TABLES_PER_PLOT = 10

_ROW_H = 28       # px per table row
_BAR_H = 18
_LEFT = 230       # left margin for labels
_PX_PER_HOUR = 5


def decide_bar_color(count: int) -> str:
    """Reference _decide_bar_color (visualization.py:45-64) verbatim."""
    if count == 0:
        return SCENARIO_COLOR_MAP["past_update_0_commits"]
    if count == 1:
        return SCENARIO_COLOR_MAP["past_update_1_commit"]
    if 2 <= count <= 6:
        return SCENARIO_COLOR_MAP["past_update_2_6_commits"]
    return SCENARIO_COLOR_MAP["past_update_7+_commits"]


@dataclass
class FreshnessPlotRow:
    """One table's strip (reference PlotData, visualization.py:33-42)."""

    name: str
    status: str                       # Healthy/Fresh | Unhealthy/Stale
    hourly_counts: pd.Series          # indexed by hour over the window
    last_update: Optional[pd.Timestamp]
    evaluated_at: pd.Timestamp
    predicted_next: Optional[pd.Timestamp] = None
    predicted_upper: Optional[pd.Timestamp] = None


def build_plot_rows(
    verdicts: pd.DataFrame,
    history: pd.DataFrame,
    *,
    partition_col: str = "partition_id",
    ts_col: str = "timestamp",
) -> list[FreshnessPlotRow]:
    """Join freshness verdicts with commit history into plot rows.

    Unknown/Skipped verdicts are excluded (reference
    plot_freshness_summary:357-361); the hourly window is the 7 days up to
    the latest evaluated_at, floored to the hour, extended one day right."""
    keep = verdicts[~verdicts["status"].isin(["Unknown", "Skipped"])]
    if keep.empty:
        return []
    end = pd.Timestamp(keep["evaluated_at"].max()).floor("h")
    hours = pd.date_range(end - pd.Timedelta(days=LOOKBACK_DAYS),
                          end + pd.Timedelta(days=1), freq="h")
    rows = []
    hist_by_pid = dict(tuple(history.groupby(partition_col))) if len(history) else {}
    for _, v in keep.iterrows():
        pid = v[partition_col]
        h = hist_by_pid.get(pid)
        if h is not None and len(h):
            ts = pd.to_datetime(h[ts_col])
            counts = (ts.dt.floor("h").value_counts()
                      .reindex(hours, fill_value=0))
            last = ts.max()
        else:
            counts = pd.Series(0, index=hours)
            last = None
        rows.append(FreshnessPlotRow(
            name=str(pid),
            status=str(v["status"]),
            hourly_counts=counts,
            last_update=last,
            evaluated_at=pd.Timestamp(v["evaluated_at"]),
            predicted_next=(pd.Timestamp(v["predicted_next_ts"], unit="s")
                            if "predicted_next_ts" in v and pd.notna(v.get("predicted_next_ts"))
                            else None),
            predicted_upper=(pd.Timestamp(v["predicted_upper_bound_ts"], unit="s")
                             if "predicted_upper_bound_ts" in v
                             and pd.notna(v.get("predicted_upper_bound_ts"))
                             else None),
        ))
    return rows


def _x(hours: pd.DatetimeIndex, t: pd.Timestamp) -> float:
    return _LEFT + (t - hours[0]) / pd.Timedelta(hours=1) * _PX_PER_HOUR


def render_freshness_svg(rows: list[FreshnessPlotRow]) -> str:
    """One SVG figure for ≤ N_TABLES_PER_PLOT rows: hourly commit-heat
    bars, predicted (Fresh) / stale (Stale) window shading, dotted 'now'
    line, pale day dividers — the reference figure's elements."""
    if not rows:
        return "<svg xmlns='http://www.w3.org/2000/svg' width='1' height='1'/>"
    hours = rows[0].hourly_counts.index
    width = int(_LEFT + len(hours) * _PX_PER_HOUR + 20)
    height = len(rows) * _ROW_H + 30
    out = [f"<svg xmlns='http://www.w3.org/2000/svg' width='{width}' "
           f"height='{height}' style='background:{SCENARIO_COLOR_MAP['background']}'>"]
    # day dividers
    for d in pd.date_range(hours[0].ceil("D"), hours[-1], freq="D"):
        x = _x(hours, d)
        out.append(f"<line x1='{x:.1f}' y1='0' x2='{x:.1f}' y2='{height}' "
                   f"stroke='{SCENARIO_COLOR_MAP['day_divider']}' stroke-width='0.5'/>")
    for i, r in enumerate(rows):
        y = 10 + i * _ROW_H
        lu = (r.last_update.strftime("%Y-%m-%d %H:%M")
              if r.last_update is not None else "No updates")
        out.append(f"<text x='4' y='{y + _BAR_H - 4}' font-size='10'>"
                   f"{html.escape(r.name)} (Last update: {lu})</text>")
        counts = r.hourly_counts.to_numpy()
        for j, c in enumerate(counts):
            if c == 0:
                continue  # background-colored bars are the background
            x = _LEFT + j * _PX_PER_HOUR
            out.append(f"<rect x='{x:.1f}' y='{y}' width='{_PX_PER_HOUR - 1}' "
                       f"height='{_BAR_H}' fill='{decide_bar_color(int(c))}'>"
                       f"<title>{hours[j]:%Y-%m-%d %H:%M} Updates: {int(c)}</title></rect>")
        # predicted / stale window (reference :67-130 floor/ceil-hour rule)
        if r.predicted_next is not None:
            x0 = _x(hours, r.predicted_next.floor("h"))
            if r.status in ("Healthy", "Fresh") and r.predicted_upper is not None:
                x1, fill = _x(hours, r.predicted_upper.ceil("h")), \
                    SCENARIO_COLOR_MAP["predicted_window"]
            else:
                x1, fill = _x(hours, r.evaluated_at.ceil("h")), \
                    SCENARIO_COLOR_MAP["stale_window"]
            x0, x1 = max(x0, _LEFT), min(max(x1, x0 + 1), width)
            out.append(f"<rect x='{x0:.1f}' y='{y - 2}' width='{x1 - x0:.1f}' "
                       f"height='{_BAR_H + 4}' fill='{fill}'/>")
        # evaluated-at dotted line
        xe = _x(hours, r.evaluated_at)
        out.append(f"<line x1='{xe:.1f}' y1='{y - 3}' x2='{xe:.1f}' "
                   f"y2='{y + _BAR_H + 3}' stroke='{SCENARIO_COLOR_MAP['now']}' "
                   f"stroke-width='2' stroke-dasharray='2,2'/>")
    out.append("</svg>")
    return "".join(out)


def plot_freshness_summary(
    verdicts: pd.DataFrame,
    history: pd.DataFrame,
    out_path: str,
    *,
    n_tables_per_plot: int = N_TABLES_PER_PLOT,
) -> int:
    """Write the weekly commit-heat report (one SVG figure per group of
    ``n_tables_per_plot`` tables) to an HTML file; returns the number of
    figures (reference plot_freshness_summary:350-381 shows figures in the
    same groups)."""
    rows = build_plot_rows(verdicts, history)
    figs = [render_freshness_svg(rows[i:i + n_tables_per_plot])
            for i in range(0, len(rows), n_tables_per_plot)]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        f.write("<html><body><h2>Past Week Commits</h2>"
                + "<hr/>".join(figs) + "</body></html>")
    return len(figs)


_DASHBOARD_FOLDER_NAME = "anomaly_detection_dashboards"
_DASHBOARD_FILE = "quality_overview.html"


def create_dashboard_if_not_exists(shared_root: str,
                                   verdicts: Optional[pd.DataFrame] = None) -> str:
    """Create the (one-per-root) quality-overview dashboard if absent and
    return its id/path (reference create_dashboard_if_not_exists,
    dashboard.py:72-97: shared folder, create-only-when-missing)."""
    folder = os.path.join(shared_root, _DASHBOARD_FOLDER_NAME)
    path = os.path.join(folder, _DASHBOARD_FILE)
    if os.path.exists(path):
        return path
    os.makedirs(folder, exist_ok=True)
    body = "<p>No verdicts yet.</p>"
    if verdicts is not None and len(verdicts):
        counts = verdicts.groupby(["quality_check_type", "status"]).size()
        items = "".join(
            f"<tr><td>{html.escape(str(c))}</td><td>{html.escape(str(s))}</td>"
            f"<td>{int(n)}</td></tr>" for (c, s), n in counts.items())
        body = ("<table border='1'><tr><th>check</th><th>status</th>"
                f"<th>count</th></tr>{items}</table>")
    with open(path, "w") as f:
        f.write(f"<html><body><h1>Anomaly Detection Quality Overview</h1>{body}</body></html>")
    return path


def dashboard_url(path: str, logging_table_name: str) -> str:
    """file:// URL with the logging table as a query parameter (reference
    get_dashboard_url shape, dashboard.py:60-70)."""
    return f"file://{os.path.abspath(path)}?logging_table={logging_table_name}"
