"""Multimodal pipelines: image / video payload validation over binary columns.

The table rows are (id, bytes:binary, typed metadata); the pipelines run
the stages/media.py actor pools and aggregate narrow per-item facts into
per-format summaries — the wide binary column never reaches a shuffle
(SURVEY.md §7.6).  Payload decode results are not derivable from the
parquet metadata, so these are rows-only correctness entries; their decode
semantics are pinned by unit tests (tests/test_media.py) instead of a
DuckDB oracle.

The input tables are the deterministic synthetic ones (sources/synth.py:
``images_path`` / ``videos_path``), sized by the sf of the given sf_dir so
bench scale follows the driver tables.
"""

from __future__ import annotations

import os
import re

import pandas as pd

import ray.data

from anomaly_detection_ray.sources.synth import images_path, videos_path
from anomaly_detection_ray.stages.media import image_stage, video_stage


def _sf_of(sf_dir: str, default: float = 0.01) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else default


def _n_items(sf_dir: str, per_sf: int = 200_000, floor: int = 400) -> int:
    return max(int(per_sf * _sf_of(sf_dir)), floor)


def image_format_stats(sf_dir: str) -> pd.DataFrame:
    """Per-format decode summary: counts, decode/dims/format agreement
    rates, luminance stats.  The headline multimodal pipeline."""
    path = images_path(_n_items(sf_dir))
    ds = ray.data.read_parquet(path)
    feats = image_stage(ds)
    agg = (
        feats.groupby("format")
        .aggregate(
            ray.data.aggregate.Count(),
            ray.data.aggregate.Sum("decode_ok", alias_name="n_ok"),
            ray.data.aggregate.Sum("dims_match", alias_name="n_dims_match"),
            ray.data.aggregate.Sum("format_match", alias_name="n_format_match"),
            ray.data.aggregate.Mean("mean_lum", alias_name="avg_lum"),
        )
        .to_pandas()
    )
    agg = agg.rename(columns={"count()": "n_images"})
    for c in ("n_ok", "n_dims_match", "n_format_match"):
        agg[c] = agg[c].astype("int64")
    agg["avg_lum"] = agg["avg_lum"].round(4)
    return agg.sort_values("format").reset_index(drop=True)


def video_frame_summary(sf_dir: str) -> pd.DataFrame:
    """Frame-sampling summary: decode rate, frame-count agreement, motion
    (mean inter-frame delta) bucketed by declared frame count."""
    path = videos_path(max(_n_items(sf_dir) // 10, 200))
    ds = ray.data.read_parquet(path)
    feats = video_stage(ds, frames_per_video=4)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["frames_bucket"] = (df["num_frames"] // 8) * 8
        return df[["frames_bucket", "decode_ok", "frames_match",
                   "sampled_frames", "inter_frame_delta"]]

    agg = (
        feats.map_batches(bucket, batch_format="pandas")
        .groupby("frames_bucket")
        .aggregate(
            ray.data.aggregate.Count(),
            ray.data.aggregate.Sum("decode_ok", alias_name="n_ok"),
            ray.data.aggregate.Sum("frames_match", alias_name="n_frames_match"),
            ray.data.aggregate.Mean("inter_frame_delta", alias_name="avg_motion"),
        )
        .to_pandas()
    )
    agg = agg.rename(columns={"count()": "n_videos"})
    for c in ("n_ok", "n_frames_match"):
        agg[c] = agg[c].astype("int64")
    agg["avg_motion"] = agg["avg_motion"].round(4)
    return agg.sort_values("frames_bucket").reset_index(drop=True)
