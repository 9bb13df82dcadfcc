"""Image / video validation stages — stateful actor pools over binary columns.

Same shape as the audio decode stage (stages/decode.py; reference pattern:
per-entity model adapter shipping state to executors,
third_party/common.py:78-333): a callable CLASS in ``map_batches`` with an
actor pool, SMALL batch sizes because media rows are wide, and the binary
column dies inside the stage — only narrow feature rows reach any shuffle
(SURVEY.md §7.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from anomaly_detection_ray.functions.media import (
    MediaDecodeError,
    MediaStubError,
    decode_image,
    resize_nearest,
    sample_frames,
)


class ImageFeatures:
    """map_batches actor: images batch (pyarrow) → per-image decode facts +
    thumbnail features.  Decode of jpeg/png is stubbed (MediaStubError) and
    surfaces as ``decode_error='stub: ...'`` rows, never a task failure —
    the reference's error-funnel contract (errors → verdict rows, reference
    freshness_checker.py:686-693)."""

    def __init__(self, thumb: int = 8):
        self.thumb = thumb  # per-actor init hook; real codecs would load here

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch["bytes"].to_pylist()
        w_col = batch["width"].to_numpy(zero_copy_only=False)
        h_col = batch["height"].to_numpy(zero_copy_only=False)
        fmt_col = batch["format"].to_pylist()

        ok = np.zeros(n, dtype=bool)
        err = np.empty(n, dtype=object)
        dec_w = np.zeros(n, dtype=np.int32)
        dec_h = np.zeros(n, dtype=np.int32)
        channels = np.zeros(n, dtype=np.int32)
        dims_match = np.zeros(n, dtype=bool)
        fmt_match = np.zeros(n, dtype=bool)
        mean_lum = np.zeros(n, dtype=np.float64)
        std_lum = np.zeros(n, dtype=np.float64)
        thumbs = np.zeros((n, self.thumb * self.thumb), dtype=np.float32)

        for i in range(n):  # per-payload loop is inherent: variable-length parse
            try:
                arr, fmt = decode_image(payloads[i])
            except MediaStubError as e:
                err[i] = f"stub: {e}"
                continue
            except MediaDecodeError as e:
                err[i] = str(e)
                continue
            ok[i] = True
            err[i] = None
            dec_h[i], dec_w[i] = arr.shape[:2]
            channels[i] = 1 if arr.ndim == 2 else arr.shape[2]
            dims_match[i] = dec_w[i] == int(w_col[i]) and dec_h[i] == int(h_col[i])
            fmt_match[i] = fmt == fmt_col[i]
            lum = arr if arr.ndim == 2 else arr.mean(axis=2)
            mean_lum[i] = float(lum.mean())
            std_lum[i] = float(lum.std())
            thumbs[i] = resize_nearest(lum, self.thumb, self.thumb).astype(
                np.float32).ravel() / 255.0

        passthrough = {c: batch[c] for c in batch.column_names if c != "bytes"}
        return pa.table(
            {
                **passthrough,
                "decode_ok": pa.array(ok),
                "decode_error": pa.array(err.tolist(), pa.string()),
                "decoded_w": pa.array(dec_w),
                "decoded_h": pa.array(dec_h),
                "channels": pa.array(channels),
                "dims_match": pa.array(dims_match),
                "format_match": pa.array(fmt_match),
                "mean_lum": pa.array(mean_lum),
                "std_lum": pa.array(std_lum),
                "thumbnail": pa.FixedSizeListArray.from_arrays(
                    pa.array(thumbs.ravel()), self.thumb * self.thumb),
            }
        )


class VideoFrameStats:
    """map_batches actor: videos batch → per-video header facts + stats over
    ≤``frames_per_video`` evenly-sampled frames (range-read analogue: only
    sampled frames are sliced from the payload)."""

    def __init__(self, frames_per_video: int = 4):
        self.k = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch["bytes"].to_pylist()
        nf_col = batch["num_frames"].to_numpy(zero_copy_only=False)

        ok = np.zeros(n, dtype=bool)
        err = np.empty(n, dtype=object)
        nframes = np.zeros(n, dtype=np.int32)
        frames_match = np.zeros(n, dtype=bool)
        sampled = np.zeros(n, dtype=np.int32)
        mean_lum = np.zeros(n, dtype=np.float64)
        inter_frame_delta = np.zeros(n, dtype=np.float64)

        for i in range(n):
            try:
                idx, frames = sample_frames(payloads[i], self.k)
            except MediaStubError as e:
                err[i] = f"stub: {e}"
                continue
            except MediaDecodeError as e:
                err[i] = str(e)
                continue
            ok[i] = True
            err[i] = None
            from anomaly_detection_ray.functions.media import decode_video_header

            nframes[i] = decode_video_header(payloads[i])[0]
            frames_match[i] = nframes[i] == int(nf_col[i])
            sampled[i] = len(idx)
            f64 = frames.astype(np.float64)
            mean_lum[i] = float(f64.mean())
            if len(f64) > 1:
                inter_frame_delta[i] = float(
                    np.abs(np.diff(f64, axis=0)).mean())

        passthrough = {c: batch[c] for c in batch.column_names if c != "bytes"}
        return pa.table(
            {
                **passthrough,
                "decode_ok": pa.array(ok),
                "decode_error": pa.array(err.tolist(), pa.string()),
                "decoded_frames": pa.array(nframes),
                "frames_match": pa.array(frames_match),
                "sampled_frames": pa.array(sampled),
                "mean_lum": pa.array(mean_lum),
                "inter_frame_delta": pa.array(inter_frame_delta),
            }
        )


def _pool_size(reserve: int = 2) -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, cpus - reserve)


def image_stage(ds, *, batch_size: int = 128, concurrency: int | None = None):
    """Attach the image actor pool.  batch_size smaller than audio's 256:
    image payloads are wider (batch × payload × concurrency must fit the
    worker heap, SURVEY.md §4 memory row)."""
    return ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or _pool_size(),
        num_cpus=1,
    )


def video_stage(ds, *, frames_per_video: int = 4, batch_size: int = 32,
                concurrency: int | None = None):
    """Video payloads are the widest rows in the system → smallest batches."""
    return ds.map_batches(
        VideoFrameStats,
        fn_constructor_kwargs={"frames_per_video": frames_per_video},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or _pool_size(),
        num_cpus=1,
    )
