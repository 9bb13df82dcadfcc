"""Audio decode / payload-validation stage — a stateful actor pool.

The canonical "load-once-per-worker" stage (reference pattern: the
per-entity model adapter shipping state to executors,
third_party/common.py:78-333): a callable CLASS passed to ``map_batches``
with ``concurrency=N`` so the µ-law tables / scratch state initialize once
per actor, and a **small batch size** because binary audio rows are wide
(SURVEY.md §7.6 — never let decoded PCM enter a shuffle; decode → stats →
drop bytes inside the same stage).

Emits one narrow row per clip: decode status + audio features + the
consistency flags the validation suite turns into violations.  The wide
``bytes`` column dies here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from anomaly_detection_ray.config import DUR_MS_TOLERANCE
from anomaly_detection_ray.functions.audio import (
    AudioDecodeError,
    audio_qc_features,
    decode_wav,
)


class DecodeStats:
    """map_batches actor: clips batch (pyarrow) → per-clip decode facts."""

    def __init__(self, dur_tolerance_ms: int = DUR_MS_TOLERANCE):
        # per-actor init (runs once): nothing heavy today, but this is the
        # hook where codec tables / models would load at scale
        self.dur_tolerance_ms = dur_tolerance_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        payloads = batch["bytes"].to_pylist()
        sr_col = batch["sr_hz"].to_numpy(zero_copy_only=False)
        dur_col = batch["dur_ms"].to_numpy(zero_copy_only=False)
        codec_col = batch["codec"].to_pylist()

        ok = np.zeros(n, dtype=bool)
        err = np.empty(n, dtype=object)
        dec_ms = np.zeros(n, dtype=np.int64)
        sr_match = np.zeros(n, dtype=bool)
        codec_match = np.zeros(n, dtype=bool)
        dur_match = np.zeros(n, dtype=bool)
        rms = np.zeros(n, dtype=np.float64)
        peak = np.zeros(n, dtype=np.float64)
        clip_ratio = np.zeros(n, dtype=np.float64)
        zcr = np.zeros(n, dtype=np.float64)
        silence_ratio = np.zeros(n, dtype=np.float64)
        spectral_centroid = np.zeros(n, dtype=np.float64)
        dominant_hz = np.zeros(n, dtype=np.float64)
        low_band_ratio = np.zeros(n, dtype=np.float64)

        # PER-CLIP scalar features, deliberately: a whole-batch segmented
        # pass (audio_qc_scalar_batch) allocates ~1.5 GB of fresh numpy
        # temps per call, and on this VM first-touch page faults cost
        # ~50 µs/page (measured: np.abs over 26M floats is 19 ms into a
        # warm buffer, 1.1-1.4 s freshly allocated — glibc munmaps large
        # temps back to the OS every call).  Per-clip temps stay under the
        # mmap threshold and reuse allocator arenas, so the "slow" loop is
        # ~7× faster end-to-end here.  audio_qc_scalar_batch remains the
        # vectorized reference (agreement-tested) for hosts with sane
        # fault costs.
        for i in range(n):  # per-payload loop is inherent: variable-length codec parse
            try:
                sig, sr, codec = decode_wav(payloads[i])
            except AudioDecodeError as e:
                err[i] = str(e)
                continue
            ok[i] = True
            err[i] = None
            dec_ms[i] = int(round(len(sig) * 1000.0 / max(sr, 1)))
            sr_match[i] = sr == int(sr_col[i])
            codec_match[i] = codec == codec_col[i]
            dur_match[i] = abs(dec_ms[i] - int(dur_col[i])) <= self.dur_tolerance_ms
            if len(sig):
                a = np.abs(sig)  # float32: bandwidth-bound at high parallelism
                rms[i] = float(np.sqrt(np.dot(sig, sig) / sig.size))
                peak[i] = float(a.max())
                clip_ratio[i] = float((a >= 0.999).mean())
                qc = audio_qc_features(sig, sr)
                zcr[i] = qc["zcr"]
                silence_ratio[i] = qc["silence_ratio"]
                spectral_centroid[i] = qc["spectral_centroid_hz"]
                dominant_hz[i] = qc["dominant_hz"]
                low_band_ratio[i] = qc["low_band_ratio"]

        # carry every narrow input column (incl. partition_id); drop bytes here
        passthrough = {n: batch[n] for n in batch.column_names if n != "bytes"}
        return pa.table(
            {
                **passthrough,
                "decode_ok": pa.array(ok),
                "decode_error": pa.array(err.tolist(), pa.string()),
                "decoded_ms": pa.array(dec_ms),
                "sr_match": pa.array(sr_match),
                "codec_match": pa.array(codec_match),
                "dur_match": pa.array(dur_match),
                "rms": pa.array(rms),
                "peak": pa.array(peak),
                "clip_ratio": pa.array(clip_ratio),
                "zcr": pa.array(zcr),
                "silence_ratio": pa.array(silence_ratio),
                "spectral_centroid_hz": pa.array(spectral_centroid),
                "dominant_hz": pa.array(dominant_hz),
                "low_band_ratio": pa.array(low_band_ratio),
            }
        )


def decode_stats_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task decode fn.  Per-process state (µ-law decode table)
    lives at module level in functions/audio.py, so re-instantiating the
    wrapper per task costs nothing."""
    return DecodeStats()(batch)


def decode_stage(ds, *, batch_size: int = 1024, concurrency: int | None = None,
                 num_cpus: float = 1, use_actors: bool = False):
    """Attach the decode stage to a clips Dataset.

    Default is STATELESS TASKS (ray_guide rule: plain function → tasks,
    cheap and elastic): this stage's only per-worker state is the µ-law
    lookup table, which is a module-level cache in every worker process
    already.  Measured head-to-head at this payload size, tasks beat a
    fixed actor pool ~7.2s vs ~11.0s at 8 CPUs (pool startup + reserved
    CPUs starving the read).  ``use_actors=True`` switches to the actor
    pool — the right choice when the stage gains genuinely heavy state
    (codec libraries, ML models), as the media stages (stages/media.py)
    and drift scorer do.  Batch sizing: batch × payload bytes ×
    parallelism must fit worker heaps (SURVEY.md §4 memory row)."""
    if not use_actors:
        return ds.map_batches(
            decode_stats_batch,
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=num_cpus,
        )
    if concurrency is None:
        from anomaly_detection_ray.context import current_or_default

        cpus = current_or_default().parallelism()
        # a pool that reserves every CPU starves the producers and the
        # pipeline serializes — always leave read/shuffle headroom
        concurrency = max(1, cpus - 2)
    return ds.map_batches(
        DecodeStats,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
