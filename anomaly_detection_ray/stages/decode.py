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
from anomaly_detection_ray.functions.audio import AudioDecodeError, decode_wav


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
                rms[i] = float(np.sqrt(np.mean(sig.astype(np.float64) ** 2)))
                peak[i] = float(np.abs(sig).max())
                clip_ratio[i] = float((np.abs(sig) >= 0.999).mean())

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
            }
        )


def decode_stage(ds, *, batch_size: int = 256, concurrency: int | None = None,
                 num_cpus: float = 1):
    """Attach the decode actor pool to a clips Dataset.  Small batches on
    purpose: batch_size × payload size × concurrency must fit worker heaps
    (SURVEY.md §4 memory row).  The default pool size leaves headroom for
    the read/shuffle stages — an actor pool that reserves every CPU
    starves the producers and the pipeline serializes."""
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = max(1, cpus - 2)
    return ds.map_batches(
        DecodeStats,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
