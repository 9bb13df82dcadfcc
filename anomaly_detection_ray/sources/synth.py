"""Deterministic synthetic clips / transcripts / ingest-history tables.

``BASELINE.json.input_hint`` defines the clips shape; FIXTURES.md F1-F4
define the planted violations.  The reference vendors no test corpus
(SURVEY.md §5), so correctness is established against these seeded tables
plus golden outputs.  Generation is chunked and writes partitioned Parquet
so the same generator scales from the 1k-row smoke table to the bench
table without driver-side memory growth.

Everything is a pure function of (seed, n, chunk index) — regenerating any
chunk independently yields identical rows, which is also how a 100 TB
synthetic load would be produced across a cluster (one Ray task per chunk).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from anomaly_detection_ray.functions.audio import encode_wav
from anomaly_detection_ray.schema import CLIPS_SCHEMA, INGEST_HISTORY_SCHEMA, TRANSCRIPTS_SCHEMA

#: skewed codec mix (FIXTURES.md F1: ~80% pcm16 to exercise salted shuffles)
_CODECS = np.array(["pcm16", "pcm8", "f32", "ulaw"])
_CODEC_P = np.array([0.80, 0.08, 0.07, 0.05])
_SR = np.array([8000, 16000, 22050, 44100], dtype=np.int32)
_SR_P = np.array([0.10, 0.70, 0.10, 0.10])

_VOCAB = np.array(
    "the a and of to in is it that was hello world audio clip speech test "
    "sound noise voice signal data quality check table row batch".split()
)

#: planted violation rates (FIXTURES.md F1/F2)
DUP_RATE = 0.001
CORRUPT_RATE = 0.001
DUR_MISMATCH_RATE = 0.001
NULL_TRANSCRIPT_RATE = 0.002
ORPHAN_RATE = 0.001


def _transcripts(rng: np.random.Generator, n: int) -> np.ndarray:
    lens = rng.integers(3, 12, size=n)
    words = rng.choice(_VOCAB, size=int(lens.sum()))
    out = np.empty(n, dtype=object)
    pos = 0
    for i, L in enumerate(lens):
        out[i] = " ".join(words[pos : pos + L])
        pos += L
    return out


def make_clips_chunk(seed: int, chunk: int, n: int, drift: bool = False,
                     dur_scale: float = 1.0) -> pa.Table:
    """One deterministic chunk of the clips table with planted violations.

    ``drift=True`` produces the F3 ``clips_drifted`` distributions: dur_ms
    mean +30%, codec mix rotated, sr histogram changed.  ``dur_scale``
    shrinks clip durations (so payload bytes) proportionally — used by the
    10×-row scale-proof run to fit the sandbox disk while keeping per-row
    structure identical (scripts/scale_proof.py; BASELINE.md §4).
    """
    rng = np.random.default_rng((seed, chunk, 1 if drift else 0))
    start = chunk * n
    ids = np.array([f"clip-{start + i:012d}" for i in range(n)], dtype=object)
    # planted duplicate ids: overwrite ~DUP_RATE ids with a neighbour's id
    dup_mask = rng.random(n) < DUP_RATE
    dup_idx = np.flatnonzero(dup_mask)
    ids[dup_idx[dup_idx > 0]] = ids[dup_idx[dup_idx > 0] - 1]

    codec_p = np.roll(_CODEC_P, 1) if drift else _CODEC_P
    sr_p = np.array([0.05, 0.35, 0.40, 0.20]) if drift else _SR_P
    codec = rng.choice(_CODECS, size=n, p=codec_p)
    sr = rng.choice(_SR, size=n, p=sr_p)
    dur_mean = 650.0 * (1.3 if drift else 1.0) * dur_scale
    dur = np.clip(rng.normal(dur_mean, 220.0 * dur_scale, size=n),
                  8, max(2000.0 * dur_scale, 16)).astype(np.int32)

    transcripts = _transcripts(rng, n)
    null_mask = rng.random(n) < NULL_TRANSCRIPT_RATE
    transcripts[null_mask] = None

    corrupt_mask = rng.random(n) < CORRUPT_RATE
    mismatch_mask = rng.random(n) < DUR_MISMATCH_RATE

    payloads = np.empty(n, dtype=object)
    freqs = rng.uniform(100, 2000, size=n)
    amps = rng.uniform(0.2, 0.8, size=n)
    for i in range(n):
        ns = max(int(sr[i] * dur[i] / 1000), 1)
        t = np.arange(ns) / sr[i]
        sig = amps[i] * np.sin(2 * np.pi * freqs[i] * t)
        raw = encode_wav(sig, int(sr[i]), str(codec[i]))
        if corrupt_mask[i]:
            raw = raw[: max(len(raw) // 2, 10)]  # truncate → decode error
        payloads[i] = raw
        if mismatch_mask[i]:
            dur[i] = dur[i] + 50  # column lies about the payload length

    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(payloads.tolist(), pa.binary()),
            "sr_hz": pa.array(sr, pa.int32()),
            "dur_ms": pa.array(dur, pa.int32()),
            "codec": pa.array(codec, pa.string()),
            "transcript": pa.array(transcripts, pa.string()),
        },
        schema=CLIPS_SCHEMA,
    )


#: planted transcode-duplicate rate for the audio-dedup table
XCODEC_DUP_RATE = 0.04


def make_clips_dups_chunk(seed: int, chunk: int, n: int) -> pa.Table:
    """Clips chunk with ~XCODEC_DUP_RATE planted TRANSCODE duplicates: a
    picked row's payload is decoded and re-encoded under a rotated codec
    and appended under ``<clip_id>-xc`` — the same recording, different
    bytes, exactly what byte-hash dedup cannot see and the audio
    fingerprint dedup must.  Ground truth is recoverable from the id
    suffix, which the planted-pair tests use."""
    from anomaly_detection_ray.functions.audio import AudioDecodeError, decode_wav

    base = make_clips_chunk(seed, chunk, n)
    rng = np.random.default_rng((seed, chunk, 11))
    pick = np.flatnonzero(rng.random(n) < XCODEC_DUP_RATE)
    rows = {c: base[c].to_pylist() for c in base.column_names}
    order = {c: i for i, c in enumerate(_CODECS)}
    for i in pick:
        try:
            sig, sr, codec = decode_wav(rows["bytes"][i])
        except AudioDecodeError:
            continue  # planted-corrupt payload: nothing to transcode
        new_codec = str(_CODECS[(order[codec] + 1) % len(_CODECS)])
        for c in base.column_names:
            rows[c].append(rows[c][i])
        rows["clip_id"][-1] = rows["clip_id"][i] + "-xc"
        rows["codec"][-1] = new_codec
        rows["bytes"][-1] = encode_wav(sig, sr, new_codec)
    return pa.table(rows, schema=CLIPS_SCHEMA)


def clips_dups_path(n_rows: int, seed: int = 42) -> str:
    out = os.path.join(_CACHE_ROOT, f"clipsxc-s{seed}-n{n_rows}")
    return _materialize(out, n_rows, lambda c, m: make_clips_dups_chunk(seed, c, m))


def make_transcripts_chunk(seed: int, chunk: int, n: int) -> pa.Table:
    """Side table: same ids/transcripts as the clips chunk, with ~ORPHAN_RATE
    rows dropped (clips without transcript) and ~ORPHAN_RATE fabricated
    orphan ids appended (transcripts without clip)."""
    clips = make_clips_chunk(seed, chunk, n)
    rng = np.random.default_rng((seed, chunk, 99))
    ids = np.asarray(clips["clip_id"].to_pylist(), dtype=object)
    texts = np.asarray(clips["transcript"].to_pylist(), dtype=object)
    keep = rng.random(n) >= ORPHAN_RATE
    ids, texts = ids[keep], texts[keep]
    n_orphan = max(int(n * ORPHAN_RATE), 1)
    orphan_ids = np.array([f"orphan-{seed}-{chunk}-{i:06d}" for i in range(n_orphan)], dtype=object)
    orphan_txt = _transcripts(rng, n_orphan)
    return pa.table(
        {
            "clip_id": pa.array(np.concatenate([ids, orphan_ids]), pa.string()),
            "transcript": pa.array(np.concatenate([texts, orphan_txt]), pa.string()),
        },
        schema=TRANSCRIPTS_SCHEMA,
    )


#: planted rates for the multimodal tables (same spirit as FIXTURES.md F1)
IMG_CORRUPT_RATE = 0.002
IMG_STUB_RATE = 0.002      # jpeg-magic payloads → stubbed-decoder rows
IMG_MISMATCH_RATE = 0.002  # metadata lies about dims / frame count


def make_images_chunk(seed: int, chunk: int, n: int) -> pa.Table:
    """Deterministic images table: PPM/PGM payloads (real decode) with
    planted corrupt payloads, jpeg-magic stub rows, and dim mismatches."""
    from anomaly_detection_ray.functions.media import encode_ppm

    rng = np.random.default_rng((seed, chunk, 7))
    start = chunk * n
    ids = np.array([f"img-{start + i:012d}" for i in range(n)], dtype=object)
    ws = rng.integers(8, 48, size=n).astype(np.int32)
    hs = rng.integers(8, 48, size=n).astype(np.int32)
    gray = rng.random(n) < 0.3
    corrupt = rng.random(n) < IMG_CORRUPT_RATE
    stub = rng.random(n) < IMG_STUB_RATE
    mism = rng.random(n) < IMG_MISMATCH_RATE

    payloads = np.empty(n, dtype=object)
    fmts = np.empty(n, dtype=object)
    chans = np.where(gray, 1, 3).astype(np.int32)
    for i in range(n):
        shape = (hs[i], ws[i]) if gray[i] else (hs[i], ws[i], 3)
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        raw = encode_ppm(arr)
        if stub[i]:
            raw = b"\xff\xd8\xff\xe0" + raw[4:]  # jpeg magic → stub path
        elif corrupt[i]:
            raw = raw[: max(len(raw) // 3, 4)]
        payloads[i] = raw
        fmts[i] = "pgm" if gray[i] else "ppm"
        if mism[i]:
            ws[i] += 1
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(payloads.tolist(), pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "channels": pa.array(chans, pa.int32()),
            "format": pa.array(fmts, pa.string()),
        }
    )


def make_videos_chunk(seed: int, chunk: int, n: int) -> pa.Table:
    """Deterministic videos table: RVID payloads (frame-sample plumbing is
    real; mp4 would be a stub) with planted truncations and frame-count
    mismatches."""
    from anomaly_detection_ray.functions.media import encode_video

    rng = np.random.default_rng((seed, chunk, 8))
    start = chunk * n
    ids = np.array([f"vid-{start + i:012d}" for i in range(n)], dtype=object)
    nf = rng.integers(4, 32, size=n).astype(np.int32)
    hs = rng.integers(8, 24, size=n).astype(np.int32)
    ws = rng.integers(8, 24, size=n).astype(np.int32)
    corrupt = rng.random(n) < IMG_CORRUPT_RATE
    mism = rng.random(n) < IMG_MISMATCH_RATE

    payloads = np.empty(n, dtype=object)
    for i in range(n):
        base = rng.integers(0, 256, size=(hs[i], ws[i]), dtype=np.uint8)
        driftv = rng.integers(0, 9, size=nf[i], dtype=np.uint8)
        frames = (base[None, :, :].astype(np.uint16) + driftv[:, None, None]) % 256
        raw = encode_video(frames.astype(np.uint8))
        if corrupt[i]:
            raw = raw[: max(len(raw) // 2, 6)]
        payloads[i] = raw
        if mism[i]:
            nf[i] += 2
    return pa.table(
        {
            "video_id": pa.array(ids, pa.string()),
            "bytes": pa.array(payloads.tolist(), pa.binary()),
            "num_frames": pa.array(nf, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
        }
    )


def make_ingest_history(seed: int, num_partitions: int, eval_ts: float) -> pa.Table:
    """Per-partition commit history (FIXTURES.md F4): seeded cadences —
    hourly, daily, weekly-seasonal, static (>30d old), one late-gap series
    (stale verdict) — with non-update ops and empty writes that must be
    filtered (reference: table_history_utils.py:17-28, 121-131)."""
    rng = np.random.default_rng((seed, 4))
    rows: list[dict] = []
    cadences = ["hourly", "daily", "weekly", "static", "late"]
    for p in range(num_partitions):
        kind = cadences[p % len(cadences)]
        pid = f"part-{p:04d}"
        if kind == "hourly":
            gaps = rng.normal(3600, 120, 400)
        elif kind == "daily":
            gaps = rng.normal(86400, 1800, 60)
        elif kind == "weekly":
            base = np.tile([3600, 3600, 3600, 3600, 3600, 43200, 43200], 40)
            gaps = base + rng.normal(0, 60, base.size)
        elif kind == "static":
            gaps = rng.normal(86400, 900, 20)
        else:  # late: hourly series that stopped 8h ago
            gaps = rng.normal(3600, 60, 300)
        ts_end = eval_ts - {"hourly": 600, "daily": 3600, "weekly": 600,
                            "static": 45 * 86400, "late": 8 * 3600}[kind]
        # increasing timestamps ending at ts_end
        ts = ts_end - (np.cumsum(gaps)[-1] - np.cumsum(gaps))
        for i, t in enumerate(ts):
            op = "WRITE" if rng.random() > 0.1 else ("OPTIMIZE" if rng.random() < 0.5 else "VACUUM END")
            nrows = int(max(rng.normal(1000, 100), 0))
            empty = rng.random() < 0.03
            metrics = {
                "numOutputRows": "0" if empty else str(nrows),
                "numFiles": "0" if empty else str(max(nrows // 500, 1)),
                "numOutputBytes": "0" if empty else str(nrows * 120),
                "numDeletedRows": str(int(rng.random() < 0.05) * 10),
            }
            rows.append(
                {"partition_id": pid, "timestamp": float(t), "operation": op,
                 "operationMetrics": list(metrics.items())}
            )
    tbl = pa.table(
        {
            "partition_id": pa.array([r["partition_id"] for r in rows], pa.string()),
            "timestamp": pa.array(
                (np.array([r["timestamp"] for r in rows]) * 1e6).astype("int64"),
                pa.timestamp("us"),
            ),
            "operation": pa.array([r["operation"] for r in rows], pa.string()),
            "operationMetrics": pa.array(
                [r["operationMetrics"] for r in rows], pa.map_(pa.string(), pa.string())
            ),
        },
        schema=INGEST_HISTORY_SCHEMA,
    )
    return tbl


# ---------------------------------------------------------------------------
# Materialized dataset cache (one dir per (kind, seed, rows))
# ---------------------------------------------------------------------------

_CACHE_ROOT = os.environ.get("ADR_SYNTH_CACHE", "/tmp/adr_synth")
CHUNK_ROWS = 2000


def clips_path(n_rows: int, seed: int = 42, drift: bool = False,
               dur_scale: float = 1.0) -> str:
    """Materialize (once) and return a partitioned-Parquet clips dataset."""
    tag = f"clips{'_drift' if drift else ''}-s{seed}-n{n_rows}"
    if dur_scale != 1.0:
        tag += f"-d{dur_scale}"
    out = os.path.join(_CACHE_ROOT, tag)
    return _materialize(out, n_rows,
                        lambda c, m: make_clips_chunk(seed, c, m, drift=drift,
                                                      dur_scale=dur_scale))


def transcripts_path(n_rows: int, seed: int = 42) -> str:
    out = os.path.join(_CACHE_ROOT, f"transcripts-s{seed}-n{n_rows}")
    return _materialize(out, n_rows, lambda c, m: make_transcripts_chunk(seed, c, m))


def make_documents_chunk(seed: int, chunk: int, n: int) -> pa.Table:
    """Deterministic documents table matching the driver testdata schema
    (doc_id, text, lang, source, n_chars) with ~3% planted near-dup pairs
    (copy of the previous doc with ~5% token edits) — scale-proof input for
    the near-dup family (scripts/scale_proof.py)."""
    rng = np.random.default_rng((seed, chunk, 7))
    start = chunk * CHUNK_ROWS
    vocab = np.array([f"w{i:04d}" for i in range(5000)], dtype=object)
    # zipf-ish: low ids much more likely
    p = 1.0 / np.arange(1, vocab.size + 1)
    p /= p.sum()
    texts = np.empty(n, dtype=object)
    for i in range(n):
        if i > 0 and rng.random() < 0.03:
            toks = texts[i - 1].split()
            edit = rng.random(len(toks)) < 0.05
            for j in np.flatnonzero(edit):
                toks[j] = vocab[rng.integers(vocab.size)]
            texts[i] = " ".join(toks)
        else:
            ln = int(rng.integers(30, 120))
            texts[i] = " ".join(rng.choice(vocab, size=ln, p=p))
    langs = rng.choice(np.array(["en", "de", "fr", "es", "it"], dtype=object), size=n)
    sources = rng.choice(np.array(["web", "wiki", "books"], dtype=object), size=n)
    return pa.table({
        "doc_id": pa.array(np.arange(start, start + n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def make_embeddings_chunk(seed: int, chunk: int, n: int, dim: int = 64,
                          n_clusters: int = 20) -> pa.Table:
    """Deterministic clustered embeddings (vec_id, embedding: list<float32>,
    label: int32) matching the driver testdata schema."""
    rng = np.random.default_rng((seed, chunk, 8))
    start = chunk * CHUNK_ROWS
    centers = np.random.default_rng((seed, 0, 8)).standard_normal((n_clusters, dim)) * 3
    labels = rng.integers(0, n_clusters, n)
    X = (centers[labels] + rng.standard_normal((n, dim)) * 0.6).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(start, start + n), pa.int64()),
        "embedding": pa.array([r for r in X], pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })


def docs_scale_dir(n_docs: int, n_vecs: int, seed: int = 42) -> str:
    """Materialize a synthetic sf-dir shape (documents.parquet +
    embeddings.parquet as single files) for the near-dup/ANN scale proof."""
    out = os.path.join(_CACHE_ROOT, f"docsdir-s{seed}-d{n_docs}-v{n_vecs}")
    done = os.path.join(out, "_SUCCESS")
    if not os.path.exists(done):
        os.makedirs(out, exist_ok=True)
        # row_group_size: Ray's parquet scan splits blocks at row-group
        # boundaries — a single-row-group file reads as ONE block and every
        # downstream map runs in ONE task (measured: minhash candgen 11.4 s
        # serial on a 50k-doc single-group file)
        docs = [make_documents_chunk(seed, c, min(CHUNK_ROWS, n_docs - c * CHUNK_ROWS))
                for c in range((n_docs + CHUNK_ROWS - 1) // CHUNK_ROWS)]
        pq.write_table(pa.concat_tables(docs), os.path.join(out, "documents.parquet"),
                       row_group_size=CHUNK_ROWS)
        vecs = [make_embeddings_chunk(seed, c, min(CHUNK_ROWS, n_vecs - c * CHUNK_ROWS))
                for c in range((n_vecs + CHUNK_ROWS - 1) // CHUNK_ROWS)]
        pq.write_table(pa.concat_tables(vecs), os.path.join(out, "embeddings.parquet"),
                       row_group_size=CHUNK_ROWS)
        with open(done, "w") as f:
            f.write("ok")
    return out


def images_path(n_rows: int, seed: int = 42) -> str:
    out = os.path.join(_CACHE_ROOT, f"images-s{seed}-n{n_rows}")
    return _materialize(out, n_rows, lambda c, m: make_images_chunk(seed, c, m))


def videos_path(n_rows: int, seed: int = 42) -> str:
    out = os.path.join(_CACHE_ROOT, f"videos-s{seed}-n{n_rows}")
    return _materialize(out, n_rows, lambda c, m: make_videos_chunk(seed, c, m))


def _materialize(out: str, n_rows: int, make_chunk) -> str:
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    n_chunks = max((n_rows + CHUNK_ROWS - 1) // CHUNK_ROWS, 1)
    sizes = [(c, min(CHUNK_ROWS, n_rows - c * CHUNK_ROWS)) for c in range(n_chunks)]
    sizes = [(c, m) for c, m in sizes if m > 0]

    import ray

    if ray.is_initialized() and len(sizes) > 4:
        # chunk generation is pure-function-of-(seed, chunk) → embarrassingly
        # parallel; this is also how a 100 TB synthetic load would be built
        @ray.remote(num_cpus=1)
        def gen(c: int, m: int) -> None:
            pq.write_table(make_chunk(c, m), os.path.join(tmp, f"chunk-{c:05d}.parquet"))

        ray.get([gen.remote(c, m) for c, m in sizes])
    else:
        for c, m in sizes:
            pq.write_table(make_chunk(c, m), os.path.join(tmp, f"chunk-{c:05d}.parquet"))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.rename(tmp, out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def history_path(num_partitions: int = 20, seed: int = 42, eval_ts: float = 1_754_000_000.0) -> str:
    out = os.path.join(_CACHE_ROOT, f"history-s{seed}-p{num_partitions}")
    done = os.path.join(out, "_SUCCESS")
    if not os.path.exists(done):
        os.makedirs(out, exist_ok=True)
        pq.write_table(make_ingest_history(seed, num_partitions, eval_ts), os.path.join(out, "history.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return out
