"""Audio payload encode/decode — pure stdlib + numpy.

The clips table carries opaque ``bytes`` audio payloads with a ``codec``
column ∈ {pcm16, pcm8, f32, ulaw} (FIXTURES.md F1).  Payloads are minimal
RIFF/WAVE containers (format tags 1 = integer PCM, 3 = IEEE float,
7 = G.711 µ-law) written and parsed here directly — no external codec
libraries exist in this environment (SURVEY.md §7.0), and a hand-rolled
parser keeps the decode stage fully vectorized.

Decode returns float32 PCM in [-1, 1].  The per-row invariant
(BASELINE.json input_hint) is SNR(reference_signal, decoded) ≥ 30 dB —
8-bit PCM gives ~50 dB and µ-law ~38 dB for well-scaled signals, so any
honest payload passes and corrupt/truncated payloads fail.

This module is the binary-data analogue of the reference's only binary
path (cloudpickled model blobs through a Spark binary column,
third_party/common.py:177-220).
"""

from __future__ import annotations

import struct

import numpy as np

CODECS = ("pcm16", "pcm8", "f32", "ulaw")

_FMT_TAG = {"pcm16": 1, "pcm8": 1, "f32": 3, "ulaw": 7}
_BITS = {"pcm16": 16, "pcm8": 8, "f32": 32, "ulaw": 8}


class AudioDecodeError(ValueError):
    pass


# ---------------------------------------------------------------------------
# µ-law (G.711) tables — computed once at import
# ---------------------------------------------------------------------------

def _build_ulaw_decode_table() -> np.ndarray:
    """256-entry µ-law byte → float32 in [-1, 1] (G.711 standard decode)."""
    u = np.arange(256, dtype=np.uint8)
    u = ~u
    sign = np.where(u & 0x80, -1.0, 1.0)
    exponent = ((u >> 4) & 0x07).astype(np.int32)
    mantissa = (u & 0x0F).astype(np.int32)
    magnitude = ((mantissa << 3) + 0x84).astype(np.int64) << exponent
    magnitude = magnitude - 0x84
    return (sign * magnitude / 32768.0).astype(np.float32)


_ULAW_DECODE = _build_ulaw_decode_table()


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """float [-1,1] → µ-law bytes (vectorized G.711 encode)."""
    x = np.clip(x, -1.0, 1.0)
    pcm = (x * 32768.0).astype(np.int64)
    sign = (pcm < 0).astype(np.uint8) << 7
    mag = np.abs(pcm).clip(max=32635) + 0x84
    exponent = (np.floor(np.log2(mag)) - 7).clip(0, 7).astype(np.int64)
    mantissa = ((mag >> (exponent + 3)) & 0x0F).astype(np.uint8)
    byte = ~(sign | (exponent.astype(np.uint8) << 4) | mantissa)
    return byte.astype(np.uint8)


# ---------------------------------------------------------------------------
# RIFF/WAVE encode
# ---------------------------------------------------------------------------


def encode_wav(signal: np.ndarray, sr_hz: int, codec: str) -> bytes:
    """Encode a float signal in [-1,1] as a RIFF/WAVE payload."""
    if codec not in CODECS:
        raise ValueError(f"unknown codec {codec!r}")
    x = np.clip(np.asarray(signal, dtype=np.float64), -1.0, 1.0)
    if codec == "pcm16":
        frames = (x * 32767.0).round().astype("<i2").tobytes()
    elif codec == "pcm8":
        frames = ((x * 127.0).round() + 128).clip(0, 255).astype(np.uint8).tobytes()
    elif codec == "f32":
        frames = x.astype("<f4").tobytes()
    else:  # ulaw
        frames = ulaw_encode(x).tobytes()
    bits = _BITS[codec]
    tag = _FMT_TAG[codec]
    block_align = bits // 8
    byte_rate = sr_hz * block_align
    fmt = struct.pack("<HHIIHH", tag, 1, sr_hz, byte_rate, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# RIFF/WAVE decode
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, str]:
    """Parse a RIFF/WAVE payload → (float32 signal in [-1,1], sr_hz, codec).

    Raises AudioDecodeError on malformed/truncated payloads.
    """
    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE payload")
    declared = struct.unpack("<I", payload[4:8])[0]
    if declared + 8 > len(payload):
        raise AudioDecodeError("truncated payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        chunk = payload[pos + 8 : pos + 8 + size]
        if len(chunk) < size:
            raise AudioDecodeError(f"truncated {chunk_id!r} chunk")
        if chunk_id == b"fmt ":
            fmt = chunk
        elif chunk_id == b"data":
            data = chunk
        pos += 8 + size + (size & 1)
    if fmt is None or data is None or len(fmt) < 16:
        raise AudioDecodeError("missing fmt/data chunk")
    tag, channels, sr_hz, _rate, _align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if channels != 1:
        raise AudioDecodeError(f"unsupported channel count {channels}")
    if tag == 1 and bits == 16:
        codec = "pcm16"
        if len(data) % 2:
            raise AudioDecodeError("odd pcm16 data length")
        sig = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32767.0
    elif tag == 1 and bits == 8:
        codec = "pcm8"
        sig = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 127.0
    elif tag == 3 and bits == 32:
        codec = "f32"
        if len(data) % 4:
            raise AudioDecodeError("odd f32 data length")
        sig = np.frombuffer(data, dtype="<f4").astype(np.float32)
        if not np.isfinite(sig).all():
            raise AudioDecodeError("non-finite f32 samples")
    elif tag == 7 and bits == 8:
        codec = "ulaw"
        sig = _ULAW_DECODE[np.frombuffer(data, dtype=np.uint8)]
    else:
        raise AudioDecodeError(f"unsupported format tag={tag} bits={bits}")
    return sig, int(sr_hz), codec


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio in dB between reference and decoded PCM."""
    n = min(reference.size, decoded.size)
    if n == 0 or reference.size != decoded.size:
        return -np.inf
    ref = reference[:n].astype(np.float64)
    err = ref - decoded[:n].astype(np.float64)
    p_sig = float((ref**2).sum())
    p_err = float((err**2).sum())
    if p_err == 0:
        return np.inf
    if p_sig == 0:
        return -np.inf
    return 10.0 * np.log10(p_sig / p_err)


#: bounded spectral-analysis window (samples) — see audio_qc_features
SPECTRAL_WINDOW = 4096
#: bump when QC feature definitions change: cached drift baselines carry
#: this in their filename so a stale snapshot is never compared against
#: features computed under new parameters
QC_FEATURE_VERSION = 2


def audio_qc_scalar_batch(sigs: list) -> dict:
    """Vectorized scalar QC features for a BATCH of decoded clips.

    Concatenates all signals once and computes rms / peak / clip_ratio /
    zcr / silence_ratio per clip with segmented C-level reductions
    (``np.add.reduceat`` / ``np.maximum.reduceat`` / cumulative crossing
    counts) — the per-clip numpy calls in the decode loop paid ~50 µs of
    fixed dispatch each, which at 8 features × 10^12 clips is the decode
    stage's dominant cost once the FFT window is bounded.

    Semantics match :func:`audio_qc_features` / the per-clip formulas
    exactly for the integer-count features (zcr, clip/silence counts,
    peak); rms accumulates in float64 (the per-clip ``np.dot`` on float32
    differs by ~1e-7 relative).  Clips with <2 samples keep the per-clip
    defaults (zcr 0, silence_ratio 1.0).  Empty list → empty arrays.

    NOT wired into DecodeStats: on hosts where first-touch page faults
    are expensive (this sandbox VM: ~50 µs/page, so the ~1.5 GB of fresh
    numpy temps per call cost seconds), the per-clip loop with small
    arena-reused temps is measurably faster.  Kept as the
    agreement-tested vectorized reference for normal hosts.
    """
    m = len(sigs)
    out = {"rms": np.zeros(m), "peak": np.zeros(m), "clip_ratio": np.zeros(m),
           "zcr": np.zeros(m), "silence_ratio": np.ones(m)}
    lens = np.array([s.size for s in sigs], dtype=np.int64)
    if m == 0 or lens.sum() == 0:
        return out
    nz = np.flatnonzero(lens > 0)
    cat = np.concatenate([sigs[i] for i in nz]).astype(np.float32, copy=False)
    clens = lens[nz]
    offs = np.concatenate([[0], np.cumsum(clens)])
    starts = offs[:-1]

    a = np.abs(cat)
    sq = cat.astype(np.float64)
    sq *= sq
    rms = np.sqrt(np.add.reduceat(sq, starts) / clens)
    peak = np.maximum.reduceat(a, starts).astype(np.float64)
    clip_cnt = np.add.reduceat((a >= 0.999).astype(np.int64), starts)

    # zero crossings per segment WITHOUT counting the seams between
    # concatenated clips: cumulative crossing counts, differenced at the
    # segment interiors (robust for length-1 segments, unlike reduceat)
    sb = np.signbit(cat)
    dfull = (sb[1:] != sb[:-1]).astype(np.int64)
    c = np.concatenate([[0], np.cumsum(dfull)])
    crossings = c[np.maximum(offs[1:] - 1, starts)] - c[starts]
    with np.errstate(divide="ignore", invalid="ignore"):
        zcr = np.where(clens > 1, crossings / np.maximum(clens - 1, 1), 0.0)

    thresh = np.maximum(peak, 1e-12) * 0.01
    sil_cnt = np.add.reduceat((a < np.repeat(thresh, clens)).astype(np.int64),
                              starts)

    out["rms"][nz] = rms
    out["peak"][nz] = peak
    out["clip_ratio"][nz] = clip_cnt / clens
    out["zcr"][nz] = zcr
    sil = np.where(clens >= 2, sil_cnt / clens, 1.0)
    out["silence_ratio"][nz] = sil
    return out


def audio_qc_features(sig: np.ndarray, sr_hz: int) -> dict:
    """Per-clip audio quality-control features (the per-row validation the
    north rule's audio axis adds on top of the reference's table-level
    checks): zero-crossing rate, silence ratio, spectral centroid and
    dominant frequency via a single rfft, and low/high band energy split.

    All vectorized numpy on the decoded PCM; ~0.2-0.4 ms per ~1 s clip.
    Returns zeros for empty/degenerate signals rather than raising — QC
    features must never fail the decode stage (reference error-funnel
    contract).
    """
    out = {"zcr": 0.0, "silence_ratio": 1.0, "spectral_centroid_hz": 0.0,
           "dominant_hz": 0.0, "low_band_ratio": 0.0}
    n = sig.size
    if n < 2 or sr_hz <= 0:
        return out
    # float32 throughout: QC features don't need double precision, and at
    # 32-way parallelism the FFT/abs passes are memory-bandwidth-bound —
    # halving element width nearly doubles per-node throughput
    x = sig.astype(np.float32, copy=False)
    out["zcr"] = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])) / (n - 1))
    peak = float(np.abs(x).max())
    thresh = max(peak, 1e-12) * 0.01
    out["silence_ratio"] = float((np.abs(x) < thresh).mean())
    cen, dom, lowr = spectral_features(x, sr_hz)
    out["spectral_centroid_hz"] = cen
    out["dominant_hz"] = dom
    out["low_band_ratio"] = lowr
    return out


def spectral_features(x: np.ndarray, sr_hz: int) -> tuple:
    """(centroid_hz, dominant_hz, low_band_ratio) on a BOUNDED analysis
    window (≤SPECTRAL_WINDOW samples ≈ ¼ s at 16 kHz), zero-padded to the
    next power of two: rfft on awkward prime-factor lengths degrades
    badly, and an unbounded window would make a 2-hour clip cost 1000× a
    1-second one in the QC stage — the per-row cost must stay O(window),
    not O(clip), at 10^12-clip scale.  4096 keeps ~4 Hz bin resolution at
    16 kHz — ample for QC-grade features — and cuts the FFT share of the
    decode stage ~7× vs the earlier 16384 window (the numpy rfft is the
    measured majority of per-clip QC cost).  Bump QC_FEATURE_VERSION when
    changing analysis parameters: drift baselines are cached keyed on it.
    """
    if x.size < 2 or sr_hz <= 0:
        return 0.0, 0.0, 0.0
    w = x[:SPECTRAL_WINDOW]
    nfft = 1 << int(np.ceil(np.log2(w.size)))
    spec = np.abs(np.fft.rfft(w, n=nfft))
    if spec.size > 1:
        spec[0] = 0.0  # drop DC for centroid/dominant
        power = spec * spec
        total = float(power.sum())
        freqs = np.arange(spec.size) * (sr_hz / 2.0 / max(spec.size - 1, 1))
        if total > 0:
            lo = freqs < 1000.0
            return (float((freqs * power).sum() / total),
                    float(freqs[int(power.argmax())]),
                    float(power[lo].sum() / total))
    return 0.0, 0.0, 0.0


def resample_linear(sig: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Linear-interpolation resample to a canonical rate.

    The fingerprint front-end, not a hi-fi resampler: energy-difference
    signs (all the fingerprint keeps) survive linear interpolation, and
    np.interp is one vectorized C pass.  A production pipeline would slot
    a polyphase filter here behind the same signature."""
    if sig.size == 0 or sr_from == sr_to or sr_from <= 0 or sr_to <= 0:
        return sig.astype(np.float32, copy=False)
    n_out = max(int(round(sig.size * sr_to / sr_from)), 1)
    x = np.arange(n_out, dtype=np.float64) * (sr_from / sr_to)
    return np.interp(x, np.arange(sig.size, dtype=np.float64),
                     sig.astype(np.float64)).astype(np.float32)


#: fingerprint front-end constants (bump FP_VERSION when changing — dedup
#: indexes built from fingerprints are only comparable within a version)
FP_VERSION = 1
_FP_SR = 8000
_FP_FRAME = 512          # 64 ms at 8 kHz
_FP_HOP = 256            # 50% overlap
_FP_BANDS = 17           # 17 log-spaced bands → 16 bits per frame
_FP_FMIN, _FP_FMAX = 80.0, 3600.0


def hk_subfingerprints(sig: np.ndarray, sr_hz: int) -> np.ndarray:
    """Haitsma–Kalker audio sub-fingerprints (ISMIR 2002, "A Highly
    Robust Audio Fingerprinting System"): resample to 8 kHz, Hann-window
    64 ms frames with 50% hop, 17 log-spaced band energies per frame,
    bit(m, n) = sign of the time-and-band second difference
    (E[n,m]−E[n,m+1]) − (E[n−1,m]−E[n−1,m+1]); each frame packs to one
    16-bit sub-fingerprint.  Returns the UNIQUE uint64 sub-fingerprint
    set — codec/quantization noise rarely flips an energy-difference
    sign, so the same recording encoded as pcm16 vs µ-law yields (near-)
    identical sets while different content diverges.

    All vectorized: one strided window view, one batched rfft over the
    frame matrix, one reduceat per band edge, one packbits."""
    cache = hk_subfingerprints.__dict__
    if "hann" not in cache:
        cache["hann"] = np.hanning(_FP_FRAME).astype(np.float32)
        edges_hz = np.geomspace(_FP_FMIN, _FP_FMAX, _FP_BANDS + 1)
        bins = np.clip((edges_hz / (_FP_SR / 2.0) * (_FP_FRAME // 2)).astype(np.int64),
                       1, _FP_FRAME // 2)
        cache["band_starts"] = np.maximum.accumulate(bins)[:-1]  # monotone
        cache["pack_w"] = (np.uint64(1) << np.arange(_FP_BANDS - 1, dtype=np.uint64))
    x = resample_linear(sig, sr_hz, _FP_SR)
    if x.size < 2 * _FP_FRAME:  # need ≥2 frames for the time difference
        x = np.pad(x, (0, 2 * _FP_FRAME - x.size)) if x.size else x
        if x.size == 0:
            return np.empty(0, dtype=np.uint64)
    W = np.lib.stride_tricks.sliding_window_view(x, _FP_FRAME)[::_FP_HOP]
    W = W * cache["hann"][None, :]
    spec = np.abs(np.fft.rfft(W, axis=1)[:, : _FP_FRAME // 2]) ** 2
    E = np.add.reduceat(spec, cache["band_starts"], axis=1)  # (frames, bands)
    # Two HK robustifications for codec invariance (the raw sign rule is
    # codec-random wherever the true difference is ~0):
    # 1. log energies with a per-frame RELATIVE floor — bands holding only
    #    codec quantization noise (pure-tone clips: every band but one)
    #    clamp to the same constant instead of comparing noise floors;
    # 2. a DEAD ZONE on the time second-difference — a bit is set only
    #    when the difference exceeds 0.05 log units, so near-stationary
    #    content yields deterministic zeros, not sign-of-epsilon.
    # Stationary clips then collapse to all-zero temporal bits, so each
    # sub-fingerprint is tagged with the frame's dominant rfft BIN (9 bits,
    # codec-stable — the tone's frequency) to keep distinct tones distinct;
    # the fine bin also disperses hot fingerprints ~an-order-of-magnitude
    # better than the 17-way band index (measured: hottest shared fp over
    # 40 distinct tones 8 → 1, noise codec-overlap 0.86 → 0.97).
    dom_bin = spec.argmax(axis=1).astype(np.uint64)           # (frames,)
    E = np.log10(E + 1e-4 * E.max(axis=1, keepdims=True) + 1e-30)
    D = E[:, :-1] - E[:, 1:]                                  # band diffs
    bits = (D[1:] - D[:-1]) > 0.05                            # time diffs
    packed = (bits.astype(np.uint64) * cache["pack_w"][None, :]).sum(axis=1)
    packed |= dom_bin[1:] << np.uint64(_FP_BANDS - 1)
    return np.unique(packed)
