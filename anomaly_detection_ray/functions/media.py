"""Multimodal payload codecs: images and video as opaque ``binary`` columns.

The reference's only binary-typed data path is the cloudpickled model blob
column (reference third_party/common.py:177-220); our engine generalizes
that to media payload columns with typed metadata (SURVEY.md §1.3).  Two
payload families are REAL here (decodable with numpy alone, no external
libs):

- **PPM (P6) / PGM (P5)** raster images — the public Netpbm binary formats
  (magic + ASCII dims + maxval + raw samples).
- **RVID** — a deterministic raw-frame video container used by the synthetic
  generator: ``b"RVID" u16 h, u16 w, u8 c, u16 nframes`` header followed by
  ``nframes`` concatenated uint8 frames.  It exists so the Ray-side
  frame-sampling plumbing (schema, batch sizing, actor signature, output
  layout) is real and tested.

JPEG/PNG/MP4 decode requires codec libraries that are NOT in this
container; those magics are detected and raise :class:`MediaStubError`
(a clearly-marked stub per the build brief) so the pipeline surfaces them
as typed decode violations rather than crashing.
"""

from __future__ import annotations

import numpy as np

_JPEG_MAGIC = b"\xff\xd8\xff"
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_RVID_MAGIC = b"RVID"


class MediaDecodeError(ValueError):
    """Payload is corrupt / not a recognized media container."""


class MediaStubError(NotImplementedError):
    """Recognized format whose decoder is stubbed in this environment
    (jpeg/png/mp4 — codec libs absent; see module docstring)."""


# --------------------------------------------------------------------------
# Netpbm (PPM P6 / PGM P5) — real decode/encode
# --------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 HxW (grayscale → P5) or HxWx3 (→ P6) to Netpbm bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        magic = b"P5"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + arr.tobytes()


def _parse_pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Return (magic, width, height, maxval, data_offset).  Handles the
    whitespace/comment grammar of the Netpbm spec."""
    if len(payload) < 2:
        raise MediaDecodeError("payload too short for PNM header")
    magic = payload[:2]
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(payload):
            raise MediaDecodeError("truncated PNM header")
        ch = payload[pos:pos + 1]
        if ch.isspace():
            pos += 1
        elif ch == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise MediaDecodeError("unterminated PNM comment")
            pos = nl + 1
        elif ch.isdigit():
            end = pos
            while end < len(payload) and payload[end:end + 1].isdigit():
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
        else:
            raise MediaDecodeError(f"bad PNM header byte {ch!r}")
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    return magic, w, h, maxval, pos


def decode_image(payload: bytes) -> tuple[np.ndarray, str]:
    """binary payload → (uint8 array HxW or HxWx3, format string).

    Raises MediaDecodeError on corrupt payloads, MediaStubError on
    recognized-but-stubbed formats (jpeg/png).
    """
    if payload is None or len(payload) < 8:
        raise MediaDecodeError("empty/short payload")
    if payload.startswith(_JPEG_MAGIC):
        raise MediaStubError("jpeg decode stubbed: no codec lib in this environment")
    if payload.startswith(_PNG_MAGIC):
        raise MediaStubError("png decode stubbed: no codec lib in this environment")
    if payload[:2] not in (b"P5", b"P6"):
        raise MediaDecodeError(f"unknown image magic {payload[:4]!r}")
    magic, w, h, maxval, off = _parse_pnm_header(payload)
    if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
        raise MediaDecodeError(f"implausible dims {w}x{h}")
    if maxval != 255:
        raise MediaDecodeError(f"unsupported maxval {maxval}")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    body = payload[off:off + need]
    if len(body) != need:
        raise MediaDecodeError(f"truncated image body: {len(body)} of {need} bytes")
    arr = np.frombuffer(body, dtype=np.uint8)
    arr = arr.reshape(h, w, 3) if channels == 3 else arr.reshape(h, w)
    return arr, "ppm" if channels == 3 else "pgm"


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather — pure numpy, vectorized."""
    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[rows][:, cols]


# --------------------------------------------------------------------------
# RVID fake video container — real plumbing, deterministic payloads
# --------------------------------------------------------------------------

_RVID_HEADER = 4 + 2 + 2 + 1 + 2  # magic, h, w, c, nframes


def encode_video(frames: np.ndarray) -> bytes:
    """uint8 (nframes, h, w) or (nframes, h, w, 3) → RVID bytes."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        n, h, w = frames.shape
        c = 1
    elif frames.ndim == 4 and frames.shape[3] == 3:
        n, h, w, c = frames.shape
    else:
        raise ValueError(f"unsupported frames shape {frames.shape}")
    head = (_RVID_MAGIC
            + int(h).to_bytes(2, "big") + int(w).to_bytes(2, "big")
            + int(c).to_bytes(1, "big") + int(n).to_bytes(2, "big"))
    return head + frames.tobytes()


def decode_video_header(payload: bytes) -> tuple[int, int, int, int]:
    """RVID payload → (nframes, h, w, c) without touching frame data."""
    if payload is None or len(payload) < _RVID_HEADER:
        raise MediaDecodeError("payload too short for RVID header")
    if payload[:4] != _RVID_MAGIC:
        if payload[4:8] == b"ftyp":  # ISO-BMFF (mp4/mov) box signature
            raise MediaStubError("mp4 decode stubbed: no codec lib in this environment")
        raise MediaDecodeError(f"unknown video magic {payload[:4]!r}")
    h = int.from_bytes(payload[4:6], "big")
    w = int.from_bytes(payload[6:8], "big")
    c = payload[8]
    n = int.from_bytes(payload[9:11], "big")
    if not (0 < h <= 1 << 12 and 0 < w <= 1 << 12 and c in (1, 3) and n > 0):
        raise MediaDecodeError(f"implausible RVID header h={h} w={w} c={c} n={n}")
    return n, h, w, c


def sample_frames(payload: bytes, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Evenly-strided sample of ≤k frames → (indices, uint8 (m,h,w[,3])).

    Only the sampled frames are sliced out of the payload — the analogue of
    range-reads against a real container so a 10 GB video never fully
    materializes in a worker.
    """
    n, h, w, c = decode_video_header(payload)
    frame_bytes = h * w * c
    need = _RVID_HEADER + n * frame_bytes
    if len(payload) < need:
        raise MediaDecodeError(f"truncated RVID body: {len(payload)} of {need} bytes")
    m = min(max(k, 1), n)
    idx = np.unique((np.arange(m) * n) // m)
    frames = np.empty((len(idx), frame_bytes), dtype=np.uint8)
    for j, i in enumerate(idx):
        off = _RVID_HEADER + int(i) * frame_bytes
        frames[j] = np.frombuffer(payload[off:off + frame_bytes], dtype=np.uint8)
    shape = (len(idx), h, w) if c == 1 else (len(idx), h, w, 3)
    return idx, frames.reshape(shape)
