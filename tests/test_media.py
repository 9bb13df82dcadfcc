"""Multimodal (image/video binary column) codec + stage tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from anomaly_detection_ray.functions.media import (
    MediaDecodeError,
    MediaStubError,
    decode_image,
    decode_video_header,
    encode_ppm,
    encode_video,
    resize_nearest,
    sample_frames,
)
from anomaly_detection_ray.sources.synth import make_images_chunk, make_videos_chunk
from anomaly_detection_ray.stages.media import ImageFeatures, VideoFrameStats, image_stage, video_stage


class TestImageCodec:
    def test_ppm_roundtrip(self):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
        dec, fmt = decode_image(encode_ppm(arr))
        assert fmt == "ppm"
        np.testing.assert_array_equal(dec, arr)

    def test_pgm_roundtrip(self):
        arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
        dec, fmt = decode_image(encode_ppm(arr))
        assert fmt == "pgm"
        np.testing.assert_array_equal(dec, arr)

    def test_comment_in_header(self):
        arr = np.zeros((2, 3), dtype=np.uint8)
        raw = encode_ppm(arr).replace(b"P5\n", b"P5\n# a comment\n")
        dec, _ = decode_image(raw)
        assert dec.shape == (2, 3)

    def test_truncated_raises(self):
        raw = encode_ppm(np.zeros((10, 10, 3), dtype=np.uint8))
        with pytest.raises(MediaDecodeError, match="truncated"):
            decode_image(raw[: len(raw) // 2])

    def test_jpeg_magic_is_stub(self):
        with pytest.raises(MediaStubError):
            decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)

    def test_garbage_raises(self):
        with pytest.raises(MediaDecodeError):
            decode_image(b"notanimageatall")

    def test_resize_nearest(self):
        arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
        out = resize_nearest(arr, 2, 2)
        np.testing.assert_array_equal(out, [[0, 2], [8, 10]])
        up = resize_nearest(arr, 8, 8)
        assert up.shape == (8, 8) and up[0, 0] == 0 and up[-1, -1] == 15


class TestVideoCodec:
    def test_roundtrip_header(self):
        frames = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
        raw = encode_video(frames)
        assert decode_video_header(raw) == (2, 3, 4, 1)

    def test_sample_frames_even_stride(self):
        frames = np.stack([np.full((2, 2), i, dtype=np.uint8) for i in range(10)])
        idx, got = sample_frames(encode_video(frames), 4)
        assert list(idx) == [0, 2, 5, 7]
        np.testing.assert_array_equal(got[:, 0, 0], idx.astype(np.uint8))

    def test_sample_more_than_available(self):
        frames = np.zeros((3, 2, 2), dtype=np.uint8)
        idx, got = sample_frames(encode_video(frames), 16)
        assert len(idx) == 3 and got.shape == (3, 2, 2)

    def test_truncated_raises(self):
        raw = encode_video(np.zeros((4, 8, 8), dtype=np.uint8))
        with pytest.raises(MediaDecodeError, match="truncated"):
            sample_frames(raw[: len(raw) - 10], 2)

    def test_mp4_magic_is_stub(self):
        with pytest.raises(MediaStubError):
            decode_video_header(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16)


class TestMediaStages:
    def test_image_features_batch(self):
        t = make_images_chunk(seed=1, chunk=0, n=3000)
        out = ImageFeatures()(t)
        assert out.num_rows == 3000 and "bytes" not in out.column_names
        ok = np.asarray(out["decode_ok"])
        # planted corrupt + stub rows exist but are rare
        assert 0 < (~ok).sum() < 60
        errs = [e for e in out["decode_error"].to_pylist() if e]
        assert any(e.startswith("stub:") for e in errs)
        # dims/format agree except planted mismatches
        assert np.asarray(out["dims_match"])[ok].mean() > 0.98
        assert np.asarray(out["format_match"])[ok].all()
        thumb = out["thumbnail"][0]
        assert len(thumb) == 64

    def test_video_stats_batch(self):
        t = make_videos_chunk(seed=1, chunk=0, n=200)
        out = VideoFrameStats(frames_per_video=4)(t)
        ok = np.asarray(out["decode_ok"])
        assert 0 < ok.sum() <= 200 and "bytes" not in out.column_names
        assert np.asarray(out["sampled_frames"])[ok].max() <= 4
        # planted frame-count mismatches are rare
        assert np.asarray(out["frames_match"])[ok].mean() > 0.98
        # frames differ by a small drift → nonzero motion for most
        assert np.asarray(out["inter_frame_delta"])[ok].mean() > 0

    def test_image_stage_dataset(self, ray_session):
        ds = ray.data.from_arrow(make_images_chunk(seed=2, chunk=0, n=400))
        feats = image_stage(ds, batch_size=64, concurrency=2)
        df = feats.to_pandas()
        assert len(df) == 400
        assert df["decode_ok"].mean() > 0.98

    def test_video_stage_dataset(self, ray_session):
        ds = ray.data.from_arrow(make_videos_chunk(seed=2, chunk=0, n=150))
        feats = video_stage(ds, frames_per_video=3, batch_size=32, concurrency=2)
        df = feats.to_pandas()
        assert len(df) == 150
        assert (df.loc[df["decode_ok"], "sampled_frames"] <= 3).all()


class TestMediaPipelines:
    def test_image_format_stats(self, ray_session, tmp_path, monkeypatch):
        monkeypatch.setenv("ADR_SYNTH_CACHE", str(tmp_path))
        import anomaly_detection_ray.sources.synth as synth

        monkeypatch.setattr(synth, "_CACHE_ROOT", str(tmp_path))
        from anomaly_detection_ray.pipelines.media import image_format_stats

        df = image_format_stats("/root/testdata/sf0.001")
        assert set(df["format"]) == {"pgm", "ppm"}
        assert (df["n_ok"] <= df["n_images"]).all()
        assert (df["n_ok"] > 0).all()

    def test_video_frame_summary(self, ray_session, tmp_path, monkeypatch):
        import anomaly_detection_ray.sources.synth as synth

        monkeypatch.setattr(synth, "_CACHE_ROOT", str(tmp_path))
        from anomaly_detection_ray.pipelines.media import video_frame_summary

        df = video_frame_summary("/root/testdata/sf0.001")
        assert df["n_videos"].sum() >= 200
        assert (df["n_ok"] <= df["n_videos"]).all()
