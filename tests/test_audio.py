"""Audio codec round-trips and the per-row invariant from
BASELINE.json.input_hint: decoded-PCM SNR ≥ 30 dB + transcript equality
against the (deterministic) reference signal."""

import numpy as np
import pytest

from anomaly_detection_ray.config import MIN_SNR_DB
from anomaly_detection_ray.functions.audio import (
    CODECS,
    AudioDecodeError,
    decode_wav,
    encode_wav,
    snr_db,
    ulaw_encode,
)

rng = np.random.default_rng(42)


@pytest.mark.parametrize("codec", CODECS)
@pytest.mark.parametrize("sr", [8000, 16000, 44100])
def test_roundtrip_snr(codec, sr):
    t = np.arange(int(sr * 0.25)) / sr
    sig = np.clip(0.6 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(t.size), -1, 1)
    dec, sr2, codec2 = decode_wav(encode_wav(sig, sr, codec))
    assert sr2 == sr and codec2 == codec and dec.size == sig.size
    assert snr_db(sig, dec) >= MIN_SNR_DB


def test_corrupt_payloads_raise():
    sig = np.sin(np.arange(800) / 100)
    payload = encode_wav(sig, 8000, "pcm16")
    with pytest.raises(AudioDecodeError):
        decode_wav(payload[: len(payload) // 2])
    with pytest.raises(AudioDecodeError):
        decode_wav(b"\x00" * 100)
    with pytest.raises(AudioDecodeError):
        decode_wav(None)


def test_ulaw_encode_decode_table_consistency():
    x = np.linspace(-1, 1, 1001)
    dec, _, _ = decode_wav(encode_wav(x, 8000, "ulaw"))
    assert np.abs(dec - x).max() < 0.04  # µ-law worst-case quantization step


def test_generator_invariant_snr_and_transcript():
    """Regenerate the synthetic generator's reference signal for a few
    clips and assert the stored payload decodes to it with SNR ≥ 30 dB,
    and the side-table transcript equals the clips transcript."""
    from anomaly_detection_ray.sources.synth import make_clips_chunk, make_transcripts_chunk

    clips = make_clips_chunk(42, 0, 200)
    tr = make_transcripts_chunk(42, 0, 200)
    tr_map = dict(zip(tr["clip_id"].to_pylist(), tr["transcript"].to_pylist()))

    # reproduce the generator's signal parameters deterministically
    n = 200
    g = np.random.default_rng((42, 0, 0))
    g.random(n)  # dup mask
    g.choice(np.array(["pcm16", "pcm8", "f32", "ulaw"]), size=n,
             p=np.array([0.80, 0.08, 0.07, 0.05]))
    g.choice(np.array([8000, 16000, 22050, 44100]), size=n,
             p=np.array([0.10, 0.70, 0.10, 0.10]))
    g.normal(650.0, 220.0, size=n)
    # skip transcripts draws
    lens = g.integers(3, 12, size=n)
    g.choice(np.array("x".split()) if False else np.array(
        "the a and of to in is it that was hello world audio clip speech test "
        "sound noise voice signal data quality check table row batch".split()),
        size=int(lens.sum()))
    g.random(n); g.random(n); g.random(n)  # null/corrupt/mismatch masks
    freqs = g.uniform(100, 2000, size=n)
    amps = g.uniform(0.2, 0.8, size=n)

    ok_checked = 0
    for i in range(n):
        payload = clips["bytes"][i].as_py()
        sr = clips["sr_hz"][i].as_py()
        cid = clips["clip_id"][i].as_py()
        try:
            dec, sr2, _ = decode_wav(payload)
        except AudioDecodeError:
            continue  # planted corruption
        dur = clips["dur_ms"][i].as_py()
        ns = dec.size
        t = np.arange(ns) / sr
        ref = amps[i] * np.sin(2 * np.pi * freqs[i] * t)
        assert snr_db(ref, dec) >= MIN_SNR_DB, f"clip {i} SNR too low"
        if cid in tr_map and tr_map[cid] is not None:
            assert tr_map[cid] == clips["transcript"][i].as_py()
        ok_checked += 1
    assert ok_checked > 150


class TestScalarBatchAgreement:
    """audio_qc_scalar_batch must agree with the per-clip reference
    formulas: integer-count features exactly, rms within float32-vs-
    float64 accumulation tolerance."""

    def test_batch_matches_per_clip(self):
        import numpy as np

        from anomaly_detection_ray.functions.audio import (
            audio_qc_features,
            audio_qc_scalar_batch,
        )

        rng = np.random.default_rng(5)
        sigs = [rng.normal(0, 0.3, n).astype(np.float32)
                for n in (0, 1, 2, 7, 500, 4096, 20000)]
        sigs.append(np.ones(64, dtype=np.float32))          # fully clipped
        sigs.append(np.zeros(64, dtype=np.float32))         # fully silent
        feats = audio_qc_scalar_batch(sigs)
        for i, s in enumerate(sigs):
            ref = audio_qc_features(s, 16000)
            assert feats["zcr"][i] == ref["zcr"], i
            assert feats["silence_ratio"][i] == ref["silence_ratio"], i
            if s.size:
                a = np.abs(s)
                assert feats["peak"][i] == float(a.max()), i
                assert feats["clip_ratio"][i] == float((a >= 0.999).mean()), i
                want_rms = float(np.sqrt(np.dot(s.astype(np.float64), s.astype(np.float64)) / s.size))
                assert abs(feats["rms"][i] - want_rms) <= 1e-9 * max(want_rms, 1), i

    def test_empty_batch(self):
        from anomaly_detection_ray.functions.audio import audio_qc_scalar_batch

        feats = audio_qc_scalar_batch([])
        assert all(len(v) == 0 for v in feats.values())


class TestAudioFingerprint:
    """Codec-invariant Haitsma-Kalker sub-fingerprints + the dedup
    pipeline over planted transcode duplicates."""

    def test_cross_codec_and_rate_invariance(self):
        import numpy as np

        from anomaly_detection_ray.functions.audio import (
            decode_wav,
            encode_wav,
            hk_subfingerprints,
        )

        def fpset(sig, sr, codec):
            dec, dsr, _ = decode_wav(encode_wav(sig, sr, codec))
            return set(hk_subfingerprints(dec, dsr).tolist())

        t = np.arange(16000) / 16000
        rng = np.random.default_rng(7)
        for sig in (0.5 * np.sin(2 * np.pi * 440 * t),
                    rng.normal(0, 0.2, 16000)):
            base = fpset(sig, 16000, "pcm16")
            for codec in ("ulaw", "pcm8", "f32"):
                s = fpset(sig, 16000, codec)
                assert len(base & s) / max(min(len(base), len(s)), 1) >= 0.6, codec
        # distinct content never matches
        a = fpset(0.5 * np.sin(2 * np.pi * 220 * t), 16000, "pcm16")
        b = fpset(0.5 * np.sin(2 * np.pi * 917 * t), 16000, "pcm16")
        assert len(a & b) == 0
        # sample-rate invariance (canonical 8 kHz front-end)
        s8 = fpset(0.5 * np.sin(2 * np.pi * 450 * np.arange(8000) / 8000), 8000, "pcm16")
        s44 = fpset(0.5 * np.sin(2 * np.pi * 450 * np.arange(44100) / 44100), 44100, "pcm16")
        assert len(s8 & s44) / max(min(len(s8), len(s44)), 1) >= 0.6

    def test_degenerate_signals(self):
        import numpy as np

        from anomaly_detection_ray.functions.audio import hk_subfingerprints, resample_linear

        assert hk_subfingerprints(np.empty(0, dtype=np.float32), 16000).size == 0
        assert hk_subfingerprints(np.zeros(100, dtype=np.float32), 16000).size >= 0
        assert resample_linear(np.empty(0, dtype=np.float32), 16000, 8000).size == 0
        x = resample_linear(np.ones(1000, dtype=np.float32), 16000, 8000)
        assert x.size == 500 and np.allclose(x, 1.0)

    def test_planted_transcode_dups_found(self, ray_session):
        from anomaly_detection_ray.pipelines.audioops import (
            audio_dedup_clips,
            audio_dup_pairs,
        )
        from anomaly_detection_ray.sources.synth import clips_dups_path
        import pyarrow.parquet as pq

        sf = "/root/testdata/sf0.001"  # -> 400-row base table
        pairs = audio_dup_pairs(sf)
        found = set(zip(pairs["a"], pairs["b"]))
        tbl = pq.read_table(clips_dups_path(400), columns=["clip_id"])
        ids = tbl["clip_id"].to_pylist()
        planted = {(i, i + "-xc") for i in ids if i + "-xc" in set(ids)}
        assert planted, "generator planted nothing at n=400"
        missed = planted - found
        assert len(missed) <= max(1, len(planted) // 10), f"missed {missed}"
        # collapse never keeps the -xc transcode of a found pair (the base
        # id sorts first; the base itself may additionally cluster with a
        # smaller near-identical tone, which is correct near-dup behavior)
        kept = set(audio_dedup_clips(sf)["clip_id"])
        for _, b in planted - missed:
            assert b not in kept
        assert len(kept) < len(ids)

    def test_join_verify_path_matches_broadcast_path(self, ray_session):
        """audio_fingerprint_pairs' verify is shape-agnostic: forcing the
        hash-join feature attach (broadcast_limit=0 — zero driver-resident
        fingerprint map) must reproduce the broadcast verify exactly."""
        import pandas as pd

        from anomaly_detection_ray.pipelines.audioops import _clips_dups_ds
        from anomaly_detection_ray.pipelines.audioops import audio_fingerprint_pairs

        def run(**kw):
            out = (audio_fingerprint_pairs(_clips_dups_ds("/root/testdata/sf0.001"),
                                           **kw).to_pandas()
                   .sort_values(["a", "b"]).reset_index(drop=True))
            return out[["a", "b", "shared", "overlap"]]

        pd.testing.assert_frame_equal(run(), run(broadcast_limit=0))

    def test_cluster_size_histogram_matches_union_find(self, ray_session):
        """audio_cluster_sizes (distributed collapse + blob exchanges) ==
        the size histogram of the single-machine union-find reference
        over the same fingerprint pair set."""
        from collections import Counter

        import pandas as pd

        from anomaly_detection_ray.pipelines.audioops import (
            _clips_dups_ds,
            audio_cluster_sizes,
            audio_fingerprint_pairs,
        )
        from anomaly_detection_ray.stages.dedup import union_find_components

        sf = "/root/testdata/sf0.001"
        got = audio_cluster_sizes(sf)
        pairs = audio_fingerprint_pairs(_clips_dups_ds(sf)).to_pandas()
        comp = union_find_components(pairs)
        sizes = Counter(Counter(comp.values()).values())
        want = (pd.DataFrame(sorted(sizes.items()),
                             columns=["cluster_size", "n_clusters"])
                .astype("int64"))
        pd.testing.assert_frame_equal(got, want)


class TestAudioSimilaritySearch:
    def test_transcode_twin_ranks_first_on_rich_signals(self, ray_session):
        """Query-by-example retrieval over a rich-signal corpus: white
        noise yields many distinct sub-fingerprints per clip, so a
        query's planted transcode must rank 1 with overlap far above any
        unrelated clip (the sf tables' pure tones are too degenerate to
        test RANKING — every stationary clip collapses to ~1 fp)."""
        import pandas as pd
        import ray.data as rd

        from anomaly_detection_ray.functions.audio import decode_wav, encode_wav
        from anomaly_detection_ray.pipelines.audioops import (
            _fp_of_payload,
            audio_similarity_search,
        )

        rng = np.random.default_rng(11)
        rows = []
        for i in range(30):
            sig = rng.normal(0, 0.3, size=8000).clip(-0.95, 0.95)
            rows.append({"clip_id": f"n-{i:03d}",
                         "bytes": encode_wav(sig, 8000, "pcm16")})
        for i in range(3):  # transcode twins of the first three
            sig, sr, _ = decode_wav(rows[i]["bytes"])
            rows.append({"clip_id": f"n-{i:03d}-xc",
                         "bytes": encode_wav(sig, sr, "ulaw")})
        corpus = rd.from_pandas(pd.DataFrame(rows)).repartition(4)

        q_fps = {r["clip_id"]: _fp_of_payload(r["bytes"]) for r in rows[:3]}
        out = audio_similarity_search(corpus, q_fps, k=3)
        for qid in q_fps:
            mine = out[out["query_id"] == qid].sort_values("rank")
            assert mine.iloc[0]["match_id"] == qid + "-xc", qid
            assert mine.iloc[0]["overlap"] >= 0.6
            if len(mine) > 1:  # unrelated noise shares almost nothing
                assert mine.iloc[1]["overlap"] <= 0.3

    def test_sf_query_entry_returns_twin_within_topk(self, ray_session):
        from anomaly_detection_ray.pipelines.audioops import audio_search

        out = audio_search("/root/testdata/sf0.001", k=5)
        assert set(out.columns) == {"query_id", "rank", "match_id",
                                    "shared", "overlap"}
        for qid, grp in out.groupby("query_id"):
            assert qid + "-xc" in set(grp["match_id"]), qid


class TestCuratedClips:
    def test_composition_drops_each_planted_class(self, ray_session):
        """The audio curation chain must drop transcode-dup losers,
        undecodable/mismatched payloads, and null transcripts — and keep
        the clean majority."""
        import pyarrow.parquet as pq

        from anomaly_detection_ray.pipelines.audioops import curated_clips
        from anomaly_detection_ray.sources.synth import clips_dups_path

        sf = "/root/testdata/sf0.001"  # 400-row base table
        kept = set(curated_clips(sf)["clip_id"])
        tbl = pq.read_table(clips_dups_path(400),
                            columns=["clip_id", "transcript"]).to_pandas()
        ids = set(tbl["clip_id"])
        # planted -xc transcodes collapse: base id sorts first, so no kept
        # clip should be an -xc twin whose base is also kept
        for cid in kept:
            if cid.endswith("-xc"):
                assert cid[:-3] not in kept, cid
        # null-transcript clips are dropped
        null_ids = set(tbl.loc[tbl["transcript"].isna(), "clip_id"])
        assert null_ids and not (null_ids & kept)
        # QC filters only trim the dedup-kept set slightly — the
        # aggressive collapse itself is the pure-tone corpus's documented
        # self-similarity (audio_dedup_clips keeps ~125 of 414 here)
        from anomaly_detection_ray.pipelines.audioops import audio_dedup_clips

        dedup_kept = set(audio_dedup_clips(sf)["clip_id"])
        assert kept <= dedup_kept
        assert len(kept) > 0.8 * len(dedup_kept)
        assert ids - dedup_kept, "collapse must actually drop dup losers"
