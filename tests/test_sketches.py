"""Sketch merge laws: associativity / order-invariance / accuracy bounds
(SURVEY.md §5: the merge laws are the engine's correctness pivot — two runs
with different block layouts must produce identical verdicts)."""

import numpy as np
import pytest

from anomaly_detection_ray.state.sketches import (
    BloomFilter,
    FreqSketch,
    HyperLogLog,
    MinHasher,
    Sketch,
    TDigest,
    chi_square,
    hamming64,
    ks_statistic,
    simhash64,
)

rng = np.random.default_rng(12345)


def _ids(n, card):
    return np.array([f"id-{i}" for i in rng.integers(0, card, size=n)], dtype=object)


class TestHLL:
    def test_accuracy(self):
        vals = _ids(100_000, 30_000)
        h = HyperLogLog().add_many(vals)
        exact = len(set(vals.tolist()))
        assert abs(h.estimate() - exact) / exact < 0.03

    def test_merge_order_invariance(self):
        vals = _ids(30_000, 10_000)
        chunks = np.array_split(vals, 7)
        whole = HyperLogLog().add_many(vals)
        # merge in two different orders → identical registers
        a = HyperLogLog()
        for c in chunks:
            a.merge(HyperLogLog().add_many(c))
        b = HyperLogLog()
        for c in reversed(chunks):
            b.merge(HyperLogLog().add_many(c))
        assert np.array_equal(a.registers, b.registers)
        assert np.array_equal(a.registers, whole.registers)

    def test_serialization(self):
        h = HyperLogLog().add_many(_ids(1000, 500))
        h2 = Sketch.from_bytes(h.to_bytes())
        assert h2.estimate() == h.estimate()

    def test_small_range_correction(self):
        h = HyperLogLog().add_many(np.array(["a", "b", "c"], dtype=object))
        assert 2.5 <= h.estimate() <= 3.5


class TestTDigest:
    def test_quantile_accuracy(self):
        x = rng.normal(100, 15, 200_000)
        td = TDigest()
        for c in np.array_split(x, 23):
            td.add_many(c)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            assert abs(td.quantile([q])[0] - np.quantile(x, q)) < 0.5

    def test_merge_matches_whole(self):
        x = rng.exponential(5, 100_000)
        whole = TDigest().add_many(x)
        parts = [TDigest().add_many(c) for c in np.array_split(x, 9)]
        merged = parts[0]
        for p in parts[1:]:
            merged.merge(p)
        qs = [0.1, 0.5, 0.9, 0.99]
        assert np.allclose(merged.quantile(qs), whole.quantile(qs), rtol=0.05, atol=0.1)

    def test_ks_detects_shift(self):
        a = TDigest().add_many(rng.normal(0, 1, 50_000))
        b = TDigest().add_many(rng.normal(0.5, 1, 50_000))
        c = TDigest().add_many(rng.normal(0, 1, 50_000))
        assert ks_statistic(a, b) > 0.15
        assert ks_statistic(a, c) < 0.03

    def test_total_weight(self):
        td = TDigest().add_many(np.arange(1000.0))
        assert td.total_weight == 1000


class TestBloom:
    def test_no_false_negatives(self):
        keys = np.array([f"k{i}" for i in range(20_000)], dtype=object)
        bf = BloomFilter(20_000, 0.01).add_many(keys)
        assert bf.contains_many(keys).all()

    def test_fpp_bound(self):
        keys = np.array([f"k{i}" for i in range(20_000)], dtype=object)
        other = np.array([f"x{i}" for i in range(20_000)], dtype=object)
        bf = BloomFilter(20_000, 0.01).add_many(keys)
        assert bf.contains_many(other).mean() < 0.03

    def test_merge(self):
        a = BloomFilter(1000, 0.01).add_many(np.array(["a", "b"], dtype=object))
        b = BloomFilter(1000, 0.01).add_many(np.array(["c"], dtype=object))
        a.merge(b)
        assert a.contains_many(np.array(["a", "b", "c"], dtype=object)).all()


class TestFreq:
    def test_merge_and_chi2(self):
        f1 = FreqSketch().add_many(["a"] * 500 + ["b"] * 500)
        f2 = FreqSketch().add_many(["a"] * 500 + ["b"] * 500)
        f1.merge(f2)
        assert f1.counts == {"a": 1000, "b": 1000}
        same = FreqSketch().add_many(["a"] * 100 + ["b"] * 100)
        stat, dof = chi_square(same, f1)
        assert stat < 1e-9 and dof == 1
        skew = FreqSketch().add_many(["a"] * 190 + ["b"] * 10)
        stat2, _ = chi_square(skew, f1)
        assert stat2 > 100

    def test_add_counts_admits_heavy_hitters_first(self):
        # over-cap slice: the retained key set must be the heaviest keys
        # (matching add_many's value_counts order), not insertion order
        keys = [f"k{i:04d}" for i in range(8)]
        counts = [10, 500, 3, 400, 7, 300, 1, 200]
        f = FreqSketch(cap=4)
        f.add_counts(np.array(keys, dtype=object), np.array(counts))
        kept = set(f.counts) - {FreqSketch.OTHER}
        assert kept == {"k0001", "k0003", "k0005", "k0007"}
        assert f.counts[FreqSketch.OTHER] == 10 + 3 + 7 + 1
        assert f.total == sum(counts)

    def test_add_counts_deterministic_ties(self):
        # equal counts: admission falls back to key order, so two layouts
        # of the same pairs produce identical sketches
        keys = np.array([f"t{i}" for i in range(6)], dtype=object)
        counts = np.array([5] * 6)
        a = FreqSketch(cap=3).add_counts(keys, counts)
        b = FreqSketch(cap=3).add_counts(keys[::-1], counts)
        assert a.counts == b.counts


class TestMinHashSimHash:
    def test_jaccard_estimate(self):
        mh = MinHasher(256)
        a = np.arange(0, 1000, dtype=np.uint64)
        b = np.arange(200, 1200, dtype=np.uint64)
        est = (mh.signature(a) == mh.signature(b)).mean()
        true = 800 / 1200
        assert abs(est - true) < 0.1

    def test_simhash_similarity(self):
        t = rng.integers(0, 2**63, size=200).astype(np.uint64)
        full = simhash64(t)
        near = simhash64(t[:190])
        far = simhash64(rng.integers(0, 2**63, size=200).astype(np.uint64))
        assert hamming64(np.array([near]), full)[0] < hamming64(np.array([far]), full)[0]


def test_hll_sparse_wire_format_roundtrip():
    """Sparse serialization: small partials ship ~idx/val pairs, not the
    dense 16 KiB register array; dense kicks in past 1/8 occupancy; both
    restore to identical registers and merge with old dense payloads."""
    import numpy as np

    from anomaly_detection_ray.state.sketches import HyperLogLog, Sketch

    small = HyperLogLog().add_many(np.arange(50))
    raw = small.to_bytes()
    assert len(raw) < 2048  # dense would be >16 KiB
    back = Sketch.from_bytes(raw)
    assert np.array_equal(back.registers, small.registers)

    big = HyperLogLog().add_many(np.arange(100_000))
    raw_big = big.to_bytes()
    assert len(raw_big) > 16_000  # dense format retained at high occupancy
    back_big = Sketch.from_bytes(raw_big)
    assert np.array_equal(back_big.registers, big.registers)

    # sparse-restored merges with dense-restored exactly
    merged = back.merge(back_big)
    ref = HyperLogLog().add_many(np.arange(50)).merge(
        HyperLogLog().add_many(np.arange(100_000)))
    assert np.array_equal(merged.registers, ref.registers)


class TestOnePermMinHash:
    """OnePermMinHasher: the O(shingles) scale path for LSH signatures.
    Pinned against the k-permutation affine MinHasher as the estimator
    reference (both must track true Jaccard within binomial error)."""

    def test_batch_equals_single_and_empty_rows(self):
        import numpy as np

        from anomaly_detection_ray.state.sketches import OnePermMinHasher

        rng = np.random.default_rng(0)
        oph = OnePermMinHasher(128)
        sets = [np.unique(rng.integers(0, 2**64, size=s, dtype=np.uint64))
                for s in (500, 3, 50_000)] + [np.empty(0, dtype=np.uint64)]
        batch = oph.signatures(sets)
        for i, s in enumerate(sets):
            assert np.array_equal(batch[i], oph.signature(s)), i
        assert (batch[3] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()

    def test_densification_fills_every_bin_deterministically(self):
        import numpy as np

        from anomaly_detection_ray.state.sketches import OnePermMinHasher

        oph = OnePermMinHasher(128)
        tiny = np.unique(np.random.default_rng(1).integers(
            0, 2**64, size=5, dtype=np.uint64))  # ≥123 empty bins
        s1, s2 = oph.signature(tiny), oph.signature(tiny)
        assert np.array_equal(s1, s2)
        assert (s1 != np.uint64(0xFFFFFFFFFFFFFFFF)).all()
        # identical docs always collide on every component
        assert np.array_equal(oph.signatures([tiny, tiny])[0],
                              oph.signatures([tiny, tiny])[1])

    def test_estimator_tracks_jaccard_like_affine(self):
        import numpy as np

        from anomaly_detection_ray.state.sketches import MinHasher, OnePermMinHasher

        oph, mh = OnePermMinHasher(128), MinHasher(128)
        errs_o, errs_a = [], []
        for t in range(25):
            r = np.random.default_rng(t)
            sh = np.unique(r.integers(0, 2**64, size=400, dtype=np.uint64))
            a = np.unique(np.concatenate(
                [sh, r.integers(0, 2**64, size=200, dtype=np.uint64)]))
            b = np.unique(np.concatenate(
                [sh, r.integers(0, 2**64, size=200, dtype=np.uint64)]))
            tj = np.intersect1d(a, b).size / np.union1d(a, b).size
            sa, sb = oph.signatures([a, b])
            errs_o.append(float((sa == sb).mean()) - tj)
            errs_a.append(float((mh.signature(a) == mh.signature(b)).mean()) - tj)
        # unbiased within noise, and variance comparable to true k-perm
        assert abs(np.mean(errs_o)) < 0.03
        assert np.std(errs_o) < 2.5 * max(np.std(errs_a), 0.02)


def test_simhash_concat_matches_per_doc():
    import numpy as np

    from anomaly_detection_ray.state.sketches import simhash64, simhash64_concat

    rng = np.random.default_rng(3)
    sets = [rng.integers(0, 2**64, size=s, dtype=np.uint64)
            for s in (100, 1, 0, 7, 3000)]
    sizes = np.array([s.size for s in sets])
    concat = np.concatenate([s for s in sets if s.size])
    got = simhash64_concat(concat, sizes)
    ref = np.array([simhash64(s) for s in sets], dtype=np.uint64)
    assert np.array_equal(got, ref)
    assert got[2] == np.uint64(0)  # empty doc


def test_freq_merge_overflow_retains_heavy_hitters():
    """Partials built under cap keep np.unique value order in their dicts
    (add_counts skips its sort); when merging pushes the target past cap,
    merge() must still admit the incoming heavy hitters before dumping
    light keys into __other__ — the only property chi-square drift
    consumes (stages/fused.py combine_partial_rows)."""
    import numpy as np

    from anomaly_detection_ray.state.sketches import FreqSketch

    a = FreqSketch(cap=10)
    a.add_counts([f"a{i:02d}" for i in range(8)], [1] * 8)  # fills 8/10
    b = FreqSketch(cap=10)
    # under-cap slice: dict order is insertion (value) order, with the
    # heavy key LAST — exactly the order the skipped sort leaves behind
    b.add_counts([f"b{i:02d}" for i in range(5)] + ["zz_heavy"],
                 [1] * 5 + [1000])
    a.merge(b)
    assert "zz_heavy" in a.counts, "heavy hitter dumped into __other__"
    assert a.counts["zz_heavy"] == 1000
    assert a.total == 8 + 5 + 1000


def test_sql_replayable_hash_pins():
    """Pin the ARX-mod-2⁶⁴ hash kernels with literal vectors: the DuckDB
    oracles for the LSH near-dup family and the HLL sketch embed these
    algorithms as SQL constants, so ANY change to the Python side
    silently breaks value-hash parity — this test makes it loud."""
    import numpy as np

    from anomaly_detection_ray.functions.hashing import (
        kr64_token_hashes,
        splitmix64,
    )
    from anomaly_detection_ray.functions.text import char_shingle_hashes

    assert [int(x) for x in splitmix64(
        np.array([0, 1, 2**63, 2**64 - 1], dtype=np.uint64))] == [
        16294208416658607535, 10451216379200822465,
        5196802822362493915, 16490336266968443936]
    # non-empty tokens only (the documented contract: an empty token
    # would alias its neighbor through reduceat's empty-segment rule)
    assert [int(x) for x in kr64_token_hashes(["a", "the quick"])] == [
        5718913436695043505, 8056682574088413018]
    # poly-mod-2⁶⁴ + murmur finalizer over 5-char shingles
    assert [int(x) for x in char_shingle_hashes("abcdef", 5)] == [
        10771257853838465416, 17157846095354578881]
