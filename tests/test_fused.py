"""Unit tests for the fused suite-partials stage (stages/fused.py) —
pure-Python level: partial emission, dispatcher merges, and agreement with
direct pandas computation.  (The Ray-level path is covered by
tests/test_pipeline_e2e.py.)"""

import pickle

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from anomaly_detection_ray.pipelines.validate import PARTITION_COL, _ALL_STAT_COLS, add_partition_id
from anomaly_detection_ray.sources.synth import make_clips_chunk, make_transcripts_chunk
from anomaly_detection_ray.stages.decode import DecodeStats
from anomaly_detection_ray.stages.fused import (
    KIND_KEYS,
    KIND_STATS,
    KIND_VIOL,
    SuitePartials,
    _merge_keys_group_fn,
    _merge_stats_dict,
    side_key_partials,
)

CHECKS = ("schema", "null_rate", "column_stats", "uniqueness", "referential",
          "audio_decode", "drift")


@pytest.fixture(scope="module")
def facts():
    t = pa.concat_tables([make_clips_chunk(7, c, 2000) for c in range(3)])
    return DecodeStats()(add_partition_id(8)(t))


@pytest.fixture(scope="module")
def partials_table(facts):
    sp = SuitePartials(_ALL_STAT_COLS, PARTITION_COL, num_buckets=8,
                       with_keys=True, checks=CHECKS)
    # split into two bundles to exercise cross-bundle merging
    half = facts.num_rows // 2
    return pa.concat_tables([sp(facts.slice(0, half)), sp(facts.slice(half))])


class TestPartialEmission:
    def test_null_partition_id_survives(self, facts):
        # dirty data: a NULL partition_id must fold into the "__null__"
        # sentinel partition, not TypeError the whole fused pass
        pid_idx = facts.schema.get_field_index(PARTITION_COL)
        pids = facts[PARTITION_COL].to_pylist()
        pids[0] = None
        pids[5] = None
        dirty = facts.set_column(pid_idx, PARTITION_COL,
                                 pa.array(pids, pa.string()))
        sp = SuitePartials(_ALL_STAT_COLS, PARTITION_COL, num_buckets=8,
                           with_keys=True, checks=CHECKS)
        out = sp(dirty)
        stat_pids = {p for k, p in zip(out["kind"].to_pylist(),
                                       out["partition_id"].to_pylist())
                     if k == KIND_STATS}
        assert "__null__" in stat_pids
        # every row is still counted exactly once across partitions
        counts = [pickle.loads(b)["count"]
                  for k, c, b in zip(out["kind"].to_pylist(),
                                     out["column"].to_pylist(),
                                     out["payload"].to_pylist())
                  if k == KIND_STATS and c == _ALL_STAT_COLS[0]]
        assert sum(counts) == dirty.num_rows

    def test_kinds_present(self, partials_table):
        kinds = set(partials_table["kind"].to_pylist())
        assert kinds == {KIND_STATS, KIND_KEYS, KIND_VIOL}

    def test_stats_row_count(self, partials_table):
        n = len([k for k in partials_table["kind"].to_pylist() if k == KIND_STATS])
        # 2 bundles × 8 partitions × len(stat cols)
        assert n == 2 * 8 * len(_ALL_STAT_COLS)

    def test_key_blob_sides(self, partials_table):
        blobs = [pickle.loads(p) for k, p in zip(partials_table["kind"].to_pylist(),
                                                 partials_table["payload"].to_pylist())
                 if k == KIND_KEYS]
        assert all(side == 0 for side, _ in blobs)
        # distinct keys per bundle: planted duplicate ids collapse to one
        # entry with count 2 inside a bundle, so total entries ≤ 6000
        total = sum(len(d) for _, d in blobs)
        assert 5900 < total <= 6000
        assert sum(c for _, d in blobs for c in d.values()) == 6000


class TestMerges:
    def test_stats_merge_matches_pandas(self, facts, partials_table):
        df = pa.Table.from_arrays(
            [facts["dur_ms"], facts[PARTITION_COL]], names=["dur_ms", "pid"]
        ).to_pandas()
        pdf = partials_table.to_pandas()
        for pid, g in df.groupby("pid"):
            grp = pdf[(pdf["kind"] == KIND_STATS) & (pdf["partition_id"] == pid)
                      & (pdf["column"] == "dur_ms")]
            merged = _merge_stats_dict(grp)
            assert merged["count"] == len(g)
            assert merged["min"] == g["dur_ms"].min()
            assert merged["max"] == g["dur_ms"].max()
            assert abs(merged["mean"] - g["dur_ms"].mean()) < 1e-9
            assert abs(merged["stddev"] - g["dur_ms"].std(ddof=1)) < 1e-6

    def test_key_merge_finds_planted_dups(self, facts, partials_table):
        ids = pd.Series(facts["clip_id"].to_pylist())
        true_dups = set(ids.value_counts()[lambda s: s > 1].index)
        pdf = partials_table.to_pandas()
        merge = _merge_keys_group_fn(with_ref=False)
        out, n_distinct = merge(pdf[pdf["kind"] == KIND_KEYS])
        assert set(out.loc[out["n_left"] > 1, "key"]) == true_dups
        assert n_distinct == ids.nunique()

    def test_key_merge_referential_directions(self):
        left = pa.table({"k": pa.array(["a", "a", "b", "c"])})
        right = pa.table({"k": pa.array(["a", "c", "d"])})
        from anomaly_detection_ray.stages.fused import _key_count_rows, _rows_table

        t = pa.concat_tables([
            _rows_table(_key_count_rows(left["k"], 0, 1)),
            _rows_table(_key_count_rows(right["k"], 1, 1)),
        ])
        out, n_distinct = _merge_keys_group_fn(with_ref=True)(t.to_pandas())
        assert n_distinct == 4  # a, b, c, d
        by_key = out.set_index("key")
        assert by_key.loc["a", "n_left"] == 2       # dup
        assert by_key.loc["b", "n_right"] == 0      # left orphan
        assert by_key.loc["d", "n_left"] == 0       # right orphan
        assert "c" not in by_key.index              # healthy key dies in reducer

    def test_violation_blobs_match_direct_scan(self, facts, partials_table):
        # payloads are (capped example rows, EXACT per-(pid, check)
        # counts); the counts — what verdict rules consume — must match
        # a direct scan even when examples are capped
        pdf = partials_table.to_pandas()
        viols, counts = [], {}
        for b in pdf.loc[pdf["kind"] == KIND_VIOL, "payload"]:
            ex, vc = pickle.loads(b)
            viols.extend(ex)
            for k, c in vc.items():
                counts[k] = counts.get(k, 0) + c
        vdf = pd.DataFrame(viols, columns=["clip_id", "pid", "check", "detail"])
        fdf = facts.to_pandas()
        n_null = int(fdf["transcript"].isna().sum())
        bad = ~(fdf["decode_ok"] & fdf["sr_match"] & fdf["codec_match"] & fdf["dur_match"])
        by_check = {}
        for (pid, check), c in counts.items():
            by_check[check] = by_check.get(check, 0) + c
        assert by_check.get("null_rate", 0) == n_null
        assert by_check.get("audio_decode", 0) == int(bad.sum())
        # examples are a (possibly capped) subset consistent with counts
        assert (vdf["check"] == "null_rate").sum() <= n_null
        assert (vdf["check"] == "audio_decode").sum() <= int(bad.sum())


class TestSideKeyPartials:
    def test_transcript_side_tagged_right(self):
        t = make_transcripts_chunk(7, 0, 500)
        out = side_key_partials("clip_id", 1, 4)(t)
        assert set(out["kind"].to_pylist()) == {KIND_KEYS}
        sides = {pickle.loads(b)[0] for b in out["payload"].to_pylist()}
        assert sides == {1}


class TestCombinePartialRows:
    """Pre-shuffle combiner (combine_partial_rows): merged stats must be
    BIT-identical with and without combining, and for every combine
    layout — the float sums ride as lists so the reducer's fsum sees
    every original bundle term (the layout-determinism design claim)."""

    def _stats_rows(self, facts, n_bundles):
        sp = SuitePartials(_ALL_STAT_COLS, PARTITION_COL, num_buckets=8,
                           with_keys=True, checks=CHECKS)
        chunks = [facts.slice(i * facts.num_rows // n_bundles,
                              facts.num_rows // n_bundles)
                  for i in range(n_bundles)]
        return [sp(c) for c in chunks if c.num_rows]

    def _merge_all(self, tables):
        df = pa.concat_tables(tables).to_pandas()
        stats = df[df["kind"] == KIND_STATS]
        out = {}
        for (pid, col), g in stats.groupby(["partition_id", "column"]):
            out[(pid, col)] = _merge_stats_dict(g)
        return out

    def test_bit_identical_across_combine_layouts(self, facts):
        from anomaly_detection_ray.stages.fused import combine_partial_rows

        bundles = self._stats_rows(facts, 6)
        plain = self._merge_all(bundles)
        # layout A: combine all six bundles in one call
        combined_a = [combine_partial_rows(pa.concat_tables(bundles))]
        # layout B: two combiner calls over different groupings, then merge
        combined_b = [combine_partial_rows(pa.concat_tables(bundles[:2])),
                      combine_partial_rows(pa.concat_tables(bundles[2:]))]
        # layout C: combiner applied twice (idempotence / chainability)
        combined_c = [combine_partial_rows(pa.concat_tables(combined_b))]
        for tag, tables in (("A", combined_a), ("B", combined_b), ("C", combined_c)):
            got = self._merge_all(tables)
            assert set(got) == set(plain), tag
            for k in plain:
                p, q = plain[k], got[k]
                for f in ("count", "nulls", "min", "max", "mean", "stddev",
                          "null_rate", "distinct_est"):
                    assert p[f] == q[f], (tag, k, f, p[f], q[f])

    def test_keys_and_violations_pass_through(self, facts):
        from anomaly_detection_ray.stages.fused import combine_partial_rows

        bundles = self._stats_rows(facts, 4)
        raw = pa.concat_tables(bundles).to_pandas()
        comb = combine_partial_rows(pa.concat_tables(bundles)).to_pandas()
        # key rows: byte-identical pass-through
        raw_keys = sorted(raw[raw["kind"] == KIND_KEYS]["payload"])
        comb_keys = sorted(comb[comb["kind"] == KIND_KEYS]["payload"])
        assert raw_keys == comb_keys
        # violation payloads: example multiset and exact counts both
        # survive combining unchanged (caps don't bite at fixture scale)
        def viols(df):
            out, counts = [], {}
            for b in df[df["kind"] == KIND_VIOL]["payload"]:
                ex, vc = pickle.loads(b)
                out.extend(ex)
                for k, c in vc.items():
                    counts[k] = counts.get(k, 0) + c
            return sorted(out), counts
        assert viols(raw) == viols(comb)


class TestViolationStormBounding:
    def test_storm_caps_examples_keeps_exact_counts(self, facts):
        """A systematically-broken table (every row failing
        transcript_rate) must ship bounded example rows but exact
        counts — the driver-side violation table cannot grow with the
        corpus."""
        sp = SuitePartials(_ALL_STAT_COLS, PARTITION_COL, num_buckets=8,
                           with_keys=False,
                           checks=("transcript_rate",),
                           cps_bounds=(1e9, 1e9 + 1),  # everything violates
                           viol_examples_per_block=10)
        out = sp(facts).to_pandas()
        ex, vc = pickle.loads(
            out.loc[out["kind"] == KIND_VIOL, "payload"].iloc[0])
        n_eligible = int(pa.compute.sum(
            pa.compute.and_(pa.compute.is_valid(facts["transcript"]),
                            pa.compute.greater(facts["dur_ms"], 0))).as_py())
        assert len(ex) == 10  # capped
        assert sum(vc.values()) == n_eligible  # exact despite the cap
        assert all(k[1] == "transcript_rate" for k in vc)

    def test_merge_cap_bounds_reducer_examples(self):
        from anomaly_detection_ray.stages.fused import _merge_viol_payloads

        payloads = [pickle.dumps(
            ([(f"c{i}-{j}", "p0", "transcript_rate", "d")] * 400,
             {("p0", "transcript_rate"): 400}))
            for i, j in [(i, 0) for i in range(5)]]
        ex, vc = _merge_viol_payloads(payloads, cap_per_check=1000)
        assert len(ex) == 1000
        assert vc[("p0", "transcript_rate")] == 2000
