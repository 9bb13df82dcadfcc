"""End-to-end validation suite: planted violations are found, verdicts
follow the reference ordering, checkpoint/resume skips finished
partitions, freshness/completeness verdicts match the planted cadences."""

import os

import numpy as np
import pandas as pd
import pytest

from anomaly_detection_ray.config import SuiteConfig
from anomaly_detection_ray.pipelines import history
from anomaly_detection_ray.pipelines.validate import validate_clips
from anomaly_detection_ray.sources.synth import clips_path, history_path, transcripts_path
from anomaly_detection_ray.state.checkpoint import RunCheckpoint

N = 3000


@pytest.fixture(scope="module")
def suite_result():
    cfg = SuiteConfig(num_partitions=4, decode_concurrency=2)
    return validate_clips(clips_path(N), transcripts_path(N), config=cfg)


class TestSuite:
    def test_all_checks_present(self, suite_result):
        checks = set(suite_result.verdicts["quality_check_type"])
        assert {"schema", "null_rate", "column_stats", "uniqueness",
                "referential", "audio_decode"} <= checks

    def test_planted_violations_found(self, suite_result):
        v = suite_result.violations
        by_check = v.groupby("check").size()
        # generator plants ~0.1-0.2% of each violation class in 3000 rows
        assert by_check.get("uniqueness", 0) >= 1
        assert by_check.get("audio_decode", 0) >= 1
        assert by_check.get("referential", 0) >= 1
        assert by_check.get("null_rate", 0) >= 1
        # duplicate ids really are duplicated in the source
        dup_ids = v[v["check"] == "uniqueness"]["clip_id"]
        assert dup_ids.is_unique

    def test_transcript_rate_check(self, suite_result):
        # the synthetic dur_ms tail (N(650,220) clipped at 8 ms) plants
        # clips whose transcript is implausibly long for the duration —
        # they must surface as transcript_rate violations with the cps
        # value in the detail, while the ~0.6% natural rate stays under
        # the 1% default threshold → every partition verdict Healthy
        v = suite_result.violations
        rate = v[v["check"] == "transcript_rate"]
        assert len(rate) >= 1
        assert rate["detail"].str.contains("chars/sec outside").all()
        verd = suite_result.verdicts
        mine = verd[verd["quality_check_type"] == "transcript_rate"]
        assert len(mine) == 4  # one per partition
        assert (mine["status"] == "Healthy").all()

    def test_transcript_rate_threshold_flips(self):
        # a zero threshold makes any flagged row flip its partition — the
        # knob is live end-to-end, mirroring the per-table constant
        # threshold overrides of the reference checkers
        cfg = SuiteConfig(num_partitions=4, decode_concurrency=2,
                          transcript_rate_threshold=0.0)
        res = validate_clips(clips_path(N), transcripts_path(N), config=cfg)
        mine = res.verdicts[
            res.verdicts["quality_check_type"] == "transcript_rate"]
        flagged_parts = set(
            res.violations[res.violations["check"] == "transcript_rate"][
                "partition_id"])
        for _, r in mine.iterrows():
            want = "Unhealthy" if r["partition_id"] in flagged_parts else "Healthy"
            assert r["status"] == want, r["partition_id"]

    def test_key_bucket_observability(self, suite_result):
        """The key exchange reports per-bucket reducer cardinalities and
        SuiteConfig.key_num_buckets overrides the fan-out (VERDICT r2 #7)."""
        bd = suite_result.key_bucket_distincts
        assert bd is not None and len(bd) <= 4  # num_partitions=4 default fan-out
        # clips + transcripts keys all flow through the exchange: the union
        # of bucket dicts covers at least every distinct clip_id
        # fixture has 2000 distinct clip ids (+3 transcript-only orphans)
        assert sum(bd) >= 2000
        cfg = SuiteConfig(num_partitions=4, decode_concurrency=2,
                          key_num_buckets=11)
        res = validate_clips(clips_path(N), transcripts_path(N), config=cfg)
        assert len(res.key_bucket_distincts) == 11
        assert sum(res.key_bucket_distincts) == sum(bd)
        # verdicts are invariant to the exchange fan-out
        pd.testing.assert_frame_equal(
            res.verdicts.reset_index(drop=True),
            suite_result.verdicts.reset_index(drop=True))

    def test_verdict_ordering(self, suite_result):
        """Reference O1/O2: violations (Unhealthy) sort before Healthy."""
        from anomaly_detection_ray.functions.verdicts import HEALTH_STATUS_ORDER, status_rank

        ranks = [status_rank(s, HEALTH_STATUS_ORDER)
                 for s in suite_result.verdicts["status"]]
        assert ranks == sorted(ranks)

    def test_verdict_arrow_schema(self, suite_result):
        from anomaly_detection_ray.schema import VERDICT_SCHEMA

        t = suite_result.verdict_table()
        assert t.schema.equals(VERDICT_SCHEMA)
        # debug-map values are strings by contract
        dbg = t["additional_debug_info"][0].as_py()
        for _, inner in dbg:
            for _, val in inner:
                assert isinstance(val, str)

    def test_stats_cover_all_partitions(self, suite_result):
        assert suite_result.stats["partition_id"].nunique() == 4

    def test_deterministic(self, suite_result):
        cfg = SuiteConfig(num_partitions=4, decode_concurrency=2)
        again = validate_clips(clips_path(N), transcripts_path(N), config=cfg)
        pd.testing.assert_frame_equal(
            suite_result.verdicts.drop(columns=["evaluated_at"]),
            again.verdicts.drop(columns=["evaluated_at"]),
        )
        pd.testing.assert_frame_equal(suite_result.violations, again.violations)


class TestCheckpointResume:
    def test_resume_skips_done_partitions(self, tmp_path):
        cfg = SuiteConfig(num_partitions=4, decode_concurrency=2,
                          checks=("null_rate", "uniqueness", "audio_decode"))
        root = str(tmp_path / "run1")
        cp = RunCheckpoint(root, "clips", 1_754_000_000.0)
        res = validate_clips(clips_path(N), config=cfg, checkpoint=cp)
        assert len(cp.completed) == 4
        assert os.path.exists(os.path.join(root, "manifest.json"))

        # resumed run: everything already done → no verdict work remains
        cp2 = RunCheckpoint(root, "clips", 1_754_000_000.0)
        assert cp2.completed == cp.completed
        res2 = validate_clips(clips_path(N), config=cfg, checkpoint=cp2)
        assert len(res2.stats) == 0  # no pending partitions flowed through

        # checkpointed verdicts read back whole
        all_v = cp2.read_all("verdicts")
        assert all_v is not None
        assert set(all_v["partition_id"].to_pylist()) == cp.completed

    def test_partial_resume(self, tmp_path):
        cfg = SuiteConfig(num_partitions=4, decode_concurrency=2,
                          checks=("null_rate",))
        root = str(tmp_path / "run2")
        cp = RunCheckpoint(root, "clips", 1.0)
        res = validate_clips(clips_path(N), config=cfg, checkpoint=cp)
        # drop two partitions from the manifest → only those two re-run
        import json

        m = json.load(open(os.path.join(root, "manifest.json")))
        for pid in list(m)[:2]:
            del m[pid]
        json.dump(m, open(os.path.join(root, "manifest.json"), "w"))
        cp2 = RunCheckpoint(root, "clips", 1.0)
        res2 = validate_clips(clips_path(N), config=cfg, checkpoint=cp2)
        assert set(res2.stats["partition_id"]) == set(cp.completed) - set(m)
        assert len(cp2.completed) == 4


class TestHistoryVerdicts:
    def test_freshness_matches_planted_cadences(self):
        out = history.freshness_verdicts(history_path(20))
        st = dict(zip(out["partition_id"], out["status"]))
        # cadences cycle hourly/daily/weekly/static/late by partition index
        for p, kind in [(0, "hourly"), (1, "daily"), (2, "weekly"), (3, "static"), (4, "late")]:
            pid = f"part-{p:04d}"
            if kind in ("hourly", "daily", "weekly"):
                assert st[pid] == "Healthy", (pid, kind)
            elif kind == "static":
                assert st[pid] == "Healthy"
                assert out[out["partition_id"] == pid]["is_static"].iloc[0]
            else:  # late: hourly cadence silent for 8h → stale
                assert st[pid] == "Unhealthy", (pid, kind)

    def test_completeness_runs_all_partitions(self):
        out = history.completeness_verdicts(history_path(20))
        assert len(out) == 20
        assert set(out["status"]) <= {"Healthy", "Unhealthy", "Unknown"}

    def test_daily_volumes_deterministic(self):
        a = history.daily_history_volumes(history_path(20))
        b = history.daily_history_volumes(history_path(20))
        pd.testing.assert_frame_equal(a, b)

    def test_windowed_probe_branches(self):
        """S2 days-limit probe (table_history_utils.py:60-92): static
        partitions (latest commit 45d old → empty 14d window) fall back to
        the newest-1000 cap; hourly partitions stay on the window branch
        and train on strictly fewer commits than the uncapped total."""
        win = history.history_windowed_commits(history_path(20))
        full = history.history_update_commits(history_path(20))
        w = win.set_index("partition_id")
        f = full.set_index("partition_id")
        for p in range(20):
            pid = f"part-{p:04d}"
            kind = ["hourly", "daily", "weekly", "static", "late"][p % 5]
            if kind == "static":
                assert w.loc[pid, "used_fallback"] == 1, pid
                # fallback = newest-1000 raw then op-filter = all commits here
                assert w.loc[pid, "n_commits"] == f.loc[pid, "n_commits"], pid
            else:
                assert w.loc[pid, "used_fallback"] == 0, (pid, kind)
            if kind in ("hourly", "daily", "weekly"):
                # these series span > 14 days → window strictly narrows
                assert w.loc[pid, "n_commits"] < f.loc[pid, "n_commits"], (pid, kind)
            # the window never changes the latest surviving commit
            assert w.loc[pid, "last_commit_ts"] == f.loc[pid, "last_commit_ts"], pid

    def test_per_partition_threshold_overrides(self):
        """Reference checker override maps (freshness_checker.py:63-65,
        completeness_checker.py:57,68): a {partition_id: threshold} entry
        flips exactly that partition's verdict; all others are unchanged."""
        from anomaly_detection_ray.config import ForecastConfig

        base_f = history.freshness_verdicts(history_path(20))
        # part-0000 is hourly (last commit 600s before eval, Healthy);
        # a 1-second constant threshold makes it Stale → Unhealthy
        fcfg = ForecastConfig(freshness_threshold_overrides={"part-0000": 1.0})
        out = history.freshness_verdicts(history_path(20), fcfg=fcfg)
        st, base = (dict(zip(o["partition_id"], o["status"])) for o in (out, base_f))
        assert st["part-0000"] == "Unhealthy" and base["part-0000"] == "Healthy"
        assert {p: s for p, s in st.items() if p != "part-0000"} == \
               {p: s for p, s in base.items() if p != "part-0000"}
        row = out[out["partition_id"] == "part-0000"].iloc[0]
        assert row["rule"] == "constant_threshold"

        # completeness: a threshold above any daily volume flips to Unhealthy
        base_c = history.completeness_verdicts(history_path(20))
        ccfg = ForecastConfig(
            completeness_threshold_overrides={"part-0000": 10**9})
        cout = history.completeness_verdicts(history_path(20), fcfg=ccfg)
        cs, cb = (dict(zip(o["partition_id"], o["status"])) for o in (cout, base_c))
        assert cs["part-0000"] == "Unhealthy"
        assert {p: s for p, s in cs.items() if p != "part-0000"} == \
               {p: s for p, s in cb.items() if p != "part-0000"}
        crow = cout[cout["partition_id"] == "part-0000"].iloc[0]
        assert crow["predicted_lower_bound"] == 10**9

    def test_static_threshold_override(self):
        """static_table_threshold_override (freshness_utils.py:463-478):
        lowering the static cut below the late partition's 8h silence
        reclassifies it static-Fresh instead of stale."""
        from anomaly_detection_ray.config import ForecastConfig

        fcfg = ForecastConfig(static_table_threshold_override=6 * 3600.0)
        out = history.freshness_verdicts(history_path(20), fcfg=fcfg)
        row = out[out["partition_id"] == "part-0004"].iloc[0]  # late: 8h old
        assert row["status"] == "Healthy" and row["is_static"]
        # hourly partition (600s old) is unaffected
        hrow = out[out["partition_id"] == "part-0000"].iloc[0]
        assert hrow["status"] == "Healthy" and not hrow["is_static"]

    def test_overlapping_override_maps_rejected(self):
        from anomaly_detection_ray.config import ForecastConfig

        import pytest as _pytest
        with _pytest.raises(ValueError, match="cannot share keys"):
            ForecastConfig(freshness_threshold_overrides={"x": 1.0},
                           latency_threshold_overrides={"x": 2.0})

    def test_freshness_windowed_flag(self):
        """enable_limit_history_by_timestamp=True routes freshness through
        the windowed probe: every partition still gets a verdict, planted
        cadences keep their expected statuses, and the daily partition's
        training set provably shrank (60 commits → the ~14 in-window)."""
        from anomaly_detection_ray.config import ForecastConfig

        fcfg = ForecastConfig(enable_limit_history_by_timestamp=True)
        out = history.freshness_verdicts(history_path(20), fcfg=fcfg)
        assert len(out) == 20
        st = dict(zip(out["partition_id"], out["status"]))
        assert st["part-0000"] == "Healthy"      # hourly
        assert st["part-0003"] == "Healthy"      # static (fallback branch)
        assert out[out["partition_id"] == "part-0003"]["is_static"].iloc[0]
        assert st["part-0004"] == "Unhealthy"    # late/stale


class TestVectorAccuracy:
    def test_lsh_knn_agrees_with_brute_force(self, tmp_path):
        """LSH kNN vs brute force on clustered vectors (the driver's random
        embeddings have no neighborhood structure, so accuracy is asserted
        on a synthetic clustered table of the same schema)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from anomaly_detection_ray.pipelines.vectors import (
            brute_force_knn_labels,
            knn_label_counts,
        )

        g = np.random.default_rng(17)
        centers = g.standard_normal((10, 64)) * 3
        labels = g.integers(0, 10, 600)
        X = centers[labels] + g.standard_normal((600, 64)) * 0.5
        t = pa.table({
            "vec_id": pa.array(np.arange(600), pa.int64()),
            "embedding": pa.array([r.astype(np.float32) for r in X],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        })
        d = tmp_path / "clustered"
        d.mkdir()
        pq.write_table(t, d / "embeddings.parquet")
        approx = knn_label_counts(str(d), num_queries=20)
        exact = brute_force_knn_labels(str(d), num_queries=20)
        merged = approx.merge(exact, on="query_id", suffixes=("_a", "_e"))
        agree = (merged["predicted_label_a"] == merged["predicted_label_e"]).mean()
        assert agree >= 0.9

        # IVF variant: same bar, probing 8 of 64 trained centroids
        from anomaly_detection_ray.pipelines.vectors import ivf_knn_label_counts

        ivf = ivf_knn_label_counts(str(d), num_queries=20)
        m2 = ivf.merge(exact, on="query_id", suffixes=("_a", "_e"))
        assert (m2["predicted_label_a"] == m2["predicted_label_e"]).mean() >= 0.9

    def test_knn_candidate_count_rides_partials(self, tmp_path, monkeypatch):
        """n_candidates is summed from the top-k partial rows — the probed
        shards are read exactly once (no second Dataset.count() execution)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import ray.data
        from anomaly_detection_ray.pipelines.vectors import (
            _LshBuckets,
            build_lsh_index,
            knn_label_counts,
        )

        g = np.random.default_rng(23)
        centers = g.standard_normal((5, 64)) * 3
        labels = g.integers(0, 5, 300)
        X = centers[labels] + g.standard_normal((300, 64)) * 0.5
        t = pa.table({
            "vec_id": pa.array(np.arange(300), pa.int64()),
            "embedding": pa.array([r.astype(np.float32) for r in X],
                                  pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        })
        d = tmp_path / "knn_singlepass"
        d.mkdir()
        pq.write_table(t, d / "embeddings.parquet")

        # build the index up front (write_parquet's internals may legitimately
        # count); the _SUCCESS marker makes the knn call below skip the build,
        # so any count() during knn_label_counts is a candidate re-execution
        build_lsh_index(str(d), bits=_LshBuckets().bits)

        def boom(self):
            raise AssertionError(
                "Dataset.count() called — candidate pipeline executed twice")

        monkeypatch.setattr(ray.data.Dataset, "count", boom)
        out = knn_label_counts(str(d), num_queries=10)
        assert len(out) == 10
        # every query reports the same run-level candidate total, and it is
        # positive and bounded by the table size times probed buckets
        assert out["n_candidates"].nunique() == 1
        assert int(out["n_candidates"].iloc[0]) > 0

    def test_hll_distinct_tolerance(self):
        import duckdb

        sf = "/root/testdata/sf0.001"
        est = history.hll_distinct_users(sf)["distinct_est"].iloc[0]
        exact = duckdb.sql(
            f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'").fetchone()[0]
        assert abs(est - exact) / exact < 0.02
        # and the distributed exact-distinct twin (the oracled query) agrees
        from anomaly_detection_ray.pipelines.relational import distinct_users_exact

        ours_exact = distinct_users_exact(sf)["distinct_user_id"].iloc[0]
        assert ours_exact == exact

    def test_quantile_tolerance(self):
        import duckdb

        sf = "/root/testdata/sf0.001"
        ours = history.value_quantiles(sf)
        for _, r in ours.iterrows():
            exact = duckdb.sql(
                f"SELECT quantile_cont(value, {r['q']}) FROM '{sf}/events.parquet'"
            ).fetchone()[0]
            spread = duckdb.sql(
                f"SELECT max(value)-min(value) FROM '{sf}/events.parquet'").fetchone()[0]
            assert abs(r["value_quantile"] - exact) < 0.02 * spread


class TestJobCli:
    def test_job_run_writes_metrics_and_resumes(self, tmp_path, capsys):
        from anomaly_detection_ray.job import main
        from anomaly_detection_ray.sources.synth import clips_path, transcripts_path
        import json, os

        out = str(tmp_path / "run")
        argv = ["--clips", clips_path(3000), "--transcripts", transcripts_path(3000),
                "--out", out, "--eval-ts", "1754000000"]
        main(argv)
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["rows_validated"] == 3000
        assert metrics["partitions_skipped_resume"] == 0
        assert os.path.exists(os.path.join(out, "metrics.json"))
        assert metrics["verdict_status_counts"]

        # K2 capped entries present; K3 health checks batched to the sink
        assert metrics["check_entries"]
        hc_path = os.path.join(out, "health_checks.jsonl")
        assert os.path.exists(hc_path)
        bodies = [json.loads(l) for l in open(hc_path)]
        n_checks = sum(len(b["health_checks"]) for b in bodies)
        assert n_checks == len(metrics["check_entries"])
        assert all(len(b["health_checks"]) <= 10 for b in bodies)

        # rerun with the same --out: everything checkpointed → full skip
        main(argv)
        m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert m2["partitions_skipped_resume"] > 0
        assert m2["rows_validated"] == 0

    def test_job_spec_submit_round_trip(self, tmp_path, capsys):
        """§3.3 job-spec surface (reference detection.py:62-151): submit
        serializes SuiteConfig+ForecastConfig into a spec with metric_type
        markers; load_job_spec reconstructs them EXACTLY; `run --spec`
        executes with the spec's config applied."""
        import dataclasses as dc
        import json, os

        from anomaly_detection_ray.config import ForecastConfig, SuiteConfig
        from anomaly_detection_ray.job import load_job_spec, main
        from anomaly_detection_ray.sources.synth import clips_path, transcripts_path

        # a non-default SuiteConfig that must survive the round trip
        cfg = SuiteConfig(checks=("schema", "null_rate"),
                          null_rate_threshold=0.25, skew_salt=2)
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps(cfg.to_dict()))
        out = str(tmp_path / "run")
        spec_path = str(tmp_path / "spec.json")
        main(["submit", "--clips", clips_path(3000),
              "--transcripts", transcripts_path(3000),
              "--out", out, "--config", str(cfg_path),
              "--spec-out", spec_path, "--interval-hours", "12",
              "--notify", "oncall@example.com",
              "--eval-ts", "1754000000"])
        sub_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert sub_out["job_spec"] == spec_path and not sub_out["triggered"]

        spec = json.loads(open(spec_path).read())
        assert spec["schedule"] == {"interval_hours": 12,
                                    "pause_status": "UNPAUSED"}
        assert spec["email_notifications"]["on_failure"] == ["oncall@example.com"]
        assert spec["max_retries"] == 0
        assert {c["metric_type"] for c in spec["configs"]} == {
            "SuiteConfig", "ForecastConfig"}

        ns, cfg2, fcfg2 = load_job_spec(spec_path)
        assert dc.asdict(cfg2) == dc.asdict(cfg)  # exact config round-trip
        assert dc.asdict(fcfg2) == dc.asdict(ForecastConfig())
        assert ns.clips == clips_path(3000) and ns.eval_ts == 1754000000

        # the spec IS runnable: `run --spec` applies the embedded config
        main(["run", "--spec", spec_path])
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["rows_validated"] == 3000
        ran_checks = {e["quality_check_type"] for e in metrics["check_entries"]}
        assert ran_checks <= {"schema", "null_rate"}, ran_checks
        assert os.path.exists(os.path.join(out, "metrics.json"))

    def test_metric_caps_and_batch_retry(self):
        """The reference's cap semantics verbatim: first-100 payloads (in
        violations-first order), ≤500 payload items, 500-char errors,
        batch-of-10 emission with one retry per batch."""
        from anomaly_detection_ray.metrics import (
            HEALTH_CHECK_BATCH_SIZE,
            MAX_INFOS_WITH_PAYLOAD,
            NUM_PAYLOAD_ITEMS_LOGGED,
            build_check_entries,
            emit_health_checks,
        )

        n = 130
        verdicts = pd.DataFrame({
            "partition_id": [f"p{i:04d}" for i in range(n)],
            "quality_check_type": ["uniqueness"] * n,
            "status": ["Unhealthy"] * n,
            "evaluated_at": [pd.Timestamp("2025-08-01")] * n,
            "error_message": ["x" * 1000] + [None] * (n - 1),
            "lineage_id": [f"lid{i}" for i in range(n)],
        })
        violations = pd.DataFrame({
            "partition_id": ["p0000"] * 800,
            "check": ["uniqueness"] * 800,
            "clip_id": [f"c{i}" for i in range(800)],
            "detail": [""] * 800,
        })
        entries = build_check_entries(verdicts, violations)
        assert len(entries) == n
        with_payload = [e for e in entries if "violation_clip_ids" in e]
        assert len(with_payload) == MAX_INFOS_WITH_PAYLOAD
        assert len(entries[0]["violation_clip_ids"]) == NUM_PAYLOAD_ITEMS_LOGGED
        assert len(entries[0]["error_message"]) == 500

        calls = []

        def flaky_put(body):
            calls.append(len(body["health_checks"]))
            if len(calls) == 1:
                raise ConnectionError("transient")  # retried once, succeeds
            if len(calls) == 5:
                raise ConnectionError("hard")  # second batch attempt...

        summary = emit_health_checks(entries, flaky_put)
        assert summary["batches_total"] == 13
        assert all(c <= HEALTH_CHECK_BATCH_SIZE for c in calls)
        # batch 0 failed once then succeeded on its retry
        assert summary["checks_sent"] == n
        assert summary["failed_batches"] == []

        def dead_put(body):
            raise ConnectionError("down")

        summary2 = emit_health_checks(entries[:25], dead_put)
        assert summary2["checks_sent"] == 0
        assert summary2["failed_batches"] == [0, 1, 2]


class TestBlastRadiusWiring:
    def test_unhealthy_verdicts_carry_lineage_impact(self, ray_session):
        from anomaly_detection_ray.config import SuiteConfig
        from anomaly_detection_ray.pipelines.validate import validate_clips
        from anomaly_detection_ray.sources.synth import clips_path, transcripts_path

        cfg = SuiteConfig(num_partitions=4, checks=("null_rate", "uniqueness",
                                                    "audio_decode", "referential"))
        pids = [f"p{i:04d}" for i in range(4)]
        lineage = {p: ["gold", "ml"] for p in pids}
        pop = {"gold": 5000, "ml": 10}
        res = validate_clips(clips_path(3000), transcripts_path(3000), config=cfg,
                             lineage=lineage, popularity=pop)
        bad = res.verdicts[res.verdicts["status"] == "Unhealthy"]
        assert len(bad) > 0
        for d in bad["downstream_impact"]:
            assert d == {"impact_level": 4, "num_downstream_tables": 2,
                         "num_queries_on_affected_tables": 5010}
        ok = res.verdicts[res.verdicts["status"] == "Healthy"]
        assert all(d["num_downstream_tables"] == 0 for d in ok["downstream_impact"])


class TestEventFreshness:
    def test_healthy_stream(self, ray_session):
        from anomaly_detection_ray.pipelines.history import event_freshness_verdicts

        df = event_freshness_verdicts("/root/testdata/sf0.001")
        assert len(df) >= 3
        assert set(df["status"]) <= {"Healthy", "Unhealthy", "Unknown"}
        assert (df.loc[df["status"] != "Unknown", "n_samples"] >= 4).all()

    def test_golden_pin_sf0001(self, ray_session):
        # golden pin of the bounded two-pass re-shape: values captured from
        # the row-level searchsorted implementation on the same fixture —
        # the pre-reduced as-of path must stay bit-identical
        from anomaly_detection_ray.pipelines.history import event_freshness_verdicts

        df = event_freshness_verdicts("/root/testdata/sf0.001")
        got = {r.event_type: (r.status, r.n_samples, r.actual_latency_s,
                              r.upper_bound_s)
               for r in df.itertuples(index=False)}
        assert got == {
            "click": ("Healthy", 48, 14177.7, 25046.0),
            "error": ("Healthy", 48, 25681.8, 30613.0),
            "purchase": ("Healthy", 48, 60.0, 36595.0),
            "signup": ("Healthy", 48, 16854.8, 35250.0),
            "view": ("Healthy", 48, 3998.0, 27173.0),
        }

    def test_latency_threshold_override(self, ray_session):
        """Per-type latency override (reference F9 dispatch,
        freshness_utils.py:688-695): 'click' (actual latency ~14178s) flips
        to Unhealthy under a 1000s constant threshold; other types keep
        their model-path verdicts."""
        from anomaly_detection_ray.config import ForecastConfig
        from anomaly_detection_ray.pipelines.history import event_freshness_verdicts

        fcfg = ForecastConfig(latency_threshold_overrides={"click": 1000.0})
        df = event_freshness_verdicts("/root/testdata/sf0.001", fcfg=fcfg)
        got = {r.event_type: (r.status, r.rule, r.upper_bound_s)
               for r in df.itertuples(index=False)}
        assert got["click"] == ("Unhealthy", "event_constant_threshold", 1000.0)
        assert got["view"][0] == "Healthy" and got["view"][1] != "event_constant_threshold"

    def test_skewed_type_many_small_blocks(self, ray_session, tmp_path):
        # one hot type holds 90% of rows, spread over MANY small blocks:
        # the bounded partials must still produce the exact per-grid as-of
        # latencies (per-task memory is one batch, never a whole type)
        import pyarrow as pa
        import pyarrow.parquet as pq
        import numpy as np
        from anomaly_detection_ray.pipelines.history import event_freshness_verdicts

        rng = np.random.default_rng(11)
        base = np.datetime64("2024-01-01T00:00:00", "us")
        hot = base + (np.sort(rng.integers(0, 100 * 3600, 45_000))
                      * 1_000_000).astype("timedelta64[us]")
        cold = base + (np.arange(0, 100 * 3600, 72 * 60)
                       * 1_000_000).astype("timedelta64[us]")
        t = pa.table({
            "event_type": pa.array(["hot"] * len(hot) + ["cold"] * len(cold)),
            "ts": pa.array(np.concatenate([hot, cold])),
        })
        d = tmp_path / "skew"; d.mkdir()
        # tiny row groups → many Ray blocks → many partial rounds
        pq.write_table(t, str(d / "events.parquet"), row_group_size=2000)
        df = event_freshness_verdicts(str(d)).set_index("event_type")
        assert set(df.index) == {"hot", "cold"}
        assert (df["status"] != "Unknown").all()
        # exact single-process recomputation of the hot type's verdict
        ts = np.sort(t.filter(pa.compute.equal(t["event_type"], "hot"))["ts"]
                     .cast(pa.int64()).to_numpy() / 1e6)
        grid = ts[-1] - 3600.0 * np.arange(47, -1, -1)
        grid = grid[grid > ts[0]]
        lat = grid - ts[np.searchsorted(ts, grid, side="right") - 1]
        from anomaly_detection_ray.functions.verdicts import check_event_freshness
        now_s = max(ts[-1], np.sort(
            t.filter(pa.compute.equal(t["event_type"], "cold"))["ts"]
            .cast(pa.int64()).to_numpy() / 1e6)[-1]) + 60.0
        actual = now_s - ts[-1]
        v = check_event_freshness(np.append(lat, actual), float(actual))
        assert df.loc["hot", "status"] == v.status
        assert df.loc["hot", "n_samples"] == grid.size

    def test_stalled_type_goes_unhealthy(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import numpy as np
        from anomaly_detection_ray.pipelines.history import event_freshness_verdicts

        # steady hourly events, then one type goes silent for 3 days while
        # another keeps emitting (so 'now' advances past the stall)
        base = np.datetime64("2024-01-01T00:00:00", "us")
        live = base + (np.arange(0, 200 * 3600, 900) * 1_000_000).astype("timedelta64[us]")
        stalled = live[live < live[-1] - np.timedelta64(3, "D")]
        t = pa.table({
            "event_type": pa.array(["live"] * len(live) + ["stalled"] * len(stalled)),
            "ts": pa.array(np.concatenate([live, stalled])),
        })
        d = tmp_path / "sf0.5"; d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        df = event_freshness_verdicts(str(d)).set_index("event_type")
        assert df.loc["live", "status"] == "Healthy"
        # grid anchored at GLOBAL now: the stalled type's ~3-day final
        # latency blows past its forecast bound
        assert df.loc["stalled", "status"] == "Unhealthy"


class TestCheckPlugin:
    """§2.11 plugin surface: a user-defined Check registered by name
    produces verdict AND violation rows through the fused pass without any
    change to validate.py (reference BaseChecker/AnomalyDetector shape)."""

    def test_custom_check_end_to_end(self):
        import pyarrow.compute as pc

        from anomaly_detection_ray.checks import Check, register_check, unregister_check

        class ShortClipCheck(Check):
            name = "short_clip"
            max_allowed = 200  # flag clips shorter than 200 ms

            def row_violations(self, batch):
                bad = batch.filter(pc.less(batch["dur_ms"], self.max_allowed))
                return [(cid, pid, self.name, f"dur_ms {d} < {self.max_allowed}")
                        for cid, pid, d in zip(bad["clip_id"].to_pylist(),
                                               bad["partition_id"].to_pylist(),
                                               bad["dur_ms"].to_pylist())]

            def verdicts(self, ctx):
                per_part = (ctx.violations[ctx.violations["check"] == self.name]
                            .groupby("partition_id").size())
                return [ctx.verdict(pid, self.name,
                                    "Unhealthy" if per_part.get(pid, 0) else "Healthy",
                                    {self.name: {"n_short": str(int(per_part.get(pid, 0)))}})
                        for pid in ctx.partitions]

        register_check(ShortClipCheck())
        try:
            cfg = SuiteConfig(num_partitions=4, decode_concurrency=2,
                              checks=("schema", "null_rate", "audio_decode",
                                      "short_clip"))
            res = validate_clips(clips_path(N), config=cfg)
        finally:
            unregister_check("short_clip")
        mine = res.verdicts[res.verdicts["quality_check_type"] == "short_clip"]
        assert len(mine) == 4  # one verdict per partition
        vio = res.violations[res.violations["check"] == "short_clip"]
        # synth dur_ms ~ N(650, 220) clipped at 8 → some sub-200ms clips exist
        assert len(vio) > 0
        assert (mine["status"] == "Unhealthy").any()

    def test_failing_plugin_becomes_unknown_verdict(self):
        from anomaly_detection_ray.checks import Check, register_check, unregister_check

        class BrokenCheck(Check):
            name = "broken"

            def verdicts(self, ctx):
                raise RuntimeError("boom")

        register_check(BrokenCheck())
        try:
            cfg = SuiteConfig(num_partitions=4, decode_concurrency=2,
                              checks=("schema", "broken"))
            res = validate_clips(clips_path(N), config=cfg)
        finally:
            unregister_check("broken")
        row = res.verdicts[res.verdicts["quality_check_type"] == "broken"]
        assert len(row) == 1 and row["status"].iloc[0] == "Unknown"
        assert "boom" in row["error_message"].iloc[0]


class TestForecastConfigThreading:
    def test_adr_config_grace_override_flips_verdict(self, tmp_path, monkeypatch):
        """VERDICT r1 #10 done-bar: overriding max_grace_period_minutes via
        the ADR_CONFIG env JSON flips a freshness verdict end-to-end."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        # 10-min cadence with tiny jitter, last commit 20 min before eval:
        # default grace floor (15 min → grace 15-min < commit floor? grace =
        # max(600, 900) = 900s) keeps it Healthy; grace capped to 0 leaves
        # only the tight CI → Unhealthy.
        eval_ts = 1_754_000_000.0
        rng = np.random.default_rng(5)
        gaps = rng.normal(600, 5, 300)
        ts = (eval_ts - 1200.0) - (np.cumsum(gaps)[-1] - np.cumsum(gaps))
        metrics = [("numOutputRows", "100"), ("numFiles", "1"),
                   ("numOutputBytes", "1000"), ("numDeletedRows", "0")]
        t = pa.table({
            "partition_id": pa.array(["p0"] * len(ts)),
            "timestamp": pa.array((ts * 1e6).astype("int64"), pa.timestamp("us")),
            "operation": pa.array(["WRITE"] * len(ts)),
            "operationMetrics": pa.array([metrics] * len(ts),
                                         pa.map_(pa.string(), pa.string())),
        })
        d = tmp_path / "hist"
        d.mkdir()
        pq.write_table(t, str(d / "history.parquet"))

        monkeypatch.delenv("ADR_CONFIG", raising=False)
        base = history.freshness_verdicts(str(d), eval_ts=eval_ts)
        assert base["status"].iloc[0] == "Healthy"

        monkeypatch.setenv("ADR_CONFIG",
                           '{"forecast": {"max_grace_period_minutes": 0}}')
        tight = history.freshness_verdicts(str(d), eval_ts=eval_ts)
        assert tight["status"].iloc[0] == "Unhealthy"


class TestErrorTaxonomyAndSkips:
    def test_skip_list_produces_skipped_verdicts(self):
        cfg = SuiteConfig(num_partitions=4, decode_concurrency=2,
                          checks=("schema", "null_rate"),
                          partitions_to_skip=("p0001", "p0002"))
        res = validate_clips(clips_path(N), config=cfg)
        sk = res.verdicts[res.verdicts["status"] == "Skipped"]
        assert sorted(sk["partition_id"]) == ["p0001", "p0002"]
        assert all("skip table" in m for m in sk["error_message"])
        # skipped partitions never entered the pass
        assert set(res.stats["partition_id"]) == {"p0000", "p0003"}
        # config round-trips the skip list
        assert SuiteConfig.from_dict(cfg.to_dict()).partitions_to_skip == \
            ("p0001", "p0002")

    def test_error_codes(self):
        from anomaly_detection_ray import errors
        from anomaly_detection_ray.functions.verdicts import (
            backtest_commit_freshness,
            check_commit_freshness,
        )

        # zero updates → NO_UPDATES_IN_TABLE_HISTORY (not NOT_ENOUGH)
        v = check_commit_freshness(np.array([]), 1e9)
        assert v.error_code == errors.NO_UPDATES_IN_TABLE_HISTORY
        # backtest with <2 points carries the backtesting-specific code
        rows = backtest_commit_freshness(np.array([1_700_000_000.0]),
                                         np.array([1_700_100_000.0]))
        assert rows[0]["error_code"] == errors.NOT_ENOUGH_UPDATE_OP_BACKTESTING
        # exception classification
        assert errors.classify_exception(PermissionError("x")) == errors.PERMISSION_DENIED
        assert errors.classify_exception(ValueError("x")) == errors.USER_ERROR
        assert errors.classify_exception(RuntimeError("x")) == errors.INTERNAL_ERROR
        assert errors.match_error_message_to_code(
            errors.ERROR_CODE_TO_MESSAGE[errors.FAILED_TO_PREDICT]) == \
            errors.FAILED_TO_PREDICT

    def test_blast_radius_failure_keeps_status(self):
        cfg = SuiteConfig(num_partitions=4, decode_concurrency=2,
                          checks=("null_rate", "uniqueness", "audio_decode"))
        # lineage with a poisoned entry: get_blast_radius raises on access
        class Boom(dict):
            def get(self, k, d=None):
                raise RuntimeError("lineage service down")

            def __getitem__(self, k):
                raise RuntimeError("lineage service down")

            def __contains__(self, k):
                raise RuntimeError("lineage service down")

        res = validate_clips(clips_path(N), transcripts_path(N), config=cfg,
                             lineage=Boom())
        bad = res.verdicts[res.verdicts["status"] == "Unhealthy"]
        assert len(bad) > 0  # status kept
        assert any(m and "blast radius" in m for m in bad["error_message"])


class TestCheckpointStats:
    """Checkpoints carry per-partition stats WITH mergeable sketch bytes
    (north rule: lineage IDs + stats metrics): a resumed/incremental run
    can merge saved sketches with fresh partials instead of re-decoding."""

    def test_stats_round_trip_and_merge(self, tmp_path):
        import numpy as np

        from anomaly_detection_ray.state.sketches import Sketch

        cfg = SuiteConfig(num_partitions=4, decode_concurrency=2,
                          checks=("null_rate", "column_stats"))
        root = str(tmp_path / "run_stats")
        cp = RunCheckpoint(root, "clips", 1_754_000_000.0)
        res = validate_clips(clips_path(N), config=cfg, checkpoint=cp)

        saved = cp.read_all("stats")
        assert saved is not None
        df = saved.to_pandas()
        assert set(df["partition_id"]) == cp.completed
        # sketch bytes survive the parquet round trip and merge globally:
        # HLL union across partitions estimates the DISTINCT clip_id space
        # (the synthetic table plants duplicate ids as violations)
        import duckdb

        exact = duckdb.sql(
            f"SELECT count(DISTINCT clip_id) FROM read_parquet('{clips_path(N)}/*.parquet')"
        ).fetchone()[0]
        hlls = [Sketch.from_bytes(b) for b in
                df.loc[df["column"] == "clip_id", "hll"]]
        acc = hlls[0]
        for h in hlls[1:]:
            acc = acc.merge(h)
        est = acc.estimate()
        assert abs(est - exact) / exact < 0.05
        # counts in saved stats match the run's own stats frame
        assert int(df.loc[df["column"] == "clip_id", "count"].sum()) == N


class TestDriverViolationBounding:
    def test_referential_examples_capped_counts_exact(self, monkeypatch):
        """The driver-side referential path must bound example rows while
        the verdict's orphan COUNT stays exact (the fused checks' storm
        rule applies to the key-exchange products too)."""
        import anomaly_detection_ray.pipelines.validate as V

        cfg = SuiteConfig(num_partitions=4, decode_concurrency=2)
        full = validate_clips(clips_path(N), transcripts_path(N), config=cfg)
        ref_full = full.violations[full.violations["check"] == "referential"]
        true_orphans = len(ref_full)
        assert true_orphans > 2, "fixture must plant several orphans"

        monkeypatch.setattr(V, "VIOL_EXAMPLES_MERGE_CAP", 1)
        capped = validate_clips(clips_path(N), transcripts_path(N), config=cfg)
        ref_capped = capped.violations[capped.violations["check"] == "referential"]
        # miss + orph arms each cap at 1 → at most 2 example rows
        assert len(ref_capped) <= 2 < true_orphans
        # verdict debug counts unchanged — exact despite capped examples
        def orphan_total(res):
            v = res.verdicts
            return sum(
                int(r["referential"]["orphans"])
                for r in v.loc[v["quality_check_type"] == "referential",
                               "additional_debug_info"])
        assert orphan_total(capped) == orphan_total(full) == true_orphans


class TestRuntimeContext:
    """§2.11 execution-environment abstraction (reference context.py:17-90):
    set-once current, error on double-set/unset read, and injection into
    the job entrypoint (paths + metric sink route through the context)."""

    @pytest.fixture(autouse=True)
    def _clean_context(self):
        from anomaly_detection_ray.context import RuntimeContext

        RuntimeContext.clear()
        yield
        RuntimeContext.clear()

    def test_set_once_semantics(self):
        from anomaly_detection_ray.context import LocalRayContext, RuntimeContext

        assert not RuntimeContext.active
        with pytest.raises(RuntimeError, match="No available context"):
            RuntimeContext.current
        RuntimeContext.current = LocalRayContext()
        assert RuntimeContext.active
        with pytest.raises(RuntimeError, match="already set"):
            RuntimeContext.current = LocalRayContext()
        RuntimeContext.clear()
        assert not RuntimeContext.active

    def test_local_context_defaults(self, ray_session, tmp_path):
        from anomaly_detection_ray.context import LocalRayContext

        ctx = LocalRayContext(path_root=str(tmp_path))
        assert ctx.resolve_path("tables/clips") == str(tmp_path / "tables/clips")
        assert ctx.resolve_path("/abs/x") == "/abs/x"
        assert ctx.resolve_path("s3://bucket/x") == "s3://bucket/x"
        assert ctx.parallelism() >= 1  # reads the live Ray session

    def test_job_run_routes_through_injected_context(self, tmp_path, capsys):
        import json

        from anomaly_detection_ray.context import LocalRayContext, RuntimeContext
        from anomaly_detection_ray.job import main
        from anomaly_detection_ray.sources.synth import clips_path

        captured = []

        class RecordingContext(LocalRayContext):
            def metrics_sink(self, out_root):
                return captured.append

        RuntimeContext.current = RecordingContext()
        out = str(tmp_path / "ctxrun")
        main(["run", "--clips", clips_path(3000), "--out", out,
              "--eval-ts", "1754000000"])
        metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert metrics["rows_validated"] == 3000
        # K3 health checks went to the injected sink, not the JSONL file
        assert captured and all("health_checks" in b for b in captured)
        import os

        assert not os.path.exists(os.path.join(out, "health_checks.jsonl"))
