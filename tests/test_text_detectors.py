"""Text analysis functions and the SPOT / Huber streaming detectors."""

import numpy as np
import pandas as pd
import pytest

from anomaly_detection_ray.functions.detectors import (
    DSpotDetector,
    HuberDetector,
    SpotDetector,
    huber_location_scale,
)
from anomaly_detection_ray.functions.text import (
    char_shingle_hashes,
    detect_language,
    jaccard,
    md5_fingerprint,
    quality_score,
    token_count_bpeish,
    token_count_ws,
    winnow_fingerprints,
    word_ngram_sets,
)

rng = np.random.default_rng(5)


class TestText:
    def test_token_counts(self):
        s = pd.Series(["a b  c", "", None, "  x  ", "one"])
        assert token_count_ws(s).tolist() == [3, 0, 0, 1, 1]
        assert token_count_bpeish(pd.Series(["hello world, it's 42"]))[0] >= 5

    def test_language_id(self):
        s = pd.Series([
            "the cat and the dog was in it",
            "el perro y la casa de los niños",
            "der hund und die katze ist nicht da",
            "le chien et la maison des enfants",
            "这是一个中文句子测试",
        ])
        assert detect_language(s).tolist() == ["en", "es", "de", "fr", "zh"]

    def test_quality_monotone_in_substance(self):
        good = quality_score(pd.Series(["a reasonable sentence with plenty of words and content here now"]))
        bad = quality_score(pd.Series(["!!! ??? ... ###"]))
        assert good[0] > bad[0]

    def test_fingerprints_deterministic(self):
        s = pd.Series(["doc one", "doc two"])
        assert (md5_fingerprint(s) == md5_fingerprint(s)).all()
        w1 = winnow_fingerprints("the quick brown fox jumps over the lazy dog")
        w2 = winnow_fingerprints("the quick brown fox jumps over the lazy dog")
        assert np.array_equal(w1, w2)
        # near-identical docs share most winnow fingerprints
        w3 = winnow_fingerprints("the quick brown fox jumps over the lazy cat")
        inter = np.intersect1d(w1, w3).size
        assert inter / w1.size > 0.5

    def test_jaccard_and_ngrams(self):
        a = char_shingle_hashes("abcdefghij")
        assert jaccard(a, a) == 1.0
        sets = word_ngram_sets(pd.Series(["a b c d e", "a b c d x"]), n=3)
        assert 0 < jaccard(sets[0], sets[1]) < 1


class TestSpot:
    def test_alarms_on_extremes_only(self):
        calib = rng.standard_normal(2000)
        s = SpotDetector(q=1e-4).fit(calib)
        stream = rng.standard_normal(1000)
        stream[500] = 15.0
        alarms = s.score_series(stream)
        assert alarms[500]
        assert alarms.sum() <= 3  # essentially only the planted extreme

    def test_needs_calibration(self):
        with pytest.raises(ValueError):
            SpotDetector().fit(np.arange(5.0))

    def test_dspot_handles_drift(self):
        n = 1200
        base = np.linspace(0, 30, n) + rng.standard_normal(n)  # strong drift
        d = DSpotDetector(q=1e-4).fit(base[:400])
        stream = base[400:].copy()
        stream[600] += 14.0
        alarms = d.score_series(stream)
        assert alarms[600]
        assert alarms.sum() <= 5


class TestHuber:
    def test_tolerance_contract(self):
        # reference third_party/univariate.py: ±5·scale, directional
        x = rng.normal(50, 2, 500)
        det = HuberDetector().fit(x)
        s = det.score(np.array([50.0, 50 + 20, 50 - 20]))
        assert s.tolist() == [0, 1, -1]

    def test_min_points_contract(self):
        with pytest.raises(ValueError):
            HuberDetector().fit(np.arange(9.0))

    def test_robust_to_outliers_in_fit(self):
        x = np.concatenate([rng.normal(10, 1, 300), [1000.0, -1000.0]])
        mu, s = huber_location_scale(x)
        assert abs(mu - 10) < 0.5
        assert s < 3


class TestWinnowPipeline:
    def test_finds_planted_pair(self, ray_session, tmp_path, monkeypatch):
        import pyarrow.parquet as pq
        import pyarrow as pa
        from anomaly_detection_ray.pipelines.textops import winnow_near_dups

        base = ("the quick brown fox jumps over the lazy dog and then runs far "
                "away into the deep green forest to hide from all the hunters")
        docs = [base + f" tail{i}" for i in (1, 2)]  # near-identical pair
        others = [f"completely different document number {i} with its own words "
                  f"about topic {i*7} and nothing shared beyond english" for i in range(30)]
        t = pa.table({
            "doc_id": pa.array([f"d{i}" for i in range(len(docs) + len(others))]),
            "text": pa.array(docs + others),
        })
        d = tmp_path / "sf0.5"; d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))
        out = winnow_near_dups(str(d))
        pairs = set(zip(out["a"], out["b"]))
        assert ("d0", "d1") in pairs
        assert out.set_index(["a", "b"]).loc[("d0", "d1"), "overlap"] > 0.7

        # the standalone n-gram-Jaccard member of the dedup family finds
        # the same planted pair with exact word-3-gram verification
        from anomaly_detection_ray.pipelines.textops import ngram_jaccard_dups

        nj = ngram_jaccard_dups(str(d))
        njp = set(zip(nj["a"], nj["b"]))
        assert ("d0", "d1") in njp
        assert nj.set_index(["a", "b"]).loc[("d0", "d1"), "ngram_jaccard"] > 0.8
        # unrelated docs never pair
        assert all(a == "d0" and b == "d1" for a, b in njp)

    def test_hot_fingerprint_cluster_stays_reachable(self, ray_session,
                                                     tmp_path):
        """A duplicate cluster larger than the 32-doc per-fingerprint cap
        must stay one connected component: chain-mode postings pair hot-run
        docs consecutively, and because the cluster shares MANY hot
        fingerprints the consecutive pairs accumulate shared >= min_shared
        (the old truncate mode dropped docs 32+ entirely)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from anomaly_detection_ray.pipelines.textops import winnow_near_dups

        n_hot = 50
        boiler = ("copyright notice all rights reserved this page is part of "
                  "the standard site template used everywhere " * 3)
        ids = [f"h{i:03d}" for i in range(n_hot)] + [f"u{i}" for i in range(10)]
        texts = [boiler] * n_hot + [
            f"unique document {i} about subject {i * 13} with distinct words "
            f"nobody else uses like zxq{i} and vbn{i}" for i in range(10)]
        d = tmp_path / "sfhot"; d.mkdir()
        pq.write_table(pa.table({"doc_id": pa.array(ids),
                                 "text": pa.array(texts)}), str(d / "documents.parquet"))
        out = winnow_near_dups(str(d))
        parent = {f"h{i:03d}": f"h{i:03d}" for i in range(n_hot)}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(out["a"], out["b"]):
            if a in parent and b in parent:
                parent[find(a)] = find(b)
        roots = {find(k) for k in parent}
        assert len(roots) == 1, (
            f"hot-fingerprint cluster split into {len(roots)} components")


class TestNgramJaccardExactAnchor:
    def test_lsh_path_matches_exact_twin(self, ray_session):
        """ngram_jaccard_exact (DuckDB-oracled brute force) anchors the
        LSH-candidate ngram_jaccard_dups: the MinHash candidate stage can
        only MISS pairs (verify is exact), so LSH ⊆ exact always, and on
        the driver corpus recall must stay high."""
        from anomaly_detection_ray.pipelines.textops import (
            ngram_jaccard_dups,
            ngram_jaccard_exact,
        )

        sf = "/root/testdata/sf0.001"
        exact = ngram_jaccard_exact(sf)
        lsh = ngram_jaccard_dups(sf)
        exact_pairs = set(zip(exact["a"], exact["b"]))
        lsh_pairs = set(zip(lsh["a"], lsh["b"]))
        assert lsh_pairs <= exact_pairs  # verify stage is exact: no false positives
        if exact_pairs:
            assert len(lsh_pairs) / len(exact_pairs) >= 0.9
        # scores agree where both report the pair
        merged = lsh.merge(exact, on=["a", "b"], suffixes=("_lsh", "_ex"))
        assert np.allclose(merged["ngram_jaccard_lsh"], merged["ngram_jaccard_ex"])

    def test_join_verify_path_matches_broadcast_path(self, ray_session):
        """verify_pairs' two shapes are interchangeable: broadcast_limit=0
        forces the hash-join feature attach (no driver-resident feature
        map or id set at all) and must reproduce the broadcast result
        bit-for-bit — same pairs, same scores."""
        from anomaly_detection_ray.pipelines.textops import ngram_jaccard_dups

        sf = "/root/testdata/sf0.001"
        bcast = ngram_jaccard_dups(sf)
        joined = ngram_jaccard_dups(sf, broadcast_limit=0)
        pd.testing.assert_frame_equal(bcast, joined)

    def test_ngram_sql_oracle_parity_on_hot_corpus(self, ray_session,
                                                   tmp_path):
        """The ngram_jaccard_dups DuckDB oracle replays gram hashing,
        one-perm signatures, r=4/b=32 band folds, the min_shared_bands=2
        prune, the hot-bucket chain split and the est-gated exact verify
        bit-for-bit on a corpus where the chain branch fires (an
        80-identical-doc cluster) and where empty docs pair at 1.0."""
        import duckdb

        import pyarrow as pa
        import pyarrow.parquet as pq

        import __ray_entry__ as entry
        from anomaly_detection_ray.pipelines.textops import ngram_jaccard_dups

        g = np.random.default_rng(5)
        words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
                 "lam mu nu xi omicron pi rho sigma tau upsilon").split()
        base = " ".join(words)
        rows = [(i, base) for i in range(80)]
        for i in range(15):
            w = list(words)
            w[g.integers(len(w))] = f"pert{i}"
            rows.append((200 + i, " ".join(w)))
        rows += [(400 + i, " ".join(g.choice(np.array(words), 6)))
                 for i in range(25)]
        rows += [(600, ""), (601, None)]
        ids, texts = zip(*rows)
        d = tmp_path / "sfng"
        d.mkdir()
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts)}),
            str(d / "documents.parquet"))

        got = ngram_jaccard_dups(str(d))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{d / 'documents.parquet'}'")
        want = con.sql(entry.oracle_sql()["ngram_jaccard_dups"]).df()
        # chain evidence only for the 80-doc cluster, plus the empty pair
        assert 100 < len(want) < 500
        assert ((want["a"] == 600) & (want["b"] == 601)).any()
        pd.testing.assert_frame_equal(
            got.astype({"a": "int64", "b": "int64"}).reset_index(drop=True),
            want.reset_index(drop=True))

    def test_multi_round_convergence_keeps_int_label_dtype(self, ray_session):
        """Regression: a failed structural check used to recycle labels
        through pd.concat with a node=None summary row, flipping whole
        blocks to object dtype — and hash-bucket partitioning is
        dtype-sensitive, so int ids lost reducer co-location in every
        later round.  Force multiple star cycles (tiny canon batches over
        a long int-id chain) and pin the result to the union-find
        reference."""
        import ray.data as rd2

        from anomaly_detection_ray.stages.dedup import (
            components_losers,
            union_find_components,
        )

        L = 120
        pairs = pd.DataFrame({"a": np.arange(L, dtype=np.int64),
                              "b": np.arange(1, L + 1, dtype=np.int64)})
        ds = rd2.from_pandas(pairs).repartition(12).materialize()
        out = (components_losers(ds, canon_batch_size=8)
               .to_pandas().sort_values("node").reset_index(drop=True))
        assert out["node"].dtype == np.int64 and out["root"].dtype == np.int64
        ref = union_find_components(pairs)
        want = (pd.DataFrame([(n, r) for n, r in ref.items() if n != r],
                             columns=["node", "root"])
                .sort_values("node").reset_index(drop=True)
                .astype("int64"))
        pd.testing.assert_frame_equal(out, want)

    def test_cluster_size_histogram_matches_union_find(self, ray_session):
        """near_dup_cluster_sizes (distributed collapse + two blob
        exchanges) == the size histogram of the single-machine union-find
        reference over the same exact pair set."""
        from collections import Counter

        from anomaly_detection_ray.pipelines.textops import (
            near_dup_cluster_sizes,
            ngram_jaccard_exact,
        )
        from anomaly_detection_ray.stages.dedup import union_find_components

        sf = "/root/testdata/sf0.001"
        got = near_dup_cluster_sizes(sf)
        comp = union_find_components(ngram_jaccard_exact(sf))
        sizes = Counter(Counter(comp.values()).values())
        want = (pd.DataFrame(sorted(sizes.items()),
                             columns=["cluster_size", "n_clusters"])
                .astype("int64"))
        pd.testing.assert_frame_equal(got, want)

    def test_top_ngrams_finds_planted_boilerplate(self, ray_session, tmp_path, monkeypatch):
        """A boilerplate sentence shared by most docs must own the top
        doc-frequency slots; doc-frequency is distinct-per-doc (a doc
        repeating the sentence counts once)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from anomaly_detection_ray.pipelines.textops import top_ngrams_by_doc_freq

        boiler = "subscribe to our newsletter today"
        texts = [f"{boiler} unique body {i} {boiler}" for i in range(30)]
        texts += ["plain document number one content", None, ""]
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        d = tmp_path / "sfdir"
        d.mkdir()
        pq.write_table(tbl, str(d / "documents.parquet"))
        out = top_ngrams_by_doc_freq(str(d), k=5)
        assert (out["doc_freq"].head(5) == 30).all()  # boilerplate owns top-5
        hit = out[out["gram"] == "subscribe to our"]
        assert len(hit) == 1 and hit["doc_freq"].iloc[0] == 30  # distinct/doc

    def test_pack_manifest_matches_sequential_scan(self, ray_session, tmp_path):
        """The distributed bucket-offset prefix-scan == the sequential
        cumsum spec, across bucket boundaries, empty/null docs, and docs
        spanning multiple packs."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from anomaly_detection_ray.pipelines.textops import sequence_pack_manifest

        rng = np.random.default_rng(7)
        texts = []
        for i in range(300):
            w = int(rng.integers(0, 23))  # 0-token docs included
            texts.append(" ".join(f"w{j}" for j in range(w)) if w else
                         (None if i % 7 == 0 else ""))
        tbl = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        d = tmp_path / "sfdir"
        d.mkdir()
        pq.write_table(tbl, str(d / "documents.parquet"))
        got = sequence_pack_manifest(str(d), seq_len=7, num_buckets=16)
        n = np.array([len([w for w in (t or "").split() if w]) for t in texts],
                     dtype=np.int64)
        off = np.concatenate([[0], np.cumsum(n)[:-1]])
        want = pd.DataFrame({
            "doc_id": np.arange(300, dtype=np.int64),
            "n_tokens": n,
            "tok_offset": off,
            "pack_id": off // 7,
            "n_packs": np.where(n > 0, (off + np.maximum(n, 1) - 1) // 7
                                - off // 7 + 1, 0).astype(np.int64)})
        pd.testing.assert_frame_equal(got, want)


class TestNearDupCollapse:
    def test_union_find_chain_and_singletons(self):
        from anomaly_detection_ray.stages.dedup import union_find_components

        # chain 1-2, 2-3 plus pair 7-9: components {1,2,3} and {7,9}
        pairs = pd.DataFrame({"a": [1, 2, 7], "b": [2, 3, 9]})
        comp = union_find_components(pairs)
        assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    def test_collapse_keeps_min_per_cluster(self, ray_session):
        import ray.data as rd
        from anomaly_detection_ray.stages.dedup import collapse_near_dups

        ds = rd.from_items([{"doc_id": i} for i in range(10)])
        kept = sorted(collapse_near_dups(
            ds, "doc_id", pd.DataFrame({"a": [1, 2, 7], "b": [2, 3, 9]})
        ).to_pandas()["doc_id"])
        assert kept == [0, 1, 4, 5, 6, 7, 8]  # dropped: 2, 3 (root 1), 9 (root 7)

    def test_distributed_components_match_union_find(self, ray_session):
        """Star-contraction components == driver union-find on chains,
        cliques, duplicate/reversed edges, strings and random graphs."""
        from anomaly_detection_ray.stages.dedup import (
            components_losers,
            union_find_components,
        )

        rng = np.random.default_rng(7)
        cases = [
            pd.DataFrame({"a": list(range(0, 40)), "b": list(range(1, 41))}),
            pd.DataFrame({"a": [1, 1, 1, 2, 2, 3], "b": [2, 3, 4, 3, 4, 4]}),
            pd.DataFrame({"a": [5, 2, 2, 9, 9], "b": [2, 5, 5, 9, 7]}),
            pd.DataFrame({"a": ["c1", "c2", "c9"], "b": ["c2", "c3", "c8"]}),
        ]
        for _ in range(2):
            e = rng.integers(0, 60, size=(150, 2))
            cases.append(pd.DataFrame({"a": e[:, 0], "b": e[:, 1]}))
        for pairs in cases:
            got = components_losers(pairs).to_pandas()
            got_map = dict(zip(got["node"], got["root"]))
            uf = union_find_components(pairs)
            assert got_map == {n: r for n, r in uf.items() if r != n}

    def test_pathological_dup_rate_uses_no_driver_pair_structure(
            self, ray_session):
        """>=50% duplicate docs with the anti-join loser path forced
        (broadcast_limit=0): the collapse holds NO driver structure
        proportional to the pair count and still keeps exactly one doc
        per component (VERDICT r3 task 1 done-criterion)."""
        import ray.data as rd
        from anomaly_detection_ray.stages.dedup import collapse_near_dups

        n_pairs = 400  # 800 of 1000 docs are near-dup pair members
        pairs = pd.DataFrame({
            "a": np.arange(0, 2 * n_pairs, 2, dtype=np.int64),
            "b": np.arange(1, 2 * n_pairs, 2, dtype=np.int64)})
        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
        ).repartition(8)
        kept = sorted(collapse_near_dups(docs, "doc_id", pairs,
                                         broadcast_limit=0)
                      .to_pandas()["doc_id"])
        want = sorted(set(range(1000)) - set(range(1, 2 * n_pairs, 2)))
        assert kept == want

    def test_lsh_and_exact_collapse_agree_on_driver_corpus(self, ray_session):
        from anomaly_detection_ray.pipelines.textops import (
            near_dup_dedup_docs,
            near_dup_dedup_exact,
        )

        sf = "/root/testdata/sf0.001"
        exact = near_dup_dedup_exact(sf)["doc_id"].tolist()
        lsh = near_dup_dedup_docs(sf)["doc_id"].tolist()
        # LSH can only MISS pairs → it keeps a superset of the exact keepers
        assert set(exact) <= set(lsh)
        assert len(lsh) - len(exact) <= max(1, len(exact) // 20)


class TestDetectorPipelines:
    """The F17 train-broadcast-score shape end-to-end: planted anomalies
    must surface through the distributed fit + frozen-model scoring path,
    with calibration bounded per entity."""

    @pytest.fixture(scope="class")
    def events_dir(self, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(3)
        rows = []
        base = pd.Timestamp("2024-01-01")
        for et, (mu, spike) in {"a": (100.0, 1e6), "b": (50.0, 9e5)}.items():
            n = 900
            vals = rng.normal(mu, 2.0, n)
            # planted extreme spikes AFTER the calibration head
            vals[700] = spike
            vals[800] = spike * 1.1
            for i in range(n):
                rows.append({"event_id": len(rows), "ts": base + pd.Timedelta(minutes=i),
                             "event_type": et, "value": float(vals[i])})
        d = tmp_path_factory.mktemp("ev")
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), str(d / "events.parquet"))
        return str(d)

    def test_spot_pipeline_flags_planted_spikes(self, events_dir):
        from anomaly_detection_ray.pipelines.history import spot_anomalies

        out = spot_anomalies(events_dir, max_train=360)
        # both planted spikes per type flagged; few false alarms
        for et in ("a", "b"):
            sub = out[out["event_type"] == et]
            assert len(sub) >= 2
            assert sub["value"].max() > 8e5
        assert len(out) < 40

    def test_huber_pipeline_flags_planted_spikes(self, events_dir):
        from anomaly_detection_ray.pipelines.history import huber_anomalies

        out = huber_anomalies(events_dir, max_train=360)
        assert set(out["event_type"]) == {"a", "b"}
        assert (out["direction"] == 1).all()
        assert len(out) == 4  # exactly the four planted spikes

    def test_calibration_is_bounded(self, events_dir):
        # models must be fit on the capped earliest head: a tiny cap still
        # works and the pipeline never materializes a full type in one task
        from anomaly_detection_ray.pipelines.history import spot_anomalies

        out = spot_anomalies(events_dir, max_train=50)
        assert len(out) >= 4

    def test_no_anomalies_keeps_schema(self, tmp_path):
        # a calm stream emits zero anomalies; the empty result must keep its
        # typed columns (regression: all-empty blocks lost the schema)
        import pyarrow as pa
        import pyarrow.parquet as pq

        from anomaly_detection_ray.pipelines.history import huber_anomalies, spot_anomalies

        rng = np.random.default_rng(11)
        base = pd.Timestamp("2024-01-01")
        rows = [{"event_id": i, "ts": base + pd.Timedelta(minutes=i),
                 "event_type": "calm", "value": float(v)}
                for i, v in enumerate(rng.normal(10, 0.1, 500))]
        d = tmp_path / "calm"
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), str(d / "events.parquet"))
        s = spot_anomalies(str(d))
        h = huber_anomalies(str(d))
        assert list(s.columns) == ["event_id", "event_type", "value"]
        assert list(h.columns) == ["event_id", "event_type", "value", "direction"]
        assert len(s) == 0 and len(h) == 0


class TestLanguageIdOracleAgreement:
    """detect_language's decision tree must stay in lockstep with the
    language_id DuckDB oracle (__ray_entry__.oracle_sql) — the driver's
    testdata is all-ASCII, so the zh / tie / accent branches are pinned
    here against the same SQL."""

    CASES = [
        "今天天气很好 我们去公园",          # han ratio → zh
        "le chat est sur la table",          # fr profile
        "",                                   # empty → unknown
        "   ",                                # whitespace only → unknown
        "de un the la",                       # es/fr tie → earlier profile (es)
        "café au lait naïve",                 # non-ASCII, no profile hit → unknown
        "xyz qrs",                            # ASCII, no hits → en
        "der die und das ist",                # de
    ]

    def test_sql_matches_python(self):
        import duckdb

        from anomaly_detection_ray.functions.text import detect_language

        sys_path = __import__("sys").path
        if "/root/repo" not in sys_path:
            sys_path.insert(0, "/root/repo")
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "_entry_for_test", "/root/repo/__ray_entry__.py")
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)
        sql = entry.oracle_sql()["language_id"]

        con = duckdb.connect()
        con.register("docs_df", pd.DataFrame(
            {"doc_id": range(len(self.CASES)), "text": self.CASES}))
        con.sql("CREATE VIEW documents AS SELECT * FROM docs_df")
        ora = con.sql(sql).df().set_index("detected_lang")["n_docs"]

        mine = pd.Series(detect_language(pd.Series(self.CASES))).value_counts()
        assert mine.sort_index().to_dict() == ora.sort_index().to_dict()


class TestBenchmarkContamination:
    def test_planted_overlap_found_no_false_positives(self, ray_session, tmp_path):
        """A corpus doc that quotes 8 consecutive benchmark words is
        contaminated; docs reusing the same vocabulary without an
        8-run are not."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from anomaly_detection_ray.pipelines.textops import benchmark_contamination

        bench_text = " ".join(f"b{i}" for i in range(30))
        leak = "x y " + " ".join(f"b{i}" for i in range(10, 18)) + " z"
        clean = " ".join(f"b{2 * i}" for i in range(20))  # vocab reuse, no run
        docs = pd.DataFrame({
            "doc_id": [1, 2, 900],
            "text": [leak, clean, bench_text],
        })
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       str(tmp_path / "documents.parquet"))
        out = benchmark_contamination(str(tmp_path), n_benchmark=1, n=8)
        assert out["doc_id"].tolist() == [1]
        assert int(out["n_shared"].iloc[0]) == 1  # exactly one shared 8-gram

    def test_short_docs_cannot_contaminate(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from anomaly_detection_ray.pipelines.textops import benchmark_contamination

        docs = pd.DataFrame({
            "doc_id": [1, 900],
            "text": ["b0 b1 b2", " ".join(f"b{i}" for i in range(30))],
        })
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       str(tmp_path / "documents.parquet"))
        out = benchmark_contamination(str(tmp_path), n_benchmark=1, n=8)
        assert out.empty


class TestCuratedDocs:
    def test_each_stage_drops_its_planted_doc(self, ray_session, tmp_path):
        """One planted doc per curation stage: an exact-dup loser, a
        benchmark-contaminated doc, a repetitive doc — each must be
        dropped, a clean doc kept, and the eval doc itself excluded."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from anomaly_detection_ray.pipelines.textops import curated_docs

        base = " ".join(f"w{i}" for i in range(20))
        bench = " ".join(f"b{i}" for i in range(30))
        docs = pd.DataFrame({
            "doc_id": [1, 2, 3, 4, 5, 900],
            "text": [
                base,                                     # kept (winner)
                base,                                     # dup loser of 1
                "x " + " ".join(f"b{i}" for i in range(8, 17)),  # contaminated
                " ".join(["rep rep rep"] * 10),           # repetitive
                " ".join(f"u{i}" for i in range(15)),     # kept
                bench,                                    # the eval doc
            ],
            "source": ["src1"] * 6,
        })
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       str(tmp_path / "documents.parquet"))
        out = curated_docs(str(tmp_path), n_benchmark=1, max_rep_ratio=0.2)
        assert set(out["doc_id"]) == {1, 5}


class TestDocTopTermsBroadcastPrune:
    def test_df1_tail_excluded_from_broadcast_and_ranking_exact(self, ray_session):
        """High-uniqueness corpus: the df broadcast carries ONLY repeated
        tokens (df>=2) — the hapax tail is implied by absence (VERDICT r3
        #3) — and df=1 fills still rank exactly like a full df table."""
        import ray.data

        from anomaly_detection_ray.pipelines.textops import doc_top_terms_ds

        n_docs, uniq_per_doc = 40, 25
        docs = pd.DataFrame({
            "doc_id": np.arange(n_docs, dtype=np.int64),
            # 25 unique hapax tokens per doc + 2 shared tokens; "shared"
            # twice so tf beats the hapaxes, "common" once so df breaks
            # its tie against hapaxes (df=40 loses to df=1)
            "text": [" ".join([f"u{d}x{j}" for j in range(uniq_per_doc)]
                              + ["shared", "shared", "common"])
                     for d in range(n_docs)],
        })
        tel: dict = {}
        out = doc_top_terms_ds(ray.data.from_pandas(docs), k=3, telemetry=tel)
        # vocabulary = 40*25 hapaxes + 2 repeated; broadcast = the 2
        assert tel["df_vocabulary"] == n_docs * uniq_per_doc + 2
        assert tel["df_broadcast_entries"] == 2
        for d in range(n_docs):
            sub = out[out["doc_id"] == d].sort_values("rank")
            # rank 1: tf=2 "shared"; ranks 2-3: tf=1 hapaxes (df=1 < 40)
            assert sub.iloc[0]["token"] == "shared" and sub.iloc[0]["tf"] == 2
            assert list(sub["df"])[1:] == [1, 1]
            assert sub.iloc[1]["token"] == f"u{d}x0"
