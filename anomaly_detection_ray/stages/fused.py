"""Single-pass fused suite partials: the whole validation suite as ONE
streaming execution plus one tiny shuffle.

Instead of materializing the decoded facts and running each check as its
own Dataset execution (stats, null scan, decode scan, dup groupby, two
anti-joins — each paying operator startup and, for the keyed ones, a
row-level sort at ~30µs/row), the decode actor output flows straight into
this stage, which folds EVERYTHING the suite needs into mergeable partial
rows of one narrow schema:

    kind:string · partition_id:string · column:string · bucket:int64 · payload:binary

- ``kind="stats"``  — one row per (partition, column) per bundle: pickled
  partial-stat dict (count/nulls/min/max/sum/sumsq + HLL/t-digest/freq
  sketch bytes; stats.py machinery).
- ``kind="keys"``   — one row per hash bucket per bundle: pickled
  ``(side, {key: count})`` dict (uniqueness + both referential directions
  derive from merged left/right counts — one exchange instead of three).
- ``kind="viol"``   — one row per bundle that saw violations: pickled
  list of (clip_id, partition_id, check, detail) tuples.

The transcripts side is a second tiny map producing only ``kind="keys"``
rows, UNIONed into the same stream.  Row-level data never shuffles and
never materializes; the stats/viol partials are O(bundles × partitions ×
columns), independent of row count — the property that keeps this plan
identical at 10^12 rows (SURVEY.md §7.5, stats.py module docstring).
Honest caveat: that bound does NOT apply to ``kind="keys"`` — exact
uniqueness/referential checking inherently moves every distinct key once
per bundle it appears in, so the keys exchange is O(distinct keys) bytes
and each bucket's reducer dict holds distinct_keys / num_buckets entries.
That volume is bucketed (uniform hash) and the per-bucket cardinality is
reported to metrics.json; size ``SuiteConfig.key_num_buckets`` by the
sizing rule in its docstring as key cardinality grows.

Skew: key buckets are ``hash64(key) % B`` (uniform for id keys); stats
partials are bounded per bundle regardless of how skewed ``codec`` /
``sr_hz`` are, because the partial — not the row — is the shuffle unit.
"""

from __future__ import annotations

import pickle
from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from anomaly_detection_ray.functions.hashing import bucket_of
from anomaly_detection_ray.state.sketches import Sketch

KIND_STATS = "stats"
KIND_KEYS = "keys"
KIND_VIOL = "viol"

_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("partition_id", pa.string()),
    ("column", pa.string()),
    ("bucket", pa.int64()),
    ("payload", pa.binary()),
])


def _rows_table(rows: list[tuple]) -> pa.Table:
    if not rows:
        return _SCHEMA.empty_table()
    kinds, pids, cols, buckets, payloads = zip(*rows)
    return pa.table({
        "kind": pa.array(kinds, pa.string()),
        "partition_id": pa.array(pids, pa.string()),
        "column": pa.array(cols, pa.string()),
        "bucket": pa.array(buckets, pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    }, schema=_SCHEMA)


def _key_count_rows(col: pa.ChunkedArray | pa.Array, side: int,
                    num_buckets: int) -> list[tuple]:
    col = col.drop_null() if col.null_count else col
    if len(col) == 0:
        return []
    vc = col.to_pandas().value_counts()
    keys = vc.index.to_numpy(dtype=object)
    counts = vc.to_numpy()
    buckets = bucket_of(keys, num_buckets)
    rows = []
    for b in np.unique(buckets):
        m = buckets == b
        blob = pickle.dumps((side, dict(zip(keys[m], counts[m].tolist()))))
        rows.append((KIND_KEYS, "", "", int(b), blob))
    return rows


class SuitePartials:
    """map_batches fn chained after the decode actors (same execution).

    ``batch_size`` at the call site should be LARGE (≥16k): partial-row
    count is bundles × partitions × columns, so big bundles keep the merge
    input tiny even though the decode stage upstream uses small batches.
    """

    def __init__(self, stat_columns: Sequence[str], partition_col: str,
                 key_col: str = "clip_id", num_buckets: int = 32,
                 with_keys: bool = True, checks: Sequence[str] = (),
                 custom_checks: Sequence = (),
                 cps_bounds: tuple = (1.0, 400.0),
                 viol_examples_per_block: int = 100):
        self.stat_columns = list(stat_columns)
        self.partition_col = partition_col
        self.key_col = key_col
        self.num_buckets = num_buckets
        self.with_keys = with_keys
        self.want_null = "null_rate" in checks
        self.want_audio = "audio_decode" in checks
        self.want_rate = "transcript_rate" in checks
        self.cps_bounds = cps_bounds
        self.viol_examples_per_block = viol_examples_per_block
        #: Check plugin instances (checks.py §2.11): their row hooks run
        #: fused in this same pass, violations ride the same blobs
        self.custom_checks = list(custom_checks)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        # ---- stats partials, per partition value in this bundle ----------
        # Column-major: ONE stable partition-sort of the bundle, then per
        # column ONE arrow take, ONE hash64 pass and ONE unique/bincount
        # value-count shared by every partition slice.  The previous
        # partition-major loop (filter batch per partition, build each
        # sketch from scratch) paid the fixed pandas-hash / value_counts /
        # Series cost once per (partition, column) CELL — ~0.4 s of the
        # 0.5 s per-bundle budget at 32 partitions, and the reason suite
        # cost grew with num_partitions.  Values flow into each sketch in
        # the same order as before (stable sort + order-preserving null
        # drop), so partial bytes are semantically identical.
        if batch.num_rows:
            rows.extend(self._stats_rows(batch))
        # ---- key-count partials ------------------------------------------
        if self.with_keys:
            rows.extend(_key_count_rows(batch[self.key_col], 0, self.num_buckets))
        # ---- violation rows ----------------------------------------------
        # VIOLATION-STORM BOUNDING: a systematically-broken table (every
        # row failing a check) must not materialize one detail row per
        # bad input row — at corpus scale that OOMs the reducer/driver
        # and the per-row Python string building dominates the pass.
        # Each check therefore ships EXACT per-(partition, check) counts
        # (what the verdict rules consume) plus at most
        # ``viol_examples_per_block`` example rows (the reference's
        # first-N payload-cap pattern, freshness_checker.py:47-49).
        viols: list[tuple] = []
        vcounts: dict[tuple, int] = {}
        cap = self.viol_examples_per_block

        def register(pid_col, check: str) -> None:
            # C-level Arrow value_counts — the storm case must not pay
            # per-bad-row Python (to_pylist + pandas Series) just to count
            vc = pc.value_counts(pid_col.combine_chunks()
                                 if isinstance(pid_col, pa.ChunkedArray)
                                 else pid_col)
            for sv in vc:
                p = sv["values"].as_py()
                if p is None:  # dirty data: fold into the stats sentinel
                    p = "__null__"
                vcounts[(p, check)] = vcounts.get((p, check), 0) + int(
                    sv["counts"].as_py())

        if self.want_null:
            nulls = batch.filter(pc.is_null(batch["transcript"]))
            if nulls.num_rows:
                register(nulls[self.partition_col], "null_rate")
                head = nulls.slice(0, cap)
                for cid, pid in zip(head[self.key_col].to_pylist(),
                                    head[self.partition_col].to_pylist()):
                    viols.append((cid, pid, "null_rate", "transcript is null"))
        if self.want_audio:
            ok = pc.and_(pc.and_(batch["decode_ok"], batch["sr_match"]),
                         pc.and_(batch["codec_match"], batch["dur_match"]))
            bad = batch.filter(pc.invert(ok))
            if bad.num_rows:
                register(bad[self.partition_col], "audio_decode")
                for r in bad.slice(0, cap).to_pylist():
                    if not r["decode_ok"]:
                        detail = f"decode failed: {r['decode_error']}"
                    else:
                        parts = []
                        if not r["sr_match"]:
                            parts.append("sr_hz mismatch")
                        if not r["codec_match"]:
                            parts.append("codec mismatch")
                        if not r["dur_match"]:
                            parts.append(
                                f"dur_ms {r['dur_ms']} vs decoded {r['decoded_ms']}")
                        detail = "; ".join(parts)
                    viols.append((r[self.key_col], r[self.partition_col],
                                  "audio_decode", detail))
        if self.want_rate:
            # transcript/audio consistency: chars-per-second vs the dur_ms
            # COLUMN (not decoded length — the check must also fire on
            # rows whose payload failed to decode).  Null transcripts and
            # non-positive durations are other checks' problems; they
            # propagate as nulls and fill_null(False) drops them here.
            lo, hi = self.cps_bounds
            dur = pc.cast(batch["dur_ms"], pa.float64())
            dur = pc.if_else(pc.greater(dur, 0.0), dur,
                             pa.scalar(None, pa.float64()))
            cps = pc.divide(
                pc.multiply(pc.cast(pc.utf8_length(batch["transcript"]),
                                    pa.float64()), 1000.0), dur)
            bad = pc.fill_null(pc.or_(pc.greater(cps, hi), pc.less(cps, lo)),
                               False)
            if pc.any(bad).as_py():
                sub = batch.filter(bad)
                register(sub[self.partition_col], "transcript_rate")
                head = sub.slice(0, cap)
                cps_head = cps.filter(bad).slice(0, cap)
                for cid, pid, c in zip(head[self.key_col].to_pylist(),
                                       head[self.partition_col].to_pylist(),
                                       cps_head.to_pylist()):
                    viols.append((cid, pid, "transcript_rate",
                                  f"{c:.1f} chars/sec outside [{lo}, {hi}]"))
        for chk in self.custom_checks:
            rows_chk = chk.row_violations(batch)
            if rows_chk:
                # cap examples PER CHECK NAME (a plugin may emit rows
                # under several names — a hot first name must not starve
                # the others' examples), counts exact for all
                kept_per_name: dict[str, int] = {}
                for v in rows_chk:
                    name = v[2]
                    vcounts[(v[1], name)] = vcounts.get((v[1], name), 0) + 1
                    s = kept_per_name.get(name, 0)
                    if s < cap:
                        viols.append(v)
                        kept_per_name[name] = s + 1
        if viols or vcounts:
            rows.append((KIND_VIOL, "", "", 0, pickle.dumps((viols, vcounts))))
        return _rows_table(rows)

    def _stats_rows(self, batch: pa.Table) -> list[tuple]:
        """Per-(partition, column) partial-stat rows, column-major."""
        from anomaly_detection_ray.functions.hashing import hash64
        from anomaly_detection_ray.stages.stats import _is_numeric
        from anomaly_detection_ray.state.sketches import (
            FreqSketch,
            HyperLogLog,
            TDigest,
        )

        pids = batch[self.partition_col].to_numpy(zero_copy_only=False)
        if batch[self.partition_col].null_count:
            # NULL partition ids must not kill the pass (np.argsort on an
            # object array raises on str-vs-None comparisons): fold them
            # into a sentinel partition so their rows still get stats and
            # the suite can flag the partition explicitly downstream.
            pids = np.where(pd.isnull(pids), "__null__", pids)
        order = np.argsort(pids, kind="stable")
        sorted_pids = pids[order]
        starts = np.flatnonzero(
            np.concatenate([[True], sorted_pids[1:] != sorted_pids[:-1]]))
        bounds = np.append(starts, sorted_pids.size)
        uniq = [str(k) for k in sorted_pids[starts]]
        counts = np.diff(bounds)
        take_idx = pa.array(order)

        rows: list[tuple] = []
        for name in self.stat_columns:
            arr = batch[name].combine_chunks().take(take_idx)
            numeric = _is_numeric(arr.type)
            want_freq = (pa.types.is_string(arr.type)
                         or pa.types.is_large_string(arr.type)
                         or pa.types.is_integer(arr.type))
            # per-partition null counts; valid values stay partition-sorted
            if arr.null_count:
                nullmask = arr.is_null().to_numpy(zero_copy_only=False)
                nulls = np.add.reduceat(nullmask.astype(np.int64), starts)
                valid = arr.drop_null()
            else:
                nulls = np.zeros(len(uniq), dtype=np.int64)
                valid = arr
            vcounts = counts - nulls
            vbounds = np.concatenate([[0], np.cumsum(vcounts)])

            v_all = (valid.to_numpy(zero_copy_only=False).astype(np.float64)
                     if numeric and len(valid) else None)
            vals_all = valid.to_pandas().to_numpy() if len(valid) else None
            # ONE hash pass per column (HLL input), shared by every slice
            h_all = hash64(vals_all) if vals_all is not None else None
            # ONE value-count per column: unique + bincount over
            # (partition, value) codes, split per partition below
            if want_freq and vals_all is not None:
                u_vals, inv = np.unique(vals_all, return_inverse=True)
                pid_codes = np.repeat(np.arange(len(uniq)), vcounts)
                cnt = np.bincount(pid_codes * len(u_vals) + inv,
                                  minlength=len(uniq) * len(u_vals))
                cnt = cnt.reshape(len(uniq), len(u_vals))
            else:
                u_vals = cnt = None

            for g, k in enumerate(uniq):
                sl = slice(vbounds[g], vbounds[g + 1])
                d = {"count": int(counts[g]), "nulls": int(nulls[g]),
                     "min": None, "max": None, "sum": None, "sumsq": None,
                     "hll": None, "tdigest": None, "freq": None}
                n_valid = vbounds[g + 1] - vbounds[g]
                if numeric and n_valid:
                    v = v_all[sl]
                    d["min"] = float(v.min())
                    d["max"] = float(v.max())
                    d["sum"] = float(v.sum())
                    d["sumsq"] = float((v * v).sum())
                    d["tdigest"] = TDigest().add_many(v).to_bytes()
                if n_valid:
                    d["hll"] = HyperLogLog().add_hashes(h_all[sl]).to_bytes()
                    if cnt is not None:
                        nz = np.flatnonzero(cnt[g])
                        d["freq"] = FreqSketch().add_counts(
                            u_vals[nz], cnt[g, nz]).to_bytes()
                rows.append((KIND_STATS, k, name, 0, pickle.dumps(d)))
        return rows


def combine_partial_rows(batch: pa.Table) -> pa.Table:
    """Pre-shuffle combiner over partial rows: merges same-group rows
    WITHIN a collected batch of partials, cutting the suite shuffle's row
    count by roughly the combine fan-in (bundles per combiner batch) —
    measured, the groupby-merge over raw partials was ~25% of suite wall
    at 600k clips (≈30µs per shuffled row), and the partial rows are tiny
    so the cross-block bundler cost here is noise.

    Exactness: count/nulls/min/max and the HLL merge are order-invariant,
    so combining early cannot change those results.  Freq merges are
    order-invariant only while total distinct stays under the sketch cap
    (10k): past the cap, which keys land in ``__other__`` depends on
    arrival order, so for key-like columns (e.g. clip_id at bench scale)
    the freq bytes vary with the combiner's batch layout — heaviest-first
    admission at overflow (enforced in ``FreqSketch.merge`` for every
    merge that could exceed the cap, and in ``add_counts`` for oversized
    slices) keeps the retained set the heavy hitters either way, which is
    the only property chi-square drift consumes.  Per-bundle
    float sums are carried as LISTS (``sums``/``sumsqs``) so the final
    reducer's ``math.fsum`` still sees every original bundle term and the
    merged stats stay bit-identical for every block layout.  t-digest
    merge is NOT associative, so combined digests (like the reducer's own
    merge, before or after this combiner existed) are approximations whose
    centroids depend on merge topology; merges run in canonical
    (payload-byte-sorted) order so a fixed partial set always merges the
    same way, and the KS drift comparison tolerates centroid-level noise
    by construction (threshold 0.15 vs ~1e-3 topology jitter).
    Idempotent: already-combined rows combine again (lists extend).
    """
    df = batch.to_pandas()
    rows: list[tuple] = []

    stats = df[df["kind"] == KIND_STATS]
    for (pid, col), g in stats.groupby(["partition_id", "column"], sort=False):
        parts = [pickle.loads(b) for b in sorted(g["payload"])]
        if len(parts) == 1 and "sums" in parts[0]:
            rows.append((KIND_STATS, pid, col, 0, g["payload"].iloc[0]))
            continue
        sums: list = []
        sumsqs: list = []
        mins: list = []
        maxs: list = []
        count = nulls = 0
        acc: dict[str, Optional[Sketch]] = {"hll": None, "tdigest": None, "freq": None}
        for p in parts:
            count += p["count"]
            nulls += p["nulls"]
            if "sums" in p:
                sums.extend(p["sums"])
                sumsqs.extend(p["sumsqs"])
            elif p["sum"] is not None:
                sums.append(p["sum"])
                sumsqs.append(p["sumsq"])
            if p["min"] is not None:
                mins.append(p["min"])
                maxs.append(p["max"])
            for f in acc:
                if p[f] is not None:
                    sk = Sketch.from_bytes(p[f])
                    acc[f] = sk if acc[f] is None else acc[f].merge(sk)
        d = {"count": int(count), "nulls": int(nulls),
             "min": min(mins) if mins else None,
             "max": max(maxs) if maxs else None,
             "sums": sums, "sumsqs": sumsqs,
             "hll": acc["hll"].to_bytes() if acc["hll"] is not None else None,
             "tdigest": acc["tdigest"].to_bytes() if acc["tdigest"] is not None else None,
             "freq": acc["freq"].to_bytes() if acc["freq"] is not None else None}
        rows.append((KIND_STATS, pid, col, 0, pickle.dumps(d)))

    # key rows pass through untouched: their counts are dominated by
    # unique ids, so combining would do the reducer's python dict work
    # TWICE without shrinking the data — the 32-way-parallel bucket
    # reducer is the right (and only) place for it
    keys = df[df["kind"] == KIND_KEYS]
    for bucket, blob in zip(keys["bucket"], keys["payload"]):
        rows.append((KIND_KEYS, "", "", int(bucket), blob))

    viol = df[df["kind"] == KIND_VIOL]
    if len(viol):
        rows.append((KIND_VIOL, "", "", 0,
                     pickle.dumps(_merge_viol_payloads(viol["payload"]))))
    return _rows_table(rows)


#: merged violation EXAMPLES are bounded per check (counts stay exact) —
#: a 100%-failing table must not swamp the reducer/driver with one row
#: per bad input
VIOL_EXAMPLES_MERGE_CAP = 1000


def _merge_viol_payloads(payloads, cap_per_check: int = VIOL_EXAMPLES_MERGE_CAP):
    """Merge pickled (examples, counts) violation payloads: per-(partition,
    check) counts sum EXACTLY; example rows keep at most ``cap_per_check``
    per check (first-seen order)."""
    kept: list[tuple] = []
    per_check: dict[str, int] = {}
    counts: dict[tuple, int] = {}
    for b in payloads:
        ex, vc = pickle.loads(b)
        for k, c in vc.items():
            counts[k] = counts.get(k, 0) + c
        for v in ex:
            name = v[2]
            s = per_check.get(name, 0)
            if s < cap_per_check:
                kept.append(v)
                per_check[name] = s + 1
    return kept, counts


def side_key_partials(key_col: str, side: int, num_buckets: int):
    """map_batches fn for an auxiliary keyed table (e.g. transcripts):
    emits only kind="keys" partial rows into the shared schema."""

    def f(batch: pa.Table) -> pa.Table:
        return _rows_table(_key_count_rows(batch[key_col], side, num_buckets))

    return f


# ---------------------------------------------------------------------------
# merges over the (materialized, tiny) partials dataset
# ---------------------------------------------------------------------------


def _merge_stats_group(g: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame([_merge_stats_dict(g)])


def _merge_stats_dict(g: pd.DataFrame) -> dict:
    # sort by serialized payload: groupby delivers rows in shuffle order,
    # and t-digest merges are not associative — a canonical merge order
    # makes the merged sketch deterministic for a FIXED set of partials
    # (order-invariant sketches are unaffected)
    parts = [pickle.loads(b) for b in sorted(g["payload"])]
    count = int(sum(p["count"] for p in parts))
    nulls = int(sum(p["nulls"] for p in parts))
    valid = count - nulls
    # math.fsum: exactly-rounded summation → the merged result is identical
    # for EVERY merge order, so N- and 4N-CPU layouts (and re-runs) produce
    # bit-identical stats (SURVEY.md §7.6 sketch-determinism requirement)
    import math

    sums: list = []
    sumsqs: list = []
    for p in parts:
        if "sums" in p:  # pre-combined row (combine_partial_rows)
            sums.extend(p["sums"])
            sumsqs.extend(p["sumsqs"])
        elif p["sum"] is not None:
            sums.append(p["sum"])
            sumsqs.append(p["sumsq"])
    s = math.fsum(sums) if sums else None
    ssq = math.fsum(sumsqs) if sumsqs else None
    mean = s / valid if (s is not None and valid) else None
    stddev = None
    if ssq is not None and valid and valid > 1:
        var = max((ssq - valid * mean * mean) / (valid - 1), 0.0)
        stddev = float(np.sqrt(var))

    def merge_blobs(field):
        acc = None
        for p in parts:
            if p[field] is None:
                continue
            sk = Sketch.from_bytes(p[field])
            acc = sk if acc is None else acc.merge(sk)
        return acc

    hll, td, fr = merge_blobs("hll"), merge_blobs("tdigest"), merge_blobs("freq")
    mins = [p["min"] for p in parts if p["min"] is not None]
    maxs = [p["max"] for p in parts if p["max"] is not None]
    return {
        "partition_id": g["partition_id"].iloc[0],
        "column": g["column"].iloc[0],
        "count": count,
        "nulls": nulls,
        "null_rate": nulls / count if count else 0.0,
        "min": min(mins) if mins else None,
        "max": max(maxs) if maxs else None,
        "mean": mean,
        "stddev": stddev,
        "distinct_est": hll.estimate() if hll is not None else None,
        "hll": hll.to_bytes() if hll is not None else None,
        "tdigest": td.to_bytes() if td is not None else None,
        "freq": fr.to_bytes() if fr is not None else None,
    }


def _merge_keys_group_fn(with_ref: bool):
    """Returns merge(group) -> (suspect_frame, n_distinct_keys).  The
    second element is this bucket's reducer-dict cardinality — the biggest
    memory object of the suite at high key cardinality (VERDICT r2 'What's
    wrong' #4) — surfaced so runs can report it and operators can raise
    ``SuiteConfig.key_num_buckets`` when buckets grow too fat."""

    def merge(g: pd.DataFrame) -> tuple[pd.DataFrame, int]:
        from collections import defaultdict

        nl: dict = defaultdict(int)
        nr: dict = defaultdict(int)
        for blob in g["payload"]:
            side, d = pickle.loads(blob)
            tgt = nl if side == 0 else nr
            for k, c in d.items():
                tgt[k] += c
        # emit ONLY suspicious keys: dups and (when a right side exists)
        # orphans in either direction — the healthy key space (the
        # overwhelming majority) dies here, in the reducer, without ever
        # reaching the driver
        rows = []
        all_keys = nl.keys() | nr.keys()
        for k in all_keys:
            a, b = nl.get(k, 0), nr.get(k, 0)
            if a > 1 or (with_ref and (b == 0 or a == 0)):
                rows.append((k, a, b))
        if not rows:
            return pd.DataFrame({"key": [], "n_left": [], "n_right": []}), len(all_keys)
        ks, na, nb = zip(*rows)
        return pd.DataFrame({"key": list(ks), "n_left": list(na),
                             "n_right": list(nb)}), len(all_keys)

    return merge


def collect_suite_partials(
    partials: ray.data.Dataset,
    *,
    with_keys: bool = True,
    with_ref: bool = True,
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame, list[int], dict]:
    """(stats_df, suspect_keys_df, violations_df, key_bucket_distincts,
    viol_counts) from a partials dataset.  The 4th element lists each key
    bucket's reducer-dict cardinality (empty when ``with_keys`` is off) —
    runs emit its max/total to metrics.json so fat buckets are visible.
    The 5th maps (partition_id, check) → EXACT violation count; the
    violations_df holds bounded EXAMPLE rows (VIOL_EXAMPLES_MERGE_CAP per
    check), so verdict rules must count from viol_counts, never from
    ``len(violations_df)``.

    ``partials`` should be materialized by the caller (it is tiny); each
    merge below is then a sub-second execution over O(bundles) rows.
    """
    empty_keys = pd.DataFrame({"key": [], "n_left": [], "n_right": []})
    empty_viol = pd.DataFrame(columns=["clip_id", "partition_id", "check", "detail"])
    if partials.count() == 0:  # fully-resumed run: nothing flowed through
        return pd.DataFrame(), empty_keys, empty_viol, [], {}

    # ONE execution for every merge: the group key (kind, partition_id,
    # column, bucket) is disjoint across kinds, and a dispatcher merge
    # reduces each group to a single pickled result row.  Three filtered
    # sub-executions would pay operator startup three times for the same
    # tiny dataset.
    key_merge = _merge_keys_group_fn(with_ref)

    def dispatch(g: pd.DataFrame) -> pd.DataFrame:
        kind = g["kind"].iloc[0]
        if kind == KIND_STATS:
            blob = pickle.dumps(_merge_stats_dict(g))
        elif kind == KIND_KEYS:
            blob = pickle.dumps(key_merge(g))
        else:  # KIND_VIOL: merge (capped examples, exact counts)
            blob = pickle.dumps(_merge_viol_payloads(g["payload"]))
        return pd.DataFrame([{"kind": kind, "result": blob}])

    merged = (
        partials.groupby(["kind", "partition_id", "column", "bucket"])
        .map_groups(dispatch, batch_format="pandas")
        .to_pandas()
    )
    stats_rows = [pickle.loads(b) for b in merged.loc[merged["kind"] == KIND_STATS, "result"]]
    stats_df = pd.DataFrame(stats_rows)
    bucket_distincts: list[int] = []
    if with_keys:
        key_results = [pickle.loads(b) for b in merged.loc[merged["kind"] == KIND_KEYS, "result"]]
        bucket_distincts = [n for _, n in key_results]
        key_frames = [f for f, _ in key_results if len(f)]
        keys_df = pd.concat(key_frames, ignore_index=True) if key_frames else empty_keys
    else:
        keys_df = empty_keys
    viols: list[tuple] = []
    viol_counts: dict[tuple, int] = {}
    for b in merged.loc[merged["kind"] == KIND_VIOL, "result"]:
        ex, vc = pickle.loads(b)
        viols.extend(ex)
        for k, c in vc.items():
            viol_counts[k] = viol_counts.get(k, 0) + c
    violations_df = pd.DataFrame(
        viols, columns=["clip_id", "partition_id", "check", "detail"])
    return stats_df, keys_df, violations_df, bucket_distincts, viol_counts
