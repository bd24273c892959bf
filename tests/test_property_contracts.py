"""Property-based contract sweeps (hypothesis) over the operators whose
guarantees are stated as invariants — the round-9 empty-batch NULL bug
was found by exactly this kind of sweep on the overlap family, so the
other contract families get the same treatment:

- hash_split: total assignment (every row gets exactly one declared
  split name), determinism across invocations.
- leakage_safe_split: no near-dup pair straddles splits; every id
  assigned; members of one component share a split.
- pack_documents: every doc packed exactly once; the next-fit bound
  (pack total minus its one straddler fits the budget); empty-text
  docs still packed.
- quantile_bin: NULLs pass through; non-nulls get a bin in
  [1, n_bins]; assignment is monotone in the value.
- winsorize: clipped column within the [lo, hi] cut band; interior
  values untouched; NULLs stay NULL.

Few examples each (every example is a full Spark job); strategies bias
toward the nasty inputs: empties, duplicates, ties, negatives, tiny
corpora.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _ids(draw_list):
    return st.lists(
        st.integers(min_value=0, max_value=30), min_size=0, max_size=12,
        unique=True,
    )


class TestHashSplitProperties:
    def test_total_and_deterministic(self, spark):
        from facolos_data_pipelines_spark.operators.sampling import hash_split

        @settings(**SETTINGS)
        @given(
            ids=st.lists(st.integers(0, 1000), min_size=0, max_size=15,
                         unique=True),
            w=st.sampled_from([
                {"train": 0.9, "val": 0.05, "test": 0.05},
                {"train": 0.5, "test": 0.5},
                {"only": 1.0},
            ]),
        )
        def check(ids, w):
            df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
            out = {r["doc_id"]: r["split"] for r in hash_split(df, splits=w).collect()}
            assert set(out) == set(ids), "every row assigned"
            assert set(out.values()) <= set(w), "only declared names"
            again = {r["doc_id"]: r["split"] for r in hash_split(df, splits=w).collect()}
            assert out == again, "same salt -> same deal"

        check()


class TestLeakageSafeSplitProperties:
    def test_pairs_never_straddle(self, spark):
        from facolos_data_pipelines_spark.operators.sampling import (
            leakage_safe_split,
        )

        @settings(**SETTINGS)
        @given(
            n=st.integers(min_value=0, max_value=12),
            edges=st.lists(
                st.tuples(st.integers(0, 11), st.integers(0, 11)),
                min_size=0, max_size=10,
            ),
        )
        def check(n, edges):
            ids = list(range(n))
            df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
            pairs = spark.createDataFrame(
                [(a, b) for a, b in edges if a < n and b < n and a != b],
                "id_a long, id_b long",
            )
            out = {
                r["doc_id"]: r["split"]
                for r in leakage_safe_split(df, pairs).collect()
            }
            assert set(out) == set(ids), "every id assigned"
            for a, b in edges:
                if a < n and b < n and a != b:
                    assert out[a] == out[b], f"pair ({a},{b}) straddles"

        check()


class TestPackDocumentsProperties:
    def test_exactly_once_and_nextfit_bound(self, spark):
        from facolos_data_pipelines_spark.operators.text import pack_documents

        word = st.sampled_from(["w", "xx", ""])
        doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

        @settings(**SETTINGS)
        @given(
            docs=st.lists(doc, min_size=0, max_size=10),
            max_tokens=st.sampled_from([1, 3, 8]),
        )
        def check(docs, max_tokens):
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
            )
            rows = pack_documents(
                df, max_tokens=max_tokens, num_shards=2
            ).collect()
            assert sorted(r["doc_id"] for r in rows) == list(range(len(docs))), (
                "every doc packed exactly once"
            )
            packs: dict = {}
            for r in rows:
                packs.setdefault((r["shard"], r["pack_id"]), []).append(
                    r["n_tokens"]
                )
            for key, toks in packs.items():
                # next-fit contract: at most ONE straddler per pack, so
                # the pack minus its largest member fits the budget
                assert sum(toks) - max(toks) < max_tokens, (key, toks)

        check()


class TestQuantileBinProperties:
    def test_range_nulls_and_monotonicity(self, spark):
        from facolos_data_pipelines_spark.operators.features import quantile_bin

        val = st.one_of(
            st.none(),
            st.integers(-50, 50),
            st.sampled_from([0, 0, 0, 7]),  # heavy ties -> merged bins
        )

        @settings(**SETTINGS)
        @given(vals=st.lists(val, min_size=1, max_size=15),
               n_bins=st.sampled_from([2, 4]))
        def check(vals, n_bins):
            df = spark.createDataFrame(
                [(i, None if v is None else float(v)) for i, v in enumerate(vals)],
                "id long, x double",
            )
            if all(v is None for v in vals):
                return  # all-NULL column has no distribution to cut
            out = {r["id"]: r["x_bin"] for r in quantile_bin(df, "x", n_bins).collect()}
            by_val = []
            for i, v in enumerate(vals):
                if v is None:
                    assert out[i] is None, "NULL passes through"
                else:
                    assert 1 <= out[i] <= n_bins
                    by_val.append((float(v), out[i]))
            by_val.sort()
            for (v1, b1), (v2, b2) in zip(by_val, by_val[1:]):
                assert b1 <= b2, "bin must be monotone in the value"
                if v1 == v2:
                    assert b1 == b2, "equal values share a bin"

        check()


class TestWinsorizeProperties:
    def test_clip_band_and_interior_identity(self, spark):
        from facolos_data_pipelines_spark.operators.features import winsorize

        @settings(**SETTINGS)
        @given(vals=st.lists(
            st.one_of(st.none(), st.integers(-1000, 1000)),
            min_size=1, max_size=15,
        ))
        def check(vals):
            df = spark.createDataFrame(
                [(i, None if v is None else float(v)) for i, v in enumerate(vals)],
                "id long, x double",
            )
            non_null = sorted(float(v) for v in vals if v is not None)
            if not non_null:
                return
            out = {r["id"]: r["x_w"] for r in winsorize(df, ["x"], 0.1, 0.9).collect()}
            import numpy as np

            lo = round(float(np.percentile(non_null, 10)) + 1e-8, 4)
            hi = round(float(np.percentile(non_null, 90)) + 1e-8, 4)
            for i, v in enumerate(vals):
                if v is None:
                    assert out[i] is None, "NULL stays NULL"
                    continue
                got = out[i]
                assert lo - 1e-6 <= got <= hi + 1e-6, (v, got, lo, hi)
                if lo + 1e-6 < float(v) < hi - 1e-6:
                    assert got == float(v), "interior values untouched"

        check()


class TestDedupSurvivorProperties:
    def test_exact_dedup_partition_and_min_id(self, spark):
        """exact_dedup keeps exactly one survivor per distinct RAW
        content value (the min id) — exact means byte equality, so
        whitespace variants are different documents."""
        from facolos_data_pipelines_spark.operators.dedup import exact_dedup

        doc = st.sampled_from(["a b c", "a  b   c", "x", "", "a b c d"])

        @settings(**SETTINGS)
        @given(docs=st.lists(doc, min_size=0, max_size=12))
        def check(docs):
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
            )
            kept = {r["doc_id"]: r["text"] for r in exact_dedup(df).collect()}
            groups: dict = {}
            for i, t in enumerate(docs):
                groups.setdefault(t, []).append(i)
            assert sorted(kept) == sorted(min(g) for g in groups.values())

        check()

    def test_minhash_transitive_survivors_pair_free(self, spark):
        """transitive minhash_dedup's survivor set contains NO verified
        near-dup pair, and survivors+dropped partition the corpus."""
        from facolos_data_pipelines_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_dedup,
            minhash_lsh_buckets,
            verified_near_dup_pairs,
        )

        base = "alpha beta gamma delta epsilon zeta eta theta"
        doc = st.sampled_from([
            base, base, base + " iota", "one two three four five six",
            "totally different words again here", "",
        ])

        @settings(max_examples=5, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(docs=st.lists(doc, min_size=0, max_size=8))
        def check(docs):
            df = spark.createDataFrame(
                [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
            )
            kept = {
                r["doc_id"]
                for r in minhash_dedup(
                    df, threshold=0.8, transitive=True, family="xxhash"
                ).collect()
            }
            assert kept <= set(range(len(docs)))
            buckets = minhash_lsh_buckets(df, family="xxhash")
            cand = lsh_candidate_pairs(buckets)
            pairs = {
                (r["id_a"], r["id_b"])
                for r in verified_near_dup_pairs(
                    df, cand, threshold=0.8
                ).collect()
            }
            for a, b in pairs:
                assert not (a in kept and b in kept), (
                    f"near-dup pair ({a},{b}) both survived"
                )
            # nothing outside a pair may be dropped
            paired = {x for p in pairs for x in p}
            for i in range(len(docs)):
                if i not in paired:
                    assert i in kept, f"unpaired doc {i} was dropped"

        check()


class TestAsofJoinProperties:
    def test_backward_matches_reference_scan(self, spark):
        """asof_join(backward) equals the obvious per-row reference:
        the greatest right ts <= left ts within the key (NULL when
        none) — including tied timestamps and keys with no right rows."""
        from facolos_data_pipelines_spark.operators.events import asof_join

        @settings(**SETTINGS)
        @given(
            lefts=st.lists(
                st.tuples(st.integers(0, 2), st.integers(0, 20)),
                min_size=0, max_size=10,
            ),
            rights=st.lists(
                st.tuples(st.integers(0, 2), st.integers(0, 20)),
                min_size=0, max_size=10,
                unique=True,  # unique (key, ts) -> no tiebreak needed
            ),
        )
        def check(lefts, rights):
            left = spark.createDataFrame(
                [(i, k, t) for i, (k, t) in enumerate(lefts)],
                "row long, k int, ts long",
            )
            right = spark.createDataFrame(
                [(k, t, float(k * 100 + t)) for k, t in rights],
                "k int, ts long, v double",
            )
            out = {
                r["row"]: r["v_asof"]
                for r in asof_join(left, right, "k", "ts", ["v"]).collect()
            }
            assert set(out) == set(range(len(lefts)))
            for i, (k, t) in enumerate(lefts):
                cand = [ts for (rk, ts) in rights if rk == k and ts <= t]
                want = float(k * 100 + max(cand)) if cand else None
                assert out[i] == want, (i, k, t, out[i], want)

        check()


class TestMergeUpsertProperties:
    def test_matches_reference_merge(self, spark):
        """merge_upsert equals the per-row MERGE reference: one row per
        key; incoming wins on match (even on order ties); unmatched
        existing rows survive; unmatched incoming rows insert."""
        from facolos_data_pipelines_spark.operators.merge import merge_upsert

        row = st.tuples(st.integers(0, 5), st.integers(0, 3), st.integers(0, 99))

        @settings(**SETTINGS)
        @given(
            ex=st.lists(row, min_size=0, max_size=8,
                        unique_by=lambda r: r[0]),
            inc=st.lists(row, min_size=0, max_size=8,
                         unique_by=lambda r: r[0]),
        )
        def check(ex, inc):
            existing = spark.createDataFrame(
                ex, "k long, etl_updated_at long, v long"
            )
            incoming = spark.createDataFrame(
                inc, "k long, etl_updated_at long, v long"
            )
            out = {
                r["k"]: r["v"]
                for r in merge_upsert(existing, incoming, ["k"]).collect()
            }
            want = {k: v for k, _, v in ex}
            want.update({k: v for k, _, v in inc})  # incoming always wins
            assert out == want

        check()


class TestSessionizeProperties:
    def test_matches_reference_gap_scan(self, spark):
        """sessionize equals the obvious per-key sequential scan: the
        session index increments exactly when the gap to the previous
        event exceeds gap_minutes (unique tie-broken ordering)."""
        from facolos_data_pipelines_spark.operators.events import sessionize

        @settings(**SETTINGS)
        @given(events=st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 5000)),
            min_size=0, max_size=12,
        ))
        def check(events):
            import datetime as dt

            base = dt.datetime(2024, 1, 1)
            rows = [
                (i, k, base + dt.timedelta(seconds=s))
                for i, (k, s) in enumerate(events)
            ]
            df = spark.createDataFrame(rows, "eid long, user_id long, ts timestamp")
            out = {
                r["eid"]: r["session_idx"]
                for r in sessionize(
                    df, gap_minutes=1, tiebreak_cols=["eid"]
                ).collect()
            }
            # reference: per-key scan in (ts, eid) order, new session
            # when gap > 60 s
            bykey: dict = {}
            for i, (k, s) in enumerate(events):
                bykey.setdefault(k, []).append((s, i))
            want = {}
            for k, evs in bykey.items():
                evs.sort()
                sess, prev = 0, None
                for s, i in evs:
                    if prev is None or s - prev > 60:
                        sess += 1
                    want[i] = sess
                    prev = s
            assert out == want

        check()


class TestGapFillProperties:
    def test_contiguous_spine_and_zero_fill(self, spark):
        """gap_fill emits one row per (key, day in [min, max]) — a
        contiguous spine with no duplicates — with n_rows=0 marking
        the holes and fill='zero' making the measure additive-safe."""
        import datetime as dt

        from facolos_data_pipelines_spark.operators.timeseries import gap_fill

        @settings(**SETTINGS)
        @given(events=st.lists(
            st.tuples(st.integers(0, 1), st.integers(0, 12), st.integers(1, 9)),
            min_size=1, max_size=10,
        ))
        def check(events):
            base = dt.datetime(2024, 3, 1)
            df = spark.createDataFrame(
                [(k, base + dt.timedelta(days=d), float(v)) for k, d, v in events],
                "k long, ts timestamp, v double",
            )
            out = gap_fill(df, ["k"], "ts", ["v"], freq="day", fill="zero").collect()
            spine: dict = {}
            for r in out:
                key = (r["k"], r["bucket"])
                assert key not in spine, f"duplicate spine row {key}"
                spine[key] = r
            bykey: dict = {}
            for k, d, v in events:
                bykey.setdefault(k, []).append((d, v))
            for k, evs in bykey.items():
                days = [d for d, _ in evs]
                for d in range(min(days), max(days) + 1):
                    b = base + dt.timedelta(days=d)
                    assert (k, b) in spine, f"hole in spine: key {k} day {d}"
                    r = spine[(k, b)]
                    want = sum(v for dd, v in evs if dd == d)
                    assert r["v"] == want, (k, d, r["v"], want)
                    assert r["n_rows"] == sum(1 for dd, _ in evs if dd == d)
                # nothing outside the span
                n_days = max(days) - min(days) + 1
                assert sum(1 for kk, _ in spine if kk == k) == n_days

        check()


class TestScd2Properties:
    def test_history_is_a_valid_partition_of_time(self, spark):
        """scd2_history emits, per key: intervals ordered by
        effective_from where each effective_to equals the next
        effective_from (no gaps, no overlap), exactly one current row,
        and consecutive versions differ in the tracked value."""
        from facolos_data_pipelines_spark.operators.merge import scd2_history

        @settings(**SETTINGS)
        @given(snaps=st.lists(
            st.tuples(st.integers(0, 1), st.integers(0, 20), st.integers(0, 2)),
            min_size=1, max_size=12,
            unique_by=lambda r: (r[0], r[1]),  # unique (key, order)
        ))
        def check(snaps):
            df = spark.createDataFrame(
                [(k, o, f"v{v}") for k, o, v in snaps],
                "k long, o long, attr string",
            )
            hist = scd2_history(df, ["k"], ["attr"], "o").collect()
            bykey: dict = {}
            for r in hist:
                bykey.setdefault(r["k"], []).append(r)
            for k, rows in bykey.items():
                rows.sort(key=lambda r: r["effective_from"])
                currents = [r for r in rows if r["is_current"]]
                assert len(currents) == 1, "exactly one current version"
                assert rows[-1]["is_current"] and rows[-1]["effective_to"] is None
                for a, b in zip(rows, rows[1:]):
                    assert a["effective_to"] == b["effective_from"], "gap/overlap"
                    assert a["attr"] != b["attr"], "no-change version emitted"
                # first version starts at the key's first snapshot
                first_o = min(o for kk, o, _ in snaps if kk == k)
                assert rows[0]["effective_from"] == first_o

        check()


class TestRobustProfileProperties:
    def test_invariants_vs_numpy(self, spark):
        """q1 <= median <= q3; MAD >= 0; outliers within [0, n];
        fraction = outliers/n; exact percentiles match numpy's linear
        interpolation (the quantile_cont definition both engines pin)."""
        import numpy as np

        from facolos_data_pipelines_spark.quality.checks import robust_profile

        @settings(**SETTINGS)
        @given(
            vals=st.lists(
                st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False,
                          width=32),
                min_size=1, max_size=25,
            ),
            nulls=st.integers(0, 3),
            k=st.sampled_from([0.0, 1.5, 3.0]),
        )
        def check(vals, nulls, k):
            rows = [("g", float(v)) for v in vals] + [("g", None)] * nulls
            df = spark.createDataFrame(rows, "g string, value double")
            r = robust_profile(df, "value", ["g"], k=k).first()
            assert r["n"] == len(vals)
            assert r["q1"] <= r["median"] <= r["q3"]
            assert r["mad"] >= 0
            assert 0 <= r["n_outliers"] <= len(vals)
            assert abs(r["outlier_frac"] - round(r["n_outliers"] / len(vals) + 1e-9, 4)) < 1e-9
            a = np.array(vals, dtype=float)
            for got, p in ((r["q1"], 25), (r["median"], 50), (r["q3"], 75)):
                want = round(float(np.percentile(a, p)) + 1e-9, 4)
                assert abs(got - want) <= 1e-4, (p, got, want)
            med = float(np.percentile(a, 50))
            want_mad = round(float(np.percentile(np.abs(a - med), 50)) + 1e-9, 4)
            assert abs(r["mad"] - want_mad) <= 1e-4

        check()


class TestTimeDecayProperties:
    def test_bounds_and_reference(self, spark):
        """For non-negative values: 0 <= decayed <= raw (weights in
        (0, 1]); exact agreement with a python reference at 9dp
        rounding; n_events counts non-null values only."""
        import math
        from datetime import datetime, timedelta

        from facolos_data_pipelines_spark.operators.events import time_decayed_sum

        @settings(**SETTINGS)
        @given(
            offs=st.lists(
                st.integers(0, 10_000_000),  # seconds back from ref
                min_size=1, max_size=12,
            ),
            half_life=st.sampled_from([0.5, 7.0, 30.0]),
        )
        def check(offs, half_life):
            ref = datetime(2024, 6, 1)
            rows = [
                (1, ref - timedelta(seconds=s), float(i + 1))
                for i, s in enumerate(offs)
            ]
            df = spark.createDataFrame(
                rows, "user_id long, ts timestamp, value double"
            )
            r = time_decayed_sum(
                df, "user_id", "ts", "value", half_life_days=half_life,
                ref_ts="2024-06-01 00:00:00", round_digits=9,
            ).first()
            assert r["n_events"] == len(offs)
            assert -1e-6 <= r["decayed_value"] <= r["raw_value"] + 1e-6
            want = sum(
                (i + 1) * math.pow(0.5, s / 86400.0 / half_life)
                for i, s in enumerate(offs)
            )
            assert abs(r["decayed_value"] - round(want + 1e-9, 9)) < 1e-6

        check()


class TestDeltaLoopProperties:
    def test_minhash_delta_never_reintroduces_history_dup(self, spark):
        """Random small corpora: every minhash_dedup_delta survivor,
        appended, leaves the accepted corpus free of cross near-dups —
        probing the survivors against the pre-cycle state finds
        nothing (the fixed-point contract of the loop)."""
        from facolos_data_pipelines_spark.operators.dedup import (
            minhash_band_state,
            minhash_dedup_delta,
            minhash_delta_pairs,
        )

        WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                 "eta", "theta", "iota", "kappa"]

        @settings(max_examples=4, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(
            picks=st.lists(st.integers(0, 3), min_size=2, max_size=6),
            seed=st.integers(0, 3),
        )
        def check(picks, seed):
            # 4 sentence templates; duplicates appear whenever two rows
            # share a template index
            sents = [
                " ".join(WORDS[(seed + t + j) % 10] for j in range(8))
                for t in range(4)
            ]
            hist_rows = [(100 + i, sents[i % 4]) for i in range(2)]
            batch_rows = [(i + 1, sents[p]) for i, p in enumerate(picks)]
            hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
            batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
            kw = dict(num_hashes=16, bands=4, family="xxhash", threshold=0.8)
            state = minhash_band_state(
                hist, num_hashes=16, bands=4, family="xxhash"
            )
            surv = minhash_dedup_delta(batch, state, hist, **kw)
            # fixed point: survivors re-probed against the same state
            # match nothing
            again = minhash_delta_pairs(surv, state, hist, **kw)
            assert again.count() == 0

        check()
