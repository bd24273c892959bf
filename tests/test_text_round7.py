"""Behavioral tests for the round-7 text operators: bigram LM scoring,
corpus overlap, token-length histogram."""

import math

import pytest

from facolos_data_pipelines_spark.operators.text import (
    bigram_logprob_scores,
    corpus_overlap,
    token_length_histogram,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBigramLogprobScores:
    def test_hand_computed_probabilities(self, spark):
        # corpus: "a b a b" and "a b" -> bigrams: (a,b)x3, (b,a)x1
        # V = {a, b} = 2; s = 0.5
        # p(b|a) = (3+.5)/(3+ .5*2) = 3.5/4 ; p(a|b) = (1+.5)/(1+1) = .75
        df = _docs(spark, [(1, "a b a b"), (2, "a b")])
        out = {r["doc_id"]: r for r in bigram_logprob_scores(df).collect()}
        lp_ab = math.log(3.5 / 4.0)
        lp_ba = math.log(1.5 / 2.0)
        assert out[1]["n_bigrams"] == 3
        assert out[1]["avg_logprob"] == pytest.approx(
            (2 * lp_ab + lp_ba) / 3, abs=1e-3
        )
        assert out[2]["n_bigrams"] == 1
        assert out[2]["avg_logprob"] == pytest.approx(lp_ab, abs=1e-3)

    def test_short_and_empty_docs_null_score(self, spark):
        df = _docs(spark, [(1, "hello"), (2, ""), (3, "   "), (4, "x y")])
        out = {r["doc_id"]: r for r in bigram_logprob_scores(df).collect()}
        for d in (1, 2, 3):
            assert out[d]["n_bigrams"] == 0 and out[d]["avg_logprob"] is None
        assert out[4]["n_bigrams"] == 1 and out[4]["avg_logprob"] is not None

    def test_fluent_beats_scrambled(self, spark):
        # the discriminating property a unigram LM lacks: same words,
        # different order -> the repeated-transition doc scores higher
        fluent = " ".join(["the cat sat"] * 10)
        scrambled = " ".join(["cat the"] * 5 + ["sat sat the cat"] * 5)
        df = _docs(spark, [(1, fluent), (2, scrambled)])
        out = {r["doc_id"]: r["avg_logprob"] for r in bigram_logprob_scores(df).collect()}
        assert out[1] > out[2]

    def test_bad_smoothing(self, spark):
        df = _docs(spark, [(1, "a b")])
        with pytest.raises(ValueError, match="smoothing"):
            bigram_logprob_scores(df, smoothing=0.0)


class TestCorpusOverlap:
    def test_identical_and_disjoint(self, spark):
        a = _docs(spark, [(1, "alpha beta gamma delta")])
        b_same = _docs(spark, [(9, "alpha beta gamma delta")])
        b_diff = _docs(spark, [(9, "epsilon zeta eta theta")])
        same = corpus_overlap(a, b_same).first()
        assert same["jaccard"] == pytest.approx(1.0, abs=1e-6)
        assert same["containment_a"] == pytest.approx(1.0, abs=1e-6)
        diff = corpus_overlap(a, b_diff).first()
        assert diff["n_common"] == 0 and diff["jaccard"] == 0.0

    def test_partial_overlap_counts(self, spark):
        # a: shingles {a b c, b c d}; b: shingles {b c d, c d e}
        a = _docs(spark, [(1, "a b c d")])
        b = _docs(spark, [(2, "b c d e")])
        r = corpus_overlap(a, b).first()
        assert r["n_grams_a"] == 2 and r["n_grams_b"] == 2
        assert r["n_common"] == 1
        assert r["jaccard"] == pytest.approx(1 / 3, abs=1e-6)
        assert r["containment_a"] == pytest.approx(0.5, abs=1e-6)
        assert r["containment_b"] == pytest.approx(0.5, abs=1e-6)

    def test_empty_side(self, spark):
        a = _docs(spark, [(1, "a b c d")])
        b = _docs(spark, [(2, "")])
        r = corpus_overlap(a, b).first()
        assert r["n_grams_b"] == 0 and r["n_common"] == 0
        assert r["jaccard"] == 0.0 and r["containment_b"] == 0.0


class TestTokenLengthHistogram:
    def test_buckets_and_ranges(self, spark):
        rows = [
            (1, ""),                        # 0 tokens -> bucket -1
            (2, "one"),                     # 1 -> bucket 0 [1, 1]
            (3, "a b c"),                   # 3 -> bucket 1 [2, 3]
            (4, " ".join(["w"] * 8)),       # 8 -> bucket 3 [8, 15]
            (5, " ".join(["w"] * 15)),      # 15 -> bucket 3
        ]
        out = {r["bucket"]: r for r in token_length_histogram(_docs(spark, rows)).collect()}
        assert set(out) == {-1, 0, 1, 3}
        assert out[-1]["n_docs"] == 1 and out[-1]["lo_tokens"] is None
        assert out[0]["lo_tokens"] == 1 and out[0]["hi_tokens"] == 1
        assert out[1]["lo_tokens"] == 2 and out[1]["hi_tokens"] == 3
        assert out[3]["n_docs"] == 2 and out[3]["total_tokens"] == 23
        assert out[3]["lo_tokens"] == 8 and out[3]["hi_tokens"] == 15

    def test_power_of_two_boundaries_exact(self, spark):
        # the reason for integer bit-length: 2^k must land in bucket k
        rows = [(i, " ".join(["t"] * (2 ** i))) for i in range(1, 7)]
        out = token_length_histogram(_docs(spark, rows)).collect()
        got = {r["bucket"]: r["n_docs"] for r in out}
        assert got == {i: 1 for i in range(1, 7)}

    def test_null_text_counts_as_zero_tokens(self, spark):
        # non-ANSI size(NULL) is -1; NULL text must land in bucket -1
        # with 0 tokens, matching the oracle's COALESCE(len(...), 0)
        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "a b")], "doc_id long, text string"
        )
        out = {r["bucket"]: r for r in token_length_histogram(df).collect()}
        assert out[-1]["n_docs"] == 2 and out[-1]["total_tokens"] == 0
        assert out[1]["n_docs"] == 1 and out[1]["total_tokens"] == 2


class TestCorpusDiversity:
    def test_ttr_separates_template_spam(self, spark):
        from facolos_data_pipelines_spark.operators.text import corpus_diversity

        rows = [(i, "the quick brown fox jumps over dog %d" % i, "fresh") for i in range(5)]
        rows += [(100 + i, "buy cheap pills now buy cheap pills now", "spam") for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r["source"]: r for r in corpus_diversity(df).collect()}
        assert out["fresh"]["n_docs"] == 5 and out["spam"]["n_docs"] == 5
        assert out["fresh"]["type_token_ratio"] > out["spam"]["type_token_ratio"]
        # spam: every doc contributes the SAME shingles
        assert out["spam"]["distinct_grams"] * 5 <= out["spam"]["total_grams"]

    def test_empty_group_rows_kept(self, spark):
        from facolos_data_pipelines_spark.operators.text import corpus_diversity

        df = spark.createDataFrame(
            [(1, "", "empty"), (2, "a b c d", "ok")],
            "doc_id long, text string, source string",
        )
        out = {r["source"]: r for r in corpus_diversity(df).collect()}
        assert out["empty"]["total_grams"] == 0
        assert out["empty"]["type_token_ratio"] == 0.0
        assert out["ok"]["distinct_grams"] == 2


class TestCorpusOverlapDelta:
    def test_increments_match_full_recompute(self, spark):
        """The associativity contract: running corpus_overlap_delta on a
        batch and adding its increments to the pre-batch counters must
        equal corpus_overlap recomputed over (old + batch) vs ref."""
        from facolos_data_pipelines_spark.operators.text import (
            corpus_gram_state,
            corpus_overlap,
            corpus_overlap_delta,
        )

        old = _docs(spark, [(1, "a b c d"), (2, "c d e f")])
        batch = _docs(spark, [(3, "c d e f g"), (4, "x y z w")])
        ref = _docs(spark, [(9, "b c d e f g h")])

        seen = corpus_gram_state(old)
        ref_grams = corpus_gram_state(ref)
        delta = corpus_overlap_delta(batch, seen, ref_grams).first()

        before = corpus_overlap(old, ref).first()
        after = corpus_overlap(old.unionByName(batch), ref).first()
        assert before["n_grams_a"] + delta["n_new_grams"] == after["n_grams_a"]
        assert before["n_common"] + delta["n_new_common"] == after["n_common"]

    def test_recrawl_batch_is_all_seen(self, spark):
        from facolos_data_pipelines_spark.operators.text import (
            corpus_gram_state,
            corpus_overlap_delta,
        )

        old = _docs(spark, [(1, "a b c d e")])
        recrawl = _docs(spark, [(2, "a b c d e")])  # exact re-crawl
        ref = _docs(spark, [(9, "k l m n")])
        r = corpus_overlap_delta(
            recrawl, corpus_gram_state(old), corpus_gram_state(ref)
        ).first()
        assert r["n_delta_grams"] == 3  # {a b c, b c d, c d e}
        assert r["n_new_grams"] == 0 and r["n_new_common"] == 0
        assert r["new_gram_ratio"] == 0.0

    def test_new_material_contamination(self, spark):
        from facolos_data_pipelines_spark.operators.text import (
            corpus_gram_state,
            corpus_overlap_delta,
        )

        old = _docs(spark, [(1, "p q r s")])
        # batch: 2 new grams {a b c, b c d}; one of them is in ref
        batch = _docs(spark, [(2, "a b c d")])
        ref = _docs(spark, [(9, "a b c")])
        r = corpus_overlap_delta(
            batch, corpus_gram_state(old), corpus_gram_state(ref)
        ).first()
        assert r["n_delta_grams"] == 2 and r["n_new_grams"] == 2
        assert r["n_new_common"] == 1
        assert r["new_contamination"] == pytest.approx(0.5, abs=1e-6)

    def test_multi_cycle_persisted_state_loop(self, spark, tmp_path):
        """The associativity contract ACROSS cycles with state that is
        actually persisted and read back (text_lm.py's promise that the
        running totals equal a from-scratch corpus_overlap of the
        accumulated corpus): bootstrap a parquet gram-state table, run
        two delta cycles — each appends corpus_state_append rows to the
        table — and compare the running (n_grams_a, n_common) counters
        against corpus_overlap(old + batch1 + batch2, ref). Batch 2
        deliberately re-uses grams from batch 1, so the test fails if
        the appended state is not really read back."""
        from facolos_data_pipelines_spark.operators.text import (
            corpus_gram_state,
            corpus_overlap,
            corpus_overlap_delta,
            corpus_state_append,
        )

        old = _docs(spark, [(1, "a b c d"), (2, "c d e f")])
        batch1 = _docs(spark, [(3, "c d e f g"), (4, "x y z w")])
        # "e f g" and "x y z" re-appear from batch1; "m n o p" is new
        batch2 = _docs(spark, [(5, "e f g x y z"), (6, "m n o p")])
        ref = _docs(spark, [(9, "b c d e f g h m n o")])

        state_path = str(tmp_path / "gram_state")
        corpus_gram_state(old).write.parquet(state_path)
        ref_grams = corpus_gram_state(ref)

        start = corpus_overlap(old, ref).first()
        totals = {"n_grams": start["n_grams_a"], "n_common": start["n_common"]}
        corpus = old
        for batch in (batch1, batch2):
            seen = spark.read.parquet(state_path)
            d = corpus_overlap_delta(batch, seen, ref_grams).first()
            new_rows = corpus_state_append(batch, seen)
            # the append IS the n_new_grams counter (same predicate)
            assert new_rows.count() == d["n_new_grams"]
            new_rows.write.mode("append").parquet(state_path)
            totals["n_grams"] += d["n_new_grams"]
            totals["n_common"] += d["n_new_common"]
            corpus = corpus.unionByName(batch)

        full = corpus_overlap(corpus, ref).first()
        assert totals["n_grams"] == full["n_grams_a"]
        assert totals["n_common"] == full["n_common"]
        # the state table itself converged to the corpus' distinct grams
        final_state = spark.read.parquet(state_path)
        assert final_state.count() == full["n_grams_a"]
        assert final_state.select("gram").distinct().count() == full["n_grams_a"]
        # and batch2 really was deduped against batch1's appended grams:
        # a cycle-2 recount without the cycle-1 append would have over-
        # counted the shared "e f g"/"x y z" grams
        assert full["n_grams_a"] < start["n_grams_a"] + 6 + 7


class TestStateAppendProperty:
    def test_append_count_equals_delta_counter_property(self, spark):
        """Property (hypothesis): for ANY batch/state/ref word soup —
        including empty docs, whitespace, repeated grams, unicode —
        corpus_state_append's row count equals corpus_overlap_delta's
        n_new_grams, appends are disjoint from the state, and
        state ∪ appends == distinct grams of (state docs + batch).
        Few examples (Spark jobs are slow); each example is a full
        3-frame pipeline."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from facolos_data_pipelines_spark.operators.text import (
            corpus_gram_state,
            corpus_overlap_delta,
            corpus_state_append,
        )

        word = st.sampled_from(
            ["a", "b", "c", "dd", "é", "x1", "", "  ", "z"]
        )
        doc = st.lists(word, min_size=0, max_size=8).map(" ".join)
        docset = st.lists(doc, min_size=0, max_size=4)

        @settings(max_examples=8, deadline=None,
                  suppress_health_check=[HealthCheck.too_slow])
        @given(state_docs=docset, batch_docs=docset, ref_docs=docset)
        def check(state_docs, batch_docs, ref_docs):
            def frame(texts):
                return spark.createDataFrame(
                    [(i, t) for i, t in enumerate(texts)],
                    "doc_id long, text string",
                )

            state = corpus_gram_state(frame(state_docs))
            ref = corpus_gram_state(frame(ref_docs))
            batch = frame(batch_docs)
            d = corpus_overlap_delta(batch, state, ref).first()
            appended = {
                r["gram"] for r in corpus_state_append(batch, state).collect()
            }
            assert len(appended) == d["n_new_grams"]
            state_grams = {r["gram"] for r in state.collect()}
            assert not (appended & state_grams), "appends must be new"
            union_grams = {
                r["gram"]
                for r in corpus_gram_state(
                    frame(state_docs + batch_docs)
                ).collect()
            }
            assert state_grams | appended == union_grams

        check()
