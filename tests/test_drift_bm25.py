"""Behavioral tests for the KS / chi-squared drift monitors and BM25
retrieval (quality.checks.ks_two_sample, chi2_categorical,
operators.text.bm25_topk)."""

import pytest

from facolos_data_pipelines_spark.operators.text import bm25_topk
from facolos_data_pipelines_spark.quality.checks import (
    chi2_categorical,
    ks_two_sample,
)


def _vals(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], ["x"])


class TestKSTwoSample:
    def test_identical_samples_zero_stat(self, spark):
        df = _vals(spark, [1, 2, 3, 4, 5, 5, 7])
        row = ks_two_sample(df, df, "x").collect()[0]
        assert row["ks_stat"] == 0.0
        assert row["n_base"] == 7 and row["n_curr"] == 7

    def test_handcrafted_shift(self, spark):
        # base [1,2,3,4] vs curr [3,4,5,6]: ECDFs diverge most after 2
        # (base 0.5, curr 0.0) -> D = 0.5 attained first at value 2
        base = _vals(spark, [1, 2, 3, 4])
        curr = _vals(spark, [3, 4, 5, 6])
        row = ks_two_sample(base, curr, "x").collect()[0]
        assert row["ks_stat"] == pytest.approx(0.5, abs=1e-6)
        assert row["at_value"] == 2.0
        assert row["n_base"] == 4 and row["n_curr"] == 4

    def test_disjoint_supports_stat_one(self, spark):
        row = ks_two_sample(
            _vals(spark, [1, 2, 3]), _vals(spark, [10, 11]), "x"
        ).collect()[0]
        assert row["ks_stat"] == pytest.approx(1.0, abs=1e-6)
        assert row["at_value"] == 3.0

    def test_partitioning_invariance(self, spark):
        # the distributed prefix sum must not depend on the partition
        # count — 1 partition (fully local) == many (offsets exercised)
        base = _vals(spark, range(100))
        curr = _vals(spark, range(30, 130))
        one = ks_two_sample(base, curr, "x", num_partitions=1).collect()[0]
        many = ks_two_sample(base, curr, "x", num_partitions=7).collect()[0]
        assert one == many
        assert one["ks_stat"] == pytest.approx(0.3, abs=1e-6)

    def test_nulls_excluded_empty_side_raises(self, spark):
        base = spark.createDataFrame([(1.0,), (None,)], "x double")
        curr = spark.createDataFrame([(None,)], "x double")
        with pytest.raises(ValueError, match="empty curr"):
            ks_two_sample(base, curr, "x")


class TestChi2Categorical:
    def _cats(self, spark, cats):
        return spark.createDataFrame([(c,) for c in cats], "g string")

    def test_identical_distribution_zero_terms(self, spark):
        df = self._cats(spark, ["a"] * 6 + ["b"] * 4)
        rows = chi2_categorical(df, df, "g").collect()
        assert [r["category"] for r in rows] == ["a", "b"]
        for r in rows:
            assert r["chi2_term"] == pytest.approx(0.0, abs=1e-6)
            assert r["expected"] == pytest.approx(r["n_curr"], abs=1e-6)

    def test_new_category_floored_not_infinite(self, spark):
        base = self._cats(spark, ["a"] * 10)
        curr = self._cats(spark, ["a"] * 5 + ["z"] * 5)
        rows = {r["category"]: r for r in chi2_categorical(base, curr, "g").collect()}
        assert rows["z"]["n_base"] == 0
        # expected floored at epsilon * total_curr = 1e-4 * 10
        assert rows["z"]["expected"] == pytest.approx(1e-3, abs=1e-6)
        assert rows["z"]["chi2_term"] > 1000  # large but finite

    def test_null_is_a_real_category(self, spark):
        base = spark.createDataFrame([("a",), (None,)], "g string")
        curr = spark.createDataFrame([(None,), (None,)], "g string")
        rows = {r["category"]: r for r in chi2_categorical(base, curr, "g").collect()}
        assert rows["__null__"]["n_base"] == 1
        assert rows["__null__"]["n_curr"] == 2

    def test_sum_matches_classical_statistic(self, spark):
        # textbook 2-category example: base 50/50, curr 60/40 of 100
        # expected = 50/50; chi2 = (60-50)^2/50 + (40-50)^2/50 = 4.0
        base = self._cats(spark, ["a"] * 50 + ["b"] * 50)
        curr = self._cats(spark, ["a"] * 60 + ["b"] * 40)
        total = sum(
            r["chi2_term"] for r in chi2_categorical(base, curr, "g").collect()
        )
        assert total == pytest.approx(4.0, abs=1e-4)


class TestBM25:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )

    def test_ranking_prefers_tf_and_brevity(self, spark):
        docs = self._docs(
            spark,
            [
                "spark spark spark",  # 0: high tf, short
                "spark filler filler filler filler filler filler",  # 1
                "no match at all",  # 2
                "spark spark filler",  # 3
            ],
        )
        rows = bm25_topk(docs, ["spark"], k=10).collect()
        ids = [r["doc_id"] for r in rows]
        assert 2 not in ids  # zero-match docs are not returned
        assert ids[0] == 0  # highest tf, shortest doc wins
        assert ids.index(3) < ids.index(1)  # tf 2 short beats tf 1 long
        assert all(r["bm25"] > 0 for r in rows)

    def test_multi_term_sums_and_counts_matches(self, spark):
        docs = self._docs(
            spark, ["alpha beta", "alpha alpha", "beta", "gamma"]
        )
        rows = {
            r["doc_id"]: r
            for r in bm25_topk(docs, ["alpha", "beta"], k=10).collect()
        }
        assert rows[0]["n_terms_matched"] == 2
        assert rows[1]["n_terms_matched"] == 1
        assert 3 not in rows
        # matching both query terms outranks matching one twice when
        # idf is equal (df(alpha)=2, df(beta)=2, same lengths)
        assert rows[0]["bm25"] > rows[2]["bm25"]

    def test_rare_term_has_higher_idf_weight(self, spark):
        # 'rare' appears in 1 of 5 docs, 'common' in 4 of 5; same tf/dl
        docs = self._docs(
            spark,
            ["rare pad", "common pad", "common pad", "common pad", "common pad"],
        )
        rows = {
            r["doc_id"]: r
            for r in bm25_topk(docs, ["rare", "common"], k=10).collect()
        }
        assert rows[0]["bm25"] > rows[1]["bm25"]

    def test_k_truncates_and_tiebreak_is_id(self, spark):
        docs = self._docs(spark, ["tie word"] * 5)
        rows = bm25_topk(docs, ["tie"], k=3).collect()
        assert [r["doc_id"] for r in rows] == [0, 1, 2]

    def test_empty_query_raises(self, spark):
        with pytest.raises(ValueError, match="non-empty"):
            bm25_topk(self._docs(spark, ["x"]), [])

    def test_case_normalization(self, spark):
        docs = self._docs(spark, ["SPARK Spark spark"])
        rows = bm25_topk(docs, ["Spark"], k=1).collect()
        assert rows[0]["n_terms_matched"] == 1
        assert rows[0]["bm25"] > 0


class TestEmbeddingOutliers:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )

    def test_planted_outlier_flagged(self, spark):
        from facolos_data_pipelines_spark.operators.similarity import (
            embedding_outliers,
        )

        import random

        rng = random.Random(7)
        cloud = [[rng.gauss(0, 0.1) for _ in range(8)] for _ in range(40)]
        planted = [50.0] * 8  # far off the manifold
        rows = {
            r["vec_id"]: r
            for r in embedding_outliers(
                self._emb(spark, cloud + [planted]), dim=8
            ).collect()
        }
        assert rows[40]["is_outlier"] is True
        flagged = [i for i, r in rows.items() if r["is_outlier"]]
        assert flagged == [40]
        assert rows[40]["z"] > 3.0 and rows[0]["z"] < 3.0

    def test_identical_vectors_zero_z_no_flags(self, spark):
        from facolos_data_pipelines_spark.operators.similarity import (
            embedding_outliers,
        )

        rows = embedding_outliers(
            self._emb(spark, [[1.0] * 4] * 5), dim=4
        ).collect()
        assert all(r["z"] == 0.0 and r["is_outlier"] is False for r in rows)
        assert all(r["dist"] == 0.0 for r in rows)

    def test_width_mismatch_raises(self, spark):
        from facolos_data_pipelines_spark.operators.similarity import (
            embedding_outliers,
        )

        from pyspark.errors import SparkRuntimeException

        with pytest.raises(SparkRuntimeException, match="vector width"):
            embedding_outliers(
                self._emb(spark, [[1.0, 2.0]]), dim=8
            ).collect()


class TestRRFFusion:
    def test_fused_ranking_matches_hand_computation(self, spark):
        """Two 3-row lists with one shared doc: RRF scores must equal
        the hand-computed 1/(60+rank) sums, the shared doc leads, and
        n_lists reports list membership."""
        from facolos_data_pipelines_spark.operators.similarity import rrf_fuse

        lex = spark.createDataFrame(
            [(1, 9.0), (2, 5.0), (3, 1.0)], ["doc_id", "bm25"]
        )
        vec = spark.createDataFrame(
            [(2, 0.9), (4, 0.8), (5, 0.7)], ["doc_id", "cosine"]
        )
        out = rrf_fuse([(lex, "bm25"), (vec, "cosine")], topk=10).collect()
        got = {r["doc_id"]: (r["rrf_score"], r["n_lists"]) for r in out}
        # doc 2: rank 2 in lex, rank 1 in vec
        assert got[2] == (round(1 / 62 + 1 / 61 + 1e-9, 6), 2)
        assert got[1] == (round(1 / 61 + 1e-9, 6), 1)  # rank 1 in lex
        assert got[4] == (round(1 / 62 + 1e-9, 6), 1)  # rank 2 in vec
        # doc 2 (in both lists) outranks every single-list doc
        assert out[0]["doc_id"] == 2
        # equal rrf_score (rank-1 singletons 1 and... none) — order is
        # score desc then id asc: 1 (1/61) precedes 4 (1/62)
        ids = [r["doc_id"] for r in out]
        assert ids.index(1) < ids.index(4)

    def test_tie_break_and_topk(self, spark):
        from facolos_data_pipelines_spark.operators.similarity import rrf_fuse

        lst = spark.createDataFrame(
            [(i, 1.0) for i in range(10, 0, -1)], ["doc_id", "s"]
        )
        out = rrf_fuse([(lst, "s")], topk=3).collect()
        # all scores tie -> rank by id asc -> top-3 are ids 1..3
        assert [r["doc_id"] for r in out] == [1, 2, 3]
        with pytest.raises(ValueError, match="ranked list"):
            rrf_fuse([])

    def test_null_and_nan_scores_get_no_rank(self, spark):
        """NULL- and NaN-scored rows are not retrieval hits: neither may
        claim a rank. NaN matters because Spark orders NaN above every
        double — the old desc window ranked a NaN row FIRST while the
        sort_array rewrite would have ranked it LAST; dropping it is the
        only rank that's stable and meaningful."""
        from facolos_data_pipelines_spark.operators.similarity import rrf_fuse

        lst = spark.createDataFrame(
            [(1, 2.0), (2, None), (3, float("nan")), (4, 1.0)],
            "doc_id long, s double",
        )
        out = rrf_fuse([(lst, "s")], topk=10).collect()
        got = {r["doc_id"]: r["rrf_score"] for r in out}
        assert set(got) == {1, 4}, "NULL and NaN rows must be dropped"
        # and the surviving ranks are 1 and 2 (not 2 and 3, or 3 and 4)
        assert got[1] == round(1 / 61 + 1e-9, 6)
        assert got[4] == round(1 / 62 + 1e-9, 6)


class TestContaminationFraction:
    def test_fraction_and_short_doc_zero(self, spark):
        """A doc sharing half its distinct 3-grams with the benchmark
        scores 0.5; a disjoint doc scores 0.0; a doc too short for any
        3-gram reports n_grams=0 and score 0.0."""
        from facolos_data_pipelines_spark.operators.text import (
            contamination_fraction,
        )

        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta")], ["doc_id", "text"]
        )
        docs = spark.createDataFrame(
            [
                # grams: {alpha beta gamma, beta gamma delta, gamma delta zz,
                #         delta zz yy} -> 2 of 4 in bench
                (1, "alpha beta gamma delta zz yy"),
                (2, "completely different words here now"),
                (3, "too short"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: r
            for r in contamination_fraction(docs, bench, n=3).collect()
        }
        assert out[1]["n_grams"] == 4 and out[1]["n_overlap"] == 2
        assert out[1]["contamination"] == 0.5
        assert out[2]["n_overlap"] == 0 and out[2]["contamination"] == 0.0
        assert out[3]["n_grams"] in (0, 1)  # short-doc fallback contract
        assert out[3]["n_overlap"] == 0 and out[3]["contamination"] == 0.0
