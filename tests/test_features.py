"""Behavioral tests for winsorize / frequency_encode (operators.features)."""

import pytest

from facolos_data_pipelines_spark.operators.features import (
    frequency_encode,
    winsorize,
)


class TestWinsorize:
    def test_clips_both_tails(self, spark):
        # 0..100: p10 = 10.0, p90 = 90.0 exactly (101 evenly-ranked rows)
        df = spark.createDataFrame([(float(i),) for i in range(101)], ["x"])
        out = winsorize(df, ["x"], lower=0.10, upper=0.90).collect()
        vals = sorted(r["x_w"] for r in out)
        assert vals[0] == 10.0 and vals[-1] == 90.0
        assert {r["x"] for r in out} == {float(i) for i in range(101)}  # originals kept
        mid = [r for r in out if 10 <= r["x"] <= 90]
        assert all(r["x_w"] == r["x"] for r in mid)  # interior untouched

    def test_nulls_pass_through(self, spark):
        df = spark.createDataFrame(
            [(1.0,), (2.0,), (3.0,), (None,)], "x double"
        )
        out = {r["x"]: r["x_w"] for r in winsorize(df, ["x"], 0.0, 1.0).collect()}
        assert out[None] is None
        assert out[2.0] == 2.0

    def test_approx_mode_close_to_exact(self, spark):
        df = spark.createDataFrame([(float(i),) for i in range(1000)], ["x"])
        exact = winsorize(df, ["x"], 0.01, 0.99, exact=True)
        approx = winsorize(df, ["x"], 0.01, 0.99, exact=False)
        lo_e = min(r["x_w"] for r in exact.collect())
        lo_a = min(r["x_w"] for r in approx.collect())
        assert abs(lo_e - lo_a) < 20  # sketch lands near the exact cut

    def test_bad_band_raises(self, spark):
        df = spark.createDataFrame([(1.0,)], ["x"])
        with pytest.raises(ValueError, match="lower < upper"):
            winsorize(df, ["x"], 0.9, 0.1)
        with pytest.raises(ValueError, match="non-empty"):
            winsorize(df, [], 0.1, 0.9)


class TestFrequencyEncode:
    def _df(self, spark):
        rows = (
            [("a", 10.0)] * 8 + [("b", 50.0)] * 2 + [(None, 100.0)]
        )
        return spark.createDataFrame(rows, "g string, y double")

    def test_frequency_only(self, spark):
        rows = {r["category"]: r for r in frequency_encode(self._df(spark), "g").collect()}
        assert rows["a"]["n"] == 8
        assert rows["a"]["freq"] == pytest.approx(8 / 11, abs=1e-6)
        assert rows["__null__"]["n"] == 1
        assert "target_enc" not in rows["a"].asDict()

    def test_target_shrinks_rare_categories_to_global_mean(self, spark):
        rows = {
            r["category"]: r
            for r in frequency_encode(
                self._df(spark), "g", target_col="y", smoothing=10.0
            ).collect()
        }
        gmean = (8 * 10.0 + 2 * 50.0 + 100.0) / 11  # ~25.45
        # rare category b (n=2) lands much nearer gmean than its own mean
        assert rows["b"]["target_mean"] == pytest.approx(50.0, abs=1e-6)
        expected_b = (2 * 50.0 + 10 * gmean) / 12
        assert rows["b"]["target_enc"] == pytest.approx(expected_b, abs=1e-4)
        # frequent category a keeps more of its own signal
        pull_a = abs(rows["a"]["target_enc"] - rows["a"]["target_mean"])
        pull_b = abs(rows["b"]["target_enc"] - rows["b"]["target_mean"])
        assert pull_a < pull_b

    def test_null_targets_excluded_from_mean_counted_in_n(self, spark):
        df = spark.createDataFrame(
            [("a", 10.0), ("a", None)], "g string, y double"
        )
        row = frequency_encode(df, "g", target_col="y").collect()[0]
        assert row["n"] == 2 and row["target_mean"] == pytest.approx(10.0, abs=1e-6)

    def test_negative_smoothing_raises(self, spark):
        with pytest.raises(ValueError, match="smoothing"):
            frequency_encode(self._df(spark), "g", target_col="y", smoothing=-1)


class TestReviewHardening:
    def test_shrink_weights_by_observed_targets_not_rows(self, spark):
        # 100 rows, 1 labeled: must shrink like n_t=1, not n=100
        rows = [("a", 1000.0)] + [("a", None)] * 99 + [("b", 10.0)] * 10
        df = spark.createDataFrame(rows, "g string, y double")
        enc = {
            r["category"]: r
            for r in __import__(
                "facolos_data_pipelines_spark.operators.features",
                fromlist=["frequency_encode"],
            ).frequency_encode(df, "g", target_col="y", smoothing=10.0).collect()
        }
        gmean = (1000.0 + 100.0) / 11  # over the 11 observed targets
        expected_a = (1 * 1000.0 + 10 * gmean) / 11  # n_t = 1
        assert enc["a"]["target_enc"] == pytest.approx(expected_a, abs=1e-3)
        assert enc["a"]["n"] == 100  # row count still reported

    def test_all_null_target_category_encodes_to_prior(self, spark):
        df = spark.createDataFrame(
            [("a", 5.0), ("z", None), ("z", None)], "g string, y double"
        )
        enc = {
            r["category"]: r
            for r in frequency_encode(df, "g", target_col="y").collect()
        }
        assert enc["z"]["target_mean"] is None
        assert enc["z"]["target_enc"] == pytest.approx(5.0, abs=1e-6)  # gmean

    def test_winsorize_all_null_column_raises_clearly(self, spark):
        df = spark.createDataFrame([(None,), (None,)], "x double")
        with pytest.raises(ValueError, match="no non-null values"):
            winsorize(df, ["x"])

    def test_winsorize_empty_frame_raises_clearly(self, spark):
        df = spark.createDataFrame([], "x double")
        with pytest.raises(ValueError, match="no non-null values"):
            winsorize(df, ["x"])


class TestQuantileBin:
    def test_equal_frequency_quartiles(self, spark):
        from facolos_data_pipelines_spark.operators.features import quantile_bin

        # 1..100: quartile cuts 25.75 / 50.5 / 75.25 -> 25 rows per bin
        df = spark.createDataFrame([(float(i),) for i in range(1, 101)], ["x"])
        out = quantile_bin(df, "x", n_bins=4).collect()
        from collections import Counter

        counts = Counter(r["x_bin"] for r in out)
        assert counts == {1: 25, 2: 25, 3: 25, 4: 25}
        by_val = {r["x"]: r["x_bin"] for r in out}
        assert by_val[25.0] == 1 and by_val[26.0] == 2  # cut 25.75
        assert by_val[100.0] == 4

    def test_nulls_pass_through_and_monotone(self, spark):
        from facolos_data_pipelines_spark.operators.features import quantile_bin

        df = spark.createDataFrame(
            [(1.0,), (2.0,), (3.0,), (4.0,), (None,)], "x double"
        )
        rows = quantile_bin(df, "x", n_bins=2, out_col="b").collect()
        got = {r["x"]: r["b"] for r in rows}
        assert got[None] is None
        assert got[1.0] <= got[2.0] <= got[3.0] <= got[4.0]

    def test_duplicate_cuts_merge_bins(self, spark):
        from facolos_data_pipelines_spark.operators.features import quantile_bin

        # constant column: every cut equals the value -> everything bin 1
        df = spark.createDataFrame([(5.0,)] * 10, "x double")
        out = quantile_bin(df, "x", n_bins=4).collect()
        assert {r["x_bin"] for r in out} == {1}

    def test_approx_mode_and_errors(self, spark):
        import pytest

        from facolos_data_pipelines_spark.operators.features import quantile_bin

        df = spark.createDataFrame([(float(i),) for i in range(1, 1001)], ["x"])
        exact = quantile_bin(df, "x", 4).groupBy("x_bin").count().collect()
        approx = quantile_bin(df, "x", 4, exact=False).groupBy("x_bin").count().collect()
        e = {r["x_bin"]: r["count"] for r in exact}
        a = {r["x_bin"]: r["count"] for r in approx}
        assert all(abs(e[b] - a.get(b, 0)) < 100 for b in e)
        with pytest.raises(ValueError, match="n_bins"):
            quantile_bin(df, "x", 1)
        allnull = spark.createDataFrame([(None,)], "x double")
        with pytest.raises(ValueError, match="no non-null"):
            quantile_bin(allnull, "x", 4)
