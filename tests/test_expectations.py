"""Declarative expectations runner (quality.expectations) and the
key-skew profiler (operators.skew.key_skew_profile)."""

import pytest
from pyspark.sql import functions as F

from facolos_data_pipelines_spark.operators.skew import key_skew_profile
from facolos_data_pipelines_spark.quality import expect, expectations_gate


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "x@y.com"),
            (2, "a", 250.0, "bad-email"),   # out of range, bad regex
            (3, None, 50.0, None),          # null status
            (3, "b", 60.0, "z@w.org"),      # duplicate id
            (4, "zz", 70.0, "q@r.io"),      # unaccepted status
        ],
        ["id", "status", "amount", "email"],
    )


def test_expect_all_rule_types_one_pass(frame):
    report = expect(
        frame,
        [
            {"type": "not_null", "column": "status"},
            {"type": "unique", "columns": ["id"]},
            {"type": "in_range", "column": "amount", "min": 0, "max": 100},
            {"type": "accepted_values", "column": "status", "values": ["a", "b"]},
            {"type": "matches_regex", "column": "email", "pattern": r"^[^@]+@[^@]+\.[^@]+$"},
            {"type": "expression", "expr": "amount >= 0", "name": "non_negative_amount"},
        ],
    ).collect()
    by_rule = {(r["rule"], r["column"]): r for r in report}
    assert by_rule[("not_null", "status")]["n_violations"] == 1
    assert by_rule[("unique", "id")]["n_violations"] == 1
    assert by_rule[("in_range", "amount")]["n_violations"] == 1
    assert by_rule[("accepted_values", "status")]["n_violations"] == 1
    # NULL email is exempt from the regex rule; only "bad-email" fails
    assert by_rule[("matches_regex", "email")]["n_violations"] == 1
    assert by_rule[("expression", "non_negative_amount")]["n_violations"] == 0
    assert by_rule[("expression", "non_negative_amount")]["passed"] is True
    assert all(not r["passed"] for r in report if r["rule"] != "expression")

    gate = expectations_gate(
        expect(frame, [{"type": "not_null", "column": "status"}])
    ).first()
    assert (gate["n_rules"], gate["n_failed"], gate["passed"]) == (1, 1, False)


def test_expect_null_expression_verdict_is_violation(spark):
    df = spark.createDataFrame([(None,), (5,)], ["x"])
    r = expect(df, [{"type": "expression", "expr": "x > 0", "name": "pos"}]).first()
    assert r["n_violations"] == 1  # NULL > 0 is unknown -> violation


def test_expect_empty_frame_passes(spark):
    df = spark.createDataFrame([], "id INT, v DOUBLE")
    report = expect(
        df,
        [
            {"type": "not_null", "column": "id"},
            {"type": "unique", "columns": ["id"]},
            {"type": "in_range", "column": "v", "min": 0},
        ],
    ).collect()
    assert all(r["n_violations"] == 0 and r["passed"] for r in report)


def test_expect_validation_errors(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError, match="non-empty"):
        expect(df, [])
    with pytest.raises(ValueError, match="min and/or max"):
        expect(df, [{"type": "in_range", "column": "x"}])
    with pytest.raises(ValueError, match="unknown expectation"):
        expect(df, [{"type": "nope", "column": "x"}])
    with pytest.raises(ValueError, match="non-empty set"):
        expect(df, [{"type": "accepted_values", "column": "x", "values": []}])


def test_key_skew_profile(spark):
    rows = [(1, i) for i in range(80)] + [(2, i) for i in range(16)] + [
        (k, 0) for k in range(3, 7)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = key_skew_profile(df, "k", top_n=3).collect()
    assert [r["k"] for r in out] == [1, 2, 3]
    top = out[0]
    # 100 rows, 6 groups: mean group ~16.67; key 1 holds 80 rows
    assert top["n_rows"] == 80
    assert top["row_share"] == pytest.approx(0.8)
    assert top["skew_factor"] == pytest.approx(4.8)
    with pytest.raises(ValueError, match="top_n"):
        key_skew_profile(df, "k", top_n=0)
    with pytest.raises(ValueError, match="key_cols"):
        key_skew_profile(df, [])
