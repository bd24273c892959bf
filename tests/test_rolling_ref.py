"""rolling_stats trailing-window features and referential_check FK gate."""

from datetime import datetime

import pytest

from facolos_data_pipelines_spark.operators.events import rolling_stats
from facolos_data_pipelines_spark.quality.checks import referential_check


def _ts(m):
    return datetime(2024, 1, 1, 12, m)


def test_rolling_stats_trailing_frame(spark):
    rows = [
        (1, 1, _ts(0), 10.0),
        (2, 1, _ts(1), 20.0),
        (3, 1, _ts(2), 30.0),
        (4, 1, _ts(3), 40.0),
        (5, 2, _ts(0), 5.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = {
        r["event_id"]: r
        for r in rolling_stats(
            df, "user_id", "ts", "value", n_rows=3, tiebreak_cols=["event_id"]
        ).collect()
    }
    # row 4: frame = rows 2,3,4 -> sum 90, avg 30, min 20, max 40, n 3
    assert out[4]["roll_sum"] == 90.0
    assert out[4]["roll_avg"] == 30.0
    assert out[4]["roll_min"] == 20.0
    assert out[4]["roll_max"] == 40.0
    assert out[4]["roll_n"] == 3
    # row 1: frame is just itself; user 2 never sees user 1's rows
    assert out[1]["roll_n"] == 1 and out[1]["roll_sum"] == 10.0
    assert out[5]["roll_n"] == 1 and out[5]["roll_max"] == 5.0
    with pytest.raises(ValueError, match="must be positive"):
        rolling_stats(df, "user_id", "ts", "value", n_rows=0)


def test_referential_check_counts_orphans_and_exempts_null_fk(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id: long, fk: long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk: long")
    row = referential_check(child, parent, ["fk"], ["pk"]).collect()[0]
    assert row["n_child"] == 4
    assert row["n_null_fk"] == 1  # NULL FK exempt, not an orphan
    assert row["n_orphans"] == 1  # fk=99
    assert row["ref_ok"] is False

    ok = referential_check(
        child.filter("fk = 10 OR fk IS NULL"), parent, ["fk"], ["pk"]
    ).collect()[0]
    assert ok["n_orphans"] == 0 and ok["ref_ok"] is True

    with pytest.raises(ValueError, match="equal length"):
        referential_check(child, parent, ["fk"], ["pk", "pk2"])

    with pytest.raises(ValueError, match="non-empty"):
        referential_check(child, parent, [], [])

    clashing = child.withColumnRenamed("id", "__p_fk")
    with pytest.raises(ValueError, match="__p_"):
        referential_check(clashing, parent, ["fk"], ["pk"])
