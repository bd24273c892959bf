"""Cycle monitoring (A7 + ops gates): rolling stats and alert rules."""

import datetime as dt

from facolos_data_pipelines_spark.quality.monitor import (
    CYCLE_METRICS_SCHEMA,
    alert_conditions,
    cycle_summary,
    record_cycle,
)


def _metrics(spark, rows):
    data = [
        (f"c{i}", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=10 * i), dur, rec, ok)
        for i, (dur, rec, ok) in enumerate(rows)
    ]
    return spark.createDataFrame(data, CYCLE_METRICS_SCHEMA)


def test_cycle_summary_rolling(spark):
    m = _metrics(spark, [(60.0, 100, True)] * 8 + [(120.0, 0, False)] * 2)
    s = cycle_summary(m, last_n=10).collect()[0]
    assert s["cycles"] == 10
    assert s["success_rate_pct"] == 80.0
    assert s["total_records"] == 800
    assert s["avg_duration_seconds"] == 72.0


def test_alerts_all_clear(spark):
    m = _metrics(spark, [(60.0, 100, True)] * 10)
    a = alert_conditions(m).collect()[0]
    assert not any(
        a[k] for k in ["duration_alert", "failure_alert", "no_data_alert", "success_rate_alert"]
    )
    assert a["consecutive_failures"] == 0


def test_alerts_fire_on_failure_streak_and_no_data(spark):
    # 6 good cycles then 4 failing empty ones (latest last)
    m = _metrics(spark, [(60.0, 100, True)] * 6 + [(700.0, 0, False)] * 4)
    a = alert_conditions(m).collect()[0]
    assert a["consecutive_failures"] == 4 and a["failure_alert"]
    assert a["no_data_cycles"] == 4  # < 5 -> no alert yet
    assert not a["no_data_alert"]
    assert a["duration_alert"]  # latest cycle 700s > 600s budget
    assert a["success_rate_pct"] == 60.0 and a["success_rate_alert"]


def test_record_cycle_roundtrip(spark, tmp_path):
    path = str(tmp_path / "metrics")
    record_cycle(spark, path, "c1", dt.datetime(2024, 1, 1), 12.5, 42, True)
    record_cycle(spark, path, "c2", dt.datetime(2024, 1, 1, 0, 10), 13.5, 0, False)
    m = spark.read.parquet(path)
    assert m.count() == 2
    s = cycle_summary(m).collect()[0]
    assert s["total_records"] == 42 and s["success_rate_pct"] == 50.0
