"""Cycle monitoring — SURVEY.md §2.4 A7 and the §5 ops-level gates.

The reference's ProductionMonitor keeps per-cycle metrics in a Python
deque on the scheduler and alerts on thresholds
(src/monitoring/production_monitor.py:39-125): duration over budget,
>=3 consecutive failures, >=5 no-data cycles, rolling success < 80%.
Here the metrics live in a table (written by the pipeline runner or a
StreamingQueryListener) and every check is a window/agg query — the
monitor state survives driver restarts and is itself queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One row per pipeline cycle — the reference's metrics dict
# (production_monitor.py:43-62).
CYCLE_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("cycle_id", T.StringType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("duration_seconds", T.DoubleType()),
        T.StructField("records_processed", T.LongType()),
        T.StructField("success", T.BooleanType()),
    ]
)


def cycle_summary(metrics: DataFrame, last_n: int = 10) -> DataFrame:
    """A7 — rolling stats over the last N cycles: avg duration, total
    records, success rate (production_monitor.py:114-121, 201-230)."""
    w = Window.orderBy(F.col("started_at").desc())
    recent = metrics.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= last_n
    )
    return recent.agg(
        F.count("*").cast("long").alias("cycles"),
        F.round(F.avg("duration_seconds"), 3).alias("avg_duration_seconds"),
        F.sum("records_processed").cast("long").alias("total_records"),
        F.round(
            F.sum(F.when(F.col("success"), 1).otherwise(0)) / F.count("*") * 100, 2
        ).alias("success_rate_pct"),
    )


def alert_conditions(
    metrics: DataFrame,
    max_duration_seconds: float = 600.0,
    max_consecutive_failures: int = 3,
    max_no_data_cycles: int = 5,
    min_success_rate_pct: float = 80.0,
    last_n: int = 10,
) -> DataFrame:
    """The reference's four alert rules as one single-row frame of
    booleans (production_monitor.py:84-125; thresholds from
    config/production.py:37-39). Consecutive counters are computed with
    a run-length trick (cycles since last success / last data), not
    driver-side state."""
    w_desc = Window.orderBy(F.col("started_at").desc())
    tagged = metrics.withColumn("_rn", F.row_number().over(w_desc))

    # cycles since the most recent success / most recent with-data cycle
    last_success_rn = tagged.filter(F.col("success")).agg(F.min("_rn")).collect()[0][0]
    last_data_rn = (
        tagged.filter(F.col("records_processed") > 0).agg(F.min("_rn")).collect()[0][0]
    )
    total = metrics.count()
    consecutive_failures = (last_success_rn - 1) if last_success_rn else total
    no_data_cycles = (last_data_rn - 1) if last_data_rn else total

    summary = cycle_summary(metrics, last_n).collect()[0]
    latest = (
        tagged.filter(F.col("_rn") == 1)
        .select("duration_seconds")
        .collect()
    )
    latest_duration = latest[0][0] if latest else 0.0

    spark = metrics.sparkSession
    row = [
        (
            float(latest_duration),
            bool(latest_duration > max_duration_seconds),
            int(consecutive_failures),
            bool(consecutive_failures >= max_consecutive_failures),
            int(no_data_cycles),
            bool(no_data_cycles >= max_no_data_cycles),
            float(summary["success_rate_pct"] or 0.0),
            bool((summary["success_rate_pct"] or 0.0) < min_success_rate_pct),
        )
    ]
    schema = T.StructType(
        [
            T.StructField("latest_duration_seconds", T.DoubleType()),
            T.StructField("duration_alert", T.BooleanType()),
            T.StructField("consecutive_failures", T.IntegerType()),
            T.StructField("failure_alert", T.BooleanType()),
            T.StructField("no_data_cycles", T.IntegerType()),
            T.StructField("no_data_alert", T.BooleanType()),
            T.StructField("success_rate_pct", T.DoubleType()),
            T.StructField("success_rate_alert", T.BooleanType()),
        ]
    )
    return spark.createDataFrame(row, schema)


def record_cycle(
    spark,
    path: str,
    cycle_id: str,
    started_at,
    duration_seconds: float,
    records_processed: int,
    success: bool,
) -> None:
    """Append one cycle-metrics row (the runner calls this; a
    StreamingQueryListener would do the same from query progress)."""
    spark.createDataFrame(
        [(cycle_id, started_at, float(duration_seconds), int(records_processed), bool(success))],
        CYCLE_METRICS_SCHEMA,
    ).write.mode("append").parquet(path)
