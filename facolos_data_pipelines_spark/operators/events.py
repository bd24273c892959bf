"""Event-stream operators: sessionization and as-of join.

The reference's event surface is schedule-driven micro-batches (SURVEY
§2.7); a Spark-native engine over an events table additionally needs the
two classic event-time operators Spark has no single built-in for in
batch mode:

- **sessionization** — gap-based session assignment (the batch twin of
  ``F.session_window``), implemented as one window pass per key: a
  session-start flag from ``lag`` and a running sum. One shuffle on the
  session key; no self-join, no explode. At 100 TB this is the plan you
  want — cost is a sort within each key partition, and AQE handles
  skewed keys (a bot user with millions of events still sorts within
  one partition; cap with ``skew.salted_agg`` upstream if needed).
- **as-of join** — for every left event, the most recent right event at
  or before it (per key). Implemented as union + last-ignore-nulls over
  a single key-partitioned sort — the merge-join formulation — instead
  of a range join (which Spark would plan as a broadcast-nested-loop or
  an exploded band join, both quadratic in the worst case). Cost: one
  shuffle of ``|L| + |R|`` rows on the key, then a linear pass. This is
  the standard streaming-systems trick (cf. KDB asof, Flink temporal
  join) expressed in pure DataFrame ops.

Both carry DuckDB oracle twins (`__spark_entry__.py`): sessionize via
the identical lag/cumsum SQL, asof_join via DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_cols: list[str] | None = None,
    session_col: str = "session_idx",
) -> DataFrame:
    """Assign a per-key session index: a new session starts when the gap
    since the key's previous event exceeds ``gap_minutes``.

    Ordering within a key is (ts, *tiebreak_cols); pass a unique
    tie-break (e.g. event_id) when timestamps can repeat, otherwise the
    running sum is still correct but row order within the tie is
    engine-dependent. Plan: a single window (one shuffle + sort on
    ``key_col``) computing lag and the running session count in the
    same pass — both window functions share the frame, so Catalyst
    emits one Window node.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    is_new = (prev.isNull() | (F.col(ts_col) > prev + gap)).cast("long")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_new).over(running))


def session_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    value_col: str | None = "value",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session rollup: start/end, event count, duration, value sum.

    Built on :func:`sessionize`; the groupBy on (key, session_idx) is
    partitioned compatibly with the window's shuffle on ``key_col``, so
    AQE coalesces rather than re-shuffling the full width. Durations are
    integer milliseconds (``unix_millis``) — exact across engines, no
    float epoch drift.
    """
    sess = sessionize(df, key_col, ts_col, gap_minutes, tiebreak_cols)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        (F.unix_millis(F.max(ts_col)) - F.unix_millis(F.min(ts_col))).alias(
            "duration_ms"
        ),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return sess.groupBy(key_col, "session_idx").agg(*aggs)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    suffix: str = "_asof",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gains the ``right_cols`` of
    the latest right row with ``right.ts <= left.ts`` for the same key
    (NULLs when no prior right row exists).

    Merge formulation: tag and union both inputs, sort within each key
    by (ts, side) — right rows sort before left rows at equal ts, so
    the match is inclusive — and carry the right payload forward with
    ``last(..., ignorenulls=True)``. One shuffle of |L|+|R| rows keyed
    by ``key_col``; no range-join blowup, no per-row subquery. Ties
    among right rows at the same ts resolve to the greatest
    ``right_tiebreak`` (pass one when right (key, ts) is not unique).
    """
    payload = F.struct(
        F.col(ts_col).alias(ts_col), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        *([F.col(right_tiebreak).alias("_rtb")] if right_tiebreak else []),
        payload.alias("_rpayload"),
        F.lit(0).alias("_side"),
    )
    l = left.withColumn("_side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    order: list[Column] = [F.col(ts_col), F.col("_side")]
    if right_tiebreak:
        order.append(F.col("_rtb").asc_nulls_last())
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_rpayload", ignorenulls=True).over(w)
    out = (
        unioned.withColumn("_match", matched)
        .filter(F.col("_side") == 1)
        .drop("_side", "_rpayload", *(["_rtb"] if right_tiebreak else []))
    )
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col(f"_match.{ts_col}").alias(f"{ts_col}{suffix}"))
    sel.extend(F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols)
    return out.select(*sel)
