"""Event-stream operators: sessionization, as-of join, funnels, and
cohort retention.

The reference's event surface is schedule-driven micro-batches (SURVEY
§2.7); a Spark-native engine over an events table additionally needs the
classic event-time operators Spark has no single built-in for in batch
mode — most importantly:

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
    if gap_minutes <= 0:
        raise ValueError(f"sessionize: gap_minutes must be positive, got {gap_minutes}")
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
    float epoch drift. ``unix_millis`` rejects TIMESTAMP_NTZ inputs
    (parquet written without timezone metadata reads as NTZ), so the
    endpoints are cast to TIMESTAMP first — exact under the session's
    pinned-UTC timezone (session.build_spark), and a no-op for columns
    that are already TIMESTAMP.
    """
    sess = sessionize(df, key_col, ts_col, gap_minutes, tiebreak_cols)
    as_ts = lambda c: c.cast("timestamp")  # noqa: E731
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        (
            F.unix_millis(as_ts(F.max(ts_col))) - F.unix_millis(as_ts(F.min(ts_col)))
        ).alias("duration_ms"),
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
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gains the ``right_cols`` of the
    nearest right row for the same key — the latest with
    ``right.ts <= left.ts`` (``direction='backward'``, default) or the
    earliest with ``right.ts >= left.ts`` (``'forward'``). NULLs when
    no such right row exists.

    Merge formulation: tag and union both inputs, sort within each key
    by (ts, side) — right rows sort adjacent to left rows at equal ts
    on the inclusive side — and carry the right payload across with
    ``last(..., ignorenulls=True)`` (forward runs the identical frame
    over the reversed ordering). One shuffle of |L|+|R| rows keyed by
    ``key_col``; no range-join blowup, no per-row subquery. Ties among
    right rows at the same ts resolve to the greatest
    ``right_tiebreak`` for backward and the smallest for forward (pass
    one when right (key, ts) is not unique).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if ts_col in right_cols or key_col in right_cols:
        raise ValueError(
            "asof_join: right_cols must not repeat ts_col/key_col "
            "(the matched ts is always returned as ts_col+suffix)"
        )
    reserved = {"_side", "_rpayload", "_match", "_rtb"}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(f"asof_join: left columns collide with internals: {clash}")
    out_cols = {f"{ts_col}{suffix}", *(f"{c}{suffix}" for c in right_cols)}
    clash = out_cols & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: suffixed output columns collide with left: {clash}"
        )
    payload = F.struct(
        F.col(ts_col).alias(ts_col), *[F.col(c).alias(c) for c in right_cols]
    )
    # NULL-timestamp right rows can never be "at or before/after" any
    # left row (SQL comparison semantics — DuckDB ASOF agrees); without
    # this filter the asc nulls-first sort would carry them into every
    # left row as a phantom earliest match.
    right = right.filter(F.col(ts_col).isNotNull())
    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        *([F.col(right_tiebreak).alias("_rtb")] if right_tiebreak else []),
        payload.alias("_rpayload"),
        F.lit(0).alias("_side"),
    )
    l = left.withColumn("_side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        order: list[Column] = [F.col(ts_col).asc(), F.col("_side").asc()]
        if right_tiebreak:
            order.append(F.col("_rtb").asc_nulls_last())
    else:
        # reversed scan: later timestamps first, right rows still ahead
        # of left rows at equal ts (inclusive), nearest-following wins
        order = [F.col(ts_col).desc(), F.col("_side").asc()]
        if right_tiebreak:
            order.append(F.col("_rtb").desc_nulls_last())
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # a NULL-ts LEFT row matches nothing either (it would otherwise sit
    # at one end of the sort and absorb whatever payload is adjacent)
    matched = F.when(
        F.col(ts_col).isNotNull(), F.last("_rpayload", ignorenulls=True).over(w)
    )
    out = (
        unioned.withColumn("_match", matched)
        .filter(F.col("_side") == 1)
        .drop("_side", "_rpayload", *(["_rtb"] if right_tiebreak else []))
    )
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col(f"_match.{ts_col}").alias(f"{ts_col}{suffix}"))
    sel.extend(F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols)
    return out.select(*sel)


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Ordered funnel: how many keys completed each prefix of ``steps``
    IN ORDER (a step counts only at-or-after the previous step's first
    completion).

    Single-sort formulation: one shuffle+sort per key (shared by all
    stages — each stage is a running-max flag over the SAME window
    ordering, so Catalyst stacks Window nodes on one Exchange), then a
    per-key max and a global sum. No joins, no per-step passes over the
    corpus; cost is independent of funnel depth. Result: one row per
    step — (step_index, step, n_completed), monotonically
    non-increasing.
    """
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = df.select(key_col, ts_col, type_col, *(tiebreak_cols or []))
    prev_flag = F.lit(1)
    reach_cols = []
    for i, step in enumerate(steps):
        # reached_i at a row: some event at-or-before it completed the
        # i-prefix — current row counts when it matches step i and the
        # (i-1)-prefix was already reached at this row.
        flag = F.when(
            F.col(type_col) == step,
            prev_flag if i == 0 else F.col(f"_r{i - 1}"),
        ).otherwise(F.lit(0))
        cur = cur.withColumn(f"_r{i}", F.max(flag).over(w))
        reach_cols.append(f"_r{i}")
    per_key = cur.groupBy(key_col).agg(
        *[F.max(c).alias(c) for c in reach_cols]
    )
    totals = per_key.agg(
        *[F.sum(c).cast("long").alias(f"_n{i}") for i, c in enumerate(reach_cols)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_index"),
                F.lit(s).alias("step"),
                F.col(f"_n{i}").alias("n_completed"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return totals.select(F.explode(rows).alias("_f")).select("_f.*")


def cohort_retention(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: keys grouped by first-active week, and
    for each (cohort_week, weeks-since-cohort) the count of distinct
    keys active in that week.

    Plan: per-key first week (one groupBy on the key), distinct
    (key, week) activity (same key partitioning — AQE reuses the
    shuffle), join on the key, then a count-distinct keyed by
    (cohort_week, period). The wide data is touched once; everything
    downstream carries (key, week) pairs only. Week truncation is ISO
    (Monday) in both Spark and standard SQL engines; the period index
    is integer epoch-week arithmetic, exact across engines.
    """
    week = F.date_trunc("week", F.col(ts_col))
    cohorts = df.groupBy(key_col).agg(F.min(week).alias("cohort_week"))
    activity = df.select(F.col(key_col), week.alias("activity_week")).distinct()
    # calendar-day arithmetic, not epoch seconds: week boundaries are
    # always a multiple of 7 days apart, but NOT of 604800 s in a
    # DST-observing session timezone (spring-forward weeks are 1 h
    # short and an epoch quotient would truncate to period-1)
    period = (F.datediff("activity_week", "cohort_week") / F.lit(7)).cast("long")
    return (
        activity.join(cohorts, key_col)
        .groupBy("cohort_week", period.alias("period_weeks"))
        .agg(F.count_distinct(F.col(key_col)).cast("long").alias("n_active"))
    )


def rolling_stats(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    n_rows: int = 5,
    tiebreak_cols: list[str] | None = None,
    round_digits: int = 2,
) -> DataFrame:
    """Trailing-window feature engineering: per key, the rolling
    sum / avg / min / max / count of ``value_col`` over the last
    ``n_rows`` rows (current inclusive) in event order — the standard
    "recent behavior" features a training pipeline derives per user.

    One shuffle on the key, one sort, one Window node computing all
    five aggregates over the same ROWS frame — sliding-frame aggs are
    O(1) amortized per row (running add/evict), so cost at 100 TB is
    the key sort, identical to sessionize. Ordering ties break on
    ``tiebreak_cols`` for a deterministic frame; sum/avg are rounded
    (epsilon-nudged) so the result is engine-comparable.
    """
    if n_rows <= 0:
        raise ValueError("rolling_stats: n_rows must be positive")
    ties = [F.col(t).asc() for t in (tiebreak_cols or []) if t in df.columns]
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(order_col).asc(), *ties)
        .rowsBetween(-(n_rows - 1), 0)
    )
    v = F.col(value_col)
    return df.select(
        "*",
        F.round(F.sum(v).over(w) + 1e-6, round_digits).alias("roll_sum"),
        F.round(F.avg(v).over(w) + 1e-6, round_digits).alias("roll_avg"),
        F.min(v).over(w).alias("roll_min"),
        F.max(v).over(w).alias("roll_max"),
        F.count(v).over(w).cast("long").alias("roll_n"),
    )


def time_decayed_sum(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_days: float = 30.0,
    ref_ts: str | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """Exponential time-decay aggregate per key: each event contributes
    ``value * 0.5 ** (age_days / half_life_days)``, where age is
    measured back from ``ref_ts`` (an ISO timestamp string; default =
    the frame's max ``ts_col``). The standard recency-weighted user
    value / feature-store signal: unlike a trailing window it never
    forgets abruptly, and unlike a plain sum it can be maintained
    incrementally (a cycle at time t1 rescales a stored total from t0
    by 0.5 ** ((t1 - t0)/h) and adds the new batch — the decay law is
    associative under rescaling, same loop contract as
    corpus_overlap_delta).

    One scan + one map-side-combinable groupBy on the key: the weight
    is a per-row scalar expression (age in fractional days from the
    timestamp difference in seconds), so the whole operator is a single
    hash aggregate — no window sort, no join. When ``ref_ts`` is None
    the max timestamp costs one extra tiny agg whose scalar joins in by
    a 1-row broadcast cross join (never a shuffle of the fact).
    Emits per key: decayed_value (rounded, engine-comparable),
    raw_value, n_events, last_ts."""
    if ref_ts is not None:
        ref = F.lit(ref_ts).cast("timestamp")
        base = df.withColumn("_ref", ref)
    else:
        mx = df.agg(F.max(ts_col).alias("_ref"))
        base = df.crossJoin(F.broadcast(mx))
    # exact integer microsecond age (works on NTZ and LTZ timestamps,
    # no epoch-double wobble), then ONE division to fractional days —
    # bit-identical across engines computing the same integer diff
    age_days = F.timestamp_diff("MICROSECOND", F.col(ts_col), F.col("_ref")) / F.lit(
        86400000000.0
    )
    w = F.pow(F.lit(0.5), age_days / F.lit(half_life_days))
    v = F.col(value_col)
    return base.groupBy(key_col).agg(
        F.round(F.sum(v * w) + F.lit(1e-9), round_digits).alias("decayed_value"),
        F.round(F.sum(v) + F.lit(1e-9), round_digits).alias("raw_value"),
        F.count(v).cast("long").alias("n_events"),
        F.max(ts_col).alias("last_ts"),
    )
