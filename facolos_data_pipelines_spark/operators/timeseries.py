"""Time-series regularization: date-spine densification with gap fill.

Training pipelines that feed sequence models (demand forecasting,
per-entity activity curves, rolling-feature generation) need a REGULAR
time grid: one row per (entity, bucket) even for buckets where nothing
happened. Raw event/order tables are sparse — a per-key daily series
over the testdata events table is ~60% missing days — and every
downstream rolling window silently mis-computes over sparse series
(a 7-row window over sparse days is not a 7-day window).

The reference pipelines sidestep this by always aggregating to the
grain they load (SURVEY §2: its daily data-mart recomputes full days);
a Spark-native engine should offer the general operator: densify to
the key's own [min, max] bucket span and fill the holes, with the fill
policy explicit.

Plan shape at 100 TB (all stages key-partitioned, nothing driver-side):

1. one map-side-combined ``groupBy(keys, bucket)`` reduces raw rows to
   the series grain — the only shuffle that sees raw-row cardinality;
2. the per-key span is a tiny re-aggregation of (1)'s output, and the
   spine is ``explode(sequence(min, max))`` — generated distributed,
   never a driver-built calendar, sized by sum over keys of span days;
3. spine LEFT JOIN series on (keys, bucket) — both sides hash the same
   join key, so AQE plans a co-partitioned join;
4. forward fill is ``last(value, ignorenulls=True)`` over a per-key
   ordered window — one sort per key partition, the same shape as
   sessionize (operators/events.py); skewed keys are bounded by their
   span in days, not their raw row count, so the window side cannot
   inherit event-count skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_FREQ_STEP = {
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 1 week",
    "month": "interval 1 month",
}


def gap_fill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    freq: str = "day",
    agg: str = "sum",
    fill: str = "ffill",
    bucket_col: str = "bucket",
    count_col: str = "n_rows",
) -> DataFrame:
    """Aggregate ``value_cols`` to the (key, ``freq``-bucket) grain,
    densify each key to its full [min, max] bucket span, and fill the
    introduced holes.

    Returns one row per (key, bucket in span) with: the aggregated
    ``value_cols`` (hole rows filled per ``fill``), ``count_col`` (raw
    rows in the bucket — 0 for holes, so the caller can always tell
    filled from observed), and the spine is CONTIGUOUS per key at the
    chosen frequency.

    ``agg``: ``'sum'`` | ``'min'`` | ``'max'`` | ``'avg'`` — how raw
    rows reduce to the series grain. ``fill``: ``'ffill'`` carries the
    key's last observed value forward (holes before the first
    observation cannot exist — the spine starts at the key's min);
    ``'zero'`` fills 0 (the right policy for additive measures like
    revenue/counts); ``'null'`` leaves holes NULL (for callers doing
    interpolation downstream). NULL timestamps are dropped (no
    position on a time axis); NULL keys are kept as their own series
    (a null-keyed segment is still a segment).

    Buckets are computed by ``date_trunc`` in the SESSION time zone
    (build_spark pins UTC) and carried as timestamps so hour/week/month
    frequencies all use one code path.
    """
    if not key_cols:
        raise ValueError("gap_fill: key_cols must be non-empty")
    if not value_cols:
        raise ValueError("gap_fill: value_cols must be non-empty")
    if freq not in _FREQ_STEP:
        raise ValueError(
            f"gap_fill: freq={freq!r}; expected one of {sorted(_FREQ_STEP)}"
        )
    if fill not in ("ffill", "zero", "null"):
        raise ValueError(
            f"gap_fill: fill={fill!r}; expected 'ffill', 'zero' or 'null'"
        )
    agg_fns = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg}
    if agg not in agg_fns:
        raise ValueError(
            f"gap_fill: agg={agg!r}; expected one of {sorted(agg_fns)}"
        )
    clash = (set(key_cols) | set(value_cols)) & {bucket_col, count_col}
    if clash:
        raise ValueError(
            f"gap_fill: bucket_col/count_col collide with key/value "
            f"columns: {sorted(clash)} — rename via bucket_col=/count_col="
        )
    if bucket_col == count_col:
        raise ValueError(
            f"gap_fill: bucket_col and count_col are both {bucket_col!r}"
        )
    fn = agg_fns[agg]
    bucket = F.date_trunc(freq, F.col(ts_col)).alias(bucket_col)
    series = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(*key_cols, bucket)
        .agg(
            F.count("*").alias(count_col),
            *[fn(v).alias(v) for v in value_cols],
        )
    )
    span = series.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("_mn"), F.max(bucket_col).alias("_mx")
    )
    spine = span.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.expr(_FREQ_STEP[freq]))
        ).alias(bucket_col),
    )
    # Null-safe key equality: a NULL-keyed segment is a real series and
    # must find its own aggregated rows (plain `=` would drop them all
    # to holes). The bucket itself is never NULL (NULL ts filtered).
    # Explicit aliases because the spine derives FROM the series — the
    # unaliased self-join would hit ambiguous-attribute resolution.
    sp, se = spine.alias("_gf_sp"), series.alias("_gf_se")
    cond = [
        F.col(f"_gf_sp.{c}").eqNullSafe(F.col(f"_gf_se.{c}")) for c in key_cols
    ] + [F.col(f"_gf_sp.{bucket_col}") == F.col(f"_gf_se.{bucket_col}")]
    joined = sp.join(se, cond, "left").select(
        *[F.col(f"_gf_sp.{c}").alias(c) for c in key_cols],
        F.col(f"_gf_sp.{bucket_col}").alias(bucket_col),
        F.coalesce(F.col(f"_gf_se.{count_col}"), F.lit(0).cast("long")).alias(
            count_col
        ),
        *[F.col(f"_gf_se.{v}").alias(v) for v in value_cols],
    )
    if fill == "null":
        return joined
    if fill == "zero":
        filled = [
            F.coalesce(F.col(v), F.lit(0).cast(joined.schema[v].dataType)).alias(v)
            for v in value_cols
        ]
    else:  # ffill
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = [
            F.coalesce(
                F.col(v), F.last(F.col(v), ignorenulls=True).over(w)
            ).alias(v)
            for v in value_cols
        ]
    keep = [c for c in joined.columns if c not in value_cols]
    return joined.select(*keep, *filled)


def rolling_features(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    windows: list[int] = (7, 28),
    stats: tuple[str, ...] = ("avg", "sum"),
) -> DataFrame:
    """Trailing rolling-window features per key — the feature-generation
    step gap_fill exists to make CORRECT: over a contiguous spine, a
    ``w``-ROW trailing window IS a ``w``-bucket time window, so
    "7-day average" means seven calendar days, not "the key's last 7
    sparse observations" (which silently stretches over months for
    quiet keys). Compose: ``rolling_features(gap_fill(...), ...)``.

    Adds one column per (stat, window): ``{value}_{stat}_{w}``, e.g.
    ``value_avg_7``. Windows are trailing and INCLUSIVE of the current
    row (``ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW``); the first
    w-1 rows of each key aggregate over their partial prefix (the
    standard min_periods=1 semantics — a NULL ramp-in would poison
    downstream consumers that cannot distinguish "no data" from
    "window warming up"; ``n_rows``/hole flags from gap_fill carry the
    provenance).

    Stats: ``avg`` ``sum`` ``min`` ``max`` ``stddev`` (sample).
    All windows and stats share ONE Window spec per frame width, and
    every frame shares the same partition/sort — Catalyst plans a
    single shuffle + one sort per key partition, then evaluates the
    frames in the same pass. At 100 TB the cost profile is exactly
    sessionize's: one key-partitioned sort, skew bounded by the spine
    span (days), never by raw event counts.
    """
    if not key_cols:
        raise ValueError("rolling_features: key_cols must be non-empty")
    fns = {
        "avg": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "stddev": F.stddev_samp,
    }
    bad = [s for s in stats if s not in fns]
    if bad:
        raise ValueError(
            f"rolling_features: unknown stats {bad}; expected {sorted(fns)}"
        )
    if any(w < 1 for w in windows):
        raise ValueError(f"rolling_features: windows must be >= 1, got {windows}")
    if len(set(windows)) != len(list(windows)):
        raise ValueError(
            f"rolling_features: duplicate window widths {list(windows)} "
            "would emit duplicate column names"
        )
    out = df
    cols = list(df.columns)
    for w in windows:
        frame = (
            Window.partitionBy(*key_cols)
            .orderBy(order_col)
            .rowsBetween(-(w - 1), Window.currentRow)
        )
        for s in stats:
            cols.append(
                fns[s](F.col(value_col)).over(frame).alias(f"{value_col}_{s}_{w}")
            )
    return out.select(*cols)
