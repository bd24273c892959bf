"""Keyed upsert (MERGE) and key-based dedup — SURVEY.md §2 S11/A8.

The reference upserts row-by-row with T-SQL MERGE on the PK
(run_historical_backfill.py:86-183): matched rows get all non-PK
columns updated + etl_updated_at refreshed; unmatched rows insert.
Spark-first restatement: last-writer-wins dedup over the union, ranked
by a deterministic recency tiebreaker — one shuffle on the PK, skew
handled by AQE, no per-row driver round-trips. At 100 TB the PK shuffle
is the unavoidable cost of an upsert; everything else stays map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: list[str],
    order_col: str = "etl_updated_at",
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Keep the most recent row per key (window-rank dedup).

    Deterministic even with equal timestamps: ties break on
    ``tiebreakers`` (default: etl_batch_id then all columns' natural
    order is NOT used — caller supplies stable columns). This is the
    engine's MERGE primitive and also the streaming late-data dedup.
    """
    order_exprs = [F.col(order_col).desc_nulls_last()]
    for t in tiebreakers or ["etl_batch_id"]:
        if t in df.columns:
            order_exprs.append(F.col(t).desc_nulls_last())
    w = Window.partitionBy(*keys).orderBy(*order_exprs)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    existing: DataFrame,
    incoming: DataFrame,
    keys: list[str],
    order_col: str = "etl_updated_at",
) -> DataFrame:
    """MERGE semantics: incoming wins on key match, else insert.

    Equivalent to the reference's per-row ``MERGE ... WHEN MATCHED THEN
    UPDATE ... WHEN NOT MATCHED THEN INSERT``
    (run_historical_backfill.py:152-183). Implemented as
    union + last-writer-wins; ``_merge_rank`` guarantees incoming beats
    existing even when order_col values tie (the reference
    unconditionally overwrites matched rows with incoming values).
    """
    cols = existing.columns
    tagged = incoming.select(*cols).withColumn("_merge_rank", F.lit(1)).unionByName(
        existing.select(*cols).withColumn("_merge_rank", F.lit(0))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("_merge_rank").desc(), F.col(order_col).desc_nulls_last()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_merge_rank")
    )


def _renamed_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Project keys under unambiguous ``__r_`` names. When both join
    sides share lineage (e.g. two filters of the same table), plain
    ``left[k] == right[k]`` can resolve both references to the SAME
    column (Spark's 'trivially true equals predicate' trap) and turn
    the anti-join into a no-op; distinct names make resolution
    unambiguous by construction."""
    out = df.select(*keys).dropDuplicates(keys)
    for k in keys:
        out = out.withColumnRenamed(k, f"__r_{k}")
    return out


def _null_safe_key_cond(
    left, right, keys: list[str], left_prefix: str = "", right_prefix: str = "__r_"
):
    """NULL-safe key equality (<=>) against prefix-renamed keys —
    composite staging PKs can carry NULL components (e.g. item_sku_id on
    itemless orders); a plain equi-join would never match them and
    duplicates would slip through the anti-join. SQL Server PKs reject
    NULLs outright; null-safe match is the faithful dedup semantics.
    Prefixes keep the join condition unambiguous when both sides share
    lineage (see _renamed_keys); snapshot_diff passes its own pair."""
    cond = None
    for k in keys:
        c = left[f"{left_prefix}{k}"].eqNullSafe(right[f"{right_prefix}{k}"])
        cond = c if cond is None else cond & c
    return cond


def merge_stats(existing: DataFrame, incoming: DataFrame, keys: list[str]) -> DataFrame:
    """Insert-vs-update tally (A8) — the reference counts MERGE
    ``OUTPUT $action`` rows (run_historical_backfill.py:125-135).
    Spark: semi/anti join counts, one pass each, broadcast when small.
    """
    inc_keys = incoming.select(*keys).dropDuplicates(keys)
    old_keys = _renamed_keys(existing, keys)
    cond = _null_safe_key_cond(inc_keys, old_keys, keys)
    updated = inc_keys.join(old_keys, cond, "left_semi")
    inserted = inc_keys.join(old_keys, cond, "left_anti")
    return updated.agg(F.count("*").alias("updated")).crossJoin(
        inserted.agg(F.count("*").alias("inserted"))
    )


def append_dedup(
    existing: DataFrame, incoming: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental append with PK-duplicate rejection.

    The reference 'relies on database constraints to reject duplicates'
    on re-ingest (tiktok_shop_staging_loader.py:144-149); the honest
    Spark realization is a left-anti join against existing keys before
    the append (SURVEY §2.5). NULL-safe equality so NULL key components
    dedup too. Returns only the genuinely-new rows.
    """
    old_keys = _renamed_keys(existing, keys)
    return incoming.join(old_keys, _null_safe_key_cond(incoming, old_keys, keys), "left_anti")


def scd2_history(
    df: DataFrame,
    keys: list[str],
    tracked: list[str],
    order_col: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from change/
    snapshot rows: collapse runs of identical tracked values per key,
    then derive validity intervals.

    The reference's MERGE keeps only the latest row per PK (SCD1,
    run_historical_backfill.py:152-183); this is the warehouse-standard
    SCD2 extension — every attribute CHANGE becomes a versioned row
    with ``effective_from`` (the change's order_col), ``effective_to``
    (the next change's, NULL while current) and ``is_current``.

    Plan shape: one shuffle on ``keys``; the change-detection lag
    window and the interval lead window share the same partitioning, so
    Spark plans a single Exchange with two Sort+Window nodes on top —
    at 100 TB the cost is one key shuffle, same as ``latest_by_key``.
    Change detection is null-safe (NULL -> value counts as a change,
    NULL == NULL does not). Ordering ties on ``order_col`` break on
    ``tiebreakers`` so the history is deterministic; rows that tie on
    the full ordering produce zero-length intervals rather than
    nondeterminism.
    """
    ties = [t for t in (tiebreakers or []) if t in df.columns]
    order_exprs = [F.col(order_col).asc_nulls_first()] + [F.col(t).asc() for t in ties]
    w = Window.partitionBy(*keys).orderBy(*order_exprs)
    changed = F.row_number().over(w) == 1
    for t in tracked:
        changed = changed | ~F.col(t).eqNullSafe(F.lag(t).over(w))
    carried = [t for t in ties if t not in keys and t not in tracked and t != order_col]
    changes = (
        df.withColumn("_chg", changed)
        .filter(F.col("_chg"))
        .select(*keys, *tracked, F.col(order_col).alias("effective_from"), *carried)
    )
    w2 = Window.partitionBy(*keys).orderBy(
        F.col("effective_from").asc_nulls_first(),
        *[F.col(t).asc() for t in ties if t in tracked or t in carried],
    )
    return changes.select(
        *keys,
        *tracked,
        "effective_from",
        F.lead("effective_from").over(w2).alias("effective_to"),
        F.lead("effective_from").over(w2).isNull().alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """CDC-style diff of two table versions: per key, was the row
    ``added``, ``removed``, or ``changed`` between snapshots — the
    audit twin of ``merge_upsert`` (what DID that merge do?) and the
    building block for change-data-feed exports from plain parquet.

    ``compare_cols`` defaults to the non-key columns the two frames
    share. Comparison is column-wise null-safe (NULL vs value =
    changed, NULL vs NULL = equal) and stays JVM-side — no row hashing,
    so no hash-collision false-negatives and the oracle can mirror it
    with IS DISTINCT FROM.

    Plan shape: ONE full-outer sort-merge join on the key (null-safe
    equality; presence flags on each side, the standard outer-join
    presence trick, because key columns themselves may be NULL).
    At 100 TB that single key shuffle is the floor for any diff; with
    both snapshots bucketed by key (``sources/io.write_bucketed``) it
    drops to a zero-shuffle zip. Output: key columns + ``change_type``.
    """
    compare = (
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c in set(new.columns) and c not in keys]
    )
    o = old.select(
        *[F.col(k).alias(f"__o_{k}") for k in keys],
        *[F.col(c).alias(f"__oc_{c}") for c in compare],
        F.lit(1).alias("__o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"__n_{k}") for k in keys],
        *[F.col(c).alias(f"__nc_{c}") for c in compare],
        F.lit(1).alias("__n_present"),
    )
    cond = _null_safe_key_cond(o, n, keys, left_prefix="__o_", right_prefix="__n_")
    joined = o.join(n, cond, "full_outer")
    differs = F.lit(False)
    for c in compare:
        differs = differs | ~F.col(f"__oc_{c}").eqNullSafe(F.col(f"__nc_{c}"))
    change = (
        F.when(F.col("__o_present").isNull(), F.lit("added"))
        .when(F.col("__n_present").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *[F.coalesce(F.col(f"__n_{k}"), F.col(f"__o_{k}")).alias(k) for k in keys],
        change.alias("change_type"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def merge_aggregate(
    existing_agg: DataFrame,
    new_batch: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental aggregate maintenance: fold a new batch into a
    stored aggregate table WITHOUT recomputing history — the scale
    answer to the reference's per-cycle full data-mart rebuild
    (sql/staging/create_future_platforms_schemas.sql:179-201 recomputes
    daily_sales from scratch every 10-minute cycle).

    ``existing_agg`` holds (keys, sum_cols..., count_col) — the
    decomposable state; ``new_batch`` is RAW rows. The batch is
    aggregated (map-side partial combine over only the new data), then
    unioned with the stored state and re-summed per key: cost per cycle
    is O(batch) + a shuffle of (existing groups ∩ touched ∪ new) key
    rows, never O(history). Decomposable aggregates only (sum/count
    here; min/max fold the same way; avg = sum/count at read time —
    the standard incremental-view-maintenance restriction).
    """
    batch_agg = new_batch.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count("*").cast("long").alias(count_col),
    )
    cols = keys + sum_cols + [count_col]
    return (
        existing_agg.select(*cols)
        .unionByName(batch_agg.select(*cols))
        .groupBy(*keys)
        .agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.sum(count_col).cast("long").alias(count_col),
        )
    )


def merge_distinct_sketch(
    existing_sketches: DataFrame,
    new_batch: DataFrame,
    keys: list[str],
    distinct_col: str,
    sketch_col: str = "hll_sketch",
    lg_k: int = 12,
) -> DataFrame:
    """Incremental COUNT DISTINCT maintenance via mergeable HLL
    sketches (Datasketches, built into Spark) — the companion to
    :func:`merge_aggregate` for the one aggregate that is NOT
    decomposable as a plain sum.

    ``existing_sketches`` holds (keys, sketch_col binary) state; the
    new batch's raw rows are sketched per key (map-side partial
    aggregation — sketches merge, so the shuffle carries one ~2^lg_k
    byte sketch per key per task, never the distinct values), then
    unioned into the stored state with ``hll_union_agg``. Per cycle the
    cost is O(batch) + a key shuffle of sketch bytes; estimates come
    out via :func:`distinct_estimate` at read time (~1-2% error at the
    default lg_k=12). This is how a 100 TB mart keeps 'distinct
    customers per day' fresh without ever rescanning history —
    re-aggregating exact COUNT(DISTINCT) per cycle is O(history).
    """
    batch = new_batch.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k)).alias(sketch_col)
    )
    cols = keys + [sketch_col]
    return (
        existing_sketches.select(*cols)
        .unionByName(batch.select(*cols))
        .groupBy(*keys)
        .agg(F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias(sketch_col))
    )


def distinct_estimate(
    sketches: DataFrame, sketch_col: str = "hll_sketch", out_col: str = "n_distinct_est"
) -> DataFrame:
    """Read-time estimate column from stored HLL sketch state."""
    return sketches.withColumn(
        out_col, F.hll_sketch_estimate(F.col(sketch_col)).cast("long")
    ).drop(sketch_col)


def scd2_lookup(history: DataFrame, at, order_col: str = "effective_from") -> DataFrame:
    """Point-in-time read over an SCD2 history (:func:`scd2_history`
    output): the version of each key valid AT the given instant —
    ``effective_from <= at < effective_to`` (open-ended current rows
    match any later instant). Keys with no version yet at ``at`` simply
    produce no row.

    A narrow filter over the history — with the history partitioned or
    z-ordered on ``effective_from`` the predicate prunes files, so a
    point-in-time dimension read at 100 TB touches only the spans
    covering ``at``, never the full history.
    """
    ts = F.lit(at)
    return history.filter(
        (F.col(order_col) <= ts)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > ts))
    )
