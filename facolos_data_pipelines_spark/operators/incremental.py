"""Incremental-load predicates & retention — SURVEY.md §2.3 F1–F6, S12.

All plain Catalyst filters: they push down to the parquet scan
(PushedFilters) and, on a date-partitioned staging layout, prune
partitions — which is what makes the 10-minute incremental cycle cheap
at 100 TB (read only the lookback window, not the table).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lookback_filter(
    df: DataFrame,
    ts_col: str,
    cutoff: dt.datetime | str,
    keep_nulls: bool = True,
) -> DataFrame:
    """F1 — modified-since filter with inclusive-on-error semantics.

    The reference keeps records whose modified_date is missing or
    unparseable (misa_crm_extractor.py:266-284) so an API hiccup never
    silently drops data. ``keep_nulls`` reproduces that OR-null arm;
    parse failure -> NULL via non-ANSI to_timestamp, same as the
    reference's try/except-keep.
    """
    ts = F.to_timestamp(F.col(ts_col))
    pred: Column = ts >= F.lit(cutoff).cast("timestamp")
    if keep_nulls:
        pred = ts.isNull() | pred
    return df.filter(pred)


def time_range_filter(df: DataFrame, col: str, start, end) -> DataFrame:
    """F2 — source time-range predicate (create_time_from/to API params,
    tiktok_shop_extractor.py:67-68). Pushdown-eligible."""
    return df.filter(F.col(col).between(F.lit(start), F.lit(end)))


def status_filter(df: DataFrame, col: str, status: str | None) -> DataFrame:
    """F3 — optional status narrowing (tiktok_shop_extractor.py:77-78)."""
    return df if status is None else df.filter(F.col(col) == status)


def recency_filter(df: DataFrame, ts_col: str, days: int = 1) -> DataFrame:
    """F4 — last-N-days window (misa_crm_loader.py:357-362's
    ``DATEADD(day,-1,GETDATE())``)."""
    cutoff = F.current_timestamp() - F.expr(f"INTERVAL {days} DAYS")
    return df.filter(F.col(ts_col) >= cutoff)


def not_null_filter(df: DataFrame, col: str) -> DataFrame:
    """F5 — item_id not-null (misa_crm_transformer.py:429)."""
    return df.filter(F.col(col).isNotNull())


def negative_count(df: DataFrame, col: str) -> DataFrame:
    """F6 — negative-value sanity tally
    (tiktok_shop_staging_loader.py:239-243)."""
    # coalesce: an EMPTY table has zero negative rows, not NULL — a
    # NULL here makes a `negative_rows == 0` gate silently non-true
    return df.agg(
        F.coalesce(F.sum(F.when(F.col(col) < 0, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("negative_rows")
    )


def retention_filter(
    df: DataFrame, ts_col: str, retention_days: int, now: dt.datetime | None = None
) -> DataFrame:
    """S12 — retention delete as keep-filter: rows younger than the
    cutoff survive the overwrite (misa_crm_loader.py:384-427's
    ``DELETE ... WHERE etl_created_at < DATEADD(day,-N,GETDATE())``)."""
    if now is None:
        cutoff = F.current_timestamp() - F.expr(f"INTERVAL {retention_days} DAYS")
    else:
        cutoff = F.lit(now - dt.timedelta(days=retention_days)).cast("timestamp")
    return df.filter(F.col(ts_col) >= cutoff)
