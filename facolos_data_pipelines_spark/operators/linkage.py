"""Fuzzy record linkage: blocked approximate string matching.

The reference aligns records only by exact primary keys
(run_historical_backfill.py:204-210 PK registry); real-world source
reconciliation also needs *approximate* matching (typo'd names, dropped
characters, OCR noise). This module adds the standard scalable shape:
**block, then verify** — an equi-join on a cheap blocking key narrows
candidates, and the exact edit-distance test runs only inside blocks,
never all-pairs.

Scale design (100 TB): the only wide operation is one shuffle of
(block_key, row) on each side for the equi-join; `levenshtein` is a
built-in JVM expression (whole-stage codegen, no UDF). Blocking is
recall-lossy by construction — an edit at the blocked prefix escapes
its block (the classic multi-pass blocking tradeoff; run again with a
different `block_on` and union for higher recall). Skew: a hot prefix
(everyone named "Nguyen") concentrates one block — AQE skew-join
splitting covers moderate cases; pick a longer/more selective blocking
expression for pathological ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _block_key(col: Column, block_prefix: int) -> Column:
    return F.lower(F.substring(col, 1, block_prefix))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    max_distance: int = 2,
    block_prefix: int = 4,
    block_on: tuple[Column, Column] | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Candidate pairs whose edit distance is within ``max_distance``,
    blocked on a shared cheap key.

    ``max_block_size`` drops RIGHT-side blocks larger than the cap
    before the join — the same hot-bucket guard as the LSH family
    (everyone named "Nguyen" lands in one block and makes the join
    quadratic there). Capped blocks lose recall, loudly by contract:
    choose a more selective ``block_on`` instead when that matters.

    Default blocking key: lowercased first ``block_prefix`` characters
    of the match column (pass ``block_on=(left_expr, right_expr)`` to
    block on anything else — phonetic keys via ``F.soundex``, sorted
    token prefixes, …). Two strings whose edit distance is within
    ``max_distance`` necessarily differ in length by at most
    ``max_distance``; that length band is applied as a join predicate
    BEFORE the levenshtein test so the expensive O(len²) comparison
    runs on a strictly smaller candidate set.

    Returns all left columns + all right columns + ``_distance``
    (column-name overlap raises — alias the inputs first).
    """
    if max_distance < 0:
        raise ValueError("fuzzy_join: max_distance must be >= 0")
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"fuzzy_join: overlapping column names {sorted(overlap)}; "
            "alias/rename one side first"
        )
    internal = {"_bk", "_bk_r", "_distance", "_gsz"}
    clash = internal & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"fuzzy_join: input columns {sorted(clash)} collide with "
            "internal working columns; rename them first (e.g. a prior "
            "fuzzy_join pass's _distance — alias it before a second pass)"
        )
    if block_on is None:
        lkey, rkey = (
            _block_key(F.col(left_text), block_prefix),
            _block_key(F.col(right_text), block_prefix),
        )
    else:
        lkey, rkey = block_on
    l = left.withColumn("_bk", lkey)
    r = right.withColumn("_bk_r", rkey)
    if max_block_size is not None:
        if max_block_size < 1:
            raise ValueError("fuzzy_join: max_block_size must be >= 1")
        from .skew import drop_oversized_groups

        r = drop_oversized_groups(r, ["_bk_r"], max_block_size)
    dist = F.levenshtein(F.col(left_text), F.col(right_text))
    length_band = (
        F.abs(F.length(left_text) - F.length(right_text)) <= max_distance
    )
    out = (
        l.join(r, (F.col("_bk") == F.col("_bk_r")) & length_band)
        .withColumn("_distance", dist)
        .filter(F.col("_distance") <= max_distance)
        .drop("_bk", "_bk_r")
    )
    return out


def best_fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    max_distance: int = 2,
    block_prefix: int = 4,
    block_on: tuple[Column, Column] | None = None,
    max_block_size: int | None = None,
) -> DataFrame:
    """Top-1 linkage: each left row's single best candidate (lowest
    edit distance; ties broken by ascending right id for determinism).
    One extra window shuffle on the left id over the fuzzy_join
    candidates — candidates only, never the corpus. All blocking
    parameters (including the hot-block cap) pass through to
    :func:`fuzzy_join`."""
    pairs = fuzzy_join(
        left.select(left_id, left_text),
        right.select(right_id, right_text),
        left_text,
        right_text,
        max_distance,
        block_prefix,
        block_on,
        max_block_size,
    )
    w = Window.partitionBy(left_id).orderBy(
        F.col("_distance").asc(), F.col(right_id).asc()
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
