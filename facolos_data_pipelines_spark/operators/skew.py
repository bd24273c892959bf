"""Skew mitigation — salting for hot keys, bucketed layouts for
co-located joins.

AQE's skew-join splitting (on by default, session.py) handles moderate
skew at runtime; these helpers are for the pathological cases a
training-data pipeline actually hits — one boilerplate document hash
with 10^8 duplicates, one null-ish join key holding half the fact table
— where pre-salting beats runtime splitting because it also fixes the
*aggregation* stage, not just the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt on the group key.

    ``aggs`` maps output alias -> (source column, agg fn). Phase 1
    aggregates on (keys..., salt) — hot keys spread over
    ``salt_buckets`` reducers; phase 2 re-aggregates on keys alone.
    Only decomposable aggregates are supported: sum, count, min, max
    (count re-aggregates as sum). Map-side partial aggregation already
    gives this effect for most workloads; explicit salting matters when
    a single key's partials still overwhelm one reducer (e.g. count of
    one duplicated document hash across 10^6 input partitions).
    """
    phase2 = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for _, fn in aggs.values():
        if fn not in phase2:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    p1 = salted.groupBy(*keys, "_salt").agg(
        *[getattr(F, fn)(col).alias(alias) for alias, (col, fn) in aggs.items()]
    )
    return p1.groupBy(*keys).agg(
        *[
            getattr(F, phase2[fn])(alias).alias(alias)
            for alias, (_, fn) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew join by salting: the skewed side gets a random salt, the
    small side is replicated ``salt_buckets`` times with every salt
    value, and the join key becomes (on..., salt) — a hot key's rows
    land on ``salt_buckets`` different reducers instead of one.

    Use when the small side is too big to broadcast but the big side
    has hot keys; replication multiplies the small side's shuffle
    volume by ``salt_buckets``, so keep it modest.
    """
    left = skewed.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return left.join(right, [*on, "_salt"], how).drop("_salt")


def cap_group_size(
    df: DataFrame,
    keys: list[str],
    max_rows: int,
    order_col: str | None = None,
) -> DataFrame:
    """Bound the size of any group (e.g. an LSH bucket) to ``max_rows``.

    The standard guard before a bucket-local self-join: a boilerplate
    bucket with 10^6 members would otherwise produce 10^12 candidate
    pairs. Keeps the first ``max_rows`` per key by ``order_col`` (or
    arbitrary-but-deterministic order on the remaining columns).
    """
    from pyspark.sql import Window

    order = [F.col(order_col).asc()] if order_col else [F.col(c).asc() for c in df.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_rows)
        .drop("_rn")
    )


def drop_oversized_groups(
    df: DataFrame, keys: list[str], max_rows: int
) -> DataFrame:
    """Drop every group larger than ``max_rows`` ENTIRELY — the
    hot-bucket guard shared by the LSH blocking family and fuzzy_join
    (a viral-boilerplate bucket or an everyone-named-Nguyen block
    would make the bucket-local self-join quadratic). Distinct from
    :func:`cap_group_size`, which truncates groups but keeps them:
    dropping loses the whole block's recall loudly-by-contract, which
    is the right default for blocking keys (a truncated block would
    silently match SOME of the hot key's rows and look complete).
    One count aggregation + one key-local join."""
    sizes = df.groupBy(*keys).agg(F.count("*").alias("_gsz"))
    return (
        df.join(sizes, keys)
        .filter(F.col("_gsz") <= max_rows)
        .drop("_gsz")
    )


def zorder_key(
    cols: list[str | Column],
    bits: int = 16,
) -> Column:
    """Z-order (Morton) key: interleave the low ``bits`` bits of each
    input column into one long — the multi-dimensional clustering key
    behind Delta/Iceberg OPTIMIZE ZORDER, built from plain bitwise
    expressions (whole-stage codegen, no UDF).

    Sorting a table by this key co-locates rows that are close in ALL
    dimensions at once, so parquet row-group min/max stats prune scans
    for predicates on ANY prefix of the dimensions — the data-skipping
    property a single-column sort only gives its own column. Inputs
    must already be non-negative integers in [0, 2^bits); map/bucket
    them first (e.g. days-since-epoch, hashed-mod ids) — out-of-range
    values are a RUN-TIME ERROR (raise_error), never silent key
    corruption: an arithmetic shift on a negative would set every bit
    and a value >= 2^bits would truncate, colliding distant rows.
    ``bits * len(cols)`` must fit a long (<= 62). NULLs map to 0
    (cluster together at the low corner) — filter or fill first if
    that is not wanted.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key: need at least one column")
    if bits * n > 62:
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits = {bits * n} interleaved "
            "bits > 62; lower bits or drop dimensions"
        )
    out = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        col = F.coalesce(col, F.lit(0).cast("long"))
        col = F.when(
            (col >= 0) & (col < (1 << bits)), col
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"zorder_key: dimension {ci} value "),
                    col.cast("string"),
                    F.lit(f" outside [0, 2^{bits}); bucket/bin inputs first"),
                )
            ).cast("long")
        )
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(col, b).bitwiseAND(F.lit(1).cast("long")),
                    b * n + ci,
                )
            )
    return out


def key_skew_profile(
    df: DataFrame,
    key_cols: list[str] | str,
    top_n: int = 10,
) -> DataFrame:
    """Shuffle-key skew diagnosis: the ``top_n`` heaviest key groups
    with their share of the table and their skew factor (group size /
    mean group size) — the number that predicts whether a groupBy/join
    on this key will straggle at scale (a factor of 100 means the hot
    partition runs ~100x longer than the average unless AQE splits it
    or the plan salts).

    Two aggregation passes over key-width rows only: per-key counts
    (one shuffle on the key, map-side partial), then the global
    row/group totals folded back in-plan as a 1-row broadcast (no
    driver collect). Top-n selection is TakeOrderedAndProject — a
    per-partition n-heap, never a full sort. Use before choosing a
    partitioning/bucketing key; pair with salted_groupby_agg /
    salted_join when the factor is pathological.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_skew_profile: key_cols must be non-empty")
    if top_n < 1:
        raise ValueError("key_skew_profile: top_n must be >= 1")
    per_key = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count("*").cast("long").alias("n_rows")
    )
    totals = per_key.agg(
        F.sum("n_rows").cast("long").alias("_total_rows"),
        F.count("*").cast("long").alias("_n_groups"),
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total_rows") + 1e-9, 6).alias(
                "row_share"
            ),
            # divide first: long*long would overflow before the divide
            # on trillion-row tables; both engines mirror this order
            F.round(
                F.col("n_rows") / F.col("_total_rows") * F.col("_n_groups") + 1e-9, 4
            ).alias("skew_factor"),
        )
        .orderBy(F.col("n_rows").desc(), *[F.col(k).asc() for k in keys])
        .limit(top_n)
    )


def frequent_items(
    df: DataFrame,
    col: str,
    min_share: float = 0.01,
    counters_factor: int = 2,
) -> DataFrame:
    """EXACT heavy hitters without a full-cardinality shuffle: every
    value of ``col`` whose row share is >= ``min_share``, with its
    exact count and share.

    :func:`key_skew_profile` (and text.top_ngrams) shuffle one row per
    DISTINCT key — correct, but at 100 TB a column like "every 5-gram
    of the crawl" has more distinct keys than rows fit in any shuffle.
    This is the classic two-pass sketch-then-verify alternative:

    1. CANDIDATES — each partition folds its rows through a
       Misra-Gries summary (``k = counters_factor * ceil(1/min_share)``
       counters, batch-decrement variant: merge a batch's value_counts,
       then subtract the (k+1)-th largest count from all and drop the
       non-positive). MG guarantees any value with partition-local
       share >= 1/(k+1) survives; a value with GLOBAL share >=
       min_share has local share >= min_share in at least one
       partition (weighted pigeonhole), so the union of per-partition
       candidates is a guaranteed SUPERSET of the true heavy hitters
       — never a miss. At most k * num_partitions candidate rows ever
       shuffle.
    2. VERIFY — exact counts for candidates only: the candidate set
       broadcasts into a semi-join filter, one groupBy over the
       surviving rows (map-side partial), and the global total folds
       back as a 1-row broadcast. False candidates die on the exact
       ``count >= min_share * total`` test; survivors carry EXACT
       counts, so the output equals the full-shuffle GROUP BY /
       HAVING answer while shuffling only candidate keys.

    NULLs are excluded (a null "value" is a data-quality finding, not
    a frequent item — count them with quality.table_stats).
    """
    import math

    import pandas as pd

    if not (0 < min_share <= 1):
        raise ValueError("frequent_items: min_share must be in (0, 1]")
    k = counters_factor * math.ceil(1.0 / min_share)
    val_type = dict(df.dtypes)[col]

    def mg_partition(batches):
        counters: "pd.Series | None" = None
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            if vc.empty:
                continue
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        if counters is not None and len(counters):
            yield pd.DataFrame({col: counters.index})

    candidates = (
        df.select(col)
        .mapInPandas(mg_partition, f"{col} {val_type}")
        .dropDuplicates()
    )
    total = df.select(col).filter(F.col(col).isNotNull()).agg(
        F.count("*").cast("long").alias("_total")
    )
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").cast("long").alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_rows") >= F.lit(float(min_share)) * F.col("_total"))
        .select(
            col,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total") + 1e-9, 6).alias("row_share"),
        )
    )
