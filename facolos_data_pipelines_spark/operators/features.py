"""Feature-engineering primitives: outlier clipping and categorical
encoding.

The tail of a training-data pipeline turns curated rows into model
inputs; the two operations needed constantly and wanted engine-side
(so the transformation is reproducible and shippable with the data)
are robust numeric clipping (winsorization) and categorical encoding
(count/frequency and smoothed-target encoding — the leak-resistant
alternative to one-hot for high-cardinality categoricals).

Both are two-scan shapes: one aggregate pass reduces the corpus to a
handful of statistics (percentile cut points; per-category counts and
means), which broadcast back into a pure-expression second pass —
nothing driver-side scales with the data, and the encoded output never
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    exact: bool = True,
    suffix: str = "_w",
) -> DataFrame:
    """Clip each column to its [``lower``, ``upper``] quantile band —
    the standard defense against fat-tailed features (a single
    mis-parsed 1e12 price otherwise dominates any scaled feature or
    z-gate downstream). Adds ``{col}{suffix}`` clipped columns;
    originals are kept so provenance survives.

    ``exact=True`` computes true linear-interpolated percentiles
    (``percentile`` — the same definition DuckDB's ``quantile_cont``
    uses, which is what makes the oracle twin exact). The exact
    percentile is a sort-based aggregate; at 100 TB flip
    ``exact=False`` for ``approx_percentile`` (t-digest sketch,
    map-side combinable, no global sort) — same two-scan shape, and
    the cut points land within the sketch's documented error. Same
    exact-by-default-but-document-the-scale-swap convention as
    quality.column_profile.

    The cut points reduce to ONE aggregate row (2 × |cols| doubles)
    broadcast into a pure ``least/greatest`` projection — clipping
    itself never shuffles. NULLs pass through NULL (no position in a
    distribution, nothing to clip to).
    """
    if not cols:
        raise ValueError("winsorize: cols must be non-empty")
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(
            f"winsorize: need 0 <= lower < upper <= 1, got ({lower}, {upper})"
        )
    fn = "percentile" if exact else "approx_percentile"
    cuts = df.agg(
        *[
            F.expr(f"{fn}(`{c}`, array({lower!r}, {upper!r}))").alias(f"_q_{c}")
            for c in cols
        ]
    ).first()
    out = df
    for c in cols:
        band = cuts[f"_q_{c}"]
        if band is None or band[0] is None:
            raise ValueError(
                f"winsorize: no non-null values in column {c!r} "
                "(empty frame or all-NULL column) — percentile cut "
                "points are undefined"
            )
        lo, hi = band
        # greatest/least SKIP nulls (NULL would clip to the lower cut);
        # the explicit guard keeps the NULL-passes-through contract
        clipped = F.least(
            F.greatest(F.col(c), F.lit(float(lo))), F.lit(float(hi))
        )
        out = out.withColumn(
            f"{c}{suffix}", F.when(F.col(c).isNotNull(), clipped)
        )
    return out


def frequency_encode(
    df: DataFrame,
    col: str,
    target_col: str | None = None,
    smoothing: float = 10.0,
    round_digits: int = 6,
) -> DataFrame:
    """Per-category encoding statistics for ``col``: frequency
    encoding always; smoothed-target encoding when ``target_col`` is
    given — the high-cardinality-categorical workhorse (one-hot at
    1M categories is a 1M-wide row; this is 3 doubles per category).

    Returns ONE ROW PER CATEGORY — (category, ``n``, ``freq``, and
    with a target: ``target_mean``, ``target_enc``) — i.e. the
    encoding TABLE, not the encoded rows: persisting the table is
    what makes train/serve consistent (re-deriving it on the serving
    set is the classic leak), and applying it is a broadcast join the
    caller composes.

    ``target_enc`` is the m-estimate shrink:
    ``(n_t * mean_cat + smoothing * mean_global) / (n_t + smoothing)``
    where ``n_t`` counts the category's NON-NULL targets — rare
    categories pull toward the global mean instead of memorizing their
    few target values. Weighting by observed targets (not raw rows)
    matters: a category of 100 rows with one labeled row must shrink
    like n=1, not n=100, or the shrinkage the operator exists for is
    defeated. A category with no observed targets encodes to the pure
    prior (``target_enc = mean_global``, ``target_mean`` NULL — the
    applied feature is never NULL). NULL categories are kept as a real
    category (in-band '__null__', same convention as
    quality.chi2_categorical); NULL targets are excluded from means
    but still counted in ``n``.

    One grouped aggregate (map-side combined, output = category
    cardinality) plus a 1-row global broadcast: the two-scan shape.
    """
    if smoothing < 0:
        raise ValueError(f"frequency_encode: smoothing must be >= 0, got {smoothing}")
    cat = F.coalesce(F.col(col).cast("string"), F.lit("__null__")).alias("category")
    aggs = [F.count("*").cast("long").alias("n")]
    if target_col is not None:
        # count() of the column itself = non-null targets — the real
        # evidence weight for the shrink
        aggs.append(F.count(target_col).cast("double").alias("_nt"))
        aggs.append(F.avg(target_col).alias("_mean"))
    per_cat = df.select(cat, *([F.col(target_col)] if target_col else [])).groupBy(
        "category"
    ).agg(*aggs)
    glob = df.agg(
        F.count("*").cast("double").alias("_total"),
        *([F.avg(target_col).alias("_gmean")] if target_col else []),
    )
    out = per_cat.crossJoin(F.broadcast(glob))
    cols = [
        F.col("category"),
        F.col("n"),
        F.round(F.col("n") / F.col("_total") + 1e-9, round_digits).alias("freq"),
    ]
    if target_col is not None:
        shrunk = (
            F.col("_nt") * F.coalesce(F.col("_mean"), F.lit(0.0))
            + smoothing * F.col("_gmean")
        ) / (F.col("_nt") + smoothing)
        if smoothing == 0:
            # no prior: all-NULL-target categories fall back to the
            # global mean instead of 0/0
            shrunk = F.when(F.col("_nt") > 0, shrunk).otherwise(F.col("_gmean"))
        cols += [
            F.round(F.col("_mean") + 1e-9, round_digits).alias("target_mean"),
            F.round(shrunk + 1e-9, round_digits).alias("target_enc"),
        ]
    return out.select(*cols).orderBy("category")


def quantile_bin(
    df: DataFrame,
    col: str,
    n_bins: int = 4,
    exact: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Equal-frequency (quantile) binning — the discretization
    workhorse that one-hot/GBDT feature pipelines and stratified
    samplers reach for: bin 1..``n_bins`` gets ~1/n of the non-null
    rows each, robust to any monotone transformation of the feature
    (unlike equal-width bins, which one fat tail collapses).

    Adds ``{col}_bin`` (or ``out_col``): 1 + the number of interior
    cut points strictly below the value; NULLs pass through NULL (no
    position in the distribution). Cut points are the
    k/n_bins-quantiles (k = 1..n_bins-1), linear-interpolated
    (``percentile`` — DuckDB's ``quantile_cont`` definition, the same
    parity contract as :func:`winsorize`), ROUNDED to 4 digits with
    the engine-parity nudge so the bin edges are bit-identical across
    engines and a knife-edge value can't land in different bins.

    ``exact=True`` is a sort-based aggregate; at 100 TB flip
    ``exact=False`` for ``approx_percentile`` (t-digest, map-side
    combinable, no global sort) — the boundaries land within the
    sketch's rank-error bound and binning itself is unchanged. Either
    way the cut points reduce to ONE aggregate row broadcast into a
    pure comparison-chain projection: the assignment pass never
    shuffles. Duplicate cut points (heavily discrete data) merge
    adjacent bins — fewer occupied bins, never a wrong assignment.
    """
    if n_bins < 2:
        raise ValueError("quantile_bin: n_bins must be >= 2")
    fn = "percentile" if exact else "approx_percentile"
    qs = ", ".join(repr(k / n_bins) for k in range(1, n_bins))
    cuts_row = df.agg(
        F.expr(
            f"transform({fn}(`{col}`, array({qs})), x -> round(x + 1e-8, 4))"
        ).alias("_cuts")
    ).first()
    cuts = cuts_row["_cuts"]
    if cuts is None or cuts[0] is None:
        raise ValueError(
            f"quantile_bin: no non-null values in column {col!r} — "
            "quantile cut points are undefined"
        )
    c = F.col(col)
    bin_expr = F.lit(1)
    for cut in cuts:
        bin_expr = bin_expr + (c > F.lit(float(cut))).cast("int")
    return df.withColumn(
        out_col or f"{col}_bin", F.when(c.isNotNull(), bin_expr)
    )
