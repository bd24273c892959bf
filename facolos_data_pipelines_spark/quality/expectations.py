"""Declarative data-quality expectations, compiled into ONE aggregation
pass.

The reference embeds its quality rules as ad-hoc SQL scattered through
loaders and DAG tasks (required-column / null-PK / negative-quantity
checks, `tiktok_shop_staging_loader.py:205-250`; count/freshness gates,
`misa_crm_loader.py:263-323`). This module generalizes that surface
into a rule LIST evaluated in a single `df.agg(...)` over a single
table scan — the cheapest possible shape at 100 TB: every rule is a
conditional-sum (map-side partial) aggregate; only `unique` rules add
a distinct aggregate (an Expand of the scan per distinct rule — the
documented cost, same as column_profile's exact distincts).

Rules (dicts, so configs serialize to JSON like the reference's
settings):

- ``{"type": "not_null", "column": c}`` — no NULLs in c
- ``{"type": "unique", "columns": [c, ...]}`` — no duplicate key
  tuples (rows with any NULL component are exempt, SQL-constraint
  style, and reported via not_null rules instead)
- ``{"type": "in_range", "column": c, "min": x, "max": y}`` — values
  (NULLs exempt) within [x, y]; either bound optional
- ``{"type": "accepted_values", "column": c, "values": [...]}`` —
  values (NULLs exempt) drawn from the set
- ``{"type": "matches_regex", "column": c, "pattern": p}`` — values
  (NULLs exempt) fully handled by ``rlike``
- ``{"type": "expression", "expr": sql, "name": n}`` — arbitrary
  boolean SQL; a row violating (NOT expr) counts against it. NULL
  results count as violations (unknown is not a pass).

Every rule emits (rule, column, n_violations, passed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_VIOLATION_BUILDERS = ("not_null", "unique", "in_range", "accepted_values",
                      "matches_regex", "expression")


def _violation_count(rule: dict) -> tuple[str, str, Column]:
    """(rule_label, column_label, violation-count aggregate) for one rule."""
    t = rule.get("type")
    if t == "not_null":
        c = rule["column"]
        return t, c, F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
    if t == "unique":
        cols = rule["columns"]
        complete = None
        for c in cols:
            p = F.col(c).isNotNull()
            complete = p if complete is None else complete & p
        n_complete = F.sum(F.when(complete, 1).otherwise(0))
        n_distinct = F.countDistinct(*[F.col(c) for c in cols])
        return t, ",".join(cols), n_complete - n_distinct
    if t == "in_range":
        c = rule["column"]
        lo, hi = rule.get("min"), rule.get("max")
        if lo is None and hi is None:
            raise ValueError(f"in_range rule on {c!r} needs min and/or max")
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (F.col(c) < F.lit(lo))
        if hi is not None:
            bad = bad | (F.col(c) > F.lit(hi))
        return t, c, F.sum(F.when(F.col(c).isNotNull() & bad, 1).otherwise(0))
    if t == "accepted_values":
        c = rule["column"]
        vals = rule["values"]
        if not vals:
            raise ValueError(f"accepted_values rule on {c!r} needs a non-empty set")
        bad = ~F.col(c).isin(*vals)
        return t, c, F.sum(F.when(F.col(c).isNotNull() & bad, 1).otherwise(0))
    if t == "matches_regex":
        c = rule["column"]
        ok = F.col(c).rlike(rule["pattern"])
        return t, c, F.sum(F.when(F.col(c).isNotNull() & ~ok, 1).otherwise(0))
    if t == "expression":
        expr = rule["expr"]
        name = rule.get("name", expr)
        # NULL (unknown) verdicts are violations: coalesce(expr, false)
        ok = F.coalesce(F.expr(expr), F.lit(False))
        return "expression", name, F.sum(F.when(~ok, 1).otherwise(0))
    raise ValueError(
        f"unknown expectation type {t!r}; expected one of {_VIOLATION_BUILDERS}"
    )


def expect(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate every rule in ONE aggregation over ONE scan.

    Returns one row per rule: (rule, column, n_violations, passed) in
    the order given. The single result row is reshaped via an
    array-of-structs explode (no joins, no extra scans — the
    column_profile pattern)."""
    if not rules:
        raise ValueError("expect: rules must be non-empty")
    labeled = [_violation_count(r) for r in rules]
    aggs = [
        cnt.cast("long").alias(f"__v_{i}") for i, (_, _, cnt) in enumerate(labeled)
    ]
    one_row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(t).alias("rule"),
            F.lit(c).alias("column"),
            # an aggregate over zero rows yields NULL — zero violations
            F.coalesce(F.col(f"__v_{i}"), F.lit(0).cast("long")).alias(
                "n_violations"
            ),
            (F.coalesce(F.col(f"__v_{i}"), F.lit(0)) == 0).alias("passed"),
        )
        for i, (t, c, _) in enumerate(labeled)
    ]
    return one_row.select(F.explode(F.array(*structs)).alias("_e")).select("_e.*")


def expectations_gate(report: DataFrame) -> DataFrame:
    """Fold an expect() report into the reference-style one-row gate:
    (n_rules, n_failed, passed) — the >=5-of-6-tables A6 rubric shape
    applied to rules."""
    return report.agg(
        F.count("*").cast("long").alias("n_rules"),
        F.sum(F.when(~F.col("passed"), 1).otherwise(0)).cast("long").alias("n_failed"),
        (F.sum(F.when(~F.col("passed"), 1).otherwise(0)) == 0).alias("passed"),
    )
