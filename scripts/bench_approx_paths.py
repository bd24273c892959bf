"""Measure the documented 100 TB approx/scale paths (SCALE.md §6c).

The oracle-certified bench queries pin the EXACT variants (so DuckDB
can hash-match them); the production defaults at scale are the approx
twins. This script times those twins directly — same protocol as the
scale curve: one isolated process per sf_dir, warm median-of-3 over a
noop write.

    python scripts/bench_approx_paths.py [sf_dir]

Prints one JSON line: {"sf_dir": ..., "timings": {op: sec, ...}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from facolos_data_pipelines_spark.operators.features import winsorize
    from facolos_data_pipelines_spark.quality.checks import column_profile
    from facolos_data_pipelines_spark.session import build_spark, load_tables

    spark = build_spark(app_name="bench-approx")
    tables = load_tables(spark, sf_dir)
    for df in tables.values():  # warm the file listings / codegen
        df.count()

    ops = {
        # winsorize_prices' documented scale path: t-digest cut points
        # instead of the sort-based exact percentile
        "winsorize_tdigest": lambda: winsorize(
            tables["lineitem"],
            ["l_extendedprice", "l_quantity"],
            exact=False,
        ),
        # column_profile's production default: HLL distinct counts
        # (exact percentiles) — the shape q_column_profile_approx pins
        "column_profile_default": lambda: column_profile(
            tables["orders"], ["o_orderkey", "o_totalprice", "o_orderstatus"]
        ),
        # fully-approx profile: HLL + Greenwald-Khanna percentiles —
        # zero sort-based aggregates anywhere
        "column_profile_full_approx": lambda: column_profile(
            tables["orders"],
            ["o_orderkey", "o_totalprice", "o_orderstatus"],
            approx_percentiles=True,
        ),
        # the exact twin, for the in-run ratio
        "column_profile_exact": lambda: column_profile(
            tables["orders"],
            ["o_orderkey", "o_totalprice", "o_orderstatus"],
            exact_distinct=True,
        ),
        "winsorize_exact": lambda: winsorize(
            tables["lineitem"],
            ["l_extendedprice", "l_quantity"],
            exact=True,
        ),
    }
    samples: dict[str, list[float]] = {k: [] for k in ops}
    for _ in range(3):
        for name, build in ops.items():
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            samples[name].append(time.time() - t0)
    out = {
        "sf_dir": sf_dir,
        "timings": {k: round(statistics.median(v), 3) for k, v in samples.items()},
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
