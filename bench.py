"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Runs a representative subset of ``__spark_entry__.queries()`` (joins,
aggs, windows, dedup, similarity, text) on local[$SPARK_GRAFT_CPUS] and
prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with a noop write (full execution, no
driver-side collect of large results — the cluster-realistic cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "daily_sales_summary",
    "flatten_explode",
    "derived_columns",
    "dim_enrichment_join",
    "latest_by_key",
    "window_rank",
    "tumbling_window",
    "lookback_filter",
    "topk_orders",
    "exact_dedup",
    "minhash_dedup",
    "simhash_dedup",
    "similarity_topk",
    "token_counts",
    "quality_scores",
    "pricing_summary",
    "region_volume",
    "doc_fingerprint",
    "video_frame_sample",
    "cycle_metrics",
    "multimodal_features",
    "corpus_clean",
    "language_id",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from facolos_data_pipelines_spark.session import build_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = build_spark(app_name="bench")
    # Warm-up: touch every table once so first timed query doesn't pay
    # filesystem/codegen cold-start.
    from facolos_data_pipelines_spark.session import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
