"""Scale-curve measurement for the inverted-index posting-join dedup
family — the operators whose worst case is the SAME quadratic shape the
round-7 embedding-LSH failure had (one hot key -> freq^2 candidate
pairs), bounded here by the in-plan ``max_posting_size`` cap instead of
signature sizing.

Same isolated-median protocol as ``bench_scale_growers.py`` (SCALE.md
§6c): one process per (op, sf_dir), median-of-N reps in a warm JVM.

    python scripts/bench_scale_postings.py SF_DIR OP [reps]

OP:
- ``doc_containment``   — ngram_containment_pairs, threshold 0.6,
  default cap (10k postings/shingle)
- ``ngram_jaccard``     — ngram_jaccard_pairs, threshold 0.8,
  default cap
- ``duplicate_spans``   — duplicate_gram_spans, n=5 (positioned-gram
  groupBy; no posting self-join, listed for the family's sf10 row)
- ``hot_capped`` / ``hot_uncapped`` — the stress pair: one hot
  sentence is planted into 10% of the corpus (appended via concat, so
  every stressed doc shares its 3-shingles), then the Jaccard posting
  join runs WITH the cap (1,000) vs WITHOUT. At n docs each hot
  posting holds n/10 entries: uncapped candidate pairs grow as
  (n/10)^2 / 2 — 12.5M pairs through one shingle at 50k docs — while
  the cap bounds every shingle's contribution at 1000^2/2 = 500k
  pairs regardless of corpus size. The capped result remains EXACT
  for every pair whose overlap doesn't route through a capped shingle
  (the operator docstring's contract); the stress shows the RUNTIME
  bound, which is what survives at 100 TB.

Optional trailing args override the operator knobs for ad-hoc density
experiments: ``[threshold]`` (Jaccard/containment) and ``[cap]``
(max_posting_size; 'none' = uncapped).

Prints one JSON line: op, sf_dir, n_docs, median, all rep times,
rows_out.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_SENTENCE = (
    " the quick brown fox jumps over the lazy dog near the riverbank today"
)


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit(
            "usage: bench_scale_postings.py SF_DIR OP [reps] [threshold] [cap]"
        )
    sf_dir, op = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    thr_override = float(sys.argv[4]) if len(sys.argv) > 4 else None
    cap_override: int | None | str = sys.argv[5] if len(sys.argv) > 5 else "unset"
    if cap_override != "unset":
        cap_override = None if str(cap_override).lower() == "none" else int(cap_override)
    # hot_* ops: every doc with doc_id % hot_mod == 0 gets the hot
    # sentence (default 10 -> 10% of the corpus)
    hot_mod = int(sys.argv[6]) if len(sys.argv) > 6 else 10

    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.operators.dedup import (
        duplicate_gram_spans,
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )
    from facolos_data_pipelines_spark.session import build_spark

    spark = build_spark(app_name=f"scale-postings-{op}")
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    n_docs = docs.count()

    if op.startswith("hot_"):
        # plant ONE hot shingle family into 1/hot_mod of the docs:
        # a fixed sentence appended in-plan — deterministic, no data file
        docs = docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % hot_mod == 0,
                F.concat(F.col("text"), F.lit(HOT_SENTENCE)),
            ).otherwise(F.col("text")),
        )

    def kw(default_thr: float, default_cap="unset") -> dict:
        out: dict = {
            "threshold": default_thr if thr_override is None else thr_override
        }
        if cap_override != "unset":
            out["max_posting_size"] = cap_override
        elif default_cap != "unset":
            out["max_posting_size"] = default_cap
        return out

    def run() -> tuple[float, int]:
        t0 = time.monotonic()
        if op == "doc_containment":
            out = ngram_containment_pairs(docs, **kw(0.6))
        elif op == "ngram_jaccard":
            out = ngram_jaccard_pairs(docs, **kw(0.8))
        elif op == "duplicate_spans":
            out = duplicate_gram_spans(docs, n=5)
        elif op == "hot_capped":
            out = ngram_jaccard_pairs(docs, **kw(0.8, 1000))
        elif op == "hot_uncapped":
            out = ngram_jaccard_pairs(docs, **kw(0.8, None))
        else:
            raise SystemExit(f"unknown op {op!r}")
        n = out.count()
        return time.monotonic() - t0, n

    times, n_out = [], None
    for _ in range(reps):
        t, n_out = run()
        times.append(round(t, 3))
    print(
        json.dumps(
            {
                "op": op,
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "median": statistics.median(times),
                "times": times,
                "rows_out": n_out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
