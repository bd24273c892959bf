"""Scale-curve measurement for the embedding dedup growers under the
scale-correct configuration (``num_planes='auto'``).

The certified oracle queries pin the 6x4 banded-LSH configuration so
DuckDB can reproduce their exact pair sets; that fixed 2^6 bucket
space is fine at oracle scale but degrades QUADRATICALLY as the corpus
grows (occupancy ~ n/64 — the sf10 attempt at 6 planes over 2M vectors
died on shuffle-spill disk exhaustion; SCALE.md §6c records it). This
script measures the operator the way a 100 TB job would run it —
``num_planes='auto'`` pins bucket occupancy so candidates stay linear
in n — at any sf directory, median-of-N in one JVM (isolate per
(op, sf) by running one process per combination, same protocol as the
bench):

    python scripts/bench_scale_growers.py SF_DIR OP [reps] [threshold]

OP: ``embedding_near_dups_auto`` (pair search + count) or
``dup_components_auto`` (pair search + single-link components +
count). Prints one JSON line with the median, all rep times, the
resolved plane count, and the output row count.

Threshold defaults to 0.8: the synthesized scale data decorrelates
copy embeddings only down to ~0.5 cosine, so at the certified
queries' 0.4 the TRUE pair set itself grows quadratically with the
copy count (measured: 221 pairs at sf0.1 -> 2.17M at sf1) — any
engine must emit quadratically many rows there, which measures the
data, not the plan. At 0.8 pair density stays flat by construction
and the curve isolates plan scaling.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit(
            "usage: bench_scale_growers.py SF_DIR OP [reps] [threshold]"
        )
    sf_dir, op = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    threshold = float(sys.argv[4]) if len(sys.argv) > 4 else 0.8

    from facolos_data_pipelines_spark.operators.dedup import (
        _auto_num_planes,
        connected_components,
        embedding_near_dup_pairs,
    )
    from facolos_data_pipelines_spark.session import build_spark

    spark = build_spark(app_name=f"scale-{op}")
    emb = spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")
    n_vec = emb.count()
    planes = _auto_num_planes(n_vec)

    def run() -> tuple[float, int]:
        t0 = time.monotonic()
        pairs = embedding_near_dup_pairs(
            emb, threshold=threshold, num_planes="auto", verify_impl="arrow"
        )
        if op == "embedding_near_dups_auto":
            n = pairs.count()
        elif op == "dup_components_auto":
            n = connected_components(pairs.select("id_a", "id_b")).count()
        else:
            raise SystemExit(f"unknown op {op!r}")
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
                "n_vectors": n_vec,
                "num_planes": planes,
                "threshold": threshold,
                "median": statistics.median(times),
                "times": times,
                "rows_out": n_out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
