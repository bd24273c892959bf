"""Scale measurement for the streaming near-dup sink, run AS a stream
(VERDICT r9 ask #5): the batch state loops got §6g's wall-time curves;
this gives the streaming twin (`streaming.near_dup_filter_sink` +
`compact_bucket_store`) its own — per-batch latency vs batch index
while the bucket store grows under continuous ingestion, the
compaction cost that bounds the store's file count, and the replay
leg that certifies at-least-once idempotence at scale.

Protocol: documents.parquet split into ``n_batches`` batches by
``pmod(xxhash64(doc_id), n_batches)`` — deterministic, even-sized,
and (crucially) it SPREADS the scale generator's near-dup copies
(same base id offset by 10^7 per copy) across different batches, so
the cross-batch store probe does real dedup work instead of the
within-batch sweep catching everything. Batches are fed to the
foreachBatch callable in order (exactly how run_available_now drives
it, minus the stream plumbing — the sink function is the unit under
test and the timings exclude Kafka/files source overhead by
construction). Every batch is timed; every
``compact_every`` batches the store is compacted (timed separately —
maintenance, not ingest latency); after the last batch, batch 0 is
REPLAYED and the sink must not grow. One JSON line out.

The claim under test (SCALE.md §6h): per-batch latency stays flat as
the store grows, because the probe is a broadcast of the batch's
bucket rows against a map-only store scan — no store-side shuffle
ever — and compaction keeps the per-partition file count (and with it
the scan's open/footer overhead) bounded. The store SCAN is the one
term that grows with corpus size; it is columnar, id-width, and
partition-pruned, so its slope is shallow — the measurement shows the
slope, not just asserts it.

Usage:

    python scripts/bench_scale_streaming.py SF_DIR [n_batches] [compact_every]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _store_files(store: str) -> int:
    return len(glob.glob(os.path.join(store, "**", "*.parquet"), recursive=True))


def main() -> int:
    if len(sys.argv) < 2:
        raise SystemExit("usage: bench_scale_streaming.py SF_DIR [n_batches] [compact_every]")
    sf_dir = sys.argv[1].rstrip("/")
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.session import build_spark
    from facolos_data_pipelines_spark.streaming import (
        compact_bucket_store,
        near_dup_filter_sink,
    )

    spark = build_spark(app_name="scale-streaming-neardup")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    batch_sz = (n_docs + n_batches - 1) // n_batches

    sink = f"/tmp/scale_stream_sink_{os.getpid()}"
    store = f"/tmp/scale_stream_store_{os.getpid()}"
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(store, ignore_errors=True)

    fold = near_dup_filter_sink(sink, store, store_partitions=16)
    bkey = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_batches))
    cycles, compactions = [], []
    for b in range(n_batches):
        batch = docs.filter(bkey == b)
        t0 = time.monotonic()
        fold(batch, b)
        cycles.append({
            "batch": b,
            "batch_s": round(time.monotonic() - t0, 3),
            "store_files": _store_files(store),
        })
        if compact_every and (b + 1) % compact_every == 0 and b + 1 < n_batches:
            t0 = time.monotonic()
            stats = compact_bucket_store(spark, store)
            compactions.append({
                "after_batch": b,
                "compact_s": round(time.monotonic() - t0, 3),
                "files_before": stats["files_before"],
                "files_after": stats["files_after"],
                "rows_before": stats["rows_before"],
                "rows_after": stats["rows_after"],
            })

    survivors = spark.read.parquet(sink).count()
    # replay idempotence: redelivering batch 0 must add nothing
    t0 = time.monotonic()
    fold(docs.filter(bkey == 0), n_batches)
    replay_s = round(time.monotonic() - t0, 3)
    survivors_after_replay = spark.read.parquet(sink).count()
    assert survivors_after_replay == survivors, (
        survivors, survivors_after_replay
    )

    half = n_batches // 2
    result = {
        "op": "streaming_near_dup_loop",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_batches": n_batches,
        "batch_docs": batch_sz,
        "survivors": survivors,
        "store_rows": spark.read.parquet(store).count(),
        "cycles": cycles,
        "median_first_half_s": statistics.median(
            c["batch_s"] for c in cycles[:half]
        ),
        "median_second_half_s": statistics.median(
            c["batch_s"] for c in cycles[half:]
        ),
        "compactions": compactions,
        "replay_batch0_s": replay_s,
        "replay_idempotent": True,
    }
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(store, ignore_errors=True)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
