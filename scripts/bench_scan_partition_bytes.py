"""CLUSTER.md's `spark.sql.files.maxPartitionBytes` row, measured
(r11 verdict ask #7 — the sheet's last guidance-only row).

What CAN be measured on one box: the dial's two failure directions.
`maxPartitionBytes` sets the input-split size of a parquet scan, so at
a fixed input it sets the scan's TASK COUNT: too LARGE and the task
count falls below the available cores (parallelism starvation — the
direction a local[32] run can show on a ~1 GB table: 256 MB splits a
1.1 GB scan into ~5 tasks, idling 27 of 32 cores); too SMALL and
per-task overhead dominates (hundreds of sub-second tasks). The
production rule this pins: pick the setting so scan tasks land in the
100–500 MB input band AND the task count at least covers the executor
cores of one scan wave — at 100 TB the first constraint binds (a
1000-executor cluster sees ~800k tasks at 128 MB, far above core
count), on a small-input/many-core box the second does.

Protocol: full-scan aggregate of lineitem (sum/min/max over enough
columns that the scan reads real bytes, count(*) over the rest) at a
sweep of maxPartitionBytes settings; the frame is re-created per leg
(the conf is read at scan planning time); 1 discarded warmup + N
timed reps per leg, medians + the actual scan task count per leg
(`df.rdd.getNumPartitions()` on the scan RDD mirrors the split
arithmetic). One JSON line out.

Usage:

    python scripts/bench_scan_partition_bytes.py SF_DIR [reps]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        raise SystemExit("usage: bench_scan_partition_bytes.py SF_DIR [reps]")
    sf_dir = sys.argv[1].rstrip("/")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.session import build_spark

    spark = build_spark(app_name="scan-partition-bytes")
    path = f"{sf_dir}/lineitem.parquet"
    on_disk = 0
    for root, _dirs, files in os.walk(path):
        on_disk += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files if f.endswith(".parquet")
        )

    def scan_agg(df):
        # touch a representative column mix so the scan decodes real
        # bytes (numerics + dates + a string), not a count-only stat
        return df.agg(
            F.count("*"),
            F.sum("l_extendedprice"),
            F.sum("l_quantity"),
            F.sum("l_discount"),
            F.min("l_shipdate"),
            F.max("l_returnflag"),
        ).collect()

    legs = {}
    for mb in (16, 64, 128, 256, 512):
        spark.conf.set("spark.sql.files.maxPartitionBytes", f"{mb}m")
        df = spark.read.parquet(path)  # re-plan under the new split size
        n_tasks = df.rdd.getNumPartitions()
        scan_agg(df)  # warmup (page cache + codegen)
        times = []
        for _ in range(reps):
            df = spark.read.parquet(path)
            t0 = time.monotonic()
            scan_agg(df)
            times.append(round(time.monotonic() - t0, 3))
        legs[str(mb)] = {
            "median": statistics.median(times),
            "times": times,
            "scan_tasks": n_tasks,
        }
    print(json.dumps({
        "op": "scan_partition_bytes",
        "sf_dir": sf_dir,
        "table": "lineitem",
        "bytes_on_disk": on_disk,
        "cores": spark.sparkContext.defaultParallelism,
        "reps": reps,
        "legs": legs,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
