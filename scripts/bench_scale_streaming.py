"""Scale measurements for the STREAMING sinks, run AS streams: the
batch state loops got §6g's wall-time curves; these give the streaming
twins their own — per-batch latency vs batch index while the persisted
state grows under continuous ingestion, the maintenance cost that
bounds store file counts, and the replay legs that certify
at-least-once idempotence at scale.

Three ops (SCALE.md §6h/§6j):

- ``minhash`` — `streaming.near_dup_filter_sink` + `compact_bucket_store`
  over ``documents``: the r9 measurement (batch-bucket broadcast vs
  map-only store scan; claim: per-batch latency flat as the store
  grows).
- ``embedding`` — `streaming.embedding_near_dup_sink` over
  ``embeddings`` (round 11): the hyperplane-LSH twin, same claim, same
  probe shape ((band, sig) buckets, pmod-partitioned store, pinned
  plane family).
- ``drift`` — `streaming.hist_state_sink` over ``events`` (round 11):
  the counting sink. Per-batch cost is ONE narrow scan of the batch
  (the store is never read on the ingest path), so the claim is
  stronger than flat-while-growing: the ingest cost is independent of
  the store BY CONSTRUCTION, and the measured curve + the timed
  replay-overwrite leg show the `_batch_id` dynamic-partition-overwrite
  idempotence costs the same as a first delivery. After the run the
  PSI series read from the store is asserted EQUAL to
  `rolling_psi_drift` over the accumulated fact (whole-window edges —
  the equality precondition), closing the loop end to end.

Protocol (minhash/embedding): the fact is split into ``n_batches``
batches by ``pmod(xxhash64(id), n_batches)`` — deterministic,
even-sized, and it SPREADS the scale generator's near-dup 3-cliques
across batches, so the cross-batch store probe does real dedup work
instead of the within-batch sweep catching everything. Batches feed
the foreachBatch callable in order (exactly how run_available_now
drives it, minus stream plumbing — the sink function is the unit under
test). Every batch is timed; every ``compact_every`` batches the store
is compacted (timed separately — maintenance, not ingest latency);
after the last batch, batch 0 is REPLAYED and the sink must not grow.
One JSON line out.

Usage:

    python scripts/bench_scale_streaming.py SF_DIR [op] [n_batches] [compact_every]

``op`` in {minhash, embedding, drift} (default minhash; a bare number
as the second arg keeps the legacy minhash CLI).
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


def _run_bucket_sink_loop(
    spark,
    df,
    id_col: str,
    fold,
    sink: str,
    store: str,
    n_batches: int,
    compact_every: int,
    compact_kwargs: dict,
    op_name: str,
    sf_dir: str,
):
    """Shared driver for the two bucket-probing sinks (minhash docs /
    embedding vectors): timed per-batch ingest, periodic timed
    compaction, replay-idempotence leg, one JSON result dict."""
    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.streaming import compact_bucket_store

    n_rows = df.count()
    batch_sz = (n_rows + n_batches - 1) // n_batches
    bkey = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_batches))
    cycles, compactions = [], []
    for b in range(n_batches):
        batch = df.filter(bkey == b)
        t0 = time.monotonic()
        fold(batch, b)
        cycles.append({
            "batch": b,
            "batch_s": round(time.monotonic() - t0, 3),
            "store_files": _store_files(store),
        })
        if compact_every and (b + 1) % compact_every == 0 and b + 1 < n_batches:
            t0 = time.monotonic()
            stats = compact_bucket_store(spark, store, **compact_kwargs)
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
    fold(df.filter(bkey == 0), n_batches)
    replay_s = round(time.monotonic() - t0, 3)
    survivors_after_replay = spark.read.parquet(sink).count()
    assert survivors_after_replay == survivors, (
        survivors, survivors_after_replay
    )

    half = n_batches // 2
    return {
        "op": op_name,
        "sf_dir": sf_dir,
        "n_rows": n_rows,
        "n_batches": n_batches,
        "batch_rows": batch_sz,
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


def _run_drift_sink_loop(spark, sf_dir: str, n_batches: int):
    """hist_state_sink measured as a stream: timed per-batch appends of
    (day, bin, n) rows under whole-window pinned edges, a timed
    replay-overwrite leg (the counting sink's idempotence mechanism),
    and the end-to-end equality assert: PSI read from the store ==
    rolling_psi_drift over the accumulated fact."""
    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.quality.checks import (
        hist_edges,
        psi_from_hist_state,
        rolling_psi_drift,
    )
    from facolos_data_pipelines_spark.streaming import hist_state_sink

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_rows = events.count()
    pid = os.getpid()
    store = f"/tmp/scale_drift_store_{pid}"
    edges_path = f"/tmp/scale_drift_edges_{pid}"
    shutil.rmtree(store, ignore_errors=True)
    shutil.rmtree(edges_path, ignore_errors=True)
    # whole-window edges: the precondition under which the state-read
    # PSI equals rolling_psi_drift row for row (pytest-pinned contract)
    hist_edges(events, "value").write.parquet(edges_path)

    fold = hist_state_sink(store, edges_path, "ts", "value")
    bkey = F.pmod(F.xxhash64(F.col("event_id")), F.lit(n_batches))
    cycles = []
    for b in range(n_batches):
        batch = events.filter(bkey == b)
        t0 = time.monotonic()
        fold(batch, b)
        cycles.append({
            "batch": b,
            "batch_s": round(time.monotonic() - t0, 3),
            "store_files": _store_files(store),
        })

    want = sorted(
        tuple(r) for r in rolling_psi_drift(events, "ts", "value").collect()
    )
    got = sorted(
        tuple(r)
        for r in psi_from_hist_state(spark.read.parquet(store)).collect()
    )
    assert got == want and want, (
        f"state-read PSI != rolling_psi_drift ({len(got)} vs {len(want)} rows)"
    )

    # replay-overwrite leg: redeliver batch 0 under its original id —
    # dynamic partition overwrite replaces its partition, the series is
    # unchanged, and the cost is a first-delivery append + the replaced
    # partition's commit
    t0 = time.monotonic()
    fold(events.filter(bkey == 0), 0)
    replay_s = round(time.monotonic() - t0, 3)
    after = sorted(
        tuple(r)
        for r in psi_from_hist_state(spark.read.parquet(store)).collect()
    )
    assert after == want

    half = n_batches // 2
    result = {
        "op": "streaming_drift_state_loop",
        "sf_dir": sf_dir,
        "n_rows": n_rows,
        "n_batches": n_batches,
        "batch_rows": (n_rows + n_batches - 1) // n_batches,
        "store_rows": spark.read.parquet(store).count(),
        "psi_days": len(want),
        "cycles": cycles,
        "median_first_half_s": statistics.median(
            c["batch_s"] for c in cycles[:half]
        ),
        "median_second_half_s": statistics.median(
            c["batch_s"] for c in cycles[half:]
        ),
        "replay_batch0_s": replay_s,
        "replay_idempotent": True,
        "psi_equals_rolling": True,
    }
    shutil.rmtree(store, ignore_errors=True)
    shutil.rmtree(edges_path, ignore_errors=True)
    return result


def _run_drift_guard_compare(spark, sf_dir: str, n_batches: int):
    """The §6j guard-on cost row (r11 verdict ask #4): the SAME
    micro-batches fed back-to-back to a guard-OFF and a guard-ON
    (edge_guard_threshold=0.4) hist_state_sink on separate stores —
    interleaved per batch, so JVM warmup and host noise hit both arms
    equally, AND with the arm ORDER alternating per batch (even
    batches run off-first, odd batches on-first): a fixed order would
    bias the paired delta toward whichever arm runs second (page
    cache, GC, and per-batch warmup are position effects — the first
    measurement of this protocol ran off-first every cycle and
    recorded a physically impossible NEGATIVE median cost for an arm
    that strictly adds work). The paired per-batch delta then IS the
    guard's cost (one localCheckpoint of the days x bins rows + one
    tiny-aggregate read), with position effects cancelling across the
    parity split. Asserts: the two stores accumulate identical (day, bin, n)
    mass, the guard stays SILENT across every in-family batch
    (whole-window quantile edges put ~2/num_bins of mass in the
    terminal bins, under the 0.4 threshold), and a synthetic drifted
    tail batch (values shifted past the last edge) fires the WARN
    within its own batch, timed."""
    import logging

    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.quality.checks import hist_edges
    from facolos_data_pipelines_spark.streaming import hist_state_sink

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_rows = events.count()
    pid = os.getpid()
    store_off = f"/tmp/scale_drift_off_{pid}"
    store_on = f"/tmp/scale_drift_on_{pid}"
    edges_path = f"/tmp/scale_drift_edges_{pid}"
    for p in (store_off, store_on, edges_path):
        shutil.rmtree(p, ignore_errors=True)
    hist_edges(events, "value").write.parquet(edges_path)

    fold_off = hist_state_sink(store_off, edges_path, "ts", "value")
    fold_on = hist_state_sink(
        store_on, edges_path, "ts", "value", edge_guard_threshold=0.4
    )

    class _WarnCounter(logging.Handler):
        def __init__(self):
            super().__init__(level=logging.WARNING)
            self.messages: list[str] = []

        def emit(self, record):  # noqa: D102
            self.messages.append(record.getMessage())

    counter = _WarnCounter()
    sink_logger = logging.getLogger(
        "facolos_data_pipelines_spark.streaming.pipeline"
    )
    sink_logger.addHandler(counter)
    try:
        bkey = F.pmod(F.xxhash64(F.col("event_id")), F.lit(n_batches))
        cycles = []
        for b in range(n_batches):
            batch = events.filter(bkey == b)
            arms = (
                [("off", fold_off), ("on", fold_on)]
                if b % 2 == 0
                else [("on", fold_on), ("off", fold_off)]
            )
            t = {}
            for name, fold in arms:
                t0 = time.monotonic()
                fold(batch, b)
                t[name] = round(time.monotonic() - t0, 3)
            cycles.append({
                "batch": b, "off_s": t["off"], "on_s": t["on"],
                "first_arm": arms[0][0],
                "delta_s": round(t["on"] - t["off"], 3),
            })
        warns_clean = len(counter.messages)
        assert warns_clean == 0, (
            f"guard fired {warns_clean}x on in-family batches: "
            f"{counter.messages[:2]}"
        )
        # both arms accumulated identical mass
        def _mass(path):
            return sorted(
                tuple(r)
                for r in spark.read.parquet(path)
                .groupBy("day", "bin")
                .agg(F.sum("n").alias("n"))
                .collect()
            )

        assert _mass(store_off) == _mass(store_on)

        # drifted tail: every value pushed past the last edge — the
        # WARN must fire within this one batch, and the cost is a
        # first-delivery append + the guard terms
        drifted = events.filter(bkey == 0).withColumn(
            "value", F.col("value").cast("double") + F.lit(1.0e7)
        )
        t0 = time.monotonic()
        fold_on(drifted, n_batches)
        drifted_s = round(time.monotonic() - t0, 3)
        assert counter.messages and "outgrown the pinned edges" in (
            counter.messages[-1]
        ), "drifted batch did not fire the guard WARN"
    finally:
        sink_logger.removeHandler(counter)

    med = lambda xs: statistics.median(xs)  # noqa: E731
    # Position decomposition: within a cycle the FIRST arm pays the
    # batch's cold read (page cache) and the second re-reads warm, so
    # delta(on-first cycles) ~= guard + position and delta(off-first
    # cycles) ~= guard - position; the mean of the two parity medians
    # cancels the position term and estimates the guard's true cost.
    d_on_first = med(
        [c["delta_s"] for c in cycles if c["first_arm"] == "on"]
    )
    d_off_first = med(
        [c["delta_s"] for c in cycles if c["first_arm"] == "off"]
    )
    result = {
        "op": "streaming_drift_guard_compare",
        "sf_dir": sf_dir,
        "n_rows": n_rows,
        "n_batches": n_batches,
        "batch_rows": (n_rows + n_batches - 1) // n_batches,
        "guard_threshold": 0.4,
        "cycles": cycles,
        "median_off_s": med([c["off_s"] for c in cycles]),
        "median_on_s": med([c["on_s"] for c in cycles]),
        "median_paired_delta_s": med([c["delta_s"] for c in cycles]),
        "median_delta_on_first_s": d_on_first,
        "median_delta_off_first_s": d_off_first,
        "guard_cost_position_corrected_s": round(
            (d_on_first + d_off_first) / 2, 3
        ),
        "position_effect_s": round((d_on_first - d_off_first) / 2, 3),
        "guard_warns_on_clean_batches": warns_clean,
        "stores_equal": True,
        "drifted_batch_s": drifted_s,
        "drifted_batch_warned": True,
    }
    for p in (store_off, store_on, edges_path):
        shutil.rmtree(p, ignore_errors=True)
    return result


def main() -> int:
    if len(sys.argv) < 2:
        raise SystemExit(
            "usage: bench_scale_streaming.py SF_DIR [op] [n_batches] [compact_every]"
        )
    sf_dir = sys.argv[1].rstrip("/")
    rest = list(sys.argv[2:])
    op = "minhash"
    if rest and not rest[0].lstrip("-").isdigit():
        op = rest.pop(0)
    if op not in ("minhash", "embedding", "drift", "drift_guarded"):
        raise SystemExit(
            f"unknown op {op!r}: expected minhash|embedding|drift|drift_guarded"
        )
    n_batches = int(rest[0]) if rest else 25
    compact_every = int(rest[1]) if len(rest) > 1 else 10

    from facolos_data_pipelines_spark.session import build_spark
    from facolos_data_pipelines_spark.streaming import (
        embedding_near_dup_sink,
        near_dup_filter_sink,
    )

    spark = build_spark(app_name=f"scale-streaming-{op}")
    pid = os.getpid()

    if op == "drift":
        result = _run_drift_sink_loop(spark, sf_dir, n_batches)
        print(json.dumps(result))
        return 0

    if op == "drift_guarded":
        result = _run_drift_guard_compare(spark, sf_dir, n_batches)
        print(json.dumps(result))
        return 0

    sink = f"/tmp/scale_stream_sink_{pid}"
    store = f"/tmp/scale_stream_store_{pid}"
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(store, ignore_errors=True)
    if op == "minhash":
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        fold = near_dup_filter_sink(sink, store, store_partitions=16)
        result = _run_bucket_sink_loop(
            spark, df, "doc_id", fold, sink, store, n_batches, compact_every,
            {}, "streaming_near_dup_loop", sf_dir,
        )
        # legacy field names kept for cross-round diffing of §6h
        result["n_docs"] = result.pop("n_rows")
        result["batch_docs"] = result.pop("batch_rows")
    else:
        import math

        df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # bucket-level sink: size planes for the COLLISION RATE at the
        # target corpus (false drops per vector ~= N * bands * 2^-p),
        # not for occupancy — see embedding_near_dup_sink's docstring.
        # eps=0.05 false-drop budget over the whole run's corpus.
        n_target = df.count()
        num_bands = 4
        num_planes = max(
            12, math.ceil(math.log2(max(n_target, 2) * num_bands / 0.05))
        )
        fold = embedding_near_dup_sink(
            sink, store,
            num_planes=num_planes, num_bands=num_bands, store_partitions=16,
        )
        result = _run_bucket_sink_loop(
            spark, df, "vec_id", fold, sink, store, n_batches, compact_every,
            {"id_col": "vec_id", "key_cols": ("band", "sig")},
            "streaming_embedding_near_dup_loop", sf_dir,
        )
        result["num_planes"] = num_planes
        result["num_bands"] = num_bands
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(store, ignore_errors=True)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
