"""Scale-decade measurement for the two round-8 operators.

Round 8 shipped ``cross_corpus_dedup`` and ``corpus_overlap_delta``
with 100 TB design arguments asserted from the plan shape; this script
measures them the way §6c/§6d measured their siblings — one process
per (op, sf_dir), median-of-N inside a warm JVM, JSON line out. Ops:

- ``cross_corpus_dedup`` — the certified query's corpus split (odd ids
  = new batch, even ids = existing corpus) under the PRODUCTION
  configuration (xxhash64 multiply_add family, default 32 lanes / 8
  bands, candidate checkpoint): end-to-end survivors count.
- ``cross_corpus_smalleval`` — the decontamination case: the WHOLE
  corpus as the new batch, a ~1k-doc eval set as the right side,
  measured in BOTH candidate modes ('checkpoint', the default, and
  'lazy'); reports per-mode wall times plus the final-plan join
  histograms (the claim under test: with the default checkpoint the
  candidate id set's known size lets AQE broadcast every downstream
  join — the big corpus is scan-only, never shuffled).
- ``overlap_delta_loop`` — the monitoring loop: bootstrap a persisted
  gram-state table (parquet under /tmp), run N delta cycles (delta
  aggregate + corpus_state_append write-back), and after each cycle
  run the from-scratch ``corpus_overlap`` of the accumulated corpus
  the loop replaces; asserts the running totals match from-scratch
  every cycle and reports both per-cycle wall times (the win under
  test: delta cycles cost O(batch) while from-scratch grows with the
  corpus).

Usage:

    python scripts/bench_scale_crosscorpus.py SF_DIR OP [reps]

Corpus splits (documents.parquet): cross_corpus uses doc_id parity;
the loop uses doc_id % 5 — {0,1} bootstrap, 2 and 3 the two batches,
4 the reference corpus.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _plan_counts(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    out = {}
    for key in ("BroadcastHashJoin", "SortMergeJoin", "Exchange",
                "BroadcastExchange", "AQEShuffleRead"):
        out[key] = plan.count(f") {key}")
    return out


def _run_bucket_sizing_sweep(
    spark,
    state_df,
    key_cols,
    probe_fn,
    lazy_counts_fn,
    table_prefix,
    reps,
    expected_pairs=None,
):
    """Shared sweep body of the two *_bucket_sizing ops (§6k + its
    embedding addendum): write the SAME state bucketed at 4/16/64 on
    ``key_cols``, time ``reps`` probe executions per layout, assert
    the verified pair SET is identical at every N (and equal to
    ``expected_pairs`` when the fixture pins an exact count), capture
    the lazy-plan join histogram via ``lazy_counts_fn``, and report
    file/byte geometry. One body — a protocol fix lands in both
    families at once."""
    from facolos_data_pipelines_spark.sources.io import write_bucketed

    legs = {}
    ref_pairs = None
    for nb in (4, 16, 64):
        tbl = f"{table_prefix}_{nb}_{os.getpid()}"
        path = f"/tmp/{table_prefix}_{nb}_{os.getpid()}"
        shutil.rmtree(path, ignore_errors=True)
        t0 = time.monotonic()
        write_bucketed(
            state_df, tbl, list(key_cols), num_buckets=nb,
            sort_cols=list(key_cols), path=path,
        )
        write_s = round(time.monotonic() - t0, 3)
        state = spark.table(tbl)
        times, n_pairs = [], None
        for _ in range(reps):
            t0 = time.monotonic()
            n_pairs = probe_fn(state).count()
            times.append(round(time.monotonic() - t0, 3))
        got = sorted(
            (r["left_id"], r["right_id"]) for r in probe_fn(state).collect()
        )
        if ref_pairs is None:
            ref_pairs = got
        assert got == ref_pairs, (nb, len(got), len(ref_pairs))
        if expected_pairs is not None:
            assert n_pairs == expected_pairs, (
                f"want exactly {expected_pairs} verified pairs, got {n_pairs}"
            )
        lazy_counts = lazy_counts_fn(state)
        import glob as _glob

        files = [
            f for f in _glob.glob(
                os.path.join(path, "**", "*.parquet"), recursive=True
            ) if os.path.isfile(f)
        ]
        state_bytes = sum(os.path.getsize(f) for f in files)
        legs[str(nb)] = {
            "median": statistics.median(times), "times": times,
            "pairs": n_pairs, "write_s": write_s,
            "state_bytes": state_bytes, "state_files": len(files),
            "mb_per_bucket": round(state_bytes / nb / 1024 / 1024, 2),
            "lazy_plan": lazy_counts,
        }
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(path, ignore_errors=True)
    return legs


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit("usage: bench_scale_crosscorpus.py SF_DIR OP [reps]")
    sf_dir, op = sys.argv[1].rstrip("/"), sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.session import build_spark

    spark = build_spark(app_name=f"scale-{op}")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    result: dict = {"op": op, "sf_dir": sf_dir, "n_docs": n_docs}

    if op == "cross_corpus_dedup":
        from facolos_data_pipelines_spark.operators.dedup import (
            cross_corpus_dedup,
        )

        left = docs.filter(F.col("doc_id") % 2 == 1)
        right = docs.filter(F.col("doc_id") % 2 == 0)
        times, n_out = [], None
        for _ in range(reps):
            t0 = time.monotonic()
            n_out = cross_corpus_dedup(left, right, threshold=0.8).count()
            times.append(round(time.monotonic() - t0, 3))
        result |= {"median": statistics.median(times), "times": times,
                   "survivors": n_out, "n_left": left.count(),
                   "n_right": right.count()}

    elif op == "cross_corpus_smalleval":
        from facolos_data_pipelines_spark.operators.dedup import (
            minhash_cross_corpus_pairs,
        )

        # ~1k-doc eval side regardless of sf: ids divisible by n/1000
        mod = max(2, n_docs // 1000)
        evalset = docs.filter(F.col("doc_id") % mod == 0)
        # both candidate modes: 'checkpoint' (the default — the
        # materialized candidate id set has a KNOWN tiny size, so AQE
        # broadcasts every downstream join including both corpus
        # semi-joins: the big corpus is scan-only, never shuffled —
        # the shape a 1000-executor run needs) and 'lazy' (pure plan,
        # reused shuffle stages; cheaper single-box but the corpus
        # semi-join stays a sort-merge shuffle). collect() (not
        # count()) so the timed action executes THIS frame's own query
        # execution and explain afterwards shows the final adaptive
        # plan. Output is bounded: ~copies-per-group pairs per eval doc.
        result |= {"n_eval": evalset.count(), "modes": {}}
        for mode in ("checkpoint", "lazy"):
            # 'checkpoint' materializes at BUILD time, so the build
            # must sit inside the timed region (and a fresh frame per
            # rep — a reused checkpoint would measure cache reads);
            # 'lazy' builds once and times the collects.
            pairs = None
            if mode == "lazy":
                pairs = minhash_cross_corpus_pairs(
                    docs, evalset, threshold=0.8, candidates=mode
                )
            times, n_out = [], None
            for _ in range(reps):
                t0 = time.monotonic()
                if mode == "checkpoint":
                    pairs = minhash_cross_corpus_pairs(
                        docs, evalset, threshold=0.8, candidates=mode
                    )
                n_out = len(pairs.collect())
                times.append(round(time.monotonic() - t0, 3))
            result["modes"][mode] = {
                "median": statistics.median(times), "times": times,
                "pairs": n_out, "final_plan": _plan_counts(pairs),
            }

    elif op == "overlap_delta_loop":
        from facolos_data_pipelines_spark.operators.text import (
            corpus_gram_state,
            corpus_overlap,
            corpus_overlap_delta,
            corpus_state_append,
        )

        state = f"/tmp/scale_gram_state_{os.getpid()}"
        shutil.rmtree(state, ignore_errors=True)
        bootstrap = docs.filter(F.col("doc_id") % 5 <= 1)
        # the monitoring regime is a SMALL daily batch against a BIG
        # accumulated corpus: thin the batch classes to ~2k docs at
        # every sf so the decade isolates what grows (the from-scratch
        # recompute) from what must not (the delta cycle)
        thin = max(1, n_docs // 10_000)
        batches = [
            docs.filter(F.col("doc_id") % (5 * thin) == k) for k in (2, 3)
        ]
        ref_docs = docs.filter(F.col("doc_id") % 5 == 4)
        ref_path = f"/tmp/scale_ref_grams_{os.getpid()}"
        shutil.rmtree(ref_path, ignore_errors=True)
        t0 = time.monotonic()
        corpus_gram_state(bootstrap).write.parquet(state)
        bootstrap_s = round(time.monotonic() - t0, 3)
        # the reference gram set is persisted once too (in production a
        # bucketed table) — a delta cycle that recomputes it from the
        # reference corpus would smuggle a full corpus scan back into
        # the O(batch) loop
        corpus_gram_state(ref_docs).write.parquet(ref_path)
        ref = spark.read.parquet(ref_path)
        start = corpus_overlap(bootstrap, ref_docs).first()
        n_grams, n_common = start["n_grams_a"], start["n_common"]
        corpus = bootstrap
        cycles = []
        for batch in batches:
            t0 = time.monotonic()
            seen = spark.read.parquet(state)
            d = corpus_overlap_delta(batch, seen, ref).first()
            corpus_state_append(batch, seen).write.mode("append").parquet(state)
            delta_s = round(time.monotonic() - t0, 3)
            n_grams += d["n_new_grams"]
            n_common += d["n_new_common"]
            corpus = corpus.unionByName(batch)
            t0 = time.monotonic()
            full = corpus_overlap(corpus, ref_docs).first()
            scratch_s = round(time.monotonic() - t0, 3)
            assert (n_grams, n_common) == (
                full["n_grams_a"], full["n_common"]
            ), ((n_grams, n_common), (full["n_grams_a"], full["n_common"]))
            cycles.append({
                "batch_docs": batch.count(),
                "delta_cycle_s": delta_s,
                "from_scratch_s": scratch_s,
                "n_new_grams": d["n_new_grams"],
                "running_grams": n_grams,
            })
        result |= {"bootstrap_s": bootstrap_s, "cycles": cycles,
                   "totals_match": True,
                   "state_rows": spark.read.parquet(state).count()}
        shutil.rmtree(state, ignore_errors=True)
        shutil.rmtree(ref_path, ignore_errors=True)
    elif op == "minhash_delta_loop":
        from facolos_data_pipelines_spark.operators.dedup import (
            cross_corpus_dedup,
            minhash_band_state,
            minhash_dedup,
            minhash_dedup_delta,
            minhash_state_append,
        )

        # continuous-ingestion regime: a FIXED ~2k-doc daily batch
        # against a corpus that grows with sf. doc_id % (2*thin) == 1
        # keeps batch size constant across decades so the measured
        # growth isolates what the state probe costs as the corpus
        # (and its persisted band state) grows 10x and 100x — the
        # claim under test: the delta cycle is pinned to the batch,
        # while the from-scratch recompute (re-signing the corpus via
        # cross_corpus_dedup) grows with the corpus.
        thin = max(1, n_docs // 5_000)
        batch = docs.filter(F.col("doc_id") % (2 * thin) == 1)
        corpus = docs.filter(F.col("doc_id") % 2 == 0)
        state_path = f"/tmp/scale_minhash_state_{os.getpid()}"
        shutil.rmtree(state_path, ignore_errors=True)
        t0 = time.monotonic()
        minhash_band_state(corpus).write.parquet(state_path)
        bootstrap_s = round(time.monotonic() - t0, 3)
        n_batch = batch.count()
        cycles = []
        survivors = None
        for _ in range(reps):
            t0 = time.monotonic()
            state = spark.read.parquet(state_path)
            survivors = minhash_dedup_delta(batch, state, corpus, threshold=0.8)
            n_surv = survivors.count()
            delta_s = round(time.monotonic() - t0, 3)
            cycles.append({"delta_cycle_s": delta_s, "survivors": n_surv})
        # write-back leg, once (the loop's other per-cycle cost)
        t0 = time.monotonic()
        minhash_state_append(survivors).write.mode("append").parquet(state_path)
        append_s = round(time.monotonic() - t0, 3)
        # consistency: the delta survivors equal the from-scratch
        # reference (internal sweep ∩ cross-corpus survivors), timed
        # as the recompute this loop replaces
        t0 = time.monotonic()
        ref_internal = minhash_dedup(batch).select("doc_id")
        ref = (
            cross_corpus_dedup(batch, corpus, threshold=0.8)
            .select("doc_id")
            .join(ref_internal, "doc_id", "left_semi")
        )
        n_ref = ref.count()
        scratch_s = round(time.monotonic() - t0, 3)
        assert n_ref == cycles[-1]["survivors"], (n_ref, cycles)
        mismatch = survivors.select("doc_id").exceptAll(ref).count()
        assert mismatch == 0, mismatch
        result |= {
            "bootstrap_s": bootstrap_s,
            "n_batch": n_batch,
            "n_corpus": corpus.count(),
            "state_rows": spark.read.parquet(state_path).count(),
            "cycles": cycles,
            "delta_median_s": statistics.median(
                c["delta_cycle_s"] for c in cycles
            ),
            "state_append_s": append_s,
            "from_scratch_s": scratch_s,
            "survivors_match_reference": True,
        }
        shutil.rmtree(state_path, ignore_errors=True)
    elif op == "hist_state_loop":
        from facolos_data_pipelines_spark.quality.checks import (
            hist_edges,
            hist_state,
            psi_from_hist_state,
            rolling_psi_drift,
        )
        from facolos_data_pipelines_spark.session import load_tables

        # the round-10 drift-state loop, measured AS a loop: edges
        # pinned once from the bootstrap window (days <= 01-15), then
        # one append cycle per later day — hist_state(batch) append +
        # the psi series read from the state table — against the
        # from-scratch recompute the loop replaces (rolling_psi_drift
        # over the ACCUMULATED fact, which rescans history every day).
        # Consistency: the appended state's series must equal a
        # single-shot hist_state of the accumulated fact under the
        # same pinned edges, every cycle.
        events = load_tables(spark, sf_dir, ["events"])["events"]
        n_events = events.count()
        boot = events.filter(F.to_date("ts") <= F.lit("2024-01-15"))
        edges_path = f"/tmp/scale_hist_edges_{os.getpid()}"
        state_path = f"/tmp/scale_hist_state_{os.getpid()}"
        shutil.rmtree(edges_path, ignore_errors=True)
        shutil.rmtree(state_path, ignore_errors=True)
        t0 = time.monotonic()
        hist_edges(boot, "value", num_bins=10).write.parquet(edges_path)
        pinned = spark.read.parquet(edges_path)
        hist_state(boot, "ts", "value", pinned).write.parquet(state_path)
        bootstrap_s = round(time.monotonic() - t0, 3)
        corpus = boot
        cycles = []
        # testdata events span 2024-01-01..30: 15 post-bootstrap days
        # exist; a string-formatted 2024-01-32 would cast to NULL and
        # silently time empty batches, so use real date arithmetic and
        # refuse reps the data can't back
        if reps > 15:
            raise SystemExit("hist_state_loop: reps > 15 exceeds the "
                             "post-bootstrap day range (01-16..01-30)")
        import datetime as _dt

        for i in range(reps):
            day = str(_dt.date(2024, 1, 16) + _dt.timedelta(days=i))
            batch = events.filter(F.to_date("ts") == F.lit(day))
            t0 = time.monotonic()
            pinned = spark.read.parquet(edges_path)
            hist_state(batch, "ts", "value", pinned).write.mode(
                "append"
            ).parquet(state_path)
            series = psi_from_hist_state(
                spark.read.parquet(state_path), num_bins=10
            )
            n_series = series.count()
            delta_s = round(time.monotonic() - t0, 3)
            corpus = corpus.unionByName(batch)
            t0 = time.monotonic()
            n_scratch = rolling_psi_drift(corpus, "ts", "value").count()
            scratch_s = round(time.monotonic() - t0, 3)
            got = sorted(tuple(r) for r in series.collect())
            ref = sorted(
                tuple(r)
                for r in psi_from_hist_state(
                    hist_state(corpus, "ts", "value", pinned), num_bins=10
                ).collect()
            )
            assert got == ref, (day, len(got), len(ref))
            cycles.append({
                "day": day,
                "batch_rows": batch.count(),
                "delta_cycle_s": delta_s,
                "from_scratch_s": scratch_s,
                "series_days": n_series,
                "scratch_days": n_scratch,
            })
        result |= {
            "n_events": n_events,
            "bootstrap_s": bootstrap_s,
            "cycles": cycles,
            "delta_median_s": statistics.median(
                c["delta_cycle_s"] for c in cycles
            ),
            "scratch_median_s": statistics.median(
                c["from_scratch_s"] for c in cycles
            ),
            "state_rows": spark.read.parquet(state_path).count(),
            "series_match_reference": True,
        }
        shutil.rmtree(edges_path, ignore_errors=True)
        shutil.rmtree(state_path, ignore_errors=True)
    elif op == "profile_state_loop":
        from facolos_data_pipelines_spark.quality.checks import (
            profile_from_state,
            profile_state,
        )
        from facolos_data_pipelines_spark.session import load_tables

        # the moments-profile loop, measured AS a loop: same regime as
        # hist_state_loop (bootstrap days <= 01-15, one append cycle
        # per later day), delta = profile_state(batch) append + the
        # merged profile read from state, scratch = the direct
        # aggregate over the ACCUMULATED fact. Consistency: merged
        # profile == direct profile_from_state(profile_state(corpus))
        # every cycle.
        events = load_tables(spark, sf_dir, ["events"])["events"]
        n_events = events.count()
        boot = events.filter(F.to_date("ts") <= F.lit("2024-01-15"))
        state_path = f"/tmp/scale_prof_state_{os.getpid()}"
        shutil.rmtree(state_path, ignore_errors=True)
        cols = ["value", "event_type"]
        t0 = time.monotonic()
        profile_state(boot, "ts", cols).write.parquet(state_path)
        bootstrap_s = round(time.monotonic() - t0, 3)
        corpus = boot
        cycles = []
        if reps > 15:
            raise SystemExit("profile_state_loop: reps > 15 exceeds the "
                             "post-bootstrap day range (01-16..01-30)")
        import datetime as _dt

        for i in range(reps):
            day = str(_dt.date(2024, 1, 16) + _dt.timedelta(days=i))
            batch = events.filter(F.to_date("ts") == F.lit(day))
            t0 = time.monotonic()
            profile_state(batch, "ts", cols).write.mode("append").parquet(
                state_path
            )
            merged = profile_from_state(spark.read.parquet(state_path))
            got = sorted(tuple(r) for r in merged.collect())
            delta_s = round(time.monotonic() - t0, 3)
            corpus = corpus.unionByName(batch)
            t0 = time.monotonic()
            ref = sorted(
                tuple(r)
                for r in profile_from_state(
                    profile_state(corpus, "ts", cols)
                ).collect()
            )
            scratch_s = round(time.monotonic() - t0, 3)
            assert got == ref, (day, got, ref)
            cycles.append({
                "day": day,
                "batch_rows": batch.count(),
                "delta_cycle_s": delta_s,
                "from_scratch_s": scratch_s,
            })
        result |= {
            "n_events": n_events,
            "bootstrap_s": bootstrap_s,
            "cycles": cycles,
            "delta_median_s": statistics.median(
                c["delta_cycle_s"] for c in cycles
            ),
            "scratch_median_s": statistics.median(
                c["from_scratch_s"] for c in cycles
            ),
            "state_rows": spark.read.parquet(state_path).count(),
            "profile_match_reference": True,
        }
        shutil.rmtree(state_path, ignore_errors=True)
    elif op == "minhash_delta_loop_bucketed":
        from facolos_data_pipelines_spark.operators.dedup import (
            minhash_band_state,
            minhash_delta_pairs,
        )

        # the §6g state-LAYOUT question, measured: the SAME fixed
        # ~2k-doc batch probed against (a) plain parquet state and
        # (b) the bucketed layout the store contract pins
        # (band_id, band_hash — the probe join's keys). Broadcast is
        # disabled so the probe takes the large-large sort-merge path
        # a 100 TB state forces (at bench sf AQE would broadcast the
        # small side and hide the layout difference entirely); the
        # structural win shows as the Exchange-count drop in the lazy
        # probe plan (state side scan-only), the wall-clock win as the
        # per-cycle medians.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        thin = max(1, n_docs // 5_000)
        batch = docs.filter(F.col("doc_id") % (2 * thin) == 1)
        corpus = docs.filter(F.col("doc_id") % 2 == 0)
        plain_path = f"/tmp/scale_mh_plain_{os.getpid()}"
        buck_path = f"/tmp/scale_mh_buck_{os.getpid()}"
        tbl = f"scale_mh_state_{os.getpid()}"
        shutil.rmtree(plain_path, ignore_errors=True)
        shutil.rmtree(buck_path, ignore_errors=True)
        state_df = minhash_band_state(corpus)
        t0 = time.monotonic()
        state_df.write.parquet(plain_path)
        plain_write_s = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        write_bucketed(
            state_df, tbl, ["band_id", "band_hash"], num_buckets=32,
            sort_cols=["band_id", "band_hash"], path=buck_path,
        )
        buck_write_s = round(time.monotonic() - t0, 3)
        legs = {}
        pair_sets = {}
        for leg, state in (
            ("plain", spark.read.parquet(plain_path)),
            ("bucketed", spark.table(tbl)),
        ):
            times, n_pairs = [], None
            for _ in range(reps):
                t0 = time.monotonic()
                pairs = minhash_delta_pairs(
                    batch, state, corpus, threshold=0.8
                )
                n_pairs = pairs.count()
                times.append(round(time.monotonic() - t0, 3))
            pair_sets[leg] = sorted(
                (r["left_id"], r["right_id"])
                for r in minhash_delta_pairs(
                    batch, state, corpus, threshold=0.8
                ).collect()
            )
            lazy = minhash_delta_pairs(
                batch, state, corpus, threshold=0.8, candidates="lazy"
            )
            legs[leg] = {
                "median": statistics.median(times), "times": times,
                "pairs": n_pairs, "lazy_plan": _plan_counts(lazy),
            }
        assert pair_sets["plain"] == pair_sets["bucketed"], (
            len(pair_sets["plain"]), len(pair_sets["bucketed"])
        )
        result |= {
            "n_batch": batch.count(), "n_corpus": corpus.count(),
            "state_rows": spark.read.parquet(plain_path).count(),
            "state_write_s": {"plain": plain_write_s,
                              "bucketed": buck_write_s},
            "legs": legs, "pairs_match": True,
        }
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(plain_path, ignore_errors=True)
        shutil.rmtree(buck_path, ignore_errors=True)
    elif op == "minhash_bucket_sizing":
        from facolos_data_pipelines_spark.operators.dedup import (
            minhash_band_state,
            minhash_delta_pairs,
        )

        # CLUSTER.md's num_buckets row, measured (r10 verdict ask #6):
        # the SAME fixed batch probes the SAME state written bucketed
        # at 4 / 16 / 64 buckets. Broadcast disabled, as in
        # minhash_delta_loop_bucketed — the large-large regime a
        # 100 TB state forces. The claim under test: the
        # shuffle-elision plan shape and the pair set are
        # bucket-count-INVARIANT (the structural win never depends on
        # N), so bucket count is a FILE-SIZE dial — pick N so
        # state_bytes/N lands in parquet's 100-500 MB sweet spot —
        # plus a parallelism floor on the probe's scan side (a
        # bucketed scan reads >= 1 task per bucket; too few buckets
        # caps scan parallelism at production core counts).
        #
        # Split: batch = the copy-1 slice of the scale generator
        # (doc_id in [KEY_OFFSET, 2*KEY_OFFSET)), thinned by base-id
        # hash; corpus = every other copy. The generator plants exact
        # 3-cliques across copies {3g+1, 3g+2, 3g+3}, so each batch
        # doc's two clique siblings (copies 2 and 3) sit IN the
        # corpus and the probe verifies REAL pairs — the odd/even
        # split of the §6g addendum keeps whole cliques on one parity
        # (copy offsets are even) and yields zero verified pairs.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        key_offset = 10_000_000  # make_scale_data documents doc_id shift
        copy_idx = (F.col("doc_id") / F.lit(key_offset)).cast("long")
        batch_all = docs.filter(copy_idx == 1)
        n_slice = batch_all.count()
        if n_slice == 0:
            raise SystemExit(
                "minhash_bucket_sizing needs a make_scale_data directory "
                "(no copy-1 slice found) — run it on /tmp/scale_sf*"
            )
        thin = max(1, n_slice // 2_500)
        batch = batch_all.filter(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(thin)) == 0
        )
        corpus = docs.filter(copy_idx != 1)
        state_df = minhash_band_state(corpus)
        legs = _run_bucket_sizing_sweep(
            spark, state_df, ("band_id", "band_hash"),
            probe_fn=lambda state: minhash_delta_pairs(
                batch, state, corpus, threshold=0.8
            ),
            lazy_counts_fn=lambda state: _plan_counts(
                minhash_delta_pairs(
                    batch, state, corpus, threshold=0.8, candidates="lazy"
                )
            ),
            table_prefix="scale_mh_sizing", reps=reps,
        )
        result |= {
            "n_batch": batch.count(), "n_corpus": corpus.count(),
            "state_rows": state_df.count(),
            "legs": legs, "pairs_match": True,
        }
    elif op == "embedding_bucket_sizing":
        from facolos_data_pipelines_spark.operators import dedup_common
        from facolos_data_pipelines_spark.operators.dedup_embedding import (
            embedding_band_state,
            embedding_delta_pairs,
        )

        # The §6k measurement's embedding twin (r11 verdict ask #3):
        # the SAME fixed batch probes the SAME (band, sig) store
        # written bucketed at 4 / 16 / 64 buckets, broadcast disabled
        # (the large-large regime a 100 TB state forces). Claim under
        # test, as for minhash: the shuffle-elision plan shape and the
        # verified pair set are bucket-count-INVARIANT, so num_buckets
        # is a file-geometry dial sized from state bytes, never a
        # latency dial.
        #
        # Split: batch = the scale generator's copy-1 slice of
        # embeddings (vec_id in [10M, 20M) — embeddings share the
        # documents offset, NOT the 2^33 KEY_OFFSET); corpus = every
        # other copy. perturb_embeddings gives copies {3g+1, 3g+2,
        # 3g+3} one shared direction per (base vec_id, group), so each
        # batch vector's two exact clique siblings (copies 2 and 3)
        # sit IN the corpus: the probe must verify EXACTLY
        # 2 * n_batch real pairs (identical vectors, cosine 1.0),
        # while everything else decorrelates (64-dim cosines
        # concentrate at 0 +- 0.125, far under the 0.9 threshold).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        key_offset = 10_000_000  # make_scale_data embeddings vec_id shift
        copy_idx = (F.col("vec_id") / F.lit(key_offset)).cast("long")
        batch = emb.filter(copy_idx == 1)
        n_batch = batch.count()
        if n_batch == 0:
            raise SystemExit(
                "embedding_bucket_sizing needs a make_scale_data directory "
                "(no copy-1 slice found) — run it on /tmp/scale_sf*"
            )
        corpus = emb.filter(copy_idx != 1)
        # p=16 keeps random (band, sig) collisions ~batch*corpus/2^16
        # per band — a bounded candidate set — while the exact clique
        # siblings collide in EVERY band at any p (theta ~ 0)
        kw = dict(num_planes=16, num_bands=4, dim=64)
        state_df = embedding_band_state(corpus, **kw)

        def _emb_lazy_counts(state):
            with dedup_common.plan_only_mode():
                return _plan_counts(
                    embedding_delta_pairs(
                        batch, state, corpus, threshold=0.9, **kw
                    )
                )

        legs = _run_bucket_sizing_sweep(
            spark, state_df, ("band", "sig"),
            probe_fn=lambda state: embedding_delta_pairs(
                batch, state, corpus, threshold=0.9, **kw
            ),
            lazy_counts_fn=_emb_lazy_counts,
            table_prefix="scale_emb_sizing", reps=reps,
            expected_pairs=2 * n_batch,
        )
        result |= {
            "n_batch": n_batch, "n_corpus": corpus.count(),
            "state_rows": state_df.count(),
            "legs": legs, "pairs_match": True,
        }
    elif op == "embedding_delta_loop":
        from facolos_data_pipelines_spark.operators.dedup import (
            embedding_band_state,
            embedding_dedup_delta,
            embedding_state_append,
        )

        # same regime as minhash_delta_loop: fixed ~2k-vector batch,
        # corpus (and its persisted band state) growing with sf. Planes
        # pinned at 12 (the store contract: sized for the target
        # corpus, auto rejected); production signature impl.
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_vec = emb.count()
        thin = max(1, n_vec // 5_000)
        batch = emb.filter(F.col("vec_id") % (2 * thin) == 1)
        corpus = emb.filter(F.col("vec_id") % 2 == 0)
        kw = dict(num_planes=12, num_bands=4, dim=64)
        state_path = f"/tmp/scale_emb_state_{os.getpid()}"
        shutil.rmtree(state_path, ignore_errors=True)
        t0 = time.monotonic()
        embedding_band_state(corpus, **kw).write.parquet(state_path)
        bootstrap_s = round(time.monotonic() - t0, 3)
        cycles, surv = [], None
        for _ in range(reps):
            t0 = time.monotonic()
            state = spark.read.parquet(state_path)
            surv = embedding_dedup_delta(
                batch, state, corpus, threshold=0.8, **kw
            )
            n_surv = surv.count()
            cycles.append({
                "delta_cycle_s": round(time.monotonic() - t0, 3),
                "survivors": n_surv,
            })
        t0 = time.monotonic()
        embedding_state_append(surv, **kw).write.mode("append").parquet(state_path)
        append_s = round(time.monotonic() - t0, 3)
        # consistency (the minhash leg's survivors_match_reference
        # twin): the persisted-state survivors must equal a recompute
        # that re-signs the corpus from vectors every cycle — timed as
        # the from-scratch cost the loop eliminates. The deeper
        # algebraic check (delta pairs == union-recompute cross pairs)
        # lives in tests/test_dedup_similarity.py.
        t0 = time.monotonic()
        ref = embedding_dedup_delta(
            batch, embedding_band_state(corpus, **kw), corpus,
            threshold=0.8, **kw,
        )
        n_ref = ref.count()
        scratch_s = round(time.monotonic() - t0, 3)
        assert n_ref == cycles[-1]["survivors"], (n_ref, cycles)
        mismatch = (
            surv.select("vec_id").exceptAll(ref.select("vec_id")).count()
        )
        assert mismatch == 0, mismatch
        result |= {
            "n_vectors": n_vec,
            "n_batch": batch.count(),
            "n_corpus": corpus.count(),
            "state_rows": spark.read.parquet(state_path).count(),
            "bootstrap_s": bootstrap_s,
            "cycles": cycles,
            "delta_median_s": statistics.median(
                c["delta_cycle_s"] for c in cycles
            ),
            "state_append_s": append_s,
            "from_scratch_s": scratch_s,
            "survivors_match_reference": True,
        }
        shutil.rmtree(state_path, ignore_errors=True)
    else:
        raise SystemExit(f"unknown op {op!r}")

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
