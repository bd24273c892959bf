"""A/B the r12 delta-dedup restructures against the r11 shapes, per SF.

VERDICT r12 item 6: at sf0.1 the tagged-pass / sign-once wins are
invisible under the ~0.3-0.4 s per-action floor; prove them where they
live — at sf1 — with one committed run. This script rebuilds the OLD
(r11, commit b83cecf) cycle shapes from the SAME public operators at
HEAD (minhash_delta_pairs / lsh_candidate_pairs /
verified_near_dup_pairs for minhash; embedding_delta_pairs + the
banded self-join for embeddings — the exact pre-0d4070d structure:
four eager executions per cycle, state signed from text at the entry),
runs OLD and NEW end-to-end in one JVM, interleaved A/B/A/B, asserts
the survivor sets are IDENTICAL, and prints per-shape medians.

    python scripts/bench_scale_delta_ab.py SF_DIR OP [reps]

OP: ``minhash`` (certified md5 16x4 config, doc parity split) or
``embedding`` (certified 6x4 planes, threshold 0.4, vec parity split).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _old_minhash_cycle(spark, docs):
    """The r11 shape: state signed from text, four eager executions
    (history candidates+verify via minhash_delta_pairs' checkpoint,
    internal candidates via lsh_candidate_pairs, eager internal
    losers), two signature pipelines."""
    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.operators.dedup import (
        minhash_band_state,
        minhash_delta_pairs,
    )
    from facolos_data_pipelines_spark.operators.dedup_common import materialize
    from facolos_data_pipelines_spark.operators.dedup_components import (
        _drop_pair_losers,
    )
    from facolos_data_pipelines_spark.operators.dedup_minhash import (
        lsh_candidate_pairs,
        verified_near_dup_pairs,
    )

    batch = docs.filter(F.col("doc_id") % 2 == 1)
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    state = minhash_band_state(hist, num_hashes=16, bands=4, family="md5")
    bb = minhash_band_state(batch, num_hashes=16, bands=4, family="md5")
    bb.persist()
    try:
        hp = minhash_delta_pairs(
            batch, state, hist, num_hashes=16, bands=4, threshold=0.8,
            family="md5", batch_buckets=bb,
        )
        hist_losers = materialize(
            hp.select(F.col("left_id").alias("doc_id")).dropDuplicates()
        )
        ipairs = lsh_candidate_pairs(bb, "doc_id")
        idups = verified_near_dup_pairs(
            batch, ipairs, "text", "doc_id", 3, 0.8
        )
        internal_survivors = _drop_pair_losers(
            batch, idups, "doc_id", transitive=False, eager=True
        )
        return internal_survivors.join(hist_losers, "doc_id", "left_anti").select(
            "doc_id"
        )
    finally:
        bb.unpersist()


def _new_minhash_cycle(spark, docs):
    """The r12/HEAD shape: corpus signed once (checkpoint), filter-
    split, one tagged candidate pass + one tagged verify pass."""
    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.operators.dedup import (
        minhash_band_state,
        minhash_dedup_delta,
    )
    from facolos_data_pipelines_spark.operators.dedup_common import materialize

    batch = docs.filter(F.col("doc_id") % 2 == 1)
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    allb = materialize(
        minhash_band_state(docs, num_hashes=16, bands=4, family="md5")
    )
    state = allb.filter(F.col("doc_id") % 2 == 0)
    return minhash_dedup_delta(
        batch, state, hist, num_hashes=16, bands=4, threshold=0.8,
        family="md5", batch_buckets=allb.filter(F.col("doc_id") % 2 == 1),
    ).select("doc_id")


def _old_embedding_cycle(spark, emb):
    """The r11 shape: history probe checkpoint + separate internal
    banded self-join checkpoint + eager internal losers."""
    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.operators.dedup_common import materialize
    from facolos_data_pipelines_spark.operators.dedup_components import (
        _drop_pair_losers,
    )
    from facolos_data_pipelines_spark.operators.dedup_embedding import (
        _normalized_vectors,
        _verified_cosine_pairs,
        embedding_band_state,
        embedding_delta_pairs,
    )

    batch = emb.filter(F.col("vec_id") % 2 == 1)
    hist = emb.filter(F.col("vec_id") % 2 == 0)
    state = embedding_band_state(hist, num_planes=6, num_bands=4, dim=64)
    sigs = embedding_band_state(batch, num_planes=6, num_bands=4, dim=64)
    sigs.persist()
    try:
        hp = embedding_delta_pairs(
            batch, state, hist, threshold=0.4, num_planes=6, num_bands=4,
            dim=64, batch_sigs=sigs,
        )
        hist_losers = materialize(
            hp.select(F.col("left_id").alias("vec_id")).dropDuplicates()
        )
        a = sigs.select(F.col("vec_id").alias("id_a"), "band", "sig")
        b = sigs.select(F.col("vec_id").alias("id_b"), "band", "sig")
        cand = materialize(
            a.join(b, ["band", "sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates()
        )
        iids = (
            cand.select(F.col("id_a").alias("vec_id"))
            .unionByName(cand.select(F.col("id_b").alias("vec_id")))
            .dropDuplicates()
        )
        sv = _normalized_vectors(
            batch.join(iids, "vec_id", "left_semi"), "embedding", "vec_id"
        )
        va = sv.select(F.col("vec_id").alias("id_a"), F.col("_sv").alias("va"))
        vb = sv.select(F.col("vec_id").alias("id_b"), F.col("_sv").alias("vb"))
        idups = _verified_cosine_pairs(cand, va, vb, "id_a", "id_b", 0.4)
        internal_survivors = _drop_pair_losers(
            batch, idups, "vec_id", transitive=False, eager=True
        )
        return internal_survivors.join(hist_losers, "vec_id", "left_anti").select(
            "vec_id"
        )
    finally:
        sigs.unpersist()


def _new_embedding_cycle(spark, emb):
    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.operators.dedup import (
        embedding_band_state,
        embedding_dedup_delta,
    )

    batch = emb.filter(F.col("vec_id") % 2 == 1)
    hist = emb.filter(F.col("vec_id") % 2 == 0)
    state = embedding_band_state(hist, num_planes=6, num_bands=4, dim=64)
    return embedding_dedup_delta(
        batch, state, hist, threshold=0.4, num_planes=6, num_bands=4, dim=64
    ).select("vec_id")


def _old_crosscorpus(spark, docs):
    """The pre-r12 shape: each side signs its own explode/window/md5
    chain (no precomputed band frames)."""
    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.operators.dedup import (
        minhash_cross_corpus_pairs,
    )

    return minhash_cross_corpus_pairs(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        num_hashes=16, bands=4, threshold=0.8, family="md5",
    ).select("left_id", "right_id")


def _new_crosscorpus(spark, docs):
    """The r12/HEAD query shape: ONE signing chain for the whole
    corpus, checkpointed, filter-split into the two sides."""
    from pyspark.sql import functions as F

    from facolos_data_pipelines_spark.operators.dedup import (
        minhash_band_state,
        minhash_cross_corpus_pairs,
    )
    from facolos_data_pipelines_spark.operators.dedup_common import materialize

    allb = materialize(
        minhash_band_state(docs, num_hashes=16, bands=4, family="md5")
    )
    return minhash_cross_corpus_pairs(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        num_hashes=16, bands=4, threshold=0.8, family="md5",
        left_buckets=allb.filter(F.col("doc_id") % 2 == 1),
        right_buckets=allb.filter(F.col("doc_id") % 2 == 0),
    ).select("left_id", "right_id")


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit("usage: bench_scale_delta_ab.py SF_DIR OP [reps]")
    sf_dir, op = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from facolos_data_pipelines_spark.session import build_spark, load_tables

    spark = build_spark(app_name=f"delta-ab-{op}")
    tables = load_tables(spark, sf_dir)
    for df in tables.values():
        df.count()

    if op == "minhash":
        src = tables["documents"]
        shapes = {"old": _old_minhash_cycle, "new": _new_minhash_cycle}
    elif op == "embedding":
        src = tables["embeddings"]
        shapes = {"old": _old_embedding_cycle, "new": _new_embedding_cycle}
    elif op == "crosscorpus":
        src = tables["documents"]
        shapes = {"old": _old_crosscorpus, "new": _new_crosscorpus}
    else:
        raise SystemExit(f"unknown op {op!r}")

    # equality first: identical survivor sets, by construction of the
    # restructure — assert it anyway on this exact data
    outs = {k: f(spark, src) for k, f in shapes.items()}
    rows = {k: {tuple(r) for r in df.collect()} for k, df in outs.items()}
    if rows["old"] != rows["new"]:
        raise SystemExit(
            f"survivor sets differ: old-only={sorted(rows['old'] - rows['new'])[:5]} "
            f"new-only={sorted(rows['new'] - rows['old'])[:5]}"
        )

    samples: dict[str, list[float]] = {k: [] for k in shapes}
    for _ in range(reps):
        for k, f in shapes.items():  # interleaved A/B/A/B
            spark.sparkContext.setJobDescription(f"{op}-{k}")
            t0 = time.time()
            f(spark, src).write.format("noop").mode("overwrite").save()
            samples[k].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    med = {k: round(statistics.median(v), 3) for k, v in samples.items()}
    print(
        json.dumps(
            {
                "op": op,
                "sf_dir": sf_dir,
                "reps": reps,
                "n_rows": len(rows["new"]),
                "medians": med,
                "all": {k: [round(x, 3) for x in v] for k, v in samples.items()},
                "new_over_old": round(med["new"] / med["old"], 3)
                if med["old"]
                else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
