"""Round-5 curation operators: SemDeDup cluster-dedup, substring-level
duplicated spans, Bloom-prefiltered decontamination, split-leakage gate."""

import pytest
from pyspark.sql import functions as F

from facolos_data_pipelines_spark.operators.dedup import (
    duplicate_gram_spans,
    semantic_dedup,
    semantic_dedup_pairs,
    substring_dedup,
)
from facolos_data_pipelines_spark.operators.sampling import split_leakage_check
from facolos_data_pipelines_spark.operators.text import (
    bloom_bitmap,
    bloom_might_contain,
    decontaminate,
    decontaminate_bloom,
)


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------

def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cent_df(spark, rows):
    return spark.createDataFrame(rows, "cluster_id int, centroid array<double>")


def test_semantic_dedup_drops_within_cluster_near_dups_only(spark):
    # two well-separated clusters; 1&2 are near-dups in cluster A,
    # 10 is alone in B; 3 is in A but orthogonal-ish to 1/2
    emb = _vec_df(spark, [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.7, 0.7, 0.0]),
        (10, [0.0, 0.0, 1.0]),
    ])
    cents = _cent_df(spark, [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0])])
    pairs = semantic_dedup_pairs(emb, cents, threshold=0.95)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2)}
    survivors = {r["vec_id"] for r in semantic_dedup(emb, cents, threshold=0.95).collect()}
    assert survivors == {1, 3, 10}


def test_semantic_dedup_never_pairs_across_clusters(spark):
    # identical vectors forced into different cells by nearest centroid
    # never pair — the documented recall trade of cluster blocking
    emb = _vec_df(spark, [(1, [1.0, 0.05, 0.0]), (2, [1.0, -0.05, 0.0])])
    cents = _cent_df(spark, [(0, [1.0, 0.1, 0.0]), (1, [1.0, -0.1, 0.0])])
    assert semantic_dedup_pairs(emb, cents, threshold=0.5).count() == 0


def test_semantic_dedup_zero_norm_vectors_survive_unpaired(spark):
    emb = _vec_df(spark, [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])])
    cents = _cent_df(spark, [(0, [1.0, 0.0])])
    survivors = {r["vec_id"] for r in semantic_dedup(emb, cents, threshold=0.99).collect()}
    assert survivors == {1, 2}


def test_semantic_dedup_max_cluster_size_drops_oversized_cells(spark):
    emb = _vec_df(spark, [(i, [1.0, 0.0]) for i in range(5)])
    cents = _cent_df(spark, [(0, [1.0, 0.0])])
    # the only cell has 5 members > cap 4 -> no pairs computed at all
    assert (
        semantic_dedup_pairs(emb, cents, threshold=0.9, max_cluster_size=4).count()
        == 0
    )


def test_semantic_dedup_trains_codebook_when_none_given(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(emb, None, threshold=0.3, k=4)
    n, total = out.count(), emb.count()
    assert 0 < n <= total
    assert out.columns == emb.columns


def test_semantic_dedup_transitive_keeps_one_per_component(spark):
    emb = _vec_df(spark, [
        (1, [1.0, 0.0]), (2, [0.999, 0.02]), (3, [0.995, 0.04]),
    ])
    cents = _cent_df(spark, [(0, [1.0, 0.0])])
    survivors = {
        r["vec_id"]
        for r in semantic_dedup(emb, cents, threshold=0.99, transitive=True).collect()
    }
    assert survivors == {1}


# ---------------------------------------------------------------------------
# Duplicated substrings (Lee et al. spans)
# ---------------------------------------------------------------------------

def test_duplicate_spans_bounds_and_merge(spark):
    shared = "alpha beta gamma delta epsilon"  # 5 words, one 5-gram
    docs = spark.createDataFrame(
        [
            (1, f"unique one two {shared} tail words here"),
            (2, f"{shared} entirely different ending"),
            (3, "no duplication at all in this document"),
        ],
        "doc_id long, text string",
    )
    spans = {r["doc_id"]: (r["span_start"], r["span_end"], r["n_dup_grams"])
             for r in duplicate_gram_spans(docs, n=5).collect()}
    # doc 1: shared starts at word index 3 -> span [3, 7]
    assert spans[1] == (3, 7, 1)
    # doc 2: shared at the front -> span [0, 4]
    assert spans[2] == (0, 4, 1)
    assert 3 not in spans


def test_duplicate_spans_adjacent_grams_merge_gaps_split(spark):
    # 6 shared words -> two overlapping 5-grams merge into ONE span
    shared = "a1 a2 a3 a4 a5 a6"
    docs = spark.createDataFrame(
        [(1, shared), (2, f"{shared} x y z w v u t s r q {shared}")],
        "doc_id long, text string",
    )
    rows = duplicate_gram_spans(docs, n=5).filter(F.col("doc_id") == 2).collect()
    spans = sorted((r["span_start"], r["span_end"]) for r in rows)
    # two islands: front [0,5] and back [16,21] (10 unshared words apart)
    assert spans == [(0, 5), (16, 21)]


def test_duplicate_spans_short_doc_whole_text_fallback(spark):
    docs = spark.createDataFrame(
        [(1, "tiny dup"), (2, "tiny dup"), (3, "other words")],
        "doc_id long, text string",
    )
    spans = {r["doc_id"]: (r["span_start"], r["span_end"])
             for r in duplicate_gram_spans(docs, n=5).collect()}
    # 2-word docs: single whole-doc gram, end capped at last word (1)
    assert spans == {1: (0, 1), 2: (0, 1)}


def test_substring_dedup_drops_mostly_duplicated_docs(spark):
    shared = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, shared),                                   # 100% duplicated
            (2, f"{shared} plus a few extra words here"),  # ~74% duplicated
            (3, "completely original text " + " ".join(f"u{i}" for i in range(16))),
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in substring_dedup(docs, n=5, max_coverage=0.8).collect()}
    assert kept == {2, 3}
    kept_strict = {r["doc_id"] for r in substring_dedup(docs, n=5, max_coverage=0.5).collect()}
    assert kept_strict == {3}


# ---------------------------------------------------------------------------
# Bloom decontamination
# ---------------------------------------------------------------------------

def test_bloom_bitmap_has_no_false_negatives(spark):
    grams = spark.createDataFrame(
        [(f"gram number {i}",) for i in range(200)], "_g string"
    )
    m_bits, k = 1 << 12, 3
    bm = bloom_bitmap(grams, "_g", m_bits, k)
    assert len(bm) == m_bits // 64
    bm_df = spark.createDataFrame([(bm,)], "_bm array<long>")
    hits = (
        grams.crossJoin(F.broadcast(bm_df))
        .filter(bloom_might_contain(F.col("_bm"), F.col("_g"), m_bits, k))
        .count()
    )
    assert hits == 200  # every inserted value tests positive


def test_bloom_bitmap_rejects_unaligned_m():
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitmap(None, m_bits=100)


def test_decontaminate_bloom_equals_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    exact = decontaminate(docs, bench, n=3)
    bloom = decontaminate_bloom(docs, bench, n=3)
    assert exact.exceptAll(bloom).count() == 0
    assert bloom.exceptAll(exact).count() == 0


def test_decontaminate_bloom_no_confirm_errs_toward_flagging(spark, sf_dir):
    # without the confirm join, false positives may ADD flags but can
    # never clear one (no false negatives): flagged set is a superset
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    exact = decontaminate(docs, bench, n=3).filter("contaminated").select("doc_id")
    loose = (
        decontaminate_bloom(docs, bench, n=3, exact_confirm=False, m_bits=1 << 10)
        .filter("contaminated")
        .select("doc_id")
    )
    assert exact.exceptAll(loose).count() == 0  # exact ⊆ loose


# ---------------------------------------------------------------------------
# Split leakage
# ---------------------------------------------------------------------------

def test_split_leakage_finds_planted_cross_split_duplicate(spark):
    # many ids with identical text: some land train, some val/test
    docs = spark.createDataFrame(
        [(i, "the same exact document text") for i in range(40)]
        + [(100 + i, f"unique doc {i}") for i in range(10)],
        "doc_id long, text string",
    )
    leaks = split_leakage_check(docs).collect()
    assert len(leaks) > 0
    for r in leaks:
        assert r["split"] != "train"
        assert r["n_train_dups"] >= 1
        assert r["doc_id"] < 40  # only the cloned text leaks
    # witness is the smallest colliding train id -> constant across rows
    assert len({r["train_dup_id"] for r in leaks}) == 1


def test_split_leakage_clean_corpus_is_empty(spark):
    docs = spark.createDataFrame(
        [(i, f"completely unique document number {i}") for i in range(50)],
        "doc_id long, text string",
    )
    assert split_leakage_check(docs).count() == 0


def test_split_leakage_normalization_catches_formatting_noise(spark):
    docs = spark.createDataFrame(
        [(i, "Shared TEXT, with punctuation!" if i % 2 == 0 else f"u {i}")
         for i in range(40)],
        "doc_id long, text string",
    )
    leaks = split_leakage_check(docs, portable_hash=True).collect()
    # the even ids share normalized content regardless of case/punct
    assert all(r["doc_id"] % 2 == 0 for r in leaks)
    assert len(leaks) > 0


# ---------------------------------------------------------------------------
# Span stripping (Lee et al. removal action)
# ---------------------------------------------------------------------------

def test_strip_duplicate_spans_keeps_first_doc_occurrence(spark):
    from facolos_data_pipelines_spark.operators.dedup import strip_duplicate_spans

    shared = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} unique tail"),
            (2, f"front words {shared}"),
            (3, "nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in strip_duplicate_spans(docs, n=5).collect()}
    # doc 1 is the min-id owner: keeps the span
    assert out[1]["clean_text"] == "alpha beta gamma delta epsilon unique tail"
    assert out[1]["n_words_removed"] == 0
    # doc 2 loses exactly the 5 shared words
    assert out[2]["clean_text"] == "front words"
    assert out[2]["n_words_removed"] == 5
    assert out[3]["n_words_removed"] == 0


def test_strip_duplicate_spans_scrub_everywhere(spark):
    from facolos_data_pipelines_spark.operators.dedup import strip_duplicate_spans

    shared = "one two three four five"
    docs = spark.createDataFrame(
        [(1, shared), (2, f"{shared} extra")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           strip_duplicate_spans(docs, n=5, keep_first_doc=False).collect()}
    # fully-duplicated doc 1 strips to empty but still gets a row
    assert out[1]["clean_text"] == ""
    assert out[1]["n_words_kept"] == 0
    assert out[2]["clean_text"] == "extra"


def test_strip_duplicate_spans_word_counts_are_consistent(spark, sf_dir):
    from facolos_data_pipelines_spark.operators.dedup import strip_duplicate_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = strip_duplicate_spans(docs, n=5)
    bad = out.filter(
        (F.col("n_words_kept") < 0)
        | (F.col("n_words_removed") < 0)
        | (F.size(F.split(F.col("clean_text"), " ")) > F.col("n_words_kept") + 1)
    )
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# Cross-operator invariants
# ---------------------------------------------------------------------------

def test_span_report_coverage_equals_scrub_removal(spark, sf_dir):
    """duplicate_gram_spans' merged islands cover EXACTLY the word
    positions strip_duplicate_spans(keep_first_doc=False) removes: the
    per-doc sum of span lengths equals n_words_removed. Ties the two
    formulations (report vs rebuild) to one contract."""
    from facolos_data_pipelines_spark.operators.dedup import (
        duplicate_gram_spans,
        strip_duplicate_spans,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = (
        duplicate_gram_spans(docs, n=5)
        .groupBy("doc_id")
        .agg(F.sum(F.col("span_end") - F.col("span_start") + 1).alias("covered"))
    )
    removed = strip_duplicate_spans(docs, n=5, keep_first_doc=False).select(
        "doc_id", "n_words_removed"
    )
    joined = removed.join(spans, "doc_id", "left").withColumn(
        "covered", F.coalesce("covered", F.lit(0))
    )
    mismatches = joined.filter(F.col("covered") != F.col("n_words_removed")).count()
    assert mismatches == 0


def test_semantic_dedup_pairs_subset_of_exact_allpairs(spark, sf_dir):
    """Cluster blocking can only LOSE pairs (recall trade), never
    invent them: every SemDeDup pair is in the exact all-pairs set at
    the same threshold, with the same cosine."""
    from facolos_data_pipelines_spark.operators.dedup import (
        embedding_near_dup_pairs,
        semantic_dedup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster_id"), F.col("embedding").alias("centroid")
    )
    sem = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(emb, cents, threshold=0.3).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, threshold=0.3, num_planes=0).collect()
    }
    assert sem <= exact
    assert len(sem) > 0


def test_leakage_safe_split_components_cotravel(spark):
    """leakage_safe_split: every member of a near-dup component gets the
    SAME split; docs in no pair fall back to their own id and match the
    plain hash_split assignment; deterministic across calls."""
    from facolos_data_pipelines_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # two components: {0,1,2,3} (a chain) and {10,11}; rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = leakage_safe_split(docs, pairs, keep_group=True)
    rows = {r["doc_id"]: (r["split"], r["_leak_group"]) for r in out.collect()}
    assert len(rows) == 40
    # co-travel: one split per component, keyed by the min member id
    assert {rows[i] for i in (0, 1, 2, 3)} == {rows[0]} and rows[0][1] == 0
    assert {rows[i] for i in (10, 11)} == {rows[10]} and rows[10][1] == 10
    # singletons: own id as group, identical to plain hash_split
    plain = {
        r["doc_id"]: r["split"] for r in hash_split(docs).collect()
    }
    for i in range(40):
        if i not in (0, 1, 2, 3, 10, 11):
            assert rows[i] == (plain[i], i)
    # deterministic
    again = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, pairs).collect()
    }
    assert again == {k: v[0] for k, v in rows.items()}


def test_leakage_safe_split_kills_split_leakage(spark):
    """Composition check: near-dup pairs that straddle splits under
    plain hash_split cannot straddle under leakage_safe_split — the
    whole point of the operator."""
    from facolos_data_pipelines_spark.operators.sampling import (
        leakage_safe_split,
    )

    # exact duplicate texts => same-component docs with ids spread out
    docs = spark.createDataFrame(
        [(i, f"unique text {i}") for i in range(100)]
        + [(100 + i, f"unique text {i}") for i in range(100)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(i, 100 + i) for i in range(100)], "id_a long, id_b long"
    )
    out = leakage_safe_split(docs, pairs, splits={"train": 0.5, "val": 0.5})
    by_id = {r["doc_id"]: r["split"] for r in out.collect()}
    straddles = [i for i in range(100) if by_id[i] != by_id[100 + i]]
    assert straddles == []
    # both splits are actually populated (50/50 over 100 components)
    assert {"train", "val"} == set(by_id.values())
