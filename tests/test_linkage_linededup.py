"""Fuzzy record linkage (operators.linkage) and CCNet-style line-level
corpus dedup (operators.dedup.line_dedup)."""

import pytest
from pyspark.sql import functions as F

from facolos_data_pipelines_spark.operators import dedup
from facolos_data_pipelines_spark.operators.linkage import best_fuzzy_match, fuzzy_join


def test_fuzzy_join_blocked_levenshtein(spark):
    left = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "mary jones"), (3, "zzz unmatched")],
        ["l_id", "l_name"],
    )
    right = spark.createDataFrame(
        [
            (10, "jonathon smith"),   # distance 1 from l_id=1
            (11, "jonathan smith"),   # distance 0 from l_id=1
            (12, "mary janes"),       # distance 1 from l_id=2
            (13, "harry jones"),      # shares no 4-char block with left
        ],
        ["r_id", "r_name"],
    )
    out = fuzzy_join(left, right, "l_name", "r_name", max_distance=2).collect()
    pairs = {(r["l_id"], r["r_id"]): r["_distance"] for r in out}
    assert pairs == {(1, 10): 1, (1, 11): 0, (2, 12): 1}

    best = best_fuzzy_match(
        left, right, "l_id", "l_name", "r_id", "r_name", max_distance=2
    ).collect()
    assert {(r["l_id"], r["r_id"]) for r in best} == {(1, 11), (2, 12)}


def test_fuzzy_join_length_band_prunes_before_levenshtein(spark):
    # same block, but length differs by more than max_distance: the
    # candidate must be pruned by the band predicate (and would also
    # fail the distance test — the band is a cost guard, not semantics)
    left = spark.createDataFrame([(1, "abcd")], ["l_id", "l_name"])
    right = spark.createDataFrame([(2, "abcdefgh")], ["r_id", "r_name"])
    assert fuzzy_join(left, right, "l_name", "r_name", max_distance=2).count() == 0


def test_fuzzy_join_rejects_overlapping_columns(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "name"])
    with pytest.raises(ValueError, match="overlapping"):
        fuzzy_join(df, df, "name", "name")


def test_fuzzy_join_custom_block_on(spark):
    # soundex blocking catches a first-letter-preserving misspelling
    # that prefix blocking of the full string would still match, and
    # verifies the block_on injection point works
    left = spark.createDataFrame([(1, "smith")], ["l_id", "l_name"])
    right = spark.createDataFrame([(2, "smyth")], ["r_id", "r_name"])
    out = fuzzy_join(
        left,
        right,
        "l_name",
        "r_name",
        max_distance=2,
        block_on=(F.soundex(F.col("l_name")), F.soundex(F.col("r_name"))),
    ).collect()
    assert [(r["l_id"], r["r_id"], r["_distance"]) for r in out] == [(1, 2, 1)]


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "unique alpha\nSHARED BANNER\nunique beta"),
            (1, "SHARED BANNER\nunique gamma\n"),
            (2, "  SHARED BANNER  \nunique delta"),
            (3, "SHARED BANNER"),  # fully boilerplate
            (4, "solo line only"),
        ],
        ["doc_id", "text"],
    )


def test_line_dedup_drops_cross_doc_boilerplate(spark):
    out = {r["doc_id"]: r for r in dedup.line_dedup(_docs(spark), min_docs=2).collect()}
    assert out[0]["clean_text"] == "unique alpha\nunique beta"
    assert out[0]["n_lines_kept"] == 2 and out[0]["n_lines_dropped"] == 1
    # trailing empty line survives (structure preserved), boilerplate gone
    assert out[1]["clean_text"] == "unique gamma\n"
    assert out[1]["n_lines_kept"] == 2 and out[1]["n_lines_dropped"] == 1
    # match is on the TRIMMED form, output keeps the raw line
    assert out[2]["clean_text"] == "unique delta"
    # fully-boilerplate document keeps its row with empty text
    assert out[3]["clean_text"] == "" and out[3]["n_lines_kept"] == 0
    assert out[3]["n_lines_dropped"] == 1
    # untouched document round-trips byte-identically
    assert out[4]["clean_text"] == "solo line only"
    assert out[4]["n_lines_dropped"] == 0


def test_line_dedup_custom_sep_is_literal_not_regex(spark):
    docs = spark.createDataFrame(
        [(0, "keep me.common part"), (1, "common part.other text")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in dedup.line_dedup(docs, sep=".", min_docs=2).collect()
    }
    assert out == {0: "keep me", 1: "other text"}


def test_line_dedup_precomputed_frequencies(spark):
    docs = _docs(spark)
    freq = dedup.line_frequencies(docs)
    stats = {r["line"]: r["n_docs"] for r in freq.collect()}
    assert stats["SHARED BANNER"] == 4
    out = dedup.line_dedup(docs, min_docs=2, frequencies=freq)
    assert out.filter(F.col("doc_id") == 3).first()["clean_text"] == ""


def test_line_dedup_min_docs_validation(spark):
    with pytest.raises(ValueError, match="min_docs"):
        dedup.line_dedup(_docs(spark), min_docs=0)
    with pytest.raises(ValueError, match="fractional"):
        dedup.line_dedup(_docs(spark), min_docs=1.5)


def test_incremental_line_frequencies_equal_full_recompute(spark):
    """The distinct (line, doc) pair state folds new batches into
    corpus-exact frequencies — including a doc id recurring across
    batches (the case plain count-merging double-counts)."""
    docs = _docs(spark)
    batch1 = docs.filter(F.col("doc_id") <= 2)
    batch2 = docs.filter(F.col("doc_id") >= 2)  # doc 2 in BOTH batches
    state = dedup.line_doc_pairs(batch1)
    merged = state.unionByName(dedup.line_doc_pairs(batch2)).dropDuplicates(
        ["line", "doc"]
    )
    inc = {
        (r["line"], r["n_docs"])
        for r in dedup.pairs_to_frequencies(merged).collect()
    }
    full = {
        (r["line"], r["n_docs"]) for r in dedup.line_frequencies(docs).collect()
    }
    assert inc == full
    # and line_dedup over the incremental table matches the direct run
    direct = sorted(map(tuple, dedup.line_dedup(docs, min_docs=2).collect()))
    via_state = sorted(
        map(
            tuple,
            dedup.line_dedup(
                docs, min_docs=2, frequencies=dedup.pairs_to_frequencies(merged)
            ).collect(),
        )
    )
    assert direct == via_state


def test_line_dedup_fractional_threshold(spark):
    # 5 docs; "SHARED BANNER" is in 4 of them (80%). A 0.7 fraction
    # resolves in-plan to >= 3.5 docs and drops it; 0.9 keeps it.
    docs = _docs(spark)
    dropped = {
        r["doc_id"]: r["n_lines_dropped"]
        for r in dedup.line_dedup(docs, min_docs=0.7).collect()
    }
    assert dropped[0] == 1 and dropped[3] == 1
    kept_all = dedup.line_dedup(docs, min_docs=0.9)
    assert kept_all.agg(F.sum("n_lines_dropped")).first()[0] == 0


def test_line_dedup_null_text_doc_is_kept(spark):
    docs = spark.createDataFrame(
        [(0, "shared\nown"), (1, "shared"), (2, None)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in dedup.line_dedup(docs, min_docs=2).collect()}
    assert set(out) == {0, 1, 2}, "NULL-text doc must not vanish from the output"
    assert out[2]["clean_text"] == "" and out[2]["n_lines_dropped"] == 0
    assert out[0]["clean_text"] == "own"


def test_line_dedup_fractional_with_precomputed_freq_needs_corpus_docs(spark):
    docs = _docs(spark)
    freq = dedup.line_frequencies(docs)
    with pytest.raises(ValueError, match="corpus_docs"):
        dedup.line_dedup(docs.limit(2), min_docs=0.5, frequencies=freq)
    # with the corpus count supplied, the threshold resolves against the
    # CORPUS (5 docs * 0.7 = 3.5), not the 2-doc batch
    out = dedup.line_dedup(
        docs.filter(F.col("doc_id") <= 1),
        min_docs=0.7,
        frequencies=freq,
        corpus_docs=5,
    )
    dropped = {r["doc_id"]: r["n_lines_dropped"] for r in out.collect()}
    assert dropped == {0: 1, 1: 1}  # SHARED BANNER (4/5 docs) dropped


def test_fuzzy_join_rejects_internal_column_clash(spark):
    left = spark.createDataFrame([(1, "abc", 0)], ["l_id", "l_name", "_distance"])
    right = spark.createDataFrame([(2, "abc")], ["r_id", "r_name"])
    with pytest.raises(ValueError, match="internal working columns"):
        fuzzy_join(left, right, "l_name", "r_name")


def test_unigram_logprob_scores(spark):
    from facolos_data_pipelines_spark.operators.text import unigram_logprob_scores

    docs = spark.createDataFrame(
        [
            (0, "common common common rare"),
            (1, "common common"),
            (2, ""),  # zero words: row kept, NULL score
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in unigram_logprob_scores(docs).collect()}
    assert set(out) == {0, 1, 2}
    assert out[2]["n_words"] == 0 and out[2]["avg_logprob"] is None
    # corpus: common x5, rare x1; total 6, |V| 2 -> p(common)=(5.5/7),
    # p(rare)=(1.5/7); the all-common doc must outscore the one with rare
    assert out[1]["avg_logprob"] > out[0]["avg_logprob"]
    import math

    assert out[1]["avg_logprob"] == pytest.approx(
        round(math.log(5.5 / 7.0) + 1e-9, 4), abs=1e-9
    )
    with pytest.raises(ValueError, match="smoothing"):
        unigram_logprob_scores(docs, smoothing=0.0)


def test_line_dedup_rejects_nonpositive_corpus_docs(spark):
    docs = _docs(spark)
    freq = dedup.line_frequencies(docs)
    with pytest.raises(ValueError, match="corpus_docs=0"):
        dedup.line_dedup(docs, min_docs=0.5, frequencies=freq, corpus_docs=0)


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_LINE = st.text(
    alphabet=st.sampled_from("ab x"), min_size=0, max_size=6
).map(str.strip)
_DOC = st.lists(_LINE, min_size=0, max_size=5).map("\n".join)


@settings(max_examples=10, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_line_dedup_conserves_lines_and_identity(spark, docs_texts):
    docs = spark.createDataFrame(
        list(enumerate(docs_texts)), ["doc_id", "text"]
    )
    out = dedup.line_dedup(docs, min_docs=2).collect()
    # every document keeps its row; kept + dropped == split line count
    assert len(out) == len(docs_texts)
    for r in out:
        total = len(docs_texts[r["doc_id"]].split("\n"))
        assert r["n_lines_kept"] + r["n_lines_dropped"] == total
    # a threshold no corpus line can reach makes the op the identity
    ident = dedup.line_dedup(docs, min_docs=len(docs_texts) + 1).collect()
    for r in ident:
        assert r["clean_text"] == docs_texts[r["doc_id"]]
        assert r["n_lines_dropped"] == 0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.text(alphabet="abcd", min_size=1, max_size=6),
             min_size=1, max_size=5),
    st.lists(st.text(alphabet="abcd", min_size=1, max_size=6),
             min_size=1, max_size=5),
)
def test_fuzzy_join_pairs_satisfy_contract(spark, lefts, rights):
    left = spark.createDataFrame(
        [(i, s) for i, s in enumerate(lefts)], ["l_id", "l_name"]
    )
    right = spark.createDataFrame(
        [(i, s) for i, s in enumerate(rights)], ["r_id", "r_name"]
    )
    out = fuzzy_join(left, right, "l_name", "r_name",
                     max_distance=1, block_prefix=1).collect()

    def dist(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    found = {(r["l_id"], r["r_id"]) for r in out}
    for r in out:
        a, b = lefts[r["l_id"]], rights[r["r_id"]]
        assert r["_distance"] == dist(a, b) <= 1
        assert a[:1].lower() == b[:1].lower()
    # completeness within the block: every same-block pair at distance
    # <= 1 must be found (the band never prunes a true match)
    for i, a in enumerate(lefts):
        for j, b in enumerate(rights):
            if a[:1].lower() == b[:1].lower() and dist(a, b) <= 1:
                assert (i, j) in found


def test_fuzzy_join_max_block_size_caps_hot_blocks(spark):
    left = spark.createDataFrame([(1, "aaa"), (2, "zzz")], ["l_id", "l_name"])
    right = spark.createDataFrame(
        [(i, "aa" + c) for i, c in enumerate("abcd")]  # 4-row hot 'a' block
        + [(9, "zzz")],
        ["r_id", "r_name"],
    )
    capped = fuzzy_join(
        left, right, "l_name", "r_name", max_distance=1, block_prefix=1,
        max_block_size=3,
    ).collect()
    # the oversized 'a' block is dropped entirely; the small one survives
    assert {(r["l_id"], r["r_id"]) for r in capped} == {(2, 9)}
    with pytest.raises(ValueError, match="max_block_size"):
        fuzzy_join(left, right, "l_name", "r_name", max_block_size=0)
