"""Exact dedup and MinHash+LSH near-dup (shingling, signatures, banded
buckets, candidate verification) — the one-shuffle-per-stage 100 TB text
dedup path. Split from dedup.py; operators.dedup re-exports the surface."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup_common import (
    _MINHASH_A,
    _MINHASH_B,
    _ansi_enabled,
    _check_lanes,
    _resolve_family,
)
from .dedup_components import _drop_pair_losers


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact content value (hash-groupBy).

    Grouping key is xxhash64(text) + length — collision-safe enough at
    trillions of docs while shuffling 12 bytes instead of full text;
    the min-id winner rule is deterministic.
    """
    w = Window.partitionBy(F.xxhash64(F.col(text_col)), F.length(text_col)).orderBy(
        F.col(id_col).asc()
    )
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# Shingling + MinHash + LSH
# ---------------------------------------------------------------------------

def normalized_words(text_col: str | Column) -> Column:
    """Lowercase, strip punctuation, split to words, drop empties.

    Single regexp split on non-alphanumeric runs (one JVM pass); the
    interpreted filter only touches the at-most-two empty edge tokens.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), r"[^\p{L}\p{N}]+"), lambda x: x != "")


def word_shingles(text_col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    Built from ``transform`` over index positions — no explode, no UDF;
    documents shorter than n words contribute their full word join as a
    single shingle so they still participate.
    """
    words = normalized_words(text_col)
    k = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    # Empty documents would otherwise emit a single "" shingle and all
    # collide with each other; exact dedup owns identical-content cases.
    return F.filter(F.array_distinct(grams), lambda x: x != "")


def exploded_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    distinct: bool = True,
    carry_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """(id, _sh) rows of word n-gram shingles — the explode-side twin of
    :func:`word_shingles` (same shingle sets: short docs contribute
    their full word join; empty docs drop out).

    Built as posexplode + ``lead`` over a per-document window instead
    of the array-slice ``transform``: the window path is whole-stage
    codegen while nested higher-order functions fall back to
    interpreted eval — measured 6.5x faster over the sf0.1 corpus.
    Costs one shuffle on ``id_col`` (which downstream per-doc
    aggregations reuse); ``distinct=True`` adds the per-doc dedup the
    array form got from ``array_distinct``.

    ``carry_cols`` names per-document columns to ride along on every
    shingle row (they must be constant per ``id_col`` — e.g. a
    membership tag) so a caller that needs a gram pass over two
    overlapping corpus slices can run ONE explode instead of two
    (dsir_logratio_weights' tagged histogram).
    """
    carry = list(carry_cols)
    # internal names of this function's explode/window pipeline — a
    # colliding carry column would silently corrupt the window ordering
    # or the shingle text (ADVICE r12)
    reserved = {"_pos", "_w", "_sh"} | {f"_w{j}" for j in range(1, max(shingle_n, 1))}
    bad = sorted(set(carry) & reserved)
    if bad:
        raise ValueError(
            f"exploded_shingles: carry_cols {bad} collide with internal "
            "column names ('_pos', '_w', '_w1'.., '_sh'); rename them first"
        )
    w = df.select(
        F.col(id_col),
        *carry,
        F.posexplode(normalized_words(text_col)).alias("_pos", "_w"),
    )
    if shingle_n <= 1:
        sh = w.select(id_col, *carry, F.col("_w").alias("_sh"))
    else:
        win = Window.partitionBy(id_col).orderBy("_pos")
        leads = [F.lead("_w", j).over(win).alias(f"_w{j}") for j in range(1, shingle_n)]
        sh = (
            w.select(id_col, *carry, "_pos", "_w", *leads)
            .filter(F.col(f"_w{shingle_n - 1}").isNotNull() | (F.col("_pos") == 0))
            .select(
                id_col,
                *carry,
                F.concat_ws(" ", "_w", *[f"_w{j}" for j in range(1, shingle_n)]).alias(
                    "_sh"
                ),
            )
        )
    return sh.dropDuplicates([id_col, "_sh"]) if distinct else sh


def shingle_arrays(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """(id, _shingles) — each doc's DISTINCT shingle set as an array,
    built on the explode + lead-window codegen path and re-assembled
    with one ``collect_set`` aggregate (reusing the window's id
    partitioning: one shuffle total).

    Set-identical to ``word_shingles`` (the per-row transform form):
    the element ORDER differs, which is irrelevant to every consumer —
    the verification stages only take ``size(array_intersect/union)``.
    WHEN to use which (both directions measured, r13): this form wins
    where ONE frame feeds BOTH sides of a verify join
    (verified_near_dup_pairs: the interpreted transform used to run
    twice over the candidates, and the exploded subtree is planned
    once — minhash_dedup 3.7 -> 3.0 s); the narrow ``word_shingles``
    transform wins where each side is built once over id-pruned docs
    (the delta/cross verify sites — swapping them measured 1.3-1.9x
    SLOWER because the explode path adds a window shuffle per side)."""
    sh = exploded_shingles(df, text_col, id_col, shingle_n, distinct=False)
    return sh.groupBy(id_col).agg(F.collect_set("_sh").alias("_shingles"))


def minhash_signature(
    shingles: Column, num_hashes: int = 32, family: str = "multiply_add"
) -> Column:
    """MinHash signature as a single column expression. Returns an
    array of length num_hashes — array<long> for the multiply_add /
    xxhash families, array<string> (32-char md5 hex) for the portable
    md5 family; a persisted signature store must pin ONE family and
    its schema.

    ``family`` selects the hash family (see :data:`MINHASH_FAMILIES`);
    the default ``multiply_add`` (lane i = min of
    ``a_i * xxhash64(shingle) + b_i`` over Z/2^64) REQUIRES a non-ANSI
    session — if the active session is known and has ANSI enabled this
    raises at expression-build time rather than ArithmeticException at
    run time; pass ``family='xxhash'`` on ANSI sessions. Never mix
    signatures computed under different families.

    NOTE: as a single column expression this inlines the shingle
    computation ``num_hashes`` times (Catalyst's CollapseProject undoes
    withColumn staging) — use :func:`minhash_signatures` for the
    DataFrame path, which computes each shingle hash exactly once.
    """
    from pyspark.sql import SparkSession

    _check_lanes(num_hashes)
    active = SparkSession.getActiveSession()
    # No active session -> the conf is unknowable; assume ANSI (strict),
    # matching _ansi_enabled's fail-safe direction, so we never build a
    # wrap-arithmetic expression that could throw at run time. Callers
    # who know their session is non-ANSI can pass family explicitly
    # after creating/activating the session.
    ansi = (
        active is None
        or active.conf.get("spark.sql.ansi.enabled", "false") == "true"
    )
    family = _resolve_family(family, ansi)

    if family == "md5":
        return F.array(
            *[
                F.array_min(
                    F.transform(
                        shingles, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s))
                    )
                )
                for i in range(num_hashes)
            ]
        )
    if family == "xxhash":
        return F.array(
            *[
                F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(s, F.lit(i))))
                for i in range(num_hashes)
            ]
        )

    def _mix(i: int):
        a, b = F.lit(_MINHASH_A[i]), F.lit(_MINHASH_B[i])
        return lambda h: h * a + b

    base = F.transform(shingles, lambda s: F.xxhash64(s))
    return F.array(
        *[F.array_min(F.transform(base, _mix(i))) for i in range(num_hashes)]
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    family: str = "multiply_add",
) -> DataFrame:
    """(id, sig: array<long>) via posexplode + lead-window + min-aggregate.

    Shingles are assembled from exploded words with ``lead`` over a
    per-document window (codegen'd; measured 2x faster than the
    interpreted array-slice transform) and each shingle is hashed
    ``num_hashes`` times exactly once (the column-expression variant
    re-derives the shingle array per hash — a 100-1000x plan blowup).
    Duplicate shingles are NOT deduped — the min-aggregate makes them
    harmless and skipping the distinct saves a shuffle. The window and
    the group-by share the same hash partitioning on id, so the whole
    signature computation costs ONE shuffle of the tokenized corpus.
    Empty documents (no words) drop out, which is correct — they have
    no content to near-match and are handled by exact dedup.

    Short documents (< shingle_n words) contribute their full word join
    as a single shingle (same rule as :func:`word_shingles`).

    ``family`` pins the hash family explicitly (see
    :data:`MINHASH_FAMILIES`); the default ``multiply_add`` raises a
    clear ValueError on ANSI sessions instead of silently switching —
    signatures from different families never match each other.
    """
    w = df.select(
        F.col(id_col), F.posexplode(normalized_words(text_col)).alias("_pos", "_w")
    )
    if shingle_n <= 1:
        sh = w.select(id_col, F.col("_w").alias("_sh"))
    else:
        win = Window.partitionBy(id_col).orderBy("_pos")
        leads = [F.lead("_w", j).over(win).alias(f"_w{j}") for j in range(1, shingle_n)]
        sh = (
            w.select(id_col, "_pos", "_w", *leads)
            # full-length shingles only, except the pos-0 one for short docs
            # (concat_ws skips the NULL tail, yielding the full word join)
            .filter(F.col(f"_w{shingle_n - 1}").isNotNull() | (F.col("_pos") == 0))
            .select(
                id_col,
                F.concat_ws(
                    " ", "_w", *[f"_w{j}" for j in range(1, shingle_n)]
                ).alias("_sh"),
            )
        )
    # Hash the shingle string ONCE, then derive every MinHash lane with
    # a 2-universal multiply-add over the 64-bit hash — 1 string hash +
    # num_hashes long mul/adds per shingle instead of num_hashes string
    # hashes (smaller codegen unit, ~3x faster at 32 lanes). The wrap
    # arithmetic throws under ANSI, so the multiply_add family is
    # rejected up front there; 'xxhash' is the (slower, equally
    # correct) per-lane seeded string hash valid on any session.
    _check_lanes(num_hashes)
    family = _resolve_family(family, _ansi_enabled(df))
    if family == "md5":
        hashed = sh.select(
            id_col,
            *[
                F.md5(F.concat(F.lit(f"{i}:"), F.col("_sh"))).alias(f"_h{i}")
                for i in range(num_hashes)
            ],
        )
    elif family == "xxhash":
        hashed = sh.select(
            id_col,
            *[F.xxhash64("_sh", F.lit(i)).alias(f"_h{i}") for i in range(num_hashes)],
        )
    else:
        hashed = sh.select(id_col, F.xxhash64("_sh").alias("_h")).select(
            id_col,
            *[
                (F.col("_h") * F.lit(_MINHASH_A[i]) + F.lit(_MINHASH_B[i])).alias(f"_h{i}")
                for i in range(num_hashes)
            ],
        )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"_h{i}").alias(f"_h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        id_col, F.array(*[f"_h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    family: str = "multiply_add",
) -> DataFrame:
    """Explode each doc into (band_id, band_hash) bucket keys.

    bands=8 over 32 hashes -> rows-per-band r=4: collision prob
    1-(1-j^4)^8, ~0.5 crossover at Jaccard ≈ 0.6. Output columns:
    id_col, band_id, band_hash. One narrow pass + explode; the
    downstream group-by shuffles only (id, band) pairs. ``family``
    pins the MinHash hash family (see :data:`MINHASH_FAMILIES`) —
    buckets from different families never match.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n, family)
    banded = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.xxhash64(
                F.array_join(
                    F.transform(
                        F.slice(F.col("sig"), b * rows + 1, rows),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("band_hash"),
        ),
    )
    return sigs.select(F.col(id_col), F.explode(banded).alias("b")).select(
        id_col, F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash")
    )


def lsh_candidate_pairs(
    buckets: DataFrame, id_col: str = "doc_id", max_bucket_size: int | None = None
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band bucket.

    Self-join within buckets only — the whole point of LSH: comparisons
    are bucket-local. Hot buckets (boilerplate text) are the skew risk:
    AQE skew-join splitting handles moderate skew;
    ``max_bucket_size`` drops buckets larger than the cap entirely
    (standard practice — a bucket shared by thousands of documents is
    template/boilerplate collision, and its members still pair up in
    their other, more selective bands). The cap turns the worst-case
    Σ size² self-join into Σ min(size, cap)².
    """
    if max_bucket_size is not None:
        from .skew import drop_oversized_groups

        buckets = drop_oversized_groups(
            buckets, ["band_id", "band_hash"], max_bucket_size
        )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def verified_near_dup_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Verify LSH candidates with exact n-gram Jaccard
    (array_intersect/array_union over distinct shingles). Returns
    (id_a, id_b, jaccard) for pairs >= threshold.

    Shingle arrays are computed only for documents that appear in a
    candidate pair (semi-join first) — LSH typically surfaces <<1% of
    the corpus, so verification cost is proportional to candidates,
    not corpus size."""
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .dropDuplicates()
    )
    # explode-path shingle arrays (shingle_arrays): ~2x faster than the
    # interpreted word_shingles transform when candidates are dense
    # (r13 A/B); identical sets, and only set sizes are consumed below
    sh = shingle_arrays(
        df.join(cand_ids, id_col, "left_semi"), text_col, id_col, shingle_n
    )
    joined = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_shingles", "sh_b"), "id_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return joined.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    transitive: bool = False,
    max_bucket_size: int | None = None,
    family: str = "multiply_add",
    score_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """End-to-end MinHash near-dedup: LSH buckets -> candidate pairs ->
    Jaccard verify -> drop duplicates, keeping the lowest id — or,
    with ``score_col``, the BEST-scoring member of each single-link
    cluster (:func:`keep_best_per_cluster`; implies transitive
    resolution).
    ``max_bucket_size`` caps pathological LSH buckets (see
    :func:`lsh_candidate_pairs`). ``family`` pins the MinHash hash
    family (:data:`MINHASH_FAMILIES`); since this operator both
    computes and consumes the signatures within one job, either family
    gives the same dedup semantics — ``multiply_add`` is faster but
    needs a non-ANSI session, ``xxhash`` runs anywhere.

    ``transitive=False`` (default) does one sweep — b survives only if
    not matched to any smaller id — which under-drops on chains
    (a~b, b~c, a!~c keeps c). ``transitive=True`` resolves full
    single-link components over the verified pairs
    (:func:`connected_components`) and keeps exactly one doc (the min
    id) per component — the correct semantics for boilerplate chains,
    at the cost of O(diameter) extra id-only joins.

    The bucket frame is persisted across its self-join (both sides and
    the downstream verify would otherwise recompute the signature DAG —
    measured 1.6x slower); the loser-id set is tiny and eagerly
    checkpointed so the cache can be released before returning the
    still-lazy survivor plan.
    """
    buckets = minhash_lsh_buckets(
        df, text_col, id_col, num_hashes, bands, shingle_n, family
    )
    buckets.persist()
    try:
        pairs = lsh_candidate_pairs(buckets, id_col, max_bucket_size)
        dups = verified_near_dup_pairs(df, pairs, text_col, id_col, shingle_n, threshold)
        return _drop_pair_losers(
            df, dups, id_col, transitive, eager=True,
            score_col=score_col, descending=descending,
        )
    finally:
        buckets.unpersist()




def minhash_cross_corpus_pairs(
    left: DataFrame,
    right: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    family: str = "multiply_add",
    max_bucket_size: int | None = None,
    candidates: str = "checkpoint",
    left_buckets: DataFrame | None = None,
    right_buckets: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs BETWEEN two corpora, never within one — the
    dedup-new-data-against-existing-training-set / decontaminate-crawl-
    against-eval-set primitive the self-join operators can't express
    without paying for both corpora's internal pairs. Returns
    (left_id, right_id, jaccard) for every cross pair whose verified
    distinct-shingle Jaccard clears ``threshold``.

    ``candidates`` picks how the (left_id, right_id) candidate set —
    referenced three times downstream (verify join + both side-shingle
    semi-joins) — is materialized:

    - ``'checkpoint'`` (default): eager ``localCheckpoint``. Right for
      single-box / bench runs: the expensive band-join subtree runs
      once and the checkpointed rows are id-pair-width only. NOT the
      right durability choice for a 1000-executor 100 TB run —
      executor-local checkpoint blocks are lost with the executor.
    - ``'persist'``: lazy MEMORY_AND_DISK persist, the gentler sibling
      pattern (minhash_dedup's buckets). The caller owns unpersist.
    - ``'lazy'``: no materialization — a pure Catalyst plan that
      recomputes the band-join subtree at each reference. Use for plan
      inspection/explain, or when the caller materializes candidates
      itself. On a real cluster the recommended shape for huge corpora
      is exactly that: write the candidate set to a bucketed table
      once (``sources.io.write_bucketed`` with left_id as the bucket
      column), then run verification from it.

    Plan shape: both sides reduce to (id, band_id, band_hash) bucket
    rows under the SAME hash family (signatures from different
    families never match — the persisted-store contract); the
    candidate join is hash-partitioned on (band_id, band_hash) with no
    self-join anywhere, so cost is one band shuffle of each corpus +
    verification proportional to CROSS candidates only. When ``right``
    is a benchmark/eval set (the decontamination case) its bucket side
    is small enough that AQE broadcasts it — the new corpus then never
    shuffles at all. ``max_bucket_size`` caps boilerplate buckets on
    each side independently, same rationale as
    :func:`lsh_candidate_pairs`. Ids may collide across corpora (both
    sides can have a doc 17) — the output keeps the sides in separate
    columns and never compares ids across sides.

    ``left_buckets`` / ``right_buckets`` optionally feed precomputed
    band frames (:func:`minhash_band_state` rows under the SAME
    family/params — the persisted-store contract) so a caller whose
    sides partition one corpus can sign it once and filter-split
    instead of running two signature pipelines; identical output —
    a document's band rows don't depend on which frame selects them."""
    lb = (
        left_buckets
        if left_buckets is not None
        else minhash_lsh_buckets(
            left, text_col, id_col, num_hashes, bands, shingle_n, family
        )
    ).select(F.col(id_col).alias("left_id"), "band_id", "band_hash")
    rb = (
        right_buckets
        if right_buckets is not None
        else minhash_lsh_buckets(
            right, text_col, id_col, num_hashes, bands, shingle_n, family
        )
    ).select(F.col(id_col).alias("right_id"), "band_id", "band_hash")
    return _cross_verified_pairs(
        lb, rb, left, right, text_col, id_col, shingle_n, threshold,
        max_bucket_size, candidates,
    )


def _cross_verified_pairs(
    lb: DataFrame,
    rb: DataFrame,
    left: DataFrame,
    right: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    threshold: float,
    max_bucket_size: int | None,
    candidates: str,
) -> DataFrame:
    """Shared tail of the cross-corpus pair search: band-bucket join of
    two precomputed band frames (``lb``: left_id/band_id/band_hash,
    ``rb``: right_id/...), candidate materialization per ``candidates``,
    then exact distinct-shingle Jaccard verification reading only the
    matched ids' text from each side. Factored out so the persisted-
    state delta path (:func:`minhash_delta_pairs`) can feed a band frame
    LOADED from storage instead of recomputing it from text."""
    if max_bucket_size is not None:
        from .skew import drop_oversized_groups

        lb = drop_oversized_groups(lb, ["band_id", "band_hash"], max_bucket_size)
        rb = drop_oversized_groups(rb, ["band_id", "band_hash"], max_bucket_size)
    cand = (
        lb.join(rb, ["band_id", "band_hash"])
        .select("left_id", "right_id")
        .dropDuplicates()
    )
    if candidates == "checkpoint":
        from .dedup_common import materialize

        cand = materialize(cand)  # no-op under plan_only_mode
    elif candidates == "persist":
        from pyspark import StorageLevel

        cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    elif candidates != "lazy":
        raise ValueError(
            "candidates must be 'checkpoint', 'persist' or 'lazy', got "
            f"{candidates!r}"
        )

    def side_shingles(df: DataFrame, out_id: str) -> DataFrame:
        ids = cand.select(F.col(out_id).alias(id_col)).dropDuplicates()
        # NOTE (r13, measured): the narrow word_shingles transform is
        # the RIGHT form here — each side's arrays are built once and
        # candidates are heavily id-pruned, so swapping in the explode
        # path (shingle_arrays) added a window shuffle per side and
        # measured 1.3-1.9x SLOWER (A/B: cross_corpus_dedup 3.75 ->
        # 4.67 s, decontaminate 1.28 -> 2.39 s). shingle_arrays wins
        # only where one frame feeds BOTH verify sides
        # (verified_near_dup_pairs).
        return (
            df.join(ids, id_col, "left_semi")
            .select(
                F.col(id_col).alias(out_id),
                word_shingles(text_col, shingle_n).alias(f"_sh_{out_id}"),
            )
        )

    joined = cand.join(side_shingles(left, "left_id"), "left_id").join(
        side_shingles(right, "right_id"), "right_id"
    )
    jac = F.size(F.array_intersect("_sh_left_id", "_sh_right_id")) / F.size(
        F.array_union("_sh_left_id", "_sh_right_id")
    )
    return joined.select("left_id", "right_id", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def cross_corpus_dedup(
    left: DataFrame,
    right: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    family: str = "multiply_add",
    max_bucket_size: int | None = None,
    candidates: str = "checkpoint",
) -> DataFrame:
    """Keep only the ``left`` rows that near-duplicate NO ``right``
    document (minhash-LSH blocked, Jaccard-verified) — incremental
    corpus ingestion: ``right`` is what you already have (or must not
    leak, for eval sets), ``left`` is the new batch; survivors are safe
    to append. One left-anti join on the matched left ids; ``right``
    is never mutated or copied. ``candidates`` passes through to
    :func:`minhash_cross_corpus_pairs` (materialization strategy for
    the candidate pair set). Note for ``'persist'``: the cached
    candidate frame is internal here and cannot be unpersisted by the
    caller — it stays pinned for the session. In a loop over many
    batches call :func:`minhash_cross_corpus_pairs` directly and own
    the unpersist, or keep the default ``'checkpoint'`` (released by
    the ContextCleaner when the frame drops)."""
    pairs = minhash_cross_corpus_pairs(
        left, right, text_col, id_col, num_hashes, bands, shingle_n,
        threshold, family, max_bucket_size, candidates,
    )
    losers = pairs.select(F.col("left_id").alias(id_col)).dropDuplicates()
    return left.join(losers, id_col, "left_anti")


def minhash_band_state(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    family: str = "multiply_add",
) -> DataFrame:
    """The persistable LSH index rows for a corpus — (id, band_id,
    band_hash), one row per document per band — i.e. exactly
    :func:`minhash_lsh_buckets`, named for the persisted-store role.

    This is the state table of the incremental dedup loop
    (:func:`minhash_dedup_delta`): write it ONCE for the existing
    corpus, then each ingestion cycle signs only its own batch and
    joins against these rows — no historical document is ever re-read
    or re-signed. The store contract: ``family`` / ``num_hashes`` /
    ``bands`` / ``shingle_n`` are part of the schema — rows computed
    under different parameters never match and must never share a
    table. At cluster scale write it bucketed on
    ``("band_id", "band_hash")`` — the probe join's keys, in join
    order, which is what lets the bucketed scan's HashPartitioning
    satisfy the join's required distribution
    (``sources.io.write_bucketed``) — so every cycle's candidate join
    shuffles only the batch side, into the state's bucket count
    (proven as a plan assertion in tests/test_bucketed_state.py);
    band_hash is a 64-bit hash, so bucket skew mirrors bucket-occupancy
    skew and the ``max_bucket_size`` cap downstream bounds it."""
    return minhash_lsh_buckets(
        df, text_col, id_col, num_hashes, bands, shingle_n, family
    )


def minhash_delta_pairs(
    batch: DataFrame,
    state: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    family: str = "multiply_add",
    max_bucket_size: int | None = None,
    candidates: str = "checkpoint",
    batch_buckets: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and the PERSISTED corpus
    state — (left_id: batch doc, right_id: historical doc, jaccard) —
    without recomputing a single historical signature.

    The incremental sibling of :func:`minhash_cross_corpus_pairs`:
    where that operator signs both corpora from text every call (right
    side cost grows with the corpus), this one takes the history as
    ``state`` rows already on disk (:func:`minhash_band_state`), so the
    per-cycle cost is O(batch) signature compute + one band-keyed join
    of the batch's band rows against the state table + verification
    proportional to cross candidates only. ``corpus`` (the historical
    documents table) is touched ONLY to fetch the text of matched
    candidate ids for exact-Jaccard verification — an id-pruned
    semi-join read (<<1% of the corpus; at cluster scale keep the
    corpus bucketed on ``id_col`` so this read never full-scans).

    ``state`` must carry (id_col, band_id, band_hash) computed under
    the SAME family/num_hashes/bands/shingle_n (the persisted-store
    contract — parameters are part of the schema). ``batch_buckets``
    optionally supplies the batch's precomputed band rows so a loop
    that also appends them to the state (:func:`minhash_state_append`)
    computes them once. ``candidates`` and ``max_bucket_size`` behave
    as in :func:`minhash_cross_corpus_pairs`."""
    lb = (
        batch_buckets
        if batch_buckets is not None
        else minhash_band_state(
            batch, text_col, id_col, num_hashes, bands, shingle_n, family
        )
    ).select(F.col(id_col).alias("left_id"), "band_id", "band_hash")
    rb = state.select(F.col(id_col).alias("right_id"), "band_id", "band_hash")
    return _cross_verified_pairs(
        lb, rb, batch, corpus, text_col, id_col, shingle_n, threshold,
        max_bucket_size, candidates,
    )


def minhash_dedup_delta(
    batch: DataFrame,
    state: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    family: str = "multiply_add",
    max_bucket_size: int | None = None,
    candidates: str = "checkpoint",
    batch_buckets: DataFrame | None = None,
) -> DataFrame:
    """One cycle of the incremental MinHash dedup loop: the batch rows
    that survive BOTH history (no verified near-dup in the persisted
    corpus state) and the batch-internal sweep (not a verified near-dup
    of a smaller-id batch doc) — i.e. exactly what is safe to append to
    an already-deduplicated corpus.

    Semantics are order-free within the batch and history-first across
    batches: a historical match kills a batch doc regardless of ids
    (history was already accepted), while batch-internal ties resolve
    by min id, the same rule as :func:`minhash_dedup`. The internal
    sweep runs over the WHOLE batch (a batch doc that loses to history
    still kills its own batch near-dups — its content is represented in
    the corpus by the historical doc that beat it), so the survivor set
    of a batch never depends on the order its members are inspected.

    Per-cycle cost: within THIS operator the batch's band rows are
    computed once (persisted across the history join and the internal
    self-join), the state is probed by one band-keyed join, and text
    verification touches only candidate ids from either side. No
    historical document is re-signed; the loop's running cost is pinned
    to batch size, not corpus size (measured in SCALE.md §6g). Append
    :func:`minhash_state_append` of the survivors to the state table to
    complete the cycle — and a loop that wants the append leg join-only
    computes ``minhash_band_state(batch)`` itself once and passes it to
    both steps via their ``batch_buckets`` parameters, instead of the
    append re-signing survivor text. ``batch_buckets`` here accepts the
    batch's precomputed band rows directly (same contract as
    :func:`minhash_delta_pairs`)."""
    bb = (
        batch_buckets
        if batch_buckets is not None
        else minhash_band_state(
            batch, text_col, id_col, num_hashes, bands, shingle_n, family
        )
    )
    bb.persist()
    try:
        from .dedup_common import materialize

        # The history probe and the batch-internal sweep share ONE
        # tagged CANDIDATE pass (round-12 restructure, kept): a cycle
        # previously ran four eager executions; fusing the candidate
        # materialization cut that without changing a single pair.
        # The VERIFICATION is split per branch again (round-13): the
        # r12 tagged-union verify measured 1.8x slower at sf1 — see
        # the comment at the verify stage below. id_a is always a
        # BATCH id; id_b is a corpus id on '_src'='h' rows and a
        # batch id on '_src'='i' rows (ids may collide across sides,
        # so the branches must never be mixed without the tag).
        lb = bb.select(F.col(id_col).alias("id_a"), "band_id", "band_hash")
        rb = state.select(F.col(id_col).alias("id_b"), "band_id", "band_hash")
        ib = bb
        if max_bucket_size is not None:
            from .skew import drop_oversized_groups

            lb = drop_oversized_groups(lb, ["band_id", "band_hash"], max_bucket_size)
            rb = drop_oversized_groups(rb, ["band_id", "band_hash"], max_bucket_size)
            ib = drop_oversized_groups(bb, ["band_id", "band_hash"], max_bucket_size)
        hist_cand = (
            lb.join(rb, ["band_id", "band_hash"])
            .select("id_a", "id_b", F.lit("h").alias("_src"))
        )
        a, b = ib.alias("a"), ib.alias("b")
        int_cand = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.lit("i").alias("_src"),
            )
        )
        # dropDuplicates includes the tag, so dedup stays per-branch —
        # identical to the two separate dropDuplicates it replaces
        cand = hist_cand.unionByName(int_cand).dropDuplicates(
            ["_src", "id_a", "id_b"]
        )
        if candidates == "checkpoint":
            cand = materialize(cand)
        elif candidates == "persist":
            from pyspark import StorageLevel

            cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
        elif candidates != "lazy":
            raise ValueError(
                "candidates must be 'checkpoint', 'persist' or 'lazy', got "
                f"{candidates!r}"
            )

        # Verification SPLIT per branch (r13): the r12 shape verified
        # both branches through ONE tagged join against a UNION of the
        # two shingle sides, keyed on (_src, id_b). That fused the
        # actions, but the union side defeats per-branch broadcast
        # planning and funnels both sides through one wide join —
        # MEASURED 1.8x slower at sf1 (scripts/bench_scale_delta_ab.py:
        # old-split 12.0 s vs tagged-union 22.1 s medians of 5; at
        # sf0.1 the difference hides under the action floor, which is
        # how it shipped). The candidate pass stays FUSED (one tagged
        # checkpoint — that half is a pure win: one band self-join +
        # one history probe materialized together), and each branch's
        # Jaccard verify is a separate, independently-plannable join
        # consumed lazily by the returned plan — so the action count
        # stays at r12's level (one checkpoint + the final execution)
        # while the join shapes are the scale-correct ones.
        hist_cand_v = cand.filter(F.col("_src") == "h").select("id_a", "id_b")
        int_cand_v = cand.filter(F.col("_src") == "i").select("id_a", "id_b")
        jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
            F.array_union("sh_a", "sh_b")
        )
        # history branch: sh_a from the batch, sh_b from the corpus —
        # narrow word_shingles per side (each side is built once over
        # id-pruned docs; the explode path only wins when ONE frame
        # feeds both sides, see verified_near_dup_pairs)
        h_left = hist_cand_v.select(F.col("id_a").alias(id_col)).dropDuplicates()
        h_sh_a = batch.join(h_left, id_col, "left_semi").select(
            F.col(id_col).alias("id_a"),
            word_shingles(text_col, shingle_n).alias("sh_a"),
        )
        h_right = hist_cand_v.select(F.col("id_b").alias(id_col)).dropDuplicates()
        h_sh_b = corpus.join(h_right, id_col, "left_semi").select(
            F.col(id_col).alias("id_b"),
            word_shingles(text_col, shingle_n).alias("sh_b"),
        )
        hist_losers = (
            hist_cand_v.join(h_sh_a, "id_a")
            .join(h_sh_b, "id_b")
            .filter(jac >= threshold)
            .select(F.col("id_a").alias(id_col))
            .dropDuplicates()
        )
        # internal branch: both sides are batch docs — exactly the
        # verified_near_dup_pairs shape (one frame, both sides)
        idups = verified_near_dup_pairs(
            batch, int_cand_v, text_col, id_col, shingle_n, threshold
        ).select("id_a", "id_b")
        from .dedup_components import _drop_pair_losers

        internal_survivors = _drop_pair_losers(
            batch, idups, id_col, transitive=False, eager=False
        )
        return internal_survivors.join(hist_losers, id_col, "left_anti")
    finally:
        bb.unpersist()


def minhash_state_append(
    survivors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    family: str = "multiply_add",
    batch_buckets: DataFrame | None = None,
) -> DataFrame:
    """The state rows a completed cycle appends: the band rows of the
    batch docs that survived :func:`minhash_dedup_delta` (losers need no
    representation — their content is represented by whichever doc beat
    them, historical or batch-internal, which IS in the state). Row
    count is ``bands`` x survivors by construction. Same persisted-store
    contract as :func:`minhash_band_state`: identical parameters, same
    family, appended to the same bucketed table.

    ``batch_buckets`` accepts the WHOLE batch's precomputed band rows
    (:func:`minhash_band_state` of the batch — compute them once per
    cycle and share them with :func:`minhash_delta_pairs`); the append
    rows are then a survivor-id semi-join instead of re-signing the
    survivors' text. Identical output either way — the band rows of a
    doc don't depend on which frame they're selected from."""
    if batch_buckets is not None:
        return batch_buckets.join(
            survivors.select(id_col).dropDuplicates(), id_col, "left_semi"
        )
    return minhash_band_state(
        survivors, text_col, id_col, num_hashes, bands, shingle_n, family
    )
