"""Embedding-cosine near-dup: banded hyperplane LSH blocking with
expr/arrow verification, exact tiled-GEMM opt-in, and SemDeDup
cluster-then-dedup. Split from dedup.py; operators.dedup re-exports
the surface."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup_common import materialize
from .dedup_components import _drop_pair_losers

# verify_impl='auto' dispatch memo: (applicationId, plan semanticHash,
# threshold) -> bool ("more than threshold vectors?"). Both verify
# implementations return identical pairs, so this caches a
# performance-only routing decision, never data; bounded at 256.
_VERIFY_DISPATCH_MEMO: dict[tuple, bool] = {}


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of two array<float|double> columns via zip_with/aggregate —
    JVM-side, no UDF.

    Zero-norm (all-zero) vectors have no defined cosine; this returns
    NULL for them rather than NaN (0/0) — NaN compares GREATER than
    every double in Spark's ordering and would float to the top of any
    similarity ranking, while NULL drops out of ``>= threshold``
    filters and sorts last under the default desc ordering."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    denom = na * nb
    return F.when(denom > 0, dot / denom)


def _exact_pairs_gemm(
    scaled: DataFrame,
    id_col: str,
    threshold: float,
    tile_rows: int,
) -> DataFrame:
    """Exact all-pairs cosine via a distributed tiled matrix product.

    Vectors are hashed into ~``tile_rows``-sized tiles; tile i of the
    A-replica is shuffled to every grid cell (i, j>=i) and tile j of
    the B-replica to every cell (i<=j, j), so each unordered tile pair
    meets exactly once. Per cell, one numpy GEMM (Va @ Vb.T) scores the
    whole block — Arrow-batched, no per-pair expression tree, no
    driver collect, no broadcast: the grid join IS how exact all-pairs
    is run distributed when neither side fits one machine. Same-tile
    cells emit id_a < id_b only; cross-tile cells emit each pair once,
    min id first. Work and shuffle stay O(n^2 / tile_rows) rows — the
    irreducible cost of EXACT all-pairs; the LSH path above is the
    100 TB default for a reason.
    """
    import pandas as pd

    n = scaled.count()
    num_tiles = max(1, -(-n // tile_rows))
    tiled = scaled.select(
        F.col(id_col),
        "_sv",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_tiles)).cast("int").alias("_tile"),
    )
    a = tiled.select(
        F.col(id_col).alias("id_a"),
        F.col("_sv").alias("va"),
        F.col("_tile").alias("i"),
        F.explode(F.sequence(F.col("_tile"), F.lit(num_tiles - 1))).alias("j"),
    )
    b = tiled.select(
        F.col(id_col).alias("id_b"),
        F.col("_sv").alias("vb"),
        F.explode(F.sequence(F.lit(0), F.col("_tile"))).alias("i"),
        F.col("_tile").alias("j"),
    )
    id_type = dict(scaled.dtypes)[id_col]
    out_schema = f"id_a {id_type}, id_b {id_type}, cosine double"

    def gemm(key, left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        if left.empty or right.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        va = np.vstack(left["va"].to_numpy())
        vb = np.vstack(right["vb"].to_numpy())
        ia = left["id_a"].to_numpy()
        ib = right["id_b"].to_numpy()
        m = va @ vb.T
        mask = m >= threshold
        if key[0] == key[1]:
            mask &= ia[:, None] < ib[None, :]
        r, c = np.nonzero(mask)
        lo = np.minimum(ia[r], ib[c])
        hi = np.maximum(ia[r], ib[c])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": m[r, c]})

    return (
        a.groupBy("i", "j")
        .cogroup(b.groupBy("i", "j"))
        .applyInPandas(gemm, out_schema)
    )


def _auto_num_planes(n_vectors: int, target_occupancy: int = 64) -> int:
    """Plane count that keeps expected bucket occupancy ~constant:
    ceil(log2(n / occupancy)), clamped to [6, 24]. Hyperplane
    signatures live in a FIXED 2^planes bucket space per band, so at a
    fixed plane count occupancy grows linearly with the corpus and
    within-bucket candidate pairs grow QUADRATICALLY — the sf10
    measurement run demonstrated this empirically (6 planes over 2M
    vectors = ~31k vectors/bucket = ~10^11 candidate pairs, death by
    shuffle spill). Scaling planes with log2(n) pins occupancy, making
    the candidate count ~ bands * n * occupancy / 2 — linear in n."""
    import math

    if n_vectors <= 0:
        return 6
    raw = math.ceil(math.log2(max(n_vectors / max(target_occupancy, 1), 1.0)))
    return max(6, min(24, raw))


def _bucket_verify_arrow(
    sigs: DataFrame, scaled: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Bucket-local GEMM candidate verification (the scale path of
    :func:`embedding_near_dup_pairs`): join the L2-normalized vectors
    to the (id, band, sig) bucket rows — O(bands * corpus) shuffle
    bytes, never O(candidates) — then one ``M @ M.T`` per (band, sig)
    group emits only the pairs at or above the threshold. Rows are
    sorted by id inside each group so id_a < id_b holds for any
    orderable id type, and cross-band duplicates (a pair sharing more
    than one band signature) collapse in one id-pair dropDuplicates
    over survivors only."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    joined = sigs.join(scaled.select(F.col(id_col), F.col("_sv")), id_col)
    id_type = joined.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    thr = float(threshold)
    id_name = id_col

    def bucket_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        pdf = pdf.sort_values(id_name, kind="mergesort")
        mat = np.stack(pdf["_sv"].to_numpy()).astype(np.float64)
        sims = mat @ mat.T
        ii, jj = np.triu_indices(n, k=1)
        vals = sims[ii, jj]
        ids = pdf[id_name].to_numpy()
        # ids[ii] != ids[jj] mirrors the expr path's strict id_a < id_b:
        # duplicate ids must never emit a self-pair
        keep = (vals >= thr) & (ids[ii] != ids[jj])
        return pd.DataFrame(
            {"id_a": ids[ii[keep]], "id_b": ids[jj[keep]], "cosine": vals[keep]}
        )

    return (
        joined.groupBy("band", "sig")
        .applyInPandas(bucket_pairs, out_schema)
        .dropDuplicates(["id_a", "id_b"])
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int | str = "auto",
    num_bands: int = 4,
    dim: int | None = None,
    max_bucket_size: int | None = None,
    signature_impl: str = "expr",
    exact_impl: str = "gemm",
    exact_tile_rows: int = 2048,
    auto_bucket_occupancy: int = 64,
    verify_impl: str = "auto",
    arrow_verify_threshold: int = 100_000,
    bands_df: "DataFrame | None" = None,
) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold, blocked by
    banded random-hyperplane LSH — the DEFAULT and the 100 TB path.

    ``bands_df`` optionally feeds precomputed (id, band, sig) rows
    (:func:`embedding_band_state` under the SAME pinned num_planes /
    num_bands family — the persisted-store contract) so a caller that
    also appends band rows to a store signs the batch ONCE instead of
    twice (the streaming sink); the caller owns their materialization.
    Requires an explicit positive ``num_planes`` (the family the rows
    were computed under — 'auto' cannot be re-derived from rows).
    Identical output: a vector's band rows don't depend on which frame
    selects them.

    The DEFAULTS are the scale-safe configuration: ``num_planes='auto'``
    and ``verify_impl='auto'`` (one column-pruned count of the corpus
    dispatches both). The previously-fixed 6-plane / expr-verify
    defaults were MEASURED dying quadratically at 2M vectors (38 GB of
    shuffle spill, SCALE.md §6c) while auto is property-tested to
    resolve to the identical configuration at small corpora — a scale
    claim must not require the caller to know the magic kwargs.

    ``verify_impl`` picks how candidates are verified:

    - ``'expr'`` (the oracle-certified plan): materialize the
      deduplicated candidate id pairs, join the normalized vectors
      back by id, fold the dot product in codegen. Exactly
      reproducible by an external SQL engine — but the pair-keyed
      vector joins move O(candidates * dim) bytes through the
      shuffle, and the per-pair higher-order-function fold costs
      ~2.5us per element: both grow with the CANDIDATE count, which
      at scale dwarfs the corpus (the 6-plane sf10 run shuffled 38 GB
      of spill before dying).
    - ``'arrow'`` (the 100 TB path): carry the normalized vectors
      through the (band, sig) bucket shuffle — O(bands * corpus)
      bytes, linear — and verify each bucket with ONE numpy matmul
      inside ``applyInPandas`` (occupancy^2 dots at BLAS speed,
      measured orders of magnitude over the per-pair fold); only
      surviving pairs materialize, deduplicated across bands
      afterwards. Cosine VALUES may differ from the expr fold in the
      last ulp (BLAS summation order), which the 4dp oracle rounding
      absorbs; the pair SET agrees except for pairs whose true cosine
      sits within one ulp of ``threshold`` — membership is evaluated
      on the unrounded value in both impls, so a knife-edge pair can
      land on different sides (same certified-twin convention as
      minhash's signature_impl; thresholds are corpus-level knobs,
      not exact decision boundaries).
    - ``'auto'`` (default): 'arrow' when the corpus exceeds
      ``arrow_verify_threshold`` vectors (default 100k — past that
      the candidate-keyed expr joins dominate and the measured-safe
      bucket GEMM wins), else 'expr'. Same size-dispatch precedent as
      :func:`connected_components`' driver union-find.

    ``num_planes="auto"`` (default) sizes the signature from the corpus
    itself (one column-pruned count): planes = ceil(log2(n /
    ``auto_bucket_occupancy``)), clamped to [6, 24] — see
    :func:`_auto_num_planes` for why a FIXED plane count degrades
    quadratically as the corpus grows (the bucket space doesn't grow
    with it). Tradeoff to know: per-band true-pair retention is
    (1 - theta/pi)^planes, so longer signatures lower recall at a
    fixed band count — recall-critical jobs should raise ``num_bands``
    (OR-amplification) alongside. The certified oracle queries pin
    ``num_planes=6`` explicitly, so their results are reproducible at
    any sf; at the oracle's sf0.01 corpus auto resolves to the same 6
    (property-tested, and the default path is tested pair-set-equal to
    the pinned 6x4/expr config there).

    Each band hashes the vector against ``num_planes`` independent
    hyperplanes (plane family is deterministic by index, see
    similarity._seeded_plane — any engine reproduces it, so the DuckDB
    oracle certifies this exact plan); two vectors are candidates iff
    they share ANY band's full signature (OR-amplification: candidate
    prob = 1-(1-(1-θ/π)^planes)^bands — at cosine 0.95 with 6x4 the
    retention is ~0.95 while unrelated pairs are pruned ~50x). The
    self-join is bucket-local on (band, sig) — never an O(n^2)
    cartesian product — and only (id, band, sig) rows shuffle;
    normalized vectors are joined back by id for the verify dot
    product, proportional to candidates, not corpus².

    ``num_planes=0`` is an explicit opt-in that compares ALL pairs
    (exact). ``exact_impl='gemm'`` (default) runs it as a distributed
    tiled numpy matrix product over an (i, j) tile grid — see
    :func:`_exact_pairs_gemm`; measured ~6x the per-pair expression
    fold, which remains available as ``exact_impl='expr'`` for
    zero-Python environments. Either way the cost is inherently
    quadratic in the corpus — a scale-killer past ~10^5 vectors.
    ``max_bucket_size`` drops degenerate buckets (e.g. an all-near-zero
    signature hot spot) the same way lsh_candidate_pairs caps text LSH
    boilerplate buckets. ``dim`` is the embedding width for the plane
    literals (defaults to 64, the synthetic table's width); a vector
    whose width differs raises at run time — it would otherwise
    silently zero every signature and collapse blocking into one
    bucket (see hyperplane_signature).

    Zero-norm (all-zero) vectors have no defined cosine and are
    filtered out up front — they never appear in any pair.

    Vectors are L2-normalized ONCE per row below the join, so the
    per-pair work is a single dot product — computing full cosine
    (dot + both norms) per pair was measured 3x slower, and the norm
    work grows with the pair count instead of the corpus size.
    """
    from .similarity import banded_signatures

    if bands_df is not None and (
        not isinstance(num_planes, int) or num_planes <= 0
    ):
        raise ValueError(
            "embedding_near_dup_pairs: bands_df requires an explicit "
            "positive num_planes — the pinned family the rows were "
            "computed under ('auto' cannot be re-derived from band rows)"
        )
    n_vectors: int | None = None
    if num_planes == "auto":
        n_vectors = df.select(id_col).count()
        num_planes = _auto_num_planes(n_vectors, auto_bucket_occupancy)
    elif isinstance(num_planes, str):
        raise ValueError(
            f"embedding_near_dup_pairs: num_planes must be an int or 'auto', "
            f"got {num_planes!r}"
        )
    if verify_impl == "auto":
        if num_planes <= 0:
            verify_impl = "expr"  # exact path: verify dispatch is moot
        else:
            if n_vectors is not None:
                over = n_vectors > arrow_verify_threshold
            else:
                # the dispatch only needs "more than threshold rows?",
                # never the exact count — LocalLimit plans a per-
                # partition limit, so the probe scans at most
                # (threshold+1) x num_partitions rows (bounded per
                # partition by the threshold; still far cheaper than a
                # full count — the full count was a whole-corpus pass
                # at 100 TB; same bounded-probe rule as
                # similarity_ivf's small_threshold gate). The verdict
                # is memoized per (app, plan, threshold): both verify
                # impls produce identical pairs (pytest-pinned), so
                # the dispatch is performance-only and a memo hit can
                # never change a result — it removes the one fixed
                # probe job from every later call on the same plan in
                # a driver loop (VERDICT r12 item 7).
                key = (
                    df.sparkSession.sparkContext.applicationId,
                    df.semanticHash(),
                    int(arrow_verify_threshold),
                )
                over = _VERIFY_DISPATCH_MEMO.get(key)
                if over is None:
                    over = (
                        df.select(id_col).limit(arrow_verify_threshold + 1).count()
                        > arrow_verify_threshold
                    )
                    if len(_VERIFY_DISPATCH_MEMO) >= 256:
                        _VERIFY_DISPATCH_MEMO.clear()
                    _VERIFY_DISPATCH_MEMO[key] = over
            verify_impl = "arrow" if over else "expr"
    elif verify_impl not in ("expr", "arrow"):
        raise ValueError(
            f"embedding_near_dup_pairs: verify_impl must be 'expr', 'arrow' "
            f"or 'auto', got {verify_impl!r}"
        )
    norm_sq = F.aggregate(
        F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    inv_norm = 1.0 / F.sqrt(F.col("_nsq"))
    scaled = (
        df.select(F.col(id_col), F.col(vec_col), norm_sq.alias("_nsq"))
        .filter(F.col("_nsq") > 0)
        .select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double") * inv_norm).alias("_sv"),
            F.col(vec_col),
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if num_planes <= 0:
        if exact_impl == "gemm":
            return _exact_pairs_gemm(scaled, id_col, threshold, exact_tile_rows)
        a = scaled.select(F.col(id_col).alias("id_a"), F.col("_sv").alias("va"))
        b = scaled.select(F.col(id_col).alias("id_b"), F.col("_sv").alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
        return pairs.select("id_a", "id_b", dot.alias("cosine")).filter(
            F.col("cosine") >= threshold
        )
    # Banded blocking: (id, band, sig) rows only — signatures on the RAW
    # vector (sign is scale-invariant; the oracle mirrors raw too).
    # Eagerly materialized: the self-join references this frame twice
    # (three times with the bucket cap), and the signature computation
    # (num_bands x num_planes dot products per row) is the expensive
    # subtree — same reasoning as minhash_dedup's persisted buckets.
    # The checkpointed rows are only (id, band, sig) — id-width, never
    # vectors. With bands_df the caller supplies (and owns the
    # materialization of) those rows — one signing per cycle.
    sigs = (
        bands_df.select(F.col(id_col), "band", "sig")
        if bands_df is not None
        else materialize(
            banded_signatures(
                scaled, vec_col, id_col, num_planes, num_bands, dim, id_col,
                impl=signature_impl,
            )
        )
    )
    if max_bucket_size is not None:
        from .skew import drop_oversized_groups

        sigs = drop_oversized_groups(sigs, ["band", "sig"], max_bucket_size)
    if verify_impl == "arrow":
        return _bucket_verify_arrow(sigs, scaled, id_col, threshold)
    a = sigs.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = sigs.select(F.col(id_col).alias("id_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )
    va = scaled.select(F.col(id_col).alias("id_a"), F.col("_sv").alias("va"))
    vb = scaled.select(F.col(id_col).alias("id_b"), F.col("_sv").alias("vb"))
    pairs = cand.join(va, "id_a").join(vb, "id_b")
    return pairs.select("id_a", "id_b", dot.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def embedding_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int | str = "auto",
    num_bands: int = 4,
    dim: int | None = None,
    transitive: bool = False,
    signature_impl: str = "expr",
    score_col: str | None = None,
    descending: bool = True,
    verify_impl: str = "auto",
    max_bucket_size: int | None = None,
    auto_bucket_occupancy: int = 64,
    arrow_verify_threshold: int = 100_000,
    bands_df: "DataFrame | None" = None,
) -> DataFrame:
    """Drop the higher id of every near-duplicate embedding pair (or,
    with ``transitive=True``, keep one vector per single-link
    component; with ``score_col``, the best-scoring member of each
    component). Banded-LSH blocked by default with the scale-safe
    corpus-sized defaults (``num_planes='auto'``,
    ``verify_impl='auto'`` — see embedding_near_dup_pairs);
    ``num_planes=0`` opts into exact all-pairs for small frames.
    ``signature_impl`` passes through to the blocking stage
    (``'arrow'`` = the numpy-matmul scale path, see
    banded_signatures); the scale knobs (``max_bucket_size``,
    ``auto_bucket_occupancy``, ``arrow_verify_threshold``) pass
    through to the pair search, so the wrapper never has to be
    abandoned to reach them."""
    pairs = embedding_near_dup_pairs(
        df, vec_col, id_col, threshold, num_planes, num_bands, dim,
        max_bucket_size=max_bucket_size,
        signature_impl=signature_impl, verify_impl=verify_impl,
        auto_bucket_occupancy=auto_bucket_occupancy,
        arrow_verify_threshold=arrow_verify_threshold,
        bands_df=bands_df,
    )
    return _drop_pair_losers(
        df, pairs, id_col, transitive, score_col=score_col, descending=descending
    )


# ---------------------------------------------------------------------------
# SemDeDup (cluster-then-dedup over embeddings)
# ---------------------------------------------------------------------------

def semantic_dedup_pairs(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    max_cluster_size: int | None = None,
    pair_impl: str = "gemm",
) -> DataFrame:
    """SemDeDup-style near-dup pairs: assign every vector to its
    nearest centroid, then compare cosines ONLY within each cluster
    (Abbas et al. 2023, "SemDeDup" — k-means partitions the corpus so
    the quadratic pair search runs per-cluster, never corpus-wide).

    Complements :func:`embedding_near_dup_pairs`: hyperplane-LSH blocks
    by random projections (recall is probabilistic per pair), while
    SemDeDup blocks by data-derived clusters (recall is exact for
    pairs that land in the same cell, and the cells align with the
    corpus's own density structure). Use LSH when no trained centroids
    exist; use this when a k-means codebook is already part of the
    pipeline (e.g. the IVF index's).

    Plan: nearest-centroid assignment is one narrow codegen pass
    (centroid literals — see similarity.assign_nearest_centroid);
    vectors L2-normalize once per row; each cluster's pairs compute
    bucket-locally after ONE shuffle on the cluster key. Cost is
    sum(|cluster|^2), bounded by ``max_cluster_size`` (oversized cells
    dropped with a warning — at 100 TB raise k instead so cells stay
    ~corpus/k; k should scale WITH the corpus, which is also what keeps
    the wall-clock linear — see SCALE.md §6a). Zero-norm vectors have
    no cosine and are excluded up front.

    ``pair_impl='gemm'`` (default) scores each cluster with one
    chunked numpy matrix product inside ``applyInPandas`` — the
    cluster IS the tile, Arrow-batched, memory bounded at
    2048 x |cluster| per chunk. ``pair_impl='expr'`` keeps the
    per-pair codegen fold (equi self-join on cluster_id) for
    zero-Python environments.
    """
    from .similarity import assign_nearest_centroid
    from .skew import drop_oversized_groups

    assigned = assign_nearest_centroid(df, centroids, id_col, vec_col).select(
        id_col, "cluster_id"
    )
    norm_sq = F.aggregate(
        F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    inv_norm = 1.0 / F.sqrt(F.col("_nsq"))
    scaled = (
        df.select(F.col(id_col), F.col(vec_col), norm_sq.alias("_nsq"))
        .filter(F.col("_nsq") > 0)
        .select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double") * inv_norm).alias("_sv"),
        )
        .join(assigned, id_col)
    )
    if max_cluster_size is not None:
        scaled = drop_oversized_groups(scaled, ["cluster_id"], max_cluster_size)
    if pair_impl == "gemm":
        import pandas as pd

        id_type = dict(scaled.dtypes)[id_col]
        cl_type = dict(scaled.dtypes)["cluster_id"]
        out_schema = (
            f"cluster_id {cl_type}, id_a {id_type}, id_b {id_type}, cosine double"
        )

        def cluster_gemm(pdf: "pd.DataFrame") -> "pd.DataFrame":
            import numpy as np

            v = np.vstack(pdf["_sv"].to_numpy())
            ids = pdf[id_col].to_numpy()
            cl = pdf["cluster_id"].iloc[0]
            frames = []
            for s in range(0, len(ids), 2048):
                m = v[s : s + 2048] @ v.T
                mask = (m >= threshold) & (ids[s : s + 2048, None] < ids[None, :])
                r, c = np.nonzero(mask)
                if len(r):
                    frames.append(
                        pd.DataFrame(
                            {
                                "cluster_id": cl,
                                "id_a": ids[s + r],
                                "id_b": ids[c],
                                "cosine": m[r, c],
                            }
                        )
                    )
            if not frames:
                return pd.DataFrame(
                    {"cluster_id": [], "id_a": [], "id_b": [], "cosine": []}
                )
            return pd.concat(frames, ignore_index=True)

        return scaled.groupBy("cluster_id").applyInPandas(cluster_gemm, out_schema)
    a = scaled.select(
        F.col("cluster_id"), F.col(id_col).alias("id_a"), F.col("_sv").alias("va")
    )
    b = scaled.select(
        F.col("cluster_id"), F.col(id_col).alias("id_b"), F.col("_sv").alias("vb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("cluster_id", "id_a", "id_b", dot.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    k: int | None = None,
    transitive: bool = False,
    max_cluster_size: int | None = 100_000,
    pair_impl: str = "gemm",
    score_col: str | None = None,
    descending: bool = True,
    target_cluster_size: int = 1024,
) -> DataFrame:
    """Keep one vector per semantic near-dup group: SemDeDup pair
    search (see :func:`semantic_dedup_pairs`) then drop the higher id
    of each pair — or one survivor per single-link component with
    ``transitive=True``, or the best-``score_col`` member per
    component (the SemDeDup paper keeps the member farthest from the
    centroid; pass that distance as the score). When no ``centroids`` frame is supplied, a
    codebook is trained in-line via similarity.ivf_train (the
    distributed k-means above its row threshold).

    Two guards keep the per-cluster pair search (cost
    sum(|cluster|^2)) from going quadratic as the corpus grows:

    - ``k=None`` (default) sizes the trained codebook to the corpus —
      k = clamp(ceil(n / target_cluster_size), 8, 65536) — so average
      cluster size stays ~``target_cluster_size`` regardless of scale
      (a FIXED k means cluster size grows with the corpus and the
      search degrades toward all-pairs; SCALE.md §6a measured exactly
      that at sf1 with k=8). An explicit ``k`` overrides.
    - ``max_cluster_size`` now DEFAULTS to 100k: a cell that a lagging
      or skewed codebook lets grow past it is dropped with a warning
      (conservative direction — its members all survive dedup) instead
      of silently costing |cell|^2. ``None`` removes the cap.
    """
    if centroids is None:
        from math import ceil

        from .similarity import ivf_train

        if k is None:
            n = df.count()
            k = max(8, min(65_536, ceil(n / max(1, target_cluster_size))))
        codebook = ivf_train(df, k=k, vec_col=vec_col)
        centroids = df.sparkSession.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(codebook)],
            "cluster_id int, centroid array<double>",
        )
    pairs = semantic_dedup_pairs(
        df, centroids, vec_col, id_col, threshold, max_cluster_size, pair_impl
    )
    return _drop_pair_losers(
        df, pairs, id_col, transitive, score_col=score_col, descending=descending
    )




# ---------------------------------------------------------------------------
# Incremental embedding dedup against persisted band state (round 9) —
# the embedding sibling of dedup_minhash.minhash_dedup_delta: history's
# LSH index rows live on disk; each cycle signs only its batch.
# ---------------------------------------------------------------------------


def _verified_cosine_pairs(
    cand: DataFrame,
    va: DataFrame,
    vb: DataFrame,
    a_id: str,
    b_id: str,
    threshold: float,
) -> DataFrame:
    """Shared candidate verification: join normalized vectors onto the
    id pairs, fold the dot product in codegen, keep pairs at or above
    ``threshold``. ``va``/``vb`` carry (a_id, va) / (b_id, vb). Used by
    both the history probe and the internal sweep of the delta loop so
    the verify math lives in exactly one place."""
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(va, a_id)
        .join(vb, b_id)
        .select(a_id, b_id, dot.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _normalized_vectors(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, _sv): L2-normalized double vectors, zero-norm rows dropped
    (no defined cosine) — the shared verify-side projection."""
    norm_sq = F.aggregate(
        F.col(vec_col), F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    inv_norm = 1.0 / F.sqrt(F.col("_nsq"))
    return (
        df.select(F.col(id_col), F.col(vec_col), norm_sq.alias("_nsq"))
        .filter(F.col("_nsq") > 0)
        .select(
            F.col(id_col),
            F.transform(
                F.col(vec_col), lambda x: x.cast("double") * inv_norm
            ).alias("_sv"),
        )
    )


def embedding_band_state(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    num_bands: int = 4,
    dim: int | None = None,
    signature_impl: str = "expr",
) -> DataFrame:
    """The persistable hyperplane-LSH index rows for an embedding
    corpus — (id, band, sig), one row per vector per band — the state
    table of :func:`embedding_dedup_delta`'s ingestion loop.

    ``num_planes`` must be an explicit int here, never ``'auto'``: the
    store contract pins the plane family across cycles (signatures
    under different plane counts never match), so size it for the
    corpus you EXPECT to accumulate — ceil(log2(N_target/occupancy)),
    :func:`_auto_num_planes` applied to the target, not the bootstrap —
    and re-index (one pass over the accepted corpus) if the corpus
    outgrows it; occupancy, and with it per-cycle probe cost, degrades
    gradually, not abruptly. Zero-norm vectors are excluded (no defined
    cosine — same rule as the batch operators). At cluster scale write
    the state bucketed on ``("band", "sig")`` — the probe join's keys,
    in join order, so the bucketed scan's HashPartitioning satisfies
    the join's required distribution and each cycle's probe join
    shuffles only the batch's band rows (plan-asserted in
    tests/test_bucketed_state.py)."""
    # bool subclasses int: True would silently build a degenerate
    # one-plane family, exactly the config drift this guard exists for
    if not isinstance(num_planes, int) or isinstance(num_planes, bool):
        raise ValueError(
            "embedding_band_state: num_planes must be an explicit int — "
            "'auto' would let the plane family drift between cycles, and "
            "signatures under different plane counts never match. Size it "
            "for the TARGET corpus (ceil(log2(N_target/occupancy)))."
        )
    from .similarity import banded_signatures

    norm_sq = F.aggregate(
        F.col(vec_col), F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    nonzero = df.filter(norm_sq > 0)
    return banded_signatures(
        nonzero, vec_col, id_col, num_planes, num_bands, dim, id_col,
        impl=signature_impl,
    )


def embedding_delta_pairs(
    batch: DataFrame,
    state: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 12,
    num_bands: int = 4,
    dim: int | None = None,
    signature_impl: str = "expr",
    max_bucket_size: int | None = None,
    batch_sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs between a NEW embedding batch and the PERSISTED
    corpus state — (left_id: batch vector, right_id: historical vector,
    cosine >= threshold) — without recomputing a single historical
    signature.

    Per-cycle cost: O(batch) signature compute, one (band, sig)-keyed
    join of the batch's band rows against the state table (bucketed on
    ``("band", "sig")`` at cluster scale — only the batch side
    shuffles), then cosine
    verification proportional to CROSS candidates: the historical
    vectors are read back id-pruned from ``corpus`` (<<1% semi-join —
    keep the corpus bucketed on ``id_col``). Verification is the
    certified expr dot fold; a candidate flood past ~10^8 pairs wants
    the tiled-GEMM pattern of :func:`_exact_pairs_gemm` instead — at
    that point the real problem is plane count, not verify speed (see
    :func:`embedding_band_state` on re-indexing).

    ``num_planes``/``num_bands``/``dim``/``signature_impl`` must match
    the state's pinned store contract. ``batch_sigs`` optionally feeds
    precomputed batch band rows so a loop that also appends them
    (:func:`embedding_state_append`) signs the batch once."""
    sigs = (
        batch_sigs
        if batch_sigs is not None
        else embedding_band_state(
            batch, vec_col, id_col, num_planes, num_bands, dim, signature_impl
        )
    ).select(F.col(id_col).alias("left_id"), "band", "sig")
    rb = state.select(F.col(id_col).alias("right_id"), "band", "sig")
    if max_bucket_size is not None:
        from .skew import drop_oversized_groups

        sigs = drop_oversized_groups(sigs, ["band", "sig"], max_bucket_size)
        rb = drop_oversized_groups(rb, ["band", "sig"], max_bucket_size)
    cand = materialize(
        sigs.join(rb, ["band", "sig"]).select("left_id", "right_id").dropDuplicates()
    )
    # BOTH sides are id-pruned to the candidate set before the
    # vector-width verify joins (the minhash twin's side_shingles
    # semi-join discipline): the shuffle then carries
    # O(candidates * dim) bytes, not O(batch * dim)
    batch_ids = cand.select(F.col("left_id").alias(id_col)).dropDuplicates()
    va = _normalized_vectors(
        batch.join(batch_ids, id_col, "left_semi"), vec_col, id_col
    ).select(F.col(id_col).alias("left_id"), F.col("_sv").alias("va"))
    hist_ids = cand.select(F.col("right_id").alias(id_col)).dropDuplicates()
    vb = _normalized_vectors(
        corpus.join(hist_ids, id_col, "left_semi"), vec_col, id_col
    ).select(F.col(id_col).alias("right_id"), F.col("_sv").alias("vb"))
    return _verified_cosine_pairs(cand, va, vb, "left_id", "right_id", threshold)


def embedding_dedup_delta(
    batch: DataFrame,
    state: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 12,
    num_bands: int = 4,
    dim: int | None = None,
    signature_impl: str = "expr",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """One cycle of the incremental embedding dedup loop: the batch
    vectors that near-duplicate NO historical vector (persisted state,
    history-first — ids never decide against history) and are not
    beaten by a smaller-id batch vector in the whole-batch internal
    sweep — the same two loser rules, same order-free semantics, as
    :func:`dedup_minhash.minhash_dedup_delta`, over cosine instead of
    Jaccard. The batch is signed ONCE (persisted band rows feed both
    the history probe and the internal self-join); append
    :func:`embedding_state_append` of the survivors to complete the
    cycle. Zero-norm vectors have no cosine to anyone and pass through
    as survivors."""
    sigs = embedding_band_state(
        batch, vec_col, id_col, num_planes, num_bands, dim, signature_impl
    )
    sigs.persist()
    try:
        # The history probe and the batch-internal sweep share ONE
        # tagged CANDIDATE pass (round-12 restructure, kept): a cycle
        # previously ran four eager executions; fusing the candidate
        # materialization cut that without changing a single pair.
        # The VERIFICATION is split per branch again (round-13, same
        # finding as the minhash twin): the tagged-union verify
        # measured 1.8x slower at sf1 (bench_scale_delta_ab —
        # old-split 16.8 s vs tagged-union 30.9 s) because the union
        # side defeats per-branch broadcast planning. id_a is always a
        # BATCH id; id_b is a corpus id on '_src'='h' rows and a batch
        # id on '_src'='i' rows (ids may collide across sides, so the
        # branches must never be mixed without the tag).
        lb = sigs.select(F.col(id_col).alias("id_a"), "band", "sig")
        rb = state.select(F.col(id_col).alias("id_b"), "band", "sig")
        ib = sigs
        if max_bucket_size is not None:
            from .skew import drop_oversized_groups

            lb = drop_oversized_groups(lb, ["band", "sig"], max_bucket_size)
            rb = drop_oversized_groups(rb, ["band", "sig"], max_bucket_size)
            ib = drop_oversized_groups(sigs, ["band", "sig"], max_bucket_size)
        hist_cand = lb.join(rb, ["band", "sig"]).select(
            "id_a", "id_b", F.lit("h").alias("_src")
        )
        a = ib.select(F.col(id_col).alias("id_a"), "band", "sig")
        b = ib.select(F.col(id_col).alias("id_b"), "band", "sig")
        int_cand = (
            a.join(b, ["band", "sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", F.lit("i").alias("_src"))
        )
        # dropDuplicates includes the tag, so dedup stays per-branch —
        # identical to the two separate dropDuplicates it replaces
        cand = materialize(
            hist_cand.unionByName(int_cand).dropDuplicates(
                ["_src", "id_a", "id_b"]
            )
        )
        # BOTH sides id-pruned to the candidate set before the
        # vector-width verify joins (the minhash twin's side_shingles
        # semi-join discipline): the shuffle then carries
        # O(candidates * dim) bytes, not O(batch * dim). Each branch
        # verifies through its OWN join (r13 — see the tagged-union
        # note above), consumed lazily by the returned plan, so the
        # eager executions stay at one (the candidate checkpoint).
        hist_cand_v = cand.filter(F.col("_src") == "h").select("id_a", "id_b")
        int_cand_v = cand.filter(F.col("_src") == "i").select("id_a", "id_b")
        dot = F.aggregate(
            F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

        def _branch_pairs(cand_v, right_src):
            la = cand_v.select(F.col("id_a").alias(id_col)).dropDuplicates()
            va = _normalized_vectors(
                batch.join(la, id_col, "left_semi"), vec_col, id_col
            ).select(F.col(id_col).alias("id_a"), F.col("_sv").alias("va"))
            rb_ids = cand_v.select(F.col("id_b").alias(id_col)).dropDuplicates()
            vb = _normalized_vectors(
                right_src.join(rb_ids, id_col, "left_semi"), vec_col, id_col
            ).select(F.col(id_col).alias("id_b"), F.col("_sv").alias("vb"))
            return (
                cand_v.join(va, "id_a")
                .join(vb, "id_b")
                .select("id_a", "id_b", dot.alias("cosine"))
                .filter(F.col("cosine") >= threshold)
            )

        hist_losers = (
            _branch_pairs(hist_cand_v, corpus)
            .select(F.col("id_a").alias(id_col))
            .dropDuplicates()
        )
        idups = _branch_pairs(int_cand_v, batch).select("id_a", "id_b")
        internal_survivors = _drop_pair_losers(
            batch, idups, id_col, transitive=False, eager=False
        )
        return internal_survivors.join(hist_losers, id_col, "left_anti")
    finally:
        sigs.unpersist()


def embedding_state_append(
    survivors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    num_bands: int = 4,
    dim: int | None = None,
    signature_impl: str = "expr",
    batch_sigs: DataFrame | None = None,
) -> DataFrame:
    """The state rows a completed cycle appends: band rows of the batch
    vectors that survived :func:`embedding_dedup_delta` (``num_bands``
    rows per non-zero-norm survivor). Same pinned plane-family contract
    as :func:`embedding_band_state`; appended to the same
    sig-bucketed table. ``batch_sigs`` accepts the whole batch's
    precomputed band rows (compute :func:`embedding_band_state` once
    per cycle, share with :func:`embedding_delta_pairs`) — the append
    is then a survivor-id semi-join instead of re-signing; identical
    output either way."""
    if batch_sigs is not None:
        return batch_sigs.join(
            survivors.select(id_col).dropDuplicates(), id_col, "left_semi"
        )
    return embedding_band_state(
        survivors, vec_col, id_col, num_planes, num_bands, dim, signature_impl
    )
