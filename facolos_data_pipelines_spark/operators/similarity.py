"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (search only the query's bucket ± probes).
Dot products run JVM-side via zip_with/aggregate; a vectorized Pandas
UDF variant is provided because at wide dims numpy's BLAS matmul beats
per-element codegen — bench.py decides which one the headline query
uses.

Scale design: brute-force top-k is a single narrow pass + a k-row
TakeOrdered (no full sort, no shuffle of the corpus); LSH cuts the
scanned fraction to ~1/2^planes. IVF-style coarse quantization would
slot in the same way (bucket id = argmin centroid) once a trained
codebook is supplied.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _seeded_plane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: numpy RNG seeded by the
    plane index, so executors and the driver agree without broadcasting
    state."""
    import numpy as np

    rng = np.random.default_rng(1_000_003 * (plane_idx + 1))
    v = rng.standard_normal(dim)
    return [float(x) for x in v]


def dot_literal(vec_col: Column, plane: list[float]) -> Column:
    """vec . constant-plane via zip_with against an array literal."""
    lit_plane = F.array(*[F.lit(x) for x in plane])
    return F.aggregate(
        F.zip_with(vec_col, lit_plane, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def hyperplane_signature(
    vec_col: Column, num_planes: int = 8, dim: int | None = None, plane_offset: int = 0
) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(vec . plane_i),
    packed into a long. dim defaults to 64 (the synthetic table's
    width); pass the real dimension in production.

    ``plane_offset`` shifts the plane family (plane index =
    plane_offset + i) so banded LSH (dedup.embedding_near_dup_pairs)
    gets independent planes per band. Planes are deterministic
    literals (seeded by index alone), so any engine can reproduce the
    exact signature — the DuckDB oracle twin does.

    The vector width MUST equal ``dim``: a mismatch is a run-time
    error (raise_error), never a silent degradation — zip_with would
    otherwise NULL-pad the dot, zero every signature, and collapse
    all LSH blocking into one bucket (an O(n^2) join that still
    "works" on small data and hangs at scale)."""
    d = dim or 64
    width_ok = F.size(vec_col) == d
    guard = F.raise_error(
        F.concat(
            F.lit(f"hyperplane_signature: vector width "),
            F.size(vec_col).cast("string"),
            F.lit(f" != dim {d}; pass the embedding's real dimension"),
        )
    ).cast("long")
    bits = [
        F.when(
            width_ok & (dot_literal(vec_col, _seeded_plane(d, plane_offset + i)) > 0),
            F.lit(1 << i).cast("long"),
        )
        .when(~width_ok, guard)
        .otherwise(F.lit(0).cast("long"))
        for i in range(num_planes)
    ]
    out = F.lit(0).cast("long")
    for b in bits:
        out = out.bitwiseOR(b)
    return out


def banded_signatures(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    num_planes: int = 6,
    num_bands: int = 4,
    dim: int | None = None,
    out_id: str = "id",
    impl: str = "expr",
) -> DataFrame:
    """(out_id, band, sig) rows: one banded hyperplane-LSH signature per
    band, plane family disjoint across bands (plane index =
    band * num_planes + i). The shared blocking primitive behind
    embedding near-dup and the LSH k-NN join — only (id, band, sig)
    rows ever shuffle.

    ``impl`` selects how the num_bands*num_planes plane dots are
    computed per row:

    - ``"expr"`` (default): JVM zip_with/aggregate folds — interpreted
      per element, but the summation order is bit-identical to the
      DuckDB oracle's ``list_sum``, so this is the CERTIFIED plan.
    - ``"arrow"``: one numpy matmul per Arrow batch (mapInPandas) —
      measured ~10x faster on the signature stage at sf1 and the
      production scale path for wide dims. The sign of a dot can
      differ from the fold's for |dot| within float ulp of 0 (summation
      order), flipping that vector's bucket in one band: near-dup
      RECALL is unaffected in practice (near-orthogonal planes carry
      no signal about near-identical pairs) but cross-engine signature
      equality is no longer bit-guaranteed — keep ``"expr"`` wherever
      an external system must reproduce the buckets.

    Both impls enforce the same loud width contract: a vector whose
    width differs from ``dim`` raises rather than silently collapsing
    the blocking into one bucket."""
    if impl == "arrow":
        return _banded_signatures_arrow(
            df, vec_col, id_col, num_planes, num_bands, dim, out_id
        )
    if impl != "expr":
        raise ValueError(f"banded_signatures: impl={impl!r}; expected 'expr' or 'arrow'")
    arr = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                hyperplane_signature(
                    F.col(vec_col), num_planes, dim, plane_offset=band * num_planes
                ).alias("sig"),
            )
            for band in range(num_bands)
        ]
    )
    return df.select(F.col(id_col).alias(out_id), F.explode(arr).alias("_bs")).select(
        out_id, F.col("_bs.band").alias("band"), F.col("_bs.sig").alias("sig")
    )


def _banded_signatures_arrow(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    num_planes: int,
    num_bands: int,
    dim: int | None,
    out_id: str,
) -> DataFrame:
    """Arrow/numpy twin of the expression signatures: per Arrow batch,
    one (rows x dim) @ (dim x bands*planes) matmul computes every
    plane dot, signs pack into per-band longs. Only (id, band, sig)
    rows leave Python. Closure binds numpy-level state by value
    (cloudpickle), no package import on executors."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    d = dim or 64
    planes = np.stack(
        [
            np.asarray(_seeded_plane(d, band * num_planes + i))
            for band in range(num_bands)
            for i in range(num_planes)
        ],
        axis=1,
    )  # (dim, bands*planes)
    bits = np.asarray(
        [1 << i for _ in range(num_bands) for i in range(num_planes)],
        dtype=np.int64,
    )
    band_idx = np.asarray(
        [b for b in range(num_bands) for _ in range(num_planes)], dtype=np.int64
    )
    nb = num_bands

    schema = T.StructType(
        [
            T.StructField(out_id, T.LongType()),
            T.StructField("band", T.IntegerType()),
            T.StructField("sig", T.LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            widths = pdf[vec_col].map(len).to_numpy()
            if (widths != d).any():
                bad = int(widths[widths != d][0])
                raise ValueError(
                    f"banded_signatures: vector width {bad} != dim {d}; "
                    "pass the embedding's real dimension"
                )
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            dots = mat @ planes  # (rows, bands*planes)
            contrib = np.where(dots > 0, bits, 0)  # (rows, bands*planes)
            sigs = np.zeros((len(pdf), nb), dtype=np.int64)
            for b in range(nb):
                sigs[:, b] = contrib[:, band_idx == b].sum(axis=1)
            ids = np.repeat(pdf[id_col].to_numpy(), nb)
            yield pd.DataFrame(
                {
                    out_id: ids,
                    "band": np.tile(np.arange(nb, dtype=np.int32), len(pdf)),
                    "sig": sigs.reshape(-1),
                }
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(run, schema)


def cosine_to_query(vec_col: Column, query: list[float]) -> Column:
    """Cosine(vec, constant query) — JVM-side.

    Zero-norm row vectors yield NULL (cosine undefined), never NaN —
    NaN compares greater than every double in Spark and would top any
    desc similarity ranking; NULLs sort last instead. A zero query
    vector is rejected outright."""
    q = [float(x) for x in query]
    qnorm = sum(x * x for x in q) ** 0.5
    if qnorm == 0.0:
        raise ValueError("query vector has zero norm; cosine is undefined")
    dot = dot_literal(vec_col, q)
    vnorm = F.sqrt(
        F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )
    return F.when(vnorm > 0, dot / (vnorm * F.lit(qnorm)))


def topk_bruteforce(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: score every vector, TakeOrdered k.

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — each
    partition keeps a k-heap and only k rows per partition reach the
    driver; no global sort, no shuffle of the corpus.
    """
    scored = df.select(
        F.col(id_col), cosine_to_query(F.col(vec_col), query).alias("cosine")
    ).filter(F.col("cosine").isNotNull())
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def topk_bruteforce_pandas(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Arrow-batched numpy variant: per-batch matmul + local top-k, then
    global top-k of the per-batch survivors. ~BLAS speed per batch;
    only k rows per batch leave Python."""
    import numpy as np
    import pandas as pd

    q = np.asarray(query, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn == 0.0:
        raise ValueError("query vector has zero norm; cosine is undefined")
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            # zero-norm rows have no defined cosine — exclude them (the
            # SQL twin cosine_to_query returns NULL for the same rows)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = np.where(norms > 0, (mat @ q) / (norms * qn), -np.inf)
            top = np.argsort(-cos)[:k]
            keep = top[np.isfinite(cos[top])]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[keep], "cosine": cos[keep]}
            )

    survivors = df.select(id_col, vec_col).mapInPandas(score, schema)
    return survivors.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def topk_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane signature
    is within ``probe_hamming`` bits of the query's (multi-probe LSH).

    The signature filter is a narrow predicate — at 100 TB it prunes
    ~ (1 - Σ C(p,i)/2^p) of the corpus before any scoring work.
    """
    dim = len(query)
    sig_col = hyperplane_signature(F.col(vec_col), num_planes, dim)

    qsig = 0
    for i in range(num_planes):
        plane = _seeded_plane(dim, i)
        if sum(a * b for a, b in zip(query, plane)) > 0:
            qsig |= 1 << i

    candidates = df.withColumn("_sig", sig_col).filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    return topk_bruteforce(candidates, query, k, vec_col, id_col)


def rrf_fuse(
    ranked: list[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k_rrf: int = 60,
    topk: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) over N
    candidate lists — the standard hybrid-retrieval combiner for a
    lexical list (``text.bm25_topk``) and a vector list
    (``topk_bruteforce`` / ``topk_ivf``): each candidate contributes
    ``1 / (k_rrf + rank_i)`` per list it appears in, ranks computed
    per-list by (score desc, id asc) so ties break deterministically.
    Returns (id, rrf_score, n_lists) — the fused top-``topk``.

    Inputs are BOUNDED retrieval results (top-k frames, k rows each),
    never corpora — per-list ranks are therefore computed with ONE
    aggregate per list: ``posexplode(sort_array(collect_list(
    struct(-score, id))))`` sorts <= k rows inside a single expression
    (ascending struct order == score desc, id asc — scores are
    non-null by retrieval construction), producing the exact
    ``row_number`` ranks with ZERO Window nodes, so the plan can never
    trip the unpartitioned-WindowExec warning that buries real
    single-partition regressions. The expensive corpus work stays
    inside the upstream retrieval operators with their own documented
    scale shapes. Fusion itself is a union of N tiny frames + one
    groupBy over <= N*k rows.
    """
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked list")
    if k_rrf < 1 or topk < 1:
        raise ValueError("rrf_fuse: k_rrf and topk must be >= 1")
    parts = []
    for df_i, score_col in ranked:
        ordered = F.sort_array(
            F.collect_list(
                F.struct(
                    (-F.col(score_col)).alias("_ns"), F.col(id_col).alias("_id")
                )
            )
        )
        parts.append(
            # NULL scores have no rank: the old desc-nulls-last window
            # put them LAST; ascending struct sort would put them FIRST
            # and hand the worst candidate the biggest RRF share — drop
            # them outright (a NULL-scored row is not a retrieval hit).
            # NaN is dropped for the same reason: Spark orders NaN above
            # every double, so -NaN (still NaN) would sort LAST ascending
            # while the old desc window ranked it FIRST — neither rank is
            # meaningful for a non-comparable score, so it gets none.
            df_i.filter(
                F.col(score_col).isNotNull()
                & ~F.isnan(F.col(score_col).cast("double"))
            )
            .agg(ordered.alias("_l"))
            .select(F.posexplode("_l").alias("_pos", "_e"))
            .select(
                F.col("_e._id").alias(id_col),
                (F.col("_pos") + 1).alias("_rank"),
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return (
        union.groupBy(id_col)
        .agg(
            F.round(
                F.sum(1.0 / (F.lit(float(k_rrf)) + F.col("_rank"))) + 1e-9,
                round_digits,
            ).alias("rrf_score"),
            F.count("*").cast("long").alias("n_lists"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(topk)
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: add ``_cell`` = argmax-cosine centroid id.

    Centroids come from any trained codebook (k-means on a sample; a
    seeded random subset works as a fallback — see ``ivf_train_lite``).
    Assignment is an Arrow-batched numpy matmul (k x dim per batch):
    at wide dims BLAS beats per-element codegen by an order of
    magnitude, and only one int column is added to the frame.
    """
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    fields = df.schema.fields
    out_schema = T.StructType(list(fields) + [T.StructField("_cell", T.IntegerType())])

    def assign(batches):
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            yield pdf.assign(_cell=np.argmax(mat @ Cn.T, axis=1).astype("int32"))

    return df.mapInPandas(assign, out_schema)


def _bounded_vec_sample(
    df: DataFrame,
    vec_col: str,
    sample_fraction: float,
    seed: int,
    max_rows: int,
    caller: str,
):
    """Collect a null-filtered, hard-capped vector sample as a float64
    matrix, raising a clear ValueError instead of an opaque np.stack
    crash when the sample comes back empty (tiny df x small fraction,
    or an all-null vector column)."""
    import numpy as np

    rows = [
        r[0]
        for r in df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .sample(fraction=sample_fraction, seed=seed)
        .limit(max_rows)
        .collect()
    ]
    if not rows:
        raise ValueError(
            f"{caller}: sampled zero non-null vectors "
            f"(sample_fraction={sample_fraction}); raise sample_fraction "
            "or check that the vector column is populated"
        )
    return np.stack(rows).astype(np.float64)


def ivf_train_lite(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float = 0.1,
    iterations: int = 3,
    seed: int = 42,
    max_rows: int = 100_000,
) -> list[list[float]]:
    """Tiny driver-side k-means on a sample — a stand-in codebook
    trainer (production would use MLlib KMeans on the full corpus).
    Deterministic via seed.

    The driver collect is hard-bounded by ``max_rows`` (``limit`` after
    the sample): a fraction-based sample alone grows linearly with the
    corpus and would OOM the driver at 100 TB. 100k x 64 doubles is
    ~50 MB — safe on any driver, and far more than k-means needs for a
    coarse codebook."""
    import numpy as np

    sample = _bounded_vec_sample(
        df, vec_col, sample_fraction, seed, max_rows, "ivf_train_lite"
    )
    rng = np.random.default_rng(seed)
    C = sample[rng.choice(len(sample), size=min(k, len(sample)), replace=False)]
    for _ in range(iterations):
        d = sample @ C.T
        labels = np.argmax(d, axis=1)
        for j in range(len(C)):
            members = sample[labels == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return [[float(x) for x in c] for c in C]


def ivf_train_distributed(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    dim: int = 64,
    iterations: int = 3,
    seed: int = 42,
    init_sample_fraction: float = 0.01,
) -> list[list[float]]:
    """Distributed k-means codebook trainer — the full-scale path the
    bounded :func:`ivf_train_lite` stands in for.

    Initialization draws k centroids from a tiny bounded sample; each
    iteration then (1) assigns cells executor-side via the Arrow matmul
    (:func:`ivf_assign`) and (2) updates centroids with ``dim``
    per-element AVG aggregates — map-side partial aggregation means the
    shuffle carries k x dim partials per task, and the driver only ever
    holds the k x dim codebook. Nothing driver-side scales with the
    corpus, so this trains on 100 TB as written (production would still
    prefer MLlib KMeans for k-means++ init and convergence checks).
    Empty cells keep their previous centroid.
    """
    import numpy as np

    init = [
        list(r[0])
        for r in df.select(vec_col)
        .sample(fraction=init_sample_fraction, seed=seed)
        .limit(max(k * 8, 64))
        .collect()
    ]
    if not init:
        raise ValueError(
            "ivf_train_distributed: the init sample returned no rows — "
            "empty input frame, or init_sample_fraction too small; raise it"
        )
    if len(init) < k:
        import warnings

        warnings.warn(
            f"ivf_train_distributed: init sample has {len(init)} rows < k={k}; "
            f"returning a {len(init)}-centroid codebook. Raise "
            "init_sample_fraction for a full-size codebook.",
            RuntimeWarning,
            stacklevel=2,
        )
    rng = np.random.default_rng(seed)
    pick = rng.choice(len(init), size=min(k, len(init)), replace=False)
    C = [init[i] for i in pick]
    for _ in range(iterations):
        assigned = ivf_assign(df, C, vec_col)
        aggs = [
            F.avg(F.col(vec_col)[i].cast("double")).alias(f"c{i}") for i in range(dim)
        ]
        rows = assigned.groupBy("_cell").agg(*aggs).collect()
        by_cell = {r["_cell"]: [r[f"c{i}"] for i in range(dim)] for r in rows}
        C = [by_cell.get(j, C[j]) for j in range(len(C))]
    return [[float(x) for x in c] for c in C]


def ivf_train(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    dim: int = 64,
    small_threshold: int = 100_000,
    iterations: int = 3,
    seed: int = 42,
    init_sample_fraction: float = 0.01,
) -> list[list[float]]:
    """Codebook trainer dispatch — THE default entry point for IVF.

    Corpora at or under ``small_threshold`` rows train driver-side
    (:func:`ivf_train_lite` on the full set — cheapest and exact for
    small data); anything larger trains with the distributed k-means
    rounds (:func:`ivf_train_distributed`), whose driver footprint is
    the k x dim codebook regardless of corpus size. The size probe is
    ``limit(threshold + 1).count()`` so it never scans past the
    threshold. Pass ``small_threshold=0`` to force the distributed
    path (e.g. to exercise it in tests)."""
    if (
        small_threshold > 0
        and df.limit(small_threshold + 1).count() <= small_threshold
    ):
        return ivf_train_lite(
            df,
            k,
            vec_col,
            sample_fraction=1.0,
            iterations=iterations,
            seed=seed,
            max_rows=small_threshold,
        )
    return ivf_train_distributed(
        df,
        k,
        vec_col,
        dim,
        iterations,
        seed,
        init_sample_fraction=init_sample_fraction,
    )


def topk_ivf(
    df: DataFrame,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF top-k: score only vectors in the ``n_probe`` cells nearest
    the query. The standard ANN scale path: the `_cell` filter prunes
    ~(1 - n_probe/k_cells) of the corpus before any scoring; on a
    `_cell`-partitioned layout the filter becomes partition pruning and
    the scan never touches the other cells' files.
    """
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probes = [int(i) for i in np.argsort(-(Cn @ q))[:n_probe]]
    assigned = ivf_assign(df, centroids, vec_col)
    candidates = assigned.filter(F.col("_cell").isin(probes)).drop("_cell")
    return topk_bruteforce(candidates, query, k, vec_col, id_col)


def knn_join_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_vec: str = "embedding",
    q_id: str = "vec_id",
    c_vec: str = "embedding",
    c_id: str = "vec_id",
) -> DataFrame:
    """k-NN join: for every query row, its top-k corpus neighbors.

    Broadcast the smaller side (queries), cross-score, window-rank per
    query. At scale: broadcast queries in chunks, or LSH-block both
    sides on shared signatures first.
    """
    from pyspark.sql import Window

    from .dedup import cosine_similarity

    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"))
    c = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def knn_join_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    q_vec: str = "embedding",
    q_id: str = "vec_id",
    c_vec: str = "embedding",
    c_id: str = "vec_id",
    num_planes: int = 6,
    num_bands: int = 4,
    dim: int | None = None,
    max_bucket_size: int | None = None,
    signature_impl: str = "expr",
) -> DataFrame:
    """Approximate k-NN join for LARGE query sides — the scale twin of
    :func:`knn_join_bruteforce`.

    Choosing between the two: broadcast-bruteforce is exact and right
    while the query side fits a broadcast (rule of thumb: under ~10 MB
    / a few thousand vectors — or chunk it); beyond that the cross
    product is the killer, and this variant blocks BOTH sides on
    shared banded hyperplane signatures (similarity.banded_signatures)
    so scoring happens only inside (band, sig) buckets. Both sides
    shuffle once on (band, sig) carrying only (id, band, sig) rows;
    vectors join back by id for scoring, proportional to candidates.
    Approximate: a query gets fewer than k neighbors when its buckets
    are thin — raise num_bands (recall) or lower num_planes (bucket
    width) to trade recall vs candidate count. Zero-norm rows never
    pair (NULL cosine filtered)."""
    from pyspark.sql import Window

    from .dedup import cosine_similarity

    qs = banded_signatures(queries, q_vec, q_id, num_planes, num_bands, dim,
                           "query_id", impl=signature_impl)
    cs = banded_signatures(corpus, c_vec, c_id, num_planes, num_bands, dim,
                           "neighbor_id", impl=signature_impl)
    if max_bucket_size is not None:
        # Degenerate hot buckets (e.g. many near-zero vectors all
        # landing on sig=0) would make the candidate join quadratic —
        # cap on the corpus side, same guard as embedding_near_dup_pairs
        # / lsh_candidate_pairs.
        from .skew import drop_oversized_groups

        cs = drop_oversized_groups(cs, ["band", "sig"], max_bucket_size)
    cand = qs.join(cs, ["band", "sig"]).select("query_id", "neighbor_id").dropDuplicates()
    qv = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"))
    cv = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("cv"))
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def ann_recall_at_k(
    approx: DataFrame, exact: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Index-quality gate: recall of an ANN candidate list against the
    exact answer — ``|approx ∩ exact| / |exact|`` plus the raw counts,
    one output row. This is how an IVF/PQ/LSH index earns its place in
    a pipeline: measure recall@k on a query sample BEFORE trusting the
    approximate path at corpus scale, and re-measure when the corpus
    drifts from the codebook's training distribution.

    Both inputs are top-k lists (k rows each), so the join and
    aggregate are driver-trivial at any corpus size — the cost lives
    in producing the lists, not comparing them."""
    a = approx.select(F.col(id_col).alias("_aid")).dropDuplicates()
    e = exact.select(F.col(id_col).alias("_eid")).dropDuplicates()
    # An empty exact list must surface as recall=0.0, not a NULL that a
    # `recall >= x` gate would silently misread.
    return e.join(a, e["_eid"] == a["_aid"], "left").agg(
        F.count("*").cast("long").alias("n_exact"),
        F.count("_aid").cast("long").alias("n_hit"),
        F.when(
            F.count("*") > 0, F.round(F.count("_aid") / F.count("*") + 1e-9, 4)
        )
        .otherwise(F.lit(0.0))
        .alias("recall"),
    )


def semantic_decontaminate(
    train: DataFrame,
    test: DataFrame,
    threshold: float = 0.9,
    train_vec: str = "embedding",
    train_id: str = "vec_id",
    test_vec: str = "embedding",
    test_id: str = "vec_id",
    blocked: bool = False,
    num_planes: int = 6,
    num_bands: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-space decontamination: drop every train row whose
    cosine to ANY test vector is >= ``threshold`` — the SEMANTIC twin
    of ``text.decontaminate`` (n-gram overlap) and
    ``text.decontaminate_bloom``. N-gram matching misses paraphrased
    test leakage; this catches it wherever the embedding space puts
    paraphrases near their source.

    Exact path (default): broadcast the test set (benchmark suites
    are thousands of rows — broadcast-size by construction),
    cross-score each train vector against it JVM-side, anti-join the
    distinct offenders. Cost |train| x |test| codegen dot products in
    ONE pass with no shuffle of the train side beyond the anti-join.

    ``blocked=True`` is the large-test-set path: banded hyperplane
    signatures (``banded_signatures``, shared seeded planes) on both
    sides, (train, test) rows colliding in any band become candidate
    PAIRS, and only those pairs are exactly verified — the same
    candidate-only discipline as ``embedding_near_dup_pairs``; the
    test set is never broadcast or cross-joined. Recall follows the
    LSH band/plane geometry, so keep the exact path wherever the test
    set broadcasts.

    Zero-norm vectors (cosine undefined -> NULL) are never flagged;
    they survive on the train side and never match on the test side.
    """
    from .dedup import cosine_similarity

    if not 0.0 < threshold <= 1.0:
        raise ValueError("semantic_decontaminate: threshold must be in (0, 1]")
    if blocked:
        tr_sig = banded_signatures(
            train, train_vec, train_id, num_planes, num_bands, dim, out_id="_tid"
        )
        te_sig = banded_signatures(
            test, test_vec, test_id, num_planes, num_bands, dim, out_id="_qid"
        )
        cand = tr_sig.join(te_sig, ["band", "sig"]).select("_tid", "_qid").dropDuplicates()
        tv = train.select(F.col(train_id).alias("_tid"), F.col(train_vec).alias("_v"))
        qv = test.select(F.col(test_id).alias("_qid"), F.col(test_vec).alias("_tv"))
        hits = (
            cand.join(tv, "_tid")
            .join(qv, "_qid")
            .filter(cosine_similarity(F.col("_v"), F.col("_tv")) >= threshold)
            .select(F.col("_tid").alias(train_id))
            .dropDuplicates()
        )
    else:
        t = test.select(F.col(test_vec).alias("_tv"))
        hits = (
            train.select(F.col(train_id), F.col(train_vec).alias("_v"))
            .crossJoin(F.broadcast(t))
            .filter(cosine_similarity(F.col("_v"), F.col("_tv")) >= threshold)
            .select(train_id)
            .dropDuplicates()
        )
    return train.join(hits, train_id, "left_anti")


MAX_LITERAL_CENTROIDS = 256


def assign_nearest_centroid(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "cluster_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """Nearest-centroid assignment (the k-means E-step / coarse IVF
    quantizer) as pure JVM expressions — the oracle-checkable twin of
    the Arrow-matmul :func:`ivf_assign` fast path.

    The k centroid rows are inlined as plan literals (k is bounded by
    ``MAX_LITERAL_CENTROIDS`` — collecting them is the same k-row
    driver hop a broadcast would make, not a data-dependent collect),
    so the whole operator is ONE narrow projection: per row, a
    ``transform`` over the k (dist, cid) structs — squared L2 via
    ``zip_with``/``aggregate`` in index order, bit-reproducible across
    engines — and argmin via ``array_min`` struct ordering, which
    tie-breaks on the lower cluster id. Zero shuffles, zero joins,
    whole-stage codegen end to end; at 100 TB the cost is exactly one
    pass over the embeddings. Prefer :func:`ivf_assign` when k is large
    enough that BLAS matmul beats k codegen'd fold loops (~k > 64) and
    the assignment need not be engine-portable.
    """
    rows = centroids.select(
        F.col(centroid_id_col).alias("cid"), F.col(centroid_vec_col).alias("cvec")
    ).collect()
    if not rows:
        raise ValueError("assign_nearest_centroid: empty centroid frame")
    if len(rows) > MAX_LITERAL_CENTROIDS:
        raise ValueError(
            f"assign_nearest_centroid: {len(rows)} centroids exceeds the "
            f"literal-plan bound ({MAX_LITERAL_CENTROIDS}); use ivf_assign"
        )
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(r["cid"]).alias("cid"),
                F.array(*[F.lit(float(x)) for x in r["cvec"]]).alias("v"),
            )
            for r in rows
        ]
    )
    dists = F.transform(
        cent_arr,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    c["v"],
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )
    best = F.array_min(dists)
    return embeddings.select(
        F.col(id_col),
        best["cid"].alias(centroid_id_col),
        best["dist"].alias("sq_dist"),
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011 — "Product Quantization for
# Nearest Neighbor Search"): compress vectors to m small codes, answer
# top-k with an asymmetric-distance lookup table. THE standard way to
# hold a billion-vector index in memory — a 64-dim float vector (256 B)
# becomes m=8 one-byte codes.
# ---------------------------------------------------------------------------


def _kmeans_l2(data, k: int, iterations: int, seed: int):
    """Seeded Lloyd's iterations under squared-L2 on a numpy array."""
    import numpy as np

    rng = np.random.default_rng(seed)
    C = data[rng.choice(len(data), size=min(k, len(data)), replace=False)].copy()
    for _ in range(iterations):
        d = ((data[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        labels = d.argmin(axis=1)
        for j in range(len(C)):
            members = data[labels == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def pq_train(
    df: DataFrame,
    num_subspaces: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    sample_fraction: float = 0.1,
    iterations: int = 5,
    seed: int = 42,
    max_rows: int = 100_000,
) -> list[list[list[float]]]:
    """Train PQ codebooks: split the vector into ``num_subspaces``
    contiguous slices and run an independent squared-L2 k-means per
    slice on one bounded sample (same ``max_rows`` driver-safety cap
    as :func:`ivf_train_lite`; production swaps in MLlib KMeans per
    subspace). Returns ``codebooks[j][c]`` = centroid c of subspace j.
    Deterministic via seed. The vector width must divide evenly into
    ``num_subspaces``."""
    sample = _bounded_vec_sample(
        df, vec_col, sample_fraction, seed, max_rows, "pq_train"
    )
    dim = sample.shape[1]
    if dim % num_subspaces:
        raise ValueError(
            f"pq_train: dim {dim} not divisible by num_subspaces {num_subspaces}"
        )
    dsub = dim // num_subspaces
    return [
        [
            [float(x) for x in c]
            for c in _kmeans_l2(
                sample[:, j * dsub : (j + 1) * dsub], k, iterations, seed + j
            )
        ]
        for j in range(num_subspaces)
    ]


def pca_train(
    df: DataFrame,
    n_components: int,
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    seed: int = 7,
    max_rows: int = 200_000,
    center: bool = True,
) -> dict:
    """Train a PCA dimensionality reduction on a BOUNDED vector sample
    (same driver-safety cap as :func:`ivf_train_lite`/:func:`pq_train`)
    and return it as plain floats: ``{"mean": [...], "components":
    [[...], ...], "explained_variance_ratio": [...]}`` — ready for
    :func:`pca_project`'s expression-only inference, persistable as
    JSON (the quality_model contract: training never scales with the
    corpus, inference never needs a runtime).

    The usual pre-ANN step: reducing 768d -> 64-128d cuts IVF/PQ/LSH
    signature cost ~linearly in dim while keeping neighbor structure.
    numpy SVD on the sample; components carry a deterministic sign
    convention (largest-|coefficient| entry positive) so re-training on
    the same sample reproduces the same matrix bit-for-bit.
    """
    import numpy as np

    sample = _bounded_vec_sample(
        df, vec_col, sample_fraction, seed, max_rows, "pca_train"
    )
    dim = sample.shape[1]
    if not 1 <= n_components <= dim:
        raise ValueError(
            f"pca_train: n_components={n_components} outside [1, dim={dim}]"
        )
    mean = sample.mean(axis=0) if center else np.zeros(dim)
    _, s, vt = np.linalg.svd(sample - mean, full_matrices=False)
    comps = vt[:n_components]
    # sign convention: flip each component so its largest-|x| entry > 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    var = s**2
    evr = var / var.sum() if var.sum() > 0 else var
    return {
        "mean": [float(x) for x in mean],
        "components": [[float(x) for x in c] for c in comps],
        "explained_variance_ratio": [float(x) for x in evr[:n_components]],
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto a trained PCA basis as PURE COLUMN
    EXPRESSIONS: per output dimension one :func:`dot_literal` fold of
    the raw vector against the component, minus the precomputed
    ``mean . component`` offset (algebraically identical to centering
    first, but the centering never touches the data — one narrow
    codegen projection, no UDF, no shuffle, the plan shape that runs
    over 100 TB). Output is ``array<double>`` of ``n_components``.

    For very wide (dim x components) products where the expression tree
    gets large, batch through the Arrow scorer instead (the
    :func:`topk_bruteforce_pandas` pattern); at the typical reduction
    shapes (<=1024 in, <=128 out) the expression form stays inside
    codegen limits.
    """
    comps = model["components"]
    mean = model.get("mean") or [0.0] * len(comps[0])
    offsets = [
        float(sum(m * c for m, c in zip(mean, comp))) for comp in comps
    ]
    vec = F.col(vec_col)
    proj = F.array(
        *[
            dot_literal(vec, comp) - F.lit(off)
            for comp, off in zip(comps, offsets)
        ]
    )
    return df.withColumn(out_col, proj)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: list[str] | None = None,
) -> DataFrame:
    """Encode every vector as ``codes[j]`` = nearest codebook-j
    centroid of its j-th slice (squared L2, lower code wins ties via
    the same array_min struct ordering as assign_nearest_centroid).
    ``keep`` names extra input columns carried through unchanged
    (encode_ivfpq threads its cell id this way instead of re-joining).

    The codebooks inline as plan literals (m x k tiny vectors — the
    same bounded-literal reasoning as assign_nearest_centroid), so the
    whole encode is ONE narrow codegen projection: per row,
    ``num_subspaces`` slice-argmin folds. Zero shuffles, zero Python —
    at 100 TB this is a single pass that REPLACES the vector column
    with codes at a ~32x memory reduction, which is the entire point:
    the downstream index fits where the raw vectors never would."""
    m = len(codebooks)
    if not m:
        raise ValueError("pq_encode: empty codebooks")
    dsub = len(codebooks[0][0])
    vec = F.col(vec_col)

    def subspace_code(sub, cb):
        # closure keeps `sub` out of the transform lambda's signature
        # (a second lambda arg would be treated as the element index)
        cent_arr = F.array(
            *[
                F.struct(
                    F.lit(ci).alias("code"),
                    F.array(*[F.lit(float(x)) for x in cvec]).alias("v"),
                )
                for ci, cvec in enumerate(cb)
            ]
        )
        dists = F.transform(
            cent_arr,
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(
                        sub,
                        c["v"],
                        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                c["code"].alias("code"),
            ),
        )
        return F.array_min(dists)["code"]

    codes = [
        subspace_code(F.slice(vec, j * dsub + 1, dsub), cb)
        for j, cb in enumerate(codebooks)
    ]
    carried = [F.col(c) for c in (keep or [])]
    return df.select(F.col(id_col), *carried, F.array(*codes).alias("codes"))


def pq_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    dist_col: str = "approx_dist",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query is sliced
    once driver-side into an m x k lookup table of exact
    slice-to-centroid squared distances (tiny — it never touches the
    cluster), and each row's approximate distance is the sum of m
    array-literal lookups indexed by its codes. Pure codegen
    arithmetic per row, then TakeOrderedAndProject (per-partition
    k-heaps, no global sort; rounded distance + id tie-break keeps the
    cutoff deterministic). This is the scan shape that serves
    billion-vector ANN from RAM: O(m) adds per candidate instead of
    O(dim) multiplies against a vector that no longer exists."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(query) != m * dsub:
        raise ValueError(
            f"pq_topk: query width {len(query)} != {m}x{dsub} codebook geometry"
        )
    luts = []
    for j, cb in enumerate(codebooks):
        qj = [float(x) for x in query[j * dsub : (j + 1) * dsub]]
        lut = []
        for cvec in cb:
            d = 0.0
            for a, b in zip(qj, cvec):
                d += (a - b) * (a - b)
            lut.append(d)
        luts.append(lut)
    dist = None
    for j, lut in enumerate(luts):
        term = F.element_at(
            F.array(*[F.lit(d) for d in lut]), F.col("codes")[j] + 1
        )
        dist = term if dist is None else dist + term
    return (
        codes.select(
            F.col(id_col), F.round(dist + 1e-9, 4).alias(dist_col)
        )
        .orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
        .limit(k)
    )


def encode_ivfpq(
    df: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ index build (the FAISS IVFPQ layout): assign each vector
    to its nearest coarse centroid, subtract that centroid, and
    PQ-encode the RESIDUAL — residuals are smaller and more isotropic
    than raw vectors, so the same codebook budget quantizes them with
    far less error (Jégou et al. 2011 §IV). Output: (id, _cell, codes).

    One narrow codegen pass end to end: the coarse assignment is the
    SAME literal-centroid argmin expression assign_nearest_centroid
    builds (inlined here so no join is needed), the residual is a
    zip_with against the same literals resolved per row from the
    assigned cell, and the PQ slice-argmins run on the residual
    column with the cell id threaded through ``pq_encode(keep=...)``.
    Zero shuffles, zero joins; written `partitionBy('_cell')`, the
    probe filter below becomes partition pruning."""
    cents = [[float(x) for x in c] for c in coarse_centroids]
    if not cents:
        raise ValueError("encode_ivfpq: empty coarse centroids")
    if len(cents) > MAX_LITERAL_CENTROIDS:
        raise ValueError(
            f"encode_ivfpq: {len(cents)} coarse centroids exceeds the "
            f"literal-plan bound ({MAX_LITERAL_CENTROIDS})"
        )
    vec = F.col(vec_col)
    cent_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(x) for x in c]).alias("v"),
            )
            for i, c in enumerate(cents)
        ]
    )
    dists = F.transform(
        cent_structs,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(
                    vec,
                    c["v"],
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )
    cent_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in cents])
    assigned = df.select(
        F.col(id_col), vec.alias("_v"), F.array_min(dists)["cid"].alias("_cell")
    )
    with_res = assigned.select(
        F.col(id_col),
        F.col("_cell"),
        F.zip_with(
            F.col("_v"),
            F.element_at(cent_arr, F.col("_cell") + 1),
            lambda a, b: a.cast("double") - b,
        ).alias("_residual"),
    )
    return pq_encode(with_res, codebooks, "_residual", id_col, keep=["_cell"])


def topk_ivfpq(
    index: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    dist_col: str = "approx_dist",
    rerank_with: DataFrame | None = None,
    rerank_factor: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ query: probe the ``n_probe`` cells whose coarse centroid
    is nearest the query (squared L2), build ONE per-cell ADC lookup
    table from the query's residual against that cell's centroid
    (driver-side, m x k x n_probe floats — never touches the cluster),
    and scan only the probed cells' codes. This is the architecture
    that serves billion-vector ANN: the cell filter prunes
    ~(1 - n_probe/n_cells) of the corpus BEFORE any distance math (on
    a `_cell`-partitioned layout it is partition pruning), and each
    surviving row costs m array lookups. Rounded distance + id
    tie-break keeps the top-k cutoff deterministic.

    ``rerank_with`` adds the IVFADC-with-refinement stage (Jégou et
    al.): ADC retrieves ``rerank_factor * k`` candidates, then their
    EXACT squared-L2 distances re-rank them from the given
    (id, vector) frame and the true top-k of the candidate set comes
    back in ``dist_col``. The refinement join touches only
    ``rerank_factor * k`` ids (a left-semi lookup against the vector
    table — broadcast-trivial), so it adds recall without giving back
    the PQ scan's pruning; this is how a production pipeline turns a
    coarse 16-centroid-per-subspace codebook into >=0.9 recall@k."""
    import numpy as np

    C = np.asarray(coarse_centroids, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    d2 = ((C - q) ** 2).sum(axis=1)
    # Stable sort so equidistant coarse centroids tie-break on cell id,
    # matching the oracle's ORDER BY (dist, cell) — plain argsort is
    # unstable and could probe different cells across runs/engines.
    probes = [int(i) for i in np.argsort(d2, kind="stable")[:n_probe]]
    k_retrieve = k if rerank_with is None else max(k, rerank_factor * k)
    per_cell = []
    for cell in probes:
        resid = [float(x) for x in (q - C[cell])]
        per_cell.append(
            pq_topk(
                index.filter(F.col("_cell") == cell),
                codebooks,
                resid,
                k_retrieve,
                id_col,
                dist_col,
            )
        )
    out = per_cell[0]
    for p in per_cell[1:]:
        out = out.unionByName(p)
    if rerank_with is None:
        return out.orderBy(F.col(dist_col).asc(), F.col(id_col).asc()).limit(k)
    cands = (
        out.orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
        .limit(k_retrieve)
        .select(id_col)
    )
    qarr = F.array(*[F.lit(float(x)) for x in query])
    exact_d = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            qarr,
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        rerank_with.join(F.broadcast(cands), id_col, "left_semi")
        .select(F.col(id_col), F.round(exact_d + 1e-9, 4).alias(dist_col))
        .orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_outliers(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    z_threshold: float = 3.0,
    dim: int | None = None,
) -> DataFrame:
    """Per-vector centroid-distance z-scores — the embedding-space
    quality gate that catches corrupt rows (zeroed vectors, wrong
    preprocessing, truncated decodes) BEFORE they poison ANN indexes
    and semantic dedup: such rows land far from the data manifold, so
    their distance to the corpus centroid is a distribution outlier.

    Returns every row as (id, ``dist`` to centroid, ``z`` score,
    ``is_outlier``) — selection stays with the caller (filter, audit
    sample, or route to re-embedding). ``is_outlier`` compares the
    ROUNDED z to ``z_threshold``, so the flag is reproducible across
    engines: the unrounded z carries ~1e-12 of summation-order noise
    (see below) and a raw ``>`` at the threshold could flip between
    runs; after round-to-4 the comparison is exact.

    Cost shape at 100 TB: the centroid is ONE map-side-combined
    aggregate pass computing all ``dim`` per-dimension means together
    (no posexplode — that would shuffle n*dim rows for a dim-row
    answer); it collects as a single row bounded by ``dim`` and
    returns as literals, so the distance is a pure codegen fold
    (ordered per-vector summation — deterministic). The z-scale
    (mean/stddev of distance) is a second 1-row broadcast. Two scans
    total, nothing driver-side scales with the corpus. Cross-row
    float reductions (means, stddev) accumulate in partition order,
    hence the documented ~1e-12 noise the rounding absorbs —
    identical convention to the money-sum oracles. A zero-spread
    distance distribution (all vectors identical) yields z = 0
    everywhere, not a division by zero.

    ``dim=None`` (the default) infers the width from the first non-null
    vector — one bounded driver probe — so the operator works on any
    embedding width without configuration; an explicit ``dim`` is still
    validated row-by-row in-plan (the raise_error guard) so ragged
    corpora fail loudly, not silently.
    """
    if dim is None or dim == 0:
        probe = (
            df.filter(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)).alias("_w"))
            .head(1)
        )
        if not probe:
            raise ValueError(
                "embedding_outliers: empty input frame (or all-NULL "
                f"{vec_col!r}) — cannot infer the embedding dimension"
            )
        d = int(probe[0]["_w"])
        if d <= 0:
            raise ValueError(
                f"embedding_outliers: first non-null {vec_col!r} vector is "
                "empty; pass dim explicitly"
            )
    else:
        d = int(dim)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    width_ok = F.size(F.col(vec_col)) == d
    guard = F.raise_error(
        F.concat(
            F.lit("embedding_outliers: vector width "),
            F.size(F.col(vec_col)).cast("string"),
            F.lit(f" != dim {d}; pass the embedding's real dimension"),
        )
    ).cast("double")
    vecs = df.select(
        F.col(id_col),
        F.when(width_ok, vec).otherwise(F.array(guard)).alias("_v"),
    )
    centroid_row = vecs.agg(
        *[F.avg(F.element_at("_v", i + 1)).alias(f"_m{i}") for i in range(d)]
    ).collect()[0]
    if centroid_row[0] is None:
        raise ValueError(
            "embedding_outliers: empty input frame (or all-NULL "
            f"{vec_col!r}) — the corpus centroid is undefined"
        )
    centroid = F.array(*[F.lit(float(centroid_row[i])) for i in range(d)])
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("_v"), centroid, lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    dists = vecs.select(F.col(id_col), dist.alias("_dist"))
    scale = dists.agg(
        F.avg("_dist").alias("_mu"), F.stddev_samp("_dist").alias("_sigma")
    )
    z = F.when(
        F.col("_sigma") > 0, (F.col("_dist") - F.col("_mu")) / F.col("_sigma")
    ).otherwise(F.lit(0.0))
    z_rounded = F.round(z + 1e-8, 4)
    return dists.crossJoin(F.broadcast(scale)).select(
        F.col(id_col),
        F.round(F.col("_dist") + 1e-8, 4).alias("dist"),
        z_rounded.alias("z"),
        (z_rounded > z_threshold).alias("is_outlier"),
    )
