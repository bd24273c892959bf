"""Deduplication operators for large-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — all expressed with built-in higher-order functions
(transform/aggregate/zip_with + xxhash64), zero Python UDFs, so every
stage stays inside whole-stage codegen and scales by partitioning:

- exact dedup: one shuffle on the content hash;
- MinHash LSH: narrow signature computation, then one shuffle per
  band-bucket group-by — the standard way to near-dedup 100 TB of text
  without an O(n^2) comparison;
- SimHash: narrow 64-bit fingerprint, dedup on fingerprint buckets;
- verification (true Jaccard / cosine) runs only on LSH candidates.

These have no counterpart in the reference repo (its dedup is PK-based,
covered by operators.merge); they are the north-star extension surface
(BASELINE.json, SURVEY §7.3 step 8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mix (SplitMix64) for hash-family constants."""
    x = (x + 0x9E3779B97F4A7C15) & _U64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _U64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _U64
    return x ^ (x >> 31)


def _to_i64(x: int) -> int:
    """Reinterpret an unsigned 64-bit value as a signed Java long."""
    return x - (1 << 64) if x >= (1 << 63) else x


# Fixed 2-universal multiply-add family: h_i(x) = a_i * x + b_i over
# Z/2^64 (Java long wrap; requires ANSI off — callers on an ANSI
# session fall back to per-lane seeded xxhash64, see _lane_hash). One
# xxhash64 of the shingle string feeds all num_hashes MinHash lanes —
# 64-bit arithmetic instead of re-hashing the string per lane (measured
# ~3x faster end-to-end and a far smaller codegen unit).
_MAX_LANES = 256
_MINHASH_A = [_to_i64(_splitmix64(2 * i) | 1) for i in range(_MAX_LANES)]
_MINHASH_B = [_to_i64(_splitmix64(2 * i + 1)) for i in range(_MAX_LANES)]


def _ansi_enabled(df: DataFrame) -> bool:
    try:
        return df.sparkSession.conf.get("spark.sql.ansi.enabled", "false") == "true"
    except Exception:  # pragma: no cover — static-conf sessions
        return True  # assume the strict mode if unknowable


#: Supported MinHash hash families. The family is part of the signature
#: CONTRACT: signatures/LSH buckets computed under one family never match
#: frames computed under the other, so persisted signature stores must pin
#: one family and always pass it explicitly.
#:
#: - ``multiply_add``: lane i = a_i * xxhash64(shingle) + b_i over Z/2^64
#:   (Java long wrap). Fastest (one string hash per shingle), but the wrap
#:   arithmetic throws ArithmeticException under ANSI mode
#:   (``spark.sql.ansi.enabled=true``, the Spark 4.x default) — requires a
#:   non-ANSI session and is rejected at plan-build time otherwise.
#: - ``xxhash``: lane i = xxhash64(shingle, seed=i). ~3x slower at 32
#:   lanes (re-hashes the string per lane) but valid on any session.
#: - ``md5``: lane i = lexicographic MIN of md5('i:' || shingle) hex
#:   strings. Slowest, but PORTABLE: md5 hex is bit-identical across
#:   engines (DuckDB, Trino, ...), so signatures — and therefore the
#:   dedup survivor set — can be cross-checked by an external oracle.
#:   Lexicographic min over uniformly-distributed fixed-width hex is a
#:   valid MinHash order statistic.
MINHASH_FAMILIES = ("multiply_add", "xxhash", "md5")


def _resolve_family(family: str, ansi: bool) -> str:
    if family not in MINHASH_FAMILIES:
        raise ValueError(
            f"unknown MinHash family {family!r}; expected one of {MINHASH_FAMILIES}"
        )
    if family == "multiply_add" and ansi:
        raise ValueError(
            "MinHash family 'multiply_add' relies on integer wrap-around and "
            "throws under ANSI mode (spark.sql.ansi.enabled=true). Either "
            "disable ANSI on this session or pass family='xxhash' — and note "
            "the two families produce incompatible signatures/LSH buckets."
        )
    return family


def _check_lanes(num_hashes: int) -> None:
    if num_hashes > _MAX_LANES:
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the fixed multiply-add "
            f"hash family size ({_MAX_LANES} lanes)"
        )


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
            .filter(F.col(f"_w{shingle_n - 1}").isNotNull() | (F.col("_pos") == 0))
            .select(
                id_col,
                F.concat_ws(" ", "_w", *[f"_w{j}" for j in range(1, shingle_n)]).alias(
                    "_sh"
                ),
            )
        )
    return sh.dropDuplicates([id_col, "_sh"]) if distinct else sh


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
    sh = df.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col), word_shingles(text_col, shingle_n).alias("_shingles")
    )
    joined = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("_shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("_shingles", "sh_b"), "id_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return joined.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def _components_driver(pairs: DataFrame) -> DataFrame:
    """Driver-side union-find over a SMALL edge list (the caller has
    already checkpointed ``pairs``, so this Arrow collect re-reads the
    materialization, never the pair search): path-compressed min-root
    merge, labels returned through a single Arrow-backed
    ``createDataFrame(pandas)`` (no per-row Python tuples). Exactly the
    (node, component=min reachable id) contract of the distributed
    loop."""
    from pyspark.sql import types as T

    id_type = pairs.schema["id_a"].dataType
    pdf = pairs.toPandas()
    rows = zip(pdf["id_a"].tolist(), pdf["id_b"].tolist())
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the final label is the min id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    import pandas as pd

    labels_pdf = pd.DataFrame(
        {"node": list(parent), "component": [find(n) for n in parent]}
    )
    schema = T.StructType(
        [T.StructField("node", id_type), T.StructField("component", id_type)]
    )
    return pairs.sparkSession.createDataFrame(labels_pdf, schema)


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    on_nonconverged: str = "warn",
    driver_threshold: int | None = 5_000_000,
) -> DataFrame:
    """Single-link components over an edge list (id_a, id_b) → rows
    (node, component) where component = min id reachable from node.

    Size-dispatched: the incoming pair plan is eagerly checkpointed
    ONCE (the pair search — LSH buckets, posting lists, GEMM — is the
    expensive part and must never run twice), then counted — free on
    the materialization. Within ``driver_threshold`` pairs (~80 MB of
    ids at the default 5M, trivial for any driver) an Arrow collect +
    driver union-find resolves the labels in seconds and parallelizes
    them back; near-dup edge sets are tiny relative to the corpus,
    and the distributed loop's ~8 Spark jobs per round dwarf that
    cost (measured 2x even at 3.7M pairs). Beyond the threshold — or
    with ``driver_threshold=None/0`` — the distributed
    O(log diameter) loop below consumes the same checkpoint. Both
    paths produce identical labels, which is why the oracle-certified
    queries stay green under either dispatch.

    Each round does (1) min-label propagation — every node takes the
    minimum label across its edges — then (2) a pointer-doubling
    shortcut: node's label := its label's label. Doubling halves the
    remaining pointer-chain depth every round, so convergence is
    O(log diameter) rounds, not O(diameter): max_iter=20 covers
    diameters beyond 2^20 — pathological boilerplate chains included
    (plain propagation needed a round per hop and aborted at 20). Every
    round is id-only joins/group-bys (never text), and the label frame
    is checkpointed per round to truncate lineage.

    Invariant used by the shortcut step: labels start as node ids and
    only ever decrease to the min over a (growing) reachable set, so a
    node's current label is always itself a node in the same component
    and the self-join finds its row.

    If the bound is still somehow exceeded, ``on_nonconverged``
    decides: ``'warn'`` (default) returns the partially-converged
    labels with a RuntimeWarning (safe direction — labels are valid
    upper-approximations: every labeled group is a subset of a true
    component, so dedup keeps extra docs, never drops a non-dup);
    ``'raise'`` fails loudly with RuntimeError — for production jobs
    that need exact single-link semantics and would otherwise silently
    ship a different survivor set because nobody reads warnings.
    """
    if on_nonconverged not in ("warn", "raise"):
        raise ValueError(
            f"on_nonconverged={on_nonconverged!r}; expected 'warn' or 'raise'"
        )
    pairs = pairs.select("id_a", "id_b").localCheckpoint(eager=True)
    # The "~80 MB at 5M pairs" driver-dispatch sizing only holds for
    # fixed-width integral ids. With string ids (supported everywhere in
    # the dedup family) each pandas cell is a Python object (~60+ bytes
    # before the id text itself), so the same row count can cost GBs of
    # driver heap. Scale the effective threshold down for non-integral
    # id types rather than silently OOMing a default driver.
    from pyspark.sql import types as T

    id_type = pairs.schema["id_a"].dataType
    effective_threshold = driver_threshold or 0
    if effective_threshold and not isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        effective_threshold = min(effective_threshold, 1_000_000)
    if effective_threshold and pairs.count() <= effective_threshold:
        return _components_driver(pairs)
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .dropDuplicates()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("_nbr"))
        )
        hopped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(F.col("component"), F.coalesce("_nbr", "component")).alias(
                "component"
            ),
        )
        # Pointer doubling: follow component -> component's component.
        parent = hopped.select(
            F.col("node").alias("_c"), F.col("component").alias("_cc")
        )
        new_labels = (
            hopped.join(parent, hopped["component"] == parent["_c"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("_cc", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        # superseded checkpoints are released by Spark's ContextCleaner
        # once the old `labels` reference drops here
        labels = new_labels
        if changed == 0:
            return labels
    msg = (
        f"connected_components did not fully converge within max_iter={max_iter} "
        "rounds; labels are partially converged (each labeled group is a "
        "subset of a true component — dedup keeps extra docs, never drops a "
        "non-duplicate). Raise max_iter to finish the merge."
    )
    if on_nonconverged == "raise":
        raise RuntimeError(msg)
    import warnings

    warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


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


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, inverted-index blocked)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_posting_size: int | None = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard pairs >= threshold, no MinHash approximation.

    Candidate generation by inverted index: docs sharing at least
    ``ceil(threshold * |smaller set|)`` shingles must share >= 1, so a
    join on exploded (shingle -> id) postings finds every qualifying
    pair; shared-shingle counts come back from the same join (one
    aggregation), and Jaccard is |A∩B| / (|A|+|B|-|A∩B|) without
    re-touching the texts.

    The posting-list self-join costs Σ_shingle freq² — one viral
    boilerplate shingle shared by 10^6 docs alone is 10^12 candidate
    pairs. ``max_posting_size`` (default 10k) therefore caps each
    shingle's posting list in-plan (``skew.cap_group_size`` on the
    shingle key, deterministic id order; the window shares the join's
    shuffle partitioning). Results are EXACT whenever no posting list
    exceeds the cap; beyond it, a capped shingle pairs only its first
    ``max_posting_size`` docs and its contribution to |A∩B| is
    under-counted — strictly conservative (never a false duplicate).
    Pass ``None`` for fully exact semantics regardless of skew.
    Doc sizes |A| are always computed from the uncapped postings.
    """
    sh = exploded_shingles(df, text_col, id_col, shingle_n, distinct=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("_sz"))
    if max_posting_size is not None:
        from .skew import cap_group_size

        posted = cap_group_size(sh, ["_sh"], max_posting_size, order_col=id_col)
    else:
        posted = sh
    a = posted.select(F.col(id_col).alias("id_a"), "_sh")
    b = posted.select(F.col(id_col).alias("id_b"), "_sh")
    shared = (
        a.join(b, ["_sh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_shared"))
    )
    jac = F.col("_shared") / (F.col("sz_a") + F.col("sz_b") - F.col("_shared"))
    return (
        shared.join(sizes.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("sz_b")), "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_posting_size: int | None = 10_000,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs — |A∩B| / min(|A|, |B|) >=
    threshold. The asymmetric companion to :func:`ngram_jaccard_pairs`:
    a short document quoted wholesale inside a long one has containment
    ~1.0 but Jaccard ~|short|/|long| ~ 0, so Jaccard-only dedup keeps
    both copies of the quoted text (the RefinedWeb/Dolma pipelines drop
    contained documents as a separate pass for exactly this reason).

    Output: (id_a, id_b, containment, contained_id) with id_a < id_b;
    ``contained_id`` is the SMALLER document (fewer distinct shingles,
    lesser id on ties) — the one a drop-contained policy removes.

    Plan shape: identical to the Jaccard twin — inverted-index posting
    join with the in-plan ``max_posting_size`` cap (conservative
    under-count when capped, never a false positive), shared counts and
    both sizes from the same aggregation, no re-touching of texts. One
    extra comparison picks the contained side; at 100 TB the cost
    profile is the Jaccard operator's, bit for bit.
    """
    sh = exploded_shingles(df, text_col, id_col, shingle_n, distinct=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("_sz"))
    if max_posting_size is not None:
        from .skew import cap_group_size

        posted = cap_group_size(sh, ["_sh"], max_posting_size, order_col=id_col)
    else:
        posted = sh
    a = posted.select(F.col(id_col).alias("id_a"), "_sh")
    b = posted.select(F.col(id_col).alias("id_b"), "_sh")
    shared = (
        a.join(b, ["_sh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_shared"))
    )
    containment = F.col("_shared") / F.least(F.col("sz_a"), F.col("sz_b"))
    contained = F.when(F.col("sz_a") < F.col("sz_b"), F.col("id_a")).otherwise(
        F.when(F.col("sz_b") < F.col("sz_a"), F.col("id_b")).otherwise(
            F.least(F.col("id_a"), F.col("id_b"))
        )
    )
    return (
        shared.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("_sz").alias("sz_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("_sz").alias("sz_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            containment.alias("containment"),
            contained.alias("contained_id"),
        )
        .filter(F.col("containment") >= threshold)
    )


def _drop_pair_losers(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    transitive: bool,
    eager: bool = False,
    score_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Shared pair-resolution: one-sweep (drop every id_b) or exact
    single-link components keeping the min id per component.

    ``score_col`` switches the survivor rule from min-id to
    best-score (:func:`keep_best_per_cluster`): components are always
    resolved (the policy needs whole clusters, so ``transitive`` is
    implied) and the best-scoring member of each survives.

    ``eager`` checkpoints the (tiny) loser-id set immediately — required
    when ``pairs`` hangs off a persisted frame the caller will unpersist
    before the returned plan executes (minhash_dedup's bucket cache).
    The score path's component labels are already eagerly checkpointed
    inside connected_components, so it is safe under the same caveat."""
    if score_col is not None:
        comps = connected_components(pairs)
        return keep_best_per_cluster(df, comps, score_col, id_col, descending)
    if transitive:
        comps = connected_components(pairs)
        losers = (
            comps.filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias(id_col))
            .localCheckpoint(eager=True)
        )
    else:
        losers = pairs.select(F.col("id_b").alias(id_col)).dropDuplicates()
        if eager:
            losers = losers.localCheckpoint(eager=True)
    return df.join(losers, id_col, "left_anti")


def keep_best_per_cluster(
    df: DataFrame,
    clusters: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Quality-priority survivor selection for duplicate clusters:
    keep the best-scoring member of every cluster instead of the
    lowest id. The min-id keep policy (`_drop_pair_losers`) is
    arbitrary; curation pipelines (FineWeb-style) keep the member
    with the best quality signal — longest, highest LM score, best
    heuristic composite — so near-dedup upgrades the corpus instead
    of sampling it blindly.

    ``clusters`` is the (node, component) frame
    :func:`connected_components` produces; docs absent from it are
    singleton survivors. Ties on ``score_col`` break on the lower id,
    so the selection is total and deterministic. ``descending=False``
    keeps the LOWEST score (e.g. perplexity, where smaller is better).

    Scale: one join on id (the cluster frame is near-dup nodes only —
    tiny next to the corpus, broadcast-eligible) + one window whose
    partition is a duplicate CLUSTER, never the corpus; singletons
    pass through the same window with partition size 1.
    """
    if "_comp" in df.columns or "_rn" in df.columns or "_kb_comp" in df.columns:
        raise ValueError(
            "keep_best_per_cluster: input has internal column names "
            "('_comp'/'_rn'/'_kb_comp'); rename them first"
        )
    # The cluster frame's label lands under an internal alias so an
    # existing 'component' column on df (common after a prior
    # components pass) never produces an ambiguous reference.
    lab = clusters.select(
        F.col("node").alias(id_col), F.col("component").alias("_kb_comp")
    )
    order = [
        F.col(score_col).desc() if descending else F.col(score_col).asc(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy("_comp").orderBy(*order)
    return (
        df.join(lab, id_col, "left")
        .withColumn("_comp", F.coalesce(F.col("_kb_comp"), F.col(id_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_comp", "_rn", "_kb_comp")
    )


def ngram_jaccard_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    transitive: bool = False,
    max_posting_size: int | None = 10_000,
    score_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Exact Jaccard near-dedup: drop the higher id of each pair >=
    threshold (or, with ``transitive=True``, keep one doc per
    single-link component; with ``score_col``, the best-scoring
    member of each component survives instead of the min id). The
    exact twin of :func:`minhash_dedup` (which trades exactness for
    bucket-local comparisons). ``max_posting_size`` bounds
    viral-shingle blowup (see :func:`ngram_jaccard_pairs`); ``None``
    restores unconditional exactness."""
    pairs = ngram_jaccard_pairs(
        df, text_col, id_col, shingle_n, threshold, max_posting_size
    )
    return _drop_pair_losers(
        df, pairs, id_col, transitive, score_col=score_col, descending=descending
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(text_col: str | Column, bits: int = 64) -> Column:
    """64-bit SimHash fingerprint, pure SQL expressions.

    Each word votes +1/-1 per bit position of its xxhash64; the
    fingerprint takes the sign of each bit's vote sum. Implemented as a
    fold (``aggregate``) over the word array accumulating a 64-slot
    vote vector — narrow per-row work, no explode/shuffle.
    """
    words = normalized_words(text_col)
    zero = F.array_repeat(F.lit(0), bits)
    votes = F.aggregate(
        words,
        zero,
        lambda acc, w: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                # bit_get accepts a Column position (shiftright does not)
                lambda j: F.bit_get(F.xxhash64(w), j).cast("int") * 2 - 1,
            ),
            lambda a, v: a + v,
        ),
    )
    # Pack sign bits into a long with shift/or — bitwise ops never
    # overflow-check, so this is safe under ANSI mode too (the old
    # acc*2+bit fold threw ArithmeticException there on the sign bit).
    return F.aggregate(
        votes,
        F.lit(0).cast("long"),
        lambda acc, v: F.shiftleft(acc, 1).bitwiseOR(
            F.when(v > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        ),
    )


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """(id, _fp: long) SimHash via explode + per-bit majority aggregate.

    The column-expression :func:`simhash` runs interpreted (higher-order
    functions skip codegen) and costs ~bits x words element-ops per row;
    this variant hashes each word once and reduces with SIMD-style
    lane-packed SUM aggregates — all whole-stage-codegen, one shuffle on
    id. Bit-vote counters are packed four-per-long in 16-bit lanes
    (``sum((h >> l) & 0x0001000100010001)`` counts bits l, l+16, l+32,
    l+48 at once), so 64 bit positions need 16 aggregates instead of 64;
    exact up to 32,767 words per document — the 16-bit lanes hold 65,535
    but the packed long's top lane must stay clear of the sign bit.
    Longer documents are truncated to their first 32,767 words at the
    explode (structural guard — no silent counter overflow).
    Bit j of the fingerprint is set iff the majority of word-hashes have
    bit j set. Empty documents drop out (no words -> no fingerprint),
    correct for near-dup: nothing to match on.
    """
    if bits != 64:
        raise ValueError("simhash_fingerprints packs 16-bit lanes over a 64-bit hash; bits must be 64")
    lane_mask = F.lit(0x0001000100010001)
    # Enforce the counter-exactness bound structurally: fingerprint the
    # first 32,767 words of each document. A silent lane overflow would
    # corrupt neighbouring bit counts; truncation is deterministic and
    # near-dup semantics on >32k-word documents are dominated by their
    # prefix anyway.
    w = df.select(
        F.col(id_col), F.posexplode(normalized_words(text_col)).alias("_pos", "_w")
    ).filter(F.col("_pos") < 32767)
    h = w.select(id_col, F.xxhash64("_w").alias("_h"))
    aggs = [
        F.sum(F.shiftright(F.col("_h"), l).bitwiseAND(lane_mask)).alias(f"_l{l}")
        for l in range(16)
    ]
    votes = h.groupBy(id_col).agg(F.count("*").alias("_n"), *aggs)
    fp = F.lit(0).cast("long")
    for j in range(bits):
        cnt = F.shiftright(F.col(f"_l{j % 16}"), 16 * (j // 16)).bitwiseAND(F.lit(0xFFFF))
        term = F.when(
            cnt * 2 > F.col("_n"),
            F.shiftleft(F.lit(1).cast("long"), j),
        ).otherwise(F.lit(0).cast("long"))
        fp = fp.bitwiseOR(term)
    return votes.select(F.col(id_col), fp.alias("_fp"))


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount of XOR via bit_count (Spark >= 3.3)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    score_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """SimHash near-dedup with banded blocking.

    Pigeonhole: two 64-bit fingerprints within hamming distance k share
    at least one of k+1 16-bit blocks exactly — block on each quarter,
    compare within blocks only, drop the higher id of close pairs.
    ``score_col`` switches to the best-scoring-member keep policy over
    single-link clusters (:func:`keep_best_per_cluster`).
    """
    fp = simhash_fingerprints(df, text_col, id_col)
    blocks = fp.select(
        id_col,
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright(F.col("_fp"), q * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("blk"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("b"),
    ).select(id_col, "_fp", F.col("b.q").alias("q"), F.col("b.blk").alias("blk"))
    # No persist needed: both self-join sides hang off the same
    # group-by exchange, which Spark reuses (ReusedExchange).
    a, b = blocks.alias("a"), blocks.alias("b")
    close = a.join(
        b,
        (F.col("a.q") == F.col("b.q"))
        & (F.col("a.blk") == F.col("b.blk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).filter(hamming_distance(F.col("a._fp"), F.col("b._fp")) <= max_hamming)
    if score_col is not None:
        pairs = close.select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        ).dropDuplicates()
        return _drop_pair_losers(
            df, pairs, id_col, False, score_col=score_col, descending=descending
        )
    dups = close.select(F.col(f"b.{id_col}").alias(id_col)).dropDuplicates()
    return df.join(dups, id_col, "left_anti")


def simhash_fingerprints_md5(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, _fp: long) PORTABLE 60-bit SimHash twin of
    :func:`simhash_fingerprints`.

    A word's hash bits come from the first 15 hex digits of
    ``md5(word)``: digit d contributes bits 4d..4d+3 (its nibble value,
    readable in any engine — Spark ``conv(digit,16,10)``, DuckDB
    ``strpos('0123456789abcdef', digit)-1``). Each word votes +1/-1 per
    bit; fingerprint bit j is set iff the vote sum is > 0. All-integer
    math over bit-identical md5 hex, so a DuckDB/Trino oracle
    reproduces the fingerprints — and the dedup survivor set — exactly.
    60 bits (not 64) keeps the packed fingerprint positive in engines
    whose BIGINT shift-left overflow-checks at bit 63. Same explode +
    vote-sum shape as the 64-bit xxhash variant (one shuffle on id,
    codegen aggregates); same 32,767-word structural truncation.
    """
    w = df.select(
        F.col(id_col), F.posexplode(normalized_words(text_col)).alias("_pos", "_w")
    ).filter(F.col("_pos") < 32767)
    h = w.select(id_col, F.md5("_w").alias("_h"))
    hv = h.select(
        F.col(id_col),
        *[
            F.conv(F.substring("_h", d + 1, 1), 16, 10).cast("int").alias(f"_d{d}")
            for d in range(15)
        ],
    )
    aggs = [
        F.sum(
            F.shiftright(F.col(f"_d{j // 4}"), j % 4).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"_v{j}")
        for j in range(60)
    ]
    votes = hv.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for j in range(60):
        fp = fp + F.when(F.col(f"_v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return votes.select(F.col(id_col), fp.cast("long").alias("_fp"))


def simhash_dedup_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    score_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Portable SimHash near-dedup over the 60-bit md5 fingerprints —
    the oracle-checkable twin of :func:`simhash_dedup` (including the
    ``score_col`` best-member keep policy).

    Pigeonhole blocking on the fingerprint's four 15-bit blocks: two
    60-bit fingerprints within hamming distance 3 must share at least
    one block exactly, so comparisons stay bucket-local (same scale
    shape as the 64-bit variant's 16-bit-quarter blocking)."""
    fp = simhash_fingerprints_md5(df, text_col, id_col)
    blocks = fp.select(
        id_col,
        "_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.shiftright(F.col("_fp"), q * 15)
                        .bitwiseAND(F.lit(0x7FFF))
                        .alias("blk"),
                    )
                    for q in range(4)
                ]
            )
        ).alias("b"),
    ).select(id_col, "_fp", F.col("b.q").alias("q"), F.col("b.blk").alias("blk"))
    a, b = blocks.alias("a"), blocks.alias("b")
    close = a.join(
        b,
        (F.col("a.q") == F.col("b.q"))
        & (F.col("a.blk") == F.col("b.blk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).filter(hamming_distance(F.col("a._fp"), F.col("b._fp")) <= max_hamming)
    if score_col is not None:
        pairs = close.select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        ).dropDuplicates()
        return _drop_pair_losers(
            df, pairs, id_col, False, score_col=score_col, descending=descending
        )
    dups = close.select(F.col(f"b.{id_col}").alias(id_col)).dropDuplicates()
    return df.join(dups, id_col, "left_anti")


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
) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold, blocked by
    banded random-hyperplane LSH — the DEFAULT and the 100 TB path.

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
            if n_vectors is None:
                n_vectors = df.select(id_col).count()
            verify_impl = (
                "arrow" if n_vectors > arrow_verify_threshold else "expr"
            )
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
    # vectors.
    sigs = banded_signatures(
        scaled, vec_col, id_col, num_planes, num_bands, dim, id_col,
        impl=signature_impl,
    ).localCheckpoint(eager=True)
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
    banded_signatures)."""
    pairs = embedding_near_dup_pairs(
        df, vec_col, id_col, threshold, num_planes, num_bands, dim,
        signature_impl=signature_impl, verify_impl=verify_impl,
    )
    return _drop_pair_losers(
        df, pairs, id_col, transitive, score_col=score_col, descending=descending
    )


# ---------------------------------------------------------------------------
# Line-level (CCNet-style) corpus dedup
# ---------------------------------------------------------------------------

def _quote_sep(sep: str) -> str:
    """``sep`` is a LITERAL separator; ``F.split`` takes a Java regex,
    so quote it (\\Q…\\E) — '.' must mean a period, not any-char."""
    return "\\Q" + sep + "\\E"


def line_frequencies(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """(line, n_docs) — how many DISTINCT documents contain each
    non-empty trimmed line. The corpus-statistics half of
    :func:`line_dedup`, exposed separately so a precomputed frequency
    table can be reused across incremental batches.

    One shuffle, on the line value, with partial aggregation; hot
    boilerplate lines ("Subscribe to our newsletter") are exactly the
    high-frequency groups partial agg collapses map-side. At trillions
    of lines, group on ``xxhash64(line)`` instead to shuffle 8 bytes a
    line — kept on the raw string here so external engines reproduce
    the table byte-for-byte."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), _quote_sep(sep), -1)).alias("_l"),
    ).select(F.col(id_col), F.trim(F.col("_l")).alias("line"))
    return (
        lines.filter(F.col("line") != "")
        .groupBy("line")
        .agg(F.countDistinct(F.col(id_col)).cast("long").alias("n_docs"))
    )


def line_doc_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Distinct (line, doc id) pairs — the MERGEABLE state behind
    incremental line frequencies. COUNT(DISTINCT doc) is not foldable
    from per-batch counts (a doc id may recur across batches), but the
    distinct pair set is: union the persisted pair table with a new
    batch's pairs, re-distinct, and :func:`pairs_to_frequencies` gives
    corpus-exact counts — per cycle cost O(batch lines + touched
    groups), never O(corpus). For approximate-tolerant corpora, a
    per-line HLL sketch (merge.merge_distinct_sketch) shrinks the
    state to one sketch per line."""
    lines = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), _quote_sep(sep), -1)).alias("_l"),
    ).select(F.col("doc"), F.trim(F.col("_l")).alias("line"))
    return lines.filter(F.col("line") != "").dropDuplicates(["line", "doc"])


def pairs_to_frequencies(pairs: DataFrame) -> DataFrame:
    """Fold a (line, doc) pair table into the (line, n_docs) frequency
    schema :func:`line_dedup` consumes. Pairs must already be distinct
    (:func:`line_doc_pairs` output, or a union of such tables after
    ``dropDuplicates``)."""
    return pairs.groupBy("line").agg(F.count("*").cast("long").alias("n_docs"))


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int | float = 2,
    frequencies: DataFrame | None = None,
    corpus_docs: int | None = None,
) -> DataFrame:
    """CCNet-style line-level corpus dedup: drop from every document
    each line whose trimmed form occurs in >= ``min_docs`` distinct
    documents (cross-document boilerplate — headers, nav bars, cookie
    banners), then reassemble the survivors in original order.

    ``min_docs`` accepts an absolute count (int >= 1) or a corpus
    FRACTION (float in (0, 1)): a fraction is resolved IN-PLAN against
    the corpus document count (1-row aggregate, broadcast into the
    boilerplate filter — no driver collect), so the same pipeline
    definition scales from a 500-doc test corpus to 10^9 documents
    without retuning an absolute threshold. With a precomputed
    ``frequencies`` table, ``df`` may be one small batch of a much
    larger corpus, so a fractional threshold cannot be resolved from
    ``df`` — pass ``corpus_docs`` (the document count the frequency
    table was built over) explicitly, or the call raises.

    Output: (id, clean_text, n_lines_kept, n_lines_dropped). Documents
    whose every line is boilerplate remain as rows with an empty
    ``clean_text`` — dropping documents is a separate quality-filter
    decision (compose with a length filter).

    Plan shape: split/posexplode is narrow; the frequency table
    (:func:`line_frequencies`) costs one shuffle on the line value;
    tagging lines is one more line-keyed join (Spark ≥3.4 injects a
    runtime bloom filter on the big side automatically); reassembly is
    one shuffle on the doc id with ``array_sort`` over (pos, line)
    structs restoring order deterministically. Empty/whitespace lines
    carry no boilerplate signal and are always kept (they preserve
    paragraph structure), matching CCNet's non-empty-line hashing.

    ``frequencies`` accepts a precomputed/persisted line-frequency
    table (same schema as :func:`line_frequencies`) so the corpus
    statistics can be built once and reused across runs. Note the
    distinct-document count is NOT foldable from per-batch counts
    alone (the same doc id may recur across batches): persist the
    distinct (line, doc) pair set instead (:func:`line_doc_pairs` →
    union → :func:`pairs_to_frequencies`, proven equal to the full
    recompute in tests) or a mergeable HLL sketch per line
    (merge.merge_distinct_sketch) when approximate frequencies are
    acceptable.
    """
    fractional = isinstance(min_docs, float) and not isinstance(min_docs, bool)
    if fractional:
        if not (0.0 < min_docs < 1.0):
            raise ValueError(
                "line_dedup: fractional min_docs must be in (0, 1) exclusive; "
                "pass an int for an absolute document count"
            )
        if frequencies is not None and corpus_docs is None:
            raise ValueError(
                "line_dedup: a fractional min_docs with a precomputed "
                "frequencies table needs corpus_docs (the document count the "
                "table was built over) — df may be one batch of a larger "
                "corpus, so its own count would resolve the wrong threshold"
            )
        if corpus_docs is not None and corpus_docs < 1:
            raise ValueError(
                f"line_dedup: corpus_docs={corpus_docs} must be >= 1 — a "
                "non-positive count would resolve the threshold to <= 0 and "
                "silently classify EVERY line as boilerplate"
            )
    elif min_docs < 1:
        raise ValueError("line_dedup: min_docs must be >= 1")
    # NULL text is treated as the empty document (split of NULL explodes
    # to zero rows, which would silently DROP the doc from the output)
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(text, _quote_sep(sep), -1)).alias("_pos", "_raw"),
    ).select(
        F.col(id_col), F.col("_pos"), F.col("_raw"), F.trim(F.col("_raw")).alias("line")
    )
    freq = (
        frequencies
        if frequencies is not None
        else line_frequencies(df, text_col, id_col, sep)
    )
    if fractional:
        if corpus_docs is not None:
            boiler = freq.filter(
                F.col("n_docs") >= F.lit(min_docs) * F.lit(corpus_docs)
            ).select("line")
        else:
            total = df.agg(F.countDistinct(F.col(id_col)).alias("_n_corpus"))
            boiler = (
                freq.crossJoin(F.broadcast(total))
                .filter(F.col("n_docs") >= F.lit(min_docs) * F.col("_n_corpus"))
                .select("line")
            )
    else:
        boiler = freq.filter(F.col("n_docs") >= min_docs).select("line")
    tagged = lines.join(
        boiler.withColumn("_drop", F.lit(True)),
        "line",
        "left",
    ).select(
        F.col(id_col),
        "_pos",
        "_raw",
        (F.col("_drop").isNotNull() & (F.col("line") != "")).alias("_is_boiler"),
    )
    kept = tagged.filter(~F.col("_is_boiler"))
    # matching is on the TRIMMED line; reassembly keeps the original
    # raw line so surviving text is byte-identical to the input
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_raw")))
                ),
                lambda s: s["_raw"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").cast("long").alias("n_lines_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count("*").cast("long").alias("_n_total"))
    # left join from totals: a fully-boilerplate document still gets a row
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_lines_kept"), F.lit(0).cast("long")).alias(
                "n_lines_kept"
            ),
            (F.col("_n_total") - F.coalesce(F.col("n_lines_kept"), F.lit(0)))
            .cast("long")
            .alias("n_lines_dropped"),
        )
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
# Substring-level duplication (Lee et al. 2022 — duplicated spans)
# ---------------------------------------------------------------------------

def duplicate_gram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated-substring spans per document: every maximal
    run of word positions covered by ``n``-word grams that appear in at
    least ``min_docs`` distinct documents (the span-level view of
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022 — which removes duplicated *substrings*, not whole
    documents; a suffix array finds exact maximal matches, this n-gram
    formulation finds every duplicated run of >= n words, the same
    operating point at a join-friendly cost).

    Returns (id, span_start, span_end, n_dup_grams): word-index bounds
    (inclusive, 0-based over the normalized word sequence) and how many
    duplicated grams the span merges. Documents shorter than ``n``
    words participate as a single whole-document gram (the shared
    shingle fallback), with the span end capped at their last word.

    Plan: posexplode words + lead window builds positioned grams (one
    shuffle on id, codegen — the exploded_shingles path); gram
    frequency is one groupBy on the gram string with a distinct-doc
    count (map-side partial agg); marked positions shuffle back to
    their document for the gaps-and-islands merge (second id shuffle,
    reusing the first's partitioning). Two shuffles total, both on
    bounded keys; no self-join, so viral boilerplate grams cost their
    posting list ONCE (linear), unlike pair enumeration.
    """
    w = df.select(
        F.col(id_col), F.posexplode(normalized_words(text_col)).alias("_pos", "_w")
    )
    doc_win = Window.partitionBy(id_col)
    order_win = Window.partitionBy(id_col).orderBy("_pos")
    leads = [F.lead("_w", j).over(order_win).alias(f"_w{j}") for j in range(1, n)]
    grams = (
        w.select(id_col, "_pos", "_w", *leads)
        .withColumn("_nw", F.max("_pos").over(doc_win) + 1)
        .filter(F.col(f"_w{n - 1}").isNotNull() | (F.col("_pos") == 0))
        .select(
            id_col,
            "_pos",
            "_nw",
            F.concat_ws(" ", "_w", *[f"_w{j}" for j in range(1, n)]).alias("_sh"),
        )
    )
    dup = (
        grams.groupBy("_sh")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_sh")
    )
    marked = grams.join(dup, "_sh").select(id_col, "_pos", "_nw")
    gap = F.col("_pos") - F.lag("_pos").over(order_win)
    islands = marked.withColumn(
        "_brk", F.when(gap > n, 1).otherwise(0)
    ).withColumn("_island", F.sum("_brk").over(order_win))
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("_pos").alias("span_start"),
            F.least(F.max("_pos") + n - 1, F.max("_nw") - 1).alias("span_end"),
            F.count("*").cast("long").alias("n_dup_grams"),
        )
        .drop("_island")
    )


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 10,
    max_coverage: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """Drop documents whose duplicated-span coverage exceeds
    ``max_coverage`` of their words — the document-level action on
    :func:`duplicate_gram_spans` (Lee et al. remove the spans
    themselves; for pre-training curation the common batch policy is
    to drop documents that are mostly duplicated material and keep the
    rest intact, preserving document coherence).

    Adds nothing to the span plan but one per-doc span-length sum and
    an id anti-join; word counts ride along from the span stage.
    """
    spans = duplicate_gram_spans(df, text_col, id_col, n, min_docs)
    words = df.select(
        F.col(id_col), F.size(normalized_words(text_col)).alias("_nw")
    ).filter(F.col("_nw") > 0)
    coverage = (
        spans.groupBy(id_col)
        .agg(F.sum(F.col("span_end") - F.col("span_start") + 1).alias("_covered"))
        .join(words, id_col)
        .filter(F.col("_covered") / F.col("_nw") > max_coverage)
        .select(id_col)
    )
    return df.join(coverage, id_col, "left_anti")


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 10,
    min_docs: int = 2,
    keep_first_doc: bool = True,
) -> DataFrame:
    """Remove duplicated substrings and rebuild the text — the actual
    removal action of Lee et al. 2022 ("deduplicating training data":
    delete all but one occurrence of each duplicated span, leaving the
    rest of the document intact), where :func:`duplicate_gram_spans`
    only reports and :func:`substring_dedup` drops whole documents.

    A word position is removed when some duplicated ``n``-gram covers
    it; with ``keep_first_doc=True`` (default) the document with the
    SMALLEST id containing a given gram keeps its occurrence — the
    "all but one" policy, with the deterministic min-id owner playing
    the survivor role the pair-dedup family gives to the min id.
    ``keep_first_doc=False`` removes every occurrence everywhere (the
    boilerplate-scrub policy: ads, headers, license blocks).

    Returns (id, clean_text, n_words_kept, n_words_removed) over the
    NORMALIZED word sequence (lowercased, punctuation stripped — the
    same canonical form every dedup operator here hashes; original
    formatting inside kept regions is not preserved).

    Plan: the gram stage is the duplicate_gram_spans explode (one id
    shuffle); ownership is the same gram-frequency aggregate extended
    with ``min(id)`` (no extra shuffle); covered positions explode from
    marked grams and dedup per (id, pos); the rebuild is one per-doc
    sort-and-join aggregate reusing the id partitioning. No self-join
    anywhere — boilerplate grams stay linear in their posting lists.
    """
    w = df.select(
        F.col(id_col), F.posexplode(normalized_words(text_col)).alias("_pos", "_w")
    )
    doc_win = Window.partitionBy(id_col)
    order_win = Window.partitionBy(id_col).orderBy("_pos")
    leads = [F.lead("_w", j).over(order_win).alias(f"_w{j}") for j in range(1, n)]
    grams = (
        w.select(id_col, "_pos", "_w", *leads)
        .withColumn("_nw", F.max("_pos").over(doc_win) + 1)
        .filter(F.col(f"_w{n - 1}").isNotNull() | (F.col("_pos") == 0))
        .select(
            id_col,
            "_pos",
            "_nw",
            F.concat_ws(" ", "_w", *[f"_w{j}" for j in range(1, n)]).alias("_sh"),
        )
    )
    dup = (
        grams.groupBy("_sh")
        .agg(
            F.countDistinct(id_col).alias("_nd"),
            F.min(id_col).alias("_owner"),
        )
        .filter(F.col("_nd") >= min_docs)
        .select("_sh", "_owner")
    )
    marked = grams.join(dup, "_sh")
    if keep_first_doc:
        marked = marked.filter(F.col(id_col) != F.col("_owner"))
    covered = (
        marked.select(
            F.col(id_col),
            F.explode(
                F.sequence(
                    F.col("_pos"),
                    F.least(F.col("_pos") + n - 1, F.col("_nw") - 1),
                )
            ).alias("_pos"),
        )
        .dropDuplicates([id_col, "_pos"])
    )
    kept = w.join(covered, [id_col, "_pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_w"))),
                lambda s: s["_w"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").cast("long").alias("n_words_kept"),
    )
    totals = w.groupBy(id_col).agg(F.count("*").cast("long").alias("_n_total"))
    # left join from totals: a fully-duplicated document still gets a row
    return totals.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_words_kept", F.lit(0).cast("long")).alias("n_words_kept"),
        (F.col("_n_total") - F.coalesce("n_words_kept", F.lit(0)))
        .cast("long")
        .alias("n_words_removed"),
    )
