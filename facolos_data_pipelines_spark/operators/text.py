"""Text-analysis operators for training-data pipelines.

Language ID (stopword-hit heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + BPE-ish
regex), and document fingerprinting (normalized-content hash + rolling
k-gram winnow). All built-in expressions — regexp/split/higher-order
functions — so the hot path stays in whole-stage codegen and scales as
a narrow map over however many partitions the corpus has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_words

# Tiny high-frequency stopword lists per language — enough signal for a
# coarse n-gram/stopword language-ID heuristic (not a trained model).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "on", "with", "as", "this"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den", "von", "auf", "im"],
    "fr": ["le", "la", "les", "et", "est", "une", "un", "des", "du", "que", "pas", "pour", "dans", "sur"],
    "es": ["el", "la", "los", "las", "y", "es", "una", "un", "de", "que", "no", "por", "para", "con"],
    "vi": ["và", "là", "của", "có", "không", "được", "cho", "trong", "một", "người", "này", "các", "với"],
}


def token_count_whitespace(text_col: str | Column) -> Column:
    """Whitespace token count (empty tokens from leading/trailing/run
    whitespace excluded)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.filter(F.split(c, r"\s+"), lambda x: x != ""))


def token_count_bpe_like(text_col: str | Column) -> Column:
    """BPE-ish subword proxy: count of letter-runs, digit-runs, and
    individual punctuation marks — the tokenization granularity most
    BPE vocabularies approximate. regexp_count keeps it one JVM pass."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_count(c, F.lit(r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]")).cast("int")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: chars, words, tokens, avg word length,
    punctuation ratio, uppercase ratio, distinct-word ratio."""
    c = F.col(text_col)
    words = normalized_words(c)
    n_chars = F.length(c)
    n_words = F.size(words)
    return df.select(
        "*",
        n_chars.alias("stat_chars"),
        n_words.alias("stat_words"),
        token_count_bpe_like(c).alias("stat_tokens"),
        (
            F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
            / F.greatest(n_words, F.lit(1))
        ).alias("stat_avg_word_len"),
        (
            F.regexp_count(c, F.lit("[^\\p{L}\\p{N} \\t\\n\\x0B\\f\\r]"))
            / F.greatest(n_chars, F.lit(1))
        ).alias("stat_punct_ratio"),
        (F.regexp_count(c, F.lit(r"[A-Z]")) / F.greatest(n_chars, F.lit(1))).alias(
            "stat_upper_ratio"
        ),
        (F.size(F.array_distinct(words)) / F.greatest(n_words, F.lit(1))).alias(
            "stat_distinct_word_ratio"
        ),
    )


def stopword_ratio(text_col: str | Column, lang: str = "en") -> Column:
    """Fraction of words that are high-frequency stopwords of ``lang``."""
    words = normalized_words(text_col)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return hits / F.greatest(F.size(words), F.lit(1))


def detect_language(df: DataFrame, text_col: str = "text", langs: list[str] | None = None) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword-hit ratio;
    'und' (undetermined) when no language scores above zero."""
    candidates = langs or list(STOPWORDS)
    scores = F.array(
        *[
            F.struct(
                stopword_ratio(F.col(text_col), lg).alias("score"), F.lit(lg).alias("lang")
            )
            for lg in candidates
        ]
    )
    best = F.array_max(scores)
    return df.select(
        "*",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("detected_lang"),
        best["score"].alias("lang_score"),
    )


def quality_score(df: DataFrame, text_col: str = "text", lang: str = "en") -> DataFrame:
    """Composite document-quality score in [0,1] from cheap heuristics:
    reasonable length, moderate punctuation, stopword presence, lexical
    diversity — the usual pre-training corpus filters (C4-style), each
    as a clamped sub-score averaged JVM-side."""
    c = F.col(text_col)
    words = normalized_words(c)
    n_words = F.size(words)
    len_score = F.least(n_words / F.lit(50.0), F.lit(1.0))  # ramps to 1 at 50 words
    # explicit whitespace class (Java \s includes \x0B, RE2 \s does not)
    punct = F.regexp_count(c, F.lit("[^\\p{L}\\p{N} \\t\\n\\x0B\\f\\r]")) / F.greatest(
        F.length(c), F.lit(1)
    )
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct * 4)  # penalize >25% punct
    sw_score = F.least(stopword_ratio(c, lang) * 4, F.lit(1.0))  # healthy prose ~25%+
    diversity = F.size(F.array_distinct(words)) / F.greatest(n_words, F.lit(1))
    return df.select(
        "*",
        ((len_score + punct_score + sw_score + diversity) / 4).alias("quality_score"),
    )


def _require_unique_ids(df: DataFrame, id_col: str, op: str) -> None:
    """Assert id_col is unique and non-null (one narrow agg over ids).

    countDistinct ignores NULLs, so any NULL or duplicate id makes
    n_rows != n_distinct; the null count is computed alongside only to
    make the error actionable."""
    row = df.select(
        F.count("*").alias("n"),
        F.countDistinct(F.col(id_col)).alias("d"),
        F.sum(F.col(id_col).isNull().cast("int")).alias("nulls"),
    ).first()
    if row["n"] != row["d"]:
        raise ValueError(
            f"{op} requires a unique, non-null id column: {id_col!r} has "
            f"{row['n']} rows but {row['d']} distinct non-null values "
            f"({row['nulls'] or 0} nulls). Duplicate ids are grouped "
            "together (mis-keyed fingerprints); null ids never join back."
        )


def _rolling_min_gram(
    df: DataFrame, text_col: str, id_col: str, hash_fn, n: int = 5
) -> DataFrame:
    """(id, fp_rolling_min) = min over rolling n-word-gram hashes.

    posexplode + lead-window + min-aggregate, same shape as
    dedup.minhash_signatures: every stage is whole-stage codegen and
    the window + group-by share ONE shuffle on id. The per-row
    higher-order form (transform over slice/array_join) is interpreted
    and O(words^2) string work per document — measured ~10x slower.
    Documents shorter than n words hash their full word join; empty
    documents drop out (callers coalesce).
    """
    w = df.select(
        F.col(id_col), F.posexplode(normalized_words(F.col(text_col))).alias("_pos", "_w")
    )
    win = Window.partitionBy(id_col).orderBy("_pos")
    leads = [F.lead("_w", j).over(win).alias(f"_w{j}") for j in range(1, n)]
    return (
        w.select(id_col, "_pos", "_w", *leads)
        .filter(F.col(f"_w{n - 1}").isNotNull() | (F.col("_pos") == 0))
        .select(
            id_col,
            hash_fn(F.concat_ws(" ", "_w", *[f"_w{j}" for j in range(1, n)])).alias("_gh"),
        )
        .groupBy(id_col)
        .agg(F.min("_gh").alias("fp_rolling_min"))
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    validate_ids: bool = False,
) -> DataFrame:
    """Content fingerprints:

    - ``fp_content``: xxhash64 of the normalized text (lowercased,
      punctuation stripped, whitespace collapsed) — exact-dup key that
      survives formatting noise;
    - ``fp_rolling_min``: min over rolling 5-word-gram hashes — a
      1-perm MinHash usable as a cheap near-dup blocking key.

    fp_content is a narrow expression; fp_rolling_min runs on the
    codegen explode path (one shuffle on ``id_col``) and joins back.
    Empty documents get ``hash('')`` for both — identical to hashing
    their (empty) word join.

    PRECONDITION: ``id_col`` must be unique and non-null — the rolling
    min is aggregated per id and joined back on it, so duplicate ids
    get a fingerprint over the union of their texts and null ids fall
    back to the empty-document hash. Pass ``validate_ids=True`` to
    assert the precondition (one extra narrow aggregation job) instead
    of trusting the caller.
    """
    if validate_ids:
        _require_unique_ids(df, id_col, "fingerprint")
    normalized = F.array_join(normalized_words(F.col(text_col)), " ")
    rolling = _rolling_min_gram(df, text_col, id_col, F.xxhash64)
    out = df.select("*", F.xxhash64(normalized).alias("fp_content")).join(
        rolling, id_col, "left"
    )
    return out.withColumn(
        "fp_rolling_min", F.coalesce(F.col("fp_rolling_min"), F.xxhash64(F.lit("")))
    )


def fingerprint_md5(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    validate_ids: bool = False,
) -> DataFrame:
    """Cross-engine-portable twin of :func:`fingerprint` using md5 hex
    strings instead of xxhash64 (md5 is bit-identical in any engine, so
    the output is oracle-checkable). Same normalization and 5-word-gram
    rolling-min structure; the min is the lexicographic min of the hex
    digests. Production pipelines should prefer :func:`fingerprint` —
    64-bit keys shuffle 4x less than hex.

    Same unique-non-null ``id_col`` precondition as :func:`fingerprint`
    (``validate_ids=True`` asserts it)."""
    if validate_ids:
        _require_unique_ids(df, id_col, "fingerprint_md5")
    normalized = F.array_join(normalized_words(F.col(text_col)), " ")
    rolling = _rolling_min_gram(df, text_col, id_col, F.md5)
    out = df.select("*", F.md5(normalized).alias("fp_content")).join(
        rolling, id_col, "left"
    )
    return out.withColumn(
        "fp_rolling_min", F.coalesce(F.col("fp_rolling_min"), F.md5(F.lit("")))
    )


# ---------------------------------------------------------------------------
# Chunking + PII redaction (training-data preparation)
# ---------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window preparation step of an LLM training pipeline.

    Whitespace tokens; chunk c covers tokens [c*stride, c*stride +
    chunk_tokens) with stride = chunk_tokens - overlap; the number of
    chunks is ceil((n - overlap) / stride) (min 1), so every token is
    covered and consecutive chunks share ``overlap`` tokens. Documents
    with no tokens emit no chunks.

    Output: (id_col, chunk_id, chunk_text, n_tokens). Pure narrow
    Spark (split + sequence + explode + slice): no shuffle, no UDF —
    chunking 100 TB is map-side work. All arithmetic is integer/double
    ops an external SQL oracle reproduces exactly.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap={overlap} must be smaller than chunk_tokens={chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    n = F.size(toks)
    num_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"), F.lit(1)
    )
    base = df.select(F.col(id_col), toks.alias("_t"), num_chunks.alias("_nc")).filter(
        F.size("_t") > 0
    )
    exploded = base.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
        "_t",
    )
    piece = F.slice(F.col("_t"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


#: PII patterns applied in order by redact_pii. Deliberately limited to
#: RE2-compatible syntax (no lookaround, no backrefs) so external
#: engines (DuckDB/Trino/Go) reproduce the redaction byte-for-byte.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9][0-9()\- ]{6,}[0-9]"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    replacement: str = "[REDACTED]",
    out_col: str = "clean_text",
    with_counts: bool = True,
) -> DataFrame:
    """Scrub common PII (emails, IPv4 addresses, phone-like digit runs)
    from a text column — standard hygiene before training-data release.

    Patterns apply in PII_PATTERNS order (email before phone, so a
    phone-like digit run inside an address local-part is already gone).
    ``with_counts`` adds an ``n_<name>`` column per pattern counting
    matches in the ORIGINAL text. Narrow per-row regexp work, zero
    shuffle; counts and replacement are reproducible in any RE2-style
    engine.
    """
    out = df
    if with_counts:
        for name, pat in PII_PATTERNS:
            out = out.withColumn(
                f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
            )
    clean = F.col(text_col)
    for _name, pat in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, replacement)
    return out.withColumn(out_col, clean)


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    validate_ids: bool = False,
) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``dup_line_frac``: 1 - distinct/total over non-empty lines
      (boilerplate pages repeat nav/footer lines) — narrow per-row
      array work, zero shuffle.
    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over total bigrams (n_words - 1) — spam/keyword-stuffed docs
      score high. One explode + count + max, a single shuffle on
      (id, gram) with map-side partial counts.

    NULL when the document has no lines / fewer than 2 words (nothing
    to measure). All-integer counts with one final division, so an
    external SQL oracle reproduces the values exactly.

    PRECONDITION (same as :func:`fingerprint`): ``id_col`` must be
    unique and non-null — duplicate ids would interleave two documents
    in the per-id bigram window nondeterministically and fan out the
    profile join. ``validate_ids=True`` enforces it with an extra
    aggregate pass."""
    if validate_ids:
        _require_unique_ids(df, id_col, "repetition_stats")
    lines = F.filter(F.split(F.col(text_col), r"\n"), lambda x: x != "")
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double"),
    )
    base = df.select(F.col(id_col), dup_line_frac.alias("dup_line_frac"))

    w = df.select(
        F.col(id_col), F.posexplode(normalized_words(text_col)).alias("_pos", "_w")
    )
    win = Window.partitionBy(id_col).orderBy("_pos")
    grams = (
        w.select(id_col, "_pos", "_w", F.lead("_w", 1).over(win).alias("_w1"))
        .filter(F.col("_w1").isNotNull())
        .select(id_col, F.concat_ws(" ", "_w", "_w1").alias("_g"))
    )
    counts = grams.groupBy(id_col, "_g").agg(F.count("*").alias("_c"))
    top = counts.groupBy(id_col).agg(
        F.max("_c").alias("_top"), F.sum("_c").alias("_total")
    )
    joined = base.join(top, id_col, "left")
    return joined.select(
        id_col,
        "dup_line_frac",
        (F.col("_top").cast("double") / F.col("_total")).alias("top_bigram_frac"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: count the distinct word n-grams each
    training document shares with a benchmark corpus and flag documents
    at or above ``min_overlap`` (the n-gram-overlap decontamination rule
    used for pre-training corpora, cf. GPT-3 §C / Dolma).

    Plan shape for 100 TB: the benchmark side collapses to its DISTINCT
    n-gram set (benchmarks are tiny relative to the corpus, so this side
    is broadcast-able); the corpus side explodes distinct-per-doc
    shingles and inner-joins on the gram string, then one groupBy(doc)
    count. The corpus is touched once; the join key is the shingle, so
    AQE broadcasts the benchmark set and no corpus-wide shuffle happens
    at all. Zero-overlap docs are preserved via a left join of the base
    ids against the hit counts (id-only frames — narrow).
    """
    from .dedup import exploded_shingles

    if id_col not in benchmark.columns:
        # the shingle window only needs SOME per-row key on the bench
        # side; the ids never leave the distinct-gram subquery
        benchmark = benchmark.withColumn(id_col, F.monotonically_increasing_id())
    bench_grams = (
        exploded_shingles(benchmark, text_col, id_col, n, distinct=False)
        .select(F.col("_sh").alias("_g"))
        .distinct()
    )
    doc_grams = exploded_shingles(docs, text_col, id_col, n, distinct=True).select(
        F.col(id_col), F.col("_sh").alias("_g")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "_g")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )


def contamination_fraction(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """Graded benchmark contamination: the FRACTION of each training
    document's distinct word n-grams that appear anywhere in the
    benchmark corpus — the continuous companion to
    :func:`decontaminate`'s binary flag (Dolma/FineWeb-style pipelines
    hard-drop high fractions and down-weight the mid-range; the
    thresholding policy stays with the caller).

    Plan shape at 100 TB, one notch better than decontaminate's: the
    benchmark collapses to its broadcastable distinct-gram set; the
    corpus explodes distinct-per-doc shingles ONCE and left-joins the
    broadcast set with a hit marker, so numerator (marked grams) and
    denominator (all grams) come out of the SAME single groupBy — one
    corpus scan, no second aggregation, no corpus-wide shuffle (the
    groupBy key is the doc id carried by the explode). Docs too short
    to form any n-gram score 0.0 (no evidence), preserved via the
    id-only left join.
    """
    from .dedup import exploded_shingles

    if id_col not in benchmark.columns:
        benchmark = benchmark.withColumn(id_col, F.monotonically_increasing_id())
    bench_grams = (
        exploded_shingles(benchmark, text_col, id_col, n, distinct=False)
        .select(F.col("_sh").alias("_g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = exploded_shingles(docs, text_col, id_col, n, distinct=True).select(
        F.col(id_col), F.col("_sh").alias("_g")
    )
    per_doc = (
        doc_grams.join(F.broadcast(bench_grams), "_g", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_overlap"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0))
                / F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1))
                + 1e-9,
                round_digits,
            ).alias("contamination"),
        )
    )


def bloom_bitmap(
    grams: DataFrame,
    col: str = "_g",
    m_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> list[int]:
    """Build a Bloom filter over a string column as a dense bitmap
    (list of ``m_bits/64`` int64 words), entirely with JVM aggregates:
    each value sets ``num_hashes`` bits at ``pmod(xxhash64(seed, v),
    m_bits)``; words are OR-merged map-side (bit_or partial agg), so
    one shuffle of at most ``m_bits/64`` rows reaches the driver.

    The driver fetch is bounded by the FILTER size (m_bits/64 longs —
    128 KiB for the 2^20-bit default), never by the data: this is the
    same bounded hop a broadcast build makes. Sizing: for n distinct
    values and k hashes, false-positive rate ~ (1 - e^(-kn/m))^k;
    the default (2^20 bits, k=3) holds ~1e-3 at n=100k values.
    """
    if m_bits % 64 != 0:
        raise ValueError("bloom_bitmap: m_bits must be a multiple of 64")
    n_words = m_bits // 64
    rows = []
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(F.lit(i), F.col(col)), F.lit(m_bits))
        rows.append(
            grams.select(
                (pos / 64).cast("int").alias("_word"),
                # call_function: shiftleft's Python wrapper only takes a
                # literal shift amount, but the SQL function shifts by a
                # column just fine
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
                ).alias("_bit"),
            )
        )
    union = rows[0]
    for r in rows[1:]:
        union = union.unionByName(r)
    sparse = union.groupBy("_word").agg(F.bit_or("_bit").alias("_bits")).collect()
    bitmap = [0] * n_words
    for r in sparse:
        bitmap[r["_word"]] = r["_bits"]
    return bitmap


def bloom_might_contain(
    bitmap_col: Column, value: Column, m_bits: int, num_hashes: int
) -> Column:
    """Membership test against a :func:`bloom_bitmap` carried as an
    array<long> column — AND over the ``num_hashes`` bit probes, all
    whole-stage codegen (element_at + bitwise ops, no UDF)."""
    cond = None
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(F.lit(i), value), F.lit(m_bits))
        word = F.element_at(bitmap_col, (pos / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        probe = word.bitwiseAND(bit) != 0
        cond = probe if cond is None else cond & probe
    return cond


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_overlap: int = 1,
    m_bits: int = 1 << 20,
    num_hashes: int = 3,
    exact_confirm: bool = True,
) -> DataFrame:
    """Benchmark decontamination with a Bloom prefilter — the scale
    path of :func:`decontaminate` for when the corpus gram stream is
    enormous: the benchmark's distinct n-grams compress into an
    ``m_bits`` Bloom bitmap (one bounded driver hop, see
    :func:`bloom_bitmap`) that rides to every task as a single
    broadcast row, and each corpus gram is tested with pure codegen
    bit probes — so the overwhelming non-contaminated majority is
    discarded IN the scan projection, before any join or shuffle.

    With ``exact_confirm=True`` (default) the surviving ~fp-rate
    sliver of grams is confirmed against the exact benchmark gram set,
    making the result IDENTICAL to :func:`decontaminate` (the Bloom
    filter has no false negatives, so prefiltering loses nothing) at a
    fraction of its join input. ``exact_confirm=False`` skips the
    confirm join entirely — zero benchmark-side work at query time —
    and accepts the documented false-positive rate as extra (safe-
    direction) contamination flags.

    Same output contract as :func:`decontaminate`:
    (id, n_overlap, contaminated).
    """
    from .dedup import exploded_shingles

    if id_col not in benchmark.columns:
        benchmark = benchmark.withColumn(id_col, F.monotonically_increasing_id())
    bench_grams = (
        exploded_shingles(benchmark, text_col, id_col, n, distinct=False)
        .select(F.col("_sh").alias("_g"))
        .distinct()
    )
    bitmap = bloom_bitmap(bench_grams, "_g", m_bits, num_hashes)
    spark = docs.sparkSession
    bm = spark.createDataFrame([(bitmap,)], "_bm array<long>")
    doc_grams = (
        exploded_shingles(docs, text_col, id_col, n, distinct=True)
        .select(F.col(id_col), F.col("_sh").alias("_g"))
        .crossJoin(F.broadcast(bm))
        .filter(bloom_might_contain(F.col("_bm"), F.col("_g"), m_bits, num_hashes))
        .drop("_bm")
    )
    if exact_confirm:
        doc_grams = doc_grams.join(F.broadcast(bench_grams), "_g", "left_semi")
    hits = doc_grams.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_overlap")
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias("contaminated"),
        )
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level top-k word n-grams with counts (vocabulary /
    boilerplate inspection — the usual first look at a new crawl).

    Non-distinct n-grams (frequency matters), assembled with the
    codegen posexplode + ``lead`` formulation (the array-slice
    ``transform`` form is interpreted CodegenFallback — the same 6.5x
    measurement behind ``dedup.exploded_shingles``); only full-length
    grams count (docs shorter than n words contribute nothing). Then
    one groupBy(gram) with map-side partial aggregation and a global
    top-k via TakeOrderedAndProject — no full sort of the vocabulary.
    Ties break on the gram string so the result is deterministic. The
    per-doc window adds a shuffle on ``id_col`` (synthesized when the
    frame has none) — measured well worth it against the interpreted
    per-gram slice cost.
    """
    from .dedup import normalized_words

    base = docs
    if id_col not in base.columns:
        base = base.withColumn(id_col, F.monotonically_increasing_id())
    w = base.select(
        F.col(id_col), F.posexplode(normalized_words(text_col)).alias("_pos", "_w")
    )
    if n <= 1:
        grams = w.select(F.col("_w").alias("ngram"))
    else:
        win = Window.partitionBy(id_col).orderBy("_pos")
        leads = [F.lead("_w", j).over(win).alias(f"_w{j}") for j in range(1, n)]
        grams = (
            w.select("_w", *leads)
            .filter(F.col(f"_w{n - 1}").isNotNull())
            .select(
                F.concat_ws(" ", "_w", *[f"_w{j}" for j in range(1, n)]).alias("ngram")
            )
        )
    return (
        grams.groupBy("ngram")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("ngram").asc())
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-document top-k terms by TF-IDF (smoothed) — keyword /
    topical-signature extraction for corpus triage and near-dup triage.

    tf = raw term count in the doc; idf = ln((N + 1) / (df + 1)) + 1
    (scikit-learn's smoothed formulation — never zero, never divides by
    zero); score = tf * idf rounded to ``round_digits`` so the result
    is comparable across engines (ln is IEEE-754 on both sides).

    Plan shape: one explode, a groupBy on (doc, term) for tf, a
    groupBy on term for df (map-side partial agg both times), then the
    corpus size joins in as a broadcast of ONE aggregate row — the
    whole computation stays in-plan, nothing collects to the driver.
    The final per-doc top-k is a window on ``id_col`` whose shuffle
    reuses the (doc, term) partitioning's doc component; ties break on
    the term string so output is deterministic. At 100 TB: two
    aggregation shuffles plus the window — the canonical TF-IDF
    dataflow, no corpus-sized broadcast anywhere.
    """
    from .dedup import normalized_words

    _require_unique_ids(docs, id_col, "tfidf_top_terms")
    terms = docs.select(
        F.col(id_col), F.explode(normalized_words(text_col)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").cast("double").alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(doc_freq, "term")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            # 1e-9 nudge before rounding: keeps half-ulp boundary cases
            # off the .5 rounding edge so Spark and external engines
            # agree bit-for-bit (same idiom as the money-sum oracles)
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
                + 1e-9,
                round_digits,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def pack_documents(
    docs: DataFrame,
    max_tokens: int = 2048,
    num_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """Assign documents to training-context packs of ~``max_tokens``
    whitespace tokens (sequence packing for LLM pretraining batches).

    Packing is SHARD-LOCAL: every doc hashes to one of ``num_shards``
    shards (portable md5 bucket — the same contract as
    ``sampling.hash_split``), and packs are built inside a shard by a
    running token cumsum in id order: ``pack_id = floor(cum_tokens_before
    / max_tokens)``. This is next-fit packing with at most one
    boundary-straddling doc per pack (the straddler starts the pack it
    lands in; exact packers would truncate or split it — acceptable for
    pretraining where docs are clipped to the context anyway), in
    exchange for which the whole operator is ONE window per shard: no
    sequential scan, no driver loop, embarrassingly parallel across
    shards. At 100 TB: one shuffle on the shard key; shard count scales
    with the cluster, and a pack never spans shards so downstream
    writers can bucket by (shard, pack_id).

    Output: (id, shard, pack_id, n_tokens), one row per doc.
    Deterministic and engine-portable (md5 shard + id-ordered cumsum
    are both reproducible in any SQL engine — the DuckDB oracle twin
    proves it).
    """
    if max_tokens <= 0 or num_shards <= 0:
        raise ValueError("pack_documents: max_tokens and num_shards must be positive")
    # duplicate/NULL ids would tie in the id-ordered cumsum window and
    # make pack assignment run-dependent — the same reason tfidf and
    # fingerprint guard their ids
    _require_unique_ids(docs, id_col, "pack_documents")
    shard = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long") % num_shards
    toks = docs.select(
        F.col(id_col),
        shard.alias("shard"),
        token_count_whitespace(text_col).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return toks.select(
        F.col(id_col),
        "shard",
        F.floor(cum_before / max_tokens).cast("long").alias("pack_id"),
        "n_tokens",
    )


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the classic cheap fluency/quality signal (CCNet-style
    LM filtering with the corpus itself as the model): documents full
    of rare/out-of-distribution tokens score low, formulaic in-domain
    text scores high. Additive smoothing:
    p(w) = (count(w) + s) / (total + s * |V|).

    Plan shape: tokenize/explode is narrow; the vocabulary is one
    aggregation on the word; scoring joins tokens back to the
    vocabulary (one word-keyed shuffle — Spark injects a runtime bloom
    filter on the big side); corpus totals fold in as a 1-row
    broadcast; the per-doc mean is one id-keyed aggregation. Nothing
    driver-side, no UDFs. Documents with zero words keep their row
    with n_words=0 and a NULL score (no words ≠ fluent).
    """
    if smoothing <= 0:
        raise ValueError("unigram_logprob_scores: smoothing must be > 0")
    words = df.select(
        F.col(id_col), F.explode(normalized_words(F.col(text_col))).alias("_w")
    )
    vocab = words.groupBy("_w").agg(F.count("*").cast("long").alias("_c"))
    totals = vocab.agg(
        F.sum("_c").cast("long").alias("_total"),
        F.count("*").cast("long").alias("_v"),
    )
    lp = F.log(
        (F.col("_c") + F.lit(float(smoothing)))
        / (F.col("_total") + F.lit(float(smoothing)) * F.col("_v"))
    )
    per_doc = (
        words.join(vocab, "_w")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.avg(lp).alias("_avg_lp"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_words"), F.lit(0).cast("long")).alias("n_words"),
            F.round(F.col("_avg_lp") + 1e-9, 4).alias("avg_logprob"),
        )
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document mean bigram conditional log-probability
    ln p(w2|w1) under the corpus's own bigram LM — the next fluency
    notch above :func:`unigram_logprob_scores` (a unigram model can't
    tell scrambled text from prose; conditional bigram probability
    can, which is why CCNet-style pipelines score with an n-gram LM
    rather than a bag of words). Additive smoothing over the unigram
    vocabulary: p(w2|w1) = (c(w1,w2) + s) / (c(w1,·) + s * |V|),
    where c(w1,·) sums the bigram counts with context w1 and |V| is
    the corpus's distinct-word count.

    Output: (id, n_bigrams, avg_logprob) — documents with fewer than
    two words keep their row with n_bigrams=0 and a NULL score (no
    transitions, no fluency evidence), same contract as the unigram
    scorer.

    Plan shape at 100 TB: bigram pairs come from ``zip_with`` over
    the word array against its own tail — a NARROW per-row
    expression, no self-join and no positional shuffle; the bigram LM
    is one aggregation on (w1, w2), eagerly CHECKPOINTED (the count
    table is referenced twice — context rollup and scoring join — and
    without the checkpoint each reference re-embeds the corpus scan:
    the lazy plan compiled to 5 corpus scans per action, measured);
    the context rollup is bigram-table-sized, never corpus-sized.
    Scoring joins pairs back to the enriched LM (one pair-keyed
    shuffle — Spark injects a runtime bloom filter on the big side);
    |V| folds in as a 1-row broadcast; the per-doc mean is one
    id-keyed aggregation. Total corpus text scans per action: three
    (LM fit, vocabulary, scoring) plus one id-only spine. Zero UDFs,
    zero driver-side state.
    """
    from .dedup import normalized_words

    if smoothing <= 0:
        raise ValueError("bigram_logprob_scores: smoothing must be > 0")
    words = normalized_words(F.col(text_col))
    k = F.size(words)
    pair_arr = F.when(
        k >= 2,
        F.zip_with(
            F.slice(words, 1, k - 1),
            F.slice(words, 2, k - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    )
    pairs = df.select(F.col(id_col), F.explode(pair_arr).alias("_p")).select(
        F.col(id_col), F.col("_p.w1").alias("_w1"), F.col("_p.w2").alias("_w2")
    )
    bg = (
        pairs.groupBy("_w1", "_w2")
        .agg(F.count("*").cast("long").alias("_c12"))
        .localCheckpoint(eager=True)
    )
    ctx = bg.groupBy("_w1").agg(F.sum("_c12").cast("long").alias("_c1"))
    lm = bg.join(ctx, "_w1")
    vocab = df.select(F.explode(words).alias("_w")).agg(
        F.count_distinct("_w").cast("long").alias("_v")
    )
    s = float(smoothing)
    lp = F.log(
        (F.col("_c12") + F.lit(s)) / (F.col("_c1") + F.lit(s) * F.col("_v"))
    )
    per_doc = (
        pairs.join(lm, ["_w1", "_w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg(lp).alias("_avg_lp"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias("n_bigrams"),
            F.round(F.col("_avg_lp") + 1e-9, 4).alias("avg_logprob"),
        )
    )


def corpus_overlap(
    a: DataFrame,
    b: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Corpus-level n-gram overlap between two datasets — the mixing
    and contamination dashboard number (is dataset B new material or
    a re-crawl of A?): one row with the distinct-gram counts of each
    side, the intersection size, Jaccard, and both containments
    (|A∩B|/|A| tells you how much of A is covered by B; the
    asymmetric pair matters when the corpora differ in size).

    Plan shape at 100 TB: each corpus reduces to its DISTINCT shingle
    set (map-side partial distinct, one shuffle on the gram); the
    overlap is one gram-keyed full-outer join between the two
    distinct sets — hash-partitioned both sides, skew-free by
    construction (keys are distinct), never a broadcast requirement —
    folded into a single 1-row aggregate. Nothing scales with
    document count beyond the two distinct passes. For repeated
    monitoring, persist the distinct-gram sets and re-join only the
    deltas.
    """
    from .dedup import exploded_shingles

    def gram_set(df: DataFrame, marker: str) -> DataFrame:
        d = df
        if id_col not in d.columns:
            d = d.withColumn(id_col, F.monotonically_increasing_id())
        return (
            exploded_shingles(d, text_col, id_col, n, distinct=False)
            .select(F.col("_sh").alias("_g"))
            .distinct()
            .withColumn(marker, F.lit(1))
        )

    joined = gram_set(a, "_ina").join(gram_set(b, "_inb"), "_g", "full_outer")
    n_a = F.sum(F.coalesce("_ina", F.lit(0))).cast("long")
    n_b = F.sum(F.coalesce("_inb", F.lit(0))).cast("long")
    n_common = F.sum(
        F.when(F.col("_ina").isNotNull() & F.col("_inb").isNotNull(), 1).otherwise(0)
    ).cast("long")
    agg = joined.agg(
        n_a.alias("n_grams_a"), n_b.alias("n_grams_b"), n_common.alias("n_common")
    )
    union_sz = F.col("n_grams_a") + F.col("n_grams_b") - F.col("n_common")
    return agg.select(
        "n_grams_a",
        "n_grams_b",
        "n_common",
        F.round(F.col("n_common") / F.greatest(union_sz, F.lit(1)) + 1e-9, round_digits)
        .alias("jaccard"),
        F.round(
            F.col("n_common") / F.greatest(F.col("n_grams_a"), F.lit(1)) + 1e-9,
            round_digits,
        ).alias("containment_a"),
        F.round(
            F.col("n_common") / F.greatest(F.col("n_grams_b"), F.lit(1)) + 1e-9,
            round_digits,
        ).alias("containment_b"),
    )


def token_length_histogram(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Log2-bucketed whitespace-token-length histogram — the packing
    and bucketing planner's input (how many documents land in the
    128-255-token bucket decides the sequence-packing bin layout and
    the shuffle-partition sizing for length-grouped batching).

    One row per occupied bucket: ``bucket`` = floor(log2(n_tokens))
    (-1 for zero-token documents, kept explicit because empty docs
    are a data-quality signal, not a rounding artifact), the bucket's
    inclusive [lo, hi] token range, document count, and total tokens.

    The bucket index is computed with INTEGER arithmetic — the bit
    length of n via base-2 string conversion — not a float log2,
    whose values at exact powers of two are one ulp from flipping the
    floor on some platforms; bit length is exact on every engine.
    Plan shape: one narrow projection + one ~64-key groupBy
    (map-side combinable) — no join, no sort, scan-bound at any
    corpus size.
    """
    # NULL text counts as 0 tokens (size() on NULL is -1 under the
    # engine's non-ANSI casts — never let that reach the sums)
    n_tok = F.when(
        F.col(text_col).isNull(), F.lit(0)
    ).otherwise(token_count_whitespace(F.col(text_col)))
    bucket = F.when(n_tok <= 0, F.lit(-1)).otherwise(
        (F.length(F.conv(n_tok.cast("string"), 10, 2)) - 1).cast("int")
    )
    by_bucket = (
        df.select(bucket.alias("bucket"), n_tok.alias("_n"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_n").cast("long").alias("total_tokens"),
        )
    )
    # shiftleft's Python wrapper takes only literal shift amounts; the
    # SQL function shifts by a column (same workaround as bloom_bitmap)
    lo = F.when(
        F.col("bucket") >= 0,
        F.call_function("shiftleft", F.lit(1).cast("long"), F.col("bucket")),
    )
    hi = F.when(
        F.col("bucket") >= 0,
        F.call_function("shiftleft", F.lit(1).cast("long"), F.col("bucket") + 1) - 1,
    )
    return by_bucket.select(
        "bucket",
        lo.alias("lo_tokens"),
        hi.alias("hi_tokens"),
        "n_docs",
        "total_tokens",
    ).orderBy("bucket")


def corpus_diversity(
    df: DataFrame,
    by: str = "source",
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Per-group corpus diversity report: document count, total n-gram
    occurrences, distinct n-grams, and the shingle type-token ratio
    (distinct / total) — the corpus-level health number mixture
    planners watch (a source whose TTR collapses is template spam or a
    re-crawl even when every individual document passes quality
    filters; per-document repetition stats can't see cross-document
    sameness).

    Plan shape at 100 TB: one exploded pass per corpus — total counts
    are map-side combinable on the group key; the distinct count is
    one (group, gram)-keyed dedup then a group rollup. The group join
    is id-keyed against an id+group projection of the input (narrow
    columns only). Nothing quadratic, nothing driver-side.
    """
    from .dedup import exploded_shingles

    grams = exploded_shingles(df, text_col, id_col, n, distinct=False).join(
        df.select(F.col(id_col), F.col(by)), id_col
    )
    per_group = grams.groupBy(by).agg(
        F.count("*").cast("long").alias("total_grams"),
        F.count_distinct("_sh").cast("long").alias("distinct_grams"),
    )
    docs_per_group = df.groupBy(by).agg(F.count("*").cast("long").alias("n_docs"))
    return (
        docs_per_group.join(per_group, by, "left")
        .select(
            by,
            "n_docs",
            F.coalesce("total_grams", F.lit(0).cast("long")).alias("total_grams"),
            F.coalesce("distinct_grams", F.lit(0).cast("long")).alias(
                "distinct_grams"
            ),
            F.round(
                F.coalesce("distinct_grams", F.lit(0))
                / F.greatest(F.coalesce("total_grams", F.lit(0)), F.lit(1))
                + 1e-9,
                round_digits,
            ).alias("type_token_ratio"),
        )
        .orderBy(by)
    )


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 3,
    min_lines: int = 2,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """C4-style hard cleanup rules (Raffel et al. 2020 §2.2) — the
    line-level and document-level DELETION pass that runs before the
    soft scoring of :func:`quality_score`:

    line rules (a line survives iff ALL hold):
      - at least ``min_words_per_line`` whitespace words;
      - ends in terminal punctuation (``. ! ? "``) when
        ``require_terminal_punct`` (C4's "terminal punctuation mark");
      - does not contain "javascript" (case-insensitive) or a curly
        brace (the code/boilerplate tells).
    document rules:
      - at least ``min_lines`` surviving lines;
      - no "lorem ipsum" anywhere (case-insensitive).

    Output: surviving docs with ``text`` REBUILT from the kept lines
    (newline-joined) plus ``n_lines_kept`` / ``n_lines_orig``. The
    whole pass is per-row array work — split, filter, rejoin — inside
    whole-stage codegen: zero shuffles, zero Python, embarrassingly
    parallel at any corpus size. Regexes stay in the RE2-portable
    subset (character classes and anchors only), so an external engine
    reproduces every keep/drop decision bit-for-bit.
    """
    if min_words_per_line < 1:
        raise ValueError("c4_clean: min_words_per_line must be >= 1")
    if min_lines < 1:
        raise ValueError("c4_clean: min_lines must be >= 1")
    lines = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )

    def line_ok(l):
        n_words = F.size(F.filter(F.split(l, r"[ \t]+"), lambda w: w != ""))
        ok = n_words >= F.lit(min_words_per_line)
        if require_terminal_punct:
            ok = ok & l.rlike(r'[.!?"]$')
        return (
            ok
            & ~F.lower(l).contains("javascript")
            & ~l.contains("{")
            & ~l.contains("}")
        )

    kept = F.filter(lines, line_ok)
    out = df.select(
        "*",
        F.size(lines).alias("n_lines_orig"),
        F.size(kept).alias("n_lines_kept"),
        F.array_join(kept, "\n").alias("_clean_text"),
    )
    return (
        out.filter(
            (F.col("n_lines_kept") >= min_lines)
            & ~F.lower(F.col(text_col)).contains("lorem ipsum")
        )
        .withColumn(text_col, F.col("_clean_text"))
        .drop("_clean_text")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k documents by BM25 (Robertson/Sparck Jones, the Okapi
    formulation Lucene defaults to) for a bag of query terms — the
    lexical-retrieval primitive a curation pipeline uses to pull
    topical slices out of a corpus (and the usual hybrid partner to
    the embedding top-k in operators.similarity).

    score(d) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)),
    with tf the raw count of t in d, dl the doc's token count, avgdl
    the corpus mean. Tokenization is :func:`normalized_words` — the
    same contract as tfidf_top_terms, so lexical and TF-IDF views of
    one corpus agree on terms.

    Plan shape, in corpus-scale order: dl is a per-row ``size()``
    expression (no shuffle); the explode is filtered to the query's
    terms BEFORE the (doc, term) tf aggregation, so the shuffle
    carries only rows mentioning a query term — |query| is a literal
    handful, the filter is an in-set codegen test, and everything
    else prunes at the scan. df-per-term and (N, avgdl) reduce to at
    most |query|+1 broadcast rows. The final top-k is
    TakeOrderedAndProject (score desc, id asc — deterministic), never
    a global sort. Rounded to ``round_digits`` with the half-ulp
    nudge so external engines rank identically. Docs matching no
    query term score 0 and are not returned (pure selection, k rows
    max, never a corpus-sized result).
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    if k < 1:
        raise ValueError("bm25_topk: k must be >= 1")
    # Query terms must pass through the SAME tokenizer contract as the
    # corpus or punctuation-bearing terms ("state-of-the-art", "don't")
    # silently match nothing: normalized_words splits corpus text on
    # non-letter/digit runs, so split the query identically (Python
    # [\W_] under UNICODE == not-letter/digit, matching \p{L}\p{N}) and
    # let a phrase-like term contribute each of its tokens.
    import re as _re

    terms = sorted(
        {
            w
            for t in query_terms
            for w in _re.split(r"[\W_]+", t.lower(), flags=_re.UNICODE)
            if w
        }
    )
    if not terms:
        raise ValueError(
            f"bm25_topk: query_terms {query_terms!r} contain no "
            "letter/digit tokens after normalization"
        )
    _require_unique_ids(docs, id_col, "bm25_topk")
    words = docs.select(
        F.col(id_col), normalized_words(text_col).alias("_words")
    ).withColumn("_dl", F.size("_words").cast("double"))
    stats = words.agg(
        F.count("*").cast("double").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )
    tf = (
        words.select(F.col(id_col), "_dl", F.explode("_words").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(
            F.count("*").cast("double").alias("_tf"),
            F.first("_dl").alias("_dl"),
        )
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("double").alias("_df"))
    idf = F.log(
        1.0 + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    term_score = idf * (
        F.col("_tf")
        * (k1 + 1.0)
        / (
            F.col("_tf")
            + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        )
    )
    return (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(term_score) + 1e-9, round_digits).alias("bm25"),
            F.count("*").cast("long").alias("n_terms_matched"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 20_000,
    round_digits: int = 4,
    impl: str = "arrow",
) -> DataFrame:
    """Per-document Shannon entropy of the character distribution, in
    bits — the cheap randomness probe that separates natural prose
    (English ~4.1 bits/char over its alphabet) from the two junk tails
    a pre-training corpus filter must catch: degenerate repetition
    (entropy → 0: padding runs, boilerplate loops) and high-entropy
    noise (base64 blobs, minified bundles, random keys → 5.5+ bits).
    The compression-twin signal is :func:`compression_ratio`; entropy
    is the engine-portable one (oracle-checkable), compression the
    byte-exact one.

    Returns (id, ``n_chars``, ``n_distinct_chars``, ``entropy``).
    Entropy = -sum over distinct chars c of p(c) * log2 p(c), computed
    over the first ``max_chars`` characters (a quality signal does not
    need the whole 10 MB document; truncation bounds the per-row cost
    and the oracle twin truncates identically). Empty/NULL text scores
    entropy 0 with n_chars 0.

    Both impls are shuffle-free and row-parallel; they differ only in
    the per-row engine (same ``signature_impl`` convention as
    operators.dedup's minhash):

    - ``'arrow'`` (default, the 100 TB path): one ``mapInPandas`` pass,
      numpy codepoint bincount per doc — ~10 ns/char, O(len) per row.
      Measured ~9x faster than the expression path at sf0.1.
    - ``'expr'`` (the portable twin): pure higher-order functions
      (distinct chars -> count-per-char via filter/size -> entropy
      fold), zero Python, O(distinct * len) Catalyst element evals per
      row (~µs each — the constant factor that loses at corpus scale).
      This is the formulation the DuckDB oracle reproduces verbatim.

    Values agree after rounding: each doc's float sum differs only in
    summation order (numpy sums in codepoint order, the expression
    fold in first-appearance order, DuckDB in its list order) — ~1e-15
    noise the shared half-ulp nudge + round-4 convention absorbs.
    """
    if impl not in ("arrow", "expr"):
        raise ValueError(f"char_entropy: impl={impl!r}; expected 'arrow' or 'expr'")
    if impl == "arrow":
        id_type = df.schema[id_col].dataType.simpleString()
        schema = (
            f"{id_col} {id_type}, n_chars long, n_distinct_chars long, "
            "entropy double"
        )

        def run(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                ids, nch, ndc, ent = [], [], [], []
                for i, t in zip(pdf[id_col], pdf[text_col]):
                    s = ("" if t is None else str(t))[:max_chars]
                    ids.append(i)
                    if not s:
                        nch.append(0)
                        ndc.append(0)
                        ent.append(0.0)
                        continue
                    codes = np.frombuffer(
                        s.encode("utf-32-le"), dtype=np.uint32
                    )
                    counts = np.unique(codes, return_counts=True)[1]
                    p = counts / counts.sum()
                    nch.append(len(codes))
                    ndc.append(len(counts))
                    ent.append(
                        round(float(-(p * np.log2(p)).sum()) + 1e-9, round_digits)
                    )
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "n_chars": nch,
                        "n_distinct_chars": ndc,
                        "entropy": ent,
                    }
                )

        return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema)
    chars = F.filter(
        F.split(F.substring(F.coalesce(F.col(text_col), F.lit("")), 1, max_chars), ""),
        lambda x: x != "",
    )
    n = F.size(chars)
    distinct = F.array_distinct(chars)
    counts = F.transform(
        distinct, lambda c: F.size(F.filter(chars, lambda x: x == c))
    )
    nd = n.cast("double")
    entropy = -F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, k: acc + (k / nd) * F.log2(k / nd),
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        F.size(distinct).cast("long").alias("n_distinct_chars"),
        F.when(n > 0, F.round(entropy + 1e-9, round_digits))
        .otherwise(F.lit(0.0))
        .alias("entropy"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the byte-exact twin of
    :func:`char_entropy` and the filter CCNet/Gopher-style pipelines
    apply directly: ``ratio = deflated_bytes / raw_bytes``. Natural
    prose lands ~0.3–0.5; heavy repetition collapses toward 0 (the
    low-quality tail); incompressible noise (base64, random blobs,
    already-compressed payloads pasted as text) pushes past ~0.9.

    Returns (id, ``n_bytes`` of UTF-8 raw, ``n_compressed``,
    ``ratio``). Empty/NULL text reports ratio 1.0 with n_bytes 0 (no
    evidence either way — the neutral value no threshold fires on).

    Python is unavoidable here (no JVM-side zlib expression), so the
    rows move ONCE through Arrow batches (``mapInPandas``) and the
    work is a C-speed ``zlib.compress`` per document — no shuffle, no
    per-row Python overhead beyond the call itself. zlib's output for
    a fixed ``level`` is deterministic for a given zlib build, but the
    BYTES are not a cross-engine contract — hence no DuckDB oracle
    (rows-only check), while the entropy twin carries the hash-checked
    oracle for the same quality dimension.
    """
    if not 0 <= level <= 9:
        raise ValueError(f"compression_ratio: level={level}; expected 0..9")
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_bytes long, n_compressed long, ratio double"

    def run(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            ids, nb, nc, ratio = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raw = ("" if t is None else str(t)).encode("utf-8")
                comp = zlib.compress(raw, level)
                ids.append(i)
                nb.append(len(raw))
                nc.append(len(comp))
                ratio.append(len(comp) / len(raw) if raw else 1.0)
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "n_compressed": nc, "ratio": ratio}
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(run, schema)


def script_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 20_000,
    mixed_threshold: float = 0.15,
    round_digits: int = 4,
) -> DataFrame:
    """Per-document Unicode-script composition — the routing/filtering
    signal a multilingual corpus pipeline applies before (or beside)
    n-gram language ID: fractions of Latin / Cyrillic / Han / Arabic /
    Devanagari characters plus digits, a ``dominant_script`` label,
    and an ``is_mixed`` flag for the script-salad junk (spam that
    interleaves scripts to evade filters, mojibake, wrong-decode
    artifacts) that language-ID models misclassify rather than reject.

    Denominator is NON-WHITESPACE characters of the first
    ``max_chars`` (the explicit class ``[ \\t\\n\\r\\f]`` — identical
    in Java regex and RE2, unlike ``\\s``). ``other_frac`` covers
    punctuation, symbols, and scripts outside the tracked five.
    ``dominant_script`` picks the max-count tracked script (fixed
    priority order on ties, 'none' when no tracked script appears);
    ``is_mixed`` fires when the tracked-script mass OUTSIDE the
    dominant one exceeds ``mixed_threshold`` of the text.

    Cost shape: zero shuffles, zero Python — a handful of
    ``regexp_count`` per row, embarrassingly parallel; the script
    classes are chosen because Java regex (``\\p{IsLatin}``) and RE2
    (``\\p{Latin}``) count them identically, which is what the DuckDB
    twin certifies. Fractions are ratios of integers, so cross-engine
    equality is exact (the shared rounding is cosmetic).
    """
    base = F.substring(F.coalesce(F.col(text_col), F.lit("")), 1, max_chars)
    scripts = {
        "latin": r"\p{IsLatin}",
        "cyrillic": r"\p{IsCyrillic}",
        "han": r"\p{IsHan}",
        "arabic": r"\p{IsArabic}",
        "devanagari": r"\p{IsDevanagari}",
    }
    counts = {k: F.regexp_count(base, F.lit(p)) for k, p in scripts.items()}
    digit = F.regexp_count(base, F.lit("[0-9]"))
    n = F.length(base) - F.regexp_count(base, F.lit(r"[ \t\n\r\f]"))
    nd = F.greatest(n, F.lit(1)).cast("double")
    script_sum = sum(counts.values())
    top = F.greatest(*counts.values())
    dominant = F.lit("none")
    for name in reversed(list(scripts)):  # earlier names win ties
        dominant = F.when(
            (counts[name] > 0) & (counts[name] == top), F.lit(name)
        ).otherwise(dominant)
    frac = lambda c: F.round(c / nd + 1e-9, round_digits)  # noqa: E731
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        *[frac(counts[k]).alias(f"{k}_frac") for k in scripts],
        frac(digit).alias("digit_frac"),
        frac(n - script_sum - digit).alias("other_frac"),
        dominant.alias("dominant_script"),
        ((script_sum - top) / nd > mixed_threshold).alias("is_mixed"),
    )
