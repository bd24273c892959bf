"""Model-based document quality filtering — the learned upgrade of
:func:`..operators.text.quality_score`'s fixed heuristics.

Modern pre-training pipelines score documents with a small trained
classifier (a linear model or shallow MLP over cheap text features)
rather than hand-tuned thresholds, then keep docs above a score cutoff.
This module keeps the two halves in their right places for 100 TB:

- TRAINING (:func:`train_quality_classifier`) runs on a labeled sample
  — thousands-to-millions of rows, a driver-coordinated pyspark.ml
  LogisticRegression fit whose output is just ``1 + n_features``
  floats. Training cost never scales with the corpus.
- INFERENCE (:func:`score_quality_model`) is the part that touches all
  100 TB, so it is PURE COLUMN EXPRESSIONS: the learned weights are
  inlined as literals into ``sigmoid(w . features + b)`` over the same
  codegen feature expressions — no ML runtime, no UDF, no model
  broadcast, whole-stage codegen end to end. This is why the trainer
  returns a plain dict instead of an ml.Model: the contract between
  the halves is seven named floats, checkable by any engine (the
  oracle twin recomputes the identical expression in SQL).

Features are deterministic, order-stable, and SQL-portable (mirrored
in the entry query's DuckDB twin): saturating length, average word
length, punctuation/uppercase/digit ratios, lexical diversity,
stopword ratio.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS, normalized_words

#: feature column order — the weights dict is keyed by these names, so
#: a model survives feature-list reordering; training and scoring both
#: resolve through this list.
QUALITY_MODEL_FEATURES = [
    "f_len",
    "f_avg_word_len",
    "f_punct_ratio",
    "f_upper_ratio",
    "f_digit_ratio",
    "f_distinct_ratio",
    "f_stopword_ratio",
]


def _feature_exprs(text_col: str, lang: str = "en") -> dict[str, Column]:
    """The shared codegen feature expressions (training and inference
    MUST agree; the oracle twin mirrors these op-for-op)."""
    c = F.col(text_col)
    words = normalized_words(c)
    n_words = F.size(words)
    n_chars = F.length(c)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return {
        "f_len": F.least(n_words / F.lit(100.0), F.lit(1.0)),
        "f_avg_word_len": (
            F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
            / F.greatest(n_words, F.lit(1))
        ),
        # explicit whitespace class, not \s: Java's \s includes \x0B
        # (vertical tab) while RE2's does not, so \s on both sides would
        # diverge on VT-bearing docs and break the hash-certified oracle
        # (same convention as script_profile)
        "f_punct_ratio": (
            F.regexp_count(c, F.lit("[^\\p{L}\\p{N} \\t\\n\\x0B\\f\\r]"))
            / F.greatest(n_chars, F.lit(1))
        ),
        "f_upper_ratio": (
            F.regexp_count(c, F.lit(r"[A-Z]")) / F.greatest(n_chars, F.lit(1))
        ),
        "f_digit_ratio": (
            F.regexp_count(c, F.lit(r"[0-9]")) / F.greatest(n_chars, F.lit(1))
        ),
        "f_distinct_ratio": (
            F.size(F.array_distinct(words)) / F.greatest(n_words, F.lit(1))
        ),
        "f_stopword_ratio": (
            F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
            / F.greatest(n_words, F.lit(1))
        ),
    }


def quality_features(
    df: DataFrame, text_col: str = "text", lang: str = "en"
) -> DataFrame:
    """Append the :data:`QUALITY_MODEL_FEATURES` columns (all pure
    codegen — one narrow projection, no shuffle)."""
    exprs = _feature_exprs(text_col, lang)
    return df.select(
        "*", *[exprs[name].cast("double").alias(name) for name in QUALITY_MODEL_FEATURES]
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    lang: str = "en",
    max_iter: int = 50,
    reg_param: float = 0.0,
) -> dict:
    """Fit a logistic-regression quality classifier on a LABELED sample
    (``label_col`` in {0, 1}: 1 = keep-worthy) and return the model as
    ``{"intercept": b, "weights": {feature: w}}`` — plain floats, ready
    for :func:`score_quality_model`'s expression-only inference.

    Runs pyspark.ml on the sample (distributed gradient steps; driver
    holds only the coefficient vector). Training data should be a
    bounded labeled set — curated positives plus sampled negatives —
    not the full corpus; the returned dict is the ONLY thing inference
    needs, so persist it as JSON next to the pipeline config.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(df, text_col, lang)
    assembled = VectorAssembler(
        inputCols=QUALITY_MODEL_FEATURES, outputCol="_qm_vec"
    ).transform(feats)
    n_classes = assembled.select(label_col).distinct().count()
    if n_classes < 2:
        raise ValueError(
            f"train_quality_classifier: label column {label_col!r} has "
            f"{n_classes} distinct value(s); need both classes 0 and 1"
        )
    model = LogisticRegression(
        featuresCol="_qm_vec",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
    ).fit(assembled)
    return {
        "intercept": float(model.intercept),
        "weights": {
            name: float(w)
            for name, w in zip(QUALITY_MODEL_FEATURES, model.coefficients)
        },
    }


def score_quality_model(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    lang: str = "en",
    threshold: float | None = None,
    score_col: str = "model_score",
) -> DataFrame:
    """Score every document with a trained quality model as pure column
    expressions: ``sigmoid(intercept + sum(w_i * f_i))`` with the
    weights inlined as literals — the 100 TB inference path (no ML
    runtime, no UDF, whole-stage codegen; one narrow projection).

    With ``threshold`` set, also appends boolean ``keep`` = score >=
    threshold (the filter stage applies it; keeping the flag visible
    makes threshold sweeps one scan instead of N).
    """
    missing = [n for n in QUALITY_MODEL_FEATURES if n not in model["weights"]]
    if missing:
        raise ValueError(
            f"score_quality_model: model is missing weights for {missing}; "
            f"expected all of {QUALITY_MODEL_FEATURES}"
        )
    exprs = _feature_exprs(text_col, lang)
    z = F.lit(float(model["intercept"]))
    for name in QUALITY_MODEL_FEATURES:
        z = z + F.lit(float(model["weights"][name])) * exprs[name]
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    out = df.withColumn(score_col, score)
    if threshold is not None:
        out = out.withColumn("keep", F.col(score_col) >= F.lit(float(threshold)))
    return out
