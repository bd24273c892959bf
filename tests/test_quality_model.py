"""Model-based quality filtering: trainer recovers a separable corpus,
and the expression-only scorer is numerically faithful to the pyspark.ml
model it was distilled from (the contract that lets inference run as
pure codegen over 100 TB with no ML runtime)."""

import math

import pytest
from pyspark.sql import functions as F

from facolos_data_pipelines_spark.operators.quality_model import (
    QUALITY_MODEL_FEATURES,
    quality_features,
    score_quality_model,
    train_quality_classifier,
)


def _labeled_corpus(spark, n=120):
    """Deterministic separable corpus: prose-like positives vs
    punctuation/digit-soup negatives."""
    rows = []
    for i in range(n):
        good = (
            f"the quick brown fox number {i} jumps over the lazy dog and "
            "then it runs through the quiet field while the sun is high "
            "above the hills and the river flows to the sea"
        )
        bad = f"@@## {i} $$%% 1234 !!! ### 999 *** ((( ))) {i * 7} &&& ^^^ %%% 000 @@@ !!!"
        rows.append((2 * i, good, 1))
        rows.append((2 * i + 1, bad, 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_quality_features_shape_and_ranges(spark):
    docs = _labeled_corpus(spark, n=10)
    out = quality_features(docs)
    assert all(f in out.columns for f in QUALITY_MODEL_FEATURES)
    rows = out.collect()
    for r in rows:
        for f in QUALITY_MODEL_FEATURES:
            assert r[f] is not None and not math.isnan(r[f])
        for f in ("f_len", "f_punct_ratio", "f_upper_ratio", "f_digit_ratio",
                  "f_distinct_ratio", "f_stopword_ratio"):
            assert 0.0 <= r[f] <= 1.0, (f, r[f])
    # the features actually separate the classes
    good = [r for r in rows if r["label"] == 1][0]
    bad = [r for r in rows if r["label"] == 0][0]
    assert good["f_stopword_ratio"] > bad["f_stopword_ratio"]
    assert good["f_punct_ratio"] < bad["f_punct_ratio"]


def test_train_then_score_separates_holdout(spark):
    corpus = _labeled_corpus(spark)
    train = corpus.filter(F.col("doc_id") % 4 != 0)
    holdout = corpus.filter(F.col("doc_id") % 4 == 0)
    model = train_quality_classifier(train, "label")
    assert set(model["weights"]) == set(QUALITY_MODEL_FEATURES)
    scored = score_quality_model(holdout, model, threshold=0.5)
    rows = scored.collect()
    correct = sum(1 for r in rows if bool(r["keep"]) == bool(r["label"]))
    assert correct / len(rows) >= 0.95, f"holdout accuracy {correct}/{len(rows)}"


def test_expression_scorer_matches_ml_model_probabilities(spark):
    """The distilled literal-expression sigmoid must reproduce the
    pyspark.ml model's own predicted probabilities (<=1e-9 abs diff) —
    proves nothing is lost dropping the ML runtime at inference."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    corpus = _labeled_corpus(spark, n=40)
    feats = quality_features(corpus)
    assembled = VectorAssembler(
        inputCols=QUALITY_MODEL_FEATURES, outputCol="_qm_vec"
    ).transform(feats)
    ml_model = LogisticRegression(
        featuresCol="_qm_vec", labelCol="label", maxIter=50, regParam=0.0
    ).fit(assembled)
    dist = {
        "intercept": float(ml_model.intercept),
        "weights": dict(zip(QUALITY_MODEL_FEATURES, map(float, ml_model.coefficients))),
    }
    ml_probs = {
        r["doc_id"]: float(r["probability"][1])
        for r in ml_model.transform(assembled).select("doc_id", "probability").collect()
    }
    expr_probs = {
        r["doc_id"]: r["model_score"]
        for r in score_quality_model(corpus, dist).select("doc_id", "model_score").collect()
    }
    assert set(ml_probs) == set(expr_probs)
    worst = max(abs(ml_probs[k] - expr_probs[k]) for k in ml_probs)
    assert worst <= 1e-9, f"max |ml - expr| = {worst}"


def test_trainer_and_scorer_error_paths(spark):
    docs = spark.createDataFrame(
        [(0, "all the same label", 1), (1, "still the same", 1)],
        "doc_id long, text string, label int",
    )
    with pytest.raises(ValueError, match="both classes"):
        train_quality_classifier(docs, "label")
    with pytest.raises(ValueError, match="missing weights"):
        score_quality_model(docs, {"intercept": 0.0, "weights": {"f_len": 1.0}})
