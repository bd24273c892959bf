"""snapshot_diff CDC labels and mix_to_weights mixture sampling."""

import pytest
from pyspark.sql import functions as F

from facolos_data_pipelines_spark.operators.merge import snapshot_diff
from facolos_data_pipelines_spark.operators.sampling import mix_to_weights


def test_snapshot_diff_labels_added_removed_changed(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (None, "n", 1.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0), (None, "n", 2.0)],
        ["k", "s", "v"],
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    # 1 unchanged (excluded), 2 changed, 3 removed, 4 added; NULL keys
    # match null-safely -> the None row is changed, not added+removed
    assert got == {2: "changed", 3: "removed", 4: "added", None: "changed"}


def test_snapshot_diff_include_unchanged_and_custom_cols(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], ["k", "s", "v"])
    new = spark.createDataFrame([(1, "a", 99.0)], ["k", "s", "v"])
    # comparing only 's' -> the v difference is invisible
    rows = snapshot_diff(
        old, new, ["k"], compare_cols=["s"], include_unchanged=True
    ).collect()
    assert [(r["k"], r["change_type"]) for r in rows] == [(1, "unchanged")]


def test_mix_to_weights_hits_targets_and_is_deterministic(spark):
    rows = [(i, "en" if i < 600 else ("es" if i < 800 else "de")) for i in range(900)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    weights = {"en": 0.6, "es": 0.2, "de": 0.2}
    out = mix_to_weights(df, "lang", weights)
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    # T = min(600/.6, 200/.2, 100/.2) = 500 -> targets 300/100/100;
    # de is the binding group and keeps everything (threshold 1.0)
    assert got["de"] == 100
    assert abs(got["en"] - 300) < 60  # binomial tolerance
    assert abs(got["es"] - 100) < 40
    again = mix_to_weights(df, "lang", weights)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_mix_to_weights_drops_unweighted_and_validates(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "xx"), (3, "es")], ["doc_id", "lang"]
    )
    out = mix_to_weights(df, "lang", {"en": 0.5, "es": 0.5})
    assert {r["lang"] for r in out.collect()} <= {"en", "es"}
    with pytest.raises(ValueError, match="sum to 1"):
        mix_to_weights(df, "lang", {"en": 0.5})
    with pytest.raises(ValueError, match=r"no rows for 1 weighted group\(s\), e.g. \['fr'\]"):
        mix_to_weights(df, "lang", {"en": 0.5, "fr": 0.5})
    with pytest.raises(ValueError, match="must be positive"):
        mix_to_weights(df, "lang", {"en": 1.5, "es": -0.5})


def test_mix_to_weights_bounded_error_on_huge_weights(spark):
    """A high-cardinality weights dict must not drive a large driver
    fetch: the missing-group error reports at most 10 examples plus a
    count, and the weights travel as a broadcast frame (no create_map
    literal blowing up the plan)."""
    df = spark.createDataFrame([(1, "g0"), (2, "g1")], ["doc_id", "lang"])
    n = 5000
    weights = {f"g{i}": 1.0 / n for i in range(n)}
    with pytest.raises(ValueError) as e:
        mix_to_weights(df, "lang", weights)
    msg = str(e.value)
    assert f"no rows for {n - 2} weighted group(s)" in msg
    assert "(+" in msg and "more)" in msg
    assert msg.count("'g") <= 10  # sample capped, not the full list


def test_curate_corpus_rejects_half_specified_mix(spark):
    from facolos_data_pipelines_spark.pipelines import curate_corpus

    docs = spark.createDataFrame([(1, "some text", "en")], ["doc_id", "text", "lang"])
    with pytest.raises(ValueError, match="must be given together"):
        curate_corpus(spark, docs, mix_weights={"en": 1.0})
    with pytest.raises(ValueError, match="must be given together"):
        curate_corpus(spark, docs, mix_col="lang")


def test_pack_documents_rejects_duplicate_ids(spark):
    from facolos_data_pipelines_spark.operators.text import pack_documents

    df = spark.createDataFrame([(1, "a b"), (1, "c d")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="unique, non-null id"):
        pack_documents(df, max_tokens=10)


def test_merge_aggregate_folds_batch_into_state(spark):
    from facolos_data_pipelines_spark.operators.merge import merge_aggregate

    existing = spark.createDataFrame(
        [("a", 10.0, 2), ("b", 5.0, 1)], "k: string, v: double, n_rows: long"
    )
    batch = spark.createDataFrame(
        [("a", 3.0), ("c", 7.0)], "k: string, v: double"
    )
    got = {
        r["k"]: (r["v"], r["n_rows"])
        for r in merge_aggregate(existing, batch, ["k"], ["v"]).collect()
    }
    # touched key folds, untouched key unchanged, new key appears
    assert got == {"a": (13.0, 3), "b": (5.0, 1), "c": (7.0, 1)}


def test_merge_distinct_sketch_tracks_exact_distinct(spark):
    from pyspark.sql import functions as F2
    from facolos_data_pipelines_spark.operators.merge import (
        distinct_estimate,
        merge_distinct_sketch,
    )

    old = spark.range(0, 600).select(
        (F2.col("id") % 2).alias("g"), F2.col("id").alias("user")
    )
    new = spark.range(400, 1000).select(
        (F2.col("id") % 2).alias("g"), F2.col("id").alias("user")
    )
    state = old.groupBy("g").agg(
        F2.hll_sketch_agg("user", F2.lit(12)).alias("hll_sketch")
    )
    merged = merge_distinct_sketch(state, new, ["g"], "user")
    est = {r["g"]: r["n_distinct_est"] for r in distinct_estimate(merged).collect()}
    # truth: union of [0,600) and [400,1000) per parity group = 500 each
    for g in (0, 1):
        assert abs(est[g] - 500) / 500 < 0.05, est
    # sketch union must NOT double-count the [400,600) overlap: a plain
    # sum of per-batch distincts would give 600
    assert est[0] + est[1] < 1100


def test_weighted_sample_prefers_heavy_rows_deterministically(spark):
    from pyspark.sql import functions as F2
    from facolos_data_pipelines_spark.operators.sampling import weighted_sample

    # ids 0-99 light (w=1), ids 100-199 heavy (w=50)
    df = spark.range(200).select(
        F2.col("id").alias("doc_id"),
        F2.when(F2.col("id") >= 100, 50.0).otherwise(1.0).alias("w"),
    )
    out = weighted_sample(df, "w", k=40)
    rows = out.collect()
    assert len(rows) == 40
    heavy = sum(1 for r in rows if r["doc_id"] >= 100)
    assert heavy > 30  # 50x weight dominates the draw
    # deterministic
    again = weighted_sample(df, "w", k=40).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(r["doc_id"] for r in again)
    # non-positive weights excluded, k validated
    with_zero = df.withColumn(
        "w", F2.when(F2.col("doc_id") < 150, 0.0).otherwise(F2.col("w"))
    )
    kept = weighted_sample(with_zero, "w", k=200).collect()
    assert all(r["doc_id"] >= 150 for r in kept)
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample(df, "w", k=0)


# ---------------------------------------------------------------------------
# Property-based: Spark results vs plain-python references
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.floats(min_value=0.1, max_value=100.0), min_size=1, max_size=30),
    st.integers(min_value=1, max_value=10),
)
def test_weighted_sample_matches_python_reference(spark, weights, k):
    import hashlib
    import math

    from facolos_data_pipelines_spark.operators.sampling import weighted_sample

    data = [(i, float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(data, "doc_id: long, w: double")
    got = sorted(r["doc_id"] for r in weighted_sample(df, "w", k=k).collect())

    def priority(i, w):
        h = hashlib.md5(f"wsample:{i}".encode()).hexdigest()
        u = (int(h[:8], 16) + 1) / float(1 << 32)
        return math.exp(math.log(u) / w)

    ranked = sorted(data, key=lambda t: (-priority(*t), t[0]))
    want = sorted(i for i, _ in ranked[:k])
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=15),
        st.sampled_from(["a", "b"]),
        max_size=12,
    ),
    st.dictionaries(
        st.integers(min_value=0, max_value=15),
        st.sampled_from(["a", "b"]),
        max_size=12,
    ),
)
def test_snapshot_diff_matches_python_reference(spark, old_map, new_map):
    old = spark.createDataFrame(
        [(k, v) for k, v in old_map.items()] or [(None, None)], "k: long, s: string"
    ).filter("k IS NOT NULL")
    new = spark.createDataFrame(
        [(k, v) for k, v in new_map.items()] or [(None, None)], "k: long, s: string"
    ).filter("k IS NOT NULL")
    got = {
        r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()
    }
    want = {}
    for k in set(old_map) | set(new_map):
        if k not in old_map:
            want[k] = "added"
        elif k not in new_map:
            want[k] = "removed"
        elif old_map[k] != new_map[k]:
            want[k] = "changed"
    assert got == want


def test_mix_to_weights_rejects_internal_column_clash(spark):
    from facolos_data_pipelines_spark.operators.sampling import mix_to_weights

    df = spark.createDataFrame([(1, "a", 0.5)], ["doc_id", "source", "_w"])
    with pytest.raises(ValueError, match="internal working columns"):
        mix_to_weights(df, "source", {"a": 1.0})


def test_temperature_mix_flattens_toward_uniform(spark):
    """tau=1 keeps everything (natural proportions are already the
    target); tau=0 equalizes group masses (each group ends near the
    smallest group's count); tau between flattens monotonically. The
    kept set is deterministic and NULL groups are dropped."""
    import pyspark.sql.functions as F

    from facolos_data_pipelines_spark.operators.sampling import temperature_mix

    rows = (
        [(i, "big") for i in range(900)]
        + [(i + 1000, "mid") for i in range(300)]
        + [(i + 2000, "small") for i in range(100)]
        + [(3000, None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string")

    def counts(tau):
        out = temperature_mix(df, "grp", temperature=tau, id_col="doc_id")
        return {r["grp"]: r["n"] for r in
                out.groupBy("grp").agg(F.count("*").alias("n")).collect()}

    c1 = counts(1.0)
    assert c1 == {"big": 900, "mid": 300, "small": 100}  # natural = no-op
    c0 = counts(0.0)
    assert c0["small"] == 100  # binding group keeps everything
    assert abs(c0["big"] - 100) <= 25 and abs(c0["mid"] - 100) <= 25
    ch = counts(0.5)
    assert c0["big"] <= ch["big"] <= c1["big"]  # monotone in tau
    # deterministic replay
    a = {r["doc_id"] for r in temperature_mix(df, "grp", 0.5, "doc_id").collect()}
    b = {r["doc_id"] for r in temperature_mix(df, "grp", 0.5, "doc_id").collect()}
    assert a == b
    with pytest.raises(ValueError, match="temperature"):
        temperature_mix(df, "grp", temperature=-0.1)


def test_population_stability_index(spark):
    """Identical snapshots give PSI ~= 0 in every bin; a location shift
    concentrates current mass in the top bins and yields a large total
    PSI; empty bins hit the epsilon floor instead of infinity."""
    import pyspark.sql.functions as F

    from facolos_data_pipelines_spark.quality.checks import (
        population_stability_index,
    )

    base = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    same = population_stability_index(base, base, "v", num_bins=5).collect()
    assert [r["bin"] for r in same] == [0, 1, 2, 3, 4]
    assert all(abs(r["psi_term"]) < 1e-6 for r in same)
    assert sum(r["n_base"] for r in same) == 1000

    shifted = base.select((F.col("v") + 80).alias("v"))
    drift = population_stability_index(base, shifted, "v", num_bins=5).collect()
    total = sum(r["psi_term"] for r in drift)
    assert total > 0.25  # "significant shift" on the standard scale
    floored = [r for r in drift if r["n_curr"] == 0]
    assert floored and all(r["p_curr"] == 0.0001 for r in floored)

    with pytest.raises(ValueError, match="num_bins"):
        population_stability_index(base, base, "v", num_bins=1)


def test_token_budget_sample_meets_budget_without_undershoot(spark):
    """Docs of 10 tokens each, budget 35: the doc crossing the
    boundary is kept, so the kept mass is >= 35 and dropping the last
    kept doc would undershoot."""
    from facolos_data_pipelines_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [(i, "tok " * 9 + "tok", "a") for i in range(20)]
        + [(100 + i, "x y z", "b") for i in range(3)]
        + [(200, "dropped source", "c")],
        ["doc_id", "text", "source"],
    )
    out = token_budget_sample(docs, {"a": 35, "b": 1000}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    got_a = sum(r["n_tokens"] for r in by_src["a"])
    assert got_a >= 35 and got_a - 10 < 35  # crossing doc kept, no more
    # budget beyond supply keeps the whole source; unlisted sources drop
    assert len(by_src["b"]) == 3 and "c" not in by_src
    assert set(out[0].asDict()) == {"doc_id", "text", "source", "n_tokens"}


def test_token_budget_sample_prefilter_matches_exact(spark):
    from facolos_data_pipelines_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 7)), f"s{i % 3}") for i in range(60)],
        ["doc_id", "text", "source"],
    )
    budgets = {"s0": 40, "s1": 25, "s2": 60}
    exact = {
        r["doc_id"] for r in token_budget_sample(docs, budgets).collect()
    }
    pre = {
        r["doc_id"]
        for r in token_budget_sample(
            docs, budgets, prefilter_margin=2.0
        ).collect()
    }
    assert exact == pre and exact

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        token_budget_sample(docs, {})
    with _pytest.raises(ValueError, match="positive"):
        token_budget_sample(docs, {"s0": 0})
    with _pytest.raises(ValueError, match="margin"):
        token_budget_sample(docs, budgets, prefilter_margin=0.5)
    with _pytest.raises(ValueError, match="collide"):
        token_budget_sample(
            docs.withColumn("_tok", F.lit(1)), budgets
        )
