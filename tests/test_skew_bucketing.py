"""Skew mitigation + bucketed layout: salted agg/join equivalence and
shuffle-free bucketed joins."""

import pytest
from pyspark.sql import functions as F

from facolos_data_pipelines_spark.operators.skew import (
    cap_group_size,
    salted_groupby_agg,
    salted_join,
)
from facolos_data_pipelines_spark.sources.io import write_bucketed


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a long tail
    rows = [("hot", float(i)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    return spark.createDataFrame(rows, ["key", "value"])


def test_salted_agg_matches_plain(skewed):
    plain = {
        r["key"]: (r["n"], r["total"])
        for r in skewed.groupBy("key")
        .agg(F.count("value").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    salted = {
        r["key"]: (r["n"], r["total"])
        for r in salted_groupby_agg(
            skewed,
            ["key"],
            {"n": ("value", "count"), "total": ("value", "sum")},
            salt_buckets=8,
        ).collect()
    }
    # count re-aggregates as sum of partial counts
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert salted[k][1] == pytest.approx(plain[k][1])


def test_salted_agg_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError):
        salted_groupby_agg(skewed, ["key"], {"m": ("value", "avg")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"D{i}") for i in range(100)], ["key", "label"]
    )
    plain = skewed.join(dim, ["key"]).groupBy("key").count()
    salted = salted_join(skewed, dim, ["key"], salt_buckets=4).groupBy("key").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_cap_group_size(skewed):
    capped = cap_group_size(skewed, ["key"], max_rows=10, order_col="value")
    counts = {r["key"]: r["count"] for r in capped.groupBy("key").count().collect()}
    assert counts["hot"] == 10
    assert all(v == 1 for k, v in counts.items() if k != "hot")
    # deterministic: lowest values kept
    kept = sorted(
        r["value"] for r in capped.filter(F.col("key") == "hot").collect()
    )
    assert kept == [float(i) for i in range(10)]


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    facts = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    dims = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("d")
    )
    write_bucketed(
        facts, "b_facts", ["k"], num_buckets=4, sort_cols=["k"],
        path=str(tmp_path / "b_facts"),
    )
    write_bucketed(
        dims, "b_dims", ["k"], num_buckets=4, sort_cols=["k"],
        path=str(tmp_path / "b_dims"),
    )
    # force the large-large path (broadcast would win at toy size and
    # bypass the bucketed layout entirely)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located layout: sort-merge join with zero shuffle exchanges
        assert "SortMergeJoin" in plan, plan
        assert "hashpartitioning" not in plan, plan
        assert joined.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE b_facts")
        spark.sql("DROP TABLE b_dims")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Date-partitioned staging layout: a date filter must become a
    PartitionFilter (pruned listing), not a row-level scan filter —
    this is the scale story for retention deletes and incremental
    reads (SCALE.md §2)."""
    from facolos_data_pipelines_spark.sources.io import write_replace

    df = spark.range(100).select(
        F.col("id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 10).cast("int")).alias("d"),
    )
    path = str(tmp_path / "part_tbl")
    write_replace(df, path, partition_by=["d"])

    got = spark.read.parquet(path).filter(F.col("d") == "2024-01-03")
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the date predicate must appear as a PartitionFilter on the scan
    # (pruned directory listing), not as a row-level data filter
    scan_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "= 2024-01-03)" in scan_line.split("PartitionFilters: [")[1]
    assert "DataFilters: []" in scan_line
    assert got.count() == 10


def test_ivf_cell_layout_prunes_partitions(spark, tmp_path):
    """SCALE.md's IVF claim made concrete: land vectors partitioned by
    their IVF cell, and the probe-time cell filter becomes partition
    pruning on the scan (only the probed cells' directories are read)."""
    from facolos_data_pipelines_spark.operators.similarity import (
        ivf_assign,
        ivf_train_lite,
    )
    from facolos_data_pipelines_spark.session import load_tables
    from facolos_data_pipelines_spark.sources.io import write_replace

    emb = load_tables(spark, "/root/testdata/sf0.001", ["embeddings"])["embeddings"]
    centroids = ivf_train_lite(emb, k=4)
    assigned = ivf_assign(emb, centroids)
    path = str(tmp_path / "ivf_tbl")
    write_replace(assigned, path, partition_by=["_cell"])

    probed = spark.read.parquet(path).filter(F.col("_cell").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "_cell" in scan_line.split("PartitionFilters: [")[1]
    assert "DataFilters: []" in scan_line
    # probed subset is exactly the rows assigned to those cells
    assert probed.count() == assigned.filter(F.col("_cell").isin([0, 1])).count()


def test_frequent_items_equals_full_groupby(spark):
    """The sketch-then-verify plan must EQUAL the full-shuffle GROUP BY /
    HAVING answer — including under adversarial partitioning (many small
    partitions, minimal counter budget) where a weaker sketch would drop
    a true heavy hitter, and with NULLs present (excluded by contract)."""
    import pyspark.sql.functions as F

    from facolos_data_pipelines_spark.operators.skew import frequent_items

    # skewed synthetic: 'hot' 40%, 'warm' 15%, tail of 45 singletons + nulls
    rows = (
        [("hot",)] * 400 + [("warm",)] * 150 + [(f"t{i}",) for i in range(445)]
        + [(None,)] * 5
    )
    df = spark.createDataFrame(rows, "v string").repartition(13)
    got = {
        (r["v"], r["n_rows"], r["row_share"])
        for r in frequent_items(df, "v", min_share=0.1, counters_factor=1).collect()
    }
    exact = (
        df.filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    total = exact.agg(F.sum("n_rows")).collect()[0][0]
    want = {
        (r["v"], r["n_rows"], round(r["n_rows"] / total + 1e-9, 6))
        for r in exact.collect()
        if r["n_rows"] >= 0.1 * total
    }
    assert got == want and {v for v, *_ in got} == {"hot", "warm"}

    with pytest.raises(ValueError, match="min_share"):
        frequent_items(df, "v", min_share=0.0)


def test_curriculum_order_buckets_and_determinism(spark):
    """Buckets are quantile-balanced and ascending in score; order_key is
    the md5 fraction (reproducible run-to-run); approx path bins the
    same rows within sketch tolerance; num_buckets<2 rejected."""
    from facolos_data_pipelines_spark.operators.sampling import curriculum_order

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).cast("double").alias("score")
    )
    out = curriculum_order(df, "score", "doc_id", num_buckets=4).cache()
    sizes = {r["bucket"]: r["cnt"] for r in
             out.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()}
    assert set(sizes) == {0, 1, 2, 3}
    assert all(abs(c - 250) <= 30 for c in sizes.values())
    # monotone: every score in bucket b+1 >= every score in bucket b
    stats = out.groupBy("bucket").agg(
        F.min("score").alias("lo"), F.max("score").alias("hi")
    ).orderBy("bucket").collect()
    for a, b in zip(stats, stats[1:]):
        assert b["lo"] >= a["hi"] - 1e-9
    # deterministic
    again = curriculum_order(df, "score", "doc_id", num_buckets=4)
    assert out.select("doc_id", "bucket", "order_key").subtract(
        again.select("doc_id", "bucket", "order_key")
    ).count() == 0
    out.unpersist()

    with pytest.raises(ValueError, match="num_buckets"):
        curriculum_order(df, "score", "doc_id", num_buckets=1)
