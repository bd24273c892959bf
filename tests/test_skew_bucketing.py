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
