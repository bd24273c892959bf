"""Pipeline runner (SURVEY §3.1-3.3): incremental cycle, replay
idempotence, quality gate, batch_runs control log, upsert mode."""

import pytest
from pyspark.sql import functions as F

from facolos_data_pipelines_spark.catalog.schemas import RAW_TIKTOK_ORDER_SCHEMA
from facolos_data_pipelines_spark.operators.conform import flatten_tiktok_orders
from facolos_data_pipelines_spark.pipelines import EndpointSpec, run_incremental_cycle

RAW_ORDERS = [
    {
        "order_id": "O1",
        "order_status": "COMPLETED",
        "create_time": 1700000000,
        "line_items": [
            {"product_id": "p1", "product_name": "widget", "sku_id": "s1", "quantity": "1"},
            {"product_id": "p2", "product_name": "gadget", "sku_id": "s2", "quantity": "2"},
        ],
    },
    {"order_id": "O2", "order_status": "UNPAID", "create_time": 1700000100, "line_items": []},
]


def _spec(spark, name="tiktok_orders", mode="append"):
    return EndpointSpec(
        name=name,
        extract=lambda s: s.createDataFrame(RAW_ORDERS, RAW_TIKTOK_ORDER_SCHEMA),
        transform=lambda raw, batch_id: flatten_tiktok_orders(raw, batch_id),
        primary_keys=["order_id", "item_id", "item_sku_id"],
        load_mode=mode,
    )


def test_incremental_cycle_lands_and_gates(spark, tmp_path):
    root = str(tmp_path / "staging")
    control = str(tmp_path / "control")
    report = run_incremental_cycle(
        spark, [_spec(spark)], root, control_root=control, min_tables_with_data=1
    )
    assert report["status"] == "success"
    assert report["endpoints"]["tiktok_orders"]["records"] == 3  # 2 items + 1 empty
    assert report["quality"]["passed"]

    landed = spark.read.parquet(f"{root}/tiktok_orders")
    assert landed.count() == 3

    runs = spark.read.parquet(f"{control}/batch_runs")
    row = runs.collect()[0]
    assert row["source_name"] == "tiktok_orders" and row["status"] == "success"
    assert row["records_loaded"] == 3


def test_cycle_replay_is_idempotent_per_batch_keys(spark, tmp_path):
    """Replaying identical source data with the same keys appends 0
    (PK rejection) — keys here exclude etl_batch_id to simulate
    redelivery of the same business rows."""
    root = str(tmp_path / "staging")
    spec = _spec(spark)
    r1 = run_incremental_cycle(spark, [spec], root, min_tables_with_data=1)
    r2 = run_incremental_cycle(spark, [spec], root, min_tables_with_data=1)
    assert r1["endpoints"]["tiktok_orders"]["records"] == 3
    assert r2["endpoints"]["tiktok_orders"]["records"] == 0
    assert spark.read.parquet(f"{root}/tiktok_orders").count() == 3


def test_cycle_upsert_mode_updates_not_duplicates(spark, tmp_path):
    root = str(tmp_path / "staging")
    spec = _spec(spark, mode="upsert")
    run_incremental_cycle(spark, [spec], root, min_tables_with_data=1)
    run_incremental_cycle(spark, [spec], root, min_tables_with_data=1)
    landed = spark.read.parquet(f"{root}/tiktok_orders")
    assert landed.count() == 3  # second run updated, did not duplicate


def test_cycle_upsert_executes_transform_once(spark, tmp_path):
    """The upsert branch must execute the extract→transform plan exactly
    once per cycle (localCheckpoint before count + upsert) — the old
    code ran upsert_parquet then conformed.count(), re-executing the
    whole plan. A mapInPandas tap counts the rows that actually flow."""
    root = str(tmp_path / "staging")
    marker = str(tmp_path / "upsert_tap.txt")

    def tapped_transform(raw, batch_id):
        conformed = flatten_tiktok_orders(raw, batch_id)

        def tap(batches):
            for pdf in batches:
                if len(pdf):
                    with open(marker, "a") as f:
                        f.write("x" * len(pdf))
                yield pdf

        return conformed.mapInPandas(tap, conformed.schema)

    spec = EndpointSpec(
        name="tiktok_orders",
        extract=lambda s: s.createDataFrame(RAW_ORDERS, RAW_TIKTOK_ORDER_SCHEMA),
        transform=tapped_transform,
        primary_keys=["order_id", "item_id", "item_sku_id"],
        load_mode="upsert",
    )
    report = run_incremental_cycle(spark, [spec], root, min_tables_with_data=1)
    n = report["endpoints"]["tiktok_orders"]["records"]
    assert n == 3
    with open(marker) as f:
        assert len(f.read()) == n  # one execution, not two


def test_cycle_upsert_partition_scoped_layout(spark, tmp_path):
    """EndpointSpec.partition_by flows through to the partition-scoped
    merge: the staging table lands hive-partitioned and replays stay
    idempotent. The partition column must be KEY-STABLE (the scoped
    merge never looks outside the incoming batch's partitions):
    create_time qualifies — order_status, which changes per key across
    cycles, would leave stale rows behind and must not be used."""
    import os

    root = str(tmp_path / "staging")
    spec = EndpointSpec(
        name="tiktok_orders",
        extract=lambda s: s.createDataFrame(RAW_ORDERS, RAW_TIKTOK_ORDER_SCHEMA),
        transform=lambda raw, batch_id: flatten_tiktok_orders(raw, batch_id),
        primary_keys=["order_id", "item_id", "item_sku_id"],
        load_mode="upsert",
        partition_by=["create_time"],
    )
    run_incremental_cycle(spark, [spec], root, min_tables_with_data=1)
    run_incremental_cycle(spark, [spec], root, min_tables_with_data=1)
    table = f"{root}/tiktok_orders"
    parts = {p for p in os.listdir(table) if p.startswith("create_time=")}
    assert parts == {"create_time=1700000000", "create_time=1700000100"}
    assert spark.read.parquet(table).count() == 3  # replay did not duplicate


def test_registry_schedules_and_advances_extract_time(spark, tmp_path):
    """data_sources registry contract: a not-yet-due endpoint is
    skipped (skipped_not_due), a due one runs, and last_extract_time
    advances only for the sources that actually extracted."""
    import datetime as dt

    from facolos_data_pipelines_spark.pipelines.registry import (
        due_sources,
        load_registry,
        seed_data_sources,
    )

    root = str(tmp_path / "staging")
    reg = str(tmp_path / "data_sources")
    now = dt.datetime(2024, 6, 1, 12, 0, 0)

    seed_data_sources(
        spark, reg, [("tiktok_orders", "ecommerce", 6.0), ("misa_crm", "crm", 24.0)]
    )
    # misa_crm extracted 1h ago (freq 24h -> not due); tiktok never (due)
    from facolos_data_pipelines_spark.pipelines.registry import mark_extracted

    mark_extracted(spark, reg, ["misa_crm"], now - dt.timedelta(hours=1))
    assert due_sources(spark, reg, now) == {"tiktok_orders"}

    specs = [_spec(spark), _spec(spark, name="misa_crm")]
    report = run_incremental_cycle(
        spark, specs, root, min_tables_with_data=1, registry_path=reg, now=now
    )
    assert report["endpoints"]["tiktok_orders"]["status"] == "success"
    assert report["endpoints"]["misa_crm"]["status"] == "skipped_not_due"

    times = {
        r["source_name"]: r["last_extract_time"]
        for r in load_registry(spark, reg).collect()
    }
    assert times["tiktok_orders"] == now  # advanced by the cycle
    assert times["misa_crm"] == now - dt.timedelta(hours=1)  # untouched

    # 7 hours later tiktok (6h freq) is due again, misa (24h) still not
    later = now + dt.timedelta(hours=7)
    assert due_sources(spark, reg, later) == {"tiktok_orders"}
    # seeding again must not clobber state (tolerate-exists)
    seed_data_sources(
        spark, reg, [("tiktok_orders", "ecommerce", 6.0), ("misa_crm", "crm", 24.0)]
    )
    assert due_sources(spark, reg, later) == {"tiktok_orders"}


def test_cycle_continues_past_failing_endpoint(spark, tmp_path):
    root = str(tmp_path / "staging")

    def boom(s):
        raise RuntimeError("api down")

    bad = EndpointSpec(
        name="bad",
        extract=boom,
        transform=lambda df, b: df,
        primary_keys=["x"],
    )
    report = run_incremental_cycle(
        spark, [bad, _spec(spark)], root, min_tables_with_data=1
    )
    assert report["status"] == "partial"
    assert report["endpoints"]["bad"]["status"] == "failed"
    assert report["endpoints"]["tiktok_orders"]["status"] == "success"
    assert report["quality"]["passed"]


def test_curate_corpus_end_to_end(spark, sf_dir, tmp_path):
    from facolos_data_pipelines_spark.pipelines import curate_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("text")
    train = docs.filter(F.col("doc_id") % 50 != 0)
    out_path = str(tmp_path / "curated")
    res = curate_corpus(spark, train, benchmark=bench, output_path=out_path)
    m = {r["stage"]: (r["rows_in"], r["rows_out"]) for r in res.metrics.collect()}
    n0 = train.count()
    assert m["quality_filter"][0] == n0
    # each stage consumes the previous stage's output and never grows
    assert m["decontaminate"][0] == m["quality_filter"][1]
    assert m["near_dedup"][0] == m["decontaminate"][1]
    for rin, rout in m.values():
        assert 0 <= rout <= rin
    assert m["quality_filter"][1] < n0  # bottom quartile dropped
    surv = spark.read.parquet(out_path)
    assert surv.count() == m["near_dedup"][1]
    assert {"doc_id", "text", "fp_content", "fp_rolling_min"} <= set(surv.columns)
    # survivors are a subset of the input ids
    assert surv.join(train, "doc_id", "left_anti").count() == 0


def test_curate_corpus_with_mixture_stage(spark, sf_dir):
    from facolos_data_pipelines_spark.pipelines import curate_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = curate_corpus(
        spark,
        docs,
        quality_quantile=0.0,  # keep all: isolate the mixture stage
        dedup_threshold=0.8,
        mix_col="lang",
        mix_weights={"en": 0.6, "es": 0.2, "de": 0.2},
    )
    m = {r["stage"]: (r["rows_in"], r["rows_out"]) for r in res.metrics.collect()}
    assert "mixture" in m
    assert m["mixture"][0] == m["near_dedup"][1]
    assert 0 < m["mixture"][1] <= m["mixture"][0]
    assert m["fingerprint"][0] == m["mixture"][1]
    # only weighted languages survive the mix
    assert {r["lang"] for r in res.survivors.select("lang").distinct().collect()} <= {
        "en", "es", "de"
    }


def test_curate_corpus_temperature_and_curriculum(spark, sf_dir):
    """Temperature mixing is the weight-free mixture arm, and the
    curriculum stage stamps (bucket, order_key) on survivors without
    changing the row count; conflicting mixture specs are rejected."""
    from facolos_data_pipelines_spark.pipelines import curate_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = curate_corpus(
        spark,
        docs,
        mix_col="lang",
        mix_temperature=0.5,
        curriculum_buckets=4,
    )
    m = {r["stage"]: (r["rows_in"], r["rows_out"]) for r in res.metrics.collect()}
    assert "mixture" in m and "curriculum" in m
    assert 0 < m["mixture"][1] <= m["mixture"][0]
    surv = res.survivors
    assert {"bucket", "order_key"} <= set(surv.columns)
    assert surv.count() == m["mixture"][1]
    buckets = {r["bucket"] for r in surv.select("bucket").distinct().collect()}
    assert buckets <= {0, 1, 2, 3} and len(buckets) >= 2

    with pytest.raises(ValueError, match="not both"):
        curate_corpus(
            spark, docs, mix_col="lang",
            mix_weights={"en": 1.0}, mix_temperature=0.5,
        )
    with pytest.raises(ValueError, match="half-specified|exactly one"):
        curate_corpus(spark, docs, mix_col="lang")


def test_curate_corpus_keep_best_survivor_policy(spark):
    """keep='best' (the default) keeps the HIGHEST-quality-score member
    of each near-dup cluster; keep='min_id' restores the lowest-id
    policy; the quality_score work column never leaks into survivors."""
    from facolos_data_pipelines_spark.pipelines import curate_corpus
    from facolos_data_pipelines_spark.operators.text import quality_score

    base = " ".join(
        "the quick brown fox jumps over a lazy dog while many people watch "
        "from the old stone bridge and children play near the quiet river "
        "as morning light slowly fills every corner of this small town with "
        "warm colors and the baker opens early to sell fresh bread".split()
    )
    rows = [
        # cluster: doc 1 is the min id; doc 2 appends distinct NEW
        # stopwords -> strictly higher length, diversity, and stopword
        # sub-scores, same shingles otherwise (Jaccard ~0.87, above the
        # 0.8 threshold)
        (1, base, "en"),
        (2, base + " in it is that for was on", "en"),
        # singletons
        (3, "completely different text about spacecraft navigation and "
            "orbital mechanics with its own vocabulary entirely", "en"),
        (4, "a second unrelated document describing deep sea creatures "
            "and the biology of hydrothermal vent ecosystems", "en"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    scores = {
        r["doc_id"]: r["quality_score"]
        for r in quality_score(docs).select("doc_id", "quality_score").collect()
    }
    assert scores[2] > scores[1]  # precondition for the policy check

    res_best = curate_corpus(spark, docs, quality_quantile=0.0)
    surv_best = {r["doc_id"] for r in res_best.survivors.select("doc_id").collect()}
    assert surv_best == {2, 3, 4}  # best-scoring member survives the cluster
    assert "quality_score" not in res_best.survivors.columns

    res_min = curate_corpus(spark, docs, quality_quantile=0.0, keep="min_id")
    surv_min = {r["doc_id"] for r in res_min.survivors.select("doc_id").collect()}
    assert surv_min == {1, 3, 4}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep="):
        curate_corpus(spark, docs, keep="bogus")


def test_curate_corpus_with_quality_model_backend(spark):
    """curate_corpus(quality_model=...) scores the quality stage with
    the distilled expression model instead of the heuristic: the
    bottom-quantile drop follows MODEL scores, and keep='best'
    survivor selection uses the model score too."""
    from facolos_data_pipelines_spark.operators.quality_model import (
        train_quality_classifier,
    )
    from facolos_data_pipelines_spark.pipelines.curation import curate_corpus

    prose = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "through the quiet field while the sun is high above the hills"
    )
    junk = "@@## $$%% 1234 !!! ### 999 *** ((( ))) 777 &&& ^^^ %%% 000"
    rows = (
        [(i, prose + f" take {i}") for i in range(10)]
        + [(100 + i, junk + f" {i}") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    labeled = docs.withColumn("label", (F.col("doc_id") < 100).cast("int"))
    model = train_quality_classifier(labeled, "label")

    res = curate_corpus(spark, docs, quality_quantile=0.5, dedup_threshold=0.99)
    surv = {r["doc_id"] for r in res.survivors.select("doc_id").collect()}
    # q=0.75: percentile_approx returns an actual observation, so the
    # threshold lands inside the prose score cluster (junk scores ~0
    # would survive a >= comparison against their own value at q=0.5)
    res_m = curate_corpus(
        spark, docs, quality_quantile=0.75, dedup_threshold=0.99,
        quality_model=model,
    )
    surv_m = {r["doc_id"] for r in res_m.survivors.select("doc_id").collect()}
    # the model backend keeps ONLY prose (perfectly separable); junk ids gone
    assert all(i < 100 for i in surv_m), surv_m
    assert len(surv_m) > 0
    # metrics frame still reports the stage under the same name
    stages = {r["stage"] for r in res_m.metrics.collect()}
    assert "quality_filter" in stages
    # both backends produce a survivors frame without the score column
    assert "quality_score" not in res_m.survivors.columns
    assert surv  # heuristic path still works alongside
