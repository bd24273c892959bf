"""Catalog bootstrap (S13): namespaces + staging-table registration."""

from facolos_data_pipelines_spark.catalog.bootstrap import bootstrap_catalog
from facolos_data_pipelines_spark.catalog.schemas import STAGING_TABLES


def test_bootstrap_idempotent_and_queryable(spark, tmp_path):
    stmts = bootstrap_catalog(spark, staging_root=str(tmp_path / "staging"))
    assert any("CREATE DATABASE" in s for s in stmts)
    dbs = {d.name for d in spark.catalog.listDatabases()}
    assert {"staging", "data_mart", "etl_control"}.issubset(dbs)

    for name, schema in STAGING_TABLES.items():
        tbl = spark.table(f"staging.{name}")
        assert tbl.schema.fieldNames() == schema.fieldNames()
        assert tbl.count() == 0  # empty but queryable via spark.sql
    assert spark.sql("SELECT COUNT(*) AS n FROM staging.misa_customers").collect()[0]["n"] == 0

    # second run tolerates already-exists (the reference's GO-batch rule)
    stmts2 = bootstrap_catalog(spark, staging_root=str(tmp_path / "staging"))
    assert all("exists" in s or "CREATE DATABASE" in s for s in stmts2)

    for name in STAGING_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS staging.{name}")
