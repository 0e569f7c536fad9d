"""write_table's catalog branch (sources/io.py): the production sink is
``df.writeTo(table).append()`` (Iceberg atomic append — north_rule). No
Iceberg runtime ships in this container, but Spark bundles the JDBC V2
table catalog and the embedded Derby driver, so the branch is exercised
end-to-end against a REAL DataSourceV2 catalog (same writeTo/append code
path an Iceberg catalog resolves) instead of sitting dead behind the
format gate."""

from __future__ import annotations

import pytest

from deepseek_ocr_api_rs_spark.sources.io import iceberg_available, write_table

CAT = "v2test"


@pytest.fixture(scope="module")
def v2_catalog(spark):
    spark.conf.set(
        f"spark.sql.catalog.{CAT}",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
    )
    spark.conf.set(
        f"spark.sql.catalog.{CAT}.url", "jdbc:derby:memory:v2testdb;create=true"
    )
    spark.conf.set(
        f"spark.sql.catalog.{CAT}.driver",
        "org.apache.derby.iapi.jdbc.AutoloadedDriver",
    )
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CAT}.ns")
    yield CAT
    spark.conf.unset(f"spark.sql.catalog.{CAT}")


def test_write_table_appends_via_writeto_v2(spark, v2_catalog):
    name = f"{v2_catalog}.ns.writeto_branch"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    df.writeTo(name).create()
    write_table(df, name)  # no '/' and no .parquet → writeTo().append() branch
    assert spark.table(name).count() == 4
    write_table(df, name)  # append semantics, not overwrite
    assert spark.table(name).count() == 6
    assert sorted(r.text for r in spark.table(name).collect()) == list("aaabbb")


def test_write_table_path_branch(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    out = str(tmp_path / "out.parquet")
    write_table(df, out)
    assert spark.read.parquet(out).count() == 1
    write_table(df, out, mode="overwrite")  # path branch honors mode
    assert spark.read.parquet(out).count() == 1


def test_iceberg_available_tracks_catalog_conf(spark):
    assert iceberg_available(spark) is False
    spark.conf.set("spark.sql.catalog.spark_catalog", "some.Catalog")
    try:
        assert iceberg_available(spark) is True
    finally:
        spark.conf.unset("spark.sql.catalog.spark_catalog")
