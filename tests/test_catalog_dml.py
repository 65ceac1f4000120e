"""Catalog-native DML dispatch (SURVEY.md §2.10 catalog backend):
statement builders emit the exact Iceberg/Delta SQL, ManagedTable
auto-detects a configured catalog and routes DML through it, and
ANALYZE feeds the session CBO real statistics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datalakehouse_spark.catalog_dml import (
    DELTA,
    ICEBERG,
    CatalogDML,
    analyze_sql,
    compact_sql,
    delete_where_sql,
    detect_catalog_dialect,
    merge_upsert_sql,
    vacuum_sql,
)
from datalakehouse_spark.tables import ManagedTable


def test_merge_upsert_sql_text():
    assert merge_upsert_sql("nessie.db.risk", "src", ["device_id", "report_date"]) == (
        "MERGE INTO nessie.db.risk t USING src s "
        "ON t.device_id = s.device_id AND t.report_date = s.report_date "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_delete_where_sql_text():
    assert delete_where_sql("nessie.db.raw", "gps_epoch < 123") == (
        "DELETE FROM nessie.db.raw WHERE gps_epoch < 123"
    )


def test_compact_sql_dialects():
    assert compact_sql("nessie.db.t", ICEBERG, 256 * 1024 * 1024) == (
        "CALL nessie.system.rewrite_data_files(table => 'db.t', "
        "options => map('target-file-size-bytes', '268435456'))"
    )
    assert compact_sql("delta_cat.db.t", DELTA) == "OPTIMIZE delta_cat.db.t"


def test_vacuum_sql_dialects():
    stmts = vacuum_sql("nessie.db.t", ICEBERG, retain_hours=168)
    assert stmts[0].startswith("CALL nessie.system.expire_snapshots(table => 'db.t'")
    assert stmts[1] == "CALL nessie.system.remove_orphan_files(table => 'db.t')"
    assert vacuum_sql("d.db.t", DELTA) == ["VACUUM d.db.t RETAIN 168 HOURS"]


def test_analyze_sql_text():
    assert analyze_sql("c.db.t") == "ANALYZE TABLE c.db.t COMPUTE STATISTICS"
    assert analyze_sql("c.db.t", ["a", "b"]) == (
        "ANALYZE TABLE c.db.t COMPUTE STATISTICS FOR COLUMNS a, b"
    )


def test_detect_catalog_dialect(spark):
    spark.conf.set(
        "spark.sql.catalog.nessie_test", "org.apache.iceberg.spark.SparkCatalog"
    )
    try:
        assert detect_catalog_dialect(spark, "nessie_test.db.t") == ICEBERG
        assert detect_catalog_dialect(spark, "unconfigured_cat.db.t") is None
    finally:
        spark.conf.unset("spark.sql.catalog.nessie_test")


def test_managed_table_routes_dml_through_catalog(spark, tmp_path):
    """With a configured catalog, ManagedTable DML emits single SQL
    statements instead of parquet rewrites (executor stubbed: no
    Iceberg jar ships in this container)."""
    spark.conf.set(
        "spark.sql.catalog.nessie_test", "org.apache.iceberg.spark.SparkCatalog"
    )
    try:
        t = ManagedTable(
            spark,
            str(tmp_path / "unused"),
            partition_by=["report_date"],
            catalog_table="nessie_test.db.risk",
        )
        assert t._catalog is not None
        ran: list[str] = []
        t._catalog.run = lambda sql: ran.append(sql)

        src = spark.createDataFrame(
            [("dev0", dt.date(2024, 1, 1), 1.0)],
            "device_id string, report_date date, score double",
        )
        t.merge_upsert(src, keys=["device_id", "report_date"])
        t.delete_where("report_date < DATE '2024-01-01'")
        t.compact()
        t.vacuum()
        t.analyze()
        assert [s.split()[0] for s in ran] == ["MERGE", "DELETE", "CALL", "CALL", "CALL", "ANALYZE"]
        assert "MERGE INTO nessie_test.db.risk" in ran[0]
        assert ran[1] == (
            "DELETE FROM nessie_test.db.risk WHERE report_date < DATE '2024-01-01'"
        )
        assert "rewrite_data_files" in ran[2]
        assert "expire_snapshots" in ran[3] and "remove_orphan_files" in ran[4]
        assert ran[5] == "ANALYZE TABLE nessie_test.db.risk COMPUTE STATISTICS"
    finally:
        spark.conf.unset("spark.sql.catalog.nessie_test")


def test_managed_table_without_catalog_uses_parquet_backend(spark, tmp_path):
    t = ManagedTable(
        spark,
        str(tmp_path / "p"),
        partition_by=["report_date"],
        catalog_table="unconfigured_cat.db.t",
    )
    assert t._catalog is None  # falls back to the parquet backend


def test_parquet_analyze_feeds_cbo(spark, tmp_path):
    """ANALYZE via a registered session-catalog table: the CBO must see
    a real rowCount for plans over that table name (M5 full credit)."""
    t = ManagedTable(spark, str(tmp_path / "stats"))
    t.create(
        spark.range(1000).select(
            F.col("id"), (F.col("id") % 7).alias("grp")
        )
    )
    name = "analyze_cbo_test"
    try:
        t.analyze(register_as=name)
        detail = spark.sql(f"DESC EXTENDED {name}").collect()
        stats_row = [r for r in detail if r.col_name == "Statistics"]
        assert stats_row and "1000 rows" in stats_row[0].data_type
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
