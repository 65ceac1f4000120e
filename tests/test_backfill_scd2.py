"""Backfill orchestration (S7/A5 resilience), SCD2, format round-trips,
null robustness."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datalakehouse_spark.io import load_table
from datalakehouse_spark.pipelines.backfill import run_backfill
from datalakehouse_spark.pipelines.ingest import normalize_events
from datalakehouse_spark.operators.relational import scd2_apply
from datalakehouse_spark.tables import ManagedTable

SF = "/root/testdata/sf0.001"


def test_backfill_error_isolation(spark, tmp_path):
    events = load_table(spark, SF, "events")
    chunks = [["0", "1"], ["boom"], ["2", "3"]]

    def read_chunk(ids):
        if ids == ["boom"]:
            raise RuntimeError("db connection reset")  # chunk-level failure
        return events.where(F.col("user_id").cast("string").isin(list(ids)))

    table = ManagedTable(spark, str(tmp_path / "bf"))
    report = run_backfill(chunks, read_chunk, normalize_events, table)
    assert report.chunks_ok == 2
    assert report.chunks_failed == 1
    assert report.failed_chunks == [1]
    # surviving chunks landed; running total matches table contents (A5)
    assert table.read().count() == report.rows_appended > 0


def test_scd2_apply(spark):
    dim_rows = [
        ("d1", "addr_v1", dt.datetime(2024, 1, 1), None, True),
        ("d1", "addr_v0", dt.datetime(2023, 1, 1), dt.datetime(2024, 1, 1), False),
        ("d2", "addr_a", dt.datetime(2024, 1, 1), None, True),
    ]
    schema = "k string, attr string, valid_from timestamp, valid_to timestamp, is_current boolean"
    dim = spark.createDataFrame(dim_rows, schema)
    updates = spark.createDataFrame(
        [("d1", "addr_v2", dt.datetime(2024, 6, 1), None, True)], schema
    ).select("k", "attr", "valid_from", "valid_to", "is_current")

    out = scd2_apply(dim, updates, key="k", ts_col="valid_from")
    rows = {(r.k, r.attr): r for r in out.collect()}
    assert len(rows) == 4
    # old current closed out at the update's timestamp
    closed = rows[("d1", "addr_v1")]
    assert closed.is_current is False and closed.valid_to == dt.datetime(2024, 6, 1)
    # new version is current and open-ended
    fresh = rows[("d1", "addr_v2")]
    assert fresh.is_current is True and fresh.valid_to is None
    # untouched key stays current; history preserved
    assert rows[("d2", "addr_a")].is_current is True
    assert rows[("d1", "addr_v0")].is_current is False
    # idempotence-shaped rerun: applying the same update again keeps one current row
    out2 = scd2_apply(out, updates, key="k", ts_col="valid_from")
    current_d1 = [r for r in out2.collect() if r.k == "d1" and r.is_current]
    assert len(current_d1) == 1 and current_d1[0].attr == "addr_v2"


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_format_roundtrip(spark, tmp_path, fmt):
    """Source/sink completeness: the fact shape survives orc/json/csv."""
    fact = normalize_events(load_table(spark, SF, "events")).limit(200)
    path = str(tmp_path / fmt)
    w = fact.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", True)
    getattr(w, fmt)(path)
    r = spark.read
    if fmt == "csv":
        r = r.option("header", True).schema(fact.schema)
    elif fmt == "json":
        r = r.schema(fact.schema)
    back = getattr(r, fmt)(path)
    assert back.count() == 200
    assert sorted(back.columns) == sorted(fact.columns)


def test_null_robustness_text_ops(spark):
    from datalakehouse_spark.operators.dedup import minhash_signatures_df, simhash_df
    from datalakehouse_spark.operators.textstats import quality_score

    docs = spark.createDataFrame(
        [(1, "hello world foo bar baz"), (2, None), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    # no crashes; null-text docs drop, empty strings hash consistently
    mh = minhash_signatures_df(docs)
    assert {r.doc_id for r in mh.collect()} == {1, 3, 4}
    assert all(r.mh0 is not None for r in mh.collect())
    sh = simhash_df(docs)
    assert {r.doc_id for r in sh.collect()} == {1, 3, 4}
    qs = quality_score(docs).collect()
    assert len(qs) == 4  # row-wise features keep nulls as nulls


def test_null_robustness_embeddings(spark):
    from datalakehouse_spark.operators.similarity import knn_brute_force

    emb = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [0.5] * 64), (2, None)],
        "vec_id long, embedding array<double>",
    )
    out = knn_brute_force(emb, [1.0] * 64, k=3)
    rows = out.collect()
    # null vector yields null similarity, ranks last or drops — no crash
    top = rows[0]
    assert top.vec_id in (0, 1) and top.cosine_sim == pytest.approx(1.0)
