"""Edge behavior of the drift monitors (ADVICE r8 medium).

A source present on only ONE side of the historical/new-batch split —
a brand-new source or a vanished one, exactly the drift the monitor
exists to flag — makes the PSI/KS denominators zero.  Under Spark 4's
default ANSI mode a bare division would throw DIVIDE_BY_ZERO and crash
the whole monitor run; the contract is instead: the row still appears,
``n_hist``/``n_batch`` expose which side is empty, and ``psi``/``ks_d``
are NULL (drift undefined without a two-sided histogram).  The DuckDB
oracle SQL encodes the same CASE.
"""

import os

import duckdb
import pytest

from datalakehouse_spark.registry import REGISTRY, _load_extensions

_load_extensions()


@pytest.fixture(scope="module")
def one_sided_dir(spark, tmp_path_factory):
    """A documents fixture where source 'newsrc' exists ONLY in the new
    batch (every doc_id has floor(doc_id/20) % 4 == 3) and 'gonesrc'
    ONLY in history, alongside a two-sided 'web' source."""
    rows = []
    # two-sided: doc_ids 0..159 -> both hist (%4!=3) and batch (%4==3)
    for i in range(160):
        rows.append((i, "x " * 10, "en", "web", 40 + (i % 30) * 50))
    # one-sided sources: pick ids by the split predicate itself
    batch_ids = [i for i in range(2000, 4000) if (i // 20) % 4 == 3][:30]
    hist_ids = [i for i in range(2000, 4000) if (i // 20) % 4 != 3][:30]
    for i in batch_ids:
        rows.append((i, "y " * 5, "en", "newsrc", 100 + (i % 10) * 30))
    for i in hist_ids:
        rows.append((i, "z " * 5, "en", "gonesrc", 200 + (i % 10) * 20))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path_factory.mktemp("one_sided_sf")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_one_sided_source_yields_null_drift_not_divide_by_zero(spark, one_sided_dir):
    out = {
        r["source"]: r.asDict()
        for r in REGISTRY["ingest_drift_psi"].fn(spark, one_sided_dir).collect()
    }
    assert set(out) == {"web", "newsrc", "gonesrc"}
    # two-sided source: real numbers
    assert out["web"]["psi"] is not None and out["web"]["ks_d"] is not None
    # batch-only: n_hist == 0, drift undefined -> NULL, no ANSI crash
    assert out["newsrc"]["n_hist"] == 0 and out["newsrc"]["n_batch"] > 0
    assert out["newsrc"]["psi"] is None and out["newsrc"]["ks_d"] is None
    # hist-only: symmetric
    assert out["gonesrc"]["n_batch"] == 0 and out["gonesrc"]["n_hist"] > 0
    assert out["gonesrc"]["psi"] is None and out["gonesrc"]["ks_d"] is None


def test_oracle_sql_mirrors_null_semantics(spark, one_sided_dir):
    con = duckdb.connect()
    glob = os.path.join(one_sided_dir, "documents.parquet", "*.parquet")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{glob}')"
    )
    rows = con.execute(REGISTRY["ingest_drift_psi"].sql).fetchall()
    by_src = {r[0]: r for r in rows}
    assert by_src["newsrc"][3] is None and by_src["newsrc"][4] is None
    assert by_src["gonesrc"][3] is None and by_src["gonesrc"][4] is None
    assert by_src["web"][3] is not None and by_src["web"][4] is not None
    # and the two engines agree on the one-sided rows end-to-end
    spark_rows = {
        r["source"]: (r["n_hist"], r["n_batch"], r["psi"], r["ks_d"])
        for r in REGISTRY["ingest_drift_psi"].fn(spark, one_sided_dir).collect()
    }
    for src, r in by_src.items():
        assert spark_rows[src] == (r[1], r[2], r[3], r[4])
