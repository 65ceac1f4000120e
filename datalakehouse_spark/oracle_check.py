"""Local replica of the driver's DuckDB-oracle correctness gate.

For each registry entry: run the Spark query and the oracle SQL on the
same parquet fixtures, then compare row count, column names, and an
order-insensitive value comparison (cells stringified with deterministic
float formatting, rows sorted).  Used by tests/test_oracle.py and for
interactive iteration; strictness matches or exceeds the driver (exact
value equality, no tolerance) so drift is caught before the real gate.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from dataclasses import dataclass, field

import duckdb

from datalakehouse_spark.io import TABLES


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr: bit-exact comparison
    if isinstance(v, (dt.datetime,)):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    try:  # numpy / pandas scalars
        import numpy as np

        if isinstance(v, np.floating):
            return _norm_cell(float(v))
        if isinstance(v, np.integer):
            return str(int(v))
    except ImportError:
        pass
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _norm_rows(columns, rows) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


@dataclass
class CompareResult:
    name: str
    row_match: bool
    schema_match: bool
    value_match: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""
    mismatches: list = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.row_match and self.schema_match and self.value_match


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def compare_query(spark, sf_dir: str, name: str, fn, sql: str) -> CompareResult:
    sdf = fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = sdf.collect()

    con = duckdb_connection(sf_dir)
    cur = con.execute(sql)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()
    con.close()

    res = CompareResult(
        name=name,
        row_match=len(spark_rows) == len(oracle_rows),
        schema_match=sorted(spark_cols) == sorted(oracle_cols),
        value_match=False,
        spark_rows=len(spark_rows),
        oracle_rows=len(oracle_rows),
    )
    if not res.schema_match:
        res.detail = f"columns spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
        return res
    s_norm = _norm_rows(spark_cols, [tuple(r) for r in spark_rows])
    o_norm = _norm_rows(oracle_cols, oracle_rows)
    res.value_match = s_norm == o_norm
    if not res.value_match:
        diff_s = [r for r in s_norm if r not in set(o_norm)][:5]
        diff_o = [r for r in o_norm if r not in set(s_norm)][:5]
        res.mismatches = [("spark_only", diff_s), ("oracle_only", diff_o)]
        res.detail = f"first spark-only={diff_s} oracle-only={diff_o}"
    return res


def run_all(spark, sf_dir: str, names=None) -> list[CompareResult]:
    from datalakehouse_spark.registry import REGISTRY, _load_extensions

    _load_extensions()
    results = []
    for name, spec in REGISTRY.items():
        if names and name not in names:
            continue
        if spec.sql is None:
            continue
        results.append(compare_query(spark, sf_dir, name, spec.fn, spec.sql))
    return results
