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
    #: driver-faithful pandas canonicalization check (dtype kinds + sorted
    #: stringified values).  None = not run (e.g. schema mismatch short-circuit).
    pandas_match: bool | None = None

    @property
    def ok(self) -> bool:
        return (
            self.row_match
            and self.schema_match
            and self.value_match
            and self.pandas_match is not False
        )


def _pandas_canon(df):
    """Mimic the driver's canonicalization: sorted columns, sorted rows.

    Raises (like the driver) on unhashable cells such as list-valued
    columns — array outputs must be restructured to scalars.
    """
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _norm_pd_col(col):
    """Normalize engine-specific pandas materializations that the driver's
    hash treats as equal: Spark hands back DATE as object-of-``dt.date``
    while DuckDB hands back datetime64; both engines may surface DECIMAL
    as object-of-``Decimal``.  Logical dtype divergence (int vs float —
    the HUGEINT class) is deliberately NOT normalized."""
    import decimal

    import pandas as pd

    if col.dtype.kind == "M":
        return col.astype("datetime64[ns]")
    if col.dtype.kind == "O":
        sample = col.dropna()
        if len(sample):
            v = sample.iloc[0]
            if isinstance(v, (dt.date, dt.datetime)) and not isinstance(v, dt.datetime):
                return pd.to_datetime(col)
            if isinstance(v, dt.datetime):
                return pd.to_datetime(col).astype("datetime64[ns]")
            if isinstance(v, decimal.Decimal):
                # render with repr of float for cross-engine string parity
                return col.map(lambda x: float(x) if x is not None else None).astype("float64")
    return col


def _pandas_compare(spark_pd, oracle_pd) -> tuple[bool, str]:
    """Driver-faithful comparison of the two pandas frames.

    The driver materializes DuckDB results via ``.df()`` and Spark results
    via Arrow; dtype divergence (e.g. DuckDB HUGEINT -> float64 vs Spark
    int64) changes the hashed values even when the logical values agree.
    We therefore compare per-column dtype *kind* and the stringified
    canonical cells, which is at least as strict as the driver's hash.
    """
    try:
        # canon FIRST on the raw frames — the driver sorts before any
        # normalization, so an unsortable column (list cells) must crash
        # here exactly like it crashes the driver.
        s = _pandas_canon(spark_pd)
        o = _pandas_canon(oracle_pd)
    except TypeError as e:  # unhashable cell (list/array column)
        return False, f"canonicalization crash (driver would err): {e}"
    if list(s.columns) != list(o.columns):
        return False, f"pandas columns {list(s.columns)} != {list(o.columns)}"
    s = s.apply(_norm_pd_col)
    o = o.apply(_norm_pd_col)
    for c in s.columns:
        sk, ok_ = s[c].dtype.kind, o[c].dtype.kind
        # treat int/uint as one kind; everything else must agree exactly
        norm = lambda k: "i" if k in "iu" else k
        if norm(sk) != norm(ok_):
            return False, f"dtype kind mismatch on '{c}': spark={s[c].dtype} oracle={o[c].dtype}"
    s_str = s.astype(str).to_numpy().tolist()
    o_str = o.astype(str).to_numpy().tolist()
    if s_str != o_str:
        bad = next(
            (i for i, (a, b) in enumerate(zip(s_str, o_str)) if a != b), None
        )
        return False, f"pandas value mismatch at canon row {bad}"
    return True, ""


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
    spark_pd = sdf.toPandas()  # driver-faithful materialization (dtype check)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    cur = con.execute(sql)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()
    oracle_pd = con.execute(sql).df()
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
    s_norm = _norm_rows(spark_cols, spark_rows)
    o_norm = _norm_rows(oracle_cols, oracle_rows)
    res.value_match = s_norm == o_norm
    if not res.value_match:
        diff_s = [r for r in s_norm if r not in set(o_norm)][:5]
        diff_o = [r for r in o_norm if r not in set(s_norm)][:5]
        res.mismatches = [("spark_only", diff_s), ("oracle_only", diff_o)]
        res.detail = f"first spark-only={diff_s} oracle-only={diff_o}"
    res.pandas_match, pd_detail = _pandas_compare(spark_pd, oracle_pd)
    if not res.pandas_match and pd_detail:
        res.detail = (res.detail + "; " if res.detail else "") + pd_detail
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
        try:
            results.append(compare_query(spark, sf_dir, name, spec.fn, spec.sql))
        except Exception as exc:  # one broken entry must not kill the sweep
            broken = CompareResult(
                name=name,
                row_match=False,
                schema_match=False,
                value_match=False,
                spark_rows=-1,
                oracle_rows=-1,
            )
            broken.detail = f"entry raised: {type(exc).__name__}: {exc}"[:500]
            results.append(broken)
    return results
