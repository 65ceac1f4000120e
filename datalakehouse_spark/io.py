"""Fixture / table loaders.

The driver fixtures live at /root/testdata/sf{0.001,0.01,0.1}/<name>.parquet
(TESTDATA.md).  Two generations of ``events.parquet`` exist:

- TIMESTAMP(NANOS) stored as int64 — Spark cannot read it natively
  ([PARQUET_TYPE_ILLEGAL]); with ``spark.sql.legacy.parquet.nanosAsLong``
  the physical int64 comes through as a plain long which we decode.
- TIMESTAMP(MICROS) (current testdata) — read directly as a timestamp.

All loads go through :func:`load_table` so every query in the registry
sees ONE canonical schema regardless of generation:

- ``events.ts``     -> TimestampType (µs precision, session TZ = UTC).
- ``events.ts_ns``  -> int64 epoch nanoseconds (kept for epoch math);
  ``unix_micros(ts) * 1000`` on the µs generation == DuckDB's
  ``epoch_ns(ts)`` on the same value, and equals the raw int64 of the
  ns generation truncated to µs — so oracle parity holds either way.

Everything else is read as-is; parquet ms-timestamps surface as
timestamp_ntz, which matches DuckDB's timezone-naive TIMESTAMP.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


_SHIPPED_SESSIONS: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make `datalakehouse_spark` importable on Python workers.

    The correctness driver runs with its own environment where the repo
    is only on the *driver's* sys.path; closures that reference this
    package (pandas_udf / mapInPandas operators) are pickled by module
    reference and would fail on the workers.  `addPyFile` distributes a
    zip of the package to every executor at runtime — works on a real
    cluster the same way it works in local mode.
    """
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # pid-suffixed: concurrent test/driver processes must not race on one file
    zpath = os.path.join(
        tempfile.gettempdir(), f"datalakehouse_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "datalakehouse_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED_SESSIONS.add(key)


def _ensure_session_contract(spark: SparkSession) -> None:
    """Runtime-settable confs the engine relies on, applied idempotently.

    The correctness driver hands us ITS session; these are SQL confs, so
    they can be set per-session without restarting the JVM.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ship_package(spark)


#: (session id, sf_dir, table) -> DataFrame.  DataFrames are immutable
#: lazy plans, so memoizing them is safe; it skips the repeated parquet
#: footer/schema read when a registry sweep loads the same fixture for
#: every query (meaningful when a time-budgeted driver runs 70+ queries).
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # applicationId (not id(spark)): a recycled object address must not
    # hand a DataFrame bound to a stopped session to a fresh one
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    _ensure_session_contract(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = _read_events(spark, path) if name == "events" else spark.read.parquet(path)
    _TABLE_CACHE[key] = df
    return df


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read events with the canonical (ts TIMESTAMP, ts_ns LONG) contract.

    For the µs generation we disable TIMESTAMP_NTZ inference *for this
    read only* so ``ts`` surfaces as a session-UTC TIMESTAMP — the same
    type the engine has always exposed — while remaining a PHYSICAL
    column: range predicates on ``ts`` still reach the parquet scan
    (row-group min/max skipping at 100 TB), which a derived/cast column
    would forfeit.  Schema inference happens eagerly inside
    ``spark.read.parquet``, so the conf flip is safely scoped.
    """
    ntz_key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    try:
        old = spark.conf.get(ntz_key)
    except Exception:
        old = None
    spark.conf.set(ntz_key, "false")
    try:
        df = spark.read.parquet(path)
    finally:
        if old is None:
            spark.conf.unset(ntz_key)
        else:
            spark.conf.set(ntz_key, old)
    if dict(df.dtypes).get("ts", "").startswith("timestamp"):
        # µs-physical generation: derive the ns epoch used by epoch math.
        return df.withColumn("ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000))
    # legacy ns-int64 generation (nanosAsLong): int64 ns -> µs-precision
    # timestamp; `div` floors on the positive epoch range, matching
    # DuckDB's ns->µs coercion.
    return df.withColumn("ts_ns", F.col("ts")).withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )


def table_bytes(sf_dir: str, name: str) -> int:
    """On-disk parquet size of a fixture table — a ZERO-JOB size probe
    for adaptive plan selection (the same signal Spark's own CBO/AQE
    thresholds key on: ``autoBroadcastJoinThreshold`` is bytes too).
    Sums part files when the table is a directory.  Returns 0 for a
    missing path (callers treat unknown as small)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register fixture tables as temp views for the SQL surface."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
