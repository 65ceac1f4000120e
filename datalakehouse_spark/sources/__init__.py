from datalakehouse_spark.sources.jdbc import (  # noqa: F401
    jdbc_pushdown_reader,
    backfill_chunks,
)
