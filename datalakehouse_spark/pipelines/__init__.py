from datalakehouse_spark.pipelines.risk_score import risk_score_daily  # noqa: F401
from datalakehouse_spark.pipelines.ingest import normalize_events  # noqa: F401
