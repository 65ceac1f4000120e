from datalakehouse_spark.operators.relational import (  # noqa: F401
    latest_per_key,
    latest_per_key_maxby,
    top_k,
    top_k_per_group,
    asof_join,
    range_join,
    union_by_name,
)
