from datalakehouse_spark.functions.hashing import (  # noqa: F401
    java_hashcode,
    java_hashcode_py,
    java_hashcode_pandas,
    device_bucket,
)
from datalakehouse_spark.functions.temporal import (  # noqa: F401
    epoch_seconds_to_ts,
    epoch_string_to_ts,
    local_date,
    local_hour,
)
from datalakehouse_spark.functions.scoring import (  # noqa: F401
    logistic_score,
    risk_level,
    clamp,
)
from datalakehouse_spark.functions.geo import parse_coordinates  # noqa: F401
from datalakehouse_spark.functions.numeric import dsum, davg  # noqa: F401
