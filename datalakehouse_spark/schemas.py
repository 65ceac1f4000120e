"""Declared schemas — the reference's table catalog as Spark StructTypes.

Every table and Kafka source in the reference has explicit DDL
(SURVEY.md §1.1: schema system is fixed/declared); these StructTypes are
the rebuild's equivalent contract.  Cites: create.sql:21-70 (fact),
124-145 (risk), 148-170/206-228/264-286 (raw), 322-339/373-390/424-441
(dlq), 72-121 (wire).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: telematics_real_time (create.sql:21-49); partition: (device_id_bucket,
#: received_day); write order (device_id, gps_epoch)
TELEMATICS_REAL_TIME = T.StructType(
    [
        T.StructField("report_type", T.StringType()),
        T.StructField("tenant", T.StringType()),
        T.StructField("provider", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("firmware", T.StringType()),
        T.StructField("device_id", T.StringType()),
        T.StructField("alert_type", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("gps_fixed", T.BooleanType()),
        T.StructField("gps_epoch", T.TimestampType()),
        T.StructField("satellites", T.LongType()),
        T.StructField("speed_kmh", T.DoubleType()),
        T.StructField("heading", T.StringType()),
        T.StructField("odometer_meters", T.LongType()),
        T.StructField("engine_on", T.BooleanType()),
        T.StructField("vehicle_battery_voltage", T.DoubleType()),
        T.StructField("backup_battery_voltage", T.DoubleType()),
        T.StructField("received_epoch", T.TimestampType()),
        T.StructField("decoded_epoch", T.TimestampType()),
        T.StructField("correlation_id", T.StringType()),
        T.StructField("device_id_bucket", T.IntegerType()),
        T.StructField("received_day", T.DateType()),
    ]
)

#: Kafka wire shape (create.sql:72-93): derived columns absent; the
#: three epochs and speed arrive as STRING (epoch-seconds / numerals)
#: and are cast by the ingest transform (sink_telematics_real_time.sql:26-41).
_WIRE_STRING_COLS = {"gps_epoch", "received_epoch", "decoded_epoch", "speed_kmh"}
TELEMATICS_WIRE = T.StructType(
    [
        T.StructField(f.name, T.StringType() if f.name in _WIRE_STRING_COLS else f.dataType)
        for f in TELEMATICS_REAL_TIME.fields
        if f.name not in ("device_id_bucket", "received_day")
    ]
)

#: risk_score_daily (create.sql:124-133); PK (device_id, report_date)
#: not enforced; partition report_date
RISK_SCORE_DAILY = T.StructType(
    [
        T.StructField("device_id", T.StringType()),
        T.StructField("report_date", T.DateType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("level", T.StringType()),
        T.StructField("total_reports", T.LongType()),
        T.StructField("overspeed_reports", T.LongType()),
        T.StructField("night_reports", T.LongType()),
    ]
)

#: telematics_{vendor}_raw (create.sql:148-153); partition created_day
VENDOR_RAW = T.StructType(
    [
        T.StructField("device_id", T.StringType()),
        T.StructField("raw_report", T.StringType()),
        T.StructField("correlation_id", T.StringType()),
        T.StructField("created_at", T.TimestampType(), nullable=False),
        T.StructField("created_day", T.DateType()),
    ]
)

#: telematics_{vendor}_raw_dlq (create.sql:322-326): raw minus ids
VENDOR_RAW_DLQ = T.StructType(
    [f for f in VENDOR_RAW.fields if f.name not in ("device_id", "correlation_id")]
)

VENDORS = ("maxtrack", "queclink", "suntech")

#: Extension tables (FIXTURES.md §A)
EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

#: Multimodal extension: opaque binary payload + typed metadata
#: (BASELINE.json north_star; decode libs stubbed in this container)
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)
