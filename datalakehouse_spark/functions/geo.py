"""Coordinate-string parsing (SURVEY.md §2.8 F15-F16).

The reference backfill reads a Postgres point column serialized as
``"(lon,lat)"`` and extracts components with regexp_replace + split —
note the swap: item 1 -> latitude, item 0 -> longitude
(reference: config/spark/backfill_telematics.py:117,127-128).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_coordinates(col: Column | str) -> tuple[Column, Column]:
    """``"(lon,lat)"`` -> (latitude, longitude) DoubleType columns."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"[()]", "")
    parts = F.split(stripped, ",")
    latitude = parts.getItem(1).cast("double")
    longitude = parts.getItem(0).cast("double")
    return latitude, longitude
