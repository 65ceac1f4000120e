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


def haversine_km(
    lat: Column, lon: Column, plat: Column, plon: Column, radius_km: float = 6371.0
) -> Column:
    """Great-circle distance between two fixes, in km (pure JVM
    expressions, whole-stage-codegen'd).  Cross-engine note: libm and
    JVM trig differ in final ulps, so aggregate consumers round their
    outputs (trip_distance_daily / speeding_segments round at 6
    decimals, ~5 orders above the divergence)."""
    dphi = F.radians(lat - plat) / 2
    dlmb = F.radians(lon - plon) / 2
    return (
        2
        * radius_km
        * F.asin(
            F.sqrt(
                F.sin(dphi) * F.sin(dphi)
                + F.cos(F.radians(plat)) * F.cos(F.radians(lat)) * F.sin(dlmb) * F.sin(dlmb)
            )
        )
    )
