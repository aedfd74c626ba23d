"""Geospatial helpers for the state-vector domain (SURVEY T2.14).

Built-in trig only — stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (lat, lon) points in degrees.

    Squares written as products (not POWER(x, 2)) so an independent SQL
    engine evaluating the same formula lands on the same doubles.
    """
    sdlat = F.sin(F.radians(lat2 - lat1) / 2)
    sdlon = F.sin(F.radians(lon2 - lon1) / 2)
    a = (
        sdlat * sdlat
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * sdlon * sdlon
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))
