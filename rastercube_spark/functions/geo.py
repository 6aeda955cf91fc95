"""Coordinate transforms as Catalyst column expressions (F5).

Replaces the reference's GDAL/osr dependency (reference jgrid3.py:225-270,
gdal_utils.py:9-34) with pure column math — both SRS in scope have closed
forms:

- affine geotransform (pixel↔geo):  x_geo = g0 + x·g1 + y·g2,
  y_geo = g3 + x·g4 + y·g5   (GDAL convention, jgrid3.py:247-260)
- MODIS sinusoidal sphere (grids.py:147-159): x = R·λ·cos φ, y = R·φ with
  R = 6371007.181 m; inverse φ = y/R, λ = x/(R·cos φ).

Being plain expressions, they stay inside whole-stage codegen and are
usable in join keys and partition-prune predicates.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# MODIS sinusoidal sphere radius (reference worldgrid/grids.py:147-159 WKT)
MODIS_SPHERE_R = 6371007.181

# The MODIS worldgrid geotransform (reference grids.py:124-141): 36x18 tiles
# of 4800 px at ~231.656 m; origin at (-20015109.354, 10007554.677).
MODIS_GT = (
    -20015109.354,
    20015109.354 * 2 / (36 * 4800),
    0.0,
    10007554.677,
    0.0,
    -10007554.677 * 2 / (18 * 4800),
)


def affine_xy2geo(x: Column, y: Column, gt: tuple[float, ...]) -> tuple[Column, Column]:
    """Pixel (x, y) → geo units under GDAL geotransform ``gt``."""
    xg = F.lit(gt[0]) + x * F.lit(gt[1]) + y * F.lit(gt[2])
    yg = F.lit(gt[3]) + x * F.lit(gt[4]) + y * F.lit(gt[5])
    return xg, yg


def affine_geo2xy(xg: Column, yg: Column, gt: tuple[float, ...]) -> tuple[Column, Column]:
    """Geo → fractional pixel coords (inverse affine; assumes no rotation
    terms unless present, handled via the standard 2×2 inverse)."""
    det = gt[1] * gt[5] - gt[2] * gt[4]
    inv1, inv2 = gt[5] / det, -gt[2] / det
    inv4, inv5 = -gt[4] / det, gt[1] / det
    dx = xg - F.lit(gt[0])
    dy = yg - F.lit(gt[3])
    return dx * F.lit(inv1) + dy * F.lit(inv2), dx * F.lit(inv4) + dy * F.lit(inv5)


def sinu_fwd(lat_deg: Column, lng_deg: Column) -> tuple[Column, Column]:
    """WGS84-ish sphere lat/lng (deg) → sinusoidal meters."""
    lat = F.radians(lat_deg)
    lng = F.radians(lng_deg)
    return (
        F.lit(MODIS_SPHERE_R) * lng * F.cos(lat),
        F.lit(MODIS_SPHERE_R) * lat,
    )


def sinu_inv(xm: Column, ym: Column) -> tuple[Column, Column]:
    """Sinusoidal meters → lat/lng degrees."""
    lat = ym / F.lit(MODIS_SPHERE_R)
    lng = xm / (F.lit(MODIS_SPHERE_R) * F.cos(lat))
    return F.degrees(lat), F.degrees(lng)


def latlng_to_modis_xy(lat_deg: Column, lng_deg: Column, gt=MODIS_GT) -> tuple[Column, Column]:
    """lat/lng → MODIS worldgrid integer pixel coords (latlng2xy,
    reference jgrid3.py:262-270)."""
    xm, ym = sinu_fwd(lat_deg, lng_deg)
    xf, yf = affine_geo2xy(xm, ym, gt)
    return F.floor(xf).cast("long"), F.floor(yf).cast("long")


def modis_xy_to_latlng(x: Column, y: Column, gt=MODIS_GT) -> tuple[Column, Column]:
    """Pixel center → lat/lng (xy2latlng, reference jgrid3.py:247-260)."""
    xm, ym = affine_xy2geo(x + F.lit(0.5), y + F.lit(0.5), gt)
    return sinu_inv(xm, ym)
