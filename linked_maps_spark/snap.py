"""Snap-rounding front-end: arbitrary-coordinate WKT → the engine's grid.

The core algebra (``geometry.py``) is exact int64 set algebra over a fixed
grid, which buys bit-exact replay but only accepts grid-aligned input.  The
reference ingests real NAD83 shapefiles with arbitrary coordinates
(``/root/reference/segment.py:131-142``) and runs a 0.0015°-buffered PostGIS
algebra (``/root/reference/segment.py:60``, ``postgis_sqls.py:47-56``).  This
module closes the gap with classic **snap-rounding** (pure numpy, no GEOS):

* vertices quantize to a configurable pitch (default 0.002°, on the order of
  the reference's buffer) after an origin shift that maps the lng/lat domain
  into the engine's non-negative grid window;
* line segments rasterize to 8-connected unit-step chains (DDA: the dominant
  axis advances one cell per step, the minor axis by ``rint`` — every step is
  axis-aligned or 45°, exactly the engine's edge alphabet);
* polygon rings scan-fill to unit cells by even-odd crossing parity — holes
  (which the strict parser rejects) subtract here, matching PostGIS
  semantics on the snapped domain.

Equivalence contract (documented tolerance, not bit-parity with PostGIS):
every snapped vertex moves ≤ pitch/√2̄·½ ≈ 0.71·pitch/2 from its source, and
two features interact in the snapped algebra iff they share unit edges/cells
— the grid analog of the reference's "within 2×buffer" overlap.  Finer pitch
→ closer to the buffered continuum, at 1/pitch² cell cost.

The engine-grid WKT this module emits expresses coordinates in **grid
units × engine PITCH** (a fixed-point scaling of true degrees:
``true = origin + grid_value / PITCH * pitch``); ``unsnap_wkt`` maps back.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from . import geometry as G

DEFAULT_PITCH = 0.002  # degrees — same order as the reference's 0.0015° buffer
# The grid window is G._P (=16384) cells per axis → pitch × 16384 degrees
# (32.77° at the default pitch).  ``origin`` is a DATASET-level choice that
# places the window: it must be identical for every feature that will be
# compared (ids are origin-relative).  The default covers the reference's
# California rasters (data/railroads/ca, NAD83 lng/lat); continental-scale
# corpora shard by region tile or raise the pitch.
DEFAULT_ORIGIN = (-125.0, 32.0)

_NUM_RE = re.compile(r"[-+0-9.eE]+")


_split_groups = G.split_groups


def _coords(ring: str) -> np.ndarray:
    vals = np.asarray(_NUM_RE.findall(ring), dtype=np.float64)
    if vals.size % 2:
        raise G.GeometryError(f"odd coordinate count in {ring[:40]!r}")
    return np.stack([vals[0::2], vals[1::2]], axis=1)


def _quantize(arr: np.ndarray, pitch: float, origin: tuple[float, float]) -> np.ndarray:
    q = np.rint((arr - np.asarray(origin)) / pitch).astype(np.int64)
    if q.size and (q.min() < 0 or q.max() >= G._P):
        raise G.GeometryError(
            f"snapped coordinate outside the {G._P}-cell grid window "
            f"(pitch={pitch}, origin={origin})"
        )
    return q


def _raster_line(arr: np.ndarray) -> np.ndarray:
    """Snapped int vertices → unit-edge ids along an 8-connected DDA chain."""
    ids: list[np.ndarray] = []
    for (x0, y0), (x1, y1) in zip(arr[:-1], arr[1:]):
        n = int(max(abs(x1 - x0), abs(y1 - y0)))
        if n == 0:
            continue  # both endpoints snapped to the same cell
        t = np.arange(n + 1, dtype=np.float64)
        xs = (x0 + np.rint(t * (x1 - x0) / n)).astype(np.int64)
        ys = (y0 + np.rint(t * (y1 - y0) / n)).astype(np.int64)
        p = G._pid(xs[:-1], ys[:-1])
        q = G._pid(xs[1:], ys[1:])
        ids.append(np.minimum(p, q) * G._E + np.maximum(p, q))
    return np.unique(np.concatenate(ids)) if ids else np.empty(0, np.int64)


def _fill_polygon(rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd scan fill over cell centers; rings[0] outer, rest holes
    (even-odd parity makes holes subtract without classifying them)."""
    allv = np.concatenate(rings)
    x_lo, x_hi = int(allv[:, 0].min()), int(allv[:, 0].max())
    y_lo, y_hi = int(allv[:, 1].min()), int(allv[:, 1].max())
    if x_hi <= x_lo or y_hi <= y_lo:
        return np.empty(0, np.int64)
    gx, gy = np.meshgrid(
        np.arange(x_lo, x_hi, dtype=np.int64), np.arange(y_lo, y_hi, dtype=np.int64)
    )
    cx = gx.ravel().astype(np.float64) + 0.5
    cy = gy.ravel().astype(np.float64) + 0.5
    inside = np.zeros(cx.shape, dtype=bool)
    for ring in rings:
        r = ring.astype(np.float64)
        if len(r) >= 2 and (r[0] == r[-1]).all():
            r = r[:-1]
        if len(r) < 3:
            continue
        x0, y0 = r[:, 0], r[:, 1]
        x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
        for ex0, ey0, ex1, ey1 in zip(x0, y0, x1, y1):
            if ey0 == ey1:
                continue
            crosses = ((ey0 <= cy) != (ey1 <= cy)) & (
                cx < ex0 + (cy - ey0) * (ex1 - ex0) / (ey1 - ey0)
            )
            inside ^= crosses
    return np.sort(G._pid(gx.ravel()[inside], gy.ravel()[inside]))


def snap_wkt(
    wkt: str,
    geom_type: str = G.LINE,
    pitch: float = DEFAULT_PITCH,
    origin: tuple[float, float] = DEFAULT_ORIGIN,
) -> str:
    """Arbitrary-coordinate WKT → canonical engine-grid WKT.

    Empty/blank input stays a tombstone ('').  A geometry that collapses
    entirely under snapping returns the canonical EMPTY form."""
    wkt = (wkt or "").strip()
    if not wkt:
        return ""
    if wkt.upper().endswith("EMPTY"):
        return f"{geom_type} EMPTY"
    head, _, rest = wkt.partition("(")
    head = head.strip().upper()
    body = "(" + rest  # the full parenthesized payload
    outer = _split_groups(body)
    if len(outer) != 1:
        raise G.GeometryError("malformed WKT body")
    if geom_type == G.LINE:
        if head == "MULTILINESTRING":
            lines = _split_groups(outer[0])  # depth-2 groups = linestrings
        elif head == "LINESTRING":
            lines = outer  # the single coordinate list
        else:
            raise G.GeometryError(f"expected (MULTI)LINESTRING, got {head}")
        ids = G.union_all(
            [_raster_line(_quantize(_coords(ln), pitch, origin)) for ln in lines]
        )
    elif geom_type == G.POLYGON:
        if head == "MULTIPOLYGON":
            polys = _split_groups(outer[0])  # depth-2 groups = polygons
        elif head == "POLYGON":
            polys = outer  # ring list of the single polygon
        else:
            raise G.GeometryError(f"expected (MULTI)POLYGON, got {head}")
        cell_parts = []
        for poly in polys:
            rings = [
                _quantize(_coords(r), pitch, origin) for r in _split_groups(poly)
            ]
            if not rings:
                raise G.GeometryError("polygon with no rings")
            cell_parts.append(_fill_polygon(rings))
        ids = G.union_all(cell_parts)
    else:
        raise G.GeometryError(f"unknown geometry type {geom_type}")
    return G.to_wkt(ids, geom_type)


def unsnap_point(gx: float, gy: float, pitch: float = DEFAULT_PITCH,
                 origin: tuple[float, float] = DEFAULT_ORIGIN) -> tuple[float, float]:
    """Engine-grid WKT coordinate → true degrees (inverse of the fixed-point
    scaling: engine values are grid_index × PITCH)."""
    return (origin[0] + gx / G.PITCH * pitch, origin[1] + gy / G.PITCH * pitch)


def snap_change_log(
    df,
    geom_type: str = G.LINE,
    pitch: float = DEFAULT_PITCH,
    origin: tuple[float, float] = DEFAULT_ORIGIN,
):
    """Spark transform: snap a WAL's ``content`` column (arbitrary WKT) to
    engine-grid WKT — the ingest adapter for reference-shaped (NAD83) data.
    Runs as an Arrow-batched pandas UDF; tombstones ('') pass through."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def snap_col(s: pd.Series) -> pd.Series:
        return s.map(lambda w: snap_wkt(w, geom_type, pitch, origin))

    return df.withColumn("content", snap_col(F.col("content")))
