"""Minimal pure-numpy ESRI shapefile reader (S2) — the reference-data source.

The reference reads editions with OGR (``/root/reference/segment.py:131-142``,
geometry only — DBF attributes ignored) and dissolves each edition's features
into one multi-geometry (A1, ``postgis_sqls.py:119-128``).  No OGR/GDAL ships
in this runtime, and the ESRI shapefile main-file format is a small public
spec (100-byte header; per-record: big-endian record header, little-endian
shape payload), so this module reads PolyLine (type 3) and Polygon (type 5)
records directly with numpy — enough to ingest the reference's own bundled
``data/railroads`` / ``data/wetlands`` editions through the snap-rounding
front-end.

Scale note: editions are file-sized boundary inputs here and parse on the
driver; a bulk deployment reads the same bytes distributed via
``spark.read.format("binaryFile")`` + ``mapInPandas`` over this parser —
the parser is already a pure bytes→arrays function.
"""

from __future__ import annotations

import os
import struct

import numpy as np

SHP_POLYLINE = 3
SHP_POLYGON = 5


def read_shp(path: str) -> tuple[int, list[list[np.ndarray]]]:
    """Read a .shp main file → (shape_type, features), each feature a list
    of its parts as (n, 2) float64 arrays (x=lng, y=lat)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if struct.unpack(">i", buf[0:4])[0] != 9994:
        raise ValueError(f"{path}: not a shapefile (bad magic)")
    file_len = struct.unpack(">i", buf[24:28])[0] * 2  # 16-bit words → bytes
    shape_type = struct.unpack("<i", buf[32:36])[0]
    if shape_type not in (SHP_POLYLINE, SHP_POLYGON):
        raise ValueError(f"{path}: unsupported shape type {shape_type}")
    features: list[list[np.ndarray]] = []
    off = 100
    while off < min(file_len, len(buf)):
        content_len = struct.unpack(">i", buf[off + 4 : off + 8])[0] * 2
        rec = buf[off + 8 : off + 8 + content_len]
        off += 8 + content_len
        rtype = struct.unpack("<i", rec[0:4])[0]
        if rtype == 0:  # null shape
            continue
        if rtype != shape_type:
            raise ValueError(f"{path}: record type {rtype} != header {shape_type}")
        n_parts = struct.unpack("<i", rec[36:40])[0]
        n_points = struct.unpack("<i", rec[40:44])[0]
        parts_idx = np.frombuffer(rec, dtype="<i4", count=n_parts, offset=44)
        pts = np.frombuffer(
            rec, dtype="<f8", count=n_points * 2, offset=44 + 4 * n_parts
        ).reshape(n_points, 2)
        bounds = np.append(parts_idx, n_points)
        features.append([pts[bounds[i] : bounds[i + 1]] for i in range(n_parts)])
    return shape_type, features


def _fmt_part(part: np.ndarray) -> str:
    return "(" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in part) + ")"


def shp_to_wkt(path: str) -> tuple[str, str]:
    """One .shp file → (geom_kind, dissolved WKT): every feature's parts
    merged into a single MULTILINESTRING / MULTIPOLYGON — the reference's
    per-edition ST_UNION dissolve (all geometry of an edition is one operand
    to the fold).

    Polygons keep ONE polygon group per shapefile *record*: even-odd ring
    parity inside a record resolves its outer/hole structure, and the snap
    front-end unions the per-record cell sets (``union_all``).  Collapsing
    all records into one ring set would instead XOR overlapping solid
    features — their overlap would misclassify as a hole, diverging from
    ST_UNION semantics."""
    shape_type, features = read_shp(path)
    if shape_type == SHP_POLYLINE:
        return "MULTILINESTRING", "MULTILINESTRING (" + ", ".join(
            _fmt_part(p) for feat in features for p in feat
        ) + ")"
    return "MULTIPOLYGON", "MULTIPOLYGON (" + ", ".join(
        "(" + ", ".join(_fmt_part(p) for p in feat) + ")" for feat in features
    ) + ")"


def shp_dir_change_log(spark, directory: str, repo: str | None = None,
                       path_key: str | None = None):
    """A directory of edition shapefiles → the engine's WAL shape
    (``input_hint``): one change event per ``.shp`` file, ``commit`` = file
    stem in sorted order (replacing the reference's OS-dependent listdir
    order, main.py:141-144), ``content`` = the dissolved arbitrary-coordinate
    WKT — feed through ``snap.snap_change_log`` before ``CdcEngine.ingest``."""
    directory = os.path.abspath(directory)
    repo = repo or os.path.basename(os.path.dirname(directory))
    path_key = path_key or os.path.basename(directory)
    rows = []
    for fname in sorted(os.listdir(directory)):
        if not fname.endswith(".shp"):  # P4 suffix filter (main.py:142)
            continue
        stem = fname[:-4]
        _, wkt = shp_to_wkt(os.path.join(directory, fname))
        rows.append((repo, path_key, stem, "wkt", wkt))
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
