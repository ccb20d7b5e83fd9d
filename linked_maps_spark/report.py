"""HTML/SVG query report — the engine's analog of the reference UI.

The reference serves five canned SPARQL queries over Flask
(``/root/reference/ui/main.py:23-78``) and draws each result's WKT on
Google Maps (``ui/static/js/wktmap.js`` — stroke ``#990000``, fill
``#EEFFCC``).  An offline engine cannot assume a tile service or a live
endpoint, so the analog is a SELF-CONTAINED artifact: one HTML file with
the same five queries (the ``queries.py`` DataFrame twins), each rendered
as an inline-SVG map plus a result table, and the change-classification
rollup (added/retired/unchanged counts).

A report is a boundary artifact like the Turtle export — per-query feature
payloads are capped (``max_features``) and collected driver-side
deliberately; the data plane stays in the lake tables.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np

from . import geometry as G
from .queries import (
    classify_changes,
    q1_edition,
    q2_edition_unique,
    q3_persisted,
    q4_retired,
    q5_persisted_with_osm,
)

# wktmap.js defaults (ui/static/js/wktmap.js:20-25)
STROKE = "#990000"
FILL = "#EEFFCC"

_NUM_RE = re.compile(r"[-+0-9.eE]+")


def _rings(wkt: str) -> list[np.ndarray]:
    """WKT body → list of (n,2) float arrays (rings / linestrings)."""
    wkt = (wkt or "").strip()
    if not wkt or wkt.upper().endswith("EMPTY"):
        return []
    body = "(" + wkt.partition("(")[2]
    out = []
    for grp in G._RING_RE.findall(body):
        vals = np.asarray(_NUM_RE.findall(grp), dtype=np.float64)
        out.append(np.stack([vals[0::2], vals[1::2]], axis=1))
    return out


def wkt_svg_path(wkt: str, transform=None) -> str:
    """One SVG path ``d`` string per geometry: each ring/linestring is one
    ``M … L …`` subpath; polygon holes render via ``fill-rule=evenodd``."""
    parts = []
    for ring in _rings(wkt):
        pts = ring if transform is None else transform(ring)
        coords = " L ".join(f"{x:.2f} {y:.2f}" for x, y in pts)
        parts.append(f"M {coords}")
    return " ".join(parts)


def render_svg(
    wkts: list[str],
    width: int = 640,
    height: int = 420,
    pad: float = 12.0,
    geom_type: str = G.LINE,
) -> str:
    """Inline SVG map of a feature set: uniform scale over the joint bbox,
    y flipped (SVG y grows downward, latitude grows upward)."""
    all_pts = [r for w in wkts for r in _rings(w)]
    if not all_pts:
        return f'<svg class="map" width="{width}" height="{height}"></svg>'
    allv = np.concatenate(all_pts)
    x0, y0 = allv[:, 0].min(), allv[:, 1].min()
    x1, y1 = allv[:, 0].max(), allv[:, 1].max()
    span = max(x1 - x0, y1 - y0) or 1.0
    scale = (min(width, height) - 2 * pad) / span

    def tf(ring: np.ndarray) -> np.ndarray:
        out = np.empty_like(ring)
        out[:, 0] = pad + (ring[:, 0] - x0) * scale
        out[:, 1] = height - pad - (ring[:, 1] - y0) * scale
        return out

    if geom_type == G.POLYGON:
        style = f'fill="{FILL}" fill-opacity="0.6" fill-rule="evenodd" stroke="{STROKE}"'
    else:
        style = f'fill="none" stroke="{STROKE}" stroke-width="1.5"'
    paths = "\n".join(
        f'  <path d="{wkt_svg_path(w, tf)}" {style}/>' for w in wkts if _rings(w)
    )
    return (
        f'<svg class="map" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">\n{paths}\n</svg>'
    )


_CSS = """
body { font-family: sans-serif; margin: 2em; color: #222; }
h1 { border-bottom: 2px solid #990000; padding-bottom: .2em; }
h2 { margin-top: 2em; }
svg.map { border: 1px solid #ccc; background: #fafafa; }
table { border-collapse: collapse; margin-top: .6em; }
th, td { border: 1px solid #ccc; padding: .25em .6em; font-size: .85em; }
th { background: #eee; }
td.gid { font-family: monospace; }
.count { color: #555; font-size: .9em; }
"""


def _feature_table(rows, max_rows: int = 25) -> str:
    head = "<tr><th>gid</th><th>extra</th></tr>"
    body = "\n".join(
        "<tr><td class='gid'>{}</td><td>{}</td></tr>".format(
            _html.escape(str(r["gid"])),
            _html.escape(str(r["osm_uri"]) if "osm_uri" in r.__fields__ else ""),
        )
        for r in rows[:max_rows]
    )
    more = (
        f"<tr><td colspan='2'>… {len(rows) - max_rows} more</td></tr>"
        if len(rows) > max_rows
        else ""
    )
    return f"<table>{head}\n{body}\n{more}</table>"


def build_report(
    segments,
    relations,
    year1: str,
    year2: str,
    osm_links=None,
    geom_type: str = G.LINE,
    max_features: int = 2000,
    title: str = "linked-maps query report",
) -> str:
    """The five reference queries + classification rollup as one HTML page.

    Query names and semantics match the reference UI's dropdown
    (ui/main.py:23-78); rendering replaces the Google-Maps canvas with
    self-contained SVG."""
    queries = [
        (f"1 edition ({year1})", q1_edition(segments, relations, year1)),
        (f"1 edition - unique ({year2})", q2_edition_unique(segments, relations, year2)),
        (f"2 editions - similar ({year1}, {year2})",
         q3_persisted(segments, relations, year1, year2)),
        (f"2 editions - difference ({year1} \\ {year2})",
         q4_retired(segments, relations, year1, year2)),
    ]
    if osm_links is not None:
        queries.append(
            (f"2 editions - similar - LinkedGeoData ({year1}, {year2})",
             q5_persisted_with_osm(segments, relations, osm_links, year1, year2))
        )
    sections = []
    for name, df in queries:
        rows = df.limit(max_features).collect()
        svg = render_svg([r["wkt"] for r in rows], geom_type=geom_type)
        sections.append(
            f"<h2>{_html.escape(name)}</h2>\n"
            f"<p class='count'>{len(rows)} feature(s)"
            + (f" (capped at {max_features})" if len(rows) == max_features else "")
            + f"</p>\n{svg}\n{_feature_table(rows)}"
        )
    rollup = (
        classify_changes(segments, relations, year1, year2)
        .groupBy("change_kind").count().orderBy("change_kind").collect()
    )
    rollup_html = "<table><tr><th>change</th><th>features</th></tr>" + "".join(
        f"<tr><td>{_html.escape(r['change_kind'])}</td><td>{r['count']}</td></tr>"
        for r in rollup
    ) + "</table>"
    return (
        "<!DOCTYPE html>\n<html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title><style>{_CSS}</style></head>\n"
        f"<body>\n<h1>{_html.escape(title)}</h1>\n"
        f"<h2>Change classification ({year1} → {year2})</h2>\n{rollup_html}\n"
        + "\n".join(sections)
        + "\n</body></html>\n"
    )


def write_report(path: str, *args, **kwargs) -> None:
    with open(path, "w") as fh:
        fh.write(build_report(*args, **kwargs))
