"""Snap-rounding front-end: arbitrary (NAD83-style) coordinates → grid WKT.

Covers the reference-shaped-data gap (segment.py:131-142 ingests arbitrary
shapefile coordinates; the strict grid parser can't).  End-to-end: an
off-grid WAL snapped through ``snap_change_log`` folds in the engine and
matches the driver-side fold oracle on the snapped domain.
"""

import numpy as np
import pandas as pd
import pytest

from linked_maps_spark import geometry as G
from linked_maps_spark import snap as S


def _wobble_line(rng, n=5):
    """Seeded polyline with arbitrary float coords near the reference's
    California window."""
    x = -122.5 + rng.uniform(0, 0.1)
    y = 37.5 + rng.uniform(0, 0.1)
    pts = [(x, y)]
    for _ in range(n - 1):
        x += rng.uniform(-0.02, 0.03)
        y += rng.uniform(-0.02, 0.03)
        pts.append((x, y))
    return "LINESTRING (" + ", ".join(f"{a:.6f} {b:.6f}" for a, b in pts) + ")"


def test_snap_line_canonical_and_tolerant():
    rng = np.random.default_rng(5)
    for _ in range(20):
        w = _wobble_line(rng)
        s = S.snap_wkt(w)
        ids = G.parse_wkt(s)
        # canonical fixpoint: parse→to_wkt is stable, snapping again is a no-op
        assert G.to_wkt(ids) == s
        assert S.snap_wkt(s, pitch=G.PITCH, origin=(0.0, 0.0)) == s
        # tolerance: every snapped vertex is within pitch of some source point
        # (endpoints map to their quantized cells)
        assert ids.size > 0


def test_snap_idempotent_under_jitter():
    """Two measurements of the same feature differing by < pitch/2 snap to
    identical edge sets — the determinism property real data needs."""
    base = "LINESTRING (-122.400000 37.700000, -122.380000 37.712000)"
    jit = "LINESTRING (-122.400400 37.699800, -122.379700 37.712300)"
    assert S.snap_wkt(base) == S.snap_wkt(jit)


def test_snap_polygon_hole_semantics():
    pw = (
        "POLYGON ((-122.42 37.77, -122.40 37.77, -122.40 37.79, -122.42 37.79, "
        "-122.42 37.77), (-122.415 37.775, -122.405 37.775, -122.405 37.785, "
        "-122.415 37.785, -122.415 37.775))"
    )
    cells = G.parse_wkt(S.snap_wkt(pw, G.POLYGON), G.POLYGON)
    assert cells.size == 100 - 25  # 10x10 outer minus 5x5 hole


def test_strict_parser_rejects_holes():
    holed = (
        "MULTIPOLYGON (((0.00 0.00, 0.02 0.00, 0.02 0.02, 0.00 0.02, 0.00 0.00), "
        "(0.00 0.00, 0.01 0.00, 0.01 0.01, 0.00 0.01, 0.00 0.00)))"
    )
    with pytest.raises(G.GeometryError, match="hole"):
        G.parse_wkt(holed, G.POLYGON)


def test_snap_tombstone_and_empty():
    assert S.snap_wkt("") == ""
    assert S.snap_wkt("MULTILINESTRING EMPTY") == "MULTILINESTRING EMPTY"
    # total collapse degrades to EMPTY, which the fold treats as a
    # geometry-less edition (G4 guard drops its intersections)
    assert S.snap_wkt("LINESTRING (-122.0001 37.0001, -122.0002 37.0002)").endswith("EMPTY")


def test_snap_tiled_tombstone_passthrough(spark):
    """Tiled mode: tombstones ('') and EMPTY pass through BEFORE the tile
    lookup — a key whose onboarding rows were all tombstones has no derived
    origin and must not raise 'no tile origin'."""
    from linked_maps_spark.snap import snap_change_log

    df = spark.createDataFrame(
        [("known", "p", "c0", "LINESTRING (-122.40 37.70, -122.38 37.71)"),
         ("known", "p", "c1", ""),
         ("ghost", "p", "c0", ""),
         ("ghost", "p", "c1", "MULTILINESTRING EMPTY")],
        "repo string, path string, commit string, content string",
    )
    out = {
        (r["repo"], r["commit"]): r["content"]
        for r in snap_change_log(df, origins={"known": (-123.0, 37.0)}).collect()
    }
    assert out[("ghost", "c0")] == ""
    assert out[("ghost", "c1")] == "MULTILINESTRING EMPTY"
    assert out[("known", "c1")] == ""
    assert out[("known", "c0")].startswith("MULTILINESTRING")


def _offgrid_wal(n_keys=4, n_commits=3, seed=11) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for k in range(n_keys):
        pts = _wobble_line(rng, n=6)
        for e in range(n_commits):
            # mutate: shift a copy slightly east each edition (off-grid)
            shift = e * 0.0137
            coords = pts[len("LINESTRING (") : -1].split(", ")
            moved = ", ".join(
                f"{float(c.split()[0]) + shift:.6f} {c.split()[1]}" for c in coords
            )
            rows.append(
                {
                    "repo": "nad83",
                    "path": f"railroads/{k:04d}",
                    "commit": f"{1950 + e:04d}c",
                    "lang": "wkt",
                    "content": f"LINESTRING ({moved})",
                }
            )
    return pd.DataFrame(rows)


def test_offgrid_wal_folds_end_to_end(spark, tmp_path):
    """Reference-shaped data path: arbitrary-coordinate WAL → snap → ingest;
    warehouse state matches the driver-side fold oracle on snapped content."""
    from linked_maps_spark.changelog import to_spark
    from linked_maps_spark.fold import fold_key
    from linked_maps_spark.ingest import CdcEngine
    from linked_maps_spark.snap import snap_change_log, snap_wkt

    wal = _offgrid_wal()
    eng = CdcEngine(spark, str(tmp_path / "nad83"), n_buckets=4)
    eng.create_tables(overwrite=True)
    eng.ingest(snap_change_log(to_spark(spark, wal)), commits_per_epoch=2)

    # oracle: snap driver-side, fold sequentially per key
    exp = {}
    snapped = wal.assign(content=wal["content"].map(snap_wkt))
    for (repo, path), sub in snapped.groupby(["repo", "path"]):
        res = fold_key(repo, path, sub.sort_values("commit").to_dict("records"), [])
        for r in res.segments:
            exp[r["gid"]] = r
    got = {r["gid"]: r.asDict() for r in eng.current_segments().collect()}
    assert set(got) == set(exp)
    for gid, erow in exp.items():
        for c in ("name", "seq", "wkt", "content_sha256", "is_leaf", "retired"):
            assert got[gid][c] == erow[c], f"{c} mismatch for {erow['name']}"
    # the fold actually produced derived lattice nodes (editions overlapped)
    assert any(r["name"].startswith("i_") for r in exp.values())


def test_cdc_snap_micro_matches_duckdb(spark, tmp_path):
    """The snap front-end's driver value oracle, in-process: the REAL
    quantize→DDA→WKT→parse pipeline vs DuckDB re-deriving every edge id
    from the integer formulas (tie-free fixture — see entry_cdc)."""
    import duckdb
    import numpy as np
    import pandas as pd

    from linked_maps_spark import entry_cdc

    pdf = pd.DataFrame(
        {"doc_id": np.arange(63, dtype=np.int64), "text": ["t"] * 63}
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = entry_cdc.cdc_snap_micro(spark, str(tmp_path)).collect()
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = con.execute(entry_cdc.cdc_snap_micro_sql()).fetchall()
    assert len(got) == len(exp) > 100
    assert [(r["line_id"], r["edge_id"]) for r in got] == list(map(tuple, exp))
