"""Pure-numpy shapefile reader (S2) + end-to-end ingest of the reference's
own bundled editions (data/railroads/ca) through snap-rounding — the
round-1 gap "cannot process the reference's bundled data even in principle".
"""

import os

import numpy as np
import pytest

from linked_maps_spark import geometry as G
from linked_maps_spark import snap as S
from linked_maps_spark.shapefile import read_shp, shp_dir_change_log, shp_to_wkt

CA_RAIL = "/root/reference/data/railroads/ca"
CA_WET = "/root/reference/data/wetlands/ca"

needs_refdata = pytest.mark.skipif(
    not os.path.isdir(CA_RAIL), reason="reference data not present"
)

# the ca tile sits near (-122, 41.6); a local origin + fine pitch gives
# ~50 m resolution, well inside the grid window
PITCH, ORIGIN = 0.0005, (-122.2, 41.4)


@needs_refdata
def test_read_shp_polyline_geometry():
    shape_type, feats = read_shp(os.path.join(CA_RAIL, "1950c.shp"))
    assert shape_type == 3 and len(feats) == 5587
    pts = np.concatenate([p for f in feats for p in f])
    # NAD83 lng/lat of the California tile (1950c.qpj: EPSG:4269)
    assert -123 < pts[:, 0].min() and pts[:, 0].max() < -121
    assert 41 < pts[:, 1].min() and pts[:, 1].max() < 42


@needs_refdata
def test_read_shp_polygon_rings():
    shape_type, feats = read_shp(os.path.join(CA_WET, "1993.shp"))
    assert shape_type == 5 and feats
    kind, wkt = shp_to_wkt(os.path.join(CA_WET, "1993.shp"))
    assert kind == "MULTIPOLYGON"
    cells = G.parse_wkt(S.snap_wkt(wkt, G.POLYGON, pitch=0.002), G.POLYGON)
    assert cells.size > 0


@needs_refdata
def test_reference_editions_fold_end_to_end(spark, tmp_path):
    """The reference's actual railroads/ca editions ingest, fold, and answer
    the UI queries: every .shp edition becomes a commit, snap-rounding maps
    the NAD83 coordinates onto the grid, and the lattice behaves (Q3 ∪ Q4 =
    Q1 partition, intersections exist across editions)."""
    from linked_maps_spark.changelog import commit_label  # noqa: F401 (year shape)
    from linked_maps_spark.ingest import CdcEngine
    from linked_maps_spark.queries import q1_edition, q3_persisted, q4_retired
    from linked_maps_spark.snap import snap_change_log

    wal = shp_dir_change_log(spark, CA_RAIL)
    commits = sorted(r["commit"] for r in wal.select("commit").distinct().collect())
    assert commits[0] == "1950c" and len(commits) == 7

    eng = CdcEngine(spark, str(tmp_path / "ca"), geom_type=G.LINE, n_buckets=2)
    eng.create_tables(overwrite=True)
    eng.ingest(
        snap_change_log(wal, pitch=PITCH, origin=ORIGIN), commits_per_epoch=4
    )
    seg = eng.current_segments().cache()
    rel = eng.relations.read().cache()
    assert seg.count() > 7  # derived lattice nodes exist, not just editions
    assert {r["name"][:2] for r in seg.collect()} & {"i_", "m_"}
    y1, y2 = commits[0][:4], commits[-1][:4]
    q1 = {r["gid"] for r in q1_edition(seg, rel, y1).collect()}
    q3 = {r["gid"] for r in q3_persisted(seg, rel, y1, y2).collect()}
    q4 = {r["gid"] for r in q4_retired(seg, rel, y1, y2).collect()}
    assert q1 and q3 | q4 == q1 and not (q3 & q4)
    assert q3, "persisted track must exist between 1950 and 2001"
    # replay determinism on real data: same WAL → same digest
    from linked_maps_spark.util import table_digest

    eng2 = CdcEngine(spark, str(tmp_path / "ca2"), geom_type=G.LINE, n_buckets=2)
    eng2.create_tables(overwrite=True)
    eng2.ingest(
        snap_change_log(wal, pitch=PITCH, origin=ORIGIN), commits_per_epoch=7
    )
    cols = ["gid", "name", "seq", "wkt", "content_sha256", "is_leaf", "retired"]
    assert table_digest(eng2.current_segments(), cols) == table_digest(seg, cols)


@needs_refdata
def test_reference_wetlands_polygon_end_to_end(spark, tmp_path):
    """Polygon-mode reference data (data/wetlands/ca): both editions ingest
    through snap scan-fill and fold into a MULTIPOLYGON lattice."""
    from linked_maps_spark.ingest import CdcEngine
    from linked_maps_spark.snap import snap_change_log

    wal = shp_dir_change_log(spark, CA_WET)
    commits = sorted(r["commit"] for r in wal.select("commit").distinct().collect())
    assert len(commits) >= 2
    eng = CdcEngine(spark, str(tmp_path / "wet"), geom_type=G.POLYGON, n_buckets=2)
    eng.create_tables(overwrite=True)
    eng.ingest(
        # the wetlands tile sits near (-121.1, 41.2): its own origin window
        snap_change_log(wal, geom_type=G.POLYGON, pitch=0.002, origin=(-121.5, 41.0)),
        commits_per_epoch=len(commits),
    )
    seg = eng.current_segments()
    wkts = [r["wkt"] for r in seg.select("wkt").collect()]
    assert wkts and all(w.startswith("MULTIPOLYGON") for w in wkts)
    assert seg.count() > len(commits)  # intersections across editions exist
