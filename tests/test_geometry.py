import numpy as np
import pytest

from linked_maps_spark import geometry as G


def test_parse_roundtrip_line():
    wkt = "MULTILINESTRING ((0.00 0.00, 0.03 0.00), (0.05 0.05, 0.07 0.07))"
    ids = G.parse_wkt(wkt, G.LINE)
    assert ids.size == 5  # 3 horizontal unit edges + 2 diagonal
    assert G.to_wkt(ids, G.LINE) == wkt
    # reparse of canonical form is stable (canonical fixpoint)
    assert np.array_equal(G.parse_wkt(G.to_wkt(ids, G.LINE), G.LINE), ids)


def test_parse_merges_collinear_runs():
    # two touching collinear pieces merge into one canonical run
    a = G.parse_wkt("MULTILINESTRING ((0.00 0.00, 0.02 0.00))", G.LINE)
    b = G.parse_wkt("MULTILINESTRING ((0.02 0.00, 0.04 0.00))", G.LINE)
    u = G.union_all([a, b])
    assert G.to_wkt(u, G.LINE) == "MULTILINESTRING ((0.00 0.00, 0.04 0.00))"


def test_single_linestring_accepted():
    ids = G.parse_wkt("LINESTRING (0.00 0.00, 0.01 0.00)", G.LINE)
    assert ids.size == 1


def test_empty_and_tombstone():
    assert G.parse_wkt("", G.LINE).size == 0
    assert G.parse_wkt("MULTILINESTRING EMPTY", G.LINE).size == 0
    assert G.to_wkt(np.empty(0, np.int64), G.LINE) == "MULTILINESTRING EMPTY"


def test_off_grid_rejected():
    with pytest.raises(G.GeometryError):
        G.parse_wkt("MULTILINESTRING ((0.005 0.00, 0.01 0.00))", G.LINE)
    with pytest.raises(G.GeometryError):
        # not axis-aligned / 45°
        G.parse_wkt("MULTILINESTRING ((0.00 0.00, 0.02 0.01))", G.LINE)


def test_set_algebra_matches_reference_semantics():
    # G1/G2/G3 of postgis_sqls.py:32-105 on grid-aligned input
    L = G.parse_wkt("MULTILINESTRING ((0.00 0.00, 0.04 0.00))", G.LINE)
    E = G.parse_wkt("MULTILINESTRING ((0.02 0.00, 0.06 0.00))", G.LINE)
    I = G.intersect(L, E)
    assert G.to_wkt(I, G.LINE) == "MULTILINESTRING ((0.02 0.00, 0.04 0.00))"
    M = G.difference(L, I)
    assert G.to_wkt(M, G.LINE) == "MULTILINESTRING ((0.00 0.00, 0.02 0.00))"
    R = G.difference(E, G.union_all([I]))
    assert G.to_wkt(R, G.LINE) == "MULTILINESTRING ((0.04 0.00, 0.06 0.00))"
    # partition property: I ∪ M ∪ R == L ∪ E, pairwise disjoint
    assert np.array_equal(G.union_all([I, M, R]), G.union_all([L, E]))
    assert G.intersect(I, M).size == 0 and G.intersect(I, R).size == 0


def test_polygon_mode():
    wkt = "MULTIPOLYGON (((0.00 0.00, 0.02 0.00, 0.02 0.01, 0.00 0.01, 0.00 0.00)))"
    ids = G.parse_wkt(wkt, G.POLYGON)
    assert ids.size == 2  # two unit cells
    assert G.to_wkt(ids, G.POLYGON) == wkt
    other = G.parse_wkt(
        "MULTIPOLYGON (((0.01 0.00, 0.03 0.00, 0.03 0.01, 0.01 0.01, 0.01 0.00)))", G.POLYGON
    )
    inter = G.intersect(ids, other)
    assert G.to_wkt(inter, G.POLYGON) == (
        "MULTIPOLYGON (((0.01 0.00, 0.02 0.00, 0.02 0.01, 0.01 0.01, 0.01 0.00)))"
    )


def test_disjoint_intersection_empty():
    a = G.parse_wkt("MULTILINESTRING ((0.00 0.00, 0.01 0.00))", G.LINE)
    b = G.parse_wkt("MULTILINESTRING ((0.10 0.10, 0.11 0.10))", G.LINE)
    assert not G.is_multi(G.intersect(a, b))  # G4 guard drops it


def test_sha256_stability():
    w = "MULTILINESTRING ((0.00 0.00, 0.01 0.00))"
    assert G.sha256_hex(w) == G.sha256_hex(w)
    assert len(G.sha256_hex(w)) == 64
