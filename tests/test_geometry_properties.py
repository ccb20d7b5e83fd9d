"""Property-based checks of the grid-geometry algebra (SURVEY.md §5.2 item 4)
— pure python, no Spark."""

import numpy as np
from hypothesis import given, settings, strategies as st

from linked_maps_spark import geometry as G

# arbitrary unit edges on a small grid: generate endpoints + direction
def _mk_edges(trips: list[tuple[int, int, int]]) -> np.ndarray:
    ids = []
    for x, y, d in trips:
        ux, uy = G._DIRS[d]
        if not (0 <= y + uy <= 51):
            continue
        p = x * G._P + y
        q = (x + ux) * G._P + (y + uy)
        ids.append(min(p, q) * G._E + max(p, q))
    return np.unique(np.array(ids, dtype=np.int64))


_edge_ids = st.lists(
    st.tuples(st.integers(0, 50), st.integers(1, 50), st.integers(0, 3)),
    min_size=0, max_size=60,
).map(_mk_edges)


@settings(max_examples=150, deadline=None)
@given(_edge_ids, _edge_ids)
def test_partition_identity(a, b):
    """I ∪ (A∖I) ∪ (B∖I) == A ∪ B with pairwise disjoint parts — the lattice
    postcondition of one fold round (SURVEY.md §2.5)."""
    i = G.intersect(a, b)
    ma = G.difference(a, i)
    mb = G.difference(b, i)
    assert np.array_equal(G.union_all([i, ma, mb]), G.union_all([a, b]))
    assert G.intersect(i, ma).size == 0
    assert G.intersect(i, mb).size == 0
    assert G.intersect(ma, mb).size == 0


@settings(max_examples=100, deadline=None)
@given(_edge_ids)
def test_wkt_roundtrip_is_canonical_fixpoint(ids):
    w1 = G.to_wkt(ids, G.LINE)
    back = G.parse_wkt(w1, G.LINE)
    assert np.array_equal(back, ids)
    assert G.to_wkt(back, G.LINE) == w1  # canonical fixpoint
    assert G.sha256_hex(w1) == G.sha256_hex(G.to_wkt(back, G.LINE))


@settings(max_examples=100, deadline=None)
@given(_edge_ids, _edge_ids)
def test_algebra_laws(a, b):
    assert np.array_equal(G.intersect(a, b), G.intersect(b, a))
    assert np.array_equal(G.union_all([a, b]), G.union_all([b, a]))
    assert G.intersect(G.difference(a, b), b).size == 0
    assert np.array_equal(
        G.union_all([G.intersect(a, b), G.difference(a, b)]), a
    )


# ------------------------------------------------------ snap front-end props

_float_lines = st.lists(
    st.tuples(
        st.floats(min_value=-124.9, max_value=-95.0, allow_nan=False),
        st.floats(min_value=32.1, max_value=60.0, allow_nan=False),
    ),
    min_size=2,
    max_size=8,
)


@settings(max_examples=100, deadline=None)
@given(_float_lines)
def test_snap_always_yields_canonical_grid_wkt(pts):
    """Any arbitrary-coordinate polyline snaps to WKT the strict parser
    accepts, and the result is a canonical fixpoint (parse→to_wkt stable;
    re-snapping on the engine grid is the identity)."""
    from linked_maps_spark import snap as S

    wkt = "LINESTRING (" + ", ".join(f"{x:.7f} {y:.7f}" for x, y in pts) + ")"
    s = S.snap_wkt(wkt)
    ids = G.parse_wkt(s, G.LINE)  # strict parser accepts the snapped form
    assert G.to_wkt(ids, G.LINE) == s
    if ids.size:
        assert S.snap_wkt(s, pitch=G.PITCH, origin=(0.0, 0.0)) == s


@settings(max_examples=100, deadline=None)
@given(st.lists(_edge_ids, min_size=0, max_size=6))
def test_to_wkt_batch_equals_per_node(ids_list):
    """The batched serializer must emit byte-identical strings to the
    per-node reference implementation (it feeds content_sha256)."""
    assert G.to_wkt_batch(ids_list, G.LINE) == [
        G.to_wkt(i, G.LINE) for i in ids_list
    ]


_cell_ids = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 50)), min_size=0, max_size=60
).map(
    lambda pts: np.unique(
        np.array([x * G._P + y for x, y in pts], dtype=np.int64)
    )
)


@settings(max_examples=100, deadline=None)
@given(st.lists(_cell_ids, min_size=0, max_size=6))
def test_to_wkt_batch_equals_per_node_polygon(ids_list):
    assert G.to_wkt_batch(ids_list, G.POLYGON) == [
        G.to_wkt(i, G.POLYGON) for i in ids_list
    ]
