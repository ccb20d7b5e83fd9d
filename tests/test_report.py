"""HTML/SVG query report — the reference UI analog (ui/main.py + wktmap.js)."""

import pytest

from linked_maps_spark import geometry as G
from linked_maps_spark.changelog import commit_label, synth_change_log, to_spark
from linked_maps_spark.ingest import CdcEngine
from linked_maps_spark.osm_link import link_osm, synth_osm_catalog
from linked_maps_spark.report import build_report, render_svg, wkt_svg_path, write_report


def test_wkt_svg_path_shapes():
    d = wkt_svg_path("MULTILINESTRING ((0.00 0.00, 2.00 0.00), (1.00 1.00, 1.00 3.00))")
    assert d == "M 0.00 0.00 L 2.00 0.00 M 1.00 1.00 L 1.00 3.00"
    assert wkt_svg_path("") == "" and wkt_svg_path("MULTILINESTRING EMPTY") == ""


def test_render_svg_scales_and_flips():
    svg = render_svg(["LINESTRING (0.00 0.00, 10.00 10.00)"], width=100, height=100, pad=10)
    # y axis flipped: the (0,0) vertex maps to the BOTTOM-left (90), the
    # (10,10) vertex to the top (10)
    assert '<svg class="map"' in svg and 'stroke="#990000"' in svg
    assert "M 10.00 90.00 L 90.00 10.00" in svg
    # empty set renders an empty frame, not an error
    assert render_svg([]).startswith('<svg class="map"')


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    eng = CdcEngine(
        spark, str(tmp_path_factory.mktemp("rwh") / "w"), geom_type=G.LINE, n_buckets=4
    )
    eng.create_tables(overwrite=True)
    wal = synth_change_log(n_keys=4, n_commits=3, seed=27)
    eng.ingest(to_spark(spark, wal), commits_per_epoch=3)
    return eng


def test_full_report_contains_all_reference_queries(eng, tmp_path):
    seg, rel = eng.current_segments().cache(), eng.relations.read().cache()
    links = link_osm(seg, synth_osm_catalog(eng.spark, seg, seed=4))
    y1, y2 = commit_label(0)[:4], commit_label(2)[:4]
    out = str(tmp_path / "report.html")
    write_report(out, seg, rel, y1, y2, osm_links=links)
    html = open(out).read()
    # the reference UI's five dropdown entries (ui/main.py:23-78), by name
    for name in ("1 edition", "1 edition - unique", "2 editions - similar",
                 "2 editions - difference", "LinkedGeoData"):
        assert name in html, name
    assert html.count("<svg") == 5
    # each map draws exactly its query's features
    from linked_maps_spark.queries import q1_edition

    n_q1 = q1_edition(seg, rel, y1).count()
    assert n_q1 > 0 and f"{n_q1} feature(s)" in html
    assert html.count("<path") >= n_q1
    # classification rollup table present with the three kinds possible here
    assert "Change classification" in html and "unchanged" in html
    # offline self-containment: no scripts, no external resources
    assert "<script" not in html and "src=" not in html


def test_report_without_osm_links(eng):
    seg, rel = eng.current_segments(), eng.relations.read()
    y1, y2 = commit_label(0)[:4], commit_label(2)[:4]
    html = build_report(seg, rel, y1, y2)
    assert html.count("<svg") == 4 and "LinkedGeoData" not in html
