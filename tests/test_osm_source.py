"""Overpass source interface (S8): URL shape, element parsing, and the
synthetic implementation plugging into the linking pipeline."""

import pytest

from linked_maps_spark.osm_source import (
    HttpOverpass,
    SyntheticOverpass,
    overpass_query_url,
    parse_overpass_elements,
)


def test_query_url_matches_reference_shape():
    # linked_maps_to_osm.py:49-59: [out:json];node(s,w,n,e);<;out meta;
    url = overpass_query_url(41.5, -122.0, 41.7, -121.6)
    assert url == (
        "http://overpass-api.de/api/interpreter?data=[out:json];"
        "node(41.5,-122.0,41.7,-121.6);<;out meta;"
    )


def test_parse_overpass_elements():
    elements = [
        {"id": 7, "type": "node", "lat": 41.5, "lon": -122.0,
         "tags": {"railway": "rail"}},
        {"id": 9, "type": "way", "tags": {"landuse": "forest"}},
        {"id": 11, "type": "relation"},
    ]
    rows = parse_overpass_elements(elements)
    assert rows[0] == {
        "osm_id": 7, "osm_type": "node", "tags": {"railway": "rail"},
        "lat": 41.5, "lng": -122.0,
    }
    assert rows[1]["lat"] is None and rows[1]["osm_type"] == "way"
    assert rows[2]["tags"] == {}


def test_parse_recorded_overpass_response(spark):
    """Real-shaped recorded Overpass payload (out:json + out meta: osm3s
    header, node/way/relation elements with meta attrs, way node lists,
    relation members) parses into the catalog schema, loads into Spark, and
    survives the linking tag filter — the parse path exercised on the wire
    format, not only hand-minimal dicts."""
    import json
    import os

    from pyspark.sql import functions as F

    from linked_maps_spark.osm_link import OSM_CATALOG_SCHEMA

    fixture = os.path.join(
        os.path.dirname(__file__), "fixtures", "overpass_bray_ca.json"
    )
    with open(fixture) as fh:
        payload = json.load(fh)
    rows = parse_overpass_elements(payload["elements"])
    assert len(rows) == 6
    by_id = {r["osm_id"]: r for r in rows}
    # 64-bit node id, meta attrs ignored, coords carried
    n = by_id[4586023001]
    assert n["osm_type"] == "node" and n["tags"] == {}
    assert n["lat"] == pytest.approx(41.6429534)
    assert n["lng"] == pytest.approx(-121.9837482)
    # numeric-looking tag values arrive as strings; ways/relations have no
    # coords in this query shape (reference keys votes on identity)
    w = by_id[23721097]
    assert w["osm_type"] == "way" and w["lat"] is None
    assert w["tags"]["gauge"] == "1435" and w["tags"]["railway"] == "rail"
    assert by_id[9202403]["osm_type"] == "relation"
    # loads under the catalog schema and the P5 tag filter behaves
    df = spark.createDataFrame(rows, OSM_CATALOG_SCHEMA)
    kept = df.filter(
        F.map_contains_key(F.col("tags"), F.lit("railway"))
        | F.array_contains(F.map_values("tags"), "railway")
    )
    # switch + level_crossing + rail way + route=railway relation
    assert kept.count() == 4


def test_http_source_raises_offline():
    src = HttpOverpass(timeout_s=0.5, throttle_s=0.0)
    with pytest.raises(RuntimeError, match="Overpass fetch failed"):
        src.fetch_tile(41.5, -122.0, 41.51, -121.99)


def test_synthetic_source_feeds_linking(spark):
    from linked_maps_spark.osm_link import link_osm

    seg = spark.createDataFrame(
        [("gid-a", "LINESTRING (0.00 0.00, 0.01 0.00, 0.02 0.00)")],
        "gid string, wkt string",
    )
    catalog = SyntheticOverpass(seed=4).catalog(spark, seg)
    assert catalog.columns == ["osm_id", "osm_type", "tags", "lat", "lng"]
    links = link_osm(seg, catalog, filter_tag="railway")
    assert set(links.columns) == {"gid", "osm_uris"}
