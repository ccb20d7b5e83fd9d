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
