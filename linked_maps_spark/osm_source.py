"""Overpass source interface (S8) — the external-I/O face of OSM linking.

The reference queries the Overpass HTTP API per sampled bbox
(``/root/reference/linked_maps_to_osm.py:43-82``): unseeded, rate-limited by
``sleep(0.5)``, and irreproducible.  The engine splits the concern:

* :class:`OverpassSource` — the interface the linking pipeline consumes: one
  method, ``catalog(spark, segments) -> DataFrame[OSM_CATALOG_SCHEMA]``.
* :class:`SyntheticOverpass` — the deterministic in-repo implementation
  (FIXTURES.md §4), used by every test and the driver queries.
* :class:`HttpOverpass` — the real-API implementation.  The query URL is
  constructed exactly like the reference's (same Overpass QL: all nodes in
  the bbox plus their parent ways/relations, ``< ; out meta``) and the JSON
  element parsing into the catalog schema is pure and unit-testable; only
  the network fetch itself raises in offline environments.

At scale the HTTP path is a bulk-ingest, not a per-segment federated call:
fetch region tiles once into the ``osm_catalog`` lake table, then link with
the cell-grid equi-join (osm_link.py) — never N HTTP round-trips inside a
join loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .osm_link import OSM_CATALOG_SCHEMA, synth_osm_catalog

OVERPASS_URL_BASE = "http://overpass-api.de/api/interpreter?data=[out:json];"


def overpass_query_url(s: float, w: float, n: float, e: float) -> str:
    """The reference's exact query shape (linked_maps_to_osm.py:51-59):
    nodes in (s,w,n,e), recursed up to parent ways/relations, meta output."""
    return OVERPASS_URL_BASE + f"node({s},{w},{n},{e});<;out meta;"


def parse_overpass_elements(elements: list[dict]) -> list[dict]:
    """Overpass JSON ``elements`` → catalog rows (osm_id, osm_type, tags,
    lat, lng).  Ways/relations carry no coordinates in this query shape; the
    reference likewise keys votes on element identity, so they pass through
    with NULL coordinates and survive only tag filtering."""
    rows = []
    for el in elements:
        rows.append(
            {
                "osm_id": int(el["id"]),
                "osm_type": str(el.get("type", "node")),
                "tags": {str(k): str(v) for k, v in (el.get("tags") or {}).items()},
                "lat": float(el["lat"]) if "lat" in el else None,
                "lng": float(el["lon"]) if "lon" in el else None,
            }
        )
    return rows


class OverpassSource:
    """Interface: produce an ``osm_catalog`` DataFrame for a segment set."""

    def catalog(self, spark: SparkSession, segments: DataFrame) -> DataFrame:
        raise NotImplementedError


class SyntheticOverpass(OverpassSource):
    """Deterministic catalog seeded from segment geometry (FIXTURES.md §4)."""

    def __init__(self, seed: int = 4, per_seg: int = 3):
        self.seed = seed
        self.per_seg = per_seg

    def catalog(self, spark: SparkSession, segments: DataFrame) -> DataFrame:
        return synth_osm_catalog(spark, segments, seed=self.seed, per_seg=self.per_seg)


class HttpOverpass(OverpassSource):
    """Real-API source: fetches one wrapper-bbox tile per segment partition.

    Offline sandboxes have no network; the fetch raises ``RuntimeError``
    there, while URL construction and element parsing remain testable."""

    DEFAULT_ENDPOINT = "http://overpass-api.de/api/interpreter"

    def __init__(
        self,
        timeout_s: float = 30.0,
        throttle_s: float = 0.5,
        endpoint: str | None = None,
    ):
        self.timeout_s = timeout_s
        self.throttle_s = throttle_s  # the reference's politeness sleep
        self.endpoint = endpoint or self.DEFAULT_ENDPOINT

    def fetch_tile(self, s: float, w: float, n: float, e: float) -> list[dict]:
        import json
        import time
        import urllib.parse
        import urllib.request

        # urllib (unlike the reference's requests) rejects literal brackets,
        # so the query payload is percent-encoded; semantics identical to
        # overpass_query_url's documented reference shape
        payload = urllib.parse.quote(f"[out:json];node({s},{w},{n},{e});<;out meta;")
        url = self.endpoint + "?data=" + payload
        time.sleep(self.throttle_s)
        try:
            with urllib.request.urlopen(url, timeout=self.timeout_s) as resp:
                data = json.loads(resp.read().decode("utf-8"))
        except (OSError, ValueError) as exc:  # no network / DNS / timeout / bad URL
            raise RuntimeError(
                f"Overpass fetch failed (offline environment?): {exc}"
            ) from exc
        return parse_overpass_elements(data.get("elements", []))

    def catalog(self, spark: SparkSession, segments: DataFrame) -> DataFrame:
        from .osm_link import segment_boxes

        # driver-side tile plan (bbox per segment wrapper), executor-side
        # fetch via mapInPandas would hammer the public API — tiles are
        # deduplicated to a coarse grid first and fetched sequentially with
        # the politeness throttle, matching the reference's access pattern.
        boxes = segment_boxes(segments, samples=0).collect()
        seen: set[tuple[float, float, float, float]] = set()
        rows: list[dict] = []
        for b in boxes:
            key = (round(b["s"], 2), round(b["w"], 2), round(b["n"], 2), round(b["e"], 2))
            if key in seen:
                continue
            seen.add(key)
            rows.extend(self.fetch_tile(*key))
        return spark.createDataFrame(rows, OSM_CATALOG_SCHEMA)
