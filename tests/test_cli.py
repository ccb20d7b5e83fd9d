"""End-to-end test of the reference-parity CLI: segment → osm-link → graph
over a synthetic two-edition shapefile directory (the reference's own
pipeline shape: main.py → linked_maps_to_osm.py → generate_graph.py)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from linked_maps_spark import cli
from tests.test_shapefile import _write_shp


def _polyline_shp(path: str, xs, y0: float):
    """One horizontal PolyLine record along given x anchors at latitude y0
    (constant y ⇒ the two editions' snapped chains share a grid row, so
    the fold is guaranteed to produce derived lattice nodes)."""
    pts = [np.array([[x, y0] for x in xs])]
    _write_shp(path, [pts], shape_type=3)


@pytest.fixture(scope="module")
def shp_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("editions")
    # two editions of one sheet: 1900 covers x∈[0.00,0.03], 1910 shifts
    _polyline_shp(str(d / "1900c.shp"), [0.000, 0.010, 0.020, 0.030], 0.010)
    _polyline_shp(str(d / "1910c.shp"), [0.008, 0.018, 0.028, 0.038], 0.010)
    return str(d)


def test_cli_segment_osm_graph_pipeline(spark, shp_dir, tmp_path):
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({"dbname": "clidb", "geometry_type": "MULTILINESTRING"}))
    prefix = str(tmp_path / "line_seg")
    wh = str(tmp_path / "clidb_warehouse")

    rc = cli.main([
        "segment", "-d", shp_dir, "-c", str(cfg), "-r", "-o", prefix,
        "--warehouse", wh, "--pitch", "0.002", "--n-buckets", "2", "-v",
    ])
    assert rc == 0
    for suffix in (".geom.jl", ".seg.jl", ".rel.jl"):
        assert os.path.isdir(prefix + suffix)
    assert os.path.exists(os.path.join(wh, "origins.json"))

    from linked_maps_spark.jsonlines import read_jl

    geom, seg, rel = read_jl(spark, prefix)
    n_seg = geom.count()
    assert n_seg >= 3  # two editions + at least one derived lattice node
    assert seg.count() == n_seg
    assert rel.count() >= 2
    names = {r["name"] for r in seg.collect()}
    assert {"1900c", "1910c"} <= names
    assert any(n.startswith(("i_", "m_", "mu_")) for n in names)

    rc = cli.main(["osm-link", "-g", prefix, "-f", "railway"])
    assert rc == 0
    assert os.path.isdir(prefix + ".osm.jl")

    ttl = str(tmp_path / "out.ttl")
    rc = cli.main(["graph", "-g", prefix, "-l", "-o", ttl])
    assert rc == 0
    lines = []
    for part in os.listdir(ttl):
        if part.startswith("part-"):
            with open(os.path.join(ttl, part)) as fh:
                lines += [ln for ln in fh.read().splitlines() if ln]
    assert lines[0].startswith("@prefix")
    body = [ln for ln in lines if not ln.startswith("@prefix")]
    # every segment yields ≥6 triples (type×2, hasGeometry, created, date, wkt)
    assert len(body) >= 6 * n_seg
    assert any("sfContains" in ln for ln in body)
    assert any("dcterms:date" in ln or "date" in ln for ln in body)


def test_cli_report_from_warehouse(spark, shp_dir, tmp_path):
    prefix = str(tmp_path / "ls")
    wh = str(tmp_path / "wh")
    assert cli.main(["segment", "-d", shp_dir, "-o", prefix, "--warehouse", wh,
                     "-r", "--n-buckets", "2"]) == 0
    out = str(tmp_path / "report.html")
    assert cli.main(["report", "--warehouse", wh, "--n-buckets", "2",
                     "-o", out]) == 0
    html = open(out).read()
    assert "<svg" in html and "1 edition (1900)" in html
    assert "Change classification (1900 → 1910)" in html


def test_cli_segment_polygon_mode(spark, tmp_path):
    """MULTIPOLYGON config routes the shapefile reader + snap + fold through
    the polygon algebra (P7 dispatch) end-to-end from the CLI."""
    import json as _json

    from tests.test_shapefile import _sq

    d = tmp_path / "polys"
    d.mkdir()
    _write_shp(str(d / "1900c.shp"), [[_sq(0.000, 0.000, 0.020)]])
    _write_shp(str(d / "1910c.shp"), [[_sq(0.008, 0.000, 0.020)]])
    cfg = tmp_path / "config.json"
    cfg.write_text(_json.dumps({"dbname": "pg", "geometry_type": "MULTIPOLYGON"}))
    prefix = str(tmp_path / "poly_seg")
    assert cli.main(["segment", "-d", str(d), "-c", str(cfg), "-r",
                     "-o", prefix, "--warehouse", str(tmp_path / "pwh"),
                     "--n-buckets", "2"]) == 0
    from linked_maps_spark.jsonlines import read_jl

    geom, seg, _rel = read_jl(spark, prefix)
    wkts = {r["name"]: r for r in seg.join(geom, "gid").collect()}
    assert {"1900c", "1910c"} <= set(wkts)
    assert all(r["wkt"].startswith("MULTIPOLYGON") for r in wkts.values())
    # overlapping squares → an intersection node exists
    assert any(n.startswith("i_") for n in wkts)


def test_cli_query_and_maintain(spark, shp_dir, tmp_path, capsys):
    prefix = str(tmp_path / "ls")
    wh = str(tmp_path / "wh")
    assert cli.main(["segment", "-d", shp_dir, "-o", prefix, "--warehouse", wh,
                     "-r", "--n-buckets", "2"]) == 0
    capsys.readouterr()
    assert cli.main(["query", "q3", "--warehouse", wh, "--n-buckets", "2",
                     "--year1", "1900", "--year2", "1910"]) == 0
    out = [json.loads(ln) for ln in capsys.readouterr().out.splitlines() if ln]
    assert out and all("gid" in r and "wkt" in r for r in out)
    assert cli.main(["query", "classify", "--warehouse", wh, "--n-buckets", "2",
                     "--year1", "1900", "--year2", "1910"]) == 0
    kinds = {json.loads(ln)["change_kind"]
             for ln in capsys.readouterr().out.splitlines() if ln}
    assert kinds <= {"persisted", "added", "retired", "modified", "unchanged"} and kinds
    with pytest.raises(SystemExit):
        cli.main(["query", "q3", "--warehouse", wh, "--year1", "1900"])
    assert cli.main(["maintain", "--warehouse", wh, "--n-buckets", "2"]) == 0
    # optional maintenance: key blooms + sort-clustering, digests unchanged
    from linked_maps_spark.ingest import CdcEngine
    from linked_maps_spark.util import table_digest

    eng = CdcEngine(spark, wh, n_buckets=2)
    before = table_digest(eng.segments.read())
    assert cli.main(["maintain", "--warehouse", wh, "--n-buckets", "2",
                     "--bloom-keys", "--cluster-by", "gid"]) == 0
    eng = CdcEngine(spark, wh, n_buckets=2)
    assert eng.segments.snapshot()["operation"] in ("cluster", "analyze")
    assert any(f.get("blooms") for f in eng.segments.snapshot()["files"])
    assert table_digest(eng.segments.read()) == before


def test_cli_ingest_batch_equals_stream(spark, tmp_path):
    """The generic WAL subcommand: batch and --stream drains of the same
    parquet WAL produce identical warehouse state (exactly-once contract),
    from the CLI surface."""
    from linked_maps_spark.changelog import synth_change_log, to_spark
    from linked_maps_spark.ingest import CdcEngine

    wal_dir = str(tmp_path / "wal")
    to_spark(spark, synth_change_log(n_keys=4, n_commits=4, seed=11)).write.parquet(wal_dir)

    wb, ws = str(tmp_path / "wh_batch"), str(tmp_path / "wh_stream")
    assert cli.main(["ingest", "--wal", wal_dir, "--warehouse", wb, "-r",
                     "--n-buckets", "2", "--commits-per-epoch", "2",
                     "--vacuum"]) == 0
    assert cli.main(["ingest", "--wal", wal_dir, "--warehouse", ws, "-r",
                     "--n-buckets", "2", "--commits-per-epoch", "2",
                     "--stream"]) == 0

    def state(wh):
        eng = CdcEngine(spark, wh, n_buckets=2)
        return {(r["gid"], r["content_sha256"])
                for r in eng.current_segments().collect()}

    sb, ss = state(wb), state(ws)
    assert sb and sb == ss
    # replaying the same WAL in batch mode is a watermark no-op
    assert cli.main(["ingest", "--wal", wal_dir, "--warehouse", wb,
                     "--n-buckets", "2", "--commits-per-epoch", "2"]) == 0
    assert state(wb) == sb


def test_cli_segment_adds_new_region_tile_without_reset(spark, shp_dir, tmp_path):
    """A second shapefile directory ingested into an existing warehouse gets
    its own snap origin merged into origins.json (existing keys keep their
    persisted origin — grid ids must never shift)."""
    import json as _json

    d2 = tmp_path / "editions2"
    d2.mkdir()
    # a far-away region tile (different lat band)
    _polyline_shp(str(d2 / "1900c.shp"), [3.000, 3.010, 3.020], 2.000)
    _polyline_shp(str(d2 / "1910c.shp"), [3.004, 3.014, 3.024], 2.000)

    prefix, wh = str(tmp_path / "ls"), str(tmp_path / "wh")
    assert cli.main(["segment", "-d", shp_dir, "-o", prefix, "--warehouse", wh,
                     "-r", "--n-buckets", "2"]) == 0
    o1 = _json.loads(open(wh + "/origins.json").read())
    assert cli.main(["segment", "-d", str(d2), "-o", prefix, "--warehouse", wh,
                     "--n-buckets", "2"]) == 0
    o2 = _json.loads(open(wh + "/origins.json").read())
    assert set(o2) == set(o1) | {"editions2"}
    for k, v in o1.items():
        assert o2[k] == v  # persisted origins untouched


def test_cli_ingest_snap_reuses_persisted_origins(spark, tmp_path):
    """ingest --snap must honor the warehouse's origins.json: a later WAL
    slice with a different bounding box reuses the first slice's origin, so
    the two editions land on the same grid and the fold links them."""
    import json as _json

    def wal_df(commit, x0):
        content = f"LINESTRING ({x0:.6f} 1.000000, {x0 + 0.040:.6f} 1.000000)"
        return spark.createDataFrame(
            [("r", "sheet", commit, "wkt", content)],
            "repo string, path string, commit string, lang string, content string",
        )

    w1, w2 = str(tmp_path / "wal1"), str(tmp_path / "wal2")
    wal_df("1900c", 2.000).write.parquet(w1)
    wal_df("1910c", 2.016).write.parquet(w2)  # shifted box, overlapping line
    wh = str(tmp_path / "wh")
    assert cli.main(["ingest", "--wal", w1, "--warehouse", wh, "-r", "--snap",
                     "--n-buckets", "2"]) == 0
    o1 = _json.loads(open(wh + "/origins.json").read())
    assert cli.main(["ingest", "--wal", w2, "--warehouse", wh, "--snap",
                     "--n-buckets", "2"]) == 0
    o2 = _json.loads(open(wh + "/origins.json").read())
    assert o1 == o2  # second slice reused the persisted origin
    from linked_maps_spark.ingest import CdcEngine

    eng = CdcEngine(spark, wh, n_buckets=2)
    names = {r["name"] for r in eng.current_segments().collect()}
    # same grid ⇒ the editions overlap and the fold produced an i_ node
    assert any(n.startswith("i_") for n in names), names


def test_cli_ingest_snap_stream_rejected(tmp_path):
    with pytest.raises(SystemExit, match="snap"):
        cli.main(["ingest", "--wal", str(tmp_path), "--warehouse",
                  str(tmp_path / "wh"), "--snap", "--stream"])


def test_cli_segment_is_incremental_without_reset(spark, shp_dir, tmp_path):
    """Second run without -r reuses the warehouse and persisted origins
    (the snap-state contract): same WAL replayed → identical segment set."""
    prefix = str(tmp_path / "ls")
    wh = str(tmp_path / "wh")
    assert cli.main(["segment", "-d", shp_dir, "-o", prefix, "--warehouse", wh,
                     "--n-buckets", "2"]) == 0
    from linked_maps_spark.jsonlines import read_jl

    first = {r["gid"] for r in read_jl(spark, prefix)[0].collect()}
    # replay: commit-log watermark makes re-ingest a no-op, origins reloaded
    assert cli.main(["segment", "-d", shp_dir, "-o", prefix, "--warehouse", wh,
                     "--n-buckets", "2"]) == 0
    second = {r["gid"] for r in read_jl(spark, prefix)[0].collect()}
    assert first == second


def test_cli_curate_batch_and_stream(spark, tmp_path):
    """curate: exact dedup with deterministic batch keeper (min doc_id),
    --drop-pii filter, and the --stream drain producing the same hash set."""
    from linked_maps_spark.streaming import DOCS_SCHEMA

    land = str(tmp_path / "docs")
    rows = [(i, f"text number {i % 8}", "en", "s0", 5) for i in range(12)]
    rows.append((20, "mail a@b.co now", "en", "s0", 5))
    spark.createDataFrame(rows, DOCS_SCHEMA).write.parquet(land)

    out_b = str(tmp_path / "out_b")
    assert cli.main(["curate", "--docs", land, "--out", out_b]) == 0
    got = spark.read.parquet(out_b)
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(8)) + [20]
    row20 = got.filter("doc_id = 20").collect()[0]
    assert row20["n_pii"] == 1 and row20["split"] in ("train", "heldout", "test")

    out_p = str(tmp_path / "out_p")
    assert cli.main(["curate", "--docs", land, "--out", out_p, "--drop-pii"]) == 0
    assert sorted(r["doc_id"] for r in spark.read.parquet(out_p).collect()) == list(range(8))

    out_s = str(tmp_path / "out_s")
    assert cli.main(["curate", "--docs", land, "--out", out_s, "--stream"]) == 0
    stream_df = spark.read.parquet(out_s)
    assert set(stream_df.columns) == set(got.columns)  # schema parity with batch
    stream_hashes = {r["content_md5"] for r in stream_df.collect()}
    assert stream_hashes == {r["content_md5"] for r in got.collect()}

    # --drop-pii applies in stream mode too (before dedup)
    out_sp = str(tmp_path / "out_sp")
    assert cli.main(["curate", "--docs", land, "--out", out_sp,
                     "--stream", "--drop-pii"]) == 0
    assert all(r["n_pii"] == 0 for r in spark.read.parquet(out_sp).collect())
