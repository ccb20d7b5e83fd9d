"""Reference-parity command line: the three entry points a linked-maps user
runs today, re-expressed over the Spark engine.

    reference                                   engine analog
    --------------------------------------      ------------------------------
    python main.py -d DIR -c config.json        python -m linked_maps_spark
        -r -o line_seg.jl                           segment -d DIR -c config.json
                                                    -r -o line_seg
    python linked_maps_to_osm.py                python -m linked_maps_spark
        -g line_seg.geom.jl -f railway              osm-link -g line_seg -f railway
    python generate_graph.py -g -s -r -l        python -m linked_maps_spark
        -o linked_maps.maps.ttl                     graph -g line_seg -l
                                                    -o linked_maps.maps.ttl

Differences, all deliberate:

* ``-g`` (and the implied ``-s``/``-r``/``-l``) take the shared JL *prefix*
  rather than four file paths — the exporter (jsonlines.export_jl) writes
  ``<prefix>.{geom,seg,rel,osm}.jl`` exactly like main.py:158-160 and
  linked_maps_to_osm.py:248, so one prefix names the whole set.
* The reference's config.json PostGIS fields map onto the lake warehouse:
  ``dbname`` → warehouse directory (unless ``--warehouse`` overrides),
  ``geometry_type`` MULTILINESTRING/MULTIPOLYGON → the engine geom type;
  connection fields (user/host/SRID) have no Spark analog and are ignored.
* ``graph`` re-derives each node's edition set by the same parent→child
  date propagation the reference runs (generate_graph.py:73-75, here the
  relational fixpoint triples.propagate_editions_fixpoint), and uses the
  max inherited edition year as the deterministic ``dcterms:created``
  stand-in — the reference writes wall-clock ``datetime.today()``
  (generate_graph.py:48), which no two runs reproduce; determinism is the
  better contract.
* Snap origins are derived once per warehouse (snap.derive_origins, keyed
  by WAL path = one region tile per shapefile directory) and persisted to
  ``<warehouse>/origins.json`` — re-running an ingest reuses them so grid
  ids never fork (the state contract in snap.py).
"""

from __future__ import annotations

import argparse
import json
import os


def _spark(cores: str | int | None = None):
    from .session import get_spark

    return get_spark("linked-maps-cli", cores=cores)


def cmd_segment(args: argparse.Namespace) -> int:
    from . import geometry as G
    from .ingest import CdcEngine
    from .jsonlines import export_jl
    from .shapefile import shp_dir_change_log
    from .snap import ensure_origins, snap_change_log

    cfg = {}
    if args.config_file:
        with open(args.config_file) as fh:
            cfg = json.load(fh)
    gtype_s = str(cfg.get("geometry_type", "MULTILINESTRING")).upper()
    geom_type = G.POLYGON if "POLYGON" in gtype_s else G.LINE
    warehouse = os.path.abspath(
        args.warehouse or cfg.get("dbname", "linkedmaps") + "_warehouse"
    )

    spark = _spark(args.cores)
    wal = shp_dir_change_log(spark, args.dir_name)

    eng = CdcEngine(spark, warehouse, geom_type=geom_type, n_buckets=args.n_buckets)
    fresh = args.reset_db or not os.path.exists(os.path.join(warehouse, "segments"))
    if fresh:
        eng.create_tables(overwrite=True)

    if getattr(args, "origin", None):
        origins = None
        snapped = snap_change_log(
            wal, geom_type=geom_type, pitch=args.pitch,
            origin=tuple(args.origin),
        )
    else:
        origins = ensure_origins(wal, warehouse, pitch=args.pitch, fresh=fresh)
        snapped = snap_change_log(
            wal, geom_type=geom_type, pitch=args.pitch,
            origins=origins, origin_key="path",
        )
    eng.ingest(snapped, commits_per_epoch=args.commits_per_epoch)
    seg = eng.current_segments()
    rel = eng.relations.read()
    export_jl(seg, rel, args.output_file)
    if args.debug_prints:
        print(f"warehouse: {warehouse} (geom_type={geom_type})")
        if origins is None:
            print(f"origin: pinned at {tuple(args.origin)}")
        else:
            print(
                f"origins: {len(origins)} region tile(s) -> "
                f"{os.path.join(warehouse, 'origins.json')}"
            )
    print(
        f"segment: {seg.count()} segments, {rel.count()} relations "
        f"-> {args.output_file}.{{geom,seg,rel}}.jl"
    )
    return 0


def cmd_osm_link(args: argparse.Namespace) -> int:
    from .jsonlines import osm_jl, read_jl
    from .osm_link import link_osm
    from .osm_source import HttpOverpass, SyntheticOverpass

    spark = _spark(args.cores)
    geom, _seg, _rel = read_jl(spark, args.geometry_file)
    source = (
        HttpOverpass(endpoint=args.endpoint)
        if args.endpoint
        else SyntheticOverpass(seed=args.seed)
    )
    catalog = source.catalog(spark, geom)
    links = link_osm(geom, catalog, filter_tag=args.filtering_key).persist()
    out = (args.output_file or args.geometry_file) + ".osm.jl"
    osm_jl(links).write.mode("overwrite").json(out)
    n = links.count()  # served from the persisted write, not a re-link
    links.unpersist()
    print(f"osm-link: {n} segments linked (tag={args.filtering_key!r}) -> {out}")
    return 0


def cmd_graph(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from .jsonlines import read_jl
    from .triples import build_triples, propagate_editions_fixpoint, write_turtle

    spark = _spark(args.cores)
    if args.osm_uris:
        geom, segm, rel, osm = read_jl(spark, args.geometry_file, with_osm=True)
    else:
        geom, segm, rel = read_jl(spark, args.geometry_file)
        osm = None
    segments = geom.join(segm, "gid")
    eds = (
        propagate_editions_fixpoint(segments, rel)
        .groupBy("gid")
        .agg(F.array_sort(F.collect_set("edition")).alias("editions"))
    )
    seg_full = (
        segments.join(eds, "gid", "left")
        .withColumn(
            "editions",
            F.coalesce("editions", F.array().cast("array<string>")),
        )
        # deterministic created: latest inherited edition year (see module
        # docstring; the reference writes wall-clock datetime.today())
        .withColumn(
            "commit_created",
            F.coalesce(F.array_max("editions"), F.substring("name", 1, 4)),
        )
    )
    triples = build_triples(seg_full, rel, osm).persist()
    write_turtle(triples, args.output_file)
    n = triples.count()  # served from the persisted write, not a re-derive
    triples.unpersist()
    print(f"graph: {n} triples -> {args.output_file}")
    return 0


def cmd_report(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from .report import write_report

    eng = _open_engine(args)
    geom_type = eng.geom_type
    seg = eng.current_segments()
    rel = eng.relations.read()
    years = sorted(
        r["y"]
        for r in seg.filter(~F.col("name").contains("_"))
        .select(F.substring("name", 1, 4).alias("y"))
        .distinct()
        .collect()
    )
    if not years:
        print("report: warehouse holds no edition segments")
        return 1
    y1 = args.year1 or years[0]
    y2 = args.year2 or years[-1]
    write_report(args.output_file, seg, rel, y1, y2, geom_type=geom_type)
    print(f"report: editions {y1} → {y2} -> {args.output_file}")
    return 0


def _open_engine(args: argparse.Namespace):
    from . import geometry as G
    from .ingest import CdcEngine

    cfg = {}
    if getattr(args, "config_file", None):
        with open(args.config_file) as fh:
            cfg = json.load(fh)
    gtype_s = str(cfg.get("geometry_type", "MULTILINESTRING")).upper()
    geom_type = G.POLYGON if "POLYGON" in gtype_s else G.LINE
    spark = _spark(args.cores)
    return CdcEngine(
        spark, os.path.abspath(args.warehouse),
        geom_type=geom_type, n_buckets=args.n_buckets,
        on_error=getattr(args, "on_error", "raise"),
    )


def cmd_query(args: argparse.Namespace) -> int:
    """The reference UI's query dropdown (ui/main.py:23-78) from the shell:
    q1..q5 over a segment-built warehouse, JSON-lines to stdout."""
    from .osm_link import link_osm, synth_osm_catalog
    from .queries import (
        classify_changes, q1_edition, q2_edition_unique, q3_persisted,
        q4_retired, q5_persisted_with_osm,
    )

    eng = _open_engine(args)
    seg = eng.current_segments()
    rel = eng.relations.read()
    y1, y2 = args.year1, args.year2
    if args.query not in ("q1", "q2") and not y2:
        raise SystemExit(f"query {args.query} needs --year2")
    if args.query == "q1":
        df = q1_edition(seg, rel, y1)
    elif args.query == "q2":
        df = q2_edition_unique(seg, rel, y2 or y1)
    elif args.query == "q3":
        df = q3_persisted(seg, rel, y1, y2)
    elif args.query == "q4":
        df = q4_retired(seg, rel, y1, y2)
    elif args.query == "q5":
        links = link_osm(seg, synth_osm_catalog(eng.spark, seg))
        df = q5_persisted_with_osm(seg, rel, links, y1, y2)
    else:
        df = classify_changes(seg, rel, y1, y2)
    for row in df.limit(args.limit).toJSON().collect():
        print(row)
    return 0


def cmd_ingest(args: argparse.Namespace) -> int:
    """Generic WAL ingest (the engine's native input_hint shape): a parquet
    directory of change events → the lake warehouse, batch
    (``CdcEngine.ingest``) or incremental Structured Streaming
    (``--stream``: readStream + foreachBatch with source checkpointing —
    redelivered micro-batches are deduplicated by the commit-log watermark,
    so the pair is exactly-once at the table level)."""
    from .snap import ensure_origins, snap_change_log

    if args.snap and args.stream:
        raise SystemExit("--snap with --stream is not supported; snap the WAL "
                         "in batch mode (or pre-snap the stream source)")
    eng = _open_engine(args)
    warehouse = os.path.abspath(args.warehouse)
    fresh = args.reset_db or not os.path.exists(os.path.join(warehouse, "segments"))
    if fresh:
        eng.create_tables(overwrite=True)
    # dead_letter is cumulative across runs; snapshot the count up front so
    # the report below reflects THIS run's quarantines, not history (a
    # pre-quarantine warehouse has no table yet — ingest lazily creates it)
    from .lakehouse import LakeTable

    dead_before = (
        eng.read_dead_letter().count()
        if eng.on_error == "quarantine"
        and LakeTable(eng.spark, os.path.join(warehouse, "dead_letter")).exists()
        else 0
    )
    if args.stream:
        from .streaming import stream_ingest

        ckpt = args.checkpoint or os.path.join(warehouse, "_stream_checkpoint")
        stream_ingest(eng, args.wal, ckpt, commits_per_epoch=args.commits_per_epoch)
    else:
        wal = eng.spark.read.parquet(args.wal)
        if args.snap:
            # honor the warehouse's persisted snap state (ensure_origins:
            # existing keys keep their origin, new keys derive one)
            origins = ensure_origins(
                wal, warehouse, pitch=args.pitch, fresh=fresh
            )
            wal = snap_change_log(
                wal, geom_type=eng.geom_type, pitch=args.pitch,
                origins=origins, origin_key="path",
            )
        eng.ingest(wal, commits_per_epoch=args.commits_per_epoch)
    if args.vacuum:
        eng.maintain()
    n = eng.current_segments().count()
    print(f"ingest: watermark={eng.watermark()}, {n} current segments in {warehouse}")
    if eng.on_error == "quarantine":
        nd = eng.read_dead_letter().count() - dead_before
        if nd:
            print(f"ingest: {nd} poison event(s) quarantined to dead_letter")
    return 0


def cmd_maintain(args: argparse.Namespace) -> int:
    """Post-ingest table maintenance: commit-log/metrics compaction and
    snapshot expiry (the lake analog of VACUUM)."""
    eng = _open_engine(args)
    eng.maintain(keep_snapshots=args.keep_snapshots,
                 max_log_files=args.max_log_files,
                 max_files_per_bucket=(
                     args.max_files_per_bucket
                     if args.max_files_per_bucket > 0 else None
                 ))
    if getattr(args, "cluster_by", None):
        eng.segments.cluster_files([args.cluster_by])
        print(f"maintain: segments clustered by {args.cluster_by}")
    if getattr(args, "zorder_by", None):
        cols = [c.strip() for c in args.zorder_by.split(",")]
        eng.segments.cluster_files(cols, zorder=True)
        print(f"maintain: segments z-order clustered by {cols}")
    if getattr(args, "bloom_keys", False):
        for tbl in (eng.segments, eng.relations):
            tbl.analyze(bloom_cols=tbl.snapshot()["key_cols"])
        print("maintain: key blooms built for segments/relations")
    print(f"maintain: compacted logs, kept ≤{args.keep_snapshots} snapshots "
          f"per table under {os.path.abspath(args.warehouse)}")
    return 0


def cmd_curate(args: argparse.Namespace) -> int:
    """Corpus curation pipeline: documents parquet → annotated,
    exact-deduped corpus parquet (content hash, token count, PII total,
    train/heldout/test split), batch or incremental (``--stream``).

    Both modes emit the same schema (full document columns + annotations)
    and apply ``--drop-pii`` BEFORE dedup, so a PII-bearing keeper never
    shadows a clean duplicate.  Batch keeps the deterministic keeper (min
    doc_id) per content hash; the streaming path keeps the first-arrival
    doc and its checkpoint state drops duplicates across later arrivals
    (streaming.stream_curate)."""
    from pyspark.sql import Window, functions as F

    spark = _spark(args.cores)
    out = os.path.abspath(args.out)
    if args.stream:
        from .streaming import stream_curate

        ckpt = args.checkpoint or out + "_stream_checkpoint"
        cur = stream_curate(spark, args.docs, ckpt, out, drop_pii=args.drop_pii)
        n = cur.count()
    else:
        from .sampling import split_expr
        from .textops import curation_columns

        cur = spark.read.parquet(args.docs)
        for name, col in curation_columns().items():
            cur = cur.withColumn(name, col)
        cur = cur.withColumn("split", split_expr())
        if args.drop_pii:
            cur = cur.filter(F.col("n_pii") == 0)
        win = Window.partitionBy("content_md5").orderBy("doc_id")
        cur = (
            cur.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        cur.write.mode("overwrite").parquet(out)
        n = spark.read.parquet(out).count()
    print(f"curate: {n} docs -> {out}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m linked_maps_spark",
        description=__doc__.split("\n\n")[0],
    )
    ap.add_argument("--cores", default=None, help="local[N] override")
    sub = ap.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("segment", help="main.py analog: shapefiles -> fold -> JL")
    sp.add_argument("-d", "--dir_name", required=True,
                    help="Directory path with edition shapefiles.")
    sp.add_argument("-c", "--config_file", default=None,
                    help="Reference-format config.json (dbname, geometry_type).")
    sp.add_argument("-o", "--output_file", default="line_seg",
                    help="Output JL prefix (writes <prefix>.{geom,seg,rel}.jl).")
    sp.add_argument("-v", "--debug_prints", action="store_true")
    sp.add_argument("-r", "--reset_db", action="store_true",
                    help="Reset the warehouse prior to processing.")
    sp.add_argument("--warehouse", default=None,
                    help="Lake warehouse dir (default <dbname>_warehouse).")
    sp.add_argument("--pitch", type=float, default=0.002,
                    help="Snap grid pitch in degrees.")
    sp.add_argument("--origin", type=float, nargs=2, default=None,
                    metavar=("LON", "LAT"),
                    help="Pin the snap-grid origin instead of deriving "
                         "per-region tile origins — grid alignment moves "
                         "which near-coincident features land in the same "
                         "cell, so parity work wants it reproducible.")
    sp.add_argument("--n-buckets", type=int, default=8)
    sp.add_argument("--commits-per-epoch", type=int, default=4)
    sp.set_defaults(fn=cmd_segment)

    op = sub.add_parser("osm-link", help="linked_maps_to_osm.py analog")
    op.add_argument("-g", "--geometry_file", required=True,
                    help="JL prefix from `segment` (reads <prefix>.geom.jl).")
    op.add_argument("-f", "--filtering_key", default="railway",
                    help="OSM tag to filter by.")
    op.add_argument("-o", "--output_file", default=None,
                    help="Output JL prefix (default: same as -g).")
    op.add_argument("--endpoint", default=None,
                    help="Overpass API URL; omitted -> deterministic synthetic catalog.")
    op.add_argument("--seed", type=int, default=4)
    op.set_defaults(fn=cmd_osm_link)

    gp = sub.add_parser("graph", help="generate_graph.py analog: JL -> Turtle")
    gp.add_argument("-g", "--geometry_file", required=True,
                    help="JL prefix (reads <prefix>.{geom,seg,rel}.jl).")
    gp.add_argument("-l", "--osm_uris", action="store_true",
                    help="Also read <prefix>.osm.jl and emit sfOverlaps links.")
    gp.add_argument("-o", "--output_file", default="linked_maps.maps.ttl")
    gp.set_defaults(fn=cmd_graph)

    rp = sub.add_parser(
        "report", help="UI analog: warehouse -> HTML/SVG query report"
    )
    rp.add_argument("--warehouse", required=True,
                    help="Lake warehouse dir written by `segment`.")
    rp.add_argument("-c", "--config_file", default=None,
                    help="Reference-format config.json (geometry_type).")
    rp.add_argument("--year1", default=None,
                    help="First edition year (default: earliest in warehouse).")
    rp.add_argument("--year2", default=None,
                    help="Second edition year (default: latest in warehouse).")
    rp.add_argument("-o", "--output_file", default="report.html")
    rp.add_argument("--n-buckets", type=int, default=8)
    rp.set_defaults(fn=cmd_report)

    qp = sub.add_parser("query", help="UI query dropdown: q1..q5/classify -> JSON lines")
    qp.add_argument("query", choices=["q1", "q2", "q3", "q4", "q5", "classify"])
    qp.add_argument("--warehouse", required=True)
    qp.add_argument("-c", "--config_file", default=None)
    qp.add_argument("--year1", required=True)
    qp.add_argument("--year2", default=None)
    qp.add_argument("--limit", type=int, default=10000)
    qp.add_argument("--n-buckets", type=int, default=8)
    qp.set_defaults(fn=cmd_query)

    ip = sub.add_parser("ingest", help="generic parquet WAL -> warehouse (batch or --stream)")
    ip.add_argument("--wal", required=True,
                    help="Parquet directory of change events (repo, path, commit, content, ...).")
    ip.add_argument("--warehouse", required=True)
    ip.add_argument("-c", "--config_file", default=None)
    ip.add_argument("-r", "--reset_db", action="store_true")
    ip.add_argument("--stream", action="store_true",
                    help="Structured Streaming incremental drain (availableNow).")
    ip.add_argument("--checkpoint", default=None,
                    help="Stream checkpoint dir (default <warehouse>/_stream_checkpoint).")
    ip.add_argument("--snap", action="store_true",
                    help="Snap-round arbitrary-coordinate WKT content first.")
    ip.add_argument("--pitch", type=float, default=0.002)
    ip.add_argument("--vacuum", action="store_true",
                    help="Run maintain() after the ingest.")
    ip.add_argument("--commits-per-epoch", type=int, default=8)
    ip.add_argument("--n-buckets", type=int, default=8)
    ip.add_argument("--on-error", choices=["raise", "quarantine"], default="raise",
                    dest="on_error",
                    help="poison-event policy: abort the epoch (default) or "
                         "skip the event and record it in the dead_letter "
                         "table with the parse error")
    ip.set_defaults(fn=cmd_ingest)

    cp = sub.add_parser(
        "curate", help="documents parquet -> annotated, deduped corpus (batch or --stream)"
    )
    cp.add_argument("--docs", required=True, help="input documents parquet dir")
    cp.add_argument("--out", required=True, help="output parquet dir")
    cp.add_argument("--stream", action="store_true",
                    help="incremental Structured Streaming drain (availableNow)")
    cp.add_argument("--checkpoint", default=None,
                    help="stream checkpoint dir (default: <out>_stream_checkpoint)")
    cp.add_argument("--drop-pii", action="store_true",
                    help="drop docs with any PII hit (before dedup)")
    cp.set_defaults(fn=cmd_curate)

    mp = sub.add_parser("maintain", help="compact logs / expire snapshots (VACUUM analog)")
    mp.add_argument("--warehouse", required=True)
    mp.add_argument("-c", "--config_file", default=None)
    mp.add_argument("--keep-snapshots", type=int, default=4)
    mp.add_argument("--max-log-files", type=int, default=8)
    mp.add_argument("--max-files-per-bucket", type=int, default=8,
                    help="binpack-compact data buckets fragmented past this "
                         "many files (rewrite_data_files binpack analog); "
                         "0 disables compaction")
    mp.add_argument("--n-buckets", type=int, default=8)
    mp.add_argument("--bloom-keys", action="store_true",
                    help="build per-file bloom filters on the merge key "
                         "(gid point lookups skip files; amortized reads)")
    mp.add_argument("--cluster-by", default=None,
                    help="rewrite segments range-clustered by this column "
                         "(rewrite_data_files sort strategy)")
    mp.add_argument("--zorder-by", default=None,
                    help="two comma-separated integer columns: rewrite "
                         "segments along the Morton curve (OPTIMIZE ZORDER "
                         "analog) so both columns' file stats prune")
    mp.set_defaults(fn=cmd_maintain)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
