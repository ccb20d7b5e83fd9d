"""linked_maps_spark — a PySpark-native CDC / incremental-ingest engine.

Re-derives the artifacts of usc-isi-i2/linked-maps (segmentation lattice,
partonomy DAG, RDF triples — see /root/reference) as an incremental,
exactly-once, schema-evolving lake-upsert pipeline:

    change_log WAL  ──►  per-(repo,path) segmentation fold (Arrow batches)
                    ──►  MERGE upsert into snapshot-versioned lake tables
                    ──►  queries Q1–Q5 / RDF triples / metrics

Spark-first design: DataFrame + Catalyst everywhere; the only Python on the
hot path is the vectorized per-key fold inside ``applyInPandas``.
"""

__version__ = "0.1.0"
