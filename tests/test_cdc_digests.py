"""Pinned value digests for the 10 rows-only ``cdc_*`` driver queries.

The driver's oracle gate covers the SQL-expressible queries with DuckDB;
the CDC/geometry queries get rows-only checks there (no spatial oracle),
so silent semantic drift would otherwise be invisible.  The synthetic
warehouse is deterministic and seeded (entry_cdc.SEED), and every pinned
value is partition-count-independent, so these constants hold on any
machine: a digest change here means the fold/query SEMANTICS changed and
must be an intentional, reviewed edit.

``cdc_metrics`` is pinned on its per-epoch rollup (sums over partitions):
per-partition rows carry scheduler-dependent task ids and wall times.
"""

import pytest
from pyspark.sql import functions as F

from linked_maps_spark import entry_cdc
from linked_maps_spark.util import table_digest

SF = "/root/testdata/sf0.01"

PINNED = {
    "cdc_q1_edition": "a910e9db7384c35b039993e9191a02a65500f51cf5e23fe97a70ffb80c604b13",
    "cdc_q2_edition_unique": "a0c363785de57abcfd2afb07644322a0627b4daf4b1ac4f1d94f9a8118efcd00",
    "cdc_q3_persisted": "a226cb14b39ec828f74e60dd8477d3f714338ef6743e6c23b16e798e13101849",
    "cdc_q4_retired": "5fe1d65f93eb1744ec685e0a0ed7564753fbb53aacb08040d4403fe45668e74d",
    "cdc_q5_osm_links": "29ceb75b45b4a56b5683f3b06319312c4ab720e310becf88d9e4793574e18962",
    "cdc_classify": "b916c96968d0b9950d6f1c7dacc2f01992602ab01978dffd32d75facfd6d0465",
    "cdc_triples_by_predicate": "7fcf0da163adc616b7e49e5068cc48be34242dcb421e6a419ff9685329fccd29",
    "cdc_editions_fixpoint": "6897ae50634f64afc76905d40f3ccaa38ca3a3440fcda37a3bbb3b9077b6543d",
    "cdc_snap_offgrid": "61673d44d1ae67a34e96e92b290973021c44545453e3e92fcb74e730e4ce39aa",
}

QUERIES = {
    "cdc_q1_edition": entry_cdc.cdc_q1_edition,
    "cdc_q2_edition_unique": entry_cdc.cdc_q2_edition_unique,
    "cdc_q3_persisted": entry_cdc.cdc_q3_persisted,
    "cdc_q4_retired": entry_cdc.cdc_q4_retired,
    "cdc_q5_osm_links": entry_cdc.cdc_q5_osm_links,
    "cdc_classify": entry_cdc.cdc_classify,
    "cdc_triples_by_predicate": entry_cdc.cdc_triples_by_predicate,
    "cdc_editions_fixpoint": entry_cdc.cdc_editions_fixpoint,
    "cdc_snap_offgrid": entry_cdc.cdc_snap_offgrid,
}


@pytest.mark.parametrize("name", sorted(PINNED))
def test_cdc_query_digest_pinned(spark, name):
    assert table_digest(QUERIES[name](spark, SF)) == PINNED[name], name


def test_cdc_metrics_rollup_digest_pinned(spark):
    m = (
        entry_cdc.warehouse_engine(spark, SF)
        .read_metrics()
        .groupBy("epoch")
        .agg(
            F.sum("n_keys").alias("n_keys"),
            F.sum("n_segments").alias("n_segments"),
            F.sum("n_relations").alias("n_relations"),
        )
    )
    assert table_digest(m) == (
        "f05ad394bb28801295a15b01334d92f833b091eefc10e0e60c6c6baa8c5ae092"
    )
