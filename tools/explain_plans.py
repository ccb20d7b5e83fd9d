"""Print formatted physical plans for the headline queries and grep them for
the scale-critical properties: pushed filters, pruned scans, broadcast joins,
whole-stage codegen spans.

Usage: python tools/explain_plans.py [sf_dir] [name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHECKS = {
    "pricing_summary": ["PushedFilters", "HashAggregate"],
    "top_orders_by_revenue": ["BroadcastHashJoin", "TakeOrderedAndProject"],
    "nation_revenue": ["BroadcastHashJoin", "PushedFilters"],
    "customers_without_orders": ["BroadcastHashJoin", "LeftAnti"],
    "event_sequencing": ["Window"],
    "dedup_exact": ["HashAggregate"],
    "similarity_cosine_topk": ["BroadcastNestedLoopJoin", "Window"],
    # round 2: single equi-join on exploded band values, cached signature
    # (InMemoryTableScan ×3 uses, zero lineage recompute); the equi-join is
    # AQE's choice (broadcast at test scale, shuffled/SMJ at 100 TB) — the
    # invariant is "a hash equi-join, never a nested-loop/cartesian"
    "dedup_minhash_lsh": ["InMemoryTableScan", "HashJoin"],
    # band-OR ANN: broadcast query side, exact re-rank window
    "similarity_ann_lsh": ["BroadcastHashJoin", "Window"],
    "dedup_embedding_cosine": ["HashJoin"],
    # corpus curation: pure per-row projections/filters over a column-pruned
    # scan ("!X" asserts absence) — the only Exchange allowed is the output
    # ORDER BY's range partitioning, never an aggregation/join shuffle
    "text_pii": ["ReadSchema: struct<doc_id:bigint,text:string>",
                 "!HashAggregate", "!HashJoin"],
    "corpus_split": ["ReadSchema: struct<doc_id:bigint,lang:string>",
                     "!HashAggregate", "!HashJoin"],
    # mixture apply: the per-source weights table must broadcast
    "corpus_mixture": ["BroadcastHashJoin", "!SortMergeJoin"],
    # round 4: grouped top-k must push the limit below the exchange
    "top_orders_per_priority": ["WindowGroupLimit"],
    # Q14 shape: part dim broadcast, never a sort-merge join
    "promo_revenue_share": ["BroadcastHashJoin", "!SortMergeJoin"],
    # classifier/URL scans stay single-pass projections (no join/agg)
    "text_quality_classifier": [
        "ReadSchema: struct<doc_id:bigint,text:string>", "!HashJoin"
    ],
    # sessionize + rollup share ONE user_id exchange: exactly one hash
    # Exchange in the plan besides the output ordering
    "event_session_stats": ["Window", "HashAggregate"],
    # prefix-filtered jaccard: candidate generation is hash equi-joins on
    # shingle/prefix keys — never a nested-loop/cartesian
    "dedup_jaccard_prefix": ["HashJoin", "!CartesianProduct",
                             "!BroadcastNestedLoopJoin"],
    # substring dedup: dup-seed counts come from a partial-agg groupBy (a
    # gram-partition Window would hot-spot boilerplate grams on one task);
    # coverage/lag are the only Windows (doc_id-partitioned)
    "dedup_substring": ["HashAggregate", "Window", "!CartesianProduct"],
    # ranked search: term postings filtered at the scan, idf broadcast,
    # global top-k as a heap (never a full sort)
    "text_search_topk": ["BroadcastHashJoin", "TakeOrderedAndProject",
                         "!SortMergeJoin"],
    # indexed search: same scoring tail; the scan reads the INDEX parquet
    # (term/doc_id/tf schema), not the documents table
    "text_search_indexed": ["TakeOrderedAndProject",
                            "ReadSchema: struct<term:string,doc_id:bigint,tf:bigint>"],
    # Q4 shape: EXISTS as a hash LeftSemi (residual date condition), one agg
    "late_order_priority_counts": ["LeftSemi", "HashAggregate",
                                   "!CartesianProduct"],
    # Q18 shape: HAVING keys semi-restrict the fact BEFORE re-aggregation;
    # global top-20 is a heap, never a full sort
    "large_volume_customers": ["LeftSemi", "TakeOrderedAndProject",
                               "BroadcastHashJoin"],
    # Q11 shape: the global total joins back as a broadcast single row
    "important_parts": ["BroadcastNestedLoopJoin", "HashAggregate",
                        "!SortMergeJoin"],
    # exact-size reservoir: per-stratum limit below the exchange
    "corpus_topn_sample": ["WindowGroupLimit",
                           "ReadSchema: struct<doc_id:bigint,lang:string>"],
    # DSIR: the 64-row score table broadcasts back to the token stream;
    # candidate arithmetic never cross-joins the corpus
    "corpus_dsir_weights": ["BroadcastHashJoin", "HashAggregate",
                            "!SortMergeJoin"],
    # DSIR selection: global top-k is a heap, never a full sort
    "corpus_dsir_sample": ["TakeOrderedAndProject", "BroadcastHashJoin"],
    # temperature rates broadcast back; corpus itself never shuffles
    "corpus_temperature_sample": ["BroadcastHashJoin", "!SortMergeJoin"],
    # chunking: a pure map-stage fan-out over a 2-column pruned scan — the
    # only Exchange allowed is the output ORDER BY's range partitioning
    "text_chunk_windows": ["ReadSchema: struct<doc_id:bigint,text:string>",
                           "Generate", "!HashAggregate", "!HashJoin"],
    # chunk planning aggregate: one partial-agg groupBy, still no join
    "text_chunk_stats": ["HashAggregate", "!HashJoin"],
    # round 5: TRAINED classifier scoring — training runs ahead of the
    # returned plan (driver-side weights), so scoring must stay the same
    # single-pass 2-column projection as the md5 classifier
    "text_quality_trained": [
        "ReadSchema: struct<doc_id:bigint,text:string>", "!HashJoin"
    ],
    # round 5: composed IVF+PQ from the persisted index — query-side probe
    # and LUT tables broadcast; ADC shortlist + exact re-rank are Windows
    "similarity_ann_ivfpq_indexed": ["BroadcastHashJoin", "Window",
                                     "!CartesianProduct"],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(CHECKS)

    from linked_maps_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("explain", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    failures = []
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        print(plan[:4000])
        for want in CHECKS.get(name, []):
            ok = want[1:] not in plan if want.startswith("!") else want in plan
            print(f"  [{'x' if ok else ' '}] {want}")
            if not ok:
                failures.append((name, want))
    if failures:
        print("\nMISSING PLAN PROPERTIES:", failures)
        sys.exit(1)
    print("\nall expected plan properties present")


if __name__ == "__main__":
    main()
