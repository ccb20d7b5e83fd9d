"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full CDC pipeline (synthetic WAL → per-key
segmentation fold → lake MERGE → change classification) at sf0.001 scale.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator family
from SURVEY.md §2 (+ the training-data operators).  Relational / dedup /
similarity / text / multimodal entries carry exact DuckDB oracles; the
geometry-bearing CDC entries are rows-only (not SQL-expressible without a
spatial engine — FIXTURES.md §5), their value-level correctness is covered by
the pytest suite.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from linked_maps_spark import (
    bpe,
    chunking,
    dedup,
    dedup_index,
    entry_cdc,
    multimodal,
    relational,
    sampling,
    similarity,
    sketch,
    temporal,
    text_index,
    textops,
    vec_index,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entry_cdc.flagship(spark, "/root/testdata/sf0.001")


def _doc(table: str = "documents"):
    def wrap(fn):
        def q(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(relational.load(spark, sf_dir, table))

        return q

    return wrap


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    # relational operator suite (SURVEY.md §2.2–§2.8 analogs)
    q.update(relational.QUERIES)
    # temporal custom operators: as-of join (union-tag + window), binned
    # range join, hypertable rollup — oracled by DuckDB's native ASOF
    # JOIN / IEJoin / direct-from-raw recompute respectively
    q.update(temporal.QUERIES)
    # mergeable sketches (HLL registers, Count-Min): driver queries build
    # from disjoint shards + merge; oracles build single-pass — the gate's
    # hash equality proves mergeability
    q.update(sketch.QUERIES)
    # training-data ops: dedup family
    q["dedup_exact"] = _doc()(dedup.dedup_exact)
    q["dedup_ngram_jaccard"] = _doc()(lambda d: dedup.dedup_ngram_jaccard(d, threshold=0.5))
    q["dedup_clusters"] = _doc()(lambda d: dedup.dedup_clusters(d, threshold=0.5))
    q["dedup_apply"] = _doc()(lambda d: dedup.dedup_apply(d, threshold=0.5))
    q["dedup_minhash_lsh"] = _doc()(dedup.dedup_minhash_lsh)
    # production cadence: new batch deduped AGAINST the persisted corpus
    # index (signatures read from a LakeTable, batch-only shingle explode)
    q["dedup_minhash_incremental"] = dedup_index.driver_dedup_incremental
    q["dedup_simhash"] = _doc()(dedup.simhash)
    # benchmark decontamination: deterministic corpus/benchmark split of
    # the fixture (doc_id % 17), identical predicate in the SQL oracle
    q["dedup_decontaminate"] = _doc()(
        lambda d: dedup.decontaminate(
            d.filter("doc_id % 17 != 0"), d.filter("doc_id % 17 = 0")
        )
    )
    # corpus-level duplicate-line removal; the fixture is single-line, so
    # both engines first line-ize it identically (literal ' a ' → newline,
    # the text_repetition convention)
    q["dedup_lines"] = _doc()(
        lambda d: dedup.dedup_lines(
            d.withColumn("text", F.replace("text", F.lit(" a "), F.lit("\n")))
        )
    )
    # exact-Jaccard pairs again, but candidates from AllPairs/PPJoin prefix
    # filtering (the scale path that never alters similarity values)
    q["dedup_jaccard_prefix"] = _doc()(dedup.dedup_jaccard_prefix)
    # Lee-et-al repeated-substring removal at word granularity
    q["dedup_substring"] = _doc()(dedup.dedup_substring)
    # the APPLY step: the cleaned corpus itself (kept tokens re-joined)
    q["dedup_substring_apply"] = _doc()(
        lambda d: dedup.dedup_substring(d, emit="text")
    )
    # inverted-index ranked search (exact-integer tf·idf top-k)
    q["text_search_topk"] = _doc()(
        lambda d: textops.search_topk(d, ["data", "table", "shuffle"], k=10)
    )
    # same query answered FROM the persisted inverted-index lake table
    # (built incrementally in two batches; bucket+bloom-pruned scan) —
    # value-identical to the recompute path, so it shares its oracle
    q["text_search_indexed"] = text_index.driver_search_indexed
    # similarity search
    q["similarity_cosine_topk"] = _doc("embeddings")(
        lambda e: similarity.cosine_topk(e, n_queries=5, k=5)
    )
    q["similarity_ann_lsh"] = _doc("embeddings")(
        lambda e: similarity.ann_lsh_topk(e, n_queries=5, k=5)
    )
    q["similarity_ann_ivf"] = _doc("embeddings")(
        lambda e: similarity.ann_ivf_topk(e, n_queries=5, k=5)
    )
    # same query answered from the PERSISTED vec_index lake table (the
    # 100 TB path: index built once, queries read it) — value-identical to
    # the recompute path, so it shares the IVF oracle
    q["similarity_ann_ivf_indexed"] = vec_index.driver_ann_ivf_indexed
    q["similarity_ann_lsh_indexed"] = vec_index.driver_ann_lsh_indexed
    # the production composition: probe cells from the index, rank by PQ
    # asymmetric distance over the index's codes, exact re-rank a shortlist
    q["similarity_ann_ivfpq_indexed"] = vec_index.driver_ann_ivfpq_indexed
    # product quantization: the 100-TB memory path (codes 32× smaller than
    # vectors; ADC scans touch only the code table)
    q["similarity_pq_codes"] = _doc("embeddings")(similarity.pq_codes_str)
    q["similarity_ann_pq"] = _doc("embeddings")(
        lambda e: similarity.ann_pq_topk(e, n_queries=5, k=5)
    )
    q["dedup_embedding_cosine"] = _doc("embeddings")(
        # the synthetic embeddings have no planted dups (max cosine ~0.5);
        # 0.4 exercises the candidate+verify path on real pair mass
        lambda e: similarity.dedup_embedding_cosine(e, threshold=0.4)
    )
    # SemDeDup (Abbas et al. 2023): near-dup candidates restricted to the
    # SAME coarse IVF cell (single-membership — no band fan-out, no
    # dropDuplicates), then exact-cosine verify / transitive-closure keeper
    q["dedup_semantic_pairs"] = _doc("embeddings")(
        lambda e: similarity.semantic_pairs(e, threshold=0.4)
    )
    q["dedup_semantic"] = _doc("embeddings")(
        lambda e: similarity.dedup_semantic(e, threshold=0.4)
    )
    # text analysis
    q["text_token_stats"] = _doc()(textops.token_stats)
    q["text_lang_id"] = _doc()(textops.lang_id)
    q["text_fingerprint"] = _doc()(textops.doc_fingerprint)
    q["text_quality_classifier"] = _doc()(textops.quality_classifier)
    # trained variant: fixed-iteration integer batch perceptron against the
    # hidden deterministic teacher labels; the oracle's recursive CTE
    # replays training itself, so trained weights are value-checked too
    q["text_quality_trained"] = _doc()(textops.quality_trained)
    q["text_top_words"] = _doc()(textops.top_words)
    # CCNet-style unigram-LM perplexity proxy (exact-integer micro-nats)
    q["text_unigram_logprob"] = _doc()(textops.unigram_logprob)
    # BPE tokenizer: distributed merge training + corpus encode; the two
    # entries share one training via bpe's plain-python memo
    q["text_bpe_merges"] = _doc()(bpe.bpe_merges)
    q["text_bpe_tokens"] = _doc()(bpe.bpe_tokens)
    # Gopher/C4 repetition signals; the fixture is single-line, so both
    # engines first line-ize it identically (literal ' a ' → newline)
    q["text_packing"] = _doc()(textops.pack_sequences)
    # RAG / context-window prep: overlapping word windows (map-only fan-out)
    # + the per-document planning aggregate
    q["text_chunk_windows"] = _doc()(
        lambda d: chunking.chunk_windows(d, size=16, overlap=4)
    )
    q["text_chunk_stats"] = _doc()(
        lambda d: chunking.chunk_stats(d, size=16, overlap=4)
    )
    q["text_repetition"] = _doc()(
        lambda d: textops.repetition_signals(
            d.withColumn("text", F.replace("text", F.lit(" a "), F.lit("\n")))
        )
    )
    # deterministic corpus curation: stratified sampling + train/heldout split
    q["corpus_sample"] = _doc()(sampling.stratified_sample)
    q["corpus_split"] = _doc()(sampling.corpus_split)
    q["corpus_mixture_weights"] = _doc()(sampling.mixture_weights)
    q["corpus_mixture"] = _doc()(sampling.apply_mixture)
    # exact-size per-stratum sample (hash-ranked distributed reservoir)
    q["corpus_topn_sample"] = _doc()(sampling.topn_per_stratum)
    # DSIR: hashed-ngram importance weights toward the target domain, then
    # Gumbel-top-k proportional resampling (deterministic, cross-engine)
    q["corpus_dsir_weights"] = _doc()(sampling.dsir_weights)
    q["corpus_dsir_sample"] = _doc()(lambda d: sampling.dsir_resample(d, k=50))
    # temperature (p^alpha) language-mix reshaping, rates from the corpus
    q["corpus_temperature_rates"] = _doc()(sampling.temperature_rates)
    q["corpus_temperature_sample"] = _doc()(sampling.temperature_sample)
    # PII scrub: the corpus fixture has no PII, so both engines inject the
    # same deterministic doc_id-derived emails / IPs / phone numbers first.
    # Column construction stays inside the callable: queries() itself must
    # not require an active SparkContext (driver builds the dict up front).
    def pii_fix():
        return F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.lit(" 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" 555-867-5309")).otherwise(F.lit("")),
        )

    q["text_pii"] = _doc()(
        lambda d: textops.pii_scan(d.withColumn("text", pii_fix()))
    )

    # URL density: the fixture corpus carries no URLs, so inject them
    # deterministically from doc_id (the text_pii convention)
    def url_fix():
        return F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" http://site"), (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.org/p/"), F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 6 == 0,
                F.concat(
                    F.lit(" https://cdn"), (F.col("doc_id") % 3).cast("string"),
                    F.lit(".example.net/a?x="), F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.lit("")),
        )

    q["text_url_stats"] = _doc()(
        lambda d: textops.url_stats(d.withColumn("text", url_fix()))
    )

    # unicode NFC normalization: the fixture corpus is pure ASCII, so both
    # engines first inject the same doc_id-derived DECOMPOSED sequences
    # (combining acute/tilde/ring) — the text_pii injection convention
    def nfc_fix():
        return F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0, F.lit(" cafe\u0301")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit(" n\u0303o")
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit(" A\u030angstro\u0308m")
            ).otherwise(F.lit("")),
        )

    q["text_normalize_nfc"] = _doc()(
        lambda d: textops.normalize_nfc(d.withColumn("text", nfc_fix()))
    )
    # multimodal plumbing
    q["multimodal_metadata"] = _doc()(
        lambda d: multimodal.media_metadata(multimodal.synth_media(d))
    )
    q["multimodal_features"] = _doc()(
        lambda d: multimodal.feature_values(multimodal.synth_media(d))
    )
    # REAL-codec round-trips (pure-numpy BMP/WAV encode→decode; DuckDB
    # recomputes the decoded-media stats straight from the generator formula)
    q["multimodal_wav_roundtrip"] = _doc()(multimodal.wav_roundtrip_stats)
    q["multimodal_bmp_roundtrip"] = _doc()(multimodal.bmp_roundtrip_stats)
    q["multimodal_png_roundtrip"] = _doc()(multimodal.png_roundtrip_stats)
    q["multimodal_resize_nearest"] = _doc()(multimodal.resize_roundtrip_stats)
    q["multimodal_jpeg_roundtrip"] = _doc()(multimodal.jpeg_roundtrip_stats)
    # same closed-form oracle, SOF2 scan-script encoder + progressive
    # decoder on the Spark side — value-checks successive approximation
    q["multimodal_jpeg_progressive_roundtrip"] = _doc()(
        multimodal.jpeg_progressive_roundtrip_stats
    )
    # CDC / geometry queries over the engine warehouse (rows-only checks)
    q["cdc_q1_edition"] = entry_cdc.cdc_q1_edition
    q["cdc_q2_edition_unique"] = entry_cdc.cdc_q2_edition_unique
    q["cdc_q3_persisted"] = entry_cdc.cdc_q3_persisted
    q["cdc_q4_retired"] = entry_cdc.cdc_q4_retired
    q["cdc_q5_osm_links"] = entry_cdc.cdc_q5_osm_links
    q["cdc_classify"] = entry_cdc.cdc_classify
    q["cdc_triples_by_predicate"] = entry_cdc.cdc_triples_by_predicate
    q["cdc_editions_fixpoint"] = entry_cdc.cdc_editions_fixpoint
    q["cdc_metrics"] = entry_cdc.cdc_metrics
    q["cdc_snap_offgrid"] = entry_cdc.cdc_snap_offgrid
    # the one geometry-core entry WITH a full value oracle: the grid fold
    # over horizontal runs is exact integer set algebra, so a two-edition
    # micro fold is DuckDB-expressible (md5 name chain, sha256 gid/content,
    # edge lists via list functions)
    q["cdc_fold_micro"] = entry_cdc.cdc_fold_micro
    # snap-rounding front-end value oracle: quantize + DDA rasterization +
    # WKT round-trip vs DuckDB re-deriving every edge id (tie-free fixture)
    q["cdc_snap_micro"] = entry_cdc.cdc_snap_micro
    # lakehouse change-data-feed (LakeTable.changes + delete_where): pure
    # relational state over events, so the whole CDF is value-oracled
    q["cdc_table_changes"] = entry_cdc.cdc_table_changes
    return _gate_order(q)


# The driver's per-round CORRECTNESS gate checks the FIRST 50 entries of
# queries() in dict order.  Front-load the highest-value witnesses: the
# value-oracled geometry core (cdc_fold_micro / cdc_snap_micro /
# cdc_table_changes) and every other cdc_* entry first — these ARE the
# reference's semantics (/root/reference/main.py:85-131, ui/main.py:23-78) —
# then the newest/riskiest operator families (BPE, composed IVF+PQ,
# chunking, DSIR, incremental indexes, embedding dedup), then one
# representative per long-stable family.  Relational rows (driver-green
# since round 1) fill the tail.
_GATE_ORDER = [
    # geometry core, value-oracled entries at the very front
    "cdc_fold_micro",
    "cdc_snap_micro",
    "cdc_table_changes",
    # remaining cdc_* warehouse queries (rows-only + pinned pytest digests)
    "cdc_q1_edition",
    "cdc_q2_edition_unique",
    "cdc_q3_persisted",
    "cdc_q4_retired",
    "cdc_q5_osm_links",
    "cdc_classify",
    "cdc_triples_by_predicate",
    "cdc_editions_fixpoint",
    "cdc_metrics",
    "cdc_snap_offgrid",
    # newest / riskiest families
    "text_bpe_merges",
    "text_bpe_tokens",
    "similarity_ann_ivfpq_indexed",
    "similarity_ann_ivf_indexed",
    "similarity_ann_lsh_indexed",
    "similarity_pq_codes",
    "similarity_ann_pq",
    "text_chunk_windows",
    "text_chunk_stats",
    "corpus_dsir_weights",
    "corpus_dsir_sample",
    "text_quality_trained",
    "dedup_minhash_incremental",
    "text_search_indexed",
    "dedup_embedding_cosine",
    "dedup_semantic_pairs",
    "dedup_semantic",
    "multimodal_jpeg_roundtrip",
    "multimodal_jpeg_progressive_roundtrip",
    # one representative per stable family (similarity_ann_lsh omitted:
    # its oracle is identical to the indexed twin already in the window)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_jaccard_prefix",
    "dedup_substring",
    "dedup_lines",
    "dedup_decontaminate",
    "dedup_clusters",
    "dedup_simhash",
    "similarity_cosine_topk",
    "similarity_ann_ivf",
    "text_token_stats",
    "text_quality_classifier",
    "text_unigram_logprob",
    "text_repetition",
    "text_packing",
    "sketch_hll_users",
    "sketch_cms_event_types",
    "events_asof_purchase",
]


def _gate_order(q: dict) -> dict:
    ordered = {k: q[k] for k in _GATE_ORDER if k in q}
    ordered.update((k, v) for k, v in q.items() if k not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    o = dict(relational.ORACLES)
    o.update(temporal.ORACLES)
    o.update(sketch.ORACLES)
    o["dedup_exact"] = dedup.DEDUP_EXACT_SQL
    o["dedup_ngram_jaccard"] = dedup.dedup_ngram_jaccard_sql(threshold=0.5)
    o["dedup_clusters"] = dedup.dedup_clusters_sql(threshold=0.5)
    o["dedup_apply"] = dedup.dedup_apply_sql(threshold=0.5)
    o["dedup_minhash_lsh"] = dedup.dedup_minhash_lsh_sql()
    o["dedup_minhash_incremental"] = dedup_index.dedup_minhash_incremental_sql()
    o["dedup_simhash"] = dedup.simhash_sql()
    o["dedup_decontaminate"] = dedup.decontaminate_sql()
    o["dedup_lines"] = dedup.dedup_lines_sql(
        text_expr="replace(text, ' a ', chr(10))"
    )
    o["dedup_jaccard_prefix"] = dedup.dedup_jaccard_prefix_sql()
    o["dedup_substring"] = dedup.dedup_substring_sql()
    o["dedup_substring_apply"] = dedup.dedup_substring_sql(emit="text")
    o["text_search_topk"] = textops.search_topk_sql(["data", "table", "shuffle"], k=10)
    o["text_search_indexed"] = textops.search_topk_sql(["data", "table", "shuffle"], k=10)
    o["similarity_cosine_topk"] = similarity.cosine_topk_sql(n_queries=5, k=5)
    o["similarity_ann_lsh"] = similarity.ann_lsh_topk_sql(n_queries=5, k=5)
    o["similarity_ann_ivf"] = similarity.ann_ivf_topk_sql(n_queries=5, k=5)
    o["similarity_ann_ivf_indexed"] = similarity.ann_ivf_topk_sql(n_queries=5, k=5)
    o["similarity_ann_lsh_indexed"] = similarity.ann_lsh_topk_sql(n_queries=5, k=5)
    o["similarity_ann_ivfpq_indexed"] = similarity.ann_ivfpq_topk_sql(
        n_queries=5, k=5, shortlist=200
    )
    o["similarity_pq_codes"] = similarity.pq_codes_sql()
    o["similarity_ann_pq"] = similarity.ann_pq_topk_sql(n_queries=5, k=5)
    o["dedup_embedding_cosine"] = similarity.dedup_embedding_cosine_sql(threshold=0.4)
    o["dedup_semantic_pairs"] = similarity.semantic_pairs_sql(threshold=0.4)
    o["dedup_semantic"] = similarity.dedup_semantic_sql(threshold=0.4)
    o["text_unigram_logprob"] = textops.unigram_logprob_sql()
    o["text_token_stats"] = textops.token_stats_sql()
    o["text_lang_id"] = textops.lang_id_sql()
    o["text_fingerprint"] = textops.doc_fingerprint_sql()
    o["text_quality_classifier"] = textops.quality_classifier_sql()
    o["text_quality_trained"] = textops.quality_trained_sql()
    # same decomposed-sequence injection as the Spark side, via chr() so
    # the source stays ASCII (769/771/778/776 = combining acute / tilde /
    # ring above / diaeresis)
    o["text_normalize_nfc"] = textops.normalize_nfc_sql(
        text_expr=(
            "text"
            " || CASE WHEN doc_id % 2 = 0 THEN ' cafe' || chr(769) ELSE '' END"
            " || CASE WHEN doc_id % 3 = 0 THEN ' n' || chr(771) || 'o' ELSE '' END"
            " || CASE WHEN doc_id % 5 = 0 THEN ' A' || chr(778) || 'ngstro'"
            "    || chr(776) || 'm' ELSE '' END"
        )
    )
    o["text_top_words"] = textops.top_words_sql()
    o["text_packing"] = textops.pack_sequences_sql()
    o["text_chunk_windows"] = chunking.chunk_windows_sql(size=16, overlap=4)
    o["text_chunk_stats"] = chunking.chunk_stats_sql(size=16, overlap=4)
    o["text_bpe_merges"] = bpe.bpe_merges_sql()
    o["text_bpe_tokens"] = bpe.bpe_tokens_sql()
    o["corpus_sample"] = sampling.stratified_sample_sql()
    o["corpus_split"] = sampling.corpus_split_sql()
    o["corpus_mixture_weights"] = sampling.mixture_weights_sql()
    o["corpus_mixture"] = sampling.apply_mixture_sql()
    o["corpus_topn_sample"] = sampling.topn_per_stratum_sql()
    o["corpus_dsir_weights"] = sampling.dsir_weights_sql()
    o["corpus_dsir_sample"] = sampling.dsir_resample_sql(k=50)
    o["corpus_temperature_rates"] = sampling.temperature_rates_sql()
    o["corpus_temperature_sample"] = sampling.temperature_sample_sql()
    o["text_pii"] = textops.pii_scan_sql(
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 4 = 0 THEN ' 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.7' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' 555-867-5309' ELSE '' END"
    )
    o["text_url_stats"] = textops.url_stats_sql(
        "text"
        " || CASE WHEN doc_id % 2 = 0 THEN ' http://site' || CAST(doc_id % 7 AS VARCHAR)"
        " || '.example.org/p/' || CAST(doc_id AS VARCHAR) ELSE '' END"
        " || CASE WHEN doc_id % 6 = 0 THEN ' https://cdn' || CAST(doc_id % 3 AS VARCHAR)"
        " || '.example.net/a?x=' || CAST(doc_id AS VARCHAR) ELSE '' END"
    )
    o["text_repetition"] = textops.repetition_signals_sql(
        "replace(text, ' a ', chr(10))"
    )
    o["multimodal_metadata"] = multimodal.MEDIA_METADATA_SQL
    o["multimodal_features"] = multimodal.feature_values_sql()
    o["multimodal_wav_roundtrip"] = multimodal.WAV_ROUNDTRIP_SQL
    o["multimodal_bmp_roundtrip"] = multimodal.BMP_ROUNDTRIP_SQL
    o["multimodal_png_roundtrip"] = multimodal.PNG_ROUNDTRIP_SQL
    o["multimodal_resize_nearest"] = multimodal.RESIZE_ROUNDTRIP_SQL
    o["multimodal_jpeg_roundtrip"] = multimodal.JPEG_ROUNDTRIP_SQL
    o["multimodal_jpeg_progressive_roundtrip"] = multimodal.JPEG_ROUNDTRIP_SQL
    # other cdc_* stay rows-only (arbitrary lattices are not
    # SQL-expressible), but the micro fold IS: full value oracle
    o["cdc_fold_micro"] = entry_cdc.cdc_fold_micro_sql()
    o["cdc_snap_micro"] = entry_cdc.cdc_snap_micro_sql()
    o["cdc_table_changes"] = entry_cdc.cdc_table_changes_sql()
    return o
