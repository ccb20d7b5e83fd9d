"""Deterministic corpus-curation sampling operators.

A 100-TB training-corpus build needs reproducible, cluster-order-independent
sampling: per-language rate adjustment (up/down-weighting strata toward a
target mix) and train/heldout splitting.  Both are pure stateless filters on
a portable hash of ``doc_id`` — no shuffle, no RNG state, no driver
coordination; the scan's column pruning keeps them to the id + stratum
columns, and the same integer arithmetic runs in DuckDB for value-exact
oracles.

Rates are expressed in parts-per-million integers so the threshold compare
is exact on both engines (no float rounding at the boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import h32, h32_sql

PPM = 1_000_000

# default per-language sampling rates (ppm): the usual "keep high-resource
# languages partially, rare languages fully" corpus mix
DEFAULT_RATES_PPM = {
    "en": 500_000,
    "de": 1_000_000,
    "fr": 250_000,
    "es": 250_000,
    "zh": 100_000,
}
DEFAULT_RATE_PPM = 200_000

# train/heldout/test split bands (ppm, cumulative): 98% / 1% / 1%
SPLIT_BANDS = [("train", 980_000), ("heldout", 990_000), ("test", PPM)]


def _ticket(salt: str):
    """Uniform ppm ticket from doc_id: portable md5 hash → [0, PPM)."""
    return h32(F.col("doc_id").cast("string"), salt=salt) % PPM


def _ticket_sql(salt: str) -> str:
    return f"{h32_sql('CAST(doc_id AS VARCHAR)', salt)} % {PPM}"


def stratified_sample(
    documents: DataFrame,
    rates_ppm: dict[str, int] | None = None,
    default_ppm: int = DEFAULT_RATE_PPM,
) -> DataFrame:
    """Per-language deterministic Bernoulli sample: keep a doc iff its hash
    ticket falls below its stratum's ppm rate.  Membership depends only on
    (doc_id, lang) — re-running on any cluster layout keeps the same docs."""
    rates = DEFAULT_RATES_PPM if rates_ppm is None else rates_ppm
    rate = None
    for lang, ppm in sorted(rates.items()):
        branch = (F.col("lang") == lang, F.lit(ppm))
        rate = F.when(*branch) if rate is None else rate.when(*branch)
    rate = F.lit(default_ppm) if rate is None else rate.otherwise(F.lit(default_ppm))
    return (
        documents.withColumn("ticket", _ticket("sample"))
        .filter(F.col("ticket") < rate)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def stratified_sample_sql(
    rates_ppm: dict[str, int] | None = None,
    default_ppm: int = DEFAULT_RATE_PPM,
) -> str:
    rates = DEFAULT_RATES_PPM if rates_ppm is None else rates_ppm
    whens = " ".join(
        f"WHEN '{lang}' THEN {ppm}" for lang, ppm in sorted(rates.items())
    )
    case = f"CASE lang {whens} ELSE {default_ppm} END" if whens else str(default_ppm)
    return f"""
    WITH t AS (
        SELECT doc_id, lang, source, {_ticket_sql('sample')} AS ticket
        FROM documents
    )
    SELECT doc_id, lang, source FROM t
    WHERE ticket < {case}
    ORDER BY doc_id
    """


def corpus_split(documents: DataFrame) -> DataFrame:
    """Deterministic train/heldout/test assignment by hash band: every doc
    gets exactly one split, stable across runs and cluster layouts (the
    property a heldout set must have — a doc can never migrate into train).
    The split salt differs from the sampling salt so subsampling and
    splitting stay independent events."""
    ticket = _ticket("split")
    split = None
    for name, hi in SPLIT_BANDS[:-1]:
        branch = (ticket < hi, F.lit(name))
        split = F.when(*branch) if split is None else split.when(*branch)
    split = split.otherwise(F.lit(SPLIT_BANDS[-1][0]))
    return documents.select(
        "doc_id", "lang", split.alias("split")
    ).orderBy("doc_id")


def corpus_split_sql() -> str:
    whens = " ".join(
        f"WHEN ticket < {hi} THEN '{name}'" for name, hi in SPLIT_BANDS[:-1]
    )
    return f"""
    WITH t AS (
        SELECT doc_id, lang, {_ticket_sql('split')} AS ticket FROM documents
    )
    SELECT doc_id, lang,
           CASE {whens} ELSE '{SPLIT_BANDS[-1][0]}' END AS split
    FROM t
    ORDER BY doc_id
    """
