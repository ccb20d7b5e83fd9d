"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting — all JVM-side expressions (no Python UDFs), each
with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import h32, h32_sql, tokens, word_shingles, word_shingles_sql

# tiny deterministic stopword marker sets per language
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "es", "y"],
}
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})
PUNCT_CLASS = r"[.,!?;:]"
# BPE-ish pre-tokenizer (GPT-2-style shape): contraction suffixes, letter
# runs, digit runs, other-symbol runs — same pattern semantics in Java regex
# (Spark) and RE2 (DuckDB), so the count is oracle-exact
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def _hits(toks, words: list[str]):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def token_stats(documents: DataFrame) -> DataFrame:
    """Token counting + quality scoring (length / punct / stopword ratios).

    quality = rounded linear combo; all ratios are int/int divisions done
    once in double — bit-identical to the SQL oracle."""
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", PUNCT_CLASS, ""))
    n_stop = _hits(toks, STOPWORDS)
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias("n_bpe_tokens"),
        n_chars.alias("n_chars"),
        F.round(n_punct / n_chars, 6).alias("punct_ratio"),
        F.round(n_stop / n_tok, 6).alias("stopword_ratio"),
        F.round(
            (n_stop / n_tok) * 0.5
            + F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.5,
            6,
        ).alias("quality_score"),
    ).orderBy("doc_id")


def token_stats_sql() -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = "string_split_regex(trim(lower(text)), '\\s+')"
    bpe = BPE_PATTERN.replace("'", "''")
    return f"""
    SELECT doc_id,
           len({toks}) AS n_tokens,
           len(regexp_extract_all(text, '{bpe}')) AS n_bpe_tokens,
           length(text) AS n_chars,
           ROUND((length(text) - length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')))
                 / length(text), 6) AS punct_ratio,
           ROUND(len(list_filter({toks}, t -> t IN ({words}))) / len({toks}), 6)
               AS stopword_ratio,
           ROUND((len(list_filter({toks}, t -> t IN ({words}))) / len({toks})) * 0.5
                 + least(len({toks}) / 100.0, 1.0) * 0.5, 6) AS quality_score
    FROM documents
    ORDER BY doc_id
    """


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-token language ID with deterministic argmax (score desc, code
    asc).  The n-gram-heuristic classifier of the task brief, kept exactly
    SQL-expressible."""
    toks = tokens(F.col("text"))
    scores = F.array(
        *[
            F.struct(
                (-_hits(toks, ws)).alias("neg_score"), F.lit(code).alias("lang_pred")
            )
            for code, ws in sorted(LANG_MARKERS.items())
        ]
    )
    best = F.array_sort(scores)[0]
    return documents.select(
        "doc_id",
        best["lang_pred"].alias("lang_pred"),
        (-best["neg_score"]).cast("long").alias("marker_hits"),
    ).orderBy("doc_id")


def lang_id_sql() -> str:
    structs = []
    for code, ws in sorted(LANG_MARKERS.items()):
        words = ", ".join(f"'{w}'" for w in ws)
        structs.append(
            "{'neg_score': -len(list_filter("
            "string_split_regex(trim(lower(text)), '\\s+'), "
            f"t -> t IN ({words}))), 'lang_pred': '{code}'}}"
        )
    return f"""
    WITH best AS (
        SELECT doc_id, list_sort([{', '.join(structs)}])[1] AS b
        FROM documents
    )
    SELECT doc_id, b.lang_pred AS lang_pred, CAST(-b.neg_score AS BIGINT) AS marker_hits
    FROM best
    ORDER BY doc_id
    """


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprint: min portable hash over word shingles (the
    winnowing 'rolling hash → min' scheme, oracle-exact)."""
    sh = documents.select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("shingle")
    )
    return (
        sh.groupBy("doc_id")
        .agg(F.min(h32(F.col("shingle"))).alias("fingerprint"))
        .orderBy("doc_id")
    )


def doc_fingerprint_sql() -> str:
    return f"""
    WITH sh AS (
        SELECT doc_id, UNNEST({word_shingles_sql('text')}) AS shingle FROM documents
    )
    SELECT doc_id, MIN({h32_sql('shingle')}) AS fingerprint
    FROM sh GROUP BY doc_id ORDER BY doc_id
    """
