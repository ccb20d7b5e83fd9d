"""BPE tokenizer: three independent derivations must agree.

1. imperative python (GPT-2-style left-to-right merge scan) — the reference
   semantics;
2. the Spark engine (closed-form merge application in JVM expressions);
3. the DuckDB recursive-CTE oracle (exercised at the driver gate; here the
   bpe_*_sql strings run directly against the same parquet).

The closed form (``eff[i] = cand[i] AND odd(i - last_non_candidate)``) is
additionally hypothesis-tested against the imperative scan on random symbol
lists — including ``aaa…`` runs, the only place the non-overlap alternation
actually bites.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from linked_maps_spark import bpe, relational

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# reference implementations


def imperative_merge(syms: list[str], l: str, r: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def closed_form_merge(syms: list[str], l: str, r: str) -> list[str]:
    """Python mirror of the exact formula both engines run."""
    n = len(syms)
    cand = [syms[i] == l and syms[i + 1] == r for i in range(n - 1)]
    eff = []
    for i in range(n - 1):  # 0-based here; engines are 1-based
        last_nc = max((j + 1 for j in range(i) if not cand[j]), default=0)
        eff.append(cand[i] and (i + 1 - last_nc) % 2 == 1)
    kept = [p for p in range(n) if p == 0 or not eff[p - 1]]
    return [l + r if p < n - 1 and eff[p] else syms[p] for p in kept]


def ref_bpe(word_freqs: dict[str, int], k: int):
    segs = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(k):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        segs = {w: imperative_merge(s, l, r) for w, s in segs.items()}
    return merges, segs


# ---------------------------------------------------------------------------
# the closed form IS the imperative scan


@settings(max_examples=300, deadline=None)
@given(
    syms=st.lists(st.sampled_from(["a", "b", "ab", "ba", "c"]), min_size=1, max_size=12),
    pair=st.tuples(
        st.sampled_from(["a", "b", "ab", "ba", "c"]),
        st.sampled_from(["a", "b", "ab", "ba", "c"]),
    ),
)
def test_closed_form_merge_equals_imperative_scan(syms, pair):
    l, r = pair
    assert closed_form_merge(syms, l, r) == imperative_merge(syms, l, r)


def test_spark_merge_apply_matches_closed_form(spark):
    # adversarial fixtures: odd/even aaa runs (alternation), adjacent
    # disjoint candidates, merged-symbol lookalikes, single symbol, no-op
    cases = [
        (["a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b", "a", "b"], "a", "b"),
        (["b", "a", "b", "a"], "a", "b"),
        (["ab", "a", "b"], "a", "b"),
        (["x"], "a", "b"),
        (["q", "r"], "a", "b"),
        (["a", "b"], "a", "b"),
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)], "id int, syms array<string>"
    )
    for i, (syms, l, r) in enumerate(cases):
        got = (
            df.filter(F.col("id") == i)
            .select(bpe._apply_merge("syms", l, r).alias("m"))
            .collect()[0]["m"]
        )
        assert list(got) == imperative_merge(syms, l, r), (syms, l, r, got)


# ---------------------------------------------------------------------------
# end-to-end three-way agreement on the corpus


@pytest.fixture(scope="module")
def corpus_truth():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    wf = dict(
        con.execute(
            "SELECT w, count(*) FROM (SELECT unnest(string_split(text,' ')) AS w"
            " FROM documents) WHERE w <> '' GROUP BY w"
        ).fetchall()
    )
    return con, wf


def test_bpe_training_three_way(spark, corpus_truth):
    con, wf = corpus_truth
    k = 12
    docs = relational.load(spark, SF, "documents")
    merges_df, seg = bpe.train_bpe(docs, k=k)
    spark_merges = [tuple(r) for r in merges_df.orderBy("merge_rank").collect()]
    ref_merges, ref_segs = ref_bpe(wf, k)
    assert spark_merges == ref_merges
    assert {r["word"]: list(r["syms"]) for r in seg.collect()} == ref_segs
    duck_merges = [tuple(r) for r in con.execute(bpe.bpe_merges_sql(k)).fetchall()]
    assert duck_merges == ref_merges

    tok = bpe.encode(docs, seg)
    spark_tok = [(r["doc_id"], r["n_tokens"], r["tokens"]) for r in tok.collect()]
    duck_tok = [tuple(r) for r in con.execute(bpe.bpe_tokens_sql(k)).fetchall()]
    assert spark_tok == duck_tok
    # tokenization is lossless: concatenating tokens restores the text
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, _, tokens in spark_tok:
        assert tokens.replace(" ", "") == texts[doc_id].replace(" ", "")


def test_bpe_training_partitioning_invariant(spark):
    docs = relational.load(spark, SF, "documents")
    m1, _ = bpe.train_bpe(docs.repartition(7), k=6)
    m2, _ = bpe.train_bpe(docs.coalesce(1), k=6)
    assert [tuple(r) for r in m1.orderBy("merge_rank").collect()] == [
        tuple(r) for r in m2.orderBy("merge_rank").collect()
    ]
