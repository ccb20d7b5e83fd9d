"""Sliding-window chunking: value semantics, reconstruction invariant,
DuckDB oracle equality on adversarial whitespace, parameter guards."""

import duckdb
import pytest

from linked_maps_spark import chunking


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_chunk_windows_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b  c d e f g"),     # 7 words, multi-space collapse
            (2, "  hi  "),             # 1 word, outer whitespace
            (3, ""),                   # blank: no rows
            (4, "   "),                # whitespace-only: no rows
            (5, "one two three four five"),
        ],
        "doc_id long, text string",
    )
    got = _rows(chunking.chunk_windows(docs, size=4, overlap=1))
    assert got == [
        (1, 0, 4, "a b c d"),
        (1, 1, 4, "d e f g"),          # stride 3: overlaps on "d"
        (2, 0, 1, "hi"),
        (5, 0, 4, "one two three four"),
        (5, 1, 2, "four five"),        # final window runs short
    ]


@pytest.mark.parametrize("size,overlap,n_words", [
    (4, 0, 11), (4, 1, 12), (8, 3, 30), (5, 4, 9), (3, 0, 3), (6, 2, 1),
])
def test_chunk_reconstruction_invariant(spark, size, overlap, n_words):
    """Every word appears, in order: the stride-prefixes of all chunks but
    the last, plus the whole last chunk, reassemble the document exactly."""
    words = [f"w{i}" for i in range(n_words)]
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    chunks = [r["chunk_text"].split(" ")
              for r in chunking.chunk_windows(docs, size, overlap).collect()]
    stride = size - overlap
    rebuilt = [w for c in chunks[:-1] for w in c[:stride]] + chunks[-1]
    assert rebuilt == words
    # every chunk except the last is full-size; consecutive chunks overlap
    # exactly `overlap` words
    assert all(len(c) == size for c in chunks[:-1])
    for a, b in zip(chunks, chunks[1:]):
        assert a[stride:] == b[: len(a) - stride]


def test_chunk_windows_matches_duckdb(spark):
    rows = [
        (1, "alpha\tbeta\ngamma  delta epsilon zeta eta theta iota kappa"),
        (2, "x"),
        (3, "  \n\t "),
        (4, " ".join(f"t{i}" for i in range(23))),
        (5, "solo pair"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = _rows(chunking.chunk_windows(docs, size=6, overlap=2))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = [tuple(r) for r in con.sql(chunking.chunk_windows_sql(6, 2)).fetchall()]
    assert got == want
    got_s = _rows(chunking.chunk_stats(docs, size=6, overlap=2))
    want_s = [tuple(r) for r in con.sql(chunking.chunk_stats_sql(6, 2)).fetchall()]
    assert got_s == want_s


def test_chunk_stats_consistency(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(i * 7 % 40 + 1))) for i in range(1, 20)],
        "doc_id long, text string",
    )
    win = chunking.chunk_windows(docs, size=8, overlap=2).collect()
    stats = {r["doc_id"]: r for r in chunking.chunk_stats(docs, size=8, overlap=2).collect()}
    per_doc = {}
    for r in win:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == set(stats)
    for d, rows in per_doc.items():
        assert stats[d]["n_chunks"] == len(rows)
        assert stats[d]["n_words_total"] == sum(r["n_words"] for r in rows)
        # chunk_id dense from 0
        assert sorted(r["chunk_id"] for r in rows) == list(range(len(rows)))


def test_chunk_param_guards():
    with pytest.raises(ValueError):
        chunking.chunk_windows_sql(size=0)
    with pytest.raises(ValueError):
        chunking.chunk_windows_sql(size=4, overlap=4)
    with pytest.raises(ValueError):
        chunking.chunk_windows_sql(size=4, overlap=-1)
