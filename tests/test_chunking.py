"""Context-window chunking (functions/chunking.py): boundary math,
full-coverage property, Spark-vs-DuckDB parity, zero-shuffle plan."""

import duckdb
import pytest

from s2_geometry_library_php_spark.functions.chunking import (
    chunk_documents,
    chunk_documents_duckdb,
)


def _words(n):
    return " ".join(f"w{i}" for i in range(n))


def _spark_chunks(spark, texts, window, stride):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(
            df, window=window, stride=stride
        ).collect()
    )


def _duck_chunks(texts, window, stride):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(texts)))
        + ") t(doc_id, text)",
        list(texts),
    )
    sql = chunk_documents_duckdb(window=window, stride=stride)
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


@pytest.mark.parametrize("n,window,stride", [
    (0, 8, 4),    # empty text -> one empty chunk
    (1, 8, 4),
    (7, 8, 4),    # shorter than a window
    (8, 8, 4),    # exactly one window
    (9, 8, 4),    # one token past -> second (short) chunk
    (12, 8, 4),
    (16, 8, 8),   # stride == window: disjoint cover
    (17, 8, 8),
    (100, 16, 10),
])
def test_engine_parity(spark, n, window, stride):
    texts = [_words(n)]
    got = _spark_chunks(spark, texts, window, stride)
    want = _duck_chunks(texts, window, stride)
    assert got == want


def test_boundaries_and_coverage(spark):
    # 10 tokens, window 4, stride 3 -> starts 0,3,6 cover 0..9
    [(_, c0, t0, n0), (_, c1, t1, n1), (_, c2, t2, n2)] = _spark_chunks(
        spark, [_words(10)], 4, 3
    )
    assert (c0, t0, n0) == (0, "w0 w1 w2 w3", 4)
    assert (c1, t1, n1) == (1, "w3 w4 w5 w6", 4)
    assert (c2, t2, n2) == (2, "w6 w7 w8 w9", 4)


def test_every_token_covered_and_overlap_exact(spark):
    for n in (1, 5, 23, 64, 65, 200):
        rows = _spark_chunks(spark, [_words(n)], 16, 12)
        seen = set()
        for _, cid, text, ntok in rows:
            toks = text.split(" ")
            assert len(toks) == ntok
            assert toks == [f"w{i}" for i in range(cid * 12, cid * 12 + ntok)]
            seen.update(range(cid * 12, cid * 12 + ntok))
        assert seen == set(range(n)), n


def test_empty_text_yields_single_empty_chunk(spark):
    rows = _spark_chunks(spark, ["", "   "], 8, 4)
    assert rows == [(0, 0, "", 0), (1, 0, "", 0)]


def test_bad_params_raise(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(df, window=4, stride=5)


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
