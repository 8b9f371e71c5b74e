"""Distributed prefix scan + sequence packing (operators/scan.py):
exactness vs a DuckDB window oracle and a Python fold, bucket-count
invariance, sparse/skewed keys, pack coordinate semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_php_spark.operators.scan import (
    global_running_sum,
    pack_sequences,
)


def _rows(ids_tokens):
    return [(i, t) for i, t in ids_tokens]


def _df(spark, ids_tokens):
    return spark.createDataFrame(
        _rows(ids_tokens), "doc_id long, n_tokens long"
    )


def _collect_cum(df):
    return {
        r["doc_id"]: r["cum_before"]
        for r in df.select("doc_id", "cum_before").collect()
    }


def test_matches_duckdb_window_oracle(spark):
    ids_tokens = [(i * 7 % 101, (i * 13) % 29 + 1) for i in range(101)]
    got = _collect_cum(
        global_running_sum(
            _df(spark, ids_tokens), "doc_id", "n_tokens", n_buckets=8
        )
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {t})" for i, t in ids_tokens)
        + ") v(doc_id, n_tokens)"
    )
    want = dict(
        con.execute(
            "SELECT doc_id, coalesce(sum(n_tokens) OVER (ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) FROM t"
        ).fetchall()
    )
    assert got == want


def test_bucket_count_invariance_and_sparse_keys(spark):
    # sparse, clustered, huge keys — bucket boundaries must not matter
    ids_tokens = (
        [(i, 5) for i in range(10)]
        + [(10**9 + i, 3) for i in range(10)]
        + [(2**60 + i * 1000, 7) for i in range(10)]
    )
    base = None
    for nb in (1, 2, 7, 32):
        got = _collect_cum(
            global_running_sum(
                _df(spark, ids_tokens), "doc_id", "n_tokens", n_buckets=nb
            )
        )
        if base is None:
            base = got
        else:
            assert got == base, f"n_buckets={nb} changed the scan"
    # spot-check the fold
    assert base[0] == 0
    assert base[9] == 45
    assert base[10**9] == 50
    assert base[2**60] == 80


def test_pack_sequences_coordinates(spark):
    # budget 10; docs in id order with tokens 4,4,4,9,10,1
    docs = _df(
        spark, [(1, 4), (2, 4), (3, 4), (4, 9), (5, 10), (6, 1)]
    )
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["spans_packs"])
        for r in pack_sequences(
            docs, budget=10, token_col="n_tokens", n_buckets=3
        ).collect()
    }
    assert got == {
        1: (0, 0, False),
        2: (0, 4, False),
        3: (0, 8, True),   # 8+4 > 10: straddles packs 0/1
        4: (1, 2, True),   # 12..20 straddles packs 1/2
        5: (2, 1, True),
        6: (3, 1, False),
    }


def test_pack_sequences_tokenizes_text_when_needed(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(docs, budget=4).collect()
    }
    assert got[1] == (3, 0, 0)
    assert got[2] == (2, 0, 3)
    assert got[3] == (0, 1, 1)


def test_pack_sequences_bad_budget(spark):
    with pytest.raises(ValueError):
        pack_sequences(_df(spark, [(1, 1)]), budget=0)


def test_scan_plan_has_no_global_single_partition_window(spark):
    df = _df(spark, [(i, 1) for i in range(50)])
    plan = (
        global_running_sum(df, "doc_id", "n_tokens", n_buckets=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the naive form plans Exchange SinglePartition before the Window;
    # the scan must not
    assert "SinglePartition" not in plan
    assert "NestedLoop" not in plan
