"""Streaming per-host cap (streaming/hostcap_stream.py) and stateless
streaming PII redaction.

The cap test streams the corpus as two micro-batches and checks the
admitted set EXACTLY against a pure-Python replay of the documented
contract: per batch, each host admits its remaining budget to the
smallest (priority, doc_id) rows; state carries across batches."""

import duckdb
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_php_spark.operators.sampling import (
    DEFAULT_SALT,
    MIX_C1,
    MODULUS,
)

CAP = 3
N = 400


def _py_priority(doc_id, salt=DEFAULT_SALT):
    x = doc_id % MODULUS
    y = (x * x + MIX_C1) % MODULUS
    return (y * y + salt) % MODULUS


def _host(doc_id):
    return f"site{doc_id % 11}.example.com"


def _url_expr():
    return (
        "'https://WWW.Site' || CAST(doc_id % 11 AS STRING) "
        "|| '.example.com/p/' || CAST(doc_id AS STRING)"
    )


def _py_replay(batches, cap=CAP):
    admitted = {}
    out = set()
    for batch in batches:
        by_host = {}
        for i in batch:
            by_host.setdefault(_host(i), []).append(i)
        for h, ids in by_host.items():
            budget = cap - admitted.get(h, 0)
            if budget <= 0:
                continue
            take = sorted(ids, key=lambda i: (_py_priority(i), i))[:budget]
            out.update(take)
            admitted[h] = admitted.get(h, 0) + len(take)
    return out


def test_streaming_cap_matches_python_replay(spark, tmp_path):
    from s2_geometry_library_php_spark.streaming.hostcap_stream import (
        streaming_cap_per_host,
    )

    docs = spark.range(N).withColumnRenamed("id", "doc_id").selectExpr(
        "doc_id", f"{_url_expr()} AS url"
    )
    batch_a = docs.where("doc_id % 2 = 0")
    batch_b = docs.where("doc_id % 2 = 1")
    stage = str(tmp_path / "src")
    batch_a.coalesce(1).write.parquet(stage)
    batch_b.coalesce(1).write.mode("append").parquet(stage)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(stage)
    )
    q = (
        streaming_cap_per_host(stream, CAP)
        .writeStream.format("memory")
        .queryName("t_hostcap_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress["batchId"] >= 1
    rows = spark.table("t_hostcap_stream").collect()
    got = {r["doc_id"] for r in rows}

    # NOTE on replay order: file-source micro-batches follow the
    # staged write order (batch_a then batch_b), which is the point of
    # maxFilesPerTrigger=1
    evens = [i for i in range(N) if i % 2 == 0]
    odds = [i for i in range(N) if i % 2 == 1]
    assert got == _py_replay([evens, odds])

    # structural invariants
    per_host = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append(r["host_rank"])
    for h, ranks in per_host.items():
        assert len(ranks) <= CAP
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), h
    # every host hit its cap (400 docs / 11 hosts >> 3)
    assert all(len(v) == CAP for v in per_host.values())
    assert len(per_host) == 11

    with pytest.raises(ValueError):
        streaming_cap_per_host(stream, 0)


def test_streaming_pii_redaction_stateless(spark, tmp_path):
    """PII redaction is a pure projection, so it rides a stream
    unchanged: availableNow output == batch redaction of the same
    rows."""
    from s2_geometry_library_php_spark.functions.pii import (
        redact_pii_column,
        synth_pii_text_sql,
    )

    docs = spark.range(120).withColumnRenamed("id", "doc_id").selectExpr(
        "doc_id", f"{synth_pii_text_sql('doc_id')} AS text"
    )
    stage = str(tmp_path / "src")
    docs.coalesce(2).write.parquet(stage)
    stream = (
        spark.readStream.schema(docs.schema).format("parquet").load(stage)
    )
    q = (
        stream.select("doc_id", redact_pii_column("text").alias("red"))
        .writeStream.format("memory")
        .queryName("t_pii_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    got = {
        (r["doc_id"], r["red"])
        for r in spark.table("t_pii_stream").collect()
    }
    want = {
        (r["doc_id"], r["red"])
        for r in docs.select(
            "doc_id", redact_pii_column("text").alias("red")
        ).collect()
    }
    assert got == want
    assert any("<EMAIL>" in t or "<IP>" in t or "<PHONE>" in t
               for _, t in got)
