"""Python DataSource tests: the `s2crawl` reader (batch + streaming,
filter pushdown, determinism) and the `s2metrics` commit-coordinated
sink (sources/crawl_source.py).

The source's contract is the BASELINE input hint — Common-Crawl-style
pages (url, warc_ts, html, text, lang) — generated executor-side as
Arrow batches with closed-form hashing, so every test here is also a
determinism proof: re-reads, stream-reads and the driver-side
``synth_pages`` twin must agree byte-for-byte.
"""

import json
import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_php_spark.sources.crawl_source import (
    CrawlReader,
    register_crawl_sources,
    synth_pages,
)

SEGMENTS, ROWS = 4, 500
TOTAL = SEGMENTS * ROWS


@pytest.fixture(scope="module")
def crawl(spark):
    register_crawl_sources(spark)
    return (
        spark.read.format("s2crawl")
        .option("segments", SEGMENTS)
        .option("rows_per_segment", ROWS)
        .load()
    )


def _fingerprint(df):
    return df.select(
        F.count("*").alias("c"),
        F.sum(F.hash("doc_id", "url", "text", "lang")).alias("h"),
        F.sum(F.unix_timestamp("warc_ts")).alias("ts"),
        F.sum(F.crc32("html")).alias("html_crc"),
    ).collect()[0]


def test_batch_read_schema_rows_partitions(spark, crawl):
    assert [f.name for f in crawl.schema.fields] == [
        "doc_id", "url", "warc_ts", "html", "text", "lang",
    ]
    kinds = {f.name: f.dataType.simpleString() for f in crawl.schema.fields}
    assert kinds["html"] == "binary" and kinds["warc_ts"] == "timestamp"
    assert crawl.count() == TOTAL
    # one input partition per crawl segment
    assert crawl.rdd.getNumPartitions() == SEGMENTS


def test_batch_read_deterministic_and_matches_driver_twin(spark, crawl):
    a, b = _fingerprint(crawl), _fingerprint(crawl)
    assert a == b
    # executor-side generation == driver-side synth_pages twin
    sample = crawl.filter(F.col("doc_id") % 97 == 3).orderBy("doc_id").collect()
    ids = np.array([r.doc_id for r in sample], dtype=np.int64)
    twin = synth_pages(ids)
    assert [r.url for r in sample] == twin["url"]
    assert [r.text for r in sample] == twin["text"]
    assert [r.lang for r in sample] == list(twin["lang"])
    assert [bytes(r.html) for r in sample] == twin["html"]
    # warc_ts: epoch micros twin (timestamps are UTC micros internally)
    got_us = [int(r.warc_ts.timestamp() * 1e6) for r in sample]
    # tz-aware vs naive rendering can differ; compare modulo-day offset
    want_us = twin["warc_ts_us"].tolist()
    assert [(g - want_us[0]) for g in got_us] == [(w - want_us[0]) for w in want_us]


def test_extract_text_byte_identical_invariant(spark, crawl):
    """BASELINE per-row invariant: extracted text from html is
    byte-identical to the text column, per url."""
    from s2_geometry_library_php_spark.sources.documents import extract_text

    mism = (
        crawl.withColumn("extracted", extract_text(F.decode("html", "UTF-8")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert mism == 0


def test_pushdown_docid_range_prunes_segments(spark, crawl):
    pruned = crawl.filter(F.col("doc_id") >= 3 * ROWS)
    # plan-time segment pruning: only the last segment survives
    assert pruned.rdd.getNumPartitions() == 1
    rows = pruned.select("doc_id").collect()
    assert sorted(r.doc_id for r in rows) == list(range(3 * ROWS, TOTAL))
    # two-sided range across a segment boundary
    mid = crawl.filter((F.col("doc_id") > 700) & (F.col("doc_id") <= 1200))
    assert mid.rdd.getNumPartitions() == 2
    assert mid.count() == 500


def test_pushdown_lang_equality_matches_post_scan_filter(spark, crawl):
    # generation-side lang mask == Spark-side filter on the full scan
    pushed = crawl.filter(F.col("lang") == "de")
    full = crawl.withColumn("keep", F.col("lang") == "de").filter("keep").drop("keep")
    assert _fingerprint(pushed) == _fingerprint(full)
    # a filter the source can't handle stays correct (Spark evaluates it)
    residual = crawl.filter(F.col("url").contains("utm_source"))
    assert residual.count() == crawl.filter(F.col("doc_id") % 7 == 0).count()


def test_source_carries_duplicates_and_tracked_urls(spark, crawl):
    """The synthetic crawl must exercise the dedup + URL operators:
    exact-duplicate texts and tracking-parameter urls both present."""
    dup_groups = crawl.groupBy("text").count().filter("count > 1").count()
    assert dup_groups > 0
    tracked = crawl.filter(F.col("url").contains("?utm_source=")).count()
    assert tracked == len([d for d in range(TOTAL) if d % 7 == 0])


def test_streaming_available_now_equals_batch(spark, crawl):
    """Single-batch availableNow pass (Spark's fallback for Python
    micro-batch sources) must produce exactly the batch rows."""
    sdf = (
        spark.readStream.format("s2crawl")
        .option("segments", SEGMENTS)
        .option("rows_per_segment", ROWS)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("crawl_stream_an")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = _fingerprint(spark.table("crawl_stream_an"))
    assert got == _fingerprint(crawl)


def test_streaming_incremental_admission_multiple_batches(spark, crawl):
    """segments_per_batch=1 + processing-time trigger: the crawl is
    admitted one segment per micro-batch and still sums to the batch
    read (offset log = segment indices)."""
    sdf = (
        spark.readStream.format("s2crawl")
        .option("segments", SEGMENTS)
        .option("rows_per_segment", ROWS)
        .option("segments_per_batch", 1)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("crawl_stream_inc")
        .trigger(processingTime="1 second")
        .start()
    )
    deadline = time.time() + 180
    while time.time() < deadline:
        if spark.table("crawl_stream_inc").count() >= TOTAL:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(60)
    assert _fingerprint(spark.table("crawl_stream_inc")) == _fingerprint(crawl)
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) >= 2  # genuinely incremental, not one mega-batch


def test_push_filters_unit_semantics():
    """pushFilters keeps only what it exactly applies and yields the
    rest back (contract: returned filters are evaluated by Spark)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, LessThanOrEqual, IsNotNull

    r = CrawlReader({"segments": "8", "rows_per_segment": "100"})
    fs = [
        GreaterThan(("doc_id",), 150),
        LessThanOrEqual(("doc_id",), 420),
        EqualTo(("lang",), "fr"),
        IsNotNull(("url",)),  # unsupported -> must be yielded back
    ]
    residual = list(r.pushFilters(fs))
    assert residual == [fs[3]]
    assert (r.id_lo, r.id_hi, r.lang_eq) == (151, 420, "fr")
    segs = r._segments()
    assert [s.segment for s in segs] == [1, 2, 3, 4]


def test_metrics_sink_batch_manifest(spark, crawl, tmp_path):
    out = str(tmp_path / "metrics")
    crawl.write.format("s2metrics").mode("append").save(out)
    files = sorted(os.listdir(out))
    parts = [f for f in files if f.startswith("part-")]
    assert len(parts) == SEGMENTS
    man = json.load(open(os.path.join(out, "_METRICS_MANIFEST.json")))
    assert man["rows"] == TOTAL
    assert man["partitions"] == SEGMENTS
    assert man["files"] == parts
    per = sum(json.load(open(os.path.join(out, p)))["rows"] for p in parts)
    assert per == TOTAL
    assert man["text_bytes"] > 0


def test_metrics_sink_streaming_per_epoch_manifest(spark, tmp_path):
    register_crawl_sources(spark)
    out = str(tmp_path / "smetrics")
    ckpt = str(tmp_path / "ckpt")
    sdf = (
        spark.readStream.format("s2crawl")
        .option("segments", SEGMENTS)
        .option("rows_per_segment", ROWS)
        .load()
    )
    q = (
        sdf.writeStream.format("s2metrics")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(out)
    )
    q.awaitTermination(180)
    manifests = [f for f in os.listdir(out) if f.startswith("_METRICS_MANIFEST-")]
    assert manifests, f"no epoch manifest in {os.listdir(out)}"
    rows = sum(json.load(open(os.path.join(out, m)))["rows"] for m in manifests)
    assert rows == TOTAL
