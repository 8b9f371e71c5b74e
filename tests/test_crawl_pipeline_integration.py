"""End-to-end connector integration: the north-star story in one test
file — read Common-Crawl-style pages through the ``s2crawl`` Python
DataSource, geocode them with the shared SQL derivation, clean the
corpus (gates + URL/exact/near dedup), tile-assign on S2 cells, and
commit metrics through the ``s2metrics`` sink.

Everything between the two connectors is the same lazy-plan machinery
the parquet-backed driver queries use; this file proves the connector
schema (BASELINE input_hint) is a drop-in for that machinery.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from s2_geometry_library_php_spark.operators.corpus_pipeline import (
    annotate_corpus,
    clean_corpus,
)
from s2_geometry_library_php_spark.sources.crawl_source import register_crawl_sources
from s2_geometry_library_php_spark.sources.documents import (
    GEOCODE_LAT_SQL,
    GEOCODE_LON_SQL,
)

SEGMENTS, ROWS = 4, 500
TOTAL = SEGMENTS * ROWS


@pytest.fixture(scope="module")
def crawl_docs(spark):
    """Crawl pages + geocode columns — the pipeline's input contract
    (doc_id, text, url, lat, lon)."""
    register_crawl_sources(spark)
    crawl = (
        spark.read.format("s2crawl")
        .option("segments", SEGMENTS)
        .option("rows_per_segment", ROWS)
        .load()
    )
    return crawl.withColumn("lat", F.expr(GEOCODE_LAT_SQL)).withColumn(
        "lon", F.expr(GEOCODE_LON_SQL)
    )


@pytest.fixture(scope="module")
def cleaned(spark, crawl_docs):
    return clean_corpus(
        spark,
        crawl_docs,
        langs=("en",),
        dedup_by_url=True,
        near_dup_threshold=None,  # exact-dedup stage proves itself below
    ).cache()


def test_crawl_pipeline_survivors_and_gates(spark, crawl_docs, cleaned):
    n = cleaned.count()
    assert 0 < n < TOTAL
    # the source plants ~5% exact duplicate texts: the exact-dedup stage
    # must leave no repeated text among survivors
    assert cleaned.groupBy("text").count().filter("count > 1").count() == 0
    # URL dedup ran on the CANONICAL form: no two survivors may share it
    from s2_geometry_library_php_spark.functions.urltools import canonical_url_column

    dup_canon = (
        cleaned.withColumn("c", canonical_url_column("url"))
        .groupBy("c")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup_canon == 0
    # language gate: every survivor's guess is the gated language
    assert cleaned.filter(F.col("lang_guess") != "en").count() == 0


def test_crawl_pipeline_tile_is_cell_prefix(spark, cleaned):
    """tile_id must be the level-8 shifted prefix of the leaf cell id —
    the same invariant the parquet-backed pipeline test asserts."""
    bad = cleaned.filter(
        F.col("tile_id") != F.expr(f"cast(shiftrightunsigned(cell_id, {64 - 3 - 16}) as long)")
    ).count()
    assert bad == 0


def test_crawl_pipeline_deterministic_rerun(spark, crawl_docs, cleaned):
    """Connector re-read + pipeline rerun = identical survivor set
    (closed-form synthesis + content-pure keep/drop decisions)."""
    again = clean_corpus(
        spark,
        crawl_docs,
        langs=("en",),
        dedup_by_url=True,
        near_dup_threshold=None,
    )
    a = sorted(r.doc_id for r in cleaned.select("doc_id").collect())
    b = sorted(r.doc_id for r in again.select("doc_id").collect())
    assert a == b


def test_crawl_pipeline_near_dup_subset(spark, crawl_docs, cleaned):
    """Adding the LSH near-dup stage can only remove survivors, and the
    planted exact duplicates guarantee it already removed some."""
    full = clean_corpus(
        spark,
        crawl_docs,
        langs=("en",),
        dedup_by_url=True,
        near_dup_threshold=0.8,
    )
    full_ids = {r.doc_id for r in full.select("doc_id").collect()}
    base_ids = {r.doc_id for r in cleaned.select("doc_id").collect()}
    assert full_ids <= base_ids
    assert len(full_ids) > 0


def test_crawl_pipeline_metrics_sink_roundtrip(spark, cleaned, tmp_path):
    """Survivors flow out through the s2metrics sink; the driver-side
    manifest must account for exactly the survivor rows."""
    out = str(tmp_path / "pipeline_metrics")
    n = cleaned.count()
    cleaned.select("doc_id", "url", "text", "tile_id").write.format(
        "s2metrics"
    ).mode("append").save(out)
    man = json.load(open(os.path.join(out, "_METRICS_MANIFEST.json")))
    assert man["rows"] == n
    assert man["text_bytes"] > 0
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert sorted(parts) == man["files"]


def test_crawl_annotate_runs_native(spark, crawl_docs):
    """annotate_corpus over the connector stays a single narrow plan:
    no Exchange may appear (signals are scalar SQL over the scan)."""
    ann = annotate_corpus(crawl_docs)
    plan = ann._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert ann.filter(F.col("cell_id").isNull()).count() == 0


def test_crawl_release_pipeline_all_stages(spark, crawl_docs, cleaned):
    """The FULL release chain over the connector: gates + URL dedup +
    exact dedup + decontamination + host cap + PII redaction in one
    lazy plan.  Survivors are a subset of the base clean set, per-host
    counts respect the cap, and no raw PII pattern survives in text."""
    from s2_geometry_library_php_spark.functions.hostcap import host_column
    from s2_geometry_library_php_spark.functions.pii import (
        pii_count_columns,
    )

    # the synthetic crawl texts are rotations of ONE short cyclic
    # word stream, so every narrow n-gram is corpus-universal (a
    # single doc's 13-grams hit all 797 survivors — measured);
    # n=25 is the narrowest width that distinguishes documents here
    bench = crawl_docs.where("doc_id = 0").select("text")
    release = clean_corpus(
        spark,
        crawl_docs,
        langs=("en",),
        dedup_by_url=True,
        near_dup_threshold=None,
        decontaminate_against=bench,
        decontaminate_n=25,
        max_docs_per_host=25,
        redact_pii=True,
    )
    rows = release.cache().collect()
    assert rows  # the chain must not silently empty the corpus
    ids = {r["doc_id"] for r in rows}
    base_ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    assert ids < base_ids
    # the benchmark doc itself never survives
    assert 0 not in ids
    # host cap holds
    per_host = (
        release.withColumn("h", host_column("url"))
        .groupBy("h")
        .count()
        .collect()
    )
    assert per_host and all(r["count"] <= 25 for r in per_host)
    # PII scrubbed: counting the patterns on the RELEASED text finds 0
    leftover = release.select(
        *[c.alias(n) for n, c in pii_count_columns("text").items()]
    ).agg(F.sum("n_email"), F.sum("n_ipv4"), F.sum("n_phone")).collect()[0]
    assert list(leftover) == [0, 0, 0]
