"""URL canonicalization + canonical-URL dedup (functions/urltools.py).

Covers: every documented rule on handcrafted cases, a Spark-vs-DuckDB
engine-parity grid over messy component combinations (the driver
oracle relies on the twin being byte-identical), and keeper semantics
of the dedup."""

import duckdb
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_php_spark.functions.urltools import (
    canonical_url_column,
    canonical_url_duckdb,
    synth_messy_url_sql,
    url_dedup,
    url_duplicate_groups,
)

CASES = [
    # (raw, canonical)
    ("  http://example.com/a  ", "http://example.com/a"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("HTTP://WWW.Example.COM:80/A/b/", "http://example.com/A/b"),
    ("https://www.example.com:443/", "https://example.com"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("https://example.com:80/x", "https://example.com:80/x"),
    (
        "http://a.com/p?utm_source=x&id=1&utm_campaign=y",
        "http://a.com/p?id=1",
    ),
    ("http://a.com/p?utm_medium=email", "http://a.com/p"),
    ("http://a.com/p/?fbclid=zz", "http://a.com/p"),
    ("http://a.com/p?ref=rss&id=2", "http://a.com/p?id=2"),
    # 'referrer' is NOT the tracking key 'ref'
    ("http://a.com/p?referrer=rss", "http://a.com/p?referrer=rss"),
    # uppercase UTM_ is not stripped (case-sensitive convention)
    ("http://a.com/p?UTM_SOURCE=x", "http://a.com/p?UTM_SOURCE=x"),
    # bare 'utm' (no underscore) is not a tracking key
    ("http://a.com/p?utm=x", "http://a.com/p?utm=x"),
    # path case preserved
    ("https://B.com/CaseSensitive/Path", "https://b.com/CaseSensitive/Path"),
    # no scheme: structural rules still apply, host untouched
    ("WWW.Example.com/a/?gclid=1#f", "WWW.Example.com/a"),
    # every rule at once
    (
        " HTTPS://WWW.News.Example.COM:443/World/2024/?utm_source=tw"
        "&utm_medium=social&page=2&igshid=abc#comments ",
        "https://news.example.com/World/2024?page=2",
    ),
]


def _spark_canon(spark, raws):
    df = spark.createDataFrame([(r,) for r in raws], "url string")
    return [
        r["c"]
        for r in df.select(
            canonical_url_column("url").alias("c")
        ).collect()
    ]


def _duck_canon(raws):
    con = duckdb.connect()
    expr = canonical_url_duckdb("url")
    return [
        con.execute(f"SELECT {expr} AS c FROM (SELECT ? AS url)", [r])
        .fetchone()[0]
        for r in raws
    ]


def test_canonical_cases_spark(spark):
    got = _spark_canon(spark, [r for r, _ in CASES])
    for (raw, want), g in zip(CASES, got):
        assert g == want, f"{raw!r}: {g!r} != {want!r}"


def test_canonical_cases_duckdb():
    got = _duck_canon([r for r, _ in CASES])
    for (raw, want), g in zip(CASES, got):
        assert g == want, f"{raw!r}: {g!r} != {want!r}"


def test_engine_parity_component_grid(spark):
    """Spark and the DuckDB twin agree byte-for-byte across a messy
    component grid (schemes × hosts × ports × paths × tails)."""
    schemes = ["http", "HTTPS", "ftp", ""]
    hosts = ["www.A.com", "a.com", "WWW.b.org:80", "c.net:443", "d.io:8080"]
    paths = ["", "/", "/x", "/x/", "/X/y/"]
    tails = [
        "",
        "?id=1",
        "?utm_source=a",
        "?utm_source=a&id=1",
        "?id=1&gclid=z&x=2",
        "?ref=a&utm_b=c",
        "#f",
        "?utm_a=1#f",
        "/?msclkid=9",
    ]
    raws = []
    for s in schemes:
        pre = f"{s}://" if s else ""
        for h in hosts[:3] if s == "" else hosts:
            for p in paths:
                for t in tails:
                    raws.append(f"{pre}{h}{p}{t}")
    s_out = _spark_canon(spark, raws)
    d_out = _duck_canon(raws)
    bad = [
        (r, a, b) for r, a, b in zip(raws, s_out, d_out) if a != b
    ]
    assert not bad, f"{len(bad)} parity mismatches, first: {bad[:3]}"


def test_synth_messy_url_shared_sql(spark):
    """The shared synth-URL SQL evaluates identically in both engines
    and the canonicalized form collapses the documented id-free
    variants (mod-364 collisions)."""
    ids = list(range(400))
    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long").select(
        "doc_id", F.expr(synth_messy_url_sql("doc_id")).alias("url")
    )
    srows = {r["doc_id"]: r["url"] for r in sdf.collect()}
    con = duckdb.connect()
    drows = dict(
        con.execute(
            f"SELECT doc_id, {synth_messy_url_sql('doc_id')} AS url "
            f"FROM (SELECT unnest(range(400)) AS doc_id)"
        ).fetchall()
    )
    assert srows == drows
    # ids congruent mod lcm(2,7,13,4)=364 rebuild the same components,
    # so 2 and 366 are exact re-crawls (dedup fodder); neighbours differ
    canon = dict(
        zip(
            ids,
            _spark_canon(spark, [srows[i] for i in ids]),
        )
    )
    assert srows[2] == srows[366] and canon[2] == canon[366]
    assert srows[2] != srows[3] and canon[2] != canon[3]


def test_url_dedup_keeper_semantics(spark):
    df = spark.createDataFrame(
        [
            (10, "http://www.a.com/x?utm_source=1"),
            (3, "HTTP://A.com/x/"),
            (7, "http://a.com/x#top"),
            (5, "https://a.com/x"),  # different scheme: distinct
            (9, "http://b.com/y"),
        ],
        "doc_id long, url string",
    )
    groups = {
        r["canonical_url"]: (r["dup_count"], r["keeper_doc_id"])
        for r in url_duplicate_groups(df).collect()
    }
    assert groups["http://a.com/x"] == (3, 3)
    assert groups["https://a.com/x"] == (1, 5)
    assert groups["http://b.com/y"] == (1, 9)
    kept = sorted(r["doc_id"] for r in url_dedup(df).collect())
    assert kept == [3, 5, 9]


def test_url_dedup_plan_is_aggregate_plus_semi_join(spark):
    df = spark.createDataFrame(
        [(1, "http://a.com/1")], "doc_id long, url string"
    )
    plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
