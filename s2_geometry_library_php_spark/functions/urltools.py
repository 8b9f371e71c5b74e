"""URL canonicalization and canonical-URL deduplication for web
corpora (CCNet / C4-style: Wenzek et al. 2020 §2, Raffel et al. 2020
— crawls see the same page under `http://` vs `https://`, `www.` vs
bare host, tracking-parameter and fragment variants; deduplicating on
a canonical form removes those re-crawls before content-level dedup
ever runs).

Canonical form (deterministic, documented, applied in this order):

1. trim surrounding whitespace;
2. drop the fragment (``#...``);
3. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``mc_eid``, ``igshid``, ``ref``), repairing the
   ``?``/``&`` separators — key match is case-sensitive lowercase,
   the crawl-world convention;
4. collapse a trailing ``/`` (``/path/`` → ``/path``, ``/?q`` →
   ``?q``);
5. lowercase the scheme and host, strip a leading ``www.``, and strip
   the scheme's default port (``:80`` for http, ``:443`` for https —
   a non-default port is kept).  Path and query case is preserved
   (paths are case-sensitive on most origins).

Everything is a chain of native ``regexp_replace`` / ``regexp_extract``
expressions — JVM-side, whole-stage codegen, no Python in the hot
path — with an exact DuckDB twin (:func:`canonical_url_duckdb`) for
the driver's oracle checks.  Dedup itself is one hash-shuffle
``groupBy`` on the canonical string (min doc_id keeper — the same
deterministic policy as content-level exact dedup in
``functions/dedup.py``).

Scale shape: canonicalization is a per-row projection (linear, rides
the ingest scan); the dedup groupBy partial-aggregates map-side, so
shuffle volume is ~distinct URLs.  No reference counterpart (the
reference is a geometry library); the rules come from the published
corpus-cleaning literature and feed
``operators/corpus_pipeline.clean_corpus``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query keys dropped by canonicalization (case-sensitive, lowercase —
#: ``utm_`` takes any [A-Za-z0-9_]* suffix)
TRACKING_KEY_PATTERN = (
    r"(?:utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref)"
)

#: scheme pattern per RFC 3986 (letter then letters/digits/+/-/.)
_SCHEME = r"[A-Za-z][A-Za-z0-9+.\-]*"
_AUP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ALO = "abcdefghijklmnopqrstuvwxyz"


def canonical_url_column(url_col) -> Column:
    """The canonical form of ``url_col`` (column or name) as a native
    SQL expression chain — see the module docstring for the rule."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.trim(u)
    # 2. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. tracking params: interior '&k=v', then leading '?k=v&',
    #    then sole '?k=v'
    u = F.regexp_replace(u, rf"&{TRACKING_KEY_PATTERN}=[^&]*", "")
    u = F.regexp_replace(u, rf"\?{TRACKING_KEY_PATTERN}=[^&]*&", "?")
    u = F.regexp_replace(u, rf"\?{TRACKING_KEY_PATTERN}=[^&]*$", "")
    # 4. trailing slash (before the query, or at end-of-string)
    u = F.regexp_replace(u, r"/\?", "?")
    u = F.regexp_replace(u, r"/$", "")
    # 5. scheme + host normalization
    scheme = F.lower(F.regexp_extract(u, rf"^({_SCHEME})://", 1))
    # ASCII-only host lowering (ascii_lower_column rationale,
    # functions/text.py): engine Unicode lower() mappings disagree,
    # and RFC host comparison is ASCII-case-insensitive anyway
    host = F.translate(
        F.regexp_extract(u, rf"^{_SCHEME}://([^/?#]*)", 1),
        _AUP, _ALO,
    )
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")) \
        .when(scheme == "https", F.regexp_replace(host, r":443$", "")) \
        .otherwise(host)
    rest = F.regexp_replace(u, rf"^{_SCHEME}://[^/?#]*", "")
    return F.when(
        scheme == "", u  # no scheme — steps 1-4 only
    ).otherwise(F.concat(scheme, F.lit("://"), host, rest))


def canonical_url_duckdb(url_expr: str) -> str:
    """DuckDB scalar expression computing the identical canonical
    form (RE2 regexes, 'g' flag everywhere to match Spark's
    always-global ``regexp_replace``)."""
    k = TRACKING_KEY_PATTERN
    u = f"trim({url_expr})"
    u = f"regexp_replace({u}, '#.*$', '', 'g')"
    u = f"regexp_replace({u}, '&{k}=[^&]*', '', 'g')"
    u = f"regexp_replace({u}, '\\?{k}=[^&]*&', '?', 'g')"
    u = f"regexp_replace({u}, '\\?{k}=[^&]*$', '', 'g')"
    u = f"regexp_replace({u}, '/\\?', '?', 'g')"
    u = f"regexp_replace({u}, '/$', '', 'g')"
    s = rf"lower(regexp_extract({u}, '^({_SCHEME})://', 1))"
    h = (
        rf"translate(regexp_extract({u}, '^{_SCHEME}://([^/?#]*)', 1), "
        rf"'{_AUP}', '{_ALO}')"
    )
    h = f"regexp_replace({h}, '^www\\.', '', 'g')"
    h = (
        f"CASE WHEN {s} = 'http' THEN regexp_replace({h}, ':80$', '', 'g') "
        f"WHEN {s} = 'https' THEN regexp_replace({h}, ':443$', '', 'g') "
        f"ELSE {h} END"
    )
    r = rf"regexp_replace({u}, '^{_SCHEME}://[^/?#]*', '', 'g')"
    return (
        f"CASE WHEN {s} = '' THEN {u} "
        f"ELSE {s} || '://' || {h} || {r} END"
    )


def synth_messy_url_sql(id_col: str = "doc_id") -> str:
    """Deterministic 'messy crawl URL' generator as a SQL scalar
    expression valid in BOTH Spark SQL and DuckDB (``CAST(.. AS
    STRING)``, ``%``, ``||`` and simple ``CASE`` are common syntax) —
    shared by tests and the driver oracle so both engines feed the
    canonicalizer byte-identical input.  Cycles scheme case,
    ``WWW.``/port noise, trailing slashes, tracking params and
    fragments so every canonicalization rule fires; ids congruent
    mod lcm(2,7,13,4)=364 in the no-id variants collide after
    canonicalization, exercising keeper selection."""
    d = id_col
    return (
        f"CASE WHEN {d} % 2 = 0 THEN 'HTTP' ELSE 'https' END || "
        f"'://WWW.Site' || CAST({d} % 7 AS STRING) || '.Example.COM' || "
        f"CASE WHEN {d} % 4 = 2 THEN ':80' ELSE '' END || "
        f"'/Article/' || CAST({d} % 13 AS STRING) || "
        f"CASE WHEN {d} % 4 = 0 THEN '/' ELSE '' END || "
        f"CASE {d} % 4 "
        f"WHEN 0 THEN '?utm_source=feed&id=' || CAST({d} AS STRING) "
        f"|| '&utm_campaign=Spring' "
        f"WHEN 1 THEN '?id=' || CAST({d} AS STRING) || '&fbclid=XYZ123#frag' "
        f"WHEN 2 THEN '?utm_medium=email' "
        f"ELSE '#Section-2' END"
    )


def url_duplicate_groups(
    docs: DataFrame, url_col: str = "url"
) -> DataFrame:
    """One row per canonical URL: ``(canonical_url, dup_count,
    keeper_doc_id)`` with the smallest doc_id as keeper — the same
    deterministic policy as content-level ``exact_duplicate_groups``.
    Map-side partial aggregation collapses each partition's repeats
    before the hash shuffle on the canonical string."""
    return (
        docs.select(
            "doc_id", canonical_url_column(url_col).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


def url_dedup(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """``docs`` with only the min-doc_id row per canonical URL kept
    (all columns untouched).  One groupBy shuffle + one left-semi
    hash join on doc_id."""
    keepers = url_duplicate_groups(docs, url_col).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    return docs.join(keepers, "doc_id", "left_semi")
