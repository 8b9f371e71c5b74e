"""Per-host boilerplate-line removal for web-corpus cleaning
(RefinedWeb / CCNet-style: Penedo et al. 2023 §3.2, Wenzek et al.
2020 — strip nav menus, cookie banners, footers that repeat across a
site's pages before any downstream quality or dedup stage).

A line is *boilerplate* for a host when it appears in at least
``min_docs`` distinct documents of that host AND in at least
``max_fraction`` of them.  ``strip_boilerplate`` removes those lines
from every document of the host, preserving the order of the
surviving lines, and leaves every other column untouched.

Scale shape (the 100 TB story):

* one ``posexplode`` scan (linear, no Python),
* line-frequency ``groupBy (host, line)`` — partial aggregation
  (map-side combine) collapses each host's repeats before the
  shuffle, so shuffle volume is ~distinct lines, not total lines,
* the boilerplate set is tiny relative to the corpus (only lines
  crossing the frequency threshold survive), so the anti-join's
  build side stays broadcast-able under AQE; hot hosts skew the
  (host, line) key and are split by AQE skew-join,
* one reassembly ``groupBy doc_id`` (collect surviving lines, sort
  by original position, re-join with ``\\n``).

There is no reference counterpart (the reference is a geometry
library); the rule comes from the published corpus-cleaning
literature and feeds ``operators/corpus_pipeline.clean_corpus``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MIN_DOCS = 2
DEFAULT_MAX_FRACTION = 0.5


def host_column(url_col: str = "url"):
    """The URL's capping/grouping host — DELEGATES to
    :func:`hostcap.host_column` so boilerplate grouping and per-host
    capping agree on what a host is (the old local regex captured
    through ``?``/``#``, so ``http://x.com?a=1`` produced pseudo-host
    ``x.com?a=1`` and diverged from the rest of the pipeline)."""
    from s2_geometry_library_php_spark.functions.hostcap import (
        host_column as _hostcap_host,
    )

    return _hostcap_host(url_col)


def _doc_lines(
    docs: DataFrame, text_col: str, url_col: str
) -> DataFrame:
    return docs.select(
        "doc_id",
        host_column(url_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    min_docs: int = DEFAULT_MIN_DOCS,
    max_fraction: float = DEFAULT_MAX_FRACTION,
) -> DataFrame:
    """``(host, line)`` pairs flagged as site boilerplate.

    A line qualifies when >= ``min_docs`` distinct docs of the host
    contain it and they make up >= ``max_fraction`` of the host's
    docs.  Blank lines never qualify (they are structure, not
    boilerplate).
    """
    lines = _doc_lines(docs, text_col, url_col)
    host_sizes = (
        docs.select("doc_id", host_column(url_col).alias("host"))
        .groupBy("host")
        .agg(F.countDistinct("doc_id").alias("n_host_docs"))
    )
    freq = (
        lines.where(F.length("line") > 0)
        .groupBy("host", "line")
        .agg(F.countDistinct("doc_id").alias("n_docs_with_line"))
    )
    return (
        freq.join(host_sizes, "host")
        .where(
            (F.col("n_docs_with_line") >= F.lit(int(min_docs)))
            & (
                F.col("n_docs_with_line")
                >= F.lit(float(max_fraction)) * F.col("n_host_docs")
            )
        )
        .select("host", "line", "n_docs_with_line", "n_host_docs")
    )


def strip_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    min_docs: int = DEFAULT_MIN_DOCS,
    max_fraction: float = DEFAULT_MAX_FRACTION,
) -> DataFrame:
    """``docs`` with per-host boilerplate lines removed from
    ``text_col`` (all other columns untouched, row count preserved).
    A document whose every line was boilerplate ends up with empty
    text — downstream length gates drop it."""
    boiler = boilerplate_lines(
        docs, text_col, url_col, min_docs, max_fraction
    ).select("host", "line")
    kept = (
        _doc_lines(docs, text_col, url_col)
        .join(boiler, ["host", "line"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "line"))
                    ),
                    lambda s: s["line"],
                ),
            ).alias("__clean_text")
        )
    )
    return (
        docs.join(kept, "doc_id", "left")
        .withColumn(
            text_col, F.coalesce(F.col("__clean_text"), F.lit(""))
        )
        .drop("__clean_text")
    )
