"""Corpus-global duplicate-paragraph removal (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better" — the
paragraph-granularity practical variant of ExactSubstr: a paragraph
that recurs verbatim across documents is boilerplate, a licence
block, or a syndicated snippet; keeping one copy removes the
memorization surface without touching unique prose).

Complements ``functions/boilerplate.py``: that stage is per-HOST
frequent-LINE removal (nav chrome), this one is corpus-GLOBAL
duplicate-PARAGRAPH removal with keep-first semantics.

A paragraph is *duplicated* when it appears verbatim in at least
``min_docs`` distinct documents and its trimmed length is at least
``min_chars`` (short fragments — headers, "Read more" — are left to
the line-level stage; removing them globally would shred documents).
``keep_first=True`` (the default) keeps the single occurrence with
the smallest ``(doc_id, pos)`` and removes every other occurrence;
``keep_first=False`` removes all occurrences.

Scale shape (the 100 TB story):

* one ``posexplode`` scan (linear, no Python);
* paragraph-frequency ``groupBy(paragraph)`` — ``countDistinct`` and
  ``min(struct(doc_id, pos))`` both partial-aggregate map-side, so
  shuffle volume is ~distinct paragraphs;
* the duplicated-paragraph set is tiny relative to the corpus (only
  paragraphs crossing the frequency threshold survive the filter),
  so the join's build side stays broadcast-able under AQE;
* one reassembly ``groupBy doc_id`` (surviving paragraphs sorted by
  original position, re-joined with the separator).

No reference counterpart (the reference is a geometry library); the
rule comes from the published dedup literature and feeds
``operators/corpus_pipeline.clean_corpus``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MIN_DOCS = 2
DEFAULT_MIN_CHARS = 30
#: paragraph separator — used BOTH as the split regex and the rejoin
#: literal, so it must be regex-safe (the default, a blank line, is)
DEFAULT_SEP = "\n\n"


def _doc_paragraphs(docs: DataFrame, text_col: str, sep: str) -> DataFrame:
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    )


def duplicate_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    sep: str = DEFAULT_SEP,
    min_docs: int = DEFAULT_MIN_DOCS,
    min_chars: int = DEFAULT_MIN_CHARS,
) -> DataFrame:
    """One row per duplicated paragraph: ``(para, n_docs, first_doc_id,
    first_pos)`` — the first occurrence in global ``(doc_id, pos)``
    order is the keeper under ``keep_first`` semantics."""
    paras = _doc_paragraphs(docs, text_col, sep)
    return (
        paras.where(F.length(F.trim("para")) >= F.lit(int(min_chars)))
        .groupBy("para")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(F.struct("doc_id", "pos")).alias("first_occ"),
        )
        .where(F.col("n_docs") >= F.lit(int(min_docs)))
        .select(
            "para",
            "n_docs",
            F.col("first_occ.doc_id").alias("first_doc_id"),
            F.col("first_occ.pos").alias("first_pos"),
        )
    )


def strip_duplicate_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    sep: str = DEFAULT_SEP,
    min_docs: int = DEFAULT_MIN_DOCS,
    min_chars: int = DEFAULT_MIN_CHARS,
    keep_first: bool = True,
) -> DataFrame:
    """``docs`` with duplicated paragraphs removed from ``text_col``
    (row count preserved, every other column untouched).  A document
    reduced to nothing ends up with empty text — downstream length
    gates drop it."""
    dup = duplicate_paragraphs(
        docs, text_col, sep, min_docs, min_chars
    ).select("para", "first_doc_id", "first_pos")
    paras = _doc_paragraphs(docs, text_col, sep)
    joined = paras.join(dup, "para", "left")
    if keep_first:
        drop = F.col("first_doc_id").isNotNull() & ~(
            (F.col("doc_id") == F.col("first_doc_id"))
            & (F.col("pos") == F.col("first_pos"))
        )
    else:
        drop = F.col("first_doc_id").isNotNull()
    kept = (
        joined.where(~drop)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
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


def strip_duplicate_paragraphs_py(
    rows: list[tuple[int, str]],
    sep: str = DEFAULT_SEP,
    min_docs: int = DEFAULT_MIN_DOCS,
    min_chars: int = DEFAULT_MIN_CHARS,
    keep_first: bool = True,
) -> dict[int, str]:
    """Pure-Python twin of :func:`strip_duplicate_paragraphs` over
    ``(doc_id, text)`` rows — the property-test oracle."""
    occ: dict[str, list[tuple[int, int]]] = {}
    split = {d: t.split(sep) for d, t in rows}
    for d, parts in split.items():
        for p, para in enumerate(parts):
            if len(para.strip()) >= min_chars:
                occ.setdefault(para, []).append((d, p))
    dup = {
        para: min(places)
        for para, places in occ.items()
        if len({d for d, _ in places}) >= min_docs
    }
    out = {}
    for d, parts in split.items():
        keep = []
        for p, para in enumerate(parts):
            if para in dup and not (keep_first and dup[para] == (d, p)):
                continue
            keep.append(para)
        out[d] = sep.join(keep)
    return out
