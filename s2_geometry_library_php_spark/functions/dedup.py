"""Deduplication operators for the web corpus: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Two implementations per operator where it matters at scale:

* a **native SQL** formulation (exact DuckDB twin for the driver's
  oracle) built on md5 — the only hash both engines share bit-for-bit,
* a **vectorized pandas-UDF** formulation for the 100 TB path (one
  Arrow pass per doc instead of an explode + shuffle of shingles).

Pipeline shapes (scale notes):
* exact dedup: hash-groupBy on the content fingerprint — one shuffle
  of (hash, id), combiner-friendly.
* MinHash LSH: signature is computed map-side (UDF) or via
  explode+min (SQL); candidate pairs come from an equi-join on band
  keys — never an all-pairs comparison.
* SimHash: 64-bit majority vote over token hashes, then band-exact
  match on 16-bit chunks for candidates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

NUM_HASHES = 16  # MinHash signature length
BANDS = 4  # LSH bands (rows per band = NUM_HASHES / BANDS)
SHINGLE = 3  # words per shingle


# --- shared shingle SQL (Spark) -------------------------------------------------
def shingles_column(text_col: str = "text"):
    """Distinct 3-word shingles as an array column (native)."""
    w = F.split(F.lower(F.col(text_col)), " ")
    n = F.size(w)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(SHINGLE - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(w, i, SHINGLE)),
    )
    return F.array_distinct(sh)


def shingles_duckdb(text_col: str = "text") -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len(string_split(lower({text_col}), ' ')) - {SHINGLE - 2}, 2)), "
        f"i -> array_to_string(string_split(lower({text_col}), ' ')[i:i+{SHINGLE - 1}], ' ')))"
    )


# --- exact dedup ------------------------------------------------------------------
def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents.
    Output: (fingerprint, dup_count, min_doc_id keeper)."""
    from .text import fingerprint_column

    return (
        docs.withColumn("fingerprint", fingerprint_column(text_col))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


# --- MinHash (native SQL formulation) ------------------------------------------------
def minhash_signature_sql(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sig array<string> of NUM_HASHES md5-min hex strings).

    Native formulation: explode shingles once, take NUM_HASHES salted
    mins in a single groupBy (partial aggregation map-side).
    """
    sh = docs.select("doc_id", F.explode(shingles_column(text_col)).alias("sh"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(str(k)), F.col("sh")).cast("binary"))).alias(
            f"mh{k}"
        )
        for k in range(NUM_HASHES)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig


def minhash_band_pairs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """LSH candidate duplicate pairs: docs sharing any band key.
    Output: (doc_a, doc_b) with doc_a < doc_b, distinct."""
    sig = minhash_signature_sql(docs, text_col)
    rows_per_band = NUM_HASHES // BANDS
    band_cols = []
    for b in range(BANDS):
        parts = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat(*parts).cast("binary")).alias("key"))
        )
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def minhash_duckdb_pairs(text_col: str = "text", table: str = "documents") -> str:
    """Exact DuckDB twin of :func:`minhash_band_pairs`."""
    sh = shingles_duckdb(text_col)
    mins = ", ".join(
        f"min(md5(concat('{k}', sh))) AS mh{k}" for k in range(NUM_HASHES)
    )
    rows_per_band = NUM_HASHES // BANDS
    band_selects = []
    for b in range(BANDS):
        parts = " || ".join(
            f"mh{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({parts}) AS key FROM sig"
        )
    banded = " UNION ALL ".join(band_selects)
    return f"""
WITH sh AS (
  SELECT doc_id, unnest({sh}) AS sh FROM {table}
), sig AS (
  SELECT doc_id, {mins} FROM sh GROUP BY doc_id
), banded AS (
  {banded}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# --- MinHash (vectorized UDF formulation — the scale path) -----------------------------
@F.pandas_udf(ArrayType(StringType()))
def minhash_signature_udf(text: pd.Series) -> pd.Series:
    """One-pass MinHash signature per document (no shingle explode /
    shuffle): identical output to :func:`minhash_signature_sql`."""

    def one(t: str) -> list[str]:
        if not t:
            return [""] * NUM_HASHES
        words = t.lower().split(" ")
        n = max(len(words) - (SHINGLE - 1), 1)
        shingles = {" ".join(words[i : i + SHINGLE]) for i in range(n)}
        out = []
        for k in range(NUM_HASHES):
            kb = str(k).encode()
            out.append(
                min(
                    hashlib.md5(kb + s.encode()).hexdigest() for s in shingles
                )
            )
        return out

    return text.map(one)


# --- SimHash -----------------------------------------------------------------------
@F.pandas_udf(LongType())
def simhash64_udf(text: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens (md5-derived token hashes):
    per-bit majority vote, vectorized with numpy bit unpacking."""

    def one(t: str) -> int:
        if not t:
            return 0
        words = t.lower().split(" ")
        hashes = np.frombuffer(
            b"".join(hashlib.md5(w.encode()).digest()[:8] for w in words),
            dtype=">u8",
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int32
        )
        votes = bits.sum(axis=0) * 2 - len(hashes)  # >0 => bit set
        word = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                word |= np.uint64(1) << np.uint64(i)
        return int(word.view(np.int64))

    return text.map(one)


def simhash_near_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup candidates: equal 16-bit SimHash chunk => candidate,
    verified by Hamming distance <= max_hamming (pigeonhole: any pair
    within distance 3 shares at least one of 4 chunks)."""
    sig = docs.withColumn("simhash", simhash64_udf(F.col(text_col)))
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftrightunsigned(F.col("simhash"), 16 * i)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("ckey"),
            )
            for i in range(4)
        ]
    )
    banded = sig.select(
        "doc_id", "simhash", F.explode(chunks).alias("c")
    ).select("doc_id", "simhash", "c.chunk", "c.ckey")
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(ham <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )


# --- n-gram Jaccard ------------------------------------------------------------------
def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    bucket_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Exact Jaccard over distinct word-3-gram sets for pairs within
    the same bucket (never all-pairs globally — bucket first, compare
    inside buckets).  Output: (doc_a, doc_b, jaccard)."""
    base = docs.select(
        "doc_id",
        F.col(bucket_col).alias("bucket"),
        shingles_column(text_col).alias("sh"),
    )
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.round(inter.cast("double") / union, 6)
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
