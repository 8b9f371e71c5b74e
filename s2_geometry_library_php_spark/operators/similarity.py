"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk_brute` — exact baseline: broadcast the (small)
  query set against the corpus, one pass, window top-k.  Native
  ``aggregate``/``zip_with`` column math — no Python.
* :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH
  bucketing (deterministic hyperplanes), candidates only from matching
  buckets (multi-probe over B tables), exact re-rank inside buckets.
  Sub-linear candidates per query at 100 TB; recall tuned by
  (n_planes, n_tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

ROUND = 6  # similarity rounding for engine-parity + deterministic ranking


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity_col(a, b):
    """Rounded cosine similarity between two array<double> columns."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), ROUND)


def cosine_topk_brute(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: corpus x broadcast(queries).

    Ranking key is the ROUNDED similarity with id tiebreak, making the
    result deterministic and engine-portable."""
    e = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_q"),
    )
    joined = e.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col(query_id_col)
    )
    sim = cosine_similarity_col(F.col("_v"), F.col("_q")).alias("cosine")
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        joined.select(query_id_col, id_col, sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, table: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (seeded by table id)."""
    rng = np.random.default_rng(977 + 131 * table)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_udf(dim: int, n_planes: int, n_tables: int):
    """Sign-pattern bucket ids, one per table, as an Arrow-batched UDF."""
    planes = [_hyperplanes(dim, n_planes, t) for t in range(n_tables)]
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def buckets(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(vec.to_numpy())  # (N, dim) float32
        out = np.empty((len(mat), n_tables), dtype=np.int64)
        for t in range(n_tables):
            signs = (mat @ planes[t].T) > 0  # (N, n_planes)
            out[:, t] = signs @ weights
        return pd.Series([row.tolist() for row in out.astype(np.int32)])

    return buckets


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: equi-join on (table, bucket), exact cosine
    re-rank of the candidates.  Candidates per query ~ N * tables /
    2^planes instead of N."""
    buckets = lsh_bucket_udf(dim, n_planes, n_tables)

    def banded(df: DataFrame, idc: str) -> DataFrame:
        return (
            df.withColumn("_b", buckets(F.col(vec_col)))
            .select(
                idc,
                vec_col,
                F.posexplode("_b").alias("_table", "_bucket"),
            )
        )

    e = banded(embeddings, id_col)
    q = banded(queries, query_id_col).withColumnRenamed(vec_col, "_qvec")
    cand = e.join(
        F.broadcast(q),
        (e._table == q._table) & (e._bucket == q._bucket),
    ).where(F.col(id_col) != F.col(query_id_col))
    sim = cosine_similarity_col(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.transform(F.col("_qvec"), lambda x: x.cast("double")),
    ).alias("cosine")
    dedup = (
        cand.select(query_id_col, id_col, sim)
        .groupBy(query_id_col, id_col)
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return dedup.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
