"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk_brute` — exact baseline: broadcast the (small)
  query set against the corpus, one pass, window top-k.  Native
  ``aggregate``/``zip_with`` column math — no Python.
* :func:`ann_lsh_topk` — the scale path: random-hyperplane LSH
  bucketing (deterministic hyperplanes), candidates only from matching
  buckets, exact re-rank inside buckets.  MULTI-PROBE: each query also
  probes every Hamming-1 (and with n_flip=2, Hamming-2) neighbor
  bucket, generated on the tiny query side as a native explode — the
  corpus side is bucketed once and only ever hash-probed.  Candidates
  per query ~ N * tables * n_probes / 2^planes.  The synthetic corpus
  is the LSH worst case (top-10 cosine ~0.3 vs ~0 median: collision
  exponent rho = ln p_near / ln p_rand ~ 0.74), so high recall at
  N=500 costs a large fraction of N — but the candidate count is
  N^rho-shaped, so the fraction FALLS as N grows; planes should scale
  with log2(N) to keep per-bucket occupancy constant.
* :func:`ann_lsh_stats` — per-query candidate count + recall vs the
  exact top-k, the driver-visible evidence that the candidate set is
  sub-N and recall holds.
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
    # Norms are per-VECTOR, so hoist them out of the pair expression:
    # computed inside cosine_similarity_col they re-run once per
    # (corpus row x query) pair — 2 extra array folds per pair.  The
    # hoisted columns evaluate the IDENTICAL expression per row, so
    # every pair's similarity is bit-for-bit the same (the DuckDB
    # oracle parity is untouched); per-pair work drops to one dot.
    e = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    ).withColumn("_vn", _norm(F.col("_v")))
    q = queries.select(
        F.col(query_id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_q"),
    ).withColumn("_qn", _norm(F.col("_q")))
    joined = e.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col(query_id_col)
    )
    sim = F.round(
        _dot(F.col("_v"), F.col("_q")) / (F.col("_vn") * F.col("_qn")),
        ROUND,
    ).alias("cosine")
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


def lsh_planes_for(n_vecs: int) -> int:
    """Hyperplane count scaled to the corpus: planes ~ log2(N) keeps
    bucket occupancy at ~1-2 vectors per table, so candidates per
    query stay ~ n_tables * n_probes INDEPENDENT of N — the property
    that makes bucketed ANN the 100 TB path.  A fixed plane count
    (e.g. the 10-plane default, right for the sf0.01 oracle corpus)
    degrades toward brute force as N grows past 2^planes: at N=40k it
    measured a 0.58 candidate fraction and ran slower than the brute
    baseline."""
    import math

    return max(8, min(24, int(math.ceil(math.log2(max(n_vecs, 2))))))


def ivf_lists_for(n_vecs: int) -> int:
    """Inverted-list count scaled to the corpus: n_lists ~ sqrt(N)
    balances the two linear terms of IVF query cost (centroid scan
    ~n_lists + candidate scan ~n_probe*N/n_lists), the standard IVF
    sizing.  This is the documented BASELINE.md scaling claim made a
    code default (round-3 left it bench-side only)."""
    import math

    return max(8, int(round(math.sqrt(max(n_vecs, 1)))))


def _lsh_candidates(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    n_flip: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Distinct (query_id, vec_id, cosine) candidates via multi-probe
    LSH: the corpus is bucketed once; each query probes its own bucket
    plus (with n_flip >= 1) every Hamming-1 bucket per table — the
    probe fan-out lives entirely on the broadcast query side."""
    buckets = lsh_bucket_udf(dim, n_planes, n_tables)

    def banded(df: DataFrame, idc: str) -> DataFrame:
        # cast + norm hoisted to ONE evaluation per (vector, table)
        # row — inside the pair expression they would re-run once per
        # candidate; value-identical (same expression, same doubles)
        vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        return (
            df.withColumn("_b", buckets(F.col(vec_col)))
            .withColumn("_vd", vd)
            .withColumn("_vn", _norm(F.col("_vd")))
            .select(
                idc,
                "_vd",
                "_vn",
                F.posexplode("_b").alias("_table", "_bucket"),
            )
        )

    e = banded(embeddings, id_col)
    q = (
        banded(queries, query_id_col)
        .withColumnRenamed("_vd", "_qvec")
        .withColumnRenamed("_vn", "_qn")
    )
    if n_flip >= 1:
        flips = [0] + [1 << i for i in range(n_planes)]
        if n_flip >= 2:
            flips += [
                (1 << i) | (1 << j)
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            ]
        probe_set = F.array(
            *[F.col("_bucket").bitwiseXOR(F.lit(m)) for m in flips]
        )
        q = q.withColumn("_probe", F.explode(probe_set)).drop("_bucket")
    else:
        q = q.withColumnRenamed("_bucket", "_probe")
    cand = e.join(
        F.broadcast(q),
        (e["_table"] == q["_table"]) & (e["_bucket"] == q["_probe"]),
    ).where(F.col(id_col) != F.col(query_id_col))
    sim = F.round(
        _dot(F.col("_vd"), F.col("_qvec")) / (F.col("_vn") * F.col("_qn")),
        ROUND,
    ).alias("cosine")
    return (
        cand.select(query_id_col, id_col, sim)
        .groupBy(query_id_col, id_col)
        .agg(F.max("cosine").alias("cosine"))
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int = 16,
    n_flip: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_vecs: int | None = None,
) -> DataFrame:
    """Approximate top-k: multi-probe equi-join on (table, bucket),
    exact cosine re-rank of the distinct candidates.  Candidates per
    query ~ N * tables * (1 + planes) / 2^planes instead of N.
    Deterministic (seeded hyperplanes, rounded-cosine + id-tiebreak
    ranking), so the result is oracle-checkable bit-for-bit.

    ``n_planes=None`` (default) auto-sizes to ``lsh_planes_for(N)``
    — the scaling rule BASELINE.md documents, now the code default;
    the numpy twin applies the identical rule so oracles stay exact.
    Pass ``n_vecs`` when the corpus count is already known to skip
    the sizing count (it re-runs the whole upstream plan when the
    corpus is an expensive unmaterialized pipeline)."""
    if n_planes is None:
        n_planes = lsh_planes_for(
            n_vecs if n_vecs is not None else embeddings.count()
        )
    dedup = _lsh_candidates(
        embeddings, queries, dim, n_planes, n_tables, n_flip,
        id_col, vec_col, query_id_col,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return dedup.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 16,
    n_flip: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: corpus SELF-join on LSH
    buckets (never all-pairs), exact cosine >= threshold on the
    candidates.  One side expands its buckets by Hamming-1 flips, so a
    pair is a candidate iff some table puts them within Hamming
    distance ``n_flip`` — the standard banding shape whose shuffle is
    keyed on (table, bucket), not N².

    Approximate by design (a pair missed by every table is not
    emitted) but fully DETERMINISTIC: seeded hyperplanes + rounded
    cosine, so the numpy twin reproduces the result row-for-row.
    Output: (id_a, id_b, cosine6)."""
    buckets = lsh_bucket_udf(dim, n_planes, n_tables)
    # cast + norm hoisted to one evaluation per (vector, table) row
    # (value-identical; inside the pair expression they re-ran per
    # candidate pair)
    banded = (
        embeddings.withColumn("_b", buckets(F.col(vec_col)))
        .withColumn(
            "_vd", F.transform(F.col(vec_col), lambda x: x.cast("double"))
        )
        .withColumn("_vn", _norm(F.col("_vd")))
        .select(
            id_col, "_vd", "_vn",
            F.posexplode("_b").alias("_table", "_bucket"),
        )
    )
    flips = [0] + ([1 << i for i in range(n_planes)] if n_flip >= 1 else [])
    if n_flip >= 2:
        flips += [
            (1 << i) | (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    probe = banded.select(
        F.col(id_col).alias("_ida"),
        F.col("_vd").alias("_va"),
        F.col("_vn").alias("_na"),
        "_table",
        F.explode(
            F.array(*[F.col("_bucket").bitwiseXOR(F.lit(m)) for m in flips])
        ).alias("_probe"),
    )
    right = banded.select(
        F.col(id_col).alias("_idb"),
        F.col("_vd").alias("_vb"),
        F.col("_vn").alias("_nb"),
        F.col("_table").alias("_tableb"),
        "_bucket",
    )
    cand = probe.join(
        right,
        (F.col("_table") == F.col("_tableb"))
        & (F.col("_probe") == F.col("_bucket"))
        & (F.col("_ida") < F.col("_idb")),
    )
    sim = F.round(
        _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
        ROUND,
    ).alias("cosine6")
    return (
        cand.select(
            F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"), sim
        )
        .where(F.col("cosine6") >= threshold)
        .groupBy("id_a", "id_b")
        .agg(F.max("cosine6").alias("cosine6"))
    )


def near_dup_numpy_twin(
    ids: np.ndarray,
    vecs: np.ndarray,
    threshold: float = 0.4,
    n_planes: int = 10,
    n_tables: int = 16,
    n_flip: int = 1,
) -> list[tuple]:
    """Numpy twin of :func:`embedding_near_dup_pairs`: a pair is a
    candidate iff some table has Hamming(bucket_i, bucket_j) <=
    n_flip; exact rounded cosine filters."""
    vecs32 = np.asarray(vecs, dtype=np.float32)
    dim = vecs32.shape[1]
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    buckets = np.empty((len(ids), n_tables), dtype=np.int64)
    for t in range(n_tables):
        signs = (vecs32 @ _hyperplanes(dim, n_planes, t).T) > 0
        buckets[:, t] = signs @ weights
    vecs64 = vecs32.astype(np.float64)
    norms = np.sqrt((vecs64 * vecs64).sum(axis=1))
    out = []
    n = len(ids)
    # vectorized per-table Hamming: popcount of xor <= n_flip
    cand = np.zeros((n, n), dtype=bool)
    for t in range(n_tables):
        x = buckets[:, t][:, None] ^ buckets[:, t][None, :]
        pop = np.zeros_like(x)
        v = x.copy()
        while np.any(v):
            pop += v & 1
            v >>= 1
        cand |= pop <= n_flip
    iu = np.triu_indices(n, k=1)
    for i, j in zip(*iu):
        if not cand[i, j]:
            continue
        cos = round(
            float(vecs64[i] @ vecs64[j] / (norms[i] * norms[j])), ROUND
        )
        if cos >= threshold:
            out.append((int(ids[i]), int(ids[j]), cos))
    return out


def lsh_numpy_twin(
    ids: np.ndarray,
    vecs: np.ndarray,
    query_ids: list[int],
    k: int,
    n_planes: int | None = None,
    n_tables: int = 16,
    n_flip: int = 2,
) -> tuple[list[tuple], list[tuple]]:
    """Pure-numpy twin of :func:`ann_lsh_topk` + :func:`ann_lsh_stats`
    for kernel-backed oracles: same seeded hyperplanes, same float32
    input / float64 matmul as the UDF, same rounded-cosine + id
    tiebreak.  Returns (topk_rows, stats_rows) where topk_rows =
    (query_id, vec_id, rank) and stats_rows = (query_id, n_candidates,
    recall6).  ``n_planes=None`` auto-sizes to ``lsh_planes_for(N)``,
    the same rule as the Spark path."""
    if n_planes is None:
        n_planes = lsh_planes_for(len(ids))
    vecs32 = np.asarray(vecs, dtype=np.float32)
    dim = vecs32.shape[1]
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    buckets = np.empty((len(ids), n_tables), dtype=np.int64)
    for t in range(n_tables):
        signs = (vecs32 @ _hyperplanes(dim, n_planes, t).T) > 0
        buckets[:, t] = signs @ weights
    vecs64 = vecs32.astype(np.float64)
    norms = np.sqrt((vecs64 * vecs64).sum(axis=1))
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    topk_rows: list[tuple] = []
    stats_rows: list[tuple] = []
    for qid in query_ids:
        qr = id_to_row[qid]
        cand_mask = np.zeros(len(ids), dtype=bool)
        for t in range(n_tables):
            qb = int(buckets[qr, t])
            probes = {qb}
            if n_flip >= 1:
                probes |= {qb ^ (1 << i) for i in range(n_planes)}
            if n_flip >= 2:
                probes |= {
                    qb ^ (1 << i) ^ (1 << j)
                    for i in range(n_planes)
                    for j in range(i + 1, n_planes)
                }
            cand_mask |= np.isin(buckets[:, t], list(probes))
        cand_mask[qr] = False
        cand = np.nonzero(cand_mask)[0]
        cos = np.round(
            (vecs64[cand] @ vecs64[qr]) / (norms[cand] * norms[qr]), ROUND
        )
        order = np.lexsort((ids[cand], -cos))
        top = cand[order[:k]]
        for r, row in enumerate(top, start=1):
            topk_rows.append((int(qid), int(ids[row]), r))
        # exact top-k for recall
        all_mask = np.ones(len(ids), dtype=bool)
        all_mask[qr] = False
        allr = np.nonzero(all_mask)[0]
        cos_all = np.round(
            (vecs64[allr] @ vecs64[qr]) / (norms[allr] * norms[qr]), ROUND
        )
        exact = set(
            ids[allr[np.lexsort((ids[allr], -cos_all))[:k]]].tolist()
        )
        hits = len(exact & set(ids[top].tolist()))
        stats_rows.append(
            (int(qid), int(len(cand)), round(hits / float(k), 6))
        )
    return topk_rows, stats_rows


def ann_lsh_stats(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int = 64,
    n_planes: int | None = None,
    n_tables: int = 16,
    n_flip: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_vecs: int | None = None,
) -> DataFrame:
    """Per-query LSH quality evidence: (query_id, n_candidates,
    recall6) where recall6 = |LSH top-k ∩ exact top-k| / k rounded to
    6 places.  n_candidates measured from the same candidate set the
    top-k ranks over — the sub-linearity witness the 100 TB story
    rests on.  ``n_planes=None`` auto-sizes like :func:`ann_lsh_topk`
    (pass ``n_vecs`` to skip the sizing count)."""
    if n_planes is None:
        n_planes = lsh_planes_for(
            n_vecs if n_vecs is not None else embeddings.count()
        )
    dedup = _lsh_candidates(
        embeddings, queries, dim, n_planes, n_tables, n_flip,
        id_col, vec_col, query_id_col,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    lsh_topk = dedup.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    n_cand = dedup.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("n_candidates")
    )
    exact = cosine_topk_brute(
        embeddings, queries, k, id_col, vec_col, query_id_col
    ).select(query_id_col, id_col)
    hits = (
        lsh_topk.select(query_id_col, id_col)
        .join(exact, [query_id_col, id_col], "inner")
        .groupBy(query_id_col)
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return (
        n_cand.join(hits, query_id_col, "left")
        .select(
            query_id_col,
            "n_candidates",
            F.round(
                F.coalesce(F.col("_hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("recall6"),
        )
    )


# --- IVF (inverted-file) ANN: the second scale path ---------------------------------
#: quantizer training-sample budget per inverted list — the standard
#: IVF heuristic (FAISS trains on 39-256 points per centroid)
TRAIN_PER_LIST = 256


def sample_training_vectors(
    embeddings: DataFrame,
    n_lists: int,
    per_list: int = TRAIN_PER_LIST,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "tuple[np.ndarray, np.ndarray]":
    """Deterministic BOUNDED quantizer-training sample: the
    ``per_list * n_lists`` rows with the smallest sampling priority
    (operators/sampling's quadratic id mix), returned sorted by id.

    Driver-memory bound: ``orderBy(priority).limit(cap)`` plans as
    TakeOrderedAndProject — every partition keeps at most ``cap``
    rows and the driver merges partition top-Ks, so the collect is
    O(cap * dim) REGARDLESS of corpus size (at 10^9 vectors the old
    full-table fetchall was a driver OOM; cap = 256·√N lists ≈ 8M
    rows at that scale, and per_list can be lowered further).

    numpy twin: :func:`training_sample_mask` — selects the identical
    id set, so the oracle trains the identical quantizer."""
    from s2_geometry_library_php_spark.operators.sampling import (
        sample_priority_column,
    )

    cap = int(per_list) * int(n_lists)
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(sample_priority_column(id_col), F.col(id_col))
        .limit(cap)
        .collect()
    )
    rows.sort(key=lambda r: r[0])  # id order fixes the k-means init
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    vecs = np.asarray([r[1] for r in rows], dtype=np.float64)
    return ids, vecs


def training_sample_mask(
    ids: np.ndarray, n_lists: int, per_list: int = TRAIN_PER_LIST
) -> np.ndarray:
    """Boolean mask over ``ids`` matching
    :func:`sample_training_vectors`'s keeper set (same quadratic
    priority, same (priority, id) order, same cap)."""
    from s2_geometry_library_php_spark.operators.sampling import (
        DEFAULT_SALT,
        MIX_C1,
        MODULUS,
    )

    ids = np.asarray(ids, dtype=np.int64)
    cap = int(per_list) * int(n_lists)
    x = np.mod(ids, MODULUS)
    y = (x * x + MIX_C1) % MODULUS
    pri = (y * y + DEFAULT_SALT) % MODULUS
    order = np.lexsort((ids, pri))
    mask = np.zeros(len(ids), dtype=bool)
    mask[order[:cap]] = True
    return mask


def train_ivf_centroids(
    vecs: np.ndarray, n_lists: int | None = None, n_iters: int = 10,
    seed: int = 977,
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer (driver-side,
    over a SAMPLE at production scale): seeded centroid init, fixed
    Lloyd iteration count, cosine assignment with lowest-index tie
    break — every run reproduces the same centroids bit-for-bit, so
    the Spark path and the numpy oracle twin agree exactly.
    ``n_lists=None`` auto-sizes to ``ivf_lists_for(len(vecs))``
    (~sqrt N)."""
    v = np.asarray(vecs, dtype=np.float64)
    if n_lists is None:
        n_lists = ivf_lists_for(len(v))
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(v), size=min(n_lists, len(v)), replace=False)
    cent = v[np.sort(idx)].copy()
    for _ in range(n_iters):
        assign = np.argmax(v @ cent.T, axis=1)  # ties -> lowest index
        for c in range(len(cent)):
            members = v[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def ivf_assign_udf(centroids: np.ndarray):
    """Arrow-batched nearest-centroid assignment (one matmul per
    batch)."""
    cent = np.asarray(centroids, dtype=np.float64)

    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def assign(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack(vec.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series(np.argmax(mat @ cent.T, axis=1).astype(np.int32))

    return assign


def ann_ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    centroids: np.ndarray,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN: corpus partitioned once into inverted lists by nearest
    centroid; each query probes its ``n_probe`` nearest lists via a
    broadcast equi-join on the list id; exact cosine re-rank on the
    candidates.  Candidates per query ~ N * n_probe / n_lists.

    The coarse quantizer is trained driver-side over a sample
    (:func:`train_ivf_centroids`) — the standard IVF shape: centroids
    are a broadcast dimension, the corpus is scanned once to assign
    lists (a persisted column in production), and queries never touch
    more than their probed lists."""
    assign = ivf_assign_udf(centroids)
    cent = np.asarray(centroids, dtype=np.float64)
    # cast + norm hoisted to one evaluation per corpus row
    # (value-identical; inside the pair expression they re-ran per
    # candidate pair)
    e = (
        embeddings.withColumn("_list", assign(F.col(vec_col)))
        .withColumn(
            "_vd", F.transform(F.col(vec_col), lambda x: x.cast("double"))
        )
        .withColumn("_vn", _norm(F.col("_vd")))
    )

    # query-side probe lists computed driver-free via the same UDF
    # would give only the top-1; expand to n_probe lists with a
    # small pandas UDF on the (tiny) query side
    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def probes(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(vec.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ cent.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    q = (
        queries.withColumn("_probes", probes(F.col(vec_col)))
        .withColumn(
            "_qd", F.transform(F.col(vec_col), lambda x: x.cast("double"))
        )
        .withColumn("_qn", _norm(F.col("_qd")))
        .select(
            query_id_col,
            F.col("_qd").alias("_qvec"),
            "_qn",
            F.explode("_probes").alias("_list"),
        )
    )
    cand = e.join(F.broadcast(q), "_list").where(
        F.col(id_col) != F.col(query_id_col)
    )
    sim = F.round(
        _dot(F.col("_vd"), F.col("_qvec")) / (F.col("_vn") * F.col("_qn")),
        ROUND,
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


def ivf_numpy_twin(
    ids: np.ndarray,
    vecs: np.ndarray,
    query_ids: list[int],
    k: int,
    centroids: np.ndarray,
    n_probe: int = 4,
) -> list[tuple]:
    """Numpy twin of :func:`ann_ivf_topk` for the kernel-backed
    oracle: same centroids, same assignment/probe/tie rules, same
    rounded-cosine ranking.  Returns (query_id, vec_id, rank) rows."""
    cent = np.asarray(centroids, dtype=np.float64)
    v64 = np.asarray(vecs, dtype=np.float64)
    vn = v64 / np.linalg.norm(v64, axis=1, keepdims=True)
    assign = np.argmax(vn @ cent.T, axis=1)
    norms = np.linalg.norm(v64, axis=1)
    id_to_row = {int(i): r for r, i in enumerate(ids)}
    rows: list[tuple] = []
    for qid in query_ids:
        qr = id_to_row[qid]
        sims_c = vn[qr] @ cent.T
        probe = np.argsort(-sims_c, kind="stable")[:n_probe]
        mask = np.isin(assign, probe)
        mask[qr] = False
        cand = np.nonzero(mask)[0]
        cos = np.round(
            (v64[cand] @ v64[qr]) / (norms[cand] * norms[qr]), ROUND
        )
        order = np.lexsort((ids[cand], -cos))
        for r, row in enumerate(cand[order[:k]], start=1):
            rows.append((int(qid), int(ids[row]), r))
    return rows


# --------------------------------------------------------------- SemDeDup
def semdedup_lists_for(n_vecs: int, target_cluster: int = 1024) -> int:
    """Cluster count for :func:`semdedup_drops`: within-cluster work
    is quadratic in cluster size, so the list count scales LINEARLY
    with N (fixed target cluster size) — total pairwise work is then
    O(N * target_cluster), linear in the corpus.  (Contrast
    :func:`ivf_lists_for`'s ~sqrt N, which balances scan-vs-probe for
    ANN; that choice would make SemDeDup's per-cluster work grow with
    N.)"""
    return max(1, int(np.ceil(n_vecs / target_cluster)))


def semdedup_drops(
    embeddings: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"): semantic
    near-duplicate pruning via k-means clusters.  Each vector joins
    its nearest centroid's cluster (same deterministic spherical
    quantizer as IVF, :func:`train_ivf_centroids` — argmax cosine,
    lowest index on ties); pairs are compared ONLY within a cluster;
    a vector is DROPPED when a lower-id cluster-mate has rounded
    cosine >= threshold (keep-lowest-id, the repo's keeper
    convention — the paper keeps one representative per duplicate
    group; which representative is a free choice and lowest-id makes
    the result a pure function of the input).

    Output: one row per dropped vector —
    ``(vec_id, keeper_id, cluster, cosine6)`` where ``keeper_id`` is
    the smallest qualifying lower id and ``cosine6`` the rounded
    cosine to it.  Anti-join on ``vec_id`` to apply.

    Scale shape (the 100 TB story): ONE shuffle keyed on the cluster
    id, then one numpy gram-matrix per cluster inside
    ``applyInPandas`` (a c x c matmul — vectorized, never a row-pair
    SQL explosion); with ``n_lists = semdedup_lists_for(N)`` cluster
    sizes are ~constant, so total work is O(N * target_cluster) and
    each task is bounded.  Cross-cluster near-duplicates are NOT
    found — the paper's approximation, inherited deliberately.
    Centroids ride the closure (broadcast-sized: n_lists x dim).
    """
    cent = np.asarray(centroids, dtype=np.float64)
    assign = ivf_assign_udf(cent)
    schema = (
        f"{id_col} long, keeper_id long, cluster int, cosine6 double"
    )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(pdf[vec_col].to_numpy())[order].astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        sims = np.round(mat @ mat.T, ROUND)
        hit = np.triu(sims >= threshold, 1)  # [i, j]: i < j qualifies
        dropped = hit.any(axis=0)
        if not dropped.any():
            return pd.DataFrame(
                {
                    id_col: np.empty(0, dtype=np.int64),
                    "keeper_id": np.empty(0, dtype=np.int64),
                    "cluster": np.empty(0, dtype=np.int32),
                    "cosine6": np.empty(0, dtype=np.float64),
                }
            )
        j_idx = np.nonzero(dropped)[0]
        keeper_idx = hit[:, j_idx].argmax(axis=0)  # first True = min id
        return pd.DataFrame(
            {
                id_col: ids[j_idx].astype(np.int64),
                "keeper_id": ids[keeper_idx].astype(np.int64),
                "cluster": np.full(
                    len(j_idx), int(pdf["_list"].iloc[0]), dtype=np.int32
                ),
                "cosine6": sims[keeper_idx, j_idx],
            }
        )

    return (
        embeddings.select(id_col, vec_col)
        .withColumn("_list", assign(F.col(vec_col)))
        .groupBy("_list")
        .applyInPandas(per_cluster, schema)
    )


def semdedup_keep(
    embeddings: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``embeddings`` minus the SemDeDup drop list (left-anti join on
    ``id_col``) — the one-call pruned corpus."""
    drops = semdedup_drops(
        embeddings, centroids, threshold, id_col, vec_col
    ).select(id_col)
    return embeddings.join(drops, id_col, "left_anti")


def semdedup_numpy_twin(
    ids: np.ndarray,
    vecs: np.ndarray,
    centroids: np.ndarray,
    threshold: float = 0.95,
) -> list[tuple]:
    """Pure-numpy twin of :func:`semdedup_drops` (same assignment
    argmax, same rounded-cosine rule, same keep-lowest-id keeper).
    Returns sorted ``(vec_id, keeper_id, cluster, cosine6)`` rows."""
    ids = np.asarray(ids, dtype=np.int64)
    v = np.asarray(vecs, dtype=np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    cent = np.asarray(centroids, dtype=np.float64)
    assign = np.argmax(vn @ cent.T, axis=1)
    out = []
    for c in np.unique(assign):
        sel = np.nonzero(assign == c)[0]
        cids = ids[sel]
        order = np.argsort(cids)
        cids = cids[order]
        mat = vn[sel][order]
        sims = np.round(mat @ mat.T, ROUND)
        hit = np.triu(sims >= threshold, 1)
        for j in np.nonzero(hit.any(axis=0))[0]:
            i = hit[:, j].argmax()
            out.append(
                (int(cids[j]), int(cids[i]), int(c), float(sims[i, j]))
            )
    return sorted(out)
