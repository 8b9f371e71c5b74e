"""Tiling / multi-resolution rollup operators (SURVEY.md §2.8).

The Spark-native realization of the reference's cell hierarchy: tile
assignment is a pure bitwise parent expression
(S2CellId.php:330-340), so tile group-bys stay entirely inside
whole-stage codegen; partial+final aggregation comes free from
Catalyst.

Centroids add linearly (documented at S2.php:369-399): per-tile
centroid = normalize(sum of unit xyz), computed with native trig
columns — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.sql_bitops import s2_parent, s2_token_sql, sql_s2_parent

MAX_LEVEL = 30


def with_xyz(df: DataFrame, lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Unit-vector columns from degrees (S2LatLng.php:138-143), native."""
    lat_r = F.radians(F.col(lat_col))
    lon_r = F.radians(F.col(lon_col))
    return (
        df.withColumn("_x", F.cos(lon_r) * F.cos(lat_r))
        .withColumn("_y", F.sin(lon_r) * F.cos(lat_r))
        .withColumn("_z", F.sin(lat_r))
    )


def tile_aggregate(
    docs: DataFrame,
    level: int,
    leaf_col: str = "cell_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    distinct_col: str | None = None,
) -> DataFrame:
    """Per-tile stats at one level: count, centroid, approx distinct.

    Output: (tile_id, tile_token, doc_count, centroid_lat, centroid_lon
    [, approx_distinct]).
    """
    tile = s2_parent(F.col(leaf_col), level).alias("tile_id")
    base = with_xyz(docs, lat_col, lon_col).groupBy(tile)
    aggs = [
        F.count(F.lit(1)).alias("doc_count"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum("_z").alias("_sz"),
    ]
    if distinct_col is not None:
        aggs.append(F.approx_count_distinct(distinct_col).alias("approx_distinct"))
    out = base.agg(*aggs)
    norm = F.sqrt(
        F.col("_sx") * F.col("_sx")
        + F.col("_sy") * F.col("_sy")
        + F.col("_sz") * F.col("_sz")
    )
    out = (
        out.withColumn(
            "centroid_lat",
            F.degrees(F.atan2(F.col("_sz"), F.hypot(F.col("_sx"), F.col("_sy")))),
        )
        .withColumn("centroid_lon", F.degrees(F.atan2(F.col("_sy"), F.col("_sx"))))
        .withColumn("tile_token", s2_token_sql("tile_id"))
        .drop("_sx", "_sy", "_sz")
    )
    _ = norm  # centroid via atan2 needs no explicit normalization
    return out


def tile_rollup(
    tiles: DataFrame,
    from_level: int,
    to_levels: list[int],
    tile_col: str = "tile_id",
    count_col: str = "doc_count",
) -> DataFrame:
    """Roll a fine tiling up to coarser levels by re-grouping on the
    parent id — each rollup consumes the PREVIOUS level's (already
    tiny) output, not the raw docs, so the chain is nearly free.

    Output: union over levels of (level, tile_id, tile_token,
    doc_count)."""
    out = None
    current = tiles.select(
        F.lit(from_level).alias("level"),
        F.col(tile_col).alias("tile_id"),
        F.col(count_col).alias("doc_count"),
    )
    # Materialize the finest level once (lazy local checkpoint): the
    # union output otherwise embeds the full upstream chain (scan +
    # encode + aggregation) into EVERY level's branch — verified via
    # .explain, the static plan showed 3 copies of the scan subtree.
    # The finest tiling is small (one row per occupied tile), so the
    # checkpoint is cheap and every coarser level re-aggregates it.
    current = current.localCheckpoint(eager=False)
    pieces = [current.withColumn("tile_token", s2_token_sql("tile_id"))]
    prev = current
    for lvl in sorted(to_levels, reverse=True):
        if lvl >= from_level:
            continue
        rolled = (
            prev.groupBy(s2_parent(F.col("tile_id"), lvl).alias("tile_id"))
            .agg(F.sum("doc_count").alias("doc_count"))
            .select(
                F.lit(lvl).alias("level"),
                "tile_id",
                "doc_count",
            )
        )
        pieces.append(rolled.withColumn("tile_token", s2_token_sql("tile_id")))
        prev = rolled
    for p in pieces:
        out = p if out is None else out.unionByName(p)
    return out


def rasterize_tiles(
    tiles: DataFrame,
    fine_level: int,
    coarse_level: int,
    tile_col: str = "tile_id",
    value_col: str = "doc_count",
) -> DataFrame:
    """Raster side of raster<->vector materialization: fine-level tile
    values gathered into ONE dense Hilbert-ordered grid per
    coarse-level parent.

    Output: ``(raster_id, raster_token, raster array<long>)`` with
    ``4^(fine-coarse)`` entries; entry ``i`` is the value of the
    parent's ``i``-th level-``fine_level`` descendant in cell-id
    (Hilbert curve) order, 0 where no input row exists.  The position
    is the fine tile's path bits below the parent prefix
    (S2CellId.php:58-78 id layout: 2 bits per level between the face
    and the trailing 1), so position extraction and the whole gather
    stay native SQL — one partial-agg groupBy on the parent, no
    Python.  ``vectorize_raster`` is the exact inverse.

    Pick ``fine - coarse <= 6`` (<= 4096 entries) so a raster row
    stays a few KB — the standard tile-server payload shape.

    Input contract: ONE row per fine tile (a tile aggregate, e.g.
    :func:`tile_aggregate` output).  Duplicate tile rows fail loudly —
    ``map_from_entries`` raises DUPLICATED_MAP_KEY under the default
    ``spark.sql.mapKeyDedupPolicy=EXCEPTION`` — rather than silently
    picking one value; aggregate first if rows may repeat."""
    dl = int(fine_level) - int(coarse_level)
    if not (0 < dl <= 8):
        raise ValueError(
            f"need 0 < fine-coarse <= 8, got levels {fine_level}/{coarse_level}"
        )
    n = 4**dl
    shift = 2 * (MAX_LEVEL - int(fine_level)) + 1
    pos = F.shiftrightunsigned(F.col(tile_col), shift).bitwiseAND(
        F.lit(n - 1)
    )
    keyed = tiles.select(
        s2_parent(F.col(tile_col), int(coarse_level)).alias("raster_id"),
        pos.cast("int").alias("_pos"),
        F.col(value_col).cast("long").alias("_v"),
    )
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0)),
    )
    return (
        keyed.groupBy("raster_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_pos", "_v"))
            ).alias("_m")
        )
        .select(
            "raster_id",
            s2_token_sql("raster_id").alias("raster_token"),
            grid.alias("raster"),
        )
    )


def vectorize_raster(
    rasters: DataFrame,
    fine_level: int,
    coarse_level: int,
    raster_col: str = "raster_id",
    array_col: str = "raster",
    keep_zeros: bool = False,
) -> DataFrame:
    """Exact inverse of :func:`rasterize_tiles`: each raster entry
    back to its fine-level tile row ``(tile_id, tile_token,
    doc_count)``.  The child id is pure bit reassembly — parent prefix
    (parent id minus its lsb) + position path bits + child lsb — so
    the whole explode stays native SQL.  Zero entries (no data) are
    dropped unless ``keep_zeros``."""
    dl = int(fine_level) - int(coarse_level)
    if not (0 < dl <= 8):
        raise ValueError(
            f"need 0 < fine-coarse <= 8, got levels {fine_level}/{coarse_level}"
        )
    shift = 2 * (MAX_LEVEL - int(fine_level)) + 1
    parent_lsb = 1 << (2 * (MAX_LEVEL - int(coarse_level)))
    child_lsb = 1 << (2 * (MAX_LEVEL - int(fine_level)))
    exploded = rasters.select(
        F.col(raster_col),
        F.posexplode(F.col(array_col)).alias("_pos", "doc_count"),
    )
    if not keep_zeros:
        exploded = exploded.where(F.col("doc_count") != 0)
    child = (
        F.col(raster_col)
        - F.lit(parent_lsb)
        + F.shiftleft(F.col("_pos").cast("long"), shift)
        + F.lit(child_lsb)
    )
    return (
        exploded.withColumn("tile_id", child)
        .withColumn("tile_token", s2_token_sql("tile_id"))
        .select("tile_id", "tile_token", "doc_count")
    )


def tile_polygons(tiles: DataFrame, tile_col: str = "tile_id") -> DataFrame:
    """Vector side of raster<->vector materialization: tile -> corner
    polygon [lat0,lng0,...lat3,lng3] + center (S2Cell.php:126-138,
    S2CellId.php:123-159)."""
    from ..functions.udfs import (
        s2_cell_center_lat,
        s2_cell_center_lng,
        s2_cell_vertices_udf,
    )

    return (
        tiles.withColumn("tile_token", s2_token_sql(tile_col))
        .withColumn("vertices", s2_cell_vertices_udf(F.col(tile_col)))
        .withColumn("center_lat", s2_cell_center_lat(F.col(tile_col)))
        .withColumn("center_lon", s2_cell_center_lng(F.col(tile_col)))
    )


def salted_repartition(
    docs: DataFrame,
    level: int,
    salt_buckets: int = 8,
    leaf_col: str = "cell_id",
) -> DataFrame:
    """Defuse hot-tile skew before a wide tile aggregation: spread each
    level-L prefix over ``salt_buckets`` partitions (north rule:
    'salted repartitioning on cell-ID prefixes').

    The aggregation that follows still produces correct results —
    partial aggregation per partition combines at the final stage —
    this just balances the map-side work for skewed tiles (20% of the
    synthetic corpus sits in 3 hot tiles, FIXTURES.md §1)."""
    salt = (F.xxhash64(F.col(leaf_col)) % salt_buckets).cast("int")
    return docs.repartition(
        s2_parent(F.col(leaf_col), level), salt
    )


def plan_salt_buckets(
    docs: DataFrame,
    level: int,
    leaf_col: str = "cell_id",
    rows_per_bucket: int = 1_000_000,
    sample_fraction: float = 0.01,
    seed: int = 7,
) -> dict[int, int]:
    """Sample the level-L tile histogram and derive per-prefix salt
    bucket counts for hot tiles (SURVEY.md §4.2: salting decisions come
    from measured skew, not assumptions).

    Returns {prefix_cell_id: n_buckets} only for prefixes whose
    estimated row count exceeds ``rows_per_bucket`` — everything else
    keeps one bucket and costs nothing."""
    import math

    sampled = (
        docs.sample(fraction=sample_fraction, seed=seed)
        .groupBy(s2_parent(F.col(leaf_col), level).alias("_prefix"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    scale = 1.0 / sample_fraction
    out: dict[int, int] = {}
    for r in sampled:
        est = r._n * scale
        if est > rows_per_bucket:
            out[int(r._prefix)] = int(math.ceil(est / rows_per_bucket))
    return out


def salt_columns(
    salt_plan: dict[int, int], level: int, leaf_col: str = "cell_id"
):
    """(prefix, salt) column pair implementing a salt plan from
    :func:`plan_salt_buckets`.  The single definition both the
    repartition and any balance/diagnostic measurement must share —
    two inlined copies would silently drift apart."""
    prefix = s2_parent(F.col(leaf_col), level)
    if salt_plan:
        buckets = F.coalesce(
            F.create_map(
                *[F.lit(x) for kv in salt_plan.items() for x in kv]
            )[prefix],
            F.lit(1),
        )
    else:
        buckets = F.lit(1)
    salt = (F.pmod(F.xxhash64(F.col(leaf_col)), buckets)).cast("int")
    return prefix, salt


def salted_repartition_planned(
    docs: DataFrame,
    level: int,
    salt_plan: dict[int, int],
    leaf_col: str = "cell_id",
) -> DataFrame:
    """Skew-defusing repartition with per-prefix salt counts from
    :func:`plan_salt_buckets`: hot prefixes spread over their measured
    bucket count, cold prefixes stay single-bucket (no extra shuffle
    width wasted on the long tail)."""
    prefix, salt = salt_columns(salt_plan, level, leaf_col)
    return docs.repartition(prefix, salt)


def collapse_full_sibling_tiles(
    tiles: DataFrame, level: int, tile_col: str = "tile_id"
) -> DataFrame:
    """Distributed S2CellUnion.normalize step for data-driven tilings
    (S2CellUnion.php:619-643 semantics at scale): replace complete
    4-sibling groups at ``level`` by their parent.  One groupBy per
    level; callers loop level-by-level.

    Returns a DataFrame with the same schema where any complete group
    of 4 siblings is replaced by one parent row (other columns
    aggregated by sum for counts)."""
    parent = s2_parent(F.col(tile_col), level - 1).alias("_parent")
    grouped = tiles.groupBy(parent).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("doc_count").alias("doc_count"),
        F.collect_list(tile_col).alias("_members"),
    )
    collapsed = grouped.where(F.col("_n") == 4).select(
        F.col("_parent").alias(tile_col), "doc_count"
    )
    kept = (
        grouped.where(F.col("_n") < 4)
        .select(F.explode("_members").alias(tile_col))
        .join(tiles, tile_col, "inner")
        .select(tile_col, "doc_count")
    )
    return collapsed.unionByName(kept)


def plan_adaptive_tiling(
    docs: DataFrame,
    target_rows_per_tile: int,
    min_level: int = 4,
    max_level: int = 10,
    leaf_col: str = "cell_id",
) -> DataFrame:
    """Density-adaptive quadtree tiling: choose, per area, the COARSEST
    level in [min_level, max_level] whose tile holds at most
    ``target_rows_per_tile`` rows.  Dense areas (hot cities) descend to
    fine tiles; sparse ocean stays coarse — the data-layout answer to
    the same hot-tile skew the salting machinery defuses at shuffle
    time (north rule: explicit skew handling on cell-ID prefixes).

    Selection rule (applied level by level on the rolled-up histogram,
    never on the raw docs): a level-L tile is kept iff

    * its own count <= target (or L == max_level: the hot floor —
      a tile still over target at the finest level is kept anyway and
      handed to :func:`salted_repartition_planned` downstream), AND
    * L == min_level, or its parent's count > target (otherwise the
      parent was already kept and this tile is interior).

    Counts are monotone non-increasing with level along an ancestor
    chain, so every occupied leaf has EXACTLY one kept ancestor: the
    output is a disjoint covering of the occupied space — the same
    invariant S2CellUnion.normalize maintains (S2CellUnion.php:619-643),
    derived from data density instead of geometry.

    Scale shape: ONE shuffle of the docs (the level-``max_level``
    histogram groupBy, with map-side partial aggregation); every
    coarser histogram re-aggregates the previous level's tiny output;
    the keep/split decisions are broadcast semi-joins on histogram-
    sized frames.  At 10^12 rows the level-10 histogram is at most a
    few million rows — driver never sees it.

    ``target_rows_per_tile`` is a planning scalar: at bench scale we
    pass an exact count; a 100-TB job reads the table row count from
    catalog metadata (free in Iceberg/Delta snapshots) or estimates it
    from a sample exactly like :func:`plan_salt_buckets`.

    Returns (level:int, tile_id:long, doc_count:long).
    """
    if not min_level <= max_level:
        raise ValueError("min_level must be <= max_level")
    t = int(target_rows_per_tile)
    counts: dict[int, DataFrame] = {}
    fine = (
        docs.groupBy(s2_parent(F.col(leaf_col), max_level).alias("tile_id"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .localCheckpoint(eager=False)
    )
    counts[max_level] = fine
    prev = fine
    for lvl in range(max_level - 1, min_level - 1, -1):
        prev = (
            prev.groupBy(s2_parent(F.col("tile_id"), lvl).alias("tile_id"))
            .agg(F.sum("doc_count").alias("doc_count"))
            .localCheckpoint(eager=False)
        )
        counts[lvl] = prev
    kept = None
    for lvl in range(min_level, max_level + 1):
        c = counts[lvl]
        if lvl < max_level:
            c = c.where(F.col("doc_count") <= t)
        if lvl > min_level:
            hot = (
                counts[lvl - 1]
                .where(F.col("doc_count") > t)
                .select(F.col("tile_id").alias("_hot_parent"))
            )
            c = c.join(
                F.broadcast(hot),
                s2_parent(F.col("tile_id"), lvl - 1) == F.col("_hot_parent"),
                "left_semi",
            )
        piece = c.select(
            F.lit(lvl).alias("level"), "tile_id", "doc_count"
        )
        kept = piece if kept is None else kept.unionByName(piece)
    return kept


def assign_adaptive_tiles(
    docs: DataFrame,
    tiles: DataFrame,
    min_level: int = 4,
    max_level: int = 10,
    leaf_col: str = "cell_id",
) -> DataFrame:
    """Assign each doc to its (unique) adaptive tile from
    :func:`plan_adaptive_tiling` without shuffling the docs: one
    broadcast LEFT hash join per level present in the tiling — the
    doc side's join key is the pure bitwise parent expression, so the
    whole chain stays inside whole-stage codegen and the 100-TB frame
    never moves.  (A single join after exploding each doc to all its
    ancestors would amplify the big side K-fold before the join —
    strictly worse.)

    Adds ``tile_id`` and ``tile_level`` columns."""
    tiles = tiles.localCheckpoint(eager=False)
    out = docs
    id_cols = []
    lvl_cols = []
    for lvl in range(min_level, max_level + 1):
        side = tiles.where(F.col("level") == lvl).select(
            F.col("tile_id").alias(f"_at{lvl}")
        )
        out = out.join(
            F.broadcast(side),
            s2_parent(F.col(leaf_col), lvl) == F.col(f"_at{lvl}"),
            "left",
        )
        id_cols.append(F.col(f"_at{lvl}"))
        lvl_cols.append(
            F.when(F.col(f"_at{lvl}").isNotNull(), F.lit(lvl))
        )
    out = (
        out.withColumn("tile_id", F.coalesce(*id_cols))
        .withColumn("tile_level", F.coalesce(*lvl_cols))
        .drop(*[f"_at{lvl}" for lvl in range(min_level, max_level + 1)])
    )
    return out


def write_adaptive_partitioned(
    df: DataFrame,
    path: str,
    tiles: DataFrame,
    min_level: int = 4,
    max_level: int = 10,
    leaf_col: str = "cell_id",
) -> None:
    """Persist a corpus partitioned by its ADAPTIVE tile token (from
    :func:`plan_adaptive_tiling`): unlike the fixed-level layout of
    :func:`write_tile_partitioned`, every partition directory holds at
    most ~target rows by construction, so file sizes stay bounded under
    arbitrary density skew — the property an Iceberg-style table needs
    to keep compaction and scan planning sane at 10^12 rows.  Rows are
    Hilbert-clustered inside partitions for min/max file pruning."""
    out = (
        assign_adaptive_tiles(df, tiles, min_level, max_level, leaf_col)
        .withColumn("tile_pfx", s2_token_sql("tile_id"))
        .drop("tile_id", "tile_level")
    )
    hilbert_sorted_writer(out, leaf_col).write.partitionBy(
        "tile_pfx"
    ).mode("overwrite").parquet(path)


def read_adaptive_partition(
    spark,
    path: str,
    cell_id: int,
    min_level: int = 4,
    max_level: int = 10,
) -> DataFrame:
    """Read back exactly the adaptive partition holding ``cell_id``:
    the owning tile is SOME ancestor in [min_level, max_level], and
    exactly one of those tokens exists as a partition value, so an
    ``IN`` filter over the <= (max-min+1) ancestor tokens prunes to one
    directory at plan time (Catalyst PartitionFilters) — no tile-set
    lookup needed at read time."""
    import numpy as np

    from ..s2core import cellid as cid

    ids = cid.from_signed(np.asarray([cell_id], dtype=np.int64))
    toks = [
        cid.token_from_id(cid.parent(ids, lvl))[0]
        for lvl in range(min_level, max_level + 1)
    ]
    return spark.read.parquet(path).where(F.col("tile_pfx").isin(toks))


def tile_balance(assigned: DataFrame, tile_col: str = "tile_id"):
    """(max_rows, mean_rows, n_tiles) over the per-tile row histogram —
    the skew diagnostic the bench reports for fixed vs adaptive vs
    salted layouts.  One aggregation over the (small) histogram."""
    row = (
        assigned.groupBy(tile_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.max("_n").alias("mx"),
            F.avg("_n").alias("mean"),
            F.count(F.lit(1)).alias("k"),
        )
        .collect()[0]
    )
    return int(row.mx), float(row.mean), int(row.k)


def hilbert_sorted_writer(
    df: DataFrame, leaf_col: str = "cell_id", n_files: int | None = None
):
    """Write layout: GLOBAL Hilbert clustering — range-repartition on
    the unsigned cell order (each output file owns a disjoint keyspace
    slice), then sort within partitions so rows inside a file are in
    Hilbert order too.  Downstream tile queries then prune whole files
    on parquet min/max stats, not just directories (SURVEY.md §2.9).
    Returns the clustered frame ready for .write."""
    from ..functions.sql_bitops import s2_unsigned_order

    order = s2_unsigned_order(F.col(leaf_col))
    ranged = (
        df.repartitionByRange(n_files, order)
        if n_files is not None
        else df.repartitionByRange(order)
    )
    return ranged.sortWithinPartitions(order)


def write_tile_partitioned(
    df: DataFrame,
    path: str,
    partition_level: int = 4,
    leaf_col: str = "cell_id",
) -> None:
    """Persist a corpus partitioned by its level-L tile token and
    Hilbert-sorted inside each partition — the Iceberg-style layout
    where a tile-scoped query prunes to its directory at PLAN time
    (Catalyst PartitionFilters) and clusters reads within files.

    Readers filter on ``tile_pfx`` (= s2_token of the level-L parent);
    :func:`read_tile_partition` builds that filter from any cell id.

    The range-repartition on the unsigned cell order inside
    :func:`hilbert_sorted_writer` doubles as the small-files guard:
    all rows of a level-L tile are CONTIGUOUS in that order (the tile
    is a prefix of the cell id), so each tile directory receives its
    rows from one — or a few adjacent — tasks instead of one file per
    shuffle partition per tile."""
    out = df.withColumn(
        "tile_pfx", s2_token_sql(sql_s2_parent(leaf_col, partition_level))
    )
    hilbert_sorted_writer(out, leaf_col).write.partitionBy(
        "tile_pfx"
    ).mode("overwrite").parquet(path)


def read_tile_partition(
    spark, path: str, cell_id: int, partition_level: int = 4
) -> DataFrame:
    """Read back exactly the partition holding ``cell_id``'s level-L
    tile — the partition-pruned access path (the filter lands in the
    scan's PartitionFilters, so only one directory is listed/read)."""
    import numpy as np

    from ..s2core import cellid as cid

    tok = cid.token_from_id(
        cid.parent(
            cid.from_signed(np.asarray([cell_id], dtype=np.int64)),
            partition_level,
        )
    )[0]
    return spark.read.parquet(path).where(F.col("tile_pfx") == tok)


def smooth_tile_values(
    tiles: DataFrame,
    value_col: str = "doc_count",
    tile_col: str = "tile_id",
    center_weight: float = 0.5,
) -> DataFrame:
    """Discrete kernel smoothing on the S2 grid (raster analytics —
    heatmap/density smoothing over tile aggregates): each tile keeps
    ``center_weight`` of its mass and splits the remainder EQUALLY
    among its same-level all-neighbors (8 everywhere except the 24
    cube-corner cells, which have 7 — the split uses the actual
    count, so total mass is conserved EXACTLY up to float addition:
    the sphere has no raster edge to lose mass over).

    Output: ``(tile_id, smoothed)`` — every tile that holds mass
    after smoothing, including ring tiles absent from the input
    (their input mass is 0).  Iterate for wider kernels.

    Scale shape: one Arrow neighbor expansion (<=9 rows per input
    tile), one hash ``groupBy(tile)`` with map-side partial
    aggregation — the same equi-join/groupBy skeleton as every tile
    rollup; no geometry at aggregation time.
    """
    from ..functions.udfs import s2_all_neighbors_udf

    t = tiles.select(
        F.col(tile_col).alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
        s2_all_neighbors_udf(F.col(tile_col)).alias("_nb"),
    ).withColumn("_k", F.size("_nb"))
    center = t.select(
        F.col("_t").alias(tile_col),
        (F.col("_v") * F.lit(float(center_weight))).alias("_m"),
    )
    spread = t.select(
        F.explode("_nb").alias(tile_col),
        (
            F.col("_v")
            * F.lit(1.0 - float(center_weight))
            / F.col("_k")
        ).alias("_m"),
    )
    return (
        center.unionByName(spread)
        .groupBy(tile_col)
        .agg(F.sum("_m").alias("smoothed"))
    )
