"""Distributed cell-set algebra over exploded cell-id DataFrames.

The reference's ``S2CellUnion`` set operations (getUnion /
getIntersection / normalize, S2CellUnion.php:227-313,591-661) work on
in-memory sorted vectors; these are the shuffle-conscious Spark
equivalents for data-driven cell sets too large for the driver:

* :func:`normalize_cells` — drop contained cells with ONE window pass
  (running-max of range_max over the unsigned Hilbert order), then
  collapse complete 4-sibling groups level-by-level (groupBy parent
  having count 4 — each iteration consumes the previous, already
  reduced, output).
* :func:`cells_union` — unionAll + normalize.
* :func:`cells_intersection` — for normalized inputs, the intersection
  is exactly: cells of A contained in some B-cell, plus cells of B
  strictly contained in some A-cell (range-containment equi/broadcast
  join, no geometry).
* :func:`cells_contain_point` — leaf membership via the range test.

Scale shape: one shuffle (the window sort) + K tiny groupBys for K
levels present.  All id math is JVM bitwise expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sql_bitops import (
    s2_level,
    s2_parent,
    s2_range_max,
    s2_range_min,
    s2_unsigned_order,
)


def _with_ranges(df: DataFrame, cell_col: str) -> DataFrame:
    return (
        df.withColumn("_rmin", s2_range_min(F.col(cell_col)))
        .withColumn("_rmax", s2_range_max(F.col(cell_col)))
        .withColumn("_ord", s2_unsigned_order(F.col("_rmin")))
        .withColumn("_ord_max", s2_unsigned_order(F.col("_rmax")))
    )


def drop_contained_cells(
    df: DataFrame, cell_col: str = "cell_id", keys: list[str] | None = None
) -> DataFrame:
    """Remove cells contained in another cell of the same set (first
    half of normalize, S2CellUnion.php:600-615).

    A cell is contained in an earlier one (unsigned range_min order)
    iff the running max of range_max over its predecessors already
    reaches its range_max."""
    keys = keys or []
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ord").asc(), F.col("_ord_max").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranged = _with_ranges(df.dropDuplicates(keys + [cell_col]), cell_col)
    running = F.max("_ord_max").over(w)
    return (
        ranged.withColumn("_prev_max", running)
        .where(F.col("_prev_max").isNull() | (F.col("_prev_max") < F.col("_ord_max")))
        .drop("_rmin", "_rmax", "_ord", "_ord_max", "_prev_max")
    )


def collapse_siblings(
    df: DataFrame,
    cell_col: str = "cell_id",
    keys: list[str] | None = None,
    max_iterations: int = 31,
) -> DataFrame:
    """Replace complete 4-sibling groups by their parent, repeating
    level-by-level until a fixpoint (second half of normalize,
    S2CellUnion.php:619-643).  Each iteration only touches the deepest
    remaining level, so the loop runs at most (max level present)
    times on ever-smaller data."""
    keys = keys or []
    out = df.select(*keys, cell_col)
    levels = {
        int(r.lv)
        for r in out.select(s2_level(F.col(cell_col)).alias("lv"))
        .distinct()
        .collect()
        if r.lv is not None
    }
    if not levels:
        return out
    # Sweep levels deepest-first (only levels that can actually hold
    # rows): collapsing level L can complete a sibling group at L-1,
    # which the next pass picks up.
    processed = 0
    while levels:
        lv = max(levels)
        levels.discard(lv)
        if lv == 0:
            break
        at_level = out.where(s2_level(F.col(cell_col)) == lv)
        rest = out.where(s2_level(F.col(cell_col)) != lv)
        grouped = at_level.groupBy(
            *keys, s2_parent(F.col(cell_col), lv - 1).alias("_parent")
        ).agg(
            F.count(F.lit(1)).alias("_n"),
            F.collect_list(cell_col).alias("_members"),
        )
        collapsed = grouped.where(F.col("_n") == 4).select(
            *keys, F.col("_parent").alias(cell_col)
        )
        kept = grouped.where(F.col("_n") < 4).select(
            *keys, F.explode("_members").alias(cell_col)
        )
        out = rest.unionByName(kept).unionByName(collapsed)
        levels.add(lv - 1)  # collapse may create parents one level up
        processed += 1
        if processed % 4 == 0:
            # keep the iterative plan from growing unbounded
            out = out.localCheckpoint(eager=True)
    return out


def normalize_cells(
    df: DataFrame, cell_col: str = "cell_id", keys: list[str] | None = None
) -> DataFrame:
    """Full distributed S2CellUnion.normalize (drop contained +
    sibling collapse + re-drop)."""
    out = drop_contained_cells(df, cell_col, keys)
    out = collapse_siblings(out, cell_col, keys)
    # collapsing can create a parent that now contains other cells
    return drop_contained_cells(out, cell_col, keys)


def cells_union(
    a: DataFrame, b: DataFrame, cell_col: str = "cell_id",
    keys: list[str] | None = None,
) -> DataFrame:
    keys = keys or []
    cols = keys + [cell_col]
    return normalize_cells(
        a.select(*cols).unionByName(b.select(*cols)), cell_col, keys
    )


def cells_intersection(
    a: DataFrame, b: DataFrame, cell_col: str = "cell_id"
) -> DataFrame:
    """Intersection of two NORMALIZED cell sets: pure integer range
    containment, no geometry (S2CellUnion.php:267-313 semantics)."""
    ar = _with_ranges(a.select(cell_col), cell_col).select(
        F.col(cell_col).alias("_a"), F.col("_ord").alias("_a_lo"),
        F.col("_ord_max").alias("_a_hi"),
    )
    br = _with_ranges(b.select(cell_col), cell_col).select(
        F.col(cell_col).alias("_b"), F.col("_ord").alias("_b_lo"),
        F.col("_ord_max").alias("_b_hi"),
    )
    a_in_b = ar.join(
        F.broadcast(br),
        (F.col("_a_lo") >= F.col("_b_lo")) & (F.col("_a_hi") <= F.col("_b_hi")),
    ).select(F.col("_a").alias(cell_col))
    b_in_a = br.join(
        F.broadcast(ar),
        (F.col("_b_lo") >= F.col("_a_lo")) & (F.col("_b_hi") <= F.col("_a_hi")),
    ).select(F.col("_b").alias(cell_col))
    # identical cells appear in both arms; dedup collapses them
    return a_in_b.unionByName(b_in_a).dropDuplicates([cell_col])


def cells_difference(
    a: DataFrame, b: DataFrame, cell_col: str = "cell_id",
    max_iterations: int = 31,
) -> DataFrame:
    """A \\ B for NORMALIZED cell sets (S2CellUnion getDifference
    semantics, S2CellUnion.php:227-313 family), distributed.

    Quadtree ranges are aligned, so two cells' ranges intersect iff
    one contains the other.  Per round, each frontier cell joins the
    broadcast B ranges and is classified: disjoint from all of B ->
    emit; contained in some B cell -> drop; else (it strictly contains
    B cells) -> split into its 4 children and retry.  Depth is bounded
    by max level present in B, and the frontier shrinks geometrically;
    result is re-normalized (sibling collapse) like the reference's
    ``Init``-on-result.

    Scale contract: **B must be broadcast-sized** (a normalized
    covering — thousands of cells, not a data-driven tiling).  The
    range-overlap predicate makes each round a
    BroadcastNestedLoopJoin, O(|frontier| x |B|); A may be arbitrarily
    large (it streams).  For a large B, first coarsen B to an
    equi-joinable ancestor key (parent at B's min level) and hash-join
    on that before the range refine."""
    br = _with_ranges(b.select(cell_col), cell_col).select(
        F.col("_ord").alias("_b_lo"), F.col("_ord_max").alias("_b_hi")
    )
    spark = a.sparkSession
    frontier = a.select(cell_col)
    result: DataFrame | None = None
    empty = spark.createDataFrame([], f"{cell_col} long")
    for it in range(max_iterations):
        fr = _with_ranges(frontier, cell_col)
        flags = (
            fr.join(
                F.broadcast(br),
                (F.col("_ord") <= F.col("_b_hi"))
                & (F.col("_ord_max") >= F.col("_b_lo")),
                "left",
            )
            .groupBy(cell_col, "_ord", "_ord_max")
            .agg(
                F.max(
                    (F.col("_b_lo") <= F.col("_ord"))
                    & (F.col("_b_hi") >= F.col("_ord_max"))
                ).alias("_contained"),
                F.max(F.col("_b_lo").isNotNull()).alias("_overlaps"),
            )
        )
        keep = flags.where(~F.col("_overlaps")).select(cell_col)
        result = keep if result is None else result.unionByName(keep)
        split = flags.where(
            F.col("_overlaps") & ~F.coalesce(F.col("_contained"), F.lit(False))
        ).select(cell_col)
        if split.isEmpty():
            break
        # 4 children: child_k = id - lsb + (2k+1) * (lsb >> 2)
        lsb = F.expr(f"{cell_col} & -{cell_col}")
        nl = F.shiftright(lsb, 2)
        frontier = split.select(
            F.explode(
                F.array(
                    *[
                        (F.col(cell_col) - lsb + F.lit(2 * k + 1) * nl).alias(
                            f"c{k}"
                        )
                        for k in range(4)
                    ]
                )
            ).alias(cell_col)
        )
        if (it + 1) % 4 == 0:
            frontier = frontier.localCheckpoint(eager=True)
            result = result.localCheckpoint(eager=True)
    if result is None:
        return empty
    return normalize_cells(result, cell_col)


def cells_contain_point(
    cells: DataFrame, leaf: DataFrame, cell_col: str = "cell_id",
    leaf_col: str = "leaf_id",
) -> DataFrame:
    """Semi-join: leaf rows whose cell is covered by the set."""
    ranged = _with_ranges(cells.select(cell_col), cell_col).select(
        "_ord", "_ord_max"
    )
    probe = leaf.withColumn("_p", s2_unsigned_order(F.col(leaf_col)))
    return probe.join(
        F.broadcast(ranged),
        (F.col("_p") >= F.col("_ord")) & (F.col("_p") <= F.col("_ord_max")),
        "leftsemi",
    ).drop("_p")
