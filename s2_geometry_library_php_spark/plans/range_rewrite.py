"""Ad-hoc SQL range-predicate rewrite: ``leaf BETWEEN cell_min AND
cell_max`` θ-joins become banded-prefix hash equi-joins.

The operator API (``operators.spatial_join``) already emits the
equi-join form directly, but a SQL user writing the natural range
predicate against a covering table gets a BroadcastNestedLoopJoin —
every probe row tested against every range (the exact shape the
reference's contiguous-range trick exists to avoid,
S2CellId.php:293-324, S2EdgeIndex.php:385-420).  SURVEY §4.2 marks
this auto-rewrite as the one candidate for a custom Catalyst rule;
this module realizes it *without* a JVM rule, as a deterministic
source-level rewrite:

* ``range_join`` — DataFrame form.  For every (cell_min, cell_max)
  pair that is a valid cell descendant range (rangeMin/rangeMax of
  some cell — what covering tables contain by construction), the
  membership test ``leaf BETWEEN min AND max`` is EXACTLY equivalent
  to ``s2_parent(leaf, level(cell)) = cell``.  Ranges are banded by
  level (≤ 31 bands, collected from the dimension side in one tiny
  action); the probe emits one parent key per band and the join is a
  plain hash equi-join on (level, key).  Rows whose (min, max) do NOT
  form a valid cell range — arbitrary intervals — are routed through
  a residual θ-join arm, so the rewrite is semantics-preserving for
  ANY input, not just cell-shaped ranges; the residual arm is skipped
  entirely when the (tiny) dimension scan finds none.

* ``rewrite_range_join_sql`` — SQL text form.  Conservatively
  pattern-matches the canonical single-join shape
  ``... FROM <probe> p JOIN <ranges> r ON p.leaf BETWEEN r.lo AND
  r.hi ...``; on a match the FROM clause is swapped for a temp view
  holding ``range_join``'s output and alias qualifiers are stripped;
  anything that does not match cleanly (or would make a stripped
  column ambiguous) falls back to ``spark.sql`` unchanged — the
  rewrite never changes results, only the physical plan.
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sql_bitops import MAX_LEVEL, s2_parent

_rj_counter = itertools.count()


def _valid_cell_range(lo, hi):
    """(lo, hi) is rangeMin/rangeMax of some cell  ⟺  span = hi-lo is
    2*(lsb-1) for a power-of-4 lsb aligned to lo-1+lsb's low bits.
    Rebuild the candidate cell and check it reproduces the range."""
    span = hi - lo
    lsb = span / F.lit(2) + F.lit(1)  # candidate lowest-on-bit
    cell = lo + lsb - F.lit(1)
    lsb_l = lsb.cast("long")
    cell_l = cell.cast("long")
    is_pow = (lsb_l > 0) & (lsb_l.bitwiseAND(lsb_l - F.lit(1)) == F.lit(0))
    # lsb must sit on an even bit (level quantum is 2 bits) => set bit
    # count of (lsb-1) even
    even_bit = F.bit_count(lsb_l - F.lit(1)) % F.lit(2) == F.lit(0)
    matches = (cell_l.bitwiseAND(-cell_l) == lsb_l) & (
        cell_l - (lsb_l - F.lit(1)) == lo
    )
    return (span % F.lit(2) == F.lit(0)) & is_pow & even_bit & matches, cell_l


def range_join(
    probe: DataFrame,
    ranges: DataFrame,
    leaf_col: str,
    min_col: str,
    max_col: str,
    broadcast: bool = True,
) -> DataFrame:
    """Equi-join rewrite of ``probe.leaf BETWEEN ranges.min AND
    ranges.max``.  Output columns: all probe columns then all ranges
    columns (SQL join order).  ``broadcast=True`` hints the dimension
    side (covering tables are dimension-sized by contract); set False
    to let AQE decide for a large build side."""
    valid, cell = _valid_cell_range(F.col(min_col), F.col(max_col))
    tagged = ranges.withColumn("__rj_valid", valid).withColumn(
        "__rj_cell", cell
    )

    # one tiny action on the dimension side: bands present + residual?
    lvl = F.lit(MAX_LEVEL) - (
        F.bit_count(
            F.col("__rj_cell").bitwiseAND(-F.col("__rj_cell")) - F.lit(1)
        )
        / F.lit(2)
    ).cast("int")
    census = (
        tagged.groupBy(F.when(F.col("__rj_valid"), lvl).alias("__rj_level"))
        .count()
        .collect()
    )
    levels = sorted(
        int(r["__rj_level"]) for r in census if r["__rj_level"] is not None
    )
    has_residual = any(r["__rj_level"] is None for r in census)

    build_valid = tagged.where("__rj_valid").withColumn("__rj_level", lvl)
    if broadcast:
        build_valid = F.broadcast(build_valid)

    out_cols = [f"p.{c}" for c in probe.columns] + [
        f"r.{c}" for c in ranges.columns
    ]
    parts = []
    if levels:
        keys = F.array(
            *[
                F.struct(
                    F.lit(lv).cast("int").alias("__rj_level"),
                    s2_parent(F.col(leaf_col), lv).alias("__rj_key"),
                )
                for lv in levels
            ]
        )
        probe_keys = probe.withColumn("__rj_k", F.explode(keys)).select(
            *probe.columns,
            F.col("__rj_k.__rj_level").alias("__rj_level"),
            F.col("__rj_k.__rj_key").alias("__rj_key"),
        )
        parts.append(
            probe_keys.alias("p")
            .join(
                build_valid.alias("r"),
                (F.col("p.__rj_level") == F.col("r.__rj_level"))
                & (F.col("p.__rj_key") == F.col("r.__rj_cell")),
            )
            .select(*out_cols)
        )
    if has_residual:
        resid = tagged.where(~F.col("__rj_valid"))
        if broadcast:
            resid = F.broadcast(resid)
        parts.append(
            probe.alias("p")
            .join(
                resid.alias("r"),
                F.col(f"p.{leaf_col}").between(
                    F.col(f"r.{min_col}"), F.col(f"r.{max_col}")
                ),
            )
            .select(*out_cols)
        )
    if not parts:  # empty ranges table
        return probe.alias("p").join(
            ranges.alias("r"), F.lit(False)
        ).select(*out_cols)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_SQL_PAT = re.compile(
    r"^(?P<head>\s*SELECT\b.*?\bFROM)\s+"
    r"(?P<t1>[\w.]+)\s+(?:AS\s+)?(?P<a>\w+)\s+"
    r"JOIN\s+(?P<t2>[\w.]+)\s+(?:AS\s+)?(?P<b>\w+)\s+"
    r"ON\s+(?P<qa>\w+)\.(?P<leaf>\w+)\s+BETWEEN\s+"
    r"(?P<qb1>\w+)\.(?P<mn>\w+)\s+AND\s+(?P<qb2>\w+)\.(?P<mx>\w+)"
    r"(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL,
)


def rewrite_range_join_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run ``sql``, auto-rewriting the canonical cell-range θ-join to
    the banded-prefix equi-join when the text matches; otherwise (or
    when the rewrite would be ambiguous) identical to
    ``spark.sql(sql)``."""
    m = _SQL_PAT.match(sql)
    if not m:
        return spark.sql(sql)
    g = m.groupdict()
    if g["qa"] != g["a"] or g["qb1"] != g["b"] or g["qb2"] != g["b"]:
        return spark.sql(sql)
    probe = spark.table(g["t1"])
    ranges = spark.table(g["t2"])
    dup = set(probe.columns) & set(ranges.columns)
    if dup or g["leaf"] not in probe.columns or not {
        g["mn"], g["mx"]
    } <= set(ranges.columns):
        return spark.sql(sql)  # ambiguous after alias-stripping: bail
    joined = range_join(probe, ranges, g["leaf"], g["mn"], g["mx"])
    view = f"__s2_range_join_{next(_rj_counter)}"
    joined.createOrReplaceTempView(view)
    strip = re.compile(rf"\b(?:{g['a']}|{g['b']})\.")
    new_sql = (
        strip.sub("", g["head"])
        + f" {view}"
        + strip.sub("", g["rest"])
    )
    return spark.sql(new_sql)
