"""Structured Streaming incremental tiling (SURVEY.md §2.10).

The reference has no streaming surface; this is the Spark-native
extension: documents arrive as a stream, each micro-batch runs the
same stateless encode (geocode -> s2_cell_id -> tile prefix), and a
windowed stateful aggregation maintains per-(window, tile) counts with
a watermark for late pages.

Shapes:
* encode is stateless per-row -> identical UDF pipeline as batch,
* the aggregation state is keyed (window, tile_token) — bounded by
  watermark eviction,
* sink: ``update`` mode for dashboards / ``append`` with watermark for
  Iceberg-style fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sql_bitops import s2_parent, s2_token_sql
from ..functions.udfs import s2_cell_id


def incremental_tile_stream(
    stream_docs: DataFrame,
    tile_level: int = 8,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """streaming docs (with lat/lon + event-time column) -> windowed
    per-tile counts.

    Returns a streaming DataFrame ready for ``.writeStream``; the
    caller picks sink + output mode.
    """
    encoded = stream_docs.withColumn(
        "cell_id", s2_cell_id("lat", "lon")
    ).withColumn("tile_id", s2_parent(F.col("cell_id"), tile_level))
    return (
        encoded.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("win"),
            F.col("tile_id"),
        )
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "tile_id",
            s2_token_sql("tile_id").alias("tile_token"),
            "doc_count",
        )
    )
