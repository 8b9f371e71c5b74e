"""Dump physical plans of the headline operators to EXPLAIN.md.

The plan-shape assertions that matter at 100 TB, checked by eye here
and cited in README:
* flagship spatial join: scan -> project (prefix array explode) ->
  BroadcastHashJoin (no shuffle of the probe side) -> ArrowEvalPython
  (refine) -> two-exchange aggregate with partial aggregation;
* parquet scans show PushedFilters / narrow ReadSchema (column
  pruning drops text/html when not selected);
* bitwise tile math stays inside WholeStageCodegen (no Python).

Usage: python tools/dump_plans.py  (writes /root/repo/EXPLAIN.md)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import functions as F

    from s2_geometry_library_php_spark.functions import s2_cell_id
    from s2_geometry_library_php_spark.operators import (
        spatial_join,
        tile_aggregate,
        tile_rollup,
    )
    from s2_geometry_library_php_spark.operators.knn import knn_join
    from s2_geometry_library_php_spark.plans import get_spark
    from s2_geometry_library_php_spark.sources import (
        load_documents,
        region_fixtures,
    )

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_documents(spark, SF).withColumn(
        "cell_id", s2_cell_id("lat", "lon")
    )

    plans: list[tuple[str, object]] = []

    plans.append(
        (
            "scan with pruning (doc_id/lat/lon only; lang filter pushed)",
            load_documents(spark, SF)
            .where(F.col("lang") == "en")
            .select("doc_id", "lat", "lon"),
        )
    )
    plans.append(
        (
            "flagship spatial join (broadcast banded-prefix + refine)",
            spatial_join(
                spark,
                docs.select("doc_id", "lat", "lon", "cell_id"),
                region_fixtures(),
            ),
        )
    )
    plans.append(
        ("tile aggregation level 8", tile_aggregate(docs, 8))
    )
    plans.append(
        (
            "tile rollup 8 -> 6 -> 4 (reuses previous level)",
            tile_rollup(tile_aggregate(docs, 8), 8, [6, 4]),
        )
    )
    from s2_geometry_library_php_spark.operators.knn import ring_round_topk

    probes = spark.createDataFrame(
        [(0, 48.85, 2.35), (1, -33.9, 151.2)],
        "probe_id long, lat double, lon double",
    ).select(
        "probe_id",
        F.col("lat").alias("_plat"),
        F.col("lon").alias("_plon"),
    ).withColumn("_pleaf", s2_cell_id(F.col("_plat"), F.col("_plon")))
    plans.append(
        (
            "kNN ring round (broadcast 3x3 probe ring -> equi-join on "
            "level-8 prefix -> exact re-rank -> window top-k; docs never "
            "shuffled)",
            ring_round_topk(
                probes, docs.select("doc_id", "lat", "lon", "cell_id"), 5, 8
            ),
        )
    )

    # --- round-2 operators ---------------------------------------------------
    from s2_geometry_library_php_spark.functions.dedup import (
        ngram_jaccard_pairs,
    )
    from s2_geometry_library_php_spark.operators.measures import (
        region_measures,
    )
    from s2_geometry_library_php_spark.operators.region_distance import (
        knn_regions,
    )
    from s2_geometry_library_php_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    raw_docs = load_documents(spark, SF)
    plans.append(
        (
            "n-gram Jaccard (prefix-filter candidates: equi-joins only, "
            "no bucket self cross-join)",
            ngram_jaccard_pairs(raw_docs, threshold=0.2),
        )
    )
    plans.append(
        (
            "k-nearest-regions (probes x broadcast rect bounds; distance "
            "fully inside WholeStageCodegen)",
            knn_regions(
                spark,
                spark.createDataFrame(
                    [(0, 48.85, 2.35)], "probe_id long, lat double, lon double"
                ),
                region_fixtures(),
                3,
            ),
        )
    )
    plans.append(
        (
            "region measures (native triangle-fan trig + one partial-agg "
            "groupBy)",
            region_measures(spark, region_fixtures()),
        )
    )
    plans.append(
        (
            "embedding near-dup (LSH bucket self-join, Hamming-1 probes; "
            "shuffle keyed on (table,bucket), never N^2)",
            embedding_near_dup_pairs(
                spark.read.parquet(f"{SF}/embeddings.parquet"), 0.4
            ),
        )
    )

    from s2_geometry_library_php_spark.functions.dedup import winnow_pairs
    from s2_geometry_library_php_spark.operators.similarity import (
        ann_ivf_topk,
        train_ivf_centroids,
    )

    plans.append(
        (
            "winnowing near-dup pairs (fingerprint equi-join, banding "
            "shuffle shape)",
            winnow_pairs(raw_docs),
        )
    )
    import duckdb as _d

    _vecs = _d.sql(
        f"SELECT embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    import numpy as _np

    _cents = train_ivf_centroids(
        _np.asarray([r[0] for r in _vecs], dtype=_np.float64), 16
    )
    _emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _q = _emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plans.append(
        (
            "IVF ANN (corpus assigned once, queries probe n_probe lists "
            "via broadcast equi-join)",
            ann_ivf_topk(_emb, _q, 10, _cents, n_probe=6),
        )
    )

    # --- round-3 operators ---------------------------------------------------
    from s2_geometry_library_php_spark.operators.spatial_join import (
        compute_coverings,
    )
    from s2_geometry_library_php_spark.plans.range_rewrite import (
        rewrite_range_join_sql,
    )

    leaf_probe = docs.select("doc_id", F.col("cell_id").alias("leaf"))
    cov = compute_coverings(region_fixtures())
    rrows = []
    for rid, cell_s, _lvl, _interior in cov:
        u = cell_s & 0xFFFFFFFFFFFFFFFF
        lsb = u & (-u & 0xFFFFFFFFFFFFFFFF)

        def _sig(v):
            return v - (1 << 64) if v >= 1 << 63 else v

        rrows.append((int(rid), _sig(u - (lsb - 1)), _sig(u + (lsb - 1))))
    spark.createDataFrame(
        rrows, "region_id long, cell_min long, cell_max long"
    ).createOrReplaceTempView("ex_cov_ranges")
    leaf_probe.createOrReplaceTempView("ex_probe_docs")
    plans.append(
        (
            "ad-hoc SQL range θ-join auto-rewritten (leaf BETWEEN "
            "cell_min AND cell_max -> banded-prefix BroadcastHashJoin; "
            "no BroadcastNestedLoopJoin survives)",
            rewrite_range_join_sql(
                spark,
                "SELECT region_id, COUNT(*) AS n_docs "
                "FROM ex_probe_docs p JOIN ex_cov_ranges r "
                "ON p.leaf BETWEEN r.cell_min AND r.cell_max "
                "GROUP BY region_id",
            ),
        )
    )

    import math as _math

    _rng_idx = range(1200)
    big_specs = [
        {
            "region_id": i,
            "kind": "rect",
            "params": [
                _math.radians(-70 + (i * 7919) % 130),
                _math.radians(-70 + (i * 7919) % 130 + 3.0),
                _math.radians(-170 + (i * 104729) % 320),
                _math.radians(-170 + (i * 104729) % 320 + 5.0),
            ],
        }
        for i in _rng_idx
    ]
    plans.append(
        (
            "k-nearest-regions ABOVE the prune threshold (TWO-LEVEL "
            "rect-block prune: probe x broadcast superblock cones -> "
            "per-probe k-th upper bound -> surviving superblocks' "
            "blocks via hash join on sb_id, window-tightened bound -> "
            "surviving blocks explode to candidates via hash join on "
            "region_id -> exact rect distance; no all-regions product)",
            knn_regions(
                spark,
                spark.createDataFrame(
                    [(0, 48.85, 2.35)], "probe_id long, lat double, lon double"
                ),
                big_specs,
                5,
                prune_threshold=100,
                block_size=32,
                sb_size=4,
            ),
        )
    )

    # --- round-4 curation operators ------------------------------------------
    from s2_geometry_library_php_spark.functions.decontaminate import (
        decontaminate,
    )
    from s2_geometry_library_php_spark.functions.hostcap import cap_per_host
    from s2_geometry_library_php_spark.functions.importance import (
        bucket_weights,
        importance_scores,
    )
    from s2_geometry_library_php_spark.functions.pii import redact_pii
    from s2_geometry_library_php_spark.functions.urltools import (
        synth_messy_url_sql,
    )

    bench_slice = raw_docs.where("doc_id % 83 = 0").select("text")
    plans.append(
        (
            "benchmark decontamination (corpus side: scan -> generate "
            "-> broadcast semi-join -> doc-level distinct -> anti-join; "
            "benchmark side reduces to its distinct gram set and "
            "broadcasts; no SortMergeJoin / BroadcastNestedLoopJoin)",
            decontaminate(raw_docs, bench_slice, n=3),
        )
    )
    docs_u = raw_docs.withColumn(
        "url", F.expr(synth_messy_url_sql("doc_id"))
    )
    plans.append(
        (
            "per-host cap (TWO-PHASE salted exact top-K: window over "
            "(host, doc_id % n_salts) spreads the hot host across "
            "tasks, then a window over host on the <= cap*n_salts "
            "bounded survivors — never one task per hot host)",
            cap_per_host(docs_u, 12),
        )
    )
    _wts = bucket_weights(bench_slice, raw_docs, n_buckets=512)
    plans.append(
        (
            "DSIR importance scores (bounded weight table collected "
            "into an array literal; scoring is scan -> project — the "
            "corpus is never exchanged or joined)",
            importance_scores(raw_docs, _wts, n_buckets=512),
        )
    )
    plans.append(
        (
            "PII redaction (pure projection: regexp chain + counts "
            "inside WholeStageCodegen, zero shuffles)",
            redact_pii(raw_docs, with_counts=True),
        )
    )
    from s2_geometry_library_php_spark.operators.radius_join import (
        self_radius_pairs,
    )

    plans.append(
        (
            "within-radius self-join (level picked from MIN_WIDTH, "
            "right side explodes to its <=9-cell neighbor ring, hash "
            "equi-join on the ring cell, exact-angle refine in "
            "WholeStageCodegen; no theta-join)",
            self_radius_pairs(docs.select("doc_id", "lat", "lon"), 0.001),
        )
    )
    from s2_geometry_library_php_spark.operators.tiling import (
        rasterize_tiles,
    )

    plans.append(
        (
            "raster tile materialization (fine tiles -> dense "
            "Hilbert-ordered 4^dl grid per parent: position from path "
            "bits, map_from_entries gather, all native SQL, one "
            "partial-agg groupBy on the parent)",
            rasterize_tiles(tile_aggregate(docs, 10), 10, 7),
        )
    )
    from s2_geometry_library_php_spark.functions.exact_substr import (
        strip_duplicate_spans,
    )

    plans.append(
        (
            "exact-substring span dedup (two linear gram scans; "
            "frequency pass is pure partial-agg HashAggregate — "
            "min(packed long), NOT min(struct), which would force a "
            "partition-sorting SortAggregate of the corpus-sized gram "
            "stream; only duplicated occurrences reach the island "
            "window; islands broadcast back onto the un-exchanged "
            "corpus scan)",
            strip_duplicate_spans(
                raw_docs.select("doc_id", "text"), k=50
            ),
        )
    )

    from s2_geometry_library_php_spark.operators.trajectory import (
        trajectory_stats,
    )

    plans.append(
        (
            "trajectory stats (ONE exchange: window partitionBy "
            "entity, step angles native in WholeStageCodegen, the "
            "groupBy reuses the window's hash partitioning — "
            "SortAggregate rides the window's existing sort)",
            trajectory_stats(
                raw_docs.select(
                    (F.col("doc_id") % 100).alias("user_id"),
                    F.col("doc_id").alias("ts"),
                    F.col("lat"),
                    F.col("lon"),
                )
            ),
        )
    )

    from s2_geometry_library_php_spark.operators.similarity import (
        sample_training_vectors,
        semdedup_drops,
        semdedup_lists_for,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _n_emb = emb.count()
    _sd_lists = semdedup_lists_for(_n_emb, 256)
    _, _sd_tv = sample_training_vectors(emb, _sd_lists)
    _sd_cents = train_ivf_centroids(_sd_tv, _sd_lists)
    plans.append(
        (
            "SemDeDup drops (one shuffle keyed on the cluster id -> "
            "FlatMapGroupsInPandas gram matmul per cluster; centroids "
            "ride the closure, corpus scanned once)",
            semdedup_drops(emb, _sd_cents),
        )
    )

    from s2_geometry_library_php_spark.operators.corpus_pipeline import (
        clean_corpus,
    )

    plans.append(
        (
            "release-pipeline gate frame with the Arrow repetition "
            "gate (cheap native gates filter BELOW ArrowEvalPython; "
            "annotation projection deferred ABOVE it — the Python "
            "worker sees only cheap-gate survivors, and annotation "
            "columns compute only for repetition survivors)",
            clean_corpus(
                spark,
                raw_docs.select("doc_id", "text"),
                near_dup_threshold=None,
                repetition_thresholds={},
                reuse=False,
            ),
        )
    )

    out = ["# EXPLAIN — physical plans of the headline operators\n"]
    out.append(
        "Generated by tools/dump_plans.py at sf0.01 on local[8]; the\n"
        "shapes (not the statistics) are what hold at cluster scale.\n"
    )
    for title, df in plans:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"\n## {title}\n\n```\n{buf.getvalue().strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "EXPLAIN.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote EXPLAIN.md")


if __name__ == "__main__":
    main()
