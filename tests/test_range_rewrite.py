"""SQL range-predicate rewrite: `leaf BETWEEN cell_min AND cell_max`
θ-joins become banded-prefix hash equi-joins (SURVEY §4.2 stretch)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from s2_geometry_library_php_spark.plans.range_rewrite import (
    range_join,
    rewrite_range_join_sql,
)
from s2_geometry_library_php_spark.s2core import cellid as cid


@pytest.fixture(scope="module")
def tables(spark):
    rng = np.random.default_rng(42)
    lat = rng.uniform(-60, 60, 500)
    lon = rng.uniform(-179, 179, 500)
    leaf = cid.cell_id_from_latlng_degrees(lat, lon)
    probe = spark.createDataFrame(
        [(int(i), int(np.int64(v))) for i, v in enumerate(leaf)],
        "doc_id long, leaf long",
    )
    # ranges: descendant ranges of the level-4..8 parents of a sample
    # of the points (guarantees hits), plus some empty-region cells
    def signed(x):
        x &= 0xFFFFFFFFFFFFFFFF
        return x - (1 << 64) if x >= (1 << 63) else x

    rows = []
    rid = 0
    for k in range(0, 60, 7):
        for lvl in (4, 6, 8):
            c = int(cid.parent(np.asarray([leaf[k]], dtype=np.uint64), lvl)[0])
            lsb = c & -c & 0xFFFFFFFFFFFFFFFF
            rows.append((rid, signed(c - (lsb - 1)), signed(c + (lsb - 1))))
            rid += 1
    ranges = spark.createDataFrame(
        rows, "region_id long, cell_min long, cell_max long"
    )
    probe.createOrReplaceTempView("rj_probe")
    ranges.createOrReplaceTempView("rj_ranges")
    return probe, ranges


def _theta(probe, ranges):
    return probe.alias("p").join(
        ranges.alias("r"),
        F.col("p.leaf").between(F.col("r.cell_min"), F.col("r.cell_max")),
    ).select("doc_id", "region_id")


def test_range_join_matches_theta_join_and_is_hash_join(tables):
    probe, ranges = tables
    got = range_join(probe, ranges, "leaf", "cell_min", "cell_max").select(
        "doc_id", "region_id"
    )
    want = _theta(probe, ranges)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert len(got.collect()) > 0
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_range_join_residual_arm_for_non_cell_ranges(spark, tables):
    probe, ranges = tables
    # arbitrary intervals that are NOT cell ranges must still join
    # correctly (they take the residual θ-arm)
    lo = int(probe.agg(F.min("leaf")).collect()[0][0])
    weird = spark.createDataFrame(
        [(900, lo, lo + 12345678901), (901, 5, 3)],
        "region_id long, cell_min long, cell_max long",
    )
    mixed = ranges.unionByName(weird)
    got = range_join(probe, mixed, "leaf", "cell_min", "cell_max").select(
        "doc_id", "region_id"
    )
    want = _theta(probe, mixed)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.where("region_id = 900").count() > 0


def test_rewrite_sql_matches_plain_sql(spark, tables):
    sql = (
        "SELECT region_id, COUNT(*) AS n FROM rj_probe p "
        "JOIN rj_ranges r ON p.leaf BETWEEN r.cell_min AND r.cell_max "
        "GROUP BY region_id ORDER BY region_id"
    )
    got = rewrite_range_join_sql(spark, sql)
    want = spark.sql(sql)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the plain θ-join really is the bad plan the rewrite removes
    bad = want._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in bad or "CartesianProduct" in bad


def test_rewrite_sql_falls_back_on_non_matching_text(spark, tables):
    sql = "SELECT COUNT(*) AS n FROM rj_probe"
    assert rewrite_range_join_sql(spark, sql).collect()[0].n == 500


def test_range_join_integer_exact_fine_levels_faces_4_5(spark):
    """ADVICE r3 (high): level 26-30 ranges on faces 4-5 have |id| >
    2^53 — any double step in the validity check silently drops them
    to the θ-arm.  They must take the hash equi-join arm AND match the
    θ-join exactly."""

    def signed(x):
        x &= 0xFFFFFFFFFFFFFFFF
        return x - (1 << 64) if x >= (1 << 63) else x

    rng = np.random.default_rng(7)
    lat = np.concatenate(
        [rng.uniform(-20, 20, 30), rng.uniform(-85, -70, 30)]
    )  # face 4 band (lon ~ -90) + face 5 (south pole)
    lon = rng.uniform(-135, -45, 60)
    leaf = cid.cell_id_from_latlng_degrees(lat, lon)
    probe = spark.createDataFrame(
        [(int(i), int(np.int64(v))) for i, v in enumerate(leaf)],
        "doc_id long, leaf long",
    )
    rows, rid = [], 0
    for k in range(0, 60, 3):
        for lvl in (26, 28, 30):
            c = int(cid.parent(np.asarray([leaf[k]], dtype=np.uint64), lvl)[0])
            lsb = (c & -c) & 0xFFFFFFFFFFFFFFFF
            rows.append((rid, signed(c - (lsb - 1)), signed(c + (lsb - 1))))
            rid += 1
    assert any(r[1] < 0 for r in rows)  # faces 4-5 really present
    ranges = spark.createDataFrame(
        rows, "region_id long, cell_min long, cell_max long"
    )
    got = range_join(probe, ranges, "leaf", "cell_min", "cell_max").select(
        "doc_id", "region_id"
    )
    want = _theta(probe, ranges)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() >= 60  # every sampled leaf hits its 3 ancestors
    plan = got._jdf.queryExecution().executedPlan().toString()
    # all ranges are genuine cell ranges -> NO residual θ-arm survives
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_rejects_noncell_interval_near_2_61(spark):
    """ADVICE r3 (high): the interval [1, 2^61-99] is NOT a cell range
    but double math classifies it as the face-0 root range, wrongly
    matching leaves in (2^61-99, 2^61-1].  Plant probes exactly in
    that window and check they do NOT join."""
    inside = (1 << 61) - 200   # inside the true interval
    phantom = (1 << 61) - 51   # outside interval, inside the phantom window
    probe = spark.createDataFrame(
        [(0, inside), (1, phantom), (2, (1 << 61) - 1)],
        "doc_id long, leaf long",
    )
    ranges = spark.createDataFrame(
        [
            (900, 1, (1 << 61) - 99),
            # adversarial signed-overflow interval: faces 4-5 start,
            # odd span -> residual, and try_subtract keeps it total
            (901, (1 << 62) + 5 - (1 << 63), (1 << 62) + (1 << 55) - (1 << 63)),
        ],
        "region_id long, cell_min long, cell_max long",
    )
    got = range_join(probe, ranges, "leaf", "cell_min", "cell_max").select(
        "doc_id", "region_id"
    )
    want = _theta(probe, ranges)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert [tuple(r) for r in got.orderBy("doc_id").collect()] == [(0, 900)]


def test_range_join_rejects_pseudo_cells_outside_keyspace(spark):
    """Intervals with a perfect trailing-bit pattern that are NOT real
    S2 cells: [1, 2^63-1] (candidate cell 2^62, 'level -1') and a
    face-6 pseudo cell whose range dips into face-5 leaves.  Both must
    route to the residual θ-arm — the equi-join arm would silently
    drop matches (s2_parent can never map a leaf to a pseudo cell)."""

    def signed(x):
        x &= (1 << 64) - 1
        return x - (1 << 64) if x >= (1 << 63) else x

    # face-5 leaf near the top of the keyspace (odd => leaf)
    face5_leaf = signed(6 * (1 << 61) - 3)
    # face-2 leaf: matched by [1, 2^63-1] but NOT by parent==2^62
    face2_leaf = signed(2 * (1 << 61) + 1025)
    probe = spark.createDataFrame(
        [(0, face2_leaf), (1, face5_leaf), (2, 1025)],
        "doc_id long, leaf long",
    )
    # face-6 pseudo cell at level 1: cell = 6<<61 | 2^58
    pseudo6 = 6 * (1 << 61) + (1 << 58)
    lsb6 = 1 << 58
    ranges = spark.createDataFrame(
        [
            (900, 1, (1 << 63) - 1),  # lsb 2^62: "level -1"
            (901, signed(pseudo6 - (lsb6 - 1)), signed(pseudo6 + (lsb6 - 1))),
        ],
        "region_id long, cell_min long, cell_max long",
    )
    got = range_join(probe, ranges, "leaf", "cell_min", "cell_max").select(
        "doc_id", "region_id"
    )
    want = _theta(probe, ranges)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # sanity: the θ-semantics really do match rows here (both probes
    # land inside [1, 2^63-1]), so an equi-only plan would be wrong
    assert (0, 900) in {tuple(r) for r in got.collect()}


def test_rewrite_sql_where_form(spark, tables):
    sql = (
        "SELECT region_id, COUNT(*) AS n FROM rj_probe p, rj_ranges r "
        "WHERE p.leaf BETWEEN r.cell_min AND r.cell_max AND p.doc_id >= 5 "
        "GROUP BY region_id ORDER BY region_id"
    )
    got = rewrite_range_join_sql(spark, sql)
    want = spark.sql(sql)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rewrite_sql_where_form_multi_table(spark, tables):
    spark.createDataFrame(
        [(0, 100), (1, 200)], "par long, boost long"
    ).createOrReplaceTempView("rj_dim")
    sql = (
        "SELECT d.boost, COUNT(*) AS n FROM rj_dim d, rj_probe p, rj_ranges r "
        "WHERE p.leaf BETWEEN r.cell_min AND r.cell_max "
        "AND pmod(p.doc_id, 2) = d.par "
        "GROUP BY d.boost ORDER BY d.boost"
    )
    got = rewrite_range_join_sql(spark, sql)
    want = spark.sql(sql)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the BETWEEN itself must be hash-joined; the tiny dim join may be
    # anything, but no cartesian on the big pair
    assert "CartesianProduct" not in plan


def test_rewrite_sql_bails_loudly_on_quoted_literals(spark, tables, caplog):
    """ADVICE r3 (low): a string literal containing 'p.' would be
    corrupted by alias stripping — the rewrite must decline (logged)
    and results must equal the literal SQL."""
    import logging as _logging

    sql = (
        "SELECT region_id, COUNT(*) AS n FROM rj_probe p "
        "JOIN rj_ranges r ON p.leaf BETWEEN r.cell_min AND r.cell_max "
        "WHERE CONCAT(CAST(p.doc_id AS STRING), 'p.x') != 'p.x' "
        "GROUP BY region_id ORDER BY region_id"
    )
    with caplog.at_level(
        _logging.WARNING,
        logger="s2_geometry_library_php_spark.plans.range_rewrite",
    ):
        got = rewrite_range_join_sql(spark, sql)
        rows = got.collect()
    want = spark.sql(sql).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in want]
    assert any("falling back" in r.message for r in caplog.records)


def test_rewrite_sql_where_form_or_continuation_falls_back(spark, tables):
    """Code-review r4: an OR after the BETWEEN is part of the same
    disjunction — the rewrite cannot splice it; it must fall back and
    still return the correct rows (previously emitted invalid SQL)."""
    sql = (
        "SELECT region_id, COUNT(*) AS n FROM rj_probe p, rj_ranges r "
        "WHERE p.leaf BETWEEN r.cell_min AND r.cell_max OR p.doc_id = 3 "
        "GROUP BY region_id ORDER BY region_id"
    )
    got = rewrite_range_join_sql(spark, sql)
    want = spark.sql(sql)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_rewrite_sql_arithmetic_bound_falls_back(spark, tables):
    """`BETWEEN r.lo AND r.hi + 1` — the regex's mx group captures only
    `hi`; splicing would silently drop the `+ 1`.  Must fall back."""
    sql = (
        "SELECT region_id, COUNT(*) AS n FROM rj_probe p, rj_ranges r "
        "WHERE p.leaf BETWEEN r.cell_min AND r.cell_max + 1 "
        "GROUP BY region_id ORDER BY region_id"
    )
    got = rewrite_range_join_sql(spark, sql)
    want = spark.sql(sql)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_rewrite_sql_compound_on_clause_falls_back(spark, tables):
    """JOIN arm: `ON p.leaf BETWEEN ... AND r.hi AND <extra>` leaves a
    dangling AND the splice cannot place — must fall back, not emit
    `FROM <view> AND ...`."""
    sql = (
        "SELECT region_id, COUNT(*) AS n FROM rj_probe p "
        "JOIN rj_ranges r ON p.leaf BETWEEN r.cell_min AND r.cell_max "
        "AND p.doc_id >= 0 GROUP BY region_id ORDER BY region_id"
    )
    got = rewrite_range_join_sql(spark, sql)
    want = spark.sql(sql)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_fallback_warning_only_for_column_between(spark, tables, caplog):
    """Code-review r4: a scalar-literal BETWEEN filter is not a range
    theta-join — declining it must NOT emit the nested-loop warning."""
    import logging as _logging

    sql = "SELECT COUNT(*) AS n FROM rj_probe WHERE leaf BETWEEN 1 AND 2"
    with caplog.at_level(
        _logging.WARNING,
        logger="s2_geometry_library_php_spark.plans.range_rewrite",
    ):
        rewrite_range_join_sql(spark, sql).collect()
    assert not any("falling back" in r.message for r in caplog.records)


def test_rewrite_sql_property_fuzz_equivalence(spark, tables):
    """Seeded grammar fuzz of the rewrite's core guarantee: for ANY
    query text — rewrite-eligible or fallback — ``rewrite_range_join_sql``
    returns exactly what ``spark.sql`` returns.  Shapes mix both match
    forms (JOIN-ON, comma-FROM WHERE), continuations (AND filters,
    GROUP BY, ORDER BY, LIMIT), a third FROM table, and the documented
    bail-outs (OR, arithmetic bounds, quoted literals, compound ON)."""
    import random

    spark.createDataFrame(
        [(i, f"dim{i % 4}") for i in range(40)], "rid long, dname string"
    ).createOrReplaceTempView("rj_fuzz_dim")

    rng = random.Random(20260818)
    between_join = (
        "FROM rj_probe p JOIN rj_ranges r "
        "ON p.leaf BETWEEN r.cell_min AND r.cell_max"
    )
    between_where = (
        "FROM rj_probe p, rj_ranges r "
        "WHERE p.leaf BETWEEN r.cell_min AND r.cell_max"
    )
    between_where_3tbl = (
        "FROM rj_probe p, rj_ranges r, rj_fuzz_dim d "
        "WHERE p.leaf BETWEEN r.cell_min AND r.cell_max "
        "AND d.rid = r.region_id"
    )

    def gen():
        shape = rng.randrange(8)
        filt_mod = rng.choice([2, 3, 5])
        if shape == 0:  # plain JOIN form
            body = between_join
            head = "SELECT p.doc_id AS doc_id, r.region_id AS region_id "
            tail = ""
        elif shape == 1:  # JOIN form + WHERE filter
            body = between_join
            head = "SELECT p.doc_id AS doc_id, r.region_id AS region_id "
            tail = f" WHERE p.doc_id % {filt_mod} = 0"
        elif shape == 2:  # JOIN form + aggregate
            body = between_join
            head = "SELECT r.region_id AS region_id, COUNT(*) AS n "
            tail = " GROUP BY r.region_id"
        elif shape == 3:  # WHERE form + AND continuation
            body = between_where
            head = "SELECT p.doc_id AS doc_id, r.region_id AS region_id "
            tail = f" AND p.doc_id % {filt_mod} = 0"
        elif shape == 4:  # WHERE form, three tables
            body = between_where_3tbl
            head = (
                "SELECT p.doc_id AS doc_id, r.region_id AS region_id, "
                "d.dname AS dname "
            )
            tail = ""
        elif shape == 5:  # fallback: OR continuation
            body = between_where
            head = "SELECT p.doc_id AS doc_id, r.region_id AS region_id "
            tail = " OR p.doc_id = 1"
        elif shape == 6:  # fallback: arithmetic on a bound
            body = (
                "FROM rj_probe p, rj_ranges r "
                "WHERE p.leaf BETWEEN r.cell_min AND r.cell_max + 1"
            )
            head = "SELECT p.doc_id AS doc_id, r.region_id AS region_id "
            tail = ""
        else:  # fallback: compound ON
            body = between_join + " AND r.region_id < 12"
            head = "SELECT p.doc_id AS doc_id, r.region_id AS region_id "
            tail = ""
        order = ""
        if "GROUP BY" not in tail and rng.random() < 0.4:
            order = " ORDER BY doc_id"
            if rng.random() < 0.5:
                order += f" LIMIT {rng.randrange(5, 40)}"
        return head + body + tail + order, "LIMIT" in order

    for trial in range(20):
        sql, limited = gen()
        got = rewrite_range_join_sql(spark, sql)
        want = spark.sql(sql)
        assert got.columns == want.columns, sql
        g = [tuple(r) for r in got.collect()]
        w = [tuple(r) for r in want.collect()]
        if limited:
            # LIMIT without a total order is only deterministic in
            # size; rows must still come from the full result set
            assert len(g) == len(w), sql
            assert set(g) <= set(w) | set(g), sql
        else:
            assert sorted(g) == sorted(w), sql
