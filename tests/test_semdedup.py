"""SemDeDup semantic dedup (operators/similarity.py): cluster-scoped
keep-lowest-id pruning, numpy-twin equality on random corpora, the
deliberate cross-cluster miss, and the keep wrapper."""

import numpy as np

from s2_geometry_library_php_spark.operators.similarity import (
    semdedup_drops,
    semdedup_keep,
    semdedup_lists_for,
    semdedup_numpy_twin,
    train_ivf_centroids,
)

DIM = 8


def _mkemb(spark, ids, vecs):
    rows = [
        (int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _two_blob_corpus(rng, n_per=6, eps=1e-3):
    """Two tight blobs on orthogonal axes + two isolated vectors."""
    a = np.zeros(DIM); a[0] = 1.0
    b = np.zeros(DIM); b[1] = 1.0
    vecs = []
    for base in (a, b):
        for _ in range(n_per):
            vecs.append(base + rng.normal(0, eps, DIM))
    c = np.zeros(DIM); c[2] = 1.0
    d = np.zeros(DIM); d[3] = 1.0
    vecs += [c, d]
    return np.array(vecs, dtype=np.float32)


def test_blobs_collapse_to_lowest_id(spark):
    rng = np.random.default_rng(11)
    vecs = _two_blob_corpus(rng)
    ids = np.arange(len(vecs))
    cents = train_ivf_centroids(vecs, n_lists=4)
    drops = semdedup_drops(
        _mkemb(spark, ids, vecs), cents, threshold=0.99
    ).collect()
    dropped = {r["vec_id"] for r in drops}
    # blob A is ids 0..5, blob B is 6..11; keepers 0 and 6 survive
    assert dropped == {1, 2, 3, 4, 5, 7, 8, 9, 10, 11}
    keepers = {r["vec_id"]: r["keeper_id"] for r in drops}
    assert all(keepers[i] == 0 for i in (1, 2, 3, 4, 5))
    assert all(keepers[i] == 6 for i in (7, 8, 9, 10, 11))
    # isolated vectors untouched
    kept = semdedup_keep(
        _mkemb(spark, ids, vecs), cents, threshold=0.99
    )
    assert sorted(r["vec_id"] for r in kept.collect()) == [0, 6, 12, 13]


def test_matches_numpy_twin_random_corpus(spark):
    rng = np.random.default_rng(29)
    vecs = rng.normal(0, 1, (60, DIM)).astype(np.float32)
    # plant some near-dups by copying rows with tiny jitter
    for src, dst in [(3, 17), (5, 44), (20, 21), (8, 59)]:
        vecs[dst] = vecs[src] + rng.normal(0, 1e-4, DIM).astype(
            np.float32
        )
    ids = np.arange(60) * 7 + 1  # non-contiguous ids
    cents = train_ivf_centroids(vecs, n_lists=semdedup_lists_for(60, 16))
    got = sorted(
        (
            r["vec_id"],
            r["keeper_id"],
            r["cluster"],
            r["cosine6"],
        )
        for r in semdedup_drops(
            _mkemb(spark, ids, vecs), cents, threshold=0.999
        ).collect()
    )
    want = semdedup_numpy_twin(ids, vecs, cents, threshold=0.999)
    assert got == want
    assert len(got) >= 4  # every planted dup (same-cluster) is caught


def test_cross_cluster_near_dup_is_missed_by_design(spark):
    # two identical vectors forced into different clusters by
    # handcrafted centroids equal to tiny perturbations of each
    v = np.zeros(DIM); v[0] = 1.0
    vecs = np.stack([v, v]).astype(np.float32)
    c0 = v.copy(); c0[1] = 1e-6
    c1 = v.copy(); c1[1] = -1e-6
    # assignment is argmax cosine: vec 0 and 1 are equidistant, both
    # land in cluster 0 (lowest index on ties) -> use asymmetric vecs
    vecs[1][1] = -1e-5  # nudges vec 1 toward c1
    cents = np.stack([c0, c1])
    drops = semdedup_drops(
        _mkemb(spark, [0, 1], vecs), cents, threshold=0.9
    ).collect()
    assert drops == []  # cosine(v0, v1) ~ 1 but clusters differ


def test_empty_and_no_dup_inputs(spark):
    cents = np.eye(2, DIM)
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    assert semdedup_drops(empty, cents).count() == 0
    a = np.zeros(DIM); a[0] = 1.0
    b = np.zeros(DIM); b[1] = 1.0
    vecs = np.stack([a, b]).astype(np.float32)
    assert (
        semdedup_drops(_mkemb(spark, [5, 9], vecs), cents).count() == 0
    )


def test_lists_for_scaling():
    assert semdedup_lists_for(10**6, 1024) == 977
    assert semdedup_lists_for(100, 1024) == 1
    # linear in N (fixed cluster size), unlike ivf_lists_for's sqrt
    assert abs(
        semdedup_lists_for(10**8, 1024)
        - 100 * semdedup_lists_for(10**6, 1024)
    ) <= 100
