"""k-means tests: conservation, bit-reproducibility, and convergence
(inertia must not increase across Lloyd rounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_map_reduce_spark.operators.clustering import K_CELLS, kmeans_fit
from tests.conftest import SF_ORACLE


def _inertia(assignments, centroids, emb):
    joined = (
        emb.join(assignments, "vec_id")
        .join(centroids, "cell_id")
    )
    d2 = F.aggregate(
        F.zip_with("e", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return joined.agg(F.sum(d2)).collect()[0][0]


def test_kmeans_conserves_and_reproduces(spark):
    from gcp_map_reduce_spark.sources.tables import load_table

    n = load_table(spark, SF_ORACLE, "embeddings").count()
    a1, c1 = kmeans_fit(spark, SF_ORACLE)
    a2, c2 = kmeans_fit(spark, SF_ORACLE)
    sizes1 = sorted(
        (r["cell_id"], r["n_vectors"])
        for r in a1.groupBy("cell_id").agg(F.count("*").alias("n_vectors")).collect()
    )
    sizes2 = sorted(
        (r["cell_id"], r["n_vectors"])
        for r in a2.groupBy("cell_id").agg(F.count("*").alias("n_vectors")).collect()
    )
    assert sizes1 == sizes2
    assert sum(s for _, s in sizes1) == n
    assert len(sizes1) <= K_CELLS
    # centroid arrays bit-identical across runs (integer-scaled means)
    g1 = {r["cell_id"]: r["c"] for r in c1.collect()}
    g2 = {r["cell_id"]: r["c"] for r in c2.collect()}
    assert g1 == g2


def test_kmeans_inertia_non_increasing(spark):
    from gcp_map_reduce_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    prev = None
    for iters in (1, 2, 3):
        a, c = kmeans_fit(spark, SF_ORACLE, n_iters=iters)
        cur = _inertia(a, c, emb)
        if prev is not None:
            assert cur <= prev + 1e-9, (iters, cur, prev)
        prev = cur
