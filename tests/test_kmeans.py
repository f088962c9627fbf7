"""Evidence tests for the integer-lattice k-means operator: the full
Lloyd loop must be deterministic, monotone in inertia, and produce a
sane clustering of the labeled testdata embeddings."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ai_assistent_spark import io
from etl_ai_assistent_spark.operators import kmeans as KM


def _vectors(spark, sf_small):
    return io.load_table(spark, sf_small, "embeddings").select(
        "vec_id", KM.quantize("embedding").alias("qv")
    )


def test_lloyd_inertia_monotone_nonincreasing(spark, sf_small):
    """Lloyd's algorithm must never increase total inertia between
    iterations — exact integer arithmetic makes this check sharp (no
    float-noise tolerance needed)."""
    v = _vectors(spark, sf_small)
    inertias = []
    for iters in (1, 2, 4):
        a, _ = KM.lloyd(v, k=8, iters=iters)
        inertias.append(a.agg(F.sum("dist")).collect()[0][0])
    assert inertias[0] >= inertias[1] >= inertias[2], inertias


def test_lloyd_deterministic_across_partitionings(spark, sf_small):
    """The same input under a different partitioning must produce the
    identical assignment — the integer-lattice design's whole point."""
    v = _vectors(spark, sf_small)
    a1, _ = KM.lloyd(v, k=8, iters=3)
    a2, _ = KM.lloyd(v.repartition(7), k=8, iters=3)
    assert a1.exceptAll(a2).count() == 0
    assert a2.exceptAll(a1).count() == 0


def test_lloyd_clusters_cover_all_vectors(spark, sf_small):
    v = _vectors(spark, sf_small)
    n = v.count()
    a, cents = KM.lloyd(v, k=8, iters=3)
    assert a.count() == n
    assert a.select("vec_id").distinct().count() == n
    clusters = {r["cluster"] for r in a.select("cluster").distinct().collect()}
    assert clusters <= set(range(8)) and len(clusters) > 1
    assert cents.count() == len(clusters)


def test_lloyd_beats_single_cluster_baseline(spark, sf_small):
    """k=8 must end with materially lower inertia than the k=1 baseline
    (total lattice variance). The testdata embeddings are isotropic —
    the generator's `label` column is NOT geometrically clustered (1-NN
    label agreement ~= random), so label purity is not a valid target;
    variance reduction against k=1 is."""
    v = _vectors(spark, sf_small)
    base, _ = KM.lloyd(v, k=1, iters=1)
    inertia1 = base.agg(F.sum("dist")).collect()[0][0]
    a, _ = KM.lloyd(v, k=8, iters=5)
    inertia8 = a.agg(F.sum("dist")).collect()[0][0]
    assert inertia8 < 0.95 * inertia1, (inertia8, inertia1)
