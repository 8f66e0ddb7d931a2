from bqetl_spark.functions.similarity import cosine, kmeans_refine
from pyspark.sql import functions as F


def _clustered(spark):
    rows = []
    for g in range(4):
        for i in range(12):
            vec = [0.0] * 8
            vec[g * 2] = 1.0
            vec[g * 2 + 1] = 0.02 * i
            rows.append((g * 100 + i, vec))   # ids strided so seeds spread
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kmeans_refine_shapes_and_determinism(spark):
    v = _clustered(spark)
    c1 = {r["list_id"]: r["centroid"]
          for r in kmeans_refine(v, n_lists=4, iters=2).collect()}
    c2 = {r["list_id"]: r["centroid"]
          for r in kmeans_refine(v, n_lists=4, iters=2).collect()}
    assert c1.keys() == c2.keys() and len(c1) <= 4
    for k in c1:
        assert c1[k] == c2[k]            # deterministic
        assert len(c1[k]) == 8           # dimension preserved


def test_kmeans_centroids_tighten(spark):
    """After refinement, each vector is at least as close to its nearest
    centroid (mean cosine to best centroid must not decrease)."""
    v = _clustered(spark)

    def mean_best_cosine(cent_df):
        scored = (v.select(F.col("vec_id"), F.transform("embedding", lambda x: x.cast("double")).alias("v"))
                  .join(F.broadcast(cent_df))
                  .withColumn("s", cosine(F.col("v"), F.col("centroid"))))
        best = scored.groupBy("vec_id").agg(F.max("s").alias("b"))
        return best.agg(F.avg("b")).first()[0]

    c0 = kmeans_refine(v, n_lists=4, iters=0)
    c2 = kmeans_refine(v, n_lists=4, iters=2)
    assert mean_best_cosine(c2) >= mean_best_cosine(c0) - 1e-9
