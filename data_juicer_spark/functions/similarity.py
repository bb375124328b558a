"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH-bucketed (random
hyperplane signs) as the scale path — both pure DataFrame plans. The
dot products run JVM-side via higher-order functions (zip_with +
aggregate); no Python in the loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not a crash) for zero-norm vectors: under ANSI mode (Spark 4
    default) a plain division would abort the whole job on one degenerate
    row — at 100 TB that single bad vector must not kill the pipeline.
    NULL scores are excluded by every consumer (range filters, >=
    threshold dedup joins, top-k orderings)."""
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10,
    q_id: str = "q_id", c_id: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query set,
    scan the corpus once, per-query window top-k. At 100 TB the corpus
    scan is embarrassingly parallel; the only shuffle is the per-query
    top-k (tiny: k rows per query per partition after AQE combine)."""
    from data_juicer_spark.functions.partitioning import (
        ensure_scan_parallelism,
    )

    q = queries.select(F.col(q_id), F.col(vec).alias("__qv__"))
    # the per-pair cosine runs on the corpus SCAN partitions — fan a
    # single-row-group corpus out to all cores (no-op at scale)
    c = ensure_scan_parallelism(corpus).select(F.col(c_id), F.col(vec).alias("__cv__"))
    scored = c.crossJoin(F.broadcast(q)).select(
        q_id, c_id, F.round(cosine(F.col("__qv__"), F.col("__cv__")), 6).alias("cos_sim")
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(c_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_signatures(df: DataFrame, vec: str, dim: int | None = None,
                          n_planes: int = 16, seed: int = 42,
                          out: str = "lsh_bucket") -> DataFrame:
    """Random-hyperplane LSH bucket id (sign bits packed into a long).

    With an explicit ``dim`` the plane matrix is embedded as literals in
    one JVM expression. With ``dim=None`` the bucket is computed in an
    Arrow-batched pandas UDF that derives the dimension from the vectors
    themselves (planes regenerated per batch from the fixed seed — cheap
    and deterministic), so building the plan triggers ZERO driver
    actions/scans."""
    if dim is not None:
        rng = np.random.RandomState(seed)
        planes = rng.normal(size=(n_planes, dim))
        bucket = F.lit(0).cast("long")
        col = F.col(vec)
        for i in range(n_planes):
            plane = F.array(*[F.lit(float(v)) for v in planes[i]])
            bit = (dot(col, plane) > 0).cast("long")
            bucket = bucket + F.shiftleft(bit, i)
        return df.withColumn(out, bucket)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    n_pl, sd = n_planes, seed

    @pandas_udf(LongType())
    def bucket_udf(s):
        import pandas as pd

        if len(s) == 0:
            return pd.Series([], dtype="int64")
        # planes are keyed by the vector's OWN length (deterministic from
        # the seed), so buckets are consistent across Arrow batches no
        # matter how rows are batched; null vectors get a null bucket
        # (form no pairs) instead of failing the batch. A ragged minority
        # length can only collide with the majority's bucket IDs
        # spuriously — every consumer exact-verifies candidates with
        # cosine(), which is NULL across mismatched lengths.
        arrs = [None if v is None else np.asarray(v, dtype=np.float64)
                for v in s]
        by_dim: dict = {}
        for i, a in enumerate(arrs):
            if a is not None and len(a) > 0:
                by_dim.setdefault(len(a), []).append(i)
        weights = (1 << np.arange(n_pl)).astype(np.int64)
        out_vals: list = [None] * len(s)
        for dim_, idxs in by_dim.items():
            planes = np.random.RandomState(sd).normal(size=(n_pl, dim_))
            mat = np.stack([arrs[i] for i in idxs])
            buckets = ((mat @ planes.T) > 0) @ weights
            for j, i in enumerate(idxs):
                out_vals[i] = int(buckets[j])
        return pd.Series(out_vals, dtype=object)

    return df.withColumn(out, bucket_udf(F.col(vec)))


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10,
    n_lists: int = 16, n_probe: int = 3, seed: int = 42,
    q_id: str = "q_id", c_id: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN top-k: a k-means coarse quantizer (pyspark.ml KMeans,
    distributed JVM training) partitions the corpus into n_lists inverted
    lists; each query probes its n_probe nearest centroids and scores
    only those lists — candidate work drops ~n_lists/n_probe-fold vs the
    brute-force scan while keeping high recall on clustered data.

    Plan shape at scale: one KMeans fit (sampled/iterative, JVM), one
    corpus pass to assign list ids (model.transform), a broadcast of the
    (tiny) probed query set, and a list-id equi-join — no all-pairs."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    c = corpus.select(F.col(c_id), F.col(vec).alias("__cv__"),
                      array_to_vector(F.col(vec)).alias("__feat__"))
    km = KMeans(k=n_lists, seed=seed, featuresCol="__feat__",
                predictionCol="__list__")
    model = km.fit(c)
    assigned = model.transform(c).select(c_id, "__cv__", "__list__")

    centers = np.stack([np.asarray(ctr) for ctr in model.clusterCenters()])
    n_pr = min(n_probe, len(centers))

    @pandas_udf("array<int>")
    def probe_lists(vs):
        import pandas as pd

        if len(vs) == 0:
            return pd.Series([], dtype=object)
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vs])
        d2 = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        idx = np.argsort(d2, axis=1)[:, :n_pr]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    q = queries.select(F.col(q_id), F.col(vec).alias("__qv__"),
                       F.explode(probe_lists(F.col(vec))).alias("__list__"))
    scored = assigned.join(F.broadcast(q), "__list__").select(
        q_id, c_id,
        F.round(cosine(F.col("__qv__"), F.col("__cv__")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(c_id).asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def lsh_topk(
    queries: DataFrame, corpus: DataFrame, dim: int | None = None, k: int = 10,
    n_planes: int = 12, q_id: str = "q_id", c_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """ANN top-k: compare only within the query's LSH bucket (equi-join
    on bucket → shuffle-partitioned by bucket, no cross join). Recall
    traded for a ~2^n_planes candidate reduction."""
    qs = hyperplane_signatures(queries, vec, dim, n_planes).select(
        q_id, F.col(vec).alias("__qv__"), "lsh_bucket"
    )
    cs = hyperplane_signatures(corpus, vec, dim, n_planes).select(
        c_id, F.col(vec).alias("__cv__"), "lsh_bucket"
    )
    scored = cs.join(F.broadcast(qs), "lsh_bucket").select(
        q_id, c_id, F.round(cosine(F.col("__qv__"), F.col("__cv__")), 6).alias("cos_sim")
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cos_sim").desc(), F.col(c_id).asc())
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
