"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, one shuffle for the
top-k-per-query window. Scale path: LSH bucketing (random-hyperplane
signs) or IVF (coarse centroid assignment) so each query only compares
within its bucket — the 100 TB shape where a full cross join is
impossible.

All vector math is built-in expressions (zip_with + aggregate) —
JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query. queries is broadcast (the typical
    shape: few queries × huge corpus), so the corpus never shuffles for
    the join; only the top-k window shuffles by query_id.
    """
    joined = vectors.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — stable across
    runs/platforms, no numpy dependency in the plan)."""
    planes = []
    state = seed & 0x7FFFFFFF
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            row.append(state / 0x40000000 - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane packed into
    a long. Cosine-similar vectors collide with high probability."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        s = dot(vec, plane)
        bucket = bucket.bitwiseOR(
            F.when(s >= 0, F.lit(1 << i).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: bucket corpus and queries with the
    same hyperplanes, equi-join on bucket, exact rerank inside buckets.

    vs brute force: the corpus-side compare count drops by ~2^n_planes;
    recall is tunable via n_planes (fewer planes → bigger buckets →
    higher recall, more compute). The equi-join on a long key is the
    only shuffle — AQE picks broadcast when the query side is small.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    v = vectors.withColumn("__bucket", lsh_bucket(F.col(vec_col), planes))
    q = queries.withColumn("__bucket", lsh_bucket(F.col(query_vec_col), planes))
    joined = v.join(F.broadcast(q), "__bucket")
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def ivf_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
) -> list[list[float]]:
    """Deterministic IVF "fit": the n_centroids lowest-id vectors act
    as coarse centroids. A one-row-per-centroid driver collect — the
    model-fit step; at 100 TB you'd k-means a sample, the serving path
    below is unchanged."""
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .collect()
    )
    return [list(map(float, r[vec_col])) for r in rows]


def _centroid_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """array<struct<score,double idx,int>> of cosine vs each centroid."""
    entries = [
        F.struct(
            cosine(vec, F.array(*[F.lit(float(x)) for x in c])).alias("score"),
            F.lit(i).alias("idx"),
        )
        for i, c in enumerate(centroids)
    ]
    return F.array(*entries)


def ivf_assign(vec: Column, centroids: list[list[float]]) -> Column:
    """Coarse-quantizer assignment: index of the max-cosine centroid."""
    return F.array_max(_centroid_scores(vec, centroids))["idx"]


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """Approximate cosine top-k, IVF-style: corpus rows live in one
    coarse cell each; every query probes its nprobe best cells and
    reranks exactly inside them.

    vs LSH: cells are data-adapted (centroid Voronoi) instead of
    random-hyperplane buckets — better recall at equal compare count
    on clustered data. The equi-join on cell id is the only shuffle;
    corpus-side work drops by ~n_centroids/nprobe.
    """
    centroids = ivf_centroids(vectors, id_col, vec_col, n_centroids)
    v = vectors.withColumn("__cell", ivf_assign(F.col(vec_col), centroids))
    q_scored = queries.withColumn(
        "__cells",
        F.slice(
            F.reverse(F.array_sort(_centroid_scores(F.col(query_vec_col), centroids))),
            1,
            nprobe,
        ),
    )
    q = q_scored.select(
        query_id_col,
        query_vec_col,
        F.explode(F.col("__cells")["idx"]).alias("__cell"),
    )
    joined = v.join(F.broadcast(q), "__cell")
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def embedding_near_dups(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH self-join (bucket
    equi-join, id_a < id_b), exact cosine verify >= threshold.

    The self-join is hinted shuffle-hash so both sides share ONE
    shuffle exchange (ReuseExchange) — the bucket computation (HOF dot
    products per plane) runs once, not once per side as a broadcast
    plan would; input fans out across cores first (compute-bound
    narrow stage on few bytes)."""
    planes = random_hyperplanes(dim, n_planes, seed)
    v = vectors.repartition(
        vectors.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(F.col(vec_col), planes).alias("__bucket"),
    )
    a, b = v.alias("a").hint("shuffle_hash"), v.alias("b")
    cand = a.join(
        b,
        (F.col("a.__bucket") == F.col("b.__bucket")) & (F.col("a.id") < F.col("b.id")),
    )
    sim = cosine(F.col("a.vec"), F.col("b.vec"))
    return cand.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        sim.alias("cosine_sim"),
    ).filter(F.col("cosine_sim") >= threshold)
