"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, one shuffle for the
top-k-per-query window. Scale path: LSH bucketing (random-hyperplane
signs) or IVF (coarse centroid assignment) so each query only compares
within its bucket — the 100 TB shape where a full cross join is
impossible.

All vector math is JVM-side, no Python in the hot path. The critical
shape: norms are computed ONCE PER ROW before any join (carried as an
8-byte column through the join), so the per-pair work in a bucket/
cell/cross join is a single dot product — 3x less lambda evaluation
than re-deriving both norms per pair, and bitwise-identical results
(the same double is computed in an earlier projection). A fully
unrolled fixed-dim expression was tried and REJECTED: at 64 dims the
generated Java exceeds janino's method limit, whole-stage codegen
bails out, and interpreted evaluation of the flat tree is slower than
the higher-order-function loop.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_script_spark.operators.partitioning import fan_out as _fan_out


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_sql(vec_sql: str, lits: list[float]) -> str:
    """SQL text for the dot of an array column with a LITERAL vector.

    Literal-heavy expressions are built as ONE SQL string parsed
    JVM-side: constructing them with python F.lit / lambda wrappers
    costs a py4j round-trip per literal and per HOF lambda, which
    dominated DataFrame BUILD time (~1.3 s per ivf_assign at 8
    centroids — far more than executing the query). String-cast
    literals round-trip exactly (repr -> IEEE parse)."""
    arr = ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in lits)
    return (
        f"aggregate(zip_with({vec_sql}, array({arr}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, v) -> acc + v)"
    )


def dot_lit(vec: Column, lits: list[float]) -> Column:
    """Dot of an array column with a LITERAL vector (Column API; for
    name-addressable columns prefer the _dot_sql string path)."""
    plane = F.lit([float(x) for x in lits])
    return dot(vec, plane)


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity (``dim`` accepted for API stability; the
    evaluation strategy no longer depends on it)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query. queries is broadcast (the typical
    shape: few queries × huge corpus), so the corpus never shuffles for
    the join; only the top-k window shuffles by query_id. Each side's
    norm is computed once per ROW below the join — the per-pair work
    is a single dot product (same doubles, 3x less lambda eval).
    """
    v = vectors.withColumn("__vn", l2_norm(F.col(vec_col)))
    q = queries.withColumn("__qn", l2_norm(F.col(query_vec_col)))
    joined = v.crossJoin(F.broadcast(q))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        (
            dot(F.col(vec_col), F.col(query_vec_col))
            / (F.col("__vn") * F.col("__qn"))
        ).alias("cosine_sim"),
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


def lsh_bucket(vec_sql: str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane packed into
    a long. Cosine-similar vectors collide with high probability.
    Built as one JVM-parsed SQL expression (see _dot_sql)."""
    terms = [
        f"(CASE WHEN {_dot_sql(vec_sql, p)} >= 0.0D"
        f" THEN {1 << i}L ELSE 0L END)"
        for i, p in enumerate(planes)
    ]
    return F.expr(" | ".join(terms))


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
    v = vectors.withColumn(
        "__bucket", lsh_bucket(vec_col, planes)
    ).withColumn("__vn", l2_norm(F.col(vec_col)))
    q = queries.withColumn(
        "__bucket", lsh_bucket(query_vec_col, planes)
    ).withColumn("__qn", l2_norm(F.col(query_vec_col)))
    joined = v.join(F.broadcast(q), "__bucket")
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        (
            dot(F.col(vec_col), F.col(query_vec_col))
            / (F.col("__vn") * F.col("__qn"))
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def _fit_sample(
    vectors: DataFrame, id_col: str, vec_col: str, n: int
) -> list:
    """The shared deterministic fit sample: the ``n`` vectors with
    the smallest ``xxhash64(id)`` (ties by id). Collected ONCE and
    passed to every model fit that needs it — the hash order makes it
    reproducible and id-order-unbiased (see ``ivf_centroids``)."""
    return (
        vectors.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(n)
        .collect()
    )


def ivf_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    sample_size: int = 1024,
    iters: int = 5,
    _sample: list | None = None,
) -> list[list[float]]:
    """Deterministic IVF "fit": k-means (Lloyd) on a bounded sample,
    driver-side. The sample is the ``sample_size`` vectors with the
    smallest ``xxhash64(id)`` — a deterministic HASH-ordERED sample
    (a top-n heap per partition / TakeOrdered, never a full sort), so
    the fit is exactly reproducible AND unbiased with respect to id
    order: ids routinely correlate with content (ingest time, source
    shard), and a lowest-id sample would silently fit centroids to
    one corner of the corpus. Init is the first ``n_centroids`` of
    the sample. ``iters`` Lloyd rounds run in numpy on at most
    sample_size x dim floats: the model-fit step is O(sample) driver
    work by design; the distributed serving path (cell assignment +
    nprobe probing) is unchanged. Empty cells keep their previous
    centroid."""
    import numpy as np

    rows = (
        _sample
        if _sample is not None
        else _fit_sample(
            vectors, id_col, vec_col, max(sample_size, n_centroids)
        )
    )
    x = np.asarray([list(map(float, r[vec_col])) for r in rows], dtype=np.float64)
    cents = x[:n_centroids].copy()
    for _ in range(iters):
        # cosine assignment (matches the serving path): normalize rows
        # once, score against norm-scaled centroids
        cn = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12
        )
        assign = np.argmax(x @ cn.T, axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return [list(map(float, c)) for c in cents]


def _centroid_scores(vec_sql: str, centroids: list[list[float]]) -> Column:
    """array<struct<score double, idx int>> of centroid AFFINITY:
    dot(vec, c) / ||c||, i.e. cosine times the row-constant ||vec||.
    Both consumers (argmax cell assignment, nprobe cell ordering) only
    compare scores across centroids for the SAME row, so the ||vec||
    factor cancels and is not computed at all. Centroid norms are
    computed driver-side (a HOF aggregate over a literal array is NOT
    constant-folded — left in the plan it would run per row). Built as
    one JVM-parsed SQL expression (see _dot_sql)."""
    entries = []
    for i, c in enumerate(centroids):
        norm = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        entries.append(
            f"named_struct('score', {_dot_sql(vec_sql, c)}"
            f" * CAST('{(1.0 / norm)!r}' AS DOUBLE), 'idx', {i})"
        )
    return F.expr(f"array({', '.join(entries)})")


def ivf_assign(vec_sql: str, centroids: list[list[float]]) -> Column:
    """Coarse-quantizer assignment: index of the max-cosine centroid."""
    return F.array_max(_centroid_scores(vec_sql, centroids))["idx"]


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
    dim: int | None = None,
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
    v = vectors.withColumn(
        "__cell", ivf_assign(vec_col, centroids)
    ).withColumn("__vn", l2_norm(F.col(vec_col)))
    q_scored = queries.withColumn(
        "__cells",
        F.slice(
            F.reverse(F.array_sort(_centroid_scores(query_vec_col, centroids))),
            1,
            nprobe,
        ),
    )
    q = q_scored.select(
        query_id_col,
        query_vec_col,
        F.explode(F.col("__cells")["idx"]).alias("__cell"),
    ).withColumn("__qn", l2_norm(F.col(query_vec_col)))
    joined = v.join(F.broadcast(q), "__cell")
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        (
            dot(F.col(vec_col), F.col(query_vec_col))
            / (F.col("__vn") * F.col("__qn"))
        ).alias("cosine_sim"),
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
    n_bands: int = 8,
    planes_per_band: int = 4,
    dim: int = 64,
    seed: int = 42,
    eager: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded hyperplane LSH
    self-join (candidates on ANY-band bucket match), exact cosine
    verify >= threshold.

    Banding is what makes the recall honest at the advertised
    threshold: a single n-plane bucket requires agreement on ALL n
    signs, and at cosine 0.95 the per-plane agreement is only
    ~1-acos(0.95)/pi ~= 0.90 — eight planes in one bucket find under
    half of threshold-grade pairs. With ``n_bands`` independent bands
    of ``planes_per_band`` planes (OR across bands — same k+1-band
    pigeonhole pattern as ``simhash_near_dups``), miss probability is
    (1 - 0.9^r)^b: the 8x4 default puts recall at ~0.9998 for 0.95
    pairs. Tuning for scale: ``planes_per_band`` controls pruning
    (random-pair collision ~2^-r per band), ``n_bands`` buys recall
    back — grow both together as the corpus grows.

    Shape: the normed vector table stays LAZY — all four of its
    plan appearances (both banded self-join sides, both verify
    rejoins) sit behind exactly two exchanges (hash(band,bucket) and
    hash(id)), which ReuseExchange dedupes, so the norm pipeline
    executes twice regardless of caching; an r10 persist+count
    "race fix" here was measured strictly worse (r11 A/B, quiet
    window: lazy 26.1 JVM-CPU-s vs persist+count 33.4 — the cache
    write plus the extra materialization job bought nothing) and
    would pin a corpus-width vector table in executor memory at
    scale. The banded self-join shuffles only (id, band, bucket);
    candidate pairs dedup map-side (a pair can match in up to
    n_bands bands) BEFORE the exact-cosine verify, so each pair's
    dot product is computed once. ``eager=True`` materializes the
    (small) pair table."""
    if n_bands < 1 or planes_per_band < 1 or planes_per_band > 62:
        raise ValueError(
            f"n_bands={n_bands}, planes_per_band={planes_per_band}: both "
            "must be >= 1 and a band's bucket must pack into a long "
            "(planes_per_band <= 62)"
        )
    from etl_script_spark.operators.dedup import _fan_out

    planes = random_hyperplanes(dim, n_bands * planes_per_band, seed)
    v = _fan_out(vectors).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    banded = v.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        lsh_bucket(
                            "vec",
                            planes[
                                b * planes_per_band : (b + 1) * planes_per_band
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    pairs = (
        banded.alias("a")
        .hint("shuffle_hash")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    j1 = (
        pairs.hint("shuffle_hash")
        .join(v, pairs["id_a"] == v["id"])
        .select(
            "id_a",
            "id_b",
            F.col("vec").alias("__vec_a"),
            F.col("__n").alias("__na"),
        )
    )
    cand = (
        j1.hint("shuffle_hash")
        .join(v, j1["id_b"] == v["id"])
        .select(
            "id_a",
            "id_b",
            "__vec_a",
            "__na",
            F.col("vec").alias("__vec_b"),
            F.col("__n").alias("__nb"),
        )
    )
    sim = dot(F.col("__vec_a"), F.col("__vec_b")) / (
        F.col("__na") * F.col("__nb")
    )
    out = cand.select(
        "id_a", "id_b", sim.alias("cosine_sim")
    ).filter(F.col("cosine_sim") >= threshold)
    if eager:
        out = out.persist()
        out.count()
    return out


def _assign_arrow(
    vectors: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Vectorized centroid assignment (id, cluster) via mapInPandas:
    one numpy V @ Cᵀ per Arrow batch instead of k interpreted HOF
    dots per row — the difference between ~16k interpreted ops/row
    and one BLAS call at k=256. Mirrors ivf_assign's semantics
    (affinity = dot/||c||, ties → larger idx via the reversed
    argmax); matmul summation order can differ from the expression
    fold in the last ulps, so exact-tie rows may assign differently —
    acceptable for the 'arrow' impl, which is not the bit-replayable
    path."""
    import numpy as np

    c = np.array(centroids, dtype="float64")
    cn = np.linalg.norm(c, axis=1)
    cn[cn == 0] = 1.0
    ct = (c / cn[:, None]).T
    k = len(centroids)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:  # defensive: np.stack raises on empty
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            s = v @ ct
            idx = (k - 1) - np.argmax(s[:, ::-1], axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cluster": idx.astype("int32")}
            )

    return vectors.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} long, cluster int"
    )


def kmeans_lloyd(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    impl: str = "expr",
) -> tuple[list[list[float]], DataFrame]:
    """Distributed Lloyd k-means over the FULL corpus (vs the bounded
    sample fit in ``ivf_centroids``): assignment is a broadcast-
    literal argmax evaluated inside the scan, the centroid update is
    one posexplode + (cluster, dim) aggregation per round — shuffle
    volume is rows x dim tiny floats, and the only driver traffic is
    k x dim aggregated sums per round. That is the canonical
    corpus-clustering shape at 100 TB: no vector ever crosses the
    wire un-aggregated.

    Engine-portable determinism, by construction:
      - init = the k vectors with smallest (md5(id), id) — any engine
        re-derives the same k rows;
      - assignment = cosine-affinity argmax (ties -> larger cluster
        idx, matching ``_centroid_scores`` struct ordering);
      - update quantizes each element to 1e-6 BEFORE summing
        (round(x*1e6) -> int64 sum -> /(1e6*n)): integer addition is
        order-independent, so the new centroids are bit-identical no
        matter the partitioning — and bit-identical across engines,
        which is what lets a SQL oracle replay the whole iteration.
        The 1e-6 quantization error is orders below any meaningful
        cluster geometry.

    Empty clusters keep their previous centroid. Returns (centroids,
    assignments DataFrame (id_col, cluster)).
    """
    if k <= 0 or iters < 0:
        raise ValueError(f"need k > 0 and iters >= 0, got k={k} iters={iters}")
    if impl not in ("expr", "arrow"):
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")
    init_rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(init_rows)}")
    cents = [[float(x) for x in r[vec_col]] for r in init_rows]
    dim = len(cents[0])

    def assign(cs: list[list[float]]) -> DataFrame:
        # 'arrow': numpy matmul assignment (see _assign_arrow) — the
        # k x dim interpreted-dot cost dominates the whole fit at
        # SemDeDup-scale k; 'expr' stays the bit-replayable contract
        if impl == "arrow":
            a = _assign_arrow(vectors, id_col, vec_col, cs)
            return vectors.select(id_col, vec_col).join(a, id_col)
        return vectors.select(
            F.col(id_col),
            F.col(vec_col),
            ivf_assign(vec_col, cs).alias("cluster"),
        )

    for _ in range(iters):
        assigned = assign(cents)
        sums = (
            assigned.select(
                "cluster",
                F.posexplode(
                    F.transform(F.col(vec_col), lambda x: x.cast("double"))
                ).alias("pos", "val"),
            )
            .groupBy("cluster", "pos")
            .agg(
                F.sum(F.round(F.col("val") * 1e6).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty cluster -> keep old
        for r in sums:
            new_cents[r["cluster"]][r["pos"]] = r["s"] / (1e6 * r["n"])
        cents = new_cents
    if impl == "arrow":
        out = _assign_arrow(vectors, id_col, vec_col, cents)
    else:
        out = vectors.select(
            F.col(id_col), ivf_assign(vec_col, cents).alias("cluster")
        )
    return cents, out


def quantize_int8(
    vectors: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x|/127,
    q_i = sign(x_i)·floor(|x_i|/scale + 0.5). At 100 TB an fp32
    embedding table is the storage AND shuffle bottleneck — int8 cuts
    both 4×, and every ANN operator in this module accepts the
    dequantized form at a ≤ scale/2 per-coordinate error (half a
    quantization step — the bound the catalog oracle asserts).

    The explicit sign/floor form (not round()) is deliberate:
    round-half behavior differs between engines for negatives, this
    formula is bit-identical everywhere. All-zero vectors take
    scale = 0 with all-zero codes. Returns (id, scale, q).
    """
    scale = F.array_max(
        F.transform(F.col(vec_col), lambda v: F.abs(v.cast("double")))
    ) / F.lit(127.0)
    out = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col),
        scale.alias("scale"),
    )
    q = F.when(F.col("scale") == 0.0, F.transform(
        F.col(vec_col), lambda v: F.lit(0)
    )).otherwise(
        F.expr(
            "transform(" + vec_col + ", v -> CAST("
            "CASE WHEN CAST(v AS DOUBLE) < 0 THEN -1 ELSE 1 END"
            " * floor(abs(CAST(v AS DOUBLE)) / scale + 0.5) AS INT))"
        )
    )
    return out.select("id", "scale", q.alias("q"))


def pq_fit(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    sample_size: int = 1024,
    iters: int = 8,
    _sample: list | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebook fit (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011 — public
    method): split the vector into ``m`` contiguous subspaces and run
    an independent L2 k-means (``ksub`` centroids) per subspace on a
    bounded, hash-ordered driver sample — the same deterministic
    unbiased fit-sample discipline as ``ivf_centroids`` (model fit is
    O(sample) driver work BY DESIGN; encode and search stay fully
    distributed). Init per subspace is the sample's first ``ksub``
    rows; empty cells keep their previous centroid.

    Returns codebooks[m][ksub][dim/m]."""
    import numpy as np

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    if ksub < 1 or ksub > 256:
        raise ValueError(f"ksub must be in [1, 256], got {ksub}")
    dsub = dim // m
    rows = (
        _sample
        if _sample is not None
        else _fit_sample(vectors, id_col, vec_col, max(sample_size, ksub))
    )
    x = np.asarray([list(map(float, r[vec_col])) for r in rows], dtype=np.float64)
    books: list[list[list[float]]] = []
    for s in range(m):
        xs = x[:, s * dsub : (s + 1) * dsub]
        cents = xs[:ksub].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(ksub):
                members = xs[assign == j]
                if len(members):
                    cents[j] = members.mean(axis=0)
        books.append([list(map(float, c)) for c in cents])
    return books


def _dot_flat_sql(vec_sql: str, offset: int, lits: list[float]) -> str:
    """Dot of vec[offset+1 .. offset+len] with a literal vector as
    STRAIGHT-LINE arithmetic (element_at products, no HOFs). The
    zip_with/aggregate form allocates an array and runs a lambda
    interpreter per evaluation — fine for one dot per row, ruinous
    for an encoder that evaluates m·ksub of them (the 1M-row stress
    measured 51 s HOF vs 6 s flat for the same math). The leading
    0.0D reproduces aggregate's fold order (incl. -0.0
    normalization) so flat and HOF dots are bit-identical."""
    terms = "".join(
        f" + (CAST(element_at({vec_sql}, {offset + d + 1}) AS DOUBLE)"
        f" * CAST('{float(v)!r}' AS DOUBLE))"
        for d, v in enumerate(lits)
    )
    return f"(0.0D{terms})"


def pq_encode(vec_sql: str, codebooks: list[list[list[float]]]) -> Column:
    """array<int> of per-subspace centroid codes for an embedding
    column: per subspace, the argmin-L2 centroid, computed as
    argmax of (dot(slice, c) - ||c||²/2) — the ||slice||² term is
    constant within a subspace's comparison set and never computed.
    One JVM-parsed SQL expression of straight-line element_at
    arithmetic (m·ksub flat dots; see ``_dot_flat_sql`` for why not
    HOFs, ``_dot_sql`` for why one parsed string beats per-literal
    py4j calls). Pure projection: encoding a 100 TB corpus is a
    scan-stage map with no shuffle, and the encoded form is
    ~dim·4/m bytes -> m bytes per vector (16× smaller at the
    defaults)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    subs = []
    for s in range(m):
        entries = []
        for j, c in enumerate(codebooks[s]):
            half = sum(float(v) * float(v) for v in c) / 2.0
            entries.append(
                f"named_struct('score', {_dot_flat_sql(vec_sql, s * dsub, c)}"
                f" - CAST('{half!r}' AS DOUBLE), 'idx', {j})"
            )
        subs.append(f"array_max(array({', '.join(entries)})).idx")
    return F.expr(f"array({', '.join(subs)})")


def _pq_lut_sql(codebooks: list[list[list[float]]]) -> str:
    """SQL literal for the codebooks as array<array<array<double>>>."""
    outer = []
    for book in codebooks:
        inner = ",".join(
            "array(" + ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in c) + ")"
            for c in book
        )
        outer.append(f"array({inner})")
    return f"array({','.join(outer)})"


def pq_adc_score(
    codes_sql: str,
    qvec_sql: str,
    codebooks: list[list[list[float]]],
    qnorm_sql: str | None = None,
) -> Column:
    """Asymmetric-distance (ADC) approximate cosine between a PQ-coded
    corpus row and a RAW query vector: the query side stays exact,
    the corpus side is reconstructed per subspace by code lookup —
    approx_cos = Σ_s dot(q_s, c[s][code_s]) / (||ĉ|| · ||q||), where
    ||ĉ||² = Σ_s ||c[s][code_s]||² is looked up from a literal norm
    table. All lookups are element_at over literal (constant-folded)
    arrays and the dots are straight-line element_at arithmetic — no
    HOF lambdas in the per-candidate hot path (the HOF form measured
    ~2× slower over 16M candidates). Pass ``qnorm_sql`` naming a
    precomputed ||q|| column when scoring many candidates per query
    (the inline aggregate recomputes it per candidate row)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    dots = []
    norms = []
    for s in range(m):
        book = (
            "array("
            + ",".join(
                "array("
                + ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in c)
                + ")"
                for c in codebooks[s]
            )
            + ")"
        )
        cent = f"element_at({book}, element_at({codes_sql}, {s + 1}) + 1)"
        terms = "".join(
            f" + (CAST(element_at({qvec_sql}, {s * dsub + d + 1}) AS DOUBLE)"
            f" * element_at({cent}, {d + 1}))"
            for d in range(dsub)
        )
        dots.append(f"(0.0D{terms})")
        nsq = ",".join(
            f"CAST('{sum(float(v) * float(v) for v in c)!r}' AS DOUBLE)"
            for c in codebooks[s]
        )
        norms.append(
            f"element_at(array({nsq}), element_at({codes_sql}, {s + 1}) + 1)"
        )
    qn = qnorm_sql or (
        f"sqrt(aggregate({qvec_sql}, 0.0D, "
        f"(acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )
    return F.expr(
        f"({' + '.join(dots)}) / "
        f"(sqrt(greatest({' + '.join(norms)}, 1e-24)) * greatest({qn}, 1e-12))"
    )


def pca_fit(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 16,
    sample_size: int = 2048,
) -> dict:
    """PCA fit on a bounded, hash-ordered driver sample (same
    deterministic unbiased fit-sample discipline as ``ivf_centroids``
    / ``pq_fit``): mean + covariance + symmetric eigendecomposition
    in numpy on at most sample_size × dim doubles. Model fit is
    O(sample) driver work BY DESIGN; the projection — the part that
    touches the corpus — stays fully distributed.

    Returns {"mean", "components" (k×dim, rows orthonormal, sorted by
    descending eigenvalue), "eigvals" (top-k), "total_var"}. Sign
    convention: each component is flipped so its largest-|coordinate|
    entry is positive — eigenvector sign is otherwise arbitrary and
    would make the fit run-to-run unstable."""
    import numpy as np

    if not 1 <= k <= dim:
        raise ValueError(f"k must be in [1, {dim}], got {k}")
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
        .limit(sample_size)
        .collect()
    )
    x = np.asarray([list(map(float, r[vec_col])) for r in rows], dtype=np.float64)
    mean = x.mean(axis=0)
    xc = x - mean
    cov = (xc.T @ xc) / max(len(x) - 1, 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": [float(v) for v in mean],
        "components": [[float(v) for v in c] for c in comps],
        "eigvals": [float(vals[o]) for o in order],
        "total_var": float(vals.sum()),
    }


def pca_project(vec_sql: str, model: dict, whiten: bool = False) -> Column:
    """Distributed PCA projection: array<double> of k scores,
    score_j = (x - mean)·c_j = x·c_j - (mean·c_j), the second term a
    driver-side constant. Straight-line element_at arithmetic (one
    flat dot per component — see ``_dot_flat_sql``), so projecting a
    100 TB corpus is a scan-stage map with no shuffle. ``whiten``
    scales each score by 1/sqrt(eigval) (unit variance per
    component; eigvals floored at 1e-12)."""
    comps = model["components"]
    mean = model["mean"]
    terms = []
    for j, c in enumerate(comps):
        off = sum(float(mi) * float(ci) for mi, ci in zip(mean, c))
        # HOF dot, not _dot_flat_sql: k×dim flat terms (1024 at the
        # defaults) overflow Janino's generated-method limit when the
        # projection fuses with downstream operators in one codegen
        # stage; k HOF dots per row is the ivf_assign cost profile
        expr = f"({_dot_sql(vec_sql, c)} - CAST('{off!r}' AS DOUBLE))"
        if whiten:
            scale = 1.0 / math.sqrt(max(model["eigvals"][j], 1e-12))
            expr = f"({expr} * CAST('{scale!r}' AS DOUBLE))"
        terms.append(expr)
    return F.expr(f"array({','.join(terms)})")


def pq_adc_lut(qvec_sql: str, codebooks: list[list[list[float]]]) -> Column:
    """Per-QUERY ADC lookup table: lut[s][j] = dot(q_s, c[s][j]) as
    one array<array<double>> column — m·ksub flat dots evaluated once
    per query row (queries are few and broadcast), so the
    per-CANDIDATE cost drops to m array lookups + m adds. This is the
    textbook ADC split (Jégou et al. 2011): table build per query,
    table lookup per candidate; embedding the codebook literals in
    the candidate expression instead re-instantiates them per row
    (measured 62 s vs 8 s over 16M candidates)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    subs = []
    for s in range(m):
        entries = ",".join(
            _dot_flat_sql(qvec_sql, s * dsub, c) for c in codebooks[s]
        )
        subs.append(f"array({entries})")
    return F.expr(f"array({','.join(subs)})")


def pq_adc_score_lut(
    codes_sql: str,
    lut_sql: str,
    qnorm_sql: str,
    codebooks: list[list[list[float]]],
) -> Column:
    """Per-candidate ADC cosine from a precomputed per-query LUT
    column (see ``pq_adc_lut``): Σ_s lut[s][code_s] over the
    reconstructed norm — m lookups, m adds, one sqrt. The
    reconstructed-norm tables are flat literal arrays (constant-
    folded once)."""
    m = len(codebooks)
    dots = []
    norms = []
    for s in range(m):
        code = f"element_at({codes_sql}, {s + 1}) + 1"
        dots.append(f"element_at(element_at({lut_sql}, {s + 1}), {code})")
        nsq = ",".join(
            f"CAST('{sum(float(v) * float(v) for v in c)!r}' AS DOUBLE)"
            for c in codebooks[s]
        )
        norms.append(f"element_at(array({nsq}), {code})")
    return F.expr(
        f"({' + '.join(dots)}) / "
        f"(sqrt(greatest({' + '.join(norms)}, 1e-24))"
        f" * greatest({qnorm_sql}, 1e-12))"
    )


def build_ivfpq_index(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
) -> tuple[DataFrame, dict]:
    """Fit the coarse quantizer + PQ codebooks and encode the corpus
    as (id, __cell, __codes) — the persistent IVF-PQ index. This is
    the AMORTIZED half: one scan-stage projection over the corpus
    (~1 μs/row/core measured at 1M×64), written once, served by every
    subsequent ``ivfpq_topk`` call. Returns (index_df, model) where
    model = {"centroids", "codebooks"} re-parameterizes the serve
    path (persist it next to the index — it is a few KB of floats)."""
    # ONE hash-ordered sample collect feeds BOTH fits: ivf_centroids
    # and pq_fit draw the identical deterministic sample (same order
    # key, same default size), so collecting it twice was a pure
    # duplicate scan+TakeOrdered job on the serve path (r10 measure:
    # the inline-build entry is latency-bound on its stage chain, not
    # on encode CPU — a fan-out of the encode moved nothing).
    sample = _fit_sample(
        vectors, id_col, vec_col, max(1024, n_centroids, ksub)
    )
    centroids = ivf_centroids(
        vectors, id_col, vec_col, n_centroids, _sample=sample
    )
    codebooks = pq_fit(
        vectors, id_col, vec_col, dim=dim, m=m, ksub=ksub, _sample=sample
    )
    index = vectors.select(
        F.col(id_col),
        ivf_assign(vec_col, centroids).alias("__cell"),
        pq_encode(vec_col, codebooks).alias("__codes"),
    )
    return index, {"centroids": centroids, "codebooks": codebooks}


def ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 8,
    ksub: int = 16,
    dim: int = 64,
    refine: int = 4,
    index: DataFrame | None = None,
    model: dict | None = None,
) -> DataFrame:
    """IVF-PQ approximate cosine top-k — the memory-bounded 100 TB ANN
    serving shape: corpus rows are stored as (coarse cell, m PQ
    codes) — ~m bytes instead of dim·4 — candidates come from nprobe
    coarse cells, scoring is code-table lookups (ADC), and only the
    per-query ``refine·k`` shortlist ever touches raw vectors again
    for an exact rerank.

    Scale analysis: the compressed index build is one scan-stage
    projection; the candidate join broadcasts the (few) queries; the
    rerank joins the corpus against a BROADCAST shortlist (queries ×
    refine·k ids), so the full-width embedding table is scanned but
    never shuffled. vs plain IVF: 16× less candidate data moves
    through the probe stage, at the cost of the refine join — the
    standard recall/throughput trade (Jégou et al. 2011).

    Pass ``index``/``model`` from ``build_ivfpq_index`` to serve from
    a pre-encoded corpus (the production shape: the encode is an
    index BUILD, paid once, not per query batch); omitted, both are
    built inline — fine for one-shot jobs, ~3× the serve cost."""
    if (index is None) != (model is None):
        raise ValueError("pass both index and model, or neither")
    if index is None:
        compressed, model = build_ivfpq_index(
            vectors, id_col, vec_col, n_centroids, m, ksub, dim
        )
        # the inline-built encode projection is a ~10^4-node literal
        # expression tree (m·ksub flat dots); left lazy it is
        # re-analyzed by EVERY AQE stage re-plan downstream — measured
        # ~7.5 s of inter-job driver gaps per serve at sf0.1 against
        # ~4.4 s of actual job time (r11). A lazy localCheckpoint
        # materializes it with the first candidate-join job, so later
        # re-plans see a flat LogicalRDD. This mirrors the production
        # shape (build once, serve from the materialized index) without
        # touching the passed-index path, where the caller owns it.
        # Trade (standard localCheckpoint semantics, same as the CC /
        # catalog re-homing sites): lineage is truncated, so losing an
        # executor that holds checkpoint blocks fails later actions
        # instead of recomputing, and the compressed index stays
        # pinned until the returned DataFrame is GC'd — long-lived
        # multi-serve callers should build the index once via
        # build_ivfpq_index and pass it in.
        compressed = compressed.localCheckpoint(eager=False)
    else:
        compressed = index
    centroids = model["centroids"]
    codebooks = model["codebooks"]
    q_scored = queries.withColumn(
        "__cells",
        F.slice(
            F.reverse(F.array_sort(_centroid_scores(query_vec_col, centroids))),
            1,
            nprobe,
        ),
    )
    q = q_scored.select(
        query_id_col,
        query_vec_col,
        F.explode(F.col("__cells")["idx"]).alias("__cell"),
    ).withColumn("__qn", l2_norm(F.col(query_vec_col))).withColumn(
        "__lut", pq_adc_lut(query_vec_col, codebooks)
    )
    # same re-analysis economics as the index: the per-query LUT is
    # another m·ksub-dot literal tree over a FEW rows (queries are
    # few and broadcast by contract) — materialize it once instead of
    # re-analyzing it in every downstream AQE re-plan
    q = q.localCheckpoint(eager=False)
    cand = compressed.join(F.broadcast(q), "__cell").select(
        F.col(query_id_col),
        F.col(id_col),
        pq_adc_score_lut("__codes", "__lut", "__qn", codebooks).alias("__adc"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__adc").desc(), F.col(id_col).asc()
    )
    shortlist = (
        cand.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= refine * k)
        .select(query_id_col, id_col)
    )
    # exact rerank: corpus joins a BROADCAST shortlist (never shuffles)
    rer = vectors.join(F.broadcast(shortlist), id_col).join(
        F.broadcast(
            queries.select(
                query_id_col,
                F.col(query_vec_col).alias("__qv"),
                l2_norm(F.col(query_vec_col)).alias("__qn"),
            )
        ),
        query_id_col,
    )
    scored = rer.select(
        F.col(query_id_col),
        F.col(id_col),
        (
            dot(F.col(vec_col), F.col("__qv"))
            / (l2_norm(F.col(vec_col)) * F.col("__qn"))
        ).alias("cosine_sim"),
    )
    wf = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(wf))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def embedding_cross_contam(
    corpus: DataFrame,
    bench: DataFrame,
    corpus_id: str = "vec_id",
    bench_id: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.999,
    n_bands: int = 8,
    planes_per_band: int = 16,
    dim: int = 64,
    seed: int = 42,
    impl: str = "arrow",
) -> DataFrame:
    """Embedding-level benchmark decontamination: every corpus vector
    whose cosine to ANY benchmark vector clears ``threshold`` —
    paraphrase-grade contamination the n-gram overlap report
    (decontam.contamination_report) cannot see.

    ``impl`` selects the BANDING evaluation: 'arrow' (default) packs
    the 128 sign bits with one numpy matmul per batch
    (_banded_arrow — the interpreted HOF path costs ~0.75 ms/row at
    8x16x64, which at corpus scale is the whole job); 'expr' keeps
    the pure-expression banding. The choice cannot change the
    RESULT: banding only generates candidates, every candidate is
    verified with the exact-cosine expression, and identical vectors
    band identically under either impl — so the outcome-level oracle
    (pair set vs brute force) holds for both.

    Scale asymmetry is the whole design: the benchmark side is
    eval-suite sized (thousands), the corpus is the 100 TB side — so
    the BENCH banded keys broadcast into the corpus scan stage, the
    candidate pair table broadcasts back onto the corpus for the
    vector fetch, and the bench vectors broadcast for the verify dot
    product. The corpus is never shuffled, never self-joined: one
    scan, map-side candidate probing, exact-cosine verify on the
    (tiny) candidate set. Banding math is embedding_near_dups'
    (OR-of-bands pigeonhole; identical vectors agree in every band,
    so planted verbatim contamination has recall exactly 1).

    Bands are TIGHT here (16 planes ≈ 65k buckets per band), unlike
    near_dups' loose 4: at a 0.999 threshold the per-plane agreement
    probability is cos-angle ≈ 0.986, so 16-plane bands still OR up
    to > 0.9999 recall — while 4-plane bands (16 buckets) make random
    corpus×bench pairs collide at ~40% and the candidate set
    degenerates toward the cross product (measured: 81k of 200k
    possible pairs at sf0.1 → 147 after tightening). Band width must
    scale with the threshold's proximity to 1; the near-dup default
    would be a recall cliff here in reverse."""
    if impl not in ("expr", "arrow"):
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")
    planes = random_hyperplanes(dim, n_bands * planes_per_band, seed)

    def banded(df: DataFrame, idc: str, out: str) -> DataFrame:
        if impl == "arrow":
            return _banded_arrow(
                df, idc, out, vec_col, planes, n_bands, planes_per_band
            )
        return df.select(
            F.col(idc).alias(out),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            lsh_bucket(
                                vec_col,
                                planes[
                                    b * planes_per_band : (b + 1)
                                    * planes_per_band
                                ],
                            ).alias("bucket"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bb"),
        ).select(out, "bb.band", "bb.bucket")

    c_banded = banded(corpus, corpus_id, "corpus_id")
    b_banded = banded(bench, bench_id, "bench_id")
    cand = (
        c_banded.join(F.broadcast(b_banded), ["band", "bucket"])
        .select("corpus_id", "bench_id")
        .dropDuplicates(["corpus_id", "bench_id"])
    )
    b_vecs = bench.select(
        F.col(bench_id).alias("bench_id"),
        F.col(vec_col).alias("__bvec"),
        l2_norm(F.col(vec_col)).alias("__bn"),
    )
    verified = (
        corpus.select(
            F.col(corpus_id).alias("corpus_id"),
            F.col(vec_col).alias("__cvec"),
            l2_norm(F.col(vec_col)).alias("__cn"),
        )
        .join(F.broadcast(cand), "corpus_id")
        .join(F.broadcast(b_vecs), "bench_id")
    )
    sim = dot(F.col("__cvec"), F.col("__bvec")) / (
        F.col("__cn") * F.col("__bn")
    )
    return verified.select(
        "corpus_id", "bench_id", sim.alias("cosine_sim")
    ).filter(F.col("cosine_sim") >= threshold)


def semantic_dedup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.999,
    k: int = 8,
    iters: int = 2,
    impl: str = "expr",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    k-means-cluster the corpus, then search for near-duplicate pairs
    ONLY within each cluster — cosine >= threshold, exact verify.

    The cluster id is the candidate-generation key, exactly as the
    band/bucket is for MinHash: pairs are generated by a self-join on
    ``cluster``, so the pair space shrinks from O(n²) to
    O(sum c_i²) ≈ O(n²/k). Identical vectors always share a cluster
    (assignment is a deterministic function of the vector), so
    verbatim-duplicate recall is exactly 1; semantically-near pairs
    split across a cluster boundary are the accepted SemDeDup recall
    trade, bounded by cluster geometry. At 100 TB, k scales as
    n / target_cluster_size (the paper runs k in the tens of
    thousands) and the per-cluster join stays data-local after one
    repartition on cluster.

    Returns (id_a, id_b, cluster, cosine) with id_a < id_b.

    ``impl='expr'`` (default) evaluates the per-pair cosine as a pure
    Column expression — bit-replayable by a SQL oracle, the
    correctness-contract path. ``impl='arrow'`` runs one vectorized
    numpy block per cluster (``_cluster_pairs_arrow``) — ~100x faster
    per pair and the right choice at corpus scale, at the cost of
    last-ulp summation-order differences near the threshold.
    """
    _, assigned = kmeans_lloyd(
        vectors, id_col=id_col, vec_col=vec_col, k=k, iters=iters,
        impl="arrow" if impl == "arrow" else "expr",
    )
    sided = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("__vec"),
        l2_norm(F.col(vec_col)).alias("__n"),
    ).join(assigned.select(F.col(id_col).alias("id"), "cluster"), "id")
    if impl == "arrow":
        return _cluster_pairs_arrow(
            sided.select("id", "__vec", "cluster"), threshold
        )
    if impl != "expr":
        raise ValueError(f"impl must be 'expr' or 'arrow', got {impl!r}")
    a, b = sided.alias("a"), sided.alias("b")
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "cluster",
            (
                dot(F.col("a.__vec"), F.col("b.__vec"))
                / (F.col("a.__n") * F.col("b.__n"))
            ).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= F.lit(threshold))


def _cluster_pairs_arrow(sided: DataFrame, threshold: float) -> DataFrame:
    """Arrow fast path for the within-cluster pair search: one numpy
    pairwise-cosine block per cluster via applyInPandas. This is the
    sanctioned escape hatch of the UDF policy — the candidate space
    is already bounded by the cluster key, but evaluating ~n²/k dot
    products through interpreted HOF expressions costs ~12 µs each;
    the vectorized G = (V·Vᵀ)/(‖v‖‖v‖ᵀ) block is ~100x faster and
    the batch unit (one cluster) is exactly the paper's working set.
    Numeric caveat: numpy's SIMD/pairwise summation orders additions
    differently from the expression fold, so near-threshold cosines
    can differ in the last ulps between impls — callers needing
    bit-replayable output (the driver oracle) use the expression
    path; callers at corpus scale use this one."""
    import pandas as pd

    out_schema = (
        "id_a long, id_b long, cluster int, cosine double"
    )

    def pairs_in_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(pdf) < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cluster": [], "cosine": []}
            ).astype({"id_a": "int64", "id_b": "int64",
                      "cluster": "int32", "cosine": "float64"})
        pdf = pdf.sort_values("id").reset_index(drop=True)
        v = np.stack(pdf["__vec"].to_numpy()).astype("float64")
        n = np.linalg.norm(v, axis=1)
        g = (v @ v.T) / np.outer(n, n)
        ia, ib = np.triu_indices(len(pdf), k=1)
        keep = g[ia, ib] >= threshold
        ids = pdf["id"].to_numpy()
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cluster": np.full(int(keep.sum()), pdf["cluster"].iloc[0],
                                   dtype="int32"),
                "cosine": g[ia, ib][keep],
            }
        )

    return sided.groupBy("cluster").applyInPandas(pairs_in_cluster, out_schema)




def _banded_arrow(
    df: DataFrame,
    id_col: str,
    out: str,
    vec_col: str,
    planes: list[list[float]],
    n_bands: int,
    planes_per_band: int,
) -> DataFrame:
    """(out, band, bucket) banding rows via one numpy sign-bit matmul
    per Arrow batch. The HOF expression path evaluates n_bands x
    planes_per_band interpreted zip_with/aggregate dots per row
    (~0.75 ms/row at 8x16x64 — measured; utterly dominant at corpus
    scale); V @ Pᵀ + bit packing is ~3 orders cheaper. Bucket ids
    equal the lsh_bucket packing except for dots within an ulp of
    zero, where summation order can flip the sign bit — immaterial
    for banding (a flipped bucket is one more/fewer candidate, and
    identical vectors band identically within an impl)."""
    import numpy as np

    p = np.array(planes, dtype="float64").T  # (dim, n_planes)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:  # defensive: np.stack raises on empty
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            bits = (v @ p) >= 0  # (n, n_planes)
            buckets = np.zeros((len(pdf), n_bands), dtype="int64")
            for b in range(n_bands):
                for i in range(planes_per_band):
                    buckets[:, b] |= (
                        bits[:, b * planes_per_band + i].astype("int64") << i
                    )
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    out: np.repeat(ids, n_bands),
                    "band": np.tile(
                        np.arange(n_bands, dtype="int32"), len(pdf)
                    ),
                    "bucket": buckets.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{out} long, band int, bucket long"
    )


def inbatch_negatives(
    df: DataFrame, id_col: str, k: int = 4, n_batches: int = 1024,
    seed: str = "b",
) -> DataFrame:
    """In-batch negative sampling for contrastive training: assign rows
    to pseudo-random batches (md5 bucket — engine-replayable, unlike
    xxhash64), order each batch on a second md5 ring, and give every
    anchor its next ``k`` ring neighbors (cyclic) as negatives —
    exactly the in-batch-negatives scheme contrastive losses use, made
    deterministic and reproducible across runs/engines/partitionings.

    One shuffle (groupBy batch), then pure array functions over the
    collected batch — batches are corpus_size/n_batches rows, so size
    ``n_batches`` to keep each batch at the intended training batch
    size (the collect_list per group is bounded by that choice, not by
    data volume). Self-pairing is impossible: offsets run 1..min(k,
    m-1) around a ring of m distinct members; singleton batches emit
    nothing. Returns exploded ``(id, negative_id, off)`` pairs."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_batches < 1:
        raise ValueError(f"n_batches must be >= 1, got {n_batches}")
    sid = F.col(id_col).cast("string")
    batch = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), sid)), 1, 8), 16, 10
    ).cast("long") % n_batches
    ring = F.md5(F.concat(F.lit("r"), sid))
    grouped = (
        df.select(
            F.col(id_col).alias("__id"),
            batch.alias("__batch"),
            ring.alias("__ring"),
        )
        .groupBy("__batch")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("__ring"), F.col("__id")))
                ),
                lambda s: s["__id"],
            ).alias("__ids")
        )
    )
    m = F.size("__ids")
    pairs = grouped.select(
        "__batch",
        "__ids",
        F.posexplode("__ids").alias("__i", "id"),
    ).filter(m > 1)
    offs = F.sequence(F.lit(1), F.least(F.lit(k), F.size("__ids") - 1))
    return (
        pairs.select(
            "id",
            "__ids",
            "__i",
            F.explode(offs).alias("off"),
        )
        .select(
            "id",
            F.col("__ids")[
                (F.col("__i") + F.col("off")) % F.size("__ids")
            ].alias("negative_id"),
            "off",
        )
    )


def maxsim_topk(
    doc_vecs: DataFrame,
    query_vecs: DataFrame,
    k: int = 3,
    doc_id_col: str = "doc_id",
    query_id_col: str = "query_id",
    idx_col: str = "vec_idx",
    vec_col: str = "embedding",
) -> DataFrame:
    """Late-interaction multi-vector retrieval (ColBERT MaxSim,
    Khattab & Zaharia, SIGIR 2020): score(q, d) = sum over the
    query's vectors of the MAX cosine against any of the document's
    vectors. The single-vector rankers in this module collapse a
    document to one point; MaxSim keeps per-token vectors and matches
    each query facet to its best document facet — the standard rerank
    stage over an ANN candidate set (``ivf_topk``/``ivfpq_topk``
    generate candidates at corpus scale; this scores them — the
    brute-force form here IS the rerank shape, candidates = corpus at
    fixture size).

    Inputs are EXPLODED multi-vector frames: (doc_id, vec_idx,
    embedding) and (query_id, vec_idx, embedding). Queries broadcast
    (the rerank shape: few queries x candidate set), so the document
    side never shuffles for the join; the (query, qvec, doc) max and
    the (query, doc) sum are map-side-combinable aggregates keyed by
    query-bounded cardinality.

    Determinism: max over doubles is order-free; the per-(q, d) SUM
    of maxes is folded in qvec_idx order from an ordered collect
    (float addition does not commute across partition orders — a
    plain SUM(double) would drift run-to-run and engine-to-engine).
    Ranking ties break on doc id.

    Returns (query_id, doc_id, maxsim, rank), top-k rows per query.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    d = doc_vecs.select(
        F.col(doc_id_col).alias("__did"),
        F.col(vec_col).alias("__dv"),
    ).withColumn("__dn", l2_norm(F.col("__dv")))
    q = query_vecs.select(
        F.col(query_id_col).alias("__qid"),
        F.col(idx_col).alias("__qv_idx"),
        F.col(vec_col).alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    pair_max = (
        d.crossJoin(F.broadcast(q))
        .select(
            "__qid",
            "__qv_idx",
            "__did",
            (
                dot(F.col("__dv"), F.col("__qv"))
                / (F.col("__dn") * F.col("__qn"))
            ).alias("__cos"),
        )
        .groupBy("__qid", "__qv_idx", "__did")
        .agg(F.max("__cos").alias("__mx"))
    )
    scored = (
        pair_max.groupBy("__qid", "__did")
        .agg(
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("__qv_idx", "__mx"))
                    ),
                    lambda s: s["__mx"],
                ),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            ).alias("maxsim")
        )
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("maxsim").desc(), F.col("__did").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__did").alias(doc_id_col),
            "maxsim",
            "rank",
        )
    )


def kcenter_coreset(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985, the 2-approx
    farthest-point heuristic): seed with the min-id vector, then k−1
    times pick the point FARTHEST from the current center set — the
    maximally-diverse data subset a curation pipeline wants for
    balanced eval sets or cluster seeding (SVP/coreset literature,
    e.g. Sener & Savarese ICLR'18 use exactly this selection).

    Distances are squared L2 decomposed as ‖v‖² − 2·v·c + ‖c‖², each
    dot a sequential HOF fold — the SAME association order on any
    engine, so argmax selection is bitwise-stable. Each round is one
    aggregation-free scan + a TakeOrdered(1); only the k selected
    vectors ever reach the driver (the kmeans_lloyd bounded-collect
    contract). Round i re-derives the min-distance chain from the i
    broadcast literals (Θ(k²·n/2) dots total — k is single digits).

    Returns (sel_order, vec_id, d2_ppb): the selection order, and the
    ppb-quantized squared distance to the PRIOR center set at the
    moment of selection (NULL for the seed; monotonically
    non-increasing — the coverage-radius curve).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = emb.select(
        F.col(id_col).alias("__vid"), F.col(vec_col).alias("__vec")
    ).filter(F.col("__vec").isNotNull())
    seed = base.orderBy("__vid").limit(1).collect()[0]
    centers = [(seed["__vid"], [float(x) for x in seed["__vec"]], None)]

    def d2_to(lits: list[float]) -> Column:
        cc = 0.0
        for x in lits:
            cc = cc + float(x) * float(x)
        return (
            dot(F.col("__vec"), F.col("__vec"))
            - 2.0 * dot_lit(F.col("__vec"), lits)
            + F.lit(cc)
        )

    for _ in range(k - 1):
        mind = None
        for _vid, lits, _ in centers:
            d = d2_to(lits)
            mind = d if mind is None else F.least(mind, d)
        far = (
            base.withColumn("__d", mind)
            .orderBy(F.col("__d").desc(), F.col("__vid").asc())
            .limit(1)
            .collect()[0]
        )
        centers.append(
            (far["__vid"], [float(x) for x in far["__vec"]], far["__d"])
        )
    spark = emb.sparkSession
    import math

    # half-up quantization (floor(x+0.5)), matching SQL ROUND for the
    # non-negative d2 — python's round() is banker's and would differ
    # on exact .5 boundaries
    rows = [
        (i, vid, None if d is None else int(math.floor(d * 1e9 + 0.5)))
        for i, (vid, _, d) in enumerate(centers)
    ]
    return spark.createDataFrame(
        rows, "sel_order int, vec_id long, d2_ppb long"
    )


def mutual_knn_pairs(
    neighbors: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "vec_id",
) -> DataFrame:
    """Reciprocal-kNN filter: keep the pairs (a, b) where b is in a's
    top-k AND a is in b's — the standard high-precision matching
    refinement (reciprocal nearest neighbors are the backbone of
    image-dedup and re-ID pipelines; mutual agreement kills the
    hub/asymmetry false positives one-directional kNN suffers).

    Takes ANY (query, neighbor) top-k relation — brute, LSH, IVF,
    IVF-PQ — so the recall/cost trade rides the upstream index
    choice; this stage is one self-equi-join of the (already small,
    n·k-row) neighbor list on the swapped key pair. Self-pairs are
    dropped; output is canonicalized a < b (each mutual pair once).

    Returns (id_a, id_b).
    """
    e = neighbors.select(
        F.col(query_col).alias("q"), F.col(neighbor_col).alias("n")
    ).filter(F.col("q") != F.col("n"))
    rev = e.select(F.col("n").alias("q"), F.col("q").alias("n"))
    return (
        e.join(rev, ["q", "n"], "left_semi")
        .filter(F.col("q") < F.col("n"))
        .select(F.col("q").alias("id_a"), F.col("n").alias("id_b"))
    )
