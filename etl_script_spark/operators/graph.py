"""Link-analysis operators: PageRank over an edge DataFrame.

Complements the connected-components family (dedup.py) with the other
canonical iterative graph computation — importance propagation. Used
in training-data curation as a document/site authority signal (e.g.
weighting a crawl by harmonic/PageRank centrality before sampling).

Scale shape: one join + one aggregation per iteration, both
partitioned by vertex id; ranks are a (vertex, int64) table — edges
are never materialized per-iteration, and each round's result is
lazily localCheckpointed so the plan stays linear in iterations (the
CC lesson). No driver-side graph, no collect.

Determinism: ranks live in NANO-units (int64, 1.0 ≡ 10⁹) and every
per-edge contribution is INTEGER floor division — `(rank·d_pct) DIV
(100·out_degree)` — so iteration results are bit-identical across
partitionings and engines; an unrolled SQL oracle can replay the
exact arithmetic. The quantization error per step is < out_degree
nano-units — irrelevant at ranking granularity, priceless for
verification. The multiply runs in DECIMAL(38,0) (HUGEINT on the
DuckDB side) so a mega-hub's rank·85 cannot wrap int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 1_000_000_000


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank. Returns (vertex, rank_nano, rank).

    Vertices = union of sources and destinations. A vertex with no
    out-edges (dangling) keeps its damped base share only — its mass
    is dropped rather than redistributed, the common simplification
    (and the one the oracle replays).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # join once: every edge knows its source's out-degree
    e_deg = e.join(outdeg, "src").localCheckpoint(eager=False)

    ranks = verts.select(
        "vertex", F.lit(NANO).cast("long").alias("rank_nano")
    ).localCheckpoint(eager=False)
    teleport = F.lit(((100 - damping_pct) * NANO) // 100).cast("long")
    for _i in range(iters):
        contrib = (
            e_deg.join(
                ranks, e_deg["src"] == ranks["vertex"], "inner"
            )
            .select(
                F.col("dst").alias("vertex"),
                # the multiply runs in DECIMAL(38,0): rank_nano*85 on a
                # hub whose accumulated rank exceeds ~1.08e17 (a ~1e9-
                # spoke star at web-crawl scale) would silently wrap in
                # int64 under non-ANSI mode; decimal is exact, DIV then
                # floors back to BIGINT with identical values in the
                # non-overflow range
                F.expr(
                    f"CAST(CAST(rank_nano AS DECIMAL(38,0)) * {damping_pct}"
                    f" DIV (100 * outdeg) AS LONG)"
                ).alias("c"),
            )
            .groupBy("vertex")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            verts.join(contrib, "vertex", "left")
            .select(
                "vertex",
                (teleport + F.coalesce(F.col("in_mass"), F.lit(0))).alias(
                    "rank_nano"
                ),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "vertex",
        "rank_nano",
        (F.col("rank_nano") / NANO).alias("rank"),
    )


def triangle_count(edges: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Exact triangle count — 1 row (n_vertices, n_edges, n_triangles).

    Input is an arbitrary directed edge list; it is canonicalized to a
    simple undirected graph (self-loops dropped, both orientations and
    duplicates collapsed). Counting uses the degree-ordered
    "compact-forward" orientation (Latapy 2008): every edge points
    from the endpoint with the smaller (degree, id) to the larger, so
    each triangle closes exactly once and — the 100 TB property — the
    wedge-building self-join fans out per vertex by its ORIENTED
    out-degree, which is O(sqrt(m)) even for celebrity hubs, instead
    of the O(deg²) wedge explosion an id-ordered orientation suffers
    on skewed graphs. Two self-joins partitioned on vertex ids; the
    count is orientation-invariant, so an id-ordered SQL oracle
    reproduces it exactly.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .unionAll(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("deg").alias("dv"))
    # orient: a -> b  where (deg_a, a) < (deg_b, b)
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
            .alias("e")
        )
        .select("e.a", "e.b")
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
        F.col("e1.a").alias("wa"), F.col("e2.b").alias("wc")
    )
    tris = wedges.join(
        e3, (F.col("wa") == F.col("e3.a")) & (F.col("wc") == F.col("e3.b"))
    )
    return (
        und.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(deg.agg(F.count(F.lit(1)).alias("n_vertices")))
        .crossJoin(tris.agg(F.count(F.lit(1)).alias("n_triangles")))
        .select("n_vertices", "n_edges", "n_triangles")
    )


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` iterations of "drop every
    vertex with degree < k and its edges". Returns the surviving
    (vertex, deg) table with degrees AFTER the last completed peel.

    The full k-core is this peel run to fixpoint; a FIXED round count
    is the declared-query contract (each round is one degree
    aggregation + two semi-joins, and an unrolled SQL oracle can
    replay exactly ``rounds`` of them — a data-dependent fixpoint
    cannot be hash-checked). Production callers loop with an
    edge-count convergence probe (one tiny action per round, the CC
    pattern); each round's edge set is lazily localCheckpointed so
    plan depth stays constant. Peeling monotonically shrinks the
    graph, so per-round cost only decreases — the skew note from
    triangle_count does not apply (degree is re-derived per round,
    no wedge joins)."""
    cur = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("u").alias("x"))
            .unionAll(e.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    for i in range(rounds):
        keep = degrees(cur).filter(F.col("deg") >= k).select("x")
        cur = (
            cur.join(keep.withColumnRenamed("x", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("x", "v"), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
    return degrees(cur).select(F.col("x").alias("vertex"), "deg")


def flatten_hierarchy(
    nodes: DataFrame,
    id_col: str = "node",
    parent_col: str = "parent",
    max_depth: int = 64,
) -> DataFrame:
    """Flatten a parent-pointer hierarchy (org chart, category tree,
    thread tree) to per-node (root, depth, path id-sum) by POINTER
    JUMPING (Wyllie 1979 list ranking): each round replaces every
    node's ancestor pointer with its ancestor's ancestor while
    folding the path aggregates, so a depth-d chain resolves in
    ``ceil(log2 d)`` self-joins — O(log d) shuffles — where the naive
    parent-at-a-time walk is O(d) shuffles (the difference between 6
    rounds and a thousand on a deep thread tree at 100 TB). Roots are
    rows with ``parent == id``; every parent must exist as a node id.

    Fold invariant per row: (anc, depth, psum) = the ancestor pointer,
    the edge count from the node to ``anc``, and the sum of node ids
    on the path node..anc INCLUSIVE. Composing two half-paths
    double-counts the shared midpoint, hence ``psum_a + psum_b -
    anc_a``. A root's record (anc=self, depth=0, psum=id) is the
    fixed point: composing with it changes nothing, so converged rows
    pass through later rounds unchanged. Each round is
    localCheckpointed lazily so the logical plan stays linear in
    rounds, not exponential.

    Returns (node, root, depth, path_sum); depth 0 and path_sum = id
    for roots.
    """
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    rounds = max(1, (max_depth - 1).bit_length())
    is_root = F.col(parent_col) == F.col(id_col)
    state = nodes.select(
        F.col(id_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.when(is_root, F.lit(0)).otherwise(F.lit(1)).cast("long")
        .alias("depth"),
        F.when(is_root, F.col(id_col))
        .otherwise(F.col(id_col) + F.col(parent_col)).cast("long")
        .alias("psum"),
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        nxt = state.select(
            F.col("node").alias("__j"),
            F.col("anc").alias("__anc2"),
            F.col("depth").alias("__d2"),
            F.col("psum").alias("__s2"),
        )
        state = (
            state.join(nxt, F.col("anc") == F.col("__j"))
            .select(
                "node",
                F.col("__anc2").alias("anc"),
                (F.col("depth") + F.col("__d2")).alias("depth"),
                (F.col("psum") + F.col("__s2") - F.col("anc")).alias("psum"),
            )
            .localCheckpoint(eager=False)
        )
    return state.select(
        "node", F.col("anc").alias("root"), "depth",
        F.col("psum").alias("path_sum"),
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """Multi-source breadth-first hop distance, fixed-iteration: every
    vertex gets the length of the shortest edge path from ANY source
    vertex, capped at ``max_hops`` (unreached vertices report NULL).
    The blast-radius / influence-frontier primitive (which records are
    within k links of a flagged entity?).

    Iteration i computes dist_{i+1}(v) = min(dist_i(v), 1 + min over
    in-edges of dist_i(u)) — a join + min-aggregation per round, the
    textbook relational BFS. Per round: one shuffle join of the edge
    list against the current frontier table and one map-side-combined
    min; ``localCheckpoint(eager=False)`` truncates the lineage per
    round like pagerank, so max_hops rounds never stack a deep plan.
    Distances are small integers; everything is exact and engine-
    independent (min is order-free), so an unrolled recursive-CTE
    oracle replays it bit-for-bit.

    ``sources`` must carry one column named ``vertex``. Returns
    (vertex, hops) for ALL vertices of the edge set.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    verts = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    dist = verts.join(
        sources.select(F.col("vertex"), F.lit(0).alias("__d")).distinct(),
        "vertex",
        "left",
    ).select("vertex", F.col("__d").alias("hops")).localCheckpoint(
        eager=False
    )
    for _i in range(max_hops):
        relaxed = (
            e.join(dist, e["src"] == dist["vertex"], "inner")
            .filter(F.col("hops").isNotNull())
            .select(
                F.col("dst").alias("vertex"),
                (F.col("hops") + 1).alias("__cand"),
            )
            .groupBy("vertex")
            .agg(F.min("__cand").alias("__cand"))
        )
        dist = (
            dist.join(relaxed, "vertex", "left")
            .select(
                "vertex",
                # F.least skips NULLs: an unreached vertex with a new
                # candidate takes the candidate; both NULL stays NULL
                F.least(F.col("hops"), F.col("__cand")).alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
    return dist


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """Synchronous label propagation (LPA) community detection over
    the UNDIRECTED view of the edge list, deterministic variant:
    every vertex starts as its own label; each round, a vertex adopts
    the most frequent label among its neighbors, ties broken by the
    SMALLEST label (the determinism knob — vanilla LPA breaks ties
    randomly and is irreproducible, useless for an oracle-checked
    engine). Fixed ``iters`` rounds, no convergence test (synchronous
    LPA can oscillate on bipartite-ish structure; a fixed horizon is
    the standard production cut, cf. GraphX/GraphFrames LPA).

    Distinct from connected components (dedup.cc_*): CC merges
    everything reachable; LPA's mode-vote keeps densely-knit groups
    apart even when bridged by a few edges — the community shape
    collusion/abuse detection wants. Per round: one shuffle join
    frontier←edges, one (vertex,label) count, one max_by-style
    argmax via the (cnt desc, label asc) struct-max trick — all
    map-side combinable, lineage truncated per round.

    Returns (vertex, label).
    """
    fwd = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    )
    und = (
        fwd.unionByName(
            fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    verts = und.select(F.col("a").alias("vertex")).distinct()
    labels = verts.select(
        "vertex", F.col("vertex").alias("label")
    ).localCheckpoint(eager=False)
    for _i in range(iters):
        votes = (
            und.join(labels, und["b"] == labels["vertex"], "inner")
            .select(F.col("a").alias("v"), "label")
            .groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax by (cnt desc, label asc) as MIN of (-cnt, label):
        # negating the count instead of the label keeps the trick
        # valid for any orderable label type, not just numerics
        winner = votes.groupBy("v").agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label")))
            .alias("__w")
        ).select(
            F.col("v").alias("vertex"),
            F.col("__w.label").alias("label"),
        )
        labels = (
            verts.join(winner, "vertex", "left")
            .select(
                "vertex",
                F.coalesce(F.col("label"), F.col("vertex")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
    return labels


def _wedge_centers(edges, src_col, dst_col, deg_cap):
    """Shared wedge-enumeration prelude for the link-prediction
    scores: undirected/deduped edge set, vertex degrees, and the
    center-keyed half-wedges (n→x with deg(n)) with hub centers above
    ``deg_cap`` excluded — join volume Σ_n deg(n)² bounded by
    deg_cap·|E|. Returns (und, deg, centers)."""
    fwd = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    )
    und = (
        fwd.unionByName(
            fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = und.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    centers = und.join(
        deg.filter(F.col("d") <= deg_cap), und["a"] == F.col("v")
    ).select(
        F.col("a").alias("n"), F.col("b").alias("x"),
        F.col("d").alias("dn"),
    )
    return und, deg, centers


def adamic_adar_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    deg_cap: int = 1000,
    k: int = 100,
) -> DataFrame:
    """Link prediction by the Adamic-Adar index (Adamic & Adar 2003):
    for non-adjacent pairs sharing neighbors, AA = Σ over common
    neighbors n of 1/ln(deg(n)) — the log-damped cousin of the
    resource-allocation score in common_neighbor_scores, standard in
    entity-resolution and recommend-missing-edge pipelines.

    Every common neighbor has degree ≥ 2 by construction (it touches
    both endpoints), so ln(deg) ≥ ln 2 > 0. The per-wedge term is
    1e12 DIV round(ln(deg)·1e6) — ln is the one float boundary,
    micro-quantized immediately (the repo's ln() policy), the
    division exact integer — summed to aa_micro (units of 1e-6).

    Same scale posture as common_neighbor_scores: wedges enumerate
    through capped centers (Σ deg² ≤ deg_cap·|E|), existing edges
    anti-joined out, top-k via TakeOrdered — never a global sort.

    Returns (x, y, common, aa_micro).
    """
    und, deg, centers = _wedge_centers(edges, src_col, dst_col, deg_cap)
    wedges = (
        centers.alias("l")
        .join(
            centers.select(
                F.col("n").alias("n2"), F.col("x").alias("y")
            ),
            (F.col("n") == F.col("n2")) & (F.col("x") < F.col("y")),
        )
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sum(
                F.expr(
                    "1000000000000 DIV CAST(round(ln(CAST(dn AS DOUBLE))"
                    " * 1000000) AS BIGINT)"
                )
            ).cast("long").alias("aa_micro"),
        )
    )
    scored = wedges.join(
        und,
        (wedges["x"] == und["a"]) & (wedges["y"] == und["b"]),
        "left_anti",
    ).select("x", "y", "common", "aa_micro")
    return scored.orderBy(
        F.col("aa_micro").desc(), "x", "y"
    ).limit(k)


def common_neighbor_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    deg_cap: int = 1000,
    k: int = 100,
) -> DataFrame:
    """Link prediction by neighborhood overlap: for non-adjacent
    vertex pairs sharing at least one neighbor, the common-neighbor
    count and Jaccard coefficient of their neighbor sets in exact
    ppm — the classic missing-link / related-entity score (Liben-
    Nowell & Kleinberg 2003).

    Shape: wedges enumerate through each CENTER vertex — (x←n→y)
    with x<y — so the join volume is Σ_n deg(n)², bounded by
    ``deg_cap``·|E| because centers above ``deg_cap`` are excluded
    first (a hub's wedge set is quadratic and its evidence is weak —
    everybody shares the hub; the cap is part of the contract and
    the oracle replays it). Degrees in the Jaccard denominator stay
    UNCAPPED. Existing edges are anti-joined out. Top-k by
    (jaccard desc, x, y) — a TakeOrdered, never a global sort.

    Alongside the count and Jaccard, each pair carries the
    RESOURCE-ALLOCATION index (Zhou, Lü & Zhang 2009) — Σ over
    common neighbors of 1/deg(n) in exact ppm (1e6 DIV deg per
    wedge, summed): the log-free sibling of Adamic-Adar that
    down-weights promiscuous shared neighbors without putting a
    float ln() in the contract.

    Returns (x, y, common, jaccard_ppm, ra_ppm).
    """
    und, deg, centers = _wedge_centers(edges, src_col, dst_col, deg_cap)
    wedges = (
        centers.alias("l")
        .join(
            centers.select(
                F.col("n").alias("n2"), F.col("x").alias("y")
            ),
            (F.col("n") == F.col("n2")) & (F.col("x") < F.col("y")),
        )
        .groupBy("x", "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common"),
            F.sum(F.expr("1000000 DIV dn")).cast("long").alias("ra_ppm"),
        )
    )
    scored = (
        wedges.join(und, (wedges["x"] == und["a"]) & (wedges["y"] == und["b"]), "left_anti")
        .join(deg.select(F.col("v").alias("__vx"), F.col("d").alias("dx")),
              F.col("x") == F.col("__vx"))
        .join(deg.select(F.col("v").alias("__vy"), F.col("d").alias("dy")),
              F.col("y") == F.col("__vy"))
        .select(
            "x", "y", "common",
            F.expr(
                "CAST((CAST(common AS DECIMAL(38,0)) * 1000000)"
                " DIV (dx + dy - common) AS BIGINT)"
            ).alias("jaccard_ppm"),
            "ra_ppm",
        )
    )
    return scored.orderBy(
        F.col("jaccard_ppm").desc(), "x", "y"
    ).limit(k)
