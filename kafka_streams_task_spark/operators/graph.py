"""PageRank — link-graph authority scoring for corpus curation.

Web-scale LLM pipelines weight crawl sources by link authority (the
Common Crawl → C4/RefinedWeb lineage keeps per-domain PageRank as a
quality prior). This is the engine's second iterative graph operator
(connected components, operators/cluster.py, is the first); the
reference repo has no analogue — north-star extension.

Formulation (Page et al. 1999, power iteration with damping d):

    r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/deg(u) + dangling/N )

where ``dangling`` is the rank mass sitting on nodes with no out-edges
— redistributed uniformly each round, so Σr = 1 is invariant (checked
by the tests to 1e-9 every iteration).

Scale shape: ranks live in a DataFrame keyed by node — never on the
driver. Each iteration is one join (ranks ⋈ edges on src — a shuffle on
the node key both sides can pre-partition on) + one partial+final
aggregate by dst, plus ONE scalar aggregate for the dangling mass (the
only thing that touches the driver, one double per round).
``localCheckpoint`` truncates the per-round lineage (the
connected-components / bpe_train pattern). Out-degrees are computed once
and ride WITH the rank table (rank and degree share the node key, so
the per-iteration join needs no third relation). A fixed iteration
count keeps the operator deterministic and SQL-restatable; production
callers pick n_iter ~ log(N)/log(1/d) (10-20 covers web graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """``(node, deg)`` over every node appearing in the graph (either
    endpoint); sink nodes get deg 0 (their mass becomes dangling)."""
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    degs = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    return nodes.join(degs, "node", "left").select(
        "node", F.coalesce(F.col("deg"), F.lit(0)).alias("deg")
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """``(node, rank)`` after ``n_iter`` damped power iterations from the
    uniform start. Duplicate (src, dst) rows count as parallel edges
    (each contributes mass), matching the adjacency-matrix definition.

    The rank table carries (node, deg, rank): deg is static, so each
    round is exactly rank⋈edges + groupBy(dst) + the degree re-join —
    two node-keyed shuffles — and one driver-side scalar (dangling mass).
    """
    # drop null endpoints up front: a null node key would never match the
    # rank join and its mass would silently leak (breaking Σr = 1); then
    # pin the edge list once — every iteration re-reads it, and a DERIVED
    # edge frame (a join, a dedup pass) would otherwise re-execute its
    # whole lineage n_iter times
    edges = edges.select(
        F.col(src).alias(src), F.col(dst).alias(dst)
    ).na.drop().localCheckpoint(eager=True)
    deg = out_degrees(edges, src, dst).localCheckpoint(eager=True)
    n = deg.count()  # node count: one bounded driver scalar, reused as a literal
    if n == 0:
        edges._jdf.queryExecution().analyzed().rdd().unpersist(False)
        return deg.select("node", F.lit(0.0).alias("rank"))
    # checkpointed like every later round: the per-round cleanup below
    # unpersists `prev` via its LogicalRDD handle, which only exists on a
    # checkpointed frame
    ranks = deg.select(
        "node", "deg", (F.lit(1.0) / F.lit(float(n))).alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(n_iter):
        # dangling mass: one scalar aggregate per round (the only driver traffic)
        dangling = (
            ranks.filter(F.col("deg") == 0).agg(F.coalesce(F.sum("rank"), F.lit(0.0))).first()[0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        contrib = (
            ranks.filter(F.col("deg") > 0)
            .join(edges.select(F.col(src).alias("node"), F.col(dst)), "node")
            .groupBy(F.col(dst).alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("in_mass"))
        )
        prev = ranks
        ranks = (
            deg.join(contrib, "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        prev._jdf.queryExecution().analyzed().rdd().unpersist(False)
    out = ranks.select("node", "rank")
    # edge/degree tables stay checkpointed only until ranks' final
    # checkpoint exists
    deg._jdf.queryExecution().analyzed().rdd().unpersist(False)
    edges._jdf.queryExecution().analyzed().rdd().unpersist(False)
    return out


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count over the UNDIRECTED simple graph induced by
    ``edges`` — ``(n_triangles)`` as a 1-row frame. Triangles measure
    clustering: in a near-dup pair graph they separate tight duplicate
    cliques from chains, and on link graphs they feed clustering-
    coefficient quality signals.

    Algorithm (node-iterator with DEGREE ORDERING, Schank & Wagner 2005):
    normalize to canonical undirected edges, then orient every edge from
    its lower-(degree, id) endpoint to the higher one. Each triangle is
    counted exactly once (at its smallest-ordered vertex), and — the
    scale property — every vertex's OUT-degree under this orientation is
    O(sqrt(m)), so the wedge join (out-edges ⋈ out-edges on the pivot)
    cannot blow up on hubs: a 10M-degree boilerplate hub contributes
    wedges bounded by its ORDERED out-degree, not its raw degree.
    Self-loops and duplicate/reversed edges are dropped in normalization.

    Plan: one distinct (canonical edges), one degree aggregate, one
    orientation join, the wedge self-join on the pivot vertex, and one
    semi-join against the oriented edge set — all on (long, long) keys.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .na.drop()
        .distinct()
    )
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionByName(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        canon.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    # orient low -> high by (degree, id): a total order, so each edge gets
    # exactly one direction
    oriented = with_deg.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
        )
        .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
        .alias("e")
    ).select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
    # wedges at pivot a: pairs of out-neighbors (b < c by id to dedup the
    # unordered pair); the wedge closes iff its two endpoints are joined
    # by an oriented edge (either direction was canonicalized already —
    # oriented edges are unique per undirected edge)
    o1 = oriented.select(F.col("a"), F.col("b").alias("x"))
    o2 = oriented.select(F.col("a"), F.col("b").alias("y"))
    wedges = o1.join(o2, "a").filter(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"], "left_semi")
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))
