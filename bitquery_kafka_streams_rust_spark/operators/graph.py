"""Graph analytics over the near-duplicate graph.

``connected_components`` (operators/dedup.py) resolves WHICH docs form
a duplicate cluster; :func:`pagerank` ranks HOW CENTRAL each doc is in
that graph — the canonical-document selection signal a curation
pipeline uses when "keep min doc_id" is too crude (keep the hub of a
near-dup family, drop its satellites), and the standard importance
measure for any doc-graph (citation/link graphs included).

Exact cross-engine replay of an ITERATIVE float algorithm: power
iteration is a fold of float sums whose summation order Spark does not
guarantee — so every iteration's rank is rounded to 9 decimals on BOTH
engines.  Per-op drift (~1e-16) is far below the 0.5e-9 rounding
radius, so the rounded trajectory is canonical: the DuckDB oracle
unrolls the same fixed iteration count and lands on bit-identical
ranks.  (Same trick as centroid drift's integer grid, in decimal
space.)

Scale shape: one edge-list join + partial-combined sum per iteration
(the textbook Pregel-free formulation); ranks are materialized
executor-local each round so the plan stays O(1)-deep instead of
O(iterations) (same discipline as connected_components' pointer
jumping).  Degrees are precomputed once; the undirected near-dup graph
has no dangling nodes by construction (every node arrived via an
edge), so no dangling-mass redistribution term is needed — documented
contract, not an approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _materialize


def pagerank(
    pairs: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    n_iter: int = 5,
    damping: float = 0.85,
    reliable: bool = False,
) -> DataFrame:
    """Undirected PageRank over a pair list: each (a, b) row
    contributes both directions.  Returns (id, pr) for every node in
    the graph, ``pr`` rounded to 6 decimals, ordered by id.  Fixed
    ``n_iter`` power iterations from the uniform start, rank rounded
    to 9 decimals per iteration (see module docstring)."""
    edges = (
        pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("t"))
        .union(pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("t")))
        .distinct()
    )
    edges = _materialize(edges, reliable)
    deg = edges.groupBy("s").agg(F.count("*").alias("deg"))
    ed = _materialize(edges.join(deg, "s"), reliable)
    nodes = deg.select(F.col("s").alias("id"))
    n = nodes.count()  # metadata scalar: inlined as a literal below
    if n == 0:
        return pairs.sparkSession.createDataFrame([], "id long, pr double")
    base = (1.0 - damping) / n
    # F.round (HALF_UP) rather than Python round (banker's): the SQL
    # oracle's round() must see the identical starting value
    pr = nodes.withColumn("pr", F.round(F.lit(1.0 / n), 9))
    for it in range(n_iter):
        contrib = ed.join(pr.withColumnRenamed("id", "s"), "s").select(
            F.col("t").alias("id"), (F.col("pr") / F.col("deg")).alias("c")
        )
        new_pr = _materialize(
            contrib.groupBy("id").agg(
                F.round(F.lit(base) + F.lit(damping) * F.sum("c"), 9).alias("pr")
            ),
            reliable,
        )
        # previous iteration's DISK_ONLY blocks are dead once new_pr is
        # materialized — release them (same leak-per-iteration fix as
        # connected_components; localCheckpoint blocks must stay)
        if reliable and it > 0:
            pr.unpersist()
        pr = new_pr
    return pr.select("id", F.round("pr", 6).alias("pr")).orderBy("id")


def triangle_stats(
    pairs: DataFrame,
    *,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    reliable: bool = False,
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    undirected pair list: (id, deg, triangles, clustering), ordered by
    id.  PageRank ranks a near-dup family's hub; the clustering
    coefficient tells whether the family is a clique (every variant
    near-duplicates every other — one template, safe to keep one doc)
    or a star/chain (transitive SIMILARITY without transitive
    duplication — collapsing to one winner loses content).  The same
    statistic profiles any doc/link graph.

    Scale shape — the degree-orientation algorithm, NOT the naive
    wedge join: each undirected edge is oriented from its lower
    (deg, id) endpoint, which makes the graph acyclic with max
    out-degree O(sqrt(m)) regardless of skew — the hub of a
    1e7-satellite star gets out-degree ~0 instead of fanning 1e14
    wedges (the naive join's failure mode at 100 TB).  Every triangle
    then has exactly ONE vertex with oriented edges to the other two,
    so the wedge self-join counts each triangle once, and the closure
    probe is an equi-join against the canonical (a < b) edge list.
    Three narrow-key shuffles total; the per-node rollup explodes 3
    ids per triangle and partial-combines.

    ``clustering`` = round(2 * triangles / (deg * (deg - 1)), 9)
    (0.0 when deg < 2) — integer inputs, so the 9-dp rounding replays
    identically on any engine.
    """
    p = (
        pairs.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    p = _materialize(p, reliable)
    und = p.union(p.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy("a").agg(F.count("*").alias("deg"))
    # orient each edge from its lower (deg, id) endpoint
    o = (
        und.join(deg.select(F.col("a").alias("a"), F.col("deg").alias("dega")), "a")
        .join(
            deg.select(F.col("a").alias("b"), F.col("deg").alias("degb")),
            "b",
        )
        .where(
            (F.col("dega") < F.col("degb"))
            | ((F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b")))
        )
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
    )
    o = _materialize(o, reliable)
    # wedges at the oriented source; (x < y) by id so the closure probe
    # hits the canonical edge form directly
    w = (
        o.alias("o1")
        .join(o.alias("o2"), F.col("o1.u") == F.col("o2.u"))
        .where(F.col("o1.v") < F.col("o2.v"))
        .select(
            F.col("o1.u").alias("u"),
            F.col("o1.v").alias("x"),
            F.col("o2.v").alias("y"),
        )
    )
    tris = w.join(p, (w["x"] == p["a"]) & (w["y"] == p["b"])).select("u", "x", "y")
    per_node = (
        tris.select(F.explode(F.array("u", "x", "y")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.withColumnRenamed("a", "id")
        .join(per_node, "id", "left")
        .select(
            "id",
            "deg",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.coalesce(F.col("triangles"), F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1)),
                    9,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
        .orderBy("id")
    )
