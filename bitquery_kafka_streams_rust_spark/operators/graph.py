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
