"""Distributed PCA over an embedding column: exact-integer covariance
plus a bit-replayable power iteration.

The scale shape mirrors the reference's split between distributed
accumulation and tiny readouts (``src/processors/dex_processor.rs``
running counters → threshold readout): the CORPUS-sized work is one
scan that quantizes each vector map-side and partial-combines
d(d+1)/2 pair-product sums — the shuffle carries only ``O(d² ×
partitions)`` metadata rows, never the vectors — and the eigenvector
extraction runs driver-side on the collected d×d matrix (2,080 rows
at d=64: the centroid/mix-weights metadata-collect doctrine, each
collect justified against the scalar-subquery-BNLJ alternative).

Cross-engine exactness (the pagerank playbook — per-step rounding
makes the float trajectory bit-replayable):

- components quantize to ``q = round(x * scale)`` longs map-side, so
  every pair-product sum is EXACT long arithmetic, order-independent;
- the covariance readout ``(n·Sij − Si·Sj) / n / n / scale²`` casts
  the same longs to double and replays one identical IEEE op sequence
  on both engines, rounded 9 dp;
- each power-iteration step quantizes the matrix-vector products to a
  1e-9 grid BEFORE summing (exact longs again), normalizes by
  ``sqrt`` of an exact integer sum of squares (IEEE sqrt is correctly
  rounded on every conforming libm — JVM, glibc, DuckDB agree), and
  rounds the unit vector to 9 dp — so iteration t's vector is a pure
  function of iteration t-1's ROUNDED vector, and a DuckDB oracle can
  replay the whole trajectory as unrolled CTE layers;
- the final projection is an exact long dot product against the
  1e-9-quantized eigenvector literals.

Overflow contract: with |x| ≤ 1 the pair sums need
``n · scale² < 2^62`` — n ≤ ~4.6M rows at scale 1e6; coarsen
``scale`` or pre-sample beyond that (a uniform ``hash_frac`` sample
estimates covariance to O(1/√m) — PCA at 100 TB is always run on a
sample; the projection pass itself is map-side over the full corpus).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _round_half_up


def _quantized(df: DataFrame, vec_col: str, scale: int):
    return F.transform(
        df[vec_col],
        lambda x: F.round(x.cast("double") * F.lit(float(scale)), 0).cast(
            "long"
        ),
    )


def embedding_covariance(
    df: DataFrame,
    *,
    dim: int = 64,
    scale: int = 1_000_000,
    vec_col: str = "embedding",
    out_dp: int = 9,
) -> DataFrame:
    """Upper-triangular covariance matrix of an ``array<float>`` column
    as ``(i, j, cov)`` rows, i ≤ j, exact to the quantization grid.

    Two scans, zero joins: a 64-row metadata pass collects the per-dim
    linear sums and the row count driver-side (inlined as literals —
    the centroid/heavy_hitters precedent: a 1-row scalar frame joined
    on a literal key constant-folds back into a BNLJ, and a 64-row dim
    table would add two broadcast joins to every cell), then the main
    scan's map-side HOF expands each vector's d(d+1)/2 quantized pair
    products (array structs, exploded) and the ``groupBy(i, j)``
    partial-combines them per partition — the only shuffled rows are
    the d²-bounded aggregates."""
    s1 = df.select(_quantized(df, vec_col, scale).alias("_q"))
    meta = (
        s1.select(F.posexplode(s1["_q"]).alias("k", "qv"))
        .groupBy("k")
        .agg(F.sum("qv").alias("s"), F.count("*").alias("c"))
        .collect()
    )
    n = int(meta[0]["c"])
    s_by_k = {int(r["k"]): int(r["s"]) for r in meta}
    sij = (
        s1.select(F.explode(pair_structs(s1["_q"], dim)).alias("pr"))
        .select("pr.i", "pr.j", "pr.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("_sij"))
    )
    return cov_readout(sij, n, s_by_k, dim=dim, scale=scale, out_dp=out_dp)


def pair_structs(qcol: F.Column, dim: int) -> F.Column:
    """Upper-triangular ``(i, j, qi*qj)`` struct array for one
    quantized vector — the map-side HOF both the batch operator and
    the streaming moment monitor expand."""
    return F.flatten(
        F.transform(
            qcol,
            lambda qi, i: F.transform(
                F.slice(qcol, i + F.lit(1), F.lit(dim) - i),
                lambda qj, jo: F.struct(
                    i.cast("long").alias("i"),
                    (i + jo).cast("long").alias("j"),
                    (qi * qj).alias("p"),
                ),
            ),
        )
    )


def cov_readout(
    sij: DataFrame,
    n: int,
    s_by_k: dict[int, int],
    *,
    dim: int = 64,
    scale: int = 1_000_000,
    out_dp: int = 9,
) -> DataFrame:
    """Project exact pair sums (columns i, j, _sij) plus the collected
    linear sums/count into the rounded covariance cells — the one
    identical IEEE op sequence both engines (and the streaming
    monitor's per-epoch readout) replay."""
    s_arr = F.array(
        *[F.lit(s_by_k.get(k, 0)).cast("long") for k in range(dim)]
    )
    denom2 = float(scale) * float(scale)
    si = F.element_at(s_arr, F.col("i").cast("int") + F.lit(1))
    sj = F.element_at(s_arr, F.col("j").cast("int") + F.lit(1))
    return sij.select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        F.round(
            (F.lit(n) * F.col("_sij") - si * sj).cast("double")
            / F.lit(float(n))
            / F.lit(float(n))
            / F.lit(denom2),
            out_dp,
        ).alias("cov"),
    )


def power_iterate(
    cov_rows: list[tuple[int, int, float]],
    dim: int = 64,
    iters: int = 6,
) -> list[float]:
    """Leading eigenvector of the (upper-triangular-rows) covariance
    matrix by ``iters`` power-iteration steps from the exactly-dyadic
    start ``v0 = 1/sqrt(64) = 0.125`` — DRIVER-side on the d×d
    metadata, replaying the exact op sequence the DuckDB oracle
    unrolls: products quantized to a 1e-9 grid before the
    (order-independent) integer sums, sqrt-of-exact-integer
    normalization, 9-dp unit vector per step.  Sign is pinned by the
    start vector, not normalized away — both engines iterate from the
    same v0 so they agree including sign.

    Convergence is spectrum-dependent: alignment with the true PC1
    improves per step by the eigengap ratio λ2/λ1, so ``iters``~6
    suffices on gapped spectra (pinned by the anisotropic-fixture
    test) while a near-isotropic corpus (the synthetic embeddings
    fixture measures λ2/λ1 = 0.987) needs hundreds — production use
    pairs a larger ``iters`` with a covariance sample.  The
    CROSS-ENGINE contract is the trajectory itself, not convergence:
    after any ``iters`` both engines hold the identical vector."""
    full: list[tuple[int, int, float]] = []
    for i, j, c in cov_rows:
        full.append((int(i), int(j), float(c)))
        if i != j:
            full.append((int(j), int(i), float(c)))
    v = [0.125] * dim
    for _ in range(iters):
        uq = [0] * dim
        for i, j, c in full:
            uq[i] += int(_round_half_up(c * v[j] * 1e9, 0))
        u = [x / 1e9 for x in uq]
        ss = sum(int(_round_half_up(x * 1e6, 0)) ** 2 for x in u)
        if ss == 0:  # degenerate zero matrix: stay at the start vector
            return v
        nrm = math.sqrt(float(ss)) / 1e6
        v = [_round_half_up(x / nrm, 9) for x in u]
    return v


def pca_project(
    df: DataFrame,
    component: list[float],
    *,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dp: int = 6,
) -> DataFrame:
    """Per-row score along ``component`` — a pure map-side exact long
    dot product: the vector quantizes on the same ``scale`` grid as
    the covariance pass, the component inlines as 1e-9-grid integer
    literals, and only the final readout divides (by ``scale · 1e9``)
    and rounds."""
    vq = [int(_round_half_up(float(c) * 1e9, 0)) for c in component]
    lits = F.array(*[F.lit(c).cast("long") for c in vq])
    q = _quantized(df, vec_col, scale)
    score_q = F.aggregate(
        F.zip_with(q, lits, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(
        df[id_col],
        F.round(
            score_q.cast("double") / F.lit(float(scale) * 1e9), out_dp
        ).alias("pc1"),
    )


def pca_top_component(
    df: DataFrame,
    *,
    dim: int = 64,
    scale: int = 1_000_000,
    iters: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dp: int = 6,
) -> DataFrame:
    """Covariance → driver-side power iteration → map-side projection:
    every row's coordinate along the corpus's leading principal
    direction (the whitening / semantic-spread front end for the
    SemDeDup and IVF families)."""
    cov = embedding_covariance(
        df, dim=dim, scale=scale, vec_col=vec_col
    ).collect()
    v = power_iterate([(r["i"], r["j"], r["cov"]) for r in cov], dim, iters)
    return pca_project(
        df, v, scale=scale, id_col=id_col, vec_col=vec_col, out_dp=out_dp
    )
