"""Streaming covariance monitor — the online twin of
``operators/pca.embedding_covariance``.

Embedding batches arrive on a stream; the monitor maintains ALL the
covariance sufficient statistics — the d(d+1)/2 pair-product sums,
the d linear sums and the row count — as ONE streaming ``groupBy(i,
j)`` long-sum aggregate (linear sums ride as marker rows ``j = -1``,
the count as ``(-1, -1)``), and after every micro-batch projects the
complete-mode state through the same rounded IEEE readout the batch
operator uses — the "is the embedding distribution drifting in
SHAPE, not just in mean" feed (the centroid drift monitor watches the
first moment; this watches the second).

Why the readout is exactly batch-equivalent (not approximately): the
pair products quantize map-side to the same integer grid
(``pca.pair_structs``), so the running sums are order-independent
long arithmetic — streaming incremental aggregation is just another
summation order.  State after N batches is BIT-IDENTICAL to the batch
moments over the union of those batches, and ``pca.cov_readout`` runs
the identical rounded projection — so the emitted cells match
``embedding_covariance`` exactly (parity-tested, ``==``, no
tolerance).

Scale shape: state is d(d+1)/2 + d + 1 rows of longs (2,145 at d=64)
regardless of stream length; each epoch's readout collects the d+1
marker rows driver-side (metadata — the batch operator's own collect)
and writes the d² cells idempotently per batch id."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.pca import _quantized, cov_readout, pair_structs
from .sink import ExactlyOnceParquetSink


def build_cov_moment_stream(
    stream: DataFrame,
    *,
    dim: int = 64,
    scale: int = 1_000_000,
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming covariance moments: per input vector, one map-side
    HOF emits the upper-triangular pair products plus the ``j = -1``
    linear-sum markers and the ``(-1, -1)`` count marker; a streaming
    ``groupBy(i, j)`` keeps the long sums as state (use
    ``outputMode('complete')``: the state IS the result and is
    d²-bounded)."""
    q = _quantized(stream, vec_col, scale)
    one = F.lit(1).cast("long")
    trip = F.concat(
        pair_structs(q, dim),
        F.transform(
            q,
            lambda qv, k: F.struct(
                k.cast("long").alias("i"),
                F.lit(-1).cast("long").alias("j"),
                qv.alias("p"),
            ),
        ),
        F.array(
            F.struct(
                F.lit(-1).cast("long").alias("i"),
                F.lit(-1).cast("long").alias("j"),
                one.alias("p"),
            )
        ),
    )
    return (
        stream.select(F.explode(trip).alias("pr"))
        .select("pr.i", "pr.j", "pr.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("_sij"))
    )


class CovarianceReadoutSink(ExactlyOnceParquetSink):
    """foreachBatch sink: each epoch, split the complete-mode moment
    state into markers (collected driver-side — d+1 metadata rows, the
    batch operator's own collect pattern) and pair sums, project
    through ``cov_readout`` and write the d² cells idempotently under
    ``batch_id=<epoch>`` — covariance history over time."""

    def __init__(
        self,
        out_dir: str,
        *,
        dim: int = 64,
        scale: int = 1_000_000,
        out_dp: int = 9,
        lineage: bool = False,
    ):
        super().__init__(out_dir, lineage=lineage)
        self.dim = dim
        self.scale = scale
        self.out_dp = out_dp

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        markers = batch_df.where(F.col("j") == -1).collect()
        n = 0
        s_by_k: dict[int, int] = {}
        for r in markers:
            if r["i"] == -1:
                n = int(r["_sij"])
            else:
                s_by_k[int(r["i"])] = int(r["_sij"])
        pairs = batch_df.where(F.col("j") >= 0)
        if n == 0:  # nothing ingested yet: no cells to report
            return
        readout = cov_readout(
            pairs, n, s_by_k, dim=self.dim, scale=self.scale, out_dp=self.out_dp
        )
        super().__call__(readout, batch_id)
