"""Streaming PSI monitor — live population-stability tracking of a
value column against a FROZEN base period.

The batch operator (``operators/drift.psi_bins``) derives bin edges
from the base side and compares two static periods; in production the
base is frozen once (its decile edges and shares become literals) and
the CURRENT period streams in.  This monitor keeps the per-(key, bin)
row count as complete-mode streaming aggregation state — ≤ n_bins
longs per key, bounded by the binning, not the stream — and each epoch
projects PSI terms against the frozen base shares: "has this feature
drifted off its training distribution yet" as a live curve.

Exactly batch-equivalent: bin assignment replays the batch operator's
strict ``Σ (v > edge)`` fold against the SAME 6-dp edge literals, so
the streaming counts after N batches are BIT-IDENTICAL to a batch
histogram over their union; the readout replays the batch PSI
arithmetic (9-dp shares, round-the-libm-call, quantized terms) —
parity-tested ``==``, no tolerance, and no ordered-arrival contract
(counts commute).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sink import ExactlyOnceParquetSink


def bin_assign(value: Column, edges: Column) -> Column:
    """The batch operator's bin fold: Σ (v > e) over an edge array."""
    return F.aggregate(
        edges,
        F.lit(0),
        lambda acc, c: acc + F.when(value.cast("double") > c, 1).otherwise(0),
    )


def build_psi_count_stream(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    edges_by_key: dict[str, Sequence[float]],
) -> DataFrame:
    """Streaming per-(key, bin) running counts of the CURRENT period —
    map-side binning against the frozen per-key edge literals (a
    key -> array<double> literal MAP, keys × (n_bins−1) metadata)
    feeding a streaming groupBy (``outputMode('complete')``: the state
    IS the histogram and is n_bins-bounded).  Keys absent from the
    frozen base drop (no edges, no PSI)."""
    entries: list[Column] = []
    for k, es in sorted(edges_by_key.items()):
        entries.append(F.lit(str(k)))
        entries.append(F.array(*[F.lit(float(e)) for e in es]))
    edge_map = F.create_map(*entries)
    key = F.col(key_col).cast("string")
    return (
        stream.select(
            key.alias("key"),
            bin_assign(F.col(value_col), F.try_element_at(edge_map, key)).alias("bin"),
        )
        .where(F.col("bin").isNotNull())
        .groupBy("key", "bin")
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )


def psi_readout(
    m: DataFrame,
    base_shares: dict[tuple[str, int], float],
    *,
    min_share: float = 0.0001,
    out_dp: int = 6,
) -> DataFrame:
    """Project the current-period histogram state against the frozen
    base shares ((key, bin) -> 9-dp share, from the batch operator's
    base pass, inlined as a literal MAP — keys × bins metadata):
    per-(key, bin) PSI terms, batch-identical arithmetic.  Bins the
    stream never hit emit nothing (a fully-dead bin's (p−clamp) term
    is the caller's completeness pass)."""
    w = Window.partitionBy("key")
    tc = F.sum("n_cur").over(w).cast("double")
    entries: list[Column] = []
    for (k, b), v in sorted(base_shares.items()):
        entries.append(F.lit(f"{k}|{b}"))
        entries.append(F.lit(round(float(v), 9)))
    base_map = F.create_map(*entries)
    p9 = F.coalesce(
        # try_: ANSI element_at THROWS on a missing map key
        F.try_element_at(
            base_map, F.concat(F.col("key"), F.lit("|"), F.col("bin").cast("string"))
        ),
        F.lit(float(min_share)),
    )
    q9 = F.round(F.greatest(F.col("n_cur").cast("double") / tc, F.lit(float(min_share))), 9)
    term9 = F.round((p9 - q9) * F.round(F.log(p9 / q9), 9), 9)
    return m.select(
        "key",
        "bin",
        "n_cur",
        F.round(p9, out_dp).alias("base_share"),
        F.round(q9, out_dp).alias("cur_share"),
        F.round(term9, out_dp).alias("psi_term"),
    )


class PSIReadoutSink(ExactlyOnceParquetSink):
    """foreachBatch sink: each epoch, project the complete-mode
    histogram state into PSI terms vs the frozen base and write
    idempotently under ``batch_id=<epoch>`` — drift over time."""

    def __init__(
        self,
        out_dir: str,
        base_shares: dict[tuple[str, int], float],
        *,
        min_share: float = 0.0001,
        lineage: bool = False,
    ):
        super().__init__(out_dir, lineage=lineage)
        self.base_shares = dict(base_shares)
        self.min_share = min_share

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        super().__call__(
            psi_readout(batch_df, self.base_shares, min_share=self.min_share),
            batch_id,
        )
