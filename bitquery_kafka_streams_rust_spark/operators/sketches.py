"""Fixed-size mergeable sketches — count-min heavy hitters.

The reference keeps exact per-key running counters in consumer memory
(src/processors/dex_processor.rs counter maps) — fine for one process,
impossible at 10^12 keys.  The distributed analog is a *sketch*: a
fixed-size, mergeable summary that map-side partial aggregation
combines for free.  This module implements a count-min sketch whose
hash arithmetic is pure integer Catalyst (portable — the DuckDB oracle
inlines the identical expressions), so estimates are bit-reproducible
across engines and cluster sizes.

Layout: ``depth`` independent hash rows x ``width`` buckets.  Row ``j``
hashes key ``k`` with the repo's portable Knuth multiplicative hash
after a per-row XOR salt (additive seeds would only SHIFT the affine
hash — the rows would collide identically; see
``operators/sampling.hash_frac``):

    h_j(k) = (((k XOR j*0x9E3779B9) mod 2^31) * 2654435761 mod 2^31) mod width

``cms_sketch`` is one partial-aggregated scan producing depth*width
rows (8192 for the default 4x2048 — broadcastable metadata regardless
of input size).  ``cms_estimate`` joins candidate keys against the
broadcast sketch and takes the per-key MIN over rows — the classic
count-min upper-bound estimate (never under, over only on collisions).

At 100 TB: the scan is map-side combined (depth rows per input row
pre-combine, depth*width post), the sketch is O(1) metadata, and the
estimate join broadcasts the sketch — candidate keys never shuffle.
Candidate generation at real scale comes from a sample or a prior
sketch pass; the contract query uses the distinct key set since the
fixture key space is small.

Streaming: ``cms_sketch`` composes UNCHANGED into Structured Streaming
(complete/update mode) — the streaming-aggregation state is exactly
the depth*width counters, bounded regardless of the key cardinality
flowing through (the property that lets a 10^12-key stream keep a
skew/traffic profile in kilobytes of state; pinned by
tests/test_streaming.py::test_streaming_cms_sketch_matches_batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_KNUTH = 2654435761
_MOD = 2**31
_ROW_SALT = 0x9E3779B9


_INT_TYPES = {"tinyint", "smallint", "int", "bigint", "long"}


def _key_as_long(df: DataFrame, key_col: str) -> Column:
    """Integer view of the key for the sketch hash.  Integer keys pass
    through unchanged (the DuckDB oracle inlines the same arithmetic on
    them — portability holds).  Non-integer keys (e.g. the string
    ``source`` column the skew path profiles) go through ``xxhash64``:
    still deterministic across runs/cluster sizes, just not
    oracle-portable — heavy-hitter detection doesn't need it to be."""
    dt = dict(df.dtypes)[key_col]
    col = F.col(key_col)
    return col.cast("long") if dt in _INT_TYPES else F.xxhash64(col)


def cms_bucket(key_col: Column, row: int, width: int) -> Column:
    """Bucket of integer ``key_col`` in sketch row ``row`` (portable
    integer arithmetic — DuckDB oracles inline the same expression)."""
    base = key_col.cast("long").bitwiseXOR(F.lit(row * _ROW_SALT))
    h = F.pmod(F.pmod(base, F.lit(_MOD)) * F.lit(_KNUTH), F.lit(_MOD))
    return F.pmod(h, F.lit(width))


def cms_sketch(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Build the sketch: (j, bucket, cnt) with depth*width rows.

    One scan; the explode emits ``depth`` narrow rows per input row
    which the hash-aggregate partials collapse to depth*width before
    any shuffle.
    """
    k = _key_as_long(df, key_col)
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                cms_bucket(k, j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.j").alias("j"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Estimated count per key: min over sketch rows of the key's
    bucket counter.  ``sketch`` is broadcast (depth*width rows)."""
    k = _key_as_long(keys, key_col)
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_bucket(k, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.j").alias("j"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), on=["j", "bucket"], how="inner")
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_count"))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    *,
    mean_ratio: float = 1.2,
    depth: int = 4,
    width: int = 2048,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Keys whose count-min estimate is >= ``mean_ratio`` times the
    mean per-key count — i.e. the keys that would skew a shuffle on
    this column (the same signal operators/skew.py salts against).

    Guarantees of count-min carry over: no true heavy hitter is missed
    (estimates never undercount); collisions can only ADD false
    positives, deterministically reproducible from the fixed salts.

    ``candidates`` is the scale path's injection point: the default
    probes ``df.select(key).distinct()``, a full corpus-key distinct
    that defeats the sketch's purpose at 10^12 keys — at scale pass a
    bounded candidate frame instead (a uniform sample of keys, or the
    output of a prior coarser sketch pass); count-min's no-miss
    guarantee then holds relative to that candidate set.  Any frame
    with a ``key_col`` column works; it is distinct-ed here."""
    sketch = cms_sketch(df, key_col, depth=depth, width=width)
    # the (total, n_keys) pair is one metadata row — collect it and
    # inline the threshold as a literal (the repo's driver-side-scalar
    # convention, same as sampling.mix_weights): a lazy scalar join
    # would plan as the nested-loop shape the plan audit bans
    total, n_keys = (
        df.groupBy()
        .agg(F.count("*").alias("t"), F.countDistinct(key_col).alias("k"))
        .collect()[0]
    )
    thresh = mean_ratio * (float(total) / n_keys) if n_keys else 0.0
    keys = (candidates if candidates is not None else df).select(key_col).distinct()
    est = cms_estimate(keys, sketch, key_col, depth=depth, width=width)
    return est.where(F.col("est_count") >= F.lit(thresh))
