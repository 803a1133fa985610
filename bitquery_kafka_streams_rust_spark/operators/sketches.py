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


# --- HyperLogLog distinct-count -------------------------------------------
#
# Same portability contract as count-min: every hash/register/estimate
# step is integer-or-dyadic arithmetic both engines replay bit-exactly,
# so the ESTIMATE (not just the exact count) is cross-engine checkable.
#
#   h0     = ((key XOR 9*0x9E3779B9) mod 2^31) * 2654435761 mod 2^31
#            (stage salt 9 in the repo's XOR salt registry)
#   h1     = (h0 XOR (h0 >> 13)) * 2654435761 mod 2^31
#   h      = (h1 XOR (h1 >> 17)) * 2654435761 mod 2^31
#   bucket = h mod m                (m = 2^p buckets)
#   w      = h div m                ((31-p)-bit suffix)
#   rho    = trailing_zeros(w) + 1  (w = 0 -> 31-p+1)
#
# The two xorshift-multiply rounds on top of the repo's Knuth hash are
# REQUIRED here (unlike the sampling/split uses): one multiplicative
# round mod 2^31 is bijective on the low b bits as a function of the
# key's low b bits, so consecutive ids never collide in low-bit buckets
# and never share trailing-zero patterns — occupancy stops being
# Poisson and linear counting reads 50% high (measured, 150 consecutive
# ids -> est 225.7).  With the avalanche rounds the measured error on
# consecutive AND random id sets is within +-9.5% for p=8 (HLL stderr
# 1.04/sqrt(256) = 6.5%).
#
# rho uses TRAILING zeros — equally geometric on the uniform hash
# suffix, and exactly computable on both engines as
# round(log2(w & -w)) + 1: `w & -w` isolates the lowest set bit, a
# power of two whose log2 is exact in double, so the round() is safe
# (leading-zero rank would need a float floor(log2(w)) at non-powers,
# which is NOT safe at boundary ulps).
#
# Registers are max-merged per bucket — the classic mergeable sketch:
# map-side partials collapse to <= m rows per group before the shuffle,
# and the same max-merge makes it a streaming update-mode aggregate
# with O(m) state per group regardless of key cardinality.
#
# The estimate keeps the float surface to ONE libm call: the harmonic
# sum Σ 2^-reg is accumulated as the INTEGER Σ 2^(31-p+1-reg) (reg <=
# 31-p+1, so every term is a non-negative power of two), then scaled by
# the dyadic 2^-(31-p+1) — order-independent and exact; alpha_m and the
# raw-estimate division are fixed literals/IEEE ops; only the
# small-range linear-counting branch calls ln(), rounded identically on
# both engines.


def hll_bucket_rho(key_col: Column, p: int) -> Column:
    """(bucket, rho) struct for one key — pure portable integer/dyadic
    Catalyst arithmetic (see module comment)."""
    m = 1 << p
    w_bits = 31 - p
    base = key_col.cast("long").bitwiseXOR(F.lit(9 * _ROW_SALT))
    h = F.pmod(F.pmod(base, F.lit(_MOD)) * F.lit(_KNUTH), F.lit(_MOD))
    for shift in (13, 17):  # avalanche rounds — see module comment
        h = F.pmod(h.bitwiseXOR(F.shiftright(h, shift)) * F.lit(_KNUTH), F.lit(_MOD))
    w = (h / F.lit(m)).cast("long")  # h div m: h >= 0 so truncation == floor
    low = w.bitwiseAND(-w)
    rho = F.when(w == 0, F.lit(w_bits + 1)).otherwise(
        F.round(F.log2(low.cast("double")), 0).cast("int") + F.lit(1)
    )
    return F.struct(F.pmod(h, F.lit(m)).alias("bucket"), rho.alias("rho"))


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None, *, p: int = 8
) -> DataFrame:
    """Max-merged HLL registers per group: (*group_cols, bucket, reg),
    <= 2^p rows per group.  bucket/rho are map-side; the groupBy's
    partial max collapses to register cardinality before the shuffle."""
    group_cols = list(group_cols or [])
    br = hll_bucket_rho(_key_as_long(df, key_col), p)
    return (
        df.select(*group_cols, br.alias("br"))
        .groupBy(*group_cols, F.col("br.bucket").alias("bucket"))
        .agg(F.max("br.rho").alias("reg"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str] | None = None, *, p: int = 8
) -> DataFrame:
    """Distinct-count estimate per group from max-merged registers.

    Standard HLL with the small-range correction: raw estimate
    alpha_m * m^2 / Σ 2^-reg (absent buckets contribute 2^0 = 1);
    if raw <= 2.5m and empty buckets exist, linear counting
    m * ln(m / V).  Output: (*group_cols, est_distinct) rounded to 4.
    """
    group_cols = list(group_cols or [])
    m = 1 << p
    w_bits = 31 - p
    # alpha_m for m >= 128 (Flajolet et al. 2007), emitted as the same
    # decimal literal the oracle uses
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(
            # Column-valued bit offset: F.shiftleft only takes int offsets
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.lit(w_bits + 1) - F.col("reg")
            )
        ).alias("s_int"),
        F.count("*").alias("used"),
    )
    v = (F.lit(m) - F.col("used")).cast("double")  # empty buckets
    sum_inv = F.col("s_int").cast("double") / F.lit(float(1 << (w_bits + 1))) + v
    raw = F.lit(alpha * m * m) / sum_inv
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("used") < F.lit(m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("est_distinct"))


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None, *, p: int = 8
) -> DataFrame:
    """Approximate COUNT(DISTINCT key) per group in O(2^p) state —
    the bounded-memory analog of the reference's per-key seen-sets
    (src/processors/dex_processor.rs counter maps) at cardinalities
    where exact sets cannot fit.  Two narrow shuffles: register
    cardinality, then group cardinality."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, p=p), group_cols, p=p
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


# --- fixed-grid quantile sketch ---------------------------------------------
#
# Same portability + mergeability contract as count-min/HLL: the sketch
# is a bounded histogram on a FIXED value grid, so (a) map-side partial
# aggregation collapses each partition to <= n_buckets rows before the
# shuffle, (b) two sketches merge by adding counts (the property that
# makes it a streaming update-mode aggregate with O(n_buckets) state
# per group, and lets a 1000-executor fleet union per-shard sketches
# for free), and (c) every step is integer-or-IEEE-exact arithmetic
# both engines replay bit-identically: bucket = clamp(floor(v / width))
# (one IEEE double division, identical on both engines), estimate =
# bucket * width (exact for grid-scale ints).  No interpolation — the
# estimate is the LOWER BOUND of the bucket holding the target rank
# (rank = ceil(p * n), the inverted-CDF convention), so the error is
# bounded by one grid step and the result is bit-reproducible across
# engines, partitionings, and arrival orders — unlike exact
# F.percentile, which buffers every value per group and cannot
# partial-combine at 100 TB.


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    *,
    by: str | None = None,
    width: float = 0.25,
    n_buckets: int = 4096,
) -> DataFrame:
    """Bounded histogram sketch: (by?, bucket, cnt), <= n_buckets rows
    per group regardless of input size.  Values below 0 clamp to
    bucket 0, values beyond the grid to bucket n_buckets-1 (documented
    saturation — size the grid to the domain, like count-min width)."""
    bucket = F.least(
        F.lit(int(n_buckets) - 1),
        F.greatest(F.lit(0), F.floor(F.col(value_col) / F.lit(float(width)))),
    ).cast("long")
    keys = ([F.col(by)] if by else []) + [bucket.alias("bucket")]
    return df.groupBy(*keys).agg(F.count("*").alias("cnt"))


def quantile_estimate(
    sketch: DataFrame,
    ps: "Sequence[float]" = (0.5, 0.9, 0.99),
    *,
    by: str | None = None,
    width: float = 0.25,
) -> DataFrame:
    """Per-group quantile estimates from the sketch: for each p, the
    lower bound (bucket * width) of the first bucket whose cumulative
    count reaches rank ceil(p * n).  One window partitioned by the
    group key (parallelism = group cardinality — never a global
    window), then a conditional min-aggregate per p."""
    from pyspark.sql import Window

    part = Window.partitionBy(by) if by else Window.partitionBy()
    w_cum = part.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = sketch.select(
        *([by] if by else []),
        "bucket",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(part).alias("total"),
    )
    aggs = [F.sum("cnt").alias("n")]
    for p in ps:
        rank = F.ceil(F.lit(float(p)) * F.col("total"))
        aggs.append(
            F.round(
                F.min(F.when(F.col("cum") >= rank, F.col("bucket"))) * F.lit(float(width)),
                6,
            ).alias(f"p{int(round(float(p) * 100))}_est")
        )
    g = cum.groupBy(by) if by else cum.groupBy()
    return g.agg(*aggs)
