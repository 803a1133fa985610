"""Deterministic sampling / splitting / shuffling for training-data
pipelines.

The reference engine stops at filtered+deduped event streams; a
training pipeline downstream of it always needs three more primitives
(dataset curation at 100 TB):

- ``hash_split``    — train/val/test assignment that is a pure function
                      of the row id (content-stable across reruns and
                      cluster sizes, no RNG state to coordinate);
- ``stratified_sample_frac`` / ``stratified_sample_exact``
                    — per-stratum downsampling (frac = zero-shuffle
                      map-side filter; exact-n = one shuffle with the
                      rank filter pushed below the sort by Spark's
                      WindowGroupLimit);
- ``shuffle_order`` — a deterministic pseudo-random total order for
                      example shuffling at export time (distributed
                      range sort, no driver involvement).

All three use the same portable mixing hash so any engine (the DuckDB
oracle included) replays the exact assignment:

    h(id) = ((id + seed) mod 2^31) * 2654435761 mod 2^31   (Knuth mult.)
    frac(id) = h(id) / 2^31  in [0, 1)

The pre-multiply ``mod 2^31`` mask keeps the product inside int64 for
ANY id (10^12-row id spaces included — an unmasked id ≥ ~3.47e9 would
overflow a long under ANSI mode); for ids < 2^31 the mask is the
identity, so the hash is bit-identical to the unmasked form the DuckDB
oracles inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_KNUTH = 2654435761
_MOD = 2**31
_STAGE_SALT = 0x9E3779B9  # golden-ratio constant


def _round_half_up(x: float, nd: int) -> float:
    """Driver-side rounding that matches F.round / DuckDB round
    (HALF_UP) instead of Python's built-in round (banker's HALF_EVEN).
    Decimal(repr(x)) mirrors Spark's BigDecimal.valueOf(double)
    (shortest-repr decimal), so a literal rounded here equals what the
    column form would have produced — the repo's round-on-both-sides
    float-parity rule applied to driver-side scalars."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def hash_frac(id_col: Column, seed: int = 0, stage: int = 0) -> Column:
    """Deterministic uniform fraction in [0, 1) from an integer id.

    ``stage`` decorrelates COMPOSED stages over the same ids: the hash
    is affine in id, so two stages differing only in the additive
    ``seed`` produce fractions that differ by a CONSTANT shift mod 1 —
    a keep-filter ``frac < 0.3`` followed by a split ``frac < 0.8``
    with another seed still sends every survivor to the same side.
    A per-stage XOR salt is nonlinear w.r.t. the multiply, giving
    genuinely independent-looking fractions (measured: conditional
    rate 0.798 vs the affine case's 1.0).  ``stage=0`` is bit-identical
    to the original hash for ids < 2^31 (the DuckDB oracles inline that
    form); every path masks to 31 bits BEFORE the multiply so the
    product can never overflow a long under ANSI mode (2^31 * K <
    2^63), regardless of id magnitude."""
    base = id_col.cast("long") + F.lit(seed)
    if stage:
        base = base.bitwiseXOR(F.lit((stage * _STAGE_SALT) % 2**63))
    h = (F.pmod(base, F.lit(_MOD)) * F.lit(_KNUTH)) % F.lit(_MOD)
    return h.cast("double") / F.lit(float(_MOD))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    out_col: str = "split",
    stage: int = 0,
) -> DataFrame:
    """Assign each row to a named split with probability ~weights.

    Pure map-side expression (no shuffle, no RNG): the split is a
    function of the id alone, so reruns, retries and different cluster
    sizes all produce the identical assignment — the property that
    makes a 100 TB split reproducible without materializing it.
    When composing with an upstream hash filter over the same ids,
    pass a distinct ``stage`` (see ``hash_frac``)."""
    frac = hash_frac(df[id_col], seed, stage)
    total = sum(weights.values())
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = frac < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


def stratified_sample_frac(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_frac: float = 0.0,
    stage: int = 0,
) -> DataFrame:
    """Per-stratum Bernoulli-style sample — zero shuffle.

    Each row keeps iff frac(id) < fraction[stratum]: a map-side filter
    the scan pushes down, the scale path for rebalancing a skewed
    corpus (e.g. downweight the 60%-hot crawl source).  Exact expected
    rates, deterministic membership."""
    frac = hash_frac(df[id_col], seed, stage)
    thresh: Column = F.lit(float(default_frac))
    for name, p in sorted(fractions.items()):
        thresh = F.when(df[strata_col] == name, F.lit(float(p))).otherwise(thresh)
    return df.where(frac < thresh)


def stratified_sample_exact(
    df: DataFrame,
    n_per_stratum: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    stage: int = 0,
) -> DataFrame:
    """Exactly-n rows per stratum, chosen by hash order.

    One shuffle on the stratum key; the ``row_number <= n`` filter is
    pushed below the sort by Spark's WindowGroupLimit rule, so each map
    task forwards at most n candidate rows per stratum — the shuffle
    carries O(n_strata * n), not the table.  Hash order makes the pick
    a uniform deterministic sample rather than "first n in storage
    order"."""
    w = Window.partitionBy(strata_col).orderBy(
        hash_frac(df[id_col], seed, stage).asc(), df[id_col].asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def shuffle_order(df: DataFrame, id_col: str = "doc_id", seed: int = 0, stage: int = 0) -> DataFrame:
    """Deterministic pseudo-random total order (training-export shuffle).

    A distributed range sort on the mixing hash: Spark samples range
    boundaries, each partition sorts locally — no global bottleneck,
    and the resulting example order is identical on every rerun and
    cluster size (unlike ``ORDER BY rand()``)."""
    return df.orderBy(hash_frac(df[id_col], seed, stage).asc(), df[id_col].asc())


def weighted_sample_exact(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    stage: int = 0,
) -> DataFrame:
    """Exact-size weighted sample without replacement (Efraimidis-
    Spirakis A-ES): each row gets priority ``u^(1/w)`` with
    ``u = hash_frac(id)``; the k largest priorities ARE a weighted
    sample.  Deterministic — the priority is a pure function of the
    id, so reruns/retries/cluster sizes agree, and the DuckDB oracle
    replays the identical draw by inlining the same hash + pow.

    Scale: ``orderBy(...).limit(k)`` plans as TakeOrderedAndProject —
    each partition keeps its local top-k (a bounded heap, no sort
    spill), only k rows per partition reach the driver-side merge.
    No full shuffle, no global sort.  Rows with non-positive weight
    are excluded (w<=0 has no sampling mass).

    The priority is rounded to 12 decimals on BOTH engines before the
    ORDER BY (the id tiebreak resolves rounded ties): JVM Math.pow is
    1-ulp-accurate while glibc pow is correctly rounded, and the 1/w
    exponent compresses priorities toward 1.0, so unrounded orderings
    near the rank-k cutoff could differ per engine at larger SF."""
    w = F.col(weight_col).cast("double")
    pri = F.round(F.pow(hash_frac(df[id_col], seed, stage), F.lit(1.0) / w), 12)
    return (
        df.where(w > 0)
        .withColumn("_ws_pri", pri)
        .orderBy(F.col("_ws_pri").desc(), df[id_col].asc())
        .limit(k)
        .drop("_ws_pri")
    )


def mix_weights(
    df: DataFrame,
    target_shares: dict[str, float] | None,
    total_budget: int,
    strata_col: str = "source",
    size_col: str = "n_chars",
) -> DataFrame:
    """Per-stratum keep fractions that steer the corpus toward a target
    domain mix under a total size budget.

    keep_frac(s) = min(1, budget * share(s) / size(s)) — the standard
    "domain mixing" computation (can't upsample past 1.0 without
    repeating data; undersized domains just keep everything).  One
    partial-aggregated groupBy over the corpus; output is n_strata rows
    of metadata.  ``target_shares=None`` means uniform over the strata
    observed in the data — derived from the same aggregate, no extra
    corpus pass."""
    agg = df.groupBy(strata_col).agg(
        F.count("*").alias("n_docs"), F.sum(size_col).alias("stratum_size")
    )
    if target_shares is None:
        # uniform share = 1/k where k = n_strata.  The aggregate is
        # n_strata rows of metadata, so collect it ONCE and finish
        # driver-side — a global window over it would execute a
        # single-partition WindowExec that plan audits can't see (it
        # runs during the downstream eager collect, not in the returned
        # plan), and a scalar-subquery formulation re-evaluates the
        # corpus aggregate twice.
        rows = agg.collect()
        k = max(len(rows), 1)

        def _kf(size) -> float:
            # empty/NULL-sized stratum keeps everything — the column
            # form's least(1.0, budget/0.0 = Inf) / least-skips-NULL
            # semantics, made explicit instead of raising.  HALF_UP
            # rounding (not Python's banker's) matches the F.round /
            # DuckDB-round convention of the non-uniform branch.
            if size is None or size <= 0:
                return 1.0
            return _round_half_up(
                min(1.0, float(total_budget) * (1.0 / k) / float(size)), 6
            )

        out = [
            (r[strata_col], r["n_docs"], r["stratum_size"], _kf(r["stratum_size"]))
            for r in rows
        ]
        from pyspark.sql.types import DoubleType, StructField, StructType

        schema = StructType(
            list(agg.schema.fields) + [StructField("keep_frac", DoubleType(), True)]
        )
        return df.sparkSession.createDataFrame(out, schema)
    total = sum(target_shares.values())
    share: Column = F.lit(0.0)
    for name, s in sorted(target_shares.items()):
        share = F.when(F.col(strata_col) == name, F.lit(s / total)).otherwise(share)
    return agg.select(
        strata_col,
        "n_docs",
        "stratum_size",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(total_budget)) * share / F.col("stratum_size").cast("double"),
            ),
            6,
        ).alias("keep_frac"),
    )


def rebalance_to_mix(
    df: DataFrame,
    target_shares: dict[str, float] | None,
    total_budget: int,
    strata_col: str = "source",
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 0,
    stage: int = 0,
) -> DataFrame:
    """Apply ``mix_weights`` as a deterministic per-stratum filter.

    The weights are n_strata rows of metadata — collecting them to
    drive the map-side hash filter is the aggregate-then-broadcast
    pattern (NOT a data collect); the corpus pass itself stays
    shuffle-free.  Compose with a downstream ``hash_split`` using
    DISTINCT ``stage`` values (see ``hash_frac``) or the split will be
    evaluated on a hash-truncated population."""
    w = {
        r[strata_col]: float(r["keep_frac"])
        for r in mix_weights(df, target_shares, total_budget, strata_col, size_col).collect()
    }
    return stratified_sample_frac(
        df, w, strata_col=strata_col, id_col=id_col, seed=seed, stage=stage
    )


def quality_buckets_hist(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 4,
    resolution: int = 4096,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Deterministic quantile binning with NO global sort — the scale
    path exact ntile can't take (a single-partition window over 10^12
    rows is ~TBs through one task).

    Two map-side passes: (1) a fixed-width histogram over
    ``[lo, hi)`` — one partial-aggregated groupBy yielding ≤
    ``resolution``+1 rows of METADATA, collected like IVF centroids /
    mix weights (aggregate-then-broadcast, never data); (2) cumulative
    ranks over the bins driver-side give integer cutoff bins
    (cut_b = first bin where cum ≥ ceil(b·N/n_buckets)), inlined as a
    CASE.  Bucket ids follow the ntile convention (1..n ascending
    score; NULLs → bucket 1, mirroring ASC NULLS FIRST).  Unlike
    ntile, ties at bin granularity never split: all rows in one bin get
    one bucket — content-deterministic at any cluster size, and the
    identical integer arithmetic replays in any engine (the DuckDB
    oracle inlines it).  Max bucket-boundary error vs exact ntile is
    one bin width ((hi-lo)/resolution) of score."""
    span = hi - lo
    raw_bin = F.least(
        F.floor((df[score_col] - F.lit(lo)) / F.lit(span) * resolution),
        F.lit(resolution - 1),
    ).cast("int")
    bin_col = F.when(df[score_col].isNull(), F.lit(-1)).otherwise(raw_bin)
    hist = sorted(
        (r["bin"], r["cnt"])
        for r in df.groupBy(bin_col.alias("bin")).agg(F.count("*").alias("cnt")).collect()
    )
    total = sum(c for _b, c in hist)
    cuts: list[int] = []
    if total:
        targets = [(b * total + n_buckets - 1) // n_buckets for b in range(1, n_buckets)]
        cum, t_idx = 0, 0
        for b, c in hist:
            cum += c
            while t_idx < len(targets) and cum >= targets[t_idx]:
                cuts.append(b)
                t_idx += 1
    if total == 0:  # empty input: no rows to bin (bucket column typed NULL)
        return df.withColumn("bucket", F.lit(None).cast("int"))
    if not cuts:  # n_buckets == 1: no cutoffs, everything is bucket 1
        return df.withColumn("bucket", F.lit(1))
    bucket: Column = F.lit(n_buckets)
    for i in range(len(cuts), 0, -1):
        bucket = F.when(bin_col <= cuts[i - 1], F.lit(i)).otherwise(bucket)
    return df.withColumn("bucket", bucket)


def quality_buckets_approx(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 4,
    accuracy: int = 10000,
) -> DataFrame:
    """Scale path for quantile binning: approx_percentile cutoffs
    (one mergeable-sketch aggregate pass) + a map-side bucket CASE —
    no global sort, unlike exact ntile.  Boundary docs may land one
    bucket off vs exact ntile (sketch error ~1/accuracy); bucket ids
    follow the ntile convention (1..n_buckets ascending score)."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.agg(
        F.percentile_approx(score_col, probs, accuracy).alias("cuts")
    ).collect()[0]["cuts"]
    if not cuts:  # no non-null scores — nothing to bin
        return df.withColumn("bucket", F.lit(None).cast("int"))
    bucket: Column = F.lit(n_buckets)
    for i in range(n_buckets - 1, 0, -1):
        bucket = F.when(df[score_col] <= float(cuts[i - 1]), F.lit(i)).otherwise(bucket)
    # NULL scores sort first under exact ntile (ASC NULLS FIRST) —
    # mirror that instead of letting the CASE fall through to the top
    bucket = F.when(df[score_col].isNull(), F.lit(1)).otherwise(bucket)
    return df.withColumn("bucket", bucket)


def temperature_resample(
    df: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.7,
    total_budget: int | None = None,
    stage: int = 7,
) -> DataFrame:
    """Temperature-based domain mixture (the multilingual-LM
    alpha-sampling rule): target share of group d is
    ``(n_d/N)^alpha`` renormalized — alpha=1 keeps the natural mix,
    alpha=0 is uniform, in between flattens head domains and boosts
    tails.  Unlike :func:`mix_weights` (downsample-only keep
    fractions), the resulting per-group rate may EXCEED 1: tail
    domains are upsampled by integer repetition plus a deterministic
    fractional draw — ``n_copies = floor(r) + [hash_frac(id, stage=7)
    < frac(r)]`` — so expected output size is ``total_budget``
    (default: corpus size) and every multiplicity is a pure function
    of the doc id (restart/cluster-size invariant; stage-7 XOR salt
    decorrelates from the stage-0..6 operators).

    Scale shape: ONE partial-aggregated groupBy collects n_strata rows
    of metadata; rates are inlined as literals (a scalar-subquery /
    1-row-join formulation constant-folds into a BNLJ the plan audit
    bans — same reasoning as ``mix_weights``); the per-doc multiplicity
    is a map-side expression.  Callers materialize the mix with
    ``explode(sequence(1, n_copies))`` on n_copies > 0.

    Rates are rounded to 9 decimals on BOTH engines before the
    fractional compare so the hash draw is boundary-stable across
    libm implementations."""
    rows = df.groupBy(group_col).agg(F.count("*").alias("n")).collect()
    n_by_g = {r[group_col]: r["n"] for r in rows}
    total = sum(n_by_g.values())
    budget = total if total_budget is None else total_budget
    if not n_by_g:
        return df.select(
            df[id_col], df[group_col],
            F.lit(0.0).alias("rate"), F.lit(0).alias("n_copies"),
        )
    w = {g: (n / total) ** alpha for g, n in n_by_g.items()}
    wsum = sum(w.values())
    # HALF_UP (the F.round/DuckDB convention), not Python's banker's
    # round — the oracle rounds these same rates SQL-side
    rate = {
        g: _round_half_up(budget * (w[g] / wsum) / n_by_g[g], 9)
        for g in sorted(n_by_g)
    }
    rate_col: Column = F.lit(0.0)
    base_col: Column = F.lit(0)
    frac_col: Column = F.lit(0.0)
    for g in sorted(n_by_g):
        r = rate[g]
        rate_col = F.when(F.col(group_col) == g, F.lit(r)).otherwise(rate_col)
        base_col = F.when(F.col(group_col) == g, F.lit(int(r // 1))).otherwise(base_col)
        frac_col = F.when(
            F.col(group_col) == g, F.lit(_round_half_up(r - int(r // 1), 9))
        ).otherwise(frac_col)
    draw = hash_frac(df[id_col], stage=stage)
    return df.select(
        df[id_col],
        df[group_col],
        rate_col.alias("rate"),
        (base_col + (draw < frac_col).cast("int")).alias("n_copies"),
    )


def importance_resample(
    docs: DataFrame,
    target_source: str,
    *,
    dim: int = 64,
    keep_frac: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Data-selection-by-importance-resampling (the DSIR shape, Xie et
    al. 2023): score every document by how much its hashed-unigram
    feature distribution looks like a TARGET slice of the corpus vs
    the raw pool, then keep the top ``keep_frac`` by score.

    Two passes, both scale-flat:

    1. **Feature distributions** — explode hashed word buckets (the
       classifier's ``_cls_bucket`` polynomial hash, ``dim`` buckets)
       → one partial-combined groupBy with ``dim`` output rows.  The
       bucket table is METADATA (64 rows here, ≤4096 in any sane
       config), so it is collected driver-side and the per-bucket
       Laplace-smoothed log-likelihood ratios are inlined as a literal
       array — the alternative (joining a 64-row frame on a computed
       key, or a scalar subquery) either broadcasts a dim-row table
       per task or constant-folds into the BNLJ the plan audit bans.
    2. **Scoring + selection** — per-doc mean log-ratio of its word
       buckets, computed entirely map-side from the literal array
       (text never shuffles); the top-n cut is ``orderBy().limit()``
       → a TakeOrdered heap, never a global window.

    Float parity: log-ratios are ``_round_half_up(..., 9)`` driver-side
    (Python and DuckDB both evaluate glibc ``ln`` on bit-identical
    IEEE quotients of exact integer counts); the per-doc fold runs in
    document word order on both engines (``F.aggregate`` here, an
    explicit ``list_reduce`` left fold in the oracle); the single
    final rounding is 6 dp on the mean."""
    import math

    from bitquery_kafka_streams_rust_spark.functions.text import (
        _cls_bucket,
        whitespace_words,
    )

    words = whitespace_words(docs[text_col])
    occ = docs.select(
        (F.col(source_col) == target_source).cast("long").alias("is_tgt"),
        F.explode(words).alias("w"),
    ).select("is_tgt", _cls_bucket(F.col("w"), dim).alias("b"))
    # dim-row metadata aggregate (see docstring for the collect
    # justification vs the scalar-subquery-BNLJ alternative)
    rows = (
        occ.groupBy("b")
        .agg(F.count("*").alias("n_raw"), F.sum("is_tgt").alias("n_tgt"))
        .collect()
    )
    n_raw = {int(r["b"]): int(r["n_raw"]) for r in rows}
    n_tgt = {int(r["b"]): int(r["n_tgt"]) for r in rows}
    tot_raw = sum(n_raw.values())
    tot_tgt = sum(n_tgt.values())
    lr = [
        _round_half_up(
            math.log((n_tgt.get(b, 0) + 1.0) / (tot_tgt + dim))
            - math.log((n_raw.get(b, 0) + 1.0) / (tot_raw + dim)),
            9,
        )
        for b in range(dim)
    ]
    lr_lit = F.array(*[F.lit(v) for v in lr])
    wlr = F.transform(words, lambda w: F.element_at(lr_lit, (_cls_bucket(w, dim) + 1).cast("int")))
    score = F.round(
        F.aggregate(wlr, F.lit(0.0), lambda acc, x: acc + x)
        / F.greatest(F.size(words), F.lit(1)).cast("double"),
        6,
    )
    n_docs = docs.count()  # scalar metadata, same justification
    n_keep = int(math.ceil(keep_frac * n_docs))
    return (
        docs.select(
            docs[id_col],
            docs[source_col],
            score.alias("importance"),
        )
        .orderBy(F.col("importance").desc(), F.col(id_col).asc())
        .limit(n_keep)
    )
