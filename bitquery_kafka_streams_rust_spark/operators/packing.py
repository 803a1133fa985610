"""Sequence packing & chunking — training-data pipeline transforms.

Two core LLM-pretraining ops over the tokenized-sequences table:

- ``chunk_sequences``: split each document into ≤ ``max_len`` windows
  with ``overlap`` (sliding context windows).  Pure Catalyst: the chunk
  index set is ``sequence()`` + ``explode`` and the slice is
  ``F.slice`` — fully SQL-expressible, oracle-checked.
- ``pack_sequences``: greedy first-fit packing of whole documents into
  fixed ``context_len`` bins (maximizing fill without splitting docs).
  Exact global packing is NP-hard and inherently sequential, so the
  scalable strategy is per-group greedy packing inside
  ``applyInPandas``: each (source) group is packed independently in a
  deterministic order (ts, doc_id) — at 10^12 rows groups are salted
  into (source, bucket) so bins never cross executors.  Verified
  against a pure-Python reference in tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_sequences(
    seq: DataFrame, max_len: int = 512, overlap: int = 0
) -> DataFrame:
    """1→N: each doc becomes ceil((n_tok - overlap) / stride) chunks of
    ≤ max_len tokens, stride = max_len - overlap.  Empty docs yield no
    chunks.  Chunk identity (doc_id, chunk_idx) is deterministic."""
    assert 0 <= overlap < max_len
    stride = max_len - overlap
    n_chunks = F.ceil((F.col("n_tok") - F.lit(overlap)) / F.lit(stride)).cast("int")
    out = seq.select(
        "doc_id",
        "source",
        "tokens",
        "n_tok",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - 1)
        ).alias("chunk_idx"),
    ).where(F.col("n_tok") > 0)
    start = F.col("chunk_idx") * stride + 1  # 1-based for F.slice
    chunk = F.slice("tokens", start.cast("int"), max_len)
    return out.select(
        "doc_id",
        "source",
        F.col("chunk_idx"),
        chunk.alias("chunk_tokens"),
        F.size(chunk).alias("chunk_len"),
    )


def pack_greedy(pdf: pd.DataFrame, context_len: int) -> pd.DataFrame:
    """Greedy first-fit over docs sorted by (ts, doc_id): walk bins in
    creation order, place the doc in the first with room, else open a
    new bin.  Deterministic; the pure-Python reference in the tests is
    this exact algorithm."""
    pdf = pdf.sort_values(["ts", "doc_id"], kind="mergesort")
    bins_fill: list[int] = []
    bins_docs: list[list[str]] = []
    for doc_id, n in zip(pdf["doc_id"], pdf["n_tok"]):
        n = int(n)
        if n == 0 or n > context_len:
            continue  # empty docs skipped; oversize docs go to chunking
        for i in range(len(bins_fill)):
            if bins_fill[i] + n <= context_len:
                bins_fill[i] += n
                bins_docs[i].append(doc_id)
                break
        else:
            bins_fill.append(n)
            bins_docs.append([doc_id])
    src = pdf["source"].iloc[0] if len(pdf) else None
    bucket = int(pdf["_bucket"].iloc[0]) if "_bucket" in pdf.columns and len(pdf) else 0
    return pd.DataFrame(
        {
            "source": [src] * len(bins_fill),
            "bucket": [bucket] * len(bins_fill),
            "bin_idx": range(len(bins_fill)),
            "doc_ids": bins_docs,
            "total_tok": bins_fill,
            "fill_ratio": [f / context_len for f in bins_fill],
        }
    )


PACK_SCHEMA = (
    "source string, bucket int, bin_idx long, doc_ids array<string>, "
    "total_tok long, fill_ratio double"
)


def pack_sequences(
    seq: DataFrame,
    context_len: int = 2048,
    salt_buckets: int | str | None = "auto",
    salt_expr=None,
) -> DataFrame:
    """Greedy packing per (source, salt-bucket).

    Packing quality is unaffected by salting since bins are group-local
    anyway, but group SIZE is the scale hazard: ``applyInPandas``
    materializes one whole group per task, so a 60%-hot source at 10^12
    rows would be one executor-killing pandas frame.  The DEFAULT is
    therefore bounded groups: ``salt_buckets="auto"`` uses the scan's
    partition count (driver-side file listing — no Spark job, unlike a
    ``count()``, and no eager work when the plan is merely built), which
    grows with input bytes via maxPartitionBytes, so a group holds
    about one scan-partition's docs per source at any scale.  Pass an
    int to pin the bucket count, None to force unsalted (only safe for
    bounded inputs), or ``salt_expr`` (a Column over doc_id →
    non-negative long) to make the bucket assignment portable to a SQL
    oracle."""
    df = seq.select("doc_id", "n_tok", "source", "ts")
    if salt_buckets == "auto":
        salt_buckets = min(max(df.rdd.getNumPartitions(), 1), 4096)
    keys = ["source"]
    if salt_buckets and salt_buckets > 1:
        bucket = salt_expr if salt_expr is not None else F.xxhash64("doc_id")
        df = df.withColumn(
            "_bucket", F.pmod(bucket, F.lit(salt_buckets)).cast("int")
        )
        keys = ["source", "_bucket"]
    return df.groupBy(*keys).applyInPandas(
        lambda pdf: pack_greedy(pdf, context_len), schema=PACK_SCHEMA
    )


def pack_boundaries(bins: DataFrame, seq: DataFrame) -> DataFrame:
    """Per-bin attention boundaries for packed training batches.

    A packed bin concatenates several documents; block-diagonal
    ("varlen") attention kernels need the cumulative sequence offsets
    (``cu_seqlens = [0, l0, l0+l1, …]``) to mask cross-document
    attention.  Input: ``pack_sequences`` output (bins with ordered
    ``doc_ids``) + the sequences table for lengths.  Output one row per
    bin: (source, bucket, bin_idx, doc_lens, cu_seqlens, n_docs,
    total_tok).

    Plan shape: explode bin membership (narrow: ids + position), ONE
    equi-join against the (doc_id, n_tok) projection — never the token
    arrays — and a groupBy re-assembling per-bin arrays in bin order.
    The prefix sum is a pure Catalyst ``aggregate`` over the ≤
    docs-per-bin lens array (bins are context_len-bounded, so the
    quadratic-free fold is O(docs/bin) per row)."""
    members = bins.select(
        "source", "bucket", "bin_idx", F.posexplode("doc_ids").alias("pos", "doc_id")
    )
    # dedup the length side: the sequences table may carry duplicate
    # doc rows (bit-identical by the fixture invariant; in general
    # n_tok must be functionally determined by doc_id) and a fan-out
    # here would inject phantom bin members
    lens_side = seq.select("doc_id", "n_tok").dropDuplicates(["doc_id"])
    with_len = members.join(lens_side, "doc_id")
    per_bin = with_len.groupBy("source", "bucket", "bin_idx").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "n_tok"))),
            lambda s: s["n_tok"].cast("long"),
        ).alias("doc_lens")
    )
    cu = F.aggregate(
        F.col("doc_lens"),
        F.array(F.lit(0).cast("long")),
        lambda acc, x: F.concat(acc, F.array(F.try_element_at(acc, F.lit(-1)) + x)),
    )
    return per_bin.select(
        "source",
        "bucket",
        "bin_idx",
        "doc_lens",
        cu.alias("cu_seqlens"),
        F.size("doc_lens").alias("n_docs"),
        F.try_element_at(cu, F.lit(-1)).alias("total_tok"),
    )


def length_bucket_batches(
    seq: DataFrame,
    batch_size: int = 32,
    bucket_width: int = 256,
    salt_buckets: int | None = None,
    salt_expr=None,
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    strata_col: str = "source",
) -> DataFrame:
    """Length-bucketed inference batching: deterministic batch
    assignment grouping similar-length sequences so per-batch padding
    (to the batch max) stays small — the standard serving/eval batching
    transform (dynamic batching approximates this online; offline the
    exact grouping is a one-window pass).

    Rows bucket by ``floor(len / bucket_width)`` per stratum; within a
    bucket, ``row_number`` over (len, id) // batch_size yields the
    batch index.  Like ``pack_sequences``, the per-key window is the
    scale hazard (one 10^12-row bucket = one task), so ``salt_buckets``
    splits each bucket into bounded sub-streams — batches never cross
    salt groups, so batch identity stays deterministic; padding quality
    is unaffected (lengths within a (bucket, salt) group still span at
    most ``bucket_width``).  Emits per-batch stats: (strata, bucket
    [, salt], batch_idx, n_seqs, max_len, sum_len, pad_frac) where
    pad_frac = wasted fraction of the padded token rectangle."""
    cols = [
        F.col(strata_col).alias("strata"),
        F.col(id_col).alias("id"),
        F.col(len_col).cast("long").alias("len"),
        F.floor(F.col(len_col).cast("long") / bucket_width).cast("int").alias(
            "len_bucket"
        ),
    ]
    keys = ["strata", "len_bucket"]
    if salt_buckets and salt_buckets > 1:
        # salt evaluated against the INPUT columns (salt_expr callers
        # reference e.g. doc_id, which the projection renames)
        salt = salt_expr if salt_expr is not None else F.xxhash64(F.col(id_col))
        cols.append(F.pmod(salt, F.lit(salt_buckets)).cast("int").alias("salt"))
        keys.append("salt")
    df = seq.select(*cols)
    w = Window.partitionBy(*keys).orderBy("len", "id")
    df = df.withColumn(
        "batch_idx", F.floor((F.row_number().over(w) - 1) / batch_size).cast("long")
    )
    padded = F.col("n_seqs") * F.col("max_len")
    return (
        df.groupBy(*keys, "batch_idx")
        .agg(
            F.count("*").alias("n_seqs"),
            F.max("len").alias("max_len"),
            F.sum("len").alias("sum_len"),
        )
        .select(
            *keys,
            "batch_idx",
            "n_seqs",
            "max_len",
            "sum_len",
            F.round(
                F.when(padded > 0, 1.0 - F.col("sum_len") / padded).otherwise(0.0), 6
            ).alias("pad_frac"),
        )
    )


def fim_bounds(
    seq: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    id_int: F.Column | None = None,
    min_len: int = 4,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic FIM span geometry per doc (the shared half of
    :func:`fim_split` and the export job's fim mode): one row per doc
    with ``n_tok``, ``mid_len`` in [1, n_tok-2] and ``mid_start`` in
    [2, n_tok-mid_len] — all three parts guaranteed non-empty; a pure
    map-side function of the doc id (portable Knuth hash, XOR stage
    salts 5/6).  Docs shorter than ``min_len`` yield no row;
    ``keep_cols`` pass through untouched."""
    from .sampling import hash_frac

    if id_int is None:
        id_int = F.substring(F.col(id_col), 4, 18).cast("long")
    n = F.size(tokens_col).cast("long")
    docs = (
        seq.dropDuplicates([id_col])
        .where(F.size(tokens_col) >= min_len)
        .select(
            F.col(id_col),
            F.col(tokens_col),
            n.alias("n_tok"),
            id_int.alias("_c"),
            *keep_cols,
        )
    )
    u1 = hash_frac(F.col("_c"), stage=5)
    u2 = hash_frac(F.col("_c"), stage=6)
    return docs.select(
        id_col,
        tokens_col,
        "n_tok",
        (F.lit(1) + F.floor(u1 * (F.col("n_tok") - 2))).alias("mid_len"),
        u2.alias("_u2"),
        *keep_cols,
    ).select(
        id_col,
        tokens_col,
        "n_tok",
        "mid_len",
        (
            F.lit(2)
            + F.floor(F.col("_u2") * (F.col("n_tok") - F.col("mid_len") - 1))
        ).alias("mid_start"),
        *keep_cols,
    )


def fim_split(
    seq: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    id_int: F.Column | None = None,
    min_len: int = 4,
) -> DataFrame:
    """Fill-in-the-middle / span-corruption example construction
    (Bavarian et al. 2022 FIM; the single-span T5 corruption case):
    deterministically select one middle span per document and emit the
    (prefix, middle, suffix) decomposition — the PSM transform an infill
    pretraining mix applies to a fraction of the corpus.

    Span selection is a pure function of the doc id via the repo's
    portable Knuth hash (sampling.hash_frac, stages 5/6 — XOR stage
    salts, so composition with the stage-0..4 sampling/split operators
    stays decorrelated): ``mid_len`` in [1, n_tok-2] then ``mid_start``
    in [2, n_tok-mid_len], guaranteeing all three parts are non-empty.
    Reruns, retries and any cluster size produce the identical
    decomposition — no RNG state, the property that lets a 100 TB
    export be resumed mid-way.

    Zero shuffle: everything is a map-side slice over the scan (the
    orderBy is presentation-only for the oracle check); each part is
    certified by the portable order-sensitive positional checksum
    rather than shipping token arrays.  Docs shorter than ``min_len``
    cannot form three non-empty parts and are excluded (callers pass
    them through unfragmented).  ``id_int``: integer id expression;
    defaults to digits of ``doc_id`` after a 3-char prefix (the
    fixture's 'docN' form)."""
    from ..functions.tokens import token_checksum

    sel = fim_bounds(
        seq, id_col=id_col, tokens_col=tokens_col, id_int=id_int, min_len=min_len
    )
    pre = F.slice(F.col(tokens_col), F.lit(1), F.col("mid_start") - 1)
    mid = F.slice(F.col(tokens_col), F.col("mid_start"), F.col("mid_len"))
    suf = F.slice(
        F.col(tokens_col),
        F.col("mid_start") + F.col("mid_len"),
        F.col("n_tok") - F.col("mid_start") - F.col("mid_len") + 1,
    )
    return sel.select(
        id_col,
        "n_tok",
        "mid_start",
        "mid_len",
        token_checksum(pre).alias("prefix_cksum"),
        token_checksum(mid).alias("middle_cksum"),
        token_checksum(suf).alias("suffix_cksum"),
    ).orderBy(id_col)


_SC_SALT = 12 * 0x9E3779B9  # XOR stage salt 12 (registry in CLAUDE.md)


def span_corrupt(
    seq: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    id_int: F.Column | None = None,
    min_len: int = 8,
    sentinel_base: int = 60000,
    keep_cols: tuple[str, ...] = (),
    emit: str = "checksums",
) -> DataFrame:
    """T5/UL2 multi-span corruption example construction (Raffel et
    al. 2020 §3.1.4): per doc, mask ~15% of tokens as ``max(1,
    noise//3)`` non-overlapping spans, emit the denoising pair —
    ``inputs`` = the doc with each span replaced by one sentinel id,
    ``targets`` = each sentinel followed by its span, plus a terminal
    sentinel.  Generalizes :func:`fim_split` (the k=1 PSM case) to the
    multi-span objective.

    Deterministic geometry, zero shuffle, zero RNG state: the noise
    budget is the pure integer form ``nb = max(1, n*3//20)``, span
    lengths split it as evenly as integers allow, and span s lives in
    the s-th of k equal segments — jittered inside its segment by an
    avalanched hash of ``(id, s)`` (stage salt 12 with the
    jl_sign/HLL xorshift-multiply rounds: a plain affine per-span hash
    would give every span of a doc the SAME lattice jitter — the
    affine-composition trap).  Segment residency guarantees
    non-overlap by construction with no sequential scan, so the whole
    transform is one map-side HOF pass — reruns, retries and any
    cluster size produce identical examples, the property that lets a
    100 TB denoising export resume mid-way.

    Sentinels are ``sentinel_base + s`` (outside the fixture's 50,257
    vocab and positive, keeping the portable positional checksum's
    mod-2^31 arithmetic identical on both engines).  Outputs carry
    lengths plus order-sensitive checksums of both constructed
    sequences rather than shipping the arrays.  Docs shorter than
    ``min_len`` (= 8: the smallest n where segment residency is
    provable for the 15%/3 geometry) are excluded.

    ``emit='checksums'`` (default, the oracle shape) certifies the
    constructed sequences; ``emit='arrays'`` returns the actual
    ``inputs``/``targets`` arrays for the export job's span mode.
    ``keep_cols`` pass through untouched."""
    from .sampling import _KNUTH, _MOD
    from ..functions.tokens import token_checksum

    if id_int is None:
        id_int = F.substring(F.col(id_col), 4, 18).cast("long")

    def idiv(a, b):
        return ((a - F.pmod(a, b)) / b).cast("long")

    n_ = F.size(tokens_col).cast("long")
    docs = (
        seq.dropDuplicates([id_col])
        .where(F.size(tokens_col) >= min_len)
        .select(
            F.col(id_col),
            F.transform(F.col(tokens_col), lambda t: t.cast("long")).alias("_t"),
            n_.alias("_n"),
            id_int.alias("_c"),
            *keep_cols,
        )
        .withColumn("_nb", F.greatest(F.lit(1).cast("long"), idiv(F.col("_n") * 3, F.lit(20))))
        .withColumn("_k", F.greatest(F.lit(1).cast("long"), idiv(F.col("_nb"), F.lit(3))))
        .withColumn("_base", idiv(F.col("_nb"), F.col("_k")))
        .withColumn("_rem", F.pmod(F.col("_nb"), F.col("_k")))
    )
    n, c, k = F.col("_n"), F.col("_c"), F.col("_k")

    def ln(s):
        return F.col("_base") + F.when(s < F.col("_rem"), F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )

    def frac(s):
        h = F.pmod((c * F.lit(131) + s).bitwiseXOR(F.lit(_SC_SALT)), F.lit(_MOD))
        h = F.pmod(h * F.lit(_KNUTH), F.lit(_MOD))
        for sh in (13, 17):  # avalanche rounds (jl_sign pipeline)
            h = F.pmod(h.bitwiseXOR(F.shiftright(h, sh)) * F.lit(_KNUTH), F.lit(_MOD))
        return h.cast("double") / F.lit(float(_MOD))

    def seg_start(s):
        return idiv(s * n, k)

    def start(s):
        free = idiv((s + 1) * n, k) - seg_start(s) - ln(s)
        return seg_start(s) + F.floor(frac(s) * (free + 1).cast("double")).cast("long") + 1

    def sent(s):
        return F.lit(sentinel_base).cast("long") + s

    sidx = F.sequence(F.lit(0).cast("long"), k - 1)

    def gap(s):
        prev_end = F.when(s == 0, F.lit(1).cast("long")).otherwise(
            start(s - 1) + ln(s - 1)
        )
        return F.slice(F.col("_t"), prev_end, start(s) - prev_end)

    last_end = start(k - 1) + ln(k - 1)
    inputs = F.concat(
        F.flatten(F.transform(sidx, lambda s: F.concat(gap(s), F.array(sent(s))))),
        F.slice(F.col("_t"), last_end, n - last_end + 1),
    )
    targets = F.concat(
        F.flatten(
            F.transform(
                sidx,
                lambda s: F.concat(F.array(sent(s)), F.slice(F.col("_t"), start(s), ln(s))),
            )
        ),
        F.array(sent(k)),
    )
    # land the (expensive, reused) constructed arrays ONCE as aliases;
    # derive lengths/checksums from the columns (CollapseProject keeps
    # non-cheap exprs referenced >1x materialized)
    built = docs.select(
        id_col,
        n.alias("n_tok"),
        k.alias("n_spans"),
        F.col("_nb").alias("noise_tok"),
        inputs.alias("_in"),
        targets.alias("_tg"),
        *keep_cols,
    )
    if emit == "arrays":
        return built.select(
            id_col,
            "n_tok",
            "n_spans",
            "noise_tok",
            built["_in"].alias("inputs"),
            built["_tg"].alias("targets"),
            *keep_cols,
        )
    return built.select(
        id_col,
        "n_tok",
        "n_spans",
        "noise_tok",
        F.size("_in").cast("long").alias("inputs_len"),
        F.size("_tg").cast("long").alias("targets_len"),
        token_checksum(F.col("_in")).alias("inputs_cksum"),
        token_checksum(F.col("_tg")).alias("targets_cksum"),
        *keep_cols,
    ).orderBy(id_col)
