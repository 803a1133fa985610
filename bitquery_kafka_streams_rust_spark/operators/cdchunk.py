"""Content-defined chunking (FastCDC shape) + chunk-level dedup.

Document-level exact dedup misses the storage/near-dup middle ground:
two docs that share a long run of tokens but differ elsewhere.  The
span family (``spans.py``) finds exact n-gram islands; content-defined
chunking is the coarser, cheaper primitive the storage world uses
(FastCDC / Rabin chunkers, LBFS): cut the token stream wherever a
ROLLING hash of the last ``w`` tokens lands in a sparse residue class,
then fingerprint each chunk.  Because the cut rule depends only on a
local window, an insertion re-aligns at the next boundary — chunk
fingerprints downstream of the edit are identical, which is what makes
chunk-hash grouping a sub-document dedup/delta signal that survives
prefix edits (a property fixed-size chunking — ``packing.chunk`` —
fundamentally lacks).

Deviations from FastCDC, deliberately: no min/max chunk-size clamps —
the clamp makes boundary i depend on boundary i-1 (a sequential scan,
hostile to both Catalyst HOF evaluation and the SQL oracle); the pure
position-local predicate keeps every doc's chunking embarrassingly
parallel and bit-replayable.  Expected chunk length is 2^boundary_bits
tokens (geometric), window ``w`` sets edit-alignment granularity.

Portability doctrine: the rolling hash is the repo's base-313 windowed
polynomial (``dedup._windowed_poly``, mod 2^31-1) pushed through the
jl_sign/HLL avalanche pipeline on XOR stage salt 13 (the registry slot
allocated for CDC geometry — same-stage hashes correlate perfectly, so
this stage is not reusable).  Chunk fingerprints are the avalanched
offset-weighted sum ``Σ token·(pos-start) mod 2^31-1`` — the
``token_checksum`` shape.  Every step is exact integer arithmetic the
DuckDB oracle replays term-for-term.

Scale shape: boundary detection, chunk splitting and fingerprinting
are ALL map-side array expressions — the token arrays never cross a
shuffle (CLAUDE.md invariant); only narrow (doc_id, idx, start, len,
hash) rows reach the single duplicate-group exchange, whose partial
aggregation collapses per-partition duplicates first.  At 100 TB this
is one scan + one narrow groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _P31, _windowed_poly

_KNUTH = 2654435761
_MOD = 2**31
_STAGE_SALT = 13 * 0x9E3779B9  # stage 13 — CDC chunk geometry (CLAUDE.md registry)


def _avalanche(x: Column) -> Column:
    """The sketches.py/jl_sign avalanche pipeline on stage salt 13:
    XOR-salt -> Knuth multiply -> two xorshift-multiply rounds, all
    mod 2^31 — inlined identically in the oracle SQL."""
    h = F.pmod(
        F.pmod(x.bitwiseXOR(F.lit(_STAGE_SALT)), F.lit(_MOD)) * F.lit(_KNUTH),
        F.lit(_MOD),
    )
    for sh in (13, 17):
        h = F.pmod(h.bitwiseXOR(F.shiftright(h, sh)) * F.lit(_KNUTH), F.lit(_MOD))
    return h


def chunk_table(
    df: DataFrame,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    w: int = 8,
    boundary_bits: int = 5,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per content-defined chunk: (id, chunk_idx, start,
    chunk_len, chunk_hash), start/idx 1-based.  Docs shorter than the
    window are a single chunk; empty docs emit no rows.  Entirely
    map-side until the caller aggregates."""
    mask = (1 << boundary_bits) - 1
    empty_i = F.array().cast("array<int>")
    # Staged selects materialize each array ONCE per row as a column —
    # a lambda body that references an outer COLUMN reads the computed
    # value (O(1)); referencing an inline expression tree would
    # re-evaluate it per lambda element (measured O(n^2): unusable).
    d0 = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.transform(F.col(tokens_col), lambda t: t.cast("long")).alias("_lg"),
        F.size(F.col(tokens_col)).alias("_n"),
    )
    n = F.col("_n")
    # rolling hash of every w-window, avalanched; element i covers
    # positions i..i+w-1 (1-based), i.e. the window ENDING at i+w-1.
    # The n >= w guard is load-bearing: CASE branches evaluate lazily,
    # and _windowed_poly's slice has negative length on shorter docs.
    d1 = d0.withColumn(
        "_rolled",
        F.when(n >= w, F.transform(_windowed_poly(F.col("_lg"), w), _avalanche))
        .otherwise(F.array().cast("array<long>")),
    )
    # boundary end-positions: every p whose window hash lands in the
    # sparse residue class, plus n — zip_with walks _rolled once
    cuts = F.filter(
        F.zip_with(
            F.col("_rolled"),
            F.when(n >= w, F.sequence(F.lit(w), n)).otherwise(empty_i),
            lambda h, p: F.when(h.bitwiseAND(F.lit(mask)) == 0, p),
        ),
        lambda p: p.isNotNull(),
    )
    d2 = d1.withColumn("_cuts", cuts)
    bnds = (
        F.when(n == 0, empty_i)
        .when(
            F.coalesce(F.try_element_at(F.col("_cuts"), F.lit(-1)), F.lit(-1)) == n,
            F.col("_cuts"),
        )
        .otherwise(F.concat(F.col("_cuts"), F.array(n)))
    )
    d3 = d2.withColumn("_bnds", bnds)
    starts = F.when(F.size(F.col("_bnds")) == 0, empty_i).otherwise(
        F.concat(
            F.array(F.lit(0)),
            F.slice(F.col("_bnds"), 1, F.greatest(F.size(F.col("_bnds")) - 1, F.lit(0))),
        )
    )
    d4 = d3.withColumn(
        "_spans",
        F.zip_with(
            starts, F.col("_bnds"), lambda s, e: F.struct(s.alias("s"), e.alias("e"))
        ),
    )
    # offset-weighted chunk fingerprint: Σ token·(pos-start) mod P31,
    # avalanched — tokens stay inside this per-row expression (_lg is a
    # materialized column, so the per-span slice is a copy, not a
    # recompute)
    chunks = F.transform(
        F.col("_spans"),
        lambda sp: F.struct(
            (sp["s"] + 1).alias("start"),
            (sp["e"] - sp["s"]).alias("chunk_len"),
            _avalanche(
                F.pmod(
                    F.aggregate(
                        F.zip_with(
                            F.slice(F.col("_lg"), sp["s"] + 1, sp["e"] - sp["s"]),
                            F.sequence(F.lit(1), sp["e"] - sp["s"]),
                            lambda t, j: t * j.cast("long"),
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    ),
                    F.lit(_P31),
                )
            ).alias("chunk_hash"),
        ),
    )
    out = d4.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], F.posexplode(chunks)
    )
    return out.select(
        id_col,
        *keep_cols,
        (F.col("pos") + 1).alias("chunk_idx"),
        F.col("col.start").alias("start"),
        F.col("col.chunk_len").alias("chunk_len"),
        F.col("col.chunk_hash").alias("chunk_hash"),
    )


def duplicate_chunks(chunks: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Cross-corpus duplicated-chunk groups: (chunk_len, chunk_hash,
    n_occ, n_docs) for every fingerprint seen more than once.  ONE
    narrow partial-combined exchange; the exact-distinct doc count is
    oracle-parity — swap in approx_count_distinct at extreme group
    counts."""
    return (
        chunks.groupBy("chunk_len", "chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct(F.col(id_col)).alias("n_docs"),
        )
        .where(F.col("n_occ") > 1)
    )
