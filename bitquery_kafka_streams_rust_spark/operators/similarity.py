"""Similarity search over embedding columns (array<float>).

Training-data pipeline ops (no reference analog — the reference's
nearest structure is its membership semi-joins J1):

- ``cosine`` / ``dot``: JVM-side zip_with/aggregate — codegen'd, no UDF.
- ``brute_force_topk``: exact top-k neighbors; broadcast the (small)
  query set against the (huge) corpus, rank per query.  The corpus side
  streams through the scan once — this is the correctness baseline.
- ``hyperplane_signature`` + ``lsh_topk``: random-hyperplane LSH buckets
  (deterministic planes, reproducible at any scale) so candidate
  generation is an equi-join on the signature instead of a cross join —
  the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query.

    ``broadcast(queries)`` keeps the corpus scan shuffle-free; the only
    shuffle is the per-query ranking, keyed by query id (small
    cardinality → AQE coalesces)."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("c_id")).select(
        "q_id", "c_id", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "cos_sim", "rank")
    )


def hyperplane_signature(vec: Column, n_planes: int = 12, dim: int | None = None) -> Column:
    """Deterministic random-hyperplane LSH signature (long).

    plane[j][d] = ((j*1000003 + d*7919) % 2001) - 1000 — a fixed
    pseudo-random ±1000 lattice reproducible in any engine; bit j is
    sign(v · plane_j)."""
    coeff = lambda j, d: (j * F.lit(1000003) + d * F.lit(7919)) % F.lit(2001) - F.lit(1000)
    proj = lambda j: F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, d: x.cast("double") * coeff(j, d.cast("long")).cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda j: F.when(proj(j.cast("long")) > 0, F.call_function("shiftleft", F.lit(1).cast("long"), j.cast("int"))).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc.bitwiseOR(x))


def sample_centroids(
    corpus: DataFrame, n_cells: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list:
    """Deterministic hash-sampled centroids: rank by the portable Knuth
    mixing hash, take the first ``n_cells`` (TakeOrdered — a bounded
    distributed heap, never a global sort).  Metadata-sized collect;
    replayable by the DuckDB oracles.  Returns [(cent_id, [float])]
    sorted by id."""
    from .sampling import hash_frac

    rows = (
        corpus.select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
        .orderBy(hash_frac(F.col("cent_id")).asc(), F.col("cent_id").asc())
        .limit(n_cells)
        .collect()
    )
    return sorted(
        ((int(r["cent_id"]), [float(x) for x in r["cent_vec"]]) for r in rows),
        key=lambda t: t[0],
    )


def centroid_literal(cents: list) -> Column:
    """The collected centroids inlined as a literal struct array — the
    IVF coarse-quantizer broadcast (n_cells small vectors, not data)."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).alias("cent_id"),
                F.array(*[F.lit(x) for x in vec]).cast("array<double>").alias("cent_vec"),
            )
            for cid, vec in cents
        ]
    )


def cell_scores(vec: Column, cent_arr: Column) -> Column:
    """Per-centroid scores sorted best-first via (−cos, id) struct
    ordering, all inside the scan stage.  Cosines are ROUNDED (9 dp)
    before comparison so a near-tie between two centroids can't flip
    the cell between engines (float-parity invariant); cent_id is the
    tie-break."""
    return F.array_sort(
        F.transform(
            cent_arr,
            lambda cent: F.struct(
                (-F.round(cosine(vec, cent["cent_vec"]), 9)).alias("neg_cc"),
                cent["cent_id"].alias("cent_id"),
            ),
        )
    )


def refine_centroids(
    corpus: DataFrame,
    cent_rows: list,
    n_iter: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Lloyd (k-means) refinement of sampled IVF centroids.

    Each iteration: (a) map-side nearest-centroid assignment against the
    inlined centroid literals (zero corpus shuffle), (b) element-wise
    mean per cell via posexplode + two hash aggregations — shuffle keys
    are (cell, pos), cardinality n_cells × dim, so partial aggregation
    collapses the corpus map-side.  Collected rows per iteration =
    n_cells centroid vectors (metadata, like the initial sample).
    Means are rounded (6 dp) so the index is stable run-to-run despite
    float summation order; empty cells keep their previous centroid.
    Returns refined [(cent_id, [double])] — feed to ``ivf_topk`` via
    ``n_iter`` or use standalone."""
    cents = [(int(i), [float(x) for x in v]) for i, v in cent_rows]
    for _ in range(n_iter):
        scores = cell_scores(F.col("_v"), centroid_literal(cents))
        assigned = corpus.select(F.col(vec_col).alias("_v")).select(
            "_v", F.try_element_at(scores, F.lit(1))["cent_id"].alias("cell")
        )
        # a NULL embedding yields NULL cosine → NULL cell; dropping the
        # NULL group here keeps the collected means int()-castable
        # (NULL vectors can't move a centroid anyway)
        assigned = assigned.where(F.col("cell").isNotNull())
        means = (
            assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: F.round(s["m"], 6),
                ).alias("mean_vec")
            )
            .collect()
        )
        by_cell = {int(r["cell"]): list(r["mean_vec"]) for r in means}
        cents = [(cid, by_cell.get(cid, vec)) for cid, vec in cents]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 0,
) -> DataFrame:
    """IVF (inverted-file) approximate NN — the clustering-based scale
    path, complementing hyperplane LSH.

    Centroids are a deterministic pseudo-random SAMPLE of the corpus:
    rank rows by a Knuth multiplicative hash of the id and take the
    first ``n_cells`` — a distributed sort+limit (TakeOrdered), not a
    full sort (at 100 TB you'd train k-means on exactly such a sample;
    sampled centroids keep the whole index replayable in any engine,
    which the DuckDB oracle exploits).  The ``n_cells`` centroid
    vectors are collected and inlined as a literal array — the standard
    IVF coarse-quantizer broadcast (16 small vectors, NOT a data
    collect) — so cell assignment is pure map-side expression work:
    the corpus scan never shuffles and gains one int column.  Each
    query probes its ``n_probe`` nearest cells; candidates come from an
    equi-join on the cell id, ranked by exact cosine.  Candidate cost
    scales with cell occupancy, not corpus size; probe>1 recovers
    boundary misses."""
    cents = sample_centroids(corpus, n_cells, id_col, vec_col)
    if n_iter:
        # Lloyd refinement (pytest-pinned recall; the DuckDB-oracled
        # contract path keeps n_iter=0 so the index stays replayable as
        # pure sampled-centroid arithmetic)
        cents = refine_centroids(corpus, cents, n_iter, id_col, vec_col)
    cent_arr = centroid_literal(cents)

    def assign(df: DataFrame, idc: str, vecc: str, probes: int) -> DataFrame:
        probed = df.withColumn(
            "_cells", F.slice(cell_scores(F.col(vecc), cent_arr), 1, probes)
        )
        return probed.select(
            idc, vecc, F.explode(F.col("_cells").getField("cent_id")).alias("cell")
        )

    c = assign(
        corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")),
        "c_id", "c_vec", 1,
    )
    q = assign(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")),
        "q_id", "q_vec", n_probe,
    )
    scored = c.join(F.broadcast(q), ["cell"]).where(F.col("q_id") != F.col("c_id")).select(
        "q_id", "c_id", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "cos_sim", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_probes: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, then
    exact cosine ranks within bucket.

    ``n_probes`` enables multi-probe LSH: each query ALSO probes the
    ``n_probes`` buckets at Hamming distance 1 (bit j flipped, j <
    n_probes ≤ n_planes) — near-misses that straddle one hyperplane are
    recovered.  Scale shape is unchanged: the corpus side still carries
    exactly one signature per row (no corpus fan-out, no extra shuffle);
    only the small broadcast query side fans out ×(1+n_probes).  Each
    (query, candidate) pair can match at most one probe (probe buckets
    are distinct, a corpus row has one bucket), so no dedup is needed."""
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_signature(F.col(vec_col), n_planes).alias("bucket"),
    )
    if n_probes:
        probes = F.concat(
            F.array(F.col("bucket")),
            F.transform(
                F.sequence(F.lit(0), F.lit(min(n_probes, n_planes) - 1)),
                lambda j: F.col("bucket").bitwiseXOR(
                    F.call_function("shiftleft", F.lit(1).cast("long"), j.cast("int"))
                ),
            ),
        )
        q = q.withColumn("bucket", F.explode(probes))
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_signature(F.col(vec_col), n_planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), ["bucket"]).where(F.col("q_id") != F.col("c_id")).select(
        "q_id", "c_id", F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "cos_sim", "rank")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector integer quantization of an embedding column
    — the standard storage/ANN compression step (float32 → int8 cuts
    the vector footprint 4×; IVF/LSH probes then run on the quantized
    vectors).  q_i = floor(x_i / scale + 0.5) with scale =
    max|x| / (2^(bits-1) - 1); all-zero vectors quantize to zeros with
    scale 0.

    Pure Catalyst map-side expression work (one transform for |x|, one
    for the quantized array, one fold for the reconstruction error) —
    no shuffle, no Python.  ``floor(x/scale + 0.5)`` instead of
    ``round`` on purpose: identical tie behavior in every engine, so
    the op is exactly replayable in the DuckDB oracle.  Returns
    (id, scale, q array<int>, mean_abs_err)."""
    qmax = (1 << (bits - 1)) - 1
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    amax = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = amax / qmax
    q = F.when(amax == 0, F.transform(x, lambda v: F.lit(0))).otherwise(
        F.transform(
            x,
            lambda v: F.greatest(
                F.lit(-qmax), F.least(F.lit(qmax), F.floor(v / scale + 0.5))
            ).cast("int"),
        )
    )
    df2 = df.select(
        F.col(id_col).alias("id"), x.alias("_x"), scale.alias("scale"), q.alias("q")
    )
    # bound refs, NOT F.col: the output select aliases round(scale,9)
    # AS scale, and lateral-column-alias resolution would silently feed
    # the ROUNDED scale into the error terms (caught at sf0.1: one row
    # crossed the 6-dp rounding boundary vs the oracle)
    err = F.aggregate(
        F.zip_with(
            df2["_x"],
            df2["q"],
            lambda v, qi: F.abs(v - qi.cast("double") * df2["scale"]),
        ),
        F.lit(0.0),
        lambda a, e: a + e,
    ) / F.greatest(F.size(df2["_x"]), F.lit(1))
    return df2.select(
        df2["id"],
        F.round(df2["scale"], 9).alias("scale"),
        df2["q"],
        F.round(err, 6).alias("mean_abs_err"),
    )


def ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_probes: int = 0,
) -> DataFrame:
    """ANN index QUALITY evaluation: per-query recall@k of the LSH
    index (:func:`lsh_topk`) against the exact brute-force ground truth
    (:func:`brute_force_topk`) — the metric an index-tuning loop (plane
    count, probe budget) optimizes before committing an index layout at
    corpus scale.  One row per query: ``n_exact`` ground-truth
    neighbors found (< k for tiny corpora), ``n_hit`` of them the index
    returned, ``recall`` = n_hit / n_exact.

    Both sides use the identical rounded-cosine + (cos DESC, id ASC)
    tie-break, so the intersection is deterministic.  Scale shape: the
    evaluation query set is small (it rides the same broadcast both
    operators already use) — the corpus-side cost is one brute-force
    pass over the eval slice, the accepted price of ground truth; the
    index side stays the production bucket equi-join."""
    exact = brute_force_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    approx = lsh_topk(
        corpus,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        n_planes=n_planes,
        n_probes=n_probes,
    )
    hit = exact.select("q_id", "c_id").join(
        approx.select("q_id", "c_id"), ["q_id", "c_id"], "left_semi"
    )
    n_exact = exact.groupBy("q_id").agg(F.count("*").alias("n_exact"))
    n_hit = hit.groupBy("q_id").agg(F.count("*").alias("n_hit"))
    return (
        n_exact.join(n_hit, "q_id", "left")
        .select(
            "q_id",
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce("n_hit", F.lit(0)) / F.col("n_exact"), 6
            ).alias("recall"),
        )
        .orderBy("q_id")
    )


_JL_KNUTH = 2654435761
_JL_MOD = 2**31
_JL_SALT = 10 * 0x9E3779B9  # XOR stage salt 10 (registry in CLAUDE.md)


def jl_sign(idx: int) -> int:
    """±1 Achlioptas projection coefficient for flat matrix index
    ``idx`` — the sketches.py avalanche pipeline (Knuth multiply + two
    xorshift-multiply rounds) on stage salt 10, evaluated DRIVER-side:
    the signs are inlined as literals on both engines, so the hash
    only has to be deterministic, not Catalyst-expressible.  A plain
    LCG lattice (the LSH ±1000 lattice) is NOT usable here: its rows
    are shifts of one periodic sequence, and the correlated planes
    destroy the JL angle-preservation this operator exists for
    (measured: median fixed-probe cos error 0.42 vs ~0.17 avalanche)."""
    h = ((idx ^ _JL_SALT) % _JL_MOD * _JL_KNUTH) % _JL_MOD
    for s in (13, 17):
        h = ((h ^ (h >> s)) * _JL_KNUTH) % _JL_MOD
    return 1 if h < 2**30 else -1


def random_projection(
    df: DataFrame,
    *,
    out_dim: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim``
    dimensions, plus a per-row angle-preservation probe — the
    dimensionality-reduction front end of the ANN/dedup family (project
    once, then bucket/search in the cheap space).

    The projection matrix is a deterministic ±1 sign matrix
    (``jl_sign`` — Achlioptas 2003's database-friendly JL variant),
    inlined as literal coefficient arrays, so the operator is pure
    map-side Catalyst expression work: no shuffle, no Python, and any
    engine can replay it bit-for-bit.  Each output coordinate is one
    ``zip_with``+fold pass in index order (the emb_lsh_ann oracle
    precedent for cross-engine float parity).

    The JL quality metric reported per row is cosine preservation
    against a fixed all-ones probe vector: ``cos_err = |cos(Pv, Pu) -
    cos(v, u)|`` with ``u = 1⃗`` — computable map-side on both engines
    (pairwise distances would need a quadratic join; the fixed-probe
    angle error is the standard one-pass proxy).  All cosines round to
    6 dp before the error subtraction."""
    coeffs = [
        [jl_sign(j * dim + d) for d in range(dim)] for j in range(out_dim)
    ]
    import math

    pp = [sum(c) for c in coeffs]  # projection of the all-ones probe (exact ints)
    pp_dot = float(sum(p * p for p in pp))
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    # Each 64-element fold lands ONCE as an alias; later selects only
    # reference the columns.  Inlining the folds into every use (the
    # p_j rounds, both norms, the probe dot) multiplies the expression
    # tree ~20x and pays seconds of pure compile/serialize time —
    # CollapseProject keeps non-cheap exprs referenced >1x
    # materialized, so this staging is what bounds the plan size.
    s1 = df.select(F.col(id_col), x.alias("_x"))
    s2 = s1.select(
        F.col(id_col),
        F.aggregate(s1["_x"], F.lit(0.0), lambda a, v: a + v).alias("_sx"),
        dot(s1["_x"], s1["_x"]).alias("_vd"),
        *[
            dot(s1["_x"], F.array(*[F.lit(float(c)) for c in coeffs[j]])).alias(
                f"_pj{j}"
            )
            for j in range(out_dim)
        ],
    )
    proj_cols = [s2[f"_pj{j}"] for j in range(out_dim)]
    vnorm = F.sqrt(s2["_vd"])
    pnorm = F.sqrt(
        sum((c * c for c in proj_cols[1:]), proj_cols[0] * proj_cols[0])
    )
    probe_dot = sum(
        (c * F.lit(float(p)) for c, p in zip(proj_cols[1:], pp[1:])),
        proj_cols[0] * F.lit(float(pp[0])),
    )
    # cos(v, ones) = sum(v) / (||v|| * sqrt(dim))
    cos_orig = F.when(vnorm == 0, F.lit(0.0)).otherwise(
        F.round(s2["_sx"] / (vnorm * F.lit(math.sqrt(float(dim)))), 6)
    )
    cos_proj = F.when(pnorm == 0, F.lit(0.0)).otherwise(
        F.round(probe_dot / (pnorm * F.lit(math.sqrt(pp_dot))), 6)
    )
    out = s2.select(
        F.col(id_col),
        *[F.round(proj_cols[j], 6).alias(f"p{j}") for j in range(out_dim)],
        cos_orig.alias("cos_orig"),
        cos_proj.alias("cos_proj"),
    )
    return out.withColumn(
        "cos_err", F.round(F.abs(F.col("cos_proj") - F.col("cos_orig")), 6)
    )


def label_margin_eval(
    emb: DataFrame,
    *,
    label_col: str = "label",
    vec_col: str = "embedding",
    q_scale: int = 1000,
    out_dp: int = 6,
) -> DataFrame:
    """Label-separability evaluation in embedding space: per label,
    how well its members cohere around their own centroid vs the best
    competing one — the QA gate for a labeled embedding table before
    anyone trusts it for retrieval slices or semantic dedup.

    Per point: cosine to every label centroid (centroids enter as the
    label's INTEGER component-sum vector — cosine is scale-invariant,
    so no mean division, no float centroid); ``margin`` = own-label
    cosine − best other-label cosine; a point is misassigned when some
    other centroid wins (ties break toward the smaller label).

    Scale/parity shape: components quantize to round(x·q_scale) longs
    map-side, the per-(label, dim) sums are ONE partial-combined
    aggregate collected driver-side (labels × dim metadata, inlined as
    LITERAL arrays — the IVF centroid pattern; a joined 10-row frame
    would constant-fold into the banned BNLJ); scoring is map-side
    zip_with dots in exact longs (overflow contract: n·q_scale·|x| per
    (label,dim) sum must keep Σq·S under 2^63 — at q_scale 1e3 and
    |x| ≤ 1 that is ~1e11 rows per label), cosines round to 9 dp
    BEFORE comparisons, margins quantize to a 1e6 grid before the
    per-label mean.

    Output: (label, n, n_misassigned, mean_margin, mean_sim_own)."""
    dim = len(emb.select(vec_col).first()[0])
    qx = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(int(q_scale)), 0).cast("long"),
    )
    pts = emb.select(F.col(label_col).alias("label"), qx.alias("_q"))
    sums = (
        pts.select("label", F.posexplode("_q").alias("d", "v"))
        .groupBy("label", "d")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    by_label: dict[int, list[int]] = {}
    for r in sums:
        by_label.setdefault(int(r["label"]), [0] * dim)[int(r["d"])] = int(r["s"])
    labels = sorted(by_label)
    import math as _math

    s_norm = {l: _math.sqrt(float(sum(v * v for v in by_label[l]))) for l in labels}

    def _cos(l: int) -> Column:
        lit = F.array(*[F.lit(v) for v in by_label[l]])
        d = F.aggregate(
            F.zip_with(F.col("_q"), lit, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        nx = F.sqrt(
            F.aggregate(
                F.transform(F.col("_q"), lambda x: x * x),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).cast("double")
        )
        return F.round(d.cast("double") / (nx * F.lit(s_norm[l])), 9)

    scored = pts.select(
        "label",
        F.array(
            *[
                F.struct(_cos(l).alias("cos"), F.lit(-l).alias("negl"))
                for l in labels
            ]
        ).alias("_cands"),
    )
    own = F.element_at(
        F.filter(F.col("_cands"), lambda c: -c["negl"] == F.col("label")), 1
    )["cos"]
    best = F.array_max(F.col("_cands"))
    per_pt = scored.select(
        "label",
        own.alias("_own"),
        (-best["negl"]).alias("_assigned"),
        F.round(
            own
            - F.array_max(
                F.filter(F.col("_cands"), lambda c: -c["negl"] != F.col("label"))
            )["cos"],
            9,
        ).alias("_m9"),
    )
    qm = F.round(F.col("_m9") * F.lit(1e6), 0).cast("long")
    qo = F.round(F.col("_own") * F.lit(1e6), 0).cast("long")
    g = per_pt.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("_assigned") != F.col("label")).cast("long")).alias(
            "n_misassigned"
        ),
        F.sum(qm).alias("_sm"),
        F.sum(qo).alias("_so"),
    )
    n = F.col("n").cast("double")
    return g.select(
        "label",
        "n",
        "n_misassigned",
        F.round(F.col("_sm").cast("double") / F.lit(1e6) / n, out_dp).alias(
            "mean_margin"
        ),
        F.round(F.col("_so").cast("double") / F.lit(1e6) / n, out_dp).alias(
            "mean_sim_own"
        ),
    )


_TRIP_SALT = 14 * 0x9E3779B9  # stage 14 — triplet negative geometry (CLAUDE.md)
_TRIP_KNUTH = 2654435761
_TRIP_MOD = 2**31


def _trip_hash(idc: Column) -> Column:
    """sketches.py avalanche pipeline on stage salt 14 — inlined
    identically in the triplet oracle."""
    h = F.pmod(
        F.pmod(idc.cast("long").bitwiseXOR(F.lit(_TRIP_SALT)), F.lit(_TRIP_MOD))
        * F.lit(_TRIP_KNUTH),
        F.lit(_TRIP_MOD),
    )
    for sh in (13, 17):
        h = F.pmod(
            h.bitwiseXOR(F.shiftright(h, sh)) * F.lit(_TRIP_KNUTH), F.lit(_TRIP_MOD)
        )
    return h


def contrastive_triplets(
    corpus_ids: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "id",
    n_buckets: int = 64,
) -> DataFrame:
    """(anchor, positive, negative) training triplets for a contrastive
    embedding model: positives are the verified near-dup pairs
    (MinHash/SimHash/gram family output — (id_a, id_b)); the negative
    is a DETERMINISTIC pseudo-random corpus document drawn by hash
    geometry, so the triplet set is reproducible at any scale and
    restart (no RNG state — the FIM/span-corruption doctrine applied to
    sampling partners).

    Negative draw: every corpus id lands in bucket
    ``avalanche₁₄(id) mod n_buckets``; each bucket keeps its THREE
    smallest-hash members (a bucket-partitioned WindowGroupLimit —
    distributed, never a global order); an anchor probes the NEXT
    bucket ``(own + 1) mod n_buckets`` — so it can never draw itself —
    and takes the first member that is not the positive.  Anchors
    whose probed bucket is empty or positive-only drop — identically
    on both engines; size ``n_buckets`` well under corpus/3 so buckets
    stay populated.

    Scale shape: hashes map-side; the bucket top-3 table is
    n_buckets·3 metadata joined broadcast; one narrow aggregate picks
    the min-rank eligible candidate."""
    ids = corpus_ids.select(F.col(id_col).alias("cid")).distinct()
    hashed = ids.select(
        "cid",
        _trip_hash(F.col("cid")).alias("_h"),
        F.pmod(_trip_hash(F.col("cid")), F.lit(int(n_buckets))).alias("_bkt"),
    )
    w = Window.partitionBy("_bkt").orderBy(F.col("_h").asc(), F.col("cid").asc())
    top3 = (
        hashed.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= 3)
        .select("_bkt", "_rk", F.col("cid").alias("_cand"))
    )
    pos = pairs.select(
        F.col("id_a").alias("anchor"),
        F.col("id_b").alias("positive"),
        F.pmod(
            _trip_hash(F.col("id_a")) + F.lit(1), F.lit(int(n_buckets))
        ).alias("_bkt"),
    )
    eligible = pos.join(F.broadcast(top3), "_bkt").where(
        (F.col("_cand") != F.col("anchor")) & (F.col("_cand") != F.col("positive"))
    )
    return eligible.groupBy("anchor", "positive").agg(
        F.min_by("_cand", "_rk").alias("negative")
    )
