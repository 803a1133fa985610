"""operators/pca.py: covariance vs numpy, power-iteration convergence
on a gapped spectrum, projection exactness, degenerate guards."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bitquery_kafka_streams_rust_spark.operators import pca as P
from bitquery_kafka_streams_rust_spark.operators.sampling import _round_half_up


def test_covariance_matches_numpy(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in P.embedding_covariance(df).collect()
    }
    X = np.array(
        [r["embedding"] for r in df.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    Xc = X - X.mean(0)
    C = Xc.T @ Xc / len(X)
    assert len(got) == 64 * 65 // 2
    # quantization at scale 1e6 bounds the cell error well below 1e-6
    for (i, j), v in got.items():
        assert j >= i
        assert abs(v - C[i, j]) < 1e-6, (i, j)


def test_power_iterate_converges_on_gapped_spectrum():
    # construct a covariance with a dominant direction: eigenvalues
    # (1.0, 0.1, 0.1, ...) in a rotated basis — gap ratio 0.1 means
    # six iterations align to ~1e-6
    rng = np.random.RandomState(7)
    d = 64
    Q, _ = np.linalg.qr(rng.randn(d, d))
    lam = np.full(d, 0.1)
    lam[0] = 1.0
    C = (Q * lam) @ Q.T
    rows = [
        (i, j, _round_half_up(float(C[i, j]), 9))
        for i in range(d)
        for j in range(i, d)
    ]
    v = np.array(P.power_iterate(rows, d, iters=6))
    top = Q[:, 0]
    assert abs(abs(float(v @ top)) - 1.0) < 1e-4
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-6


def test_power_iterate_zero_matrix_stays_at_start():
    rows = [(i, j, 0.0) for i in range(8) for j in range(i, 8)]
    assert P.power_iterate(rows, 8, iters=3) == [0.125] * 8


def test_project_is_exact_long_dot(spark):
    vecs = [
        (0, [0.5, -0.25, 0.125, 1.0]),
        (1, [-1.0, 0.0, 0.75, -0.5]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    comp = [0.6, -0.3, 0.1, 0.2]
    got = {
        r["vec_id"]: r["pc1"]
        for r in P.pca_project(df, comp, scale=1_000_000).collect()
    }
    for vid, emb in vecs:
        vq = [int(_round_half_up(c * 1e9, 0)) for c in comp]
        q = [int(_round_half_up(float(np.float32(x)) * 1e6, 0)) for x in emb]
        want = _round_half_up(
            float(sum(a * b for a, b in zip(q, vq))) / 1e15, 6
        )
        assert got[vid] == want, vid


def test_top_component_unit_scores_bounded(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = P.pca_top_component(df).collect()
    assert len(out) == df.count()
    # |score| <= ||x|| * ||v|| = ||x|| <= sqrt(64) on [-1,1] components
    assert all(abs(r["pc1"]) <= math.sqrt(64.0) for r in out)
