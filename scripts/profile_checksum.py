"""Micro-benchmark of the map-side token scan (validate + checksum).

Round-1 verdict: the streaming pipeline shows ~zero N->4N scaling.
profile_scan.py showed the decode stage is superlinearly slow on fat
partitions (GC pressure from per-row array allocations: F.sequence +
F.zip_with materialize two arrays per row before the fold).  This
compares expression variants on identical input:

  A) current: where(is_valid_sequence) + token_checksum (3 passes,
     2 array allocs/row)
  B) single-pass struct fold: one F.aggregate with (sum, i, min, max)
     accumulator; validity + checksum derived from the struct
  C) B but two exprs sharing the scan (checksum fold + forall)

Usage: python scripts/profile_checksum.py [replicas] [cores ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark import datagen
from bitquery_kafka_streams_rust_spark.functions import tokens as TK
from bitquery_kafka_streams_rust_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 40
CORES = [int(c) for c in sys.argv[2:]] or [8, 32]
VOCAB = 50257


def scan_stats(tokens):
    """One-pass fold: struct(sum s, index i, min mn, max mx)."""
    tokens = F.col(tokens) if isinstance(tokens, str) else tokens
    init = F.struct(
        F.lit(0).cast("long").alias("s"),
        F.lit(0).cast("long").alias("i"),
        F.lit(VOCAB).cast("long").alias("mn"),
        F.lit(-1).cast("long").alias("mx"),
    )
    return F.aggregate(
        tokens,
        init,
        lambda acc, x: F.struct(
            (acc["s"] + x.cast("long") * (acc["i"] + 1)).alias("s"),
            (acc["i"] + 1).alias("i"),
            F.least(acc["mn"], x.cast("long")).alias("mn"),
            F.greatest(acc["mx"], x.cast("long")).alias("mx"),
        ),
    )


def variant_a(df):
    return df.where(TK.is_valid_sequence("tokens", "n_tok")).select(
        "doc_id", TK.token_checksum("tokens").alias("cksum")
    )


def variant_b(df):
    st = scan_stats("tokens")
    out = df.select("doc_id", "n_tok", F.size("tokens").alias("sz"), st.alias("st"))
    valid = (F.col("sz") == F.col("n_tok")) & (
        (F.col("sz") == 0) | ((F.col("st.mn") >= 0) & (F.col("st.mx") < VOCAB))
    )
    return out.where(valid).select(
        "doc_id", (F.col("st.s") % F.lit(2**31)).alias("cksum")
    )


def checksum_fold(tokens):
    """Checksum only, via struct fold (no sequence/zip_with allocs)."""
    tokens = F.col(tokens) if isinstance(tokens, str) else tokens
    init = F.struct(F.lit(0).cast("long").alias("s"), F.lit(0).cast("long").alias("i"))
    st = F.aggregate(
        tokens,
        init,
        lambda acc, x: F.struct(
            (acc["s"] + x.cast("long") * (acc["i"] + 1)).alias("s"),
            (acc["i"] + 1).alias("i"),
        ),
    )
    return st["s"] % F.lit(2**31)


def variant_c(df):
    return df.where(TK.is_valid_sequence("tokens", "n_tok")).select(
        "doc_id", checksum_fold("tokens").alias("cksum")
    )


def main() -> None:
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    in_dir = tempfile.mkdtemp(prefix="profile_cksum_", dir=scratch)
    spark = get_spark(app_name="gen", master="local[32]", shuffle_partitions=32)
    n = datagen.write_spine_batches(spark, SF_DIR, in_dir, REPLICAS, 8, parts_per_batch=16)
    spark.stop()
    print(f"input {n} rows", flush=True)
    split = {
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": str(1024 * 1024),
    }
    try:
        for cores in CORES:
            spark = get_spark(
                app_name=f"cksum-{cores}", master=f"local[{cores}]",
                shuffle_partitions=cores, extra_conf=split,
            )
            df = spark.read.parquet(in_dir)
            for name, v in (("A_current", variant_a), ("B_onepass", variant_b),
                            ("C_fold+forall", variant_c)):
                out = v(df)
                walls = []
                for _ in range(3):
                    t0 = time.time()
                    r = out.agg(F.sum("cksum"), F.count("*")).collect()
                    walls.append(time.time() - t0)
                print(
                    f"cores={cores} {name}: best={min(walls):.2f}s all={[round(w,2) for w in walls]} "
                    f"sum={r[0][0]} n={r[0][1]}",
                    flush=True,
                )
            spark.stop()
    finally:
        import shutil

        shutil.rmtree(in_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
