"""Ad-hoc query timing harness for the optimization rounds (guide §1.4).

``bench.py`` is FROZEN for driver measurement; this file carries the
extra isolation runs the optimization work needs: time any subset of
``queries()`` with the noop sink (computation only, no output cost),
best-of-N passes, labelled jobs.

Usage: python bench_extra.py [sf_dir] [passes] [query ...]
       (default: sf0.1, 2 passes, the bench.py HEADLINE list)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_pipeline",
    "seq_filter",
    "seq_dedup",
    "seq_token_stats",
    "seq_shard_join",
    "q1_pricing_summary",
    "join_enrich_broadcast",
    "doc_quality_langid",
    "emb_cosine_topk",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or HEADLINE
    import __spark_entry__ as E
    from bitquery_kafka_streams_rust_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qs = E.queries()
    best: dict[str, float] = {}
    for p in range(passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} pass{p}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in best or dt < best[name]:
                best[name] = dt
            sys.stderr.write(f"[pass {p}] {name}: {dt}s\n")
    print(json.dumps({"sf_dir": sf_dir, "passes": passes,
                      "total": round(sum(best.values()), 3), "queries": best}))
    spark.stop()


if __name__ == "__main__":
    main()
