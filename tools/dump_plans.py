"""Dump ``explain("formatted")`` for named contract queries to files.

Usage: python tools/dump_plans.py <out_dir> <sf_dir> <suffix> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query — the plan
evidence the optimization round commits under ``plans/r06/``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, sf_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    import __spark_entry__ as E
    from bitquery_kafka_streams_rust_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    qs = E.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
