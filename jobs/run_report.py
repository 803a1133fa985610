"""Corpus data-card report job — ship with spark-submit --py-files.

    spark-submit --py-files engine.zip jobs/run_report.py \
        --input /data/documents --json-out /reports/card.json

Local smoke (this sandbox):

    python jobs/run_report.py --input /root/testdata/sf0.001/documents.parquet

The observability companion to ``run_curation.py``: before (or after)
curating a corpus, emit the one-page data card every dataset release
ships — composition, quality, duplication, PII exposure, length shape —
as ONE JSON document.  The reference's observability layer
(src/observability/*, the /metrics endpoint) answers "how is the
PIPELINE doing"; this job answers "what is IN the data", the question a
training-run postmortem asks first.

Every section reuses an already-oracle-checked operator — the report
adds zero new semantics, only composition:

    schema profile     -> operators/aggregates.profile_table
    composition        -> one partial-combined groupBy per axis
    quality / langid   -> functions/text.quality_score, detect_lang
    repetition gates   -> functions/text.repetition_gate_cols
    exact duplication  -> functions/text.fingerprint_md5 hash-groupBy
    PII exposure       -> functions/text.pii_counts
    length shape       -> exact percentiles (sf-scale) over n_chars

Scale notes: every section is one scan + one partial-combined
aggregate; the only per-doc state is map-side expressions.  Sections
run as SEPARATE actions on one cached frame (a single mega-aggregate
would serialize an expression tree past the ~4 s compile constant and
recompute the regexp stack per column — see the CollapseProject note in
the verify skill).  At 100 TB swap the exact length percentiles for
``percentile_approx`` via ``--approx``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bitquery_kafka_streams_rust_spark.functions import text as TX  # noqa: E402
from bitquery_kafka_streams_rust_spark.operators import aggregates as AG  # noqa: E402
from bitquery_kafka_streams_rust_spark.session import get_spark  # noqa: E402


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="corpus data-card report")
    p.add_argument(
        "--input", required=True, help="documents parquet (doc_id, text, source, lang, n_chars)"
    )
    p.add_argument("--json-out", default=None, help="also write the card here")
    p.add_argument(
        "--approx", action="store_true", help="sketch percentiles (the 100 TB path)"
    )
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def build_report(docs, *, approx: bool = False) -> dict:
    """The data card as a plain dict (deterministic: every number is an
    aggregate of deterministic map-side expressions)."""
    docs = docs.cache()
    try:
        n_docs = docs.count()

        # 1. schema profile: per-column nonnull/distinct/min/max
        profile = {
            r["col_name"]: {
                "n_nonnull": r["n_nonnull"],
                "n_distinct": r["n_distinct"],
            }
            for r in AG.profile_table(docs).collect()
        }

        # 2. composition: per-source and per-lang doc counts + char share
        def _axis(col):
            total = F.sum("n_chars").alias("chars")
            rows = (
                docs.groupBy(col)
                .agg(F.count("*").alias("docs"), total)
                .collect()
            )
            all_chars = sum(r["chars"] or 0 for r in rows) or 1
            return {
                str(r[col]): {
                    "docs": r["docs"],
                    "chars": int(r["chars"] or 0),
                    "char_share": round((r["chars"] or 0) / all_chars, 6),
                }
                for r in rows
            }

        composition = {"by_source": _axis("source"), "by_lang": _axis("lang")}

        # 3. quality + langid + repetition gates: one aggregate pass over
        #    map-side expressions (gates landed in ONE select so the
        #    regexp/HOF stack is computed once — CollapseProject keeps
        #    non-cheap exprs referenced >1x materialized)
        t = F.col("text")
        gated = docs.select(
            TX.quality_score(t).alias("q"),
            TX.detect_lang(t).alias("detected"),
            F.col("lang"),
            TX.dup_word_frac(t).alias("dw"),
            TX.dup_2gram_frac(t).alias("d2"),
            TX.top_word_frac(t).alias("tw"),
        )
        qrow = gated.agg(
            F.round(F.avg("q"), 6).alias("mean_quality"),
            F.round(
                F.avg((F.col("detected") == F.col("lang")).cast("double")), 6
            ).alias("langid_agreement"),
            F.round(
                F.avg(
                    TX.repetition_gate_cols(
                        F.col("dw"), F.col("d2"), F.col("tw")
                    ).cast("double")
                ),
                6,
            ).alias("repetition_pass_rate"),
        ).collect()[0]

        # 4. exact duplication: md5 fingerprint hash-groupBy
        dup = (
            docs.select(TX.fingerprint_md5(t).alias("fp"))
            .groupBy("fp")
            .agg(F.count("*").alias("c"))
            .agg(
                F.count("*").alias("n_unique"),
                F.sum(F.col("c") - 1).alias("n_dup_docs"),
                F.sum((F.col("c") > 1).cast("long")).alias("n_dup_groups"),
            )
            .collect()[0]
        )

        # 5. PII exposure: total hits per category
        pii_row = docs.select(*TX.pii_counts(t)).agg(
            F.sum("n_email").alias("email"),
            F.sum("n_ip").alias("ipv4"),
            F.sum("n_phone").alias("phone"),
        ).collect()[0]

        # 6. length shape
        lens = AG.percentile_summary(docs, "n_chars", approx=approx).collect()[0]

        return {
            "n_docs": n_docs,
            "profile": profile,
            "composition": composition,
            "quality": {
                "mean_quality": float(qrow["mean_quality"] or 0.0),
                "langid_agreement": float(qrow["langid_agreement"] or 0.0),
                "repetition_pass_rate": float(qrow["repetition_pass_rate"] or 0.0),
            },
            "duplication": {
                "n_unique": int(dup["n_unique"] or 0),
                "n_dup_docs": int(dup["n_dup_docs"] or 0),
                "n_dup_groups": int(dup["n_dup_groups"] or 0),
                "dup_rate": round((dup["n_dup_docs"] or 0) / max(n_docs, 1), 6),
            },
            "pii": {
                "email": int(pii_row["email"] or 0),
                "ipv4": int(pii_row["ipv4"] or 0),
                "phone": int(pii_row["phone"] or 0),
            },
            "length_chars": {
                "mean": float(lens["avg"]),
                "max": int(lens["max"]),
                "p50": float(lens["p50"]),
                "p90": float(lens["p90"]),
                "p99": float(lens["p99"]),
            },
        }
    finally:
        docs.unpersist()


def main(argv: list[str] | None = None) -> int:
    a = parse_args(argv)
    spark = get_spark(app_name="corpus-report", master=a.master)
    card = build_report(spark.read.parquet(a.input), approx=a.approx)
    line = json.dumps(card, sort_keys=True)
    if a.json_out:
        with open(a.json_out, "w") as fh:
            fh.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
