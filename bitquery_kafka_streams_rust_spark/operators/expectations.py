"""Declarative data-quality expectations — the gate/quarantine split
as a reusable contract (the Delta-Live-Tables expectations shape over
plain DataFrames).

A pipeline stage declares WHAT must hold; the engine derives the
split and the audit trail:

    exps = [
        Expectation("valid_len", F.size("tokens") == F.col("n_tok")),
        Expectation("known_source", F.col("source").isin(ALLOW), action="drop"),
        Expectation("nonempty", F.col("n_tok") > 0, action="quarantine"),
    ]
    passed, failed, metrics = apply_expectations(df, exps)

Semantics:

- Rules evaluate in DECLARATION ORDER; a row is attributed to its
  FIRST failing rule (``_violated`` column on the failed side) — one
  codegen'd CASE projection, the same scan-stage shape as
  ``tokens.invalid_reason``.
- ``action`` is metadata describing what the caller should do with
  that rule's rows (``drop``: discard silently, ``quarantine``: keep
  replayable — route to a DLQ sink, ``fail``: the batch must abort).
  ``check_failures(failed, exps)`` raises ``ExpectationError`` when
  any fail-action rule has violations — an EAGER count, so call it
  where an action is acceptable (batch jobs, foreachBatch bodies);
  the split itself stays lazy.
- ``metrics`` is one lazily-computed row per rule (violation count,
  action) — rule-cardinality bounded, an audit artifact for lineage
  manifests / data cards.

Scale shape: the classification is a single map-side projection (no
shuffle); the passed/failed split re-uses it as two filters over the
same subplan; metrics are one partial-combined aggregate over the
failed side only.  Streaming: classification and split are stateless,
so both sides are plain append streams (the quarantine path in
``streaming/pipeline.py`` is this contract's D5 instance).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ACTIONS = ("drop", "quarantine", "fail")


class ExpectationError(RuntimeError):
    """A fail-action expectation had violating rows."""


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: Column = field(repr=False)
    action: str = "drop"

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise ValueError(f"action must be one of {_ACTIONS}, got {self.action!r}")
        if not self.name:
            raise ValueError("expectation needs a name")


def _violation(exps: Sequence[Expectation]) -> Column:
    """First failing rule's name, NULL when every rule holds.  A NULL
    predicate result counts as a violation (an expectation must be
    provably TRUE to pass — the SQL-three-valued-logic trap a naive
    ``where`` would invert on the failed side)."""
    out = None
    for e in exps:
        holds = F.coalesce(e.predicate, F.lit(False))
        out = F.when(~holds, F.lit(e.name)) if out is None else out.when(
            ~holds, F.lit(e.name)
        )
    return out


def apply_expectations(
    df: DataFrame, exps: Sequence[Expectation]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Split ``df`` by the declared expectations.

    Returns ``(passed, failed, metrics)``: ``passed`` = rows violating
    nothing (original schema); ``failed`` = violating rows + a
    ``_violated`` rule-name column; ``metrics`` = one row per rule
    (name, action, n_violations ≥ 0) in declaration order — all lazy.
    """
    if not exps:
        raise ValueError("at least one expectation required")
    names = [e.name for e in exps]
    if len(set(names)) != len(names):
        raise ValueError("expectation names must be unique")
    v = _violation(exps)
    classified = df.withColumn("_violated", v)
    passed = classified.where(F.col("_violated").isNull()).drop("_violated")
    failed = classified.where(F.col("_violated").isNotNull())
    counts = failed.groupBy("_violated").agg(F.count("*").alias("n"))
    spark = df.sparkSession
    decl = spark.createDataFrame(
        [(i, e.name, e.action) for i, e in enumerate(exps)],
        "ord int, rule string, action string",
    )
    metrics = (
        decl.join(counts, decl["rule"] == counts["_violated"], "left")
        .select(
            "ord",
            "rule",
            "action",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_violations"),
        )
        .orderBy("ord")
        .drop("ord")
    )
    return passed, failed, metrics


def check_failures(failed: DataFrame, exps: Sequence[Expectation]) -> None:
    """Raise ``ExpectationError`` if any fail-action rule has rows in
    ``failed``.  One eager rule-bounded aggregate; call at batch/epoch
    boundaries."""
    fail_rules = [e.name for e in exps if e.action == "fail"]
    if not fail_rules:
        return
    hits = (
        failed.where(F.col("_violated").isin(fail_rules))
        .groupBy("_violated")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    if hits:
        detail = ", ".join(f"{r['_violated']}={r['n']}" for r in hits)
        raise ExpectationError(f"fail-action expectations violated: {detail}")
