"""Composable predicate library — the engine's WHERE clause.

Re-expresses the reference's ``EventFilter`` / ``FilterBuilder``
(``src/filters.rs:12-34,44-125,132-205``) as a fluent builder of
Catalyst ``Column`` predicates.  Because every predicate is a plain
Column expression, Catalyst pushes the conjunction down to the parquet/
Iceberg scan (predicate pushdown + partition/file pruning) — the
reference's hand-rolled ``enable_pre_filtering`` (``src/config.rs:239-241``)
is free here.

Semantics preserved exactly:
- empty list ⇒ pass (F1, ``filters.rs:46-50``; F5 ``:110-114``)
- slot/range inclusive on both ends (F2, ``filters.rs:53-62``)
- membership with NULL key ⇒ reject (F3, ``filters.rs:73-77``;
  Spark's ``isin`` on NULL yields NULL which ``filter`` treats as false)
- type-dispatched min-amount with exemption for types that carry no
  amount (F4, ``filters.rs:82-107``)
- arbitrary custom predicate escape hatch (F6, ``filters.rs:117-121``) —
  any Column, or a vectorized pandas UDF (never per-row Python).

All conditions AND-ed, as in ``EventFilter::matches`` (``filters.rs:44``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class FilterBuilder:
    """Fluent builder; ``build()`` yields one Column, ``apply(df)`` filters.

    Analog of ``FilterBuilder`` (``src/filters.rs:132-205``).
    """

    def __init__(self) -> None:
        self._conds: list[Column] = []

    # -- F1: event_types ∈ list (empty = pass) ------------------------------
    def event_types(self, types: Sequence[str], col: str = "event_type") -> "FilterBuilder":
        if types:
            self._conds.append(F.col(col).isin(list(types)))
        return self

    # -- F2: inclusive range (slot_range / n_tok range) ----------------------
    def value_range(self, col: str, lo=None, hi=None) -> "FilterBuilder":
        if lo is not None and hi is not None:
            self._conds.append(F.col(col).between(F.lit(lo), F.lit(hi)))
        elif lo is not None:
            self._conds.append(F.col(col) >= F.lit(lo))
        elif hi is not None:
            self._conds.append(F.col(col) <= F.lit(hi))
        return self

    # -- F3/F5: membership allowlist (empty = pass; NULL key = reject) -------
    def isin(self, col: str, values: Sequence) -> "FilterBuilder":
        if values:
            self._conds.append(F.col(col).isin(list(values)))
        return self

    def semi_join(self, df: DataFrame, keys: DataFrame, on: str) -> DataFrame:
        """F5 at scale: large membership lists become a broadcast
        left-semi join instead of a literal IN-list."""
        return df.join(F.broadcast(keys), on=on, how="left_semi")

    def anti_join(self, df: DataFrame, keys: DataFrame, on: str) -> DataFrame:
        """Blocklist variant (NOT EXISTS)."""
        return df.join(F.broadcast(keys), on=on, how="left_anti")

    # -- F4: type-dispatched min-amount with exemption ------------------------
    def min_amount(
        self,
        threshold: float,
        amount_by_type: dict[str, str],
        type_col: str = "event_type",
    ) -> "FilterBuilder":
        """Types in ``amount_by_type`` must have their amount column
        ≥ threshold (NULL amount ⇒ reject, ``filters.rs:95-98``);
        all other types pass untested (``filters.rs:99-105``)."""
        amt = None
        for etype, amount_col in amount_by_type.items():
            branch = F.when(F.col(type_col) == etype, F.col(amount_col))
            amt = branch if amt is None else amt.when(F.col(type_col) == etype, F.col(amount_col))
        relevant = F.col(type_col).isin(list(amount_by_type))
        cond = F.when(relevant, F.coalesce(amt >= F.lit(threshold), F.lit(False))).otherwise(
            F.lit(True)
        )
        self._conds.append(cond)
        return self

    # -- F6: custom predicate escape hatch ------------------------------------
    def custom(self, cond: Column) -> "FilterBuilder":
        self._conds.append(cond)
        return self

    # -- build / apply ---------------------------------------------------------
    def build(self) -> Column:
        cond = F.lit(True)
        for c in self._conds:
            cond = cond & c
        return cond

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.build())


def sequence_gate(
    source_allowlist: Sequence[str] = (),
    min_n_tok: int = 0,
    max_n_tok: int | None = None,
) -> Column:
    """The processor-gate analog (F7, ``dex_processor.rs:179-223``) for
    the sequences table: source ∈ allowlist (empty = pass) AND n_tok in
    range — the predicates of the flagship pipeline."""
    return (
        FilterBuilder()
        .isin("source", source_allowlist)
        .value_range("n_tok", min_n_tok if min_n_tok > 0 else None, max_n_tok)
        .build()
    )
