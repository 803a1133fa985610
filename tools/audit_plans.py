"""Physical-plan hygiene audit over every contract query.

For each ``queries()`` entry (built against the given SF dir, default
sf0.01) this prints: number of shuffle Exchanges, join strategies,
whether any cartesian/broadcast-nested-loop join appears, whether any
window runs on a single partition (a global sort through ONE task —
the 10^12-row scale killer), and the parquet scans' pushed filters /
read schemas (pruning evidence).

Usage:  python tools/audit_plans.py [sf_dir] [query ...]

Exit code 1 if any query has a cartesian product, a nested-loop join
not in the allowlist below (pair generation must go through
band/bucket/gram equi-joins, never O(n^2)), or an unallowlisted
single-partition window.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# Queries where a BroadcastNestedLoopJoin is the intended plan: the
# broadcast side is a handful of query vectors and the "join" is an
# intentional scored scan (brute-force ANN baseline).
NESTED_LOOP_OK = {"emb_cosine_topk", "emb_ann_recall", "emb_retrieval_eval"}

# Queries where a window over Exchange SinglePartition is intended
# because its input is an aggregated METADATA frame (|keys| / n_strata
# rows), never the corpus: rollup_with_share's market-share sum runs
# over the per-key aggregate (one corpus scan; the broadcast-scalar
# alternative costs a second full scan).  Corpus-input global windows
# (the 10^12-row scale killer) still fail the audit.
GLOBAL_WINDOW_OK: set[str] = {
    "events_rollup_share",
    # doc_hybrid_rrf: rank_lex's window input is the 30-row BM25
    # candidate list (already collapsed by a TakeOrdered heap), never
    # the corpus — see retrieval.add_rank
    "doc_hybrid_rrf",
    # seq_zipf_fit: the rank window's input is the unigram AGGREGATE —
    # vocab-bounded (≤ 50,257 rows) metadata, never the corpus
    "seq_zipf_fit",
    # seq_heaps_fit: the cumulative window's input is the 16-row batch
    # aggregate (novelty_curve output) — metadata, never the corpus
    "seq_heaps_fit",
}


def _single_partition_window(plan: str) -> bool:
    """True when a Window/WindowGroupLimit operator's child exchange is
    ``Exchange SinglePartition`` — the printed tree lists a node's
    subtree below it, so the first Exchange after the window line is
    its input distribution (Sort/Project lines may sit between)."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if not re.search(r"\b(Window|WindowGroupLimit|RunningWindowFunction)\b", ln):
            continue
        for nxt in lines[i + 1:]:
            if "Exchange" in nxt:
                if "SinglePartition" in nxt:
                    return True
                break
            # substring match on purpose: real node names have no word
            # boundary before the token (SortMergeJoin, HashAggregate,
            # FileScan), so \b-anchored patterns never fired and the
            # scan could attribute a sibling subtree's Exchange to the
            # window
            if re.search(r"Join|Aggregate|Scan", nxt):
                break  # left the window's input chain
    return False


def main() -> None:
    import __spark_entry__ as E
    from bitquery_kafka_streams_rust_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="plan-audit", master="local[8]")

    bad: list[str] = []
    qs = E.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERROR building plan: {e}")
            bad.append(name)
            continue
        n_shuffle = len(re.findall(r"(?<!Broadcast)Exchange ", plan))
        n_bcast = len(re.findall(r"BroadcastExchange", plan))
        joins = sorted(set(re.findall(r"(\w+Join\w*)", plan)))
        cartesian = "CartesianProduct" in plan
        bnl = "BroadcastNestedLoopJoin" in plan
        spw = _single_partition_window(plan)
        scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        n_cols = sum(s.count(":") for s in scans)
        flag = ""
        if cartesian or (bnl and name not in NESTED_LOOP_OK):
            flag = "  << CARTESIAN/NLJ"
            bad.append(name)
        if spw and name not in GLOBAL_WINDOW_OK:
            flag += "  << SINGLE-PARTITION WINDOW"
            bad.append(name)
        print(
            f"{name:28s} shuffles={n_shuffle:2d} bcast={n_bcast}"
            f" scans={len(scans)} scan_cols={n_cols}"
            f" joins={','.join(joins) or '-'}"
            f" pushed={'y' if any(p.strip() for p in pushed) else '-'}{flag}"
        )
    spark.stop()
    if bad:
        print(f"\nFLAGGED: {bad}")
        sys.exit(1)
    print("\nplan audit clean")


if __name__ == "__main__":
    main()
