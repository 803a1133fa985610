"""Calibration-gated headline re-measure (round-4 verdict item 3).

Question to settle: the r4 driver session read the headline batch suite
at 15.5 s (flagship 4.64 s) vs r3's 12.2 s (flagship 2.92-3.08 s) — VM
noise burst, or a real regression?  Single sessions on this box are not
comparable (BENCH/BASELINE.md documents ±20% multi-minute bursts and
3x wall spreads on identical cells), so this script only measures when
the box is demonstrably quiet:

1. run bench.py's pure-CPU calibration (range + xxhash agg, no I/O,
   local[CPUS]) repeatedly; the box is "quiet" once >= MIN_ATTEMPTS
   samples exist and the LATEST lands within GATE_PCT of the session
   best (a noise burst inflates the latest sample and fails the gate);
2. immediately (same window) run the 9 headline queries, two passes,
   best-of-2 per query — the exact bench.py protocol;
3. write BENCH/calibrated_headline.json: calibration stats + per-query
   times + the flagship verdict vs the r3 band.  bench.py renders it
   into BENCH/BASELINE.md (like the amortization section), so the
   paragraph survives bench rewrites.

Usage: python scripts/calibrated_headline.py  (~2-4 min when quiet;
gives up after MAX_ATTEMPTS calibrations if the box never settles).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
GATE_PCT = 0.05
MIN_ATTEMPTS = 3
MAX_ATTEMPTS = 12
# Reference per-query session: r3's builder-local bench record.  The
# verdict is a RATIO test, not an absolute band: this VM's quiet-window
# level itself drifts across days (no absolute calibration anchor was
# recorded before round 5), but a CODE regression in the flagship would
# inflate flagship's now/r3 ratio relative to the other eight queries'
# (none of which changed since r1-r3) — if flagship moves WITH the
# pack, the pack is the box.
R3_QUERIES_PATH = "BENCH_r03_local.json"


def _calibrate(spark) -> float:
    from bench import run_cpu_calibration

    return run_cpu_calibration(spark, CPUS)


def main() -> int:
    import __spark_entry__ as E
    from bitquery_kafka_streams_rust_spark.session import get_spark

    # resolve + load the r3 reference BEFORE the multi-minute gated
    # measurement: a missing file must fail fast, not discard a
    # completed suite run
    r3_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), R3_QUERIES_PATH
    )
    r3 = json.load(open(r3_path))

    spark = get_spark(app_name="calibrated-headline", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    cals: list[float] = []
    gated = False
    for i in range(MAX_ATTEMPTS):
        c = _calibrate(spark)
        cals.append(round(c, 3))
        best = min(cals)
        print(f"[cal] attempt {i+1}: {c:.3f}s (session best {best:.3f}s)")
        if len(cals) >= MIN_ATTEMPTS and c <= best * (1 + GATE_PCT):
            gated = True
            break
        time.sleep(5)
    if not gated:
        print("[cal] box never settled — refusing to publish a headline number")
    q_times: dict[str, float] = {}
    if gated:
        qs = E.queries()
        from bench import HEADLINE

        for _pass in range(2):
            for name in HEADLINE:
                t0 = time.time()
                qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                if name not in q_times or dt < q_times[name]:
                    q_times[name] = dt
        # post-check: the window stayed quiet through the suite
        post = _calibrate(spark)
        print(f"[cal] post-suite calibration {post:.3f}s")
    spark.stop()
    if not gated:
        return 1

    r3q = r3.get("parsed", r3).get("queries", r3.get("queries", {}))
    ratios = {
        q: round(q_times[q] / r3q[q], 3) for q in q_times if r3q.get(q)
    }
    others = sorted(v for q, v in ratios.items() if q != "flagship_pipeline")
    # true median (even-length lists average the middle pair — the
    # upper-middle element alone would bias the <= med*1.15 gate high)
    med = round(statistics.median(others), 3) if others else None
    flag_r = ratios.get("flagship_pipeline")
    if med is None or flag_r is None:
        verdict = "no r3 reference overlap — ratios unavailable"
    elif flag_r <= med * 1.15:
        verdict = (
            f"environment, confirmed: flagship's now/r3 ratio {flag_r} sits "
            f"inside the untouched queries' ratio spread (median {med}, "
            f"session range {others[0]}-{others[-1]}) — the suite inflated "
            "together (box-level slowdown), so the r4 flagship drift is not "
            "a code regression"
        )
    else:
        verdict = (
            f"flagship-specific regression suspected: its now/r3 ratio "
            f"{flag_r} exceeds the untouched-query median {med} by >15% — "
            "bisect session-conf drift / datagen views"
        )
    out = {
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "calibration_attempts_s": cals,
        "calibration_gate": f"latest within {int(GATE_PCT*100)}% of session best, "
                            f">={MIN_ATTEMPTS} attempts",
        "post_suite_calibration_s": round(post, 3),
        "queries": q_times,
        "total_s": round(sum(q_times.values()), 3),
        "now_over_r3_ratios": ratios,
        "untouched_median_ratio": med,
        "verdict": verdict,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/calibrated_headline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
