"""Empirical scale-slope gate (VERDICT r6 item 4).

Static plan audits argue every headline operator is linear-ish in corpus
size; this tool PROVES it on the clock.  It runs the headline bench at
two scale factors (default sf0.01 and sf0.1 — a 10x corpus ratio),
subtracts the measured per-query scheduling floor (Spark's fixed
job-submission + task-launch cost, which dominates toy-scale timings and
would otherwise hide a superlinear slope), and flags any query whose
floor-adjusted wall-clock ratio exceeds ``SLOPE_TOLERANCE`` x the corpus
ratio — the cheap empirical catch for an accidentally quadratic plan.

Method per query: ``slope = (t_big - floor) / max(t_small - floor,
MIN_BASE)``; a query passes when ``slope <= corpus_ratio *
SLOPE_TOLERANCE``.  ``MIN_BASE`` guards the division for queries whose
sf0.01 runtime is entirely scheduling floor (slope is then meaningless
and reported as such, status "floor").  Timings are min-of-2 noop-sink
materializations, mirroring bench.py; build-once layout costs (bucketed
tables, IVF-PQ index) are paid off-clock per scale factor, exactly as
bench.py does.

Usage:
    python tools/bench_slope.py [small_dir big_dir] [--out report.json]

Exit 1 if any query exceeds the bound (status "superlinear").
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLOPE_TOLERANCE = 1.5
# Below this floor-adjusted sf0.01 runtime, the measurement is pure
# scheduling noise and the ratio carries no signal (0.05s of real work
# at sf0.01 is ~2 partitions of a 32-way stage).
MIN_BASE = 0.05


def _sf_of(path: str) -> float | None:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else None


def measure_floor(spark) -> float:
    """Scheduling floor: min-of-5 noop materializations of a 1-row
    DataFrame — job submission, scheduling, and sink overhead with no
    meaningful compute or IO."""
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def run_headline(spark, sf_dir: str) -> dict[str, float]:
    from bench import HEADLINE
    from opentimes_spark.plans.queries import BENCH_ONLY, QUERIES

    # warm JVM + parquet footers; pay build-once layout off the clock
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    BENCH_ONLY["join_region_revenue_bucketed"](spark, sf_dir)
    QUERIES["sim_ivfpq_topk"](spark, sf_dir)
    # SRP's wide signature-literal plan pays ~5s of one-time codegen the
    # first time it compiles in a session (measured 6.6s -> 1.5s -> 1.1s);
    # warm it so the slope gate measures the probe, not the compiler
    # (VERDICT r7 item 6)
    QUERIES["sim_srp_lsh_topk"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name) or BENCH_ONLY[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    return out


def main() -> int:
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    small_dir = args[0] if args else "/root/testdata/sf0.01"
    big_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    sf_small, sf_big = _sf_of(small_dir), _sf_of(big_dir)
    corpus_ratio = (sf_big / sf_small) if sf_small and sf_big else 10.0
    bound = corpus_ratio * SLOPE_TOLERANCE

    from opentimes_spark.session import get_spark

    spark = get_spark("bench-slope")
    spark.sparkContext.setLogLevel("ERROR")

    floor = measure_floor(spark)
    t_small = run_headline(spark, small_dir)
    t_big = run_headline(spark, big_dir)

    rows, n_bad = {}, 0
    for name in t_small:
        a = t_small[name] - floor
        b = t_big[name] - floor
        if a < MIN_BASE and b < MIN_BASE:
            status, slope = "floor", None  # both timings are pure overhead
        else:
            slope = round(b / max(a, MIN_BASE), 2)
            status = "ok" if slope <= bound else "superlinear"
        if status == "superlinear":
            n_bad += 1
        rows[name] = {
            "t_small": t_small[name],
            "t_big": t_big[name],
            "slope": slope,
            "status": status,
        }
        flag = "" if status != "superlinear" else "  <-- EXCEEDS BOUND"
        print(
            f"{name:40s} {t_small[name]:7.3f}s {t_big[name]:7.3f}s "
            f"slope={slope if slope is not None else '—':>6} {status}{flag}"
        )

    report = {
        "small": small_dir,
        "big": big_dir,
        "corpus_ratio": corpus_ratio,
        "slope_bound": bound,
        "scheduling_floor_sec": round(floor, 3),
        "superlinear": n_bad,
        "queries": rows,
    }
    print(
        f"\nfloor={floor:.3f}s  bound={bound:.1f}x  "
        f"{n_bad} superlinear of {len(rows)}"
    )
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
