"""Physical-plan fingerprint baseline for the whole registry (round 7).

`tests/test_plans.py` asserts ~30 hand-picked plan properties; this tool
extends the guard to EVERY registered query: each query's formatted
physical plan is reduced to an operator-count fingerprint (how many
Exchanges, BroadcastHashJoins, SortMergeJoins, Windows, ...), the full
map is committed as `PLAN_FINGERPRINTS.json`, and `--check` fails when
any query's shape drifts from the baseline — the cheap tripwire for the
regressions that matter at 100 TB (a broadcast silently degrading to a
sort-merge join, a new exchange sneaking into a single-shuffle pipeline)
which value-correctness gates can never see.

Counts are taken from the formatted explain's node list (`(n) OpName`)
so cosmetic changes (column ids, statistics) never flag; genuine shape
changes always do.  Ordering/naming of subqueries is normalized away by
counting, not sequencing.

Usage:
    python tools/plan_fingerprints.py --write [sf_dir]   # (re)baseline
    python tools/plan_fingerprints.py --check [sf_dir]   # exit 1 on drift

A deliberate plan improvement is recorded by re-running --write and
committing the diff — the review of that diff IS the plan review.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLAN_FINGERPRINTS.json",
)

_NODE = re.compile(r"^\(\d+\)\s+([A-Za-z][A-Za-z0-9 ]*?)(?:\s*\[codegen id : \d+\])?\s*$")


def fingerprint(df) -> dict[str, int]:
    """Operator-name → count over the formatted physical plan's node
    list.  AQE wrapper and reused-subtree references count too — a
    ReusedExchange appearing where a fresh Exchange used to be IS a
    shape change worth seeing."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    counts: dict[str, int] = {}
    for line in buf.getvalue().splitlines():
        m = _NODE.match(line.strip())
        if m:
            op = m.group(1).strip()
            counts[op] = counts.get(op, 0) + 1
    return counts


def build_all(sf_dir: str) -> dict[str, dict[str, int]]:
    import __spark_entry__ as entrymod
    from opentimes_spark.session import get_spark

    spark = get_spark("plan-fingerprints")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, int]] = {}
    for name, fn in sorted(entrymod.queries().items()):
        try:
            out[name] = fingerprint(fn(spark, sf_dir))
        except Exception as e:  # surface, don't mask
            out[name] = {"__error__": 1, "__msg__": str(e)[:200]}  # type: ignore[dict-item]
    return out


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "--check"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    current = build_all(sf_dir)
    errs = [n for n, fp in current.items() if "__error__" in fp]
    if errs:
        for n in errs:
            print(f"[build-err] {n}: {current[n].get('__msg__')}")
        return 1
    if mode == "--write":
        with open(BASELINE, "w") as f:
            json.dump(current, f, indent=0, sort_keys=True)
        print(f"wrote {BASELINE} ({len(current)} queries)")
        return 0
    if not os.path.exists(BASELINE):
        print(f"no baseline at {BASELINE} — run --write first")
        return 1
    with open(BASELINE) as f:
        base = json.load(f)
    n_drift = 0
    for name in sorted(set(base) | set(current)):
        b, c = base.get(name), current.get(name)
        if b == c:
            continue
        n_drift += 1
        if b is None:
            print(f"[new-query]  {name}: not in baseline — rerun --write")
            continue
        if c is None:
            print(f"[gone]       {name}: in baseline but not registered")
            continue
        ops = sorted(set(b) | set(c))
        diff = ", ".join(
            f"{op}: {b.get(op, 0)} -> {c.get(op, 0)}"
            for op in ops
            if b.get(op, 0) != c.get(op, 0)
        )
        print(f"[plan-drift] {name}: {diff}")
    print(f"\n{n_drift} queries drifted from baseline ({len(current)} checked)")
    return 1 if n_drift else 0


if __name__ == "__main__":
    raise SystemExit(main())
