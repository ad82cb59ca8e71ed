"""Physical-plan fingerprint baseline for the whole registry (round 7;
two-scale since round 12).

`tests/test_plans.py` asserts ~30 hand-picked plan properties; this tool
extends the guard to EVERY registered query: each query's formatted
physical plan is reduced to an operator-count fingerprint (how many
Exchanges, BroadcastHashJoins, SortMergeJoins, Windows, ...), the full
map is committed as `PLAN_FINGERPRINTS.json`, and `--check` fails when
any query's shape drifts from the baseline — the cheap tripwire for the
regressions that matter at 100 TB (a broadcast silently degrading to a
sort-merge join, a new exchange sneaking into a single-shuffle pipeline)
which value-correctness gates can never see.

The baseline carries one fingerprint PER SCALE (sf0.001 and sf0.01):
plan shapes legitimately depend on scale — at sf0.001 single-chunk
pruning can hide a Window that sf0.01 exposes, and AQE may trade a
broadcast for a sort-merge join as a side grows (VERDICT r11 Next #3).
Pinning only the small scale made exactly those scale-dependent shapes
invisible; now a drift at EITHER scale trips the wire.

Counts are taken from the formatted explain's node list (`(n) OpName`)
so cosmetic changes (column ids, statistics) never flag; genuine shape
changes always do.  Ordering/naming of subqueries is normalized away by
counting, not sequencing.

Usage:
    python tools/plan_fingerprints.py --write [scale ...]  # (re)baseline
    python tools/plan_fingerprints.py --check [scale ...]  # exit 1 on drift

`scale` is a key from SCALES (`sf0.001`, `sf0.01`) or an sf_dir path;
default is all scales.  A deliberate plan improvement is recorded by
re-running --write and committing the diff — the review of that diff IS
the plan review.
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

# scale key -> sf_dir.  The baseline stores fingerprints per key.
SCALES = {
    "sf0.001": "/root/testdata/sf0.001",
    "sf0.01": "/root/testdata/sf0.01",
}

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
    # r16 (ADVICE r15): fingerprint with materialization OFF so the
    # tripwire covers the full pre-checkpoint plan (an eager
    # localCheckpoint collapses everything upstream to 'Scan
    # ExistingRDD', hiding the scans/joins/exchanges inside ~260
    # checkpoint boundaries) — and so building fingerprints never
    # executes the materialization jobs eager checkpoints imply.
    os.environ["SPARK_GRAFT_MATERIALIZE"] = "off"

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
    # queries that persist intermediates would otherwise accumulate
    # cached partitions across the 400+-query sweep
    spark.catalog.clearCache()
    return out


def _resolve_scales(args: list[str]) -> dict[str, str]:
    if not args:
        return dict(SCALES)
    out: dict[str, str] = {}
    for a in args:
        if a in SCALES:
            out[a] = SCALES[a]
        else:  # an sf_dir path: key by basename so baselines line up
            out[os.path.basename(a.rstrip("/"))] = a
    return out


def _load_baseline() -> dict[str, dict[str, dict[str, int]]]:
    with open(BASELINE) as f:
        raw = json.load(f)
    if "scales" in raw:
        return raw["scales"]
    # v1 (round 7-11) was a flat query map pinned at sf0.001
    return {"sf0.001": raw}


def _diff_scale(base: dict, current: dict, scale: str) -> int:
    n_drift = 0
    for name in sorted(set(base) | set(current)):
        b, c = base.get(name), current.get(name)
        if b == c:
            continue
        n_drift += 1
        if b is None:
            print(f"[new-query]  {scale} {name}: not in baseline — rerun --write")
            continue
        if c is None:
            print(f"[gone]       {scale} {name}: in baseline but not registered")
            continue
        ops = sorted(set(b) | set(c))
        diff = ", ".join(
            f"{op}: {b.get(op, 0)} -> {c.get(op, 0)}"
            for op in ops
            if b.get(op, 0) != c.get(op, 0)
        )
        print(f"[plan-drift] {scale} {name}: {diff}")
    return n_drift


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "--check"
    scales = _resolve_scales(sys.argv[2:])
    current: dict[str, dict[str, dict[str, int]]] = {}
    for key, sf_dir in scales.items():
        current[key] = build_all(sf_dir)
    errs = [
        (k, n)
        for k, m in current.items()
        for n, fp in m.items()
        if "__error__" in fp
    ]
    if errs:
        for k, n in errs:
            print(f"[build-err] {k} {n}: {current[k][n].get('__msg__')}")
        return 1
    if mode == "--write":
        if os.path.exists(BASELINE):
            merged = _load_baseline()
        else:
            merged = {}
        merged.update(current)
        with open(BASELINE, "w") as f:
            json.dump({"scales": merged}, f, indent=0, sort_keys=True)
        n = sum(len(m) for m in current.values())
        print(f"wrote {BASELINE} ({n} fingerprints across {sorted(current)})")
        return 0
    if not os.path.exists(BASELINE):
        print(f"no baseline at {BASELINE} — run --write first")
        return 1
    base = _load_baseline()
    n_drift, n_checked = 0, 0
    for key in sorted(current):
        if key not in base:
            print(f"[no-baseline] scale {key} absent from baseline — rerun --write")
            n_drift += 1
            continue
        n_drift += _diff_scale(base[key], current[key], key)
        n_checked += len(current[key])
    print(f"\n{n_drift} fingerprints drifted from baseline ({n_checked} checked)")
    return 1 if n_drift else 0


if __name__ == "__main__":
    raise SystemExit(main())
