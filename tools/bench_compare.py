"""Diff two bench JSON lines: per-query ratios, regressions, new/lost
entries.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]

Accepts a raw ``bench.py`` output line ({"metric": ..., "queries":
{...}}), a driver BENCH_r*.json wrapper (the queries dict is found
under ``parsed``), or — for driver artifacts whose ``parsed`` is null
because only a 2000-char ``tail`` survived truncation — the rows
recoverable from that tail (the committed BENCH_FULL_r{N}.json from
``bench.py`` itself is the full-fidelity source; the tail fallback
exists for pre-r12 history).  Exit 1 when any shared query slowed by
more than
``threshold`` (default 1.3x) — meant as a quick gate, with the caveat
that single-host timings carry 30-40% variance (SCALE.md "Bench
methodology"); rerun before believing a single red number.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" in d:
        return d["queries"]
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    if isinstance(d.get("tail"), str):
        # truncated driver artifact: recover whatever rows the tail kept
        import re

        rows = {
            k: float(v)
            for k, v in re.findall(
                r'"([a-z_0-9]+)":\s*([0-9][0-9.]*)', d["tail"]
            )
            if k not in ("value", "sf")
        }
        if rows:
            print(
                f"note: {path} is a truncated driver artifact — "
                f"recovered {len(rows)} rows from its tail"
            )
            return rows
    raise SystemExit(f"{path}: no queries dict found")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    shared = sorted(set(old) & set(new))
    regressions = []
    for name in shared:
        if not old[name]:
            # sub-resolution old timing: no meaningful ratio — flag only
            # when the new time is non-trivially large
            if new[name] > 0.1:
                regressions.append((name, old[name], new[name], float("inf")))
            continue
        ratio = new[name] / old[name]
        if ratio > threshold:
            regressions.append((name, old[name], new[name], ratio))
    print(
        f"shared {len(shared)}: old {sum(old[n] for n in shared):.2f}s "
        f"-> new {sum(new[n] for n in shared):.2f}s"
    )
    for name in sorted(set(new) - set(old)):
        print(f"  new   {name}: {new[name]}s")
    for name in sorted(set(old) - set(new)):
        print(f"  lost  {name} (was {old[name]}s)")
    for name, o, n, r in sorted(regressions, key=lambda x: -x[3]):
        print(f"  SLOW  {name}: {o}s -> {n}s ({r:.2f}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
