"""Registry-freeze discipline guard (round 15; VERDICT r14 #2).

Round 14's one blemish: after the gate artifacts (CORRECTNESS / STRESS /
PLAN_FINGERPRINTS) were frozen for the round, a snapshot commit added 4
more queries (registry 496 -> 500) that bypassed the entire gate ladder,
so `pytest tests/` was red at HEAD for a full round.  The convention
("nothing enters the registry after the gates run") was prose; this
makes it a check.

Run this BEFORE any end-of-round snapshot or registry-touching commit:

    python tools/freeze_check.py            # full guard (registry + plans)
    python tools/freeze_check.py --fast     # registry tripwire only

It refuses (exit 1, loud message) when either:

  1. `pytest tests/test_registry.py` is red — in particular the
     uncertified-beyond-the-gate-window tripwire, which fires exactly
     when a query has been registered without a driver/gate row and
     does not lead the certification window; or
  2. `tools/plan_fingerprints.py --check` reports drift or a missing
     baseline — a registered query with no committed plan fingerprint
     is a post-freeze addition by definition.

Wire-up: the round ladder (SCALE.md "round ladder" section) runs this
as its final step before `git commit`; a red guard means the commit
does not happen until the new names are either (a) pushed through the
full ladder (fingerprint --write, four stress corpora, slope row,
fronted in the driver window) or (b) reverted out of the registry.
A deliberate red dry-run is recorded in tests/test_freeze_guard.py so
the refusal path itself stays tested.
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _step(label: str, argv: list[str]) -> bool:
    print(f"[freeze-check] {label}: {' '.join(argv)}", flush=True)
    proc = subprocess.run(argv, cwd=ROOT)
    ok = proc.returncode == 0
    print(f"[freeze-check] {label}: {'OK' if ok else 'RED'}", flush=True)
    return ok


def main() -> int:
    fast = "--fast" in sys.argv[1:]
    ok = _step(
        "registry tripwire",
        [sys.executable, "-m", "pytest", "tests/test_registry.py", "-q"],
    )
    if ok and not fast:
        ok = _step(
            "plan fingerprints",
            [sys.executable, "tools/plan_fingerprints.py", "--check"],
        )
    if not ok:
        print(
            "\n[freeze-check] REFUSING: the registry has entries that "
            "bypassed the gate ladder (or a plan baseline is missing/"
            "drifted).  Do NOT commit a snapshot at this HEAD — either "
            "run the full ladder for the new names or revert them.",
            file=sys.stderr,
        )
        return 1
    print("\n[freeze-check] green — safe to snapshot/commit")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
