#!/usr/bin/env python
"""Driver-window staleness ledger and rotation proposal.

The driver verifies only the FIRST 50 registry entries per round
(``plans/registry.py`` DRIVER_WINDOW), so cumulative correctness
coverage depends on rotating every query back into the window before
its last green driver row ages out. This tool makes that accounting
mechanical instead of a hand-maintained comment:

    python tools/window_planner.py            # ledger + proposal
    python tools/window_planner.py --json     # machine-readable ledger

It reads every ``CORRECTNESS_r*.json`` in the repo root (the driver's
per-round records), joins them against the current registry, and
prints:

1. per-query last-green round (never-checked queries first),
2. a staleness histogram,
3. a proposed next-round window: all never-checked queries, then the
   stalest greens, truncated/padded to 50 — the same policy every
   round's hand rotation has followed (new evidence first, oldest
   refresh next). Code-change sentinels are the planner's ONE manual
   input: pass them with --sentinel NAME (repeatable) and they are
   placed after the never-checked block.

The proposal is advisory — DRIVER_WINDOW stays an explicit literal in
registry.py so the window is reviewable in diffs — but the ledger is
the ground truth for "what ages out next round".
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def ledger() -> tuple[dict[str, int], int]:
    """(query -> latest round with a green driver row, latest round
    seen). A row counts as green only if all three driver checks
    matched."""
    last: dict[str, int] = {}
    latest = 0
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path)
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        for name, row in json.load(open(path)).items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False  # rows-only rows
                and not row.get("err")
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last, latest


def main(argv: list[str]) -> int:
    sentinels: list[str] = []
    as_json = False
    i = 0
    while i < len(argv):
        if argv[i] == "--sentinel":
            sentinels.append(argv[i + 1])
            i += 2
        elif argv[i] == "--json":
            as_json = True
            i += 1
        else:
            print(__doc__)
            return 2

    from mapreduceframework_spark.plans.registry import all_queries

    names = list(all_queries().keys())
    last, latest = ledger()
    never = [n for n in names if n not in last]
    greens = sorted(
        (n for n in names if n in last), key=lambda n: (last[n], n)
    )

    if as_json:
        print(
            json.dumps(
                {
                    "latest_round": latest,
                    "registry": len(names),
                    "never_checked": never,
                    "last_green": {n: last[n] for n in greens},
                }
            )
        )
        return 0

    print(f"registry: {len(names)} queries; driver records through "
          f"round {latest}")
    print(f"\nnever driver-checked ({len(never)}):")
    for n in never:
        print(f"  {n}")
    hist: dict[int, int] = {}
    for n in greens:
        hist[latest - last[n]] = hist.get(latest - last[n], 0) + 1
    print("\nstaleness histogram (rounds since last green):")
    for age in sorted(hist):
        print(f"  {age:>2} rounds: {hist[age]:>3} queries")

    bad = [s for s in sentinels if s not in names]
    if bad:
        print(f"\nERROR: unknown sentinel(s): {bad}")
        return 1
    proposal: list[str] = []
    for n in never + sentinels:
        if n not in proposal:
            proposal.append(n)
    for n in greens:
        if len(proposal) >= WINDOW:
            break
        if n not in proposal:
            proposal.append(n)
    print(f"\nproposed next window ({len(proposal)} of {WINDOW}):")
    for n in proposal:
        tag = (
            "never-checked" if n in never
            else "sentinel" if n in sentinels
            else f"last green r{last[n]}"
        )
        print(f"  {n}  [{tag}]")
    overflow = len(never) + len(sentinels) - WINDOW
    if overflow > 0:
        print(f"\nWARNING: {overflow} never-checked/sentinel rows do not "
              f"fit one window — plan two rounds.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
