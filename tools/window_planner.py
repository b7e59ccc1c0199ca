#!/usr/bin/env python
"""Driver-window staleness ledger and rotation proposal.

The driver verifies only the FIRST 50 registry entries per round
(``plans/registry.py`` DRIVER_WINDOW), so cumulative correctness
coverage depends on rotating every query back into the window before
its last green driver row ages out. This tool makes that accounting
mechanical instead of a hand-maintained comment:

    python tools/window_planner.py            # ledger + proposal
    python tools/window_planner.py --json     # machine-readable ledger
    python tools/window_planner.py --plan 6   # + project 6 future
                                              #   rounds of rotation

It reads every ``CORRECTNESS_r*.json`` in the repo root (the driver's
per-round records), joins them against the current registry, and
prints:

1. per-query last-green round (never-checked queries first),
2. a staleness histogram,
3. a proposed next-round window: all never-checked queries, then
   code-change sentinels, then the stalest greens, truncated/padded
   to 50 — the same policy every round's hand rotation has followed
   (new evidence first, changed code next, oldest refresh last).

Code-change sentinels are detected AUTOMATICALLY: a green query whose
decorated definition (decorator + oracle SQL + body, extracted with
ast from ``git show <round-commit>:<module>``) differs from the
current source is treated as rewritten-since-last-green and promoted
ahead of the staleness refreshes — the round-8 failure mode this
guards was four rewrites whose slots depended on the operator
remembering to pass ``--sentinel`` for each. The detection is
function-granular but module-scoped: a change to a shared helper in
another file (operators/, streaming/) or to a module-level constant
the oracle interpolates does NOT flag its callers, so ``--sentinel
NAME`` (repeatable) remains as the manual override for those.

The proposal is advisory — DRIVER_WINDOW stays an explicit literal in
registry.py so the window is reviewable in diffs — but the ledger is
the ground truth for "what ages out next round".
"""

from __future__ import annotations

import ast
import functools
import glob
import inspect
import json
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

WINDOW = 50


def _has_query_decorator(node: ast.FunctionDef, query_name: str) -> bool:
    """True if ``node`` carries ``@query("<query_name>", ...)`` — the
    registration that makes a function THE definition of that query."""
    for dec in node.decorator_list:
        if (
            isinstance(dec, ast.Call)
            and isinstance(dec.func, ast.Name)
            and dec.func.id == "query"
            and dec.args
            and isinstance(dec.args[0], ast.Constant)
            and dec.args[0].value == query_name
        ):
            return True
    return False


def _fn_fingerprint(
    src: str, fn_name: str, require_query: str | None = None
) -> str | None:
    """Normalized fingerprint of ``fn_name``'s decorated definition in
    ``src`` (decorators — including the @query(...) call whose oracle
    SQL is the other half of the contract — plus the body), or None if
    absent. Compared as a docstring-stripped ``ast.dump`` so
    formatting and comment/docstring edits don't flag, only changes to
    executable structure or literal SQL do. With ``require_query``,
    only a definition carrying ``@query("<require_query>", ...)``
    matches — a same-named undecorated helper is NOT that query."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == fn_name:
            if require_query is not None and not _has_query_decorator(
                node, require_query
            ):
                continue
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node.body = body[1:]
            return ast.dump(node)
    return None


@functools.lru_cache(maxsize=None)
def _git_show(commit: str, relpath: str) -> str | None:
    r = subprocess.run(
        ["git", "show", f"{commit}:{relpath}"],
        capture_output=True,
        text=True,
        cwd=_REPO,
    )
    return r.stdout if r.returncode == 0 else None


@functools.lru_cache(maxsize=None)
def _round_commit(rnd: int) -> str | None:
    """The commit that recorded round ``rnd``'s driver evidence (the
    last one touching its CORRECTNESS file) — the point in history a
    query's green row vouches for."""
    r = subprocess.run(
        [
            "git", "log", "--format=%H", "-1", "--",
            f"CORRECTNESS_r{rnd:02d}.json",
        ],
        capture_output=True,
        text=True,
        cwd=_REPO,
    )
    lines = r.stdout.strip().splitlines()
    return lines[0] if r.returncode == 0 and lines else None


@functools.lru_cache(maxsize=None)
def _tree_py_files(commit: str) -> tuple[str, ...]:
    r = subprocess.run(
        [
            "git", "ls-tree", "-r", "--name-only", commit,
            "mapreduceframework_spark",
        ],
        capture_output=True,
        text=True,
        cwd=_REPO,
    )
    if r.returncode != 0:
        return ()
    return tuple(p for p in r.stdout.splitlines() if p.endswith(".py"))


def _old_fingerprint(
    commit: str, relpath: str, fn_name: str, query_name: str
) -> str | None:
    """``_fn_fingerprint`` of ``fn_name`` as of ``commit`` — tried in
    ``relpath`` first, then every other package module (queries have
    been moved between modules in pure-split refactors; a move alone
    is not a semantic change). The cross-module fallback requires the
    found definition to carry ``@query("<query_name>", ...)`` so an
    unrelated same-named helper in some other old module cannot make a
    genuinely rewritten query compare 'unchanged' and silently drop
    out of the auto-sentinel list."""
    src = _git_show(commit, relpath)
    if src is not None:
        # Same-path lookup holds the same decorator requirement as the
        # cross-module fallback: a same-named undecorated helper in the
        # OLD version of the query's own module must not make a
        # rewritten query fingerprint as 'unchanged'. Older rounds
        # (pre-r9 window discipline) sometimes staged the decorator in
        # a wrapper, so fall back to the unrestricted match only when
        # no decorated form exists in the old module at all.
        fp = _fn_fingerprint(src, fn_name, require_query=query_name)
        if fp is None:
            fp = _fn_fingerprint(src, fn_name)
        if fp is not None:
            return fp
    for other in _tree_py_files(commit):
        if other == relpath:
            continue
        src = _git_show(commit, other)
        if src is None:
            continue
        fp = _fn_fingerprint(src, fn_name, require_query=query_name)
        if fp is not None:
            return fp
    return None


def auto_sentinels(last: dict[str, int]) -> dict[str, int]:
    """Green queries whose decorated definition (normalized AST)
    differs from what their last green round verified ->
    {name: last_green_round}. A definition absent from the old tree
    counts as changed (conservative)."""
    from mapreduceframework_spark.plans.registry import REGISTRY

    flagged: dict[str, int] = {}
    cur_cache: dict[str, str] = {}
    for name, rnd in last.items():
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        fn = inspect.unwrap(spec.fn)
        path = fn.__code__.co_filename
        relpath = os.path.relpath(path, _REPO)
        commit = _round_commit(rnd)
        if commit is None:
            continue
        if relpath not in cur_cache:
            with open(path) as f:
                cur_cache[relpath] = f.read()
        cur_fp = _fn_fingerprint(cur_cache[relpath], fn.__name__)
        if cur_fp is None:
            continue  # dynamically built — nothing to diff
        if _old_fingerprint(commit, relpath, fn.__name__, name) != cur_fp:
            flagged[name] = rnd
    return flagged


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


def simulate_rotations(
    last: dict[str, int], names: list[str], latest: int, rounds: int
) -> list[dict]:
    """Project ``rounds`` future rounds of stalest-first rotation
    (assuming every window row passes and no new queries or code
    changes land) and return per-round summaries. This is the
    steady-state schedule: with R registered queries and a W-slot
    window the refresh period is ceil(R / W) rounds, and the
    projection shows exactly when the max-staleness plateau is
    reached — the number the 'can the registry afford another query'
    decision needs."""
    sim = dict(last)
    out = []
    for step in range(1, rounds + 1):
        rnd = latest + step
        order = sorted(names, key=lambda n: (sim.get(n, -1), n))
        window = order[:WINDOW]
        # Pre-refresh oldest green among the refreshed cohort (-1 =
        # a never-checked row gained first evidence this round).
        window_oldest = min(
            (sim.get(n, -1) for n in window), default=rnd
        )
        for n in window:
            sim[n] = rnd
        # Never-checked rows still outside every simulated window keep
        # sentinel -1, i.e. age rnd+1 — deliberately larger than any
        # genuine staleness so the overflow case stays visible instead
        # of crashing (the >WINDOW-never-checked scenario the WARNING
        # in main() anticipates).
        ages = [rnd - sim.get(n, -1) for n in names]
        hist: dict[int, int] = {}
        for a in ages:
            hist[a] = hist.get(a, 0) + 1
        out.append(
            {
                "round": rnd,
                "window_oldest": window_oldest,
                "max_staleness": max(ages),
                "histogram": dict(sorted(hist.items())),
            }
        )
    return out


def main(argv: list[str]) -> int:
    sentinels: list[str] = []
    as_json = False
    plan_rounds = 0
    i = 0
    while i < len(argv):
        if argv[i] == "--sentinel":
            if i + 1 >= len(argv):
                print(__doc__)
                return 2
            sentinels.append(argv[i + 1])
            i += 2
        elif argv[i] == "--json":
            as_json = True
            i += 1
        elif argv[i] == "--plan":
            try:
                plan_rounds = int(argv[i + 1])
            except (IndexError, ValueError):
                print(__doc__)
                return 2
            i += 2
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
                    "auto_sentinels": auto_sentinels(last),
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
    auto = auto_sentinels(last)
    if auto:
        print(f"\nauto-sentinels (source changed since last green):")
        for n in sorted(auto):
            print(f"  {n}  [last green r{auto[n]}]")
    proposal: list[str] = []
    for n in never + sentinels + sorted(auto):
        if n not in proposal:
            proposal.append(n)
    for n in greens:
        if len(proposal) >= WINDOW:
            break
        if n not in proposal:
            proposal.append(n)
    proposal = proposal[:WINDOW]
    print(f"\nproposed next window ({len(proposal)} of {WINDOW}):")
    for n in proposal:
        tag = (
            "never-checked" if n in never
            else "sentinel" if n in sentinels
            else f"auto-sentinel, changed since r{auto[n]}" if n in auto
            else f"last green r{last[n]}"
        )
        print(f"  {n}  [{tag}]")
    # Dedup before counting: a --sentinel that is also auto-detected
    # (or already never-checked) holds ONE slot, not two.
    overflow = len(set(never) | set(sentinels) | set(auto)) - WINDOW
    if overflow > 0:
        print(f"\nWARNING: {overflow} never-checked/sentinel rows do not "
              f"fit one window — plan two rounds.")
    if plan_rounds > 0:
        print(f"\nprojected stalest-first schedule ({plan_rounds} rounds, "
              "no new queries / code changes assumed):")
        for row in simulate_rotations(last, names, latest, plan_rounds):
            hist_s = " ".join(
                f"{age}r:{cnt}" for age, cnt in row["histogram"].items()
            )
            print(f"  r{row['round']}: max staleness "
                  f"{row['max_staleness']}  [{hist_s}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
