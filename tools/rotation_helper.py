#!/usr/bin/env python
"""Compute the next round's _DRIVER_PRIORITY rotation from the
CORRECTNESS_r*.json ledgers.

The driver samples the FIRST ~50 entries of queries() order each round,
so coverage is closed by rotating: (1) entries whose code changed this
round (pass their names as argv — their old driver rows no longer
describe the running code), (2) entries whose LATEST driver row is a
failure with no green row since (a red row is not evidence — it must
be re-driven), (3) entries never green-driver-checked on current
fixtures (no green row in any post-fixture-regen round), (4) entries
whose last green row predates the fixture regeneration, then (5) the
whole aging tail by last-green-round ASCENDING.

Usage:
    python tools/rotation_helper.py [changed_entry ...]

Prints the ready-to-paste block for registry.py — the
_DRIVER_ROTATION_CHANGED / _DRIVER_ROTATION_ASOF provenance constants
plus the _DRIVER_PRIORITY list — and a coverage summary.  The
provenance constants make the rotation REPRODUCIBLE: the
test_registry_integrity invariant recomputes compute_rotation(changed,
asof) and fails the suite if a round ships a hand-edited or unrotated
list.  Fixture regeneration happened before round 4, so rounds >= 4
count as current-fixture evidence; bump _CURRENT_SINCE if fixtures are
ever regenerated again.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CURRENT_SINCE = 4


def compute_rotation(
    changed: list[str], asof: int | None = None
) -> tuple[list[str], dict]:
    """The deterministic rotation order: (changed, red, never, stale,
    aging-by-last-green-ascending).  ``asof`` pins which ledgers count
    (rounds <= asof) so the order is reproducible after later rounds
    append new CORRECTNESS files; None means all available."""
    from datalakehouse_spark.registry import REGISTRY, _load_extensions

    _load_extensions()
    names = list(REGISTRY)

    # Only a GREEN row is evidence (a failed driver row must NOT
    # exclude the entry from the next rotation): full compare green
    # = all three matches true + no err; rows-only entries (no
    # oracle SQL) are green when the driver got a row count back.
    last_green: dict[str, int] = {}
    last_red: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        if asof is not None and rnd > asof:
            continue
        for name, row in json.load(open(path)).items():
            if not isinstance(row, dict):
                continue
            full_green = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") in (True, None)
                and row.get("err") in (None, "")
            )
            rows_only_green = (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            tgt = last_green if (full_green or rows_only_green) else last_red
            tgt[name] = max(tgt.get(name, 0), rnd)

    unknown = [n for n in changed if n not in names]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")
    # red class: the most recent driver row is a failure (no green row
    # at or after it) — front of the rotation, right after the caller's
    # changed entries.
    red = [n for n in names if last_red.get(n, 0) > last_green.get(n, 0)]
    current = {
        n
        for n in names
        if n not in red and last_green.get(n, 0) >= _CURRENT_SINCE
    }
    never = [
        n for n in names if n not in red and n not in current and n not in last_green
    ]
    stale = [n for n in names if n not in red and n not in current and n in last_green]
    # freshness tail: even current-fixture-green entries age; order them
    # by last-green-round ascending (registry order as tiebreak) so the
    # oldest evidence re-enters the ~50-entry driver window first.
    aging = sorted(
        (n for n in names if n in current),
        key=lambda n: (last_green.get(n, 0), names.index(n)),
    )

    seen: set[str] = set()
    out: list[str] = []
    for n in changed + red + never + stale + aging:
        if n not in seen:
            seen.add(n)
            out.append(n)

    summary = {
        "registry": len(names),
        "current_fixture_checked": len(current),
        "red": len(red),
        "never": len(never),
        "stale": len(stale),
        "rotation": len(out),
    }
    return out, summary


def main() -> None:
    changed = sys.argv[1:]
    ledgers = [
        int(re.search(r"_r(\d+)", p).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    asof = max(ledgers)
    out, summary = compute_rotation(changed, asof)
    print(f"# {summary} (driver takes ~50/round)")
    print(f"_DRIVER_ROTATION_CHANGED = {changed!r}")
    print(f"_DRIVER_ROTATION_ASOF = {asof}")
    print("_DRIVER_PRIORITY = [")
    for n in out:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
