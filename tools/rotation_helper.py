#!/usr/bin/env python
"""Compute the next round's _DRIVER_PRIORITY rotation from the
CORRECTNESS_r*.json ledgers.

The driver samples the FIRST ~50 entries of queries() order each round,
so coverage is closed by rotating: (1) entries whose code changed this
round (pass their names as argv — their old driver rows no longer
describe the running code), (2) entries never driver-checked on
current fixtures (no row in any post-fixture-regen round), (3) entries
whose last green row predates the fixture regeneration.

Usage:
    python tools/rotation_helper.py [changed_entry ...]

Prints the ready-to-paste _DRIVER_PRIORITY list body plus a coverage
summary.  Fixture regeneration happened before round 4, so rounds >= 4
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


def main() -> None:
    changed = sys.argv[1:]
    from datalakehouse_spark.registry import REGISTRY, _load_extensions

    _load_extensions()
    names = list(REGISTRY)

    current, stale_rounds = set(), set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        keys = set(json.load(open(path)))
        (current if rnd >= _CURRENT_SINCE else stale_rounds).update(keys)

    unknown = [n for n in changed if n not in names]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")
    never = [n for n in names if n not in current and n not in stale_rounds]
    stale = [n for n in names if n not in current and n in stale_rounds]

    seen: set[str] = set()
    out: list[str] = []
    for n in changed + never + stale:
        if n not in seen:
            seen.add(n)
            out.append(n)

    print(
        f"# registry={len(names)} current-fixture-checked={len(current)} "
        f"never={len(never)} stale={len(stale)} -> rotation={len(out)} "
        f"(driver takes ~50/round)"
    )
    print("_DRIVER_PRIORITY = [")
    for n in out:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
