#!/usr/bin/env python
"""Refresh BENCH_BASELINE.json with a RATCHET (VERDICT r8 #7).

The regression gate in bench.py compares each entry against the
recorded per-entry reference median.  A naive refresh ("overwrite with
this round's numbers") silently LOOSENS the gate whenever a round
happens to run slow — the next regression then hides inside the new,
slower reference.  Policy instead:

    new_reference[entry] = min(old_reference[entry], new_median[entry])

unless a waiver names the entry (--waive entry [--waive entry ...]),
in which case the new median is taken verbatim and the waiver is
recorded in the file's provenance.  Waivers are for DELIBERATE
slowdowns (an entry grew a stage because its semantics grew); slow
rounds never qualify.

Entries new to the registry enter at their measured median; entries no
longer in the run are dropped (they left the registry).

Usage:
    python bench.py > bench_out.json   # or the driver's BENCH_r{N}.json
    python tools/refresh_bench_baseline.py bench_out.json \
        [--waive entry]... [--note "why"]
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_PATH = os.path.join(REPO, "BENCH_BASELINE.json")


def ratchet(
    old: dict | None, new_run: dict, waivers: set[str] | None = None
) -> dict:
    """Pure ratchet: per-entry min(old_ref, new_median) except waived
    entries, which take the new median; provenance records waivers.
    Raises when scale factors differ (cross-sf references are
    meaningless)."""
    waivers = waivers or set()
    old_q = (old or {}).get("queries", {})
    if old and old.get("sf") != new_run.get("sf"):
        raise ValueError(
            f"sf mismatch: baseline {old.get('sf')} vs run {new_run.get('sf')}"
        )
    queries = {}
    for name, t in new_run["queries"].items():
        if name in waivers or name not in old_q:
            queries[name] = t
        else:
            queries[name] = min(old_q[name], t)
    return {
        "sf": new_run.get("sf"),
        "queries": queries,
        "source": "ratcheted refresh: per-entry min(previous reference, new median)",
        "waived": sorted(waivers & set(new_run["queries"])),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_json", help="bench.py output JSON (one line)")
    ap.add_argument("--waive", action="append", default=[])
    ap.add_argument("--note", default="")
    args = ap.parse_args()

    with open(args.run_json) as f:
        new_run = json.loads(f.read().strip().splitlines()[-1])
    try:
        with open(BASELINE_PATH) as f:
            old = json.load(f)
    except (OSError, json.JSONDecodeError):
        old = None

    out = ratchet(old, new_run, set(args.waive))
    if args.note:
        out["note"] = args.note
    tightened = sum(
        1
        for n, t in out["queries"].items()
        if old and n in old.get("queries", {}) and t < old["queries"][n]
    )
    with open(BASELINE_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(
        f"wrote {BASELINE_PATH}: {len(out['queries'])} entries, "
        f"{tightened} tightened, waived={out['waived']}"
    )


if __name__ == "__main__":
    main()
