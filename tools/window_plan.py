"""Driver-window planner — mechanizes the per-round recut of
``suite/__init__._CHECK_PRIORITY``.

Reads every CORRECTNESS_r*.json, classifies each registered query by its
most recent driver row, and prints the recommended 50-slot window for the
NEXT round: never-checked first (new registrations MUST be driver-checked
in their own round), then cohorts oldest-first, with the overflow that
must queue contiguously past the edge. The output is a checklist, not a
patch — the builder still curates which same-cohort names defer (pick the
ones with in-window code-path siblings) and documents the choice.

Usage: python tools/window_plan.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from datalake_nba_dmc_spark.suite import load_all

    names = list(load_all())
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for q in json.load(open(path)):
            last[q] = max(last.get(q, 0), rnd)
    latest = max(last.values()) if last else 0

    cohorts: dict[int, list[str]] = {}
    for n in names:
        cohorts.setdefault(last.get(n, 0), []).append(n)

    print(f"{len(names)} registered; latest recorded round r{latest}")
    for rnd in sorted(cohorts):
        label = "never-checked" if rnd == 0 else f"last checked r{rnd}"
        print(f"  {label}: {len(cohorts[rnd])}")

    plan: list[str] = []
    for rnd in sorted(cohorts):
        if rnd == latest:
            break
        plan.extend(cohorts[rnd])
    print(f"\nrecommended window ({window} slots; {len(plan)} candidates):")
    for i, n in enumerate(plan):
        marker = "  " if i < window else "->"  # -> = overflow, defers
        print(f"{marker} {i:3d} {n}" + ("" if last.get(n) else "  [never]"))
    if len(plan) > window:
        print(
            f"\n{len(plan) - window} overflow: defer same-cohort names with "
            "in-window siblings; they must sit contiguously at the edge "
            "(tests/test_suite_contract.py pins this)."
        )
    else:
        print(
            f"\n{window - len(plan)} free slots: fill with the next cohort "
            f"(r{latest}) or new registrations."
        )


if __name__ == "__main__":
    main()
