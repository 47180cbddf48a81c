"""Stalest-green age audit over the driver-evidence fold (VERDICT r10
task 2).

With 366+ registry entries and a 50-slot driver window, a full
re-proof cycle takes ~7 rounds of pure rotation; a regression in a
tail entry could otherwise ride undetected for many rounds while the
fold still reports it green. This tool reports, for every registry
entry, the AGE of its latest green driver verdict in rounds
(latest artifact round − the entry's latest green round), using the
same latest-wins fold `queries()` rotation runs on
(`__spark_entry__._driver_green_rounds`).

Run at round close and paste the distribution into NOTES.md; the
committed test (`tests/test_registry_window.py::
test_no_entry_green_proof_older_than_max_age`) fails the suite when
any entry's age EXCEEDS MAX_GREEN_AGE_ROUNDS, so the staleness budget
is machine-enforced, not prose.

Usage: python tools/green_age_audit.py
"""

from __future__ import annotations

import collections
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# One round of slack past the pure-rotation period (366/50 ≈ 7.3):
# the rotation puts oldest-proof entries at the window front, so an
# age can only exceed this when new-entry growth starves rotation
# slots for two consecutive rounds — at that point the registry needs
# a catch-up round, and the suite should say so loudly.
MAX_GREEN_AGE_ROUNDS = 8


def latest_round(repo: str = REPO) -> int:
    """Highest round number among committed CORRECTNESS_r*.json."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds) if rounds else 0


def green_ages(repo: str = REPO) -> dict[str, int]:
    """Map every registry entry with green driver evidence to its age
    in rounds; never-green entries are OMITTED (they are the rotation
    window's job, covered by
    test_never_checked_entries_sit_in_driver_window)."""
    import __spark_entry__ as entry_mod

    cur = latest_round(repo)
    return {
        name: cur - rnd
        for name, rnd in entry_mod._driver_green_rounds(repo).items()
    }


def main() -> None:
    ages = green_ages()
    cur = latest_round()
    dist = collections.Counter(ages.values())
    worst_age = max(ages.values(), default=0)
    stalest = sorted((a, n) for n, a in ages.items())[-5:]
    print(
        json.dumps(
            {
                "latest_round": cur,
                "green_entries": len(ages),
                "age_distribution": {str(k): v for k, v in sorted(dist.items())},
                "max_age": worst_age,
                "max_allowed": MAX_GREEN_AGE_ROUNDS,
                "stalest_5": [n for _, n in stalest],
                "ok": worst_age <= MAX_GREEN_AGE_ROUNDS,
            }
        )
    )
    if worst_age > MAX_GREEN_AGE_ROUNDS:
        sys.exit(1)


if __name__ == "__main__":
    main()
