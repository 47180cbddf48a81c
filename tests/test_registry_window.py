"""Machine-check the registry-window rotation invariant.

The driver evaluates only the first 50 `queries()` entries each round,
so registry order IS the evidence plan: every entry that has never
received a green driver row (rows+schema+hash in some CORRECTNESS_r*.json)
must sit inside the 50-entry prefix, or it can never be checked. This
went stale in prose twice (NOTES.md round-numbering mixup), hence a
test instead of documentation.

No Spark session needed — the check is pure dict + JSON inspection.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry_mod

WINDOW = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_names() -> set[str]:
    green: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return green


def test_never_checked_entries_sit_in_driver_window():
    """No wasted driver slot: while any never-green entry sits outside
    the 50-entry prefix, every prefix slot must itself hold a
    never-green entry. (Once the registry grew past 50 never-green
    entries, overflow became unavoidable — the invariant is that the
    window is saturated with evidence-needing entries, i.e. a green
    entry never occupies a slot a never-green entry could use.)"""
    names = list(entry_mod.queries())
    green = _green_names()
    prefix = names[:WINDOW]
    never_checked = [n for n in names if n not in green]
    outside = [n for n in never_checked if n not in set(prefix)]
    wasted = [n for n in prefix if n in green]
    assert not (outside and wasted), (
        "never-green entries are waiting outside the 50-slot window "
        f"({outside[:5]}…) while green entries occupy window slots "
        f"({wasted[:5]}…) — rotate the registry order"
    )


def test_every_window_entry_is_a_real_query():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # every oracle key must match a queries() key (a dangling oracle
    # is dead weight; a typo silently downgrades to rows-only)
    dangling = set(oracles) - set(qs)
    assert not dangling, f"oracle_sql keys without queries() entries: {dangling}"


def test_correctness_rows_refer_to_registry_entries():
    """Driver rows must map onto current registry names — a rename
    would silently orphan the old evidence."""
    names = set(entry_mod.queries())
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        stale = set(json.load(open(path))) - names
        assert not stale, f"{os.path.basename(path)} rows not in registry: {stale}"
