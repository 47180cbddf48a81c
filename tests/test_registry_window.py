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


def test_auto_rotation_is_a_stable_partition(monkeypatch):
    """queries() must order never-green entries before green ones
    while preserving the canonical dict's relative order inside each
    class — under ANY green set, including ones future rounds will
    produce. Simulates three rounds of driver progress."""
    canon = list(entry_mod._queries_canonical())
    scenarios = [
        set(),                      # round 1: nothing checked yet
        set(canon[:50]),            # a full window went green
        set(canon) - set(canon[60:75]),  # only a mid-block remains
        set(canon),                 # everything green
    ]
    for green in scenarios:
        monkeypatch.setattr(entry_mod, "_driver_green_names", lambda g=green: g)
        ordered = list(entry_mod.queries())
        assert set(ordered) == set(canon)
        n_never = len(canon) - len(green)
        assert all(n not in green for n in ordered[:n_never])
        assert all(n in green for n in ordered[n_never:])
        assert [n for n in canon if n not in green] == ordered[:n_never]
        assert [n for n in canon if n in green] == ordered[n_never:]


def test_driver_green_names_survives_corrupt_artifact(tmp_path):
    """A corrupt CORRECTNESS file must degrade to 'not mentioned',
    not crash the driver contract at import/call time. Non-dict valid
    JSON gets the same rule."""
    good = {"q1": {"rows_match": True, "schema_match": True, "hash_match": True}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(good))
    (tmp_path / "CORRECTNESS_r02.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r03.json").write_text("[]")
    assert entry_mod._driver_green_names(str(tmp_path)) == {"q1"}


def test_driver_green_names_latest_verdict_wins(tmp_path):
    """Green is NOT a permanent latch: an entry that regresses in a
    later round must re-enter the never-green set (and therefore the
    driver window) even though an old artifact has a green row — a
    latch would leave red evidence permanently unactionable while the
    rotation reports full coverage."""
    g = {"rows_match": True, "schema_match": True, "hash_match": True}
    r = {"rows_match": True, "schema_match": True, "hash_match": False}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"stays_green": g, "regresses": g})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"regresses": r, "recovers": r})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"recovers": g}))
    assert entry_mod._driver_green_names(str(tmp_path)) == {"stays_green", "recovers"}
