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
import sys

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
    produce. Simulates three rounds of driver progress. (All greens
    share one round here so staleness cannot reorder them — the
    staleness tiebreak has its own test below.)"""
    canon = list(entry_mod._queries_canonical())
    scenarios = [
        set(),                      # round 1: nothing checked yet
        set(canon[:50]),            # a full window went green
        set(canon) - set(canon[60:75]),  # only a mid-block remains
        set(canon),                 # everything green
    ]
    for green in scenarios:
        rounds = {n: 1 for n in green}
        monkeypatch.setattr(entry_mod, "_driver_green_rounds", lambda r=rounds: r)
        ordered = list(entry_mod.queries())
        assert set(ordered) == set(canon)
        n_never = len(canon) - len(green)
        assert all(n not in green for n in ordered[:n_never])
        assert all(n in green for n in ordered[n_never:])
        assert [n for n in canon if n not in green] == ordered[:n_never]
        assert [n for n in canon if n in green] == ordered[n_never:]


def test_green_partition_rotates_by_staleness(monkeypatch):
    """Once entries are green, the green partition must order by the
    round of each entry's latest green verdict — OLDEST PROOF FIRST,
    canonical order as tiebreak — so driver evidence cycles through
    the whole registry instead of re-checking a fixed 50 forever
    (VERDICT r5 finding #2: a tail regression could otherwise hide
    indefinitely)."""
    canon = list(entry_mod._queries_canonical())
    # interleave rounds so staleness order differs from canonical order
    rounds = {n: (5 - (i % 5)) for i, n in enumerate(canon)}
    never = set(canon[10:20])
    for n in never:
        del rounds[n]
    monkeypatch.setattr(entry_mod, "_driver_green_rounds", lambda r=rounds: r)
    ordered = list(entry_mod.queries())
    n_never = len(never)
    assert set(ordered[:n_never]) == never
    tail = ordered[n_never:]
    idx = {n: i for i, n in enumerate(canon)}
    assert tail == sorted(tail, key=lambda n: (rounds[n], idx[n]))
    # oldest-round entries really do come first
    assert rounds[tail[0]] == min(rounds.values())
    assert rounds[tail[-1]] == max(rounds.values())


def test_live_window_holds_stalest_green_entries():
    """Against the real committed artifacts: if every registry entry
    is green, the 50-entry driver window must contain exactly the
    entries whose green proof is oldest (no fresher-proven entry may
    occupy a slot a staler one needs)."""
    rounds = entry_mod._driver_green_rounds(REPO)
    names = list(entry_mod.queries())
    in_registry = {n: r for n, r in rounds.items() if n in set(names)}
    never = [n for n in names if n not in in_registry]
    if never:
        # growth in progress — the saturation test above already
        # covers the prefix; staleness only orders the green tail
        start = len(never)
    else:
        start = 0
    window = names[start : start + max(0, WINDOW - start)]
    if not window:
        return
    worst_in_window = max(in_registry[n] for n in window)
    outside = [n for n in names[start + len(window):] if n in in_registry]
    if outside:
        best_outside = min(in_registry[n] for n in outside)
        assert worst_in_window <= best_outside, (
            "driver window holds an entry proven in round "
            f"{worst_in_window} while a staler (round {best_outside}) "
            "entry waits outside — staleness rotation broken"
        )


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


def test_bench_headline_names_are_registry_entries():
    """Every bench.py HEADLINE name must be a live queries() entry
    (a rename/removal would make the driver's bench run crash), and
    the list must be duplicate-free (a duplicate double-counts one
    query in the headline total)."""
    import bench

    qs = entry_mod._queries_canonical()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_no_entry_green_proof_older_than_max_age():
    """Staleness budget, machine-enforced (VERDICT r10 task 2): with
    366+ entries and a 50-slot window, a tail regression can only hide
    as long as its last green proof is allowed to age. The rotation
    puts oldest-proof entries first, so under normal operation no
    entry's age exceeds ceil(registry/50)+1; if registry growth
    starves rotation slots long enough to breach
    MAX_GREEN_AGE_ROUNDS, this fails and the round plan owes a
    catch-up rotation."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import green_age_audit

    ages = green_age_audit.green_ages(REPO)
    over = {
        n: a
        for n, a in ages.items()
        if a > green_age_audit.MAX_GREEN_AGE_ROUNDS
    }
    assert not over, (
        f"entries whose latest green proof is older than "
        f"{green_age_audit.MAX_GREEN_AGE_ROUNDS} rounds: {over} — "
        "the driver window needs a catch-up rotation before more growth"
    )


def test_green_age_audit_agrees_with_independent_artifact_fold():
    """Cross-check the tool against an INDEPENDENT recomputation
    straight from the committed CORRECTNESS_r*.json artifacts
    (latest-wins, same rule stated in the docstrings) — the earlier
    version of this test only asserted identities of a Counter built
    from the tool's own output, which could never fail (review
    finding r11)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import green_age_audit

    ages = green_age_audit.green_ages(REPO)

    # independent fold: parse artifacts directly, no entry-module code
    rounds = {}
    latest = 0
    import re

    # sort by PARSED round number, not path string: lexicographic order
    # matches numeric order only while round numbers stay zero-padded
    # two digits (r100 would sort before r99 and fold in the wrong
    # order — ADVICE r11); same rule as tools/green_age_audit.py
    def _rnd(path):
        return int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))

    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")), key=_rnd
    ):
        rnd = _rnd(path)
        latest = max(latest, rnd)
        try:
            data = json.load(open(path))
        except Exception:
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                # mirror _green_cache_impl: a truncated/repaired
                # artifact's non-dict row is SKIPPED (prior verdict
                # kept), not crashed on (r12 review)
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                rounds[name] = rnd
            else:
                rounds.pop(name, None)  # latest-wins, not a latch
    expected = {n: latest - r for n, r in rounds.items()}
    assert ages == expected
