"""Mechanical enforcement of the attestation-rotation contract
(registry.py top comment; VERDICT r04 "Next round" #3): any query whose
source closure changed since the recorded baseline must sit in the
driver window (ATTEST_FIRST) or carry an explicit ATTEST_EXEMPT
justification. Deliberately touching operators/asof.py makes this test
name q17_asof_join — the exact breach rounds 3 and 4 shipped."""

from __future__ import annotations

import json
import os

from rastercube_spark import registry
from rastercube_spark.attest import all_hashes, closure_hash, violations

BASELINE = os.path.join(os.path.dirname(__file__), "attest_hashes.json")


def _load_baseline() -> dict[str, str]:
    with open(BASELINE) as f:
        return json.load(f)


def test_window_is_driver_sized_and_consistent():
    names = set(registry.queries())
    window = registry.ATTEST_FIRST
    assert len(window) == len(set(window)), "duplicate names in window"
    assert len(window) <= 50, "driver attests only the first 50"
    unknown = [n for n in window if n not in names]
    assert not unknown, f"window names not registered: {unknown}"
    unknown_ex = [n for n in registry.ATTEST_EXEMPT if n not in names]
    assert not unknown_ex, f"exempt names not registered: {unknown_ex}"
    overlap = set(window) & set(registry.ATTEST_EXEMPT)
    assert not overlap, f"both windowed and exempt (pick one): {overlap}"


def test_changed_closures_are_rotated_or_exempt():
    baseline = _load_baseline()
    cur = all_hashes()
    window = set(registry.ATTEST_FIRST)
    exempt = set(registry.ATTEST_EXEMPT)
    breaches = violations(cur, baseline, window, exempt)
    assert not breaches, (
        "source closure changed since the recorded attestation baseline "
        f"but not rotated into ATTEST_CHANGED (or exempted): {breaches}. "
        "Rotate them in registry.py, then run python tests/make_attest.py "
        "in the same commit."
    )
    new = sorted(n for n in cur if n not in baseline)
    assert not new or all(n in window for n in new), (
        f"new queries must enter via the window: "
        f"{[n for n in new if n not in window]}"
    )


def test_exemptions_carry_reasons():
    for name, why in registry.ATTEST_EXEMPT.items():
        assert isinstance(why, str) and len(why) > 20, (
            f"{name}: exemption needs a real justification"
        )


def test_guard_names_breaching_query():
    """The r04 breach replayed mechanically: when operators/asof.py's
    SOURCE TEXT changes (simulated by injecting an edited file into
    linecache, exactly what the closure walker reads via
    inspect.getsource), q17's closure hash must move — proving the walk
    reaches asof_join through queries/joins.py — and the violation rule
    must then name q17 whenever it sits outside the window and
    unexempted, regardless of what this round's lists contain."""
    import linecache
    import os as _os

    import rastercube_spark.operators.asof as asof_mod

    qs = registry.queries()
    os_ = registry.oracle_sql()
    name = "q17_asof_join"
    h_before = closure_hash(qs[name], os_.get(name))

    fname = asof_mod.__file__
    st = _os.stat(fname)
    with open(fname) as f:
        lines = f.readlines()
    # edit a line INSIDE asof_join's body so co_firstlineno still
    # anchors getsource to the (now different) text
    fl = asof_mod.asof_join.__code__.co_firstlineno
    lines[fl] = lines[fl].rstrip("\n") + "  # PROBE-EDIT\n"
    linecache.cache[fname] = (st.st_size, st.st_mtime, lines, fname)
    try:
        h_after = closure_hash(qs[name], os_.get(name))
    finally:
        linecache.cache.pop(fname, None)

    assert h_after != h_before, (
        "closure walk failed to reach operators/asof.py source for q17"
    )
    cur, base = {name: h_after}, {name: h_before}
    assert violations(cur, base, window=set(), exempt=set()) == [name]
    assert violations(cur, base, window={name}, exempt=set()) == []
    assert violations(cur, base, window=set(), exempt={name}) == []


def test_function_local_imports_are_in_closure():
    """ADVICE r05 (high): function-BODY imports bind locals, not
    globals, so the r05 walker silently excluded qb0/qb1/qb2/qa2's
    operators from their closures — edits to those operators would not
    have tripped this suite. The fixed walker resolves
    IMPORT_NAME/IMPORT_FROM from bytecode; these queries import their
    operator inside the query function, so each operator's `def` must
    appear in the closure source."""
    from rastercube_spark.attest import closure_sources

    qs = registry.queries()
    os_ = registry.oracle_sql()
    expected = {
        "qb0_cosine_pairs_lsh": "def lsh_cosine_pairs",
        "qb1_decontaminate": "def decontaminate",
        "qb2_semantic_dedup": "def min_label_clusters",
        "qa2_ivf_knn": "def train_ivf_centroids",
    }
    for name, needle in expected.items():
        src = "\n".join(closure_sources(qs[name], os_.get(name)))
        assert needle in src, (
            f"{name}: locally-imported operator ({needle}) missing from "
            "its hashed closure — the exact r05 blind spot"
        )


def test_guard_names_breaching_query_via_local_import():
    """The local-import breach shape replayed mechanically (same
    linecache probe as above, different import path): editing
    operators/dedup.py's decontaminate — imported INSIDE qb1's body —
    must move qb1's closure hash."""
    import linecache
    import os as _os

    import rastercube_spark.operators.dedup as dedup_mod

    qs = registry.queries()
    os_ = registry.oracle_sql()
    name = "qb1_decontaminate"
    h_before = closure_hash(qs[name], os_.get(name))

    fname = dedup_mod.__file__
    st = _os.stat(fname)
    with open(fname) as f:
        lines = f.readlines()
    fl = dedup_mod.decontaminate.__code__.co_firstlineno
    lines[fl] = lines[fl].rstrip("\n") + "  # PROBE-EDIT\n"
    linecache.cache[fname] = (st.st_size, st.st_mtime, lines, fname)
    try:
        h_after = closure_hash(qs[name], os_.get(name))
    finally:
        linecache.cache.pop(fname, None)

    assert h_after != h_before, (
        "closure walk failed to reach operators/dedup.py through qb1's "
        "function-local import"
    )


def test_rotation_policy_capacity_and_staleness():
    """Tiered-rotation policy (VERDICT r13 "Next round" #1 — a
    documented, TEST-ENFORCED policy that stays satisfiable at the
    registry's growth rate), reading the same CORRECTNESS_r* ground
    truth as tools/rotate_window.py:

    - capacity: the driver attests 50 queries/round and a frozen
      query's attestation may age at most 2 rounds, so a 3-round cycle
      covers 150 slots; reserving 6 slots/round for changed/new
      closures caps the registry at 144. Growth past the cap must be
      paid for by widening the window with the driver, not by letting
      attestations silently go stale.
    - staleness: every query whose LATEST green driver row is already
      2+ rounds behind the newest recorded round would breach the
      ceiling at the next judgement unless re-attested — it MUST sit
      in the next window (ATTEST_FIRST). Queries never attested (new)
      are covered by test_changed_closures_are_rotated_or_exempt.
    """
    from rastercube_spark.attest import last_green_rounds

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = list(registry.queries())
    assert len(names) <= 144, (
        f"registry has {len(names)} queries — past the 144 capacity cap "
        "(50-slot window × 3-round cycle − 6-slot changed-closure "
        "reserve). Stop landing net-new queries or widen the window."
    )
    strong, weak = last_green_rounds(repo)
    last = {**weak, **strong}
    if not last:
        return  # no artifacts in a fresh checkout — nothing to enforce
    newest = max(last.values())
    window = set(registry.ATTEST_FIRST)
    must_rotate = sorted(
        n for n in names if n in last and last[n] <= newest - 2
    )
    missing = [n for n in must_rotate if n not in window]
    assert not missing, (
        f"{len(missing)} queries are at the staleness ceiling (latest "
        f"green row ≤ r{newest - 2}) but not in the next window: "
        f"{missing}"
    )
