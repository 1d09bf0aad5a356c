"""The driver's correctness harness checks only the FIRST 50 registry
entries. The registry rotates that window on a least-recently-
driver-checked schedule (plans/window_history.json) so every query
gets a driver row at least every ceil(N/50) rounds. These guards make
the rotation invariants CI failures instead of silently-unchecked
queries."""

from __future__ import annotations

import json
import os

from cardano_spark.plans import registry


def _history() -> dict:
    with open(registry._HISTORY_PATH, encoding="utf-8") as f:
        return json.load(f)


def test_window_prioritizes_touched_then_least_recent():
    qs = list(registry.all_queries())
    window = qs[: registry.DRIVER_WINDOW]
    deferred = registry.deferred_names()
    assert qs[registry.DRIVER_WINDOW :] == deferred
    hist = _history()
    last = hist["last_round"]
    touched = [q for q in hist["touched"] if q in qs]
    # 1) every never-driver-checked query sits inside the window —
    #    the hard invariant (r4 verdict: no query may stay
    #    driver-unchecked forever; new queries are never-checked) —
    #    UNLESS never-checked genuinely overflow the 50 slots, in
    #    which case every displaced one must be queued in
    #    pending_first_check so it enters FIFO next round (the r5
    #    q136 hole: insertion order displaced the same query every
    #    round)
    never = [q for q in qs if q not in last]
    never_displaced = set(never) - set(window)
    if len(never) <= registry.DRIVER_WINDOW:
        assert not never_displaced, (
            f"never-checked outside window: {never_displaced}"
        )
    else:
        assert len(never_displaced) == len(never) - registry.DRIVER_WINDOW
        assert never_displaced <= set(hist.get("pending_first_check", [])), (
            f"displaced never-checked not queued: "
            f"{never_displaced - set(hist.get('pending_first_check', []))}"
        )
    # 2) touched queries sit inside the window unless never+touched
    #    genuinely overflow the 50 slots; any displaced touched query
    #    must be among the MOST recently driver-verified of the
    #    touched set (it rotates back next round via plain LRU)
    displaced = set(touched) - set(window)
    overflow = max(0, len(never) + len(touched) - registry.DRIVER_WINDOW)
    assert len(displaced) <= overflow, (
        f"touched displaced without overflow: {displaced}"
    )
    if displaced:
        # compare only previously-checked touched queries (a touched
        # query with no row yet rides the never-checked class)
        kept = [q for q in touched if q in set(window) and q in last]
        if kept:
            kept_max = max(last[q] for q in kept)
            assert all(last[q] >= kept_max for q in displaced)
    # 3) no deferred query was checked LONGER ago than any windowed,
    #    untouched query — the rotation's defining property
    if deferred:
        oldest_deferred = min(last.get(q, 0) for q in deferred)
        for q in window:
            if q in touched or q not in last:
                continue
            assert last[q] <= oldest_deferred


def test_rotation_revisits_everything_within_two_rounds():
    """With 105 queries and a 50-slot window, a query deferred this
    round must be in the front HALF of the next round's queue once its
    windowed peers get stamped — simulate the round transition and
    assert the deferred set lands inside the next window."""
    qs = list(registry.all_queries())
    window = qs[: registry.DRIVER_WINDOW]
    deferred = registry.deferred_names()
    hist = _history()
    simulated = dict(hist["last_round"])
    this_round = hist.get("round", 0)
    for q in window:
        simulated[q] = this_round
    # next round: no touched, history = simulated
    idx = {q: i for i, q in enumerate(qs)}
    nxt = sorted(qs, key=lambda q: (simulated.get(q, 0), idx[q]))
    next_window = set(nxt[: registry.DRIVER_WINDOW])
    missing = set(deferred) - next_window
    # every query deferred now is driver-checked next round (55 <= 50
    # only fails if more than 50 are deferred, i.e. N > 100: then the
    # 5 most-recently-checked wait exactly one extra round)
    overflow = len(deferred) - registry.DRIVER_WINDOW
    assert len(missing) <= max(0, overflow)


def test_registry_contract():
    qs = registry.all_queries()
    oracles = registry.all_oracles()
    # every oracle belongs to a registered query, same order
    assert set(oracles) <= set(qs)
    assert [q for q in qs if q in oracles] == list(oracles)
    # history hygiene: touched/last_round refer to real queries
    hist = _history()
    assert set(hist["touched"]) <= set(qs)
    assert set(hist["last_round"]) <= set(qs)
    # window is exactly DRIVER_WINDOW when the registry is bigger
    assert len(qs) > registry.DRIVER_WINDOW
    assert len(registry.deferred_names()) == len(qs) - registry.DRIVER_WINDOW


def test_overflow_never_checked_rotates_fifo(tmp_path, monkeypatch):
    """The r5 design hole, simulated: 60 never-checked queries (> 50
    slots) must ALL receive their first driver row within
    ceil(60/50) = 2 rounds — the pending_first_check queue carries
    the displaced tail to the front of the next round's window
    instead of letting insertion order displace the same queries
    forever."""
    names = [f"sim_q{i:03d}" for i in range(60)]
    hist = {"round": 1, "touched": [], "last_round": {},
            "pending_first_check": []}
    hist_path = tmp_path / "window_history.json"

    def ordered() -> list[str]:
        pending = {q: i for i, q in enumerate(hist["pending_first_check"])}
        last = hist["last_round"]
        idx = {q: i for i, q in enumerate(names)}

        def key(q):
            if q not in last:
                return (-2, pending.get(q, len(pending)), idx[q])
            return (0, last[q], idx[q])

        return sorted(names, key=key)

    import json

    from cardano_spark.plans import registry as reg

    monkeypatch.setattr(reg, "_HISTORY_PATH", str(hist_path))
    first_row: dict[str, int] = {}
    for rnd in (1, 2):
        hist_path.write_text(json.dumps(hist))
        # the registry's own ordering must agree with the simulation
        assert reg._ordered_names(names) == ordered()
        window = ordered()[: reg.DRIVER_WINDOW]
        for q in window:  # driver stamps the window
            hist["last_round"][q] = rnd
            first_row.setdefault(q, rnd)
        # fold (mirrors tools/update_window_history.py)
        hist["pending_first_check"] = [
            q for q in ordered()[reg.DRIVER_WINDOW :]
            if q not in hist["last_round"]
        ]
        hist["round"] = rnd + 1
    assert set(first_row) == set(names), (
        f"never got a driver row: {set(names) - set(first_row)}"
    )
    assert max(first_row.values()) <= 2
