"""Fold a round's driver correctness results into the rotation
history (plans/window_history.json) and open the next round.

Usage (at the START of round N+1, after the driver wrote
CORRECTNESS_rNN.json for round N):

    python tools/update_window_history.py CORRECTNESS_r05.json 6 [touched ...]

- stamps every query in the CORRECTNESS file with its round number
  (parsed from the filename), making it most-recently-checked;
- sets ``round`` to the new round;
- replaces ``touched`` with the queries named on the command line
  (the ones whose plans/semantics the new round intends to change —
  they jump the rotation queue; extend the list by re-running);
- refreshes ``pending_first_check``: never-driver-checked queries
  that fall OUTSIDE the new round's 50-slot window, in window order.
  The registry sorts these ahead of other never-checked queries next
  round (FIFO), so when more than 50 queries are never-checked, none
  can be displaced indefinitely by newer registrations (the r5 q136
  hole).
"""

from __future__ import annotations

import json
import os
import re
import sys

HIST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cardano_spark",
    "plans",
    "window_history.json",
)


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    correctness_path, new_round = sys.argv[1], int(sys.argv[2])
    touched = sorted(set(sys.argv[3:]))
    m = re.search(r"_r0*(\d+)\.json$", os.path.basename(correctness_path))
    if not m:
        sys.exit(f"cannot parse round number from {correctness_path!r}")
    checked_round = int(m.group(1))
    with open(correctness_path, encoding="utf-8") as f:
        results = json.load(f)
    with open(HIST, encoding="utf-8") as f:
        hist = json.load(f)
    for q, row in results.items():
        if row.get("err") is None:
            hist["last_round"][q] = max(
                hist["last_round"].get(q, 0), checked_round
            )
    hist["round"] = new_round
    hist["touched"] = touched
    with open(HIST, "w", encoding="utf-8") as f:
        json.dump(hist, f, indent=1, sort_keys=True)
        f.write("\n")
    # Refresh the pending-first-check queue against the NEW history:
    # the registry re-reads window_history.json on each call, so the
    # ordering below reflects the stamps written above.
    sys.path.insert(0, os.path.dirname(HIST).rsplit(os.sep + "cardano_spark", 1)[0])
    from cardano_spark.plans import registry

    ordered = list(registry.all_queries())
    last = hist["last_round"]
    pending = [
        q for q in ordered[registry.DRIVER_WINDOW :] if q not in last
    ]
    hist["pending_first_check"] = pending
    with open(HIST, "w", encoding="utf-8") as f:
        json.dump(hist, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"stamped {len(results)} queries at round {checked_round}; "
        f"round={new_round}, touched={touched}, "
        f"pending_first_check={pending}"
    )


if __name__ == "__main__":
    main()
