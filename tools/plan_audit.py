"""Registry-wide physical-plan audit: the scale-hygiene counters for
EVERY query, not just the hand-pinned ones.

    python tools/plan_audit.py [sf_dir] [out.json]

For each registry query, build the DataFrame at ``sf_dir`` (default
the CI correctness SF, sf0.001) and count the plan features that
matter at 100 TB:

- ``exchanges``: every Exchange is a shuffle — the budget a refactor
  must not silently blow.
- ``cartesian`` / ``bnl``: CartesianProduct must never appear;
  BroadcastNestedLoopJoin only where it IS the design (brute-force
  ANN scoring against a broadcast probe set).
- ``python``: MapInPandas/FlatMapGroupsInPandas etc. — the Python
  boundary, allowed only for the operators that genuinely need it
  (multimodal decode, stateful streaming).
- ``scans``: parquet scans — re-scan regressions (the q22 lesson)
  show up here.

The committed PLAN_AUDIT.json is the budget;
tests/test_plan_audit.py re-derives the counts in CI and fails on
any un-budgeted regression. Regenerate deliberately with this tool
when a plan change is intentional.

Streaming queries execute on construction (their callables run the
stream to completion and return the batch result), so their counts
describe the returned batch frame; they are included for the
cartesian/python checks but their exchange counts are not load-
bearing.
"""

from __future__ import annotations

import json
import os
import re
import sys

COUNTERS = {
    "exchanges": re.compile(r"\bExchange\b"),
    "cartesian": re.compile(r"\bCartesianProduct\b"),
    "bnl": re.compile(r"\bBroadcastNestedLoopJoin\b"),
    "python": re.compile(
        r"\b(MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython|BatchEvalPython"
        r"|FlatMapGroupsInPandasWithState|TransformWithStateInPandas)\b"
    ),
    "scans": re.compile(r"\bScan parquet\b"),
}


def audit(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    """Build + physically plan every registry query and count plan
    features. Concurrent across queries (guide §2.6: the builders are
    pure — no temp views, no conf mutation — and py4j is thread-safe),
    which matters because a handful of iterative queries run real
    jobs at build time and the serial sweep paid every one of them
    end to end (~3 min; threaded ~1 min)."""
    import __spark_entry__ as entry

    from concurrent.futures import ThreadPoolExecutor

    items = list(entry.queries().items())

    def one(item):
        name, fn = item
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        return name, {
            key: len(pat.findall(plan)) for key, pat in COUNTERS.items()
        }

    workers = min(12, os.cpu_count() or 8)
    with ThreadPoolExecutor(max_workers=workers) as pool:
        return dict(pool.map(one, items))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, "PLAN_AUDIT.json")
    )
    from cardano_spark.session import get_spark

    spark = get_spark("plan-audit")
    counts = audit(spark, sf_dir)
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(counts, f, indent=1, sort_keys=True)
        f.write("\n")
    total_ex = sum(c["exchanges"] for c in counts.values())
    print(f"{len(counts)} queries audited; {total_ex} exchanges total -> {out_path}")


if __name__ == "__main__":
    main()
