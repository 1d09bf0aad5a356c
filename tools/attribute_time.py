"""Attribute each headline query's wall time to its phases.

Per query (guide §1: measure first, decide where the time goes):

- ``build``   — calling the registry function: Python + py4j DataFrame
  construction, including any physical planning forced at build time
  (lazy ``localCheckpoint`` converts its subtree to an RDD, which pays
  full analysis/optimization/codegen-prep for that subtree).
- ``plan``    — forcing ``queryExecution().executedPlan()`` on the
  result: analysis + optimization + physical planning for the rest.
- ``exec``    — the noop save AFTER planning: codegen compilation,
  job scheduling (one job per AQE stage), task execution.
- ``jobs``    — Spark jobs the save submitted (AQE stage count proxy).

Usage: python tools/attribute_time.py [query ...] (default: bench
HEADLINE list). Prints one line per query, best-of-N per phase
measured on SEPARATE full passes (phases within a pass are additive).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("SPARK_GRAFT_ATTR_REPEAT", "3"))
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from cardano_spark.session import get_spark

    spark = get_spark("attribute")
    qs = entrymod.queries()
    names = [n for n in sys.argv[1:] if n in qs] or [
        n for n in HEADLINE if n in qs
    ]

    # warm: JVM, parquet footers, codegen cache for the first query
    qs[names[0]](spark, sf_dir).write.mode("overwrite").format("noop").save()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    print(f"{'query':42s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s} {'jobs':>5s}")
    totals = {"build": 0.0, "plan": 0.0, "exec": 0.0, "total": 0.0}
    for name in names:
        best = None
        for _ in range(repeat):
            jobs0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.write.mode("overwrite").format("noop").save()
            t3 = time.time()
            jobs1 = len(tracker.getJobIdsForGroup(None) or [])
            row = (t1 - t0, t2 - t1, t3 - t2, t3 - t0, jobs1 - jobs0)
            if best is None or row[3] < best[3]:
                best = row
        b, p, e, t, j = best
        totals["build"] += b
        totals["plan"] += p
        totals["exec"] += e
        totals["total"] += t
        print(f"{name:42s} {b:7.3f} {p:7.3f} {e:7.3f} {t:7.3f} {j:5d}")
    print(
        f"{'TOTAL':42s} {totals['build']:7.3f} {totals['plan']:7.3f} "
        f"{totals['exec']:7.3f} {totals['total']:7.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
