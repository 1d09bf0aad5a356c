"""Scaling ladder for semantic_dedup END-TO-END — the r10 evidence
the r9 verdict asked for (task 1): the r9 ladder measured
prototype_prune (no pair join), so the claim "the D4 plan is
sub-n^1.5" was only proven for the ASSIGNMENT term. This measures
the operator that owns the pair join, both arms:

- flat + auto-k = sqrt(n)        (the old default; n^1.5 cost model)
- hierarchical + auto-k = n^(2/3) (the r10 mode-keyed rule; n^(4/3))
- occ (r11): occupancy_cap=16 + three-level tree (k ∝ n: pair join
  LINEAR n*cap, assignment ≈ n*(1+2p)*k^(1/3) = n^(4/3) at k ∝ n)
- occ-scaled (r11): occ with every model-build term forced onto its
  beyond-crossover scale path (seed_route="twolevel",
  fine_broadcast_max=0 — q194's configuration), the fixed-cap
  ladder the r10 verdict's task 1 asks for

Recipe mirrors the r9 ladder: replicas of .scale/sf1's embeddings
(20k rows) with shifted vec_ids, localCheckpointed so the timing is
operator cost, not scan; best-of-2 on an idle machine.

    python tools/ladder_semdedup.py [max_replicas] [arms_csv]

arms_csv filters which arms run (e.g. "occ,occ-scaled" for the r11
fixed-cap ladder without re-running the r10 flat/hier one).
Prints one line per (n, arm) with the best wall time.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cardano_spark.operators import similarity as SIM  # noqa: E402
from cardano_spark.session import get_spark  # noqa: E402

SHIFT = 1_000_000_000


ARM_KW = {
    "flat": dict(auto_k=True),
    "hier": dict(auto_k=True, assign="hierarchical", probes=2),
    "occ": dict(
        auto_k=True, assign="hierarchical3", probes=2, occupancy_cap=16
    ),
    "occ-scaled": dict(
        auto_k=True, assign="hierarchical3", probes=2, occupancy_cap=16,
        seed_route="twolevel", fine_broadcast_max=0,
    ),
}


def main() -> None:
    max_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark("ladder-semdedup")
    base = spark.read.parquet(".scale/sf1/embeddings.parquet")

    def replicate(m: int):
        # replicas get a deterministic per-replica vector PERTURBATION
        # (not plain copies): identical vectors all argmax to the same
        # seed, so copied replicas would collapse into replica-0's
        # clusters and occupancy would grow m-fold — exactly the
        # degenerate geometry the occupancy-capped arms exist to rule
        # out. A small id-and-replica-keyed rotation spreads replica
        # vectors across the (replica-0) seed set, so cluster
        # occupancy tracks ~n/k as it would on real data.
        df = base
        for i in range(1, m):
            df = df.unionByName(
                base.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * SHIFT)
                ).withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x, j: x
                        + F.lit(0.03 * i)
                        * F.cos(
                            (j + F.lit(i)) * F.lit(0.7)
                            + F.col("vec_id") % 97
                        ),
                    ),
                )
            )
        df = df.localCheckpoint(eager=True)
        return df, df.count()

    plan = [
        (1, ["flat", "hier", "occ", "occ-scaled"]),
        (4, ["flat", "hier", "occ", "occ-scaled"]),
        (16, ["hier", "occ", "occ-scaled"]),
    ]
    for m, arms in plan:
        if m > max_rep:
            continue
        if only is not None:
            arms = [a for a in arms if a in only]
        if not arms:
            continue
        d, n = replicate(m)
        for arm in arms:
            kw = ARM_KW[arm]
            times = []
            for _ in range(2):
                t = time.time()
                out = SIM.semantic_dedup(
                    d, "vec_id", "embedding", 8, 0.25, **kw
                )
                row = out.agg(
                    F.sum("is_dup").alias("dups"),
                    F.count(F.lit(1)).alias("n"),
                    F.countDistinct("cluster_id").alias("k"),
                ).collect()[0]
                times.append(time.time() - t)
            print(
                f"n={n} arm={arm} k={row.k} dups={row.dups} "
                f"best={min(times):.2f}s samples="
                f"{[round(x, 2) for x in times]}",
                flush=True,
            )
        d.unpersist()


if __name__ == "__main__":
    main()
