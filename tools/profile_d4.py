"""Stage-by-stage wall-time attribution for the D4 pipelines
(q180/q185 — r11 verdict next-round item #3): re-compose the pipeline
inline and time each materialization boundary separately. Timers are
cumulative-safe because every boundary is a localCheckpoint (the next
stage starts from materialized data, so each delta is that stage's
own cost).

Usage: python tools/profile_d4.py [sf_dir] [flat|hier]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mode = sys.argv[2] if len(sys.argv) > 2 else "hier"
    assign = "hierarchical" if mode == "hier" else "auto"

    from cardano_spark.catalog import table
    from cardano_spark.operators import similarity as SIM
    from cardano_spark.session import get_spark

    spark = get_spark("profile-d4")
    sc = spark.sparkContext

    def mark(label, fn):
        sc.setJobDescription(f"d4:{label}")
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"{label:34s} {dt:7.3f} s", flush=True)
        sc.setJobDescription(None)
        return out

    e = table(spark, sf_dir, "embeddings")

    t_all0 = time.time()
    kw = dict(n_centroids=8, threshold=0.25, auto_k=True, assign=assign)
    if assign == "hierarchical":
        kw["probes"] = 2
    sd = mark("build semantic_dedup", lambda: SIM.semantic_dedup(
        e, "vec_id", "embedding", **kw))
    # materialize the dedup output (assignment ckpt + pair join + flag)
    mark("exec semantic_dedup (noop)", lambda: sd.write.mode(
        "overwrite").format("noop").save())
    surv = mark("build survivors", lambda: e.join(
        sd.filter(F.col("is_dup") == 0).select("vec_id"), "vec_id",
        "left_semi").localCheckpoint(eager=False))
    mark("materialize survivors (count)", lambda: surv.count())
    kw2 = dict(k=8, n_iter=2, prune_den=4, auto_k=True, assign=assign)
    if assign == "hierarchical":
        kw2["probes"] = 2
    pp = mark("build prototype_prune", lambda: SIM.prototype_prune(
        surv, "vec_id", "embedding", **kw2))
    mark("exec prototype_prune (noop)", lambda: pp.write.mode(
        "overwrite").format("noop").save())
    print(f"{'TOTAL':34s} {time.time() - t_all0:7.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()
