"""Interleaved A/B for the r12 exec-side changes (one JVM, both arms
alternate per round, best-of-N — the measurement discipline from r11:
both arms share the scheduling environment, so a dirty window slows
both instead of biasing one).

Arms reconstruct the r11 (old) plan shapes inline against the same
operators so old/new run in the same session.

Usage: python tools/ab_r12.py [sf_dir] [rounds] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    only = set(sys.argv[3:])

    import __spark_entry__ as entrymod
    from cardano_spark.catalog import table
    from cardano_spark.operators import curation as CU
    from cardano_spark.operators import dedup as DD
    from cardano_spark.functions import text as TX
    from cardano_spark.functions.hashing import md5_long
    from cardano_spark.session import get_spark

    spark = get_spark("ab-r12")
    qs = entrymod.queries()

    # ---- OLD arms (r11 shapes, reconstructed inline) ----

    def q58_old(spark, sf_dir):
        d = table(spark, sf_dir, "documents")
        bench = d.filter(F.col("doc_id") < 20)
        return CU.benchmark_contamination(
            d, bench, "doc_id",
            TX.ngram_shingles(F.col("text"), 2),
            TX.ngram_shingles(F.col("text"), 2),
        ).orderBy("doc_id")

    def q25_old(spark, sf_dir):
        # no input spread, no checkpoint of the exploded frame
        d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
        t = d.select(
            F.col("doc_id").alias("_id"),
            F.col("lang").alias("_blk"),
            TX.ngram_shingles(F.col("text"), 2).alias("_sh"),
        )
        k = t.select(
            "_id", "_blk", F.size("_sh").alias("_n"),
            F.explode(F.transform("_sh", md5_long)).alias("_h"),
        )
        ka = k.select(F.col("_id").alias("id_a"), "_blk",
                      F.col("_n").alias("na"), "_h")
        kb = k.select(F.col("_id").alias("id_b"), "_blk",
                      F.col("_n").alias("nb"), "_h")
        ov = (
            ka.join(kb, ["_blk", "_h"])
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b", "na", "nb")
            .agg(F.count("*").alias("c"))
        )
        return ov.select(
            "id_a", "id_b",
            (F.col("c").cast("double")
             / (F.col("na") + F.col("nb") - F.col("c")).cast("double")
             ).alias("jaccard"),
        ).filter(F.col("jaccard") >= 0.05)

    def q43_old(spark, sf_dir):
        from pyspark.sql import Window as W
        l = table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
        )
        order = [F.desc("l_extendedprice"), F.asc("l_orderkey"),
                 F.asc("l_linenumber")]
        w1 = W.partitionBy("_pid", "l_returnflag").orderBy(*order)
        cand = (
            l.withColumn("_pid", F.spark_partition_id())
            .withColumn("rn", F.row_number().over(w1))
            .filter(F.col("rn") <= 3).drop("_pid", "rn")
        )
        w2 = W.partitionBy("l_returnflag").orderBy(*order)
        return (
            cand.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= 3)
            .select("l_returnflag", "rn", "l_orderkey", "l_linenumber",
                    "l_extendedprice")
        )

    def _cc_star_rounds_old(edges, max_iter):
        e = (
            edges.select(
                F.least(F.col("a"), F.col("b")).alias("lo"),
                F.greatest(F.col("a"), F.col("b")).alias("hi"),
            )
            .filter(F.col("lo") != F.col("hi"))
            .dropDuplicates(["lo", "hi"])
            .localCheckpoint(eager=True)
        )
        n_e = e.count()
        converged = n_e == 0
        rounds = 0
        while not converged and rounds < max_iter:
            rounds += 1
            sym = e.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
                e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
            )
            m = (
                sym.groupBy("u").agg(F.min("v").alias("_mn"))
                .select("u", F.least(F.col("u"), F.col("_mn")).alias("m"))
            )
            large = (
                sym.join(m, "u").filter(F.col("v") > F.col("u"))
                .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
                .dropDuplicates(["lo", "hi"])
            )
            m2 = large.groupBy("hi").agg(F.min("lo").alias("m"))
            part1 = (
                large.join(m2, "hi").filter(F.col("lo") != F.col("m"))
                .select(F.col("m").alias("lo"), F.col("lo").alias("hi"))
            )
            part2 = m2.select(F.col("m").alias("lo"), F.col("hi"))
            new_e = (
                part1.union(part2).dropDuplicates(["lo", "hi"])
                .localCheckpoint(eager=True)
            )
            n_new = new_e.count()
            converged = n_new == n_e and new_e.exceptAll(e).isEmpty()
            e, n_e = new_e, n_new
        return e, rounds, converged

    def q44_old(spark, sf_dir):
        d = table(spark, sf_dir, "documents")
        keys = d.select(
            "doc_id",
            F.substring("text", 1, 20).alias("pre"),
            F.right(F.col("text"), F.lit(20)).alias("suf"),
        )
        edges = None
        for kcol in ("pre", "suf"):
            a = keys.select(F.col("doc_id").alias("a"), F.col(kcol).alias("_k"))
            b = keys.select(F.col("doc_id").alias("b"), F.col(kcol).alias("_k"))
            e = a.join(b, "_k").filter(F.col("a") < F.col("b")).select("a", "b")
            edges = e if edges is None else edges.union(e)
        edges = edges.dropDuplicates(["a", "b"])
        stars, r, conv = _cc_star_rounds_old(edges, 20)
        assert conv
        mapping = (
            stars.select(F.col("hi").alias("node"), F.col("lo").alias("cluster_id"))
            .groupBy("node").agg(F.min("cluster_id").alias("cluster_id"))
        )
        return (
            d.select(F.col("doc_id").alias("node"))
            .join(mapping, "node", "left")
            .select("node", F.coalesce(F.col("cluster_id"),
                                       F.col("node")).alias("cluster_id"))
        )

    pairs = {
        "q58_benchmark_contamination": q58_old,
        "q25_ngram_jaccard_pairs": q25_old,
        "q43_topn_per_group": q43_old,
        "q44_dedup_clusters": q44_old,
    }
    names = [n for n in pairs if not only or n in only]

    # warm codegen/JVM once per arm
    for n in names:
        _noop(qs[n](spark, sf_dir))
        _noop(pairs[n](spark, sf_dir))

    results = {}
    for n in names:
        old_best = new_best = None
        for _ in range(rounds):
            t0 = time.time(); _noop(pairs[n](spark, sf_dir)); o = time.time() - t0
            t0 = time.time(); _noop(qs[n](spark, sf_dir)); w = time.time() - t0
            old_best = o if old_best is None or o < old_best else old_best
            new_best = w if new_best is None or w < new_best else new_best
        results[n] = (old_best, new_best)
        print(f"{n}: old {old_best:.3f} s -> new {new_best:.3f} s "
              f"({old_best / new_best:.2f}x)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
