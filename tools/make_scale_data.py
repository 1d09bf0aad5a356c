"""Derive a PERF-VALIDATION dataset at a larger scale factor from a
driver-provided drop by replicating it with shifted keys.

    python tools/make_scale_data.py /root/testdata/sf0.1 .scale/sf1 10

This is NOT a correctness input (the oracles always run on the
driver's own drops): it exists to validate that the headline plans
scale ~linearly one order of magnitude above the bench SF — the
empirical check that would have caught the forced-broadcast family
(VERDICT r4 "What's wrong #1") before a cluster did.

Replication rules (keep join fan-outs and entity counts scaling
together, avoid degenerate artifacts):

- region/nation: copied once — true dimensions, constant in TPC-H.
- customer/supplier/part/orders/lineitem: replica i shifts every key
  by i * 10^9 (far above any real key), FKs shifted consistently so
  per-replica join structure is identical to the source drop.
- events: event_id/user_id shifted — entities scale with the data.
- documents: doc_id shifted; for i > 0 every whitespace token gets a
  per-replica suffix, making cross-replica token sets DISJOINT:
  near-dup pair structure is preserved within each replica and no
  artificial duplicate family spans replicas (10x data -> ~10x pairs,
  not 100x).
- embeddings: vec_id shifted, vectors copied (fine for timing; ANN
  queries probe by id and the probe ids stay in replica 0).
"""

from __future__ import annotations

import os
import sys

SHIFT = 1_000_000_000


def main() -> None:
    src, dest, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from cardano_spark.catalog import TABLES, table
    from cardano_spark.session import get_spark

    spark = get_spark("make-scale-data")
    os.makedirs(dest, exist_ok=True)

    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for name in TABLES:
        df = table(spark, src, name)
        out_path = os.path.join(dest, f"{name}.parquet")
        if name in ("region", "nation"):
            df.write.mode("overwrite").parquet(out_path)
            continue
        reps = []
        for i in range(factor):
            r = df
            for k in key_cols[name]:
                r = r.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if name == "documents" and i > 0:
                r = r.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda t: F.concat(t, F.lit(f"§{i}")),
                        ),
                    ),
                )
            reps.append(r)
        full = reps[0]
        for r in reps[1:]:
            full = full.unionByName(r)
        full.write.mode("overwrite").parquet(out_path)
        print(f"{name}: x{factor} written")
    spark.stop()


if __name__ == "__main__":
    main()
