"""AQE runtime skew-join splitting: the engine's first line of
defense against hot keys (operators/skew.py salting is the
complementary plan-level tool for keys AQE can't split). Pins that
the session config actually lets AQE detect and split a skewed
shuffle partition — a silently-disabled AQE would only show up as a
straggler task at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

        # 99% of fact rows share key 0; dim is uniform
        fact = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        joined = fact.join(dim, "k")
        # execute THIS Dataset's plan (count() would spawn a separate
        # QueryExecution and leave this one un-finalized by AQE)
        assert len(joined.collect()) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_rare_ngram_scores_salted_path_is_identical(spark):
    """rare_ngram_scores(n_salts>0) routes its occ-vocab join through
    skew.salted_join (the wired escape hatch for the hot-key case AQE
    cannot split) and must produce ROW-IDENTICAL results to the
    default AQE path — salting only redistributes the shuffle. The
    A/B measurement that keeps n_salts=0 the default lives in
    BENCH_EXTENDED ("q145 occ-vocab salting A/B")."""
    from cardano_spark.catalog import table
    from cardano_spark.functions import text as TX
    from cardano_spark.operators import curation as CU
    from tests.conftest import SF_SMALL

    d = table(spark, SF_SMALL, "documents")
    grams = TX.word_ngrams(F.coalesce(F.col("text"), F.lit("")), 2)
    pred = F.pmod(F.col("doc_id"), F.lit(4)) == 0
    plain = CU.rare_ngram_scores(d, "doc_id", grams, pred, min_count=2)
    salted = CU.rare_ngram_scores(
        d, "doc_id", grams, pred, min_count=2, n_salts=8
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    # the salt actually reaches the join: the salted plan joins on
    # (_g, _salt), the plain plan must not
    salted_plan = salted._jdf.queryExecution().optimizedPlan().toString()
    plain_plan = plain._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in salted_plan
    assert "_salt" not in plain_plan
