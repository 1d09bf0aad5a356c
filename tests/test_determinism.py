"""Partitioning-independence: the driver hashes VALUES, so any hidden
dependence on shuffle partition count (double re-association, per-
partition ids leaking into output, under-specified orderings) is a
correctness bug. Re-run a representative query slice under a
different shuffle.partitions and require identical canonical hashes."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tools.check_correctness import canon

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

#: one representative per determinism risk class
SLICE = [
    "q01_pricing_summary",        # decimal aggregation
    "q25_ngram_jaccard_pairs",    # blocked pair generation
    "q43_topn_per_group",         # spark_partition_id two-phase top-k
    "q44_dedup_clusters",         # iterative fixed point
    "q55_tfidf_top_terms",        # multi-window ties
    "q63_grouped_quantiles",      # percentile interpolation
    "q74_hll_distinct_sketch",    # scaled-int register sums
    "q80_trailing_anomaly",       # windowed frame sums
    "q88_integer_pagerank",       # iterative integer ranks
    "q90_gapfill_forward_fill",   # generated grid + carry-forward
    "q93_fuzzy_match_join",       # pigeonhole candidate dedup
    "q96_distribution_drift",     # sorted-fold scalar statistic
    "q101_peak_concurrency",      # sweep-line tie ordering
    "q102_copurchase_pairs",      # per-order pair expansion + top-k
]


@pytest.mark.parametrize("name", SLICE)
def test_result_independent_of_shuffle_partitions(spark, name):
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = canon(QUERIES[name](spark, SF_SMALL).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = canon(QUERIES[name](spark, SF_SMALL).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert a[:3] == b[:3], f"{name} result depends on partitioning"
