"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-join analytics query at
sf0.001; ``queries()`` exposes every implemented operator from
SURVEY.md §2 as ``(spark, sf_dir) -> DataFrame``; ``oracle_sql()``
holds the DuckDB twin of each (same column names, deterministic
values — see cardano_spark/plans/queries.py for the determinism
contract).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cardano_spark.plans.queries import q03_region_revenue

    return q03_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from cardano_spark.plans import registry

    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect twin for each key in ``queries()``."""
    from cardano_spark.plans import registry

    return registry.all_oracles()
