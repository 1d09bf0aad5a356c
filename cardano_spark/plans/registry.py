"""Aggregates every query family into the driver-facing registry."""

from __future__ import annotations

from cardano_spark.plans.oracles import RELATIONAL_ORACLES
from cardano_spark.plans.queries import RELATIONAL_QUERIES, QueryFn
from cardano_spark.plans.streamingq import (
    STREAMING_ORACLES,
    STREAMING_QUERIES,
)
from cardano_spark.plans.trainingdata import (
    TRAININGDATA_ORACLES,
    TRAININGDATA_QUERIES,
)


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    out.update(RELATIONAL_QUERIES)
    out.update(TRAININGDATA_QUERIES)
    out.update(STREAMING_QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    out.update(TRAININGDATA_ORACLES)
    out.update(STREAMING_ORACLES)
    return out
