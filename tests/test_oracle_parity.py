"""Every declared query must hash-match its DuckDB oracle at sf0.001
— the same comparison the driver applies at sf0.01 (row count, sorted
column names, order-insensitive canonical value hash)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tools.check_correctness import canon

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_an_oracle_or_is_flagged():
    missing = [k for k in QUERIES if k not in ORACLES]
    # non-SQL-expressible ops may be missing; keep the list explicit
    allowed_rows_only = set()
    assert set(missing) <= allowed_rows_only, f"queries without oracle: {missing}"


def test_no_orphan_oracles():
    orphans = [k for k in ORACLES if k not in QUERIES]
    assert not orphans, f"oracles without query: {orphans}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMALL).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0
        return
    odf = duck.execute(ORACLES[name]).fetchdf()
    sn, sc, sh, _ = canon(sdf)
    on, oc, oh, _ = canon(odf)
    assert sn == on, f"rowcount spark={sn} oracle={on}"
    assert sc == oc, f"columns spark={sc} oracle={oc}"
    assert sh == oh, f"value hash mismatch over {sn} rows"
