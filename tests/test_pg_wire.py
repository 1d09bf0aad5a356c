"""Server-less unit tests for the stdlib PG wire client's pure
codecs (the live-server path is exercised by
test_pg_live_conformance.py when a server is reachable)."""

from __future__ import annotations

from decimal import Decimal

import pytest

from cardano_spark.sources import pg_wire


def test_array_literal_parse():
    p = pg_wire._parse_array
    assert p("{}") == []
    assert p("{a,b}") == ["a", "b"]
    assert p('{x,"quo\\"te",NULL}') == ["x", 'quo"te', None]
    assert p('{"a,b","c\\\\d"}') == ["a,b", "c\\d"]


def test_param_interpolation_quoting():
    q = pg_wire._interpolate
    assert q("SELECT %s, %s", (None, True)) == "SELECT NULL, TRUE"
    assert q("SELECT %s", ("it's",)) == "SELECT 'it''s'"
    assert q("SELECT %s", (Decimal("1.5"),)) == "SELECT 1.5"
    assert (
        q("SELECT %s::text[]", (["a", None, 'q"t'],))
        == 'SELECT \'{"a",NULL,"q\\"t"}\'::text[]'
    )
    with pytest.raises(pg_wire.DatabaseError):
        q("SELECT %s, %s", (1,))


def test_param_interpolation_percent_escape():
    q = pg_wire._interpolate
    # %% is a literal percent (DB-API format style), including the
    # %s-inside-a-string-constant case ADVICE r7 flagged
    assert q("SELECT x LIKE 'a%%sb' OR y = %s", (1,)) == (
        "SELECT x LIKE 'a%sb' OR y = 1"
    )
    assert q("SELECT '100%%', %s", (2,)) == "SELECT '100%', 2"
    # a lone % not forming %s or %% passes through
    assert q("SELECT x %> %s", (3,)) == "SELECT x %> 3"
    # no params -> text untouched (psycopg semantics)
    assert q("SELECT '50%s'", None) == "SELECT '50%s'"


def test_decode_by_oid():
    d = pg_wire._decode
    assert d(20, b"42") == 42
    assert d(16, b"t") is True and d(16, b"f") is False
    assert d(701, b"3.5") == 3.5
    assert d(1700, b"1.25") == Decimal("1.25")
    assert d(1009, b'{x,"a b"}') == ["x", "a b"]
    assert d(25, b"plain") == "plain"


def test_autocommit_toggle_guard():
    class FakeConn(pg_wire.Connection):
        def __init__(self):  # no socket
            self._autocommit = False
            self._in_txn = True

    c = FakeConn()
    with pytest.raises(pg_wire.DatabaseError):
        c.autocommit = True


def test_array_quote_parse_roundtrip_property():
    """Hypothesis inverse property: any list of optional strings
    survives _quote (array-literal form, outer quotes stripped) ->
    _parse_array unchanged — the client-side encode and the
    server-output decode agree on the same grammar."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.lists(
        st.one_of(
            st.none(),
            st.text(
                alphabet=st.characters(
                    blacklist_categories=("Cs",), blacklist_characters="\x00"
                ),
                max_size=12,
            ).filter(lambda s: s != "NULL"),
        ),
        max_size=6,
    )

    @given(texts)
    @settings(max_examples=200, deadline=None)
    def check(xs):
        lit = pg_wire._quote(xs)
        assert lit.startswith("'") and lit.endswith("'")
        inner = lit[1:-1].replace("''", "'")
        assert pg_wire._parse_array(inner) == [
            None if x is None else str(x) for x in xs
        ]

    check()
