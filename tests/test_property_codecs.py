"""Property-based (hypothesis) tests for the byte/text codecs — the
places where a hand-picked fixture can miss an escaping or framing
edge case. Spark-backed properties batch many generated rows into one
job per example so the suite stays fast."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cardano_spark.operators import multimodal as MM
from cardano_spark.sources.jdbc import (
    decode_pg_text_array,
    encode_pg_text_array,
)

# printable-ish unicode without NUL (PG text can't hold NUL) and
# without surrogates (not valid in UTF-8 transport)
_pg_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=12,
)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            st.one_of(st.none(), _pg_text), min_size=0, max_size=5
        ),
        min_size=10,
        max_size=30,
    )
)
def test_pg_array_codec_roundtrip_property(spark, arrays):
    """decode(encode(arr)) == arr for arbitrary text elements —
    quotes, backslashes, braces, commas, empty strings, unicode, and
    NULL elements (PG's unquoted NULL word, docs §8.15.6)."""
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i long, arr array<string>"
    )
    out = df.select(
        "i",
        decode_pg_text_array(encode_pg_text_array(F.col("arr"))).alias("rt"),
    ).collect()
    got = {r.i: r.rt for r in out}
    for i, a in enumerate(arrays):
        assert got[i] == a, (i, a, got[i])


@settings(max_examples=60, deadline=None)
@given(
    width=st.integers(1, 48),
    height=st.integers(1, 24),
    byte_val=st.integers(0, 255),
)
def test_png_synth_decode_roundtrip_property(width, height, byte_val):
    got = MM.decode_media(MM.synthesize_png(width, height, byte_val), "image/png")
    assert (got["width"], got["height"], got["n_channels"]) == (width, height, 3)


@settings(max_examples=60, deadline=None)
@given(
    n_channels=st.integers(1, 2),
    rate=st.integers(4000, 96000),
    frames=st.integers(0, 500),
)
def test_wav_synth_decode_roundtrip_property(n_channels, rate, frames):
    got = MM.decode_media(MM.synthesize_wav(n_channels, rate, frames), "audio/wav")
    assert (got["n_channels"], got["sample_rate"], got["n_samples"]) == (
        n_channels,
        rate,
        frames,
    )


@settings(max_examples=60, deadline=None)
@given(
    did=st.integers(0, 10_000),
    out_w=st.integers(1, 20),
    out_h=st.integers(1, 12),
)
def test_resize_checksum_matches_arithmetic_property(did, out_w, out_h):
    """The q49 oracle rule generalized: for ANY output dims the
    resized pixel checksum equals the floor-mapping arithmetic."""
    resized = MM.resize_image_nn(MM.synthesize_png_gradient(did), out_w, out_h)
    w, h, ch, px = MM._png_pixels(resized)
    assert (w, h, ch) == (out_w, out_h, 3)
    ws, hs = 1 + did % 16, 1 + did % 8
    pred = 3 * sum(
        (did * 7 + (u * ws // out_w) * 3 + (v * hs // out_h) * 5) % 256
        for u in range(out_w)
        for v in range(out_h)
    )
    assert sum(px) == pred


def test_pg_array_codec_documented_edge_cases(spark):
    """Pinned examples of PG's documented literal forms (docs
    §8.15.6): empty array, empty-string element, NULL element vs the
    literal string 'NULL', and every metacharacter class."""
    cases = [
        (0, [], "{}"),
        (1, [""], '{""}'),
        (2, [None], "{NULL}"),
        (3, ["NULL"], '{"NULL"}'),  # string 'NULL' must stay a string
        (4, ['a"b', "c\\d", "e,f", "{g}"], None),  # escaping round-trip
        (5, [None, "", "x"], '{NULL,"","x"}'),
    ]
    df = spark.createDataFrame(
        [(i, a) for i, a, _ in cases], "i long, arr array<string>"
    )
    from cardano_spark.sources.jdbc import (
        decode_pg_text_array,
        encode_pg_text_array,
    )

    out = {
        r.i: (r.lit, r.rt)
        for r in df.select(
            "i",
            encode_pg_text_array(F.col("arr")).alias("lit"),
            decode_pg_text_array(
                encode_pg_text_array(F.col("arr"))
            ).alias("rt"),
        ).collect()
    }
    for i, arr, want_lit in cases:
        lit, rt = out[i]
        if want_lit is not None:
            assert lit == want_lit, (i, lit)
        assert rt == arr, (i, arr, rt)


def test_pg_array_codec_spark_duckdb_twins_agree(spark):
    """The DuckDB SQL twins must stay bit-identical with the Spark
    expressions (the q45 oracle depends on it), including NULLs."""
    import duckdb

    from cardano_spark.sources.jdbc import (
        decode_pg_text_array_sql,
        encode_pg_text_array,
        encode_pg_text_array_sql,
    )

    rows = [
        (0, ["a", None, 'q"x', "b\\c", "", "{d,e}"]),
        (1, []),
        (2, [None]),
        (3, ["NULL", "plain"]),
    ]
    df = spark.createDataFrame(rows, "i long, arr array<string>")
    spark_lit = {
        r.i: r.lit
        for r in df.select(
            "i", encode_pg_text_array(F.col("arr")).alias("lit")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            "(%d, %s)"
            % (
                i,
                "["
                + ", ".join(
                    "NULL" if e is None else "'" + e.replace("'", "''") + "'"
                    for e in arr
                )
                + "]",
            )
            for i, arr in rows
        )
        + ") v(i, arr)"
    )
    enc = encode_pg_text_array_sql("arr")
    duck = dict(
        con.execute(f"SELECT i, {enc} FROM t ORDER BY i").fetchall()
    )
    assert duck == spark_lit
    dec = decode_pg_text_array_sql(f"({enc})")
    rt = dict(con.execute(f"SELECT i, {dec} FROM t ORDER BY i").fetchall())
    assert rt == {i: arr for i, arr in rows}
    con.close()


def test_copy_text_row_encodes_arrays_as_pg_literals():
    from cardano_spark.sinks.merge import encode_copy_text_row

    row = encode_copy_text_row([7, ["a", None, 'q"x', "b\\c"], None, "plain"])
    f = row.split("\t")
    assert f[0] == "7"
    # PG array literal, with COPY-level backslash escaping applied on top
    assert f[1] == '{"a",NULL,"q\\\\"x","b\\\\\\\\c"}'
    assert f[2] == r"\N" and f[3] == "plain"


def test_sql_literal_rejects_non_finite_floats():
    import pytest

    from cardano_spark.sources.jdbc import _sql_literal

    assert _sql_literal(1.5) == "1.5"
    for bad in (float("inf"), float("-inf"), float("nan")):
        with pytest.raises(ValueError):
            _sql_literal(bad)


# -- round-6 text operators --------------------------------------------------

_doc_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    max_size=40,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_doc_text, min_size=1, max_size=16))
def test_normalize_text_idempotent_property(spark, texts):
    """normalize(normalize(x)) == normalize(x) for arbitrary unicode,
    and the DuckDB twin produces the identical string — the property
    that makes q157's digest grouping a fixed point."""
    import duckdb

    from cardano_spark.operators import curation as CU

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    once = {
        r.i: r.n
        for r in df.select(
            "i", CU.normalize_text(F.col("t")).alias("n")
        ).collect()
    }
    twice = {
        r.i: r.n
        for r in df.select(
            "i",
            CU.normalize_text(CU.normalize_text(F.col("t"))).alias("n"),
        ).collect()
    }
    assert twice == once
    con = duckdb.connect()
    for i, t in enumerate(texts):
        got = con.execute(
            f"SELECT {CU.normalize_text_sql('?')}", [t]
        ).fetchone()[0]
        assert got == once[i], (i, t)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_winnowing_matches_sequential_reference_property(spark, docs):
    """winnowing_fingerprints on random small-alphabet token streams
    equals the sequential reference (min per window, ties leftmost,
    distinct) — the small alphabet forces hash ties and repeated
    k-grams, the cases a fixture misses."""
    import hashlib

    from cardano_spark.operators import dedup as DD

    k, w = 3, 2
    frame = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {}
    for r in DD.winnowing_fingerprints(frame, "doc_id", "text", k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))

    def md5_long(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for i, toks in enumerate(docs):
        toks = " ".join(toks).split(" ")  # empty list -> [''], as Spark
        hs = [
            (md5_long(" ".join(toks[j : j + k])), j + 1)
            for j in range(len(toks) - k + 1)
        ]
        expect = set()
        for s in range(len(hs) - w + 1):
            h, pos = min(hs[s : s + w])
            expect.add((pos, h))
        assert got.get(i, set()) == expect, i


_gopher_token = st.sampled_from(
    ["the", "be", "to", "of", "and", "word", "ab", "x", "1234", "#",
     "...", "•", "- ", "end...", "…", "αβ", "longishword"]
)
_gopher_line = st.lists(_gopher_token, min_size=0, max_size=12).map(
    " ".join
)
_gopher_doc = st.one_of(
    st.none(),
    st.lists(_gopher_line, min_size=1, max_size=4).map("\n".join),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_gopher_doc, min_size=1, max_size=16))
def test_gopher_flags_cross_engine_and_reference_property(spark, texts):
    """gopher_quality_flags == its DuckDB twin == a direct Python
    restatement of the Rae et al. rules, on adversarial documents
    (bullets, ellipses, symbols, non-Latin tokens, newlines, NULL) —
    agreement with the REFERENCE pins intent, not just cross-engine
    consistency."""
    import re

    import duckdb

    from cardano_spark.operators import curation as CU

    def ref(text):
        t = text or ""
        toks = t.split(" ")
        lines = t.split("\n")
        n_words, n_lines = len(toks), len(lines)
        n_chars = sum(len(x) for x in toks)
        n_sym = len(re.findall(r"#|\.\.\.", t))
        n_bullet = sum(
            ln.startswith("•") or ln.startswith("- ") for ln in lines
        )
        n_ell = sum(
            ln.endswith("...") or ln.endswith("…") for ln in lines
        )
        n_alpha = sum(bool(re.search("[a-zA-Z]", x)) for x in toks)
        n_req = sum(w in toks for w in CU.GOPHER_REQUIRED_WORDS)
        rules = [
            50 <= n_words <= 100_000,
            3 * n_words <= n_chars <= 10 * n_words,
            10 * n_sym <= n_words,
            10 * n_bullet <= 9 * n_lines,
            10 * n_ell <= 3 * n_lines,
            5 * n_alpha >= 4 * n_words,
            n_req >= 2,
        ]
        flags = sum((1 << i) for i, r in enumerate(rules) if r)
        return (n_words, flags, int(flags == 127))

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.flags, r.keep)
        for r in CU.gopher_quality_flags(df, "doc_id", "text").collect()
    }
    for i, t in rows:
        assert got[i] == ref(t), (i, t)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for did, nw, fl, kp in con.execute(
        CU.gopher_quality_flags_sql("doc_id")
    ).fetchall():
        assert got[did] == (nw, fl, kp), did


@settings(max_examples=6, deadline=None)
@given(
    lens=st.lists(st.integers(1, 30), min_size=1, max_size=60),
    budget=st.integers(4, 64),
)
def test_length_batch_report_matches_reference_property(
    spark, lens, budget
):
    """length_batch_report == a sequential replay of the budget-slice
    rule for arbitrary length multisets and budgets, under scrambled
    input partitioning."""
    from cardano_spark.operators import curation as CU

    rows = [(i, "w " * (n - 1) + "x") for i, n in enumerate(lens)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(5)
    n = F.size(F.split(F.col("text"), " "))
    got = {
        r.batch_id: (r.n_docs, r.max_len, r.sum_tokens, r.padded_tokens,
                     r.waste_fp)
        for r in CU.length_batch_report(
            docs, "doc_id", n, budget=budget, range_partitions=3
        ).collect()
    }
    ref: dict = {}
    cum = 0
    for ln, _ in sorted((n, i) for i, n in enumerate(lens)):
        b = cum // budget
        d, m, s = ref.get(b, (0, 0, 0))
        ref[b] = (d + 1, max(m, ln), s + ln)
        cum += ln
    assert set(got) == set(ref)
    for b, (d, m, s) in ref.items():
        pad = m * d
        waste = ((pad - s) * 1048576) // pad
        assert got[b] == (d, m, s, pad, waste), b


@settings(max_examples=6, deadline=None)
@given(
    run_len=st.integers(8, 14),
    prefix=st.integers(0, 6),
    data=st.data(),
)
def test_winnowing_contamination_guarantee_property(
    spark, run_len, prefix, data
):
    """The decontamination guarantee on randomized plants: a train
    doc embedding a >= w+k-1 = 8-token run from a bench doc is
    ALWAYS flagged, wherever the run sits in either document."""
    from cardano_spark.operators import dedup as DD

    vocab = [f"t{j}" for j in range(40)]
    run = [
        data.draw(st.sampled_from(vocab), label=f"run{j}")
        for j in range(run_len)
    ]
    bench_pad = [
        data.draw(st.sampled_from(vocab), label=f"bp{j}")
        for j in range(data.draw(st.integers(0, 5), label="bpn"))
    ]
    train_pad = [f"z{j}" for j in range(prefix)]  # disjoint filler
    bench = spark.createDataFrame(
        [(100, " ".join(bench_pad + run))], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, " ".join(train_pad + run + ["z90", "z91"])),
            (2, " ".join(f"q{j}" for j in range(12))),  # disjoint
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.contaminated
        for r in DD.winnowing_contamination(
            docs, bench, "doc_id", "text", k=5, w=4
        ).collect()
    }
    assert got[1] == 1, (run, prefix)
    assert got[2] == 0
