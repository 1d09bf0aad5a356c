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
        st.lists(_pg_text, min_size=0, max_size=5), min_size=10, max_size=30
    )
)
def test_pg_array_codec_roundtrip_property(spark, arrays):
    """decode(encode(arr)) == arr for arbitrary text elements —
    quotes, backslashes, braces, commas, empty strings, unicode."""
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
