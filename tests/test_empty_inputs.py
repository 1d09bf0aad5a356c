"""Empty-input robustness: every pair/similarity/dedup operator must
return an EMPTY frame (not raise, not divide by zero) when its input
slice is empty — the situation every incremental run hits on a quiet
watermark window."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cardano_spark.catalog import table
from cardano_spark.functions import text as TX
from cardano_spark.operators import dedup as DD
from cardano_spark.operators import multimodal as MM
from cardano_spark.operators import similarity as SIM
from cardano_spark.operators.relational import asof_join_prev, range_join_count
from tests.conftest import SF_SMALL


@pytest.fixture()
def no_docs(spark):
    return table(spark, SF_SMALL, "documents").filter(F.lit(False))


def test_dedup_operators_on_empty_corpus(spark, no_docs):
    sh = TX.distinct_tokens(F.col("text"))
    assert DD.exact_dedup_groups(no_docs, "doc_id", "text").count() == 0
    assert DD.minhash_lsh_pairs(no_docs, "doc_id", sh, threshold=0.5).count() == 0
    for strategy in ("prefix", "count"):
        assert (
            DD.ngram_jaccard_pairs(
                no_docs, "doc_id", "lang", sh, threshold=0.3, strategy=strategy
            ).count()
            == 0
        )
    fp = DD.simhash(DD.md5_long_arr(sh))
    assert DD.simhash_pairs(no_docs, "doc_id", fp, max_hamming=8).count() == 0


def test_similarity_operators_on_empty_corpus(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    empty = emb.filter(F.lit(False))
    # empty corpus, non-empty probes
    probes = emb.limit(2)
    assert SIM.brute_force_topk(empty, probes, "vec_id", "embedding", k=3).count() == 0
    # non-empty corpus, empty probes
    assert SIM.brute_force_topk(emb, empty, "vec_id", "embedding", k=3).count() == 0


def test_relational_operators_on_empty_sides(spark):
    ev = table(spark, SF_SMALL, "events")
    empty = ev.filter(F.lit(False))
    views = ev.filter(F.col("event_type") == "view")
    # empty left: no rows out; empty right: left rows with NULL match
    out = asof_join_prev(
        empty.select("user_id", "ts", "event_id"),
        views.select("user_id", "ts", "event_id"),
        on=["user_id"],
        order=["ts", "event_id"],
        carry=["event_id"],
    )
    assert out.count() == 0
    clicks = ev.filter(F.col("event_type") == "click").limit(5)
    out2 = range_join_count(
        clicks.select("user_id", "ts", "event_id"),
        empty.select("user_id", "ts"),
        on=["user_id"],
        left_point_us=F.unix_micros("ts"),
        right_point_us=F.unix_micros("ts"),
        window_us=600 * 1_000_000,
    )
    assert out2.count() == 5  # zero-match rows kept with count 0
    assert out2.agg(F.max("n_in_range")).collect()[0][0] == 0


def test_multimodal_on_empty_ids(spark, no_docs):
    assert MM.image_resize_features(no_docs, 8, 4).count() == 0
    assert MM.audio_frame_sample_features(no_docs, 4).count() == 0
    assert MM.decode_media_features(MM.synthesize_media(no_docs)).count() == 0
