"""The training-data operator library composed into ONE deployable
corpus build — the pipeline a user actually runs end to end:

    exact dedup -> near-dup dedup (MinHash/LSH -> connected
    components -> representative election) -> benchmark
    decontamination -> quality gate -> optional DSIR target
    selection -> optional PPS token budget -> deterministic sharded
    export with manifest

with a per-stage audit of what each gate dropped. Every stage is an
operator that is individually oracle-verified in the registry (q21,
q22/q44/q72/q104, q58, q30, the shard sink's pytest goldens); this
module only composes them, adding no new semantics — so the
pipeline's correctness budget is the sum of its parts.

Scale notes: the stages communicate through SLIM id frames
(drop-lists and keep-lists are one id per row, applied as
semi/anti joins against the corpus — the q104 apply shape); the
corpus text itself flows straight from the source scan to the shard
writer. No stage collects rows to the driver; the audit counts are
aggregate scalars.

The reference has no analogue (its pipelines stop at warehouse
load, src/etl_pipelines/); this is the beyond-reference capstone the
operator families build toward.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cardano_spark.functions import text as TX
from cardano_spark.functions.hashing import md5_long
from cardano_spark.operators import curation as CU
from cardano_spark.operators import dedup as DD
from cardano_spark.sinks.shards import ShardManifest, write_training_shards


@dataclass(frozen=True)
class CorpusAudit:
    """Per-stage survivor counts (each stage's input is the previous
    stage's output) plus the final shard manifest."""

    n_input: int
    n_after_exact: int
    n_after_neardup: int
    n_after_decontam: int
    n_after_quality: int
    manifest: ShardManifest
    #: survivors after the optional DSIR target-selection stage
    #: (== n_after_quality when the stage is off)
    n_after_select: int = -1
    #: survivors after the optional PPS token-budget stage
    #: (== n_after_select when the stage is off)
    n_after_budget: int = -1


def _drop_neardup(docs: DataFrame, threshold: float) -> DataFrame:
    """Near-dup stage: MinHash/LSH pairs -> connected components ->
    keep the longest doc per cluster (ties -> lowest id) — q104's
    detect/choose/apply chain as a reusable step. The drop-list is
    one id per dropped doc; it applies as an anti join."""
    pairs = DD.minhash_lsh_pairs(
        docs,
        "doc_id",
        TX.distinct_tokens(F.coalesce(F.col("text"), F.lit(""))),
        threshold=threshold,
    )
    comp = DD.connected_components(
        docs.select("doc_id"),
        pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")),
        id_col="doc_id",
    ).select(F.col("node").alias("doc_id"), "cluster_id")
    members = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    reps = DD.cluster_representatives(
        members, "cluster_id", "doc_id", "n_chars"
    ).filter(F.col("n_members") >= 2)
    dropped = (
        comp.join(reps.select("cluster_id", "rep_id"), "cluster_id")
        .filter(F.col("doc_id") != F.col("rep_id"))
        .select("doc_id")
    )
    return docs.join(dropped, "doc_id", "left_anti")


def build_corpus(
    spark: SparkSession,
    docs: DataFrame,
    dest: str,
    benchmark: DataFrame | None = None,
    neardup_threshold: float = 0.8,
    contamination_max: float = 0.5,
    min_quality: float = 0.0,
    min_tokens: int = 1,
    n_shards: int = 8,
    target: DataFrame | None = None,
    select_top: int | None = None,
    token_budget_points: int | None = None,
) -> CorpusAudit:
    """Run the full corpus build over a ``documents``-shaped frame
    (doc_id, text, lang, source, n_chars) and write the surviving
    documents as deterministic training shards under ``dest``.

    ``benchmark``: an optional frame with a ``text`` column (the
    eval set); documents whose distinct 3-gram shingles overlap it
    above ``contamination_max`` are dropped (q58's gate). When
    absent the decontamination stage is a no-op.

    ``target`` + ``select_top``: optional DSIR target selection
    (q118's gate) — score quality survivors against the target
    corpus with hashed-2-gram importance weights and keep the
    ``select_top`` most target-like. The PIPELINE uses
    ``weight_mode="ratio_fp"`` deliberately: the log mode's float
    sums depend on partial-aggregation order, so a top-k boundary
    tie could flip between runs — exact-integer weights keep the
    two-run determinism guarantee below. Both or neither.

    ``token_budget_points``: optional systematic PPS draw (q120) —
    keep the documents selected by ``k`` equally-spaced points on
    the selection survivors' token stream, bounding the exported
    token volume at ~total/k granularity without favoring short
    documents. Deterministic by construction.

    Determinism: every gate's survivor set is a pure function of the
    input corpus (deterministic survivor rules all the way down), and
    shard membership is a pure function of the content hash — two
    runs over the same input produce identical shards and manifest
    (pinned by tests/test_corpus_pipeline.py).
    """
    n_input = docs.count()

    # 1. exact dedup: keep the smallest id per content digest
    canonical = DD.exact_dedup_groups(docs, "doc_id", "text").select(
        F.col("canonical_id").alias("doc_id")
    )
    exact = docs.join(canonical, "doc_id", "left_semi")
    n_exact = exact.count()

    # 2. near-dup dedup (detect -> cluster -> elect -> apply)
    near = _drop_neardup(exact, neardup_threshold)
    n_near = near.count()

    # 3. benchmark decontamination (optional)
    if benchmark is not None:
        contam = CU.benchmark_contamination(
            near,
            benchmark,
            "doc_id",
            TX.ngram_shingles(F.coalesce(F.col("text"), F.lit("")), 3),
            TX.ngram_shingles(F.coalesce(F.col("text"), F.lit("")), 3),
        )
        clean_ids = contam.filter(
            F.col("contamination") <= F.lit(float(contamination_max))
        ).select("doc_id")
        near = near.join(clean_ids, "doc_id", "left_semi")
    n_decontam = near.count()

    # 4. quality gate (shared q30 formula + a token floor)
    toks = F.size(TX.tokens(F.coalesce(F.col("text"), F.lit(""))))
    kept = near.filter(
        (TX.quality_score(F.col("text")) >= F.lit(float(min_quality)))
        & (toks >= F.lit(int(min_tokens)))
    )
    n_quality = kept.count()

    # 5. optional DSIR target selection (exact-integer weights: the
    # log mode's float sums are partial-agg-order-dependent and
    # would break the two-run determinism pin)
    if (target is None) != (select_top is None):
        raise ValueError("target and select_top must be given together")
    if target is not None:
        sh = TX.ngram_shingles(F.coalesce(F.col("text"), F.lit("")), 2)
        scores = CU.dsir_scores(
            kept, target, "doc_id", sh, sh, weight_mode="ratio_fp"
        )
        chosen = (
            scores.orderBy(F.desc("score_fp"), F.asc("doc_id"))
            .limit(int(select_top))
            .select("doc_id")
        )
        kept = kept.join(chosen, "doc_id", "left_semi")
    n_select = kept.count()

    # 6. optional PPS token budget (deterministic systematic draw)
    if token_budget_points is not None:
        toks_b = F.size(TX.tokens(F.coalesce(F.col("text"), F.lit(""))))
        picked = CU.pps_systematic_sample(
            kept, "doc_id", toks_b, k=int(token_budget_points)
        ).select("doc_id")
        kept = kept.join(picked, "doc_id", "left_semi")
    n_budget = kept.count()

    # 7. deterministic sharded export (content-hash shard key)
    sharded = kept.withColumn(
        "_shard_key",
        md5_long(F.concat(F.lit("corpus|"), F.col("doc_id").cast("string"))),
    )
    manifest = write_training_shards(sharded, dest, "_shard_key", n_shards)

    return CorpusAudit(
        n_input=n_input,
        n_after_exact=n_exact,
        n_after_neardup=n_near,
        n_after_decontam=n_decontam,
        n_after_quality=n_quality,
        manifest=manifest,
        n_after_select=n_select,
        n_after_budget=n_budget,
    )
