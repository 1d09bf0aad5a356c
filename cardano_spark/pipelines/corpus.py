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
from pyspark.sql import types as T

from cardano_spark.functions import text as TX
from cardano_spark.functions.hashing import hash_bucket, md5_long
from cardano_spark.operators import curation as CU
from cardano_spark.operators import dedup as DD
from cardano_spark.operators import similarity as SIM
from cardano_spark.sinks.shards import (
    IncrementalExportResult,
    ShardManifest,
    write_training_shards,
    write_training_shards_delta,
    write_training_shards_incremental,
)


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
    #: per-split survivor counts when ``split_mode`` is on
    #: ({"train": n, "val": n, "test": n}); None otherwise
    split_counts: dict | None = None
    #: per-split manifests when ``split_mode`` is on; None otherwise
    #: (``manifest`` then aggregates the three)
    split_manifests: dict | None = None
    #: path of the per-document attribute/provenance ledger when
    #: ``emit_attributes`` is on; None otherwise
    attributes_path: str | None = None
    #: survivors of the optional paragraph-grain dedup pre-stage
    #: (docs whose rebuilt text is non-empty); -1 when the stage is
    #: off
    n_after_paragraph: int = -1
    #: survivors after the optional SEMANTIC dedup stage (q109's
    #: SemDeDup flags over the caller-supplied embeddings, run
    #: between near-dup and decontamination per the D4 paper's
    #: ordering); -1 when the stage is off
    n_after_semantic: int = -1


def _drop_neardup(
    docs: DataFrame, threshold: float, rule: str = "cluster_longest"
) -> DataFrame:
    """Near-dup stage. Two drop rules, both applied as a slim anti
    join:

    - ``"cluster_longest"`` (default): MinHash/LSH pairs -> connected
      components -> keep the longest doc per cluster (ties -> lowest
      id) — q104's detect/choose/apply chain.
    - ``"keep_first_pairwise"``: drop every doc that has a verified
      pair with ANY smaller-id doc (the pair set's ``id_b`` side) —
      the q117/q136 arrival-gate rule. This is the rule an
      INCREMENTAL build can reproduce exactly (a new doc's fate
      depends only on already-seen docs, never on a future longer
      cluster member), so :func:`build_corpus_incremental` uses it
      and its convergence contract compares against a batch build
      with the same rule. It differs from cluster_longest on
      transitive clusters (no representative election).
    """
    pairs = DD.minhash_lsh_pairs(
        docs,
        "doc_id",
        TX.distinct_tokens_sexpr("coalesce(text, '')"),
        threshold=threshold,
    )
    if rule == "keep_first_pairwise":
        dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        return docs.join(dropped, "doc_id", "left_anti")
    if rule != "cluster_longest":
        raise ValueError(f"unknown neardup rule: {rule!r}")
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
    split_mode: str | None = None,
    shuffle_order: bool = False,
    normalize: bool = False,
    pack_budget: int | None = None,
    quality_rules: str | None = None,
    emit_attributes: bool = False,
    neardup_rule: str = "cluster_longest",
    decontam_mode: str = "drop",
    paragraph_dedup: bool = False,
    export_format: str = "parquet",
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.25,
    semantic_centroids: DataFrame | None = None,
    semantic_occupancy_cap: int | None = None,
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

    ``split_mode``: ``None`` (single export, no split), ``"doc"``
    (q41's per-document 80/10/10 content-hash rule), or
    ``"cluster_safe"`` (q137's rule: near-dup clusters over the
    EXPORT survivors at ``neardup_threshold`` are the assignment
    unit, so no verified near-dup pair can straddle a split boundary
    by construction — the fix for what the q132 audit measures;
    relevant even after the dedup stage, whose representative
    election leaves sub-threshold/residual families only when run
    at a different threshold, and always the safe default).
    Split exports land under ``dest/train|val|test`` with per-split
    manifests; the audit's ``manifest`` aggregates them.

    ``shuffle_order``: when True, export in q140's deterministic
    epoch-0 shuffle order instead of content-hash shard ranges: the
    salted-content-hash key (unique via the appended doc_id) defines
    a pseudo-random total order, ``curation.global_rank``'s
    distributed prefix sum assigns the 0-based position (never a
    single-partition global window), and shards are CONTIGUOUS
    position ranges, internally position-sorted — a loader reading
    shard 0..n in order consumes the exact global shuffle order, and
    each shard is an unbiased sample (a contiguous slice of a
    pseudo-random permutation; q140's modulo interleave is the
    row-level variant of the same guarantee). Retry/re-run/
    repartition stable like every other stage.

    ``normalize``: when True, ``curation.normalize_text`` rewrites
    the text column FIRST (zero-width/control strip, typographic
    punctuation to ASCII, whitespace collapse — the C4/CCNet
    pre-hashing cleanup), so every downstream gate — exact dedup,
    LSH shingles, contamination, quality, splits, shard hashing —
    sees normalized content; typography-only renditions collapse in
    the exact-dedup stage instead of slipping through (q157's
    demonstration, applied to the deployable pipeline). NULL text
    stays NULL. A shuffle-free projection; exported documents carry
    the normalized text.

    ``pack_budget``: when set, the export carries the TRAINER-facing
    packing columns (q60's machinery, ``curation.pack_sequences``):
    each surviving doc is annotated with the ``budget``-token
    training sequence its first token lands in (``seq_id``) and its
    offset there (``seq_offset``) — the concat-then-chunk layout a
    loader materializes without re-deriving the global token stream.
    Packing runs over the EXPORT ORDER: shuffle-order exports pack
    along the epoch-0 permutation (position order), plain exports
    pack in doc_id order; with splits, each split packs its own
    stream from sequence 0 (a loader never packs across split
    boundaries). The prefix sum is distributed (range partitions +
    broadcast offsets — never a global window).

    ``quality_rules``: ``"gopher"`` additionally requires every
    document to pass the full Gopher rule stack (q159,
    ``curation.gopher_flag_columns`` — word-count/mean-length
    bounds, symbol/bullet/ellipsis ratios, alpha fraction, required
    stopwords; all integer-exact). The flags compute INLINE in the
    stage-4 filter — no join, no extra exchange.

    ``paragraph_dedup``: when True, run q178's paragraph-grain dedup
    FIRST (CCNet stage 1): segment every document by content-defined
    chunking, drop every paragraph occurrence but the globally first
    (min ``(doc_id, para_idx)``), rewrite each document to its kept
    paragraphs in original order, and drop documents whose rebuild is
    empty. Every later gate — exact dedup, LSH shingles,
    decontamination, quality, splits, shard hashing — sees the
    rewritten text, exactly as CCNet feeds its doc-level stages.
    Composes with ``normalize`` (normalization first, so paragraph
    digests are over normalized text).

    ``export_format``: ``"parquet"`` (default) or ``"jsonl"`` — the
    shard serialization (sinks/shards.py; same manifest discipline,
    loader-facing newline-delimited JSON).

    ``embeddings``: an optional (doc_id, embedding) frame switching
    on the SEMANTIC dedup stage (q109's SemDeDup flags — the r10
    verdict's What's missing #1: the SemDeDup/D4 papers run
    semantic dedup as a corpus STAGE, not a side query). It runs
    between near-dup and decontamination, the D4 ordering: hash
    methods catch verbatim and shingle-level copies; the embedding
    pass catches paraphrase-level near-copies they miss. A doc is
    dropped iff its embedding row is flagged ``is_dup`` (cosine >
    ``semantic_threshold`` to a smaller-id same-cluster doc,
    keep-first); docs WITHOUT an embedding row are kept — the stage
    only ever judges what it can see. ``semantic_centroids``
    optionally pins the cluster model (the frozen-model form —
    ALSO what the incremental/batch convergence contract is stated
    under, since auto-k over different corpus sizes trains
    different models); when absent the stage self-seeds with
    ``assign="auto"`` + mode-keyed auto-k, the q180 discipline —
    or, with ``semantic_occupancy_cap`` set, the q193/q194
    occupancy regime (k = ceil(n/cap), three-level assignment tree,
    LINEAR pair join): the form a 100 TB corpus build opts into.

    ``emit_attributes``: when True, write a per-INPUT-document
    attribute/provenance ledger under ``dest/_attributes`` (the
    Dolma taggers-and-attributes design): tagger columns (token
    count, 2^20-quantized quality, Gopher flag bitmask, lang,
    source) plus one ``survived_<stage>`` flag per gate — the
    artifact that answers "why was this document dropped" without
    re-running the pipeline.

    Determinism: every gate's survivor set is a pure function of the
    input corpus (deterministic survivor rules all the way down), and
    shard membership is a pure function of the content hash — two
    runs over the same input produce identical shards and manifest
    (pinned by tests/test_corpus_pipeline.py).
    """
    if normalize:
        docs = docs.withColumn(
            "text", CU.normalize_text(F.col("text"))
        )
    n_input = docs.count()
    stage_ids: list[tuple[str, DataFrame]] = []
    # the per-INPUT-document frame the attribute ledger is built
    # from: captured post-normalize but PRE-paragraph-rewrite so
    # (a) documents dropped at the paragraph stage still get a
    # ledger row (survived_paragraph=0), and (b) the tagger columns
    # (n_tokens / quality_fp / gopher_flags) describe the INPUT
    # text, not the paragraph-deduped rewrite.
    input_docs = docs

    # 0. optional paragraph-grain dedup (CCNet stage 1, q178's
    # operator): rewrite every document to its paragraph-deduped
    # rebuild (keep-first over CDC chunks) and drop documents whose
    # every paragraph was claimed elsewhere. Runs BEFORE doc-level
    # exact dedup, as in CCNet — every downstream gate sees the
    # rewritten text.
    n_paragraph = -1
    if paragraph_dedup:
        reb = DD.paragraph_dedup(docs, "doc_id", "text")
        cols = docs.columns
        docs = (
            docs.drop("text")
            .join(
                reb.filter(F.col("cleaned_text") != F.lit("")).select(
                    "doc_id", F.col("cleaned_text").alias("text")
                ),
                "doc_id",
            )
            .select(*cols)
        )
        if "n_chars" in cols:
            docs = docs.withColumn(
                "n_chars", F.length("text").cast("long")
            )
        docs = docs.localCheckpoint(eager=False)
        n_paragraph = docs.count()
        stage_ids.append(("paragraph", docs.select("doc_id")))

    # Stage frames are lazily checkpointed and the audit count
    # materializes each one (the _cc_star_rounds one-pass discipline):
    # without the cut, every stage count and every downstream
    # consumer (next stage, split exports, attribute ledger) re-ran
    # the WHOLE prior chain — quadratic in pipeline depth (guide
    # §1.2/§5; measured r12: 7 counts = 3.6 s of a 5.4 s sf0.001
    # build). Counts are plan-independent, so the audit values are
    # bit-identical.
    # 1. exact dedup: keep the smallest id per content digest
    canonical = DD.exact_dedup_groups(docs, "doc_id", "text").select(
        F.col("canonical_id").alias("doc_id")
    )
    exact = docs.join(canonical, "doc_id", "left_semi").localCheckpoint(
        eager=False
    )
    n_exact = exact.count()
    stage_ids.append(("exact", exact.select("doc_id")))

    # 2. near-dup dedup (detect -> cluster -> elect -> apply)
    near = _drop_neardup(exact, neardup_threshold, neardup_rule).localCheckpoint(
        eager=False
    )
    n_near = near.count()
    stage_ids.append(("neardup", near.select("doc_id")))

    # 2.5 optional SEMANTIC dedup (q109's SemDeDup flags over the
    # caller's embeddings — the D4 ordering: after the hash family,
    # before decontamination). Drop = flagged dup; no embedding row
    # = kept. With semantic_centroids the model is frozen (the
    # convergence-contract form); else auto-routed mode + auto-k.
    n_semantic = -1
    if embeddings is not None:
        emb = near.select("doc_id").join(
            embeddings.select("doc_id", "embedding"), "doc_id"
        )
        # frozen model -> flat assignment (the exact serving rule of
        # the incremental twin, mode-independent of n — convergence
        # is stated under the same model AND the same argmax);
        # self-seeded -> the q180 auto routing, or the q193/q194
        # occupancy regime (k = ceil(n/cap), three-level tree,
        # LINEAR pair join — what a 100 TB corpus build opts into)
        # when semantic_occupancy_cap is set
        if semantic_centroids is not None:
            assign = "flat"
        elif semantic_occupancy_cap is not None:
            assign = "hierarchical3"
        else:
            assign = "auto"
        flags = SIM.semantic_dedup(
            emb, "doc_id", "embedding", n_centroids=8,
            threshold=float(semantic_threshold),
            centroids=semantic_centroids,
            auto_k=semantic_centroids is None,
            assign=assign,
            occupancy_cap=(
                semantic_occupancy_cap
                if semantic_centroids is None
                else None
            ),
        )
        near = near.join(
            flags.filter(F.col("is_dup") == 1).select(
                F.col("vec_id").alias("doc_id")
            ),
            "doc_id",
            "left_anti",
        )
        near = near.localCheckpoint(eager=False)
        n_semantic = near.count()
        stage_ids.append(("semantic", near.select("doc_id")))

    # 3. benchmark decontamination (optional).
    # "drop": q58's whole-document gate on the 3-gram overlap
    # fraction. "cut": q177's span-level excision — the document
    # keeps its clean text and only the verbatim benchmark spans are
    # removed (fully-excised or gutted documents then die at the
    # quality/min_tokens gate like any other thin document).
    if decontam_mode not in ("drop", "cut"):
        raise ValueError(f"unknown decontam_mode: {decontam_mode!r}")
    if benchmark is not None:
        if decontam_mode == "cut":
            cut = CU.decontaminate_spans(
                near, benchmark, "doc_id", "text", n=8
            )
            cols = near.columns
            near = (
                near.drop("text")
                .join(
                    cut.select(
                        "doc_id", F.col("cleaned_text").alias("text")
                    ),
                    "doc_id",
                )
                .select(*cols)
            )
            if "n_chars" in cols:
                near = near.withColumn(
                    "n_chars", F.length("text").cast("long")
                )
        else:
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
    near = near.localCheckpoint(eager=False)
    n_decontam = near.count()
    stage_ids.append(("decontam", near.select("doc_id")))

    # 4. quality gate (shared q30 formula + a token floor; optional
    # Gopher rule stack — q159's flags column inline, so the gate
    # stays a shuffle-free filter on the same scan)
    if quality_rules not in (None, "gopher"):
        raise ValueError(f"unknown quality_rules: {quality_rules!r}")
    toks = F.size(TX.tokens(F.coalesce(F.col("text"), F.lit(""))))
    # zero-token documents (possible after span-level excision) never
    # pass: the quality formula divides by the token count, so it is
    # evaluated behind the non-empty guard (CASE short-circuits under
    # ANSI mode; a bare `&` would still evaluate both sides and raise)
    qcond = TX.quality_score(F.col("text")) >= F.lit(float(min_quality))
    gate = (
        (toks >= F.lit(int(min_tokens)))
        & F.when(toks >= 1, qcond).otherwise(F.lit(False))
    )
    if quality_rules == "gopher":
        _, gflags = CU.gopher_flag_columns(F.col("text"))
        gate = gate & (gflags == F.lit(127))
    kept = near.filter(gate).localCheckpoint(eager=False)
    n_quality = kept.count()
    stage_ids.append(("quality", kept.select("doc_id")))

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
    if target is not None:
        kept = kept.localCheckpoint(eager=False)
    n_select = kept.count()
    stage_ids.append(("select", kept.select("doc_id")))

    # 6. optional PPS token budget (deterministic systematic draw)
    if token_budget_points is not None:
        toks_b = F.size(TX.tokens(F.coalesce(F.col("text"), F.lit(""))))
        picked = CU.pps_systematic_sample(
            kept, "doc_id", toks_b, k=int(token_budget_points)
        ).select("doc_id")
        kept = kept.join(picked, "doc_id", "left_semi")
    if token_budget_points is not None:
        kept = kept.localCheckpoint(eager=False)
    n_budget = kept.count()
    stage_ids.append(("budget", kept.select("doc_id")))

    # 7. optional split assignment (doc-level q41 rule, or q137's
    # cluster-safe rule over the export survivors)
    split_counts: dict | None = None
    if split_mode not in (None, "doc", "cluster_safe"):
        raise ValueError(f"unknown split_mode: {split_mode!r}")
    if split_mode is not None:
        if split_mode == "cluster_safe":
            pairs = DD.minhash_lsh_pairs(
                kept,
                "doc_id",
                TX.distinct_tokens_sexpr("coalesce(text, '')"),
                threshold=neardup_threshold,
            )
            comp = DD.connected_components(
                kept.select("doc_id"),
                pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b")),
                id_col="doc_id",
            ).select(F.col("node").alias("doc_id"), "cluster_id")
            kept = kept.join(comp, "doc_id")
            bucket = hash_bucket(F.col("cluster_id"), 100)
        else:
            bucket = hash_bucket(F.col("doc_id"), 100)
        kept = kept.withColumn(
            "split",
            F.when(bucket < 80, F.lit("train"))
            .when(bucket < 90, F.lit("val"))
            .otherwise(F.lit("test")),
        )
        if split_mode == "cluster_safe":
            kept = kept.drop("cluster_id")
        # the split column is consumed by three export branches and
        # the audit count — cut the (possibly LSH-bearing) lineage
        kept = kept.localCheckpoint(eager=False)
        split_counts = {
            r["split"]: r["n"]
            for r in kept.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        for s in ("train", "val", "test"):
            split_counts.setdefault(s, 0)

    # 8. deterministic sharded export: content-hash shard ranges, or
    # q140's epoch-0 shuffle order (contiguous position ranges);
    # optional q60 packing columns over the export order
    def _pack(frame: DataFrame, order_col: str) -> DataFrame:
        if pack_budget is None:
            return frame
        toks_n = F.size(
            TX.tokens(F.coalesce(F.col("text"), F.lit("")))
        ).cast("long")
        packed = CU.pack_sequences(
            frame.select(F.col(order_col), toks_n.alias("_nt")),
            order_col,
            F.col("_nt"),
            int(pack_budget),
        ).select(order_col, "seq_id", "seq_offset")
        return frame.join(packed, order_col)

    def _export(frame: DataFrame, path: str) -> ShardManifest:
        if shuffle_order:
            skey = F.concat(
                F.md5(
                    F.concat(F.lit("shuffle|"), F.col("doc_id").cast("string"))
                ),
                F.lit("|"),
                F.col("doc_id").cast("string"),
            )
            # rank over the SLIM key frame (q140's shape: only the
            # 45-byte key rides the prefix-sum exchange), join back
            ranked = CU.global_rank(
                frame.select(skey.alias("_skey")), "_skey", 32
            )
            ordered = (
                frame.withColumn("_skey", skey)
                .join(ranked, "_skey")
                .withColumn("_order", F.col("_rank").cast("long"))
                .drop("_skey", "_rank")
            )
            return write_training_shards(
                _pack(ordered, "_order"), path, "_order", n_shards,
                fmt=export_format,
            )
        sharded = _pack(frame, "doc_id").withColumn(
            "_shard_key",
            md5_long(F.concat(F.lit("corpus|"), F.col("doc_id").cast("string"))),
        )
        return write_training_shards(
            sharded, path, "_shard_key", n_shards, fmt=export_format
        )

    split_manifests: dict | None = None
    if split_mode is None:
        manifest = _export(kept, dest)
    else:
        split_manifests = {
            s: _export(kept.filter(F.col("split") == s), f"{dest}/{s}")
            for s in ("train", "val", "test")
        }
        manifest = ShardManifest(
            n_shards=sum(m.n_shards for m in split_manifests.values()),
            n_rows=sum(m.n_rows for m in split_manifests.values()),
            total_bytes=sum(m.total_bytes for m in split_manifests.values()),
            shards=[
                dict(sh, file=f"{s}/{sh['file']}")
                for s in ("train", "val", "test")
                for sh in split_manifests[s].shards
            ],
        )

    # optional per-document attribute/provenance ledger (the Dolma
    # taggers-and-attributes design): one row per INPUT document with
    # its tagger values (token count, quantized quality, Gopher flag
    # bitmask) and a survived_<stage> flag per gate — the artifact
    # that answers "why was this document dropped" without re-running
    # the pipeline. Slim id-frame joins only; written next to the
    # shards so the export is self-describing.
    attributes_path = None
    if emit_attributes:
        toks_a = F.size(TX.tokens(F.coalesce(F.col("text"), F.lit(""))))
        qfp = F.when(
            F.col("text").isNotNull() & (F.length("text") > 0),
            F.floor(
                TX.quality_score(F.col("text")) * F.lit(1048576.0)
            ).cast("long"),
        )
        _, gflags = CU.gopher_flag_columns(F.col("text"))
        ledger = input_docs.select(
            "doc_id",
            "lang",
            "source",
            toks_a.cast("long").alias("n_tokens"),
            qfp.alias("quality_fp"),
            gflags.alias("gopher_flags"),
        )
        for name, frame in stage_ids:
            ledger = ledger.join(
                frame.withColumn(f"_s_{name}", F.lit(1)), "doc_id", "left"
            )
        ledger = ledger.select(
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            "quality_fp",
            "gopher_flags",
            *[
                F.coalesce(F.col(f"_s_{name}"), F.lit(0))
                .cast("int")
                .alias(f"survived_{name}")
                for name, _ in stage_ids
            ],
        )
        attributes_path = f"{dest}/_attributes"
        ledger.write.mode("overwrite").parquet(attributes_path)

    return CorpusAudit(
        n_input=n_input,
        n_after_exact=n_exact,
        n_after_neardup=n_near,
        n_after_decontam=n_decontam,
        n_after_quality=n_quality,
        manifest=manifest,
        n_after_select=n_select,
        n_after_budget=n_budget,
        split_counts=split_counts,
        split_manifests=split_manifests,
        attributes_path=attributes_path,
        n_after_paragraph=n_paragraph,
        n_after_semantic=n_semantic,
    )

@dataclass(frozen=True)
class IncrementalCorpusAudit:
    """Per-arrival-batch audit of :func:`build_corpus_incremental`."""

    n_arrived: int
    n_after_exact: int
    n_after_neardup: int
    n_after_decontam: int
    n_after_quality: int
    #: cumulative survivor-corpus size after folding this batch in
    n_survivors_total: int
    #: diff-export accounting (None when the batch was a no-op)
    export: IncrementalExportResult | None
    #: the watermark written for this batch (None when no-op)
    watermark: int | None
    #: batch docs surviving the optional paragraph-grain dedup
    #: pre-stage (non-empty rebuild); -1 when the stage is off
    n_after_paragraph: int = -1
    #: previously-exported survivors REMOVED by this run's
    #: late-decontamination retraction (``retract_benchmark``);
    #: -1 STRICTLY when no retraction was requested — a requested
    #: retraction that removes nothing (including against a
    #: never-exported corpus) reports 0
    n_retracted: int = -1
    #: batch docs surviving the optional SEMANTIC dedup stage
    #: (frozen-model serving, q190's form); -1 when the stage is off
    n_after_semantic: int = -1
    #: current persisted centroid-model version after this run — a
    #: refresh executed THIS run shows as the bumped version, though
    #: it begins serving from the next batch (this batch's arrivals
    #: were served under the pre-bump model); -1 when the stage is
    #: off
    semantic_model_version: int = -1
    #: the q192 drift verdict for this arrival batch (1 = refresh
    #: advised); -1 when the stage is off or no sampled arrivals
    semantic_refresh_advised: int = -1


def build_corpus_incremental(
    spark: SparkSession,
    new_docs: DataFrame,
    dest: str,
    benchmark: DataFrame | None = None,
    neardup_threshold: float = 0.8,
    contamination_max: float = 0.5,
    min_quality: float = 0.0,
    min_tokens: int = 1,
    n_shards: int = 8,
    normalize: bool = False,
    quality_rules: str | None = None,
    decontam_mode: str = "drop",
    paragraph_dedup: bool = False,
    retract_benchmark: DataFrame | None = None,
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.25,
    semantic_refresh: str = "off",
) -> IncrementalCorpusAudit:
    """The watermark-gated ARRIVAL-BATCH form of :func:`build_corpus`
    — the reference's entire operating identity
    (s3_to_db_cardano_blocks_pipeline.py:64-127: read watermark, work
    the delta, upsert watermark) applied to the corpus build, so a
    daily drop pays |new| gate work instead of a full rebuild:

    - **watermark gate**: only ``doc_id > max(processed)`` rows enter
      (the A1/A2 read from a :class:`~cardano_spark.watermark.
      ParquetWatermarkStore` ledger under ``dest/_state``); arrival
      ids must be monotone across batches — the reference's
      block-height discipline.
    - **paragraph dedup** (optional, ``paragraph_dedup=True``):
      q178's CCNet stage 1 in arrival-batch form — in-batch
      keep-first over CDC paragraph digests plus an anti-probe of
      the persisted paragraph-digest index (``_state/para_index``),
      then a verbatim rebuild; fully-claimed documents drop here.
      Cost ∝ |new| paragraphs; converges to the batch twin because
      arrival ids are monotone.
    - **exact dedup**: the batch's md5 digests probe the persisted
      seen-digest column (null-safe — NULL-text docs group together,
      matching the batch rule) and reduce in-batch to min-id per
      digest; cost ∝ |new| + one slim index probe.
    - **near-dup**: :func:`~cardano_spark.operators.dedup.
      incremental_minhash_pairs` against the PERSISTED band index
      (q136's state, here parquet under ``_state/band_index``) — the
      historical corpus is never re-hashed, the index never
      self-joins. Drop rule is ``keep_first_pairwise`` (a doc drops
      iff it pairs with ANY earlier doc): the rule whose batch twin
      (``build_corpus(neardup_rule="keep_first_pairwise")``) an
      incremental run can reproduce EXACTLY — representative
      election by length cannot be incremental (a future longer
      member would retroactively evict a shipped rep).
    - **semantic dedup** (optional, ``embeddings`` — r10 verdict
      What's missing #1, the SemDeDup/D4 corpus-stage form): q190's
      frozen-model serving as a STAGE. The first embedding-bearing
      batch freezes a centroid model (flat auto-k smallest-id seeds
      of that batch, persisted under ``_state/semantic_model`` with
      a ``model_version``); every batch assigns its arrivals under
      the CURRENT model (|new| * k), pair-probes them against the
      persisted per-doc assignments (``_state/semantic_index`` —
      every post-near-dup doc ever seen, the batch twin's blocker
      set; |new| * occupancy), and drops flagged arrivals. q192's
      drift check (:func:`~cardano_spark.operators.similarity.
      plan_model_refresh`) runs per batch into the audit
      (``semantic_refresh_advised``). With
      ``semantic_refresh="auto"`` an advised refresh EXECUTES (r10
      verdict What's missing #2): the warm-start Lloyd candidate
      q192 scored is promoted to ``model_version + 1``
      (:func:`~cardano_spark.operators.similarity.
      warm_refresh_model`). Decision contract: shipped flags STAY
      shipped (the refresh never retroactively moves a decision);
      index rows migrate to the new model LAZILY, keyed on their
      ``model_version`` (re-assigned via :func:`~cardano_spark.
      operators.similarity.assign_to_centroids` at the next serve
      and upserted — so a crash anywhere between model swap and
      migration replays to convergence); arrivals from the next
      batch on serve under the new model. Convergence: with the
      SAME model, batch flags equal
      ``build_corpus(..., semantic_centroids=model)`` over the
      union (pinned in tests).
    - **decontamination + quality**: per-row gates against the static
      benchmark — stateless, |new|-bounded.
    - **export**: survivors append to ``_state/survivors``; the first
      batch exports in full (:func:`~cardano_spark.sinks.shards.
      write_training_shards_incremental`), and every later batch
      hands ONLY its new survivor rows to
      :func:`~cardano_spark.sinks.shards.write_training_shards_delta`
      — shard membership is a content hash, the touched shard
      directories are read back partition-pruned, and the manifest
      digests fold invertibly from the delta (cross-checked against a
      recompute over the touched content). READS and writes are both
      |new|-bounded; no per-increment corpus scan remains.

    CONVERGENCE CONTRACT (pinned in tests/test_corpus_pipeline.py,
    the q136 discipline): after any sequence of arrival batches, the
    survivor set and shard read-back equal the BATCH
    ``build_corpus(neardup_rule="keep_first_pairwise")`` over the
    union — regardless of how arrivals were split.

    Corpus-GLOBAL stages (DSIR selection, PPS budget, splits,
    shuffle order, packing) are deliberately absent: each depends on
    the whole corpus, so "incremental" would silently mean "stale";
    run the batch builder for those artifacts.

    **Retraction** (``retract_benchmark``, r8 verdict task 4; cut
    mode added per the r9 verdict): a benchmark set that arrives
    AFTER documents were exported must remove (or re-cut) the
    now-contaminated ones. The batch gates against the UNION of
    ``benchmark`` and ``retract_benchmark`` (contamination against a
    shingle union is not the max of the parts — gating against the
    union is what the batch twin computes). In **drop mode**,
    previously-exported survivors whose contamination against that
    union exceeds ``contamination_max`` are key-deleted from the
    survivor state (``ParquetMergeSink.delete``) and from the shards.
    In **cut mode**, every previously-processed doc's PRE-cut
    original (retained in ``_state/precut`` — span excision does not
    compose, so re-cutting already-cut text would diverge from the
    batch twin) is re-cut against the union and re-gated; rows whose
    exported text changes are REWRITTEN (delta upsert), rows the
    wider cut gates out are deleted, and rows the non-monotone
    quality gate re-admits are inserted. Either way, retraction
    deletes/rewrites and the batch's inserts ride ONE
    :func:`~cardano_spark.sinks.shards.write_training_shards_delta`
    call, exercising the manifest digest-fold's subtract path. The
    retraction SCAN is corpus-sized by necessity (a new benchmark
    must be checked against every retained doc once) but is paid per
    benchmark arrival, not per batch; the shard WRITES stay
    touched-shard-bounded (unchanged rows diff out). Convergence
    extends: the result equals the batch build over the union corpus
    with ``benchmark = old UNION retract`` in the SAME decontam mode
    (pinned in tests). Retracted docs stay in the seen/band/precut
    indexes — the batch twin runs dedup BEFORE decontamination, so
    they still block later duplicates. A retraction-only pass (zero
    new arrivals) is supported in both modes.

    CRASH SAFETY: every state table is a ``ParquetMergeSink`` (keyed,
    idempotent insert — the reference's ON CONFLICT DO NOTHING twin)
    and the fold order is survivors -> band index -> seen digests ->
    watermark, so a replay after a crash at ANY boundary converges:
    before the seen-fold the batch re-processes identically and the
    merges absorb re-presented rows; after it, the seen-digest probe
    drops the whole batch and only the watermark advances
    (pinned by the torn-state replay test). Retraction orders SHARD
    DELTA FIRST, survivor delete second: retract ids derive from the
    survivor state, so the reverse order would let a crash between
    the two strand contaminated rows in the export (the replay would
    re-derive an empty retract set). Both sides are idempotent by
    key and the delta exporter verifies its folded manifest against
    a recompute — a torn retraction replays cleanly from a crash at
    either boundary (pinned by the torn-retraction replay test)."""
    from cardano_spark.sinks.merge import ParquetMergeSink
    from cardano_spark.watermark import ParquetWatermarkStore

    if quality_rules not in (None, "gopher"):
        raise ValueError(f"unknown quality_rules: {quality_rules!r}")
    if retract_benchmark is not None:
        # gate against the UNION: contamination vs a shingle union is
        # not the max of the parts, and the batch twin gates vs the
        # union — see the docstring's retraction contract
        benchmark = (
            retract_benchmark.select("text")
            if benchmark is None
            else benchmark.select("text").union(
                retract_benchmark.select("text")
            )
        )
    state = f"{dest}/_state"
    wm_store: ParquetWatermarkStore[int] = ParquetWatermarkStore(
        spark, f"{state}/watermark", "doc_id", T.LongType()
    )
    wm = wm_store.read_latest("corpus")
    batch = new_docs if wm is None else new_docs.filter(F.col("doc_id") > wm)
    if normalize:
        batch = batch.withColumn("text", CU.normalize_text(F.col("text")))
    # lazy + count = one pass (the count materializes the cut; the
    # batch lineage is a literal-watermark filter over the caller's
    # frame, so nothing it reads can change before the count)
    batch = batch.localCheckpoint(eager=False)
    n_arrived = batch.count()

    shingles = TX.distinct_tokens(F.coalesce(F.col("text"), F.lit("")))
    seen_schema = batch.withColumn("_digest", F.md5("text")).schema
    band_schema = DD.band_index(
        spark.createDataFrame([], batch.schema), "doc_id", shingles
    ).schema
    seen_sink = ParquetMergeSink(
        spark, f"{state}/seen", seen_schema, ["doc_id"]
    )
    band_sink = ParquetMergeSink(
        spark, f"{state}/band_index", band_schema, ["doc_id", "band_idx"]
    )
    surv_sink = ParquetMergeSink(
        spark, f"{state}/survivors", batch.schema, ["doc_id"]
    )
    para_sink = (
        ParquetMergeSink(
            spark,
            f"{state}/para_index",
            T.StructType([T.StructField("digest", T.StringType())]),
            ["digest"],
        )
        if paragraph_dedup
        else None
    )
    # cut mode keeps the PRE-cut originals of every post-dedup doc
    # (growth-only, like seen/bands): span excision is NOT composable
    # — cut(cut(t, A), B) != cut(t, A UNION B) in general (removal
    # changes token adjacency, creating and destroying n-gram
    # windows) — so a later retraction must re-cut ORIGINALS against
    # the union to stay equal to the batch twin. Rows gated out after
    # cutting are retained too: the quality score is not monotone in
    # the cut, so a future union could re-admit them, exactly as the
    # batch twin would.
    #
    # STATED STORAGE CONTRACT (r10 verdict, What's missing #4): this
    # state is therefore ~2x the exported text volume, indefinitely,
    # and is NOT compactable without changing semantics — dropping
    # originals of docs absent from the survivor set would lose
    # exactly the re-admission candidates (a doc a WIDER cut gates
    # back in), diverging from the batch twin; dropping survivors'
    # originals would break re-cutting entirely (the coverage guard
    # in _cut_retraction_changes then refuses to run). Deployments
    # that cannot carry 2x text choose decontam_mode="drop", whose
    # retraction path needs no retained originals. The cost is
    # stated in the CLI's --decontam-mode help.
    precut_sink = (
        ParquetMergeSink(
            spark, f"{state}/precut", batch.schema, ["doc_id"]
        )
        if decontam_mode == "cut"
        else None
    )
    if semantic_refresh not in ("off", "auto"):
        raise ValueError(f"unknown semantic_refresh: {semantic_refresh!r}")
    # semantic-stage state: per-doc frozen-model assignments (every
    # post-near-dup doc — the batch twin's blocker set; model_version
    # keys the lazy post-refresh migration) and the versioned
    # centroid model itself
    sem_idx_sink = (
        ParquetMergeSink(
            spark,
            f"{state}/semantic_index",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("cluster_id", T.LongType()),
                    T.StructField("model_version", T.LongType()),
                    T.StructField(
                        "embedding",
                        embeddings.schema["embedding"].dataType,
                    ),
                ]
            ),
            ["doc_id"],
        )
        if embeddings is not None
        else None
    )
    sem_model_sink = (
        ParquetMergeSink(
            spark,
            f"{state}/semantic_model",
            T.StructType(
                [
                    T.StructField("cid", T.LongType()),
                    T.StructField(
                        "centroid", T.ArrayType(T.DoubleType())
                    ),
                    T.StructField("model_version", T.LongType()),
                ]
            ),
            ["cid"],
        )
        if embeddings is not None
        else None
    )

    def _with_shard_key(frame):
        return frame.withColumn(
            "_shard_key",
            md5_long(
                F.concat(F.lit("corpus|"), F.col("doc_id").cast("string"))
            ),
        )

    def _retraction_ids():
        """doc_ids of previously-exported survivors now contaminated
        against the (unioned) benchmark — checked once per benchmark
        arrival, corpus-sized scan, touched-shard-bounded writes."""
        old_surv = surv_sink.read()
        contam_old = CU.benchmark_contamination(
            old_surv,
            benchmark,
            "doc_id",
            TX.ngram_shingles(F.coalesce(F.col("text"), F.lit("")), 3),
            TX.ngram_shingles(F.coalesce(F.col("text"), F.lit("")), 3),
        )
        return (
            contam_old.filter(
                F.col("contamination") > F.lit(float(contamination_max))
            )
            .select("doc_id")
            .localCheckpoint(eager=True)
        )

    def _quality_gate(df):
        """The shared post-decontam gate — the SAME expression for
        arriving batches and for cut-mode re-evaluation (convergence
        demands a single definition)."""
        toks = F.size(TX.tokens(F.coalesce(F.col("text"), F.lit(""))))
        qcond = (
            TX.quality_score(F.col("text")) >= F.lit(float(min_quality))
        )
        gate = (
            (toks >= F.lit(int(min_tokens)))
            & F.when(toks >= 1, qcond).otherwise(F.lit(False))
        )
        if quality_rules == "gopher":
            _, gflags = CU.gopher_flag_columns(F.col("text"))
            gate = gate & (gflags == F.lit(127))
        return df.filter(gate)

    def _cut_retraction_changes():
        """Cut-mode retraction (r9 verdict task 7): re-cut every
        PREVIOUSLY-processed pre-cut original against the unioned
        benchmark, re-gate, and diff against the exported survivor
        state. Returns (upsert_rows, delete_ids, n_affected):
        ``upsert_rows`` are survivors whose exported text changes
        (including docs the wider cut re-admits past the
        non-monotone quality gate), ``delete_ids`` are exported docs
        that no longer pass, ``n_affected`` counts previously-
        exported rows rewritten or removed. The scan is corpus-sized
        (a new benchmark must be checked against every retained doc
        once, per benchmark arrival, not per batch); the shard
        writes stay touched-shard-bounded because unchanged rows are
        diffed out."""
        pre = precut_sink.read()
        if wm is not None:
            # previously-processed docs only (replay safety: a torn
            # run may have folded precut without advancing the
            # watermark; those rows re-enter as the current batch)
            pre = pre.filter(F.col("doc_id") <= wm)
        cut = CU.decontaminate_spans(pre, benchmark, "doc_id", "text", n=8)
        cols = pre.columns
        recut = (
            pre.drop("text")
            .join(
                cut.select("doc_id", F.col("cleaned_text").alias("text")),
                "doc_id",
            )
            .select(*cols)
        )
        if "n_chars" in cols:
            recut = recut.withColumn(
                "n_chars", F.length("text").cast("long")
            )
        new_surv = _quality_gate(recut)
        old_surv = surv_sink.read().localCheckpoint(eager=False)
        # Coverage guard (r10 ADVICE, medium): the diff below treats
        # any exported survivor ABSENT from new_surv as retracted. If
        # the precut state doesn't cover the export — corpus built in
        # drop mode then switched to cut, or exported before the
        # precut state existed — every uncovered survivor would land
        # in ``gone`` and the whole export would be silently deleted.
        # Fail loudly instead: cut-mode retraction is only defined
        # over survivors whose pre-cut original was retained.
        n_uncovered = old_surv.join(
            pre.select("doc_id"), "doc_id", "left_anti"
        ).count()
        if n_uncovered:
            raise RuntimeError(
                "cut-mode retraction: %d exported survivor(s) have no "
                "retained pre-cut original in _state/precut (corpus "
                "previously built with decontam_mode='drop', or "
                "exported before cut mode existed). Refusing to diff: "
                "uncovered survivors would be treated as retracted and "
                "deleted. Rebuild the corpus in cut mode, or retract "
                "with decontam_mode='drop'." % n_uncovered
            )
        old_texts = old_surv.select(
            "doc_id", F.col("text").alias("_old_text")
        )
        changed = (
            new_surv.join(old_texts, "doc_id", "left")
            .filter(~F.col("text").eqNullSafe(F.col("_old_text")))
            .drop("_old_text")
            .localCheckpoint(eager=True)
        )
        gone = (
            old_surv.join(new_surv.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id")
            .localCheckpoint(eager=True)
        )
        n_rewritten = changed.join(
            old_texts.select("doc_id"), "doc_id", "left_semi"
        ).count()
        return changed, gone, gone.count() + n_rewritten

    if n_arrived == 0:
        n_retracted = -1
        export = None
        if retract_benchmark is not None and wm is None:
            # retraction requested against a never-exported corpus:
            # report 0, reserving -1 strictly for "not requested"
            # (r9 ADVICE) — callers can tell a requested-but-empty
            # retraction from none requested
            n_retracted = 0
        elif retract_benchmark is not None and decontam_mode == "cut":
            # retraction-only pass, cut mode: rewrite re-cut rows,
            # delete rows the wider cut gates out — shard delta
            # FIRST, survivor state second (the same crash-window
            # argument as drop mode: the diff derives from
            # precut + OLD survivor state, so mutating survivors
            # before the shards are fixed would make a replay diff
            # against already-updated state and strand the export)
            changed, gone, n_retracted = _cut_retraction_changes()
            if changed.count() or n_retracted:
                export = write_training_shards_delta(
                    _with_shard_key(changed),
                    dest,
                    "_shard_key",
                    n_shards,
                    delete_keys=_with_shard_key(gone).select("_shard_key"),
                )
                surv_sink.delete(gone)
                surv_sink.merge(changed, mode="upsert")
        elif retract_benchmark is not None:
            # retraction-only pass: a benchmark arrived, no new docs.
            # Shard delta FIRST, survivor delete second (r9 ADVICE):
            # retract_ids derive from the survivor state, so deleting
            # survivors before the shards are fixed would make a
            # replay after a crash in between re-derive an EMPTY
            # retract set and strand contaminated rows in the export
            # forever. Both operations are idempotent by key (a delta
            # delete of absent keys folds to a no-op and the digest
            # recompute agrees), so with this order a crash at either
            # boundary replays to the converged state — pinned by the
            # torn-retraction replay test.
            retract_ids = _retraction_ids()
            n_retracted = retract_ids.count()
            if n_retracted:
                export = write_training_shards_delta(
                    _with_shard_key(surv_sink.read().limit(0)),
                    dest,
                    "_shard_key",
                    n_shards,
                    delete_keys=_with_shard_key(retract_ids).select(
                        "_shard_key"
                    ),
                )
                surv_sink.delete(retract_ids)
        return IncrementalCorpusAudit(
            n_arrived=0, n_after_exact=0, n_after_neardup=0,
            n_after_decontam=0, n_after_quality=0,
            n_survivors_total=surv_sink.read().count(),
            export=export, watermark=None, n_retracted=n_retracted,
        )

    # 0. optional paragraph-grain dedup (CCNet stage 1, q178), the
    # incremental form: in-batch keep-first over CDC paragraph
    # digests, then an anti-probe of the PERSISTED paragraph-digest
    # index (|new|-bounded: the historical corpus is never
    # re-segmented). Cross-batch keep-first equals the batch rule
    # because arrival ids are monotone — the globally-first
    # occurrence of any paragraph lives in the earliest batch that
    # contains it. Documents whose every paragraph was claimed
    # elsewhere drop HERE (their rebuild is empty), so empty texts
    # never reach the shingle/band machinery. The digest fold
    # (below, with the other sinks) covers ALL batch paragraphs —
    # gating later drops a document, not its keep-first claims,
    # matching the batch twin where the paragraph stage runs first.
    n_paragraph = -1
    new_para_digests: DataFrame | None = None
    if paragraph_dedup:
        assert para_sink is not None
        reb, new_para_digests = DD.paragraph_dedup_incremental(
            batch, para_sink.read().select("digest"), "doc_id", "text"
        )
        cols = batch.columns
        batch = (
            batch.drop("text")
            .join(
                reb.filter(F.col("cleaned_text") != F.lit("")).select(
                    "doc_id", F.col("cleaned_text").alias("text")
                ),
                "doc_id",
            )
            .select(*cols)
        )
        if "n_chars" in cols:
            batch = batch.withColumn(
                "n_chars", F.length("text").cast("long")
            )
        batch = batch.localCheckpoint(eager=False)
        n_paragraph = batch.count()

    seen = seen_sink.read()
    index = band_sink.read()

    # exact dedup: in-batch min-id per digest, then anti-probe the
    # seen-digest index (null-safe: NULL text is one group, as in the
    # batch rule — md5(NULL) groups under the NULL digest)
    staged = batch.withColumn("_digest", F.md5("text"))
    canon = staged.groupBy("_digest").agg(F.min("doc_id").alias("doc_id"))
    in_batch = staged.join(canon.select("doc_id"), "doc_id", "left_semi")
    seen_dig = seen.select(F.col("_digest").alias("_seen_digest")).distinct()
    exact_new = in_batch.join(
        seen_dig,
        in_batch["_digest"].eqNullSafe(seen_dig["_seen_digest"]),
        "left_anti",
    ).localCheckpoint(eager=False)
    n_exact = exact_new.count()

    # near-dup: probe the persisted band index, drop the later side of
    # every verified pair (keep_first_pairwise)
    pairs = DD.incremental_minhash_pairs(
        seen.drop("_digest"),
        exact_new.drop("_digest"),
        "doc_id",
        shingles,
        threshold=neardup_threshold,
        existing_index=index,
    )
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    near_new = exact_new.join(dropped, "doc_id", "left_anti")
    n_near = near_new.count()

    # semantic dedup (optional): q190's frozen-model serving as a
    # corpus stage — see the docstring's semantic contract. Runs
    # after the hash family and BEFORE the precut capture, so cut
    # retraction re-cuts the semantic survivors, matching the batch
    # twin's stage order.
    n_semantic = -1
    sem_version = -1
    sem_refresh_advised = -1
    if embeddings is not None:
        assert sem_idx_sink is not None and sem_model_sink is not None
        batch_emb = (
            near_new.select("doc_id")
            .join(embeddings.select("doc_id", "embedding"), "doc_id")
            .localCheckpoint(eager=True)
        )
        model = sem_model_sink.read()
        mv_row = model.agg(F.max("model_version").alias("v")).collect()
        mv = mv_row[0]["v"]
        if mv is None:
            # first embedding-bearing batch: freeze the model — flat
            # auto-k smallest-id seeds of this batch (idempotent on
            # replay: same batch -> same seeds, keyed merge absorbs)
            import math as _math

            n_emb = batch_emb.count()
            k = max(8, _math.isqrt(max(n_emb, 0)))
            sem_model_sink.merge(
                batch_emb.orderBy("doc_id")
                .limit(k)
                .select(
                    F.col("doc_id").alias("cid"),
                    F.col("embedding")
                    .cast("array<double>")
                    .alias("centroid"),
                    F.lit(1).cast("long").alias("model_version"),
                )
            )
            mv = 1
        cur_model = sem_model_sink.read().filter(
            F.col("model_version") == mv
        ).select("cid", "centroid")
        # lazy state migration: rows assigned under an older model
        # re-assign under the current one and upsert (idempotent —
        # the crash-safety half of the refresh contract)
        stale = sem_idx_sink.read().filter(
            F.col("model_version") != mv
        )
        migrated = (
            stale.select("doc_id", "embedding")
            .join(
                SIM.assign_to_centroids(
                    stale.select("doc_id", "embedding"),
                    "doc_id",
                    "embedding",
                    cur_model,
                ),
                "doc_id",
            )
            .select(
                "doc_id",
                "cluster_id",
                F.lit(mv).cast("long").alias("model_version"),
                "embedding",
            )
            .localCheckpoint(eager=True)
        )
        sem_idx_sink.merge(migrated, mode="upsert")
        # re-read AFTER the migration upsert (the sink swaps bucket
        # files, so a pre-merge frame would scan deleted parquet):
        # every row is now at the current version
        blockers = sem_idx_sink.read().select(
            "doc_id", "cluster_id", "embedding"
        )
        flags = SIM.semantic_dedup_serve(
            blockers,
            batch_emb,
            "doc_id",
            "embedding",
            cur_model,
            float(semantic_threshold),
        ).localCheckpoint(eager=True)
        near_new = near_new.join(
            flags.filter(F.col("is_dup") == 1).select(
                F.col("vec_id").alias("doc_id")
            ),
            "doc_id",
            "left_anti",
        )
        n_semantic = near_new.count()
        sem_version = int(mv)
        # q192 drift check on this batch vs the model it was served
        # under — one |new|-bounded pass into the audit
        drift = (
            SIM.plan_model_refresh(
                batch_emb, "doc_id", "embedding", cur_model
            )
            .select("refresh_advised")
            .limit(1)
            .collect()
        )
        sem_refresh_advised = (
            int(drift[0]["refresh_advised"]) if drift else -1
        )
        # fold the blocker index: EVERY post-near-dup batch doc with
        # an embedding (flagged or not — the batch twin's pair join
        # ranges over all of them), growth-only like seen/bands
        sem_idx_sink.merge(
            flags.select(
                F.col("vec_id").alias("doc_id"), "cluster_id"
            )
            .join(batch_emb, "doc_id")
            .select(
                "doc_id",
                "cluster_id",
                F.lit(mv).cast("long").alias("model_version"),
                "embedding",
            )
        )
        # an advised refresh EXECUTES — but the model swap is
        # deferred to AFTER the watermark upsert (the very last
        # fold): any crash before the watermark then replays this
        # batch under the SAME frozen model (identical flags —
        # idempotent), and a crash between watermark and swap
        # merely loses the refresh, which the next batch's drift
        # check re-advises if the drift persists. Shipped flags
        # stay; the index migrates lazily next batch (version
        # key); arrivals from the next batch serve the new model.
        if semantic_refresh == "auto" and sem_refresh_advised == 1:

            def _execute_semantic_refresh(
                _emb=batch_emb, _model=cur_model, _mv=int(mv)
            ):
                sem_model_sink.merge(
                    SIM.warm_refresh_model(
                        _emb, "doc_id", "embedding", _model
                    ).select(
                        "cid",
                        "centroid",
                        F.lit(_mv + 1)
                        .cast("long")
                        .alias("model_version"),
                    ),
                    mode="upsert",
                )

            sem_refresh_exec = _execute_semantic_refresh
            sem_version = int(mv) + 1
        else:
            sem_refresh_exec = None
    else:
        sem_refresh_exec = None

    # cut mode: capture the PRE-cut originals before the excision
    # rewrites `text` (folded into precut_sink below with the other
    # growth-only state — the raw material every future retraction
    # re-cuts)
    precut_new = near_new if precut_sink is not None else None

    # decontamination (per-row vs the static benchmark — both modes
    # are |new|-bounded, so the batch/incremental convergence contract
    # holds for "cut" exactly as for "drop")
    if decontam_mode not in ("drop", "cut"):
        raise ValueError(f"unknown decontam_mode: {decontam_mode!r}")
    if benchmark is not None:
        if decontam_mode == "cut":
            cut = CU.decontaminate_spans(
                near_new, benchmark, "doc_id", "text", n=8
            )
            cols = near_new.columns
            near_new = (
                near_new.drop("text")
                .join(
                    cut.select(
                        "doc_id", F.col("cleaned_text").alias("text")
                    ),
                    "doc_id",
                )
                .select(*cols)
            )
            if "n_chars" in cols:
                near_new = near_new.withColumn(
                    "n_chars", F.length("text").cast("long")
                )
        else:
            contam = CU.benchmark_contamination(
                near_new,
                benchmark,
                "doc_id",
                TX.ngram_shingles(F.coalesce(F.col("text"), F.lit("")), 3),
                TX.ngram_shingles(F.coalesce(F.col("text"), F.lit("")), 3),
            )
            clean_ids = contam.filter(
                F.col("contamination") <= F.lit(float(contamination_max))
            ).select("doc_id")
            near_new = near_new.join(clean_ids, "doc_id", "left_semi")
    n_decontam = near_new.count()

    # quality gate (shared q30 formula + token floor; optional Gopher;
    # zero-token docs — possible after span excision — guarded out
    # before the formula's division, same as the batch gate; the SAME
    # _quality_gate definition re-evaluates cut-mode retractions)
    kept_new = _quality_gate(near_new).localCheckpoint(eager=True)
    n_quality = kept_new.count()

    # late-decontamination retraction: computed against the PRE-batch
    # survivor state (batch ids are > wm, so the sets are disjoint;
    # batch rows were gated against the same unioned benchmark above).
    # Drop mode removes contaminated ids; cut mode re-cuts the stored
    # ORIGINALS against the union and diffs (rewrites + removals +
    # re-admissions).
    retract_ids = None
    retract_changed = None
    retract_gone = None
    n_retracted = -1
    if retract_benchmark is not None and decontam_mode == "cut":
        if wm is not None:
            retract_changed, retract_gone, n_retracted = (
                _cut_retraction_changes()
            )
        else:
            n_retracted = 0  # requested, but nothing exported yet
    elif retract_benchmark is not None:
        retract_ids = _retraction_ids()
        n_retracted = retract_ids.count()

    # fold state forward through the keyed idempotent sinks, in
    # crash-safe order: survivors first, the seen-digest GATE last —
    # a replay before the seen-fold recomputes identically and the
    # merges absorb duplicates; a replay after it is gated out by the
    # digest probe with survivors already intact. seen/bands grow by
    # the EXACT survivors (near-dup-dropped docs stay in the index —
    # the pairwise rule compares against every seen doc).
    surv_sink.merge(kept_new.drop("_digest"))
    if precut_sink is not None and precut_new is not None:
        # growth-only like bands: folds BEFORE the seen gate, so a
        # replay that re-presents the batch re-merges idempotently
        # and a replay gated out by `seen` has already retained the
        # originals
        precut_sink.merge(precut_new.drop("_digest"))
    band_sink.merge(DD.band_index(exact_new, "doc_id", shingles))
    seen_sink.merge(exact_new)
    # paragraph digests fold AFTER the seen gate like the other
    # growth-only state: a replay before this fold re-derives the
    # same kept occurrences (idempotent merge); a replay after it
    # rewrites the batch to empty rebuilds, which drop at the
    # paragraph stage itself — survivors and export stay intact and
    # only the watermark advances.
    if para_sink is not None and new_para_digests is not None:
        para_sink.merge(new_para_digests)
    # NOTE the retraction's survivor delete runs AFTER the export
    # delta below (r9 ADVICE): retract_ids derive from the survivor
    # state, so deleting survivors before the shard delta lands would
    # let a crash in between strand contaminated rows in the export —
    # a replay would re-derive an empty retract set. The delta's
    # delete_keys fold idempotently, so shards-first converges from a
    # crash at either boundary (torn-retraction replay test).

    # export: first batch writes the corpus in full; every later batch
    # is |new|-bounded — the survivor corpus is APPEND-ONLY under the
    # watermark gate (new doc_ids only, dedup drops only arrivals)
    # except for explicit retraction, so the export delta is exactly
    # kept_new (+ the retraction's delete keys) and the delta exporter
    # touches only the shards those rows land in (r7 verdict item 1:
    # no more per-increment corpus scans). Inserts and deletes ride
    # ONE delta call — the manifest digest-fold exercises xor
    # self-inverse and modular-sum subtraction together.
    if wm is None:
        export = write_training_shards_incremental(
            _with_shard_key(surv_sink.read()), dest, "_shard_key", n_shards
        )
    else:
        inserts = kept_new.drop("_digest")
        delete_keys = None
        if retract_changed is not None:
            # cut-mode retraction rides the SAME delta call: rewrites
            # are upserts (same key replaces), removals are deletes
            inserts = inserts.unionByName(retract_changed)
            delete_keys = _with_shard_key(retract_gone).select(
                "_shard_key"
            )
        elif retract_ids is not None and n_retracted:
            delete_keys = _with_shard_key(retract_ids).select(
                "_shard_key"
            )
        export = write_training_shards_delta(
            _with_shard_key(inserts),
            dest,
            "_shard_key",
            n_shards,
            delete_keys=delete_keys,
        )
    if retract_changed is not None:
        surv_sink.delete(retract_gone)
        surv_sink.merge(retract_changed, mode="upsert")
    elif retract_ids is not None and n_retracted:
        surv_sink.delete(retract_ids)
    # post-retraction state: the audit's survivor total must reflect
    # the delete/rewrite that just landed
    survivors = surv_sink.read()
    new_wm = int(batch.agg(F.max("doc_id").alias("m")).collect()[0]["m"])
    wm_store.upsert("corpus", new_wm)
    if sem_refresh_exec is not None:
        # the deferred model swap — see the semantic stage's
        # crash-ordering comment
        sem_refresh_exec()
    return IncrementalCorpusAudit(
        n_arrived=n_arrived,
        n_after_exact=n_exact,
        n_after_neardup=n_near,
        n_after_decontam=n_decontam,
        n_after_quality=n_quality,
        n_survivors_total=survivors.count(),
        export=export,
        watermark=new_wm,
        n_after_paragraph=n_paragraph,
        n_retracted=n_retracted,
        n_after_semantic=n_semantic,
        semantic_model_version=sem_version,
        semantic_refresh_advised=sem_refresh_advised,
    )
