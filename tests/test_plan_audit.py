"""Registry-WIDE plan-hygiene gate (tools/plan_audit.py): the
hand-written pins in test_plan_shapes.py cover the queries someone
thought about; this gate covers all of them. The committed
PLAN_AUDIT.json is the budget — regenerate it deliberately
(`python tools/plan_audit.py`) when a plan change is intentional; a
refactor that silently adds a shuffle, a cartesian, or a Python hop
anywhere in the registry fails here instead of on the cluster."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: BroadcastNestedLoopJoin is legitimate ONLY where the design is a
#: broadcast-against-tiny scan: brute-force ANN scoring (q27, q56
#: below-crossover, q106's ground-truth side), IVF centroid
#: assignment (q36/q57), broadcast benchmark/probe sets (q67, q100,
#: q85's rerank shortlist), 1-row scalar broadcasts (q55's idf
#: denominator, q95's boundary row, q96's midpoint row) and the
#: broadcast Bloom bitset (q73). q109's SemDeDup centroid assignment
#: is the same shape as q36's but sits behind a localCheckpoint (its
#: assigned frame has three consumers), so it doesn't appear in the
#: query's own plan.
BNL_BUDGET = {
    "q27_ann_brute_topk": 1,
    "q36_ann_ivf_topk": 2,
    "q55_tfidf_top_terms": 1,
    "q56_ann_auto_topk": 1,
    "q57_ann_ivf_trained": 2,
    "q67_semantic_decontamination": 1,
    "q73_bloom_decontamination": 2,
    "q85_quantized_ann_rerank": 1,
    "q112_projected_rerank_topk": 1,
    "q113_spherical_kmeans": 2,
    "q114_ivf_kmeans_pipeline": 2,
    "q95_equi_depth_histogram": 1,
    "q96_distribution_drift": 1,
    "q100_crossmodal_retrieval": 1,
    "q106_ann_recall_report": 2,
    "q134_ann_rank_report": 1,  # brute-force ground-truth side, 8 probes
    "q146_hard_negative_topk": 1,  # broadcast probe set vs corpus scan
    "q147_triplet_margin_report": 1,  # same _label_scored_pairs scan
    "q149_ivfpq_topk": 2,  # coarse assignment + probe routing (q36 shape)
    "q155_bm25_topk": 1,  # 1-row corpus-totals broadcast (q55 idf shape)
    "q156_hybrid_rrf": 2,  # same totals row + brute-force ANN arm (q27)
    "q163_ivf_incremental_report": 2,  # frozen-model argmax, both sides (q36 shape)
    "q166_ivfpq_residual_topk": 1,  # probe routing vs k-row coarse frame (q149 shape)
    "q167_bm25_prf_topk": 3,  # 1-row totals broadcast per BM25 pass + feedback probe
    "q169_retrieval_ndcg_report": 3,  # brute ground truth + IVF assignment/routing (q106+q36 shapes)
    "q179_d4_prototype_prune": 2,  # the two k-row argmax assigns (q113 shape)
    "q180_d4_pipeline": 3,  # two k-row assigns + the 1-row auto-k threshold broadcast
    "q183_hierarchical_assign": 2,  # training assigns; lvl-1/lvl-2 are rank+equi-join
    # two-level wiring (r9): every BNL below is a broadcast fan-out
    # against a bounded frame — g super-seeds, k-row group_cents, the
    # max_probes-row grid, or a 1-row chosen/auto-k threshold
    "q185_d4_pipeline_hierarchical": 4,  # lvl-1 sup + lvl-2 group fan-outs, x2 since r12: the tiny sup frames are no longer checkpointed (r12 build-latency cut), so both consumers' bounded fan-outs appear inline
    "q186_hierarchical_probe_planner": 3,  # sample lvl-1 + candidate fan-out + probes grid
    "q187_hierarchical_assign_planned": 7,  # planner chain + full-corpus lvl-1/lvl-2 + 1-row chosen
    "q188_ivf_hierarchical_pipeline": 2,  # IVF serve assigns (q36 shape); training fan-outs sit behind the model checkpoint
    "q189_ivf_fully_hierarchical": 5,  # two-level index build (sup + group fan-outs, inline x2 since the r12 sup-checkpoint removal) + flat query-probe ranking
    "q190_semantic_dedup_incremental": 1,  # old-side frozen-model argmax (q36 shape); the batch side sits behind its checkpoint
    "q192_frozen_model_refresh_planner": 3,  # frozen argmax (8-row centroids) + warm-retrained argmax (<=8-row sums) + 1-row totals broadcast
    "q195_semantic_refresh_apply": 1,  # serving argmax vs the <=8-row warm model (q190 shape); freeze/warm/migration argmaxes sit behind the model checkpoint
    "q197_d4_pipeline_occupancy": 1,  # post-checkpoint three-level lvl-2 fan-out vs the g2-row (k^(1/9)-ish tiny) top frame; training fan-outs sit behind checkpoints
}

#: The Python boundary: exactly the multimodal decode family (Arrow-
#: batched mapInPandas over binary blobs — SURVEY §2.11).
PYTHON_BUDGET = {
    "q33_multimodal_features": 1,
    "q46_multimodal_real_decode": 2,
    "q49_image_resize": 1,
    "q50_audio_frame_sample": 1,
    "q122_image_ahash_dedup": 1,
    "q173_video_frame_sample": 1,  # container parse + frame decode
}


def test_registry_wide_plan_budgets(spark):
    import sys

    sys.path.insert(0, REPO)
    from tools.plan_audit import audit

    from tests.conftest import SF_SMALL

    with open(os.path.join(REPO, "PLAN_AUDIT.json"), encoding="utf-8") as f:
        budget = json.load(f)
    live = audit(spark, SF_SMALL)
    assert set(live) == set(budget), (
        "registry changed: regenerate PLAN_AUDIT.json (tools/plan_audit.py)"
    )
    problems = []
    for q, c in live.items():
        if c["cartesian"]:
            problems.append(f"{q}: CartesianProduct appeared")
        if c["bnl"] > BNL_BUDGET.get(q, 0):
            problems.append(
                f"{q}: {c['bnl']} BroadcastNestedLoopJoin (allowed "
                f"{BNL_BUDGET.get(q, 0)})"
            )
        if c["python"] > PYTHON_BUDGET.get(q, 0):
            problems.append(
                f"{q}: {c['python']} Python ops (allowed "
                f"{PYTHON_BUDGET.get(q, 0)})"
            )
        if c["exchanges"] > budget[q]["exchanges"]:
            problems.append(
                f"{q}: {c['exchanges']} exchanges > budgeted "
                f"{budget[q]['exchanges']}"
            )
    assert not problems, "\n".join(problems)
