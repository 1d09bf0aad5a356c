"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the ``noop`` sink (full execution, no
driver-side collect) — the time measured is the engine, not pandas
conversion.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q01_pricing_summary",
    "q02_top_parts_by_revenue",
    "q03_region_revenue",
    "q04_stale_orders_anti_join",
    "q08_distinct_pairs",
    "q09_insert_if_absent",
    "q10_array_roundtrip",
    "q11_flatten_surrogate_ids",
    "q12_running_customer_total",
    "q14_sessionize",
    "q15_hourly_rollup",
    "q20_topk_sources",
    "q38_asof_prev_view",
    "q39_range_join_clicks_before_error",
    # training-data pipeline operators
    "q21_exact_dedup",
    "q22_minhash_lsh_neardup",
    "q23_simhash_fingerprints",
    "q26_embedding_neardup_topk",
    "q27_ann_brute_topk",
    "q36_ann_ivf_topk",
    "q29_language_id",
    "q32_doc_fingerprint",
    "q33_multimodal_features",
    "q40_trainingdata_pipeline",
]


def _current_round() -> int | None:
    """Active round per the window-history state file (maintained by
    tools/update_window_history.py at round start). Used to keep
    _prev_round_minima from comparing a round's bench runs against the
    round's OWN artifact once the driver writes BENCH_r{N}.json
    mid-round (r10 ADVICE): lo > 2*lo is never true, which would
    silently neuter the contamination reference."""
    try:
        with open(
            os.path.join(REPO, "cardano_spark", "plans", "window_history.json")
        ) as f:
            return int(json.load(f)["round"])
    except (OSError, ValueError, KeyError, TypeError):
        return None


def _prev_round_minima() -> dict[str, float]:
    """Per-query minima from the newest PRIOR-round BENCH_r{N}.json —
    the load-contamination reference (r9 verdict finding #3). Times
    are only ROUGHLY comparable across rounds (fresh data drops), so
    consumers compare at a generous 2x, not equality. Artifacts from
    the active round (N >= current) are excluded so re-runs within a
    round never self-compare."""
    import re

    cur = _current_round()
    best: tuple[int, str] | None = None
    for name in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", name)
        if not m:
            continue
        n = int(m.group(1))
        if cur is not None and n >= cur:
            continue
        if best is None or n > best[0]:
            best = (n, name)
    if best is None:
        return {}
    try:
        with open(os.path.join(REPO, best[1])) as f:
            doc = json.load(f)
        # the driver wraps bench's JSON line under "parsed"
        doc = doc.get("parsed", doc)
        return {k: float(v) for k, v in doc["queries"].items()}
    except (OSError, ValueError, KeyError, TypeError):
        return {}


#: ignore sample disagreement below this absolute time — 2x jitter on
#: a 0.2 s query is scheduler noise, not machine load
_NOISE_FLOOR_SEC = 0.5


def _noisy(runs: list[float], prev_min: float | None) -> bool:
    """Contamination heuristic (r9 verdict task 6): the committed
    samples PROVED load contamination after the fact (q33
    1.839/0.329) but could not arrest it. A query is suspect when its
    TWO BEST samples disagree >2x above the noise floor, or its best
    run is >2x the previous round's committed best — judging the two
    best (not min/max) lets a retry EXONERATE a transient spike: the
    spiked sample stays visible in "samples" but no longer votes."""
    runs = sorted(runs)[:2]
    lo, hi = min(runs), max(runs)
    if hi >= _NOISE_FLOOR_SEC and hi > 2.0 * lo:
        return True
    if (
        prev_min is not None
        and lo > 2.0 * prev_min
        and lo >= _NOISE_FLOOR_SEC
    ):
        return True
    return False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from cardano_spark.session import get_spark

    spark = get_spark("bench")
    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sys.argv[1:] if n in qs and n not in HEADLINE
    ]

    # warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not first-touch overheads
    qs[names[0]](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # best-of-N per query: the driver compares BENCH against BASELINE,
    # so squeeze out GC/JIT noise (N=2 keeps total under a minute)
    repeat = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2")))
    prev = _prev_round_minima()
    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    contaminated: list[str] = []
    for name in names:
        runs = []
        for _ in range(repeat):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 3))
        # self-arresting contamination check (r9 verdict task 6):
        # a suspect query gets ONE extra pass — a transient load
        # spike washes out and the min recovers; a query still noisy
        # after the retry is named in "contaminated" so the artifact
        # flags itself instead of needing a forensic idle rerun
        if repeat > 1 and _noisy(runs, prev.get(name)):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 3))
            if _noisy(runs, prev.get(name)):
                contaminated.append(name)
        samples[name] = runs
        times[name] = min(runs)

    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": times,
            # all raw run times per query ("queries" carries the
            # minima): machine-load contamination shows up as BOTH
            # samples inflated uniformly, so a noisy round is
            # diagnosable from the artifact without a forensic rerun
            # (r8: 18.35 s driver vs 16.27 s idle)
            "runs": repeat,
            "samples": samples,
            # queries still noisy AFTER the self-arrest retry — a
            # non-empty list means this artifact's totals are
            # load-contaminated and the named minima untrustworthy
            "contaminated": contaminated,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
    )
    # Stop the context BEFORE printing the metrics line: local-mode
    # teardown can race a late DAGScheduler updateAccumulators call and
    # spray a stack fragment to stderr (seen in BENCH_r07.json's tail).
    # Stopping first and printing last keeps the captured tail exactly
    # one JSON line regardless of shutdown noise ordering.
    spark.stop()
    sys.stderr.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
