"""Unit tests for the core relational building blocks."""

from __future__ import annotations

from pyspark.sql import functions as F

from cardano_spark.operators.relational import insert_if_absent, missing_children, topk


def test_insert_if_absent_keeps_existing_rows(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    incoming = spark.createDataFrame(
        [(2, "CHANGED"), (3, "c"), (3, "c-dup")], "id long, v string"
    )
    out = insert_if_absent(existing, incoming, ["id"]).orderBy("id").collect()
    assert [r.id for r in out] == [1, 2, 3]
    assert out[1].v == "b"  # ON CONFLICT DO NOTHING: existing wins
    assert out[2].v in ("c", "c-dup")  # batch-internal dedup picked one


def test_insert_if_absent_is_idempotent(spark):
    existing = spark.createDataFrame([(1, "a")], "id long, v string")
    incoming = spark.createDataFrame([(2, "b")], "id long, v string")
    once = insert_if_absent(existing, incoming, ["id"])
    twice = insert_if_absent(once, incoming, ["id"])
    assert twice.count() == once.count() == 2


def test_missing_children_left_anti(spark):
    parents = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    children = spark.createDataFrame([(1,), (1,), (3,)], "k long")
    out = missing_children(parents, children, ["k"]).collect()
    assert [r.k for r in out] == [2]


def test_topk_is_take_ordered(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    plan = topk(df, [F.desc("v"), F.asc("id")], 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = topk(df, [F.desc("v"), F.asc("id")], 5).collect()
    assert len(rows) == 5 and rows[0].v == 6


def test_asof_join_prev_picks_latest_earlier(spark):
    from cardano_spark.operators.relational import asof_join_prev

    left = spark.createDataFrame(
        [(10, 1, 100), (11, 1, 200), (12, 2, 50)], "event_id long, k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 1, 90), (2, 1, 150), (3, 1, 300), (4, 3, 10)],
        "event_id long, k long, t long",
    )
    out = {
        r.event_id: (r.prev_event_id, r.prev_t)
        for r in asof_join_prev(
            left, right, on=["k"], order=["t", "event_id"], carry=["event_id", "t"]
        ).collect()
    }
    assert out[10] == (1, 90)  # only t=90 precedes t=100
    assert out[11] == (2, 150)  # latest earlier, not the later t=300
    assert out[12] == (None, None)  # no right rows for k=2


def test_asof_join_prev_tie_is_earlier(spark):
    """A right row at exactly the left row's order value counts as
    earlier (right rows sort before left at ties via _side)."""
    from cardano_spark.operators.relational import asof_join_prev

    left = spark.createDataFrame([(10, 1, 100)], "event_id long, k long, t long")
    right = spark.createDataFrame([(1, 1, 100)], "event_id long, k long, t long")
    row = asof_join_prev(
        left, right, on=["k"], order=["t"], carry=["event_id"]
    ).collect()[0]
    assert row.prev_event_id == 1


def test_range_join_count_window_edges(spark):
    from cardano_spark.operators.relational import range_join_count

    left = spark.createDataFrame([(1, 1, 1000)], "event_id long, k long, us long")
    right = spark.createDataFrame(
        # window [900, 1000): 900 in, 999 in, 1000 (self-time) out, 899 out
        [(1, 900), (1, 999), (1, 1000), (1, 899), (2, 950)], "k long, us long"
    )
    out = range_join_count(
        left,
        right,
        on=["k"],
        left_point_us=F.col("us"),
        right_point_us=F.col("us"),
        window_us=100,
        out="n",
    ).collect()
    assert len(out) == 1 and out[0].n == 2


def test_range_join_count_keeps_zero_match_rows(spark):
    from cardano_spark.operators.relational import range_join_count

    left = spark.createDataFrame([(1, 1, 1000), (2, 9, 1000)], "event_id long, k long, us long")
    right = spark.createDataFrame([(1, 950)], "k long, us long")
    out = {r.event_id: r.n for r in range_join_count(
        left, right, on=["k"],
        left_point_us=F.col("us"), right_point_us=F.col("us"),
        window_us=100, out="n",
    ).collect()}
    assert out == {1: 1, 2: 0}


def test_range_join_count_duplicate_left_rows(spark):
    """Duplicate left rows are a multiset: each copy reports its own
    TRUE count (round 1 collapsed copies into one group and reported
    multiplicity x count)."""
    from cardano_spark.operators.relational import range_join_count

    left = spark.createDataFrame(
        [(1, 1000), (1, 1000), (1, 1000)], "k long, us long"
    )
    right = spark.createDataFrame([(1, 950), (1, 960)], "k long, us long")
    out = range_join_count(
        left, right, on=["k"],
        left_point_us=F.col("us"), right_point_us=F.col("us"),
        window_us=100, out="n",
    ).collect()
    assert [r.n for r in out] == [2, 2, 2]  # not 6


def test_range_join_count_survives_shuffled_input(spark):
    """The left frame's internal row ids must stay consistent across
    the probe and final-join branches even when the left input carries
    an upstream shuffle whose row order is nondeterministic (groupBy
    output here). Without the localCheckpoint pin, the two branches
    could re-derive different ids and attach counts to wrong rows."""
    from cardano_spark.operators.relational import range_join_count

    base = spark.range(500).select(
        (F.col("id") % 50).alias("k"), (F.col("id") * 37 % 1000).alias("us")
    )
    # shuffled upstream: aggregate output order is not scan order
    left = base.groupBy("k", "us").agg(F.count("*").alias("m")).repartition(13)
    right = spark.range(2000).select(
        (F.col("id") % 50).alias("k"), (F.col("id") % 997).alias("us")
    )
    out = range_join_count(
        left, right, on=["k"],
        left_point_us=F.col("us"), right_point_us=F.col("us"),
        window_us=100, out="n",
    )
    got = sorted((r.k, r.us, r.n) for r in out.collect())
    # oracle: per-row correlated count computed driver-side
    lrows = left.collect()
    rrows = right.collect()
    want = sorted(
        (
            lr.k,
            lr.us,
            sum(1 for rr in rrows if rr.k == lr.k and lr.us - 100 <= rr.us < lr.us),
        )
        for lr in lrows
    )
    assert got == want


def test_asof_join_is_single_shuffle(spark):
    """The as-of rewrite must not plan an inequality join: no
    BroadcastNestedLoop / CartesianProduct anywhere."""
    from cardano_spark.operators.relational import asof_join_prev

    left = spark.range(100).select(
        F.col("id").alias("event_id"), (F.col("id") % 5).alias("k"), F.col("id").alias("t")
    )
    right = left.select("event_id", "k", (F.col("t") * 2).alias("t"))
    plan = (
        asof_join_prev(left, right, on=["k"], order=["t", "event_id"], carry=["t"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


def test_scd2_from_changelog_episodes_and_single_exchange(spark):
    from cardano_spark.operators.relational import scd2_from_changelog

    log = spark.createDataFrame(
        [
            # user 1: gold -> gold (no change) -> silver -> gold
            (1, 10, 1, "gold"),
            (1, 20, 2, "gold"),
            (1, 30, 3, "silver"),
            (1, 40, 4, "gold"),
            # user 2: one row
            (2, 15, 5, "free"),
            # user 3: same-ts tie broken by seq
            (3, 10, 7, "b"),
            (3, 10, 6, "a"),
        ],
        "user_id long, ts long, seq long, plan string",
    )
    out = scd2_from_changelog(log, ["user_id"], "ts", ["plan"], seq_col="seq")
    rows = sorted(
        out.collect(), key=lambda r: (r["user_id"], r["version"])
    )
    u1 = [r for r in rows if r["user_id"] == 1]
    assert [(r["plan"], r["valid_from"], r["valid_to"]) for r in u1] == [
        ("gold", 10, 30),
        ("silver", 30, 40),
        ("gold", 40, None),
    ]
    assert [r["is_current"] for r in u1] == [False, False, True]
    u3 = [r for r in rows if r["user_id"] == 3]
    assert [(r["plan"], r["version"]) for r in u3] == [("a", 1), ("b", 2)]
    # idempotent: re-deriving from the same log is byte-identical
    again = scd2_from_changelog(log, ["user_id"], "ts", ["plan"], seq_col="seq")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))
    # one entity-key exchange shared by all window passes
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_multi_attribute_null_transitions(spark):
    from cardano_spark.operators.relational import scd2_from_changelog

    log = spark.createDataFrame(
        [
            (1, 10, "a", None),
            (1, 20, "a", None),   # no change (null == null)
            (1, 30, "a", "x"),    # null -> x is a change
            (1, 40, None, "x"),   # a -> null is a change
        ],
        "k long, ts long, c1 string, c2 string",
    )
    out = scd2_from_changelog(log, ["k"], "ts", ["c1", "c2"], seq_col="ts")
    vs = sorted((r["version"], r["c1"], r["c2"]) for r in out.collect())
    assert vs == [(1, "a", None), (2, "a", "x"), (3, None, "x")]


def test_snapshot_diff_classification_and_single_join(spark):
    from cardano_spark.operators.relational import snapshot_diff
    import pyspark.sql.functions as F

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "d", 40.0)],
        "k long, status string, amt double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, None, 30.0), (5, "e", 50.0)],
        "k long, status string, amt double",
    )
    out = snapshot_diff(old, new, ["k"], ["status", "amt"])
    got = {r["k"]: r["change_type"] for r in out.collect()}
    # k=1 unchanged (absent), k=3 unchanged with NULL attr (null-safe)
    assert got == {2: "changed", 4: "removed", 5: "added"}
    row2 = out.filter(F.col("k") == 2).collect()[0]
    assert row2["old_status"] == "b" and row2["new_status"] == "B"
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "FullOuter" in plan
    assert plan.count("Join") == 1


def test_snapshot_diff_reconstructs_new_from_old(spark):
    """Applying the diff to the old snapshot must reproduce the new
    snapshot exactly (randomized, seeded): remove 'removed', replace
    'changed', append 'added'."""
    import random

    from cardano_spark.operators.relational import snapshot_diff
    import pyspark.sql.functions as F

    rng = random.Random(7)
    old_rows = [
        (k, rng.choice(["a", "b", None]), round(rng.uniform(0, 100), 2))
        for k in range(200)
    ]
    new_rows = []
    for k, status, amt in old_rows:
        r = rng.random()
        if r < 0.15:
            continue  # deleted
        if r < 0.35:
            new_rows.append((k, rng.choice(["c", None]), amt + 1.0))  # changed
        else:
            new_rows.append((k, status, amt))  # unchanged
    new_rows += [
        (k, "new", float(k)) for k in range(300, 300 + 25)  # added
    ]
    old = spark.createDataFrame(old_rows, "k long, status string, amt double")
    new = spark.createDataFrame(new_rows, "k long, status string, amt double")
    diff = snapshot_diff(old, new, ["k"], ["status", "amt"]).cache()
    removed = diff.filter(F.col("change_type") == "removed").select("k")
    upserts = diff.filter(
        F.col("change_type").isin("added", "changed")
    ).select(
        "k",
        F.col("new_status").alias("status"),
        F.col("new_amt").alias("amt"),
    )
    rebuilt = (
        old.join(removed, "k", "left_anti")
        .join(upserts.select("k"), "k", "left_anti")
        .unionByName(upserts)
    )
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )
    diff.unpersist()


def test_scd2_replay_roundtrip_random(spark):
    """SCD2 invariants on a random change log (seeded): per key the
    episodes tile the timeline (each valid_to == next valid_from),
    exactly one is_current, and replaying 'state at ts' from the
    history matches the raw log's last-value-at-ts."""
    import random

    from cardano_spark.operators.relational import scd2_from_changelog

    rng = random.Random(11)
    rows = []
    for k in range(30):
        t = 0
        for i in range(rng.randrange(1, 12)):
            t += rng.randrange(1, 5)
            rows.append((k, t, i, rng.choice(["a", "b", "c"])))
    log = spark.createDataFrame(rows, "k long, ts long, seq long, v string")
    hist = scd2_from_changelog(log, ["k"], "ts", ["v"], seq_col="seq").collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    raw_by_key: dict[int, list] = {}
    for k, t, seq, v in rows:
        raw_by_key.setdefault(k, []).append((t, seq, v))
    for k, eps in by_key.items():
        eps.sort(key=lambda r: r["version"])
        # tiling + single current
        for a, b in zip(eps, eps[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert [e["is_current"] for e in eps].count(True) == 1
        assert eps[-1]["is_current"]
        # replay: state at each episode start == raw last value
        raw = sorted(raw_by_key[k])
        for e in eps:
            at = [v for (t, s, v) in raw if t <= e["valid_from"]][-1]
            assert e["v"] == at


def test_delta_join_equals_full_recompute_random(spark):
    """IVM identity on random (seeded) splits: old_join ∪ delta ==
    join of the unioned tables, as multisets."""
    import random

    from cardano_spark.operators.relational import delta_join

    rng = random.Random(13)
    a_rows = [(rng.randrange(30), i, rng.randrange(100)) for i in range(150)]
    b_rows = [(rng.randrange(30), i, rng.randrange(100)) for i in range(200)]
    cut_a, cut_b = 100, 120
    a = spark.createDataFrame(a_rows[:cut_a], "k long, aid long, av long")
    da = spark.createDataFrame(a_rows[cut_a:], "k long, aid long, av long")
    b = spark.createDataFrame(b_rows[:cut_b], "k long, bid long, bv long")
    db = spark.createDataFrame(b_rows[cut_b:], "k long, bid long, bv long")
    old = a.join(b, ["k"])
    delta = delta_join(a, da, b, db, ["k"])
    full = a.unionByName(da).join(b.unionByName(db), ["k"])
    lhs = sorted(map(tuple, old.unionByName(delta).collect()))
    rhs = sorted(map(tuple, full.collect()))
    assert lhs == rhs
    assert delta.count() > 0  # the split actually produced a delta


def test_asof_join_next_tie_is_later_and_single_shuffle(spark):
    from cardano_spark.operators.relational import asof_join_next
    import pyspark.sql.functions as F

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 5, 102)], "k long, t long, lid long"
    )
    right = spark.createDataFrame(
        [(1, 10, 900), (1, 15, 901), (2, 4, 902)], "k long, t long, rid long"
    )
    out = asof_join_next(
        left, right, on=["k"], order=["t"], carry=["rid"]
    ).collect()
    got = {r["lid"]: r["next_rid"] for r in out}
    # exact tie (t=10) counts as LATER -> it IS the next match
    assert got == {100: 900, 101: None, 102: None}
    df = asof_join_next(left, right, on=["k"], order=["t"], carry=["rid"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # union+window, never an inequality join


def test_triangle_counts_planted(spark):
    """K4 has 4 triangles with every vertex in 3; a chain and a star
    have none (the star is the degree-orientation stress: a hub with
    high degree but zero closure)."""
    from cardano_spark.operators.relational import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(10, 11), (11, 12), (12, 13)]
    star = [(20, x) for x in range(21, 28)]
    edges = spark.createDataFrame(k4 + chain + star, "s long, t long")
    out = {r.vertex: r.n_triangles for r in triangle_counts(edges, "s", "t").collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_random_matches_bruteforce(spark):
    """Seeded random graphs: per-vertex counts must equal the naive
    all-triples enumeration, including duplicate/reversed input edges
    (normalized away) and self-loops (dropped)."""
    import itertools
    import random

    from cardano_spark.operators.relational import triangle_counts

    rng = random.Random(17)
    n = 30
    edges = set()
    for _ in range(120):
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    rows = [(a, b) if rng.random() < 0.5 else (b, a) for a, b in edges]
    rows += rows[:10] + [(5, 5)]  # duplicates + a self-loop
    df = spark.createDataFrame(rows, "s long, t long")
    want: dict[int, int] = {}
    for x, y, z in itertools.combinations(range(n), 3):
        if {(x, y), (x, z), (y, z)} <= edges:
            for v in (x, y, z):
                want[v] = want.get(v, 0) + 1
    got = {r.vertex: r.n_triangles for r in triangle_counts(df, "s", "t").collect()}
    assert got == want
    assert sum(want.values()) > 0  # fixture actually has triangles


def test_key_skew_report_planted(spark):
    """Known distribution incl. a NULL key: counts, top-key
    tie-break (highest n, then lowest key string), exact
    percentiles, and the share division."""
    from cardano_spark.operators.relational import key_skew_report

    rows = (
        [("a", 1)] * 5 + [("b", 1)] * 5 + [("c", 1)] * 2 + [(None, 1)] * 3
    )
    df = spark.createDataFrame(rows, "k string, v int")
    r = key_skew_report(df, ["k"]).collect()[0]
    assert (r.key_col, r.n_rows, r.n_keys) == ("k", 15, 4)
    # a and b tie at 5 -> lowest key string wins
    assert (r.top_key, r.max_n) == ("a", 5)
    assert abs(r.top_share - 5 / 15) < 1e-15
    # per-key counts sorted: [2, 3, 5, 5]
    assert r.p50_n == 4.0  # interpolated between 3 and 5
    assert abs(r.p99_n - 5.0) < 1e-12
