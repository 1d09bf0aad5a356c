"""DuckDB oracle SQL for every query in ``cardano_spark.plans``.

Each string is runnable by DuckDB against the pre-registered parquet
views (region nation customer supplier part orders lineitem events
documents embeddings) and must produce the same column names, row
count, and canonical values as the Spark query of the same key.

Dialect notes baked in (verified against duckdb in this container):
- decimal casts mirror the Spark DecimalTypes exactly so stringified
  scales match (e.g. DECIMAL(18,2) * DECIMAL(9,6) -> scale 8 on both);
- double->int casts ROUND in DuckDB but TRUNCATE in Spark, so every
  such conversion goes through floor() on both engines;
- averages are CAST(decimal AS DOUBLE) / count on both engines.
"""

from __future__ import annotations

RELATIONAL_ORACLES: dict[str, str] = {
    "q01_pricing_summary": """
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
          CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
          CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(1 - l_discount AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
          CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(1 - l_discount AS DECIMAL(9,6)) AS DECIMAL(28,8))
              * CAST(1 + l_tax AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
          count(*) AS count_order,
          CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_qty,
          CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q02_top_parts_by_revenue": """
        SELECT p.p_partkey, p.p_name, CAST(CAST(r.revenue AS VARCHAR) AS DOUBLE) AS revenue
        FROM (
          SELECT l_partkey,
                 sum(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(1 - l_discount AS DECIMAL(9,6))) AS revenue
          FROM lineitem GROUP BY l_partkey
        ) r JOIN part p ON r.l_partkey = p.p_partkey
        ORDER BY r.revenue DESC, p.p_partkey ASC
        LIMIT 10
    """,
    "q03_region_revenue": """
        SELECT
          r_name, n_name,
          CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(1 - l_discount AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) AS revenue,
          count(DISTINCT o_orderkey) AS n_orders,
          count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "q04_stale_orders_anti_join": """
        SELECT o_orderkey, o_orderdate, o_orderstatus
        FROM orders o
        WHERE NOT EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        )
    """,
    "q05_active_customers_semi_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 1000.0
        )
    """,
    "q06_filter_pushdown": """
        SELECT event_id, user_id, value
        FROM events
        WHERE event_type = 'purchase' AND value > 100.0 AND props IS NOT NULL
    """,
    "q07_watermark_max": """
        SELECT event_type,
               max(ts) AS wm_ts,
               coalesce(max(event_id), 0) AS wm_id,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    "q08_distinct_pairs": """
        SELECT DISTINCT user_id, event_type FROM events
    """,
    "q09_insert_if_absent": """
        SELECT event_id, value
        FROM events WHERE ts < TIMESTAMP '2024-03-01 00:00:00'
        UNION ALL
        SELECT event_id, value * 2 AS value
        FROM events e
        WHERE ts >= TIMESTAMP '2024-02-01 00:00:00'
          AND NOT EXISTS (
            SELECT 1 FROM events x
            WHERE x.ts < TIMESTAMP '2024-03-01 00:00:00'
              AND x.event_id = e.event_id
          )
    """,
    "q10_array_roundtrip": """
        SELECT l_orderkey,
               unnest(parts) AS part_key,
               n_parts
        FROM (
          SELECT l_orderkey,
                 list_sort(list(l_partkey)) AS parts,
                 count(*) AS n_parts
          FROM lineitem GROUP BY l_orderkey
        )
    """,
    "q11_flatten_surrogate_ids": """
        SELECT
          sha256(concat_ws('|', CAST(l_orderkey AS VARCHAR),
                                CAST(l_linenumber AS VARCHAR))) AS id,
          l_orderkey, l_linenumber, l_partkey,
          CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR) AS DOUBLE) AS quantity
        FROM lineitem
    """,
    "q12_running_customer_total": """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS order_seq,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS VARCHAR) AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "q13_rollup_customer_balance": """
        SELECT r_name, n_name,
               count(*) AS n_customers,
               CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "q14_sessionize": """
        WITH flagged AS (
          SELECT user_id, ts, event_id, value,
                 CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                        OR lag(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
          SELECT user_id, ts, value,
                 CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS session_seq
          FROM flagged
        )
        SELECT user_id, session_seq,
               min(ts) AS session_start,
               max(ts) AS session_end,
               count(*) AS n_events,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS session_value
        FROM numbered
        GROUP BY user_id, session_seq
    """,
    "q15_hourly_rollup": """
        SELECT date_trunc('hour', ts) AS hour,
               event_type,
               count(*) AS n,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY date_trunc('hour', ts), event_type
    """,
    "q16_json_extract": """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               count(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END) AS null_k
        FROM events GROUP BY event_type
    """,
    "q17_github_handles": """
        SELECT regexp_extract(
                 'https://github.com/' || source || '/repo' || CAST(doc_id AS VARCHAR),
                 'github\\.com/([^/]+)', 1) AS handle,
               count(*) AS n_repos
        FROM documents GROUP BY 1
    """,
    "q18_unixtime_roundtrip": """
        SELECT event_id,
               epoch_us(ts) AS ts_us,
               CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS ts_sec,
               make_timestamp(epoch_us(ts)) AS ts_roundtrip
        FROM events
    """,
    "q19_decimal38_quantities": """
        SELECT l_returnflag,
               CAST(CAST(sum(CAST(CAST(l_orderkey AS VARCHAR) || repeat('9', 15) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS sum_big,
               CAST(CAST(max(CAST(CAST(l_orderkey AS VARCHAR) || repeat('9', 15) AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS max_big
        FROM lineitem GROUP BY l_returnflag
    """,
    "q20_topk_sources": """
        SELECT source, lang, count(*) AS n_docs
        FROM documents
        GROUP BY source, lang
        ORDER BY n_docs DESC, source ASC, lang ASC
        LIMIT 10
    """,
    "q35_supplier_fulfillment": """
        SELECT n_name,
               count(DISTINCT regexp_extract(
                 'https://www.' || lower(s_name) || '.example.com/home',
                 '^(?:https?://)?(?:www\\.)?([^/.]+)', 1)) AS n_companies,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l_discount AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    # Mirrors the Spark union+window as-of rewrite verbatim (DuckDB's
    # native ASOF JOIN leaves same-timestamp tie order unspecified, so
    # the oracle re-states the exact construction instead).
    "q38_asof_prev_view": """
        WITH u AS (
          SELECT event_id, user_id, ts, 1 AS side,
                 NULL::BIGINT AS carry_id, NULL::TIMESTAMP AS carry_ts
          FROM events WHERE event_type = 'click'
          UNION ALL
          SELECT event_id, user_id, ts, 0 AS side, event_id, ts
          FROM events WHERE event_type = 'view'
        ),
        filled AS (
          SELECT event_id, user_id, ts, side,
                 last_value(carry_id IGNORE NULLS) OVER w AS prev_view_id,
                 last_value(carry_ts IGNORE NULLS) OVER w AS prev_view_ts
          FROM u
          WINDOW w AS (
            PARTITION BY user_id
            ORDER BY ts, event_id, side
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
          )
        )
        SELECT event_id AS click_id, user_id, ts AS click_ts,
               prev_view_id, prev_view_ts
        FROM filled WHERE side = 1
    """,
    "q39_range_join_clicks_before_error": """
        SELECT e.event_id AS err_id, e.user_id, e.ts AS err_ts,
               count(c.event_id) AS n_clicks
        FROM events e
        LEFT JOIN events c
          ON c.event_type = 'click'
         AND c.user_id = e.user_id
         AND epoch_us(c.ts) >= epoch_us(e.ts) - 600000000
         AND epoch_us(c.ts) <  epoch_us(e.ts)
        WHERE e.event_type = 'error'
        GROUP BY e.event_id, e.user_id, e.ts
    """,
    "q43_topn_per_group": """
        SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
        FROM (
          SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                 row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
                 ) AS rn
          FROM lineitem
        )
        WHERE rn <= 3
    """,
    # Spark's window(ts, 1h, 15m) assigns each event to the 4
    # epoch-aligned windows covering it; time_bucket(15m) gives the
    # newest window start and k=0..3 walks back through the rest
    "q68_sliding_window_rollup": """
        SELECT time_bucket(INTERVAL '15 minutes', ts)
                 - k * INTERVAL '15 minutes' AS window_start,
               event_type,
               count(*) AS n,
               CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
        FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
        GROUP BY window_start, event_type
    """,
    "q69_conversion_funnel": """
        WITH signups AS (
          SELECT user_id, min(ts) AS signup_ts
          FROM events WHERE event_type = 'signup' GROUP BY user_id
        ), flags AS (
          SELECT s.user_id,
                 date_trunc('week', s.signup_ts) AS cohort_week,
                 max(CASE WHEN p.ts IS NOT NULL THEN 1 ELSE 0 END) AS converted
          FROM signups s
          LEFT JOIN events p
            ON p.event_type = 'purchase'
           AND p.user_id = s.user_id
           AND p.ts >= s.signup_ts
           AND p.ts <= s.signup_ts + INTERVAL 7 DAY
          GROUP BY s.user_id, date_trunc('week', s.signup_ts)
        )
        SELECT cohort_week,
               count(*) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_converted,
               sum(converted)::DOUBLE / count(*)::DOUBLE AS conversion_rate
        FROM flags GROUP BY cohort_week
    """,
    # q45: the DuckDB twins live beside the Spark codec in
    # sources/jdbc.py; the SQL is assembled below to keep the two
    # dialects' escaping rules in ONE reviewed place each.
    "q45_pg_array_codec": None,  # filled in at import time below
}


def _q45_oracle() -> str:
    from cardano_spark.sources.jdbc import (
        decode_pg_text_array_sql,
        encode_pg_text_array_sql,
    )

    enc = encode_pg_text_array_sql("arr")
    dec = decode_pg_text_array_sql(enc)
    return f"""
        SELECT p_partkey,
               {enc} AS pg_literal,
               array_to_string({dec}, chr(31)) AS decoded_joined,
               {dec} = arr AS roundtrip_ok
        FROM (
          SELECT p_partkey,
                 [p_name, 'q"' || p_brand, 'b\\' || p_type, CAST(p_size AS VARCHAR)] AS arr
          FROM part
        )
    """


RELATIONAL_ORACLES["q45_pg_array_codec"] = _q45_oracle()

RELATIONAL_ORACLES["q52_market_share"] = """
    WITH asia AS (
      SELECT c_custkey, n_name
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ), rev AS (
      SELECT year(o_orderdate) AS o_year,
             n_name,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(9,6)) AS r
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN asia   ON o_custkey = c_custkey
    ), agg AS (
      SELECT o_year,
             CAST(CAST(sum(CASE WHEN n_name = 'NATION_2' THEN r
                                ELSE CAST(0 AS DECIMAL(18,2)) END)
                  AS VARCHAR) AS DOUBLE) AS nation_rev,
             CAST(CAST(sum(r) AS VARCHAR) AS DOUBLE) AS total_rev
      FROM rev GROUP BY o_year
    )
    SELECT o_year, nation_rev, total_rev,
           nation_rev / total_rev AS mkt_share
    FROM agg
"""

RELATIONAL_ORACLES["q53_large_orders"] = """
    WITH big AS (
      SELECT l_orderkey,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 135
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
    FROM big
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY total_qty DESC, o_orderkey ASC
    LIMIT 100
"""

# 16^15 = 1152921504606846976 (md5_long's 60-bit hash space); the
# estimator arithmetic mirrors q54 op-for-op so the IEEE doubles agree
RELATIONAL_ORACLES["q54_kmv_distinct_sketch"] = """
    WITH h AS (
      SELECT DISTINCT
             ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
      FROM events WHERE user_id IS NOT NULL
    ), kmin AS (
      SELECT h FROM h ORDER BY h ASC LIMIT 64
    )
    SELECT max(h) AS kth_min_hash,
           count(*)::BIGINT AS n_retained,
           CASE WHEN count(*) < 64 THEN count(*)::BIGINT
                ELSE CAST(floor(63.0 / (max(h)::DOUBLE / 1152921504606846976.0))
                          AS BIGINT) END AS est_distinct,
           64::BIGINT AS k
    FROM kmin
"""

RELATIONAL_ORACLES["q70_cube_order_stats"] = """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           count(*) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

RELATIONAL_ORACLES["q71_pivot_priority_status"] = """
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders
    GROUP BY o_orderpriority
"""

def _q74_oracle() -> str:
    from cardano_spark.plans.queries import (
        HLL_M,
        _HLL_NUMERATOR,
        _HLL_ONE_SCALED,
        _HLL_REM_BITS,
        _HLL_REM_MASK,
    )

    z = f"(present_sum + ({HLL_M} - n_present) * {_HLL_ONE_SCALED}::BIGINT)"
    return f"""
        WITH h AS (
          SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
          FROM events WHERE user_id IS NOT NULL
        ), r AS (
          SELECT h >> {_HLL_REM_BITS} AS reg, h & {_HLL_REM_MASK} AS rem FROM h
        ), w AS (
          SELECT reg,
                 min(CASE WHEN rem = 0 THEN 1::BIGINT
                          ELSE 1::BIGINT << length(bin(rem)) END) AS mw
          FROM r GROUP BY reg
        ), z AS (
          SELECT count(*)::BIGINT AS n_present, sum(mw)::BIGINT AS present_sum
          FROM w
        )
        SELECT {HLL_M}::BIGINT AS m, n_present,
               {z}::BIGINT AS z_scaled,
               {_HLL_NUMERATOR} / {z}::DOUBLE AS raw_estimate
        FROM z
    """


RELATIONAL_ORACLES["q74_hll_distinct_sketch"] = _q74_oracle()

RELATIONAL_ORACLES["q76_scd2_user_state"] = """
    WITH c AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN event_type IS DISTINCT FROM lag(event_type) OVER w THEN 1
                  ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), ep AS (
      SELECT user_id, event_type, ts,
             sum(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS _ep
      FROM c
    ), g AS (
      SELECT user_id, _ep, event_type, min(ts) AS valid_from
      FROM ep GROUP BY user_id, _ep, event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER we AS valid_to,
           lead(valid_from) OVER we IS NULL AS is_current,
           _ep::BIGINT AS version
    FROM g WINDOW we AS (PARTITION BY user_id ORDER BY _ep)
"""

# windowed sums in DECIMAL (exact, order-free: DuckDB's segment-tree
# sliding frames would re-associate a double sum differently than
# Spark's running accumulation); the double chain after is identical
RELATIONAL_ORACLES["q80_trailing_anomaly"] = """
    WITH f AS (
      SELECT event_id, user_id, ts, value,
             count(value) OVER w AS n_prev,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS VARCHAR) AS DOUBLE) AS s,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS VARCHAR) AS DOUBLE) AS s2
      FROM events
      WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING
      )
    ), z AS (
      SELECT event_id, user_id, ts, value, n_prev,
             s / n_prev::DOUBLE AS mean_prev,
             sqrt((s2 - s * s / n_prev::DOUBLE) / (n_prev - 1)::DOUBLE) AS sd_prev
      FROM f
    )
    SELECT event_id, user_id, ts, value, n_prev, mean_prev, sd_prev,
           (value - mean_prev) / sd_prev AS z
    FROM z
    WHERE n_prev >= 5 AND sd_prev > 0 AND abs((value - mean_prev) / sd_prev) > 2
"""

RELATIONAL_ORACLES["q82_snapshot_diff"] = """
    WITH old AS (
      SELECT o_orderkey, TRUE AS in_old,
             o_orderstatus AS old_o_orderstatus,
             o_totalprice AS old_o_totalprice
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01'
    ), new AS (
      SELECT o_orderkey, TRUE AS in_new,
             CASE WHEN o_orderkey % 97 = 0 THEN 'X'
                  ELSE o_orderstatus END AS new_o_orderstatus,
             o_totalprice AS new_o_totalprice
      FROM orders WHERE o_orderkey % 101 <> 0
    )
    SELECT o_orderkey,
           old_o_orderstatus, old_o_totalprice,
           new_o_orderstatus, new_o_totalprice,
           CASE WHEN in_old IS NULL THEN 'added'
                WHEN in_new IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type
    FROM old FULL OUTER JOIN new USING (o_orderkey)
    WHERE in_old IS NULL OR in_new IS NULL
       OR old_o_orderstatus IS DISTINCT FROM new_o_orderstatus
       OR old_o_totalprice IS DISTINCT FROM new_o_totalprice
"""

RELATIONAL_ORACLES["q83_retention_matrix"] = """
    WITH ev AS (
      SELECT user_id,
             (ts::DATE - DATE '1970-01-05') // 7 AS week
      FROM events WHERE user_id IS NOT NULL
    ), cohorts AS (
      SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
    ), pairs AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             e.week - c.cohort_week AS week_offset
      FROM ev e JOIN cohorts c USING (user_id)
    )
    SELECT cohort_week, week_offset, count(*)::BIGINT AS n_users
    FROM pairs GROUP BY cohort_week, week_offset
"""

RELATIONAL_ORACLES["q84_ordered_funnel"] = """
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE user_id IS NOT NULL AND event_type = 'signup'
      GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > t1.t1
      GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > t2.t2
      GROUP BY e.user_id
    )
    SELECT count(*)::BIGINT AS n_signup,
           count(t2.t2)::BIGINT AS n_click_after,
           count(t3.t3)::BIGINT AS n_purchase_after
    FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
"""

def _q87_oracle() -> str:
    from cardano_spark.functions.layout import zorder_key_sql

    z = zorder_key_sql("ub", "tb", bits=8)
    return f"""
        SELECT event_id, ub::BIGINT AS user_bucket,
               tb::BIGINT AS time_bucket,
               {z}::BIGINT AS zkey
        FROM (
          SELECT event_id,
                 user_id % 256 AS ub,
                 (epoch_us(ts) // 1000000 // 3600) % 256 AS tb
          FROM events
        )
    """


RELATIONAL_ORACLES["q87_zorder_layout_keys"] = _q87_oracle()

RELATIONAL_ORACLES["q89_salted_heavy_key_agg"] = """
    SELECT event_type,
           count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
"""

RELATIONAL_ORACLES["q90_gapfill_forward_fill"] = """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             count(*) AS n_events,
             sum(CAST(value AS DECIMAL(18,2))) AS total_dec
      FROM events WHERE user_id < 50
      GROUP BY user_id, date_trunc('hour', ts)
    ), bounds AS (
      SELECT user_id, min(hour) AS h0, max(hour) AS h1
      FROM hourly GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ), joined AS (
      SELECT g.user_id, g.hour, h.n_events, h.total_dec
      FROM grid g LEFT JOIN hourly h USING (user_id, hour)
    )
    SELECT user_id, hour,
           coalesce(n_events, 0)::BIGINT AS n_events,
           CAST(CAST(
             last_value(total_dec IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS VARCHAR) AS DOUBLE) AS filled_value
    FROM joined
"""

RELATIONAL_ORACLES["q91_delta_join_refresh"] = """
    WITH o_old AS (
      SELECT o_orderkey, o_orderstatus FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-07-01'
    ), o_new AS (
      SELECT o_orderkey, o_orderstatus FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-07-01'
    ), l_old AS (
      SELECT l_orderkey AS o_orderkey, l_quantity FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1997-07-01'
    ), l_new AS (
      SELECT l_orderkey AS o_orderkey, l_quantity FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-07-01'
    ), delta AS (
      SELECT o.o_orderstatus, l.l_quantity FROM o_new o JOIN l_old l USING (o_orderkey)
      UNION ALL
      SELECT o.o_orderstatus, l.l_quantity FROM o_old o JOIN l_new l USING (o_orderkey)
      UNION ALL
      SELECT o.o_orderstatus, l.l_quantity FROM o_new o JOIN l_new l USING (o_orderkey)
    )
    SELECT o_orderstatus,
           count(*) AS n_new_rows,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS qty_delta
    FROM delta GROUP BY o_orderstatus
"""

RELATIONAL_ORACLES["q92_window_rank_suite"] = """
    SELECT o_custkey, o_orderkey,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           dense_rank() OVER w AS drank
    FROM orders WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

_HAMMING4 = " + ".join(
    f"CASE WHEN substr(c_sfx, {i}, 1) <> substr(s_sfx, {i}, 1) THEN 1 ELSE 0 END"
    for i in range(1, 5)
)

# semantics stated directly (quadratic filter — fine at oracle scale);
# the Spark plan must reproduce it through the lossless segment blocks
RELATIONAL_ORACLES["q93_fuzzy_match_join"] = f"""
    SELECT c_custkey, s_suppkey, c_sfx, s_sfx,
           hamming, levenshtein(c_sfx, s_sfx)::BIGINT AS lev
    FROM (
      SELECT c.c_custkey, s.s_suppkey,
             right(c.c_name, 4) AS c_sfx,
             right(s.s_name, 4) AS s_sfx,
             ({_HAMMING4})::BIGINT AS hamming
      FROM customer c CROSS JOIN supplier s
    ) WHERE hamming <= 1
"""

RELATIONAL_ORACLES["q94_supplier_diversity"] = """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) lp
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size BETWEEN 5 AND 40
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
"""

RELATIONAL_ORACLES["q95_equi_depth_histogram"] = """
    WITH bounds AS (
      SELECT [quantile_cont(value, 0.1), quantile_cont(value, 0.2),
              quantile_cont(value, 0.3), quantile_cont(value, 0.4),
              quantile_cont(value, 0.5), quantile_cont(value, 0.6),
              quantile_cont(value, 0.7), quantile_cont(value, 0.8),
              quantile_cont(value, 0.9)] AS bs
      FROM events
    )
    SELECT bucket, count(*) AS n FROM (
      SELECT list_reduce(
               list_prepend(0::BIGINT,
                 list_transform(bs, b -> CASE WHEN value > b THEN 1::BIGINT ELSE 0::BIGINT END)),
               (x, y) -> x + y) AS bucket
      FROM events, bounds
    ) GROUP BY bucket
"""

RELATIONAL_ORACLES["q96_distribution_drift"] = """
    WITH mid AS (
      SELECT make_timestamp(CAST(floor(
               (epoch_us(min(ts))::DOUBLE + epoch_us(max(ts))::DOUBLE) / 2.0
             ) AS BIGINT)) AS mid
      FROM events
    ), halves AS (
      SELECT event_type,
             count(*) FILTER (WHERE ts < mid) AS n1,
             count(*) FILTER (WHERE ts >= mid) AS n2
      FROM events, mid GROUP BY event_type
    ), tot AS (
      SELECT sum(n1) AS t1, sum(n2) AS t2,
             list_sort(list({'event_type': event_type, 'n1': n1, 'n2': n2})) AS terms,
             count(*)::BIGINT AS n_types
      FROM halves
    )
    SELECT n_types, t1::BIGINT AS n_first, t2::BIGINT AS n_second,
           list_reduce(
             list_prepend(0.0::DOUBLE, list_transform(terms,
               t -> (t.n2::DOUBLE - t.n1::DOUBLE * t2::DOUBLE / t1::DOUBLE)
                    * (t.n2::DOUBLE - t.n1::DOUBLE * t2::DOUBLE / t1::DOUBLE)
                    / (t.n1::DOUBLE * t2::DOUBLE / t1::DOUBLE))),
             (x, y) -> x + y) AS chi_square
    FROM tot
"""

RELATIONAL_ORACLES["q97_asof_next_purchase"] = """
    WITH u AS (
      SELECT event_id, user_id, ts, 0 AS side,
             NULL::BIGINT AS carry_id, NULL::TIMESTAMP AS carry_ts
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT event_id, user_id, ts, 1 AS side, event_id, ts
      FROM events WHERE event_type = 'purchase'
    ),
    filled AS (
      SELECT event_id, user_id, ts, side,
             first_value(carry_id IGNORE NULLS) OVER w AS next_purchase_id,
             first_value(carry_ts IGNORE NULLS) OVER w AS next_purchase_ts
      FROM u
      WINDOW w AS (
        PARTITION BY user_id
        ORDER BY ts, event_id, side
        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
      )
    )
    SELECT event_id AS click_id, user_id, ts AS click_ts,
           next_purchase_id, next_purchase_ts,
           epoch_us(next_purchase_ts) - epoch_us(ts) AS gap_us
    FROM filled WHERE side = 0
"""

RELATIONAL_ORACLES["q98_transition_matrix"] = """
    WITH pairs AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events WHERE user_id IS NOT NULL
    ), counts AS (
      SELECT from_type, to_type, count(*) AS n
      FROM pairs WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           sum(n) OVER (PARTITION BY from_type)::BIGINT AS from_total,
           n::DOUBLE / sum(n) OVER (PARTITION BY from_type)::DOUBLE AS p
    FROM counts
"""

RELATIONAL_ORACLES["q99_promo_revenue_share"] = """
    WITH j AS (
      SELECT CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l_discount AS DECIMAL(9,6)) AS rev,
             p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1998-03-01'
    )
    SELECT CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev END) AS VARCHAR) AS DOUBLE) AS promo_revenue,
           CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS total_revenue,
           100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev END) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(sum(rev) AS VARCHAR) AS DOUBLE) AS promo_pct
    FROM j
"""

RELATIONAL_ORACLES["q101_peak_concurrency"] = """
    WITH deltas AS (
      SELECT event_type, date_trunc('day', ts) AS day, epoch_us(ts) AS t,
             1 AS delta, event_id
      FROM events
      UNION ALL
      SELECT event_type, date_trunc('day', ts) AS day, epoch_us(ts) + 300000000 AS t,
             -1 AS delta, event_id
      FROM events
    ), live AS (
      SELECT event_type, day,
             sum(delta) OVER (
               PARTITION BY event_type, day
               ORDER BY t, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS live
      FROM deltas
    )
    SELECT event_type, day,
           max(live)::BIGINT AS peak_concurrent,
           (count(*) // 2)::BIGINT AS n_windows
    FROM live GROUP BY event_type, day
"""

RELATIONAL_ORACLES["q102_copurchase_pairs"] = """
    WITH per_order AS (
      SELECT l_orderkey, list_sort(list(DISTINCT l_partkey)) AS parts
      FROM lineitem GROUP BY l_orderkey
    ), pairs AS (
      SELECT a.p1, b.p2 FROM (
        SELECT l_orderkey, unnest(parts) AS p1, parts FROM per_order
      ) a, unnest(a.parts) AS b(p2)
      WHERE b.p2 > a.p1
    )
    SELECT p1, p2, count(*) AS support
    FROM pairs GROUP BY p1, p2
    ORDER BY support DESC, p1 ASC, p2 ASC
    LIMIT 20
"""

RELATIONAL_ORACLES["q105_hierarchical_shares"] = """
    WITH leaf AS (
      SELECT r_name, n_name,
             sum(CAST(c_acctbal AS DECIMAL(18,2))) AS bal_dec
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    SELECT r_name, n_name,
           CAST(CAST(bal_dec AS VARCHAR) AS DOUBLE) AS balance,
           CAST(CAST(bal_dec AS VARCHAR) AS DOUBLE)
             / CAST(CAST(sum(bal_dec) OVER (PARTITION BY r_name) AS VARCHAR) AS DOUBLE)
             AS share_of_region,
           CAST(CAST(sum(bal_dec) OVER (PARTITION BY r_name) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(sum(bal_dec) OVER () AS VARCHAR) AS DOUBLE)
             AS region_share_of_world
    FROM leaf
"""

# q127: per-key count distribution stats; top key via the q72
# row_number idiom, percentiles via quantile_cont (bit-identical to
# Spark's exact interpolated percentile — the q63 precedent).
RELATIONAL_ORACLES["q127_key_skew_report"] = """
    WITH g1 AS (
      SELECT coalesce(user_id::VARCHAR, '<NULL>') AS k,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1
    ), t1 AS (
      SELECT k FROM g1 ORDER BY n DESC, k LIMIT 1
    ), s1 AS (
      SELECT sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
             max(n)::BIGINT AS max_n,
             quantile_cont(n, 0.5) AS p50_n,
             quantile_cont(n, 0.99) AS p99_n
      FROM g1
    ), g2 AS (
      SELECT coalesce(event_type, '<NULL>') AS k,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1
    ), t2 AS (
      SELECT k FROM g2 ORDER BY n DESC, k LIMIT 1
    ), s2 AS (
      SELECT sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
             max(n)::BIGINT AS max_n,
             quantile_cont(n, 0.5) AS p50_n,
             quantile_cont(n, 0.99) AS p99_n
      FROM g2
    )
    SELECT 'user_id' AS key_col, s1.n_rows, s1.n_keys, t1.k AS top_key,
           s1.max_n, s1.max_n::DOUBLE / s1.n_rows::DOUBLE AS top_share,
           s1.p50_n, s1.p99_n
    FROM s1, t1
    UNION ALL
    SELECT 'event_type' AS key_col, s2.n_rows, s2.n_keys, t2.k AS top_key,
           s2.max_n, s2.max_n::DOUBLE / s2.n_rows::DOUBLE AS top_share,
           s2.p50_n, s2.p99_n
    FROM s2, t2
"""
