"""DuckDB oracle SQL — one entry per SQL-expressible query in
plans/queries.py, same column names, engineered for bit-identical values:
double sums go through DECIMAL, timestamps through epoch_us/strftime.

The driver registers views: region nation customer supplier part orders
lineitem events documents embeddings.  NOTE events.ts is TIMESTAMP_NS in
DuckDB; ``epoch_us`` truncates exactly like the Spark-side ns→us DIV.
"""

from __future__ import annotations

_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"

# per-language stopword score fragments (must mirror functions.text.LANG_STOPWORDS)
_SW = {
    "en": "['the','a','of','and','to']",
    "de": "['der','die','und','das','ein']",
    "fr": "['le','la','et','les','des']",
    "es": "['el','la','de','que','los']",
    "zh": "['de5','shi4','le5','zai4','he2']",
}


def _score(lang: str) -> str:
    return f"CAST(len(list_filter({_TOKS}, t -> list_contains({_SW[lang]}, t))) AS INT)"


_LANG_SCORES = ", ".join(f"{_score(g)} AS s_{g}" for g in _SW)
_BEST = "greatest(s_en, s_de, s_fr, s_es, s_zh)"
_PRED = (
    "CASE WHEN s_en = best AND best > 0 THEN 'en' "
    "WHEN s_de = best AND best > 0 THEN 'de' "
    "WHEN s_fr = best AND best > 0 THEN 'fr' "
    "WHEN s_es = best AND best > 0 THEN 'es' "
    "WHEN s_zh = best AND best > 0 THEN 'zh' ELSE 'und' END"
)

# minhash: k=8 linear min-hashes over word trigram shingles (mirrors
# shingles(n=3): sliding 3-token windows joined by spaces, with repeats;
# empty when <3 tokens).  Hash family mirrors llm.minhash: ONE md5 per
# shingle (60-bit hex prefix → ubigint → mod P), then (a_i·h + b_i) mod P
# with the FROZEN (a_i, b_i) pairs imported from the engine itself.
from verified_sources_spark.llm.minhash import MINHASH_PRIME as _MHP  # noqa: E402
from verified_sources_spark.llm.minhash import minhash_ab as _mh_ab  # noqa: E402

_SHINGLES = (
    "CASE WHEN len(toks) >= 3 THEN list_transform(generate_series(1, len(toks)-2), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [] END"
)
_BASE = f"list_transform(sh, s -> CAST(('0x' || substr(md5(s), 1, 15))::UBIGINT % {_MHP} AS BIGINT))"
_MH = ", ".join(
    f"list_min(list_transform(base, h -> (h * {_mh_ab(i)[0]} + {_mh_ab(i)[1]}) % {_MHP})) AS mh_{i}"
    for i in range(8)
)
_SIG_CTE = (
    f"WITH sig AS (SELECT doc_id, {_MH} FROM "
    f"(SELECT doc_id, {_BASE} AS base FROM "
    f"(SELECT doc_id, {_SHINGLES} AS sh FROM (SELECT doc_id, {_TOKS} AS toks FROM documents))))"
)
_BANDS_CTE = (
    "bands AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, md5(mh_{2*b} || '|' || mh_{2*b+1}) AS band_hash "
        f"FROM sig WHERE mh_0 IS NOT NULL AND mh_1 IS NOT NULL AND mh_2 IS NOT NULL AND mh_3 IS NOT NULL "
        f"AND mh_4 IS NOT NULL AND mh_5 IS NOT NULL AND mh_6 IS NOT NULL AND mh_7 IS NOT NULL"
        for b in range(4)
    )
    + ")"
)
_PAIRS_SQL = (
    f"{_SIG_CTE}, {_BANDS_CTE} "
    "SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
    "FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash "
    "AND a.doc_id < b.doc_id"
)

_DOT64 = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)
_NORM = "sqrt(list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"


ORACLE_SQL: dict[str, str] = {
    # ---------------------------------------------------------- relational
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
          CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
          CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT o_orderkey,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
          strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
          o_orderpriority
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q6_revenue_change": """
        SELECT
          CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
          CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "top_k_orders": """
        SELECT o_orderkey, o_custkey, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    "rollup_revenue": """
        SELECT COALESCE(r_name, 'ALL') AS region,
               COALESCE(n_name, 'ALL') AS nation,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
    """,
    "window_top_orders_per_customer": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
          FROM orders)
        WHERE rn <= 3
    """,
    "window_order_gaps": """
        SELECT o_custkey, o_orderkey,
               CAST(date_diff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate ASC, o_orderkey ASC),
                    o_orderdate) AS BIGINT) AS gap_days
        FROM orders
    """,
    "window_running_total": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate ASC, o_orderkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_total
        FROM orders
    """,
    "semi_join_segment_counts": """
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
    """,
    "anti_join_idle_customers": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "set_except_customers": """
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    """,
    "set_intersect_customers": """
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "pivot_qty_by_status": """
        SELECT l_returnflag,
          CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
          CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "unpivot_lineitem_charges": """
        SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS charge_type, l_extendedprice AS amount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
    "date_chunk_order_counts": """
        WITH chunks AS (
          SELECT rs AS range_start,
                 least(rs + INTERVAL 365 DAY, TIMESTAMP '2002-01-01') AS range_end
          FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2002-01-01',
                               INTERVAL 365 DAY) t(rs)
          WHERE rs < TIMESTAMP '2002-01-01')
        SELECT strftime(range_start, '%Y-%m-%d') AS range_start,
               CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
        FROM chunks LEFT JOIN orders
          ON o_orderdate >= range_start AND o_orderdate < range_end
        GROUP BY 1
    """,
    "scalar_functions_showcase": """
        SELECT o_orderkey,
          lower(o_orderpriority) AS priority_lower,
          regexp_replace(o_orderpriority, '^[0-9]-', '') AS priority_clean,
          md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus)) AS row_id,
          strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
          substring(o_orderstatus, 1, 1) AS status_code,
          CAST(length(o_orderpriority) AS BIGINT) AS priority_len
        FROM orders
    """,
    # ------------------------------------------------------- events / ELT
    "incremental_events_window": """
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
          AND ts <  TIMESTAMP '2024-01-22 00:00:00'
    """,
    "events_keep_latest_per_user": """
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1
    """,
    "merge_upsert_events": """
        WITH src AS (SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-18 00:00:00'),
             tgt AS (SELECT * FROM events WHERE ts <  TIMESTAMP '2024-01-20 00:00:00')
        SELECT event_id, event_type, epoch_us(ts) AS ts_us, value FROM src
        UNION ALL
        SELECT event_id, event_type, epoch_us(ts), value FROM tgt
        WHERE event_id NOT IN (SELECT event_id FROM src)
    """,
    "cdc_apply_changes": """
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
        WHERE rn = 1 AND event_type <> 'error'
    """,
    "route_counts_events": """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events GROUP BY event_type
    """,
    "sessionize_events": """
        WITH flagged AS (
          SELECT user_id, event_id, ts,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        sess AS (
          SELECT user_id, event_id, ts,
            CAST(SUM(new_session) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS session_id
          FROM flagged)
        SELECT user_id, session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MIN(epoch_us(ts)) AS BIGINT) AS start_us,
               CAST(MAX(epoch_us(ts)) AS BIGINT) AS end_us
        FROM sess GROUP BY user_id, session_id
    """,
    "stream_bounded_offsets": """
        WITH msg AS (
          SELECT event_type AS topic,
                 CAST(user_id % 4 AS INT) AS "partition",
                 ts, event_id,
                 CAST(row_number() OVER (PARTITION BY event_type, user_id % 4
                      ORDER BY ts ASC, event_id ASC) AS BIGINT) - 1 AS "offset"
          FROM events)
        SELECT topic, "partition", "offset",
               md5(concat_ws('|', topic, CAST("partition" AS VARCHAR),
                             CAST("offset" AS VARCHAR))) AS msg_id,
               event_id
        FROM msg WHERE "offset" >= 5
    """,
    "json_extract_events": """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1
    """,
    # ------------------------------------------------ documents/embeddings
    "dedup_exact_docs": """
        SELECT md5(text) AS content_md5,
               CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
               CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "doc_fingerprints": f"""
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fingerprint,
               CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct_tokens
        FROM documents
    """,
    "token_stats_docs": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
        SELECT doc_id,
          CAST(length(text) AS BIGINT) AS n_chars,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
            / greatest(CAST(len(toks) AS BIGINT), 1) AS avg_token_len,
          CAST(len(list_filter(toks, x -> list_contains({_SW['en']}, x))) AS BIGINT) AS n_stopwords,
          CAST(len(list_filter(toks, x -> list_contains({_SW['en']}, x))) AS DOUBLE)
            / greatest(CAST(len(toks) AS BIGINT), 1) AS stopword_ratio
        FROM t
    """,
    "lang_id_docs": f"""
        WITH s AS (SELECT doc_id, lang, {_LANG_SCORES} FROM documents),
             b AS (SELECT *, {_BEST} AS best FROM s)
        SELECT doc_id, lang, {_PRED} AS lang_pred,
               CAST(CASE WHEN {_PRED} = lang THEN 1 ELSE 0 END AS BIGINT) AS is_match
        FROM b
    """,
    "minhash_signatures_docs": f"{_SIG_CTE} SELECT * FROM sig",
    "lsh_candidate_pairs_docs": _PAIRS_SQL,
    "ngram_jaccard_docs": f"""
        {_SIG_CTE}, {_BANDS_CTE},
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band_idx = b.band_idx
            AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
        sets AS (SELECT doc_id, list_distinct({_SHINGLES.replace('toks', 'toks2')}) AS sh
                 FROM (SELECT doc_id, {_TOKS} AS toks2 FROM documents))
        SELECT id_a, id_b,
          round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))), 6)
            AS jaccard
        FROM pairs
        JOIN sets sa ON sa.doc_id = id_a
        JOIN sets sb ON sb.doc_id = id_b
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.0
    """,
    "near_dedup_docs_keep": f"""
        {_SIG_CTE.replace("WITH sig", "WITH RECURSIVE sig", 1)}, {_BANDS_CTE},
        pairs AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band_idx = b.band_idx
            AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
        sets AS (SELECT doc_id, list_distinct({_SHINGLES.replace('toks', 'toks2')}) AS sh
                 FROM (SELECT doc_id, {_TOKS} AS toks2 FROM documents)),
        verified AS (
          SELECT id_a, id_b FROM pairs
          JOIN sets sa ON sa.doc_id = id_a
          JOIN sets sb ON sb.doc_id = id_b
          WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5),
        edges AS (SELECT id_a AS src, id_b AS dst FROM verified
                  UNION SELECT id_b AS src, id_a AS dst FROM verified),
        reach AS (
          SELECT src AS node, src AS r FROM edges
          UNION
          SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON e.src = reach.r),
        comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
    """,
    "cosine_topk_embeddings": f"""
        WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        scored AS (
          SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                 {_DOT64.replace('a.embedding', 'q.embedding').replace('b.embedding', 'b.embedding')}
                 / ({_NORM.format(v='q.embedding')} * {_NORM.format(v='b.embedding')}) AS cos
          FROM q, embeddings b WHERE b.vec_id <> q.vec_id),
        ranked AS (
          SELECT query_id, neighbor_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank,
                 round(cos, 4) AS cosine
          FROM scored)
        SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 3
    """,
    "embedding_label_stats": """
        WITH n AS (
          SELECT label,
                 sqrt(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
          FROM embeddings)
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(norm AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_norm
        FROM n GROUP BY label
    """,
    "multimodal_manifest": """
        SELECT doc_id,
               'application/octet-stream' AS mime,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               md5(text) AS content_md5
        FROM documents
    """,
}

ORACLE_SQL.update({
    "as_of_latest_order": """
        SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
               (SELECT strftime(max(o_orderdate), '%Y-%m-%d') FROM orders o
                 WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
                 AS prev_order_date
        FROM events e
    """,
    "cdc_txn_batches": """
        WITH r AS (
          SELECT event_id AS lsn, user_id AS txn_id,
                 row_number() OVER (ORDER BY event_id) AS rows_so_far
          FROM events),
        te AS (SELECT txn_id, max(rows_so_far) AS txn_end FROM r GROUP BY txn_id)
        SELECT r.lsn AS event_id, r.txn_id,
               CAST(floor((te.txn_end - 1) / 500.0) AS BIGINT) AS batch_id
        FROM r JOIN te USING (txn_id)
    """,
    "grouped_shard_cursors": """
        SELECT CAST(user_id % 8 AS INT) AS shard,
               CAST(max(event_id) AS BIGINT) AS last_value
        FROM events GROUP BY 1
    """,
    "token_child_table": f"""
        SELECT doc_id,
               CAST(generate_subscripts(toks, 1) - 1 AS INT) AS _list_idx,
               unnest(toks) AS token
        FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
    """,
    "quality_score_docs": f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
        m AS (SELECT doc_id, text,
                CAST(len(toks) AS INT) AS n_tok,
                CAST(len(list_filter(toks, x -> list_contains({_SW['en']}, x))) AS INT) AS n_stop
              FROM t)
        SELECT doc_id,
          round(
            0.5 * least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
            + 0.3 * least((n_stop / greatest(n_tok, 1)) * 5.0, 1.0)
            + 0.2 * (1.0 - (CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS INT)
                            / greatest(length(text), 1))), 6) AS quality
        FROM m
    """,
    "dedup_exact_keep_docs": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE doc_id IN (SELECT CAST(min(doc_id) AS BIGINT) FROM documents GROUP BY md5(text))
    """,
    "count_distinct_customers": """
        SELECT o_orderstatus,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    "union_by_name_segments": """
        SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL BY NAME
        SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    "events_daily_rollup": """
        SELECT epoch_us(date_trunc('day', ts)) AS window_start_us, event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
})

ORACLE_SQL.update({
    "map_explode_properties": """
        SELECT c_custkey, 'segment' AS property, c_mktsegment AS value FROM customer
        UNION ALL
        SELECT c_custkey, 'name', c_name FROM customer
    """,
    "window_moving_avg": """
        SELECT o_custkey, o_orderkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
            / COUNT(*) OVER w AS moving_avg_3
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "cube_status_priority": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    "ntile_customer_quartiles": """
        SELECT c_custkey, c_acctbal,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               CAST(row_number() OVER w AS BIGINT) AS balance_rank
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
    "string_functions_showcase": """
        SELECT c_custkey,
          upper(c_name) AS name_upper,
          lpad(c_mktsegment, 12, '*') AS seg_padded,
          translate(c_name, 'aeiou', 'AEIOU') AS name_translated,
          split_part(c_name, '#', 2) AS name_number,
          CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS seg_distance,
          reverse(c_mktsegment) AS seg_reversed,
          CAST(length(trim(c_name)) AS BIGINT) AS name_len
        FROM customer
    """,
    "datetime_functions_showcase": """
        SELECT o_orderkey,
          CAST(year(o_orderdate) AS BIGINT) AS y,
          CAST(quarter(o_orderdate) AS BIGINT) AS q,
          CAST(month(o_orderdate) AS BIGINT) AS m,
          CAST(day(o_orderdate) AS BIGINT) AS d,
          CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow1,
          strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
          strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
          epoch_us(o_orderdate) AS epoch_us
        FROM orders
    """,
    "conditional_functions_showcase": """
        SELECT c_custkey,
          nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
          COALESCE(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_defaulted,
          greatest(c_acctbal, 0.0) AS bal_floor,
          least(c_acctbal, 5000.0) AS bal_cap,
          CASE WHEN c_acctbal < 0 THEN 'overdrawn'
               WHEN c_acctbal < 5000 THEN 'normal'
               ELSE 'high' END AS bal_bucket,
          CAST(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS BIGINT) AS is_positive
        FROM customer
    """,
})

ORACLE_SQL.update({
    "session_window_events": """
        WITH flagged AS (
          SELECT user_id, ts,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        sess AS (
          SELECT user_id, ts,
            SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM flagged)
        SELECT user_id,
               CAST(MIN(epoch_us(ts)) AS BIGINT) AS start_us,
               CAST(MAX(epoch_us(ts)) + 1800000000 AS BIGINT) AS end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY user_id, session_id
    """,
    "incremental_events_descending": """
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
        FROM events
        WHERE ts <= TIMESTAMP '2024-01-10 00:00:00'
          AND ts >  TIMESTAMP '2024-01-05 00:00:00'
    """,
    "alternate_cursor_events": """
        WITH e AS (
          SELECT event_id,
                 CASE WHEN event_id % 3 = 0 THEN epoch_us(ts) END AS updated_at_us,
                 epoch_us(ts) - 1000000 AS created_at_us
          FROM events)
        SELECT event_id, updated_at_us, created_at_us FROM e
        WHERE COALESCE(updated_at_us, created_at_us) >= 1705276800000000
    """,
})

ORACLE_SQL.update({
    "filter_doc_orders": """
        SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
        FROM orders
        WHERE o_totalprice >= 100000.0 AND o_totalprice < 300000.0
          AND o_orderstatus IN ('O', 'F')
          AND (o_orderpriority = '1-URGENT' OR regexp_matches(o_orderpriority, '^2-'))
    """,
    "bag_set_ops_orders": """
        SELECT o_orderstatus, o_orderpriority FROM orders
        EXCEPT ALL
        SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "correlated_order_stats": """
        SELECT c_custkey,
               CAST(COALESCE((SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey), 0) AS BIGINT) AS n_orders,
               (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
        FROM customer
    """,
    "min_by_part_per_brand": """
        WITH ranked AS (
          SELECT p_brand, p_name, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand
                      ORDER BY p_retailprice ASC, p_partkey ASC) AS rn,
                 MIN(p_retailprice) OVER (PARTITION BY p_brand) AS min_price
          FROM part)
        SELECT p_brand, p_name AS cheapest_part, min_price
        FROM ranked WHERE rn = 1
    """,
})

ORACLE_SQL.update({
    "lag_reread_merge_events": """
        WITH src AS (SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-23 00:00:00'),
             tgt AS (SELECT * FROM events WHERE ts <  TIMESTAMP '2024-01-25 00:00:00')
        SELECT event_id, event_type, epoch_us(ts) AS ts_us, value FROM src
        UNION ALL
        SELECT event_id, event_type, epoch_us(ts), value FROM tgt
        WHERE event_id NOT IN (SELECT event_id FROM src)
    """,
    "control_table_archive_dedup": """
        WITH archives AS (
          SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
        fetched AS (
          SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events
          WHERE ts < TIMESTAMP '2024-01-11 00:00:00')
        SELECT user_id, day FROM archives
        WHERE NOT EXISTS (SELECT 1 FROM fetched f
                          WHERE f.user_id = archives.user_id AND f.day = archives.day)
    """,
})

# the vectorized GEMM path shares cosine_topk's exact output contract
# (cosine rounded 4dp, id-tie-broken ranks) — same oracle by definition
ORACLE_SQL["cosine_topk_vectorized_embeddings"] = ORACLE_SQL["cosine_topk_embeddings"]

ORACLE_SQL["embedding_near_dup_pairs_embeddings"] = """
    WITH n AS (SELECT vec_id, embedding,
      sqrt(list_sum(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                 / (a.nrm * b.nrm), 4) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(generate_series(1, 64),
          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (a.nrm * b.nrm) >= 0.35
"""

# training-data text prep (llm/text_prep.py) — patterns and constants are
# imported from the engine so the two sides cannot drift
from verified_sources_spark.llm.text_prep import PII_PATTERNS as _PII  # noqa: E402

ORACLE_SQL["repetition_signals_docs"] = f"""
    WITH lines AS (
      SELECT doc_id, line FROM (
        SELECT doc_id, trim(unnest(string_split(text, chr(10)))) AS line
        FROM documents)
      WHERE line != ''),
    pl AS (SELECT doc_id, line, count(*) AS cnt, length(line) AS len
           FROM lines GROUP BY doc_id, line),
    ls AS (SELECT doc_id,
             CAST(sum(cnt) AS BIGINT) AS n_lines,
             round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6)
               AS dup_line_frac,
             round(CAST(sum(CASE WHEN cnt > 1 THEN cnt * len ELSE 0 END) AS DOUBLE)
                   / CAST(sum(cnt * len) AS DOUBLE), 6) AS dup_line_char_frac
           FROM pl GROUP BY doc_id),
    bgl AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 2 THEN list_transform(
          generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1])
        ELSE [] END) AS bg
      FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
    pb AS (SELECT doc_id, bg, count(*) AS c FROM bgl GROUP BY doc_id, bg),
    bs AS (SELECT doc_id,
             round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
               AS top_bigram_frac
           FROM pb GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(ls.n_lines, 0) AS n_lines,
           coalesce(ls.dup_line_frac, 0.0) AS dup_line_frac,
           coalesce(ls.dup_line_char_frac, 0.0) AS dup_line_char_frac,
           coalesce(bs.top_bigram_frac, 0.0) AS top_bigram_frac
    FROM documents d
    LEFT JOIN ls ON ls.doc_id = d.doc_id
    LEFT JOIN bs ON bs.doc_id = d.doc_id
"""

ORACLE_SQL["pii_scrub_docs"] = f"""
    WITH s AS (
      SELECT doc_id, text,
        regexp_replace(regexp_replace(text, '{_PII["email"]}', '<EMAIL>', 'g'),
                       '{_PII["ipv4"]}', '<IP>', 'g') AS after_ip
      FROM documents)
    SELECT doc_id,
      regexp_replace(after_ip, '{_PII["phone"]}', '<PHONE>', 'g') AS scrubbed,
      CAST(len(regexp_extract_all(text, '{_PII["email"]}')) AS BIGINT) AS n_email,
      CAST(len(regexp_extract_all(text, '{_PII["ipv4"]}')) AS BIGINT) AS n_ipv4,
      CAST(len(regexp_extract_all(after_ip, '{_PII["phone"]}')) AS BIGINT) AS n_phone
    FROM s
"""

ORACLE_SQL["token_chunks_docs"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    e AS (SELECT doc_id, toks,
            unnest(generate_series(0,
              CAST(greatest(ceil((len(toks) - 64) / 48.0), 0) AS INT))) AS i
          FROM t WHERE len(toks) > 0)
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           array_to_string(list_slice(toks, i*48 + 1, i*48 + 64), ' ') AS chunk_text,
           CAST(len(list_slice(toks, i*48 + 1, i*48 + 64)) AS BIGINT) AS n_tokens
    FROM e
"""

from verified_sources_spark.llm.text_prep import (  # noqa: E402
    HASH_SAMPLE_BUCKETS as _HSB,
    hash_sample_threshold as _hs_thr,
)

_SH5 = (
    "CASE WHEN len(toks) >= 5 THEN list_transform(generate_series(1, len(toks)-4), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]) "
    "ELSE [] END"
)

ORACLE_SQL["decontaminate_docs"] = f"""
    WITH sh5 AS (
      SELECT doc_id, source, {_SH5} AS sh
      FROM (SELECT doc_id, source, {_TOKS} AS toks FROM documents)),
    bench AS (SELECT DISTINCT unnest(list_distinct(sh)) AS s FROM sh5 WHERE source = 'src0'),
    corpus AS (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM sh5 WHERE source != 'src0'),
    hits AS (SELECT doc_id, count(*) AS n_overlap
             FROM corpus JOIN bench ON corpus.s = bench.s GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(CASE WHEN coalesce(h.n_overlap, 0) >= 3 THEN 1 ELSE 0 END AS BIGINT)
             AS contaminated
    FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    WHERE d.source != 'src0'
"""

ORACLE_SQL["hash_sample_docs"] = f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
        CAST(('0x' || substr(md5('|' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
             % {_HSB} AS BIGINT) AS b
      FROM documents)
    WHERE b < CASE source WHEN 'src1' THEN {_hs_thr(0.5)}
                          WHEN 'src2' THEN {_hs_thr(0.25)}
                          ELSE {_hs_thr(0.1)} END
"""

# CCNet-style corpus-level unit dedup over 8-token windows: count every
# window corpus-wide, scrub (or keep-first) duplicated ones, reassemble
# documents in position order.  DuckDB groups by the window string; the
# Spark side groups by xxhash64 of it — identical absent 64-bit
# collisions (none at oracle scale).
_LD_WINDOWS = f"""
  t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
  w AS (
    SELECT doc_id, pos, array_to_string(toks[pos*8+1 : pos*8+8], ' ') AS line
    FROM (SELECT doc_id, toks,
                 unnest(range(0, CAST(ceil(len(toks)/8.0) AS BIGINT))) AS pos
          FROM t)
  ),
  c AS (SELECT line, COUNT(*) AS cnt FROM w GROUP BY line)
"""

_LD_REBUILD = """
  tot AS (SELECT doc_id, COUNT(*) AS n_units FROM w GROUP BY doc_id),
  parts AS (SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS text_clean,
                   COUNT(*) AS n_kept
            FROM k GROUP BY doc_id)
  SELECT tot.doc_id,
         coalesce(parts.text_clean, '') AS text_clean,
         CAST(coalesce(parts.n_kept, 0) AS BIGINT) AS n_kept,
         CAST(tot.n_units - coalesce(parts.n_kept, 0) AS BIGINT) AS n_dropped
  FROM tot LEFT JOIN parts USING (doc_id)
"""

ORACLE_SQL["line_dedup_docs"] = f"""
    WITH {_LD_WINDOWS},
    k AS (SELECT w.doc_id, w.pos, w.line
          FROM w JOIN c USING (line) WHERE c.cnt < 2),
    {_LD_REBUILD}
"""

ORACLE_SQL["line_dedup_keep_first_docs"] = f"""
    WITH {_LD_WINDOWS},
    k AS (SELECT doc_id, pos, line FROM (
            SELECT w.doc_id, w.pos, w.line, c.cnt,
                   ROW_NUMBER() OVER (PARTITION BY w.line
                                      ORDER BY w.doc_id, w.pos) AS rn
            FROM w JOIN c USING (line))
          WHERE cnt < 2 OR rn = 1),
    {_LD_REBUILD}
"""

# corpus-level curation (llm/corpus.py)

ORACLE_SQL["domain_cap_docs"] = """
    SELECT doc_id, source, CAST(rn AS BIGINT) AS domain_rank FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents)
    WHERE rn <= 15
"""

ORACLE_SQL["unigram_rarity_docs"] = f"""
    WITH tk AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    freq AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY tok),
    tot AS (SELECT SUM(cnt) AS total FROM freq),
    sc AS (SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
             CAST(SUM(cnt) AS BIGINT) AS sum_cnt,
             CAST(MAX(total) AS BIGINT) AS total
           FROM tk JOIN freq USING (tok) CROSS JOIN tot GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(sc.n_tokens, 0) AS BIGINT) AS n_tokens,
           round(CAST(sc.n_rare AS DOUBLE) / sc.n_tokens, 6) AS rare_frac,
           round(CAST(sc.sum_cnt AS DOUBLE)
                 / (CAST(sc.n_tokens AS DOUBLE) * CAST(sc.total AS DOUBLE)), 12)
             AS mean_token_prob
    FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
"""

ORACLE_SQL["pack_manifest_docs"] = f"""
    WITH t AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents),
    c AS (SELECT doc_id, n_tokens,
            SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
    SELECT doc_id, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS start_offset,
           CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_first,
           CAST(CASE WHEN n_tokens > 0 THEN (cum - 1) // 256
                     ELSE (cum - n_tokens) // 256 END AS BIGINT) AS seq_last
    FROM c
"""

ORACLE_SQL["incremental_dedup_docs"] = f"""
    {_SIG_CTE}, {_BANDS_CTE},
    exh AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 10 < 7),
    inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 7),
    exact_hits AS (
      SELECT DISTINCT doc_id FROM inc WHERE md5(text) IN (SELECT h FROM exh)),
    exb AS (SELECT DISTINCT band_idx, band_hash FROM bands WHERE doc_id % 10 < 7),
    near_hits AS (
      SELECT DISTINCT b.doc_id FROM bands b
      JOIN exb USING (band_idx, band_hash) WHERE b.doc_id % 10 >= 7)
    SELECT i.doc_id,
      CAST(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_exact_dup,
      CAST(CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_near_dup,
      CAST(CASE WHEN e.doc_id IS NULL AND n.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
        AS keep
    FROM inc i
    LEFT JOIN exact_hits e ON e.doc_id = i.doc_id
    LEFT JOIN near_hits n ON n.doc_id = i.doc_id
"""

ORACLE_SQL["quality_filter_docs"] = f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    q AS (SELECT doc_id,
            CAST(len(toks) AS BIGINT) AS n_tokens,
            0.5 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
            + 0.3 * least((CAST(len(list_filter(toks, x -> list_contains({_SW['en']}, x))) AS INT)
                           / greatest(CAST(len(toks) AS INT), 1)) * 5.0, 1.0)
            + 0.2 * (1.0 - (CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS INT)
                            / greatest(length(text), 1))) AS q
          FROM t),
    lines AS (
      SELECT doc_id, line FROM (
        SELECT doc_id, trim(unnest(string_split(text, chr(10)))) AS line
        FROM documents)
      WHERE line != ''),
    pl AS (SELECT doc_id, line, count(*) AS cnt, length(line) AS len
           FROM lines GROUP BY doc_id, line),
    ls AS (SELECT doc_id,
             1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dup_line_frac
           FROM pl GROUP BY doc_id),
    bgl AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 2 THEN list_transform(
          generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1])
        ELSE [] END) AS bg
      FROM t),
    pb AS (SELECT doc_id, bg, count(*) AS c FROM bgl GROUP BY doc_id, bg),
    bs AS (SELECT doc_id,
             CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac
           FROM pb GROUP BY doc_id),
    sig AS (
      SELECT q.doc_id, q.n_tokens, q.q,
             coalesce(ls.dup_line_frac, 0.0) AS dlf,
             coalesce(bs.top_bigram_frac, 0.0) AS tbf
      FROM q LEFT JOIN ls ON ls.doc_id = q.doc_id
             LEFT JOIN bs ON bs.doc_id = q.doc_id)
    SELECT doc_id, n_tokens,
      CAST(CASE WHEN n_tokens < 5 OR n_tokens > 100000 THEN 1 ELSE 0 END AS BIGINT)
        AS flag_length,
      CAST(CASE WHEN round(q, 6) < 0.3 THEN 1 ELSE 0 END AS BIGINT) AS flag_quality,
      CAST(CASE WHEN dlf > 0.3 OR tbf > 0.2 THEN 1 ELSE 0 END AS BIGINT)
        AS flag_repetition,
      CAST(CASE WHEN (n_tokens >= 5 AND n_tokens <= 100000)
                 AND round(q, 6) >= 0.3
                 AND NOT (dlf > 0.3 OR tbf > 0.2)
            THEN 1 ELSE 0 END AS BIGINT) AS passes
    FROM sig
"""

ORACLE_SQL["mixture_sample_docs"] = f"""
    WITH t AS (SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
               FROM documents),
    d AS (SELECT source, SUM(n_tokens) AS dom_tokens FROM t GROUP BY source),
    r AS (SELECT source,
            CAST(round(least(1.0,
                   2000.0 * (CASE source WHEN 'src1' THEN 0.4
                                         WHEN 'src2' THEN 0.3
                                         WHEN 'src3' THEN 0.2
                                         WHEN 'src4' THEN 0.1
                                         ELSE 0.0 END)
                   / dom_tokens) * {_HSB}) AS BIGINT) AS thr
          FROM d)
    SELECT t.doc_id, t.source, t.n_tokens
    FROM t JOIN r USING (source)
    WHERE CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
               % {_HSB} AS BIGINT) < r.thr
"""

ORACLE_SQL["corpus_report_docs"] = f"""
    WITH qf AS ({ORACLE_SQL["quality_filter_docs"]}),
    b AS (SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tok,
                 md5(text) AS h
          FROM documents)
    SELECT b.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(b.n_tok) AS BIGINT) AS n_tokens,
           round((COUNT(*) - COUNT(DISTINCT b.h)) / COUNT(*), 6) AS exact_dup_rate,
           round(SUM(qf.passes) / COUNT(*), 6) AS quality_pass_rate
    FROM b JOIN qf ON qf.doc_id = b.doc_id
    GROUP BY b.source
"""

ORACLE_SQL["dedup_normalized_docs"] = r"""
    SELECT md5(norm) AS content_md5,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM (SELECT doc_id,
            trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                                '\s+', ' ', 'g')) AS norm
          FROM documents)
    GROUP BY md5(norm)
"""

ORACLE_SQL["curated_corpus_docs"] = rf"""
    WITH qf AS ({ORACLE_SQL["quality_filter_docs"]}),
    good AS (SELECT d.doc_id, d.source, d.n_chars, d.text
             FROM documents d JOIN qf ON qf.doc_id = d.doc_id AND qf.passes = 1),
    n AS (SELECT doc_id, source, n_chars,
            trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                                '\s+', ' ', 'g')) AS norm
          FROM good),
    canon AS (SELECT MIN(doc_id) AS doc_id FROM n GROUP BY md5(norm)),
    kept AS (SELECT n.doc_id, n.source, n.n_chars FROM n JOIN canon USING (doc_id)),
    r AS (SELECT doc_id, source,
            ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM kept)
    SELECT doc_id, source, CAST(rn AS BIGINT) AS domain_rank FROM r WHERE rn <= 10
"""

# duplicate_spans: 8-token sliding windows, md5'd; a span in >= 2 distinct
# docs marks its occurrences duplicated (llm/text_prep.duplicate_spans)
_SPAN8 = " || ' ' || ".join(f"toks[i+{k}]" for k in range(8))
ORACLE_SQL["duplicate_spans_docs"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    w AS (SELECT doc_id, md5({_SPAN8}) AS h FROM
          (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS i
           FROM t)),
    sd AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM w GROUP BY h),
    pd AS (SELECT w.doc_id, COUNT(*) AS n_windows,
                  SUM(CASE WHEN sd.ndocs >= 2 THEN 1 ELSE 0 END) AS n_dup
           FROM w JOIN sd USING (h) GROUP BY w.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(pd.n_windows, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(pd.n_dup, 0) AS BIGINT) AS n_dup_windows,
           round(CASE WHEN COALESCE(pd.n_windows, 0) > 0
                      THEN COALESCE(pd.n_dup, 0) / CAST(pd.n_windows AS DOUBLE)
                      ELSE 0.0 END, 6) AS dup_span_frac
    FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
"""

# leakage_safe_split: the near_dedup component chain (LSH bands →
# Jaccard-verified pairs → recursive-CTE connected components), then an
# md5-bucket split on the COMPONENT (llm/splits.leakage_safe_split;
# eval_frac 0.2 → cut 0x33 = round(256*0.2))
ORACLE_SQL["leakage_safe_split_docs"] = f"""
    {_SIG_CTE.replace("WITH sig", "WITH RECURSIVE sig", 1)}, {_BANDS_CTE},
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band_idx = b.band_idx
        AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
    sets AS (SELECT doc_id, list_distinct({_SHINGLES.replace('toks', 'toks2')}) AS sh
             FROM (SELECT doc_id, {_TOKS} AS toks2 FROM documents)),
    verified AS (
      SELECT id_a, id_b FROM pairs
      JOIN sets sa ON sa.doc_id = id_a
      JOIN sets sb ON sb.doc_id = id_b
      WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) >= 0.5),
    edges AS (SELECT id_a AS src, id_b AS dst FROM verified
              UNION SELECT id_b AS src, id_a AS dst FROM verified),
    reach AS (
      SELECT src AS node, src AS r FROM edges
      UNION
      SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON e.src = reach.r),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    labeled AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
    SELECT doc_id, CAST(component AS BIGINT) AS component,
           CASE WHEN substr(md5(CAST(component AS VARCHAR) || '|split'), 1, 2) < '33'
                THEN 'eval' ELSE 'train' END AS split
    FROM labeled
"""

# shuffled_shards: md5(id|salt) first 8 hex chars as the portable hash
# key; shard = key mod 8, pos = rank by (key, id) within the shard
# (llm/splits.shuffled_shards)
ORACLE_SQL["shuffled_shards_docs"] = """
    WITH k AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|shuffle'), 1, 8))
                  AS UBIGINT) AS key
      FROM documents)
    SELECT doc_id,
           CAST(key % 8 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY key % 8 ORDER BY key, doc_id) AS INT) AS pos
    FROM k
"""

# tf-idf top terms: the ln is computed once from exact integer inputs with
# the same expression shape Spark uses, rounded to 6 immediately; rank ties
# break on (rounded score desc, term asc) so both engines agree.
ORACLE_SQL["tfidf_top_terms_docs"] = f"""
    WITH tk AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tk GROUP BY doc_id, term),
    dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
             round(CAST(tf.tf AS DOUBLE)
                   * (ln(CAST(n.n_docs + 1 AS DOUBLE) / (dfq.df + 1)) + 1.0),
                   6) AS tfidf
           FROM tf JOIN dfq USING (term) CROSS JOIN n),
    rk AS (SELECT sc.*,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS term_rank
           FROM sc)
    SELECT doc_id, term, tf, df, tfidf, CAST(term_rank AS BIGINT) AS term_rank
    FROM rk WHERE term_rank <= 3
"""

# bigram LM: per-bigram -ln p rounded to 6 then summed through DECIMAL so
# aggregation order cannot perturb the hash; add-one smoothing over the
# full corpus unigram counts and vocabulary size.
ORACLE_SQL["bigram_lm_scores_docs"] = f"""
    WITH tk AS (SELECT doc_id, unnest(toks) AS term,
                       generate_subscripts(toks, 1) AS pos
                FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
    big AS (SELECT doc_id, w1, term AS w2 FROM (
              SELECT doc_id, term, pos,
                     lag(term) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
              FROM tk)
            WHERE w1 IS NOT NULL),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
           FROM big GROUP BY w1, w2),
    c1 AS (SELECT term AS w1, CAST(COUNT(*) AS BIGINT) AS c1
           FROM tk GROUP BY term),
    v AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM tk),
    lp AS (SELECT big.doc_id,
             CAST(-round(ln(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v)), 6)
                  AS DECIMAL(18,6)) AS nlp
           FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
    sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             round(CAST(SUM(nlp) AS DOUBLE) / COUNT(*), 6) AS avg_nll
           FROM lp GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           sc.avg_nll
    FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
"""

# ExactSubstr removal: same span construction as duplicate_spans_docs;
# covered positions = every (doc, pos) inside a cross-doc duplicated
# span occurrence; reassembly is an ordered string_agg of the survivors.
ORACLE_SQL["remove_duplicate_spans_docs"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term,
                   generate_subscripts(toks, 1) AS pos FROM t),
    w AS (SELECT doc_id, i, md5({_SPAN8}) AS h FROM
          (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS i
           FROM t)),
    dup AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    cov AS (SELECT DISTINCT w.doc_id, w.i + o.k AS pos
            FROM w JOIN dup USING (h)
            CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS k) o),
    kept AS (SELECT tok.doc_id, tok.pos, tok.term
             FROM tok LEFT JOIN cov
               ON cov.doc_id = tok.doc_id AND cov.pos = tok.pos
             WHERE cov.pos IS NULL),
    reb AS (SELECT doc_id, string_agg(term, ' ' ORDER BY pos) AS clean_text,
                   CAST(COUNT(*) AS BIGINT) AS n_kept
            FROM kept GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(reb.clean_text, '') AS clean_text,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(len(t.toks) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_tokens_removed
    FROM documents d
    JOIN t ON t.doc_id = d.doc_id
    LEFT JOIN reb ON reb.doc_id = d.doc_id
"""

# --- simhash (md5-60 portable base hash): fingerprints, banding, hamming,
# and the sorted-probe group sampling are all replayed exactly ---
_SH_SUMS = ", ".join(
    f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
    for i in range(60)
)
_SH_FP = " + ".join(
    f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(60)
)
_SH_SIG = (
    "sig AS (SELECT doc_id, CAST(" + _SH_FP + " AS BIGINT) AS fp FROM ("
    "SELECT doc_id, " + _SH_SUMS + " FROM ("
    "SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15))::UBIGINT AS BIGINT) AS h "
    f"FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)) "
    "GROUP BY doc_id))"
)

# pairs: 15 bands x 4 bits, hamming <= 12 via bit_count(xor)
ORACLE_SQL["simhash_near_pairs_docs"] = f"""
    WITH {_SH_SIG},
    banded AS (
      SELECT doc_id, fp, o.band_idx,
             (fp >> (o.band_idx * 4)) & 15 AS band_val
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 14)) AS band_idx) o)
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.fp, b.fp)) AS hamming
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= 12
"""

# groups: 4 bands x 15 bits, lag-window edge sampling (W=8), hamming <= 3,
# min-reach components via recursive CTE, singleton spine, sizes
_SH_LAGS = ", ".join(
    f"lag(doc_id, {k}) OVER w AS nid{k}, lag(fp, {k}) OVER w AS nsh{k}"
    for k in range(1, 9)
)
_SH_EDGE_PARTS = " UNION ALL ".join(
    f"SELECT least(doc_id, nid{k}) AS id_a, greatest(doc_id, nid{k}) AS id_b "
    f"FROM lagged WHERE nid{k} IS NOT NULL AND bit_count(xor(fp, nsh{k})) <= 3"
    for k in range(1, 9)
)
ORACLE_SQL["simhash_dedup_groups_docs"] = f"""
    WITH RECURSIVE {_SH_SIG},
    banded AS (
      SELECT doc_id, fp, o.band_idx,
             (fp >> (o.band_idx * 15)) & 32767 AS band_val
      FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band_idx) o),
    lagged AS (
      SELECT doc_id, fp, {_SH_LAGS}
      FROM banded
      WINDOW w AS (PARTITION BY band_idx, band_val ORDER BY fp, doc_id)),
    e0 AS (SELECT DISTINCT id_a, id_b FROM ({_SH_EDGE_PARTS})),
    edges AS (SELECT id_a AS src, id_b AS dst FROM e0
              UNION SELECT id_b AS src, id_a AS dst FROM e0),
    reach AS (
      SELECT src AS node, src AS r FROM edges
      UNION
      SELECT reach.node, e.dst AS r FROM reach JOIN edges e ON e.src = reach.r),
    comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    labeled AS (
      SELECT d.doc_id, CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS grp
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
    sizes AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS group_size
              FROM labeled GROUP BY grp)
    SELECT l.doc_id, l.grp AS "group", s.group_size
    FROM labeled l JOIN sizes s ON s.grp = l.grp
"""

# sign-LSH ANN: the hyperplanes are deterministic md5-derived constants
# (llm/similarity._hyperplane, seed 42) — imported from the engine and
# inlined as literal double lists, so DuckDB recomputes the exact same
# buckets, then reranks in-bucket with the same cosine expression the
# exact-top-k oracle uses.
from verified_sources_spark.llm.similarity import ANN_LSH_GRADED  # noqa: E402
from verified_sources_spark.llm.similarity import _hyperplane as _ann_plane  # noqa: E402


def _ann_bucket_expr(v: str) -> str:
    # parameters come from the SAME frozen dict the query wrapper uses
    n_planes, dim, seed = (
        ANN_LSH_GRADED["n_planes"], ANN_LSH_GRADED["dim"], ANN_LSH_GRADED["seed"]
    )
    bits = []
    for p in range(n_planes):
        lit = "[" + ", ".join(repr(x) for x in _ann_plane(dim, p, seed)) + "]"
        bits.append(
            f"CASE WHEN list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CAST({v}[i] AS DOUBLE) * ({lit})[i])) >= 0 "
            "THEN '1' ELSE '0' END"
        )
    return "concat(" + ", ".join(bits) + ")"


ORACLE_SQL["ann_lsh_topk_embeddings"] = f"""
    WITH c AS (SELECT vec_id, embedding,
                      {_ann_bucket_expr('embedding')} AS bucket
               FROM embeddings),
    q AS (SELECT * FROM c WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_sum(list_transform(generate_series(1, 64),
               i -> CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / ({_NORM.format(v='q.embedding')} * {_NORM.format(v='b.embedding')}) AS cos
      FROM q JOIN c b ON b.bucket = q.bucket AND b.vec_id <> q.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank,
             round(cos, 4) AS cosine
      FROM scored)
    SELECT query_id, neighbor_id, rank, cosine FROM ranked
    WHERE rank <= {ANN_LSH_GRADED["k"]}
"""

# cohort retention: first-seen-day cohorts, per (cohort, offset) distinct
# actives; exact ints + one rounded division
ORACLE_SQL["cohort_retention_events"] = """
    WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
    first AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id),
    sizes AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
              FROM first GROUP BY cohort_day),
    act AS (SELECT f.cohort_day,
                   CAST(ev.day - f.cohort_day AS INT) AS offset_days,
                   CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_active
            FROM ev JOIN first f USING (user_id)
            GROUP BY f.cohort_day, offset_days)
    SELECT a.cohort_day, a.offset_days, a.n_active, s.cohort_size,
           round(CAST(a.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
    FROM act a JOIN sizes s USING (cohort_day)
"""

# funnel: earliest view -> strictly-later click -> strictly-later purchase
ORACLE_SQL["funnel_conversion_events"] = """
    WITH u1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    u2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
           JOIN u1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY e.user_id),
    u3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
           JOIN u2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT) AS n_users,
           CAST((SELECT COUNT(*) FROM u1) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM u2) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM u3) AS BIGINT) AS n_full_funnel,
           round(CAST((SELECT COUNT(*) FROM u3) AS DOUBLE)
                 / (SELECT COUNT(*) FROM u1), 6) AS view_to_purchase
"""

# Variable-length ExactSubstr: duplicated 8-token window hits merged
# gaps-and-islands style (new island when the start gap exceeds the
# window, i.e. covered intervals are neither overlapping nor adjacent),
# islands below 50 tokens KEPT, the rest cut and the stream rebuilt.
ORACLE_SQL["max_dup_span_removal_docs"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS term,
                   generate_subscripts(toks, 1) AS pos FROM t),
    w AS (SELECT doc_id, i, md5({_SPAN8}) AS h FROM
          (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS i
           FROM t)),
    dup AS (SELECT h FROM w GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
    hits AS (SELECT DISTINCT w.doc_id, w.i FROM w JOIN dup USING (h)),
    lg AS (SELECT doc_id, i,
                  lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pi
           FROM hits),
    isl AS (SELECT doc_id, i,
                   SUM(CASE WHEN pi IS NULL OR i - pi > 8 THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY i) AS island
            FROM lg),
    spans AS (SELECT doc_id, MIN(i) AS s, MAX(i) + 7 AS e
              FROM isl GROUP BY doc_id, island
              HAVING MAX(i) + 7 - MIN(i) + 1 >= 50),
    nsp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
            FROM spans GROUP BY doc_id),
    cov AS (SELECT DISTINCT doc_id, pos FROM
            (SELECT doc_id, unnest(generate_series(s, e)) AS pos FROM spans)),
    kept AS (SELECT tok.doc_id, tok.pos, tok.term
             FROM tok LEFT JOIN cov
               ON cov.doc_id = tok.doc_id AND cov.pos = tok.pos
             WHERE cov.pos IS NULL),
    reb AS (SELECT doc_id, string_agg(term, ' ' ORDER BY pos) AS clean_text,
                   CAST(COUNT(*) AS BIGINT) AS n_kept
            FROM kept GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(reb.clean_text, '') AS clean_text,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(len(t.toks) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_tokens_removed,
           COALESCE(nsp.n_spans, 0) AS n_spans
    FROM documents d
    JOIN t ON t.doc_id = d.doc_id
    LEFT JOIN reb ON reb.doc_id = d.doc_id
    LEFT JOIN nsp ON nsp.doc_id = d.doc_id
"""

# Decontamination by removal: benchmark = doc_id % 50 == 0; corpus
# windows whose 8-token shingle hash appears in the benchmark's shingle
# set merge gaps-and-islands into maximal spans; spans >= 16 tokens cut.
ORACLE_SQL["decontaminate_spans_docs"] = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
               WHERE doc_id % 50 <> 0),
    bt AS (SELECT doc_id, {_TOKS} AS toks FROM documents
           WHERE doc_id % 50 = 0),
    tok AS (SELECT doc_id, unnest(toks) AS term,
                   generate_subscripts(toks, 1) AS pos FROM t),
    w AS (SELECT doc_id, i, md5({_SPAN8}) AS h FROM
          (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS i
           FROM t)),
    bw AS (SELECT DISTINCT md5({_SPAN8}) AS h FROM
           (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS i
            FROM bt)),
    hits AS (SELECT DISTINCT w.doc_id, w.i FROM w JOIN bw USING (h)),
    lg AS (SELECT doc_id, i,
                  lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS pi
           FROM hits),
    isl AS (SELECT doc_id, i,
                   SUM(CASE WHEN pi IS NULL OR i - pi > 8 THEN 1 ELSE 0 END)
                     OVER (PARTITION BY doc_id ORDER BY i) AS island
            FROM lg),
    spans AS (SELECT doc_id, MIN(i) AS s, MAX(i) + 7 AS e
              FROM isl GROUP BY doc_id, island
              HAVING MAX(i) + 7 - MIN(i) + 1 >= 16),
    nsp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
            FROM spans GROUP BY doc_id),
    cov AS (SELECT DISTINCT doc_id, pos FROM
            (SELECT doc_id, unnest(generate_series(s, e)) AS pos FROM spans)),
    kept AS (SELECT tok.doc_id, tok.pos, tok.term
             FROM tok LEFT JOIN cov
               ON cov.doc_id = tok.doc_id AND cov.pos = tok.pos
             WHERE cov.pos IS NULL),
    reb AS (SELECT doc_id, string_agg(term, ' ' ORDER BY pos) AS clean_text,
                   CAST(COUNT(*) AS BIGINT) AS n_kept
            FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           COALESCE(reb.clean_text, '') AS clean_text,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(len(t.toks) - COALESCE(reb.n_kept, 0) AS BIGINT) AS n_tokens_removed,
           COALESCE(nsp.n_spans, 0) AS n_spans
    FROM t
    LEFT JOIN reb ON reb.doc_id = t.doc_id
    LEFT JOIN nsp ON nsp.doc_id = t.doc_id
"""

ORACLE_SQL["dv_delete_orders"] = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderstatus <> 'F'
"""

ORACLE_SQL["dv_merge_orders"] = """
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
           o_totalprice
    FROM orders
"""


# Fixed-quantizer ANN variants: with lloyd_iters=0 the centroids are the
# 16 lowest-id vectors, so assignment (argmin squared-L2, lowest-cluster
# tie-break — matching similarity.argmin_cluster's numpy first-min) and
# everything downstream is plain SQL.  These are the value-hash witnesses
# for the iterative ivf_topk / semantic_dedup entries.
_SQ_L2 = (
    "list_sum(list_transform(generate_series(1, 64), "
    "i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)) "
    "* (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))))"
)
_FIXED_ASSIGN_CTES = f"""
    cent AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cluster,
             embedding AS cvec
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
    ranked_assign AS (
      SELECT e.vec_id, e.embedding, c.cluster,
             row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY {_SQ_L2} ASC, c.cluster ASC) AS rn
      FROM embeddings e CROSS JOIN cent c)
"""

ORACLE_SQL["ivf_topk_fixed_embeddings"] = f"""
    WITH {_FIXED_ASSIGN_CTES},
    buckets AS (
      SELECT vec_id AS neighbor_id, embedding AS nv, cluster
      FROM ranked_assign WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, embedding AS qv, cluster
      FROM ranked_assign WHERE vec_id < 10 AND rn <= 4),
    scored AS (
      SELECT DISTINCT p.query_id, b.neighbor_id,
             list_sum(list_transform(generate_series(1, 64),
                  i -> CAST(p.qv[i] AS DOUBLE) * CAST(b.nv[i] AS DOUBLE)))
             / ({_NORM.format(v='p.qv')} * {_NORM.format(v='b.nv')}) AS cos
      FROM buckets b JOIN probes p USING (cluster)
      WHERE b.neighbor_id <> p.query_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank,
             round(cos, 4) AS cosine
      FROM scored)
    SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 3
"""

ORACLE_SQL["semantic_dedup_fixed_embeddings"] = f"""
    WITH {_FIXED_ASSIGN_CTES},
    assigned AS (
      SELECT vec_id, embedding, cluster FROM ranked_assign WHERE rn = 1),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assigned a JOIN assigned b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(a.embedding[i] AS DOUBLE)
                      * CAST(b.embedding[i] AS DOUBLE)))
            / ({_NORM.format(v='a.embedding')}
               * {_NORM.format(v='b.embedding')}) >= 0.92),
    drops AS (SELECT DISTINCT id_b FROM pairs),
    absorbed AS (
      SELECT id_a, COUNT(*) AS n FROM pairs
      WHERE id_a NOT IN (SELECT id_b FROM drops) GROUP BY id_a)
    SELECT a.vec_id, a.cluster,
           CAST(COALESCE(ab.n, 0) AS BIGINT) AS n_dropped_dups
    FROM assigned a LEFT JOIN absorbed ab ON a.vec_id = ab.id_a
    WHERE a.vec_id NOT IN (SELECT id_b FROM drops)
"""

# Trained-quantizer ANN: similarity.train_kmeans_quantized runs Lloyd in
# EXACT integer arithmetic (scaled-int64 vectors, exact coordinate sums,
# half-away-from-zero rounded integer centroid averages), so the two
# unrolled iterations replay here in BIGINT SQL bit-for-bit — float64-avg
# training could never carry a hash (summation-order dependent).  The
# rounded division uses truncating `//` on magnitudes, matching Python's
# behavior for the same formula (DuckDB `//` truncates toward zero).
_KM_SX = ("list_transform(embedding, x -> CAST(floor("
          "CAST(x AS DOUBLE) * 10000000 + 0.5) AS BIGINT))")


def _km_dist(x: str, c: str) -> str:
    return (f"list_sum(list_transform(generate_series(1, 64), "
            f"i -> ({x}[i] - {c}[i]) * ({x}[i] - {c}[i])))")


def _km_lloyd_iter(prev_c: str, a: str, s: str, new_c: str) -> str:
    """One Lloyd iteration as CTEs: exact-int assignment against
    ``prev_c``, exact per-(cluster, dim) sums, rounded-integer averages;
    empty clusters keep their previous centroid."""
    return f"""
    {a} AS (
      SELECT vec_id, sx, cluster FROM (
        SELECT v.vec_id, v.sx, c.cluster,
               row_number() OVER (PARTITION BY v.vec_id
                    ORDER BY {_km_dist('v.sx', 'c.c')} ASC,
                             c.cluster ASC) AS rn
        FROM sv v CROSS JOIN {prev_c} c) WHERE rn = 1),
    {s} AS (
      SELECT cluster, i, SUM(sx[i]) AS sm, COUNT(*) AS n
      FROM {a} CROSS JOIN generate_series(1, 64) AS g(i)
      GROUP BY cluster, i),
    {new_c}_new AS (
      SELECT cluster,
             list(CASE WHEN sm >= 0 THEN (2*sm + n) // (2*n)
                       ELSE -((-2*sm + n) // (2*n)) END ORDER BY i) AS c
      FROM {s} GROUP BY cluster),
    {new_c} AS (
      SELECT p.cluster, COALESCE(u.c, p.c) AS c
      FROM {prev_c} p LEFT JOIN {new_c}_new u USING (cluster))"""


def _km_trained_ctes(k_expr: str) -> str:
    """sv → c0 (init: k lowest-id vectors) → two unrolled Lloyd
    iterations → af (final exact-int ranked assignment, rn=1 is the
    cluster, rn<=p the probe set)."""
    return f"""
    sv AS (SELECT vec_id, embedding, {_KM_SX} AS sx FROM embeddings),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                 AS cluster,
             sx AS c
      FROM (SELECT vec_id, sx FROM sv ORDER BY vec_id LIMIT {k_expr})),
    {_km_lloyd_iter('c0', 'a0', 's0', 'c1')},
    {_km_lloyd_iter('c1', 'a1', 's1', 'c2')},
    af AS (
      SELECT v.vec_id, v.embedding, c.cluster,
             row_number() OVER (PARTITION BY v.vec_id
                  ORDER BY {_km_dist('v.sx', 'c.c')} ASC,
                           c.cluster ASC) AS rn
      FROM sv v CROSS JOIN c2 c)"""


ORACLE_SQL["ivf_topk_embeddings"] = f"""
    WITH {_km_trained_ctes('16')},
    buckets AS (
      SELECT vec_id AS neighbor_id, embedding AS nv, cluster
      FROM af WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, embedding AS qv, cluster
      FROM af WHERE vec_id < 10 AND rn <= 4),
    scored AS (
      SELECT DISTINCT p.query_id, b.neighbor_id,
             list_sum(list_transform(generate_series(1, 64),
                  i -> CAST(p.qv[i] AS DOUBLE) * CAST(b.nv[i] AS DOUBLE)))
             / ({_NORM.format(v='p.qv')} * {_NORM.format(v='b.nv')}) AS cos
      FROM buckets b JOIN probes p USING (cluster)
      WHERE b.neighbor_id <> p.query_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank,
             round(cos, 4) AS cosine
      FROM scored)
    SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 3
"""

ORACLE_SQL["semantic_dedup_embeddings"] = f"""
    WITH {_km_trained_ctes(
        "GREATEST(16, (SELECT COUNT(*) FROM embeddings) // 512)")},
    assigned AS (
      SELECT vec_id, embedding, cluster FROM af WHERE rn = 1),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assigned a JOIN assigned b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(a.embedding[i] AS DOUBLE)
                      * CAST(b.embedding[i] AS DOUBLE)))
            / ({_NORM.format(v='a.embedding')}
               * {_NORM.format(v='b.embedding')}) >= 0.92),
    drops AS (SELECT DISTINCT id_b FROM pairs),
    absorbed AS (
      SELECT id_a, COUNT(*) AS n FROM pairs
      WHERE id_a NOT IN (SELECT id_b FROM drops) GROUP BY id_a)
    SELECT a.vec_id, a.cluster,
           CAST(COALESCE(ab.n, 0) AS BIGINT) AS n_dropped_dups
    FROM assigned a LEFT JOIN absorbed ab ON a.vec_id = ab.id_a
    WHERE a.vec_id NOT IN (SELECT id_b FROM drops)
"""

# LLM field extraction with the deterministic stub: the stub's heuristics
# (first alnum token lowercased; text length as a string; md5 content
# hash of the empty-coalesced text) are pure string functions.
ORACLE_SQL["extract_fields_docs"] = """
    SELECT doc_id,
           md5(coalesce(text, '')) AS content_hash,
           lower(nullif(regexp_extract(coalesce(text, ''),
                                       '[A-Za-z0-9]+'), '')) AS first_word,
           CAST(length(coalesce(text, '')) AS VARCHAR) AS length
    FROM documents
"""

# Multimodal image decode probe: the minting rule (dims from doc_id,
# every 17th payload truncated) is pure integer arithmetic; a value-hash
# match proves the stdlib PNG encode->decode loop ran per row.
ORACLE_SQL["image_decode_probe_docs"] = """
    SELECT doc_id,
           (doc_id % 17) <> 0 AS decoded_ok,
           CASE WHEN doc_id % 17 <> 0
                THEN CAST(16 + (doc_id % 4) * 8 AS INTEGER) END AS width,
           CASE WHEN doc_id % 17 <> 0
                THEN CAST(12 + (doc_id % 3) * 8 AS INTEGER) END AS height
    FROM documents
"""

# Multimodal audio decode probe: the minting rule (rate/duration from
# doc_id, every 19th payload truncated) replayed in SQL — a value-hash
# match proves the real WAV decode + fingerprint ran on exactly the
# uncorrupted set and echoed the true header metadata.
ORACLE_SQL["audio_decode_probe_docs"] = """
    SELECT doc_id,
           (doc_id % 19) <> 0 AS decoded_ok,
           CASE WHEN doc_id % 19 <> 0
                THEN CAST(8000 + (doc_id % 3) * 4000 AS INTEGER)
           END AS sample_rate,
           CASE WHEN doc_id % 19 <> 0
                THEN CAST(500 + (doc_id % 7) * 100 AS BIGINT)
           END AS n_frames
    FROM documents
"""

# Multimodal video probe: the minting rule (dims/frames from doc_id,
# every 23rd payload truncated, fps pinned at 10) replayed in SQL — a
# value-hash match proves the real AVI header probe ran on exactly the
# uncorrupted set and echoed the true header metadata.
ORACLE_SQL["video_decode_probe_docs"] = """
    SELECT doc_id,
           (doc_id % 23) <> 0 AS decoded_ok,
           CASE WHEN doc_id % 23 <> 0
                THEN CAST(16 + (doc_id % 4) * 8 AS INTEGER) END AS width,
           CASE WHEN doc_id % 23 <> 0
                THEN CAST(12 + (doc_id % 3) * 8 AS INTEGER) END AS height,
           CASE WHEN doc_id % 23 <> 0
                THEN CAST(3 + doc_id % 5 AS INTEGER) END AS n_frames,
           CASE WHEN doc_id % 23 <> 0
                THEN CAST((3 + doc_id % 5) * 100 AS BIGINT) END AS duration_ms
    FROM documents
"""

# Media-ingest ledger: the planting rule replayed in SQL — residues 7
# (perceptual near-dup) and 8 (exact byte dup) are rejected by the
# ledger; everything else (uniques + corrupt exact-only singletons)
# is accepted.  A value-hash match proves the hamming-verified band
# path and the sha path each caught exactly their planted class.
ORACLE_SQL["media_ingest_dedup_docs"] = """
    SELECT doc_id FROM documents WHERE doc_id % 10 NOT IN (7, 8)
"""

# Shot-boundary detection: the two-scene minting rule (n = 4 + id%4
# frames, cut at k = 1 + id%(n-1), every 29th truncated) replayed in
# SQL — shot 0 is [0, k) with keyframe (k-1)//2, shot 1 is [k, n) with
# keyframe (k+n-1)//2.  A value-hash match proves the hamming cut
# detector found exactly the planted boundary and nothing else.
ORACLE_SQL["video_shots_docs"] = """
    WITH params AS (
        SELECT doc_id,
               (doc_id % 29) = 0 AS corrupt,
               CAST(4 + doc_id % 4 AS INTEGER) AS n,
               CAST(1 + doc_id % (3 + doc_id % 4) AS INTEGER) AS k
        FROM documents
    )
    SELECT doc_id, FALSE AS decoded_ok,
           CAST(NULL AS INTEGER) AS shot_idx,
           CAST(NULL AS INTEGER) AS start_frame,
           CAST(NULL AS INTEGER) AS end_frame,
           CAST(NULL AS INTEGER) AS keyframe
    FROM params WHERE corrupt
    UNION ALL
    SELECT doc_id, TRUE, 0, 0, k, CAST((k - 1) // 2 AS INTEGER)
    FROM params WHERE NOT corrupt
    UNION ALL
    SELECT doc_id, TRUE, 1, k, n, CAST((k + n - 1) // 2 AS INTEGER)
    FROM params WHERE NOT corrupt
"""

# Energy-gate VAD: the two-burst layout ([sil x2][tone x p][sil x g]
# [tone x q][sil x1] in 25 ms windows, every 31st truncated) replayed
# in SQL — segment 0 spans windows [2, 2+p), segment 1
# [2+p+g, 2+p+g+q), each boundary x25 ms exact.
ORACLE_SQL["audio_segments_docs"] = """
    WITH params AS (
        SELECT doc_id,
               (doc_id % 31) = 0 AS corrupt,
               CAST(1 + doc_id % 3 AS BIGINT) AS p,
               CAST(1 + doc_id % 2 AS BIGINT) AS g,
               CAST(1 + doc_id % 4 AS BIGINT) AS q
        FROM documents
    )
    SELECT doc_id, FALSE AS decoded_ok,
           CAST(NULL AS INTEGER) AS seg_idx,
           CAST(NULL AS BIGINT) AS start_ms,
           CAST(NULL AS BIGINT) AS end_ms
    FROM params WHERE corrupt
    UNION ALL
    SELECT doc_id, TRUE, 0, 2 * 25, (2 + p) * 25
    FROM params WHERE NOT corrupt
    UNION ALL
    SELECT doc_id, TRUE, 1, (2 + p + g) * 25, (2 + p + g + q) * 25
    FROM params WHERE NOT corrupt
"""

# Baseline JPEG probe: the minting rule (dims from doc_id, every 13th
# truncated) replayed in SQL — a value-hash match proves the real
# Huffman+IDCT decode ran on exactly the uncorrupted set across all
# three layouts (4:4:4 / 4:2:0 / grayscale) and echoed the true dims.
ORACLE_SQL["jpeg_decode_probe_docs"] = """
    SELECT doc_id,
           (doc_id % 13) <> 0 AS decoded_ok,
           CASE WHEN doc_id % 13 <> 0
                THEN CAST(16 + (doc_id % 4) * 8 AS INTEGER) END AS width,
           CASE WHEN doc_id % 13 <> 0
                THEN CAST(12 + (doc_id % 3) * 8 AS INTEGER) END AS height
    FROM documents
"""

# Mixed-format image dispatch: the minting rule (format cycles by
# id%4 across PNG/JPEG/GIF/BMP, dims from doc_id, every 11th
# truncated) replayed in SQL — a hash match proves all four codecs
# decoded their share through the sniffing seam.
# MP3 frame-header probe: the CBR minting arithmetic replayed in SQL.
# MPEG-1 Layer III: 1152 samples/frame, so duration_ms = n * 1152000
# integer-div rate; ID3v2 (every 4th) and Xing (every 6th) layouts must
# not change the recovered facts — that's what the hash match proves.
ORACLE_SQL["mp3_decode_probe_docs"] = """
    WITH p AS (
        SELECT doc_id,
               (doc_id % 19) <> 0 AS ok,
               CASE doc_id % 3 WHEN 0 THEN 32000 WHEN 1 THEN 44100
                               ELSE 48000 END AS rate,
               10 + doc_id % 7 AS n
        FROM documents
    )
    SELECT doc_id,
           ok AS decoded_ok,
           CASE WHEN ok THEN CAST(rate AS INTEGER) END AS sample_rate,
           CASE WHEN ok THEN CAST(1 + doc_id % 2 AS INTEGER) END AS channels,
           CASE WHEN ok THEN CAST(n AS INTEGER) END AS n_frames,
           CASE WHEN ok THEN CAST((n * 1152000) // rate AS BIGINT)
           END AS duration_ms,
           CASE WHEN ok THEN CAST(
                CASE doc_id % 5 WHEN 0 THEN 64 WHEN 1 THEN 96 WHEN 2 THEN 128
                                WHEN 3 THEN 160 ELSE 320 END AS INTEGER)
           END AS bitrate_kbps
    FROM p
"""

# Cross-format metadata compliance: the planting arithmetic replayed —
# jpeg/png/mp3 by id % 3, tags only when id % 4 != 0, labels exact,
# scrub certified clean on every decodable asset.
ORACLE_SQL["metadata_scrub_docs"] = """
    WITH p AS (
        SELECT doc_id,
               (doc_id % 11) <> 0 AS ok,
               doc_id % 3 AS fmt,
               doc_id % 4 <> 0 AS tagged
        FROM documents
    )
    SELECT doc_id,
           ok AS decoded_ok,
           CASE WHEN ok THEN
                CASE fmt WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
                         ELSE 'mp3' END END AS container,
           CASE WHEN ok THEN tagged END AS has_metadata,
           CASE WHEN ok AND tagged THEN
                CASE fmt WHEN 0 THEN 'Cam' || (doc_id % 5)
                         WHEN 1 THEN 'user-' || (doc_id % 9)
                         ELSE 'track-' || (doc_id % 7) END
           END AS label,
           CASE WHEN ok AND fmt = 2 THEN CAST(
                CASE WHEN tagged AND doc_id % 5 = 0 THEN 1 ELSE 0 END
                AS INTEGER) END AS n_pictures,
           CASE WHEN ok AND fmt = 2 AND tagged AND doc_id % 5 = 0
                THEN TRUE END AS cover_ok,
           CASE WHEN ok THEN TRUE END AS clean_after_scrub
    FROM p
"""

# FLAC lossless roundtrip: the PCM minting arithmetic replayed in SQL —
# the hash match proves Rice residuals, fixed predictors and all four
# stereo decorrelation modes reconstructed every sample exactly.
ORACLE_SQL["flac_roundtrip_docs"] = """
    WITH p AS (
        SELECT doc_id,
               300 + (doc_id % 5) * 100 AS n,
               doc_id % 2 = 1 AS stereo,
               (doc_id % 13) <> 0 AS ok
        FROM documents
    ),
    s AS (
        SELECT doc_id, n, stereo, ok,
               unnest(generate_series(0, n - 1)) AS i
        FROM p
    ),
    v AS (
        SELECT doc_id, stereo, ok, i,
               ((doc_id * 31 + i * 7) % 2000) - 1000 AS l,
               ((doc_id * 17 + i * 11) % 2000) - 1000 AS r
        FROM s
    ),
    agg AS (
        SELECT doc_id,
               SUM(ABS(l) + CASE WHEN stereo THEN ABS(r) ELSE 0 END)
                   AS sum_abs,
               SUM(i * l + CASE WHEN stereo THEN i * r ELSE 0 END) AS dot
        FROM v GROUP BY doc_id
    )
    SELECT p.doc_id,
           p.ok AS decoded_ok,
           CASE WHEN p.ok THEN CAST(p.n AS INTEGER) END AS n_samples,
           CASE WHEN p.ok THEN CAST(CASE WHEN p.stereo THEN 2 ELSE 1 END
                                    AS INTEGER) END AS channels,
           CASE WHEN p.ok THEN CAST(agg.sum_abs AS BIGINT) END AS sum_abs,
           CASE WHEN p.ok THEN CAST(agg.dot AS BIGINT) END AS dot
    FROM p JOIN agg USING (doc_id)
"""

# Cross-modal caption coverage: the video clock (WebM probe) and the
# caption clock (VTT cues) must agree — cue counts, summed cue time and
# the coverage ratio all replayed from the minting arithmetic.
ORACLE_SQL["caption_coverage_docs"] = """
    WITH p AS (
        SELECT doc_id,
               (20 + doc_id % 30) * 100 AS dur,
               1 + doc_id % 3 AS k
        FROM documents
    )
    SELECT doc_id,
           CAST(dur AS BIGINT) AS duration_ms,
           CAST(k AS INTEGER) AS n_cues,
           CAST(k * (dur // 4) AS BIGINT) AS caption_ms,
           CAST(k * (dur // 4) AS DOUBLE) / dur AS coverage
    FROM p
"""

# Subtitle ingestion: cue slicing + timing arithmetic replayed in SQL,
# one row per cue via a 3-way union (cue count = 1 + id % 3).
ORACLE_SQL["subtitle_cues_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 23) <> 0 AS ok,
               1 + doc_id % 3 AS n,
               (doc_id % 7) * 100 AS base,
               CASE doc_id % 4 WHEN 0 THEN 'vtt' WHEN 1 THEN 'srt'
                               WHEN 2 THEN 'ass' ELSE 'ttml' END AS fmt,
               COALESCE(text, '') AS t
        FROM documents
    ), cues AS (
        SELECT doc_id, fmt, 1 AS k, base AS start_ms, t FROM p WHERE ok
        UNION ALL
        SELECT doc_id, fmt, 2, 2000 + base, t FROM p WHERE ok AND n >= 2
        UNION ALL
        SELECT doc_id, fmt, 3, 4000 + base, t FROM p WHERE ok AND n >= 3
    )
    SELECT doc_id, TRUE AS decoded_ok, fmt AS format,
           CAST(k AS INTEGER) AS idx,
           CAST(start_ms AS BIGINT) AS start_ms,
           CAST(start_ms + 1500 AS BIGINT) AS end_ms,
           -- ASS strips style overrides then trims; TTML flattens
           -- then trims; SRT/VTT keep the slice raw
           CASE WHEN fmt IN ('ass', 'ttml')
                THEN trim(SUBSTRING(t, 1 + 60 * (k - 1), 60))
                ELSE SUBSTRING(t, 1 + 60 * (k - 1), 60) END AS text
    FROM cues
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# PDF ingestion: one page per doc, the extracted text compared against
# the SOURCE text — a hash match proves object scan, ObjStm expansion,
# Flate(+predictor) decode and the content-stream walk recovered every
# document byte-for-byte across all four writer layouts.
ORACLE_SQL["pdf_extract_docs"] = """
    SELECT doc_id,
           (doc_id % 13) <> 0 AS decoded_ok,
           CASE WHEN doc_id % 13 <> 0 THEN CAST(1 AS INTEGER) END AS n_pages,
           CASE WHEN doc_id % 13 <> 0 THEN COALESCE(text, '') END AS text
    FROM documents
"""

# EXIF compliance inventory: the planting arithmetic replayed in SQL —
# exif on even ids, GPS on every 4th with EXACT DMS-decodable doubles
# (x.5 / x.25 degrees), both TIFF byte orders, scrub certified clean.
ORACLE_SQL["exif_inventory_docs"] = """
    SELECT doc_id,
           (doc_id % 11) <> 0 AS decoded_ok,
           CASE WHEN doc_id % 11 <> 0 THEN doc_id % 2 = 0 END AS has_exif,
           CASE WHEN doc_id % 11 <> 0 AND doc_id % 2 = 0
                THEN 'Cam' || (doc_id % 5) END AS make,
           CASE WHEN doc_id % 11 <> 0 AND doc_id % 2 = 0
                THEN 'M' || (doc_id % 7) END AS model,
           CASE WHEN doc_id % 11 <> 0 AND doc_id % 2 = 0
                THEN CAST(1 + doc_id % 8 AS INTEGER) END AS orientation,
           CASE WHEN doc_id % 11 <> 0 THEN doc_id % 4 = 0 END AS has_gps,
           CASE WHEN doc_id % 11 <> 0 AND doc_id % 4 = 0
                THEN CAST((doc_id % 90) + 0.5 AS DOUBLE) END AS latitude,
           CASE WHEN doc_id % 11 <> 0 AND doc_id % 4 = 0
                THEN CAST(-((doc_id % 180) + 0.25) AS DOUBLE) END AS longitude,
           CASE WHEN doc_id % 11 <> 0 THEN TRUE END AS clean_after_scrub
    FROM documents
"""

# Archive explosion (zip / tar / tar.gz by id % 3): the member
# inventory replayed in SQL — two rows per healthy doc (the text file
# byte-identical, the JSON sidecar reconstructed), one decoded_ok=false
# row per truncated archive.
ORACLE_SQL["archive_members_docs"] = """
    WITH p AS (
        SELECT doc_id,
               (doc_id % 13) <> 0 AS ok,
               CASE doc_id % 7 WHEN 0 THEN 'zip' WHEN 1 THEN 'tar'
                               WHEN 2 THEN 'tgz' WHEN 3 THEN 'txz'
                               WHEN 4 THEN 'tbz2' WHEN 5 THEN 'tzst'
                               ELSE '7z' END AS fmt,
               COALESCE(text, '') AS t
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, fmt AS archive_format,
           'doc_' || doc_id || '.txt' AS member_name,
           CAST(octet_length(encode(t)) AS BIGINT) AS n_bytes,
           t AS text
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, fmt,
           'meta/' || doc_id || '.json',
           CAST(8 + length(CAST(doc_id AS VARCHAR)) AS BIGINT),
           '{"id": ' || doc_id || '}'
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# Compressed line-shards: shard membership, line order and line text
# replayed in SQL — a hash match proves gzip/xz/bz2/zstd (incl. the
# streamed no-content-size zstd flavor)/lz4 inflated byte-identically and
# the bomb-gated stream walks preserved line boundaries.
ORACLE_SQL["shard_lines_docs"] = """
    WITH s AS (
        SELECT doc_id % 25 AS shard_id, doc_id,
               CAST(doc_id AS VARCHAR) || chr(9) ||
               replace(replace(COALESCE(text, ''), chr(13), ' '),
                       chr(10), ' ') AS line
        FROM documents
    ),
    r AS (
        SELECT shard_id, line,
               ROW_NUMBER() OVER (PARTITION BY shard_id
                                  ORDER BY doc_id) - 1 AS line_idx
        FROM s
    )
    SELECT shard_id, TRUE AS decoded_ok,
           CASE shard_id % 6 WHEN 0 THEN 'gzip' WHEN 1 THEN 'xz'
                             WHEN 2 THEN 'bz2' WHEN 5 THEN 'lz4'
                             ELSE 'zstd' END AS codec,
           CAST(line_idx AS INTEGER) AS line_idx,
           line AS text
    FROM r WHERE shard_id % 7 <> 0
    UNION ALL
    SELECT DISTINCT shard_id, FALSE,
           CASE shard_id % 6 WHEN 0 THEN 'gzip' WHEN 1 THEN 'xz'
                             WHEN 2 THEN 'bz2' WHEN 5 THEN 'lz4'
                             ELSE 'zstd' END,
           NULL, NULL
    FROM s WHERE shard_id % 7 = 0
"""

# HEIC/AVIF manifest probe: brand/codec/dims arithmetic replayed in
# SQL — a hash match proves the meta-box walk follows ipma property
# associations (the thumbnail trap) on exactly the untruncated set.
ORACLE_SQL["heif_probe_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 9) <> 0 AS ok,
               CASE doc_id % 3 WHEN 0 THEN 'heic' WHEN 1 THEN 'avif'
                               ELSE 'mif1' END AS brand,
               CASE doc_id % 3 WHEN 1 THEN 'av01' ELSE 'hvc1' END
                   AS codec,
               CAST(320 + (doc_id % 5) * 64 AS INTEGER) AS w,
               CAST(240 + (doc_id % 3) * 64 AS INTEGER) AS h,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END
                    AS INTEGER) AS n_items
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, brand, codec,
           w AS width, h AS height, n_items
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# SVG extraction: dims (attribute AND viewBox resolution paths) and
# the exact XML-escaped label text replayed in SQL.
ORACLE_SQL["svg_extract_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 13) <> 0 AS ok,
               CAST(160 + (doc_id % 4) * 40 AS INTEGER) AS w,
               CAST(90 + (doc_id % 3) * 30 AS INTEGER) AS h,
               CAST(1 + doc_id % 3 AS INTEGER) AS n
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, w AS width, h AS height,
           CAST(0 AS INTEGER) AS run_idx,
           'Figure ' || doc_id AS text
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, w, h, CAST(k + 1 AS INTEGER),
           'label<' || doc_id || '> & run ' || k || ' = '
               || ((doc_id * 7 + k) % 1000)
    FROM p, (SELECT UNNEST([0, 1, 2]) AS k) ks
    WHERE ok AND k < n
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# Feed extraction: both dialect walks, the content-over-description
# preference and the canonical HTML-to-text pass replayed in SQL.
ORACLE_SQL["feed_entries_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 11) <> 0 AS ok,
               CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END
                   AS kind,
               doc_id % 4 IN (0, 1) AS has_full,
               CAST(1 + doc_id % 3 AS INTEGER) AS n
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, kind,
           CAST(k AS INTEGER) AS entry_idx,
           'Doc ' || doc_id || ' post ' || k AS title,
           'http://example.com/' || doc_id || '/' || k AS link,
           '2026-01-0' || (1 + k) AS "date",
           'summary ' || doc_id || ' item ' || k || ' & tail'
               AS summary,
           CASE WHEN has_full
                THEN 'body ' || doc_id || ' item ' || k || ' rest'
                ELSE 'summary ' || doc_id || ' item ' || k || ' & tail'
           END AS text
    FROM p, (SELECT UNNEST([0, 1, 2]) AS k) ks
    WHERE ok AND k < n
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# Notebook extraction: both nbformat walks' cell types, multi-line
# sources, output counts and the never-inline-blobs image flag.
ORACLE_SQL["notebook_cells_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 10) <> 0 AS ok,
               CAST(2 + doc_id % 3 AS INTEGER) AS n,
               doc_id % 4 = 0 AS img
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok,
           CAST(k AS INTEGER) AS cell_idx,
           CASE WHEN k % 2 = 0 THEN 'markdown' ELSE 'code' END
               AS cell_type,
           'cell ' || k || ' of doc ' || doc_id || chr(10)
               || 'line two ' || k AS source,
           CAST(CASE WHEN k % 2 = 1
                     THEN (k % 3) + CASE WHEN img THEN 1 ELSE 0 END
                END AS INTEGER) AS n_outputs,
           CASE WHEN k % 2 = 1 THEN img END AS has_image_output
    FROM p, (SELECT UNNEST([0, 1, 2, 3]) AS k) ks
    WHERE ok AND k < n
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# Markdown extraction: stripped prose, heading/link/fence counts and
# the separated code replayed byte-for-byte in SQL.
ORACLE_SQL["markdown_extract_docs"] = """
    WITH p AS (
        SELECT doc_id,
               doc_id % 12 = 0 AS trunc,
               doc_id % 2 = 1 AS setext,
               doc_id % 3 = 0 AS extra,
               'Doc ' || doc_id || ' heading' || chr(10) || chr(10)
                   || 'Intro bold ' || doc_id || ' with link '
                   || doc_id || '.' AS head
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok,
           CASE WHEN trunc THEN head
                ELSE head || chr(10) || chr(10) || 'item one '
                     || doc_id
                     || CASE WHEN setext
                             THEN chr(10) || chr(10) || 'Second '
                                  || doc_id
                             ELSE '' END
           END AS text,
           CAST(CASE WHEN NOT trunc AND setext THEN 2 ELSE 1 END
                AS INTEGER) AS n_headings,
           CAST(1 AS INTEGER) AS n_links,
           CAST(CASE WHEN NOT trunc AND extra THEN 2 ELSE 1 END
                AS INTEGER) AS n_code_blocks,
           CASE WHEN NOT trunc AND extra THEN 'python,'
                ELSE 'python' END AS code_langs,
           CASE WHEN trunc THEN 'code line ' || doc_id
                ELSE 'code line ' || doc_id || chr(10) || 'x = '
                     || doc_id
                     || CASE WHEN extra
                             THEN chr(10) || chr(10) || 'plain '
                                  || doc_id
                             ELSE '' END
           END AS code
    FROM p
"""

# Crawl-to-corpus composition: WARC wire -> text extraction -> token
# count -> exact dedup, replayed as one SQL chain.
ORACLE_SQL["crawl_dedup_pipeline_docs"] = """
    WITH s AS (
        SELECT doc_id, doc_id // 3 AS g
        FROM documents
        WHERE doc_id % 13 <> 0
    )
    SELECT MIN(doc_id) AS canonical_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(6 + (g % 3) AS INTEGER) AS n_tokens,
           'shared page content of group ' || g
               || repeat(' filler', CAST(g % 3 AS INTEGER)) AS text
    FROM s GROUP BY g
"""

# Nested-archive explosion: three container layers' paths, sizes and
# recovered text replayed in SQL, incl. the corrupt-inner degradation.
ORACLE_SQL["nested_archive_docs"] = """
    WITH p AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'mid.zip!' ELSE '' END
                   AS pre,
               (doc_id % 13) = 0 AS corrupt,
               COALESCE(text, '') AS t
        FROM documents
    )
    SELECT doc_id,
           pre || 'inner.tgz!doc_' || doc_id || '.txt' AS member_path,
           CAST(octet_length(encode(t)) AS BIGINT) AS n_bytes,
           t AS text
    FROM p WHERE NOT corrupt
    UNION ALL
    SELECT doc_id, pre || 'inner.tgz', CAST(20 AS BIGINT), NULL
    FROM p WHERE corrupt
    UNION ALL
    SELECT doc_id, pre || 'side.txt',
           CAST(8 + length(CAST(doc_id AS VARCHAR)) AS BIGINT),
           'sidecar ' || doc_id
    FROM p
"""

# Multi-page fax TIFF: page count and per-page dims arithmetic
# replayed in SQL — a hash match proves every chained IFD walked and
# every page's CCITT strips (all four flavors) decoded.
ORACLE_SQL["tiff_pages_docs"] = """
    WITH p AS (
        SELECT doc_id,
               CAST(2 + doc_id % 3 AS INTEGER) AS n,
               (doc_id % 11) <> 0 AS ok
        FROM documents
    ),
    e AS (
        SELECT doc_id, n, UNNEST(range(0, CAST(n AS BIGINT))) AS pg
        FROM p WHERE ok
    )
    SELECT doc_id, TRUE AS decoded_ok, n AS n_pages,
           CAST(pg AS INTEGER) AS page_idx,
           CAST(16 + ((doc_id + pg) % 4) * 8 AS INTEGER) AS width,
           CAST(12 + ((doc_id + pg) % 3) * 8 AS INTEGER) AS height
    FROM e
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# WARC ingestion: the wire-layout arithmetic replayed in SQL, and the
# extracted text compared against the SOURCE text — a hash match proves
# the record walk + de-chunk + gunzip + entity-unescape recovered every
# document byte-for-byte on exactly the uncorrupted set.
ORACLE_SQL["warc_extract_docs"] = """
    WITH p AS (
        SELECT doc_id,
               (doc_id % 17) <> 0 AS ok,
               doc_id % 8 AS cs,
               (doc_id // 4) % 2 = 0 AS in_header,
               COALESCE(text, '') AS doc_text
        FROM documents
    )
    SELECT doc_id,
           ok AS decoded_ok,
           CASE WHEN ok THEN 'http://example.com/' || doc_id END AS uri,
           CASE WHEN ok THEN CAST(200 AS INTEGER) END AS status,
           CASE WHEN ok THEN
                CASE WHEN cs IN (0, 4) OR NOT in_header THEN 'text/html'
                     WHEN cs = 1 THEN 'text/html; charset=ISO-8859-1'
                     WHEN cs = 2 THEN 'text/html; charset=windows-1251'
                     WHEN cs = 3 THEN 'text/html; charset=Shift_JIS'
                     WHEN cs = 5 THEN 'text/html; charset=EUC-JP'
                     WHEN cs = 6 THEN 'text/html; charset=GB18030'
                     ELSE 'text/html; charset=Big5' END
           END AS content_type,
           CASE WHEN ok THEN
                CASE cs WHEN 1 THEN 'iso8859-1'
                        WHEN 2 THEN 'cp1251' WHEN 3 THEN 'shift_jis'
                        WHEN 5 THEN 'euc_jp' WHEN 6 THEN 'gb18030'
                        WHEN 7 THEN 'big5' ELSE 'utf-8' END
           END AS charset,
           CASE WHEN ok THEN TRUE END AS decode_clean,
           CASE WHEN ok THEN 'doc-' || doc_id END AS title,
           CASE WHEN ok THEN
                CASE cs WHEN 1 THEN 'café déjà vu doc ' || doc_id
                        WHEN 2 THEN 'привет мир doc ' || doc_id
                        WHEN 3 THEN 'こんにちは世界 doc ' || doc_id
                        WHEN 5 THEN '日本語テキスト doc ' || doc_id
                        WHEN 6 THEN '你好，世界 doc ' || doc_id
                        WHEN 7 THEN '繁體中文測試 doc ' || doc_id
                        ELSE doc_text END
           END AS text
    FROM p
"""

# Mixed-container audio dispatch (WAV / MP3 / FLAC by id % 3): the
# minting arithmetic replayed in SQL.  Each container's duration math
# differs (WAV: n/rate; MP3: frames*1152/rate; FLAC: total/rate) — the
# hash match proves each payload sniffed to the RIGHT parser.
ORACLE_SQL["audio_formats_probe_docs"] = """
    WITH p AS (
        SELECT doc_id,
               (doc_id % 19) <> 0 AS ok,
               doc_id % 5 AS fmt,
               8000 * (1 + doc_id % 3) AS aiff_rate,
               400 + (doc_id % 7) * 100 AS aiff_n,
               (doc_id // 4) % 2 = 0 AS is_opus,
               8000 * (1 + doc_id % 2) AS wav_rate,
               500 + (doc_id % 7) * 100 AS wav_n,
               CASE (doc_id // 3) % 3 WHEN 0 THEN 32000 WHEN 1 THEN 44100
                                      ELSE 48000 END AS mp3_rate,
               10 + doc_id % 7 AS mp3_nf,
               CASE (doc_id // 3) % 4 WHEN 0 THEN 8000 WHEN 1 THEN 22050
                                      WHEN 2 THEN 44100 ELSE 48000
               END AS flac_rate,
               1000 + (doc_id % 9) * 500 AS flac_total,
               CASE (doc_id // 3) % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                                      ELSE 48000 END AS opus_rate,
               (10 + doc_id % 7) * 960 AS opus_granule,
               CASE (doc_id // 3) % 2 WHEN 0 THEN 22050
                                      ELSE 44100 END AS vorbis_rate,
               1000 + (doc_id % 9) * 500 AS vorbis_granule
        FROM documents
    )
    SELECT doc_id,
           ok AS decoded_ok,
           CASE WHEN ok THEN
                CASE fmt WHEN 0 THEN 'wav' WHEN 1 THEN 'mp3'
                         WHEN 2 THEN 'flac' WHEN 4 THEN 'aiff'
                         ELSE 'ogg' END
           END AS container,
           CASE WHEN ok THEN CAST(
                CASE fmt WHEN 0 THEN wav_rate WHEN 1 THEN mp3_rate
                         WHEN 2 THEN flac_rate WHEN 4 THEN aiff_rate
                         ELSE CASE WHEN is_opus THEN opus_rate
                                   ELSE vorbis_rate END
                END AS INTEGER)
           END AS sample_rate,
           CASE WHEN ok THEN CAST(
                CASE fmt WHEN 0 THEN 1 WHEN 1 THEN 1 + doc_id % 2
                         WHEN 2 THEN 1 + (doc_id // 2) % 2
                         WHEN 4 THEN 1
                         ELSE 1 + doc_id % 2 END AS INTEGER)
           END AS channels,
           CASE WHEN ok THEN CAST(
                CASE fmt WHEN 0 THEN wav_n WHEN 1 THEN mp3_nf * 1152
                         WHEN 2 THEN flac_total WHEN 4 THEN aiff_n
                         ELSE CASE WHEN is_opus THEN opus_granule
                                   ELSE vorbis_granule END
                END AS BIGINT)
           END AS n_samples,
           CASE WHEN ok THEN CAST(
                CASE fmt WHEN 0 THEN (wav_n * 1000) // wav_rate
                         WHEN 1 THEN (mp3_nf * 1152000) // mp3_rate
                         WHEN 2 THEN (flac_total * 1000) // flac_rate
                         WHEN 4 THEN (aiff_n * 1000) // aiff_rate
                         ELSE CASE WHEN is_opus
                                   THEN (opus_granule * 1000) // 48000
                                   ELSE (vorbis_granule * 1000) // vorbis_rate
                              END
                END AS BIGINT)
           END AS duration_ms,
           CASE WHEN ok THEN
                CASE fmt WHEN 0 THEN 'PCM' WHEN 1 THEN 'MPEG-1-LIII'
                         WHEN 2 THEN 'FLAC'
                         WHEN 4 THEN CASE WHEN doc_id % 2 = 1
                                          THEN 'PCM_LE' ELSE 'PCM_BE' END
                         ELSE CASE WHEN is_opus THEN 'OPUS'
                                   ELSE 'VORBIS' END END
           END AS codec
    FROM p
"""

# Mixed-container video dispatch (AVI / animated GIF / MP4 / WebM by
# id % 4): the minting arithmetic replayed in SQL.  All four containers
# land on duration_ms = n_frames * 100 by construction (AVI fps=10, GIF
# delay=100ms, MP4 timescale 600 / delta 60, WebM DefaultDuration
# 100ms); codec IDs prove the sniff dispatched each payload to the
# right parser.
ORACLE_SQL["video_formats_probe_docs"] = """
    SELECT doc_id,
           (doc_id % 23) <> 0 AS decoded_ok,
           CASE WHEN doc_id % 23 <> 0
                THEN CAST(16 + (doc_id % 4) * 8 AS INTEGER) END AS width,
           CASE WHEN doc_id % 23 <> 0
                THEN CAST(12 + (doc_id % 3) * 8 AS INTEGER) END AS height,
           CASE WHEN doc_id % 23 <> 0
                THEN CAST(3 + doc_id % 5 AS INTEGER) END AS n_frames,
           CASE WHEN doc_id % 23 <> 0
                THEN CAST((3 + doc_id % 5) * 100 AS BIGINT) END AS duration_ms,
           CASE WHEN doc_id % 23 <> 0 THEN
                CASE doc_id % 4 WHEN 0 THEN 'BI_RGB'
                                WHEN 1 THEN 'GIF'
                                WHEN 2 THEN 'avc1'
                                ELSE 'V_VP9' END
           END AS codec
    FROM documents
"""

ORACLE_SQL["image_formats_probe_docs"] = """
    SELECT doc_id,
           (doc_id % 11) <> 0 AS decoded_ok,
           CASE WHEN doc_id % 11 <> 0
                THEN CAST(16 + (doc_id % 4) * 8 AS INTEGER) END AS width,
           CASE WHEN doc_id % 11 <> 0
                THEN CAST(12 + (doc_id % 3) * 8 AS INTEGER) END AS height
    FROM documents
"""

# Cross-modal matching: docs with id % 23 == 7 mint a video whose
# SECOND scene (shot 1) is doc id-1's image pattern — the only
# video-image hash matches by construction (probed: zero exact-dHash
# collisions over the first 5000 ids).
ORACLE_SQL["video_image_matches_docs"] = """
    SELECT doc_id AS video_id, doc_id - 1 AS image_id,
           CAST(1 AS INTEGER) AS shot_idx, CAST(0 AS INTEGER) AS hamming
    FROM documents
    WHERE doc_id % 23 = 7 AND doc_id > 0
"""

# Scene-level containment: docs with id % 17 == 4 carry doc id-1's
# first scene as their second — the only cross-clip scene shares by
# construction (probed: zero accidental exact-dHash collisions over
# the first 5000 ids).  Pairs require both endpoints decodable
# (neither truncated by the %37 rule).
ORACLE_SQL["video_scene_pairs_docs"] = """
    SELECT doc_id - 1 AS id_a, doc_id AS id_b, CAST(1 AS BIGINT) AS n_shared_scenes
    FROM documents
    WHERE doc_id % 17 = 4 AND doc_id > 0
      AND doc_id % 37 <> 0 AND (doc_id - 1) % 37 <> 0
"""

# Office-document extraction: TEN container formats' slicing
# arithmetic replayed in SQL — paragraph/slide formats (incl. legacy
# binary .doc via CFB + piece table) emit one row per 80-char unit,
# sheet formats (incl. BIFF8 .xls) render all units as one
# newline-joined TSV sheet, every 17th truncated file isolates.
ORACLE_SQL["office_extract_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 17) <> 0 AS ok,
               CASE doc_id % 10 WHEN 0 THEN 'docx' WHEN 1 THEN 'xlsx'
                                WHEN 2 THEN 'pptx' WHEN 3 THEN 'odt'
                                WHEN 4 THEN 'ods' WHEN 5 THEN 'rtf'
                                WHEN 6 THEN 'doc' WHEN 7 THEN 'xls'
                                WHEN 8 THEN 'ppt'
                                ELSE 'odp' END AS fmt,
               CAST(1 + doc_id % 3 AS INTEGER) AS n,
               ((doc_id % 10 = 0 AND (doc_id // 10) % 2 = 0)
                OR (doc_id % 10 = 3 AND (doc_id // 10) % 2 = 1))
                   AS structural,
               (doc_id % 10 = 2 AND (doc_id // 10) % 2 = 0) AS noted,
               COALESCE(text, '') AS t
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, fmt AS format,
           CAST(k AS INTEGER) AS unit_idx, n AS n_units,
           substr(t, 80 * k + 1, 80) AS text
    FROM p, (SELECT UNNEST([0, 1, 2]) AS k) ks
    WHERE ok AND k < n AND fmt NOT IN ('xlsx', 'ods', 'xls')
          AND NOT structural AND NOT noted
    UNION ALL
    -- pptx with speaker notes: slide 0, its notesSlide, then the
    -- remaining slides — n_units grows by one
    SELECT doc_id, TRUE, fmt, CAST(k AS INTEGER),
           CAST(n + 1 AS INTEGER),
           CASE WHEN k = 0 THEN substr(t, 1, 80)
                WHEN k = 1 THEN 'note for doc ' || doc_id
                ELSE substr(t, 80 * (k - 1) + 1, 80) END
    FROM p, (SELECT UNNEST([0, 1, 2, 3]) AS k) ks
    WHERE ok AND noted AND k < n + 1
    UNION ALL
    -- structural docx/odt: unit 0 the header, 1..n the paragraphs,
    -- then the table (row-major, cell-tab-joined), the footnote, the
    -- footer — the exact walk order the extractor documents
    SELECT doc_id, TRUE, fmt, CAST(k AS INTEGER),
           CAST(n + 4 AS INTEGER),
           CASE WHEN k = 0 THEN 'Header doc ' || doc_id
                WHEN k <= n THEN substr(t, 80 * (k - 1) + 1, 80)
                WHEN k = n + 1 THEN
                     'k' || doc_id || chr(9) || 'v1' || chr(10)
                     || 'total' || chr(9) || (doc_id % 100)
                WHEN k = n + 2 THEN 'note for doc ' || doc_id
                ELSE 'page 1' END
    FROM p, (SELECT UNNEST([0, 1, 2, 3, 4, 5, 6]) AS k) ks
    WHERE ok AND structural AND k < n + 4
    UNION ALL
    SELECT doc_id, TRUE, fmt, CAST(0 AS INTEGER), CAST(1 AS INTEGER),
           CASE n WHEN 1 THEN substr(t, 1, 80)
                  WHEN 2 THEN substr(t, 1, 80) || chr(10)
                              || substr(t, 81, 80)
                  ELSE substr(t, 1, 80) || chr(10) || substr(t, 81, 80)
                       || chr(10) || substr(t, 161, 80) END
    FROM p WHERE ok AND fmt IN ('xlsx', 'ods', 'xls')
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL FROM p WHERE NOT ok
"""

# Email extraction: headers, MIME part counts and transfer-decoded
# bodies replayed in SQL — ids cycle EML / Outlook-.msg (CFB MAPI
# streams) / mboxrd-of-two-sliced-messages, every 19th corrupt.
ORACLE_SQL["email_extract_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 19) <> 0 AS ok,
               'user' || (doc_id % 7) || '@example.com' AS frm,
               COALESCE(text, '') AS t
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, CAST(0 AS INTEGER) AS msg_idx,
           'Doc ' || doc_id AS subject, frm AS from_addr,
           CAST(2 AS INTEGER) AS n_parts,
           'plain' AS body_source,
           CASE (doc_id // 4) % 4
                WHEN 1 THEN '日本語メール doc ' || doc_id || chr(10)
                WHEN 2 THEN '日本語テキスト doc ' || doc_id || chr(10)
                WHEN 3 THEN '你好，世界 doc ' || doc_id || chr(10)
                ELSE t || chr(10) END AS text
    FROM p WHERE ok AND doc_id % 4 = 0
    UNION ALL
    SELECT doc_id, TRUE, CAST(0 AS INTEGER), 'Doc ' || doc_id, frm,
           CAST(1 + doc_id % 3 AS INTEGER), 'plain', t
    FROM p WHERE ok AND doc_id % 4 = 2
    UNION ALL
    SELECT doc_id, TRUE, CAST(j AS INTEGER),
           'Doc ' || doc_id || ' msg ' || j, frm, CAST(1 AS INTEGER),
           'plain', substr(t, 100 * j + 1, 100) || chr(10)
    FROM p, (SELECT UNNEST([0, 1]) AS j) js
    WHERE ok AND doc_id % 2 = 1
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# EPUB extraction: spine arithmetic + the whitespace-collapsed
# chapter text (title-space-body, ends trimmed — single-space corpus)
# replayed in SQL, every 23rd truncated.
ORACLE_SQL["ebook_extract_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 23) <> 0 AS ok,
               CAST(1 + doc_id % 3 AS INTEGER) AS c,
               COALESCE(text, '') AS t
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, 'Book ' || doc_id AS book_title,
           CAST(0 AS INTEGER) AS chapter_idx, c AS n_chapters,
           'Chapter 1' AS chapter_title,
           trim('Chapter 1 ' || trim(substr(t, 1, 160))) AS text
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, 'Book ' || doc_id, CAST(k AS INTEGER), c,
           'Chapter ' || (k + 1),
           'Chapter ' || (k + 1) || ' Contents of chapter ' || (k + 1)
               || ' in document ' || doc_id || '.'
    FROM p, (SELECT UNNEST([1, 2]) AS k) ks
    WHERE ok AND k < c
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# PDF filter matrix: the same text-recovery contract as
# pdf_extract_docs with the filter-chain name replayed from the
# cycling arithmetic.
ORACLE_SQL["pdf_filters_docs"] = """
    SELECT doc_id,
           (doc_id % 13) <> 0 AS decoded_ok,
           CASE WHEN doc_id % 13 <> 0 THEN
               CASE doc_id % 8 WHEN 0 THEN 'raw' WHEN 1 THEN 'flate'
                               WHEN 2 THEN 'lzw' WHEN 3 THEN 'ahx'
                               WHEN 4 THEN 'a85' WHEN 5 THEN 'rl'
                               WHEN 6 THEN 'flate+ahx'
                               ELSE 'lzw+a85' END
           END AS filters,
           CASE WHEN doc_id % 13 <> 0 THEN CAST(1 AS INTEGER) END AS n_pages,
           CASE WHEN doc_id % 13 <> 0 THEN COALESCE(text, '') END AS text
    FROM documents
"""

# Cross-modal PDF-figure dedup: every non-truncated doc's embedded
# image hash-matches its standalone twin by construction (same JPEG
# bytes on the DCT path, lossless PNG/Flate round trip on the raw
# path) — hamming 0, codec/dims replayed from the arithmetic.
ORACLE_SQL["pdf_image_matches_docs"] = """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'dct'
                WHEN doc_id % 5 <> 0 AND doc_id % 9 = 3 THEN 'jbig2'
                WHEN doc_id % 5 <> 0 AND doc_id % 3 = 0 THEN 'ccitt'
                ELSE 'raw' END AS codec,
           CAST(24 + (doc_id % 3) * 8 AS INTEGER) AS width,
           CAST(16 + (doc_id % 2) * 8 AS INTEGER) AS height,
           CAST(0 AS INTEGER) AS hamming
    FROM documents
    WHERE doc_id % 11 <> 0
"""

# Scanned-document composition chain: decrypt -> decode (JBIG2-MMR /
# CCITT-G4 / TIFF fax pages) -> page dHash -> cross-format dedup.  The
# shared page of group doc_id//3 collects one PDF copy per
# non-truncated member (% 13) and one TIFF page-0 copy per
# non-truncated member (% 11); each doc's unique TIFF page 1 is a
# singleton.  A hash match proves the whole chain composes: the dedup
# groups land exactly where the minting arithmetic says they must.
ORACLE_SQL["scan_dedup_pipeline_docs"] = """
    WITH members AS (
        SELECT doc_id, doc_id // 3 AS gid, 1 AS is_pdf
        FROM documents WHERE doc_id % 13 <> 0
        UNION ALL
        SELECT doc_id, doc_id // 3 AS gid, 0 AS is_pdf
        FROM documents WHERE doc_id % 11 <> 0
    ),
    shared AS (
        SELECT MIN(doc_id) AS canonical_id,
               CAST(SUM(is_pdf) AS BIGINT) AS n_pdf,
               CAST(SUM(1 - is_pdf) AS BIGINT) AS n_tiff,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM members GROUP BY gid
    )
    SELECT canonical_id, n_pdf, n_tiff, n_docs FROM shared
    UNION ALL
    SELECT doc_id AS canonical_id, CAST(0 AS BIGINT) AS n_pdf,
           CAST(1 AS BIGINT) AS n_tiff, CAST(1 AS BIGINT) AS n_docs
    FROM documents WHERE doc_id % 11 <> 0
"""

# Mail->document composition chain: MIME/MAPI attachment explosion ->
# magic-byte routing -> four extractors, refusals isolated per
# attachment.  Filenames, formats and the recovered 80-char text
# replayed from the minting arithmetic.
ORACLE_SQL["email_attachment_pipeline_docs"] = """
    WITH p AS (
        SELECT doc_id,
               (doc_id % 19) <> 0 AS ok,
               doc_id % 4 AS fmt,
               (doc_id % 7) = 3 AS noatt,
               (doc_id % 6) = 0 AS haspng,
               substr(COALESCE(text, ''), 1, 80) AS t80
        FROM documents
    )
    SELECT doc_id, FALSE AS decoded_ok, CAST(NULL AS INTEGER) AS att_idx,
           NULL AS filename, NULL AS att_format, NULL AS text
    FROM p WHERE NOT ok
    UNION ALL
    SELECT doc_id, TRUE, CAST(NULL AS INTEGER), NULL, NULL, NULL
    FROM p WHERE ok AND noatt
    UNION ALL
    SELECT doc_id, TRUE, CAST(0 AS INTEGER),
           'doc' || doc_id || CASE fmt WHEN 0 THEN '.pdf'
                                       WHEN 1 THEN '.docx'
                                       WHEN 2 THEN '.rtf'
                                       ELSE '.html' END,
           CASE fmt WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx'
                    WHEN 2 THEN 'rtf' ELSE 'html' END,
           -- the HTML extractor whitespace-trims (collapse=True);
           -- the other three preserve the slice byte-for-byte
           CASE WHEN fmt = 3 THEN trim(t80) ELSE t80 END
    FROM p WHERE ok AND NOT noatt
    UNION ALL
    SELECT doc_id, FALSE, CAST(1 AS INTEGER),
           'img' || doc_id || '.png', NULL, NULL
    FROM p WHERE ok AND NOT noatt AND haspng
    UNION ALL
    -- legacy-charset attachment (did%9=4 never coincides with the
    -- png's did%6=0, so its att_idx is always 1)
    SELECT doc_id, TRUE, CAST(1 AS INTEGER),
           'note' || doc_id
               || CASE WHEN doc_id % 4 IN (0, 1) THEN '.txt'
                       ELSE '.csv' END,
           CASE WHEN doc_id % 4 IN (0, 1) THEN 'text'
                ELSE 'delimited' END,
           CASE doc_id % 4
             WHEN 0 THEN 'Résumé ' || doc_id
                         || ': naïve café — mémo archivé.'
             WHEN 1 THEN '归档说明：这是一个中文文本文件，编号 '
                         || doc_id || '。'
             WHEN 2 THEN 'name' || chr(9) || 'city' || chr(10)
                         || 'René ' || doc_id || chr(9) || 'Zürich'
                         || chr(10) || 'François' || chr(9) || 'Genève'
             ELSE '城市' || chr(9) || '人口' || chr(10) || '北京'
                  || chr(9) || doc_id || chr(10) || '上海' || chr(9)
                  || (doc_id + 7) END
    FROM p WHERE ok AND NOT noatt AND (doc_id % 9) = 4
"""

# MHTML saved-web-page ingestion: root-part discovery + QP reversal +
# the shared HTML extractor; location/title/resource inventory and
# the text replayed from the minting arithmetic.
ORACLE_SQL["mhtml_extract_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 21) <> 0 AS ok, doc_id % 3 AS nres,
               COALESCE(text, '') AS t
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok,
           'http://example.com/' || doc_id AS location,
           'doc-' || doc_id AS title,
           CAST(nres AS INTEGER) AS n_resources,
           CASE nres WHEN 1 THEN 'image/png'
                     WHEN 2 THEN 'image/png;text/css' END
               AS resource_types,
           t AS text
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# LaTeX markup stripping: title/headings and the full stripped text
# replayed from the minting arithmetic — the caption survives its
# dropped figure, the equation and comments vanish, slices
# whitespace-trim exactly like the walker's paragraph canonicalizer.
ORACLE_SQL["latex_extract_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 23) <> 0 AS ok,
               CAST(1 + doc_id % 3 AS INTEGER) AS n,
               COALESCE(text, '') AS t
        FROM documents
    ),
    s AS (
        SELECT doc_id, ok, n,
               CASE WHEN trim(substr(t, 1, 80)) = ''
                    THEN 'filler ' || doc_id || ' 0'
                    ELSE trim(substr(t, 1, 80)) END AS s0,
               CASE WHEN trim(substr(t, 81, 80)) = ''
                    THEN 'filler ' || doc_id || ' 1'
                    ELSE trim(substr(t, 81, 80)) END AS s1,
               CASE WHEN trim(substr(t, 161, 80)) = ''
                    THEN 'filler ' || doc_id || ' 2'
                    ELSE trim(substr(t, 161, 80)) END AS s2
        FROM p
    )
    SELECT doc_id, TRUE AS decoded_ok,
           'Paper ' || doc_id AS title,
           n AS n_headings,
           CASE n WHEN 1 THEN 'Section 1'
                  WHEN 2 THEN 'Section 1;Section 2'
                  ELSE 'Section 1;Section 2;Section 3' END AS headings,
           'Paper ' || doc_id || chr(10) || 'Section 1' || chr(10)
           || s0 || chr(10) || 'A caption worth keeping'
           || CASE WHEN n >= 2 THEN chr(10) || 'Section 2' || chr(10)
                                    || s1 ELSE '' END
           || CASE WHEN n >= 3 THEN chr(10) || 'Section 3' || chr(10)
                                    || s2 ELSE '' END AS text
    FROM s WHERE ok
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL FROM p WHERE NOT ok
"""

# Blob-borne CSV/TSV explosion: dialect sniff + RFC 4180 quote/
# newline recovery; delimiter, header and every cell replayed from
# the minting arithmetic (the comma-delimited files embed the quoting
# trifecta in the note cell).
ORACLE_SQL["delimited_rows_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 29) <> 0 AS ok,
               CAST(2 + doc_id % 3 AS INTEGER) AS n,
               CASE doc_id % 4 WHEN 0 THEN ',' WHEN 1 THEN ';'
                               WHEN 2 THEN chr(9) ELSE '|' END AS delim,
               COALESCE(text, '') AS t
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, delim AS delimiter,
           CAST(k AS INTEGER) AS row_idx, n AS n_rows,
           CAST(3 AS INTEGER) AS n_cols,
           'id' || chr(9) || 'name' || chr(9) || 'note' AS header,
           (doc_id * 10 + k) || chr(9) || 'item ' || k || chr(9)
           || substr(t, 40 * k + 1, 40)
           || CASE WHEN doc_id % 4 = 0
                   THEN ',"x"' || chr(10) || 'end' ELSE '' END AS line
    FROM p, (SELECT UNNEST([0, 1, 2, 3]) AS k) ks
    WHERE ok AND k < n
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# Encoding-damage repair: every damage flavor (NFD + space/control
# zoo, 1x/2x latin-1 mojibake, cp1252 mojibake) inverts back to the
# clean construction; audit flags replayed per mode.
ORACLE_SQL["fix_text_docs"] = """
    WITH p AS (
        SELECT doc_id, doc_id % 4 AS mode,
               'café №' || doc_id || ' — ' || COALESCE(text, '')
                   AS base
        FROM documents
    )
    SELECT doc_id,
           CAST(CASE mode WHEN 0 THEN 0 WHEN 2 THEN 2 ELSE 1 END
                AS INTEGER) AS mojibake_rounds,
           mode = 0 AS canonicalized,
           CASE WHEN mode = 0 THEN base || ' trailer!'
                ELSE base END AS text
    FROM p
"""

# Archive->document composition: member explosion + routing + typed
# extraction; the typed copy's text equals the raw copy's text
# byte-for-byte, media refuses per member, truncation isolates whole.
ORACLE_SQL["document_drop_pipeline_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 13) <> 0 AS ok,
               doc_id % 3 AS fmt, (doc_id % 6) = 0 AS haspng,
               substr(COALESCE(text, ''), 1, 80) AS t80
        FROM documents
    )
    SELECT doc_id, FALSE AS decoded_ok, NULL AS member_name,
           NULL AS doc_format, NULL AS text
    FROM p WHERE NOT ok
    UNION ALL
    SELECT doc_id, TRUE,
           CASE fmt WHEN 0 THEN 'doc.pdf' WHEN 1 THEN 'doc.docx'
                    ELSE 'doc.rtf' END,
           CASE fmt WHEN 0 THEN 'pdf' WHEN 1 THEN 'docx'
                    ELSE 'rtf' END,
           t80
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, 'copy.txt', 'text', t80 FROM p WHERE ok
    UNION ALL
    -- legacy-charset member: cp1252/GB18030 .txt and .csv decode
    -- through the bare-charset probe (delimited text reassembles as
    -- header + tab-joined rows)
    SELECT doc_id, TRUE,
           CASE WHEN doc_id % 4 IN (0, 1) THEN 'legacy.txt'
                ELSE 'legacy.csv' END,
           CASE WHEN doc_id % 4 IN (0, 1) THEN 'text'
                ELSE 'delimited' END,
           CASE doc_id % 4
             WHEN 0 THEN 'Résumé ' || doc_id
                         || ': naïve café — mémo archivé.'
             WHEN 1 THEN '归档说明：这是一个中文文本文件，编号 '
                         || doc_id || '。'
             WHEN 2 THEN 'name' || chr(9) || 'city' || chr(10)
                         || 'René ' || doc_id || chr(9) || 'Zürich'
                         || chr(10) || 'François' || chr(9) || 'Genève'
             ELSE '城市' || chr(9) || '人口' || chr(10) || '北京'
                  || chr(9) || doc_id || chr(10) || '上海' || chr(9)
                  || (doc_id + 7) END
    FROM p WHERE ok
    UNION ALL
    -- koi8-r vs cp1251: the same Russian sentence in alternating
    -- Cyrillic codecs; the frequency prior must pick right both ways
    SELECT doc_id, TRUE, 'cyr.txt', 'text',
           'Архивная записка ' || doc_id
           || ': проверка кодировки текста.'
    FROM p WHERE ok AND doc_id % 10 = 5
    UNION ALL
    SELECT doc_id, FALSE, 'img.png', NULL, NULL
    FROM p WHERE ok AND haspng
"""

# MediaWiki dump + wikitext strip: titles, redirect flags, heading
# counts and the stripped prose replayed from the minting arithmetic
# (nested templates, refs, comments and piped links all vanish or
# resolve exactly).
ORACLE_SQL["wiki_pages_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 27) <> 0 AS ok,
               substr(COALESCE(text, ''), 1, 80) AS t80
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, CAST(1 AS BIGINT) AS page_id,
           'Page ' || doc_id AS title, CAST(0 AS INTEGER) AS ns,
           FALSE AS redirect, CAST(1 AS INTEGER) AS n_headings,
           'Page ' || doc_id || ' begins.' || chr(10) || 'Body'
           || chr(10) || rtrim('X' || t80) || ' and ext end.' AS text
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, CAST(2 AS BIGINT), 'R' || doc_id,
           CAST(0 AS INTEGER), TRUE, CAST(0 AS INTEGER),
           'REDIRECT Page ' || doc_id
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# JATS article explosion: unit kinds/order/text replayed — citation
# apparatus and formulas drop, emphasis text survives, captions are
# prose, the 60-char slices trim exactly like the walker's
# whitespace collapse.
ORACLE_SQL["jats_units_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 25) <> 0 AS ok,
               CAST(1 + doc_id % 2 AS INTEGER) AS nsec,
               COALESCE(text, '') AS t
        FROM documents
    ),
    s AS (
        SELECT doc_id, ok, nsec,
               CASE WHEN trim(substr(t, 1, 60)) = ''
                    THEN 'abs ' || doc_id
                    ELSE trim(substr(t, 1, 60)) END AS abs0,
               CASE WHEN trim(substr(t, 61, 60)) = ''
                    THEN 'filler ' || doc_id || ' 0'
                    ELSE trim(substr(t, 61, 60)) END AS s0,
               CASE WHEN trim(substr(t, 121, 60)) = ''
                    THEN 'filler ' || doc_id || ' 1'
                    ELSE trim(substr(t, 121, 60)) END AS s1
        FROM p
    ),
    u AS (
        SELECT doc_id, 0 AS unit_idx, 'title' AS kind,
               'Article ' || doc_id AS text, nsec FROM s WHERE ok
        UNION ALL
        SELECT doc_id, 1, 'abstract', abs0, nsec FROM s WHERE ok
        UNION ALL
        SELECT doc_id, 2, 'sec-title', 'Section 1', nsec
        FROM s WHERE ok
        UNION ALL
        SELECT doc_id, 3, 'p', s0 || ' as shown.', nsec FROM s WHERE ok
        UNION ALL
        SELECT doc_id, 4, 'caption', 'A figure caption.', nsec
        FROM s WHERE ok
        UNION ALL
        SELECT doc_id, 5, 'sec-title', 'Section 2', nsec
        FROM s WHERE ok AND nsec = 2
        UNION ALL
        SELECT doc_id, 6, 'p', s1, nsec FROM s WHERE ok AND nsec = 2
    )
    SELECT doc_id, TRUE AS decoded_ok,
           CAST(unit_idx AS INTEGER) AS unit_idx, kind,
           CAST(5 + (nsec - 1) * 2 AS INTEGER) AS n_units, text
    FROM u
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL FROM p WHERE NOT ok
"""

# Stack Exchange dump: attribute un-escape + HTML extraction; ids,
# Q/A wiring, scores, tag parsing and every body's prose replayed.
ORACLE_SQL["se_posts_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 31) <> 0 AS ok,
               CAST(1 + doc_id % 2 AS INTEGER) AS na,
               COALESCE(text, '') AS t
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, CAST(1 AS BIGINT) AS post_id,
           CAST(1 AS INTEGER) AS post_type,
           CAST(NULL AS BIGINT) AS parent_id,
           'Q ' || doc_id || '?' AS title,
           CAST(doc_id % 11 AS INTEGER) AS score,
           'tag' || (doc_id % 5) || ';engine' AS tags,
           trim(substr(t, 1, 70)) AS text
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, CAST(k + 2 AS BIGINT), CAST(2 AS INTEGER),
           CAST(1 AS BIGINT), NULL,
           CAST((doc_id + k) % 7 AS INTEGER), NULL,
           trim(substr(t, 70 * (k + 1) + 1, 70))
    FROM p, (SELECT UNNEST([0, 1]) AS k) ks
    WHERE ok AND k < na
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# Chat-dialect normalization: roles, turn order, alternation flags
# and every turn's text replayed across OpenAI/ShareGPT/pair records.
ORACLE_SQL["chat_turns_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 33) <> 0 AS ok, doc_id % 3 AS mode,
               (doc_id % 7) = 2 AS violation,
               substr(COALESCE(text, ''), 1, 60) AS u1,
               substr(COALESCE(text, ''), 61, 60) AS a1,
               substr(COALESCE(text, ''), 121, 60) AS u2
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, CAST(i AS INTEGER) AS turn_idx,
           CAST(3 AS INTEGER) AS n_turns,
           CASE i WHEN 0 THEN 'system' WHEN 1 THEN 'user'
                  ELSE 'assistant' END AS role,
           TRUE AS alternation_ok,
           CASE i WHEN 0 THEN 'be helpful' WHEN 1 THEN u1
                  ELSE a1 END AS text
    FROM p, (SELECT UNNEST([0, 1, 2]) AS i) js
    WHERE ok AND mode = 0 AND (doc_id % 5) <> 1
    UNION ALL
    -- mid-dialog system injection: 4 turns, pairing gate flags FALSE
    SELECT doc_id, TRUE, CAST(i AS INTEGER), CAST(4 AS INTEGER),
           CASE i WHEN 0 THEN 'system' WHEN 1 THEN 'user'
                  WHEN 2 THEN 'system' ELSE 'assistant' END,
           FALSE,
           CASE i WHEN 0 THEN 'be helpful' WHEN 1 THEN u1
                  WHEN 2 THEN 'be extra helpful' ELSE a1 END
    FROM p, (SELECT UNNEST([0, 1, 2, 3]) AS i) js
    WHERE ok AND mode = 0 AND (doc_id % 5) = 1
    UNION ALL
    SELECT doc_id, TRUE, CAST(i AS INTEGER), CAST(3 AS INTEGER),
           CASE i WHEN 1 THEN 'assistant' ELSE 'user' END, TRUE,
           CASE i WHEN 0 THEN u1 WHEN 1 THEN a1 ELSE u2 END
    FROM p, (SELECT UNNEST([0, 1, 2]) AS i) js
    WHERE ok AND mode = 1 AND NOT violation
    UNION ALL
    SELECT doc_id, TRUE, CAST(i AS INTEGER), CAST(2 AS INTEGER),
           CASE i WHEN 0 THEN 'assistant' ELSE 'user' END, FALSE,
           CASE i WHEN 0 THEN a1 ELSE u1 END
    FROM p, (SELECT UNNEST([0, 1]) AS i) js
    WHERE ok AND mode = 1 AND violation
    UNION ALL
    SELECT doc_id, TRUE, CAST(i AS INTEGER), CAST(2 AS INTEGER),
           CASE i WHEN 0 THEN 'user' ELSE 'assistant' END, TRUE,
           CASE i WHEN 0 THEN u1 ELSE a1 END
    FROM p, (SELECT UNNEST([0, 1]) AS i) js
    WHERE ok AND mode = 2
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# Source-code signals: fixed-width templates make every numeric signal
# a per-mode constant; language detection, ratios and the license/
# generated detectors replay as literals.
ORACLE_SQL["code_signals_docs"] = """
    SELECT doc_id,
           CASE doc_id % 4 WHEN 0 THEN 'python'
                           WHEN 1 THEN 'javascript'
                           WHEN 2 THEN 'c' END AS language,
           CAST(CASE doc_id % 4 WHEN 0 THEN 9 WHEN 1 THEN 4
                                WHEN 2 THEN 6 ELSE 3 END
                AS INTEGER) AS n_lines,
           CAST(CASE doc_id % 4 WHEN 0 THEN 32 WHEN 1 THEN 46
                                WHEN 2 THEN 34 ELSE 34 END
                AS INTEGER) AS max_line_len,
           CAST(CASE doc_id % 4 WHEN 0 THEN 18.44 WHEN 1 THEN 30.25
                                WHEN 2 THEN 17.83 ELSE 26.0 END
                AS DOUBLE) AS mean_line_len,
           CAST(CASE doc_id % 4 WHEN 0 THEN 0.3333 WHEN 1 THEN 0.25
                                WHEN 2 THEN 0.3333 ELSE 0.0 END
                AS DOUBLE) AS comment_ratio,
           CAST(CASE doc_id % 4 WHEN 0 THEN 0.6971 WHEN 1 THEN 0.64
                                WHEN 2 THEN 0.6018 ELSE 0.8272 END
                AS DOUBLE) AS alnum_fraction,
           (doc_id % 4) IN (0, 2) AS has_license,
           (doc_id % 4) = 1 AS is_generated
    FROM documents
"""

# Cross-source dedup capstone: the same text through WARC / mail
# attachment / zip member groups into one dedup row; copy counts and
# surviving source sets replay from the corruption arithmetic.
ORACLE_SQL["cross_source_dedup_docs"] = """
    SELECT doc_id,
           CAST(3 - CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END
                  - CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END
                AS BIGINT) AS n_copies,
           CASE WHEN doc_id % 13 = 0 AND doc_id % 11 = 0 THEN 'mail'
                WHEN doc_id % 13 = 0 THEN 'archive;mail'
                WHEN doc_id % 11 = 0 THEN 'mail;web'
                ELSE 'archive;mail;web' END AS sources
    FROM documents
"""

# Product-quantization ANN: pinned per-subspace codebooks, exact-int
# encode (argmin, lowest-code tie-break) and ADC distances replayed in
# BIGINT SQL bit-for-bit.
ORACLE_SQL["pq_topk_embeddings"] = f"""
    WITH sv AS (
      SELECT vec_id, {_KM_SX} AS v FROM embeddings),
    subs AS (SELECT UNNEST([0, 1, 2, 3]) AS s),
    books AS (
      SELECT subs.s,
             CAST(row_number() OVER (PARTITION BY subs.s
                  ORDER BY b.vec_id) - 1 AS INT) AS code,
             list_transform(generate_series(1, 16),
                            i -> b.v[16 * subs.s + i]) AS bv
      FROM (SELECT vec_id, v FROM sv ORDER BY vec_id LIMIT 16) b
      CROSS JOIN subs),
    enc AS (
      SELECT e.vec_id, b.s, b.code,
             row_number() OVER (PARTITION BY e.vec_id, b.s
                  ORDER BY list_sum(list_transform(
                      generate_series(1, 16),
                      i -> (e.v[16 * b.s + i] - b.bv[i])
                           * (e.v[16 * b.s + i] - b.bv[i]))) ASC,
                  b.code ASC) AS rn
      FROM sv e CROSS JOIN books b),
    codes AS (SELECT vec_id, s, code FROM enc WHERE rn = 1),
    dtab AS (
      SELECT q.vec_id AS query_id, b.s, b.code,
             list_sum(list_transform(generate_series(1, 16),
                  i -> (q.v[16 * b.s + i] - b.bv[i])
                       * (q.v[16 * b.s + i] - b.bv[i]))) AS dcell
      FROM sv q CROSS JOIN books b WHERE q.vec_id < 10),
    scored AS (
      SELECT d.query_id, c.vec_id AS neighbor_id,
             SUM(d.dcell) AS adist
      FROM codes c JOIN dtab d ON c.s = d.s AND c.code = d.code
      WHERE c.vec_id <> d.query_id
      GROUP BY d.query_id, c.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY adist ASC, neighbor_id ASC) AS INT) AS rank,
             CAST(adist AS BIGINT) AS adist
      FROM scored)
    SELECT query_id, neighbor_id, rank, adist FROM ranked
    WHERE rank <= 3
"""

# IVF-PQ: pinned coarse cells + residual PQ + per-probed-cell ADC,
# all in BIGINT — coarse assignment, residual encode, probe order and
# approximate distances replay bit-for-bit.
ORACLE_SQL["ivfpq_topk_embeddings"] = f"""
    WITH sv AS (
      SELECT vec_id, {_KM_SX} AS v FROM embeddings),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                 AS cell, v AS cv
      FROM (SELECT vec_id, v FROM sv ORDER BY vec_id LIMIT 16)),
    asg AS (
      SELECT vec_id, v, cell, cv FROM (
        SELECT e.vec_id, e.v, c.cell, c.cv,
               row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY list_sum(list_transform(
                        generate_series(1, 64),
                        i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))
                        ASC, c.cell ASC) AS rn
        FROM sv e CROSS JOIN cents c) WHERE rn = 1),
    res AS (
      SELECT vec_id, cell,
             list_transform(generate_series(1, 64),
                            i -> v[i] - cv[i]) AS r
      FROM asg),
    subs AS (SELECT UNNEST([0, 1, 2, 3]) AS s),
    books AS (
      SELECT subs.s,
             CAST(row_number() OVER (PARTITION BY subs.s
                  ORDER BY b.vec_id) - 1 AS INT) AS code,
             list_transform(generate_series(1, 16),
                            i -> b.r[16 * subs.s + i]) AS bv
      FROM (SELECT vec_id, r FROM res ORDER BY vec_id LIMIT 16) b
      CROSS JOIN subs),
    enc AS (
      SELECT vec_id, s, code FROM (
        SELECT e.vec_id, b.s, b.code,
               row_number() OVER (PARTITION BY e.vec_id, b.s
                    ORDER BY list_sum(list_transform(
                        generate_series(1, 16),
                        i -> (e.r[16 * b.s + i] - b.bv[i])
                             * (e.r[16 * b.s + i] - b.bv[i]))) ASC,
                    b.code ASC) AS rn
        FROM res e CROSS JOIN books b) WHERE rn = 1),
    probes AS (
      SELECT query_id, cell, qv FROM (
        SELECT q.vec_id AS query_id, c.cell, q.v AS qv,
               row_number() OVER (PARTITION BY q.vec_id
                    ORDER BY list_sum(list_transform(
                        generate_series(1, 64),
                        i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i])))
                        ASC, c.cell ASC) AS rn
        FROM sv q CROSS JOIN cents c WHERE q.vec_id < 10)
      WHERE rn <= 4),
    dtab AS (
      SELECT p.query_id, p.cell, b.s, b.code,
             list_sum(list_transform(generate_series(1, 16),
                  i -> (p.qv[16 * b.s + i] - c.cv[16 * b.s + i]
                        - b.bv[i])
                       * (p.qv[16 * b.s + i] - c.cv[16 * b.s + i]
                          - b.bv[i]))) AS dcell
      FROM probes p
      JOIN cents c ON c.cell = p.cell
      CROSS JOIN books b),
    scored AS (
      SELECT d.query_id, a.vec_id AS neighbor_id,
             SUM(d.dcell) AS adist
      FROM res a
      JOIN enc e ON e.vec_id = a.vec_id
      JOIN dtab d ON d.cell = a.cell AND d.s = e.s
                 AND d.code = e.code
      WHERE a.vec_id <> d.query_id
      GROUP BY d.query_id, a.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY adist ASC, neighbor_id ASC) AS INT) AS rank,
             CAST(adist AS BIGINT) AS adist
      FROM scored)
    SELECT query_id, neighbor_id, rank, adist FROM ranked
    WHERE rank <= 3
"""


# Two-stage ANN serving: the IVF-PQ candidate stage (rank <= 20)
# feeds an exact-cosine rerank — both stages replayed, the composed
# stack on one hash.
ORACLE_SQL["ivfpq_rerank_embeddings"] = f"""
    WITH sv AS (
      SELECT vec_id, {_KM_SX} AS v FROM embeddings),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                 AS cell, v AS cv
      FROM (SELECT vec_id, v FROM sv ORDER BY vec_id LIMIT 16)),
    asg AS (
      SELECT vec_id, v, cell, cv FROM (
        SELECT e.vec_id, e.v, c.cell, c.cv,
               row_number() OVER (PARTITION BY e.vec_id
                    ORDER BY list_sum(list_transform(
                        generate_series(1, 64),
                        i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i])))
                        ASC, c.cell ASC) AS rn
        FROM sv e CROSS JOIN cents c) WHERE rn = 1),
    res AS (
      SELECT vec_id, cell,
             list_transform(generate_series(1, 64),
                            i -> v[i] - cv[i]) AS r
      FROM asg),
    subs AS (SELECT UNNEST([0, 1, 2, 3]) AS s),
    books AS (
      SELECT subs.s,
             CAST(row_number() OVER (PARTITION BY subs.s
                  ORDER BY b.vec_id) - 1 AS INT) AS code,
             list_transform(generate_series(1, 16),
                            i -> b.r[16 * subs.s + i]) AS bv
      FROM (SELECT vec_id, r FROM res ORDER BY vec_id LIMIT 16) b
      CROSS JOIN subs),
    enc AS (
      SELECT vec_id, s, code FROM (
        SELECT e.vec_id, b.s, b.code,
               row_number() OVER (PARTITION BY e.vec_id, b.s
                    ORDER BY list_sum(list_transform(
                        generate_series(1, 16),
                        i -> (e.r[16 * b.s + i] - b.bv[i])
                             * (e.r[16 * b.s + i] - b.bv[i]))) ASC,
                    b.code ASC) AS rn
        FROM res e CROSS JOIN books b) WHERE rn = 1),
    probes AS (
      SELECT query_id, cell, qv FROM (
        SELECT q.vec_id AS query_id, c.cell, q.v AS qv,
               row_number() OVER (PARTITION BY q.vec_id
                    ORDER BY list_sum(list_transform(
                        generate_series(1, 64),
                        i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i])))
                        ASC, c.cell ASC) AS rn
        FROM sv q CROSS JOIN cents c WHERE q.vec_id < 10)
      WHERE rn <= 4),
    dtab AS (
      SELECT p.query_id, p.cell, b.s, b.code,
             list_sum(list_transform(generate_series(1, 16),
                  i -> (p.qv[16 * b.s + i] - c.cv[16 * b.s + i]
                        - b.bv[i])
                       * (p.qv[16 * b.s + i] - c.cv[16 * b.s + i]
                          - b.bv[i]))) AS dcell
      FROM probes p
      JOIN cents c ON c.cell = p.cell
      CROSS JOIN books b),
    scored AS (
      SELECT d.query_id, a.vec_id AS neighbor_id,
             SUM(d.dcell) AS adist
      FROM res a
      JOIN enc e ON e.vec_id = a.vec_id
      JOIN dtab d ON d.cell = a.cell AND d.s = e.s
                 AND d.code = e.code
      WHERE a.vec_id <> d.query_id
      GROUP BY d.query_id, a.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY adist ASC, neighbor_id ASC) AS INT) AS rank,
             CAST(adist AS BIGINT) AS adist
      FROM scored),
    cand AS (
      SELECT query_id, neighbor_id FROM ranked WHERE rank <= 20),
    rr AS (
      SELECT c.query_id, c.neighbor_id,
             list_sum(list_transform(generate_series(1, 64),
                  i -> CAST(q.embedding[i] AS DOUBLE)
                       * CAST(n.embedding[i] AS DOUBLE)))
             / ({_NORM.format(v='q.embedding')}
                * {_NORM.format(v='n.embedding')}) AS cos
      FROM cand c
      JOIN embeddings q ON q.vec_id = c.query_id
      JOIN embeddings n ON n.vec_id = c.neighbor_id),
    rranked AS (
      SELECT query_id, neighbor_id,
             CAST(row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank,
             round(cos, 4) AS cosine
      FROM rr)
    SELECT query_id, neighbor_id, rank, cosine FROM rranked
    WHERE rank <= 3
"""

# Columnar blob explosion: parquet (pyarrow) and avro (own codec)
# tables render to the same tab-joined contract; format, header and
# every cell replayed.
ORACLE_SQL["data_blob_rows_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 37) <> 0 AS ok,
               (doc_id % 11) = 5 AS sqlite,
               CAST(2 + doc_id % 3 AS INTEGER) AS n,
               CASE WHEN doc_id % 11 = 5 THEN 'sqlite:items'
                    WHEN doc_id % 2 = 1 AND doc_id % 9 = 7
                         THEN 'arrows'
                    WHEN doc_id % 2 = 1 THEN 'avro'
                    WHEN doc_id % 6 = 4 THEN 'orc'
                    WHEN doc_id % 6 = 2 THEN 'arrow'
                    ELSE 'parquet' END AS fmt,
               COALESCE(text, '') AS t
        FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, fmt,
           CAST(k AS INTEGER) AS row_idx, n AS n_rows,
           CAST(3 AS INTEGER) AS n_cols,
           'id' || chr(9) || 'name' || chr(9) || 'note' AS header,
           (doc_id * 10 + k) || chr(9) || 'item ' || k || chr(9)
           || substr(t, 30 * k + 1, 30) AS line
    FROM p, (SELECT UNNEST([0, 1, 2, 3]) AS k) ks
    WHERE ok AND k < n
    UNION ALL
    -- the sqlite container's second table: its own row group
    SELECT doc_id, TRUE, 'sqlite:meta', CAST(0 AS INTEGER),
           CAST(1 AS INTEGER), CAST(2 AS INTEGER),
           'doc' || chr(9) || 'n',
           doc_id || chr(9) || n
    FROM p WHERE ok AND sqlite
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# Round-13 curation capstone: six genre templates -> mojibake
# inversion (wiki fixes back to the clean construction) -> token gate
# -> md5(normalized) dedup (exact collapses byte-equal pairs, the
# normalized key also collapses the case/whitespace variants) ->
# per-domain rank cap -> md5-bucket mixture sample, all in SQL.
ORACLE_SQL["curation_pipeline_docs"] = rf"""
    WITH d AS (
      SELECT doc_id, doc_id // 12 AS g, doc_id % 6 AS genre,
             (doc_id % 12) >= 6 AS isdup, (doc_id % 7) = 0 AS junk
      FROM documents),
    t0 AS (
      SELECT doc_id, g, genre,
             CASE genre WHEN 0 THEN 'wiki' WHEN 1 THEN 'se'
                        WHEN 2 THEN 'chat' WHEN 3 THEN 'code'
                        WHEN 4 THEN 'latex' ELSE 'jats' END AS domain,
             junk, isdup
      FROM d),
    t1 AS (
      SELECT doc_id, g, genre, domain,
             CASE WHEN junk THEN 'junk ' || doc_id
                  WHEN isdup AND genre >= 3 THEN
                    replace(domain || ' corpus entry ' || g
                      || ' — résumé of shared prose, the quick brown '
                      || 'fox jumps ' || g || ' times.',
                      'shared prose', 'Shared  Prose')
                  ELSE domain || ' corpus entry ' || g
                    || ' — résumé of shared prose, the quick brown '
                    || 'fox jumps ' || g || ' times.'
             END AS beff
      FROM t0),
    x AS (
      SELECT doc_id, domain,
             CASE genre
               WHEN 2 THEN beff || chr(10) || 'acknowledged.'
               WHEN 3 THEN '# ' || beff || chr(10) || 'VALUE = ' || g
                           || chr(10) || 'print(VALUE)' || chr(10)
               WHEN 5 THEN 'Article ' || g || chr(10) || beff
               ELSE beff
             END AS text
      FROM t1),
    q AS (
      SELECT * FROM x
      WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 8),
    n AS (
      SELECT doc_id, domain, text,
             trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
      FROM q),
    dd AS (
      SELECT MIN(doc_id) AS doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_copies
      FROM n GROUP BY norm),
    canon AS (
      SELECT dd.doc_id, n.domain, n.text, dd.n_copies
      FROM dd JOIN n ON n.doc_id = dd.doc_id),
    capped AS (
      SELECT * FROM (
        SELECT doc_id, domain, text, n_copies,
               CAST(row_number() OVER (PARTITION BY domain
                    ORDER BY doc_id) AS INTEGER) AS domain_rank
        FROM canon)
      WHERE domain_rank <= 30),
    tok AS (
      SELECT doc_id, domain, n_copies, domain_rank,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                  AS BIGINT) AS n_tokens
      FROM capped),
    totals AS (
      SELECT domain, SUM(n_tokens) AS dom_tokens
      FROM tok GROUP BY domain),
    rates AS (
      SELECT domain,
             CAST(round(least(1.0,
               3000.0 * (CASE domain WHEN 'wiki' THEN 0.3
                                     WHEN 'se' THEN 0.2
                                     WHEN 'chat' THEN 0.1
                                     WHEN 'code' THEN 0.2
                                     WHEN 'latex' THEN 0.1
                                     WHEN 'jats' THEN 0.1
                                     ELSE 0.0 END)
               / dom_tokens) * 1000000) AS BIGINT) AS thr
      FROM totals)
    SELECT tok.doc_id, tok.domain, tok.n_copies, tok.domain_rank,
           tok.n_tokens
    FROM tok JOIN rates USING (domain)
    WHERE CAST(('0x' || substr(md5('mix|' || CAST(tok.doc_id AS VARCHAR)),
               1, 15))::UBIGINT % 1000000 AS BIGINT) < rates.thr
"""

# TFRecord export->readback: md5 shard assignment, per-shard record
# order and every rendered Example line replayed in SQL.
ORACLE_SQL["tfrecord_export_docs"] = """
    WITH t AS (
      SELECT doc_id, substr(COALESCE(text, ''), 1, 60) AS txt,
             CAST(('0x' || substr(md5('shard|'
                    || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
                  % 1000000 % 16 AS BIGINT) AS shard
      FROM documents),
    r AS (
      SELECT shard, doc_id, txt,
             CAST(row_number() OVER (PARTITION BY shard
                  ORDER BY doc_id) - 1 AS INTEGER) AS rec_idx,
             CAST(count(*) OVER (PARTITION BY shard) AS INTEGER)
                 AS n_records
      FROM t)
    SELECT shard AS shard_id, TRUE AS decoded_ok, rec_idx, n_records,
           'id' || chr(9) || 'text' AS header,
           doc_id || chr(9) || txt AS line
    FROM r
"""

# iCalendar explosion: unfolding/escaping round-trips to the minted
# construction; Z-form epochs replay via strptime.
ORACLE_SQL["ics_events_docs"] = """
    WITH p AS (
      SELECT doc_id, (doc_id % 35) <> 0 AS ok,
             CAST(1 + doc_id % 3 AS INTEGER) AS n,
             doc_id % 27 + 1 AS day, doc_id % 7 AS room,
             COALESCE(text, '') AS t
      FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, CAST(k AS INTEGER) AS event_idx,
           n AS n_events,
           'ev' || doc_id || '-' || k || '@example.com' AS uid,
           substr(t, 40 * k + 1, 40) || ', loc; ' || k AS summary,
           'L1 ' || doc_id || chr(10) || 'L2 ' || k AS description,
           'Room ' || room AS location, 'CONFIRMED' AS status,
           '202403' || lpad(CAST(day AS VARCHAR), 2, '0')
               || 'T' || lpad(CAST(k AS VARCHAR), 2, '0')
               || '0000Z' AS dtstart,
           '202403' || lpad(CAST(day AS VARCHAR), 2, '0')
               || 'T' || lpad(CAST(k + 1 AS VARCHAR), 2, '0')
               || '0000Z' AS dtend,
           CAST(epoch_ms(make_timestamp(2024, 3, day, k, 0, 0))
                AS BIGINT) AS start_ms,
           CAST(epoch_ms(make_timestamp(2024, 3, day, k + 1, 0, 0))
                AS BIGINT) AS end_ms
    FROM p, (SELECT UNNEST([0, 1, 2]) AS k) ks
    WHERE ok AND k < n
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# vCard explosion: compound ORG with an escaped semicolon, folded
# titles, multi-valued EMAIL/TEL — every field replayed.
ORACLE_SQL["vcf_cards_docs"] = """
    WITH p AS (
      SELECT doc_id, (doc_id % 33) <> 0 AS ok,
             CAST(1 + doc_id % 2 AS INTEGER) AS n,
             COALESCE(text, '') AS t
      FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, CAST(k AS INTEGER) AS card_idx,
           n AS n_cards,
           'Person ' || doc_id || '-' || k AS fn,
           'Org; Unit ' || (doc_id % 9) AS org,
           substr(t, 25 * k + 1, 25) AS title,
           'p' || doc_id || '.' || k || '@example.com;alt' || k
               || '@example.com' AS emails,
           '+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS tels
    FROM p, (SELECT UNNEST([0, 1]) AS k) ks
    WHERE ok AND k < n
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# WebDataset export->readback: md5 shard assignment, adjacency order,
# keys, extension sets and both member payloads replayed.
ORACLE_SQL["wds_export_docs"] = """
    WITH t AS (
      SELECT doc_id, substr(COALESCE(text, ''), 1, 60) AS txt,
             CAST(('0x' || substr(md5('shard|'
                    || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
                  % 1000000 % 16 AS BIGINT) AS shard
      FROM documents),
    r AS (
      SELECT shard, doc_id, txt,
             CAST(row_number() OVER (PARTITION BY shard
                  ORDER BY doc_id) - 1 AS INTEGER) AS sample_idx,
             CAST(count(*) OVER (PARTITION BY shard) AS INTEGER)
                 AS n_samples
      FROM t)
    SELECT shard AS shard_id, TRUE AS decoded_ok, sample_idx,
           n_samples,
           lpad(CAST(doc_id AS VARCHAR), 12, '0') AS key,
           'json;txt' AS exts, txt AS text,
           '{"id": ' || doc_id || '}' AS json
    FROM r
"""

# robots.txt explosion: RFC 9309 group model — groups, rule order,
# patterns, crawl delays and the sitemap count replayed.
ORACLE_SQL["robots_rules_docs"] = """
    WITH p AS (
      SELECT doc_id, (doc_id % 31) <> 0 AS ok,
             (doc_id % 3) <> 0 AS hasbot,
             doc_id % 5 AS priv, doc_id % 7 AS bot,
             CAST(doc_id % 4 AS DOUBLE) + 0.5 AS delay
      FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, CAST(0 AS INTEGER) AS group_idx,
           '*' AS agents, CAST(k AS INTEGER) AS rule_idx,
           CASE k WHEN 0 THEN 'disallow' ELSE 'allow' END AS directive,
           CASE k WHEN 0 THEN '/private' || priv || '/'
                  ELSE '/private' || priv || '/ok.html' END AS pattern,
           delay AS crawl_delay, CAST(1 AS INTEGER) AS n_sitemaps
    FROM p, (SELECT UNNEST([0, 1]) AS k) ks
    WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, CAST(1 AS INTEGER), 'bot' || bot,
           CAST(0 AS INTEGER), 'disallow',
           '/tmp' || doc_id || '/*.pdf$', NULL, CAST(1 AS INTEGER)
    FROM p WHERE ok AND hasbot
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# Sitemap explosion: urlset/sitemapindex kinds, gzip wrapping, entry
# order and every field replayed.
ORACLE_SQL["sitemap_urls_docs"] = """
    WITH p AS (
      SELECT doc_id, (doc_id % 29) <> 0 AS ok,
             CAST(1 + doc_id % 3 AS INTEGER) AS n,
             CASE WHEN doc_id % 4 = 0 THEN 'sitemapindex'
                  ELSE 'urlset' END AS kind,
             doc_id % 27 + 1 AS day
      FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, kind,
           CAST(k AS INTEGER) AS url_idx, n AS n_urls,
           'https://example.com/' || doc_id || '/' || k AS loc,
           '2024-03-' || lpad(CAST(day AS VARCHAR), 2, '0') AS lastmod,
           CASE k % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
                      ELSE 'monthly' END AS changefreq,
           '0.' || (k + 1) AS priority
    FROM p, (SELECT UNNEST([0, 1, 2]) AS k) ks
    WHERE ok AND k < n
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# Frontier audit: RFC 9309 group selection (a named agent group
# REPLACES *), precedence verdicts per path flavor, and delays.
ORACLE_SQL["frontier_audit_docs"] = """
    WITH p AS (
      SELECT doc_id,
             (doc_id % 23) <> 0 AND (doc_id % 19) <> 0 AS ok,
             (doc_id % 2) = 1 AS hasbot,
             doc_id % 5 AS b,
             CAST(doc_id % 3 + 1.0 AS DOUBLE) AS delay
      FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, CAST(k AS INTEGER) AS url_idx,
           'https://h' || doc_id || '.com' ||
             CASE k WHEN 0 THEN '/open/page' || doc_id
                    WHEN 1 THEN '/block' || b || '/x'
                    WHEN 2 THEN '/block' || b || '/open/x'
                    ELSE '/paper/doc' || doc_id || '.pdf' END AS loc,
           CASE k WHEN 0 THEN '/open/page' || doc_id
                  WHEN 1 THEN '/block' || b || '/x'
                  WHEN 2 THEN '/block' || b || '/open/x'
                  ELSE '/paper/doc' || doc_id || '.pdf' END AS path,
           CASE k
             WHEN 0 THEN TRUE
             WHEN 1 THEN hasbot   -- * group blocks it; bot group has no rule for it
             WHEN 2 THEN TRUE     -- longest allow wins in *; no rule in bot group
             ELSE NOT hasbot      -- bot group's wildcard+anchor pdf rule
           END AS allowed,
           CASE WHEN hasbot THEN NULL ELSE delay END AS crawl_delay
    FROM p, (SELECT UNNEST([0, 1, 2, 3]) AS k) ks
    WHERE ok
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

# URL canonicalization: eight raw variants per doc collapse to three
# canonical keys (plain×5 incl. a newline-bearing fragment;
# credentialed×2 with userinfo case preserved; lowercase-userinfo×1
# kept distinct); endpoints + counts replayed.
# TZID epochs through embedded VTIMEZONEs: the spring event spans the
# transition (standard start, daylight end), the autumn event sits
# after fall-back, the Atlantis TZID pins null — every epoch replayed
# as offset arithmetic.
ORACLE_SQL["ics_tzid_events_docs"] = """
    WITH p AS (
      SELECT doc_id, (doc_id % 41) <> 0 AS ok,
             CAST(doc_id % 5 AS INTEGER) AS c,
             CAST(doc_id % 30 AS INTEGER) AS mm
      FROM documents
    )
    SELECT doc_id, TRUE AS decoded_ok, CAST(0 AS INTEGER) AS event_idx,
           CAST(3 AS INTEGER) AS n_events,
           'tz' || doc_id || '-0@example.com' AS uid,
           'spring' AS summary,
           '20240331T01' || lpad(CAST(mm AS VARCHAR), 2, '0') || '00'
               AS dtstart,
           '20240331T03' || lpad(CAST(mm AS VARCHAR), 2, '0') || '00'
               AS dtend,
           CAST(epoch_ms(make_timestamp(2024, 3, 31, 1, mm, 0))
                - (1 + c) * 3600000 AS BIGINT) AS start_ms,
           CAST(epoch_ms(make_timestamp(2024, 3, 31, 3, mm, 0))
                - (2 + c) * 3600000 AS BIGINT) AS end_ms
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, CAST(1 AS INTEGER), CAST(3 AS INTEGER),
           'tz' || doc_id || '-1@example.com', 'autumn',
           '20241027T04' || lpad(CAST(mm AS VARCHAR), 2, '0') || '00',
           '20241027T05' || lpad(CAST(mm AS VARCHAR), 2, '0') || '00',
           CAST(epoch_ms(make_timestamp(2024, 10, 27, 4, mm, 0))
                - (1 + c) * 3600000 AS BIGINT),
           CAST(epoch_ms(make_timestamp(2024, 10, 27, 5, mm, 0))
                - (1 + c) * 3600000 AS BIGINT)
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, CAST(2 AS INTEGER), CAST(3 AS INTEGER),
           'tz' || doc_id || '-2@example.com', 'lost',
           '20240601T12' || lpad(CAST(mm AS VARCHAR), 2, '0') || '00',
           NULL, NULL, NULL
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL,
           NULL, NULL
    FROM p WHERE NOT ok
"""

# Frontier build end-to-end: sitemapindex expansion (3 shapes), raw
# variants collapsing through canonical_url, robots verdicts with the
# allow-beats-disallow precedence on ok.html, three whole-host
# refusals (truncated gzip child / unfetched child / depth overflow).
ORACLE_SQL["frontier_build_docs"] = """
    WITH p AS (
      SELECT doc_id,
             doc_id % 23 = 0 OR (doc_id % 23 <> 0 AND doc_id % 31 = 0)
               OR (doc_id % 23 <> 0 AND doc_id % 31 <> 0
                   AND doc_id % 29 = 7) AS broken,
             CAST(doc_id % 4 AS DOUBLE) / 2.0 AS delay,
             doc_id % 7 AS shape
      FROM documents
    ), q AS (
      SELECT doc_id, NOT broken AS ok, delay, shape,
             CASE WHEN shape = 3 THEN 0 WHEN shape = 5 THEN 2
                  ELSE 1 END AS d
      FROM p
    )
    SELECT doc_id, TRUE AS decoded_ok,
           'http://h' || doc_id || '.example.com/p/' || doc_id
               AS canonical,
           CAST(CASE WHEN shape = 3 THEN 2 ELSE 3 END AS BIGINT)
               AS n_raw,
           TRUE AS all_allowed, TRUE AS any_allowed,
           CAST(d AS INTEGER) AS max_depth, delay AS crawl_delay
    FROM q WHERE ok
    UNION ALL
    SELECT doc_id, TRUE,
           'http://h' || doc_id || '.example.com/block/z' || doc_id,
           CAST(1 AS BIGINT), FALSE, FALSE, CAST(d AS INTEGER), delay
    FROM q WHERE ok
    UNION ALL
    SELECT doc_id, TRUE,
           'http://h' || doc_id || '.example.com/block/ok.html',
           CAST(1 AS BIGINT), TRUE, TRUE, CAST(d AS INTEGER), delay
    FROM q WHERE ok AND shape <> 3
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL
    FROM q WHERE NOT ok
"""

# Multimodal WebDataset round trip: md5 shard layout, adjacency
# grouping, byte-exact png/seg survival, %17 image-dup groups across
# shards (dHash-grouped in Spark, arithmetic-replayed here — valid
# because the 17 pattern dHashes are pinned pairwise-distinct).
ORACLE_SQL["wds_multimodal_docs"] = """
    WITH p AS (
      SELECT doc_id, doc_id % 17 AS g, doc_id % 19 = 0 AS trunc,
             CAST(('0x' || substr(md5('shard|'
                    || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
                  % 1000000 % 16 AS BIGINT) AS shard
      FROM documents
    ), r AS (
      SELECT doc_id, g, trunc, shard,
             CAST(row_number() OVER (PARTITION BY shard
                  ORDER BY doc_id) - 1 AS INTEGER) AS sample_idx,
             CAST(count(*) OVER (PARTITION BY shard) AS INTEGER)
                 AS n_samples,
             count(CASE WHEN NOT trunc THEN 1 END)
                 OVER (PARTITION BY g) AS grp,
             min(CASE WHEN NOT trunc THEN doc_id END)
                 OVER (PARTITION BY g) AS canon
      FROM p
    )
    SELECT doc_id, shard AS shard_id, sample_idx, n_samples,
           lpad(CAST(doc_id AS VARCHAR), 12, '0') AS key,
           'json;png;seg.png;txt' AS exts,
           'caption g' || g || ' doc ' || doc_id AS caption,
           '{"id": ' || doc_id || '}' AS meta_json,
           NOT trunc AS png_exact, TRUE AS seg_exact,
           CASE WHEN NOT trunc
                THEN CAST(24 + (g % 4) * 8 AS INTEGER) END AS width,
           CASE WHEN NOT trunc
                THEN CAST(16 + (g % 3) * 8 AS INTEGER) END AS height,
           CASE WHEN NOT trunc THEN CAST(grp AS BIGINT) END
               AS dup_group_size,
           CASE WHEN NOT trunc THEN doc_id = canon END
               AS is_canonical
    FROM r
"""

# Governance-gated crawl ingestion: frontier-allowed 200 pages only,
# cross-host dedup groups on the shared pages, the disallowed page's
# text provably absent, truncated-WARC hosts isolated whole.
ORACLE_SQL["crawl_corpus_docs"] = """
    WITH p AS (
      SELECT doc_id, (doc_id % 19) <> 0 AS ok,
             CAST(doc_id % 5 AS INTEGER) AS g
      FROM documents
    ), shared AS (
      SELECT g, COUNT(*) AS n, MIN(doc_id) AS canon
      FROM p WHERE ok GROUP BY g
    )
    SELECT doc_id, TRUE AS decoded_ok,
           '/p/' || doc_id AS path, TRUE AS allowed,
           TRUE AS fetched,
           'unique page ' || doc_id || ' body prose.' AS text,
           CAST(1 AS BIGINT) AS dup_group_size,
           TRUE AS is_canonical
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, '/shared/' || g, TRUE, TRUE,
           'shared corpus page g' || g || ' common text.',
           CAST(s.n AS BIGINT), doc_id = s.canon
    FROM p JOIN shared s USING (g) WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, '/block/secret' || doc_id, FALSE,
           NULL, NULL, NULL, NULL
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, TRUE, '/gone/' || doc_id, TRUE, FALSE,
           NULL, NULL, NULL
    FROM p WHERE ok
    UNION ALL
    SELECT doc_id, FALSE, NULL, NULL, NULL, NULL, NULL, NULL
    FROM p WHERE NOT ok
"""

ORACLE_SQL["canonical_url_docs"] = """
    SELECT doc_id,
           'http://host' || doc_id || '.example.com/path/' || doc_id
               AS canonical,
           CAST(6 AS BIGINT) AS n_variants,
           CAST(6 AS BIGINT) AS n_distinct_raw
    FROM documents
    UNION ALL
    SELECT doc_id,
           '//HOST' || doc_id || '.example.com:80/path/' || doc_id,
           CAST(1 AS BIGINT), CAST(1 AS BIGINT)
    FROM documents
    UNION ALL
    SELECT doc_id,
           'http://User' || doc_id || ':Pw@host' || doc_id
               || '.example.com/u',
           CAST(2 AS BIGINT), CAST(2 AS BIGINT)
    FROM documents
    UNION ALL
    SELECT doc_id,
           'http://user' || doc_id || ':pw@host' || doc_id
               || '.example.com/u',
           CAST(1 AS BIGINT), CAST(1 AS BIGINT)
    FROM documents
"""

# WET ingestion (r15): replay of wet_text_docs' minting arithmetic —
# two conversion rows per healthy doc (charset family by doc_id % 4:
# bare utf-8 / BOM / declared windows-1251 / probed GB18030), one
# decoded_ok=false row per truncated archive (doc_id % 17).  The
# request/response siblings only ever show up as n_skipped=3 — their
# text reaching the `text` column would fail the hash.
ORACLE_SQL["wet_text_docs"] = """
    WITH p AS (
        SELECT doc_id,
               (doc_id % 17) <> 0 AS ok,
               doc_id % 4 AS cs,
               COALESCE(text, '') AS doc_text
        FROM documents
    )
    SELECT doc_id,
           ok AS decoded_ok,
           CASE WHEN ok THEN CAST(0 AS INTEGER) END AS record_idx,
           CASE WHEN ok THEN CAST(2 AS INTEGER) END AS n_conversion,
           CASE WHEN ok THEN CAST(3 AS INTEGER) END AS n_skipped,
           CASE WHEN ok
                THEN 'http://example.com/wet/' || doc_id || '/0'
           END AS uri,
           CASE WHEN ok THEN '<urn:uuid:' || doc_id || '-0>'
           END AS refers_to,
           CASE WHEN ok THEN
                CASE cs WHEN 1 THEN 'utf-8-sig'
                        WHEN 2 THEN 'cp1251'
                        WHEN 3 THEN 'gb18030'
                        ELSE 'utf-8' END
           END AS charset,
           CASE WHEN ok THEN TRUE END AS decode_clean,
           CASE WHEN ok THEN
                CASE cs WHEN 2 THEN 'привет wet ' || doc_id
                        WHEN 3 THEN '你好，世界。这是一段用于测试的中文文本 wet '
                                    || doc_id
                        ELSE 'wet ' || doc_id || ': ' || doc_text END
           END AS text
    FROM p
    UNION ALL
    SELECT doc_id, TRUE,
           CAST(1 AS INTEGER), CAST(2 AS INTEGER), CAST(3 AS INTEGER),
           'http://example.com/wet/' || doc_id || '/1',
           '<urn:uuid:' || doc_id || '-1>',
           'utf-8', TRUE,
           'wet ' || doc_id || ' part two'
    FROM p WHERE ok
"""

# WAT ingestion (r15): replay of wat_metadata_docs — record 0 carries
# the canonical envelope (status 200 + doc_id % 5, doc_id % 7 links,
# 'title {doc_id}'); record 1 is invalid JSON on every third doc
# (json_ok=false, typed fields null) and a minimal valid envelope
# otherwise; every 13th archive truncated.
ORACLE_SQL["wat_metadata_docs"] = """
    WITH p AS (
        SELECT doc_id, (doc_id % 13) <> 0 AS ok FROM documents
    )
    SELECT doc_id,
           ok AS decoded_ok,
           CASE WHEN ok THEN CAST(0 AS INTEGER) END AS record_idx,
           CASE WHEN ok THEN CAST(2 AS INTEGER) END AS n_metadata,
           CASE WHEN ok THEN CAST(3 AS INTEGER) END AS n_skipped,
           CASE WHEN ok
                THEN 'http://example.com/page/' || doc_id || '/0'
           END AS uri,
           CASE WHEN ok THEN '<urn:uuid:' || doc_id || '-0>'
           END AS refers_to,
           CASE WHEN ok THEN TRUE END AS json_ok,
           CASE WHEN ok THEN CAST(200 + doc_id % 5 AS INTEGER)
           END AS http_status,
           CASE WHEN ok THEN CAST(doc_id % 7 AS INTEGER) END AS n_links,
           CASE WHEN ok THEN 'title ' || doc_id END AS title
    FROM p
    UNION ALL
    SELECT doc_id, TRUE,
           CAST(1 AS INTEGER), CAST(2 AS INTEGER), CAST(3 AS INTEGER),
           'http://example.com/page/' || doc_id || '/1',
           '<urn:uuid:' || doc_id || '-1>',
           (doc_id % 3) <> 0,
           CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS VARCHAR)
    FROM p WHERE ok
"""

# WET → corpus composition (r15): the conversion-record door feeding
# the quality gate + cross-shard dedup.  Page A: 6 prefix tokens + the
# doc text's own tokens, its own group; page B: byte-shared by
# doc_id % 7 (group count / canonical-min replayed); page C (1 token)
# falls to the >= 5 gate; doc_id % 19 truncated shards drop whole.
ORACLE_SQL["wet_corpus_docs"] = """
    WITH p AS (
        SELECT doc_id,
               (doc_id % 19) <> 0 AS ok,
               doc_id % 7 AS g,
               COALESCE(text, '') AS doc_text
        FROM documents
    ),
    okd AS (SELECT * FROM p WHERE ok),
    shared AS (
        SELECT g, COUNT(*) AS n, MIN(doc_id) AS mn FROM okd GROUP BY g
    )
    SELECT doc_id,
           CAST(0 AS INTEGER) AS record_idx,
           'http://wet.test/' || doc_id || '/a' AS uri,
           CAST(6 + len(regexp_extract_all(lower(doc_text),
                                           '[a-z0-9]+')) AS INTEGER)
               AS n_tokens,
           CAST(1 AS BIGINT) AS dup_group_size,
           TRUE AS is_canonical
    FROM okd
    UNION ALL
    SELECT o.doc_id,
           CAST(1 AS INTEGER),
           'http://wet.test/' || o.doc_id || '/b',
           CAST(6 AS INTEGER),
           CAST(s.n AS BIGINT),
           o.doc_id = s.mn
    FROM okd o JOIN shared s ON o.g = s.g
"""

# DSIR-style importance scores: the full hashed-bigram pipeline in SQL
# — tokens, space-joined bigrams, 60-bit md5 buckets mod 8192, +1
# smoothing, per-occurrence (tc+1)*10^6 // (rc+1) integer ratio, the
# benchmark spine (doc_id % 50 = 0) as the target distribution.  All
# integer arithmetic: no float term anywhere.
ORACLE_SQL["dsir_importance_docs"] = """
    WITH toks AS (
        SELECT doc_id,
               regexp_extract_all(lower(COALESCE(text, '')),
                                  '[a-z0-9]+') AS toks
        FROM documents),
    grams AS (
        SELECT doc_id,
               CASE WHEN len(toks) >= 2 THEN list_transform(
                        generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1])
                    ELSE [] END AS gs
        FROM toks),
    occ AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 15))::UBIGINT % 8192
                    AS BIGINT) AS bucket
        FROM grams, UNNEST(gs) AS u(g)),
    tc AS (SELECT bucket, COUNT(*) AS tc FROM occ
           WHERE doc_id % 50 = 0 GROUP BY bucket),
    rc AS (SELECT bucket, COUNT(*) AS rc FROM occ
           WHERE doc_id % 50 <> 0 GROUP BY bucket),
    tot AS (
        SELECT ((SELECT COALESCE(SUM(rc), 0) FROM rc) + 8192)
               * 1000000
               // ((SELECT COALESCE(SUM(tc), 0) FROM tc) + 8192)
               AS ratio_scale),
    sc AS (
        SELECT o.doc_id, COUNT(*) AS n_ngrams,
               SUM((COALESCE(t.tc, 0) + 1) * tot.ratio_scale
                   // (COALESCE(r.rc, 0) + 1)) AS score
        FROM occ o
        LEFT JOIN tc t USING (bucket)
        LEFT JOIN rc r USING (bucket)
        CROSS JOIN tot
        WHERE o.doc_id % 50 <> 0
        GROUP BY o.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(s.n_ngrams, 0) AS BIGINT) AS n_ngrams,
           CAST(COALESCE(s.score, 0) AS BIGINT) AS score,
           COALESCE(s.score, 0) >
               COALESCE(s.n_ngrams, 0) * 1000000 AS selected
    FROM documents d LEFT JOIN sc s USING (doc_id)
    WHERE d.doc_id % 50 <> 0
"""

# Hash-threshold distinct sampling: the subsample cut (60-bit md5 <
# 2^56), its exact distinct count, and the x16 scale — all replayed.
ORACLE_SQL["vocab_estimate_docs"] = """
    WITH toks AS (
        SELECT lang,
               regexp_extract_all(lower(COALESCE(text, '')),
                                  '[a-z0-9]+') AS ts
        FROM documents),
    grams AS (
        SELECT lang,
               UNNEST(CASE WHEN len(ts) >= 2 THEN list_transform(
                          generate_series(1, len(ts) - 1),
                          i -> ts[i] || ' ' || ts[i + 1])
                      ELSE [] END) AS g
        FROM toks)
    SELECT lang,
           COUNT(DISTINCT g) AS n_sampled,
           COUNT(DISTINCT g) * 16 AS estimate
    FROM grams
    WHERE ('0x' || substr(md5(g), 1, 15))::UBIGINT < (1::UBIGINT << 56)
    GROUP BY lang
"""

# Domain blocklist: the label-suffix chain, the rule join (case-folded)
# and the longest-match rule selection, replayed.  'ample2.com' pins
# the label-boundary semantics: every ...example2.com host ends with it
# as a STRING but no label chain contains it.
ORACLE_SQL["blocklist_filter_docs"] = """
    WITH u AS (
        SELECT doc_id,
               'w' || (doc_id % 97) || '.site' || (doc_id % 13) ||
               '.example' || (doc_id % 7) || '.com' AS host
        FROM documents),
    s AS (
        SELECT doc_id,
               UNNEST(list_transform(
                   generate_series(1, len(string_split(host, '.'))),
                   i -> array_to_string(
                       list_slice(string_split(host, '.'), i,
                                  len(string_split(host, '.'))),
                       '.'))) AS suffix
        FROM u),
    b AS (SELECT * FROM (VALUES ('site5.example3.com'),
                                ('example3.com'), ('example2.com'),
                                ('ample2.com'),
                                ('w11.site4.example6.com'),
                                ('org')) t(domain)),
    m AS (
        SELECT doc_id, arg_max(suffix, length(suffix)) AS matched_rule
        FROM s JOIN b ON s.suffix = b.domain
        GROUP BY doc_id)
    SELECT u.doc_id, u.host,
           m.doc_id IS NOT NULL AS blocked, m.matched_rule
    FROM u LEFT JOIN m USING (doc_id)
"""

# Selection capstone: blocklist (derived from FIRST PRINCIPLES — the
# residue classes whose hosts the two rules catch), leader-join dup
# planting, min-id dedup, then the full DSIR replay over SURVIVORS
# only.  Any stage leaking a dropped doc into a later stage breaks
# the replay.
ORACLE_SQL["selection_pipeline_docs"] = """
    WITH docs AS (
        SELECT doc_id, COALESCE(text, '') AS t FROM documents),
    corpus AS (
        SELECT d.doc_id, l.t
        FROM docs d
        JOIN docs l ON l.doc_id = d.doc_id - d.doc_id % 3
        WHERE d.doc_id % 50 <> 0),
    blk AS (
        SELECT doc_id,
               (doc_id % 7 = 2)
               OR (doc_id % 13 = 5 AND doc_id % 7 = 3) AS blocked
        FROM corpus),
    ded AS (
        SELECT c.doc_id,
               c.doc_id <> MIN(c.doc_id)
                   OVER (PARTITION BY md5(c.t)) AS is_dup
        FROM corpus c JOIN blk USING (doc_id) WHERE NOT blocked),
    surv AS (
        SELECT c.doc_id, c.t
        FROM corpus c JOIN ded USING (doc_id) WHERE NOT is_dup),
    tocc AS (
        SELECT CAST(('0x' || substr(md5(g), 1, 15))::UBIGINT % 8192
                    AS BIGINT) AS bucket
        FROM (SELECT UNNEST(CASE WHEN len(ts) >= 2
                  THEN list_transform(generate_series(1, len(ts) - 1),
                       i -> ts[i] || ' ' || ts[i + 1])
                  ELSE [] END) AS g
              FROM (SELECT regexp_extract_all(lower(t), '[a-z0-9]+')
                        AS ts
                    FROM docs WHERE doc_id % 50 = 0))),
    socc AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 15))::UBIGINT % 8192
                    AS BIGINT) AS bucket
        FROM (SELECT doc_id, UNNEST(CASE WHEN len(ts) >= 2
                  THEN list_transform(generate_series(1, len(ts) - 1),
                       i -> ts[i] || ' ' || ts[i + 1])
                  ELSE [] END) AS g
              FROM (SELECT doc_id,
                        regexp_extract_all(lower(t), '[a-z0-9]+')
                            AS ts
                    FROM surv))),
    tcn AS (SELECT bucket, COUNT(*) AS tc FROM tocc GROUP BY bucket),
    rcn AS (SELECT bucket, COUNT(*) AS rc FROM socc GROUP BY bucket),
    tot AS (
        SELECT ((SELECT COALESCE(SUM(rc), 0) FROM rcn) + 8192)
               * 1000000
               // ((SELECT COALESCE(SUM(tc), 0) FROM tcn) + 8192)
               AS ratio_scale),
    sc AS (
        SELECT o.doc_id, COUNT(*) AS n_ngrams,
               SUM((COALESCE(t.tc, 0) + 1) * tot.ratio_scale
                   // (COALESCE(r.rc, 0) + 1)) AS score
        FROM socc o
        LEFT JOIN tcn t USING (bucket)
        LEFT JOIN rcn r USING (bucket)
        CROSS JOIN tot
        GROUP BY o.doc_id)
    SELECT c.doc_id, b.blocked,
           COALESCE(d2.is_dup, FALSE) AS is_dup,
           CAST(COALESCE(s.n_ngrams, 0) AS BIGINT) AS n_ngrams,
           CAST(COALESCE(s.score, 0) AS BIGINT) AS score,
           COALESCE(s.score > s.n_ngrams * 1000000, FALSE)
               AS selected,
           (NOT b.blocked) AND (NOT COALESCE(d2.is_dup, FALSE))
               AND COALESCE(s.score > s.n_ngrams * 1000000, FALSE)
               AS kept
    FROM corpus c
    JOIN blk b USING (doc_id)
    LEFT JOIN ded d2 USING (doc_id)
    LEFT JOIN sc s USING (doc_id)
"""

# Binned-histogram quantiles: fixed-width bins, cumulative walk,
# integer rank thresholds — bin lower edges out.
ORACLE_SQL["length_quantiles_docs"] = """
    WITH lens AS (
        SELECT lang,
               len(regexp_extract_all(lower(COALESCE(text, '')),
                                      '[a-z0-9]+')) AS v
        FROM documents),
    bins AS (
        SELECT lang,
               LEAST(GREATEST(CAST(v // 5 AS INT), 0), 199) AS b,
               COUNT(*) AS c
        FROM lens GROUP BY lang, b),
    cum AS (
        SELECT lang, b,
               SUM(c) OVER (PARTITION BY lang ORDER BY b) AS cum,
               SUM(c) OVER (PARTITION BY lang) AS n
        FROM bins)
    SELECT lang, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100
                         THEN b END) * 5 AS BIGINT) AS q50,
           CAST(MIN(CASE WHEN cum >= (n * 90 + 99) // 100
                         THEN b END) * 5 AS BIGINT) AS q90,
           CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100
                         THEN b END) * 5 AS BIGINT) AS q99
    FROM cum GROUP BY lang
"""

# IDN blocklist: the folded (ACE) hosts and verdicts derive from the
# residue classes with the xn-- strings AUTHORED from the public IDNA
# mapping — the operator's encoder never runs here, so a folding bug
# on either side breaks the hash.
ORACLE_SQL["blocklist_idn_docs"] = """
    WITH r AS (
        SELECT doc_id,
               CAST(doc_id % 3 AS INT) AS p,
               CAST(doc_id % 6 AS INT) AS b
        FROM documents),
    f AS (
        SELECT doc_id, p, b,
               (CASE p WHEN 1 THEN 'mail.'
                       WHEN 2 THEN 'xn--e1afmkfd.'
                       ELSE '' END) ||
               (CASE b WHEN 0 THEN 'xn--bcher-kva.example'
                       WHEN 1 THEN 'xn--bcher-kva.example'
                       WHEN 2 THEN 'xn--mnchen-3ya.de'
                       WHEN 3 THEN 'xn--mnchen-3ya.de'
                       WHEN 4 THEN 'strasse.de'
                       ELSE 'plain.ascii.org' END) AS host
        FROM r)
    SELECT doc_id, host,
           b < 5 AS blocked,
           CASE WHEN b IN (0, 1) AND p = 2
                    THEN 'xn--e1afmkfd.xn--bcher-kva.example'
                WHEN b IN (0, 1) THEN 'xn--bcher-kva.example'
                WHEN b IN (2, 3) THEN 'xn--mnchen-3ya.de'
                WHEN b = 4 THEN 'strasse.de'
                ELSE NULL END AS matched_rule
    FROM f
"""

# PMI collocations: tokens, positional bigrams, both count tables and
# the DECIMAL integer division replayed from scratch; HUGEINT keeps
# the intermediate exact.
ORACLE_SQL["pmi_collocations_docs"] = """
    WITH ts AS (
        SELECT regexp_extract_all(lower(COALESCE(text, '')),
                                  '[a-z0-9]+') AS ts
        FROM documents),
    uni AS (
        SELECT w, COUNT(*) AS cu
        FROM (SELECT UNNEST(ts) AS w FROM ts) GROUP BY w),
    tot AS (SELECT COALESCE(SUM(cu), 0) AS n_tokens FROM uni),
    big AS (
        SELECT w1, w2, COUNT(*) AS c_xy
        FROM (SELECT UNNEST(list_transform(
                  generate_series(1, len(ts) - 1), i -> ts[i])) AS w1,
                     UNNEST(list_transform(
                  generate_series(1, len(ts) - 1), i -> ts[i + 1])) AS w2
              FROM ts WHERE len(ts) >= 2)
        GROUP BY w1, w2
        HAVING COUNT(*) >= 5)
    SELECT b.w1, b.w2,
           CAST(b.c_xy AS BIGINT) AS c_xy,
           CAST(u1.cu AS BIGINT) AS c1,
           CAST(u2.cu AS BIGINT) AS c2,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST((b.c_xy::HUGEINT * t.n_tokens * 1000000)
                // (u1.cu::HUGEINT * u2.cu) AS BIGINT)
               AS pmi_ratio_scaled
    FROM big b
    JOIN uni u1 ON u1.w = b.w1
    JOIN uni u2 ON u2.w = b.w2
    CROSS JOIN tot t
"""

# Pairwise corpus overlap: the coordinated bottom sketch replayed —
# same md5 threshold as vocab_estimate, sampled self-join on gram,
# integer permille Jaccard.  Every non-empty group pair appears even
# with zero shared grams.
ORACLE_SQL["corpus_overlap_docs"] = """
    WITH toks AS (
        SELECT lang,
               regexp_extract_all(lower(COALESCE(text, '')),
                                  '[a-z0-9]+') AS ts
        FROM documents),
    grams AS (
        SELECT lang,
               UNNEST(CASE WHEN len(ts) >= 2 THEN list_transform(
                          generate_series(1, len(ts) - 1),
                          i -> ts[i] || ' ' || ts[i + 1])
                      ELSE [] END) AS g
        FROM toks),
    sub AS (
        SELECT DISTINCT lang, g
        FROM grams
        WHERE ('0x' || substr(md5(g), 1, 15))::UBIGINT
              < (1::UBIGINT << 56)),
    pg AS (SELECT lang, COUNT(*) AS n FROM sub GROUP BY lang),
    pr AS (
        SELECT a.lang AS g_a, b.lang AS g_b, COUNT(*) AS nc
        FROM sub a JOIN sub b ON a.g = b.g AND a.lang < b.lang
        GROUP BY a.lang, b.lang)
    SELECT pa.lang AS g_a, pb.lang AS g_b,
           CAST(pa.n AS BIGINT) AS n_a,
           CAST(pb.n AS BIGINT) AS n_b,
           CAST(COALESCE(pr.nc, 0) AS BIGINT) AS n_common,
           CAST(COALESCE(pr.nc, 0) * 16 AS BIGINT) AS inter_estimate,
           CAST((pa.n + pb.n - COALESCE(pr.nc, 0)) * 16 AS BIGINT)
               AS union_estimate,
           CAST(COALESCE(pr.nc, 0) * 1000
                // (pa.n + pb.n - COALESCE(pr.nc, 0)) AS BIGINT)
               AS jaccard_permille
    FROM pg pa
    JOIN pg pb ON pa.lang < pb.lang
    LEFT JOIN pr ON pr.g_a = pa.lang AND pr.g_b = pb.lang
"""

# Fixed-iteration PageRank: the two power-method steps replayed as
# CTE hops; every division integer (// floors = Spark DIV on the
# all-nonnegative ranks), so the chain is bit-exact.
ORACLE_SQL["link_rank_docs"] = """
    WITH e AS (
        SELECT doc_id % 101 AS src, (doc_id * 7 + 3) % 101 AS dst
        FROM documents),
    deg AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
    nodes AS (
        SELECT src AS node FROM e UNION SELECT dst FROM e),
    spine AS (
        SELECT n.node,
               CAST(COALESCE(d.od, 0) AS BIGINT) AS out_degree
        FROM nodes n LEFT JOIN deg d ON d.src = n.node),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
    s1 AS (
        SELECT e.dst AS node, SUM(r.rank // d.od) AS inflow
        FROM e JOIN r0 r ON r.node = e.src
               JOIN deg d ON d.src = e.src
        GROUP BY e.dst),
    r1 AS (
        SELECT n.node,
               150000 + 850 * COALESCE(s.inflow, 0) // 1000 AS rank
        FROM nodes n LEFT JOIN s1 s USING (node)),
    s2 AS (
        SELECT e.dst AS node, SUM(r.rank // d.od) AS inflow
        FROM e JOIN r1 r ON r.node = e.src
               JOIN deg d ON d.src = e.src
        GROUP BY e.dst),
    r2 AS (
        SELECT n.node,
               150000 + 850 * COALESCE(s.inflow, 0) // 1000 AS rank
        FROM nodes n LEFT JOIN s2 s USING (node))
    SELECT sp.node, sp.out_degree, CAST(r2.rank AS BIGINT) AS rank
    FROM spine sp JOIN r2 USING (node)
"""

# Largest-remainder apportionment: floor quotas, multiply-back
# remainders, rank by (remainder DESC, lang ASC), +1 to the first
# `leftover` groups.
ORACLE_SQL["token_budget_docs"] = """
    WITH w AS (
        SELECT lang,
               CAST(SUM(len(regexp_extract_all(
                   lower(COALESCE(text, '')), '[a-z0-9]+')))
                   AS BIGINT) AS weight
        FROM documents GROUP BY lang),
    t AS (SELECT COALESCE(SUM(weight), 0) AS wt FROM w),
    q AS (
        SELECT lang, weight,
               CASE WHEN t.wt = 0 THEN 0
                    ELSE (1000000::HUGEINT * weight) // t.wt
               END AS floor_alloc,
               CASE WHEN t.wt = 0 THEN 0
                    ELSE 1000000::HUGEINT * weight
                         - ((1000000::HUGEINT * weight) // t.wt)
                           * t.wt
               END AS remainder
        FROM w CROSS JOIN t),
    l AS (
        SELECT CASE WHEN MAX(t.wt) = 0 THEN 0
                    ELSE 1000000 - SUM(q.floor_alloc) END AS leftover
        FROM q CROSS JOIN t),
    r AS (
        SELECT lang, weight, floor_alloc,
               ROW_NUMBER() OVER (ORDER BY remainder DESC, lang ASC)
                   AS rk
        FROM q)
    SELECT r.lang, r.weight,
           CAST(r.floor_alloc
                + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM r CROSS JOIN l
"""

# Politeness schedule: per-host lexicographic slots, min-delay with
# NULL→default fallback, offset and makespan arithmetic replayed
# with window functions.
ORACLE_SQL["fetch_schedule_docs"] = """
    WITH f AS (
        SELECT 'h' || (doc_id % 97) || '.example' AS host,
               'https://h' || (doc_id % 97) || '.example/p/' || doc_id
                   AS url,
               CASE CAST(doc_id % 97 AS INT) % 3
                    WHEN 0 THEN NULL WHEN 1 THEN 500
                    ELSE 2000 END AS raw_delay
        FROM documents),
    d AS (
        SELECT host, url,
               CASE WHEN raw_delay IS NOT NULL AND raw_delay >= 0
                    THEN raw_delay ELSE 1000 END AS eff
        FROM f)
    SELECT host, url,
           CAST(MIN(eff) OVER (PARTITION BY host) AS BIGINT)
               AS delay_ms,
           CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY url)
                - 1 AS BIGINT) AS position,
           CAST((ROW_NUMBER() OVER (PARTITION BY host ORDER BY url)
                 - 1) * MIN(eff) OVER (PARTITION BY host) AS BIGINT)
               AS fetch_offset_ms,
           CAST((COUNT(*) OVER (PARTITION BY host) - 1)
                * MIN(eff) OVER (PARTITION BY host) AS BIGINT)
               AS host_makespan_ms
    FROM d
"""
