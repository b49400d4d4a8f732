"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in wsid_ray) calls ray.init()/ray.shutdown().

The primary input table — `transcripts` (BASELINE.json:15) — does not
exist in /root/testdata, so it is synthesised deterministically per scale
by wsid_ray.fixtures (seed=42, closed vocab; FIXTURES.md F1) under
/tmp/wsid_ray_data.  SQL-checked transcript queries point DuckDB at the
same generated parquet via read_parquet('<path>/*.parquet'); calling
``queries()`` / ``oracle_sql()`` triggers (idempotent, atomic) generation
so both sides always see identical bytes.

Non-SQL-expressible stages (Chinese-Whispers induction, union-find
canonicalisation, minhash, simhash, langid) are registered without oracle
SQL → rows-only checks; their semantics are verified against the
sequential reference-style oracle in tests/test_flagship.py (P/R gate).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG pipeline on sf0.001-scale transcripts -> triples."""
    from wsid_ray.runtime import configure
    from wsid_ray.pipelines.flagship import flagship_triples
    configure()
    return flagship_triples("sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from wsid_ray.runtime import configure
    from wsid_ray.fixtures import generate
    from wsid_ray.pipelines.queries import QUERIES
    configure()
    generate("sf0.01")   # make sure the SQL side's parquet exists
    return dict(QUERIES)


def _sql_token_expr(col: str = "text") -> str:
    """DuckDB mirror of wsid_ray.stages.tokenize.tokenize_column."""
    from wsid_ray.config import MIN_TOKEN_LEN, STOPWORDS
    stop = ", ".join(f"'{s}'" for s in sorted(STOPWORDS))
    return (f"list_filter(regexp_split_to_array(lower({col}), "
            f"'[^a-z0-9_]+'), t -> length(t) >= {MIN_TOKEN_LEN} "
            f"AND t NOT IN ({stop}))")


def oracle_sql() -> dict[str, str]:
    from wsid_ray.config import GAZETTEER, STOPWORDS
    from wsid_ray.fixtures import generate, transcripts_dir

    generate("sf0.01")
    tr = f"read_parquet('{transcripts_dir('sf0.01')}/*.parquet')"
    tok = _sql_token_expr()
    gaz = ", ".join(f"'{g}'" for g in sorted(GAZETTEER))
    stop = ", ".join(f"'{s}'" for s in sorted(STOPWORDS))

    return {
        "turn_counts": f"""
            SELECT conv_id, count(*) AS n_turns,
                   max(turn_idx) AS max_turn_idx
            FROM {tr} GROUP BY conv_id
        """,
        "role_counts": f"""
            SELECT role, count(*) AS n FROM {tr} GROUP BY role
        """,
        "unigram_counts": f"""
            SELECT tok.token AS token, count(*) AS n
            FROM (SELECT unnest({tok}) AS token FROM {tr}) tok
            GROUP BY tok.token
        """,
        "mention_counts": f"""
            SELECT tok.term AS term, count(*) AS n
            FROM (SELECT unnest({tok}) AS term FROM {tr}) tok
            WHERE tok.term IN ({gaz})
            GROUP BY tok.term
        """,
        "conv_text_digest": f"""
            SELECT conv_id,
                   md5(string_agg(md5(text), '' ORDER BY turn_idx)) AS digest
            FROM {tr} GROUP BY conv_id
        """,
        "orders_by_status": """
            SELECT o_orderstatus, count(*) AS n FROM orders
            GROUP BY o_orderstatus
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sum_base_cents,
                   CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100
                       + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT c.c_custkey, c.c_name, r.revenue_cents
            FROM (SELECT o_custkey,
                         CAST(sum(CAST(floor(o_totalprice*100 + 0.5)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
                  FROM orders GROUP BY o_custkey) r
            JOIN customer c ON c.c_custkey = r.o_custkey
            ORDER BY r.revenue_cents DESC, c.c_custkey
            LIMIT 10
        """,
        "segment_revenue": """
            SELECT c.c_mktsegment,
                   CAST(sum(CAST(floor(o.o_totalprice*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS revenue_cents,
                   count(*) AS n_orders
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   count(*) AS n,
                   CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT))
                       AS BIGINT) AS sum_value_cents
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "top_orders_per_status": """
            SELECT o_orderstatus, o_orderkey,
                   CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)
                       AS price_cents
            FROM orders
            QUALIFY row_number() OVER (
                PARTITION BY o_orderstatus
                ORDER BY floor(o_totalprice*100 + 0.5) DESC, o_orderkey)
                <= 3
        """,
        "user_sessions": """
            WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id, ts, event_id,
                       sum(new_s) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
                FROM flagged
            )
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   count(*) AS n_events, min(ts) AS start_ts,
                   max(ts) AS end_ts
            FROM sess GROUP BY user_id, session_idx
        """,
        "doc_token_counts": r"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\s+'),
                       w -> w <> '')) AS n_ws_tokens,
                   len(regexp_extract_all(text,
                       '[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]')) AS n_bpe_tokens
            FROM documents
        """,
        "doc_quality": rf"""
            SELECT doc_id, length(text) AS n_chars,
              coalesce(round(length(regexp_replace(text, '[^a-zA-Z]', '',
                  'g')) * 1.0 / NULLIF(length(text), 0), 6), 0.0)
                  AS alpha_ratio,
              coalesce(round(len(list_filter(list_filter(
                  regexp_split_to_array(text, '\s+'), w -> w <> ''),
                  w -> lower(w) IN ({stop}))) * 1.0
                  / NULLIF(len(list_filter(regexp_split_to_array(text,
                  '\s+'), w -> w <> '')), 0), 6), 0.0) AS stop_ratio,
              coalesce(round(list_aggregate(list_transform(list_filter(
                  regexp_split_to_array(text, '\s+'), w -> w <> ''),
                  w -> length(w)), 'sum') * 1.0
                  / NULLIF(len(list_filter(regexp_split_to_array(text,
                  '\s+'), w -> w <> '')), 0), 6), 0.0) AS avg_token_len
            FROM documents
        """,
        "doc_fingerprint": f"""
            SELECT doc_id,
                   md5(array_to_string({tok}, ' ')) AS fingerprint
            FROM documents
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS score
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                  > 0.4
        """,
        "knn_cosine_topk": """
            SELECT query_id, vec_id, score FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                       round(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]),
                           CAST(q.embedding AS DOUBLE[])), 6) AS score,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(e.embedding AS DOUBLE[]),
                               CAST(q.embedding AS DOUBLE[])) DESC,
                               e.vec_id) AS rk
                FROM embeddings e
                CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                            WHERE vec_id < 5) q
                WHERE e.vec_id <> q.vec_id)
            WHERE rk <= 10
        """,
    }
