"""Tests for the round-4 extension batch: sequence windows (LAG / path /
argmax), FULL OUTER recon, INTERSECT, CUBE, moment sums, fuzzy pairs,
and entropy."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "orders", "lineitem", "part", "documents",
              "nation", "region", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def test_user_event_gaps_parity():
    from wsid_ray.pipelines.sequences import user_event_gaps
    got = _canon(user_event_gaps(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT event_id, user_id,
               CAST(row_number() OVER win AS BIGINT) AS rn,
               CAST(epoch_us(ts) - epoch_us(lag(ts) OVER win) AS BIGINT)
                   AS gap_us
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)"""))
    got["gap_us"] = got["gap_us"].astype("Int64")
    exp["gap_us"] = exp["gap_us"].astype("Int64")
    pd.testing.assert_frame_equal(got, exp)
    # every user's first event has no gap
    assert got[got["rn"] == 1]["gap_us"].isna().all()


def test_user_event_path_parity():
    from wsid_ray.pipelines.sequences import user_event_path
    got = _canon(user_event_path(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id"""))
    pd.testing.assert_frame_equal(got, exp)


def test_user_top_event_type_parity():
    from wsid_ray.pipelines.sequences import user_top_event_type
    got = _canon(user_top_event_type(SF).to_pandas())
    exp = _canon(_duck("""
        WITH c AS (SELECT user_id, event_type,
                          CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY user_id, event_type),
        r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                  ORDER BY n DESC, event_type) AS rk FROM c)
        SELECT user_id, event_type, n FROM r WHERE rk = 1"""))
    pd.testing.assert_frame_equal(got, exp)


def test_customer_order_event_recon_parity():
    from wsid_ray.pipelines.relational_ext import \
        customer_order_event_recon
    got = _canon(customer_order_event_recon(SF).to_pandas())
    exp = _canon(_duck("""
        WITH o AS (SELECT o_custkey AS k,
                          CAST(count(*) AS BIGINT) AS n_orders,
                          SUM(CAST(floor(o_totalprice*100+0.5) AS BIGINT))
                              AS order_cents
                   FROM orders GROUP BY o_custkey),
        e AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n_events,
                     SUM(CAST(floor(value*100+0.5) AS BIGINT))
                         AS event_cents
              FROM events GROUP BY user_id)
        SELECT COALESCE(o.k, e.k) AS k,
               COALESCE(o.n_orders, 0) AS n_orders,
               CAST(COALESCE(o.order_cents, 0) AS BIGINT) AS order_cents,
               COALESCE(e.n_events, 0) AS n_events,
               CAST(COALESCE(e.event_cents, 0) AS BIGINT) AS event_cents
        FROM o FULL OUTER JOIN e ON o.k = e.k"""))
    pd.testing.assert_frame_equal(got, exp)
    # the outer join is genuinely exercised in both directions
    assert (got["n_events"] == 0).any() or (got["n_orders"] == 0).any()


def test_repeat_buyers_parity():
    from wsid_ray.pipelines.relational_ext import repeat_buyers
    got = _canon(repeat_buyers(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996"""))
    pd.testing.assert_frame_equal(got, exp)


def test_orders_cube_parity():
    from wsid_ray.pipelines.relational_ext import orders_cube
    got = _canon(orders_cube(SF).to_pandas())
    exp = _canon(_duck("""
        WITH c AS (SELECT o_orderstatus,
                          CAST(year(o_orderdate) AS BIGINT) AS o_year,
                          CAST(floor(o_totalprice*100+0.5) AS BIGINT)
                              AS cents
                   FROM orders)
        SELECT o_orderstatus, o_year, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               CAST(GROUPING(o_orderstatus, o_year) AS BIGINT) AS lvl
        FROM c GROUP BY CUBE (o_orderstatus, o_year)"""))
    got["o_orderstatus"] = got["o_orderstatus"].astype(object)
    exp["o_orderstatus"] = exp["o_orderstatus"].astype(object)
    got["o_year"] = got["o_year"].astype("Int64")
    exp["o_year"] = exp["o_year"].astype("Int64")
    pd.testing.assert_frame_equal(got, exp)
    assert set(got["lvl"].unique()) == {0, 1, 2, 3}


def test_lineitem_moments_parity_and_corr_range():
    from wsid_ray.pipelines.relational_ext import lineitem_moments
    got = lineitem_moments(SF).to_pandas() \
        .sort_values("l_returnflag", ignore_index=True)
    exp = _duck("""
        WITH q AS (SELECT l_returnflag,
                          CAST(floor(l_quantity+0.5) AS BIGINT) AS x,
                          CAST(floor(l_extendedprice+0.5) AS BIGINT) AS y
                   FROM lineitem),
        m AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
                     SUM(CAST(x AS HUGEINT)) AS sx,
                     SUM(CAST(y AS HUGEINT)) AS sy,
                     SUM(CAST(x AS HUGEINT)*x) AS sxx,
                     SUM(CAST(y AS HUGEINT)*y) AS syy,
                     SUM(CAST(x AS HUGEINT)*y) AS sxy
              FROM q GROUP BY l_returnflag),
        d AS (SELECT *, n*sxx - sx*sx AS d1, n*syy - sy*sy AS d2,
                     n*sxy - sx*sy AS num FROM m)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n,
               CAST(sx AS BIGINT) AS sum_qty,
               CAST(sy AS BIGINT) AS sum_price_d,
               CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
               CAST(sxy AS DOUBLE) AS sxy,
               CASE WHEN d1 = 0 OR d2 = 0 THEN NULL
                    ELSE floor(CAST(num AS DOUBLE)
                               / sqrt(CAST(d1 AS DOUBLE)
                                      * CAST(d2 AS DOUBLE))
                               * 1e6 + 0.5) / 1e6 END AS corr6
        FROM d ORDER BY l_returnflag""")
    pd.testing.assert_frame_equal(got, exp)
    assert got["corr6"].abs().max() <= 1.0


def test_moments_combine_exact_past_int64():
    # cross-block combination must be exact where numpy int64 would
    # overflow: two partial rows whose syy sum exceeds int64 max
    from wsid_ray.pipelines.relational_ext import lineitem_moments  # noqa: F401
    big = 7 * 10**18  # ~0.76 * int64 max
    df = pd.DataFrame({
        "l_returnflag": ["A", "A"], "n": [1, 1],
        "sum_qty": [1, 2], "sum_price_d": [3, 4],
        "sxx": [big, big], "syy": [big, big], "sxy": [big, big]})
    # reproduce the combine contract inline (python-int accumulation)
    sxx = sum(int(v) for v in df["sxx"])
    assert sxx == 2 * big  # would wrap negative under int64
    assert float(sxx) == float(2 * big)


def test_lev_le1_and_blocking_recall():
    from wsid_ray.stages.fuzzy import _deletion_keys, _lev_le1
    # exact verify truth table
    assert _lev_le1("ring", "rings")       # insertion
    assert _lev_le1("rings", "ring")       # deletion
    assert _lev_le1("ring", "rung")        # substitution
    assert not _lev_le1("ab", "ba")        # distance 2 (swap)
    assert not _lev_le1("ring", "ringss")  # distance 2 (double insert)
    # blocking recall: every lev<=1 pair shares a deletion key
    vocab = ["small", "smalll", "smal", "smell", "ring", "rung",
             "blue", "bolt"]
    keys = _deletion_keys(pd.Series(vocab))
    by_name = keys.groupby("name")["key"].apply(set)
    for a in vocab:
        for b in vocab:
            if a < b and _lev_le1(a, b):
                assert by_name[a] & by_name[b], (a, b)


def test_fuzzy_pairs_lev1_small():
    import ray.data as rd

    from wsid_ray.stages.fuzzy import fuzzy_pairs_lev1
    names = ["small ring", "small rings", "small ring", "blue bolt",
             "blue colt", "red widget", "lone name"]
    ds = rd.from_pandas(pd.DataFrame({"p_name": names}))
    out = fuzzy_pairs_lev1(ds, "p_name", num_buckets=4).to_pandas()
    got = set(zip(out["name_a"], out["name_b"]))
    assert got == {("small ring", "small rings"),
                   ("blue bolt", "blue colt")}


def test_lapsed_buyers_parity():
    from wsid_ray.pipelines.relational_ext import lapsed_buyers
    got = _canon(lapsed_buyers(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996"""))
    pd.testing.assert_frame_equal(got, exp)


def test_nation_region_cross_parity():
    from wsid_ray.pipelines.relational_ext import nation_region_cross
    got = _canon(nation_region_cross(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT a.n_name, b.r_name FROM
            (SELECT n_name FROM read_parquet(
                '/root/testdata/sf0.001/nation.parquet')) a
        CROSS JOIN
            (SELECT r_name FROM read_parquet(
                '/root/testdata/sf0.001/region.parquet')) b"""))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == len(_duck("SELECT * FROM nation")) \
        * len(_duck("SELECT * FROM region"))


def test_order_price_rank_parity():
    from wsid_ray.pipelines.analytics import order_price_rank
    got = _canon(order_price_rank(SF).to_pandas())
    exp = _canon(_duck("""
        WITH c AS (SELECT o_orderkey, o_orderstatus,
                          CAST(floor(o_totalprice*100+0.5) AS BIGINT)
                              AS cents
                   FROM orders),
        w AS (SELECT o_orderkey, o_orderstatus,
                     CAST(row_number() OVER (PARTITION BY o_orderstatus
                         ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
                     CAST(rank() OVER (PARTITION BY o_orderstatus
                         ORDER BY cents) AS BIGINT) AS rnk,
                     CAST(count(*) OVER (PARTITION BY o_orderstatus)
                         AS BIGINT) AS nn
              FROM c)
        SELECT o_orderkey, o_orderstatus, rn, rnk,
               CASE WHEN nn = 1 THEN NULL
                    ELSE floor(CAST(rnk-1 AS DOUBLE)/(nn-1)*1e6+0.5)/1e6
               END AS pct6
        FROM w"""))
    pd.testing.assert_frame_equal(got, exp)


def test_order_price_rank_tiny_bins_skewed():
    # tiny bins force every partition across MANY (status, bin) groups;
    # result must stay identical to the single-window SQL
    from wsid_ray.pipelines.analytics import order_price_rank
    a = _canon(order_price_rank(SF).to_pandas())
    b = _canon(order_price_rank(SF, bin_cents=1_000).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_lineitem_price_zscore_parity():
    from wsid_ray.pipelines.relational_ext import lineitem_price_zscore
    got = _canon(lineitem_price_zscore(SF).to_pandas())
    exp = _canon(_duck("""
        WITH q AS (SELECT l_orderkey, l_linenumber, l_returnflag,
                          CAST(floor(l_extendedprice+0.5) AS BIGINT) AS y
                   FROM lineitem),
        m AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
                     SUM(CAST(y AS HUGEINT)) AS sy,
                     SUM(CAST(y AS HUGEINT)*y) AS syy
              FROM q GROUP BY l_returnflag),
        d AS (SELECT l_returnflag, n, sy, n*syy - sy*sy AS den FROM m)
        SELECT q.l_orderkey, q.l_linenumber,
               CASE WHEN d.den <= 0 THEN NULL
                    ELSE floor(CAST(d.n*q.y - d.sy AS DOUBLE)
                               / sqrt(CAST(d.den AS DOUBLE))
                               * 1e6 + 0.5) / 1e6 END AS z6
        FROM q JOIN d USING (l_returnflag)"""))
    pd.testing.assert_frame_equal(got, exp)
    # standardised column: near-zero mean, near-unit spread
    assert abs(got["z6"].mean()) < 0.05
    assert 0.8 < got["z6"].std() < 1.2


def test_session_conversions_parity():
    from wsid_ray.stages.sessions import session_conversions
    import ray.data as rd
    from wsid_ray.sources.pqclean import read_parquet_clean
    ev = read_parquet_clean(f"{SF}/events.parquet",
                            columns=["user_id", "ts", "event_id",
                                     "event_type"])
    got = _canon(session_conversions(ev).to_pandas())
    exp = _canon(_duck("""
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
            SELECT user_id, event_type,
                   sum(new_s) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) - 1 AS sid,
                   row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS pos
            FROM flagged
        ), agg AS (
            SELECT user_id, sid,
                   min(CASE WHEN event_type='view' THEN pos END) AS vpos,
                   max(CASE WHEN event_type='purchase' THEN pos END)
                       AS ppos
            FROM sess GROUP BY user_id, sid
        )
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN vpos IS NOT NULL AND ppos IS NOT NULL
                             AND vpos < ppos THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_converted
        FROM agg GROUP BY user_id"""))
    pd.testing.assert_frame_equal(got, exp)
    assert (got["n_converted"] <= got["n_sessions"]).all()


def test_session_conversions_hand_case():
    # one user: view -> purchase in session 1 (converted); purchase ->
    # view in session 2 (wrong order, not converted)
    import ray.data as rd

    from wsid_ray.stages.sessions import session_conversions
    ts = pd.to_datetime([
        "2025-01-01 10:00", "2025-01-01 10:05",     # s0: view, purchase
        "2025-01-01 12:00", "2025-01-01 12:05",     # s1: purchase, view
    ]).astype("datetime64[us]")
    df = pd.DataFrame({
        "user_id": [7, 7, 7, 7],
        "ts": ts,
        "event_id": [1, 2, 3, 4],
        "event_type": ["view", "purchase", "purchase", "view"]})
    out = session_conversions(rd.from_pandas(df), num_buckets=2) \
        .to_pandas()
    assert out.iloc[0].tolist() == [7, 2, 1]


def test_embedding_quantize_stats_parity():
    from wsid_ray.stages.knn import quantize_stats, read_embeddings
    got = _canon(quantize_stats(read_embeddings(SF)).to_pandas())
    exp = _canon(_duck(f"""
        WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
                   FROM read_parquet('{SF}/embeddings.parquet')),
        m AS (SELECT vec_id, min(x) AS vmin, max(x) AS vmax,
                     CAST(count(*) AS BIGINT) AS n_dims
              FROM e GROUP BY vec_id),
        c AS (SELECT e.vec_id,
                     CAST(floor((e.x - m.vmin)/(m.vmax - m.vmin)*255+0.5)
                          AS BIGINT) AS code
              FROM e JOIN m USING (vec_id) WHERE m.vmax > m.vmin),
        s AS (SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum
              FROM c GROUP BY vec_id)
        SELECT s.vec_id, m.n_dims, s.code_sum,
               floor(m.vmin*1e6+0.5)/1e6 AS vmin6,
               floor(m.vmax*1e6+0.5)/1e6 AS vmax6
        FROM s JOIN m USING (vec_id)"""))
    pd.testing.assert_frame_equal(got, exp)
    # codes live in 0..255: sum bounded by 255 * dims
    assert (got["code_sum"] <= 255 * got["n_dims"]).all()
    assert (got["code_sum"] >= 0).all()


def test_order_next_event_parity():
    from wsid_ray.pipelines.analytics import order_next_event
    got = _canon(order_next_event(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT o_orderkey, event_id FROM (
            SELECT o.o_orderkey, e.event_id,
                   row_number() OVER (PARTITION BY o.o_orderkey
                       ORDER BY e.ts ASC, e.event_id ASC) AS rn
            FROM orders o JOIN events e
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ) WHERE rn = 1"""))
    assert len(got) > 0  # the forward direction genuinely matches
    pd.testing.assert_frame_equal(got, exp)


def test_all_actor_keys_parity():
    from wsid_ray.pipelines.queries import q_all_actor_keys
    got = _canon(q_all_actor_keys(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT o_custkey AS k FROM orders
        UNION SELECT user_id FROM events"""))
    pd.testing.assert_frame_equal(got, exp)


def test_region_revenue_parity():
    from wsid_ray.pipelines.relational_ext import region_revenue
    got = _canon(region_revenue(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT r_name, CAST(count(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(floor(l_extendedprice*100+0.5) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM lineitem
        JOIN orders   ON l_orderkey  = o_orderkey
        JOIN customer ON o_custkey   = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name"""))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == 5  # every region reached through the 4-hop chain


def test_lang_top_tokens_parity():
    from wsid_ray.pipelines.queries import q_lang_top_tokens
    got = _canon(q_lang_top_tokens(SF).to_pandas())
    exp = _canon(_duck(r"""
        WITH w AS (SELECT lang,
                          unnest(list_filter(
                              regexp_split_to_array(text, '\s+'),
                              x -> x <> '')) AS tok
                   FROM documents),
        c AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
              FROM w GROUP BY lang, tok),
        r AS (SELECT *, row_number() OVER (PARTITION BY lang
                  ORDER BY n DESC, tok) AS rk FROM c)
        SELECT lang, tok, n, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 3"""))
    pd.testing.assert_frame_equal(got, exp)
    assert (got.groupby("lang")["rk"].max() <= 3).all()


def test_knn_quantized_topk_parity():
    from wsid_ray.pipelines.queries import q_knn_quantized_topk
    got = _canon(q_knn_quantized_topk(SF).to_pandas())
    exp = _canon(_duck(f"""
        WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                          generate_subscripts(embedding, 1) AS i
                   FROM read_parquet('{SF}/embeddings.parquet')),
        m AS (SELECT vec_id, min(x) AS vmin, max(x) AS vmax
              FROM e GROUP BY vec_id),
        dqv AS (SELECT e.vec_id, e.i,
                       m.vmin + floor((e.x - m.vmin)/(m.vmax - m.vmin)
                                      *255 + 0.5)/255*(m.vmax - m.vmin)
                           AS v
                FROM e JOIN m USING (vec_id) WHERE m.vmax > m.vmin),
        vecs AS (SELECT vec_id, array_agg(v ORDER BY i) AS embedding
                 FROM dqv GROUP BY vec_id)
        SELECT query_id, vec_id, score FROM (
            SELECT q.vec_id AS query_id, e2.vec_id AS vec_id,
                   round(list_cosine_similarity(e2.embedding,
                                                q.embedding), 6) AS score,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(e2.embedding,
                                                       q.embedding) DESC,
                           e2.vec_id) AS rk
            FROM vecs e2
            CROSS JOIN (SELECT vec_id, embedding FROM vecs
                        WHERE vec_id < 5) q
            WHERE e2.vec_id <> q.vec_id)
        WHERE rk <= 10"""))
    pd.testing.assert_frame_equal(got, exp)


def test_dequantize_round_trip_changes_values():
    # the round trip must be lossy-but-bounded: not identity (codes are
    # 8-bit), error <= half a quantisation step per dim
    import numpy as np
    import pyarrow.parquet as pq

    from wsid_ray.stages.knn import dequantize_batch
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    out = dequantize_batch(t)
    raw = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    dq = np.array(out["embedding"].to_pylist(), dtype=np.float64)
    assert dq.shape == raw.shape
    err = np.abs(dq - raw)
    span = raw.max(axis=1) - raw.min(axis=1)
    assert (err.max(axis=1) <= span / 255 / 2 + 1e-12).all()
    assert err.max() > 0  # genuinely quantised, not a copy


def test_pagerank_micro_matches_sequential_reference():
    import ray.data as rd

    from wsid_ray.stages.pagerank import MICRO, pagerank_micro

    # two term graphs: a 4-node path and a 3-node triangle
    edges = pd.DataFrame({
        "term": ["a", "a", "a", "b", "b", "b"],
        "w":    ["n1", "n2", "n3", "x", "x", "y"],
        "v":    ["n2", "n3", "n4", "y", "z", "z"]})
    got = pagerank_micro(rd.from_pandas(edges), rounds=5,
                         num_buckets=2).to_pandas()
    got = {(r.term, r.node): r.rank_micro for r in got.itertuples()}

    # sequential reference of the exact integer contract
    for term, g in edges.groupby("term"):
        adj: dict = {}
        for _, e in g.iterrows():
            adj.setdefault(e["w"], set()).add(e["v"])
            adj.setdefault(e["v"], set()).add(e["w"])
        n = len(adj)
        r = {u: MICRO // n for u in adj}
        for _ in range(5):
            c = {u: r[u] // len(adj[u]) for u in adj}
            s = {x: sum(c[u] for u in adj[x]) for x in adj}
            r = {x: (15 * MICRO) // (100 * n) + (85 * s[x]) // 100
                 for x in adj}
        for u, want in r.items():
            assert got[(term, u)] == want, (term, u, got[(term, u)], want)
    # rank mass stays ~1.0 per graph (integer floors leak < n micro each
    # round)
    tot_a = sum(v for (t, _), v in got.items() if t == "a")
    assert 0.9 * MICRO < tot_a <= MICRO + 5


def test_weighted_pagerank_matches_sequential_reference():
    import ray.data as rd

    from wsid_ray.stages.pagerank import MICRO, pagerank_micro

    edges = pd.DataFrame({
        "term": ["a", "a", "a"],
        "w": ["n1", "n1", "n2"],
        "v": ["n2", "n3", "n3"],
        "wq": [900_000, 100_000, 500_000]})
    got = pagerank_micro(rd.from_pandas(edges), rounds=4,
                         num_buckets=2, weight_col="wq").to_pandas()
    got = {r.node: r.rank_micro for r in got.itertuples()}

    adj = {"n1": {"n2": 900_000, "n3": 100_000},
           "n2": {"n1": 900_000, "n3": 500_000},
           "n3": {"n1": 100_000, "n2": 500_000}}
    n = 3
    r = {u: MICRO // n for u in adj}
    for _ in range(4):
        W = {u: sum(adj[u].values()) for u in adj}
        s = {x: sum((r[u] * adj[u][x]) // W[u] for u in adj
                    if x in adj[u]) for x in adj}
        r = {x: (15 * MICRO) // (100 * n) + (85 * s[x]) // 100
             for x in adj}
    for u, want in r.items():
        assert got[u] == want, (u, got[u], want)
    # the heavy n1<->n2 edge concentrates rank away from n3
    assert got["n3"] < got["n1"] and got["n3"] < got["n2"]


def test_triangle_stats_hand_case():
    import ray.data as rd

    from wsid_ray.stages.pagerank import triangle_stats

    # term "a": K4 on n1..n4 (4 triangles, 12 wedges, gcc=1);
    # term "b": a path x-y-z (0 triangles, 1 wedge, gcc=0);
    # term "c": single edge (no wedge -> NULL gcc)
    k4 = [("n1", "n2"), ("n1", "n3"), ("n1", "n4"),
          ("n2", "n3"), ("n2", "n4"), ("n3", "n4")]
    edges = pd.DataFrame(
        [("a", w, v) for w, v in k4]
        + [("b", "x", "y"), ("b", "y", "z")]
        + [("c", "p", "q")],
        columns=["term", "w", "v"])
    out = triangle_stats(rd.from_pandas(edges), num_buckets=2) \
        .to_pandas().set_index("term")
    assert out.loc["a", "n_triangles"] == 4
    assert out.loc["a", "n_wedges"] == 12
    assert out.loc["a", "gcc_micro"] == 1_000_000
    assert out.loc["b", "n_triangles"] == 0
    assert out.loc["b", "n_wedges"] == 1
    assert out.loc["b", "gcc_micro"] == 0
    assert out.loc["c", "n_wedges"] == 0
    assert pd.isna(out.loc["c", "gcc_micro"])


def test_user_activity_deciles_parity():
    from wsid_ray.pipelines.analytics import user_activity_deciles
    got = _canon(user_activity_deciles(SF).to_pandas())
    exp = _canon(_duck("""
        WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY user_id)
        SELECT user_id, n,
               CAST(ntile(10) OVER (ORDER BY n, user_id) AS BIGINT)
                   AS decile
        FROM c"""))
    pd.testing.assert_frame_equal(got, exp)
    # tiny bins must give the identical answer (two-pass exactness)
    got2 = _canon(user_activity_deciles(SF, bin_width=1).to_pandas())
    pd.testing.assert_frame_equal(got2, exp)


def test_status_priciest_order_parity():
    from wsid_ray.pipelines.queries import q_status_priciest_order
    got = _canon(q_status_priciest_order(SF).to_pandas())
    exp = _canon(_duck("""
        WITH c AS (SELECT o_orderstatus, o_orderkey,
                          CAST(floor(o_totalprice*100+0.5) AS BIGINT)
                              AS max_cents
                   FROM orders),
        r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                  ORDER BY max_cents DESC, o_orderkey) AS rk FROM c)
        SELECT o_orderstatus, o_orderkey, max_cents FROM r WHERE rk = 1"""))
    pd.testing.assert_frame_equal(got, exp)


def test_user_event_neighbors_parity():
    from wsid_ray.pipelines.sequences import user_event_neighbors
    got = _canon(user_event_neighbors(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT event_id, user_id,
               lag(event_id) OVER win AS prev_event_id,
               lead(event_id) OVER win AS next_event_id
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)"""))
    for c in ("prev_event_id", "next_event_id"):
        got[c] = got[c].astype("Int64")
        exp[c] = exp[c].astype("Int64")
    pd.testing.assert_frame_equal(got, exp)


def test_lineitem_cube3_parity():
    from wsid_ray.pipelines.relational_ext import lineitem_cube3
    got = _canon(lineitem_cube3(SF).to_pandas())
    exp = _canon(_duck("""
        WITH c AS (SELECT l_returnflag, l_linestatus,
                          CAST(year(l_shipdate) AS BIGINT) AS ship_year,
                          CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                              AS cents
                   FROM lineitem)
        SELECT l_returnflag, l_linestatus, ship_year,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               CAST(GROUPING(l_returnflag, l_linestatus, ship_year)
                    AS BIGINT) AS lvl
        FROM c GROUP BY CUBE (l_returnflag, l_linestatus, ship_year)"""))
    for c in ("l_returnflag", "l_linestatus"):
        got[c] = got[c].astype(object)
        exp[c] = exp[c].astype(object)
    got["ship_year"] = got["ship_year"].astype("Int64")
    exp["ship_year"] = exp["ship_year"].astype("Int64")
    pd.testing.assert_frame_equal(got, exp)
    assert sorted(got["lvl"].unique()) == list(range(8))


def test_entropy_batch_hand_values():
    from wsid_ray.stages.textstats import entropy_batch
    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": ["a a b", "x x x x", ""]})
    out = entropy_batch(t).to_pandas()
    # doc 3 has zero tokens -> dropped
    assert list(out["doc_id"]) == [1, 2]
    # doc 1: n=3, S = floor(2*ln(2)*1e6+0.5); H = floor(ln3*1e6+.5)-S//3
    s = int(np.floor((2 * np.log(2.0)) * 1e6 + 0.5))
    h1 = int(np.floor(np.log(3.0) * 1e6 + 0.5)) - s // 3
    assert out.iloc[0]["n_tokens"] == 3 and out.iloc[0]["ent_micro"] == h1
    # doc 2: single repeated token -> S = 4*ln4 quantised, H ~ 0
    s2 = int(np.floor((4 * np.log(4.0)) * 1e6 + 0.5))
    h2 = int(np.floor(np.log(4.0) * 1e6 + 0.5)) - s2 // 4
    assert out.iloc[1]["ent_micro"] == h2
    assert abs(h2) <= 1  # uniform-degenerate doc: entropy ~ 0 micro-nats
