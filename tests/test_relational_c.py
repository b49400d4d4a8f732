"""Tests for the batch-C relational extensions: correlated-subquery
filter, leave-one-out aggregate, dense-rank ties-kept top-k, grouped
DISTINCT string_agg."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def test_orders_above_cust_avg_parity():
    from wsid_ray.pipelines.relational_ext import orders_above_cust_avg
    got = _canon(orders_above_cust_avg(SF).to_pandas())
    exp = _canon(_duck("""
        WITH c AS (SELECT o_orderkey, o_custkey,
                          CAST(floor(o_totalprice*100+0.5) AS BIGINT)
                              AS price_cents FROM orders),
        t AS (SELECT o_custkey, SUM(price_cents) s,
                     CAST(count(*) AS BIGINT) n FROM c GROUP BY o_custkey)
        SELECT c.o_orderkey, c.o_custkey, c.price_cents
        FROM c JOIN t ON t.o_custkey = c.o_custkey
        WHERE c.price_cents * t.n > t.s"""))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0


def test_lineitem_loo_parity():
    from wsid_ray.pipelines.relational_ext import lineitem_loo_stats
    got = _canon(lineitem_loo_stats(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT l_orderkey, l_linenumber,
               CAST(count(*) OVER w - 1 AS BIGINT) AS loo_n,
               CAST(sum(cents) OVER w - cents AS BIGINT) AS loo_sum_cents
        FROM (SELECT l_orderkey, l_linenumber,
                     CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                         AS cents FROM lineitem)
        WINDOW w AS (PARTITION BY l_orderkey)"""))
    pd.testing.assert_frame_equal(got, exp)
    # single-line orders leave nothing out
    assert ((got["loo_n"] == 0) == (got["loo_sum_cents"] == 0)).all()


def test_status_top_prices_dense_keeps_ties():
    from wsid_ray.pipelines.relational_ext import status_top_prices_dense
    got = _canon(status_top_prices_dense(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT o_orderstatus, o_orderkey, price_cents,
               CAST(drank AS BIGINT) AS drank
        FROM (SELECT o_orderstatus, o_orderkey,
                     CAST(floor(o_totalprice*100+0.5) AS BIGINT)
                         AS price_cents,
                     dense_rank() OVER (PARTITION BY o_orderstatus
                         ORDER BY CAST(floor(o_totalprice*100+0.5)
                                       AS BIGINT) DESC) AS drank
              FROM orders) WHERE drank <= 3"""))
    pd.testing.assert_frame_equal(got, exp)
    # exactly 3 distinct price values per status survive
    k = got.groupby("o_orderstatus")["price_cents"].nunique()
    assert (k <= 3).all()


def test_user_event_types_list_parity():
    from wsid_ray.pipelines.relational_ext import user_event_types_list
    got = _canon(user_event_types_list(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT)
                   AS n_types,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type)
                   AS types
        FROM events GROUP BY user_id"""))
    pd.testing.assert_frame_equal(got, exp)


def test_supplier_part_stats_parity():
    from wsid_ray.pipelines.queries import q_supplier_part_stats
    got = _canon(q_supplier_part_stats(SF).to_pandas())
    con = duckdb.connect()
    for t in ("lineitem", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    exp = _canon(con.sql("""
        WITH sl AS (SELECT l_suppkey AS s_suppkey, l_partkey,
                           CAST(floor(l_extendedprice*100+0.5) AS BIGINT)
                               AS cents FROM lineitem),
        sg AS (SELECT s_suppkey,
                      CAST(count(DISTINCT l_partkey) AS BIGINT) n_parts,
                      CAST(count(*) AS BIGINT) n_lines,
                      CAST(sum(cents) AS BIGINT) revenue_cents
               FROM sl GROUP BY s_suppkey)
        SELECT sg.s_suppkey, su.s_name, sg.n_parts, sg.n_lines,
               sg.revenue_cents
        FROM sg JOIN supplier su ON su.s_suppkey = sg.s_suppkey""").df())
    pd.testing.assert_frame_equal(got, exp)
    assert (got["n_parts"] <= got["n_lines"]).all()


def test_mutual_knn_degree_bounds():
    from wsid_ray.pipelines.queries import q_mutual_knn_degree
    got = q_mutual_knn_degree(SF).to_pandas()
    # degree never exceeds k (a node has at most k outgoing hits)
    assert got["degree"].between(1, 5).all()
    assert (got["n_nodes"] >= 1).all()
