"""Winsorized aggregate, Pareto skyline, market-basket brand pairs."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("orders", "lineitem", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def test_winsorized_parity_and_bounds():
    import __ray_entry__ as E
    from wsid_ray.pipelines.analytics import lineitem_winsorized
    got = _canon(lineitem_winsorized(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["lineitem_winsorized"]))
    pd.testing.assert_frame_equal(got, exp)
    assert (got["lo_cents"] <= got["hi_cents"]).all()
    assert (got["sum_wins_cents"] >= got["n"] * got["lo_cents"]).all()
    assert (got["sum_wins_cents"] <= got["n"] * got["hi_cents"]).all()


def test_skyline_parity_and_dominance_definition():
    """Engine vs the window-form mirror AND vs the raw NOT EXISTS
    dominance definition — two independent derivations of the same
    frontier."""
    import __ray_entry__ as E
    from wsid_ray.pipelines.relational_ext import orders_skyline
    got = _canon(orders_skyline(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["orders_skyline"]))
    pd.testing.assert_frame_equal(got, exp)
    dom = _canon(_duck("""
        WITH c AS (SELECT o_orderkey,
                          CAST(floor(o_totalprice * 100 + 0.5)
                               AS BIGINT) AS cents,
                          CAST(epoch_us(o_orderdate) // 86400000000
                               AS BIGINT) AS d
                   FROM orders)
        SELECT a.* FROM c a
        WHERE NOT EXISTS (
            SELECT 1 FROM c b
            WHERE b.cents >= a.cents AND b.d >= a.d
              AND (b.cents > a.cents OR b.d > a.d))"""))
    pd.testing.assert_frame_equal(got, dom)
    assert len(got) >= 1


def test_brand_pairs_parity():
    import __ray_entry__ as E
    from wsid_ray.pipelines.relational_ext import order_brand_pairs
    got = _canon(order_brand_pairs(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["order_brand_pairs"]))
    pd.testing.assert_frame_equal(got, exp)
    assert (got["brand_a"] < got["brand_b"]).all()
    assert (got["n_orders"] >= 1).all()
