"""Tests for the ordered-window batch B: conditional fill-forward
(time since last purchase) and the trailing ROWS-frame sliding sum."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def test_user_purchase_carry_parity():
    from wsid_ray.pipelines.sequences import user_purchase_carry
    got = _canon(user_purchase_carry(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT event_id, user_id,
               max(epoch_us(ts)) FILTER (event_type = 'purchase')
                   OVER win AS last_purchase_us,
               epoch_us(ts)
               - max(epoch_us(ts)) FILTER (event_type = 'purchase')
                     OVER win AS since_us
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING)"""))
    for c in ("last_purchase_us", "since_us"):
        got[c] = got[c].astype("Int64")
        exp[c] = exp[c].astype("Int64")
    pd.testing.assert_frame_equal(got, exp)
    # a purchase event carries its own timestamp: since_us == 0 there
    ev = _duck("SELECT event_id FROM events WHERE event_type='purchase'")
    purch = got[got["event_id"].isin(ev["event_id"])]
    assert (purch["since_us"] == 0).all() and len(purch) > 0
    # rows before a user's first purchase are NULL on both columns
    assert got["last_purchase_us"].isna().equals(got["since_us"].isna())


def test_customer_rolling_orders_parity():
    from wsid_ray.pipelines.sequences import customer_rolling_orders
    got = _canon(customer_rolling_orders(SF).to_pandas())
    exp = _canon(_duck("""
        SELECT o_orderkey, o_custkey,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    OVER win AS BIGINT) AS win_cents,
               CAST(count(*) OVER win AS BIGINT) AS win_n
        FROM orders
        WINDOW win AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""))
    pd.testing.assert_frame_equal(got, exp)
    assert got["win_n"].between(1, 7).all()


def test_rolling_window_width_param():
    # window=1 degenerates to the row's own value — pins the frame math
    from wsid_ray.pipelines.analytics import _cents
    from wsid_ray.pipelines.sequences import customer_rolling_orders
    got = customer_rolling_orders(SF, window=1).to_pandas()
    raw = _duck("SELECT o_orderkey, o_totalprice FROM orders")
    m = got.merge(raw, on="o_orderkey")
    assert (m["win_cents"].to_numpy()
            == _cents(m["o_totalprice"].to_numpy())).all()
    assert (got["win_n"] == 1).all()
