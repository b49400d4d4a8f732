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


def test_user_daily_dense_parity():
    from wsid_ray.pipelines.sequences import user_daily_dense
    got = _canon(user_daily_dense(SF).to_pandas())
    exp = _canon(_duck("""
        WITH dc AS (SELECT user_id, date_trunc('day', ts) AS day,
                           CAST(count(*) AS BIGINT) AS n_events
                    FROM events GROUP BY 1, 2),
        db AS (SELECT user_id, min(day) d0, max(day) d1 FROM dc
               GROUP BY user_id),
        cal AS (SELECT user_id, unnest(generate_series(d0, d1,
                    INTERVAL 1 DAY)) AS day FROM db)
        SELECT cal.user_id, cal.day, coalesce(dc.n_events, 0) AS n_events
        FROM cal LEFT JOIN dc ON dc.user_id = cal.user_id
                             AND dc.day = cal.day"""))
    got["day"] = got["day"].astype("datetime64[us]")
    exp["day"] = exp["day"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, exp)
    # dense: per user, row count == span in days, no gaps
    g = got.groupby("user_id")["day"]
    span = (g.max() - g.min()).dt.days + 1
    assert (g.size() == span).all()


def test_event_user_skew_invariants():
    from wsid_ray.pipelines.sequences import event_user_skew
    t = event_user_skew(SF).to_pandas().iloc[0]
    raw = _duck("SELECT user_id, count(*) AS n FROM events "
                "GROUP BY user_id")
    assert t["n_users"] == len(raw)
    assert t["n_events"] == raw["n"].sum()
    assert t["max_n"] == raw["n"].max()
    assert t["min_n"] == raw["n"].min()
    assert t["topk_sum"] == raw["n"].sort_values(ascending=False) \
                                    .head(10).sum()
    assert 0 < t["topk_share_micro"] <= 1_000_000
