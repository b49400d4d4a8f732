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
    for t in ("events", "orders", "lineitem", "part", "documents"):
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
