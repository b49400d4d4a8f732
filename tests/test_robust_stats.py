"""Grouped median/MAD order statistics + deterministic weighted
priority sampling (pipelines/analytics.lineitem_mad /
orders_weighted_sample)."""

import hashlib

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def _duck(sql: str, tables=("lineitem", "orders")) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in tables:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
        return con.sql(sql).df()
    finally:
        con.close()


def test_mad_parity_and_definition():
    import __ray_entry__ as E
    from wsid_ray.pipelines.analytics import lineitem_mad
    got = _canon(lineitem_mad(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["lineitem_mad"]))
    pd.testing.assert_frame_equal(got, exp)
    # cross-check one group against a direct driver computation
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_returnflag", "l_extendedprice"])
    cents = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5) \
        .astype("int64")
    for _, row in got.iterrows():
        c = np.sort(cents[li["l_returnflag"].to_numpy()
                          == row["l_returnflag"]])
        n = len(c)
        med = c[(n * 50 + 99) // 100 - 1]
        assert row["median_cents"] == med and row["n"] == n
        dev = np.sort(np.abs(c - med))
        assert row["mad_cents"] == dev[(n * 50 + 99) // 100 - 1]


def test_weighted_sample_parity_and_weight_bias():
    import __ray_entry__ as E
    from wsid_ray.pipelines.analytics import orders_weighted_sample
    got = orders_weighted_sample(SF).to_pandas()
    exp = _duck(E.oracle_sql()["orders_weighted_sample"])
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    assert len(got) == 100
    # priority recomputes from the shared integer contract
    for _, r in got.head(20).iterrows():
        h = int.from_bytes(
            hashlib.md5(str(int(r["o_orderkey"])).encode()).digest()[:8],
            "little") >> 34
        assert r["priority"] == (h * 1_000_000) // int(r["w_cents"])
    # weighted bias: sampled orders skew pricier than the population
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_totalprice"])
    assert got["w_cents"].mean() > orders["o_totalprice"].mean() * 100


def test_percentile_cont_parity_and_semantics():
    import __ray_entry__ as E
    from wsid_ray.pipelines.analytics import order_price_percentile_cont
    got = _canon(order_price_percentile_cont(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["order_price_percentile_cont"]))
    pd.testing.assert_frame_equal(got, exp)
    # val_centi / 100.0 must equal numpy's linear percentile on cents
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderstatus", "o_totalprice"])
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5) \
        .astype("int64")
    for _, r in got.iterrows():
        c = cents[orders["o_orderstatus"].to_numpy()
                  == r["o_orderstatus"]]
        want = np.percentile(c, r["p"], method="linear")
        assert abs(r["val_centi"] / 100.0 - want) < 1e-6


def test_orders_weighted_sample_by_status_stratified():
    from wsid_ray.pipelines.analytics import (
        orders_weighted_sample, orders_weighted_sample_by_status)
    SF = "/root/testdata/sf0.001"
    strat = orders_weighted_sample_by_status(SF, k=15).to_pandas()
    # exactly k per stratum (every status has >= k orders here)
    assert (strat.groupby("o_orderstatus").size() == 15).all()
    # priority contract identical to the global sampler's
    glob = orders_weighted_sample(SF, k=50).to_pandas()
    m = strat.merge(glob, on="o_orderkey", suffixes=("_s", "_g"))
    assert (m["priority_s"] == m["priority_g"]).all()
    # within each stratum the kept priorities are its k smallest
    for _, g in strat.groupby("o_orderstatus"):
        assert g["priority"].is_monotonic_increasing or \
            sorted(g["priority"]) == g["priority"].tolist()


def test_doc_readability_percentile_contract():
    import numpy as np
    from wsid_ray.pipelines.analytics import doc_readability_percentile
    SF = "/root/testdata/sf0.001"
    got = doc_readability_percentile(SF).to_pandas()
    v = got.sort_values(["flesch_micro", "doc_id"],
                        ignore_index=True)
    n = len(v)
    # recompute RANK/PERCENT_RANK directly
    ranks = v["flesch_micro"].rank(method="min").astype("int64")
    pr = ((ranks - 1) * 1_000_000 // (n - 1)).astype("int64")
    assert v["pr_micro"].tolist() == pr.tolist()
    assert got["pr_micro"].between(0, 1_000_000).all()
    # equal scores share a percentile
    dup = got.groupby("flesch_micro")["pr_micro"].nunique()
    assert (dup == 1).all()


def test_event_type_hll_estimate_quality():
    from wsid_ray.pipelines.queries import q_event_type_hll_estimate
    SF = "/root/testdata/sf0.001"
    t = q_event_type_hll_estimate(SF).to_pandas()
    assert (t["err"] == (t["est"] - t["n_exact"]).abs()).all()
    # HLL with 256 registers: ~6.5% rse; allow 4 sigma
    assert (t["err"] <= (t["n_exact"] * 0.26).clip(lower=10)).all()


def test_status_gini_direct():
    import duckdb
    import numpy as np
    from wsid_ray.pipelines.queries import q_status_gini
    SF = "/root/testdata/sf0.001"
    got = q_status_gini(SF).to_pandas().set_index("o_orderstatus")
    con = duckdb.connect()
    df = con.sql(f"SELECT o_orderstatus, o_orderkey, o_totalprice FROM "
                 f"read_parquet('{SF}/orders.parquet')").df()
    df["cents"] = np.floor(df["o_totalprice"] * 100 + 0.5).astype("int64")
    for st, g in df.groupby("o_orderstatus"):
        x = g.sort_values(["cents", "o_orderkey"])["cents"] \
            .to_numpy()
        n = len(x)
        i = np.arange(1, n + 1, dtype=object)
        num = 2 * int((i * x.astype(object)).sum()) - (n + 1) * int(x.sum())
        gini = float(num) / float(n * int(x.sum()))
        assert got.loc[st, "gini_micro"] == int(np.floor(gini * 1e6
                                                         + 0.5))
        assert 0 <= got.loc[st, "gini_micro"] < 1_000_000


def test_token_zipf_fit_direct():
    import numpy as np
    from wsid_ray.pipelines.queries import (q_token_zipf_fit,
                                            q_unigram_counts)
    SF = "/root/testdata/sf0.001"
    got = q_token_zipf_fit(SF).to_pandas().iloc[0]
    counts = q_unigram_counts(SF).to_pandas() \
        .sort_values(["n", "token"], ascending=[False, True],
                     ignore_index=True)
    assert got["n_types"] == len(counts)
    # slope should be negative (Zipf) and near the unquantised LSQ fit
    lx = np.log(np.arange(1, len(counts) + 1))
    ly = np.log(counts["n"].to_numpy().astype(float))
    slope = np.polyfit(lx, ly, 1)[0]
    assert got["slope_micro"] < 0
    assert abs(got["slope_micro"] / 1e6 - slope) < 1e-3
