"""Round-4 batch I: KS two-sample, Cohen's kappa, dup-score lift,
Kendall tau-b, trimmed mean."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def _duck(sql: str, tables=("documents",)) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in tables:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
        return con.sql(sql).df()
    finally:
        con.close()


def _sf_oracle(sql: str) -> str:
    """oracle_sql() embeds the sf0.01 langid-profile artifact path; this
    test runs at SF — swap in SF's profile so both sides score with the
    same corpus-trained model."""
    from wsid_ray.artifacts import ensure
    return sql.replace(ensure("sf0.01")["langid_profile"],
                       ensure(SF)["langid_profile"])


def test_ks_parity_and_ecdf_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import priority_price_ks
    got = _canon(priority_price_ks(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["priority_price_ks"],
                       tables=("orders",)))
    pd.testing.assert_frame_equal(got, exp)
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderpriority", "o_totalprice"])
    o = o[o["o_orderpriority"].isin(["1-URGENT", "5-LOW"])]
    cents = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5)
    a = np.sort(cents[(o["o_orderpriority"] == "1-URGENT").to_numpy()])
    b = np.sort(cents[(o["o_orderpriority"] == "5-LOW").to_numpy()])
    pts = np.unique(cents)
    fa = np.searchsorted(a, pts, side="right") / len(a)
    fb = np.searchsorted(b, pts, side="right") / len(b)
    d = np.abs(fa - fb).max()
    r = got.iloc[0]
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert abs(r["d_micro"] / 1e6 - d) < 2e-6


def test_kappa_parity_and_direct():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import langid_confusion, langid_kappa
    from wsid_ray.util import collect_table
    got = _canon(langid_kappa(SF).to_pandas())
    exp = _canon(_duck(_sf_oracle(E.oracle_sql()["langid_kappa"])))
    pd.testing.assert_frame_equal(got, exp)
    conf = collect_table(langid_confusion(SF)).to_pandas()
    n = conf["n_docs"].sum()
    po = conf[conf["lang"] == conf["lang_pred"]]["n_docs"].sum() / n
    row = conf.groupby("lang")["n_docs"].sum()
    col = conf.groupby("lang_pred")["n_docs"].sum()
    pe = sum(row.get(lab, 0) * col.get(lab, 0)
             for lab in set(row.index) | set(col.index)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert abs(got["kappa_micro"].iloc[0] / 1e6 - kappa) < 2e-6


def test_lift_parity_and_mass():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import dup_score_lift
    got = dup_score_lift(SF).to_pandas()
    exp = _canon(_duck(E.oracle_sql()["dup_score_lift"]))
    pd.testing.assert_frame_equal(_canon(got), exp)
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id"]))
    assert got["n_docs"].sum() == n_docs
    assert sorted(got["decile"]) == list(range(1, 11))
    # lift averages to ~1 when weighted by docs (integer truncation
    # allows a small deficit)
    w = (got["lift_micro"] * got["n_docs"]).sum() / n_docs
    assert 1_000_000 - 10 <= w <= 1_000_000


def test_kendall_parity_and_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import qty_line_kendall
    got = _canon(qty_line_kendall(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["qty_line_kendall"],
                       tables=("lineitem",)))
    pd.testing.assert_frame_equal(got, exp)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_linenumber"])
    x = np.floor(li["l_quantity"].to_numpy() + 0.5).astype(np.int64)
    y = li["l_linenumber"].to_numpy().astype(np.int64)
    ct = pd.crosstab(x, y)
    conc = disc = 0
    xs, ys = ct.index.to_numpy(), ct.columns.to_numpy()
    m = ct.to_numpy()
    for i in range(len(xs)):
        for j in range(len(ys)):
            if not m[i, j]:
                continue
            conc += int(m[i, j]) * int(m[i + 1:, j + 1:].sum())
            disc += int(m[i, j]) * int(m[i + 1:, :j].sum())
    r = got.iloc[0]
    assert r["concordant"] == conc and r["discordant"] == disc
    n = len(x)
    n0 = n * (n - 1) // 2
    n1 = sum(int(t) * (int(t) - 1) // 2 for t in ct.sum(axis=1))
    n2 = sum(int(t) * (int(t) - 1) // 2 for t in ct.sum(axis=0))
    tau = (conc - disc) / np.sqrt(float(n0 - n1) * float(n0 - n2))
    assert abs(r["tau_b_micro"] / 1e6 - tau) < 2e-6


def test_trimmed_mean_parity_and_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import status_trimmed_mean
    got = _canon(status_trimmed_mean(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["status_trimmed_mean"],
                       tables=("orders",)))
    pd.testing.assert_frame_equal(got, exp)
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderstatus", "o_totalprice"])
    for _, r in got.iterrows():
        cents = np.sort(np.floor(
            o[o["o_orderstatus"] == r["o_orderstatus"]]
            ["o_totalprice"].to_numpy() * 100 + 0.5).astype(np.int64))
        k = len(cents) * 10 // 100
        kept = cents[k:len(cents) - k]
        assert r["n_kept"] == len(kept)
        assert r["trimmed_mean_micro_cents"] == \
            int(kept.sum()) * 1_000_000 // len(kept)
