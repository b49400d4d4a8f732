"""Round-4 batch F: langid confusion/eval, Theil index, session-type
PMI, dup-source matrix (pipelines/mlstats.py)."""

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


def test_langid_confusion_parity_and_mass():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import langid_confusion
    from wsid_ray.util import collect_table
    got = _canon(collect_table(langid_confusion(SF)).to_pandas())
    exp = _canon(_duck(_sf_oracle(E.oracle_sql()["langid_confusion"])))
    pd.testing.assert_frame_equal(got, exp)
    n_docs = len(pd.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id"]))
    assert got["n_docs"].sum() == n_docs


def test_langid_eval_parity_and_confusion_identity():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import langid_confusion, langid_eval
    from wsid_ray.util import collect_table
    got = _canon(langid_eval(SF).to_pandas())
    exp = _canon(_duck(_sf_oracle(E.oracle_sql()["langid_eval"])))
    pd.testing.assert_frame_equal(got, exp)
    # recompute P/R/F1 straight from the confusion matrix
    conf = collect_table(langid_confusion(SF)).to_pandas()
    for _, r in got.iterrows():
        lab = r["lang"]
        tp = conf[(conf["lang"] == lab)
                  & (conf["lang_pred"] == lab)]["n_docs"].sum()
        fp = conf[(conf["lang"] != lab)
                  & (conf["lang_pred"] == lab)]["n_docs"].sum()
        fn = conf[(conf["lang"] == lab)
                  & (conf["lang_pred"] != lab)]["n_docs"].sum()
        assert r["tp"] == tp and r["fp"] == fp and r["fn"] == fn
        if tp + fp:
            assert r["precision_micro"] == tp * 1_000_000 // (tp + fp)
        if 2 * tp + fp + fn:
            assert r["f1_micro"] == \
                2 * tp * 1_000_000 // (2 * tp + fp + fn)


def test_theil_parity_and_float_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import status_theil_index
    got = _canon(status_theil_index(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["status_theil_index"],
                       tables=("orders",)))
    pd.testing.assert_frame_equal(got, exp)
    # Theil >= 0 (up to half-micro-per-row quantisation) and close to
    # the float definition
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderstatus", "o_totalprice"])
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5)
    for _, r in got.iterrows():
        x = cents[orders["o_orderstatus"].to_numpy() == r["o_orderstatus"]]
        mu = x.mean()
        t_float = float(np.mean((x / mu) * np.log(x / mu)))
        assert r["theil_micro"] >= -len(x)
        assert abs(r["theil_micro"] / 1e6 - t_float) < 1e-3


def test_session_pmi_parity_and_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import session_type_pmi
    got = _canon(session_type_pmi(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["session_type_pmi"],
                       tables=("events",)))
    pd.testing.assert_frame_equal(got, exp)
    # direct pandas recompute of the session/presence counts
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort",
                        ignore_index=True)
    prev = ev.groupby("user_id")["ts"].shift()
    new_s = prev.isna() | ((ev["ts"] - prev) > pd.Timedelta(minutes=30))
    sid = new_s.groupby(ev["user_id"]).cumsum() - 1
    pres = pd.DataFrame({"u": ev["user_id"], "s": sid,
                         "t": ev["event_type"]}).drop_duplicates()
    n_sessions = len(pres[["u", "s"]].drop_duplicates())
    assert (got["n_sessions"] == n_sessions).all()
    sing = pres.groupby("t").size()
    for _, r in got.iterrows():
        assert r["n_a"] == sing[r["type_a"]]
        assert r["n_b"] == sing[r["type_b"]]
        both = pres.merge(pres, on=["u", "s"])
        nb = len(both[(both["t_x"] == r["type_a"])
                      & (both["t_y"] == r["type_b"])])
        assert r["n_both"] == nb
        arg = (r["n_both"] * n_sessions) / (r["n_a"] * r["n_b"])
        assert r["pmi_micro"] == int(np.floor(np.log(arg) * 1e6 + 0.5))


def test_dup_source_matrix_parity_and_mass():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import dup_source_matrix
    from wsid_ray.pipelines.queries import q_doc_jaccard_pairs
    from wsid_ray.util import collect_table
    got = _canon(collect_table(dup_source_matrix(SF)).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["dup_source_matrix"]))
    pd.testing.assert_frame_equal(got, exp)
    # every verified near-dup pair lands in exactly one matrix cell
    n_pairs = collect_table(q_doc_jaccard_pairs(SF)).num_rows
    assert got["n_pairs"].sum() == n_pairs
    assert (got["source_a"] <= got["source_b"]).all()
