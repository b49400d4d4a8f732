"""Round-4 batch G: Mann–Whitney U, dup-quality AUC, source HHI,
Levenshtein candidate verify, ANN nDCG (pipelines/mlstats.py)."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def _duck(sql: str, tables=("documents",), sf: str = SF) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in tables:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
        return con.sql(sql).df()
    finally:
        con.close()


def test_mwu_parity_and_direct_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import priority_price_mwu
    got = _canon(priority_price_mwu(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["priority_price_mwu"],
                       tables=("orders",)))
    pd.testing.assert_frame_equal(got, exp)
    # direct recompute with pandas average ranks
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderpriority", "o_totalprice"])
    o = o[o["o_orderpriority"].isin(["1-URGENT", "5-LOW"])]
    cents = np.floor(o["o_totalprice"].to_numpy() * 100 + 0.5)
    ranks = pd.Series(cents).rank(method="average")
    is_a = (o["o_orderpriority"] == "1-URGENT").to_numpy()
    u = ranks[is_a].sum() - is_a.sum() * (is_a.sum() + 1) / 2
    r = got.iloc[0]
    assert r["u2"] == int(2 * u)
    assert 0 <= r["auc_micro"] <= 1_000_000
    assert r["n_a"] == is_a.sum() and r["n_b"] == (~is_a).sum()


def test_dup_quality_auc_parity_and_pair_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import dup_quality_auc
    got = _canon(dup_quality_auc(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["dup_quality_auc"]))
    pd.testing.assert_frame_equal(got, exp)
    r = got.iloc[0]
    assert r["n_pos"] > 0 and r["n_neg"] > 0
    assert 0 <= r["auc_micro"] <= 1_000_000
    # brute-force pairwise AUC on the engine's own inputs
    from wsid_ray.pipelines.queries import q_doc_near_dup_drops
    from wsid_ray.stages.textstats import quality_batch, read_documents
    from wsid_ray.util import collect_table
    drops = set(collect_table(q_doc_near_dup_drops(SF))["doc_id"]
                .to_pylist())
    q = collect_table(read_documents(SF).map_batches(
        quality_batch, batch_format="pyarrow")).to_pandas()
    s = np.floor(q["alpha_ratio"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    pos = s[q["doc_id"].isin(drops).to_numpy()]
    neg = s[~q["doc_id"].isin(drops).to_numpy()]
    num2 = sum(2 * int((p > neg).sum()) + int((p == neg).sum())
               for p in pos)
    assert r["auc_micro"] == num2 * 1_000_000 // (2 * len(pos) * len(neg))


def test_lang_source_hhi_parity_and_bounds():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import lang_source_hhi
    got = _canon(lang_source_hhi(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["lang_source_hhi"]))
    pd.testing.assert_frame_equal(got, exp)
    n_sources = pd.read_parquet(f"{SF}/documents.parquet",
                                columns=["source"])["source"].nunique()
    assert (got["hhi_micro"] <= 1_000_000).all()
    assert (got["hhi_micro"] >= 1_000_000 // n_sources - 1).all()


def test_doc_edit_pairs_parity_and_direct_dp():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import _levenshtein, doc_edit_pairs
    from wsid_ray.util import collect_table
    got = _canon(collect_table(doc_edit_pairs(SF)).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_edit_pairs"]))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0 and (got["edit_dist"] >= 0).all()
    # classic scalar DP cross-check of the vectorised kernel
    def slow(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]
    for a, b in [("kitten", "sitting"), ("abc", ""), ("", "xy"),
                 ("same", "same"), ("flaw", "lawn")]:
        assert _levenshtein(a, b) == slow(a, b)


def test_ann_ndcg_parity_and_bounds():
    # the oracle reads the sf0.01 artifacts (the driver's scale), so
    # parity runs there too
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import ann_ndcg
    sf = "/root/testdata/sf0.01"
    got = _canon(ann_ndcg(sf).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["ann_ndcg"],
                       tables=("embeddings",), sf=sf))
    pd.testing.assert_frame_equal(got, exp)
    idcg = sum(int(np.floor(1e6 / np.log2(i + 1) + 0.5))
               for i in range(1, 11))
    assert (got["dcg"] <= idcg).all()
    assert (got["ndcg_micro"] <= 1_000_000).all()
    assert set(got["method"]) == {"ivf", "lsh"}
