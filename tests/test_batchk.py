"""Round-5 batch K: lexical-richness panel, skew/kurtosis moments,
Naive Bayes source classifier, KG inverse predicates, RRF fusion,
seasonal-naive backtest."""

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


def test_lexical_panel_parity_and_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import corpus_lexical_panel
    got = _canon(corpus_lexical_panel(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["corpus_lexical_panel"]))
    pd.testing.assert_frame_equal(got, exp)
    # independent recompute from a plain Counter over the raw text
    from collections import Counter
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    cnt = Counter()
    for t in docs["text"]:
        cnt.update(t.split())
    n = sum(cnt.values())
    v = len(cnt)
    r = got.iloc[0]
    assert r["n_tokens"] == n and r["n_types"] == v
    assert r["hapax"] == sum(1 for c in cnt.values() if c == 1)
    assert r["dis_legomena"] == sum(1 for c in cnt.values() if c == 2)
    s2 = sum(c * c for c in cnt.values())
    yule_k = 1e4 * (s2 - n) / (n * n)
    assert abs(r["yule_k_micro"] / 1e6 - yule_k) < 2e-6
    simpson = sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1))
    assert abs(r["simpson_micro"] / 1e6 - simpson) < 2e-6
    assert 0 < r["ttr_micro"] <= 1_000_000
    assert 0 <= r["hapax_micro"] <= 1_000_000


def test_skewkurt_parity_and_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import status_price_skewkurt
    got = _canon(status_price_skewkurt(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["status_price_skewkurt"],
                       tables=("orders",)))
    pd.testing.assert_frame_equal(got, exp)
    # textbook population moments over the quantised values
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderstatus", "o_totalprice"])
    o["h"] = np.floor(o["o_totalprice"].to_numpy(np.float64) / 100.0)
    for s, g in o.groupby("o_orderstatus"):
        x = g["h"].to_numpy(np.float64)
        r = got[got["o_orderstatus"] == s].iloc[0]
        assert r["n"] == len(x)
        m2 = ((x - x.mean()) ** 2).mean()
        assert abs(r["m2_micro"] / 1e6 - m2) < 1.5  # truncating //
        if len(x) < 2 or m2 == 0:
            assert pd.isna(r["skew_micro"])
            continue
        g1 = ((x - x.mean()) ** 3).mean() / m2 ** 1.5
        g2 = ((x - x.mean()) ** 4).mean() / m2 ** 2 - 3.0
        assert abs(r["skew_micro"] / 1e6 - g1) < 2e-5
        assert abs(r["kurt_micro"] / 1e6 - g2) < 2e-5


def test_nb_lang_parity_and_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import nb_lang_eval
    got = _canon(nb_lang_eval(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["nb_lang_eval"]))
    pd.testing.assert_frame_equal(got, exp)
    # independent float NB recompute (no quantisation) must agree with
    # the integer-contract predictions on a large majority of docs AND
    # the classifier must beat chance on the fixture's real lang labels
    from collections import Counter, defaultdict
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    cls = defaultdict(Counter)
    for _, r in docs.iterrows():
        cls[r["lang"]].update(r["text"].split())
    vocab = set()
    for c in cls.values():
        vocab |= set(c)
    v = len(vocab)
    langs = sorted(cls)
    nd = docs["lang"].value_counts()
    n_ok = 0
    n_all = 0
    for _, r in docs.iterrows():
        toks = Counter(r["text"].split())
        if not toks:
            continue
        best = max(
            langs,
            key=lambda s: (sum(tf * np.log((cls[s][t] + 1)
                                           / (sum(cls[s].values()) + v))
                               for t, tf in toks.items())
                           + np.log(nd[s] / len(docs)), s))
        n_all += 1
        n_ok += best == r["lang"]
    total_correct = got["n_correct"].sum()
    assert abs(total_correct - n_ok) <= max(2, n_all // 50)
    assert got["n_docs"].sum() == n_all
    # better than the majority-class baseline => the model is live
    assert total_correct > nd.max()


def test_kg_inverse_preds_recompute():
    from wsid_ray.pipelines.queries import _flagship
    from wsid_ray.pipelines.kg import kg_inverse_preds
    art = _flagship(SF)
    got = _canon(kg_inverse_preds(art.triples).to_pandas())
    tr = art.triples.to_pandas()[["subj", "pred", "obj"]]
    # brute-force reversed-endpoint pair count per ordered pred pair
    import itertools
    rows = list(tr.itertuples(index=False))
    fwd = {}
    for s, p, o in rows:
        fwd.setdefault((s, o), []).append(p)
    preds = sorted(tr["pred"].unique())
    for p, q in itertools.product(preds, preds):
        n_pairs = sum(
            qq == q
            for s, pp, o in rows if pp == p
            for qq in fwd.get((o, s), []))
        r = got[(got["pred_a"] == p) & (got["pred_b"] == q)].iloc[0]
        assert r["n_pairs"] == n_pairs
        n_a = (tr["pred"] == p).sum()
        assert r["n_a"] == n_a
        assert r["inv_score_micro"] == n_pairs * 1_000_000 // n_a
    assert len(got) == len(preds) ** 2


def test_ann_rrf_recompute():
    import pyarrow.parquet as pq
    from wsid_ray.artifacts import ensure
    from wsid_ray.pipelines.mlstats import ann_rrf
    got = ann_rrf(SF).to_pandas()
    paths = ensure(SF)
    # float RRF recompute over the same two artifact lists
    from collections import defaultdict
    fscores = defaultdict(float)
    for m in ("ivf", "lsh"):
        t = pq.read_table(paths[f"{m}_topk"]).to_pandas()
        t = t.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        t["r"] = t.groupby("query_id").cumcount() + 1
        for r in t.itertuples():
            fscores[(int(r.query_id), int(r.vec_id))] += \
                1.0 / (60 + int(r.r))
    for r in got.itertuples():
        f = fscores[(int(r.query_id), int(r.vec_id))]
        assert abs(r.rrf_nano / 1e9 - f) < 2e-9
    # per query: exactly 10 rows (or all candidates), ranks dense from 1
    for qid, g in got.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= 10
        # fused consensus should overlap the exact list somewhere
    assert got["in_exact"].sum() > 0
    assert got["in_exact"].isin((0, 1)).all()


def test_seasonal_naive_parity_and_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.sequences import daily_volume_seasonal_naive
    got = _canon(daily_volume_seasonal_naive(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["daily_volume_seasonal_naive"],
                       tables=("events",)))
    got["day"] = pd.to_datetime(got["day"])
    exp["day"] = pd.to_datetime(exp["day"])
    pd.testing.assert_frame_equal(got, exp)
    # direct recompute from the raw event stream
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    byd = ev["ts"].dt.floor("D").value_counts().sort_index()
    days = pd.date_range(byd.index.min(), byd.index.max(), freq="D")
    dense = byd.reindex(days, fill_value=0).to_numpy(np.int64)
    assert len(got) == max(0, len(dense) - 7)
    for i, r in enumerate(got.sort_values("day").itertuples()):
        assert r.actual == dense[i + 7]
        assert r.forecast == dense[i]
        assert r.err == dense[i + 7] - dense[i]
        assert r.abs_err == abs(r.err)


def test_dbscan_parity_and_recompute():
    import __ray_entry__ as E
    from wsid_ray.stages.dbscan import (DBSCAN_EPS_MILLI,
                                        DBSCAN_MIN_PTS, dbscan)
    got = _canon(dbscan(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["embedding_dbscan"],
                       tables=("embeddings",)))
    pd.testing.assert_frame_equal(got, exp)
    # brute-force reference DBSCAN on the quantised coordinates
    emb = pd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    emb = emb.sort_values("vec_id", ignore_index=True)
    X = np.floor(np.stack(emb["embedding"].to_numpy())
                 .astype(np.float64) * 1000.0 + 0.5)
    D2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(2)
    n = len(X)
    adj = (D2 <= DBSCAN_EPS_MILLI ** 2) & ~np.eye(n, dtype=bool)
    core = adj.sum(1) + 1 >= DBSCAN_MIN_PTS
    vid = emb["vec_id"].to_numpy(np.int64)
    # components of the core-core graph by min-label propagation
    lab = vid.copy()
    cadj = adj & core[:, None] & core[None, :]
    for _ in range(n):
        new = lab.copy()
        for i in range(n):
            nb = np.nonzero(cadj[i])[0]
            if len(nb):
                new[i] = min(lab[i], lab[nb].min())
        if (new == lab).all():
            break
        lab = new
    got_by = got.set_index("vec_id")
    n_core = n_border = 0
    for i in range(n):
        r = got_by.loc[vid[i]]
        if core[i]:
            assert r["role"] == "core"
            assert r["cluster"] == lab[i]
            n_core += 1
        else:
            nb_core = np.nonzero(adj[i] & core)[0]
            if len(nb_core):
                assert r["role"] == "border"
                assert r["cluster"] == lab[nb_core].min()
                n_border += 1
            else:
                assert r["role"] == "noise"
                assert r["cluster"] == -1
    assert n_core > 0 and n_border > 0          # fixture is non-trivial
    assert (got["role"] == "noise").any()


def test_branching_entropy_parity_and_recompute():
    import __ray_entry__ as E
    from wsid_ray.fixtures import transcripts_dir
    from wsid_ray.pipelines.queries import q_term_branching_entropy
    got = _canon(q_term_branching_entropy(SF).to_pandas())
    # the oracle embeds the sf0.01 transcripts path; swap in SF's
    sql = E.oracle_sql()["term_branching_entropy"].replace(
        transcripts_dir("sf0.01"), transcripts_dir(SF))
    exp = _canon(_duck(sql, tables=()))
    pd.testing.assert_frame_equal(got, exp)
    # direct float recompute from the raw transcripts for one side
    from collections import Counter, defaultdict
    from wsid_ray.config import GAZETTEER
    from wsid_ray.fixtures import transcripts_dir
    from wsid_ray.stages.tokenize import tokenize_column
    import pyarrow.parquet as pq
    import glob
    singles = {g for g in GAZETTEER if " " not in g}
    nb = defaultdict(Counter)
    for f in glob.glob(f"{transcripts_dir(SF)}/*.parquet"):
        t = pq.read_table(f, columns=["text"])
        toks = tokenize_column(t["text"])
        for row in toks.to_pylist():
            for i, tk in enumerate(row):
                if tk in singles:
                    if i > 0:
                        nb[(tk, "left")][row[i - 1]] += 1
                    if i + 1 < len(row):
                        nb[(tk, "right")][row[i + 1]] += 1
    checked = 0
    for (term, side), cnt in nb.items():
        n = sum(cnt.values())
        h = -sum(c / n * np.log(c / n) for c in cnt.values())
        r = got[(got["term"] == term) & (got["side"] == side)].iloc[0]
        assert r["n"] == n and r["n_distinct"] == len(cnt)
        assert abs(r["h_micro"] / 1e6 - h) < 2e-5
        checked += 1
    assert checked >= 8
