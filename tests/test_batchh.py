"""Round-4 batch H: Spearman, source-profile cosine, Pareto deciles,
JL projection, degree assortativity."""

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


def test_spearman_parity_and_pandas_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import qty_price_spearman
    got = _canon(qty_price_spearman(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["qty_price_spearman"],
                       tables=("lineitem",)))
    pd.testing.assert_frame_equal(got, exp)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice"])
    x = np.floor(li["l_quantity"].to_numpy() + 0.5)
    y = np.floor(li["l_extendedprice"].to_numpy() * 100 + 0.5)
    rx = pd.Series(x).rank(method="average")
    ry = pd.Series(y).rank(method="average")
    rho = np.corrcoef(rx, ry)[0, 1]
    assert abs(got["rho_micro"].iloc[0] / 1e6 - rho) < 2e-6
    assert got["n"].iloc[0] == len(li)


def test_source_profile_cosine_parity_and_crosstab():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import source_profile_cosine
    got = _canon(source_profile_cosine(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["source_profile_cosine"]))
    pd.testing.assert_frame_equal(got, exp)
    # direct recompute from the tokenizer's own counts
    from wsid_ray.stages.tokenize import tokenize_column
    import pyarrow as pa
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text", "source"])
    toks = tokenize_column(pa.table({"text": docs["text"]})["text"])
    rows = []
    for src, ts in zip(docs["source"], toks.to_pylist()):
        rows.extend((t, src) for t in ts)
    ct = pd.DataFrame(rows, columns=["token", "source"]) \
        .groupby(["token", "source"]).size().unstack(fill_value=0)
    r = got.iloc[0]
    va = ct[r["src_a"]].to_numpy(dtype=np.int64)
    vb = ct[r["src_b"]].to_numpy(dtype=np.int64)
    assert r["dot"] == int((va * vb).sum())
    cos = (va * vb).sum() / np.sqrt(float((va * va).sum())
                                    * float((vb * vb).sum()))
    assert abs(r["cos_micro"] / 1e6 - cos) < 2e-6


def test_pareto_parity_and_mass():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import customer_revenue_pareto
    got = customer_revenue_pareto(SF).to_pandas()
    exp = _canon(_duck(E.oracle_sql()["customer_revenue_pareto"],
                       tables=("orders",)))
    pd.testing.assert_frame_equal(_canon(got), exp)
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    assert got["n_customers"].sum() == o["o_custkey"].nunique()
    assert got["share_micro"].sum() <= 1_000_000
    # deciles ascend in total revenue per customer
    per_cust = (got["rev_cents"] / got["n_customers"]).to_numpy()
    assert (np.diff(per_cust[np.argsort(got["decile"].to_numpy())])
            >= 0).all()


def test_jl_projection_parity_and_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import (_jl_signs,
                                            embedding_jl_projection)
    from wsid_ray.util import collect_table
    got = _canon(collect_table(embedding_jl_projection(SF)).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["embedding_jl_projection"],
                       tables=("embeddings",)))
    pd.testing.assert_frame_equal(got, exp)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    S = _jl_signs(X.shape[1], 8)
    assert set(np.unique(S)) <= {-1, 1}
    P = np.floor(X * 1e6 + 0.5).astype(np.int64) @ S
    vid = int(emb["vec_id"].iloc[0])
    mine = got[got["vec_id"] == vid].sort_values("j")["proj_micro"] \
        .to_numpy()
    assert (mine == P[0]).all()


def test_assortativity_direct_recompute():
    # SQL parity is covered by tools/driver_check (the cooc-chain
    # oracle needs the driver's transcript-view plumbing); here the
    # engine result is recomputed definitionally from its own edges.
    from wsid_ray.pipelines.queries import (_cooc_edge_stream,
                                            q_cooc_assortativity)
    from wsid_ray.util import collect_table
    got = _canon(collect_table(q_cooc_assortativity(SF)).to_pandas())
    edges = collect_table(_cooc_edge_stream(SF)).to_pandas()
    for term, g in edges.groupby("term"):
        deg = pd.concat([g["w"], g["v"]]).value_counts()
        x = np.concatenate([g["w"].map(deg).to_numpy(dtype=np.int64),
                            g["v"].map(deg).to_numpy(dtype=np.int64)])
        y = np.concatenate([g["v"].map(deg).to_numpy(dtype=np.int64),
                            g["w"].map(deg).to_numpy(dtype=np.int64)])
        m2, sx = len(x), int(x.sum())
        num = m2 * int((x * y).sum()) - sx * sx
        den = m2 * int((x * x).sum()) - sx * sx
        row = got[got["term"] == term].iloc[0]
        assert row["n_edges"] == len(g)
        if den == 0:
            assert pd.isna(row["r_micro"])
        else:
            assert row["r_micro"] == int(np.floor(num / den * 1e6 + 0.5))
