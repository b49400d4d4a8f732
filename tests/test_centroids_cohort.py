"""Label centroids (stages/pca.label_centroids) + cohort retention
(pipelines/analytics.customer_cohort_retention)."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def _duck(sql: str, tables) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in tables:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
        return con.sql(sql).df()
    finally:
        con.close()


def test_label_centroids_parity_and_mean():
    import __ray_entry__ as E
    from wsid_ray.stages.pca import MICRO, label_centroids_query
    got = _canon(label_centroids_query(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["embedding_label_centroids"],
                       ["embeddings"]))
    pd.testing.assert_frame_equal(got, exp)
    # direct check of one (label, dim) cell against numpy
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    lab0 = int(got.loc[0, "label"])
    dim0 = int(got.loc[0, "i"])
    vs = np.stack(emb[emb["label"] == lab0]["embedding"].to_numpy())
    q = np.floor(vs[:, dim0 - 1].astype(np.float64) * MICRO + 0.5) \
        .astype(np.int64)
    s = int(q.sum())
    want = -((-s) // len(q)) if s < 0 else s // len(q)
    assert got.loc[0, "mean_micro"] == want
    assert got.loc[0, "n"] == len(q)


def test_cohort_retention_parity_and_triangle():
    import __ray_entry__ as E
    from wsid_ray.pipelines.analytics import customer_cohort_retention
    got = _canon(customer_cohort_retention(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["customer_cohort_retention"],
                       ["orders"]))
    pd.testing.assert_frame_equal(got, exp)
    # delta 0 exists for every cohort and is the cohort's max cell
    g = got.pivot_table(index="cohort_m", columns="delta_months",
                        values="n_customers", aggfunc="sum")
    assert g[0].notna().all()
    assert (g.max(axis=1) == g[0]).all()
    # total distinct customers across delta-0 cells == customer count
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey"])
    assert g[0].sum() == orders["o_custkey"].nunique()
