"""Integer-contract PCA power iteration (stages/pca.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def test_tdiv_matches_duckdb():
    from wsid_ray.stages.pca import _tdiv_int, _tdiv_np
    con = duckdb.connect()
    try:
        for a in (-7, -1, 0, 1, 7, -1000001, 999999):
            want = con.sql(f"SELECT {a} // 3").fetchone()[0]
            assert _tdiv_int(a, 3) == want
            assert _tdiv_np(np.array([a], dtype=np.int64), 3)[0] == want
    finally:
        con.close()


def test_pca_parity_sf0001():
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_embedding_pca_projection
    got = _canon(q_embedding_pca_projection(SF).to_pandas())
    con = duckdb.connect()
    try:
        con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
        exp = _canon(con.sql(
            E.oracle_sql()["embedding_pca_projection"]).df())
    finally:
        con.close()
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == 500


def test_pca_planted_direction():
    """Points spread 100:1 along axis 0 vs axis 1: the fitted direction
    must align with axis 0 and projections must recover the spread."""
    from wsid_ray.stages.pca import MICRO, fit_direction, pca_projection
    rng = np.random.RandomState(7)
    n = 200
    x = np.zeros((n, 4), dtype=np.float64)
    x[:, 0] = rng.uniform(-1, 1, n)          # dominant axis
    x[:, 1] = rng.uniform(-0.01, 0.01, n)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([list(r) for r in x.astype(np.float32)],
                              pa.list_(pa.float32()))}))
    v = fit_direction(ds, rounds=8)
    assert len(v) == 4
    assert abs(v[0]) == max(abs(int(c)) for c in v) == MICRO
    assert abs(v[1]) < MICRO // 10
    proj = pca_projection(ds, rounds=8).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    # projection in micro-units tracks the axis-0 coordinate
    corr = np.corrcoef(proj["proj"].to_numpy(),
                       np.sign(v[0]) * x[:, 0])[0, 1]
    assert corr > 0.999
