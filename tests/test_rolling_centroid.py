"""Rolling 7-day distinct users (analytics.trailing_active_users) +
nearest-centroid assignment (stages/pca.nearest_centroid)."""

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


def _duck(sql: str, tables) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in tables:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
        return con.sql(sql).df()
    finally:
        con.close()


def test_trailing_users_parity_and_monotone_vs_daily():
    import __ray_entry__ as E
    from wsid_ray.pipelines.analytics import trailing_active_users
    got = _canon(trailing_active_users(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["daily_trailing_active_users"],
                       ["events"]))
    pd.testing.assert_frame_equal(got, exp)
    # trailing window count >= that day's own distinct users
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "user_id"])
    day = (pd.DatetimeIndex(ev["ts"]).as_unit("us").normalize()
           .asi8 // 86_400_000_000)
    daily = pd.DataFrame({"day": day, "u": ev["user_id"]}) \
        .drop_duplicates().groupby("day").size()
    m = got.set_index("report_day")["n_users"]
    assert (m.loc[daily.index] >= daily).all()


def test_nearest_centroid_parity_and_purity():
    import __ray_entry__ as E
    from wsid_ray.stages.pca import nearest_centroid_query
    got = _canon(nearest_centroid_query(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["embedding_nearest_centroid"],
                       ["embeddings"]))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == 500
    # the synthetic labels are cluster-correlated: assignments must
    # beat the 1/n_labels chance rate by a wide margin
    acc = got["correct"].mean()
    assert acc > 3.0 / got["true_label"].nunique()
    assert (got["dist2"] >= 0).all()


def test_nearest_centroid_planted():
    """Two tight planted clusters: every vector assigns to its own."""
    from wsid_ray.stages.pca import nearest_centroid
    rng = np.random.RandomState(3)
    a = rng.uniform(0.8, 0.9, (20, 8))
    b = rng.uniform(-0.9, -0.8, (20, 8))
    x = np.vstack([a, b]).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(40), pa.int64()),
        "embedding": pa.array([list(r) for r in x],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 20 + [1] * 20, pa.int32())}))
    out = nearest_centroid(ds).to_pandas()
    assert (out["correct"] == 1).all()
