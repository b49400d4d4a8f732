"""Round-5: reproducible training-order writer — (shard, pos) is a
deterministic global permutation with no RNG and no global sort."""

import hashlib

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


def test_training_order_parity_and_permutation():
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import (_TRAIN_ORDER_SHARDS,
                                            q_doc_training_order)
    got = _canon(q_doc_training_order(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_training_order"]))
    pd.testing.assert_frame_equal(got, exp)

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    # covers every doc exactly once
    assert sorted(got["doc_id"]) == sorted(docs["doc_id"])
    # pos is exactly 1..N within each shard (a valid interleave order)
    for s, g in got.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))
    # shard + pos recompute from first principles
    h63 = np.array([int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[:8], "little") >> 1
        for i in got["doc_id"]], dtype=np.int64)
    assert (got["shard"].to_numpy() == h63 % _TRAIN_ORDER_SHARDS).all()
    order = got.assign(h63=h63).sort_values(["shard", "h63", "doc_id"])
    expect_pos = order.groupby("shard").cumcount().to_numpy() + 1
    assert (order["pos"].to_numpy() == expect_pos).all()
    # hash shards are balanced (uniform permutation, not clumped)
    sizes = got.groupby("shard").size()
    assert len(sizes) == _TRAIN_ORDER_SHARDS
    assert sizes.max() <= 2 * sizes.min()
