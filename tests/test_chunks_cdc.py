"""RAG chunking (stages/chunking) + CDC last-wins merge
(pipelines/relational_ext.orders_cdc_merge)."""

import hashlib

import duckdb
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


def test_chunks_parity():
    import __ray_entry__ as E
    from wsid_ray.stages.chunking import doc_chunks
    from wsid_ray.stages.textstats import read_documents
    got = _canon(doc_chunks(read_documents(SF)).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_chunks"], ["documents"]))
    pd.testing.assert_frame_equal(got, exp)
    assert (got["n_chunk_tokens"] <= 64).all()
    assert (got["start"] == got["chunk_idx"] * 48).all()


def test_chunks_hand_case():
    from wsid_ray.stages.chunking import doc_chunks
    words = [f"w{i}" for i in range(100)]
    docs = pa.table({"doc_id": pa.array([7], pa.int64()),
                     "text": pa.array([" ".join(words)], pa.string())})
    out = doc_chunks(rd.from_arrow(docs)).to_pandas() \
        .sort_values("chunk_idx", ignore_index=True)
    # 100 tokens, stride 48 -> starts 0, 48, 96
    assert list(out["start"]) == [0, 48, 96]
    assert list(out["n_chunk_tokens"]) == [64, 52, 4]
    assert out.loc[0, "chunk_fp"] == hashlib.md5(
        " ".join(words[:64]).encode()).hexdigest()
    assert out.loc[2, "chunk_fp"] == hashlib.md5(
        " ".join(words[96:]).encode()).hexdigest()


def test_cdc_merge_parity_and_semantics():
    import __ray_entry__ as E
    from wsid_ray.pipelines.analytics import _cents
    from wsid_ray.pipelines.relational_ext import orders_cdc_merge
    got = _canon(orders_cdc_merge(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["orders_cdc_merge"], ["orders"]))
    pd.testing.assert_frame_equal(got, exp)
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    k = orders["o_orderkey"].to_numpy()
    # one row per surviving key; updates won where they exist
    assert got["o_orderkey"].is_unique
    assert len(got) == len(orders) + (k % 97 == 0).sum()
    upd = got[got["o_orderkey"].isin(k[k % 10 == 0])]
    assert (upd["version"] == 2).all()
    base = orders.set_index("o_orderkey")
    row = upd.iloc[0]
    want = _cents(pd.Series(
        [base.loc[row["o_orderkey"], "o_totalprice"]]).to_numpy())[0]
    assert row["cents"] == want + 500
