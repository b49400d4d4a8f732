"""Sparse tf-idf all-pairs cosine (stages/lm.tfidf_pair_sim)."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def test_tfidf_pair_sim_parity():
    import __ray_entry__ as E
    from wsid_ray.stages.lm import tfidf_pair_sim
    from wsid_ray.stages.textstats import read_documents
    got = _canon(tfidf_pair_sim(read_documents(SF)).to_pandas())
    con = duckdb.connect()
    try:
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
        exp = _canon(con.sql(E.oracle_sql()["doc_tfidf_pair_sim"]).df())
    finally:
        con.close()
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0
    assert (got["cos6"] <= 1.000001).all() and (got["cos6"] > 0).all()
    assert (got["doc_a"] < got["doc_b"]).all()
    assert (got["shared"] <= 5).all()


def test_tfidf_pair_sim_identical_docs():
    """Identical docs score cosine 1; disjoint docs produce no pair."""
    from wsid_ray.stages.lm import tfidf_pair_sim
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "zebra quark flux melon drift",
            "zebra quark flux melon drift",
            "completely different words entirely here"], pa.string())})
    out = tfidf_pair_sim(rd.from_arrow(docs)).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(1, 2)}
    assert (out["cos6"] == 1.0).all()


def test_tfidf_pair_sim_group_cap():
    """A token shared by more docs than group_cap generates no pairs."""
    from wsid_ray.stages.lm import tfidf_pair_sim
    n = 6
    docs = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array([f"common uniq{i}" for i in range(n)],
                         pa.string())})
    out = tfidf_pair_sim(rd.from_arrow(docs), group_cap=3).to_pandas()
    # 'common' posts in all 6 docs > cap 3; uniq tokens post once
    assert len(out) == 0
