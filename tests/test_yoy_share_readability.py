"""YoY growth, percent-of-total, Flesch readability."""

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


def test_yoy_parity_and_nulls():
    import __ray_entry__ as E
    from wsid_ray.pipelines.relational_ext import monthly_revenue_yoy
    got = _canon(monthly_revenue_yoy(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["monthly_revenue_yoy"],
                       ["orders"]))
    pd.testing.assert_frame_equal(got, exp)
    first_year = got["y"].min()
    assert got.loc[got["y"] == first_year, "yoy_micro"].isna().all()
    assert got.loc[got["y"] > first_year, "yoy_micro"].notna().any()


def test_share_parity_and_sums_to_one():
    import __ray_entry__ as E
    from wsid_ray.pipelines.relational_ext import status_revenue_share
    got = _canon(status_revenue_share(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["status_revenue_share"],
                       ["orders"]))
    pd.testing.assert_frame_equal(got, exp)
    # truncating shares sum to 1e6 minus at most n_groups
    tot = got["share_micro"].sum()
    assert 1_000_000 - len(got) <= tot <= 1_000_000


def test_readability_parity_and_hand_case():
    import __ray_entry__ as E
    from wsid_ray.stages.textstats import read_documents, \
        readability_batch
    got = _canon(read_documents(SF).map_batches(
        readability_batch, batch_format="pyarrow").to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_readability"],
                       ["documents"]))
    pd.testing.assert_frame_equal(got, exp)
    # hand case: "The cat sat." -> 3 words, 1 sentence, 3 vowel groups
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["The cat sat."], pa.string())})
    out = readability_batch(t).to_pandas()
    assert out.loc[0, "n_words"] == 3
    assert out.loc[0, "n_sentences"] == 1
    assert out.loc[0, "n_syllables"] == 3
    want = 206.835 - 1.015 * 3 - 84.6 * 1.0
    assert abs(out.loc[0, "fre6"] - round(want, 6)) < 1e-9
