"""Round-5: CCNet-style perplexity partition — per-language NTILE(3)
tertiles of the bigram-LM score, oracle parity + first-principles
recompute of the tile boundaries."""

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


def test_ppl_buckets_parity_and_tile_sizes():
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_doc_ppl_buckets
    got = _canon(q_doc_ppl_buckets(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_ppl_buckets"]))
    pd.testing.assert_frame_equal(got, exp)

    # label map is fixed: tile 1 = tail (worst LM score), 3 = head
    lbl = {1: "tail", 2: "middle", 3: "head"}
    assert (got["bucket"] == got["ppl_tertile"].map(lbl)).all()

    # NTILE invariant per language: tile sizes differ by at most one and
    # are non-increasing (SQL gives the first tiles the extra rows)
    for _, g in got.groupby("lang"):
        sizes = g["ppl_tertile"].value_counts().sort_index().to_numpy()
        assert sizes.max() - sizes.min() <= 1
        assert (np.diff(sizes) <= 0).all()

    # monotone w.r.t. the score: every head doc in a language scores
    # >= every tail doc (recomputed from the mirrored LM query)
    lm = _duck(E.oracle_sql()["bigram_lm_score"]).set_index("doc_id")
    m = got.join(lm["lm_score"], on="doc_id")
    for _, g in m.groupby("lang"):
        head = g.loc[g["bucket"] == "head", "lm_score"]
        tail = g.loc[g["bucket"] == "tail", "lm_score"]
        if len(head) and len(tail):
            assert head.min() >= tail.max()
