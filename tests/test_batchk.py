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
