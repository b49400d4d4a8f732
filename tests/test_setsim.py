"""Normalized dedup + prefix-filter set-similarity join over the
planted-duplicate corpus (stages/setsim.py)."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def test_normalized_dedup_parity():
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_doc_normalized_dedup
    got = _canon(q_doc_normalized_dedup(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_normalized_dedup"]))
    pd.testing.assert_frame_equal(got, exp)
    # every planted exact-dup (doc_id % 7 == 0) lands in a group with
    # its original as the first-wins canonical
    dups = got[got["doc_id"] >= 1_000_000]
    assert len(dups) > 0
    assert (dups["kept_by"] == dups["doc_id"] - 1_000_000).all()
    # the 80%-prefix near-dups are NOT normalized-equal to anything
    assert not ((got["doc_id"] >= 2_000_000)
                & (got["doc_id"] < 3_000_000)).any()


def test_setsim_join_parity_vs_all_pairs():
    """The oracle is the all-pairs ground truth: equality proves the
    SSJoin prefix filter is COMPLETE (no qualifying pair missed), not
    just that the verify math agrees on the candidates it kept."""
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_doc_setsim_join
    got = _canon(q_doc_setsim_join(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_setsim_join"]))
    pd.testing.assert_frame_equal(got, exp)
    # planted exact dups verify at jacc == 1.0 exactly
    exact = got[(got["doc_b"] >= 1_000_000) & (got["doc_b"] < 2_000_000)
                & (got["doc_a"] == got["doc_b"] - 1_000_000)]
    assert len(exact) > 0 and (exact["jacc_micro"] == 1_000_000).all()
    # planted 80%-prefix near-dups are found, strictly below 1.0
    near = got[(got["doc_b"] >= 2_000_000)
               & (got["doc_a"] == got["doc_b"] - 2_000_000)]
    assert len(near) > 0
    assert (near["jacc_micro"] < 1_000_000).all()
    assert (near["jacc_micro"] >= 500_000).all()


def test_prefix_bound_math():
    """p = sz - ceil(tau*sz) + 1 in exact integer math."""
    for sz in range(1, 40):
        p = sz - (1 * sz + 2 - 1) // 2 + 1
        import math
        assert p == sz - math.ceil(0.5 * sz) + 1
        assert 1 <= p <= sz
