"""Edge structural similarity + bounded-round k-core over the NPMI
ego graphs (stages/pagerank.edge_jaccard / kcore)."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        return con.sql(sql).df()
    finally:
        con.close()


def test_edge_jaccard_parity_and_bounds():
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_cooc_edge_jaccard
    got = _canon(q_cooc_edge_jaccard(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["cooc_edge_jaccard"]
                       .replace("sf0.01", "sf0.001")))
    # NB the oracle embeds the sf0.01 transcripts path; rebuild for
    # sf0.001 via the entry helper instead of string surgery if the
    # replace ever stops matching
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0
    # cn counts OPEN common neighbours: bounded by min degree - 1
    # (the other endpoint is adjacent but never a common neighbour)
    m = got[["cn", "deg_w", "deg_v"]]
    assert (m["cn"] <= m[["deg_w", "deg_v"]].min(axis=1) - 1).all()
    assert (got["jacc_micro"] <= 1_000_000).all()
    assert (got["jacc_micro"] >= 0).all()


def test_kcore_parity_and_core_property():
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_cooc_kcore
    got = _canon(q_cooc_kcore(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["cooc_kcore"]
                       .replace("sf0.01", "sf0.001")))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0
    # every member holds >= k neighbours inside the peeled subgraph
    assert (got["deg"] >= 3).all()


def test_kcore_planted_graph():
    """A planted clique + pendant chain: the 8-round 3-core keeps the
    clique, peels the chain."""
    import pyarrow as pa
    import ray.data as rd

    from wsid_ray.stages.pagerank import kcore
    # K4 on a,b,c,d + chain d-e-f (canonical w < v edges)
    e = [("t", "a", "b"), ("t", "a", "c"), ("t", "a", "d"),
         ("t", "b", "c"), ("t", "b", "d"), ("t", "c", "d"),
         ("t", "d", "e"), ("t", "e", "f")]
    ds = rd.from_arrow(pa.table({
        "term": [x[0] for x in e],
        "w": [x[1] for x in e],
        "v": [x[2] for x in e]}))
    out = kcore(ds, k=3, rounds=8).to_pandas()
    assert sorted(out["node"]) == ["a", "b", "c", "d"]
    assert (out["deg"] == 3).all()
