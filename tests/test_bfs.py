"""Semantics tests for stages/pagerank.bfs_hops on a planted graph."""

import pyarrow as pa
import ray.data as rd


def _edges(rows):
    return rd.from_arrow(pa.table({
        "term": [r[0] for r in rows], "w": [r[1] for r in rows],
        "v": [r[2] for r in rows]}))


def test_bfs_hops_planted_graph():
    from wsid_ray.stages.pagerank import bfs_hops
    # hub 'a' (deg 3); chain a-b-c-d-e plus a-f, a-g; 'z' isolated pair
    rows = [("t", "a", "b"), ("t", "b", "c"), ("t", "c", "d"),
            ("t", "d", "e"), ("t", "a", "f"), ("t", "a", "g"),
            ("t", "z1", "z2")]
    got = {(r["node"]): r["dist"]
           for r in bfs_hops(_edges(rows), rounds=3).take_all()}
    assert got == {"a": 0, "b": 1, "f": 1, "g": 1, "c": 2, "d": 3}
    # 'e' is 4 hops out (> rounds), z-component unreachable: absent


def test_bfs_seed_tiebreak_lexicographic():
    from wsid_ray.stages.pagerank import bfs_hops
    # two nodes tie at degree 2: 'a' and 'b' — seed must be 'a'
    rows = [("t", "a", "b"), ("t", "a", "c"), ("t", "b", "c")]
    got = {r["node"]: r["dist"]
           for r in bfs_hops(_edges(rows), rounds=2).take_all()}
    assert got["a"] == 0 and got["b"] == 1 and got["c"] == 1


def test_bfs_multiple_terms_independent():
    from wsid_ray.stages.pagerank import bfs_hops
    rows = [("t1", "a", "b"), ("t1", "a", "c"),
            ("t2", "x", "y")]
    got = {(r["term"], r["node"]): r["dist"]
           for r in bfs_hops(_edges(rows), rounds=2).take_all()}
    assert got == {("t1", "a"): 0, ("t1", "b"): 1, ("t1", "c"): 1,
                   ("t2", "x"): 0, ("t2", "y"): 1}
