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


def _brute_stress(rows, max_d=3):
    """All-pairs BFS path enumeration (exponential, tiny graphs only):
    stress(v) = # shortest paths (d ≤ max_d) with v interior."""
    import itertools
    adj = {}
    for _, u, x in rows:
        adj.setdefault(u, set()).add(x)
        adj.setdefault(x, set()).add(u)
    nodes = sorted(adj)
    stress = {v: 0 for v in nodes}
    for s, t in itertools.combinations(nodes, 2):
        # enumerate all simple paths s->t up to max_d edges
        best, paths = None, []
        stack = [(s, (s,))]
        while stack:
            cur, path = stack.pop()
            if cur == t:
                d = len(path) - 1
                if best is None or d < best:
                    best, paths = d, [path]
                elif d == best:
                    paths.append(path)
                continue
            if len(path) - 1 >= max_d:
                continue
            for nb in adj[cur]:
                if nb not in path:
                    stack.append((nb, path + (nb,)))
        if best is not None:
            for p in paths:
                for v in p[1:-1]:
                    stress[v] += 1
    return {v: c for v, c in stress.items() if c > 0}


def test_stress_centrality_planted_graph():
    from wsid_ray.stages.pagerank import stress_centrality
    # barbell: triangle a-b-c, bridge c-d, triangle d-e-f, plus tail f-g
    rows = [("t", "a", "b"), ("t", "a", "c"), ("t", "b", "c"),
            ("t", "c", "d"), ("t", "d", "e"), ("t", "d", "f"),
            ("t", "e", "f"), ("t", "f", "g")]
    got = {r["node"]: r["stress"]
           for r in stress_centrality(_edges(rows)).take_all()}
    assert got == _brute_stress(rows)
    # the bridge endpoints carry the load; triangle corners carry none
    assert "a" not in got and "b" not in got and "e" not in got
    assert got["c"] > 0 and got["d"] > 0 and got["f"] > 0


def test_stress_centrality_sigma_multiplicity():
    from wsid_ray.stages.pagerank import stress_centrality
    # two parallel 2-hop routes a-{m1,m2}-b then b-c: sigma(a,b)=2,
    # so b carries both a->c shortest paths (d=3): stress(b) = 2
    rows = [("t", "a", "m1"), ("t", "a", "m2"), ("t", "m1", "b"),
            ("t", "m2", "b"), ("t", "b", "c")]
    got = {r["node"]: r["stress"]
           for r in stress_centrality(_edges(rows)).take_all()}
    assert got == _brute_stress(rows)
    # b interior to: m1-m2 (1), m1-c (1), m2-c (1), a-c via m1/m2 (2)
    assert got["b"] == 5


def _wedges(rows):
    return rd.from_arrow(pa.table({
        "term": [r[0] for r in rows], "w": [r[1] for r in rows],
        "v": [r[2] for r in rows],
        "npmi": pa.array([r[3] for r in rows], pa.float64())}))


def test_hub_cheapest_paths_prefers_strong_edges():
    from wsid_ray.stages.pagerank import hub_cheapest_paths
    # hub 'a' (deg 3).  Direct a-d is weak (npmi 0.1 → cost 900000);
    # the 2-hop route a-b-d is strong (0.9+0.9 → cost 200000): the
    # weighted relaxation must take the longer-but-cheaper route.
    rows = [("t", "a", "b", 0.9), ("t", "b", "d", 0.9),
            ("t", "a", "d", 0.1), ("t", "a", "c", 0.5)]
    got = {r["node"]: r["dist"]
           for r in hub_cheapest_paths(_wedges(rows)).take_all()}
    assert got == {"a": 0, "b": 100000, "d": 200000, "c": 500000}


def test_hub_cheapest_paths_bounded_rounds_and_isolation():
    from wsid_ray.stages.pagerank import hub_cheapest_paths
    # chain hub-n1-..-n5: with rounds=2 only 2 hops out are priced;
    # second term's component stays independent
    rows = [("t", "h", "n1", 0.5), ("t", "n1", "n2", 0.5),
            ("t", "n2", "n3", 0.5), ("t", "n3", "n4", 0.5),
            ("u", "p", "q", 0.25)]
    got = {(r["term"], r["node"]): r["dist"]
           for r in hub_cheapest_paths(_wedges(rows),
                                       rounds=2).take_all()}
    # seed of 't' = n1 or n2 (deg 2 tie → lexicographic: n1)
    assert got[("t", "n1")] == 0 and got[("t", "n3")] == 1000000
    assert ("t", "n4") not in got   # 3 hops from n1 > rounds
    assert got[("u", "p")] == 0 and got[("u", "q")] == 750000
