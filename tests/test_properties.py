"""Property-based invariants (FIXTURES.md F3; hypothesis)."""

import math
from collections import Counter
from itertools import combinations

import hypothesis.strategies as st
from hypothesis import given, settings

from wsid_ray.config import PipelineConfig
from wsid_ray.cw import chinese_whispers
from wsid_ray.oracle import cooc_stats, npmi_edges
from wsid_ray.stages.unionfind import driver_union_find

tokens = st.sampled_from(["aa1", "bb2", "cc3", "dd4", "ee5", "ff6"])
windows = st.lists(st.lists(tokens, min_size=1, max_size=6),
                   min_size=1, max_size=30)


@settings(max_examples=50, deadline=None)
@given(windows)
def test_npmi_bounded(wins):
    mentions = [{"term": "t", "win_tokens": w} for w in wins]
    totals, unis, pairs = cooc_stats(mentions)
    cfg = PipelineConfig(cooc_min_count=1, npmi_min=-1.000001)
    edges = npmi_edges(totals, unis, pairs, cfg)
    for _, es in edges.items():
        for w, v, npmi in es:
            assert -1.0 - 1e-9 <= npmi <= 1.0 + 1e-9
            assert w < v  # canonical order


@settings(max_examples=50, deadline=None)
@given(windows)
def test_window_counts_consistent(wins):
    mentions = [{"term": "t", "win_tokens": w} for w in wins]
    totals, unis, pairs = cooc_stats(mentions)
    N = totals["t"]
    for (term, w), n in unis.items():
        assert 1 <= n <= N
    for (term, w, v), n in pairs.items():
        assert n <= unis[(term, w)] and n <= unis[(term, v)]


edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=0, max_size=40)


@settings(max_examples=50, deadline=None)
@given(edge_lists)
def test_union_find_canonical_is_component_min(pairs):
    pairs = [(f"n{a:02d}", f"n{b:02d}") for a, b in pairs]
    comp = driver_union_find(pairs)
    # build expected components by BFS
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seen = set()
    for start in sorted(adj):
        if start in seen:
            continue
        stack, members = [start], set()
        while stack:
            x = stack.pop()
            if x in members:
                continue
            members.add(x)
            stack.extend(adj[x] - members)
        seen |= members
        mn = min(members)
        for m in members:
            assert comp[m] == mn


@settings(max_examples=30, deadline=None)
@given(edge_lists, st.integers(0, 1000))
def test_cw_deterministic_and_partitions(pairs, seed_int):
    nodes = sorted({f"n{a}" for a, _ in pairs} | {f"n{b}" for _, b in pairs})
    edges = [(f"n{a}", f"n{b}", 1.0) for a, b in pairs if a != b]
    if not nodes:
        return
    l1 = chinese_whispers(nodes, edges, seed_key=str(seed_int))
    l2 = chinese_whispers(nodes, edges, seed_key=str(seed_int))
    assert l1 == l2
    assert set(l1) == set(nodes)
    labels = sorted(set(l1.values()))
    assert labels == list(range(len(labels)))  # dense renumbering
