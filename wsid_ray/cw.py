"""Chinese Whispers graph clustering — deterministic restatement.

C. Biemann, "Chinese Whispers — an Efficient Graph Clustering Algorithm and
its Application to Natural Language Processing Problems", TextGraphs @
HLT-NAACL 2006.  Textbook algorithm: every node starts in its own class;
in each iteration nodes are visited in random order and each adopts the
class with the maximal sum of incident edge weights among its neighbours.

Determinism rules (SURVEY.md §4.3 — required for run-to-run stable P/R vs
the oracle):
  * the RNG is seeded from a stable hash of (CW_SEED_SALT, term);
  * nodes are indexed in sorted order before any RNG use;
  * label-adoption ties break toward the LOWEST label id;
  * fixed iteration cap with early exit when no label changes.

This module is pure Python/numpy and is deliberately shared by the
distributed engine (inside groupby("term").map_groups) and the sequential
oracle — the engine/oracle comparison verifies the *distributed
orchestration* (counting, shuffles, partitioning), while the clustering
semantics are defined exactly once, as wsid defines them exactly once.
"""

from __future__ import annotations

import random

from .config import CW_SEED_SALT, CW_ITERATIONS
from .util import stable_hash64


def chinese_whispers(
    nodes: list[str],
    edges: list[tuple[str, str, float]],
    seed_key: str,
    iterations: int = CW_ITERATIONS,
) -> dict[str, int]:
    """Cluster ``nodes`` under weighted undirected ``edges``.

    Returns {node: cluster_label} with labels renumbered deterministically:
    clusters ordered by (size desc, lexicographically-min member asc) get
    labels 0, 1, 2, ...
    """
    order = sorted(set(nodes))
    idx = {n: i for i, n in enumerate(order)}
    n = len(order)
    labels = list(range(n))
    adj: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    for u, v, w in edges:
        iu, iv = idx[u], idx[v]
        if iu == iv:
            continue
        adj[iu].append((iv, w))
        adj[iv].append((iu, w))

    rng = random.Random(stable_hash64(f"{CW_SEED_SALT}|{seed_key}"))
    visit = list(range(n))
    for _ in range(iterations):
        rng.shuffle(visit)
        changed = False
        for i in visit:
            if not adj[i]:
                continue
            scores: dict[int, float] = {}
            for j, w in adj[i]:
                lbl = labels[j]
                scores[lbl] = scores.get(lbl, 0.0) + w
            # max weight, ties -> lowest label id
            best = min(scores, key=lambda l: (-scores[l], l))
            if best != labels[i]:
                labels[i] = best
                changed = True
        if not changed:
            break

    clusters: dict[int, list[str]] = {}
    for node, i in idx.items():
        clusters.setdefault(labels[i], []).append(node)
    ordered = sorted(clusters.values(), key=lambda ms: (-len(ms), min(ms)))
    out: dict[str, int] = {}
    for new_label, members in enumerate(ordered):
        for m in members:
            out[m] = new_label
    return out


def hyperlex_root_hubs(
    nodes: list[str],
    edges: list[tuple[str, str, float]],
) -> dict[str, int]:
    """HyperLex-style root-hub clustering (SURVEY.md §0 step-5 variant).

    J. Véronis, "HyperLex: lexical cartography for information retrieval",
    Computer Speech & Language 18(3), 2004.  Deterministic simplification
    of the paper's hub selection: candidate nodes in (weighted-degree
    desc, name asc) order become root hubs unless already adjacent to a
    chosen hub; remaining nodes attach to the strongest-edged labelled
    neighbour (rounds to fixpoint, ties -> higher weight then lower
    label); still-unlabelled nodes become singleton clusters.  No RNG —
    fully deterministic, same renumbering rule as chinese_whispers.
    """
    order = sorted(set(nodes))
    adj: dict[str, dict[str, float]] = {n: {} for n in order}
    for u, v, w in edges:
        if u == v:
            continue
        adj[u][v] = adj[u].get(v, 0.0) + w
        adj[v][u] = adj[v].get(u, 0.0) + w
    wdeg = {n: sum(adj[n].values()) for n in order}

    hubs: list[str] = []
    for n in sorted(order, key=lambda x: (-wdeg[x], x)):
        if wdeg[n] > 0 and not any(h in adj[n] for h in hubs):
            hubs.append(n)
    label_of: dict[str, int] = {h: i for i, h in enumerate(hubs)}

    changed = True
    while changed:
        changed = False
        for n in order:
            if n in label_of:
                continue
            best = None  # (weight, -label) max => strongest edge, low label
            for m, w in adj[n].items():
                lbl = label_of.get(m)
                if lbl is None:
                    continue
                key = (w, -lbl)
                if best is None or key > best[0]:
                    best = (key, lbl)
            if best is not None:
                label_of[n] = best[1]
                changed = True
    nxt = len(hubs)
    for n in order:
        if n not in label_of:
            label_of[n] = nxt
            nxt += 1

    clusters: dict[int, list[str]] = {}
    for n in order:
        clusters.setdefault(label_of[n], []).append(n)
    ordered = sorted(clusters.values(), key=lambda ms: (-len(ms), min(ms)))
    out: dict[str, int] = {}
    for new_label, members in enumerate(ordered):
        for m in members:
            out[m] = new_label
    return out


def cluster_graph(
    nodes: list[str],
    edges: list[tuple[str, str, float]],
    seed_key: str,
    algo: str = "cw",
    iterations: int = CW_ITERATIONS,
) -> dict[str, int]:
    """Dispatch: 'cw' (primary) or 'hyperlex' (root-hub variant)."""
    if algo == "hyperlex":
        return hyperlex_root_hubs(nodes, edges)
    if algo == "cw":
        return chinese_whispers(nodes, edges, seed_key,
                                iterations=iterations)
    raise ValueError(f"unknown induction algorithm {algo!r}")


def sense_vectors(
    cluster_of: dict[str, int],
    edges: list[tuple[str, str, float]],
    top_k: int,
) -> dict[int, dict[str, float]]:
    """Cluster -> weighted token vector: weight(token) = sum of
    intra-cluster incident edge weights; truncated to top_k by
    (weight desc, token asc)."""
    acc: dict[int, dict[str, float]] = {}
    for u, v, w in edges:
        cu, cv = cluster_of[u], cluster_of[v]
        if cu != cv:
            continue
        d = acc.setdefault(cu, {})
        d[u] = d.get(u, 0.0) + w
        d[v] = d.get(v, 0.0) + w
    # singleton clusters (no intra edges) still get an (empty) vector
    for node, c in cluster_of.items():
        acc.setdefault(c, {}).setdefault(node, 0.0)
    out: dict[int, dict[str, float]] = {}
    for c, vec in acc.items():
        top = sorted(vec.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        out[c] = dict(top)
    return out
