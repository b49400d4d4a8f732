"""Chinese Whispers graph clustering — deterministic synchronous restatement.

C. Biemann, "Chinese Whispers — an Efficient Graph Clustering Algorithm and
its Application to Natural Language Processing Problems", TextGraphs @
HLT-NAACL 2006.  Textbook CW visits nodes in random order and each adopts
the class with the maximal sum of incident edge weights among neighbours.

v2 determinism contract (SURVEY.md §4.3; makes the inventory itself
hash-checkable against a DuckDB mirror, the same move as the k-means
integer contract):

  * edge weights are quantised to int64 micro-units,
    wq = floor(w * 1e6 + 0.5) — all score sums are exact integer math,
    order-free, and reproducible in SQL;
  * NO RNG.  Every round is one synchronous (Jacobi) step in which each
    node computes the classic CW attractor — the neighbour label with
    the maximal summed incident weight, ties toward the LOWEST label —
    and adopts it only if it is SMALLER than its current label:
    new = min(current, attractor).  Labels start as the node's own name,
    so cluster identity gravitates to the lexicographically-least member
    of each attractor basin.  The monotone (non-increasing) rule is what
    replaces CW's sequential visit order: plain synchronous max-score
    adoption oscillates on symmetric structures (label swaps across an
    isolated edge, checkerboard cycles inside cliques), while a
    monotone lattice descent has no cycles and reaches a fixpoint in at
    most |V| rounds;
  * label ties break toward the LOWEST label (index order ==
    lexicographic node order, so SQL mirrors it as ORDER BY label ASC
    and least(current, best));
  * fixed iteration cap, early exit only at a fixpoint (a fixpoint is
    stable under further rounds, so a mirror that always runs the full
    cap computes the identical labelling).

Because every rule above is order-free and integer-exact, an unrolled
CTE-per-phase DuckDB query over the same quantised edges reproduces the
labelling bit-for-bit — see __ray_entry__._sql_sense_inventory.

This module is pure Python/numpy and is deliberately shared by the
distributed engine (inside the bucketed induce shuffle) and the sequential
oracle — the engine/oracle comparison verifies the *distributed
orchestration* (counting, shuffles, partitioning), while the clustering
semantics are defined exactly once, as wsid defines them exactly once.
"""

from __future__ import annotations

import math

import numpy as np

from .config import (CW_ITERATIONS, HYPERLEX_ATTACH_ROUNDS,
                     HYPERLEX_HUB_ROUNDS)


def quantize_weight(w: float) -> int:
    """Micro-unit quantisation shared by engine and SQL mirror:
    floor(w * 1e6 + 0.5) — half-up, matching DuckDB
    CAST(floor(npmi * 1e6 + 0.5) AS BIGINT)."""
    return int(math.floor(w * 1e6 + 0.5))


def _renumber(order: list[str], label_of_idx) -> dict[str, int]:
    """Renumber cluster labels deterministically: clusters ordered by
    (size desc, lexicographically-min member asc) get labels 0, 1, 2…"""
    clusters: dict[int, list[str]] = {}
    for i, node in enumerate(order):
        clusters.setdefault(int(label_of_idx[i]), []).append(node)
    ordered = sorted(clusters.values(), key=lambda ms: (-len(ms), ms[0]))
    out: dict[str, int] = {}
    for new_label, members in enumerate(ordered):
        for m in members:
            out[m] = new_label
    return out


def chinese_whispers(
    nodes: list[str],
    edges: list[tuple[str, str, float]],
    seed_key: str = "",
    iterations: int = CW_ITERATIONS,
) -> dict[str, int]:
    """Cluster ``nodes`` under weighted undirected ``edges`` (v2 contract
    above).  ``seed_key`` is accepted for API compatibility and ignored —
    the v2 restatement is RNG-free.

    Returns {node: cluster_label} with labels renumbered deterministically:
    clusters ordered by (size desc, lexicographically-min member asc) get
    labels 0, 1, 2, ...
    """
    del seed_key  # v2: no RNG — determinism comes from the phase schedule
    order = sorted(set(nodes))
    idx = {n: i for i, n in enumerate(order)}
    n = len(order)
    if n == 0:
        return {}

    src_l: list[int] = []
    dst_l: list[int] = []
    wq_l: list[int] = []
    for u, v, w in edges:
        iu, iv = idx[u], idx[v]
        if iu == iv:
            continue
        q = quantize_weight(w)
        src_l += (iu, iv)
        dst_l += (iv, iu)
        wq_l += (q, q)

    labels = np.arange(n, dtype=np.int64)
    if src_l:
        src = np.asarray(src_l, dtype=np.int64)
        dst = np.asarray(dst_l, dtype=np.int64)
        wq = np.asarray(wq_l, dtype=np.float64)  # exact below 2^53
        for _ in range(iterations):
            key = src * n + labels[dst]
            uk, inv = np.unique(key, return_inverse=True)
            sums = np.bincount(inv, weights=wq).astype(np.int64)
            ks, kl = uk // n, uk % n
            # attractor per node by (sum desc, label asc): lexsort is
            # stable, last key dominates
            o = np.lexsort((kl, -sums, ks))
            first = np.ones(len(o), dtype=bool)
            first[1:] = ks[o][1:] != ks[o][:-1]
            new = labels.copy()
            node_u, best = ks[o][first], kl[o][first]
            new[node_u] = np.minimum(labels[node_u], best)
            if np.array_equal(new, labels):
                break  # fixpoint: further rounds are no-ops (mirror-safe)
            labels = new
    return _renumber(order, labels)


def hyperlex_root_hubs(
    nodes: list[str],
    edges: list[tuple[str, str, float]],
    hub_rounds: int = HYPERLEX_HUB_ROUNDS,
    attach_rounds: int = HYPERLEX_ATTACH_ROUNDS,
) -> dict[str, int]:
    """HyperLex-style root-hub clustering (SURVEY.md §0 step-5 variant).

    J. Véronis, "HyperLex: lexical cartography for information retrieval",
    Computer Speech & Language 18(3), 2004.  v2 deterministic bounded-round
    restatement (SQL-mirrorable, same contract style as chinese_whispers):

      * weights quantised to int64 micro-units; weighted degree and rank
        (wdeg desc, name asc) are exact;
      * hub selection is the greedy maximal-independent-set by rank,
        computed as a synchronous fixpoint over at most ``hub_rounds``
        rounds: an undecided node becomes a HUB when every higher-ranked
        neighbour is decided non-hub (or it has none), becomes non-hub
        when any higher-ranked neighbour is a HUB; still-undecided nodes
        after the cap are non-hubs;
      * attachment runs ``attach_rounds`` synchronous rounds: an
        unlabelled node adopts the label of its strongest labelled
        neighbour (ties: weight desc, then label asc); labels are
        immutable once set;
      * still-unlabelled nodes become singleton clusters; renumbering as
        in chinese_whispers.

    Early exit at a fixpoint is mirror-safe (further rounds are no-ops).
    """
    order = sorted(set(nodes))
    adjq: dict[str, dict[str, int]] = {n: {} for n in order}
    for u, v, w in edges:
        if u == v:
            continue
        q = quantize_weight(w)
        adjq[u][v] = adjq[u].get(v, 0) + q
        adjq[v][u] = adjq[v].get(u, 0) + q
    wdeg = {n: sum(adjq[n].values()) for n in order}
    rank = {n: r for r, n in
            enumerate(sorted(order, key=lambda x: (-wdeg[x], x)))}

    UNDEC, HUB, NOT = 0, 1, 2
    status = {n: (UNDEC if wdeg[n] > 0 else NOT) for n in order}
    for _ in range(hub_rounds):
        new = dict(status)
        changed = False
        for nd in order:
            if status[nd] != UNDEC:
                continue
            hi = [m for m in adjq[nd] if rank[m] < rank[nd]]
            if any(status[m] == HUB for m in hi):
                new[nd] = NOT
                changed = True
            elif all(status[m] == NOT for m in hi):
                new[nd] = HUB
                changed = True
        status = new
        if not changed:
            break
    label_of: dict[str, str] = {n: n for n in order if status[n] == HUB}

    for _ in range(attach_rounds):
        new = dict(label_of)
        changed = False
        for nd in order:
            if nd in label_of:
                continue
            best = None  # key = (-weight, label): min key wins
            for m, q in adjq[nd].items():
                lbl = label_of.get(m)
                if lbl is None:
                    continue
                k = (-q, lbl)
                if best is None or k < best[0]:
                    best = (k, lbl)
            if best is not None:
                new[nd] = best[1]
                changed = True
        label_of = new
        if not changed:
            break

    final = [label_of.get(n, n) for n in order]
    # reuse _renumber via a string->index indirection
    sidx = {n: i for i, n in enumerate(order)}
    return _renumber(order, [sidx[l] for l in final])


def cluster_graph(
    nodes: list[str],
    edges: list[tuple[str, str, float]],
    seed_key: str = "",
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
    intra-cluster incident edge weights (accumulated in exact int64
    micro-units, emitted as micro/1e6 float64 — a single IEEE division,
    identical to the SQL mirror's CAST(sum AS DOUBLE)/1e6); truncated to
    top_k by (weight desc, token asc)."""
    acc: dict[int, dict[str, int]] = {}
    for u, v, w in edges:
        cu, cv = cluster_of[u], cluster_of[v]
        if cu != cv:
            continue
        q = quantize_weight(w)
        d = acc.setdefault(cu, {})
        d[u] = d.get(u, 0) + q
        d[v] = d.get(v, 0) + q
    # singleton clusters (no intra edges) still get an (empty) vector
    for node, c in cluster_of.items():
        acc.setdefault(c, {}).setdefault(node, 0)
    out: dict[int, dict[str, float]] = {}
    for c, vec in acc.items():
        top = sorted(vec.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        out[c] = {t: q / 1e6 for t, q in top}
    return out
