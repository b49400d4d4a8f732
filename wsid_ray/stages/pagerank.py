"""Integer-contract PageRank over the per-term pruned NPMI graphs —
the third iterative algorithm made hash-checkable by a determinism
contract (precedents: k-means Lloyd rounds, Chinese-Whispers label
rounds; the SQL mirror unrolls the same fixed number of rounds).

Contract (v1, shared verbatim with the oracle):
  * graphs are undirected: every pruned edge (term, w, v) contributes
    both directions; deg(u) = undirected degree;
  * ranks live in int64 MICRO-UNITS; r0(node) = 1_000_000 // N_term;
  * one synchronous round:
        c(u)     = r(u) // deg(u)                  (exact int division)
        s(x)     = sum over neighbours u of c(u)   (order-free int sum)
        r'(x)    = (15 * 1_000_000) // (100 * N_term)
                   + (85 * s(x)) // 100
    i.e. damping 0.85 applied in exact integer arithmetic;
  * a fixed number of rounds (no convergence test — fixpoint-free
    determinism, same rationale as the CW mirror).

Physical plan: the edge stream (already the PRUNED aggregate — model-
shaped, not corpus-shaped) is joined once with the degree table and
reused every round; each round is ONE partitioned hash join (rank →
out-edges) plus ONE bucketed sum (contributions → nodes).  Ranks and
degrees are vocabulary-bounded per term, so at 10^12-turn scale the
stream through each round stays |gazetteer| x |window vocab| rows —
the 100 TB input only ever influences this operator through the edge
weights upstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

MICRO = 1_000_000


def pagerank_micro(edges: rd.Dataset, rounds: int = 5,
                   num_buckets: int = 8,
                   weight_col: str | None = None) -> rd.Dataset:
    """edges(term, w, v[, weight_col]) -> (term, node, rank_micro)
    after ``rounds`` synchronous integer-contract PageRank rounds per
    term graph.

    ``weight_col`` (int64 micro-unit edge weights, > 0) switches to the
    weighted contract: per edge c(u→x) = (r(u) * w_e) // W_u with
    W_u = sum of u's incident weights — the unweighted case is exactly
    w_e = 1 (then c = r // deg per edge, the v1 contract)."""
    from ..pipelines.analytics import bucketed_sum
    from ..util import collect_rows
    from .joins import hash_join

    def undirect(t: pa.Table) -> pa.Table:
        w = (t[weight_col] if weight_col is not None
             else pa.array(np.ones(t.num_rows, dtype=np.int64)))
        return pa.concat_tables([
            pa.table({"term": t["term"], "u": t["w"], "x": t["v"],
                      "we": w}),
            pa.table({"term": t["term"], "u": t["v"], "x": t["w"],
                      "we": w})])

    ed = edges.map_batches(undirect, batch_format="pyarrow")

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["term", "u"], sort=True, as_index=False) \
              .agg(deg=("we", "sum"))
        g["deg"] = g["deg"].astype("int64")
        return g

    deg = bucketed_sum(ed.map_batches(deg_part, batch_format="pandas"),
                       ["term", "u"], ["deg"], num_buckets=num_buckets)

    # edges with the source degree attached — built once, reused every
    # round (the per-round join only moves the rank column)
    ed_deg = hash_join(ed, deg, on=["term", "u"],
                       num_buckets=num_buckets).materialize()

    # N_term (node counts) is gazetteer-bounded — a broadcast model
    n_of: dict[str, int] = {}
    for r in collect_rows(deg):
        n_of[r["term"]] = n_of.get(r["term"], 0) + 1
    base_of = {t: (15 * MICRO) // (100 * n) for t, n in n_of.items()}
    init_of = {t: MICRO // n for t, n in n_of.items()}
    b_ref = ray.put((base_of, init_of))

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        _, init = ray.get(b_ref)
        return pd.DataFrame({
            "term": df["term"], "node": df["u"],
            "r": df["term"].map(init).astype("int64")})

    rank = deg.map_batches(init_rank, batch_format="pandas") \
        .materialize()

    rank_schema = pa.schema([("term", pa.string()),
                             ("node", pa.string()), ("r", pa.int64())])

    for _ in range(rounds):
        j = hash_join(
            ed_deg,
            rank.map_batches(lambda df: df.rename(columns={"node": "u"}),
                             batch_format="pandas"),
            on=["term", "u"], num_buckets=num_buckets)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            # per-edge weighted contribution; unweighted (we == 1)
            # reduces exactly to r // deg
            c = ((df["r"].to_numpy() * df["we"].to_numpy())
                 // df["deg"].to_numpy()).astype(np.int64)
            g = pd.DataFrame({"term": df["term"], "node": df["x"],
                              "s": c}) \
                .groupby(["term", "node"], sort=True, as_index=False) \
                .agg(s=("s", "sum"))
            return g

        s = bucketed_sum(j.map_batches(contrib, batch_format="pandas"),
                         ["term", "node"], ["s"],
                         num_buckets=num_buckets)

        def apply_damping(df: pd.DataFrame) -> pd.DataFrame:
            base, _ = ray.get(b_ref)
            r = (df["term"].map(base).to_numpy(dtype=np.int64)
                 + (85 * df["s"].to_numpy()) // 100)
            return pd.DataFrame({"term": df["term"], "node": df["node"],
                                 "r": r.astype("int64")})

        rank = s.map_batches(apply_damping, batch_format="pandas") \
            .map_batches(lambda t: t.select(rank_schema.names)
                         .cast(rank_schema), batch_format="pyarrow") \
            .materialize()

    return rank.map_batches(
        lambda t: t.rename_columns(["term", "node", "rank_micro"]),
        batch_format="pyarrow")


def triangle_stats(edges: rd.Dataset,
                   num_buckets: int = 8) -> rd.Dataset:
    """Distributed triangle counting + global clustering coefficient per
    term graph — (term, n_triangles, n_wedges, gcc_micro) with
    gcc = 3*triangles/wedges in integer micro-units (NULL when the graph
    has no wedge).

    Plan: edges are canonical (w < v), so the path join e1.v = e2.w
    enumerates each ordered wedge a<b<c exactly once, and one more join
    against the edge set closes the triangle — the standard two-join
    distributed triangle count (node order stands in for the
    degree-order optimisation; wedges from the degree table are exact
    integers d*(d-1)//2, no float anywhere)."""
    from ..pipelines.analytics import bucketed_sum
    from .joins import hash_join

    def rename(cols):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)
        return fn

    e_ab = edges.map_batches(rename(["term", "a", "b"]),
                             batch_format="pyarrow")
    e_bc = edges.map_batches(rename(["term", "b", "c"]),
                             batch_format="pyarrow")
    # a<b<c paths: join on (term, b)
    paths = hash_join(e_ab, e_bc, on=["term", "b"],
                      num_buckets=num_buckets)
    # close the triangle: (term, a, c) must be an edge (inner join)
    e_ac = edges.map_batches(rename(["term", "a", "c"]),
                             batch_format="pyarrow")
    closed = hash_join(
        paths.map_batches(lambda t: t.select(["term", "a", "c"]),
                          batch_format="pyarrow"),
        e_ac, on=["term", "a", "c"], num_buckets=num_buckets)

    def tri_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", sort=True).size() \
              .rename("n_triangles").reset_index()
        g["n_triangles"] = g["n_triangles"].astype("int64")
        return g

    tri = bucketed_sum(closed.map_batches(tri_part,
                                          batch_format="pandas"),
                       ["term"], ["n_triangles"], num_buckets=2)

    def und(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"term": t["term"], "node": t["w"]}),
            pa.table({"term": t["term"], "node": t["v"]})])

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["term", "node"], sort=True).size() \
              .rename("d").reset_index()
        g["d"] = g["d"].astype("int64")
        return g

    deg = bucketed_sum(
        edges.map_batches(und, batch_format="pyarrow")
             .map_batches(deg_part, batch_format="pandas"),
        ["term", "node"], ["d"], num_buckets=num_buckets)

    def wedge_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df["d"].to_numpy()
        g = pd.DataFrame({"term": df["term"],
                          "n_wedges": d * (d - 1) // 2}) \
            .groupby("term", sort=True, as_index=False) \
            .agg(n_wedges=("n_wedges", "sum"))
        return g

    wed = bucketed_sum(deg.map_batches(wedge_part,
                                       batch_format="pandas"),
                       ["term"], ["n_wedges"], num_buckets=2)

    j = hash_join(wed, tri, on=["term"], how="left", num_buckets=2)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ntri = pc.fill_null(t["n_triangles"].cast(pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        nw = t["n_wedges"].to_numpy(zero_copy_only=False)
        gcc = np.where(nw > 0, (3 * ntri * MICRO) // np.maximum(nw, 1),
                       -1)
        return pa.table({
            "term": t["term"],
            "n_triangles": pa.array(ntri, type=pa.int64()),
            "n_wedges": pa.array(nw, type=pa.int64()),
            "gcc_micro": pa.array(
                [None if v < 0 else int(v) for v in gcc],
                type=pa.int64()),
        })

    return j.map_batches(finish, batch_format="pyarrow")


def edge_jaccard(edges: rd.Dataset, num_buckets: int = 8) -> rd.Dataset:
    """Per-edge structural similarity (SCAN-style): for every canonical
    pruned edge (term, w, v) — common-neighbour count, both endpoint
    degrees, and the open-neighbourhood Jaccard in integer micro-units:
    jacc = cn / (deg_w + deg_v - cn) (v ∈ N(w) and w ∈ N(v) sit in the
    union but never the intersection, so the denominator is ≥ 2).

    Plan: the same two-join a<b<c triangle enumeration as
    triangle_stats, but each closed triple is exploded back onto its
    THREE canonical edges (one bucketed sum on the edge key) instead of
    folded per term — triangles-per-edge is the classic edge
    embeddedness.  Everything is model-shaped (pruned NPMI edges)."""
    from ..pipelines.analytics import bucketed_sum
    from .joins import hash_join

    def rename(cols):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)
        return fn

    e_ab = edges.map_batches(rename(["term", "a", "b"]),
                             batch_format="pyarrow")
    e_bc = edges.map_batches(rename(["term", "b", "c"]),
                             batch_format="pyarrow")
    e_ac = edges.map_batches(rename(["term", "a", "c"]),
                             batch_format="pyarrow")
    paths = hash_join(e_ab, e_bc, on=["term", "b"],
                      num_buckets=num_buckets)
    closed = hash_join(paths, e_ac, on=["term", "a", "c"],
                       num_buckets=num_buckets)

    def explode(t: pa.Table) -> pa.Table:
        # each a<b<c triangle increments edges (a,b), (b,c), (a,c) —
        # all already canonical
        return pa.concat_tables([
            pa.table({"term": t["term"], "w": t["a"], "v": t["b"]}),
            pa.table({"term": t["term"], "w": t["b"], "v": t["c"]}),
            pa.table({"term": t["term"], "w": t["a"], "v": t["c"]})])

    def cn_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["term", "w", "v"], sort=True).size() \
              .rename("cn").reset_index()
        g["cn"] = g["cn"].astype("int64")
        return g

    cn = bucketed_sum(
        closed.map_batches(explode, batch_format="pyarrow")
              .map_batches(cn_part, batch_format="pandas"),
        ["term", "w", "v"], ["cn"], num_buckets=num_buckets)

    def und(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"term": t["term"], "node": t["w"]}),
            pa.table({"term": t["term"], "node": t["v"]})])

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["term", "node"], sort=True).size() \
              .rename("d").reset_index()
        g["d"] = g["d"].astype("int64")
        return g

    deg = bucketed_sum(
        edges.map_batches(und, batch_format="pyarrow")
             .map_batches(deg_part, batch_format="pandas"),
        ["term", "node"], ["d"], num_buckets=num_buckets)

    j = hash_join(edges, cn, on=["term", "w", "v"], how="left",
                  num_buckets=num_buckets)
    j = hash_join(
        j, deg.map_batches(rename(["term", "w", "deg_w"]),
                           batch_format="pyarrow"),
        on=["term", "w"], num_buckets=num_buckets)
    j = hash_join(
        j, deg.map_batches(rename(["term", "v", "deg_v"]),
                           batch_format="pyarrow"),
        on=["term", "v"], num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cnv = pc.fill_null(t["cn"].cast(pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        dw = t["deg_w"].to_numpy(zero_copy_only=False)
        dv = t["deg_v"].to_numpy(zero_copy_only=False)
        jm = (cnv * MICRO) // (dw + dv - cnv)
        return pa.table({
            "term": t["term"], "w": t["w"], "v": t["v"],
            "cn": pa.array(cnv, type=pa.int64()),
            "deg_w": pa.array(dw, type=pa.int64()),
            "deg_v": pa.array(dv, type=pa.int64()),
            "jacc_micro": pa.array(jm, type=pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow")


def kcore(edges: rd.Dataset, k: int = 3, rounds: int = 8,
          num_buckets: int = 8) -> rd.Dataset:
    """Bounded-round k-core peel per term graph — (term, node, deg)
    for every node still holding degree >= k after ``rounds``
    synchronous peel rounds (round = recompute undirected degrees on
    the surviving subgraph, drop nodes below k, drop their edges).

    Determinism contract (4th bounded-iteration mirror, after k-means /
    CW / PageRank): a FIXED round count, no convergence test — the SQL
    oracle unrolls the identical rounds, so engine and mirror agree
    even mid-convergence.  The alive-node set is vocabulary-bounded
    (same argument as pagerank's N_term broadcast), so the per-round
    driver collect is model-shaped; each round costs one bucketed
    degree sum over the shrinking edge stream — never a growing one."""
    from ..pipelines.analytics import bucketed_sum
    from ..util import collect_rows

    def undirect(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"term": t["term"], "u": t["w"], "x": t["v"]}),
            pa.table({"term": t["term"], "u": t["v"], "x": t["w"]})])

    und = edges.map_batches(undirect, batch_format="pyarrow") \
               .materialize()

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["term", "u"], sort=True).size() \
              .rename("d").reset_index()
        g["d"] = g["d"].astype("int64")
        return g

    def degrees(ds: rd.Dataset) -> rd.Dataset:
        return bucketed_sum(
            ds.map_batches(deg_part, batch_format="pandas"),
            ["term", "u"], ["d"], num_buckets=num_buckets)

    out_schema = pa.schema([("term", pa.string()),
                            ("node", pa.string()),
                            ("deg", pa.int64())])

    for _ in range(rounds):
        alive = {(r["term"], r["u"]) for r in collect_rows(degrees(und))
                 if r["d"] >= k}
        if not alive:   # whole graph peeled away — stable empty result
            return rd.from_arrow(out_schema.empty_table())
        a_ref = ray.put(alive)

        def prune(df: pd.DataFrame) -> pd.DataFrame:
            a = ray.get(a_ref)
            mu = pd.MultiIndex.from_arrays([df["term"], df["u"]])
            mx = pd.MultiIndex.from_arrays([df["term"], df["x"]])
            return df[mu.isin(a) & mx.isin(a)]

        und = und.map_batches(prune, batch_format="pandas") \
                 .materialize()

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        out = df[df["d"] >= k].rename(columns={"u": "node",
                                               "d": "deg"})
        return out[["term", "node", "deg"]]

    return degrees(und).map_batches(emit, batch_format="pandas") \
        .map_batches(lambda t: t.cast(out_schema),
                     batch_format="pyarrow")


def bfs_hops(edges: rd.Dataset, rounds: int = 4,
             num_buckets: int = 8) -> rd.Dataset:
    """Bounded-round multi-source BFS per term graph: hop distance from
    each term's hub node (max undirected degree, ties to the
    lexicographically smallest name) to every node reachable within
    ``rounds`` hops — (term, node, dist); unreached nodes are absent.

    Determinism: frontier BFS computes the exact shortest hop count,
    which is expansion-order-free; the only tie lives in the seed pick
    and is pinned by the (deg desc, name asc) rank.  6th bounded-
    iteration mirror (k-means / CW / PageRank / k-core / PCA
    precedents) — the SQL oracle unrolls the same rounds as
    frontier/label CTE pairs.

    Physical plan: the undirected edge stream (pruned, model-shaped) is
    pinned once; each round is ONE map over it with the current
    frontier and visited sets broadcast via ray.put — node sets are
    vocabulary-bounded per term (same scale argument as kcore's alive
    set), so the per-round driver fold is model-shaped and the corpus
    never lands on the driver."""
    from ..pipelines.analytics import bucketed_sum
    from ..stages.groups import bucketed_group_apply
    from ..util import collect_rows

    def undirect(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"term": t["term"], "u": t["w"], "x": t["v"]}),
            pa.table({"term": t["term"], "u": t["v"], "x": t["w"]})])

    und = edges.map_batches(undirect, batch_format="pyarrow") \
               .materialize()

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["term", "u"], sort=True).size() \
              .rename("d").reset_index()
        g["d"] = g["d"].astype("int64")
        return g

    deg = bucketed_sum(und.map_batches(deg_part, batch_format="pandas"),
                       ["term", "u"], ["d"], num_buckets=num_buckets)

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["term", "d", "u"],
                            ascending=[True, False, True],
                            kind="mergesort", ignore_index=True)
        return df.drop_duplicates("term", keep="first")

    seeds = collect_rows(bucketed_group_apply(deg, ["term"], top1,
                                              num_buckets=num_buckets))

    out_schema = pa.schema([("term", pa.string()), ("node", pa.string()),
                            ("dist", pa.int64())])
    visited: dict[tuple, int] = {(r["term"], r["u"]): 0 for r in seeds}
    frontier = set(visited)

    for hop in range(1, rounds + 1):
        if not frontier:
            break
        f_ref = ray.put(frontier)
        v_ref = ray.put(set(visited))

        def expand(df: pd.DataFrame) -> pd.DataFrame:
            f, v = ray.get(f_ref), ray.get(v_ref)
            mu = pd.MultiIndex.from_arrays([df["term"], df["u"]])
            out = df[mu.isin(f)][["term", "x"]]
            mx = pd.MultiIndex.from_arrays([out["term"], out["x"]])
            return out[~mx.isin(v)].drop_duplicates()

        new_rows = collect_rows(
            und.map_batches(expand, batch_format="pandas"))
        frontier = {(r["term"], r["x"]) for r in new_rows} - set(visited)
        visited.update({k: hop for k in frontier})

    if not visited:
        return rd.from_arrow(out_schema.empty_table())
    ks = sorted(visited)
    return rd.from_arrow(pa.table({
        "term": [k[0] for k in ks], "node": [k[1] for k in ks],
        "dist": [visited[k] for k in ks]}).cast(out_schema))


def adamic_adar(edges: rd.Dataset, num_buckets: int = 8) -> rd.Dataset:
    """Adamic–Adar link prediction over the pruned NPMI ego graphs:
    for every NON-adjacent node pair (u < v) sharing at least one
    common neighbour, n_common and aa_micro = Σ_z floor(1e6/ln(deg z)
    + 0.5) — per-z terms quantised to int64 micro-units first, so the
    distributed sum is order-free (a common neighbour has deg ≥ 2, so
    ln > 0 always).

    Plan: the edge stream is MATERIALIZED once (model-shaped — the
    pruned NPMI edges are vocab-bounded, the same size argument as the
    disambiguation inventory) so its three consumers don't re-execute
    the cooc front-end; wedge pairs come from a per-hub bucketed group
    expansion — the hub's degree and its 1/ln(deg) term are known
    inside the group, so no degree join exists at all — followed by
    one bucketed per-pair sum and an anti filter against the edge
    set."""
    import pyarrow.compute as pc

    from ..pipelines.analytics import bucketed_sum
    from ..util import collect_rows
    from .groups import bucketed_group_apply
    from .joins import semi_join

    edges = edges.materialize()

    def und(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"term": t["term"], "z": t["w"], "x": t["v"]}),
            pa.table({"term": t["term"], "z": t["v"], "x": t["w"]})])

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorised within-group all-pairs: sort by (term, z, x)
        # so every hub's neighbour list is a sorted contiguous run
        # (u < v for free), then the classic repeat/offset expansion —
        # no Python loop over hubs
        df = df.sort_values(["term", "z", "x"], kind="mergesort",
                            ignore_index=True)
        gid = (df["term"] + "\x00" + df["z"]).to_numpy()
        new_g = np.concatenate(([True], gid[1:] != gid[:-1]))
        g_codes = np.cumsum(new_g) - 1
        sizes = np.bincount(g_codes)
        n = len(df)
        starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        pos = np.arange(n) - starts[g_codes]
        reps = sizes[g_codes] - 1 - pos           # later elems to pair
        P = int(reps.sum())
        if P == 0:
            return pd.DataFrame({
                "term": pd.Series(dtype=object),
                "u": pd.Series(dtype=object),
                "v": pd.Series(dtype=object),
                "n_common": pd.Series(dtype="int64"),
                "aa_micro": pd.Series(dtype="int64")})
        u_idx = np.repeat(np.arange(n), reps)
        blk_start = np.concatenate(([0], np.cumsum(reps)[:-1]))
        off = np.arange(P) - np.repeat(blk_start, reps)
        v_idx = u_idx + off + 1
        # size-1 hubs emit no pairs; clamp them to 2 so the (unused)
        # 1/ln term stays finite instead of warning on the int cast
        t_micro = np.floor(1e6 / np.log(np.maximum(
            sizes[g_codes], 2).astype(np.float64)) + 0.5) \
            .astype(np.int64)
        xs = df["x"].to_numpy()
        out = pd.DataFrame({
            "term": df["term"].to_numpy()[u_idx],
            "u": xs[u_idx], "v": xs[v_idx],
            "n_common": np.int64(1), "aa_micro": t_micro[u_idx]})
        return out.groupby(["term", "u", "v"], as_index=False).agg(
            n_common=("n_common", "sum"), aa_micro=("aa_micro", "sum"))

    part_schema = pa.schema([("term", pa.string()), ("u", pa.string()),
                             ("v", pa.string()),
                             ("n_common", pa.int64()),
                             ("aa_micro", pa.int64())])
    partials = bucketed_group_apply(
        edges.map_batches(und, batch_format="pyarrow"),
        ["term", "z"], expand, num_buckets=num_buckets,
        out_schema=part_schema)
    pairs = bucketed_sum(partials, ["term", "u", "v"],
                         ["n_common", "aa_micro"],
                         num_buckets=num_buckets)

    edge_keys = {f"{r['term']}|{r['w']}|{r['v']}"
                 for r in collect_rows(edges)}

    def keyed(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(t["term"], t["u"], t["v"], "|")
        return t.append_column("__k", k)

    out = semi_join(pairs.map_batches(keyed, batch_format="pyarrow"),
                    edge_keys, "__k", anti=True)
    return out.map_batches(lambda t: t.drop(["__k"]),
                           batch_format="pyarrow")


def degree_assortativity(edges: rd.Dataset,
                         num_buckets: int = 8) -> rd.Dataset:
    """Per-term degree assortativity (Newman 2002 r) of the NPMI ego
    graphs — do hub context words attach to hubs or to leaves?  Each
    undirected edge contributes both (deg_w, deg_v) and the swap, so the
    x/y marginals coincide and r = (M·Σxy − Σx²ₘ) / (M·Σx² − Σx²ₘ) with
    exact integer moments and ONE float division quantised to micro
    (NULL for zero-variance/regular graphs — same rule in the DuckDB
    mirror).

    One shuffle keyed on the term (graphs are window/vocab-bounded);
    inside a bucket everything is pandas value_counts/map — no second
    pass over the raw edge stream."""
    from .groups import bucketed_group_apply

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        terms, n_edges, r_micro = [], [], []
        for term, g in df.groupby("term", sort=False):
            deg = pd.concat([g["w"], g["v"]]).value_counts()
            dw = g["w"].map(deg).to_numpy(dtype=np.int64)
            dv = g["v"].map(deg).to_numpy(dtype=np.int64)
            x = np.concatenate([dw, dv])
            y = np.concatenate([dv, dw])
            m2 = len(x)
            sx = int(x.sum())
            sxy = int((x * y).sum())
            sx2 = int((x * x).sum())
            num = m2 * sxy - sx * sx
            den = m2 * sx2 - sx * sx
            terms.append(term)
            n_edges.append(len(g))
            r_micro.append(None if den == 0 else
                           int(np.floor(float(num) / float(den)
                                        * 1e6 + 0.5)))
        return pd.DataFrame({
            "term": pd.Series(terms, dtype="string"),
            "n_edges": pd.Series(n_edges, dtype="int64"),
            "r_micro": pd.array(r_micro, dtype="Int64")})

    out_schema = pa.schema([("term", pa.string()),
                            ("n_edges", pa.int64()),
                            ("r_micro", pa.int64())])
    return bucketed_group_apply(edges, ["term"], fn,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def hits_micro(edges: rd.Dataset, rounds: int = 3,
               num_buckets: int = 8) -> rd.Dataset:
    """HITS hubs/authorities (Kleinberg 1999) over the per-term pruned
    NPMI ego graphs — the mutual-reinforcement companion to PageRank:
    a node is a good authority if good hubs point at it, a good hub if
    it points at good authorities.  On the undirected co-occurrence
    graphs both roles are computed over the symmetric edge stream.

    Contract (v1, shared verbatim with the unrolled CTE oracle —
    the 8th bounded-iteration mirror):
      * scores live in int64 MICRO-UNITS; h0(u) = 1_000_000 // N_term;
      * one synchronous round (L1-normalised power iteration):
            a_raw(x) = Σ_{u~x} h(u)          (exact int sum)
            a(x)     = (a_raw(x)·1e6) // S_a  (S_a = Σ_x a_raw(x))
            h_raw(x) = Σ_{u~x} a(u)
            h(x)     = (h_raw(x)·1e6) // S_h
      * a fixed number of rounds, no convergence test.

    Physical plan: like pagerank_micro — the undirected edge stream is
    model-shaped (pruned NPMI aggregate, vocabulary-bounded per term);
    each half-step is ONE partitioned hash join (score → out-edges)
    plus ONE bucketed sum; the per-term L1 totals are gazetteer-bounded
    and broadcast via ray.put.  The corpus reaches this operator only
    through the upstream edge weights."""
    from ..pipelines.analytics import bucketed_sum
    from ..util import collect_rows
    from .joins import hash_join

    def undirect(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"term": t["term"], "u": t["w"], "x": t["v"]}),
            pa.table({"term": t["term"], "u": t["v"], "x": t["w"]})])

    ed = edges.map_batches(undirect, batch_format="pyarrow") \
        .materialize()

    def nodes_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df[["term", "u"]].drop_duplicates()
        return g.assign(one=np.int64(1))

    deg = bucketed_sum(
        ed.map_batches(nodes_part, batch_format="pandas"),
        ["term", "u"], ["one"], num_buckets=num_buckets)

    n_of: dict[str, int] = {}
    for r in collect_rows(deg):
        n_of[r["term"]] = n_of.get(r["term"], 0) + 1
    init_of = {t: MICRO // n for t, n in n_of.items()}
    init_ref = ray.put(init_of)

    def init_score(df: pd.DataFrame) -> pd.DataFrame:
        init = ray.get(init_ref)
        g = df[["term", "u"]].drop_duplicates()
        return pd.DataFrame({
            "term": g["term"], "node": g["u"],
            "v": g["term"].map(init).astype("int64")})

    score_schema = pa.schema([("term", pa.string()),
                              ("node", pa.string()),
                              ("v", pa.int64())])

    def half_step(score: rd.Dataset) -> rd.Dataset:
        """score(term, node, v) -> L1-normalised neighbour sums."""
        j = hash_join(
            ed,
            score.map_batches(
                lambda df: df.rename(columns={"node": "u"}),
                batch_format="pandas"),
            on=["term", "u"], num_buckets=num_buckets)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            g = pd.DataFrame({"term": df["term"], "node": df["x"],
                              "s": df["v"]}) \
                .groupby(["term", "node"], sort=True,
                         as_index=False).agg(s=("s", "sum"))
            return g

        raw = bucketed_sum(
            j.map_batches(contrib, batch_format="pandas"),
            ["term", "node"], ["s"], num_buckets=num_buckets) \
            .materialize()

        tot: dict[str, int] = {}
        for r in collect_rows(bucketed_sum(
                raw.map_batches(
                    lambda df: df.groupby("term", as_index=False)
                    .agg(t=("s", "sum")).astype({"t": "int64"}),
                    batch_format="pandas"),
                ["term"], ["t"], num_buckets=2)):
            tot[r["term"]] = int(r["t"])
        tot_ref = ray.put(tot)

        def norm(df: pd.DataFrame) -> pd.DataFrame:
            t = ray.get(tot_ref)
            tv = df["term"].map(t).to_numpy(dtype=np.int64)
            v = (df["s"].to_numpy(dtype=np.int64) * MICRO) // tv
            return pd.DataFrame({"term": df["term"],
                                 "node": df["node"],
                                 "v": v.astype("int64")})

        return raw.map_batches(norm, batch_format="pandas") \
            .map_batches(lambda t: t.select(score_schema.names)
                         .cast(score_schema), batch_format="pyarrow") \
            .materialize()

    h = deg.map_batches(init_score, batch_format="pandas") \
        .map_batches(lambda t: t.select(score_schema.names)
                     .cast(score_schema), batch_format="pyarrow") \
        .materialize()
    a = h
    for _ in range(rounds):
        a = half_step(h)
        h = half_step(a)

    ar = a.map_batches(
        lambda df: df.rename(columns={"v": "auth_micro"}),
        batch_format="pandas")
    hr = h.map_batches(
        lambda df: df.rename(columns={"v": "hub_micro"}),
        batch_format="pandas")
    return hash_join(ar, hr, on=["term", "node"],
                     num_buckets=num_buckets)


def clustering_coefficients(edges: rd.Dataset,
                            num_buckets: int = 8) -> rd.Dataset:
    """LOCAL clustering coefficient per node of each term's NPMI ego
    graph — lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) in integer
    micro-units (NULL when deg < 2) — the per-node community-tightness
    score beside the per-term global coefficient of triangle_stats.

    Exact integers throughout: triangles enumerate once per a<b<c via
    the same two canonical-edge joins as triangle_stats, then explode
    to the three member nodes; degrees fold from the undirected
    stream; the division is a single exact (2·T·1e6) // (d·(d−1)).

    Scale: same bounded plan as triangle_stats — the edge stream is
    the pruned model-shaped aggregate; triangle rows are graph-sized,
    never corpus-sized."""
    from ..pipelines.analytics import bucketed_sum
    from .joins import hash_join

    edges = edges.map_batches(
        lambda t: t.select(["term", "w", "v"]), batch_format="pyarrow")

    def rename(cols):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(cols)
        return fn

    e_ab = edges.map_batches(rename(["term", "a", "b"]),
                             batch_format="pyarrow")
    e_bc = edges.map_batches(rename(["term", "b", "c"]),
                             batch_format="pyarrow")
    paths = hash_join(e_ab, e_bc, on=["term", "b"],
                      num_buckets=num_buckets)
    e_ac = edges.map_batches(rename(["term", "a", "c"]),
                             batch_format="pyarrow")
    closed = hash_join(paths, e_ac, on=["term", "a", "c"],
                       num_buckets=num_buckets)

    def member_part(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.concat([
            df[["term", "a"]].rename(columns={"a": "node"}),
            df[["term", "b"]].rename(columns={"b": "node"}),
            df[["term", "c"]].rename(columns={"c": "node"})],
            ignore_index=True) \
            .groupby(["term", "node"], sort=True).size() \
            .rename("t").reset_index()
        g["t"] = g["t"].astype("int64")
        return g

    tri = bucketed_sum(
        closed.map_batches(member_part, batch_format="pandas"),
        ["term", "node"], ["t"], num_buckets=num_buckets)

    def und(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"term": t["term"], "node": t["w"]}),
            pa.table({"term": t["term"], "node": t["v"]})])

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["term", "node"], sort=True).size() \
              .rename("deg").reset_index()
        g["deg"] = g["deg"].astype("int64")
        return g

    deg = bucketed_sum(
        edges.map_batches(und, batch_format="pyarrow")
             .map_batches(deg_part, batch_format="pandas"),
        ["term", "node"], ["deg"], num_buckets=num_buckets)

    j = hash_join(deg, tri, on=["term", "node"], how="left",
                  num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        tt = pc.fill_null(t["t"].cast(pa.int64()), 0) \
            .to_numpy(zero_copy_only=False)
        d = t["deg"].to_numpy(zero_copy_only=False)
        den = d * (d - 1)
        lcc = np.where(den > 0,
                       (2 * tt * MICRO) // np.maximum(den, 1), -1)
        return pa.table({
            "term": t["term"], "node": t["node"],
            "deg": pa.array(d, type=pa.int64()),
            "n_triangles": pa.array(tt, type=pa.int64()),
            "lcc_micro": pa.array(
                [None if v < 0 else int(v) for v in lcc],
                type=pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow")


def ppr_micro(edges: rd.Dataset, rounds: int = 5,
              num_buckets: int = 8) -> rd.Dataset:
    """PERSONALIZED PageRank per term graph: teleport mass returns to
    the term's hub node (max undirected degree, lexicographically
    smallest name on ties — the bfs_hops seed rule) instead of
    spreading uniformly — local importance around the hub, the
    query-biased ranking of Jeh & Widom 2003 / Haveliwala 2002.

    Contract (v1, 9th bounded-iteration mirror): ranks in int64
    micro-units; r0 = 1e6 at the seed, 0 elsewhere; one synchronous
    round
        c(u)  = r(u) // deg(u)            (per incident edge)
        s(x)  = Σ_{u~x} c(u)              (exact int sum)
        r'(x) = [x = seed]·150000 + (85·s(x)) // 100
    for a fixed number of rounds; every node keeps a row each round
    (each node in the pruned graph has ≥ 1 neighbour, so the
    contribution join is total).

    Physical plan: identical to pagerank_micro — per round ONE
    partitioned hash join + ONE bucketed sum over the model-shaped
    edge stream; the seed map is gazetteer-bounded and broadcast."""
    from ..pipelines.analytics import bucketed_sum
    from ..util import collect_rows
    from .joins import hash_join

    def undirect(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"term": t["term"], "u": t["w"], "x": t["v"]}),
            pa.table({"term": t["term"], "u": t["v"], "x": t["w"]})])

    ed = edges.map_batches(
        lambda t: t.select(["term", "w", "v"]),
        batch_format="pyarrow") \
        .map_batches(undirect, batch_format="pyarrow")

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["term", "u"], sort=True, as_index=False) \
              .size().rename(columns={"size": "deg"})
        return g.astype({"deg": "int64"})

    deg = bucketed_sum(ed.map_batches(deg_part, batch_format="pandas"),
                       ["term", "u"], ["deg"], num_buckets=num_buckets)

    ed_deg = hash_join(ed, deg, on=["term", "u"],
                       num_buckets=num_buckets).materialize()

    # seed per term: (deg desc, name asc) — gazetteer-bounded
    seed_of: dict[str, str] = {}
    best: dict[str, tuple[int, str]] = {}
    for r in collect_rows(deg):
        key = (-int(r["deg"]), r["u"])
        if r["term"] not in best or key < best[r["term"]]:
            best[r["term"]] = key
            seed_of[r["term"]] = r["u"]
    seed_ref = ray.put(seed_of)

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        seeds = ray.get(seed_ref)
        sv = df["term"].map(seeds)
        r = np.where(df["u"].to_numpy() == sv.to_numpy(), MICRO, 0)
        return pd.DataFrame({"term": df["term"], "node": df["u"],
                             "r": r.astype("int64")})

    rank_schema = pa.schema([("term", pa.string()),
                             ("node", pa.string()), ("r", pa.int64())])
    rank = deg.map_batches(init_rank, batch_format="pandas") \
        .map_batches(lambda t: t.select(rank_schema.names)
                     .cast(rank_schema), batch_format="pyarrow") \
        .materialize()

    for _ in range(rounds):
        j = hash_join(
            ed_deg,
            rank.map_batches(lambda df: df.rename(columns={"node": "u"}),
                             batch_format="pandas"),
            on=["term", "u"], num_buckets=num_buckets)

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            c = (df["r"].to_numpy() // df["deg"].to_numpy()) \
                .astype(np.int64)
            return pd.DataFrame({"term": df["term"], "node": df["x"],
                                 "s": c}) \
                .groupby(["term", "node"], sort=True,
                         as_index=False).agg(s=("s", "sum"))

        s = bucketed_sum(j.map_batches(contrib, batch_format="pandas"),
                         ["term", "node"], ["s"],
                         num_buckets=num_buckets)

        def damp(df: pd.DataFrame) -> pd.DataFrame:
            seeds = ray.get(seed_ref)
            sv = df["term"].map(seeds)
            base = np.where(df["node"].to_numpy() == sv.to_numpy(),
                            (15 * MICRO) // 100, 0).astype(np.int64)
            r = base + (85 * df["s"].to_numpy()) // 100
            return pd.DataFrame({"term": df["term"],
                                 "node": df["node"],
                                 "r": r.astype("int64")})

        rank = s.map_batches(damp, batch_format="pandas") \
            .map_batches(lambda t: t.select(rank_schema.names)
                         .cast(rank_schema), batch_format="pyarrow") \
            .materialize()

    return rank.map_batches(
        lambda t: t.rename_columns(["term", "node", "ppr_micro"]),
        batch_format="pyarrow")


def stress_centrality(edges: rd.Dataset, num_buckets: int = 8) -> rd.Dataset:
    """Bounded-hop (≤3) stress centrality per term ego graph: for every
    interior node v, the COUNT of shortest paths passing through it —
    stress(v) = Σ_{s<t, d(s,t)≤3} σ_st(v) (Shimbel 1953; the integer
    sibling of Brandes betweenness, exact with no float fractions).

    Contract: shortest-path counts σ_d(s,t) come from the standard BFS
    recurrence σ_d = σ_{d−1}·A masked to the round-d frontier —
    expansion-order-free, so the result is deterministic with no
    tie-break pins; pair (s,t) contributes σ_sv·σ_vt exactly when
    d(s,v)+d(v,t)=d(s,t), which the mirror enforces by joining the
    shortest-pairs table on dist = d1+d2 (one row per pair at its
    shortest distance).  All-integer; zero-stress nodes are absent
    from the output in both engines.

    Physical plan: each term's undirected edge set co-locates in one
    bucket task (model-shaped, vocab-bounded — the kcore/bfs_hops scale
    argument); per term the σ matrices are three int64 matmuls over the
    bounded adjacency, and the s,t-fold is one einsum per leg pair —
    no Python loop over nodes, no driver collect."""
    from ..stages.groups import bucketed_group_apply

    def undirect(t: pa.Table) -> pa.Table:
        return pa.concat_tables([
            pa.table({"term": t["term"], "u": t["w"], "x": t["v"]}),
            pa.table({"term": t["term"], "u": t["v"], "x": t["w"]})])

    und = edges.map_batches(undirect, batch_format="pyarrow")
    out_schema = pa.schema([("term", pa.string()), ("node", pa.string()),
                            ("stress", pa.int64())])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for term, g in df.groupby("term", sort=True):
            names = np.unique(np.concatenate(
                [g["u"].to_numpy(), g["x"].to_numpy()]))
            idx = {nm: i for i, nm in enumerate(names)}
            n = len(names)
            A = np.zeros((n, n), dtype=np.int64)
            A[g["u"].map(idx).to_numpy(np.int64),
              g["x"].map(idx).to_numpy(np.int64)] = 1
            eye = np.eye(n, dtype=bool)
            S1 = A
            R1 = A.astype(bool) | eye
            T2 = S1 @ A
            F2 = (T2 > 0) & ~R1
            S2 = np.where(F2, T2, 0)
            # dist-3 frontier: only its indicator is needed (dist-3
            # legs never occur inside a ≤3-hop shortest pair)
            F3 = (S2 @ A > 0) & ~(R1 | F2)
            M2 = F2.astype(np.int64)
            M3 = F3.astype(np.int64)
            # ordered (s,t) double-counts each unordered pair → // 2
            tot = (np.einsum("sv,st,vt->v", S1, M2, S1)
                   + np.einsum("sv,st,vt->v", S1, M3, S2)
                   + np.einsum("sv,st,vt->v", S2, M3, S1)) // 2
            nz = np.nonzero(tot)[0]
            if len(nz):
                outs.append(pd.DataFrame({
                    "term": term, "node": names[nz], "stress": tot[nz]}))
        if not outs:
            return out_schema.empty_table().to_pandas()
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(und, ["term"], per_bucket,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def hub_cheapest_paths(edges: rd.Dataset, rounds: int = 4,
                       num_buckets: int = 8) -> rd.Dataset:
    """Bounded-round weighted single-source cheapest paths per term ego
    graph: synchronous Bellman–Ford relaxation from the hub (max
    degree, ties to the lexicographically smallest name — the bfs_hops
    seed rule) over integer NPMI costs, cost(u,x) = 1_000_000 − wq
    with wq = floor(npmi·1e6 + 0.5) (the weighted-PageRank
    quantisation) — stronger association = cheaper hop, cost ≥ 0
    because npmi ≤ 1.  d_k(v) = min cost over ≤k-edge paths; the min
    fold is expansion-order-free, so the fixed-round synchronous
    relaxation is deterministic with no tie-break pins beyond the
    seed.  7th bounded-iteration mirror (k-means / CW / PageRank /
    k-core / PCA / BFS precedents) — the SQL oracle unrolls the same
    rounds as candidate/min CTE pairs.

    Physical plan: the quantised undirected cost stream is pinned
    once; each round is ONE map over it with the current distance map
    broadcast via ray.put, per-batch partial (term, node) mins, and a
    model-shaped driver fold (node sets are vocabulary-bounded per
    term — the kcore/bfs scale argument)."""
    from ..pipelines.analytics import bucketed_sum
    from ..stages.groups import bucketed_group_apply
    from ..util import collect_rows

    def undirect(t: pa.Table) -> pa.Table:
        wq = np.floor(t["npmi"].to_numpy(zero_copy_only=False)
                      * 1e6 + 0.5).astype(np.int64)
        cost = pa.array(1_000_000 - wq, type=pa.int64())
        return pa.concat_tables([
            pa.table({"term": t["term"], "u": t["w"], "x": t["v"],
                      "cost": cost}),
            pa.table({"term": t["term"], "u": t["v"], "x": t["w"],
                      "cost": cost})])

    und = edges.map_batches(undirect, batch_format="pyarrow") \
               .materialize()

    def deg_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["term", "u"], sort=True).size() \
              .rename("d").reset_index()
        g["d"] = g["d"].astype("int64")
        return g

    deg = bucketed_sum(und.map_batches(deg_part, batch_format="pandas"),
                       ["term", "u"], ["d"], num_buckets=num_buckets)

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["term", "d", "u"],
                            ascending=[True, False, True],
                            kind="mergesort", ignore_index=True)
        return df.drop_duplicates("term", keep="first")

    seeds = collect_rows(bucketed_group_apply(deg, ["term"], top1,
                                              num_buckets=num_buckets))
    out_schema = pa.schema([("term", pa.string()), ("node", pa.string()),
                            ("dist", pa.int64())])
    dist: dict[tuple, int] = {(r["term"], r["u"]): 0 for r in seeds}

    for _ in range(rounds):
        if not dist:
            break
        d_ref = ray.put(dist)

        def relax(df: pd.DataFrame) -> pd.DataFrame:
            d = ray.get(d_ref)
            src = pd.Series(d).reindex(
                pd.MultiIndex.from_arrays([df["term"], df["u"]]))
            cand = src.to_numpy(np.float64) \
                + df["cost"].to_numpy(np.float64)
            out = pd.DataFrame({"term": df["term"].to_numpy(),
                                "x": df["x"].to_numpy(), "nd": cand})
            out = out[np.isfinite(cand)]
            return out.groupby(["term", "x"], sort=False,
                               as_index=False)["nd"].min()

        changed = False
        for r in collect_rows(und.map_batches(relax,
                                              batch_format="pandas")):
            k, nd = (r["term"], r["x"]), int(r["nd"])
            if nd < dist.get(k, 1 << 62):
                dist[k] = nd
                changed = True
        if not changed:
            break

    if not dist:
        return rd.from_arrow(out_schema.empty_table())
    ks = sorted(dist)
    return rd.from_arrow(pa.table({
        "term": [k[0] for k in ks], "node": [k[1] for k in ks],
        "dist": [dist[k] for k in ks]}).cast(out_schema))
