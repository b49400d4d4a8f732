"""Distributed k-means (Lloyd's algorithm) over an embedding column —
the document-clustering building block of a training-data pipeline
(corpus balancing, domain mixing, cluster-based dedup).

Determinism contract (what makes an ITERATIVE float algorithm hash-exact
against a DuckDB mirror — __ray_entry__._sql_kmeans):

  * embeddings are quantised to int64 micro-units once
    (``q = floor(|x|·1e6 + 0.5)·sign(x)`` on the float64 view of the
    float32 value — both sides compute the identical double);
  * every distance is an EXACT int64 sum of squared differences —
    associative, so block/batch order can't change it;
  * the assignment is ``min(dist·k + cid)``: cluster = key % k, so ties
    on distance break to the lowest centroid id on both sides;
  * the centroid update rounds the exact integer mean half-away-from-zero
    in pure integer arithmetic (``(2S + n) // (2n)`` with a sign case) —
    no float accumulation anywhere, so distributed partial sums combine
    in any order.

Scale shape: each Lloyd iteration is one ``map_batches`` pass emitting
k×dim int64 partial sums per block (tiny — combined on the driver, the
documented small-aggregate pattern), centroids broadcast via ``ray.put``;
the corpus is re-scanned per iteration (streaming recompute plan — never
materialised).  Overflow headroom: |q| ≲ a few 1e6, so squared terms stay
< 2^60 for dims into the thousands, and 2·S fits int64 up to ~3·10^12
members per cluster per unit scale — beyond that, widen to object-free
int128 chunking before trusting the exact contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .knn import _to_matrix, read_embeddings

_SCALE = 1_000_000


def quantize(x: np.ndarray) -> np.ndarray:
    """float -> int64 micro-units, round half away from zero (mirrors the
    SQL ``floor(abs(x)*1e6 + 0.5) * sign(x)``)."""
    x = x.astype(np.float64, copy=False)
    return (np.floor(np.abs(x) * _SCALE + 0.5)
            * np.sign(x)).astype(np.int64)


def _keys(Q: np.ndarray, cents: np.ndarray, k: int) -> np.ndarray:
    """Per-row assignment key min(dist·k + cid) — exact int64."""
    # ||q - c||² via the expansion; int64 matmul is exact (no BLAS float
    # path) and n·k·dim here is small per batch
    d = ((Q * Q).sum(axis=1, dtype=np.int64)[:, None]
         - 2 * (Q @ cents.T)
         + (cents * cents).sum(axis=1, dtype=np.int64)[None, :])
    return (d * np.int64(k)
            + np.arange(k, dtype=np.int64)[None, :]).min(axis=1)


def _init_centroids(embeds: rd.Dataset, k: int) -> np.ndarray:
    """Quantised embeddings of the k smallest vec_ids: per-block partial
    min-k, tiny driver merge (never a global sort)."""
    def part(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return t.take(pa.array(take))

    rows = embeds.map_batches(part, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["vec_id"])
    return quantize(np.asarray([r["embedding"] for r in rows[:k]],
                               dtype=np.float64))


def kmeans_fit(embeds: rd.Dataset, k: int = 4,
               iters: int = 3) -> "np.ndarray":
    """Run the integer-contract Lloyd loop and return the FINAL
    centroids (k × dim quantised ints) — the fit half of
    ``kmeans_assign``, exposed so PQ asymmetric-distance scoring
    (``pq_adc_topk``) can build its lookup tables from the same
    centroids the codes were assigned against."""
    cents = _init_centroids(embeds, k)
    dim = cents.shape[1]

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            C = ray.get(_ref)
            Q = quantize(_to_matrix(t["embedding"]))
            key = _keys(Q, C, k)
            cl = (key % k).astype(np.int64)
            sums = np.zeros((k, dim), dtype=np.int64)
            np.add.at(sums, cl, Q)
            n = np.bincount(cl, minlength=k).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.arange(k, dtype=np.int64)),
                "n": pa.array(n),
                "s": pa.array(list(sums), type=pa.list_(pa.int64())),
            })

        parts = embeds.map_batches(partial,
                                   batch_format="pyarrow").take_all()
        sums = np.zeros((k, dim), dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["cid"]] += np.asarray(r["s"], dtype=np.int64)
            counts[r["cid"]] += r["n"]
        nz = counts > 0
        S, n = sums[nz], counts[nz][:, None]
        # integer round-half-away-from-zero of S / n; empty clusters
        # keep their previous centroid (shared rule with the SQL mirror)
        newc = np.where(S >= 0, (2 * S + n) // (2 * n),
                        -((-2 * S + n) // (2 * n)))
        cents = cents.copy()
        cents[nz] = newc
    return cents


def kmeans_assign(embeds: rd.Dataset, k: int = 4, iters: int = 3,
                  include_q: bool = False) -> rd.Dataset:
    """Fit k-means for ``iters`` Lloyd iterations and return the final
    assignment: (vec_id, cluster, dist) with dist the exact quantised
    squared distance (``include_q=True`` additionally carries the
    quantised vector for downstream within-cluster work, e.g.
    semantic_dedup).  See module docstring for the determinism and
    scale contract."""
    cents = kmeans_fit(embeds, k=k, iters=iters)
    ref = ray.put(cents)

    def assign(t: pa.Table, _ref=ref) -> pa.Table:
        C = ray.get(_ref)
        Q = quantize(_to_matrix(t["embedding"]))
        key = _keys(Q, C, k)
        cols = {
            "vec_id": t["vec_id"],
            "cluster": pa.array(key % k, type=pa.int64()),
            "dist": pa.array(key // k, type=pa.int64()),
        }
        if include_q:
            cols["qe"] = pa.array(list(Q), type=pa.list_(pa.int64()))
        return pa.table(cols)

    return embeds.map_batches(assign, batch_format="pyarrow")


def semantic_dedup(embeds: rd.Dataset, k: int = 4, iters: int = 3,
                   tau: float = 0.35,
                   num_buckets: int | None = None,
                   chunk_rows: int = 2048) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space with k-means, then drop near-identical members WITHIN each
    cluster.

    Mega-cluster guard (VERDICT r03 item 4): the within-cluster pair
    search is BLOCKED, not single-task.  Members split into
    ``ceil(size/chunk_rows)`` chunks by ``vec_id % n_chunks``
    (deterministic, no extra shuffle); each row is replicated to its
    chunk's pair tasks (cluster, ca, cb), ca <= cb, so one skewed
    cluster of n rows becomes (n/m)²/2 tasks of <= 2m rows instead of
    one O(n²) task.  Pair tiles emit per-vector partials (min witness,
    similar-count) folded by a final (min, sum) aggregate — the drop
    set is EXACTLY the all-pairs answer, so the SQL mirror is unchanged
    and a skewed k-means costs duplication (n/m copies of the hot
    cluster's rows), never a straggler task.

    Determinism: cosine is computed per pair from the integer-exact
    quantised vectors (int64 dot / product of float64 sqrts of int64
    norms — no float summation anywhere), rounded half-away-from-zero
    at 6 dp, so the split into tiles cannot change any verdict.  Drop
    rule: a vector is dropped iff a SMALLER vec_id in its cluster has
    cosine >= tau; output one row per dropped vector with its smallest
    witness and its count of similar smaller neighbours."""
    import pandas as pd

    from ..util import collect_rows
    from .groups import bucketed_group_apply

    asg = kmeans_assign(embeds, k=k, iters=iters, include_q=True)
    asg = asg.materialize()  # two consumers: size census + pair explode

    # per-cluster sizes: a k-row aggregate (tiny, driver-mergeable)
    def _sizes(t: pa.Table) -> pa.Table:
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        n = np.bincount(cl, minlength=k).astype(np.int64)
        return pa.table({"cluster": pa.array(np.arange(k, dtype=np.int64)),
                         "n": pa.array(n)})

    counts = np.zeros(k, dtype=np.int64)
    for r in collect_rows(asg.map_batches(_sizes, batch_format="pyarrow")):
        counts[r["cluster"]] += r["n"]
    n_chunks = np.maximum(1, -(-counts // chunk_rows))  # ceil

    def explode(t: pa.Table) -> pa.Table:
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        nc = n_chunks[cl]
        my = t["vec_id"].to_numpy(zero_copy_only=False) % nc
        reps = nc.astype(np.int64)
        idx = np.repeat(np.arange(len(cl), dtype=np.int64), reps)
        other = (np.arange(int(reps.sum()), dtype=np.int64)
                 - np.repeat(np.cumsum(reps) - reps, reps))
        mine = my[idx]
        ca = np.minimum(mine, other)
        cb = np.maximum(mine, other)
        out = t.take(pa.array(idx))
        out = out.append_column("chunk", pa.array(mine, type=pa.int64()))
        out = out.append_column("ca", pa.array(ca, type=pa.int64()))
        return out.append_column("cb", pa.array(cb, type=pa.int64()))

    tiles = asg.map_batches(explode, batch_format="pyarrow")

    def pair_tile(df: pd.DataFrame) -> pd.DataFrame:
        out_v, out_w, out_n = [], [], []
        for (_, ca, cb), g in df.groupby(["cluster", "ca", "cb"],
                                         sort=False):
            Q = np.vstack(g["qe"].to_numpy()).astype(np.int64)
            ids = g["vec_id"].to_numpy()
            chunk = g["chunk"].to_numpy()
            nq = (Q * Q).sum(axis=1, dtype=np.int64)
            ok = nq > 0
            Q, ids, chunk, nq = Q[ok], ids[ok], chunk[ok], nq[ok]
            a_m, b_m = chunk == ca, chunk == cb
            QA, ia, na = Q[a_m], ids[a_m], nq[a_m]
            QB, ib, nb = Q[b_m], ids[b_m], nq[b_m]
            if not len(ia) or not len(ib):
                continue
            dot = (QA @ QB.T).astype(np.float64)
            den = (np.sqrt(na.astype(np.float64))[:, None]
                   * np.sqrt(nb.astype(np.float64))[None, :])
            cos = dot / den
            cos6 = np.floor(np.abs(cos) * 1e6 + 0.5) * np.sign(cos) / 1e6
            sim = cos6 >= tau
            if ca == cb:
                sim &= ia[:, None] != ib[None, :]  # self-pairs
            # smaller id is the witness, larger is the (maybe) dropped
            small_a = ia[:, None] < ib[None, :]
            for drop_ids, wit_ids, m in (
                    (ib, ia, sim & small_a),        # b dropped by a
                    (ia, ib, (sim & ~small_a).T)):  # a dropped by b
                hits = m.sum(axis=0)
                has = hits > 0
                if not has.any():
                    continue
                # witnesses ordered by id for a correct min via argmax
                order = np.argsort(wit_ids, kind="stable")
                m_o = m[order][:, has]
                out_v.extend(drop_ids[has])
                out_w.extend(wit_ids[order][m_o.argmax(axis=0)])
                out_n.extend(hits[has])
                if ca == cb:
                    break  # one triangular pass covers both directions
        return pd.DataFrame({
            "vec_id": pd.Series(out_v, dtype="int64"),
            "kept_by": pd.Series(out_w, dtype="int64"),
            "n_sim": pd.Series(out_n, dtype="int64"),
        })

    partials = bucketed_group_apply(
        tiles, ["cluster", "ca", "cb"], pair_tile,
        num_buckets=num_buckets or min(k, 32),
        out_schema=pa.schema([("vec_id", pa.int64()),
                              ("kept_by", pa.int64()),
                              ("n_sim", pa.int64())]))

    # fold tile partials: smallest witness, total similar-smaller count
    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("vec_id", sort=True).agg(
            kept_by=("kept_by", "min"), n_sim=("n_sim", "sum"))
        return g.reset_index().astype({"kept_by": "int64",
                                       "n_sim": "int64"})

    return bucketed_group_apply(
        partials, ["vec_id"], fold, num_buckets=8,
        out_schema=pa.schema([("vec_id", pa.int64()),
                              ("kept_by", pa.int64()),
                              ("n_sim", pa.int64())]))


def pq_codes(embeds: rd.Dataset, n_subspaces: int = 4, k: int = 4,
             iters: int = 3) -> rd.Dataset:
    """Product quantization (the ANN memory scale path): the embedding
    is split into ``n_subspaces`` contiguous dim slices and each slice
    is clustered with the SAME integer-contract Lloyd loop as
    kmeans_assign — per vector and subspace, the assigned codebook
    entry (``code``) and the exact quantised squared reconstruction
    error (``dist``).  dim must divide evenly.

    Hash-exactness inherits wholesale from the kmeans contract (module
    docstring): the sliced float32 values quantise to the identical
    micro ints on both sides, so each subspace mirror is the unrolled
    Lloyd CTE over ``list_slice(embedding, lo, hi)``.

    Scale: n_subspaces independent kmeans fits (each a per-iteration
    streaming scan emitting k×subdim partials); codes are S·log2(k)
    bits per vector downstream."""
    first = embeds.take(1)[0]
    dim = len(first["embedding"])
    assert dim % n_subspaces == 0, "dim must divide into subspaces"
    sub = dim // n_subspaces

    outs = []
    for s in range(n_subspaces):
        lo, hi = s * sub, (s + 1) * sub

        def slice_fn(t: pa.Table, _lo=lo, _hi=hi) -> pa.Table:
            from .knn import _to_matrix
            M = _to_matrix(t["embedding"])[:, _lo:_hi]
            return pa.table({
                "vec_id": t["vec_id"],
                "embedding": pa.array(list(M),
                                      type=pa.list_(pa.float64()))})

        asg = kmeans_assign(embeds.map_batches(slice_fn,
                                               batch_format="pyarrow"),
                            k=k, iters=iters)
        outs.append(asg.map_batches(
            lambda t, _s=s: pa.table({
                "vec_id": t["vec_id"],
                "subspace": pa.array(
                    np.full(t.num_rows, _s, dtype=np.int64)),
                "code": t["cluster"], "dist": t["dist"]}),
            batch_format="pyarrow"))

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def pq_adc_topk(embeds: rd.Dataset, n_queries: int = 5,
                n_subspaces: int = 4, k_codes: int = 4, iters: int = 3,
                topk: int = 10) -> rd.Dataset:
    """PQ asymmetric-distance top-k (ADC, Jegou et al. 2011): the ANN
    answer path that pairs with ``pq_codes``.  Per subspace the codebook
    comes from the SAME integer-contract Lloyd fit (``kmeans_fit``); a
    query's distance to a database vector is approximated by the exact
    int64 sum, over subspaces, of the squared quantised distance between
    the query's slice and the CENTROID the vector's code points at —
    queries stay un-quantised-to-codes (asymmetric), vectors cost only
    S·log2(k) bits.

    Hash-exact by construction: quantised micro-int slices, exact int64
    LUT entries, assignment keys ``min(dist·k + cid)`` shared with the
    kmeans mirror, ranking ``(adc_dist ASC, vec_id ASC)``, self excluded.

    Scale shape: ``n_subspaces`` streaming Lloyd fits; ONE scoring pass
    over the corpus with the (tiny) codebooks + LUT broadcast via
    ``ray.put``, emitting per-batch partial top-k per query; one
    bucketed fold on query_id.  The fixed query set (vec_id <
    n_queries) is a driver-side take of a handful of rows — the
    documented small-side pattern."""
    import pyarrow.compute as pc

    first = embeds.take(1)[0]
    dim = len(first["embedding"])
    assert dim % n_subspaces == 0, "dim must divide into subspaces"
    sub = dim // n_subspaces

    cents = []
    for s in range(n_subspaces):
        lo, hi = s * sub, (s + 1) * sub

        def slice_fn(t: pa.Table, _lo=lo, _hi=hi) -> pa.Table:
            M = _to_matrix(t["embedding"])[:, _lo:_hi]
            return pa.table({
                "vec_id": t["vec_id"],
                "embedding": pa.array(list(M),
                                      type=pa.list_(pa.float64()))})

        cents.append(kmeans_fit(
            embeds.map_batches(slice_fn, batch_format="pyarrow"),
            k=k_codes, iters=iters))
    C = np.stack(cents)                       # (S, k, sub) int64

    qrows = embeds.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], n_queries)),
        batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Qq = quantize(np.stack([np.asarray(r["embedding"], dtype=np.float64)
                            for r in qrows]))  # (nq, dim)

    LUT = np.empty((len(qids), n_subspaces, k_codes), dtype=np.int64)
    for s in range(n_subspaces):
        qs = Qq[:, s * sub:(s + 1) * sub]
        diff = qs[:, None, :] - C[s][None, :, :]
        LUT[:, s, :] = (diff * diff).sum(axis=2)

    ref = ray.put((C, LUT, qids))

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        C, LUT, qids = ray.get(_ref)
        Q = quantize(_to_matrix(t["embedding"]))
        n = Q.shape[0]
        codes = np.empty((n, n_subspaces), dtype=np.int64)
        for s in range(n_subspaces):
            X = Q[:, s * sub:(s + 1) * sub]
            d = ((X[:, None, :] - C[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d * k_codes
                                    + np.arange(k_codes), axis=1)
        adc = np.zeros((len(qids), n), dtype=np.int64)
        for s in range(n_subspaces):
            adc += LUT[:, s, :][:, codes[:, s]]
        vid = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        qo, vo, do = [], [], []
        for qi, qid in enumerate(qids):
            mask = vid != qid
            order = np.lexsort((vid[mask], adc[qi][mask]))[:topk]
            qo.append(np.full(len(order), qid, dtype=np.int64))
            vo.append(vid[mask][order])
            do.append(adc[qi][mask][order])
        return pa.table({
            "query_id": pa.array(np.concatenate(qo) if qo
                                 else np.empty(0, np.int64)),
            "vec_id": pa.array(np.concatenate(vo) if vo
                               else np.empty(0, np.int64)),
            "adc_dist": pa.array(np.concatenate(do) if do
                                 else np.empty(0, np.int64))})

    scored = embeds.map_batches(score, batch_format="pyarrow",
                                batch_size=4096)

    import pandas as pd

    def topk_df(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "adc_dist", "vec_id"],
                            kind="mergesort")
        return df.groupby("query_id", sort=True).head(topk)

    from .groups import bucketed_group_apply
    return bucketed_group_apply(
        scored, ["query_id"], topk_df, num_buckets=4,
        out_schema=pa.schema([("query_id", pa.int64()),
                              ("vec_id", pa.int64()),
                              ("adc_dist", pa.int64())]))
