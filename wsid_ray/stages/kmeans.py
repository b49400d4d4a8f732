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


def kmeans_assign(embeds: rd.Dataset, k: int = 4, iters: int = 3,
                  include_q: bool = False) -> rd.Dataset:
    """Fit k-means for ``iters`` Lloyd iterations and return the final
    assignment: (vec_id, cluster, dist) with dist the exact quantised
    squared distance (``include_q=True`` additionally carries the
    quantised vector for downstream within-cluster work, e.g.
    semantic_dedup).  See module docstring for the determinism and
    scale contract."""
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
                   num_buckets: int | None = None) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space with k-means, then drop near-identical members WITHIN each
    cluster — the clusters bound the otherwise O(n²) pair search, which
    is the whole point of the method at 100 TB (raise ``k`` so cluster
    sizes stay per-task-sized; the pair stage is per-cluster quadratic).

    Determinism: cosine is computed from the integer-exact quantised
    vectors (int64 dot / product of float64 sqrts of int64 norms — no
    float summation anywhere), rounded half-away-from-zero at 6 dp, so
    the SQL mirror is hash-exact.  Drop rule: a vector is dropped iff a
    SMALLER vec_id in its cluster has cosine ≥ tau; output one row per
    dropped vector with its smallest witness and its count of similar
    smaller neighbours."""
    import pandas as pd

    from .groups import bucketed_group_apply

    asg = kmeans_assign(embeds, k=k, iters=iters, include_q=True)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_v, out_w, out_n = [], [], []
        for _, g in df.groupby("cluster", sort=False):
            Q = np.vstack(g["qe"].to_numpy()).astype(np.int64)
            ids = g["vec_id"].to_numpy()
            order = np.argsort(ids, kind="stable")
            Q, ids = Q[order], ids[order]
            nq = (Q * Q).sum(axis=1, dtype=np.int64)
            ok = nq > 0
            Q, ids, nq = Q[ok], ids[ok], nq[ok]
            if len(ids) < 2:
                continue
            dot = (Q @ Q.T).astype(np.float64)
            den = np.sqrt(nq.astype(np.float64))
            cos = dot / (den[:, None] * den[None, :])
            cos6 = np.floor(np.abs(cos) * 1e6 + 0.5) * np.sign(cos) / 1e6
            hit = np.triu(cos6 >= tau, 1)          # a(row) < b(col)
            n_sim = hit.sum(axis=0)
            has = n_sim > 0
            if not has.any():
                continue
            first = hit.argmax(axis=0)             # smallest witness row
            out_v.extend(ids[has])
            out_w.extend(ids[first[has]])
            out_n.extend(n_sim[has])
        return pd.DataFrame({
            "vec_id": pd.Series(out_v, dtype="int64"),
            "kept_by": pd.Series(out_w, dtype="int64"),
            "n_sim": pd.Series(out_n, dtype="int64"),
        })

    return bucketed_group_apply(
        asg, ["cluster"], pairs,
        num_buckets=num_buckets or min(k, 32),
        out_schema=pa.schema([("vec_id", pa.int64()),
                              ("kept_by", pa.int64()),
                              ("n_sim", pa.int64())]))
