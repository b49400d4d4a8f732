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


def kmeans_assign(embeds: rd.Dataset, k: int = 4,
                  iters: int = 3) -> rd.Dataset:
    """Fit k-means for ``iters`` Lloyd iterations and return the final
    assignment: (vec_id, cluster, dist) with dist the exact quantised
    squared distance.  See module docstring for the determinism and
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
        return pa.table({
            "vec_id": t["vec_id"],
            "cluster": pa.array(key % k, type=pa.int64()),
            "dist": pa.array(key // k, type=pa.int64()),
        })

    return embeds.map_batches(assign, batch_format="pyarrow")
