"""Integer-contract PCA by power iteration over the embedding column —
the principal-direction projection used for embedding whitening /
spectral dedup in training-data pipelines.

Distributed shape (the only part that touches the corpus): each batch
quantises its vectors to int64 micro-units and emits the 64x64 partial
Gram matrix ``q.T @ q`` as (i, j, g) rows — O(dim^2) per block, bounded
by int64 (|q| <= ~1e6 for unit-range embeddings, so a 4096-row block's
partial entry is <= ~4e15).  Cross-block combination runs in Python
arbitrary-precision ints (the lineitem_moments overflow contract), and
the combined Gram — dim^2 rows, model-sized — is collected once on the
driver.  The power rounds themselves are exact integer math on that
dim x dim matrix; the resulting direction (each component <= 1e6 in
magnitude) is broadcast back and every vector's projection is one
int64-safe matvec per batch.  No shuffle moves more than dim^2 rows per
block at any corpus size.

Determinism contract (5th bounded-iteration mirror after k-means / CW /
PageRank / k-core): q = floor(x*1e6 + 0.5) after float32 -> float64;
v0 = 1e6 for every dim; each of the FIXED ``rounds`` rounds computes
u = G @ v exactly, m = max(|u|, 1), v' = tdiv(u * 1e6, m) where tdiv
truncates toward zero — DuckDB's integer ``//`` semantics, NOT Python
floor — so engine and unrolled-CTE mirror agree to the last bit even
mid-convergence.  Final projection per vector: tdiv(q . v, 1e6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .knn import _to_matrix, read_embeddings

MICRO = 1_000_000


def _tdiv_int(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — DuckDB ``//``."""
    return -((-a) // b) if a < 0 else a // b


def _tdiv_np(a: np.ndarray, b: int) -> np.ndarray:
    """Vectorised truncating division for int64 arrays."""
    return np.sign(a) * (np.abs(a) // b)


def _quantize(t: pa.Table) -> np.ndarray:
    x = _to_matrix(t["embedding"])
    return np.floor(x * MICRO + 0.5).astype(np.int64)


def gram_partials(embeddings: rd.Dataset) -> rd.Dataset:
    """Per-batch (i, j, g) rows of the quantised Gram matrix."""
    def fn(t: pa.Table) -> pa.Table:
        q = _quantize(t)
        d = q.shape[1] if q.size else 0
        if d == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "g": pa.array([], pa.int64())})
        g = q.T @ q          # int64-exact: |entry| <= rows * 1e12
        ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1),
                             indexing="ij")
        return pa.table({"i": pa.array(ii.ravel(), pa.int64()),
                         "j": pa.array(jj.ravel(), pa.int64()),
                         "g": pa.array(g.ravel(), pa.int64())})

    return embeddings.map_batches(fn, batch_format="pyarrow")


def fit_direction(embeddings: rd.Dataset, rounds: int = 8) -> np.ndarray:
    """Combined Gram -> ``rounds`` exact power rounds -> int64 direction
    (1-indexed dense vector, each |component| <= 1e6)."""
    from ..util import collect_rows
    from .groups import bucketed_group_apply

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # Python-int accumulation: exact at any block count (no int64
        # ceiling across blocks); emitted as decimal strings so the
        # driver parse stays exact past int64 too.
        g = df.groupby(["i", "j"], sort=False)["g"] \
              .apply(lambda s: str(sum(int(v) for v in s))).reset_index()
        return g.rename(columns={"g": "gs"})

    out_schema = pa.schema([("i", pa.int64()), ("j", pa.int64()),
                            ("gs", pa.string())])
    rows = collect_rows(bucketed_group_apply(
        gram_partials(embeddings), ["i", "j"], combine,
        num_buckets=4, out_schema=out_schema))
    if not rows:
        return np.zeros(0, dtype=np.int64)
    d = max(r["i"] for r in rows)
    G = [[0] * d for _ in range(d)]
    for r in rows:
        G[r["i"] - 1][r["j"] - 1] = int(r["gs"])
    v = [MICRO] * d
    for _ in range(rounds):
        u = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(max(abs(x) for x in u), 1)
        v = [_tdiv_int(x * MICRO, m) for x in u]
    return np.asarray(v, dtype=np.int64)


def pca_projection(embeddings: rd.Dataset, rounds: int = 8) -> rd.Dataset:
    """(vec_id, proj) — each vector's exact integer projection onto the
    power-iteration direction, tdiv(q . v, 1e6)."""
    direction = fit_direction(embeddings, rounds=rounds)
    v_ref = ray.put(direction)

    def project(t: pa.Table) -> pa.Table:
        v = ray.get(v_ref)
        q = _quantize(t)
        if q.size == 0 or len(v) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "proj": pa.array([], pa.int64())})
        s = q @ v            # <= dim * 1e12 in magnitude: int64-safe
        return pa.table({"vec_id": t["vec_id"],
                         "proj": pa.array(_tdiv_np(s, MICRO), pa.int64())})

    return embeddings.map_batches(project, batch_format="pyarrow")


def pca_projection_query(sf_dir: str, rounds: int = 8) -> rd.Dataset:
    return pca_projection(read_embeddings(sf_dir), rounds=rounds)


def label_centroids(embeddings: rd.Dataset,
                    num_buckets: int = 4) -> rd.Dataset:
    """(label, i, n, mean_micro) — per-label centroid of the quantised
    embeddings, the class-prototype table (nearest-centroid classifiers,
    SemDeDup-style cluster summaries).

    Integer contract: per-(label, dim) micro-unit sums are exact int64
    block partials (|q| <= ~1e6 -> a 4096-row block sum <= 4e9) folded
    through one bucketed shuffle of O(labels x dim) rows per block;
    mean_micro = tdiv(sum, n) with truncating division (DuckDB ``//``).
    Output is model-shaped: labels x dim rows."""
    def partials(t: pa.Table) -> pa.Table:
        q = _quantize(t)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        if q.size == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        d = q.shape[1]
        ulab, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ulab), d), dtype=np.int64)
        np.add.at(sums, inv, q)
        cnt = np.bincount(inv).astype(np.int64)
        ll = np.repeat(ulab, d)
        ii = np.tile(np.arange(1, d + 1), len(ulab))
        return pa.table({
            "label": pa.array(ll, pa.int64()),
            "i": pa.array(ii, pa.int64()),
            "s": pa.array(sums.ravel(), pa.int64()),
            "n": pa.array(np.repeat(cnt, d), pa.int64())})

    from ..pipelines.analytics import bucketed_sum
    src = embeddings.map_batches(partials, batch_format="pyarrow")
    summed = bucketed_sum(src, ["label", "i"], ["s", "n"],
                          num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        mean = np.sign(s) * (np.abs(s) // n)
        return pa.table({
            "label": t["label"], "i": t["i"],
            "n": t["n"].cast(pa.int64()),
            "mean_micro": pa.array(mean, pa.int64())})

    return summed.map_batches(finish, batch_format="pyarrow")


def label_centroids_query(sf_dir: str) -> rd.Dataset:
    from ..sources.pqclean import read_parquet_clean
    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding", "label"])
    return label_centroids(emb)


def nearest_centroid(embeddings: rd.Dataset,
                     num_buckets: int = 4) -> rd.Dataset:
    """(vec_id, true_label, assigned_label, dist2, correct) — every
    vector assigned to its nearest per-label centroid by exact integer
    squared distance (ties to the smallest label), with the
    self-evaluation flag; the nearest-centroid-classifier pass that
    audits label quality / cluster purity.

    Fit = label_centroids (one bucketed shuffle of labels x dim rows);
    the labels x dim centroid matrix is model-shaped — collected once,
    broadcast via ray.put, and scored per batch with vectorised int64
    math (|q - c| <= ~2e6 -> dist2 <= ~2.6e14 at dim 64)."""
    from ..util import collect_rows

    cent_rows = collect_rows(label_centroids(embeddings,
                                             num_buckets=num_buckets))
    labels = sorted({r["label"] for r in cent_rows})
    if not labels:
        return rd.from_arrow(pa.schema(
            [("vec_id", pa.int64()), ("true_label", pa.int64()),
             ("assigned_label", pa.int64()), ("dist2", pa.int64()),
             ("correct", pa.int64())]).empty_table())
    d = max(r["i"] for r in cent_rows)
    C = np.zeros((len(labels), d), dtype=np.int64)
    pos = {l: ix for ix, l in enumerate(labels)}
    for r in cent_rows:
        C[pos[r["label"]], r["i"] - 1] = r["mean_micro"]
    lab_arr = np.asarray(labels, dtype=np.int64)
    c_ref = ray.put((lab_arr, C))

    def assign(t: pa.Table) -> pa.Table:
        labs, cm = ray.get(c_ref)
        q = _quantize(t)
        true = t["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # (B, L) exact squared distances, one label at a time to keep
        # the temporary at B x dim
        d2 = np.empty((q.shape[0], len(labs)), dtype=np.int64)
        for li in range(len(labs)):
            diff = q - cm[li]
            d2[:, li] = np.einsum("ij,ij->i", diff, diff)
        amin = np.argmin(d2, axis=1)    # first occurrence = min label
        assigned = labs[amin]
        dist2 = d2[np.arange(len(amin)), amin]
        return pa.table({
            "vec_id": t["vec_id"].cast(pa.int64()),
            "true_label": pa.array(true, pa.int64()),
            "assigned_label": pa.array(assigned, pa.int64()),
            "dist2": pa.array(dist2, pa.int64()),
            "correct": pa.array((assigned == true).astype(np.int64),
                                pa.int64())})

    return embeddings.map_batches(assign, batch_format="pyarrow")


def nearest_centroid_query(sf_dir: str) -> rd.Dataset:
    from ..sources.pqclean import read_parquet_clean
    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding", "label"])
    return nearest_centroid(emb)
