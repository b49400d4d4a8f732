"""Similarity search over an embedding column (task spec): brute-force
cosine top-k as the exact baseline, LSH-bucketed variant as the scale path.

Brute force: the query matrix is broadcast once (``ray.put``); every batch
does one float64 numpy matmul against it — vectorised, no shuffle, scales
linearly with corpus blocks (ray_guide pattern: broadcast small side).

float64 throughout so scores bit-match the DuckDB oracle
(list_cosine_similarity computes in double); scores rounded to 6 dp.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _to_matrix(col) -> np.ndarray:
    """list<float> / fixed_size_list<float> column -> (n, dim) float64
    matrix via the flat Arrow values buffer (zero-copy view + one cast) —
    no per-row Python lists."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), dim).astype(np.float64, copy=False)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    if len(lens) and not (lens == lens[0]).all():
        raise ValueError("ragged embedding column")
    flat = col.flatten().to_numpy(zero_copy_only=False)
    # a sliced list array's flatten() already honours offsets[0]
    dim = int(lens[0]) if len(lens) else 0
    return np.ascontiguousarray(flat).reshape(len(col), dim).astype(
        np.float64, copy=False)


def read_embeddings(sf_dir: str) -> rd.Dataset:
    from ..sources.pqclean import read_parquet_clean
    from .textstats import _read_blocks
    return read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"],
                              override_num_blocks=_read_blocks(
                                  f"{sf_dir}/embeddings.parquet"))


class BruteForceScorer:
    """Per-batch matmul against the broadcast query matrix, keeping only
    the per-batch top-k per query (the mergeable partial of global top-k),
    so the shuffle moves O(k·queries·blocks) rows, not O(n·queries)."""

    def __init__(self, queries_ref, k: int = 10, exclude_self: bool = True):
        q = ray.get(queries_ref)              # {query_id: np.ndarray}
        self.qids = sorted(q)
        Q = np.stack([q[i] for i in self.qids])
        self.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        self.k = k
        self.exclude_self = exclude_self

    def __call__(self, t: pa.Table) -> pa.Table:
        X = _to_matrix(t["embedding"])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = Xn @ self.Qn.T                    # (batch, n_queries)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        qid_col: list[int] = []
        vid_col: list[np.ndarray] = []
        s_col: list[np.ndarray] = []
        for qi, qid in enumerate(self.qids):
            s = S[:, qi]
            mask = np.ones(len(s), dtype=bool)
            if self.exclude_self:
                mask &= vids != qid
            idx = np.nonzero(mask)[0]
            if len(idx) > self.k:
                # lexsort keeps the (-score, vec_id) tie-break exact at the
                # k boundary, so partial+final top-k is deterministic
                top = idx[np.lexsort((vids[idx], -s[idx]))[:self.k]]
            else:
                top = idx
            qid_col.extend([qid] * len(top))
            vid_col.append(vids[top])
            s_col.append(s[top])  # full precision; rounded at final top-k
        return pa.table({
            "query_id": pa.array(qid_col, type=pa.int64()),
            "vec_id": pa.array(np.concatenate(vid_col) if vid_col else
                               np.array([], dtype=np.int64), type=pa.int64()),
            "score": pa.array(np.concatenate(s_col) if s_col else
                              np.array([], dtype=np.float64),
                              type=pa.float64()),
        })


_SCORER_MEMO: dict[tuple, object] = {}


def _memo_scorer(cls, key: tuple, **kwargs):
    """Per-worker-process scorer memo: the state (broadcast query matrix,
    hyperplanes) is cheap to hydrate from the object store, so these
    stages run as elastic STATELESS TASKS instead of capped actor pools
    (same rationale as mentions.detect_batch — no pool spin-up barrier,
    every CPU usable)."""
    sc = _SCORER_MEMO.get(key)
    if sc is None:
        sc = _SCORER_MEMO[key] = cls(**kwargs)
    return sc


def _brute_force_batch(t: pa.Table, queries_ref=None, k: int = 10,
                       exclude_self: bool = True) -> pa.Table:
    sc = _memo_scorer(BruteForceScorer,
                      ("bf", queries_ref.hex(), k, exclude_self),
                      queries_ref=queries_ref, k=k,
                      exclude_self=exclude_self)
    return sc(t)


def knn_topk(embeddings: rd.Dataset, query_vectors: dict[int, np.ndarray],
             k: int = 10, exclude_self: bool = True) -> rd.Dataset:
    """Exact cosine top-k per query. Deterministic tie-break:
    (-score, vec_id)."""
    ref = ray.put(query_vectors)
    scored = embeddings.map_batches(
        _brute_force_batch,
        fn_kwargs=dict(queries_ref=ref, k=k, exclude_self=exclude_self),
        batch_format="pyarrow", batch_size=4096)

    import pandas as pd

    def topk_df(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
        out = df.groupby("query_id", sort=True).head(k).copy()
        out["score"] = out["score"].round(6)
        return out

    from .groups import bucketed_group_apply
    return bucketed_group_apply(scored, ["query_id"], topk_df,
                                num_buckets=8)


def near_dup_pairs(embeddings: rd.Dataset, threshold: float,
                   num_blocks: int = 8) -> rd.Dataset:
    """Exact embedding-cosine near-duplicate pairs (vec_a < vec_b,
    cosine > threshold), the embedding analogue of MinHash near-dup.

    Distributed block-pair (triangle) join — nothing touches the driver:
    every vector is hashed into one of ``num_blocks`` blocks and
    replicated to the ``num_blocks`` unordered block pairs it belongs to;
    one task per block pair runs the float64 matmul between its two
    blocks.  O(n²) compute (exactness at a 0.4 threshold requires it) but
    spread over B(B+1)/2 independent tasks with O(n·B) data movement, vs
    the old driver-side ``collect_table`` + full-matrix broadcast.
    Approximate scale paths (LshBucketScorer / ivf) trade recall for
    skipping the quadratic work.
    """
    B = num_blocks

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = vids % B
        other = np.tile(np.arange(B, dtype=np.int64), n)
        blk_rep = np.repeat(blk, B)
        take = pa.array(np.repeat(np.arange(n), B), type=pa.int64())
        import pyarrow.compute as pc
        return pa.table({
            "pi": pa.array(np.minimum(blk_rep, other), type=pa.int32()),
            "pj": pa.array(np.maximum(blk_rep, other), type=pa.int32()),
            "blk": pa.array(blk_rep, type=pa.int32()),
            "vec_id": pc.take(t["vec_id"], take),
            "embedding": pc.take(t["embedding"], take),
        })

    exploded = embeddings.map_batches(explode, batch_format="pyarrow")

    import pandas as pd

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a_col: list[np.ndarray] = []
        b_col: list[np.ndarray] = []
        s_col: list[np.ndarray] = []
        for (pi, pj), g in df.groupby(["pi", "pj"], sort=True):
            g = g.drop_duplicates("vec_id")  # (b,b) pair keeps one copy
            left = g[g["blk"] == pi]
            if not len(left) or (pi == pj and len(left) < 2):
                continue
            ids_l = left["vec_id"].to_numpy()
            L = np.asarray(left["embedding"].tolist(), dtype=np.float64)
            Ln = L / np.linalg.norm(L, axis=1, keepdims=True)
            if pi == pj:
                S = Ln @ Ln.T
                ia, ib = np.nonzero((S > threshold)
                                    & (ids_l[:, None] < ids_l[None, :]))
                va, vb, sv = ids_l[ia], ids_l[ib], S[ia, ib]
            else:
                right = g[g["blk"] == pj]
                if not len(right):
                    continue
                ids_r = right["vec_id"].to_numpy()
                R = np.asarray(right["embedding"].tolist(),
                               dtype=np.float64)
                Rn = R / np.linalg.norm(R, axis=1, keepdims=True)
                S = Ln @ Rn.T
                ia, ib = np.nonzero(S > threshold)
                va0, vb0 = ids_l[ia], ids_r[ib]
                va = np.minimum(va0, vb0)
                vb = np.maximum(va0, vb0)
                sv = S[ia, ib]
            a_col.append(va); b_col.append(vb)
            s_col.append(np.round(sv, 6))
        cat = (lambda xs, dt: np.concatenate(xs).astype(dt) if xs
               else np.zeros(0, dtype=dt))
        return pd.DataFrame({
            "vec_a": pd.Series(cat(a_col, np.int64), dtype="int64"),
            "vec_b": pd.Series(cat(b_col, np.int64), dtype="int64"),
            "score": pd.Series(cat(s_col, np.float64), dtype="float64"),
        })

    from .groups import bucketed_group_apply
    return bucketed_group_apply(exploded, ["pi", "pj"], pairs_in_bucket,
                                num_buckets=B * (B + 1) // 2)


_INT_EMB_MAX_ABS = 1 << 28  # per-cell magnitude contract (see below)


def near_dup_pairs_exact_int(embeddings: rd.Dataset, tau_num: int,
                             tau_den: int,
                             num_blocks: int = 8) -> rd.Dataset:
    """Integer-exact embedding-cosine near-dup: pairs with
    cosine > tau_num/tau_den over INTEGER-VALUED vectors, emitted as
    (vec_a, vec_b, dot, na2, nb2) — all exact int64, NO float score, so
    the SQL mirror is trivially hash-exact (DuckDB compares
    ``den²·dot² > num²·na2·nb2`` in HUGEINT).

    Same distributed block-pair triangle join as :func:`near_dup_pairs`
    (data movement O(n·B), one task per unordered block pair, nothing on
    the driver).  Inside a tile: int64 matmul for exact dot products
    (magnitude contract: per-cell |val| < 2**28, so each of the ≤dim
    products stays < 2**56 and the sum < 2**63 for dim ≤ 128 — asserted),
    then a float64 prefilter with a 1e-9 band picks candidates and the
    strict threshold is decided with arbitrary-precision Python ints on
    that (output-sized) candidate set only.  The prefilter cannot drop a
    true pair: by Cauchy-Schwarz dot ≤ √(na2·nb2) < 2**53, so the float
    cosine is accurate to ~1e-15 « the band."""
    B = num_blocks
    t2n, t2d = tau_num * tau_num, tau_den * tau_den

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = vids % B
        other = np.tile(np.arange(B, dtype=np.int64), n)
        blk_rep = np.repeat(blk, B)
        take = pa.array(np.repeat(np.arange(n), B), type=pa.int64())
        import pyarrow.compute as pc
        return pa.table({
            "pi": pa.array(np.minimum(blk_rep, other), type=pa.int32()),
            "pj": pa.array(np.maximum(blk_rep, other), type=pa.int32()),
            "blk": pa.array(blk_rep, type=pa.int32()),
            "vec_id": pc.take(t["vec_id"], take),
            "embedding": pc.take(t["embedding"], take),
        })

    exploded = embeddings.map_batches(explode, batch_format="pyarrow")

    import pandas as pd

    def _imat(rows) -> np.ndarray:
        M = np.asarray(rows.tolist(), dtype=np.float64)
        I = M.astype(np.int64)
        if (I != M).any():
            raise ValueError("exact-int near-dup needs integer-valued "
                             "embeddings")
        if np.abs(I).max(initial=0) >= _INT_EMB_MAX_ABS:
            raise ValueError("embedding cell exceeds the 2**28 exact-dot "
                             "magnitude contract")
        return I

    def _emit(ids_a, ids_b, dot, na2, nb2):
        """Float prefilter band -> exact integer strict-threshold."""
        tau = tau_num / tau_den
        with np.errstate(divide="ignore", invalid="ignore"):
            cosf = dot.astype(np.float64) / np.sqrt(
                na2.astype(np.float64)[:, None]
                * nb2.astype(np.float64)[None, :])
        ca, cb = np.nonzero(np.nan_to_num(cosf) >= tau - 1e-9)
        rows = []
        for i, j in zip(ca.tolist(), cb.tolist()):
            d = int(dot[i, j])
            if d <= 0:
                continue
            a2, b2 = int(na2[i]), int(nb2[j])
            if t2d * d * d > t2n * a2 * b2:  # exact, arbitrary precision
                va, vb = int(ids_a[i]), int(ids_b[j])
                if va > vb:  # norms travel with their ids
                    va, vb, a2, b2 = vb, va, b2, a2
                rows.append((va, vb, d, a2, b2))
        return rows

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out: list[tuple] = []
        for (pi, pj), g in df.groupby(["pi", "pj"], sort=True):
            g = g.drop_duplicates("vec_id")
            left = g[g["blk"] == pi]
            if not len(left) or (pi == pj and len(left) < 2):
                continue
            ids_l = left["vec_id"].to_numpy()
            L = _imat(left["embedding"])
            n2_l = (L * L).sum(axis=1)
            if pi == pj:
                order = np.argsort(ids_l, kind="stable")
                Ls, ids_s, n2_s = L[order], ids_l[order], n2_l[order]
                D = Ls @ Ls.T
                iu = np.triu(np.ones_like(D, dtype=bool), k=1)
                D = np.where(iu, D, np.int64(0))  # each pair once, a < b
                out.extend(_emit(ids_s, ids_s, D, n2_s, n2_s))
            else:
                right = g[g["blk"] == pj]
                if not len(right):
                    continue
                R = _imat(right["embedding"])
                out.extend(_emit(ids_l, right["vec_id"].to_numpy(),
                                 L @ R.T, n2_l, (R * R).sum(axis=1)))
        cols = list(zip(*out)) if out else [[]] * 5
        return pd.DataFrame({
            name: pd.Series(np.asarray(c, dtype=np.int64), dtype="int64")
            for name, c in zip(
                ("vec_a", "vec_b", "dot", "na2", "nb2"), cols)})

    from .groups import bucketed_group_apply
    return bucketed_group_apply(exploded, ["pi", "pj"], pairs_in_bucket,
                                num_buckets=B * (B + 1) // 2)


def kmeans_centroids(X: np.ndarray, k: int, iters: int = 10,
                     seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd's k-means on (a sample of) the corpus — the
    IVF coarse quantizer.  Driver-side: the sample is small by design."""
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(0)
    return C


def ivf_topk(embeddings: rd.Dataset, query_vectors: dict[int, np.ndarray],
             k: int = 10, n_lists: int = 8, n_probe: int = 2,
             sample_n: int = 2048, seed: int = 42,
             exclude_self: bool = True) -> rd.Dataset:
    """IVF approximate top-k: corpus vectors are assigned to the nearest
    of ``n_lists`` centroids (one vectorised pass); each query scores only
    vectors whose list is among its ``n_probe`` closest centroids.

    The scale path vs brute force: per batch, a query touches ~n_probe /
    n_lists of the rows.  Recall < 1 by construction; raise n_probe to
    trade cost for recall.  Centroids are fit deterministically on a
    driver-side sample (ray_guide: small model, broadcast)."""
    import pyarrow.compute as pc  # noqa: F401

    sample = embeddings.limit(sample_n).to_pandas()
    Xs = np.asarray(sample["embedding"].tolist(), dtype=np.float64)
    Xs = Xs / np.linalg.norm(Xs, axis=1, keepdims=True)
    C = kmeans_centroids(Xs, n_lists, seed=seed)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    qids = sorted(query_vectors)
    Q = np.stack([query_vectors[i] for i in qids]).astype(np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    probe = np.argsort(-(Qn @ Cn.T), axis=1)[:, :n_probe]  # (q, n_probe)
    state = ray.put((Cn, qids, Qn, probe))

    def score(t: pa.Table) -> pa.Table:
        Cn_, qids_, Qn_, probe_ = ray.get(state)
        X = _to_matrix(t["embedding"])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        assign = (Xn @ Cn_.T).argmax(1)
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        qcol, vcol, scol = [], [], []
        for qi, qid in enumerate(qids_):
            mask = np.isin(assign, probe_[qi])
            if exclude_self:
                mask &= vids != qid
            if not mask.any():
                continue
            s = Xn[mask] @ Qn_[qi]
            idx = np.nonzero(mask)[0]
            if len(idx) > k:
                keep = np.lexsort((vids[idx], -s))[:k]
                idx, s = idx[keep], s[keep]
            qcol.extend([qid] * len(idx))
            vcol.extend(vids[idx].tolist())
            scol.extend(s.tolist())
        return pa.table({
            "query_id": pa.array(qcol, type=pa.int64()),
            "vec_id": pa.array(vcol, type=pa.int64()),
            "score": pa.array(scol, type=pa.float64()),
        })

    scored = embeddings.map_batches(score, batch_format="pyarrow",
                                    batch_size=4096)
    import pandas as pd

    def topk_df(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
        out = df.groupby("query_id", sort=True).head(k).copy()
        out["score"] = out["score"].round(6)
        return out

    from .groups import bucketed_group_apply
    return bucketed_group_apply(scored, ["query_id"], topk_df,
                                num_buckets=8)


def lsh_topk(embeddings: rd.Dataset, query_vectors: dict[int, np.ndarray],
             k: int = 10, n_planes: int = 6, dim: int = 64,
             exclude_self: bool = True) -> rd.Dataset:
    """Approximate cosine top-k via random-hyperplane LSH bucket
    prefilter + exact re-rank of matching rows (rows-only by design;
    recall vs exact brute force asserted in tests)."""
    ref = ray.put(query_vectors)
    scored = embeddings.map_batches(
        _lsh_bucket_batch,
        fn_kwargs=dict(queries_ref=ref, n_planes=n_planes, dim=dim),
        batch_format="pyarrow", batch_size=4096)
    if exclude_self:
        import pyarrow.compute as pc
        scored = scored.map_batches(
            lambda t: t.filter(pc.not_equal(t["query_id"], t["vec_id"])),
            batch_format="pyarrow")

    import pandas as pd

    def topk_df(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("query_id", sort=True).head(k)

    from .groups import bucketed_group_apply
    return bucketed_group_apply(scored, ["query_id"], topk_df,
                                num_buckets=8)


def _lsh_bucket_batch(t: pa.Table, queries_ref=None, n_planes: int = 8,
                      dim: int = 64, seed: int = 42) -> pa.Table:
    sc = _memo_scorer(LshBucketScorer,
                      ("lsh", queries_ref.hex(), n_planes, dim, seed),
                      queries_ref=queries_ref, n_planes=n_planes,
                      dim=dim, seed=seed)
    return sc(t)


class LshBucketScorer:
    """Scale path: random-hyperplane LSH prefilter, exact re-rank inside
    matching buckets only.  Approximate: documents in non-matching buckets
    are skipped (recall < 1) — use for corpus sizes where brute force is
    infeasible; parameters (n_planes) trade recall for cost."""

    def __init__(self, queries_ref, n_planes: int = 8, dim: int = 64,
                 seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        q = ray.get(queries_ref)
        self.qids = sorted(q)
        Q = np.stack([q[i] for i in self.qids])
        self.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        self.qsig = (self.Qn @ self.planes.T > 0).astype(np.uint8)

    def __call__(self, t: pa.Table) -> pa.Table:
        X = _to_matrix(t["embedding"])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        xsig = (Xn @ self.planes.T > 0).astype(np.uint8)
        qid_col = []
        vid_col = []
        s_col = []
        vids = t["vec_id"].to_numpy(zero_copy_only=False)
        for qi, qid in enumerate(self.qids):
            match = (xsig == self.qsig[qi]).all(axis=1)
            if not match.any():
                continue
            s = Xn[match] @ self.Qn[qi]
            qid_col.extend([qid] * int(match.sum()))
            vid_col.extend(vids[match].tolist())
            s_col.extend(np.round(s, 6).tolist())
        return pa.table({
            "query_id": pa.array(qid_col, type=pa.int64()),
            "vec_id": pa.array(vid_col, type=pa.int64()),
            "score": pa.array(s_col, type=pa.float64()),
        })


def quantize_stats(embeddings: rd.Dataset) -> rd.Dataset:
    """Scalar int8 quantization of an embedding column (the memory-side
    scale path for ANN: 4x smaller vectors, distance in uint8 space) —
    per-vector min/max scaling to 0..255 codes, emitted as verifiable
    per-vector stats (n_dims, integer code sum, 6dp min/max) rather
    than the raw code blob.

    Determinism contract (shared with the SQL mirror): min/max are pure
    float comparisons (no accumulation); each code is
    floor((x - vmin) / (vmax - vmin) * 255 + 0.5) with every operand
    first cast float32 -> float64 (both sides), and the code SUM is
    exact int64.  Constant vectors (vmax == vmin) are dropped (mirror:
    WHERE vmax > vmin).  Stateless map — no shuffle at any scale."""
    def fn(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        offs = emb.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0] if len(offs) else offs  # sliced-array safe
        lens = np.diff(offs).astype(np.int64)
        vmin = np.minimum.reduceat(flat, offs[:-1])
        vmax = np.maximum.reduceat(flat, offs[:-1])
        keep = vmax > vmin
        span = np.where(keep, vmax - vmin, 1.0)
        codes = np.floor((flat - np.repeat(vmin, lens))
                         / np.repeat(span, lens) * 255 + 0.5) \
            .astype(np.int64)
        code_sum = np.add.reduceat(codes, offs[:-1])
        round6 = lambda a: np.floor(a * 1e6 + 0.5) / 1e6  # noqa: E731
        return pa.table({
            "vec_id": t["vec_id"].filter(pa.array(keep)),
            "n_dims": pa.array(lens[keep], type=pa.int64()),
            "code_sum": pa.array(code_sum[keep], type=pa.int64()),
            "vmin6": pa.array(round6(vmin[keep]), type=pa.float64()),
            "vmax6": pa.array(round6(vmax[keep]), type=pa.float64()),
        })

    return embeddings.map_batches(fn, batch_format="pyarrow")


def dequantize_batch(t: pa.Table) -> pa.Table:
    """Round-trip the int8 scalar quantization (quantize_stats) back to
    float64 vectors — the stream an int8-at-rest ANN deployment actually
    scores against.  Operation order shared verbatim with the SQL
    mirror: x -> code = floor((x - vmin)/(vmax - vmin)*255 + 0.5) ->
    dq = vmin + code/255*(vmax - vmin), every operand cast
    FLOAT -> DOUBLE first.  Constant vectors (vmax == vmin) drop, as in
    the mirror's WHERE vmax > vmin."""
    emb = t["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    offs = emb.offsets.to_numpy(zero_copy_only=False)
    offs = offs - offs[0] if len(offs) else offs
    lens = np.diff(offs).astype(np.int64)
    vmin = np.minimum.reduceat(flat, offs[:-1])
    vmax = np.maximum.reduceat(flat, offs[:-1])
    keep = vmax > vmin
    span = np.where(keep, vmax - vmin, 1.0)
    vmin_r, span_r = np.repeat(vmin, lens), np.repeat(span, lens)
    codes = np.floor((flat - vmin_r) / span_r * 255 + 0.5)
    dq = vmin_r + codes / 255 * span_r
    keep_flat = np.repeat(keep, lens)
    new_lens = lens[keep]
    new_offs = np.zeros(len(new_lens) + 1, dtype=np.int32)
    np.cumsum(new_lens, out=new_offs[1:])
    out = pa.ListArray.from_arrays(
        pa.array(new_offs), pa.array(dq[keep_flat], type=pa.float64()))
    return pa.table({
        "vec_id": t["vec_id"].filter(pa.array(keep)),
        "embedding": out,
    })


def dequantized_queries(sf_dir: str,
                        query_ids) -> dict[int, np.ndarray]:
    """The query vectors under the same quantize->dequantize round trip
    (numpy ops identical to dequantize_batch)."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    wanted = set(query_ids)
    out: dict[int, np.ndarray] = {}
    for r in t.to_pylist():
        if r["vec_id"] not in wanted:
            continue
        v = np.asarray(r["embedding"], dtype=np.float64)
        vmin, vmax = v.min(), v.max()
        if vmax <= vmin:
            continue
        codes = np.floor((v - vmin) / (vmax - vmin) * 255 + 0.5)
        out[r["vec_id"]] = vmin + codes / 255 * (vmax - vmin)
    return out
