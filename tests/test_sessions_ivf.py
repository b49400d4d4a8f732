"""Sessionization + IVF ANN."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from wsid_ray.stages.knn import ivf_topk, knn_topk
from wsid_ray.stages.sessions import sessionize


def test_sessionize_gap_split():
    t0 = pd.Timestamp("2026-01-01")
    rows = [
        (1, t0, 100),
        (1, t0 + pd.Timedelta(minutes=10), 101),
        (1, t0 + pd.Timedelta(minutes=50), 102),   # gap 40 > 30 -> new
        (2, t0, 200),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    out = sessionize(rd.from_pandas(df), gap_minutes=30).to_pandas()
    out = out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    assert list(map(tuple, out[["user_id", "session_idx", "n_events"]]
                    .itertuples(index=False))) == [
        (1, 0, 2), (1, 1, 1), (2, 0, 1)]
    assert out.iloc[0]["end_ts"] == t0 + pd.Timedelta(minutes=10)


def _emb_ds(n=400, d=16, seed=5):
    rng = np.random.RandomState(seed)
    # clustered data so IVF lists are meaningful
    centers = rng.standard_normal((4, d)) * 3
    X = np.vstack([centers[i % 4] + rng.standard_normal(d) * 0.5
                   for i in range(n)])
    t = pa.table({
        "vec_id": pa.array(range(n), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in X],
                              type=pa.list_(pa.float32())),
    })
    return rd.from_arrow(t).repartition(4), X


def test_ivf_recall_vs_bruteforce():
    ds, X = _emb_ds()
    queries = {i: X[i].astype(np.float64) for i in range(3)}
    exact = knn_topk(ds, queries, k=10).to_pandas()
    approx = ivf_topk(ds, queries, k=10, n_lists=4, n_probe=2).to_pandas()
    recalls = []
    for q in queries:
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8, recalls


def test_ivf_deterministic():
    ds, X = _emb_ds()
    queries = {0: X[0].astype(np.float64)}
    a = ivf_topk(ds, queries, k=5, n_lists=4).to_pandas()
    b = ivf_topk(ds, queries, k=5, n_lists=4).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("vec_id").reset_index(drop=True),
        b.sort_values("vec_id").reset_index(drop=True))


def test_lsh_recall_vs_bruteforce():
    from wsid_ray.stages.knn import lsh_topk
    ds, X = _emb_ds()
    queries = {i: X[i].astype(np.float64) for i in range(3)}
    exact = knn_topk(ds, queries, k=10).to_pandas()
    approx = lsh_topk(ds, queries, k=10, n_planes=4,
                      dim=X.shape[1]).to_pandas()
    recalls = []
    for q in queries:
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(e & a) / len(e))
    # clustered data: same-bucket neighbours dominate the exact top-k
    assert np.mean(recalls) >= 0.6, recalls
