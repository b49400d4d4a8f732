"""Corpus-trained TF-IDF hashed embedder (round 5): IDF weighting is
LIVE (common tokens downweighted vs the unweighted fake), training is
block-split invariant, and scoring matches a brute-force reimplementation
from the artifact bytes."""

import hashlib
import math
import os

import numpy as np
import pyarrow.parquet as pq
import ray.data as rd

from wsid_ray.embedmodel import (_UNSEEN_IDF_MICRO, TfidfHashEmbedder,
                                 train_idf)
from wsid_ray.stages.tokenize import tokenize_batch


def _toklists(texts):
    import pyarrow as pa
    t = tokenize_batch(pa.table({
        "conv_id": pa.array(["c"] * len(texts)),
        "turn_idx": pa.array(range(len(texts)), type=pa.int32()),
        "role": pa.array(["u"] * len(texts)),
        "text": pa.array(texts),
        "tool": pa.array([""] * len(texts)),
        "ts": pa.array([0] * len(texts), type=pa.timestamp("us")),
    }))
    return t["tokens"].to_pylist()


_DOCS = [
    "common1 common1 rare1a rare1b",
    "common1 rare2a rare2b rare2c",
    "common1 rare3a",
    "common1 rare4a rare4b",
]


def _idf_path(tmp_path):
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(_DOCS)])
    tbl = train_idf(ds)
    p = os.path.join(str(tmp_path), "idf.parquet")
    pq.write_table(tbl, p)
    return p


def _ref_embed(idf_path, text, dim=32):
    """Brute-force from the artifact: per-token md5 hash, signed
    tf x idf_micro sums (the SQL mirror's semantics)."""
    rows = pq.read_table(idf_path).to_pylist()
    idf = {r["token"]: r["idf_micro"] for r in rows}
    from wsid_ray.stages.tokenize import tokenize_column
    import pyarrow as pa
    toks = tokenize_column(pa.array([text]))[0].as_py()
    v = np.zeros(dim, dtype=np.int64)
    for tok in toks:
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                           "little")
        sign = -1 if (h >> 63) & 1 else 1
        v[h % dim] += sign * idf.get(tok, _UNSEEN_IDF_MICRO)
    return v


def test_idf_values_and_smoothing(ray_session, tmp_path):
    p = _idf_path(tmp_path)
    rows = {r["token"]: r for r in pq.read_table(p).to_pylist()}
    assert rows["common1"]["df"] == 4
    assert rows["rare1a"]["df"] == 1
    N = 4
    for tok, df in (("common1", 4), ("rare1a", 1)):
        want = math.floor(math.log((N + 1) / (df + 1)) * 1e6 + 0.5) \
            + _UNSEEN_IDF_MICRO
        assert rows[tok]["idf_micro"] == want
    # the trained weighting is live: rare tokens weigh MORE than common
    assert rows["rare1a"]["idf_micro"] > rows["common1"]["idf_micro"]


def test_embedder_matches_artifact_reference(ray_session, tmp_path):
    p = _idf_path(tmp_path)
    model = TfidfHashEmbedder(p, dim=32)
    texts = _DOCS + ["unseen9x common1", ""]
    M = model(texts)
    for i, t in enumerate(texts):
        ref = _ref_embed(p, t)
        assert np.array_equal(M[i].astype(np.int64), ref), t


def test_training_block_split_invariant(ray_session, tmp_path):
    docs = [{"doc_id": i, "text": t} for i, t in enumerate(_DOCS * 6)]
    a = train_idf(rd.from_items(docs))
    b = train_idf(rd.from_items(docs).repartition(5))
    assert a.equals(b)


def test_model_differs_from_unweighted_fake(ray_session, tmp_path):
    """The fake counts occurrences; the trained model weights by idf —
    on a doc where a common and a rare token collide in count, the two
    disagree (the model is live, not a relabelled fake)."""
    from wsid_ray.stages.embed import FakeTextEmbedder
    import pyarrow as pa
    p = _idf_path(tmp_path)
    model = TfidfHashEmbedder(p, dim=32)
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["common1 rare1a"])})
    fake = FakeTextEmbedder(dim=32)(t)["embedding"][0].as_py()
    real = model(["common1 rare1a"])[0]
    # same nonzero support (same hash buckets) but different weights
    assert (np.asarray(fake) != 0).sum() == (real != 0).sum()
    assert not np.allclose(np.asarray(fake), real)


def _int_pairs(vecs, tau_num, tau_den):
    from wsid_ray.stages.knn import near_dup_pairs_exact_int
    ds = rd.from_items([{"vec_id": i, "embedding": [float(x) for x in v]}
                        for i, v in vecs.items()])
    out = near_dup_pairs_exact_int(ds, tau_num=tau_num, tau_den=tau_den)
    return sorted((r["vec_a"], r["vec_b"], r["dot"], r["na2"], r["nb2"])
                  for r in out.take_all())


def test_exact_int_near_dup_strict_boundary(ray_session):
    """cos([3,4],[1,0]) == 3/5 EXACTLY: strict > excludes it at tau=3/5
    and includes it at tau=59/100 — the float prefilter cannot blur the
    boundary because the decision is arbitrary-precision integer."""
    vecs = {1: [3, 4], 2: [1, 0]}
    assert _int_pairs(vecs, 3, 5) == []
    assert _int_pairs(vecs, 59, 100) == [(1, 2, 3, 25, 1)]


def test_exact_int_near_dup_norms_travel_with_ids(ray_session):
    """vec_a < vec_b is enforced after the block-pair join; na2 must be
    vec_a's norm regardless of which block each id landed in (ids 8 and
    17 fall in different mod-8 blocks, in both orders)."""
    vecs = {17: [2, 0], 8: [1, 1], 24: [3, 3]}
    got = _int_pairs(vecs, 1, 2)
    assert (8, 24, 6, 2, 18) in got
    for a, b, dot, na2, nb2 in got:
        assert a < b


def test_exact_int_near_dup_rejects_nonint_and_huge(ray_session):
    import pytest
    with pytest.raises(Exception, match="integer-valued"):
        _int_pairs({1: [0.5, 1.0], 2: [1.0, 0.0]}, 1, 2)
    with pytest.raises(Exception, match="magnitude contract"):
        _int_pairs({1: [float(1 << 29), 0.0], 2: [1.0, 0.0]}, 1, 2)


def test_trained_near_dup_end_to_end(ray_session, tmp_path):
    """Identical docs through the trained-model chain are cos=1 pairs;
    unrelated docs stay out at tau=4/5."""
    from wsid_ray.stages.embed import embed_documents
    from wsid_ray.stages.knn import near_dup_pairs_exact_int
    p = _idf_path(tmp_path)
    docs = rd.from_items(
        [{"doc_id": 0, "text": _DOCS[0]},
         {"doc_id": 9, "text": _DOCS[0]},   # exact dup, different block
         {"doc_id": 2, "text": _DOCS[2]}])
    emb = embed_documents(docs, dim=32, model=TfidfHashEmbedder(p, dim=32))
    got = [(r["vec_a"], r["vec_b"], r["dot"], r["na2"], r["nb2"])
           for r in near_dup_pairs_exact_int(emb, 4, 5).take_all()]
    assert len(got) == 1
    a, b, dot, na2, nb2 = got[0]
    assert (a, b) == (0, 9) and dot == na2 == nb2  # cos exactly 1


def test_actor_pool_model_path(ray_session, tmp_path):
    from wsid_ray.stages.embed import embed_documents
    p = _idf_path(tmp_path)
    model = TfidfHashEmbedder(p, dim=32)
    docs = rd.from_items([{"doc_id": i, "text": t}
                          for i, t in enumerate(_DOCS)])
    out = {r["vec_id"]: np.asarray(r["embedding"])
           for r in embed_documents(docs, dim=32, model=model).take_all()}
    M = model(_DOCS)
    for i in range(len(_DOCS)):
        assert np.array_equal(out[i], M[i])
