"""Bigram-LM scoring and the as-of join — exact values on tiny fixtures."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from wsid_ray.stages.lm import bigram_lm_scores, doc_bigram_partial


def test_doc_bigram_partial_counts():
    t = pa.table({"doc_id": pa.array([7, 8], type=pa.int64()),
                  "text": pa.array(["a b a b", "x"])})
    out = doc_bigram_partial(t).to_pylist()
    got = {(r["doc_id"], r["w1"], r["w2"]): r["k"] for r in out}
    # "a b a b": bigrams (a,b) x2, (b,a) x1; "x" has none
    assert got == {(7, "a", "b"): 2, (7, "b", "a"): 1}


def test_bigram_lm_scores_exact():
    texts = ["a b a b", "a b c"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(texts)}))
    out = {r["doc_id"]: r
           for r in bigram_lm_scores(ds, num_buckets=2).take_all()}
    # corpus: c(a,b)=3, c(b,a)=1, c(b,c)=1; heads: a->3, b->2; V=3
    V = 3

    def p(c, ch):
        return (c + 1.0) / (ch + V)

    def term(k, c, ch):
        return math.floor(k * math.log(p(c, ch)) * 1e6 + 0.5)

    # doc0: (a,b) k=2, (b,a) k=1
    s0 = term(2, 3, 3) + term(1, 1, 2)
    exp0 = math.floor((s0 / 1e6) / 3 * 1e6 + 0.5) / 1e6
    # doc1: (a,b) k=1, (b,c) k=1
    s1 = term(1, 3, 3) + term(1, 1, 2)
    exp1 = math.floor((s1 / 1e6) / 2 * 1e6 + 0.5) / 1e6
    assert out[0]["n_bigrams"] == 3 and out[1]["n_bigrams"] == 2
    assert out[0]["lm_score"] == exp0
    assert out[1]["lm_score"] == exp1


def test_asof_join_backward_with_ties():
    from wsid_ray.stages.joins import asof_join
    left = rd.from_pandas(pd.DataFrame({
        "eid": [1, 2, 3],
        "u": [10, 10, 20],
        "ts": pd.to_datetime(["2024-01-05", "2024-01-01", "2024-01-05"]),
    }))
    right = rd.from_pandas(pd.DataFrame({
        "u2": [10, 10, 10, 20],
        "od": pd.to_datetime(
            ["2024-01-02", "2024-01-02", "2024-01-04", "2024-01-06"]),
        "ok": [100, 101, 102, 200],
    }))
    out = asof_join(left, right, by_left="u", by_right="u2",
                    on_left="ts", on_right="od", tie_right="ok",
                    num_buckets=2).to_pandas()
    got = {int(r.eid): int(r.ok) for r in out.itertuples()}
    # eid=1: latest od<=01-05 is 01-04 -> ok=102
    # eid=2: no od <= 01-01 -> dropped (inner)
    # eid=3: u=20 has od=01-06 > 01-05 -> dropped
    assert got == {1: 102}


def test_asof_join_tie_breaks_to_max_tie():
    from wsid_ray.stages.joins import asof_join
    left = rd.from_pandas(pd.DataFrame({
        "eid": [1], "u": [10],
        "ts": pd.to_datetime(["2024-01-05"])}))
    right = rd.from_pandas(pd.DataFrame({
        "u2": [10, 10],
        "od": pd.to_datetime(["2024-01-02", "2024-01-02"]),
        "ok": [101, 100]}))
    out = asof_join(left, right, by_left="u", by_right="u2",
                    on_left="ts", on_right="od", tie_right="ok",
                    num_buckets=1).to_pandas()
    assert list(out["ok"]) == [101]


def test_tfidf_topk_exact():
    from wsid_ray.stages.lm import tfidf_topk
    texts = ["apple apple banana", "banana cherry", "apple cherry date"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(texts)}))
    out = tfidf_topk(ds, k=2, num_buckets=2).take_all()
    N = 3
    df = {"apple": 2, "banana": 2, "cherry": 2, "date": 1}

    def s(tf, d):
        return math.floor(
            tf * (math.log((1 + N) / (1 + df[d])) + 1.0) * 1e6 + 0.5) / 1e6

    got = {(r["doc_id"], r["rank"]): (r["token"], r["score"])
           for r in out}
    # doc0: apple tf=2 beats banana tf=1
    assert got[(0, 1)] == ("apple", s(2, "apple"))
    assert got[(0, 2)] == ("banana", s(1, "banana"))
    # doc1: equal scores -> token ASC tie-break
    assert got[(1, 1)] == ("banana", s(1, "banana"))
    assert got[(1, 2)] == ("cherry", s(1, "cherry"))
    # doc2: date has lowest df -> highest idf wins rank 1
    assert got[(2, 1)] == ("date", s(1, "date"))
    # k=2 respected
    assert len(out) == 6


def test_cms_heavy_hitters_exact_despite_collisions():
    """w_log2=4 (16 counters per row) over ~40 distinct tokens forces
    Count-Min collisions; the exact second pass must still produce
    exactly the true >= threshold set with exact counts."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from wsid_ray.stages.lm import cms_heavy_hitters

    texts = []
    for i in range(40):
        reps = 20 if i < 5 else 3          # 5 true heavy hitters
        texts.append(" ".join([f"tok{i}"] * reps))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts)}))
    out = {r["token"]: r["n"]
           for r in cms_heavy_hitters(docs, threshold=20, w_log2=4,
                                      num_buckets=2).take_all()}
    truth = collections.Counter(
        t for s in texts for t in s.split())
    want = {t: n for t, n in truth.items() if n >= 20}
    assert out == want


def test_purchase_click_attribution_tolerance():
    import pandas as pd
    from wsid_ray.pipelines.queries import q_purchase_click_attribution
    SF = "/root/testdata/sf0.001"
    got = q_purchase_click_attribution(SF).to_pandas()
    # every attribution respects the closed 1 h lookback
    assert got["gap_us"].between(0, 3_600_000_000).all()
    # one attribution row per purchase at most
    assert not got.duplicated("purchase_id").any()
    # widening the window can only add attributions
    wide = q_purchase_click_attribution(SF,
                                        window_us=86_400_000_000) \
        .to_pandas()
    assert len(wide) >= len(got)
    assert set(got["purchase_id"]).issubset(set(wide["purchase_id"]))
