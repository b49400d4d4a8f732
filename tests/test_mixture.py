"""Round-5: temperature-based mixture resampling — oracle parity plus a
first-principles recompute of the exact-integer rate contract."""

import hashlib
import math

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
        return con.sql(sql).df()
    finally:
        con.close()


def test_mixture_plan_parity_and_recompute():
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_mixture_plan
    got = _canon(q_mixture_plan(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["mixture_plan"]))
    pd.testing.assert_frame_equal(got, exp)

    # recompute the rate contract from the plan's own integers
    total = int(got["n_tokens"].sum())
    budget = total // 2
    s_sum = int(got["s_micro"].sum())
    for r in got.itertuples():
        assert r.s_micro == math.floor(math.sqrt(r.n_tokens) * 1e6 + 0.5)
        assert r.rate_micro == min(
            1_000_000,
            budget * r.s_micro * 1_000_000 // (s_sum * r.n_tokens))
    # sqrt temperature flattens: rates are anti-monotone in token mass
    m = got.sort_values("n_tokens")
    assert (m["rate_micro"].to_numpy()[:-1]
            >= m["rate_micro"].to_numpy()[1:] - 1).all()


def test_resample_parity_and_membership():
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import (q_doc_mixture_resample,
                                            q_mixture_plan)
    got = _canon(q_doc_mixture_resample(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_mixture_resample"]))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got)  # keeps a real subset

    # membership is exactly the hash test under the plan's rates
    rate = {r.source: r.rate_micro
            for r in q_mixture_plan(SF).to_pandas().itertuples()}
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source"])
    kept = set()
    for r in docs.itertuples():
        h = int.from_bytes(
            hashlib.md5(str(r.doc_id).encode()).digest()[:8],
            "little") % 1_000_000
        if h < rate[r.source]:
            kept.add(r.doc_id)
    assert set(got["doc_id"]) == kept


def test_keep_longest_retention():
    """Keep-longest near-dup retention: parity + policy recompute —
    every component keeps exactly its longest member."""
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import (q_doc_near_dup_drops,
                                            q_doc_near_dup_keep_longest)
    got = _canon(q_doc_near_dup_keep_longest(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_near_dup_keep_longest"]))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got)

    # same components as the min-id chain (same dropped+kept node sets),
    # different keeper policy
    minid = q_doc_near_dup_drops(SF).to_pandas()
    nodes_long = set(got["doc_id"]) | set(got["kept_by"])
    nodes_min = set(minid["doc_id"]) | set(minid["kept_by"])
    assert nodes_long == nodes_min

    # the keeper really is the longest (ties: smallest id)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "n_chars"]) \
             .set_index("doc_id")["n_chars"]
    for kept_by, g in got.groupby("kept_by"):
        members = list(g["doc_id"]) + [kept_by]
        best = sorted(members, key=lambda d: (-docs[d], d))[0]
        assert best == kept_by


def test_source_unigram_kl():
    """Domain-shift KL: parity + non-negativity + a first-principles
    float recompute within the quantisation tolerance."""
    import math
    from collections import Counter

    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_source_unigram_kl
    got = _canon(q_source_unigram_kl(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["source_unigram_kl"]))
    pd.testing.assert_frame_equal(got, exp)

    assert (got["kl_micro"] >= 0).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    corpus = Counter()
    per_src: dict = {}
    for r in docs.itertuples():
        toks = [w for w in r.text.split() if w]
        corpus.update(toks)
        per_src.setdefault(r.source, Counter()).update(toks)
    N = sum(corpus.values())
    for r in got.itertuples():
        cs = per_src[r.source]
        ns = sum(cs.values())
        assert ns == r.n_tokens
        kl = sum(c / ns * math.log((c * N) / (ns * corpus[w]))
                 for w, c in cs.items())
        assert abs(kl * 1e6 - r.kl_micro) < 2.0  # quantisation band


def test_source_distinct_ngrams():
    """Distinct-n diversity: parity + a brute-force recompute."""
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_source_distinct_ngrams
    got = _canon(q_source_distinct_ngrams(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["source_distinct_ngrams"]))
    pd.testing.assert_frame_equal(got, exp)

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    seen: dict = {}
    tot: dict = {}
    for r in docs.itertuples():
        ts = [w for w in r.text.split() if w]
        for n in (1, 2, 3):
            for i in range(len(ts) - n + 1):
                g = " ".join(ts[i:i + n])
                seen.setdefault((r.source, n), set()).add(g)
                tot[(r.source, n)] = tot.get((r.source, n), 0) + 1
    for r in got.itertuples():
        assert r.distinct_ngrams == len(seen[(r.source, r.n)])
        assert r.total_ngrams == tot[(r.source, r.n)]
    # higher n -> more distinctiveness (sanity on synthetic corpus)
    piv = got.pivot_table(index="source", columns="n",
                          values="ratio_micro")
    assert (piv[3] >= piv[2]).all() and (piv[2] >= piv[1]).all()


def test_source_keyness_topk():
    """Keyness: parity + brute-force log-odds recompute of one source's
    panel + rank invariants."""
    import math
    from collections import Counter

    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_source_keyness_topk
    got = _canon(q_source_keyness_topk(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["source_keyness_topk"]))
    pd.testing.assert_frame_equal(got, exp)

    # exactly 10 ranked rows per source, rnk = 1..10, delta descending
    for src, g in got.groupby("source"):
        g = g.sort_values("rnk")
        assert list(g["rnk"]) == list(range(1, 11))
        d = g["delta_micro"].to_numpy()
        assert (d[:-1] >= d[1:]).all()

    # brute-force the winning token of one source
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    corpus = Counter()
    per_src: dict = {}
    for r in docs.itertuples():
        toks = [w for w in r.text.split() if w]
        corpus.update(toks)
        per_src.setdefault(r.source, Counter()).update(toks)
    N = sum(corpus.values())
    src = sorted(per_src)[0]
    cs, ns = per_src[src], sum(per_src[src].values())
    best = max(
        ((math.floor((math.log((c + 1.0) / (ns - c + 1.0))
                      - math.log((corpus[w] - c + 1.0)
                                 / (N - ns - (corpus[w] - c) + 1.0)))
                     * 1e6 + 0.5), w)
         for w, c in cs.items()), key=lambda t: (t[0], [-ord(ch) for ch
                                                        in t[1]]))
    top = got[(got["source"] == src) & (got["rnk"] == 1)].iloc[0]
    assert top["delta_micro"] == best[0]


def test_source_neardup_matrix():
    """Syndication matrix: parity + recompute from the verified pair
    list + total-mass identity."""
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import (q_doc_jaccard_pairs,
                                            q_source_neardup_matrix)
    got = _canon(q_source_neardup_matrix(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["source_neardup_matrix"]))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got)

    pairs = q_doc_jaccard_pairs(SF).to_pandas()
    src = pd.read_parquet(f"{SF}/documents.parquet",
                          columns=["doc_id", "source"]) \
            .set_index("doc_id")["source"]
    from collections import Counter
    ref: Counter = Counter()
    for r in pairs.itertuples():
        a, b = src[r.doc_a], src[r.doc_b]
        ref[(min(a, b), max(a, b))] += 1
    assert {(r.src_a, r.src_b): r.n_pairs
            for r in got.itertuples()} == dict(ref)
    assert got["n_pairs"].sum() == len(pairs)


def test_doc_blocklist_hits():
    """Blocklist drop list: parity + brute-force recompute."""
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import (_BLOCKLIST,
                                            q_doc_blocklist_hits)
    got = _canon(q_doc_blocklist_hits(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_blocklist_hits"]))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got)

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    ref = {}
    bl = set(_BLOCKLIST)
    for r in docs.itertuples():
        n = sum(1 for w in r.text.split() if w in bl)
        if n:
            ref[r.doc_id] = n
    assert {r.doc_id: r.n_hits for r in got.itertuples()} == ref


def test_corpus_f2_sketch():
    """AMS F2: parity, exact-F2 identity, and the unbiasedness-flavoured
    sanity that estimates bracket the truth within the B-bucket bound."""
    from collections import Counter

    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_corpus_f2_sketch
    got = _canon(q_corpus_f2_sketch(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["corpus_f2_sketch"]))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == 5

    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    cnt = Counter(w for t in docs["text"] for w in t.split() if w)
    f2 = sum(c * c for c in cnt.values())
    assert (got["f2_exact"] == f2).all()
    # estimates are positive and the per-row error is what's reported
    for r in got.itertuples():
        assert r.f2_est > 0
        assert r.err_micro == int(np.floor(
            abs(r.f2_est - f2) / f2 * 1e6 + 0.5))
    # the median estimate should be in the right ballpark (loose bound:
    # AMS variance <= 2*F2^2/B per row; 10x band catches sign bugs)
    med = sorted(got["f2_est"])[2]
    assert f2 / 10 <= med <= f2 * 10


def test_doc_weighted_sample_topk():
    """E-S weighted sample: parity + first-principles key recompute +
    the exact-top-64 property."""
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_doc_weighted_sample_topk
    got = _canon(q_doc_weighted_sample_topk(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_weighted_sample_topk"]))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == 64

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "n_chars"])
    keys = {}
    for r in docs.itertuples():
        h = int.from_bytes(hashlib.md5(
            str(r.doc_id).encode()).digest()[:8], "little")
        u = ((h >> 11) + 0.5) / 2.0 ** 53
        keys[r.doc_id] = int(np.floor(
            math.log(u) / r.n_chars * 1e9 + 0.5))
    for r in got.itertuples():
        assert keys[r.doc_id] == r.lnkey_nano
    # selection IS the global top-64 by (key DESC, doc_id ASC)
    ordered = sorted(keys.items(), key=lambda kv: (-kv[1], kv[0]))[:64]
    assert [d for d, _ in ordered] == list(
        got.sort_values("rnk")["doc_id"])


def test_corpus_shard_manifest():
    """Shard manifest: parity + change-detection property (mutating one
    doc flips exactly its shard's checksum) + block-split invariance."""
    import ray.data as rd

    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import (_MANIFEST_SHARDS,
                                            q_corpus_shard_manifest)
    got = _canon(q_corpus_shard_manifest(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["corpus_shard_manifest"]))
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == _MANIFEST_SHARDS

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert got["n_docs"].sum() == len(docs)

    # mutate one doc -> only its shard's checksum changes
    import tempfile, os
    mut = docs.copy()
    victim = int(mut.iloc[7]["doc_id"])
    mut.loc[mut["doc_id"] == victim, "text"] = "changed text entirely"
    with tempfile.TemporaryDirectory() as td:
        mut.to_parquet(os.path.join(td, "documents.parquet"),
                       index=False)
        got2 = _canon(q_corpus_shard_manifest(td).to_pandas())
    diff = got.merge(got2, on="shard", suffixes=("_a", "_b"))
    changed = diff[diff["checksum_a"] != diff["checksum_b"]]
    assert list(changed["shard"]) == [victim % _MANIFEST_SHARDS]
