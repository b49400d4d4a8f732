"""Bigram language-model quality scoring over the documents table.

The CCNet-style move (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"): score every document by its
average per-bigram log-probability under a corpus-level n-gram LM and use
the score as a quality / in-domain signal.  Here the LM is a bigram model
with add-one smoothing fit on the corpus itself:

    p(v | w) = (c(w, v) + 1) / (c_head(w) + V)

where ``c(w, v)`` is the corpus count of the bigram, ``c_head(w) =
Σ_v c(w, v)`` (occurrences of ``w`` as a bigram head), and ``V`` is the
corpus vocabulary size (distinct whitespace tokens, all positions).

Scale design — everything is counts + joins, nothing is broadcast:

* Per-doc bigram multiplicities need NO shuffle: a document is one row,
  so one vectorised ``map_batches`` emits the per-doc aggregate directly.
* Corpus counts are partial-before-shuffle ``bucketed_sum`` folds keyed
  (w1, w2) and (w1,) — at 100 TB the model table shards with the key; it
  is never collected on the driver and never ``ray.put`` as a whole.
* Scoring joins doc-bigrams against the model with the partitioned hash
  join (stages/joins.py) — same-key bucketing, no all-to-all beyond the
  two keyed exchanges.
* Float determinism: each doc's score is a SUM of float terms, and float
  addition is not associative — so each term is scaled to int64 micro
  units first (floor(k·ln(p)·1e6 + 0.5)); integer sums are exact in any
  distribution order.  The SQL mirror (__ray_entry__.oracle_sql,
  bigram_lm_score) applies the identical scaling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .textstats import _word_rows


def doc_bigram_partial(t: pa.Table) -> pa.Table:
    """(doc_id, w1, w2, k) — per-document bigram multiplicities.

    Each document is a single input row, so this IS the per-doc
    aggregate; no shuffle needed.  Vectorised: RE2 split, dictionary
    encode, packed-int64 np.unique (two-level packing via the pair id so
    the key never exceeds #words·V — no int64 overflow)."""
    row_of, nonempty, flat, _ = _word_rows(t)
    rows = row_of[nonempty]
    empty = pa.table({
        "doc_id": pa.array([], type=t.schema.field("doc_id").type),
        "w1": pa.array([], type=pa.string()),
        "w2": pa.array([], type=pa.string()),
        "k": pa.array([], type=pa.int64()),
    })
    if not len(rows):
        return empty
    words = flat.filter(pa.array(nonempty))
    enc = pc.dictionary_encode(words)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    V = len(enc.dictionary)
    adj = rows[1:] == rows[:-1]
    if not adj.any():
        return empty
    _upairs, pair_id = np.unique(rows * V + codes, return_inverse=True)
    key = pair_id[:-1][adj] * V + codes[1:][adj]
    ukey, cnt = np.unique(key, return_counts=True)
    p1 = ukey // V
    return pa.table({
        "doc_id": pc.take(t["doc_id"], pa.array(_upairs[p1] // V)),
        "w1": pc.take(enc.dictionary, pa.array(_upairs[p1] % V)),
        "w2": pc.take(enc.dictionary, pa.array(ukey % V)),
        "k": pa.array(cnt.astype(np.int64), type=pa.int64()),
    })


def doc_term_counts(t: pa.Table) -> pa.Table:
    """(doc_id, token, tf) — per-document term frequencies.  Each doc is
    one input row, so this is the per-doc aggregate directly (no
    shuffle); one packed-int64 np.unique per batch."""
    row_of, nonempty, flat, _ = _word_rows(t)
    rows = row_of[nonempty]
    if not len(rows):
        return pa.table({
            "doc_id": pa.array([], type=t.schema.field("doc_id").type),
            "token": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
        })
    words = flat.filter(pa.array(nonempty))
    enc = pc.dictionary_encode(words)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    V = len(enc.dictionary)
    upairs, cnt = np.unique(rows * V + codes, return_counts=True)
    return pa.table({
        "doc_id": pc.take(t["doc_id"], pa.array(upairs // V)),
        "token": pc.take(enc.dictionary, pa.array(upairs % V)),
        "tf": pa.array(cnt.astype(np.int64), type=pa.int64()),
    })


def tfidf_topk(docs: rd.Dataset, k: int = 5,
               num_buckets: int = 32) -> rd.Dataset:
    """(doc_id, token, tf, score, rank) — top-k tokens per document by
    smooth tf-idf (sklearn-style idf = ln((1+N)/(1+df)) + 1; Salton &
    Buckley 1988 weighting family), rank ties broken (score DESC,
    token ASC) — fully deterministic.

    Scale design: term frequencies need no shuffle (one doc = one row);
    document frequencies are a partial-count fold keyed on token; the
    idf attach is a partitioned hash join (the df table shards with the
    key — never broadcast); top-k is a per-doc bucketed group apply.
    The tf dataset is consumed twice (df fold + join) — at 100 TB,
    checkpoint it to parquet between the passes instead of recomputing
    the tokenise."""
    from ..pipelines.analytics import partial_count
    from .groups import bucketed_group_apply
    from .joins import hash_join

    tf = docs.map_batches(doc_term_counts, batch_format="pyarrow")
    df = partial_count(
        tf.select_columns(["token"]), ["token"], out_name="df")
    n_docs = docs.count()

    j = hash_join(tf, df, on=["token"], num_buckets=num_buckets)

    def score(t: pa.Table) -> pa.Table:
        tf_v = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_v = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.log((1.0 + float(n_docs)) / (1.0 + df_v)) + 1.0
        s = np.floor(tf_v * idf * 1e6 + 0.5) / 1e6
        return pa.table({
            "doc_id": t["doc_id"],
            "token": t["token"],
            "tf": t["tf"].cast(pa.int64()),
            "score": pa.array(s, type=pa.float64()),
        })

    scored = j.map_batches(score, batch_format="pyarrow")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "score", "token"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
        g["rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
        return g[g["rank"] <= k]

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("token", pa.string()),
        ("tf", pa.int64()), ("score", pa.float64()),
        ("rank", pa.int64()),
    ])
    return bucketed_group_apply(scored, ["doc_id"], topk,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def _distinct_token_count(docs: rd.Dataset) -> int:
    """V — corpus vocabulary size (distinct whitespace tokens).  One
    cheap keyed pass: per-batch unique tokens, bucketed distinct, count."""
    from .groups import distinct

    def toks(t: pa.Table) -> pa.Table:
        _row_of, nonempty, flat, _ = _word_rows(t)
        words = flat.filter(pa.array(nonempty))
        u = pc.unique(words)
        return pa.table({"tok": u.cast(pa.string())})

    return distinct(docs.map_batches(toks, batch_format="pyarrow"),
                    ["tok"]).count()


def bigram_lm_scores(docs: rd.Dataset,
                     num_buckets: int = 32) -> rd.Dataset:
    """(doc_id, n_bigrams, lm_score) — add-one-smoothed bigram LM score.

    lm_score = half-up-6dp of (Σ_bigrams k·ln p)/1e6 / Σ k with each term
    pre-scaled to int64 micro units (see module docstring)."""
    from ..pipelines.analytics import bucketed_sum
    from .joins import hash_join

    # the per-doc bigram table feeds the model fold AND the scoring join;
    # pin it once instead of recomputing the tokenise per consumer.  It is
    # a REDUCED derivative (counts, no text) so it is safe to hold in the
    # object store at bench scales; the 100 TB plan checkpoints it to
    # parquet between the passes instead (same two-pass shape).
    kg = docs.map_batches(doc_bigram_partial,
                          batch_format="pyarrow").materialize()
    model_bg = bucketed_sum(
        kg.select_columns(["w1", "w2", "k"]).map_batches(
            lambda t: t.rename_columns(["w1", "w2", "c"]),
            batch_format="pyarrow"),
        ["w1", "w2"], ["c"], num_buckets=num_buckets).materialize()
    # head counts fold the (small) bigram-type model table, not the
    # per-doc rows: Σ_v c(w, v) is the same sum either way
    model_head = bucketed_sum(
        model_bg.select_columns(["w1", "c"]).map_batches(
            lambda t: t.rename_columns(["w1", "ch"]),
            batch_format="pyarrow"),
        ["w1"], ["ch"], num_buckets=num_buckets)
    V = _distinct_token_count(docs)

    j = hash_join(kg, model_bg, on=["w1", "w2"],
                  num_buckets=num_buckets)
    j = hash_join(j, model_head, on=["w1"], num_buckets=num_buckets)

    def terms(t: pa.Table) -> pa.Table:
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.float64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        ch = t["ch"].to_numpy(zero_copy_only=False).astype(np.float64)
        sc = np.floor(k * np.log((c + 1.0) / (ch + float(V)))
                      * 1e6 + 0.5).astype(np.int64)
        # partial per-doc fold before the final keyed combine
        df = pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "sc": sc,
            "k": t["k"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby("doc_id", sort=False, as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = j.map_batches(terms, batch_format="pyarrow")
    summed = bucketed_sum(partials, ["doc_id"], ["sc", "k"],
                          num_buckets=num_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        sc = t["sc"].to_numpy(zero_copy_only=False).astype(np.float64)
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.floor((sc / 1e6) / k * 1e6 + 0.5) / 1e6
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bigrams": t["k"].cast(pa.int64()),
            "lm_score": pa.array(score, type=pa.float64()),
        })

    return summed.map_batches(finalize, batch_format="pyarrow")


def importance_sample(docs: rd.Dataset,
                      num_buckets: int = 32) -> rd.Dataset:
    """Quality-proportional importance sampling (the DSIR idea — Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling" — with the corpus bigram LM as the scorer): each
    document's acceptance RATE is a monotone map of its LM quality score,
    and acceptance itself is the deterministic content-stable hash test
    ``md5_number_upper(doc_id) % 100 < rate`` — no RNG state to ship, so
    re-runs, resumes and repartitions keep the identical sample.

    rate = clamp(floor((lm_score + 4)·100 + 0.5), 5, 95) — the monotone
    map is the UDF hook; computed on the 6-dp-rounded score, so both
    sides of the SQL mirror derive the same integer."""
    import hashlib

    lm = bigram_lm_scores(docs, num_buckets=num_buckets)

    def pick(t: pa.Table) -> pa.Table:
        s = t["lm_score"].to_numpy(zero_copy_only=False)
        rate = np.clip(np.floor((s + 4.0) * 100.0 + 0.5),
                       5, 95).astype(np.int64)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8],
                            "little") % 100 for i in ids),
            dtype=np.int64, count=len(ids))
        keep = h < rate
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "lm_score": t["lm_score"].filter(pa.array(keep)),
            "rate": pa.array(rate[keep], type=pa.int64()),
        })

    return lm.map_batches(pick, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min heavy hitters (Cormode & Muthukrishnan 2005)

_CMS_D = 4            # sketch rows; d x w_log2 index bits must fit in 64


def _cms_hashes(tokens, w_log2: int) -> "np.ndarray":
    """(d, n) index matrix: row i uses bits [i*w_log2, (i+1)*w_log2) of
    the md5-parity 64-bit hash (== DuckDB md5_number_upper — same kernel
    as the minhash/simhash/HLL family, though the mirror never needs
    it: the sketch only gates the shuffle, not the answer)."""
    import hashlib
    hv = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
         for t in tokens),
        dtype=np.uint64, count=len(tokens))
    mask = np.uint64((1 << w_log2) - 1)
    return np.stack([(hv >> np.uint64(i * w_log2)) & mask
                     for i in range(_CMS_D)]).astype(np.int64)


@ray.remote
def _block_cms(t: pa.Table, w_log2: int):
    """Partial Count-Min matrix of one (doc_id, token, tf) block."""
    import pyarrow.compute as pc
    cms = np.zeros((_CMS_D, 1 << w_log2), dtype=np.int64)
    agg = pa.TableGroupBy(t.select(["token", "tf"]),
                          "token").aggregate([("tf", "sum")])
    toks = agg["token"].to_pylist()
    tfs = agg["tf_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    idx = _cms_hashes(toks, w_log2)
    for i in range(_CMS_D):
        np.add.at(cms[i], idx[i], tfs)
    return cms


@ray.remote
def _sum_cms(*parts):
    out = parts[0].copy()
    for p in parts[1:]:
        out += p
    return out


def cms_heavy_hitters(docs: rd.Dataset, threshold: int,
                      w_log2: int = 13,
                      num_buckets: int = 16) -> rd.Dataset:
    """Exact corpus heavy hitters (tokens with total count >= threshold)
    in two passes that never shuffle the full term set:

    1. fold each block of per-doc term counts into a fixed
       d x 2^w_log2 Count-Min matrix (here 4 x 8192 = 256 KiB of int64,
       constant no matter the vocabulary), tree-sum the matrices;
    2. re-scan the same blocks against the ONE broadcast sketch: a
       token's estimate min_i cms[i, h_i(token)] never underestimates
       (all updates are non-negative), so tokens passing the gate are a
       guaranteed superset of the true heavy hitters — only those few
       shuffle, get exact-counted, and the exact count applies the
       threshold again to drop the sketch's false positives.

    Result is EXACT (mirror = plain GROUP BY ... HAVING); the sketch
    only bounds how much the shuffle sees.  The term-count blocks are
    consumed twice — at 100 TB checkpoint them to parquet between the
    passes instead of recomputing the tokenise."""
    from ..pipelines.analytics import bucketed_sum

    tf = docs.map_batches(doc_term_counts, batch_format="pyarrow")
    refs = tf.to_arrow_refs()
    parts = [_block_cms.remote(b, w_log2) for b in refs]
    while len(parts) > 1:
        parts = [_sum_cms.remote(*parts[i:i + 8])
                 for i in range(0, len(parts), 8)]
    cms_ref = parts[0]

    def gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cms = ray.get(cms_ref)             # zero-copy object-store read
        agg = pa.TableGroupBy(t.select(["token", "tf"]),
                              "token").aggregate([("tf", "sum")])
        toks = agg["token"].to_pylist()
        idx = _cms_hashes(toks, w_log2)
        est = np.min(
            np.stack([cms[i][idx[i]] for i in range(_CMS_D)]), axis=0)
        keep = est >= threshold
        return pa.table({
            "token": pa.array([t_ for t_, k in zip(toks, keep) if k]),
            "n": agg["tf_sum"].filter(pa.array(keep)).cast(pa.int64())})

    cand = rd.from_arrow_refs(refs).map_batches(
        gate, batch_format="pyarrow")
    totals = bucketed_sum(cand, ["token"], ["n"],
                          num_buckets=num_buckets)
    return totals.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["n"], threshold)),
        batch_format="pyarrow")


def tfidf_pair_sim(docs: rd.Dataset, k: int = 5, group_cap: int = 1000,
                   num_buckets: int = 16) -> rd.Dataset:
    """Sparse-vector document similarity join: cosine between the top-k
    tf-idf vectors of every doc pair sharing at least one top-k term —
    the classic inverted-index self-join (Bayardo et al. 2007 "Scaling
    Up All Pairs Similarity Search" family), here exact over the
    k-sparse vectors.

    Integer contract: each retained term weight is
    floor(score6 * 1000 + 0.5) (milli-units of the already-6dp-rounded
    tf-idf score — one shared double op chain), so dot products and
    norms are exact int64 (|s| <= ~1.5e6 -> products <= ~2.3e12);
    cosine is ONE float op from those exact ints, rounded half-up 6dp.

    Scale shape: candidate pairs generate inside per-TOKEN groups
    (bucketed shuffle of (token, doc_id, s) rows); tokens whose posting
    list exceeds ``group_cap`` are skipped — a top-k term of that many
    docs is not discriminative (shared rule with the mirror), and the
    cap bounds the worst group at O(cap^2) regardless of corpus size.
    Pair partials fold through one bucketed sum on (doc_a, doc_b);
    norms attach via two partitioned hash joins (never broadcast)."""
    from ..pipelines.analytics import bucketed_sum
    from .groups import bucketed_group_apply
    from .joins import hash_join

    top = tfidf_topk(docs, k=k, num_buckets=num_buckets)

    def milli(t: pa.Table) -> pa.Table:
        s = np.floor(t["score"].to_numpy(zero_copy_only=False)
                     * 1000 + 0.5).astype(np.int64)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "token": t["token"],
                         "s": pa.array(s, pa.int64())})

    v = top.map_batches(milli, batch_format="pyarrow")

    def norm_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"doc_id": df["doc_id"],
                          "n2": df["s"].to_numpy() ** 2})
        return g.groupby("doc_id", as_index=False)["n2"].sum() \
            .astype({"n2": "int64"})

    norms = bucketed_sum(
        v.map_batches(norm_partial, batch_format="pandas"),
        ["doc_id"], ["n2"], num_buckets=4)

    pair_schema = pa.schema([("doc_a", pa.int64()),
                             ("doc_b", pa.int64()),
                             ("prod", pa.int64()),
                             ("one", pa.int64())])

    def pair_fn(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("token", sort=False):
            c = len(g)
            if c < 2 or c > group_cap:
                continue
            g = g.sort_values("doc_id", kind="mergesort")
            ids = g["doc_id"].to_numpy()
            sv = g["s"].to_numpy()
            ia, ib = np.triu_indices(c, 1)
            outs.append(pd.DataFrame({
                "doc_a": ids[ia], "doc_b": ids[ib],
                "prod": sv[ia] * sv[ib],
                "one": np.ones(len(ia), dtype=np.int64)}))
        if not outs:
            return pair_schema.empty_table().to_pandas()
        return pd.concat(outs, ignore_index=True)

    pairs = bucketed_group_apply(v, ["token"], pair_fn,
                                 num_buckets=num_buckets,
                                 out_schema=pair_schema)
    dots = bucketed_sum(pairs, ["doc_a", "doc_b"], ["prod", "one"],
                        num_buckets=num_buckets)

    j = hash_join(
        dots,
        norms.map_batches(
            lambda t: t.rename_columns(["doc_a", "na2"]),
            batch_format="pyarrow"),
        on=["doc_a"], num_buckets=num_buckets)
    j = hash_join(
        j,
        norms.map_batches(
            lambda t: t.rename_columns(["doc_b", "nb2"]),
            batch_format="pyarrow"),
        on=["doc_b"], num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        dot = t["prod"].to_numpy(zero_copy_only=False)
        na2 = t["na2"].to_numpy(zero_copy_only=False)
        nb2 = t["nb2"].to_numpy(zero_copy_only=False)
        cos = np.floor(dot.astype(np.float64)
                       / np.sqrt(na2.astype(np.float64)
                                 * nb2.astype(np.float64))
                       * 1e6 + 0.5) / 1e6
        return pa.table({
            "doc_a": t["doc_a"], "doc_b": t["doc_b"],
            "shared": t["one"].cast(pa.int64()),
            "dot": pa.array(dot, pa.int64()),
            "na2": pa.array(na2, pa.int64()),
            "nb2": pa.array(nb2, pa.int64()),
            "cos6": pa.array(cos, pa.float64())})

    return j.map_batches(finish, batch_format="pyarrow")


def bm25_topk(docs: rd.Dataset, k: int = 5,
              num_buckets: int = 32) -> rd.Dataset:
    """(doc_id, token, tf, dl, score, rank) — top-k tokens per document
    by BM25 (Robertson/Okapi, k1 = 1.2, b = 0.75, Lucene-style
    idf = ln((N - df + 0.5)/(df + 0.5) + 1)).

    Determinism contract (mirrored verbatim in the SQL oracle): every
    input (tf, df, dl, N, total_tokens) is an exact integer; avgdl is
    the single float division total/N; the score is ONE float chain
    idf * ((tf*2.2) / (tf + 1.2*(0.25 + 0.75*(dl/avgdl)))) rounded
    half-up to 6 dp; rank ties break (score DESC, token ASC).

    Scale shape = tfidf_topk: tf/dl need no shuffle (one doc = one
    row), df is a partial-count fold, idf attaches via a partitioned
    hash join, top-k is a per-doc bucketed apply.  N and total_tokens
    are two scalar folds (tiny)."""
    from ..pipelines.analytics import partial_count
    from ..util import collect_rows
    from .groups import bucketed_group_apply
    from .joins import hash_join

    def tf_dl(t: pa.Table) -> pa.Table:
        tf = doc_term_counts(t)
        df = tf.to_pandas()
        df["dl"] = df.groupby("doc_id")["tf"].transform("sum") \
                     .astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("doc_id", tf.schema.field("doc_id").type),
                       ("token", pa.string()), ("tf", pa.int64()),
                       ("dl", pa.int64())]))

    tf = docs.map_batches(tf_dl, batch_format="pyarrow")
    df = partial_count(
        tf.select_columns(["token"]), ["token"], out_name="df")
    n_docs = docs.count()
    total_tokens = sum(r["tot"] for r in collect_rows(tf.map_batches(
        lambda t: pa.table({"tot": pa.array(
            [int(pc.sum(t["tf"]).as_py() or 0)], type=pa.int64())}),
        batch_format="pyarrow")))
    avgdl = float(total_tokens) / float(n_docs)

    j = hash_join(tf, df, on=["token"], num_buckets=num_buckets)

    def score(t: pa.Table) -> pa.Table:
        tf_v = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df_v = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl_v = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.log((float(n_docs) - df_v + 0.5) / (df_v + 0.5) + 1.0)
        den = tf_v + 1.2 * (0.25 + 0.75 * (dl_v / avgdl))
        s = np.floor(idf * ((tf_v * 2.2) / den) * 1e6 + 0.5) / 1e6
        return pa.table({
            "doc_id": t["doc_id"], "token": t["token"],
            "tf": t["tf"].cast(pa.int64()),
            "dl": t["dl"].cast(pa.int64()),
            "score": pa.array(s, type=pa.float64())})

    scored = j.map_batches(score, batch_format="pyarrow")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "score", "token"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
        g["rank"] = (g.groupby("doc_id", sort=False).cumcount() + 1) \
            .astype("int64")
        return g[g["rank"] <= k]

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("token", pa.string()),
        ("tf", pa.int64()), ("dl", pa.int64()),
        ("score", pa.float64()), ("rank", pa.int64())])
    return bucketed_group_apply(scored, ["doc_id"], topk,
                                num_buckets=num_buckets,
                                out_schema=out_schema)
