"""Distributed BPE training (stages/bpe.py): merges match an
independent symbol-list reference implementation (Sennrich 2016
get_stats/merge semantics), training is block-split invariant, the
replace-to-fixpoint apply equals list-scan merging, and tie-breaks are
deterministic."""

from collections import Counter

import pandas as pd
import pyarrow as pa
import ray.data as rd

from wsid_ray.stages.bpe import (_EOW, _apply_merges, _pair_counts,
                                 _seq_strings, encode_words, train_bpe)
from wsid_ray.stages.tokenize import tokenize_column


def _ref_bpe(texts, rounds):
    """Independent reference: explicit symbol LISTS (no string-replace),
    single left-to-right merge scan — the classic implementation."""
    freq: Counter = Counter()
    for toklist in tokenize_column(pa.array(texts)).to_pylist():
        for w in toklist:
            if len(w) <= 24:
                freq[w] += 1
    vocab = {w: list(w) + [_EOW] for w in freq}
    out = []
    for rnd in range(1, rounds + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        (l, r), n = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rnd, l, r, l + r, n))
        for w, syms in vocab.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = new
    return out


_TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest widest",
]


def _docs(texts):
    return rd.from_items([{"doc_id": i, "text": t}
                          for i, t in enumerate(texts)])


def test_merges_match_reference(ray_session):
    got = train_bpe(_docs(_TEXTS), rounds=6).to_pylist()
    want = _ref_bpe(_TEXTS, 6)
    assert [(r["rnd"], r["lft"], r["rgt"], r["merged"], r["cnt"])
            for r in got] == want


def test_block_split_invariant(ray_session):
    texts = _TEXTS * 4
    a = train_bpe(_docs(texts), rounds=4)
    b = train_bpe(_docs(texts).repartition(5), rounds=4)
    assert a.equals(b)


def test_apply_fixpoint_equals_list_scan(ray_session):
    """Runs and interleavings where one replace pass is not enough:
    string-replace-to-fixpoint must equal the reference list scan."""
    for word, merge in [("aaaa", ("a", "a")), ("ababab", ("a", "b")),
                        ("aaab", ("a", "a")), ("baaa", ("a", "a"))]:
        seq = _apply_merges(_seq_strings(pd.Series([word])),
                            [merge]).iloc[0]
        syms, i = [], 0
        ref_syms = list(word) + [_EOW]
        while i < len(ref_syms):
            if (i + 1 < len(ref_syms) and ref_syms[i] == merge[0]
                    and ref_syms[i + 1] == merge[1]):
                syms.append(merge[0] + merge[1])
                i += 2
            else:
                syms.append(ref_syms[i])
                i += 1
        assert seq == "|" + "|".join(syms) + "|", word


def test_pair_counts_weighted_and_masked(ray_session):
    """Counts are freq-weighted and never cross word boundaries."""
    df = _pair_counts(_seq_strings(pd.Series(["ab", "ba"])),
                      pd.Series([3, 5]).to_numpy())
    got = {(r.lft, r.rgt): r.n for r in df.itertuples()}
    assert got == {("a", "b"): 3, ("b", _EOW): 3,
                   ("b", "a"): 5, ("a", _EOW): 5}


def test_subword_counts_match_reference(ray_session):
    """Corpus subword frequencies under the trained merges equal a
    token-by-token reference encode (word-type trick is invisible)."""
    from wsid_ray.stages.bpe import subword_counts
    merges = [(r[1], r[2]) for r in _ref_bpe(_TEXTS, 3)]
    got = {r["subword"]: r["n"]
           for r in subword_counts(_docs(_TEXTS), merges).take_all()}
    want: Counter = Counter()
    for toklist in tokenize_column(pa.array(_TEXTS)).to_pylist():
        for w in toklist:
            if len(w) > 24:
                continue
            for s in encode_words(pd.Series([w]), merges).iloc[0]:
                want[s] += 1
    assert got == dict(want)


def test_encode_words_roundtrip(ray_session):
    merges = [("e", "s"), ("es", "t"), ("est", _EOW)]
    out = encode_words(pd.Series(["newest", "widest", "low"]), merges)
    assert out.iloc[0] == ["n", "e", "w", "est</w>"]
    assert out.iloc[1] == ["w", "i", "d", "est</w>"]
    assert out.iloc[2] == ["l", "o", "w", _EOW]



def test_fertility_by_lang():
    """Trained-vocab fertility: parity + a reference recompute with the
    module's own encoder."""
    import duckdb

    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_bpe_fertility_by_lang
    from wsid_ray.stages.bpe import _MAX_WORD_LEN
    from wsid_ray.stages.textstats import read_documents

    sf = "/root/testdata/sf0.001"

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind="mergesort",
                              ignore_index=True)

    got = canon(q_bpe_fertility_by_lang(sf).to_pandas())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    exp = canon(con.sql(E.oracle_sql()["bpe_fertility_by_lang"]).df())
    con.close()
    pd.testing.assert_frame_equal(got, exp)

    mt = train_bpe(read_documents(sf), rounds=6)
    merges = list(zip(mt["lft"].to_pylist(), mt["rgt"].to_pylist()))
    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["lang", "text"])
    toks = tokenize_column(pa.array(docs["text"].tolist())).to_pylist()
    words: dict = {}
    for lang, ts in zip(docs["lang"], toks):
        for w in ts:
            if len(w) <= _MAX_WORD_LEN:
                words.setdefault(lang, []).append(w)
    for r in got.itertuples():
        ws = words[r.lang]
        uniq = pd.Series(sorted(set(ws)))
        nsub = dict(zip(uniq, encode_words(uniq, merges).str.len()))
        assert r.n_words == len(ws)
        assert r.n_subwords == sum(nsub[w] for w in ws)
        # every word emits at least one subword: fertility >= 1
        assert r.fertility_micro >= 1_000_000
