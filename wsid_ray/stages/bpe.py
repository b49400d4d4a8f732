"""Distributed BPE tokenizer-vocabulary training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
missing "train the tokenizer" step of an LLM data pipeline.

Scale shape (the standard word-type trick): the corpus is touched ONCE
for the (word, freq) table — a bucketed-sum shuffle over token partials,
vocab-bounded, kept distributed and materialized across rounds — and
every merge round is one vectorised pass over word TYPES (not corpus
tokens) plus a tiny pair-count shuffle.  Only per-block top-1 partials
and the R-row merge table ever reach the driver.

Determinism / SQL-mirror contract (shared with __ray_entry__'s
``bpe_merges`` oracle):

  * words = the shared tokenizer's output capped at ``_MAX_WORD_LEN``
    chars (bounds the SQL replace unroll); symbols start as single
    characters plus a ``</w>`` end-of-word marker ('<','>','|' cannot
    appear in tokens: the tokenizer splits on ``[^a-z0-9_]+``)
  * a round counts every adjacent symbol pair once per occurrence,
    weighted by word freq; best = (cnt DESC, lft ASC, rgt ASC)
  * applying a merge = literal replace of ``|l|r|`` with ``|lr|`` on the
    delimiter-framed symbol string, repeated to fixpoint.  Python
    str.replace and DuckDB replace() share leftmost-nonoverlapping
    semantics (verified), each pass merges at least the leftmost
    remaining occurrence, and adjacent occurrences halve per pass, so
    ``_APPLY_PASSES`` = 12 covers the ≤25-symbol words; the engine
    raises if a fixpoint ever needed more (contract breach, not a
    silent oracle mismatch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .tokenize import tokenize_column

_EOW = "</w>"
_MAX_WORD_LEN = 24
_APPLY_PASSES = 12


def word_freq_table(docs: rd.Dataset) -> rd.Dataset:
    """documents (text) -> distributed (word, freq) type table."""
    from ..pipelines.analytics import bucketed_sum

    def partial(t: pa.Table) -> pa.Table:
        toks = tokenize_column(t["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(
            pc.less_equal(pc.utf8_length(flat), _MAX_WORD_LEN))
        vc = flat.value_counts()
        return pa.table({"word": vc.field("values"),
                         "freq": vc.field("counts").cast(pa.int64())})

    parts = docs.select_columns(["text"]).map_batches(
        partial, batch_format="pyarrow")
    return bucketed_sum(parts, ["word"], ["freq"], num_buckets=16)


def _seq_strings(words: pd.Series) -> pd.Series:
    # per word TYPE (vocab-bounded), not per corpus token
    return words.map(lambda w: "|" + "|".join(w) + "|" + _EOW + "|")


def _apply_merges(seqs: pd.Series, merges: list[tuple[str, str]]
                  ) -> pd.Series:
    for lft, rgt in merges:
        pat, rep = f"|{lft}|{rgt}|", f"|{lft}{rgt}|"
        for _ in range(_APPLY_PASSES):
            new = seqs.str.replace(pat, rep, regex=False)
            if new.equals(seqs):
                break
            seqs = new
        else:
            if not seqs.str.replace(pat, rep, regex=False).equals(seqs):
                raise ValueError(
                    "BPE apply did not reach fixpoint within the "
                    f"{_APPLY_PASSES}-pass SQL-unroll contract")
    return seqs


def _pair_counts(seqs: pd.Series, freqs: np.ndarray) -> pd.DataFrame:
    """Adjacent-pair counts weighted by word freq — vectorised over the
    flattened symbol stream with list-boundary masking."""
    syms = seqs.str.strip("|").str.split("|")
    lens = syms.str.len().to_numpy(dtype=np.int64)
    flat = np.asarray([s for row in syms for s in row], dtype=object)
    if len(flat) < 2:
        return pd.DataFrame({"lft": pd.Series([], dtype=object),
                             "rgt": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    valid = np.ones(len(flat) - 1, dtype=bool)
    starts = np.cumsum(lens)[:-1]  # first flat index of rows 1..k-1
    valid[starts - 1] = False      # mask cross-word pairs
    w = np.repeat(freqs, np.maximum(lens - 1, 0))
    df = pd.DataFrame({"lft": flat[:-1][valid], "rgt": flat[1:][valid],
                       "n": w})
    out = df.groupby(["lft", "rgt"], sort=False, as_index=False)["n"].sum()
    out["n"] = out["n"].astype("int64")
    return out


def train_bpe(docs: rd.Dataset, rounds: int = 6) -> pa.Table:
    """Train ``rounds`` BPE merges; returns the tiny merge table
    (rnd, lft, rgt, merged, cnt) — all that a downstream tokenizer
    needs.  One corpus pass + ``rounds`` word-type passes."""
    from ..pipelines.analytics import bucketed_sum
    from ..util import collect_rows

    wf = word_freq_table(docs).materialize()
    merges: list[tuple[str, str]] = []
    rows: list[tuple] = []
    for rnd in range(1, rounds + 1):
        cur = list(merges)

        def round_partial(t: pa.Table, merges=cur) -> pd.DataFrame:
            words = t["word"].to_pandas()
            freqs = t["freq"].to_numpy(zero_copy_only=False)
            return _pair_counts(_apply_merges(_seq_strings(words), merges),
                                freqs)

        summed = bucketed_sum(
            wf.map_batches(round_partial, batch_format="pyarrow"),
            ["lft", "rgt"], ["n"], num_buckets=8)

        def top1(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return df
            return df.sort_values(["n", "lft", "rgt"],
                                  ascending=[False, True, True]).head(1)

        cand = collect_rows(summed.map_batches(top1, batch_format="pandas"))
        if not cand:
            break
        best = min(cand, key=lambda r: (-r["n"], r["lft"], r["rgt"]))
        merges.append((best["lft"], best["rgt"]))
        rows.append((rnd, best["lft"], best["rgt"],
                     best["lft"] + best["rgt"], int(best["n"])))
    return pa.table({
        "rnd": pa.array([r[0] for r in rows], type=pa.int64()),
        "lft": pa.array([r[1] for r in rows], type=pa.string()),
        "rgt": pa.array([r[2] for r in rows], type=pa.string()),
        "merged": pa.array([r[3] for r in rows], type=pa.string()),
        "cnt": pa.array([r[4] for r in rows], type=pa.int64())})


def encode_words(words: pd.Series, merges: list[tuple[str, str]]
                 ) -> pd.Series:
    """Apply a trained merge list to words -> list-of-subword strings
    (the inference side of the tokenizer)."""
    seqs = _apply_merges(_seq_strings(words), merges)
    return seqs.str.strip("|").str.split("|")


def subword_counts(docs: rd.Dataset, merges: list[tuple[str, str]]
                   ) -> rd.Dataset:
    """Corpus subword frequencies under a trained merge list — the
    "tokenize the corpus with YOUR tokenizer" pass.  Encoding rides the
    word-type trick per batch (unique words encoded once, then exploded
    weighted by their in-batch counts), so the merge application cost is
    per type, not per token; the broadcast merge list is tiny."""
    from ..pipelines.analytics import bucketed_sum

    def partial(t: pa.Table) -> pd.DataFrame:
        toks = tokenize_column(t["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(
            pc.less_equal(pc.utf8_length(flat), _MAX_WORD_LEN))
        if not len(flat):
            return pd.DataFrame({"subword": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        vc = flat.value_counts()
        words = vc.field("values").to_pandas()
        wn = vc.field("counts").to_numpy(zero_copy_only=False)
        subs = encode_words(words, merges)
        lens = subs.str.len().to_numpy(dtype=np.int64)
        sym = np.asarray([s for row in subs for s in row], dtype=object)
        df = pd.DataFrame({"subword": sym, "n": np.repeat(wn, lens)})
        out = df.groupby("subword", sort=False, as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    parts = docs.select_columns(["text"]).map_batches(
        partial, batch_format="pyarrow")
    return bucketed_sum(parts, ["subword"], ["n"], num_buckets=16)
