"""Fuzzy string matching via deletion-neighborhood blocking (SURVEY.md
§2.7 extension — the spell-cluster / catalog-reconciliation operator).

Exact-recall blocking for edit distance <= 1 (the FastSS / SymSpell
family, Bocek et al. 2007): every string emits itself plus each
single-character-deletion variant as blocking keys.  Any pair at
Levenshtein distance <= 1 shares at least one key —
  * substitution at i: deleting position i from both sides yields the
    same string;
  * insertion/deletion: the shorter string IS a deletion variant of the
    longer — so blocking recall is 1.0 and only candidate pairs (never
    all-pairs) are verified.  Keys can collide for distance-2 pairs
    (e.g. "ab"/"ba" share variants "a" and "b"), so candidates get an
    exact distance-<=-1 verification pass.

Physical plan (100 TB shape): distinct values first (the vocabulary is
dedup-bounded, not corpus-bounded), vectorised variant generation (one
pandas str-slice kernel per deletion POSITION, never per row), ONE
bucketed shuffle on the blocking key, per-bucket pair expansion via a
self-merge, a distinct on the pair, then the exact verify over the
candidate list (same candidates-only loop contract as
dedup.jaccard_pairs — candidate count ~ O(vocab * collisions), a
vanishing fraction of the corpus).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from .groups import bucketed_group_apply, distinct


def _lev_le1(a: str, b: str) -> bool:
    """Exact check: Levenshtein(a, b) <= 1 (a != b assumed)."""
    la, lb = len(a), len(b)
    if la == lb:                      # substitution: hamming <= 1
        return sum(x != y for x, y in zip(a, b)) <= 1
    if abs(la - lb) != 1:
        return False
    if la > lb:                       # make a the shorter
        a, b, la, lb = b, a, lb, la
    i = 0                             # first mismatch, then skip one in b
    while i < la and a[i] == b[i]:
        i += 1
    return b[i + 1:] == a[i:]


def _deletion_keys(names: pd.Series) -> pd.DataFrame:
    """(key, name) rows: each name plus all its 1-deletion variants.
    Vectorised per deletion position (max-string-length iterations of
    whole-column str-slice kernels, no per-row Python)."""
    names = names.astype(str)
    frames = [pd.DataFrame({"key": names, "name": names})]
    maxlen = int(names.str.len().max() or 0)
    for d in range(maxlen):
        m = names.str.len() > d
        sub = names[m]
        frames.append(pd.DataFrame({
            "key": sub.str[:d] + sub.str[d + 1:], "name": sub}))
    return pd.concat(frames, ignore_index=True).drop_duplicates(
        ignore_index=True)


def fuzzy_pairs_lev1(values: rd.Dataset, col: str,
                     num_buckets: int = 16) -> rd.Dataset:
    """All unordered pairs of distinct ``col`` values at Levenshtein
    distance exactly 1 (distance 0 is identity — excluded by the
    distinct).  Returns (name_a, name_b) with name_a < name_b."""
    vocab = distinct(values, [col], num_buckets=num_buckets)

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        return _deletion_keys(df[col])

    keyed = vocab.map_batches(keys, batch_format="pandas")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        m = df.merge(df, on="key", suffixes=("_a", "_b"))
        m = m[m["name_a"] < m["name_b"]]
        return m[["name_a", "name_b"]].drop_duplicates(ignore_index=True)

    pair_schema = pa.schema([("name_a", pa.string()),
                             ("name_b", pa.string())])
    cands = bucketed_group_apply(keyed, ["key"], bucket_pairs,
                                 num_buckets=num_buckets,
                                 out_schema=pair_schema)
    # a pair can surface from several shared keys in different buckets
    cands = distinct(cands, ["name_a", "name_b"],
                     num_buckets=num_buckets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # candidates only — bounded by blocking, see module docstring
        keep = [_lev_le1(a, b)
                for a, b in zip(df["name_a"], df["name_b"])]
        return df[pd.Series(keep, index=df.index, dtype=bool)]

    return cands.map_batches(verify, batch_format="pandas") \
        .map_batches(lambda t: t.select(pair_schema.names)
                     .cast(pair_schema), batch_format="pyarrow")
