"""Normalized exact dedup + prefix-filtering set-similarity join.

Two curation operators the round-3 fixture could not evidence (the
driver's ``documents`` table has no duplicate texts — every dedup query
over it returns structural zero rows).  Both therefore run over a
*planted-duplicate* derived corpus built deterministically FROM the
driver's own parquet — the construction is a pure SQL-expressible
transform shared verbatim with the oracle mirror, so the correctness
check is still anchored on the driver's data, never on private inputs:

  * every ``doc_id % 7 == 0`` doc gains an exact duplicate at
    ``doc_id + 1_000_000`` whose text differs only in case/whitespace
    (``' ' || upper(text) || '  '``) — found by NORMALIZED dedup;
  * every ``doc_id % 11 == 0`` doc gains a near-duplicate at
    ``doc_id + 2_000_000`` holding the first ``len*4//5`` characters —
    ~0.8 shingle-Jaccard, found by the set-similarity join but NOT by
    normalized dedup.

Operators:

``normalized_dedup`` — the Falcon/CCNet-style first dedup pass: texts
equal after (lower, collapse-whitespace, trim) are one group; groups
ship as 8-byte md5-derived hashes (first 8 md5 bytes little-endian ==
DuckDB ``md5_number_upper``, the repo-wide F3 contract), so the shuffle
moves O(docs) fixed-width rows, never text.  First-wins = min doc_id.

``setsim_pairs`` — EXACT Jaccard >= tau join over k-token shingle sets
via prefix filtering (Chaudhuri et al. 2006 SSJoin / Xiao et al. 2008
PPJoin blocking): order every doc's shingles by global (document
frequency, shingle) — rarest first — and index only the first
``sz - ceil(tau*sz) + 1`` of them; any pair with Jaccard >= tau
provably shares an indexed prefix shingle, so candidate generation
touches only short rare-shingle inverted lists, never all pairs.
tau is an integer rational (tau_num/tau_den) and the verify filter is
exact cross-multiplied integer math — no float anywhere.

100 TB shape: shingle df attachment and the verify joins are bucketed
hash joins; the prefix step groups per doc_id (bounded rows per doc);
candidate fan-out is bounded by the rare-prefix inverted lists.  No
global sort, no driver materialization of corpus-shaped data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

MICRO = 1_000_000

# planted-duplicate id offsets — shared literals with the SQL mirror
EXACT_DUP_OFFSET = 1_000_000
NEAR_DUP_OFFSET = 2_000_000
EXACT_DUP_MOD = 7
NEAR_DUP_MOD = 11


def planted_docs(sf_dir: str) -> rd.Dataset:
    """documents + deterministic planted duplicates (module docstring).

    Fixture-shaping stage: the per-row python slice on the near-dup
    subset (<10% of rows) exists only to build the test corpus — the
    operators under test never loop rows."""
    from .textstats import read_documents

    def plant(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        base = pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "text": t["text"]})
        outs = [base]
        em = ids % EXACT_DUP_MOD == 0
        if em.any():
            sub = t.filter(pa.array(em))
            up = pc.binary_join_element_wise(
                " ", pc.utf8_upper(sub["text"]), "  ", "")
            outs.append(pa.table({
                "doc_id": pc.add(sub["doc_id"].cast(pa.int64()),
                                 EXACT_DUP_OFFSET),
                "text": up}))
        nm = ids % NEAR_DUP_MOD == 0
        if nm.any():
            sub = t.filter(pa.array(nm))
            txts = sub["text"].to_pylist()
            cut = [s[: (len(s) * 4) // 5] for s in txts]
            outs.append(pa.table({
                "doc_id": pc.add(sub["doc_id"].cast(pa.int64()),
                                 NEAR_DUP_OFFSET),
                "text": pa.array(cut, type=pa.string())}))
        return pa.concat_tables(outs)

    return read_documents(sf_dir).map_batches(plant,
                                              batch_format="pyarrow")


def _norm_hash64(texts: list[str]) -> np.ndarray:
    """First 8 md5 bytes little-endian, viewed int64 (== DuckDB
    md5_number_upper under the same reinterpret — the F3 contract)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, s in enumerate(texts):
        out[i] = int.from_bytes(
            hashlib.md5(s.encode()).digest()[:8], "little")
    return out.view(np.int64)


def normalized_dedup(docs: rd.Dataset,
                     num_buckets: int = 16) -> rd.Dataset:
    """(doc_id, kept_by, n_group) for every doc whose NORMALIZED text
    (lower, \\s+ -> ' ', trim) collides with another's; kept_by = min
    doc_id of the group (first-wins), canonical rows included."""
    from .groups import bucketed_group_apply

    def to_hash(t: pa.Table) -> pa.Table:
        norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(
            pc.utf8_lower(t["text"]), pattern=r"\s+", replacement=" "))
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "h": pa.array(_norm_hash64(norm.to_pylist()),
                          type=pa.int64())})

    pairs = docs.map_batches(to_hash, batch_format="pyarrow")

    def groups(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("h", sort=True).agg(
            kept_by=("doc_id", "min"), n_group=("doc_id", "size"))
        g = g[g["n_group"] > 1].reset_index()
        out = df.merge(g, on="h", how="inner")
        out = out.sort_values(["doc_id"], kind="mergesort",
                              ignore_index=True)
        return pd.DataFrame({
            "doc_id": out["doc_id"].astype("int64"),
            "kept_by": out["kept_by"].astype("int64"),
            "n_group": out["n_group"].astype("int64")})

    schema = pa.schema([("doc_id", pa.int64()), ("kept_by", pa.int64()),
                        ("n_group", pa.int64())])
    return bucketed_group_apply(pairs, ["h"], groups,
                                num_buckets=num_buckets,
                                out_schema=schema)


def _shingle_rows(docs: rd.Dataset, k: int) -> rd.Dataset:
    """(doc_id, sh, sz) — per-doc DISTINCT k-token shingles + set size;
    shingle-less docs emit nothing (shared rule with the mirror)."""
    from .dedup import _shingle_strings
    from .tokenize import tokenize_column

    def explode(t: pa.Table) -> pa.Table:
        toks = tokenize_column(t["text"]).to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        d_col: list[int] = []
        s_col: list[str] = []
        z_col: list[int] = []
        for d, ts in zip(ids, toks):
            sh = _shingle_strings(ts, k)
            d_col.extend([int(d)] * len(sh))
            s_col.extend(sh)
            z_col.extend([len(sh)] * len(sh))
        return pa.table({
            "doc_id": pa.array(d_col, type=pa.int64()),
            "sh": pa.array(s_col, type=pa.string()),
            "sz": pa.array(z_col, type=pa.int64())})

    return docs.map_batches(explode, batch_format="pyarrow")


def setsim_pairs(docs: rd.Dataset, tau_num: int = 1, tau_den: int = 2,
                 k: int = 3, num_buckets: int = 16) -> rd.Dataset:
    """Exact shingle-set Jaccard >= tau_num/tau_den self-join via prefix
    filtering — (doc_a, doc_b, jacc_micro), doc_a < doc_b, jacc_micro =
    (|A∩B| * 1e6) // |A∪B| (exact integer floor division)."""
    from ..pipelines.analytics import bucketed_sum
    from .dedup import _shingle_strings  # noqa: F401 (contract anchor)
    from .groups import bucketed_group_apply, distinct
    from .joins import hash_join
    from .tokenize import tokenize_column

    rows = _shingle_rows(docs, k)

    def ones(t: pa.Table) -> pa.Table:
        return pa.table({"sh": t["sh"],
                         "df": pa.array(np.ones(t.num_rows,
                                                dtype=np.int64))})

    df_tab = bucketed_sum(rows.map_batches(ones, batch_format="pyarrow"),
                          ["sh"], ["df"], num_buckets=num_buckets)
    with_df = hash_join(rows, df_tab, on=["sh"],
                        num_buckets=num_buckets)

    def prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "df", "sh"], kind="mergesort")
        sz = g["sz"].to_numpy()
        # prefix length p = sz - ceil(tau*sz) + 1 (SSJoin prefix bound)
        p = sz - (tau_num * sz + tau_den - 1) // tau_den + 1
        pos = g.groupby("doc_id", sort=False).cumcount().to_numpy()
        out = g[pos < p]
        return pd.DataFrame({"sh": out["sh"],
                             "doc_id": out["doc_id"].astype("int64")})

    pref_schema = pa.schema([("sh", pa.string()),
                             ("doc_id", pa.int64())])
    pref = bucketed_group_apply(with_df, ["doc_id"], prefix,
                                num_buckets=num_buckets,
                                out_schema=pref_schema)

    def pairs_in_list(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="sh")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        out = m[["doc_id_x", "doc_id_y"]].drop_duplicates()
        return pd.DataFrame({
            "doc_a": out["doc_id_x"].astype("int64"),
            "doc_b": out["doc_id_y"].astype("int64")})

    cand_schema = pa.schema([("doc_a", pa.int64()),
                             ("doc_b", pa.int64())])
    cands = distinct(
        bucketed_group_apply(pref, ["sh"], pairs_in_list,
                             num_buckets=num_buckets,
                             out_schema=cand_schema),
        ["doc_a", "doc_b"], num_buckets=num_buckets)

    def to_sets(name: str):
        def fn(t: pa.Table) -> pa.Table:
            toks = tokenize_column(t["text"]).to_pylist()
            return pa.table({
                name: t["doc_id"].cast(pa.int64()),
                f"sh_{name}": pa.array(
                    [_shingle_strings(ts, k) for ts in toks],
                    type=pa.list_(pa.string()))})
        return fn

    joined = hash_join(
        hash_join(cands, docs.map_batches(to_sets("doc_a"),
                                          batch_format="pyarrow"),
                  on=["doc_a"], num_buckets=num_buckets),
        docs.map_batches(to_sets("doc_b"), batch_format="pyarrow"),
        on=["doc_b"], num_buckets=num_buckets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        a_col: list[int] = []
        b_col: list[int] = []
        j_col: list[int] = []
        for a, b, sa, sb in zip(df["doc_a"], df["doc_b"],
                                df["sh_doc_a"], df["sh_doc_b"]):
            A, B = set(sa), set(sb)
            if not A or not B:
                continue
            inter = len(A & B)
            union = len(A) + len(B) - inter
            # exact rational threshold: inter/union >= tau_num/tau_den
            if tau_den * inter >= tau_num * union and inter > 0:
                a_col.append(int(a))
                b_col.append(int(b))
                j_col.append(inter * MICRO // union)
        return pd.DataFrame({
            "doc_a": pd.Series(a_col, dtype="int64"),
            "doc_b": pd.Series(b_col, dtype="int64"),
            "jacc_micro": pd.Series(j_col, dtype="int64")})

    return joined.map_batches(verify, batch_format="pandas")
