"""M8 + D1 — triple assembly and exact dedup (SURVEY.md §2.2/§2.7).

Deterministic predicate rules (shared verbatim with the sequential oracle —
the P/R comparison depends on both sides agreeing):

  * for each ordered mention pair i<j (by span_start, then term) within one
    turn, distinct canon ids: (canon_i, "co_mentioned_with", canon_j)
  * for each mention in a turn with tool != "":
                     (canon_m, "uses_tool", tool)
  * for each mention:(canon_m, "addresses", role)

Only linked mentions (sense_id >= 0) produce triples.

Physical shape:
  * unary triples (uses_tool / addresses) are a pure vectorised
    ``map_batches`` — NO shuffle;
  * pair triples need whole-turn colocation → ONE bucketed shuffle keyed
    hash(conv_id, turn_idx) (stages/groups.py) and a vectorised pandas
    self-merge per bucket (SHUFFLE 5a);
  * dedup is a bucketed shuffle keyed hash(subj,pred,obj) keeping the
    first provenance by (conv_id, turn_idx) (SHUFFLE 5b).

The canon_map is broadcast (entity-count bounded; a web-scale entity space
would hash-join mentions⋈canon_map on entity_id instead — SURVEY.md §2.4
J3 / stages/joins.py).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import PRED_ADDRESSES, PRED_CO_MENTION, PRED_USES_TOOL
from .groups import bucketed_group_apply

TRIPLE_COLS = ["subj", "pred", "obj", "conv_id", "turn_idx", "ts"]
_MENTION_COLS = ["conv_id", "turn_idx", "role", "tool", "ts",
                 "term", "span_start", "entity_id", "sense_id"]


def _linked_canon(df: pd.DataFrame, canon: dict[str, str]) -> pd.DataFrame:
    df = df[df["sense_id"] >= 0]
    # Series.map(dict) runs in C; entities absent from the canon map keep
    # their own id via fillna (a per-row Python lambda here was the one
    # row-wise call on the hot triple path — VERDICT r04 item 7).
    ent = df["entity_id"].map(canon)
    if ent.isna().any():
        ent = ent.fillna(df["entity_id"])
    df = df.assign(ent=ent.astype(df["entity_id"].dtype))
    return df


def unary_triples_batch(df: pd.DataFrame, canon: dict[str, str]) -> pd.DataFrame:
    """uses_tool + addresses triples — stateless, vectorised, no shuffle."""
    df = _linked_canon(df, canon)
    addresses = pd.DataFrame({
        "subj": df["ent"], "pred": PRED_ADDRESSES, "obj": df["role"],
        "conv_id": df["conv_id"], "turn_idx": df["turn_idx"], "ts": df["ts"],
    })
    tooled = df[df["tool"] != ""]
    uses = pd.DataFrame({
        "subj": tooled["ent"], "pred": PRED_USES_TOOL, "obj": tooled["tool"],
        "conv_id": tooled["conv_id"], "turn_idx": tooled["turn_idx"],
        "ts": tooled["ts"],
    })
    out = pd.concat([addresses, uses], ignore_index=True)
    return _typed(out)


def pair_triples_bucket(df: pd.DataFrame, canon: dict[str, str]) -> pd.DataFrame:
    """co_mentioned_with via a per-bucket self-merge on (conv_id, turn_idx).

    Ordering i<j is (span_start, term) lexicographic — matches the oracle.
    """
    df = _linked_canon(df, canon)[["conv_id", "turn_idx", "ts",
                                   "span_start", "term", "ent"]]
    m = df.merge(df, on=["conv_id", "turn_idx"], suffixes=("_i", "_j"))
    lt = (m["span_start_i"] < m["span_start_j"]) | (
        (m["span_start_i"] == m["span_start_j"]) & (m["term_i"] < m["term_j"]))
    m = m[lt & (m["ent_i"] != m["ent_j"])]
    out = pd.DataFrame({
        "subj": m["ent_i"], "pred": PRED_CO_MENTION, "obj": m["ent_j"],
        "conv_id": m["conv_id"], "turn_idx": m["turn_idx"], "ts": m["ts_i"],
    })
    return _typed(out)


def _typed(df: pd.DataFrame) -> pd.DataFrame:
    # pin dtypes so empty buckets don't emit null-typed Arrow columns
    for c in ("subj", "pred", "obj", "conv_id"):
        df[c] = df[c].astype("string[pyarrow]")
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.Series(df["ts"], dtype="datetime64[us]")
    return df[TRIPLE_COLS]


def triples_from_mentions(mentions: rd.Dataset, canon: dict[str, str],
                          num_buckets: int = 32) -> rd.Dataset:
    """Linked mentions -> raw (pre-dedup) triples.

    Both branches emit blocks already conformed to the TRIPLES arrow
    schema (conform folded INTO the producing map — a separate conform
    stage would be skipped by Ray on empty input blocks and emit
    schema-less empties, flapping the stream schema)."""
    from .. import schemas
    cols = mentions.select_columns(_MENTION_COLS)

    def unary(df: pd.DataFrame) -> pa.Table:
        return schemas.conform(
            pa.Table.from_pandas(unary_triples_batch(df, canon),
                                 preserve_index=False), schemas.TRIPLES)

    pairs = bucketed_group_apply(
        cols, ["conv_id", "turn_idx"],
        lambda df: pair_triples_bucket(df, canon),
        num_buckets=num_buckets, out_schema=schemas.TRIPLES)
    return cols.map_batches(unary, batch_format="pandas").union(pairs)


SUBJ_BUCKETS = 16


def with_subj_bucket(ds: rd.Dataset,
                     num_buckets: int = SUBJ_BUCKETS) -> rd.Dataset:
    """Append subj_bucket = stable_hash64(subj) % B (S3 sink layout key)."""
    import numpy as np

    from ..util import stable_hash_strings

    def add(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("subj_bucket",
                                   pa.array([], type=pa.int32()))
        h = stable_hash_strings(t["subj"].to_pylist())
        return t.append_column(
            "subj_bucket",
            pa.array((h % num_buckets).astype(np.int32), type=pa.int32()))

    return ds.map_batches(add, batch_format="pyarrow")


def write_triples_partitioned(ds: rd.Dataset, out_dir: str,
                              num_buckets: int = SUBJ_BUCKETS) -> None:
    """S3: hive-partitioned triple sink — one ``subj_bucket=<b>/`` dir per
    subject hash bucket (SURVEY.md §2.1), so downstream KG reads prune to
    one bucket instead of scanning every file.  The bucket value lives in
    the directory name only; file contents keep the plain triple schema."""
    with_subj_bucket(ds, num_buckets).write_parquet(
        out_dir, partition_cols=["subj_bucket"])


def read_triples_for_subject(root: str, subj: str,
                             num_buckets: int = SUBJ_BUCKETS) -> rd.Dataset:
    """Pruned read: only the subject's hash-bucket directory is scanned."""
    import pyarrow.compute as pc

    from ..util import stable_hash64
    b = stable_hash64(subj) % num_buckets
    ds = rd.read_parquet(f"{root}/subj_bucket={b}")
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["subj"], subj)),
        batch_format="pyarrow")


def dedup_triples(triples: rd.Dataset, num_buckets: int = 32) -> rd.Dataset:
    """Exact dedup on (subj,pred,obj); first provenance by (conv, turn).

    Partial-before-shuffle: each batch drops its local duplicates first
    (keeping its first provenance), so the shuffle moves at most
    |distinct| rows per block instead of the raw triple stream — the
    combiner pattern applied to dedup."""
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["subj", "pred", "obj", "conv_id", "turn_idx"],
                          kind="mergesort")
        return g.drop_duplicates(subset=["subj", "pred", "obj"],
                                 keep="first")
    from .. import schemas
    partial = triples.map_batches(fn, batch_format="pandas",
                                  batch_size=None)
    return bucketed_group_apply(partial, ["subj", "pred", "obj"], fn,
                                num_buckets=num_buckets,
                                out_schema=schemas.TRIPLES)
