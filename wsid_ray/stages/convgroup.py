"""O1/M7 + SHUFFLE 1 — per-conversation grouping with salting, stable
turn ordering, and the per-turn text-equality guard (SURVEY.md §2.6 O1,
§2.2 M7, §4.3 skew row; BASELINE.json:6 "grouped per conv_id via ray.data
groupby with explicit repartitioning and salting for skewed long
conversations (preserving per-turn text equality under stable turn_idx
ordering)").

Salting: ``salt = turn_idx // SALT_CAP`` appends a deterministic sub-key so
a pathologically long conversation splits into capped contiguous turn
ranges instead of one straggler group.  Because the ranges are contiguous
in turn_idx, any order-sensitive per-conversation fold (like the text
digest below) can be computed per salted sub-group and combined in salt
order — associativity restores whole-conversation semantics.

Text-equality guard: digest(conv) = md5(concat of md5(text) in turn_idx
order).  Computed on the raw input AND on any text-carrying stage output;
equality proves per-turn byte-identity under stable ordering
(BASELINE.json:15).  md5 (not blake2b) here because the DuckDB oracle must
reproduce it in SQL: md5(string_agg(md5(text), '' ORDER BY turn_idx)).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

SALT_CAP = 64  # max turns per salted sub-group


def with_salt(ds: rd.Dataset, cap: int = SALT_CAP) -> rd.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        salt = pc.cast(pc.divide(batch["turn_idx"], cap), pa.int32())
        return batch.append_column("salt", salt)
    return ds.map_batches(add, batch_format="pyarrow")


def sorted_conv_groups(ds: rd.Dataset, cap: int = SALT_CAP) -> rd.Dataset:
    """Group by (conv_id, salt), stable-sort each group by turn_idx.
    The shuffle unit is the salted sub-conversation."""
    def sort_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("turn_idx", kind="mergesort")
    return with_salt(ds, cap).groupby(["conv_id", "salt"]).map_groups(
        sort_group, batch_format="pandas")


def conv_digest(ds: rd.Dataset, cap: int = SALT_CAP,
                num_buckets: int = 32) -> rd.Dataset:
    """(conv_id, digest) — salted two-level md5 chain (see module doc).

    One bucketed shuffle keyed hash(conv_id) (stages/groups.py), then a
    vectorised per-bucket fold: md5 per turn, concat per (conv, salt) range
    in turn order, concat partials in salt order, md5 the result.  The
    two-level fold mirrors the salted design point: at 10^12-turn scale the
    (conv_id, salt) partials become their own shuffle so a mega-conversation
    never has to fit one task.
    """
    from .groups import bucketed_group_apply

    def hash_turns(t: pa.Table) -> pa.Table:
        """Per-turn md5 BEFORE the shuffle — the shuffle then moves
        32-byte digests instead of full text (partial-fold pattern)."""
        hs = [hashlib.md5(s.encode()).hexdigest()
              for s in t["text"].to_pylist()]
        return pa.table({
            "conv_id": t["conv_id"],
            "turn_idx": t["turn_idx"],
            "h": pa.array(hs, type=pa.string()),
        })

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        df = df.assign(salt=(df["turn_idx"] // cap).astype("int32"))
        part = (df.groupby(["conv_id", "salt"], sort=True)["h"]
                  .agg("".join).reset_index())
        fin = (part.sort_values(["conv_id", "salt"], kind="mergesort")
                   .groupby("conv_id", sort=True)["h"].agg("".join)
                   .reset_index())
        return pd.DataFrame({
            "conv_id": fin["conv_id"].astype("string[pyarrow]"),
            "digest": pd.Series(
                [hashlib.md5(s.encode()).hexdigest() for s in fin["h"]],
                dtype="string[pyarrow]", index=fin.index),
        })

    hashed = ds.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        hash_turns, batch_format="pyarrow")
    return bucketed_group_apply(hashed, ["conv_id"], fn,
                                num_buckets=num_buckets)
