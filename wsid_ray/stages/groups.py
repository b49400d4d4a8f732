"""Coarse hash-bucketed grouping — the scale-friendly groupby pattern.

``Dataset.groupby(key).map_groups(fn)`` pays a Python call per group; with
millions of tiny groups (one per turn, one per triple) that dominates wall
time.  The pattern here: hash the key columns into ``num_buckets`` coarse
buckets (deterministic ``pd.util.hash_pandas_object`` — fixed hash key, no
process salt), shuffle once on the bucket id, and run a *vectorised*
pandas function over each whole bucket.  All rows of a key land in one
bucket, so per-key semantics (dedup, per-turn pair expansion, per-conv
folds) hold; bucket count is chosen ~ O(cluster cores), so per-call
overhead is amortised over thousands of keys.

This is the same explicit hash-partitioning a 100 TB run needs anyway
(ray_guide.md L140-147): bucket count scales with the cluster, bucket
contents stream through pandas at C speed.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import ray.data as rd

BUCKET_COL = "__bucket"


def add_bucket(df: pd.DataFrame, key_cols: list[str],
               num_buckets: int) -> pd.DataFrame:
    h = pd.util.hash_pandas_object(df[key_cols], index=False)
    df = df.copy()
    df[BUCKET_COL] = (h % num_buckets).astype("int32")
    return df


def bucketed_group_apply(
    ds: rd.Dataset,
    key_cols: list[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 64,
) -> rd.Dataset:
    """One shuffle keyed on hash(key_cols) % num_buckets, then
    ``bucket_fn`` over each whole bucket (vectorise inside!)."""
    withb = ds.map_batches(lambda df: add_bucket(df, key_cols, num_buckets),
                           batch_format="pandas")

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(g.drop(columns=[BUCKET_COL]))

    return withb.groupby(BUCKET_COL).map_groups(run, batch_format="pandas")


def distinct(ds: rd.Dataset, key_cols: list[str],
             num_buckets: int = 64) -> rd.Dataset:
    """Exact distinct on key_cols (keep first row per key after a
    deterministic sort on the keys)."""
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(key_cols, kind="mergesort")
                 .drop_duplicates(subset=key_cols, keep="first"))
    return bucketed_group_apply(ds, key_cols, fn, num_buckets)
