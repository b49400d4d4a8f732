"""Ingest repartitioner — conv-hash sharding for arbitrary input layouts.

The checkpointed pipeline's resume unit is the input shard, under the
assumption that conversations do not span shards (pipelines/checkpointed
docstring).  The fixture generator guarantees that; for an arbitrary
transcript dump this one-time ingest pass enforces it: every row is routed
to shard ``hash(conv_id) % num_shards`` (stable blake2b hash — layout is
reproducible), each shard is written as its own parquet directory with an
atomic rename.  At 100 TB this is one full shuffle that buys per-shard
resumability for every later run.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..util import stable_hash_strings


def repartition_by_conv(ds: rd.Dataset, out_dir: str,
                        num_shards: int) -> list[str]:
    """Write ``ds`` as num_shards conv-hash shard dirs; returns the file
    lists' parent dirs (shard-<k>/)."""
    def add_shard(df: pd.DataFrame) -> pd.DataFrame:
        h = stable_hash_strings(df["conv_id"].to_numpy())
        df = df.copy()
        df["__shard"] = (h % num_shards).astype("int32")
        return df

    tmp = tempfile.mkdtemp(prefix=".repart-", dir=os.path.dirname(out_dir)
                           or ".")
    try:
        withb = ds.map_batches(add_shard, batch_format="pandas")

        def write_shard(g: pd.DataFrame) -> pd.DataFrame:
            shard = int(g["__shard"].iloc[0])
            d = os.path.join(tmp, f"shard-{shard:04d}")
            os.makedirs(d, exist_ok=True)
            t = pa.Table.from_pandas(g.drop(columns=["__shard"]),
                                     preserve_index=False)
            import pyarrow.parquet as pq
            pq.write_table(t, os.path.join(d, f"part-{os.getpid()}.parquet"))
            return pd.DataFrame({"shard": [shard], "rows": [len(g)]})

        # groupby on the shard id colocates each shard's rows in one task
        stats = withb.groupby("__shard").map_groups(
            write_shard, batch_format="pandas").to_pandas()
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.replace(tmp, out_dir)
        _ = stats
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return sorted(os.path.join(out_dir, d) for d in os.listdir(out_dir)
                  if d.startswith("shard-"))
