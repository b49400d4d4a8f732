"""Equi-depth range-partitioned Parquet sink (S-family extension): the
output layout for "sorted at rest" tables — each partition directory
holds a disjoint value range of roughly equal row count, so a reader
can range-prune partitions and a failed run can skip finished ones.

Plan: pass 1 reuses the mergeable fixed-width histogram (same machinery
as order_price_histo / exact_partitioned_ranks) to derive equi-depth
split points with exact integer ranks — O(bins) driver state, never a
sort; pass 2 is a stateless map assigning each row its partition id via
one vectorised searchsorted, then a partitioned `write_parquet`.  No
global sort at any scale; within-partition order is not promised (add a
per-file sort downstream if required — files are range-disjoint, so a
k-way merge streams them sorted)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def equi_depth_splits(ds: rd.Dataset, col: str, num_partitions: int,
                      bin_width: int = 100_000) -> list[int]:
    """Upper-edge split points (len = num_partitions - 1) such that each
    range holds ~n/num_partitions rows, from the exact integer-rank
    histogram readout (rank ceil(q*n), deterministic)."""
    from ..pipelines.analytics import bucketed_sum
    from ..util import collect_rows

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"bin": df[col].to_numpy() // bin_width})
        out = g.groupby("bin", sort=False).size().rename("c") \
            .reset_index()
        return out.astype({"bin": "int64", "c": "int64"})

    rows = collect_rows(bucketed_sum(
        ds.map_batches(partial, batch_format="pandas"),
        ["bin"], ["c"], num_buckets=4))
    rows.sort(key=lambda r: r["bin"])
    n = sum(r["c"] for r in rows)
    splits: list[int] = []
    cum, want = 0, 1
    for r in rows:
        cum += r["c"]
        # exact integer rank ceil(k*n/P)
        while want < num_partitions and \
                cum * num_partitions >= want * n:
            splits.append((r["bin"] + 1) * bin_width)  # bin upper edge
            want += 1
    return splits


def write_range_partitioned(ds: rd.Dataset, col: str, out_dir: str,
                            num_partitions: int = 8,
                            bin_width: int = 100_000) -> list[int]:
    """Write ``ds`` under ``out_dir`` as ``part_id=<k>/`` directories
    with disjoint ``col`` ranges (equi-depth).  Returns the split
    points for the reader's range pruning."""
    splits = equi_depth_splits(ds, col, num_partitions, bin_width)
    sp = np.asarray(splits, dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        pid = np.searchsorted(sp, v, side="right").astype(np.int64)
        return t.append_column("part_id", pa.array(pid, type=pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["part_id"])
    return splits
