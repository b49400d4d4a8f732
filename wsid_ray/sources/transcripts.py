"""Transcript Parquet source (SURVEY.md §2.1 S2).

Column pruning happens at the read (``columns=[...]``); predicate pushdown
via a pyarrow dataset expression when a filter is given.  At 100 TB the
same call simply takes a longer path list / a partitioned root directory —
nothing here materialises.
"""

from __future__ import annotations

import ray.data as rd

from ..fixtures import transcript_files
from .pqclean import read_parquet_clean

ALL_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(sf_dir_or_scale: str, columns: list[str] | None = None,
                     files: list[str] | None = None) -> rd.Dataset:
    """Read the (synthesised) transcripts table for a driver sf_dir or a
    scale name. ``files`` overrides the shard list (checkpoint resume uses
    this to skip completed input shards — SURVEY.md §2.4 J5).

    Block granularity: exactly ONE block per file
    (``override_num_blocks=len(paths)``).  Asking for more blocks than
    files makes Ray append a ``SplitBlocks`` suffix to the read op, and
    a split read can never fuse with the downstream maps — the whole
    decoded corpus then round-trips through the object store once per
    pass (~6 GB/pass at sf0.6, measured).  With per-file blocks the plan
    fuses to ``ReadParquet->tokenize->detect(->score)`` and decoded text
    never leaves the worker heap.  The same fusion contract requires the
    chained maps to leave ``batch_size`` unset (flagship.detect_mentions
    note).  Consequence for the 100 TB layout: FILE size is the task
    granularity — write shards near the per-task memory budget
    (~0.5–1 GB decoded), which the corpus generators here do; straggler
    cost is then one file, bounded by the same rule."""
    paths = files if files is not None else transcript_files(sf_dir_or_scale)
    return read_parquet_clean(paths, columns=columns or ALL_COLUMNS,
                              override_num_blocks=len(paths))
