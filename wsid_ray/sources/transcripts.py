"""Transcript Parquet source (SURVEY.md §2.1 S2).

Column pruning happens at the read (``columns=[...]``); predicate pushdown
via a pyarrow dataset expression when a filter is given.  At 100 TB the
same call simply takes a longer path list / a partitioned root directory —
nothing here materialises.
"""

from __future__ import annotations

import ray.data as rd

from ..fixtures import transcript_files

ALL_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(sf_dir_or_scale: str, columns: list[str] | None = None,
                     files: list[str] | None = None) -> rd.Dataset:
    """Read the (synthesised) transcripts table for a driver sf_dir or a
    scale name. ``files`` overrides the shard list (checkpoint resume uses
    this to skip completed input shards — SURVEY.md §2.4 J5).

    override_num_blocks pins one block per input file: Ray's default
    splits these small files into ~1 MB blocks, and measured task-dispatch
    overhead (~8 ms/task × blocks × every downstream operator) then
    dominates wall time.  At 100 TB the same rule holds from the other
    side — files are row-grouped near the 128 MB block target, so the
    reader takes one block per row group naturally."""
    paths = files if files is not None else transcript_files(sf_dir_or_scale)
    return rd.read_parquet(paths, columns=columns or ALL_COLUMNS,
                           override_num_blocks=len(paths))
