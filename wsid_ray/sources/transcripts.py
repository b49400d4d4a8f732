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

    Block granularity: one block per ROW GROUP (files are written with
    64k-row groups), floored at one block per file.  Coarser (per-file)
    blocks measured better at low parallelism (task dispatch ≈8 ms/task),
    but at high parallelism they amplify stragglers — a stalled vCPU in
    the last wave costs a whole file's work.  Row-group-sized tasks cap
    the straggler cost at one group, which is the 100 TB layout rule
    (groups near the block target).  ``override_num_blocks`` asks for
    min(256, 4×CPUs) blocks, clamped to at least the file count; Ray
    will not split below row-group boundaries, so the effective
    granularity is min(requested, row-group count) without consulting
    group counts here (the 256 cap bounds driver-side task bookkeeping
    on huge path lists)."""
    import ray
    paths = files if files is not None else transcript_files(sf_dir_or_scale)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    blocks = max(len(paths), min(256, 4 * cpus))
    return read_parquet_clean(paths, columns=columns or ALL_COLUMNS,
                              override_num_blocks=blocks)
