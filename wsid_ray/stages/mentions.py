"""M3/A1 — mention detection, M4 — context-window extraction (SURVEY.md §2.2/§2.3).

Reference semantics [R]: wsid's caller locates occurrences of the target
surface form; the engine makes that an explicit stage over the gazetteer.
Detection is a stateful stage (the gazetteer lookup structure is built once
per actor in ``__init__``, not per batch) run as an actor pool via
``map_batches(MentionDetector, concurrency=...)``.

Window semantics [R, wsid/cooc.py; BASELINE.json:6 "sliding-window
co-occurrence counting"]: for each occurrence of a gazetteer term at token
position i in a turn, the context window is the W tokens each side within
the same turn (windows never cross turn boundaries — this is what makes
conv-level salting semantics-preserving, SURVEY.md §4.3). The target token
itself is excluded from its own window.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import GAZETTEER, WINDOW_SIZE
from ..util import list_row_indices


class MentionDetector:
    """Actor-pool callable: turns_norm batch -> mentions_raw batch.

    State (built once per actor): the gazetteer as an Arrow value set for
    the vectorised ``is_in`` membership probe.  With a multi-word gazetteer
    this would be an Aho-Corasick automaton over `text`; with the
    single-token surface forms of the KB, token equality over the already
    tokenised turns is exact and fully vectorised.
    """

    def __init__(self, window_size: int = WINDOW_SIZE,
                 gazetteer: tuple[str, ...] = GAZETTEER):
        self.window = window_size
        self.gaz_arr = pa.array(sorted(gazetteer), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = tokens.flatten()
        hit = pc.is_in(flat, value_set=self.gaz_arr).to_numpy(
            zero_copy_only=False).astype(bool)
        if not hit.any():
            return _empty_mentions()
        row_of = list_row_indices(tokens)
        offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        hit_idx = np.nonzero(hit)[0]          # flat element indices of hits
        rows = row_of[hit_idx]                # turn row per mention
        pos = (hit_idx - offsets[rows]).astype(np.int32)  # token pos in turn

        flat_py = flat.to_pylist()
        toks_start = offsets[rows]
        toks_end = offsets[rows + 1]
        W = self.window
        win_tokens: list[list[str]] = []
        for fi, s, e in zip(hit_idx, toks_start, toks_end):
            lo = max(s, fi - W)
            hi = min(e, fi + W + 1)
            win_tokens.append(flat_py[lo:fi] + flat_py[fi + 1:hi])

        take = pa.array(rows, type=pa.int64())
        out = pa.table({
            "conv_id": pc.take(batch["conv_id"], take),
            "turn_idx": pc.take(batch["turn_idx"], take),
            "role": pc.take(batch["role"], take),
            "tool": pc.take(batch["tool"], take),
            "ts": pc.take(batch["ts"], take),
            "term": pc.take(flat, pa.array(hit_idx, type=pa.int64())),
            "span_start": pa.array(pos, type=pa.int32()),
            "span_end": pa.array(pos + 1, type=pa.int32()),
            "win_tokens": pa.array(win_tokens, type=pa.list_(pa.string())),
        })
        return out


def _empty_mentions() -> pa.Table:
    return pa.table({
        "conv_id": pa.array([], type=pa.string()),
        "turn_idx": pa.array([], type=pa.int32()),
        "role": pa.array([], type=pa.string()),
        "tool": pa.array([], type=pa.string()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "term": pa.array([], type=pa.string()),
        "span_start": pa.array([], type=pa.int32()),
        "span_end": pa.array([], type=pa.int32()),
        "win_tokens": pa.array([], type=pa.list_(pa.string())),
    })
