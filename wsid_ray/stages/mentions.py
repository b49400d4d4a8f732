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
    """Callable: turns_norm batch -> mentions_raw batch.

    The lookup state (gazetteer as an Arrow value set for the vectorised
    ``is_in`` probe; per-term shifted equality masks for multi-word token
    sequences — the vectorised equivalent of an Aho-Corasick pass for a
    small pattern set) is
    tiny, so the stage runs as STATELESS TASKS with a per-process memo
    (``detect_batch`` below) rather than an actor pool: elastic tasks let
    the transcript-scale tokenize+detect stage use every CPU instead of
    being capped at the pool size — measurably better scaling at 32 CPUs.
    Actor pools are reserved for heavy state (sense inventories, A2/A3 —
    exactly as BASELINE.json:6 prescribes).
    """

    def __init__(self, window_size: int = WINDOW_SIZE,
                 gazetteer: tuple[str, ...] = GAZETTEER):
        self.window = window_size
        single = sorted(g for g in gazetteer if " " not in g)
        self.gaz_arr = pa.array(single, type=pa.string())
        # multi-word surface forms: token sequences matched positionally.
        # Rule shared with the sequential oracle and the SQL mirrors:
        # every gazetteer term matches independently at every position —
        # overlaps allowed, no longest-match preference.
        self.multi = sorted((tuple(g.split()), g)
                            for g in gazetteer if " " in g)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens = batch["tokens"]
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = tokens.flatten()
        n_flat = len(flat)
        hit = pc.is_in(flat, value_set=self.gaz_arr).to_numpy(
            zero_copy_only=False).astype(bool)
        if not hit.any() and not self.multi:
            return _empty_mentions(batch)
        row_of = list_row_indices(tokens)
        offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)

        hit_idx = np.nonzero(hit)[0]          # flat element indices of hits
        term_arr = pc.take(flat, pa.array(hit_idx, type=pa.int64()))
        terms_parts = [term_arr.combine_chunks() if isinstance(
            term_arr, pa.ChunkedArray) else term_arr]
        hit_parts = [hit_idx]
        m_parts = [np.ones(len(hit_idx), dtype=np.int64)]
        for seq, term_str in self.multi:
            m = len(seq)
            if n_flat < m:
                continue
            mask = pc.equal(flat, seq[0]).to_numpy(
                zero_copy_only=False).astype(bool)[:n_flat - m + 1]
            for j in range(1, m):
                nxt = pc.equal(flat, seq[j]).to_numpy(
                    zero_copy_only=False).astype(bool)
                mask &= nxt[j:j + n_flat - m + 1]
            p = np.nonzero(mask)[0]
            # the token sequence must not cross a turn boundary
            p = p[row_of[p] == row_of[p + m - 1]]
            if not len(p):
                continue
            hit_parts.append(p)
            m_parts.append(np.full(len(p), m, dtype=np.int64))
            terms_parts.append(pa.array([term_str] * len(p),
                                        type=pa.string()))
        hit_idx = np.concatenate(hit_parts)
        if not len(hit_idx):
            return _empty_mentions(batch)
        span_m = np.concatenate(m_parts)
        terms = pa.concat_arrays(terms_parts)
        rows = row_of[hit_idx]                # turn row per mention
        pos = (hit_idx - offsets[rows]).astype(np.int32)  # token pos in turn

        # windows, fully vectorised (no per-token Python objects): for each
        # mention the window is flat[lo:p] ++ flat[p+m:hi]; build the
        # ragged index ranges with the repeat+cumsum trick and gather with
        # one pc.take.
        W = self.window
        lo = np.maximum(offsets[rows], hit_idx - W)
        hi = np.minimum(offsets[rows + 1], hit_idx + span_m + W)
        starts = np.empty(2 * len(hit_idx), dtype=np.int64)
        lens = np.empty(2 * len(hit_idx), dtype=np.int64)
        starts[0::2] = lo
        lens[0::2] = hit_idx - lo
        starts[1::2] = hit_idx + span_m
        lens[1::2] = hi - hit_idx - span_m
        total = int(lens.sum())
        if total:
            cat = np.repeat(starts, lens)
            resets = np.repeat(np.cumsum(lens) - lens, lens)
            idx_all = cat + (np.arange(total) - resets)
            win_values = pc.take(flat, pa.array(idx_all, type=pa.int64()))
        else:
            win_values = pa.array([], type=pa.string())
        win_lens = lens[0::2] + lens[1::2]
        win_offsets = np.concatenate(([0], np.cumsum(win_lens)))
        win_tokens = pa.ListArray.from_arrays(
            pa.array(win_offsets, type=pa.int32()),
            win_values.combine_chunks() if isinstance(
                win_values, pa.ChunkedArray) else win_values)

        take = pa.array(rows, type=pa.int64())
        # carry only the provenance columns present in the batch — a
        # column-pruned fit pass (text-only read) yields just
        # (term, span, win_tokens)
        present = set(batch.schema.names)
        data = {c: pc.take(batch[c], take) for c in _CARRY_COLS
                if c in present}
        data.update({
            "term": terms,
            "span_start": pa.array(pos, type=pa.int32()),
            "span_end": pa.array(pos + span_m.astype(np.int32),
                                 type=pa.int32()),
            "win_tokens": win_tokens,
        })
        return pa.table(data)


_DETECTOR_MEMO: dict[tuple, MentionDetector] = {}


def detect_batch(batch: pa.Table, window_size: int = WINDOW_SIZE,
                 gazetteer: tuple[str, ...] = GAZETTEER) -> pa.Table:
    """Stateless-task wrapper with a per-worker-process detector memo."""
    key = (window_size, gazetteer)
    det = _DETECTOR_MEMO.get(key)
    if det is None:
        det = _DETECTOR_MEMO[key] = MentionDetector(window_size, gazetteer)
    return det(batch)


_CARRY_COLS = ("conv_id", "turn_idx", "role", "tool", "ts")

_CARRY_TYPES = {
    "conv_id": pa.string(), "turn_idx": pa.int32(), "role": pa.string(),
    "tool": pa.string(), "ts": pa.timestamp("us"),
}


def _empty_mentions(batch: pa.Table | None = None) -> pa.Table:
    present = (set(batch.schema.names) if batch is not None
               else set(_CARRY_COLS))
    data = {c: pa.array([], type=_CARRY_TYPES[c]) for c in _CARRY_COLS
            if c in present}
    data.update({
        "term": pa.array([], type=pa.string()),
        "span_start": pa.array([], type=pa.int32()),
        "span_end": pa.array([], type=pa.int32()),
        "win_tokens": pa.array([], type=pa.list_(pa.string())),
    })
    return pa.table(data)
