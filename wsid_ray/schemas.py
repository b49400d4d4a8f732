"""Declared Arrow schemas for every logical table (SURVEY.md §1.2).

Asserted at stage boundaries so schema drift fails fast instead of
producing silent hash mismatches in the driver's correctness gate.
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPTS = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

TURNS_NORM = pa.schema(list(TRANSCRIPTS) + [
    ("tokens", pa.list_(pa.string())),
    ("turn_uid", pa.int64()),
])

MENTIONS_RAW = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
    ("term", pa.string()),
    ("span_start", pa.int32()),   # token index of the mention in the turn
    ("span_end", pa.int32()),
    ("win_tokens", pa.list_(pa.string())),
])

WINDOWS = pa.schema([
    ("term", pa.string()),
    ("win_tokens", pa.list_(pa.string())),
])

COOC_EDGES = pa.schema([
    ("term", pa.string()),
    ("w", pa.string()),
    ("v", pa.string()),
    ("n", pa.int64()),
    ("pmi", pa.float64()),
    ("npmi", pa.float64()),
])

SENSE_INVENTORY = pa.schema([
    ("term", pa.string()),
    ("sense_id", pa.int32()),
    ("token", pa.string()),
    ("weight", pa.float64()),
])

MENTIONS = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
    ("term", pa.string()),
    ("span_start", pa.int32()),
    ("span_end", pa.int32()),
    ("sense_id", pa.int32()),
    ("score", pa.float64()),
    ("entity_id", pa.string()),
    ("kb_id", pa.string()),
])

CANON_MAP = pa.schema([
    ("entity_id", pa.string()),
    ("canon_id", pa.string()),
])

TRIPLES = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("ts", pa.timestamp("us")),
])


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Select schema columns in order and cast — pins Arrow types at sink
    boundaries (pandas-produced blocks may carry ArrowDtype / object
    columns that Ray's schema printer can't unify)."""
    return table.select(schema.names).cast(schema)


def assert_schema(table: pa.Table, expected: pa.Schema, stage: str) -> pa.Table:
    got = table.schema
    if [f.name for f in got] != [f.name for f in expected]:
        raise AssertionError(
            f"[{stage}] column mismatch: got {got.names}, want {expected.names}")
    for f in expected:
        g = got.field(f.name)
        if g.type != f.type:
            raise AssertionError(
                f"[{stage}] type mismatch on {f.name}: got {g.type}, want {f.type}")
    return table
