"""Sequence packing — the training-data step that bins documents into
fixed-token-budget training examples (greedy next-fit in a deterministic
document order), as used by every LLM pretraining pipeline to avoid
padding waste.

Semantics (shared verbatim with the SQL mirror, a recursive CTE in
__ray_entry__._sql_pack_sequences): within each partition (here the
``lang`` column — at scale, any shard key), documents are visited in
doc_id order; a document joins the current pack while the running token
sum stays ≤ cap, else it OPENS a new pack (documents longer than cap get
a pack of their own).  pack_id is the 0-based pack index within the
partition.

Scale shape: the per-doc token counts are one vectorised map (no
shuffle); the packing fold itself is ONE bucketed shuffle on the
partition key, and the in-bucket walk is inherently sequential (greedy
next-fit is order-defined) but O(n) trivial integer ops over the
partition — the partition key bounds the sequential span, exactly like
production packers that pack per input shard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .groups import bucketed_group_apply
from .textstats import _word_rows


def _doc_tokens(t: pa.Table) -> pa.Table:
    """(doc_id, lang, nt) — whitespace token count per doc, lang carried
    as the packing partition key."""
    row_of, nonempty, _flat, n = _word_rows(t)
    nt = np.bincount(row_of[nonempty], minlength=n).astype(np.int64)
    return pa.table({
        "doc_id": t["doc_id"],
        "lang": t["lang"],
        "nt": pa.array(nt, type=pa.int64()),
    })


def pack_sequences(docs: rd.Dataset, cap: int = 256,
                   num_buckets: int = 8) -> rd.Dataset:
    """(doc_id, lang, nt, pack_id) — greedy next-fit packing per lang."""
    tc = docs.map_batches(_doc_tokens, batch_format="pyarrow")

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("lang", sort=False):
            g = g.sort_values("doc_id", kind="mergesort",
                              ignore_index=True)
            nt = g["nt"].to_numpy()
            pids = np.empty(len(nt), dtype=np.int64)
            acc, pid = 0, -1
            for i, n in enumerate(nt):
                if pid < 0 or acc + n > cap:
                    pid += 1
                    acc = int(n)
                else:
                    acc += int(n)
                pids[i] = pid
            g = g.assign(pack_id=pids)
            outs.append(g)
        if not outs:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "lang": pd.Series([], dtype="object"),
                "nt": pd.Series([], dtype="int64"),
                "pack_id": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    schema = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                        ("nt", pa.int64()), ("pack_id", pa.int64())])
    return bucketed_group_apply(tc, ["lang"], pack,
                                num_buckets=num_buckets,
                                out_schema=schema)
