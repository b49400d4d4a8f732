"""RAG-style document chunking: fixed-size overlapping token windows
per document — the standard pre-embedding segmentation of a retrieval
/ training corpus.

Contract (shared with the SQL mirror): whitespace tokens (the tf-idf
token rule, not the normalised gazetteer tokenizer); chunk starts at
every multiple of ``stride`` below n_tokens; chunk = tokens[start :
start+window] (the tail chunk may be shorter); empty docs emit nothing.
chunk_fp = md5 of the space-joined chunk, chunk_idx = start // stride.

Stateless map — no shuffle at any corpus size; output fan-out is
~n_tokens/stride rows per doc.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from .textstats import _word_rows


def chunk_batch(t: pa.Table, window: int = 64,
                stride: int = 48) -> pa.Table:
    row_of, nonempty, flat, _ = _word_rows(t)
    n_docs = t.num_rows
    rows = row_of[nonempty]
    words = flat.filter(pa.array(nonempty)).to_pylist()
    n_tok = np.bincount(rows, minlength=n_docs).astype(np.int64)
    starts_of = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_tok, out=starts_of[1:])
    ids = t["doc_id"].to_pylist()
    out_id, out_idx, out_start, out_n, out_fp = [], [], [], [], []
    for d in range(n_docs):
        n = int(n_tok[d])
        base = int(starts_of[d])
        for start in range(0, n, stride):
            chunk = words[base + start: base + min(start + window, n)]
            out_id.append(ids[d])
            out_idx.append(start // stride)
            out_start.append(start)
            out_n.append(len(chunk))
            out_fp.append(hashlib.md5(
                " ".join(chunk).encode()).hexdigest())
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "chunk_idx": pa.array(out_idx, pa.int64()),
        "start": pa.array(out_start, pa.int64()),
        "n_chunk_tokens": pa.array(out_n, pa.int64()),
        "chunk_fp": pa.array(out_fp, pa.string())})


def doc_chunks(docs: rd.Dataset, window: int = 64,
               stride: int = 48) -> rd.Dataset:
    return docs.map_batches(
        lambda t: chunk_batch(t, window, stride),
        batch_format="pyarrow")
