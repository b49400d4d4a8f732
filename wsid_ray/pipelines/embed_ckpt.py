"""Resumable embedding pass — per-shard checkpoints for the
model-inference pipeline (VERDICT r04 "What's missing" #4: at 100 TB the
embedding pass is a multi-hour job like the flagship and the near-dup
chain, so it gets the same state/checkpoint.py resume surface).

Passes:

  Pass 1 "embeds"  (per doc-hash shard — the expensive actor-pool
                   model-inference pass): shard docs →
                   stages/embed.embed_documents → embeds/part-<k>
                   parquet (vec_id, embedding list<double>).
  Pass 2 "pairs"   (global, O(n·B) movement): persisted embeddings →
                   stages/knn.near_dup_pairs block-pair triangle cosine
                   join → pairs/part-0.

Pass 1 is the resume unit: a killed run skips every shard whose manifest
row is done under the current lineage (input file + params + shard id),
so only the un-persisted inference work reruns — exactly the property
that matters when __call__ wraps a real model.  Shards here are
``doc_id % num_shards`` filters over the documents read — at 100 TB the
shard unit is the input FILE GROUP (as in pipelines/checkpointed.py
pass 3) so each shard prunes at the read; the hash form keeps the resume
surface testable on the single-file fixture, and the persisted vectors
are shard-layout independent (embedding is a per-doc pure function).

A resumed run's pair list is byte-identical to an uninterrupted one —
pass 2 reads only the persisted per-doc vectors, which do not depend on
which run produced them.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..state.checkpoint import CheckpointManager, lineage_hash
from .neardup_ckpt import _shard_parts, _write_ds


def _params_hash(dim, threshold, num_blocks, num_shards, model) -> str:
    return json.dumps(["embed", dim, threshold, num_blocks, num_shards,
                       model if isinstance(model, str) else None])


def run_embed_checkpointed(sf_dir: str, out_dir: str, dim: int = 32,
                           threshold: float = 0.99, num_blocks: int = 8,
                           num_shards: int = 4,
                           model=None) -> CheckpointManager:
    """Run (or resume) the embed → exact cosine near-dup chain with
    per-shard checkpoints on the inference pass.  Returns the manager;
    read the result with ``pairs_dataset``."""
    from ..stages.embed import embed_documents
    from ..stages.knn import near_dup_pairs
    from ..stages.textstats import read_documents

    ckpt = CheckpointManager(out_dir)
    doc_path = os.path.join(sf_dir, "documents.parquet")
    phash = _params_hash(dim, threshold, num_blocks, num_shards, model)
    global_lineage = lineage_hash([doc_path], phash)

    # ---- pass 1: per-shard actor-pool inference -------------------------
    for k in range(num_shards):
        lin = lineage_hash([doc_path, f"shard={k}/{num_shards}"], phash)
        if ckpt.is_done("embeds", k, lin):
            continue
        docs = read_documents(sf_dir, columns=["doc_id", "text"])

        def in_shard(t: pa.Table, k=k) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % num_shards) == k))

        emb = embed_documents(
            docs.map_batches(in_shard, batch_format="pyarrow"),
            dim=dim, model=model)
        ckpt.write_partition("embeds", k, lin,
                             lambda tmp, e=emb: _write_ds(e, tmp))

    # ---- pass 2: block-pair cosine near-dup from the persisted rows -----
    if not ckpt.is_done("pairs", 0, global_lineage):
        emb = rd.read_parquet(_shard_parts(ckpt, "embeds"))
        pairs = near_dup_pairs(emb, threshold=threshold,
                               num_blocks=num_blocks)

        def write(tmp):
            n = _write_ds(pairs, tmp)
            if n == 0:
                # typed empty partition so pairs_dataset keeps its schema
                pq.write_table(pa.table({
                    "vec_a": pa.array([], pa.int64()),
                    "vec_b": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64())}),
                    os.path.join(tmp, "empty.parquet"))
            return n
        ckpt.write_partition("pairs", 0, global_lineage, write)
    return ckpt


def pairs_dataset(out_dir: str) -> rd.Dataset:
    """The completed near-dup pair list (vec_a, vec_b, score)."""
    ckpt = CheckpointManager(out_dir)
    return rd.read_parquet(_shard_parts(ckpt, "pairs"))


def embeds_dataset(out_dir: str) -> rd.Dataset:
    """The persisted embedding table (vec_id, embedding) — reusable by
    OTHER downstream consumers (knn, kmeans, SemDeDup) without paying
    the inference pass again."""
    ckpt = CheckpointManager(out_dir)
    return rd.read_parquet(_shard_parts(ckpt, "embeds"))
