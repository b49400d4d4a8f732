"""Resumable near-dup dedup chain — per-shard checkpoints (VERDICT r04
item 5): the composed LSH → Jaccard-verify → connected-components →
first-wins pipeline (stages/dedup.near_dup_drop_list) gets the same
resume surface as the flagship (state/checkpoint.py manifests).

Passes:

  Pass 1 "sketch"   (per doc-hash shard — the expensive text pass):
                    shard docs → MinHash band rows + exact shingle sets
                    → bands/part-<k> + shingles/part-<k> parquet.
  Pass 2 "pairs"    (global): persisted bands → bucketed LSH candidate
                    expansion → Jaccard verify against the persisted
                    shingle sets → pairs/part-0.
  Pass 3 "drops"    (global, pair-bounded): CC + smallest-id-wins →
                    drops/part-0.

Pass 1 is the resume unit: a killed run skips every shard whose manifest
row is done under the current lineage (input files + params + shard id).
Shards here are ``stable_hash(doc_id) % num_shards`` filters over the
documents read — at 100 TB the shard unit is the input FILE GROUP (as in
pipelines/checkpointed.py pass 3) so each shard prunes at the read
instead of filtering a scan; the hash form keeps the resume surface
testable on the single-file fixture and the outputs are shard-layout
independent either way (band/shingle rows are per-doc pure functions).

A resumed run's drop list is byte-identical to an uninterrupted one —
candidates/verify/CC read only the persisted per-doc rows, which do not
depend on which run produced them.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..state.checkpoint import CheckpointManager, lineage_hash
from ..stages.dedup import (_shingle_strings, candidates_from_bands,
                            drops_from_pairs, minhash_band_rows,
                            verify_candidate_pairs)
from ..stages.tokenize import tokenize_column


def _params_hash(threshold, shingle_k, num_perm, num_bands,
                 num_shards) -> str:
    return json.dumps(["neardup", threshold, shingle_k, num_perm,
                       num_bands, num_shards])


def _count_parquet(d: str) -> int:
    return sum(pq.read_metadata(os.path.join(root, f)).num_rows
               for root, _, fs in os.walk(d)
               for f in fs if f.endswith(".parquet"))


def _write_ds(ds: rd.Dataset, tmp_dir: str) -> int:
    ds.write_parquet(tmp_dir)
    return _count_parquet(tmp_dir)


def _shard_parts(ckpt: CheckpointManager, stage: str) -> list[str]:
    files = []
    for p in ckpt.completed_parts(stage):
        d = ckpt.part_dir(stage, p)
        files.extend(sorted(
            os.path.join(root, f) for root, _, fs in os.walk(d)
            for f in fs if f.endswith(".parquet")))
    return files


def run_neardup_checkpointed(sf_dir: str, out_dir: str,
                             threshold: float = 0.5, shingle_k: int = 3,
                             num_perm: int = 64, num_bands: int = 16,
                             num_shards: int = 4) -> CheckpointManager:
    """Run (or resume) the near-dup chain with per-shard checkpoints.
    Returns the manager; read the result with ``drops_dataset``."""
    from ..stages.textstats import read_documents

    ckpt = CheckpointManager(out_dir)
    doc_path = os.path.join(sf_dir, "documents.parquet")
    phash = _params_hash(threshold, shingle_k, num_perm, num_bands,
                         num_shards)
    global_lineage = lineage_hash([doc_path], phash)

    # ---- pass 1: per-shard sketch (bands + shingle sets) ----------------
    for k in range(num_shards):
        lin = lineage_hash([doc_path, f"shard={k}/{num_shards}"], phash)
        bands_done = ckpt.is_done("bands", k, lin)
        sh_done = ckpt.is_done("shingles", k, lin)
        if bands_done and sh_done:
            continue
        docs = read_documents(sf_dir, columns=["doc_id", "text"])

        def in_shard(t: pa.Table, k=k) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % num_shards) == k))

        shard = docs.map_batches(in_shard, batch_format="pyarrow")
        if not bands_done:
            bands = shard.map_batches(
                minhash_band_rows,
                fn_kwargs=dict(num_perm=num_perm, shingle_k=shingle_k,
                               num_bands=num_bands),
                batch_format="pyarrow", batch_size=1024)
            ckpt.write_partition("bands", k, lin,
                                 lambda tmp, b=bands: _write_ds(b, tmp))
        if not sh_done:
            def to_sets(t: pa.Table) -> pa.Table:
                toks = tokenize_column(t["text"]).to_pylist()
                return pa.table({
                    "doc_id": t["doc_id"],
                    "sh": pa.array(
                        [_shingle_strings(ts, shingle_k) for ts in toks],
                        type=pa.list_(pa.string()))})
            sets = shard.map_batches(to_sets, batch_format="pyarrow")
            ckpt.write_partition("shingles", k, lin,
                                 lambda tmp, s=sets: _write_ds(s, tmp))

    # ---- pass 2: candidates + verify (global, from persisted rows) ------
    if not ckpt.is_done("pairs", 0, global_lineage):
        bands = rd.read_parquet(_shard_parts(ckpt, "bands"))
        sets = rd.read_parquet(_shard_parts(ckpt, "shingles"))
        cands = candidates_from_bands(bands, num_buckets=32)
        pairs = verify_candidate_pairs(cands, sets, threshold)
        ckpt.write_partition("pairs", 0, global_lineage,
                             lambda tmp: _write_ds(pairs, tmp))

    # ---- pass 3: CC + first-wins drops (global, pair-bounded) -----------
    if not ckpt.is_done("drops", 0, global_lineage):
        pairs = rd.read_parquet(_shard_parts(ckpt, "pairs"))
        drops = drops_from_pairs(pairs)

        def write(tmp):
            n = _write_ds(drops, tmp)
            if n == 0:
                # typed empty partition so drops_dataset keeps its schema
                pq.write_table(pa.table({
                    "doc_id": pa.array([], pa.int64()),
                    "kept_by": pa.array([], pa.int64())}),
                    os.path.join(tmp, "empty.parquet"))
            return n
        ckpt.write_partition("drops", 0, global_lineage, write)
    return ckpt


def drops_dataset(out_dir: str) -> rd.Dataset:
    """The completed drop list (doc_id, kept_by)."""
    ckpt = CheckpointManager(out_dir)
    return rd.read_parquet(_shard_parts(ckpt, "drops"))
