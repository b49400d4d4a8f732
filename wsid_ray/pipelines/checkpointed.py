"""Resumable flagship pipeline — per-partition checkpoints with lineage +
throughput metrics (BASELINE.json:6; SURVEY.md §4.3 checkpoint row).

Three passes (the price of the two pieces of global state — the sense
inventory and the canon map — each of which must see the whole corpus):

  Pass 1 "senses"  (global):  mentions → cooc → NPMI → Chinese Whispers
                              → sense_inventory parquet (1 partition).
  Pass 2 "canon"   (global):  mentions → disambiguate → distinct
                              (entity_id, kb_id) edges → union-find
                              → canon_map parquet (1 partition).
  Pass 3 "triples" (per input shard): mentions → disambiguate → assemble
                              → within-shard dedup → triples/part-<k>.

Pass 3 is the bulk of the work and is the resume unit: a killed run skips
every shard whose manifest row is done (anti-join J5 — the shard list is
pruned before ``read_parquet``).  Shard boundary assumption (documented
per SURVEY.md: "document the partitioning assumption"): conversations do
not span input files, which the fixture generator guarantees by writing
whole conversations per file; a general ingest would first repartition by
conv_id hash into shard directories.

Cross-shard duplicate triples are possible (the same (s,p,o) from two
conversations in different shards); ``triples_dataset`` applies the
global set-semantics dedup on read, which is one final shuffle over the
(small) triple set and is independent of shard layout — so a resumed run
yields a byte-identical triple set to an uninterrupted one.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..fixtures import transcript_files
from ..sources.transcripts import read_transcripts
from ..stages.cooc import cooc_edges
from ..stages.disambig import disambiguate, inventory_from_rows
from ..stages.induce import induce_senses
from ..stages.tokenize import tokenize_batch
from ..stages.triples import dedup_triples, triples_from_mentions
from ..stages.unionfind import canonicalize
from ..state.checkpoint import CheckpointManager, lineage_hash
from .flagship import detect_mentions, entity_kb_edges


def _mentions(files: list[str], cfg: PipelineConfig) -> rd.Dataset:
    turns = read_transcripts("", files=files).map_batches(
        tokenize_batch, batch_format="pyarrow")
    return detect_mentions(turns, cfg)


def _count_parquet(d: str) -> int:
    return sum(pq.read_metadata(os.path.join(root, f)).num_rows
               for root, _, fs in os.walk(d)
               for f in fs if f.endswith(".parquet"))


def _write_ds(ds: rd.Dataset, tmp_dir: str) -> int:
    ds.write_parquet(tmp_dir)
    return _count_parquet(tmp_dir)


def run_checkpointed(sf_dir_or_scale: str, out_dir: str,
                     cfg: PipelineConfig = DEFAULT_CONFIG,
                     shard_files: int = 1) -> CheckpointManager:
    """Run (or resume) the flagship pipeline with per-partition
    checkpoints.  ``shard_files`` = input files per pass-3 partition."""
    files = transcript_files(sf_dir_or_scale)
    ckpt = CheckpointManager(out_dir)
    chash = cfg.content_hash()
    global_lineage = lineage_hash(files, chash)

    def _capped(m: rd.Dataset) -> rd.Dataset:
        # O3 skew cap applies to the counting/induction stream, exactly as
        # in flagship.fit_model (ADVICE r01: these knobs were ignored here)
        if cfg.max_windows_per_term:
            from ..stages.sampling import cap_windows_per_term
            return cap_windows_per_term(m, cfg.max_windows_per_term)
        return m

    # ---- pass 1: sense inventory (global); with expand_cooc also the
    # pruned edge table (A2 cooc-matrix state), checkpointed alongside ----
    senses_dir = ckpt.part_dir("senses", 0)
    need_edges = cfg.expand_cooc
    edges_missing = need_edges and not ckpt.is_done("edges", 0,
                                                    global_lineage)
    if not ckpt.is_done("senses", 0, global_lineage) or edges_missing:
        mentions = _capped(_mentions(files, cfg))
        edges = cooc_edges(mentions, cfg.cooc_min_count, cfg.npmi_min)
        if need_edges:
            edges = edges.materialize()  # two consumers: sink + induce
            if edges_missing:
                ckpt.write_partition("edges", 0, global_lineage,
                                     lambda tmp: _write_ds(edges, tmp))
        if not ckpt.is_done("senses", 0, global_lineage):
            senses = induce_senses(edges, algo=cfg.induce_algo)

            def write(tmp):
                return _write_ds(senses, tmp)
            ckpt.write_partition("senses", 0, global_lineage, write)

    inv_rows = pq.read_table(senses_dir).to_pylist()
    inv_ref = ray.put(inventory_from_rows(inv_rows))
    edge_ref = None
    if need_edges:
        edge_maps: dict[str, dict[tuple[str, str], float]] = {}
        for r in pq.read_table(ckpt.part_dir("edges", 0)).to_pylist():
            edge_maps.setdefault(r["term"], {})[(r["w"], r["v"])] = r["npmi"]
        edge_ref = ray.put(edge_maps)

    def _disambiguate(m: rd.Dataset) -> rd.Dataset:
        return disambiguate(m, inv_ref, edge_maps_ref=edge_ref,
                            expand_gamma=cfg.expand_gamma,
                            state_rows=len(inv_rows))

    # ---- pass 2: canon map (global) -------------------------------------
    canon_dir = ckpt.part_dir("canon", 0)
    if not ckpt.is_done("canon", 0, global_lineage):
        linked = _disambiguate(_mentions(files, cfg))
        canon_ds = canonicalize(entity_kb_edges(linked))

        def write(tmp):
            return _write_ds(canon_ds, tmp)
        ckpt.write_partition("canon", 0, global_lineage, write)

    canon_tbl = pq.read_table(canon_dir)
    canon = dict(zip(canon_tbl["entity_id"].to_pylist(),
                     canon_tbl["canon_id"].to_pylist()))

    # ---- pass 3: triples per shard (the resume unit) --------------------
    shards = [files[i:i + shard_files]
              for i in range(0, len(files), shard_files)]
    for k, shard in enumerate(shards):
        lin = lineage_hash(shard, chash)
        if ckpt.is_done("triples", k, lin):
            continue
        # materialize: triples_from_mentions has two consumers (unary +
        # pair branches); without pinning, BOTH branches would re-run the
        # detector/disambiguator actor pools in one plan — double compute
        # and, on small CPU counts, enough idle actors to starve the
        # shuffle tasks (deadlock).  The linked-mention stream is
        # sub-linear in the shard (no text, no windows), so pinning is
        # cheap; the 100 TB variant writes it to the shard's checkpoint
        # dir instead.
        from ..util import compact_blocks
        linked = compact_blocks(_disambiguate(_mentions(shard, cfg)))
        tri = dedup_triples(triples_from_mentions(linked, canon),
                            num_buckets=16)

        def write(tmp, tri=tri):
            # S3 layout: subj-hash-partitioned dirs inside the shard
            # partition (subj_bucket=<b>/...), SURVEY.md §2.1
            from ..stages.triples import write_triples_partitioned
            write_triples_partitioned(tri, tmp)
            return _count_parquet(tmp)
        ckpt.write_partition("triples", k, lin, write)
    return ckpt


def triples_dataset(out_dir: str) -> rd.Dataset:
    """All completed triple partitions, with the global set-semantics
    dedup applied on read (see module docstring)."""
    ckpt = CheckpointManager(out_dir)
    files = []
    for p in ckpt.completed_parts("triples"):
        d = ckpt.part_dir("triples", p)
        files.extend(sorted(
            os.path.join(root, f) for root, _, fs in os.walk(d)
            for f in fs if f.endswith(".parquet")))
    ds = rd.read_parquet(files)
    return dedup_triples(ds)
