"""The flagship KG-construction pipeline (SURVEY.md §3.3).

read transcripts → tokenize (M1/M2) → mention detect (A1) + windows (M4)
→ cooc counts + NPMI (G1/G2/M5/M6, SHUFFLE 2) → per-term Chinese Whispers
(SHUFFLE 3) → sense inventory broadcast → disambiguate + entity-link
(A2/A3 actor pool) → distributed union-find canonicalisation (D3,
SHUFFLE 4×rounds) → triple assembly + dedup (M8/D1, SHUFFLE 5) →
partitioned Parquet sink.

Materialisation policy: only *small, reused* intermediates are pinned —
the mention stream (sub-linear in the input: ~0.6 rows/turn and only
window tokens, no text), aggregated counts, the sense inventory and the
canon map.  The transcript stream itself is never materialised; with
checkpointing on (pipelines/checkpointed.py) the mention stream goes to a
per-shard Parquet partition instead of the object store, which is the
100 TB path.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..sources.transcripts import read_transcripts
from ..stages.cooc import cooc_edges
from ..stages.disambig import SenseDisambiguator, disambiguate, inventory_from_rows
from ..stages.induce import induce_senses
from ..stages.mentions import MentionDetector
from ..stages.tokenize import tokenize_batch
from ..stages.triples import dedup_triples, triples_from_mentions
from ..stages.unionfind import canonicalize

from ..runtime import pool_limits


@dataclass
class FlagshipArtifacts:
    mentions_raw: rd.Dataset
    sense_inventory_rows: list[dict]
    linked_mentions: rd.Dataset
    canon_map: dict[str, str]
    triples: rd.Dataset


def detect_mentions(turns: rd.Dataset, cfg: PipelineConfig) -> rd.Dataset:
    return turns.map_batches(
        MentionDetector,
        fn_constructor_kwargs=dict(window_size=cfg.window_size,
                                   gazetteer=cfg.gazetteer),
        batch_format="pyarrow", batch_size=4096,
        concurrency=pool_limits(), num_cpus=1)


def induce_inventory(mentions: rd.Dataset, cfg: PipelineConfig) -> list[dict]:
    """mentions -> sense inventory rows (small, driver-collected for
    broadcast into the disambiguation actor pool)."""
    edges = cooc_edges(mentions, cfg.cooc_min_count, cfg.npmi_min)
    return induce_senses(edges).take_all()


def entity_kb_edges(linked: rd.Dataset) -> rd.Dataset:
    def distinct_pairs(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["sense_id"], 0),
                       pc.not_equal(t["kb_id"], ""))
        t = t.filter(keep)
        return t.select(["entity_id", "kb_id"]).group_by(
            ["entity_id", "kb_id"]).aggregate([])
    pairs = linked.map_batches(distinct_pairs, batch_format="pyarrow")
    # global distinct (partial per batch above, final below)
    from ..stages.groups import distinct
    return distinct(pairs, ["entity_id", "kb_id"], num_buckets=16)


def run_flagship(sf_dir_or_scale: str,
                 cfg: PipelineConfig = DEFAULT_CONFIG,
                 files: list[str] | None = None) -> FlagshipArtifacts:
    transcripts = read_transcripts(sf_dir_or_scale, files=files)
    turns = transcripts.map_batches(tokenize_batch, batch_format="pyarrow")
    mentions = detect_mentions(turns, cfg)
    # reused by (a) cooc counting and (b) disambiguation → pin once.
    mentions = mentions.materialize()

    inventory_rows = induce_inventory(mentions, cfg)
    inv_ref = ray.put(inventory_from_rows(inventory_rows))

    linked = disambiguate(mentions, inv_ref).materialize()

    canon_rows = canonicalize(entity_kb_edges(linked)).take_all()
    canon = {r["entity_id"]: r["canon_id"] for r in canon_rows}

    raw = triples_from_mentions(linked, canon)
    triples = dedup_triples(raw)
    return FlagshipArtifacts(
        mentions_raw=mentions,
        sense_inventory_rows=inventory_rows,
        linked_mentions=linked,
        canon_map=canon,
        triples=triples,
    )


def flagship_triples(sf_dir_or_scale: str,
                     cfg: PipelineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    return run_flagship(sf_dir_or_scale, cfg).triples
