"""A2/A3 — disambiguation + candidate entity-link scoring (SURVEY.md §2.3).

BASELINE.json:6: "mention detection + candidate entity-link scoring runs in
map_batches over zero-copy Arrow with actor pools holding the induced sense
inventories and co-occurrence matrices in-state."

The actor pool holds, in state (loaded once per actor from a ``ray.put``
object ref):
  * the induced sense inventory {term: {sense_id: {token: weight}}};
  * the (term, sense_id) -> kb entity link map, precomputed by scoring each
    sense vector against each KB candidate's profile token set (overlap
    weight sum; ties -> lexicographically smallest kb_id).

Scoring semantics [R, wsid disambiguation]: score(mention, sense) =
Σ_{tok ∈ window} weight_sense(tok); argmax, ties -> lowest sense_id;
mentions whose every sense scores <= MIN_LINK_SCORE get sense_id = -1
(unlinkable) and are dropped from triple assembly.

Scale note: the inventory is |gazetteer|·top_k-bounded — broadcast, not
shuffled.  With a web-scale gazetteer, shard inventories across the pool
by hash(term) and route batches by the same key (SURVEY.md §7 hard-part 6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..config import MIN_LINK_SCORE, kb_candidates


def build_link_map(inventory: dict[str, dict[int, dict[str, float]]]
                   ) -> dict[tuple[str, int], str]:
    """(term, sense_id) -> kb entity id via profile-overlap argmax."""
    link: dict[tuple[str, int], str] = {}
    for term, senses in inventory.items():
        cands = kb_candidates(term)
        for sense_id, vec in senses.items():
            best_kb, best_score = "", -1.0
            for kb_id in sorted(cands):
                s = sum(vec.get(tok, 0.0) for tok in cands[kb_id])
                if s > best_score:
                    best_kb, best_score = kb_id, s
            link[(term, sense_id)] = best_kb
    return link


def inventory_from_rows(rows) -> dict[str, dict[int, dict[str, float]]]:
    """Long-form (term, sense_id, token, weight) rows -> nested dict."""
    inv: dict[str, dict[int, dict[str, float]]] = {}
    for r in rows:
        inv.setdefault(r["term"], {}).setdefault(
            int(r["sense_id"]), {})[r["token"]] = float(r["weight"])
    return inv


class SenseDisambiguator:
    def __init__(self, inventory_ref):
        inv = ray.get(inventory_ref)
        self.inventory = inv
        self.link = build_link_map(inv)
        # pre-sorted (sense_id, vec) lists: no per-mention sort in the loop
        self.sorted_senses = {term: sorted(senses.items())
                              for term, senses in inv.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        terms = batch["term"].to_pylist()
        wins = batch["win_tokens"].to_pylist()
        sense_ids = np.full(n, -1, dtype=np.int32)
        scores = np.zeros(n, dtype=np.float64)
        kb_ids: list[str] = []
        entity_ids: list[str] = []
        for i, (term, win) in enumerate(zip(terms, wins)):
            senses = self.sorted_senses.get(term)
            best_sid, best_score = -1, MIN_LINK_SCORE
            if senses:
                for sid, vec in senses:
                    get = vec.get
                    s = 0.0
                    for tok in win:
                        s += get(tok, 0.0)
                    if s > best_score:
                        best_sid, best_score = sid, s
            sense_ids[i] = best_sid
            scores[i] = best_score if best_sid >= 0 else 0.0
            kb_ids.append(self.link.get((term, best_sid), ""))
            entity_ids.append(f"{term}#{best_sid}")
        out = batch.drop_columns(["win_tokens"])
        out = out.append_column("sense_id", pa.array(sense_ids, type=pa.int32()))
        out = out.append_column("score", pa.array(scores, type=pa.float64()))
        out = out.append_column("entity_id", pa.array(entity_ids, type=pa.string()))
        out = out.append_column("kb_id", pa.array(kb_ids, type=pa.string()))
        return out


def disambiguate(mentions_raw: rd.Dataset, inventory_ref,
                 concurrency=None) -> rd.Dataset:
    from ..runtime import pool_limits
    if concurrency is None:
        # the heavy mention-scale stage: give it up to half the CPUs
        concurrency = pool_limits(frac=0.5, hi=16)
    return mentions_raw.map_batches(
        SenseDisambiguator,
        fn_constructor_kwargs=dict(inventory_ref=inventory_ref),
        batch_format="pyarrow", batch_size=32768,
        concurrency=concurrency, num_cpus=1)
