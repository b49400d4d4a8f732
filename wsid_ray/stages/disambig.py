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
    """Vectorised scoring: explode window tokens, pandas hash-merge against
    the long-form inventory, groupby-sum per (mention, sense), argmax with
    (score desc, sense_id asc).  Scores compare at 6 dp (shared rule with
    the oracle) so summation order is immaterial."""

    def __init__(self, inventory_ref, edge_maps_ref=None,
                 expand_gamma: float = 0.5):
        import pandas as pd
        inv = ray.get(inventory_ref)
        self.inventory = inv
        self.link = build_link_map(inv)
        # A2 state (BASELINE.json:6): the pruned per-term co-occurrence
        # matrices ride in actor state alongside the inventory when the
        # expansion refinement is on.
        self.edge_maps = (ray.get(edge_maps_ref)
                          if edge_maps_ref is not None else None)
        self.expand_gamma = expand_gamma
        rows = [(term, tok, sid, w)
                for term, senses in inv.items()
                for sid, vec in senses.items()
                for tok, w in vec.items()]
        self.inv_df = pd.DataFrame(
            rows, columns=["term", "token", "sense_id", "weight"]) \
            if rows else pd.DataFrame(
                columns=["term", "token", "sense_id", "weight"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from ..util import list_row_indices
        n = batch.num_rows
        wins = batch["win_tokens"]
        if isinstance(wins, pa.ChunkedArray):
            wins = wins.combine_chunks()
        flat = wins.flatten()
        midx = list_row_indices(wins)
        terms_np = np.asarray(batch["term"].to_pylist(), dtype=object)
        exploded = pd.DataFrame({
            "m": pd.Series(midx, dtype="int64"),
            "term": pd.Series(terms_np[midx], dtype=object),
            "token": pd.Series(flat.to_pylist(), dtype=object),
        })
        sense_ids = np.full(n, -1, dtype=np.int32)
        scores = np.zeros(n, dtype=np.float64)
        if self.edge_maps is not None:
            # expansion mode: every sense must be scored (a sense with no
            # base overlap can still win on second-order edges) → direct
            # per-mention loop, the literal oracle semantics.
            from ..oracle import expansion_score
            wins_py = wins.to_pylist()
            for i in range(n):
                term = terms_np[i]
                senses = self.inventory.get(term, {})
                emap = self.edge_maps.get(term, {})
                best_sid, best_score = -1, MIN_LINK_SCORE
                for sid in sorted(senses):
                    vec = senses[sid]
                    s = sum(vec.get(t, 0.0) for t in wins_py[i])
                    s += expansion_score(wins_py[i], vec, emap,
                                         self.expand_gamma)
                    s = round(s, 6)
                    if s > best_score:
                        best_sid, best_score = sid, s
                sense_ids[i] = best_sid
                scores[i] = best_score if best_sid >= 0 else 0.0
            return self._emit(batch, terms_np, sense_ids, scores)

        merged = (exploded.merge(self.inv_df, on=["term", "token"],
                                 how="inner")
                  if len(exploded) and len(self.inv_df) else exploded.iloc[:0])
        if len(merged):
            agg = merged.groupby(["m", "sense_id"], sort=False)["weight"] \
                        .sum().round(6).reset_index()
            agg = agg[agg["weight"] > MIN_LINK_SCORE]
            agg = agg.sort_values(["m", "weight", "sense_id"],
                                  ascending=[True, False, True],
                                  kind="mergesort")
            best = agg.drop_duplicates(subset=["m"], keep="first")
            sense_ids[best["m"].to_numpy()] = best["sense_id"].to_numpy()
            scores[best["m"].to_numpy()] = best["weight"].to_numpy()
        return self._emit(batch, terms_np, sense_ids, scores)

    def _emit(self, batch, terms_np, sense_ids, scores) -> pa.Table:
        terms = terms_np.tolist()
        kb_ids = [self.link.get((t, int(s)), "")
                  for t, s in zip(terms, sense_ids)]
        entity_ids = [f"{t}#{s}" for t, s in zip(terms, sense_ids)]
        out = batch.drop_columns(["win_tokens"])
        out = out.append_column("sense_id", pa.array(sense_ids, type=pa.int32()))
        out = out.append_column("score", pa.array(scores, type=pa.float64()))
        out = out.append_column("entity_id", pa.array(entity_ids, type=pa.string()))
        out = out.append_column("kb_id", pa.array(kb_ids, type=pa.string()))
        return out


def disambiguate(mentions_raw: rd.Dataset, inventory_ref,
                 edge_maps_ref=None, expand_gamma: float = 0.5,
                 concurrency=None) -> rd.Dataset:
    from ..runtime import pool_limits
    if concurrency is None:
        # the heavy mention-scale stage: give it up to half the CPUs
        concurrency = pool_limits(frac=0.5, hi=16)
    return mentions_raw.map_batches(
        SenseDisambiguator,
        fn_constructor_kwargs=dict(inventory_ref=inventory_ref,
                                   edge_maps_ref=edge_maps_ref,
                                   expand_gamma=expand_gamma),
        batch_format="pyarrow", batch_size=32768,
        concurrency=concurrency, num_cpus=1)
