"""G4/§2.5 — per-term sense induction (SHUFFLE 3, key=term).

``cooc_edges.groupby("term").map_groups(induce_group)``: each group is one
term's pruned NPMI graph (vocab-bounded, small by construction — the
corpus-scale work already collapsed into counts), clustered with the
deterministic Chinese Whispers in wsid_ray.cw, emitted long-form as
(term, sense_id, token, weight) rows.

Partitioning assumption: all edges of a term land in one group — guaranteed
by the groupby shuffle.  Terms are the parallelism unit here; with a large
gazetteer this stage scales out per term, and a single pathological term
graph is still vocab²-bounded, not corpus-bounded.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..config import SENSE_TOP_K
from ..cw import cluster_graph, sense_vectors


def induce_group(g: pd.DataFrame, top_k: int = SENSE_TOP_K,
                 algo: str = "cw") -> pd.DataFrame:
    term = g["term"].iloc[0]
    edges = list(zip(g["w"], g["v"], g["npmi"].astype(float)))
    nodes = sorted(set(g["w"]) | set(g["v"]))
    if not nodes:
        return pd.DataFrame(columns=["term", "sense_id", "token", "weight"])
    cluster_of = cluster_graph(nodes, edges, seed_key=term, algo=algo)
    vecs = sense_vectors(cluster_of, edges, top_k=top_k)
    rows = []
    for sense_id in sorted(vecs):
        for token, weight in sorted(vecs[sense_id].items(),
                                    key=lambda kv: (-kv[1], kv[0])):
            rows.append((term, sense_id, token, weight))
    out = pd.DataFrame(rows, columns=["term", "sense_id", "token", "weight"])
    out["sense_id"] = out["sense_id"].astype("int32")
    out["weight"] = out["weight"].astype("float64")
    return out


def induce_senses(edges: rd.Dataset, algo: str = "cw") -> rd.Dataset:
    """cooc_edges -> sense_inventory (term, sense_id, token, weight).

    Bucketed shuffle keyed hash(term): all edges of a term land in one
    bucket; the per-bucket fn loops over its terms (cheap — each term
    graph is vocab-bounded)."""
    import pandas as pd

    from .groups import bucketed_group_apply

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [induce_group(g, algo=algo)
                for _, g in df.groupby("term", sort=True)]
        if not outs:
            return pd.DataFrame(columns=["term", "sense_id", "token",
                                         "weight"])
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(edges, ["term"], per_bucket, num_buckets=16)
