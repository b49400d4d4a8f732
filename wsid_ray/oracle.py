"""Sequential single-process oracle — wsid's semantics restated
(SURVEY.md §5.2 item 2).

This is what the reference library *is* (SURVEY.md §0 [R]): plain Python
over in-memory lists — regex tokenizer, Counter-based sliding-window
co-occurrence counts, PMI/NPMI weighting, Chinese-Whispers sense
clustering, sense-vector disambiguation — extended with the graft's
entity-link / union-find / triple-assembly rules.  No Ray, no Arrow
batches, no parallelism: loops and dicts, processed one document at a
time.  The engine's distributed output is compared set-wise against this
to produce the P/R >= 0.95 gate (BASELINE.json:2,14).

Shares with the engine ONLY: config constants (by design — one source of
truth) and the pure chinese_whispers/sense_vectors functions (determinism
contract, see wsid_ray/cw.py docstring).  All counting, windowing,
scoring, canonicalisation and assembly logic here is written
independently, sequentially.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from itertools import combinations

import pyarrow.parquet as pq

from .config import (DEFAULT_CONFIG, MIN_LINK_SCORE, PRED_ADDRESSES,
                     PRED_CO_MENTION, PRED_USES_TOOL, PipelineConfig,
                     TOKEN_PATTERN, kb_candidates)
from .cw import cluster_graph, sense_vectors

_WORD = re.compile(TOKEN_PATTERN)


def tokenize(text: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> list[str]:
    stop = set(cfg.stopwords)
    return [t for t in _WORD.findall(text.lower())
            if len(t) >= cfg.min_token_len and t not in stop]


def load_turns(transcript_files: list[str]) -> list[dict]:
    rows: list[dict] = []
    for f in transcript_files:
        rows.extend(pq.read_table(f).to_pylist())
    rows.sort(key=lambda r: (r["conv_id"], r["turn_idx"]))
    return rows


def extract_mentions(turns: list[dict],
                     cfg: PipelineConfig = DEFAULT_CONFIG) -> list[dict]:
    """Every gazetteer term matches independently at every position —
    overlaps allowed, no longest-match preference (rule shared with the
    engine detector and the SQL mirrors).  Multi-word surface forms match
    as token sequences; the window excludes the whole span."""
    gaz = set(g for g in cfg.gazetteer if " " not in g)
    multi = sorted((g.split(), g) for g in cfg.gazetteer if " " in g)
    W = cfg.window_size
    mentions = []
    for row in turns:
        toks = tokenize(row["text"], cfg)

        def emit(i: int, m: int, term: str) -> None:
            win = toks[max(0, i - W):i] + toks[i + m:i + m + W]
            mentions.append({
                "conv_id": row["conv_id"], "turn_idx": row["turn_idx"],
                "role": row["role"], "tool": row["tool"], "ts": row["ts"],
                "term": term, "span_start": i, "span_end": i + m,
                "win_tokens": win,
            })

        for i, tok in enumerate(toks):
            if tok in gaz:
                emit(i, 1, tok)
        for seq, term in multi:
            m = len(seq)
            for i in range(len(toks) - m + 1):
                if toks[i:i + m] == seq:
                    emit(i, m, term)
    return mentions


def cooc_stats(mentions: list[dict]):
    """Per-term window totals, window-unigram and window-pair counts."""
    totals: Counter = Counter()
    unis: Counter = Counter()
    pairs: Counter = Counter()
    for m in mentions:
        term = m["term"]
        toks = sorted(set(m["win_tokens"]))
        totals[term] += 1
        for w in toks:
            unis[(term, w)] += 1
        for w, v in combinations(toks, 2):
            pairs[(term, w, v)] += 1
    return totals, unis, pairs


def npmi_edges(totals, unis, pairs, cfg: PipelineConfig = DEFAULT_CONFIG):
    edges: dict[str, list[tuple[str, str, float]]] = defaultdict(list)
    for (term, w, v), n_wv in pairs.items():
        if n_wv < cfg.cooc_min_count:
            continue
        N = totals[term]
        pmi = math.log(n_wv * N / (unis[(term, w)] * unis[(term, v)]))
        denom = -math.log(n_wv / N)
        npmi = pmi / denom if denom > 0 else 1.0
        if npmi > cfg.npmi_min:
            edges[term].append((w, v, npmi))
    return edges


def induce(edges_by_term, cfg: PipelineConfig = DEFAULT_CONFIG):
    """-> {term: {sense_id: {token: weight}}}"""
    inventory: dict[str, dict[int, dict[str, float]]] = {}
    for term in sorted(edges_by_term):
        edges = edges_by_term[term]
        nodes = sorted({w for w, _, _ in edges} | {v for _, v, _ in edges})
        if not nodes:
            continue
        cluster_of = cluster_graph(nodes, edges, seed_key=term,
                                   algo=cfg.induce_algo,
                                   iterations=cfg.cw_iterations)
        inventory[term] = sense_vectors(cluster_of, edges,
                                        top_k=cfg.sense_top_k)
    return inventory


def expansion_score(win: list[str], vec: dict[str, float],
                    edges: dict[tuple[str, str], float],
                    gamma: float) -> float:
    """Second-order contribution: for window tokens absent from the sense
    vector, gamma x the strongest NPMI edge linking them to a sense token.
    Shared verbatim between oracle and engine (A2 cooc-matrix state)."""
    s = 0.0
    for t in win:
        if t in vec:
            continue
        best = 0.0
        for v in vec:
            w = edges.get((t, v) if t < v else (v, t))
            if w is not None and w > best:
                best = w
        s += gamma * best
    return s


def disambiguate(mentions: list[dict], inventory,
                 cfg: PipelineConfig = DEFAULT_CONFIG,
                 edge_maps: dict[str, dict[tuple[str, str], float]] | None
                 = None) -> list[dict]:
    expand = cfg.expand_cooc and edge_maps is not None
    out = []
    for m in mentions:
        senses = inventory.get(m["term"], {})
        emap = edge_maps.get(m["term"], {}) if expand else None
        best_sid, best_score = -1, MIN_LINK_SCORE
        for sid in sorted(senses):
            vec = senses[sid]
            # scores are compared at 6 dp so the result is independent of
            # float summation order (the engine sums via a vectorised
            # merge whose accumulation order differs)
            s = sum(vec.get(tok, 0.0) for tok in m["win_tokens"])
            if emap is not None:
                s += expansion_score(m["win_tokens"], vec, emap,
                                     cfg.expand_gamma)
            s = round(s, 6)
            if s > best_score:
                best_sid, best_score = sid, s
        m = dict(m)
        m["sense_id"] = best_sid
        m["score"] = best_score if best_sid >= 0 else 0.0
        m["entity_id"] = f"{m['term']}#{best_sid}"
        if best_sid >= 0:
            cands = kb_candidates(m["term"])
            vec = senses[best_sid]
            best_kb, best = "", -1.0
            for kb_id in sorted(cands):
                s = sum(vec.get(t, 0.0) for t in cands[kb_id])
                if s > best:
                    best_kb, best = kb_id, s
            m["kb_id"] = best_kb
        else:
            m["kb_id"] = ""
        out.append(m)
    return out


def canonicalize(mentions: list[dict]) -> dict[str, str]:
    """Sequential union-find over (entity_id, kb_id) edges; canonical id =
    lexicographically smallest entity in the component."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for m in mentions:
        if m["sense_id"] >= 0 and m["kb_id"]:
            union(m["entity_id"], m["kb_id"])
    comps: dict[str, list[str]] = defaultdict(list)
    for node in list(parent):
        comps[find(node)].append(node)
    canon: dict[str, str] = {}
    for members in comps.values():
        entities = sorted(x for x in members if not x.startswith("kb:"))
        if not entities:
            continue
        for e in entities:
            canon[e] = entities[0]
    return canon


def assemble_triples(mentions: list[dict], canon: dict[str, str]) -> set[tuple]:
    by_turn: dict[tuple, list[dict]] = defaultdict(list)
    for m in mentions:
        if m["sense_id"] >= 0:
            by_turn[(m["conv_id"], m["turn_idx"])].append(m)
    triples: set[tuple] = set()
    for (conv, turn), ms in by_turn.items():
        ms = sorted(ms, key=lambda m: (m["span_start"], m["term"]))
        ents = [canon.get(m["entity_id"], m["entity_id"]) for m in ms]
        role, tool = ms[0]["role"], ms[0]["tool"]
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                if ents[i] != ents[j]:
                    triples.add((ents[i], PRED_CO_MENTION, ents[j]))
        for e in ents:
            if tool:
                triples.add((e, PRED_USES_TOOL, tool))
            triples.add((e, PRED_ADDRESSES, role))
    return triples


def run_oracle(transcript_files: list[str],
               cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    turns = load_turns(transcript_files)
    mentions = extract_mentions(turns, cfg)
    totals, unis, pairs = cooc_stats(mentions)
    edges = npmi_edges(totals, unis, pairs, cfg)
    inventory = induce(edges, cfg)
    edge_maps = ({t: {(w, v): n for w, v, n in es}
                  for t, es in edges.items()}
                 if cfg.expand_cooc else None)
    linked = disambiguate(mentions, inventory, cfg, edge_maps=edge_maps)
    canon = canonicalize(linked)
    triples = assemble_triples(linked, canon)
    return {
        "turns": turns, "mentions": linked, "inventory": inventory,
        "canon": canon, "triples": triples,
        "cooc": (totals, unis, pairs), "edges": edges,
    }


def precision_recall(engine: set[tuple], oracle: set[tuple]) -> tuple[float, float]:
    if not engine or not oracle:
        return (0.0, 0.0) if (engine or oracle) else (1.0, 1.0)
    tp = len(engine & oracle)
    return tp / len(engine), tp / len(oracle)
