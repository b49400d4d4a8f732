"""End-to-end: engine vs sequential oracle (P/R gate, BASELINE.json:14),
planted-sense recovery, and the per-turn text-equality invariant
(BASELINE.json:15)."""

import pyarrow.parquet as pq
import pytest

from wsid_ray.fixtures import gt_mentions_path, transcript_files
from wsid_ray.oracle import precision_recall, run_oracle
from wsid_ray.pipelines.flagship import run_flagship
from wsid_ray.sources.transcripts import read_transcripts
from wsid_ray.stages.convgroup import conv_digest
from wsid_ray.stages.tokenize import tokenize_batch


@pytest.fixture(scope="module")
def tiny_results():
    oracle = run_oracle(transcript_files("tiny"))
    art = run_flagship("tiny")
    return oracle, art


def test_triples_match_oracle(tiny_results):
    oracle, art = tiny_results
    eng = {(r["subj"], r["pred"], r["obj"])
           for r in art.triples.take_all()}
    p, r = precision_recall(eng, oracle["triples"])
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert p == 1.0 and r == 1.0  # shared determinism rules -> exact


def test_mentions_match_oracle(tiny_results):
    oracle, art = tiny_results
    eng = {(m["conv_id"], m["turn_idx"], m["term"], m["span_start"],
            m["sense_id"], m["entity_id"])
           for m in art.linked_mentions.take_all()}
    ora = {(m["conv_id"], m["turn_idx"], m["term"], m["span_start"],
            m["sense_id"], m["entity_id"])
           for m in oracle["mentions"]}
    assert eng == ora


def test_linked_senses_track_planted_kb(tiny_results):
    """Each (term, sense_id) should map dominantly to one planted kb
    entity — the induced senses separate the planted topics."""
    _, art = tiny_results
    gt = {(r["conv_id"], r["turn_idx"], r["term"]): r["kb_id"]
          for r in pq.read_table(gt_mentions_path("tiny")).to_pylist()}
    good = bad = 0
    for m in art.linked_mentions.take_all():
        key = (m["conv_id"], m["turn_idx"], m["term"])
        if key not in gt or m["sense_id"] < 0:
            continue
        if m["kb_id"] == gt[key]:
            good += 1
        else:
            bad += 1
    # tiny (≈70 turns) gives rare surface forms only a handful of windows,
    # so a couple of degenerate senses are expected; sf0.001+ accuracy is
    # checked (≥0.95) by the bench parity harness on the larger corpus.
    assert good / max(1, good + bad) >= 0.8, (good, bad)


def test_fit_paths_agree():
    """Driver fit and distributed NPMI+induce produce the same inventory."""
    from wsid_ray.config import DEFAULT_CONFIG
    from wsid_ray.pipelines.flagship import (detect_mentions, fit_inventory,
                                             induce_inventory)
    from wsid_ray.stages.tokenize import tokenize_batch

    turns = read_transcripts("tiny").map_batches(tokenize_batch,
                                                 batch_format="pyarrow")
    mentions = detect_mentions(turns, DEFAULT_CONFIG).materialize()
    a = fit_inventory(mentions, DEFAULT_CONFIG)
    b = induce_inventory(mentions, DEFAULT_CONFIG)
    key = lambda r: (r["term"], r["sense_id"], r["token"])
    da = {key(r): round(r["weight"], 9) for r in a}
    db = {key(r): round(r["weight"], 9) for r in b}
    assert da == db


def _tiny_mentions():
    from wsid_ray.config import DEFAULT_CONFIG
    from wsid_ray.pipelines.flagship import detect_mentions
    turns = read_transcripts("tiny").map_batches(tokenize_batch,
                                                 batch_format="pyarrow")
    return detect_mentions(turns, DEFAULT_CONFIG).materialize()


def test_fit_gate_decides_before_driver_collect(monkeypatch):
    """VERDICT r04 item 1: above DRIVER_FIT_THRESHOLD the aggregated
    counts table must NEVER be pulled to the driver — the path decision
    comes from a distributed count().  A spy on collect_rows asserts no
    driver collect ever sees a pair-count row (v != '' without npmi):
    only the totals/unigrams slice, the pruned edges and the inventory
    may land driver-side on the distributed branch."""
    import wsid_ray.util as util
    from wsid_ray.config import PipelineConfig
    from wsid_ray.pipelines import flagship
    from wsid_ray.stages.cooc import aggregate_counts, cooc_edges

    cfg = PipelineConfig(expand_cooc=True)
    mentions = _tiny_mentions()
    n_counts = aggregate_counts(mentions).count()
    n_edges = cooc_edges(mentions, cfg.cooc_min_count, cfg.npmi_min).count()
    assert 0 < n_edges < n_counts  # pruning is real on tiny

    base_inv, base_maps = flagship.fit_model(mentions, cfg)

    offending: list[frozenset] = []
    real = util.collect_rows

    def spy(ds):
        rows = real(ds)
        for r in rows:
            if (set(r) == {"term", "w", "v", "n"}) and r["v"] != "":
                offending.append(frozenset(r))
                break
        return rows

    monkeypatch.setattr(util, "collect_rows", spy)
    # counts (n_counts rows) > threshold >= edges: distributed branch,
    # edge collect allowed
    monkeypatch.setattr(flagship, "DRIVER_FIT_THRESHOLD", n_edges)
    inv, maps = flagship.fit_model(mentions, cfg)
    assert not offending, "raw pair counts were collected to the driver"
    key = lambda r: (r["term"], r["sense_id"], r["token"])
    assert {key(r): round(r["weight"], 9) for r in inv} == \
           {key(r): round(r["weight"], 9) for r in base_inv}
    assert {t: {k: round(v, 9) for k, v in m.items()}
            for t, m in maps.items()} == \
           {t: {k: round(v, 9) for k, v in m.items()}
            for t, m in base_maps.items()}


def test_fit_gate_expand_cooc_guard(monkeypatch):
    """The expand_cooc edge-map collect carries the same guard: above the
    threshold the broadcast expansion state is refused loudly instead of
    OOMing the driver."""
    from wsid_ray.config import PipelineConfig
    from wsid_ray.pipelines import flagship

    mentions = _tiny_mentions()
    monkeypatch.setattr(flagship, "DRIVER_FIT_THRESHOLD", 0)
    with pytest.raises(ValueError, match="expand_cooc"):
        flagship.fit_model(mentions, PipelineConfig(expand_cooc=True))


def test_cooc_expansion_mode_matches_oracle():
    """A2 with co-occurrence matrices in actor state (expand_cooc):
    engine == oracle on mentions and triples."""
    from wsid_ray.config import PipelineConfig
    from wsid_ray.pipelines.flagship import run_flagship

    cfg = PipelineConfig(expand_cooc=True)
    oracle = run_oracle(transcript_files("tiny"), cfg)
    art = run_flagship("tiny", cfg)
    eng_m = {(m["conv_id"], m["turn_idx"], m["term"], m["sense_id"])
             for m in art.linked_mentions.take_all()}
    ora_m = {(m["conv_id"], m["turn_idx"], m["term"], m["sense_id"])
             for m in oracle["mentions"]}
    assert eng_m == ora_m
    eng_t = {(r["subj"], r["pred"], r["obj"])
             for r in art.triples.take_all()}
    p, r = precision_recall(eng_t, oracle["triples"])
    assert p == 1.0 and r == 1.0


def test_text_equality_invariant():
    """digest(input) == digest(after tokenize stage) per conversation."""
    raw = read_transcripts("tiny")
    cooked = read_transcripts("tiny").map_batches(tokenize_batch,
                                                  batch_format="pyarrow")
    d_raw = {r["conv_id"]: r["digest"] for r in conv_digest(raw).take_all()}
    d_cooked = {r["conv_id"]: r["digest"]
                for r in conv_digest(cooked).take_all()}
    assert d_raw == d_cooked
    assert len(d_raw) == 8  # tiny has 8 conversations


def test_mention_cache_plans_agree(tiny_results, monkeypatch):
    """object_store / recompute mention-stream plans give identical
    triples (the auto threshold just picks between them)."""
    oracle, _ = tiny_results
    monkeypatch.setenv("WSID_MENTIONS_CACHE", "recompute")
    art = run_flagship("tiny")
    eng = {(r["subj"], r["pred"], r["obj"]) for r in art.triples.take_all()}
    p, r = precision_recall(eng, oracle["triples"])
    assert p == 1.0 and r == 1.0
