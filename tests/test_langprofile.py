"""Corpus-trained trigram langid model (VERDICT r04 item 2): the model
path must be LIVE (disagrees with the marker heuristic on a planted hard
case and wins), deterministic w.r.t. block split, and exactly mirrored
by brute-force scoring from the artifact bytes."""

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from wsid_ray.langprofile import (TrigramLangId, _row_trigrams,
                                  train_langid_profile)

_DE = [
    "der zug faehrt schnell durch den schwarzwald und die nacht",
    "schnell schnell der zug ist nicht langsam durch schwarzwald",
    "durch die nacht faehrt der schnelle zug nach schwarzwald",
]
_EN = [
    "the cat sat on the mat with the hat and the bat",
    "the dog ran over the log in the fog with the frog",
    "a cat and a dog sat with the frog on the log",
]
# contains the en marker word "the" but overwhelmingly German trigrams:
# the heuristic must say en, the trained model must say de
_HARD = "schwarzwald zug faehrt schnell durch the nacht"


def _planted_profile(tmp_path) -> str:
    docs = ([{"text": t, "lang": "de"} for t in _DE]
            + [{"text": t, "lang": "en"} for t in _EN]) * 4
    prof = train_langid_profile(rd.from_items(docs))
    p = os.path.join(str(tmp_path), "prof.parquet")
    pq.write_table(prof, p)
    return p


def _ref_score(path: str, text: str):
    """Brute-force scoring straight from the artifact (the SQL mirror's
    semantics, reimplemented independently of the model class)."""
    rows = pq.read_table(path).to_pylist()
    langs = sorted({r["lang"] for r in rows})
    lp = {(r["lang"], r["tri"]): r["lp_micro"] for r in rows}
    tris = _row_trigrams(text.lower()[:256])
    if not tris:
        return "und", 0.0
    sums = {l: sum(lp.get((l, tri), lp[(l, "")]) for tri in tris)
            for l in langs}
    best = max(sums.values())
    lang = min(l for l in langs if sums[l] == best)
    return lang, math.floor(best / len(tris) + 0.5) / 1e6


def test_model_beats_heuristic_on_planted_hard_case(ray_session, tmp_path):
    from wsid_ray.stages.textstats import langid_batch
    path = _planted_profile(tmp_path)
    model = TrigramLangId(path)
    labels, scores = model([_HARD])
    heur = langid_batch(pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "text": pa.array([_HARD], type=pa.string())}))
    assert heur["lang_pred"][0].as_py() == "en"  # marker word fools it
    assert labels[0] == "de"                     # the trained model is live
    assert scores[0] == _ref_score(path, _HARD)[1]


def test_model_matches_artifact_reference(ray_session, tmp_path):
    path = _planted_profile(tmp_path)
    model = TrigramLangId(path)
    texts = [_HARD, _EN[0], _DE[1], "x", "", "THE ZUG the zug",
             "completely unrelated words xylophone quartz"]
    labels, scores = model(texts)
    for t, l, s in zip(texts, labels, scores):
        rl, rs = _ref_score(path, t)
        assert (l, s) == (rl, rs), t


def test_training_is_block_split_invariant(ray_session, tmp_path):
    docs = ([{"text": t, "lang": "de"} for t in _DE]
            + [{"text": t, "lang": "en"} for t in _EN]) * 8
    a = train_langid_profile(rd.from_items(docs))
    b = train_langid_profile(rd.from_items(docs).repartition(7))
    assert a.equals(b)


def test_actor_pool_model_path(ray_session, tmp_path):
    """langid_documents(model=...) — the actor-pool plumbing — produces
    exactly the model's own outputs."""
    from wsid_ray.stages.textstats import langid_documents
    path = _planted_profile(tmp_path)
    model = TrigramLangId(path)
    texts = _DE + _EN + [_HARD]
    docs = rd.from_items([{"doc_id": i, "text": t}
                          for i, t in enumerate(texts)])
    got = {r["doc_id"]: (r["lang_pred"], r["lang_score"])
           for r in langid_documents(docs, model=model).take_all()}
    labels, scores = model(texts)
    want = {i: (labels[i], float(scores[i])) for i in range(len(texts))}
    assert got == want


def test_non_ascii_fallback_matches_reference(ray_session, tmp_path):
    """Codepoint fallback path (non-ASCII head) scores identically to
    the artifact reference — the byte fast path must not be a semantic
    fork."""
    docs = ([{"text": t, "lang": "de"} for t in _DE]
            + [{"text": t + " naïve café", "lang": "fr"} for t in _EN]) * 4
    prof = train_langid_profile(rd.from_items(docs))
    p = os.path.join(str(tmp_path), "prof2.parquet")
    pq.write_table(prof, p)
    model = TrigramLangId(p)
    texts = ["naïve café zug", "café naïve the cat", _DE[0]]
    labels, scores = model(texts)
    for t, l, s in zip(texts, labels, scores):
        rl, rs = _ref_score(p, t)
        assert (l, s) == (rl, rs), t
