"""Deterministic per-scale oracle artifacts (VERDICT r02 item 1/6).

The sense-induction step (Chinese Whispers) is genuinely not
SQL-expressible, but everything DOWNSTREAM of a fixed inventory is:
disambiguation scoring is a window-token ⋈ inventory join + argmax,
entity linking is an inventory ⋈ KB-profile join + argmax,
canonicalisation is recursive-CTE reachability over the (entity_id,
kb_id) edge set, and triple assembly is unary rules + a pair self-join.
So the engine's deterministic fit is materialised ONCE per scale to
parquet here, and the DuckDB oracles for ``mentions_linked``,
``canon_map``, ``triples`` and ``knn_recall`` read these files — turning
the flagship chain's driver checks from rows-only into hash-exact.

Everything written here is a pure function of the synthetic fixtures +
config (seeded CW, fixed iteration caps, seeded ANN), so whichever side
triggers generation first (engine queries or oracle SQL), both see
identical bytes.  Writes are atomic (tmp dir + rename) and idempotent.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .config import DEFAULT_CONFIG, GAZETTEER, kb_candidates

_ART_VERSION = "a5"
_ROOT = os.path.join(tempfile.gettempdir(), "wsid_ray_artifacts",
                     _ART_VERSION)

# the fixed ANN evaluation query set shared by the knn_* queries and the
# recall artifacts: the first five vectors of the embeddings table
ANN_QUERY_IDS = (0, 1, 2, 3, 4)
ANN_K = 10


def _scale_of(sf_dir_or_scale: str) -> str:
    return os.path.basename(str(sf_dir_or_scale).rstrip("/")) or "sf0.01"


def _sf_dir(sf_dir_or_scale: str) -> str:
    s = str(sf_dir_or_scale)
    if os.path.isdir(s):
        return s
    return os.path.join("/root/testdata", _scale_of(s))


def art_dir(sf_dir_or_scale: str) -> str:
    return os.path.join(_ROOT, _scale_of(sf_dir_or_scale))


def ann_queries(sf_dir_or_scale: str) -> dict[int, np.ndarray]:
    """The fixed ANN query vectors (deterministic: first five vec_ids)."""
    t = pq.read_table(os.path.join(_sf_dir(sf_dir_or_scale),
                                   "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    wanted = set(ANN_QUERY_IDS)
    return {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in t.to_pylist() if r["vec_id"] in wanted}


def _write_sorted(tbl: pa.Table, path: str, sort_cols: list[str]) -> None:
    idx = pa.compute.sort_indices(
        tbl, sort_keys=[(c, "ascending") for c in sort_cols])
    pq.write_table(tbl.take(idx), path)


def ensure(sf_dir_or_scale: str) -> dict[str, str]:
    """Idempotently materialise the oracle artifacts for a scale; returns
    {name: parquet path}.  Ray must already be initialised (driver
    contract) — the fit and ANN runs are the engine's own pipelines."""
    d = art_dir(sf_dir_or_scale)
    paths = {
        "inventory": os.path.join(d, "inventory.parquet"),
        "kb": os.path.join(d, "kb.parquet"),
        "ivf_topk": os.path.join(d, "ivf_topk.parquet"),
        "lsh_topk": os.path.join(d, "lsh_topk.parquet"),
        "langid_profile": os.path.join(d, "langid_profile.parquet"),
        "media_decoded": os.path.join(d, "media_decoded.parquet"),
        "idf": os.path.join(d, "idf.parquet"),
    }
    if os.path.exists(os.path.join(d, "_DONE")):
        return paths

    scale = _scale_of(sf_dir_or_scale)
    sf = _sf_dir(sf_dir_or_scale)
    from .fixtures import generate
    generate(scale)

    os.makedirs(os.path.dirname(d), exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f"wsid_art_{scale}_",
                           dir=os.path.dirname(d))
    try:
        # --- sense inventory (full-precision weights; the scoring SQL
        # rounds sums, not inputs) -------------------------------------
        from .pipelines.flagship import detect_mentions, fit_model
        from .sources.transcripts import read_transcripts
        from .stages.tokenize import tokenize_batch
        cfg = DEFAULT_CONFIG
        turns = read_transcripts(scale).map_batches(
            tokenize_batch, batch_format="pyarrow")
        inv_rows, _ = fit_model(detect_mentions(turns, cfg), cfg)
        inv = pa.table({
            "term": pa.array([r["term"] for r in inv_rows],
                             type=pa.string()),
            "sense_id": pa.array([r["sense_id"] for r in inv_rows],
                                 type=pa.int32()),
            "token": pa.array([r["token"] for r in inv_rows],
                              type=pa.string()),
            "weight": pa.array([r["weight"] for r in inv_rows],
                               type=pa.float64()),
        })
        _write_sorted(inv, os.path.join(tmp, "inventory.parquet"),
                      ["term", "sense_id", "token"])

        # --- KB candidate profiles (exploded, from config) -------------
        kt, kk, kp = [], [], []
        for term in sorted(GAZETTEER):
            for kb_id in sorted(kb_candidates(term)):
                for tok in kb_candidates(term)[kb_id]:
                    kt.append(term)
                    kk.append(kb_id)
                    kp.append(tok)
        _write_sorted(pa.table({
            "term": pa.array(kt, type=pa.string()),
            "kb_id": pa.array(kk, type=pa.string()),
            "token": pa.array(kp, type=pa.string()),
        }), os.path.join(tmp, "kb.parquet"), ["term", "kb_id", "token"])

        # --- approximate ANN results (seeded, deterministic) -----------
        from .stages.knn import ivf_topk, lsh_topk, read_embeddings
        from .util import collect_table
        q = ann_queries(sf)
        for name, fn in (("ivf_topk", ivf_topk), ("lsh_topk", lsh_topk)):
            res = collect_table(fn(read_embeddings(sf), q, k=ANN_K))
            if res is None:
                res = pa.table({
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                })
            _write_sorted(res.select(["query_id", "vec_id", "score"]),
                          os.path.join(tmp, f"{name}.parquet"),
                          ["query_id", "vec_id"])

        # --- corpus-trained trigram langid profile (VERDICT r04 item 2):
        # distributed count pass over the scale's labelled documents,
        # integer lp_micro quantised once here — engine scorer and DuckDB
        # oracle both read these bytes ------------------------------------
        from .langprofile import train_langid_profile
        from .stages.textstats import read_documents
        pq.write_table(
            train_langid_profile(read_documents(sf, columns=["text",
                                                             "lang"])),
            os.path.join(tmp, "langid_profile.parquet"))

        # --- media expected-decode ground truth (VERDICT r04 item 3):
        # encoder-side bodies / JPEG reconstructions (no Huffman), so the
        # media_features oracle checks the engine's decode path for real
        from .stages.multimodal import synth_media_expected_table
        pq.write_table(synth_media_expected_table(300, 42),
                       os.path.join(tmp, "media_decoded.parquet"))

        # --- corpus-trained IDF table (r5): distributed df pass; integer
        # idf_micro read by BOTH the TfidfHashEmbedder and its oracle ----
        from .embedmodel import train_idf
        pq.write_table(
            train_idf(read_documents(sf, columns=["doc_id", "text"])),
            os.path.join(tmp, "idf.parquet"))

        with open(os.path.join(tmp, "_DONE"), "w") as fh:
            fh.write(_ART_VERSION)
        if not os.path.exists(os.path.join(d, "_DONE")):
            try:
                os.rename(tmp, d)
            except OSError:
                pass  # concurrent creator won
    finally:
        if os.path.isdir(tmp):
            shutil.rmtree(tmp, ignore_errors=True)
    return paths
