"""Embedding-pass checkpoint/resume (VERDICT r04 missing #4): kill the
inference pass mid-run, rerun, identical pair list + manifest-verified
shard skips — the near-dup-chain resume surface applied to the
model-inference pipeline."""

import json
import os
import shutil

import pytest

from wsid_ray.pipelines.embed_ckpt import (embeds_dataset, pairs_dataset,
                                           run_embed_checkpointed)

SF = "/root/testdata/sf0.001"


def _pair_set(out):
    return {(r["vec_a"], r["vec_b"], round(r["score"], 6))
            for r in pairs_dataset(out).take_all()}


@pytest.fixture(scope="module")
def full_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("embckpt"))
    ckpt = run_embed_checkpointed(SF, out, num_shards=4)
    return out, ckpt, _pair_set(out)


def test_matches_unchunked_chain(full_run):
    """The resumable chain == the one-shot embed -> near_dup_pairs."""
    from wsid_ray.stages.embed import embed_documents
    from wsid_ray.stages.knn import near_dup_pairs
    from wsid_ray.stages.textstats import read_documents
    _, _, pairs = full_run
    direct = {(r["vec_a"], r["vec_b"], round(r["score"], 6))
              for r in near_dup_pairs(
                  embed_documents(read_documents(SF)),
                  threshold=0.99).take_all()}
    assert pairs == direct
    assert pairs  # the fixture plants real near-dups


def test_embeds_cover_corpus(full_run):
    """Persisted vectors cover every doc once and are reusable."""
    import pandas as pd
    out, ckpt, _ = full_run
    vec_ids = sorted(r["vec_id"]
                     for r in embeds_dataset(out)
                     .select_columns(["vec_id"]).take_all())
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert vec_ids == sorted(docs["doc_id"])
    stats = ckpt.stats()
    assert len([r for r in stats if r["stage"] == "embeds"]) == 4
    for r in stats:
        assert r["done"] and r["lineage"] and r["wall_s"] > 0


def test_kill_resume_identical_and_skips(full_run):
    out, _, baseline = full_run
    # simulate a kill mid-pass-1: drop shards 2,3 of the inference stage
    # and everything downstream
    mpath = os.path.join(out, "manifest.jsonl")
    with open(mpath) as f:
        records = [json.loads(l) for l in f if l.strip()]
    kept, dropped = [], []
    for r in records:
        if (r["stage"] == "embeds" and r["part"] >= 2) \
                or r["stage"] == "pairs":
            dropped.append(r)
            shutil.rmtree(os.path.join(out, r["stage"],
                                       f"part-{r['part']:04d}"))
        else:
            kept.append(r)
    with open(mpath, "w") as f:
        for r in kept:
            f.write(json.dumps(r) + "\n")

    ckpt2 = run_embed_checkpointed(SF, out, num_shards=4)
    stats = {(r["stage"], r["part"]): r for r in ckpt2.stats()}
    for r in kept:     # completed shards skipped (original timestamps)
        assert stats[(r["stage"], r["part"])]["ts"] == r["ts"], r
    for r in dropped:  # killed shards recomputed
        assert stats[(r["stage"], r["part"])]["ts"] != r["ts"], r
    assert _pair_set(out) == baseline


def test_param_change_invalidates(full_run):
    _, ckpt, _ = full_run
    from wsid_ray.pipelines.embed_ckpt import _params_hash
    from wsid_ray.state.checkpoint import lineage_hash
    doc = os.path.join(SF, "documents.parquet")
    lin_now = [r for r in ckpt.stats()
               if r["stage"] == "pairs"][0]["lineage"]
    other = lineage_hash([doc], _params_hash(32, 0.9, 8, 4, None))
    assert other != lin_now
