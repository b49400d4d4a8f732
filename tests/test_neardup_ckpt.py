"""Near-dup chain checkpoint/resume (VERDICT r04 item 5): kill mid-run,
rerun, identical drop list + manifest-verified shard skips."""

import json
import os
import shutil

import pytest

from wsid_ray.pipelines.neardup_ckpt import (drops_dataset,
                                             run_neardup_checkpointed)

SF = "/root/testdata/sf0.001"


def _drop_set(out):
    return {(r["doc_id"], r["kept_by"])
            for r in drops_dataset(out).take_all()}


@pytest.fixture(scope="module")
def full_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ndckpt"))
    ckpt = run_neardup_checkpointed(SF, out, num_shards=4)
    return out, ckpt, _drop_set(out)


def test_matches_unchunked_chain(full_run):
    """The resumable chain == the one-shot near_dup_drop_list."""
    from wsid_ray.stages.dedup import near_dup_drop_list
    from wsid_ray.stages.textstats import read_documents
    _, _, drops = full_run
    direct = {(r["doc_id"], r["kept_by"])
              for r in near_dup_drop_list(
                  read_documents(SF, columns=["doc_id", "text"]))
              .take_all()}
    assert drops == direct
    assert drops  # the fixture plants real near-dups


def test_partitions_and_metrics(full_run):
    _, ckpt, _ = full_run
    stats = ckpt.stats()
    stages = {r["stage"] for r in stats}
    assert stages == {"bands", "shingles", "pairs", "drops"}
    assert len([r for r in stats if r["stage"] == "bands"]) == 4
    assert len([r for r in stats if r["stage"] == "shingles"]) == 4
    for r in stats:
        assert r["done"] and r["lineage"] and r["wall_s"] > 0


def test_kill_resume_identical_and_skips(full_run):
    out, _, baseline = full_run
    # simulate a kill mid-pass-1: drop shards 2,3 of both sketch stages
    # and everything downstream
    mpath = os.path.join(out, "manifest.jsonl")
    with open(mpath) as f:
        records = [json.loads(l) for l in f if l.strip()]
    kept, dropped = [], []
    for r in records:
        if (r["stage"] in ("bands", "shingles") and r["part"] >= 2) \
                or r["stage"] in ("pairs", "drops"):
            dropped.append(r)
            shutil.rmtree(os.path.join(out, r["stage"],
                                       f"part-{r['part']:04d}"))
        else:
            kept.append(r)
    with open(mpath, "w") as f:
        for r in kept:
            f.write(json.dumps(r) + "\n")

    ckpt2 = run_neardup_checkpointed(SF, out, num_shards=4)
    stats = {(r["stage"], r["part"]): r for r in ckpt2.stats()}
    for r in kept:     # completed shards skipped (original timestamps)
        assert stats[(r["stage"], r["part"])]["ts"] == r["ts"], r
    for r in dropped:  # killed shards recomputed
        assert stats[(r["stage"], r["part"])]["ts"] != r["ts"], r
    assert _drop_set(out) == baseline


def test_param_change_invalidates(full_run):
    _, ckpt, _ = full_run
    from wsid_ray.pipelines.neardup_ckpt import _params_hash
    from wsid_ray.state.checkpoint import lineage_hash
    doc = os.path.join(SF, "documents.parquet")
    lin_now = [r for r in ckpt.stats() if r["stage"] == "pairs"][0]["lineage"]
    other = lineage_hash([doc], _params_hash(0.9, 3, 64, 16, 4))
    assert other != lin_now
