"""S5/J5 — checkpoint, kill, resume ⇒ identical triples, completed
partitions skipped (FIXTURES.md F3; BASELINE.json:6)."""

import json
import os
import shutil

import pytest

from wsid_ray.oracle import precision_recall, run_oracle
from wsid_ray.fixtures import transcript_files
from wsid_ray.pipelines.checkpointed import run_checkpointed, triples_dataset


def triple_set(out_dir):
    return {(r["subj"], r["pred"], r["obj"])
            for r in triples_dataset(out_dir).take_all()}


@pytest.fixture(scope="module")
def full_run(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ckpt"))
    ckpt = run_checkpointed("sf0.001", out, shard_files=1)
    return out, ckpt, triple_set(out)


def test_partitions_and_metrics(full_run):
    out, ckpt, _ = full_run
    stats = ckpt.stats()
    stages = {r["stage"] for r in stats}
    assert stages == {"senses", "canon", "triples"}
    tri_parts = [r for r in stats if r["stage"] == "triples"]
    assert len(tri_parts) == 4  # sf0.001 has 4 input files
    for r in stats:
        assert r["done"] and r["lineage"] and r["wall_s"] > 0
        assert "rows_per_s" in r


def test_matches_oracle(full_run):
    _, _, eng = full_run
    oracle = run_oracle(transcript_files("sf0.001"))
    p, r = precision_recall(eng, oracle["triples"])
    assert p == 1.0 and r == 1.0


def test_resume_skips_completed_and_is_identical(full_run):
    out, _, baseline = full_run
    # simulate a kill after 2 of 4 triple partitions: drop partitions 2,3
    mpath = os.path.join(out, "manifest.jsonl")
    with open(mpath) as f:
        records = [json.loads(l) for l in f if l.strip()]
    kept, dropped = [], []
    for r in records:
        if r["stage"] == "triples" and r["part"] >= 2:
            dropped.append(r)
            shutil.rmtree(os.path.join(out, "triples",
                                       f"part-{r['part']:04d}"))
        else:
            kept.append(r)
    with open(mpath, "w") as f:
        for r in kept:
            f.write(json.dumps(r) + "\n")

    ckpt2 = run_checkpointed("sf0.001", out, shard_files=1)
    stats = {(r["stage"], r["part"]): r for r in ckpt2.stats()}
    # untouched partitions kept their original timestamps (not recomputed)
    for r in kept:
        assert stats[(r["stage"], r["part"])]["ts"] == r["ts"], r
    # dropped partitions were recomputed
    for r in dropped:
        assert stats[(r["stage"], r["part"])]["ts"] != r["ts"]
    assert triple_set(out) == baseline


def test_config_change_invalidates(full_run, tmp_path):
    out, ckpt, _ = full_run
    from wsid_ray.config import PipelineConfig
    cfg2 = PipelineConfig(window_size=3)
    lin_rows = [r for r in ckpt.stats() if r["stage"] == "senses"]
    from wsid_ray.state.checkpoint import lineage_hash
    files = transcript_files("sf0.001")
    assert lineage_hash(files, cfg2.content_hash()) != lin_rows[0]["lineage"]


def test_subj_partitioned_sink_layout_and_pruned_read(full_run):
    """S3: triples land under subj_bucket=<b>/ dirs; a subject read scans
    only its bucket and returns exactly that subject's triples."""
    from wsid_ray.stages.triples import (SUBJ_BUCKETS,
                                         read_triples_for_subject)
    from wsid_ray.util import stable_hash64
    out, _, all_triples = full_run
    part0 = os.path.join(out, "triples", "part-0000")
    buckets = sorted(d for d in os.listdir(part0)
                     if d.startswith("subj_bucket="))
    assert buckets, f"no hive partition dirs in {part0}"
    assert all(0 <= int(d.split("=")[1]) < SUBJ_BUCKETS for d in buckets)
    subj = sorted({s for s, _, _ in all_triples})[0]
    got = {(r["subj"], r["pred"], r["obj"])
           for r in read_triples_for_subject(part0, subj).take_all()}
    import pyarrow.parquet as pq
    import ray.data as rd
    all_p0 = rd.read_parquet([
        os.path.join(root, f) for root, _, fs in os.walk(part0)
        for f in fs if f.endswith(".parquet")])
    want = {(r["subj"], r["pred"], r["obj"])
            for r in all_p0.take_all() if r["subj"] == subj}
    assert got == want and got  # non-empty, bucket-pruned read is exact


def test_checkpointed_honors_expand_cooc(tmp_path):
    """ADVICE r01: run_checkpointed with expand_cooc must produce the
    expansion-mode oracle triples (not silently fall back)."""
    from wsid_ray.config import PipelineConfig
    cfg = PipelineConfig(expand_cooc=True)
    out = str(tmp_path / "ckpt_exp")
    ckpt = run_checkpointed("tiny", out, cfg=cfg)
    assert {r["stage"] for r in ckpt.stats()} >= {"senses", "edges",
                                                  "canon", "triples"}
    oracle = run_oracle(transcript_files("tiny"), cfg)
    p, r = precision_recall(triple_set(out), oracle["triples"])
    assert p == 1.0 and r == 1.0
