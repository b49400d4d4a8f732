"""M8/D1 — triple assembly rules and dedup idempotence (FIXTURES.md F3)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from wsid_ray.stages.triples import dedup_triples, triples_from_mentions


def mentions_ds(rows):
    df = pd.DataFrame(rows, columns=[
        "conv_id", "turn_idx", "role", "tool", "ts", "term",
        "span_start", "entity_id", "sense_id"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["span_start"] = df["span_start"].astype("int32")
    df["ts"] = pd.Series(df["ts"], dtype="datetime64[us]")
    return rd.from_pandas(df)


TS = pd.Timestamp("2026-01-01")


def test_assembly_rules():
    ds = mentions_ds([
        ("c1", 0, "tool", "search", TS, "python", 1, "python#0", 0),
        ("c1", 0, "tool", "search", TS, "jaguar", 4, "jaguar#1", 1),
        ("c1", 1, "user", "", TS, "bank", 0, "bank#0", 0),
        ("c1", 2, "user", "", TS, "apple", 0, "apple#-1", -1),  # unlinked
    ])
    canon = {"jaguar#1": "jag#0"}
    got = {(r["subj"], r["pred"], r["obj"])
           for r in triples_from_mentions(ds, canon).take_all()}
    assert got == {
        ("python#0", "co_mentioned_with", "jag#0"),
        ("python#0", "uses_tool", "search"),
        ("jag#0", "uses_tool", "search"),
        ("python#0", "addresses", "tool"),
        ("jag#0", "addresses", "tool"),
        ("bank#0", "addresses", "user"),
    }


def test_pair_order_and_same_canon_skipped():
    ds = mentions_ds([
        ("c1", 0, "user", "", TS, "banks", 0, "banks#0", 0),
        ("c1", 0, "user", "", TS, "bank", 3, "bank#0", 0),
    ])
    canon = {"banks#0": "bank#0", "bank#0": "bank#0"}
    got = {(r["subj"], r["pred"], r["obj"])
           for r in triples_from_mentions(ds, canon).take_all()}
    # both mentions canonicalize to the same entity -> no self pair
    assert got == {("bank#0", "addresses", "user")}


def test_dedup_idempotent_and_first_provenance():
    rows = []
    for turn in (3, 1, 2):
        rows.append(("c1", turn, "user", "", TS, "bank", 0, "bank#0", 0))
    ds = mentions_ds(rows)
    tri = triples_from_mentions(ds, {})
    d1 = dedup_triples(tri)
    out1 = d1.take_all()
    assert len(out1) == 1
    assert out1[0]["turn_idx"] == 1  # first provenance by (conv, turn)
    out2 = dedup_triples(rd.from_pandas(pd.DataFrame(out1))).take_all()
    assert len(out2) == 1 and out2[0]["subj"] == out1[0]["subj"]
