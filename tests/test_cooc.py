"""G1/G2/M5/M6 — exact co-occurrence counts and hand-computed NPMI
(reference cooc fixture style, SURVEY.md §5.1; Bouma 2009)."""

import math

import pyarrow as pa
import ray.data as rd

from wsid_ray.stages.cooc import aggregate_counts, cooc_edges, count_windows_batch


def mentions_ds(windows):
    return rd.from_arrow(pa.table({
        "term": pa.array([t for t, _ in windows]),
        "win_tokens": pa.array([w for _, w in windows],
                               type=pa.list_(pa.string())),
    }))


WINDOWS = [
    ("t", ["x", "y"]),
    ("t", ["x", "y"]),
    ("t", ["x", "z"]),
    ("t", ["y", "z", "x"]),
]


def test_partial_counts_exact():
    tbl = pa.table({
        "term": pa.array(["t", "t"]),
        "win_tokens": pa.array([["x", "y", "x"], ["x"]],
                               type=pa.list_(pa.string())),
    })
    out = count_windows_batch(tbl)
    rows = {(r["term"], r["w"], r["v"]): r["n"] for r in out.to_pylist()}
    # windows are SETS of tokens (hyperedge projection): dup 'x' counted once
    assert rows[("t", "x", "y")] == 1
    assert rows[("t", "x", "")] == 2
    assert rows[("t", "y", "")] == 1
    assert rows[("t", "", "")] == 2


def test_aggregate_counts_across_batches():
    ds = mentions_ds(WINDOWS)
    rows = {(r["term"], r["w"], r["v"]): r["n"]
            for r in aggregate_counts(ds).take_all()}
    assert rows[("t", "", "")] == 4          # N windows
    assert rows[("t", "x", "")] == 4
    assert rows[("t", "y", "")] == 3
    assert rows[("t", "z", "")] == 2
    assert rows[("t", "x", "y")] == 3
    assert rows[("t", "x", "z")] == 2
    assert rows[("t", "y", "z")] == 1


def test_npmi_hand_computed():
    ds = mentions_ds(WINDOWS)
    edges = cooc_edges(ds, min_count=1, npmi_min=-1.1).take_all()
    got = {(r["w"], r["v"]): r for r in edges}
    # (x,y): n=3, N=4, n_x=4, n_y=3 -> pmi=ln(3*4/(4*3))=0, npmi=0
    assert abs(got[("x", "y")]["pmi"] - 0.0) < 1e-12
    assert abs(got[("x", "y")]["npmi"] - 0.0) < 1e-12
    # (y,z): n=1, N=4, n_y=3, n_z=2 -> pmi=ln(4/6), npmi=pmi/-ln(1/4)
    pmi = math.log(1 * 4 / (3 * 2))
    npmi = pmi / -math.log(1 / 4)
    assert abs(got[("y", "z")]["pmi"] - pmi) < 1e-12
    assert abs(got[("y", "z")]["npmi"] - npmi) < 1e-12
    assert all(-1.0 <= r["npmi"] <= 1.0 for r in edges)


def test_pruning():
    ds = mentions_ds(WINDOWS)
    edges = cooc_edges(ds, min_count=2, npmi_min=-1.1).take_all()
    keys = {(r["w"], r["v"]) for r in edges}
    assert ("y", "z") not in keys          # n=1 < 2
    assert ("x", "y") in keys
