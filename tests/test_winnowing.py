"""Round-5: winnowing fingerprints (Schleimer 2003) — the window
decomposition used by engine + SQL equals the canonical per-window
rightmost-min definition, plus oracle parity and the coverage
guarantee."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"
W, K = 4, 3


def _canonical(h: np.ndarray) -> set:
    """The paper's definition: every full window of W hashes selects its
    minimum, ties to the RIGHTMOST position; union over windows."""
    sel = set()
    for s in range(len(h) - W + 1):
        win = h[s:s + W]
        m = win.min()
        j = s + max(i for i in range(W) if win[i] == m)
        sel.add(j)
    return sel


def _decomposed(h: np.ndarray) -> set:
    from wsid_ray.pipelines.queries import q_doc_winnowing  # noqa: F401
    # re-derive via the module's split rule (mirrors the SQL)
    n = len(h)
    if n < W:
        return set()
    INF = np.iinfo(np.int64).max
    sel = np.zeros(n, dtype=bool)
    j = np.arange(n)
    for a in range(W):
        b = W - 1 - a
        pm = np.full(n, INF, dtype=np.int64)
        if a:
            sw = np.lib.stride_tricks.sliding_window_view(h, a)
            pm[a:] = sw[:n - a].min(axis=1)
        nm = np.full(n, INF, dtype=np.int64)
        if b:
            sw = np.lib.stride_tricks.sliding_window_view(h, b)
            nm[:n - b] = sw[1:].min(axis=1)
        sel |= (pm >= h) & (nm > h) & (j >= a) & (j <= n - 1 - b)
    return set(np.nonzero(sel)[0])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=7), min_size=0,
                max_size=24))
def test_decomposition_equals_canonical(vals):
    """Property: the split-rule set == the per-window rightmost-min set,
    including heavy ties (values drawn from a tiny domain)."""
    h = np.asarray(vals, dtype=np.int64)
    assert _decomposed(h) == _canonical(h)


def test_winnowing_parity_and_guarantee():
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_doc_winnowing

    got = q_doc_winnowing(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    exp = con.sql(E.oracle_sql()["doc_winnowing"]).df()
    con.close()

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind="mergesort",
                              ignore_index=True)

    pd.testing.assert_frame_equal(canon(got), canon(exp))
    assert len(got)

    # winnowing guarantee: any W consecutive k-gram positions contain at
    # least one selected fingerprint (recomputed on one real doc)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    row = docs.iloc[0]
    ts = [x for x in row["text"].split() if x]
    n = len(ts) - K + 1
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(
            " ".join(ts[i:i + K]).encode()).digest()[:8],
            "little") >> 1 for i in range(n)), dtype=np.int64, count=n)
    sel = set(got.loc[got["doc_id"] == row["doc_id"], "pos"])
    assert sel == _canonical(h)
    for s in range(n - W + 1):
        assert any(s <= p <= s + W - 1 for p in sel)


def test_overlap_pairs_parity_and_recompute():
    """MOSS overlap join: parity + brute-force recompute of shared
    fingerprint counts from the selected sets."""
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import (q_doc_winnowing,
                                            q_winnow_overlap_pairs)
    got = q_winnow_overlap_pairs(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    exp = con.sql(E.oracle_sql()["winnow_overlap_pairs"]).df()
    con.close()

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind="mergesort",
                              ignore_index=True)

    pd.testing.assert_frame_equal(canon(got), canon(exp))
    assert len(got)  # planted near-dups share fingerprints

    fps = q_doc_winnowing(SF).to_pandas()
    by_doc = {d: set(g["fp"]) for d, g in fps.groupby("doc_id")}
    from collections import Counter
    ref: Counter = Counter()
    docs = sorted(by_doc)
    by_fp: dict = {}
    for d, s in by_doc.items():
        for f in s:
            by_fp.setdefault(f, []).append(d)
    for f, ds in by_fp.items():
        if not (2 <= len(ds) <= 1000):
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                ref[(ds[i], ds[j])] += 1
    ref = {k: v for k, v in ref.items() if v >= 2}
    got_map = {(r.doc_a, r.doc_b): r.n_shared for r in got.itertuples()}
    assert got_map == ref


def test_containment_parity_and_bounds():
    """Containment: parity + bounds + brute-force recompute."""
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import (q_doc_winnowing,
                                            q_winnow_containment)
    got = q_winnow_containment(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    exp = con.sql(E.oracle_sql()["winnow_containment"]).df()
    con.close()

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind="mergesort",
                              ignore_index=True)

    pd.testing.assert_frame_equal(canon(got), canon(exp))
    assert len(got)
    assert (got["containment_micro"] > 0).all()
    assert (got["containment_micro"] <= 1_000_000).all()

    fps = q_doc_winnowing(SF).to_pandas()
    nfp = fps.drop_duplicates(["doc_id", "fp"]) \
             .groupby("doc_id").size().to_dict()
    for r in got.itertuples():
        denom = min(nfp[r.doc_a], nfp[r.doc_b])
        expct = int(np.floor(r.n_shared / denom * 1e6 + 0.5))
        assert r.containment_micro == expct
