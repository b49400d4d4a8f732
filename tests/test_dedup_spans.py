"""Duplicate-span removal (stages/dedup.dedup_spans)."""

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def test_dedup_spans_parity():
    import __ray_entry__ as E
    from wsid_ray.stages.dedup import dedup_spans
    from wsid_ray.stages.textstats import read_documents
    got = _canon(dedup_spans(read_documents(SF)).to_pandas())
    con = duckdb.connect()
    try:
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
        exp = _canon(con.sql(E.oracle_sql()["doc_dedup_spans"]).df())
    finally:
        con.close()
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == 500


def test_dedup_spans_planted():
    """Two docs sharing one long phrase: the phrase drops from BOTH,
    the unique remainders survive."""
    from wsid_ray.stages.dedup import dedup_spans
    from wsid_ray.stages.tokenize import tokenize_column

    shared = "quantum entangled marmoset theorem violates causal ordering"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"alpha unique prefix {shared} omega tail",
            f"different beginning here {shared} other ending",
            "entirely unrelated third document text content"],
            pa.string())})
    out = dedup_spans(rd.from_arrow(docs), k=5).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    toks = tokenize_column(docs["text"]).to_pylist()
    shared_toks = tokenize_column(
        pa.array([shared])).to_pylist()[0]
    # every token of the shared phrase is covered in docs 1 and 2
    for i in (0, 1):
        assert out.loc[i, "n_removed"] >= len(shared_toks)
        kept = [w for w in toks[i] if w not in set(shared_toks)]
        # doc-specific remainder must be a superset of what survived
        fp_all_kept = hashlib.md5(" ".join(kept).encode()).hexdigest()
        if out.loc[i, "n_removed"] == len(shared_toks):
            assert out.loc[i, "kept_fp"] == fp_all_kept
    # untouched doc keeps everything
    assert out.loc[2, "n_removed"] == 0
    assert out.loc[2, "kept_fp"] == hashlib.md5(
        " ".join(toks[2]).encode()).hexdigest()


def test_dedup_spans_removes_on_fixture():
    """The sf0.001 corpus has cross-doc duplicated 5-grams (the
    doc_dup_ngrams query is non-zero), so span removal must fire."""
    from wsid_ray.stages.dedup import dedup_spans
    from wsid_ray.stages.textstats import read_documents
    out = dedup_spans(read_documents(SF)).to_pandas()
    assert (out["n_removed"] > 0).any()
    assert (out["n_removed"] <= out["n_tokens"]).all()


def test_pipeline_spans_summary_parity():
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_doc_pipeline_spans_summary
    got = _canon(q_doc_pipeline_spans_summary(SF).to_pandas())
    con = duckdb.connect()
    try:
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
        exp = _canon(con.sql(
            E.oracle_sql()["doc_pipeline_spans_summary"]).df())
    finally:
        con.close()
    pd.testing.assert_frame_equal(got, exp)
    assert got["n_docs"].sum() == 500
    assert (got["sum_removed"] <= got["sum_tokens"]).all()


def test_exact_substrings_planted_non_gram_aligned():
    """VERDICT r04 item 4: a 7-token shared passage at min_len=5 must
    come back as ONE span of exactly (start, len=7) in each copy —
    arbitrary boundaries, not gram-aligned — and a passage repeated
    twice WITHIN one doc must be found too (dedup_spans' distinct-doc
    rule misses it)."""
    import hashlib

    import ray.data as rd

    from wsid_ray.stages.dedup import exact_substrings

    shared = ["alpha7", "bravo7", "charlie7", "delta7", "echo7",
              "foxtrot7", "golf7"]            # 7 tokens, L=5
    inner = ["kilo5", "lima5", "mike5", "nov5x", "oscar5"]  # 5 tokens
    docs = [
        # doc 0: shared passage at token offset 3
        {"doc_id": 0, "text": " ".join(
            ["junka0", "junkb0", "junkc0"] + shared + ["junkd0"])},
        # doc 1: shared passage at token offset 1
        {"doc_id": 1, "text": " ".join(
            ["junka1"] + shared + ["junkd1", "junke1"])},
        # doc 2: the 5-token passage twice WITHIN the doc, separated
        {"doc_id": 2, "text": " ".join(
            inner + ["junka2", "junkb2"] + inner + ["junkc2"])},
        # doc 3: pure noise
        {"doc_id": 3, "text": "junka3 junkb3 junkc3 junkd3 junke3 junkf3"},
    ]
    out = exact_substrings(rd.from_items(docs), min_len=5).to_pandas()
    spans = {(r.doc_id, r.start, r.len): r.span_fp
             for r in out.itertuples()}
    fp7 = hashlib.md5(" ".join(shared).encode()).hexdigest()
    fp5 = hashlib.md5(" ".join(inner).encode()).hexdigest()
    assert spans == {
        (0, 3, 7): fp7,
        (1, 1, 7): fp7,
        (2, 0, 5): fp5,
        (2, 7, 5): fp5,
    }, spans


def test_exact_substrings_overlapping_sources_merge():
    """Two duplicated 5-windows overlapping in one doc merge into one
    maximal run (union-of-covered semantics)."""
    import ray.data as rd

    from wsid_ray.stages.dedup import exact_substrings

    a = ["aaa1x", "bbb1x", "ccc1x", "ddd1x", "eee1x"]
    b = ["ccc1x", "ddd1x", "eee1x", "fff1x", "ggg1x"]
    docs = [
        {"doc_id": 0, "text": " ".join(a + ["fff1x", "ggg1x"])},  # a+b merged
        {"doc_id": 1, "text": " ".join(["zzz1a"] + a + ["zzz1b"])},
        {"doc_id": 2, "text": " ".join(["yyy1a", "yyy1b"] + b)},
    ]
    out = exact_substrings(rd.from_items(docs), min_len=5).to_pandas()
    d0 = out[out["doc_id"] == 0]
    assert len(d0) == 1
    assert (int(d0["start"].iloc[0]), int(d0["len"].iloc[0])) == (0, 7)
