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
