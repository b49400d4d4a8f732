"""Tests for the MinHash sketch-quality audit operators."""

import numpy as np

SF = "/root/testdata/sf0.001"


def test_minhash_est_consistency():
    from wsid_ray.stages.dedup import (minhash_candidates,
                                       minhash_jaccard_estimate)
    from wsid_ray.stages.textstats import read_documents
    est = minhash_jaccard_estimate(read_documents(SF)).to_pandas()
    cands = minhash_candidates(read_documents(SF)).to_pandas()
    # one audit row per candidate pair, exactly
    assert (set(zip(est["doc_a"], est["doc_b"]))
            == set(zip(cands["doc_a"], cands["doc_b"])))
    # the integer contract: est_micro = n_match * 1e6 // 64
    assert (est["est_micro"] == est["n_match"] * 1_000_000 // 64).all()
    assert (est["err_micro"]
            == (est["est_micro"] - est["jacc_micro"]).abs()).all()
    assert est["n_match"].between(0, 64).all()
    # LSH candidates share at least one full band (4 positions here)
    assert (est["n_match"] >= 4).all()


def test_lsh_bucket_stats_mass_conservation():
    from wsid_ray.stages.dedup import lsh_bucket_stats, minhash_band_rows
    from wsid_ray.stages.textstats import read_documents
    hist = lsh_bucket_stats(read_documents(SF)).to_pandas()
    total_rows = int((hist["bucket_size"] * hist["n_buckets"]).sum())
    bands = read_documents(SF).map_batches(
        minhash_band_rows, batch_format="pyarrow").count()
    assert total_rows == bands       # every band row lands in one bucket
    assert (hist["bucket_size"] >= 1).all()
