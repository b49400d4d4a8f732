"""Text-analysis operators (langid, quality, token counts, fingerprint,
simhash) — exact values on handcrafted docs."""

import hashlib

import pyarrow as pa

from wsid_ray.stages.textstats import (fingerprint_batch, langid_batch,
                                       quality_batch, simhash_batch,
                                       token_counts_batch)


def docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts)})


def test_token_counts():
    out = token_counts_batch(docs(["hello world", "a,b c!", ""])).to_pylist()
    assert [r["n_ws_tokens"] for r in out] == [2, 2, 0]
    # BPE-ish: a , b c !  -> 5
    assert [r["n_bpe_tokens"] for r in out] == [2, 5, 0]


def test_quality():
    out = quality_batch(docs(["abc def!", ""])).to_pylist()
    r = out[0]
    assert r["n_chars"] == 8
    assert abs(r["alpha_ratio"] - round(6 / 8, 6)) < 1e-9
    assert r["avg_token_len"] == round((3 + 4) / 2, 6)
    assert out[1]["alpha_ratio"] == 0.0


def test_langid():
    out = langid_batch(docs([
        "the cat and the hat is here",
        "der hund und die katze ist nicht da",
        "le chat est dans la maison et les arbres",
        "你好 世界",
    ])).to_pylist()
    assert [r["lang_pred"] for r in out] == ["en", "de", "fr", "zh"]


def test_fingerprint_matches_manual():
    out = fingerprint_batch(docs(["Hello WORLD again"])).to_pylist()
    expect = hashlib.md5(b"hello world again").hexdigest()
    assert out[0]["fingerprint"] == expect


def test_simhash_similar_docs_close():
    a = "spark data table query join filter sort merge window batch"
    b = "spark data table query join filter sort merge window group"
    c = "completely different words entirely unrelated topics here now"
    out = simhash_batch(docs([a, b, c])).to_pylist()
    ha, hb, hc = [r["simhash"] for r in out]

    def hamming(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert hamming(ha, hb) < hamming(ha, hc)
    out2 = simhash_batch(docs([a])).to_pylist()
    assert out2[0]["simhash"] == ha  # deterministic


def test_quality_filter_and_split():
    from wsid_ray.stages.textstats import (quality_filter_batch,
                                           split_assign_batch)
    t = docs(["x", "the quick brown fox jumps over the lazy dog " * 4])
    kept = quality_filter_batch(t)
    assert kept["doc_id"].to_pylist() == [1]  # short doc filtered out
    sp = split_assign_batch(t)
    assert set(sp["split"].to_pylist()) <= {"train", "val"}
    # deterministic across calls
    assert sp["split"].to_pylist() == \
        split_assign_batch(t)["split"].to_pylist()


def test_repetition():
    from wsid_ray.stages.textstats import repetition_batch
    out = repetition_batch(docs([
        "a b a b a b",       # 6 tokens, 2 distinct, "a b" bigram x3 of 5
        "x y z",             # all distinct, each bigram once (1 of 2)
        "solo",              # n=1: no bigrams
        "",                  # empty
    ])).to_pylist()
    assert [r["n_tokens"] for r in out] == [6, 3, 1, 0]
    assert out[0]["distinct_ratio"] == round(2 / 6, 6)
    assert out[0]["top_bigram_frac"] == 0.6        # 3 / 5
    assert out[1]["distinct_ratio"] == 1.0
    assert out[1]["top_bigram_frac"] == 0.5        # 1 / 2
    assert out[2]["top_bigram_frac"] == 0.0
    assert out[3]["distinct_ratio"] == 0.0


def test_stratified_sample_deterministic():
    from wsid_ray.stages.textstats import stratified_sample_batch
    t = pa.table({
        "doc_id": pa.array(range(200), type=pa.int64()),
        "lang": pa.array(["en", "de"] * 100),
    })
    kept = stratified_sample_batch(t).to_pylist()
    # deterministic: same input -> identical selection
    again = stratified_sample_batch(t).to_pylist()
    assert kept == again
    for r in kept:
        h = int.from_bytes(
            hashlib.md5(str(r["doc_id"]).encode()).digest()[:8],
            "little") % 100
        assert h < (50 if r["lang"] == "en" else 20)
    # strata actually differ in keep rate on this fixture
    n_en = sum(1 for r in kept if r["lang"] == "en")
    n_de = sum(1 for r in kept if r["lang"] == "de")
    assert n_en > n_de


def test_pii_redact_real_shapes():
    import pyarrow as pa

    from wsid_ray.stages.pii import plant_pii_batch, redact_batch

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "mail me at jane.doe+spam@sub.example.co.uk today",
            "call +49 (0)30 1234-5678 or 555 867 5309 now",
            "server at 192.168.0.1 and 8.8.8.8, not 1.2.3",
        ]),
    })
    out = redact_batch(t).to_pylist()
    assert (out[0]["n_emails"], out[0]["n_phones"], out[0]["n_ips"]) \
        == (1, 0, 0)
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) \
        == (0, 2, 0)
    # "1.2.3" is not a dotted quad; both full IPs count
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ips"]) \
        == (0, 0, 2)

    planted = plant_pii_batch(t)
    red = redact_batch(planted).to_pylist()
    # planting adds exactly one of each PII kind per document
    assert [r["n_emails"] - o["n_emails"] for r, o in zip(red, out)] \
        == [1, 1, 1]
    assert [r["n_ips"] - o["n_ips"] for r, o in zip(red, out)] == [1, 1, 1]


def test_doc_pipeline_summary_invariants():
    import duckdb

    from wsid_ray.pipelines.queries import q_doc_pipeline_summary

    sf = "/root/testdata/sf0.001"
    out = q_doc_pipeline_summary(sf).to_pandas()
    con = duckdb.connect()
    total = con.sql(f"SELECT count(*) FROM read_parquet("
                    f"'{sf}/documents.parquet')").fetchone()[0]
    # the chain only ever drops documents, and the summary partitions the
    # survivors
    assert 0 < out["n_docs"].sum() <= total
    assert set(out["split"]) <= {"train", "val"}
    assert (out["sum_chars"] >= out["n_docs"] * 80).all()  # filter floor


def test_pack_sequences_greedy_invariants():
    import pyarrow as pa
    import ray.data as rd

    from wsid_ray.stages.packing import pack_sequences

    # one lang, token counts 3/3/3/10/2 with cap 8:
    # pack0 = {0,1} (3+3=6; +3 would be 9>8), pack1 = {2} +10>8 ->
    # actually pack1 opens with doc2 (3), doc3 (10) overflows -> pack2
    # alone, doc4 (2) -> pack3
    texts = ["a b c", "d e f", "g h i", "j k l m n o p q r s", "t u"]
    t = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                  "lang": pa.array(["en"] * 5),
                  "text": pa.array(texts)})
    out = {r["doc_id"]: r["pack_id"]
           for r in pack_sequences(rd.from_arrow(t), cap=8,
                                   num_buckets=2).take_all()}
    assert out == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3}


def test_importance_sample_monotone_and_stable():
    from wsid_ray.pipelines.queries import q_doc_importance_sample

    sf = "/root/testdata/sf0.001"
    a = q_doc_importance_sample(sf).to_pandas()
    b = q_doc_importance_sample(sf).to_pandas()
    # content-stable: identical sample on re-run
    pd_a = a.sort_values("doc_id", ignore_index=True)
    pd_b = b.sort_values("doc_id", ignore_index=True)
    assert pd_a.equals(pd_b)
    # rates respect the clamp and are monotone in the score
    assert a["rate"].between(5, 95).all()
    s = a.sort_values("lm_score")
    assert (s["rate"].diff().dropna() >= 0).all()


def test_url_domain_rows_real_shapes():
    import pyarrow as pa

    from wsid_ray.stages.pii import url_domain_rows

    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array([
                      "x https://a.example.com/p?q=1 y http://b.org z",
                      "no urls here, https not a scheme",
                  ])})
    got = sorted(r["domain"] for r in url_domain_rows(t).to_pylist())
    assert got == ["a.example.com", "b.org"]
