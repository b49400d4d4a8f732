"""KG query operators (pipelines/kg.py) + the batch-E panel ops.

The three KG reads are verified against direct pandas recomputes from
the deduped triple store (itself hash-checked vs the unrolled DuckDB
chain in the driver gate); the panel ops run against their oracle SQL
at sf0.001.
"""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort",
                          ignore_index=True)


def _duck(sql: str, tables) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in tables:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
        return con.sql(sql).df()
    finally:
        con.close()


def _triples() -> pd.DataFrame:
    from wsid_ray.pipelines.queries import q_triples
    return q_triples(SF).to_pandas()


def test_kg_two_hop_paths_matches_direct_join():
    from wsid_ray.config import PRED_CO_MENTION
    from wsid_ray.pipelines.queries import q_kg_two_hop_paths
    got = _canon(q_kg_two_hop_paths(SF).to_pandas())
    tr = _triples()
    e = tr[tr["pred"] == PRED_CO_MENTION][["subj", "obj"]]
    j = e.rename(columns={"subj": "a", "obj": "mid"}).merge(
        e.rename(columns={"subj": "mid", "obj": "c"}), on="mid")
    j = j[j["a"] != j["c"]]
    exp = j.groupby(["a", "c"], as_index=False).agg(
        n_paths=("mid", "size"), first_mid=("mid", "min"))
    exp["n_paths"] = exp["n_paths"].astype("int64")
    pd.testing.assert_frame_equal(got, _canon(exp))
    assert len(got) > 0
    assert (got["n_paths"] >= 1).all()


def test_kg_entity_degree_matches_direct_counts():
    from wsid_ray.config import PRED_CO_MENTION
    from wsid_ray.pipelines.queries import q_kg_entity_degree
    got = _canon(q_kg_entity_degree(SF).to_pandas())
    tr = _triples()
    co = tr[tr["pred"] == PRED_CO_MENTION]
    ents = sorted(set(tr["subj"]) | set(co["obj"]))
    rows = []
    for ent in ents:
        o = tr[tr["subj"] == ent]
        nbs = set(co.loc[co["subj"] == ent, "obj"]) \
            | set(co.loc[co["obj"] == ent, "subj"])
        rows.append((ent, len(o), o["pred"].nunique(),
                     int((co["obj"] == ent).sum()), len(nbs)))
    exp = pd.DataFrame(rows, columns=["ent", "n_out", "n_preds_out",
                                      "n_in_co", "n_neighbors"]) \
        .astype({"n_out": "int64", "n_preds_out": "int64",
                 "n_in_co": "int64", "n_neighbors": "int64"})
    pd.testing.assert_frame_equal(got, _canon(exp))
    # incoming co-mention partners are a subset of all neighbours
    assert (got["n_in_co"] <= got["n_neighbors"]).all()


def test_kg_pred_cooc_matches_direct_pairs():
    from itertools import combinations

    from wsid_ray.pipelines.queries import q_kg_pred_cooc
    got = _canon(q_kg_pred_cooc(SF).to_pandas())
    tr = _triples()
    sp = tr[["subj", "pred"]].drop_duplicates()
    pairs: dict[tuple, int] = {}
    for _, g in sp.groupby("subj"):
        for a, b in combinations(sorted(set(g["pred"])), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    exp = pd.DataFrame(
        [(a, b, n) for (a, b), n in pairs.items()],
        columns=["pred_a", "pred_b", "n_subjects"]) \
        .astype({"n_subjects": "int64"})
    pd.testing.assert_frame_equal(got, _canon(exp))
    assert (got["pred_a"] < got["pred_b"]).all()


def test_source_lang_mi_parity_and_definition():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import source_lang_mi
    got = _canon(source_lang_mi(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["source_lang_mi"],
                       tables=("documents",)))
    pd.testing.assert_frame_equal(got, exp)
    # total MI >= 0 up to per-cell half-micro quantisation
    assert got["mi_term_micro"].sum() > -len(got)
    # one cell straight from the definition
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "lang"])
    r = got.iloc[0]
    c = len(docs[(docs["source"] == r["source"])
                 & (docs["lang"] == r["lang"])])
    cs = len(docs[docs["source"] == r["source"]])
    cl = len(docs[docs["lang"] == r["lang"]])
    n = len(docs)
    t = int(np.floor(c * np.log(float(c * n) / float(cs * cl))
                     * 1e6 + 0.5))
    assert r["c"] == c and r["mi_term_micro"] == t


def test_segment_target_encoding_parity_and_shrinkage():
    import __ray_entry__ as E
    from wsid_ray.pipelines.mlstats import segment_target_encoding
    got = _canon(segment_target_encoding(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["segment_target_encoding"],
                       tables=("orders", "customer")))
    pd.testing.assert_frame_equal(got, exp)
    # the smoothed encoding lies between group mean and global mean
    gm = got["sum_cents"].sum() / got["n"].sum()
    for _, r in got.iterrows():
        mean = r["sum_cents"] / r["n"]
        lo, hi = sorted((mean, gm))
        assert lo * 1e6 - 1e6 <= r["enc_micro_cents"] <= hi * 1e6 + 1e6


def test_doc_feature_hash_parity_and_mass():
    import __ray_entry__ as E
    from wsid_ray.pipelines.queries import q_doc_feature_hash
    got = _canon(q_doc_feature_hash(SF).to_pandas())
    exp = _canon(_duck(E.oracle_sql()["doc_feature_hash"],
                       tables=("documents",)))
    pd.testing.assert_frame_equal(got, exp)
    assert got["bucket"].between(0, 63).all()
    # bucket mass per doc == whitespace token count (nothing dropped)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    ntok = docs.set_index("doc_id")["text"].str.split().str.len()
    mass = got.groupby("doc_id")["n"].sum()
    assert (mass == ntok.loc[mass.index]).all()
