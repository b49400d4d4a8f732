"""Tests for the KG support rollup and the per-language vocabulary
panel."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_triple_support_covers_dedup_triples():
    from wsid_ray.pipelines.queries import q_triple_support, q_triples
    sup = q_triple_support(SF).to_pandas()
    ded = q_triples(SF).to_pandas()
    sup_keys = set(zip(sup["subj"], sup["pred"], sup["obj"]))
    ded_keys = set(zip(ded["subj"], ded["pred"], ded["obj"]))
    # same canonical triple set, one support row each
    assert sup_keys == ded_keys
    assert len(sup) == len(sup_keys)
    assert (sup["support"] >= 1).all()
    assert (sup["n_convs"] >= 1).all()
    assert (sup["n_convs"] <= sup["support"]).all()
    assert (sup["first_ts"] <= sup["last_ts"]).all()


def test_lang_vocab_stats_parity():
    from wsid_ray.pipelines.queries import q_lang_vocab_stats
    got = q_lang_vocab_stats(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    import __ray_entry__ as E
    tok = E._sql_token_expr()
    exp = con.sql(f"""
        WITH vtoks AS (SELECT lang, {tok} AS toks FROM documents),
        vex AS (SELECT lang, unnest(toks) AS tk FROM vtoks)
        SELECT l.lang, l.n_docs, l.n_tokens,
               coalesce(d.n_types, 0) AS n_types
        FROM (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(coalesce(sum(len(toks)), 0) AS BIGINT)
                         AS n_tokens
              FROM vtoks GROUP BY lang) l
        LEFT JOIN (SELECT lang, CAST(count(DISTINCT tk) AS BIGINT)
                       AS n_types FROM vex GROUP BY lang) d
            ON d.lang = l.lang
        ORDER BY l.lang""").df()
    pd.testing.assert_frame_equal(got, exp)
    # types never exceed occurrences
    assert (got["n_types"] <= got["n_tokens"]).all()


def test_conv_turn_taking_parity():
    from wsid_ray.fixtures import transcripts_dir
    from wsid_ray.pipelines.queries import q_conv_turn_taking
    got = q_conv_turn_taking(SF).to_pandas() \
        .sort_values("conv_id", ignore_index=True)
    con = duckdb.connect()
    exp = con.sql(f"""
        WITH tt AS (SELECT conv_id, role,
                           lag(role) OVER (PARTITION BY conv_id
                               ORDER BY turn_idx) AS prev
                    FROM read_parquet('{transcripts_dir(SF)}/*.parquet'))
        SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
               CAST(count(*) FILTER (prev IS NOT NULL AND role <> prev)
                    AS BIGINT) AS n_switches,
               CAST(count(DISTINCT role) AS BIGINT) AS n_roles
        FROM tt GROUP BY conv_id ORDER BY conv_id""").df()
    pd.testing.assert_frame_equal(got, exp)
    assert (got["n_switches"] < got["n_turns"]).all()


def test_term_trend_daily_totals_match_mention_counts():
    from wsid_ray.pipelines.queries import (q_mention_counts,
                                            q_term_trend_daily)
    trend = q_term_trend_daily(SF).to_pandas()
    counts = q_mention_counts(SF).to_pandas()
    roll = trend.groupby("term", as_index=False)["n"].sum()
    m = roll.merge(counts, on="term", how="outer", suffixes=("_t", "_c"))
    assert m["n_t"].fillna(0).astype("int64") \
        .equals(m["n_c"].fillna(0).astype("int64"))


def test_source_quality_rollup_consistency():
    from wsid_ray.pipelines.queries import (q_doc_quality_filter,
                                            q_source_quality_rollup)
    roll = q_source_quality_rollup(SF).to_pandas()
    passed = q_doc_quality_filter(SF).to_pandas()
    assert roll["n_pass"].sum() == len(passed)
    assert (roll["n_pass"] <= roll["n_docs"]).all()
    assert (roll["pass_micro"]
            == roll["n_pass"] * 1_000_000 // roll["n_docs"]).all()


def test_embedding_dim_stats_invariants():
    import pyarrow.parquet as pq
    import numpy as np
    from wsid_ray.pipelines.queries import q_embedding_dim_stats
    got = q_embedding_dim_stats(SF).to_pandas().sort_values(
        "dim", ignore_index=True)
    tb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    mat = np.stack(tb["embedding"].to_pylist()).astype(np.float64)
    q = np.floor(mat * 1_000_000 + 0.5).astype(np.int64)
    assert (got["n"] == len(mat)).all()
    assert got["sum_micro"].tolist() == q.sum(axis=0).tolist()
    assert got["min_micro"].tolist() == q.min(axis=0).tolist()
    assert got["max_micro"].tolist() == q.max(axis=0).tolist()


def test_sense_inventory_stats_consistency():
    from wsid_ray.pipelines.queries import (q_sense_inventory,
                                            q_sense_inventory_stats)
    inv = q_sense_inventory(SF)
    st = q_sense_inventory_stats(SF)
    assert st["n_tokens"].sum() == len(inv)
    assert set(st["term"]) == set(inv["term"])
    assert (st["n_senses"] >= 1).all()


def test_mention_link_rate_consistency():
    from wsid_ray.pipelines.queries import (q_mention_link_rate,
                                            q_mentions_linked)
    rate = q_mention_link_rate(SF).to_pandas()
    lm = q_mentions_linked(SF).to_pandas()
    assert rate["n_mentions"].sum() == len(lm)
    assert rate["n_linked"].sum() == int((lm["sense_id"] >= 0).sum())
    assert rate["link_micro"].between(0, 1_000_000).all()


def test_triples_by_pred_daily_mass():
    from wsid_ray.pipelines.queries import (q_triples,
                                            q_triples_by_pred_daily)
    tr = q_triples(SF).to_pandas()
    daily = q_triples_by_pred_daily(SF).to_pandas()
    assert daily["n"].sum() == len(tr)
    assert set(daily["pred"]) == set(tr["pred"])


def test_doc_containment_pairs_asymmetry():
    from wsid_ray.pipelines.queries import q_doc_containment_pairs
    got = q_doc_containment_pairs(SF).to_pandas()
    assert got[["cont_a_micro", "cont_b_micro"]].stack() \
        .between(0, 1_000_000).all()
    assert (got[["cont_a_micro", "cont_b_micro"]].max(axis=1)
            >= 800_000).all()


def test_tool_usage_stats_parity():
    from wsid_ray.fixtures import transcripts_dir
    from wsid_ray.pipelines.queries import q_tool_usage_stats
    got = q_tool_usage_stats(SF).to_pandas() \
        .sort_values("tool", ignore_index=True)
    con = duckdb.connect()
    exp = con.sql(f"""
        SELECT tool, CAST(count(*) AS BIGINT) AS n_turns,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
               CAST(count(DISTINCT role) AS BIGINT) AS n_roles
        FROM read_parquet('{transcripts_dir(SF)}/*.parquet')
        WHERE tool <> '' GROUP BY tool ORDER BY tool""").df()
    pd.testing.assert_frame_equal(got, exp)


def test_orders_benford_mass_and_shape():
    from wsid_ray.pipelines.queries import q_orders_benford
    got = q_orders_benford(SF).to_pandas()
    assert set(got["digit"]).issubset(set(range(1, 10)))
    assert got["share_micro"].sum() <= 1_000_000
    con = duckdb.connect()
    n = con.sql(f"SELECT count(*) AS c FROM "
                f"read_parquet('{SF}/orders.parquet')").df().iloc[0]["c"]
    assert got["n"].sum() == n


def test_conv_response_latency_consistency():
    from wsid_ray.fixtures import transcripts_dir
    from wsid_ray.pipelines.queries import q_conv_response_latency
    got = q_conv_response_latency(SF).to_pandas()
    con = duckdb.connect()
    exp = con.sql(f"""
        WITH rl AS (SELECT conv_id, role, ts,
                           lag(role) OVER w AS prev_role,
                           lag(ts) OVER w AS prev_ts
                    FROM read_parquet('{transcripts_dir(SF)}/*.parquet')
                    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
        SELECT conv_id,
               CAST(count(*) FILTER (role = 'assistant'
                    AND prev_role = 'user') AS BIGINT) AS n_responses,
               CAST(coalesce(sum(epoch_us(ts) - epoch_us(prev_ts))
                    FILTER (role = 'assistant' AND prev_role = 'user'),
                    0) AS BIGINT) AS sum_gap_us
        FROM rl GROUP BY conv_id""").df()
    m = got.sort_values("conv_id", ignore_index=True)
    e = exp.sort_values("conv_id", ignore_index=True)
    pd.testing.assert_frame_equal(m, e)
    assert (m.loc[m["n_responses"] == 0, "sum_gap_us"] == 0).all()


def test_term_association_rules_invariants():
    from wsid_ray.pipelines.queries import q_term_association_rules
    got = q_term_association_rules(SF).to_pandas()
    assert (got["term_a"] < got["term_b"]).all()
    assert (got["n_both"] <= got[["n_a", "n_b"]].min(axis=1)).all()
    assert (got["n_convs"] >= got[["n_a", "n_b"]].max(axis=1)).all()
    # lift contract recompute
    import numpy as np
    lift = (got["n_both"].to_numpy().astype(float)
            * got["n_convs"].to_numpy()
            / (got["n_a"].to_numpy().astype(float)
               * got["n_b"].to_numpy()))
    assert (got["lift_micro"]
            == np.floor(lift * 1e6 + 0.5).astype("int64")).all()


def test_source_dedup_impact_mass():
    from wsid_ray.pipelines.queries import (q_doc_near_dup_drops,
                                            q_source_dedup_impact)
    imp = q_source_dedup_impact(SF).to_pandas()
    drops = q_doc_near_dup_drops(SF).to_pandas()
    assert imp["n_dropped"].sum() == len(drops)
    assert (imp["n_dropped"] <= imp["n_docs"]).all()
    assert imp["keep_micro"].between(0, 1_000_000).all()


def test_conv_sense_diversity_consistency():
    from wsid_ray.pipelines.queries import (q_conv_sense_diversity,
                                            q_mentions_linked)
    div = q_conv_sense_diversity(SF).to_pandas()
    lm = q_mentions_linked(SF).to_pandas()
    assert div["n_mentions"].sum() == len(lm)
    assert (div["n_terms"] <= div["n_mentions"]).all()
    # a conv's distinct senses can't exceed its linked mentions
    linked_per = lm[lm["sense_id"] >= 0].groupby("conv_id").size()
    m = div.set_index("conv_id")["n_senses"]
    common = m.index.intersection(linked_per.index)
    assert (m.loc[common] <= linked_per.loc[common]).all()


def test_nation_segment_entropy_bounds():
    import numpy as np
    from wsid_ray.pipelines.queries import q_nation_segment_entropy
    got = q_nation_segment_entropy(SF).to_pandas()
    # entropy bounded by ln(n_segments) (+1 micro for rounding slack)
    cap = np.floor(np.log(got["n_segments"]) * 1e6 + 0.5) + 1
    assert (got["entropy_micro"] <= cap).all()
    assert (got["entropy_micro"] >= 0).all()
    assert (got.loc[got["n_segments"] == 1, "entropy_micro"] == 0).all()


def test_triple_conflicts_consistency():
    from wsid_ray.config import PRED_ADDRESSES
    from wsid_ray.pipelines.queries import (q_triple_conflicts,
                                            q_triples)
    conf = q_triple_conflicts(SF).to_pandas()
    tr = q_triples(SF).to_pandas()
    addr = tr[tr["pred"] == PRED_ADDRESSES]
    per = addr.groupby("subj")["obj"].nunique()
    assert set(conf["subj"]) == set(per[per > 1].index)
    assert (conf["n_objs"] == conf["objs"].str.count(",") + 1).all()


def test_key_uniqueness_report_clean_fixture():
    from wsid_ray.pipelines.queries import q_key_uniqueness_report
    got = q_key_uniqueness_report(SF).to_pandas()
    assert len(got) == 7
    # driver fixtures have clean primary keys
    assert (got["n_dup_keys"] == 0).all()
    assert (got["n_rows"] == got["n_keys"]).all()


def test_role_token_stats_mass():
    from wsid_ray.pipelines.queries import (q_role_token_stats,
                                            q_unigram_counts)
    got = q_role_token_stats(SF).to_pandas()
    uni = q_unigram_counts(SF).to_pandas()
    assert got["n_tokens"].sum() == uni["n"].sum()
    assert set(got["role"]) == {"user", "assistant", "tool"}


def test_user_burstiness_contract():
    import numpy as np
    from wsid_ray.pipelines.queries import q_user_burstiness
    from wsid_ray.pipelines.sequences import user_daily_dense
    got = q_user_burstiness(SF).to_pandas().set_index("user_id")
    dense = user_daily_dense(SF).to_pandas()
    for uid, g in dense.groupby("user_id"):
        c = g["n_events"].to_numpy().astype("int64")
        d, sc, sc2 = len(c), int(c.sum()), int((c ** 2).sum())
        fano = float(d * sc2 - sc * sc) / float(d * sc)
        assert got.loc[uid, "fano_micro"] == int(np.floor(fano * 1e6
                                                          + 0.5))
    assert (got["n_events"] >= 1).all()


def test_pack_efficiency_consistency():
    from wsid_ray.pipelines.queries import (q_doc_pack_sequences,
                                            q_pack_efficiency)
    eff = q_pack_efficiency(SF).to_pandas().set_index("lang")
    packed = q_doc_pack_sequences(SF).to_pandas()
    per = packed.groupby("lang").agg(n_docs=("doc_id", "size"),
                                     n_tokens=("nt", "sum"),
                                     n_packs=("pack_id", "max"))
    for lang, row in per.iterrows():
        assert eff.loc[lang, "n_docs"] == row["n_docs"]
        assert eff.loc[lang, "n_tokens"] == row["n_tokens"]
        assert eff.loc[lang, "n_packs"] == row["n_packs"] + 1
    assert (eff["fill_micro"] > 0).all()


def test_session_length_histogram_mass():
    from wsid_ray.pipelines.queries import (q_session_length_histogram,
                                            q_user_sessions)
    hist = q_session_length_histogram(SF).to_pandas()
    sess = q_user_sessions(SF).to_pandas()
    assert hist["n_sessions"].sum() == len(sess)
    assert (hist["session_len"] * hist["n_sessions"]).sum() \
        == sess["n_events"].sum()


def test_doc_tfidf_novelty_contract():
    from wsid_ray.pipelines.queries import q_doc_tfidf_novelty
    got = q_doc_tfidf_novelty(SF).to_pandas()
    assert (got["n_terms"] <= 5).all()
    assert (got["mean_score_micro"]
            == got["sum_score_micro"] // got["n_terms"]).all()
