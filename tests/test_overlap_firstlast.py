"""Tests for source gram overlap and per-user first/last panels."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def test_user_first_last_events_parity():
    from wsid_ray.pipelines.queries import q_user_first_last_events
    got = q_user_first_last_events(SF).to_pandas() \
        .sort_values("user_id", ignore_index=True)
    exp = _duck("""
        WITH fr AS (SELECT user_id, event_id, event_type,
                           row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rka,
                           row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rkd,
                           CAST(count(*) OVER (PARTITION BY user_id)
                                AS BIGINT) AS n
                    FROM events)
        SELECT f.user_id, f.event_id AS first_event_id,
               f.event_type AS first_type, l.event_id AS last_event_id,
               l.event_type AS last_type, f.n
        FROM (SELECT * FROM fr WHERE rka = 1) f
        JOIN (SELECT * FROM fr WHERE rkd = 1) l USING (user_id)
        ORDER BY user_id""")
    pd.testing.assert_frame_equal(got, exp)
    one = got[got["n"] == 1]
    assert (one["first_event_id"] == one["last_event_id"]).all()


def test_source_gram_overlap_symmetric_invariants():
    from wsid_ray.pipelines.queries import q_source_gram_overlap
    got = q_source_gram_overlap(SF).to_pandas()
    # canonical ordering and positive counts
    assert (got["source_a"] < got["source_b"]).all()
    assert (got["n_shared"] >= 1).all()
    # no duplicate pairs
    assert not got.duplicated(["source_a", "source_b"]).any()


def test_orc_ingest_parity():
    from wsid_ray.sources.textfiles import read_documents_orc
    got = read_documents_orc(SF).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    exp = _duck("SELECT * FROM documents ORDER BY doc_id")
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  exp[sorted(exp.columns)])
    # columnar pruning path returns only the requested columns
    two = read_documents_orc(SF, columns=["doc_id", "text"])
    assert set(two.schema().names) == {"doc_id", "text"}


def test_user_cum_distinct_types_parity():
    from wsid_ray.pipelines.sequences import user_cum_distinct_types
    got = user_cum_distinct_types(SF).to_pandas() \
        .sort_values(["user_id", "event_id"], ignore_index=True)
    exp = _duck("""
        WITH cd AS (SELECT event_id, ts, user_id,
                           CASE WHEN row_number() OVER (
                               PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) = 1
                                THEN 1 ELSE 0 END AS fst
                    FROM events)
        SELECT event_id, user_id,
               CAST(sum(fst) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_types
        FROM cd ORDER BY user_id, event_id""")
    pd.testing.assert_frame_equal(got, exp)
    # monotone per user, bounded by the type universe
    assert got["cum_types"].between(1, 5).all()


def test_orc_sink_round_trip(tmp_path):
    import ray.data as rd
    from wsid_ray.sources.textfiles import write_orc
    import pyarrow.orc as paorc
    import glob
    src = rd.read_parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "orc_out")
    write_orc(src, out)
    files = sorted(glob.glob(out + "/part-*.orc"))
    assert files
    back = pd.concat([paorc.ORCFile(f).read().to_pandas()
                      for f in files], ignore_index=True) \
        .sort_values("doc_id", ignore_index=True)
    exp = _duck("SELECT * FROM documents ORDER BY doc_id")
    pd.testing.assert_frame_equal(back[sorted(back.columns)],
                                  exp[sorted(exp.columns)])


def test_event_type_transitions_parity():
    from wsid_ray.pipelines.queries import q_event_type_transitions
    got = q_event_type_transitions(SF).to_pandas() \
        .sort_values(["prev_type", "event_type"], ignore_index=True)
    exp = _duck("""
        WITH mtr AS (SELECT event_type, lag(event_type) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id)
                         AS prev_type FROM events)
        SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
        FROM mtr WHERE prev_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2""")
    pd.testing.assert_frame_equal(got, exp)
    # total transitions == events - users (each user loses its first)
    tot = _duck("SELECT count(*) AS e, count(DISTINCT user_id) AS u "
                "FROM events").iloc[0]
    assert got["n"].sum() == tot["e"] - tot["u"]


def test_dup_component_sizes_mass():
    from wsid_ray.pipelines.queries import (q_doc_dup_components,
                                            q_dup_component_sizes)
    hist = q_dup_component_sizes(SF).to_pandas()
    comp = q_doc_dup_components(SF).to_pandas()
    assert (hist["component_size"] >= 2).all()   # components are >= a pair
    assert (hist["component_size"] * hist["n_components"]).sum() \
        == len(comp)


def test_events_dow_hour_heatmap_parity():
    from wsid_ray.pipelines.queries import q_events_dow_hour_heatmap
    got = q_events_dow_hour_heatmap(SF).to_pandas() \
        .sort_values(["dow", "hour"], ignore_index=True)
    exp = _duck("""
        SELECT CAST(isodow(ts) AS BIGINT) AS dow,
               CAST(hour(ts) AS BIGINT) AS hour,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")
    pd.testing.assert_frame_equal(got, exp)
    assert got["dow"].between(1, 7).all()
    assert got["hour"].between(0, 23).all()


def test_user_median_gap_parity():
    from wsid_ray.pipelines.queries import q_user_median_gap
    got = q_user_median_gap(SF).to_pandas() \
        .sort_values("user_id", ignore_index=True)
    exp = _duck("""
        WITH gg AS (SELECT user_id, event_id,
                           epoch_us(ts) - epoch_us(lag(ts) OVER (
                               PARTITION BY user_id
                               ORDER BY ts, event_id)) AS gap_us
                    FROM events),
        gv AS (SELECT * FROM gg WHERE gap_us IS NOT NULL),
        gr AS (SELECT user_id, gap_us,
                      row_number() OVER (PARTITION BY user_id
                          ORDER BY gap_us, event_id) AS rn,
                      CAST(count(*) OVER (PARTITION BY user_id)
                           AS BIGINT) AS n
               FROM gv)
        SELECT user_id, n, CAST(gap_us AS BIGINT) AS median_gap_us
        FROM gr WHERE rn = (n * 50 + 99) // 100
        ORDER BY user_id""")
    pd.testing.assert_frame_equal(got, exp)
    # one median row per user that has >= 2 events
    multi = _duck("SELECT count(*) AS c FROM (SELECT user_id FROM events"
                  " GROUP BY user_id HAVING count(*) >= 2)").iloc[0]["c"]
    assert len(got) == multi
