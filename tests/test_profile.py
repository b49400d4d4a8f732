"""Tests for stages/profile.py: table profiling and unpivot (melt)."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_profile_orders_parity():
    from wsid_ray.sources.pqclean import read_parquet_clean
    from wsid_ray.stages.profile import profile_table
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    got = profile_table(read_parquet_clean(f"{SF}/orders.parquet"),
                        cols).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{SF}/orders.parquet')")
    exp = con.sql(" UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(count(*) - count({c}) AS BIGINT) AS n_null, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM orders"
        for c in sorted(cols))).df()
    pd.testing.assert_frame_equal(got, exp)


def test_profile_nulls_excluded_from_distinct():
    from wsid_ray.stages.profile import profile_table
    tb = pa.table({"a": [1, 1, None, 3, None], "b": ["x", None, "x", "y",
                                                     "y"]})
    got = profile_table(rd.from_arrow(tb), ["a", "b"],
                        num_buckets=2).to_pandas().set_index("col_name")
    assert got.loc["a"].tolist() == [5, 2, 2]   # distinct {1,3}, not NULL
    assert got.loc["b"].tolist() == [5, 1, 2]   # distinct {x,y}


def test_unpivot_round_trip():
    from wsid_ray.stages.profile import unpivot
    wide = rd.from_arrow(pa.table({
        "id": [1, 2], "n_a": [3, 0], "n_b": [0, 5]}))
    long = unpivot(wide, ["id"], "var", "val").to_pandas()
    long = long.sort_values(["id", "var"], ignore_index=True)
    assert long.to_dict("list") == {
        "id": [1, 1, 2, 2], "var": ["n_a", "n_b", "n_a", "n_b"],
        "val": [3, 0, 0, 5]}
