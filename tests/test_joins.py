"""J1-J5 join primitives (SURVEY.md §2.4)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from wsid_ray.stages.joins import broadcast_join, hash_join, semi_join


def ds_of(**cols):
    return rd.from_arrow(pa.table(cols))


def test_hash_join_inner():
    left = ds_of(k=["a", "b", "c", "a"], x=[1, 2, 3, 4])
    right = ds_of(k=["a", "b", "d"], y=[10, 20, 40])
    out = hash_join(left, right, on=["k"], num_buckets=4).to_pandas()
    got = sorted(map(tuple, out[["k", "x", "y"]].itertuples(index=False)))
    assert got == [("a", 1, 10), ("a", 4, 10), ("b", 2, 20)]


def test_hash_join_left():
    left = ds_of(k=["a", "z"], x=[1, 2])
    right = ds_of(k=["a"], y=[10])
    out = hash_join(left, right, on=["k"], how="left",
                    num_buckets=4).to_pandas()
    assert len(out) == 2
    z = out[out["k"] == "z"]
    assert z["y"].isna().all()


def test_broadcast_join():
    big = ds_of(k=["a", "b", "a"], x=[1, 2, 3])
    small = pd.DataFrame({"k": ["a", "b"], "name": ["A", "B"]})
    out = broadcast_join(big, small, on=["k"]).to_pandas()
    assert list(out.sort_values("x")["name"]) == ["A", "B", "A"]


def test_semi_and_anti_join():
    big = ds_of(k=["a", "b", "c"], x=[1, 2, 3])
    semi = semi_join(big, {"a", "c"}, "k").to_pandas()
    assert sorted(semi["k"]) == ["a", "c"]
    anti = semi_join(big, {"a", "c"}, "k", anti=True).to_pandas()
    assert list(anti["k"]) == ["b"]


def test_hash_join_single_bucket():
    """num_buckets=1 regression: _split_block must return a bare table
    (a 1-tuple would reach the join task unwrapped under num_returns=1)."""
    import pandas as pd
    import ray.data as rd
    from wsid_ray.stages.joins import hash_join
    left = rd.from_pandas(pd.DataFrame({"k": [1, 2], "a": ["x", "y"]}))
    right = rd.from_pandas(pd.DataFrame({"k": [2, 3], "b": ["p", "q"]}))
    out = hash_join(left, right, on=["k"], num_buckets=1).to_pandas()
    assert out.to_dict("records") == [{"k": 2, "a": "y", "b": "p"}]
