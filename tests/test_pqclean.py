"""Metadata-free parquet reads (sources/pqclean).

The driver testdata footers carry a pandas metadata dict that makes
pyarrow.Schema unhashable; the clean reader must strip it so the
streaming executor's schema dedup (set of schemas) works.
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wsid_ray.sources.pqclean import clean_schema, read_parquet_clean


@pytest.fixture(scope="module")
def pandas_meta_parquet(tmp_path_factory):
    """A parquet file written via pandas — carries the b'pandas' metadata
    blob, exactly like the driver's testdata tables."""
    d = tmp_path_factory.mktemp("pqclean")
    path = os.path.join(d, "t.parquet")
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"],
                  "c": [1.5, 2.5, 3.5]}).to_parquet(path)
    s = pq.read_schema(path)
    assert b"pandas" in (s.metadata or {})
    with pytest.raises(TypeError):
        hash(s)  # the condition under test
    return path


def test_clean_schema_strips_metadata_and_prunes(pandas_meta_parquet):
    s = clean_schema(pandas_meta_parquet, columns=["a", "c"])
    assert s.names == ["a", "c"]
    assert s.metadata is None
    hash(s)  # hashable again


def test_clean_schema_unknown_column_falls_back(pandas_meta_parquet):
    assert clean_schema(pandas_meta_parquet, columns=["nope"]) is None
    assert clean_schema("/does/not/exist.parquet") is None


def test_read_parquet_clean_blocks_are_hashable(pandas_meta_parquet):
    ds = read_parquet_clean(pandas_meta_parquet, columns=["a", "b"])
    t = ds.take_batch(3, batch_format="pyarrow")
    assert t.schema.metadata is None
    hash(t.schema)
    assert t.column_names == ["a", "b"]
    assert t["a"].to_pylist() == [1, 2, 3]


def test_read_parquet_clean_directory(pandas_meta_parquet):
    # directory input resolves the footer via the first file found
    d = os.path.dirname(pandas_meta_parquet)
    s = clean_schema(d)
    assert s is not None and s.metadata is None


def test_jsonl_csv_sources_match_parquet():
    """The three ingest paths must produce identical rows and types."""
    import pyarrow.parquet as pq

    from wsid_ray.sources.textfiles import (read_documents_csv,
                                            read_documents_jsonl)

    sf = "/root/testdata/sf0.001"
    want = pq.read_table(f"{sf}/documents.parquet") \
        .select(["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    for reader in (read_documents_jsonl, read_documents_csv):
        got = reader(sf, columns=["doc_id", "text"]).to_pandas() \
            .sort_values("doc_id", ignore_index=True)
        assert got["doc_id"].dtype == want["doc_id"].dtype
        assert got.equals(want), reader.__name__


def test_jsonl_csv_sink_round_trip(tmp_path):
    """write_json / write_csv shards must read back to the same rows."""
    import pyarrow as pa
    import ray.data as rd

    from wsid_ray.sources.textfiles import write_csv, write_jsonl

    t = pa.table({"doc_id": pa.array([3, 1, 2], type=pa.int64()),
                  "text": pa.array(["alpha beta", "gamma", "delta eps"])})
    ds = rd.from_arrow(t)
    jd, cd = str(tmp_path / "j"), str(tmp_path / "c")
    write_jsonl(ds, jd)
    write_csv(ds, cd)
    want = t.to_pandas().sort_values("doc_id", ignore_index=True)
    got_j = rd.read_json(jd).to_pandas() \
        .sort_values("doc_id", ignore_index=True)[want.columns]
    got_c = rd.read_csv(cd).to_pandas() \
        .sort_values("doc_id", ignore_index=True)[want.columns]
    assert got_j.equals(want)
    assert got_c.equals(want)


def test_range_partitioned_sink_round_trip(tmp_path):
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data as rd

    from wsid_ray.sources.rangesink import write_range_partitioned

    rng_vals = (np.arange(10_000, dtype=np.int64) * 7919) % 1_000_000
    import pandas as pd
    df = pd.DataFrame({"k": np.arange(10_000, dtype=np.int64),
                       "cents": rng_vals})
    out = str(tmp_path / "ranged")
    splits = write_range_partitioned(rd.from_pandas(df), "cents", out,
                                     num_partitions=4, bin_width=1_000)
    assert len(splits) == 3 and splits == sorted(splits)

    dset = pads.dataset(out, partitioning="hive")
    tb = dset.to_table()
    assert tb.num_rows == len(df)
    # partitions hold disjoint, ordered ranges and are roughly equi-depth
    pdf = tb.to_pandas()
    pdf["part_id"] = pdf["part_id"].astype(int)
    bounds = [-1] + list(splits) + [2_000_000]
    sizes = []
    for pid, g in pdf.groupby("part_id"):
        assert g["cents"].min() > bounds[pid] - 1
        assert g["cents"].max() < bounds[pid + 1]
        sizes.append(len(g))
    assert len(sizes) == 4
    assert max(sizes) < 2 * min(sizes)  # equi-depth within histogram bin
    # range pruning: reading one partition touches only its rows
    one = dset.to_table(filter=pads.field("part_id") == 0)
    assert 0 < one.num_rows < len(df)
