"""JSONL / CSV document sources — format breadth for the ingest layer.

A complete engine must ingest the row formats corpora actually arrive in
(web-crawl dumps are JSONL; many label/metadata feeds are CSV), not only
parquet.  These readers wrap ``ray.data.read_json`` / ``read_csv`` and
are driver-checked end-to-end: the SQL-checked queries run the SAME
operator over the JSONL/CSV conversion of the documents table and must
hash-match the oracle computed from the parquet view — any divergence in
parsing, typing or row order sensitivity fails the check.

The conversions are derived deterministically from the driver's parquet
(one atomic write per (version, sf_dir), cached under /tmp) — test
plumbing only; production points the same readers at real files.

Scale note: JSONL/CSV are row formats — column pruning cannot skip bytes
at the source the way parquet row groups do; ``columns=`` prunes
post-parse.  Ray parallelises by file, so shard big corpora into many
files upstream (the readers accept directories).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

_CONV_VERSION = "v1"
_ROOT = "/tmp/wsid_ray_textsrc"


def _converted(sf_dir: str, fmt: str) -> str:
    """Deterministic JSONL/CSV conversion of documents.parquet (atomic,
    idempotent, versioned)."""
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    src = f"{sf_dir}/documents.parquet"
    # content key (ADVICE r03): regenerating the parquet with different
    # content at the same path must not serve a stale conversion — key
    # the cache on the source's footer identity (rows + size + mtime_ns),
    # not just its path.
    st = os.stat(src)
    meta = pq.read_metadata(src)
    key = (f"{sf_dir.strip('/').replace('/', '_')}"
           f"-{meta.num_rows}-{st.st_size}-{st.st_mtime_ns}")
    out_dir = os.path.join(_ROOT, _CONV_VERSION, key)
    path = os.path.join(out_dir, f"documents.{fmt}")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(src)
    tmp = path + ".tmp"
    if fmt == "jsonl":
        # sorted keys + explicit separators: byte-deterministic output
        import json
        with open(tmp, "w", encoding="utf-8") as f:
            for row in t.to_pylist():
                f.write(json.dumps(row, sort_keys=True,
                                   separators=(",", ":")) + "\n")
    else:
        pacsv.write_csv(t, tmp)
    os.rename(tmp, path)  # atomic: concurrent callers converge
    return path


def read_documents_jsonl(sf_dir: str,
                         columns: list[str] | None = None) -> rd.Dataset:
    ds = rd.read_json(_converted(sf_dir, "jsonl"))
    return ds.select_columns(columns) if columns else ds


def read_documents_csv(sf_dir: str,
                       columns: list[str] | None = None) -> rd.Dataset:
    import pyarrow.csv as pacsv
    # pin the parse schema from the parquet footer: CSV carries no types,
    # and inference drift (e.g. int32 vs int64) would flap downstream
    from .pqclean import clean_schema
    schema = clean_schema(f"{sf_dir}/documents.parquet")
    conv = pacsv.ConvertOptions(
        column_types={f.name: f.type for f in schema} if schema else {})
    ds = rd.read_csv(_converted(sf_dir, "csv"), convert_options=conv)
    return ds.select_columns(columns) if columns else ds


def write_jsonl(ds: rd.Dataset, out_dir: str) -> None:
    """JSONL sink (one shard file per block — Ray's write_json; row format
    for downstream tools that don't speak parquet)."""
    ds.write_json(out_dir)


def write_csv(ds: rd.Dataset, out_dir: str) -> None:
    """CSV sink (one shard per block via Ray's write_csv)."""
    ds.write_csv(out_dir)


def _converted_orc(sf_dir: str, num_shards: int = 4) -> str:
    """Deterministic sharded ORC conversion of documents.parquet (same
    content-keyed cache contract as _converted) — ORC is the third row
    ingest format beside JSONL/CSV, and unlike those it is columnar:
    the reader's ``columns=`` prunes at the stripe level, not
    post-parse."""
    import pyarrow.orc as paorc
    import pyarrow.parquet as pq

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    meta = pq.read_metadata(src)
    key = (f"{sf_dir.strip('/').replace('/', '_')}"
           f"-{meta.num_rows}-{st.st_size}-{st.st_mtime_ns}")
    out_dir = os.path.join(_ROOT, _CONV_VERSION, key, "orc")
    done = os.path.join(out_dir, "_done")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(src)
    n = t.num_rows
    step = max(1, -(-n // num_shards))
    for s, off in enumerate(range(0, n, step)):
        tmp = os.path.join(out_dir, f"part-{s:03d}.orc.tmp")
        paorc.write_table(t.slice(off, step), tmp)
        os.rename(tmp, os.path.join(out_dir, f"part-{s:03d}.orc"))
    with open(done + ".tmp", "w") as f:
        f.write("ok")
    os.rename(done + ".tmp", done)
    return out_dir


def read_documents_orc(sf_dir: str,
                       columns: list[str] | None = None) -> rd.Dataset:
    """ORC source: Ray parallelises by file (read_binary_files), each
    task decodes its shard with pyarrow.orc reading ONLY the requested
    columns — columnar pruning at the source, unlike JSONL/CSV."""
    import glob
    out_dir = _converted_orc(sf_dir)
    # explicit shard list: the directory also holds the _done marker
    paths = sorted(glob.glob(os.path.join(out_dir, "part-*.orc")))

    def decode(t: pa.Table) -> pa.Table:
        import io

        import pyarrow.orc as paorc
        tabs = [paorc.ORCFile(io.BytesIO(b.as_py())).read(columns=columns)
                for b in t["bytes"]]
        return pa.concat_tables(tabs)

    return rd.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow", batch_size=1)


def write_orc(ds: rd.Dataset, out_dir: str) -> None:
    """ORC sink — one shard file per block (completes the format matrix:
    parquet / JSONL / CSV / ORC all read AND written).  Implemented as a
    per-block map that writes its own shard (atomic rename) because Ray
    Data ships no native ORC datasink; shard names are content-hashed so
    re-runs converge."""
    import hashlib
    import io

    import pyarrow.orc as paorc

    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64())})
        buf = io.BytesIO()
        paorc.write_table(t, buf)
        payload = buf.getvalue()
        name = hashlib.md5(payload).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.orc")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.rename(tmp, path)
        return pa.table({"path": pa.array([path], type=pa.string()),
                         "rows": pa.array([t.num_rows],
                                          type=pa.int64())})

    # materialize the tiny manifest stream to force the writes
    ds.map_batches(write_block, batch_format="pyarrow",
                   batch_size=None).materialize()
