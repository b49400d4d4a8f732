"""Table profiling and unpivot (melt) — the data-quality intake pair.

``profile_table`` is the schema-audit operator every ingest pipeline
runs first: per column, row count, null count and EXACT distinct count
(SQL ``count(DISTINCT col)`` semantics — nulls excluded).  Row/null
counts fold per batch and shuffle one tiny row per (batch, column);
distinct counts reuse the bucketed exact-distinct machinery per column
(per-batch dedup first, so the shuffle moves pre-deduped values only).
At 100 TB the per-column distinct is the honest cost of an exact
answer — callers who can take ±2% should use hll_registers instead
(stages/groups.py); the two share the scale story deliberately.

``unpivot`` is the inverse of the pivot in pipelines/analytics.py: a
stateless per-batch melt from wide feature columns to (id, variable,
value) rows — embarrassingly parallel, no shuffle at all.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def profile_table(ds: rd.Dataset, columns: list[str],
                  num_buckets: int = 4) -> pa.Table:
    """Per-column profile of ``ds``: (col_name, n_rows, n_null,
    n_distinct), one row per column, sorted by col_name.  The result is
    k rows (k = len(columns)) — a driver-small table by construction."""
    from ..pipelines.analytics import bucketed_sum
    from ..stages.groups import distinct

    cols = sorted(columns)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "col_name": cols,
            "n_rows": [int(len(df))] * len(cols),
            "n_null": [int(df[c].isna().sum()) for c in cols]})

    counts = bucketed_sum(ds.map_batches(partial, batch_format="pandas"),
                          ["col_name"], ["n_rows", "n_null"],
                          num_buckets=num_buckets).to_pandas()
    counts = counts.set_index("col_name")

    n_distinct = {}
    for c in cols:
        one = ds.select_columns([c]).map_batches(
            lambda df, c=c: df.dropna(subset=[c]),
            batch_format="pandas")
        n_distinct[c] = distinct(one, [c], num_buckets=num_buckets).count()

    return pa.table({
        "col_name": cols,
        "n_rows": [int(counts.loc[c, "n_rows"]) for c in cols],
        "n_null": [int(counts.loc[c, "n_null"]) for c in cols],
        "n_distinct": [int(n_distinct[c]) for c in cols],
    }).cast(pa.schema([("col_name", pa.string()), ("n_rows", pa.int64()),
                       ("n_null", pa.int64()), ("n_distinct", pa.int64())]))


def unpivot(ds: rd.Dataset, id_cols: list[str], var_name: str,
            value_name: str,
            value_cols: list[str] | None = None) -> rd.Dataset:
    """Melt wide columns into (id_cols…, var_name, value_name) rows —
    per-batch ``pd.melt``, no shuffle.  ``value_cols=None`` melts every
    non-id column (sorted, so output order within a batch is stable)."""
    def melt(df: pd.DataFrame) -> pd.DataFrame:
        vcols = (sorted(c for c in df.columns if c not in id_cols)
                 if value_cols is None else value_cols)
        return df.melt(id_vars=id_cols, value_vars=vcols,
                       var_name=var_name, value_name=value_name)

    return ds.map_batches(melt, batch_format="pandas")
