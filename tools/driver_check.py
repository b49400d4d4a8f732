"""Local replica of the driver's correctness gate.

Runs each ``queries()`` entry and its ``oracle_sql()`` (DuckDB over the
same parquet) side by side at sf0.01 and reports rows / schema / value
match.  The driver sorts columns by name before hashing values and the
hash is dtype-sensitive, so this harness compares dtypes explicitly and
then values after a canonical row sort.

Usage::

    python tools/driver_check.py [query ...]     # default: all with SQL
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

SF_DIR = Path("/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    if not isinstance(res, pd.DataFrame):
        raise TypeError(f"unexpected result type {type(res)}")
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:  # pandas StringDtype vs object is not a real diff
        if str(df[c].dtype) == "string":
            df[c] = df[c].astype(object)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
        df = df.reset_index(drop=True)
    return df


def check(name: str, fn, sql: str | None) -> dict:
    out: dict = {"rows_match": None, "schema_match": None,
                 "value_match": None, "err": None}
    try:
        eng = _canon(_to_pandas(fn(str(SF_DIR))))
    except Exception as e:  # noqa: BLE001
        out["err"] = f"engine: {e!r}"
        return out
    out["engine_rows"] = len(eng)
    if sql is None:
        out["err"] = "no_oracle"
        return out
    try:
        con = duckdb.connect()
        for t in TABLES:
            p = SF_DIR / f"{t}.parquet"
            if p.exists():
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        ora = _canon(con.execute(sql).fetchdf())
    except Exception as e:  # noqa: BLE001
        out["err"] = f"oracle: {e!r}"
        return out
    out["oracle_rows"] = len(ora)
    out["rows_match"] = len(eng) == len(ora)
    out["schema_match"] = list(eng.columns) == list(ora.columns)
    if not out["schema_match"]:
        out["err"] = f"cols engine={list(eng.columns)} oracle={list(ora.columns)}"
        return out
    dtypes_eng = [str(t) for t in eng.dtypes]
    dtypes_ora = [str(t) for t in ora.dtypes]
    if dtypes_eng != dtypes_ora:
        out["value_match"] = False
        out["err"] = f"dtypes engine={dtypes_eng} oracle={dtypes_ora}"
        return out
    if out["rows_match"]:
        try:
            pd.testing.assert_frame_equal(eng, ora, check_exact=True)
            out["value_match"] = True
        except AssertionError as e:
            out["value_match"] = False
            out["err"] = str(e).split("\n")[0][:200]
    return out


def main() -> None:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    sqls = entrymod.oracle_sql()
    wanted = sys.argv[1:] or [k for k in queries if k in sqls]
    results = {}
    for name in wanted:
        if name not in queries:
            print(f"{name}: UNKNOWN QUERY", flush=True)
            continue
        r = check(name, queries[name], sqls.get(name))
        results[name] = r
        ok = r.get("value_match")
        tag = "PASS" if ok else ("rows-only" if r.get("err") == "no_oracle"
                                 else "FAIL")
        print(f"{name}: {tag} {json.dumps(r, default=str)}", flush=True)
    ray.shutdown()
    n_fail = sum(1 for r in results.values()
                 if r.get("value_match") is False or
                 r.get("rows_match") is False or
                 (r.get("err") and r.get("err") != "no_oracle"))
    print(f"\n{len(results)} checked, {n_fail} failing")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
