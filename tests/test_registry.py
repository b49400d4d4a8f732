"""Driver-contract consistency guards: the queries()/oracle_sql()
registries must stay in lockstep (a dangling oracle key or an
accidentally-dropped query would silently shrink the correctness
gate), and every oracle must at least bind in DuckDB against the
driver's pre-registered views."""

import duckdb
import pytest

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def test_registry_oracle_lockstep():
    import __ray_entry__ as E
    qs = E.queries()
    osql = E.oracle_sql()
    # every oracle entry maps to a registered query
    dangling = sorted(set(osql) - set(qs))
    assert not dangling, f"oracle keys without queries: {dangling}"
    # rows-only queries are a deliberate, documented set
    rows_only = sorted(set(qs) - set(osql))
    assert rows_only == ["knn_ivf_topk", "knn_lsh_topk"], rows_only
    # every callable takes one positional sf_dir argument
    import inspect
    for name, fn in qs.items():
        params = [p for p in inspect.signature(fn).parameters.values()
                  if p.default is inspect.Parameter.empty
                  and p.kind in (p.POSITIONAL_ONLY,
                                 p.POSITIONAL_OR_KEYWORD)]
        assert len(params) == 1, (name, params)


def test_every_oracle_binds_in_duckdb():
    """EXPLAIN (bind + plan, no execution) each oracle over the same
    views the driver registers — catches typos, missing columns and
    stale artifact paths without paying an 86-query execution."""
    import __ray_entry__ as E
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    bad = {}
    for name, sql in E.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad[name] = repr(e)[:200]
    assert not bad, bad
