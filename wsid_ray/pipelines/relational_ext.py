"""Relational completions (SURVEY.md §2.4/§2.6 extensions): FULL OUTER
join reconciliation, INTERSECT set semantics, CUBE grouping sets, and
single-pass distributed moment sums (covariance / correlation).

Shared determinism contracts:
  * monetary values -> exact integer cents floor(x*100 + 0.5) (module
    float rule, see analytics.py);
  * moment sums use whole-dollar quantisation floor(x + 0.5) so squared
    terms keep int64 headroom per partial block, are combined in Python
    arbitrary-precision ints (never float accumulation), and only the
    FINAL exact integer is converted to float64 — DuckDB mirrors the
    same with HUGEINT sums cast to DOUBLE, so both sides round the same
    single integer once;
  * correlation is rounded half-up to 6 dp after an identical float
    operation order on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources.pqclean import read_parquet_clean
from ..stages.groups import bucketed_group_apply
from .analytics import _cents, bucketed_sum


def customer_order_event_recon(sf_dir: str,
                               num_buckets: int = 16) -> rd.Dataset:
    """FULL OUTER join (completes the J-family beyond inner/left/semi/
    anti/as-of): per-customer order totals reconciled against per-user
    event totals on the shared key, with COALESCE(…, 0) on both sides —
    the classic two-system reconciliation report.  Both inputs are
    pre-aggregated (one row per key) BEFORE the join, so the partitioned
    hash join shuffles aggregates, never raw rows."""
    from ..stages.joins import hash_join

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])

    def opart(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"k": df["o_custkey"],
                          "cents": _cents(df["o_totalprice"].to_numpy())})
        g = g.groupby("k", sort=True).agg(
            n_orders=("cents", "size"),
            order_cents=("cents", "sum")).reset_index()
        g["n_orders"] = g["n_orders"].astype("int64")
        return g

    oagg = bucketed_sum(orders.map_batches(opart, batch_format="pandas"),
                        ["k"], ["n_orders", "order_cents"],
                        num_buckets=num_buckets)

    events = read_parquet_clean(f"{sf_dir}/events.parquet",
                                columns=["user_id", "value"])

    def epart(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"k": df["user_id"],
                          "cents": _cents(df["value"].to_numpy())})
        g = g.groupby("k", sort=True).agg(
            n_events=("cents", "size"),
            event_cents=("cents", "sum")).reset_index()
        g["n_events"] = g["n_events"].astype("int64")
        return g

    eagg = bucketed_sum(events.map_batches(epart, batch_format="pandas"),
                        ["k"], ["n_events", "event_cents"],
                        num_buckets=num_buckets)

    joined = hash_join(oagg, eagg, on=["k"], how="outer",
                       num_buckets=num_buckets)
    out_schema = pa.schema([("k", pa.int64()),
                            ("n_orders", pa.int64()),
                            ("order_cents", pa.int64()),
                            ("n_events", pa.int64()),
                            ("event_cents", pa.int64())])

    def coalesce(t: pa.Table) -> pa.Table:
        cols = {"k": t["k"]}
        for name in out_schema.names[1:]:
            cols[name] = pc.fill_null(t[name].cast(pa.int64()), 0)
        return pa.table(cols)

    return joined.map_batches(coalesce, batch_format="pyarrow")


def _year_key_sets(sf_dir: str, year_a: int, year_b: int, mode: str,
                   num_buckets: int) -> rd.Dataset:
    """Shared INTERSECT / EXCEPT plan over order years: filter to the
    two years at the scan, per-batch distinct (custkey, year) pairs
    (each batch collapses to <= 2 rows per key), ONE bucketed shuffle
    on the key, then emit per the set operation — 'both' (INTERSECT:
    key seen in year_a AND year_b) or 'a_only' (EXCEPT: year_a but
    never year_b)."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        y = df["o_orderdate"].dt.year
        keep = y.isin([year_a, year_b])
        out = pd.DataFrame({"o_custkey": df["o_custkey"][keep],
                            "y": y[keep].astype("int64")})
        return out.drop_duplicates(ignore_index=True)

    pairs = ds.map_batches(partial, batch_format="pandas")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates().groupby("o_custkey", sort=False)["y"]
        if mode == "both":
            keys = g.nunique()
            keys = keys[keys == 2].index.to_numpy()
        else:  # a_only
            agg = g.agg(["min", "max"])
            m = (agg["min"] == year_a) & (agg["max"] == year_a)
            keys = agg[m].index.to_numpy()
        return pd.DataFrame({"o_custkey": pd.Series(keys, dtype="int64")})

    out_schema = pa.schema([("o_custkey", pa.int64())])
    return bucketed_group_apply(pairs, ["o_custkey"], emit,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def repeat_buyers(sf_dir: str, year_a: int = 1995, year_b: int = 1996,
                  num_buckets: int = 16) -> rd.Dataset:
    """INTERSECT set semantics: customers with at least one order in
    BOTH ``year_a`` and ``year_b`` (see _year_key_sets)."""
    return _year_key_sets(sf_dir, year_a, year_b, "both", num_buckets)


def lapsed_buyers(sf_dir: str, year_a: int = 1995, year_b: int = 1996,
                  num_buckets: int = 16) -> rd.Dataset:
    """EXCEPT set semantics: customers who ordered in ``year_a`` but
    never in ``year_b`` (see _year_key_sets)."""
    return _year_key_sets(sf_dir, year_a, year_b, "a_only", num_buckets)


def nation_region_cross(sf_dir: str) -> rd.Dataset:
    """CROSS JOIN (broadcast nested loop): every (nation, region) pair —
    the J-family's cartesian case.  The small side is read once on the
    driver and ``ray.put`` broadcast; each nation batch replicates
    against it in one vectorised repeat/tile — no shuffle, the right
    pattern whenever one side is model-sized."""
    import ray

    from ..util import collect_rows

    regions = sorted(
        r["r_name"] for r in collect_rows(
            read_parquet_clean(f"{sf_dir}/region.parquet",
                               columns=["r_name"])))
    r_ref = ray.put(regions)
    nations = read_parquet_clean(f"{sf_dir}/nation.parquet",
                                 columns=["n_name"])

    def cross(t: pa.Table) -> pa.Table:
        import numpy as np
        rs = ray.get(r_ref)
        n = t.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), len(rs)))
        return pa.table({
            "n_name": t["n_name"].take(idx),
            "r_name": pa.array(np.tile(np.asarray(rs, dtype=object), n),
                               type=pa.string()),
        })

    return nations.map_batches(cross, batch_format="pyarrow")


def region_revenue(sf_dir: str) -> rd.Dataset:
    """Multi-hop join chain (TPC-H Q5 shape): lineitem → orders →
    customer → nation → region, revenue + item count per region.

    The scale discipline is the point: the fact stream is RE-AGGREGATED
    to one row per join key BEFORE every hop (orderkey → custkey →
    nationkey), so each partitioned hash join shuffles a shrinking
    aggregate, never raw lineitems; the two genuinely tiny dimensions
    (nation, region) are applied as ONE broadcast lookup dict inside
    the final map — zero shuffle for the last two hops."""
    import ray

    from ..stages.joins import hash_join
    from ..util import collect_rows

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_extendedprice"])

    def li_part(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"o_orderkey": df["l_orderkey"],
                          "cents": _cents(df["l_extendedprice"]
                                          .to_numpy())})
        out = g.groupby("o_orderkey", sort=True).agg(
            n_items=("cents", "size"),
            revenue_cents=("cents", "sum")).reset_index()
        out["n_items"] = out["n_items"].astype("int64")
        return out

    by_order = bucketed_sum(li.map_batches(li_part, batch_format="pandas"),
                            ["o_orderkey"], ["n_items", "revenue_cents"],
                            num_buckets=16)

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    j1 = hash_join(by_order, orders, on=["o_orderkey"], num_buckets=16)

    def cust_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", sort=True, as_index=False)[
            ["n_items", "revenue_cents"]].sum()

    by_cust = bucketed_sum(j1.map_batches(cust_part,
                                          batch_format="pandas"),
                           ["o_custkey"], ["n_items", "revenue_cents"],
                           num_buckets=16)

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"]) \
        .map_batches(lambda df: df.rename(columns={"c_custkey":
                                                   "o_custkey"}),
                     batch_format="pandas")
    j2 = hash_join(by_cust, cust, on=["o_custkey"], num_buckets=16)

    # nation + region: model-sized -> one broadcast nation->region map
    n2r = {r["n_nationkey"]: r["n_regionkey"] for r in collect_rows(
        read_parquet_clean(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"]))}
    r2name = {r["r_regionkey"]: r["r_name"] for r in collect_rows(
        read_parquet_clean(f"{sf_dir}/region.parquet",
                           columns=["r_regionkey", "r_name"]))}
    lookup_ref = ray.put({n: r2name[rk] for n, rk in n2r.items()})

    def to_region(df: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(lookup_ref)
        g = pd.DataFrame({
            "r_name": df["c_nationkey"].map(lk),
            "n_items": df["n_items"],
            "revenue_cents": df["revenue_cents"]})
        return g.groupby("r_name", sort=True, as_index=False)[
            ["n_items", "revenue_cents"]].sum()

    return bucketed_sum(j2.map_batches(to_region, batch_format="pandas"),
                        ["r_name"], ["n_items", "revenue_cents"],
                        num_buckets=2)


def lineitem_price_zscore(sf_dir: str) -> rd.Dataset:
    """Per-group feature standardisation (the classic ML-preprocessing
    op): z-score of whole-dollar price within each l_returnflag, 6 dp.

    Exact-integer contract: pass 1 computes (n, sy, syy) per flag via
    the moments machinery (int64 block partials, python-int combine);
    the z formula is algebraically lifted to integer numerators —
        z = (n*y - sy) / sqrt(n*syy - sy^2)
    so the ONLY float ops are one cast of each exact integer and one
    divide/sqrt, in the identical order as the SQL mirror.  The tiny
    per-flag model is broadcast into a stateless pass-2 map; groups
    with zero variance emit NULL."""
    import ray

    from ..util import collect_rows

    # pass 1: per-block partials (one tiny row per block x flag) folded
    # on the driver in python ints — exact past any int64/float64
    # ceiling, and the fold input is model-sized, never data-sized
    acc: dict[str, list[int]] = {}
    for r in collect_rows(_moment_partials(sf_dir)):
        a = acc.setdefault(r["l_returnflag"], [0, 0, 0])
        a[0] += int(r["n"])
        a[1] += int(r["sum_price_d"])
        a[2] += int(r["syy"])
    model = {f: (n, sy, n * syy - sy * sy)
             for f, (n, sy, syy) in acc.items()}
    m_ref = ray.put(model)

    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_linenumber",
                                     "l_returnflag", "l_extendedprice"])

    def z(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(m_ref)
        y = np.floor(df["l_extendedprice"].to_numpy() + 0.5) \
            .astype(np.int64)
        out = np.full(len(df), np.nan)
        flags = df["l_returnflag"].to_numpy()
        for f, (n, sy, den) in m.items():
            sel = flags == f
            if den <= 0 or not sel.any():
                continue
            num = (n * y[sel] - sy).astype(np.float64)
            out[sel] = np.floor(num / np.sqrt(float(den)) * 1e6
                                + 0.5) / 1e6
        return pd.DataFrame({"l_orderkey": df["l_orderkey"],
                             "l_linenumber": df["l_linenumber"],
                             "z6": out})

    return ds.map_batches(z, batch_format="pandas")


def orders_cube(sf_dir: str) -> rd.Dataset:
    """GROUP BY CUBE(o_orderstatus, year) — count + exact cent sum at
    all four grouping sets, ``lvl`` = the SQL GROUPING bitmask with the
    first argument as the most significant bit (0 = both keys, 1 = year
    rolled up, 2 = status rolled up, 3 = grand total).  Same plan as
    events_rollup: shuffle ONCE for the finest level, derive every
    coarser set from the (tiny) fine aggregate — raw orders are scanned
    exactly once at any scale."""
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderstatus", "o_orderdate",
                                     "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "o_orderstatus": df["o_orderstatus"],
            "o_year": df["o_orderdate"].dt.year.astype("int64"),
            "cents": _cents(df["o_totalprice"].to_numpy())})
        out = g.groupby(["o_orderstatus", "o_year"], sort=True).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")).reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    fine = bucketed_sum(ds.map_batches(partial, batch_format="pandas"),
                        ["o_orderstatus", "o_year"], ["n", "sum_cents"],
                        num_buckets=8).materialize()

    schema = pa.schema([("o_orderstatus", pa.string()),
                        ("o_year", pa.int64()),
                        ("n", pa.int64()), ("sum_cents", pa.int64()),
                        ("lvl", pa.int64())])

    def with_lvl(lvl: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "lvl", pa.array([lvl] * t.num_rows, type=pa.int64())) \
                .select(schema.names).cast(schema)
        return fn

    lvl0 = fine.map_batches(with_lvl(0), batch_format="pyarrow")

    def by_status(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderstatus", sort=False, as_index=False).agg(
            n=("n", "sum"), sum_cents=("sum_cents", "sum"))
        g["o_year"] = pd.Series([pd.NA] * len(g), dtype="Int64")
        g["lvl"] = np.int64(1)
        return g[["o_orderstatus", "o_year", "n", "sum_cents", "lvl"]]

    lvl1 = bucketed_group_apply(fine, ["o_orderstatus"], by_status,
                                num_buckets=2, out_schema=schema)

    def by_year(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_year", sort=False, as_index=False).agg(
            n=("n", "sum"), sum_cents=("sum_cents", "sum"))
        g["o_orderstatus"] = pd.Series([pd.NA] * len(g), dtype="string")
        g["lvl"] = np.int64(2)
        return g[["o_orderstatus", "o_year", "n", "sum_cents", "lvl"]]

    lvl2 = bucketed_group_apply(fine, ["o_year"], by_year,
                                num_buckets=2, out_schema=schema)

    # grand total from the per-status subtotals (a handful of rows)
    tot = lvl1.to_pandas()
    grand = pa.Table.from_pylist(
        [{"o_orderstatus": None, "o_year": None,
          "n": int(tot["n"].sum()), "sum_cents": int(tot["sum_cents"].sum()),
          "lvl": 3}], schema=schema)
    return lvl0.union(lvl1, lvl2, rd.from_arrow(grand))


def _moment_partials(sf_dir: str) -> rd.Dataset:
    """Per-block int64 moment partials over (x = quantity, y = price in
    whole dollars) grouped by l_returnflag — one tiny row per (block,
    flag).  Per-row products stay well inside int64 (dollar
    quantisation: y^2 <= ~1e10); cross-block combination is the
    CALLER's job and must use python ints (see lineitem_moments /
    lineitem_price_zscore)."""
    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_quantity",
                                     "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = np.floor(df["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        y = np.floor(df["l_extendedprice"].to_numpy() + 0.5) \
            .astype(np.int64)
        g = pd.DataFrame({"l_returnflag": df["l_returnflag"],
                          "x": x, "y": y, "xx": x * x, "yy": y * y,
                          "xy": x * y})
        out = g.groupby("l_returnflag", sort=True).agg(
            n=("x", "size"), sum_qty=("x", "sum"), sum_price_d=("y", "sum"),
            sxx=("xx", "sum"), syy=("yy", "sum"),
            sxy=("xy", "sum")).reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    return ds.map_batches(partial, batch_format="pandas")


def lineitem_cube3(sf_dir: str) -> rd.Dataset:
    """GROUP BY CUBE over THREE dimensions (returnflag, linestatus,
    ship year) — all 2^3 grouping sets, ``lvl`` = the GROUPING bitmask
    (first argument most significant).  Same one-scan plan as the 2-dim
    cube: the raw table is aggregated ONCE at the finest set
    (distributed, bucketed); every coarser set re-aggregates the fine
    result, which is model-sized (O(distinct key triples)), so the
    2^k - 1 derivations run on the driver without touching the input
    again — the rollup/grand-total precedent generalised."""
    from ..util import collect_rows

    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_returnflag", "l_linestatus",
                                     "l_shipdate", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "ship_year": df["l_shipdate"].dt.year.astype("int64"),
            "cents": _cents(df["l_extendedprice"].to_numpy())})
        out = g.groupby(["l_returnflag", "l_linestatus", "ship_year"],
                        sort=True).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")).reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    keys = ["l_returnflag", "l_linestatus", "ship_year"]
    fine = bucketed_sum(ds.map_batches(partial, batch_format="pandas"),
                        keys, ["n", "sum_cents"], num_buckets=8)

    fdf = pd.DataFrame(collect_rows(fine))
    frames = []
    for mask in range(8):
        rolled = [keys[i] for i in range(3) if mask & (4 >> i)]
        kept = [k for k in keys if k not in rolled]
        if kept:
            g = fdf.groupby(kept, sort=True, as_index=False)[
                ["n", "sum_cents"]].sum()
        else:
            g = pd.DataFrame({"n": [int(fdf["n"].sum())],
                              "sum_cents": [int(fdf["sum_cents"].sum())]})
        for r in rolled:
            g[r] = pd.Series([pd.NA] * len(g),
                             dtype="Int64" if r == "ship_year"
                             else "string")
        g["lvl"] = np.int64(mask)
        frames.append(g[keys + ["n", "sum_cents", "lvl"]])

    out = pd.concat(frames, ignore_index=True)
    schema = pa.schema([("l_returnflag", pa.string()),
                        ("l_linestatus", pa.string()),
                        ("ship_year", pa.int64()),
                        ("n", pa.int64()), ("sum_cents", pa.int64()),
                        ("lvl", pa.int64())])
    return rd.from_arrow(pa.Table.from_pandas(out, preserve_index=False)
                         .select(schema.names).cast(schema))


def lineitem_moments(sf_dir: str, num_buckets: int = 4) -> rd.Dataset:
    """Single-pass distributed moment sums per l_returnflag over
    x = l_quantity (integral) and y = l_extendedprice quantised to whole
    dollars: n, sum_x, sum_y, and the second moments sxx/syy/sxy, plus
    Pearson correlation at 6 dp derived from the exact integers.

    Scale/overflow contract: per-block partial squared sums stay in
    int64 (dollar quantisation keeps y^2 <= ~1e10 per row); cross-block
    combination runs in Python arbitrary-precision ints, so no block
    size or row count overflows; the final exact integers are converted
    to float64 once (DuckDB mirror: HUGEINT sums cast to DOUBLE — the
    same single rounding of the same integer)."""
    partials = _moment_partials(sf_dir)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for flag, g in df.groupby("l_returnflag", sort=False):
            # Python-int accumulation: exact at any scale (no int64
            # ceiling across blocks, no float accumulation)
            n = int(g["n"].sum())
            sx = sum(int(v) for v in g["sum_qty"])
            sy = sum(int(v) for v in g["sum_price_d"])
            sxx = sum(int(v) for v in g["sxx"])
            syy = sum(int(v) for v in g["syy"])
            sxy = sum(int(v) for v in g["sxy"])
            d1 = n * sxx - sx * sx
            d2 = n * syy - sy * sy
            if d1 == 0 or d2 == 0:
                corr = None
            else:
                c = float(n * sxy - sx * sy) / np.sqrt(float(d1) * float(d2))
                corr = np.floor(c * 1e6 + 0.5) / 1e6
            rows.append({"l_returnflag": flag, "n": n,
                         "sum_qty": sx, "sum_price_d": sy,
                         "sxx": float(sxx), "syy": float(syy),
                         "sxy": float(sxy), "corr6": corr})
        return pd.DataFrame(rows, columns=[
            "l_returnflag", "n", "sum_qty", "sum_price_d",
            "sxx", "syy", "sxy", "corr6"])

    out_schema = pa.schema([("l_returnflag", pa.string()),
                            ("n", pa.int64()), ("sum_qty", pa.int64()),
                            ("sum_price_d", pa.int64()),
                            ("sxx", pa.float64()), ("syy", pa.float64()),
                            ("sxy", pa.float64()),
                            ("corr6", pa.float64())])
    return bucketed_group_apply(partials, ["l_returnflag"], combine,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def orders_skyline(sf_dir: str) -> pa.Table:
    """Pareto frontier (skyline) of orders maximizing (price, recency):
    an order is on the skyline iff no other order has cents >= AND
    day >= with at least one strict.  Duplicated points all survive
    (neither dominates the other).

    Distributed shape: the skyline operator is algebraic —
    skyline(S1 ∪ S2) = skyline(skyline(S1) ∪ skyline(S2)) — so each
    block computes its LOCAL skyline vectorised (per-cents max day +
    an exclusive running max over descending cents), and only those
    survivors (O(distinct cents) worst case, typically tiny) reach the
    driver for one final identical pass.  The 100 TB input only ever
    ships its per-block frontiers."""
    from ..util import collect_rows

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def sky_core(c: pd.DataFrame) -> pd.DataFrame:
        """Exact skyline of (o_orderkey, cents, d) int64 rows: per-cents
        max day, then an exclusive running max over DESCENDING cents —
        a cents class survives iff its max day strictly beats every
        higher-cents class (a higher-cents point with an equal day
        dominates); within a class only max-day rows survive."""
        m = c.groupby("cents", sort=True)["d"].max() \
             .sort_index(ascending=False)
        best_prev = m.cummax().shift(1, fill_value=np.iinfo(np.int64).min)
        keep = m[m > best_prev]
        out = c.merge(keep.rename("dmax").reset_index(), on="cents")
        out = out[out["d"] == out["dmax"]]
        out = out[["o_orderkey", "cents", "d"]].astype("int64")
        return out.sort_values(["cents", "o_orderkey"],
                               kind="mergesort", ignore_index=True)

    def local_sky(df: pd.DataFrame) -> pd.DataFrame:
        return sky_core(pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "cents": _cents(df["o_totalprice"].to_numpy()),
            "d": (df["o_orderdate"].astype("int64").to_numpy()
                  // 86_400_000_000),
        }))

    locals_ = orders.map_batches(local_sky, batch_format="pandas")
    rows = collect_rows(locals_)   # per-block frontiers only (tiny)
    if not rows:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "cents": pa.array([], pa.int64()),
                         "d": pa.array([], pa.int64())})
    final = sky_core(pd.DataFrame(rows))
    return pa.Table.from_pandas(final, preserve_index=False)


def order_brand_pairs(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Market-basket pair mining: for every unordered pair of part
    brands co-occurring in one order, the number of orders containing
    both — the co-purchase / frequent-itemset-pairs primitive.

    Plan: lineitem ⋈ part on partkey (partitioned hash join — the part
    side grows with scale, so no broadcast), DISTINCT (order, brand),
    then pairs are generated per order-bucket with one vectorised
    self-merge (order baskets are small: pair fan-out per order is
    C(#brands,2) ≤ C(lines,2)) and summed with one bucketed shuffle on
    the pair key."""
    from ..stages.groups import distinct
    from ..stages.joins import hash_join

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_partkey"])
    pt = read_parquet_clean(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_brand"]) \
        .map_batches(lambda t: t.rename_columns(
            ["l_partkey", "p_brand"]), batch_format="pyarrow")
    j = hash_join(li, pt, on=["l_partkey"], num_buckets=num_buckets) \
        .map_batches(lambda t: t.select(["l_orderkey", "p_brand"]),
                     batch_format="pyarrow")
    ob = distinct(j, ["l_orderkey", "p_brand"], num_buckets=num_buckets)

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="l_orderkey")
        m = m[m["p_brand_x"] < m["p_brand_y"]]
        g = m.groupby(["p_brand_x", "p_brand_y"], sort=True) \
             .size().rename("n_orders").reset_index()
        g.columns = ["brand_a", "brand_b", "n_orders"]
        return g.astype({"n_orders": "int64"})

    pair_schema = pa.schema([("brand_a", pa.string()),
                             ("brand_b", pa.string()),
                             ("n_orders", pa.int64())])
    partial = bucketed_group_apply(ob, ["l_orderkey"], pairs_in_bucket,
                                   num_buckets=num_buckets,
                                   out_schema=pair_schema)
    return bucketed_sum(partial, ["brand_a", "brand_b"], ["n_orders"],
                        num_buckets=4)


def orders_cdc_merge(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """CDC upsert / MERGE semantics (the lakehouse last-wins merge):
    base snapshot + a change stream, one surviving row per key = the
    highest version.  The change stream here is a pure derivation of
    the driver's orders table (shared verbatim with the mirror):
    version-2 price updates for o_orderkey % 10 == 0 (cents + 500) and
    version-2 inserts at o_orderkey + 100000000 for o_orderkey % 97 ==
    0 — in production it is the real CDC feed, same plumbing.

    Distributed shape: per-batch partial argmax by (version) collapses
    each block to one row per key BEFORE the single bucketed shuffle —
    the max_by plan, associative under any blocking."""
    from ..stages.groups import bucketed_group_apply
    from .analytics import _cents

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def base_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "version": np.int64(1),
            "cents": _cents(df["o_totalprice"].to_numpy())})

    def update_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy()
        c = _cents(df["o_totalprice"].to_numpy())
        upd = pd.DataFrame({"o_orderkey": k[k % 10 == 0],
                            "version": np.int64(2),
                            "cents": c[k % 10 == 0] + 500})
        ins = pd.DataFrame({"o_orderkey": k[k % 97 == 0] + 100_000_000,
                            "version": np.int64(2),
                            "cents": c[k % 97 == 0]})
        return pd.concat([upd, ins], ignore_index=True)

    base = src.map_batches(base_rows, batch_format="pandas")
    updates = src.map_batches(update_rows, batch_format="pandas")

    def argmax_version(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderkey", "version"],
                            ascending=[True, False], kind="mergesort")
        return df.drop_duplicates("o_orderkey", keep="first",
                                  ignore_index=True)

    merged = base.union(updates) \
        .map_batches(argmax_version, batch_format="pandas")
    return bucketed_group_apply(
        merged, ["o_orderkey"], argmax_version,
        num_buckets=num_buckets,
        out_schema=pa.schema([("o_orderkey", pa.int64()),
                              ("version", pa.int64()),
                              ("cents", pa.int64())]))


def monthly_revenue_yoy(sf_dir: str) -> pa.Table:
    """Month-over-same-month-last-year revenue growth: exact monthly
    cent sums (partial-before-shuffle), then the year-over-year join on
    the model-shaped monthly aggregate (driver-assembled — at most
    years x 12 rows at any corpus size).  yoy_micro uses truncating
    integer division (DuckDB ``//``), NULL where no prior year."""
    from ..stages.pca import _tdiv_int
    from ..util import collect_rows
    from .analytics import _cents, bucketed_sum

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        idx = pd.DatetimeIndex(df["o_orderdate"])
        g = pd.DataFrame({"y": idx.year.astype("int64"),
                          "m": idx.month.astype("int64"),
                          "cents": _cents(df["o_totalprice"]
                                          .to_numpy())})
        return g.groupby(["y", "m"], as_index=False)["cents"].sum()

    rows = collect_rows(bucketed_sum(
        src.map_batches(partial, batch_format="pandas"),
        ["y", "m"], ["cents"], num_buckets=2))
    cents_of = {(r["y"], r["m"]): r["cents"] for r in rows}
    out = []
    for (y, m) in sorted(cents_of):
        c = cents_of[(y, m)]
        prev = cents_of.get((y - 1, m))
        yoy = (_tdiv_int((c - prev) * 1_000_000, prev)
               if prev else None)
        out.append((y, m, c, prev, yoy))
    return pa.table({
        "y": pa.array([r[0] for r in out], pa.int64()),
        "m": pa.array([r[1] for r in out], pa.int64()),
        "cents": pa.array([r[2] for r in out], pa.int64()),
        "prev_cents": pa.array([r[3] for r in out], pa.int64()),
        "yoy_micro": pa.array([r[4] for r in out], pa.int64())})


def status_revenue_share(sf_dir: str) -> pa.Table:
    """Percent-of-total (ratio_to_report): per-status exact cent sums
    and each status's share of the grand total in integer micro-units
    — one bucketed shuffle, grand total folded from the group sums."""
    from ..util import collect_rows
    from .analytics import _cents, bucketed_sum

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderstatus", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"o_orderstatus": df["o_orderstatus"],
                          "cents": _cents(df["o_totalprice"]
                                          .to_numpy())})
        return g.groupby("o_orderstatus", as_index=False)["cents"].sum()

    rows = collect_rows(bucketed_sum(
        src.map_batches(partial, batch_format="pandas"),
        ["o_orderstatus"], ["cents"], num_buckets=2))
    total = sum(int(r["cents"]) for r in rows)
    rows = sorted(rows, key=lambda r: r["o_orderstatus"])
    return pa.table({
        "o_orderstatus": pa.array([r["o_orderstatus"] for r in rows],
                                  pa.string()),
        "cents": pa.array([r["cents"] for r in rows], pa.int64()),
        "share_micro": pa.array(
            [(int(r["cents"]) * 1_000_000) // total for r in rows],
            pa.int64())})


def orders_above_cust_avg(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Correlated-subquery filter: orders whose price exceeds their OWN
    customer's average order price.  Decorrelated the classic way — one
    partial-aggregated (sum_cents, n) table per customer, one
    partitioned hash join back to the order stream — and the comparison
    is integer cross-multiplied (cents * n > sum_cents) so no division
    ever happens."""
    from ..stages.joins import hash_join

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"], "o_custkey": df["o_custkey"],
            "price_cents": _cents(df["o_totalprice"].to_numpy())})

    cents = orders.map_batches(to_cents, batch_format="pandas")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(
            sum_cents=("price_cents", "sum"), n=("price_cents", "size"))
        g["n"] = g["n"].astype("int64")
        return g

    agg = bucketed_sum(cents.map_batches(partial, batch_format="pandas"),
                       ["o_custkey"], ["sum_cents", "n"],
                       num_buckets=num_buckets)
    joined = hash_join(cents, agg, on=["o_custkey"],
                       num_buckets=num_buckets)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = df["price_cents"] * df["n"] > df["sum_cents"]
        out = df[m][["o_orderkey", "o_custkey", "price_cents"]].copy()
        return out

    out_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_custkey", pa.int64()),
                            ("price_cents", pa.int64())])
    return joined.map_batches(keep, batch_format="pandas").map_batches(
        lambda t: t.cast(out_schema), batch_format="pyarrow")


def lineitem_loo_stats(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Leave-one-out aggregate (the feature-engineering staple that
    avoids label leakage): per lineitem, the count and exact integer-
    cent sum of the OTHER lines of the same order.  One bucketed
    shuffle on the order key; the subtraction happens inside the
    bucket, no join."""
    from ..stages.groups import bucketed_group_apply

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"])

    def loo(df: pd.DataFrame) -> pd.DataFrame:
        cents = pd.Series(_cents(df["l_extendedprice"].to_numpy()))
        g = df.groupby("l_orderkey", sort=False)
        tot = cents.groupby(df["l_orderkey"], sort=False).transform("sum")
        n = g["l_linenumber"].transform("size").astype("int64")
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"],
            "l_linenumber": df["l_linenumber"].astype("int32"),
            "loo_n": (n - 1).astype("int64"),
            "loo_sum_cents": (tot - cents).astype("int64")})

    out_schema = pa.schema([("l_orderkey", pa.int64()),
                            ("l_linenumber", pa.int32()),
                            ("loo_n", pa.int64()),
                            ("loo_sum_cents", pa.int64())])
    return bucketed_group_apply(ds, ["l_orderkey"], loo,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def status_top_prices_dense(sf_dir: str, k: int = 3,
                            num_buckets: int = 16) -> rd.Dataset:
    """Ties-kept top-k: every order whose price is among its status's
    top-``k`` DISTINCT price values (dense_rank <= k — unlike
    top_orders_per_status's row_number, ties all survive).  Plan: one
    bucketed distinct on the (status, cents) pairs, a per-status top-k
    fold (k × |statuses| rows — driver-small by construction), then a
    broadcast filter over the raw stream.  The big table is never
    shuffled at all."""
    import ray

    from ..stages.groups import bucketed_group_apply, distinct
    from ..util import collect_rows

    src = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def to_cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "o_orderstatus": df["o_orderstatus"],
            "price_cents": _cents(df["o_totalprice"].to_numpy())})

    cents = src.map_batches(to_cents, batch_format="pandas")
    dvals = distinct(
        cents.map_batches(
            lambda df: df[["o_orderstatus", "price_cents"]],
            batch_format="pandas"),
        ["o_orderstatus", "price_cents"], num_buckets=num_buckets)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderstatus", "price_cents"],
                            ascending=[True, False], kind="mergesort")
        return df.groupby("o_orderstatus", sort=False).head(k)

    top = collect_rows(bucketed_group_apply(dvals, ["o_orderstatus"],
                                            topk, num_buckets=4))
    by_status: dict[str, list[int]] = {}
    for r in top:
        by_status.setdefault(r["o_orderstatus"], []).append(
            int(r["price_cents"]))
    cut = pd.DataFrame(
        [(st, v, i + 1) for st, vals in by_status.items()
         for i, v in enumerate(sorted(vals, reverse=True))],
        columns=["o_orderstatus", "price_cents", "drank"])
    cut["drank"] = cut["drank"].astype("int64")
    r_ref = ray.put(cut)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        # broadcast merge against the tiny (status, cents, drank)
        # cutoff table — vectorised C join, no per-row Python
        out = df.merge(ray.get(r_ref), on=["o_orderstatus",
                                           "price_cents"])
        return out[["o_orderstatus", "o_orderkey", "price_cents",
                    "drank"]]

    out_schema = pa.schema([("o_orderstatus", pa.string()),
                            ("o_orderkey", pa.int64()),
                            ("price_cents", pa.int64()),
                            ("drank", pa.int64())])
    return cents.map_batches(keep, batch_format="pandas").map_batches(
        lambda t: t.cast(out_schema), batch_format="pyarrow")


def user_event_types_list(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Grouped DISTINCT ordered string aggregation: per user, the
    sorted distinct event types joined by ',' plus their count —
    string_agg(DISTINCT … ORDER BY …) semantics.  Per-batch (user,
    type) dedup first, ONE bucketed shuffle keyed on the user, then the
    in-bucket sorted fold."""
    from ..stages.groups import bucketed_group_apply

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    pairs = ds.map_batches(dedup, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates().sort_values(
            ["user_id", "event_type"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        out = g.agg(n_types=("event_type", "size"),
                    types=("event_type", ",".join)).reset_index()
        out["n_types"] = out["n_types"].astype("int64")
        return out[["user_id", "n_types", "types"]]

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_types", pa.int64()),
                            ("types", pa.string())])
    return bucketed_group_apply(pairs, ["user_id"], fold,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def purchase_nearby_clicks(sf_dir: str, tol_us: int = 1_800_000_000,
                           num_buckets: int = 16) -> rd.Dataset:
    """Interval/range join WITHIN the event stream: for each purchase,
    the same user's clicks inside ±tol (default 30 min) — nearby count
    and the exact closest |gap| in microseconds (purchases with no
    nearby click don't emit; the mirror is the plain |Δts| <= tol
    join).

    Distributed shape: the classic BUCKETED band join — each click
    fans out to its 3 candidate tol-width time buckets (constant
    fan-out, never data-sized), the join runs partitioned on
    (user_id, bucket), the exact microsecond band filter prunes the
    bucket-edge false candidates, and per-purchase partials (count +
    running min) fold in one bucketed pass."""
    from ..stages.groups import bucketed_group_apply
    from ..stages.joins import hash_join

    events = read_parquet_clean(f"{sf_dir}/events.parquet",
                                columns=["event_id", "user_id", "ts",
                                         "event_type"])

    def p_pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "purchase"]
        ts = pd.DatetimeIndex(df["ts"]).as_unit("us").asi8
        return pd.DataFrame({"event_id": df["event_id"]
                             .astype("int64"),
                             "uid": df["user_id"].astype("int64"),
                             "bkt": (ts // tol_us).astype("int64"),
                             "p_us": ts})

    def c_explode(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "click"]
        ts = pd.DatetimeIndex(df["ts"]).as_unit("us").asi8
        base = pd.DataFrame({"uid": df["user_id"].astype("int64"),
                             "c_us": ts,
                             "cb": (ts // tol_us).astype("int64")})
        reps = []
        for off in (-1, 0, 1):
            r = base.copy()
            r["bkt"] = r["cb"] + off
            reps.append(r.drop(columns=["cb"]))
        return pd.concat(reps, ignore_index=True)

    j = hash_join(events.map_batches(p_pre, batch_format="pandas"),
                  events.map_batches(c_explode, batch_format="pandas"),
                  on=["uid", "bkt"], num_buckets=num_buckets)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        gap = np.abs(df["c_us"] - df["p_us"])
        keep = df.assign(gap=gap)[gap <= tol_us]
        out = keep.groupby("event_id", as_index=False).agg(
            n_nearby=("gap", "size"), min_gap_us=("gap", "min"))
        return out.astype({"n_nearby": "int64", "min_gap_us": "int64"})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_id", as_index=False).agg(
            n_nearby=("n_nearby", "sum"), min_gap_us=("min_gap_us",
                                                      "min"))
        return out.astype({"n_nearby": "int64", "min_gap_us": "int64"})

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("n_nearby", pa.int64()),
                            ("min_gap_us", pa.int64())])
    return bucketed_group_apply(
        j.map_batches(partial, batch_format="pandas"),
        ["event_id"], fold, num_buckets=8, out_schema=out_schema)


def orders_scd2_history(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """SCD Type-2 history build over the CDC stream (same derived
    base-v1 + changes-v2 feed as orders_cdc_merge, shared verbatim with
    the mirror): per key, every version becomes a validity row —
    valid_to = next version - 1 (NULL while current) and the
    is_current flag.  The lakehouse history-table materialisation.

    Distributed shape: one bucketed fold per key over the unioned
    version rows (version-cardinality per key is the CDC depth, never
    corpus-sized); the LEAD is a vectorised shift inside the sorted
    group."""
    from ..stages.groups import bucketed_group_apply
    from .analytics import _cents

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])

    def base_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "version": np.int64(1),
            "cents": _cents(df["o_totalprice"].to_numpy())})

    def update_rows(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy()
        c = _cents(df["o_totalprice"].to_numpy())
        upd = pd.DataFrame({"o_orderkey": k[k % 10 == 0],
                            "version": np.int64(2),
                            "cents": c[k % 10 == 0] + 500})
        ins = pd.DataFrame({"o_orderkey": k[k % 97 == 0] + 100_000_000,
                            "version": np.int64(2),
                            "cents": c[k % 97 == 0]})
        return pd.concat([upd, ins], ignore_index=True)

    u = src.map_batches(base_rows, batch_format="pandas").union(
        src.map_batches(update_rows, batch_format="pandas"))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderkey", "version"],
                            kind="mergesort", ignore_index=True)
        nxt = df.groupby("o_orderkey", sort=False)["version"].shift(-1)
        valid_to = nxt - 1
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype("int64"),
            "version": df["version"].astype("int64"),
            "cents": df["cents"].astype("int64"),
            "valid_to": valid_to.astype("Int64"),
            "is_current": nxt.isna().astype("int64")})

    out_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("version", pa.int64()),
                            ("cents", pa.int64()),
                            ("valid_to", pa.int64()),
                            ("is_current", pa.int64())])
    return bucketed_group_apply(u, ["o_orderkey"], fold,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def nation_revenue_share(sf_dir: str) -> "pa.Table":
    """Percent-of-parent rollup: revenue per NATION with its integer
    micro-share of the parent REGION's total and its rank within the
    region — the hierarchical drill-down panel (share-of-parent is the
    number a regional dashboard sorts by).

    Reuses the Q5-shape discipline: the fact stream re-aggregates to
    one row per join key before every hop; nation/region dimensions
    apply as broadcast lookups; the share/rank finish is
    nations-bounded driver math (25 rows), shares exact //."""
    import ray

    from ..stages.joins import hash_join
    from ..util import collect_rows

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_extendedprice"])

    def li_part(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"o_orderkey": df["l_orderkey"],
                          "revenue_cents": _cents(df["l_extendedprice"]
                                                  .to_numpy())})
        return g.groupby("o_orderkey", sort=True, as_index=False).sum()

    by_order = bucketed_sum(
        li.map_batches(li_part, batch_format="pandas"),
        ["o_orderkey"], ["revenue_cents"], num_buckets=16)

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    j1 = hash_join(by_order, orders, on=["o_orderkey"], num_buckets=16)

    by_cust = bucketed_sum(
        j1.map_batches(lambda df: df.groupby(
            "o_custkey", sort=True, as_index=False)
            [["revenue_cents"]].sum(), batch_format="pandas"),
        ["o_custkey"], ["revenue_cents"], num_buckets=16)

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"]) \
        .map_batches(lambda df: df.rename(
            columns={"c_custkey": "o_custkey"}), batch_format="pandas")
    j2 = hash_join(by_cust, cust, on=["o_custkey"], num_buckets=16)

    n2name = {r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
              for r in collect_rows(read_parquet_clean(
                  f"{sf_dir}/nation.parquet",
                  columns=["n_nationkey", "n_name", "n_regionkey"]))}
    r2name = {r["r_regionkey"]: r["r_name"]
              for r in collect_rows(read_parquet_clean(
                  f"{sf_dir}/region.parquet",
                  columns=["r_regionkey", "r_name"]))}

    rows = collect_rows(bucketed_sum(
        j2.map_batches(lambda df: df.groupby(
            "c_nationkey", sort=True, as_index=False)
            [["revenue_cents"]].sum(), batch_format="pandas"),
        ["c_nationkey"], ["revenue_cents"], num_buckets=4))
    per_n: dict[int, int] = {}
    for r in rows:
        per_n[int(r["c_nationkey"])] = per_n.get(
            int(r["c_nationkey"]), 0) + int(r["revenue_cents"])
    reg_tot: dict[int, int] = {}
    for nk, rev in per_n.items():
        reg_tot[n2name[nk][1]] = reg_tot.get(n2name[nk][1], 0) + rev
    recs = sorted(
        ((r2name[n2name[nk][1]], n2name[nk][1], n2name[nk][0], rev)
         for nk, rev in per_n.items()),
        key=lambda x: (x[0], -x[3], x[2]))
    out = {"r_name": [], "n_name": [], "revenue_cents": [],
           "share_micro": [], "rnk": []}
    rk, prev_r = 0, None
    for r_name, rkey, n_name, rev in recs:
        rk = rk + 1 if r_name == prev_r else 1
        prev_r = r_name
        out["r_name"].append(r_name); out["n_name"].append(n_name)
        out["revenue_cents"].append(rev)
        out["share_micro"].append(rev * 1_000_000 // reg_tot[rkey])
        out["rnk"].append(rk)
    return pa.table({
        "r_name": pa.array(out["r_name"], pa.string()),
        "n_name": pa.array(out["n_name"], pa.string()),
        "revenue_cents": pa.array(out["revenue_cents"], pa.int64()),
        "share_micro": pa.array(out["share_micro"], pa.int64()),
        "rnk": pa.array(out["rnk"], pa.int64())})
