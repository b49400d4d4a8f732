"""Generic relational operators over the driver-provided TPC-H-ish tables
(SURVEY.md §2.5/§2.6 patterns: partial+final aggregation, broadcast join,
top-k, time-bucketed windows).

Float determinism rule: any SQL-checked monetary/real sum is converted to
integer cents per row with floor(x*100 + 0.5) (exact integer arithmetic in
int64 — associative, so distributed order doesn't matter), mirrored
verbatim in the oracle SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..sources.pqclean import read_parquet_clean
from ray.data.aggregate import Max, Sum


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100 + 0.5).astype(np.int64)


def bucketed_sum(partials: rd.Dataset, key_cols: list[str],
                 sum_cols: list[str], num_buckets: int = 32) -> rd.Dataset:
    """Final combine of per-batch partials — bucketed int-key shuffle
    (stages/groups.py; much faster than Dataset.groupby on string keys)."""
    from ..stages.groups import bucketed_group_apply

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key_cols, sort=False,
                          as_index=False)[sum_cols].sum()

    return bucketed_group_apply(partials, key_cols, combine,
                                num_buckets=num_buckets)


def partial_count(ds: rd.Dataset, key_cols: list[str],
                  out_name: str = "n") -> rd.Dataset:
    """count(*) grouped by key_cols, pre-aggregated per batch so the
    shuffle moves one row per key per batch (ray_guide.md L154-158)."""
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key_cols, sort=True, observed=True).size()
        out = out.rename(out_name).reset_index()
        out[out_name] = out[out_name].astype("int64")
        return out
    partials = ds.select_columns(key_cols).map_batches(
        partial, batch_format="pandas")
    return bucketed_sum(partials, key_cols, [out_name])


def turn_counts(transcripts: rd.Dataset) -> rd.Dataset:
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("conv_id", sort=True).agg(
            n_turns=("turn_idx", "size"), max_turn_idx=("turn_idx", "max"))
        g = g.reset_index()
        g["n_turns"] = g["n_turns"].astype("int64")
        g["max_turn_idx"] = g["max_turn_idx"].astype("int32")
        return g
    partials = transcripts.select_columns(["conv_id", "turn_idx"]).map_batches(
        partial, batch_format="pandas")

    from ..stages.groups import bucketed_group_apply

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("conv_id", sort=False, as_index=False).agg(
            n_turns=("n_turns", "sum"), max_turn_idx=("max_turn_idx", "max"))
        g["max_turn_idx"] = g["max_turn_idx"].astype("int32")
        return g

    return bucketed_group_apply(partials, ["conv_id"], combine,
                                num_buckets=32)


def orders_by_status(sf_dir: str) -> rd.Dataset:
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus"])
    return partial_count(ds, ["o_orderstatus"])


def pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped: per (returnflag, linestatus) totals, integer-cent
    arithmetic for the monetary sums."""
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["base_cents"] = _cents(df["l_extendedprice"].to_numpy())
        df["disc_cents"] = _cents(
            (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy())
        df["qty"] = df["l_quantity"].astype("int64")
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=True).agg(
            sum_qty=("qty", "sum"),
            sum_base_cents=("base_cents", "sum"),
            sum_disc_cents=("disc_cents", "sum"),
            n=("qty", "size"),
        ).reset_index()
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_sum(partials, ["l_returnflag", "l_linestatus"],
                        ["sum_qty", "sum_base_cents", "sum_disc_cents", "n"],
                        num_buckets=4)


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Revenue per customer (orders), top-k, broadcast-joined to customer
    names (small side via ray.put — no shuffle join; SURVEY.md §2.4 J1)."""
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(rev_cents=_cents(df["o_totalprice"].to_numpy()))
        g = df.groupby("o_custkey", sort=True)["rev_cents"].sum().reset_index()
        return g.rename(columns={"rev_cents": "revenue_cents"})

    per_cust = bucketed_sum(
        orders.map_batches(partial, batch_format="pandas"),
        ["o_custkey"], ["revenue_cents"], num_buckets=16)

    # global top-k without a global sort (VERDICT r01 item 9): each bucket
    # of the aggregate emits its local k head, the driver merges the tiny
    # B·k candidate set — the top_orders_per_status pattern, globalised.
    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["revenue_cents", "o_custkey"],
                              ascending=[False, True],
                              kind="mergesort").head(k)

    heads = per_cust.map_batches(local_topk, batch_format="pandas",
                                 batch_size=None).to_pandas()
    top = (heads.sort_values(["revenue_cents", "o_custkey"],
                             ascending=[False, True], kind="mergesort")
           .head(k).reset_index(drop=True))

    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"]).to_pandas()
    names_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))
    names = ray.get(names_ref)
    top["c_name"] = top["o_custkey"].map(names)
    top = top.rename(columns={"o_custkey": "c_custkey"})
    return top[["c_custkey", "c_name", "revenue_cents"]]


def segment_revenue(sf_dir: str) -> rd.Dataset:
    """Revenue per customer market segment — a both-sides-large
    partitioned hash join (stages/joins.hash_join, J3) followed by a
    bucketed aggregate."""
    from ..stages.joins import hash_join

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda df: pd.DataFrame({
            "custkey": df["o_custkey"],
            "rev_cents": _cents(df["o_totalprice"].to_numpy())}),
        batch_format="pandas")
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda df: df.rename(columns={"c_custkey": "custkey"}),
        batch_format="pandas")
    joined = hash_join(orders, cust, on=["custkey"], how="inner",
                       num_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_mktsegment", sort=True).agg(
            revenue_cents=("rev_cents", "sum"),
            n_orders=("rev_cents", "size")).reset_index()
        g["n_orders"] = g["n_orders"].astype("int64")
        return g

    partials = joined.map_batches(partial, batch_format="pandas")
    return bucketed_sum(partials, ["c_mktsegment"],
                        ["revenue_cents", "n_orders"], num_buckets=4)


def top_orders_per_status(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Per-group top-k (O2 pattern at table scale): k highest-value orders
    per order status.  Partial top-k per batch, one bucketed shuffle keyed
    hash(status), final top-k per group — ties broken by o_orderkey."""
    from ..stages.groups import bucketed_group_apply

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_orderkey",
                                  "o_totalprice"])

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderstatus", "price_cents", "o_orderkey"],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("o_orderstatus", sort=True).head(k)

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(price_cents=_cents(df["o_totalprice"].to_numpy()))
        return head_k(df)[["o_orderstatus", "o_orderkey", "price_cents"]]

    partial = ds.map_batches(partial_topk, batch_format="pandas",
                             batch_size=None)
    return bucketed_group_apply(partial, ["o_orderstatus"], head_k,
                                num_buckets=4)


def status_distinct_custkeys(sf_dir: str) -> rd.Dataset:
    """count(DISTINCT o_custkey) per order status — G6 at query scale:
    per-batch distinct (key, cust) pairs, one bucketed shuffle keyed on
    the pair, final per-key distinct count."""
    from ..stages.groups import bucketed_group_apply

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_custkey"])
    partial = ds.map_batches(
        lambda df: df.drop_duplicates(["o_orderstatus", "o_custkey"]),
        batch_format="pandas", batch_size=None)

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.drop_duplicates(["o_orderstatus", "o_custkey"])
             .groupby("o_orderstatus", sort=True)["o_custkey"]
             .size().rename("n_custkeys").reset_index())
        g["n_custkeys"] = g["n_custkeys"].astype("int64")
        return g

    # all rows of a status must meet: bucket by status only
    return bucketed_group_apply(partial, ["o_orderstatus"],
                                count_distinct, num_buckets=4)


def order_price_quantiles(sf_dir: str) -> rd.Dataset:
    """Exact per-status price quantiles (p25/p50/p75, linear
    interpolation — DuckDB quantile_cont semantics).  Exact quantiles
    need each group's full value set in one place: per-status bucketed
    shuffle of the (status, price) pairs only."""
    import numpy as np

    from ..stages.groups import bucketed_group_apply

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                         columns=["o_orderstatus", "o_totalprice"])
    pairs = ds.map_batches(
        lambda df: pd.DataFrame({
            "o_orderstatus": df["o_orderstatus"],
            "price_cents": _cents(df["o_totalprice"].to_numpy())}),
        batch_format="pandas")

    def quants(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for status, g in df.groupby("o_orderstatus", sort=True):
            x = np.sort(g["price_cents"].to_numpy())
            p25, p50, p75 = (np.quantile(x, q, method="linear")
                             for q in (0.25, 0.5, 0.75))
            rows.append((status, round(p25, 6), round(p50, 6),
                         round(p75, 6)))
        return pd.DataFrame(rows, columns=["o_orderstatus", "p25", "p50",
                                           "p75"]).astype(
            {"p25": "float64", "p50": "float64", "p75": "float64"})

    return bucketed_group_apply(pairs, ["o_orderstatus"], quants,
                                num_buckets=4)


def exact_partitioned_ranks(pairs: rd.Dataset, part_col: str,
                            value_col: str, id_col: str,
                            bin_width: int, emit,
                            out_schema: pa.Schema,
                            num_buckets: int = 16,
                            pin: bool = False) -> rd.Dataset:
    """Generic EXACT two-pass distributed rank-window machinery
    (VERDICT r03 item 2; shared by NTILE, ROW_NUMBER/RANK/PERCENT_RANK
    and activity deciles).

    ``pairs`` carries (part_col, integer value_col, id_col).  No
    partition is ever co-located in one task: pass 1 builds a mergeable
    fixed-width histogram — per (partition, bin) counts, O(partitions x
    bins) rows regardless of input size — and turns it into
    exclusive-cumsum START RANKS per bin plus partition sizes N; pass 2
    shuffles rows keyed on (partition, BIN) — strictly finer than the
    partition column — and calls ``emit(g, start, n)`` once per group
    with g sorted by (value, id), the bin's partition-global exclusive
    start rank, and the partition size.  Scale bound: the heaviest
    single (partition, bin) group — tune bin_width down to split hot
    value ranges, never the partition count.

    ``pin=True`` materialises ``pairs`` ONCE before the two passes —
    use when the upstream is itself a shuffle or a CPU-heavy transform
    (otherwise both passes re-execute it).  The pinned stream is the
    narrow (part, value, id) projection, so the object-store cost is
    ~24 B/row and spills to disk past memory; recompute stays the right
    default for trivially-cheap upstreams (a pruned parquet read)."""
    from ..stages.groups import bucketed_group_apply
    from ..util import collect_rows

    if pin:
        from ..util import compact_blocks
        pairs = compact_blocks(pairs)

    def partial_hist(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({part_col: df[part_col],
                          "bin": df[value_col].to_numpy() // bin_width})
        out = g.groupby([part_col, "bin"], sort=False,
                        observed=True).size().rename("c").reset_index()
        return out.astype({"bin": "int64", "c": "int64"})

    hist_rows = collect_rows(bucketed_sum(
        pairs.map_batches(partial_hist, batch_format="pandas"),
        [part_col, "bin"], ["c"], num_buckets=4))
    start_of: dict[tuple, int] = {}
    n_of: dict = {}
    for r in sorted(hist_rows, key=lambda r: (r[part_col], r["bin"])):
        p = r[part_col]
        start_of[(p, r["bin"])] = n_of.get(p, 0)
        n_of[p] = n_of.get(p, 0) + r["c"]

    def run(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["bin"])
        outs = []
        bins = df[value_col].to_numpy() // bin_width
        for (p, b), g in df.groupby([part_col, bins], sort=True):
            g = g.sort_values([value_col, id_col], kind="mergesort")
            outs.append(emit(g, start_of[(p, int(b))], n_of[p]))
        if not outs:   # guard; _reduce_bucket never calls on empty
            return out_schema.empty_table().to_pandas()
        return pd.concat(outs, ignore_index=True)

    binned = pairs.map_batches(
        lambda df: df.assign(bin=df[value_col].to_numpy() // bin_width),
        batch_format="pandas")
    return bucketed_group_apply(binned, [part_col, "bin"], run,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def ntile_emit(n_tiles: int, rank: "np.ndarray", n: int) -> "np.ndarray":
    """SQL NTILE from global ranks: the first N % n_tiles tiles get one
    extra row (exact integer split, shared with the oracle)."""
    base, extra = n // n_tiles, n % n_tiles
    cut = (base + 1) * extra
    return np.where(rank < cut, rank // (base + 1),
                    extra + (rank - cut) // max(base, 1)) + 1


def _order_price_pairs(sf_dir: str) -> rd.Dataset:
    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    return ds.map_batches(
        lambda df: pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "o_orderstatus": df["o_orderstatus"],
            "price_cents": _cents(df["o_totalprice"].to_numpy())}),
        batch_format="pandas")


def order_price_ntile(sf_dir: str, n_tiles: int = 4,
                      bin_cents: int = 100_000) -> rd.Dataset:
    """NTILE(n) per order status over price — exact two-pass rank
    window (machinery: exact_partitioned_ranks; ties broken by
    o_orderkey, fully deterministic)."""
    schema = pa.schema([("o_orderkey", pa.int64()),
                        ("o_orderstatus", pa.string()),
                        ("quartile", pa.int64())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        rank = start + np.arange(len(g), dtype=np.int64)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(),
            "o_orderstatus": g["o_orderstatus"].to_numpy(),
            "quartile": ntile_emit(n_tiles, rank, n).astype("int64")})

    return exact_partitioned_ranks(_order_price_pairs(sf_dir),
                                   "o_orderstatus", "price_cents",
                                   "o_orderkey", bin_cents, emit, schema)


def order_price_rank(sf_dir: str, bin_cents: int = 100_000) -> rd.Dataset:
    """Exact distributed ROW_NUMBER + RANK + PERCENT_RANK per order
    status over price (machinery: exact_partitioned_ranks).

    Semantics shared with the SQL mirror: rn orders by (price_cents,
    o_orderkey) — unique, so deterministic; rnk orders by price_cents
    alone (ties share a rank: start + first-occurrence offset of the
    value inside its bin — correct globally because equal values always
    land in the same bin); pct6 = (rnk-1)/(N-1) rounded half-up to 6 dp
    from the exact integers (NULL when N = 1)."""
    schema = pa.schema([("o_orderkey", pa.int64()),
                        ("o_orderstatus", pa.string()),
                        ("rn", pa.int64()), ("rnk", pa.int64()),
                        ("pct6", pa.float64())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        rn = start + np.arange(len(g), dtype=np.int64) + 1
        cents = g["price_cents"].to_numpy()
        rnk = start + np.searchsorted(cents, cents, side="left") + 1
        if n > 1:
            pct = np.floor((rnk - 1).astype(np.float64) / (n - 1)
                           * 1e6 + 0.5) / 1e6
        else:
            pct = np.full(len(g), np.nan)
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(),
            "o_orderstatus": g["o_orderstatus"].to_numpy(),
            "rn": rn, "rnk": rnk.astype("int64"), "pct6": pct})

    return exact_partitioned_ranks(_order_price_pairs(sf_dir),
                                   "o_orderstatus", "price_cents",
                                   "o_orderkey", bin_cents, emit, schema)


def user_activity_deciles(sf_dir: str, n_tiles: int = 10,
                          bin_width: int = 16) -> rd.Dataset:
    """Activity deciles: NTILE(10) over each user's event count — the
    classic cohort segmentation, on the same exact two-pass machinery
    with a single global partition (no per-key co-location even though
    the partition is the whole table)."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id"])
    counts = partial_count(ev, ["user_id"], out_name="n")
    pairs = counts.map_batches(lambda df: df.assign(part="all"),
                               batch_format="pandas")
    schema = pa.schema([("user_id", pa.int64()), ("n", pa.int64()),
                        ("decile", pa.int64())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        rank = start + np.arange(len(g), dtype=np.int64)
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(),
            "n": g["n"].to_numpy(),
            "decile": ntile_emit(n_tiles, rank, n).astype("int64")})

    # pin: the upstream is a per-user count shuffle — don't run it twice
    return exact_partitioned_ranks(pairs, "part", "n", "user_id",
                                   bin_width, emit, schema,
                                   num_buckets=8, pin=True)


# histogram-sketch quantiles: (numerator, denominator) per quantile so
# rank = ceil(q*n) is computed in exact integer math (float ceil(0.9*n)
# can land one rank off when 0.9*n rounds up past the integer)
_HISTO_QS = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def order_price_histo(sf_dir: str, bin_cents: int = 100_000) -> rd.Dataset:
    """Approximate per-status price quantiles from a fixed-width binned
    histogram — the 100 TB scale path next to the exact shuffle above.

    One streaming pass builds per-batch (status, bin, count) partials
    (mergeable, O(statuses x bins) rows per batch regardless of input
    size); the only shuffle moves those tiny partials.  Each reported
    quantile is the upper edge of the first bin whose cumulative count
    reaches rank ceil(q*n) — deterministic integers end to end, so the
    sketch is exactly mirrorable in SQL (unlike t-digest/KLL, whose
    merge order changes the result).  Error is bounded by bin width
    ($1000 here); at scale you trade bins for accuracy, not memory per
    row."""
    from ..stages.groups import bucketed_group_apply

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderstatus", "o_totalprice"])

    def partial_hist(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "o_orderstatus": df["o_orderstatus"],
            "bin": _cents(df["o_totalprice"].to_numpy()) // bin_cents})
        out = g.groupby(["o_orderstatus", "bin"], sort=False,
                        observed=True).size().rename("c").reset_index()
        return out.astype({"bin": "int64", "c": "int64"})

    partials = ds.map_batches(partial_hist, batch_format="pandas")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for status, g in df.groupby("o_orderstatus", sort=True):
            h = g.groupby("bin")["c"].sum().sort_index()
            n = int(h.sum())
            cum = h.cumsum()
            row = [status, n]
            for _, num, den in _HISTO_QS:
                k = (num * n + den - 1) // den        # ceil(num*n/den)
                b = int(cum.index[cum.to_numpy() >= k][0])
                row.append((b + 1) * bin_cents)
            rows.append(row)
        cols = ["o_orderstatus", "n_orders"] + [
            f"{name}_ub_cents" for name, _, _ in _HISTO_QS]
        return pd.DataFrame(rows, columns=cols).astype(
            {c: "int64" for c in cols[1:]})

    return bucketed_group_apply(partials, ["o_orderstatus"], finalize,
                                num_buckets=4)


def events_hopping(sf_dir: str, size_min: int = 60,
                   hop_min: int = 30) -> rd.Dataset:
    """Hopping (sliding) windows: size 60 min, hop 30 min — every event
    lands in size/hop windows.  Stream-shaped §2.9 extension beyond the
    tumbling-hour case: vectorised per-batch explode to (type, win_start)
    rows, then the same partial+final count."""
    import numpy as np

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])
    k = size_min // hop_min

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].to_numpy()
        base = ts.astype("datetime64[m]").astype(np.int64)  # minutes
        first = ((base - (size_min - hop_min)) // hop_min) * hop_min
        starts = (np.repeat(first, k)
                  + np.tile(np.arange(k, dtype=np.int64) * hop_min,
                            len(df)))
        ev_min = np.repeat(base, k)
        keep = (starts <= ev_min) & (ev_min < starts + size_min)
        out = pd.DataFrame({
            "event_type": np.repeat(df["event_type"].to_numpy(), k)[keep],
            "win_start": starts[keep].astype("datetime64[m]")
            .astype("datetime64[us]"),
            "value_cents": np.repeat(
                _cents(df["value"].to_numpy()), k)[keep],
        })
        g = out.groupby(["event_type", "win_start"], sort=True).agg(
            n=("value_cents", "size"),
            sum_value_cents=("value_cents", "sum")).reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    partials = ds.map_batches(explode, batch_format="pandas")
    return bucketed_sum(partials, ["event_type", "win_start"],
                        ["n", "sum_value_cents"], num_buckets=16)


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour window per event_type (stream-shaped pattern,
    ray_guide.md L187-198): count + integer-cent value sum."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(hour=df["ts"].dt.floor("h"),
                       value_cents=_cents(df["value"].to_numpy()))
        g = df.groupby(["event_type", "hour"], sort=True).agg(
            n=("value_cents", "size"),
            sum_value_cents=("value_cents", "sum")).reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_sum(partials, ["event_type", "hour"],
                        ["n", "sum_value_cents"], num_buckets=16)


def event_props_k_stats(sf_dir: str) -> rd.Dataset:
    """Per-event_type stats of the ``k`` field extracted from the JSON-ish
    ``props`` string column (F-series scalar function: field extraction
    via one vectorised RE2 kernel — no per-row json.loads).

    Determinism: avg is derived from exact integer (count, sum) partials,
    so distribution order can't change it; half-up 6 dp shared with the
    SQL mirror."""
    import pyarrow.compute as pc

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "props"])

    def partial(t: pa.Table) -> pd.DataFrame:
        ks = pc.struct_field(
            pc.extract_regex(t["props"], pattern=r'"k": (?P<k>[0-9]+)'),
            "k").cast(pa.int64())
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "k": ks.to_pandas(),
        })
        g = df.groupby("event_type", sort=True).agg(
            n=("k", "size"), sum_k=("k", "sum"),
            max_k=("k", "max")).reset_index()
        g["n"] = g["n"].astype("int64")
        g["sum_k"] = g["sum_k"].astype("int64")
        g["max_k"] = g["max_k"].astype("int64")
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", sort=False, as_index=False).agg(
            n=("n", "sum"), sum_k=("sum_k", "sum"), max_k=("max_k", "max"))

    from ..stages.groups import bucketed_group_apply
    out_schema = pa.schema([("event_type", pa.string()),
                            ("n", pa.int64()), ("sum_k", pa.int64()),
                            ("max_k", pa.int64())])
    merged = bucketed_group_apply(partials, ["event_type"], combine,
                                  num_buckets=4, out_schema=out_schema)

    def finalize(t: pa.Table) -> pa.Table:
        sum_k = t["sum_k"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        avg = np.floor(sum_k / n * 1e6 + 0.5) / 1e6
        return t.append_column("avg_k", pa.array(avg, type=pa.float64()))

    return merged.map_batches(finalize, batch_format="pyarrow")


def asof_user_order(sf_dir: str) -> rd.Dataset:
    """As-of join (§2.4 extension): each event matched to the user's most
    recent order at the event's timestamp — greatest o_orderdate <= ts,
    ties to the greatest o_orderkey.  Bucketed by user key; per bucket a
    sorted vectorised merge (stages/joins.asof_join)."""
    from ..stages.joins import asof_join

    events = read_parquet_clean(f"{sf_dir}/events.parquet",
                                columns=["event_id", "ts", "user_id"])
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"])
    j = asof_join(events, orders, by_left="user_id", by_right="o_custkey",
                  on_left="ts", on_right="o_orderdate",
                  tie_right="o_orderkey", num_buckets=16)
    return j.map_batches(
        lambda t: t.select(["event_id", "o_orderkey", "o_totalprice"]),
        batch_format="pyarrow")


def order_next_event(sf_dir: str) -> rd.Dataset:
    """FORWARD as-of join (completes the as-of family): each order
    matched to the customer's FIRST event at or after the order date —
    smallest ts >= o_orderdate, equal-ts ties to the smallest event_id.
    Same co-partitioned sorted-merge plan as asof_user_order, direction
    flipped; inner, so orders of customers with no events drop."""
    from ..stages.joins import asof_join

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    events = read_parquet_clean(f"{sf_dir}/events.parquet",
                                columns=["event_id", "ts", "user_id"])
    j = asof_join(orders, events, by_left="o_custkey", by_right="user_id",
                  on_left="o_orderdate", on_right="ts",
                  tie_right="event_id", num_buckets=16,
                  direction="forward")
    return j.map_batches(
        lambda t: t.select(["o_orderkey", "event_id"]),
        batch_format="pyarrow")


def customer_running_total(sf_dir: str) -> rd.Dataset:
    """Partitioned window function (§2.9 extension): per-customer running
    order total — ROW_NUMBER + cumulative SUM over (PARTITION BY
    o_custkey ORDER BY o_orderdate, o_orderkey).  All rows of a customer
    land in one hash bucket, so the ordered scan is a vectorised pandas
    sort + groupby-cumsum per bucket — never a global sort.  Monetary
    sums use exact integer cents (module float rule); the orderkey
    tie-break makes the frame deterministic, shared with the SQL mirror.
    """
    from ..stages.groups import bucketed_group_apply

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_totalprice"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "o_custkey": df["o_custkey"],
            "o_orderdate": df["o_orderdate"],
            "cents": _cents(df["o_totalprice"].to_numpy()),
        })

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort", ignore_index=True)
        g = df.groupby("o_custkey", sort=False)
        df["rn"] = (g.cumcount() + 1).astype("int64")
        df["cum_cents"] = g["cents"].cumsum().astype("int64")
        return df[["o_orderkey", "o_custkey", "rn", "cum_cents"]]

    out_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_custkey", pa.int64()),
                            ("rn", pa.int64()),
                            ("cum_cents", pa.int64())])
    return bucketed_group_apply(ds.map_batches(pre, batch_format="pandas"),
                                ["o_custkey"], win, num_buckets=32,
                                out_schema=out_schema)


def event_recent_activity(sf_dir: str, window_min: int = 360) -> rd.Dataset:
    """Range (interval) join — §2.4 extension beyond equi/as-of joins:
    each event aggregated against the SAME user's OTHER events in the
    trailing ``window_min`` minutes (count + exact cent sum of their
    values) — the classic feature-engineering window self-join.
    Physical plan: the event stream is co-partitioned with itself on the
    user key (joins.bucketed_pair_apply) and a vectorised merge +
    interval filter + groupby per bucket; the non-equi predicate never
    leaves a bucket, so no all-to-all beyond the one key shuffle.  Hot
    users: raise num_buckets / salt upstream (the per-bucket merge
    materialises that bucket's candidate pairs)."""
    from ..stages.joins import bucketed_pair_apply

    cols = ["event_id", "ts", "user_id", "value"]
    events = read_parquet_clean(f"{sf_dir}/events.parquet", columns=cols)

    def fn(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        m = ldf[["event_id", "ts", "user_id"]].merge(
            rdf, on="user_id", suffixes=("", "_o"))
        keep = ((m["ts_o"] <= m["ts"])
                & (m["ts_o"] >= m["ts"] - pd.Timedelta(minutes=window_min))
                & (m["event_id_o"] != m["event_id"]))
        m = m[keep]
        if not len(m):
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_recent": pd.Series([], dtype="int64"),
                                 "sum_cents": pd.Series([], dtype="int64")})
        cents = _cents(m["value"].to_numpy())
        g = (pd.DataFrame({"event_id": m["event_id"].to_numpy(),
                           "cents": cents})
             .groupby("event_id", as_index=False)
             .agg(n_recent=("cents", "size"), sum_cents=("cents", "sum")))
        g["n_recent"] = g["n_recent"].astype("int64")
        g["sum_cents"] = g["sum_cents"].astype("int64")
        return g

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("n_recent", pa.int64()),
                            ("sum_cents", pa.int64())])
    return bucketed_pair_apply(events, events,
                               on_left=["user_id"], on_right=["user_id"],
                               fn=fn, out_schema=out_schema,
                               num_buckets=16)


def events_rollup(sf_dir: str) -> rd.Dataset:
    """GROUP BY ROLLUP(event_type, day) over events — count + exact cent
    sum at three levels: (type, day), per-type subtotal, grand total,
    with ``lvl`` = the SQL GROUPING bitmask (0 / 1 / 3).  The classic
    rollup plan: shuffle ONCE for the finest level, then derive every
    coarser level by re-aggregating the (tiny) fine aggregate — the raw
    events are scanned exactly once at any scale."""
    from ..stages.groups import bucketed_group_apply

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(day=df["ts"].dt.floor("D"),
                       cents=_cents(df["value"].to_numpy()))
        g = df.groupby(["event_type", "day"], sort=True).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")).reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    fine = bucketed_sum(ds.map_batches(partial, batch_format="pandas"),
                        ["event_type", "day"], ["n", "sum_cents"],
                        num_buckets=16).materialize()

    schema = pa.schema([("event_type", pa.string()),
                        ("day", pa.timestamp("us")),
                        ("n", pa.int64()), ("sum_cents", pa.int64()),
                        ("lvl", pa.int64())])

    def with_lvl(lvl: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("lvl", pa.array([lvl] * t.num_rows,
                                                   type=pa.int64())) \
                    .select(schema.names).cast(schema)
        return fn

    lvl0 = fine.map_batches(with_lvl(0), batch_format="pyarrow")

    def sub(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False, as_index=False).agg(
            n=("n", "sum"), sum_cents=("sum_cents", "sum"))
        g["day"] = pd.Series([pd.NaT] * len(g), dtype="datetime64[us]")
        g["lvl"] = np.int64(1)
        return g[["event_type", "day", "n", "sum_cents", "lvl"]]

    lvl1 = bucketed_group_apply(fine, ["event_type"], sub, num_buckets=4,
                                out_schema=schema).materialize()

    tot = lvl1.to_pandas()
    grand = pa.Table.from_pylist([{
        "event_type": None, "day": None,
        "n": int(tot["n"].sum()), "sum_cents": int(tot["sum_cents"].sum()),
        "lvl": 3,
    }], schema=schema)

    return lvl0.union(lvl1, rd.from_arrow(grand))


def user_event_pivot(sf_dir: str) -> rd.Dataset:
    """Pivot: one row per user, one count column per event_type
    (conditional aggregation — the wide-table feature layout).  The
    column set is discovered with a cheap distributed distinct (tiny
    driver merge — event-type cardinality is bounded by design, the
    usual pivot contract), then the counts are partial-before-shuffle
    folds; column order is sorted, so the schema is deterministic."""
    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    types = sorted({
        r["event_type"]
        for r in ds.map_batches(
            lambda t: pa.table(
                {"event_type": t["event_type"].unique()}),
            batch_format="pyarrow").take_all()})
    cols = [f"n_{tp}" for tp in types]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = pd.crosstab(df["user_id"], df["event_type"])
        x = x.reindex(columns=types, fill_value=0).reset_index()
        x.columns = ["user_id"] + cols
        for c in cols:
            x[c] = x[c].astype("int64")
        return x

    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_sum(partials, ["user_id"], cols, num_buckets=8)


def lineitem_winsorized(sf_dir: str, lo_pct: int = 5, hi_pct: int = 95,
                        bin_cents: int = 100_000) -> rd.Dataset:
    """Winsorized per-group sum: extended prices clipped to the exact
    per-returnflag [p05, p95] before summing — the outlier-robust
    aggregate every quality/score pipeline wants before thresholding.

    Exactness without co-location: the cutoffs are percentile_disc-style
    order statistics (the value whose ROW_NUMBER equals ceil(q*n) under
    the deterministic (cents, id) sort), extracted with the same
    exact_partitioned_ranks two-pass machinery as NTILE/RANK — rows at
    the target ranks identify themselves from (bin start rank, offset),
    so no partition ever sits in one task.  The 3-groups × 2 cutoffs
    result is driver-collected (model-shaped) and broadcast into a
    second clipping pass that partial-sums before one tiny shuffle."""
    from ..stages.groups import bucketed_group_apply  # noqa: F401
    from ..util import collect_rows

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "cents": _cents(df["l_extendedprice"].to_numpy()),
            "id": (df["l_orderkey"].to_numpy() * 10
                   + df["l_linenumber"].to_numpy()).astype("int64")})

    src = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag",
                 "l_extendedprice"])
    pr = src.map_batches(pairs, batch_format="pandas")

    cut_schema = pa.schema([("l_returnflag", pa.string()),
                            ("which", pa.string()),
                            ("cents", pa.int64())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        rn = start + np.arange(len(g), dtype=np.int64) + 1
        targets = (("lo", (n * lo_pct + 99) // 100),
                   ("hi", (n * hi_pct + 99) // 100))
        outs = []
        for which, r in targets:
            hit = g[rn == r]
            if len(hit):
                outs.append(pd.DataFrame({
                    "l_returnflag": hit["l_returnflag"].to_numpy(),
                    "which": which,
                    "cents": hit["cents"].to_numpy()}))
        if not outs:
            return cut_schema.empty_table().to_pandas()
        return pd.concat(outs, ignore_index=True)

    cuts = collect_rows(exact_partitioned_ranks(
        pr, "l_returnflag", "cents", "id", bin_cents, emit, cut_schema))
    lo_of = {r["l_returnflag"]: r["cents"] for r in cuts
             if r["which"] == "lo"}
    hi_of = {r["l_returnflag"]: r["cents"] for r in cuts
             if r["which"] == "hi"}
    b_ref = ray.put((lo_of, hi_of))

    def clip_partial(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi = ray.get(b_ref)
        c = df["cents"].to_numpy()
        lov = df["l_returnflag"].map(lo).to_numpy(dtype=np.int64)
        hiv = df["l_returnflag"].map(hi).to_numpy(dtype=np.int64)
        w = np.clip(c, lov, hiv)
        g = pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "n": np.ones(len(df), dtype=np.int64),
            "sum_cents": c, "sum_wins_cents": w})
        return g.groupby("l_returnflag", sort=True, as_index=False).agg(
            n=("n", "sum"), sum_cents=("sum_cents", "sum"),
            sum_wins_cents=("sum_wins_cents", "sum"))

    partial = pr.map_batches(clip_partial, batch_format="pandas")
    summed = bucketed_sum(partial, ["l_returnflag"],
                          ["n", "sum_cents", "sum_wins_cents"],
                          num_buckets=2)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi = ray.get(b_ref)
        df = df.copy()
        df["lo_cents"] = df["l_returnflag"].map(lo).astype("int64")
        df["hi_cents"] = df["l_returnflag"].map(hi).astype("int64")
        return df

    return summed.map_batches(attach, batch_format="pandas")


def lineitem_mad(sf_dir: str, bin_cents: int = 100_000) -> pa.Table:
    """Per-returnflag median + median absolute deviation of extended
    price — the robust dispersion pair every outlier-gate wants before
    setting a threshold (score > med + k*MAD).

    Both medians are percentile_disc(0.5)-style order statistics (the
    value at ROW_NUMBER == ceil(n/2) under the deterministic
    (value, id) sort), each extracted with the exact_partitioned_ranks
    two-pass machinery — no partition is ever co-located in one task.
    Pass 1 finds the per-group median; its 3-row result broadcasts into
    pass 2, which ranks |cents - median| the same way.  Final result is
    group-cardinality-sized (model-shaped driver assembly)."""
    from ..util import collect_rows

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "cents": _cents(df["l_extendedprice"].to_numpy()),
            "id": (df["l_orderkey"].to_numpy() * 10
                   + df["l_linenumber"].to_numpy()).astype("int64")})

    src = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag",
                 "l_extendedprice"])
    pr = src.map_batches(pairs, batch_format="pandas")

    med_schema = pa.schema([("l_returnflag", pa.string()),
                            ("n", pa.int64()), ("cents", pa.int64())])

    def emit_median(value_col):
        def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
            rn = start + np.arange(len(g), dtype=np.int64) + 1
            hit = g[rn == (n * 50 + 99) // 100]
            if not len(hit):
                return med_schema.empty_table().to_pandas()
            return pd.DataFrame({
                "l_returnflag": hit["l_returnflag"].to_numpy(),
                "n": np.int64(n),
                "cents": hit[value_col].to_numpy()})
        return emit

    meds = collect_rows(exact_partitioned_ranks(
        pr, "l_returnflag", "cents", "id", bin_cents,
        emit_median("cents"), med_schema))
    med_of = {r["l_returnflag"]: r["cents"] for r in meds}
    m_ref = ray.put(med_of)

    def dev_pairs(df: pd.DataFrame) -> pd.DataFrame:
        med = ray.get(m_ref)
        mv = df["l_returnflag"].map(med).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "cents": np.abs(df["cents"].to_numpy() - mv),
            "id": df["id"]})

    mads = collect_rows(exact_partitioned_ranks(
        pr.map_batches(dev_pairs, batch_format="pandas"),
        "l_returnflag", "cents", "id", bin_cents,
        emit_median("cents"), med_schema))
    mad_of = {r["l_returnflag"]: (r["n"], r["cents"]) for r in mads}
    flags = sorted(med_of)
    return pa.table({
        "l_returnflag": pa.array(flags, pa.string()),
        "n": pa.array([mad_of[f][0] for f in flags], pa.int64()),
        "median_cents": pa.array([med_of[f] for f in flags], pa.int64()),
        "mad_cents": pa.array([mad_of[f][1] for f in flags], pa.int64()),
    })


def orders_weighted_sample(sf_dir: str, k: int = 100) -> pa.Table:
    """Deterministic weighted priority sample of orders: priority =
    ((md5_64(o_orderkey) >> 34) * 1e6) // w_cents — a content-stable
    stand-in for the -ln(u)/w exponential-race key (heavier orders draw
    smaller priorities more often), with the float ln replaced by exact
    integer math so engine and mirror bit-agree.  Global k smallest by
    (priority, o_orderkey).

    Distributed shape: stateless per-block hash + partial top-k, then a
    driver merge of the k-per-block survivors (O(k x blocks) rows, the
    top_customers pattern) — no shuffle, no global sort."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["o_orderkey"].to_numpy()
        w = _cents(df["o_totalprice"].to_numpy())
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(x).encode()).digest()[:8],
                            "little") >> 34 for x in keys),
            dtype=np.int64, count=len(keys))
        pr = (h * 1_000_000) // w
        out = pd.DataFrame({"o_orderkey": keys, "w_cents": w,
                            "priority": pr})
        return out.nsmallest(k, ["priority", "o_orderkey"])

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_totalprice"])
    cand = src.map_batches(partial, batch_format="pandas").to_pandas()
    top = cand.sort_values(["priority", "o_orderkey"],
                           kind="mergesort").head(k)
    return pa.Table.from_pandas(top.reset_index(drop=True),
                                preserve_index=False)


def customer_cohort_retention(sf_dir: str,
                              num_buckets: int = 8) -> rd.Dataset:
    """Cohort retention matrix: customers grouped by first-order month
    (cohort), counted per months-since-cohort delta — the standard
    retention triangle.

    Distributed shape: per-batch partial MIN month per customer folds
    through one bucketed shuffle (cohort table); orders re-key on
    customer for a partitioned hash join against it (never broadcast —
    the cohort table scales with customers); per-(cohort, delta)
    distinct-customer counting dedupes (custkey, cohort, delta) rows in
    one more bucketed pass, partial-before-shuffle at every step."""
    from ..stages.groups import bucketed_group_apply
    from ..stages.joins import hash_join

    def months(df: pd.DataFrame) -> pd.DataFrame:
        dt = pd.DatetimeIndex(df["o_orderdate"])
        return pd.DataFrame({
            "o_custkey": df["o_custkey"],
            "m": (dt.year * 12 + dt.month).astype("int64")})

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])
    om = src.map_batches(months, batch_format="pandas")

    def min_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False)["m"].min() \
            .rename(columns={"m": "cm"})

    def min_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False)["cm"].min()

    cohort = bucketed_group_apply(
        om.map_batches(min_partial, batch_format="pandas"),
        ["o_custkey"], min_final, num_buckets=num_buckets,
        out_schema=pa.schema([("o_custkey", pa.int64()),
                              ("cm", pa.int64())]))

    j = hash_join(om, cohort, on=["o_custkey"],
                  num_buckets=num_buckets)

    def delta_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "o_custkey": df["o_custkey"],
            "cohort_m": df["cm"],
            "delta_months": df["m"].to_numpy() - df["cm"].to_numpy()})
        return out.drop_duplicates(ignore_index=True)

    trip = j.map_batches(delta_partial, batch_format="pandas")

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        g = d.groupby(["cohort_m", "delta_months"], as_index=False) \
            .agg(n_customers=("o_custkey", "size"))
        return g.astype({"n_customers": "int64"})

    return bucketed_group_apply(
        trip, ["cohort_m", "delta_months"], count_distinct,
        num_buckets=num_buckets,
        out_schema=pa.schema([("cohort_m", pa.int64()),
                              ("delta_months", pa.int64()),
                              ("n_customers", pa.int64())]))


def order_price_percentile_cont(sf_dir: str, ps=(25, 50, 75),
                                bin_cents: int = 100_000) -> pa.Table:
    """Exact INTERPOLATED percentiles (SQL percentile_cont semantics)
    per o_orderstatus, in integer centi-cents: for percentile p the
    0-based position is p*(n-1)/100, so
    val_centi = 100*v[lo] + rem*(v[lo+1] - v[lo]) with
    lo = (p*(n-1)) // 100 and rem = (p*(n-1)) % 100 — the linear
    interpolation lifted to exact integers (no float ever).

    The two bracketing order statistics per (group, p) come out of the
    exact_partitioned_ranks two-pass machinery (rows at target ranks
    identify themselves from bin start + offset) — no partition is ever
    co-located; the groups x ps x 2 result is driver-assembled."""
    from ..util import collect_rows

    pr = _order_price_pairs(sf_dir).map_batches(
        lambda df: pd.DataFrame({
            "o_orderstatus": df["o_orderstatus"],
            "cents": df["price_cents"],
            "id": df["o_orderkey"]}),
        batch_format="pandas")

    hit_schema = pa.schema([("o_orderstatus", pa.string()),
                            ("p", pa.int64()), ("which", pa.string()),
                            ("cents", pa.int64())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        rn = start + np.arange(len(g), dtype=np.int64) + 1
        outs = []
        for p in ps:
            lo_rn = (p * (n - 1)) // 100 + 1
            rem = (p * (n - 1)) % 100
            for which, r in (("lo", lo_rn),
                             ("hi", lo_rn + 1 if rem else None)):
                if r is None:
                    continue
                hit = g[rn == r]
                if len(hit):
                    outs.append(pd.DataFrame({
                        "o_orderstatus":
                            hit["o_orderstatus"].to_numpy(),
                        "p": np.int64(p), "which": which,
                        "cents": hit["cents"].to_numpy()}))
        if not outs:
            return hit_schema.empty_table().to_pandas()
        return pd.concat(outs, ignore_index=True)

    hits = collect_rows(exact_partitioned_ranks(
        pr, "o_orderstatus", "cents", "id", bin_cents, emit,
        hit_schema))
    # n per group rides in via a tiny count pass (needed for rem)
    cnt = collect_rows(bucketed_sum(
        pr.map_batches(
            lambda df: df.groupby("o_orderstatus", as_index=False)
            .size().rename(columns={"size": "n"})
            .astype({"n": "int64"}),
            batch_format="pandas"),
        ["o_orderstatus"], ["n"], num_buckets=2))
    n_of = {r["o_orderstatus"]: r["n"] for r in cnt}
    lo = {(r["o_orderstatus"], r["p"]): r["cents"] for r in hits
          if r["which"] == "lo"}
    hi = {(r["o_orderstatus"], r["p"]): r["cents"] for r in hits
          if r["which"] == "hi"}
    rows = []
    for (s, p), vlo in sorted(lo.items()):
        rem = (p * (n_of[s] - 1)) % 100
        vhi = hi.get((s, p), vlo)
        rows.append((s, p, 100 * vlo + rem * (vhi - vlo)))
    return pa.table({
        "o_orderstatus": pa.array([r[0] for r in rows], pa.string()),
        "p": pa.array([r[1] for r in rows], pa.int64()),
        "val_centi": pa.array([r[2] for r in rows], pa.int64())})


def trailing_active_users(sf_dir: str, win_days: int = 7,
                          num_buckets: int = 8) -> rd.Dataset:
    """Rolling distinct-user count per day (the 7-day WAU curve): for
    every day with events, the number of distinct users active in the
    trailing ``win_days`` window ending that day.

    Distributed shape: the raw stream collapses to distinct
    (day, user) pairs (in-batch dedup, then one bucketed distinct) —
    already tiny vs the event stream; each pair then fans out to the
    <= win_days report-days it supports (day .. day+win-1, only days
    that themselves have events — shared rule with the mirror so
    trailing windows of EVENT days, not calendar gaps, never appear),
    and a second bucketed pass counts distinct users per report day.
    The fan-out factor is the window length, never the data size."""
    from ..stages.groups import bucketed_group_apply

    src = read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["ts", "user_id"])

    def day_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # pin the unit: parquet timestamp[us] loads as datetime64[us]
        # in pandas 2, so asi8 is unit-dependent without as_unit
        idx = pd.DatetimeIndex(df["ts"]).as_unit("us").normalize()
        day = (idx.asi8 // 86_400_000_000).astype("int64")
        return pd.DataFrame({"day": day, "user_id": df["user_id"]}) \
            .drop_duplicates(ignore_index=True)

    pairs = src.map_batches(day_pairs, batch_format="pandas")

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(ignore_index=True)

    dpairs = bucketed_group_apply(
        pairs, ["day", "user_id"], dedup, num_buckets=num_buckets,
        out_schema=pa.schema([("day", pa.int64()),
                              ("user_id", pa.int64())]))

    # the set of report days (days with >= 1 event) is calendar-bounded
    # — collect + broadcast (same model-shaped argument as cohorts)
    from ..util import collect_rows
    days = sorted({r["day"] for r in collect_rows(
        bucketed_group_apply(
            pairs.map_batches(
                lambda df: df[["day"]].drop_duplicates(),
                batch_format="pandas"),
            ["day"], dedup, num_buckets=2,
            out_schema=pa.schema([("day", pa.int64())])))})
    days_arr = np.asarray(days, dtype=np.int64)
    d_ref = ray.put(days_arr)

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        dv = ray.get(d_ref)
        day = df["day"].to_numpy()
        uid = df["user_id"].to_numpy()
        # report days in [day, day + win) that actually have events
        lo = np.searchsorted(dv, day, side="left")
        hi = np.searchsorted(dv, day + win_days, side="left")
        cnt = hi - lo
        idx = np.repeat(lo, cnt) + _ragged_arange(cnt)
        return pd.DataFrame({
            "report_day": dv[idx],
            "user_id": np.repeat(uid, cnt)}).drop_duplicates(
                ignore_index=True)

    fanned = dpairs.map_batches(fan_out, batch_format="pandas")

    def count_users(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        g = d.groupby("report_day", as_index=False) \
            .agg(n_users=("user_id", "size"))
        return g.astype({"n_users": "int64"})

    return bucketed_group_apply(
        fanned, ["report_day"], count_users, num_buckets=num_buckets,
        out_schema=pa.schema([("report_day", pa.int64()),
                              ("n_users", pa.int64())]))


def _ragged_arange(counts: "np.ndarray") -> "np.ndarray":
    """[0..c0), [0..c1), ... concatenated — vectorised (index minus the
    repeated segment start)."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(counts)
    seg_start = np.repeat(ends - counts, counts)
    return np.arange(total, dtype=np.int64) - seg_start


def orders_weighted_sample_by_status(sf_dir: str,
                                     k: int = 40) -> pa.Table:
    """STRATIFIED deterministic weighted sampling: the k smallest
    priority keys PER o_orderstatus (same exact integer priority
    contract as orders_weighted_sample — ((md5_64 >> 34) * 1e6) //
    w_cents).  Per-block partial top-k per stratum, then a driver merge
    of the k-per-(block, stratum) survivors — O(k x blocks x strata)
    rows, no shuffle, no global sort."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys = df["o_orderkey"].to_numpy()
        w = _cents(df["o_totalprice"].to_numpy())
        h = np.fromiter(
            (int.from_bytes(hashlib.md5(str(x).encode()).digest()[:8],
                            "little") >> 34 for x in keys),
            dtype=np.int64, count=len(keys))
        out = pd.DataFrame({"o_orderstatus": df["o_orderstatus"],
                            "o_orderkey": keys, "w_cents": w,
                            "priority": (h * 1_000_000) // w})
        out = out.sort_values(["o_orderstatus", "priority", "o_orderkey"],
                              kind="mergesort")
        return out.groupby("o_orderstatus", sort=False).head(k)

    src = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    cand = src.map_batches(partial, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["o_orderstatus", "priority", "o_orderkey"],
                            kind="mergesort")
    top = cand.groupby("o_orderstatus", sort=False).head(k)
    top = top.sort_values(["o_orderstatus", "priority", "o_orderkey"],
                          kind="mergesort", ignore_index=True)
    return pa.Table.from_pandas(top, preserve_index=False)


def doc_readability_percentile(sf_dir: str,
                               bin_width: int = 10_000_000) -> rd.Dataset:
    """Quantile normalisation of a quality signal: each document's
    PERCENT_RANK over the corpus by Flesch score, in integer micro-
    units — the scale-free quality column curation thresholds are set
    on.  Flesch micro-units come from the already-mirrored readability
    kernel; the rank runs on the generic exact two-pass machinery with
    a single global partition (no co-location), RANK tie semantics via
    a within-bin searchsorted against the bin's exclusive start rank."""
    from ..stages.textstats import read_documents, readability_batch

    docs = read_documents(sf_dir)

    def to_pairs(t: pa.Table) -> pd.DataFrame:
        r = readability_batch(t)
        fre = r["fre6"].to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "part": "all",
            "doc_id": r["doc_id"].to_numpy(zero_copy_only=False),
            "flesch_micro": np.floor(fre * 1e6 + 0.5).astype("int64")})

    pairs = docs.map_batches(to_pairs, batch_format="pyarrow")
    schema = pa.schema([("doc_id", pa.int64()),
                        ("flesch_micro", pa.int64()),
                        ("pr_micro", pa.int64())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        v = g["flesch_micro"].to_numpy()
        first = np.searchsorted(v, v, side="left")
        rank = start + first + 1
        if n > 1:
            pr = ((rank - 1) * 1_000_000) // (n - 1)
        else:
            pr = np.zeros(len(g), dtype=np.int64)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "flesch_micro": v, "pr_micro": pr.astype("int64")})

    # pin: the Flesch pass is regex-heavy over full text — compute once
    return exact_partitioned_ranks(pairs, "part", "flesch_micro",
                                   "doc_id", bin_width, emit, schema,
                                   num_buckets=8, pin=True)


def order_price_cume(sf_dir: str, bin_cents: int = 100_000) -> rd.Dataset:
    """CUME_DIST per order status over price — count(value ≤ v)/N from
    the exact two-pass rank machinery (ties share: within-bin
    searchsorted(right) against the bin's exclusive start rank), 6 dp
    half-up.  Completes the rank-window family beside ROW_NUMBER/RANK/
    PERCENT_RANK/NTILE with no co-located partition."""
    schema = pa.schema([("o_orderkey", pa.int64()),
                        ("o_orderstatus", pa.string()),
                        ("cd6", pa.float64())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        cents = g["price_cents"].to_numpy()
        le = start + np.searchsorted(cents, cents, side="right")
        cd = np.floor(le.astype(np.float64) / n * 1e6 + 0.5) / 1e6
        return pd.DataFrame({
            "o_orderkey": g["o_orderkey"].to_numpy(),
            "o_orderstatus": g["o_orderstatus"].to_numpy(),
            "cd6": cd})

    return exact_partitioned_ranks(_order_price_pairs(sf_dir),
                                   "o_orderstatus", "price_cents",
                                   "o_orderkey", bin_cents, emit, schema)
