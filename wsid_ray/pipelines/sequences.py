"""Per-key ordered-sequence operators over the events stream (SURVEY.md
§2.9 extensions beyond sessions/hopping): LAG-style inter-event gaps,
ordered path aggregation (funnel analysis), and grouped argmax (top
event type per user).

All three share one physical plan — the classic "never a global sort"
window shape (same as analytics.customer_running_total): rows are hash-
bucketed on the partition key, and each bucket does a vectorised pandas
sort + groupby scan.  A user's whole history lands in one bucket, so the
per-key ordered semantics hold exactly; hot keys are handled by raising
``num_buckets`` (one key still can't split — salt upstream if a single
user's history exceeds a task, and note that paths/gaps are per-key
sequential by definition).

Determinism contracts (shared verbatim with the SQL mirrors):
  * ordering is always (ts, event_id) — the id tie-break makes every
    window frame unique;
  * gaps are exact integer microseconds (timestamp64[us] arithmetic);
  * argmax ties resolve to the lexicographically smallest event_type.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..sources.pqclean import read_parquet_clean
from ..stages.groups import bucketed_group_apply


def _events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return read_parquet_clean(f"{sf_dir}/events.parquet", columns=columns)


def user_event_gaps(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """LAG window function: for each event, row number and the exact
    microsecond gap to the SAME user's previous event (NULL for the
    first event of a user) — `ROW_NUMBER()` + `ts - LAG(ts)` OVER
    (PARTITION BY user_id ORDER BY ts, event_id)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort", ignore_index=True)
        g = df.groupby("user_id", sort=False)
        rn = (g.cumcount() + 1).astype("int64")
        # datetime64[us] view -> epoch microseconds; diff within the
        # group is exact integer arithmetic (no float on the path)
        tsi = df["ts"].astype("datetime64[us]").astype("int64")
        gap = tsi.groupby(df["user_id"], sort=False).diff().astype("Int64")
        return pd.DataFrame({"event_id": df["event_id"],
                             "user_id": df["user_id"],
                             "rn": rn, "gap_us": gap})

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("rn", pa.int64()),
                            ("gap_us", pa.int64())])
    return bucketed_group_apply(ds, ["user_id"], win,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def user_event_neighbors(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """LAG + LEAD linkage: for each event, the previous and next
    event_id of the same user in (ts, event_id) order (NULL at the
    partition edges) — the neighbor projection sequence models train
    on.  Same bucketed plan as user_event_gaps."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort", ignore_index=True)
        g = df.groupby("user_id", sort=False)
        return pd.DataFrame({
            "event_id": df["event_id"],
            "user_id": df["user_id"],
            "prev_event_id": g["event_id"].shift(1).astype("Int64"),
            "next_event_id": g["event_id"].shift(-1).astype("Int64")})

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("prev_event_id", pa.int64()),
                            ("next_event_id", pa.int64())])
    return bucketed_group_apply(ds, ["user_id"], win,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def user_event_path(sf_dir: str, sep: str = ">",
                    num_buckets: int = 16) -> rd.Dataset:
    """Ordered string aggregation (funnel / clickstream path): per user,
    the event_type sequence joined by ``sep`` in (ts, event_id) order,
    plus the event count.  Scale note: the path string is O(events of
    one user) — bounded fan-in per key, but a single pathological key
    produces a single giant string; cap upstream if user histories are
    unbounded."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort", ignore_index=True)
        g = df.groupby("user_id", sort=False)
        out = g.agg(n=("event_type", "size"),
                    path=("event_type", sep.join)).reset_index()
        out["n"] = out["n"].astype("int64")
        return out[["user_id", "n", "path"]]

    out_schema = pa.schema([("user_id", pa.int64()), ("n", pa.int64()),
                            ("path", pa.string())])
    return bucketed_group_apply(ds, ["user_id"], agg,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def user_purchase_carry(sf_dir: str, carry_type: str = "purchase",
                        num_buckets: int = 16) -> rd.Dataset:
    """Conditional fill-forward (gap filling / last-observation-carried-
    forward): for each event, the epoch-microsecond timestamp of the
    SAME user's most recent ``carry_type`` event at or before it in
    (ts, event_id) order (NULL while the user has none yet), plus the
    exact integer microseconds elapsed since it.  The classic
    "time since last purchase" feature column.

    Determinism: the carried value is a monotone max along the frame
    (ts is the ordering key), so the SQL mirror is
    ``max(epoch_us(ts)) FILTER (event_type = …) OVER (… ROWS UNBOUNDED
    PRECEDING)`` — no IGNORE NULLS needed, and ties on equal ts carry
    the identical value on both sides."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort", ignore_index=True)
        tsi = df["ts"].astype("datetime64[us]").astype("int64")
        # nullable Int64 from the start: epoch microseconds (~1.8e18)
        # exceed float64's exact-integer range, so a NaN-based mask
        # would corrupt the carried value
        hit = tsi.astype("Int64").where(
            df["event_type"].to_numpy() == carry_type)
        carried = hit.groupby(df["user_id"], sort=False).ffill()
        return pd.DataFrame({"event_id": df["event_id"],
                             "user_id": df["user_id"],
                             "last_purchase_us": carried,
                             "since_us": (tsi - carried).astype("Int64")})

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("last_purchase_us", pa.int64()),
                            ("since_us", pa.int64())])
    return bucketed_group_apply(ds, ["user_id"], win,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def customer_rolling_orders(sf_dir: str, window: int = 7,
                            num_buckets: int = 16) -> rd.Dataset:
    """ROWS-frame sliding window: per customer, in (o_orderdate,
    o_orderkey) order, the exact integer-cent sum and row count of the
    trailing ``window``-row frame (ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW) — the moving-average numerator/denominator pair kept
    as two int64 columns so no float ever enters the path.  Implemented
    as a per-group cumulative sum minus its ``window``-shifted self
    (pure int64 arithmetic, no pandas rolling float upcast)."""
    from .analytics import _cents

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort", ignore_index=True)
        cents = pd.Series(_cents(df["o_totalprice"].to_numpy()))
        g = df.groupby("o_custkey", sort=False)
        csum = cents.groupby(df["o_custkey"], sort=False).cumsum()
        # shift() on int64 upcasts to float64; route through nullable
        # Int64 so large cumulative cents stay exact
        lag = csum.astype("Int64") \
                  .groupby(df["o_custkey"], sort=False) \
                  .shift(window).fillna(0).astype("int64")
        rn = (g.cumcount() + 1).astype("int64")
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "o_custkey": df["o_custkey"],
            "win_cents": (csum - lag).astype("int64"),
            "win_n": rn.clip(upper=window).astype("int64")})

    out_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_custkey", pa.int64()),
                            ("win_cents", pa.int64()),
                            ("win_n", pa.int64())])
    return bucketed_group_apply(ds, ["o_custkey"], win,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def user_top_event_type(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Grouped mode / argmax: each user's most frequent event type (ties
    to the lexicographically smallest type).  Two-level aggregation —
    per-batch (user, type) partial counts, ONE bucketed shuffle keyed on
    user (all of a user's type-rows co-locate because the bucket key is
    the user alone), then a per-bucket combine + argmax."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], sort=True) \
              .size().rename("n").reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    partials = ds.map_batches(partial, batch_format="pandas")

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], sort=False,
                       as_index=False)["n"].sum()
        g = g.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True],
                          kind="mergesort", ignore_index=True)
        return g.drop_duplicates("user_id", keep="first")

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("event_type", pa.string()),
                            ("n", pa.int64())])
    return bucketed_group_apply(partials, ["user_id"], top1,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def user_daily_dense(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Time-series densification (gap filling): per user, one row for
    EVERY calendar day between their first and last event — n_events 0
    on silent days — the dense daily series sequence models and
    anomaly detectors train on.  Per-batch (user, day) partial counts
    shuffle once keyed on the user; the in-bucket expansion emits the
    missing days.  Fan-out is bounded by each user's active span in
    days (activity-bounded, never corpus-bounded); a decades-long
    pathological span should be windowed upstream."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].astype("datetime64[us]").dt.floor("D")
        g = pd.DataFrame({"user_id": df["user_id"], "day": day})
        out = g.groupby(["user_id", "day"], as_index=False).size()
        out = out.rename(columns={"size": "n_events"})
        out["n_events"] = out["n_events"].astype("int64")
        return out

    def dense(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["user_id", "day"], as_index=False)["n_events"] \
               .sum()
        frames = []
        for uid, g in df.groupby("user_id", sort=True):
            days = pd.date_range(g["day"].min(), g["day"].max(),
                                 freq="D", unit="us")
            s = g.set_index("day")["n_events"] \
                 .reindex(days, fill_value=0)
            frames.append(pd.DataFrame({
                "user_id": uid, "day": days,
                "n_events": s.to_numpy().astype("int64")}))
        if not frames:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "day": pd.Series(dtype="datetime64[us]"),
                                 "n_events": pd.Series(dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("day", pa.timestamp("us")),
                            ("n_events", pa.int64())])
    return bucketed_group_apply(
        ds.map_batches(part, batch_format="pandas"),
        ["user_id"], dense, num_buckets=num_buckets,
        out_schema=out_schema)


def event_user_skew(sf_dir: str, top_k: int = 10,
                    num_buckets: int = 16) -> "pa.Table":
    """Key-skew diagnostic — the report you read BEFORE picking a
    shuffle key at 100 TB: over the per-user event counts, the key
    cardinality, total rows, min/max per key, the top-``top_k`` keys'
    combined rows, and their share of the table in integer micro-units.
    Per-user counts are one bucketed partial sum; the scalar stats fold
    per BLOCK (count/sum/min/max partials + per-block top-k) and only
    k-per-block candidate rows ever reach the driver."""
    import numpy as np
    import ray

    from ..pipelines.analytics import bucketed_sum, partial_count

    ds = _events(sf_dir, ["user_id"])
    counts = bucketed_sum(partial_count(ds, ["user_id"]),
                          ["user_id"], ["n"], num_buckets=num_buckets)

    def block_stats(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy()
        top = np.sort(n)[::-1][:top_k]
        return pd.DataFrame({
            "n_users": [int(len(n))], "n_events": [int(n.sum())],
            "min_n": [int(n.min())], "max_n": [int(n.max())],
            "top": [top.tolist()]})

    parts = counts.map_batches(block_stats,
                               batch_format="pandas").take_all()
    n_users = sum(p["n_users"] for p in parts)
    n_events = sum(p["n_events"] for p in parts)
    min_n = min(p["min_n"] for p in parts)
    max_n = max(p["max_n"] for p in parts)
    top = sorted((x for p in parts for x in p["top"]),
                 reverse=True)[:top_k]
    top_sum = int(sum(top))
    return pa.table({
        "n_users": pa.array([n_users], pa.int64()),
        "n_events": pa.array([n_events], pa.int64()),
        "min_n": pa.array([min_n], pa.int64()),
        "max_n": pa.array([max_n], pa.int64()),
        "topk_sum": pa.array([top_sum], pa.int64()),
        "topk_share_micro": pa.array(
            [top_sum * 1_000_000 // n_events], pa.int64())})


def user_cum_distinct_types(sf_dir: str, num_buckets: int = 16
                            ) -> rd.Dataset:
    """Running DISTINCT count window: per event, how many distinct
    event types the user has seen UP TO AND INCLUDING it in
    (ts, event_id) order — the exploration-breadth feature
    (``count(DISTINCT …) OVER`` is unsupported in most engines; the
    standard rewrite is a cumulative sum of first-occurrence flags,
    which is exactly what the in-bucket scan computes)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort", ignore_index=True)
        first = (~df.duplicated(["user_id", "event_type"])) \
            .astype("int64")
        cum = first.groupby(df["user_id"], sort=False).cumsum()
        return pd.DataFrame({"event_id": df["event_id"],
                             "user_id": df["user_id"],
                             "cum_types": cum.astype("int64")})

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("cum_types", pa.int64())])
    return bucketed_group_apply(ds, ["user_id"], win,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def customer_order_streaks(sf_dir: str,
                           num_buckets: int = 16) -> rd.Dataset:
    """Gap-and-islands: per customer, runs of CONSECUTIVE active months
    (month key m = year*12 + month - 1) — active-month count, number of
    streaks, longest streak length and its earliest start month.

    Distributed shape: the orders stream collapses to distinct
    (c_custkey, m) pairs per batch, then one bucketed fold per customer
    does the vectorised sort + diff island split — month-cardinality
    rows only ever shuffle, and ties on the longest streak resolve to
    the earliest start (shared with the SQL mirror's min-over-max
    join)."""
    import numpy as np

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        idx = pd.DatetimeIndex(df["o_orderdate"]).as_unit("us")
        m = (idx.year * 12 + idx.month - 1).astype("int64")
        return pd.DataFrame({"c_custkey": df["o_custkey"]
                             .astype("int64"),
                             "m": m}).drop_duplicates()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        rows = []
        for ck, g in df.groupby("c_custkey", sort=True):
            ms = np.sort(g["m"].to_numpy())
            brk = np.flatnonzero(np.diff(ms) > 1) + 1
            starts = np.concatenate(([0], brk))
            ends = np.concatenate((brk, [len(ms)]))
            lens = ends - starts
            best = int(lens.max())
            first_best = starts[np.flatnonzero(lens == best)[0]]
            rows.append((ck, len(ms), len(lens), best,
                         int(ms[first_best])))
        return pd.DataFrame(rows, columns=[
            "c_custkey", "n_active_months", "n_streaks",
            "longest_streak", "longest_start_m"]).astype("int64")

    out_schema = pa.schema([("c_custkey", pa.int64()),
                            ("n_active_months", pa.int64()),
                            ("n_streaks", pa.int64()),
                            ("longest_streak", pa.int64()),
                            ("longest_start_m", pa.int64())])
    return bucketed_group_apply(
        src.map_batches(pairs, batch_format="pandas"),
        ["c_custkey"], fold, num_buckets=num_buckets,
        out_schema=out_schema)


def user_daily_ewma(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Truncated dyadic EWMA over each user's DENSE daily series:
    s_t = Σ_{k=0..19} 0.5^(k+1) · x_{t-k}, emitted in exact Q20
    fixed-point (ewma_q20 = Σ x_{t-k} · 2^(19-k), an int64) — alpha =
    1/2 and the 20-lag truncation make every term a dyadic rational,
    so the engine's shifted-add fold and the mirror's windowed
    self-join produce bit-identical integers with no float anywhere.

    Scale: rides user_daily_dense (one bucketed shuffle of per-day
    partial counts); the fold is 20 vectorised shifted adds per user
    series."""
    import numpy as np

    dense = user_daily_dense(sf_dir, num_buckets=num_buckets)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for uid, g in df.groupby("user_id", sort=True):
            g = g.sort_values("day", kind="mergesort",
                              ignore_index=True)
            x = g["n_events"].to_numpy().astype(np.int64)
            e = np.zeros(len(x), dtype=np.int64)
            for k in range(min(20, len(x))):
                e[k:] += x[:len(x) - k] << (19 - k)
            frames.append(pd.DataFrame({
                "user_id": np.int64(uid), "day": g["day"],
                "n_events": x, "ewma_q20": e}))
        return pd.concat(frames, ignore_index=True)

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("day", pa.timestamp("us")),
                            ("n_events", pa.int64()),
                            ("ewma_q20", pa.int64())])
    return bucketed_group_apply(dense, ["user_id"], fold,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def user_rolling_median7(sf_dir: str, window: int = 7,
                         num_buckets: int = 16) -> rd.Dataset:
    """Rolling-window MEDIAN over the dense daily series: per user and
    day, the interpolated median of the trailing ``window`` dense-day
    event counts (head-of-series windows shrink to the available
    days — dense rows make ROWS and RANGE frames identical).

    Exactness: counts are ints, so the median is either an int or a
    dyadic half (mean of the two middle ints) — exactly representable
    in float64 on both sides; no rounding contract needed.

    Scale: rides user_daily_dense's single bucketed shuffle; the
    rolling pass is a vectorised pandas window per user series."""
    dense = user_daily_dense(sf_dir, num_buckets=num_buckets)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for uid, g in df.groupby("user_id", sort=True):
            g = g.sort_values("day", kind="mergesort",
                              ignore_index=True)
            med = g["n_events"].rolling(window, min_periods=1) \
                .median()
            frames.append(pd.DataFrame({
                "user_id": g["user_id"], "day": g["day"],
                "n_events": g["n_events"],
                "med7": med.astype("float64")}))
        return pd.concat(frames, ignore_index=True)

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("day", pa.timestamp("us")),
                            ("n_events", pa.int64()),
                            ("med7", pa.float64())])
    return bucketed_group_apply(dense, ["user_id"], fold,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def user_daily_autocorr(sf_dir: str, num_buckets: int = 16) -> rd.Dataset:
    """Lag-1 autocorrelation of each user's DENSE daily event series —
    the burstiness-vs-momentum screen next to the Fano factor: r1 > 0
    means active days cluster (sessions span days), r1 < 0 means
    alternation (engage / rest), r1 ~ 0 is memoryless traffic.

    Integer contract: with n dense days, S = Σx, the textbook
    r1 = Σ(x_t−x̄)(x_{t−1}−x̄) / Σ(x_t−x̄)² is lifted by n² to the
    exact integer ratio

        num = n²·Σ x_t·x_{t−1} − n·S·(2S − x_0 − x_{n−1}) + (n−1)·S²
        den = n²·Σ x² − n·S²

    and ac1_micro = floor(num/den · 1e6 + 0.5) is the ONE float op
    (both sides compute the same BIGINT→DOUBLE division).  den = 0
    (constant series) or n < 2 yields NULL.

    Scale: rides user_daily_dense's single bucketed shuffle of per-day
    partial counts; the moment fold is vectorised per user series and
    emits one row per user."""
    import numpy as np

    dense = user_daily_dense(sf_dir, num_buckets=num_buckets)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        uids, nds, acs = [], [], []
        for uid, g in df.groupby("user_id", sort=True):
            g = g.sort_values("day", kind="mergesort",
                              ignore_index=True)
            x = g["n_events"].to_numpy().astype(np.int64)
            n = len(x)
            s = int(x.sum())
            ss = int((x * x).sum())
            den = n * n * ss - n * s * s
            if n < 2 or den == 0:
                ac = None
            else:
                sxy = int((x[1:] * x[:-1]).sum())
                num = (n * n * sxy - n * s * (2 * s - int(x[0])
                                              - int(x[-1]))
                       + (n - 1) * s * s)
                ac = int(np.floor(float(num) / float(den)
                                  * 1e6 + 0.5))
            uids.append(int(uid)); nds.append(n); acs.append(ac)
        return pd.DataFrame({
            "user_id": pd.Series(uids, dtype="int64"),
            "n_days": pd.Series(nds, dtype="int64"),
            "ac1_micro": pd.Series(acs, dtype="Int64")})

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_days", pa.int64()),
                            ("ac1_micro", pa.int64())])
    return bucketed_group_apply(dense, ["user_id"], fold,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


def daily_volume_cusum(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """CUSUM change-point panel over the corpus-wide daily event
    volume — the "did traffic shift regime, and when" screen (Page
    1954 shape): per calendar day, the cumulative count's exact integer
    deviation from the uniform line, dev_d = n·cum_d − rank_d·S (n×
    the classic cum − rank·S/n), plus the peak flag at argmax |dev|
    (earliest day on ties) — the most likely change point.

    All-integer (hash-exact with no rounding contract): counts, prefix
    sums and deviations are int64 (dev bounded by n·S).

    Scale: per-batch day partials fold on the day key (span-bounded
    rows); the prefix/argmax pass is ONE single-group fold over the
    D-row day table — the 100 TB input reaches it only as D partial
    counts."""
    import numpy as np

    from ..stages.groups import bucketed_group_apply
    from .analytics import bucketed_sum

    ds = _events(sf_dir, ["ts"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].astype("datetime64[us]").dt.floor("D")
        out = pd.DataFrame({"day": day}).groupby(
            "day", as_index=False).size() \
            .rename(columns={"size": "n_events"})
        return out.astype({"n_events": "int64"})

    dc = bucketed_sum(ds.map_batches(part, batch_format="pandas"),
                      ["day"], ["n_events"], num_buckets=num_buckets)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby("day", as_index=False)["n_events"].sum() \
            .sort_values("day", kind="mergesort", ignore_index=True)
        c = df["n_events"].to_numpy().astype(np.int64)
        n = len(c)
        s = int(c.sum())
        cum = np.cumsum(c)
        rnk = np.arange(1, n + 1, dtype=np.int64)
        dev = n * cum - rnk * s
        ma = np.abs(dev).max() if n else 0
        peak = (np.abs(dev) == ma)
        # earliest day on ties
        if peak.any():
            first = int(np.argmax(peak))
            peak = np.zeros(n, dtype=bool)
            peak[first] = True
        return pd.DataFrame({
            "day": df["day"],
            "n_events": c,
            "cum": cum.astype("int64"),
            "dev": dev.astype("int64"),
            "is_peak": peak.astype("int64")})

    out_schema = pa.schema([("day", pa.timestamp("us")),
                            ("n_events", pa.int64()),
                            ("cum", pa.int64()),
                            ("dev", pa.int64()),
                            ("is_peak", pa.int64())])
    return bucketed_group_apply(
        dc.map_batches(lambda df: df.assign(
            g=np.zeros(len(df), dtype=np.int64)),
            batch_format="pandas"),
        ["g"], lambda df: fold(df.drop(columns=["g"])),
        num_buckets=1, out_schema=out_schema)


def customer_interorder_gap_median(sf_dir: str,
                                   num_buckets: int = 16) -> rd.Dataset:
    """Inter-purchase cadence: per customer with ≥ 2 orders, the MEDIAN
    gap in whole days between consecutive orders — the reorder-cycle
    panel next to the event-level user_median_gap.

    Exactness: gaps are integer day differences of the sorted order-day
    multiset (same-day orders gap 0), so the median is an int or a
    dyadic half — exactly representable in float64 on both sides.

    Scale: (customer, day) rows shuffle once on the customer key; the
    sort/diff/median fold is vectorised per customer series."""
    import numpy as np

    from ..stages.groups import bucketed_group_apply

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["o_orderdate"].astype("datetime64[us]")
             .astype("int64") // 86_400_000_000)
        return pd.DataFrame({"c_custkey": df["o_custkey"],
                             "d": d.astype("int64")})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"c_custkey": [], "n_orders": [], "med_gap_days": []}
        for ck, g in df.groupby("c_custkey", sort=True):
            d = np.sort(g["d"].to_numpy())
            if len(d) < 2:
                continue
            gaps = np.diff(d)
            rows["c_custkey"].append(int(ck))
            rows["n_orders"].append(len(d))
            rows["med_gap_days"].append(float(np.median(gaps)))
        return pd.DataFrame({
            "c_custkey": pd.Series(rows["c_custkey"], dtype="int64"),
            "n_orders": pd.Series(rows["n_orders"], dtype="int64"),
            "med_gap_days": pd.Series(rows["med_gap_days"],
                                      dtype="float64")})

    out_schema = pa.schema([("c_custkey", pa.int64()),
                            ("n_orders", pa.int64()),
                            ("med_gap_days", pa.float64())])
    return bucketed_group_apply(
        src.map_batches(pre, batch_format="pandas"),
        ["c_custkey"], fold, num_buckets=num_buckets,
        out_schema=out_schema)


def daily_volume_seasonal_naive(sf_dir: str,
                                num_buckets: int = 8) -> pa.Table:
    """Seasonal-naive backtest over the corpus-wide daily event volume
    (the standard forecasting baseline, Hyndman & Athanasopoulos 2018):
    each day's forecast is the observed volume exactly 7 days earlier
    on the DENSE calendar (zero-filled gaps), and the panel reports per
    evaluable day the actual, the forecast and the exact integer
    signed/absolute error — the drift screen a capacity planner reads
    before trusting any fancier model.

    All-integer; no rounding contract needed.

    Scale: per-batch day partials fold on the day key; the densify +
    lag-7 finish is span-bounded driver math over D rows (the corpus
    reaches it only as D counts)."""
    import numpy as np

    from ..util import collect_rows
    from .analytics import bucketed_sum

    ds = _events(sf_dir, ["ts"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].astype("datetime64[us]").dt.floor("D")
        out = pd.DataFrame({"day": day}).groupby(
            "day", as_index=False).size() \
            .rename(columns={"size": "n"})
        return out.astype({"n": "int64"})

    rows = collect_rows(bucketed_sum(
        ds.map_batches(part, batch_format="pandas"),
        ["day", ], ["n"], num_buckets=num_buckets))
    cnt: dict = {}
    for r in rows:
        d = pd.Timestamp(r["day"])
        cnt[d] = cnt.get(d, 0) + int(r["n"])
    if not cnt:
        return pa.table({
            "day": pa.array([], pa.timestamp("us")),
            "actual": pa.array([], pa.int64()),
            "forecast": pa.array([], pa.int64()),
            "err": pa.array([], pa.int64()),
            "abs_err": pa.array([], pa.int64())})
    d0, d1 = min(cnt), max(cnt)
    days = pd.date_range(d0, d1, freq="D")
    dense = np.array([cnt.get(d, 0) for d in days], dtype=np.int64)
    actual = dense[7:]
    forecast = dense[:-7]
    err = actual - forecast
    return pa.table({
        "day": pa.array(days[7:].to_numpy().astype("datetime64[us]"),
                        pa.timestamp("us")),
        "actual": pa.array(actual, pa.int64()),
        "forecast": pa.array(forecast, pa.int64()),
        "err": pa.array(err, pa.int64()),
        "abs_err": pa.array(np.abs(err), pa.int64())})
