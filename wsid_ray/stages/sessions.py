"""Gap-based sessionization over the events stream (stream-shaped
pattern, ray_guide.md L187-198): events of a user are split into sessions
wherever the gap to the previous event exceeds ``gap``; per-session
aggregates are emitted.

One bucketed shuffle keyed hash(user_id) colocates each user's events;
inside a bucket everything is vectorised pandas (sort, diff, cumsum).
Session numbering is deterministic (0-based in ts order per user), so the
result is DuckDB-checkable with lag()/sum() window functions.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from .groups import bucketed_group_apply


def sessionize(events: rd.Dataset, gap_minutes: int = 30,
               num_buckets: int = 16) -> rd.Dataset:
    """events(user_id, ts, event_id) -> (user_id, session_idx, n_events,
    start_ts, end_ts)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev_ts = df.groupby("user_id", sort=False)["ts"].shift()
        new_session = prev_ts.isna() | ((df["ts"] - prev_ts) > gap)
        df = df.assign(
            session_idx=(new_session.groupby(df["user_id"], sort=False)
                         .cumsum() - 1).astype("int64"))
        out = df.groupby(["user_id", "session_idx"], sort=True).agg(
            n_events=("event_id", "size"),
            start_ts=("ts", "min"),
            end_ts=("ts", "max")).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        return out

    sel = events.select_columns(["user_id", "ts", "event_id"])
    return bucketed_group_apply(sel, ["user_id"], fn,
                                num_buckets=num_buckets)


def session_conversions(events: rd.Dataset, gap_minutes: int = 30,
                        from_type: str = "view",
                        to_type: str = "purchase",
                        num_buckets: int = 16) -> rd.Dataset:
    """Sessionized funnel conversion: per user, how many of their
    gap-based sessions contain a ``from_type`` event STRICTLY before a
    ``to_type`` event (in (ts, event_id) order — the same deterministic
    ordering and session rule as ``sessionize``).

    Same physical plan: one shuffle keyed on the user, everything
    inside a bucket is vectorised pandas (sort, diff/cumsum session
    ids, per-session min/max positions) — a whole funnel analysis with
    no second pass over the raw stream."""
    import numpy as np
    import pyarrow as pa

    gap = pd.Timedelta(minutes=gap_minutes)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort", ignore_index=True)
        prev_ts = df.groupby("user_id", sort=False)["ts"].shift()
        new_session = prev_ts.isna() | ((df["ts"] - prev_ts) > gap)
        sid = (new_session.groupby(df["user_id"], sort=False)
               .cumsum() - 1).astype("int64")
        pos = pd.Series(np.arange(len(df), dtype=np.int64))
        vpos = pos.where(df["event_type"] == from_type)
        ppos = pos.where(df["event_type"] == to_type)
        g = pd.DataFrame({"user_id": df["user_id"], "sid": sid,
                          "vpos": vpos, "ppos": ppos}) \
            .groupby(["user_id", "sid"], sort=True) \
            .agg(vpos=("vpos", "min"), ppos=("ppos", "max")).reset_index()
        conv = (g["vpos"].notna() & g["ppos"].notna()
                & (g["vpos"] < g["ppos"]))
        out = pd.DataFrame({"user_id": g["user_id"],
                            "c": conv.astype("int64")}) \
            .groupby("user_id", sort=False) \
            .agg(n_sessions=("c", "size"), n_converted=("c", "sum")) \
            .reset_index()
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_converted"] = out["n_converted"].astype("int64")
        return out

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_sessions", pa.int64()),
                            ("n_converted", pa.int64())])
    sel = events.select_columns(["user_id", "ts", "event_id",
                                 "event_type"])
    return bucketed_group_apply(sel, ["user_id"], fn,
                                num_buckets=num_buckets,
                                out_schema=out_schema)
