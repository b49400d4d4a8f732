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
