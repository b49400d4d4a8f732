"""Distributed statistics / ML-evaluation operators (round-4 batch D).

Every operator here follows the repo's integer determinism contracts
(exact integer partial sums combined in Python arbitrary-precision
ints, one final float op micro-rounded) so the DuckDB mirrors in
__ray_entry__.oracle_sql hash-exactly.  Scale notes per function; none
of them co-locates a whole partition of the raw input in one task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..sources.pqclean import read_parquet_clean
from ..stages.groups import bucketed_group_apply
from ..util import collect_rows
from .analytics import (bucketed_sum, exact_partitioned_ranks,
                        partial_count)


def _micro(x: np.ndarray) -> np.ndarray:
    """float -> exact int64 micro-units, floor(x*1e6 + 0.5) (the repo's
    standard quantisation; SQL mirror: CAST(floor(v*1e6+0.5) AS BIGINT))."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6 + 0.5) \
        .astype(np.int64)


# ---------------------------------------------------------------------------
# grouped OLS linear regression (y = extendedprice dollars ~ x = quantity)
# ---------------------------------------------------------------------------

def lineitem_group_ols(sf_dir: str, num_buckets: int = 4) -> rd.Dataset:
    """Per-l_returnflag OLS fit of price-on-quantity from the SAME
    exact integer moment sums as lineitem_moments: slope, intercept and
    R² derived once from python-int n/Σx/Σy/Σx²/Σy²/Σxy, each converted
    to float64 for a single division and micro-rounded.

    Scale: reuses _moment_partials — one tiny (block, flag) partial row
    per block, one k-row bucketed fold; the raw table never shuffles."""
    from .relational_ext import _moment_partials

    partials = _moment_partials(sf_dir)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for flag, g in df.groupby("l_returnflag", sort=False):
            n = int(g["n"].sum())
            sx = sum(int(v) for v in g["sum_qty"])
            sy = sum(int(v) for v in g["sum_price_d"])
            sxx = sum(int(v) for v in g["sxx"])
            syy = sum(int(v) for v in g["syy"])
            sxy = sum(int(v) for v in g["sxy"])
            dx = n * sxx - sx * sx          # n^2 * var(x), exact int
            dy = n * syy - sy * sy
            cv = n * sxy - sx * sy          # n^2 * cov,    exact int
            if dx == 0:
                slope6 = icept6 = r26 = None
            else:
                slope = float(cv) / float(dx)
                slope6 = np.floor(slope * 1e6 + 0.5) / 1e6
                icept = (float(sy) - slope * float(sx)) / float(n)
                icept6 = np.floor(icept * 1e6 + 0.5) / 1e6
                if dy == 0:
                    r26 = None
                else:
                    r2 = (float(cv) * float(cv)) / (float(dx) * float(dy))
                    r26 = np.floor(r2 * 1e6 + 0.5) / 1e6
            rows.append({"l_returnflag": flag, "n": n,
                         "slope6": slope6, "intercept6": icept6,
                         "r2_6": r26})
        return pd.DataFrame(rows, columns=["l_returnflag", "n", "slope6",
                                           "intercept6", "r2_6"])

    out_schema = pa.schema([("l_returnflag", pa.string()),
                            ("n", pa.int64()), ("slope6", pa.float64()),
                            ("intercept6", pa.float64()),
                            ("r2_6", pa.float64())])
    return bucketed_group_apply(partials, ["l_returnflag"], combine,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


# ---------------------------------------------------------------------------
# corpus-divergence (domain drift) panel
# ---------------------------------------------------------------------------

def source_token_kl(sf_dir: str, num_buckets: int = 16) -> pa.Table:
    """Domain-drift panel: KL(source ‖ corpus) over whitespace-token
    unigram distributions, per source — the mixture-weighting signal a
    data-curation pipeline balances on.

    Integer contract: per-(source, token) contribution
    c_st · ln((c_st·N) / (N_s·c_t)) is quantised to micro-nats
    (half-up) BEFORE the sum, so the distributed total is order-free;
    the ln argument is ONE float division of two exact integer
    products.  Emitted: token mass, summed micro-nats and the
    truncating per-token mean kl_micro.

    Scale: (source, token) partial counts fold on token (vocab-bounded
    rows), corpus counts derive from the same fold — one shuffle; the
    per-source rollup ships source-cardinality rows."""
    src = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["source", "text"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        rows = {"source": [], "token": []}
        for s, ts in zip(df["source"], toks):
            rows["source"].extend([s] * len(ts))
            rows["token"].extend(ts)
        g = pd.DataFrame(rows)
        out = g.groupby(["source", "token"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return out.astype({"c": "int64"})

    st = bucketed_sum(src.map_batches(part, batch_format="pandas"),
                      ["source", "token"], ["c"],
                      num_buckets=num_buckets)

    def tok_fold(df: pd.DataFrame) -> pd.DataFrame:
        # corpus token counts + per-source contributions live in the
        # same token-keyed bucket: attach c_t to every (source, token)
        df = df.groupby(["source", "token"], as_index=False).sum()
        ct = df.groupby("token")["c"].transform("sum")
        return df.assign(ct=ct.astype("int64"))

    out_schema = pa.schema([("source", pa.string()),
                            ("token", pa.string()),
                            ("c", pa.int64()), ("ct", pa.int64())])
    with_ct = bucketed_group_apply(st, ["token"], tok_fold,
                                   num_buckets=num_buckets,
                                   out_schema=out_schema)
    totals = collect_rows(bucketed_sum(
        with_ct.map_batches(
            lambda df: df.groupby("source", as_index=False)
            .agg(ns=("c", "sum")).astype({"ns": "int64"}),
            batch_format="pandas"),
        ["source"], ["ns"], num_buckets=2))
    ns_of = {r["source"]: int(r["ns"]) for r in totals}
    n_tot = sum(ns_of.values())
    ref = ray.put(ns_of)

    def kl_part(df: pd.DataFrame) -> pd.DataFrame:
        ns = ray.get(ref)
        nsv = df["source"].map(ns).to_numpy().astype(np.int64)
        c = df["c"].to_numpy()
        ct = df["ct"].to_numpy()
        arg = (c.astype(np.float64) * n_tot) / (nsv.astype(np.float64)
                                                * ct)
        t = np.floor(c * np.log(arg) * 1e6 + 0.5).astype(np.int64)
        out = df.assign(kl=t)[["source", "kl"]]
        g = out.groupby("source", as_index=False).sum()
        return g.astype({"kl": "int64"})

    kl = collect_rows(bucketed_sum(
        with_ct.map_batches(kl_part, batch_format="pandas"),
        ["source"], ["kl"], num_buckets=2))
    kl_of = {r["source"]: int(r["kl"]) for r in kl}
    ss = sorted(ns_of)
    mean = []
    for s in ss:
        d = kl_of.get(s, 0)
        mean.append((abs(d) // ns_of[s]) * (1 if d >= 0 else -1))
    return pa.table({
        "source": pa.array(ss, pa.string()),
        "n_tokens": pa.array([ns_of[s] for s in ss], pa.int64()),
        "kl_sum_micro": pa.array([kl_of.get(s, 0) for s in ss],
                                 pa.int64()),
        "kl_mean_micro": pa.array(mean, pa.int64())})


# ---------------------------------------------------------------------------
# negative sampling panel (training-pair generation)
# ---------------------------------------------------------------------------

def user_negative_types(sf_dir: str, num_buckets: int = 8) -> rd.Dataset:
    """Negative-sampling panel: per user, the catalog event types they
    have NEVER interacted with (the deterministic negatives a
    recommender trains against) — used count, negative count and the
    sorted comma-joined negative list.

    Scale: distinct (user, type) partials fold once on user_id; the
    catalog (type-cardinality, the model side) broadcasts into the
    fold — the classic small-side anti join."""
    src = read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_type"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    pairs = src.map_batches(part, batch_format="pandas")
    catalog = sorted({r["event_type"] for r in collect_rows(
        pairs.map_batches(
            lambda df: df[["event_type"]].drop_duplicates(),
            batch_format="pandas"))})
    cat_ref = ray.put(catalog)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cat = ray.get(cat_ref)
        rows = []
        for uid, g in df.groupby("user_id", sort=True):
            used = set(g["event_type"])
            neg = [t for t in cat if t not in used]
            rows.append((uid, len(used), len(neg), ",".join(neg)))
        return pd.DataFrame(rows, columns=[
            "user_id", "n_used", "n_neg", "negatives"]).astype(
            {"user_id": "int64", "n_used": "int64", "n_neg": "int64"})

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("n_used", pa.int64()),
                            ("n_neg", pa.int64()),
                            ("negatives", pa.string())])
    return bucketed_group_apply(pairs, ["user_id"], fold,
                                num_buckets=num_buckets,
                                out_schema=out_schema)


# ---------------------------------------------------------------------------
# Markov-chain stationary distribution (fixed-round integer contract)
# ---------------------------------------------------------------------------

def event_type_markov_stationary(sf_dir: str,
                                 rounds: int = 8) -> pa.Table:
    """Stationary distribution of the event-type Markov chain: 8
    synchronous power rounds of v ← vP in exact integer micro-units —
    the 7th bounded-iteration contract (k-means/CW/PageRank/k-core/BFS
    /hub precedents).  Each term is v_i·c_ij // rowtot_i (truncating),
    summed exactly, so round r is a pure function of round r-1 and the
    mirror unrolls identically; v0 is the uniform 1e6 // k.

    Scale: transition counts ride the existing bucketed fold
    (|types|² rows); the power rounds are k×k driver math."""
    from ..util import collect_rows as _cr
    from .queries import q_event_type_transitions

    rows = _cr(q_event_type_transitions(sf_dir))
    c: dict[tuple[str, str], int] = {}
    rt: dict[str, int] = {}
    states = set()
    for r in rows:
        i, j, n = r["prev_type"], r["event_type"], int(r["n"])
        c[(i, j)] = c.get((i, j), 0) + n
        rt[i] = rt.get(i, 0) + n
        states.update((i, j))
    k = len(states)
    v = {s: 1_000_000 // k for s in sorted(states)}
    for _ in range(rounds):
        nv: dict[str, int] = {}
        for (i, j), cij in c.items():
            if i in v:
                nv[j] = nv.get(j, 0) + (v[i] * cij) // rt[i]
        v = nv
    ks = sorted(v)
    return pa.table({
        "state": pa.array(ks, pa.string()),
        "v_micro": pa.array([v[s] for s in ks], pa.int64())})


# ---------------------------------------------------------------------------
# item-item similarity + shard-balance audit
# ---------------------------------------------------------------------------

def event_type_cosine(sf_dir: str, num_buckets: int = 8) -> pa.Table:
    """Item-item collaborative-filtering similarity: cosine between
    event types over their per-user engagement-count vectors —
    dot(t1,t2) = Σ_u c[u,t1]·c[u,t2] and norms Σ_u c² as exact
    integers, cos6 from one float chain at 6 dp.

    Scale: per-batch (user, type) count partials fold once on user_id;
    each user's type vector (catalog-bounded) expands to its pair
    products in-bucket; the pair/norm sums are T²-bounded rows."""
    src = read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id", "event_type"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["user_id", "event_type"],
                         as_index=False).size() \
            .rename(columns={"size": "c"})
        return out.astype({"c": "int64"})

    def pair_fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["user_id", "event_type"], as_index=False) \
               .sum()
        rows = []
        for _uid, g in df.groupby("user_id", sort=False):
            ts = g["event_type"].to_numpy()
            cs = g["c"].to_numpy()
            o = np.argsort(ts)
            ts, cs = ts[o], cs[o]
            for i in range(len(ts)):          # catalog-bounded loop
                rows.append((ts[i], ts[i], int(cs[i]) * int(cs[i])))
                for j in range(i + 1, len(ts)):
                    rows.append((ts[i], ts[j],
                                 int(cs[i]) * int(cs[j])))
        return pd.DataFrame(rows, columns=["t1", "t2", "dot"]) \
            .groupby(["t1", "t2"], as_index=False).sum() \
            .astype({"dot": "int64"})

    part_schema = pa.schema([("t1", pa.string()), ("t2", pa.string()),
                             ("dot", pa.int64())])
    partials = bucketed_group_apply(
        src.map_batches(part, batch_format="pandas"),
        ["user_id"], pair_fold, num_buckets=num_buckets,
        out_schema=part_schema)
    rows = collect_rows(bucketed_sum(partials, ["t1", "t2"], ["dot"],
                                     num_buckets=2))
    dot = {(r["t1"], r["t2"]): int(r["dot"]) for r in rows}
    norm2 = {t1: d for (t1, t2), d in dot.items() if t1 == t2}
    out = []
    for (t1, t2), d in sorted(dot.items()):
        if t1 == t2:
            continue
        cos6 = np.floor(float(d) / (np.sqrt(float(norm2[t1]))
                                    * np.sqrt(float(norm2[t2])))
                        * 1e6 + 0.5) / 1e6
        out.append((t1, t2, d, cos6))
    return pa.table({
        "t1": pa.array([r[0] for r in out], pa.string()),
        "t2": pa.array([r[1] for r in out], pa.string()),
        "dot": pa.array([r[2] for r in out], pa.int64()),
        "cos6": pa.array([r[3] for r in out], pa.float64())})


def doc_hash_shard_balance(sf_dir: str, n_shards: int = 64) -> pa.Table:
    """Partitioning audit: docs hashed to ``n_shards`` by the shared
    md5 contract (md5_number_upper(CAST(doc_id AS VARCHAR)) % S) —
    per-shard count and the signed truncating micro deviation from the
    uniform share (n·S − N)·1e6 // N.  The report an engine's shuffle
    planner gates on before trusting a key.

    Scale: stateless hash partials + one S-row fold."""
    import hashlib

    src = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        sh = np.fromiter(
            (int.from_bytes(hashlib.md5(str(int(i)).encode())
                            .digest()[:8], "little") % n_shards
             for i in ids), dtype=np.int64, count=len(ids))
        out = pd.DataFrame({"shard": sh, "n": np.int64(1)})
        return out.groupby("shard", as_index=False).sum() \
            .astype({"n": "int64"})

    rows = collect_rows(bucketed_sum(
        src.map_batches(part, batch_format="pandas"),
        ["shard"], ["n"], num_buckets=2))
    n_tot = sum(r["n"] for r in rows)
    shards = sorted(rows, key=lambda r: r["shard"])
    dev = []
    for r in shards:
        d = r["n"] * n_shards - n_tot
        dev.append((abs(d) * 1_000_000 // n_tot)
                   * (1 if d >= 0 else -1))
    return pa.table({
        "shard": pa.array([r["shard"] for r in shards], pa.int64()),
        "n": pa.array([r["n"] for r in shards], pa.int64()),
        "dev_micro": pa.array(dev, pa.int64())})


# ---------------------------------------------------------------------------
# churn flags + chi-square independence (exact integer contracts)
# ---------------------------------------------------------------------------

def user_inactivity_churn(sf_dir: str, churn_days: int = 7,
                          num_buckets: int = 8) -> rd.Dataset:
    """Churn panel: per user, last active day, exact days inactive vs
    the corpus max day, and the churned flag (> churn_days silent).

    Scale: per-batch max partials fold once on user_id; the corpus max
    is a scalar derived from the folded (user-cardinality) stream and
    broadcast into a stateless flag pass."""
    src = read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["user_id", "ts"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        day = (pd.DatetimeIndex(df["ts"]).as_unit("us").asi8
               // 86_400_000_000).astype("int64")
        g = pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                          "last_day": day})
        return g.groupby("user_id", as_index=False).max()

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).max() \
            .astype({"last_day": "int64"})

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("last_day", pa.int64())])
    per_user = bucketed_group_apply(
        src.map_batches(part, batch_format="pandas"),
        ["user_id"], fold, num_buckets=num_buckets,
        out_schema=out_schema)
    gmax = max(r["m"] for r in collect_rows(per_user.map_batches(
        lambda df: pd.DataFrame({"m": [np.int64(df["last_day"].max())]}),
        batch_format="pandas")))

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        inact = (gmax - df["last_day"]).astype("int64")
        return df.assign(days_inactive=inact,
                         churned=(inact > churn_days).astype("int64"))

    return per_user.map_batches(flag, batch_format="pandas")


def status_priority_chisq(sf_dir: str) -> pa.Table:
    """Chi-square test of independence over the (o_orderstatus x
    o_orderpriority) contingency table — chi2 in exact integer
    micro-units: each cell's (O-E)²/E is lifted to the integer
    rational (O·N - rt·ct)² / (N·rt·ct), rounded half-up to micro via
    (2·num·1e6 + den) // (2·den) in arbitrary-precision ints, then
    summed — order-free, zero cells included.

    Scale: the contingency partial-counts fold ships category² rows;
    the driver math is k² cells."""
    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderstatus",
                                      "o_orderpriority"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["o_orderstatus", "o_orderpriority"],
                         as_index=False).size() \
            .rename(columns={"size": "o"})
        return out.astype({"o": "int64"})

    rows = collect_rows(bucketed_sum(
        src.map_batches(part, batch_format="pandas"),
        ["o_orderstatus", "o_orderpriority"], ["o"], num_buckets=2))
    obs = {(r["o_orderstatus"], r["o_orderpriority"]): int(r["o"])
           for r in rows}
    r_tot: dict[str, int] = {}
    c_tot: dict[str, int] = {}
    for (rk, ck), o in obs.items():
        r_tot[rk] = r_tot.get(rk, 0) + o
        c_tot[ck] = c_tot.get(ck, 0) + o
    n = sum(r_tot.values())
    chi2_micro = 0
    for rk in sorted(r_tot):
        for ck in sorted(c_tot):
            o = obs.get((rk, ck), 0)
            num = (o * n - r_tot[rk] * c_tot[ck]) ** 2
            den = n * r_tot[rk] * c_tot[ck]
            chi2_micro += (2 * num * 1_000_000 + den) // (2 * den)
    dof = (len(r_tot) - 1) * (len(c_tot) - 1)
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "r_levels": pa.array([len(r_tot)], pa.int64()),
        "c_levels": pa.array([len(c_tot)], pa.int64()),
        "dof": pa.array([dof], pa.int64()),
        "chi2_micro": pa.array([chi2_micro], pa.int64())})


# ---------------------------------------------------------------------------
# Welch t-test / one-way ANOVA from exact integer moments
# ---------------------------------------------------------------------------

def _group_moments(ds: rd.Dataset, key: str, val_fn,
                   num_buckets: int = 4) -> list[dict]:
    """Exact per-group (n, Σy, Σy²) — int64 per-block partials (the
    caller's quantisation must keep y² inside per-block headroom),
    Python-int combine, driver-collected (group-cardinality rows)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        y = val_fn(df)
        g = pd.DataFrame({key: df[key], "n": np.int64(1), "s": y,
                          "s2": y * y})
        return g.groupby(key, as_index=False).sum().astype(
            {"n": "int64", "s": "int64", "s2": "int64"})

    rows = collect_rows(ds.map_batches(partial, batch_format="pandas"))
    acc: dict = {}
    for r in rows:
        a = acc.setdefault(r[key], [0, 0, 0])
        a[0] += int(r["n"]); a[1] += int(r["s"]); a[2] += int(r["s2"])
    return [{key: k, "n": v[0], "s": v[1], "s2": v[2]}
            for k, v in sorted(acc.items())]


def priority_price_welch(sf_dir: str) -> pa.Table:
    """Welch two-sample t-test panel: every pair of order priorities
    compared on whole-dollar order price — t statistic and
    Welch–Satterthwaite df, both 6 dp half-up from one shared float
    chain over exact integer moments (same headroom contract as
    lineitem_moments: dollar quantisation keeps y² per-block int64).

    Scale: one stateless partial-moments scan; the pair panel is
    k²-bounded driver work."""
    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderpriority",
                                      "o_totalprice"])
    stats = _group_moments(
        src, "o_orderpriority",
        lambda df: np.floor(df["o_totalprice"].to_numpy()
                            + 0.5).astype(np.int64))
    rows = []
    for i, a in enumerate(stats):
        for b in stats[i + 1:]:
            n1, n2 = float(a["n"]), float(b["n"])
            m1 = float(a["s"]) / n1
            m2 = float(b["s"]) / n2
            v1 = (n1 * float(a["s2"]) - float(a["s"]) * float(a["s"])) \
                / (n1 * (n1 - 1.0))
            v2 = (n2 * float(b["s2"]) - float(b["s"]) * float(b["s"])) \
                / (n2 * (n2 - 1.0))
            se1, se2 = v1 / n1, v2 / n2
            t = (m1 - m2) / np.sqrt(se1 + se2)
            df_w = (se1 + se2) * (se1 + se2) \
                / (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0))
            rows.append((a["o_orderpriority"], b["o_orderpriority"],
                         a["n"], b["n"],
                         np.floor(t * 1e6 + 0.5) / 1e6,
                         np.floor(df_w * 1e6 + 0.5) / 1e6))
    return pa.table({
        "p1": pa.array([r[0] for r in rows], pa.string()),
        "p2": pa.array([r[1] for r in rows], pa.string()),
        "n1": pa.array([r[2] for r in rows], pa.int64()),
        "n2": pa.array([r[3] for r in rows], pa.int64()),
        "t6": pa.array([r[4] for r in rows], pa.float64()),
        "df6": pa.array([r[5] for r in rows], pa.float64())})


def supplier_acctbal_anova(sf_dir: str) -> pa.Table:
    """One-way ANOVA across nations on supplier account balance
    (cents): between/within sums of squares and the F statistic, all
    derived once from exact per-group integer moments (cents² ≤ ~1e12
    per row — int64 headroom holds for million-row blocks), float only
    in the final shared chain, 6 dp half-up.

    Scale: one stateless partial-moments scan + k-row driver math."""
    src = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                             columns=["s_nationkey", "s_acctbal"])
    stats = _group_moments(
        src, "s_nationkey",
        lambda df: np.floor(df["s_acctbal"].to_numpy() * 100
                            + 0.5).astype(np.int64))
    k = len(stats)
    n_tot = sum(r["n"] for r in stats)
    s_tot = sum(r["s"] for r in stats)
    s2_tot = sum(r["s2"] for r in stats)
    # SS in EXACT cents² integers (order-free — a float Σ over groups
    # would be aggregation-order-dependent and break the mirror):
    # per-group term tdiv(s_g², n_g) truncates ≤ 1 cent² each — the
    # determinism contract, shared verbatim with the SQL // operator
    sb = sum((r["s"] * r["s"]) // r["n"] for r in stats)
    ssb_c = sb - (s_tot * s_tot) // n_tot
    ssw_c = s2_tot - sb
    if k < 2 or n_tot <= k or ssw_c == 0:   # degenerate design -> NULL
        f6 = None
    else:
        f_stat = (float(ssb_c) / float(k - 1)) \
            / (float(ssw_c) / float(n_tot - k))
        f6 = np.floor(f_stat * 1e6 + 0.5) / 1e6
    return pa.table({
        "k": pa.array([k], pa.int64()),
        "n": pa.array([n_tot], pa.int64()),
        "ssb_c": pa.array([ssb_c], pa.int64()),
        "ssw_c": pa.array([ssw_c], pa.int64()),
        "f6": pa.array([f6], pa.float64())})


# ---------------------------------------------------------------------------
# RFM customer segmentation (recency / frequency / monetary quartiles)
# ---------------------------------------------------------------------------

def customer_rfm(sf_dir: str) -> rd.Dataset:
    """Classic RFM segmentation: per customer recency_days (days from
    their last order to the corpus max order day), frequency (orders)
    and monetary_cents (exact cent sum), each NTILE(4)-coded over
    (metric, c_custkey) ascending — r/f/m codes 1..4 and the combined
    rfm = r*100 + f*10 + m.

    Scale: the raw orders table collapses to per-customer partials in
    one bucketed fold; the three quartile passes ride the shared
    exact_partitioned_ranks machinery over customer-cardinality rows
    (no co-located partition, same as user_activity_deciles); the code
    streams hash-join back on c_custkey."""
    from ..stages.joins import hash_join

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = (pd.DatetimeIndex(df["o_orderdate"]).as_unit("us").asi8
               // 86_400_000_000).astype("int64")
        cents = np.floor(df["o_totalprice"].to_numpy() * 100
                         + 0.5).astype("int64")
        g = pd.DataFrame({"c_custkey": df["o_custkey"].astype("int64"),
                          "last_day": day, "frequency": np.int64(1),
                          "monetary_cents": cents})
        return g.groupby("c_custkey", as_index=False).agg(
            last_day=("last_day", "max"), frequency=("frequency", "sum"),
            monetary_cents=("monetary_cents", "sum"))

    partials = src.map_batches(partial, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("c_custkey", as_index=False).agg(
            last_day=("last_day", "max"), frequency=("frequency", "sum"),
            monetary_cents=("monetary_cents", "sum"))

    out_schema = pa.schema([("c_custkey", pa.int64()),
                            ("last_day", pa.int64()),
                            ("frequency", pa.int64()),
                            ("monetary_cents", pa.int64())])
    base = bucketed_group_apply(partials, ["c_custkey"], fold,
                                num_buckets=8, out_schema=out_schema)
    gmax = max(r["last_day"] for r in collect_rows(
        base.map_batches(
            lambda df: pd.DataFrame(
                {"last_day": [np.int64(df["last_day"].max())]}),
            batch_format="pandas")))
    base = base.map_batches(
        lambda df: df.assign(
            recency_days=(gmax - df["last_day"]).astype("int64"))
        .drop(columns=["last_day"]),
        batch_format="pandas")

    def code_pass(metric: str, out_col: str,
                  bin_width: int) -> rd.Dataset:
        pairs = base.map_batches(
            lambda df: pd.DataFrame({"part": "all",
                                     "c_custkey": df["c_custkey"],
                                     "v": df[metric]}),
            batch_format="pandas")
        schema = pa.schema([("c_custkey", pa.int64()),
                            (out_col, pa.int64())])

        def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
            rank = start + np.arange(len(g), dtype=np.int64)
            from .analytics import ntile_emit
            return pd.DataFrame({
                "c_custkey": g["c_custkey"].to_numpy(),
                out_col: ntile_emit(4, rank, n).astype("int64")})

        return exact_partitioned_ranks(pairs, "part", "v", "c_custkey",
                                       bin_width, emit, schema,
                                       num_buckets=8)

    out = hash_join(base, code_pass("recency_days", "r_code", 4),
                    on=["c_custkey"], num_buckets=8)
    out = hash_join(out, code_pass("frequency", "f_code", 4),
                    on=["c_custkey"], num_buckets=8)
    out = hash_join(out, code_pass("monetary_cents", "m_code", 1 << 20),
                    on=["c_custkey"], num_buckets=8)
    return out.map_batches(
        lambda df: df.assign(rfm=(df["r_code"] * 100 + df["f_code"] * 10
                                  + df["m_code"]).astype("int64")),
        batch_format="pandas")


# ---------------------------------------------------------------------------
# kNN-classifier evaluation over the embedding table
# ---------------------------------------------------------------------------

def knn_label_accuracy(sf_dir: str, k: int = 5) -> rd.Dataset:
    """kNN-classifier eval: majority label of each vector's exact
    cosine top-k neighbours (self excluded; count desc, smallest label
    on ties) vs its own label, rolled up per true label — n, n_correct
    and a truncating acc_micro = n_correct*1e6 // n.

    Scale: rides the hash-green knn_self_topk hit lists (brute exact at
    audit scale; the 100 TB self-join goes through IVF bucketing, same
    note as knn_self_topk).  Labels broadcast once as a vec_id->label
    dict; votes are per-query groups of k rows, aggregated with partial
    counts before one tiny bucketed fold."""
    import pyarrow.parquet as pq

    from ..stages.knn import knn_topk, read_embeddings

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    queries = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
               for r in t.to_pylist()}
    labels = dict(zip(t["vec_id"].to_pylist(),
                      (int(x) for x in t["label"].to_pylist())))
    lab_ref = ray.put(labels)
    hits = knn_topk(read_embeddings(sf_dir), queries, k=k)

    def vote(df: pd.DataFrame) -> pd.DataFrame:
        lab = ray.get(lab_ref)
        df = df.assign(nlabel=df["vec_id"].map(lab).astype("int64"))
        rows = []
        for qid, g in df.groupby("query_id", sort=True):
            c = g.groupby("nlabel").size()
            pred = c.sort_index().sort_values(
                kind="mergesort", ascending=False).index[0]
            true = lab[int(qid)]
            rows.append((true, 1, int(pred == true)))
        return pd.DataFrame(rows, columns=["true_label", "n",
                                           "n_correct"]) \
            .astype({"true_label": "int64", "n": "int64",
                     "n_correct": "int64"})

    votes = bucketed_group_apply(hits, ["query_id"], vote,
                                 num_buckets=8)
    agg = bucketed_sum(votes, ["true_label"], ["n", "n_correct"],
                       num_buckets=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(acc_micro=(df["n_correct"] * 1_000_000
                                    // df["n"]).astype("int64"))

    return agg.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# simplified silhouette score per label (milli-unit integer contract)
# ---------------------------------------------------------------------------

def embedding_silhouette(sf_dir: str) -> rd.Dataset:
    """Simplified silhouette (centroid form, squared Euclidean) per
    label: a = d² to the own-label centroid, b = min d² to any other
    centroid, s_micro = trunc((b - a) * 1e6 / max(a, b)).

    Integer contract — MILLI-unit quantisation (this operator's own,
    coarser than the repo's micro default): q = floor(v*1e3 + 0.5)
    keeps d² ≤ ~1.3e8 so (b-a)*1e6 stays far inside int64; centroid =
    truncating per-dim mean SUM(q)//n; division truncates toward zero
    (DuckDB integer ``//``), engine mirrors with sign*(abs//den).

    Scale: centroid fit is one tiny (label, dim) partial-sum fold; the
    scoring pass is a stateless batch matmul against the broadcast
    k x dim centroid matrix; the per-label rollup ships 3 ints."""
    src = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding", "label"])

    def cent_partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(np.stack(df["embedding"].to_numpy()) * 1e3
                     + 0.5).astype(np.int64)
        labs = df["label"].to_numpy().astype(np.int64)
        outs = []
        for lb in np.unique(labs):
            s = q[labs == lb].sum(axis=0)
            outs.append(pd.DataFrame({
                "label": np.int64(lb),
                "i": np.arange(1, q.shape[1] + 1, dtype=np.int64),
                "s": s, "n": np.int64((labs == lb).sum())}))
        return pd.concat(outs, ignore_index=True)

    cent_rows = collect_rows(bucketed_sum(
        src.map_batches(cent_partial, batch_format="pandas"),
        ["label", "i"], ["s", "n"], num_buckets=2))
    by_label: dict[int, dict[int, int]] = {}
    n_dims = max(r["i"] for r in cent_rows)
    for r in cent_rows:
        by_label.setdefault(int(r["label"]), {})[int(r["i"])] = \
            int(r["s"]) // int(r["n"]) if r["s"] >= 0 else \
            -((-int(r["s"])) // int(r["n"]))
    labs_sorted = sorted(by_label)
    cent = np.array([[by_label[lb][i + 1] for i in range(n_dims)]
                     for lb in labs_sorted], dtype=np.int64)
    lab_index = {lb: j for j, lb in enumerate(labs_sorted)}
    c_ref = ray.put((cent, lab_index))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        c, idx = ray.get(c_ref)
        q = np.floor(np.stack(df["embedding"].to_numpy()) * 1e3
                     + 0.5).astype(np.int64)
        labs = df["label"].to_numpy().astype(np.int64)
        # n x k x d fits: k = label count (small), d = dims
        diff = q[:, None, :] - c[None, :, :]
        d2 = (diff * diff).sum(axis=2)            # n x k, int64-exact
        own = np.array([idx[int(l)] for l in labs])
        a = d2[np.arange(len(labs)), own]
        d2m = d2.copy()
        d2m[np.arange(len(labs)), own] = np.iinfo(np.int64).max
        b = d2m.min(axis=1)
        num = (b - a) * 1_000_000
        den = np.maximum(np.maximum(a, b), 1)
        s = np.sign(num) * (np.abs(num) // den)   # trunc toward zero
        out = pd.DataFrame({"label": labs, "n": np.int64(1),
                            "sum_sil_micro": s,
                            "n_pos": (s > 0).astype("int64")})
        return out.groupby("label", as_index=False).sum().astype(
            {"label": "int64", "n": "int64", "sum_sil_micro": "int64",
             "n_pos": "int64"})

    agg = bucketed_sum(src.map_batches(score, batch_format="pandas"),
                       ["label"], ["n", "sum_sil_micro", "n_pos"],
                       num_buckets=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        num = df["sum_sil_micro"].to_numpy()
        den = df["n"].to_numpy()
        mean = np.sign(num) * (np.abs(num) // den)
        return df.assign(mean_sil_micro=mean.astype("int64"))

    return agg.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# IQR anomaly detection on event values
# ---------------------------------------------------------------------------

def event_value_outliers(sf_dir: str,
                         bin_micro: int = 250_000) -> pa.Table:
    """Tukey-fence outlier panel per event_type: exact interpolated
    q1/q3 of ``value`` (micro-units) via the two-pass
    exact_partitioned_ranks machinery, then a broadcast-bounds counting
    pass — n, q1/q3 (centi-micro, the exact percentile_cont integers)
    and the rows outside [q1 - 1.5*IQR, q3 + 1.5*IQR].

    All fence comparisons stay integral: v is low iff
    200*v_micro < 2*q1c - 3*(q3c - q1c) (centi-micro both sides, the
    1.5 lifted to x2/x3 integers); high symmetrically.

    Scale: pass 1/2 are the shared rank machinery (histogram partials +
    per-(type, bin) tasks — no type is co-located); pass 3 is a
    stateless counting scan against a k-entry broadcast dict."""
    src = read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["event_type", "event_id", "value"])
    pairs = src.map_batches(
        lambda df: pd.DataFrame({
            "event_type": df["event_type"],
            "vm": _micro(df["value"].to_numpy()),
            "event_id": df["event_id"].astype("int64")}),
        batch_format="pandas")

    hit_schema = pa.schema([("event_type", pa.string()),
                            ("p", pa.int64()), ("which", pa.string()),
                            ("vm", pa.int64())])
    ps = (25, 75)

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
                        "event_type": hit["event_type"].to_numpy(),
                        "p": np.int64(p), "which": which,
                        "vm": hit["vm"].to_numpy()}))
        if not outs:
            return hit_schema.empty_table().to_pandas()
        return pd.concat(outs, ignore_index=True)

    hits = collect_rows(exact_partitioned_ranks(
        pairs, "event_type", "vm", "event_id", bin_micro, emit,
        hit_schema))
    cnt = collect_rows(bucketed_sum(
        pairs.map_batches(
            lambda df: df.groupby("event_type", as_index=False)
            .size().rename(columns={"size": "n"}).astype({"n": "int64"}),
            batch_format="pandas"),
        ["event_type"], ["n"], num_buckets=2))
    n_of = {r["event_type"]: r["n"] for r in cnt}
    lo = {(r["event_type"], r["p"]): r["vm"] for r in hits
          if r["which"] == "lo"}
    hi = {(r["event_type"], r["p"]): r["vm"] for r in hits
          if r["which"] == "hi"}
    q_of: dict[str, tuple[int, int]] = {}
    for et, n in n_of.items():
        qc = {}
        for p in ps:
            rem = (p * (n - 1)) % 100
            vlo = lo[(et, p)]
            vhi = hi.get((et, p), vlo)
            qc[p] = 100 * vlo + rem * (vhi - vlo)
        q_of[et] = (qc[25], qc[75])
    b_ref = ray.put(q_of)

    def fence_counts(df: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(b_ref)
        rows = []
        for et, g in df.groupby("event_type", sort=False):
            q1c, q3c = q[et]
            iqr = q3c - q1c
            v200 = 200 * g["vm"].to_numpy()
            rows.append((et,
                         int((v200 < 2 * q1c - 3 * iqr).sum()),
                         int((v200 > 2 * q3c + 3 * iqr).sum())))
        return pd.DataFrame(rows, columns=["event_type", "n_low",
                                           "n_high"]) \
            .astype({"n_low": "int64", "n_high": "int64"})

    fences = collect_rows(bucketed_sum(
        pairs.map_batches(fence_counts, batch_format="pandas"),
        ["event_type"], ["n_low", "n_high"], num_buckets=2))
    f_of = {r["event_type"]: r for r in fences}
    ets = sorted(n_of)
    return pa.table({
        "event_type": pa.array(ets, pa.string()),
        "n": pa.array([n_of[e] for e in ets], pa.int64()),
        "q1_centi": pa.array([q_of[e][0] for e in ets], pa.int64()),
        "q3_centi": pa.array([q_of[e][1] for e in ets], pa.int64()),
        "n_low": pa.array([f_of[e]["n_low"] for e in ets], pa.int64()),
        "n_high": pa.array([f_of[e]["n_high"] for e in ets], pa.int64())})


# ---------------------------------------------------------------------------
# categorical-dependence + encoding panels
# ---------------------------------------------------------------------------

def source_lang_mi(sf_dir: str) -> pa.Table:
    """Mutual information between the source feed and the language
    label, per contingency cell — the feature-selection signal beside
    the chi-square independence test (status_priority_chisq).

    Integer contract (the KL machinery's): per cell the contribution
    c_sl · ln((c_sl·N)/(c_s·c_l)) quantises to micro-nats half-up; the
    ln argument is ONE float division of two exact integer products.
    The corpus pass is a distributed (source, lang) partial count; the
    cell table is (feeds × languages)-bounded, so the finish is
    driver-small by construction."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["source", "lang"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "lang"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return g.astype({"c": "int64"})

    cells = collect_rows(bucketed_sum(
        docs.map_batches(part, batch_format="pandas"),
        ["source", "lang"], ["c"], num_buckets=4))
    cs: dict[str, int] = {}
    cl: dict[str, int] = {}
    for r in cells:
        cs[r["source"]] = cs.get(r["source"], 0) + int(r["c"])
        cl[r["lang"]] = cl.get(r["lang"], 0) + int(r["c"])
    n = sum(cs.values())
    rows = sorted(cells, key=lambda r: (r["source"], r["lang"]))
    mi = []
    for r in rows:
        c = int(r["c"])
        arg = float(c * n) / float(cs[r["source"]] * cl[r["lang"]])
        mi.append(int(np.floor(c * np.log(arg) * 1e6 + 0.5)))
    return pa.table({
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "c": pa.array([int(r["c"]) for r in rows], pa.int64()),
        "mi_term_micro": pa.array(mi, pa.int64())})


def segment_target_encoding(sf_dir: str, m: int = 100) -> pa.Table:
    """Smoothed target (mean) encoding of the customer market segment
    against order price — enc = (sum + m·global_mean)/(n + m), the
    leakage-resistant categorical encoder (Micci-Barreca 2001).

    Exact-integer finish: enc_micro_cents =
    floor((sum_cents·N + m·total_cents)·10⁶ / (N·(n + m))) evaluated in
    Python arbitrary-precision ints on the segment-cardinality result
    (DuckDB mirror: the same expression in HUGEINT).  The heavy pass —
    the orders×customer join and per-segment sums — is the distributed
    bucketed hash join; only (segment, n, sum) rows reach the driver."""
    from ..stages.joins import hash_join
    from .analytics import _cents

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda df: pd.DataFrame({
            "custkey": df["o_custkey"],
            "cents": _cents(df["o_totalprice"].to_numpy())}),
        batch_format="pandas")
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    cust = cust.map_batches(
        lambda df: df.rename(columns={"c_custkey": "custkey"}),
        batch_format="pandas")
    joined = hash_join(orders, cust, on=["custkey"], how="inner",
                       num_buckets=16)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum"))
        return g.astype({"n": "int64", "sum_cents": "int64"})

    segs = collect_rows(bucketed_sum(
        joined.map_batches(part, batch_format="pandas"),
        ["c_mktsegment"], ["n", "sum_cents"], num_buckets=4))
    segs.sort(key=lambda r: r["c_mktsegment"])
    n_tot = sum(int(r["n"]) for r in segs)
    total = sum(int(r["sum_cents"]) for r in segs)
    enc = []
    for r in segs:
        num = (int(r["sum_cents"]) * n_tot + m * total) * 1_000_000
        enc.append(num // (n_tot * (int(r["n"]) + m)))
    return pa.table({
        "c_mktsegment": pa.array([r["c_mktsegment"] for r in segs],
                                 pa.string()),
        "n": pa.array([int(r["n"]) for r in segs], pa.int64()),
        "sum_cents": pa.array([int(r["sum_cents"]) for r in segs],
                              pa.int64()),
        "enc_micro_cents": pa.array(enc, pa.int64())})


# ---------------------------------------------------------------------------
# round-4 batch F: model evaluation, inequality, session PMI, dup matrix
# ---------------------------------------------------------------------------

def corpus_langid_model(sf_dir: str):
    """The scale's corpus-trained trigram langid model (artifact-backed:
    only the profile PATH ships with tasks; workers load it once —
    wsid_ray/langprofile.py)."""
    from ..artifacts import ensure
    from ..langprofile import TrigramLangId
    return TrigramLangId(ensure(sf_dir)["langid_profile"])


def langid_confusion(sf_dir: str, num_buckets: int = 4,
                     model: str | None = "corpus") -> rd.Dataset:
    """Confusion matrix of the langid model against the fixture's true
    ``lang`` label — the model-drift monitor for the language gate.

    ``model="corpus"`` (default since r5) scores with the corpus-trained
    trigram profile (VERDICT r04 item 2; SQL mirror reads the same
    artifact); ``model=None`` keeps the builtin marker heuristic.

    One fused pass: each batch scores itself and emits
    (lang, lang_pred, n_docs) partial counts, so no per-doc row ever
    shuffles; the exchange moves at most |langs|² rows per batch."""
    from ..stages.textstats import langid_batch, read_documents

    scorer = corpus_langid_model(sf_dir) if model == "corpus" else None
    docs = read_documents(sf_dir, columns=["doc_id", "text", "lang"])

    def part(t: pa.Table) -> pd.DataFrame:
        if scorer is not None:
            preds, _ = scorer(t["text"].to_pylist())
        else:
            preds = langid_batch(t)["lang_pred"].to_pylist()
        df = pd.DataFrame({
            "lang": t["lang"].to_pandas(),
            "lang_pred": pd.Series(preds, dtype=object)})
        g = df.groupby(["lang", "lang_pred"], as_index=False).size() \
              .rename(columns={"size": "n_docs"})
        return g.astype({"n_docs": "int64"})

    return bucketed_sum(docs.map_batches(part, batch_format="pyarrow"),
                        ["lang", "lang_pred"], ["n_docs"],
                        num_buckets=num_buckets)


def langid_eval(sf_dir: str) -> pa.Table:
    """Per-language precision / recall / F1 of the langid model vs the
    fixture label — exact-integer finish over the confusion matrix
    (micro-units, truncating division; NULL when a denominator is 0).

    The corpus pass is ``langid_confusion``; only the |langs|²-bounded
    matrix reaches the driver."""
    conf = collect_rows(langid_confusion(sf_dir))
    labels = sorted({r["lang"] for r in conf}
                    | {r["lang_pred"] for r in conf})
    cols: dict[str, list] = {k: [] for k in (
        "lang", "n_true", "tp", "fp", "fn",
        "precision_micro", "recall_micro", "f1_micro")}
    for lab in labels:
        tp = sum(int(r["n_docs"]) for r in conf
                 if r["lang"] == lab and r["lang_pred"] == lab)
        fp = sum(int(r["n_docs"]) for r in conf
                 if r["lang"] != lab and r["lang_pred"] == lab)
        fn = sum(int(r["n_docs"]) for r in conf
                 if r["lang"] == lab and r["lang_pred"] != lab)
        cols["lang"].append(lab)
        cols["n_true"].append(tp + fn)
        cols["tp"].append(tp)
        cols["fp"].append(fp)
        cols["fn"].append(fn)
        cols["precision_micro"].append(
            tp * 1_000_000 // (tp + fp) if tp + fp else None)
        cols["recall_micro"].append(
            tp * 1_000_000 // (tp + fn) if tp + fn else None)
        cols["f1_micro"].append(
            2 * tp * 1_000_000 // (2 * tp + fp + fn)
            if 2 * tp + fp + fn else None)
    return pa.table({
        "lang": pa.array(cols["lang"], pa.string()),
        "n_true": pa.array(cols["n_true"], pa.int64()),
        "tp": pa.array(cols["tp"], pa.int64()),
        "fp": pa.array(cols["fp"], pa.int64()),
        "fn": pa.array(cols["fn"], pa.int64()),
        "precision_micro": pa.array(cols["precision_micro"], pa.int64()),
        "recall_micro": pa.array(cols["recall_micro"], pa.int64()),
        "f1_micro": pa.array(cols["f1_micro"], pa.int64())})


def status_theil_index(sf_dir: str, num_buckets: int = 4) -> pa.Table:
    """Theil T inequality index of order value per status — the
    decomposable complement of the Gini panel (``q_status_gini``):
    T = (1/(N·μ)) · Σ xᵢ·ln(xᵢ·N/Σx).

    Integer contract: per row lᵢ = floor(ln(centsᵢ·n/Σcents)·1e6+0.5)
    (the ln argument is ONE double expression — exact-int numerator
    under 2⁵³ at bench scale, noted for 100 TB — identical in DuckDB);
    the per-row product cents·lᵢ is int64-exact (≤ ~1.3e15) and sums in
    Python arbitrary precision (HUGEINT mirror), carried between stages
    as decimal strings (the Gini/PCA precedent).  theil_micro =
    Σterms // Σcents, truncating on both sides (Theil ≥ 0).  Two scans,
    no co-located status partition."""
    from .analytics import _cents

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderstatus", "o_totalprice"])

    def base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderstatus": df["o_orderstatus"],
            "cents": _cents(df["o_totalprice"].to_numpy())})

    pr = orders.map_batches(base, batch_format="pandas")

    def m1(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderstatus", as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum"))
        return g.astype({"n": "int64", "sum_cents": "int64"})

    tot = collect_rows(bucketed_sum(
        pr.map_batches(m1, batch_format="pandas"),
        ["o_orderstatus"], ["n", "sum_cents"], num_buckets=num_buckets))
    stats = {r["o_orderstatus"]: (int(r["n"]), int(r["sum_cents"]))
             for r in tot}

    def terms(df: pd.DataFrame) -> pd.DataFrame:
        sts, sums = [], []
        for st, g in df.groupby("o_orderstatus", sort=False):
            n, total = stats[st]
            c = g["cents"].to_numpy()
            lam = np.floor(np.log(c.astype(np.float64) * float(n)
                                  / float(total)) * 1e6 + 0.5) \
                .astype(np.int64)
            prod = c * lam          # |cents·l_micro| <= ~1.3e15: exact
            s = 0
            for i in range(0, len(prod), 4096):   # int64-safe chunks
                s += int(prod[i:i + 4096].sum())
            sts.append(st)
            sums.append(str(s))
        return pd.DataFrame({
            "o_orderstatus": pd.Series(sts, dtype="string"),
            "term_sum": pd.Series(sums, dtype="string")})

    parts = collect_rows(pr.map_batches(terms, batch_format="pandas"))
    acc: dict[str, int] = {}
    for r in parts:
        acc[r["o_orderstatus"]] = acc.get(r["o_orderstatus"], 0) \
            + int(r["term_sum"])
    rows = sorted(stats)
    theil = []
    for st in rows:
        n, total = stats[st]
        s = acc.get(st, 0)
        q = abs(s) // total
        theil.append(q if s >= 0 else -q)   # truncating (SQL //)
    return pa.table({
        "o_orderstatus": pa.array(rows, pa.string()),
        "n": pa.array([stats[st][0] for st in rows], pa.int64()),
        "sum_cents": pa.array([stats[st][1] for st in rows], pa.int64()),
        "theil_micro": pa.array(theil, pa.int64())})


def session_type_pmi(sf_dir: str, gap_minutes: int = 30,
                     num_buckets: int = 16) -> pa.Table:
    """PMI between event types co-occurring inside the same gap-based
    session — the basket-affinity signal at session granularity (the
    conversation-level sibling is ``term_association_rules``).

    One bucketed shuffle keyed on the user (the sessionize plan); inside
    a bucket everything is vectorised pandas: session ids via
    diff/cumsum, per-session distinct types via drop_duplicates, pairs
    via a per-session self-merge (fan-out ≤ |types|² rows per session).
    Partials encode singles as (t, ''), the session total as ('', ''),
    so ONE tiny (type_a, type_b) fold finishes the sweep;
    pmi_micro = floor(ln(n_both·S / (n_a·n_b))·1e6 + 0.5) with
    exact-int products inside the one double division."""
    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort", ignore_index=True)
        prev_ts = df.groupby("user_id", sort=False)["ts"].shift()
        new_s = prev_ts.isna() | ((df["ts"] - prev_ts) > gap)
        sid = (new_s.groupby(df["user_id"], sort=False)
               .cumsum() - 1).astype("int64")
        pres = pd.DataFrame({
            "user_id": df["user_id"], "sid": sid,
            "t": df["event_type"]}).drop_duplicates()
        sing = pres.groupby("t", as_index=False).size()
        n_sess = len(pres[["user_id", "sid"]].drop_duplicates())
        both = pres.merge(pres, on=["user_id", "sid"])
        both = both[both["t_x"] < both["t_y"]]
        pairs = both.groupby(["t_x", "t_y"], as_index=False).size()
        return pd.DataFrame({
            "type_a": (list(pairs["t_x"]) + list(sing["t"]) + [""]),
            "type_b": (list(pairs["t_y"]) + [""] * len(sing) + [""]),
            "c": pd.array(list(pairs["size"]) + list(sing["size"])
                          + [n_sess], dtype="int64")})

    folded = collect_rows(bucketed_sum(
        bucketed_group_apply(ev, ["user_id"], part,
                             num_buckets=num_buckets),
        ["type_a", "type_b"], ["c"], num_buckets=4))
    sing = {r["type_a"]: int(r["c"]) for r in folded
            if r["type_b"] == "" and r["type_a"] != ""}
    n_sessions = sum(int(r["c"]) for r in folded
                     if r["type_a"] == "" and r["type_b"] == "")
    pairs = sorted((r for r in folded if r["type_b"] != ""),
                   key=lambda r: (r["type_a"], r["type_b"]))
    pmi = []
    for r in pairs:
        arg = float(int(r["c"]) * n_sessions) \
            / float(sing[r["type_a"]] * sing[r["type_b"]])
        pmi.append(int(np.floor(np.log(arg) * 1e6 + 0.5)))
    return pa.table({
        "type_a": pa.array([r["type_a"] for r in pairs], pa.string()),
        "type_b": pa.array([r["type_b"] for r in pairs], pa.string()),
        "n_both": pa.array([int(r["c"]) for r in pairs], pa.int64()),
        "n_a": pa.array([sing[r["type_a"]] for r in pairs], pa.int64()),
        "n_b": pa.array([sing[r["type_b"]] for r in pairs], pa.int64()),
        "n_sessions": pa.array([n_sessions] * len(pairs), pa.int64()),
        "pmi_micro": pa.array(pmi, pa.int64())})


def dup_source_matrix(sf_dir: str, threshold: float = 0.5,
                      num_buckets: int = 16) -> rd.Dataset:
    """Near-dup pair counts crossed with the source feed of each side —
    the "which feeds mirror each other" matrix that decides crawl
    de-prioritisation.  Rides the hash-green LSH→verify chain
    (``jaccard_pairs``); sources attach via two partitioned hash joins
    (only the candidate pairs and the (doc_id, source) projection move);
    the (source_lo, source_hi) fold is feeds²-bounded."""
    from ..stages.dedup import jaccard_pairs
    from ..stages.joins import hash_join
    from ..stages.textstats import read_documents

    docs = read_documents(sf_dir)
    pairs = jaccard_pairs(docs, threshold=threshold, shingle_k=3)
    src = read_documents(sf_dir, columns=["doc_id", "source"])

    def tag(name: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({name: t["doc_id"],
                             f"src_{name}": t["source"]})
        return fn

    j = hash_join(
        hash_join(pairs, src.map_batches(tag("doc_a"),
                                         batch_format="pyarrow"),
                  on=["doc_a"], num_buckets=num_buckets),
        src.map_batches(tag("doc_b"), batch_format="pyarrow"),
        on=["doc_b"], num_buckets=num_buckets)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        a = df["src_doc_a"].to_numpy()
        b = df["src_doc_b"].to_numpy()
        g = pd.DataFrame({"source_a": np.minimum(a, b),
                          "source_b": np.maximum(a, b)}) \
            .groupby(["source_a", "source_b"], as_index=False).size() \
            .rename(columns={"size": "n_pairs"})
        return g.astype({"n_pairs": "int64"})

    return bucketed_sum(j.map_batches(fold, batch_format="pandas"),
                        ["source_a", "source_b"], ["n_pairs"],
                        num_buckets=4)


# ---------------------------------------------------------------------------
# round-4 batch G: rank tests, ranking metrics, concentration, edit dist
# ---------------------------------------------------------------------------

def priority_price_mwu(sf_dir: str, prio_a: str = "1-URGENT",
                       prio_b: str = "5-LOW",
                       bin_cents: int = 100_000) -> pa.Table:
    """Mann–Whitney U between two order priorities on price — the
    non-parametric sibling of the Welch panel (same comparison, no
    normality assumption).  Exact rank identity with average ranks for
    ties: 2·avgrank = 2·lo + cnt + 1 per tie group, so every partial is
    an integer.  Runs on the generic two-pass rank machinery (one
    combined sample, value-binned — a tie group never spans bins), so
    neither sample is co-located; U2 = Σ2rankₐ − nₐ(nₐ+1) and
    auc_micro = U2·10⁶ // (2·nₐ·n_b) finish on three integers."""
    from .analytics import _cents

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"])

    def base(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderpriority"].isin([prio_a, prio_b])]
        return pd.DataFrame({
            "pk": pd.Series(["all"] * len(df), dtype="string"),
            "cents": _cents(df["o_totalprice"].to_numpy()),
            "o_orderkey": df["o_orderkey"].astype("int64").to_numpy(),
            "ga": (df["o_orderpriority"] == prio_a)
            .astype("int64").to_numpy()})

    pr = orders.map_batches(base, batch_format="pandas")
    part_schema = pa.schema([("s2a", pa.string()), ("n_a", pa.int64()),
                             ("n_b", pa.int64())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        c = g["cents"].to_numpy()
        ga = g["ga"].to_numpy()
        # tie groups are contiguous in the sorted g
        _, first, cnt = np.unique(c, return_index=True,
                                  return_counts=True)
        lo = start + first                       # 0-based global lo rank
        w = 2 * lo + cnt + 1                     # = 2·avgrank per group
        na_v = np.add.reduceat(ga, first)
        s2a = sum(int(a) * int(b) for a, b in zip(na_v, w))
        return pd.DataFrame({
            "s2a": pd.Series([str(s2a)], dtype="string"),
            "n_a": [int(ga.sum())],
            "n_b": [int(len(g) - ga.sum())]})

    parts = collect_rows(exact_partitioned_ranks(
        pr, "pk", "cents", "o_orderkey", bin_cents, emit, part_schema,
        num_buckets=8))
    s2a = sum(int(r["s2a"]) for r in parts)
    n_a = sum(int(r["n_a"]) for r in parts)
    n_b = sum(int(r["n_b"]) for r in parts)
    u2 = s2a - n_a * (n_a + 1)
    auc = u2 * 1_000_000 // (2 * n_a * n_b) if n_a and n_b else None
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "u2": pa.array([u2], pa.int64()),
        "auc_micro": pa.array([auc], pa.int64())})


def dup_quality_auc(sf_dir: str, num_buckets: int = 4) -> pa.Table:
    """AUC of the alpha-ratio quality score as a discriminator of
    near-dup membership (the end-to-end LSH→verify→components drop
    list) — "does low quality predict duplication".

    Exact integer AUC over distinct-score counts: for each score v
    ascending, numerator2 += n_pos(v)·(2·cum_neg(<v) + n_neg(v)); the
    driver finish is score-cardinality-bounded (≤ 10⁶+1 distinct
    6-dp micros, independent of corpus size).  The drop list broadcasts
    as a key set; documents are never shuffled."""
    from ..stages.dedup import near_dup_drop_list
    from ..stages.textstats import quality_batch, read_documents

    drops = {r["doc_id"] for r in collect_rows(
        near_dup_drop_list(read_documents(sf_dir)))}
    d_ref = ray.put(drops)
    docs = read_documents(sf_dir, columns=["doc_id", "text"])

    def part(t: pa.Table) -> pd.DataFrame:
        q = quality_batch(t)
        score = np.floor(np.asarray(q["alpha_ratio"], dtype=np.float64)
                         * 1e6 + 0.5).astype(np.int64)
        dd = ray.get(d_ref)
        is_dup = q["doc_id"].to_pandas().isin(dd).astype("int64")
        g = pd.DataFrame({"score_micro": score, "is_dup": is_dup}) \
            .groupby(["score_micro", "is_dup"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return g.astype({"n": "int64"})

    cnt = collect_rows(bucketed_sum(
        docs.map_batches(part, batch_format="pyarrow"),
        ["score_micro", "is_dup"], ["n"], num_buckets=num_buckets))
    pos: dict[int, int] = {}
    neg: dict[int, int] = {}
    for r in cnt:
        d = pos if int(r["is_dup"]) else neg
        v = int(r["score_micro"])
        d[v] = d.get(v, 0) + int(r["n"])
    num2, cum_neg = 0, 0
    for v in sorted(set(pos) | set(neg)):
        num2 += pos.get(v, 0) * (2 * cum_neg + neg.get(v, 0))
        cum_neg += neg.get(v, 0)
    n_pos, n_neg = sum(pos.values()), sum(neg.values())
    auc = (num2 * 1_000_000 // (2 * n_pos * n_neg)
           if n_pos and n_neg else None)
    return pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "auc_micro": pa.array([auc], pa.int64())})


def lang_source_hhi(sf_dir: str, num_buckets: int = 4) -> pa.Table:
    """Herfindahl–Hirschman concentration of the source mix per
    language — "is this language fed by one crawl?" (the diversity
    gate beside nation_segment_entropy).  hhi_micro =
    Σ_s n_ls²·10⁶ // N_l² — exact ints end to end; one partial-count
    pass, a (langs × feeds)-bounded fold, driver finish."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["lang", "source"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "source"], as_index=False).size() \
              .rename(columns={"size": "n"})
        return g.astype({"n": "int64"})

    cells = collect_rows(bucketed_sum(
        docs.map_batches(part, batch_format="pandas"),
        ["lang", "source"], ["n"], num_buckets=num_buckets))
    tot: dict[str, int] = {}
    sq: dict[str, int] = {}
    for r in cells:
        lang, n = r["lang"], int(r["n"])
        tot[lang] = tot.get(lang, 0) + n
        sq[lang] = sq.get(lang, 0) + n * n
    langs = sorted(tot)
    return pa.table({
        "lang": pa.array(langs, pa.string()),
        "n_docs": pa.array([tot[la] for la in langs], pa.int64()),
        "hhi_micro": pa.array(
            [sq[la] * 1_000_000 // (tot[la] * tot[la]) for la in langs],
            pa.int64())})


def _levenshtein(a: str, b: str) -> int:
    """Vectorised-row DP edit distance (numpy inner loops only over the
    shorter string's rows; the left-to-right min recurrence folds via
    minimum.accumulate of (v − j) + j)."""
    if a == b:
        return 0
    if not a or not b:
        return max(len(a), len(b))
    A = np.array(list(a))
    B = np.array(list(b))
    idx = np.arange(len(B) + 1, dtype=np.int64)
    prev = idx.copy()
    base = np.empty(len(B) + 1, dtype=np.int64)
    for i, ca in enumerate(A, 1):
        cost = (B != ca).astype(np.int64)
        base[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + cost, out=base[1:])
        cur = np.minimum.accumulate(base - idx) + idx
        prev = cur.copy()
    return int(prev[-1])


def doc_edit_pairs(sf_dir: str, head_chars: int = 200,
                   num_buckets: int = 16) -> rd.Dataset:
    """Character-level Levenshtein distance on the MinHash-LSH candidate
    pairs (first ``head_chars`` chars of each side) — the fuzzy-match
    verifier for OCR/typo near-dups that token-set Jaccard misses.

    Same physical plan as jaccard_pairs: candidates from the banded LSH
    (never all-pairs), two partitioned hash joins attach each side's
    text head, per-pair DP only on candidates (O(head²) each,
    numpy-vectorised rows).  DuckDB mirror: levenshtein() on the same
    candidate set."""
    from ..stages.dedup import minhash_candidates
    from ..stages.joins import hash_join
    from ..stages.textstats import read_documents

    docs = read_documents(sf_dir)
    cands = minhash_candidates(docs, shingle_k=3)

    def head(name: str):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                name: t["doc_id"],
                f"head_{name}": pc.utf8_slice_codeunits(
                    t["text"], 0, head_chars)})
        return fn

    j = hash_join(
        hash_join(cands, docs.map_batches(head("doc_a"),
                                          batch_format="pyarrow"),
                  on=["doc_a"], num_buckets=num_buckets),
        docs.map_batches(head("doc_b"), batch_format="pyarrow"),
        on=["doc_b"], num_buckets=num_buckets)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_a": df["doc_a"].astype("int64"),
            "doc_b": df["doc_b"].astype("int64"),
            "edit_dist": pd.array(
                [_levenshtein(a, b) for a, b in
                 zip(df["head_doc_a"], df["head_doc_b"])],
                dtype="int64")})

    out_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("edit_dist", pa.int64())])
    return j.map_batches(verify, batch_format="pandas").map_batches(
        lambda t: t.cast(out_schema), batch_format="pyarrow")


def ann_ndcg(sf_dir: str) -> pa.Table:
    """nDCG@k of the approximate ANN hit lists (IVF, LSH) against the
    exact brute-force top-k — position-weighted ranking quality beside
    the hash-green set-overlap ``knn_recall``.

    Binary relevance (hit ∈ exact top-k); position weights
    w_i = floor(10⁶/log2(i+1) + 0.5) quantise once (identical double
    expression in DuckDB); dcg/idcg are integer sums and
    ndcg_micro = dcg·10⁶ // idcg.  The exact side is the distributed
    scorer; the approximate side is the engine's own seeded artifact —
    both are what the SQL mirror reads."""
    import pyarrow.parquet as pq

    from ..artifacts import ANN_K, ann_queries, ensure
    from ..stages.knn import knn_topk, read_embeddings
    from ..util import collect_table

    paths = ensure(sf_dir)
    q = ann_queries(sf_dir)
    et = collect_table(knn_topk(read_embeddings(sf_dir), q, k=ANN_K))
    exact = set(zip(et["query_id"].to_pylist(),
                    et["vec_id"].to_pylist()))
    w = {i: int(np.floor(1e6 / np.log2(i + 1) + 0.5))
         for i in range(1, ANN_K + 1)}
    idcg = sum(w.values())
    rows = []
    for method in ("ivf", "lsh"):
        t = pq.read_table(paths[f"{method}_topk"]).to_pandas()
        t = t.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        t["pos"] = t.groupby("query_id").cumcount() + 1
        for qid, g in t.groupby("query_id"):
            dcg = sum(w[int(p)] for p, v in zip(g["pos"], g["vec_id"])
                      if (qid, int(v)) in exact)
            rows.append((method, int(qid), dcg,
                         dcg * 1_000_000 // idcg))
    return pa.table({
        "method": pa.array([r[0] for r in rows], pa.string()),
        "query_id": pa.array([r[1] for r in rows], pa.int64()),
        "dcg": pa.array([r[2] for r in rows], pa.int64()),
        "ndcg_micro": pa.array([r[3] for r in rows], pa.int64())})


# ---------------------------------------------------------------------------
# round-4 batch H: Spearman, profile cosine, Pareto deciles, JL projection
# ---------------------------------------------------------------------------

def _chunk_int_sum(a: np.ndarray, chunk: int = 4096) -> int:
    """Exact Python-int sum of an int64 array whose TOTAL may overflow
    int64 (per-chunk partial sums stay in range; the fold is arbitrary
    precision)."""
    s = 0
    for i in range(0, len(a), chunk):
        s += int(a[i:i + chunk].sum())
    return s


def qty_price_spearman(sf_dir: str, bin_cents: int = 100_000,
                       num_buckets: int = 16) -> pa.Table:
    """Distributed EXACT Spearman rank correlation between lineitem
    quantity and extended price — the monotonic-dependence screen next
    to the OLS panel.

    Integer contract: per variable, average ranks with ties enter as
    u = 2·avgrank = 2·(rows strictly below) + cnt + 1 — always an
    integer.  Quantity has a tiny distinct domain, so its u map folds
    from a 50-row marginal and broadcasts; the price side rides the
    generic two-pass rank machinery (no co-location), whose emit
    carries each row's quantity along, so Σu, Σv, Σuv, Σu², Σv²
    accumulate in ONE pass with NO row-id join (the fixture's lineitem
    key is not unique — a row-keyed join would fan out).  Partials are
    decimal-string Python ints (past int64 at corpus scale); ρ =
    (n·Σuv − Σu·Σv)/√((n·Σu²−Σu²ₘ)(n·Σv²−Σv²ₘ)) is one float chain
    quantised to micro — identical HUGEINT→DOUBLE expression in
    DuckDB."""
    from .analytics import _cents, exact_partitioned_ranks

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"])

    def base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "pk": pd.Series(["all"] * len(df), dtype="string"),
            "xq": np.floor(df["l_quantity"].to_numpy(np.float64)
                           + 0.5).astype(np.int64),
            "yc": _cents(df["l_extendedprice"].to_numpy())})

    pr = li.map_batches(base, batch_format="pandas")

    def xpart(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("xq", as_index=False).size() \
            .rename(columns={"size": "cx"})
        return g.astype({"cx": "int64"})

    xh = sorted(collect_rows(bucketed_sum(
        pr.map_batches(xpart, batch_format="pandas"),
        ["xq"], ["cx"], num_buckets=4)), key=lambda r: int(r["xq"]))
    u_map, below = {}, 0
    for r in xh:
        c = int(r["cx"])
        u_map[int(r["xq"])] = 2 * below + c + 1
        below += c

    part_schema = pa.schema([("n", pa.int64()), ("su", pa.string()),
                             ("sv", pa.string()), ("suv", pa.string()),
                             ("su2", pa.string()), ("sv2", pa.string())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        yc = g["yc"].to_numpy()
        _, first, cnt = np.unique(yc, return_index=True,
                                  return_counts=True)
        v = np.repeat(2 * (start + first) + cnt + 1, cnt)
        u = g["xq"].map(u_map).to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "n": pd.Series([len(g)], dtype="int64"),
            "su": pd.Series([str(_chunk_int_sum(u))], dtype="string"),
            "sv": pd.Series([str(_chunk_int_sum(v))], dtype="string"),
            "suv": pd.Series([str(_pairsum(u, v))], dtype="string"),
            "su2": pd.Series([str(_pairsum(u, u))], dtype="string"),
            "sv2": pd.Series([str(_pairsum(v, v))], dtype="string")})

    parts = collect_rows(exact_partitioned_ranks(
        pr, "pk", "yc", "xq", bin_cents, emit, part_schema,
        num_buckets=num_buckets))
    n = sum(int(r["n"]) for r in parts)
    su = sum(int(r["su"]) for r in parts)
    sv = sum(int(r["sv"]) for r in parts)
    suv = sum(int(r["suv"]) for r in parts)
    su2 = sum(int(r["su2"]) for r in parts)
    sv2 = sum(int(r["sv2"]) for r in parts)
    num = n * suv - su * sv
    dx = n * su2 - su * su
    dy = n * sv2 - sv * sv
    rho = (None if dx == 0 or dy == 0 else
           int(np.floor(float(num) / np.sqrt(float(dx) * float(dy))
                        * 1e6 + 0.5)))
    return pa.table({"n": pa.array([n], pa.int64()),
                     "rho_micro": pa.array([rho], pa.int64())})


def _pairsum(a: np.ndarray, b: np.ndarray, chunk: int = 4096) -> int:
    """Exact Python-int Σ aᵢ·bᵢ (per-element product int64-safe; the
    running total may not be)."""
    s = 0
    for i in range(0, len(a), chunk):
        s += int((a[i:i + chunk] * b[i:i + chunk]).sum())
    return s


def source_profile_cosine(sf_dir: str, num_buckets: int = 16) -> pa.Table:
    """Cosine similarity between the unigram-count profiles of every
    source-feed pair — "which feeds publish the same language" at the
    vocabulary level (the content-level sibling is dup_source_matrix).

    Exact integer dot/norm sums: per-batch (token, source) partial
    counts, ONE token-keyed shuffle whose groups expand to
    feeds²-bounded (src_a ≤ src_b) partial products, a tiny pair fold,
    and one float chain per pair at 6 dp.  Per-pair products are
    int64-safe at bench scale (count² per token); the 100 TB path
    upgrades the partials to decimal strings like the Spearman fold."""
    from ..stages.textstats import read_documents
    from ..stages.tokenize import tokenize_column
    from ..util import list_row_indices

    docs = read_documents(sf_dir, columns=["doc_id", "text", "source"])

    def part(t: pa.Table) -> pd.DataFrame:
        toks = tokenize_column(t["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        row_of = list_row_indices(toks)
        flat = toks.flatten()
        src = np.asarray(t["source"].to_pylist(), dtype=object)[row_of]
        g = pd.DataFrame({"token": flat.to_pandas(), "source": src}) \
            .groupby(["token", "source"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return g.astype({"c": "int64"})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["token", "source"], as_index=False)["c"].sum()
        m = df.merge(df, on="token")
        m = m[m["source_x"] <= m["source_y"]]
        m["dot"] = m["c_x"] * m["c_y"]
        out = m.groupby(["source_x", "source_y"],
                        as_index=False)["dot"].sum() \
            .rename(columns={"source_x": "src_a", "source_y": "src_b"})
        return out.astype({"dot": "int64"})

    part_schema = pa.schema([("src_a", pa.string()),
                             ("src_b", pa.string()),
                             ("dot", pa.int64())])
    folded = collect_rows(bucketed_sum(
        bucketed_group_apply(
            docs.map_batches(part, batch_format="pyarrow"),
            ["token"], pairs, num_buckets=num_buckets,
            out_schema=part_schema),
        ["src_a", "src_b"], ["dot"], num_buckets=4))
    norm = {r["src_a"]: int(r["dot"]) for r in folded
            if r["src_a"] == r["src_b"]}
    rows = sorted((r for r in folded if r["src_a"] < r["src_b"]),
                  key=lambda r: (r["src_a"], r["src_b"]))
    cos = [int(np.floor(float(int(r["dot"]))
                        / np.sqrt(float(norm[r["src_a"]])
                                  * float(norm[r["src_b"]]))
                        * 1e6 + 0.5)) for r in rows]
    return pa.table({
        "src_a": pa.array([r["src_a"] for r in rows], pa.string()),
        "src_b": pa.array([r["src_b"] for r in rows], pa.string()),
        "dot": pa.array([int(r["dot"]) for r in rows], pa.int64()),
        "cos_micro": pa.array(cos, pa.int64())})


def customer_revenue_pareto(sf_dir: str, n_tiles: int = 10,
                            bin_cents: int = 1_000_000) -> pa.Table:
    """Revenue concentration deciles (the Pareto/Lorenz panel): rank
    ordering customers by total order revenue, split into exact NTILE
    deciles (the hash-green order_price_ntile rule), report each
    decile's customer count, revenue and share of total in micro-units.

    Per-customer revenue is one bucketed grouped sum; deciles ride the
    generic two-pass rank machinery with the revenue stream PINNED (the
    upstream is itself a shuffle — the rank-engine pin rule); the decile
    fold is 10-row bounded and the share finish is exact-int."""
    from .analytics import (_cents, exact_partitioned_ranks, ntile_emit)

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "o_custkey": df["o_custkey"].astype("int64"),
            "rev": _cents(df["o_totalprice"].to_numpy())}) \
            .groupby("o_custkey", as_index=False)["rev"].sum()
        return g.astype({"rev": "int64"})

    rev = bucketed_sum(orders.map_batches(part, batch_format="pandas"),
                       ["o_custkey"], ["rev"], num_buckets=8)
    pr = rev.map_batches(
        lambda df: pd.DataFrame({
            "pk": pd.Series(["all"] * len(df), dtype="string"),
            "rev": df["rev"].astype("int64"),
            "o_custkey": df["o_custkey"].astype("int64")}),
        batch_format="pandas")

    part_schema = pa.schema([("decile", pa.int64()),
                             ("n_customers", pa.int64()),
                             ("rev_cents", pa.int64())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        ranks = start + np.arange(len(g), dtype=np.int64)
        dec = ntile_emit(n_tiles, ranks, n).astype("int64")
        out = pd.DataFrame({"decile": dec,
                            "rev_cents": g["rev"].to_numpy()}) \
            .groupby("decile", as_index=False).agg(
                n_customers=("rev_cents", "size"),
                rev_cents=("rev_cents", "sum"))
        return out[["decile", "n_customers", "rev_cents"]].astype(
            {"n_customers": "int64", "rev_cents": "int64"})

    folded = collect_rows(bucketed_sum(
        exact_partitioned_ranks(pr, "pk", "rev", "o_custkey", bin_cents,
                                emit, part_schema, num_buckets=8,
                                pin=True),
        ["decile"], ["n_customers", "rev_cents"], num_buckets=2))
    folded.sort(key=lambda r: int(r["decile"]))
    total = sum(int(r["rev_cents"]) for r in folded)
    return pa.table({
        "decile": pa.array([int(r["decile"]) for r in folded],
                           pa.int64()),
        "n_customers": pa.array([int(r["n_customers"]) for r in folded],
                                pa.int64()),
        "rev_cents": pa.array([int(r["rev_cents"]) for r in folded],
                              pa.int64()),
        "share_micro": pa.array(
            [int(r["rev_cents"]) * 1_000_000 // total for r in folded],
            pa.int64())})


# ---------------------------------------------------------------------------
# round-4 batch I: KS test, Cohen's kappa, lift deciles, Kendall, trim mean
# ---------------------------------------------------------------------------

def priority_price_ks(sf_dir: str, prio_a: str = "1-URGENT",
                      prio_b: str = "5-LOW",
                      bin_cents: int = 100_000,
                      num_buckets: int = 16) -> pa.Table:
    """Two-sample Kolmogorov–Smirnov D between two order priorities on
    price — the distribution-shape test beside the Welch (means) and
    Mann–Whitney (ranks) panels.

    Exact: D's numerator max|cumA·n_b − cumB·n_a| is an integer at
    every distinct value.  Two-level prefix, nothing co-located: pass 1
    folds a (value-bin, group) histogram (bin-count-bounded) into
    per-bin start offsets; pass 2 shuffles rows keyed on the BIN and
    scans each bin's distinct values vectorised, emitting one max per
    bin; d_micro = max·10⁶ // (n_a·n_b) finishes on three integers."""
    from .analytics import _cents

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"])

    def base(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderpriority"].isin([prio_a, prio_b])]
        return pd.DataFrame({
            "cents": _cents(df["o_totalprice"].to_numpy()),
            "ga": (df["o_orderpriority"] == prio_a)
            .astype("int64").to_numpy()})

    pr = orders.map_batches(base, batch_format="pandas")

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"bin": df["cents"].to_numpy() // bin_cents,
                          "ga": df["ga"]}) \
            .groupby(["bin", "ga"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return g.astype({"bin": "int64", "c": "int64"})

    rows = collect_rows(bucketed_sum(
        pr.map_batches(hist, batch_format="pandas"),
        ["bin", "ga"], ["c"], num_buckets=4))
    per_bin: dict[int, list[int]] = {}
    for r in rows:
        b = per_bin.setdefault(int(r["bin"]), [0, 0])
        b[int(r["ga"])] += int(r["c"])
    start_a, start_b = {}, {}
    ca = cb = 0
    for b in sorted(per_bin):
        start_a[b], start_b[b] = ca, cb
        cb += per_bin[b][0]
        ca += per_bin[b][1]
    n_a, n_b = ca, cb

    def binned(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(bin=(df["cents"].to_numpy()
                              // bin_cents).astype("int64"))

    def ksmax(df: pd.DataFrame) -> pd.DataFrame:
        bins, mx = [], []
        for b, g in df.groupby("bin", sort=False):
            cell = g.groupby("cents", sort=True)["ga"].agg(
                ["sum", "size"])
            cuma = start_a[int(b)] + cell["sum"].cumsum().to_numpy()
            cumb = start_b[int(b)] + (cell["size"]
                                      - cell["sum"]).cumsum().to_numpy()
            d = np.abs(cuma * n_b - cumb * n_a)
            bins.append(int(b))
            mx.append(int(d.max()))
        return pd.DataFrame({
            "bin": pd.Series(bins, dtype="int64"),
            "mx": pd.Series(mx, dtype="int64")})

    parts = collect_rows(bucketed_group_apply(
        pr.map_batches(binned, batch_format="pandas"), ["bin"], ksmax,
        num_buckets=num_buckets,
        out_schema=pa.schema([("bin", pa.int64()), ("mx", pa.int64())])))
    d_num = max((int(r["mx"]) for r in parts), default=0)
    return pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "d_micro": pa.array(
            [d_num * 1_000_000 // (n_a * n_b) if n_a and n_b else None],
            pa.int64())})


def langid_kappa(sf_dir: str) -> pa.Table:
    """Cohen's kappa of the langid model vs the fixture label —
    chance-corrected agreement over the confusion matrix:
    κ = (N·Σdiag − Σ_l row_l·col_l) / (N² − Σ_l row_l·col_l), one float
    division of two exact integers, micro half-up.  The corpus pass is
    ``langid_confusion``; the finish is |langs|-bounded."""
    conf = collect_rows(langid_confusion(sf_dir))
    n = sum(int(r["n_docs"]) for r in conf)
    diag = sum(int(r["n_docs"]) for r in conf
               if r["lang"] == r["lang_pred"])
    row: dict[str, int] = {}
    col: dict[str, int] = {}
    for r in conf:
        row[r["lang"]] = row.get(r["lang"], 0) + int(r["n_docs"])
        col[r["lang_pred"]] = col.get(r["lang_pred"], 0) \
            + int(r["n_docs"])
    pe_num = sum(row.get(lab, 0) * col.get(lab, 0)
                 for lab in set(row) | set(col))
    num = n * diag - pe_num
    den = n * n - pe_num
    kappa = (None if den == 0 else
             int(np.floor(float(num) / float(den) * 1e6 + 0.5)))
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "n_agree": pa.array([diag], pa.int64()),
        "kappa_micro": pa.array([kappa], pa.int64())})


def dup_score_lift(sf_dir: str, n_tiles: int = 10,
                   bin_score: int = 100_000,
                   num_buckets: int = 8) -> pa.Table:
    """Decile lift table of the quality score against near-dup
    membership — the model-evaluation view next to ``dup_quality_auc``
    (AUC says "can it rank", lift says "how much better per decile").

    Deciles are exact NTILE over (score, doc_id) on the two-pass rank
    machinery; the drop list broadcasts; the fold is 10 rows;
    lift_micro = n_dup_d·N·10⁶ // (n_d·N_dup) is exact-int."""
    from ..stages.dedup import near_dup_drop_list
    from ..stages.textstats import quality_batch, read_documents
    from .analytics import exact_partitioned_ranks, ntile_emit

    drops = {r["doc_id"] for r in collect_rows(
        near_dup_drop_list(read_documents(sf_dir)))}
    d_ref = ray.put(drops)
    docs = read_documents(sf_dir, columns=["doc_id", "text"])

    def base(t: pa.Table) -> pd.DataFrame:
        q = quality_batch(t)
        dd = ray.get(d_ref)
        return pd.DataFrame({
            "pk": pd.Series(["all"] * t.num_rows, dtype="string"),
            "s": np.floor(np.asarray(q["alpha_ratio"],
                                     dtype=np.float64) * 1e6
                          + 0.5).astype(np.int64),
            "doc_id": q["doc_id"].to_pandas().astype("int64"),
            "is_dup": q["doc_id"].to_pandas().isin(dd).astype("int64")})

    pr = docs.map_batches(base, batch_format="pyarrow")
    part_schema = pa.schema([("decile", pa.int64()),
                             ("n_docs", pa.int64()),
                             ("n_dup", pa.int64())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        ranks = start + np.arange(len(g), dtype=np.int64)
        dec = ntile_emit(n_tiles, ranks, n).astype("int64")
        out = pd.DataFrame({"decile": dec, "is_dup": g["is_dup"]
                            .to_numpy()}) \
            .groupby("decile", as_index=False).agg(
                n_docs=("is_dup", "size"), n_dup=("is_dup", "sum"))
        return out.astype({"n_docs": "int64", "n_dup": "int64"})

    folded = collect_rows(bucketed_sum(
        exact_partitioned_ranks(pr, "pk", "s", "doc_id", bin_score,
                                emit, part_schema,
                                num_buckets=num_buckets),
        ["decile"], ["n_docs", "n_dup"], num_buckets=2))
    folded.sort(key=lambda r: int(r["decile"]))
    n_tot = sum(int(r["n_docs"]) for r in folded)
    n_dup = sum(int(r["n_dup"]) for r in folded)
    return pa.table({
        "decile": pa.array([int(r["decile"]) for r in folded],
                           pa.int64()),
        "n_docs": pa.array([int(r["n_docs"]) for r in folded],
                           pa.int64()),
        "n_dup": pa.array([int(r["n_dup"]) for r in folded], pa.int64()),
        "lift_micro": pa.array(
            [int(r["n_dup"]) * n_tot * 1_000_000
             // (int(r["n_docs"]) * n_dup) if n_dup else None
             for r in folded], pa.int64())})


def qty_line_kendall(sf_dir: str, num_buckets: int = 4) -> pa.Table:
    """Kendall τ-b between lineitem quantity and line number — the
    ordinal-vs-ordinal dependence test (both domains are tiny, so the
    cell table is driver-small by construction and the O(cells²)
    concordance scan is exact integer work).

    τ-b = (C − D) / √((n₀−n₁)(n₀−n₂)) with C/D from cell-pair products
    and tie corrections from the marginals — all Python ints; one float
    chain at 6 dp (identical HUGEINT→DOUBLE mirror)."""
    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_quantity", "l_linenumber"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "x": np.floor(df["l_quantity"].to_numpy(np.float64)
                          + 0.5).astype(np.int64),
            "y": df["l_linenumber"].astype("int64")}) \
            .groupby(["x", "y"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return g.astype({"c": "int64"})

    cells = [(int(r["x"]), int(r["y"]), int(r["c"]))
             for r in collect_rows(bucketed_sum(
                 li.map_batches(part, batch_format="pandas"),
                 ["x", "y"], ["c"], num_buckets=num_buckets))]
    n = sum(c for _, _, c in cells)
    conc = disc = 0
    for i, (x1, y1, c1) in enumerate(cells):
        for x2, y2, c2 in cells[i + 1:]:
            if x1 == x2 or y1 == y2:
                continue
            if (x1 < x2) == (y1 < y2):
                conc += c1 * c2
            else:
                disc += c1 * c2
    tx: dict[int, int] = {}
    ty: dict[int, int] = {}
    for x, y, c in cells:
        tx[x] = tx.get(x, 0) + c
        ty[y] = ty.get(y, 0) + c
    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in tx.values())
    n2 = sum(t * (t - 1) // 2 for t in ty.values())
    den = float(n0 - n1) * float(n0 - n2)
    tau = (None if den == 0.0 else
           int(np.floor(float(conc - disc) / np.sqrt(den) * 1e6 + 0.5)))
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "concordant": pa.array([conc], pa.int64()),
        "discordant": pa.array([disc], pa.int64()),
        "tau_b_micro": pa.array([tau], pa.int64())})


def status_trimmed_mean(sf_dir: str, trim_pct: int = 10,
                        bin_cents: int = 100_000,
                        num_buckets: int = 8) -> pa.Table:
    """10%-trimmed mean of order value per status — the robust-location
    sibling of the Tukey-fence outlier panel (cuts ⌊n·pct/100⌋ rows off
    EACH tail by exact global rank, so one fat-finger order can't move
    the mean).

    Rides the two-pass rank machinery (per-status ranks, nothing
    co-located); kept-row sums fold as decimal strings;
    mean_micro_cents = sum·10⁶ // n_kept exact-int.  Equal values at
    the trim boundary are interchangeable, so the (value, id) tie order
    never changes the sum."""
    from .analytics import _cents, exact_partitioned_ranks

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderstatus": df["o_orderstatus"],
            "cents": _cents(df["o_totalprice"].to_numpy()),
            "o_orderkey": df["o_orderkey"].astype("int64")})

    pr = orders.map_batches(base, batch_format="pandas")
    part_schema = pa.schema([("o_orderstatus", pa.string()),
                             ("n_kept", pa.int64()),
                             ("sum_kept", pa.string())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        k = n * trim_pct // 100
        ranks = start + np.arange(len(g), dtype=np.int64)
        keep = (ranks >= k) & (ranks < n - k)
        kept = g["cents"].to_numpy()[keep]
        return pd.DataFrame({
            "o_orderstatus": pd.Series([g["o_orderstatus"].iloc[0]],
                                       dtype="string"),
            "n_kept": pd.Series([int(keep.sum())], dtype="int64"),
            "sum_kept": pd.Series([str(_chunk_int_sum(kept))],
                                  dtype="string")})

    parts = collect_rows(exact_partitioned_ranks(
        pr, "o_orderstatus", "cents", "o_orderkey", bin_cents, emit,
        part_schema, num_buckets=num_buckets))
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["o_orderstatus"], [0, 0])
        a[0] += int(r["n_kept"])
        a[1] += int(r["sum_kept"])
    sts = sorted(agg)
    return pa.table({
        "o_orderstatus": pa.array(sts, pa.string()),
        "n_kept": pa.array([agg[s][0] for s in sts], pa.int64()),
        "trimmed_mean_micro_cents": pa.array(
            [agg[s][1] * 1_000_000 // agg[s][0] if agg[s][0] else None
             for s in sts], pa.int64())})


def _jl_signs(dim: int, out_dim: int) -> np.ndarray:
    """Deterministic ±1 JL sign matrix: sign(d, j) = 1 − 2·parity of the
    64-bit md5 hash of "d:j" (first 8 digest bytes little-endian — the
    repo's md5_number_upper contract, so the matrix is reproducible in
    SQL)."""
    import hashlib
    s = np.empty((dim, out_dim), dtype=np.int64)
    for d in range(dim):
        for j in range(out_dim):
            h = int.from_bytes(
                hashlib.md5(f"{d}:{j}".encode()).digest()[:8], "little")
            s[d, j] = 1 - 2 * (h % 2)
    return s


def embedding_jl_projection(sf_dir: str, out_dim: int = 8) -> rd.Dataset:
    """Johnson–Lindenstrauss sign projection of the embedding table to
    ``out_dim`` dims — the deterministic dimension-reduction front end
    for ANN at scale (Achlioptas 2003 ±1 variant).

    Exact: components quantise to micro ints, the projection is an
    integer matmul against the md5-derived ±1 matrix (built once per
    process, broadcast-free), output is long-format (vec_id, j,
    proj_micro) — stateless, shuffle-free, and byte-identical to the
    DuckDB mirror's md5_number_upper parity signs."""
    from ..stages.knn import read_embeddings

    emb = read_embeddings(sf_dir)

    def project(t: pa.Table) -> pa.Table:
        X = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        S = _jl_signs(X.shape[1] if len(X) else 64, out_dim)
        Xm = np.floor(X * 1e6 + 0.5).astype(np.int64)
        P = Xm @ S                                  # (B, out_dim) exact
        n = len(Xm)
        vid = np.repeat(t["vec_id"].to_numpy(zero_copy_only=False), out_dim)
        return pa.table({
            "vec_id": pa.array(vid, pa.int64()),
            "j": pa.array(np.tile(np.arange(out_dim, dtype=np.int64), n),
                          pa.int64()),
            "proj_micro": pa.array(P.reshape(-1), pa.int64())})

    return emb.map_batches(project, batch_format="pyarrow")


def status_priority_cramers_v(sf_dir: str) -> pa.Table:
    """Cramér's V effect size for the status × priority chi-square
    panel — the "is the dependence big or just significant" readout:
    V = sqrt(chi2 / (N · (min(r, c) − 1))), in [0, 1].

    Rides status_priority_chisq's exact integer chi2_micro; the only
    float work is the shared chain chi2_micro/1e6 ÷ (N·k) → sqrt →
    half-up micro quantisation, identical in DuckDB.

    Scale: same as the chi-square — category²-bounded fold, driver
    math on k² cells."""
    t = status_priority_chisq(sf_dir)
    n = int(t["n"][0].as_py())
    r = int(t["r_levels"][0].as_py())
    c = int(t["c_levels"][0].as_py())
    chi2_micro = int(t["chi2_micro"][0].as_py())
    k = min(r, c) - 1
    v_micro = int(np.floor(
        np.sqrt((chi2_micro / 1e6) / float(n * k)) * 1e6 + 0.5))
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "k_min": pa.array([k], pa.int64()),
        "chi2_micro": pa.array([chi2_micro], pa.int64()),
        "v_micro": pa.array([v_micro], pa.int64())})


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (DuckDB // semantics)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def source_js_divergence(sf_dir: str, num_buckets: int = 16) -> pa.Table:
    """Jensen-Shannon divergence between every unordered pair of
    source-feed unigram profiles — the SYMMETRIC drift matrix next to
    the one-vs-corpus KL panel (bounded by ln 2, defined even where
    one feed lacks a token).

    Integer contract (KL-family convention): per (pair, token, side)
    the contribution c_a·ln(2·c_a·N_b / (c_a·N_b + c_b·N_a)) is
    quantised to micro-nats half-up BEFORE the sum (the ln argument is
    the shared float expression CAST(int)·int / (CAST(int)·int +
    CAST(int)·int)); the two side sums are exact int64, and
    js_micro = tdiv(S_a, 2·N_a) + tdiv(S_b, 2·N_b) with
    truncate-toward-zero division (DuckDB // semantics).

    Scale: one (source, token) bucketed shuffle (vocab-bounded rows);
    the pair expansion runs inside token buckets and ships
    |sources|²-bounded partial rows; per-source totals broadcast."""
    from ..stages.groups import bucketed_group_apply
    from ..util import collect_rows
    from .analytics import bucketed_sum

    src = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["source", "text"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split()
        rows = {"source": [], "token": []}
        for s, ts in zip(df["source"], toks):
            rows["source"].extend([s] * len(ts))
            rows["token"].extend(ts)
        g = pd.DataFrame(rows)
        out = g.groupby(["source", "token"], as_index=False).size() \
            .rename(columns={"size": "c"})
        return out.astype({"c": "int64"})

    st = bucketed_sum(src.map_batches(part, batch_format="pandas"),
                      ["source", "token"], ["c"],
                      num_buckets=num_buckets)

    totals = collect_rows(bucketed_sum(
        st.map_batches(
            lambda df: df.groupby("source", as_index=False)
            .agg(ns=("c", "sum")).astype({"ns": "int64"}),
            batch_format="pandas"),
        ["source"], ["ns"], num_buckets=2))
    ns_of = {r["source"]: int(r["ns"]) for r in totals}
    ref = ray.put(ns_of)

    def js_part(df: pd.DataFrame) -> pd.DataFrame:
        ns = ray.get(ref)
        srcs = sorted(ns)
        piv = df.pivot_table(index="token", columns="source",
                             values="c", fill_value=0, aggfunc="sum")
        for s in srcs:
            if s not in piv.columns:
                piv[s] = 0
        out = {"src_a": [], "src_b": [], "sa": [], "sb": []}
        for i, a in enumerate(srcs):
            ca_all = piv[a].to_numpy().astype(np.int64)
            na = ns[a]
            for b in srcs[i + 1:]:
                cb_all = piv[b].to_numpy().astype(np.int64)
                nb = ns[b]
                keep = (ca_all > 0) | (cb_all > 0)
                ca, cb = ca_all[keep], cb_all[keep]
                caf, cbf = ca.astype(np.float64), cb.astype(np.float64)
                den = caf * nb + cbf * na
                ma = ca > 0
                ta = int(np.floor(
                    ca[ma] * np.log((2 * caf[ma] * nb) / den[ma])
                    * 1e6 + 0.5).astype(np.int64).sum())
                mb = cb > 0
                tb = int(np.floor(
                    cb[mb] * np.log((2 * cbf[mb] * na) / den[mb])
                    * 1e6 + 0.5).astype(np.int64).sum())
                out["src_a"].append(a); out["src_b"].append(b)
                out["sa"].append(ta); out["sb"].append(tb)
        return pd.DataFrame(out).astype({"sa": "int64", "sb": "int64"})

    out_schema = pa.schema([("src_a", pa.string()),
                            ("src_b", pa.string()),
                            ("sa", pa.int64()), ("sb", pa.int64())])
    sums = collect_rows(bucketed_sum(
        bucketed_group_apply(st, ["token"], js_part,
                             num_buckets=num_buckets,
                             out_schema=out_schema),
        ["src_a", "src_b"], ["sa", "sb"], num_buckets=2))
    sums.sort(key=lambda r: (r["src_a"], r["src_b"]))
    return pa.table({
        "src_a": pa.array([r["src_a"] for r in sums], pa.string()),
        "src_b": pa.array([r["src_b"] for r in sums], pa.string()),
        "sum_a_micro": pa.array([int(r["sa"]) for r in sums],
                                pa.int64()),
        "sum_b_micro": pa.array([int(r["sb"]) for r in sums],
                                pa.int64()),
        "js_micro": pa.array(
            [_tdiv(int(r["sa"]), 2 * ns_of[r["src_a"]])
             + _tdiv(int(r["sb"]), 2 * ns_of[r["src_b"]])
             for r in sums], pa.int64())})


def ann_rbo(sf_dir: str) -> pa.Table:
    """Rank-biased overlap (Webber et al. 2010, truncated prefix form,
    p = 0.9) of the approximate ANN hit lists (IVF, LSH) against the
    exact brute-force ranking — the top-weighted list-similarity audit
    beside set-overlap recall and position-weighted nDCG.

    Exact-rational contract: RBO@k = Σ_{d=1..k} (o_d/d)·(1−p)·p^{d−1}
    with o_d the depth-d prefix intersection size; every term is lifted
    to the common denominator 2520·10^k, so the numerator
    t_num = Σ o_d · 9^{d−1} · (2520/d) · 10^{k−d} is an EXACT int64 sum
    and rbo_micro = t_num·10⁶ // (2520·10^k) needs one HUGEINT product
    — no float anywhere.  Both prefix orders are (rounded score DESC,
    vec_id), the same deterministic order the hash-green hit lists
    pin.

    Scale: rides the existing bounded query set — the exact side is
    the distributed scorer, the approximate side the seeded artifact;
    driver math is queries × k."""
    import pyarrow.parquet as pq

    from ..artifacts import ANN_K, ann_queries, ensure
    from ..stages.knn import knn_topk, read_embeddings
    from ..util import collect_table

    paths = ensure(sf_dir)
    q = ann_queries(sf_dir)
    et = collect_table(
        knn_topk(read_embeddings(sf_dir), q, k=ANN_K)).to_pandas()
    et = et.sort_values(["query_id", "score", "vec_id"],
                        ascending=[True, False, True], kind="mergesort")
    et["pos"] = et.groupby("query_id").cumcount() + 1
    bpos = {(int(r.query_id), int(r.vec_id)): int(r.pos)
            for r in et.itertuples()}
    qids = sorted(et["query_id"].unique().tolist())
    w = [9 ** (d - 1) * (2520 // d) * 10 ** (ANN_K - d)
         for d in range(1, ANN_K + 1)]
    den = 2520 * 10 ** ANN_K
    rows = []
    for method in ("ivf", "lsh"):
        t = pq.read_table(paths[f"{method}_topk"]).to_pandas()
        t = t.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        t["pos"] = t.groupby("query_id").cumcount() + 1
        by_q = dict(tuple(t.groupby("query_id")))
        for qid in qids:
            g = by_q.get(qid)
            mx = []
            if g is not None:
                for p, v in zip(g["pos"], g["vec_id"]):
                    b = bpos.get((int(qid), int(v)))
                    if b is not None:
                        mx.append(max(int(p), b))
            t_num = sum(
                sum(1 for m in mx if m <= d) * w[d - 1]
                for d in range(1, ANN_K + 1))
            rows.append((method, int(qid), t_num,
                         t_num * 1_000_000 // den))
    return pa.table({
        "method": pa.array([r[0] for r in rows], pa.string()),
        "query_id": pa.array([r[1] for r in rows], pa.int64()),
        "t_num": pa.array([r[2] for r in rows], pa.int64()),
        "rbo_micro": pa.array([r[3] for r in rows], pa.int64())})


def event_transition_entropy(sf_dir: str) -> pa.Table:
    """Empirical entropy rate of the event-type Markov chain —
    H = −Σ_ij (c_ij/N)·ln(c_ij/r_i) in micro-nats: how predictable the
    next event is given the current one (0 = deterministic funnel,
    ln k = memoryless uniform).  The behavioural-complexity scalar
    next to the stationary-distribution panel.

    Integer contract (KL-family): per cell the term
    c_ij·ln(c_ij/r_i) quantises half-up to micro-nats (the ln argument
    is ONE CAST(int)/int float division); the sum is exact, negated,
    and the rate is a truncating division by N (DuckDB // semantics).

    Scale: transition counts ride the existing bucketed fold
    (|types|² rows); the entropy finish is k² driver math."""
    from ..util import collect_rows as _cr
    from .queries import q_event_type_transitions

    rows = _cr(q_event_type_transitions(sf_dir))
    c: dict[tuple[str, str], int] = {}
    rt: dict[str, int] = {}
    for r in rows:
        i, j, n = r["prev_type"], r["event_type"], int(r["n"])
        c[(i, j)] = c.get((i, j), 0) + n
        rt[i] = rt.get(i, 0) + n
    n_tot = sum(c.values())
    s = 0
    for (i, _j), cij in sorted(c.items()):
        s += int(np.floor(cij * np.log(float(cij) / rt[i])
                          * 1e6 + 0.5))
    h_sum = -s
    return pa.table({
        "n_transitions": pa.array([n_tot], pa.int64()),
        "h_sum_micro": pa.array([h_sum], pa.int64()),
        "entropy_rate_micro": pa.array([_tdiv(h_sum, n_tot)],
                                       pa.int64())})


def doc_length_lognormal(sf_dir: str) -> pa.Table:
    """Log-normal method-of-moments fit of the document length
    distribution — web-corpus lengths are classically log-normal
    (Mitzenmacher 2004), and (μ, σ) of ln(n_chars) is the two-number
    summary a sampler or curriculum scheduler reads.

    Integer contract: per doc l = floor(ln(n_chars)·1e6 + 0.5)
    micro-nats; n, Σl, Σl² are exact (int64 per-block partials,
    Python-int fold — Σl² passes int64 at corpus scale); μ = Σl // n
    (values positive) and σ = floor(sqrt(n·Σl² − (Σl)²)/n + 0.5) is
    the ONE float chain, identical HUGEINT→DOUBLE in the mirror.

    Scale: one stateless pruned scan; partials are a row per block."""
    from ..util import collect_rows

    src = read_parquet_clean(f"{sf_dir}/documents.parquet",
                             columns=["n_chars"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(dtype=np.float64)
        l = np.floor(np.log(x) * 1e6 + 0.5).astype(np.int64)
        return pd.DataFrame({"n": [np.int64(len(l))],
                             "s": [np.int64(l.sum())],
                             "s2": [np.int64((l * l).sum())]})

    n = s = s2 = 0
    for r in collect_rows(src.map_batches(part,
                                          batch_format="pandas")):
        n += int(r["n"]); s += int(r["s"]); s2 += int(r["s2"])
    x = n * s2 - s * s
    sigma = int(np.floor(np.sqrt(float(x)) / n + 0.5))
    return pa.table({
        "n_docs": pa.array([n], pa.int64()),
        "mu_micro": pa.array([s // n], pa.int64()),
        "sigma_micro": pa.array([sigma], pa.int64())})


def click_purchase_xcorr(sf_dir: str, max_lag: int = 3) -> pa.Table:
    """Lagged cross-correlation between the corpus-wide daily click and
    purchase series — "do purchases follow clicks, and with what
    delay": Pearson r of (clicks_t, purchases_{t+ℓ}) for ℓ in
    [−max_lag, max_lag] over the zero-filled day span.

    Integer moments per lag (n, Σx, Σy, Σxy, Σx², Σy² over the
    overlap), ONE shared float chain (n·Σxy − ΣxΣy) / sqrt(...) at
    6 dp; NULL on zero variance.

    Scale: per-batch (day, type) partials fold on the span-bounded day
    key; the lag pass is a single-group fold over the D-row series."""
    from ..stages.groups import bucketed_group_apply
    from .analytics import bucketed_sum

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["click", "purchase"])]
        day = df["ts"].astype("datetime64[us]").dt.floor("D")
        out = pd.DataFrame({"day": day,
                            "event_type": df["event_type"]}) \
            .groupby(["day", "event_type"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return out.astype({"n": "int64"})

    dc = bucketed_sum(ev.map_batches(part, batch_format="pandas"),
                      ["day", "event_type"], ["n"], num_buckets=4)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["day", "event_type"], as_index=False)["n"] \
            .sum()
        days = pd.date_range(df["day"].min(), df["day"].max(),
                             freq="D", unit="us")
        piv = df.pivot_table(index="day", columns="event_type",
                             values="n", fill_value=0, aggfunc="sum") \
            .reindex(days, fill_value=0)
        a = (piv["click"] if "click" in piv.columns
             else pd.Series(0, index=days)).to_numpy(dtype=np.int64)
        b = (piv["purchase"] if "purchase" in piv.columns
             else pd.Series(0, index=days)).to_numpy(dtype=np.int64)
        rows = {"lag": [], "n_overlap": [], "r_micro": []}
        for lag in range(-max_lag, max_lag + 1):
            if lag >= 0:
                x, y = a[:len(a) - lag or None], b[lag:]
            else:
                x, y = a[-lag:], b[:len(b) + lag]
            m = len(x)
            sx, sy = int(x.sum()), int(y.sum())
            sxx = int((x * x).sum()); syy = int((y * y).sum())
            sxy = int((x * y).sum())
            vx = m * sxx - sx * sx
            vy = m * syy - sy * sy
            if m < 2 or vx == 0 or vy == 0:
                r = None
            else:
                r = int(np.floor(
                    float(m * sxy - sx * sy)
                    / np.sqrt(float(vx) * float(vy)) * 1e6 + 0.5))
            rows["lag"].append(lag); rows["n_overlap"].append(m)
            rows["r_micro"].append(r)
        return pd.DataFrame({
            "lag": pd.Series(rows["lag"], dtype="int64"),
            "n_overlap": pd.Series(rows["n_overlap"], dtype="int64"),
            "r_micro": pd.Series(rows["r_micro"], dtype="Int64")})

    out_schema = pa.schema([("lag", pa.int64()),
                            ("n_overlap", pa.int64()),
                            ("r_micro", pa.int64())])
    return bucketed_group_apply(
        dc.map_batches(lambda df: df.assign(
            g=np.zeros(len(df), dtype=np.int64)),
            batch_format="pandas"),
        ["g"], lambda df: fold(df.drop(columns=["g"])),
        num_buckets=1, out_schema=out_schema)


def daily_revenue_theilsen(sf_dir: str) -> pa.Table:
    """Theil–Sen robust trend of daily order revenue — the median of
    all pairwise slopes (cents/day), immune to the outlier days an OLS
    slope chases.  Slopes are the shared float expression
    CAST(Δcents AS DOUBLE)/Δdays; the median of an identical float
    multiset interpolates identically in numpy and DuckDB, then
    quantises half-up to micro.

    Scale: per-batch (day, cents) partials fold on the span-bounded
    day key; the D² pairwise pass is driver math over the day table."""
    from ..util import collect_rows
    from .analytics import bucketed_sum

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        day = df["o_orderdate"].astype("datetime64[us]").dt.floor("D")
        cents = np.floor(df["o_totalprice"].to_numpy() * 100
                         + 0.5).astype(np.int64)
        out = pd.DataFrame({"day": day, "rev": cents}) \
            .groupby("day", as_index=False)["rev"].sum()
        return out.astype({"rev": "int64"})

    rows = collect_rows(bucketed_sum(
        src.map_batches(part, batch_format="pandas"),
        ["day"], ["rev"], num_buckets=4))
    acc: dict = {}
    for r in rows:
        acc[r["day"]] = acc.get(r["day"], 0) + int(r["rev"])
    days = sorted(acc)
    d = np.array([pd.Timestamp(x).value // 86_400_000_000_000
                  for x in days], dtype=np.int64)
    y = np.array([acc[x] for x in days], dtype=np.int64)
    i, j = np.triu_indices(len(d), k=1)
    slopes = (y[j] - y[i]).astype(np.float64) / (d[j] - d[i])
    med = float(np.median(slopes))
    return pa.table({
        "n_days": pa.array([len(d)], pa.int64()),
        "n_pairs": pa.array([len(slopes)], pa.int64()),
        "slope_micro": pa.array(
            [int(np.floor(med * 1e6 + 0.5))], pa.int64())})


def user_survival_km(sf_dir: str, churn_days: int = 7,
                     num_buckets: int = 8) -> pa.Table:
    """Kaplan-Meier survival curve over user lifetimes — per distinct
    event time t (days from a user's first to last activity): the risk
    set n_t, churn events d_t, censored exits c_t, and the cumulative
    log-survival Σ ln(1 − d/n) — retention analysis with correct
    censoring (users still active within ``churn_days`` of the corpus
    end are censored, not churned).

    Integer contract: the curve stays in LOG space — per time
    term_nano = floor(ln((n−d)/n)·1e9 + 0.5) (one CAST(int)/int float
    ln), the cumulative sum is exact int64, and no exp is taken (libm
    exp is not contract-safe across engines); d = n (risk set dies)
    yields NULL from that time on.

    Scale: per-user first/last-day folds on the user key; lifetimes
    aggregate on the span-bounded day key; the prefix pass is
    driver-small (≤ span rows)."""
    from ..util import collect_rows
    from .analytics import bucketed_sum

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["ts"].astype("datetime64[us]").astype("int64")
             // 86_400_000_000)
        g = pd.DataFrame({"user_id": df["user_id"], "d": d}) \
            .groupby("user_id", as_index=False) \
            .agg(d0=("d", "min"), d1=("d", "max"))
        return g.astype({"d0": "int64", "d1": "int64"})

    # bucketed min/max fold on the user key
    from ..stages.groups import bucketed_group_apply

    def fold_user(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False) \
            .agg(d0=("d0", "min"), d1=("d1", "max"))
        return g.astype({"d0": "int64", "d1": "int64"})

    user_schema = pa.schema([("user_id", pa.int64()),
                             ("d0", pa.int64()), ("d1", pa.int64())])
    spans = bucketed_group_apply(
        ev.map_batches(part, batch_format="pandas"),
        ["user_id"], fold_user, num_buckets=num_buckets,
        out_schema=user_schema)

    # corpus max day: tiny fold
    dmax = max(int(r["m"]) for r in collect_rows(spans.map_batches(
        lambda df: pd.DataFrame({"m": [np.int64(df["d1"].max())]}),
        batch_format="pandas")))

    def life_part(df: pd.DataFrame) -> pd.DataFrame:
        t = (df["d1"] - df["d0"]).astype("int64")
        ev_flag = ((dmax - df["d1"]) > churn_days).astype("int64")
        g = pd.DataFrame({"t": t, "d": ev_flag, "c": 1 - ev_flag}) \
            .groupby("t", as_index=False).sum()
        return g.astype({"d": "int64", "c": "int64"})

    rows = collect_rows(bucketed_sum(
        spans.map_batches(life_part, batch_format="pandas"),
        ["t"], ["d", "c"], num_buckets=4))
    acc: dict[int, list[int]] = {}
    for r in rows:
        a = acc.setdefault(int(r["t"]), [0, 0])
        a[0] += int(r["d"]); a[1] += int(r["c"])
    times = sorted(acc)
    total = sum(d + c for d, c in acc.values())
    out = {"t": [], "n_risk": [], "n_events": [], "n_censored": [],
           "log_s_nano": []}
    at_risk, cum, dead = total, 0, False
    for t in times:
        d, c = acc[t]
        out["t"].append(t); out["n_risk"].append(at_risk)
        out["n_events"].append(d); out["n_censored"].append(c)
        if dead or d >= at_risk:
            cum_v = None
            dead = dead or d >= at_risk
        else:
            if d > 0:
                cum += int(np.floor(np.log(
                    float(at_risk - d) / at_risk) * 1e9 + 0.5))
            cum_v = cum
        out["log_s_nano"].append(cum_v)
        at_risk -= d + c
    return pa.table({
        "t": pa.array(out["t"], pa.int64()),
        "n_risk": pa.array(out["n_risk"], pa.int64()),
        "n_events": pa.array(out["n_events"], pa.int64()),
        "n_censored": pa.array(out["n_censored"], pa.int64()),
        "log_s_nano": pa.array(out["log_s_nano"], pa.int64())})


def order_price_psi(sf_dir: str, n_bins: int = 10) -> pa.Table:
    """Population Stability Index panel for order-price drift between
    the EARLY and LATE halves of the order timeline (midpoint-day
    split) — the model-monitoring standard for "did the input
    distribution move" (PSI < 0.1 stable, > 0.25 shifted).

    Bins are ``n_bins`` equal-width cents intervals over the global
    [min, max] — value-based and exactly mirrorable, unlike NTILE
    binning whose tie-splitting is row-order-dependent:
    bin = 1 + ((x − mn)·B) // (mx − mn + 1).  Per bin the PSI term
    (a/Na − b/Nb)·ln((a·Nb)/(b·Na)) quantises via ONE float chain
    (exact integer cross products inside), NULL when either side is
    empty.

    Scale: one min/max fold + one (half, bin) count fold — B×2 rows;
    the finish is B-row driver math."""
    from ..util import collect_rows
    from .analytics import bucketed_sum

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["o_orderdate"].astype("datetime64[us]")
               .astype("int64") // 86_400_000_000)
        cents = np.floor(df["o_totalprice"].to_numpy() * 100
                         + 0.5).astype(np.int64)
        return pd.DataFrame({"day": day, "cents": cents})

    pr = src.map_batches(pre, batch_format="pandas")

    bounds = collect_rows(pr.map_batches(
        lambda df: pd.DataFrame({
            "d0": [int(df["day"].min())], "d1": [int(df["day"].max())],
            "c0": [int(df["cents"].min())],
            "c1": [int(df["cents"].max())]}),
        batch_format="pandas"))
    d0 = min(b["d0"] for b in bounds); d1 = max(b["d1"] for b in bounds)
    mn = min(b["c0"] for b in bounds); mx = max(b["c1"] for b in bounds)
    mid = (d0 + d1) // 2
    width = mx - mn + 1

    def bin_part(df: pd.DataFrame) -> pd.DataFrame:
        half = np.where(df["day"].to_numpy() <= mid, "early", "late")
        b = 1 + ((df["cents"].to_numpy() - mn) * n_bins) // width
        out = pd.DataFrame({"half": half, "bin": b.astype("int64")}) \
            .groupby(["half", "bin"], as_index=False).size() \
            .rename(columns={"size": "n"})
        return out.astype({"n": "int64"})

    rows = collect_rows(bucketed_sum(
        pr.map_batches(bin_part, batch_format="pandas"),
        ["half", "bin"], ["n"], num_buckets=2))
    cnt = {("early", b): 0 for b in range(1, n_bins + 1)}
    cnt.update({("late", b): 0 for b in range(1, n_bins + 1)})
    for r in rows:
        cnt[(r["half"], int(r["bin"]))] += int(r["n"])
    na = sum(v for (h, _b), v in cnt.items() if h == "early")
    nb = sum(v for (h, _b), v in cnt.items() if h == "late")
    out = {"bin": [], "n_early": [], "n_late": [], "psi_term_micro": []}
    for b in range(1, n_bins + 1):
        a, c = cnt[("early", b)], cnt[("late", b)]
        if a == 0 or c == 0:
            t = None
        else:
            t = int(np.floor(
                float(a * nb - c * na) / (float(na) * nb)
                * np.log((float(a) * nb) / (float(c) * na))
                * 1e6 + 0.5))
        out["bin"].append(b); out["n_early"].append(a)
        out["n_late"].append(c); out["psi_term_micro"].append(t)
    return pa.table({
        "bin": pa.array(out["bin"], pa.int64()),
        "n_early": pa.array(out["n_early"], pa.int64()),
        "n_late": pa.array(out["n_late"], pa.int64()),
        "psi_term_micro": pa.array(out["psi_term_micro"], pa.int64())})


# ---------------------------------------------------------------------------
# corpus lexical-statistics panel (Yule 1944 / Simpson 1949 / Herdan TTR)
# ---------------------------------------------------------------------------

def corpus_lexical_panel(sf_dir: str) -> pa.Table:
    """One-row vocabulary-richness panel over the document corpus's
    whitespace tokens: token/type mass, hapax & dis legomena, type-token
    ratio, Yule's characteristic K (Yule 1944) and Simpson's repeat rate
    D (Simpson 1949) — the repetitiveness / lexical-diversity gates a
    corpus-quality dashboard reads before mixing a new source in.

    Exact integers end-to-end: global token counts fold once on the
    token key (the same partial + bucketed_sum shape as unigram
    counting); each reduced block then contributes a SIX-int partial
    (n, v, v1, v2, s2, ss) and the driver sums python bignums, so
    nothing overflows.  Every reported ratio is one truncating integer
    division lifted to micro units; Yule's K keeps its conventional 1e4
    scale, k_micro = (S2 - N) * 10^10 // N^2 with S2 = sum c^2, and
    Simpson's D = sum c(c-1) // N(N-1).

    Scale: the only shuffle is the token-keyed count fold; the finish
    moves six ints per reduced block to the driver."""
    from ..stages.lm import doc_term_counts

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"])
    cnts = bucketed_sum(
        docs.map_batches(doc_term_counts, batch_format="pyarrow")
        .select_columns(["token", "tf"]),
        ["token"], ["tf"], num_buckets=16)

    def blockstats(df: pd.DataFrame) -> pd.DataFrame:
        c = df["tf"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "n": [int(c.sum())], "v": [len(c)],
            "v1": [int((c == 1).sum())], "v2": [int((c == 2).sum())],
            "s2": [int((c.astype(object) * c).sum())],
            "ss": [int((c.astype(object) * (c - 1)).sum())]}) \
            .astype("int64")

    rows = collect_rows(cnts.map_batches(blockstats,
                                         batch_format="pandas"))
    n = sum(int(r["n"]) for r in rows)
    v = sum(int(r["v"]) for r in rows)
    v1 = sum(int(r["v1"]) for r in rows)
    v2 = sum(int(r["v2"]) for r in rows)
    s2 = sum(int(r["s2"]) for r in rows)
    ss = sum(int(r["ss"]) for r in rows)
    return pa.table({
        "n_tokens": pa.array([n], pa.int64()),
        "n_types": pa.array([v], pa.int64()),
        "hapax": pa.array([v1], pa.int64()),
        "dis_legomena": pa.array([v2], pa.int64()),
        "ttr_micro": pa.array(
            [v * 1_000_000 // n if n else None], pa.int64()),
        "hapax_micro": pa.array(
            [v1 * 1_000_000 // v if v else None], pa.int64()),
        "yule_k_micro": pa.array(
            [(s2 - n) * 10_000_000_000 // (n * n) if n else None],
            pa.int64()),
        "simpson_micro": pa.array(
            [ss * 1_000_000 // (n * (n - 1)) if n > 1 else None],
            pa.int64())})


# ---------------------------------------------------------------------------
# grouped skewness / excess kurtosis from exact integer power sums
# ---------------------------------------------------------------------------

def status_price_skewkurt(sf_dir: str) -> pa.Table:
    """Higher-moment shape panel per order status: population skewness
    g1 and excess kurtosis g2 of order value, from EXACT integer power
    sums S1..S4 of hectodollar-quantised prices (h = floor(p / 100.0) —
    coarse enough that S4 and every lifted numerator stays inside
    DuckDB's HUGEINT; the engine folds python bignums so it has no
    ceiling).

    Integer identities (n^k-lifted central moments, no mean subtraction
    anywhere):  A2 = n*S2 - S1^2,  A3 = n^2*S3 - 3n*S1*S2 + 2*S1^3,
    A4 = n^3*S4 - 4n^2*S1*S3 + 6n*S1^2*S2 - 3*S1^4; then
    g1 = A3 / A2^1.5 and g2 = A4 / A2^2 - 3 — ONE shared float chain
    each, micro-rounded; NULL when the group is degenerate (A2 == 0 or
    n < 2).  m2_micro = A2 * 1e6 // n^2 is reported exactly.

    Scale: per-batch partials are one row per (block, status) with
    S3/S4 carried as decimal STRINGS (they pass int64 at corpus scale);
    the finish folds statuses-by-blocks rows on the driver with python
    ints — no raw row ever shuffles."""
    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderstatus", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = np.floor(df["o_totalprice"].to_numpy(np.float64) / 100.0) \
            .astype(np.int64)
        g = pd.DataFrame({"s": df["o_orderstatus"].to_numpy(), "h": h}) \
            .groupby("s", sort=False)["h"]
        rows = []
        for s, hv in g:
            xs = [int(x) for x in hv.to_numpy()]
            rows.append({
                "o_orderstatus": s, "n": len(xs),
                "s1": sum(xs), "s2": sum(x * x for x in xs),
                "s3": str(sum(x ** 3 for x in xs)),
                "s4": str(sum(x ** 4 for x in xs))})
        out = pd.DataFrame(rows)
        return out.astype({"n": "int64", "s1": "int64", "s2": "int64"})

    rows = collect_rows(src.map_batches(part, batch_format="pandas"))
    acc: dict[str, list[int]] = {}
    for r in rows:
        a = acc.setdefault(r["o_orderstatus"], [0, 0, 0, 0, 0])
        a[0] += int(r["n"]); a[1] += int(r["s1"]); a[2] += int(r["s2"])
        a[3] += int(r["s3"]); a[4] += int(r["s4"])
    out = {"o_orderstatus": [], "n": [], "m2_micro": [],
           "skew_micro": [], "kurt_micro": []}
    for s in sorted(acc):
        n, s1, s2, s3, s4 = acc[s]
        a2 = n * s2 - s1 * s1
        a3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
        a4 = (n ** 3 * s4 - 4 * n * n * s1 * s3
              + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4)
        out["o_orderstatus"].append(s)
        out["n"].append(n)
        if n < 2 or a2 == 0:
            out["m2_micro"].append(a2 * 1_000_000 // (n * n)
                                   if n else None)
            out["skew_micro"].append(None)
            out["kurt_micro"].append(None)
            continue
        out["m2_micro"].append(a2 * 1_000_000 // (n * n))
        a2f = float(a2)
        out["skew_micro"].append(int(np.floor(
            float(a3) / (a2f * np.sqrt(a2f)) * 1e6 + 0.5)))
        out["kurt_micro"].append(int(np.floor(
            (float(a4) / (a2f * a2f) - 3.0) * 1e6 + 0.5)))
    return pa.table({
        "o_orderstatus": pa.array(out["o_orderstatus"], pa.string()),
        "n": pa.array(out["n"], pa.int64()),
        "m2_micro": pa.array(out["m2_micro"], pa.int64()),
        "skew_micro": pa.array(out["skew_micro"], pa.int64()),
        "kurt_micro": pa.array(out["kurt_micro"], pa.int64())})


# ---------------------------------------------------------------------------
# multinomial Naive Bayes language classifier + resubstitution eval
# ---------------------------------------------------------------------------

def nb_lang_eval(sf_dir: str) -> pa.Table:
    """Multinomial Naive Bayes (McCallum & Nigam 1998) over document
    whitespace tokens predicting the language label, evaluated by
    resubstitution: per language, document count, correct predictions
    and truncating micro accuracy — the third langid model beside the
    marker heuristic (stages/textstats.langid_batch) and the trained
    trigram profile (stages/profile.py), and the classic
    counts-only-training classifier of the text-pipeline literature.

    Integer contract: Laplace alpha=1 token log-likelihoods
    w(tok,lang) = floor(ln((c+1)/(N_lang+V))*1e6+0.5) and priors
    floor(ln(n_docs_lang/n_docs)*1e6+0.5) are int64 micro-nats (the
    ln argument is ONE double quotient, same op order as the SQL
    mirror); a doc's class score is the exact integer
    prior + sum tf*w, argmax with ties to the lexicographically
    smallest language.  Docs with zero tokens score nowhere and are
    excluded on both sides.

    Scale: training is ONE (token, lang)-keyed count fold — the model
    is vocab x langs bounded (a model, not data; an open vocabulary
    would swap in the hashing trick of doc_feature_hash); scoring
    broadcasts the weight matrix once via ray.put and streams docs
    through a vectorised take/segment-sum, folding (lang, n, correct)
    partials."""
    from ..stages.lm import doc_term_counts

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang"])

    def count_part(t: pa.Table) -> pa.Table:
        tf = doc_term_counts(t).to_pandas()
        lang_of = dict(zip(t["doc_id"].to_pylist(),
                           t["lang"].to_pylist()))
        tf["lang"] = tf["doc_id"].map(lang_of)
        out = tf.groupby(["token", "lang"], as_index=False)["tf"].sum() \
            .rename(columns={"tf": "c"})
        return pa.Table.from_pandas(out.astype({"c": "int64"}),
                                    preserve_index=False)

    cls_rows = collect_rows(bucketed_sum(
        docs.map_batches(count_part, batch_format="pyarrow"),
        ["token", "lang"], ["c"], num_buckets=16))

    langs = sorted({r["lang"] for r in cls_rows})
    vocab = sorted({r["token"] for r in cls_rows})
    tok_idx = {t: i for i, t in enumerate(vocab)}
    lang_idx = {s: j for j, s in enumerate(langs)}
    v = len(vocab)
    n_lang_tok = [0] * len(langs)
    cmat = np.zeros((v, len(langs)), dtype=np.int64)
    for r in cls_rows:
        j = lang_idx[r["lang"]]
        cmat[tok_idx[r["token"]], j] += int(r["c"])
        n_lang_tok[j] += int(r["c"])
    wmat = np.empty_like(cmat)
    for j in range(len(langs)):
        q = (cmat[:, j] + 1).astype(np.float64) \
            / np.float64(n_lang_tok[j] + v)
        wmat[:, j] = np.floor(np.log(q) * 1e6 + 0.5).astype(np.int64)

    prior_rows = collect_rows(partial_count(
        docs.select_columns(["lang"]), ["lang"], out_name="nd"))
    nd_of = {r["lang"]: int(r["nd"]) for r in prior_rows}
    n_docs = sum(nd_of.values())
    priors = np.array(
        [int(np.floor(np.log(np.float64(nd_of[s])
                             / np.float64(n_docs)) * 1e6 + 0.5))
         for s in langs], dtype=np.int64)

    w_ref = ray.put((wmat, priors, tok_idx, langs))

    def score_part(t: pa.Table) -> pd.DataFrame:
        wm, pri, tix, lgs = ray.get(w_ref)
        tf = doc_term_counts(t).to_pandas()
        if not len(tf):
            return pd.DataFrame({"lang": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 "correct": pd.Series([],
                                                      dtype="int64")})
        lang_of = dict(zip(t["doc_id"].to_pylist(),
                           t["lang"].to_pylist()))
        codes = tf["token"].map(tix).to_numpy(dtype=np.int64)
        did, drow = np.unique(tf["doc_id"].to_numpy(),
                              return_inverse=True)
        scores = np.zeros((len(did), len(lgs)), dtype=np.int64)
        np.add.at(scores, drow,
                  tf["tf"].to_numpy(np.int64)[:, None] * wm[codes])
        scores += pri[None, :]
        pred = np.argmax(scores, axis=1)  # first max = smallest lang
        actual = pd.Series(did).map(lang_of).to_numpy()
        ok = np.array([lgs[p] for p in pred]) == actual
        out = pd.DataFrame({"lang": actual, "ok": ok.astype(np.int64)})
        g = out.groupby("lang", as_index=False).agg(
            n=("ok", "size"), correct=("ok", "sum"))
        return g.astype({"n": "int64", "correct": "int64"})

    parts = collect_rows(docs.map_batches(score_part,
                                          batch_format="pyarrow"))
    acc: dict[str, list[int]] = {}
    for r in parts:
        a = acc.setdefault(r["lang"], [0, 0])
        a[0] += int(r["n"]); a[1] += int(r["correct"])
    out_langs = sorted(acc)
    return pa.table({
        "lang": pa.array(out_langs, pa.string()),
        "n_docs": pa.array([acc[s][0] for s in out_langs], pa.int64()),
        "n_correct": pa.array([acc[s][1] for s in out_langs],
                              pa.int64()),
        "acc_micro": pa.array(
            [acc[s][1] * 1_000_000 // acc[s][0] for s in out_langs],
            pa.int64())})


def ann_rrf(sf_dir: str, k0: int = 60) -> pa.Table:
    """Reciprocal-rank fusion (Cormack et al. 2009) of the IVF and LSH
    ANN hit lists into one consensus ranking, flagged against the exact
    brute-force top-k — the standard no-tuning rank-ensemble step of a
    retrieval pipeline (fusing cheap approximate indexes often recovers
    what either misses alone).

    Pure-integer contract: each list ranks (score DESC, vec_id) — the
    same deterministic order the hash-green hit lists pin — and a rank
    r contributes w = 10^9 // (k0 + r) nano-units (EXACT floor
    division, no float anywhere); fused candidates order by
    (rrf_nano DESC, vec_id) and the top-10 per query are kept, with
    in_exact marking membership in the exact top-k.

    Scale: rides the bounded query set — both artifact lists are
    queries x k rows; the exact side is the distributed scorer; fusion
    is driver math over 2qk rows."""
    import pyarrow.parquet as pq

    from ..artifacts import ANN_K, ann_queries, ensure
    from ..stages.knn import knn_topk, read_embeddings
    from ..util import collect_table

    paths = ensure(sf_dir)
    q = ann_queries(sf_dir)
    et = collect_table(
        knn_topk(read_embeddings(sf_dir), q, k=ANN_K)).to_pandas()
    exact = set(zip(et["query_id"].astype(int),
                    et["vec_id"].astype(int)))

    scores: dict[tuple[int, int], int] = {}
    for method in ("ivf", "lsh"):
        t = pq.read_table(paths[f"{method}_topk"]).to_pandas()
        t = t.sort_values(["query_id", "score", "vec_id"],
                          ascending=[True, False, True],
                          kind="mergesort")
        t["r"] = t.groupby("query_id").cumcount() + 1
        for r in t.itertuples():
            key = (int(r.query_id), int(r.vec_id))
            scores[key] = scores.get(key, 0) \
                + 1_000_000_000 // (k0 + int(r.r))

    rows = []
    by_q: dict[int, list] = {}
    for (qid, vid), s in scores.items():
        by_q.setdefault(qid, []).append((s, vid))
    for qid in sorted(by_q):
        lst = sorted(by_q[qid], key=lambda sv: (-sv[0], sv[1]))[:10]
        for rank, (s, vid) in enumerate(lst, 1):
            rows.append((qid, vid, s, rank,
                         1 if (qid, vid) in exact else 0))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in rows], pa.int64()),
        "rrf_nano": pa.array([r[2] for r in rows], pa.int64()),
        "rank": pa.array([r[3] for r in rows], pa.int64()),
        "in_exact": pa.array([r[4] for r in rows], pa.int64())})

def _order_rank_moments(sf_dir: str, statuses: tuple[str, ...],
                        bin_cents: int, num_buckets: int):
    """Shared EXACT pooled-rank moments for the nonparametric tests:
    one distributed rank pass over order value (cents) restricted to
    ``statuses``, returning per-status (n_g, Σu_g) with u = 2·avgrank
    (always integer: 2·below + cnt + 1) plus the pooled tie sum
    T = Σ(t³−t).

    Rides ``exact_partitioned_ranks`` — ties co-locate because equal
    cents land in one value bin, so per-(partition, bin) ``np.unique``
    average-ranks and tie cubes are globally correct.  Partial Σu are
    decimal-string Python ints (rank sums pass int64 at 10^12 rows);
    tie cubes fold through ``_pairsum`` so per-element (c²−1)·c stays
    int64-safe for tie groups < 2.1M rows (a single price value at one
    cent granularity — far past any fixture)."""
    from .analytics import _cents, exact_partitioned_ranks

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderstatus", "o_totalprice"])
    keep = set(statuses)

    def base(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["o_orderstatus"].isin(keep)]
        return pd.DataFrame({
            "pk": pd.Series(["all"] * len(df), dtype="string"),
            "yc": _cents(df["o_totalprice"].to_numpy()),
            "st": df["o_orderstatus"].astype("string")})

    pr = src.map_batches(base, batch_format="pandas")
    part_schema = pa.schema([("st", pa.string()), ("ng", pa.int64()),
                             ("su", pa.string()), ("ties", pa.string())])

    def emit(g: pd.DataFrame, start: int, n: int) -> pd.DataFrame:
        yc = g["yc"].to_numpy()
        _, first, cnt = np.unique(yc, return_index=True,
                                  return_counts=True)
        u = np.repeat(2 * (start + first) + cnt + 1, cnt)
        ties = _pairsum(cnt * cnt - 1, cnt)
        st = g["st"].to_numpy()
        rows = [("", 0, "0", str(ties))]
        for s in sorted(set(st)):
            m = st == s
            rows.append((str(s), int(m.sum()),
                         str(_chunk_int_sum(u[m])), "0"))
        return pd.DataFrame(rows, columns=["st", "ng", "su", "ties"])

    parts = collect_rows(exact_partitioned_ranks(
        pr, "pk", "yc", "st", bin_cents, emit, part_schema,
        num_buckets=num_buckets))
    ng: dict[str, int] = {}
    su: dict[str, int] = {}
    ties = 0
    for r in parts:
        if r["st"] == "":
            ties += int(r["ties"])
        else:
            ng[r["st"]] = ng.get(r["st"], 0) + int(r["ng"])
            su[r["st"]] = su.get(r["st"], 0) + int(r["su"])
    return ng, su, ties


def order_value_kruskal(sf_dir: str, bin_cents: int = 100_000,
                        num_buckets: int = 16) -> pa.Table:
    """Distributed EXACT Kruskal–Wallis H across the three order
    statuses (F/O/P) — the k-sample extension of the rank-sum test
    (Kruskal & Wallis 1952), tie-corrected.

    With Σu_g = 2·R_g integers, P = n_F·n_O·n_P and
    S = Σ_g (Σu_g)²·(P/n_g), the tie-corrected statistic reduces to
    the single exact rational H_c = 3·(S − P·n·(n+1)²)·(n−1) /
    (P·(n³−n−T)) — all-integer numerator/denominator (HUGEINT in the
    oracle; safe to ~sf0.3 of the fixture, noted), one double
    division quantised to micro."""
    import math

    ng, su, T = _order_rank_moments(sf_dir, ("F", "O", "P"), bin_cents,
                                    num_buckets)
    sts = ("F", "O", "P")
    n = sum(ng.get(s, 0) for s in sts)
    h_micro = None
    if all(ng.get(s, 0) > 0 for s in sts) and n ** 3 - n - T > 0:
        P = 1
        for s in sts:
            P *= ng[s]
        S = sum(su.get(s, 0) ** 2 * (P // ng[s]) for s in sts)
        num = 3 * (S - P * n * (n + 1) ** 2) * (n - 1)
        den = P * (n ** 3 - n - T)
        h_micro = int(math.floor(float(num) / float(den) * 1e6 + 0.5))
    return pa.table({
        "n_f": pa.array([ng.get("F", 0)], pa.int64()),
        "n_o": pa.array([ng.get("O", 0)], pa.int64()),
        "n_p": pa.array([ng.get("P", 0)], pa.int64()),
        "h_micro": pa.array([h_micro], pa.int64())})


def user_churn_logrank(sf_dir: str, churn_days: int = 0,
                       num_buckets: int = 8) -> pa.Table:
    """Log-rank (Mantel–Cox) test between two user cohorts' churn
    curves — users whose deterministic FIRST event (min event time,
    ties to the lexicographically smallest type) is a 'click' vs all
    others — the hypothesis-test companion of the Kaplan–Meier curve
    (user_survival_km; same lifetimes).  Censoring follows the standard
    convention: a user still active within ``churn_days`` (default 0,
    i.e. on the corpus's last day) is censored, anyone who stopped
    earlier is a churn event — the fixture's users are near-uniformly
    active to the end, so the KM query's 7-day rule would leave zero
    events and a degenerate test.

    Integer contract: at each event time with dt > 0 churn events, the
    expected-count and hypergeometric-variance terms quantise to nano
    as exact integer rationals — e1_t = (2·dt·n1·1e9 + nt)//(2·nt),
    v_t = (2·dt·n1·(nt−n1)·(nt−dt)·1e9 + nt²(nt−1))//(2·nt²(nt−1)) —
    then fold by exact integer sums (the KM no-float-accumulation
    rule); χ² = (O1·1e9 − E1n)²/(Vn·1e9) is ONE double chain at 6 dp,
    identical HUGEINT→DOUBLE op order in the oracle.

    Scale: per-user (first-day, last-day, first-event) folds on the
    user key; cohort lifetimes aggregate on the span-bounded (g, t)
    key; the prefix pass is driver-small (≤ 2·span rows)."""
    from ..stages.groups import bucketed_group_apply
    from ..util import collect_rows
    from .analytics import bucketed_sum

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts", "event_type"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        tu = df["ts"].astype("datetime64[us]").astype("int64")
        b = pd.DataFrame({"user_id": df["user_id"], "tu": tu,
                          "d": tu // 86_400_000_000,
                          "ft": df["event_type"]})
        agg = b.groupby("user_id", as_index=False) \
            .agg(d0=("d", "min"), d1=("d", "max"), t0=("tu", "min"))
        first = b.sort_values(["user_id", "tu", "ft"],
                              kind="mergesort") \
            .drop_duplicates("user_id")[["user_id", "ft"]]
        g = agg.merge(first, on="user_id")
        return g.astype({"d0": "int64", "d1": "int64", "t0": "int64"})

    def fold_user(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("user_id", as_index=False) \
            .agg(d0=("d0", "min"), d1=("d1", "max"))
        first = df.sort_values(["user_id", "t0", "ft"],
                               kind="mergesort") \
            .drop_duplicates("user_id")[["user_id", "t0", "ft"]]
        return agg.merge(first, on="user_id")

    user_schema = pa.schema([
        ("user_id", pa.int64()), ("d0", pa.int64()), ("d1", pa.int64()),
        ("t0", pa.int64()), ("ft", pa.string())])
    spans = bucketed_group_apply(
        ev.map_batches(part, batch_format="pandas"),
        ["user_id"], fold_user, num_buckets=num_buckets,
        out_schema=user_schema).materialize()

    dmax = max(int(r["m"]) for r in collect_rows(spans.map_batches(
        lambda df: pd.DataFrame({"m": [np.int64(df["d1"].max())]}),
        batch_format="pandas")))

    def life_part(df: pd.DataFrame) -> pd.DataFrame:
        e = ((dmax - df["d1"]) > churn_days).astype("int64")
        g = pd.DataFrame({
            "g1": (df["ft"] == "click").astype("int64"),
            "t": (df["d1"] - df["d0"]).astype("int64"),
            "d": e, "c": 1 - e}) \
            .groupby(["g1", "t"], as_index=False).sum()
        return g.astype({"d": "int64", "c": "int64"})

    rows = collect_rows(bucketed_sum(
        spans.map_batches(life_part, batch_format="pandas"),
        ["g1", "t"], ["d", "c"], num_buckets=4))
    acc: dict[int, list[int]] = {}
    for r in rows:
        a = acc.setdefault(int(r["t"]), [0, 0, 0, 0])
        if int(r["g1"]) == 1:
            a[0] += int(r["d"]); a[1] += int(r["c"])
        a[2] += int(r["d"]); a[3] += int(r["c"])
    n1 = sum(a[0] + a[1] for a in acc.values())
    nt = sum(a[2] + a[3] for a in acc.values())
    n_click, n_other = n1, nt - n1
    o1, e1n, vn = 0, 0, 0
    for t in sorted(acc):
        d1t, c1t, dt, ct = acc[t]
        if dt > 0 and nt > 0:
            o1 += d1t
            e1n += (2 * dt * n1 * 10 ** 9 + nt) // (2 * nt)
            if nt > 1:
                num = dt * n1 * (nt - n1) * (nt - dt)
                den = nt * nt * (nt - 1)
                vn += (2 * num * 10 ** 9 + den) // (2 * den)
        n1 -= d1t + c1t
        nt -= dt + ct
    a = o1 * 10 ** 9 - e1n
    chi_micro = (None if vn <= 0 else
                 int(np.floor(float(a) * float(a)
                              / (float(vn) * 1e9) * 1e6 + 0.5)))
    return pa.table({
        "n_click": pa.array([n_click], pa.int64()),
        "n_other": pa.array([n_other], pa.int64()),
        "o1": pa.array([o1], pa.int64()),
        "e1_nano": pa.array([str(e1n)], pa.string()),
        "v_nano": pa.array([str(vn)], pa.string()),
        "chi_micro": pa.array([chi_micro], pa.int64())})


def order_value_median_test(sf_dir: str, bin_cents: int = 100_000,
                            num_buckets: int = 8) -> pa.Table:
    """Mood's median test across the three order statuses: split every
    order at the POOLED lower median (the value at 1-based rank
    ⌈N/2⌉ = (N+1)//2 under the cents sort) and test the 3×2
    above/at-or-below table against independence — the
    median-robust sibling of the Kruskal–Wallis panel.

    Integer contract: the pooled median comes from a two-pass exact
    selection with NO global sort — a mergeable fixed-width histogram
    locates the rank-k bin, then only that bin's values (bin-bounded)
    reach the driver; the χ² fold quantises each cell term
    (O·N − r·c)²/(N·r·c) to nano as an exact integer rational and
    sums integers (the KM/log-rank no-float-accumulation rule), so no
    float leaves a cell.  chi_nano is a decimal string (cell terms
    scale with N past int64 at 10^12 rows)."""
    from ..util import collect_rows
    from .analytics import _cents, bucketed_sum

    src = read_parquet_clean(f"{sf_dir}/orders.parquet",
                             columns=["o_orderstatus", "o_totalprice"])

    def base(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "st": df["o_orderstatus"].astype("string"),
            "yc": _cents(df["o_totalprice"].to_numpy())})

    pr = src.map_batches(base, batch_format="pandas").materialize()

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"b": df["yc"].to_numpy() // bin_cents}) \
            .groupby("b", as_index=False).size() \
            .rename(columns={"size": "c"})
        return g.astype({"c": "int64"})

    bins = sorted(collect_rows(bucketed_sum(
        pr.map_batches(hist, batch_format="pandas"),
        ["b"], ["c"], num_buckets=4)), key=lambda r: int(r["b"]))
    n = sum(int(r["c"]) for r in bins)
    k = (n + 1) // 2
    below, target = 0, None
    for r in bins:
        c = int(r["c"])
        if below + c >= k:
            target = int(r["b"])
            break
        below += c

    def in_bin(df: pd.DataFrame) -> pd.DataFrame:
        yc = df["yc"].to_numpy()
        return pd.DataFrame({"yc": yc[yc // bin_cents == target]})

    vals = np.sort(np.array(
        [int(r["yc"]) for r in collect_rows(
            pr.map_batches(in_bin, batch_format="pandas"))],
        dtype=np.int64))
    m = int(vals[k - below - 1])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"st": df["st"],
                          "a": (df["yc"].to_numpy() > m)
                          .astype(np.int64), "tot": 1}) \
            .groupby("st", as_index=False).sum()
        return g.astype({"a": "int64", "tot": "int64"})

    acc: dict[str, list[int]] = {}
    for r in collect_rows(bucketed_sum(
            pr.map_batches(counts, batch_format="pandas"),
            ["st"], ["a", "tot"], num_buckets=4)):
        a = acc.setdefault(str(r["st"]), [0, 0])
        a[0] += int(r["a"]); a[1] += int(r["tot"])
    ca = sum(a for a, _ in acc.values())
    chi = 0
    degenerate = ca == 0 or ca == n
    if not degenerate:
        for st in sorted(acc):
            a, tot = acc[st]
            for o, col in ((a, ca), (tot - a, n - ca)):
                num = 2 * (o * n - tot * col) ** 2 * 10 ** 9 \
                    + n * tot * col
                chi += num // (2 * n * tot * col)
    sts = ("F", "O", "P")
    cols = {"n": n, "m_cents": m}
    for s in sts:
        a, tot = acc.get(s, (0, 0))
        cols[f"n_{s.lower()}"] = tot
        cols[f"a_{s.lower()}"] = a
    return pa.table({
        **{c: pa.array([v], pa.int64()) for c, v in cols.items()},
        "chi_nano": pa.array([None if degenerate else str(chi)],
                             pa.string())})
