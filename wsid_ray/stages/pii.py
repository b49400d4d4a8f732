"""PII detection + redaction for training-data pipelines: emails, phone
numbers and IPv4 addresses replaced by typed placeholder tokens, with
per-document match counts.

Stateless vectorised ``map_batches`` stage — Arrow RE2 kernels
(``count_substring_regex`` / ``replace_substring_regex``) do the work, no
per-row Python in the scan/replace path; no shuffle at any scale.  DuckDB
also uses RE2, so the operator is mirrored verbatim in oracle SQL
(__ray_entry__.oracle_sql "doc_pii_redact") — identical regex engine,
identical leftmost-match semantics on both sides.

The synthetic ``documents`` fixture carries no real PII, so the
SQL-checked query plants deterministic PII spans derived from ``doc_id``
(``plant_pii_batch``, mirrored 1:1 in the SQL) before redacting — the
regexes, replacement order and counting run against realistic payloads
while the check stays content-deterministic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

# (pattern, placeholder) in REPLACEMENT ORDER — order matters (an earlier
# replacement must not manufacture or destroy later matches; these three
# are mutually non-overlapping by construction: emails need '@', phones
# never contain '.', IPs never contain '@' or 8-char dash/paren runs) and
# is shared verbatim with the SQL mirror.
REDACTIONS: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IP_RE, "<IP>"),
)


def plant_pii_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Append deterministic doc_id-derived PII spans to each document
    (fixture helper for the SQL-checked query; vectorised string build).
    """
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    id_s = pa.array(ids.astype("U"), type=pa.string())
    phone4 = pa.array(np.char.zfill((ids % 10000).astype("U"), 4),
                      type=pa.string())
    ip3 = pa.array((ids % 256).astype("U"), type=pa.string())
    ip4 = pa.array((ids % 7).astype("U"), type=pa.string())
    planted = pc.binary_join_element_wise(
        t[text_col], " contact user", id_s, "@example.com or +1 (555) 010-",
        phone4, " ip 10.0.", ip3, ".", ip4, "")
    return t.set_column(t.schema.get_field_index(text_col),
                        text_col, planted)


def redact_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, n_emails, n_phones, n_ips, redacted_md5) — counts are
    measured on the ORIGINAL text (before any replacement), then the
    placeholders are substituted in REDACTIONS order; the md5 of the
    redacted text keeps the driver-hashed payload small while still
    pinning every byte of the rewrite."""
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_em, n_ph, n_ip = (
        pc.count_substring_regex(col, pattern=p).cast(pa.int64())
        for p, _ in REDACTIONS)
    red = col
    for pat, repl in REDACTIONS:
        red = pc.replace_substring_regex(red, pattern=pat,
                                         replacement=repl)
    digests = [hashlib.md5(s.encode()).hexdigest()
               for s in red.to_pylist()]
    return pa.table({
        "doc_id": t["doc_id"],
        "n_emails": n_em,
        "n_phones": n_ph,
        "n_ips": n_ip,
        "redacted_md5": pa.array(digests, type=pa.string()),
    })


URL_HOST_RE = r"https?://([A-Za-z0-9.\-]+)"


def plant_urls_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Append deterministic doc_id-derived URLs (fixture helper for the
    SQL-checked domain-stats query, mirrored 1:1 in SQL)."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    site = pa.array((ids % 7).astype("U"), type=pa.string())
    page = pa.array(ids.astype("U"), type=pa.string())
    cdn = pa.array((ids % 3).astype("U"), type=pa.string())
    planted = pc.binary_join_element_wise(
        t[text_col], " see https://site", site, ".example.com/page/",
        page, " and http://cdn", cdn, ".example.org/x", "")
    return t.set_column(t.schema.get_field_index(text_col),
                        text_col, planted)


def url_domain_rows(t: pa.Table, text_col: str = "text") -> pa.Table:
    """One (domain,) row per URL occurrence — vectorised all-match host
    extraction: split on the scheme (Arrow's extract_regex only returns
    the FIRST match per value, so the scheme split turns 'all matches'
    into 'first match per fragment'), then the leading host-charset run
    of every non-leading fragment.  Same RE2 semantics as the SQL
    mirror's regexp_extract_all(..., 1)."""
    frags = pc.split_pattern_regex(t[text_col], pattern="https?://")
    if isinstance(frags, pa.ChunkedArray):
        frags = frags.combine_chunks()
    flat = frags.flatten()
    offs = frags.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    # drop each row's first fragment (text before the first scheme)
    idx_in_row = np.arange(len(flat)) - np.repeat(offs[:-1], lens)
    tail = flat.filter(pa.array(idx_in_row > 0))
    m = pc.extract_regex(tail, pattern=r"^(?P<h>[A-Za-z0-9.\-]+)")
    hosts = pc.struct_field(m, "h").drop_null()
    return pa.table({"domain": hosts.cast(pa.string())})


def url_domain_stats(docs, num_buckets: int = 8):
    """(domain, n) corpus-level URL domain counts — extraction is one
    vectorised map; only (domain, partial-count) rows shuffle."""
    from ..pipelines.analytics import bucketed_sum

    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        d = url_domain_rows(t)
        df = d.to_pandas().groupby("domain", as_index=False).size() \
            .rename(columns={"size": "n"})
        df["n"] = df["n"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    rows = docs.map_batches(plant_urls_batch, batch_format="pyarrow") \
               .map_batches(partial, batch_format="pyarrow")
    return bucketed_sum(rows, ["domain"], ["n"], num_buckets=num_buckets)
