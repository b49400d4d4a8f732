"""Text-analysis operators for training-data pipelines (task spec: language
ID, quality scoring, token counting, document fingerprinting).  All are
stateless vectorised ``map_batches`` stages over the ``documents`` table;
none shuffles.

Definitions are mirrored in DuckDB oracle SQL where expressible
(__ray_entry__.oracle_sql) — keep both sides in sync.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..config import STOPWORDS
from ..stages.tokenize import tokenize_column

_WS = re.compile(r"\s+")
# BPE-ish token regex: words, numbers, or single non-space punctuation
_BPE = re.compile(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]")


def token_counts_batch(t: pa.Table) -> pa.Table:
    """(doc_id, n_ws_tokens, n_bpe_tokens) — whitespace + BPE-ish regex."""
    texts = t["text"].to_pylist()
    n_ws = np.fromiter((len([x for x in _WS.split(s) if x]) for s in texts),
                       dtype=np.int64, count=len(texts))
    n_bpe = np.fromiter((len(_BPE.findall(s)) for s in texts),
                        dtype=np.int64, count=len(texts))
    return pa.table({
        "doc_id": t["doc_id"],
        "n_ws_tokens": pa.array(n_ws, type=pa.int64()),
        "n_bpe_tokens": pa.array(n_bpe, type=pa.int64()),
    })


_STOPSET = frozenset(STOPWORDS)


def quality_batch(t: pa.Table) -> pa.Table:
    """(doc_id, n_chars, alpha_ratio, stop_ratio, avg_token_len) — rounded
    to 6 dp (float determinism vs the SQL oracle)."""
    texts = t["text"].to_pylist()
    n = len(texts)
    n_chars = np.fromiter((len(s) for s in texts), dtype=np.int64, count=n)
    # ASCII letters only — the SQL mirror counts [a-zA-Z]; str.isalpha()
    # would diverge on any non-ASCII letter (ADVICE r01)
    alpha = np.fromiter(
        (sum(("a" <= c <= "z") or ("A" <= c <= "Z") for c in s)
         for s in texts), dtype=np.float64, count=n)
    toks_list = tokenize_column(t["text"]).to_pylist()
    stop_r = np.empty(n)
    avg_len = np.empty(n)
    for i, (s, toks) in enumerate(zip(texts, toks_list)):
        words = [x for x in _WS.split(s) if x]
        stop_r[i] = (sum(1 for w in words if w.lower() in _STOPSET)
                     / len(words)) if words else 0.0
        avg_len[i] = (sum(len(w) for w in words) / len(words)) if words else 0.0
    with np.errstate(invalid="ignore"):
        alpha_r = np.where(n_chars > 0, alpha / n_chars, 0.0)

    def r6(x):
        # DuckDB round() is half-away-from-zero; np.round is banker's —
        # and small rational ratios (e.g. 105/128) DO land exactly on the
        # 6th-decimal midpoint.  Values here are non-negative.
        return np.floor(x * 1e6 + 0.5) / 1e6

    return pa.table({
        "doc_id": t["doc_id"],
        "n_chars": pa.array(n_chars, type=pa.int64()),
        "alpha_ratio": pa.array(r6(alpha_r), type=pa.float64()),
        "stop_ratio": pa.array(r6(stop_r), type=pa.float64()),
        "avg_token_len": pa.array(r6(avg_len), type=pa.float64()),
    })


# Tiny per-language character/word n-gram profiles (public-knowledge
# heuristic: frequent function words per language).  Deterministic fake of
# a real langid model; the Ray-side plumbing (vectorised map_batches over
# documents) is the real deliverable.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "was", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "dans"),
    "es": ("el", "los", "las", "es", "y", "en"),
    "zh": (),  # CJK detected by codepoint range below
}


def langid_batch(t: pa.Table) -> pa.Table:
    """(doc_id, lang_pred, lang_score) — marker-word / codepoint heuristic."""
    texts = t["text"].to_pylist()
    preds: list[str] = []
    scores: list[float] = []
    for s in texts:
        if any("一" <= c <= "鿿" for c in s[:500]):
            preds.append("zh"); scores.append(1.0)
            continue
        words = s.lower().split()
        best_lang, best = "en", -1.0
        for lang, markers in _LANG_MARKERS.items():
            if not markers:
                continue
            score = sum(1.0 for w in words if w in markers)
            if score > best:
                best_lang, best = lang, score
        total = max(1, len(words))
        preds.append(best_lang)
        # half-up at 6 dp (not Python's banker's round): marker-count /
        # word-count ratios are small rationals that DO land on 6-decimal
        # midpoints, and the DuckDB oracle's round() is half-away-from-zero.
        scores.append(np.floor(best / total * 1e6 + 0.5) / 1e6)
    return pa.table({
        "doc_id": t["doc_id"],
        "lang_pred": pa.array(preds, type=pa.string()),
        "lang_score": pa.array(scores, type=pa.float64()),
    })


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """(doc_id, fingerprint) — md5 over the normalised token stream.

    Mirrored in SQL: md5(array_to_string(tokens, ' ')) with the shared
    tokenisation rules.
    """
    toks = tokenize_column(t["text"]).to_pylist()
    fps = [hashlib.md5(" ".join(ts).encode()).hexdigest() for ts in toks]
    return pa.table({
        "doc_id": t["doc_id"],
        "fingerprint": pa.array(fps, type=pa.string()),
    })


def simhash_batch(t: pa.Table) -> pa.Table:
    """(doc_id, simhash) — 64-bit SimHash over tokens (Charikar 2002).

    Deterministic: per-token 64-bit hash = first 8 md5 digest bytes
    little-endian (== DuckDB's md5_number_upper, so the whole operator is
    mirrored in oracle SQL), sign-sum per bit, occurrence-weighted.
    """
    toks = tokenize_column(t["text"]).to_pylist()
    out = np.empty(len(toks), dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    bitcache: dict[str, np.ndarray] = {}  # per-batch token -> ±1 bit vector
    for i, ts in enumerate(toks):
        if not ts:
            out[i] = 0
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in ts:
            bits = bitcache.get(tok)
            if bits is None:
                h = np.uint64(int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:8], "little"))
                bits = np.where(((h >> shifts) & np.uint64(1)) == 1, 1, -1)
                bitcache[tok] = bits
            acc += bits
        sim = 0
        for b in range(64):
            if acc[b] > 0:
                sim |= (1 << b)
        out[i] = np.int64(sim - (1 << 64) if sim >= (1 << 63) else sim)
    return pa.table({
        "doc_id": t["doc_id"],
        "simhash": pa.array(out, type=pa.int64()),
    })


def read_documents(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=columns or ["doc_id", "text"])
