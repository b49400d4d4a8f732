"""Deterministic synthetic `transcripts` generator (FIXTURES.md F1).

The graft's mandated input table (BASELINE.json:15) does not exist in
/root/testdata, so it is synthesised here — deterministically (seeded
``random.Random``, closed vocabularies, no external data) so that unit
tests, the DuckDB oracle comparison and the benchmark all see the exact
same bytes for a given scale.

Planted-sense design (mirrors the style of wsid's induce test fixtures,
SURVEY.md §5.1): each ambiguous gazetteer term occurs inside sentences
drawn from one of 2-3 *disjoint* per-sense vocabularies, so the per-term
co-occurrence graph has a known k-component structure and the expected
Chinese-Whispers clusters / sense assignments are known a priori.
Ground truth is written alongside as ``gt_mentions.parquet``.

Skew knob: ~1% of conversations get ~30x the normal turn count, which is
what exercises the conv_id salting path (SURVEY.md §4.3).
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .config import ALIASES, KB

# ---------------------------------------------------------------------------
# Vocabularies.  Per-sense vocab = KB profile tokens (used by entity-link
# scoring) + extra disjoint topical words.  All words are lowercase,
# >= 3 chars, and absent from config.STOPWORDS.
# ---------------------------------------------------------------------------
_EXTRA: dict[str, tuple[str, ...]] = {
    "kb:jaguar_animal": ("claws", "roar", "territory", "stalking", "rainforest",
                         "camouflage", "rosettes", "apex"),
    "kb:jaguar_car": ("throttle", "chassis", "leather", "warranty", "mileage",
                      "turbo", "showroom", "ignition"),
    "kb:python_snake": ("python_skin", "burmese", "prey_drive", "terrarium",
                        "hatchling", "molting", "jungle_floor", "ambush"),
    "kb:python_lang": ("syntax", "interpreter", "decorator", "iterator",
                       "exception", "refactor", "unittest", "bytecode"),
    "kb:mercury_planet": ("perihelion", "magnetosphere", "flyby", "caloris",
                          "messenger", "transit", "albedo", "exosphere"),
    "kb:mercury_element": ("amalgam", "quicksilver", "cinnabar", "fluorescent",
                           "barometer", "fulminate", "organomercury", "fumes"),
    "kb:apple_fruit": ("blossom", "grafting", "honeycrisp", "pollination",
                       "pressing", "bushel", "core", "peel"),
    "kb:apple_company": ("macbook", "appstore", "developer", "wwdc",
                         "touchscreen", "earnings", "retail", "firmware"),
    "kb:bank_river": ("current", "sediment", "willow", "heron", "gravel",
                      "meander", "floodplain", "wading"),
    "kb:bank_finance": ("overdraft", "branch_office", "statement", "cashier",
                        "collateral", "savings", "wire_transfer", "ledger"),
}

SENSE_VOCAB: dict[str, tuple[str, ...]] = {
    kb_id: tuple(profile) + _EXTRA[kb_id]
    for term, cands in KB.items() for kb_id, profile in cands.items()
}

NEUTRAL_VOCAB: tuple[str, ...] = (
    "meeting", "schedule", "project", "report", "update", "question",
    "answer", "detail", "summary", "context", "result", "status",
    "morning", "evening", "afternoon", "review", "draft", "note",
    "thanks", "please", "welcome", "idea", "plan", "team",
)

_CONNECTORS = ("the", "and", "near", "with", "about")  # mostly stopwords/short

_T0 = datetime(2026, 1, 1)

SCALES: dict[str, dict] = {
    # name -> (n_convs, n_files); turn counts come from the rng
    "tiny": {"n_convs": 8, "n_files": 1},
    "sf0.001": {"n_convs": 200, "n_files": 4},
    "sf0.01": {"n_convs": 2000, "n_files": 8},
    # bench scale: ~4.8M turns / ~1 GB — large enough that a 32-CPU run is
    # compute-bound rather than dispatch-bound; generated once, cached
    # under DATA_ROOT.
    "sf0.1": {"n_convs": 400_000, "n_files": 64},
    # scaling-efficiency scale (~14M turns): the N→4N criterion measures
    # the pipeline's parallel fraction, so the per-level runs must be long
    # enough that fixed per-stage costs (actor-pool spin-up, shuffle
    # barriers, driver collects — ~10 s/run regardless of input) don't
    # masquerade as serial fraction.  10^12-turn regime ≈ hours per
    # partition; this is the sandbox-sized stand-in.
    "sf0.3": {"n_convs": 1_200_000, "n_files": 64},
    # round-3 scaling scale (~29M turns): each engine round makes the
    # pipeline faster, which shrinks per-level walls and lets the ~10 s
    # fixed cost masquerade as serial fraction again — the measurement
    # corpus has to grow with the engine (same reasoning that moved r2
    # from sf0.1 to sf0.3; BASELINE.md methodology notes).
    "sf0.6": {"n_convs": 2_400_000, "n_files": 64},
    # round-4 scaling scale (~57M turns): at sf0.6 the 16-CPU flagship
    # wall shrank to ~82 s, so the measured ~30 s of per-run fixed cost
    # (Ray/session startup, streaming-executor ramp per execution,
    # driver collects of vocab-bounded models) reads as serial fraction
    # and caps the raw 4->16 ratio at ~2.9 even in a quiet window.  Same
    # reasoning that moved r2 sf0.1->sf0.3 and r3 ->sf0.6: the corpus
    # grows with the engine so the measurement keeps measuring the
    # pipeline (SCALE.md round-4 forensics).
    "sf1.2": {"n_convs": 4_800_000, "n_files": 128},
}

DATA_ROOT = os.environ.get("WSID_RAY_DATA", "/tmp/wsid_ray_data")
_GEN_VERSION = "v8"  # bump to invalidate caches when generation rules change


def _conv_rows(rng: random.Random, conv_i: int, skewed: bool):
    """Generate one conversation's rows. Returns list of per-turn tuples.

    ``rng`` is a per-conversation stream seeded from (seed, conv_i) so
    generation is deterministic AND file-parallel."""
    conv_id = f"conv{conv_i:06d}"
    n_turns = rng.randint(250, 350) if skewed else rng.randint(4, 14)
    base_ts = _T0 + timedelta(seconds=conv_i * 97)
    terms = sorted(KB)
    aliases_by_base: dict[str, list[str]] = {}
    for a, b in ALIASES.items():
        aliases_by_base.setdefault(b, []).append(a)
    rows = []
    gt = []
    for t in range(n_turns):
        role = ("user", "assistant")[t % 2]
        if t % 7 == 3:
            role = "tool"
        tool = rng.choice(("search", "code", "browse")) if role == "tool" else ""
        def filler_sentence() -> str:
            # realistic turn length needs filler clauses; neutral vocab only
            # so planted windows stay clean (filler is > W tokens away).
            k = rng.randint(8, 14)
            ws = rng.choices(NEUTRAL_VOCAB, k=k)
            return f"{rng.choice(_CONNECTORS)} " + " ".join(ws)

        parts: list[str] = []
        if rng.random() < 0.55:
            base = rng.choice(terms)
            kb_id = rng.choice(sorted(KB[base]))
            surface = base
            al = aliases_by_base.get(base)
            if al and rng.random() < 0.15:
                surface = rng.choice(sorted(al))
            vocab = SENSE_VOCAB[kb_id]
            w = [rng.choice(vocab) for _ in range(6)]
            c = [rng.choice(_CONNECTORS) for _ in range(3)]
            if rng.random() < 0.5:
                parts.append(filler_sentence() + " .")
            parts.append(f"{c[0]} {w[0]} {w[1]} {c[1]} {w[2]} {surface} "
                         f"{w[3]} {c[2]} {w[4]} {w[5]} .")
            gt.append((conv_id, t, surface, kb_id))
            if rng.random() < 0.18:
                # second mention in the same turn -> co_mentioned_with pairs
                base2 = rng.choice(terms)
                kb2 = rng.choice(sorted(KB[base2]))
                v2 = SENSE_VOCAB[kb2]
                w2 = [rng.choice(v2) for _ in range(4)]
                parts.append(f"{w2[0]} {w2[1]} {base2} {w2[2]} {w2[3]} .")
                gt.append((conv_id, t, base2, kb2))
            if rng.random() < 0.5:
                parts.append(filler_sentence())
        else:
            parts.append(filler_sentence() + " .")
            parts.append(filler_sentence())
        text = " ".join(parts)
        ts = base_ts + timedelta(seconds=30 * t)
        rows.append((conv_id, t, role, text, tool, ts))
    return rows, gt


def _gen_file(args) -> str:
    """Generate one transcript part file (+ its gt part). Process-parallel
    safe: every conversation gets its own seeded RNG stream."""
    tmp, f_i, conv_lo, conv_hi, seed, skew_every = args
    rows: list[tuple] = []
    gt_all: list[tuple] = []
    for conv_i in range(conv_lo, conv_hi):
        rng = random.Random((seed << 24) ^ conv_i)
        skewed = (conv_i % skew_every == skew_every - 1)
        r, g = _conv_rows(rng, conv_i, skewed)
        rows.extend(r)
        gt_all.extend(g)
    cols = list(zip(*rows))
    table = pa.table({
        "conv_id": pa.array(cols[0], type=pa.string()),
        "turn_idx": pa.array(cols[1], type=pa.int32()),
        "role": pa.array(cols[2], type=pa.string()),
        "text": pa.array(cols[3], type=pa.string()),
        "tool": pa.array(cols[4], type=pa.string()),
        "ts": pa.array(cols[5], type=pa.timestamp("us")),
    })
    # 64k-row row groups: the reader's split unit, so task granularity at
    # high parallelism is row groups (stragglers cost one group, not one
    # file) — the 100 TB layout rule (SURVEY.md S2 note)
    pq.write_table(table, os.path.join(tmp, "transcripts",
                                       f"part-{f_i:04d}.parquet"),
                   row_group_size=65536)
    gcols = list(zip(*gt_all)) if gt_all else [[], [], [], []]
    pq.write_table(pa.table({
        "conv_id": pa.array(gcols[0], type=pa.string()),
        "turn_idx": pa.array(gcols[1], type=pa.int32()),
        "term": pa.array(gcols[2], type=pa.string()),
        "kb_id": pa.array(gcols[3], type=pa.string()),
    }), os.path.join(tmp, f"gt-part-{f_i:04d}.parquet"))
    return f_i


def generate(scale: str, out_dir: str | None = None, seed: int = 42) -> str:
    """Write transcripts for ``scale`` under DATA_ROOT (atomic, idempotent).

    Returns the directory containing ``transcripts/*.parquet`` and
    ``gt_mentions.parquet``.
    """
    spec = SCALES[scale]
    out_dir = out_dir or os.path.join(DATA_ROOT, _GEN_VERSION, scale)
    done_marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(done_marker):
        return out_dir

    n_convs, n_files = spec["n_convs"], spec["n_files"]
    skew_every = 100  # ~1% of convs are long (skew knob)

    os.makedirs(os.path.dirname(out_dir), exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f"wsid_gen_{scale}_",
                           dir=os.path.dirname(out_dir) or "/tmp")
    try:
        os.makedirs(os.path.join(tmp, "transcripts"), exist_ok=True)
        convs_per_file = max(1, (n_convs + n_files - 1) // n_files)
        jobs = []
        for f_i in range(n_files):
            lo = f_i * convs_per_file
            hi = min(n_convs, lo + convs_per_file)
            if lo >= hi:
                break
            jobs.append((tmp, f_i, lo, hi, seed, skew_every))
        if len(jobs) > 2:
            from concurrent.futures import ProcessPoolExecutor
            with ProcessPoolExecutor(max_workers=min(16, len(jobs))) as ex:
                list(ex.map(_gen_file, jobs))
        else:
            for j in jobs:
                _gen_file(j)
        gt_parts = sorted(f for f in os.listdir(tmp)
                          if f.startswith("gt-part-"))
        gt = pa.concat_tables([pq.read_table(os.path.join(tmp, f))
                               for f in gt_parts])
        pq.write_table(gt, os.path.join(tmp, "gt_mentions.parquet"))
        for f in gt_parts:
            os.remove(os.path.join(tmp, f))
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write(f"scale={scale} seed={seed} convs={n_convs}\n")
        os.makedirs(os.path.dirname(out_dir), exist_ok=True)
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.replace(tmp, out_dir)
    finally:
        if os.path.exists(tmp) and tmp != out_dir:
            shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def transcripts_dir(sf_dir_or_scale: str) -> str:
    """Map a driver sf_dir (``/root/testdata/sf0.01``) or a scale name to the
    generated transcripts parquet directory, generating on first use."""
    scale = os.path.basename(str(sf_dir_or_scale).rstrip("/"))
    if scale not in SCALES:
        raise ValueError(
            f"unknown transcripts scale {scale!r} (from "
            f"{sf_dir_or_scale!r}); valid: {sorted(SCALES)}")
    root = generate(scale)
    return os.path.join(root, "transcripts")


def transcript_files(sf_dir_or_scale: str) -> list[str]:
    d = transcripts_dir(sf_dir_or_scale)
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.endswith(".parquet"))


def gt_mentions_path(sf_dir_or_scale: str) -> str:
    return os.path.join(os.path.dirname(transcripts_dir(sf_dir_or_scale)),
                        "gt_mentions.parquet")
