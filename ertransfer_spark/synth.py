"""Deterministic synthetic transcript corpora (FIXTURES.md §1).

Two corpora A/B of multi-turn transcripts (conv_id, turn_idx, role, text,
tool, ts) generated from a shared pool of "true" conversations; a known
subset of A is duplicated into B under controlled perturbations (token
dropout, synonym swap, turn truncation, whitespace noise) so the golden
``matches(a_conv_id, b_conv_id)`` is exact — the datasets/*/matches.csv
analog (/root/reference/datasets/README.md:10-12).

Everything is seeded stdlib ``random`` — no external data, stable across
runs and machines. Skew knobs (hot token, mega-conversations) exercise
salting and per-block budgets.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import pandas as pd

VOCAB = [
    "deploy", "rollback", "cluster", "pipeline", "query", "schema", "token",
    "spark", "shuffle", "partition", "join", "index", "cache", "stream",
    "batch", "vector", "model", "train", "score", "label", "bucket", "merge",
    "commit", "snapshot", "lineage", "metric", "latency", "throughput",
    "error", "retry", "timeout", "config", "driver", "executor", "memory",
    "disk", "network", "parquet", "iceberg", "table", "column", "filter",
    "window", "aggregate", "broadcast", "salt", "skew", "budget", "checkpoint",
]
SYNONYMS = {
    "error": "failure", "retry": "reattempt", "query": "request",
    "deploy": "release", "cluster": "fleet", "latency": "delay",
    "model": "estimator", "train": "fit", "merge": "combine",
}

# Content-word tail: 2048 deterministic pseudo-words. Real transcripts have
# thousands of distinct content tokens; a head-only vocabulary makes every
# record share every blocking token (all-pairs blow-up), which is neither
# realistic nor scalable to measure against. Word draws mix ~35% head
# (stop-word-like, exercises hot-token df-pruning) with 65% tail
# (selective content words that make blocking sub-quadratic).
_SYLLABLES = [
    "ka", "to", "mi", "ra", "ne", "su", "lo", "ve",
    "da", "pi", "zu", "fe", "go", "ri", "ta", "mo",
]
TAIL_VOCAB = [
    a + b + c for a in _SYLLABLES for b in _SYLLABLES for c in _SYLLABLES[:8]
]
ROLES = ["user", "assistant", "tool"]
TOOLS = [None, "search", "bash", "python", "browser"]
EPOCH = datetime(2026, 1, 1)


@dataclass
class SynthConfig:
    n_conversations: int = 200
    match_fraction: float = 0.4      # fraction of A duplicated into B
    extra_b_fraction: float = 0.3    # B-only conversations, relative to A
    min_turns: int = 3
    max_turns: int = 8
    turn_len: tuple = (4, 12)        # words per turn
    dropout: float = 0.08            # per-token dropout in perturbed copies
    synonym_p: float = 0.15
    truncate_p: float = 0.25         # chance of dropping the last turn
    hot_token: str | None = None     # injected into this fraction of convs...
    hot_token_frac: float = 0.0      # ...to create a mega-block
    mega_conv_turns: int = 0         # if >0, make conv 0 this many turns
    head_fraction: float = 0.35      # P(word drawn from the hot head vocab)
    seed: int = 42
    extra: dict = field(default_factory=dict)


def _make_conv(rng: random.Random, conv_id: str, cfg: SynthConfig, hot: bool) -> list[dict]:
    n_turns = rng.randint(cfg.min_turns, cfg.max_turns)
    if cfg.mega_conv_turns and conv_id.endswith("_0"):
        n_turns = cfg.mega_conv_turns
    rows = []
    ts = EPOCH + timedelta(seconds=rng.randint(0, 10_000_000))
    for t in range(n_turns):
        n_words = rng.randint(*cfg.turn_len)
        words = [
            rng.choice(VOCAB) if rng.random() < cfg.head_fraction else rng.choice(TAIL_VOCAB)
            for _ in range(n_words)
        ]
        if hot and cfg.hot_token:
            words.insert(rng.randrange(len(words) + 1), cfg.hot_token)
        role = ROLES[t % len(ROLES)]
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": " ".join(words),
                "tool": rng.choice(TOOLS) if role == "tool" else None,
                "ts": ts + timedelta(seconds=30 * t),
            }
        )
    return rows


def _perturb(rng: random.Random, rows: list[dict], new_id: str, cfg: SynthConfig) -> list[dict]:
    out = []
    keep_turns = rows
    if len(rows) > cfg.min_turns and rng.random() < cfg.truncate_p:
        keep_turns = rows[:-1]
    for r in keep_turns:
        words = []
        for w in r["text"].split():
            if rng.random() < cfg.dropout:
                continue
            if w in SYNONYMS and rng.random() < cfg.synonym_p:
                w = SYNONYMS[w]
            words.append(w)
        if not words:
            words = r["text"].split()[:1]
        text = " ".join(words)
        if rng.random() < 0.1:
            text = text.replace(" ", "  ", 1)  # whitespace noise
        out.append({**r, "conv_id": new_id, "text": text})
    return out


def generate(cfg: SynthConfig | None = None):
    """Returns (transcripts_a, transcripts_b, matches) pandas DataFrames.

    matches has columns (a_conv_id, b_conv_id).
    """
    cfg = cfg or SynthConfig()
    rng = random.Random(cfg.seed)
    a_rows: list[dict] = []
    b_rows: list[dict] = []
    matches: list[dict] = []

    n_hot = int(cfg.n_conversations * cfg.hot_token_frac)
    for i in range(cfg.n_conversations):
        conv_id = f"a_{i}"
        hot = i < n_hot
        conv = _make_conv(rng, conv_id, cfg, hot)
        a_rows.extend(conv)
        if rng.random() < cfg.match_fraction:
            b_id = f"b_{i}"
            b_rows.extend(_perturb(rng, conv, b_id, cfg))
            matches.append({"a_conv_id": conv_id, "b_conv_id": b_id})

    n_extra = int(cfg.n_conversations * cfg.extra_b_fraction)
    for i in range(n_extra):
        b_id = f"b_x{i}"
        b_rows.extend(_make_conv(rng, b_id, cfg, hot=False))

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ta = pd.DataFrame(a_rows, columns=cols)
    tb = pd.DataFrame(b_rows, columns=cols)
    m = pd.DataFrame(matches, columns=["a_conv_id", "b_conv_id"])
    return ta, tb, m


def to_spark(spark, pdf: pd.DataFrame):
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    return spark.createDataFrame(pdf, schema=schema)
