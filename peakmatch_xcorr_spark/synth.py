"""Deterministic synthetic transcript generator (BASELINE.json
``input_hint`` schema).

Emits the engine's primary input table
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)`` with:

- zipf-skewed turns-per-conversation (plus one planted giant
  conversation for skew tests),
- planted timestamp gaps (for LOCF / linear-interpolation tests),
- planted near-duplicate conversation pairs whose per-bucket activity
  curves are lag-shifted noisy copies (ground truth for the
  peakmatch/xcorr dedup FP/FN tests — the ANALYSE-style fixture).

Everything is seeded; no wall-clock, no external data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

EPOCH_US = 1704067200_000_000  # 2024-01-01T00:00:00Z
BUCKET_US = 60_000_000  # 1 minute

ROLES = ("user", "assistant", "tool")
TOOLS = (None, "search", "python", "browser", None, None)


@dataclass(frozen=True)
class SynthConf:
    n_convs: int = 40
    curve_len: int = 256  # activity-curve buckets per conversation
    mean_rate: float = 1.2  # mean turns per active bucket
    burst_count: int = 3
    gap_prob: float = 0.12  # probability a bucket is silent inside a burst
    n_dup_pairs: int = 4
    dup_noise: float = 0.15
    giant_conv: bool = True
    giant_scale: int = 30
    seed: int = 42
    dup_max_lag: int = 8


def _activity_curve(rng: np.random.Generator, conf: SynthConf, scale: float = 1.0) -> np.ndarray:
    """Integer turns-per-bucket curve: a few gaussian bursts + sparse
    background, with planted silent buckets (gaps)."""
    b = conf.curve_len
    t = np.arange(b)
    lam = np.zeros(b)
    for _ in range(conf.burst_count):
        center = rng.uniform(0.1 * b, 0.9 * b)
        width = rng.uniform(b / 40, b / 10)
        amp = rng.uniform(0.5, 3.0) * conf.mean_rate
        lam += amp * np.exp(-((t - center) ** 2) / (2 * width**2))
    counts = rng.poisson(lam * scale)
    counts[rng.random(b) < conf.gap_prob] = 0
    return counts.astype(np.int64)


def _near_dup_curve(
    rng: np.random.Generator, base: np.ndarray, conf: SynthConf
) -> np.ndarray:
    """Lag-shifted noisy copy of a curve — activity xcorr stays above
    the reference final-threshold (verified by the fixture tests)."""
    lag = int(rng.integers(-conf.dup_max_lag, conf.dup_max_lag + 1))
    shifted = np.roll(base, lag)
    if lag > 0:
        shifted[:lag] = 0
    elif lag < 0:
        shifted[lag:] = 0
    noise = rng.poisson(conf.dup_noise * max(base.mean(), 0.2), len(base))
    flip = rng.random(len(base)) < conf.dup_noise
    out = shifted + np.where(flip, noise, 0)
    return out.astype(np.int64)


@dataclass
class SynthResult:
    transcripts: pd.DataFrame
    curves: dict[str, np.ndarray]
    dup_pairs: list[tuple[str, str]] = field(default_factory=list)


def generate_transcripts(conf: SynthConf = SynthConf()) -> SynthResult:
    rng = np.random.default_rng(conf.seed)
    curves: dict[str, np.ndarray] = {}
    dup_pairs: list[tuple[str, str]] = []

    for i in range(conf.n_convs):
        curves[f"conv{i:05d}"] = _activity_curve(rng, conf)

    names = sorted(curves)
    for j in range(conf.n_dup_pairs):
        src = names[j % len(names)]
        dup = f"conv{conf.n_convs + j:05d}-dup"
        curves[dup] = _near_dup_curve(rng, curves[src], conf)
        dup_pairs.append((src, dup) if src < dup else (dup, src))

    if conf.giant_conv:
        curves["conv-giant"] = _activity_curve(rng, conf, scale=conf.giant_scale)

    # vectorized row materialization (scales to multi-million turns)
    conv_names = sorted(curves)
    conv_arrs, turn_arrs, ts_arrs = [], [], []
    for conv in conv_names:
        counts = curves[conv]
        n = int(counts.sum())
        if n == 0:
            continue
        bucket_idx = np.repeat(np.arange(len(counts)), counts)
        offs = rng.integers(0, BUCKET_US, n)
        # sort offsets within each bucket → strictly ordered per conv
        order = np.lexsort((offs, bucket_idx))
        ts = EPOCH_US + bucket_idx[order] * BUCKET_US + offs[order]
        conv_arrs.append(np.full(n, conv, dtype=object))
        turn_arrs.append(np.arange(n, dtype=np.int32))
        ts_arrs.append(ts.astype(np.int64))

    conv_col = np.concatenate(conv_arrs)
    turn_col = np.concatenate(turn_arrs)
    ts_col = np.concatenate(ts_arrs)
    roles = np.array(ROLES)[turn_col % len(ROLES)]
    tools_cycle = np.array([t if t is not None else "" for t in TOOLS])
    tool_col = np.where(
        roles == "tool", tools_cycle[turn_col % len(TOOLS)], ""
    )
    hashes = (turn_col.astype(np.int64) * 2654435761) % 997
    text_col = np.char.add(
        np.char.add(conv_col.astype(str), " turn "),
        np.char.add(
            np.char.add(turn_col.astype(str), " says "), hashes.astype(str)
        ),
    )
    df = pd.DataFrame(
        {
            "conv_id": pd.array(conv_col, dtype="string"),
            "turn_idx": pd.array(turn_col, dtype="int32"),
            "role": pd.array(roles, dtype="string"),
            "text": pd.array(text_col, dtype="string"),
            "tool": pd.array(
                np.where(tool_col == "", None, tool_col), dtype="string"
            ),
            # input_hint: ts is timestamp(us) — keep us resolution end-to-end
            "ts": ts_col.view("datetime64[us]"),
        }
    )
    return SynthResult(transcripts=df, curves=curves, dup_pairs=dup_pairs)


def write_transcripts_parquet(path: str, conf: SynthConf = SynthConf()) -> SynthResult:
    res = generate_transcripts(conf)
    res.transcripts.to_parquet(path, index=False)
    return res
