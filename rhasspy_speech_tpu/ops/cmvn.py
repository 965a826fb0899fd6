"""Online cepstral mean (and variance) normalization.

Replaces Kaldi's OnlineCmvn (kaldi/src/feat/online-feature.h:321,
online-feature.cc OnlineCmvn::{ComputeStatsForFrame,SmoothOnlineCmvnStats}):
for frame t the statistics come from the sliding window [t-cmn_window, t];
while fewer than cmn_window frames are available the deficit is filled from
global stats (capped at global_frames), exactly the reference's smoothing
rule. Batched over [streams, frames] with cumulative sums — no per-frame
host loop.

Global stats use Kaldi's matrix convention (global_cmvn.stats, a [2, D+1]
matrix: row 0 = per-dim sums with the frame count in the last column,
row 1 = per-dim sum-squares).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp


@dataclass(frozen=True)
class CmvnConfig:
    """OnlineCmvnOptions defaults (online-feature.h:331-360)."""

    cmn_window: int = 600
    global_frames: int = 200
    norm_mean: bool = True
    norm_var: bool = False


def stats_from_matrix(stats: np.ndarray) -> Tuple[np.ndarray, np.ndarray, float]:
    """Kaldi [2, D+1] stats matrix -> (sum [D], sumsq [D], count)."""
    stats = np.asarray(stats)
    count = float(stats[0, -1])
    return stats[0, :-1].copy(), stats[1, :-1].copy(), count


def matrix_from_stats(total: np.ndarray, total_sq: np.ndarray, count: float) -> np.ndarray:
    d = total.shape[0]
    out = np.zeros((2, d + 1), dtype=np.float64)
    out[0, :d] = total
    out[0, d] = count
    out[1, :d] = total_sq
    return out


def online_cmvn(
    feats: jnp.ndarray,
    global_stats: Optional[np.ndarray] = None,
    cfg: CmvnConfig = CmvnConfig(),
) -> jnp.ndarray:
    """[B, T, D] -> normalized [B, T, D]."""
    if not cfg.norm_mean and not cfg.norm_var:
        return feats
    B, T, D = feats.shape

    cum = jnp.cumsum(feats, axis=1)
    cum = jnp.concatenate([jnp.zeros((B, 1, D), feats.dtype), cum], axis=1)
    t = np.arange(T)
    lo = np.maximum(t + 1 - cfg.cmn_window, 0)
    window_sum = cum[:, t + 1] - cum[:, lo]  # [B, T, D]
    count = jnp.asarray((t + 1 - lo).astype(np.float32))[None, :, None]

    if cfg.norm_var:
        cum2 = jnp.cumsum(feats * feats, axis=1)
        cum2 = jnp.concatenate([jnp.zeros((B, 1, D), feats.dtype), cum2], axis=1)
        window_sumsq = cum2[:, t + 1] - cum2[:, lo]

    if global_stats is not None:
        g_sum, g_sumsq, g_count = stats_from_matrix(global_stats)
        if g_count > 0:
            # SmoothOnlineCmvnStats: fill the window deficit from global
            # stats, capped at global_frames
            take = jnp.minimum(
                jnp.maximum(cfg.cmn_window - count, 0.0),
                float(min(g_count, cfg.global_frames)),
            )
            scale = take / g_count
            window_sum = window_sum + scale * jnp.asarray(
                g_sum, dtype=feats.dtype
            )
            if cfg.norm_var:
                window_sumsq = window_sumsq + scale * jnp.asarray(
                    g_sumsq, dtype=feats.dtype
                )
            count = count + take

    mean = window_sum / count
    out = feats - mean if cfg.norm_mean else feats
    if cfg.norm_var:
        var = window_sumsq / count - mean * mean
        out = out * jnp.where(var > 1e-10, 1.0 / jnp.sqrt(var), 1.0)
    return out
