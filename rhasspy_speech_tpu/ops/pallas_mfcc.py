"""Fused MFCC Pallas kernel.

The XLA path (ops/frontend.py) lets the compiler schedule rfft + elementwise
+ matmuls with intermediates spilling to HBM between fusion islands; this
kernel keeps the whole per-frame compute chain in VMEM:

  DC removal -> pre-emphasis -> Povey window -> real DFT as two MXU matmuls
  (512-pt cos/sin) -> power spectrum -> mel filterbank matmul -> log -> DCT
  matmul -> cepstral lifter

Only the raw frames enter and the final cepstra leave the chip memory; the
spectra/power/mel intermediates (the bulk of the traffic in the XLA path)
never touch HBM. Framing itself (strided window gather) happens outside the
kernel — a lane-regrouping reshape inside Mosaic is unsupported, and XLA's
gather is already optimal for it.

Numerics identical to ops/frontend.py (Kaldi feature-mfcc.cc pipeline); the
DFT-as-matmul trades FLOPs for fusion — at 512 points the MXU does a frame's
DFT in one pass.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .frontend import (
    FrontendConfig,
    _window_function,
    make_dct_matrix,
    make_lifter_coeffs,
    make_mel_matrix,
    num_frames,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _constants(cfg: FrontendConfig):
    """Padded constant matrices for the kernel (host-side, cached)."""
    padded = cfg.padded_window_size  # 512
    n_freq = padded // 2 + 1  # 257
    n_freq_pad = _round_up(n_freq, 128)  # 384
    n_mel = cfg.num_mel_bins
    n_mel_pad = _round_up(n_mel, 128)
    n_ceps_pad = _round_up(cfg.num_ceps, 128)

    k = np.arange(padded)[:, None]
    f = np.arange(n_freq)[None, :]
    ang = -2.0 * np.pi * k * f / padded
    cos_m = np.zeros((padded, n_freq_pad), np.float32)
    sin_m = np.zeros((padded, n_freq_pad), np.float32)
    cos_m[:, :n_freq] = np.cos(ang)
    sin_m[:, :n_freq] = np.sin(ang)

    mel = make_mel_matrix(cfg)  # [n_freq, n_mel]
    mel_pad = np.zeros((n_freq_pad, n_mel_pad), np.float32)
    mel_pad[:n_freq, :n_mel] = mel

    dct = make_dct_matrix(cfg.num_ceps, n_mel)  # [n_mel, n_ceps]
    dct_pad = np.zeros((n_mel_pad, n_ceps_pad), np.float32)
    dct_pad[:n_mel, : cfg.num_ceps] = dct

    lifter = np.zeros((1, n_ceps_pad), np.float32)
    lifter[0, : cfg.num_ceps] = make_lifter_coeffs(cfg.cepstral_lifter, cfg.num_ceps)

    # Window embedded in a [padded] vector (zero tail) so the kernel's frame
    # input can be pre-padded to the FFT size
    window = np.zeros((1, padded), np.float32)
    window[0, : cfg.frame_length] = _window_function(cfg)
    # NumPy, not jnp: this cache may first fill inside a jit trace, and
    # caching traced arrays would leak tracers into later traces.
    return (cos_m, sin_m, mel_pad, dct_pad, lifter, window, n_ceps_pad)


def _kernel(frames_ref, cos_ref, sin_ref, mel_ref, dct_ref, lift_ref, win_ref,
            out_ref, *, cfg: FrontendConfig):
    length = cfg.frame_length  # 400 (valid samples per frame row)
    frames = frames_ref[0, :, :]  # [T, padded], zeros past `length`

    if cfg.remove_dc_offset:
        # tail lanes are zero, so the sum covers exactly the real samples;
        # the uniform -mean offset on the tail is erased by the windowing
        # below (the embedded window's tail is zero)
        mean = jnp.sum(frames, axis=1, keepdims=True) * (1.0 / length)
        frames = frames - mean
    if cfg.preemph_coeff != 0.0:
        shifted = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - cfg.preemph_coeff * shifted
    # windowing also re-zeroes the padded tail (window tail is zero)
    frames = frames * win_ref[0, :][None, :]

    hp = jax.lax.Precision.HIGHEST  # f32 MXU passes: feature numerics
    re = jnp.dot(frames, cos_ref[:, :], preferred_element_type=jnp.float32,
                 precision=hp)
    im = jnp.dot(frames, sin_ref[:, :], preferred_element_type=jnp.float32,
                 precision=hp)
    power = re * re + im * im  # [T, n_freq_pad]

    eps = jnp.float32(np.finfo(np.float32).eps)
    mel = jnp.dot(power, mel_ref[:, :], preferred_element_type=jnp.float32,
                  precision=hp)
    # padded mel columns are exactly zero; the floor keeps their log finite
    logmel = jnp.log(jnp.maximum(mel, eps))
    feats = jnp.dot(logmel, dct_ref[:, :], preferred_element_type=jnp.float32,
                    precision=hp)
    if cfg.cepstral_lifter != 0.0:
        feats = feats * lift_ref[0, :][None, :]
    out_ref[0, :, :] = feats


def mfcc_pallas(
    cfg: FrontendConfig,
    samples: jnp.ndarray,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """[B, S] samples -> [B, T, num_ceps] MFCCs via the fused kernel.

    interpret=None auto-selects interpreter mode off-TPU (CI/tests)."""
    if interpret is None:
        # Decide by where the samples actually live (committed arrays), or
        # the default placement for uncommitted ones — a config global can
        # disagree with real placement in a mixed CPU/TPU process.
        if isinstance(samples, jax.Array):
            platform = next(iter(samples.devices())).platform
        else:
            default_dev = jax.config.jax_default_device
            platform = (
                default_dev.platform if default_dev is not None
                else jax.default_backend()
            )
        interpret = platform != "tpu"
    B, S = samples.shape
    T = num_frames(cfg, S)
    if T == 0:
        return jnp.zeros((B, 0, cfg.num_ceps), dtype=samples.dtype)

    cos_m, sin_m, mel_m, dct_m, lifter, window, n_ceps_pad = _constants(cfg)
    padded = cfg.padded_window_size

    # Framing gather outside the kernel: [B, T, padded] with zero tail
    from .frontend import frame_indices

    idx = frame_indices(cfg, S)
    frames = samples[:, jnp.asarray(idx)]  # [B, T, frame_length]
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded - cfg.frame_length)))

    kernel = functools.partial(_kernel, cfg=cfg)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, padded), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cos_m.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_m.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel_m.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dct_m.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(lifter.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(window.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, T, n_ceps_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, n_ceps_pad), jnp.float32),
        interpret=interpret,
    )(frames, cos_m, sin_m, mel_m, dct_m, lifter, window)
    return out[:, :, : cfg.num_ceps]
