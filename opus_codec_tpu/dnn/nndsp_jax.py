"""Batched JAX adaptive NN-DSP layers — the device twin of ``nndsp.py``.

adaconv / adacomb / adashape (opus/dnn/nndsp.c:132-416) for ``[B, ...]``
stream batches: feature-conditioned FIRs as static-tap accumulations
(kernel sizes are compile-time constants, so each filter is K fused
multiply-adds over shifted views — XLA turns these into a handful of
vector ops), and the comb filter's per-stream pitch lag as one dynamic
gather.  States are functional NamedTuples; the scalar NumPy module is
the validated ground truth.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .nnet_jax import (JaxLinear, activation, conv1d, dense, linear)
from .nnet import (ACTIVATION_LINEAR, ACTIVATION_RELU, ACTIVATION_TANH)

ADACOMB_MAX_LAG = 300

__all__ = [
    "ADACOMB_MAX_LAG", "overlap_window", "AdaConvState", "adaconv_init",
    "adaconv_frame", "AdaCombState", "adacomb_init", "adacomb_frame",
    "AdaShapeState", "adashape_init", "adashape_frame",
]


def overlap_window(overlap_size: int) -> np.ndarray:
    """nndsp.c:62-70: raised-cosine fade-out."""
    i = np.arange(overlap_size)
    return (0.5 + 0.5 * np.cos(np.pi * (i + 0.5) / overlap_size)
            ).astype(np.float32)


def _scale_kernel(kernel, gain):
    """nndsp.c:81-116: kernel [B, out, in, k] L2-normalised per out
    channel, times gain [B, out]."""
    norm = jnp.sqrt(jnp.sum(kernel * kernel, axis=(2, 3)))
    return kernel * (gain / (1e-6 + norm))[:, :, None, None]


def _fir_static(kernel, seg, n: int):
    """out[..., i] = sum_j kernel[..., j] * seg[..., i + j] with a
    static kernel size (celt_pitch_xcorr semantics)."""
    K = kernel.shape[-1]
    acc = kernel[..., 0:1] * seg[..., 0:n]
    for j in range(1, K):
        acc = acc + kernel[..., j:j + 1] * seg[..., j:j + n]
    return acc


class AdaConvState(NamedTuple):
    history: jnp.ndarray       # [B, Cin, K]
    last_kernel: jnp.ndarray   # [B, Cout, Cin, K]


def adaconv_init(B: int, in_ch: int, out_ch: int, K: int,
                 dtype=jnp.float32) -> AdaConvState:
    return AdaConvState(
        history=jnp.zeros((B, in_ch, K), dtype),
        last_kernel=jnp.zeros((B, out_ch, in_ch, K), dtype))


def adaconv_frame(state: AdaConvState, x_in, features,
                  kernel_layer: JaxLinear, gain_layer: JaxLinear,
                  frame_size: int, overlap_size: int, in_ch: int,
                  out_ch: int, K: int, gain_a: float, gain_b: float,
                  window):
    """nndsp.c:132-240 batched.  x_in [B, in_ch*frame_size]
    channel-major -> ([B, out_ch*frame_size], new state)."""
    B = x_in.shape[0]
    x = x_in.reshape(B, in_ch, frame_size)
    buf = jnp.concatenate([state.history, x], axis=2)

    raw = linear(kernel_layer, features)
    kernel = raw.reshape(B, out_ch, in_ch, K)
    gains = jnp.exp(gain_a * jnp.tanh(linear(gain_layer, features))
                    + gain_b)
    kernel = _scale_kernel(kernel, gains)

    seg = buf[:, None, :, 1:]                       # [B, 1, Cin, F+K-1]
    y_last = jnp.sum(_fir_static(state.last_kernel, seg, overlap_size),
                     axis=2)                        # [B, Cout, overlap]
    y_new = jnp.sum(_fir_static(kernel, seg, frame_size), axis=2)
    w = window[None, None, :]
    head = w * y_last + (1 - w) * y_new[:, :, :overlap_size]
    out = jnp.concatenate([head, y_new[:, :, overlap_size:]], axis=2)
    return out.reshape(B, -1), AdaConvState(
        history=buf[:, :, frame_size:], last_kernel=kernel)


class AdaCombState(NamedTuple):
    history: jnp.ndarray        # [B, K + MAX_LAG]
    last_kernel: jnp.ndarray    # [B, K]
    last_global_gain: jnp.ndarray   # [B]
    last_pitch_lag: jnp.ndarray     # [B] int32


def adacomb_init(B: int, K: int, dtype=jnp.float32) -> AdaCombState:
    return AdaCombState(
        history=jnp.zeros((B, K + ADACOMB_MAX_LAG), dtype),
        last_kernel=jnp.zeros((B, K), dtype),
        last_global_gain=jnp.zeros((B,), dtype),
        last_pitch_lag=jnp.zeros((B,), jnp.int32))


def adacomb_frame(state: AdaCombState, x_in, features,
                  kernel_layer: JaxLinear, gain_layer: JaxLinear,
                  global_gain_layer: JaxLinear, pitch_lag,
                  frame_size: int, overlap_size: int, K: int,
                  gain_a: float, gain_b: float, log_gain_limit: float,
                  window):
    """nndsp.c:242-336 batched.  pitch_lag [B] int32."""
    B = x_in.shape[0]
    buf = jnp.concatenate([state.history, x_in], axis=1)
    p = K + ADACOMB_MAX_LAG

    kernel = linear(kernel_layer, features)          # [B, K]
    gain = jnp.exp(
        log_gain_limit
        - jnp.maximum(linear(gain_layer, features)[:, 0], 0.0))
    ggain = jnp.tanh(linear(global_gain_layer, features)[:, 0])
    global_gain = jnp.exp(gain_a * ggain + gain_b)
    kernel = _scale_kernel(kernel[:, None, None, :],
                           gain[:, None])[:, 0, 0, :]

    # dynamic windows: start = p - (K-1) - lag, length frame + K - 1
    ar = np.arange(frame_size + K - 1)
    idx_new = (p - K + 1 - pitch_lag)[:, None] + ar[None, :]
    seg_new = jnp.take_along_axis(buf, idx_new, axis=1)
    idx_last = (p - K + 1 - state.last_pitch_lag)[:, None] + ar[None, :]
    seg_last = jnp.take_along_axis(buf, idx_last, axis=1)

    y_last = _fir_static(state.last_kernel, seg_last, overlap_size)
    y_new = _fir_static(kernel, seg_new, frame_size)
    w = window[None, :]
    lg = state.last_global_gain[:, None]
    gg = global_gain[:, None]
    head = lg * w * y_last + gg * (1 - w) * y_new[:, :overlap_size] \
        + (w * lg + (1 - w) * gg) * x_in[:, :overlap_size]
    tail = gg * (y_new[:, overlap_size:] + x_in[:, overlap_size:])
    out = jnp.concatenate([head, tail], axis=1)
    new_state = AdaCombState(
        history=buf[:, buf.shape[1] - (K + ADACOMB_MAX_LAG):],
        last_kernel=kernel, last_global_gain=global_gain,
        last_pitch_lag=pitch_lag.astype(jnp.int32))
    return out, new_state


class AdaShapeState(NamedTuple):
    mem_alpha1f: jnp.ndarray
    mem_alpha1t: jnp.ndarray
    mem_alpha2: jnp.ndarray


def adashape_init(B: int, alpha1f: JaxLinear, alpha1t: JaxLinear,
                  alpha2: JaxLinear, feature_dim: int, frame_size: int,
                  avg_pool_k: int, dtype=jnp.float32) -> AdaShapeState:
    from .nnet_jax import conv1d_init
    return AdaShapeState(
        mem_alpha1f=conv1d_init(B, alpha1f.W.shape[1], feature_dim,
                                dtype=dtype),
        mem_alpha1t=conv1d_init(B, alpha1t.W.shape[1],
                                frame_size // avg_pool_k + 1,
                                dtype=dtype),
        mem_alpha2=conv1d_init(B, alpha2.W.shape[1], frame_size,
                               dtype=dtype))


def adashape_frame(state: AdaShapeState, x_in, features,
                   alpha1f: JaxLinear, alpha1t: JaxLinear,
                   alpha2: JaxLinear, feature_dim: int,
                   frame_size: int, avg_pool_k: int):
    """nndsp.c:338-416 batched.  x_in [B, frame_size]."""
    B = x_in.shape[0]
    tenv_size = frame_size // avg_pool_k
    tenv = jnp.log(jnp.mean(
        jnp.abs(x_in.reshape(B, tenv_size, avg_pool_k)), axis=2)
        + 1.52587890625e-05)
    mean = jnp.mean(tenv, axis=1, keepdims=True)
    tenv = jnp.concatenate([tenv - mean, mean], axis=1)

    a1f, m1f = conv1d(alpha1f, state.mem_alpha1f, features,
                      feature_dim, ACTIVATION_LINEAR)
    a1t, m1t = conv1d(alpha1t, state.mem_alpha1t, tenv,
                      tenv_size + 1, ACTIVATION_LINEAR)
    tmp = a1f + a1t
    tmp = jnp.where(tmp >= 0, tmp, 0.2 * tmp)
    a2, m2 = conv1d(alpha2, state.mem_alpha2, tmp, frame_size,
                    ACTIVATION_LINEAR)
    out = jnp.exp(a2) * x_in
    return out, AdaShapeState(mem_alpha1f=m1f, mem_alpha1t=m1t,
                              mem_alpha2=m2)
