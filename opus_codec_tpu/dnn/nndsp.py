"""Adaptive NN-DSP layers used by OSCE (opus/dnn/nndsp.c):

* adaconv — feature-conditioned short FIR per frame, cross-faded with
  the previous frame's kernel over an overlap window;
* adacomb — feature-conditioned comb (pitch-lag) filter with global
  gain cross-fade;
* adashape — temporal-envelope-conditioned gain shaping.

Kernels are L2-normalised then scaled by learned gains
(scale_kernel, nndsp.c:81-116); gains pass through
exp(a*x + b) (transform_gains, nndsp.c:118-131).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .nnet import (ACTIVATION_LINEAR, ACTIVATION_RELU, ACTIVATION_TANH,
                   Conv1dState, LinearLayer, compute_generic_conv1d,
                   compute_generic_dense)

ADACOMB_MAX_LAG = 300


def compute_overlap_window(overlap_size: int) -> np.ndarray:
    """nndsp.c:62-70: raised-cosine fade-out."""
    i = np.arange(overlap_size)
    return (0.5 + 0.5 * np.cos(np.pi * (i + 0.5) / overlap_size)
            ).astype(np.float32)


def _scale_kernel(kernel: np.ndarray, gain: np.ndarray) -> np.ndarray:
    """scale_kernel (nndsp.c:81-116): kernel [out, in, k], per-out-channel
    L2 normalisation times gain."""
    norm = np.sqrt(np.sum(kernel ** 2, axis=(1, 2)))
    return kernel * (gain / (1e-6 + norm))[:, None, None]


def _fir(kernel: np.ndarray, x: np.ndarray, n: int) -> np.ndarray:
    """celt_pitch_xcorr semantics: out[i] = sum_j kernel[j] * x[i+j]."""
    k = len(kernel)
    out = np.zeros(n, np.float32)
    for j in range(k):
        out += kernel[j] * x[j:j + n]
    return out


@dataclass
class AdaConvState:
    """AdaConvState (nndsp.h:58-63)."""
    history: np.ndarray = None     # [in_channels, kernel_size]
    last_kernel: np.ndarray = None  # [out, in, k]
    initialized: bool = False


def adaconv_process_frame(state: AdaConvState, x_in: np.ndarray,
                          features: np.ndarray,
                          kernel_layer: LinearLayer,
                          gain_layer: LinearLayer,
                          frame_size: int, overlap_size: int,
                          in_channels: int, out_channels: int,
                          kernel_size: int, filter_gain_a: float,
                          filter_gain_b: float,
                          window: np.ndarray) -> np.ndarray:
    """adaconv_process_frame (nndsp.c:132-240).  x_in: [in_channels *
    frame_size] channel-major; returns [out_channels * frame_size]."""
    if not state.initialized:
        state.history = np.zeros((in_channels, kernel_size), np.float32)
        state.last_kernel = np.zeros((out_channels, in_channels,
                                      kernel_size), np.float32)
        state.initialized = True
    x_in = np.asarray(x_in, np.float32).reshape(in_channels, frame_size)
    buf = np.concatenate([state.history, x_in], axis=1)

    raw = compute_generic_dense(kernel_layer, features, ACTIVATION_LINEAR)
    kernel = raw.reshape(out_channels, in_channels, kernel_size)
    gains = compute_generic_dense(gain_layer, features, ACTIVATION_TANH)
    gains = np.exp(filter_gain_a * gains + filter_gain_b)
    kernel = _scale_kernel(kernel, gains)

    left_padding = kernel_size - 1
    out = np.zeros((out_channels, frame_size), np.float32)
    for o in range(out_channels):
        for c in range(in_channels):
            # input segment starting left_padding before the new frame
            seg = buf[c, kernel_size - left_padding:]
            y_last = _fir(state.last_kernel[o, c], seg, overlap_size)
            y_new = _fir(kernel[o, c], seg, frame_size)
            out[o, :overlap_size] += (window * y_last
                                      + (1 - window)
                                      * y_new[:overlap_size])
            out[o, overlap_size:] += y_new[overlap_size:]
    state.history = buf[:, frame_size:].copy()
    state.last_kernel = kernel
    return out.reshape(-1)


@dataclass
class AdaCombState:
    """AdaCombState (nndsp.h:65-71)."""
    history: np.ndarray = None     # [kernel_size + MAX_LAG]
    last_kernel: np.ndarray = None
    last_global_gain: float = 0.0
    last_pitch_lag: int = 0
    initialized: bool = False


def adacomb_process_frame(state: AdaCombState, x_in: np.ndarray,
                          features: np.ndarray,
                          kernel_layer: LinearLayer,
                          gain_layer: LinearLayer,
                          global_gain_layer: LinearLayer,
                          pitch_lag: int, frame_size: int,
                          overlap_size: int, kernel_size: int,
                          filter_gain_a: float, filter_gain_b: float,
                          log_gain_limit: float,
                          window: np.ndarray) -> np.ndarray:
    """adacomb_process_frame (nndsp.c:242-336)."""
    if not state.initialized:
        state.history = np.zeros(kernel_size + ADACOMB_MAX_LAG, np.float32)
        state.last_kernel = np.zeros(kernel_size, np.float32)
        state.initialized = True
    x_in = np.asarray(x_in, np.float32)
    buf = np.concatenate([state.history, x_in])
    p = kernel_size + ADACOMB_MAX_LAG    # index of frame start in buf

    kernel = compute_generic_dense(kernel_layer, features,
                                   ACTIVATION_LINEAR)
    gain = compute_generic_dense(gain_layer, features, ACTIVATION_RELU)[0]
    ggain = compute_generic_dense(global_gain_layer, features,
                                  ACTIVATION_TANH)[0]
    gain = np.exp(log_gain_limit - gain)
    global_gain = float(np.exp(filter_gain_a * ggain + filter_gain_b))
    kernel = _scale_kernel(kernel.reshape(1, 1, -1),
                           np.array([gain]))[0, 0]

    left_padding = kernel_size - 1
    y_last = _fir(state.last_kernel,
                  buf[p - left_padding - state.last_pitch_lag:],
                  overlap_size)
    y_new = _fir(kernel, buf[p - left_padding - pitch_lag:], frame_size)
    out = np.empty(frame_size, np.float32)
    w = window
    out[:overlap_size] = (state.last_global_gain * w * y_last
                          + global_gain * (1 - w) * y_new[:overlap_size])
    out[:overlap_size] += (w * state.last_global_gain
                           + (1 - w) * global_gain) * x_in[:overlap_size]
    out[overlap_size:] = global_gain * (y_new[overlap_size:]
                                        + x_in[overlap_size:])
    state.last_kernel = kernel.copy()
    state.history = buf[len(buf) - (kernel_size + ADACOMB_MAX_LAG):].copy()
    state.last_pitch_lag = pitch_lag
    state.last_global_gain = global_gain
    return out


@dataclass
class AdaShapeState:
    """AdaShapeState (nndsp.h:73-77)."""
    conv_alpha1f: Conv1dState = None
    conv_alpha1t: Conv1dState = None
    conv_alpha2: Conv1dState = None


def adashape_process_frame(state: AdaShapeState, x_in: np.ndarray,
                           features: np.ndarray,
                           alpha1f: LinearLayer, alpha1t: LinearLayer,
                           alpha2: LinearLayer, feature_dim: int,
                           frame_size: int, avg_pool_k: int
                           ) -> np.ndarray:
    """adashape_process_frame (nndsp.c:338-416): multiplicative gain
    shaping from features + temporal envelope."""
    from .nnet import conv1d_state
    if state.conv_alpha1f is None:
        state.conv_alpha1f = conv1d_state(alpha1f, feature_dim)
        state.conv_alpha1t = conv1d_state(alpha1t,
                                          frame_size // avg_pool_k + 1)
        state.conv_alpha2 = conv1d_state(alpha2, frame_size)
    x_in = np.asarray(x_in, np.float32)
    tenv_size = frame_size // avg_pool_k
    tenv = np.log(np.mean(np.abs(x_in.reshape(tenv_size, avg_pool_k)),
                          axis=1) + 1.52587890625e-05)
    mean = float(np.mean(tenv))
    tenv = np.concatenate([tenv - mean, [mean]]).astype(np.float32)

    a1f = compute_generic_conv1d(alpha1f, state.conv_alpha1f, features,
                                 feature_dim, ACTIVATION_LINEAR)
    a1t = compute_generic_conv1d(alpha1t, state.conv_alpha1t, tenv,
                                 tenv_size + 1, ACTIVATION_LINEAR)
    tmp = a1f + a1t
    tmp = np.where(tmp >= 0, tmp, 0.2 * tmp).astype(np.float32)
    a2 = compute_generic_conv1d(alpha2, state.conv_alpha2, tmp,
                                frame_size, ACTIVATION_LINEAR)
    return (np.exp(a2) * x_in).astype(np.float32)
