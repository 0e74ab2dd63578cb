"""Neural pitch estimator (opus/dnn/pitchdnn.c).

Two conv2d stages over the cross-correlation features, two dense
layers over the instantaneous-frequency features, a downsampler dense,
a GRU and a final 192-way classifier; the estimate is the
probability-weighted average over +-2 bins around the argmax
(pitchdnn.c:42-57).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from . import weights as wt
from .nnet import (ACTIVATION_LINEAR, ACTIVATION_TANH, LinearLayer,
                   compute_activation, compute_generic_dense,
                   compute_generic_gru)

NB_XCORR_FEATURES = 224
PITCH_IF_FEATURES = 88


@dataclass
class Conv2dLayer:
    """Conv2dLayer (nnet.h:83-91): kernel [out_ch, in_ch, ktime, kheight],
    no height padding (callers pad), streaming over time."""
    weights: np.ndarray
    bias: Optional[np.ndarray]
    in_channels: int
    out_channels: int
    ktime: int
    kheight: int


def conv2d_init(arrays: Dict[str, wt.WeightArray], name: str,
                in_channels: int, out_channels: int, ktime: int,
                kheight: int) -> Conv2dLayer:
    """conv2d_init (parse_lpcnet_weights.c:180-205)."""
    n = in_channels * out_channels * ktime * kheight
    w = arrays.get(name + "_weight_float")
    if w is None:
        w = arrays.get(name + "_weights_float")
    if w is None or w.size != 4 * n:
        raise KeyError(f"{name}: conv2d weights missing")
    b = arrays.get(name + "_bias")
    return Conv2dLayer(
        w.data.view("<f4").reshape(out_channels, in_channels, ktime,
                                   kheight).copy(),
        b.data.view("<f4") if b is not None else None,
        in_channels, out_channels, ktime, kheight)


class Conv2dState:
    def __init__(self, layer: Conv2dLayer, height: int):
        self.mem = np.zeros((layer.ktime - 1, layer.in_channels,
                             height + layer.kheight - 1), np.float32)


def compute_conv2d(layer: Conv2dLayer, state: Conv2dState, x: np.ndarray,
                   height: int, activation: int) -> np.ndarray:
    """compute_conv2d (nnet_arch.h:215-242) for one time step.

    x: [in_channels, height + kheight - 1] (caller-padded in height).
    Returns [out_channels, height]; shifts the ktime history."""
    buf = np.concatenate([state.mem, x[None]], axis=0)
    if layer.ktime > 1:
        state.mem = buf[1:].copy()
    out = np.zeros((layer.out_channels, height), np.float32)
    for t in range(layer.ktime):
        for h in range(layer.kheight):
            # [out_ch, in_ch] @ [in_ch, height]
            out += layer.weights[:, :, t, h] @ buf[t][:, h:h + height]
    if layer.bias is not None:
        out += layer.bias[:, None]
    return compute_activation(out, activation)


class PitchDNN:
    """PitchDNNState + model (pitchdnn.c, pitchdnn.h).  Layer dims are
    derived from the blob; the export uses 3x3-in-height conv kernels
    with 8 channels (dnn/torch/neural-pitch)."""

    def __init__(self, arrays: Dict[str, wt.WeightArray]):
        a = arrays
        i1_in, i1_out = wt.layer_dims(a, "dense_if_upsampler_1",
                                      PITCH_IF_FEATURES)
        self.if_up1 = wt.linear_init(a, "dense_if_upsampler_1", i1_in, i1_out)
        i2_in, i2_out = wt.layer_dims(a, "dense_if_upsampler_2", i1_out)
        self.if_up2 = wt.linear_init(a, "dense_if_upsampler_2", i2_in, i2_out)
        self.conv1 = conv2d_init(a, "conv2d_1", 1, 8, 3, 3)
        self.conv2 = conv2d_init(a, "conv2d_2", 8, 1, 3, 3)
        d_in, d_out = wt.layer_dims(a, "dense_downsampler",
                                    NB_XCORR_FEATURES + i2_out)
        self.downsampler = wt.linear_init(a, "dense_downsampler", d_in, d_out)
        g_in, _ = wt.layer_dims(a, "gru_1_recurrent")
        self.gru_input = wt.linear_init(a, "gru_1_input", d_out, 3 * g_in)
        self.gru_recurrent = wt.linear_init(a, "gru_1_recurrent", g_in,
                                            3 * g_in)
        f_in, f_out = wt.layer_dims(a, "dense_final_upsampler", g_in)
        self.final = wt.linear_init(a, "dense_final_upsampler", f_in, f_out)
        self.reset()

    @classmethod
    def from_blob(cls, blob: bytes) -> "PitchDNN":
        return cls(wt.parse_weights(blob))

    def reset(self):
        self.gru_state = np.zeros(self.gru_recurrent.nb_inputs, np.float32)
        self.xcorr_mem1 = Conv2dState(self.conv1, NB_XCORR_FEATURES)
        self.xcorr_mem2 = Conv2dState(self.conv2, NB_XCORR_FEATURES)

    def compute(self, if_features: np.ndarray,
                xcorr_features: np.ndarray) -> float:
        """compute_pitchdnn (pitchdnn.c:13-57) -> dnn_pitch value."""
        if1 = compute_generic_dense(self.if_up1, if_features,
                                    ACTIVATION_TANH)
        if2 = compute_generic_dense(self.if_up2, if1, ACTIVATION_TANH)
        # xcorr path: pad by 1 on each side in height (conv1_tmp1[1+...])
        t1 = np.zeros((1, NB_XCORR_FEATURES + 2), np.float32)
        t1[0, 1:1 + NB_XCORR_FEATURES] = xcorr_features
        c1 = compute_conv2d(self.conv1, self.xcorr_mem1, t1,
                            NB_XCORR_FEATURES, ACTIVATION_TANH)
        t2 = np.zeros((8, NB_XCORR_FEATURES + 2), np.float32)
        t2[:, 1:1 + NB_XCORR_FEATURES] = c1
        c2 = compute_conv2d(self.conv2, self.xcorr_mem2, t2,
                            NB_XCORR_FEATURES, ACTIVATION_TANH)
        down_in = np.concatenate([c2.reshape(-1), if2])
        down = compute_generic_dense(self.downsampler, down_in,
                                     ACTIVATION_TANH)
        self.gru_state = compute_generic_gru(self.gru_input,
                                             self.gru_recurrent,
                                             self.gru_state, down)
        out = compute_generic_dense(self.final, self.gru_state,
                                    ACTIVATION_LINEAR)
        pos = int(np.argmax(out[:180]))
        lo, hi = max(0, pos - 2), min(179, pos + 2)
        p = np.exp(out[lo:hi + 1])
        return float((1.0 / 60.0) * (np.dot(p, np.arange(lo, hi + 1))
                                     / np.sum(p)) - 1.5)
