"""FWGAN legacy vocoder (reference: dnn/fwgan.c).

Frame-wise GAN vocoder predating FARGAN: a feature upsampler + GRU +
seven framewise-conv stages synthesize 40-sample subframes, with
weighted-LPC synthesis, pre/de-emphasis and a pitch-phase embedding.

Note: fwgan.c is carried in the reference tree but excluded from every
build (no CMake/Makefile entry) and calls ``compute_gated_activation``
(nnet.h:93) which has no definition anywhere in the tree.  We implement
the standard gated-activation reading out = act(x) * sigmoid(W x + b)
(the GLU of nnet.c:102-115 with an activated passthrough), which
matches the layer naming (``*_gate``) and shapes.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from . import weights as wt
from .features import lpc_from_cepstrum
from .nnet import (ACTIVATION_LINEAR, ACTIVATION_TANH, LinearLayer,
                   _sigmoid, compute_activation, compute_generic_conv1d,
                   compute_generic_dense, compute_generic_gru,
                   conv1d_state)

FWGAN_CONT_SAMPLES = 320
NB_SUBFRAMES = 4
SUBFRAME_SIZE = 40
FWGAN_FRAME_SIZE = NB_SUBFRAMES * SUBFRAME_SIZE
CONT_PCM_INPUTS = 320
FWGAN_GAMMA = 0.92
FWGAN_DEEMPHASIS = 0.85
LPC_ORDER = 16
NB_FEATURES = 20 + 16        # 36-dim lpcnet features
NB_BANDS = 18


def compute_gated_activation(layer: LinearLayer, x: np.ndarray,
                             activation: int) -> np.ndarray:
    """out = act(x[:N]) * sigmoid(W x + b) — see module docstring."""
    gate = _sigmoid(layer.linear(np.asarray(x, np.float32)))
    n = layer.nb_outputs
    return (compute_activation(np.asarray(x[:n], np.float32), activation)
            * gate).astype(np.float32)


def pitch_embeddings(phase: np.ndarray, w0: float) -> np.ndarray:
    """Rotating unit phasor embedding (fwgan.c:44-72); updates phase,
    returns [2*SUBFRAME_SIZE] (imag then real halves)."""
    w2 = w0 * w0
    wreal = 1 - 0.5 * w2 * (1.0 - 0.083333333 * w2)
    wimag = w0 * (1 - 0.166666667 * w2 * (1.0 - 0.05 * w2))
    pembed = np.empty(2 * SUBFRAME_SIZE, np.float32)
    p0, p1 = float(phase[0]), float(phase[1])
    for i in range(SUBFRAME_SIZE):
        p0, p1 = p0 * wreal - p1 * wimag, p0 * wimag + p1 * wreal
        pembed[i] = p1
        pembed[SUBFRAME_SIZE + i] = p0
    r = 1.0 / np.sqrt(p0 * p0 + p1 * p1)
    phase[0], phase[1] = p0 * r, p1 * r
    return pembed


def compute_wlpc(features: np.ndarray) -> np.ndarray:
    """Bandwidth-expanded LPC from cepstrum (fwgan.c:74-83)."""
    lpc = lpc_from_cepstrum(features[:18])
    w = FWGAN_GAMMA ** np.arange(1, LPC_ORDER + 1)
    return (lpc * w).astype(np.float32)


class FwganModel:
    """Weight container (init_fwgan analogue); names mirror
    fwgan_data.h arrays."""

    LAYERS = ["bfcc_with_corr_upsampler_fc",
              "cont_net_0", "cont_net_2", "cont_net_4", "cont_net_6",
              "cont_net_8", "cont_net_10",
              "rnn_cont_fc_0", "fwc1_cont_fc_0", "fwc2_cont_fc_0",
              "fwc3_cont_fc_0", "fwc4_cont_fc_0", "fwc5_cont_fc_0",
              "fwc6_cont_fc_0", "fwc7_cont_fc_0",
              "feat_in_conv1_conv", "feat_in_nl1_gate",
              "rnn_gru_input", "rnn_gru_recurrent", "rnn_nl_gate",
              "fwc1_fc_0", "fwc1_fc_1_gate", "fwc2_fc_0", "fwc2_fc_1_gate",
              "fwc3_fc_0", "fwc3_fc_1_gate", "fwc4_fc_0", "fwc4_fc_1_gate",
              "fwc5_fc_0", "fwc5_fc_1_gate", "fwc6_fc_0", "fwc6_fc_1_gate",
              "fwc7_fc_0", "fwc7_fc_1_gate"]

    def __init__(self, arrays: Dict[str, wt.WeightArray]):
        self.layer = {}
        for name in self.LAYERS:
            nb_in, nb_out = wt.layer_dims(arrays, name)
            self.layer[name] = wt.linear_init(
                arrays, name, nb_in, nb_out,
                sparse=(name + "_weights_idx") in arrays,
                diagonal=(name + "_weights_diag") in arrays)

    @classmethod
    def from_blob(cls, blob: bytes) -> "FwganModel":
        return cls(wt.parse_weights(blob))


class FwganState:
    """FWGANState (fwgan.h:51-80)."""

    def __init__(self, model: FwganModel):
        self.model = model
        m = model.layer
        self.rnn_size = m["rnn_gru_recurrent"].nb_inputs
        self.reset()

    def reset(self):
        m = self.model.layer
        self.embed_phase = np.array([1.0, 0.0], np.float32)
        self.last_gain = 0.0
        self.last_lpc = np.zeros(LPC_ORDER, np.float32)
        self.syn_mem = np.zeros(LPC_ORDER, np.float32)
        self.preemph_mem = 0.0
        self.deemph_mem = 0.0
        self.pcm_buf = np.zeros(FWGAN_FRAME_SIZE - SUBFRAME_SIZE,
                                np.float32)
        self.cont = np.zeros(m["cont_net_10"].nb_outputs, np.float32)
        self.rnn_state = np.zeros(self.rnn_size, np.float32)
        self.fwc_state = [np.zeros(m[f"fwc{i}_cont_fc_0"].nb_outputs,
                                   np.float32) for i in range(1, 8)]
        self.cont_conv1_mem = conv1d_state(m["feat_in_conv1_conv"],
                                           self._feat_in_size())
        self.cont_initialized = 0

    def _feat_in_size(self) -> int:
        m = self.model.layer
        return m["bfcc_with_corr_upsampler_fc"].nb_outputs // 4 \
            + FWGAN_FRAME_SIZE // 2

    # -- continuation (fwgan.c:95-162) ---------------------------------

    def cont_init(self, pcm0: np.ndarray, features0: np.ndarray):
        m = self.model.layer
        self.embed_phase[0] = 1.0
        self.embed_phase[1] = 0.0
        lpc = compute_wlpc(features0)
        self.deemph_mem = float(pcm0[CONT_PCM_INPUTS - 1])
        wpcm0 = np.empty(CONT_PCM_INPUTS, np.float32)
        for i in range(LPC_ORDER, CONT_PCM_INPUTS):
            wpcm0[i] = pcm0[i] + float(
                lpc @ pcm0[i - LPC_ORDER:i][::-1])
        wpcm0[:LPC_ORDER] = wpcm0[LPC_ORDER]
        self.preemph_mem = float(wpcm0[CONT_PCM_INPUTS - 1])
        idx = CONT_PCM_INPUTS - 1 - np.arange(LPC_ORDER)
        self.syn_mem = (pcm0[idx]
                        - FWGAN_DEEMPHASIS * pcm0[idx - 1]).astype(
            np.float32)
        norm2 = float(wpcm0 @ wpcm0)
        cont_inputs = np.empty(CONT_PCM_INPUTS + 1, np.float32)
        cont_inputs[1:] = wpcm0 / np.sqrt(1e-8 + norm2)
        cont_inputs[0] = np.log(np.sqrt(norm2) + 1e-7)
        t = cont_inputs
        for name in ["cont_net_0", "cont_net_2", "cont_net_4",
                     "cont_net_6", "cont_net_8", "cont_net_10"]:
            t = compute_generic_dense(m[name], t, ACTIVATION_TANH)
        self.cont = t
        self.rnn_state = compute_generic_dense(
            m["rnn_cont_fc_0"], self.cont, ACTIVATION_TANH)
        for i in range(7):
            self.fwc_state[i] = compute_generic_dense(
                m[f"fwc{i + 1}_cont_fc_0"], self.cont, ACTIVATION_TANH)
        self.cont_initialized = 1
        new_pcm = self._synthesize_impl(lpc, features0)
        self.pcm_buf = new_pcm[SUBFRAME_SIZE:].copy()

    # -- per-subframe synthesis (fwgan.c:204-262) ----------------------

    def _apply_gain(self, pcm: np.ndarray, c0: float):
        gain = 10.0 ** (0.5 * c0 / np.sqrt(18.0))
        pcm *= self.last_gain
        self.last_gain = gain

    def _subframe(self, cond: np.ndarray, w0: float, lpc: np.ndarray,
                  c0: float) -> np.ndarray:
        m = self.model.layer
        pembed = pitch_embeddings(self.embed_phase, w0)
        up4 = m["bfcc_with_corr_upsampler_fc"].nb_outputs // 4
        feat_in = np.concatenate([pembed, cond[:up4]])
        rnn_in = compute_generic_conv1d(
            m["feat_in_conv1_conv"], self.cont_conv1_mem, feat_in,
            len(feat_in), ACTIVATION_LINEAR)
        rnn_in = compute_gated_activation(m["feat_in_nl1_gate"], rnn_in,
                                          ACTIVATION_TANH)
        if self.cont_initialized == 1:
            # first subframe: only the feat_in layer runs
            pcm = np.zeros(SUBFRAME_SIZE, np.float32)
            self.cont_initialized = 2
            self._apply_gain(pcm, c0)
            self.last_lpc = lpc.copy()
            return pcm
        self.rnn_state = compute_generic_gru(
            m["rnn_gru_input"], m["rnn_gru_recurrent"],
            self.rnn_state, rnn_in)
        t = compute_gated_activation(m["rnn_nl_gate"], self.rnn_state,
                                     ACTIVATION_TANH)
        for i in range(7):
            st = _ConvShim(self.fwc_state[i])
            t = compute_generic_conv1d(m[f"fwc{i + 1}_fc_0"], st, t,
                                       len(t), ACTIVATION_LINEAR)
            self.fwc_state[i] = st.mem
            t = compute_gated_activation(m[f"fwc{i + 1}_fc_1_gate"], t,
                                         ACTIVATION_TANH)
        pcm = t[:SUBFRAME_SIZE].copy()
        self._apply_gain(pcm, c0)
        # preemphasis (fwgan.c:187-194)
        for i in range(SUBFRAME_SIZE):
            tmp = pcm[i]
            pcm[i] -= FWGAN_DEEMPHASIS * self.preemph_mem
            self.preemph_mem = tmp
        # weighted-LPC synthesis with the previous frame's filter
        for i in range(SUBFRAME_SIZE):
            pcm[i] -= float(self.syn_mem @ self.last_lpc)
            self.syn_mem[1:] = self.syn_mem[:-1]
            self.syn_mem[0] = pcm[i]
        self.last_lpc = lpc.copy()
        # deemphasis
        for i in range(SUBFRAME_SIZE):
            pcm[i] += FWGAN_DEEMPHASIS * self.deemph_mem
            self.deemph_mem = pcm[i]
        return pcm

    def _synthesize_impl(self, lpc: np.ndarray,
                         features: np.ndarray) -> np.ndarray:
        m = self.model.layer
        f = np.empty(NB_FEATURES - 1, np.float32)
        f[:NB_FEATURES - 2] = features[:NB_FEATURES - 2]
        f[NB_FEATURES - 2] = features[NB_FEATURES - 1] + 0.5
        period = int(np.floor(0.1 + 50 * features[NB_BANDS] + 100))
        w0 = 2 * np.pi / period
        cond = compute_generic_dense(
            m["bfcc_with_corr_upsampler_fc"],
            f[:m["bfcc_with_corr_upsampler_fc"].nb_inputs],
            ACTIVATION_TANH)
        quarter = len(cond) // 4
        out = np.empty(FWGAN_FRAME_SIZE, np.float32)
        for s in range(NB_SUBFRAMES):
            out[s * SUBFRAME_SIZE:(s + 1) * SUBFRAME_SIZE] = \
                self._subframe(cond[s * quarter:(s + 1) * quarter], w0,
                               lpc, float(features[0]))
        return out

    def synthesize(self, features: np.ndarray) -> np.ndarray:
        """One 160-sample frame, with the one-subframe look-back
        buffering of fwgan.c:304-315."""
        lpc = compute_wlpc(features)
        new_pcm = self._synthesize_impl(lpc, features)
        out = np.concatenate([self.pcm_buf, new_pcm[:SUBFRAME_SIZE]])
        self.pcm_buf = new_pcm[SUBFRAME_SIZE:].copy()
        return out

    def synthesize_int(self, features: np.ndarray) -> np.ndarray:
        f = self.synthesize(features)
        return np.floor(0.5 + np.clip(32768.0 * f, -32767, 32767)) \
            .astype(np.int16)


class _ConvShim:
    """Adapts a flat fwc state vector to the Conv1dState interface:
    the framewise convs carry their full history as the state."""

    def __init__(self, mem: np.ndarray):
        self.mem = mem
        self.initialized = True
