"""FARGAN vocoder — the neural synthesis engine behind deep PLC.

Faithful re-implementation of opus/dnn/fargan.c:

* compute_fargan_cond (fargan.c:43-60): pitch-period embedding (clamped
  period-32 in [0,223]) concatenated with the 20 LPCNet features,
  fdense1(tanh) -> fconv1(ksize 2, tanh) -> fdense2(tanh) producing
  4 subframes' worth of conditioning.
* run_fargan_subframe (fargan.c:69-140): gain = exp(dense(cond));
  pitch prediction taps pred[i] from pitch_buf at PITCH_MAX_PERIOD-period-2
  with wraparound; fwc0 conv+GLU; pitch_gate = sigmoid(dense(…))[4];
  three GRU+GLU stages each fed [prev_act, gate_k*pred[2:42], prev];
  skip dense+GLU over the concatenated activations; sig_dense_out(tanh)
  scaled by gain; pitch_buf shift-in of the *pre-deemphasis* signal;
  per-sample deemphasis y[i] = x[i] + 0.85*y[i-1].
* fargan_cont (fargan.c:143-172): prime conditioning with 5 feature
  frames, pre-emphasise the 2-frame continuation PCM, teacher-force the
  4 subframes.

Layer dims are derived from the weight blob (the reference hard-codes
them in generated fargan_data.h, which is produced from the same blob).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict

import numpy as np

from . import weights as wt
from .nnet import (ACTIVATION_LINEAR, ACTIVATION_SIGMOID, ACTIVATION_TANH,
                   Conv1dState, LinearLayer, compute_generic_conv1d,
                   compute_generic_dense, compute_generic_gru, compute_glu,
                   conv1d_state)

NB_FEATURES = 20          # dnn/lpcnet.h:32
NB_BANDS = 18             # dnn/freq.h:48
PITCH_MAX_PERIOD = 256    # dnn/pitchdnn.h:10
FARGAN_CONT_SAMPLES = 320  # fargan.h:34
FARGAN_NB_SUBFRAMES = 4
FARGAN_SUBFRAME_SIZE = 40
FARGAN_FRAME_SIZE = FARGAN_NB_SUBFRAMES * FARGAN_SUBFRAME_SIZE
FARGAN_DEEMPHASIS = 0.85


def features_to_period(features: np.ndarray) -> int:
    """fargan.c:152,202: decode pitch period from feature NB_BANDS."""
    return int(np.floor(
        0.5 + 256.0 / 2.0 ** ((1.0 / 60.0)
                              * ((float(features[NB_BANDS]) + 1.5) * 60))))


class FarganModel:
    """Weight container bound by name from a blob (fargan.c:176-196)."""

    def __init__(self, arrays: Dict[str, wt.WeightArray]):
        a = arrays
        self.pembed = wt.embedding_init(a, "cond_net_pembed", 224)
        pembed_dim = self.pembed.shape[1]
        d1_in, d1_out = wt.layer_dims(a, "cond_net_fdense1",
                                      NB_FEATURES + pembed_dim)
        if d1_in != NB_FEATURES + pembed_dim:
            raise ValueError("cond_net_fdense1 dims inconsistent")
        self.fdense1 = wt.linear_init(a, "cond_net_fdense1", d1_in, d1_out)
        c1_in, c1_out = wt.layer_dims(a, "cond_net_fconv1")
        self.fconv1 = wt.linear_init(a, "cond_net_fconv1", c1_in, c1_out)
        self.fconv1_input = d1_out
        d2_in, d2_out = wt.layer_dims(a, "cond_net_fdense2", c1_out)
        self.fdense2 = wt.linear_init(a, "cond_net_fdense2", d2_in, d2_out)
        if d2_out % FARGAN_NB_SUBFRAMES:
            raise ValueError("fdense2 output not divisible by 4")
        self.cond_size = d2_out // FARGAN_NB_SUBFRAMES

        self.gain_dense = wt.linear_init(a, "sig_net_cond_gain_dense",
                                         self.cond_size, 1)
        self.input_size = self.cond_size + 2 * FARGAN_SUBFRAME_SIZE + 4
        fw_in, fw_out = wt.layer_dims(a, "sig_net_fwc0_conv")
        self.fwc0_conv = wt.linear_init(a, "sig_net_fwc0_conv", fw_in, fw_out)
        self.fwc0_glu = self._glu(a, "sig_net_fwc0_glu_gate", fw_out)
        self.gain_dense_out = wt.linear_init(a, "sig_net_gain_dense_out",
                                             fw_out, 4)
        self.gru = []
        self.gru_glu = []
        prev_out = fw_out
        for k in (1, 2, 3):
            rec_in, rec_out = wt.layer_dims(
                a, f"sig_net_gru{k}_recurrent")
            N = rec_in
            in_in = prev_out + 2 * FARGAN_SUBFRAME_SIZE
            gi = wt.linear_init(a, f"sig_net_gru{k}_input", in_in, 3 * N,
                                sparse=self._is_sparse(a,
                                                       f"sig_net_gru{k}_input"))
            gr = wt.linear_init(a, f"sig_net_gru{k}_recurrent", N, 3 * N,
                                sparse=self._is_sparse(
                                    a, f"sig_net_gru{k}_recurrent"),
                                diagonal=self._has_diag(
                                    a, f"sig_net_gru{k}_recurrent"))
            self.gru.append((gi, gr))
            self.gru_glu.append(self._glu(a, f"sig_net_gru{k}_glu_gate", N))
            prev_out = N
        skip_in = (self.gru[0][1].nb_inputs + self.gru[1][1].nb_inputs
                   + self.gru[2][1].nb_inputs + fw_out
                   + 2 * FARGAN_SUBFRAME_SIZE)
        s_in, s_out = wt.layer_dims(a, "sig_net_skip_dense", skip_in)
        self.skip_dense = wt.linear_init(
            a, "sig_net_skip_dense", s_in, s_out,
            sparse=self._is_sparse(a, "sig_net_skip_dense"))
        self.skip_glu = self._glu(a, "sig_net_skip_glu_gate", s_out)
        self.sig_dense_out = wt.linear_init(a, "sig_net_sig_dense_out",
                                            s_out, FARGAN_SUBFRAME_SIZE)

    @staticmethod
    def _is_sparse(a, name):
        return (name + "_weights_idx") in a

    @staticmethod
    def _has_diag(a, name):
        return (name + "_weights_diag") in a

    def _glu(self, a, name, n) -> LinearLayer:
        return wt.linear_init(a, name, n, n,
                              sparse=self._is_sparse(a, name))

    @classmethod
    def from_blob(cls, blob: bytes) -> "FarganModel":
        return cls(wt.parse_weights(blob))


@dataclass
class FarganState:
    """FARGANState (fargan.h:46-60)."""
    model: FarganModel
    cond_conv1_state: Conv1dState = None
    fwc0_mem: Conv1dState = None
    gru_state: list = None
    pitch_buf: np.ndarray = None
    deemph_mem: float = 0.0
    last_period: int = 0
    cont_initialized: bool = False

    def __post_init__(self):
        m = self.model
        self.cond_conv1_state = conv1d_state(m.fconv1, m.fconv1_input)
        self.fwc0_mem = conv1d_state(m.fwc0_conv, m.input_size)
        self.gru_state = [np.zeros(gr.nb_inputs, np.float32)
                          for _, gr in m.gru]
        self.pitch_buf = np.zeros(PITCH_MAX_PERIOD, np.float32)

    # ------------------------------------------------------------------
    def _cond(self, features: np.ndarray, period: int) -> np.ndarray:
        """compute_fargan_cond (fargan.c:43-60)."""
        m = self.model
        row = max(0, min(period - 32, 223))
        dense_in = np.concatenate([
            np.asarray(features[:NB_FEATURES], np.float32),
            m.pembed[row]])
        x = compute_generic_dense(m.fdense1, dense_in, ACTIVATION_TANH)
        x = compute_generic_conv1d(m.fconv1, self.cond_conv1_state, x,
                                   m.fconv1_input, ACTIVATION_TANH)
        return compute_generic_dense(m.fdense2, x, ACTIVATION_TANH)

    def _subframe(self, cond: np.ndarray, period: int) -> np.ndarray:
        """run_fargan_subframe (fargan.c:69-140). Returns 40 samples
        after deemphasis; updates pitch_buf with pre-deemphasis pcm."""
        m = self.model
        SUB = FARGAN_SUBFRAME_SIZE
        gain = float(np.exp(compute_generic_dense(
            m.gain_dense, cond, ACTIVATION_LINEAR)[0]))
        gain_1 = 1.0 / (1e-5 + gain)

        pred = np.empty(SUB + 4, np.float32)
        pos = PITCH_MAX_PERIOD - period - 2
        for i in range(SUB + 4):
            pred[i] = min(1.0, max(-1.0,
                                   gain_1 * self.pitch_buf[max(0, pos)]))
            pos += 1
            if pos == PITCH_MAX_PERIOD:
                pos -= period
        prev = np.clip(gain_1 * self.pitch_buf[PITCH_MAX_PERIOD - SUB:],
                       -1.0, 1.0).astype(np.float32)

        fwc0_in = np.concatenate([cond[:m.cond_size], pred, prev])
        act = compute_generic_conv1d(m.fwc0_conv, self.fwc0_mem, fwc0_in,
                                     m.input_size, ACTIVATION_TANH)
        act = compute_glu(m.fwc0_glu, act)
        pitch_gate = compute_generic_dense(m.gain_dense_out, act,
                                           ACTIVATION_SIGMOID)
        for k in range(3):
            gi, gr = m.gru[k]
            gru_in = np.concatenate([act, pitch_gate[k] * pred[2:2 + SUB],
                                     prev])
            self.gru_state[k] = compute_generic_gru(gi, gr,
                                                    self.gru_state[k], gru_in)
            new_act = compute_glu(m.gru_glu[k], self.gru_state[k])
            if k == 0:
                skip1 = new_act
            elif k == 1:
                skip2 = new_act
            else:
                skip3 = new_act
            if k == 0:
                fwc0_act = act
            act = new_act
        skip_cat = np.concatenate([
            skip1, skip2, skip3, fwc0_act,
            pitch_gate[3] * pred[2:2 + SUB], prev])
        skip = compute_generic_dense(m.skip_dense, skip_cat, ACTIVATION_TANH)
        skip = compute_glu(m.skip_glu, skip)
        pcm = gain * compute_generic_dense(m.sig_dense_out, skip,
                                           ACTIVATION_TANH)
        self.pitch_buf[:-SUB] = self.pitch_buf[SUB:]
        self.pitch_buf[-SUB:] = pcm
        # fargan_deemphasis (fargan.c:62-67): y[i] = x[i] + a*y[i-1]
        out = np.empty(SUB, np.float32)
        mem = self.deemph_mem
        for i in range(SUB):
            mem = pcm[i] + FARGAN_DEEMPHASIS * mem
            out[i] = mem
        self.deemph_mem = mem
        return out

    # ------------------------------------------------------------------
    def cont(self, pcm0: np.ndarray, features0: np.ndarray) -> None:
        """fargan_cont (fargan.c:143-172): prime the vocoder from the
        last FARGAN_CONT_SAMPLES of good PCM + 5 feature frames."""
        period = 0
        cond = None
        feats = np.asarray(features0, np.float32).reshape(5, -1)
        for i in range(5):
            self.last_period = period
            period = features_to_period(feats[i])
            cond = self._cond(feats[i], period)
        x0 = np.empty(FARGAN_CONT_SAMPLES, np.float32)
        pcm0 = np.asarray(pcm0, np.float32)
        x0[0] = 0.0
        x0[1:] = pcm0[1:] - FARGAN_DEEMPHASIS * pcm0[:-1]
        self.pitch_buf[PITCH_MAX_PERIOD - FARGAN_FRAME_SIZE:] = \
            x0[:FARGAN_FRAME_SIZE]
        self.cont_initialized = True
        for i in range(FARGAN_NB_SUBFRAMES):
            self._subframe(cond[i * self.model.cond_size:
                                (i + 1) * self.model.cond_size],
                           self.last_period)
            # Teacher-force: overwrite pitch_buf tail with the true signal.
            self.pitch_buf[PITCH_MAX_PERIOD - FARGAN_SUBFRAME_SIZE:] = \
                x0[FARGAN_FRAME_SIZE + i * FARGAN_SUBFRAME_SIZE:
                   FARGAN_FRAME_SIZE + (i + 1) * FARGAN_SUBFRAME_SIZE]
        self.deemph_mem = float(pcm0[-1])

    def synthesize(self, features: np.ndarray) -> np.ndarray:
        """fargan_synthesize (fargan.c:197-215): one 160-sample frame."""
        if not self.cont_initialized:
            raise RuntimeError("fargan_cont must be called first")
        features = np.asarray(features, np.float32)
        period = features_to_period(features)
        cond = self._cond(features, period)
        out = np.empty(FARGAN_FRAME_SIZE, np.float32)
        for sub in range(FARGAN_NB_SUBFRAMES):
            out[sub * FARGAN_SUBFRAME_SIZE:
                (sub + 1) * FARGAN_SUBFRAME_SIZE] = \
                self._subframe(cond[sub * self.model.cond_size:
                                    (sub + 1) * self.model.cond_size],
                               self.last_period)
        self.last_period = period
        return out

    def synthesize_int(self, features: np.ndarray) -> np.ndarray:
        """fargan_synthesize_int (fargan.c:217-224)."""
        f = self.synthesize(features)
        return np.floor(0.5 + np.clip(32768.0 * f, -32767, 32767)
                        ).astype(np.int16)
