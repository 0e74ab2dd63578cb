"""DRED RDO-VAE: the deep-redundancy latent codec.

Re-implements opus/dnn/dred_rdovae_enc.c and dred_rdovae_dec.c.

Encoder (dred_rdovae_enc.c:48-110): a growing concatenation buffer —
dense1(tanh), then 5 rounds of [GRU -> state appended -> dilated
conv1d(tanh) over the whole buffer]; enc_zdense produces the (padded)
latents, gdense1(tanh)+gdense2 produce the (padded) initial decoder
state.  Conv dilations: 1,2,2,2,2.

Decoder (dred_rdovae_dec.c:63-139): dec_hidden_init(tanh) +
dec_gru_init(tanh) split across the 5 GRU states; per quadruple-frame:
dense1(tanh) then 5 rounds of [GRU -> GLU appended -> conv1d(tanh)],
all dilation 1; dec_output produces 4 concatenated feature frames in
reverse order.

Layer dims are derived from the weight blob rather than hard-coded
(the reference hard-codes them in generated *_data.h from the same
blob, e.g. export_rdovae_weights.py:272-280).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from . import weights as wt
from .nnet import (ACTIVATION_LINEAR, ACTIVATION_TANH, Conv1dState,
                   compute_generic_conv1d, compute_generic_dense,
                   compute_generic_gru, compute_glu, conv1d_state)

DRED_NUM_FEATURES = 20
DRED_FRAME_SIZE = 160       # dred_config.h:43
ENC_CONV_DILATIONS = (1, 2, 2, 2, 2)


def _bind(a, name, nb_in, nb_out=None):
    if nb_out is None:
        nb_in, nb_out = wt.layer_dims(a, name, nb_in)
    return wt.linear_init(
        a, name, nb_in, nb_out,
        sparse=(name + "_weights_idx") in a,
        diagonal=(name + "_weights_diag") in a)


class RDOVAEEncoder:
    """RDOVAEEnc + RDOVAEEncState (dred_rdovae_enc.c)."""

    def __init__(self, arrays: Dict[str, wt.WeightArray],
                 latent_dim: int = None, state_dim: int = None):
        a = arrays
        d1_in, d1_out = wt.layer_dims(a, "enc_dense1")
        self.dense1 = _bind(a, "enc_dense1", d1_in, d1_out)
        self.num_features = d1_in // 2   # input is a double feature frame
        self.gru = []
        self.conv = []
        buf = d1_out
        for k in range(1, 6):
            rec_in, _ = wt.layer_dims(a, f"enc_gru{k}_recurrent")
            gi = _bind(a, f"enc_gru{k}_input", buf, 3 * rec_in)
            gr = _bind(a, f"enc_gru{k}_recurrent", rec_in, 3 * rec_in)
            self.gru.append((gi, gr))
            buf += rec_in
            c_in, c_out = wt.layer_dims(a, f"enc_conv{k}")
            self.conv.append((_bind(a, f"enc_conv{k}", c_in, c_out), buf))
            buf += c_out
        self.buffer_size = buf
        z_in, z_out = wt.layer_dims(a, "enc_zdense", buf)
        self.zdense = _bind(a, "enc_zdense", z_in, z_out)
        g1_in, g1_out = wt.layer_dims(a, "gdense1", buf)
        self.gdense1 = _bind(a, "gdense1", g1_in, g1_out)
        g2_in, g2_out = wt.layer_dims(a, "gdense2", g1_out)
        self.gdense2 = _bind(a, "gdense2", g2_in, g2_out)
        self.latent_dim = latent_dim if latent_dim is not None else z_out
        self.state_dim = state_dim if state_dim is not None else g2_out
        self.reset()

    @classmethod
    def from_blob(cls, blob: bytes, **kw) -> "RDOVAEEncoder":
        return cls(wt.parse_weights(blob), **kw)

    def reset(self):
        """RDOVAEEncState: 5 GRU states + 5 conv histories."""
        self.gru_state = [np.zeros(gr.nb_inputs, np.float32)
                          for _, gr in self.gru]
        self.conv_state = [
            conv1d_state(c, inp, ENC_CONV_DILATIONS[i])
            for i, (c, inp) in enumerate(self.conv)]

    def encode_dframe(self, dframe: np.ndarray):
        """dred_rdovae_encode_dframe (dred_rdovae_enc.c:48-110).

        dframe: 2*num_features concatenated features.
        Returns (latents [latent_dim], initial_state [state_dim])."""
        buf = compute_generic_dense(self.dense1,
                                    np.asarray(dframe, np.float32),
                                    ACTIVATION_TANH)
        for k in range(5):
            gi, gr = self.gru[k]
            self.gru_state[k] = compute_generic_gru(gi, gr,
                                                    self.gru_state[k], buf)
            buf = np.concatenate([buf, self.gru_state[k]])
            conv, input_size = self.conv[k]
            out = compute_generic_conv1d(conv, self.conv_state[k], buf,
                                         input_size, ACTIVATION_TANH,
                                         dilation=ENC_CONV_DILATIONS[k])
            buf = np.concatenate([buf, out])
        latents = compute_generic_dense(self.zdense, buf,
                                        ACTIVATION_LINEAR)[:self.latent_dim]
        hidden = compute_generic_dense(self.gdense1, buf, ACTIVATION_TANH)
        state = compute_generic_dense(self.gdense2, hidden,
                                      ACTIVATION_LINEAR)[:self.state_dim]
        return latents, state


class RDOVAEDecoder:
    """RDOVAEDec + RDOVAEDecState (dred_rdovae_dec.c)."""

    def __init__(self, arrays: Dict[str, wt.WeightArray]):
        a = arrays
        h_in, h_out = wt.layer_dims(a, "dec_hidden_init")
        self.hidden_init = _bind(a, "dec_hidden_init", h_in, h_out)
        s_in, s_out = wt.layer_dims(a, "dec_gru_init", h_out)
        self.gru_init = _bind(a, "dec_gru_init", s_in, s_out)
        d1_in, d1_out = wt.layer_dims(a, "dec_dense1")
        self.dense1 = _bind(a, "dec_dense1", d1_in, d1_out)
        self.latent_dim_net = d1_in
        self.gru = []
        self.glu = []
        self.conv = []
        buf = d1_out
        for k in range(1, 6):
            rec_in, _ = wt.layer_dims(a, f"dec_gru{k}_recurrent")
            gi = _bind(a, f"dec_gru{k}_input", buf, 3 * rec_in)
            gr = _bind(a, f"dec_gru{k}_recurrent", rec_in, 3 * rec_in)
            self.gru.append((gi, gr))
            self.glu.append(_bind(a, f"dec_glu{k}", rec_in, rec_in))
            buf += rec_in
            c_in, c_out = wt.layer_dims(a, f"dec_conv{k}")
            self.conv.append((_bind(a, f"dec_conv{k}", c_in, c_out), buf))
            buf += c_out
        o_in, o_out = wt.layer_dims(a, "dec_output", buf)
        self.output = _bind(a, "dec_output", o_in, o_out)
        self.num_features = o_out // 4   # quadruple frame out
        self.reset()

    @classmethod
    def from_blob(cls, blob: bytes) -> "RDOVAEDecoder":
        return cls(wt.parse_weights(blob))

    def reset(self):
        self.gru_state = [np.zeros(gr.nb_inputs, np.float32)
                          for _, gr in self.gru]
        self.conv_state = [conv1d_state(c, inp) for c, inp in self.conv]

    def init_states(self, initial_state: np.ndarray):
        """dred_rdovae_dec_init_states (dred_rdovae_dec.c:63-91)."""
        self.reset()
        state = np.zeros(self.hidden_init.nb_inputs, np.float32)
        initial_state = np.asarray(initial_state, np.float32)
        state[:len(initial_state)] = initial_state
        hidden = compute_generic_dense(self.hidden_init, state,
                                       ACTIVATION_TANH)
        init = compute_generic_dense(self.gru_init, hidden, ACTIVATION_TANH)
        pos = 0
        for k in range(5):
            n = self.gru[k][1].nb_inputs
            self.gru_state[k] = init[pos:pos + n].copy()
            pos += n

    def decode_qframe(self, latents: np.ndarray) -> np.ndarray:
        """dred_rdovae_decode_qframe (dred_rdovae_dec.c:94-139).
        Returns 4 concatenated feature frames (in reverse order)."""
        lat = np.zeros(self.latent_dim_net, np.float32)
        latents = np.asarray(latents, np.float32)
        lat[:len(latents)] = latents
        buf = compute_generic_dense(self.dense1, lat, ACTIVATION_TANH)
        for k in range(5):
            gi, gr = self.gru[k]
            self.gru_state[k] = compute_generic_gru(gi, gr,
                                                    self.gru_state[k], buf)
            buf = np.concatenate([buf,
                                  compute_glu(self.glu[k],
                                              self.gru_state[k])])
            conv, input_size = self.conv[k]
            out = compute_generic_conv1d(conv, self.conv_state[k], buf,
                                         input_size, ACTIVATION_TANH)
            buf = np.concatenate([buf, out])
        return compute_generic_dense(self.output, buf, ACTIVATION_LINEAR)

    def decode_all(self, initial_state: np.ndarray, latents: np.ndarray,
                   nb_latents: int) -> np.ndarray:
        """DRED_rdovae_decode_all (dred_rdovae_dec.c:45-61): decode
        every other latent vector into features [4*nb_latents, F]."""
        self.init_states(initial_state)
        latents = np.asarray(latents, np.float32).reshape(-1)
        F = self.num_features
        features = np.zeros((4 * nb_latents, F), np.float32)
        lat_dim = len(latents) // max(nb_latents, 1)
        for i in range(0, 2 * nb_latents, 2):
            q = self.decode_qframe(
                latents[(i // 2) * lat_dim:(i // 2 + 1) * lat_dim])
            features[2 * i:2 * i + 4] = q.reshape(4, F)
        return features
