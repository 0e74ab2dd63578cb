"""Batched JAX RDO-VAE — the device twin of ``dred.py``.

DRED's latent codec is the most MXU-natural subsystem in the codebase:
every layer is a dense matmul or a short conv over a concatenation
buffer (opus/dnn/dred_rdovae_enc.c:48-110, dred_rdovae_dec.c:63-139).
This module runs it for ``[B, ...]`` stream batches with functional
state pytrees; the scalar NumPy models are the validated ground truth.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nnet_jax as nj
from .dred import ENC_CONV_DILATIONS, RDOVAEDecoder, RDOVAEEncoder
from .nnet import ACTIVATION_LINEAR, ACTIVATION_TANH

__all__ = ["JaxRDOVAEEncoder", "JaxRDOVAEDecoder", "from_encoder",
           "from_decoder", "enc_init_state", "encode_dframe_batch",
           "dec_init_states_batch", "decode_qframe_batch"]


class JaxRDOVAEEncoder(NamedTuple):
    dense1: nj.JaxLinear
    gru: Tuple                  # 5 x (input, recurrent)
    conv: Tuple                 # 5 x (layer, input_size)
    zdense: nj.JaxLinear
    gdense1: nj.JaxLinear
    gdense2: nj.JaxLinear
    latent_dim: int
    state_dim: int


class JaxRDOVAEDecoder(NamedTuple):
    hidden_init: nj.JaxLinear
    gru_init: nj.JaxLinear
    dense1: nj.JaxLinear
    gru: Tuple
    glu: Tuple
    conv: Tuple
    output: nj.JaxLinear
    latent_dim_net: int


def from_encoder(m: RDOVAEEncoder) -> JaxRDOVAEEncoder:
    f = nj.from_numpy
    return JaxRDOVAEEncoder(
        dense1=f(m.dense1),
        gru=tuple((f(gi), f(gr)) for gi, gr in m.gru),
        conv=tuple((f(c), int(inp)) for c, inp in m.conv),
        zdense=f(m.zdense), gdense1=f(m.gdense1), gdense2=f(m.gdense2),
        latent_dim=int(m.latent_dim), state_dim=int(m.state_dim))


def from_decoder(m: RDOVAEDecoder) -> JaxRDOVAEDecoder:
    f = nj.from_numpy
    return JaxRDOVAEDecoder(
        hidden_init=f(m.hidden_init), gru_init=f(m.gru_init),
        dense1=f(m.dense1),
        gru=tuple((f(gi), f(gr)) for gi, gr in m.gru),
        glu=tuple(f(g) for g in m.glu),
        conv=tuple((f(c), int(inp)) for c, inp in m.conv),
        output=f(m.output), latent_dim_net=int(m.latent_dim_net))


def enc_init_state(jm: JaxRDOVAEEncoder, B: int):
    return {
        "gru": [jnp.zeros((B, gr.W.shape[1]), jnp.float32)
                for _, gr in jm.gru],
        "conv": [nj.conv1d_init(B, c.W.shape[1], inp,
                                ENC_CONV_DILATIONS[i])
                 for i, (c, inp) in enumerate(jm.conv)],
    }


def encode_dframe_batch(jm: JaxRDOVAEEncoder, state, dframe):
    """dred_rdovae_encode_dframe batched.  dframe [B, 2F] ->
    (latents [B, latent_dim], init_state [B, state_dim], state)."""
    buf = nj.dense(jm.dense1, dframe, ACTIVATION_TANH)
    gru_s = list(state["gru"])
    conv_s = list(state["conv"])
    for k in range(5):
        gi, gr = jm.gru[k]
        gru_s[k] = nj.gru(gi, gr, gru_s[k], buf)
        buf = jnp.concatenate([buf, gru_s[k]], axis=1)
        conv, input_size = jm.conv[k]
        out, conv_s[k] = nj.conv1d(conv, conv_s[k], buf, input_size,
                                   ACTIVATION_TANH,
                                   dilation=ENC_CONV_DILATIONS[k])
        buf = jnp.concatenate([buf, out], axis=1)
    latents = nj.dense(jm.zdense, buf,
                       ACTIVATION_LINEAR)[:, :jm.latent_dim]
    hidden = nj.dense(jm.gdense1, buf, ACTIVATION_TANH)
    init = nj.dense(jm.gdense2, hidden,
                    ACTIVATION_LINEAR)[:, :jm.state_dim]
    return latents, init, {"gru": gru_s, "conv": conv_s}


def dec_init_states_batch(jm: JaxRDOVAEDecoder, B: int, initial_state):
    """dred_rdovae_dec_init_states batched.  initial_state [B, S]."""
    S = jm.hidden_init.W.shape[1]
    st = jnp.zeros((B, S), jnp.float32)
    st = st.at[:, :initial_state.shape[1]].set(initial_state)
    hidden = nj.dense(jm.hidden_init, st, ACTIVATION_TANH)
    init = nj.dense(jm.gru_init, hidden, ACTIVATION_TANH)
    gru_s = []
    pos = 0
    for _, gr in jm.gru:
        n = gr.W.shape[1]
        gru_s.append(init[:, pos:pos + n])
        pos += n
    conv_s = [nj.conv1d_init(B, c.W.shape[1], inp)
              for c, inp in jm.conv]
    return {"gru": gru_s, "conv": conv_s}


def decode_qframe_batch(jm: JaxRDOVAEDecoder, state, latents):
    """dred_rdovae_decode_qframe batched.  latents [B, L] (zero-padded
    to the net width here) -> (features [B, 4F] reverse order, state)."""
    B = latents.shape[0]
    lat = jnp.zeros((B, jm.latent_dim_net), jnp.float32)
    lat = lat.at[:, :latents.shape[1]].set(latents)
    buf = nj.dense(jm.dense1, lat, ACTIVATION_TANH)
    gru_s = list(state["gru"])
    conv_s = list(state["conv"])
    for k in range(5):
        gi, gr = jm.gru[k]
        gru_s[k] = nj.gru(gi, gr, gru_s[k], buf)
        buf = jnp.concatenate([buf, nj.glu(jm.glu[k], gru_s[k])],
                              axis=1)
        conv, input_size = jm.conv[k]
        out, conv_s[k] = nj.conv1d(conv, conv_s[k], buf, input_size,
                                   ACTIVATION_TANH)
        buf = jnp.concatenate([buf, out], axis=1)
    feats = nj.dense(jm.output, buf, ACTIVATION_LINEAR)
    return feats, {"gru": gru_s, "conv": conv_s}
