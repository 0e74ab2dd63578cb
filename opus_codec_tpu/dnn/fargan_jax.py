"""Batched JAX FARGAN vocoder — the device twin of ``fargan.py``.

The scalar NumPy implementation (fargan.py, parity with
/root/reference/opus/dnn/fargan.c) is the tested ground truth; this
module lifts it to jitted ``[B, ...]`` stream batches: every layer is a
dense MXU matmul (nnet_jax), the per-sample deemphasis IIR becomes a
log-depth associative scan, and the pitch-prediction wraparound gather
is expressed in closed form so the whole 160-sample frame synthesis is
one jitted program per batch.

State is a functional pytree (FarganJaxState), so frames compose into
``lax.scan`` sequences for long synthesis runs.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nnet_jax as nj
from .fargan import (FARGAN_DEEMPHASIS, FARGAN_FRAME_SIZE,
                     FARGAN_NB_SUBFRAMES, FARGAN_SUBFRAME_SIZE,
                     FARGAN_CONT_SAMPLES, FarganModel, NB_BANDS,
                     NB_FEATURES, PITCH_MAX_PERIOD)
from .nnet import (ACTIVATION_LINEAR, ACTIVATION_SIGMOID, ACTIVATION_TANH)

__all__ = ["JaxFarganModel", "FarganJaxState", "from_model", "init_state",
           "fargan_cont_batch", "fargan_frame_batch",
           "features_to_period_batch"]

SUB = FARGAN_SUBFRAME_SIZE
P = PITCH_MAX_PERIOD


class JaxFarganModel(NamedTuple):
    pembed: jnp.ndarray
    fdense1: nj.JaxLinear
    fconv1: nj.JaxLinear
    fdense2: nj.JaxLinear
    gain_dense: nj.JaxLinear
    fwc0_conv: nj.JaxLinear
    fwc0_glu: nj.JaxLinear
    gain_dense_out: nj.JaxLinear
    gru: Tuple                      # 3 x (input JaxLinear, rec JaxLinear)
    gru_glu: Tuple                  # 3 x JaxLinear
    skip_dense: nj.JaxLinear
    skip_glu: nj.JaxLinear
    sig_dense_out: nj.JaxLinear


class FarganJaxState(NamedTuple):
    cond_conv1_mem: jnp.ndarray     # [B, fconv1 mem]
    fwc0_mem: jnp.ndarray           # [B, fwc0 mem]
    gru_state: Tuple                # 3 x [B, N]
    pitch_buf: jnp.ndarray          # [B, 256]
    deemph_mem: jnp.ndarray         # [B]
    last_period: jnp.ndarray        # [B] int32


def from_model(m: FarganModel, dtype=jnp.float32) -> JaxFarganModel:
    f = lambda l: nj.from_numpy(l, dtype)
    return JaxFarganModel(
        pembed=jnp.asarray(m.pembed, dtype),
        fdense1=f(m.fdense1), fconv1=f(m.fconv1), fdense2=f(m.fdense2),
        gain_dense=f(m.gain_dense), fwc0_conv=f(m.fwc0_conv),
        fwc0_glu=f(m.fwc0_glu), gain_dense_out=f(m.gain_dense_out),
        gru=tuple((f(gi), f(gr)) for gi, gr in m.gru),
        gru_glu=tuple(f(g) for g in m.gru_glu),
        skip_dense=f(m.skip_dense), skip_glu=f(m.skip_glu),
        sig_dense_out=f(m.sig_dense_out))


def init_state(m: FarganModel, B: int, dtype=jnp.float32
               ) -> FarganJaxState:
    return FarganJaxState(
        cond_conv1_mem=nj.conv1d_init(B, m.fconv1.nb_inputs,
                                      m.fconv1_input, dtype=dtype),
        fwc0_mem=nj.conv1d_init(B, m.fwc0_conv.nb_inputs, m.input_size,
                                dtype=dtype),
        gru_state=tuple(jnp.zeros((B, gr.nb_inputs), dtype)
                        for _, gr in m.gru),
        pitch_buf=jnp.zeros((B, P), dtype),
        deemph_mem=jnp.zeros((B,), dtype),
        last_period=jnp.zeros((B,), jnp.int32))


def features_to_period_batch(features: jnp.ndarray) -> jnp.ndarray:
    """fargan.c:152,202 for [B, NB] feature rows."""
    f = features[:, NB_BANDS].astype(jnp.float32)
    return jnp.floor(
        0.5 + 256.0 / 2.0 ** ((1.0 / 60.0) * ((f + 1.5) * 60.0))
    ).astype(jnp.int32)


def _cond(jm: JaxFarganModel, mem, features, period, fconv1_input: int):
    """compute_fargan_cond (fargan.c:43-60), batched."""
    row = jnp.clip(period - 32, 0, 223)
    dense_in = jnp.concatenate(
        [features[:, :NB_FEATURES], jm.pembed[row]], axis=1)
    x = nj.dense(jm.fdense1, dense_in, ACTIVATION_TANH)
    x, mem = nj.conv1d(jm.fconv1, mem, x, fconv1_input, ACTIVATION_TANH)
    return nj.dense(jm.fdense2, x, ACTIVATION_TANH), mem


def _pred_positions(period: jnp.ndarray, n: int) -> jnp.ndarray:
    """Closed form of the pitch-buffer wraparound walk
    (fargan.c:84-95): pos starts at P-period-2, wraps to pos-period on
    reaching P.  Returns [B, n] gather indices."""
    s = (P - period - 2)[:, None]
    i = jnp.arange(n)[None, :]
    lin = s + i
    per = jnp.maximum(period, 1)[:, None]
    wrapped = P - per + jnp.mod(lin - P, per)
    return jnp.where(lin < P, jnp.maximum(lin, 0), wrapped)


def _subframe(jm: JaxFarganModel, st: FarganJaxState, cond_sub, period,
              input_size: int):
    """run_fargan_subframe (fargan.c:69-140), batched.  Returns
    (pre-deemphasis pcm [B, SUB], new state minus deemphasis)."""
    dt = cond_sub.dtype
    gain = jnp.exp(nj.dense(jm.gain_dense, cond_sub,
                            ACTIVATION_LINEAR)[:, 0])
    gain_1 = 1.0 / (1e-5 + gain)

    idx = _pred_positions(period, SUB + 4)
    pred = jnp.clip(gain_1[:, None]
                    * jnp.take_along_axis(st.pitch_buf, idx, axis=1),
                    -1.0, 1.0)
    prev = jnp.clip(gain_1[:, None] * st.pitch_buf[:, P - SUB:],
                    -1.0, 1.0)

    fwc0_in = jnp.concatenate([cond_sub, pred, prev], axis=1)
    act, fwc0_mem = nj.conv1d(jm.fwc0_conv, st.fwc0_mem, fwc0_in,
                              input_size, ACTIVATION_TANH)
    act = nj.glu(jm.fwc0_glu, act)
    pitch_gate = nj.dense(jm.gain_dense_out, act, ACTIVATION_SIGMOID)
    fwc0_act = act
    skips = []
    gru_state = list(st.gru_state)
    for k in range(3):
        gi, gr = jm.gru[k]
        gru_in = jnp.concatenate(
            [act, pitch_gate[:, k:k + 1] * pred[:, 2:2 + SUB], prev],
            axis=1)
        gru_state[k] = nj.gru(gi, gr, gru_state[k], gru_in)
        act = nj.glu(jm.gru_glu[k], gru_state[k])
        skips.append(act)
    skip_cat = jnp.concatenate(
        skips + [fwc0_act, pitch_gate[:, 3:4] * pred[:, 2:2 + SUB], prev],
        axis=1)
    skip = nj.dense(jm.skip_dense, skip_cat, ACTIVATION_TANH)
    skip = nj.glu(jm.skip_glu, skip)
    pcm = gain[:, None] * nj.dense(jm.sig_dense_out, skip,
                                   ACTIVATION_TANH)
    pitch_buf = jnp.concatenate([st.pitch_buf[:, SUB:], pcm], axis=1)
    st = st._replace(fwc0_mem=fwc0_mem, gru_state=tuple(gru_state),
                     pitch_buf=pitch_buf)
    return pcm, st


def _deemphasis(pcm, mem):
    """y[i] = x[i] + 0.85*y[i-1] as an associative scan."""
    B, n = pcm.shape

    def comb(a, b):
        return (a[0] * b[0], b[0] * a[1] + b[1])

    mults = jnp.full((B, n), FARGAN_DEEMPHASIS, pcm.dtype)
    cm, ca = jax.lax.associative_scan(comb, (mults, pcm), axis=1)
    y = cm * mem[:, None] + ca      # y[i] = 0.85^(i+1)·mem + Σ-form
    return y, y[:, -1]


def fargan_frame_batch(jm: JaxFarganModel, st: FarganJaxState, features,
                       fconv1_input: int, input_size: int,
                       cond_size: int):
    """fargan_synthesize (fargan.c:197-215) for a stream batch.

    features: [B, 36].  Returns (pcm [B, 160], new state)."""
    period = features_to_period_batch(features)
    cond, mem = _cond(jm, st.cond_conv1_mem, features, period,
                      fconv1_input)
    st = st._replace(cond_conv1_mem=mem)
    outs = []
    for sub in range(FARGAN_NB_SUBFRAMES):
        pcm, st = _subframe(jm, st,
                            cond[:, sub * cond_size:(sub + 1) * cond_size],
                            st.last_period, input_size)
        out, dm = _deemphasis(pcm, st.deemph_mem)
        st = st._replace(deemph_mem=dm)
        outs.append(out)
    st = st._replace(last_period=period)
    return jnp.concatenate(outs, axis=1), st


def fargan_cont_batch(jm: JaxFarganModel, st: FarganJaxState, pcm0,
                      features0, fconv1_input: int, input_size: int,
                      cond_size: int) -> FarganJaxState:
    """fargan_cont (fargan.c:143-172) for a stream batch.

    pcm0: [B, 320] continuation PCM; features0: [B, 5, 36]."""
    B = pcm0.shape[0]
    period = jnp.zeros((B,), jnp.int32)
    cond = None
    last = period
    for i in range(5):
        last = period
        period = features_to_period_batch(features0[:, i])
        cond, mem = _cond(jm, st.cond_conv1_mem, features0[:, i], period,
                          fconv1_input)
        st = st._replace(cond_conv1_mem=mem)
    x0 = jnp.concatenate(
        [jnp.zeros((B, 1), pcm0.dtype),
         pcm0[:, 1:] - FARGAN_DEEMPHASIS * pcm0[:, :-1]], axis=1)
    st = st._replace(pitch_buf=st.pitch_buf.at[
        :, P - FARGAN_FRAME_SIZE:].set(x0[:, :FARGAN_FRAME_SIZE]))
    for i in range(FARGAN_NB_SUBFRAMES):
        _, st = _subframe(jm, st,
                          cond[:, i * cond_size:(i + 1) * cond_size],
                          last, input_size)
        st = st._replace(pitch_buf=st.pitch_buf.at[:, P - SUB:].set(
            x0[:, FARGAN_FRAME_SIZE + i * SUB:
               FARGAN_FRAME_SIZE + (i + 1) * SUB]))
    st = st._replace(deemph_mem=pcm0[:, -1], last_period=last)
    return st
