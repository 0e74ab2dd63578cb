"""Batched JAX OSCE (LACE / NoLACE) — the device twin of ``osce.py``.

The scalar NumPy models are the validated ground truth for the
reference semantics (opus/dnn/osce.c:103-775); this module runs the
same math for a ``[B, ...]`` stream batch as one jitted program per
20 ms frame: the feature net's dense/conv/GRU stack are MXU matmuls,
the adaptive filters come from ``nndsp_jax``, and the pre/de-emphasis
pair is an FIR + a first-order affine scan.

Host/device split: OSCE feature *extraction* (osce_features.py — a few
hundred scalar ops on SILK side-info per frame) stays on the host
beside the SILK symbol lane; the model compute (everything that scales
with model size) runs here.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nndsp_jax as nd
from .nnet import (ACTIVATION_LINEAR, ACTIVATION_TANH)
from .nnet_jax import (JaxLinear, conv1d, conv1d_init, dense, from_numpy,
                       gru, linear)
from .osce import (FRAME_SIZE, NUM_FEATURES, OVERLAP_SIZE, PREEMPH,
                   LaceModel, NoLaceModel)

__all__ = ["JaxLace", "JaxNoLace", "from_lace", "from_nolace",
           "lace_init_state", "nolace_init_state", "lace_frame_batch",
           "nolace_frame_batch"]


class JaxFeatureNet(NamedTuple):
    pitch_embedding: jnp.ndarray      # [301, pitch_dim]
    conv1: JaxLinear
    conv2: JaxLinear
    tconv: JaxLinear
    gru_input: JaxLinear
    gru_recurrent: JaxLinear
    numbits_scales: jnp.ndarray
    hidden_dim: int
    cond_dim: int


class JaxAdaptive(NamedTuple):
    kernel: JaxLinear
    gain: JaxLinear
    global_gain: Any                  # JaxLinear or None


class JaxLace(NamedTuple):
    fnet: JaxFeatureNet
    cf1: JaxAdaptive
    cf2: JaxAdaptive
    af1: JaxAdaptive
    window: jnp.ndarray
    cfg: Tuple                        # static per-filter scalars


class JaxNoLace(NamedTuple):
    fnet: JaxFeatureNet
    cf1: JaxAdaptive
    cf2: JaxAdaptive
    af: Tuple
    post: Tuple                       # 5 conv1d layers
    tdshape: Tuple                    # 3 x (alpha1_f, alpha1_t, alpha2)
    window: jnp.ndarray
    cfg: Tuple


def _fnet(fn) -> JaxFeatureNet:
    return JaxFeatureNet(
        pitch_embedding=jnp.asarray(fn.pitch_embedding),
        conv1=from_numpy(fn.conv1), conv2=from_numpy(fn.conv2),
        tconv=from_numpy(fn.tconv),
        gru_input=from_numpy(fn.gru_input),
        gru_recurrent=from_numpy(fn.gru_recurrent),
        numbits_scales=jnp.asarray(fn.numbits_scales),
        hidden_dim=fn.hidden_dim, cond_dim=fn.cond_dim)


def _ada(d) -> JaxAdaptive:
    return JaxAdaptive(
        kernel=from_numpy(d["kernel"]), gain=from_numpy(d["gain"]),
        global_gain=from_numpy(d["global_gain"])
        if "global_gain" in d else None)


def from_lace(m: LaceModel) -> JaxLace:
    cfg = (m.cf1_cfg, m.cf2_cfg, m.af1_cfg)
    return JaxLace(fnet=_fnet(m.fnet), cf1=_ada(m.cf1), cf2=_ada(m.cf2),
                   af1=_ada(m.af1), window=jnp.asarray(m.window),
                   cfg=cfg)


def from_nolace(m: NoLaceModel) -> JaxNoLace:
    cfg = (m.cf1_cfg, m.cf2_cfg, tuple(m.af_cfg))
    return JaxNoLace(
        fnet=_fnet(m.fnet), cf1=_ada(m.cf1), cf2=_ada(m.cf2),
        af=tuple(_ada(d) for d in m.af),
        post=tuple(from_numpy(p) for p in m.post),
        tdshape=tuple(
            (from_numpy(t["alpha1_f"]), from_numpy(t["alpha1_t"]),
             from_numpy(t["alpha2"])) for t in m.tdshape),
        window=jnp.asarray(m.window), cfg=cfg)


# ---------------------------------------------------------------------------
# feature net

def _fnet_init(B: int, fn: JaxFeatureNet):
    return {
        "conv2": conv1d_init(B, fn.conv2.W.shape[1], 4 * fn.hidden_dim),
        "gru": jnp.zeros((B, fn.cond_dim), jnp.float32),
    }


def _numbits_embedding(numbits, scales, lo=50.0, hi=650.0):
    """osce.c:62-78 batched; numbits [B]."""
    x = jnp.clip(jnp.log(jnp.maximum(numbits, 1e-9)),
                 np.log(lo), np.log(hi))
    x = x - (np.log(hi) + np.log(lo)) / 2
    return jnp.sin(x[:, None] * scales[None, :] - 0.5)


def _fnet_run(fn: JaxFeatureNet, state, features, numbits, periods):
    """osce.c:103-177 batched.  features [B, 4, >=93], numbits [B, 2],
    periods [B, 4] int -> (cond [B, 4, cond_dim], new state)."""
    B = features.shape[0]
    emb = jnp.concatenate(
        [_numbits_embedding(numbits[:, 0], fn.numbits_scales),
         _numbits_embedding(numbits[:, 1], fn.numbits_scales)], axis=1)
    pe = fn.pitch_embedding[periods]                 # [B, 4, pd]
    rows = jnp.concatenate(
        [features[:, :, :NUM_FEATURES], pe,
         jnp.broadcast_to(emb[:, None, :], (B, 4, emb.shape[1]))],
        axis=2)
    hidden = jnp.tanh(linear(
        fn.conv1, rows.reshape(B * 4, -1))).reshape(B, 4, fn.hidden_dim)
    flat, mem2 = conv1d(fn.conv2, state["conv2"],
                        hidden.reshape(B, -1), 4 * fn.hidden_dim,
                        ACTIVATION_TANH)
    up = jnp.tanh(linear(fn.tconv, flat))
    g = state["gru"]
    outs = []
    for k in range(4):
        g = gru(fn.gru_input, fn.gru_recurrent, g,
                up[:, k * fn.cond_dim:(k + 1) * fn.cond_dim])
        outs.append(g)
    cond = jnp.stack(outs, axis=1)
    return cond, {"conv2": mem2, "gru": g}


def _preemph(x_in, mem):
    """x[i] = x_in[i] - a*x_in[i-1] (FIR); returns (x, new mem)."""
    prev = jnp.concatenate([mem[:, None], x_in[:, :-1]], axis=1)
    return x_in - PREEMPH * prev, x_in[:, -1]


def _deemph(x, mem):
    """mem_i = x_i + a*mem_{i-1} — first-order affine scan."""
    B, n = x.shape
    a = jnp.full((B, n), PREEMPH, x.dtype)
    b = x.at[:, 0].add(PREEMPH * mem)

    def comb(p, q):
        return (q[0] * p[0], q[0] * p[1] + q[1])

    _, out = jax.lax.associative_scan(comb, (a, b), axis=1)
    return out, out[:, -1]


# ---------------------------------------------------------------------------
# LACE

def lace_init_state(B: int, m: JaxLace):
    cf1_cfg, cf2_cfg, af1_cfg = m.cfg
    return {
        "fnet": _fnet_init(B, m.fnet),
        "cf1": nd.adacomb_init(B, cf1_cfg.kernel_size),
        "cf2": nd.adacomb_init(B, cf2_cfg.kernel_size),
        "af1": nd.adaconv_init(B, 1, 1, af1_cfg.kernel_size),
        "preemph": jnp.zeros((B,), jnp.float32),
        "deemph": jnp.zeros((B,), jnp.float32),
    }


def _comb_stage(st, x, cond, lay: JaxAdaptive, cfg, periods, window):
    parts = []
    for k in range(4):
        seg = x[:, k * FRAME_SIZE:(k + 1) * FRAME_SIZE]
        y, st = nd.adacomb_frame(
            st, seg, cond[:, k], lay.kernel, lay.gain, lay.global_gain,
            periods[:, k], FRAME_SIZE, OVERLAP_SIZE, cfg.kernel_size,
            cfg.filter_gain_a, cfg.filter_gain_b, cfg.log_gain_limit,
            window)
        parts.append(y)
    return jnp.concatenate(parts, axis=1), st


def _conv_stage(st, x, cond, lay: JaxAdaptive, cfg, window,
                in_ch: int, out_ch: int):
    """x [B, 4, in_ch*F] per-subframe -> [B, 4, out_ch*F]."""
    parts = []
    for k in range(4):
        y, st = nd.adaconv_frame(
            st, x[:, k], cond[:, k], lay.kernel, lay.gain, FRAME_SIZE,
            OVERLAP_SIZE, in_ch, out_ch, cfg.kernel_size,
            cfg.filter_gain_a, cfg.filter_gain_b, window)
        parts.append(y)
    return jnp.stack(parts, axis=1), st


def lace_frame_batch(m: JaxLace, state, x_in, features, numbits,
                     periods):
    """lace_process_20ms_frame (osce.c:178-321) batched.
    x_in [B, 320] float; returns ([B, 320], new state)."""
    cf1_cfg, cf2_cfg, af1_cfg = m.cfg
    x, pmem = _preemph(x_in, state["preemph"])
    cond, fstate = _fnet_run(m.fnet, state["fnet"], features, numbits,
                             periods)
    x, cf1 = _comb_stage(state["cf1"], x, cond, m.cf1, cf1_cfg,
                         periods, m.window)
    x, cf2 = _comb_stage(state["cf2"], x, cond, m.cf2, cf2_cfg,
                         periods, m.window)
    x4 = x.reshape(x.shape[0], 4, FRAME_SIZE)
    x4, af1 = _conv_stage(state["af1"], x4, cond, m.af1, af1_cfg,
                          m.window, 1, 1)
    x = x4.reshape(x.shape[0], -1)
    out, dmem = _deemph(x, state["deemph"])
    return out, {"fnet": fstate, "cf1": cf1, "cf2": cf2, "af1": af1,
                 "preemph": pmem, "deemph": dmem}


def jit_lace(m: JaxLace):
    """Jitted per-frame step with the model closed over (JaxLinear
    holds a static bool leaf, so the model cannot be a traced arg)."""
    return jax.jit(lambda state, x, f, nb, pd:
                   lace_frame_batch(m, state, x, f, nb, pd))


# ---------------------------------------------------------------------------
# NoLACE

def nolace_init_state(B: int, m: JaxNoLace):
    cf1_cfg, cf2_cfg, af_cfg = m.cfg
    chans = ((1, 2), (2, 2), (2, 2), (2, 1))
    st = {
        "fnet": _fnet_init(B, m.fnet),
        "cf1": nd.adacomb_init(B, cf1_cfg.kernel_size),
        "cf2": nd.adacomb_init(B, cf2_cfg.kernel_size),
        "af": [nd.adaconv_init(B, ci, co, af_cfg[i].kernel_size)
               for i, (ci, co) in enumerate(chans)],
        "post": [conv1d_init(B, p.W.shape[1], m.fnet.cond_dim)
                 for p in m.post],
        "tdshape": [nd.adashape_init(B, a1f, a1t, a2, m.fnet.cond_dim,
                                     FRAME_SIZE, 4)
                    for (a1f, a1t, a2) in m.tdshape],
        "preemph": jnp.zeros((B,), jnp.float32),
        "deemph": jnp.zeros((B,), jnp.float32),
    }
    return st


def _post_stage(m: JaxNoLace, state, idx: int, cond):
    B = cond.shape[0]
    mem = state["post"][idx]
    outs = []
    for k in range(4):
        y, mem = conv1d(m.post[idx], mem, cond[:, k], m.fnet.cond_dim,
                        ACTIVATION_TANH)
        outs.append(y)
    state["post"][idx] = mem
    return jnp.stack(outs, axis=1)


def nolace_frame_batch(m: JaxNoLace, state, x_in, features, numbits,
                       periods):
    """nolace_process_20ms_frame (osce.c:386-775) batched."""
    cf1_cfg, cf2_cfg, af_cfg = m.cfg
    B = x_in.shape[0]
    st = {k: (list(v) if isinstance(v, list) else v)
          for k, v in state.items()}
    x, st["preemph"] = _preemph(x_in, state["preemph"])
    cond, st["fnet"] = _fnet_run(m.fnet, state["fnet"], features,
                                 numbits, periods)

    x, st["cf1"] = _comb_stage(state["cf1"], x, cond, m.cf1, cf1_cfg,
                               periods, m.window)
    cond = _post_stage(m, st, 0, cond)
    x, st["cf2"] = _comb_stage(state["cf2"], x, cond, m.cf2, cf2_cfg,
                               periods, m.window)
    cond = _post_stage(m, st, 1, cond)

    # af1: 1 -> 2 channels
    x4 = x.reshape(B, 4, FRAME_SIZE)
    x2, st["af"][0] = _conv_stage(st["af"][0], x4, cond, m.af[0],
                                  af_cfg[0], m.window, 1, 2)
    cond = _post_stage(m, st, 2, cond)

    buf = x2                                    # [B, 4, 2*F]
    for rnd in range(2):
        a1f, a1t, a2 = m.tdshape[rnd]
        td = st["tdshape"][rnd]
        ch1 = []
        for k in range(4):
            y, td = nd.adashape_frame(
                td, buf[:, k, FRAME_SIZE:], cond[:, k], a1f, a1t, a2,
                m.fnet.cond_dim, FRAME_SIZE, 4)
            ch1.append(y)
        st["tdshape"][rnd] = td
        buf = jnp.concatenate(
            [buf[:, :, :FRAME_SIZE], jnp.stack(ch1, axis=1)], axis=2)
        buf, st["af"][rnd + 1] = _conv_stage(
            st["af"][rnd + 1], buf, cond, m.af[rnd + 1],
            af_cfg[rnd + 1], m.window, 2, 2)
        cond = _post_stage(m, st, rnd + 3, cond)

    a1f, a1t, a2 = m.tdshape[2]
    td = st["tdshape"][2]
    ch1 = []
    for k in range(4):
        y, td = nd.adashape_frame(
            td, buf[:, k, FRAME_SIZE:], cond[:, k], a1f, a1t, a2,
            m.fnet.cond_dim, FRAME_SIZE, 4)
        ch1.append(y)
    st["tdshape"][2] = td
    buf = jnp.concatenate(
        [buf[:, :, :FRAME_SIZE], jnp.stack(ch1, axis=1)], axis=2)
    out4, st["af"][3] = _conv_stage(st["af"][3], buf, cond, m.af[3],
                                    af_cfg[3], m.window, 2, 1)
    x = out4.reshape(B, -1)
    out, st["deemph"] = _deemph(x, state["deemph"])
    return out, st


def jit_nolace(m: JaxNoLace):
    return jax.jit(lambda state, x, f, nb, pd:
                   nolace_frame_batch(m, state, x, f, nb, pd))
