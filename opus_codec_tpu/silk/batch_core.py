"""Batched SILK decode core — the device synthesis pass.

The SILK frame decode splits the same way the CELT lanes do (SURVEY
§7): the serial range-coder parse plus all table-driven parameter
dequantization stays on the host (``silk.batch_decoder`` drives the
scalar ``decode_indices``/``decode_parameters``/``decode_pulses``),
and this module replays the excitation construction and the LTP + LPC
synthesis filters for the whole stream batch as one jitted int32
program — **bit-exact** against the scalar ``decode_core``.

Behavioural parity: /root/reference/opus/silk/decode_core.c:38-237,
LPC_analysis_filter.c, SigProc_FIX.h (OPUS_FAST_INT64 macro variants).
The scalar ``silk.decoder.SilkChannelState.decode_core`` is the tested
ground truth.

Design notes (TPU-first):
- Every gain reciprocal/ratio (CLZ + Newton division) is a function of
  parsed symbols only, so the host computes ``inv_gain_Q31`` /
  ``gain_adj_Q16`` exactly and ships them as per-subframe arrays; the
  device runs pure MAC/wrap arithmetic (``ops.fixed32``).
- The excitation's LCG sign sequence is an affine int32 recurrence
  (seed' = RAND(seed) + pulse); it runs as one
  ``jax.lax.associative_scan`` instead of a 320-step serial loop.
- The LTP filter's recurrence distance is >= min_pitch_lag - 2
  samples, so it runs in static blocks of that size with all reads
  landing before the block — no per-sample loop.
- Only the 16-tap LPC synthesis IIR is inherently serial; it runs as a
  ``lax.scan`` over samples whose body is one [B, order] MAC row —
  batch-parallel across streams.
- signalType is per *frame*, so voiced/unvoiced divergence is a single
  ``where`` mask per write, never per-sample control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fixed32 import (add_sat32, lshift_sat32, rshift_round, sat16,
                           sext16, silk_rand, smulwb, smulww)

_i32 = jnp.int32

LTP_ORDER = 5
MAX_LPC_ORDER = 16
QUANT_LEVEL_ADJUST_Q10 = 80
PE_MIN_LAG_MS = 2
PE_MAX_LAG_MS = 18
SUB_FRAME_LENGTH_MS = 5
LTP_MEM_LENGTH_MS = 20


class SilkCoreState(NamedTuple):
    """Carried device state (pytree of [B, ...] int32 arrays)."""
    outBuf: jnp.ndarray     # [B, ltp_mem] int16 values
    sLPC: jnp.ndarray       # [B, MAX_LPC_ORDER] Q14; [..., -1] newest


def init_core_state(B: int, fs_khz: int) -> SilkCoreState:
    ltp_mem = LTP_MEM_LENGTH_MS * fs_khz
    return SilkCoreState(
        outBuf=jnp.zeros((B, ltp_mem), _i32),
        sLPC=jnp.zeros((B, MAX_LPC_ORDER), _i32))


def _exc_batch(pulses, seed0, offset_Q10, L: int):
    """Excitation from pulses (decode_core.c:70-85): the sign LCG as an
    associative scan.  pulses [B, L], seed0/offset [B] -> exc [B, L]."""
    A = np.int32(196314165)
    C = np.int32(907633515)
    p = pulses.astype(_i32)
    # seed_{i+1} = A*seed_i + (C + p_i); prefix-compose the affine maps
    m = jnp.broadcast_to(jnp.asarray(A), p.shape)
    b = C + p

    def comb(x, y):
        return (y[0] * x[0], y[0] * x[1] + y[1])

    M, Bc = jax.lax.associative_scan(comb, (m, b), axis=1)
    # seed before step i: identity for i=0, prefix of [0, i) after
    s0 = seed0.astype(_i32)[:, None]
    seed_before = jnp.concatenate(
        [s0, M[:, :-1] * s0 + Bc[:, :-1]], axis=1)
    t = silk_rand(seed_before)                     # sign word per sample
    exc = p << 14
    adj = np.int32(QUANT_LEVEL_ADJUST_Q10 << 4)
    exc = exc - jnp.where(exc > 0, adj, 0) + jnp.where(exc < 0, adj, 0)
    exc = exc + (offset_Q10.astype(_i32)[:, None] << 4)
    return jnp.where(t < 0, -exc, exc)


def _whiten(x, A, order: int, W: int):
    """LPC analysis filter over the last W positions of x
    (LPC_analysis_filter.c, generic path).  x [B, E] int16 values,
    A [B, order] Q12 -> [B, W] int16 values for positions E-W .. E-1.
    Requires E - W - order - 1 >= 0."""
    E = x.shape[1]
    pos = np.arange(E - W, E)                      # static
    acc = jnp.zeros((x.shape[0], W), _i32)
    for j in range(order):
        acc = acc + sext16(x[:, pos - 1 - j]) * sext16(A[:, j:j + 1])
    out32 = (x[:, pos] << 12) - acc
    return sat16(rshift_round(out32, 12))


def silk_decode_core_batch(params, st: SilkCoreState, fs_khz: int,
                           nb_subfr: int):
    """One SILK frame for a batch of streams at one internal rate.

    ``params`` — dict of host-parsed arrays:
      pulses [B, L], seed [B], offset_Q10 [B], voiced [B] bool,
      interp [B] bool (NLSFInterpCoef_Q2 < 4),
      A_Q12 [B, 2, order], B_Q14 [B, nb_subfr, 5],
      pitchL [B, nb_subfr], Gain_Q10 [B, nb_subfr],
      inv_gain_rw_Q31 [B, nb_subfr] (k==0 entry pre-scaled by
      LTP_scale as in decode_core.c:546-548),
      gain_adj_Q16 [B, nb_subfr] (65536 where unchanged).

    Returns (xq [B, L] int32 with int16 values, new_state).
    Bit-exact vs the scalar decode_core for clean (no-loss) streams.
    """
    order = MAX_LPC_ORDER if fs_khz == 16 else 10
    subfr = SUB_FRAME_LENGTH_MS * fs_khz
    L = nb_subfr * subfr
    ltp_mem = LTP_MEM_LENGTH_MS * fs_khz
    min_lag = PE_MIN_LAG_MS * fs_khz
    max_lag = PE_MAX_LAG_MS * fs_khz
    W = max_lag + 2                     # whitened-window coverage
    T = ltp_mem + L                     # sLTP_Q15 extent
    B = st.outBuf.shape[0]

    voiced = params["voiced"]
    interp = params["interp"]
    exc = _exc_batch(params["pulses"], params["seed"],
                     params["offset_Q10"], L)

    sLTP = jnp.zeros((B, T), _i32)
    sLPC = st.sLPC
    lag_all = params["pitchL"].astype(_i32)
    xq_parts = []

    for k in range(nb_subfr):
        A = params["A_Q12"][:, k >> 1, :order].astype(_i32)
        Bq = params["B_Q14"][:, k, :].astype(_i32)
        lag = lag_all[:, k]
        g10 = params["Gain_Q10"][:, k]
        adj = params["gain_adj_Q16"][:, k]
        inv_rw = params["inv_gain_rw_Q31"][:, k]
        buf_idx = ltp_mem + k * subfr

        # gain-change rescale of the LPC history (decode_core.c:512-519)
        sLPC = smulww(adj[:, None], sLPC)

        # --- whitened pitch history (decode_core.c:529-558)
        if k == 0:
            rewhiten = voiced
            src = st.outBuf
        elif k == 2 and nb_subfr == 4:
            rewhiten = voiced & interp
            src = jnp.concatenate(
                [st.outBuf, xq_parts[0], xq_parts[1]], axis=1)
        else:
            rewhiten = None
            src = None

        q = np.arange(buf_idx)
        if rewhiten is not None:
            w = _whiten(src, A, order, W)          # [B, W]
            widx = np.clip(q + W - buf_idx, 0, W - 1)
            fresh = smulwb(inv_rw[:, None], w[:, widx])
        in_window = (q[None, :] >= (buf_idx - lag - 2)[:, None])
        rescaled = smulww(adj[:, None], sLTP[:, :buf_idx])
        upd = jnp.where(voiced[:, None] & in_window, rescaled,
                        sLTP[:, :buf_idx])
        if rewhiten is not None:
            upd = jnp.where(rewhiten[:, None] & in_window, fresh, upd)
        sLTP = sLTP.at[:, :buf_idx].set(upd)

        # --- LTP 5-tap prediction in recurrence-safe blocks
        # (decode_core.c:560-575); reads trail writes by >= lag-2 >= bs
        exc_k = exc[:, k * subfr:(k + 1) * subfr]
        bs = min_lag - 2
        pres = jnp.zeros((B, subfr), _i32)
        for b0 in range(0, subfr, bs):
            blk = min(bs, subfr - b0)
            ii = b0 + np.arange(blk)
            # read positions: buf_idx - lag + 2 + i - j, j = 0..4
            base = (buf_idx + 2 - lag)[:, None, None] \
                + ii[None, :, None] - np.arange(LTP_ORDER)[None, None, :]
            base = jnp.clip(base, 0, T - 1)
            gat = jnp.take_along_axis(
                sLTP, base.reshape(B, -1), axis=1
            ).reshape(B, blk, LTP_ORDER)
            pred = jnp.full((B, blk), 2, _i32)
            for j in range(LTP_ORDER):
                pred = pred + smulwb(gat[:, :, j], Bq[:, j:j + 1])
            pres_blk = exc_k[:, b0:b0 + blk] + (pred << 1)
            pres = pres.at[:, b0:b0 + blk].set(pres_blk)
            sLTP = sLTP.at[:, buf_idx + b0:buf_idx + b0 + blk].set(
                jnp.where(voiced[:, None], pres_blk << 1, 0))
        pres = jnp.where(voiced[:, None], pres, exc_k)

        # --- LPC synthesis IIR (decode_core.c:577-585)
        A_rev = A[:, ::-1]
        pad = MAX_LPC_ORDER - order
        init_pred = np.int32(order >> 1)

        def lpc_step(hist, pres_t):
            h = hist if pad == 0 else hist[:, pad:]
            pred = init_pred + jnp.sum(smulwb(h, A_rev), axis=1,
                                       dtype=_i32)
            v = add_sat32(pres_t, lshift_sat32(pred, 4))
            hist = jnp.concatenate([hist[:, 1:], v[:, None]], axis=1)
            return hist, v

        sLPC, v_seq = jax.lax.scan(lpc_step, sLPC, pres.T)
        xq_k = sat16(rshift_round(smulww(v_seq.T, g10[:, None]), 8))
        xq_parts.append(xq_k)

    xq = jnp.concatenate(xq_parts, axis=1)
    out_new = jnp.concatenate([st.outBuf[:, L:], xq], axis=1) \
        if ltp_mem > L else xq
    return xq, SilkCoreState(outBuf=out_new, sLPC=sLPC)


silk_decode_core_batch_jit = jax.jit(
    silk_decode_core_batch, static_argnames=("fs_khz", "nb_subfr"))
