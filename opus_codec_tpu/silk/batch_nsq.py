"""Batched SILK noise-shaping quantizer — the encoder's device core.

silk_NSQ_c (NSQ.c:69-315) for a ``[B, ...]`` stream batch, bit-exact in
wrap-exact int32 (``ops.fixed32``).  This is SURVEY's hard part #1: the
per-sample quantization loop feeds back through the LPC/AR/LF/harmonic
shaping state, so it runs as a ``lax.scan`` over samples whose body is
a handful of [B, order] MAC rows — batch-parallel across streams —
with the pitch-lag reads/writes as per-stream dynamic gathers/scatters
into carried ring buffers.

Host/device split mirrors ``silk.batch_core``: every gain reciprocal
(CLZ + Newton) is a function of already-decided parameters, so the
host ships ``inv_gain_Q26/31`` / ``gain_adj_Q16`` per subframe and the
device does no integer division.

The scalar ``silk.nsq.nsq`` is the tested ground truth (itself
validated by libopus decoding the resulting packets).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fixed32 import (add_sat32, rshift_round, sat16, sext16,
                           silk_rand, smulbb, smulwb, smulww)
from .batch_core import _whiten

_i32 = jnp.int32

MAX_LPC_ORDER = 16
MAX_SHAPE_LPC_ORDER = 24
NSQ_LPC_BUF_LENGTH = 16
LTP_ORDER = 5
QUANT_LEVEL_ADJUST_Q10 = 80
PE_MIN_LAG_MS = 2
PE_MAX_LAG_MS = 18
SUB_FRAME_LENGTH_MS = 5
LTP_MEM_LENGTH_MS = 20

__all__ = ["NsqBatchState", "init_nsq_state", "silk_nsq_batch",
           "silk_nsq_batch_jit"]


class NsqBatchState(NamedTuple):
    """Carried device state (pytree of [B, ...] int32 arrays);
    mirrors silk_nsq_state (structs.h:60-73)."""
    xq: jnp.ndarray           # [B, ltp_mem] quantized output history
    sLTP_shp: jnp.ndarray     # [B, ltp_mem] shaping history (Q14)
    sLPC: jnp.ndarray         # [B, 16] Q14, [..., -1] newest
    sAR2: jnp.ndarray         # [B, 24] Q14
    sLF_AR: jnp.ndarray       # [B] Q14
    sDiff: jnp.ndarray        # [B] Q14
    lagPrev: jnp.ndarray      # [B]


def init_nsq_state(B: int, fs_khz: int) -> NsqBatchState:
    ltp_mem = LTP_MEM_LENGTH_MS * fs_khz
    z = lambda *s: jnp.zeros((B,) + s, _i32)
    return NsqBatchState(
        xq=z(ltp_mem), sLTP_shp=z(ltp_mem), sLPC=z(NSQ_LPC_BUF_LENGTH),
        sAR2=z(MAX_SHAPE_LPC_ORDER), sLF_AR=z(), sDiff=z(),
        lagPrev=jnp.full((B,), 100, _i32))


def silk_nsq_batch(params, st: NsqBatchState, fs_khz: int,
                   nb_subfr: int, predict_order: int = 16,
                   shaping_order: int = 24):
    """One frame of silk_NSQ_c for a batch of streams.

    ``params`` — dict of host-assembled [B, ...] arrays:
      x16 [B, L] int32 input samples, seed [B], offset_Q10 [B],
      voiced [B] bool, interp [B] bool, Lambda_Q10 [B],
      A_Q12 [B, 2, 16], B_Q14 [B, nb, 5], AR_Q13 [B, nb, 24],
      HarmShapePacked [B, nb] ((g>>2) | ((g>>1)<<16)),
      Tilt_Q14 [B, nb], LF_shp_Q14 [B, nb], pitchL [B, nb],
      Gain_Q10 [B, nb] (Gains_Q16 >> 6),
      inv_gain_Q26 [B, nb], inv_gain_rw_Q31 [B, nb] (k==0 scaled by
      LTP_scale as NSQ.c:334), gain_adj_Q16 [B, nb] (65536 where
      unchanged); predict_order/shaping_order are static args.

    Returns (pulses [B, L] int32, xq_frame [B, L], new_state).
    Bit-exact vs silk.nsq.nsq.
    """
    order = predict_order
    shp_order = shaping_order
    subfr = SUB_FRAME_LENGTH_MS * fs_khz
    L = nb_subfr * subfr
    ltp_mem = LTP_MEM_LENGTH_MS * fs_khz
    max_lag = PE_MAX_LAG_MS * fs_khz
    W = max_lag + 2
    T = ltp_mem + L
    B = st.xq.shape[0]

    voiced = params["voiced"]
    interp = params["interp"]
    offset_Q10 = params["offset_Q10"].astype(_i32)
    Lambda = params["Lambda_Q10"].astype(_i32)
    seed = params["seed"].astype(_i32)

    # frame-extent working buffers
    xq_buf = jnp.concatenate([st.xq, jnp.zeros((B, L), _i32)], axis=1)
    shp_buf = jnp.concatenate([st.sLTP_shp, jnp.zeros((B, L), _i32)],
                              axis=1)
    sLTP = jnp.zeros((B, T), _i32)
    sLPC = st.sLPC
    sAR2 = st.sAR2
    sLF_AR = st.sLF_AR
    sDiff = st.sDiff
    lag_state = st.lagPrev
    buf_idx = jnp.full((B,), ltp_mem, _i32)     # sLTP_buf_idx

    pulses_parts = []
    xq_parts = []

    for k in range(nb_subfr):
        a_row = jnp.where(interp, k >> 1, 1)
        A = jnp.take_along_axis(
            params["A_Q12"], a_row[:, None, None], 1)[:, 0, :order]
        A = A.astype(_i32)
        Bq = params["B_Q14"][:, k, :].astype(_i32)
        AR = params["AR_Q13"][:, k, :shp_order].astype(_i32)
        harm = params["HarmShapePacked"][:, k]
        tilt = params["Tilt_Q14"][:, k]
        lf = params["LF_shp_Q14"][:, k]
        g10 = params["Gain_Q10"][:, k]
        adj = params["gain_adj_Q16"][:, k]
        inv26 = params["inv_gain_Q26"][:, k]
        inv_rw = params["inv_gain_rw_Q31"][:, k]
        pitch_k = params["pitchL"][:, k]
        lag_state = jnp.where(voiced, pitch_k, lag_state)
        lag = lag_state

        # ---- rewhiten (NSQ.c:135-150): k==0, or k==2 with interp
        if k == 0:
            rw = voiced
        elif k == 2 and nb_subfr == 4:
            rw = voiced & interp
        else:
            rw = None
        pxq = ltp_mem + k * subfr
        if rw is not None:
            w = _whiten(xq_buf[:, :pxq], A, order, W)
            q = np.arange(ltp_mem)
            widx = np.clip(q + W - ltp_mem, 0, W - 1)
            fresh = smulwb(inv_rw[:, None], w[:, widx])
            in_win = q[None, :] >= (ltp_mem - lag - 2)[:, None]
            sLTP = sLTP.at[:, :ltp_mem].set(
                jnp.where(rw[:, None] & in_win, fresh,
                          sLTP[:, :ltp_mem]))
            buf_idx = jnp.where(rw, ltp_mem, buf_idx)

        # ---- scale_states (NSQ.c:317-380)
        x16 = params["x16"][:, k * subfr:(k + 1) * subfr].astype(_i32)
        x_sc = smulww(x16, inv26[:, None])
        shp_idx0 = ltp_mem + k * subfr
        # shaping history window [shp_idx0 - ltp_mem, shp_idx0)
        win = shp_buf[:, k * subfr:shp_idx0]
        shp_buf = shp_buf.at[:, k * subfr:shp_idx0].set(
            smulww(adj[:, None], win))
        # whitened-history rescale (voiced, no rewhite this subframe)
        resc = voiced if rw is None else (voiced & ~rw)
        qT = np.arange(T)
        in_win2 = (qT[None, :] >= (buf_idx - lag - 2)[:, None]) \
            & (qT[None, :] < buf_idx[:, None])
        sLTP = jnp.where(resc[:, None] & in_win2,
                         smulww(adj[:, None], sLTP), sLTP)
        sLF_AR = smulww(adj, sLF_AR)
        sDiff = smulww(adj, sDiff)
        sLPC = smulww(adj[:, None], sLPC)
        sAR2 = smulww(adj[:, None], sAR2)

        # ---- per-sample quantization loop (NSQ.c:186-315)
        A_rev = A[:, ::-1]
        AR_coef = AR
        shp_lag0 = shp_idx0 - lag + 1
        init_pred = np.int32(order >> 1)
        init_shp = np.int32(shp_order >> 1)
        harm_lo = sext16(harm)
        harm_hi = harm >> 16
        lf_lo = lf
        lf_hi = lf >> 16
        has_lag = lag > 0

        def step(carry, xs):
            (sLPCh, sAR2h, sLF, sDf, sd, sLTPb, shpb, xqb, bidx) = carry
            x_i, i = xs
            sd = silk_rand(sd)
            h = sLPCh if order == NSQ_LPC_BUF_LENGTH \
                else sLPCh[:, NSQ_LPC_BUF_LENGTH - order:]
            lpc_pred = init_pred + jnp.sum(smulwb(h, A_rev),
                                           axis=1, dtype=_i32)
            # LTP prediction; bidx already advances with the sample
            pl = bidx - lag + 2
            gat = jnp.stack(
                [jnp.take_along_axis(
                    sLTPb, jnp.clip(pl - j, 0, T - 1)[:, None],
                    1)[:, 0] for j in range(LTP_ORDER)], axis=1)
            ltp_pred = np.int32(2) + jnp.sum(smulwb(gat, Bq), axis=1,
                                             dtype=_i32)
            ltp_pred = jnp.where(voiced, ltp_pred, 0)
            # noise shape feedback: sAR2' = [sDiff, sAR2[:order-1]]
            sAR2n = jnp.concatenate(
                [sDf[:, None], sAR2h[:, :shp_order - 1]], axis=1)
            n_AR = init_shp + jnp.sum(smulwb(sAR2n, AR_coef), axis=1,
                                      dtype=_i32)
            n_AR = (n_AR << 1)
            n_AR = n_AR + smulwb(sLF, tilt)
            last_shp = jax.lax.dynamic_slice_in_dim(
                shpb, shp_idx0 + i - 1, 1, axis=1)[:, 0]
            n_LF = smulwb(last_shp, lf_lo)
            n_LF = n_LF + smulwb(sLF, lf_hi)

            tmp1 = (lpc_pred << 2) - n_AR
            tmp1 = tmp1 - n_LF
            sl = shp_lag0 + i
            s0 = jnp.take_along_axis(
                shpb, jnp.clip(sl, 0, T - 1)[:, None], 1)[:, 0]
            s1 = jnp.take_along_axis(
                shpb, jnp.clip(sl - 1, 0, T - 1)[:, None], 1)[:, 0]
            s2 = jnp.take_along_axis(
                shpb, jnp.clip(sl - 2, 0, T - 1)[:, None], 1)[:, 0]
            n_LTP = smulwb(add_sat32(s0, s2), harm_lo)
            n_LTP = n_LTP + smulwb(s1, harm_hi)
            n_LTP = n_LTP << 1
            tmp2 = ltp_pred - n_LTP
            t_lag = rshift_round(tmp2 + (tmp1 << 1), 3)
            t_nolag = rshift_round(tmp1, 2)
            tmp1f = jnp.where(has_lag, t_lag, t_nolag)

            r_Q10 = x_i - tmp1f
            r_Q10 = jnp.where(sd < 0, -r_Q10, r_Q10)
            r_Q10 = jnp.clip(r_Q10, -(31 << 10), 30 << 10)

            # two-level RD quantization (NSQ.c:243-286)
            q1_Q10 = r_Q10 - offset_Q10
            q1_Q0 = q1_Q10 >> 10
            rdo = Lambda // 2 - 512
            use_rdo = Lambda > 2048
            q1_Q0_rdo = jnp.where(
                q1_Q10 > rdo, (q1_Q10 - rdo) >> 10,
                jnp.where(q1_Q10 < -rdo, (q1_Q10 + rdo) >> 10,
                          jnp.where(q1_Q10 < 0, -1, 0)))
            q1_Q0 = jnp.where(use_rdo, q1_Q0_rdo, q1_Q0)

            pos = q1_Q0 > 0
            zer = q1_Q0 == 0
            neg1 = q1_Q0 == -1
            q1p = (q1_Q0 << 10) - QUANT_LEVEL_ADJUST_Q10 + offset_Q10
            q1z = offset_Q10
            q2z = q1z + 1024 - QUANT_LEVEL_ADJUST_Q10
            q2n1 = offset_Q10
            q1n1 = q2n1 - (1024 - QUANT_LEVEL_ADJUST_Q10)
            q1n = (q1_Q0 << 10) + QUANT_LEVEL_ADJUST_Q10 + offset_Q10
            q1 = jnp.where(pos, q1p,
                           jnp.where(zer, q1z,
                                     jnp.where(neg1, q1n1, q1n)))
            q2 = jnp.where(pos, q1p + 1024,
                           jnp.where(zer, q2z,
                                     jnp.where(neg1, q2n1, q1n + 1024)))
            rd1 = jnp.where(pos | zer, smulbb(q1, Lambda),
                            smulbb(-q1, Lambda))
            rd2 = jnp.where(neg1 | pos | zer, smulbb(q2, Lambda),
                            smulbb(-q2, Lambda))
            rr = r_Q10 - q1
            rd1 = rd1 + smulbb(rr, rr)
            rr = r_Q10 - q2
            rd2 = rd2 + smulbb(rr, rr)
            q1 = jnp.where(rd2 < rd1, q2, q1)
            pulse = rshift_round(q1, 10)

            exc = q1 << 4
            exc = jnp.where(sd < 0, -exc, exc)
            lpc_exc = exc + (ltp_pred << 1)
            xq_Q14 = lpc_exc + (lpc_pred << 4)
            xq_i = sat16(rshift_round(smulww(xq_Q14, g10), 8))

            sLPCh = jnp.concatenate([sLPCh[:, 1:], xq_Q14[:, None]],
                                    axis=1)
            sDf = xq_Q14 - (x_i << 4)
            sLF = sDf - (n_AR << 2)
            shpb = jax.lax.dynamic_update_slice(
                shpb, (sLF - (n_LF << 2))[:, None],
                (jnp.int32(0), shp_idx0 + i))
            sLTPb = sLTPb.at[jnp.arange(B), jnp.clip(bidx, 0, T - 1)] \
                .set(lpc_exc << 1)
            xqb = jax.lax.dynamic_update_slice(
                xqb, xq_i[:, None], (jnp.int32(0), pxq + i))
            sd = sd + pulse
            bidx = bidx + 1
            sAR2h = jnp.concatenate([sAR2n, sAR2h[:, shp_order:]],
                                    axis=1)
            return (sLPCh, sAR2h, sLF, sDf, sd, sLTPb, shpb, xqb,
                    bidx), (pulse, xq_i)

        xs = (x_sc.T, jnp.arange(subfr, dtype=_i32))
        carry = (sLPC, sAR2, sLF_AR, sDiff, seed, sLTP, shp_buf,
                 xq_buf, buf_idx)
        carry, (pul, xqk) = jax.lax.scan(step, carry, xs)
        (sLPC, sAR2, sLF_AR, sDiff, seed, sLTP, shp_buf, xq_buf,
         buf_idx) = carry
        pulses_parts.append(pul.T)
        xq_parts.append(xqk.T)

    pulses = jnp.concatenate(pulses_parts, axis=1)
    xq_frame = jnp.concatenate(xq_parts, axis=1)
    new_st = NsqBatchState(
        xq=xq_buf[:, L:], sLTP_shp=shp_buf[:, L:], sLPC=sLPC,
        sAR2=sAR2, sLF_AR=sLF_AR, sDiff=sDiff,
        lagPrev=params["pitchL"][:, nb_subfr - 1])
    return pulses, xq_frame, new_st


silk_nsq_batch_jit = jax.jit(
    silk_nsq_batch,
    static_argnames=("fs_khz", "nb_subfr", "predict_order",
                     "shaping_order"))


def assemble_params(records, nb_subfr: int, prev_gains):
    """Host lane: exact per-subframe gain math + array stacking.

    ``records``: one dict per stream with the scalar silk_NSQ_c inputs
    (keys: x16, seed, signal_type, quant_offset_type, interp_coef,
    A_Q12 [2][16], B_Q14 [nb*5], AR_Q13 [nb][24], Harm_Q14 [nb],
    Tilt_Q14 [nb], LF_shp_Q14 [nb], Gains_Q16 [nb], pitchL [nb],
    Lambda_Q10, LTP_scale_Q14).  ``prev_gains``: per-stream
    NSQ.prev_gain_Q16 carried on the host.  Returns (params dict,
    new prev_gains)."""
    from . import tables as T
    from .sigproc import (DIV32_varQ, INVERSE32_varQ, RSHIFT_ROUND,
                          SMULWB, i32)
    TYPE_VOICED_ = 2
    B = len(records)
    out = {k: [] for k in (
        "x16", "seed", "offset_Q10", "voiced", "interp", "Lambda_Q10",
        "A_Q12", "B_Q14", "AR_Q13", "HarmShapePacked", "Tilt_Q14",
        "LF_shp_Q14", "pitchL", "Gain_Q10", "inv_gain_Q26",
        "inv_gain_rw_Q31", "gain_adj_Q16")}
    new_prev = list(prev_gains)
    for b, r in enumerate(records):
        voiced = r["signal_type"] == TYPE_VOICED_
        out["x16"].append(np.asarray(r["x16"], np.int32))
        out["seed"].append(np.int32(r["seed"]))
        out["offset_Q10"].append(np.int32(T.Quantization_Offsets_Q10[
            r["signal_type"] >> 1][r["quant_offset_type"]]))
        out["voiced"].append(voiced)
        out["interp"].append(r["interp_coef"] < 4)
        out["Lambda_Q10"].append(np.int32(r["Lambda_Q10"]))
        A = np.zeros((2, MAX_LPC_ORDER), np.int32)
        for h in range(2):
            A[h, :len(r["A_Q12"][h])] = r["A_Q12"][h]
        out["A_Q12"].append(A)
        out["B_Q14"].append(np.asarray(r["B_Q14"], np.int32)
                            .reshape(nb_subfr, LTP_ORDER))
        AR = np.zeros((nb_subfr, MAX_SHAPE_LPC_ORDER), np.int32)
        for kk in range(nb_subfr):
            AR[kk, :len(r["AR_Q13"][kk])] = r["AR_Q13"][kk]
        out["AR_Q13"].append(AR)
        out["HarmShapePacked"].append(np.asarray(
            [i32((g >> 2) | (((g >> 1) & 0xFFFF) << 16))
             for g in r["Harm_Q14"]], np.int32))
        out["Tilt_Q14"].append(np.asarray(r["Tilt_Q14"], np.int32))
        out["LF_shp_Q14"].append(np.asarray(r["LF_shp_Q14"], np.int32))
        out["pitchL"].append(np.asarray(r["pitchL"][:nb_subfr],
                                        np.int32))
        out["Gain_Q10"].append(np.asarray(
            [g >> 6 for g in r["Gains_Q16"]], np.int32))
        inv26, inv_rw, adjs = [], [], []
        prev = new_prev[b]
        for kk in range(nb_subfr):
            g = max(int(r["Gains_Q16"][kk]), 1)
            inv31 = INVERSE32_varQ(g, 47)
            inv26.append(RSHIFT_ROUND(inv31, 5))
            inv_rw.append(i32(SMULWB(inv31, r["LTP_scale_Q14"]) << 2)
                          if kk == 0 else inv31)
            gk = int(r["Gains_Q16"][kk])
            adjs.append(DIV32_varQ(prev, gk, 16)
                        if gk != prev else (1 << 16))
            prev = gk if gk != prev else prev
        new_prev[b] = prev
        out["inv_gain_Q26"].append(np.asarray(inv26, np.int32))
        out["inv_gain_rw_Q31"].append(np.asarray(inv_rw, np.int32))
        out["gain_adj_Q16"].append(np.asarray(adjs, np.int32))
    return ({k: jnp.asarray(np.stack(v)) for k, v in out.items()},
            new_prev)
