"""Noise-shaping quantizer — exact fixed-point port of silk/NSQ.c
(silk_NSQ_c, silk_noise_shape_quantizer, silk_nsq_scale_states and the
NSQ.h helper loops).

This is the heart of the SILK encoder: per-sample quantisation of the
LTP+LPC residual with AR/LF/harmonic noise shaping feedback and
dither-driven two-level RD decisions.  It is defined in exact int32
arithmetic; the decoder reconstructs xq identically from the pulses it
emits.
"""

from __future__ import annotations

from typing import List

import numpy as np

from . import tables as T
from .decoder import lpc_analysis_filter as silk_lpc_analysis_filter
from .sigproc import (ADD_SAT32, DIV32_varQ, INVERSE32_varQ, LIMIT, RAND,
                      RSHIFT_ROUND, SMLABB, SMLAWB, SMLAWT, SMULBB, SMULWB,
                      SMULWW, i32, sat16)

MAX_LPC_ORDER = 16
MAX_SHAPE_LPC_ORDER = 24
NSQ_LPC_BUF_LENGTH = 16
LTP_ORDER = 5
TYPE_VOICED = 2
QUANT_LEVEL_ADJUST_Q10 = 80
HARM_SHAPE_FIR_TAPS = 3
MAX_FRAME_LENGTH = 320


class NsqState:
    """silk_nsq_state (structs.h:60-73)."""

    def __init__(self):
        self.xq = [0] * (2 * MAX_FRAME_LENGTH)
        self.sLTP_shp_Q14 = [0] * (2 * MAX_FRAME_LENGTH)
        self.sLPC_Q14 = [0] * (160 + NSQ_LPC_BUF_LENGTH)
        self.sAR2_Q14 = [0] * MAX_SHAPE_LPC_ORDER
        self.sLF_AR_shp_Q14 = 0
        self.sDiff_shp_Q14 = 0
        self.lagPrev = 100
        self.sLTP_buf_idx = 0
        self.sLTP_shp_buf_idx = 0
        self.rand_seed = 0
        self.prev_gain_Q16 = 65536
        self.rewhite_flag = 0

    def copy(self) -> "NsqState":
        s = NsqState.__new__(NsqState)
        s.xq = list(self.xq)
        s.sLTP_shp_Q14 = list(self.sLTP_shp_Q14)
        s.sLPC_Q14 = list(self.sLPC_Q14)
        s.sAR2_Q14 = list(self.sAR2_Q14)
        for a in ("sLF_AR_shp_Q14", "sDiff_shp_Q14", "lagPrev",
                  "sLTP_buf_idx", "sLTP_shp_buf_idx", "rand_seed",
                  "prev_gain_Q16", "rewhite_flag"):
            setattr(s, a, getattr(self, a))
        return s


def _short_prediction(buf: List[int], pos: int, coef: List[int],
                      order: int) -> int:
    """silk_noise_shape_quantizer_short_prediction_c (NSQ.h:35-63)."""
    out = order >> 1
    for j in range(order):
        out = SMLAWB(out, buf[pos - j], coef[j])
    return out


def _noise_shape_feedback(sDiff: int, sAR2: List[int], coef,
                          order: int) -> int:
    """silk_NSQ_noise_shape_feedback_loop_c (NSQ.h:67-93); mutates
    sAR2.  Returns n_AR in Q12."""
    tmp2 = sDiff
    tmp1 = sAR2[0]
    sAR2[0] = tmp2
    out = order >> 1
    out = SMLAWB(out, tmp2, int(coef[0]))
    for j in range(2, order, 2):
        tmp2 = sAR2[j - 1]
        sAR2[j - 1] = tmp1
        out = SMLAWB(out, tmp1, int(coef[j - 1]))
        tmp1 = sAR2[j]
        sAR2[j] = tmp2
        out = SMLAWB(out, tmp2, int(coef[j]))
    sAR2[order - 1] = tmp1
    out = SMLAWB(out, tmp1, int(coef[order - 1]))
    return i32(out << 1)


def _scale_states(enc, NSQ: NsqState, x16, x_off: int, sLTP, sLTP_Q15,
                  subfr: int, LTP_scale_Q14: int, Gains_Q16, pitchL,
                  signal_type: int):
    """silk_nsq_scale_states (NSQ.c:317-380).  Returns x_sc_Q10."""
    lag = pitchL[subfr]
    inv_gain_Q31 = INVERSE32_varQ(max(Gains_Q16[subfr], 1), 47)
    inv_gain_Q26 = RSHIFT_ROUND(inv_gain_Q31, 5)
    x_sc_Q10 = [SMULWW(int(x16[x_off + i]), inv_gain_Q26)
                for i in range(enc.subfr_length)]
    if NSQ.rewhite_flag:
        if subfr == 0:
            inv_gain_Q31 = i32(SMULWB(inv_gain_Q31, LTP_scale_Q14) << 2)
        for i in range(NSQ.sLTP_buf_idx - lag - LTP_ORDER // 2,
                       NSQ.sLTP_buf_idx):
            sLTP_Q15[i] = SMULWB(inv_gain_Q31, sLTP[i])
    if Gains_Q16[subfr] != NSQ.prev_gain_Q16:
        gain_adj_Q16 = DIV32_varQ(NSQ.prev_gain_Q16, Gains_Q16[subfr], 16)
        for i in range(NSQ.sLTP_shp_buf_idx - enc.ltp_mem_length,
                       NSQ.sLTP_shp_buf_idx):
            NSQ.sLTP_shp_Q14[i] = SMULWW(gain_adj_Q16,
                                         NSQ.sLTP_shp_Q14[i])
        if signal_type == TYPE_VOICED and NSQ.rewhite_flag == 0:
            for i in range(NSQ.sLTP_buf_idx - lag - LTP_ORDER // 2,
                           NSQ.sLTP_buf_idx):
                sLTP_Q15[i] = SMULWW(gain_adj_Q16, sLTP_Q15[i])
        NSQ.sLF_AR_shp_Q14 = SMULWW(gain_adj_Q16, NSQ.sLF_AR_shp_Q14)
        NSQ.sDiff_shp_Q14 = SMULWW(gain_adj_Q16, NSQ.sDiff_shp_Q14)
        for i in range(NSQ_LPC_BUF_LENGTH):
            NSQ.sLPC_Q14[i] = SMULWW(gain_adj_Q16, NSQ.sLPC_Q14[i])
        for i in range(MAX_SHAPE_LPC_ORDER):
            NSQ.sAR2_Q14[i] = SMULWW(gain_adj_Q16, NSQ.sAR2_Q14[i])
        NSQ.prev_gain_Q16 = Gains_Q16[subfr]
    return x_sc_Q10


def _quantize_subframe(NSQ: NsqState, signal_type: int, x_sc_Q10,
                       pulses, p_off: int, xq_out, xq_off: int,
                       sLTP_Q15, a_Q12, b_Q14, AR_shp_Q13, lag: int,
                       HarmShapeFIRPacked_Q14: int, Tilt_Q14: int,
                       LF_shp_Q14: int, Gain_Q16: int, Lambda_Q10: int,
                       offset_Q10: int, length: int,
                       shaping_order: int, predict_order: int):
    """silk_noise_shape_quantizer (NSQ.c:186-315)."""
    shp_lag = NSQ.sLTP_shp_buf_idx - lag + HARM_SHAPE_FIR_TAPS // 2
    pred_lag = NSQ.sLTP_buf_idx - lag + LTP_ORDER // 2
    Gain_Q10 = Gain_Q16 >> 6
    psLPC = NSQ_LPC_BUF_LENGTH - 1
    sLPC = NSQ.sLPC_Q14
    shp_buf = NSQ.sLTP_shp_Q14
    for i in range(length):
        NSQ.rand_seed = RAND(NSQ.rand_seed)
        LPC_pred_Q10 = _short_prediction(sLPC, psLPC, a_Q12,
                                         predict_order)
        if signal_type == TYPE_VOICED:
            LTP_pred_Q13 = 2
            for j in range(5):
                LTP_pred_Q13 = SMLAWB(LTP_pred_Q13,
                                      sLTP_Q15[pred_lag - j],
                                      int(b_Q14[j]))
            pred_lag += 1
        else:
            LTP_pred_Q13 = 0
        n_AR_Q12 = _noise_shape_feedback(NSQ.sDiff_shp_Q14, NSQ.sAR2_Q14,
                                         AR_shp_Q13, shaping_order)
        n_AR_Q12 = SMLAWB(n_AR_Q12, NSQ.sLF_AR_shp_Q14, Tilt_Q14)
        n_LF_Q12 = SMULWB(shp_buf[NSQ.sLTP_shp_buf_idx - 1], LF_shp_Q14)
        n_LF_Q12 = SMLAWT(n_LF_Q12, NSQ.sLF_AR_shp_Q14, LF_shp_Q14)
        tmp1 = i32((LPC_pred_Q10 << 2) - n_AR_Q12)
        tmp1 = i32(tmp1 - n_LF_Q12)
        if lag > 0:
            n_LTP_Q13 = SMULWB(ADD_SAT32(shp_buf[shp_lag],
                                         shp_buf[shp_lag - 2]),
                               HarmShapeFIRPacked_Q14)
            n_LTP_Q13 = SMLAWT(n_LTP_Q13, shp_buf[shp_lag - 1],
                               HarmShapeFIRPacked_Q14)
            n_LTP_Q13 = i32(n_LTP_Q13 << 1)
            shp_lag += 1
            tmp2 = i32(LTP_pred_Q13 - n_LTP_Q13)
            tmp1 = i32(tmp2 + (tmp1 << 1))
            tmp1 = RSHIFT_ROUND(tmp1, 3)
        else:
            tmp1 = RSHIFT_ROUND(tmp1, 2)
        r_Q10 = i32(x_sc_Q10[i] - tmp1)
        if NSQ.rand_seed < 0:
            r_Q10 = -r_Q10
        r_Q10 = LIMIT(r_Q10, -(31 << 10), 30 << 10)

        q1_Q10 = i32(r_Q10 - offset_Q10)
        q1_Q0 = q1_Q10 >> 10
        if Lambda_Q10 > 2048:
            rdo_offset = Lambda_Q10 // 2 - 512
            if q1_Q10 > rdo_offset:
                q1_Q0 = (q1_Q10 - rdo_offset) >> 10
            elif q1_Q10 < -rdo_offset:
                q1_Q0 = (q1_Q10 + rdo_offset) >> 10
            elif q1_Q10 < 0:
                q1_Q0 = -1
            else:
                q1_Q0 = 0
        if q1_Q0 > 0:
            q1_Q10 = i32((q1_Q0 << 10) - QUANT_LEVEL_ADJUST_Q10)
            q1_Q10 = i32(q1_Q10 + offset_Q10)
            q2_Q10 = i32(q1_Q10 + 1024)
            rd1_Q20 = SMULBB(q1_Q10, Lambda_Q10)
            rd2_Q20 = SMULBB(q2_Q10, Lambda_Q10)
        elif q1_Q0 == 0:
            q1_Q10 = offset_Q10
            q2_Q10 = i32(q1_Q10 + 1024 - QUANT_LEVEL_ADJUST_Q10)
            rd1_Q20 = SMULBB(q1_Q10, Lambda_Q10)
            rd2_Q20 = SMULBB(q2_Q10, Lambda_Q10)
        elif q1_Q0 == -1:
            q2_Q10 = offset_Q10
            q1_Q10 = i32(q2_Q10 - (1024 - QUANT_LEVEL_ADJUST_Q10))
            rd1_Q20 = SMULBB(-q1_Q10, Lambda_Q10)
            rd2_Q20 = SMULBB(q2_Q10, Lambda_Q10)
        else:
            q1_Q10 = i32((q1_Q0 << 10) + QUANT_LEVEL_ADJUST_Q10)
            q1_Q10 = i32(q1_Q10 + offset_Q10)
            q2_Q10 = i32(q1_Q10 + 1024)
            rd1_Q20 = SMULBB(-q1_Q10, Lambda_Q10)
            rd2_Q20 = SMULBB(-q2_Q10, Lambda_Q10)
        rr_Q10 = i32(r_Q10 - q1_Q10)
        rd1_Q20 = SMLABB(rd1_Q20, rr_Q10, rr_Q10)
        rr_Q10 = i32(r_Q10 - q2_Q10)
        rd2_Q20 = SMLABB(rd2_Q20, rr_Q10, rr_Q10)
        if rd2_Q20 < rd1_Q20:
            q1_Q10 = q2_Q10
        pulses[p_off + i] = RSHIFT_ROUND(q1_Q10, 10)

        exc_Q14 = i32(q1_Q10 << 4)
        if NSQ.rand_seed < 0:
            exc_Q14 = -exc_Q14
        LPC_exc_Q14 = i32(exc_Q14 + (LTP_pred_Q13 << 1))
        xq_Q14 = i32(LPC_exc_Q14 + (LPC_pred_Q10 << 4))
        xq_out[xq_off + i] = sat16(RSHIFT_ROUND(SMULWW(xq_Q14, Gain_Q10),
                                                8))
        psLPC += 1
        sLPC[psLPC] = xq_Q14
        NSQ.sDiff_shp_Q14 = i32(xq_Q14 - (x_sc_Q10[i] << 4))
        sLF_AR = i32(NSQ.sDiff_shp_Q14 - (n_AR_Q12 << 2))
        NSQ.sLF_AR_shp_Q14 = sLF_AR
        shp_buf[NSQ.sLTP_shp_buf_idx] = i32(sLF_AR - (n_LF_Q12 << 2))
        sLTP_Q15[NSQ.sLTP_buf_idx] = i32(LPC_exc_Q14 << 1)
        NSQ.sLTP_shp_buf_idx += 1
        NSQ.sLTP_buf_idx += 1
        NSQ.rand_seed = i32(NSQ.rand_seed + pulses[p_off + i])
    NSQ.sLPC_Q14[:NSQ_LPC_BUF_LENGTH] = \
        NSQ.sLPC_Q14[length:length + NSQ_LPC_BUF_LENGTH]


def nsq(enc, NSQ: NsqState, indices, x16, PredCoef_Q12, LTPCoef_Q14,
        AR_Q13, HarmShapeGain_Q14, Tilt_Q14, LF_shp_Q14, Gains_Q16,
        pitchL, Lambda_Q10: int, LTP_scale_Q14: int) -> List[int]:
    """silk_NSQ_c (NSQ.c:69-184).  Returns pulses[frame_length];
    updates NSQ state (xq holds the quantised output history)."""
    NSQ.rand_seed = indices.Seed
    lag = NSQ.lagPrev
    offset_Q10 = int(T.Quantization_Offsets_Q10[
        indices.signalType >> 1][indices.quantOffsetType])
    LSF_interp_flag = 0 if indices.NLSFInterpCoef_Q2 == 4 else 1

    total = enc.ltp_mem_length + enc.frame_length
    sLTP_Q15 = [0] * total
    sLTP = [0] * total
    pulses = [0] * enc.frame_length
    NSQ.sLTP_shp_buf_idx = enc.ltp_mem_length
    NSQ.sLTP_buf_idx = enc.ltp_mem_length
    pxq = enc.ltp_mem_length
    x_off = 0
    p_off = 0
    for k in range(enc.nb_subfr):
        a_row = ((k >> 1) | (1 - LSF_interp_flag))
        A_Q12 = PredCoef_Q12[a_row]
        B_Q14 = LTPCoef_Q14[k * LTP_ORDER:(k + 1) * LTP_ORDER]
        AR_shp = AR_Q13[k]
        HarmShapeFIRPacked = (HarmShapeGain_Q14[k] >> 2) \
            | ((HarmShapeGain_Q14[k] >> 1) << 16)
        NSQ.rewhite_flag = 0
        if indices.signalType == TYPE_VOICED:
            lag = pitchL[k]
            if (k & (3 - (LSF_interp_flag << 1))) == 0:
                start_idx = enc.ltp_mem_length - lag \
                    - enc.predictLPCOrder - LTP_ORDER // 2
                assert start_idx > 0
                res = silk_lpc_analysis_filter(
                    NSQ.xq, start_idx + k * enc.subfr_length,
                    [int(v) for v in A_Q12[:enc.predictLPCOrder]],
                    enc.ltp_mem_length - start_idx, enc.predictLPCOrder)
                sLTP[start_idx:enc.ltp_mem_length] = res
                NSQ.rewhite_flag = 1
                NSQ.sLTP_buf_idx = enc.ltp_mem_length
        x_sc_Q10 = _scale_states(enc, NSQ, x16, x_off, sLTP, sLTP_Q15,
                                 k, LTP_scale_Q14, Gains_Q16, pitchL,
                                 indices.signalType)
        _quantize_subframe(NSQ, indices.signalType, x_sc_Q10, pulses,
                           p_off, NSQ.xq, pxq, sLTP_Q15, A_Q12, B_Q14,
                           AR_shp, lag, HarmShapeFIRPacked, Tilt_Q14[k],
                           LF_shp_Q14[k], Gains_Q16[k], Lambda_Q10,
                           offset_Q10, enc.subfr_length,
                           enc.shapingLPCOrder, enc.predictLPCOrder)
        x_off += enc.subfr_length
        p_off += enc.subfr_length
        pxq += enc.subfr_length
    NSQ.lagPrev = pitchL[enc.nb_subfr - 1]
    NSQ.xq[:enc.ltp_mem_length] = \
        NSQ.xq[enc.frame_length:enc.frame_length + enc.ltp_mem_length]
    NSQ.sLTP_shp_Q14[:enc.ltp_mem_length] = \
        NSQ.sLTP_shp_Q14[enc.frame_length:
                         enc.frame_length + enc.ltp_mem_length]
    return pulses


# ----------------------------------------------------------------------
# Delayed-decision NSQ (silk/NSQ_del_dec.c) — the quality path used at
# complexity >= 2 and whenever warped noise shaping is active.

DECISION_DELAY = 40
MAX_DEL_DEC_STATES = 4


class _DelDecState:
    """NSQ_del_dec_struct (NSQ_del_dec.c:33-47)."""

    def __init__(self, sub_len: int):
        self.sLPC_Q14 = [0] * (sub_len + NSQ_LPC_BUF_LENGTH)
        self.RandState = [0] * DECISION_DELAY
        self.Q_Q10 = [0] * DECISION_DELAY
        self.Xq_Q14 = [0] * DECISION_DELAY
        self.Pred_Q15 = [0] * DECISION_DELAY
        self.Shape_Q14 = [0] * DECISION_DELAY
        self.sAR2_Q14 = [0] * MAX_SHAPE_LPC_ORDER
        self.LF_AR_Q14 = 0
        self.Diff_Q14 = 0
        self.Seed = 0
        self.SeedInit = 0
        self.RD_Q10 = 0

    def copy_from(self, other: "_DelDecState", i: int):
        """The partial-struct overwrite (NSQ_del_dec.c:545-547): keep
        this state's sLPC_Q14[:i], take everything else from other."""
        self.sLPC_Q14[i:] = other.sLPC_Q14[i:]
        self.RandState = list(other.RandState)
        self.Q_Q10 = list(other.Q_Q10)
        self.Xq_Q14 = list(other.Xq_Q14)
        self.Pred_Q15 = list(other.Pred_Q15)
        self.Shape_Q14 = list(other.Shape_Q14)
        self.sAR2_Q14 = list(other.sAR2_Q14)
        self.LF_AR_Q14 = other.LF_AR_Q14
        self.Diff_Q14 = other.Diff_Q14
        self.Seed = other.Seed
        self.SeedInit = other.SeedInit
        self.RD_Q10 = other.RD_Q10


def _dd_scale_states(enc, NSQ, dd_states, x16, x_off, sLTP, sLTP_Q15,
                     subfr, LTP_scale_Q14, Gains_Q16, pitchL,
                     signal_type, decision_delay):
    """silk_nsq_del_dec_scale_states (NSQ_del_dec.c:580-650)."""
    lag = pitchL[subfr]
    inv_gain_Q31 = INVERSE32_varQ(max(Gains_Q16[subfr], 1), 47)
    inv_gain_Q26 = RSHIFT_ROUND(inv_gain_Q31, 5)
    x_sc_Q10 = [SMULWW(int(x16[x_off + i]), inv_gain_Q26)
                for i in range(enc.subfr_length)]
    if NSQ.rewhite_flag:
        if subfr == 0:
            inv_gain_Q31 = i32(SMULWB(inv_gain_Q31, LTP_scale_Q14) << 2)
        for i in range(NSQ.sLTP_buf_idx - lag - LTP_ORDER // 2,
                       NSQ.sLTP_buf_idx):
            sLTP_Q15[i] = SMULWB(inv_gain_Q31, sLTP[i])
    if Gains_Q16[subfr] != NSQ.prev_gain_Q16:
        adj = DIV32_varQ(NSQ.prev_gain_Q16, Gains_Q16[subfr], 16)
        for i in range(NSQ.sLTP_shp_buf_idx - enc.ltp_mem_length,
                       NSQ.sLTP_shp_buf_idx):
            NSQ.sLTP_shp_Q14[i] = SMULWW(adj, NSQ.sLTP_shp_Q14[i])
        if signal_type == TYPE_VOICED and NSQ.rewhite_flag == 0:
            for i in range(NSQ.sLTP_buf_idx - lag - LTP_ORDER // 2,
                           NSQ.sLTP_buf_idx - decision_delay):
                sLTP_Q15[i] = SMULWW(adj, sLTP_Q15[i])
        for dd in dd_states:
            dd.LF_AR_Q14 = SMULWW(adj, dd.LF_AR_Q14)
            dd.Diff_Q14 = SMULWW(adj, dd.Diff_Q14)
            for i in range(NSQ_LPC_BUF_LENGTH):
                dd.sLPC_Q14[i] = SMULWW(adj, dd.sLPC_Q14[i])
            for i in range(MAX_SHAPE_LPC_ORDER):
                dd.sAR2_Q14[i] = SMULWW(adj, dd.sAR2_Q14[i])
            for i in range(DECISION_DELAY):
                dd.Pred_Q15[i] = SMULWW(adj, dd.Pred_Q15[i])
                dd.Shape_Q14[i] = SMULWW(adj, dd.Shape_Q14[i])
        NSQ.prev_gain_Q16 = Gains_Q16[subfr]
    return x_sc_Q10


def nsq_del_dec(enc, NSQ: NsqState, indices, x16, PredCoef_Q12,
                LTPCoef_Q14, AR_Q13, HarmShapeGain_Q14, Tilt_Q14,
                LF_shp_Q14, Gains_Q16, pitchL, Lambda_Q10: int,
                LTP_scale_Q14: int) -> List[int]:
    """silk_NSQ_del_dec_c (NSQ_del_dec.c:104-326)."""
    from .sigproc import ADD_SAT32 as _adds, SUB_SAT32 as _subs
    n_states = enc.nStatesDelayedDecision
    lag = NSQ.lagPrev
    dd_states = [_DelDecState(enc.subfr_length) for _ in range(n_states)]
    for k, dd in enumerate(dd_states):
        dd.Seed = (k + indices.Seed) & 3
        dd.SeedInit = dd.Seed
        dd.LF_AR_Q14 = NSQ.sLF_AR_shp_Q14
        dd.Diff_Q14 = NSQ.sDiff_shp_Q14
        dd.Shape_Q14[0] = NSQ.sLTP_shp_Q14[enc.ltp_mem_length - 1]
        dd.sLPC_Q14[:NSQ_LPC_BUF_LENGTH] = \
            NSQ.sLPC_Q14[:NSQ_LPC_BUF_LENGTH]
        dd.sAR2_Q14 = list(NSQ.sAR2_Q14)
    offset_Q10 = int(T.Quantization_Offsets_Q10[
        indices.signalType >> 1][indices.quantOffsetType])
    smpl_buf_idx = 0
    decision_delay = min(DECISION_DELAY, enc.subfr_length)
    if indices.signalType == TYPE_VOICED:
        for k in range(enc.nb_subfr):
            decision_delay = min(decision_delay,
                                 pitchL[k] - LTP_ORDER // 2 - 1)
    elif lag > 0:
        decision_delay = min(decision_delay, lag - LTP_ORDER // 2 - 1)
    LSF_interp_flag = 0 if indices.NLSFInterpCoef_Q2 == 4 else 1

    total = enc.ltp_mem_length + enc.frame_length
    sLTP_Q15 = [0] * total
    sLTP = [0] * total
    delayed_gain = [0] * DECISION_DELAY
    pulses = [0] * enc.frame_length
    NSQ.sLTP_shp_buf_idx = enc.ltp_mem_length
    NSQ.sLTP_buf_idx = enc.ltp_mem_length
    pxq = enc.ltp_mem_length
    x_off = 0
    p_off = 0
    subfr = 0
    for k in range(enc.nb_subfr):
        A_Q12 = PredCoef_Q12[(k >> 1) | (1 - LSF_interp_flag)]
        B_Q14 = LTPCoef_Q14[k * LTP_ORDER:(k + 1) * LTP_ORDER]
        AR_shp = AR_Q13[k]
        Harm = (HarmShapeGain_Q14[k] >> 2) \
            | ((HarmShapeGain_Q14[k] >> 1) << 16)
        NSQ.rewhite_flag = 0
        if indices.signalType == TYPE_VOICED:
            lag = pitchL[k]
            if (k & (3 - (LSF_interp_flag << 1))) == 0:
                if k == 2:
                    # mid-frame winner flush (NSQ_del_dec.c:195-226)
                    w = min(range(n_states),
                            key=lambda j: dd_states[j].RD_Q10)
                    for j in range(n_states):
                        if j != w:
                            dd_states[j].RD_Q10 = i32(
                                dd_states[j].RD_Q10
                                + (0x7FFFFFFF >> 4))
                    dd = dd_states[w]
                    last = smpl_buf_idx + decision_delay
                    for i in range(decision_delay):
                        last = (last - 1) % DECISION_DELAY
                        pulses[p_off + i - decision_delay] = \
                            RSHIFT_ROUND(dd.Q_Q10[last], 10)
                        NSQ.xq[pxq + i - decision_delay] = sat16(
                            RSHIFT_ROUND(SMULWW(dd.Xq_Q14[last],
                                                Gains_Q16[1]), 14))
                        NSQ.sLTP_shp_Q14[NSQ.sLTP_shp_buf_idx
                                         - decision_delay + i] = \
                            dd.Shape_Q14[last]
                    subfr = 0
                start_idx = enc.ltp_mem_length - lag \
                    - enc.predictLPCOrder - LTP_ORDER // 2
                res = silk_lpc_analysis_filter(
                    NSQ.xq, start_idx + k * enc.subfr_length,
                    [int(v) for v in A_Q12[:enc.predictLPCOrder]],
                    enc.ltp_mem_length - start_idx, enc.predictLPCOrder)
                sLTP[start_idx:enc.ltp_mem_length] = res
                NSQ.sLTP_buf_idx = enc.ltp_mem_length
                NSQ.rewhite_flag = 1
        x_sc_Q10 = _dd_scale_states(enc, NSQ, dd_states, x16, x_off,
                                    sLTP, sLTP_Q15, k, LTP_scale_Q14,
                                    Gains_Q16, pitchL,
                                    indices.signalType, decision_delay)
        # ---- per-subframe quantizer (NSQ_del_dec.c:330-577) ----
        shp_lag = NSQ.sLTP_shp_buf_idx - lag + HARM_SHAPE_FIR_TAPS // 2
        pred_lag = NSQ.sLTP_buf_idx - lag + LTP_ORDER // 2
        Gain_Q10 = Gains_Q16[k] >> 6
        length = enc.subfr_length
        warping = enc.warping_Q16
        sh_order = enc.shapingLPCOrder
        pr_order = enc.predictLPCOrder
        for i in range(length):
            if indices.signalType == TYPE_VOICED:
                LTP_pred = 2
                for j in range(5):
                    LTP_pred = SMLAWB(LTP_pred, sLTP_Q15[pred_lag - j],
                                      int(B_Q14[j]))
                LTP_pred = i32(LTP_pred << 1)
                pred_lag += 1
            else:
                LTP_pred = 0
            if lag > 0:
                n_LTP = SMULWB(ADD_SAT32(
                    NSQ.sLTP_shp_Q14[shp_lag],
                    NSQ.sLTP_shp_Q14[shp_lag - 2]), Harm)
                n_LTP = SMLAWT(n_LTP, NSQ.sLTP_shp_Q14[shp_lag - 1],
                               Harm)
                n_LTP = i32(LTP_pred - (n_LTP << 2))
                shp_lag += 1
            else:
                n_LTP = 0
            cand = []
            for kk in range(n_states):
                dd = dd_states[kk]
                dd.Seed = RAND(dd.Seed)
                ps = NSQ_LPC_BUF_LENGTH - 1 + i
                LPC_pred = _short_prediction(dd.sLPC_Q14, ps, A_Q12,
                                             pr_order)
                LPC_pred = i32(LPC_pred << 4)
                # warped noise shape feedback (NSQ_del_dec.c:375-398)
                tmp2 = SMLAWB(dd.Diff_Q14, dd.sAR2_Q14[0], warping)
                tmp1 = SMLAWB(dd.sAR2_Q14[0],
                              i32(dd.sAR2_Q14[1] - tmp2), warping)
                dd.sAR2_Q14[0] = tmp2
                n_AR = sh_order >> 1
                n_AR = SMLAWB(n_AR, tmp2, int(AR_shp[0]))
                for j in range(2, sh_order, 2):
                    tmp2 = SMLAWB(dd.sAR2_Q14[j - 1],
                                  i32(dd.sAR2_Q14[j] - tmp1), warping)
                    dd.sAR2_Q14[j - 1] = tmp1
                    n_AR = SMLAWB(n_AR, tmp1, int(AR_shp[j - 1]))
                    tmp1 = SMLAWB(dd.sAR2_Q14[j],
                                  i32(dd.sAR2_Q14[j + 1] - tmp2),
                                  warping)
                    dd.sAR2_Q14[j] = tmp2
                    n_AR = SMLAWB(n_AR, tmp2, int(AR_shp[j]))
                dd.sAR2_Q14[sh_order - 1] = tmp1
                n_AR = SMLAWB(n_AR, tmp1, int(AR_shp[sh_order - 1]))
                n_AR = i32(n_AR << 1)
                n_AR = SMLAWB(n_AR, dd.LF_AR_Q14, Tilt_Q14[k])
                n_AR = i32(n_AR << 2)
                n_LF = SMULWB(dd.Shape_Q14[smpl_buf_idx], LF_shp_Q14[k])
                n_LF = SMLAWT(n_LF, dd.LF_AR_Q14, LF_shp_Q14[k])
                n_LF = i32(n_LF << 2)
                tmp1 = _adds(n_AR, n_LF)
                tmp2 = i32(n_LTP + LPC_pred)
                tmp1 = _subs(tmp2, tmp1)
                tmp1 = RSHIFT_ROUND(tmp1, 4)
                r_Q10 = i32(x_sc_Q10[i] - tmp1)
                if dd.Seed < 0:
                    r_Q10 = -r_Q10
                r_Q10 = LIMIT(r_Q10, -(31 << 10), 30 << 10)
                q1_Q10 = i32(r_Q10 - offset_Q10)
                q1_Q0 = q1_Q10 >> 10
                if Lambda_Q10 > 2048:
                    rdo = Lambda_Q10 // 2 - 512
                    if q1_Q10 > rdo:
                        q1_Q0 = (q1_Q10 - rdo) >> 10
                    elif q1_Q10 < -rdo:
                        q1_Q0 = (q1_Q10 + rdo) >> 10
                    elif q1_Q10 < 0:
                        q1_Q0 = -1
                    else:
                        q1_Q0 = 0
                if q1_Q0 > 0:
                    q1_Q10 = i32((q1_Q0 << 10) - QUANT_LEVEL_ADJUST_Q10
                                 + offset_Q10)
                    q2_Q10 = i32(q1_Q10 + 1024)
                    rd1 = SMULBB(q1_Q10, Lambda_Q10)
                    rd2 = SMULBB(q2_Q10, Lambda_Q10)
                elif q1_Q0 == 0:
                    q1_Q10 = offset_Q10
                    q2_Q10 = i32(q1_Q10 + 1024 - QUANT_LEVEL_ADJUST_Q10)
                    rd1 = SMULBB(q1_Q10, Lambda_Q10)
                    rd2 = SMULBB(q2_Q10, Lambda_Q10)
                elif q1_Q0 == -1:
                    q2_Q10 = offset_Q10
                    q1_Q10 = i32(q2_Q10 - (1024 - QUANT_LEVEL_ADJUST_Q10))
                    rd1 = SMULBB(-q1_Q10, Lambda_Q10)
                    rd2 = SMULBB(q2_Q10, Lambda_Q10)
                else:
                    q1_Q10 = i32((q1_Q0 << 10) + QUANT_LEVEL_ADJUST_Q10
                                 + offset_Q10)
                    q2_Q10 = i32(q1_Q10 + 1024)
                    rd1 = SMULBB(-q1_Q10, Lambda_Q10)
                    rd2 = SMULBB(-q2_Q10, Lambda_Q10)
                rr = i32(r_Q10 - q1_Q10)
                rd1 = SMLABB(rd1, rr, rr) >> 10
                rr = i32(r_Q10 - q2_Q10)
                rd2 = SMLABB(rd2, rr, rr) >> 10
                if rd1 < rd2:
                    ss0 = [i32(dd.RD_Q10 + rd1), q1_Q10]
                    ss1 = [i32(dd.RD_Q10 + rd2), q2_Q10]
                else:
                    ss0 = [i32(dd.RD_Q10 + rd2), q2_Q10]
                    ss1 = [i32(dd.RD_Q10 + rd1), q1_Q10]
                pair = []
                for rd_q10, q_q10 in (ss0, ss1):
                    exc = i32(q_q10 << 4)
                    if dd.Seed < 0:
                        exc = -exc
                    LPC_exc = i32(exc + LTP_pred)
                    xq_Q14 = i32(LPC_exc + LPC_pred)
                    diff = i32(xq_Q14 - (x_sc_Q10[i] << 4))
                    slf = i32(diff - n_AR)
                    shp = _subs(slf, n_LF)
                    pair.append({"RD": rd_q10, "Q": q_q10, "xq": xq_Q14,
                                 "LF_AR": slf, "Diff": diff,
                                 "shp": shp, "LPC_exc": LPC_exc})
                cand.append(pair)
            smpl_buf_idx = (smpl_buf_idx - 1) % DECISION_DELAY
            if smpl_buf_idx < 0:
                smpl_buf_idx += DECISION_DELAY
            last = (smpl_buf_idx + decision_delay) % DECISION_DELAY
            w = min(range(n_states), key=lambda j: cand[j][0]["RD"])
            w_rand = dd_states[w].RandState[last]
            for j in range(n_states):
                if dd_states[j].RandState[last] != w_rand:
                    cand[j][0]["RD"] = i32(cand[j][0]["RD"]
                                           + (0x7FFFFFFF >> 4))
                    cand[j][1]["RD"] = i32(cand[j][1]["RD"]
                                           + (0x7FFFFFFF >> 4))
            rdmax_i = max(range(n_states),
                          key=lambda j: cand[j][0]["RD"])
            rdmin_i = min(range(n_states),
                          key=lambda j: cand[j][1]["RD"])
            if cand[rdmin_i][1]["RD"] < cand[rdmax_i][0]["RD"]:
                dd_states[rdmax_i].copy_from(dd_states[rdmin_i], i)
                cand[rdmax_i][0] = dict(cand[rdmin_i][1])
            dd = dd_states[w]
            if subfr > 0 or i >= decision_delay:
                pulses[p_off + i - decision_delay] = \
                    RSHIFT_ROUND(dd.Q_Q10[last], 10)
                NSQ.xq[pxq + i - decision_delay] = sat16(RSHIFT_ROUND(
                    SMULWW(dd.Xq_Q14[last], delayed_gain[last]), 8))
                NSQ.sLTP_shp_Q14[NSQ.sLTP_shp_buf_idx
                                 - decision_delay] = dd.Shape_Q14[last]
                sLTP_Q15[NSQ.sLTP_buf_idx - decision_delay] = \
                    dd.Pred_Q15[last]
            NSQ.sLTP_shp_buf_idx += 1
            NSQ.sLTP_buf_idx += 1
            for j in range(n_states):
                dd = dd_states[j]
                ss = cand[j][0]
                dd.LF_AR_Q14 = ss["LF_AR"]
                dd.Diff_Q14 = ss["Diff"]
                dd.sLPC_Q14[NSQ_LPC_BUF_LENGTH + i] = ss["xq"]
                dd.Xq_Q14[smpl_buf_idx] = ss["xq"]
                dd.Q_Q10[smpl_buf_idx] = ss["Q"]
                dd.Pred_Q15[smpl_buf_idx] = i32(ss["LPC_exc"] << 1)
                dd.Shape_Q14[smpl_buf_idx] = ss["shp"]
                dd.Seed = i32(dd.Seed + RSHIFT_ROUND(ss["Q"], 10))
                dd.RandState[smpl_buf_idx] = dd.Seed
                dd.RD_Q10 = ss["RD"]
            delayed_gain[smpl_buf_idx] = Gain_Q10
        for dd in dd_states:
            dd.sLPC_Q14[:NSQ_LPC_BUF_LENGTH] = \
                dd.sLPC_Q14[length:length + NSQ_LPC_BUF_LENGTH]
        subfr += 1
        x_off += enc.subfr_length
        p_off += enc.subfr_length
        pxq += enc.subfr_length

    w = min(range(n_states), key=lambda j: dd_states[j].RD_Q10)
    dd = dd_states[w]
    indices.Seed = dd.SeedInit
    last = smpl_buf_idx + decision_delay
    Gain_Q10 = Gains_Q16[enc.nb_subfr - 1] >> 6
    for i in range(decision_delay):
        last = (last - 1) % DECISION_DELAY
        pulses[p_off + i - decision_delay] = \
            RSHIFT_ROUND(dd.Q_Q10[last], 10)
        NSQ.xq[pxq + i - decision_delay] = sat16(RSHIFT_ROUND(
            SMULWW(dd.Xq_Q14[last], Gain_Q10), 8))
        NSQ.sLTP_shp_Q14[NSQ.sLTP_shp_buf_idx - decision_delay + i] = \
            dd.Shape_Q14[last]
    NSQ.sLPC_Q14[:NSQ_LPC_BUF_LENGTH] = \
        dd.sLPC_Q14[enc.subfr_length:
                    enc.subfr_length + NSQ_LPC_BUF_LENGTH]
    NSQ.sAR2_Q14 = list(dd.sAR2_Q14)
    NSQ.sLF_AR_shp_Q14 = dd.LF_AR_Q14
    NSQ.sDiff_shp_Q14 = dd.Diff_Q14
    NSQ.lagPrev = pitchL[enc.nb_subfr - 1]
    NSQ.xq[:enc.ltp_mem_length] = \
        NSQ.xq[enc.frame_length:enc.frame_length + enc.ltp_mem_length]
    NSQ.sLTP_shp_Q14[:enc.ltp_mem_length] = \
        NSQ.sLTP_shp_Q14[enc.frame_length:
                         enc.frame_length + enc.ltp_mem_length]
    return pulses
