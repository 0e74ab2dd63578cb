"""SILK stereo encoding: adaptive Left/Right to Mid/Side conversion.

Exact fixed-point port of silk/stereo_LR_to_MS.c,
stereo_find_predictor.c and stereo_quant_pred.c: per-frame LS
predictors for the side channel from LP/HP-split mid, width
smoothing/collapse decisions (panned-mono, zero-width transitions), and
interpolated prediction subtraction matching the decoder's
stereo_MS_to_LR reconstruction.
"""

from __future__ import annotations

from typing import List

import numpy as np

from . import tables as T
from .sigproc import (DIV32_varQ, LIMIT, RSHIFT_ROUND, SMLABB, SMLAWB,
                      SMULBB, SMULWB, SQRT_APPROX, i32, sat16,
                      sum_sqr_shift)

STEREO_QUANT_TAB_SIZE = 16
STEREO_QUANT_SUB_STEPS = 5
STEREO_INTERP_LEN_MS = 8
STEREO_RATIO_SMOOTH_COEF = 0.01
LA_SHAPE_MS = 5
INT32_MAX = 0x7FFFFFFF


def _fix(c, q):
    return int(c * (1 << q) + 0.5)


class StereoEncState:
    """stereo_enc_state (structs.h)."""

    def __init__(self):
        self.pred_prev_Q13 = [0, 0]
        self.sMid = [0, 0]
        self.sSide = [0, 0]
        self.mid_side_amp_Q0 = [0, 1, 0, 1]
        self.smth_width_Q14 = 1 << 14
        self.width_prev_Q14 = 0
        self.silent_side_len = 0
        self.predIx = [[[0, 0, 0], [0, 0, 0]] for _ in range(3)]
        self.mid_only_flags = [0, 0, 0]


def stereo_quant_pred(pred_q13: List[int]):
    """silk_stereo_quant_pred (stereo_quant_pred.c:36-73).
    Returns (quantised pred_q13 [with pred0 -= pred1], ix[2][3])."""
    ix = [[0, 0, 0], [0, 0, 0]]
    out = list(pred_q13)
    tab = T.stereo_pred_quant_Q13
    step_c = _fix(0.5 / STEREO_QUANT_SUB_STEPS, 16)
    for n in range(2):
        err_min = INT32_MAX
        quant = 0
        done = False
        for i in range(STEREO_QUANT_TAB_SIZE - 1):
            low = int(tab[i])
            step = SMULWB(int(tab[i + 1]) - low, step_c)
            for j in range(STEREO_QUANT_SUB_STEPS):
                lvl = SMLABB(low, step, 2 * j + 1)
                err = abs(out[n] - lvl)
                if err < err_min:
                    err_min = err
                    quant = lvl
                    ix[n][0] = i
                    ix[n][1] = j
                else:
                    done = True
                    break
            if done:
                break
        ix[n][2] = ix[n][0] // 3
        ix[n][0] -= ix[n][2] * 3
        out[n] = quant
    out[0] -= out[1]
    return out, ix


def stereo_find_predictor(x, y, mid_res_amp_q0, off: int, length: int,
                          smooth_coef_q16: int):
    """silk_stereo_find_predictor (stereo_find_predictor.c:35-79).
    Returns (pred_Q13, ratio_Q14); updates mid_res_amp_q0[off:off+2]."""
    nrgx, scale1 = sum_sqr_shift(x, length)
    nrgy, scale2 = sum_sqr_shift(y, length)
    scale = max(scale1, scale2)
    scale += scale & 1
    nrgy >>= scale - scale2
    nrgx >>= scale - scale1
    nrgx = max(nrgx, 1)
    corr = 0
    for i in range(length):
        corr = i32(corr + (SMULBB(int(x[i]), int(y[i])) >> scale))
    pred_q13 = DIV32_varQ(corr, nrgx, 13)
    pred_q13 = LIMIT(pred_q13, -(1 << 14), 1 << 14)
    pred2_q10 = SMULWB(pred_q13, pred_q13)
    smooth_coef_q16 = max(smooth_coef_q16, abs(pred2_q10))
    scale >>= 1
    mid_res_amp_q0[off] = SMLAWB(
        mid_res_amp_q0[off],
        i32((SQRT_APPROX(nrgx) << scale)) - mid_res_amp_q0[off],
        smooth_coef_q16)
    nrgy = i32(nrgy - (SMULWB(corr, pred_q13) << 4))
    nrgy = i32(nrgy + (SMULWB(nrgx, pred2_q10) << 6))
    mid_res_amp_q0[off + 1] = SMLAWB(
        mid_res_amp_q0[off + 1],
        i32((SQRT_APPROX(nrgy) << scale)) - mid_res_amp_q0[off + 1],
        smooth_coef_q16)
    ratio_q14 = DIV32_varQ(mid_res_amp_q0[off + 1],
                           max(mid_res_amp_q0[off], 1), 14)
    ratio_q14 = LIMIT(ratio_q14, 0, 32767)
    return pred_q13, ratio_q14


def stereo_lr_to_ms(state: StereoEncState, x1: np.ndarray, x2: np.ndarray,
                    total_rate_bps: int, prev_speech_act_q8: int,
                    to_mono: bool, fs_khz: int, frame_length: int):
    """silk_stereo_LR_to_MS (stereo_LR_to_MS.c:35-215).

    x1/x2: int arrays [frame_length] (left/right).  Returns
    (mid [frame_length+2 incl. 2-sample history], side_out
    [frame_length], ix, mid_only_flag, mid_side_rates_bps)."""
    x1 = np.asarray(x1, np.int64)
    x2 = np.asarray(x2, np.int64)
    n2 = frame_length + 2
    mid = np.zeros(n2, np.int64)
    side = np.zeros(n2, np.int64)
    # convert (indices shifted: mid[n] corresponds to x[n-2]);
    # mid wraps via the int16 cast, side saturates (stereo_LR_to_MS.c:59-64)
    s = x1 + x2
    d = x1 - x2
    for n in range(frame_length):
        v = RSHIFT_ROUND(int(s[n]), 1) & 0xFFFF
        mid[n + 2] = v - 0x10000 if v & 0x8000 else v
        side[n + 2] = sat16(RSHIFT_ROUND(int(d[n]), 1))
    mid[0], mid[1] = state.sMid
    side[0], side[1] = state.sSide
    state.sMid = [int(mid[frame_length]), int(mid[frame_length + 1])]
    state.sSide = [int(side[frame_length]), int(side[frame_length + 1])]

    LP_mid = np.empty(frame_length, np.int64)
    HP_mid = np.empty(frame_length, np.int64)
    LP_side = np.empty(frame_length, np.int64)
    HP_side = np.empty(frame_length, np.int64)
    for n in range(frame_length):
        v = RSHIFT_ROUND(int(mid[n] + mid[n + 2] + (mid[n + 1] << 1)), 2)
        LP_mid[n] = v
        HP_mid[n] = mid[n + 1] - v
        v = RSHIFT_ROUND(int(side[n] + side[n + 2]
                             + (side[n + 1] << 1)), 2)
        LP_side[n] = v
        HP_side[n] = side[n + 1] - v

    is10ms = frame_length == 10 * fs_khz
    smooth = _fix(STEREO_RATIO_SMOOTH_COEF / 2, 16) if is10ms \
        else _fix(STEREO_RATIO_SMOOTH_COEF, 16)
    smooth = SMULWB(SMULBB(prev_speech_act_q8, prev_speech_act_q8),
                    smooth)
    pred0, lp_ratio = stereo_find_predictor(LP_mid, LP_side,
                                            state.mid_side_amp_Q0, 0,
                                            frame_length, smooth)
    pred1, hp_ratio = stereo_find_predictor(HP_mid, HP_side,
                                            state.mid_side_amp_Q0, 2,
                                            frame_length, smooth)
    pred_q13 = [pred0, pred1]
    frac_q16 = SMLABB(hp_ratio, lp_ratio, 3)
    frac_q16 = min(frac_q16, 1 << 16)

    total_rate_bps -= 1200 if is10ms else 600
    total_rate_bps = max(total_rate_bps, 1)
    min_mid = SMLABB(2000, fs_khz, 600)
    frac3 = 3 * frac_q16
    rates = [0, 0]
    rates[0] = DIV32_varQ(total_rate_bps, _fix(13, 16) + frac3, 16 + 3)
    if rates[0] < min_mid:
        rates[0] = min_mid
        rates[1] = total_rate_bps - rates[0]
        width_q14 = DIV32_varQ((rates[1] << 1) - min_mid,
                               SMULWB((1 << 16) + frac3, min_mid),
                               14 + 2)
        width_q14 = LIMIT(width_q14, 0, 1 << 14)
    else:
        rates[1] = total_rate_bps - rates[0]
        width_q14 = 1 << 14
    state.smth_width_Q14 = SMLAWB(state.smth_width_Q14,
                                  width_q14 - state.smth_width_Q14,
                                  smooth)

    mid_only = 0
    if to_mono:
        width_q14 = 0
        pred_q13 = [0, 0]
        pred_q13, ix = stereo_quant_pred(pred_q13)
    elif state.width_prev_Q14 == 0 and \
            (8 * total_rate_bps < 13 * min_mid
             or SMULWB(frac_q16, state.smth_width_Q14) < _fix(0.05, 14)):
        pred_q13[0] = SMULBB(state.smth_width_Q14, pred_q13[0]) >> 14
        pred_q13[1] = SMULBB(state.smth_width_Q14, pred_q13[1]) >> 14
        pred_q13, ix = stereo_quant_pred(pred_q13)
        width_q14 = 0
        pred_q13 = [0, 0]
        rates[0] = total_rate_bps
        rates[1] = 0
        mid_only = 1
    elif state.width_prev_Q14 != 0 and \
            (8 * total_rate_bps < 11 * min_mid
             or SMULWB(frac_q16, state.smth_width_Q14) < _fix(0.02, 14)):
        pred_q13[0] = SMULBB(state.smth_width_Q14, pred_q13[0]) >> 14
        pred_q13[1] = SMULBB(state.smth_width_Q14, pred_q13[1]) >> 14
        pred_q13, ix = stereo_quant_pred(pred_q13)
        width_q14 = 0
        pred_q13 = [0, 0]
    elif state.smth_width_Q14 > _fix(0.95, 14):
        pred_q13, ix = stereo_quant_pred(pred_q13)
        width_q14 = 1 << 14
    else:
        pred_q13[0] = SMULBB(state.smth_width_Q14, pred_q13[0]) >> 14
        pred_q13[1] = SMULBB(state.smth_width_Q14, pred_q13[1]) >> 14
        pred_q13, ix = stereo_quant_pred(pred_q13)
        width_q14 = state.smth_width_Q14

    # keep encoding the tapered side (stereo_LR_to_MS.c:180-192)
    if mid_only == 1:
        state.silent_side_len += frame_length \
            - STEREO_INTERP_LEN_MS * fs_khz
        if state.silent_side_len < LA_SHAPE_MS * fs_khz:
            mid_only = 0
        else:
            state.silent_side_len = 10000
    else:
        state.silent_side_len = 0
    if mid_only == 0 and rates[1] < 1:
        rates[1] = 1
        rates[0] = max(1, total_rate_bps - rates[1])

    # interpolate predictors + subtract prediction (…:196-215)
    side_out = np.zeros(frame_length + 1, np.int64)
    p0 = -state.pred_prev_Q13[0]
    p1 = -state.pred_prev_Q13[1]
    w_q24 = state.width_prev_Q14 << 10
    interp_len = STEREO_INTERP_LEN_MS * fs_khz
    denom = (1 << 16) // interp_len
    d0 = -RSHIFT_ROUND(SMULBB(pred_q13[0] - state.pred_prev_Q13[0],
                              denom), 16)
    d1 = -RSHIFT_ROUND(SMULBB(pred_q13[1] - state.pred_prev_Q13[1],
                              denom), 16)
    dw = SMULWB(width_q14 - state.width_prev_Q14, denom) << 10
    for n in range(interp_len):
        p0 += d0
        p1 += d1
        w_q24 = i32(w_q24 + dw)
        s_ = i32((int(mid[n] + mid[n + 2] + (mid[n + 1] << 1))) << 9)
        s_ = SMLAWB(SMULWB(w_q24, int(side[n + 1])), s_, p0)
        s_ = SMLAWB(s_, i32(int(mid[n + 1]) << 11), p1)
        side_out[n] = sat16(RSHIFT_ROUND(s_, 8))
    p0 = -pred_q13[0]
    p1 = -pred_q13[1]
    w_q24 = width_q14 << 10
    for n in range(interp_len, frame_length):
        s_ = i32((int(mid[n] + mid[n + 2] + (mid[n + 1] << 1))) << 9)
        s_ = SMLAWB(SMULWB(w_q24, int(side[n + 1])), s_, p0)
        s_ = SMLAWB(s_, i32(int(mid[n + 1]) << 11), p1)
        side_out[n] = sat16(RSHIFT_ROUND(s_, 8))
    state.pred_prev_Q13 = [int(pred_q13[0]), int(pred_q13[1])]
    state.width_prev_Q14 = int(width_q14)
    return (np.asarray(mid), side_out[:frame_length], ix, mid_only,
            rates)
