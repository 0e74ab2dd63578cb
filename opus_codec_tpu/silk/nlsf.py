"""NLSF decoding and LPC conversion (exact fixed point).

Behavioural parity: /root/reference/opus/silk/NLSF_decode.c, NLSF_unpack.c,
NLSF_stabilize.c, NLSF2A.c, LPC_fit.c, LPC_inv_pred_gain.c, bwexpander.c,
bwexpander_32.c.
"""

from __future__ import annotations

from typing import List

import numpy as np

from . import tables as T
from .sigproc import (CLZ32, DIV32, DIV32_16, INVERSE32_varQ, LIMIT,
                      RSHIFT_ROUND, SMLABB, SMLAWB, SMMUL, SMULBB, SMULWB,
                      SMULWW, SUB_SAT32, i32, sat16)

__all__ = ["NLSFCodebook", "CB_WB", "CB_NB_MB", "nlsf_unpack", "nlsf_decode",
           "nlsf_stabilize", "nlsf2a", "lpc_fit", "lpc_inverse_pred_gain",
           "bwexpander", "bwexpander_32"]

NLSF_QUANT_MAX_AMPLITUDE = 4
NLSF_QUANT_LEVEL_ADJ_Q10 = 102  # SILK_FIX_CONST(0.1, 10)
MAX_LPC_STABILIZE_ITERATIONS = 16
QA = 16  # NLSF2A internal precision
QA_PRED = 24  # LPC_inv_pred_gain precision
A_LIMIT = int(0.99975 * (1 << QA_PRED) + 0.5)


class NLSFCodebook:
    def __init__(self, n_vectors, order, quant_step_q16, cb1_nlsf_q8,
                 cb1_wght_q9, cb1_icdf, pred_q8, ec_sel, ec_icdf,
                 delta_min_q15, ec_rates_q5=None):
        self.n_vectors = n_vectors
        self.order = order
        self.quant_step_q16 = quant_step_q16
        self.cb1_nlsf_q8 = cb1_nlsf_q8
        self.cb1_wght_q9 = cb1_wght_q9
        self.cb1_icdf = cb1_icdf
        self.pred_q8 = pred_q8
        self.ec_sel = ec_sel
        self.ec_icdf = ec_icdf
        self.delta_min_q15 = delta_min_q15
        self.ec_rates_q5 = ec_rates_q5


# tables_NLSF_CB_WB.c:34-45 / tables_NLSF_CB_NB_MB.c struct definitions
CB_WB = NLSFCodebook(32, 16, int(0.15 * 65536 + 0.5), T.NLSF_CB1_WB_Q8,
                     T.NLSF_CB1_WB_Wght_Q9, T.NLSF_CB1_iCDF_WB,
                     T.NLSF_PRED_WB_Q8, T.NLSF_CB2_SELECT_WB,
                     T.NLSF_CB2_iCDF_WB, T.NLSF_DELTA_MIN_WB_Q15,
                     T.NLSF_CB2_BITS_WB_Q5)
CB_NB_MB = NLSFCodebook(32, 10, int(0.18 * 65536 + 0.5), T.NLSF_CB1_NB_MB_Q8,
                        T.NLSF_CB1_Wght_Q9, T.NLSF_CB1_iCDF_NB_MB,
                        T.NLSF_PRED_NB_MB_Q8, T.NLSF_CB2_SELECT_NB_MB,
                        T.NLSF_CB2_iCDF_NB_MB, T.NLSF_DELTA_MIN_NB_MB_Q15,
                        T.NLSF_CB2_BITS_NB_MB_Q5)


def nlsf_unpack(cb: NLSFCodebook, cb1_index: int):
    """NLSF_unpack.c:36-56. Returns (ec_ix, pred_Q8) lists."""
    order = cb.order
    ec_ix = [0] * order
    pred = [0] * order
    sel = cb.ec_sel[cb1_index * order // 2:]
    for i in range(0, order, 2):
        entry = int(sel[i // 2])
        ec_ix[i] = ((entry >> 1) & 7) * (2 * NLSF_QUANT_MAX_AMPLITUDE + 1)
        pred[i] = int(cb.pred_q8[i + (entry & 1) * (order - 1)])
        ec_ix[i + 1] = ((entry >> 5) & 7) * (2 * NLSF_QUANT_MAX_AMPLITUDE + 1)
        pred[i + 1] = int(cb.pred_q8[i + ((entry >> 4) & 1) * (order - 1) + 1])
    return ec_ix, pred


def _residual_dequant(indices, pred_q8, quant_step_q16, order):
    """NLSF_decode.c:36-59."""
    res_q10 = [0] * order
    out_q10 = 0
    for i in range(order - 1, -1, -1):
        pred_q10 = SMULBB(out_q10, pred_q8[i]) >> 8
        out_q10 = indices[i] << 10
        if out_q10 > 0:
            out_q10 -= NLSF_QUANT_LEVEL_ADJ_Q10
        elif out_q10 < 0:
            out_q10 += NLSF_QUANT_LEVEL_ADJ_Q10
        out_q10 = SMLAWB(pred_q10, out_q10, quant_step_q16)
        res_q10[i] = out_q10
    return res_q10


def nlsf_decode(indices, cb: NLSFCodebook):
    """NLSF_decode.c:62-94. indices[0] = CB1 index; indices[1:] residual."""
    ec_ix, pred_q8 = nlsf_unpack(cb, indices[0])
    res_q10 = _residual_dequant(indices[1:], pred_q8, cb.quant_step_q16,
                                cb.order)
    nlsf_q15 = [0] * cb.order
    cb_el = cb.cb1_nlsf_q8[indices[0] * cb.order:]
    cb_w = cb.cb1_wght_q9[indices[0] * cb.order:]
    for i in range(cb.order):
        tmp = DIV32_16(i32(res_q10[i] << 14), int(cb_w[i])) \
            + (int(cb_el[i]) << 7)
        nlsf_q15[i] = LIMIT(tmp, 0, 32767)
    nlsf_stabilize(nlsf_q15, cb.delta_min_q15, cb.order)
    return nlsf_q15


def nlsf_stabilize(nlsf_q15: List[int], delta_min_q15, L: int):
    """NLSF_stabilize.c:46-141 (in place)."""
    MAX_LOOPS = 20
    dmin = [int(x) for x in delta_min_q15]
    for _ in range(MAX_LOOPS):
        min_diff = nlsf_q15[0] - dmin[0]
        I = 0
        for i in range(1, L):
            diff = nlsf_q15[i] - (nlsf_q15[i - 1] + dmin[i])
            if diff < min_diff:
                min_diff = diff
                I = i
        diff = (1 << 15) - (nlsf_q15[L - 1] + dmin[L])
        if diff < min_diff:
            min_diff = diff
            I = L
        if min_diff >= 0:
            return
        if I == 0:
            nlsf_q15[0] = dmin[0]
        elif I == L:
            nlsf_q15[L - 1] = (1 << 15) - dmin[L]
        else:
            min_center = sum(dmin[:I]) + (dmin[I] >> 1)
            max_center = (1 << 15) - (dmin[I] >> 1)
            for k in range(L, I, -1):
                max_center -= dmin[k]
            center = LIMIT(RSHIFT_ROUND(nlsf_q15[I - 1] + nlsf_q15[I], 1),
                           min_center, max_center)
            nlsf_q15[I - 1] = center - (dmin[I] >> 1)
            nlsf_q15[I] = nlsf_q15[I - 1] + dmin[I]
    # fallback (insertion sort + clamping)
    nlsf_q15.sort()
    nlsf_q15[0] = max(nlsf_q15[0], dmin[0])
    for i in range(1, L):
        nlsf_q15[i] = max(nlsf_q15[i], sat16(nlsf_q15[i - 1] + dmin[i]))
    nlsf_q15[L - 1] = min(nlsf_q15[L - 1], (1 << 15) - dmin[L])
    for i in range(L - 2, -1, -1):
        nlsf_q15[i] = min(nlsf_q15[i], nlsf_q15[i + 1] - dmin[i + 1])


_ORDERING16 = (0, 15, 8, 7, 4, 11, 12, 3, 2, 13, 10, 5, 6, 9, 14, 1)
_ORDERING10 = (0, 9, 6, 3, 4, 5, 8, 1, 2, 7)


def _find_poly(clsf, dd):
    """NLSF2A.c:44-62. clsf: pre-strided 2*cos values in QA (the C passes
    the interleaved array and reads cLSF[2k]; we pass the stride-2 slice)."""
    out = [0] * (dd + 1)
    out[0] = 1 << QA
    out[1] = -clsf[0]
    for k in range(1, dd):
        ftmp = clsf[k]
        out[k + 1] = i32((out[k - 1] << 1)
                         - RSHIFT_ROUND(ftmp * out[k], QA))
        for n in range(k, 1, -1):
            out[n] = i32(out[n] + out[n - 2]
                         - RSHIFT_ROUND(ftmp * out[n - 1], QA))
        out[1] -= ftmp
    return out


def nlsf2a(nlsf_q15, d: int):
    """NLSF2A.c:66-140. Returns a_Q12 list of ints."""
    ordering = _ORDERING16 if d == 16 else _ORDERING10
    cos_lsf_qa = [0] * d
    for k in range(d):
        f_int = nlsf_q15[k] >> (15 - 7)
        f_frac = nlsf_q15[k] - (f_int << (15 - 7))
        cos_val = int(T.LSFCosTab_FIX_Q12[f_int])
        delta = int(T.LSFCosTab_FIX_Q12[f_int + 1]) - cos_val
        cos_lsf_qa[ordering[k]] = RSHIFT_ROUND(
            (cos_val << 8) + delta * f_frac, 20 - QA)
    dd = d >> 1
    P = _find_poly(cos_lsf_qa[0::2], dd)
    Q = _find_poly(cos_lsf_qa[1::2], dd)
    a32_qa1 = [0] * d
    for k in range(dd):
        Ptmp = P[k + 1] + P[k]
        Qtmp = Q[k + 1] - Q[k]
        a32_qa1[k] = i32(-Qtmp - Ptmp)
        a32_qa1[d - k - 1] = i32(Qtmp - Ptmp)
    a_q12 = lpc_fit(a32_qa1, 12, QA + 1, d)
    i = 0
    while lpc_inverse_pred_gain(a_q12, d) == 0 and \
            i < MAX_LPC_STABILIZE_ITERATIONS:
        bwexpander_32(a32_qa1, d, 65536 - (2 << i))
        for k in range(d):
            a_q12[k] = RSHIFT_ROUND(a32_qa1[k], QA + 1 - 12)
        i += 1
    return a_q12


def lpc_fit(a_qin: List[int], QOUT: int, QIN: int, d: int):
    """LPC_fit.c:36-83. a_qin modified in place; returns a_qout list."""
    a_qout = [0] * d
    for it in range(10):
        maxabs = 0
        idx = 0
        for k in range(d):
            absval = abs(a_qin[k])
            if absval > maxabs:
                maxabs = absval
                idx = k
        maxabs = RSHIFT_ROUND(maxabs, QIN - QOUT)
        if maxabs > 0x7FFF:
            maxabs = min(maxabs, 163838)
            chirp_q16 = int(0.999 * 65536 + 0.5) - DIV32(
                (maxabs - 0x7FFF) << 14, (maxabs * (idx + 1)) >> 2)
            bwexpander_32(a_qin, d, chirp_q16)
        else:
            break
    else:
        it = 10
    if it == 10:
        for k in range(d):
            a_qout[k] = sat16(RSHIFT_ROUND(a_qin[k], QIN - QOUT))
            a_qin[k] = a_qout[k] << (QIN - QOUT)
    else:
        for k in range(d):
            a_qout[k] = RSHIFT_ROUND(a_qin[k], QIN - QOUT)
    return a_qout


def _inverse_pred_gain_qa(A_QA: List[int], order: int) -> int:
    """LPC_inv_pred_gain.c:43-120."""
    inv_gain_q30 = 1 << 30
    min_inv = int((1.0 / 1e4) * (1 << 30))
    for k in range(order - 1, 0, -1):
        if A_QA[k] > A_LIMIT or A_QA[k] < -A_LIMIT:
            return 0
        rc_q31 = i32(-(A_QA[k] << (31 - QA_PRED)))
        rc_mult1_q30 = i32((1 << 30) - SMMUL(rc_q31, rc_q31))
        inv_gain_q30 = i32(SMMUL(inv_gain_q30, rc_mult1_q30) << 2)
        if inv_gain_q30 < min_inv:
            return 0
        mult2q = 32 - CLZ32(abs(rc_mult1_q30))
        rc_mult2 = INVERSE32_varQ(rc_mult1_q30, mult2q + 30)
        for n in range((k + 1) >> 1):
            tmp1 = A_QA[n]
            tmp2 = A_QA[k - n - 1]
            t64 = RSHIFT_ROUND(
                SUB_SAT32(tmp1, i32((tmp2 * rc_q31) >> 31)) * rc_mult2,
                mult2q)
            if t64 > 0x7FFFFFFF or t64 < -0x80000000:
                return 0
            A_QA[n] = t64
            t64 = RSHIFT_ROUND(
                SUB_SAT32(tmp2, i32((tmp1 * rc_q31) >> 31)) * rc_mult2,
                mult2q)
            if t64 > 0x7FFFFFFF or t64 < -0x80000000:
                return 0
            A_QA[k - n - 1] = t64
    if A_QA[0] > A_LIMIT or A_QA[0] < -A_LIMIT:
        return 0
    rc_q31 = i32(-(A_QA[0] << (31 - QA_PRED)))
    rc_mult1_q30 = i32((1 << 30) - SMMUL(rc_q31, rc_q31))
    inv_gain_q30 = i32(SMMUL(inv_gain_q30, rc_mult1_q30) << 2)
    if inv_gain_q30 < min_inv:
        return 0
    return inv_gain_q30


def lpc_inverse_pred_gain(a_q12, order: int) -> int:
    """LPC_inv_pred_gain.c:124-146."""
    dc_resp = 0
    atmp = [0] * order
    for k in range(order):
        dc_resp += a_q12[k]
        atmp[k] = a_q12[k] << (QA_PRED - 12)
    if dc_resp >= 4096:
        return 0
    return _inverse_pred_gain_qa(atmp, order)


def bwexpander(ar: List[int], d: int, chirp_q16: int):
    """bwexpander.c (16-bit variant, in place)."""
    chirp_minus_one_q16 = chirp_q16 - 65536
    for i in range(d - 1):
        ar[i] = RSHIFT_ROUND(chirp_q16 * ar[i], 16)
        chirp_q16 += RSHIFT_ROUND(chirp_q16 * chirp_minus_one_q16, 16)
    ar[d - 1] = RSHIFT_ROUND(chirp_q16 * ar[d - 1], 16)


def bwexpander_32(ar: List[int], d: int, chirp_q16: int):
    """bwexpander_32.c:36-50 (in place)."""
    chirp_minus_one_q16 = chirp_q16 - 65536
    for i in range(d - 1):
        ar[i] = SMULWW(chirp_q16, ar[i])
        chirp_q16 += RSHIFT_ROUND(chirp_q16 * chirp_minus_one_q16, 16)
    ar[d - 1] = SMULWW(chirp_q16, ar[d - 1])
