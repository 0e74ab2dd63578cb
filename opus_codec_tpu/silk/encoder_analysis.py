"""SILK encoder analysis half: noise shaping, prediction coefficient
search, NLSF/LTP quantisation and gain processing.

Float analysis follows silk/float/ (noise_shape_analysis_FLP.c,
find_pred_coefs_FLP.c, find_LPC_FLP.c, find_LTP_FLP.c,
LTP_analysis_filter_FLP.c, LTP_scale_ctrl_FLP.c, residual_energy_FLP.c,
process_gains_FLP.c, burg_modified_FLP.c); quantisation uses exact
fixed-point ports of A2NLSF.c, process_NLSFs.c, NLSF_encode.c,
NLSF_VQ.c, NLSF_del_dec_quant.c, NLSF_VQ_weights_laroia.c,
quant_LTP_gains.c and VQ_WMat_EC.c so the chosen indices reconstruct
identically in the bit-exact decoder.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from . import tables as T
from .encoder_pitch import (apply_sine_window, autocorrelation, bwexpander,
                            k2a, lpc_analysis_filter, schur)
from .nlsf import NLSFCodebook, nlsf_decode, nlsf_stabilize, nlsf2a, \
    nlsf_unpack
from .sigproc import (ADD_SAT32, DIV32_varQ, LIMIT, SMLABB, SMLAWB, SMULBB,
                      SMULWB, i32, lin2log, log2lin, sat16)

MAX_LPC_ORDER = 16
MAX_NB_SUBFR = 4
MAX_SHAPE_LPC_ORDER = 24
LTP_ORDER = 5
TYPE_VOICED = 2
CODE_INDEPENDENTLY = 0
CODE_CONDITIONALLY = 2
NLSF_QUANT_MAX_AMPLITUDE = 4
NLSF_QUANT_MAX_AMPLITUDE_EXT = 10
NLSF_QUANT_LEVEL_ADJ_Q10 = 102    # SILK_FIX_CONST(0.1, 10)
NLSF_QUANT_DEL_DEC_STATES = 4
NLSF_QUANT_DEL_DEC_STATES_LOG2 = 2
INT32_MAX = 0x7FFFFFFF

# tuning_parameters.h
BG_SNR_DECR_dB = 2.0
HARM_SNR_INCR_dB = 2.0
ENERGY_VARIATION_THRESHOLD_QNT_OFFSET = 0.6
WARPING_MULTIPLIER = 0.015
SHAPE_WHITE_NOISE_FRACTION = 3e-5
BANDWIDTH_EXPANSION = 0.94
HARMONIC_SHAPING = 0.3
HIGH_RATE_OR_LOW_QUALITY_HARMONIC_SHAPING = 0.2
HP_NOISE_COEF = 0.25
HARM_HP_NOISE_COEF = 0.35
LOW_FREQ_SHAPING = 4.0
LOW_QUALITY_LOW_FREQ_SHAPING_DECR = 0.5
SUBFR_SMTH_COEF = 0.4
LAMBDA_OFFSET = 1.2
LAMBDA_SPEECH_ACT = -0.2
LAMBDA_DELAYED_DECISIONS = -0.05
LAMBDA_INPUT_QUALITY = -0.1
LAMBDA_CODING_QUALITY = -0.2
LAMBDA_QUANT_OFFSET = 0.8
FIND_PITCH_WHITE_NOISE_FRACTION = 1e-3
FIND_LPC_COND_FAC = 1e-5
MAX_PREDICTION_POWER_GAIN = 1e4
MAX_PREDICTION_POWER_GAIN_AFTER_RESET = 1e2
MAX_SUM_LOG_GAIN_DB = 250.0
LTP_CORR_INV_MAX = 0.03
MIN_QGAIN_DB = 2

LTP_SCALES_TABLE_Q14 = (15565, 12288, 8192)     # tables_other.c


def ADD_POS_SAT32(a: int, b: int) -> int:
    """silk_ADD_POS_SAT32: saturates to INT32_MAX whenever the 32-bit
    sum has the sign bit set (SigProc_FIX.h)."""
    s = (a + b) & 0xFFFFFFFF
    return INT32_MAX if s & 0x80000000 else s


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + np.exp(-x))


def _f2i(x: float) -> int:
    """silk_float2int: round half away from zero."""
    return int(np.floor(x + 0.5)) if x >= 0 else int(np.ceil(x - 0.5))


def FIX_CONST(c: float, q: int) -> int:
    """SILK_FIX_CONST: (int)(c * 2**q + 0.5) — truncation after +0.5."""
    return int(c * (1 << q) + 0.5)


# ----------------------------------------------------------------------
# Noise shape analysis (noise_shape_analysis_FLP.c)

def _warped_gain(coefs: np.ndarray, lam: float) -> float:
    lam = -lam
    gain = coefs[-1]
    for c in coefs[-2::-1]:
        gain = lam * gain + c
    return 1.0 / (1.0 - lam * gain)


def _warped_true2monic_coefs(coefs: np.ndarray, lam: float,
                             limit: float) -> np.ndarray:
    coefs = coefs.copy()
    order = len(coefs)
    for i in range(order - 1, 0, -1):
        coefs[i - 1] -= lam * coefs[i]
    gain = (1.0 - lam * lam) / (1.0 + lam * coefs[0])
    coefs *= gain
    for _ in range(10):
        ind = int(np.argmax(np.abs(coefs)))
        maxabs = abs(coefs[ind])
        if maxabs <= limit:
            return coefs
        for i in range(1, order):
            coefs[i - 1] += lam * coefs[i]
        coefs /= gain
        chirp = 0.99 - (0.8 + 0.1 * 0) * (maxabs - limit) \
            / (maxabs * (ind + 1))
        coefs = bwexpander(coefs, chirp)
        for i in range(order - 1, 0, -1):
            coefs[i - 1] -= lam * coefs[i]
        gain = (1.0 - lam * lam) / (1.0 + lam * coefs[0])
        coefs *= gain
    return coefs


def _limit_coefs(coefs: np.ndarray, limit: float) -> np.ndarray:
    coefs = coefs.copy()
    for it in range(10):
        ind = int(np.argmax(np.abs(coefs)))
        maxabs = abs(coefs[ind])
        if maxabs <= limit:
            break
        chirp = 0.99 - (0.8 + 0.1 * it) * (maxabs - limit) \
            / (maxabs * (ind + 1))
        coefs = bwexpander(coefs, chirp)
    return coefs


def warped_autocorrelation(x: np.ndarray, warping: float,
                           order: int) -> np.ndarray:
    """silk_warped_autocorrelation_FLP (warped_autocorrelation_FLP.c)."""
    state = np.zeros(order + 1)
    C = np.zeros(order + 1)
    for xn in x:
        tmp1 = float(xn)
        for i in range(0, order, 2):
            tmp2 = state[i] + warping * state[i + 1] - warping * tmp1
            state[i] = tmp1
            C[i] += state[0] * tmp1
            tmp1 = state[i + 1] + warping * state[i + 2] - warping * tmp2
            state[i + 1] = tmp2
            C[i + 1] += state[0] * tmp2
        state[order] = tmp1
        C[order] += state[0] * tmp1
    return C


def noise_shape_analysis(enc, ctrl, pitch_res: np.ndarray,
                         x: np.ndarray, x_start: int):
    """silk_noise_shape_analysis_FLP (noise_shape_analysis_FLP.c:133-
    310).  ``x`` is the full x_buf; x_start indexes the frame start
    (x_ptr = x_start - la_shape)."""
    SNR_adj_dB = enc.SNR_dB_Q7 / 128.0
    ctrl.input_quality = 0.5 * (enc.input_quality_bands_Q15[0]
                                + enc.input_quality_bands_Q15[1]) / 32768.0
    ctrl.coding_quality = sigmoid(0.25 * (SNR_adj_dB - 20.0))
    if not enc.useCBR:
        b = 1.0 - enc.speech_activity_Q8 / 256.0
        SNR_adj_dB -= BG_SNR_DECR_dB * ctrl.coding_quality \
            * (0.5 + 0.5 * ctrl.input_quality) * b * b
    if enc.indices.signalType == TYPE_VOICED:
        SNR_adj_dB += HARM_SNR_INCR_dB * enc.LTPCorr
    else:
        SNR_adj_dB += (-0.4 * enc.SNR_dB_Q7 / 128.0 + 6.0) \
            * (1.0 - ctrl.input_quality)

    # sparseness / quantizer offset
    if enc.indices.signalType == TYPE_VOICED:
        enc.indices.quantOffsetType = 0
    else:
        n_samples = 2 * enc.fs_kHz
        nsegs = 5 * enc.nb_subfr // 2
        energy_variation = 0.0
        log_energy_prev = 0.0
        for k in range(nsegs):
            seg = pitch_res[k * n_samples:(k + 1) * n_samples]
            nrg = n_samples + float(np.dot(seg, seg))
            log_energy = np.log2(nrg)
            if k > 0:
                energy_variation += abs(log_energy - log_energy_prev)
            log_energy_prev = log_energy
        if energy_variation > (ENERGY_VARIATION_THRESHOLD_QNT_OFFSET
                               * (nsegs - 1)):
            enc.indices.quantOffsetType = 0
        else:
            enc.indices.quantOffsetType = 1

    strength = FIND_PITCH_WHITE_NOISE_FRACTION * ctrl.predGain
    BWExp = BANDWIDTH_EXPANSION / (1.0 + strength * strength)
    warping = enc.warping_Q16 / 65536.0 + 0.01 * ctrl.coding_quality

    flat_part = enc.fs_kHz * 3
    slope_part = (enc.shapeWinLength - flat_part) // 2
    x_ptr = x_start - enc.la_shape
    ctrl.AR = np.zeros((enc.nb_subfr, MAX_SHAPE_LPC_ORDER))
    ctrl.Gains = np.zeros(enc.nb_subfr)
    for k in range(enc.nb_subfr):
        seg = x[x_ptr:x_ptr + enc.shapeWinLength]
        xw = np.concatenate([
            apply_sine_window(seg[:slope_part], 1),
            seg[slope_part:slope_part + flat_part],
            apply_sine_window(seg[slope_part + flat_part:
                                  slope_part + flat_part + slope_part], 2)])
        x_ptr += enc.subfr_length
        if enc.warping_Q16 > 0:
            ac = warped_autocorrelation(xw, warping, enc.shapingLPCOrder)
        else:
            ac = autocorrelation(xw, enc.shapingLPCOrder + 1)
        ac[0] += ac[0] * SHAPE_WHITE_NOISE_FRACTION + 1.0
        rc, nrg = schur(ac, enc.shapingLPCOrder)
        AR = k2a(rc)
        ctrl.Gains[k] = np.sqrt(nrg)
        if enc.warping_Q16 > 0:
            ctrl.Gains[k] *= _warped_gain(AR, warping)
        AR = bwexpander(AR, BWExp)
        if enc.warping_Q16 > 0:
            AR = _warped_true2monic_coefs(AR, warping, 3.999)
        else:
            AR = _limit_coefs(AR, 3.999)
        ctrl.AR[k][:enc.shapingLPCOrder] = AR

    gain_mult = 2.0 ** (-0.16 * SNR_adj_dB)
    gain_add = 2.0 ** (0.16 * MIN_QGAIN_DB)
    ctrl.Gains = ctrl.Gains * gain_mult + gain_add

    strength = LOW_FREQ_SHAPING * (
        1.0 + LOW_QUALITY_LOW_FREQ_SHAPING_DECR
        * (enc.input_quality_bands_Q15[0] / 32768.0 - 1.0))
    strength *= enc.speech_activity_Q8 / 256.0
    ctrl.LF_MA_shp = np.zeros(enc.nb_subfr)
    ctrl.LF_AR_shp = np.zeros(enc.nb_subfr)
    if enc.indices.signalType == TYPE_VOICED:
        for k in range(enc.nb_subfr):
            b = 0.2 / enc.fs_kHz + 3.0 / ctrl.pitchL[k]
            ctrl.LF_MA_shp[k] = -1.0 + b
            ctrl.LF_AR_shp[k] = 1.0 - b - b * strength
        Tilt = -HP_NOISE_COEF - (1 - HP_NOISE_COEF) * HARM_HP_NOISE_COEF \
            * enc.speech_activity_Q8 / 256.0
    else:
        b = 1.3 / enc.fs_kHz
        ctrl.LF_MA_shp[:] = -1.0 + b
        ctrl.LF_AR_shp[:] = 1.0 - b - b * strength * 0.6
        Tilt = -HP_NOISE_COEF

    if enc.indices.signalType == TYPE_VOICED:
        HarmShapeGain = HARMONIC_SHAPING
        HarmShapeGain += HIGH_RATE_OR_LOW_QUALITY_HARMONIC_SHAPING \
            * (1.0 - (1.0 - ctrl.coding_quality) * ctrl.input_quality)
        HarmShapeGain *= np.sqrt(enc.LTPCorr)
    else:
        HarmShapeGain = 0.0

    ctrl.HarmShapeGain = np.zeros(enc.nb_subfr)
    ctrl.Tilt = np.zeros(enc.nb_subfr)
    for k in range(enc.nb_subfr):
        enc.sShape_HarmShapeGain_smth += SUBFR_SMTH_COEF * (
            HarmShapeGain - enc.sShape_HarmShapeGain_smth)
        ctrl.HarmShapeGain[k] = enc.sShape_HarmShapeGain_smth
        enc.sShape_Tilt_smth += SUBFR_SMTH_COEF * (
            Tilt - enc.sShape_Tilt_smth)
        ctrl.Tilt[k] = enc.sShape_Tilt_smth


# ----------------------------------------------------------------------
# A2NLSF (A2NLSF.c) — exact fixed point

def _a2nlsf_trans_poly(p: List[int], dd: int):
    for k in range(2, dd + 1):
        for n in range(dd, k, -1):
            p[n - 2] = i32(p[n - 2] - p[n])
        p[k - 2] = i32(p[k - 2] - (p[k] << 1))


def _a2nlsf_eval_poly(p: List[int], x: int, dd: int) -> int:
    from .sigproc import SMLAWW
    y32 = p[dd]
    x_q16 = x << 4
    for n in range(dd - 1, -1, -1):
        y32 = SMLAWW(p[n], y32, x_q16)
    return y32


def _a2nlsf_init(a_q16: List[int], dd: int):
    P = [0] * (dd + 1)
    Q = [0] * (dd + 1)
    P[dd] = 1 << 16
    Q[dd] = 1 << 16
    for k in range(dd):
        P[k] = i32(-a_q16[dd - k - 1] - a_q16[dd + k])
        Q[k] = i32(-a_q16[dd - k - 1] + a_q16[dd + k])
    for k in range(dd, 0, -1):
        P[k - 1] = i32(P[k - 1] - P[k])
        Q[k - 1] = i32(Q[k - 1] + Q[k])
    _a2nlsf_trans_poly(P, dd)
    _a2nlsf_trans_poly(Q, dd)
    return P, Q


def a2nlsf(a_q16_in: List[int], d: int) -> List[int]:
    """silk_A2NLSF (A2NLSF.c:113-244)."""
    a_q16 = list(a_q16_in)
    dd = d >> 1
    cos_tab = T.LSFCosTab_FIX_Q12
    LSF_COS_TAB_SZ = 128
    P, Q = _a2nlsf_init(a_q16, dd)
    PQ = [P, Q]
    p = P
    NLSF = [0] * d
    xlo = int(cos_tab[0])
    ylo = _a2nlsf_eval_poly(p, xlo, dd)
    if ylo < 0:
        NLSF[0] = 0
        p = Q
        ylo = _a2nlsf_eval_poly(p, xlo, dd)
        root_ix = 1
    else:
        root_ix = 0
    k = 1
    i = 0
    thr = 0
    while True:
        xhi = int(cos_tab[k])
        yhi = _a2nlsf_eval_poly(p, xhi, dd)
        if (ylo <= 0 and yhi >= thr) or (ylo >= 0 and yhi <= -thr):
            thr = 1 if yhi == 0 else 0
            ffrac = -256
            from .sigproc import DIV32, RSHIFT_ROUND
            for m in range(3):
                xmid = RSHIFT_ROUND(xlo + xhi, 1)
                ymid = _a2nlsf_eval_poly(p, xmid, dd)
                if (ylo <= 0 and ymid >= 0) or (ylo >= 0 and ymid <= 0):
                    xhi = xmid
                    yhi = ymid
                else:
                    xlo = xmid
                    ylo = ymid
                    ffrac += 128 >> m
            if abs(ylo) < 65536:
                den = ylo - yhi
                nom = (ylo << 5) + (den >> 1)
                if den != 0:
                    ffrac += DIV32(nom, den)
            else:
                q = (ylo - yhi) >> 5
                if q != 0:
                    ffrac += DIV32(ylo, q)
            NLSF[root_ix] = min((k << 8) + ffrac, 32767)
            root_ix += 1
            if root_ix >= d:
                break
            p = PQ[root_ix & 1]
            xlo = int(cos_tab[k - 1])
            ylo = (1 - (root_ix & 2)) << 12
        else:
            k += 1
            xlo = xhi
            ylo = yhi
            thr = 0
            if k > LSF_COS_TAB_SZ:
                i += 1
                if i > 16:
                    NLSF[0] = (1 << 15) // (d + 1)
                    for k in range(1, d):
                        NLSF[k] = NLSF[k - 1] + NLSF[0]
                    return NLSF
                # bandwidth expansion
                chirp = 65536 - (1 << i)
                from .sigproc import SMULWW
                cf = chirp
                for n in range(d - 1):
                    a_q16[n] = SMULWW(cf, a_q16[n])
                    cf = SMULWW(chirp, cf)
                a_q16[d - 1] = SMULWW(cf, a_q16[d - 1])
                P, Q = _a2nlsf_init(a_q16, dd)
                PQ = [P, Q]
                p = P
                xlo = int(cos_tab[0])
                ylo = _a2nlsf_eval_poly(p, xlo, dd)
                if ylo < 0:
                    NLSF[0] = 0
                    p = Q
                    ylo = _a2nlsf_eval_poly(p, xlo, dd)
                    root_ix = 1
                else:
                    root_ix = 0
                k = 1
    return NLSF


def interpolate_nlsf(x0, x1, ifact_q2: int, d: int) -> List[int]:
    """silk_interpolate (interpolate.c:36-52)."""
    return [int(x0[i]) + ((SMULBB(int(x1[i]) - int(x0[i]), ifact_q2)) >> 2)
            for i in range(d)]


# ----------------------------------------------------------------------
# NLSF weights + encode (exact fixed point)

def nlsf_vq_weights_laroia(nlsf_q15: List[int], d: int) -> List[int]:
    """silk_NLSF_VQ_weights_laroia (NLSF_W_Q = 2)."""
    NLSF_W_Q = 2
    w = [0] * d
    tmp1 = max(int(nlsf_q15[0]), 1)
    tmp1 = (1 << (15 + NLSF_W_Q)) // tmp1
    tmp2 = max(int(nlsf_q15[1]) - int(nlsf_q15[0]), 1)
    tmp2 = (1 << (15 + NLSF_W_Q)) // tmp2
    w[0] = min(tmp1 + tmp2, 32767)
    for k in range(1, d - 1, 2):
        tmp1 = max(int(nlsf_q15[k + 1]) - int(nlsf_q15[k]), 1)
        tmp1 = (1 << (15 + NLSF_W_Q)) // tmp1
        w[k] = min(tmp1 + tmp2, 32767)
        tmp2 = max(int(nlsf_q15[k + 2]) - int(nlsf_q15[k + 1]), 1)
        tmp2 = (1 << (15 + NLSF_W_Q)) // tmp2
        w[k + 1] = min(tmp1 + tmp2, 32767)
    tmp1 = max((1 << 15) - int(nlsf_q15[d - 1]), 1)
    tmp1 = (1 << (15 + NLSF_W_Q)) // tmp1
    w[d - 1] = min(tmp1 + tmp2, 32767)
    return w


def _nlsf_vq(nlsf_q15, cb: NLSFCodebook) -> List[int]:
    """silk_NLSF_VQ (NLSF_VQ.c:38-77): weighted predictive abs error."""
    K = cb.n_vectors
    order = cb.order
    err = [0] * K
    for i in range(K):
        cbi = cb.cb1_nlsf_q8[i * order:(i + 1) * order]
        wi = cb.cb1_wght_q9[i * order:(i + 1) * order]
        sum_error = 0
        pred = 0
        for m in range(order - 2, -1, -2):
            diff = int(nlsf_q15[m + 1]) - (int(cbi[m + 1]) << 7)
            diffw = SMULBB(diff, int(wi[m + 1]))
            sum_error = i32(sum_error + abs(i32(diffw - (pred >> 1))))
            pred = diffw
            diff = int(nlsf_q15[m]) - (int(cbi[m]) << 7)
            diffw = SMULBB(diff, int(wi[m]))
            sum_error = i32(sum_error + abs(i32(diffw - (pred >> 1))))
            pred = diffw
        err[i] = sum_error
    return err


def _nlsf_del_dec_quant(x_q10, w_q5, pred_q8, ec_ix, ec_rates_q5,
                        quant_step_q16: int, inv_quant_step_q6: int,
                        mu_q20: int, order: int):
    """silk_NLSF_del_dec_quant (NLSF_del_dec_quant.c:34-220).
    Returns (indices[order], RD_Q25)."""
    NS = NLSF_QUANT_DEL_DEC_STATES
    EXT = NLSF_QUANT_MAX_AMPLITUDE_EXT
    out0_tab = [0] * (2 * EXT)
    out1_tab = [0] * (2 * EXT)
    for i in range(-EXT, EXT):
        o0 = i << 10
        o1 = o0 + 1024
        if i > 0:
            o0 -= NLSF_QUANT_LEVEL_ADJ_Q10
            o1 -= NLSF_QUANT_LEVEL_ADJ_Q10
        elif i == 0:
            o1 -= NLSF_QUANT_LEVEL_ADJ_Q10
        elif i == -1:
            o0 += NLSF_QUANT_LEVEL_ADJ_Q10
        else:
            o0 += NLSF_QUANT_LEVEL_ADJ_Q10
            o1 += NLSF_QUANT_LEVEL_ADJ_Q10
        out0_tab[i + EXT] = SMULBB(o0, quant_step_q16) >> 16
        out1_tab[i + EXT] = SMULBB(o1, quant_step_q16) >> 16
    n_states = 1
    RD = [0] * (2 * NS)
    prev_out = [0] * (2 * NS)
    ind = [[0] * MAX_LPC_ORDER for _ in range(NS)]
    for i in range(order - 1, -1, -1):
        rates = ec_rates_q5[ec_ix[i]:]
        in_q10 = int(x_q10[i])
        for j in range(n_states):
            pred = SMULBB(int(pred_q8[i]), prev_out[j]) >> 8
            res = in_q10 - pred
            ind_tmp = SMULBB(inv_quant_step_q6, res) >> 16
            ind_tmp = LIMIT(ind_tmp, -EXT, EXT - 1)
            ind[j][i] = ind_tmp
            out0 = out0_tab[ind_tmp + EXT] + pred
            out1 = out1_tab[ind_tmp + EXT] + pred
            prev_out[j] = out0
            prev_out[j + n_states] = out1
            if ind_tmp + 1 >= NLSF_QUANT_MAX_AMPLITUDE:
                if ind_tmp + 1 == NLSF_QUANT_MAX_AMPLITUDE:
                    rate0 = int(rates[ind_tmp + NLSF_QUANT_MAX_AMPLITUDE])
                    rate1 = 280
                else:
                    rate0 = SMLABB(280 - 43 * NLSF_QUANT_MAX_AMPLITUDE,
                                   43, ind_tmp)
                    rate1 = rate0 + 43
            elif ind_tmp <= -NLSF_QUANT_MAX_AMPLITUDE:
                if ind_tmp == -NLSF_QUANT_MAX_AMPLITUDE:
                    rate0 = 280
                    rate1 = int(rates[ind_tmp + 1
                                      + NLSF_QUANT_MAX_AMPLITUDE])
                else:
                    rate0 = SMLABB(280 - 43 * NLSF_QUANT_MAX_AMPLITUDE,
                                   -43, ind_tmp)
                    rate1 = rate0 - 43
            else:
                rate0 = int(rates[ind_tmp + NLSF_QUANT_MAX_AMPLITUDE])
                rate1 = int(rates[ind_tmp + 1 + NLSF_QUANT_MAX_AMPLITUDE])
            RD_tmp = RD[j]
            diff = in_q10 - out0
            RD[j] = SMLABB(i32(RD_tmp + SMULBB(diff, diff)
                               * int(w_q5[i])), mu_q20, rate0)
            diff = in_q10 - out1
            RD[j + n_states] = SMLABB(i32(RD_tmp + SMULBB(diff, diff)
                                          * int(w_q5[i])), mu_q20, rate1)
        if n_states <= NS // 2:
            for j in range(n_states):
                ind[j + n_states][i] = ind[j][i] + 1
            n_states <<= 1
            for j in range(n_states, NS):
                ind[j][i] = ind[j - n_states][i]
        else:
            RD_min = [0] * NS
            RD_max = [0] * NS
            ind_sort = [0] * NS
            for j in range(NS):
                if RD[j] > RD[j + NS]:
                    RD_max[j] = RD[j]
                    RD_min[j] = RD[j + NS]
                    RD[j], RD[j + NS] = RD[j + NS], RD[j]
                    prev_out[j], prev_out[j + NS] = \
                        prev_out[j + NS], prev_out[j]
                    ind_sort[j] = j + NS
                else:
                    RD_min[j] = RD[j]
                    RD_max[j] = RD[j + NS]
                    ind_sort[j] = j
            while True:
                min_max = INT32_MAX
                max_min = 0
                ind_min_max = 0
                ind_max_min = 0
                for j in range(NS):
                    if min_max > RD_max[j]:
                        min_max = RD_max[j]
                        ind_min_max = j
                    if max_min < RD_min[j]:
                        max_min = RD_min[j]
                        ind_max_min = j
                if min_max >= max_min:
                    break
                ind_sort[ind_max_min] = ind_sort[ind_min_max] ^ NS
                RD[ind_max_min] = RD[ind_min_max + NS]
                prev_out[ind_max_min] = prev_out[ind_min_max + NS]
                RD_min[ind_max_min] = 0
                RD_max[ind_min_max] = INT32_MAX
                ind[ind_max_min] = list(ind[ind_min_max])
            for j in range(NS):
                ind[j][i] += ind_sort[j] >> NLSF_QUANT_DEL_DEC_STATES_LOG2
    ind_tmp = int(np.argmin(RD[:2 * NS]))
    min_q25 = RD[ind_tmp]
    out_ind = list(ind[ind_tmp & (NS - 1)][:order])
    out_ind[0] += ind_tmp >> NLSF_QUANT_DEL_DEC_STATES_LOG2
    return out_ind, min_q25


def nlsf_encode(nlsf_q15: List[int], cb: NLSFCodebook, w_q2: List[int],
                mu_q20: int, n_survivors: int, signal_type: int):
    """silk_NLSF_encode (NLSF_encode.c:36-132).

    Returns (indices[order+1], quantized nlsf_q15)."""
    nlsf_q15 = list(nlsf_q15)
    nlsf_stabilize(nlsf_q15, cb.delta_min_q15, cb.order)
    err = _nlsf_vq(nlsf_q15, cb)
    order_ix = np.argsort(np.array(err, np.int64), kind="stable")
    survivors = [int(v) for v in order_ix[:n_survivors]]
    best_rd = None
    best = None
    quant_step_q16 = cb.quant_step_q16
    # exact generated-table values: WB 1/0.15 -> 427, NB/MB 1/0.18 -> 356
    inv_quant_step_q6 = 427 if cb.order == 16 else 356
    for s in range(len(survivors)):
        ind1 = survivors[s]
        cbe = cb.cb1_nlsf_q8[ind1 * cb.order:(ind1 + 1) * cb.order]
        cbw = cb.cb1_wght_q9[ind1 * cb.order:(ind1 + 1) * cb.order]
        res_q10 = [0] * cb.order
        w_adj_q5 = [0] * cb.order
        for i in range(cb.order):
            nt = int(cbe[i]) << 7
            res_q10[i] = SMULBB(int(nlsf_q15[i]) - nt, int(cbw[i])) >> 14
            w_adj_q5[i] = DIV32_varQ(int(w_q2[i]),
                                     SMULBB(int(cbw[i]), int(cbw[i])), 21)
        ec_ix, pred_q8 = nlsf_unpack(cb, ind1)
        ind2, rd_q25 = _nlsf_del_dec_quant(
            res_q10, w_adj_q5, pred_q8, ec_ix, cb.ec_rates_q5,
            quant_step_q16, inv_quant_step_q6, mu_q20, cb.order)
        icdf = cb.cb1_icdf[(signal_type >> 1) * cb.n_vectors:]
        if ind1 == 0:
            prob_q8 = 256 - int(icdf[0])
        else:
            prob_q8 = int(icdf[ind1 - 1]) - int(icdf[ind1])
        bits_q7 = (8 << 7) - lin2log(prob_q8)
        rd_q25 = SMLABB(rd_q25, bits_q7, mu_q20 >> 2)
        if best_rd is None or rd_q25 < best_rd:
            best_rd = rd_q25
            best = (ind1, ind2)
    indices = [best[0]] + list(best[1])
    q_nlsf = nlsf_decode(indices, cb)
    return indices, q_nlsf


def process_nlsfs(enc, nlsf_q15: List[int], prev_nlsf_q15: List[int]):
    """silk_process_NLSFs (process_NLSFs.c:35-104).

    Returns (PredCoef_Q12[2][order], quantized nlsf_q15); sets
    enc.indices.NLSFIndices."""
    NLSF_mu_Q20 = SMLAWB(FIX_CONST(0.003, 20),
                         FIX_CONST(-0.001, 28), enc.speech_activity_Q8)
    if enc.nb_subfr == 2:
        NLSF_mu_Q20 += NLSF_mu_Q20 >> 1
    w_qw = nlsf_vq_weights_laroia(nlsf_q15, enc.predictLPCOrder)
    do_interp = enc.useInterpolatedNLSFs and \
        enc.indices.NLSFInterpCoef_Q2 < 4
    if do_interp:
        nlsf0 = interpolate_nlsf(prev_nlsf_q15, nlsf_q15,
                                 enc.indices.NLSFInterpCoef_Q2,
                                 enc.predictLPCOrder)
        w0_qw = nlsf_vq_weights_laroia(nlsf0, enc.predictLPCOrder)
        i_sqr_q15 = (SMULBB(enc.indices.NLSFInterpCoef_Q2,
                            enc.indices.NLSFInterpCoef_Q2)) << 11
        for i in range(enc.predictLPCOrder):
            w_qw[i] = (w_qw[i] >> 1) + (SMULBB(w0_qw[i], i_sqr_q15) >> 16)
    # Injectable NLSF quantizer backend: the batched device trellis
    # (silk.batch_nlsf via silk.batch_encoder's barrier) intercepts
    # here with identical inputs/outputs.
    hook = getattr(enc, "nlsf_hook", None)
    if hook is not None:
        indices, q_nlsf = hook(enc, nlsf_q15, w_qw, NLSF_mu_Q20)
    else:
        indices, q_nlsf = nlsf_encode(
            nlsf_q15, enc.psNLSF_CB, w_qw, NLSF_mu_Q20,
            enc.NLSF_MSVQ_Survivors, enc.indices.signalType)
    enc.indices.NLSFIndices = indices
    pred_q12 = [[0] * MAX_LPC_ORDER, [0] * MAX_LPC_ORDER]
    a1 = nlsf2a(q_nlsf, enc.predictLPCOrder)
    pred_q12[1][:enc.predictLPCOrder] = a1
    if do_interp:
        nlsf0 = interpolate_nlsf(prev_nlsf_q15, q_nlsf,
                                 enc.indices.NLSFInterpCoef_Q2,
                                 enc.predictLPCOrder)
        a0 = nlsf2a(nlsf0, enc.predictLPCOrder)
        pred_q12[0][:enc.predictLPCOrder] = a0
    else:
        pred_q12[0] = list(pred_q12[1])
    return pred_q12, q_nlsf


# ----------------------------------------------------------------------
# LTP (find_LTP_FLP.c, quant_LTP_gains.c, VQ_WMat_EC.c)

def find_ltp(res: np.ndarray, res_start: int, lags, subfr_length: int,
             nb_subfr: int):
    """silk_find_LTP_FLP: returns (XX [nb,25], xX [nb,5])."""
    XX = np.zeros((nb_subfr, LTP_ORDER * LTP_ORDER))
    xX = np.zeros((nb_subfr, LTP_ORDER))
    r_pos = res_start
    for k in range(nb_subfr):
        lag_pos = r_pos - (lags[k] + LTP_ORDER // 2)
        # corr matrix over columns x[lag_pos + Order-1-j ...]
        x = res[lag_pos:]
        t = res[r_pos:r_pos + subfr_length]
        # column j starts at x[Order-1-j]
        XXm = np.zeros((LTP_ORDER, LTP_ORDER))
        cols = [x[LTP_ORDER - 1 - j:LTP_ORDER - 1 - j + subfr_length]
                for j in range(LTP_ORDER)]
        for a in range(LTP_ORDER):
            for b_ in range(a, LTP_ORDER):
                v = float(np.dot(cols[a], cols[b_]))
                XXm[a][b_] = XXm[b_][a] = v
        xXv = np.array([float(np.dot(cols[j], t))
                        for j in range(LTP_ORDER)])
        # energy of r_ptr over subfr_length + LTP_ORDER (find_LTP_FLP.c:51)
        xx = float(np.dot(res[r_pos:r_pos + subfr_length + LTP_ORDER],
                          res[r_pos:r_pos + subfr_length + LTP_ORDER]))
        temp = 1.0 / max(xx, LTP_CORR_INV_MAX * 0.5
                         * (XXm[0][0] + XXm[4][4]) + 1.0)
        XX[k] = (XXm * temp).reshape(-1)
        xX[k] = xXv * temp
        r_pos += subfr_length
    return XX, xX


def _vq_wmat_ec(XX_q17, xX_q17, cb_q7, cb_gain_q7, cl_q5, subfr_len,
                max_gain_q7, L):
    """silk_VQ_WMat_EC (VQ_WMat_EC.c:40-140)."""
    neg_xX_q24 = [i32(-(int(x) << 7)) for x in xX_q17]
    best = (0, 0, INT32_MAX, 0)   # ind, res_nrg, rate_dist, gain
    rate_dist = INT32_MAX
    res_nrg_out = 0
    ind = 0
    gain_out = 0
    for k in range(L):
        row = [int(v) for v in cb_q7[k * LTP_ORDER:(k + 1) * LTP_ORDER]]
        gain_tmp = int(cb_gain_q7[k])
        sum1_q15 = FIX_CONST(1.001, 15)
        penalty = max(gain_tmp - max_gain_q7, 0) << 11
        X = [int(v) for v in XX_q17]
        s2 = i32(neg_xX_q24[0] + X[1] * row[1])
        s2 = i32(s2 + X[2] * row[2])
        s2 = i32(s2 + X[3] * row[3])
        s2 = i32(s2 + X[4] * row[4])
        s2 = i32(s2 << 1)
        s2 = i32(s2 + X[0] * row[0])
        sum1_q15 = SMLAWB(sum1_q15, s2, row[0])
        s2 = i32(neg_xX_q24[1] + X[7] * row[2])
        s2 = i32(s2 + X[8] * row[3])
        s2 = i32(s2 + X[9] * row[4])
        s2 = i32(s2 << 1)
        s2 = i32(s2 + X[6] * row[1])
        sum1_q15 = SMLAWB(sum1_q15, s2, row[1])
        s2 = i32(neg_xX_q24[2] + X[13] * row[3])
        s2 = i32(s2 + X[14] * row[4])
        s2 = i32(s2 << 1)
        s2 = i32(s2 + X[12] * row[2])
        sum1_q15 = SMLAWB(sum1_q15, s2, row[2])
        s2 = i32(neg_xX_q24[3] + X[19] * row[4])
        s2 = i32(s2 << 1)
        s2 = i32(s2 + X[18] * row[3])
        sum1_q15 = SMLAWB(sum1_q15, s2, row[3])
        s2 = i32(neg_xX_q24[4] << 1)
        s2 = i32(s2 + X[24] * row[4])
        sum1_q15 = SMLAWB(sum1_q15, s2, row[4])
        if sum1_q15 >= 0:
            bits_res_q8 = SMULBB(subfr_len,
                                 lin2log(sum1_q15 + penalty) - (15 << 7))
            bits_tot_q8 = i32(bits_res_q8 + (int(cl_q5[k]) << 2))
            if bits_tot_q8 <= rate_dist:
                rate_dist = bits_tot_q8
                res_nrg_out = sum1_q15 + penalty
                ind = k
                gain_out = gain_tmp
    return ind, res_nrg_out, rate_dist, gain_out


def quant_ltp_gains(XX: np.ndarray, xX: np.ndarray, subfr_len: int,
                    nb_subfr: int, sum_log_gain_q7: int):
    """silk_quant_LTP_gains (quant_LTP_gains.c:33-132).

    Returns (B_Q14 [nb*5], cbk_index, per_index, sum_log_gain_q7,
    pred_gain_dB_Q7)."""
    XX_q17 = np.array([_f2i(v * 131072.0) for v in XX.reshape(-1)],
                      np.int64)
    xX_q17 = np.array([_f2i(v * 131072.0) for v in xX.reshape(-1)],
                      np.int64)
    cl_tabs = (T.LTP_gain_BITS_Q5_0, T.LTP_gain_BITS_Q5_1,
               T.LTP_gain_BITS_Q5_2)
    vq_tabs = (np.asarray(T.LTP_gain_vq_0).reshape(-1),
               np.asarray(T.LTP_gain_vq_1).reshape(-1),
               np.asarray(T.LTP_gain_vq_2).reshape(-1))
    gain_tabs = (T.LTP_gain_vq_0_gain, T.LTP_gain_vq_1_gain,
                 T.LTP_gain_vq_2_gain)
    sizes = (8, 16, 32)
    min_rate_dist = INT32_MAX
    best_idx = [0] * nb_subfr
    per_index = 0
    best_sum_log_gain = 0
    final_res_nrg = 0
    for k in range(3):
        gain_safety = FIX_CONST(0.4, 7)
        temp_idx = [0] * nb_subfr
        res_nrg = 0
        rate_dist = 0
        slg = sum_log_gain_q7
        for j in range(nb_subfr):
            max_gain_q7 = log2lin(
                (FIX_CONST(MAX_SUM_LOG_GAIN_DB / 6.0, 7) - slg)
                + (7 << 7)) - gain_safety
            ind, rn, rd, gain = _vq_wmat_ec(
                XX_q17[j * 25:(j + 1) * 25], xX_q17[j * 5:(j + 1) * 5],
                vq_tabs[k], gain_tabs[k], cl_tabs[k], subfr_len,
                max_gain_q7, sizes[k])
            temp_idx[j] = ind
            res_nrg = ADD_POS_SAT32(res_nrg, rn)
            rate_dist = ADD_POS_SAT32(rate_dist, rd)
            slg = max(0, slg + lin2log(gain_safety + gain) - (7 << 7))
        if rate_dist <= min_rate_dist:
            min_rate_dist = rate_dist
            best_idx = list(temp_idx)
            per_index = k
            best_sum_log_gain = slg
        final_res_nrg = res_nrg     # last k's value (quant_LTP_gains.c)
    B_q14 = []
    cb = vq_tabs[per_index]
    for j in range(nb_subfr):
        for kk in range(LTP_ORDER):
            B_q14.append(int(cb[best_idx[j] * LTP_ORDER + kk]) << 7)
    if nb_subfr == 2:
        final_res_nrg >>= 1
    else:
        final_res_nrg >>= 2
    pred_gain_db_q7 = SMULBB(-3, lin2log(final_res_nrg) - (15 << 7))
    return (B_q14, best_idx, per_index, best_sum_log_gain,
            pred_gain_db_q7)


def ltp_analysis_filter(x: np.ndarray, x_start: int, B: np.ndarray,
                        pitchL, inv_gains, subfr_length: int,
                        nb_subfr: int, pre_length: int) -> np.ndarray:
    """silk_LTP_analysis_filter_FLP."""
    out = np.zeros(nb_subfr * (subfr_length + pre_length))
    pos = x_start
    o = 0
    for k in range(nb_subfr):
        lag_pos = pos - pitchL[k]
        Bk = B[k * LTP_ORDER:(k + 1) * LTP_ORDER]
        for i in range(subfr_length + pre_length):
            v = x[pos + i]
            for j in range(LTP_ORDER):
                v -= Bk[j] * x[lag_pos + i + LTP_ORDER // 2 - j]
            out[o + i] = v * inv_gains[k]
        o += subfr_length + pre_length
        pos += subfr_length
    return out


def ltp_scale_ctrl(enc, ctrl, cond_coding: int):
    """silk_LTP_scale_ctrl_FLP."""
    if cond_coding == CODE_INDEPENDENTLY:
        round_loss = enc.PacketLoss_perc * enc.nFramesPerPacket
        if enc.LBRR_flag:
            round_loss = 2 + SMULBB(round_loss, round_loss) // 100
        sc = int(SMULBB(int(ctrl.LTPredCodGain), round_loss)
                 > log2lin(2900 - enc.SNR_dB_Q7))
        sc += int(SMULBB(int(ctrl.LTPredCodGain), round_loss)
                  > log2lin(3900 - enc.SNR_dB_Q7))
        enc.indices.LTP_scaleIndex = sc
    else:
        enc.indices.LTP_scaleIndex = 0
    ctrl.LTP_scale = LTP_SCALES_TABLE_Q14[enc.indices.LTP_scaleIndex] \
        / 16384.0


def residual_energy(x: np.ndarray, a_q12_2: List[List[int]], gains,
                    subfr_length: int, nb_subfr: int,
                    lpc_order: int) -> np.ndarray:
    """silk_residual_energy_FLP (residual_energy_FLP.c:90-117)."""
    nrgs = np.zeros(nb_subfr)
    shift = lpc_order + subfr_length
    a0 = np.array(a_q12_2[0][:lpc_order]) / 4096.0
    a1 = np.array(a_q12_2[1][:lpc_order]) / 4096.0
    res = lpc_analysis_filter(x[0:2 * shift], a0)
    nrgs[0] = gains[0] ** 2 * float(
        np.dot(res[lpc_order:lpc_order + subfr_length],
               res[lpc_order:lpc_order + subfr_length]))
    nrgs[1] = gains[1] ** 2 * float(
        np.dot(res[lpc_order + shift:lpc_order + shift + subfr_length],
               res[lpc_order + shift:lpc_order + shift + subfr_length]))
    if nb_subfr == MAX_NB_SUBFR:
        res = lpc_analysis_filter(x[2 * shift:4 * shift], a1)
        nrgs[2] = gains[2] ** 2 * float(
            np.dot(res[lpc_order:lpc_order + subfr_length],
                   res[lpc_order:lpc_order + subfr_length]))
        nrgs[3] = gains[3] ** 2 * float(
            np.dot(res[lpc_order + shift:lpc_order + shift + subfr_length],
                   res[lpc_order + shift:lpc_order + shift + subfr_length]))
    return nrgs
