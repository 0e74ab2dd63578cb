"""SILK encoder pitch analysis — silk/float/find_pitch_lags_FLP.c and
pitch_analysis_core_FLP.c (3-stage decimated search) plus the small FLP
helpers (apply_sine_window, schur, k2a, bwexpander, LPC analysis filter,
fixed-point down2/down2_3 decimators from resampler_down2*.c).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from . import tables as T
from .sigproc import RSHIFT_ROUND, SMLAWB, SMULWB, i32, sat16

PE_MAX_NB_SUBFR = 4
PE_SUBFR_LENGTH_MS = 5
PE_LTP_MEM_LENGTH_MS = 20
PE_MAX_LAG_MS = 18
PE_MIN_LAG_MS = 2
PE_D_SRCH_LENGTH = 24
PE_NB_STAGE3_LAGS = 5
PE_NB_CBKS_STAGE2 = 3
PE_NB_CBKS_STAGE2_EXT = 11
PE_NB_CBKS_STAGE3_MAX = 34
PE_NB_CBKS_STAGE3_10MS = 12
PE_NB_CBKS_STAGE2_10MS = 3
PE_SHORTLAG_BIAS = 0.2
PE_PREVLAG_BIAS = 0.2
PE_FLATCONTOUR_BIAS = 0.05

# pitch_est_tables.c:94-99 (PE_NB_CBKS_STAGE3_{MIN,MID,MAX})
NB_CBK_SEARCHS_STAGE3 = (16, 24, 34)

# pitch_est_tables.c:69-92
LAG_RANGE_STAGE3 = np.array([
    [[-5, 8], [-1, 6], [-1, 6], [-4, 10]],
    [[-6, 10], [-2, 6], [-1, 6], [-5, 10]],
    [[-9, 12], [-3, 7], [-2, 7], [-7, 13]]], np.int32)

FIND_PITCH_WHITE_NOISE_FRACTION = 1e-3
FIND_PITCH_BANDWIDTH_EXPANSION = 0.99

_DOWN2_0 = 9872                  # resampler_rom.h:45
_DOWN2_1 = 39809 - 65536


def _f2s(x: np.ndarray) -> np.ndarray:
    """silk_float2short_array: round-half-away + saturate."""
    r = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))
    return np.clip(r, -32768, 32767).astype(np.int16)


def resampler_down2(S: List[int], inp: np.ndarray) -> np.ndarray:
    """silk_resampler_down2 (resampler_down2.c:38-74), Q10 allpass."""
    n2 = len(inp) >> 1
    out = np.empty(n2, np.int16)
    for k in range(n2):
        in32 = i32(int(inp[2 * k]) << 10)
        Y = i32(in32 - S[0])
        X = SMLAWB(Y, Y, _DOWN2_1)
        out32 = i32(S[0] + X)
        S[0] = i32(in32 + X)
        in32 = i32(int(inp[2 * k + 1]) << 10)
        Y = i32(in32 - S[1])
        X = SMULWB(Y, _DOWN2_0)
        out32 = i32(out32 + S[1])
        out32 = i32(out32 + X)
        S[1] = i32(in32 + X)
        out[k] = sat16(RSHIFT_ROUND(out32, 11))
    return out


_COEFS_2_3_LQ = (-2797, -6507, 4697, 10739, 1567, 8276)


def resampler_down2_3(S: List[int], inp: np.ndarray) -> np.ndarray:
    """silk_resampler_down2_3 (resampler_down2_3.c): 2/3 decimation via
    AR2 + 4-tap interpolating FIR."""
    n = len(inp)
    # AR2 (resampler_private_AR2.c) producing Q8 buffer
    buf = list(S[:2])   # S[ORDER_FIR..] holds AR state; S[0..1] FIR tail
    ar = S[2:4]
    out_q8 = np.empty(n, np.int64)
    for k in range(n):
        out32 = i32((ar[0] + (int(inp[k]) << 8)))
        out_q8[k] = out32
        out32_s = i32(out32 << 2)
        ar[0] = i32(SMLAWB(ar[1], out32_s, _COEFS_2_3_LQ[0]))
        ar[1] = i32(SMULWB(out32_s, _COEFS_2_3_LQ[1]))
    S[2] = ar[0]
    S[3] = ar[1]
    full = np.concatenate([np.asarray(S[:2], np.int64), out_q8])
    S[0] = int(full[n])
    S[1] = int(full[n + 1])
    out = []
    i = 0
    while i + 3 < len(full) - 0 and len(out) < (2 * n) // 3:
        b = full[i:i + 4]
        r = SMULWB(int(b[0]), _COEFS_2_3_LQ[2])
        r = SMLAWB(r, int(b[1]), _COEFS_2_3_LQ[3])
        r = SMLAWB(r, int(b[2]), _COEFS_2_3_LQ[5])
        r = SMLAWB(r, int(b[3]), _COEFS_2_3_LQ[4])
        out.append(sat16(RSHIFT_ROUND(r, 6)))
        if len(out) >= (2 * n) // 3:
            break
        r = SMULWB(int(b[1]), _COEFS_2_3_LQ[4])
        r = SMLAWB(r, int(b[2]), _COEFS_2_3_LQ[5])
        r = SMLAWB(r, int(b[3]), _COEFS_2_3_LQ[3])
        r = SMLAWB(r, int(full[i + 4]) if i + 4 < len(full) else 0,
                   _COEFS_2_3_LQ[2])
        out.append(sat16(RSHIFT_ROUND(r, 6)))
        i += 3
    return np.array(out[: (2 * n) // 3], np.int16)


def apply_sine_window(x: np.ndarray, win_type: int) -> np.ndarray:
    """silk_apply_sine_window_FLP (apply_sine_window_FLP.c:39-82)."""
    length = len(x)
    out = np.empty(length, np.float64)
    freq = np.pi / (length + 1)
    c = 2.0 - freq * freq
    if win_type < 2:
        S0, S1 = 0.0, freq
    else:
        S0, S1 = 1.0, 0.5 * c
    for k in range(0, length, 4):
        out[k] = x[k] * 0.5 * (S0 + S1)
        out[k + 1] = x[k + 1] * S1
        S0 = c * S1 - S0
        out[k + 2] = x[k + 2] * 0.5 * (S1 + S0)
        out[k + 3] = x[k + 3] * S0
        S1 = c * S0 - S1
    return out


def schur(auto_corr: np.ndarray, order: int):
    """silk_schur_FLP: returns (refl_coef, residual_energy)."""
    C0 = np.array(auto_corr[:order + 1], np.float64)
    C1 = C0.copy()
    rc = np.zeros(order)
    for k in range(order):
        r = -C0[k + 1] / max(C1[0], 1e-9)
        rc[k] = r
        n = order - k
        t1 = C0[k + 1:k + 1 + n].copy()
        t2 = C1[:n].copy()
        C0[k + 1:k + 1 + n] = t1 + t2 * r
        C1[:n] = t2 + t1 * r
    return rc, float(C1[0])


def k2a(rc: np.ndarray) -> np.ndarray:
    """silk_k2a_FLP."""
    order = len(rc)
    A = np.zeros(order)
    for k in range(order):
        r = rc[k]
        half = (k + 1) >> 1
        t1 = A[:half].copy()
        t2 = A[k - half:k][::-1].copy() if half else np.zeros(0)
        A[:half] = t1 + t2 * r
        A[k - half:k] = (t2 + t1 * r)[::-1]
        A[k] = -r
    return A


def bwexpander(A: np.ndarray, chirp: float) -> np.ndarray:
    """silk_bwexpander_FLP."""
    return A * (chirp ** np.arange(1, len(A) + 1))


def lpc_analysis_filter(x: np.ndarray, A: np.ndarray) -> np.ndarray:
    """silk_LPC_analysis_filter_FLP: res[i] = x[i] - sum A[j] x[i-1-j],
    first ``order`` samples zeroed."""
    order = len(A)
    n = len(x)
    res = np.zeros(n)
    pred = np.zeros(n)
    for j in range(order):
        pred[order:] += A[j] * x[order - 1 - j:n - 1 - j]
    res[order:] = x[order:] - pred[order:]
    return res


def autocorrelation(x: np.ndarray, count: int) -> np.ndarray:
    return np.array([float(np.dot(x[:len(x) - k], x[k:]))
                     for k in range(count)])


def _xcorr(target: np.ndarray, hist: np.ndarray, length: int,
           max_lag: int) -> np.ndarray:
    """celt_pitch_xcorr semantics: out[i] = <target, hist[i:i+length]>
    where hist points max_lag samples before target."""
    return np.array([float(np.dot(target[:length],
                                  hist[i:i + length]))
                     for i in range(max_lag)])


def _insertion_sort_decreasing(a: np.ndarray, k: int):
    """Returns (sorted_values[:k], indices[:k])."""
    idx = np.argsort(-a, kind="stable")[:k]
    return a[idx], idx


def pitch_analysis_core(frame: np.ndarray, prev_lag: int, ltp_corr: float,
                        search_thres1: float, search_thres2: float,
                        fs_khz: int, complexity: int, nb_subfr: int):
    """silk_pitch_analysis_core_FLP (pitch_analysis_core_FLP.c:63-476).

    Returns (voiced, pitch_out[nb_subfr], lag_index, contour_index,
    ltp_corr)."""
    frame_length = (PE_LTP_MEM_LENGTH_MS + nb_subfr
                    * PE_SUBFR_LENGTH_MS) * fs_khz
    frame_length_4 = (PE_LTP_MEM_LENGTH_MS + nb_subfr
                      * PE_SUBFR_LENGTH_MS) * 4
    frame_length_8 = (PE_LTP_MEM_LENGTH_MS + nb_subfr
                      * PE_SUBFR_LENGTH_MS) * 8
    sf_length = PE_SUBFR_LENGTH_MS * fs_khz
    sf_length_4 = PE_SUBFR_LENGTH_MS * 4
    sf_length_8 = PE_SUBFR_LENGTH_MS * 8
    min_lag = PE_MIN_LAG_MS * fs_khz
    min_lag_4 = PE_MIN_LAG_MS * 4
    min_lag_8 = PE_MIN_LAG_MS * 8
    max_lag = PE_MAX_LAG_MS * fs_khz - 1
    max_lag_4 = PE_MAX_LAG_MS * 4
    max_lag_8 = PE_MAX_LAG_MS * 8 - 1

    unvoiced = (False, [0] * nb_subfr, 0, 0, 0.0)

    # decimate to 8 kHz
    if fs_khz == 16:
        f16 = _f2s(frame[:frame_length])
        f8 = resampler_down2([0, 0], f16)
        frame_8 = f8.astype(np.float64)
    elif fs_khz == 12:
        f12 = _f2s(frame[:frame_length])
        f8 = resampler_down2_3([0, 0, 0, 0], f12)
        frame_8 = f8.astype(np.float64)
    else:
        f8 = _f2s(frame[:frame_length_8])
        frame_8 = f8.astype(np.float64)
    # decimate to 4 kHz + 1-tap LP
    f4 = resampler_down2([0, 0], _f2s(frame_8))
    frame_4 = f4.astype(np.float64)
    for i in range(frame_length_4 - 1, 0, -1):
        frame_4[i] = float(np.clip(frame_4[i] + frame_4[i - 1],
                                   -32768, 32767))

    # stage 1: correlation at 4 kHz, 2 blocks of 2 subframes
    C0 = np.zeros(max_lag_4 + 5, np.float64)
    target_pos = 4 * sf_length_4
    for k in range(nb_subfr >> 1):
        target = frame_4[target_pos:]
        xc = _xcorr(target, frame_4[target_pos - max_lag_4:],
                    sf_length_8, max_lag_4 - min_lag_4 + 1)
        # xc[i] corresponds to lag max_lag_4 - i
        cross = xc[max_lag_4 - min_lag_4]
        normalizer = (float(np.dot(target[:sf_length_8],
                                   target[:sf_length_8]))
                      + float(np.dot(
                          frame_4[target_pos - min_lag_4:
                                  target_pos - min_lag_4 + sf_length_8],
                          frame_4[target_pos - min_lag_4:
                                  target_pos - min_lag_4 + sf_length_8]))
                      + sf_length_8 * 4000.0)
        C0[min_lag_4] += 2 * cross / normalizer
        for d in range(min_lag_4 + 1, max_lag_4 + 1):
            b = target_pos - d
            cross = xc[max_lag_4 - d]
            normalizer += (frame_4[b] * frame_4[b]
                           - frame_4[b + sf_length_8]
                           * frame_4[b + sf_length_8])
            C0[d] += 2 * cross / normalizer
        target_pos += sf_length_8

    # short-lag bias
    for i in range(max_lag_4, min_lag_4 - 1, -1):
        C0[i] -= C0[i] * i / 4096.0

    length_d_srch = 4 + 2 * complexity
    vals, idx = _insertion_sort_decreasing(
        C0[min_lag_4:max_lag_4 + 1], length_d_srch)
    Cmax = float(vals[0]) if len(vals) else 0.0
    if Cmax < 0.2:
        return unvoiced
    threshold = search_thres1 * Cmax
    d_srch = []
    for i in range(length_d_srch):
        if vals[i] > threshold:
            d_srch.append((int(idx[i]) + min_lag_4) << 1)
        else:
            break
    length_d_srch = len(d_srch)
    assert length_d_srch > 0

    d_comp = np.zeros(max_lag_8 + 6, np.int32)
    for d in d_srch:
        d_comp[d] = 1
    for i in range(max_lag_8 + 3, min_lag_8 - 1, -1):
        d_comp[i] += d_comp[i - 1] + d_comp[i - 2]
    d_srch = [i for i in range(min_lag_8, max_lag_8 + 1)
              if d_comp[i + 1] > 0]
    length_d_srch = len(d_srch)
    for i in range(max_lag_8 + 3, min_lag_8 - 1, -1):
        d_comp[i] += d_comp[i - 1] + d_comp[i - 2] + d_comp[i - 3]
    d_comp_lags = [i - 2 for i in range(min_lag_8, max_lag_8 + 4)
                   if d_comp[i] > 0]

    # stage 2: 8 kHz full correlations
    C = np.zeros((nb_subfr, max_lag_8 + 5), np.float64)
    base = frame_8 if fs_khz != 8 else frame[:frame_length_8]
    target_pos = PE_LTP_MEM_LENGTH_MS * 8
    for k in range(nb_subfr):
        target = base[target_pos:target_pos + sf_length_8]
        e_t = float(np.dot(target, target)) + 1.0
        for d in d_comp_lags:
            basis = base[target_pos - d:target_pos - d + sf_length_8]
            cc = float(np.dot(basis, target))
            if cc > 0.0:
                e_b = float(np.dot(basis, basis))
                C[k][d] = 2 * cc / (e_b + e_t)
        target_pos += sf_length_8

    CCmax = 0.0
    CCmax_b = -1000.0
    CBimax = 0
    lag = -1
    if prev_lag > 0:
        if fs_khz == 12:
            prev_lag = (prev_lag << 1) // 3
        elif fs_khz == 16:
            prev_lag >>= 1
        prev_lag_log2 = np.log2(prev_lag)
    else:
        prev_lag_log2 = 0.0
    if nb_subfr == PE_MAX_NB_SUBFR:
        cbk_size = PE_NB_CBKS_STAGE2_EXT
        lag_cb = T.CB_lags_stage2.reshape(PE_MAX_NB_SUBFR, cbk_size)
        nb_cbk_search = (PE_NB_CBKS_STAGE2_EXT
                         if fs_khz == 8 and complexity > 0
                         else PE_NB_CBKS_STAGE2)
    else:
        cbk_size = PE_NB_CBKS_STAGE2_10MS
        lag_cb = T.CB_lags_stage2_10_ms.reshape(2, cbk_size)
        nb_cbk_search = PE_NB_CBKS_STAGE2_10MS
    for d in d_srch:
        CC = np.zeros(nb_cbk_search)
        for j in range(nb_cbk_search):
            for i in range(nb_subfr):
                CC[j] += C[i][d + int(lag_cb[i][j])]
        CBimax_new = int(np.argmax(CC))
        CCmax_new = float(CC[CBimax_new])
        lag_log2 = np.log2(d)
        CCmax_new_b = CCmax_new - PE_SHORTLAG_BIAS * nb_subfr * lag_log2
        if prev_lag > 0:
            dl2 = (lag_log2 - prev_lag_log2) ** 2
            CCmax_new_b -= (PE_PREVLAG_BIAS * nb_subfr * ltp_corr * dl2
                            / (dl2 + 0.5))
        if (CCmax_new_b > CCmax_b
                and CCmax_new > nb_subfr * search_thres2):
            CCmax_b = CCmax_new_b
            CCmax = CCmax_new
            lag = d
            CBimax = CBimax_new
    if lag == -1:
        return unvoiced
    ltp_corr_out = CCmax / nb_subfr

    if fs_khz > 8:
        # stage 3: search in the original signal
        if fs_khz == 12:
            lag = RSHIFT_ROUND(lag * 3, 1)
        else:
            lag = lag << 1
        lag = int(np.clip(lag, min_lag, max_lag))
        start_lag = max(lag - 2, min_lag)
        end_lag = min(lag + 2, max_lag)
        lag_new = lag
        CBimax = 0
        CCmax = -1000.0
        if nb_subfr == PE_MAX_NB_SUBFR:
            nb_cbk_search = NB_CBK_SEARCHS_STAGE3[complexity]
            cbk_size = PE_NB_CBKS_STAGE3_MAX
            lag_cb3 = T.CB_lags_stage3.reshape(PE_MAX_NB_SUBFR, cbk_size)
            lag_range = LAG_RANGE_STAGE3[complexity]
        else:
            nb_cbk_search = PE_NB_CBKS_STAGE3_10MS
            cbk_size = PE_NB_CBKS_STAGE3_10MS
            lag_cb3 = T.CB_lags_stage3_10_ms.reshape(2, cbk_size)
            lag_range = T.Lag_range_stage3_10_ms
        # precompute per-subframe correlations/energies over lag windows
        cross_st3 = np.zeros((nb_subfr, nb_cbk_search, PE_NB_STAGE3_LAGS))
        energy_st3 = np.zeros((nb_subfr, nb_cbk_search, PE_NB_STAGE3_LAGS))
        target_pos = PE_LTP_MEM_LENGTH_MS * fs_khz
        tpos = 4 * sf_length
        for k in range(nb_subfr):
            lag_low = int(lag_range[k][0])
            lag_high = int(lag_range[k][1])
            target = frame[tpos:tpos + sf_length]
            scratch_c = {}
            scratch_e = {}
            for j in range(lag_low, lag_high + 1):
                b0 = tpos - (start_lag + j)
                basis = frame[b0:b0 + sf_length]
                scratch_c[j] = float(np.dot(target, basis))
                scratch_e[j] = float(np.dot(basis, basis)) + 1e-3
            for i in range(nb_cbk_search):
                base_idx = int(lag_cb3[k][i])
                for j in range(PE_NB_STAGE3_LAGS):
                    key = base_idx + j      # lag = CB[k][i] + j
                    if key in scratch_c:
                        cross_st3[k][i][j] = scratch_c[key]
                        energy_st3[k][i][j] = scratch_e[key]
            tpos += sf_length
        target = frame[target_pos:target_pos + nb_subfr * sf_length]
        energy_tmp = float(np.dot(target, target)) + 1.0
        contour_bias = PE_FLATCONTOUR_BIAS / lag
        lag_counter = 0
        for d in range(start_lag, end_lag + 1):
            for j in range(nb_cbk_search):
                cross = 0.0
                energy = energy_tmp
                for k in range(nb_subfr):
                    cross += cross_st3[k][j][lag_counter]
                    energy += energy_st3[k][j][lag_counter]
                if cross > 0.0:
                    CCmax_new = 2 * cross / energy
                    CCmax_new *= 1.0 - contour_bias * j
                else:
                    CCmax_new = 0.0
                if (CCmax_new > CCmax
                        and d + int(T.CB_lags_stage3.reshape(
                            PE_MAX_NB_SUBFR, PE_NB_CBKS_STAGE3_MAX)
                            [0][j]) <= max_lag):
                    CCmax = CCmax_new
                    lag_new = d
                    CBimax = j
            lag_counter += 1
        pitch_out = [int(np.clip(lag_new + int(lag_cb3[k][CBimax]),
                                 min_lag, PE_MAX_LAG_MS * fs_khz))
                     for k in range(nb_subfr)]
        lag_index = lag_new - min_lag
    else:
        pitch_out = [int(np.clip(lag + int(lag_cb[k][CBimax]),
                                 min_lag_8, PE_MAX_LAG_MS * 8))
                     for k in range(nb_subfr)]
        lag_index = lag - min_lag_8
    return True, pitch_out, lag_index, CBimax, ltp_corr_out
