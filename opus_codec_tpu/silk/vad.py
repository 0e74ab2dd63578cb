"""SILK voice activity detector — exact fixed-point port of
silk/VAD.c (+ ana_filt_bank_1.c, sigm_Q15.c).

Produces speech_activity_Q8, input_tilt_Q15 and per-band
input_quality_bands_Q15 from the 4-band decimated subband energies and
adaptively tracked noise levels.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .sigproc import (ADD_SAT32, DIV32, LIMIT, SMLABB, SMLAWB, SMULBB,
                      SMULWB, SMULWW, SQRT_APPROX, i32, lin2log, sat16)

VAD_N_BANDS = 4
VAD_INTERNAL_SUBFRAMES_LOG2 = 2
VAD_INTERNAL_SUBFRAMES = 4
VAD_NOISE_LEVEL_SMOOTH_COEF_Q16 = 1024
VAD_NOISE_LEVELS_BIAS = 50
VAD_NEGATIVE_OFFSET_Q5 = 128
VAD_SNR_FACTOR_Q16 = 45000
VAD_SNR_SMOOTH_COEF_Q18 = 4096
INT32_MAX = 0x7FFFFFFF

_SIGM_SLOPE_Q10 = (237, 153, 73, 30, 12, 7)
_SIGM_POS_Q15 = (16384, 23955, 28861, 31213, 32178, 32548)
_SIGM_NEG_Q15 = (16384, 8812, 3906, 1554, 589, 219)

_A_FB1_20 = 5394 << 1
_A_FB1_21 = -24290

TILT_WEIGHTS = (30000, 6000, -12000, -12000)


def sigm_Q15(in_q5: int) -> int:
    """silk_sigm_Q15 (sigm_Q15.c:43-69)."""
    if in_q5 < 0:
        in_q5 = -in_q5
        if in_q5 >= 6 * 32:
            return 0
        ind = in_q5 >> 5
        return _SIGM_NEG_Q15[ind] - SMULBB(_SIGM_SLOPE_Q10[ind],
                                           in_q5 & 0x1F)
    if in_q5 >= 6 * 32:
        return 32767
    ind = in_q5 >> 5
    return _SIGM_POS_Q15[ind] + SMULBB(_SIGM_SLOPE_Q10[ind], in_q5 & 0x1F)


def ana_filt_bank_1(inp, S: List[int], N: int):
    """silk_ana_filt_bank_1 (ana_filt_bank_1.c:42-77): allpass QMF
    split.  Returns (low [N/2], high [N/2]); updates S[2] in place."""
    N2 = N >> 1
    outL = [0] * N2
    outH = [0] * N2
    for k in range(N2):
        in32 = i32(int(inp[2 * k]) << 10)
        Y = i32(in32 - S[0])
        X = SMLAWB(Y, Y, _A_FB1_21)
        out_1 = i32(S[0] + X)
        S[0] = i32(in32 + X)
        in32 = i32(int(inp[2 * k + 1]) << 10)
        Y = i32(in32 - S[1])
        X = SMULWB(Y, _A_FB1_20)
        out_2 = i32(S[1] + X)
        S[1] = i32(in32 + X)
        from .sigproc import RSHIFT_ROUND
        outL[k] = sat16(RSHIFT_ROUND(i32(out_2 + out_1), 11))
        outH[k] = sat16(RSHIFT_ROUND(i32(out_2 - out_1), 11))
    return outL, outH


class VadState:
    """silk_VAD_state + silk_VAD_Init (VAD.c:40-63)."""

    def __init__(self):
        self.AnaState = [0, 0]
        self.AnaState1 = [0, 0]
        self.AnaState2 = [0, 0]
        self.XnrgSubfr = [0] * VAD_N_BANDS
        self.HPstate = 0
        self.NoiseLevelBias = [max(VAD_NOISE_LEVELS_BIAS // (b + 1), 1)
                               for b in range(VAD_N_BANDS)]
        self.NL = [100 * b for b in self.NoiseLevelBias]
        self.inv_NL = [DIV32(INT32_MAX, nl) for nl in self.NL]
        self.NrgRatioSmth_Q8 = [100 * 256] * VAD_N_BANDS
        self.counter = 15

    def _get_noise_levels(self, pX):
        """silk_VAD_GetNoiseLevels (VAD.c:255-310)."""
        if self.counter < 1000:
            min_coef = DIV32(32767, (self.counter >> 4) + 1)
            self.counter += 1
        else:
            min_coef = 0
        for k in range(VAD_N_BANDS):
            nl = self.NL[k]
            nrg = ADD_SAT32(pX[k], self.NoiseLevelBias[k])
            inv_nrg = DIV32(INT32_MAX, nrg)
            if nrg > (nl << 3):
                coef = VAD_NOISE_LEVEL_SMOOTH_COEF_Q16 >> 3
            elif nrg < nl:
                coef = VAD_NOISE_LEVEL_SMOOTH_COEF_Q16
            else:
                coef = SMULWB(SMULWW(inv_nrg, nl),
                              VAD_NOISE_LEVEL_SMOOTH_COEF_Q16 << 1)
            coef = max(coef, min_coef)
            self.inv_NL[k] = SMLAWB(self.inv_NL[k],
                                    inv_nrg - self.inv_NL[k], coef)
            nl = DIV32(INT32_MAX, self.inv_NL[k])
            nl = min(nl, 0x00FFFFFF)
            self.NL[k] = nl

    def get_sa_q8(self, p_in, frame_length: int, fs_khz: int):
        """silk_VAD_GetSA_Q8 (VAD.c:70-253).

        Returns (speech_activity_Q8, input_tilt_Q15,
        input_quality_bands_Q15[4], SNR_dB_Q7)."""
        dfl1 = frame_length >> 1
        dfl2 = frame_length >> 2
        dfl = frame_length >> 3
        # decimate into 4 bands
        lo, b3 = ana_filt_bank_1(p_in, self.AnaState, frame_length)
        lo, b2 = ana_filt_bank_1(lo, self.AnaState1, dfl1)
        b0, b1 = ana_filt_bank_1(lo, self.AnaState2, dfl2)
        # HP (differentiator) on lowest band (VAD.c:124-133)
        b0 = list(b0)
        b0[dfl - 1] = int(b0[dfl - 1]) >> 1
        hp_state_tmp = b0[dfl - 1]
        for i in range(dfl - 1, 0, -1):
            b0[i - 1] = int(b0[i - 1]) >> 1
            b0[i] -= b0[i - 1]
        b0[0] -= self.HPstate
        self.HPstate = hp_state_tmp

        bands = [b0, b1, b2, b3]
        Xnrg = [0] * VAD_N_BANDS
        for b in range(VAD_N_BANDS):
            dec_fl = frame_length >> min(VAD_N_BANDS - b, VAD_N_BANDS - 1)
            sub_len = dec_fl >> VAD_INTERNAL_SUBFRAMES_LOG2
            off = 0
            Xnrg[b] = self.XnrgSubfr[b]
            sum_sq = 0
            for s in range(VAD_INTERNAL_SUBFRAMES):
                seg = np.asarray(bands[b][off:off + sub_len],
                                 np.int64) >> 3
                sum_sq = int(np.sum(seg * seg))
                if s < VAD_INTERNAL_SUBFRAMES - 1:
                    Xnrg[b] = ADD_SAT32(Xnrg[b], sum_sq)
                else:
                    Xnrg[b] = ADD_SAT32(Xnrg[b], sum_sq >> 1)
                off += sub_len
            self.XnrgSubfr[b] = sum_sq

        self._get_noise_levels(Xnrg)

        sum_squared = 0
        input_tilt = 0
        nrg_to_noise_q8 = [256] * VAD_N_BANDS
        for b in range(VAD_N_BANDS):
            speech_nrg = Xnrg[b] - self.NL[b]
            if speech_nrg > 0:
                if (Xnrg[b] & 0xFF800000) == 0:
                    nrg_to_noise_q8[b] = DIV32(Xnrg[b] << 8, self.NL[b] + 1)
                else:
                    nrg_to_noise_q8[b] = DIV32(Xnrg[b],
                                               (self.NL[b] >> 8) + 1)
                snr_q7 = lin2log(nrg_to_noise_q8[b]) - 8 * 128
                sum_squared = SMLABB(sum_squared, snr_q7, snr_q7)
                if speech_nrg < (1 << 20):
                    snr_q7 = SMULWB(SQRT_APPROX(speech_nrg) << 6, snr_q7)
                input_tilt = SMLAWB(input_tilt, TILT_WEIGHTS[b], snr_q7)
        sum_squared = sum_squared // VAD_N_BANDS
        snr_db_q7 = 3 * SQRT_APPROX(sum_squared)

        SA_Q15 = sigm_Q15(SMULWB(VAD_SNR_FACTOR_Q16, snr_db_q7)
                          - VAD_NEGATIVE_OFFSET_Q5)
        input_tilt_q15 = (sigm_Q15(input_tilt) - 16384) << 1

        speech_nrg = 0
        for b in range(VAD_N_BANDS):
            speech_nrg += (b + 1) * ((Xnrg[b] - self.NL[b]) >> 4)
        if frame_length == 20 * fs_khz:
            speech_nrg >>= 1
        if speech_nrg <= 0:
            SA_Q15 >>= 1
        elif speech_nrg < 16384:
            speech_nrg = SQRT_APPROX(i32(speech_nrg << 16))
            SA_Q15 = SMULWB(32768 + speech_nrg, SA_Q15)

        speech_activity_q8 = min(SA_Q15 >> 7, 255)

        smooth_coef_q16 = SMULWB(VAD_SNR_SMOOTH_COEF_Q18,
                                 SMULWB(SA_Q15, SA_Q15))
        if frame_length == 10 * fs_khz:
            smooth_coef_q16 >>= 1
        quality = [0] * VAD_N_BANDS
        for b in range(VAD_N_BANDS):
            self.NrgRatioSmth_Q8[b] = SMLAWB(
                self.NrgRatioSmth_Q8[b],
                nrg_to_noise_q8[b] - self.NrgRatioSmth_Q8[b],
                smooth_coef_q16)
            snr_q7 = 3 * (lin2log(self.NrgRatioSmth_Q8[b]) - 8 * 128)
            quality[b] = sigm_Q15((snr_q7 - 16 * 128) >> 4)
        return speech_activity_q8, input_tilt_q15, quality, snr_db_q7
