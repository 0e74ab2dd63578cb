"""SILK decoder: exact fixed-point frame decode + top-level API.

Behavioural parity: /root/reference/opus/silk/dec_API.c (silk_Decode :132),
decode_frame.c, decode_indices.c, decode_parameters.c, decode_core.c,
decode_pulses.c, shell_coder.c, code_signs.c, decode_pitch.c,
gain_quant.c (silk_gains_dequant :95), decoder_set_fs.c, PLC.c, CNG.c,
stereo_MS_to_LR.c, stereo_decode_pred.c, LPC_analysis_filter.c.

Host scalar reference implementation (integer-exact); the batched
device lane (``silk.batch_decoder`` + ``silk.batch_core`` +
``silk.batch_resampler``) matches it bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..bitstream.range_coder import RangeDecoder
from . import tables as T
from .nlsf import (CB_NB_MB, CB_WB, bwexpander, lpc_inverse_pred_gain,
                   nlsf2a, nlsf_decode)
from .resampler import Resampler
from .sigproc import (ADD_SAT16, ADD_SAT32, CLZ32, DIV32, DIV32_16,
                      DIV32_varQ, INVERSE32_varQ, LIMIT, LSHIFT_SAT32, RAND,
                      RSHIFT_ROUND, SMLABB, SMLAWB, SMLAWT, SMULBB, SMULTT,
                      SMULWB, SMULWW, SQRT_APPROX, i32, log2lin, sat16,
                      sum_sqr_shift)

__all__ = ["SilkDecoder", "DecControl"]

# define.h constants
MAX_NB_SUBFR = 4
SUB_FRAME_LENGTH_MS = 5
LTP_MEM_LENGTH_MS = 20
LTP_ORDER = 5
MIN_LPC_ORDER = 10
MAX_LPC_ORDER = 16
SHELL_LEN = 16
LOG2_SHELL_LEN = 4
SILK_MAX_PULSES = 16
N_RATE_LEVELS = 10
MAX_FRAME_LENGTH = 320
TYPE_NO_VOICE_ACTIVITY = 0
TYPE_UNVOICED = 1
TYPE_VOICED = 2
CODE_INDEPENDENTLY = 0
CODE_INDEPENDENTLY_NO_LTP_SCALING = 1
CODE_CONDITIONALLY = 2
QUANT_LEVEL_ADJUST_Q10 = 80
MIN_DELTA_GAIN_QUANT = -4
MAX_DELTA_GAIN_QUANT = 36
N_LEVELS_QGAIN = 64
MIN_QGAIN_DB = 2
MAX_QGAIN_DB = 88
GAIN_OFFSET = (MIN_QGAIN_DB * 128) // 6 + 16 * 128
INV_SCALE_Q16 = (65536 * (((MAX_QGAIN_DB - MIN_QGAIN_DB) * 128) // 6)) \
    // (N_LEVELS_QGAIN - 1)
PE_MIN_LAG_MS = 2
PE_MAX_LAG_MS = 18
PE_NB_CBKS_STAGE2_EXT = 11
PE_NB_CBKS_STAGE2_10MS = 3
PE_NB_CBKS_STAGE3_MAX = 34
PE_NB_CBKS_STAGE3_10MS = 12
BWE_AFTER_LOSS_Q16 = 63570
# PLC.h
V_PITCH_GAIN_START_MIN_Q14 = 11469
V_PITCH_GAIN_START_MAX_Q14 = 15565
MAX_PITCH_LAG_MS = 18
RAND_BUF_SIZE = 128
RAND_BUF_MASK = RAND_BUF_SIZE - 1
LOG2_INV_LPC_GAIN_HIGH_THRES = 3
LOG2_INV_LPC_GAIN_LOW_THRES = 8
PITCH_DRIFT_FAC_Q16 = 655
BWE_COEF_Q16 = int(0.99 * 65536 + 0.5)
HARM_ATT_Q15 = (32440, 31130)
PLC_RAND_ATTENUATE_V_Q15 = (31130, 26214)
PLC_RAND_ATTENUATE_UV_Q15 = (32440, 29491)
# CNG
CNG_BUF_MASK_MAX = 255
CNG_GAIN_SMTH_Q16 = 4634
CNG_GAIN_SMTH_THRESHOLD_Q16 = 46396
CNG_NLSF_SMTH_Q16 = 16348
# stereo
STEREO_QUANT_SUB_STEPS = 5
STEREO_INTERP_LEN_MS = 8

FLAG_DECODE_NORMAL = 0
FLAG_PACKET_LOST = 1
FLAG_DECODE_LBRR = 2


@dataclass
class SideInfoIndices:
    GainsIndices: List[int] = field(default_factory=lambda: [0] * 4)
    LTPIndex: List[int] = field(default_factory=lambda: [0] * 4)
    NLSFIndices: List[int] = field(default_factory=lambda: [0] * 17)
    lagIndex: int = 0
    contourIndex: int = 0
    signalType: int = 0
    quantOffsetType: int = 0
    NLSFInterpCoef_Q2: int = 4
    PERIndex: int = 0
    LTP_scaleIndex: int = 0
    Seed: int = 0


@dataclass
class DecControl:
    """silk_DecControlStruct (control.h)."""
    nChannelsAPI: int = 1
    nChannelsInternal: int = 1
    API_sampleRate: int = 48000
    internalSampleRate: int = 16000
    payloadSize_ms: int = 20
    prevPitchLag: int = 0
    enable_deep_plc: int = 0


def _icdf(dec: RangeDecoder, table) -> int:
    return dec.dec_icdf([int(x) for x in table], 8)


def gains_dequant(ind, prev_ind: int, conditional: bool, nb_subfr: int):
    """gain_quant.c silk_gains_dequant. Returns (gains_Q16, prev_ind)."""
    gains = [0] * nb_subfr
    for k in range(nb_subfr):
        if k == 0 and not conditional:
            prev_ind = max(ind[k], prev_ind - 16)
        else:
            ind_tmp = ind[k] + MIN_DELTA_GAIN_QUANT
            double_step = 2 * MAX_DELTA_GAIN_QUANT - N_LEVELS_QGAIN + prev_ind
            if ind_tmp > double_step:
                prev_ind += (ind_tmp << 1) - double_step
            else:
                prev_ind += ind_tmp
        prev_ind = LIMIT(prev_ind, 0, N_LEVELS_QGAIN - 1)
        gains[k] = log2lin(min(SMULWB(INV_SCALE_Q16, prev_ind)
                               + GAIN_OFFSET, 3967))
    return gains, prev_ind


def decode_pitch(lag_index: int, contour_index: int, fs_khz: int,
                 nb_subfr: int):
    """decode_pitch.c:38-77."""
    if fs_khz == 8:
        if nb_subfr == MAX_NB_SUBFR:
            cb = T.CB_lags_stage2.reshape(MAX_NB_SUBFR, PE_NB_CBKS_STAGE2_EXT)
        else:
            cb = T.CB_lags_stage2_10_ms.reshape(2, PE_NB_CBKS_STAGE2_10MS)
    else:
        if nb_subfr == MAX_NB_SUBFR:
            cb = T.CB_lags_stage3.reshape(MAX_NB_SUBFR, PE_NB_CBKS_STAGE3_MAX)
        else:
            cb = T.CB_lags_stage3_10_ms.reshape(2, PE_NB_CBKS_STAGE3_10MS)
    min_lag = PE_MIN_LAG_MS * fs_khz
    max_lag = PE_MAX_LAG_MS * fs_khz
    lag = min_lag + lag_index
    return [LIMIT(lag + int(cb[k][contour_index]), min_lag, max_lag)
            for k in range(nb_subfr)]


def shell_decoder(dec: RangeDecoder, pulses4: int) -> List[int]:
    """shell_coder.c:118-151 — one 16-sample shell frame."""
    offs = T.shell_code_table_offsets
    tabs = (T.shell_code_table0, T.shell_code_table1, T.shell_code_table2,
            T.shell_code_table3)

    def split(p, table):
        if p > 0:
            c1 = dec.dec_icdf([int(x) for x in table[int(offs[p]):]], 8)
            return c1, p - c1
        return 0, 0

    # Exact symbol order from shell_coder.c:118-151 (depth-first with the
    # second half of the tree deferred until after the first half's leaves).
    out = [0] * 16
    p3_0, p3_1 = split(pulses4, tabs[3])
    p2_0, p2_1 = split(p3_0, tabs[2])
    p1_0, p1_1 = split(p2_0, tabs[1])
    out[0], out[1] = split(p1_0, tabs[0])
    out[2], out[3] = split(p1_1, tabs[0])
    p1_2, p1_3 = split(p2_1, tabs[1])
    out[4], out[5] = split(p1_2, tabs[0])
    out[6], out[7] = split(p1_3, tabs[0])
    p2_2, p2_3 = split(p3_1, tabs[2])
    p1_4, p1_5 = split(p2_2, tabs[1])
    out[8], out[9] = split(p1_4, tabs[0])
    out[10], out[11] = split(p1_5, tabs[0])
    p1_6, p1_7 = split(p2_3, tabs[1])
    out[12], out[13] = split(p1_6, tabs[0])
    out[14], out[15] = split(p1_7, tabs[0])
    return out


def decode_pulses(dec: RangeDecoder, signal_type: int, quant_offset_type: int,
                  frame_length: int) -> List[int]:
    """decode_pulses.c:36-115."""
    rate_level = _icdf(dec, T.rate_levels_iCDF[signal_type >> 1])
    n_iter = frame_length >> LOG2_SHELL_LEN
    if n_iter * SHELL_LEN < frame_length:
        assert frame_length == 120
        n_iter += 1
    sum_pulses = [0] * n_iter
    n_lshifts = [0] * n_iter
    cdf = T.pulses_per_block_iCDF[rate_level]
    for i in range(n_iter):
        sum_pulses[i] = _icdf(dec, cdf)
        while sum_pulses[i] == SILK_MAX_PULSES + 1:
            n_lshifts[i] += 1
            off = 1 if n_lshifts[i] == 10 else 0
            sum_pulses[i] = _icdf(
                dec, T.pulses_per_block_iCDF[N_RATE_LEVELS - 1][off:])
    pulses = [0] * (n_iter * SHELL_LEN)
    for i in range(n_iter):
        if sum_pulses[i] > 0:
            pulses[i * SHELL_LEN:(i + 1) * SHELL_LEN] = \
                shell_decoder(dec, sum_pulses[i])
    for i in range(n_iter):
        if n_lshifts[i] > 0:
            nls = n_lshifts[i]
            for k in range(SHELL_LEN):
                abs_q = pulses[i * SHELL_LEN + k]
                for _ in range(nls):
                    abs_q = (abs_q << 1) + _icdf(dec, T.lsb_iCDF)
                pulses[i * SHELL_LEN + k] = abs_q
            sum_pulses[i] |= nls << 5
    # decode_signs (code_signs.c:74-115)
    ix = 7 * (quant_offset_type + (signal_type << 1))
    icdf_base = T.sign_iCDF[ix:]
    for i in range(n_iter):
        p = sum_pulses[i]
        if p > 0:
            icdf0 = int(icdf_base[min(p & 0x1F, 6)])
            for j in range(SHELL_LEN):
                if pulses[i * SHELL_LEN + j] > 0:
                    if dec.dec_icdf([icdf0, 0], 8) == 0:
                        pulses[i * SHELL_LEN + j] = \
                            -pulses[i * SHELL_LEN + j]
    return pulses[:max(frame_length, n_iter * SHELL_LEN)]


def lpc_analysis_filter(x, x_off, B, length, order):
    """LPC_analysis_filter.c (generic path). Returns list of ``length``
    outputs (first ``order`` zeros)."""
    out = [0] * length
    for ix in range(order, length):
        base = x_off + ix - 1
        out32_q12 = 0
        for j in range(order):
            out32_q12 = i32(out32_q12 + _sext16(x[base - j]) * B[j])
        out32_q12 = i32((x[x_off + ix] << 12) - out32_q12)
        out[ix] = sat16(RSHIFT_ROUND(out32_q12, 12))
    return out


def _sext16(v):
    v = int(v) & 0xFFFF
    return v - 0x10000 if v & 0x8000 else v


class SilkChannelState:
    """silk_decoder_state (structs.h) + per-frame decode methods."""

    def __init__(self):
        self.prev_gain_Q16 = 65536
        self.exc_Q14 = [0] * MAX_FRAME_LENGTH
        self.sLPC_Q14_buf = [0] * MAX_LPC_ORDER
        self.outBuf = [0] * (MAX_FRAME_LENGTH + 2 * SUB_FRAME_LENGTH_MS * 16)
        self.lagPrev = 100
        self.LastGainIndex = 10
        self.fs_kHz = 0
        self.fs_API_hz = 0
        self.nb_subfr = 0
        self.frame_length = 0
        self.subfr_length = 0
        self.ltp_mem_length = 0
        self.LPC_order = 0
        self.prevNLSF_Q15 = [0] * MAX_LPC_ORDER
        self.first_frame_after_reset = True
        self.pitch_lag_low_bits_iCDF = None
        self.pitch_contour_iCDF = None
        self.nFramesDecoded = 0
        self.nFramesPerPacket = 0
        self.ec_prevSignalType = 0
        self.ec_prevLagIndex = 0
        self.VAD_flags = [0] * 3
        self.LBRR_flag = 0
        self.LBRR_flags = [0] * 3
        self.resampler: Optional[Resampler] = None
        self.indices = SideInfoIndices()
        self.lossCnt = 0
        self.prevSignalType = TYPE_NO_VOICE_ACTIVITY
        self.psNLSF_CB = None
        # PLC state (silk_PLC_struct)
        self.plc_pitchL_Q8 = 0
        self.plc_LTPCoef_Q14 = [0] * LTP_ORDER
        self.plc_prevLPC_Q12 = [0] * MAX_LPC_ORDER
        self.plc_last_frame_lost = 0
        self.plc_rand_seed = 3176576
        self.plc_randScale_Q14 = 1 << 14
        self.plc_conc_energy = 0
        self.plc_conc_energy_shift = 0
        self.plc_prevLTP_scale_Q14 = 0
        self.plc_prevGain_Q16 = [65536, 65536]
        self.plc_fs_kHz = 0
        self.plc_nb_subfr = 2
        self.plc_subfr_length = 20
        # CNG state (silk_CNG_struct)
        self.cng_exc_buf_Q14 = [0] * MAX_FRAME_LENGTH
        self.cng_smth_NLSF_Q15 = [0] * MAX_LPC_ORDER
        self.cng_synth_state = [0] * MAX_LPC_ORDER
        self.cng_smth_Gain_Q16 = 0
        self.cng_rand_seed = 3176576
        self.cng_fs_kHz = 0

    # -- decoder_set_fs.c:35-108 -----------------------------------------

    def set_fs(self, fs_kHz: int, fs_API_Hz: int):
        assert fs_kHz in (8, 12, 16)
        self.subfr_length = SUB_FRAME_LENGTH_MS * fs_kHz
        frame_length = self.nb_subfr * self.subfr_length
        if self.fs_kHz != fs_kHz or self.fs_API_hz != fs_API_Hz:
            self.resampler = Resampler(fs_kHz * 1000, fs_API_Hz, False)
            self.fs_API_hz = fs_API_Hz
        if self.fs_kHz != fs_kHz or frame_length != self.frame_length:
            if fs_kHz == 8:
                self.pitch_contour_iCDF = T.pitch_contour_NB_iCDF \
                    if self.nb_subfr == MAX_NB_SUBFR \
                    else T.pitch_contour_10_ms_NB_iCDF
            else:
                self.pitch_contour_iCDF = T.pitch_contour_iCDF \
                    if self.nb_subfr == MAX_NB_SUBFR \
                    else T.pitch_contour_10_ms_iCDF
            if self.fs_kHz != fs_kHz:
                self.ltp_mem_length = LTP_MEM_LENGTH_MS * fs_kHz
                if fs_kHz in (8, 12):
                    self.LPC_order = MIN_LPC_ORDER
                    self.psNLSF_CB = CB_NB_MB
                else:
                    self.LPC_order = MAX_LPC_ORDER
                    self.psNLSF_CB = CB_WB
                if fs_kHz == 16:
                    self.pitch_lag_low_bits_iCDF = T.uniform8_iCDF
                elif fs_kHz == 12:
                    self.pitch_lag_low_bits_iCDF = T.uniform6_iCDF
                else:
                    self.pitch_lag_low_bits_iCDF = T.uniform4_iCDF
                self.first_frame_after_reset = True
                self.lagPrev = 100
                self.LastGainIndex = 10
                self.prevSignalType = TYPE_NO_VOICE_ACTIVITY
                self.outBuf = [0] * len(self.outBuf)
                self.sLPC_Q14_buf = [0] * MAX_LPC_ORDER
            self.fs_kHz = fs_kHz
            self.frame_length = frame_length
        assert 0 < self.frame_length <= MAX_FRAME_LENGTH

    # -- decode_indices.c:35-151 -----------------------------------------

    def decode_indices(self, dec: RangeDecoder, frame_index: int,
                       decode_LBRR: bool, cond_coding: int):
        ind = self.indices
        if decode_LBRR or self.VAD_flags[frame_index]:
            Ix = _icdf(dec, T.type_offset_VAD_iCDF) + 2
        else:
            Ix = _icdf(dec, T.type_offset_no_VAD_iCDF)
        ind.signalType = Ix >> 1
        ind.quantOffsetType = Ix & 1

        if cond_coding == CODE_CONDITIONALLY:
            ind.GainsIndices[0] = _icdf(dec, T.delta_gain_iCDF)
        else:
            ind.GainsIndices[0] = _icdf(
                dec, T.gain_iCDF[ind.signalType]) << 3
            ind.GainsIndices[0] += _icdf(dec, T.uniform8_iCDF)
        for i in range(1, self.nb_subfr):
            ind.GainsIndices[i] = _icdf(dec, T.delta_gain_iCDF)

        cb = self.psNLSF_CB
        ind.NLSFIndices[0] = _icdf(
            dec, cb.cb1_icdf[(ind.signalType >> 1) * cb.n_vectors:])
        from .nlsf import nlsf_unpack
        ec_ix, _ = nlsf_unpack(cb, ind.NLSFIndices[0])
        for i in range(cb.order):
            Ix = _icdf(dec, cb.ec_icdf[ec_ix[i]:])
            if Ix == 0:
                Ix -= _icdf(dec, T.NLSF_EXT_iCDF)
            elif Ix == 2 * 4:  # 2*NLSF_QUANT_MAX_AMPLITUDE
                Ix += _icdf(dec, T.NLSF_EXT_iCDF)
            ind.NLSFIndices[i + 1] = Ix - 4
        if self.nb_subfr == MAX_NB_SUBFR:
            ind.NLSFInterpCoef_Q2 = _icdf(
                dec, T.NLSF_interpolation_factor_iCDF)
        else:
            ind.NLSFInterpCoef_Q2 = 4

        if ind.signalType == TYPE_VOICED:
            decode_absolute = True
            if cond_coding == CODE_CONDITIONALLY and \
                    self.ec_prevSignalType == TYPE_VOICED:
                delta = _icdf(dec, T.pitch_delta_iCDF)
                if delta > 0:
                    ind.lagIndex = self.ec_prevLagIndex + (delta - 9)
                    decode_absolute = False
            if decode_absolute:
                ind.lagIndex = _icdf(dec, T.pitch_lag_iCDF) \
                    * (self.fs_kHz >> 1)
                ind.lagIndex += _icdf(dec, self.pitch_lag_low_bits_iCDF)
            self.ec_prevLagIndex = ind.lagIndex
            ind.contourIndex = _icdf(dec, self.pitch_contour_iCDF)
            ind.PERIndex = _icdf(dec, T.LTP_per_index_iCDF)
            ltp_icdfs = (T.LTP_gain_iCDF_0, T.LTP_gain_iCDF_1,
                         T.LTP_gain_iCDF_2)
            for k in range(self.nb_subfr):
                ind.LTPIndex[k] = _icdf(dec, ltp_icdfs[ind.PERIndex])
            if cond_coding == CODE_INDEPENDENTLY:
                ind.LTP_scaleIndex = _icdf(dec, T.LTPscale_iCDF)
            else:
                ind.LTP_scaleIndex = 0
        self.ec_prevSignalType = ind.signalType
        ind.Seed = _icdf(dec, T.uniform4_iCDF)

    # -- decode_parameters.c:35-115 --------------------------------------

    def decode_parameters(self, cond_coding: int):
        ind = self.indices
        ctrl = {}
        gains, self.LastGainIndex = gains_dequant(
            ind.GainsIndices, self.LastGainIndex,
            cond_coding == CODE_CONDITIONALLY, self.nb_subfr)
        ctrl["Gains_Q16"] = gains

        nlsf_q15 = nlsf_decode(ind.NLSFIndices, self.psNLSF_CB)
        pred1 = nlsf2a(nlsf_q15, self.LPC_order)
        if self.first_frame_after_reset:
            ind.NLSFInterpCoef_Q2 = 4
        if ind.NLSFInterpCoef_Q2 < 4:
            nlsf0 = [self.prevNLSF_Q15[i]
                     + ((ind.NLSFInterpCoef_Q2
                         * (nlsf_q15[i] - self.prevNLSF_Q15[i])) >> 2)
                     for i in range(self.LPC_order)]
            pred0 = nlsf2a(nlsf0, self.LPC_order)
        else:
            pred0 = list(pred1)
        ctrl["PredCoef_Q12"] = [pred0, pred1]
        self.prevNLSF_Q15[:self.LPC_order] = nlsf_q15

        if self.lossCnt:
            bwexpander(ctrl["PredCoef_Q12"][0], self.LPC_order,
                       BWE_AFTER_LOSS_Q16)
            bwexpander(ctrl["PredCoef_Q12"][1], self.LPC_order,
                       BWE_AFTER_LOSS_Q16)

        if ind.signalType == TYPE_VOICED:
            ctrl["pitchL"] = decode_pitch(ind.lagIndex, ind.contourIndex,
                                          self.fs_kHz, self.nb_subfr)
            vqs = (T.LTP_gain_vq_0, T.LTP_gain_vq_1, T.LTP_gain_vq_2)
            cbk = vqs[ind.PERIndex]
            ltp = [0] * (self.nb_subfr * LTP_ORDER)
            for k in range(self.nb_subfr):
                for i in range(LTP_ORDER):
                    ltp[k * LTP_ORDER + i] = \
                        int(cbk[ind.LTPIndex[k]][i]) << 7
            ctrl["LTPCoef_Q14"] = ltp
            ctrl["LTP_scale_Q14"] = int(
                T.LTPScales_table_Q14[ind.LTP_scaleIndex])
        else:
            ctrl["pitchL"] = [0] * self.nb_subfr
            ctrl["LTPCoef_Q14"] = [0] * (LTP_ORDER * self.nb_subfr)
            ind.PERIndex = 0
            ctrl["LTP_scale_Q14"] = 0
        return ctrl

    # -- decode_core.c:38-237 --------------------------------------------

    def decode_core(self, ctrl, pulses) -> List[int]:
        xq = [0] * self.frame_length
        sLTP = [0] * self.ltp_mem_length
        sLTP_Q15 = [0] * (self.ltp_mem_length + self.frame_length)
        sLPC_Q14 = [0] * (self.subfr_length + MAX_LPC_ORDER)
        offset_Q10 = int(T.Quantization_Offsets_Q10[
            self.indices.signalType >> 1][self.indices.quantOffsetType])
        NLSF_interp_flag = 1 if self.indices.NLSFInterpCoef_Q2 < 4 else 0

        rand_seed = self.indices.Seed
        for i in range(self.frame_length):
            rand_seed = RAND(rand_seed)
            exc = i32(pulses[i] << 14)
            if exc > 0:
                exc -= QUANT_LEVEL_ADJUST_Q10 << 4
            elif exc < 0:
                exc += QUANT_LEVEL_ADJUST_Q10 << 4
            exc = i32(exc + (offset_Q10 << 4))
            if rand_seed < 0:
                exc = -exc
            self.exc_Q14[i] = exc
            rand_seed = i32(rand_seed + pulses[i])

        sLPC_Q14[:MAX_LPC_ORDER] = self.sLPC_Q14_buf
        pexc_off = 0
        pxq_off = 0
        sLTP_buf_idx = self.ltp_mem_length
        for k in range(self.nb_subfr):
            A_Q12 = ctrl["PredCoef_Q12"][k >> 1]
            B_Q14 = ctrl["LTPCoef_Q14"][k * LTP_ORDER:(k + 1) * LTP_ORDER]
            B_Q14 = list(B_Q14)
            signal_type = self.indices.signalType
            Gain_Q10 = ctrl["Gains_Q16"][k] >> 6
            inv_gain_Q31 = INVERSE32_varQ(ctrl["Gains_Q16"][k], 47)
            if ctrl["Gains_Q16"][k] != self.prev_gain_Q16:
                gain_adj_Q16 = DIV32_varQ(self.prev_gain_Q16,
                                          ctrl["Gains_Q16"][k], 16)
                for i in range(MAX_LPC_ORDER):
                    sLPC_Q14[i] = SMULWW(gain_adj_Q16, sLPC_Q14[i])
            else:
                gain_adj_Q16 = 1 << 16
            self.prev_gain_Q16 = ctrl["Gains_Q16"][k]

            if self.lossCnt and self.prevSignalType == TYPE_VOICED and \
                    self.indices.signalType != TYPE_VOICED and \
                    k < MAX_NB_SUBFR // 2:
                B_Q14 = [0] * LTP_ORDER
                B_Q14[LTP_ORDER // 2] = 4096  # 0.25 Q14
                signal_type = TYPE_VOICED
                ctrl["pitchL"][k] = self.lagPrev

            if signal_type == TYPE_VOICED:
                lag = ctrl["pitchL"][k]
                if k == 0 or (k == 2 and NLSF_interp_flag):
                    start_idx = self.ltp_mem_length - lag \
                        - self.LPC_order - LTP_ORDER // 2
                    assert start_idx > 0
                    if k == 2:
                        self.outBuf[self.ltp_mem_length:
                                    self.ltp_mem_length
                                    + 2 * self.subfr_length] = \
                            xq[:2 * self.subfr_length]
                    filt = lpc_analysis_filter(
                        self.outBuf, start_idx + k * self.subfr_length,
                        A_Q12, self.ltp_mem_length - start_idx,
                        self.LPC_order)
                    sLTP[start_idx:self.ltp_mem_length] = \
                        filt[:self.ltp_mem_length - start_idx]
                    if k == 0:
                        inv_gain_Q31 = i32(SMULWB(
                            inv_gain_Q31, ctrl["LTP_scale_Q14"]) << 2)
                    for i in range(lag + LTP_ORDER // 2):
                        sLTP_Q15[sLTP_buf_idx - i - 1] = SMULWB(
                            inv_gain_Q31,
                            sLTP[self.ltp_mem_length - i - 1])
                else:
                    if gain_adj_Q16 != 1 << 16:
                        for i in range(lag + LTP_ORDER // 2):
                            sLTP_Q15[sLTP_buf_idx - i - 1] = SMULWW(
                                gain_adj_Q16,
                                sLTP_Q15[sLTP_buf_idx - i - 1])

            if signal_type == TYPE_VOICED:
                pres = [0] * self.subfr_length
                plp = sLTP_buf_idx - lag + LTP_ORDER // 2
                for i in range(self.subfr_length):
                    pred = 2
                    pred = SMLAWB(pred, sLTP_Q15[plp], B_Q14[0])
                    pred = SMLAWB(pred, sLTP_Q15[plp - 1], B_Q14[1])
                    pred = SMLAWB(pred, sLTP_Q15[plp - 2], B_Q14[2])
                    pred = SMLAWB(pred, sLTP_Q15[plp - 3], B_Q14[3])
                    pred = SMLAWB(pred, sLTP_Q15[plp - 4], B_Q14[4])
                    plp += 1
                    pres[i] = i32(self.exc_Q14[pexc_off + i] + (pred << 1))
                    sLTP_Q15[sLTP_buf_idx] = i32(pres[i] << 1)
                    sLTP_buf_idx += 1
            else:
                pres = self.exc_Q14[pexc_off:pexc_off + self.subfr_length]

            for i in range(self.subfr_length):
                pred = self.LPC_order >> 1
                for j in range(self.LPC_order):
                    pred = SMLAWB(pred, sLPC_Q14[MAX_LPC_ORDER + i - j - 1],
                                  A_Q12[j])
                sLPC_Q14[MAX_LPC_ORDER + i] = ADD_SAT32(
                    pres[i], LSHIFT_SAT32(pred, 4))
                xq[pxq_off + i] = sat16(RSHIFT_ROUND(
                    SMULWW(sLPC_Q14[MAX_LPC_ORDER + i], Gain_Q10), 8))

            sLPC_Q14[:MAX_LPC_ORDER] = sLPC_Q14[self.subfr_length:
                                                self.subfr_length
                                                + MAX_LPC_ORDER]
            pexc_off += self.subfr_length
            pxq_off += self.subfr_length

        self.sLPC_Q14_buf = sLPC_Q14[:MAX_LPC_ORDER]
        return xq

    # -- PLC (PLC.c) ------------------------------------------------------

    def plc_reset(self):
        self.plc_pitchL_Q8 = self.frame_length << 7
        self.plc_prevGain_Q16 = [65536, 65536]
        self.plc_subfr_length = 20
        self.plc_nb_subfr = 2

    def plc(self, ctrl, frame, lost: bool):
        """PLC.c:73-114 silk_PLC."""
        if self.fs_kHz != self.plc_fs_kHz:
            self.plc_reset()
            self.plc_fs_kHz = self.fs_kHz
        if lost:
            self._plc_conceal(ctrl, frame)
            self.lossCnt += 1
        else:
            self._plc_update(ctrl)

    def _plc_update(self, ctrl):
        """PLC.c:119-190."""
        self.prevSignalType = self.indices.signalType
        LTP_Gain_Q14 = 0
        if self.indices.signalType == TYPE_VOICED:
            j = 0
            while j * self.subfr_length < ctrl["pitchL"][self.nb_subfr - 1]:
                if j == self.nb_subfr:
                    break
                temp = sum(ctrl["LTPCoef_Q14"][
                    (self.nb_subfr - 1 - j) * LTP_ORDER:
                    (self.nb_subfr - j) * LTP_ORDER])
                if temp > LTP_Gain_Q14:
                    LTP_Gain_Q14 = temp
                    self.plc_LTPCoef_Q14 = list(ctrl["LTPCoef_Q14"][
                        (self.nb_subfr - 1 - j) * LTP_ORDER:
                        (self.nb_subfr - j) * LTP_ORDER])
                    self.plc_pitchL_Q8 = \
                        ctrl["pitchL"][self.nb_subfr - 1 - j] << 8
                j += 1
            self.plc_LTPCoef_Q14 = [0] * LTP_ORDER
            self.plc_LTPCoef_Q14[LTP_ORDER // 2] = LTP_Gain_Q14
            if LTP_Gain_Q14 < V_PITCH_GAIN_START_MIN_Q14:
                scale_Q10 = DIV32(V_PITCH_GAIN_START_MIN_Q14 << 10,
                                  max(LTP_Gain_Q14, 1))
                self.plc_LTPCoef_Q14 = [
                    (SMULBB(c, scale_Q10) >> 10)
                    for c in self.plc_LTPCoef_Q14]
            elif LTP_Gain_Q14 > V_PITCH_GAIN_START_MAX_Q14:
                scale_Q14 = DIV32(V_PITCH_GAIN_START_MAX_Q14 << 14,
                                  max(LTP_Gain_Q14, 1))
                self.plc_LTPCoef_Q14 = [
                    (SMULBB(c, scale_Q14) >> 14)
                    for c in self.plc_LTPCoef_Q14]
        else:
            self.plc_pitchL_Q8 = (self.fs_kHz * 18) << 8
            self.plc_LTPCoef_Q14 = [0] * LTP_ORDER
        self.plc_prevLPC_Q12 = list(ctrl["PredCoef_Q12"][1][:self.LPC_order])
        self.plc_prevLTP_scale_Q14 = ctrl["LTP_scale_Q14"]
        self.plc_prevGain_Q16 = list(
            ctrl["Gains_Q16"][self.nb_subfr - 2:self.nb_subfr])
        self.plc_subfr_length = self.subfr_length
        self.plc_nb_subfr = self.nb_subfr

    def _plc_conceal(self, ctrl, frame):
        """PLC.c:216-430."""
        sLTP = [0] * self.ltp_mem_length
        sLTP_Q14 = [0] * (self.ltp_mem_length + self.frame_length)
        prevGain_Q10 = [self.plc_prevGain_Q16[0] >> 6,
                        self.plc_prevGain_Q16[1] >> 6]
        if self.first_frame_after_reset:
            self.plc_prevLPC_Q12 = [0] * MAX_LPC_ORDER

        # energy of last two subframes (silk_PLC_energy)
        exc_buf = [0] * (2 * self.plc_subfr_length)
        for k in range(2):
            for i in range(self.plc_subfr_length):
                exc_buf[k * self.plc_subfr_length + i] = sat16(
                    SMULWW(self.exc_Q14[
                        i + (k + self.plc_nb_subfr - 2)
                        * self.plc_subfr_length], prevGain_Q10[k]) >> 8)
        energy1, shift1 = sum_sqr_shift(exc_buf, self.plc_subfr_length)
        energy2, shift2 = sum_sqr_shift(exc_buf[self.plc_subfr_length:],
                                        self.plc_subfr_length)
        if (energy1 >> shift2) < (energy2 >> shift1):
            rand_off = max(0, (self.plc_nb_subfr - 1)
                           * self.plc_subfr_length - RAND_BUF_SIZE)
        else:
            rand_off = max(0, self.plc_nb_subfr
                           * self.plc_subfr_length - RAND_BUF_SIZE)
        B_Q14 = list(self.plc_LTPCoef_Q14)
        rand_scale_Q14 = self.plc_randScale_Q14
        harm_Gain_Q15 = HARM_ATT_Q15[min(1, self.lossCnt)]
        if self.prevSignalType == TYPE_VOICED:
            rand_Gain_Q15 = PLC_RAND_ATTENUATE_V_Q15[min(1, self.lossCnt)]
        else:
            rand_Gain_Q15 = PLC_RAND_ATTENUATE_UV_Q15[min(1, self.lossCnt)]
        bwexpander(self.plc_prevLPC_Q12, self.LPC_order, BWE_COEF_Q16)
        A_Q12 = self.plc_prevLPC_Q12[:self.LPC_order]
        if self.lossCnt == 0:
            rand_scale_Q14 = 1 << 14
            if self.prevSignalType == TYPE_VOICED:
                rand_scale_Q14 -= sum(B_Q14)
                rand_scale_Q14 = max(3277, rand_scale_Q14)
                rand_scale_Q14 = (SMULBB(rand_scale_Q14,
                                         self.plc_prevLTP_scale_Q14) >> 14)
            else:
                invGain_Q30 = lpc_inverse_pred_gain(self.plc_prevLPC_Q12,
                                                    self.LPC_order)
                down_scale_Q30 = min((1 << 30)
                                     >> LOG2_INV_LPC_GAIN_HIGH_THRES,
                                     invGain_Q30)
                down_scale_Q30 = max((1 << 30)
                                     >> LOG2_INV_LPC_GAIN_LOW_THRES,
                                     down_scale_Q30)
                down_scale_Q30 = i32(down_scale_Q30
                                     << LOG2_INV_LPC_GAIN_HIGH_THRES)
                rand_Gain_Q15 = SMULWB(down_scale_Q30, rand_Gain_Q15) >> 14
        rand_seed = self.plc_rand_seed
        lag = RSHIFT_ROUND(self.plc_pitchL_Q8, 8)
        sLTP_buf_idx = self.ltp_mem_length
        idx = self.ltp_mem_length - lag - self.LPC_order - LTP_ORDER // 2
        assert idx > 0
        filt = lpc_analysis_filter(self.outBuf, idx, A_Q12,
                                   self.ltp_mem_length - idx,
                                   self.LPC_order)
        sLTP[idx:self.ltp_mem_length] = filt[:self.ltp_mem_length - idx]
        inv_gain_Q30 = INVERSE32_varQ(self.plc_prevGain_Q16[1], 46)
        inv_gain_Q30 = min(inv_gain_Q30, 0x7FFFFFFF >> 1)
        for i in range(idx + self.LPC_order, self.ltp_mem_length):
            sLTP_Q14[i] = SMULWB(inv_gain_Q30, sLTP[i])
        for k in range(self.nb_subfr):
            plp = sLTP_buf_idx - lag + LTP_ORDER // 2
            for i in range(self.subfr_length):
                pred_Q12 = 2
                pred_Q12 = SMLAWB(pred_Q12, sLTP_Q14[plp], B_Q14[0])
                pred_Q12 = SMLAWB(pred_Q12, sLTP_Q14[plp - 1], B_Q14[1])
                pred_Q12 = SMLAWB(pred_Q12, sLTP_Q14[plp - 2], B_Q14[2])
                pred_Q12 = SMLAWB(pred_Q12, sLTP_Q14[plp - 3], B_Q14[3])
                pred_Q12 = SMLAWB(pred_Q12, sLTP_Q14[plp - 4], B_Q14[4])
                plp += 1
                rand_seed = RAND(rand_seed)
                ridx = (rand_seed >> 25) & RAND_BUF_MASK
                sLTP_Q14[sLTP_buf_idx] = i32(SMLAWB(
                    pred_Q12, self.exc_Q14[rand_off + ridx],
                    rand_scale_Q14) << 2)
                sLTP_buf_idx += 1
            for j in range(LTP_ORDER):
                B_Q14[j] = SMULBB(harm_Gain_Q15, B_Q14[j]) >> 15
            rand_scale_Q14 = SMULBB(rand_scale_Q14, rand_Gain_Q15) >> 15
            self.plc_pitchL_Q8 = SMLAWB(self.plc_pitchL_Q8,
                                        self.plc_pitchL_Q8,
                                        PITCH_DRIFT_FAC_Q16)
            self.plc_pitchL_Q8 = min(self.plc_pitchL_Q8,
                                     (MAX_PITCH_LAG_MS * self.fs_kHz) << 8)
            lag = RSHIFT_ROUND(self.plc_pitchL_Q8, 8)
        # LPC synthesis
        sbase = self.ltp_mem_length - MAX_LPC_ORDER
        sLTP_Q14[sbase:sbase + MAX_LPC_ORDER] = self.sLPC_Q14_buf
        for i in range(self.frame_length):
            pred_Q10 = self.LPC_order >> 1
            for j in range(self.LPC_order):
                pred_Q10 = SMLAWB(pred_Q10,
                                  sLTP_Q14[sbase + MAX_LPC_ORDER + i - j - 1],
                                  A_Q12[j])
            sLTP_Q14[sbase + MAX_LPC_ORDER + i] = ADD_SAT32(
                sLTP_Q14[sbase + MAX_LPC_ORDER + i],
                LSHIFT_SAT32(pred_Q10, 4))
            frame[i] = sat16(RSHIFT_ROUND(
                SMULWW(sLTP_Q14[sbase + MAX_LPC_ORDER + i],
                       prevGain_Q10[1]), 8))
        self.sLPC_Q14_buf = sLTP_Q14[sbase + self.frame_length:
                                     sbase + self.frame_length
                                     + MAX_LPC_ORDER]
        self.plc_rand_seed = rand_seed
        self.plc_randScale_Q14 = rand_scale_Q14
        ctrl["pitchL"] = [lag] * MAX_NB_SUBFR

    def plc_glue_frames(self, frame, length):
        """PLC.c:433-491."""
        if self.lossCnt:
            self.plc_conc_energy, self.plc_conc_energy_shift = \
                sum_sqr_shift(frame, length)
            self.plc_last_frame_lost = 1
        else:
            if self.plc_last_frame_lost:
                energy, energy_shift = sum_sqr_shift(frame, length)
                conc = self.plc_conc_energy
                if energy_shift > self.plc_conc_energy_shift:
                    conc >>= energy_shift - self.plc_conc_energy_shift
                elif energy_shift < self.plc_conc_energy_shift:
                    energy >>= self.plc_conc_energy_shift - energy_shift
                if energy > conc:
                    LZ = CLZ32(conc) - 1
                    conc = i32(conc << LZ)
                    energy >>= max(24 - LZ, 0)
                    frac_Q24 = DIV32(conc, max(energy, 1))
                    gain_Q16 = i32(SQRT_APPROX(frac_Q24) << 4)
                    slope_Q16 = DIV32_16((1 << 16) - gain_Q16, length)
                    slope_Q16 = i32(slope_Q16 << 2)
                    for i in range(length):
                        frame[i] = SMULWB(gain_Q16, frame[i])
                        gain_Q16 += slope_Q16
                        if gain_Q16 > 1 << 16:
                            break
            self.plc_last_frame_lost = 0

    # -- CNG (CNG.c) ------------------------------------------------------

    def _cng_reset(self):
        nlsf_step = DIV32_16(0x7FFF, self.LPC_order + 1)
        acc = 0
        for i in range(self.LPC_order):
            acc += nlsf_step
            self.cng_smth_NLSF_Q15[i] = acc
        self.cng_smth_Gain_Q16 = 0
        self.cng_rand_seed = 3176576

    def cng(self, ctrl, frame, length):
        """CNG.c:79-190."""
        if self.fs_kHz != self.cng_fs_kHz:
            self._cng_reset()
            self.cng_fs_kHz = self.fs_kHz
        if self.lossCnt == 0 and \
                self.prevSignalType == TYPE_NO_VOICE_ACTIVITY:
            for i in range(self.LPC_order):
                self.cng_smth_NLSF_Q15[i] += SMULWB(
                    self.prevNLSF_Q15[i] - self.cng_smth_NLSF_Q15[i],
                    CNG_NLSF_SMTH_Q16)
            max_gain = 0
            subfr = 0
            for i in range(self.nb_subfr):
                if ctrl["Gains_Q16"][i] > max_gain:
                    max_gain = ctrl["Gains_Q16"][i]
                    subfr = i
            self.cng_exc_buf_Q14[self.subfr_length:
                                 self.nb_subfr * self.subfr_length] = \
                self.cng_exc_buf_Q14[:(self.nb_subfr - 1)
                                     * self.subfr_length]
            self.cng_exc_buf_Q14[:self.subfr_length] = \
                self.exc_Q14[subfr * self.subfr_length:
                             (subfr + 1) * self.subfr_length]
            for i in range(self.nb_subfr):
                self.cng_smth_Gain_Q16 += SMULWB(
                    ctrl["Gains_Q16"][i] - self.cng_smth_Gain_Q16,
                    CNG_GAIN_SMTH_Q16)
                if SMULWW(self.cng_smth_Gain_Q16,
                          CNG_GAIN_SMTH_THRESHOLD_Q16) > \
                        ctrl["Gains_Q16"][i]:
                    self.cng_smth_Gain_Q16 = ctrl["Gains_Q16"][i]
        if self.lossCnt:
            gain_Q16 = SMULWW(self.plc_randScale_Q14,
                              self.plc_prevGain_Q16[1])
            if gain_Q16 >= (1 << 21) or self.cng_smth_Gain_Q16 > (1 << 23):
                gain_Q16 = SMULTT(gain_Q16, gain_Q16)
                gain_Q16 = i32(SMULTT(self.cng_smth_Gain_Q16,
                                      self.cng_smth_Gain_Q16)
                               - i32(gain_Q16 << 5))
                gain_Q16 = i32(SQRT_APPROX(gain_Q16) << 16)
            else:
                gain_Q16 = SMULWW(gain_Q16, gain_Q16)
                gain_Q16 = i32(SMULWW(self.cng_smth_Gain_Q16,
                                      self.cng_smth_Gain_Q16)
                               - i32(gain_Q16 << 5))
                gain_Q16 = i32(SQRT_APPROX(gain_Q16) << 8)
            gain_Q10 = gain_Q16 >> 6
            # CNG excitation (silk_CNG_exc)
            exc_mask = CNG_BUF_MASK_MAX
            while exc_mask > length:
                exc_mask >>= 1
            seed = self.cng_rand_seed
            sig_Q14 = [0] * (length + MAX_LPC_ORDER)
            sig_Q14[:MAX_LPC_ORDER] = self.cng_synth_state
            exc = [0] * length
            for i in range(length):
                seed = RAND(seed)
                eidx = (seed >> 24) & exc_mask
                exc[i] = self.cng_exc_buf_Q14[eidx]
            self.cng_rand_seed = seed
            A_Q12 = nlsf2a(self.cng_smth_NLSF_Q15[:self.LPC_order],
                           self.LPC_order)
            for i in range(length):
                pred_Q10 = self.LPC_order >> 1
                for j in range(self.LPC_order):
                    pred_Q10 = SMLAWB(pred_Q10,
                                      sig_Q14[MAX_LPC_ORDER + i - j - 1],
                                      A_Q12[j])
                sig_Q14[MAX_LPC_ORDER + i] = ADD_SAT32(
                    exc[i], LSHIFT_SAT32(pred_Q10, 4))
                frame[i] = ADD_SAT16(frame[i], sat16(RSHIFT_ROUND(
                    SMULWW(sig_Q14[MAX_LPC_ORDER + i], gain_Q10), 8)))
            self.cng_synth_state = sig_Q14[length:length + MAX_LPC_ORDER]
        else:
            self.cng_synth_state = [0] * MAX_LPC_ORDER

    # -- decode_frame.c:43-168 -------------------------------------------

    def decode_frame(self, dec: Optional[RangeDecoder], lost_flag: int,
                     cond_coding: int) -> List[int]:
        L = self.frame_length
        ctrl = {"LTP_scale_Q14": 0, "Gains_Q16": [65536] * MAX_NB_SUBFR,
                "pitchL": [0] * MAX_NB_SUBFR,
                "LTPCoef_Q14": [0] * (LTP_ORDER * MAX_NB_SUBFR),
                "PredCoef_Q12": [[0] * MAX_LPC_ORDER, [0] * MAX_LPC_ORDER]}
        frame = [0] * L
        if lost_flag == FLAG_DECODE_NORMAL or \
                (lost_flag == FLAG_DECODE_LBRR
                 and self.LBRR_flags[self.nFramesDecoded] == 1):
            self.decode_indices(dec, self.nFramesDecoded,
                                lost_flag == FLAG_DECODE_LBRR, cond_coding)
            pulses = decode_pulses(dec, self.indices.signalType,
                                   self.indices.quantOffsetType,
                                   self.frame_length)
            if getattr(self, "trace", None) is not None:
                import copy
                self.trace.append((copy.deepcopy(self.indices),
                                   list(pulses), cond_coding))
            ctrl = self.decode_parameters(cond_coding)
            frame = self.decode_core(ctrl, pulses)
            mv_len = self.ltp_mem_length - self.frame_length
            self.outBuf[:mv_len] = self.outBuf[self.frame_length:
                                               self.ltp_mem_length]
            self.outBuf[mv_len:self.ltp_mem_length] = frame
            self.plc(ctrl, frame, False)
            self.lossCnt = 0
            self.prevSignalType = self.indices.signalType
            self.first_frame_after_reset = False
        else:
            self.plc(ctrl, frame, True)
            mv_len = self.ltp_mem_length - self.frame_length
            self.outBuf[:mv_len] = self.outBuf[self.frame_length:
                                               self.ltp_mem_length]
            self.outBuf[mv_len:self.ltp_mem_length] = frame
        self.cng(ctrl, frame, L)
        self.plc_glue_frames(frame, L)
        self.lagPrev = ctrl["pitchL"][self.nb_subfr - 1]
        return frame


def stereo_decode_pred(dec: RangeDecoder):
    """stereo_decode_pred.c:36-63. Returns pred_Q13[2]."""
    n = _icdf(dec, T.stereo_pred_joint_iCDF)
    ix = [[0, 0, 0], [0, 0, 0]]
    ix[0][2] = n // 5
    ix[1][2] = n - 5 * ix[0][2]
    for ch in range(2):
        ix[ch][0] = _icdf(dec, T.uniform3_iCDF)
        ix[ch][1] = _icdf(dec, T.uniform5_iCDF)
    pred_Q13 = [0, 0]
    for ch in range(2):
        ix[ch][0] += 3 * ix[ch][2]
        low = int(T.stereo_pred_quant_Q13[ix[ch][0]])
        step = SMULWB(int(T.stereo_pred_quant_Q13[ix[ch][0] + 1]) - low,
                      int(0.5 / STEREO_QUANT_SUB_STEPS * 65536 + 0.5))
        pred_Q13[ch] = SMLABB(low, step, 2 * ix[ch][1] + 1)
    pred_Q13[0] -= pred_Q13[1]
    return pred_Q13


def stereo_decode_mid_only(dec: RangeDecoder) -> int:
    return _icdf(dec, T.stereo_only_code_mid_iCDF)


class _StereoState:
    def __init__(self):
        self.pred_prev_Q13 = [0, 0]
        self.sMid = [0, 0]
        self.sSide = [0, 0]


def stereo_ms_to_lr(state: _StereoState, x1, x2, pred_Q13, fs_kHz,
                    frame_length):
    """stereo_MS_to_LR.c:36-85. x1/x2 length frame_length+2, in place."""
    x1[:2] = state.sMid
    x2[:2] = state.sSide
    state.sMid = list(x1[frame_length:frame_length + 2])
    state.sSide = list(x2[frame_length:frame_length + 2])
    pred0_Q13 = state.pred_prev_Q13[0]
    pred1_Q13 = state.pred_prev_Q13[1]
    denom_Q16 = DIV32_16(1 << 16, STEREO_INTERP_LEN_MS * fs_kHz)
    delta0 = RSHIFT_ROUND(SMULBB(pred_Q13[0] - state.pred_prev_Q13[0],
                                 denom_Q16), 16)
    delta1 = RSHIFT_ROUND(SMULBB(pred_Q13[1] - state.pred_prev_Q13[1],
                                 denom_Q16), 16)
    interp_len = STEREO_INTERP_LEN_MS * fs_kHz
    for n in range(frame_length):
        if n < interp_len:
            pred0_Q13 += delta0
            pred1_Q13 += delta1
        elif n == interp_len:
            pred0_Q13 = pred_Q13[0]
            pred1_Q13 = pred_Q13[1]
        s = i32((x1[n] + x1[n + 2] + (x1[n + 1] << 1)) << 9)
        s = SMLAWB(i32(x2[n + 1] << 8), s, pred0_Q13)
        s = SMLAWB(s, i32(x1[n + 1] << 11), pred1_Q13)
        x2[n + 1] = sat16(RSHIFT_ROUND(s, 8))
    # handle the n == interp_len boundary when loop ended before reaching it
    state.pred_prev_Q13 = list(pred_Q13)
    for n in range(frame_length):
        s = x1[n + 1] + x2[n + 1]
        d = x1[n + 1] - x2[n + 1]
        x1[n + 1] = sat16(s)
        x2[n + 1] = sat16(d)


class SilkDecoder:
    """silk_decoder (dec_API.c): 2 channel states + stereo state."""

    def __init__(self):
        self.channel_state = [SilkChannelState(), SilkChannelState()]
        self.sStereo = _StereoState()
        self.nChannelsAPI = 0
        self.nChannelsInternal = 0
        self.prev_decode_only_middle = 0

    def reset(self):
        self.__init__()

    def decode(self, ctl: DecControl, lost_flag: int, new_packet: bool,
               dec: Optional[RangeDecoder]) -> np.ndarray:
        """silk_Decode (dec_API.c:132-455). Returns int16 samples
        [nSamplesOut * nChannelsAPI] interleaved."""
        cs = self.channel_state
        decode_only_middle = 0
        MS_pred_Q13 = [0, 0]
        if new_packet:
            for n in range(ctl.nChannelsInternal):
                cs[n].nFramesDecoded = 0
        if ctl.nChannelsInternal > self.nChannelsInternal:
            cs[1] = SilkChannelState()
        stereo_to_mono = (ctl.nChannelsInternal == 1
                          and self.nChannelsInternal == 2
                          and ctl.internalSampleRate
                          == 1000 * cs[0].fs_kHz)
        if cs[0].nFramesDecoded == 0:
            for n in range(ctl.nChannelsInternal):
                if ctl.payloadSize_ms in (0, 10):
                    cs[n].nFramesPerPacket = 1
                    cs[n].nb_subfr = 2
                elif ctl.payloadSize_ms == 20:
                    cs[n].nFramesPerPacket = 1
                    cs[n].nb_subfr = 4
                elif ctl.payloadSize_ms == 40:
                    cs[n].nFramesPerPacket = 2
                    cs[n].nb_subfr = 4
                elif ctl.payloadSize_ms == 60:
                    cs[n].nFramesPerPacket = 3
                    cs[n].nb_subfr = 4
                else:
                    raise ValueError("bad payload size")
                fs_khz_dec = (ctl.internalSampleRate >> 10) + 1
                cs[n].set_fs(fs_khz_dec, ctl.API_sampleRate)
        if ctl.nChannelsAPI == 2 and ctl.nChannelsInternal == 2 and \
                (self.nChannelsAPI == 1 or self.nChannelsInternal == 1):
            self.sStereo.pred_prev_Q13 = [0, 0]
            self.sStereo.sSide = [0, 0]
            cs[1].resampler = cs[0].resampler and \
                _copy_resampler(cs[0].resampler)
        self.nChannelsAPI = ctl.nChannelsAPI
        self.nChannelsInternal = ctl.nChannelsInternal

        if lost_flag != FLAG_PACKET_LOST and cs[0].nFramesDecoded == 0:
            for n in range(ctl.nChannelsInternal):
                for i in range(cs[n].nFramesPerPacket):
                    cs[n].VAD_flags[i] = dec.dec_bit_logp(1)
                cs[n].LBRR_flag = dec.dec_bit_logp(1)
            for n in range(ctl.nChannelsInternal):
                cs[n].LBRR_flags = [0] * 3
                if cs[n].LBRR_flag:
                    if cs[n].nFramesPerPacket == 1:
                        cs[n].LBRR_flags[0] = 1
                    else:
                        sym = _icdf(dec, (T.LBRR_flags_2_iCDF,
                                          T.LBRR_flags_3_iCDF)[
                            cs[n].nFramesPerPacket - 2]) + 1
                        for i in range(cs[n].nFramesPerPacket):
                            cs[n].LBRR_flags[i] = (sym >> i) & 1
            if lost_flag == FLAG_DECODE_NORMAL:
                # skip LBRR data
                for i in range(cs[0].nFramesPerPacket):
                    for n in range(ctl.nChannelsInternal):
                        if cs[n].LBRR_flags[i]:
                            if ctl.nChannelsInternal == 2 and n == 0:
                                stereo_decode_pred(dec)
                                if cs[1].LBRR_flags[i] == 0:
                                    stereo_decode_mid_only(dec)
                            cond = CODE_CONDITIONALLY if (
                                i > 0 and cs[n].LBRR_flags[i - 1]) \
                                else CODE_INDEPENDENTLY
                            cs[n].decode_indices(dec, i, True, cond)
                            decode_pulses(dec, cs[n].indices.signalType,
                                          cs[n].indices.quantOffsetType,
                                          cs[n].frame_length)

        if ctl.nChannelsInternal == 2:
            if lost_flag == FLAG_DECODE_NORMAL or \
                    (lost_flag == FLAG_DECODE_LBRR
                     and cs[0].LBRR_flags[cs[0].nFramesDecoded] == 1):
                MS_pred_Q13 = stereo_decode_pred(dec)
                if (lost_flag == FLAG_DECODE_NORMAL
                        and cs[1].VAD_flags[cs[0].nFramesDecoded] == 0) or \
                        (lost_flag == FLAG_DECODE_LBRR
                         and cs[1].LBRR_flags[cs[0].nFramesDecoded] == 0):
                    decode_only_middle = stereo_decode_mid_only(dec)
                else:
                    decode_only_middle = 0
            else:
                MS_pred_Q13 = list(self.sStereo.pred_prev_Q13)

        if ctl.nChannelsInternal == 2 and decode_only_middle == 0 and \
                self.prev_decode_only_middle == 1:
            cs[1].outBuf = [0] * len(cs[1].outBuf)
            cs[1].sLPC_Q14_buf = [0] * MAX_LPC_ORDER
            cs[1].lagPrev = 100
            cs[1].LastGainIndex = 10
            cs[1].prevSignalType = TYPE_NO_VOICE_ACTIVITY
            cs[1].first_frame_after_reset = True

        if lost_flag == FLAG_DECODE_NORMAL:
            has_side = not decode_only_middle
        else:
            has_side = (not self.prev_decode_only_middle) or \
                (ctl.nChannelsInternal == 2
                 and lost_flag == FLAG_DECODE_LBRR
                 and cs[1].LBRR_flags[cs[1].nFramesDecoded] == 1)

        samples1 = [[0] * (cs[0].frame_length + 2) for _ in range(2)]
        nSamplesOutDec = cs[0].frame_length
        for n in range(ctl.nChannelsInternal):
            if n == 0 or has_side:
                frame_index = cs[0].nFramesDecoded - n
                if frame_index <= 0:
                    cond = CODE_INDEPENDENTLY
                elif lost_flag == FLAG_DECODE_LBRR:
                    cond = CODE_CONDITIONALLY if \
                        cs[n].LBRR_flags[frame_index - 1] \
                        else CODE_INDEPENDENTLY
                elif n > 0 and self.prev_decode_only_middle:
                    cond = CODE_INDEPENDENTLY_NO_LTP_SCALING
                else:
                    cond = CODE_CONDITIONALLY
                frame = cs[n].decode_frame(dec, lost_flag, cond)
                samples1[n][2:2 + nSamplesOutDec] = frame
            else:
                samples1[n][2:2 + nSamplesOutDec] = [0] * nSamplesOutDec
            cs[n].nFramesDecoded += 1

        if ctl.nChannelsAPI == 2 and ctl.nChannelsInternal == 2:
            stereo_ms_to_lr(self.sStereo, samples1[0], samples1[1],
                            MS_pred_Q13, cs[0].fs_kHz, nSamplesOutDec)
        else:
            samples1[0][:2] = self.sStereo.sMid
            self.sStereo.sMid = list(
                samples1[0][nSamplesOutDec:nSamplesOutDec + 2])

        nSamplesOut = DIV32(nSamplesOutDec * ctl.API_sampleRate,
                            cs[0].fs_kHz * 1000)
        out = np.zeros(nSamplesOut * ctl.nChannelsAPI, dtype=np.int64)
        for n in range(min(ctl.nChannelsAPI, ctl.nChannelsInternal)):
            res = cs[n].resampler.process(
                samples1[n][1:1 + nSamplesOutDec])
            if ctl.nChannelsAPI == 2:
                out[n::2] = res[:nSamplesOut]
            else:
                out[:nSamplesOut] = res[:nSamplesOut]
        if ctl.nChannelsAPI == 2 and ctl.nChannelsInternal == 1:
            if stereo_to_mono:
                res = cs[1].resampler.process(
                    samples1[0][1:1 + nSamplesOutDec])
                out[1::2] = res[:nSamplesOut]
            else:
                out[1::2] = out[0::2]

        if cs[0].prevSignalType == TYPE_VOICED:
            mult_tab = (6, 4, 3)
            ctl.prevPitchLag = cs[0].lagPrev * \
                mult_tab[(cs[0].fs_kHz - 8) >> 2]
        else:
            ctl.prevPitchLag = 0

        if lost_flag == FLAG_PACKET_LOST:
            for i in range(self.nChannelsInternal):
                self.channel_state[i].LastGainIndex = 10
        else:
            self.prev_decode_only_middle = decode_only_middle
        return out


def _copy_resampler(src: Resampler) -> Resampler:
    import copy
    return copy.deepcopy(src)
