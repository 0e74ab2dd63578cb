"""SILK encoder-side entropy coding: side-info indices, excitation
pulses, gains quantisation and stereo predictor coding.

Re-implements silk/encode_indices.c, encode_pulses.c, the encode half
of shell_coder.c and code_signs.c, gain_quant.c silk_gains_quant, and
stereo_encode_pred.c — the exact bit-level inverses of the (bit-exact
validated) decode paths in decoder.py.  Round-trip property: decoding
a reference packet with decoder.py and re-encoding the recovered
indices/pulses reproduces the packet byte-for-byte.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np

from ..bitstream.range_coder import RangeEncoder
from . import tables as T
from .nlsf import NLSFCodebook, nlsf_unpack
from .sigproc import LIMIT, SMULWB, lin2log, log2lin

# silk/define.h
TYPE_NO_VOICE_ACTIVITY = 0
TYPE_UNVOICED = 1
TYPE_VOICED = 2
CODE_INDEPENDENTLY = 0
CODE_INDEPENDENTLY_NO_LTP_SCALING = 1
CODE_CONDITIONALLY = 2
MAX_NB_SUBFR = 4
N_LEVELS_QGAIN = 64
MIN_DELTA_GAIN_QUANT = -4
MAX_DELTA_GAIN_QUANT = 36
NLSF_QUANT_MAX_AMPLITUDE = 4
SHELL_CODEC_FRAME_LENGTH = 16
LOG2_SHELL_CODEC_FRAME_LENGTH = 4
N_RATE_LEVELS = 10
SILK_MAX_PULSES = 16
MIN_QGAIN_DB = 2
MAX_QGAIN_DB = 88
GAIN_OFFSET = (MIN_QGAIN_DB * 128) // 6 + 16 * 128
SCALE_Q16 = (65536 * (N_LEVELS_QGAIN - 1)) // (((MAX_QGAIN_DB
                                                 - MIN_QGAIN_DB) * 128) // 6)
INV_SCALE_Q16 = (65536 * (((MAX_QGAIN_DB - MIN_QGAIN_DB) * 128) // 6)) \
    // (N_LEVELS_QGAIN - 1)


@dataclass
class SideInfoIndices:
    """SideInfoIndices (silk/structs.h)."""
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


def encode_indices(enc: RangeEncoder, ind: SideInfoIndices,
                   nlsf_cb: NLSFCodebook, nb_subfr: int, fs_khz: int,
                   cond_coding: int, ec_prev_signal_type: int,
                   ec_prev_lag_index: int) -> int:
    """silk_encode_indices (encode_indices.c:31-160).  Returns the new
    ec_prevLagIndex (caller tracks ec_prevSignalType = signalType)."""
    type_offset = 2 * ind.signalType + ind.quantOffsetType
    if type_offset >= 2:
        enc.enc_icdf(type_offset - 2, T.type_offset_VAD_iCDF, 8)
    else:
        enc.enc_icdf(type_offset, T.type_offset_no_VAD_iCDF, 8)

    if cond_coding == CODE_CONDITIONALLY:
        enc.enc_icdf(ind.GainsIndices[0], T.delta_gain_iCDF, 8)
    else:
        enc.enc_icdf(ind.GainsIndices[0] >> 3,
                     T.gain_iCDF[ind.signalType], 8)
        enc.enc_icdf(ind.GainsIndices[0] & 7, T.uniform8_iCDF, 8)
    for i in range(1, nb_subfr):
        enc.enc_icdf(ind.GainsIndices[i], T.delta_gain_iCDF, 8)

    # NLSFs
    ix = (ind.signalType >> 1) * nlsf_cb.n_vectors
    enc.enc_icdf(ind.NLSFIndices[0],
                 nlsf_cb.cb1_icdf[ix:ix + nlsf_cb.n_vectors], 8)
    ec_ix, pred_q8 = nlsf_unpack(nlsf_cb, ind.NLSFIndices[0])
    for i in range(nlsf_cb.order):
        v = ind.NLSFIndices[i + 1]
        tab = nlsf_cb.ec_icdf[ec_ix[i]:]
        if v >= NLSF_QUANT_MAX_AMPLITUDE:
            enc.enc_icdf(2 * NLSF_QUANT_MAX_AMPLITUDE, tab, 8)
            enc.enc_icdf(v - NLSF_QUANT_MAX_AMPLITUDE, T.NLSF_EXT_iCDF, 8)
        elif v <= -NLSF_QUANT_MAX_AMPLITUDE:
            enc.enc_icdf(0, tab, 8)
            enc.enc_icdf(-v - NLSF_QUANT_MAX_AMPLITUDE, T.NLSF_EXT_iCDF, 8)
        else:
            enc.enc_icdf(v + NLSF_QUANT_MAX_AMPLITUDE, tab, 8)
    if nb_subfr == MAX_NB_SUBFR:
        enc.enc_icdf(ind.NLSFInterpCoef_Q2,
                     T.NLSF_interpolation_factor_iCDF, 8)

    if ind.signalType == TYPE_VOICED:
        # pitch lag
        encode_absolute = 1
        if (cond_coding == CODE_CONDITIONALLY
                and ec_prev_signal_type == TYPE_VOICED):
            delta = ind.lagIndex - ec_prev_lag_index
            if delta < -8 or delta > 11:
                delta = 0
            else:
                delta += 9
                encode_absolute = 0
            enc.enc_icdf(delta, T.pitch_delta_iCDF, 8)
        if encode_absolute:
            high = ind.lagIndex // (fs_khz >> 1)
            low = ind.lagIndex - high * (fs_khz >> 1)
            enc.enc_icdf(high, T.pitch_lag_iCDF, 8)
            enc.enc_icdf(low, _lag_low_bits_icdf(fs_khz), 8)
        ec_prev_lag_index = ind.lagIndex
        enc.enc_icdf(ind.contourIndex,
                     _pitch_contour_icdf(fs_khz, nb_subfr), 8)
        # LTP gains
        enc.enc_icdf(ind.PERIndex, T.LTP_per_index_iCDF, 8)
        ltp_tabs = (T.LTP_gain_iCDF_0, T.LTP_gain_iCDF_1,
                    T.LTP_gain_iCDF_2)
        for k in range(nb_subfr):
            enc.enc_icdf(ind.LTPIndex[k], ltp_tabs[ind.PERIndex], 8)
        if cond_coding == CODE_INDEPENDENTLY:
            enc.enc_icdf(ind.LTP_scaleIndex, T.LTPscale_iCDF, 8)

    enc.enc_icdf(ind.Seed, T.uniform4_iCDF, 8)
    return ec_prev_lag_index


def _lag_low_bits_icdf(fs_khz: int):
    if fs_khz == 8:
        return T.uniform4_iCDF
    if fs_khz == 12:
        return T.uniform6_iCDF
    return T.uniform8_iCDF


def _pitch_contour_icdf(fs_khz: int, nb_subfr: int):
    if nb_subfr == MAX_NB_SUBFR:
        return (T.pitch_contour_NB_iCDF if fs_khz == 8
                else T.pitch_contour_iCDF)
    return (T.pitch_contour_10_ms_NB_iCDF if fs_khz == 8
            else T.pitch_contour_10_ms_iCDF)


# ----------------------------------------------------------------------
# Excitation

_SHELL_TABLES = (T.shell_code_table0, T.shell_code_table1,
                 T.shell_code_table2, T.shell_code_table3)


def _encode_split(enc: RangeEncoder, p_child1: int, p: int, table):
    if p > 0:
        off = int(T.shell_code_table_offsets[p])
        enc.enc_icdf(p_child1, table[off:], 8)


def shell_encoder(enc: RangeEncoder, pulses0: Sequence[int]):
    """silk_shell_encoder (shell_coder.c:76-113): strict split order."""
    p0 = list(pulses0)
    p1 = [p0[2 * k] + p0[2 * k + 1] for k in range(8)]
    p2 = [p1[2 * k] + p1[2 * k + 1] for k in range(4)]
    p3 = [p2[2 * k] + p2[2 * k + 1] for k in range(2)]
    p4 = [p3[0] + p3[1]]
    t0, t1, t2, t3 = _SHELL_TABLES
    _encode_split(enc, p3[0], p4[0], t3)
    _encode_split(enc, p2[0], p3[0], t2)
    _encode_split(enc, p1[0], p2[0], t1)
    _encode_split(enc, p0[0], p1[0], t0)
    _encode_split(enc, p0[2], p1[1], t0)
    _encode_split(enc, p1[2], p2[1], t1)
    _encode_split(enc, p0[4], p1[2], t0)
    _encode_split(enc, p0[6], p1[3], t0)
    _encode_split(enc, p2[2], p3[1], t2)
    _encode_split(enc, p1[4], p2[2], t1)
    _encode_split(enc, p0[8], p1[4], t0)
    _encode_split(enc, p0[10], p1[5], t0)
    _encode_split(enc, p1[6], p2[3], t1)
    _encode_split(enc, p0[12], p1[6], t0)
    _encode_split(enc, p0[14], p1[7], t0)


def encode_signs(enc: RangeEncoder, pulses: Sequence[int], length: int,
                 signal_type: int, quant_offset_type: int,
                 sum_pulses: Sequence[int]):
    """silk_encode_signs (code_signs.c:38-65)."""
    i0 = 7 * (quant_offset_type + (signal_type << 1))
    icdf_base = T.sign_iCDF
    nblk = (length + SHELL_CODEC_FRAME_LENGTH // 2) \
        >> LOG2_SHELL_CODEC_FRAME_LENGTH
    for i in range(nblk):
        p = sum_pulses[i]
        if p > 0:
            icdf = (int(icdf_base[i0 + min(p & 0x1F, 6)]), 0)
            for j in range(SHELL_CODEC_FRAME_LENGTH):
                q = pulses[i * SHELL_CODEC_FRAME_LENGTH + j]
                if q != 0:
                    enc.enc_icdf(0 if q < 0 else 1, icdf, 8)


def encode_pulses(enc: RangeEncoder, signal_type: int,
                  quant_offset_type: int, pulses: Sequence[int],
                  frame_length: int):
    """silk_encode_pulses (encode_pulses.c:51-160)."""
    pulses = list(pulses)
    niter = frame_length >> LOG2_SHELL_CODEC_FRAME_LENGTH
    if niter * SHELL_CODEC_FRAME_LENGTH < frame_length:
        niter += 1
        pulses += [0] * SHELL_CODEC_FRAME_LENGTH
    abs_pulses = [abs(int(p)) for p in
                  pulses[:niter * SHELL_CODEC_FRAME_LENGTH]]
    sum_pulses = [0] * niter
    n_rshifts = [0] * niter
    for i in range(niter):
        seg = abs_pulses[i * 16:(i + 1) * 16]
        while True:
            scale_down = 0
            c1 = [seg[2 * k] + seg[2 * k + 1] for k in range(8)]
            scale_down += any(v > T.max_pulses_table[0] for v in c1)
            c2 = [c1[2 * k] + c1[2 * k + 1] for k in range(4)]
            scale_down += any(v > T.max_pulses_table[1] for v in c2)
            c3 = [c2[2 * k] + c2[2 * k + 1] for k in range(2)]
            scale_down += any(v > T.max_pulses_table[2] for v in c3)
            tot = c3[0] + c3[1]
            scale_down += tot > T.max_pulses_table[3]
            if scale_down:
                n_rshifts[i] += 1
                seg = [v >> 1 for v in seg]
            else:
                sum_pulses[i] = tot
                break
        abs_pulses[i * 16:(i + 1) * 16] = seg

    # rate level selection (encode_pulses.c:102-120)
    min_bits = 1 << 30
    rate_level = 0
    for k in range(N_RATE_LEVELS - 1):
        bits = int(T.rate_levels_BITS_Q5[signal_type >> 1][k])
        tab = T.pulses_per_block_BITS_Q5[k]
        for i in range(niter):
            if n_rshifts[i] > 0:
                bits += int(tab[SILK_MAX_PULSES + 1])
            else:
                bits += int(tab[sum_pulses[i]])
        if bits < min_bits:
            min_bits = bits
            rate_level = k
    enc.enc_icdf(rate_level, T.rate_levels_iCDF[signal_type >> 1], 8)

    cdf = T.pulses_per_block_iCDF[rate_level]
    last = T.pulses_per_block_iCDF[N_RATE_LEVELS - 1]
    for i in range(niter):
        if n_rshifts[i] == 0:
            enc.enc_icdf(sum_pulses[i], cdf, 8)
        else:
            enc.enc_icdf(SILK_MAX_PULSES + 1, cdf, 8)
            for _ in range(n_rshifts[i] - 1):
                enc.enc_icdf(SILK_MAX_PULSES + 1, last, 8)
            enc.enc_icdf(sum_pulses[i], last, 8)

    for i in range(niter):
        if sum_pulses[i] > 0:
            shell_encoder(enc, abs_pulses[i * 16:(i + 1) * 16])

    for i in range(niter):
        if n_rshifts[i] > 0:
            nls = n_rshifts[i] - 1
            for k in range(SHELL_CODEC_FRAME_LENGTH):
                abs_q = abs(int(pulses[i * 16 + k]))
                for j in range(nls, 0, -1):
                    enc.enc_icdf((abs_q >> j) & 1, T.lsb_iCDF, 8)
                enc.enc_icdf(abs_q & 1, T.lsb_iCDF, 8)

    encode_signs(enc, pulses, frame_length, signal_type,
                 quant_offset_type, sum_pulses)


# ----------------------------------------------------------------------
# Gains

def gains_quant(gains_q16: List[int], prev_ind: int,
                conditional: bool, nb_subfr: int):
    """silk_gains_quant (gain_quant.c:33-79).  Returns
    (indices, quantized_gains_q16, new_prev_ind)."""
    ind = [0] * nb_subfr
    out = [0] * nb_subfr
    for k in range(nb_subfr):
        v = SMULWB(SCALE_Q16, lin2log(gains_q16[k]) - GAIN_OFFSET)
        if v < prev_ind:
            v += 1
        v = LIMIT(v, 0, N_LEVELS_QGAIN - 1)
        if k == 0 and not conditional:
            v = LIMIT(v, prev_ind + MIN_DELTA_GAIN_QUANT,
                      N_LEVELS_QGAIN - 1)
            prev_ind = v
        else:
            v = v - prev_ind
            double_step = 2 * MAX_DELTA_GAIN_QUANT - N_LEVELS_QGAIN \
                + prev_ind
            if v > double_step:
                v = double_step + ((v - double_step + 1) >> 1)
            v = LIMIT(v, MIN_DELTA_GAIN_QUANT, MAX_DELTA_GAIN_QUANT)
            if v > double_step:
                prev_ind += (v << 1) - double_step
                prev_ind = min(prev_ind, N_LEVELS_QGAIN - 1)
            else:
                prev_ind += v
            v -= MIN_DELTA_GAIN_QUANT
        ind[k] = v
        out[k] = log2lin(min(SMULWB(INV_SCALE_Q16, prev_ind)
                             + GAIN_OFFSET, 3967))
    return ind, out, prev_ind


def gains_id(ind: Sequence[int], nb_subfr: int) -> int:
    """silk_gains_ID (gain_quant.c:109-121)."""
    gid = 0
    for k in range(nb_subfr):
        gid = (gid << 8) + int(ind[k])
    return gid


# ----------------------------------------------------------------------
# Stereo

def stereo_encode_pred(enc: RangeEncoder, ix):
    """silk_stereo_encode_pred (stereo_encode_pred.c:33-50)."""
    n = 5 * ix[0][2] + ix[1][2]
    enc.enc_icdf(n, T.stereo_pred_joint_iCDF, 8)
    for ch in range(2):
        enc.enc_icdf(ix[ch][0], T.uniform3_iCDF, 8)
        enc.enc_icdf(ix[ch][1], T.uniform5_iCDF, 8)


def stereo_encode_mid_only(enc: RangeEncoder, mid_only_flag: int):
    enc.enc_icdf(mid_only_flag, T.stereo_only_code_mid_iCDF, 8)
