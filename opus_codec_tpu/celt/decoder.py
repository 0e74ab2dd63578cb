"""CELT decoder: full frame decode pipeline.

Behavioural parity: /root/reference/opus/celt/celt_decoder.c
(celt_decode_with_ec_dred :970, celt_synthesis :382, tf_decode :460,
deemphasis :279) and celt.c (comb_filter :198, resampling_factor :62,
init_caps :272).

Host scalar reference implementation: the symbol parse is inherently serial
per stream (range coder), the synthesis math is expressed in numpy and is
lifted 1:1 by the batched jnp pipeline in
``opus_codec_tpu.celt.batch`` (same functions, [B, ...] leading axis).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..bitstream.range_coder import RangeDecoder
from ..errors import OpusError
from . import bands as B_
from . import energy as E_
from .mdct import imdct_frame
from .modes import (BITRES, CeltMode, SPREAD_NORMAL, SPREAD_ICDF,
                    TAPSET_ICDF, TF_SELECT_TABLE, TRIM_ICDF, standard_mode)
from .rate import compute_allocation

__all__ = ["CeltDecoder", "resampling_factor", "comb_filter", "tf_decode"]

DECODE_BUFFER_SIZE = 2048
COMBFILTER_MINPERIOD = 15
COMBFILTER_MAXPERIOD = 1024
PLC_PITCH_LAG_MAX = 720
PLC_PITCH_LAG_MIN = 100
VERY_SMALL = 1e-30
CELT_SIG_SCALE = 32768.0

# comb_filter tap gains (celt.c:198-202)
_COMB_GAINS = ((0.3066406250, 0.2170410156, 0.1296386719),
               (0.4638671875, 0.2680664062, 0.0),
               (0.7998046875, 0.1000976562, 0.0))


def resampling_factor(rate: int) -> int:
    """celt.c:62-90."""
    return {48000: 1, 24000: 2, 16000: 3, 12000: 4, 8000: 6}.get(rate, 0)


def comb_filter(y: np.ndarray, yoff: int, x: np.ndarray, xoff: int,
                T0: int, T1: int, N: int, g0: float, g1: float,
                tapset0: int, tapset1: int, window: Optional[np.ndarray],
                overlap: int) -> None:
    """celt.c:198-260 (float). x[xoff-T-2 ...] must be valid history."""
    if g0 == 0 and g1 == 0:
        if not (y is x and yoff == xoff):
            y[yoff:yoff + N] = x[xoff:xoff + N]
        return
    T0 = max(T0, COMBFILTER_MINPERIOD)
    T1 = max(T1, COMBFILTER_MINPERIOD)
    g00 = g0 * _COMB_GAINS[tapset0][0]
    g01 = g0 * _COMB_GAINS[tapset0][1]
    g02 = g0 * _COMB_GAINS[tapset0][2]
    g10 = g1 * _COMB_GAINS[tapset1][0]
    g11 = g1 * _COMB_GAINS[tapset1][1]
    g12 = g1 * _COMB_GAINS[tapset1][2]
    if g0 == g1 and T0 == T1 and tapset0 == tapset1:
        overlap = 0
    for i in range(overlap):
        f = window[i] * window[i]
        y[yoff + i] = (x[xoff + i]
                       + (1 - f) * g00 * x[xoff + i - T0]
                       + (1 - f) * g01 * (x[xoff + i - T0 + 1]
                                          + x[xoff + i - T0 - 1])
                       + (1 - f) * g02 * (x[xoff + i - T0 + 2]
                                          + x[xoff + i - T0 - 2])
                       + f * g10 * x[xoff + i - T1]
                       + f * g11 * (x[xoff + i - T1 + 1]
                                    + x[xoff + i - T1 - 1])
                       + f * g12 * (x[xoff + i - T1 + 2]
                                    + x[xoff + i - T1 - 2]))
    i = overlap
    if g1 == 0:
        if not (y is x and yoff == xoff):
            y[yoff + overlap:yoff + N] = x[xoff + overlap:xoff + N]
        return
    # Constant-filter tail (comb_filter_const_c). NOTE: the reference runs
    # this in place on the synthesis buffer, so for T1 < N the taps read
    # samples *already produced by this filter* — it is recursive. The
    # sequential form is the ground truth; the batched TPU path reproduces
    # it as a chunked scan with period-T dependency.
    for j in range(i, N):
        y[yoff + j] = (x[xoff + j]
                       + g10 * x[xoff + j - T1]
                       + g11 * (x[xoff + j - T1 + 1] + x[xoff + j - T1 - 1])
                       + g12 * (x[xoff + j - T1 + 2] + x[xoff + j - T1 - 2]))


def tf_decode(start: int, end: int, isTransient: bool, tf_res: List[int],
              LM: int, dec: RangeDecoder) -> None:
    """celt_decoder.c:460-497."""
    budget = dec.storage * 8
    tell = dec.tell()
    logp = 2 if isTransient else 4
    tf_select_rsv = 1 if (LM > 0 and tell + logp + 1 <= budget) else 0
    budget -= tf_select_rsv
    tf_changed = curr = 0
    for i in range(start, end):
        if tell + logp <= budget:
            curr ^= dec.dec_bit_logp(logp)
            tell = dec.tell()
            tf_changed |= curr
        tf_res[i] = curr
        logp = 4 if isTransient else 5
    tf_select = 0
    ist = 1 if isTransient else 0
    if tf_select_rsv and \
            TF_SELECT_TABLE[LM][4 * ist + 0 + tf_changed] != \
            TF_SELECT_TABLE[LM][4 * ist + 2 + tf_changed]:
        tf_select = dec.dec_bit_logp(1)
    for i in range(start, end):
        tf_res[i] = TF_SELECT_TABLE[LM][4 * ist + 2 * tf_select + tf_res[i]]


class CeltDecoder:
    """State + decode loop (celt_decoder.c state struct + :970)."""

    def __init__(self, sampling_rate: int = 48000, channels: int = 2,
                 mode: Optional[CeltMode] = None):
        if channels not in (1, 2):
            raise OpusError.bad_arg("channels must be 1 or 2")
        self.mode = mode or standard_mode()
        self.channels = channels           # CC: output channels
        self.stream_channels = channels    # C: coded channels
        if mode is not None and mode.fs == sampling_rate:
            self.downsample = 1            # custom mode at native rate
        else:
            self.downsample = resampling_factor(sampling_rate)
        if self.downsample == 0:
            raise OpusError.bad_arg("unsupported rate")
        self.start = 0
        self.end = self.mode.eff_ebands
        self.disable_inv = channels == 1
        self.complexity = 0
        self.reset()

    def reset(self):
        m = self.mode
        nb = m.nb_ebands
        self.rng = 0
        self.error = 0
        self.loss_duration = 0
        self.skip_plc = True
        self.postfilter_period = 0
        self.postfilter_period_old = 0
        self.postfilter_gain = 0.0
        self.postfilter_gain_old = 0.0
        self.postfilter_tapset = 0
        self.postfilter_tapset_old = 0
        self.prefilter_and_fold = False
        self.preemph_memD = np.zeros(2)
        # decode history (time domain, pre-deemphasis), per channel
        self.decode_mem = np.zeros((2, DECODE_BUFFER_SIZE))
        # raw IMDCT tail carried between frames (ov/2 per channel)
        self.syn_tail = np.zeros((2, m.overlap // 2))
        self.oldBandE = np.zeros((2, nb))
        self.oldLogE = np.full((2, nb), -28.0)
        self.oldLogE2 = np.full((2, nb), -28.0)
        self.backgroundLogE = np.full((2, nb), -28.0)
        self.last_pitch_index = 0
        self.plc_lpc = np.zeros((2, 24))

    # -- main entry (celt_decode_with_ec) ---------------------------------

    def decode_with_ec(self, data: Optional[bytes], frame_size: int,
                       dec: Optional[RangeDecoder] = None,
                       pcm_out: Optional[np.ndarray] = None) -> np.ndarray:
        m = self.mode
        nb = m.nb_ebands
        CC = self.channels
        C = self.stream_channels
        start, end = self.start, self.end
        frame_size *= self.downsample

        for LM in range(m.max_lm + 1):
            if (m.short_mdct_size << LM) == frame_size:
                break
        else:
            raise OpusError.bad_arg("bad frame size")
        M = 1 << LM
        N = M * m.short_mdct_size

        if data is None or len(data) <= 1:
            self._decode_lost(N, LM)
            return self._deemphasis_out(N)

        if dec is None:
            dec = RangeDecoder(data)
        length = len(data)
        if length > 1275:
            raise OpusError.bad_arg("frame too large")

        eff_end = min(end, m.eff_ebands)
        if self.loss_duration == 0:
            self.skip_plc = False

        if C == 1:
            self.oldBandE[0] = np.maximum(self.oldBandE[0], self.oldBandE[1])

        total_bits = length * 8
        tell = dec.tell()
        if tell >= total_bits:
            silence = True
        elif tell == 1:
            silence = bool(dec.dec_bit_logp(15))
        else:
            silence = False
        if silence:
            tell = length * 8
            dec.nbits_total += tell - dec.tell()

        postfilter_gain = 0.0
        postfilter_pitch = 0
        postfilter_tapset = 0
        if start == 0 and tell + 16 <= total_bits:
            if dec.dec_bit_logp(1):
                octave = dec.dec_uint(6)
                postfilter_pitch = (16 << octave) + dec.dec_bits(4 + octave) - 1
                qg = dec.dec_bits(3)
                if dec.tell() + 2 <= total_bits:
                    postfilter_tapset = dec.dec_icdf(TAPSET_ICDF, 2)
                postfilter_gain = 0.09375 * (qg + 1)
            tell = dec.tell()

        if LM > 0 and tell + 3 <= total_bits:
            isTransient = bool(dec.dec_bit_logp(3))
            tell = dec.tell()
        else:
            isTransient = False
        shortBlocks = M if isTransient else 0

        intra_ener = dec.dec_bit_logp(3) if tell + 3 <= total_bits else 0

        # PLC energy safety ramp (celt_decoder.c:1171-1198)
        if not intra_ener and self.loss_duration != 0:
            for c in range(2):
                safety = 0.0
                missing = min(10, self.loss_duration >> LM)
                if LM == 0:
                    safety = 1.5
                elif LM == 1:
                    safety = 0.5
                for i in range(start, end):
                    E0 = self.oldBandE[c, i]
                    E1 = self.oldLogE[c, i]
                    E2 = self.oldLogE2[c, i]
                    if E0 < max(E1, E2):
                        slope = max(E1 - E0, 0.5 * (E2 - E0))
                        E0 -= max(0.0, (1 + missing) * slope)
                        self.oldBandE[c, i] = max(-20.0, E0)
                    else:
                        self.oldBandE[c, i] = min(E0, E1, E2)
                    self.oldBandE[c, i] -= safety

        E_.unquant_coarse_energy(m, start, end, self.oldBandE, intra_ener,
                                 dec, C, LM)

        tf_res = [0] * nb
        tf_decode(start, end, isTransient, tf_res, LM, dec)

        tell = dec.tell()
        spread_decision = SPREAD_NORMAL
        if tell + 4 <= total_bits:
            spread_decision = dec.dec_icdf(SPREAD_ICDF, 5)

        cap = m.init_caps(LM, C)

        # dynalloc (celt_decoder.c:1215-1246)
        offsets = [0] * nb
        dynalloc_logp = 6
        total_bits_frac = total_bits << BITRES
        tell_frac = dec.tell_frac()
        for i in range(start, end):
            width = C * int(m.e_bands[i + 1] - m.e_bands[i]) << LM
            quanta = min(width << BITRES, max(6 << BITRES, width))
            dynalloc_loop_logp = dynalloc_logp
            boost = 0
            while tell_frac + (dynalloc_loop_logp << BITRES) < \
                    total_bits_frac and boost < cap[i]:
                flag = dec.dec_bit_logp(dynalloc_loop_logp)
                tell_frac = dec.tell_frac()
                if not flag:
                    break
                boost += quanta
                total_bits_frac -= quanta
                dynalloc_loop_logp = 1
            offsets[i] = boost
            if boost > 0:
                dynalloc_logp = max(2, dynalloc_logp - 1)

        alloc_trim = 5
        if tell_frac + (6 << BITRES) <= total_bits_frac:
            alloc_trim = dec.dec_icdf(TRIM_ICDF, 7)

        bits = ((length * 8) << BITRES) - dec.tell_frac() - 1
        anti_collapse_rsv = (1 << BITRES) if (isTransient and LM >= 2 and
                                              bits >= ((LM + 2) << BITRES)) \
            else 0
        bits -= anti_collapse_rsv

        alloc = compute_allocation(m, start, end, offsets, cap, alloc_trim,
                                   0, 0, bits, C, LM, dec, False)
        codedBands = alloc.coded_bands
        pulses = alloc.pulses
        fine_quant = alloc.ebits
        fine_priority = alloc.fine_priority

        E_.unquant_fine_energy(m, start, end, self.oldBandE, fine_quant,
                               dec, C)

        # shift history left by N (celt_decoder.c:1265-1267)
        self.decode_mem[:, :-N] = self.decode_mem[:, N:]

        collapse_masks = [0] * (C * nb)
        X = [0.0] * N
        Y = [0.0] * N if C == 2 else None
        self.rng = B_.quant_all_bands(
            False, m, start, end, X, Y, collapse_masks, None, pulses,
            shortBlocks, spread_decision, alloc.dual_stereo, alloc.intensity,
            tf_res, length * (8 << BITRES) - anti_collapse_rsv,
            alloc.balance, dec, LM, codedBands, self.rng,
            disable_inv=self.disable_inv)

        anti_collapse_on = False
        if anti_collapse_rsv > 0:
            anti_collapse_on = bool(dec.dec_bits(1))

        E_.unquant_energy_finalise(m, start, end, self.oldBandE, fine_quant,
                                   fine_priority,
                                   length * 8 - dec.tell(), dec, C)

        if anti_collapse_on:
            Xc = [X] + ([Y] if Y is not None else [])
            self.rng = B_.anti_collapse(
                m, Xc, collapse_masks, LM, C, N, start, end,
                self.oldBandE.ravel(), self.oldLogE.ravel(),
                self.oldLogE2.ravel(), pulses, self.rng)

        if silence:
            self.oldBandE[:, :] = -28.0

        self._synthesis(X, Y, start, eff_end, C, CC, isTransient, LM,
                        silence)

        # postfilter (celt_decoder.c:1302-1325)
        for c in range(CC):
            self.postfilter_period = max(self.postfilter_period,
                                         COMBFILTER_MINPERIOD)
            self.postfilter_period_old = max(self.postfilter_period_old,
                                             COMBFILTER_MINPERIOD)
            buf = self.decode_mem[c]
            off = DECODE_BUFFER_SIZE - N
            comb_filter(buf, off, buf, off, self.postfilter_period_old,
                        self.postfilter_period, m.short_mdct_size,
                        self.postfilter_gain_old, self.postfilter_gain,
                        self.postfilter_tapset_old, self.postfilter_tapset,
                        m.window, m.overlap)
            if LM != 0:
                comb_filter(buf, off + m.short_mdct_size, buf,
                            off + m.short_mdct_size,
                            self.postfilter_period, postfilter_pitch,
                            N - m.short_mdct_size,
                            self.postfilter_gain, postfilter_gain,
                            self.postfilter_tapset, postfilter_tapset,
                            m.window, m.overlap)
        self.postfilter_period_old = self.postfilter_period
        self.postfilter_gain_old = self.postfilter_gain
        self.postfilter_tapset_old = self.postfilter_tapset
        self.postfilter_period = postfilter_pitch
        self.postfilter_gain = postfilter_gain
        self.postfilter_tapset = postfilter_tapset
        if LM != 0:
            self.postfilter_period_old = self.postfilter_period
            self.postfilter_gain_old = self.postfilter_gain
            self.postfilter_tapset_old = self.postfilter_tapset

        if C == 1:
            self.oldBandE[1] = self.oldBandE[0]

        if not isTransient:
            self.oldLogE2[:] = self.oldLogE
            self.oldLogE[:] = self.oldBandE
        else:
            self.oldLogE[:] = np.minimum(self.oldLogE, self.oldBandE)
        max_bg_inc = min(160, self.loss_duration + M) * 0.001
        self.backgroundLogE = np.minimum(self.backgroundLogE + max_bg_inc,
                                         self.oldBandE)
        for c in range(2):
            self.oldBandE[c, :start] = 0
            self.oldLogE[c, :start] = self.oldLogE2[c, :start] = -28.0
            self.oldBandE[c, end:] = 0
            self.oldLogE[c, end:] = self.oldLogE2[c, end:] = -28.0
        self.rng = dec.rng

        out = self._deemphasis_out(N)
        self.loss_duration = 0
        self.prefilter_and_fold = False
        if dec.tell() > 8 * length:
            raise OpusError(-3, "decoder overran the frame")
        if dec.get_error():
            self.error = 1
        return out

    # -- synthesis (celt_synthesis :382) ----------------------------------

    def _synthesis(self, X, Y, start, eff_end, C, CC, isTransient, LM,
                   silence):
        m = self.mode
        N = (m.short_mdct_size << LM)
        M = 1 << LM
        B = M if isTransient else 1
        Xn = np.asarray(X)
        freqs = []
        if CC == 2 and C == 1:
            f = B_.denormalise_bands(m, Xn, self.oldBandE[0], start, eff_end,
                                     M, self.downsample, silence)
            freqs = [f, f.copy()]
        elif CC == 1 and C == 2:
            f0 = B_.denormalise_bands(m, Xn, self.oldBandE[0], start,
                                      eff_end, M, self.downsample, silence)
            f1 = B_.denormalise_bands(m, np.asarray(Y), self.oldBandE[1],
                                      start, eff_end, M, self.downsample,
                                      silence)
            freqs = [0.5 * (f0 + f1)]
        else:
            freqs = [B_.denormalise_bands(m, Xn, self.oldBandE[0], start,
                                          eff_end, M, self.downsample,
                                          silence)]
            if CC == 2:
                freqs.append(B_.denormalise_bands(
                    m, np.asarray(Y), self.oldBandE[1], start, eff_end, M,
                    self.downsample, silence))
        for c in range(CC):
            frame, tail = imdct_frame(freqs[c], m.window, B,
                                      self.syn_tail[c])
            self.syn_tail[c] = tail
            self.decode_mem[c, DECODE_BUFFER_SIZE - N:] = frame

    # -- deemphasis + downsample (deemphasis :279) ------------------------

    def _deemphasis_out(self, N: int) -> np.ndarray:
        m = self.mode
        CC = self.channels
        coef0 = m.preemph
        Nd = N // self.downsample
        pcm = np.zeros((CC, Nd))
        for c in range(CC):
            x = self.decode_mem[c, DECODE_BUFFER_SIZE - N:]
            mem = self.preemph_memD[c]
            scratch = np.empty(N)
            if m.preemph1 != 0.0:
                # 2nd-order deemphasis for custom modes <40 kHz
                # (celt_decoder.c:311-323)
                coef1, coef3 = m.preemph1, m.preemph3
                for j in range(N):
                    tmp = x[j] + mem + VERY_SMALL
                    mem = coef0 * tmp - coef1 * x[j]
                    scratch[j] = coef3 * tmp
            else:
                for j in range(N):
                    tmp = x[j] + VERY_SMALL + mem
                    mem = coef0 * tmp
                    scratch[j] = tmp
            self.preemph_memD[c] = mem
            pcm[c] = scratch[::self.downsample][:Nd] / CELT_SIG_SCALE
        return pcm

    # -- PLC (celt_decode_lost :604-967, float) ---------------------------

    def _decode_lost(self, N, LM):
        from .pitch import celt_autocorr, celt_lpc, pitch_downsample, \
            pitch_search
        m = self.mode
        C = self.channels
        overlap = m.overlap
        loss_duration = self.loss_duration
        start = self.start
        noise_based = loss_duration >= 40 or start != 0 or self.skip_plc

        if noise_based:
            # Noise-based PLC/CNG (celt_decoder.c:648-699)
            end = self.end
            eff_end = max(start, min(end, m.eff_ebands))
            self.decode_mem[:, :-N] = self.decode_mem[:, N:]
            decay = 1.5 if loss_duration == 0 else 0.5
            for c in range(C):
                for i in range(start, end):
                    self.oldBandE[c, i] = max(
                        self.backgroundLogE[c, i],
                        self.oldBandE[c, i] - decay)
            seed = self.rng
            X = [[0.0] * N for _ in range(C)]
            for c in range(C):
                for i in range(start, eff_end):
                    boffs = int(m.e_bands[i]) << LM
                    blen = int(m.e_bands[i + 1] - m.e_bands[i]) << LM
                    for j in range(blen):
                        seed = B_.celt_lcg_rand(seed)
                        X[c][boffs + j] = float(
                            np.int32(np.uint32(seed)) >> 20)
                    B_.renormalise_vector(X[c], boffs, blen, 1.0)
            self.rng = seed
            self._synthesis(X[0], X[1] if C == 2 else None, start, eff_end,
                            C, C, False, LM, False)
            self.skip_plc = True
        else:
            # Pitch-based PLC (celt_decoder.c:700-962)
            CELT_LPC_ORDER = 24
            window = m.window
            fade = 1.0
            if loss_duration == 0:
                lp = pitch_downsample(
                    [self.decode_mem[c] for c in range(C)],
                    DECODE_BUFFER_SIZE)
                pitch_index = pitch_search(
                    lp[PLC_PITCH_LAG_MAX >> 1:], lp,
                    DECODE_BUFFER_SIZE - PLC_PITCH_LAG_MAX,
                    PLC_PITCH_LAG_MAX - PLC_PITCH_LAG_MIN)
                pitch_index = PLC_PITCH_LAG_MAX - pitch_index
                self.last_pitch_index = pitch_index
            else:
                pitch_index = self.last_pitch_index
                fade = 0.8
            MAX_PERIOD = 1024
            exc_length = min(2 * pitch_index, MAX_PERIOD)
            for c in range(C):
                buf = np.concatenate([self.decode_mem[c],
                                      np.zeros(overlap)])
                exc = buf[DECODE_BUFFER_SIZE - MAX_PERIOD - CELT_LPC_ORDER:
                          DECODE_BUFFER_SIZE].copy()
                # exc[k] for k>=CELT_LPC_ORDER are the MAX_PERIOD samples
                if loss_duration == 0:
                    # windowed autocorrelation (celt_lpc.c:277; window on
                    # both edges of the MAX_PERIOD segment)
                    seg = exc[CELT_LPC_ORDER:].copy()
                    seg[:overlap] *= window
                    seg[-overlap:] *= window[::-1]
                    ac = np.array([float(np.dot(seg[:MAX_PERIOD - k],
                                                seg[k:]))
                                   for k in range(CELT_LPC_ORDER + 1)])
                    ac[0] *= 1.0001
                    for i in range(1, CELT_LPC_ORDER + 1):
                        ac[i] -= ac[i] * (0.008 * 0.008) * i * i
                    self.plc_lpc[c] = celt_lpc(ac, CELT_LPC_ORDER)
                lpc_c = self.plc_lpc[c]
                # whiten the last exc_length samples (celt_fir:
                # y[i] = x[i] + sum lpc[j]*x[i-1-j])
                base = MAX_PERIOD - exc_length + CELT_LPC_ORDER
                fir_out = np.empty(exc_length)
                for i in range(exc_length):
                    s = exc[base + i]
                    for j in range(CELT_LPC_ORDER):
                        s += lpc_c[j] * exc[base + i - 1 - j]
                    fir_out[i] = s
                exc[base:base + exc_length] = fir_out

                # decay estimation (celt_decoder.c:797-814)
                decay_length = exc_length >> 1
                E1 = E2 = 1.0
                for i in range(decay_length):
                    e = exc[CELT_LPC_ORDER + MAX_PERIOD
                            - decay_length + i]
                    E1 += e * e
                    e = exc[CELT_LPC_ORDER + MAX_PERIOD
                            - 2 * decay_length + i]
                    E2 += e * e
                E1 = min(E1, E2)
                decay = math.sqrt(E1 / E2)

                # shift history left by N
                buf[:DECODE_BUFFER_SIZE - N] = buf[N:DECODE_BUFFER_SIZE]

                # periodic extrapolation of the excitation
                extrapolation_offset = MAX_PERIOD - pitch_index
                extrapolation_len = N + overlap
                attenuation = fade * decay
                S1 = 0.0
                j = 0
                for i in range(extrapolation_len):
                    if j >= pitch_index:
                        j -= pitch_index
                        attenuation = attenuation * decay
                    buf[DECODE_BUFFER_SIZE - N + i] = attenuation * exc[
                        CELT_LPC_ORDER + extrapolation_offset + j]
                    tmp = buf[DECODE_BUFFER_SIZE - MAX_PERIOD - N
                              + extrapolation_offset + j]
                    S1 += tmp * tmp
                    j += 1

                # synthesis filter (celt_iir: y[i] = x[i] - sum lpc*y[-1-j])
                mem = [buf[DECODE_BUFFER_SIZE - N - 1 - i]
                       for i in range(CELT_LPC_ORDER)]
                for i in range(extrapolation_len):
                    s = buf[DECODE_BUFFER_SIZE - N + i]
                    for jj in range(CELT_LPC_ORDER):
                        s -= lpc_c[jj] * mem[jj]
                    mem = [s] + mem[:-1]
                    buf[DECODE_BUFFER_SIZE - N + i] = s

                # energy guard (celt_decoder.c:864-901)
                S2 = float(np.dot(
                    buf[DECODE_BUFFER_SIZE - N:
                        DECODE_BUFFER_SIZE - N + extrapolation_len],
                    buf[DECODE_BUFFER_SIZE - N:
                        DECODE_BUFFER_SIZE - N + extrapolation_len]))
                if not (S1 > 0.2 * S2):
                    buf[DECODE_BUFFER_SIZE - N:
                        DECODE_BUFFER_SIZE - N + extrapolation_len] = 0.0
                elif S1 < S2:
                    ratio = math.sqrt((S1 + 1) / (S2 + 1))
                    for i in range(overlap):
                        g = 1.0 - window[i] * (1.0 - ratio)
                        buf[DECODE_BUFFER_SIZE - N + i] *= g
                    buf[DECODE_BUFFER_SIZE - N + overlap:
                        DECODE_BUFFER_SIZE - N + extrapolation_len] *= ratio

                self.decode_mem[c] = buf[:DECODE_BUFFER_SIZE]
                # Fold the extrapolated overlap tail into the raw IMDCT
                # carry (prefilter_and_fold, celt_decoder.c:515-550) so the
                # next frame's TDAC blends with the concealed audio.
                etmp = np.zeros(overlap)
                tail_region = buf[DECODE_BUFFER_SIZE:
                                  DECODE_BUFFER_SIZE + overlap].copy()
                comb_filter(etmp, 0, buf, DECODE_BUFFER_SIZE,
                            max(self.postfilter_period_old,
                                COMBFILTER_MINPERIOD),
                            max(self.postfilter_period,
                                COMBFILTER_MINPERIOD),
                            overlap, -self.postfilter_gain_old,
                            -self.postfilter_gain,
                            self.postfilter_tapset_old,
                            self.postfilter_tapset, None, 0)
                for i in range(overlap // 2):
                    self.syn_tail[c, i] = (window[i] * etmp[overlap - 1 - i]
                                           + window[overlap - i - 1]
                                           * etmp[i])
        self.loss_duration = min(10000, loss_duration + (1 << LM))
