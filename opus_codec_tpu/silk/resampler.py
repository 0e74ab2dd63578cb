"""SILK fixed-topology resampler (exact fixed point).

Behavioural parity: /root/reference/opus/silk/resampler.c,
resampler_private_up2_HQ.c, resampler_private_IIR_FIR.c,
resampler_private_down_FIR.c, resampler_private_AR2.c, resampler_rom.h.
Supports the decoder-side conversions {8,12,16} kHz -> {8,12,16,24,48} kHz
and the encoder-side ones (init with for_enc=True).
"""

from __future__ import annotations

from typing import List

import numpy as np

from . import tables as T
from .sigproc import (DIV32, RSHIFT_ROUND, SMLAWB, SMULBB, SMULWB, SMULWW,
                      i32, sat16)

__all__ = ["Resampler"]

RESAMPLER_ORDER_FIR_12 = 8
RESAMPLER_MAX_BATCH_SIZE_MS = 10
FIR0, FIR1, FIR2 = 18, 24, 36

_FN_COPY, _FN_UP2HQ, _FN_IIRFIR, _FN_DOWNFIR = 0, 1, 2, 3

_DELAY_ENC = ((6, 0, 3), (0, 7, 3), (0, 1, 10), (0, 2, 6), (18, 10, 12))
_DELAY_DEC = ((4, 0, 2, 0, 0), (0, 9, 4, 7, 4), (0, 3, 12, 7, 7))


def _rate_id(r):
    return (((r >> 12) - (1 if r > 16000 else 0)) >> (1 if r > 24000 else 0)) - 1


class Resampler:
    """silk_resampler_state_struct + init (resampler.c:78-170)."""

    def __init__(self, fs_hz_in: int, fs_hz_out: int, for_enc: bool = False):
        if for_enc:
            assert fs_hz_in in (8000, 12000, 16000, 24000, 48000)
            assert fs_hz_out in (8000, 12000, 16000)
            self.input_delay = _DELAY_ENC[_rate_id(fs_hz_in)][_rate_id(fs_hz_out)]
        else:
            assert fs_hz_in in (8000, 12000, 16000)
            assert fs_hz_out in (8000, 12000, 16000, 24000, 48000)
            self.input_delay = _DELAY_DEC[_rate_id(fs_hz_in)][_rate_id(fs_hz_out)]
        self.fs_in_khz = fs_hz_in // 1000
        self.fs_out_khz = fs_hz_out // 1000
        self.batch_size = self.fs_in_khz * RESAMPLER_MAX_BATCH_SIZE_MS
        self.delay_buf = [0] * 48  # opus_int16[48]
        self.sIIR = [0] * 6
        self.sFIR32 = [0] * 36
        self.sFIR16 = [0] * RESAMPLER_ORDER_FIR_12
        self.fir_fracs = 1
        self.fir_order = 0
        self.coefs = None
        up2x = 0
        if fs_hz_out > fs_hz_in:
            if fs_hz_out == 2 * fs_hz_in:
                self.fn = _FN_UP2HQ
            else:
                self.fn = _FN_IIRFIR
                up2x = 1
        elif fs_hz_out < fs_hz_in:
            self.fn = _FN_DOWNFIR
            if fs_hz_out * 4 == fs_hz_in * 3:
                self.fir_fracs, self.fir_order = 3, FIR0
                self.coefs = T.Resampler_3_4_COEFS
            elif fs_hz_out * 3 == fs_hz_in * 2:
                self.fir_fracs, self.fir_order = 2, FIR0
                self.coefs = T.Resampler_2_3_COEFS
            elif fs_hz_out * 2 == fs_hz_in:
                self.fir_fracs, self.fir_order = 1, FIR1
                self.coefs = T.Resampler_1_2_COEFS
            elif fs_hz_out * 3 == fs_hz_in:
                self.fir_fracs, self.fir_order = 1, FIR2
                self.coefs = T.Resampler_1_3_COEFS
            elif fs_hz_out * 4 == fs_hz_in:
                self.fir_fracs, self.fir_order = 1, FIR2
                self.coefs = T.Resampler_1_4_COEFS
            elif fs_hz_out * 6 == fs_hz_in:
                self.fir_fracs, self.fir_order = 1, FIR2
                self.coefs = T.Resampler_1_6_COEFS
            else:
                raise ValueError("unsupported ratio")
        else:
            self.fn = _FN_COPY
        self.inv_ratio_q16 = i32(DIV32(fs_hz_in << (14 + up2x), fs_hz_out) << 2)
        while SMULWW(self.inv_ratio_q16, fs_hz_out) < i32(fs_hz_in << up2x):
            self.inv_ratio_q16 += 1

    # -- kernels ----------------------------------------------------------

    def _up2_hq(self, inp: List[int]) -> List[int]:
        """resampler_private_up2_HQ.c:40-103."""
        S = self.sIIR
        c0 = T.resampler_up2_hq_0
        c1 = T.resampler_up2_hq_1
        out = [0] * (2 * len(inp))
        for k, x in enumerate(inp):
            in32 = i32(x << 10)
            Y = i32(in32 - S[0])
            X = SMULWB(Y, int(c0[0]))
            o1 = i32(S[0] + X)
            S[0] = i32(in32 + X)
            Y = i32(o1 - S[1])
            X = SMULWB(Y, int(c0[1]))
            o2 = i32(S[1] + X)
            S[1] = i32(o1 + X)
            Y = i32(o2 - S[2])
            X = SMLAWB(Y, Y, int(c0[2]))
            o1 = i32(S[2] + X)
            S[2] = i32(o2 + X)
            out[2 * k] = sat16(RSHIFT_ROUND(o1, 10))
            Y = i32(in32 - S[3])
            X = SMULWB(Y, int(c1[0]))
            o1 = i32(S[3] + X)
            S[3] = i32(in32 + X)
            Y = i32(o1 - S[4])
            X = SMULWB(Y, int(c1[1]))
            o2 = i32(S[4] + X)
            S[4] = i32(o1 + X)
            Y = i32(o2 - S[5])
            X = SMLAWB(Y, Y, int(c1[2]))
            o1 = i32(S[5] + X)
            S[5] = i32(o2 + X)
            out[2 * k + 1] = sat16(RSHIFT_ROUND(o1, 10))
        return out

    def _iir_fir(self, inp: List[int]) -> List[int]:
        """resampler_private_IIR_FIR.c:64-107."""
        out = []
        frac = T.resampler_frac_FIR_12
        pos = 0
        in_len = len(inp)
        state = list(self.sFIR16)
        while True:
            n_in = min(in_len - pos, self.batch_size)
            buf = state + self._up2_hq(inp[pos:pos + n_in])
            max_index_q16 = n_in << 17
            index_q16 = 0
            while index_q16 < max_index_q16:
                table_index = SMULWB(index_q16 & 0xFFFF, 12)
                b = index_q16 >> 16
                r = SMULBB(buf[b], int(frac[table_index][0]))
                r = i32(r + SMULBB(buf[b + 1], int(frac[table_index][1])))
                r = i32(r + SMULBB(buf[b + 2], int(frac[table_index][2])))
                r = i32(r + SMULBB(buf[b + 3], int(frac[table_index][3])))
                r = i32(r + SMULBB(buf[b + 4], int(frac[11 - table_index][3])))
                r = i32(r + SMULBB(buf[b + 5], int(frac[11 - table_index][2])))
                r = i32(r + SMULBB(buf[b + 6], int(frac[11 - table_index][1])))
                r = i32(r + SMULBB(buf[b + 7], int(frac[11 - table_index][0])))
                out.append(sat16(RSHIFT_ROUND(r, 15)))
                index_q16 += self.inv_ratio_q16
            state = buf[n_in << 1:(n_in << 1) + RESAMPLER_ORDER_FIR_12]
            pos += n_in
            if pos >= in_len:
                break
        self.sFIR16 = state
        return out

    def _ar2(self, inp: List[int], a_q14) -> List[int]:
        """resampler_private_AR2.c:36-56. Returns out_Q8; updates sIIR[0:2]."""
        S = self.sIIR
        out = [0] * len(inp)
        for k, x in enumerate(inp):
            out32 = i32(S[0] + (x << 8))
            out[k] = out32
            out32 = i32(out32 << 2)
            S[0] = SMLAWB(S[1], out32, int(a_q14[0]))
            S[1] = SMULWB(out32, int(a_q14[1]))
        return out

    def _down_fir(self, inp: List[int]) -> List[int]:
        """resampler_private_down_FIR.c."""
        out = []
        coefs = self.coefs
        fir_coefs = coefs[2:]
        pos = 0
        in_len = len(inp)
        while True:
            n_in = min(in_len - pos, self.batch_size)
            buf = list(self.sFIR32[:self.fir_order]) \
                + self._ar2(inp[pos:pos + n_in], coefs[:2])
            max_index_q16 = n_in << 16
            index_q16 = 0
            if self.fir_order == FIR0:
                half = FIR0 // 2
                while index_q16 < max_index_q16:
                    b = index_q16 >> 16
                    interpol_ind = SMULWB(index_q16 & 0xFFFF, self.fir_fracs)
                    p1 = half * interpol_ind
                    p2 = half * (self.fir_fracs - 1 - interpol_ind)
                    r = SMULWB(buf[b], int(fir_coefs[p1]))
                    for j in range(1, 9):
                        r = SMLAWB(r, buf[b + j], int(fir_coefs[p1 + j]))
                    for j in range(9):
                        r = SMLAWB(r, buf[b + 17 - j], int(fir_coefs[p2 + j]))
                    out.append(sat16(RSHIFT_ROUND(r, 6)))
                    index_q16 += self.inv_ratio_q16
            elif self.fir_order == FIR1:
                while index_q16 < max_index_q16:
                    b = index_q16 >> 16
                    r = SMULWB(i32(buf[b] + buf[b + 23]), int(fir_coefs[0]))
                    for j in range(1, 12):
                        r = SMLAWB(r, i32(buf[b + j] + buf[b + 23 - j]),
                                   int(fir_coefs[j]))
                    out.append(sat16(RSHIFT_ROUND(r, 6)))
                    index_q16 += self.inv_ratio_q16
            else:  # FIR2
                while index_q16 < max_index_q16:
                    b = index_q16 >> 16
                    r = SMULWB(i32(buf[b] + buf[b + 35]), int(fir_coefs[0]))
                    for j in range(1, 18):
                        r = SMLAWB(r, i32(buf[b + j] + buf[b + 35 - j]),
                                   int(fir_coefs[j]))
                    out.append(sat16(RSHIFT_ROUND(r, 6)))
                    index_q16 += self.inv_ratio_q16
            self.sFIR32[:self.fir_order] = buf[n_in:n_in + self.fir_order]
            pos += n_in
            if pos >= in_len:
                break
        return out

    # -- public entry (silk_resampler, resampler.c:172-215) ---------------

    def process(self, inp) -> np.ndarray:
        inp = [int(x) for x in inp]
        in_len = len(inp)
        assert in_len >= self.fs_in_khz
        assert self.input_delay <= self.fs_in_khz
        n_samples = self.fs_in_khz - self.input_delay
        self.delay_buf[self.input_delay:self.input_delay + n_samples] = \
            inp[:n_samples]
        first = self.delay_buf[:self.fs_in_khz]
        rest = inp[n_samples:n_samples + in_len - self.fs_in_khz]
        # process first 1ms from delay buffer, remainder directly
        if self.fn == _FN_UP2HQ:
            out = self._up2_hq(first) + self._up2_hq(rest)
        elif self.fn == _FN_IIRFIR:
            out = self._iir_fir(first) + self._iir_fir(rest)
        elif self.fn == _FN_DOWNFIR:
            out = self._down_fir(first) + self._down_fir(rest)
        else:
            out = first + rest
        self.delay_buf[:self.input_delay] = inp[in_len - self.input_delay:]
        return np.array(out, dtype=np.int64)
