"""Opus encoder input high-pass front-end.

The reference encoder removes low-frequency content before coding:

* VOIP: a 2nd-order high-pass whose cutoff (60-100 Hz) adapts to the
  SILK pitch-lag statistics (``hp_cutoff``, opus_encoder.c:371-407).
* AUDIO / LOWDELAY: a fixed 3 Hz one-pole DC rejector (``dc_reject``,
  opus_encoder.c:430-470, float build).

Coefficients are computed with the reference's exact Q28 integer math
so the filter response matches bit-for-bit at the coefficient level;
the filtering itself runs in float (matching the reference float
build, where opus_val16 is float).
"""

from __future__ import annotations

import numpy as np

from ..silk.sigproc import SMULWW


def _fix_const(c: float, q: int) -> int:
    return int(c * (1 << q) + 0.5)


def hp_coeffs_q28(cutoff_hz: int, fs: int) -> tuple:
    """B_Q28[3], A_Q28[2] for the variable HP (opus_encoder.c:376-392)."""
    fc_q19 = (_fix_const(1.5 * 3.14159 / 1000, 19) * cutoff_hz) \
        // (fs // 1000)
    r_q28 = _fix_const(1.0, 28) - _fix_const(0.92, 9) * fc_q19
    b_q28 = (r_q28, -(r_q28 << 1), r_q28)
    r_q22 = r_q28 >> 6
    a_q28 = (SMULWW(r_q22, SMULWW(fc_q19, fc_q19) - _fix_const(2.0, 22)),
             SMULWW(r_q22, r_q22))
    return b_q28, a_q28


def hp_cutoff(x: np.ndarray, cutoff_hz: int, hp_mem: np.ndarray,
              fs: int) -> np.ndarray:
    """Variable high-pass on [C, N] float frames.

    Direct-form-II-transposed biquad per channel, state in
    ``hp_mem[2c:2c+2]`` (silk_biquad_float, opus_encoder.c:332-369).
    """
    b_q28, a_q28 = hp_coeffs_q28(cutoff_hz, fs)
    b = np.array(b_q28, np.float64) / (1 << 28)
    a = np.array(a_q28, np.float64) / (1 << 28)
    out = np.empty_like(x)
    for c in range(x.shape[0]):
        s0, s1 = hp_mem[2 * c], hp_mem[2 * c + 1]
        xc = x[c]
        yc = out[c]
        for k in range(x.shape[1]):
            v = xc[k]
            y = s0 + b[0] * v
            s0 = s1 - y * a[0] + b[1] * v
            s1 = -y * a[1] + b[2] * v
            yc[k] = y
        hp_mem[2 * c], hp_mem[2 * c + 1] = s0, s1
    return out


def dc_reject(x: np.ndarray, cutoff_hz: int, hp_mem: np.ndarray,
              fs: int) -> np.ndarray:
    """3 Hz-ish DC rejection one-pole HP on [C, N] float frames
    (opus_encoder.c:430-470, float build; state in hp_mem[2c])."""
    coef = 6.3 * cutoff_hz / fs
    coef2 = 1.0 - coef
    out = np.empty_like(x)
    for c in range(x.shape[0]):
        m = hp_mem[2 * c]
        xc = x[c]
        yc = out[c]
        for k in range(x.shape[1]):
            v = xc[k]
            yc[k] = v - m
            m = coef * v + coef2 * m
        hp_mem[2 * c] = m
    return out
