"""Pitch estimation for the CELT prefilter and PLC.

Behavioural parity: /root/reference/opus/celt/pitch.c (pitch_downsample
:140, pitch_search :302, remove_doubling :449, find_best_pitch :45) and
celt_lpc.c (_celt_lpc Levinson-Durbin :37, autocorrelation :277). Float
build paths.

Host/numpy reference; the batched TPU analysis pipeline computes the same
cross-correlations as [B, lag] matmuls on the MXU.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

__all__ = ["pitch_downsample", "pitch_search", "remove_doubling",
           "celt_lpc", "celt_autocorr"]


def celt_autocorr(x: np.ndarray, lag: int) -> np.ndarray:
    """Plain autocorrelation for lags 0..lag (celt_lpc.c:277, float,
    window=NULL path)."""
    n = len(x)
    ac = np.empty(lag + 1)
    for k in range(lag + 1):
        ac[k] = float(np.dot(x[:n - k], x[k:]))
    return ac


def celt_lpc(ac: np.ndarray, p: int) -> np.ndarray:
    """Levinson-Durbin (celt_lpc.c:37-95, float)."""
    lpc = np.zeros(p)
    error = ac[0]
    if ac[0] > 1e-10:
        for i in range(p):
            rr = 0.0
            for j in range(i):
                rr += lpc[j] * ac[i - j]
            rr += ac[i + 1]
            r = -rr / error
            lpc[i] = r
            for j in range((i + 1) >> 1):
                tmp1 = lpc[j]
                tmp2 = lpc[i - 1 - j]
                lpc[j] = tmp1 + r * tmp2
                lpc[i - 1 - j] = tmp2 + r * tmp1
            error = error - r * r * error
            if error <= 0.001 * ac[0]:
                break
    return lpc


def _fir5(x: np.ndarray, num: np.ndarray) -> None:
    """5-tap all-zero filter in place (pitch.c:105-137)."""
    mem = [0.0] * 5
    for i in range(len(x)):
        s = x[i] + num[0] * mem[0] + num[1] * mem[1] + num[2] * mem[2] \
            + num[3] * mem[3] + num[4] * mem[4]
        mem[4] = mem[3]
        mem[3] = mem[2]
        mem[2] = mem[1]
        mem[1] = mem[0]
        mem[0] = x[i]
        x[i] = s


def pitch_downsample(x: List[np.ndarray], length: int) -> np.ndarray:
    """2x downsample + whitening LPC filter (pitch.c:140-217, float).

    x: list of per-channel signals (C=1 or 2), each >= length samples.
    Returns x_lp of length//2 samples.
    """
    C = len(x)
    half = length >> 1
    x_lp = np.zeros(half)
    for c in range(C):
        xc = x[c]
        i = np.arange(1, half)
        x_lp[1:] += 0.25 * xc[2 * i - 1] + 0.25 * xc[2 * i + 1] \
            + 0.5 * xc[2 * i]
        x_lp[0] += 0.25 * xc[1] + 0.5 * xc[0]
    ac = celt_autocorr(x_lp, 4)
    ac[0] *= 1.0001
    for i in range(1, 5):
        ac[i] -= ac[i] * (0.008 * i) * (0.008 * i)
    lpc = celt_lpc(ac, 4)
    tmp = 1.0
    for i in range(4):
        tmp = 0.9 * tmp
        lpc[i] = lpc[i] * tmp
    c1 = 0.8
    lpc2 = np.array([lpc[0] + 0.8,
                     lpc[1] + c1 * lpc[0],
                     lpc[2] + c1 * lpc[1],
                     lpc[3] + c1 * lpc[2],
                     c1 * lpc[3]])
    _fir5(x_lp, lpc2)
    return x_lp


def _find_best_pitch(xcorr: np.ndarray, y: np.ndarray, length: int,
                     max_pitch: int) -> List[int]:
    """pitch.c:45-103 (float)."""
    Syy = 1.0
    best_num = [-1.0, -1.0]
    best_den = [0.0, 0.0]
    best_pitch = [0, 1]
    Syy += float(np.dot(y[:length], y[:length]))
    for i in range(max_pitch):
        if xcorr[i] > 0:
            xcorr16 = xcorr[i] * 1e-12  # avoid overflow in square
            num = xcorr16 * xcorr16
            if num * best_den[1] > best_num[1] * Syy:
                if num * best_den[0] > best_num[0] * Syy:
                    best_num[1] = best_num[0]
                    best_den[1] = best_den[0]
                    best_pitch[1] = best_pitch[0]
                    best_num[0] = num
                    best_den[0] = Syy
                    best_pitch[0] = i
                else:
                    best_num[1] = num
                    best_den[1] = Syy
                    best_pitch[1] = i
        Syy += y[i + length] * y[i + length] - y[i] * y[i]
        Syy = max(1.0, Syy)
    return best_pitch


def pitch_search(x_lp: np.ndarray, y: np.ndarray, length: int,
                 max_pitch: int) -> int:
    """Coarse->fine pitch search (pitch.c:302-411). ``x_lp`` is the
    half-rate target (length//2 samples into y), ``y`` the half-rate
    history."""
    lag = length + max_pitch
    x_lp4 = x_lp[0:length >> 2 << 1:2].copy()
    y_lp4 = y[0:lag >> 2 << 1:2].copy()

    # Coarse search at 4x decimation
    n4 = length >> 2
    mp4 = max_pitch >> 2
    xcorr4 = np.array([float(np.dot(x_lp4[:n4], y_lp4[i:i + n4]))
                       for i in range(mp4)])
    best_pitch = _find_best_pitch(xcorr4, y_lp4, n4, mp4)

    # Finer search at 2x decimation
    n2 = length >> 1
    mp2 = max_pitch >> 1
    xcorr = np.zeros(mp2)
    for i in range(mp2):
        if abs(i - 2 * best_pitch[0]) > 2 and abs(i - 2 * best_pitch[1]) > 2:
            continue
        xcorr[i] = max(-1.0, float(np.dot(x_lp[:n2], y[i:i + n2])))
    best_pitch = _find_best_pitch(xcorr, y, n2, mp2)

    # Pseudo-interpolation
    offset = 0
    bp = best_pitch[0]
    if 0 < bp < mp2 - 1:
        a, b, c = xcorr[bp - 1], xcorr[bp], xcorr[bp + 1]
        if (c - a) > 0.7 * (b - a):
            offset = 1
        elif (a - c) > 0.7 * (b - c):
            offset = -1
    return 2 * bp - offset


def _compute_pitch_gain(xy, xx, yy):
    return xy / math.sqrt(1 + xx * yy)


_SECOND_CHECK = (0, 0, 3, 2, 3, 2, 5, 2, 3, 2, 3, 2, 5, 2, 3, 2)


def remove_doubling(x: np.ndarray, maxperiod: int, minperiod: int, N: int,
                    T0_: int, prev_period: int, prev_gain: float
                    ) -> Tuple[float, int]:
    """Check submultiples of the period (pitch.c:449-555, float).
    ``x`` is the half-rate buffer of maxperiod+N... samples with the
    current frame starting at index maxperiod//1 (caller convention:
    pass the full pitch_buf). Returns (gain, T0)."""
    minperiod0 = minperiod
    maxperiod //= 2
    minperiod //= 2
    T0 = T0_ // 2
    prev_period //= 2
    N //= 2
    off = maxperiod
    if T0 >= maxperiod:
        T0 = maxperiod - 1
    T = T0
    xx = float(np.dot(x[off:off + N], x[off:off + N]))
    xy = float(np.dot(x[off:off + N], x[off - T0:off - T0 + N]))
    yy_lookup = np.zeros(maxperiod + 1)
    yy_lookup[0] = xx
    yy = xx
    for i in range(1, maxperiod + 1):
        yy = yy + x[off - i] * x[off - i] - x[off + N - i] * x[off + N - i]
        yy_lookup[i] = max(0.0, yy)
    yy = yy_lookup[T0]
    best_xy = xy
    best_yy = yy
    g = g0 = _compute_pitch_gain(xy, xx, yy)
    for k in range(2, 16):
        T1 = (2 * T0 + k) // (2 * k)
        if T1 < minperiod:
            break
        if k == 2:
            T1b = T0 if T1 + T0 > maxperiod else T0 + T1
        else:
            T1b = (2 * _SECOND_CHECK[k] * T0 + k) // (2 * k)
        xy = float(np.dot(x[off:off + N], x[off - T1:off - T1 + N]))
        xy2 = float(np.dot(x[off:off + N], x[off - T1b:off - T1b + N]))
        xy = 0.5 * (xy + xy2)
        yy = 0.5 * (yy_lookup[T1] + yy_lookup[T1b])
        g1 = _compute_pitch_gain(xy, xx, yy)
        if abs(T1 - prev_period) <= 1:
            cont = prev_gain
        elif abs(T1 - prev_period) <= 2 and 5 * k * k < T0:
            cont = 0.5 * prev_gain
        else:
            cont = 0.0
        thresh = max(0.3, 0.7 * g0 - cont)
        if T1 < 3 * minperiod:
            thresh = max(0.4, 0.85 * g0 - cont)
        elif T1 < 2 * minperiod:
            thresh = max(0.5, 0.9 * g0 - cont)
        if g1 > thresh:
            best_xy = xy
            best_yy = yy
            T = T1
            g = g1
    best_xy = max(0.0, best_xy)
    pg = 1.0 if best_yy <= best_xy else best_xy / (best_yy + 1)
    xcorr = [float(np.dot(x[off:off + N], x[off - (T + kk - 1):
                                            off - (T + kk - 1) + N]))
             for kk in range(3)]
    if (xcorr[2] - xcorr[0]) > 0.7 * (xcorr[1] - xcorr[0]):
        offset = 1
    elif (xcorr[0] - xcorr[2]) > 0.7 * (xcorr[1] - xcorr[2]):
        offset = -1
    else:
        offset = 0
    if pg > g:
        pg = g
    T0_out = 2 * T + offset
    if T0_out < minperiod0:
        T0_out = minperiod0
    return pg, T0_out
