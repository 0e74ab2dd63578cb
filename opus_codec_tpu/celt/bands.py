"""CELT band quantization: PVQ coding, theta splits, folding, stereo.

Behavioural parity: /root/reference/opus/celt/bands.c (quant_all_bands
:1398, quant_band :1109, quant_partition :943, compute_theta :700) and
vq.c (alg_quant :330, alg_unquant :363, op_pvq_search :165,
exp_rotation :74).

This is the host-lane scalar reference implementation, shared by encoder and
decoder exactly as in the C (one code path, ``encode`` flag). The integer
decisions (qn, itheta coding, bit rebalancing, pulse counts) are exact; the
float vector math runs in float64. This module is the ground truth the
batched device paths (``celt.batch_encoder`` encode direction,
``celt.batch_decoder`` + ``celt.dec_parse`` decode direction) are
validated against.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..bitstream.range_coder import ec_ilog
from .cwrs import decode_pulses, encode_pulses
from .modes import (BITRES, CeltMode, QTHETA_OFFSET, QTHETA_OFFSET_TWOPHASE,
                    SPREAD_AGGRESSIVE, SPREAD_NONE, get_pulses)

__all__ = ["quant_all_bands", "anti_collapse", "celt_lcg_rand",
           "compute_band_energies", "normalise_bands", "denormalise_bands",
           "haar1", "bitexact_cos", "bitexact_log2tan", "stereo_itheta",
           "hysteresis_decision", "spreading_decision"]

EPSILON = 1e-15
NORM_SCALING = 1.0


def celt_lcg_rand(seed: int) -> int:
    """bands.c:61-64."""
    return (1664525 * seed + 1013904223) & 0xFFFFFFFF


def _frac_mul16(a: int, b: int) -> int:
    """FRAC_MUL16: (16384 + a*b) >> 15 with int16 wrap semantics."""
    return (16384 + a * b) >> 15


def bitexact_cos(x: int) -> int:
    """bands.c:68-78; bit-exact Q15 cos for allocation decisions."""
    tmp = (4096 + x * x) >> 13
    x2 = tmp
    x2 = (32767 - x2) + _frac_mul16(
        x2, -7651 + _frac_mul16(x2, 8277 + _frac_mul16(-626, x2)))
    return 1 + x2


def bitexact_log2tan(isin: int, icos: int) -> int:
    """bands.c:80-91."""
    lc = ec_ilog(icos)
    ls = ec_ilog(isin)
    icos <<= 15 - lc
    isin <<= 15 - ls
    return ((ls - lc) * (1 << 11)
            + _frac_mul16(isin, _frac_mul16(isin, -2597) + 7932)
            - _frac_mul16(icos, _frac_mul16(icos, -2597) + 7932))


def hysteresis_decision(val, thresholds, hysteresis, prev):
    """bands.c:46-59."""
    N = len(thresholds)
    i = 0
    for i in range(N):
        if val < thresholds[i]:
            break
    else:
        i = N
    if i > prev and val < thresholds[prev] + hysteresis[prev]:
        i = prev
    if i < prev and val > thresholds[prev - 1] - hysteresis[prev - 1]:
        i = prev
    return i


# ---------------------------------------------------------------------------
# Energy <-> normalised bands (float build, bands.c:157-265)

def compute_band_energies(m: CeltMode, X: np.ndarray, end: int, LM: int):
    """bands.c:159-174. X: [C, N] freq; returns bandE [C, nbEBands]."""
    C = X.shape[0]
    bandE = np.full((C, m.nb_ebands), EPSILON)
    for c in range(C):
        for i in range(end):
            lo, hi = int(m.e_bands[i]) << LM, int(m.e_bands[i + 1]) << LM
            s = X[c, lo:hi]
            bandE[c, i] = math.sqrt(1e-27 + float(np.dot(s, s)))
    return bandE


def normalise_bands(m: CeltMode, freq: np.ndarray, bandE: np.ndarray,
                    end: int, M: int) -> np.ndarray:
    """bands.c:177-191."""
    C = freq.shape[0]
    X = np.zeros_like(freq)
    for c in range(C):
        for i in range(end):
            lo, hi = M * int(m.e_bands[i]), M * int(m.e_bands[i + 1])
            X[c, lo:hi] = freq[c, lo:hi] * (1.0 / (1e-27 + bandE[c, i]))
    return X


def denormalise_bands(m: CeltMode, X: np.ndarray, bandLogE: np.ndarray,
                      start: int, end: int, M: int, downsample: int,
                      silence: bool) -> np.ndarray:
    """bands.c:196-265 (float). X, bandLogE for ONE channel."""
    from .modes import EMEANS
    N = M * m.short_mdct_size
    bound = M * int(m.e_bands[end])
    if downsample != 1:
        bound = min(bound, N // downsample)
    freq = np.zeros(N)
    if silence:
        return freq
    for i in range(start, end):
        j0 = M * int(m.e_bands[i])
        j1 = M * int(m.e_bands[i + 1])
        lg = bandLogE[i] + EMEANS[i]
        g = math.exp2(min(32.0, lg))
        freq[j0:j1] = X[j0:j1] * g
    freq[bound:] = 0.0
    return freq


# ---------------------------------------------------------------------------
# PVQ vector ops (vq.c)

def _exp_rotation1(X, lo, length, stride, c, s):
    """vq.c:47-71 — sequential Givens-style spreading pass."""
    ms = -s
    for i in range(length - stride):
        x1 = X[lo + i]
        x2 = X[lo + i + stride]
        X[lo + i + stride] = c * x2 + s * x1
        X[lo + i] = c * x1 + ms * x2
    for i in range(length - 2 * stride - 1, -1, -1):
        x1 = X[lo + i]
        x2 = X[lo + i + stride]
        X[lo + i + stride] = c * x2 + s * x1
        X[lo + i] = c * x1 + ms * x2


def exp_rotation(X, lo, length, direction, stride, K, spread):
    """vq.c:74-117."""
    SPREAD_FACTOR = (15, 10, 5)
    if 2 * K >= length or spread == SPREAD_NONE:
        return
    factor = SPREAD_FACTOR[spread - 1]
    gain = 1.0 * length / (length + factor * K)
    theta = 0.5 * gain * gain
    c = math.cos(0.5 * math.pi * theta)
    s = math.cos(0.5 * math.pi * (1.0 - theta))
    stride2 = 0
    if length >= 8 * stride:
        stride2 = 1
        while (stride2 * stride2 + stride2) * stride + (stride >> 2) < length:
            stride2 += 1
    length //= stride
    for i in range(stride):
        if direction < 0:
            if stride2:
                _exp_rotation1(X, lo + i * length, length, stride2, s, c)
            _exp_rotation1(X, lo + i * length, length, 1, c, s)
        else:
            _exp_rotation1(X, lo + i * length, length, 1, c, -s)
            if stride2:
                _exp_rotation1(X, lo + i * length, length, stride2, s, -c)


def _normalise_residual(iy, X, lo, N, Ryy, gain):
    """vq.c:121-141."""
    g = gain / math.sqrt(Ryy)
    for i in range(N):
        X[lo + i] = g * iy[i]


def _extract_collapse_mask(iy, N, B):
    """vq.c:143-163."""
    if B <= 1:
        return 1
    N0 = N // B
    mask = 0
    for i in range(B):
        tmp = 0
        for j in range(N0):
            tmp |= iy[i * N0 + j]
        mask |= (1 if tmp != 0 else 0) << i
    return mask


def op_pvq_search(X, lo, N, K):
    """vq.c:165-328 (float path). Returns (iy, yy); X[lo:lo+N] is
    overwritten with |X| as in the reference."""
    signx = [0] * N
    iy = [0] * N
    y = [0.0] * N
    for j in range(N):
        signx[j] = 1 if X[lo + j] < 0 else 0
        X[lo + j] = abs(X[lo + j])
    xy = 0.0
    yy = 0.0
    pulses_left = K
    if K > (N >> 1):
        acc = 0.0
        for j in range(N):
            acc += X[lo + j]
        if not (acc > EPSILON and acc < 64):
            X[lo] = 1.0
            for j in range(1, N):
                X[lo + j] = 0.0
            acc = 1.0
        rcp = (K + 0.8) / acc
        for j in range(N):
            iy[j] = int(math.floor(rcp * X[lo + j]))
            y[j] = float(iy[j])
            yy += y[j] * y[j]
            xy += X[lo + j] * y[j]
            y[j] *= 2
            pulses_left -= iy[j]
    assert pulses_left >= 0
    if pulses_left > N + 3:
        tmp = float(pulses_left)
        yy += tmp * tmp
        yy += tmp * y[0]
        iy[0] += pulses_left
        pulses_left = 0
    for _ in range(pulses_left):
        yy += 1
        best_id = 0
        Rxy = xy + X[lo]
        Ryy = yy + y[0]
        Rxy = Rxy * Rxy
        best_den = Ryy
        best_num = Rxy
        for j in range(1, N):
            Rxy = xy + X[lo + j]
            Ryy = yy + y[j]
            Rxy = Rxy * Rxy
            if best_den * Rxy > Ryy * best_num:
                best_den = Ryy
                best_num = Rxy
                best_id = j
        xy += X[lo + best_id]
        yy += y[best_id]
        y[best_id] += 2
        iy[best_id] += 1
    for j in range(N):
        iy[j] = -iy[j] if signx[j] else iy[j]
    return iy, yy


def alg_quant(X, lo, N, K, spread, B, ec, gain, resynth):
    """vq.c:330-359."""
    exp_rotation(X, lo, N, 1, B, K, spread)
    iy, yy = op_pvq_search(X, lo, N, K)
    encode_pulses(ec, iy, N, K)
    if resynth:
        _normalise_residual(iy, X, lo, N, yy, gain)
        exp_rotation(X, lo, N, -1, B, K, spread)
    return _extract_collapse_mask(iy, N, B)


def alg_unquant(X, lo, N, K, spread, B, ec, gain):
    """vq.c:363-380."""
    iy = decode_pulses(ec, N, K)
    Ryy = float(sum(v * v for v in iy))
    _normalise_residual(iy, X, lo, N, Ryy, gain)
    exp_rotation(X, lo, N, -1, B, K, spread)
    return _extract_collapse_mask(iy, N, B)


def renormalise_vector(X, lo, N, gain):
    """vq.c:383-408."""
    E = EPSILON
    for i in range(N):
        E += X[lo + i] * X[lo + i]
    g = gain / math.sqrt(E)
    for i in range(N):
        X[lo + i] *= g


def stereo_itheta(X, xlo, Y, ylo, stereo, N):
    """vq.c:410-442 (float)."""
    Emid = Eside = EPSILON
    if stereo:
        for i in range(N):
            mm = 0.5 * (X[xlo + i] + Y[ylo + i])
            ss = 0.5 * (X[xlo + i] - Y[ylo + i])
            Emid += mm * mm
            Eside += ss * ss
    else:
        for i in range(N):
            Emid += X[xlo + i] * X[xlo + i]
        for i in range(N):
            Eside += Y[ylo + i] * Y[ylo + i]
    mid = math.sqrt(Emid)
    side = math.sqrt(Eside)
    return int(math.floor(0.5 + 16384 * (2 / math.pi)
                          * math.atan2(side, mid)))


# ---------------------------------------------------------------------------
# Stereo helpers (bands.c:388-476)

def _intensity_stereo(m, X, xlo, Y, ylo, bandE, band, N):
    left = bandE[0, band]
    right = bandE[1, band]
    norm = EPSILON + math.sqrt(EPSILON + left * left + right * right)
    a1 = left / norm
    a2 = right / norm
    for j in range(N):
        X[xlo + j] = a1 * X[xlo + j] + a2 * Y[ylo + j]


def _stereo_split(X, xlo, Y, ylo, N):
    for j in range(N):
        l = 0.70710678 * X[xlo + j]
        r = 0.70710678 * Y[ylo + j]
        X[xlo + j] = l + r
        Y[ylo + j] = r - l


def _stereo_merge(X, xlo, Y, ylo, mid, N):
    xp = 0.0
    side = 0.0
    for j in range(N):
        xp += Y[ylo + j] * X[xlo + j]
        side += Y[ylo + j] * Y[ylo + j]
    xp *= mid
    mid2 = mid
    El = mid2 * mid2 + side - 2 * xp
    Er = mid2 * mid2 + side + 2 * xp
    if Er < 6e-4 or El < 6e-4:
        for j in range(N):
            Y[ylo + j] = X[xlo + j]
        return
    lgain = 1.0 / math.sqrt(El)
    rgain = 1.0 / math.sqrt(Er)
    for j in range(N):
        l = mid * X[xlo + j]
        r = Y[ylo + j]
        X[xlo + j] = lgain * (l - r)
        Y[ylo + j] = rgain * (l + r)


# ---------------------------------------------------------------------------
# Time-frequency resolution switching (bands.c:572-645)

ORDERY_TABLE = (1, 0,
                3, 0, 2, 1,
                7, 0, 4, 3, 6, 1, 5, 2,
                15, 0, 8, 7, 12, 3, 11, 4, 14, 1, 9, 6, 13, 2, 10, 5)


def _ordery(stride):
    off = {2: 0, 4: 2, 8: 6, 16: 14}[stride]
    return ORDERY_TABLE[off:off + stride]


def _deinterleave_hadamard(X, lo, N0, stride, hadamard):
    N = N0 * stride
    tmp = [0.0] * N
    if hadamard:
        ordery = _ordery(stride)
        for i in range(stride):
            for j in range(N0):
                tmp[ordery[i] * N0 + j] = X[lo + j * stride + i]
    else:
        for i in range(stride):
            for j in range(N0):
                tmp[i * N0 + j] = X[lo + j * stride + i]
    for i in range(N):
        X[lo + i] = tmp[i]


def _interleave_hadamard(X, lo, N0, stride, hadamard):
    N = N0 * stride
    tmp = [0.0] * N
    if hadamard:
        ordery = _ordery(stride)
        for i in range(stride):
            for j in range(N0):
                tmp[j * stride + i] = X[lo + ordery[i] * N0 + j]
    else:
        for i in range(stride):
            for j in range(N0):
                tmp[j * stride + i] = X[lo + i * N0 + j]
    for i in range(N):
        X[lo + i] = tmp[i]


def haar1(X, lo, N0, stride):
    """bands.c:632-645."""
    N0 >>= 1
    for i in range(stride):
        for j in range(N0):
            a = lo + stride * 2 * j + i
            b = lo + stride * (2 * j + 1) + i
            t1 = 0.70710678 * X[a]
            t2 = 0.70710678 * X[b]
            X[a] = t1 + t2
            X[b] = t1 - t2


def _compute_qn(N, b, offset, pulse_cap, stereo):
    """bands.c:647-671."""
    EXP2_TABLE8 = (16384, 17866, 19483, 21247, 23170, 25267, 27554, 30048)
    N2 = 2 * N - 1
    if stereo and N == 2:
        N2 -= 1
    qb = (b + N2 * offset) // N2 if b + N2 * offset >= 0 else \
        -((-(b + N2 * offset)) // N2)
    qb = min(b - pulse_cap - (4 << BITRES), qb)
    qb = min(8 << BITRES, qb)
    if qb < ((1 << BITRES) >> 1):
        qn = 1
    else:
        qn = EXP2_TABLE8[qb & 0x7] >> (14 - (qb >> BITRES))
        qn = ((qn + 1) >> 1) << 1
    assert qn <= 256
    return qn


# ---------------------------------------------------------------------------
# Band context + theta

@dataclass
class BandCtx:
    encode: bool
    resynth: bool
    m: CeltMode
    i: int
    intensity: int
    spread: int
    tf_change: int
    ec: object
    remaining_bits: int
    bandE: Optional[np.ndarray]
    seed: int
    theta_round: int = 0
    disable_inv: bool = False
    avoid_split_noise: bool = False


@dataclass
class SplitCtx:
    inv: int = 0
    imid: int = 0
    iside: int = 0
    delta: int = 0
    itheta: int = 0
    qalloc: int = 0


def _compute_theta(ctx: BandCtx, sctx: SplitCtx, X, xlo, Y, ylo, N, b, B, B0,
                   LM, stereo, fill):
    """bands.c:700-903. Returns (b, fill) updated."""
    m = ctx.m
    i = ctx.i
    ec = ctx.ec
    encode = ctx.encode
    itheta = 0
    inv = 0

    pulse_cap = int(m.log_n[i]) + LM * (1 << BITRES)
    offset = (pulse_cap >> 1) - (QTHETA_OFFSET_TWOPHASE if stereo and N == 2
                                 else QTHETA_OFFSET)
    qn = _compute_qn(N, b, offset, pulse_cap, stereo)
    if stereo and i >= ctx.intensity:
        qn = 1
    if encode:
        itheta = stereo_itheta(X, xlo, Y, ylo, stereo, N)
    tell = ec.tell_frac()
    if qn != 1:
        if encode:
            if not stereo or ctx.theta_round == 0:
                itheta = (itheta * qn + 8192) >> 14
                if (not stereo and ctx.avoid_split_noise
                        and 0 < itheta < qn):
                    unquantized = (itheta * 16384) // qn
                    imid = bitexact_cos(unquantized)
                    iside = bitexact_cos(16384 - unquantized)
                    delta = _frac_mul16((N - 1) << 7,
                                        bitexact_log2tan(iside, imid))
                    if delta > b:
                        itheta = qn
                    elif delta < -b:
                        itheta = 0
            else:
                bias = 32767 // qn if itheta > 8192 else -32767 // qn
                down = min(qn - 1, max(0, (itheta * qn + bias) >> 14))
                itheta = down if ctx.theta_round < 0 else down + 1
        # entropy code the angle
        if stereo and N > 2:
            p0 = 3
            x = itheta
            x0 = qn // 2
            ft = p0 * (x0 + 1) + x0
            if encode:
                fl = p0 * x if x <= x0 else (x - 1 - x0) + (x0 + 1) * p0
                fh = p0 * (x + 1) if x <= x0 else (x - x0) + (x0 + 1) * p0
                ec.encode(fl, fh, ft)
            else:
                fs = ec.decode(ft)
                if fs < (x0 + 1) * p0:
                    x = fs // p0
                else:
                    x = x0 + 1 + (fs - (x0 + 1) * p0)
                fl = p0 * x if x <= x0 else (x - 1 - x0) + (x0 + 1) * p0
                fh = p0 * (x + 1) if x <= x0 else (x - x0) + (x0 + 1) * p0
                ec.update(fl, fh, ft)
                itheta = x
        elif B0 > 1 or stereo:
            if encode:
                ec.enc_uint(itheta, qn + 1)
            else:
                itheta = ec.dec_uint(qn + 1)
        else:
            ft = ((qn >> 1) + 1) * ((qn >> 1) + 1)
            if encode:
                if itheta <= (qn >> 1):
                    fs = itheta + 1
                    fl = itheta * (itheta + 1) >> 1
                else:
                    fs = qn + 1 - itheta
                    fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1)
                ec.encode(fl, fl + fs, ft)
            else:
                fm = ec.decode(ft)
                if fm < ((qn >> 1) * ((qn >> 1) + 1) >> 1):
                    itheta = (math.isqrt(8 * fm + 1) - 1) >> 1
                    fs = itheta + 1
                    fl = itheta * (itheta + 1) >> 1
                else:
                    itheta = (2 * (qn + 1)
                              - math.isqrt(8 * (ft - fm - 1) + 1)) >> 1
                    fs = qn + 1 - itheta
                    fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1)
                ec.update(fl, fl + fs, ft)
        assert itheta >= 0
        itheta = (itheta * 16384) // qn
        if encode and stereo:
            if itheta == 0:
                _intensity_stereo(m, X, xlo, Y, ylo, ctx.bandE, i, N)
            else:
                _stereo_split(X, xlo, Y, ylo, N)
    elif stereo:
        if encode:
            inv = 1 if (itheta > 8192 and not ctx.disable_inv) else 0
            if inv:
                for j in range(N):
                    Y[ylo + j] = -Y[ylo + j]
            _intensity_stereo(m, X, xlo, Y, ylo, ctx.bandE, i, N)
        if b > 2 << BITRES and ctx.remaining_bits > 2 << BITRES:
            if encode:
                ec.enc_bit_logp(inv, 2)
            else:
                inv = ec.dec_bit_logp(2)
        else:
            inv = 0
        if ctx.disable_inv:
            inv = 0
        itheta = 0
    qalloc = ec.tell_frac() - tell
    b -= qalloc

    if itheta == 0:
        imid = 32767
        iside = 0
        fill &= (1 << B) - 1
        delta = -16384
    elif itheta == 16384:
        imid = 0
        iside = 32767
        fill &= ((1 << B) - 1) << B
        delta = 16384
    else:
        imid = bitexact_cos(itheta)
        iside = bitexact_cos(16384 - itheta)
        delta = _frac_mul16((N - 1) << 7, bitexact_log2tan(iside, imid))

    sctx.inv = inv
    sctx.imid = imid
    sctx.iside = iside
    sctx.delta = delta
    sctx.itheta = itheta
    sctx.qalloc = qalloc
    return b, fill


def _quant_band_n1(ctx: BandCtx, X, xlo, Y, ylo):
    """bands.c:904-937."""
    ec = ctx.ec
    stereo = Y is not None
    arrs = [(X, xlo)] + ([(Y, ylo)] if stereo else [])
    for (arr, lo) in arrs:
        sign = 0
        if ctx.remaining_bits >= 1 << BITRES:
            if ctx.encode:
                sign = 1 if arr[lo] < 0 else 0
                ec.enc_bits(sign, 1)
            else:
                sign = ec.dec_bits(1)
            ctx.remaining_bits -= 1 << BITRES
        if ctx.resynth:
            arr[lo] = -NORM_SCALING if sign else NORM_SCALING
    return 1


def _quant_partition(ctx: BandCtx, X, xlo, N, b, B, lowband, lblo, LM,
                     gain, fill):
    """bands.c:943-1105."""
    m = ctx.m
    i = ctx.i
    encode = ctx.encode
    ec = ctx.ec
    B0 = B
    cm = 0

    cache_off = m.cache_index[(LM + 1) * m.nb_ebands + i]
    cache = m.cache_bits
    if LM != -1 and b > int(cache[cache_off + int(cache[cache_off])]) + 12 \
            and N > 2:
        N >>= 1
        ylo = xlo + N
        LM -= 1
        if B == 1:
            fill = (fill & 1) | (fill << 1)
        B = (B + 1) >> 1

        sctx = SplitCtx()
        b, fill = _compute_theta(ctx, sctx, X, xlo, X, ylo, N, b, B, B0, LM,
                                 0, fill)
        imid = sctx.imid
        iside = sctx.iside
        delta = sctx.delta
        itheta = sctx.itheta
        qalloc = sctx.qalloc
        mid = (1.0 / 32768) * imid
        side = (1.0 / 32768) * iside

        if B0 > 1 and (itheta & 0x3fff):
            if itheta > 8192:
                delta -= delta >> (4 - LM)
            else:
                delta = min(0, delta + (N << BITRES >> (5 - LM)))
        mbits = max(0, min(b, (b - delta) // 2))
        sbits = b - mbits
        ctx.remaining_bits -= qalloc

        next_lowband2 = lblo + N if lowband is not None else 0

        rebalance = ctx.remaining_bits
        if mbits >= sbits:
            cm = _quant_partition(ctx, X, xlo, N, mbits, B, lowband, lblo,
                                  LM, gain * mid, fill)
            rebalance = mbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 0:
                sbits += rebalance - (3 << BITRES)
            cm |= _quant_partition(ctx, X, ylo, N, sbits, B, lowband,
                                   next_lowband2, LM, gain * side,
                                   fill >> B) << (B0 >> 1)
        else:
            cm = _quant_partition(ctx, X, ylo, N, sbits, B, lowband,
                                  next_lowband2, LM, gain * side,
                                  fill >> B) << (B0 >> 1)
            rebalance = sbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 16384:
                mbits += rebalance - (3 << BITRES)
            cm |= _quant_partition(ctx, X, xlo, N, mbits, B, lowband, lblo,
                                   LM, gain * mid, fill)
    else:
        # basic no-split case (bands.c:1036-1102)
        q = m.bits2pulses(i, LM, b)
        curr_bits = m.pulses2bits(i, LM, q)
        ctx.remaining_bits -= curr_bits
        while ctx.remaining_bits < 0 and q > 0:
            ctx.remaining_bits += curr_bits
            q -= 1
            curr_bits = m.pulses2bits(i, LM, q)
            ctx.remaining_bits -= curr_bits
        if q != 0:
            K = get_pulses(q)
            if encode:
                cm = alg_quant(X, xlo, N, K, ctx.spread, B, ec, gain,
                               ctx.resynth)
            else:
                cm = alg_unquant(X, xlo, N, K, ctx.spread, B, ec, gain)
        else:
            if ctx.resynth:
                cm_mask = (1 << B) - 1
                fill &= cm_mask
                if not fill:
                    for j in range(N):
                        X[xlo + j] = 0.0
                else:
                    if lowband is None:
                        for j in range(N):
                            ctx.seed = celt_lcg_rand(ctx.seed)
                            X[xlo + j] = float(
                                np.int32(np.uint32(ctx.seed)) >> 20)
                        cm = cm_mask
                    else:
                        for j in range(N):
                            ctx.seed = celt_lcg_rand(ctx.seed)
                            tmp = 1.0 / 256
                            tmp = tmp if (ctx.seed & 0x8000) else -tmp
                            X[xlo + j] = lowband[lblo + j] + tmp
                        cm = fill
                    renormalise_vector(X, xlo, N, gain)
    return cm


BIT_INTERLEAVE_TABLE = (0, 1, 1, 1, 2, 3, 3, 3, 2, 3, 3, 3, 2, 3, 3, 3)
BIT_DEINTERLEAVE_TABLE = (0x00, 0x03, 0x0C, 0x0F, 0x30, 0x33, 0x3C, 0x3F,
                          0xC0, 0xC3, 0xCC, 0xCF, 0xF0, 0xF3, 0xFC, 0xFF)


def _quant_band(ctx: BandCtx, X, xlo, N, b, B, lowband, lblo, LM,
                lowband_out, lolo, gain, lowband_scratch, lslo, fill):
    """bands.c:1109-1231 (mono band)."""
    N0 = N
    N_B = N // B
    B0 = B
    time_divide = 0
    recombine = 0
    longBlocks = B0 == 1
    encode = ctx.encode
    tf_change = ctx.tf_change

    if N == 1:
        r = _quant_band_n1(ctx, X, xlo, None, 0)
        if lowband_out is not None:
            lowband_out[lolo] = X[xlo]
        return r

    if tf_change > 0:
        recombine = tf_change

    if lowband_scratch is not None and lowband is not None and \
            (recombine or ((N_B & 1) == 0 and tf_change < 0) or B0 > 1):
        for j in range(N):
            lowband_scratch[lslo + j] = lowband[lblo + j]
        lowband = lowband_scratch
        lblo = lslo

    for k in range(recombine):
        if encode:
            haar1(X, xlo, N >> k, 1 << k)
        if lowband is not None:
            haar1(lowband, lblo, N >> k, 1 << k)
        fill = BIT_INTERLEAVE_TABLE[fill & 0xF] | \
            (BIT_INTERLEAVE_TABLE[fill >> 4] << 2)
    B >>= recombine
    N_B <<= recombine

    while (N_B & 1) == 0 and tf_change < 0:
        if encode:
            haar1(X, xlo, N_B, B)
        if lowband is not None:
            haar1(lowband, lblo, N_B, B)
        fill |= fill << B
        B <<= 1
        N_B >>= 1
        time_divide += 1
        tf_change += 1
    B0 = B
    N_B0 = N_B

    if B0 > 1:
        if encode:
            _deinterleave_hadamard(X, xlo, N_B >> recombine,
                                   B0 << recombine, longBlocks)
        if lowband is not None:
            _deinterleave_hadamard(lowband, lblo, N_B >> recombine,
                                   B0 << recombine, longBlocks)

    cm = _quant_partition(ctx, X, xlo, N, b, B, lowband, lblo, LM, gain,
                          fill)

    if ctx.resynth:
        if B0 > 1:
            _interleave_hadamard(X, xlo, N_B >> recombine, B0 << recombine,
                                 longBlocks)
        N_B = N_B0
        B = B0
        for _ in range(time_divide):
            B >>= 1
            N_B <<= 1
            cm |= cm >> B
            haar1(X, xlo, N_B, B)
        for k in range(recombine):
            cm = BIT_DEINTERLEAVE_TABLE[cm]
            haar1(X, xlo, N0 >> k, 1 << k)
        B <<= recombine

        if lowband_out is not None:
            n = math.sqrt(N0)
            for j in range(N0):
                lowband_out[lolo + j] = n * X[xlo + j]
        cm &= (1 << B) - 1
    return cm


def _quant_band_stereo(ctx: BandCtx, X, xlo, Y, ylo, N, b, B, lowband, lblo,
                       LM, lowband_out, lolo, lowband_scratch, lslo, fill):
    """bands.c:1235-1381."""
    ec = ctx.ec
    encode = ctx.encode
    cm = 0

    if N == 1:
        r = _quant_band_n1(ctx, X, xlo, Y, ylo)
        if lowband_out is not None:
            lowband_out[lolo] = X[xlo]
        return r

    orig_fill = fill
    sctx = SplitCtx()
    b, fill = _compute_theta(ctx, sctx, X, xlo, Y, ylo, N, b, B, B, LM, 1,
                             fill)
    inv = sctx.inv
    imid = sctx.imid
    iside = sctx.iside
    delta = sctx.delta
    itheta = sctx.itheta
    qalloc = sctx.qalloc
    mid = (1.0 / 32768) * imid
    side = (1.0 / 32768) * iside

    if N == 2:
        mbits = b
        sbits = 0
        if itheta != 0 and itheta != 16384:
            sbits = 1 << BITRES
        mbits -= sbits
        c = 1 if itheta > 8192 else 0
        ctx.remaining_bits -= qalloc + sbits
        if c:
            x2, x2lo, y2, y2lo = Y, ylo, X, xlo
        else:
            x2, x2lo, y2, y2lo = X, xlo, Y, ylo
        sign = 0
        if sbits:
            if encode:
                sign = 1 if (x2[x2lo] * y2[y2lo + 1]
                             - x2[x2lo + 1] * y2[y2lo]) < 0 else 0
                ec.enc_bits(sign, 1)
            else:
                sign = ec.dec_bits(1)
        sign = 1 - 2 * sign
        cm = _quant_band(ctx, x2, x2lo, N, mbits, B, lowband, lblo, LM,
                         lowband_out, lolo, 1.0, lowband_scratch, lslo,
                         orig_fill)
        y2[y2lo] = -sign * x2[x2lo + 1]
        y2[y2lo + 1] = sign * x2[x2lo]
        if ctx.resynth:
            X[xlo] *= mid
            X[xlo + 1] *= mid
            Y[ylo] *= side
            Y[ylo + 1] *= side
            tmp = X[xlo]
            X[xlo] = tmp - Y[ylo]
            Y[ylo] = tmp + Y[ylo]
            tmp = X[xlo + 1]
            X[xlo + 1] = tmp - Y[ylo + 1]
            Y[ylo + 1] = tmp + Y[ylo + 1]
    else:
        mbits = max(0, min(b, (b - delta) // 2))
        sbits = b - mbits
        ctx.remaining_bits -= qalloc
        rebalance = ctx.remaining_bits
        if mbits >= sbits:
            cm = _quant_band(ctx, X, xlo, N, mbits, B, lowband, lblo, LM,
                             lowband_out, lolo, 1.0, lowband_scratch, lslo,
                             fill)
            rebalance = mbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 0:
                sbits += rebalance - (3 << BITRES)
            cm |= _quant_band(ctx, Y, ylo, N, sbits, B, None, 0, LM, None,
                              0, side, None, 0, fill >> B)
        else:
            cm = _quant_band(ctx, Y, ylo, N, sbits, B, None, 0, LM, None, 0,
                             side, None, 0, fill >> B)
            rebalance = sbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 16384:
                mbits += rebalance - (3 << BITRES)
            cm |= _quant_band(ctx, X, xlo, N, mbits, B, lowband, lblo, LM,
                              lowband_out, lolo, 1.0, lowband_scratch, lslo,
                              fill)

    if ctx.resynth:
        if N != 2:
            _stereo_merge(X, xlo, Y, ylo, mid, N)
        if inv:
            for j in range(N):
                Y[ylo + j] = -Y[ylo + j]
    return cm


def _special_hybrid_folding(m, norm, norm2, start, M, dual_stereo):
    """bands.c:1384-1396."""
    n1 = M * int(m.e_bands[start + 1] - m.e_bands[start])
    n2 = M * int(m.e_bands[start + 2] - m.e_bands[start + 1])
    for j in range(n2 - n1):
        norm[n1 + j] = norm[2 * n1 - n2 + j]
    if dual_stereo:
        for j in range(n2 - n1):
            norm2[n1 + j] = norm2[2 * n1 - n2 + j]


def quant_all_bands(encode: bool, m: CeltMode, start: int, end: int,
                    X_, Y_, collapse_masks, bandE, pulses, shortBlocks,
                    spread, dual_stereo, intensity, tf_res, total_bits,
                    balance, ec, LM, codedBands, seed, complexity=0,
                    disable_inv=False):
    """bands.c:1398-1672. X_/Y_ are per-channel python lists (length N);
    collapse_masks is a list of length nbEBands*C, modified in place.
    Returns the updated seed."""
    e_bands = m.e_bands
    M = 1 << LM
    B = M if shortBlocks else 1
    norm_offset = M * int(e_bands[start])
    C = 2 if Y_ is not None else 1
    norm_len = M * int(e_bands[m.nb_ebands - 1]) - norm_offset
    norm = [0.0] * norm_len
    norm2 = [0.0] * norm_len if C == 2 else norm

    resynth_len = M * int(e_bands[m.nb_ebands] - e_bands[m.nb_ebands - 1])
    lowband_scratch = [0.0] * resynth_len
    lslo = 0

    theta_rdo = encode and Y_ is not None and not dual_stereo and \
        complexity >= 8
    resynth = (not encode) or theta_rdo

    lowband_offset = 0
    update_lowband = True
    ctx = BandCtx(encode=encode, resynth=resynth, m=m, i=0,
                  intensity=intensity, spread=spread, tf_change=0, ec=ec,
                  remaining_bits=0, bandE=bandE, seed=seed,
                  disable_inv=disable_inv, avoid_split_noise=B > 1)
    for i in range(start, end):
        ctx.i = i
        last = (i == end - 1)
        xlo = M * int(e_bands[i])
        ylo = xlo
        N = M * int(e_bands[i + 1]) - xlo
        assert N > 0
        tell = ec.tell_frac()
        if i != start:
            balance -= tell
        remaining_bits = total_bits - tell - 1
        ctx.remaining_bits = remaining_bits
        if i <= codedBands - 1:
            curr_balance = balance // min(3, codedBands - i) if balance >= 0 \
                else -((-balance) // min(3, codedBands - i))
            b = max(0, min(16383, min(remaining_bits + 1,
                                      pulses[i] + curr_balance)))
        else:
            b = 0

        if resynth and (M * int(e_bands[i]) - N >= M * int(e_bands[start])
                        or i == start + 1) and \
                (update_lowband or lowband_offset == 0):
            lowband_offset = i
        if i == start + 1:
            _special_hybrid_folding(m, norm, norm2, start, M, dual_stereo)

        tf_change = tf_res[i]
        ctx.tf_change = tf_change
        X, Y = X_, Y_
        cur_xlo, cur_ylo = xlo, ylo
        use_scratch = lowband_scratch
        if i >= m.eff_ebands:
            X = norm
            Y = norm if Y_ is not None else None
            cur_xlo = cur_ylo = 0
            use_scratch = None
        if last and not theta_rdo:
            use_scratch = None

        # fold source + collapse mask estimate (bands.c:1536-1560)
        effective_lowband = -1
        if lowband_offset != 0 and (spread != SPREAD_AGGRESSIVE or B > 1
                                    or tf_change < 0):
            effective_lowband = max(0, M * int(e_bands[lowband_offset])
                                    - norm_offset - N)
            fold_start = lowband_offset
            while M * int(e_bands[fold_start - 1]) > \
                    effective_lowband + norm_offset:
                fold_start -= 1
            fold_end = lowband_offset - 1
            while True:
                fold_end += 1
                if not (fold_end < i and M * int(e_bands[fold_end]) <
                        effective_lowband + norm_offset + N):
                    break
            x_cm = y_cm = 0
            fold_i = fold_start
            while True:
                x_cm |= collapse_masks[fold_i * C + 0]
                y_cm |= collapse_masks[fold_i * C + C - 1]
                fold_i += 1
                if fold_i >= fold_end:
                    break
        else:
            x_cm = y_cm = (1 << B) - 1

        if dual_stereo and i == intensity:
            dual_stereo = 0
            if resynth:
                for j in range(M * int(e_bands[i]) - norm_offset):
                    norm[j] = 0.5 * (norm[j] + norm2[j])
        if dual_stereo:
            lb = norm if effective_lowband != -1 else None
            x_cm = _quant_band(ctx, X, cur_xlo, N, b // 2, B,
                               lb, effective_lowband if lb else 0, LM,
                               None if last else norm,
                               M * int(e_bands[i]) - norm_offset,
                               1.0, use_scratch, lslo, x_cm)
            lb2 = norm2 if effective_lowband != -1 else None
            y_cm = _quant_band(ctx, Y, cur_ylo, N, b // 2, B,
                               lb2, effective_lowband if lb2 else 0, LM,
                               None if last else norm2,
                               M * int(e_bands[i]) - norm_offset,
                               1.0, use_scratch, lslo, y_cm)
        else:
            if Y is not None:
                if theta_rdo and i < intensity:
                    # Encoder-side theta RDO: try round-down and round-up,
                    # keep the better (bands.c:1583-1645).
                    import copy
                    cm = x_cm | y_cm
                    ec_save = copy.deepcopy(ec)
                    ctx_save = copy.deepcopy(ctx)
                    X_save = X[cur_xlo:cur_xlo + N].copy() if \
                        isinstance(X, np.ndarray) else list(
                            X[cur_xlo:cur_xlo + N])
                    Y_save = list(Y[cur_ylo:cur_ylo + N])
                    w = _channel_weights(bandE[0, i], bandE[1, i])
                    ctx.theta_round = -1
                    x_cm = _quant_band_stereo(
                        ctx, X, cur_xlo, Y, cur_ylo, N, b, B,
                        norm if effective_lowband != -1 else None,
                        effective_lowband, LM,
                        None if last else norm,
                        M * int(e_bands[i]) - norm_offset,
                        use_scratch, lslo, cm)
                    dist0 = w[0] * _inner(X_save, X, cur_xlo, N) + \
                        w[1] * _inner(Y_save, Y, cur_ylo, N)
                    cm2 = x_cm
                    ec_save2 = copy.deepcopy(ec)
                    ctx_save2 = copy.deepcopy(ctx)
                    X2 = list(X[cur_xlo:cur_xlo + N])
                    Y2 = list(Y[cur_ylo:cur_ylo + N])
                    norm_save2 = None
                    if not last:
                        off = M * int(e_bands[i]) - norm_offset
                        norm_save2 = list(norm[off:off + N])
                    # restore
                    _restore_ec(ec, ec_save)
                    _restore_ctx(ctx, ctx_save)
                    for j in range(N):
                        X[cur_xlo + j] = X_save[j]
                        Y[cur_ylo + j] = Y_save[j]
                    if i == start + 1:
                        _special_hybrid_folding(m, norm, norm2, start, M,
                                                dual_stereo)
                    ctx.theta_round = 1
                    x_cm = _quant_band_stereo(
                        ctx, X, cur_xlo, Y, cur_ylo, N, b, B,
                        norm if effective_lowband != -1 else None,
                        effective_lowband, LM,
                        None if last else norm,
                        M * int(e_bands[i]) - norm_offset,
                        use_scratch, lslo, cm)
                    dist1 = w[0] * _inner(X_save, X, cur_xlo, N) + \
                        w[1] * _inner(Y_save, Y, cur_ylo, N)
                    if dist0 >= dist1:
                        x_cm = cm2
                        _restore_ec(ec, ec_save2)
                        _restore_ctx(ctx, ctx_save2)
                        for j in range(N):
                            X[cur_xlo + j] = X2[j]
                            Y[cur_ylo + j] = Y2[j]
                        if not last:
                            off = M * int(e_bands[i]) - norm_offset
                            for j in range(N):
                                norm[off + j] = norm_save2[j]
                    ctx.theta_round = 0
                else:
                    ctx.theta_round = 0
                    x_cm = _quant_band_stereo(
                        ctx, X, cur_xlo, Y, cur_ylo, N, b, B,
                        norm if effective_lowband != -1 else None,
                        effective_lowband, LM,
                        None if last else norm,
                        M * int(e_bands[i]) - norm_offset,
                        use_scratch, lslo, x_cm | y_cm)
            else:
                x_cm = _quant_band(ctx, X, cur_xlo, N, b, B,
                                   norm if effective_lowband != -1 else None,
                                   effective_lowband, LM,
                                   None if last else norm,
                                   M * int(e_bands[i]) - norm_offset,
                                   1.0, use_scratch, lslo, x_cm | y_cm)
            y_cm = x_cm
        collapse_masks[i * C + 0] = x_cm & 0xFF
        collapse_masks[i * C + C - 1] = y_cm & 0xFF
        balance += pulses[i] + tell
        update_lowband = b > (N << BITRES)
        ctx.avoid_split_noise = False
    return ctx.seed


def _inner(saved, arr, lo, N):
    return sum(saved[j] * arr[lo + j] for j in range(N))


# _quant_band_n1 writes lowband_out inline at its call sites.


def _channel_weights(Ex, Ey):
    """bands.c:371-386."""
    minE = min(Ex, Ey)
    Ex = Ex + minE / 3
    Ey = Ey + minE / 3
    return (Ex, Ey)


def _restore_ec(ec, saved):
    for k in ec.__slots__ if hasattr(ec, "__slots__") else vars(ec):
        setattr(ec, k, getattr(saved, k))
    ec.buf = bytearray(saved.buf) if isinstance(saved.buf, bytearray) \
        else saved.buf


def _restore_ctx(ctx, saved):
    for f in ("remaining_bits", "seed", "theta_round", "avoid_split_noise",
              "tf_change", "i"):
        setattr(ctx, f, getattr(saved, f))


def anti_collapse(m: CeltMode, X_, collapse_masks, LM, C, size, start, end,
                  logE, prev1logE, prev2logE, pulses, seed):
    """bands.c:268-362 (float). X_: [C] lists of length ``size``; modified
    in place. Returns updated seed (reference discards it; we keep parity
    with the in-frame rng use)."""
    for i in range(start, end):
        N0 = int(m.e_bands[i + 1] - m.e_bands[i])
        depth = ((1 + pulses[i]) // N0) >> LM
        thresh = 0.5 * math.exp2(-0.125 * depth)
        sqrt_1 = 1.0 / math.sqrt(N0 << LM)
        for c in range(C):
            prev1 = prev1logE[c * m.nb_ebands + i]
            prev2 = prev2logE[c * m.nb_ebands + i]
            if C == 1:
                prev1 = max(prev1, prev1logE[m.nb_ebands + i])
                prev2 = max(prev2, prev2logE[m.nb_ebands + i])
            Ediff = max(0.0, logE[c * m.nb_ebands + i] - min(prev1, prev2))
            r = 2.0 * math.exp2(-Ediff)
            if LM == 3:
                r *= 1.41421356
            r = min(thresh, r)
            r = r * sqrt_1
            X = X_[c]
            base = int(m.e_bands[i]) << LM
            renormalize = False
            for k in range(1 << LM):
                if not (collapse_masks[i * C + c] & (1 << k)):
                    for j in range(N0):
                        seed = celt_lcg_rand(seed)
                        X[base + (j << LM) + k] = r if (seed & 0x8000) else -r
                    renormalize = True
            if renormalize:
                renormalise_vector(X, base, N0 << LM, 1.0)
    return seed


def spreading_decision(m: CeltMode, X_, average, last_decision, hf_average,
                       tapset_decision, update_hf, end, C, M, spread_weight):
    """bands.c:479-570 (encoder side). X_: [C] lists. Returns
    (decision, average, hf_average, tapset_decision)."""
    e_bands = m.e_bands
    N0 = M * m.short_mdct_size
    sum_ = 0
    nb_bands = 0
    hf_sum = 0
    if M * int(e_bands[end] - e_bands[end - 1]) <= 8:
        return SPREAD_NONE, average, hf_average, tapset_decision
    for c in range(C):
        for i in range(end):
            N = M * int(e_bands[i + 1] - e_bands[i])
            if N <= 8:
                continue
            base = M * int(e_bands[i])
            tcount = [0, 0, 0]
            for j in range(N):
                x = X_[c][base + j]
                x2N = x * x * N
                if x2N < 0.25:
                    tcount[0] += 1
                if x2N < 0.0625:
                    tcount[1] += 1
                if x2N < 0.015625:
                    tcount[2] += 1
            if i > m.nb_ebands - 4:
                hf_sum += (32 * (tcount[1] + tcount[0])) // N
            tmp = (1 if 2 * tcount[2] >= N else 0) + \
                  (1 if 2 * tcount[1] >= N else 0) + \
                  (1 if 2 * tcount[0] >= N else 0)
            sum_ += tmp * spread_weight[i]
            nb_bands += spread_weight[i]
    if update_hf:
        if hf_sum:
            hf_sum //= C * (4 - m.nb_ebands + end)
        hf_average = (hf_average + hf_sum) >> 1
        hf_sum = hf_average
        if tapset_decision == 2:
            hf_sum += 4
        elif tapset_decision == 0:
            hf_sum -= 4
        if hf_sum > 22:
            tapset_decision = 2
        elif hf_sum > 18:
            tapset_decision = 1
        else:
            tapset_decision = 0
    assert nb_bands > 0
    sum_ = (sum_ << 8) // nb_bands
    sum_ = (sum_ + average) >> 1
    average = sum_
    sum_ = (3 * sum_ + (((3 - last_decision) << 7) + 64) + 2) >> 2
    if sum_ < 80:
        decision = SPREAD_AGGRESSIVE
    elif sum_ < 256:
        decision = 2  # SPREAD_NORMAL
    elif sum_ < 384:
        decision = 1  # SPREAD_LIGHT
    else:
        decision = SPREAD_NONE
    return decision, average, hf_average, tapset_decision
