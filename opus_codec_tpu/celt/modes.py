"""CELT mode data: band layout, window, allocation tables, pulse cache.

Behavioural parity: /root/reference/opus/celt/modes.c (compute_ebands :90,
compute_allocation_table :167, opus_custom_mode_create :227) and
rate.c (compute_pulse_cache :73). Protocol constants (eband5ms,
band_allocation, probability models, icdf tables) are normative RFC 6716
data and are reproduced as such.

The standard Opus mode (48 kHz, 960/120) is constructed once at import and
cached; all tables are plain numpy arrays so the batched device planners can
lift them straight into jnp constants.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import lru_cache
from typing import List, Tuple

import numpy as np

from .cwrs import V as pvq_V, get_required_bits, log2_frac

__all__ = ["CeltMode", "standard_mode", "BITRES", "MAX_PSEUDO",
           "CELT_MAX_PULSES", "MAX_FINE_BITS", "FINE_OFFSET",
           "QTHETA_OFFSET", "QTHETA_OFFSET_TWOPHASE", "get_pulses",
           "SPREAD_NONE", "SPREAD_LIGHT", "SPREAD_NORMAL",
           "SPREAD_AGGRESSIVE", "TF_SELECT_TABLE", "LOG2_FRAC_TABLE"]

BITRES = 3
MAX_PSEUDO = 40
LOG_MAX_PSEUDO = 6
CELT_MAX_PULSES = 128
MAX_FINE_BITS = 8
FINE_OFFSET = 21
QTHETA_OFFSET = 4
QTHETA_OFFSET_TWOPHASE = 16

SPREAD_NONE = 0
SPREAD_LIGHT = 1
SPREAD_NORMAL = 2
SPREAD_AGGRESSIVE = 3

# RFC 6716 Table 55-ish: 21-band layout in 5 ms MDCT bins (modes.c:42-45).
EBAND5MS = (0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 34, 40,
            48, 60, 78, 100)

# Bit allocation matrix, 1/32 bit/sample units (modes.c:50-63; RFC 6716).
BAND_ALLOCATION = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    90, 80, 75, 69, 63, 56, 49, 40, 34, 29, 20, 18, 10, 0, 0, 0, 0, 0, 0, 0, 0,
    110, 100, 90, 84, 78, 71, 65, 58, 51, 45, 39, 32, 26, 20, 12, 0, 0, 0, 0, 0, 0,
    118, 110, 103, 93, 86, 80, 75, 70, 65, 59, 53, 47, 40, 31, 23, 15, 4, 0, 0, 0, 0,
    126, 119, 112, 104, 95, 89, 83, 78, 72, 66, 60, 54, 47, 39, 32, 25, 17, 12, 1, 0, 0,
    134, 127, 120, 114, 103, 97, 91, 85, 78, 72, 66, 60, 54, 47, 41, 35, 29, 23, 16, 10, 1,
    144, 137, 130, 124, 113, 107, 101, 95, 88, 82, 76, 70, 64, 57, 51, 45, 39, 33, 26, 15, 1,
    152, 145, 138, 132, 123, 117, 111, 105, 98, 92, 86, 80, 74, 67, 61, 55, 49, 43, 36, 20, 1,
    162, 155, 148, 142, 133, 127, 121, 115, 108, 102, 96, 90, 84, 77, 71, 65, 59, 53, 46, 30, 1,
    172, 165, 158, 152, 143, 137, 131, 125, 118, 112, 106, 100, 94, 87, 81, 75, 69, 63, 56, 45, 20,
    200, 200, 200, 200, 200, 200, 200, 200, 198, 193, 188, 183, 178, 173, 168, 163, 158, 153, 148, 129, 104,
)
BITALLOC_SIZE = 11

# rate.c:42-48
LOG2_FRAC_TABLE = (0, 8, 13, 16, 19, 21, 23, 24, 26, 27, 28, 29, 30, 31, 32,
                   32, 33, 34, 34, 35, 36, 36, 37, 37)

# Mean band energies, log2 units (quant_bands.c:53-59).
EMEANS = (6.4375, 6.25, 5.75, 5.3125, 5.0625,
          4.8125, 4.5, 4.375, 4.875, 4.6875,
          4.5625, 4.4375, 4.875, 4.625, 4.3125,
          4.5, 4.375, 4.625, 4.75, 4.4375,
          3.75, 3.75, 3.75, 3.75, 3.75)

PRED_COEF = (29440 / 32768., 26112 / 32768., 21248 / 32768., 16384 / 32768.)
BETA_COEF = (30147 / 32768., 22282 / 32768., 12124 / 32768., 6554 / 32768.)
BETA_INTRA = 4915 / 32768.

SMALL_ENERGY_ICDF = (2, 1, 0)
SPREAD_ICDF = (25, 23, 2, 0)
TAPSET_ICDF = (2, 1, 0)
TRIM_ICDF = (126, 124, 119, 109, 87, 41, 19, 9, 4, 2, 0)

# celt.c:263-269
TF_SELECT_TABLE = (
    (0, -1, 0, -1, 0, -1, 0, -1),
    (0, -1, 0, -2, 1, 0, 1, -1),
    (0, -2, 0, -3, 2, 0, 1, -1),
    (0, -2, 0, -3, 3, 0, 1, -1),
)

# Coarse-energy Laplace model per (LM, intra): (p0, decay) pairs in Q8
# (quant_bands.c:77-138; RFC 6716 normative probability data).
E_PROB_MODEL = (
    ((72, 127, 65, 129, 66, 128, 65, 128, 64, 128, 62, 128, 64, 128,
      64, 128, 92, 78, 92, 79, 92, 78, 90, 79, 116, 41, 115, 40,
      114, 40, 132, 26, 132, 26, 145, 17, 161, 12, 176, 10, 177, 11),
     (24, 179, 48, 138, 54, 135, 54, 132, 53, 134, 56, 133, 55, 132,
      55, 132, 61, 114, 70, 96, 74, 88, 75, 88, 87, 74, 89, 66,
      91, 67, 100, 59, 108, 50, 120, 40, 122, 37, 97, 43, 78, 50)),
    ((83, 78, 84, 81, 88, 75, 86, 74, 87, 71, 90, 73, 93, 74,
      93, 74, 109, 40, 114, 36, 117, 34, 117, 34, 143, 17, 145, 18,
      146, 19, 162, 12, 165, 10, 178, 7, 189, 6, 190, 8, 177, 9),
     (23, 178, 54, 115, 63, 102, 66, 98, 69, 99, 74, 89, 71, 91,
      73, 91, 78, 89, 86, 80, 92, 66, 93, 64, 102, 59, 103, 60,
      104, 60, 117, 52, 123, 44, 138, 35, 133, 31, 97, 38, 77, 45)),
    ((61, 90, 93, 60, 105, 42, 107, 41, 110, 45, 116, 38, 113, 38,
      112, 38, 124, 26, 132, 27, 136, 19, 140, 20, 155, 14, 159, 16,
      158, 18, 170, 13, 177, 10, 187, 8, 192, 6, 175, 9, 159, 10),
     (21, 178, 59, 110, 71, 86, 75, 85, 84, 83, 91, 66, 88, 73,
      87, 72, 92, 75, 98, 72, 105, 58, 107, 54, 115, 52, 114, 55,
      112, 56, 129, 51, 132, 40, 150, 33, 140, 29, 98, 35, 77, 42)),
    ((42, 121, 96, 66, 108, 43, 111, 40, 117, 44, 123, 32, 120, 36,
      119, 33, 127, 33, 134, 34, 139, 21, 147, 23, 152, 20, 158, 25,
      154, 26, 166, 21, 173, 16, 184, 13, 184, 10, 150, 13, 139, 15),
     (22, 178, 63, 114, 74, 82, 84, 83, 92, 82, 103, 62, 96, 72,
      96, 67, 101, 73, 107, 72, 113, 55, 118, 52, 125, 52, 118, 52,
      117, 55, 135, 49, 137, 39, 157, 32, 145, 29, 97, 33, 77, 40)),
)


def get_pulses(i: int) -> int:
    """Pseudo-pulse index → pulse count (rate.h:49-52)."""
    return i if i < 8 else (8 + (i & 7)) << ((i >> 3) - 1)


def _fits_in32(n: int, k: int) -> bool:
    """rate.c:54-71 — conservative table, reproduced exactly because it
    shapes the pulse cache contents."""
    maxN = (32767, 32767, 32767, 1476, 283, 109, 60, 40,
            29, 24, 20, 18, 16, 14, 13)
    maxK = (32767, 32767, 32767, 32767, 1172, 238, 95, 53,
            36, 27, 22, 18, 16, 15, 13)
    if n >= 14:
        if k >= 14:
            return False
        return n <= maxN[k]
    return k <= maxK[n]


@dataclass
class CeltMode:
    fs: int
    short_mdct_size: int
    max_lm: int
    nb_ebands: int
    eff_ebands: int
    overlap: int
    e_bands: np.ndarray          # [nb_ebands+1] int16
    alloc_vectors: np.ndarray    # [BITALLOC_SIZE, nb_ebands] uint8
    log_n: np.ndarray            # [nb_ebands] int16, 1/8-bit log2 band width
    window: np.ndarray           # [overlap] float64
    preemph: float
    cache_index: np.ndarray      # [(max_lm+2) * nb_ebands] int
    cache_bits: np.ndarray       # [cache_size] uint8
    cache_caps: np.ndarray       # [(max_lm+1)*2*nb_ebands] uint8
    preemph1: float = 0.0        # 2nd preemph coef (custom modes <40k)
    preemph2: float = 1.0        # exact 1/preemph3 (input scale)
    preemph3: float = 1.0        # deemphasis gain

    @property
    def nb_alloc_vectors(self) -> int:
        return BITALLOC_SIZE

    # -- pulse cache queries (rate.h:54-88) -------------------------------

    def bits2pulses(self, band: int, lm: int, bits: int) -> int:
        lm += 1
        cache_off = self.cache_index[lm * self.nb_ebands + band]
        cache = self.cache_bits[cache_off:]
        lo, hi = 0, int(cache[0])
        bits -= 1
        for _ in range(LOG_MAX_PSEUDO):
            mid = (lo + hi + 1) >> 1
            if int(cache[mid]) >= bits:
                hi = mid
            else:
                lo = mid
        if bits - (-1 if lo == 0 else int(cache[lo])) <= int(cache[hi]) - bits:
            return lo
        return hi

    def pulses2bits(self, band: int, lm: int, pulses: int) -> int:
        lm += 1
        cache_off = self.cache_index[lm * self.nb_ebands + band]
        return 0 if pulses == 0 else int(self.cache_bits[cache_off + pulses]) + 1

    def init_caps(self, lm: int, C: int) -> np.ndarray:
        """celt.c:272-281."""
        cap = [0] * self.nb_ebands
        for i in range(self.nb_ebands):
            N = int(self.e_bands[i + 1] - self.e_bands[i]) << lm
            cap[i] = (int(self.cache_caps[self.nb_ebands * (2 * lm + C - 1) + i])
                      + 64) * C * N >> 2
        return cap


def _compute_pulse_cache(e_bands, nb_ebands, log_n, max_lm):
    """rate.c:73-242 — unique band sizes → PVQ bit-cost rows + caps."""
    LM = max_lm
    cindex = np.full(nb_ebands * (LM + 2), -1, dtype=np.int64)
    entry_n, entry_i = [], []
    curr = 0
    entries = []
    for i in range(LM + 2):
        for j in range(nb_ebands):
            N = (int(e_bands[j + 1] - e_bands[j]) << i) >> 1
            cindex[i * nb_ebands + j] = -1
            found = False
            for k in range(i + 1):
                nmax = nb_ebands if k != i else j
                for n in range(nmax):
                    if N == (int(e_bands[n + 1] - e_bands[n]) << k) >> 1:
                        cindex[i * nb_ebands + j] = cindex[k * nb_ebands + n]
                        found = True
                        break
                if found:
                    break
            if cindex[i * nb_ebands + j] == -1 and N != 0:
                K = 0
                while _fits_in32(N, get_pulses(K + 1)) and K < MAX_PSEUDO:
                    K += 1
                entries.append((N, K, curr))
                cindex[i * nb_ebands + j] = curr
                curr += K + 1

    bits = np.zeros(curr, dtype=np.int64)
    for (N, K, off) in entries:
        tmp = get_required_bits(N, get_pulses(K), BITRES)
        for j in range(1, K + 1):
            bits[off + j] = tmp[get_pulses(j)] - 1
        bits[off] = K

    # caps (rate.c:141-241)
    caps = np.zeros((LM + 1) * 2 * nb_ebands, dtype=np.int64)
    idx = 0
    for i in range(LM + 1):
        for C in (1, 2):
            for j in range(nb_ebands):
                N0 = int(e_bands[j + 1] - e_bands[j])
                if (N0 << i) == 1:
                    max_bits = C * (1 + MAX_FINE_BITS) << BITRES
                else:
                    LM0 = 0
                    if N0 > 2:
                        N0 >>= 1
                        LM0 = -1
                    elif N0 <= 1:
                        LM0 = min(i, 1)
                        N0 <<= LM0
                    pcache_off = cindex[(LM0 + 1) * nb_ebands + j]
                    pc0 = int(bits[pcache_off])
                    max_bits = int(bits[pcache_off + pc0]) + 1
                    N = N0
                    for k in range(i - LM0):
                        max_bits <<= 1
                        offset = ((int(log_n[j]) + ((LM0 + k) << BITRES)) >> 1) \
                            - QTHETA_OFFSET
                        num = 459 * ((2 * N - 1) * offset + max_bits)
                        den = ((2 * N - 1) << 9) - 459
                        qb = min((num + (den >> 1)) // den, 57)
                        assert qb >= 0
                        max_bits += qb
                        N <<= 1
                    if C == 2:
                        max_bits <<= 1
                        offset = ((int(log_n[j]) + (i << BITRES)) >> 1) - \
                            (QTHETA_OFFSET_TWOPHASE if N == 2 else QTHETA_OFFSET)
                        ndof = 2 * N - 1 - (1 if N == 2 else 0)
                        fac = 512 if N == 2 else 487
                        num = fac * (max_bits + ndof * offset)
                        den = (ndof << 9) - fac
                        qb = min((num + (den >> 1)) // den,
                                 64 if N == 2 else 61)
                        assert qb >= 0
                        max_bits += qb
                    ndof = C * N + (1 if (C == 2 and N > 2) else 0)
                    offset = ((int(log_n[j]) + (i << BITRES)) >> 1) - FINE_OFFSET
                    if N == 2:
                        offset += (1 << BITRES) >> 2
                    num = max_bits + ndof * offset
                    den = (ndof - 1) << BITRES
                    qb = min((num + (den >> 1)) // den, MAX_FINE_BITS)
                    assert qb >= 0
                    max_bits += C * qb << BITRES
                max_bits = (4 * max_bits //
                            (C * (int(e_bands[j + 1] - e_bands[j]) << i))) - 64
                assert 0 <= max_bits < 256, max_bits
                caps[idx] = max_bits
                idx += 1
    return cindex, bits, caps


# Critical band edges (modes.c:82-88)
BARK_FREQ = (0, 100, 200, 300, 400, 510, 630, 770, 920, 1080, 1270,
             1480, 1720, 2000, 2320, 2700, 3150, 3700, 4400, 5300,
             6400, 7700, 9500, 12000, 15500, 20000)
BARK_BANDS = len(BARK_FREQ) - 1


def _compute_ebands(fs: int, frame_size: int, res: int):
    """compute_ebands (modes.c:90-166) for non-standard modes."""
    n_bark = 1
    while n_bark < BARK_BANDS and BARK_FREQ[n_bark + 1] * 2 < fs:
        n_bark += 1
    lin = 0
    while lin < n_bark and BARK_FREQ[lin + 1] - BARK_FREQ[lin] < res:
        lin += 1
    low = (BARK_FREQ[lin] + res // 2) // res
    high = n_bark - lin
    nb = low + high
    e = [0] * (nb + 2)
    for i in range(low):
        e[i] = i
    offset = e[low - 1] * res - BARK_FREQ[lin - 1] if low > 0 else 0
    for i in range(high):
        target = BARK_FREQ[lin + i]
        e[i + low] = (target + offset // 2 + res) // (2 * res) * 2
        offset = e[i + low] * res - target
    for i in range(nb):
        if e[i] < i:
            e[i] = i
    e[nb] = (BARK_FREQ[n_bark] + res) // (2 * res) * 2
    if e[nb] > frame_size:
        e[nb] = frame_size
    for i in range(1, nb - 1):
        if e[i + 1] - e[i] < e[i] - e[i - 1]:
            e[i] -= (2 * e[i] - e[i - 1] - e[i + 1]) // 2
    # remove empty bands
    j = 0
    for i in range(nb):
        if e[i + 1] > e[j]:
            j += 1
            e[j] = e[i + 1]
    return np.array(e[:j + 1], dtype=np.int64)


def _interp_alloc_table(e_bands, nb_ebands, fs, short_mdct_size):
    """compute_allocation_table interpolation (modes.c:183-226)."""
    max_bands = len(EBAND5MS) - 1
    std = np.array(BAND_ALLOCATION, dtype=np.int64).reshape(
        BITALLOC_SIZE, max_bands)
    out = np.zeros((BITALLOC_SIZE, nb_ebands), dtype=np.int64)
    for i in range(BITALLOC_SIZE):
        for j in range(nb_ebands):
            freq = int(e_bands[j]) * fs // short_mdct_size
            k = 0
            while k < max_bands and 400 * EBAND5MS[k] <= freq:
                k += 1
            if k > max_bands - 1:
                out[i, j] = std[i, max_bands - 1]
            else:
                a1 = freq - 400 * EBAND5MS[k - 1]
                a0 = 400 * EBAND5MS[k] - freq
                out[i, j] = (a0 * std[i, k - 1] + a1 * std[i, k]) \
                    // (a0 + a1)
    return out


@lru_cache(maxsize=None)
def mode_create(fs: int, frame_size: int) -> CeltMode:
    """opus_custom_mode_create (modes.c:227-445): standard or custom."""
    if not 8000 <= fs <= 96000:
        raise ValueError("Fs 8000..96000")
    if not 40 <= frame_size <= 1024 or frame_size % 2:
        raise ValueError("frame_size 40..1024, even")
    if frame_size * 1000 < fs:
        raise ValueError("frames under 1 ms unsupported")
    # LM selection (modes.c:289-301)
    if frame_size * 75 >= fs and frame_size % 16 == 0:
        max_lm = 3
    elif frame_size * 150 >= fs and frame_size % 8 == 0:
        max_lm = 2
    elif frame_size * 300 >= fs and frame_size % 4 == 0:
        max_lm = 1
    else:
        max_lm = 0
    short_mdct_size = frame_size >> max_lm
    if short_mdct_size * 300 > fs:
        raise ValueError("short blocks over 3.3 ms unsupported")

    # preemphasis family (modes.c:313-343): (coef0, coef1, 1/gain, gain)
    if fs < 12000:
        pre = (0.3500061035, -0.1799926758, 0.2719968125, 3.6765136719)
    elif fs < 24000:
        pre = (0.6000061035, -0.1799926758, 0.4424998650, 2.2598876953)
    elif fs < 40000:
        pre = (0.7799987793, -0.1000061035, 0.7499771125, 1.3333740234)
    else:
        pre = (0.8500061035, 0.0, 1.0, 1.0)
    preemph, preemph1, preemph2, preemph3 = pre

    if fs == 400 * short_mdct_size:
        e_bands = np.array(EBAND5MS, dtype=np.int64)
        nb_ebands = len(EBAND5MS) - 1
        alloc_vectors = np.array(BAND_ALLOCATION, dtype=np.int64).reshape(
            BITALLOC_SIZE, nb_ebands)
    else:
        res = (fs + short_mdct_size) // (2 * short_mdct_size)
        e_bands = _compute_ebands(fs, short_mdct_size, res)
        nb_ebands = len(e_bands) - 1
        if (int(e_bands[nb_ebands]) - int(e_bands[nb_ebands - 1])) \
                << max_lm > 208:
            raise ValueError("top band too large for PVQ tables")
        alloc_vectors = _interp_alloc_table(e_bands, nb_ebands, fs,
                                            short_mdct_size)

    eff_ebands = nb_ebands
    while e_bands[eff_ebands] > short_mdct_size:
        eff_ebands -= 1

    overlap = (short_mdct_size >> 2) << 2

    log_n = np.array([log2_frac(int(e_bands[i + 1] - e_bands[i]), BITRES)
                      for i in range(nb_ebands)], dtype=np.int64)

    # Vorbis-style power-of-sine window (modes.c:377-379)
    i = np.arange(overlap, dtype=np.float64)
    inner = np.sin(0.5 * math.pi * (i + 0.5) / overlap)
    window = np.sin(0.5 * math.pi * inner * inner)

    cache_index, cache_bits, cache_caps = _compute_pulse_cache(
        e_bands, nb_ebands, log_n, max_lm)

    return CeltMode(
        fs=fs, short_mdct_size=short_mdct_size, max_lm=max_lm,
        nb_ebands=nb_ebands, eff_ebands=eff_ebands, overlap=overlap,
        e_bands=e_bands, alloc_vectors=alloc_vectors, log_n=log_n,
        window=window, preemph=preemph, cache_index=cache_index,
        cache_bits=cache_bits, cache_caps=cache_caps,
        preemph1=preemph1, preemph2=preemph2, preemph3=preemph3)


def standard_mode(fs: int = 48000, frame_size: int = 960) -> CeltMode:
    """Build the (cached) standard Opus CELT mode."""
    return mode_create(fs, frame_size)
