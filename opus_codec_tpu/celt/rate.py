"""CELT bit allocation: deterministic integer machinery shared by encoder
and decoder.

Behavioural parity: /root/reference/opus/celt/rate.c
(interp_bits2pulses :248, clt_compute_allocation :534). This must be
*exactly* right — both sides derive the identical allocation from the coded
skip/intensity/dual-stereo symbols, or the stream is undecodable.

All quantities are integer 1/8th-bit units (BITRES=3). The routine is
host-side scalar per frame; the batched planner calls it per (stream, frame)
— it is pure integer logic with a handful of range-coder symbols interleaved.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .modes import BITRES, CeltMode, LOG2_FRAC_TABLE, MAX_FINE_BITS

__all__ = ["Allocation", "compute_allocation"]

ALLOC_STEPS = 6
FINE_OFFSET = 21


@dataclass
class Allocation:
    coded_bands: int
    balance: int
    pulses: List[int]        # PVQ bits (1/8 bit) per band
    ebits: List[int]         # fine energy bits per band
    fine_priority: List[int]
    intensity: int
    dual_stereo: int


def _interp_bits2pulses(m: CeltMode, start, end, skip_start, bits1, bits2,
                        thresh, cap, total, skip_rsv, intensity,
                        intensity_rsv, dual_stereo, dual_stereo_rsv,
                        C, LM, ec, encode, prev, signal_bandwidth):
    """rate.c:248-532."""
    nb = m.nb_ebands
    e_bands = m.e_bands
    alloc_floor = C << BITRES
    stereo = 1 if C > 1 else 0
    logM = LM << BITRES

    lo, hi = 0, 1 << ALLOC_STEPS
    for _ in range(ALLOC_STEPS):
        mid = (lo + hi) >> 1
        psum = 0
        done = False
        for j in range(end - 1, start - 1, -1):
            tmp = bits1[j] + ((mid * bits2[j]) >> ALLOC_STEPS)
            if tmp >= thresh[j] or done:
                done = True
                psum += min(tmp, cap[j])
            elif tmp >= alloc_floor:
                psum += alloc_floor
        if psum > total:
            hi = mid
        else:
            lo = mid
    psum = 0
    done = False
    bits = [0] * nb
    for j in range(end - 1, start - 1, -1):
        tmp = bits1[j] + ((lo * bits2[j]) >> ALLOC_STEPS)
        if tmp < thresh[j] and not done:
            tmp = alloc_floor if tmp >= alloc_floor else 0
        else:
            done = True
        tmp = min(tmp, cap[j])
        bits[j] = tmp
        psum += tmp

    # Skip decisions, back to front (rate.c:314-391)
    coded_bands = end
    while True:
        j = coded_bands - 1
        if j <= skip_start:
            total += skip_rsv
            break
        left = total - psum
        percoeff = left // int(e_bands[coded_bands] - e_bands[start])
        left -= int(e_bands[coded_bands] - e_bands[start]) * percoeff
        rem = max(left - int(e_bands[j] - e_bands[start]), 0)
        band_width = int(e_bands[coded_bands] - e_bands[j])
        band_bits = bits[j] + percoeff * band_width + rem
        if band_bits >= max(thresh[j], alloc_floor + (1 << BITRES)):
            if encode:
                if coded_bands > 17:
                    depth_threshold = 7 if j < prev else 9
                else:
                    depth_threshold = 0
                if (coded_bands <= start + 2
                        or (band_bits > ((depth_threshold * band_width
                                          << LM << BITRES) >> 4)
                            and j <= signal_bandwidth)):
                    ec.enc_bit_logp(1, 1)
                    break
                ec.enc_bit_logp(0, 1)
            elif ec.dec_bit_logp(1):
                break
            psum += 1 << BITRES
            band_bits -= 1 << BITRES
        psum -= bits[j] + intensity_rsv
        if intensity_rsv > 0:
            intensity_rsv = LOG2_FRAC_TABLE[j - start]
        psum += intensity_rsv
        if band_bits >= alloc_floor:
            psum += alloc_floor
            bits[j] = alloc_floor
        else:
            bits[j] = 0
        coded_bands -= 1

    assert coded_bands > start
    # Intensity / dual stereo symbols (rate.c:394-420)
    if intensity_rsv > 0:
        if encode:
            intensity = min(intensity, coded_bands)
            ec.enc_uint(intensity - start, coded_bands + 1 - start)
        else:
            intensity = start + ec.dec_uint(coded_bands + 1 - start)
    else:
        intensity = 0
    if intensity <= start:
        total += dual_stereo_rsv
        dual_stereo_rsv = 0
    if dual_stereo_rsv > 0:
        if encode:
            ec.enc_bit_logp(dual_stereo, 1)
        else:
            dual_stereo = ec.dec_bit_logp(1)
    else:
        dual_stereo = 0

    # Final distribution (rate.c:422-433)
    left = total - psum
    percoeff = left // int(e_bands[coded_bands] - e_bands[start])
    left -= int(e_bands[coded_bands] - e_bands[start]) * percoeff
    for j in range(start, coded_bands):
        bits[j] += percoeff * int(e_bands[j + 1] - e_bands[j])
    for j in range(start, coded_bands):
        tmp = min(left, int(e_bands[j + 1] - e_bands[j]))
        bits[j] += tmp
        left -= tmp

    ebits = [0] * nb
    fine_priority = [0] * nb
    balance = 0
    for j in range(start, coded_bands):
        N0 = int(e_bands[j + 1] - e_bands[j])
        N = N0 << LM
        bit = bits[j] + balance
        if N > 1:
            excess = max(bit - cap[j], 0)
            bits[j] = bit - excess
            den = C * N + (1 if (C == 2 and N > 2 and not dual_stereo
                                 and j < intensity) else 0)
            NClogN = den * (int(m.log_n[j]) + logM)
            offset = (NClogN >> 1) - den * FINE_OFFSET
            if N == 2:
                offset += den << BITRES >> 2
            if bits[j] + offset < (den * 2) << BITRES:
                offset += NClogN >> 2
            elif bits[j] + offset < (den * 3) << BITRES:
                offset += NClogN >> 3
            eb = max(0, bits[j] + offset + (den << (BITRES - 1)))
            eb = (eb // den) >> BITRES
            if C * eb > (bits[j] >> BITRES):
                eb = bits[j] >> stereo >> BITRES
            eb = min(eb, MAX_FINE_BITS)
            ebits[j] = eb
            fine_priority[j] = 1 if eb * (den << BITRES) >= bits[j] + offset else 0
            bits[j] -= C * eb << BITRES
        else:
            excess = max(0, bit - (C << BITRES))
            bits[j] = bit - excess
            ebits[j] = 0
            fine_priority[j] = 1
        if excess > 0:
            extra_fine = min(excess >> (stereo + BITRES),
                             MAX_FINE_BITS - ebits[j])
            ebits[j] += extra_fine
            extra_bits = extra_fine * C << BITRES
            fine_priority[j] = 1 if extra_bits >= excess - balance else 0
            excess -= extra_bits
        balance = excess
        assert bits[j] >= 0 and ebits[j] >= 0

    # Skipped bands get all bits as fine energy (rate.c:522-529)
    for j in range(coded_bands, end):
        ebits[j] = bits[j] >> stereo >> BITRES
        assert (C * ebits[j]) << BITRES == bits[j]
        bits[j] = 0
        fine_priority[j] = 1 if ebits[j] < 1 else 0

    return Allocation(coded_bands=coded_bands, balance=balance, pulses=bits,
                      ebits=ebits, fine_priority=fine_priority,
                      intensity=intensity, dual_stereo=dual_stereo)


def compute_allocation(m: CeltMode, start: int, end: int, offsets, cap,
                       alloc_trim: int, intensity: int, dual_stereo: int,
                       total: int, C: int, LM: int, ec, encode: bool,
                       prev: int = 0, signal_bandwidth: int = 0) -> Allocation:
    """rate.c:534-645. ``total`` in 1/8th-bit units."""
    total = max(total, 0)
    nb = m.nb_ebands
    e_bands = m.e_bands
    skip_start = start
    skip_rsv = (1 << BITRES) if total >= (1 << BITRES) else 0
    total -= skip_rsv
    intensity_rsv = dual_stereo_rsv = 0
    if C == 2:
        intensity_rsv = LOG2_FRAC_TABLE[end - start]
        if intensity_rsv > total:
            intensity_rsv = 0
        else:
            total -= intensity_rsv
            dual_stereo_rsv = (1 << BITRES) if total >= (1 << BITRES) else 0
            total -= dual_stereo_rsv

    thresh = [0] * nb
    trim_offset = [0] * nb
    for j in range(start, end):
        width = int(e_bands[j + 1] - e_bands[j])
        thresh[j] = max(C << BITRES, (3 * width << LM << BITRES) >> 4)
        trim_offset[j] = (C * width * (alloc_trim - 5 - LM) * (end - j - 1)
                          * (1 << (LM + BITRES))) >> 6
        if (width << LM) == 1:
            trim_offset[j] -= C << BITRES

    lo, hi = 1, m.nb_alloc_vectors - 1
    while lo <= hi:
        done = False
        psum = 0
        mid = (lo + hi) >> 1
        for j in range(end - 1, start - 1, -1):
            N = int(e_bands[j + 1] - e_bands[j])
            bitsj = (C * N * int(m.alloc_vectors[mid, j]) << LM) >> 2
            if bitsj > 0:
                bitsj = max(0, bitsj + trim_offset[j])
            bitsj += offsets[j]
            if bitsj >= thresh[j] or done:
                done = True
                psum += min(bitsj, cap[j])
            elif bitsj >= C << BITRES:
                psum += C << BITRES
        if psum > total:
            hi = mid - 1
        else:
            lo = mid + 1
    hi = lo
    lo -= 1

    bits1 = [0] * nb
    bits2 = [0] * nb
    for j in range(start, end):
        N = int(e_bands[j + 1] - e_bands[j])
        bits1j = (C * N * int(m.alloc_vectors[lo, j]) << LM) >> 2
        bits2j = cap[j] if hi >= m.nb_alloc_vectors else \
            (C * N * int(m.alloc_vectors[hi, j]) << LM) >> 2
        if bits1j > 0:
            bits1j = max(0, bits1j + trim_offset[j])
        if bits2j > 0:
            bits2j = max(0, bits2j + trim_offset[j])
        if lo > 0:
            bits1j += offsets[j]
        bits2j += offsets[j]
        if offsets[j] > 0:
            skip_start = j
        bits2j = max(0, bits2j - bits1j)
        bits1[j] = bits1j
        bits2[j] = bits2j

    return _interp_bits2pulses(m, start, end, skip_start, bits1, bits2,
                               thresh, cap, total, skip_rsv, intensity,
                               intensity_rsv, dual_stereo, dual_stereo_rsv,
                               C, LM, ec, encode, prev, signal_bandwidth)
