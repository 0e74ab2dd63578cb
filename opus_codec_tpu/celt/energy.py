"""Coarse/fine band-energy quantization.

Behavioural parity: /root/reference/opus/celt/quant_bands.c
(quant_coarse_energy :261, quant_fine_energy :361, quant_energy_finalise
:398 and the unquant_* mirrors :428-542, amp2Log2 :544). Float build.
"""

from __future__ import annotations

import copy
import math
from typing import List

import numpy as np

from ..bitstream.laplace import laplace_decode, laplace_encode
from .modes import (BETA_COEF, BETA_INTRA, CeltMode, E_PROB_MODEL, EMEANS,
                    MAX_FINE_BITS, PRED_COEF, SMALL_ENERGY_ICDF)

__all__ = ["quant_coarse_energy", "quant_fine_energy",
           "quant_energy_finalise", "unquant_coarse_energy",
           "unquant_fine_energy", "unquant_energy_finalise", "amp2_log2"]


def amp2_log2(m: CeltMode, eff_end: int, end: int, bandE: np.ndarray
              ) -> np.ndarray:
    """quant_bands.c:544-563. bandE: [C, nbEBands] amplitudes."""
    C = bandE.shape[0]
    bandLogE = np.empty_like(bandE)
    for c in range(C):
        for i in range(eff_end):
            bandLogE[c, i] = math.log2(bandE[c, i]) - EMEANS[i]
        for i in range(eff_end, end):
            bandLogE[c, i] = -14.0
    return bandLogE


def _loss_distortion(eBands, oldEBands, start, end, nbEBands, C):
    """quant_bands.c:142-154 (float)."""
    dist = 0.0
    for c in range(C):
        for i in range(start, end):
            d = eBands[c, i] - oldEBands[c, i]
            dist += d * d
    return min(200.0, dist)


def _quant_coarse_impl(m, start, end, eBands, oldEBands, budget, tell,
                       prob_model, error, enc, C, LM, intra, max_decay, lfe):
    """quant_bands.c:156-259 (float)."""
    badness = 0
    prev = [0.0, 0.0]
    if tell + 3 <= budget:
        enc.enc_bit_logp(intra, 3)
    if intra:
        coef = 0.0
        beta = BETA_INTRA
    else:
        beta = BETA_COEF[LM]
        coef = PRED_COEF[LM]
    for i in range(start, end):
        for c in range(C):
            x = eBands[c, i]
            oldE = max(-9.0, oldEBands[c, i])
            f = x - coef * oldE - prev[c]
            qi = int(math.floor(0.5 + f))
            decay_bound = max(-28.0, oldEBands[c, i]) - max_decay
            if qi < 0 and x < decay_bound:
                qi += int(decay_bound - x)
                if qi > 0:
                    qi = 0
            qi0 = qi
            tell = enc.tell()
            bits_left = budget - tell - 3 * C * (end - i)
            if i != start and bits_left < 30:
                if bits_left < 24:
                    qi = min(1, qi)
                if bits_left < 16:
                    qi = max(-1, qi)
            if lfe and i >= 2:
                qi = min(qi, 0)
            if budget - tell >= 15:
                pi = 2 * min(i, 20)
                qi = laplace_encode(enc, qi, prob_model[pi] << 7,
                                    prob_model[pi + 1] << 6)
            elif budget - tell >= 2:
                qi = max(-1, min(qi, 1))
                enc.enc_icdf((2 * qi) ^ (-1 if qi < 0 else 0),
                             SMALL_ENERGY_ICDF, 2)
            elif budget - tell >= 1:
                qi = min(0, qi)
                enc.enc_bit_logp(-qi, 1)
            else:
                qi = -1
            error[c, i] = f - qi
            badness += abs(qi0 - qi)
            q = float(qi)
            tmp = coef * oldE + prev[c] + q
            oldEBands[c, i] = tmp
            prev[c] = prev[c] + q - beta * q
    return 0 if lfe else badness


def quant_coarse_energy(m: CeltMode, start, end, eff_end, eBands, oldEBands,
                        budget, error, enc, C, LM, nb_available_bytes,
                        force_intra, delayed_intra, two_pass, loss_rate,
                        lfe):
    """quant_bands.c:261-359. oldEBands/error: [C, nbEBands] arrays updated
    in place; returns (intra_used, new_delayed_intra)."""
    intra = force_intra or (not two_pass and
                            delayed_intra > 2 * C * (end - start) and
                            nb_available_bytes > (end - start) * C)
    intra_bias = int(budget * delayed_intra * loss_rate / (C * 512))
    new_distortion = _loss_distortion(eBands, oldEBands, start, eff_end,
                                      m.nb_ebands, C)
    tell = enc.tell()
    if tell + 3 > budget:
        two_pass = intra = 0
    max_decay = 16.0
    if end - start > 10:
        max_decay = min(max_decay, 0.125 * nb_available_bytes)
    if lfe:
        max_decay = 3.0
    enc_start_state = copy.deepcopy(enc)

    oldEBands_intra = oldEBands.copy()
    error_intra = np.zeros_like(error)
    badness1 = 0
    if two_pass or intra:
        badness1 = _quant_coarse_impl(m, start, end, eBands, oldEBands_intra,
                                      budget, tell, E_PROB_MODEL[LM][1],
                                      error_intra, enc, C, LM, 1, max_decay,
                                      lfe)
    if not intra:
        enc_intra_state = copy.deepcopy(enc)
        tell_intra = enc.tell_frac()
        nstart_bytes = enc_start_state.range_bytes()
        nintra_bytes = enc_intra_state.range_bytes()
        intra_bits = bytes(enc_intra_state.buf[nstart_bytes:nintra_bytes])
        # restore pre-intra state
        _copy_coder(enc, enc_start_state)
        badness2 = _quant_coarse_impl(m, start, end, eBands, oldEBands,
                                      budget, tell, E_PROB_MODEL[LM][0],
                                      error, enc, C, LM, 0, max_decay, lfe)
        if two_pass and (badness1 < badness2 or
                         (badness1 == badness2 and
                          enc.tell_frac() + intra_bias > tell_intra)):
            _copy_coder(enc, enc_intra_state)
            enc.buf[nstart_bytes:nintra_bytes] = intra_bits
            oldEBands[:] = oldEBands_intra
            error[:] = error_intra
            intra = 1
    else:
        oldEBands[:] = oldEBands_intra
        error[:] = error_intra

    if intra:
        delayed_intra = new_distortion
    else:
        delayed_intra = (PRED_COEF[LM] * PRED_COEF[LM] * delayed_intra
                         + new_distortion)
    return intra, delayed_intra


def _copy_coder(dst, src):
    dst.buf = bytearray(src.buf)
    for f in ("storage", "end_offs", "end_window", "nend_bits",
              "nbits_total", "offs", "rng", "val", "ext", "rem", "error"):
        setattr(dst, f, getattr(src, f))


def quant_fine_energy(m, start, end, oldEBands, error, fine_quant, enc, C):
    """quant_bands.c:361-396."""
    for i in range(start, end):
        if fine_quant[i] <= 0:
            continue
        frac = 1 << fine_quant[i]
        for c in range(C):
            q2 = int(math.floor((error[c, i] + 0.5) * frac))
            q2 = min(q2, frac - 1)
            q2 = max(q2, 0)
            enc.enc_bits(q2, fine_quant[i])
            offset = (q2 + 0.5) * (1 << (14 - fine_quant[i])) / 16384.0 - 0.5
            oldEBands[c, i] += offset
            error[c, i] -= offset


def quant_energy_finalise(m, start, end, oldEBands, error, fine_quant,
                          fine_priority, bits_left, enc, C):
    """quant_bands.c:398-426."""
    for prio in range(2):
        for i in range(start, end):
            if bits_left < C:
                break
            if fine_quant[i] >= MAX_FINE_BITS or fine_priority[i] != prio:
                continue
            for c in range(C):
                q2 = 0 if error[c, i] < 0 else 1
                enc.enc_bits(q2, 1)
                offset = (q2 - 0.5) * (1 << (14 - fine_quant[i] - 1)) / 16384.0
                oldEBands[c, i] += offset
                error[c, i] -= offset
                bits_left -= 1


def unquant_coarse_energy(m: CeltMode, start, end, oldEBands, intra, dec, C,
                          LM):
    """quant_bands.c:428-491. oldEBands: [2, nbEBands] updated in place."""
    prob_model = E_PROB_MODEL[LM][1 if intra else 0]
    prev = [0.0, 0.0]
    if intra:
        coef = 0.0
        beta = BETA_INTRA
    else:
        beta = BETA_COEF[LM]
        coef = PRED_COEF[LM]
    budget = dec.storage * 8
    for i in range(start, end):
        for c in range(C):
            tell = dec.tell()
            if budget - tell >= 15:
                pi = 2 * min(i, 20)
                qi = laplace_decode(dec, prob_model[pi] << 7,
                                    prob_model[pi + 1] << 6)
            elif budget - tell >= 2:
                qi = dec.dec_icdf(SMALL_ENERGY_ICDF, 2)
                qi = (qi >> 1) ^ -(qi & 1)
            elif budget - tell >= 1:
                qi = -dec.dec_bit_logp(1)
            else:
                qi = -1
            q = float(qi)
            oldEBands[c, i] = max(-9.0, oldEBands[c, i])
            tmp = coef * oldEBands[c, i] + prev[c] + q
            oldEBands[c, i] = tmp
            prev[c] = prev[c] + q - beta * q


def unquant_fine_energy(m, start, end, oldEBands, fine_quant, dec, C):
    """quant_bands.c:493-514."""
    for i in range(start, end):
        if fine_quant[i] <= 0:
            continue
        for c in range(C):
            q2 = dec.dec_bits(fine_quant[i])
            offset = (q2 + 0.5) * (1 << (14 - fine_quant[i])) / 16384.0 - 0.5
            oldEBands[c, i] += offset


def unquant_energy_finalise(m, start, end, oldEBands, fine_quant,
                            fine_priority, bits_left, dec, C):
    """quant_bands.c:516-542."""
    for prio in range(2):
        for i in range(start, end):
            if bits_left < C:
                break
            if fine_quant[i] >= MAX_FINE_BITS or fine_priority[i] != prio:
                continue
            for c in range(C):
                q2 = dec.dec_bits(1)
                offset = (q2 - 0.5) * (1 << (14 - fine_quant[i] - 1)) / 16384.0
                oldEBands[c, i] += offset
                bits_left -= 1
