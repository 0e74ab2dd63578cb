"""CELT encoder: full analysis + quantization pipeline.

Behavioural parity: /root/reference/opus/celt/celt_encoder.c
(celt_encode_with_ec :1431, transient_analysis :227, tf_analysis :595,
dynalloc_analysis :981, run_prefilter :1188, compute_vbr :1320,
alloc_trim_analysis :797, stereo_analysis :889, compute_mdcts :461,
celt_preemphasis :507, patch_transient_decision :423). Float build.

Host scalar reference implementation; the batched TPU analysis path lifts
the MDCT/energy/pitch-xcorr stages as [B, ...] jnp programs feeding the same
integer planning code.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from ..bitstream.range_coder import RangeEncoder, ec_ilog
from ..errors import OpusError
from . import bands as B_
from . import energy as E_
from .decoder import (COMBFILTER_MAXPERIOD, COMBFILTER_MINPERIOD,
                      comb_filter, resampling_factor)
from .mdct import mdct_forward
from .modes import (BITRES, CeltMode, SPREAD_AGGRESSIVE, SPREAD_ICDF,
                    SPREAD_NONE, SPREAD_NORMAL, TAPSET_ICDF,
                    TF_SELECT_TABLE, TRIM_ICDF, standard_mode)
from .pitch import pitch_downsample, pitch_search, remove_doubling
from .rate import compute_allocation

__all__ = ["CeltEncoder"]

CELT_SIG_SCALE = 32768.0
OPUS_BITRATE_MAX = -1

# transient_analysis inverse table (celt_encoder.c:246-255)
_INV_TABLE = (
    255, 255, 156, 110, 86, 70, 59, 51, 45, 40, 37, 33, 31, 28, 26, 25,
    23, 22, 21, 20, 19, 18, 17, 16, 16, 15, 15, 14, 13, 13, 12, 12,
    12, 12, 11, 11, 11, 10, 10, 10, 9, 9, 9, 9, 9, 9, 8, 8,
    8, 8, 8, 7, 7, 7, 7, 7, 7, 6, 6, 6, 6, 6, 6, 6,
    6, 6, 6, 6, 6, 6, 6, 6, 6, 5, 5, 5, 5, 5, 5, 5,
    5, 5, 5, 5, 5, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 2,
)


def transient_analysis(x: np.ndarray, length: int, C: int,
                       allow_weak_transients: bool):
    """celt_encoder.c:227-419 (float). x: [C, length].
    Returns (is_transient, tf_estimate, tf_chan, weak_transient)."""
    forward_decay = 0.03125 if allow_weak_transients else 0.0625
    len2 = length // 2
    mask_metric = 0
    tf_chan = 0
    weak_transient = False
    for c in range(C):
        tmp = np.zeros(length)
        mem0 = mem1 = 0.0
        for i in range(length):
            xi = x[c, i]
            y = mem0 + xi
            mem00 = mem0
            mem0 = mem0 - xi + 0.5 * mem1
            mem1 = xi - mem00
            tmp[i] = y
        tmp[:12] = 0.0
        mean = 0.0
        mem0 = 0.0
        # forward masking pass
        for i in range(len2):
            x2 = tmp[2 * i] * tmp[2 * i] + tmp[2 * i + 1] * tmp[2 * i + 1]
            mean += x2
            mem0 = x2 + (1.0 - forward_decay) * mem0
            tmp[i] = forward_decay * mem0
        # backward masking pass
        mem0 = 0.0
        maxE = 0.0
        for i in range(len2 - 1, -1, -1):
            mem0 = tmp[i] + 0.875 * mem0
            tmp[i] = 0.125 * mem0
            maxE = max(maxE, 0.125 * mem0)
        mean = math.sqrt(mean * maxE * 0.5 * len2)
        norm = len2 / (1e-15 + mean / 2.0)
        unmask = 0
        for i in range(12, len2 - 5, 4):
            idx = int(max(0, min(127, math.floor(
                64 * norm * (tmp[i] + 1e-15)))))
            unmask += _INV_TABLE[idx]
        unmask = 64 * unmask * 4 // (6 * (len2 - 17))
        if unmask > mask_metric:
            tf_chan = c
            mask_metric = unmask
    is_transient = mask_metric > 200
    if allow_weak_transients and is_transient and mask_metric < 600:
        is_transient = False
        weak_transient = True
    tf_max = max(0.0, math.sqrt(27 * mask_metric) - 42)
    tf_estimate = math.sqrt(max(0.0, 0.0069 * min(163.0, tf_max) - 0.139))
    return is_transient, tf_estimate, tf_chan, weak_transient


def patch_transient_decision(newE, oldE, nb, start, end, C):
    """celt_encoder.c:423-457."""
    spread_old = np.zeros(26)
    if C == 1:
        spread_old[start] = oldE[0, start]
        for i in range(start + 1, end):
            spread_old[i] = max(spread_old[i - 1] - 1.0, oldE[0, i])
    else:
        spread_old[start] = max(oldE[0, start], oldE[1, start])
        for i in range(start + 1, end):
            spread_old[i] = max(spread_old[i - 1] - 1.0,
                                max(oldE[0, i], oldE[1, i]))
    for i in range(end - 2, start - 1, -1):
        spread_old[i] = max(spread_old[i], spread_old[i + 1] - 1.0)
    mean_diff = 0.0
    for c in range(C):
        for i in range(max(2, start), end - 1):
            x1 = max(0.0, newE[c, i])
            x2 = max(0.0, spread_old[i])
            mean_diff += max(0.0, x1 - x2)
    mean_diff /= C * (end - 1 - max(2, start))
    return mean_diff > 1.0


def _l1_metric(tmp, N, LM, bias):
    L1 = float(np.abs(tmp[:N]).sum())
    return L1 + LM * bias * L1


def tf_analysis(m: CeltMode, length, isTransient, tf_res, lam, X, N0, LM,
                tf_estimate, tf_chan, importance):
    """celt_encoder.c:595-754 (float)."""
    bias = 0.04 * max(-0.25, 0.5 - tf_estimate)
    metric = [0] * length
    for i in range(length):
        N = int(m.e_bands[i + 1] - m.e_bands[i]) << LM
        narrow = int(m.e_bands[i + 1] - m.e_bands[i]) == 1
        base = tf_chan * N0 + (int(m.e_bands[i]) << LM)
        tmp = [X[base + j] for j in range(N)]
        L1 = _l1_metric(tmp, N, LM if isTransient else 0, bias)
        best_L1 = L1
        best_level = 0
        if isTransient and not narrow:
            tmp_1 = list(tmp)
            B_.haar1(tmp_1, 0, N >> LM, 1 << LM)
            L1 = _l1_metric(tmp_1, N, LM + 1, bias)
            if L1 < best_L1:
                best_L1 = L1
                best_level = -1
        for k in range(LM + (0 if (isTransient or narrow) else 1)):
            Bv = (LM - k - 1) if isTransient else (k + 1)
            B_.haar1(tmp, 0, N >> k, 1 << k)
            L1 = _l1_metric(tmp, N, Bv, bias)
            if L1 < best_L1:
                best_L1 = L1
                best_level = k + 1
        metric[i] = 2 * best_level if isTransient else -2 * best_level
        if narrow and (metric[i] == 0 or metric[i] == -2 * LM):
            metric[i] -= 1

    ist = 1 if isTransient else 0
    tf_select = 0
    selcost = [0, 0]
    for sel in range(2):
        cost0 = importance[0] * abs(
            metric[0] - 2 * TF_SELECT_TABLE[LM][4 * ist + 2 * sel + 0])
        cost1 = importance[0] * abs(
            metric[0] - 2 * TF_SELECT_TABLE[LM][4 * ist + 2 * sel + 1]) \
            + (0 if isTransient else lam)
        for i in range(1, length):
            curr0 = min(cost0, cost1 + lam)
            curr1 = min(cost0 + lam, cost1)
            cost0 = curr0 + importance[i] * abs(
                metric[i] - 2 * TF_SELECT_TABLE[LM][4 * ist + 2 * sel + 0])
            cost1 = curr1 + importance[i] * abs(
                metric[i] - 2 * TF_SELECT_TABLE[LM][4 * ist + 2 * sel + 1])
        selcost[sel] = min(cost0, cost1)
    if selcost[1] < selcost[0] and isTransient:
        tf_select = 1
    path0 = [0] * length
    path1 = [0] * length
    cost0 = importance[0] * abs(
        metric[0] - 2 * TF_SELECT_TABLE[LM][4 * ist + 2 * tf_select + 0])
    cost1 = importance[0] * abs(
        metric[0] - 2 * TF_SELECT_TABLE[LM][4 * ist + 2 * tf_select + 1]) \
        + (0 if isTransient else lam)
    for i in range(1, length):
        from0 = cost0
        from1 = cost1 + lam
        if from0 < from1:
            curr0 = from0
            path0[i] = 0
        else:
            curr0 = from1
            path0[i] = 1
        from0 = cost0 + lam
        from1 = cost1
        if from0 < from1:
            curr1 = from0
            path1[i] = 0
        else:
            curr1 = from1
            path1[i] = 1
        cost0 = curr0 + importance[i] * abs(
            metric[i] - 2 * TF_SELECT_TABLE[LM][4 * ist + 2 * tf_select + 0])
        cost1 = curr1 + importance[i] * abs(
            metric[i] - 2 * TF_SELECT_TABLE[LM][4 * ist + 2 * tf_select + 1])
    tf_res[length - 1] = 0 if cost0 < cost1 else 1
    for i in range(length - 2, -1, -1):
        if tf_res[i + 1] == 1:
            tf_res[i] = path1[i + 1]
        else:
            tf_res[i] = path0[i + 1]
    return tf_select


def tf_encode(start, end, isTransient, tf_res, LM, tf_select, enc):
    """celt_encoder.c:756-794."""
    budget = enc.storage * 8
    tell = enc.tell()
    logp = 2 if isTransient else 4
    tf_select_rsv = 1 if (LM > 0 and tell + logp + 1 <= budget) else 0
    budget -= tf_select_rsv
    curr = tf_changed = 0
    ist = 1 if isTransient else 0
    for i in range(start, end):
        if tell + logp <= budget:
            enc.enc_bit_logp(tf_res[i] ^ curr, logp)
            tell = enc.tell()
            curr = tf_res[i]
            tf_changed |= curr
        else:
            tf_res[i] = curr
        logp = 4 if isTransient else 5
    if tf_select_rsv and \
            TF_SELECT_TABLE[LM][4 * ist + 0 + tf_changed] != \
            TF_SELECT_TABLE[LM][4 * ist + 2 + tf_changed]:
        enc.enc_bit_logp(tf_select, 1)
    else:
        tf_select = 0
    for i in range(start, end):
        tf_res[i] = TF_SELECT_TABLE[LM][4 * ist + 2 * tf_select + tf_res[i]]


def _median_of_5(x) -> float:
    """celt_encoder.c:922-959."""
    t2 = x[2]
    if x[0] > x[1]:
        t0, t1 = x[1], x[0]
    else:
        t0, t1 = x[0], x[1]
    if x[3] > x[4]:
        t3, t4 = x[4], x[3]
    else:
        t3, t4 = x[3], x[4]
    if t0 > t3:
        t0, t3 = t3, t0
        t1, t4 = t4, t1
    if t2 > t1:
        if t1 < t3:
            return min(t2, t3)
        return min(t4, t1)
    else:
        if t2 < t3:
            return min(t1, t3)
        return min(t2, t4)


def _median_of_3(x) -> float:
    if x[0] > x[1]:
        t0, t1 = x[1], x[0]
    else:
        t0, t1 = x[0], x[1]
    t2 = x[2]
    if t1 < t2:
        return t1
    elif t0 < t2:
        return t2
    return t0


def dynalloc_analysis(bandLogE, bandLogE2, oldBandE, nb, start, end, C,
                      offsets, lsb_depth, log_n, isTransient, vbr,
                      constrained_vbr, e_bands, LM, effectiveBytes,
                      lfe, surround_dynalloc, importance, spread_weight):
    """celt_encoder.c:981-1185 (float). Returns (maxDepth, tot_boost)."""
    tot_boost = 0
    maxDepth = -31.9
    noise_floor = np.zeros(nb)
    for i in range(end):
        noise_floor[i] = (0.0625 * float(log_n[i]) + 0.5
                          + (9 - lsb_depth) - E_.EMEANS[i]
                          + 0.0062 * (i + 5) * (i + 5))
    for c in range(C):
        for i in range(end):
            maxDepth = max(maxDepth, bandLogE[c, i] - noise_floor[i])
    # spreading weights from a simple masking model
    mask = np.zeros(nb)
    for i in range(end):
        mask[i] = bandLogE[0, i] - noise_floor[i]
    if C == 2:
        for i in range(end):
            mask[i] = max(mask[i], bandLogE[1, i] - noise_floor[i])
    sig = mask[:end].copy()
    for i in range(1, end):
        mask[i] = max(mask[i], mask[i - 1] - 2.0)
    for i in range(end - 2, -1, -1):
        mask[i] = max(mask[i], mask[i + 1] - 3.0)
    for i in range(end):
        smr = sig[i] - max(max(0.0, maxDepth - 12.0), mask[i])
        shift = min(5, max(0, -int(math.floor(0.5 + smr))))
        spread_weight[i] = 32 >> shift

    if effectiveBytes >= 30 + 5 * LM and not lfe:
        follower = np.zeros((2, nb))
        last = 0
        for c in range(C):
            bandLogE3 = bandLogE2[c, :end].copy()
            if LM == 0:
                for i in range(min(8, end)):
                    bandLogE3[i] = max(bandLogE2[c, i], oldBandE[c, i])
            f = follower[c]
            f[0] = bandLogE3[0]
            for i in range(1, end):
                if bandLogE3[i] > bandLogE3[i - 1] + 0.5:
                    last = i
                f[i] = min(f[i - 1] + 1.5, bandLogE3[i])
            for i in range(last - 1, -1, -1):
                f[i] = min(f[i], min(f[i + 1] + 2.0, bandLogE3[i]))
            offset = 1.0
            for i in range(2, end - 2):
                f[i] = max(f[i], _median_of_5(bandLogE3[i - 2:i + 3]) - offset)
            tmp = _median_of_3(bandLogE3[0:3]) - offset
            f[0] = max(f[0], tmp)
            f[1] = max(f[1], tmp)
            tmp = _median_of_3(bandLogE3[end - 3:end]) - offset
            f[end - 2] = max(f[end - 2], tmp)
            f[end - 1] = max(f[end - 1], tmp)
            for i in range(end):
                f[i] = max(f[i], noise_floor[i])
        if C == 2:
            for i in range(start, end):
                follower[1, i] = max(follower[1, i], follower[0, i] - 4.0)
                follower[0, i] = max(follower[0, i], follower[1, i] - 4.0)
                follower[0, i] = 0.5 * (
                    max(0.0, bandLogE[0, i] - follower[0, i])
                    + max(0.0, bandLogE[1, i] - follower[1, i]))
        else:
            for i in range(start, end):
                follower[0, i] = max(0.0, bandLogE[0, i] - follower[0, i])
        for i in range(start, end):
            follower[0, i] = max(follower[0, i], surround_dynalloc[i])
        for i in range(start, end):
            importance[i] = int(math.floor(
                0.5 + 13 * math.exp2(min(follower[0, i], 4.0))))
        if (not vbr or constrained_vbr) and not isTransient:
            for i in range(start, end):
                follower[0, i] = 0.5 * follower[0, i]
        for i in range(start, end):
            if i < 8:
                follower[0, i] *= 2
            if i >= 12:
                follower[0, i] = 0.5 * follower[0, i]
        for i in range(start, end):
            follower[0, i] = min(follower[0, i], 4.0)
            width = C * int(e_bands[i + 1] - e_bands[i]) << LM
            if width < 6:
                boost = int(follower[0, i])
                boost_bits = boost * width << BITRES
            elif width > 48:
                boost = int(follower[0, i] * 8)
                boost_bits = (boost * width << BITRES) // 8
            else:
                boost = int(follower[0, i] * width / 6)
                boost_bits = boost * 6 << BITRES
            if (not vbr or (constrained_vbr and not isTransient)) and \
                    (tot_boost + boost_bits) >> BITRES >> 3 > \
                    2 * effectiveBytes // 3:
                cap = (2 * effectiveBytes // 3) << BITRES << 3
                offsets[i] = cap - tot_boost
                tot_boost = cap
                break
            else:
                offsets[i] = boost
                tot_boost += boost_bits
    else:
        for i in range(start, end):
            importance[i] = 13
    return maxDepth, tot_boost


def alloc_trim_analysis(m, X, bandLogE, end, LM, C, N0, stereo_saving,
                        tf_estimate, intensity, surround_trim, equiv_rate):
    """celt_encoder.c:797-887 (float). Returns (trim_index,
    stereo_saving)."""
    trim = 5.0
    if equiv_rate < 64000:
        trim = 4.0
    elif equiv_rate < 80000:
        frac = (equiv_rate - 64000) >> 10
        trim = 4.0 + (1.0 / 16) * frac
    if C == 2:
        sum_ = 0.0
        for i in range(8):
            lo = int(m.e_bands[i]) << LM
            hi = int(m.e_bands[i + 1]) << LM
            sum_ += float(np.dot(X[lo:hi], X[N0 + lo:N0 + hi]))
        sum_ = (1.0 / 8) * sum_
        sum_ = min(1.0, abs(sum_))
        minXC = sum_
        for i in range(8, intensity):
            lo = int(m.e_bands[i]) << LM
            hi = int(m.e_bands[i + 1]) << LM
            partial = float(np.dot(X[lo:hi], X[N0 + lo:N0 + hi]))
            minXC = min(minXC, abs(partial))
        minXC = min(1.0, abs(minXC))
        logXC = math.log2(1.001 - sum_ * sum_)
        logXC2 = max(0.5 * logXC, math.log2(1.001 - minXC * minXC))
        trim += max(-4.0, 0.75 * logXC)
        stereo_saving = min(stereo_saving + 0.25, -0.5 * logXC2)
    diff = 0.0
    for c in range(C):
        for i in range(end - 1):
            diff += bandLogE[c, i] * (2 + 2 * i - end)
    diff /= C * (end - 1)
    trim -= max(-2.0, min(2.0, (diff + 1.0) / 6))
    trim -= surround_trim
    trim -= 2 * tf_estimate
    trim_index = int(math.floor(0.5 + trim))
    trim_index = max(0, min(10, trim_index))
    return trim_index, stereo_saving


def stereo_analysis(m, X, LM, N0):
    """celt_encoder.c:889-919."""
    sumLR = 1e-15
    sumMS = 1e-15
    for i in range(13):
        for j in range(int(m.e_bands[i]) << LM, int(m.e_bands[i + 1]) << LM):
            L = X[j]
            R = X[N0 + j]
            sumLR += abs(L) + abs(R)
            sumMS += abs(L + R) + abs(L - R)
    sumMS = 0.707107 * sumMS
    thetas = 13
    if LM <= 1:
        thetas -= 8
    return ((int(m.e_bands[13]) << (LM + 1)) + thetas) * sumMS > \
        (int(m.e_bands[13]) << (LM + 1)) * sumLR


def compute_vbr(m, base_target, LM, bitrate, lastCodedBands, C, intensity,
                constrained_vbr, stereo_saving, tot_boost, tf_estimate,
                pitch_change, maxDepth, temporal_vbr,
                has_surround_mask=False, surround_masking=0.0,
                lfe=False):
    """celt_encoder.c:1320-1429 (float)."""
    nb = m.nb_ebands
    e_bands = m.e_bands
    coded_bands = lastCodedBands if lastCodedBands else nb
    coded_bins = int(e_bands[coded_bands]) << LM
    if C == 2:
        coded_bins += int(e_bands[min(intensity, coded_bands)]) << LM
    target = base_target
    if has_surround_mask and not lfe:
        surround_target = target \
            + int(surround_masking * (coded_bins << BITRES))
        target = max(target // 4, surround_target)
    if C == 2:
        coded_stereo_bands = min(intensity, coded_bands)
        coded_stereo_dof = (int(e_bands[coded_stereo_bands]) << LM) \
            - coded_stereo_bands
        max_frac = 0.8 * coded_stereo_dof / coded_bins
        stereo_saving = min(stereo_saving, 1.0)
        target -= int(min(max_frac * target,
                          (stereo_saving - 0.1) * (coded_stereo_dof << BITRES)))
    target += tot_boost - (19 << LM)
    tf_calibration = 0.044
    target += int(2 * (tf_estimate - tf_calibration) * target)
    bins = int(e_bands[nb - 2]) << LM
    floor_depth = int((C * bins << BITRES) * maxDepth)
    floor_depth = max(floor_depth, target >> 2)
    target = min(target, floor_depth)
    if constrained_vbr:
        target = base_target + int(0.67 * (target - base_target))
    if tf_estimate < 0.2:
        amount = 0.0000031 * max(0, min(32000, 96000 - bitrate))
        tvbr_factor = temporal_vbr * amount
        target += int(tvbr_factor * target)
    target = min(2 * base_target, target)
    return target


class CeltEncoder:
    """State + encode loop (celt_encoder.c state struct + :1431)."""

    def __init__(self, sampling_rate: int = 48000, channels: int = 2,
                 mode: Optional[CeltMode] = None):
        self.mode = mode or standard_mode()
        self.channels = channels          # CC
        self.stream_channels = channels   # C
        if mode is not None and mode.fs == sampling_rate:
            self.upsample = 1             # custom mode at native rate
        else:
            self.upsample = resampling_factor(sampling_rate)
        if self.upsample == 0:
            raise OpusError.bad_arg("unsupported rate")
        self.start = 0
        self.end = self.mode.eff_ebands
        self.bitrate = OPUS_BITRATE_MAX
        self.vbr = False
        self.constrained_vbr = False
        self.complexity = 10
        self.lsb_depth = 24
        self.loss_rate = 0
        self.lfe = False
        self.disable_pf = False
        self.disable_inv = channels == 1
        self.force_intra = False
        self.clip = True
        self.silk_info_offset = 0      # hybrid only
        self.silk_info_signal_type = 0
        self.energy_mask = None
        self.reset()

    def reset(self):
        m = self.mode
        nb = m.nb_ebands
        self.rng = 0
        self.spread_decision = SPREAD_NORMAL
        self.delayedIntra = 1.0
        self.tonal_average = 256
        self.hf_average = 0
        self.tapset_decision = 0
        self.prefilter_period = 0
        self.prefilter_gain = 0.0
        self.prefilter_tapset = 0
        self.prefilter_period_old = 0
        self.prefilter_gain_old = 0.0
        self.prefilter_tapset_old = 0
        self.consec_transient = 0
        self.intensity = 0
        self.vbr_reservoir = 0
        self.vbr_drift = 0
        self.vbr_offset = 0
        self.vbr_count = 0
        self.overlap_max = 0.0
        self.stereo_saving = 0.0
        self.lastCodedBands = 0
        self.spec_avg = 0.0
        self.preemph_memE = np.zeros(2)
        self.preemph_memD = np.zeros(2)
        self.in_mem = np.zeros((2, m.overlap))
        self.prefilter_mem = np.zeros((2, COMBFILTER_MAXPERIOD))
        self.oldBandE = np.zeros((2, nb))
        self.oldLogE = np.full((2, nb), -28.0)
        self.oldLogE2 = np.full((2, nb), -28.0)
        self.energyError = np.zeros((2, nb))

    # -- helpers ----------------------------------------------------------

    def _preemphasis(self, pcm_c, N, c, need_clip):
        """celt_preemphasis (float; pcm in [-1,1])."""
        m = self.mode
        coef0 = m.preemph
        mem = self.preemph_memE[c]
        upsample = self.upsample
        Nu = N // upsample
        inp = np.zeros(N)
        inp[::upsample][:Nu] = pcm_c[:Nu] * CELT_SIG_SCALE
        if need_clip:
            inp = np.clip(inp, -65536.0, 65536.0)
        out = np.empty(N)
        if m.preemph1 != 0.0:
            # 2nd-order preemphasis for custom modes <40 kHz
            # (celt_encoder.c:552-566)
            coef1, coef2 = m.preemph1, m.preemph2
            for i in range(N):
                tmp = coef2 * inp[i]
                out[i] = tmp + mem
                mem = coef1 * out[i] - coef0 * tmp
        else:
            for i in range(N):
                x = inp[i]
                out[i] = x - mem
                mem = coef0 * x
        self.preemph_memE[c] = mem
        return out

    def _compute_mdcts(self, shortBlocks, inb, C, CC, LM):
        """compute_mdcts (celt_encoder.c:461-504). inb: [CC, N+overlap]."""
        m = self.mode
        if shortBlocks:
            B = shortBlocks
            N = m.short_mdct_size
        else:
            B = 1
            N = m.short_mdct_size << LM
        out = np.zeros((CC, B * N))
        for c in range(CC):
            blocks = np.stack([inb[c, b * N: b * N + N + m.overlap]
                               for b in range(B)])
            spec = mdct_forward(blocks, m.window)   # [B, N]
            for b in range(B):
                out[c, b::B] = spec[b]
        if CC == 2 and C == 1:
            out[0] = 0.5 * (out[0] + out[1])
        if self.upsample != 1:
            bound = B * N // self.upsample
            for c in range(C):
                out[c, :bound] *= self.upsample
                out[c, bound:] = 0.0
        return out

    def _run_prefilter(self, inb, CC, N, prefilter_tapset, enabled,
                       nbAvailableBytes):
        """run_prefilter (celt_encoder.c:1188-1318)."""
        m = self.mode
        overlap = m.overlap
        pre = np.zeros((CC, COMBFILTER_MAXPERIOD + N))
        for c in range(CC):
            pre[c, :COMBFILTER_MAXPERIOD] = self.prefilter_mem[c]
            pre[c, COMBFILTER_MAXPERIOD:] = inb[c, overlap:overlap + N]

        gain1 = 0.0
        pitch_index = COMBFILTER_MINPERIOD
        if enabled:
            pitch_buf = pitch_downsample([pre[c] for c in range(CC)],
                                         COMBFILTER_MAXPERIOD + N)
            pitch_index = pitch_search(
                pitch_buf[COMBFILTER_MAXPERIOD >> 1:], pitch_buf, N,
                COMBFILTER_MAXPERIOD - 3 * COMBFILTER_MINPERIOD)
            pitch_index = COMBFILTER_MAXPERIOD - pitch_index
            gain1, pitch_index = remove_doubling(
                pitch_buf, COMBFILTER_MAXPERIOD, COMBFILTER_MINPERIOD, N,
                pitch_index, self.prefilter_period, self.prefilter_gain)
            if pitch_index > COMBFILTER_MAXPERIOD - 2:
                pitch_index = COMBFILTER_MAXPERIOD - 2
            gain1 = 0.7 * gain1
            if self.loss_rate > 2:
                gain1 = 0.5 * gain1
            if self.loss_rate > 4:
                gain1 = 0.5 * gain1
            if self.loss_rate > 8:
                gain1 = 0.0

        pf_threshold = 0.2
        if abs(pitch_index - self.prefilter_period) * 10 > pitch_index:
            pf_threshold += 0.2
        if nbAvailableBytes < 25:
            pf_threshold += 0.1
        if nbAvailableBytes < 35:
            pf_threshold += 0.1
        if self.prefilter_gain > 0.4:
            pf_threshold -= 0.1
        if self.prefilter_gain > 0.55:
            pf_threshold -= 0.1
        pf_threshold = max(pf_threshold, 0.2)
        if gain1 < pf_threshold:
            gain1 = 0.0
            pf_on = 0
            qg = 0
        else:
            if abs(gain1 - self.prefilter_gain) < 0.1:
                gain1 = self.prefilter_gain
            qg = int(math.floor(0.5 + gain1 * 32 / 3)) - 1
            qg = max(0, min(7, qg))
            gain1 = 0.09375 * (qg + 1)
            pf_on = 1

        for c in range(CC):
            offset = m.short_mdct_size - overlap
            self.prefilter_period = max(self.prefilter_period,
                                        COMBFILTER_MINPERIOD)
            inb[c, :overlap] = self.in_mem[c]
            if offset:
                comb_filter(inb[c], overlap, pre[c], COMBFILTER_MAXPERIOD,
                            self.prefilter_period, self.prefilter_period,
                            offset, -self.prefilter_gain,
                            -self.prefilter_gain, self.prefilter_tapset,
                            self.prefilter_tapset, None, 0)
            comb_filter(inb[c], overlap + offset, pre[c],
                        COMBFILTER_MAXPERIOD + offset,
                        self.prefilter_period, pitch_index, N - offset,
                        -self.prefilter_gain, -gain1,
                        self.prefilter_tapset, prefilter_tapset,
                        m.window, overlap)
            self.in_mem[c] = inb[c, N:N + overlap]
            if N > COMBFILTER_MAXPERIOD:
                self.prefilter_mem[c] = pre[c, N:N + COMBFILTER_MAXPERIOD]
            else:
                self.prefilter_mem[c, :COMBFILTER_MAXPERIOD - N] = \
                    self.prefilter_mem[c, N:]
                self.prefilter_mem[c, COMBFILTER_MAXPERIOD - N:] = \
                    pre[c, COMBFILTER_MAXPERIOD:COMBFILTER_MAXPERIOD + N]
        return pf_on, pitch_index, gain1, qg

    # -- main entry (celt_encode_with_ec) ---------------------------------

    def encode_with_ec(self, pcm: np.ndarray, frame_size: int,
                       nbCompressedBytes: int,
                       enc: Optional[RangeEncoder] = None) -> bytes:
        """pcm: [CC, frame_size] float in [-1, 1]. Returns packet bytes
        (when ``enc`` is owned) and always leaves the coder finalized
        per the reference contract."""
        m = self.mode
        nb = m.nb_ebands
        CC = self.channels
        C = self.stream_channels
        start, end = self.start, self.end
        hybrid = start != 0
        overlap = m.overlap
        tf_estimate = 0.0
        if nbCompressedBytes < 2 or pcm is None:
            raise OpusError.bad_arg()

        frame_size *= self.upsample
        for LM in range(m.max_lm + 1):
            if (m.short_mdct_size << LM) == frame_size:
                break
        else:
            raise OpusError.bad_arg("bad frame size")
        M = 1 << LM
        N = M * m.short_mdct_size

        own_enc = enc is None
        if own_enc:
            tell0_frac = tell = 1
            nbFilledBytes = 0
        else:
            tell0_frac = enc.tell_frac()
            tell = enc.tell()
            nbFilledBytes = (tell + 4) >> 3

        nbCompressedBytes = min(nbCompressedBytes, 1275)
        nbAvailableBytes = nbCompressedBytes - nbFilledBytes

        if self.vbr and self.bitrate != OPUS_BITRATE_MAX:
            den = m.fs >> BITRES
            vbr_rate = (self.bitrate * frame_size + (den >> 1)) // den
            effectiveBytes = vbr_rate >> (3 + BITRES)
        else:
            vbr_rate = 0
            tmp = self.bitrate * frame_size
            if tell > 1:
                tmp += tell * m.fs
            if self.bitrate != OPUS_BITRATE_MAX:
                nbCompressedBytes = max(2, min(
                    nbCompressedBytes, (tmp + 4 * m.fs) // (8 * m.fs)))
                if not own_enc:
                    enc.shrink(nbCompressedBytes)
            effectiveBytes = nbCompressedBytes - nbFilledBytes
        equiv_rate = (nbCompressedBytes * 8 * 50 << (3 - LM)) \
            - (40 * C + 20) * ((400 >> LM) - 50)
        if self.bitrate != OPUS_BITRATE_MAX:
            equiv_rate = min(equiv_rate,
                             self.bitrate - (40 * C + 20) * ((400 >> LM) - 50))

        if own_enc:
            enc = RangeEncoder(nbCompressedBytes)

        if vbr_rate > 0 and self.constrained_vbr:
            vbr_bound = vbr_rate
            max_allowed = min(max(2 if tell == 1 else 0,
                                  (vbr_rate + vbr_bound - self.vbr_reservoir)
                                  >> (BITRES + 3)), nbAvailableBytes)
            if max_allowed < nbAvailableBytes:
                nbCompressedBytes = nbFilledBytes + max_allowed
                nbAvailableBytes = max_allowed
                enc.shrink(nbCompressedBytes)
        total_bits = nbCompressedBytes * 8

        effEnd = min(end, m.eff_ebands)

        inb = np.zeros((CC, N + overlap))

        npcm = (N - overlap) // self.upsample
        sample_max = max(self.overlap_max,
                         float(np.abs(pcm[:, :npcm]).max()) if npcm else 0.0)
        self.overlap_max = float(np.abs(pcm[:, npcm:]).max()) \
            if pcm.shape[1] > npcm else 0.0
        sample_max = max(sample_max, self.overlap_max)
        silence = sample_max <= 1.0 / (1 << self.lsb_depth)
        if tell == 1:
            enc.enc_bit_logp(1 if silence else 0, 15)
        else:
            silence = False
        if silence:
            if vbr_rate > 0:
                effectiveBytes = nbCompressedBytes = \
                    min(nbCompressedBytes, nbFilledBytes + 2)
                total_bits = nbCompressedBytes * 8
                nbAvailableBytes = 2
                enc.shrink(nbCompressedBytes)
            tell = nbCompressedBytes * 8
            enc.nbits_total += tell - enc.tell()

        for c in range(CC):
            need_clip = self.clip and sample_max > 65536.0 / CELT_SIG_SCALE
            inb[c, overlap:] = self._preemphasis(pcm[c], N, c, need_clip)

        # prefilter + pitch
        enabled = ((self.lfe and nbAvailableBytes > 3)
                   or nbAvailableBytes > 12 * C) and not hybrid and \
            not silence and not self.disable_pf and self.complexity >= 5
        prefilter_tapset = self.tapset_decision
        pf_on, pitch_index, gain1, qg = self._run_prefilter(
            inb, CC, N, prefilter_tapset, enabled, nbAvailableBytes)
        pitch_change = 0
        if (gain1 > 0.4 or self.prefilter_gain > 0.4) and \
                (pitch_index > 1.26 * self.prefilter_period
                 or pitch_index < 0.79 * self.prefilter_period):
            pitch_change = 1
        if pf_on == 0:
            if not hybrid and tell + 16 <= total_bits:
                enc.enc_bit_logp(0, 1)
        else:
            enc.enc_bit_logp(1, 1)
            pitch_index += 1
            octave = ec_ilog(pitch_index) - 5
            enc.enc_uint(octave, 6)
            enc.enc_bits(pitch_index - (16 << octave), 4 + octave)
            pitch_index -= 1
            enc.enc_bits(qg, 3)
            enc.enc_icdf(prefilter_tapset, TAPSET_ICDF, 2)

        # transient analysis
        isTransient = False
        shortBlocks = 0
        transient_got_disabled = 0
        weak_transient = False
        tf_chan = 0
        if self.complexity >= 1 and not self.lfe:
            allow_weak = hybrid and effectiveBytes < 15 and \
                self.silk_info_signal_type != 2
            isTransient, tf_estimate, tf_chan, weak_transient = \
                transient_analysis(inb, N + overlap, CC, allow_weak)
        if LM > 0 and enc.tell() + 3 <= total_bits:
            if isTransient:
                shortBlocks = M
        else:
            isTransient = False
            transient_got_disabled = 1

        secondMdct = shortBlocks and self.complexity >= 8
        bandLogE2 = np.zeros((C, nb))
        if secondMdct:
            freq = self._compute_mdcts(0, inb, C, CC, LM)
            bandE = B_.compute_band_energies(m, freq[:C], effEnd, LM)
            bandLogE2 = E_.amp2_log2(m, effEnd, end, bandE)
            bandLogE2 += 0.5 * LM

        freq = self._compute_mdcts(shortBlocks, inb, C, CC, LM)
        if CC == 2 and C == 1:
            tf_chan = 0
        bandE = B_.compute_band_energies(m, freq[:C], effEnd, LM)
        bandLogE = E_.amp2_log2(m, effEnd, end, bandE)

        surround_dynalloc = np.zeros(nb)
        surround_trim = 0.0
        surround_masking = 0.0
        # surround masking from the multistream analysis
        # (celt_encoder.c:1776-1848, float build)
        if not hybrid and self.energy_mask is not None and not self.lfe:
            e_bands = m.e_bands
            mask_end = max(2, self.lastCodedBands)
            mask_avg = 0.0
            diff = 0.0
            count = 0
            em = np.asarray(self.energy_mask, np.float64).reshape(-1, nb)
            for c in range(C):
                for i in range(mask_end):
                    mask = min(max(em[c, i], -2.0), 0.25)
                    if mask > 0:
                        mask = 0.5 * mask
                    w = int(e_bands[i + 1]) - int(e_bands[i])
                    mask_avg += mask * w
                    count += w
                    diff += mask * (1 + 2 * i - mask_end)
            mask_avg = mask_avg / count
            mask_avg += 0.2
            diff = diff * 6 / (C * (mask_end - 1)
                               * (mask_end + 1) * mask_end)
            diff = 0.5 * diff
            diff = min(max(diff, -0.031), 0.031)
            midband = 0
            while int(e_bands[midband + 1]) < int(e_bands[mask_end]) // 2:
                midband += 1
            count_dynalloc = 0
            for i in range(mask_end):
                lin = mask_avg + diff * (i - midband)
                if C == 2:
                    unmask = max(em[0, i], em[1, i])
                else:
                    unmask = em[0, i]
                unmask = min(unmask, 0.0) - lin
                if unmask > 0.25:
                    surround_dynalloc[i] = unmask - 0.25
                    count_dynalloc += 1
            if count_dynalloc >= 3:
                # initial masking rate too low (celt_encoder.c:1826-1842)
                mask_avg += 0.25
                if mask_avg > 0:
                    mask_avg = 0.0
                    diff = 0.0
                    surround_dynalloc[:mask_end] = 0.0
                else:
                    surround_dynalloc[:mask_end] = np.maximum(
                        0.0, surround_dynalloc[:mask_end] - 0.25)
            mask_avg += 0.2
            surround_trim = 64 * diff
            surround_masking = mask_avg
        # temporal VBR
        temporal_vbr = 0.0
        if not self.lfe:
            follow = -10.0
            frame_avg = 0.0
            offset_db = 0.5 * LM if shortBlocks else 0.0
            for i in range(start, end):
                follow = max(follow - 1.0, bandLogE[0, i] - offset_db)
                if C == 2:
                    follow = max(follow, bandLogE[1, i] - offset_db)
                frame_avg += follow
            frame_avg /= (end - start)
            temporal_vbr = frame_avg - self.spec_avg
            temporal_vbr = min(3.0, max(-1.5, temporal_vbr))
            self.spec_avg += 0.02 * temporal_vbr

        if not secondMdct:
            bandLogE2 = bandLogE.copy()

        # late transient catch
        if LM > 0 and enc.tell() + 3 <= total_bits and not isTransient and \
                self.complexity >= 5 and not self.lfe and not hybrid:
            if patch_transient_decision(bandLogE, self.oldBandE, nb, start,
                                        end, C):
                isTransient = True
                shortBlocks = M
                freq = self._compute_mdcts(shortBlocks, inb, C, CC, LM)
                bandE = B_.compute_band_energies(m, freq[:C], effEnd, LM)
                bandLogE = E_.amp2_log2(m, effEnd, end, bandE)
                bandLogE2 += 0.5 * LM
                tf_estimate = 0.2

        if LM > 0 and enc.tell() + 3 <= total_bits:
            enc.enc_bit_logp(1 if isTransient else 0, 3)

        # normalise
        Xn = B_.normalise_bands(m, freq[:C], bandE, effEnd, M)
        X = list(Xn[0])
        Y = list(Xn[1]) if C == 2 else None

        enable_tf_analysis = effectiveBytes >= 15 * C and not hybrid and \
            self.complexity >= 2 and not self.lfe

        offsets = [0] * nb
        importance = [13] * nb
        spread_weight = [32] * nb
        maxDepth, tot_boost = dynalloc_analysis(
            bandLogE, bandLogE2, self.oldBandE, nb, start, end, C, offsets,
            self.lsb_depth, m.log_n, isTransient, self.vbr,
            self.constrained_vbr, m.e_bands, LM, effectiveBytes, self.lfe,
            surround_dynalloc, importance, spread_weight)

        tf_res = [0] * nb
        Xflat = X + (Y if Y is not None else [])
        if enable_tf_analysis:
            lam = max(80, 20480 // effectiveBytes + 2)
            tf_select = tf_analysis(m, effEnd, isTransient, tf_res, lam,
                                    Xflat, N, LM, tf_estimate, tf_chan,
                                    importance)
            for i in range(effEnd, end):
                tf_res[i] = tf_res[effEnd - 1]
        elif hybrid and weak_transient:
            for i in range(end):
                tf_res[i] = 1
            tf_select = 0
        elif hybrid and effectiveBytes < 15 and \
                self.silk_info_signal_type != 2:
            for i in range(end):
                tf_res[i] = 0
            tf_select = 1 if isTransient else 0
        else:
            for i in range(end):
                tf_res[i] = 1 if isTransient else 0
            tf_select = 0

        error = np.zeros((C, nb))
        for c in range(C):
            for i in range(start, end):
                if abs(bandLogE[c, i] - self.oldBandE[c, i]) < 2.0:
                    bandLogE[c, i] -= self.energyError[c, i] * 0.25
        intra_used, self.delayedIntra = E_.quant_coarse_energy(
            m, start, end, effEnd, bandLogE, self.oldBandE, total_bits,
            error, enc, C, LM, nbAvailableBytes, self.force_intra,
            self.delayedIntra, self.complexity >= 4, self.loss_rate,
            self.lfe)

        tf_encode(start, end, isTransient, tf_res, LM, tf_select, enc)

        if enc.tell() + 4 <= total_bits:
            if self.lfe:
                self.tapset_decision = 0
                self.spread_decision = SPREAD_NORMAL
            elif hybrid:
                if self.complexity == 0:
                    self.spread_decision = SPREAD_NONE
                elif isTransient:
                    self.spread_decision = SPREAD_NORMAL
                else:
                    self.spread_decision = SPREAD_AGGRESSIVE
            elif shortBlocks or self.complexity < 3 or \
                    nbAvailableBytes < 10 * C:
                if self.complexity == 0:
                    self.spread_decision = SPREAD_NONE
                else:
                    self.spread_decision = SPREAD_NORMAL
            else:
                (self.spread_decision, self.tonal_average,
                 self.hf_average, self.tapset_decision) = \
                    B_.spreading_decision(
                        m, [X] + ([Y] if Y is not None else []),
                        self.tonal_average, self.spread_decision,
                        self.hf_average, self.tapset_decision,
                        pf_on and not shortBlocks, effEnd, C, M,
                        spread_weight)
            enc.enc_icdf(self.spread_decision, SPREAD_ICDF, 5)

        if self.lfe:
            offsets[0] = min(8, effectiveBytes // 3)
        cap = m.init_caps(LM, C)

        # dynalloc boost coding (celt_encoder.c:2017-2050)
        dynalloc_logp = 6
        total_bits <<= BITRES
        total_boost = 0
        tell_frac = enc.tell_frac()
        for i in range(start, end):
            width = C * int(m.e_bands[i + 1] - m.e_bands[i]) << LM
            quanta = min(width << BITRES, max(6 << BITRES, width))
            dynalloc_loop_logp = dynalloc_logp
            boost = 0
            j = 0
            while tell_frac + (dynalloc_loop_logp << BITRES) < \
                    total_bits - total_boost and boost < cap[i]:
                flag = 1 if j < offsets[i] else 0
                enc.enc_bit_logp(flag, dynalloc_loop_logp)
                tell_frac = enc.tell_frac()
                if not flag:
                    break
                boost += quanta
                total_boost += quanta
                dynalloc_loop_logp = 1
                j += 1
            if j:
                dynalloc_logp = max(2, dynalloc_logp - 1)
            offsets[i] = boost

        dual_stereo = 0
        if C == 2:
            INTENSITY_THRESHOLDS = (1, 2, 3, 4, 5, 6, 7, 8, 16, 24, 36, 44,
                                    50, 56, 62, 67, 72, 79, 88, 106, 134)
            INTENSITY_HISTERESIS = (1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2,
                                    2, 3, 3, 4, 5, 6, 8, 8)
            if LM != 0:
                dual_stereo = 1 if stereo_analysis(m, Xflat, LM, N) else 0
            self.intensity = B_.hysteresis_decision(
                equiv_rate / 1000, INTENSITY_THRESHOLDS,
                INTENSITY_HISTERESIS, self.intensity)
            self.intensity = min(end, max(start, self.intensity))

        alloc_trim = 5
        if tell_frac + (6 << BITRES) <= total_bits - total_boost:
            if start > 0 or self.lfe:
                self.stereo_saving = 0.0
                alloc_trim = 5
            else:
                alloc_trim, self.stereo_saving = alloc_trim_analysis(
                    m, Xflat, bandLogE, end, LM, C, N, self.stereo_saving,
                    tf_estimate, self.intensity, surround_trim, equiv_rate)
            enc.enc_icdf(alloc_trim, TRIM_ICDF, 7)
            tell_frac = enc.tell_frac()

        # VBR target (celt_encoder.c:2086-2195)
        if vbr_rate > 0:
            lm_diff = m.max_lm - LM
            nbCompressedBytes = min(nbCompressedBytes, 1275 >> (3 - LM))
            if not hybrid:
                base_target = vbr_rate - ((40 * C + 20) << BITRES)
            else:
                base_target = max(0, vbr_rate - ((9 * C + 4) << BITRES))
            if self.constrained_vbr:
                base_target += self.vbr_offset >> lm_diff
            if not hybrid:
                target = compute_vbr(
                    m, base_target, LM, equiv_rate, self.lastCodedBands, C,
                    self.intensity, self.constrained_vbr,
                    self.stereo_saving, tot_boost, tf_estimate,
                    pitch_change, maxDepth, temporal_vbr,
                    self.energy_mask is not None, surround_masking,
                    self.lfe)
            else:
                target = base_target
                if self.silk_info_offset < 100:
                    target += 12 << BITRES >> (3 - LM)
                if self.silk_info_offset > 100:
                    target -= 18 << BITRES >> (3 - LM)
                target += int((tf_estimate - 0.25) * (50 << BITRES)) \
                    if False else int((tf_estimate - 0.25) * (50 << BITRES))
                if tf_estimate > 0.7:
                    target = max(target, 50 << BITRES)
            target = target + tell_frac
            min_allowed = ((tell_frac + total_boost
                            + (1 << (BITRES + 3)) - 1) >> (BITRES + 3)) + 2
            if hybrid:
                min_allowed = max(
                    min_allowed,
                    (tell0_frac + (37 << BITRES) + total_boost
                     + (1 << (BITRES + 3)) - 1) >> (BITRES + 3))
            nbAvailableBytes = (target + (1 << (BITRES + 2))) >> (BITRES + 3)
            nbAvailableBytes = max(min_allowed, nbAvailableBytes)
            nbAvailableBytes = min(nbCompressedBytes, nbAvailableBytes)
            delta = target - vbr_rate
            target = nbAvailableBytes << (BITRES + 3)
            if silence:
                nbAvailableBytes = 2
                target = 2 * 8 << BITRES
                delta = 0
            if self.vbr_count < 970:
                self.vbr_count += 1
                alpha = 1.0 / (self.vbr_count + 20)
            else:
                alpha = 0.001
            if self.constrained_vbr:
                self.vbr_reservoir += target - vbr_rate
            if self.constrained_vbr:
                self.vbr_drift += int(alpha * (
                    (delta * (1 << lm_diff)) - self.vbr_offset
                    - self.vbr_drift))
                self.vbr_offset = -self.vbr_drift
            if self.constrained_vbr and self.vbr_reservoir < 0:
                adjust = (-self.vbr_reservoir) // (8 << BITRES)
                nbAvailableBytes += 0 if silence else adjust
                self.vbr_reservoir = 0
            nbCompressedBytes = min(nbCompressedBytes, nbAvailableBytes)
            enc.shrink(nbCompressedBytes)

        # allocation
        bits = ((nbCompressedBytes * 8) << BITRES) - enc.tell_frac() - 1
        anti_collapse_rsv = (1 << BITRES) if (
            isTransient and LM >= 2 and bits >= ((LM + 2) << BITRES)) else 0
        bits -= anti_collapse_rsv
        signalBandwidth = end - 1
        if self.lfe:
            signalBandwidth = 1
        alloc = compute_allocation(
            m, start, end, offsets, cap, alloc_trim, self.intensity,
            dual_stereo, bits, C, LM, enc, True, self.lastCodedBands,
            signalBandwidth)
        codedBands = alloc.coded_bands
        self.intensity = alloc.intensity
        dual_stereo = alloc.dual_stereo
        if self.lastCodedBands:
            self.lastCodedBands = min(self.lastCodedBands + 1,
                                      max(self.lastCodedBands - 1,
                                          codedBands))
        else:
            self.lastCodedBands = codedBands

        E_.quant_fine_energy(m, start, end, self.oldBandE, error,
                             alloc.ebits, enc, C)

        collapse_masks = [0] * (C * nb)
        self.rng = B_.quant_all_bands(
            True, m, start, end, X, Y, collapse_masks, bandE, alloc.pulses,
            shortBlocks, self.spread_decision, dual_stereo, self.intensity,
            tf_res, nbCompressedBytes * (8 << BITRES) - anti_collapse_rsv,
            alloc.balance, enc, LM, codedBands, self.rng,
            complexity=self.complexity, disable_inv=self.disable_inv)

        if anti_collapse_rsv > 0:
            anti_collapse_on = 1 if self.consec_transient < 2 else 0
            enc.enc_bits(anti_collapse_on, 1)
        E_.quant_energy_finalise(m, start, end, self.oldBandE, error,
                                 alloc.ebits, alloc.fine_priority,
                                 nbCompressedBytes * 8 - enc.tell(), enc, C)
        self.energyError[:, :] = 0.0
        for c in range(C):
            for i in range(start, end):
                self.energyError[c, i] = max(-0.5, min(0.5, error[c, i]))

        if silence:
            self.oldBandE[:, :] = -28.0

        self.prefilter_period = pitch_index
        self.prefilter_gain = gain1
        self.prefilter_tapset = prefilter_tapset

        if CC == 2 and C == 1:
            self.oldBandE[1] = self.oldBandE[0]
        if not isTransient:
            self.oldLogE2[:] = self.oldLogE
            self.oldLogE[:] = self.oldBandE
        else:
            self.oldLogE[:] = np.minimum(self.oldLogE, self.oldBandE)
        for c in range(2):
            self.oldBandE[c, :start] = 0
            self.oldLogE[c, :start] = self.oldLogE2[c, :start] = -28.0
            self.oldBandE[c, end:] = 0
            self.oldLogE[c, end:] = self.oldLogE2[c, end:] = -28.0

        if isTransient or transient_got_disabled:
            self.consec_transient += 1
        else:
            self.consec_transient = 0
        self.rng = enc.rng

        enc.done()
        if enc.get_error():
            raise OpusError(-3, "range coder busted")
        if own_enc:
            return enc.data()[:nbCompressedBytes]
        return b""
