"""Batched CELT encoder — the device symbol-planning pass.

This is the core of the TPU-native design (SURVEY §7): for a batch of
streams ``[B, ...]`` the whole CELT encoder — coarse/fine energy
quantization, tf, dynalloc, allocation, PVQ search, CWRS indexing —
runs as one jitted jnp program, tracking the range coder exactly
(``batch_coder``) and emitting per-stream symbol plans that the native
host lane (``runtime/ec_lane.c``) packs into bytes.

Behavioural parity: /root/reference/opus/celt/celt_encoder.c:1431-2356
(pipeline), quant_bands.c:156-426 (coarse/fine), rate.c:248-645
(allocation), bands.c:943-1231 + vq.c:165-361 + cwrs.c:440-461 (PVQ
tree). The scalar modules in this package are the tested ground truth;
on a float64 backend this planner reproduces their bitstreams exactly.

Scope: mono and stereo (round 4: compute_theta/intensity/dual-stereo
band tree), every frame size (LM 0-3).  The ``complexity`` static arg
selects the decision set exactly as the scalar encoder's knob: 0 = the
constant low-complexity set; >= 1 transient analysis + short blocks +
anti-collapse; >= 2 tf_analysis; >= 3 the spreading decision (with
spreading rotations on the PVQ leaves).  ``vbr``/``constrained_vbr``
enable the round-5 batched VBR: compute_vbr target + the
ec_enc_shrink budget replanning with per-stream final packet sizes
and the reservoir/drift/offset carries.  Still host-side: the
prefilter/pitch path (complexity >= 5) and two-pass coarse energy
(complexity >= 4) — the batched lane currently matches the scalar
encoder at complexity <= 3.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import batch_coder as bc
from .batch_coder import PlanCoder
from .cwrs import U as U_exact
from .modes import (BETA_COEF, BETA_INTRA, E_PROB_MODEL, EMEANS,
                    LOG2_FRAC_TABLE, MAX_FINE_BITS, PRED_COEF,
                    QTHETA_OFFSET, SMALL_ENERGY_ICDF, SPREAD_ICDF,
                    TRIM_ICDF, get_pulses, standard_mode)

BITRES = 3
ALLOC_STEPS = 6
FINE_OFFSET = 21
EPSILON = 1e-15
MAX_OPS = 4096

_i32 = jnp.int32


class Tables(NamedTuple):
    """Static mode-derived constants (host numpy, embedded in the jit)."""
    e_bands: np.ndarray          # [nb+1]
    log_n: np.ndarray            # [nb]
    caps: np.ndarray             # [nb]  (LM=3, C=1)
    alloc_vectors: np.ndarray    # [nv, nb]
    nb_alloc_vectors: int
    cache_index: np.ndarray
    cache_bits: np.ndarray       # int32
    thresh: np.ndarray           # [nb]
    trim_coef: np.ndarray        # [nb] width*(end-j-1) factor (see below)
    u_tab: np.ndarray            # [nmax+1, kmax+2] uint32 (sat 0xFFFFFFFF)
    kmax_global: int
    emeans: np.ndarray


@lru_cache(maxsize=None)
def make_tables(lm: int = 3, C: int = 1) -> Tables:
    m = standard_mode()
    nb = m.nb_ebands
    e_bands = np.asarray(m.e_bands, np.int32)
    caps = np.asarray(m.init_caps(lm, C), np.int32)
    # static allocation precomputes (rate.c:534-580)
    thresh = np.zeros(nb, np.int32)
    widths = (e_bands[1:] - e_bands[:-1]).astype(np.int64)
    for j in range(nb):
        thresh[j] = max(C << BITRES, (3 * int(widths[j]) << lm << BITRES) >> 4)
    # global K bound + U table over every reachable (N, K) node pair
    kmax = 1
    n = 0
    for i in range(nb):
        N = int(widths[i]) << lm
        lmk = lm
        while True:
            row = int(m.cache_index[(lmk + 1) * nb + i])
            maxq = int(m.cache_bits[row])
            kmax = max(kmax, get_pulses(maxq))
            n = max(n, N)
            if N <= 2 or lmk == -1:
                break
            N >>= 1
            lmk -= 1
    u_tab = np.zeros((n + 2, kmax + 3), np.uint32)
    for nn in range(n + 2):
        for kk in range(kmax + 3):
            v = U_exact(nn, kk)
            u_tab[nn, kk] = v if v < (1 << 32) else 0xFFFFFFFF
    return Tables(
        e_bands=e_bands,
        log_n=np.asarray(m.log_n, np.int32),
        caps=caps,
        alloc_vectors=np.asarray(m.alloc_vectors, np.int32),
        nb_alloc_vectors=int(m.nb_alloc_vectors),
        cache_index=np.asarray(m.cache_index, np.int32),
        cache_bits=np.asarray(m.cache_bits, np.int32),
        thresh=thresh,
        trim_coef=widths.astype(np.int32),
        u_tab=u_tab,
        kmax_global=kmax,
        emeans=np.asarray(EMEANS[:nb], np.float64),
    )


# ---------------------------------------------------------------------------
# Coarse energy (quant_bands.c:156-359, single-pass / complexity<4 form)

def coarse_energy(c: PlanCoder, bandLogE, oldEBands, budget, intra,
                  nb_available_bytes, lm: int, start: int, end: int):
    """Single-pass quant_coarse_energy for [B, nb] (mono) or [B, C, nb]
    inputs (band-major, channel-minor symbol order as in
    quant_bands.c:178-257).

    ``intra`` is a [B] bool.  Returns (coder, oldEBands', error) with
    the input's shape.  All float math in the input dtype (float64
    matches the scalar encoder bit-for-bit)."""
    dt = bandLogE.dtype
    mono_in = bandLogE.ndim == 2
    if mono_in:
        bandLogE = bandLogE[:, None, :]
        oldEBands = oldEBands[:, None, :]
    B, C, nb = bandLogE.shape
    tell0 = bc.tell(c)
    code_intra_flag = tell0 + 3 <= budget
    intra = jnp.where(code_intra_flag, intra, False)
    c = bc.bit_logp(c, code_intra_flag, intra.astype(_i32), 3)

    max_decay = jnp.asarray(16.0, dt)
    if end - start > 10:
        max_decay = jnp.minimum(
            max_decay, (0.125 * nb_available_bytes).astype(dt))

    coef = jnp.where(intra, jnp.asarray(0.0, dt),
                     jnp.asarray(PRED_COEF[lm], dt))
    beta = jnp.where(intra, jnp.asarray(BETA_INTRA, dt),
                     jnp.asarray(BETA_COEF[lm], dt))
    probs = np.stack([np.asarray(E_PROB_MODEL[lm][0], np.int32),
                      np.asarray(E_PROB_MODEL[lm][1], np.int32)])
    probs_j = jnp.asarray(probs)        # [2, 42]
    intra_i = intra.astype(_i32)

    prev = jnp.zeros((B, C), dt)
    old = oldEBands
    err = jnp.zeros((B, C, nb), dt)
    for i in range(start, end):
        pi = 2 * min(i, 20)
        fs0 = probs_j[intra_i, pi] << 7
        decay = probs_j[intra_i, pi + 1] << 6
        for ch in range(C):
            x = bandLogE[:, ch, i]
            oldE = jnp.maximum(jnp.asarray(-9.0, dt), old[:, ch, i])
            f = x - coef * oldE - prev[:, ch]
            qi = jnp.floor(0.5 + f).astype(_i32)
            decay_bound = jnp.maximum(jnp.asarray(-28.0, dt),
                                      old[:, ch, i]) - max_decay
            boost = (decay_bound - x).astype(_i32)
            qi = jnp.where((qi < 0) & (x < decay_bound),
                           jnp.minimum(qi + boost, 0), qi)
            tell_i = bc.tell(c)
            bits_left = budget - tell_i - 3 * C * (end - i)
            if i != start:
                qi = jnp.where(bits_left < 24, jnp.minimum(1, qi), qi)
                qi = jnp.where(bits_left < 16, jnp.maximum(-1, qi), qi)
            rem = budget - tell_i
            # three coding regimes by remaining budget
            m_lap = rem >= 15
            m_small = (~m_lap) & (rem >= 2)
            m_one = (~m_lap) & (~m_small) & (rem >= 1)
            c, qi_lap = bc.laplace(c, m_lap, qi, fs0, decay)
            qi_s = jnp.clip(qi, -1, 1)
            c = bc.icdf(c, m_small,
                        (2 * qi_s) ^ jnp.where(qi_s < 0, -1, 0),
                        np.asarray(SMALL_ENERGY_ICDF, np.int32), 2)
            qi_o = jnp.minimum(0, qi)
            c = bc.bit_logp(c, m_one, -qi_o, 1)
            qi = jnp.where(m_lap, qi_lap,
                           jnp.where(m_small, qi_s,
                                     jnp.where(m_one, qi_o, -1)))
            q = qi.astype(dt)
            err = err.at[:, ch, i].set(f - q)
            old = old.at[:, ch, i].set(coef * oldE + prev[:, ch] + q)
            prev = prev.at[:, ch].set(prev[:, ch] + q - beta * q)
    if mono_in:
        return c, old[:, 0], err[:, 0]
    return c, old, err


# ---------------------------------------------------------------------------
# tf_encode with all-zero tf_res (celt_encoder.c:756-794, complexity<2)

def tf_encode_zeros(c: PlanCoder, budget, lm: int, start: int, end: int):
    """tf_res == 0 everywhere, isTransient == 0: codes per-band zero
    bits (budget-gated) and never codes tf_select (the table rows are
    equal for tf_changed == 0)."""
    logp = 4
    tell = bc.tell(c)
    tf_select_rsv = jnp.asarray(lm > 0, _i32) * (tell + logp + 1 <= budget)
    budget_eff = budget - tf_select_rsv
    for i in range(start, end):
        tell = bc.tell(c)
        c = bc.bit_logp(c, tell + logp <= budget_eff, 0, logp)
        logp = 5
    # TF_SELECT_TABLE[lm][0] == [2] when tf_changed == 0 → no select bit
    return c


def spread_decision_c0(c: PlanCoder, budget):
    """complexity==0: SPREAD_NONE, coded when it fits."""
    c = bc.icdf(c, bc.tell(c) + 4 <= budget, 0,
                np.asarray(SPREAD_ICDF, np.int32), 5)
    return c


def tf_encode_batch(c: PlanCoder, tf_res, is_transient, tf_select,
                    budget, lm: int, start: int, end: int):
    """tf_encode (celt_encoder.c:756-794) with real per-stream tf_res
    [B, nb] / is_transient [B] / tf_select [B].

    Returns (coder, tf_change [B, nb] — the TF_SELECT_TABLE-mapped
    values the band tree consumes, tf_sel_out [B])."""
    from .batch_analysis import TF_SELECT_TABLE
    B = tf_res.shape[0]
    ist = is_transient.astype(_i32)
    tbl = np.asarray(TF_SELECT_TABLE[lm], np.int32)
    tbl_j = jnp.asarray(tbl)
    logp = jnp.where(is_transient, 2, 4)
    tell = bc.tell(c)
    rsv = ((lm > 0) & (tell + logp + 1 <= budget)).astype(_i32)
    budget_eff = budget - rsv
    curr = jnp.zeros((B,), _i32)
    tf_changed = jnp.zeros((B,), _i32)
    res_cols = []
    for i in range(start, end):
        tell = bc.tell(c)
        can = tell + logp <= budget_eff
        v = tf_res[:, i]
        c = bc.bit_logp(c, can, v ^ curr, logp)
        curr = jnp.where(can, v, curr)
        tf_changed = tf_changed | jnp.where(can, curr, 0)
        res_cols.append(curr)
        logp = jnp.where(is_transient, 4, 5)
    res = jnp.stack(res_cols, axis=1)             # [B, end-start]
    t_a = _sel_row(tbl_j, 4 * ist + 0 + tf_changed)
    t_b = _sel_row(tbl_j, 4 * ist + 2 + tf_changed)
    need_sel = (rsv == 1) & (t_a != t_b)
    tf_sel_out = jnp.where(need_sel, tf_select, 0)
    c = bc.bit_logp(c, need_sel, tf_sel_out, 1)
    tf_change = _sel_row(
        tbl_j, (4 * ist + 2 * tf_sel_out)[:, None] + res)
    if start > 0:
        tf_change = jnp.pad(tf_change, ((0, 0), (start, 0)))
    return c, tf_change, tf_sel_out


# ---------------------------------------------------------------------------
# dynalloc boost coding (celt_encoder.c:2017-2050)

def dynalloc_coding(c: PlanCoder, offsets_steps, caps, total_bits_q3,
                    lm: int, C: int, start: int, end: int,
                    e_bands: np.ndarray):
    """offsets_steps: [B, nb] int32 — boost step counts from
    dynalloc_analysis.  Returns (coder, offsets_q3 [B, nb], tot_boost).

    The per-band boost-flag walk runs as a ``lax.scan`` over steps
    (compile-friendly: one body per band instead of up to 34 unrolled
    bit_logp call sites)."""
    B = offsets_steps.shape[0]
    dynalloc_logp = jnp.full((B,), 6, _i32)
    total_boost = jnp.zeros((B,), _i32)
    offsets_q3 = jnp.zeros_like(offsets_steps)
    tf = bc.tell_frac(c)
    rng, nbt = c.rng, c.nbits_total
    for i in range(start, end):
        width = C * int(e_bands[i + 1] - e_bands[i]) << lm
        quanta = min(width << BITRES, max(6 << BITRES, width))
        nsteps = min(int(caps[i]) // quanta + 1, 34)
        cap_i = int(caps[i])
        steps_i = offsets_steps[:, i]

        def body(carry, j):
            rng, nbt, tf, loop_logp, boost, total_boost, done = carry
            room = tf + (loop_logp << BITRES) \
                < total_bits_q3 - total_boost
            active = room & (boost < cap_i) & ~done
            flag = (j < steps_i).astype(_i32)
            rng, nbt, row = bc.bit_logp_rn(rng, nbt, active, flag,
                                           loop_logp)
            tf = jnp.where(active, bc.tell_frac_rn(rng, nbt), tf)
            hit = active & (flag == 1)
            boost = boost + jnp.where(hit, quanta, 0)
            total_boost = total_boost + jnp.where(hit, quanta, 0)
            loop_logp = jnp.where(hit, 1, loop_logp)
            done = done | (active & (flag == 0)) | ~active
            return (rng, nbt, tf, loop_logp, boost, total_boost,
                    done), row

        carry0 = (rng, nbt, tf, dynalloc_logp,
                  jnp.zeros((B,), _i32), total_boost,
                  jnp.zeros((B,), bool))
        (rng, nbt, tf, _, boost, total_boost, _), rows = jax.lax.scan(
            body, carry0, jnp.arange(nsteps, dtype=_i32))
        block = rows.transpose(1, 0, 2)             # [B, nsteps, 4]
        c = bc.append_block(c, block,
                            jnp.sum(block[:, :, 0] != -1, axis=1))
        coded_any = boost > 0
        dynalloc_logp = jnp.where(
            coded_any, jnp.maximum(2, dynalloc_logp - 1), dynalloc_logp)
        offsets_q3 = offsets_q3.at[:, i].set(boost)
    c = c._replace(rng=rng, nbits_total=nbt)
    return c, offsets_q3, total_boost


def trim_coding_c0(c: PlanCoder, total_bits_q3, total_boost):
    """alloc_trim == 5 (no analysis at complexity 0)."""
    fits = bc.tell_frac(c) + (6 << BITRES) <= total_bits_q3 - total_boost
    c = bc.icdf(c, fits, 5, np.asarray(TRIM_ICDF, np.int32), 7)
    return c, jnp.full((c.pos.shape[0],), 5, _i32)


# ---------------------------------------------------------------------------
# Allocation (rate.c:248-645), mono

def compute_allocation_batch(c: PlanCoder, t: Tables, offsets_q3, trim,
                             total, lm: int, start: int, end: int,
                             prev_coded, signal_bandwidth, C: int = 1,
                             intensity=None, dual_stereo=None):
    """Vectorized clt_compute_allocation (rate.c:534-645).

    offsets_q3/total/trim/prev_coded/signal_bandwidth: [B] or [B, nb].
    For C == 2, ``intensity`` ([B] int32 band index) and
    ``dual_stereo`` ([B] int32 0/1) are the encoder's requested values;
    the coded (possibly clamped) values are returned.

    Returns (coder, pulses [B,nb], ebits [B,nb], fine_priority [B,nb],
    coded_bands [B], balance [B], intensity' [B], dual_stereo' [B])."""
    nb = len(t.e_bands) - 1
    B = total.shape[0]
    e_bands = t.e_bands
    widths = (e_bands[1:] - e_bands[:-1]).astype(np.int32)
    caps = jnp.asarray(t.caps)
    thresh = jnp.asarray(t.thresh)
    total = jnp.maximum(total, 0)
    logM = lm << BITRES
    alloc_floor = C << BITRES
    skip_rsv = jnp.where(total >= (1 << BITRES), 1 << BITRES, 0)
    total = total - skip_rsv
    if C == 2:
        # intensity + dual reservations (rate.c:556-566)
        intensity_rsv = jnp.full((B,), int(LOG2_FRAC_TABLE[end - start]),
                                 _i32)
        fits = intensity_rsv <= total
        intensity_rsv = jnp.where(fits, intensity_rsv, 0)
        total = total - intensity_rsv
        dual_stereo_rsv = jnp.where(
            fits & (total >= (1 << BITRES)), 1 << BITRES, 0)
        total = total - dual_stereo_rsv
    else:
        intensity_rsv = jnp.zeros((B,), _i32)
        dual_stereo_rsv = jnp.zeros((B,), _i32)

    trim_offset = jnp.zeros((B, nb), _i32)
    for j in range(start, end):
        w = int(widths[j])
        toff = (C * w * (trim - 5 - lm) * (end - j - 1)
                * (1 << (lm + BITRES))) >> 6
        if (w << lm) == 1:
            toff = toff - alloc_floor
        trim_offset = trim_offset.at[:, j].set(toff)

    # bisection over quality vectors (rate.c:580-610)
    lo = jnp.ones((B,), _i32)
    hi = jnp.full((B,), t.nb_alloc_vectors - 1, _i32)
    av = jnp.asarray(t.alloc_vectors)     # [nv, nb]

    def vec_psum(mid):
        psum = jnp.zeros((B,), _i32)
        done = jnp.zeros((B,), bool)
        for j in range(end - 1, start - 1, -1):
            N = int(widths[j])
            bitsj = (C * N * av[mid, j] << lm) >> 2
            bitsj = jnp.where(bitsj > 0,
                              jnp.maximum(0, bitsj + trim_offset[:, j]),
                              bitsj)
            bitsj = bitsj + offsets_q3[:, j]
            take = (bitsj >= thresh[j]) | done
            psum = psum + jnp.where(
                take, jnp.minimum(bitsj, caps[j]),
                jnp.where(bitsj >= alloc_floor, alloc_floor, 0))
            done = done | take
        return psum

    for _ in range(6):      # ceil(log2(nv)) with early-exit semantics
        go = lo <= hi
        mid = (lo + hi) >> 1
        psum = vec_psum(mid)
        over = psum > total
        hi = jnp.where(go & over, mid - 1, hi)
        lo = jnp.where(go & ~over, mid + 1, lo)
    hi = lo
    lo = lo - 1

    bits1 = jnp.zeros((B, nb), _i32)
    bits2 = jnp.zeros((B, nb), _i32)
    skip_start = jnp.full((B,), start, _i32)
    for j in range(start, end):
        N = int(widths[j])
        b1 = (C * N * av[lo, j] << lm) >> 2
        b2 = jnp.where(hi >= t.nb_alloc_vectors, caps[j],
                       (C * N * av[jnp.minimum(hi, t.nb_alloc_vectors - 1),
                                   j] << lm) >> 2)
        b1 = jnp.where(b1 > 0, jnp.maximum(0, b1 + trim_offset[:, j]), b1)
        b2 = jnp.where(b2 > 0, jnp.maximum(0, b2 + trim_offset[:, j]), b2)
        b1 = b1 + jnp.where(lo > 0, offsets_q3[:, j], 0)
        b2 = b2 + offsets_q3[:, j]
        skip_start = jnp.where(offsets_q3[:, j] > 0, j, skip_start)
        bits2 = bits2.at[:, j].set(jnp.maximum(0, b2 - b1))
        bits1 = bits1.at[:, j].set(b1)

    # interp_bits2pulses: 6-step interpolation (rate.c:261-287)
    lo2 = jnp.zeros((B,), _i32)
    hi2 = jnp.full((B,), 1 << ALLOC_STEPS, _i32)
    for _ in range(ALLOC_STEPS):
        mid = (lo2 + hi2) >> 1
        psum = jnp.zeros((B,), _i32)
        done = jnp.zeros((B,), bool)
        for j in range(end - 1, start - 1, -1):
            tmp = bits1[:, j] + ((mid * bits2[:, j]) >> ALLOC_STEPS)
            take = (tmp >= thresh[j]) | done
            psum = psum + jnp.where(
                take, jnp.minimum(tmp, caps[j]),
                jnp.where(tmp >= alloc_floor, alloc_floor, 0))
            done = done | take
        over = psum > total
        hi2 = jnp.where(over, mid, hi2)
        lo2 = jnp.where(over, lo2, mid)
    psum = jnp.zeros((B,), _i32)
    done = jnp.zeros((B,), bool)
    bits = jnp.zeros((B, nb), _i32)
    for j in range(end - 1, start - 1, -1):
        tmp = bits1[:, j] + ((lo2 * bits2[:, j]) >> ALLOC_STEPS)
        low = (tmp < thresh[j]) & ~done
        tmp = jnp.where(low,
                        jnp.where(tmp >= alloc_floor, alloc_floor, 0),
                        tmp)
        done = done | ~low
        tmp = jnp.minimum(tmp, caps[j])
        bits = bits.at[:, j].set(tmp)
        psum = psum + tmp

    # skip decisions back-to-front, coded (rate.c:314-391)
    coded_bands = jnp.full((B,), end, _i32)
    stopped = jnp.zeros((B,), bool)
    ebN = jnp.asarray(e_bands.astype(np.int32))
    for j in range(end - 1, start, -1):
        on_j = (coded_bands - 1 == j) & ~stopped
        hit_skip_start = on_j & (j <= skip_start)
        total = total + jnp.where(hit_skip_start, skip_rsv, 0)
        stopped = stopped | hit_skip_start
        active = on_j & ~hit_skip_start
        left = total - psum
        denom = (ebN[coded_bands] - ebN[start])
        percoeff = left // jnp.maximum(denom, 1)
        left = left - denom * percoeff
        rem = jnp.maximum(left - (ebN[j] - ebN[start]), 0)
        band_width = ebN[coded_bands] - ebN[j]
        band_bits = bits[:, j] + percoeff * band_width + rem
        above = band_bits >= jnp.maximum(thresh[j],
                                         alloc_floor + (1 << BITRES))
        # encoder skip choice (rate.c:335-360)
        depth_thr = jnp.where(coded_bands > 17,
                              jnp.where(j < prev_coded, 7, 9), 0)
        choose_stop = (coded_bands <= start + 2) | (
            (band_bits > ((depth_thr * band_width << lm << BITRES) >> 4))
            & (j <= signal_bandwidth))
        code_mask = active & above
        stop_now = code_mask & choose_stop
        c = bc.bit_logp(c, code_mask, stop_now.astype(_i32), 1)
        stopped = stopped | stop_now
        cont = active & ~stop_now
        dec = cont & above
        psum = psum + jnp.where(dec, 1 << BITRES, 0)
        band_bits = band_bits - jnp.where(dec, 1 << BITRES, 0)
        psum = psum - jnp.where(cont, bits[:, j] + intensity_rsv, 0)
        # shrink the intensity reservation with the band count
        # (rate.c:381-385)
        new_irsv = jnp.where(intensity_rsv > 0,
                             int(LOG2_FRAC_TABLE[j - start]), 0)
        psum = psum + jnp.where(cont, new_irsv, 0)
        intensity_rsv = jnp.where(cont, new_irsv, intensity_rsv)
        give_floor = cont & (band_bits >= alloc_floor)
        psum = psum + jnp.where(give_floor, alloc_floor, 0)
        bits = bits.at[:, j].set(
            jnp.where(give_floor, alloc_floor,
                      jnp.where(cont, 0, bits[:, j])))
        coded_bands = coded_bands - cont.astype(_i32)
    # streams that walked all the way down to start+? and never coded a
    # stop bit get the skip reserve back when they hit skip_start; any
    # stream still unstopped with coded_bands-1 <= skip_start:
    final_hit = ~stopped & (coded_bands - 1 <= skip_start)
    total = total + jnp.where(final_hit, skip_rsv, 0)

    # intensity / dual-stereo symbols (rate.c:394-420)
    if C == 2:
        has_int = intensity_rsv > 0
        intensity = jnp.minimum(intensity, coded_bands)
        c = bc.uint(c, has_int, intensity - start,
                    (coded_bands + 1 - start).astype(jnp.uint32))
        intensity = jnp.where(has_int, intensity, 0)
        give_back = (intensity <= start) & (dual_stereo_rsv > 0)
        total = total + jnp.where(give_back, dual_stereo_rsv, 0)
        dual_stereo_rsv = jnp.where(give_back, 0, dual_stereo_rsv)
        has_dual = dual_stereo_rsv > 0
        c = bc.bit_logp(c, has_dual, dual_stereo.astype(_i32), 1)
        dual_stereo = jnp.where(has_dual, dual_stereo, 0)
    else:
        intensity = jnp.zeros((B,), _i32)
        dual_stereo = jnp.zeros((B,), _i32)

    # final distribution (rate.c:422-433)
    left = total - psum
    denom = (ebN[coded_bands] - ebN[start])
    percoeff = left // jnp.maximum(denom, 1)
    left = left - denom * percoeff
    for j in range(start, end):
        inb = j < coded_bands
        bits = bits.at[:, j].add(
            jnp.where(inb, percoeff * int(widths[j]), 0))
    for j in range(start, end):
        inb = j < coded_bands
        tmp = jnp.minimum(left, int(widths[j]))
        bits = bits.at[:, j].add(jnp.where(inb, tmp, 0))
        left = left - jnp.where(inb, tmp, 0)

    # fine-energy split (rate.c:436-529)
    stereo = 1 if C == 2 else 0
    ebits = jnp.zeros((B, nb), _i32)
    fine_priority = jnp.zeros((B, nb), _i32)
    balance = jnp.zeros((B,), _i32)
    for j in range(start, end):
        inb = j < coded_bands
        N0 = int(widths[j])
        N = N0 << lm
        bit = bits[:, j] + balance
        if N > 1:
            excess = jnp.maximum(bit - caps[j], 0)
            bj = bit - excess
            # den: fractional half-bit for mid-only theta bands
            # (rate.c:462-466)
            den = C * N + jnp.where(
                (C == 2) & (N > 2) & (dual_stereo == 0)
                & (j < intensity), 1, 0)
            NClogN = den * (int(t.log_n[j]) + logM)
            offset = (NClogN >> 1) - den * FINE_OFFSET
            if N == 2:
                offset = offset + (den << BITRES >> 2)
            offset = offset + jnp.where(
                bj + offset < (den * 2) << BITRES, NClogN >> 2,
                jnp.where(bj + offset < (den * 3) << BITRES,
                          NClogN >> 3, 0))
            eb = jnp.maximum(0, bj + offset + (den << (BITRES - 1)))
            eb = (eb // den) >> BITRES
            eb = jnp.where(C * eb > (bj >> BITRES),
                           bj >> stereo >> BITRES, eb)
            eb = jnp.minimum(eb, MAX_FINE_BITS)
            fp = (eb * (den << BITRES) >= bj + offset).astype(_i32)
            bj = bj - (C * eb << BITRES)
        else:
            excess = jnp.maximum(0, bit - (C << BITRES))
            bj = bit - excess
            eb = jnp.zeros((B,), _i32)
            fp = jnp.ones((B,), _i32)
        extra_fine = jnp.minimum(excess >> (stereo + BITRES),
                                 MAX_FINE_BITS - eb)
        has_excess = excess > 0
        eb2 = eb + jnp.where(has_excess, extra_fine, 0)
        extra_bits = extra_fine * C << BITRES
        fp = jnp.where(has_excess,
                       (extra_bits >= excess - balance).astype(_i32), fp)
        excess2 = excess - jnp.where(has_excess, extra_bits, 0)
        new_balance = excess2
        # only bands < coded_bands update running balance/bits
        ebits = ebits.at[:, j].set(jnp.where(inb, eb2, 0))
        fine_priority = fine_priority.at[:, j].set(jnp.where(inb, fp, 0))
        bits = bits.at[:, j].set(jnp.where(inb, bj, bits[:, j]))
        balance = jnp.where(inb, new_balance, balance)
    # skipped bands: everything becomes fine energy (rate.c:522-529)
    for j in range(start, end):
        skipped = j >= coded_bands
        eb = bits[:, j] >> stereo >> BITRES
        ebits = ebits.at[:, j].set(jnp.where(skipped, eb, ebits[:, j]))
        fine_priority = fine_priority.at[:, j].set(
            jnp.where(skipped, (eb < 1).astype(_i32),
                      fine_priority[:, j]))
        bits = bits.at[:, j].set(jnp.where(skipped, 0, bits[:, j]))
    return (c, bits, ebits, fine_priority, coded_bands, balance,
            intensity, dual_stereo)


# ---------------------------------------------------------------------------
# Fine energy (quant_bands.c:361-396), mono

def fine_energy(c: PlanCoder, oldEBands, error, ebits, start: int,
                end: int):
    """quant_fine_energy (quant_bands.c:361-396).  oldEBands/error:
    [B, nb] (mono) or [B, C, nb], band-major channel-minor symbols."""
    dt = error.dtype
    mono_in = error.ndim == 2
    if mono_in:
        oldEBands = oldEBands[:, None, :]
        error = error[:, None, :]
    C = error.shape[1]
    for i in range(start, end):
        fq = ebits[:, i]
        has = fq > 0
        frac = (1 << fq).astype(dt)
        for ch in range(C):
            q2 = jnp.floor((error[:, ch, i] + 0.5) * frac).astype(_i32)
            q2 = jnp.clip(q2, 0, (1 << fq) - 1)
            c = bc.bits(c, has, q2, fq)
            offset = ((q2.astype(dt) + 0.5)
                      * (1 << (14 - fq)).astype(dt) / 16384.0 - 0.5)
            offset = jnp.where(has, offset, 0)
            oldEBands = oldEBands.at[:, ch, i].add(offset)
            error = error.at[:, ch, i].add(-offset)
    if mono_in:
        return c, oldEBands[:, 0], error[:, 0]
    return c, oldEBands, error


def energy_finalise(c: PlanCoder, oldEBands, error, ebits, fine_priority,
                    bits_left, start: int, end: int):
    """quant_energy_finalise (quant_bands.c:398-426)."""
    dt = error.dtype
    mono_in = error.ndim == 2
    if mono_in:
        oldEBands = oldEBands[:, None, :]
        error = error[:, None, :]
    C = error.shape[1]
    for prio in range(2):
        for i in range(start, end):
            go = (bits_left >= C) & (ebits[:, i] < MAX_FINE_BITS) \
                & (fine_priority[:, i] == prio)
            for ch in range(C):
                q2 = (error[:, ch, i] >= 0).astype(_i32)
                c = bc.bits(c, go, q2, 1)
                offset = (q2.astype(dt) - 0.5) \
                    * (1 << (14 - ebits[:, i] - 1)).astype(dt) / 16384.0
                offset = jnp.where(go, offset, 0)
                oldEBands = oldEBands.at[:, ch, i].add(offset)
                error = error.at[:, ch, i].add(-offset)
            bits_left = bits_left - C * go.astype(_i32)
    if mono_in:
        return c, oldEBands[:, 0], error[:, 0]
    return c, oldEBands, error


# ---------------------------------------------------------------------------
# Bit-exact integer helpers (bands.c:42-91)

def _frac_mul16(a, b):
    return (16384 + a * b) >> 15


def _bitexact_cos(x):
    tmp = (4096 + x * x) >> 13
    x2 = tmp
    x2 = (32767 - x2) + _frac_mul16(
        x2, -7651 + _frac_mul16(x2, 8277 + _frac_mul16(-626, x2)))
    return 1 + x2


def _bitexact_log2tan(isin, icos):
    lc = bc.ec_ilog(icos.astype(jnp.uint32))
    ls = bc.ec_ilog(isin.astype(jnp.uint32))
    icos = icos << (15 - lc)
    isin = isin << (15 - ls)
    return ((ls - lc) * (1 << 11)
            + _frac_mul16(isin, _frac_mul16(isin, -2597) + 7932)
            - _frac_mul16(icos, _frac_mul16(icos, -2597) + 7932))


def _compute_qn(N, b, offset, pulse_cap, sub_n2=False):
    """bands.c:647-671.  ``sub_n2``: the stereo N==2 case drops one
    degree of freedom (N2 -= 1, bands.c:652-653)."""
    EXP2_TABLE8 = jnp.asarray(
        np.array([16384, 17866, 19483, 21247, 23170, 25267, 27554, 30048],
                 np.int32))
    N2 = 2 * N - 1 - jnp.asarray(sub_n2, _i32)
    num = b + N2 * offset
    qb = jnp.where(num >= 0, num // N2, -((-num) // N2))
    qb = jnp.minimum(b - pulse_cap - (4 << BITRES), qb)
    qb = jnp.minimum(8 << BITRES, qb)
    qn = EXP2_TABLE8[qb & 0x7] >> (14 - (qb >> BITRES))
    qn = ((qn + 1) >> 1) << 1
    return jnp.where(qb < ((1 << BITRES) >> 1), 1, qn)


def _seq_sum(x, exact: bool):
    """Σ over the last axis; ``exact`` = strict left-to-right order to
    match the scalar encoder's accumulation bit-for-bit (CPU float64
    verification); otherwise let XLA pick the fast reduction."""
    if not exact:
        return jnp.sum(x, axis=-1)

    def step(acc, col):
        return acc + col, None

    acc, _ = jax.lax.scan(step, jnp.zeros(x.shape[:-1], x.dtype), x.T)
    return acc


# ---------------------------------------------------------------------------
# PVQ search + CWRS index (vq.c:165-328, cwrs.c:440-461)

def pvq_search_batch(Xseg, K, kmax: int, exact: bool):
    """op_pvq_search over [B, N]; K: [B] pulses (>=1 where used).

    Returns iy [B, N] int32 (signed pulse vector)."""
    B, N = Xseg.shape
    dt = Xseg.dtype
    sign = Xseg < 0
    X = jnp.abs(Xseg)
    do_proj = K > (N >> 1)
    acc = _seq_sum(X, exact)
    bad = ~((acc > EPSILON) & (acc < 64))
    fix = do_proj & bad
    onehot = jnp.zeros((B, N), dt).at[:, 0].set(1.0)
    X = jnp.where(fix[:, None], onehot, X)
    acc = jnp.where(fix, jnp.asarray(1.0, dt), acc)
    rcp = (K.astype(dt) + jnp.asarray(0.8, dt)) / acc
    iy = jnp.where(do_proj[:, None],
                   jnp.floor(rcp[:, None] * X), 0.0).astype(_i32)
    yf = iy.astype(dt)
    yy = _seq_sum(yf * yf, exact)
    xy = _seq_sum(X * yf, exact)
    y2 = 2.0 * yf
    pulses_left = K - jnp.where(do_proj, jnp.sum(iy, axis=-1), 0)
    # lump pathological remainders into bin 0 (vq.c:228-233)
    dump = pulses_left > N + 3
    tmpf = pulses_left.astype(dt)
    yy = yy + jnp.where(dump, tmpf * tmpf + tmpf * y2[:, 0], 0.0)
    iy = iy.at[:, 0].add(jnp.where(dump, pulses_left, 0))
    y2 = y2.at[:, 0].add(jnp.where(dump, 2.0 * tmpf, 0.0))
    pulses_left = jnp.where(dump, 0, pulses_left)

    iters = min(kmax, N + 3)

    def body(_, carry):
        iy, y2, xy, yy, left = carry
        go = left > 0
        yy1 = yy + 1.0
        rxy = xy[:, None] + X
        ryy = yy1[:, None] + y2
        ratio = (rxy * rxy) / ryy
        best = jnp.argmax(ratio, axis=-1)
        bx = jnp.take_along_axis(X, best[:, None], 1)[:, 0]
        by = jnp.take_along_axis(y2, best[:, None], 1)[:, 0]
        xy2 = jnp.where(go, xy + bx, xy)
        yy2 = jnp.where(go, yy1 + by, yy)
        onehot_b = (jnp.arange(N)[None, :] == best[:, None]) & go[:, None]
        y2 = y2 + jnp.where(onehot_b, 2.0, 0.0)
        iy = iy + onehot_b.astype(_i32)
        return iy, y2, xy2, yy2, left - go.astype(_i32)

    iy, y2, xy, yy, pulses_left = jax.lax.fori_loop(
        0, iters, body, (iy, y2, xy, yy, pulses_left))
    return jnp.where(sign, -iy, iy)


def icwrs_batch(iy, u_tab):
    """Pulse vector [B, N] -> (index uint32, K uint32) (cwrs.c:440)."""
    B, N = iy.shape
    u = jnp.asarray(u_tab)        # [nmax+2, kmax+3] uint32

    yl = jnp.abs(iy[:, N - 1])
    idx = (iy[:, N - 1] < 0).astype(jnp.uint32)
    k = yl

    def body(jj, carry):
        idx, k = carry
        j = N - 2 - jj
        dim = N - j
        yj = iy[:, j]
        idx = idx + u[dim, k]
        k = k + jnp.abs(yj)
        idx = idx + jnp.where(yj < 0, u[dim, k + 1], np.uint32(0))
        return idx, k

    idx, k = jax.lax.fori_loop(0, N - 1, body, (idx, k))
    v = u[N, k] + u[N, k + 1]
    return idx, v


# ---------------------------------------------------------------------------
# The mono band tree (bands.c:943-1105, encode / no-resynth)
#
# TPU-first restructuring: instead of unrolling the quant_partition
# recursion into one XLA subgraph per node (which made compile time
# explode with ~400 nodes at LM=3), the whole multi-band tree runs as a
# SINGLE ``lax.scan`` over a static preorder node schedule
# (``_band_schedule``).  The scan body is one generic node processor,
# padded to the widest band; per-stream divergence (leaf vs split,
# child order swaps, budgets) is data, gathered from per-node state
# buffers written by parent steps.  The emitted plan rows land in a
# [B, 3*n_steps, 4] block in exact coder order.

class _Sched(NamedTuple):
    """Static preorder schedule over the nodes of a contiguous *group*
    of equal-root-width bands (see ``_band_schedule_groups``)."""
    n_steps: int
    NBmax: int
    rowlen: int
    kmax: int               # max PVQ pulse count over nodes
    base: int               # group's first spectrum column
    Wg: int                 # group's spectrum width
    stereo: int             # 0/1: carried buffer holds a Y plane at +Wg
    band: np.ndarray        # [n] band index
    win: np.ndarray         # [n] node window start, group-local.
                            # Windows are STATIC: child-order swaps are
                            # materialised into the carried spectrum
                            # instead of tracked as per-stream offsets.
    is_root: np.ndarray     # [n] 1 at each band's first node
    is_n1: np.ndarray       # [n] 1 for width-1 bands (sign path)
    first_band: np.ndarray  # [n] 1 iff band == start
    N: np.ndarray           # [n] node width
    can_split: np.ndarray   # [n]
    parent: np.ndarray      # [n] group-local node id (-1 root)
    is_second: np.ndarray   # [n]
    cache_row: np.ndarray   # [n, rowlen] bits cache (padded with last)
    maxq: np.ndarray        # [n]
    thresh: np.ndarray      # [n] split threshold
    pulse_cap: np.ndarray   # [n] for compute_qn at this node's split
    kind: np.ndarray        # [n] 0 = mono node, 1 = stereo band root
    poff: np.ndarray        # [n] partner-window offset for the child
                            # swap (mono split: N>>1; stereo root: Wg)
    st_pcap: np.ndarray     # [n] band-level pulse cap (stereo theta)
    lmk: np.ndarray         # [n] node LM (band LM minus split depth)
    depth: np.ndarray       # [n] splits below the band/subtree entry
    entry: np.ndarray       # [n] 1 at channel-subtree entries needing
                            # the in-scan band shape transform (stereo
                            # groups only; mono pre-transforms outside)
    wclass: np.ndarray      # [n] width-class id into ``classes``
    classes: tuple          # ((W, kmax, bbset, entry, leafable), ...)


def _sched_from_recs(recs, start: int, cache_bits,
                     stereo: int = 0, Wg: int = 0,
                     lm: int = 3) -> _Sched:
    from .batch_analysis import band_combo_specs
    m = standard_mode()
    n = len(recs)
    NBmax = max(r["N"] for r in recs)
    rowlen = max(r["maxq"] for r in recs) + 1
    kmax = max(1, max(get_pulses(r["maxq"]) for r in recs))
    base = min(r["xlo"] for r in recs)
    if not Wg:
        Wg = max(r["xlo"] + r["N"] for r in recs) - base
    cache_rows = np.zeros((n, rowlen), np.int32)
    for j, r in enumerate(recs):
        if not r["is_n1"] and not r["kind"]:
            row = cache_bits[r["cache_off"]:
                             r["cache_off"] + r["maxq"] + 1]
            cache_rows[j, :len(row)] = row
            cache_rows[j, len(row):] = row[-1]

    def arr(key, dt=np.int32):
        return np.asarray([r[key] for r in recs], dt)

    poff = np.asarray([Wg if r["kind"] else (r["N"] >> 1)
                       for r in recs], np.int32)

    # width classes for the in-scan leaf/transform dispatch: nodes that
    # can never leaf (n1 / stereo roots) share the null class 0
    classes = [(0, 1, (1,), False, False)]
    wclass = np.zeros(n, np.int32)
    for j, r in enumerate(recs):
        if r["is_n1"] or r["kind"]:
            continue
        bandN = (int(m.e_bands[r["band"] + 1])
                 - int(m.e_bands[r["band"]])) << lm
        b2set = {1} | {B2 for _k, B2, _o in band_combo_specs(bandN, lm)}
        d = int(r["depth"])
        bbset = tuple(sorted({max(b2 >> d, 1) for b2 in b2set}))
        key = (int(r["N"]), int(get_pulses(r["maxq"])), bbset,
               bool(r.get("entry", 0)), True)
        # merge classes of equal (W, bbset, entry) taking the max kmax
        found = None
        for ci, (W, km, bs, en, lf) in enumerate(classes):
            if (W, bs, en, lf) == (key[0], key[2], key[3], True):
                found = ci
                if key[1] > km:
                    classes[ci] = (W, key[1], bs, en, lf)
                break
        if found is None:
            classes.append(key)
            found = len(classes) - 1
        wclass[j] = found

    return _Sched(
        n_steps=n, NBmax=NBmax, rowlen=rowlen, kmax=kmax,
        base=base, Wg=Wg, stereo=stereo,
        band=arr("band"),
        win=np.asarray([r["xlo"] - base for r in recs], np.int32),
        is_root=arr("is_root"),
        is_n1=arr("is_n1"),
        first_band=np.asarray(
            [int(r["band"] == start and r["is_root"]) for r in recs],
            np.int32),
        N=arr("N"), can_split=arr("can_split"), parent=arr("parent"),
        is_second=arr("is_second"), cache_row=cache_rows,
        maxq=arr("maxq"), thresh=arr("thresh"), pulse_cap=arr("pcap"),
        kind=arr("kind"), poff=poff, st_pcap=arr("st_pcap"),
        lmk=arr("lmk"), depth=arr("depth"),
        entry=np.asarray([int(r.get("entry", 0)) for r in recs],
                         np.int32),
        wclass=wclass, classes=tuple(classes))


@lru_cache(maxsize=None)
def _band_schedule_groups(lm: int, start: int, end: int,
                          stereo: bool = False):
    """Preorder node schedules, split into groups of consecutive bands
    with equal root width.

    The tree scan's per-step cost is O(B * NBmax * K): one schedule for
    all 21 bands pads every node to the widest band (176 bins at LM=3).
    Band widths are monotone, so grouping by width and running one scan
    per group carries only the [B] coder state (rng/tell/balance/rem —
    the only cross-band data flow in bands.c:1398-1672) across groups
    while each group pays its own width — ~3-4x less vector work.

    With ``stereo`` each band gets a *stereo root* node
    (compute_theta/intensity/dual dispatch, bands.c:1235-1381) whose two
    children are the band's mono X/Y subtrees; the Y plane lives at
    +Wg in the carried group buffer."""
    m = standard_mode()
    t = make_tables(lm, 2 if stereo else 1)
    nb = m.nb_ebands
    M = 1 << lm
    widths = (t.e_bands[1:] - t.e_bands[:-1]).astype(np.int64)
    groups = []
    cur = []              # recs of the current group
    cur_width = None

    def add(recs, band, xlo, is_root, is_n1, N, lmk, parent,
            is_second, kind=0, depth=0, entry=0):
        can_split = int(kind == 0 and lmk != -1 and N > 2)
        if is_n1 or kind:
            cache_off, maxq, thresh, pcap = 0, 0, 0, 0
        else:
            cache_off = int(t.cache_index[(lmk + 1) * nb + band])
            maxq = int(t.cache_bits[cache_off])
            thresh = int(t.cache_bits[cache_off + maxq]) + 12 \
                if can_split else 0
            pcap = int(t.log_n[band]) + (lmk - 1) * (1 << BITRES)
        # band-level pulse cap for the stereo root's compute_qn
        # (bands.c:712: log_n + LM*(1<<BITRES) at the band's LM)
        st_pcap = int(t.log_n[band]) + lmk * (1 << BITRES)
        recs.append(dict(band=band, xlo=xlo, is_root=is_root,
                         is_n1=is_n1, N=N, lmk=lmk, parent=parent,
                         is_second=is_second, can_split=can_split,
                         cache_off=cache_off, maxq=maxq, thresh=thresh,
                         pcap=pcap, kind=kind, st_pcap=st_pcap,
                         depth=depth, entry=entry))
        idx = len(recs) - 1
        if can_split:
            # static child windows: the first-coded child always owns
            # [xlo, xlo+half) — a parent-order swap physically swaps
            # the halves in the carried spectrum instead
            half = N >> 1
            add(recs, band, xlo, 0, 0, half, lmk - 1, idx, 0,
                depth=depth + 1)
            add(recs, band, xlo + half, 0, 0, half, lmk - 1, idx, 1,
                depth=depth + 1)
        return idx

    def add_band(recs, i, base_off):
        xlo = M * int(t.e_bands[i]) - base_off
        N = M * int(widths[i])
        if not stereo:
            add(recs, i, xlo + base_off, 1, int(N == 1), N, lm, -1, 0)
            return
        # stereo root; children are the X and Y mono subtrees.  The Y
        # window offset (+Wg) is resolved in _sched_from_recs via poff.
        ridx = add(recs, i, xlo + base_off, 1, int(N == 1), N, lm, -1,
                   0, kind=1)
        if N > 1:
            add(recs, i, xlo + base_off, 0, 0, N, lm, ridx, 0,
                entry=1)
            # Y subtree windows are shifted by +Wg when the group is
            # assembled (they index the Y plane)
            recs_y_start = len(recs)
            add(recs, i, xlo + base_off, 0, 0, N, lm, ridx, 1,
                entry=1)
            for r in recs[recs_y_start:]:
                r["y_plane"] = True

    for i in range(start, end):
        w = int(widths[i])
        if cur_width is not None and w != cur_width:
            groups.append(_finish_group(cur, start, t.cache_bits,
                                        stereo, lm))
            cur = []
        cur_width = w
        add_band(cur, i, 0)
    groups.append(_finish_group(cur, start, t.cache_bits, stereo, lm))
    return tuple(groups)


def _finish_group(recs, start: int, cache_bits, stereo: bool,
                  lm: int) -> _Sched:
    """Resolve Y-plane windows (xlo += Wg) then build the schedule."""
    Wg = 0
    if stereo:
        base = min(r["xlo"] for r in recs)
        Wg = max(r["xlo"] + r["N"] for r in recs
                 if not r.get("y_plane")) - base
        for r in recs:
            if r.get("y_plane"):
                r["xlo"] += Wg
    return _sched_from_recs(recs, start, cache_bits, int(stereo), Wg,
                            lm)


def _seq_sum_masked(x, exact: bool):
    """Σ over the last axis (padded entries must already be zero)."""
    return _seq_sum(x, exact)


# TPU-friendly gathers: XLA lowers fancy gathers to serialized scalar
# loads on TPU (~ms for [B, NB] indices), so inside the hot scan every
# table lookup is expressed as a one-hot compare + reduce (vector ops)
# instead.

def _sel_row(row, idx):
    """row: [R] (shared table), idx: [...] int -> row[idx]."""
    R = row.shape[0]
    cmp = idx[..., None] == jnp.arange(R)
    return jnp.sum(jnp.where(cmp, row, 0), axis=-1, dtype=row.dtype)


def _sel_tab(tab, idx):
    """tab: [J, K] (static per-position rows), idx: [B, J] ->
    out[b, j] = tab[j, idx[b, j]]."""
    K = tab.shape[1]
    cmp = idx[:, :, None] == jnp.arange(K)[None, None, :]
    return jnp.sum(jnp.where(cmp, tab[None, :, :], 0), axis=-1,
                   dtype=tab.dtype)


def _pvq_search_node(Xseg, K, valid, Nj, kmax_j, exact: bool):
    """op_pvq_search on a width-padded segment.  Xseg [B, NBmax] with
    zeros outside ``valid``; Nj, kmax_j: traced scalars for this step.
    Mirrors pvq_search_batch (vq.c:165-328)."""
    B, NB = Xseg.shape
    dt = Xseg.dtype
    sign = Xseg < 0
    X = jnp.abs(Xseg)
    do_proj = K > (Nj >> 1)
    acc = _seq_sum(X, exact)
    bad = ~((acc > EPSILON) & (acc < 64))
    fix = do_proj & bad
    onehot = jnp.zeros((B, NB), dt).at[:, 0].set(1.0)
    X = jnp.where(fix[:, None], onehot, X)
    acc = jnp.where(fix, jnp.asarray(1.0, dt), acc)
    rcp = (K.astype(dt) + jnp.asarray(0.8, dt)) / acc
    iy = jnp.where(do_proj[:, None],
                   jnp.floor(rcp[:, None] * X), 0.0).astype(_i32)
    yf = iy.astype(dt)
    yy = _seq_sum(yf * yf, exact)
    xy = _seq_sum(X * yf, exact)
    y2 = 2.0 * yf
    pulses_left = K - jnp.where(do_proj, jnp.sum(iy, axis=-1), 0)
    dump = pulses_left > Nj + 3
    tmpf = pulses_left.astype(dt)
    yy = yy + jnp.where(dump, tmpf * tmpf + tmpf * y2[:, 0], 0.0)
    iy = iy.at[:, 0].add(jnp.where(dump, pulses_left, 0))
    y2 = y2.at[:, 0].add(jnp.where(dump, 2.0 * tmpf, 0.0))
    pulses_left = jnp.where(dump, 0, pulses_left)

    neg_inf = jnp.asarray(-jnp.inf, dt)
    iters = jnp.minimum(kmax_j, Nj + 3)

    # The pulse loop runs TRANSPOSED ([NB, B]: batch on the 128-lane
    # minor axis, width on sublanes) — with the natural [B, NB] layout
    # a narrow width occupies the lane axis at low utilisation and
    # every argmax is a lane-masked reduce.  Same ops, same order,
    # first-max argmax either way => bit-identical results.  Node
    # widths: mono schedules pad to <=32; stereo groups reach 144
    # (wide no-split leaves appear whenever a band's bits stay under
    # the split threshold).  With B >= 1024 on the lane axis the
    # transposed form stays the better layout even for those.
    Xt = X.T
    validt = valid.T
    y2t = y2.T
    iyt = iy.T

    # scalar-counter cond: the loop runs max(pulses_left) iterations
    # either way, but a scalar compare avoids re-reducing the [B]
    # pulses_left vector (a cross-batch barrier) every pulse
    def cond(carry):
        return carry[5] > 0

    def one_pulse(carry):
        iyt, y2t, xy, yy, left, n_it = carry
        go = left > 0
        yy1 = yy + 1.0
        rxy = xy[None, :] + Xt
        ryy = yy1[None, :] + y2t
        ratio = jnp.where(validt, (rxy * rxy) / ryy, neg_inf)
        best = jnp.argmax(ratio, axis=0)
        oh = jnp.arange(NB)[:, None] == best[None, :]
        bx = jnp.sum(jnp.where(oh, Xt, 0.0), axis=0)
        by = jnp.sum(jnp.where(oh, y2t, 0.0), axis=0)
        xy2 = jnp.where(go, xy + bx, xy)
        yy2 = jnp.where(go, yy1 + by, yy)
        onehot_b = oh & go[None, :]
        y2t = y2t + jnp.where(onehot_b, 2.0, 0.0)
        iyt = iyt + onehot_b.astype(_i32)
        return iyt, y2t, xy2, yy2, left - go.astype(_i32), n_it - 1

    body = one_pulse

    pulses_left = jnp.minimum(pulses_left, iters)   # loop-count bound
    n_it = jnp.max(pulses_left)
    iyt, y2t, xy, yy, _, _ = jax.lax.while_loop(
        cond, body, (iyt, y2t, xy, yy, pulses_left, n_it))
    return jnp.where(sign, -iyt.T, iyt.T)


@lru_cache(maxsize=None)
def _icwrs_col_parts(group_key):
    """Static column partition for the ragged icwrs U-select.

    Column c (of the right-aligned padded vector) sits at distance
    d = NB - c from the right edge and is only read by nodes of width
    >= d.  Node pulse bounds shrink sharply with width (K*N is roughly
    constant), so the one-hot compare range per column is bounded by
    the max K over node widths >= d — the full 128-ish range is needed
    only for the last few columns.  Returns ((c0, c1, kdim), ...) of
    contiguous equal-bound ranges covering [0, NB-1)."""
    NB, width_bounds = group_key
    kb = dict(width_bounds)
    widths = sorted(kb)

    def bound_for_dim(d):
        return max((kb[w] for w in widths if w >= d), default=1) + 3

    parts = []
    c = 0
    while c < NB - 1:
        b = bound_for_dim(NB - c)
        c1 = c + 1
        while c1 < NB - 1 and bound_for_dim(NB - c1) == b:
            c1 += 1
        parts.append((c, c1, b))
        c = c1
    return tuple(parts)


def _group_icwrs_key(s: _Sched):
    kb = {}
    for N, maxq, n1 in zip(s.N.tolist(), s.maxq.tolist(),
                           s.is_n1.tolist()):
        if not n1:
            kb[int(N)] = max(kb.get(int(N), 0),
                             get_pulses(int(maxq)))
    return (s.NBmax, tuple(sorted(kb.items())))


def _icwrs_node(iy, u_parts, u_row, Nj):
    """icwrs on a width-padded pulse vector (cwrs.c:440-461), fully
    vectorized: the running pulse count at each position is a suffix
    sum, so every U-table term evaluates in parallel as a one-hot
    select (uint32 sums wrap identically in any order).  The select is
    *ragged*: each static column range uses only the K range its
    possible node widths allow (``_icwrs_col_parts``).

    u_parts: [((c0, c1, kd), u_slice [c1-c0, kd]), ...];
    u_row: [kdim] = U(Nj, ·) for this node (a static xs row)."""
    B, NB = iy.shape
    iyr = jnp.roll(iy, NB - Nj, axis=1)          # values in cols tail
    ay = jnp.abs(iyr)
    # suffix[p] = sum of |y| at positions > p
    suffix = jnp.cumsum(ay[:, ::-1], axis=1)[:, ::-1] - ay
    cols = jnp.arange(NB)[None, :]
    mask = (cols < NB - 1) & (cols >= NB - Nj)
    tparts = []
    for (c0, c1, kd), up in u_parts:
        sfx = suffix[:, c0:c1]
        t1p = _sel_tab(up, jnp.clip(sfx, 0, kd - 1))
        t2p = jnp.where(iyr[:, c0:c1] < 0,
                        _sel_tab(up, jnp.clip(sfx + ay[:, c0:c1] + 1,
                                              0, kd - 1)),
                        np.uint32(0))
        tparts.append(t1p + t2p)
    t12 = jnp.concatenate(
        tparts + [jnp.zeros((B, 1), jnp.uint32)], axis=1)
    idx = jnp.sum(jnp.where(mask, t12, np.uint32(0)), axis=1,
                  dtype=jnp.uint32)
    idx = idx + (iyr[:, NB - 1] < 0).astype(jnp.uint32)
    k = suffix[:, 0] + ay[:, 0]                   # total pulses
    v = _sel_row(u_row, k) + _sel_row(u_row, k + 1)
    return idx, v


QTHETA_OFFSET_TWOPHASE = 16             # bands.c:57


def quant_all_bands_batch(c: PlanCoder, X, pulses, coded_bands,
                          total_bits_q3, balance0, t: Tables, lm: int,
                          start: int, end: int, exact: bool,
                          Y=None, intensity=None, dual_stereo=None,
                          bandE=None, disable_inv: bool = False,
                          spread=None, transient=None, tf_change=None,
                          rotations: bool = False):
    """bands.c:1398-1672 encode path, no resynth — a sequence of
    ``lax.scan``s over static preorder node schedules, one per
    band-width group (``_band_schedule_groups``), carrying the [B]
    coder state (rng/tell/balance/rem) across groups.

    X: [B, Nfreq] normalised spectrum; pulses/coded_bands/balance0 from
    the allocation.  For stereo pass Y plus the coded ``intensity`` /
    ``dual_stereo`` ([B]) and the raw band energies bandE [B, 2, nb]
    (intensity_stereo weights, bands.c:388-399).

    Default-quality args: spread [B] (decision for the leaf
    rotations), transient [B] bool + tf_change [B, nb] (post-tf_encode
    table values) for the short-block shape transforms and per-node
    block counts; ``rotations`` statically enables the spreading
    rotation (complexity >= 1 compiles).  Returns the coder."""
    from . import batch_analysis as ban
    rng, nbt = c.rng, c.nbits_total
    balance = balance0
    rem = jnp.zeros(balance0.shape, _i32)
    stereo = Y is not None
    dyn = tf_change is not None
    b2_all = rec_all = td_all = None
    if dyn:
        rec_all, td_all, b2_all = ban.band_blocks_params(
            transient, tf_change, lm, start, end)
        if not stereo:
            # mono band-entry shape transforms, applied to the full
            # spectrum before the scans (bands.c:746-785)
            m = standard_mode()
            parts = []
            pos = 0
            for i in range(start, end):
                lo = int(m.e_bands[i]) << lm
                hi = int(m.e_bands[i + 1]) << lm
                if lo > pos:
                    parts.append(X[:, pos:lo])
                N = hi - lo
                seg = X[:, lo:hi]
                if N >= 2:
                    seg = ban.apply_band_combo(
                        seg, transient, rec_all[:, i], td_all[:, i],
                        N, lm, exact)
                parts.append(seg)
                pos = hi
            if pos < X.shape[1]:
                parts.append(X[:, pos:])
            X = jnp.concatenate(parts, axis=1)
    for s in _band_schedule_groups(lm, start, end, stereo):
        rng, nbt, balance, rem, block, nrows = _quant_group(
            s, X, pulses, coded_bands, total_bits_q3, t,
            rng, nbt, balance, rem, exact,
            Y=Y, intensity=intensity, dual_stereo=dual_stereo,
            bandE=bandE, disable_inv=disable_inv, spread=spread,
            transient=transient, b2_all=b2_all, rec_all=rec_all,
            td_all=td_all, rotations=rotations, start_band=start,
            lm=lm)
        c = bc.append_block(c, block, nrows)
    return c._replace(rng=rng, nbits_total=nbt)


def _quant_group(s: _Sched, X, pulses, coded_bands, total_bits_q3,
                 t: Tables, rng0, nbt0, balance0, rem0, exact: bool,
                 Y=None, intensity=None, dual_stereo=None, bandE=None,
                 disable_inv: bool = False, spread=None, transient=None,
                 b2_all=None, rec_all=None, td_all=None,
                 rotations: bool = False, start_band: int = 0,
                 lm: int = 3):
    """One band-width group's node scan; returns the carried coder
    state plus this group's plan-row block.

    The expensive per-node work (band shape transform at channel-
    subtree entries, spreading rotation, PVQ search, CWRS indexing)
    dispatches through ``lax.switch`` over static width classes — each
    class's trace runs at the node's true width instead of the group's
    padded maximum, and rotation/transform variants exist only where
    a class's static candidate set allows them.

    Default-quality args (all optional; None = complexity-0 behaviour):
    spread [B] (per-stream spread decision for the leaf rotations),
    transient [B] bool, b2_all/rec_all/td_all [B, nb] (the per-band
    block/recombine/time-divide params from
    ``batch_analysis.band_blocks_params``)."""
    from . import batch_analysis as ban
    B = X.shape[0]
    NB = s.NBmax
    dt = X.dtype
    n = s.n_steps
    col0 = np.arange(NB)
    kdim = s.kmax + 3
    dyn = b2_all is not None
    u_rows = np.stack([t.u_tab[int(Nv), :kdim] for Nv in s.N])

    # ---- static width-class branches (transform + rotate + PVQ +
    # icwrs); all return (seg [B, NB], idx u32 [B], v u32 [B])
    u_np = t.u_tab

    def make_branch(W: int, km: int, bbset, entry: bool,
                    leafable: bool):
        if leafable and W >= 2:
            kd = min(km + 3, u_np.shape[1])
            up = jnp.asarray(
                u_np[np.clip(W - np.arange(0, W - 1), 0,
                             u_np.shape[0] - 1), :kd])
            u_parts_W = (((0, W - 1, kd), up),)

        def f(seg, K, b2n, spread_eff, rec, td, u_row, kmax_j):
            idx = jnp.zeros((B,), jnp.uint32)
            v = jnp.full((B,), 2, jnp.uint32)
            emid = jnp.zeros((B,), dt)
            eside = jnp.zeros((B,), dt)
            if entry and dyn:
                seg = ban.apply_band_combo(
                    seg, transient, rec, td, W, lm, exact)
            if leafable and W >= 2:
                # split-theta energies at the true width (the trailing
                # zero-padding the full-width sum would add is exact
                # under sequential summation: x + 0 == x)
                h = W >> 1
                emid = jnp.asarray(EPSILON, dt) + _seq_sum(
                    seg[:, :h] * seg[:, :h], exact)
                eside = jnp.asarray(EPSILON, dt) + _seq_sum(
                    seg[:, h:2 * h] * seg[:, h:2 * h], exact)
                segW = seg[:, :W]
                if rotations:
                    segW = ban.exp_rotation_enc_multi(
                        segW, K, spread_eff, W, b2n, bbset, exact)
                validW = jnp.ones((B, W), bool)
                iy = _pvq_search_node(segW, jnp.maximum(K, 1), validW,
                                      W, kmax_j, exact)
                idx, v = _icwrs_node(iy, u_parts_W, u_row, W)
            return seg, idx, v, emid, eside

        return f

    branch_fns = [make_branch(*cl) for cl in s.classes]
    # Group spectrum with NB of zero padding both sides: node windows
    # are static (schedule), child-order swaps are materialised into
    # this carried copy, so every segment read is a uniform slice.
    # Stereo: the Y plane sits at +Wg (stereo-root poff points there).
    planes = [jnp.zeros((B, NB), X.dtype),
              jax.lax.slice_in_dim(X, s.base, s.base + s.Wg, axis=1)]
    if s.stereo:
        planes.append(
            jax.lax.slice_in_dim(Y, s.base, s.base + s.Wg, axis=1))
    planes.append(jnp.zeros((B, NB), X.dtype))
    Xg0 = jnp.concatenate(planes, axis=1)

    xs = {
        "band": jnp.asarray(s.band),
        "win": jnp.asarray(s.win + NB),
        "is_root": jnp.asarray(s.is_root), "is_n1": jnp.asarray(s.is_n1),
        "first_band": jnp.asarray(s.first_band),
        "N": jnp.asarray(s.N), "can_split": jnp.asarray(s.can_split),
        "parent": jnp.asarray(np.maximum(s.parent, 0)),
        "has_parent": jnp.asarray((s.parent >= 0).astype(np.int32)),
        "is_second": jnp.asarray(s.is_second),
        "cache_row": jnp.asarray(s.cache_row),
        "maxq": jnp.asarray(s.maxq), "thresh": jnp.asarray(s.thresh),
        "pulse_cap": jnp.asarray(s.pulse_cap),
        "node_id": jnp.arange(n, dtype=_i32),
        "u_row": jnp.asarray(u_rows),
        "kind": jnp.asarray(s.kind), "poff": jnp.asarray(s.poff),
        "st_pcap": jnp.asarray(s.st_pcap),
        "lmk": jnp.asarray(s.lmk), "depth": jnp.asarray(s.depth),
        "wclass": jnp.asarray(s.wclass),
    }
    if dyn:
        bidx = jnp.asarray(s.band)
        xs["b2col"] = jnp.take(b2_all, bidx, axis=1).T    # [n, B]
        xs["reccol"] = jnp.take(rec_all, bidx, axis=1).T
        xs["tdcol"] = jnp.take(td_all, bidx, axis=1).T
    if s.stereo:
        # per-band intensity_stereo weights from the raw band energies
        # (bands.c:388-399); [n, B] rows aligned with the schedule
        eL = bandE[:, 0, :]
        eR = bandE[:, 1, :]
        nrm = jnp.asarray(EPSILON, dt) + jnp.sqrt(
            jnp.asarray(EPSILON, dt) + eL * eL + eR * eR)
        a1_all = (eL / nrm).astype(dt)
        a2_all = (eR / nrm).astype(dt)
        xs["a1"] = jnp.take(a1_all, jnp.asarray(s.band), axis=1).T
        xs["a2"] = jnp.take(a2_all, jnp.asarray(s.band), axis=1).T

    # one packed [B, n, 8] child-state store: a single gather/update
    # per step instead of seven (slots: split, act2, mbits, sbits,
    # swap, itheta, snap, unused)
    carry0 = dict(
        rng=rng0, nbt=nbt0, balance=balance0, rem=rem0, Xg=Xg0,
        node_st=jnp.zeros((B, n, 8), _i32))

    def step(cy, x):
        rng, nbt = cy["rng"], cy["nbt"]
        Nj = x["N"]
        nid = x["node_id"]
        is_root = x["is_root"] == 1
        is_n1 = x["is_n1"] == 1

        # ---- band entry (bands.c:1430-1470)
        tellf = bc.tell_frac_rn(rng, nbt)
        balance = jnp.where(is_root & (x["first_band"] == 0),
                            cy["balance"] - tellf, cy["balance"])
        remaining = total_bits_q3 - tellf - 1
        den = jnp.maximum(jnp.minimum(3, coded_bands - x["band"]), 1)
        curr_balance = jnp.where(
            balance >= 0, balance // den, -((-balance) // den))
        pulses_i = jax.lax.dynamic_slice_in_dim(
            pulses, x["band"], 1, axis=1)[:, 0]
        act_band = x["band"] <= coded_bands - 1
        b_root = jnp.clip(jnp.minimum(remaining + 1,
                                      pulses_i + curr_balance), 0, 16383)
        b_root = jnp.where(act_band, b_root, 0)
        balance = jnp.where(is_root, balance + pulses_i + tellf, balance)

        # ---- child state from the parent's packed row
        par = x["parent"]
        prow = jax.lax.dynamic_slice_in_dim(
            cy["node_st"], par, 1, axis=1)[:, 0]      # [B, 8]
        p_split = prow[:, 0] == 1
        p_act2 = prow[:, 1] == 1
        p_mb = prow[:, 2]
        p_sb = prow[:, 3]
        p_sw = prow[:, 4] == 1
        p_it = prow[:, 5]
        p_snap = prow[:, 6]
        is2 = x["is_second"] == 1
        first_b = jnp.where(p_sw, p_sb, p_mb)
        second_b = jnp.where(p_sw, p_mb, p_sb)
        rebalance = first_b - (p_snap - cy["rem"])
        extra = rebalance - (3 << BITRES)
        give = (extra > 0) & (p_it != jnp.where(p_sw, 16384, 0))
        b_child = jnp.where(is2,
                            second_b + jnp.where(give, extra, 0),
                            first_b)

        b_in = jnp.where(is_root, b_root, b_child)
        act_in = jnp.where(is_root, act_band,
                           jnp.where(is2, p_act2, p_split))
        rem_in = jnp.where(is_root, remaining, cy["rem"])
        is_st = x["kind"] == 1          # stereo band root

        # ---- leaf / split decision (stereo roots never split/leaf:
        # can_split == 0 there, and leaf is gated off explicitly)
        split = act_in & (x["can_split"] == 1) & (b_in > x["thresh"])
        leaf = act_in & ~split & ~is_n1 & ~is_st

        # ---- this node's spectrum segment: the window is STATIC
        # (swaps were materialised by ancestor steps), so one uniform
        # slice fetches it — no per-stream select over candidates
        valid = col0[None, :] < Nj
        seg_raw = jax.lax.dynamic_slice_in_dim(cy["Xg"], x["win"], NB,
                                               axis=1)
        seg = jnp.where(valid, seg_raw, jnp.asarray(0.0, dt))

        # ---- leaf: bits->pulses, PVQ search, CWRS (vq.c, cwrs.c)
        row = x["cache_row"]                       # [rowlen]
        bits_m1 = b_in - 1
        lo = jnp.zeros((B,), _i32)
        hi = jnp.full((B,), 1, _i32) * x["maxq"]
        for _ in range(6):                         # LOG_MAX_PSEUDO
            mid = (lo + hi + 1) >> 1
            ge = _sel_row(row, mid) >= bits_m1
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid)
        lo_bits = jnp.where(lo == 0, -1, _sel_row(row, jnp.maximum(lo, 0)))
        q = jnp.where(bits_m1 - lo_bits <= _sel_row(row, hi) - bits_m1,
                      lo, hi)

        def p2b(qv):
            return jnp.where(qv == 0, 0, _sel_row(row, qv) + 1)

        curr = p2b(q)
        rem2 = jnp.where(leaf, rem_in - curr, rem_in)

        def _fix_cond(st):
            rem2, q, curr, it = st
            return jnp.any(leaf & (rem2 < 0) & (q > 0)) & (it < 40)

        def _fix(st):
            rem2, q, curr, it = st
            fx = leaf & (rem2 < 0) & (q > 0)
            rem2 = jnp.where(fx, rem2 + curr, rem2)
            q = q - fx.astype(_i32)
            curr = jnp.where(fx, p2b(q), curr)
            rem2 = jnp.where(fx, rem2 - curr, rem2)
            return rem2, q, curr, it + 1

        rem2, q, curr, _ = jax.lax.while_loop(
            _fix_cond, _fix, (rem2, q, curr, jnp.int32(0)))

        kmax_j = jnp.where(x["maxq"] < 8, x["maxq"],
                           (8 + (x["maxq"] & 7))
                           << jnp.maximum((x["maxq"] >> 3) - 1, 0))
        K = jnp.where(q < 8, q,
                      (8 + (q & 7)) << jnp.maximum((q >> 3) - 1, 0))
        code = leaf & (q > 0)

        # ---- width-class dispatch: subtree-entry shape transform,
        # spreading rotation, PVQ search, CWRS index — all at the
        # node's true static width
        if dyn:
            b2n = jnp.maximum(
                jnp.right_shift(x["b2col"], x["depth"]), 1)
            rec_n, td_n = x["reccol"], x["tdcol"]
        else:
            b2n = jnp.ones((B,), _i32)
            rec_n = td_n = jnp.zeros((B,), _i32)
        if rotations:
            spread_eff = jnp.where(code, spread, 0)
        else:
            spread_eff = jnp.zeros((B,), _i32)
        seg_t, idx, v, emid, eside = jax.lax.switch(
            x["wclass"], branch_fns, seg_raw, K, b2n, spread_eff,
            rec_n, td_n, x["u_row"], kmax_j)
        seg = jnp.where(valid, seg_t, jnp.asarray(0.0, dt))

        # ---- split: compute_theta (bands.c:700-903); emid/eside come
        # width-exact from the branch
        N_half = Nj >> 1
        offset_q = (x["pulse_cap"] >> 1) - QTHETA_OFFSET
        qn = _compute_qn(N_half, b_in, offset_q, x["pulse_cap"])
        itheta_raw = jnp.floor(
            0.5 + 16384 * (2 / math.pi)
            * jnp.arctan2(jnp.sqrt(eside), jnp.sqrt(emid))).astype(_i32)
        tell0 = bc.tell_frac_rn(rng, nbt)
        has_theta = split & (qn != 1)
        itheta = (itheta_raw * qn + 8192) >> 14
        if dyn:
            # avoid_split_noise: first coded band of a transient frame
            # biases near-zero thetas to exactly 0/qn
            # (bands.c:716-732 via ctx->avoid_split_noise)
            asn = transient & (x["band"] == start_band) & split \
                & (itheta > 0) & (itheta < qn)
            unq = (itheta * 16384) // jnp.maximum(qn, 1)
            imid_a = _bitexact_cos(unq)
            iside_a = _bitexact_cos(16384 - unq)
            delta_a = _frac_mul16((N_half - 1) << 7,
                                  _bitexact_log2tan(iside_a, imid_a))
            itheta = jnp.where(asn & (delta_a > b_in), qn,
                               jnp.where(asn & (delta_a < -b_in), 0,
                                         itheta))
        half = qn >> 1
        ft = (half + 1) * (half + 1)
        low = itheta <= half
        fs = jnp.where(low, itheta + 1, qn + 1 - itheta)
        fl = jnp.where(low, itheta * (itheta + 1) >> 1,
                       ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1))
        # B0 > 1 splits code the angle as a plain uint
        # (bands.c:748-749); merged into the leaf/uint op below
        m_tri = has_theta & (b2n == 1)
        m_uth = has_theta & (b2n > 1)
        u_val = jnp.where(m_uth, itheta.astype(jnp.uint32), idx)
        u_ft = jnp.where(m_uth, (qn + 1).astype(jnp.uint32),
                         jnp.maximum(v, np.uint32(2)))
        rng, nbt, row1, row2 = bc.uint_rn(
            rng, nbt, code | m_uth, u_val, u_ft)

        if s.stereo:
            # ==== stereo band root: compute_theta(stereo=1) + dual /
            # intensity / N==2 dispatch (bands.c:700-903, 1235-1381)
            po = x["poff"]
            segY_raw = jax.lax.dynamic_slice_in_dim(
                cy["Xg"], x["win"] + po, NB, axis=1)
            segY = jnp.where(valid, segY_raw, jnp.asarray(0.0, dt))
            is_n2 = Nj == 2
            use_dual = (dual_stereo == 1) & (x["band"] < intensity)
            st_go = is_st & ~use_dual & ~is_n1

            half_y = jnp.asarray(0.5, dt)
            mm = half_y * (seg + segY)
            ss = half_y * (seg - segY)
            emid_s = jnp.asarray(EPSILON, dt) + _seq_sum(mm * mm, exact)
            eside_s = jnp.asarray(EPSILON, dt) + _seq_sum(ss * ss, exact)
            itheta_raw_s = jnp.floor(
                0.5 + 16384 * (2 / math.pi)
                * jnp.arctan2(jnp.sqrt(eside_s),
                              jnp.sqrt(emid_s))).astype(_i32)
            offs_s = (x["st_pcap"] >> 1) - jnp.where(
                is_n2, QTHETA_OFFSET_TWOPHASE, QTHETA_OFFSET)
            qn_s = _compute_qn(Nj, b_in, offs_s, x["st_pcap"],
                               sub_n2=is_n2)
            qn_s = jnp.where(x["band"] >= intensity, 1, qn_s)
            theta_mask = st_go & (qn_s != 1)
            itheta_s = (itheta_raw_s * qn_s + 8192) >> 14
            # N>2: the p0=3 asymmetric model (bands.c:736-747)
            p0 = 3
            x0 = qn_s >> 1
            ft_s = p0 * (x0 + 1) + x0
            le = itheta_s <= x0
            fl_s = jnp.where(le, p0 * itheta_s,
                             (itheta_s - 1 - x0) + (x0 + 1) * p0)
            fh_s = jnp.where(le, p0 * (itheta_s + 1),
                             (itheta_s - x0) + (x0 + 1) * p0)
            # merged theta encode op: mono triangular | stereo p0
            m_enc = jnp.where(is_st, theta_mask & ~is_n2, m_tri)
            e_fl = jnp.where(is_st, fl_s, fl)
            e_fh = jnp.where(is_st, fh_s, fl + fs)
            e_ft = jnp.where(is_st, ft_s, ft)
            rng, nbt, row0 = bc.encode_rn(rng, nbt, m_enc, e_fl, e_fh,
                                          e_ft)
            # N==2: ec_enc_uint(itheta, qn+1) (bands.c:748-749)
            m_uint = theta_mask & is_n2
            rng, nbt, row_u1, row_u2 = bc.uint_rn(
                rng, nbt, m_uint, itheta_s,
                (qn_s + 1).astype(jnp.uint32))
            row0 = jnp.where(row0[..., 0:1] != -1, row0, row_u1)
            itheta_q14_s = jnp.where(
                qn_s != 1,
                (itheta_s * 16384) // jnp.maximum(qn_s, 1), 0)
            # qn==1: inv flag + intensity (bands.c:755-775)
            inv_calc = st_go & (qn_s == 1)
            inv_s = inv_calc & (itheta_raw_s > 8192) & (not disable_inv)
            m_inv = inv_calc & (b_in > (2 << BITRES)) \
                & (rem_in > (2 << BITRES))
            rng, nbt, row_inv = bc.bit_logp_rn(
                rng, nbt, m_inv, inv_s.astype(_i32), 2)
            row0 = jnp.where(row0[..., 0:1] != -1, row0, row_inv)
            qalloc_s = jnp.where(st_go,
                                 bc.tell_frac_rn(rng, nbt) - tell0, 0)
            b_post_s = b_in - qalloc_s
            # transforms: stereo_split / intensity (bands.c:388-417)
            int_case = (qn_s == 1) | (itheta_q14_s == 0)
            rt2 = jnp.asarray(0.70710678, dt)
            Xs_sp = rt2 * seg + rt2 * segY
            Ys_sp = rt2 * segY - rt2 * seg
            y_for_int = jnp.where(inv_s[:, None], -segY, segY)
            X_int = x["a1"][:, None] * seg + x["a2"][:, None] * y_for_int
            newX = jnp.where(int_case[:, None], X_int, Xs_sp)
            newY = jnp.where(int_case[:, None], segY, Ys_sp)
            # N==2 special: 1 side sign bit, x2 choice (bands.c:1269-1320)
            sb_n2 = jnp.where((itheta_q14_s != 0)
                              & (itheta_q14_s != 16384), 1 << BITRES, 0)
            mbits_n2 = b_post_s - sb_n2
            sw_n2 = itheta_q14_s > 8192
            x2 = jnp.where(sw_n2[:, None], newY, newX)
            y2 = jnp.where(sw_n2[:, None], newX, newY)
            cross = x2[:, 0] * y2[:, 1] - x2[:, 1] * y2[:, 0]
            m_sg = st_go & is_n2 & (sb_n2 > 0)
            rng, nbt, row_sg = bc.bits_rn(
                rng, nbt, m_sg, (cross < 0).astype(_i32), 1)
            # N>2: mid/side bit split (bands.c:1335-1342), band-level
            # delta (no B0 halving adjustment for long blocks)
            imid_s = jnp.where(itheta_q14_s == 0, 32767,
                               jnp.where(itheta_q14_s == 16384, 0,
                                         _bitexact_cos(itheta_q14_s)))
            iside_s = jnp.where(
                itheta_q14_s == 0, 0,
                jnp.where(itheta_q14_s == 16384, 32767,
                          _bitexact_cos(16384 - itheta_q14_s)))
            delta_s = jnp.where(
                itheta_q14_s == 0, -16384,
                jnp.where(itheta_q14_s == 16384, 16384,
                          _frac_mul16((Nj - 1) << 7,
                                      _bitexact_log2tan(iside_s,
                                                        imid_s))))
            mbits_s = jnp.maximum(
                0, jnp.minimum(b_post_s, (b_post_s - delta_s) // 2))
            sbits_s = b_post_s - mbits_s
            sw_s = mbits_s < sbits_s
            # stereo n1: one sign bit per channel (bands.c:904-937)
            n1_st = is_st & is_n1
            m_s1 = n1_st & (rem_in >= (1 << BITRES))
            rng, nbt, row_s1 = bc.bits_rn(
                rng, nbt, m_s1, (seg[:, 0] < 0).astype(_i32), 1)
            rem_n1 = rem_in - jnp.where(m_s1, 1 << BITRES, 0)
            m_s2 = n1_st & (rem_n1 >= (1 << BITRES))
            rng, nbt, row_s2 = bc.bits_rn(
                rng, nbt, m_s2, (segY[:, 0] < 0).astype(_i32), 1)
            rem_n1 = rem_n1 - jnp.where(m_s2, 1 << BITRES, 0)
            row0 = jnp.where(row0[..., 0:1] != -1, row0, row_s1)
        else:
            rng, nbt, row0 = bc.encode_rn(rng, nbt, m_tri, fl,
                                          fl + fs, ft)
        itheta_q14 = jnp.where(qn != 1,
                               (itheta * 16384) // jnp.maximum(qn, 1), 0)
        qalloc = jnp.where(split,
                           bc.tell_frac_rn(rng, nbt) - tell0, 0)
        b_post = b_in - qalloc
        rem_post = jnp.where(split, rem_in - qalloc, rem2)

        imid = jnp.where(itheta_q14 == 0, 32767,
                         jnp.where(itheta_q14 == 16384, 0,
                                   _bitexact_cos(itheta_q14)))
        iside = jnp.where(itheta_q14 == 0, 0,
                          jnp.where(itheta_q14 == 16384, 32767,
                                    _bitexact_cos(16384 - itheta_q14)))
        delta = jnp.where(
            itheta_q14 == 0, -16384,
            jnp.where(itheta_q14 == 16384, 16384,
                      _frac_mul16((N_half - 1) << 7,
                                  _bitexact_log2tan(iside, imid))))
        if dyn:
            # B0 > 1: bias the mid/side split toward mid
            # (bands.c:1003-1008), with the child's LM
            lmc = x["lmk"] - 1
            adj = split & (b2n > 1) & ((itheta_q14 & 0x3fff) != 0)
            d_hi = delta - jnp.right_shift(delta, 4 - lmc)
            d_lo = jnp.minimum(
                0, delta + jnp.right_shift(
                    jnp.left_shift(N_half, BITRES), 5 - lmc))
            delta = jnp.where(adj,
                              jnp.where(itheta_q14 > 8192, d_hi, d_lo),
                              delta)
        half_b = b_post - delta
        mbits = jnp.maximum(0, jnp.minimum(b_post, half_b // 2))
        sbits = b_post - mbits
        swap = mbits < sbits

        if s.stereo:
            # merge the stereo root's outcomes into the stored
            # child-state columns
            dual_b = b_in // 2
            mbits = jnp.where(
                is_st,
                jnp.where(use_dual, dual_b,
                          jnp.where(is_n2, mbits_n2, mbits_s)), mbits)
            sbits = jnp.where(
                is_st,
                jnp.where(use_dual, dual_b,
                          jnp.where(is_n2, 0, sbits_s)), sbits)
            swap = jnp.where(is_st,
                             jnp.where(use_dual | is_n2, False, sw_s),
                             swap)
            itheta_q14 = jnp.where(
                is_st, jnp.where(use_dual, 0, itheta_q14_s), itheta_q14)
            rem_root_st = jnp.where(
                is_n1, rem_n1,
                jnp.where(use_dual, rem_in,
                          rem_in - qalloc_s
                          - jnp.where(is_n2, sb_n2, 0)))
            rem_post = jnp.where(is_st, rem_root_st, rem_post)
            act1 = jnp.where(is_st, is_st & ~is_n1, split)
            act2 = jnp.where(is_st,
                             (~is_n1) & (use_dual | ~is_n2), split)
        else:
            act1 = split
            act2 = split

        # ---- materialise the coding-order swap into the carried
        # spectrum: when the side half is coded first, physically
        # exchange the halves so the children's static windows hold
        # the right data.  The neighbours of shifted reads/writes are
        # rewritten with their own (unchanged) values.
        if not s.stereo:
            N_q = Nj >> 1
            rm = jax.lax.dynamic_slice_in_dim(cy["Xg"], x["win"] + N_q,
                                              NB, axis=1)
            rp = jax.lax.dynamic_slice_in_dim(cy["Xg"], x["win"] - N_q,
                                              NB, axis=1)
            swapped = jnp.where(col0[None, :] < N_q, rm, rp)
            need_sw = split & swap
            wv = jnp.where(valid & need_sw[:, None], swapped, seg_raw)
            Xg_next = jax.lax.dynamic_update_slice(
                cy["Xg"], wv.astype(dt), (jnp.int32(0), x["win"]))
        else:
            # generic two-window exchange: mono split halves at
            # +N/2, stereo root X/Y planes at +Wg — the transformed
            # values are swapped in the same write.  When the group
            # has subtree-entry transforms, the (possibly transformed)
            # segment is committed first so the partner-window read
            # sees this node's transformed halves.
            if dyn and bool(np.any(s.entry)):
                Xg_base = jax.lax.dynamic_update_slice(
                    cy["Xg"], seg_t.astype(dt),
                    (jnp.int32(0), x["win"]))
                segY_sw_raw = jax.lax.dynamic_slice_in_dim(
                    Xg_base, x["win"] + x["poff"], NB, axis=1)
            else:
                Xg_base = cy["Xg"]
                segY_sw_raw = segY_raw
            cw = jnp.where(is_st, Nj, Nj >> 1)
            cw_mask = col0[None, :] < cw
            tr_mask = st_go
            A_base = jnp.where(valid & tr_mask[:, None], newX, seg_t)
            B_base = jnp.where(valid & tr_mask[:, None], newY,
                               segY_sw_raw)
            sw_st_phys = jnp.where(is_n2, sw_n2, sw_s) & st_go
            need_sw = jnp.where(is_st, sw_st_phys, split & swap)
            outA = jnp.where(cw_mask & need_sw[:, None], B_base, A_base)
            outB = jnp.where(cw_mask & need_sw[:, None], A_base, B_base)
            Xg_next = jax.lax.dynamic_update_slice(
                Xg_base, outA.astype(dt), (jnp.int32(0), x["win"]))
            Xg_next = jax.lax.dynamic_update_slice(
                Xg_next, outB.astype(dt),
                (jnp.int32(0), x["win"] + x["poff"]))

        # ---- width-1 band: one sign bit (bands.c:904-937), mono
        if not s.stereo:
            n1_has = is_n1 & (remaining >= (1 << BITRES))
            sign = (seg[:, 0] < 0).astype(_i32)
            rng, nbt, rowN1 = bc.bits_rn(rng, nbt, n1_has, sign, 1)
            row0 = jnp.where(is_n1, rowN1, row0)

        # ---- store this node's state for its children (one write)
        nrow = jnp.stack(
            [act1.astype(_i32), act2.astype(_i32), mbits, sbits,
             swap.astype(_i32), itheta_q14, rem_post,
             jnp.zeros_like(mbits)], axis=1)           # [B, 8]
        cy2 = dict(cy)
        cy2["rng"], cy2["nbt"] = rng, nbt
        cy2["balance"] = balance
        cy2["rem"] = rem_post
        cy2["Xg"] = Xg_next
        cy2["node_st"] = jax.lax.dynamic_update_slice(
            cy["node_st"], nrow[:, None, :],
            (jnp.int32(0), nid, jnp.int32(0)))
        if s.stereo:
            row1 = jnp.where(row1[..., 0:1] != -1, row1, row_u2)
            row1 = jnp.where(row1[..., 0:1] != -1, row1, row_s2)
            row2 = jnp.where(row2[..., 0:1] != -1, row2, row_sg)
        rows = jnp.stack([row0, row1, row2], axis=1)   # [B, 3, 4]
        return cy2, rows

    cyf, rows = jax.lax.scan(step, carry0, xs)
    block = rows.transpose(1, 0, 2, 3).reshape(B, 3 * n, 4)
    return (cyf["rng"], cyf["nbt"], cyf["balance"], cyf["rem"], block,
            jnp.sum(block[:, :, 0] != -1, axis=1))

# ---------------------------------------------------------------------------
# dynalloc_analysis (celt_encoder.c:981-1185, float, mono)

def _med3(a, b, cc):
    t0 = jnp.minimum(a, b)
    t1 = jnp.maximum(a, b)
    return jnp.where(t1 < cc, t1, jnp.where(t0 < cc, cc, t0))


def _med5(x0, x1, x2, x3, x4):
    t0 = jnp.minimum(x0, x1)
    t1 = jnp.maximum(x0, x1)
    t2 = x2
    t3 = jnp.minimum(x3, x4)
    t4 = jnp.maximum(x3, x4)
    swap = t0 > t3
    t0n = jnp.where(swap, t3, t0)
    t3n = jnp.where(swap, t0, t3)
    t1n = jnp.where(swap, t4, t1)
    t4n = jnp.where(swap, t1, t4)
    hi = jnp.where(t2 > t1n,
                   jnp.where(t1n < t3n, jnp.minimum(t2, t3n),
                             jnp.minimum(t4n, t1n)),
                   jnp.where(t2 < t3n, jnp.minimum(t1n, t3n),
                             jnp.minimum(t2, t4n)))
    return hi


_DYN_DEBUG = {}


def _dyn_follower(x3, nf, last0, end: int):
    """Per-channel follower (celt_encoder.c:1028-1075): forward/backward
    envelope + median floors.  x3: [B, end]; last0: [B] carried rising-
    edge index from the previous channel (libopus quirk: ``last`` is not
    reset between channels).  Returns (f [B, end], last [B])."""
    dt = x3.dtype
    B = x3.shape[0]
    idxs = jnp.arange(end)
    rise = jnp.concatenate(
        [jnp.zeros((B, 1), bool),
         x3[:, 1:] > x3[:, :-1] + jnp.asarray(0.5, dt)], axis=1)
    last = jnp.max(jnp.where(rise, idxs[None, :], 0), axis=1)
    last = jnp.where(jnp.any(rise, axis=1), last, last0)
    # forward follower
    f = x3[:, 0]
    fw = [f]
    for i in range(1, end):
        f = jnp.minimum(fw[i - 1] + jnp.asarray(1.5, dt), x3[:, i])
        fw.append(f)
    f = jnp.stack(fw, axis=1)
    # backward pass, only below the last rising edge
    for i in range(end - 2, -1, -1):
        upd = jnp.minimum(f[:, i],
                          jnp.minimum(f[:, i + 1] + jnp.asarray(2.0, dt),
                                      x3[:, i]))
        f = f.at[:, i].set(jnp.where(i <= last - 1, upd, f[:, i]))
    # median floors
    offset = jnp.asarray(1.0, dt)
    for i in range(2, end - 2):
        med = _med5(x3[:, i - 2], x3[:, i - 1], x3[:, i], x3[:, i + 1],
                    x3[:, i + 2]) - offset
        f = f.at[:, i].set(jnp.maximum(f[:, i], med))
    tmp = _med3(x3[:, 0], x3[:, 1], x3[:, 2]) - offset
    f = f.at[:, 0].set(jnp.maximum(f[:, 0], tmp))
    f = f.at[:, 1].set(jnp.maximum(f[:, 1], tmp))
    tmp = _med3(x3[:, end - 3], x3[:, end - 2], x3[:, end - 1]) - offset
    f = f.at[:, end - 2].set(jnp.maximum(f[:, end - 2], tmp))
    f = f.at[:, end - 1].set(jnp.maximum(f[:, end - 1], tmp))
    f = jnp.maximum(f, nf[None, :end])
    return f, last


def dynalloc_analysis_batch(bandLogE, oldBandE, effective_bytes,
                            t: Tables, lm: int, start: int, end: int,
                            lsb_depth: int, vbr: bool,
                            constrained_vbr: bool, is_transient,
                            bandLogE2=None, full: bool = False):
    """celt_encoder.c:981-1185 (no LFE, no surround).  bandLogE /
    oldBandE: [B, nb] (mono) or [B, C, nb] (stereo,
    celt_encoder.c:1076-1086 channel coupling).  The follower runs on
    ``bandLogE2`` (the secondMdct / short-block-offset energies) when
    given, else on bandLogE — the complexity-0 path.

    Returns offsets (boost step counts, [B, nb] int32); with ``full``
    returns (offsets, maxDepth [B], importance [B, nb] i32,
    spread_weight [B, nb] i32) for the default-quality tier."""
    dt = bandLogE.dtype
    if bandLogE.ndim == 2:
        bandLogE = bandLogE[:, None, :]
        oldBandE = oldBandE[:, None, :]
        if bandLogE2 is not None:
            bandLogE2 = bandLogE2[:, None, :]
    if bandLogE2 is None:
        bandLogE2 = bandLogE
    B, C, nb = bandLogE.shape
    widths = (t.e_bands[1:] - t.e_bands[:-1]).astype(np.int64)
    noise_floor = np.zeros(nb)
    for i in range(end):
        noise_floor[i] = (0.0625 * float(t.log_n[i]) + 0.5
                          + (9 - lsb_depth) - float(t.emeans[i])
                          + 0.0062 * (i + 5) * (i + 5))
    nf = jnp.asarray(noise_floor, dt)

    # maxDepth + spreading weights (celt_encoder.c:1000-1021): on the
    # RAW bandLogE
    maxDepth = jnp.max(
        (bandLogE[:, :, :end] - nf[None, None, :end]).reshape(B, -1),
        axis=1)
    maxDepth = jnp.maximum(maxDepth, jnp.asarray(-31.9, dt))
    mask = jnp.max(bandLogE[:, :, :end], axis=1) - nf[None, :end]
    sig = mask
    cols = [mask[:, 0]]
    for i in range(1, end):
        cols.append(jnp.maximum(mask[:, i], cols[i - 1] - 2.0))
    for i in range(end - 2, -1, -1):
        cols[i] = jnp.maximum(cols[i], cols[i + 1] - 3.0)
    maskf = jnp.stack(cols, axis=1)
    smr = sig - jnp.maximum(
        jnp.maximum(jnp.asarray(0.0, dt), maxDepth - 12.0)[:, None],
        maskf)
    shift = jnp.clip(-jnp.floor(0.5 + smr).astype(_i32), 0, 5)
    spread_weight = jnp.right_shift(32, shift).astype(_i32)
    if spread_weight.shape[1] < nb:
        spread_weight = jnp.pad(spread_weight,
                                ((0, 0), (0, nb - end)),
                                constant_values=32)

    gate = effective_bytes >= 30 + 5 * lm
    fs = []
    last = jnp.zeros((B,), jnp.int32)
    for ch in range(C):
        x3 = bandLogE2[:, ch, :end]
        if lm == 0:
            # at LM==0 the first 8 bands take max(new, old) energies
            # (celt_encoder.c:1022-1026)
            k = min(8, end)
            x3 = x3.at[:, :k].set(
                jnp.maximum(x3[:, :k], oldBandE[:, ch, :k]))
        f, last = _dyn_follower(x3, nf, last, end)
        fs.append(f)

    # NOTE: the subtraction uses the *raw* bandLogE, not the LM==0
    # max-patched x3 (celt_encoder.c:1100 uses bandLogE, not bandLogE3)
    if C == 2:
        f1 = jnp.maximum(fs[1], fs[0] - 4.0)
        f0 = jnp.maximum(fs[0], f1 - 4.0)
        fol = jnp.asarray(0.5, dt) * (
            jnp.maximum(jnp.asarray(0.0, dt), bandLogE[:, 0, :end] - f0)
            + jnp.maximum(jnp.asarray(0.0, dt),
                          bandLogE[:, 1, :end] - f1))
    else:
        fol = jnp.maximum(jnp.asarray(0.0, dt),
                          bandLogE[:, 0, :end] - fs[0])
    # importance BEFORE the halving (celt_encoder.c:1109-1111)
    importance = jnp.floor(
        0.5 + 13.0 * jnp.exp2(jnp.minimum(fol, 4.0))).astype(_i32)
    importance = jnp.where(gate[:, None], importance, 13)
    if importance.shape[1] < nb:
        importance = jnp.pad(importance, ((0, 0), (0, nb - end)),
                             constant_values=13)
    if (not vbr) or constrained_vbr:
        fol = jnp.where(is_transient[:, None], fol,
                        jnp.asarray(0.5, dt) * fol)
    scale = np.ones(end)
    for i in range(end):
        if i < 8:
            scale[i] *= 2.0
        if i >= 12:
            scale[i] *= 0.5
    fol = fol * jnp.asarray(scale, dt)[None, :]
    fol = jnp.minimum(fol, jnp.asarray(4.0, dt))
    _DYN_DEBUG.clear()
    _DYN_DEBUG.update(f=fs, fol=fol, last=last)

    offsets = jnp.zeros((B, nb), _i32)
    tot_boost = jnp.zeros((B,), _i32)
    stopped = jnp.zeros((B,), bool)
    # boost cap gate: !vbr || (constrained_vbr && !isTransient)
    # (celt_encoder.c:1146-1152)
    if not vbr:
        cap_ok = jnp.ones((B,), bool)
    elif constrained_vbr:
        cap_ok = ~is_transient
    else:
        cap_ok = jnp.zeros((B,), bool)
    for i in range(start, end):
        w = C * int(widths[i]) << lm         # C * (eband width) << LM
        if w < 6:
            boost = fol[:, i].astype(_i32)
            boost_bits = boost * w << BITRES
        elif w > 48:
            boost = (fol[:, i] * 8).astype(_i32)
            boost_bits = (boost * w << BITRES) // 8
        else:
            boost = (fol[:, i] * w / 6).astype(_i32)
            boost_bits = boost * 6 << BITRES
        hit_cap = ((tot_boost + boost_bits) >> BITRES >> 3) \
            > 2 * effective_bytes // 3
        cap_now = hit_cap & ~stopped & cap_ok
        capv = ((2 * effective_bytes // 3) << BITRES << 3)
        offsets = offsets.at[:, i].set(
            jnp.where(cap_now, capv - tot_boost,
                      jnp.where(stopped, 0, boost)))
        tot_boost = jnp.where(cap_now, capv,
                              jnp.where(stopped, tot_boost,
                                        tot_boost + boost_bits))
        stopped = stopped | cap_now
    offsets = jnp.where(gate[:, None], offsets, 0)
    tot_boost = jnp.where(gate, tot_boost, 0)
    if full:
        return offsets, maxDepth, importance, spread_weight, tot_boost
    return offsets


def alloc_trim_batch(bandLogE, equiv_rate, end: int, exact: bool,
                     X=None, Y=None, lm: int = 3, intensity=None,
                     stereo_saving=None, tf_estimate=None):
    """alloc_trim_analysis (celt_encoder.c:797-887) with no surround;
    tf_estimate [B] optional (0 at complexity 0).

    Mono: bandLogE [B, nb] -> trim index [B].
    Stereo: bandLogE [B, C, nb] plus the normalised spectra X/Y
    ([B, N]), per-stream ``intensity`` band and carried
    ``stereo_saving`` -> (trim [B], stereo_saving' [B])."""
    dt = bandLogE.dtype
    stereo = bandLogE.ndim == 3
    B = bandLogE.shape[0]
    trim = jnp.full((B,), 5.0, dt)
    frac = (equiv_rate - 64000) >> 10
    trim = jnp.where(equiv_rate < 64000, jnp.asarray(4.0, dt),
                     jnp.where(equiv_rate < 80000,
                               4.0 + (1.0 / 16) * frac.astype(dt), trim))
    if stereo:
        t = make_tables(lm, 2)
        eb = t.e_bands
        # per-band X.Y correlations over the first `intensity` bands
        nb8 = max(8, 1)
        parts = []
        for i in range(min(int(intensity_max_bands(end)), end)):
            lo = int(eb[i]) << lm
            hi = int(eb[i + 1]) << lm
            parts.append(_seq_sum(X[:, lo:hi] * Y[:, lo:hi], exact))
        partial = jnp.stack(parts, axis=1)          # [B, nbands8+]
        sum8 = jnp.asarray(1.0 / 8, dt) * _seq_sum(partial[:, :8], exact)
        sum8 = jnp.minimum(jnp.asarray(1.0, dt), jnp.abs(sum8))
        minXC = sum8
        for i in range(8, partial.shape[1]):
            use = i < intensity
            minXC = jnp.where(use,
                              jnp.minimum(minXC, jnp.abs(partial[:, i])),
                              minXC)
        minXC = jnp.minimum(jnp.asarray(1.0, dt), jnp.abs(minXC))
        logXC = jnp.log2(1.001 - sum8 * sum8)
        logXC2 = jnp.maximum(0.5 * logXC,
                             jnp.log2(1.001 - minXC * minXC))
        trim = trim + jnp.maximum(jnp.asarray(-4.0, dt),
                                  jnp.asarray(0.75, dt) * logXC)
        stereo_saving = jnp.minimum(stereo_saving + 0.25,
                                    jnp.asarray(-0.5, dt) * logXC2)
        C = bandLogE.shape[1]
        w = jnp.asarray(np.arange(end - 1) * 2 + 2 - end, dt)
        diff = (_seq_sum(bandLogE[:, 0, :end - 1] * w[None, :], exact)
                + _seq_sum(bandLogE[:, 1, :end - 1] * w[None, :], exact))
        diff = diff / (C * (end - 1))
    else:
        w = jnp.asarray(np.arange(end - 1) * 2 + 2 - end,
                        dt)     # (2 + 2*i - end)
        diff = _seq_sum(bandLogE[:, :end - 1] * w[None, :], exact)
        diff = diff / (end - 1)
    trim = trim - jnp.clip((diff + 1.0) / 6, -2.0, 2.0)
    if tf_estimate is not None:
        trim = trim - 2.0 * tf_estimate
    trim_index = jnp.floor(0.5 + trim).astype(_i32)
    trim_index = jnp.clip(trim_index, 0, 10)
    if stereo:
        return trim_index, stereo_saving
    return trim_index


def compute_vbr_batch(t: Tables, base_target, lm: int, equiv_rate,
                      lastCodedBands, C: int, intensity, constrained,
                      stereo_saving, tot_boost_q3, tf_estimate,
                      pitch_change, maxDepth, temporal_vbr):
    """compute_vbr (celt_encoder.c:1320-1429, float build, no surround
    / LFE).  All [B] arrays; returns the target in 1/8-bit units."""
    nb = len(t.e_bands) - 1
    dt = maxDepth.dtype
    eb = jnp.asarray(t.e_bands.astype(np.int32))
    coded_bands = jnp.where(lastCodedBands != 0, lastCodedBands, nb)
    coded_bins = _sel_row(eb, coded_bands) << lm
    if C == 2:
        coded_bins = coded_bins + (
            _sel_row(eb, jnp.minimum(intensity, coded_bands)) << lm)
    target = base_target
    if C == 2:
        coded_stereo_bands = jnp.minimum(intensity, coded_bands)
        coded_stereo_dof = (_sel_row(eb, coded_stereo_bands) << lm) \
            - coded_stereo_bands
        max_frac = 0.8 * coded_stereo_dof.astype(dt) \
            / coded_bins.astype(dt)
        ss = jnp.minimum(stereo_saving, 1.0)
        target = target - jnp.minimum(
            max_frac * target.astype(dt),
            (ss - 0.1) * (coded_stereo_dof << BITRES).astype(dt)
        ).astype(_i32)
    target = target + tot_boost_q3 - (19 << lm)
    tf_calibration = 0.044
    target = target + (2.0 * (tf_estimate - tf_calibration)
                       * target.astype(dt)).astype(_i32)
    bins = int(t.e_bands[nb - 2]) << lm
    floor_depth = ((C * bins << BITRES) * maxDepth).astype(_i32)
    floor_depth = jnp.maximum(floor_depth, target >> 2)
    target = jnp.minimum(target, floor_depth)
    if constrained:
        target = base_target + (
            0.67 * (target - base_target).astype(dt)).astype(_i32)
    amount = 0.0000031 * jnp.clip(96000 - equiv_rate, 0, 32000
                                  ).astype(dt)
    tvbr_factor = temporal_vbr * amount
    target = jnp.where(
        tf_estimate < 0.2,
        target + (tvbr_factor * target.astype(dt)).astype(_i32),
        target)
    return jnp.minimum(2 * base_target, target)


def intensity_max_bands(end: int) -> int:
    """Static upper bound for the per-stream intensity band index
    (hysteresis output is clipped to [start, end])."""
    return end


INTENSITY_THRESHOLDS = np.asarray(
    [1, 2, 3, 4, 5, 6, 7, 8, 16, 24, 36, 44, 50, 56, 62, 67, 72, 79, 88,
     106, 134], np.int32)
INTENSITY_HISTERESIS = np.asarray(
    [1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 3, 3, 4, 5, 6, 8, 8],
    np.int32)


def hysteresis_decision_batch(val, thresholds, hysteresis, prev):
    """bands.c:69-86 vectorized: val [B] (same units as thresholds),
    prev [B] int32 -> [B] int32."""
    n = len(thresholds)
    th = jnp.asarray(thresholds, val.dtype)
    hy = jnp.asarray(hysteresis, val.dtype)
    i = jnp.full(prev.shape, n, _i32)
    stopped = jnp.zeros(prev.shape, bool)
    for k in range(n):
        hit = ~stopped & (val < th[k])
        i = jnp.where(hit, k, i)
        stopped = stopped | hit
    gt = (i > prev) & (val < th[jnp.minimum(prev, n - 1)]
                       + hy[jnp.minimum(prev, n - 1)])
    lt = (i < prev) & (val > th[jnp.maximum(prev - 1, 0)]
                       - hy[jnp.maximum(prev - 1, 0)])
    keep = (gt & (prev < n)) | (lt & (prev > 0))
    return jnp.where(keep, prev, i)


def stereo_analysis_batch(X, Y, lm: int, exact: bool):
    """celt_encoder.c:889-919: dual-stereo decision over the first 13
    bands.  X/Y: [B, N] normalised spectra -> [B] bool."""
    t = make_tables(lm, 2)
    hi = int(t.e_bands[13]) << lm
    dt = X.dtype
    L = X[:, :hi]
    R = Y[:, :hi]
    sumLR = jnp.asarray(1e-15, dt) + _seq_sum(
        jnp.abs(L) + jnp.abs(R), exact)
    sumMS = jnp.asarray(1e-15, dt) + _seq_sum(
        jnp.abs(L + R) + jnp.abs(L - R), exact)
    sumMS = jnp.asarray(0.707107, dt) * sumMS
    thetas = 13 - (8 if lm <= 1 else 0)
    bins = int(t.e_bands[13]) << (lm + 1)
    return (bins + thetas) * sumMS > bins * sumLR


# ---------------------------------------------------------------------------
# Top level: complexity-0 mono CBR plan from a normalised spectrum

class CeltBatchState(NamedTuple):
    """Carried per-stream encoder state (pytree of [B,...] arrays).
    Stereo lanes use [B, 2, nb] energy memories plus the intensity
    hysteresis / stereo_saving carries (None on mono)."""
    oldBandE: jnp.ndarray       # [B, nb] / [B, 2, nb]
    oldLogE: jnp.ndarray
    oldLogE2: jnp.ndarray
    energyError: jnp.ndarray
    delayedIntra: jnp.ndarray   # [B]
    spec_avg: jnp.ndarray       # [B]
    lastCodedBands: jnp.ndarray  # [B] int32
    consec_transient: jnp.ndarray  # [B] int32
    intensity: object = None       # [B] int32 (stereo)
    stereo_saving: object = None   # [B] float (stereo)
    # default-quality carries (complexity >= 1 compiles; None at c0)
    spread_decision: object = None   # [B] i32 (init SPREAD_NORMAL)
    tonal_average: object = None     # [B] i32 (init 256)
    hf_average: object = None        # [B] i32
    tapset_decision: object = None   # [B] i32
    # VBR carries (vbr compiles; None at CBR)
    vbr_reservoir: object = None     # [B] i32 (q3+3 bits)
    vbr_drift: object = None         # [B] i32
    vbr_offset: object = None        # [B] i32
    vbr_count: object = None         # [B] i32


def init_state(B: int, nb: int = 21, dtype=jnp.float32,
               complexity: int = 0, vbr: bool = False) -> CeltBatchState:
    z = jnp.zeros((B, nb), dtype)
    extra = {}
    if complexity >= 1:
        extra = dict(spread_decision=jnp.full((B,), 2, _i32),
                     tonal_average=jnp.full((B,), 256, _i32),
                     hf_average=jnp.zeros((B,), _i32),
                     tapset_decision=jnp.zeros((B,), _i32))
    if vbr:
        extra.update(vbr_reservoir=jnp.zeros((B,), _i32),
                     vbr_drift=jnp.zeros((B,), _i32),
                     vbr_offset=jnp.zeros((B,), _i32),
                     vbr_count=jnp.zeros((B,), _i32))
    return CeltBatchState(
        oldBandE=z, oldLogE=z - 28.0, oldLogE2=z - 28.0,
        energyError=z, delayedIntra=jnp.ones((B,), dtype),
        spec_avg=jnp.zeros((B,), dtype),
        lastCodedBands=jnp.zeros((B,), _i32),
        consec_transient=jnp.zeros((B,), _i32), **extra)


def plan_from_spectrum(X, bandLogE, state: CeltBatchState, nbytes,
                       silence, bitrate, lm: int = 3, start: int = 0,
                       end: int = 21, lsb_depth: int = 24,
                       exact: bool = False, complexity: int = 0,
                       X_short=None, bandLogE_short=None,
                       is_transient=None, tf_estimate=None,
                       vbr: bool = False,
                       constrained_vbr: bool = True):
    """All post-transform encoder stages for mono.

    X: [B, N] unit-normalised LONG-block spectrum; bandLogE: [B, nb]
    log energies; nbytes: [B] int32 frame budget (CBR: the frame's
    byte count; VBR: the upper cap, usually 1275); silence: [B] bool.

    ``complexity`` selects the decision set statically: 0 = the
    round-2 constant set; >= 1 adds transient coding + short blocks
    (pass X_short/bandLogE_short — the short-MDCT spectrum — plus the
    transient_analysis_batch outputs); >= 2 tf_analysis; >= 3 the
    spreading decision.

    With ``vbr`` (celt_encoder.c:744-776, 1090-1152) the budget is
    re-planned mid-stream from compute_vbr's target and the function
    returns (PlanCoder, new_state, nbytes_final [B]) — the per-stream
    packet sizes the packer must use; CBR returns (PlanCoder,
    new_state)."""
    from . import batch_analysis as ban
    t = make_tables(lm, 1)
    B, nb = bandLogE.shape
    dt = bandLogE.dtype
    c = bc.plan_init(B, MAX_OPS)
    dq = complexity >= 1 and lm > 0        # default-quality compile
    frame_size = standard_mode().short_mdct_size << lm
    nbytes0 = nbytes           # pre-shrink cap (equiv_rate input)
    if vbr:
        den = 48000 >> BITRES
        vbr_rate = (bitrate * frame_size + (den >> 1)) // den
        effective_bytes = vbr_rate >> (3 + BITRES)
        if constrained_vbr:
            # reservoir-capped budget (celt_encoder.c:768-776)
            max_allowed = jnp.clip(
                (vbr_rate + vbr_rate - state.vbr_reservoir)
                >> (BITRES + 3), 2, nbytes)
            nbytes = jnp.minimum(nbytes, max_allowed)
        nbytes = jnp.where(silence, 2, nbytes)
        effective_bytes = jnp.where(silence, 2, effective_bytes)
    else:
        effective_bytes = nbytes
    total_bits = nbytes * 8
    nb_available = nbytes

    # silence flag (tell==1 → always coded), then the tell jump
    c = bc.bit_logp(c, jnp.ones((B,), bool), silence.astype(_i32), 15)
    c = c._replace(nbits_total=jnp.where(
        silence, c.nbits_total + (total_bits - tell_of(c)), c.nbits_total))

    # prefilter off at complexity<5 (celt_encoder.c:1694-1756 gate)
    c = bc.bit_logp(c, bc.tell(c) + 16 <= total_bits, 0, 1)
    # transient flag (celt_encoder.c:844-851, 951-952: only LM > 0)
    if lm > 0:
        trans_room = bc.tell(c) + 3 <= total_bits
        if dq:
            isT = is_transient & trans_room
            c = bc.bit_logp(c, trans_room, isT.astype(_i32), 3)
        else:
            isT = jnp.zeros((B,), bool)
            c = bc.bit_logp(c, trans_room, 0, 3)
        transient_got_disabled = (~trans_room).astype(_i32)
    else:
        isT = jnp.zeros((B,), bool)
        transient_got_disabled = jnp.ones((B,), _i32)
    if dq:
        # per-stream MDCT selection (compute_mdcts ran both)
        X = jnp.where(isT[:, None], X_short, X)
        bandLogE = jnp.where(isT[:, None], bandLogE_short, bandLogE)
        tfe = tf_estimate
    else:
        tfe = None

    # temporal VBR follower (state parity; target unused in CBR);
    # short blocks subtract 0.5*LM (celt_encoder.c:924)
    off_db = jnp.where(isT, jnp.asarray(0.5 * lm, dt),
                       jnp.asarray(0.0, dt)) if dq else None
    follow = jnp.full((B,), -10.0, dt)
    frame_avg = jnp.zeros((B,), dt)
    for i in range(start, end):
        e = bandLogE[:, i] - off_db if dq else bandLogE[:, i]
        follow = jnp.maximum(follow - 1.0, e)
        frame_avg = frame_avg + follow
    frame_avg = frame_avg / (end - start)
    temporal_vbr = jnp.clip(frame_avg - state.spec_avg, -1.5, 3.0)
    spec_avg = state.spec_avg + 0.02 * temporal_vbr

    # dynalloc analysis on the pre-feedback energies
    if dq or vbr:
        (offsets_steps, maxDepth, importance, spread_weight,
         tot_boost_an) = dynalloc_analysis_batch(
                bandLogE, state.oldBandE, effective_bytes, t, lm,
                start, end, lsb_depth, vbr=vbr,
                constrained_vbr=constrained_vbr,
                is_transient=isT, full=True)
    else:
        offsets_steps = dynalloc_analysis_batch(
            bandLogE, state.oldBandE, effective_bytes, t, lm, start,
            end, lsb_depth, vbr=False, constrained_vbr=False,
            is_transient=jnp.zeros((B,), bool))

    # tf analysis (celt_encoder.c:959-992)
    if dq:
        if complexity >= 2:
            lam = jnp.maximum(80, 20480 // effective_bytes + 2)
            enable_tf = effective_bytes >= 15
            tf_res_an, tf_sel_an = ban.tf_analysis_batch(
                X[:, None, :], jnp.zeros((B,), _i32), isT, tfe, lam,
                importance, lm, end, end, exact)
            tf_fill = jnp.broadcast_to(isT.astype(_i32)[:, None],
                                       (B, end))
            tf_res = jnp.where(enable_tf[:, None], tf_res_an, tf_fill)
            tf_select = jnp.where(enable_tf, tf_sel_an, 0)
        else:
            tf_res = jnp.broadcast_to(isT.astype(_i32)[:, None],
                                      (B, end))
            tf_select = jnp.zeros((B,), _i32)

    # energy-error feedback (celt_encoder.c:1939-1945)
    fb = jnp.abs(bandLogE - state.oldBandE) < 2.0
    bandLogE_fb = bandLogE - jnp.where(
        fb, state.energyError * jnp.asarray(0.25, dt), 0)

    # coarse energy (single-pass; intra decision from state)
    dist = jnp.minimum(
        200.0, jnp.sum((bandLogE_fb - state.oldBandE) ** 2, axis=1))
    intra = (state.delayedIntra > 2 * (end - start)) \
        & (nb_available > (end - start))
    c, oldBandE, error = coarse_energy(
        c, bandLogE_fb, state.oldBandE, total_bits, intra, nb_available,
        lm, start, end)
    delayedIntra = jnp.where(
        intra, dist,
        jnp.asarray(PRED_COEF[lm] * PRED_COEF[lm], dt)
        * state.delayedIntra + dist)

    if dq:
        c, tf_change, _ = tf_encode_batch(
            c, tf_res, isT, tf_select, total_bits, lm, start, end)
        # spreading decision (celt_encoder.c:1007-1033)
        fits4 = bc.tell(c) + 4 <= total_bits
        if complexity >= 3:
            an_ok = (~isT) & (nb_available >= 10)
            dec_an, tav2, hf2, tap2 = ban.spreading_decision_batch(
                X[:, None, :], spread_weight,
                jnp.zeros((B,), bool), state.tonal_average,
                state.spread_decision, state.hf_average,
                state.tapset_decision, end, lm, exact)
            spread_dec = jnp.where(an_ok, dec_an, 2)
            upd = fits4 & an_ok
            tonal_average = jnp.where(upd, tav2, state.tonal_average)
            hf_average = jnp.where(upd, hf2, state.hf_average)
            tapset_decision = jnp.where(upd, tap2,
                                        state.tapset_decision)
        else:
            spread_dec = jnp.full((B,), 2, _i32)     # SPREAD_NORMAL
            tonal_average = state.tonal_average
            hf_average = state.hf_average
            tapset_decision = state.tapset_decision
        spread_decision = jnp.where(fits4, spread_dec,
                                    state.spread_decision)
        c = bc.icdf(c, fits4, spread_dec,
                    np.asarray(SPREAD_ICDF, np.int32), 5)
    else:
        c = tf_encode_zeros(c, total_bits, lm, start, end)
        c = spread_decision_c0(c, total_bits)
        tf_change = None
        spread_decision = None

    total_bits_q3 = total_bits << BITRES
    c, offsets_q3, total_boost = dynalloc_coding(
        c, offsets_steps, t.caps, total_bits_q3, lm, 1, start, end,
        t.e_bands)

    equiv_rate = (nbytes0 * 8 * 50 << (3 - lm)) \
        - 60 * ((400 >> lm) - 50)
    equiv_rate = jnp.minimum(equiv_rate,
                             bitrate - 60 * ((400 >> lm) - 50))
    trim = alloc_trim_batch(bandLogE_fb, equiv_rate, end, exact,
                            tf_estimate=tfe)
    fits = bc.tell_frac(c) + (6 << BITRES) <= total_bits_q3 - total_boost
    trim = jnp.where(fits, trim, 5)
    c = bc.icdf(c, fits, trim, np.asarray(TRIM_ICDF, np.int32), 7)

    # VBR target + budget replanning (celt_encoder.c:1090-1152 /
    # encoder.py:1090-1152): the range coder shrinks to the computed
    # per-stream byte count; everything after uses nbytes_final
    vbr_state = {}
    if vbr:
        tellf = bc.tell_frac(c)
        lm_diff = 3 - lm
        nbytes_cap = jnp.minimum(nbytes, 1275 >> (3 - lm))
        base_target = vbr_rate - (60 << BITRES)     # (40*C+20), C==1
        if constrained_vbr:
            # carried rate-correction offset (celt_encoder.c:1098-1099)
            base_target = base_target + (state.vbr_offset >> lm_diff)
        tfe_v = tfe if tfe is not None else jnp.zeros((B,), dt)
        target = compute_vbr_batch(
            t, base_target, lm, equiv_rate, state.lastCodedBands, 1,
            None, constrained_vbr, None, tot_boost_an, tfe_v,
            jnp.zeros((B,), _i32), maxDepth, temporal_vbr)
        target = target + tellf
        min_allowed = ((tellf + total_boost
                        + (1 << (BITRES + 3)) - 1) >> (BITRES + 3)) + 2
        navail = (target + (1 << (BITRES + 2))) >> (BITRES + 3)
        navail = jnp.minimum(jnp.maximum(min_allowed, navail),
                             nbytes_cap)
        delta = target - vbr_rate
        target = navail << (BITRES + 3)
        navail = jnp.where(silence, 2, navail)
        target = jnp.where(silence, 2 * 8 << BITRES, target)
        delta = jnp.where(silence, 0, delta)
        counting = state.vbr_count < 970
        vbr_count = jnp.where(counting, state.vbr_count + 1,
                              state.vbr_count)
        alpha = jnp.where(counting,
                          1.0 / (vbr_count.astype(dt) + 20.0),
                          jnp.asarray(0.001, dt))
        if constrained_vbr:
            reservoir = state.vbr_reservoir + (target - vbr_rate)
            drift = state.vbr_drift + (alpha * (
                (delta << lm_diff) - state.vbr_offset
                - state.vbr_drift).astype(dt)).astype(_i32)
            offset = -drift
            adjust = (-reservoir) // (8 << BITRES)
            navail = jnp.where((reservoir < 0) & ~silence,
                               navail + adjust, navail)
            reservoir = jnp.maximum(reservoir, 0)
        else:
            reservoir = state.vbr_reservoir
            drift = state.vbr_drift
            offset = state.vbr_offset
        nbytes_final = jnp.minimum(nbytes_cap, navail)
        vbr_state = dict(vbr_reservoir=reservoir, vbr_drift=drift,
                         vbr_offset=offset, vbr_count=vbr_count)
    else:
        nbytes_final = nbytes

    bits_q3 = ((nbytes_final * 8) << BITRES) - bc.tell_frac(c) - 1
    if dq:
        # anti-collapse reservation (celt_encoder.c:1156-1158)
        anti_rsv = jnp.where(
            isT & (lm >= 2) & (bits_q3 >= ((lm + 2) << BITRES)),
            1 << BITRES, 0)
        bits_q3 = bits_q3 - anti_rsv
    else:
        anti_rsv = jnp.zeros((B,), _i32)
    signal_bw = jnp.full((B,), end - 1, _i32)
    c, pulses, ebits, fine_pri, coded_bands, balance, _, _ = \
        compute_allocation_batch(c, t, offsets_q3, trim, bits_q3, lm,
                                 start, end, state.lastCodedBands,
                                 signal_bw)
    lastCodedBands = jnp.where(
        state.lastCodedBands == 0, coded_bands,
        jnp.minimum(state.lastCodedBands + 1,
                    jnp.maximum(state.lastCodedBands - 1, coded_bands)))

    c, oldBandE, error = fine_energy(c, oldBandE, error, ebits, start,
                                     end)
    c = quant_all_bands_batch(
        c, X, pulses, coded_bands,
        nbytes_final * (8 << BITRES) - anti_rsv, balance, t, lm,
        start, end, exact, spread=spread_decision, transient=isT,
        tf_change=tf_change, rotations=dq)
    if dq:
        # anti-collapse on/off bit (celt_encoder.c:1187-1189)
        c = bc.bits(c, anti_rsv > 0,
                    (state.consec_transient < 2).astype(_i32), 1)
    bits_left = nbytes_final * 8 - bc.tell(c)
    c, oldBandE, error = energy_finalise(c, oldBandE, error, ebits,
                                         fine_pri, bits_left, start, end)

    # stack the traced rows into the host lane's [B, n_slots, 4] array
    c = bc.finalize(c)

    energyError = jnp.clip(error, -0.5, 0.5)
    oldBandE = jnp.where(silence[:, None],
                         jnp.asarray(-28.0, dt), oldBandE)
    if dq:
        oldLogE = jnp.where(isT[:, None],
                            jnp.minimum(state.oldLogE, oldBandE),
                            oldBandE)
        oldLogE2 = jnp.where(isT[:, None], state.oldLogE2,
                             state.oldLogE)
        consec = jnp.where(isT | (transient_got_disabled == 1),
                           state.consec_transient + 1, 0)
        extra = dict(spread_decision=spread_decision,
                     tonal_average=tonal_average,
                     hf_average=hf_average,
                     tapset_decision=tapset_decision)
    else:
        oldLogE = oldBandE
        oldLogE2 = state.oldLogE
        consec = jnp.where(transient_got_disabled == 1,
                           state.consec_transient + 1, 0)
        extra = {}
    extra.update(vbr_state)
    new_state = CeltBatchState(
        oldBandE=oldBandE,
        oldLogE2=oldLogE2,
        oldLogE=oldLogE,
        energyError=energyError,
        delayedIntra=delayedIntra,
        spec_avg=spec_avg,
        lastCodedBands=lastCodedBands,
        consec_transient=consec, **extra)
    if vbr:
        return c, new_state, nbytes_final
    return c, new_state


def tell_of(c: PlanCoder):
    return bc.tell(c)


plan_from_spectrum_jit = jax.jit(
    plan_from_spectrum,
    static_argnames=("lm", "start", "end", "lsb_depth", "exact",
                     "complexity", "vbr", "constrained_vbr"))


def init_state_stereo(B: int, nb: int = 21, dtype=jnp.float32,
                      complexity: int = 0,
                      vbr: bool = False) -> CeltBatchState:
    z = jnp.zeros((B, 2, nb), dtype)
    extra = {}
    if complexity >= 1:
        extra = dict(spread_decision=jnp.full((B,), 2, _i32),
                     tonal_average=jnp.full((B,), 256, _i32),
                     hf_average=jnp.zeros((B,), _i32),
                     tapset_decision=jnp.zeros((B,), _i32))
    if vbr:
        extra.update(vbr_reservoir=jnp.zeros((B,), _i32),
                     vbr_drift=jnp.zeros((B,), _i32),
                     vbr_offset=jnp.zeros((B,), _i32),
                     vbr_count=jnp.zeros((B,), _i32))
    return CeltBatchState(
        oldBandE=z, oldLogE=z - 28.0, oldLogE2=z - 28.0,
        energyError=z, delayedIntra=jnp.ones((B,), dtype),
        spec_avg=jnp.zeros((B,), dtype),
        lastCodedBands=jnp.zeros((B,), _i32),
        consec_transient=jnp.zeros((B,), _i32),
        intensity=jnp.zeros((B,), _i32),
        stereo_saving=jnp.zeros((B,), dtype), **extra)


def plan_from_spectrum_stereo(X, Y, bandLogE, bandE, state: CeltBatchState,
                              nbytes, silence, bitrate, lm: int = 3,
                              start: int = 0, end: int = 21,
                              lsb_depth: int = 24, exact: bool = False,
                              disable_inv: bool = False,
                              complexity: int = 0, X_short=None,
                              Y_short=None, bandLogE_short=None,
                              bandE_short=None, is_transient=None,
                              tf_estimate=None, tf_chan=None,
                              vbr: bool = False,
                              constrained_vbr: bool = True):
    """All post-transform encoder stages for stereo/CBR
    (celt_encoder.c:1431-2356 with C == 2: intensity/dual-stereo
    decisions, C-doubled energy coding, the stereo band tree).

    X/Y: [B, N] unit-normalised LONG-block spectra; bandLogE: [B, 2, nb]
    log energies; bandE: [B, 2, nb] raw band amplitudes
    (intensity_stereo weights); nbytes: [B] int32 CBR budget; silence:
    [B] bool.  ``complexity`` as in ``plan_from_spectrum`` (>= 1 needs
    the short-MDCT inputs + transient_analysis outputs incl. tf_chan).
    Returns (PlanCoder, new_state)."""
    from . import batch_analysis as ban
    C = 2
    t = make_tables(lm, C)
    B, _, nb = bandLogE.shape
    dt = bandLogE.dtype
    c = bc.plan_init(B, MAX_OPS)
    dq = complexity >= 1 and lm > 0
    frame_size = standard_mode().short_mdct_size << lm
    nbytes0 = nbytes
    if vbr:
        den = 48000 >> BITRES
        vbr_rate = (bitrate * frame_size + (den >> 1)) // den
        effective_bytes = vbr_rate >> (3 + BITRES)
        if constrained_vbr:
            max_allowed = jnp.clip(
                (vbr_rate + vbr_rate - state.vbr_reservoir)
                >> (BITRES + 3), 2, nbytes)
            nbytes = jnp.minimum(nbytes, max_allowed)
        nbytes = jnp.where(silence, 2, nbytes)
        effective_bytes = jnp.where(silence, 2, effective_bytes)
    else:
        effective_bytes = nbytes
    total_bits = nbytes * 8
    nb_available = nbytes

    # silence flag (tell==1 → always coded), then the tell jump
    c = bc.bit_logp(c, jnp.ones((B,), bool), silence.astype(_i32), 15)
    c = c._replace(nbits_total=jnp.where(
        silence, c.nbits_total + (total_bits - tell_of(c)),
        c.nbits_total))

    # prefilter off at complexity<5 (celt_encoder.c:1694-1756 gate)
    c = bc.bit_logp(c, bc.tell(c) + 16 <= total_bits, 0, 1)
    # transient flag (celt_encoder.c:844-851, 951-952)
    if lm > 0:
        trans_room = bc.tell(c) + 3 <= total_bits
        if dq:
            isT = is_transient & trans_room
            c = bc.bit_logp(c, trans_room, isT.astype(_i32), 3)
        else:
            isT = jnp.zeros((B,), bool)
            c = bc.bit_logp(c, trans_room, 0, 3)
        transient_got_disabled = (~trans_room).astype(_i32)
    else:
        isT = jnp.zeros((B,), bool)
        transient_got_disabled = jnp.ones((B,), _i32)
    if dq:
        X = jnp.where(isT[:, None], X_short, X)
        Y = jnp.where(isT[:, None], Y_short, Y)
        bandLogE = jnp.where(isT[:, None, None], bandLogE_short,
                             bandLogE)
        bandE = jnp.where(isT[:, None, None], bandE_short, bandE)
        tfe = tf_estimate
    else:
        tfe = None

    # temporal VBR follower over both channels (celt_encoder.c:1860-75)
    off_db = jnp.where(isT, jnp.asarray(0.5 * lm, dt),
                       jnp.asarray(0.0, dt)) if dq else None
    follow = jnp.full((B,), -10.0, dt)
    frame_avg = jnp.zeros((B,), dt)
    for i in range(start, end):
        e0 = bandLogE[:, 0, i] - off_db if dq else bandLogE[:, 0, i]
        e1 = bandLogE[:, 1, i] - off_db if dq else bandLogE[:, 1, i]
        follow = jnp.maximum(follow - 1.0, e0)
        follow = jnp.maximum(follow, e1)
        frame_avg = frame_avg + follow
    frame_avg = frame_avg / (end - start)
    temporal_vbr = jnp.clip(frame_avg - state.spec_avg, -1.5, 3.0)
    spec_avg = state.spec_avg + 0.02 * temporal_vbr

    # dynalloc analysis on the pre-feedback energies
    if dq or vbr:
        (offsets_steps, maxDepth, importance, spread_weight,
         tot_boost_an) = dynalloc_analysis_batch(
                bandLogE, state.oldBandE, effective_bytes, t, lm,
                start, end, lsb_depth, vbr=vbr,
                constrained_vbr=constrained_vbr,
                is_transient=isT, full=True)
    else:
        offsets_steps = dynalloc_analysis_batch(
            bandLogE, state.oldBandE, effective_bytes, t, lm, start,
            end, lsb_depth, vbr=False, constrained_vbr=False,
            is_transient=jnp.zeros((B,), bool))

    # tf analysis (celt_encoder.c:959-992)
    if dq:
        XY = jnp.stack([X, Y], axis=1)
        if complexity >= 2:
            lam = jnp.maximum(80, 20480 // effective_bytes + 2)
            enable_tf = effective_bytes >= 15 * C
            tf_res_an, tf_sel_an = ban.tf_analysis_batch(
                XY, tf_chan, isT, tfe, lam, importance, lm, end, end,
                exact)
            tf_fill = jnp.broadcast_to(isT.astype(_i32)[:, None],
                                       (B, end))
            tf_res = jnp.where(enable_tf[:, None], tf_res_an, tf_fill)
            tf_select = jnp.where(enable_tf, tf_sel_an, 0)
        else:
            tf_res = jnp.broadcast_to(isT.astype(_i32)[:, None],
                                      (B, end))
            tf_select = jnp.zeros((B,), _i32)

    # energy-error feedback (celt_encoder.c:1939-1945)
    fb = jnp.abs(bandLogE - state.oldBandE) < 2.0
    bandLogE_fb = bandLogE - jnp.where(
        fb, state.energyError * jnp.asarray(0.25, dt), 0)

    # coarse energy (single-pass; intra decision from state)
    dist = jnp.minimum(
        200.0, jnp.sum((bandLogE_fb - state.oldBandE) ** 2,
                       axis=(1, 2)))
    intra = (state.delayedIntra > 2 * C * (end - start)) \
        & (nb_available > (end - start) * C)
    c, oldBandE, error = coarse_energy(
        c, bandLogE_fb, state.oldBandE, total_bits, intra, nb_available,
        lm, start, end)
    delayedIntra = jnp.where(
        intra, dist,
        jnp.asarray(PRED_COEF[lm] * PRED_COEF[lm], dt)
        * state.delayedIntra + dist)

    if dq:
        c, tf_change, _ = tf_encode_batch(
            c, tf_res, isT, tf_select, total_bits, lm, start, end)
        fits4 = bc.tell(c) + 4 <= total_bits
        if complexity >= 3:
            an_ok = (~isT) & (nb_available >= 10 * C)
            dec_an, tav2, hf2, tap2 = ban.spreading_decision_batch(
                XY, spread_weight, jnp.zeros((B,), bool),
                state.tonal_average, state.spread_decision,
                state.hf_average, state.tapset_decision, end, lm,
                exact)
            spread_dec = jnp.where(an_ok, dec_an, 2)
            upd = fits4 & an_ok
            tonal_average = jnp.where(upd, tav2, state.tonal_average)
            hf_average = jnp.where(upd, hf2, state.hf_average)
            tapset_decision = jnp.where(upd, tap2,
                                        state.tapset_decision)
        else:
            spread_dec = jnp.full((B,), 2, _i32)
            tonal_average = state.tonal_average
            hf_average = state.hf_average
            tapset_decision = state.tapset_decision
        spread_decision = jnp.where(fits4, spread_dec,
                                    state.spread_decision)
        c = bc.icdf(c, fits4, spread_dec,
                    np.asarray(SPREAD_ICDF, np.int32), 5)
    else:
        c = tf_encode_zeros(c, total_bits, lm, start, end)
        c = spread_decision_c0(c, total_bits)
        tf_change = None
        spread_decision = None

    total_bits_q3 = total_bits << BITRES
    c, offsets_q3, total_boost = dynalloc_coding(
        c, offsets_steps, t.caps, total_bits_q3, lm, C, start, end,
        t.e_bands)

    # intensity hysteresis + dual-stereo decision
    # (celt_encoder.c:2051-2075)
    equiv_rate = (nbytes0 * 8 * 50 << (3 - lm)) \
        - (40 * C + 20) * ((400 >> lm) - 50)
    equiv_rate = jnp.minimum(
        equiv_rate, bitrate - (40 * C + 20) * ((400 >> lm) - 50))
    if lm != 0:
        dual_stereo = stereo_analysis_batch(X, Y, lm, exact).astype(_i32)
    else:
        dual_stereo = jnp.zeros((B,), _i32)
    intensity = hysteresis_decision_batch(
        (equiv_rate.astype(dt)) / 1000.0, INTENSITY_THRESHOLDS,
        INTENSITY_HISTERESIS, state.intensity)
    intensity = jnp.clip(intensity, start, end)

    trim, stereo_saving = alloc_trim_batch(
        bandLogE_fb, equiv_rate, end, exact, X=X, Y=Y, lm=lm,
        intensity=intensity, stereo_saving=state.stereo_saving,
        tf_estimate=tfe)
    fits = bc.tell_frac(c) + (6 << BITRES) <= total_bits_q3 - total_boost
    trim = jnp.where(fits, trim, 5)
    stereo_saving = jnp.where(fits, stereo_saving, state.stereo_saving)
    c = bc.icdf(c, fits, trim, np.asarray(TRIM_ICDF, np.int32), 7)

    # VBR target + budget replanning (celt_encoder.c:1090-1152)
    vbr_state = {}
    if vbr:
        tellf = bc.tell_frac(c)
        lm_diff = 3 - lm
        nbytes_cap = jnp.minimum(nbytes, 1275 >> (3 - lm))
        base_target = vbr_rate - ((40 * C + 20) << BITRES)
        if constrained_vbr:
            base_target = base_target + (state.vbr_offset >> lm_diff)
        tfe_v = tfe if tfe is not None else jnp.zeros((B,), dt)
        target = compute_vbr_batch(
            t, base_target, lm, equiv_rate, state.lastCodedBands, C,
            intensity, constrained_vbr, stereo_saving, tot_boost_an,
            tfe_v, jnp.zeros((B,), _i32), maxDepth, temporal_vbr)
        target = target + tellf
        min_allowed = ((tellf + total_boost
                        + (1 << (BITRES + 3)) - 1) >> (BITRES + 3)) + 2
        navail = (target + (1 << (BITRES + 2))) >> (BITRES + 3)
        navail = jnp.minimum(jnp.maximum(min_allowed, navail),
                             nbytes_cap)
        delta = target - vbr_rate
        target = navail << (BITRES + 3)
        navail = jnp.where(silence, 2, navail)
        target = jnp.where(silence, 2 * 8 << BITRES, target)
        delta = jnp.where(silence, 0, delta)
        counting = state.vbr_count < 970
        vbr_count = jnp.where(counting, state.vbr_count + 1,
                              state.vbr_count)
        alpha = jnp.where(counting,
                          1.0 / (vbr_count.astype(dt) + 20.0),
                          jnp.asarray(0.001, dt))
        if constrained_vbr:
            reservoir = state.vbr_reservoir + (target - vbr_rate)
            drift = state.vbr_drift + (alpha * (
                (delta << lm_diff) - state.vbr_offset
                - state.vbr_drift).astype(dt)).astype(_i32)
            offset = -drift
            adjust = (-reservoir) // (8 << BITRES)
            navail = jnp.where((reservoir < 0) & ~silence,
                               navail + adjust, navail)
            reservoir = jnp.maximum(reservoir, 0)
        else:
            reservoir = state.vbr_reservoir
            drift = state.vbr_drift
            offset = state.vbr_offset
        nbytes_final = jnp.minimum(nbytes_cap, navail)
        vbr_state = dict(vbr_reservoir=reservoir, vbr_drift=drift,
                         vbr_offset=offset, vbr_count=vbr_count)
    else:
        nbytes_final = nbytes

    bits_q3 = ((nbytes_final * 8) << BITRES) - bc.tell_frac(c) - 1
    if dq:
        anti_rsv = jnp.where(
            isT & (lm >= 2) & (bits_q3 >= ((lm + 2) << BITRES)),
            1 << BITRES, 0)
        bits_q3 = bits_q3 - anti_rsv
    else:
        anti_rsv = jnp.zeros((B,), _i32)
    signal_bw = jnp.full((B,), end - 1, _i32)
    (c, pulses, ebits, fine_pri, coded_bands, balance, intensity,
     dual_stereo) = compute_allocation_batch(
        c, t, offsets_q3, trim, bits_q3, lm, start, end,
        state.lastCodedBands, signal_bw, C=C, intensity=intensity,
        dual_stereo=dual_stereo)
    lastCodedBands = jnp.where(
        state.lastCodedBands == 0, coded_bands,
        jnp.minimum(state.lastCodedBands + 1,
                    jnp.maximum(state.lastCodedBands - 1, coded_bands)))

    c, oldBandE, error = fine_energy(c, oldBandE, error, ebits, start,
                                     end)
    c = quant_all_bands_batch(
        c, X, pulses, coded_bands,
        nbytes_final * (8 << BITRES) - anti_rsv, balance, t,
        lm, start, end, exact, Y=Y, intensity=intensity,
        dual_stereo=dual_stereo, bandE=bandE, disable_inv=disable_inv,
        spread=spread_decision, transient=isT, tf_change=tf_change,
        rotations=dq)
    if dq:
        c = bc.bits(c, anti_rsv > 0,
                    (state.consec_transient < 2).astype(_i32), 1)
    bits_left = nbytes_final * 8 - bc.tell(c)
    c, oldBandE, error = energy_finalise(c, oldBandE, error, ebits,
                                         fine_pri, bits_left, start, end)

    # stack the traced rows into the host lane's [B, n_slots, 4] array
    c = bc.finalize(c)

    energyError = jnp.clip(error, -0.5, 0.5)
    oldBandE = jnp.where(silence[:, None, None],
                         jnp.asarray(-28.0, dt), oldBandE)
    if dq:
        oldLogE = jnp.where(isT[:, None, None],
                            jnp.minimum(state.oldLogE, oldBandE),
                            oldBandE)
        oldLogE2 = jnp.where(isT[:, None, None], state.oldLogE2,
                             state.oldLogE)
        consec = jnp.where(isT | (transient_got_disabled == 1),
                           state.consec_transient + 1, 0)
        extra = dict(spread_decision=spread_decision,
                     tonal_average=tonal_average,
                     hf_average=hf_average,
                     tapset_decision=tapset_decision)
    else:
        oldLogE = oldBandE
        oldLogE2 = state.oldLogE
        consec = jnp.where(transient_got_disabled == 1,
                           state.consec_transient + 1, 0)
        extra = {}
    extra.update(vbr_state)
    new_state = CeltBatchState(
        oldBandE=oldBandE,
        oldLogE2=oldLogE2,
        oldLogE=oldLogE,
        energyError=energyError,
        delayedIntra=delayedIntra,
        spec_avg=spec_avg,
        lastCodedBands=lastCodedBands,
        consec_transient=consec,
        intensity=intensity,
        stereo_saving=stereo_saving, **extra)
    if vbr:
        return c, new_state, nbytes_final
    return c, new_state


plan_from_spectrum_stereo_jit = jax.jit(
    plan_from_spectrum_stereo,
    static_argnames=("lm", "start", "end", "lsb_depth", "exact",
                     "disable_inv", "complexity", "vbr",
                     "constrained_vbr"))


def cbr_bytes(bitrate: int, frame_size: int, fs: int,
              max_bytes: int) -> int:
    """The CBR byte budget (celt/encoder.py:750-757, tell==1)."""
    tmp = bitrate * frame_size
    return max(2, min(min(max_bytes, 1275), (tmp + 4 * fs) // (8 * fs)))


# ---------------------------------------------------------------------------
# Full device pipeline: PCM -> plan (transform from celt.batch + planner)

class CeltStreamState(NamedTuple):
    """Everything a batched CELT encode stream carries across frames."""
    celt: CeltBatchState
    preemph_mem: jnp.ndarray    # [B]
    in_mem: jnp.ndarray         # [B, overlap]
    overlap_max: jnp.ndarray    # [B]


def init_stream_state(B: int, dtype=jnp.float32,
                      complexity: int = 0,
                      vbr: bool = False) -> CeltStreamState:
    m = standard_mode()
    return CeltStreamState(
        celt=init_state(B, dtype=dtype, complexity=complexity,
                        vbr=vbr),
        preemph_mem=jnp.zeros((B,), dtype),
        in_mem=jnp.zeros((B, m.overlap), dtype),
        overlap_max=jnp.zeros((B,), dtype))


def celt_encode_batch_plan(pcm, st: CeltStreamState, nbytes, bitrate,
                           lm: int = 3, lsb_depth: int = 24,
                           exact: bool = False, complexity: int = 0,
                           vbr: bool = False,
                           constrained_vbr: bool = True):
    """One 20 ms frame for a batch of mono streams: preemphasis, MDCT,
    band energies, normalisation (celt.batch matmul transforms) and the
    full symbol-planning pass.  pcm: [B, N] in [-1, 1].

    With complexity >= 1 the transient analysis runs on the
    preemphasised signal and BOTH block sizes are transformed (two
    matmuls); the plan selects per stream.  Returns (PlanCoder,
    new_state)."""
    from .batch import (band_energies_batch, mdct_forward_batch,
                        mdct_forward_short_batch, normalise_batch,
                        preemphasis_batch)
    from . import batch_analysis as ban
    m = standard_mode()
    dt = pcm.dtype
    B, N = pcm.shape
    ov = m.overlap

    # silence detection state (celt_encoder.c:1611-1628)
    npcm = N - ov
    s1 = st.overlap_max if npcm == 0 else jnp.maximum(
        st.overlap_max, jnp.max(jnp.abs(pcm[:, :npcm]), axis=1))
    new_ovm = jnp.max(jnp.abs(pcm[:, npcm:]), axis=1)
    sample_max = jnp.maximum(s1, new_ovm)
    silence = sample_max <= (1.0 / (1 << lsb_depth))

    sig, pmem = preemphasis_batch(pcm, st.preemph_mem)
    inb = jnp.concatenate([st.in_mem, sig], axis=1)
    in_mem2 = inb[:, N:N + ov]
    spec = mdct_forward_batch(inb, m.short_mdct_size << lm)
    bandE = band_energies_batch(spec, lm)
    bandLogE = jnp.log2(bandE) - jnp.asarray(EMEANS[:21], dt)[None, :]
    X = normalise_batch(spec, bandE, lm)

    kw = {}
    if complexity >= 1 and lm > 0:
        is_t, tfe, _tfc, _mm = ban.transient_analysis_batch(
            inb[:, None, :], exact)
        spec_s = mdct_forward_short_batch(inb, lm)
        bandE_s = band_energies_batch(spec_s, lm)
        bandLogE_s = jnp.log2(bandE_s) \
            - jnp.asarray(EMEANS[:21], dt)[None, :]
        X_s = normalise_batch(spec_s, bandE_s, lm)
        kw = dict(X_short=X_s.astype(dt),
                  bandLogE_short=bandLogE_s.astype(dt),
                  is_transient=is_t, tf_estimate=tfe.astype(dt))

    out = plan_from_spectrum(X.astype(dt), bandLogE.astype(dt),
                             st.celt, nbytes, silence, bitrate,
                             lm=lm, lsb_depth=lsb_depth,
                             exact=exact, complexity=complexity,
                             vbr=vbr, constrained_vbr=constrained_vbr,
                             **kw)
    if vbr:
        c, celt2, sizes = out
    else:
        c, celt2 = out
    st2 = CeltStreamState(celt=celt2, preemph_mem=pmem,
                          in_mem=in_mem2, overlap_max=new_ovm)
    if vbr:
        return c, st2, sizes
    return c, st2


celt_encode_batch_plan_jit = jax.jit(
    celt_encode_batch_plan,
    static_argnames=("lm", "lsb_depth", "exact", "complexity", "vbr",
                     "constrained_vbr"))


def init_stream_state_stereo(B: int, dtype=jnp.float32,
                             complexity: int = 0,
                             vbr: bool = False) -> CeltStreamState:
    m = standard_mode()
    return CeltStreamState(
        celt=init_state_stereo(B, dtype=dtype, complexity=complexity,
                               vbr=vbr),
        preemph_mem=jnp.zeros((B, 2), dtype),
        in_mem=jnp.zeros((B, 2, m.overlap), dtype),
        overlap_max=jnp.zeros((B,), dtype))


def celt_encode_batch_plan_stereo(pcm, st: CeltStreamState, nbytes,
                                  bitrate, lm: int = 3,
                                  lsb_depth: int = 24,
                                  exact: bool = False,
                                  complexity: int = 0,
                                  vbr: bool = False,
                                  constrained_vbr: bool = True):
    """One frame for a batch of *stereo* streams: per-channel
    preemphasis/MDCT/band energies (celt.batch matmuls over the
    flattened [2B] channel axis) and the stereo symbol-planning pass.
    pcm: [B, 2, N] in [-1, 1].  Returns (PlanCoder, new_state)."""
    from .batch import (band_energies_batch, mdct_forward_batch,
                        mdct_forward_short_batch, normalise_batch,
                        preemphasis_batch)
    from . import batch_analysis as ban
    m = standard_mode()
    dt = pcm.dtype
    B, C, N = pcm.shape
    ov = m.overlap

    # silence detection over both channels (celt_encoder.c:1611-1628)
    npcm = N - ov
    s1 = st.overlap_max if npcm == 0 else jnp.maximum(
        st.overlap_max, jnp.max(jnp.abs(pcm[:, :, :npcm]), axis=(1, 2)))
    new_ovm = jnp.max(jnp.abs(pcm[:, :, npcm:]), axis=(1, 2)) \
        if N > npcm else jnp.zeros((B,), dt)
    sample_max = jnp.maximum(s1, new_ovm)
    silence = sample_max <= (1.0 / (1 << lsb_depth))

    pcm2 = pcm.reshape(B * C, N)
    sig, pmem2 = preemphasis_batch(pcm2, st.preemph_mem.reshape(B * C))
    inb = jnp.concatenate([st.in_mem.reshape(B * C, ov), sig], axis=1)
    in_mem2 = inb[:, N:N + ov].reshape(B, C, ov)
    spec = mdct_forward_batch(inb, m.short_mdct_size << lm)
    bandE2 = band_energies_batch(spec, lm)          # [2B, nb]
    bandLogE2 = jnp.log2(bandE2) - jnp.asarray(EMEANS[:21], dt)[None, :]
    Xn = normalise_batch(spec, bandE2, lm)          # [2B, Nf]
    Nf = Xn.shape[1]
    Xn = Xn.reshape(B, C, Nf)
    bandE = bandE2.reshape(B, C, -1)
    bandLogE = bandLogE2.reshape(B, C, -1)

    kw = {}
    if complexity >= 1 and lm > 0:
        is_t, tfe, tfc, _mm = ban.transient_analysis_batch(
            inb.reshape(B, C, N + ov), exact)
        spec_s = mdct_forward_short_batch(inb, lm)
        bandE_s2 = band_energies_batch(spec_s, lm)
        bandLogE_s2 = jnp.log2(bandE_s2) \
            - jnp.asarray(EMEANS[:21], dt)[None, :]
        Xs = normalise_batch(spec_s, bandE_s2, lm).reshape(B, C, Nf)
        kw = dict(X_short=Xs[:, 0].astype(dt),
                  Y_short=Xs[:, 1].astype(dt),
                  bandLogE_short=bandLogE_s2.reshape(B, C, -1
                                                     ).astype(dt),
                  bandE_short=bandE_s2.reshape(B, C, -1).astype(dt),
                  is_transient=is_t, tf_estimate=tfe.astype(dt),
                  tf_chan=tfc)

    out = plan_from_spectrum_stereo(
        Xn[:, 0].astype(dt), Xn[:, 1].astype(dt), bandLogE.astype(dt),
        bandE.astype(dt), st.celt, nbytes, silence, bitrate, lm=lm,
        lsb_depth=lsb_depth, exact=exact, complexity=complexity,
        vbr=vbr, constrained_vbr=constrained_vbr, **kw)
    if vbr:
        c, celt2, sizes = out
    else:
        c, celt2 = out
    st2 = CeltStreamState(celt=celt2,
                          preemph_mem=pmem2.reshape(B, C),
                          in_mem=in_mem2, overlap_max=new_ovm)
    if vbr:
        return c, st2, sizes
    return c, st2


celt_encode_batch_plan_stereo_jit = jax.jit(
    celt_encode_batch_plan_stereo,
    static_argnames=("lm", "lsb_depth", "exact", "complexity", "vbr",
                     "constrained_vbr"))
