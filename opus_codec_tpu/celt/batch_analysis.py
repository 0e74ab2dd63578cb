"""Batched CELT encoder analysis — the default-quality decision set.

Device twins of the scalar analysis passes that the reference encoder
runs at its default complexity (9) and that the round-4 batched lane
coded as constants: transient analysis (celt_encoder.c:227-419),
patch_transient_decision (:423-457), tf_analysis (:595-754) and
spreading_decision (bands.c:479-570).  Every function takes ``[B,...]``
batches and an ``exact`` flag: with ``exact`` (float64 backend) the
sequential reference operation order is reproduced bit-for-bit via
``lax.scan``; the fast float32 path replaces the serial IIR recurrences
with Toeplitz-matmul convolutions (same math, MXU-friendly summation
order) and is gated by decoder-acceptance/SNR tests instead.

The scalar functions in ``celt.encoder`` are the tested ground truth.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .encoder import _INV_TABLE
from .modes import standard_mode

_i32 = jnp.int32


# ---------------------------------------------------------------------------
# transient_analysis (celt_encoder.c:227-419, float build)

@lru_cache(maxsize=None)
def _transient_kernels(L: int):
    """Constant convolution kernels for the fast (f32) path.

    K1 [L, L]: the 2nd-order HP filter bank tmp = K1 @ x  (tmp[i] =
    y_i of the mem0/mem1 recurrence; rows < 12 zeroed).
    K2f [len2, len2]: forward masking tmp_f = K2f @ x2.
    K2b [len2, len2]: backward masking tmp_b = K2b @ tmp_f.
    All built by running the scalar recurrences on impulse columns.
    """
    # 2nd-order filter: y = mem0 + x; mem0' = mem0 - x + .5 mem1;
    # mem1' = x - mem0_old  (run all impulse responses in parallel)
    K1 = np.zeros((L, L))
    mem0 = np.zeros(L)
    mem1 = np.zeros(L)
    for i in range(L):
        xi = np.zeros(L)
        xi[i] = 1.0
        y = mem0 + xi
        mem00 = mem0
        mem0 = mem0 - xi + 0.5 * mem1
        mem1 = xi - mem00
        K1[i] = y
    K1[:12] = 0.0
    len2 = L // 2
    d = 0.0625                                   # forward_decay
    jj, ii = np.meshgrid(np.arange(len2), np.arange(len2))
    K2f = np.where(jj <= ii, d * (1.0 - d) ** np.maximum(ii - jj, 0), 0.0)
    K2b = np.where(jj >= ii, 0.125 * 0.875 ** np.maximum(jj - ii, 0), 0.0)
    return (np.asarray(K1, np.float32), np.asarray(K2f, np.float32),
            np.asarray(K2b, np.float32))


def _transient_filters_exact(x):
    """Sequential reference recurrences via lax.scan (float64 parity).
    x: [R, L].  Returns (tmp [R, L], x2 [R, len2], tmp_f, tmp_b, mean,
    maxE) with the scalar's exact operation order."""
    R, L = x.shape
    dt = x.dtype
    len2 = L // 2

    def f1(carry, xi):
        mem0, mem1 = carry
        y = mem0 + xi
        mem0n = mem0 - xi + 0.5 * mem1
        mem1n = xi - mem0
        return (mem0n, mem1n), y

    z = jnp.zeros((R,), dt)
    _, tmp = jax.lax.scan(f1, (z, z), x.T)
    tmp = tmp.T
    tmp = tmp.at[:, :12].set(0.0)
    x2 = tmp[:, 0::2] ** 2 + tmp[:, 1::2] ** 2

    d = jnp.asarray(0.0625, dt)

    def f2(carry, v):
        mean, mem0 = carry
        mean = mean + v
        mem0 = v + (1.0 - d) * mem0
        return (mean, mem0), d * mem0

    (mean, _), tf = jax.lax.scan(f2, (z, z), x2.T)
    tf = tf.T

    def f3(carry, v):
        mem0, maxE = carry
        mem0 = v + 0.875 * mem0
        out = 0.125 * mem0
        maxE = jnp.maximum(maxE, out)
        return (mem0, maxE), out

    (_, maxE), tb = jax.lax.scan(f3, (z, z), tf[:, ::-1].T)
    tb = tb.T[:, ::-1]
    return tmp, x2, tf, tb, mean, maxE


def transient_analysis_batch(x, exact: bool):
    """x: [B, C, L] preemphasised input (celt_encoder.c:227-419,
    allow_weak_transients == False — the batched lane is CELT-only).

    Returns (is_transient [B] bool, tf_estimate [B], tf_chan [B] i32,
    mask_metric [B] i32)."""
    B, C, L = x.shape
    dt = x.dtype
    len2 = L // 2
    xr = x.reshape(B * C, L)
    if exact:
        _, x2, tf, tb, mean, maxE = _transient_filters_exact(xr)
    else:
        K1, K2f, K2b = _transient_kernels(L)
        tmp = jnp.matmul(xr, jnp.asarray(K1, dt).T,
                         preferred_element_type=dt)
        x2 = tmp[:, 0::2] ** 2 + tmp[:, 1::2] ** 2
        mean = jnp.sum(x2, axis=-1)
        tf = jnp.matmul(x2, jnp.asarray(K2f, dt).T,
                        preferred_element_type=dt)
        tb = jnp.matmul(tf, jnp.asarray(K2b, dt).T,
                        preferred_element_type=dt)
        maxE = jnp.max(tb, axis=-1)

    # mean = sqrt(mean * maxE * .5 * len2); norm = len2/(1e-15+mean/2)
    mean_s = jnp.sqrt(mean * maxE * 0.5 * len2)
    norm = len2 / (1e-15 + mean_s / 2.0)
    pos = np.arange(12, len2 - 5, 4)
    vals = tb[:, pos]                              # [R, P]
    idx = jnp.clip(jnp.floor(64.0 * norm[:, None] * (vals + 1e-15)),
                   0, 127).astype(_i32)
    inv = jnp.asarray(np.asarray(_INV_TABLE, np.int32))
    # one-hot lookup (TPU-friendly; 128-entry table)
    looked = jnp.sum(
        jnp.where(idx[:, :, None] == np.arange(128)[None, None, :],
                  inv[None, None, :], 0), axis=-1)
    unmask = jnp.sum(looked, axis=-1)
    unmask = 64 * unmask * 4 // (6 * (len2 - 17))
    unmask = unmask.reshape(B, C)

    # channel with the strictly larger metric wins (scalar keeps the
    # first maximum: c is taken only when unmask > mask_metric)
    mask_metric = jnp.max(unmask, axis=1)
    if C == 1:
        tf_chan = jnp.zeros((B,), _i32)
    else:
        tf_chan = jnp.argmax(unmask, axis=1).astype(_i32)
    is_transient = mask_metric > 200
    tf_max = jnp.maximum(
        0.0, jnp.sqrt(jnp.maximum(27.0 * mask_metric, 0.0).astype(dt))
        - 42.0)
    tf_estimate = jnp.sqrt(jnp.maximum(
        0.0, 0.0069 * jnp.minimum(163.0, tf_max) - 0.139)).astype(dt)
    return is_transient, tf_estimate, tf_chan, mask_metric


# ---------------------------------------------------------------------------
# patch_transient_decision (celt_encoder.c:423-457)

def patch_transient_batch(newE, oldE, start: int, end: int):
    """newE/oldE: [B, C, nb].  Returns [B] bool (mean_diff > 1)."""
    dt = newE.dtype
    B, C, nb = newE.shape
    old_m = jnp.max(oldE, axis=1)                   # [B, nb]
    spread = [None] * nb
    spread[start] = old_m[:, start]
    for i in range(start + 1, end):
        spread[i] = jnp.maximum(spread[i - 1] - 1.0, old_m[:, i])
    for i in range(end - 2, start - 1, -1):
        spread[i] = jnp.maximum(spread[i], spread[i + 1] - 1.0)
    mean_diff = jnp.zeros((B,), dt)
    lo = max(2, start)
    for c in range(C):
        for i in range(lo, end - 1):
            x1 = jnp.maximum(0.0, newE[:, c, i])
            x2 = jnp.maximum(0.0, spread[i])
            mean_diff = mean_diff + jnp.maximum(0.0, x1 - x2)
    mean_diff = mean_diff / (C * (end - 1 - lo))
    return mean_diff > 1.0


# ---------------------------------------------------------------------------
# tf_analysis (celt_encoder.c:595-754)

TF_SELECT_TABLE = (
    (0, -1, 0, -1, 0, -1, 0, -1),
    (0, -1, 0, -2, 1, 0, 1, -1),
    (0, -2, 0, -3, 2, 0, 1, -1),
    (0, -2, 0, -3, 3, 0, 1, -1),
)


def _haar_level(seg, N: int, k: int):
    """haar1(seg[:, :N], N0=N>>k, stride=1<<k) vectorised; entries at
    columns >= N untouched."""
    s = 1 << k
    n0 = N >> (k + 1)          # pair count
    if n0 < 1:
        return seg
    head = seg[:, :n0 * 2 * s].reshape(seg.shape[0], n0, 2, s)
    a = 0.70710678 * head[:, :, 0, :]
    b = 0.70710678 * head[:, :, 1, :]
    out = jnp.stack([a + b, a - b], axis=2).reshape(
        seg.shape[0], n0 * 2 * s)
    return jnp.concatenate([out, seg[:, n0 * 2 * s:]], axis=1)


def tf_analysis_batch(X, tf_chan, is_transient, tf_estimate, lam,
                      importance, lm: int, eff_end: int, end: int,
                      exact: bool):
    """X: [B, C, N0] normalised spectra; tf_chan [B] i32; is_transient
    [B] bool; tf_estimate [B]; lam [B] i32; importance [B, nb] i32.

    Returns (tf_res [B, nb] i32 in {0,1}, tf_select [B] i32) —
    mirrors tf_analysis + the caller's effEnd..end fill
    (celt_encoder.c:974-992)."""
    from .batch_encoder import _seq_sum
    m = standard_mode()
    B = X.shape[0]
    dt = X.dtype
    bias = 0.04 * jnp.maximum(
        jnp.asarray(-0.25, dt), 0.5 - tf_estimate)      # [B]
    # channel select ([B, N0])
    if X.shape[1] == 1:
        Xc = X[:, 0]
    else:
        Xc = jnp.where((tf_chan == 0)[:, None], X[:, 0], X[:, 1])

    metric = []                                        # [B] per band
    for i in range(eff_end):
        N = (int(m.e_bands[i + 1]) - int(m.e_bands[i])) << lm
        narrow = (int(m.e_bands[i + 1]) - int(m.e_bands[i])) == 1
        base = int(m.e_bands[i]) << lm
        seg = jax.lax.slice_in_dim(Xc, base, base + N, axis=1)

        def l1(s, Bv):
            v = _seq_sum(jnp.abs(s[:, :N]), exact)
            return v + Bv * bias * v

        L1 = l1(seg, jnp.where(is_transient, float(lm), 0.0))
        best_L1 = L1
        best_level = jnp.zeros((B,), _i32)
        if not narrow:
            # transient streams: one haar ACROSS blocks first
            t1 = _haar_level(seg, N, lm)
            L1t = l1(t1, jnp.asarray(float(lm + 1), dt))
            better = is_transient & (L1t < best_L1)
            best_L1 = jnp.where(better, L1t, best_L1)
            best_level = jnp.where(better, -1, best_level)
        # cumulative within-block haar cascade.  Scalar: range(LM +
        # (0 if (isTransient or narrow) else 1)); for narrow bands the
        # loop body never runs in either mode when LM==0... narrow
        # bands run the loop too (with k up to LM-1 / LM).
        tmp = seg
        kmax_t = lm            # transient: k in [0, LM)
        kmax_nt = lm + (0 if narrow else 1)
        for k in range(max(kmax_t, kmax_nt)):
            run_t = k < kmax_t
            run_nt = k < kmax_nt
            tmp = _haar_level(tmp, N, k)
            Bv = jnp.where(is_transient, float(lm - k - 1), float(k + 1))
            L1k = l1(tmp, Bv)
            active = jnp.where(is_transient, run_t, run_nt)
            better = active & (L1k < best_L1)
            best_L1 = jnp.where(better, L1k, best_L1)
            best_level = jnp.where(better, k + 1, best_level)
        mi = jnp.where(is_transient, 2 * best_level, -2 * best_level)
        if narrow:
            mi = mi - ((mi == 0) | (mi == -2 * lm)).astype(_i32)
        metric.append(mi)
    metric = jnp.stack(metric, axis=1)                 # [B, effEnd]

    ist = is_transient.astype(_i32)                    # [B]
    tbl = np.asarray(TF_SELECT_TABLE[lm], np.int32)

    def tcost(i, sel, bit):
        # |metric[i] - 2*table[4*ist + 2*sel + bit]| * importance[i]
        tv = jnp.where(ist == 1, int(tbl[4 + 2 * sel + bit]),
                       int(tbl[2 * sel + bit]))
        return importance[:, i] * jnp.abs(metric[:, i] - 2 * tv)

    lam_t = jnp.where(is_transient, 0, lam)
    selcost = []
    for sel in range(2):
        cost0 = tcost(0, sel, 0)
        cost1 = tcost(0, sel, 1) + lam_t
        for i in range(1, eff_end):
            curr0 = jnp.minimum(cost0, cost1 + lam)
            curr1 = jnp.minimum(cost0 + lam, cost1)
            cost0 = curr0 + tcost(i, sel, 0)
            cost1 = curr1 + tcost(i, sel, 1)
        selcost.append(jnp.minimum(cost0, cost1))
    tf_select = ((selcost[1] < selcost[0]) & is_transient).astype(_i32)

    def tcost_sel(i, bit):
        tv_s0 = jnp.where(ist == 1, int(tbl[4 + bit]), int(tbl[bit]))
        tv_s1 = jnp.where(ist == 1, int(tbl[6 + bit]), int(tbl[2 + bit]))
        tv = jnp.where(tf_select == 1, tv_s1, tv_s0)
        return importance[:, i] * jnp.abs(metric[:, i] - 2 * tv)

    cost0 = tcost_sel(0, 0)
    cost1 = tcost_sel(0, 1) + lam_t
    path0 = [jnp.zeros((B,), _i32)]
    path1 = [jnp.zeros((B,), _i32)]
    for i in range(1, eff_end):
        from1 = cost1 + lam
        p0 = (cost0 >= from1).astype(_i32)
        curr0 = jnp.minimum(cost0, from1)
        from0 = cost0 + lam
        p1 = (from0 >= cost1).astype(_i32)
        curr1 = jnp.minimum(from0, cost1)
        path0.append(p0)
        path1.append(p1)
        cost0 = curr0 + tcost_sel(i, 0)
        cost1 = curr1 + tcost_sel(i, 1)
    tf_res = [None] * eff_end
    tf_res[eff_end - 1] = (cost0 >= cost1).astype(_i32)
    for i in range(eff_end - 2, -1, -1):
        tf_res[i] = jnp.where(tf_res[i + 1] == 1, path1[i + 1],
                              path0[i + 1])
    res = jnp.stack(tf_res, axis=1)
    if end > eff_end:
        res = jnp.concatenate(
            [res, jnp.tile(res[:, eff_end - 1:eff_end],
                           (1, end - eff_end))], axis=1)
    return res, tf_select


# ---------------------------------------------------------------------------
# spreading_decision (bands.c:479-570)

def spreading_decision_batch(X, spread_weight, update_hf, tonal_avg,
                             last_decision, hf_avg, tapset, end: int,
                             lm: int, exact: bool):
    """X: [B, C, N0] normalised spectra; spread_weight [B, nb] i32;
    update_hf [B] bool; tonal_avg/last_decision/hf_avg/tapset [B] i32.

    Returns (decision [B] i32, tonal_avg', hf_avg', tapset') — all the
    carried encoder state (bands.c:479-570).  The early-exit when the
    last band is ``<= 8`` wide never triggers for the standard mode at
    lm >= 1 (M*(e_bands[end]-e_bands[end-1]) = 22M)."""
    m = standard_mode()
    B, C, N0 = X.shape
    M = 1 << lm
    nbe = m.nb_ebands
    assert M * (int(m.e_bands[end]) - int(m.e_bands[end - 1])) > 8
    sum_ = jnp.zeros((B,), _i32)
    nb_bands = jnp.zeros((B,), _i32)
    hf_sum = jnp.zeros((B,), _i32)
    for c in range(C):
        for i in range(end):
            N = M * (int(m.e_bands[i + 1]) - int(m.e_bands[i]))
            if N <= 8:
                continue
            base = M * int(m.e_bands[i])
            x = jax.lax.slice_in_dim(X[:, c], base, base + N, axis=1)
            x2N = x * x * N
            t0 = jnp.sum((x2N < 0.25).astype(_i32), axis=1)
            t1 = jnp.sum((x2N < 0.0625).astype(_i32), axis=1)
            t2 = jnp.sum((x2N < 0.015625).astype(_i32), axis=1)
            if i > nbe - 4:
                hf_sum = hf_sum + (32 * (t1 + t0)) // N
            tmp = ((2 * t2 >= N).astype(_i32)
                   + (2 * t1 >= N).astype(_i32)
                   + (2 * t0 >= N).astype(_i32))
            sum_ = sum_ + tmp * spread_weight[:, i]
            nb_bands = nb_bands + spread_weight[:, i]
    hf_out = hf_avg
    tap_out = tapset
    den = C * (4 - nbe + end)
    hf2 = jnp.where(hf_sum != 0, hf_sum // den, hf_sum)
    hf_new = (hf_avg + hf2) >> 1
    hfs = hf_new + jnp.where(tapset == 2, 4,
                             jnp.where(tapset == 0, -4, 0))
    tap_new = jnp.where(hfs > 22, 2, jnp.where(hfs > 18, 1, 0))
    hf_out = jnp.where(update_hf, hf_new, hf_out)
    tap_out = jnp.where(update_hf, tap_new, tap_out)
    s = (sum_ << 8) // jnp.maximum(nb_bands, 1)
    s = (s + tonal_avg) >> 1
    tonal_out = s
    s = (3 * s + (((3 - last_decision) << 7) + 64) + 2) >> 2
    # SPREAD_AGGRESSIVE=3, NORMAL=2, LIGHT=1, NONE=0
    decision = jnp.where(s < 80, 3,
                         jnp.where(s < 256, 2,
                                   jnp.where(s < 384, 1, 0)))
    return decision, tonal_out, hf_out, tap_out


# ---------------------------------------------------------------------------
# Band shape transforms, encode direction (bands.c:746-785): the
# recombine haar cascade, the tf_change<0 time-divide haars and the
# deinterleave_hadamard are applied to each band's spectrum at its
# (channel-)subtree entry.  Per stream the combo is selected by
# (transient, recombine, time_divide); the decoder's ``_band_combos``
# supplies the stacked forward matrices for the fast path, while exact
# float64 parity uses the elementwise/permutation cascade (identical
# rounding to the scalar haar1 / pure reorder).

def band_blocks_params(transient, tf_change, lm: int, start: int,
                       end: int):
    """Per-band combo parameters from the per-stream transient flag
    [B] and tf_change [B, nb] (post-tf_encode table values).

    Returns (recombine, time_divide, B2) — [B, nb] int32 each; B2 is
    the block count entering the partition tree (bands.c:763-776)."""
    m = standard_mode()
    M = 1 << lm
    B = transient.shape[0]
    nb = tf_change.shape[1]
    zeros = jnp.zeros((B,), _i32)
    rs, tds, b2s = [], [], []
    for i in range(nb):
        N = (int(m.e_bands[i + 1]) - int(m.e_bands[i])) << lm
        if not (start <= i < end) or N < 2:
            rs.append(zeros)
            tds.append(zeros)
            b2s.append(jnp.ones((B,), _i32))
            continue
        tfc = tf_change[:, i]
        r = jnp.maximum(tfc, 0)          # >0 only on transient streams
        r = jnp.where(transient, r, 0)
        NB = jnp.where(transient, N >> lm, N) << r
        Bv = jnp.where(transient, M >> r, 1)
        td = zeros
        tfc2 = tfc
        for _ in range(3):               # |tf_change| <= 3
            can = ((NB & 1) == 0) & (tfc2 < 0) & (Bv >= 1)
            NB = jnp.where(can, NB >> 1, NB)
            Bv = jnp.where(can, Bv << 1, Bv)
            td = td + can.astype(_i32)
            tfc2 = tfc2 + can.astype(_i32)
        rs.append(r)
        tds.append(td)
        b2s.append(Bv)
    return (jnp.stack(rs, axis=1), jnp.stack(tds, axis=1),
            jnp.stack(b2s, axis=1))


def _haar1_vec(seg, n0: int, stride: int):
    """haar1(X, 0, n0, stride) on [B, >=n0*stride] (bands.c:632-645);
    columns beyond n0*stride untouched.  Same rounding as the scalar
    (multiply by 0.70710678, then add/sub)."""
    half = n0 >> 1
    if half < 1:
        return seg
    Bsz = seg.shape[0]
    head = seg[:, :half * 2 * stride].reshape(Bsz, half, 2, stride)
    t1 = 0.70710678 * head[:, :, 0, :]
    t2 = 0.70710678 * head[:, :, 1, :]
    out = jnp.stack([t1 + t2, t1 - t2], axis=2).reshape(
        Bsz, half * 2 * stride)
    return jnp.concatenate([out, seg[:, half * 2 * stride:]], axis=1)


@lru_cache(maxsize=None)
def _deint_perm(N0: int, stride: int, hadamard: bool):
    """Gather indices g with out[:, k] = in[:, g[k]] for
    _deinterleave_hadamard(X, 0, N0, stride, hadamard)."""
    from .bands import ORDERY_TABLE
    g = np.zeros(N0 * stride, np.int32)
    if hadamard:
        off = {2: 0, 4: 2, 8: 6, 16: 14}[stride]
        ordery = ORDERY_TABLE[off:off + stride]
        for i in range(stride):
            for j in range(N0):
                g[ordery[i] * N0 + j] = j * stride + i
    else:
        for i in range(stride):
            for j in range(N0):
                g[i * N0 + j] = j * stride + i
    return g


@lru_cache(maxsize=None)
def band_combo_specs(N: int, lm: int):
    """Static combo list for a band of width N: tuples
    (key=(transient, r, td), B2, fwd_ops) with fwd_ops the encode-side
    op cascade (haar / deint) of bands.c:756-785."""
    from .batch_decoder import _combo_ops
    from .modes import TF_SELECT_TABLE
    M = 1 << lm
    tf_vals = sorted(set(TF_SELECT_TABLE[lm]))
    out = []
    seen = set()
    for transient in (False, True):
        B0f = M if transient else 1
        if B0f > N:
            continue
        for tf in tf_vals:
            fwd, _inv, B2, r, td = _combo_ops(N, B0f, tf)
            key = (transient, r, td)
            if key in seen:
                continue
            seen.add(key)
            out.append((key, B2, tuple(fwd)))
    return tuple(out)


def apply_band_combo(seg, transient, rec, td, N: int, lm: int,
                     exact: bool):
    """Apply the per-stream band combo transform to seg[:, :N]
    (seg may be wider; tail untouched).  transient [B] bool, rec/td
    [B] i32."""
    specs = band_combo_specs(N, lm)
    head = seg[:, :N]
    out = head
    if exact:
        for (t, r, tdv), _B2, ops in specs:
            if not ops:
                continue
            y = head
            for op in ops:
                if op[0] == "haar":
                    y = _haar1_vec(y, op[1], op[2])
                else:
                    g = _deint_perm(op[1], op[2], op[3])
                    y = y[:, g]
            sel = (transient == t) & (rec == r) & (td == tdv)
            out = jnp.where(sel[:, None], y, out)
    else:
        from .batch_decoder import _apply_ops
        for (t, r, tdv), _B2, ops in specs:
            if not ops:
                continue
            mat = np.zeros((N, N), np.float32)
            for j in range(N):
                e = [0.0] * N
                e[j] = 1.0
                mat[j] = _apply_ops(e, list(ops))
            sel = (transient == t) & (rec == r) & (td == tdv)

            def doit(mat=mat):
                return jnp.matmul(head, jnp.asarray(mat, head.dtype),
                                  preferred_element_type=jnp.float32
                                  ).astype(head.dtype)

            # runtime-gated: non-identity combos only exist on
            # transient streams — skip the matmul when none selected
            y = jax.lax.cond(jnp.any(sel), doit, lambda: head)
            out = jnp.where(sel[:, None], y, out)
    if seg.shape[1] > N:
        out = jnp.concatenate([out, seg[:, N:]], axis=1)
    return out


# ---------------------------------------------------------------------------
# Spreading rotation, encode direction (vq.c:74-117, direction > 0)

SPREAD_NONE = 0


def exp_rotation_enc(X, K, spread, N: int, blocks: int, exact: bool):
    """Forward (encode-side) exp_rotation for a static block count.
    X: [B, N]; K, spread: [B].  Masked identity where it does not
    apply (2K >= N or spread == none)."""
    from .batch_decoder import (_rotation1_bwd, _rotation1_fwd,
                                _stride2_of)
    dt = X.dtype
    Bs = X.shape[0]
    SPREAD_FACTOR = np.array([0, 15, 10, 5], np.int32)
    factor = jnp.asarray(SPREAD_FACTOR)[jnp.clip(spread, 0, 3)]
    Kf = jnp.maximum(K, 1).astype(dt)
    gain = jnp.asarray(float(N), dt) / (N + factor.astype(dt) * Kf)
    theta = 0.5 * gain * gain
    c = jnp.cos(0.5 * jnp.pi * theta).astype(dt)
    s = jnp.cos(0.5 * jnp.pi * (1.0 - theta)).astype(dt)
    st2 = _stride2_of(N, blocks)
    L = N // blocks
    Y = X.reshape(Bs * blocks, L) if blocks > 1 else X
    cb = jnp.repeat(c, blocks) if blocks > 1 else c
    sb = jnp.repeat(s, blocks) if blocks > 1 else s
    # encode: stride-1 sweeps with (c, -s), then stride2 with (s, -c)
    Y = _rotation1_bwd(_rotation1_fwd(Y, cb, -sb, 1, exact), cb, -sb, 1,
                       exact)
    if st2:
        Y = _rotation1_bwd(_rotation1_fwd(Y, sb, -cb, st2, exact), sb,
                           -cb, st2, exact)
    if blocks > 1:
        Y = Y.reshape(Bs, N)
    apply = (2 * K < N) & (spread != SPREAD_NONE)
    return jnp.where(apply[:, None], Y, X)


def exp_rotation_enc_multi(X, K, spread, N: int, node_B, bbset,
                           exact: bool):
    """exp_rotation_enc with per-stream block count node_B selected
    from the static candidate set ``bbset``.

    Each variant runs under a runtime ``lax.cond``: in a typical batch
    most streams are non-transient (node_B == 1) with many leaves not
    rotating at all (2K >= N or spread none), so the multi-variant
    cost is paid only when some stream actually needs that variant."""
    cands = [bb for bb in bbset if N % bb == 0 and bb <= N]
    if not cands:
        cands = [1]
    rot_any = (2 * K < N) & (spread != SPREAD_NONE)
    out = X
    for bb in cands:
        sel = rot_any & (node_B == bb)

        def doit(X=X, bb=bb):
            return exp_rotation_enc(X, K, spread, N, bb, exact)

        rot = jax.lax.cond(jnp.any(sel), doit, lambda: X)
        out = jnp.where(sel[:, None], rot, out)
    return out
