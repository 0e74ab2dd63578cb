"""Batched CELT decoder — the device synthesis pass.

Mirror of ``batch_encoder``: the host lane (``dec_parse``) extracts every
symbol of each stream's frame into fixed-shape record arrays, and this
module synthesizes PCM for the whole batch as one jitted jnp program —
coarse/fine/finalise energy math, the placement-static band tree (CWRS
index -> pulse vector, PVQ gain normalisation, spreading rotation as a
pair of associative scans, noise/fold leaves with closed-form LCG
jump-ahead, theta recombination), band denormalisation, IMDCT and
deemphasis (``celt.batch``).

Behavioural parity: /root/reference/opus/celt/celt_decoder.c:970-1365
(celt_synthesis :382), bands.c:943-1231 (resynth direction), vq.c:47-141
(exp_rotation, normalisation), cwrs.c:605-630 (cwrsi).  The scalar
``celt.decoder.CeltDecoder`` is the tested ground truth.

Scope: mono; transient/short-block frames, per-band tf_res (time_divide
/ longBlocks variants), anti-collapse and the decoder postfilter are all
covered since round 3.  Stereo decode (C == 2 band tree, intensity /
dual-stereo resynthesis) is the remaining gap — stereo packets fall
back to the scalar decoder.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .batch import (deemphasis_batch, denormalise_batch, imdct_batch)
from .batch_encoder import Tables, _bitexact_cos, make_tables
from .dec_parse import (NODE_PVQ, NODE_SPLIT, NODE_ZERO, NodeTable,
                        node_table)
from .modes import EMEANS, PRED_COEF, BETA_COEF, BETA_INTRA, standard_mode

_i32 = jnp.int32
_u32 = jnp.uint32
EPSILON = 1e-15
SPREAD_NONE = 0

# LCG constants (bands.c:61-65)
_LCG_A = 1664525
_LCG_C = 1013904223


@lru_cache(maxsize=None)
def _lcg_jump(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(A[j], C[j]) with seed_j = A[j]*seed0 + C[j] mod 2^32, j=1..n."""
    A = np.zeros(n, np.uint32)
    C = np.zeros(n, np.uint32)
    a, c = 1, 0
    for j in range(n):
        a = (a * _LCG_A) & 0xFFFFFFFF
        c = (c * _LCG_A + _LCG_C) & 0xFFFFFFFF
        A[j] = a
        C[j] = c
    return A, C


def _lcg_seeds(seed0, n: int):
    """[B] uint32 -> [B, n] uint32: the n successive LCG states."""
    A, C = _lcg_jump(n)
    s = seed0.astype(_u32)[:, None]
    return (jnp.asarray(A)[None, :] * s + jnp.asarray(C)[None, :])


@lru_cache(maxsize=None)
def _stride2_of(length: int, stride: int = 1) -> int:
    """vq.c:96-101."""
    stride2 = 0
    if length >= 8 * stride:
        stride2 = 1
        while (stride2 * stride2 + stride2) * stride + (stride >> 2) \
                < length:
            stride2 += 1
    return stride2


@lru_cache(maxsize=None)
def _chains(L: int, st: int):
    """Static chain layout of positions 0..L-1 with inner stride ``st``:
    (idx [n_chains, maxlen] int32 with -1 padding)."""
    chains = [list(range(r, L, st)) for r in range(st)]
    maxlen = max(len(ch) for ch in chains)
    idx = np.full((st, maxlen), -1, np.int32)
    for r, ch in enumerate(chains):
        idx[r, :len(ch)] = ch
    return idx



def _unfused(prod, anchor):
    """Launder a just-rounded product through a data-dependent select
    so the CPU backend cannot contract it with a following add into an
    FMA (single rounding) — that would break exact-mode bit-parity
    with the scalar reference.  ``anchor`` is any tensor the compiler
    cannot prove NaN-free (the select therefore survives)."""
    return jnp.where(anchor == anchor, prod, jnp.zeros_like(prod))

def _rotation1_fwd(X, c, s, st: int, exact: bool = False):
    """First sweep of exp_rotation1 (vq.c:47-56) as an associative scan.

    Sweep: for i in 0..L-st-1:  (x1, x2) = (X[i], X[i+st]);
           X[i+st] = c*x2 + s*x1;  X[i] = c*x1 - s*x2   [x2 pristine]
    Along each stride-st chain a_m: u_0 = a_0, u_{m+1} = c*a_{m+1} + s*u_m
    (u_m = value of position m when read as x1), final:
      X[m] = c*u_m - s*a_{m+1}  (m < M-1);   X[M-1] = u_{M-1}.

    With ``exact`` the u recurrence runs as a sequential lax.scan —
    the reference's float operation order bit-for-bit (the encoder's
    float64 parity mode); the associative scan is the fast path.
    """
    B, L = X.shape
    idx = _chains(L, st)                      # [st, maxlen]
    n_ch, ml = idx.shape
    gat = jnp.asarray(np.where(idx < 0, 0, idx))
    pad = jnp.asarray(idx < 0)
    a = X[:, gat]                             # [B, n_ch, ml]
    # u_m via associative scan: u_m = c*a_m + s*u_{m-1}; u_0 = a_0
    cm = jnp.where(pad[None], 1.0, jnp.broadcast_to(s[:, None, None],
                                                    a.shape))
    cm = cm.at[:, :, 0].set(1.0)
    add = jnp.where(pad[None], 0.0, c[:, None, None] * a)
    add = add.at[:, :, 0].set(jnp.where(pad[None, :, 0], 0.0, a[:, :, 0]))

    def comb(p, q):
        return (p[0] * q[0], q[0] * p[1] + q[1])

    if exact:
        def seqstep(u_prev, xs_m):
            cm_m, add_m = xs_m               # [B, n_ch] each
            # _unfused: no FMA contraction in exact mode
            p = _unfused(cm_m * u_prev, add_m)
            u_m = p + add_m
            return u_m, u_m

        _, useq = jax.lax.scan(
            seqstep, jnp.zeros((B, n_ch), X.dtype),
            (jnp.moveaxis(cm, 2, 0), jnp.moveaxis(add, 2, 0)))
        u = jnp.moveaxis(useq, 0, 2)
    else:
        _, u = jax.lax.associative_scan(comb, (cm, add), axis=2)
    lens = (idx >= 0).sum(axis=1)             # [n_ch] static chain lengths
    a_next = jnp.concatenate([a[:, :, 1:], jnp.zeros_like(a[:, :, :1])],
                             axis=2)
    if exact:
        out = _unfused(c[:, None, None] * u, a_next) \
            - _unfused(s[:, None, None] * a_next, u)
    else:
        out = c[:, None, None] * u - s[:, None, None] * a_next
    is_last = jnp.asarray(
        np.arange(ml)[None, :] == (lens - 1)[:, None])   # [n_ch, ml]
    out = jnp.where(is_last[None], u, out)
    # scatter back
    flat_idx = np.where(idx < 0, L, idx).ravel()
    res = jnp.zeros((B, L + 1), X.dtype).at[:, flat_idx].set(
        out.reshape(B, -1), mode="drop")
    return res[:, :L]


def _rotation1_bwd(X, c, s, st: int, exact: bool = False):
    """Second sweep (vq.c:57-66): for i in L-2st-1..0 descending:
    X[i+st] = c*x2 + s*x1; X[i] = c*x1 - s*x2, where x2 = X[i+st] has
    already been rewritten by step i+st (as its x1-slot).

    Along a chain (descending): t_p = c*a_p - s*t_{p+st} for steps p in
    range; final X[p] = c*t_p + s*a_{p-st} when step p-st ran, else t_p
    when step p ran, else untouched.
    """
    B, L = X.shape
    idx = _chains(L, st)
    n_ch, ml = idx.shape
    gat = jnp.asarray(np.where(idx < 0, 0, idx))
    a = X[:, gat]                             # [B, n_ch, ml]
    lens = (idx >= 0).sum(axis=1)             # [n_ch]
    # steps run at positions p = chain index m with original position
    # p_orig <= L-2st-1 → m <= m_last(chain). Compute per-chain m_last.
    pos = np.where(idx < 0, 1 << 30, idx)
    stepped = pos <= (L - 2 * st - 1)         # [n_ch, ml] static bool
    # t_m = c*a_m - s*t_{m+1} on stepped region, t beyond = a (pristine
    # read of x2 at the chain edge). Reverse-scan: with r_m over reversed
    # order: t_m = c*a_m - s*t_{m+1}.
    arev = a[:, :, ::-1]
    steprev = stepped[:, ::-1]
    cm = jnp.where(jnp.asarray(steprev)[None], -s[:, None, None], 0.0)
    add = jnp.where(jnp.asarray(steprev)[None], c[:, None, None] * arev,
                    arev)

    def comb(p, q):
        return (p[0] * q[0], q[0] * p[1] + q[1])

    if exact:
        def seqstep(t_prev, xs_m):
            cm_m, add_m = xs_m
            # _unfused: no FMA contraction (see fwd)
            p = _unfused(cm_m * t_prev, add_m)
            t_m = p + add_m
            return t_m, t_m

        _, tseq = jax.lax.scan(
            seqstep, jnp.zeros((X.shape[0], n_ch), X.dtype),
            (jnp.moveaxis(cm, 2, 0), jnp.moveaxis(add, 2, 0)))
        trev = jnp.moveaxis(tseq, 0, 2)
    else:
        _, trev = jax.lax.associative_scan(comb, (cm, add), axis=2)
    t = trev[:, :, ::-1]
    # final values
    a_prev = jnp.concatenate([jnp.zeros_like(a[:, :, :1]), a[:, :, :-1]],
                             axis=2)
    t_shift = t                                # t at this position
    prev_stepped = np.concatenate(
        [np.zeros((n_ch, 1), bool), stepped[:, :-1]], axis=1)
    if exact:
        comb = _unfused(c[:, None, None] * t_shift, a_prev) \
            + _unfused(s[:, None, None] * a_prev, t_shift)
    else:
        comb = c[:, None, None] * t_shift + s[:, None, None] * a_prev
    out = jnp.where(jnp.asarray(prev_stepped)[None], comb,
                    jnp.where(jnp.asarray(stepped)[None], t, a))
    flat_idx = np.where(idx < 0, L, idx).ravel()
    res = jnp.zeros((B, L + 1), X.dtype).at[:, flat_idx].set(
        out.reshape(B, -1), mode="drop")
    return res[:, :L]


def exp_rotation_dec(X, K, spread, N: int, blocks: int = 1):
    """Inverse (decode-side) exp_rotation (vq.c:74-117, direction < 0)
    for a static block count.  X: [B, N]; K, spread: [B].  The gain and
    the 2K >= N gate use the FULL length; the rotation sweeps run per
    contiguous length-N/blocks block (vq.c:103-116 after the udiv).
    Masked identity where the rotation does not apply."""
    dt = X.dtype
    Bs = X.shape[0]
    SPREAD_FACTOR = np.array([0, 15, 10, 5], np.int32)   # [none, l, n, a]
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
    if st2:
        Y = _rotation1_bwd(_rotation1_fwd(Y, sb, cb, st2), sb, cb, st2)
    Y = _rotation1_bwd(_rotation1_fwd(Y, cb, sb, 1), cb, sb, 1)
    if blocks > 1:
        Y = Y.reshape(Bs, N)
    apply = (2 * K < N) & (spread != SPREAD_NONE)
    return jnp.where(apply[:, None], Y, X)


def exp_rotation_dec_multi(X, K, spread, N: int, node_B):
    """exp_rotation_dec with a per-row runtime block count.

    node_B: [B] in {1, 2, 4, 8, ...} (the node's block count after the
    partition's (B+1)>>1 halvings).  Computes each static variant that
    divides N and selects per row."""
    cands = [bb for bb in (1, 2, 4, 8) if N % bb == 0 and bb <= N]
    out = exp_rotation_dec(X, K, spread, N, 1)
    for bb in cands[1:]:
        out = jnp.where((node_B == bb)[:, None],
                        exp_rotation_dec(X, K, spread, N, bb), out)
    return out


def cwrsi_batch(index, K, N: int, u_tab: np.ndarray):
    """Codeword index -> pulse vector, batched (cwrs.c:605-630).

    index: [B] uint32; K: [B] (>= 1 where used).  Returns iy [B, N]
    int32.  u_tab rows are exact for every reachable (n, k)."""
    B = index.shape[0]
    u = jnp.asarray(u_tab)                     # uint32, exact rows
    i = index.astype(_u32)
    k = jnp.maximum(K, 0).astype(_i32)
    ys = []
    for pos in range(N):
        ncur = N - pos
        row = u[ncur]                          # [kmax+3] uint32
        p = row[jnp.minimum(k + 1, row.shape[0] - 1)]
        sgn = i >= p
        i = i - jnp.where(sgn, p, np.uint32(0))
        k0 = k
        # largest k' <= k with U(ncur, k') <= i  (row is nondecreasing)
        knew = jnp.searchsorted(row, i, side="right").astype(_i32) - 1
        k = jnp.minimum(k0, knew)
        k = jnp.maximum(k, 0)
        i = i - row[k]
        val = (k0 - k).astype(_i32)
        ys.append(jnp.where(sgn, -val, val))
    return jnp.stack(ys, axis=1)


# ---------------------------------------------------------------------------
# Per-band shape-transform combos (bands.c:746-811): the recombine /
# time-divide haar cascades and the hadamard (de)interleave are LINEAR
# maps on the band segment, so each feasible (transient, recombine,
# time_divide) combo becomes a pair of static [N, N] matrices — the
# decode-entry transform of the folding lowband and the resynth-side
# inverse applied to the decoded shape.  Per stream the right combo is
# a one-hot select; combo (False, 0, 0) is the identity fast path.

def _apply_ops(vec, ops):
    from .bands import (_deinterleave_hadamard, _interleave_hadamard,
                        haar1)
    X = list(vec)
    for op in ops:
        if op[0] == "haar":
            haar1(X, 0, op[1], op[2])
        elif op[0] == "deint":
            _deinterleave_hadamard(X, 0, op[1], op[2], op[3])
        else:
            _interleave_hadamard(X, 0, op[1], op[2], op[3])
    return X


def _combo_ops(N: int, B0f: int, tf_change: int):
    """(fwd_ops, inv_ops, B2) for one band entry (mirrors
    bands._quant_band:746-804 with encode=False, resynth=True)."""
    long_blocks = B0f == 1
    N_B = N // B0f
    B = B0f
    recombine = tf_change if tf_change > 0 else 0
    fwd = []
    for k in range(recombine):
        fwd.append(("haar", N >> k, 1 << k))
    B >>= recombine
    N_B <<= recombine
    tfc = tf_change
    time_divide = 0
    while (N_B & 1) == 0 and tfc < 0:
        fwd.append(("haar", N_B, B))
        B <<= 1
        N_B >>= 1
        time_divide += 1
        tfc += 1
    B0q = B
    N_B0 = N_B
    if B0q > 1:
        fwd.append(("deint", N_B >> recombine, B0q << recombine,
                    long_blocks))
    inv = []
    if B0q > 1:
        inv.append(("int", N_B0 >> recombine, B0q << recombine,
                    long_blocks))
    Bq, N_Bq = B0q, N_B0
    for _ in range(time_divide):
        Bq >>= 1
        N_Bq <<= 1
        inv.append(("haar", N_Bq, Bq))
    for k in range(recombine):
        inv.append(("haar", N >> k, 1 << k))
    return fwd, inv, B0q, recombine, time_divide


@lru_cache(maxsize=None)
def _band_combos(lm: int):
    """Per band width class: list of
    (transient, recombine, time_divide, B2) combos with stacked
    Mfwd/Minv [n_combos, N, N] float32 (identity combos flagged)."""
    from .modes import TF_SELECT_TABLE, standard_mode
    m = standard_mode()
    M = 1 << lm
    tf_vals = sorted(set(TF_SELECT_TABLE[lm]))
    out = {}
    for i in range(m.nb_ebands):
        N = (int(m.e_bands[i + 1] - m.e_bands[i])) << lm
        if N < 2 or N in out:
            continue
        combos = []
        seen = set()
        for transient in (False, True):
            B0f = M if transient else 1
            if B0f > N:
                continue
            for tf in tf_vals:
                fwd, inv, B2, r, td = _combo_ops(N, B0f, tf)
                key = (transient, r, td)
                if key in seen:
                    continue
                seen.add(key)
                combos.append((key, fwd, inv, B2))
        nC = len(combos)
        Mf = np.zeros((nC, N, N), np.float32)
        Mi = np.zeros((nC, N, N), np.float32)
        keys = []
        idents = []
        for ci, (key, fwd, inv, B2) in enumerate(combos):
            for j in range(N):
                e = [0.0] * N
                e[j] = 1.0
                Mf[ci, j] = _apply_ops(e, fwd)
                Mi[ci, j] = _apply_ops(e, inv)
            keys.append(key + (B2,))
            idents.append(not fwd and not inv)
        out[N] = (keys, idents, Mf, Mi)
    return out


def _band_transform(seg, transient, recombine, time_divide, combos,
                    forward: bool):
    """Apply the per-stream combo transform to a band segment
    [B, N] (one matmul per non-identity combo + one-hot select)."""
    keys, idents, Mf, Mi = combos
    out = seg
    any_match = jnp.zeros(seg.shape[:1], bool)
    for ci, (t, r, td, _B2) in enumerate(keys):
        sel = ((transient == t) & (recombine == r)
               & (time_divide == td))
        any_match = any_match | sel
        if idents[ci]:
            continue
        mat = jnp.asarray((Mf if forward else Mi)[ci])
        y = jnp.matmul(seg, mat,
                       preferred_element_type=jnp.float32)
        out = jnp.where(sel[:, None], y.astype(seg.dtype), out)
    return out


# ---------------------------------------------------------------------------
# The placement-static band tree (bands.c:943-1105, resynth direction)
#
# TPU-first structure: the tree recursion is flattened.  Node *gains*
# (accumulated theta factors) are a cheap level-by-level product over
# the static tree; the expensive PVQ leaf decode (CWRS + normalise +
# spreading rotation) runs once per DISTINCT node width over all nodes
# of that width at once ([B * n_nodes_W, W] batches) — PVQ leaves
# depend only on parsed symbols, never on other bands' spectra, so they
# all run in parallel and scatter to their static placements.  Only the
# noise/fold leaves (which read the `norm` folding history) stay in the
# sequential per-band loop, as vectorized elementwise work.

@lru_cache(maxsize=None)
def _tree_meta(lm: int):
    """parent / is-side-child / depth-level grouping / width grouping
    for the static node table."""
    tab = node_table(lm)
    n = tab.n_nodes
    parent = np.full(n, -1, np.int32)
    is_side = np.zeros(n, np.int32)
    for p in range(n):
        c0, c1 = tab.node_child[p]
        if c0 >= 0:
            parent[c0] = p
            parent[c1] = p
            is_side[c1] = 1
    levels = []
    maxd = int(tab.node_depth.max())
    for d in range(1, maxd + 1):
        ids = np.nonzero(tab.node_depth == d)[0].astype(np.int32)
        if len(ids):
            levels.append(ids)
    width_groups = {}
    for j in range(n):
        width_groups.setdefault(int(tab.node_n[j]), []).append(j)
    width_groups = {w: np.asarray(ids, np.int32)
                    for w, ids in width_groups.items() if w >= 2}
    return tab, parent, is_side, levels, width_groups


def _node_gains(syms, lm: int, dt):
    """[B, n_nodes] accumulated theta gain per node (bands.c mid/side
    recombination factors, applied top-down)."""
    tab, parent, is_side, levels, _ = _tree_meta(lm)
    itheta = syms["node_itheta"]
    imid = jnp.where(itheta == 0, 32767,
                     jnp.where(itheta == 16384, 0,
                               _bitexact_cos(itheta)))
    iside = jnp.where(itheta == 0, 0,
                      jnp.where(itheta == 16384, 32767,
                                _bitexact_cos(16384 - itheta)))
    mid = (1.0 / 32768) * imid.astype(dt)
    side = (1.0 / 32768) * iside.astype(dt)
    B = itheta.shape[0]
    gains = jnp.ones((B, tab.n_nodes), dt)
    for ids in levels:
        par = parent[ids]
        fac = jnp.where(jnp.asarray(is_side[ids] == 1)[None, :],
                        side[:, par], mid[:, par])
        gains = gains.at[:, ids].set(gains[:, par] * fac)
    return gains


def synth_all_bands(syms, lm: int, start: int = 0, end: int = 21,
                    dtype=jnp.float32):
    """Reconstruct the unit-norm spectrum X [B, N] from parsed symbols
    (quant_all_bands decode path, mono long blocks)."""
    m = standard_mode()
    tab, parent, is_side, levels, width_groups = _tree_meta(lm)
    t = make_tables(lm, 1)
    M = 1 << lm
    e_bands = t.e_bands
    B = syms["node_kind"].shape[0]
    N_total = m.short_mdct_size << lm     # bins beyond band `end` stay 0
    norm_len = M * int(e_bands[end - 1])
    dt = dtype
    kind = syms["node_kind"]
    gains = _node_gains(syms, lm, dt)
    node_base = tab.node_off + np.asarray(
        [M * int(e_bands[tab.node_band[j]]) for j in range(tab.n_nodes)],
        np.int32)
    # per-node block count: the partition halves B as (B+1)>>1 per
    # split, i.e. max(1, band_B >> depth) for power-of-two band_B
    node_B_all = jnp.maximum(
        1, syms["band_B"][:, np.asarray(tab.node_band)]
        >> jnp.asarray(tab.node_depth, jnp.int32)[None, :])
    combos_all = _band_combos(lm)
    transient = syms["transient"]

    # ---- all PVQ leaves, one batch per distinct width
    X = jnp.zeros((B, N_total), dt)
    for W, ids in sorted(width_groups.items()):
        nW = len(ids)
        K = syms["node_k"][:, ids].reshape(B * nW)
        idx = syms["node_index"][:, ids].reshape(B * nW)
        iy = cwrsi_batch(idx, K, W, t.u_tab)        # [B*nW, W]
        yy = jnp.sum((iy * iy).astype(dt), axis=1)
        g = gains[:, ids].reshape(B * nW) \
            / jnp.sqrt(jnp.maximum(yy, 1e-30))
        Xp = iy.astype(dt) * g[:, None]
        spread = jnp.broadcast_to(syms["spread"][:, None],
                                  (B, nW)).reshape(B * nW)
        nodeB = node_B_all[:, ids].reshape(B * nW)
        Xp = exp_rotation_dec_multi(Xp, K, spread, W, nodeB)
        sel = (kind[:, ids] == NODE_PVQ)
        vals = jnp.where(sel.reshape(B * nW)[:, None], Xp, 0.0)
        cols = (node_base[ids][:, None]
                + np.arange(W)[None, :]).ravel()     # static, disjoint
        X = X.at[:, cols].add(vals.reshape(B, nW, W).reshape(B, -1))

    # ---- per band: noise/fold leaves (need `norm`), N==1, norm update
    norm = jnp.zeros((B, norm_len), dt)
    for i in range(start, end):
        xlo = M * int(e_bands[i])
        N = M * int(e_bands[i + 1]) - xlo
        last = i == end - 1
        if N == 1:
            sgn = syms["sign_n1"][:, i]
            x = jnp.where(sgn == 1, jnp.asarray(-1.0, dt),
                          jnp.asarray(1.0, dt))
            X = X.at[:, xlo].set(x)
            if not last:
                norm = norm.at[:, xlo].set(x)
            continue
        eff = syms["band_eff_lowband"][:, i]
        has_lb = eff >= 0
        effc = jnp.clip(eff, 0)
        rec_i = syms["band_recombine"][:, i]
        td_i = syms["band_time_divide"][:, i]
        combos = combos_all[N]
        # the full folding segment, decode-entry transforms applied
        # once per band (bands.c:756-785: the lowband copy sees the
        # same haar/deinterleave cascade as the shape would)
        cols = effc[:, None] + np.arange(N)[None, :]
        lb_seg = jnp.take_along_axis(norm, cols, axis=1)
        lb_seg = _band_transform(lb_seg, transient, rec_i, td_i,
                                 combos, forward=True)
        # zero/fold leaves of this band, grouped by width
        band_ids = np.asarray(
            [j for j in range(int(tab.band_first[i]),
                              int(tab.band_first[i])
                              + int(tab.band_count[i]))], np.int32)
        by_w = {}
        for j in band_ids:
            w = int(tab.node_n[j])
            if w >= 2:
                by_w.setdefault(w, []).append(int(j))
        for W, idsl in sorted(by_w.items()):
            ids = np.asarray(idsl, np.int32)
            nW = len(ids)
            fill = syms["node_fill"][:, ids]         # [B, nW]
            seeds = _lcg_seeds(
                syms["node_seed"][:, ids].reshape(B * nW), W
            ).reshape(B, nW, W)
            noise = (seeds.astype(_i32) >> 20).astype(dt)
            sign = jnp.where((seeds & np.uint32(0x8000)) != 0,
                             jnp.asarray(1.0 / 256, dt),
                             jnp.asarray(-1.0 / 256, dt))
            offs = np.asarray(tab.node_off[ids], np.int32)
            lcols = (offs[:, None] + np.arange(W)[None, :]).ravel()
            lb = lb_seg[:, lcols].reshape(B, nW, W)   # static slices
            fold = lb + sign
            base = jnp.where(has_lb[:, None, None], fold, noise)
            e = EPSILON + jnp.sum(base * base, axis=2)
            gz = gains[:, ids] / jnp.sqrt(e)
            Xz = jnp.where(fill[:, :, None] != 0,
                           base * gz[:, :, None], 0.0)
            sel = (kind[:, ids] == NODE_ZERO)
            vals = jnp.where(sel[:, :, None], Xz, 0.0)
            ccols = (node_base[ids][:, None]
                     + np.arange(W)[None, :]).ravel()
            X = X.at[:, ccols].add(vals.reshape(B, -1))
        # resynth-side inverse transforms on the finished band shape
        # (bands.c:790-804)
        seg = _band_transform(X[:, xlo:xlo + N], transient, rec_i,
                              td_i, combos, forward=False)
        X = X.at[:, xlo:xlo + N].set(seg)
        if not last:
            sq = jnp.asarray(float(np.sqrt(N)), dt)
            norm = norm.at[:, xlo:xlo + N].set(sq * X[:, xlo:xlo + N])
    return X


def anti_collapse_batch(X, collapse_masks, pulses_q3, lm: int, logE,
                        prev1, prev2, seed0, active):
    """bands.c:268-337 (float, mono), batched.

    Collapsed short-block lanes of transient frames get +-r noise at an
    energy derived from the two previous frames, then the band is
    renormalised.  ``active``: [B] anti_collapse_on; the LCG chain
    advances N0 draws per collapsed block exactly like the scalar
    (seed0 = the post-band-walk rng, celt_decoder.c:1291)."""
    m = standard_mode()
    dt = X.dtype
    B = X.shape[0]
    seed = seed0.astype(_u32)
    nblk = 1 << lm
    for i in range(m.nb_ebands):
        N0 = int(m.e_bands[i + 1] - m.e_bands[i])
        depth = ((1 + pulses_q3[:, i]) // N0) >> lm
        thresh = 0.5 * jnp.exp2(-0.125 * depth.astype(dt))
        sqrt_1 = float(1.0 / np.sqrt(N0 << lm))
        p1 = jnp.maximum(prev1[:, i], jnp.asarray(-28.0, dt))
        p2 = jnp.maximum(prev2[:, i], jnp.asarray(-28.0, dt))
        Ediff = jnp.maximum(jnp.asarray(0.0, dt),
                            logE[:, i] - jnp.minimum(p1, p2))
        r = 2.0 * jnp.exp2(-Ediff)
        if lm == 3:
            r = r * 1.41421356
        r = jnp.minimum(thresh, r) * sqrt_1
        base = int(m.e_bands[i]) << lm
        renorm = jnp.zeros((B,), bool)
        A_j, C_j = _lcg_jump(N0)
        jump_a = np.uint32(A_j[-1])
        jump_c = np.uint32(C_j[-1])
        for k in range(nblk):
            collapsed = active & (jnp.bitwise_and(
                collapse_masks[:, i] >> k, 1) == 0)
            draws = _lcg_seeds(seed, N0)             # [B, N0]
            vals = jnp.where((draws & np.uint32(0x8000)) != 0,
                             r[:, None], -r[:, None]).astype(dt)
            idxs = base + (np.arange(N0) << lm) + k  # static cols
            X = X.at[:, idxs].set(
                jnp.where(collapsed[:, None], vals, X[:, idxs]))
            seed = jnp.where(collapsed, jump_a * seed + jump_c, seed)
            renorm = renorm | collapsed
        segcols = base + np.arange(N0 << lm)
        seg = X[:, segcols]
        g = 1.0 / jnp.sqrt(EPSILON
                           + jnp.sum(seg * seg, axis=1))
        X = X.at[:, segcols].set(
            jnp.where(renorm[:, None], seg * g[:, None].astype(dt),
                      seg))
    return X


# ---------------------------------------------------------------------------
# Energy symbol math (quant_bands.c:428-542, device side)

def unquant_coarse_batch(qi, oldBandE, intra, lm: int, start: int,
                         end: int):
    dt = oldBandE.dtype
    coef = jnp.where(intra, jnp.asarray(0.0, dt),
                     jnp.asarray(PRED_COEF[lm], dt))
    beta = jnp.where(intra, jnp.asarray(BETA_INTRA, dt),
                     jnp.asarray(BETA_COEF[lm], dt))
    prev = jnp.zeros(oldBandE.shape[:1], dt)
    old = oldBandE
    for i in range(start, end):
        q = qi[:, i].astype(dt)
        oldE = jnp.maximum(jnp.asarray(-9.0, dt), old[:, i])
        tmp = coef * oldE + prev + q
        old = old.at[:, i].set(tmp)
        prev = prev + q - beta * q
    return old


def unquant_fine_batch(oldBandE, fine_q, fine_bits, start: int, end: int):
    dt = oldBandE.dtype
    for i in range(start, end):
        has = (fine_bits[:, i] > 0) & (fine_q[:, i] >= 0)
        offset = ((fine_q[:, i].astype(dt) + 0.5)
                  * (1 << (14 - fine_bits[:, i])).astype(dt)
                  / 16384.0 - 0.5)
        oldBandE = oldBandE.at[:, i].add(jnp.where(has, offset, 0.0))
    return oldBandE


def unquant_finalise_batch(oldBandE, finalise, fine_bits, start: int,
                           end: int):
    dt = oldBandE.dtype
    for prio in range(2):
        for i in range(start, end):
            q2 = finalise[:, prio, i]
            has = q2 >= 0
            offset = ((q2.astype(dt) - 0.5)
                      * (1 << (14 - fine_bits[:, i] - 1)).astype(dt)
                      / 16384.0)
            oldBandE = oldBandE.at[:, i].add(jnp.where(has, offset, 0.0))
    return oldBandE


# ---------------------------------------------------------------------------
# Comb postfilter (celt.c:198-260 + celt_decoder.c:1302-1325)
#
# The decoder postfilter is an in-place IIR on the synthesis buffer
# with lag T >= COMBFILTER_MINPERIOD == 15, so 13-sample blocks only
# ever read committed samples — the batch processes the frame as a
# static sequence of blocks, each one gathering its two per-stream tap
# windows and blending them with the crossfade window.

COMBFILTER_MINPERIOD = 15
COMBFILTER_MAXPERIOD = 1024
_PF_HIST = COMBFILTER_MAXPERIOD + 2
_PF_BLK = COMBFILTER_MINPERIOD - 2


def _comb_segment(buf, seg_start: int, Nseg: int, T0, T1, g0, g1,
                  tap0, tap1, fade):
    """Filter buf[:, seg_start:seg_start+Nseg] in place (functional).

    T0/T1/g0/g1/tap0/tap1: [B]; fade: [Nseg] static crossfade factor
    (window^2 for the first `overlap` samples, 1 beyond — with f==1
    the T0 terms vanish, so one blended formula covers both the
    crossfade and the constant tail)."""
    from .decoder import _COMB_GAINS
    dt = buf.dtype
    gtab = np.asarray(_COMB_GAINS, np.float64)     # [3, 3]
    gt = jnp.asarray(gtab, dt)
    t0 = jnp.clip(tap0, 0, 2)
    t1 = jnp.clip(tap1, 0, 2)
    g00 = g0 * gt[t0, 0]
    g01 = g0 * gt[t0, 1]
    g02 = g0 * gt[t0, 2]
    g10 = g1 * gt[t1, 0]
    g11 = g1 * gt[t1, 1]
    g12 = g1 * gt[t1, 2]
    T0c = jnp.maximum(T0, COMBFILTER_MINPERIOD)
    T1c = jnp.maximum(T1, COMBFILTER_MINPERIOD)
    pos = 0
    while pos < Nseg:
        blk = min(_PF_BLK, Nseg - pos)
        a = seg_start + pos
        x_blk = jax.lax.dynamic_slice_in_dim(buf, a, blk, axis=1)
        # tap windows: columns [a - T - 2, a - T + blk + 1]
        w0s = (a - 2) - T0c
        w1s = (a - 2) - T1c
        cols = jnp.arange(blk + 4)[None, :]
        w0 = jnp.take_along_axis(buf, w0s[:, None] + cols, axis=1)
        w1 = jnp.take_along_axis(buf, w1s[:, None] + cols, axis=1)
        f = jnp.asarray(fade[pos:pos + blk], dt)[None, :]
        y = (x_blk
             + (1 - f) * (g00[:, None] * w0[:, 2:2 + blk]
                          + g01[:, None] * (w0[:, 3:3 + blk]
                                            + w0[:, 1:1 + blk])
                          + g02[:, None] * (w0[:, 4:4 + blk]
                                            + w0[:, 0:blk]))
             + f * (g10[:, None] * w1[:, 2:2 + blk]
                    + g11[:, None] * (w1[:, 3:3 + blk]
                                      + w1[:, 1:1 + blk])
                    + g12[:, None] * (w1[:, 4:4 + blk]
                                      + w1[:, 0:blk])))
        buf = jax.lax.dynamic_update_slice(buf, y.astype(dt),
                                           (jnp.int32(0), jnp.int32(a)))
        pos += blk
    return buf


def postfilter_batch(frame, st, pf_pitch, pf_gain, pf_tapset, lm: int):
    """celt_decoder.c:1302-1325 for a [B, N] frame; returns
    (filtered frame, new pf state tuple)."""
    m = standard_mode()
    dt = frame.dtype
    B, N = frame.shape
    nshort = m.short_mdct_size
    ov = m.overlap
    win2 = np.asarray(m.window, np.float64) ** 2

    buf = jnp.concatenate([st.pf_hist.astype(dt), frame], axis=1)
    base = _PF_HIST

    def fade_vec(nseg):
        f = np.ones(nseg)
        f[:min(ov, nseg)] = win2[:min(ov, nseg)]
        return f

    buf = _comb_segment(buf, base, nshort, st.pf_period_old,
                        st.pf_period, st.pf_gain_old, st.pf_gain,
                        st.pf_tapset_old, st.pf_tapset,
                        fade_vec(nshort))
    if lm != 0:
        buf = _comb_segment(buf, base + nshort, N - nshort,
                            st.pf_period, pf_pitch, st.pf_gain,
                            pf_gain, st.pf_tapset, pf_tapset,
                            fade_vec(N - nshort))

    out = buf[:, base:]
    hist = buf[:, base + N - _PF_HIST:base + N] if N >= _PF_HIST \
        else jnp.concatenate([buf[:, N:_PF_HIST], out], axis=1)
    if lm != 0:
        new = (pf_pitch, pf_gain, pf_tapset,
               pf_pitch, pf_gain, pf_tapset)
    else:
        new = (pf_pitch, pf_gain, pf_tapset,
               st.pf_period, st.pf_gain, st.pf_tapset)
    return out, hist, new


# ---------------------------------------------------------------------------
# Frame-level batched decode

class CeltDecState(NamedTuple):
    """Carried per-stream decoder state (pytree of [B, ...] arrays)."""
    oldBandE: jnp.ndarray       # [B, nb]
    oldLogE: jnp.ndarray
    oldLogE2: jnp.ndarray
    backgroundLogE: jnp.ndarray
    preemph_memD: jnp.ndarray   # [B]
    syn_tail: jnp.ndarray       # [B, overlap//2]
    pf_period: jnp.ndarray      # [B] postfilter state
    pf_gain: jnp.ndarray
    pf_tapset: jnp.ndarray
    pf_period_old: jnp.ndarray
    pf_gain_old: jnp.ndarray
    pf_tapset_old: jnp.ndarray
    pf_hist: jnp.ndarray        # [B, COMBFILTER_MAXPERIOD + 2]


def init_dec_state(B: int, nb: int = 21, dtype=jnp.float32
                   ) -> CeltDecState:
    z = jnp.zeros((B, nb), dtype)
    zi = jnp.zeros((B,), jnp.int32)
    return CeltDecState(
        oldBandE=z, oldLogE=z - 28.0, oldLogE2=z - 28.0,
        backgroundLogE=z - 28.0,
        preemph_memD=jnp.zeros((B,), dtype),
        syn_tail=jnp.zeros((B, standard_mode().overlap // 2), dtype),
        pf_period=zi, pf_gain=jnp.zeros((B,), dtype), pf_tapset=zi,
        pf_period_old=zi, pf_gain_old=jnp.zeros((B,), dtype),
        pf_tapset_old=zi,
        pf_hist=jnp.zeros((B, _PF_HIST), dtype))


def celt_decode_batch(syms, st: CeltDecState, lm: int,
                      start: int = 0, end: int = 21):
    """One frame for a batch of mono 48 kHz streams.

    ``syms``: dict of [B, ...] arrays from dec_parse.stack_syms (device
    arrays or numpy).  Returns (pcm [B, N], new_state)."""
    dt = st.oldBandE.dtype
    m = standard_mode()
    M = 1 << lm
    B = st.oldBandE.shape[0]

    oldBandE = unquant_coarse_batch(syms["qi"], st.oldBandE,
                                    syms["intra"], lm, start, end)
    oldBandE = unquant_fine_batch(oldBandE, syms["fine_q"],
                                  syms["fine_bits"], start, end)

    X = synth_all_bands(syms, lm, start, end, dtype=dt)

    oldBandE = unquant_finalise_batch(oldBandE, syms["finalise"],
                                      syms["fine_bits"], start, end)

    transient = syms["transient"]
    if lm >= 2:
        # anti-collapse noise injection for transient frames
        # (celt_decoder.c:1285-1291)
        X = anti_collapse_batch(
            X, syms["collapse_masks"], syms["pulses"], lm, oldBandE,
            st.oldLogE, st.oldLogE2, syms["seed_after_bands"],
            syms["anti_collapse_on"] & transient)

    silence = syms["silence"]
    oldBandE = jnp.where(silence[:, None], jnp.asarray(-28.0, dt),
                         oldBandE)

    freq = denormalise_batch(X, oldBandE, lm)
    freq = jnp.where(silence[:, None], 0.0, freq)
    frame, tail = imdct_batch(freq, st.syn_tail, 1)
    if lm > 0:
        # short-block IMDCT for transient streams, selected per row
        frame_s, tail_s = imdct_batch(freq, st.syn_tail, M)
        frame = jnp.where(transient[:, None], frame_s, frame)
        tail = jnp.where(transient[:, None], tail_s, tail)

    # comb postfilter (celt_decoder.c:1302-1325): per-stream pitch /
    # gain / tapset from the parse, crossfaded against last frame's
    pf_gain = jnp.where(syms["pf_qg"] >= 0,
                        0.09375 * (syms["pf_qg"].astype(dt) + 1.0),
                        jnp.asarray(0.0, dt))
    frame, pf_hist, pf_new = postfilter_batch(
        frame, st, syms["pf_pitch"], pf_gain, syms["pf_tapset"], lm)

    pcm, memD = deemphasis_batch(frame, st.preemph_memD)
    oldLogE2 = jnp.where(transient[:, None], st.oldLogE2, st.oldLogE)
    oldLogE = jnp.where(transient[:, None],
                        jnp.minimum(st.oldLogE, oldBandE), oldBandE)
    max_bg_inc = jnp.asarray(min(160, M) * 0.001, dt)
    backgroundLogE = jnp.minimum(st.backgroundLogE + max_bg_inc, oldBandE)

    new_st = CeltDecState(
        oldBandE=oldBandE, oldLogE=oldLogE, oldLogE2=oldLogE2,
        backgroundLogE=backgroundLogE, preemph_memD=memD,
        syn_tail=tail,
        pf_period=pf_new[0], pf_gain=pf_new[1], pf_tapset=pf_new[2],
        pf_period_old=pf_new[3], pf_gain_old=pf_new[4],
        pf_tapset_old=pf_new[5], pf_hist=pf_hist)
    return pcm, new_st


celt_decode_batch_jit = jax.jit(
    celt_decode_batch, static_argnames=("lm", "start", "end"))
