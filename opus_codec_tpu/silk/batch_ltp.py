"""Batched LTP gain quantization (silk_quant_LTP_gains), bit-exact.

quant_LTP_gains.c:33-132 + VQ_WMat_EC.c:40-140 for a ``[B]`` stream
batch: the three periodicity codebooks evaluate as dense
[B, L, LTP_ORDER] weighted-error passes; only the per-subframe
``sum_log_gain`` chain (which caps the admissible gain) is sequential,
and it is a 2-4 step static loop of [B] scalar fixed-point ops.

The scalar ``encoder_analysis.quant_ltp_gains`` is the tested ground
truth; tie-breaking is preserved exactly (the C scans use ``<=`` so
the LAST minimum wins — emulated by argmin over the reversed axis).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fixed32 import (INT32_MAX, add_pos_sat32, lin2log, log2lin,
                           smlawb, smulbb, wrap32)

_i32 = jnp.int32
LTP_ORDER = 5

__all__ = ["quant_ltp_gains_batch", "quant_ltp_gains_batch_jit"]


def _fix(c: float, q: int) -> np.int32:
    return np.int32(int(c * (1 << q) + 0.5))


@lru_cache(maxsize=None)
def _tabs():
    from . import tables as T
    vq = (np.asarray(T.LTP_gain_vq_0, np.int32).reshape(-1, LTP_ORDER),
          np.asarray(T.LTP_gain_vq_1, np.int32).reshape(-1, LTP_ORDER),
          np.asarray(T.LTP_gain_vq_2, np.int32).reshape(-1, LTP_ORDER))
    gains = (np.asarray(T.LTP_gain_vq_0_gain, np.int32),
             np.asarray(T.LTP_gain_vq_1_gain, np.int32),
             np.asarray(T.LTP_gain_vq_2_gain, np.int32))
    cl = (np.asarray(T.LTP_gain_BITS_Q5_0, np.int32),
          np.asarray(T.LTP_gain_BITS_Q5_1, np.int32),
          np.asarray(T.LTP_gain_BITS_Q5_2, np.int32))
    return vq, gains, cl


def _vq_wmat_ec(X, nxX, rows, gains, cl, subfr_len: int, max_gain_q7):
    """VQ_WMat_EC.c:40-140 over [B] x [L] lanes.

    X: [B, 25] correlation matrix (Q17); nxX: [B, 5] = -(xX << 7);
    rows/gains/cl: static codebook arrays; max_gain_q7: [B].
    Returns (ind [B], res_nrg [B], rate_dist [B], gain [B])."""
    r = [jnp.asarray(rows[:, i])[None, :] for i in range(LTP_ORDER)]
    Xc = [X[:, i:i + 1] for i in range(25)]
    nx = [nxX[:, i:i + 1] for i in range(LTP_ORDER)]

    sum1 = jnp.broadcast_to(_fix(1.001, 15),
                            (X.shape[0], rows.shape[0])).astype(_i32)
    s2 = wrap32(nx[0] + Xc[1] * r[1])
    s2 = wrap32(s2 + Xc[2] * r[2])
    s2 = wrap32(s2 + Xc[3] * r[3])
    s2 = wrap32(s2 + Xc[4] * r[4])
    s2 = wrap32(s2 << 1)
    s2 = wrap32(s2 + Xc[0] * r[0])
    sum1 = smlawb(sum1, s2, r[0])
    s2 = wrap32(nx[1] + Xc[7] * r[2])
    s2 = wrap32(s2 + Xc[8] * r[3])
    s2 = wrap32(s2 + Xc[9] * r[4])
    s2 = wrap32(s2 << 1)
    s2 = wrap32(s2 + Xc[6] * r[1])
    sum1 = smlawb(sum1, s2, r[1])
    s2 = wrap32(nx[2] + Xc[13] * r[3])
    s2 = wrap32(s2 + Xc[14] * r[4])
    s2 = wrap32(s2 << 1)
    s2 = wrap32(s2 + Xc[12] * r[2])
    sum1 = smlawb(sum1, s2, r[2])
    s2 = wrap32(nx[3] + Xc[19] * r[4])
    s2 = wrap32(s2 << 1)
    s2 = wrap32(s2 + Xc[18] * r[3])
    sum1 = smlawb(sum1, s2, r[3])
    s2 = wrap32(nx[4] << 1)
    s2 = wrap32(s2 + Xc[24] * r[4])
    sum1 = smlawb(sum1, s2, r[4])

    gain_row = jnp.asarray(gains)[None, :]
    penalty = wrap32(jnp.maximum(gain_row - max_gain_q7[:, None], 0)
                     << 11)
    valid = sum1 >= 0
    bits_res = smulbb(np.int32(subfr_len),
                      lin2log(wrap32(sum1 + penalty)) - (15 << 7))
    bits_tot = wrap32(bits_res + (jnp.asarray(cl)[None, :] << 2))
    masked = jnp.where(valid, bits_tot, INT32_MAX)
    L = rows.shape[0]
    # C scans with <=: the LAST minimum wins
    ind = L - 1 - jnp.argmin(masked[:, ::-1], axis=1)
    any_valid = jnp.any(valid, axis=1)
    oh = ind[:, None] == jnp.arange(L)[None, :]

    def pick(v):
        return jnp.sum(jnp.where(oh, v, 0), axis=1, dtype=_i32)

    rd = jnp.where(any_valid, pick(masked), INT32_MAX)
    rn = jnp.where(any_valid, pick(wrap32(sum1 + penalty)), 0)
    g = jnp.where(any_valid, pick(jnp.broadcast_to(gain_row, oh.shape)),
                  0)
    ind = jnp.where(any_valid, ind, 0)
    return ind, rn, rd, g


def quant_ltp_gains_batch(XX_q17, xX_q17, sum_log_gain_q7,
                          subfr_len: int, nb_subfr: int):
    """XX_q17: [B, nb, 25]; xX_q17: [B, nb, 5]; sum_log_gain_q7: [B].

    Returns (B_Q14 [B, nb*5], cbk_index [B, nb], per_index [B],
    sum_log_gain_q7 [B], pred_gain_dB_Q7 [B])."""
    from .encoder_analysis import MAX_SUM_LOG_GAIN_DB
    vq, gains, cl = _tabs()
    XX = jnp.asarray(XX_q17, _i32)
    xX = jnp.asarray(xX_q17, _i32)
    slg0 = jnp.asarray(sum_log_gain_q7, _i32)
    B = XX.shape[0]
    gain_safety = _fix(0.4, 7)
    max_slg_c = _fix(MAX_SUM_LOG_GAIN_DB / 6.0, 7)

    per_rd = []
    per_idx = []
    per_slg = []
    res_nrg_last = None
    for k in range(3):
        slg = slg0
        idxs = []
        res_nrg = jnp.zeros((B,), _i32)
        rate_dist = jnp.zeros((B,), _i32)
        for j in range(nb_subfr):
            max_gain = log2lin(wrap32((max_slg_c - slg) + (7 << 7))) \
                - gain_safety
            nxX = wrap32(-(xX[:, j] << 7))
            ind, rn, rd, g = _vq_wmat_ec(
                XX[:, j], nxX, vq[k], gains[k], cl[k], subfr_len,
                max_gain)
            idxs.append(ind)
            res_nrg = add_pos_sat32(res_nrg, rn)
            rate_dist = add_pos_sat32(rate_dist, rd)
            slg = jnp.maximum(
                0, wrap32(slg + lin2log(wrap32(gain_safety + g))
                          - (7 << 7)))
        per_rd.append(rate_dist)
        per_idx.append(jnp.stack(idxs, axis=1))
        per_slg.append(slg)
        res_nrg_last = res_nrg          # quant_LTP_gains.c keeps k=2's

    rds = jnp.stack(per_rd, axis=1)           # [B, 3]
    # <= comparisons: last minimum wins
    per_index = 2 - jnp.argmin(rds[:, ::-1], axis=1)
    oh_k = per_index[:, None] == jnp.arange(3)[None, :]
    idx_all = jnp.stack(per_idx, axis=1)      # [B, 3, nb]
    cbk_index = jnp.sum(jnp.where(oh_k[:, :, None], idx_all, 0),
                        axis=1, dtype=_i32)
    slg_all = jnp.stack(per_slg, axis=1)
    slg_out = jnp.sum(jnp.where(oh_k, slg_all, 0), axis=1, dtype=_i32)

    # B_Q14 gather: pad codebooks to the largest size
    Lmax = vq[2].shape[0]
    cbs = np.zeros((3, Lmax, LTP_ORDER), np.int32)
    for k in range(3):
        cbs[k, :vq[k].shape[0]] = vq[k]
    cb_sel = jnp.sum(jnp.where(oh_k[:, :, None, None],
                               jnp.asarray(cbs)[None, :, :, :], 0),
                     axis=1, dtype=_i32)      # [B, Lmax, 5]
    oh_row = cbk_index[:, :, None] == jnp.arange(Lmax)[None, None, :]
    b_rows = jnp.sum(jnp.where(oh_row[:, :, :, None],
                               cb_sel[:, None, :, :], 0),
                     axis=2, dtype=_i32)      # [B, nb, 5]
    b_q14 = (b_rows << 7).reshape(B, nb_subfr * LTP_ORDER)

    shift = 1 if nb_subfr == 2 else 2
    pred_gain = smulbb(np.int32(-3),
                       lin2log(res_nrg_last >> shift) - (15 << 7))
    return b_q14, cbk_index, per_index, slg_out, pred_gain


quant_ltp_gains_batch_jit = jax.jit(
    quant_ltp_gains_batch, static_argnames=("subfr_len", "nb_subfr"))
