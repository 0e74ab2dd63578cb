"""Batched NLSF quantization: MSVQ stage-1 search + delayed-decision
trellis for a ``[B]`` stream batch, bit-exact in wrap int32.

silk_NLSF_encode (NLSF_encode.c:36-132) with silk_NLSF_del_dec_quant
(NLSF_del_dec_quant.c:34-220) — the second of SILK's three serial
trellis cores (after the del-dec NSQ) — restructured TPU-first:

- stage 1 (silk_NLSF_VQ, NLSF_VQ.c:38-77) is a dense [B, K, order]
  weighted-error evaluation; survivor selection is a stable
  ``lax.sort`` (ties resolve to the lowest codebook index, matching
  the scalar stable argsort);
- the trellis runs all ``n_survivors`` in parallel as a second batch
  axis [B, S, ...]; its per-coefficient steps have a STATIC
  state-count schedule (1 -> 2 -> 4 survivors in the first two steps,
  then the sort/exchange phase), so each step is traced with its own
  branch and the data-dependent exchange loop becomes NS masked
  iterations (each iteration retires one state, so NS bounds it);
- every rate lookup is a one-hot select over the static [8, 9]
  rate-row table (NLSF_unpack.c packs the row id in 3 bits).

The scalar ``encoder_analysis.nlsf_encode`` is the tested ground truth
(oracle-validated vs libopus); this kernel must reproduce its indices
and RD choice exactly.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fixed32 import (INT32_MAX, div32_varq, lin2log, smlabb,
                           smulbb, wrap32)
from .encoder_analysis import (NLSF_QUANT_DEL_DEC_STATES,
                               NLSF_QUANT_DEL_DEC_STATES_LOG2,
                               NLSF_QUANT_LEVEL_ADJ_Q10,
                               NLSF_QUANT_MAX_AMPLITUDE,
                               NLSF_QUANT_MAX_AMPLITUDE_EXT)
from .nlsf import NLSFCodebook, nlsf_unpack

_i32 = jnp.int32

NS = NLSF_QUANT_DEL_DEC_STATES            # 4
EXT = NLSF_QUANT_MAX_AMPLITUDE_EXT        # 10
AMP = NLSF_QUANT_MAX_AMPLITUDE            # 4

__all__ = ["nlsf_encode_batch", "nlsf_encode_batch_jit", "cb_tables"]


@lru_cache(maxsize=None)
def cb_tables(order: int):
    """Static per-codebook tables (keyed by order: 16=WB, 10=NB/MB)."""
    from .nlsf import CB_NB_MB, CB_WB
    cb = CB_WB if order == 16 else CB_NB_MB
    K = cb.n_vectors
    cb1 = np.asarray(cb.cb1_nlsf_q8, np.int32).reshape(K, order)
    wgt = np.asarray(cb.cb1_wght_q9, np.int32).reshape(K, order)
    # unpacked EC row ids + predictors for every stage-1 index
    ec_row = np.zeros((K, order), np.int32)
    pred = np.zeros((K, order), np.int32)
    for k in range(K):
        ec_ix, pq8 = nlsf_unpack(cb, k)
        ec_row[k] = np.asarray(ec_ix, np.int32) // (2 * AMP + 1)
        pred[k] = np.asarray(pq8, np.int32)
    rates = np.asarray(cb.ec_rates_q5, np.int32).reshape(8, 2 * AMP + 1)
    # quantization-level reconstruction tables (del_dec_quant.c:59-76)
    out0 = np.zeros(2 * EXT, np.int32)
    out1 = np.zeros(2 * EXT, np.int32)
    for i in range(-EXT, EXT):
        o0 = i << 10
        o1 = o0 + 1024
        if i > 0:
            o0 -= NLSF_QUANT_LEVEL_ADJ_Q10
            o1 -= NLSF_QUANT_LEVEL_ADJ_Q10
        elif i == 0:
            o1 -= NLSF_QUANT_LEVEL_ADJ_Q10
        elif i == -1:
            o0 += NLSF_QUANT_LEVEL_ADJ_Q10
        else:
            o0 += NLSF_QUANT_LEVEL_ADJ_Q10
            o1 += NLSF_QUANT_LEVEL_ADJ_Q10
        out0[i + EXT] = (o0 * cb.quant_step_q16) >> 16
        out1[i + EXT] = (o1 * cb.quant_step_q16) >> 16
    icdf = np.asarray(cb.cb1_icdf, np.int32).reshape(2, K)
    inv_step = 427 if order == 16 else 356
    return dict(K=K, cb1=cb1, wgt=wgt, ec_row=ec_row, pred=pred,
                rates=rates, out0=out0, out1=out1, icdf=icdf,
                quant_step_q16=int(cb.quant_step_q16),
                inv_step_q6=inv_step)


def _sel_last(tab, idx):
    """tab [..., T] static-const rows; idx [...] -> tab[..., idx] via
    one-hot compare (TPU-friendly)."""
    T = tab.shape[-1]
    oh = idx[..., None] == jnp.arange(T)
    return jnp.sum(jnp.where(oh, tab, 0), axis=-1, dtype=_i32)


def _trellis(x_q10, w_q5, pred_q8, ec_row, rates, out0_tab, out1_tab,
             inv_step_q6, mu_q20, order: int):
    """silk_NLSF_del_dec_quant over [B, S] lanes.

    x_q10/w_q5/pred_q8/ec_row: [B, S, order]; mu_q20: [B, 1].
    Returns (ind [B, S, NS, order], flatRD [B, S, 2*NS])."""
    B, S = x_q10.shape[:2]
    RD = jnp.zeros((B, S, 2 * NS), _i32)
    prev_out = jnp.zeros((B, S, 2 * NS), _i32)
    ind = jnp.zeros((B, S, NS, order), _i32)
    js = jnp.arange(NS)

    n_states = 1
    for step, i in enumerate(range(order - 1, -1, -1)):
        n = n_states
        in_q10 = x_q10[:, :, i:i + 1]                      # [B,S,1]
        pq8 = pred_q8[:, :, i:i + 1]
        # rate row for this coefficient: [B,S,9]
        rrow = jnp.sum(jnp.where(
            (ec_row[:, :, i, None, None]
             == jnp.arange(rates.shape[0])[None, None, :, None]),
            jnp.asarray(rates)[None, None, :, :], 0),
            axis=2, dtype=_i32)

        po = prev_out[:, :, :n]
        pred = smulbb(pq8, po) >> 8
        res = in_q10 - pred
        ind_tmp = smulbb(np.int32(inv_step_q6), res) >> 16
        ind_tmp = jnp.clip(ind_tmp, -EXT, EXT - 1)
        o0 = _sel_last(
            jnp.broadcast_to(jnp.asarray(out0_tab),
                             ind_tmp.shape + (2 * EXT,)),
            ind_tmp + EXT) + pred
        o1 = _sel_last(
            jnp.broadcast_to(jnp.asarray(out1_tab),
                             ind_tmp.shape + (2 * EXT,)),
            ind_tmp + EXT) + pred

        # rates (del_dec_quant.c:107-131)
        in_rng0 = _sel_last(
            jnp.broadcast_to(rrow[:, :, None, :],
                             ind_tmp.shape + (2 * AMP + 1,)),
            jnp.clip(ind_tmp + AMP, 0, 2 * AMP))
        in_rng1 = _sel_last(
            jnp.broadcast_to(rrow[:, :, None, :],
                             ind_tmp.shape + (2 * AMP + 1,)),
            jnp.clip(ind_tmp + 1 + AMP, 0, 2 * AMP))
        esc_hi = wrap32(280 - 43 * AMP + 43 * ind_tmp)
        esc_lo = wrap32(280 - 43 * AMP - 43 * ind_tmp)
        rate0 = jnp.where(
            ind_tmp + 1 > AMP,
            jnp.where(ind_tmp + 1 == AMP + 1, in_rng0, esc_hi),
            jnp.where(ind_tmp <= -AMP,
                      jnp.where(ind_tmp == -AMP, 280, esc_lo),
                      in_rng0))
        rate1 = jnp.where(
            ind_tmp + 1 > AMP,
            jnp.where(ind_tmp + 1 == AMP + 1, 280, esc_hi + 43),
            jnp.where(ind_tmp <= -AMP,
                      jnp.where(ind_tmp == -AMP, in_rng1, esc_lo - 43),
                      in_rng1))

        RD_base = RD[:, :, :n]
        wq = w_q5[:, :, i:i + 1]
        d0 = in_q10 - o0
        d1 = in_q10 - o1
        rd0 = smlabb(wrap32(RD_base + smulbb(d0, d0) * wq),
                     mu_q20[:, :, None], rate0)
        rd1 = smlabb(wrap32(RD_base + smulbb(d1, d1) * wq),
                     mu_q20[:, :, None], rate1)

        # scatter the step results into the flat 2*NS lanes
        def put(buf, vals, base):
            return jax.lax.dynamic_update_slice(
                buf, vals, (0, 0, base))

        prev_out = put(prev_out, o0, 0)
        prev_out = put(prev_out, o1, n)
        RD = put(RD, rd0, 0)
        RD = put(RD, rd1, n)
        ind = ind.at[:, :, :n, i].set(ind_tmp)

        if n_states <= NS // 2:
            # growth phase (del_dec_quant.c:143-150): static schedule
            col = ind[:, :, :, i]
            col = col.at[:, :, n:2 * n].set(col[:, :, :n] + 1)
            if 2 * n < NS:
                col = col.at[:, :, 2 * n:].set(col[:, :, :NS - 2 * n])
            ind = ind.at[:, :, :, i].set(col)
            n_states = 2 * n
        else:
            # exchange phase (del_dec_quant.c:151-196)
            r0 = RD[:, :, :NS]
            r1 = RD[:, :, NS:]
            p0 = prev_out[:, :, :NS]
            p1 = prev_out[:, :, NS:]
            sw = r0 > r1
            RD_max = jnp.where(sw, r0, r1)
            RD_min = jnp.where(sw, r1, r0)
            r0n = RD_min
            r1n = RD_max
            p0n = jnp.where(sw, p1, p0)
            p1n = jnp.where(sw, p0, p1)
            ind_sort = jnp.where(sw, js + NS, js)
            r0, r1, p0, p1 = r0n, r1n, p0n, p1n
            for _ in range(NS):
                min_max = jnp.min(RD_max, axis=2)
                ind_min_max = jnp.argmin(RD_max, axis=2)
                max_min = jnp.max(RD_min, axis=2)
                ind_max_min = jnp.argmax(RD_min, axis=2)
                act = min_max < max_min
                oh_mm = js[None, None, :] == ind_min_max[:, :, None]
                oh_xm = js[None, None, :] == ind_max_min[:, :, None]
                sort_src = jnp.sum(
                    jnp.where(oh_mm, ind_sort, 0), axis=2) ^ NS
                r1_mm = jnp.sum(jnp.where(oh_mm, r1, 0), axis=2)
                p1_mm = jnp.sum(jnp.where(oh_mm, p1, 0), axis=2)
                upd = act[:, :, None] & oh_xm
                ind_sort = jnp.where(upd, sort_src[:, :, None],
                                     ind_sort)
                r0 = jnp.where(upd, r1_mm[:, :, None], r0)
                p0 = jnp.where(upd, p1_mm[:, :, None], p0)
                RD_min = jnp.where(upd, 0, RD_min)
                RD_max = jnp.where(act[:, :, None] & oh_mm,
                                   INT32_MAX, RD_max)
                # ind row copy: ind[max_min] <- ind[min_max]
                src_rows = jnp.sum(
                    jnp.where(oh_mm[:, :, :, None], ind, 0), axis=2)
                ind = jnp.where(upd[:, :, :, None],
                                src_rows[:, :, None, :], ind)
            RD = jnp.concatenate([r0, r1], axis=2)
            prev_out = jnp.concatenate([p0, p1], axis=2)
            ind = ind.at[:, :, :, i].add(
                ind_sort >> NLSF_QUANT_DEL_DEC_STATES_LOG2)
    return ind, RD


def nlsf_encode_batch(nlsf_q15, w_q2, mu_q20, signal_type,
                      n_survivors: int, order: int):
    """Batched silk_NLSF_encode core.

    nlsf_q15: [B, order] STABILIZED NLSF vector; w_q2: [B, order]
    Laroia weights; mu_q20/signal_type: [B].  n_survivors/order are
    static (bucket keys).  Returns (indices [B, order+1] int32,
    best RD_Q25 [B]) — the caller runs nlsf_decode per stream.
    """
    t = cb_tables(order)
    K = t["K"]
    B = nlsf_q15.shape[0]
    S = n_survivors
    nlsf = jnp.asarray(nlsf_q15, _i32)
    w_q2 = jnp.asarray(w_q2, _i32)
    mu = jnp.asarray(mu_q20, _i32)[:, None]
    sig = jnp.asarray(signal_type, _i32)

    # ---- stage 1: silk_NLSF_VQ errors over all K vectors
    cb1 = jnp.asarray(t["cb1"])            # [K, order]
    wgt = jnp.asarray(t["wgt"])
    diffw = smulbb(nlsf[:, None, :] - (cb1[None, :, :] << 7),
                   wgt[None, :, :])        # [B, K, order]
    predd = jnp.concatenate(
        [diffw[:, :, 1:], jnp.zeros((B, K, 1), _i32)], axis=2)
    err = jnp.sum(jnp.abs(wrap32(diffw - (predd >> 1))), axis=2,
                  dtype=_i32)
    # stable ascending sort; ties keep the lower codebook index
    _, order_ix = jax.lax.sort(
        (err, jnp.broadcast_to(jnp.arange(K, dtype=_i32), (B, K))),
        dimension=1, num_keys=1, is_stable=True)
    ind1 = order_ix[:, :S]                 # [B, S]

    # ---- survivor-wise residuals + tables
    oh1 = ind1[:, :, None] == jnp.arange(K)[None, None, :]

    def sel_k(tab):                        # [K, order] -> [B, S, order]
        return jnp.sum(jnp.where(oh1[:, :, :, None],
                                 jnp.asarray(tab)[None, None, :, :], 0),
                       axis=2, dtype=_i32)

    cbe = sel_k(t["cb1"])
    cbw = sel_k(t["wgt"])
    pq8 = sel_k(t["pred"])
    ecr = sel_k(t["ec_row"])
    res_q10 = smulbb(nlsf[:, None, :] - (cbe << 7), cbw) >> 14
    w_adj_q5 = div32_varq(w_q2[:, None, :], smulbb(cbw, cbw), 21)

    ind, RD = _trellis(res_q10, w_adj_q5, pq8, ecr, t["rates"],
                       t["out0"], t["out1"], t["inv_step_q6"], mu,
                       order)

    # ---- per-survivor best path (del_dec_quant.c:198-205)
    best_flat = jnp.argmin(RD, axis=2)     # [B, S] first-min
    min_q25 = jnp.min(RD, axis=2)
    oh_best = (best_flat[:, :, None] & (NS - 1)) \
        == jnp.arange(NS)[None, None, :]
    ind2 = jnp.sum(jnp.where(oh_best[:, :, :, None], ind, 0), axis=2)
    ind2 = ind2.at[:, :, 0].add(
        best_flat >> NLSF_QUANT_DEL_DEC_STATES_LOG2)

    # ---- stage-1 rate term (NLSF_encode.c:110-117)
    icdf = jnp.asarray(t["icdf"])          # [2, K]
    icdf_row = icdf[jnp.clip(sig >> 1, 0, 1)]   # [B, K]
    icdf_s = jnp.sum(jnp.where(oh1, icdf_row[:, None, :], 0), axis=2,
                     dtype=_i32)
    icdf_prev = jnp.sum(
        jnp.where((ind1[:, :, None] - 1)
                  == jnp.arange(K)[None, None, :],
                  icdf_row[:, None, :], 0), axis=2, dtype=_i32)
    prob_q8 = jnp.where(ind1 == 0, 256 - icdf_row[:, 0:1],
                        icdf_prev - icdf_s)
    bits_q7 = (8 << 7) - lin2log(prob_q8)
    rd_q25 = smlabb(min_q25, bits_q7, mu >> 2)

    best_s = jnp.argmin(rd_q25, axis=1)    # first-min == scalar scan
    oh_s = best_s[:, None] == jnp.arange(S)[None, :]
    out_ind1 = jnp.sum(jnp.where(oh_s, ind1, 0), axis=1)
    out_ind2 = jnp.sum(jnp.where(oh_s[:, :, None], ind2, 0), axis=1)
    best_rd = jnp.min(rd_q25, axis=1)
    indices = jnp.concatenate([out_ind1[:, None], out_ind2], axis=1)
    return indices, best_rd


nlsf_encode_batch_jit = jax.jit(
    nlsf_encode_batch, static_argnames=("n_survivors", "order"))
