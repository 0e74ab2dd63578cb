"""Batched SILK resampler — device lane for the decoder-side
{8,12,16} kHz -> 48 kHz conversion (the IIR+FIR topology).

Behavioural parity: /root/reference/opus/silk/resampler.c:172-215,
resampler_private_up2_HQ.c:40-103, resampler_private_IIR_FIR.c:64-107.
The scalar ``silk.resampler.Resampler`` is the tested ground truth;
outputs are bit-exact.

TPU-first reading of the algorithm: for a fixed rate pair, the
fractional-interpolation index walk (``index_q16 += inv_ratio``) is a
compile-time constant sequence, so the 8-tap polyphase FIR becomes a
static gather + int32 MAC over ``[B, n_out, 8]`` — pure data
parallelism.  Only the 2x-upsampling allpass chain (6 coupled
first-order sections in exact fixed point) is inherently serial; it
runs as a ``lax.scan`` over input samples with a [B, 6] carry.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fixed32 import rshift_round, sat16, smulwb
from . import tables as T
from .resampler import (RESAMPLER_ORDER_FIR_12, Resampler, _DELAY_DEC,
                        _rate_id)

_i32 = jnp.int32

__all__ = ["ResamplerBatchState", "init_resampler_state",
           "resample_to48_batch", "resample_to48_batch_jit"]


class ResamplerBatchState(NamedTuple):
    sIIR: jnp.ndarray       # [B, 6] up2-HQ allpass state
    sFIR16: jnp.ndarray     # [B, 8] interpolation history
    delay: jnp.ndarray      # [B, 48] 1 ms input delay line


def init_resampler_state(B: int) -> ResamplerBatchState:
    return ResamplerBatchState(
        sIIR=jnp.zeros((B, 6), _i32),
        sFIR16=jnp.zeros((B, 8), _i32),
        delay=jnp.zeros((B, 48), _i32))


@lru_cache(maxsize=None)
def _plan(fs_in_khz: int, n_in: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static (tap_index [n_out, 8], tap_coef [n_out, 8]) for one
    IIR_FIR batch of ``n_in`` input samples (index walk of
    resampler_private_IIR_FIR.c:47-61)."""
    r = Resampler(fs_in_khz * 1000, 48000, False)
    frac = np.asarray(T.resampler_frac_FIR_12, np.int64)
    idx_rows, coef_rows = [], []
    index_q16 = 0
    max_index_q16 = n_in << 17
    while index_q16 < max_index_q16:
        table_index = ((index_q16 & 0xFFFF) * 12) >> 16
        b = index_q16 >> 16
        idx_rows.append([b + j for j in range(8)])
        coef_rows.append(list(frac[table_index][:4])
                         + list(frac[11 - table_index][3::-1]))
        index_q16 += r.inv_ratio_q16
    return (np.asarray(idx_rows, np.int32),
            np.asarray(coef_rows, np.int32))


def _up2_hq_batch(x, S):
    """resampler_private_up2_HQ.c:40-103 for [B, n] int16 values.
    Returns ([B, 2n], new S [B, 6])."""
    c0 = [int(v) for v in T.resampler_up2_hq_0]
    c1 = [int(v) for v in T.resampler_up2_hq_1]

    def step(S, xt):
        in32 = xt << 10
        Y = in32 - S[:, 0]
        X = smulwb(Y, c0[0])
        o1 = S[:, 0] + X
        s0 = in32 + X
        Y = o1 - S[:, 1]
        X = smulwb(Y, c0[1])
        o2 = S[:, 1] + X
        s1 = o1 + X
        Y = o2 - S[:, 2]
        X = Y + smulwb(Y, c0[2])
        oA = S[:, 2] + X
        s2 = o2 + X
        Y = in32 - S[:, 3]
        X = smulwb(Y, c1[0])
        o1 = S[:, 3] + X
        s3 = in32 + X
        Y = o1 - S[:, 4]
        X = smulwb(Y, c1[1])
        o2 = S[:, 4] + X
        s4 = o1 + X
        Y = o2 - S[:, 5]
        X = Y + smulwb(Y, c1[2])
        oB = S[:, 5] + X
        s5 = o2 + X
        Snew = jnp.stack([s0, s1, s2, s3, s4, s5], axis=1)
        out2 = jnp.stack([sat16(rshift_round(oA, 10)),
                          sat16(rshift_round(oB, 10))], axis=1)
        return Snew, out2

    S, outs = jax.lax.scan(step, S, x.T.astype(_i32))   # [n, B, 2]
    return outs.transpose(1, 0, 2).reshape(x.shape[0], -1), S


def _iir_fir_batch(x, sIIR, sFIR16, fs_in_khz: int):
    """One silk_resampler_private_IIR_FIR call over [B, n] samples,
    split into <=10 ms batches exactly as the scalar does."""
    B, n = x.shape
    max_batch = fs_in_khz * 10
    outs = []
    pos = 0
    while pos < n:
        n_in = min(n - pos, max_batch)
        up2, sIIR = _up2_hq_batch(x[:, pos:pos + n_in], sIIR)
        buf = jnp.concatenate([sFIR16, up2], axis=1)
        idx, coef = _plan(fs_in_khz, n_in)
        taps = buf[:, idx]                       # [B, n_out, 8] static
        prod = jnp.sum(taps * jnp.asarray(coef)[None], axis=2,
                       dtype=_i32)
        outs.append(sat16(rshift_round(prod, 15)))
        sFIR16 = buf[:, 2 * n_in:2 * n_in + RESAMPLER_ORDER_FIR_12]
        pos += n_in
    return jnp.concatenate(outs, axis=1), sIIR, sFIR16


def resample_to48_batch(x, st: ResamplerBatchState, fs_in_khz: int):
    """silk_resampler (resampler.c:172-215) for [B, n] int16 values at
    {8,12,16} kHz -> ([B, n*48/fs_in], state).  Bit-exact."""
    B, n = x.shape
    delay = int(_DELAY_DEC[_rate_id(fs_in_khz * 1000)][
        _rate_id(48000)])
    nkhz = fs_in_khz
    n_samples = nkhz - delay
    dbuf = st.delay.at[:, delay:nkhz].set(x[:, :n_samples])
    first = dbuf[:, :nkhz]
    rest = x[:, n_samples:n_samples + n - nkhz]
    y1, sIIR, sFIR = _iir_fir_batch(first, st.sIIR, st.sFIR16, nkhz)
    y2, sIIR, sFIR = _iir_fir_batch(rest, sIIR, sFIR, nkhz)
    dbuf = dbuf.at[:, :delay].set(x[:, n - delay:])
    return (jnp.concatenate([y1, y2], axis=1),
            ResamplerBatchState(sIIR=sIIR, sFIR16=sFIR, delay=dbuf))


resample_to48_batch_jit = jax.jit(
    resample_to48_batch, static_argnames=("fs_in_khz",))
