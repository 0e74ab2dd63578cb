"""Vectorized range-coder *model* + symbol-plan emission (device side).

The batched CELT encoder computes every symbol on device, but encoder
decisions read the coder's bit usage mid-stream (``ec_tell``/
``ec_tell_frac`` — entcode.c:69), which depends on the exact 32-bit range
state.  This module tracks, per stream, the only two state variables that
accounting needs — ``rng`` and ``nbits_total`` (entenc.c update rules,
mirrored from ``bitstream.range_coder``) — while appending resolved
primitive ops to a per-stream plan.  The host lane
(``runtime/ec_lane.c``) then executes the identical update rules to emit
bytes, so every budget decision made here is self-consistent with the
packed bitstream by construction.

Plan rows are int32 ``(kind, a, b, c)`` in ec_lane's format:
  kind 0 ENCODE      a=fl  b=fh  c=ft
  kind 1 ENCODE_BIN  a=fl  b=fh  c=ftb
  kind 2 BIT_LOGP    a=val       c=logp
  kind 5 BITS        a=val       c=nbits
(ICDF/UINT/Laplace are resolved to these on device — no side tables.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

BITRES = 3
SYM_BITS = 8
CODE_BITS = 32
CODE_TOP = np.uint32(1 << 31)
CODE_BOT = np.uint32(1 << 23)
UINT_BITS = 8
M32 = np.uint32(0xFFFFFFFF)

OP_ENCODE = 0
OP_ENCODE_BIN = 1
OP_BIT_LOGP = 2
OP_BITS = 5

# 1/8th-bit tell correction thresholds (entcode.c:70-72)
_TELL_TBL = np.array([35733, 38967, 42495, 46340, 50535, 55109, 60097,
                      65535], np.int32)

_LOG_MINP = 0
_MINP = 1
_NMIN = 16


class PlanCoder(NamedTuple):
    """Per-stream coder model + plan buffer (a pytree of [B,...] arrays).

    Plan rows live at *static* slots (one per emission call site,
    assigned at trace time) — masked-off rows carry kind == -1 (NOP) and
    are skipped by every plan executor.  During tracing ``ops`` is a
    tuple of [B, 4] rows (appending is free at trace time — no scatters
    in the compiled graph); ``finalize`` stacks it into the
    [B, n_slots, 4] array the host lane consumes.  ``pos`` counts valid
    rows (for diagnostics)."""
    rng: jnp.ndarray           # [B] uint32
    nbits_total: jnp.ndarray   # [B] int32
    pos: jnp.ndarray           # [B] int32 — number of valid rows
    ops: tuple                 # trace: tuple of [B, 4]; final: [B, n, 4]


def plan_init(B: int, max_ops: int = 0) -> PlanCoder:
    """``max_ops`` is ignored (kept for call-site compat): the plan
    grows one static slot per emission call site."""
    return PlanCoder(
        rng=jnp.full((B,), CODE_TOP, jnp.uint32),
        nbits_total=jnp.full((B,), CODE_BITS + 1, jnp.int32),
        pos=jnp.zeros((B,), jnp.int32),
        ops=(),
    )


def finalize(c: PlanCoder) -> PlanCoder:
    """Concatenate the traced rows/blocks into the [B, n_slots, 4]
    plan array.  ``ops`` elements are [B, 4] single rows (one call
    site) or [B, k, 4] blocks (emitted by in-scan code via
    ``append_block``)."""
    if isinstance(c.ops, tuple):
        blocks = [o[:, None, :] if o.ndim == 2 else o for o in c.ops]
        return c._replace(ops=jnp.concatenate(blocks, axis=1))
    return c


def append_block(c: PlanCoder, block, nrows) -> PlanCoder:
    """Append a pre-built [B, k, 4] row block (rows with kind == -1 are
    NOPs).  ``nrows``: [B] count of valid rows in the block."""
    return c._replace(pos=c.pos + nrows.astype(jnp.int32),
                      ops=c.ops + (block,))


def ec_ilog(v):
    """Highest set bit position + 1 (0 for 0); exact on uint32."""
    v = v.astype(jnp.uint32)
    r = jnp.zeros(v.shape, jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        m = v >> shift
        take = m != 0
        v = jnp.where(take, m, v)
        r = r + take.astype(jnp.int32) * shift
    return r + (v != 0).astype(jnp.int32)


def tell(c: PlanCoder) -> jnp.ndarray:
    return c.nbits_total - ec_ilog(c.rng)


def tell_frac(c: PlanCoder) -> jnp.ndarray:
    """entcode.c:69-84 closed form (matches range_coder.tell_frac)."""
    nbits = c.nbits_total << BITRES
    l = ec_ilog(c.rng)
    r = (c.rng >> (l - 16).astype(jnp.uint32)).astype(jnp.int32)
    b = (r >> 12) - 8
    tbl = jnp.asarray(_TELL_TBL)
    b = b + (r > tbl[jnp.clip(b, 0, 7)]).astype(jnp.int32)
    return nbits - ((l << 3) + b)


def _normalize(rng, nbt):
    for _ in range(3):
        cond = rng <= CODE_BOT
        rng = jnp.where(cond, (rng << np.uint32(SYM_BITS)), rng)
        nbt = nbt + cond.astype(jnp.int32) * SYM_BITS
    return rng, nbt


# ---------------------------------------------------------------------------
# Row-level (rng, nbits_total) primitives — for emission inside lax.scan
# bodies, where the trace-time ops tuple cannot grow per iteration.  The
# PlanCoder-level functions below delegate to these.

def tell_rn(rng, nbt):
    return nbt - ec_ilog(rng)


def tell_frac_rn(rng, nbt):
    nbits = nbt << BITRES
    l = ec_ilog(rng)
    r = (rng >> (l - 16).astype(jnp.uint32)).astype(jnp.int32)
    b = (r >> 12) - 8
    tbl = jnp.asarray(_TELL_TBL)
    b = b + (r > tbl[jnp.clip(b, 0, 7)]).astype(jnp.int32)
    return nbits - ((l << 3) + b)


def _row(mask, kind, a, b, d):
    B = mask.shape[0]
    return jnp.stack([
        jnp.where(mask, jnp.asarray(kind, jnp.int32),
                  jnp.int32(-1)).astype(jnp.int32),
        jnp.broadcast_to(jnp.asarray(a), (B,)).astype(jnp.int32),
        jnp.broadcast_to(jnp.asarray(b), (B,)).astype(jnp.int32),
        jnp.broadcast_to(jnp.asarray(d), (B,)).astype(jnp.int32),
    ], axis=-1)


def encode_rn(rng, nbt, mask, fl, fh, ft):
    """ec_encode on raw state; returns (rng', nbt', row [B, 4])."""
    fl = jnp.asarray(fl, jnp.int32)
    fh = jnp.asarray(fh, jnp.int32)
    ft = jnp.asarray(ft, jnp.int32)
    ftu = jnp.maximum(ft, 1).astype(jnp.uint32)
    r = rng // ftu
    rng1 = jnp.where(fl > 0,
                     r * (fh - fl).astype(jnp.uint32),
                     rng - r * (ft - fh).astype(jnp.uint32))
    rng1, nbt1 = _normalize(rng1, nbt)
    return (jnp.where(mask, rng1, rng), jnp.where(mask, nbt1, nbt),
            _row(mask, OP_ENCODE, fl, fh, ft))


def bit_logp_rn(rng, nbt, mask, val, logp):
    val = jnp.asarray(val, jnp.int32)
    logp = jnp.asarray(logp, jnp.int32)
    s = rng >> logp.astype(jnp.uint32)
    r = rng - s
    rng1 = jnp.where(val != 0, s, r)
    rng1, nbt1 = _normalize(rng1, nbt)
    return (jnp.where(mask, rng1, rng), jnp.where(mask, nbt1, nbt),
            _row(mask, OP_BIT_LOGP, val, 0, logp))


def bits_rn(rng, nbt, mask, val, nbits):
    val = jnp.asarray(val, jnp.int32)
    nbits = jnp.asarray(nbits, jnp.int32)
    return (rng, nbt + jnp.where(mask, nbits, 0),
            _row(mask, OP_BITS, val, 0, nbits))


def uint_rn(rng, nbt, mask, fl, ft):
    """ec_enc_uint on raw state; returns (rng', nbt', row1, row2)."""
    fl = jnp.asarray(fl).astype(jnp.uint32)
    ft = jnp.asarray(ft).astype(jnp.uint32) - np.uint32(1)
    ftb = ec_ilog(ft)
    split = ftb > UINT_BITS
    ftb_lo = jnp.where(split, ftb - UINT_BITS, 0).astype(jnp.uint32)
    ftop = (ft >> ftb_lo) + np.uint32(1)
    fltop = fl >> ftb_lo
    a = jnp.where(split, fltop, fl).astype(jnp.int32)
    t = jnp.where(split, ftop, ft + np.uint32(1)).astype(jnp.int32)
    rng, nbt, row1 = encode_rn(rng, nbt, mask, a, a + 1, t)
    lsbs = (fl & ((np.uint32(1) << ftb_lo) - np.uint32(1))) \
        .astype(jnp.int32)
    rng, nbt, row2 = bits_rn(rng, nbt, mask & split, lsbs,
                             ftb_lo.astype(jnp.int32))
    return rng, nbt, row1, row2


def _emit(c: PlanCoder, mask, kind, a, b, d) -> PlanCoder:
    """Append one plan row at this call site's static slot (NOP where
    the mask is off)."""
    B = c.pos.shape[0]
    row = jnp.stack([
        jnp.where(mask, jnp.asarray(kind, jnp.int32),
                  jnp.int32(-1)).astype(jnp.int32),
        jnp.broadcast_to(jnp.asarray(a), (B,)).astype(jnp.int32),
        jnp.broadcast_to(jnp.asarray(b), (B,)).astype(jnp.int32),
        jnp.broadcast_to(jnp.asarray(d), (B,)).astype(jnp.int32),
    ], axis=-1)
    pos = c.pos + mask.astype(jnp.int32)
    return c._replace(pos=pos, ops=c.ops + (row,))


def encode(c: PlanCoder, mask, fl, fh, ft) -> PlanCoder:
    """ec_encode (entenc.c:112): cumulative interval [fl, fh) of ft."""
    fl = jnp.asarray(fl, jnp.int32)
    fh = jnp.asarray(fh, jnp.int32)
    ft = jnp.asarray(ft, jnp.int32)
    ftu = jnp.maximum(ft, 1).astype(jnp.uint32)
    r = c.rng // ftu
    rng1 = jnp.where(fl > 0,
                     r * (fh - fl).astype(jnp.uint32),
                     c.rng - r * (ft - fh).astype(jnp.uint32))
    rng1, nbt1 = _normalize(rng1, c.nbits_total)
    c = c._replace(rng=jnp.where(mask, rng1, c.rng),
                   nbits_total=jnp.where(mask, nbt1, c.nbits_total))
    return _emit(c, mask, OP_ENCODE, fl, fh, ft)


def encode_bin(c: PlanCoder, mask, fl, fh, ftb) -> PlanCoder:
    fl = jnp.asarray(fl, jnp.int32)
    fh = jnp.asarray(fh, jnp.int32)
    ftb = jnp.asarray(ftb, jnp.int32)
    r = c.rng >> ftb.astype(jnp.uint32)
    ft = (jnp.int32(1) << ftb)
    rng1 = jnp.where(fl > 0,
                     r * (fh - fl).astype(jnp.uint32),
                     c.rng - r * (ft - fh).astype(jnp.uint32))
    rng1, nbt1 = _normalize(rng1, c.nbits_total)
    c = c._replace(rng=jnp.where(mask, rng1, c.rng),
                   nbits_total=jnp.where(mask, nbt1, c.nbits_total))
    return _emit(c, mask, OP_ENCODE_BIN, fl, fh, ftb)


def bit_logp(c: PlanCoder, mask, val, logp) -> PlanCoder:
    """ec_enc_bit_logp (entenc.c:151): one bit, P(1)=2^-logp."""
    val = jnp.asarray(val, jnp.int32)
    logp = jnp.asarray(logp, jnp.int32)
    s = c.rng >> logp.astype(jnp.uint32)
    r = c.rng - s
    rng1 = jnp.where(val != 0, s, r)
    rng1, nbt1 = _normalize(rng1, c.nbits_total)
    c = c._replace(rng=jnp.where(mask, rng1, c.rng),
                   nbits_total=jnp.where(mask, nbt1, c.nbits_total))
    return _emit(c, mask, OP_BIT_LOGP, val, 0, logp)


def icdf(c: PlanCoder, mask, s, table: np.ndarray, ftb: int) -> PlanCoder:
    """ec_enc_icdf resolved to ENCODE_BIN (table is a host constant)."""
    tbl = jnp.asarray(np.asarray(table, np.int32))
    s = jnp.asarray(s, jnp.int32)
    ft = jnp.int32(1 << ftb)
    hi = tbl[jnp.maximum(s - 1, 0)]
    lo = tbl[s]
    fl = jnp.where(s > 0, ft - hi, 0)
    fh = ft - lo
    return encode_bin(c, mask, fl, fh, ftb)


def bits(c: PlanCoder, mask, val, nbits) -> PlanCoder:
    """ec_enc_bits: raw bits on the backwards stream; only tell moves."""
    val = jnp.asarray(val, jnp.int32)
    nbits = jnp.asarray(nbits, jnp.int32)
    nbt = c.nbits_total + jnp.where(mask, nbits, 0)
    c = c._replace(nbits_total=nbt)
    return _emit(c, mask, OP_BITS, val, 0, nbits)


def uint(c: PlanCoder, mask, fl, ft) -> PlanCoder:
    """ec_enc_uint (entenc.c:179): uniform integer in [0, ft), ft > 1.

    ``fl``/``ft`` are treated as uint32 (PVQ codeword counts V(N,K) use
    the full 32-bit range); the emitted plan values are always small.
    """
    fl = jnp.asarray(fl).astype(jnp.uint32)
    ft = jnp.asarray(ft).astype(jnp.uint32) - np.uint32(1)
    ftb = ec_ilog(ft)
    split = ftb > UINT_BITS
    ftb_lo = jnp.where(split, ftb - UINT_BITS, 0).astype(jnp.uint32)
    ftop = (ft >> ftb_lo) + np.uint32(1)
    fltop = fl >> ftb_lo
    # top symbol: [fltop, fltop+1) of ftop (or the whole value when small)
    a = jnp.where(split, fltop, fl).astype(jnp.int32)
    t = jnp.where(split, ftop, ft + np.uint32(1)).astype(jnp.int32)
    c = encode(c, mask, a, a + 1, t)
    lsbs = (fl & ((np.uint32(1) << ftb_lo) - np.uint32(1))).astype(jnp.int32)
    c = bits(c, mask & split, lsbs, ftb_lo.astype(jnp.int32))
    return c


def laplace(c: PlanCoder, mask, value, fs0, decay) -> PlanCoder:
    """ec_laplace_encode (laplace.c:51): returns (coder, coded_value).

    The value may saturate; the *coded* value is returned because the
    coarse-energy error feedback uses it.
    """
    value = jnp.asarray(value, jnp.int32)
    fs0 = jnp.asarray(fs0, jnp.int32)
    decay = jnp.asarray(decay, jnp.int32)

    sgn = jnp.where(value < 0, -1, 0).astype(jnp.int32)
    val = (value + sgn) ^ sgn               # |value|
    nz = val != 0

    ft0 = 32768 - _MINP * (2 * _NMIN) - fs0
    fs1 = (ft0 * (16384 - decay)) >> 15     # _freq1
    fl = jnp.where(nz, fs0, 0)
    fs = jnp.where(nz, fs1, fs0)

    # walk the geometric tail:  while fs > 0 and i < val
    i = jnp.ones_like(val)

    def _cond(st):
        fl, fs, i, it = st
        return jnp.any(nz & (fs > 0) & (i < val)) & (it < 24)

    def _walk(st):
        fl, fs, i, it = st
        go = nz & (fs > 0) & (i < val)
        fs2 = fs * 2
        fl = jnp.where(go, fl + fs2 + 2 * _MINP, fl)
        fs = jnp.where(go, (fs2 * decay) >> 15, fs)
        return fl, fs, i + go.astype(jnp.int32), it + 1

    import jax
    fl, fs, i, _ = jax.lax.while_loop(_cond, _walk,
                                      (fl, fs, i, jnp.int32(0)))

    ran_out = nz & (fs == 0)
    ndi_max = (32768 - fl + _MINP - 1) >> _LOG_MINP
    ndi_max = (ndi_max - sgn) >> 1
    di = jnp.minimum(val - i, ndi_max - 1)
    fl_out = fl + (2 * di + 1 + sgn) * _MINP
    fs_out = jnp.minimum(_MINP, 32768 - fl_out)
    val_out = (i + di + sgn) ^ sgn
    fs_in = fs + _MINP
    fl_in = fl + (fs_in & ~sgn)

    fl = jnp.where(ran_out, fl_out, jnp.where(nz, fl_in, fl))
    fs = jnp.where(ran_out, fs_out, jnp.where(nz, fs_in, fs))
    coded = jnp.where(ran_out, val_out, value)

    c = encode_bin(c, mask, fl, fl + fs, 15)
    return c, jnp.where(mask, coded, value)
