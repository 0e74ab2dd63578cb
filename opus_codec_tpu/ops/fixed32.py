"""Wrap-exact int32 fixed-point primitives for batched device code.

SILK's decoder is *defined* in 32-bit integer arithmetic with two's-
complement wraparound (silk/macros.h, SigProc_FIX.h — the scalar ground
truth is ``silk.sigproc``).  These are the jnp equivalents, written so
that every op stays in int32/uint32 — no int64 anywhere — because TPUs
execute 32-bit integer lanes natively while 64-bit integer math is
emulated.  The key identity (used by SMULWW/SMULWB): with
``ah = a >> 16`` (arithmetic) and ``al = a & 0xFFFF``,

    (a * b) >> 16  ==  ah*b + al*(b >> 16) + ((al*(b & 0xFFFF)) >> 16)

holds modulo 2**32, with every product representable in 32 bits.

All functions take/return int32 jnp arrays and broadcast like jnp ops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_i32 = jnp.int32
_u32 = jnp.uint32

INT32_MAX = np.int32(0x7FFFFFFF)
INT32_MIN = np.int32(-0x80000000)

__all__ = [
    "wrap32", "sext16", "sat16", "smulwb", "smlawb", "smulbb", "smlabb",
    "smulww", "smlaww", "rshift_round", "add_sat32", "lshift_sat32",
    "silk_rand", "clz32", "smmul", "div32_varq", "lin2log", "log2lin",
    "add_pos_sat32",
]


def _as32(x):
    return jnp.asarray(x, _i32) if not hasattr(x, "dtype") \
        else x.astype(_i32)


def wrap32(x):
    """Reinterpret any integer array as wrapped int32."""
    x = jnp.asarray(x)
    return x.astype(_u32).astype(_i32) if x.dtype != _i32 else x


def sext16(x):
    """Low 16 bits, sign-extended (the ``(opus_int16)`` cast)."""
    return (_as32(x) << 16) >> 16


def sat16(x):
    return jnp.clip(x, -32768, 32767)


def _split(a):
    """(a >> 16 arithmetic, a & 0xFFFF as nonnegative int32)."""
    a = _as32(a)
    return a >> 16, jnp.bitwise_and(a, 0xFFFF)


def smulwb(a, b):
    """((int64)a * (int16)b) >> 16, wrapped to int32 (silk_SMULWB,
    OPUS_FAST_INT64 semantics)."""
    ah, al = _split(a)
    b16 = sext16(b)
    # al*b16 fits int32 exactly (|al*b16| <= 65535*32768 < 2^31)
    return ah * b16 + ((al * b16) >> 16)


def smlawb(a, b, c):
    return _as32(a) + smulwb(b, c)


def smulbb(a, b):
    return sext16(a) * sext16(b)


def smlabb(a, b, c):
    return a + smulbb(b, c)


def smulww(a, b):
    """((int64)a * b) >> 16 wrapped to int32 (silk_SMULWW,
    OPUS_FAST_INT64 semantics) — exact mod 2^32 via 16-bit splits."""
    ah, al = _split(a)
    bh, bl = _split(b)
    # al*bl in [0, 2^32): compute in uint32 (wrap-free), logical >> 16
    low = (al.astype(_u32) * bl.astype(_u32)) >> 16
    return ah * _as32(b) + al * bh + low.astype(_i32)


def smlaww(a, b, c):
    return a + smulww(b, c)


def rshift_round(a, shift: int):
    """silk_RSHIFT_ROUND with int32 wrap (shift >= 1, static)."""
    a = _as32(a)
    if shift == 1:
        return (a >> 1) + jnp.bitwise_and(a, 1)
    return ((a >> (shift - 1)) + 1) >> 1


def add_sat32(a, b):
    a = _as32(a)
    b = _as32(b)
    s = a + b                     # wraps
    ovf = ((a ^ s) & (b ^ s)) < 0
    return jnp.where(ovf, jnp.where(a < 0, INT32_MIN, INT32_MAX), s)


def lshift_sat32(a, shift: int):
    lo = np.int32(INT32_MIN >> shift)
    hi = np.int32(INT32_MAX >> shift)
    return jnp.clip(_as32(a), lo, hi) << shift


def silk_rand(seed):
    """SigProc_FIX.h silk_RAND: 907633515 + seed*196314165 (wraps)."""
    return np.int32(907633515) + _as32(seed) * np.int32(196314165)


def clz32(x):
    """silk_CLZ32 on uint32-reinterpreted values (32 for 0)."""
    v = jnp.asarray(x).astype(_u32)
    n = jnp.zeros(v.shape, _i32)
    for s in (16, 8, 4, 2, 1):
        big = v >= (_u32(1) << s)
        n = n + jnp.where(big, s, 0)
        v = jnp.where(big, v >> s, v)
    return jnp.where(jnp.asarray(x).astype(_u32) == 0, 32, 31 - n)


def smmul(a, b):
    """silk_SMMUL: ((int64)a * b) >> 32, via 16-bit limb mulhi."""
    ah, al = _split(a)
    bh, bl = _split(b)
    lo = (al.astype(_u32) * bl.astype(_u32))
    t = ah * bl + (lo >> 16).astype(_i32)          # fits int32
    t2 = al * bh + jnp.bitwise_and(t, 0xFFFF)      # fits int32
    return ah * bh + (t >> 16) + (t2 >> 16)


def _div32_16_trunc(a, b):
    """C-style truncating int32 division (silk_DIV32_16)."""
    import jax
    return jax.lax.div(_as32(a), _as32(b))


def _lshift_sat32_var(a, shift):
    """LSHIFT_SAT32 with per-element shift amounts."""
    a = _as32(a)
    shift = _as32(shift)
    lo = INT32_MIN >> shift
    hi = INT32_MAX >> shift
    return jnp.clip(a, lo, hi) << shift


def div32_varq(a32, b32, qres: int):
    """silk_DIV32_varQ (Inlines.h:97-140), elementwise; b32 != 0."""
    a32 = _as32(a32)
    b32 = _as32(b32)
    a_headrm = clz32(jnp.abs(a32)) - 1
    a_nrm = wrap32(a32 << a_headrm)
    b_headrm = clz32(jnp.abs(b32)) - 1
    b_nrm = wrap32(b32 << b_headrm)
    b_inv = _div32_16_trunc(INT32_MAX >> 2, b_nrm >> 16)
    result = smulwb(a_nrm, b_inv)
    a_nrm = wrap32(a_nrm - wrap32(smmul(b_nrm, result) << 3))
    result = smlawb(result, a_nrm, b_inv)
    lshift = 29 + a_headrm - b_headrm - qres
    neg = _lshift_sat32_var(result, jnp.maximum(-lshift, 0))
    pos = result >> jnp.clip(lshift, 0, 31)
    return jnp.where(lshift < 0, neg,
                     jnp.where(lshift < 32, pos, 0))


def add_pos_sat32(a, b):
    """silk_ADD_POS_SAT32: INT32_MAX whenever the wrapped sum's sign
    bit is set."""
    s = wrap32(_as32(a) + _as32(b))
    return jnp.where(s < 0, INT32_MAX, s)


def log2lin(in_log_q7):
    """silk_log2lin (log2lin.c:36-59), elementwise."""
    x = _as32(in_log_q7)
    xe = jnp.clip(x >> 7, 0, 30)
    out = _as32(1) << xe
    frac = jnp.bitwise_and(x, 0x7F)
    corr = smlawb(frac, smulbb(frac, 128 - frac), -174)
    small = out + ((out * corr) >> 7)
    big = wrap32(out + (out >> 7) * corr)
    r = jnp.where(x < 2048, small, big)
    return jnp.where(x < 0, 0,
                     jnp.where(x >= 3967, INT32_MAX, r))


def lin2log(in_lin):
    """silk_lin2log (lin2log.c), elementwise; in_lin > 0."""
    x = _as32(in_lin)
    lz = clz32(x)
    rot = jnp.bitwise_and(24 - lz, 31).astype(_u32)
    xu = x.astype(_u32)
    frac = jnp.bitwise_and(
        ((xu >> rot) | (xu << ((_u32(32) - rot)
                               & _u32(31)))).astype(_i32), 0x7F)
    frac = jnp.where(lz == 24, jnp.bitwise_and(x, 0x7F), frac)
    return smlawb(frac, frac * (128 - frac), 179) + ((31 - lz) << 7)
