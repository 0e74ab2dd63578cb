"""SILK fixed-point arithmetic primitives.

Behavioural parity: /root/reference/opus/silk/macros.h (OPUS_FAST_INT64
variants) and SigProc_FIX.h / Inlines.h. SILK's decoder is defined in exact
integer arithmetic; these helpers reproduce it with Python ints (arbitrary
precision) plus explicit int32 wrapping where the reference wraps.

The batched TPU lane reimplements the hot loops in int32 jnp; this module is
the scalar ground truth.
"""

from __future__ import annotations

__all__ = [
    "i32", "sat16", "SMULWB", "SMLAWB", "SMULWT", "SMLAWT", "SMULBB",
    "SMLABB", "SMULBT", "SMULWW", "SMLAWW", "SMULTT", "SMMUL",
    "RSHIFT_ROUND", "ADD_SAT32", "SUB_SAT32", "ADD_SAT16", "LSHIFT_SAT32",
    "CLZ32", "SQRT_APPROX", "RAND", "DIV32", "DIV32_16", "INVERSE32_varQ",
    "DIV32_varQ", "LIMIT", "log2lin", "lin2log", "sum_sqr_shift",
]

_M32 = 0xFFFFFFFF
INT32_MAX = 0x7FFFFFFF
INT32_MIN = -0x80000000
INT16_MAX = 0x7FFF
INT16_MIN = -0x8000


def i32(x: int) -> int:
    """Wrap to signed 32-bit."""
    x &= _M32
    return x - 0x100000000 if x & 0x80000000 else x


def _sext16(x: int) -> int:
    x &= 0xFFFF
    return x - 0x10000 if x & 0x8000 else x


def sat16(x: int) -> int:
    return INT16_MAX if x > INT16_MAX else (INT16_MIN if x < INT16_MIN else x)


def SMULWB(a: int, b: int) -> int:
    return i32((a * _sext16(b)) >> 16)


def SMLAWB(a: int, b: int, c: int) -> int:
    return i32(a + ((b * _sext16(c)) >> 16))


def SMULWT(a: int, b: int) -> int:
    return i32((a * (b >> 16)) >> 16)


def SMLAWT(a: int, b: int, c: int) -> int:
    return i32(a + ((b * (c >> 16)) >> 16))


def SMULBB(a: int, b: int) -> int:
    return i32(_sext16(a) * _sext16(b))


def SMLABB(a: int, b: int, c: int) -> int:
    return i32(a + _sext16(b) * _sext16(c))


def SMULBT(a: int, b: int) -> int:
    return i32(_sext16(a) * (b >> 16))


def SMULWW(a: int, b: int) -> int:
    return i32((a * b) >> 16)


def SMLAWW(a: int, b: int, c: int) -> int:
    return i32(a + ((b * c) >> 16))


def SMULTT(a: int, b: int) -> int:
    return i32((a >> 16) * (b >> 16))


def SMMUL(a: int, b: int) -> int:
    return i32((a * b) >> 32)


def RSHIFT_ROUND(a: int, shift: int) -> int:
    if shift == 1:
        return (a >> 1) + (a & 1)
    return ((a >> (shift - 1)) + 1) >> 1


def ADD_SAT32(a: int, b: int) -> int:
    s = a + b
    return INT32_MAX if s > INT32_MAX else (INT32_MIN if s < INT32_MIN else s)


def SUB_SAT32(a: int, b: int) -> int:
    s = a - b
    return INT32_MAX if s > INT32_MAX else (INT32_MIN if s < INT32_MIN else s)


def ADD_SAT16(a: int, b: int) -> int:
    return sat16(a + b)


def LSHIFT_SAT32(a: int, shift: int) -> int:
    lo = INT32_MIN >> shift
    hi = INT32_MAX >> shift
    a = LIMIT(a, lo, hi)
    return i32(a << shift)


def LIMIT(a, lo, hi):
    return lo if a < lo else (hi if a > hi else a)


def CLZ32(x) -> int:
    x = int(x)
    x &= _M32
    if x == 0:
        return 32
    return 32 - x.bit_length()


def _ROR32(a: int, rot: int) -> int:
    a &= _M32
    if rot == 0:
        return i32(a)
    if rot < 0:
        m = -rot
        return i32(((a << m) | (a >> (32 - m))) & _M32)
    return i32(((a >> rot) | (a << (32 - rot))) & _M32)


def _CLZ_FRAC(x: int):
    lz = CLZ32(x)
    frac = _ROR32(x, 24 - lz) & 0x7F
    return lz, frac


def SQRT_APPROX(x: int) -> int:
    """Inlines.h silk_SQRT_APPROX."""
    if x <= 0:
        return 0
    lz, frac = _CLZ_FRAC(x)
    y = 32768 if (lz & 1) else 46214
    y >>= lz >> 1
    y = SMLAWB(y, y, SMULBB(213, frac))
    return y


def RAND(seed: int) -> int:
    """SigProc_FIX.h:599-601 (MLA with int32 overflow wrap)."""
    return i32(907633515 + seed * 196314165)


def DIV32(a: int, b: int) -> int:
    """C integer division truncates toward zero."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


DIV32_16 = DIV32


def DIV32_varQ(a32: int, b32: int, Qres: int) -> int:
    """Inlines.h:97-140."""
    a_headrm = CLZ32(abs(a32)) - 1
    a32_nrm = i32(a32 << a_headrm)
    b_headrm = CLZ32(abs(b32)) - 1
    b32_nrm = i32(b32 << b_headrm)
    b32_inv = DIV32_16(INT32_MAX >> 2, b32_nrm >> 16)
    result = SMULWB(a32_nrm, b32_inv)
    a32_nrm = i32(a32_nrm - i32(SMMUL(b32_nrm, result) << 3))
    result = SMLAWB(result, a32_nrm, b32_inv)
    lshift = 29 + a_headrm - b_headrm - Qres
    if lshift < 0:
        return LSHIFT_SAT32(result, -lshift)
    if lshift < 32:
        return i32(result >> lshift)
    return 0


def INVERSE32_varQ(b32: int, Qres: int) -> int:
    """Inlines.h:143-176."""
    b_headrm = CLZ32(abs(b32)) - 1
    b32_nrm = i32(b32 << b_headrm)
    b32_inv = DIV32_16(INT32_MAX >> 2, b32_nrm >> 16)
    result = i32(b32_inv << 16)
    err_Q32 = i32(((1 << 29) - SMULWB(b32_nrm, b32_inv)) << 3)
    result = SMLAWW(result, err_Q32, b32_inv)
    lshift = 61 - b_headrm - Qres
    if lshift <= 0:
        return LSHIFT_SAT32(result, -lshift)
    if lshift < 32:
        return i32(result >> lshift)
    return 0


def log2lin(inLog_Q7: int) -> int:
    """log2lin.c:36-59."""
    if inLog_Q7 < 0:
        return 0
    if inLog_Q7 >= 3967:
        return INT32_MAX
    out = 1 << (inLog_Q7 >> 7)
    frac_Q7 = inLog_Q7 & 0x7F
    if inLog_Q7 < 2048:
        out = out + ((out * SMLAWB(frac_Q7, SMULBB(frac_Q7, 128 - frac_Q7),
                                   -174)) >> 7)
    else:
        out = i32(out + (out >> 7) * SMLAWB(frac_Q7,
                                            SMULBB(frac_Q7, 128 - frac_Q7),
                                            -174))
    return i32(out)


def lin2log(inLin: int) -> int:
    """lin2log.c."""
    lz, frac_Q7 = _CLZ_FRAC(inLin)
    return i32(SMLAWB(frac_Q7, frac_Q7 * (128 - frac_Q7), 179)
               + ((31 - lz) << 7))


def sum_sqr_shift(x, length: int):
    """sum_sqr_shift.c — returns (energy, shift)."""
    shft = 31 - CLZ32(length)
    nrg = length
    i = 0
    while i < length - 1:
        nrg_tmp = (SMULBB(x[i], x[i]) + SMULBB(x[i + 1], x[i + 1])) \
            & 0xFFFFFFFF
        nrg = i32((nrg + (nrg_tmp >> shft)) & 0xFFFFFFFF)
        i += 2
    if i < length:
        nrg_tmp = SMULBB(x[i], x[i]) & 0xFFFFFFFF
        nrg = i32((nrg + (nrg_tmp >> shft)) & 0xFFFFFFFF)
    shft = max(0, shft + 3 - CLZ32(nrg))
    nrg = 0
    i = 0
    while i < length - 1:
        nrg_tmp = (SMULBB(x[i], x[i]) + SMULBB(x[i + 1], x[i + 1])) \
            & 0xFFFFFFFF
        nrg = i32((nrg + (nrg_tmp >> shft)) & 0xFFFFFFFF)
        i += 2
    if i < length:
        nrg_tmp = SMULBB(x[i], x[i]) & 0xFFFFFFFF
        nrg = i32((nrg + (nrg_tmp >> shft)) & 0xFFFFFFFF)
    return nrg, shft
