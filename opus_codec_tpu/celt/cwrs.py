"""PVQ codeword enumeration (CWRS): pulse vector ↔ index.

Behavioural parity: /root/reference/opus/celt/cwrs.c (RFC 6716 §4.3.4.2).

V(N, K) is the number of N-dim integer vectors with L1 norm K (signs on
non-zero entries); U(N, K) the standard helper. The reference carries large
precomputed u32 tables; we compute rows on demand with exact Python integers
and memoise — band splitting in the allocation guarantees every coded V(N,K)
fits in 32 bits, which we assert at the coding boundary.

The host packer uses these scalar routines; the batched device planner only
needs the *bit cost* table (pulse cache), built once in
``opus_codec_tpu.celt.modes``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Sequence, Tuple

from ..bitstream.range_coder import RangeDecoder, RangeEncoder, ec_ilog

__all__ = ["U", "V", "icwrs", "cwrsi", "encode_pulses", "decode_pulses",
           "log2_frac", "get_required_bits"]


@lru_cache(maxsize=None)
def U(n: int, k: int) -> int:
    """U(N,K) per cwrs.c:103-159; symmetric, exact integer."""
    if n < k:
        n, k = k, n  # symmetry keeps the cache small
    if k == 0:
        return 1 if n == 0 else 0
    if n == 0:
        return 0
    if n == 1:
        return 1
    # Row recurrence U(n,k) = ((2n-1)·U(n,k-1) − U(n,k-2))/(k-1) + U(n,k-2)
    if k == 1:
        return 1
    a = U(n, k - 1)
    b = U(n, k - 2)
    return ((2 * n - 1) * a - b) // (k - 1) + b


def V(n: int, k: int) -> int:
    """Number of PVQ codewords for N dims, K pulses (cwrs.c:197-199)."""
    return U(n, k) + U(n, k + 1)


def icwrs(y: Sequence[int]) -> int:
    """Pulse vector → codeword index (cwrs.c:440-456)."""
    n = len(y)
    assert n >= 2
    j = n - 1
    i = 1 if y[j] < 0 else 0
    k = abs(y[j])
    while j > 0:
        j -= 1
        i += U(n - j, k)
        k += abs(y[j])
        if y[j] < 0:
            i += U(n - j, k + 1)
    return i


def cwrsi(n: int, k: int, i: int) -> List[int]:
    """Codeword index → pulse vector (cwrs.c:605-630, SMALL_FOOTPRINT form)."""
    assert n > 0 and k > 0
    y = []
    ncur = n
    for _ in range(n):
        p = U(ncur, k + 1)
        s = i >= p
        if s:
            i -= p
        k0 = k
        p = U(ncur, k)
        while p > i:
            k -= 1
            p = U(ncur, k)
        i -= p
        val = k0 - k
        y.append(-val if s else val)
        ncur -= 1
    return y


def encode_pulses(enc: RangeEncoder, y: Sequence[int], n: int, k: int) -> None:
    """cwrs.c:458-461."""
    assert k > 0
    total = V(n, k)
    assert total <= 1 << 32, (n, k)
    enc.enc_uint(icwrs(y), total)


def decode_pulses(dec: RangeDecoder, n: int, k: int) -> List[int]:
    """cwrs.c:539-541."""
    total = V(n, k)
    assert total <= 1 << 32, (n, k)
    return cwrsi(n, k, dec.dec_uint(total))


def log2_frac(val: int, frac: int) -> int:
    """Conservative ceil log2 with ``frac`` fractional bits (cwrs.c:45-71)."""
    l = ec_ilog(val)
    if val & (val - 1):
        if l > 16:
            val = ((val - 1) >> (l - 16)) + 1
        else:
            val <<= 16 - l
        l = (l - 1) << frac
        while True:
            b = val >> 16
            l += b << frac
            val = (val + b) >> b
            val = (val * val + 0x7FFF) >> 15
            frac -= 1
            if frac < 0:
                break
        return l + (1 if val > 0x8000 else 0)
    return (l - 1) << frac


def get_required_bits(n: int, maxk: int, frac: int) -> List[int]:
    """Bit cost (in 1/2**frac units) of V(n,k) for k=0..maxk (cwrs.c:431-438)."""
    return [0] + [log2_frac(V(n, k), frac) for k in range(1, maxk + 1)]
