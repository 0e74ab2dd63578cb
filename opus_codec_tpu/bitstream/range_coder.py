"""Opus range coder (RFC 6716 §4.1) — host-side scalar implementation.

This is the entropy-coding substrate of the whole framework. Opus uses the
Pasco/Martin range coder with byte-wise renormalisation, carry buffering on the
encoder side, and a second "raw bits" stream written backwards from the end of
the buffer. The coder is an inherently serial byte-level state machine, so it
lives on the host lane; the TPU device computes *symbols* (see the planning
passes in ``opus_codec_tpu.celt``), and this module turns symbol streams into
bytes and back.

Behavioural parity: /root/reference/opus/celt/entenc.c, entdec.c, entcode.c,
mfrngcod.h (state machine + renormalisation semantics; constants are protocol
constants from RFC 6716).

Design notes (TPU framework):
  * All arithmetic is explicit 32-bit (masked Python ints). The implementation
    is deliberately allocation-free per symbol so it can be mechanically
    lowered to the C fast path in ``opus_codec_tpu/runtime`` (same state
    variables, same transitions).
  * ``tell``/``tell_frac`` implement the 1/8th-bit budget accounting that
    encoder-side decisions depend on (reference: entcode.c:69-84). The batched
    symbol planners replicate this accounting arithmetically; this class is
    the ground truth they are tested against.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

__all__ = [
    "RangeEncoder",
    "RangeDecoder",
    "ec_ilog",
    "BITRES",
]

_M32 = 0xFFFFFFFF

SYM_BITS = 8
CODE_BITS = 32
SYM_MAX = (1 << SYM_BITS) - 1
CODE_SHIFT = CODE_BITS - SYM_BITS - 1  # 23
CODE_TOP = 1 << (CODE_BITS - 1)
CODE_BOT = CODE_TOP >> SYM_BITS
CODE_EXTRA = (CODE_BITS - 2) % SYM_BITS + 1  # 7
WINDOW_SIZE = 32
UINT_BITS = 8
BITRES = 3

# 1/8th-bit tell correction thresholds (entcode.c:70-72; RFC 6716 accounting).
_TELL_CORRECTION = (35733, 38967, 42495, 46340, 50535, 55109, 60097, 65535)


def ec_ilog(v: int) -> int:
    """Index of the highest set bit, plus one; 0 for v==0 (entcode.c:41)."""
    return int(v).bit_length()


class _Coder:
    """State shared by encoder and decoder (entcode.h:62-91)."""

    __slots__ = (
        "buf", "storage", "end_offs", "end_window", "nend_bits",
        "nbits_total", "offs", "rng", "val", "ext", "rem", "error",
    )

    def tell(self) -> int:
        """Whole bits used so far; same value on both sides (entcode.h:111)."""
        return self.nbits_total - ec_ilog(self.rng)

    def tell_frac(self) -> int:
        """Bits used so far in 1/8th-bit units (entcode.c:69-84)."""
        nbits = self.nbits_total << BITRES
        l = ec_ilog(self.rng)
        r = self.rng >> (l - 16)
        b = (r >> 12) - 8
        b += 1 if r > _TELL_CORRECTION[b] else 0
        return nbits - ((l << 3) + b)

    def range_bytes(self) -> int:
        return self.offs

    def get_error(self) -> int:
        return self.error


class RangeEncoder(_Coder):
    """Range encoder over a fixed-size buffer.

    The buffer size is fixed up front because raw bits are written backwards
    from the end (entenc.c:66-70) and ``shrink`` moves that tail
    (entenc.c:248-253).
    """

    def __init__(self, size: int):
        self.buf = bytearray(size)
        self.storage = size
        self.end_offs = 0
        self.end_window = 0
        self.nend_bits = 0
        self.nbits_total = CODE_BITS + 1
        self.offs = 0
        self.rng = CODE_TOP
        self.rem = -1
        self.val = 0
        self.ext = 0
        self.error = 0

    # -- state snapshot (the reference copies the whole ec_enc struct,
    # e.g. dred_encoder.c:349 `ec_bak = ec_encoder`) ----------------------

    def save(self) -> tuple:
        return (bytes(self.buf), self.end_offs, self.end_window,
                self.nend_bits, self.nbits_total, self.offs, self.rng,
                self.rem, self.val, self.ext, self.error)

    def restore(self, state: tuple) -> None:
        (buf, self.end_offs, self.end_window, self.nend_bits,
         self.nbits_total, self.offs, self.rng, self.rem, self.val,
         self.ext, self.error) = state
        self.buf = bytearray(buf)

    # -- byte output ------------------------------------------------------

    def _write_byte(self, value: int) -> int:
        if self.offs + self.end_offs >= self.storage:
            return -1
        self.buf[self.offs] = value & 0xFF
        self.offs += 1
        return 0

    def _write_byte_at_end(self, value: int) -> int:
        if self.offs + self.end_offs >= self.storage:
            return -1
        self.end_offs += 1
        self.buf[self.storage - self.end_offs] = value & 0xFF
        return 0

    def _carry_out(self, c: int) -> None:
        # Carry propagation with buffered 0xFF run (entenc.c:82-99).
        if c != SYM_MAX:
            carry = c >> SYM_BITS
            if self.rem >= 0:
                self.error |= self._write_byte(self.rem + carry)
            if self.ext > 0:
                sym = (SYM_MAX + carry) & SYM_MAX
                while self.ext > 0:
                    self.error |= self._write_byte(sym)
                    self.ext -= 1
            self.rem = c & SYM_MAX
        else:
            self.ext += 1

    def _normalize(self) -> None:
        while self.rng <= CODE_BOT:
            self._carry_out(self.val >> CODE_SHIFT)
            self.val = (self.val << SYM_BITS) & (CODE_TOP - 1)
            self.rng = (self.rng << SYM_BITS) & _M32
            self.nbits_total += SYM_BITS

    # -- symbol coding ----------------------------------------------------

    def encode(self, fl: int, fh: int, ft: int) -> None:
        """Code a symbol with cumulative frequency interval [fl, fh) of ft."""
        r = self.rng // ft
        if fl > 0:
            self.val = (self.val + self.rng - r * (ft - fl)) & _M32
            self.rng = r * (fh - fl)
        else:
            self.rng -= r * (ft - fh)
        self._normalize()

    def encode_bin(self, fl: int, fh: int, bits: int) -> None:
        r = self.rng >> bits
        if fl > 0:
            self.val = (self.val + self.rng - r * ((1 << bits) - fl)) & _M32
            self.rng = r * (fh - fl)
        else:
            self.rng -= r * ((1 << bits) - fh)
        self._normalize()

    def enc_bit_logp(self, val: int, logp: int) -> None:
        """Code one bit with P(1) = 2**-logp (entenc.c:151-162)."""
        r = self.rng
        s = r >> logp
        r -= s
        if val:
            self.val = (self.val + r) & _M32
        self.rng = s if val else r
        self._normalize()

    def enc_icdf(self, s: int, icdf: Sequence[int], ftb: int) -> None:
        """Code symbol ``s`` with inverse-CDF table scaled by 2**ftb."""
        r = self.rng >> ftb
        if s > 0:
            hi = int(icdf[s - 1])
            self.val = (self.val + self.rng - r * hi) & _M32
            self.rng = r * (hi - int(icdf[s]))
        else:
            self.rng -= r * int(icdf[s])
        self._normalize()

    def enc_uint(self, fl: int, ft: int) -> None:
        """Code a uniformly distributed integer fl in [0, ft)."""
        assert ft > 1
        ft -= 1
        ftb = ec_ilog(ft)
        if ftb > UINT_BITS:
            ftb -= UINT_BITS
            ftop = (ft >> ftb) + 1
            fltop = fl >> ftb
            self.encode(fltop, fltop + 1, ftop)
            self.enc_bits(fl & ((1 << ftb) - 1), ftb)
        else:
            self.encode(fl, fl + 1, ft + 1)

    def enc_bits(self, fl: int, bits: int) -> None:
        """Append raw bits to the backwards stream (entenc.c:204-223)."""
        assert bits > 0
        window = self.end_window
        used = self.nend_bits
        if used + bits > WINDOW_SIZE:
            while used >= SYM_BITS:
                self.error |= self._write_byte_at_end(window & SYM_MAX)
                window >>= SYM_BITS
                used -= SYM_BITS
        window |= fl << used
        used += bits
        self.end_window = window
        self.nend_bits = used
        self.nbits_total += bits

    def patch_initial_bits(self, val: int, nbits: int) -> None:
        """Rewrite the first ``nbits`` of the stream (entenc.c:225-246)."""
        assert nbits <= SYM_BITS
        shift = SYM_BITS - nbits
        mask = ((1 << nbits) - 1) << shift
        if self.offs > 0:
            self.buf[0] = (self.buf[0] & ~mask) | (val << shift)
        elif self.rem >= 0:
            self.rem = (self.rem & ~mask) | (val << shift)
        elif self.rng <= (CODE_TOP >> nbits):
            self.val = ((self.val & ~(mask << CODE_SHIFT)) |
                        (val << (CODE_SHIFT + shift))) & _M32
        else:
            self.error = -1

    def shrink(self, size: int) -> None:
        """Reduce buffer to ``size`` bytes, moving the raw-bit tail."""
        assert self.offs + self.end_offs <= size
        if self.end_offs > 0:
            tail = self.buf[self.storage - self.end_offs:self.storage]
            self.buf[size - self.end_offs:size] = tail
        self.storage = size

    def done(self) -> None:
        """Flush final state (entenc.c:255-305)."""
        l = CODE_BITS - ec_ilog(self.rng)
        msk = (CODE_TOP - 1) >> l
        end = (self.val + msk) & ~msk & _M32
        if (end | msk) >= self.val + self.rng:
            l += 1
            msk >>= 1
            end = (self.val + msk) & ~msk & _M32
        while l > 0:
            self._carry_out(end >> CODE_SHIFT)
            end = (end << SYM_BITS) & (CODE_TOP - 1)
            l -= SYM_BITS
        if self.rem >= 0 or self.ext > 0:
            self._carry_out(0)
        window = self.end_window
        used = self.nend_bits
        while used >= SYM_BITS:
            self.error |= self._write_byte_at_end(window & SYM_MAX)
            window >>= SYM_BITS
            used -= SYM_BITS
        if not self.error:
            for i in range(self.offs, self.storage - self.end_offs):
                self.buf[i] = 0
            if used > 0:
                if self.end_offs >= self.storage:
                    self.error = -1
                else:
                    l = -l
                    if (self.offs + self.end_offs >= self.storage
                            and l < used):
                        window &= (1 << l) - 1
                        self.error = -1
                    self.buf[self.storage - self.end_offs - 1] |= window & 0xFF

    def data(self) -> bytes:
        """Finished packet bytes (call after ``done``)."""
        return bytes(self.buf[: self.storage])


class RangeDecoder(_Coder):
    """Range decoder mirroring :class:`RangeEncoder` (entdec.c)."""

    def __init__(self, data: Union[bytes, bytearray, memoryview]):
        self.buf = bytes(data)
        self.storage = len(self.buf)
        self.end_offs = 0
        self.end_window = 0
        self.nend_bits = 0
        self.nbits_total = (CODE_BITS + 1
                            - ((CODE_BITS - CODE_EXTRA) // SYM_BITS) * SYM_BITS)
        self.offs = 0
        self.rng = 1 << CODE_EXTRA
        self.rem = self._read_byte()
        self.val = self.rng - 1 - (self.rem >> (SYM_BITS - CODE_EXTRA))
        self.ext = 0
        self.error = 0
        self._normalize()

    def _read_byte(self) -> int:
        if self.offs < self.storage:
            b = self.buf[self.offs]
            self.offs += 1
            return b
        return 0

    def _read_byte_from_end(self) -> int:
        if self.end_offs < self.storage:
            self.end_offs += 1
            return self.buf[self.storage - self.end_offs]
        return 0

    def _normalize(self) -> None:
        while self.rng <= CODE_BOT:
            self.nbits_total += SYM_BITS
            self.rng = (self.rng << SYM_BITS) & _M32
            sym = self.rem
            self.rem = self._read_byte()
            sym = ((sym << SYM_BITS) | self.rem) >> (SYM_BITS - CODE_EXTRA)
            self.val = (((self.val << SYM_BITS) + (SYM_MAX & ~sym))
                        & (CODE_TOP - 1))

    # -- symbol decoding --------------------------------------------------

    def decode(self, ft: int) -> int:
        """Return the cumulative-frequency position of the next symbol."""
        self.ext = self.rng // ft
        s = self.val // self.ext
        return ft - min(s + 1, ft)

    def decode_bin(self, bits: int) -> int:
        self.ext = self.rng >> bits
        s = self.val // self.ext
        return (1 << bits) - min(s + 1, 1 << bits)

    def update(self, fl: int, fh: int, ft: int) -> None:
        s = self.ext * (ft - fh)
        self.val -= s
        self.rng = self.ext * (fh - fl) if fl > 0 else self.rng - s
        self._normalize()

    def dec_bit_logp(self, logp: int) -> int:
        r = self.rng
        d = self.val
        s = r >> logp
        ret = 1 if d < s else 0
        if not ret:
            self.val = d - s
        self.rng = s if ret else r - s
        self._normalize()
        return ret

    def dec_icdf(self, icdf: Sequence[int], ftb: int) -> int:
        s = self.rng
        d = self.val
        r = s >> ftb
        ret = -1
        while True:
            t = s
            ret += 1
            s = r * icdf[ret]
            if d >= s:
                break
        self.val = d - s
        self.rng = t - s
        self._normalize()
        return ret

    def dec_uint(self, ft: int) -> int:
        assert ft > 1
        ft -= 1
        ftb = ec_ilog(ft)
        if ftb > UINT_BITS:
            ftb -= UINT_BITS
            ftop = (ft >> ftb) + 1
            s = self.decode(ftop)
            self.update(s, s + 1, ftop)
            t = (s << ftb) | self.dec_bits(ftb)
            if t <= ft:
                return t
            self.error = 1
            return ft
        else:
            ft += 1
            s = self.decode(ft)
            self.update(s, s + 1, ft)
            return s

    def dec_bits(self, bits: int) -> int:
        window = self.end_window
        available = self.nend_bits
        if available < bits:
            while available <= WINDOW_SIZE - SYM_BITS:
                window |= self._read_byte_from_end() << available
                available += SYM_BITS
        ret = window & ((1 << bits) - 1)
        window >>= bits
        available -= bits
        self.end_window = window
        self.nend_bits = available
        self.nbits_total += bits
        return ret
