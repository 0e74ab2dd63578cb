"""Laplace-distributed symbol coding for coarse energy residuals.

Behavioural parity: /root/reference/opus/celt/laplace.c (RFC 6716 §4.3.2.1).
Used by the CELT coarse-energy quantiser: the residual after 2-D prediction is
coded with a Laplace model whose `fs`/`decay` parameters come from the
per-(LM, intra) probability tables in ``opus_codec_tpu.celt.tables``.

The matching *batched* bit-usage model (how many 1/8th bits a given value
costs) lives in the CELT planning pass; this module is the serial ground
truth on the host lane.
"""

from __future__ import annotations

from .range_coder import RangeDecoder, RangeEncoder

__all__ = ["laplace_encode", "laplace_decode"]

_LOG_MINP = 0
_MINP = 1 << _LOG_MINP
_NMIN = 16


def _freq1(fs0: int, decay: int) -> int:
    ft = 32768 - _MINP * (2 * _NMIN) - fs0
    return (ft * (16384 - decay)) >> 15


def laplace_encode(enc: RangeEncoder, value: int, fs: int, decay: int) -> int:
    """Encode ``value``; returns the (possibly saturated) value actually coded."""
    val = value
    fl = 0
    if val:
        s = -1 if val < 0 else 0
        val = (val + s) ^ s  # abs
        fl = fs
        fs = _freq1(fs, decay)
        i = 1
        while fs > 0 and i < val:
            fs *= 2
            fl += fs + 2 * _MINP
            fs = (fs * decay) >> 15
            i += 1
        if not fs:
            ndi_max = (32768 - fl + _MINP - 1) >> _LOG_MINP
            ndi_max = (ndi_max - s) >> 1
            di = min(val - i, ndi_max - 1)
            fl += (2 * di + 1 + s) * _MINP
            fs = min(_MINP, 32768 - fl)
            value = (i + di + s) ^ s
        else:
            fs += _MINP
            fl += fs & ~s
        assert fl + fs <= 32768
        assert fs > 0
    enc.encode_bin(fl, fl + fs, 15)
    return value


def laplace_decode(dec: RangeDecoder, fs: int, decay: int) -> int:
    val = 0
    fm = dec.decode_bin(15)
    fl = 0
    if fm >= fs:
        val += 1
        fl = fs
        fs = _freq1(fs, decay) + _MINP
        while fs > _MINP and fm >= fl + 2 * fs:
            fs *= 2
            fl += fs
            fs = ((fs - 2 * _MINP) * decay) >> 15
            fs += _MINP
            val += 1
        if fs <= _MINP:
            di = (fm - fl) >> (_LOG_MINP + 1)
            val += di
            fl += 2 * di * _MINP
        if fm < fl + fs:
            val = -val
        else:
            fl += fs
    dec.update(fl, min(fl + fs, 32768), 32768)
    return val
