"""DRED latent entropy coding — the packet format for deep redundancy.

Re-implements opus/dnn/dred_coding.c, the coding halves of
dred_encoder.c (dred_encode_latents/dred_encode_silk_frame:224-361) and
dred_decoder.c (dred_decode_latents/dred_ec_decode:40-129), plus the
ec_laplace_encode_p0/decode_p0 pair from celt/laplace.c:102-159.

Header: q0 (uint 16), dQ (uint 8), offset (1-bit escape + uint), qmax
(folded binary+uint symbol when q0 < 14 and dQ > 0); then the Laplace-
coded initial state followed by latent vectors at decreasing quality
levels q(i) = q0 + (dQ_table[dQ]*i + 8)/16 clamped to qmax.

Quantisation stats (scale/dead-zone/decay r/p0, all Q8 per level) are
model data (dred_rdovae_stats_data, shipped with the weight blob); here
they are a :class:`DredStats` parameter so converted models supply
their own.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..bitstream.range_coder import RangeDecoder, RangeEncoder

DQ_TABLE = (0, 2, 3, 4, 6, 8, 12, 16)     # dred_coding.c:40

DRED_EXTENSION_ID = 126                    # dred_config.h:32
DRED_EXPERIMENTAL_EXTENSION_ID = 127
DRED_EXPERIMENTAL_VERSION = 10
DRED_MIN_BYTES = 8
DRED_MAX_DATA_SIZE = 1000
DRED_ENC_Q0 = 6
DRED_ENC_Q1 = 15
DRED_MAX_LATENTS = 26                      # dred_config.h:50
DRED_NUM_REDUNDANCY_FRAMES = 2 * DRED_MAX_LATENTS


def compute_quantizer(q0: int, dQ: int, qmax: int, i: int) -> int:
    """dred_coding.c:38-44."""
    quant = q0 + (DQ_TABLE[dQ] * i + 8) // 16
    return qmax if quant > qmax else quant


# ----------------------------------------------------------------------
# Laplace with explicit p0 (celt/laplace.c:102-159)

def _decay_icdf(decay: int) -> list:
    icdf = [max(7, decay)]
    for i in range(1, 7):
        icdf.append(max(7 - i, (icdf[i - 1] * decay) >> 15))
    icdf.append(0)
    return icdf


def ec_laplace_encode_p0(enc: RangeEncoder, value: int, p0: int,
                         decay: int) -> None:
    sign_icdf = (32768 - p0, (32768 - p0) // 2, 0)
    s = 0 if value == 0 else (1 if value > 0 else 2)
    enc.enc_icdf(s, sign_icdf, 15)
    value = abs(value)
    if value:
        icdf = _decay_icdf(decay)
        value -= 1
        while True:
            enc.enc_icdf(min(value, 7), icdf, 15)
            value -= 7
            if value < 0:
                break


def ec_laplace_decode_p0(dec: RangeDecoder, p0: int, decay: int) -> int:
    sign_icdf = (32768 - p0, (32768 - p0) // 2, 0)
    s = dec.dec_icdf(sign_icdf, 15)
    if s == 2:
        s = -1
    if s == 0:
        return 0
    icdf = _decay_icdf(decay)
    value = 1
    while True:
        v = dec.dec_icdf(icdf, 15)
        value += v
        if v != 7:
            break
    return s * value


# ----------------------------------------------------------------------

@dataclass
class DredStats:
    """Per-quality-level quantisation stats (16 levels x dim, Q8):
    dred_rdovae_stats_data arrays.  Shapes [16, dim] uint8."""
    latent_scale: np.ndarray
    latent_dead_zone: np.ndarray
    latent_r: np.ndarray
    latent_p0: np.ndarray
    state_scale: np.ndarray
    state_dead_zone: np.ndarray
    state_r: np.ndarray
    state_p0: np.ndarray

    @classmethod
    def default(cls, latent_dim: int, state_dim: int) -> "DredStats":
        """Reasonable synthetic stats for models without shipped tables:
        uniform scale 64 (Q8 -> 0.25), no dead zone, mid decay."""
        def t(v, d):
            return np.full((16, d), v, np.uint8)
        return cls(t(64, latent_dim), t(0, latent_dim), t(80, latent_dim),
                   t(160, latent_dim),
                   t(64, state_dim), t(0, state_dim), t(80, state_dim),
                   t(160, state_dim))


def quantize_latents(x: np.ndarray, scale: np.ndarray, dzone: np.ndarray
                     ) -> np.ndarray:
    """The dead-zone quantiser (dred_encoder.c:224-246): q =
    round(x*scale/256 - delta*tanh(x*scale/256 / (delta+eps)))."""
    eps = 0.1
    delta = dzone.astype(np.float32) / 256.0
    xq = np.asarray(x, np.float32) * scale.astype(np.float32) / 256.0
    xq = xq - delta * np.tanh(xq / (delta + eps))
    return np.floor(0.5 + xq).astype(np.int32)


def _encode_latents(enc: RangeEncoder, x: np.ndarray, scale, dzone, r, p0
                    ) -> None:
    q = quantize_latents(x, scale, dzone)
    for i in range(len(q)):
        if r[i] == 0 or p0[i] == 255:
            continue                       # "impossible" dims: q forced 0
        ec_laplace_encode_p0(enc, int(q[i]), int(p0[i]) << 7,
                             int(r[i]) << 7)


def _decode_latents(dec: RangeDecoder, scale, r, p0, dim: int) -> np.ndarray:
    """dred_decoder.c:40-48: x = q*256/scale (scale 0 -> 1)."""
    x = np.zeros(dim, np.float32)
    for i in range(dim):
        if r[i] == 0 or p0[i] == 255:
            q = 0
        else:
            q = ec_laplace_decode_p0(dec, int(p0[i]) << 7, int(r[i]) << 7)
        s = int(scale[i])
        x[i] = q * 256.0 / (s if s != 0 else 1)
    return x


def dred_encode(state: np.ndarray, latents: np.ndarray, stats: DredStats,
                q0: int, dQ: int, qmax: int, max_bytes: int,
                dred_offset: int = 16,
                max_chunks: Optional[int] = None) -> bytes:
    """Entropy-code a DRED payload (dred_encode_silk_frame,
    dred_encoder.c:260-361, without the voice-activity trimming — the
    caller selects which latents to send).

    latents: [n, latent_dim], newest first (the reference stores its
    latents buffer newest-first).  Returns b"" when nothing fits.
    """
    latents = np.atleast_2d(np.asarray(latents, np.float32))
    n = len(latents)
    if max_chunks is None:
        max_chunks = n
    enc = RangeEncoder(max_bytes)
    enc.enc_uint(q0, 16)
    enc.enc_uint(dQ, 8)
    total_offset = 16 - dred_offset
    assert total_offset >= 0
    if total_offset > 31:
        enc.enc_uint(1, 2)
        enc.enc_uint(total_offset >> 5, 256)
        enc.enc_uint(total_offset & 31, 32)
    else:
        enc.enc_uint(0, 2)
        enc.enc_uint(total_offset, 32)
    if q0 < 14 and dQ > 0:
        nvals = 15 - (q0 + 1)
        if qmax >= 15:
            enc.encode(0, nvals, 2 * nvals)
        else:
            enc.encode(nvals + qmax - (q0 + 1), nvals + qmax - q0,
                       2 * nvals)
    off = q0
    _encode_latents(enc, state, stats.state_scale[off],
                    stats.state_dead_zone[off], stats.state_r[off],
                    stats.state_p0[off])
    if enc.tell() > 8 * max_bytes:
        return b""
    bak = enc.save()
    encoded = 0
    # Every other latent is coded (40 ms stride — each decoded qframe
    # spans 4 feature frames): dred_encoder.c:317 steps i by 2 over the
    # 20 ms-spaced latents buffer.
    for i in range(0, min(2 * max_chunks, n - 1), 2):
        q = compute_quantizer(q0, dQ, qmax, i // 2)
        _encode_latents(enc, latents[i], stats.latent_scale[q],
                        stats.latent_dead_zone[q], stats.latent_r[q],
                        stats.latent_p0[q])
        if enc.tell() > 8 * max_bytes:
            if i == 0:
                return b""
            break
        bak = enc.save()
        encoded = i + 2
    if encoded == 0:
        return b""
    enc.restore(bak)
    nbytes = (enc.tell() + 7) // 8
    enc.shrink(nbytes)
    enc.done()
    return enc.data()[:nbytes]


def dred_decode(data: bytes, stats: DredStats, latent_dim: int,
                state_dim: int, min_feature_frames: int = 100,
                dred_frame_offset: int = 0
                ) -> Tuple[np.ndarray, np.ndarray, int]:
    """dred_ec_decode (dred_decoder.c:51-129).

    Returns (state [state_dim], latents [nb, latent_dim], dred_offset).
    """
    dec = RangeDecoder(data)
    q0 = dec.dec_uint(16)
    dQ = dec.dec_uint(8)
    extra = 32 * dec.dec_uint(256) if dec.dec_uint(2) else 0
    dred_offset = 16 - dec.dec_uint(32) - extra + dred_frame_offset
    qmax = 15
    if q0 < 14 and dQ > 0:
        nvals = 15 - (q0 + 1)
        ft = 2 * nvals
        s = dec.decode(ft)
        if s >= nvals:
            qmax = q0 + (s - nvals) + 1
            dec.update(s, s + 1, ft)
        else:
            dec.update(0, nvals, ft)
    state = _decode_latents(dec, stats.state_scale[q0], stats.state_r[q0],
                            stats.state_p0[q0], state_dim)
    out: List[np.ndarray] = []
    i = 0
    while i < min(DRED_NUM_REDUNDANCY_FRAMES, (min_feature_frames + 1) // 2):
        if 8 * len(data) - dec.tell() <= 7:
            break
        q = compute_quantizer(q0, dQ, qmax, i // 2)
        out.append(_decode_latents(dec, stats.latent_scale[q],
                                   stats.latent_r[q], stats.latent_p0[q],
                                   latent_dim))
        i += 2
    latents = (np.stack(out) if out
               else np.zeros((0, latent_dim), np.float32))
    return state, latents, dred_offset
