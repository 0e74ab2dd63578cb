"""CELT MDCT: forward (analysis) and backward-half (synthesis) transforms.

Behavioural parity: /root/reference/opus/celt/mdct.c (clt_mdct_forward_c
:119, clt_mdct_backward_c :242). The reference implements the MDCT as a
fold + pre-rotation + N/4 complex FFT + post-rotation with twiddles
cos(2π(i+1/8)/N); we reproduce the identical index/twiddle structure but
vectorized over a leading batch axis, with the FFT delegated to numpy/XLA.

TPU note: these functions are pure array programs — the same code runs under
``jax.numpy`` (pass ``xp=jnp``) inside jit, where XLA maps the FFT and the
gathers onto fused device code. The batched decoder path calls them with
shape [B*blocks, N2].

Synthesis overlap contract (see celt_decoder.c:1077-1080, 1265-1267 and the
TDAC mirror mdct.c:324-341): ``imdct_half`` produces N2 "raw" samples per
block; blocks are laid out at stride N2 after ov/2 carried-over raw samples
from the previous frame, and ``tdac_mirror`` applies the windowed crossfade
on each block boundary. The final ov/2 raw samples are carried to the next
frame.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import numpy as np

__all__ = ["mdct_trig", "mdct_forward", "imdct_half", "tdac_mirror",
           "imdct_frame"]


@lru_cache(maxsize=None)
def mdct_trig(n_mdct: int) -> Tuple[np.ndarray, np.ndarray]:
    """(cosθ, −sinθ) twiddles, θ_i = 2π(i+1/8)/N (mdct.c:97-99)."""
    n4 = n_mdct >> 2
    theta = 2.0 * math.pi * (np.arange(n4) + 0.125) / n_mdct
    return np.cos(theta), -np.sin(theta)


def mdct_forward(x: np.ndarray, window: np.ndarray, xp=np) -> np.ndarray:
    """Forward MDCT of one block.

    x: [..., N2 + overlap] time samples; returns [..., N2] coefficients.
    Matches clt_mdct_forward_c with stride handled by the caller
    (coefficients returned contiguous; interleaving across short blocks is a
    reshape at the call site).
    """
    overlap = window.shape[-1]
    n2 = x.shape[-1] - overlap
    n4 = n2 >> 1
    n_mdct = 2 * n2
    t0, t1 = mdct_trig(n_mdct)
    ov2 = overlap >> 1
    ov4 = (overlap + 3) >> 2

    i = np.arange(n4)
    # Fold (mdct.c:151-190): three index regimes.
    xp1_idx = ov2 + 2 * i                 # *xp1
    xp2_idx = ov2 + n2 - 1 - 2 * i        # *xp2
    re = xp.empty(x.shape[:-1] + (n4,), dtype=x.dtype) if xp is np else None

    # Region A: i < ov4
    a = np.arange(ov4)
    w1a = window[ov2 + 2 * a]
    w2a = window[ov2 - 1 - 2 * a]
    re_a = w2a * x[..., ov2 + 2 * a + n2] + w1a * x[..., ov2 + n2 - 1 - 2 * a]
    im_a = w1a * x[..., ov2 + 2 * a] - w2a * x[..., ov2 - 1 - 2 * a]
    # Region B: ov4 <= i < n4 - ov4 (no window)
    b = np.arange(ov4, n4 - ov4)
    re_b = x[..., ov2 + n2 - 1 - 2 * b]
    im_b = x[..., ov2 + 2 * b]
    # Region C: n4 - ov4 <= i < n4
    c = np.arange(n4 - ov4, n4)
    jj = c - (n4 - ov4)
    w1c = window[2 * jj]
    w2c = window[overlap - 1 - 2 * jj]
    re_c = -w1c * x[..., ov2 + 2 * c - n2] + w2c * x[..., ov2 + n2 - 1 - 2 * c]
    im_c = w2c * x[..., ov2 + 2 * c] + w1c * x[..., ov2 + 2 * n2 - 1 - 2 * c]

    re = xp.concatenate([re_a, re_b, re_c], axis=-1)
    im = xp.concatenate([im_a, im_b, im_c], axis=-1)

    # Pre-rotation by e^{-jθ}, scaled 1/N4 (mdct.c:191-212; float scale).
    scale = 1.0 / n4
    z = (re + 1j * im) * (t0 + 1j * t1) * scale
    F = xp.fft.fft(z, axis=-1)

    # Post-rotation (mdct.c:217-236).
    yr = F.imag * t1 - F.real * t0
    yi = F.real * t1 + F.imag * t0
    out = xp.empty(x.shape[:-1] + (n2,), dtype=yr.dtype) if xp is np else None
    if xp is np:
        out[..., 0::2] = yr
        out[..., 1::2] = yi[..., ::-1]
        return out
    # jax path: build by scatter-free interleave
    out = xp.stack([yr, yi[..., ::-1]], axis=-1).reshape(x.shape[:-1] + (n2,))
    return out


def imdct_half(spec: np.ndarray, xp=np) -> np.ndarray:
    """Backward MDCT producing N2 raw (pre-mirror) samples.

    spec: [..., N2] coefficients (contiguous; caller de-interleaves short
    blocks). Matches mdct.c:242-322 without the final TDAC mirror.
    """
    n2 = spec.shape[-1]
    n4 = n2 >> 1
    t0, t1 = mdct_trig(2 * n2)

    xp1 = spec[..., 0::2]                    # spec[2i]
    xp2 = spec[..., ::-1][..., 0::2]         # spec[N2-1-2i]
    # Pre-rotate (mdct.c:260-282): z = conj swap trick -> complex FFT input.
    yr = xp2 * t0 + xp1 * t1
    yi = xp1 * t0 - xp2 * t1
    c_in = yi + 1j * yr                      # real slot = yi, imag slot = yr
    F = xp.fft.fft(c_in, axis=-1)

    # Post-rotate (mdct.c:286-322): re=Im(F), im=Re(F).
    re, im = F.imag, F.real
    out_even = re * t0 + im * t1             # -> r[2i]
    out_odd = re * t1 - im * t0              # -> r[N2-1-2i]
    r = xp.stack([out_even, out_odd[..., ::-1]], axis=-1)
    return r.reshape(spec.shape[:-1] + (n2,))


def tdac_mirror(buf: np.ndarray, window: np.ndarray, starts, xp=np):
    """Apply the TDAC windowed crossfade (mdct.c:324-341) in place at each
    block boundary offset in ``starts``.

    buf: [..., L] raw sample layout (prev-tail + blocks at stride N2).
    Returns the updated buffer (functional for the jax path).
    """
    overlap = window.shape[-1]
    ov2 = overlap >> 1
    i = np.arange(ov2)
    w1 = window[i]
    w2 = window[overlap - 1 - i]
    for s in starts:
        x2 = buf[..., s + i]
        x1 = buf[..., s + overlap - 1 - i]
        lo = w2 * x2 - w1 * x1
        hi = w1 * x2 + w2 * x1
        if xp is np:
            buf[..., s + i] = lo
            buf[..., s + overlap - 1 - i] = hi
        else:
            buf = buf.at[..., s + i].set(lo)
            buf = buf.at[..., s + overlap - 1 - i].set(hi)
    return buf


def imdct_frame(freq: np.ndarray, window: np.ndarray, n_blocks: int,
                prev_tail: np.ndarray, xp=np):
    """Full synthesis of one frame from interleaved MDCT spectra.

    freq: [..., N] frequency samples of the whole frame where short-block
    coefficients are interleaved with stride B (celt_synthesis layout).
    prev_tail: [..., ov/2] raw samples carried from the previous frame.
    Returns (time_frame [..., N], new_tail [..., ov/2]).
    """
    B = n_blocks
    N = freq.shape[-1]
    n2 = N // B
    overlap = window.shape[-1]
    ov2 = overlap >> 1
    # De-interleave: block b's spectrum is freq[b::B]
    spec = xp.stack([freq[..., b::B] for b in range(B)], axis=-2)  # [...,B,N2]
    raw = imdct_half(spec, xp=xp)                                  # [...,B,N2]
    flat = raw.reshape(raw.shape[:-2] + (B * n2,))
    buf = xp.concatenate([prev_tail, flat], axis=-1)               # [...,ov2+N]
    buf = tdac_mirror(buf, window, [b * n2 for b in range(B)], xp=xp)
    return buf[..., :N], buf[..., N:N + ov2]
