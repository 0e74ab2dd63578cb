"""Device range-coder packer — plans to packet bytes on the TPU.

Executes the per-stream symbol plans (``batch_coder`` rows) through an
exact port of the range encoder (entenc.c, mirrored from the validated
``bitstream.range_coder.RangeEncoder``) as one ``lax.scan`` over plan
rows, entirely on device.  This removes the symbol-plan transfer from
the encode path: only the finished packet bytes (~bitrate/400 per
stream per frame) and final ranges cross to the host, instead of the
~30x larger plan arrays.

The classic carry problem — a resolved carry must rewrite a run of
buffered 0xFF bytes of unbounded length — is handled with a deferred
fill: the scan writes only explicit bytes (scatter at the write
offset) plus a one-byte *run marker* at each run's start, and a single
log-depth prefix scan afterwards materialises the runs (every byte is
the last marker at or before it: explicit, 0xFF-run, 0x00-run, or the
zero fill).

Bit-exact vs RangeEncoder/ec_lane.c by construction and by test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .batch_coder import (OP_BITS, OP_BIT_LOGP, OP_ENCODE,
                          OP_ENCODE_BIN, ec_ilog)

_i32 = jnp.int32
_u32 = jnp.uint32

CODE_TOP = np.uint32(1 << 31)
CODE_BOT = np.uint32(1 << 23)
CODE_SHIFT = 23                 # CODE_BITS - SYM_BITS - 1
SYM_MAX = 255
M31 = np.uint32((1 << 31) - 1)

__all__ = ["pack_plan_device", "pack_plan_device_jit"]


def _put1(arr, mask, pos, val):
    """One-hot masked write: arr[b, pos[b]] = val[b] where mask.
    Elementwise (VPU-friendly) instead of a scatter, which TPUs
    serialize per row."""
    hit = mask[:, None] & (jnp.arange(arr.shape[1])[None, :]
                           == pos[:, None])
    return jnp.where(hit, val[:, None], arr)


def _carry_out(mask, c, S):
    """entenc.c:82-99 on vector state.  ``c`` int32 in [0, 511]."""
    (buf, tok, rem, ext, offs) = (S["buf"], S["tok"], S["rem"],
                                  S["ext"], S["offs"])
    is_ff = c == SYM_MAX
    res = mask & ~is_ff
    carry = c >> 8

    wrote = res & (rem >= 0)
    byte = jnp.bitwise_and(rem + carry, 0xFF)
    buf = _put1(buf, wrote, offs, byte)
    tok = _put1(tok, wrote, offs, jnp.full_like(offs, 3))
    offs = offs + wrote.astype(_i32)

    has_run = res & (ext > 0)
    tok = _put1(tok, has_run, offs, 1 + carry)
    offs = offs + jnp.where(has_run, ext, 0)

    ext = jnp.where(res, 0, ext + (mask & is_ff).astype(_i32))
    rem = jnp.where(res, jnp.bitwise_and(c, 0xFF), rem)
    S.update(buf=buf, tok=tok, rem=rem, ext=ext, offs=offs)


def _normalize(mask, S):
    for _ in range(3):
        cond = mask & (S["rng"] <= CODE_BOT)
        _carry_out(cond, (S["val"] >> CODE_SHIFT).astype(_i32), S)
        S["val"] = jnp.where(cond, (S["val"] << 8) & M31, S["val"])
        S["rng"] = jnp.where(cond, S["rng"] << 8, S["rng"])


def _write_at_end(mask, byte, S):
    end_offs = S["end_offs"] + mask.astype(_i32)
    pos = S["storage"] - end_offs
    buf = _put1(S["buf"], mask, pos, byte)
    tok = _put1(S["tok"], mask, pos, jnp.full_like(pos, 3))
    S.update(buf=buf, tok=tok, end_offs=end_offs)


def pack_plan_device(ops, storage, max_storage: int):
    """ops: [B, n, 4] int32 plan rows; storage: [B] per-stream byte
    budgets (<= max_storage).  Returns (bytes [B, max_storage] int32,
    rng [B] uint32 — the final range)."""
    B, n, _ = ops.shape

    S0 = dict(
        buf=jnp.zeros((B, max_storage), _i32),
        tok=jnp.zeros((B, max_storage), _i32),
        val=jnp.zeros((B,), _u32),
        rng=jnp.full((B,), CODE_TOP, _u32),
        rem=jnp.full((B,), -1, _i32),
        ext=jnp.zeros((B,), _i32),
        offs=jnp.zeros((B,), _i32),
        end_offs=jnp.zeros((B,), _i32),
        window=jnp.zeros((B,), _u32),
        nend=jnp.zeros((B,), _i32),
        storage=storage.astype(_i32),
    )

    def step(S, row):
        kind = row[:, 0]
        a = row[:, 1]
        b = row[:, 2]
        d = row[:, 3]
        live = kind >= 0

        # ---- ec_encode / ec_encode_bin (entenc.c:112-149)
        enc = live & (kind == OP_ENCODE)
        encb = live & (kind == OP_ENCODE_BIN)
        logp = live & (kind == OP_BIT_LOGP)
        any_sym = enc | encb | logp
        ftu = jnp.maximum(d, 1).astype(_u32)
        r_enc = S["rng"] // ftu
        r_bin = S["rng"] >> jnp.clip(d, 0, 31).astype(_u32)
        ft_bin = (jnp.int32(1) << jnp.clip(d, 0, 31))
        r = jnp.where(enc, r_enc, r_bin)
        ft_eff = jnp.where(enc, d, ft_bin)
        # fl > 0: val += rng - r*(ft - fl);  rng = r*(fh - fl)
        vadd = S["rng"] - r * (ft_eff - a).astype(_u32)
        rng_hi = r * (b - a).astype(_u32)
        rng_lo = S["rng"] - r * (ft_eff - b).astype(_u32)
        use_hi = a > 0
        sym = enc | encb
        val2 = jnp.where(sym & use_hi, S["val"] + vadd, S["val"])
        rng2 = jnp.where(sym, jnp.where(use_hi, rng_hi, rng_lo),
                         S["rng"])
        # ec_enc_bit_logp (entenc.c:151-162): a=bit, d=logp
        s_lp = S["rng"] >> jnp.clip(d, 0, 31).astype(_u32)
        r_lp = S["rng"] - s_lp
        val2 = jnp.where(logp & (a != 0), S["val"] + r_lp, val2)
        rng2 = jnp.where(logp, jnp.where(a != 0, s_lp, r_lp), rng2)
        S["val"] = val2
        S["rng"] = rng2
        _normalize(any_sym, S)

        # ---- ec_enc_bits (entenc.c:204-223): a=val, d=nbits
        bits = live & (kind == OP_BITS) & (d > 0)
        need = bits & (S["nend"] + d > 32)
        for _ in range(4):
            f = need & (S["nend"] >= 8)
            _write_at_end(f, jnp.bitwise_and(
                S["window"].astype(_i32), 0xFF), S)
            S["window"] = jnp.where(f, S["window"] >> 8, S["window"])
            S["nend"] = S["nend"] - 8 * f.astype(_i32)
        S["window"] = jnp.where(
            bits,
            S["window"] | (a.astype(_u32)
                           << jnp.clip(S["nend"], 0, 31).astype(_u32)),
            S["window"])
        S["nend"] = S["nend"] + jnp.where(bits, d, 0)
        return S, None

    S, _ = jax.lax.scan(step, S0, jnp.moveaxis(ops, 1, 0))

    # ---- ec_enc_done (entenc.c:255-305)
    on = jnp.ones((B,), bool)
    l = 32 - ec_ilog(S["rng"])
    msk = (M31 >> jnp.clip(l, 0, 31).astype(_u32))
    end = (S["val"] + msk) & ~msk
    over = (end | msk) >= S["val"] + S["rng"]
    l = l + over.astype(_i32)
    msk = jnp.where(over, msk >> 1, msk)
    end = jnp.where(over, (S["val"] + msk) & ~msk, end)
    for _ in range(2):
        go = on & (l > 0)
        _carry_out(go, (end >> CODE_SHIFT).astype(_i32), S)
        end = jnp.where(go, (end << 8) & M31, end)
        l = l - jnp.where(go, 8, 0)
    _carry_out(on & ((S["rem"] >= 0) | (S["ext"] > 0)),
               jnp.zeros((B,), _i32), S)
    for _ in range(4):
        f = on & (S["nend"] >= 8)
        _write_at_end(f, jnp.bitwise_and(S["window"].astype(_i32),
                                         0xFF), S)
        S["window"] = jnp.where(f, S["window"] >> 8, S["window"])
        S["nend"] = S["nend"] - 8 * f.astype(_i32)

    # ---- materialise runs + zero fill: last-marker prefix scan
    def comb(x, y):
        return jnp.where(y != 0, y, x)

    lasttok = jax.lax.associative_scan(comb, S["tok"], axis=1)
    out = jnp.where(lasttok == 3, S["buf"],
                    jnp.where(lasttok == 1, 0xFF,
                              jnp.where(lasttok == 2, 0x00, 0)))
    # trailing partial end-window bits OR into the last free byte
    # (entenc.c:297-303)
    pos = S["storage"] - S["end_offs"] - 1
    frag = jnp.bitwise_and(S["window"].astype(_i32), 0xFF)
    hit = (S["nend"] > 0)[:, None] \
        & (jnp.arange(max_storage)[None, :] == pos[:, None])
    out = jnp.where(hit, out | frag[:, None], out)
    return out, S["rng"]


pack_plan_device_jit = jax.jit(pack_plan_device,
                               static_argnames=("max_storage",))
