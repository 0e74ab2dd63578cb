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
fill: the scan writes only explicit bytes plus a one-byte *run marker*
at each run's start, and a single log-depth prefix scan afterwards
materialises the runs (every byte is the last marker at or before it:
explicit, 0xFF-run, 0x00-run, or the zero fill).

Performance shape (this is the serial half of the whole batched
encoder, so it is tuned hard):

- the front stream lives in ONE uint16 buffer per stream packing
  ``(tok << 8) | byte`` — half the HBM traffic of separate byte/token
  planes, and the scan carries nothing else of O(storage);
- raw bits (ec_enc_bits, entenc.c:204) go to a *compact* tail buffer
  indexed by write count (positions there are a monotone counter), and
  are mirrored into place once, after the scan;
- ``ROWS_PER_STEP`` plan rows are retired per scan step with all their
  buffer writes folded into a single masked pass, so the [B, storage]
  rewrite cost amortises over several symbols;
- renormalisation runs 2 iterations, which is exact for every plan the
  model emits: entering ec_encode rng > 2^23 and ft <= 2^15, so the
  post-code range is >= 2^8 and two 8-bit shifts always restore
  rng > 2^23 (entenc.c:79 loop; batch_coder emits ft <= 32768 always).

Bit-exact vs RangeEncoder/ec_lane.c by construction and by test.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .batch_coder import (OP_BITS, OP_BIT_LOGP, OP_ENCODE,
                          OP_ENCODE_BIN, ec_ilog)

_i32 = jnp.int32
_u16 = jnp.uint16
_u32 = jnp.uint32

CODE_TOP = np.uint32(1 << 31)
CODE_BOT = np.uint32(1 << 23)
CODE_SHIFT = 23                 # CODE_BITS - SYM_BITS - 1
SYM_MAX = 255
M31 = np.uint32((1 << 31) - 1)

ROWS_PER_STEP = 4
TAIL_MAX = 64                   # max raw-bits bytes per frame (fine
                                # energy + PVQ LSBs; 160-byte frames
                                # carry far fewer)

__all__ = ["pack_plan_device", "pack_plan_device_jit"]


def _carry_out(writes, mask, c, S):
    """entenc.c:82-99 on vector state.  ``c`` int32 in [0, 511].

    Appends the (mask, pos, u16 value) front-buffer writes to
    ``writes`` instead of applying them — the caller folds all writes
    of a scan step into one masked pass."""
    (rem, ext, offs) = (S["rem"], S["ext"], S["offs"])
    is_ff = c == SYM_MAX
    res = mask & ~is_ff
    carry = c >> 8

    wrote = res & (rem >= 0)
    byte = jnp.bitwise_and(rem + carry, 0xFF)
    writes.append((wrote, offs, (3 << 8) | byte))
    offs = offs + wrote.astype(_i32)

    has_run = res & (ext > 0)
    writes.append((has_run, offs, (1 + carry) << 8))
    offs = offs + jnp.where(has_run, ext, 0)

    S["ext"] = jnp.where(res, 0, ext + (mask & is_ff).astype(_i32))
    S["rem"] = jnp.where(res, jnp.bitwise_and(c, 0xFF), rem)
    S["offs"] = offs


def _normalize(writes, mask, S, iters: int = 2):
    for _ in range(iters):
        cond = mask & (S["rng"] <= CODE_BOT)
        _carry_out(writes, cond, (S["val"] >> CODE_SHIFT).astype(_i32),
                   S)
        S["val"] = jnp.where(cond, (S["val"] << 8) & M31, S["val"])
        S["rng"] = jnp.where(cond, S["rng"] << 8, S["rng"])


def _flush_tail(tail_writes, mask, S):
    """One byte of the raw-bits window to the tail stream (positions
    are the monotone ``end_offs`` counter — compact buffer)."""
    tail_writes.append((mask, S["end_offs"],
                        (3 << 8) | jnp.bitwise_and(
                            S["window"].astype(_i32), 0xFF)))
    S["end_offs"] = S["end_offs"] + mask.astype(_i32)
    S["window"] = jnp.where(mask, S["window"] >> 8, S["window"])
    S["nend"] = S["nend"] - 8 * mask.astype(_i32)


def _row_update(writes, tail_writes, S, row):
    """Retire one plan row against the vector coder state."""
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
    rng2 = jnp.where(sym, jnp.where(use_hi, rng_hi, rng_lo), S["rng"])
    # ec_enc_bit_logp (entenc.c:151-162): a=bit, d=logp
    s_lp = S["rng"] >> jnp.clip(d, 0, 31).astype(_u32)
    r_lp = S["rng"] - s_lp
    val2 = jnp.where(logp & (a != 0), S["val"] + r_lp, val2)
    rng2 = jnp.where(logp, jnp.where(a != 0, s_lp, r_lp), rng2)
    S["val"] = val2
    S["rng"] = rng2
    _normalize(writes, any_sym, S)

    # ---- ec_enc_bits (entenc.c:204-223): a=val, d=nbits
    bits = live & (kind == OP_BITS) & (d > 0)
    need = bits & (S["nend"] + d > 32)
    for _ in range(4):
        _flush_tail(tail_writes, need & (S["nend"] >= 8), S)
    S["window"] = jnp.where(
        bits,
        S["window"] | (a.astype(_u32)
                       << jnp.clip(S["nend"], 0, 31).astype(_u32)),
        S["window"])
    S["nend"] = S["nend"] + jnp.where(bits, d, 0)


def _apply_writes(buf, writes):
    """Fold an ordered write list [(mask, pos, val16)] into one masked
    pass over ``buf`` [B, W] (later writes win, as in-order execution
    requires).  XLA fuses this to a single buffer rewrite."""
    iota = jnp.arange(buf.shape[1])[None, :]
    out = buf
    for mask, pos, val in writes:
        val = jnp.broadcast_to(jnp.asarray(val, _i32), mask.shape)
        hit = mask[:, None] & (iota == pos[:, None])
        out = jnp.where(hit, val[:, None].astype(_u16), out)
    return out


def pack_plan_device(ops, storage, max_storage: int):
    """ops: [B, n, 4] int32 plan rows; storage: [B] per-stream byte
    budgets (<= max_storage).  Returns (bytes [B, max_storage] uint8,
    rng [B] uint32 — the final range)."""
    B, n, _ = ops.shape
    storage = storage.astype(_i32)

    npad = (-n) % ROWS_PER_STEP
    if npad:
        ops = jnp.concatenate(
            [ops, jnp.full((B, npad, 4), -1, _i32)], axis=1)

    # Union-valid row compaction: the plan is padded for worst-case
    # emission (~1.8k rows at LM=3) but in a typical CBR batch only
    # ~400 sites fire for *any* stream.  Stable-partition the live row
    # indices to the front and run the serial coder loop with a
    # DYNAMIC trip count — rows the whole batch skips cost nothing.
    # Rows are fetched through the tiny ``order`` vector with uniform
    # dynamic slices (no per-stream gather), preserving plan order.
    av = jnp.any(ops[:, :, 0] >= 0, axis=0)
    order = jnp.argsort(~av, stable=True).astype(_i32)
    n_keep = jnp.sum(av.astype(_i32))
    nsteps = (n_keep + ROWS_PER_STEP - 1) // ROWS_PER_STEP
    ops_t = jnp.moveaxis(ops, 1, 0)       # [n_tot, B, 4] row-major

    S0 = dict(
        front=jnp.zeros((B, max_storage), _u16),
        tail=jnp.zeros((B, TAIL_MAX), _u16),
        val=jnp.zeros((B,), _u32),
        rng=jnp.full((B,), CODE_TOP, _u32),
        rem=jnp.full((B,), -1, _i32),
        ext=jnp.zeros((B,), _i32),
        offs=jnp.zeros((B,), _i32),
        end_offs=jnp.zeros((B,), _i32),
        window=jnp.zeros((B,), _u32),
        nend=jnp.zeros((B,), _i32),
    )

    def cond(carry):
        return carry[0] < nsteps

    def step(carry):
        i, S = carry
        S = dict(S)
        writes, tail_writes = [], []
        idx = jax.lax.dynamic_slice_in_dim(order, i * ROWS_PER_STEP,
                                           ROWS_PER_STEP)
        for k in range(ROWS_PER_STEP):
            row = jax.lax.dynamic_slice_in_dim(ops_t, idx[k], 1,
                                               axis=0)[0]
            _row_update(writes, tail_writes, S, row)
        S["front"] = _apply_writes(S["front"], writes)
        S["tail"] = _apply_writes(S["tail"], tail_writes)
        return i + 1, S

    _, S = jax.lax.while_loop(cond, step, (jnp.int32(0), S0))
    S = dict(S)

    # ---- ec_enc_done (entenc.c:255-305)
    on = jnp.ones((B,), bool)
    writes, tail_writes = [], []
    l = 32 - ec_ilog(S["rng"])
    msk = (M31 >> jnp.clip(l, 0, 31).astype(_u32))
    end = (S["val"] + msk) & ~msk
    over = (end | msk) >= S["val"] + S["rng"]
    l = l + over.astype(_i32)
    msk = jnp.where(over, msk >> 1, msk)
    end = jnp.where(over, (S["val"] + msk) & ~msk, end)
    for _ in range(2):
        go = on & (l > 0)
        _carry_out(writes, go, (end >> CODE_SHIFT).astype(_i32), S)
        end = jnp.where(go, (end << 8) & M31, end)
        l = l - jnp.where(go, 8, 0)
    _carry_out(writes, on & ((S["rem"] >= 0) | (S["ext"] > 0)),
               jnp.zeros((B,), _i32), S)
    for _ in range(4):
        _flush_tail(tail_writes, on & (S["nend"] >= 8), S)
    S["front"] = _apply_writes(S["front"], writes)
    S["tail"] = _apply_writes(S["tail"], tail_writes)

    # ---- materialise runs + zero fill: last-marker prefix scan
    def comb(x, y):
        return jnp.where(y != 0, y, x)

    tok = (S["front"] >> 8).astype(_i32)
    byte = jnp.bitwise_and(S["front"].astype(_i32), 0xFF)
    lasttok = jax.lax.associative_scan(comb, tok, axis=1)
    out = jnp.where(lasttok == 3, byte,
                    jnp.where(lasttok == 1, 0xFF,
                              jnp.where(lasttok == 2, 0x00, 0)))

    # ---- mirror the tail stream into place: tail byte t lives at
    # storage-1-t (entenc.c raw bits grow from the buffer end)
    jpos = jnp.arange(max_storage)[None, :]
    tidx = storage[:, None] - 1 - jpos        # tail index at column j
    tb = jnp.bitwise_and(S["tail"].astype(_i32), 0xFF)
    tv = jnp.bitwise_and(S["tail"].astype(_i32), 0x300) != 0
    # one-hot select over the small tail buffer
    sel = (tidx[:, :, None]
           == jnp.arange(TAIL_MAX)[None, None, :])
    tail_at_j = jnp.sum(jnp.where(sel, tb[:, None, :], 0), axis=2)
    tail_hit = jnp.sum(jnp.where(sel, tv[:, None, :].astype(_i32), 0),
                       axis=2) != 0
    out = jnp.where(tail_hit, tail_at_j, out)

    # trailing partial end-window bits OR into the last free byte
    # (entenc.c:297-303)
    pos = storage - S["end_offs"] - 1
    frag = jnp.bitwise_and(S["window"].astype(_i32), 0xFF)
    hit = (S["nend"] > 0)[:, None] & (jpos == pos[:, None])
    out = jnp.where(hit, out | frag[:, None], out)
    return out.astype(jnp.uint8), S["rng"]


pack_plan_device_jit = jax.jit(pack_plan_device,
                               static_argnames=("max_storage",))
