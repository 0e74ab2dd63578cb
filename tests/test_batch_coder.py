"""PlanCoder (vectorized range-coder model) vs the scalar RangeEncoder.

The device model must track (rng, nbits_total) bit-for-bit through any op
sequence, and the emitted plan must pack (via runtime/ec_lane.c) to the
same bytes the scalar encoder produces.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from opus_codec_tpu.bitstream.range_coder import RangeEncoder
from opus_codec_tpu.celt import batch_coder as bc
from opus_codec_tpu import runtime as rt


def _exec_row_scalar(enc: RangeEncoder, row):
    kind, a, b, c = (int(v) for v in row)
    if kind == bc.OP_ENCODE:
        enc.encode(a, b, c)
    elif kind == bc.OP_ENCODE_BIN:
        enc.encode_bin(a, b, c)
    elif kind == bc.OP_BIT_LOGP:
        enc.enc_bit_logp(a, c)
    elif kind == bc.OP_BITS:
        enc.enc_bits(a, c)
    else:
        raise AssertionError(f"bad op kind {kind}")


def _random_op_script(rng, n):
    """A mixed op script exercising every emission helper."""
    script = []
    for _ in range(n):
        k = rng.integers(0, 6)
        if k == 0:
            ft = int(rng.integers(2, 32768))
            fl = int(rng.integers(0, ft))
            fh = int(rng.integers(fl + 1, ft + 1))
            script.append(("encode", fl, fh, ft))
        elif k == 1:
            ftb = int(rng.integers(1, 16))
            ft = 1 << ftb
            fl = int(rng.integers(0, ft))
            fh = int(rng.integers(fl + 1, ft + 1))
            script.append(("encode_bin", fl, fh, ftb))
        elif k == 2:
            script.append(("bit_logp", int(rng.integers(0, 2)),
                           int(rng.integers(1, 15))))
        elif k == 3:
            ft = int(rng.integers(2, 1 << 20))
            script.append(("uint", int(rng.integers(0, ft)), ft))
        elif k == 4:
            nb = int(rng.integers(1, 20))
            script.append(("bits", int(rng.integers(0, 1 << nb)), nb))
        else:
            script.append(("laplace", int(rng.integers(-25, 26)),
                           int(rng.integers(1, 10000)),
                           int(rng.integers(32, 16300))))
    return script


def test_plan_coder_matches_scalar_trajectory_and_bytes():
    rng = np.random.default_rng(42)
    B = 5
    scripts = [_random_op_script(rng, 60) for _ in range(B)]
    max_ops = 1024
    c = bc.plan_init(B, max_ops)
    encs = [RangeEncoder(1275) for _ in range(B)]

    from opus_codec_tpu.bitstream.laplace import laplace_encode
    for step in range(60):
        ops = [s[step] for s in scripts]
        # apply each stream's op via the batched helpers one stream at a
        # time (mask isolates the stream) so scripts can differ per lane
        for b, op in enumerate(ops):
            mask = jnp.arange(B) == b
            kind = op[0]
            if kind == "encode":
                c = bc.encode(c, mask, *[jnp.full(B, v) for v in op[1:]])
                encs[b].encode(*op[1:])
            elif kind == "encode_bin":
                c = bc.encode_bin(c, mask,
                                  *[jnp.full(B, v) for v in op[1:]])
                encs[b].encode_bin(*op[1:])
            elif kind == "bit_logp":
                c = bc.bit_logp(c, mask,
                                *[jnp.full(B, v) for v in op[1:]])
                encs[b].enc_bit_logp(*op[1:])
            elif kind == "uint":
                c = bc.uint(c, mask, *[jnp.full(B, v) for v in op[1:]])
                encs[b].enc_uint(*op[1:])
            elif kind == "bits":
                c = bc.bits(c, mask, *[jnp.full(B, v) for v in op[1:]])
                encs[b].enc_bits(*op[1:])
            else:
                _, v, fs, decay = op
                c, coded = bc.laplace(c, mask, jnp.full(B, v),
                                      jnp.full(B, fs), jnp.full(B, decay))
                want = laplace_encode(encs[b], v, fs, decay)
                assert int(coded[b]) == want, f"lane {b} step {step}"
        # trajectory check: model state equals every scalar coder's
        for b in range(B):
            assert int(c.rng[b]) == encs[b].rng, f"rng lane {b} @{step}"
            assert int(c.nbits_total[b]) == encs[b].nbits_total
            assert int(bc.tell(c)[b]) == encs[b].tell()
            assert int(bc.tell_frac(c)[b]) == encs[b].tell_frac()

    # byte check: replay each stream's plan through a fresh scalar coder
    # and through the native C packer
    ops_np = np.asarray(bc.finalize(c).ops)
    for b in range(B):
        replay = RangeEncoder(1275)
        for row in ops_np[b]:
            if int(row[0]) < 0:
                continue
            _exec_row_scalar(replay, row)
        encs[b].done()
        replay.done()
        assert replay.data() == encs[b].data(), f"bytes lane {b}"
        if rt.native_available():
            data, rng_out = rt.encode_plan(ops_np[b], 1275)
            assert data == encs[b].data()[:len(data)]
            assert rng_out == encs[b].rng
