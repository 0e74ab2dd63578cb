"""Native C symbol lane vs the Python range coder: byte-for-byte parity
and throughput sanity."""
import random
import time

import numpy as np
import pytest

from opus_codec_tpu import runtime as rt
from opus_codec_tpu.bitstream.range_coder import RangeDecoder, RangeEncoder

pytestmark = pytest.mark.skipif(not rt.native_available(),
                                reason="no C toolchain")

ICDF4 = (120, 80, 30, 0)


def _random_plan(rng, n):
    ops = []
    for _ in range(n):
        kind = rng.randrange(5)
        if kind == 0:
            ft = rng.randint(2, 250)
            s = rng.randrange(ft)
            ops.append((rt.OP_ENCODE, s, s + 1, ft))
        elif kind == 1:
            logp = rng.randint(1, 14)
            ops.append((rt.OP_BIT_LOGP, rng.randint(0, 1), 0, logp))
        elif kind == 2:
            ft = rng.randint(2, 1 << 20)
            ops.append((rt.OP_UINT, rng.randrange(ft), 0, ft))
        elif kind == 3:
            nb = rng.randint(1, 24)
            ops.append((rt.OP_BITS, rng.getrandbits(nb), 0, nb))
        else:
            ops.append((rt.OP_ICDF, rng.randrange(4), 0, 7))
    return np.array(ops, np.int32)


def _python_encode(ops, size):
    enc = RangeEncoder(size)
    for kind, a, b, c in ops:
        if kind == rt.OP_ENCODE:
            enc.encode(int(a), int(b), int(c))
        elif kind == rt.OP_BIT_LOGP:
            enc.enc_bit_logp(int(a), int(c))
        elif kind == rt.OP_UINT:
            enc.enc_uint(int(a), int(c))
        elif kind == rt.OP_BITS:
            enc.enc_bits(int(a), int(c))
        elif kind == rt.OP_ICDF:
            enc.enc_icdf(int(a), ICDF4, int(c))
    enc.done()
    assert enc.get_error() == 0
    return enc.data(), enc.rng


def test_native_matches_python():
    rng = random.Random(17)
    tables = np.array(ICDF4, np.uint8)
    for trial in range(20):
        ops = _random_plan(rng, rng.randint(10, 400))
        size = 2048
        py_pkt, py_rng = _python_encode(ops, size)
        nat_pkt, nat_rng = rt.encode_plan(ops, size, tables)
        assert nat_pkt == py_pkt, f"trial {trial}: byte mismatch"
        assert nat_rng == py_rng
        # decode back natively
        dec_ops, dec_rng = rt.decode_plan(ops, nat_pkt, tables)
        np.testing.assert_array_equal(dec_ops[:, 1], ops[:, 1])
        assert dec_rng == py_rng


def test_native_batch():
    rng = random.Random(3)
    tables = np.array(ICDF4, np.uint8)
    plans = [_random_plan(rng, rng.randint(20, 100)) for _ in range(16)]
    offsets = np.zeros(17, np.int32)
    for i, p in enumerate(plans):
        offsets[i + 1] = offsets[i] + len(p)
    ops = np.concatenate(plans)
    pkts, rngs = rt.encode_plan_batch(ops, offsets, 1024, tables)
    for i, p in enumerate(plans):
        py_pkt, py_rng = _python_encode(p, 1024)
        assert pkts[i] == py_pkt
        assert rngs[i] == py_rng


def test_native_throughput():
    """The native lane must beat the Python coder by a wide margin — it is
    the production packer for batched streams."""
    rng = random.Random(5)
    ops = _random_plan(rng, 5000)
    tables = np.array(ICDF4, np.uint8)
    t0 = time.perf_counter()
    for _ in range(20):
        rt.encode_plan(ops, 8192, tables)
    t_native = (time.perf_counter() - t0) / 20
    t0 = time.perf_counter()
    _python_encode(ops, 8192)
    t_python = time.perf_counter() - t0
    speedup = t_python / t_native
    assert speedup > 10, f"native speedup only {speedup:.1f}x"
