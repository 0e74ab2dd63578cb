"""Laplace coder roundtrip tests (mirrors opus/celt/tests/test_unit_laplace.c)."""
import random

from opus_codec_tpu.bitstream.laplace import laplace_decode, laplace_encode
from opus_codec_tpu.bitstream.range_coder import RangeDecoder, RangeEncoder


def test_laplace_roundtrip():
    rng = random.Random(9)
    for _ in range(20):
        vals, params = [], []
        enc = RangeEncoder(10000)
        for _ in range(100):
            v = rng.randint(-60, 60)
            fs = rng.randint(100, 30000)
            decay = rng.randint(1000, 11456)
            coded = laplace_encode(enc, v, fs, decay)
            vals.append(coded)
            params.append((fs, decay))
        enc.done()
        assert enc.get_error() == 0
        dec = RangeDecoder(enc.data())
        for v, (fs, decay) in zip(vals, params):
            assert laplace_decode(dec, fs, decay) == v


def test_laplace_zero_cheap():
    # zero must cost < 1 bit at high fs
    enc = RangeEncoder(100)
    t0 = enc.tell_frac()
    laplace_encode(enc, 0, 30000, 8000)
    assert enc.tell_frac() - t0 < 8  # < 1 bit in 1/8 units
