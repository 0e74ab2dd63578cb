"""Range coder tests.

Three layers of validation (mirrors reference test strategy,
opus/celt/tests/test_unit_entropy.c):
  1. Pure-Python encode→decode roundtrip fuzz across every symbol type.
  2. Byte-exact comparison against golden vectors generated from the real
     libopus (tools/oracle/ec_vectors.c), including tell_frac traces.
  3. Edge-case semantics: patch_initial_bits, shrink, tell monotonicity.
"""
import os
import random

import pytest

from opus_codec_tpu.bitstream.range_coder import (
    RangeDecoder,
    RangeEncoder,
    ec_ilog,
)

VEC = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                   "ec_vectors.txt")

ICDF4 = (120, 80, 30, 0)


def test_ilog():
    assert ec_ilog(0) == 0
    assert ec_ilog(1) == 1
    assert ec_ilog(2) == 2
    assert ec_ilog(0x80000000) == 32


def test_roundtrip_fuzz():
    rng = random.Random(7)
    for _ in range(30):
        size = rng.randint(32, 400)
        enc = RangeEncoder(size)
        ops = []
        while enc.tell() < (size - 16) * 8 and len(ops) < 300:
            kind = rng.randrange(5)
            if kind == 0:
                ft = rng.randint(2, 250)
                s = rng.randrange(ft)
                enc.encode(s, s + 1, ft)
                ops.append((0, ft, s))
            elif kind == 1:
                logp = rng.randint(1, 14)
                bit = rng.randint(0, 1)
                enc.enc_bit_logp(bit, logp)
                ops.append((1, logp, bit))
            elif kind == 2:
                ft = rng.randint(2, 1 << 20)
                s = rng.randrange(ft)
                enc.enc_uint(s, ft)
                ops.append((2, ft, s))
            elif kind == 3:
                nb = rng.randint(1, 24)
                s = rng.getrandbits(nb)
                enc.enc_bits(s, nb)
                ops.append((3, nb, s))
            else:
                s = rng.randrange(4)
                enc.enc_icdf(s, ICDF4, 7)
                ops.append((4, 0, s))
        enc.done()
        assert enc.get_error() == 0
        dec = RangeDecoder(enc.data())
        for kind, a, v in ops:
            if kind == 0:
                s = dec.decode(a)
                dec.update(s, s + 1, a)
                assert s == v
            elif kind == 1:
                assert dec.dec_bit_logp(a) == v
            elif kind == 2:
                assert dec.dec_uint(a) == v
            elif kind == 3:
                assert dec.dec_bits(a) == v
            else:
                assert dec.dec_icdf(ICDF4, 7) == v
        # tell matches between encoder and decoder after all symbols
        assert dec.tell() == enc.tell()


@pytest.mark.skipif(not os.path.exists(VEC), reason="oracle vectors missing")
def test_against_libopus_golden_vectors():
    with open(VEC) as f:
        lines = f.read().strip().split("\n")
    i = 0
    ntrials = 0
    while i < len(lines):
        hdr = lines[i].split()
        assert hdr[0] == "TRIAL"
        n = int(hdr[3])
        ref_rb = int(hdr[5])
        ref_tell = int(hdr[7])
        ops = [tuple(int(x) for x in tok.split(","))
               for tok in lines[i + 1].split()[1:]]
        ref_bytes = bytes.fromhex(lines[i + 2].split()[1])
        trace = [int(x) for x in lines[i + 3].split()[1:]]
        assert len(ops) == n
        i += 4
        ntrials += 1

        # Encode side: byte-exact packet
        enc = RangeEncoder(len(ref_bytes))
        for kind, a, v in ops:
            if kind == 0:
                enc.encode(v, v + 1, a)
            elif kind == 1:
                enc.enc_bit_logp(v, a)
            elif kind == 2:
                enc.enc_uint(v, a)
            elif kind == 3:
                enc.enc_bits(v, a)
            else:
                enc.enc_icdf(v, ICDF4, 7)
        enc.done()
        assert enc.get_error() == 0
        assert enc.range_bytes() == ref_rb
        assert enc.tell() == ref_tell
        assert enc.data() == ref_bytes, f"trial {ntrials-1} byte mismatch"

        # Decode side: symbols + tell_frac trace identical
        dec = RangeDecoder(ref_bytes)
        for j, (kind, a, v) in enumerate(ops):
            if kind == 0:
                s = dec.decode(a)
                dec.update(s, s + 1, a)
                assert s == v
            elif kind == 1:
                assert dec.dec_bit_logp(a) == v
            elif kind == 2:
                assert dec.dec_uint(a) == v
            elif kind == 3:
                assert dec.dec_bits(a) == v
            else:
                assert dec.dec_icdf(ICDF4, 7) == v
            assert dec.tell_frac() == trace[j], f"tell_frac @ {j}"
    assert ntrials == 50


def test_patch_initial_bits():
    enc = RangeEncoder(64)
    enc.encode(3, 4, 10)
    enc.enc_uint(77, 1000)
    enc.patch_initial_bits(0b10, 2)
    enc.done()
    data = enc.data()
    assert (data[0] >> 6) == 0b10


def test_shrink_keeps_raw_bits():
    enc = RangeEncoder(128)
    enc.encode(1, 2, 4)
    enc.enc_bits(0x5A, 8)
    enc.shrink(32)
    enc.done()
    assert enc.get_error() == 0
    dec = RangeDecoder(enc.data())
    s = dec.decode(4)
    dec.update(s, s + 1, 4)
    assert s == 1
    assert dec.dec_bits(8) == 0x5A


def test_tell_initial():
    # A fresh encoder/decoder claims exactly 1 bit used (entcode.c comment).
    enc = RangeEncoder(16)
    assert enc.tell() == 1
    enc.done()
    dec = RangeDecoder(enc.data())
    assert dec.tell() == 1
