"""Device range-coder packer vs the host lane (ec_lane/RangeEncoder).

Identical plans must produce identical packet bytes and final ranges —
the device packer is an exact entenc.c port, carries and 0xFF runs
included."""
import numpy as np

import jax.numpy as jnp

from opus_codec_tpu.batch_api import CeltBatchEncoder
from opus_codec_tpu.celt import batch_pack as bp
from opus_codec_tpu.bitstream.range_coder import RangeEncoder


def test_device_pack_matches_host_on_real_plans():
    Bn, n = 6, 120
    enc = CeltBatchEncoder(Bn, bitrate=96000, frame_size=n)
    rng = np.random.default_rng(2)
    t = np.arange(n) / 48000.0
    for fi in range(6):
        pcm = (0.4 * np.sin(2 * np.pi
                            * (180 + 140 * np.arange(Bn))[:, None]
                            * (t + fi * n / 48000)[None, :])
               + 0.05 * rng.standard_normal((Bn, n))).astype(np.float32)
        c = enc.encode_step_device(pcm)
        host_pkts, host_rngs = enc.pack(c)
        out, rngs = bp.pack_plan_device_jit(
            c.ops, jnp.full((Bn,), enc.nbytes, jnp.int32), enc.nbytes)
        ob = np.asarray(out).astype(np.uint8)
        for b in range(Bn):
            assert int(rngs[b]) == int(host_rngs[b]), (fi, b)
            assert ob[b].tobytes() == host_pkts[b][1:], (fi, b)


def test_device_pack_synthetic_carry_runs():
    """Adversarial plans that force carry propagation through 0xFF
    runs: many max-probability symbols in a row."""
    ops = []
    # symbols with fl near ft push val toward carries; mix raw bits
    seq = []
    rng = np.random.default_rng(5)
    for i in range(300):
        ft = int(rng.integers(2, 32000))
        fl = int(rng.integers(0, ft))
        fh = int(rng.integers(fl + 1, ft + 1))
        seq.append((0, fl, fh, ft))
        if i % 7 == 0:
            nb = int(rng.integers(1, 9))
            seq.append((5, int(rng.integers(0, 1 << nb)), 0, nb))
        if i % 11 == 0:
            seq.append((2, int(rng.integers(0, 2)), 0,
                        int(rng.integers(1, 15))))
    # a run-heavy stream: repeatedly code the top of the interval
    seq2 = []
    for i in range(300):
        seq2.append((0, 254, 255, 255))
    n = max(len(seq), len(seq2))
    B = 2
    opsa = np.full((B, n, 4), -1, np.int32)
    for j, row in enumerate(seq):
        opsa[0, j] = row
    for j, row in enumerate(seq2):
        opsa[1, j] = row
    nbytes = 700
    out, rngs = bp.pack_plan_device_jit(
        jnp.asarray(opsa), jnp.full((B,), nbytes, jnp.int32), nbytes)
    ob = np.asarray(out).astype(np.uint8)
    for b in range(B):
        enc = RangeEncoder(nbytes)
        for row in opsa[b]:
            kind, a, bb, cv = (int(v) for v in row)
            if kind < 0:
                continue
            if kind == 0:
                enc.encode(a, bb, cv)
            elif kind == 1:
                enc.encode_bin(a, bb, cv)
            elif kind == 2:
                enc.enc_bit_logp(a, cv)
            elif kind == 5:
                enc.enc_bits(a, cv)
        enc.done()
        assert int(rngs[b]) == enc.rng, b
        assert ob[b].tobytes() == enc.data(), b
