"""Batched VBR parity: compute_vbr + budget replanning vs scalar.

Byte parity (including the per-stream FINAL packet size from the
ec_enc_shrink replanning) vs the scalar CeltEncoder with vbr on, both
constrained and unconstrained, across bitrates, with the reservoir /
drift / offset state carried over multiple frames."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opus_codec_tpu.bitstream.range_coder import RangeEncoder
from opus_codec_tpu.celt import batch_encoder as be
from opus_codec_tpu.celt.encoder import CeltEncoder
from opus_codec_tpu.celt.modes import standard_mode

from test_batch_encoder_dq import (ScalarTransformDQ, _exec_plan,
                                   _fixture_pcm)

M = standard_mode()
HEAVY = bool(os.environ.get("OPUS_TPU_HEAVY"))


@pytest.fixture(autouse=True)
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", old)


@pytest.mark.parametrize("lm,bitrate,constrained", [
    (1, 48000, True),
    (1, 64000, False),
    (1, 96000, True),
    pytest.param(3, 64000, True, marks=pytest.mark.skipif(
        not HEAVY, reason="OPUS_TPU_HEAVY")),
])
def test_vbr_bytes_equal_scalar(lm, bitrate, constrained):
    n = M.short_mdct_size << lm
    rng = np.random.default_rng(31 + bitrate)
    Bn = 3
    n_frames = 3
    max_bytes = 1275

    encs = []
    for b in range(Bn):
        e = CeltEncoder(48000, 1)
        e.complexity = 0
        e.vbr = True
        e.constrained_vbr = constrained
        e.bitrate = bitrate
        encs.append(e)
    xfs = [ScalarTransformDQ(lm) for _ in range(Bn)]
    state = be.init_state(Bn, dtype=jnp.float64, vbr=True)
    ovm = np.zeros(Bn)          # overlap_max carry (encoder.py:784-789)
    OV = M.overlap

    for fi in range(n_frames):
        Xs, logEs, pcms = [], [], []
        silence = np.zeros(Bn, bool)
        for b in range(Bn):
            pcm = _fixture_pcm(rng, n, b, fi)
            if b == 2 and fi >= 1:
                pcm = np.zeros(n)          # silence path
            pcms.append(pcm)
            s1 = max(ovm[b], float(np.max(np.abs(pcm[:n - OV]))))
            ovm[b] = float(np.max(np.abs(pcm[n - OV:])))
            silence[b] = max(s1, ovm[b]) <= 1.0 / (1 << 24)
            _inb, Xl, logEl, _Xs, _logEs = xfs[b].frame(pcm)
            Xs.append(Xl)
            logEs.append(logEl)
        with jax.disable_jit():
            c, state, sizes = be.plan_from_spectrum(
                jnp.asarray(np.stack(Xs)),
                jnp.asarray(np.stack(logEs)), state,
                jnp.full((Bn,), max_bytes, jnp.int32),
                jnp.asarray(silence),
                jnp.full((Bn,), bitrate, jnp.int32),
                lm=lm, exact=True, vbr=True,
                constrained_vbr=constrained)
        ops = np.asarray(c.ops)
        sizes = np.asarray(sizes)
        for b in range(Bn):
            want = encs[b].encode_with_ec(pcms[b][None, :], n,
                                          max_bytes)
            assert sizes[b] == len(want), \
                f"frame {fi} stream {b}: size {sizes[b]} != {len(want)}"
            got, got_rng = _exec_plan(ops[b], int(sizes[b]))
            assert got == want, f"frame {fi} stream {b}"
            assert got_rng == encs[b].rng
