"""Default-quality batched CELT encoder parity (complexity >= 1).

Byte parity vs the scalar CeltEncoder at the same complexity on a
float64 backend: transient analysis + short blocks, tf_analysis /
tf_encode, spreading decision, spreading rotations, anti-collapse bit.
Fixtures mix steady tones, noise, clicks and onsets so both transient
and long-block paths are exercised with per-stream divergence."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opus_codec_tpu.bitstream.range_coder import RangeEncoder
from opus_codec_tpu.celt import bands as B_
from opus_codec_tpu.celt import batch_analysis as ba
from opus_codec_tpu.celt import batch_encoder as be
from opus_codec_tpu.celt import energy as E_
from opus_codec_tpu.celt.encoder import CeltEncoder, transient_analysis
from opus_codec_tpu.celt.mdct import mdct_forward
from opus_codec_tpu.celt.modes import standard_mode

M = standard_mode()
OV = M.overlap
HEAVY = bool(os.environ.get("OPUS_TPU_HEAVY"))


@pytest.fixture(autouse=True)
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", old)


class ScalarTransformDQ:
    """Scalar preemphasis + long/short MDCT + energies, bit-identical
    to CeltEncoder's own path; also returns inb for the analysis."""

    def __init__(self, lm):
        self.mem = 0.0
        self.in_mem = np.zeros(OV)
        self.lm = lm
        self.n = M.short_mdct_size << lm

    def frame(self, pcm):
        n = self.n
        inp = pcm * 32768.0
        out = np.empty(n)
        mem = self.mem
        for i in range(n):
            out[i] = inp[i] - mem
            mem = M.preemph * inp[i]
        self.mem = mem
        inb = np.concatenate([self.in_mem, out])
        self.in_mem = inb[n:n + OV].copy()

        def spec_of(short):
            if short:
                Mb = 1 << self.lm
                Ns = M.short_mdct_size
                blocks = np.stack([inb[b * Ns: b * Ns + Ns + OV]
                                   for b in range(Mb)])
                sp = mdct_forward(blocks, M.window)
                spec = np.zeros(n)
                for b in range(Mb):
                    spec[b::Mb] = sp[b]
            else:
                spec = mdct_forward(inb[None, :], M.window)[0]
            bandE = B_.compute_band_energies(M, spec[None, :], 21,
                                             self.lm)
            logE = E_.amp2_log2(M, 21, 21, bandE)
            Xn = B_.normalise_bands(M, spec[None, :], bandE, 21,
                                    1 << self.lm)
            return Xn[0], logE[0]

        Xl, logEl = spec_of(False)
        Xs, logEs = spec_of(True)
        return inb, Xl, logEl, Xs, logEs


def _exec_plan(ops, nbytes):
    enc = RangeEncoder(int(nbytes))
    for row in ops:
        kind, a, b, c = (int(v) for v in row)
        if kind < 0:
            continue
        if kind == be.bc.OP_ENCODE:
            enc.encode(a, b, c)
        elif kind == be.bc.OP_ENCODE_BIN:
            enc.encode_bin(a, b, c)
        elif kind == be.bc.OP_BIT_LOGP:
            enc.enc_bit_logp(a, c)
        elif kind == be.bc.OP_BITS:
            enc.enc_bits(a, c)
    enc.done()
    assert not enc.get_error()
    return enc.data(), enc.rng


def _fixture_pcm(rng, n, b, fi):
    kind = b % 3
    t = np.arange(n) / 48000.0
    f0 = 180 + 140 * b
    base = 0.4 * np.sin(2 * np.pi * f0 * (t + fi * 0.02))
    if kind == 0:          # steady tone + light noise
        return base + 0.03 * rng.standard_normal(n)
    if kind == 1:          # click train → hard transients
        sig = 0.05 * rng.standard_normal(n) + 0.2 * base
        for p in range(100 + 37 * fi, n, 331):
            sig[p:p + 3] += np.asarray([0.9, -0.7, 0.5])
        return np.clip(sig, -1, 1)
    # onset mid-frame
    sig = 0.02 * rng.standard_normal(n)
    sig[n // 2:] += 5.5 * base[n // 2:]
    return np.clip(sig, -1, 1)


# CI runs lm=1 (the identical code path at 5 ms — the rotation chains
# and tree make eager lm=3 minutes-long); OPUS_TPU_HEAVY covers the
# benched 20 ms config.
@pytest.mark.parametrize("lm,bitrate,complexity", [
    (1, 64000, 2),
    (1, 96000, 3),
    pytest.param(3, 64000, 2, marks=pytest.mark.skipif(
        not HEAVY, reason="OPUS_TPU_HEAVY")),
    pytest.param(3, 96000, 3, marks=pytest.mark.skipif(
        not HEAVY, reason="OPUS_TPU_HEAVY")),
])
def test_plan_bytes_equal_scalar_dq(lm, bitrate, complexity):
    n = M.short_mdct_size << lm
    rng = np.random.default_rng(77 + bitrate + complexity)
    Bn = 3 if not HEAVY else 6
    n_frames = 2 if not HEAVY else 4
    nbytes = be.cbr_bytes(bitrate, n, 48000, 1275)

    encs = []
    for b in range(Bn):
        e = CeltEncoder(48000, 1)
        e.complexity = complexity
        e.vbr = False
        e.bitrate = bitrate
        encs.append(e)
    xfs = [ScalarTransformDQ(lm) for _ in range(Bn)]
    state = be.init_state(Bn, dtype=jnp.float64, complexity=complexity)

    saw_transient = False
    for fi in range(n_frames):
        inbs, Xls, logEls, Xss, logEss, pcms = [], [], [], [], [], []
        for b in range(Bn):
            pcm = _fixture_pcm(rng, n, b, fi)
            pcms.append(pcm)
            inb, Xl, logEl, Xs, logEs = xfs[b].frame(pcm)
            inbs.append(inb)
            Xls.append(Xl)
            logEls.append(logEl)
            Xss.append(Xs)
            logEss.append(logEs)
        # scalar-equal analysis inputs (transient_analysis_batch is
        # itself parity-tested in test_batch_analysis)
        ts = [transient_analysis(inb[None, :], n + OV, 1, False)
              for inb in inbs]
        is_t = np.asarray([w[0] for w in ts])
        tfe = np.asarray([w[1] for w in ts])
        saw_transient |= bool(is_t.any())

        with jax.disable_jit():
            c, state = be.plan_from_spectrum(
                jnp.asarray(np.stack(Xls)),
                jnp.asarray(np.stack(logEls)), state,
                jnp.full((Bn,), nbytes, jnp.int32),
                jnp.zeros((Bn,), bool),
                jnp.full((Bn,), bitrate, jnp.int32),
                lm=lm, exact=True, complexity=complexity,
                X_short=jnp.asarray(np.stack(Xss)),
                bandLogE_short=jnp.asarray(np.stack(logEss)),
                is_transient=jnp.asarray(is_t),
                tf_estimate=jnp.asarray(tfe))
        ops = np.asarray(c.ops)
        for b in range(Bn):
            want = encs[b].encode_with_ec(pcms[b][None, :], n, nbytes)
            got, got_rng = _exec_plan(ops[b], nbytes)
            assert got == want, \
                f"frame {fi} stream {b} (transient={is_t[b]})"
            assert got_rng == encs[b].rng
    assert saw_transient, "fixture never triggered a transient"
