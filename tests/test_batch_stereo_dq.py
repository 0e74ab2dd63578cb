"""Stereo default-quality + VBR batched encoder parity.

Byte (and VBR size) parity vs the scalar CeltEncoder with C == 2 at
complexity 2 — per-stream transients/short blocks, tf_analysis with
the tf_chan select, stereo band tree with in-scan subtree shape
transforms and rotations — plus the stereo VBR budget replanning."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opus_codec_tpu.celt import bands as B_
from opus_codec_tpu.celt import batch_encoder as be
from opus_codec_tpu.celt import energy as E_
from opus_codec_tpu.celt.encoder import CeltEncoder, transient_analysis
from opus_codec_tpu.celt.mdct import mdct_forward
from opus_codec_tpu.celt.modes import standard_mode

from test_batch_encoder_stereo import (StereoTransform, _exec_plan,
                                       _stereo_pcm)

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


class StereoTransformDQ(StereoTransform):
    """Adds the short-block MDCT plane + the analysis input."""

    def frame(self, pcm):
        n = self.n
        inbs, specs, specs_s = [], [], []
        Mb = 1 << self.lm
        Ns = M.short_mdct_size
        for c in range(2):
            inp = pcm[c] * 32768.0
            out = np.empty(n)
            mem = self.mem[c]
            for i in range(n):
                out[i] = inp[i] - mem
                mem = M.preemph * inp[i]
            self.mem[c] = mem
            inb = np.concatenate([self.in_mem[c], out])
            self.in_mem[c] = inb[n:n + OV].copy()
            inbs.append(inb)
            specs.append(mdct_forward(inb[None, :], M.window)[0])
            blocks = np.stack([inb[b * Ns: b * Ns + Ns + OV]
                               for b in range(Mb)])
            sp = mdct_forward(blocks, M.window)
            spec_s = np.zeros(n)
            for b in range(Mb):
                spec_s[b::Mb] = sp[b]
            specs_s.append(spec_s)

        def planes(spec2):
            spec2 = np.stack(spec2)
            bandE = B_.compute_band_energies(M, spec2, 21, self.lm)
            logE = E_.amp2_log2(M, 21, 21, bandE)
            Xn = B_.normalise_bands(M, spec2, bandE, 21, 1 << self.lm)
            return Xn[0], Xn[1], logE, bandE

        return np.stack(inbs), planes(specs), planes(specs_s)


@pytest.mark.parametrize("lm,bitrate,vbr", [
    (1, 96000, False),
    (1, 80000, True),
    pytest.param(3, 96000, False, marks=pytest.mark.skipif(
        not HEAVY, reason="OPUS_TPU_HEAVY")),
])
def test_stereo_dq_bytes_equal_scalar(lm, bitrate, vbr):
    n = M.short_mdct_size << lm
    rng = np.random.default_rng(61 + bitrate)
    Bn = 3
    n_frames = 2
    complexity = 2
    max_bytes = 1275 if vbr else be.cbr_bytes(bitrate, n, 48000, 1275)

    encs = []
    for b in range(Bn):
        e = CeltEncoder(48000, 2)
        e.complexity = complexity
        e.vbr = vbr
        e.constrained_vbr = vbr
        e.bitrate = bitrate
        encs.append(e)
    xfs = [StereoTransformDQ(lm) for _ in range(Bn)]
    state = be.init_state_stereo(Bn, dtype=jnp.float64,
                                 complexity=complexity, vbr=vbr)

    saw_transient = False
    for fi in range(n_frames):
        packs, pcms = [], []
        is_t = np.zeros(Bn, bool)
        tfe = np.zeros(Bn)
        tfc = np.zeros(Bn, np.int32)
        for b in range(Bn):
            # click train on one channel makes per-stream transients
            pcm = _stereo_pcm(rng, n, b, fi, flavor=b % 4)
            if b == 1:
                for p in range(60, n, 211):
                    pcm[0, p:p + 2] += np.asarray([0.8, -0.6])
                pcm = np.clip(pcm, -1, 1)
            pcms.append(pcm)
            inb, longp, shortp = xfs[b].frame(pcm)
            w = transient_analysis(inb, n + OV, 2, False)
            is_t[b], tfe[b], tfc[b] = w[0], w[1], w[2]
            packs.append((longp, shortp))
        saw_transient |= bool(is_t.any())

        def stack(idx, sub):
            return jnp.asarray(np.stack([packs[b][idx][sub]
                                         for b in range(Bn)]))

        kw = {}
        if vbr:
            kw = dict(vbr=True, constrained_vbr=True)
        with jax.disable_jit():
            out = be.plan_from_spectrum_stereo(
                stack(0, 0), stack(0, 1), stack(0, 2), stack(0, 3),
                state, jnp.full((Bn,), max_bytes, jnp.int32),
                jnp.zeros((Bn,), bool),
                jnp.full((Bn,), bitrate, jnp.int32),
                lm=lm, exact=True, complexity=complexity,
                X_short=stack(1, 0), Y_short=stack(1, 1),
                bandLogE_short=stack(1, 2), bandE_short=stack(1, 3),
                is_transient=jnp.asarray(is_t),
                tf_estimate=jnp.asarray(tfe),
                tf_chan=jnp.asarray(tfc), **kw)
        if vbr:
            c, state, sizes = out
            sizes = np.asarray(sizes)
        else:
            c, state = out
            sizes = np.full(Bn, max_bytes)
        ops = np.asarray(c.ops)
        for b in range(Bn):
            want = encs[b].encode_with_ec(pcms[b], n, max_bytes)
            if vbr:
                assert sizes[b] == len(want), \
                    f"frame {fi} stream {b} size"
            got, got_rng = _exec_plan(ops[b], int(sizes[b]))
            assert got == want, \
                f"frame {fi} stream {b} (transient={is_t[b]})"
            assert got_rng == encs[b].rng
    assert saw_transient, "fixture never triggered a transient"
