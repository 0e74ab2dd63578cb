"""Batched *stereo* CELT encoder planner vs the scalar encoder.

Mirror of test_batch_encoder.py for C == 2: on a float64 backend the
device planning pass (theta/intensity/dual-stereo band tree, C-doubled
energy coding, stereo allocation) must reproduce the scalar encoder's
bitstream byte-for-byte for the shared configuration (stereo, CBR,
complexity 0).  The scalar encoder is itself validated against libopus,
so equality here chains to reference conformance.
"""
import contextlib
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def enable_x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", old)


from opus_codec_tpu.bitstream.range_coder import RangeEncoder
from opus_codec_tpu.celt import bands as B_
from opus_codec_tpu.celt import batch_encoder as be
from opus_codec_tpu.celt import energy as E_
from opus_codec_tpu.celt.encoder import CeltEncoder
from opus_codec_tpu.celt.mdct import mdct_forward
from opus_codec_tpu.celt.modes import standard_mode
from opus_codec_tpu import runtime as rt

M = standard_mode()
OV = M.overlap
HEAVY = bool(os.environ.get("OPUS_TPU_HEAVY"))


class StereoTransform:
    """The scalar stereo encoder's transform half (per-channel
    preemphasis + lap + MDCT + band energies), bit-identical to
    CeltEncoder's own path (C == 2)."""

    def __init__(self, lm):
        self.mem = [0.0, 0.0]
        self.in_mem = [np.zeros(OV), np.zeros(OV)]
        self.lm = lm
        self.n = M.short_mdct_size << lm

    def frame(self, pcm):
        """pcm: [2, n] -> (X, Y, bandLogE [2, nb], bandE [2, nb])."""
        n = self.n
        specs = []
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
            specs.append(mdct_forward(inb[None, :], M.window)[0])
        spec = np.stack(specs)                      # [2, Nf]
        bandE = B_.compute_band_energies(M, spec, 21, self.lm)
        bandLogE = E_.amp2_log2(M, 21, 21, bandE)
        Xn = B_.normalise_bands(M, spec, bandE, 21, 1 << self.lm)
        return Xn[0], Xn[1], bandLogE, bandE


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


def _stereo_pcm(rng, n, b, fi, flavor):
    """Per-stream stereo test signal covering the coding paths:
    correlated (low theta), independent (dual-stereo), inverted
    (inv flag), near-mono (intensity at low rates)."""
    t = np.arange(n) / 48000.0
    f0 = 150 + 170 * b + 60 * fi
    base = 0.4 * np.sin(2 * np.pi * f0 * (t + fi * 0.02))
    noise = rng.standard_normal((2, n))
    if flavor == 0:        # tightly correlated L/R
        L = base + 0.03 * noise[0]
        R = base + 0.03 * noise[1]
    elif flavor == 1:      # independent channels
        L = base + 0.25 * noise[0]
        R = 0.4 * np.sin(2 * np.pi * (f0 * 1.31) * t) + 0.25 * noise[1]
    elif flavor == 2:      # phase-inverted
        L = base + 0.05 * noise[0]
        R = -base + 0.05 * noise[1]
    else:                  # hard-panned
        L = base + 0.02 * noise[0]
        R = 0.02 * noise[1]
    return np.stack([L, R])


@pytest.mark.parametrize("lm,bitrate", [
    (0, 32000), (0, 96000),
    pytest.param(1, 64000, marks=pytest.mark.skipif(
        not HEAVY, reason="set OPUS_TPU_HEAVY=1 for larger frames")),
    # the north-star 20 ms stereo config always runs, just smaller
    # outside OPUS_TPU_HEAVY
    (3, 96000),
])
def test_stereo_plan_bytes_equal_scalar(lm, bitrate):
    n = M.short_mdct_size << lm
    with enable_x64():
        rng = np.random.default_rng(4000 + bitrate + lm)
        Bn = 4 if (HEAVY or lm < 3) else 2
        n_frames = 3 if (HEAVY or lm < 3) else 2
        nbytes = be.cbr_bytes(bitrate, n, 48000, 1275)

        encs = []
        for b in range(Bn):
            e = CeltEncoder(48000, 2)
            e.complexity = 0
            e.vbr = False
            e.bitrate = bitrate
            encs.append(e)
        xfs = [StereoTransform(lm) for _ in range(Bn)]
        state = be.init_state_stereo(Bn, dtype=jnp.float64)

        mismatches = []
        for fi in range(n_frames):
            Xs, Ys, logEs, bandEs, pcms = [], [], [], [], []
            for b in range(Bn):
                pcm = _stereo_pcm(rng, n, b, fi, b % 4)
                pcms.append(pcm)
                Xb, Yb, logEb, bandEb = xfs[b].frame(pcm)
                Xs.append(np.asarray(Xb))
                Ys.append(np.asarray(Yb))
                logEs.append(np.asarray(logEb))
                bandEs.append(np.asarray(bandEb))
            X = jnp.asarray(np.stack(Xs))
            Y = jnp.asarray(np.stack(Ys))
            logE = jnp.asarray(np.stack(logEs))
            bandE = jnp.asarray(np.stack(bandEs))

            with jax.disable_jit():
                c, state = be.plan_from_spectrum_stereo(
                    X, Y, logE, bandE, state,
                    jnp.full((Bn,), nbytes, jnp.int32),
                    jnp.zeros((Bn,), bool),
                    jnp.full((Bn,), bitrate, jnp.int32), lm=lm,
                    exact=True)
            ops = np.asarray(c.ops)

            for b in range(Bn):
                want = encs[b].encode_with_ec(pcms[b], n, nbytes)
                got, got_rng = _exec_plan(ops[b], nbytes)
                if got != want:
                    mismatches.append((fi, b))
                else:
                    assert got_rng == encs[b].rng
                    if rt.native_available():
                        gnat, rnat = rt.encode_plan(ops[b], nbytes)
                        assert gnat == want
                        assert rnat == encs[b].rng
        assert not mismatches, f"byte mismatches at {mismatches}"


ORACLE = os.path.join(os.path.dirname(__file__), "..", "tools",
                      "oracle", "build")
DEMO = os.path.join(ORACLE, "opus_demo")


@pytest.mark.skipif(not os.path.exists(DEMO),
                    reason="oracle binaries missing")
def test_stereo_batch_oracle_decode(tmp_path):
    """The float32 stereo lane's packets must decode cleanly in the
    REFERENCE decoder (opus_demo -d) with matching final ranges and
    sane fidelity — the production-dtype validity gate."""
    import struct
    import subprocess

    from opus_codec_tpu.bitstream import packet as pkt_mod
    from opus_codec_tpu.types import Bandwidth, CodecMode

    lm = 0
    n = M.short_mdct_size << lm
    Bn = 2
    n_frames = 6
    bitrate = 96000
    nbytes = be.cbr_bytes(bitrate, n, 48000, 1275)
    toc = pkt_mod.gen_toc(CodecMode.CELT_ONLY, 400 >> lm,
                          Bandwidth.FULLBAND, 2)
    rng = np.random.default_rng(5)

    st = be.init_stream_state_stereo(Bn, dtype=jnp.float32)
    packets = [[] for _ in range(Bn)]
    pcm_all = [[] for _ in range(Bn)]
    for fi in range(n_frames):
        pcm = np.stack([_stereo_pcm(rng, n, b, fi, (b + fi) % 4)
                        for b in range(Bn)])
        with jax.disable_jit():
            c, st = be.celt_encode_batch_plan_stereo(
                jnp.asarray(pcm, jnp.float32), st,
                jnp.full((Bn,), nbytes, jnp.int32),
                jnp.full((Bn,), bitrate, jnp.int32), lm=lm)
        ops = np.asarray(c.ops)
        for b in range(Bn):
            data, rng_fin = _exec_plan(ops[b], nbytes)
            packets[b].append((bytes([toc]) + data, rng_fin))
            pcm_all[b].append(pcm[b])

    for b in range(Bn):
        bit = str(tmp_path / f"s{b}.bit")
        with open(bit, "wb") as f:
            for p, r in packets[b]:
                f.write(struct.pack(">II", len(p), r) + p)
        out = str(tmp_path / f"s{b}.sw")
        r = subprocess.run([DEMO, "-d", "48000", "2", bit, out],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert "range mismatch" not in r.stderr.lower()
        raw = np.fromfile(out, dtype="<i2").astype(np.float64) / 32768
        dec = raw.reshape(-1, 2).T
        orig = np.concatenate(pcm_all[b], axis=-1)
        # crude delay-aligned SNR sanity (2.5 ms frames, 96 kbps)
        bestsnr = -1e9
        nn = orig.shape[1] - 200
        for lag in range(200):
            a = orig[:, :nn].ravel()
            d = dec[:, lag:lag + nn].ravel()
            e = d - a
            bestsnr = max(bestsnr, 10 * np.log10(
                np.dot(a, a) / max(np.dot(e, e), 1e-30)))
        assert bestsnr > 3.0, f"stream {b}: SNR {bestsnr:.1f} dB"


def test_stereo_state_matches_scalar():
    """Carried stereo state (oldBandE [2, nb], intensity hysteresis,
    stereo_saving) must track the scalar encoder across frames."""
    lm = 0
    n = M.short_mdct_size << lm
    with enable_x64():
        rng = np.random.default_rng(11)
        nbytes = be.cbr_bytes(64000, n, 48000, 1275)
        e = CeltEncoder(48000, 2)
        e.complexity = 0
        e.vbr = False
        e.bitrate = 64000
        xf = StereoTransform(lm)
        state = be.init_state_stereo(1, dtype=jnp.float64)

        for fi in range(4):
            pcm = _stereo_pcm(rng, n, 0, fi, fi % 4)
            Xb, Yb, logEb, bandEb = xf.frame(pcm)
            with jax.disable_jit():
                c, state = be.plan_from_spectrum_stereo(
                    jnp.asarray(Xb)[None], jnp.asarray(Yb)[None],
                    jnp.asarray(logEb)[None], jnp.asarray(bandEb)[None],
                    state, jnp.full((1,), nbytes, jnp.int32),
                    jnp.zeros((1,), bool),
                    jnp.full((1,), 64000, jnp.int32), lm=lm, exact=True)
            e.encode_with_ec(pcm, n, nbytes)
            np.testing.assert_allclose(
                np.asarray(state.oldBandE)[0], e.oldBandE[:2],
                rtol=0, atol=1e-9, err_msg=f"frame {fi}")
            assert int(np.asarray(state.intensity)[0]) == e.intensity, fi
            np.testing.assert_allclose(
                float(np.asarray(state.stereo_saving)[0]),
                e.stereo_saving, rtol=0, atol=1e-9, err_msg=f"frame {fi}")
            assert int(np.asarray(state.lastCodedBands)[0]) == \
                e.lastCodedBands, fi
