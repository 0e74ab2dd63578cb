"""Batched jnp pipeline vs scalar reference implementations."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from opus_codec_tpu.celt import batch as BT
from opus_codec_tpu.celt import bands as B_
from opus_codec_tpu.celt import energy as E_
from opus_codec_tpu.celt.mdct import imdct_frame, mdct_forward
from opus_codec_tpu.celt.modes import standard_mode

M = standard_mode()


def test_preemphasis_matches_scalar():
    rng = np.random.default_rng(0)
    B, N = 4, 960
    pcm = rng.standard_normal((B, N)) * 0.5
    mem = rng.standard_normal(B) * 100
    out, new_mem = BT.preemphasis_batch(jnp.asarray(pcm), jnp.asarray(mem))
    out = np.asarray(out)
    for b in range(B):
        m_ = mem[b]
        exp = np.empty(N)
        for i in range(N):
            x = pcm[b, i] * 32768.0
            exp[i] = x - m_
            m_ = 0.8500061035 * x
        np.testing.assert_allclose(out[b], exp, rtol=1e-3, atol=12)
        np.testing.assert_allclose(float(new_mem[b]), m_, rtol=1e-3)


def test_mdct_forward_batch_matches_scalar():
    rng = np.random.default_rng(1)
    B = 3
    x = rng.standard_normal((B, 960 + M.overlap))
    got = np.asarray(BT.mdct_forward_batch(jnp.asarray(x), 960))
    exp = mdct_forward(x, M.window)
    np.testing.assert_allclose(got, exp, rtol=2e-4, atol=2e-4)


def test_band_energy_and_normalise_match_scalar():
    rng = np.random.default_rng(2)
    B = 3
    spec = rng.standard_normal((B, 960))
    bandE = np.asarray(BT.band_energies_batch(jnp.asarray(spec), 3))
    X = np.asarray(BT.normalise_batch(jnp.asarray(spec),
                                      jnp.asarray(bandE), 3))
    for b in range(B):
        eb = B_.compute_band_energies(M, spec[b][None], 21, 3)
        np.testing.assert_allclose(bandE[b], eb[0], rtol=1e-4)
        Xb = B_.normalise_bands(M, spec[b][None], eb, 21, 8)
        np.testing.assert_allclose(X[b], Xb[0], rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("n_blocks", [1, 8])
def test_imdct_batch_matches_scalar(n_blocks):
    rng = np.random.default_rng(3)
    B = 2
    spec = rng.standard_normal((B, 960))
    tail = rng.standard_normal((B, M.overlap // 2))
    frame, new_tail = BT.imdct_batch(jnp.asarray(spec), jnp.asarray(tail),
                                     n_blocks)
    for b in range(B):
        exp_f, exp_t = imdct_frame(spec[b], M.window, n_blocks, tail[b])
        np.testing.assert_allclose(np.asarray(frame[b]), exp_f,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(new_tail[b]), exp_t,
                                   rtol=2e-4, atol=2e-4)


def test_deemphasis_batch_matches_scalar():
    rng = np.random.default_rng(4)
    B, N = 3, 960
    sig = rng.standard_normal((B, N)) * 1000
    mem = rng.standard_normal(B) * 10
    pcm, new_mem = BT.deemphasis_batch(jnp.asarray(sig, jnp.float64),
                                       jnp.asarray(mem, jnp.float64))
    pcm = np.asarray(pcm)
    for b in range(B):
        m_ = mem[b]
        exp = np.empty(N)
        for i in range(N):
            t = sig[b, i] + m_
            m_ = 0.8500061035 * t
            exp[i] = t / 32768.0
        np.testing.assert_allclose(pcm[b], exp, rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(float(new_mem[b]), m_, rtol=1e-4)


def test_end_to_end_device_roundtrip():
    """analysis -> synthesis on device reconstructs the signal (long
    blocks, fully-coded unit-gain path)."""
    rng = np.random.default_rng(5)
    B, N = 4, 960
    frames = 4
    # band-limited input: bins above eBands[21] (20 kHz) are never coded
    t = np.arange(frames * N)
    freqs = rng.uniform(100, 15000, (B, 24))
    amps = rng.uniform(0.01, 0.1, (B, 24))
    phases = rng.uniform(0, 2 * np.pi, (B, 24))
    sig = (amps[:, :, None] * np.sin(
        2 * np.pi * freqs[:, :, None] * t[None, None, :] / 48000
        + phases[:, :, None])).sum(axis=1)
    pre = np.zeros((B, N + M.overlap))
    pmem = jnp.zeros(B)
    tail = jnp.zeros((B, M.overlap // 2))
    dmem = jnp.zeros(B)
    outs = []
    hist = np.zeros((B, M.overlap))
    for f in range(frames):
        block = np.concatenate([hist, sig[:, f * N:(f + 1) * N]], axis=1)
        hist = block[:, -M.overlap:]
        X, bandE, bandLogE, pmem = BT.celt_analysis_batch(
            jnp.asarray(block), pmem)
        pcm, tail, dmem = BT.celt_synthesis_batch(X, bandLogE, tail, dmem)
        outs.append(np.asarray(pcm))
    out = np.concatenate(outs, axis=1)
    # find the pipeline delay (expected: overlap) and check reconstruction
    best = (-1e9, 0)
    for lag in range(0, 3 * M.overlap):
        n = min(sig.shape[1] - lag, out.shape[1] - lag) - N
        a = sig[:, N:N + n]
        b = out[:, N + lag:N + lag + n]
        err = a - b
        snr = 10 * np.log10((a ** 2).sum() / max((err ** 2).sum(), 1e-30))
        if snr > best[0]:
            best = (snr, lag)
    assert best[0] > 25, f"device roundtrip SNR {best[0]:.1f} dB @ {best[1]}"
    assert best[1] == M.overlap
