"""Feature extraction + deep PLC driver tests (synthetic weights).

The reference tree ships no weight blobs (they are fetched at build
time), so numerical parity against the C runtime is not testable here;
these tests pin the analysis math (Burg, cepstrum, DCT, pitch grid) and
drive the full PLC state machine end-to-end.
"""
import numpy as np
import pytest

from opus_codec_tpu.dnn import features as ft
from opus_codec_tpu.dnn import weights as wt
from opus_codec_tpu.dnn.fargan import FarganModel
from opus_codec_tpu.dnn.lpcnet_plc import (DeepPLC, PLCModel,
                                           PLC_FEATURE_DIM)
from opus_codec_tpu.dnn.pitchdnn import (Conv2dLayer, Conv2dState, PitchDNN,
                                         compute_conv2d)

from test_dnn import _dense_arrays, _fargan_blob, _gru_arrays


def test_dct_orthonormal():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(18).astype(np.float32)
    np.testing.assert_allclose(ft.idct(ft.dct(x)), x, atol=1e-5)
    # Parseval
    np.testing.assert_allclose(np.sum(ft.dct(x) ** 2), np.sum(x ** 2),
                               rtol=1e-5)


def test_band_energy_parseval():
    """Triangular bands tile the spectrum: sum of band energies ==
    2*sum|X|^2 up to the doubled edge bands."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal(ft.WINDOW_SIZE).astype(np.float32)
    X = np.fft.rfft(x) / ft.WINDOW_SIZE
    E = ft.compute_band_energy(X)
    p = np.abs(X[:ft.EBAND5MS[-1] * 4 + 1]) ** 2
    # interior mass counted once, edges twice; just sanity-band it
    assert 0.5 * np.sum(p) < np.sum(E) < 2.5 * np.sum(p)


def test_burg_whitens_ar_process():
    """Burg LPC on a known AR(2) process recovers the poles."""
    rng = np.random.default_rng(2)
    a1, a2 = 1.6, -0.81
    n = 400
    x = np.zeros(n)
    e = rng.standard_normal(n) * 0.1
    for i in range(2, n):
        x[i] = a1 * x[i - 1] + a2 * x[i - 2] + e[i]
    A, nrg = ft.silk_burg_analysis(x.astype(np.float32), 1e-4, n, 1, 2)
    np.testing.assert_allclose(A, [a1, a2], atol=0.05)
    assert nrg < 0.5 * np.sum(x ** 2)


def test_burg_cepstral_analysis_shape():
    rng = np.random.default_rng(3)
    x = (1000 * np.sin(2 * np.pi * 200 * np.arange(160) / 16000)
         + rng.standard_normal(160)).astype(np.float32)
    c = ft.burg_cepstral_analysis(x)
    assert c.shape == (36,)
    assert np.all(np.isfinite(c))


def test_levinson_matches_numpy_solve():
    rng = np.random.default_rng(4)
    # make a valid autocorrelation from a random signal
    x = rng.standard_normal(1000)
    ac = np.array([np.dot(x[:1000 - k], x[k:]) for k in range(17)])
    lpc = ft._levinson(ac.copy(), 16)
    # Levinson solves R a = r (when no early bailout)
    import scipy.linalg as sla  # scipy is available in the image
    R = sla.toeplitz(ac[:16])
    want = np.linalg.solve(R, -ac[1:17])
    # lpcn_lpc's convention: y = x + sum(lpc[j] x[-j-1]) whitens, i.e.
    # lpc solves R a = -r directly (small deviation from the exact
    # solve comes from the doubled error update / 30 dB bailout).
    np.testing.assert_allclose(lpc, want, atol=5e-3)


def test_feature_extractor_streaming():
    ext = ft.LpcNetFeatures()
    t = np.arange(160 * 6)
    sig = (8000 * np.sin(2 * np.pi * 125 * t / 16000)).astype(np.float32)
    feats = [ext.compute(sig[i * 160:(i + 1) * 160]) for i in range(6)]
    f = np.stack(feats)
    assert f.shape == (6, 36)
    assert np.all(np.isfinite(f))
    # Pitch feature settles near the true 128-sample period:
    # dnn_pitch = log2(256/period) - 1.5 -> period 128 => -0.5
    from opus_codec_tpu.dnn.fargan import features_to_period
    period = features_to_period(f[-1])
    assert 120 <= period <= 136, f"period {period}"
    # voicing correlation high for a pure tone
    assert f[-1][ft.NB_BANDS + 1] > 0.3


def test_conv2d_streaming_time():
    """compute_conv2d keeps a ktime-deep history (nnet_arch.h:215-227)."""
    rng = np.random.default_rng(5)
    lay = Conv2dLayer(rng.standard_normal((2, 1, 3, 3)).astype(np.float32),
                      None, 1, 2, 3, 3)
    st = Conv2dState(lay, 6)
    frames = [rng.standard_normal((1, 8)).astype(np.float32)
              for _ in range(4)]
    outs = [compute_conv2d(lay, st, f, 6, 0) for f in frames]
    # direct computation for the last step: window of 3 time steps
    want = np.zeros((2, 6), np.float32)
    buf = np.stack([frames[1][0], frames[2][0], frames[3][0]])
    for t in range(3):
        for h in range(3):
            for o in range(2):
                want[o] += lay.weights[o, 0, t, h] * buf[t, h:h + 6]
    np.testing.assert_allclose(outs[3], want, rtol=1e-5)


def _pitchdnn_blob(rng):
    arrays = []
    arrays += _dense_arrays("dense_if_upsampler_1", 88, 16, rng)
    arrays += _dense_arrays("dense_if_upsampler_2", 16, 32, rng)
    for name, (o, i) in (("conv2d_1", (8, 1)), ("conv2d_2", (1, 8))):
        arrays.append(wt.WeightArray(
            name + "_weight_float", wt.WEIGHT_TYPE_float,
            (0.3 * rng.standard_normal(o * i * 9)).astype("<f4")))
        arrays.append(wt.WeightArray(
            name + "_bias", wt.WEIGHT_TYPE_float,
            (0.05 * rng.standard_normal(o)).astype("<f4")))
    arrays += _dense_arrays("dense_downsampler", 224 + 32, 24, rng)
    arrays += _gru_arrays("gru_1", 24, 16, rng)
    arrays += _dense_arrays("dense_final_upsampler", 16, 192, rng)
    return wt.write_weights(arrays)


def test_pitchdnn_synthetic():
    rng = np.random.default_rng(6)
    dnn = PitchDNN.from_blob(_pitchdnn_blob(rng))
    p = dnn.compute(rng.standard_normal(88).astype(np.float32),
                    rng.standard_normal(224).astype(np.float32))
    assert np.isfinite(p)
    assert -1.6 < p < 1.6


def _plc_blob(rng):
    arrays = []
    arrays += _dense_arrays("plc_dense_in", PLC_FEATURE_DIM, 32, rng)
    arrays += _gru_arrays("plc_gru1", 32, 24, rng)
    arrays += _gru_arrays("plc_gru2", 24, 24, rng)
    arrays += _dense_arrays("plc_dense_out", 24, 20, rng, scale=0.1)
    return wt.write_weights(arrays)


def test_deep_plc_state_machine():
    rng = np.random.default_rng(7)
    plc = DeepPLC(PLCModel.from_blob(_plc_blob(rng)),
                  FarganModel.from_blob(_fargan_blob(rng)))
    t = np.arange(160 * 20)
    sig = (0.3 * np.sin(2 * np.pi * 125 * t / 16000)).astype(np.float32)
    # feed good audio
    for i in range(16):
        plc.update(sig[i * 160:(i + 1) * 160])
    assert plc.blend == 0
    # lose three frames
    outs = [plc.conceal() for _ in range(3)]
    for o in outs:
        assert o.shape == (160,)
        assert np.all(np.isfinite(o))
        assert np.max(np.abs(o)) < 4.0
    assert plc.blend == 1 and plc.loss_count == 3
    # recovery
    plc.update(sig[16 * 160:17 * 160])
    assert plc.blend == 0 and plc.loss_count == 0
    # second loss event re-primes
    out = plc.conceal()
    assert np.all(np.isfinite(out))


def test_deep_plc_fec_queue():
    rng = np.random.default_rng(8)
    plc = DeepPLC(PLCModel.from_blob(_plc_blob(rng)),
                  FarganModel.from_blob(_fargan_blob(rng)))
    sig = (0.1 * np.sin(2 * np.pi * 100 * np.arange(160 * 8) / 16000)
           ).astype(np.float32)
    for i in range(8):
        plc.update(sig[i * 160:(i + 1) * 160])
    feat = np.zeros(20, np.float32)
    feat[18] = np.log2(256.0 / 100) - 1.5
    plc.fec_add(feat)
    plc.fec_add(feat)
    plc.fec_add(feat)
    plc.conceal()
    assert plc.fec_read_pos > 0       # FEC features consumed
    assert plc.loss_count == 0        # FEC counts as known data
    plc.fec_clear()
    assert plc.fec_fill_pos == 0
