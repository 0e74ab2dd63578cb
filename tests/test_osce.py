"""OSCE tests: nndsp layer mechanics, feature extraction math, and
LACE/NoLACE end-to-end on synthetic weights."""
import numpy as np
import pytest

from opus_codec_tpu.dnn import nndsp, weights as wt
from opus_codec_tpu.dnn.nnet import LinearLayer
from opus_codec_tpu.dnn.osce import (LaceModel, NoLaceModel, OsceEnhancer,
                                     FRAME_SIZE, OVERLAP_SIZE)
from opus_codec_tpu.dnn.osce_features import (OsceFeatureState,
                                              SilkFrameInfo,
                                              apply_filterbank,
                                              log_spectrum_from_lpc,
                                              noisy_cepstrum,
                                              CENTER_BINS_NOISY,
                                              BAND_WEIGHTS_NOISY,
                                              OSCE_NO_PITCH_VALUE,
                                              TYPE_VOICED)

from test_dnn import _dense_arrays, _gru_arrays


# ----------------------------------------------------------------------
# nndsp

def test_adaconv_identity_kernel():
    """With a kernel layer that always emits a unit impulse at the last
    tap and gain layer a == 0 (gain == 1), adaconv is the identity once
    the kernel has stabilised."""
    rng = np.random.default_rng(0)
    K, F, OV = 4, 16, 8
    kernel_W = np.zeros((K, 3), np.float32)
    kernel_b = np.zeros(K, np.float32)
    kernel_b[K - 1] = 1.0         # impulse at the causal tap
    gain_W = np.zeros((1, 3), np.float32)
    kernel_layer = LinearLayer(kernel_W, kernel_b, 3, K)
    gain_layer = LinearLayer(gain_W, np.zeros(1, np.float32), 3, 1)
    st = nndsp.AdaConvState()
    win = nndsp.compute_overlap_window(OV)
    feats = np.zeros(3, np.float32)
    frames = [rng.standard_normal(F).astype(np.float32)
              for _ in range(3)]
    outs = [nndsp.adaconv_process_frame(st, f, feats, kernel_layer,
                                        gain_layer, F, OV, 1, 1, K,
                                        0.0, 0.0, win)
            for f in frames]
    # after the first frame the previous kernel equals the current one
    np.testing.assert_allclose(outs[1], frames[1], atol=1e-5)
    np.testing.assert_allclose(outs[2], frames[2], atol=1e-5)


def test_adacomb_unvoiced_passthrough():
    """Zero comb kernel + zero-gain layers: output = global_gain * x."""
    F, OV, K = 16, 8, 4
    zeros3 = np.zeros(3, np.float32)
    kernel_layer = LinearLayer(np.zeros((K, 3), np.float32),
                               np.full(K, 0.0, np.float32), 3, K)
    gain_layer = LinearLayer(np.zeros((1, 3), np.float32),
                             np.full(1, 100.0, np.float32), 3, 1)
    gg_layer = LinearLayer(np.zeros((1, 3), np.float32),
                           np.zeros(1, np.float32), 3, 1)
    st = nndsp.AdaCombState()
    win = nndsp.compute_overlap_window(OV)
    x = np.ones(F, np.float32)
    y1 = nndsp.adacomb_process_frame(st, x, zeros3, kernel_layer,
                                     gain_layer, gg_layer, 7, F, OV, K,
                                     0.0, 0.0, 0.0, win)
    y2 = nndsp.adacomb_process_frame(st, x, zeros3, kernel_layer,
                                     gain_layer, gg_layer, 7, F, OV, K,
                                     0.0, 0.0, 0.0, win)
    # global_gain = exp(0) = 1; comb gain = exp(0-100) ~ 0
    np.testing.assert_allclose(y2, x, atol=1e-4)


def test_adashape_zero_weights_identity():
    F, k = 16, 4
    fd = 3
    a1f = LinearLayer(np.zeros((F, 2 * fd), np.float32), None, 2 * fd, F)
    a1t = LinearLayer(np.zeros((F, 2 * (F // k + 1)), np.float32), None,
                      2 * (F // k + 1), F)
    a2 = LinearLayer(np.zeros((F, 2 * F), np.float32), None, 2 * F, F)
    st = nndsp.AdaShapeState()
    x = np.linspace(-1, 1, F).astype(np.float32)
    y = nndsp.adashape_process_frame(st, x, np.zeros(fd, np.float32),
                                     a1f, a1t, a2, fd, F, k)
    np.testing.assert_allclose(y, x, atol=1e-6)   # exp(0) * x


# ----------------------------------------------------------------------
# features

def test_filterbank_covers_flat_spectrum():
    x = np.ones(161, np.float32)
    out = apply_filterbank(x, CENTER_BINS_NOISY, BAND_WEIGHTS_NOISY)
    assert out.shape == (18,)
    assert np.all(out > 0)


def test_log_spectrum_from_lpc_flat_for_unit_filter():
    spec = log_spectrum_from_lpc(np.zeros(16, np.int16), 16)
    # A(z) = 1: inverse magnitude 1 in every bin -> nearly flat bands
    assert spec.shape == (64,)
    assert np.std(spec) < 0.4


def test_noisy_cepstrum_energy_in_c0():
    sig = 0.1 * np.sin(2 * np.pi * 440 * np.arange(320) / 16000)
    c = noisy_cepstrum(sig.astype(np.float32))
    loud = noisy_cepstrum((10 * sig).astype(np.float32))
    assert loud[0] > c[0]          # DC cepstral coeff tracks level


def test_feature_state_pitch_and_shapes():
    st = OsceFeatureState()
    rng = np.random.default_rng(1)
    xq = (1000 * rng.standard_normal(320)).astype(np.int16)
    frame = SilkFrameInfo(
        xq=xq, pitch_lags=np.array([100, 100, 120, 120]),
        ltp_coef_q14=(4000 * rng.standard_normal((4, 5))).astype(np.int16),
        gains_q16=np.full(4, 1 << 16, np.int32),
        pred_coef_q12=(500 * rng.standard_normal((2, 16))).astype(np.int16),
        signal_type=TYPE_VOICED, num_bits=300)
    feats, numbits, periods = st.calculate(frame)
    assert feats.shape == (4, 93)
    assert np.all(np.isfinite(feats))
    np.testing.assert_array_equal(periods, [100, 100, 120, 120])
    assert numbits[0] == 300 and 0 < numbits[1] <= 300
    # unvoiced -> NO_PITCH
    frame.signal_type = 1
    _, _, periods2 = st.calculate(frame)
    assert np.all(periods2 == OSCE_NO_PITCH_VALUE)
    # even subframes recompute spectra, odd copy them
    np.testing.assert_array_equal(feats[0][:64], feats[1][:64])
    np.testing.assert_array_equal(feats[2][64:82], feats[3][64:82])


# ----------------------------------------------------------------------
# synthetic LACE / NoLACE

H, C, P = 16, 8, 8         # hidden, cond, pitch-embedding dims


def _fnet_arrays(rng, prefix):
    arrays = [wt.WeightArray(
        f"{prefix}_pitch_embedding_weights_float", wt.WEIGHT_TYPE_float,
        (0.3 * rng.standard_normal(301 * P)).astype("<f4"))]
    arrays += _dense_arrays(f"{prefix}_fnet_conv1", 93 + P + 16, H, rng)
    arrays += _dense_arrays(f"{prefix}_fnet_conv2", 8 * H, 4 * C, rng)
    arrays += _dense_arrays(f"{prefix}_fnet_tconv", 4 * C, 4 * C, rng)
    arrays += _gru_arrays(f"{prefix}_fnet_gru", C, C, rng)
    return arrays


def _adaptive_arrays(rng, name, kernel_out, comb):
    arrays = _dense_arrays(f"{name}_kernel", C, kernel_out, rng,
                           scale=0.2)
    arrays += _dense_arrays(f"{name}_gain", C, 1, rng, scale=0.1)
    if comb:
        arrays += _dense_arrays(f"{name}_global_gain", C, 1, rng,
                                scale=0.1)
    return arrays


def _lace_blob(rng):
    arrays = _fnet_arrays(rng, "lace")
    arrays += _adaptive_arrays(rng, "lace_cf1", 10, True)
    arrays += _adaptive_arrays(rng, "lace_cf2", 10, True)
    arrays += _adaptive_arrays(rng, "lace_af1", 8, False)
    return wt.write_weights(arrays)


def _nolace_blob(rng):
    arrays = _fnet_arrays(rng, "nolace")
    arrays += _adaptive_arrays(rng, "nolace_cf1", 10, True)
    arrays += _adaptive_arrays(rng, "nolace_cf2", 10, True)
    chans = [(1, 2), (2, 2), (2, 2), (2, 1)]
    for i, (ic, oc) in enumerate(chans):
        arrays += _adaptive_arrays(rng, f"nolace_af{i+1}", ic * oc * 8,
                                   False)
    for name in ("cf1", "cf2", "af1", "af2", "af3"):
        arrays += _dense_arrays(f"nolace_post_{name}", 2 * C, C, rng)
    for i in (1, 2, 3):
        arrays += _dense_arrays(f"nolace_tdshape{i}_alpha1_f", 2 * C, 80,
                                rng, scale=0.05)
        arrays += _dense_arrays(f"nolace_tdshape{i}_alpha1_t", 2 * 21, 80,
                                rng, scale=0.05)
        arrays += _dense_arrays(f"nolace_tdshape{i}_alpha2", 160, 80, rng,
                                scale=0.05)
    return wt.write_weights(arrays)


def _silk_frame(rng, xq):
    return SilkFrameInfo(
        xq=xq, pitch_lags=np.array([90, 90, 95, 95]),
        ltp_coef_q14=(3000 * rng.standard_normal((4, 5))).astype(np.int16),
        gains_q16=np.full(4, 1 << 16, np.int32),
        pred_coef_q12=(400 * rng.standard_normal((2, 16))).astype(np.int16),
        signal_type=TYPE_VOICED, num_bits=250)


def test_lace_enhancer():
    rng = np.random.default_rng(2)
    model = LaceModel.from_blob(_lace_blob(rng))
    assert model.fnet.cond_dim == C
    assert model.cf1_cfg.kernel_size == 10    # derived from blob
    enh = OsceEnhancer(model)
    t = np.arange(320 * 5)
    sig = (6000 * np.sin(2 * np.pi * 170 * t / 16000)).astype(np.int16)
    outs = []
    for i in range(5):
        outs.append(enh.enhance_frame(
            _silk_frame(rng, sig[i * 320:(i + 1) * 320])))
    # first two frames are muted copies (reset counter)
    np.testing.assert_array_equal(outs[0], sig[:320])
    for o in outs:
        assert o.dtype == np.int16 and o.shape == (320,)
    assert np.max(np.abs(outs[4].astype(np.int32))) <= 32767


def test_nolace_enhancer():
    rng = np.random.default_rng(3)
    model = NoLaceModel.from_blob(_nolace_blob(rng))
    enh = OsceEnhancer(model)
    rng2 = np.random.default_rng(4)
    sig = (3000 * rng2.standard_normal(320 * 4)).astype(np.int16)
    for i in range(4):
        out = enh.enhance_frame(_silk_frame(rng, sig[i * 320:(i + 1) * 320]))
        assert np.all(np.isfinite(out.astype(np.float32)))
    # reset re-mutes
    enh.reset()
    out = enh.enhance_frame(_silk_frame(rng, sig[:320]))
    np.testing.assert_array_equal(out, sig[:320])
