"""FWGAN legacy vocoder (dnn/fwgan.c; excluded from reference builds —
see module docstring of opus_codec_tpu.dnn.fwgan)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_dnn import _dense_arrays  # noqa: E402

from opus_codec_tpu.dnn import weights as wt  # noqa: E402
from opus_codec_tpu.dnn.fwgan import (FWGAN_FRAME_SIZE,  # noqa: E402
                                      CONT_PCM_INPUTS, FwganModel,
                                      FwganState, compute_wlpc,
                                      pitch_embeddings)


def _fwgan_blob(rng):
    a = []
    a += _dense_arrays("bfcc_with_corr_upsampler_fc", 35, 320, rng)
    ci = CONT_PCM_INPUTS + 1
    for i, name in enumerate(["cont_net_0", "cont_net_2", "cont_net_4",
                              "cont_net_6", "cont_net_8", "cont_net_10"]):
        a += _dense_arrays(name, ci if i == 0 else 96, 96, rng, scale=0.1)
    a += _dense_arrays("rnn_cont_fc_0", 96, 64, rng)
    outs = [96, 80, 64, 56, 48, 44, 40]
    ins = [64] + outs[:-1]
    for i in range(7):
        a += _dense_arrays(f"fwc{i + 1}_cont_fc_0", 96, ins[i], rng)
        a += _dense_arrays(f"fwc{i + 1}_fc_0", 2 * ins[i], outs[i], rng,
                           scale=0.15)
        a += _dense_arrays(f"fwc{i + 1}_fc_1_gate", outs[i], outs[i], rng)
    a += _dense_arrays("feat_in_conv1_conv", 320, 128, rng, scale=0.15)
    a += _dense_arrays("feat_in_nl1_gate", 128, 128, rng)
    a += _dense_arrays("rnn_gru_input", 128, 192, rng, scale=0.15)
    a += _dense_arrays("rnn_gru_recurrent", 64, 192, rng, scale=0.15)
    a += _dense_arrays("rnn_nl_gate", 64, 64, rng)
    return wt.write_weights(a)


def _features(rng):
    f = np.zeros(36, np.float32)
    f[:18] = 0.1 * rng.standard_normal(18)
    f[0] = 1.0
    f[18] = 0.3      # pitch feature -> period ~115
    f[19] = 0.5
    return f


def test_pitch_embedding_unit_circle():
    phase = np.array([1.0, 0.0], np.float32)
    pe = pitch_embeddings(phase, 2 * np.pi / 100)
    assert pe.shape == (80,)
    # phasor stays unit norm after renormalisation
    assert abs(phase[0] ** 2 + phase[1] ** 2 - 1) < 1e-6
    # embedding is sin/cos-like: bounded by 1
    assert np.abs(pe).max() <= 1.0 + 1e-6


def test_wlpc_gamma_weighting():
    rng = np.random.default_rng(0)
    f = _features(rng)
    lpc = compute_wlpc(f)
    assert lpc.shape == (16,)
    assert np.all(np.isfinite(lpc))


def test_fwgan_cont_and_synthesis():
    rng = np.random.default_rng(1)
    model = FwganModel.from_blob(_fwgan_blob(rng))
    st = FwganState(model)
    pcm0 = (0.1 * np.sin(2 * np.pi * 100 * np.arange(CONT_PCM_INPUTS)
                         / 16000)).astype(np.float32)
    f = _features(rng)
    st.cont_init(pcm0, f)
    assert st.cont_initialized == 2
    out1 = st.synthesize(f)
    out2 = st.synthesize(_features(rng))
    assert out1.shape == (FWGAN_FRAME_SIZE,)
    assert np.all(np.isfinite(out1)) and np.all(np.isfinite(out2))
    i16 = st.synthesize_int(f)
    assert i16.dtype == np.int16 and len(i16) == FWGAN_FRAME_SIZE


def test_fwgan_determinism_and_reset():
    rng = np.random.default_rng(2)
    blob = _fwgan_blob(rng)
    f = _features(rng)
    pcm0 = (0.05 * np.random.default_rng(5)
            .standard_normal(CONT_PCM_INPUTS)).astype(np.float32)

    def run():
        st = FwganState(FwganModel.from_blob(blob))
        st.cont_init(pcm0, f)
        return np.concatenate([st.synthesize(f) for _ in range(3)])

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)
