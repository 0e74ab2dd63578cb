"""DNN subsystem tests: weight-blob format, layer semantics vs direct
emulations of the reference C loops (vec.h / nnet.c), FARGAN and
RDO-VAE end-to-end on synthetic blobs."""
import numpy as np
import pytest

from opus_codec_tpu.dnn import nnet, weights as wt
from opus_codec_tpu.dnn.fargan import (FARGAN_FRAME_SIZE, FarganModel,
                                       FarganState, NB_FEATURES, NB_BANDS,
                                       PITCH_MAX_PERIOD)
from opus_codec_tpu.dnn.dred import RDOVAEDecoder, RDOVAEEncoder


# ----------------------------------------------------------------------
# Blob format

def test_blob_roundtrip():
    rng = np.random.default_rng(0)
    arrays = [
        wt.WeightArray("alpha_bias", wt.WEIGHT_TYPE_float,
                       rng.standard_normal(7).astype("<f4")),
        wt.WeightArray("beta_weights_int8", wt.WEIGHT_TYPE_int8,
                       rng.integers(-127, 127, 96).astype("<i1")),
        wt.WeightArray("gamma_idx", wt.WEIGHT_TYPE_int,
                       np.arange(5, dtype="<i4")),
    ]
    blob = wt.write_weights(arrays)
    assert len(blob) % wt.WEIGHT_BLOCK_SIZE == 0
    parsed = wt.parse_weights(blob)
    assert set(parsed) == {"alpha_bias", "beta_weights_int8", "gamma_idx"}
    for a in arrays:
        np.testing.assert_array_equal(parsed[a.name].data, a.data)
        assert parsed[a.name].type == a.type


def test_blob_rejects_garbage():
    with pytest.raises(ValueError):
        wt.parse_weights(b"\x00" * 32)          # truncated header
    good = wt.write_weights([wt.WeightArray(
        "x_bias", wt.WEIGHT_TYPE_float, np.zeros(4, "<f4"))])
    bad = bytearray(good)
    bad[4] = 9                                   # version
    with pytest.raises(ValueError):
        wt.parse_weights(bytes(bad))


# ----------------------------------------------------------------------
# Layer semantics vs direct C-loop emulation

def _sgemv_c(w_flat, rows, cols, x):
    """vec.h:110 sgemv: out[i] = sum_j w[j*rows+i]*x[j]."""
    out = np.zeros(rows, np.float32)
    for i in range(rows):
        for j in range(cols):
            out[i] += w_flat[j * rows + i] * x[j]
    return out


def _cgemv8x4_c(w_flat, scale, rows, cols, x):
    """vec.h cgemv8x4 (non-SU): quantise input, 8x4 row-major blocks."""
    xq = np.floor(0.5 + 127 * x).astype(np.int32)
    out = np.zeros(rows, np.float32)
    k = 0
    for i in range(0, rows, 8):
        for j in range(0, cols, 4):
            blk = w_flat[k:k + 32].astype(np.int32)
            for r in range(8):
                acc = 0
                for c in range(4):
                    acc += blk[r * 4 + c] * xq[j + c]
                out[i + r] += acc
            k += 32
    return out * scale


def _sparse_sgemv8x4_c(w_flat, idx, rows, x):
    """vec.h:124 sparse_sgemv8x4: blocks column-major w[c*8+r]."""
    out = np.zeros(rows, np.float32)
    p = 0
    k = 0
    for i in range(0, rows, 8):
        nb = int(idx[p]); p += 1
        for _ in range(nb):
            pos = int(idx[p]); p += 1
            for c in range(4):
                for r in range(8):
                    out[i + r] += w_flat[k + c * 8 + r] * x[pos + c]
            k += 32
    return out


def _sparse_cgemv8x4_c(w_flat, idx, scale, rows, x):
    """vec.h sparse_cgemv8x4 (non-SU): blocks row-major w[r*4+c]."""
    xq = np.floor(0.5 + 127 * x).astype(np.int32)
    out = np.zeros(rows, np.float32)
    p = 0
    k = 0
    for i in range(0, rows, 8):
        nb = int(idx[p]); p += 1
        for _ in range(nb):
            pos = int(idx[p]); p += 1
            for r in range(8):
                acc = 0
                for c in range(4):
                    acc += int(w_flat[k + r * 4 + c]) * xq[pos + c]
                out[i + r] += acc
            k += 32
    return out * scale


def test_dense_float_layout():
    rng = np.random.default_rng(1)
    W = rng.standard_normal((16, 12)).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    x = rng.standard_normal(12).astype(np.float32)
    blob = wt.write_weights(wt.pack_dense_float("lay", W, b))
    layer = wt.linear_init(wt.parse_weights(blob), "lay", 12, 16)
    want = _sgemv_c(np.ascontiguousarray(W.T).reshape(-1), 16, 12, x) + b
    np.testing.assert_allclose(layer.linear(x), want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(layer.W, W)


def test_dense_int8_layout():
    rng = np.random.default_rng(2)
    W8 = rng.integers(-127, 127, (16, 8)).astype(np.int8)
    scale = (rng.uniform(0.5, 1.5, 16) / 127).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    x = rng.uniform(-1, 1, 8).astype(np.float32)
    blob = wt.write_weights(wt.pack_dense_int8("q", W8, scale, b))
    layer = wt.linear_init(wt.parse_weights(blob), "q", 8, 16)
    assert layer.quantized_input
    blocks = []
    for i in range(0, 16, 8):
        for j in range(0, 8, 4):
            blocks.append(W8[i:i + 8, j:j + 4].reshape(-1))
    want = _cgemv8x4_c(np.concatenate(blocks), scale, 16, 8, x) + b
    np.testing.assert_allclose(layer.linear(x), want, rtol=1e-5, atol=1e-5)


def test_sparse_float_layout():
    rng = np.random.default_rng(3)
    W = rng.standard_normal((24, 16)).astype(np.float32)
    keep = rng.random((3, 4)) < 0.6
    for bi in range(3):     # zero dropped blocks so dense == sparse
        for bj in range(4):
            if not keep[bi, bj]:
                W[bi * 8:bi * 8 + 8, bj * 4:bj * 4 + 4] = 0
    b = rng.standard_normal(24).astype(np.float32)
    x = rng.standard_normal(16).astype(np.float32)
    blob = wt.write_weights(wt.pack_sparse_float("sp", W, b, keep))
    arrays = wt.parse_weights(blob)
    layer = wt.linear_init(arrays, "sp", 16, 24, sparse=True)
    idx = arrays["sp_weights_idx"].data
    wf = arrays["sp_weights_float"].data.view("<f4")
    want = _sparse_sgemv8x4_c(wf, idx, 24, x) + b
    np.testing.assert_allclose(layer.linear(x), want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(layer.W, W)


def test_sparse_int8_layout_and_diag():
    rng = np.random.default_rng(4)
    N = 8
    W8 = rng.integers(-127, 127, (3 * N, N)).astype(np.int8)
    keep = rng.random((3, 2)) < 0.7
    for bi in range(3):
        for bj in range(2):
            if not keep[bi, bj]:
                W8[bi * 8:bi * 8 + 8, bj * 4:bj * 4 + 4] = 0
    scale = (rng.uniform(0.5, 1.5, 3 * N) / 127).astype(np.float32)
    b = rng.standard_normal(3 * N).astype(np.float32)
    diag = rng.standard_normal(3 * N).astype(np.float32)
    x = rng.uniform(-1, 1, N).astype(np.float32)
    blob = wt.write_weights(
        wt.pack_sparse_int8("sq", W8, scale, b, keep, diag=diag))
    arrays = wt.parse_weights(blob)
    layer = wt.linear_init(arrays, "sq", N, 3 * N, sparse=True,
                           diagonal=True)
    idx = arrays["sq_weights_idx"].data
    wi = arrays["sq_weights_int8"].data
    want = _sparse_cgemv8x4_c(wi, idx, scale, 3 * N, x) + b
    want[:N] += diag[:N] * x
    want[N:2 * N] += diag[N:2 * N] * x
    want[2 * N:] += diag[2 * N:] * x
    np.testing.assert_allclose(layer.linear(x), want, rtol=1e-5, atol=1e-5)


def test_gru_semantics():
    """compute_generic_gru (nnet.c:71-100) against the written formula."""
    rng = np.random.default_rng(5)
    N, M = 8, 12
    Wi = rng.standard_normal((3 * N, M)).astype(np.float32) * 0.3
    bi = rng.standard_normal(3 * N).astype(np.float32) * 0.1
    Wr = rng.standard_normal((3 * N, N)).astype(np.float32) * 0.3
    br = rng.standard_normal(3 * N).astype(np.float32) * 0.1
    gi = nnet.LinearLayer(Wi, bi, M, 3 * N)
    gr = nnet.LinearLayer(Wr, br, N, 3 * N)
    state = rng.standard_normal(N).astype(np.float32) * 0.5
    x = rng.standard_normal(M).astype(np.float32)
    new = nnet.compute_generic_gru(gi, gr, state, x)
    zrh = Wi @ x + bi
    recur = Wr @ state + br
    zr = 1 / (1 + np.exp(-(zrh[:2 * N] + recur[:2 * N])))
    z, r = zr[:N], zr[N:]
    h = np.tanh(zrh[2 * N:] + recur[2 * N:] * r)
    np.testing.assert_allclose(new, z * state + (1 - z) * h, rtol=1e-5)


def test_conv1d_streaming():
    """compute_generic_conv1d equals a full convolution over the
    concatenated input history (ksize=2 case used everywhere)."""
    rng = np.random.default_rng(6)
    isz, osz = 10, 6
    W = rng.standard_normal((osz, 2 * isz)).astype(np.float32) * 0.4
    b = rng.standard_normal(osz).astype(np.float32) * 0.1
    layer = nnet.LinearLayer(W, b, 2 * isz, osz)
    st = nnet.conv1d_state(layer, isz)
    frames = [rng.standard_normal(isz).astype(np.float32) for _ in range(4)]
    outs = [nnet.compute_generic_conv1d(layer, st, f, isz,
                                        nnet.ACTIVATION_TANH)
            for f in frames]
    hist = np.concatenate([np.zeros(isz, np.float32)] + frames)
    for t, o in enumerate(outs):
        win = hist[t * isz:(t + 2) * isz]
        np.testing.assert_allclose(o, np.tanh(W @ win + b), rtol=1e-5)


def test_conv1d_dilated():
    """Dilated variant (nnet.c:132-150): taps stride by dilation."""
    rng = np.random.default_rng(7)
    isz, osz, dil = 6, 4, 2
    W = rng.standard_normal((osz, 2 * isz)).astype(np.float32) * 0.4
    layer = nnet.LinearLayer(W, None, 2 * isz, osz)
    st = nnet.conv1d_state(layer, isz, dilation=dil)
    frames = [rng.standard_normal(isz).astype(np.float32) for _ in range(5)]
    outs = [nnet.compute_generic_conv1d(layer, st, f, isz,
                                        nnet.ACTIVATION_LINEAR, dilation=dil)
            for f in frames]
    hist = np.concatenate([np.zeros(2 * isz, np.float32)] + frames)
    for t, o in enumerate(outs):
        # taps: frame t-dilation and frame t (in frame units)
        past = hist[t * isz:(t + 1) * isz]
        cur = hist[(t + dil) * isz:(t + dil + 1) * isz]
        np.testing.assert_allclose(o, W @ np.concatenate([past, cur]),
                                   rtol=1e-5, atol=1e-6)


# ----------------------------------------------------------------------
# Synthetic model builders

def _dense_arrays(name, nb_in, nb_out, rng, scale=0.3):
    W = (scale * rng.standard_normal((nb_out, nb_in))).astype(np.float32)
    b = (0.05 * rng.standard_normal(nb_out)).astype(np.float32)
    return wt.pack_dense_float(name, W, b)


def _gru_arrays(name, nb_in, N, rng):
    return (_dense_arrays(name + "_input", nb_in, 3 * N, rng)
            + _dense_arrays(name + "_recurrent", N, 3 * N, rng))


def _fargan_blob(rng, pembed_dim=8, cond_size=16, fwc0_out=24,
                 g1=16, g2=16, g3=16, skip=24):
    arrays = []
    arrays.append(wt.WeightArray(
        "cond_net_pembed_weights_float", wt.WEIGHT_TYPE_float,
        (0.3 * rng.standard_normal(224 * pembed_dim)).astype("<f4")))
    fdense1_out = 2 * cond_size
    arrays += _dense_arrays("cond_net_fdense1", NB_FEATURES + pembed_dim,
                            fdense1_out, rng)
    arrays += _dense_arrays("cond_net_fconv1", 2 * fdense1_out,
                            2 * cond_size, rng)
    arrays += _dense_arrays("cond_net_fdense2", 2 * cond_size,
                            4 * cond_size, rng)
    arrays += _dense_arrays("sig_net_cond_gain_dense", cond_size, 1, rng,
                            scale=0.05)
    input_size = cond_size + 2 * 40 + 4
    arrays += _dense_arrays("sig_net_fwc0_conv", 2 * input_size, fwc0_out,
                            rng)
    arrays += _dense_arrays("sig_net_fwc0_glu_gate", fwc0_out, fwc0_out, rng)
    arrays += _dense_arrays("sig_net_gain_dense_out", fwc0_out, 4, rng)
    prev = fwc0_out
    for k, N in zip((1, 2, 3), (g1, g2, g3)):
        arrays += _gru_arrays(f"sig_net_gru{k}", prev + 80, N, rng)
        arrays += _dense_arrays(f"sig_net_gru{k}_glu_gate", N, N, rng)
        prev = N
    skip_in = g1 + g2 + g3 + fwc0_out + 80
    arrays += _dense_arrays("sig_net_skip_dense", skip_in, skip, rng)
    arrays += _dense_arrays("sig_net_skip_glu_gate", skip, skip, rng)
    arrays += _dense_arrays("sig_net_sig_dense_out", skip, 40, rng)
    return wt.write_weights(arrays)


def _dred_blob(rng, F=20, latent=16, state=8):
    arrays = []
    # encoder
    arrays += _dense_arrays("enc_dense1", 2 * F, 16, rng)
    buf = 16
    for k in range(1, 6):
        N = 8
        arrays += _gru_arrays(f"enc_gru{k}", buf, N, rng)
        buf += N
        arrays += _dense_arrays(f"enc_conv{k}", 2 * buf, 8, rng)
        buf += 8
    arrays += _dense_arrays("enc_zdense", buf, latent, rng)
    arrays += _dense_arrays("gdense1", buf, 16, rng)
    arrays += _dense_arrays("gdense2", 16, state, rng)
    # decoder
    arrays += _dense_arrays("dec_hidden_init", state, 16, rng)
    arrays += _dense_arrays("dec_gru_init", 16, 5 * 8, rng)
    arrays += _dense_arrays("dec_dense1", latent, 16, rng)
    buf = 16
    for k in range(1, 6):
        N = 8
        arrays += _gru_arrays(f"dec_gru{k}", buf, N, rng)
        arrays += _dense_arrays(f"dec_glu{k}", N, N, rng)
        buf += N
        arrays += _dense_arrays(f"dec_conv{k}", 2 * buf, 8, rng)
        buf += 8
    arrays += _dense_arrays("dec_output", buf, 4 * F, rng)
    return wt.write_weights(arrays)


def _features(rng, period=100):
    f = (0.1 * rng.standard_normal(NB_FEATURES)).astype(np.float32)
    # features[NB_BANDS] encodes the pitch; invert features_to_period
    f = np.concatenate([f[:NB_BANDS],
                        [np.log2(256.0 / period) - 1.5],
                        f[NB_BANDS + 1:]]).astype(np.float32)
    return f


def test_fargan_synthetic():
    rng = np.random.default_rng(8)
    model = FarganModel.from_blob(_fargan_blob(rng))
    st = FarganState(model)
    pcm0 = (0.1 * np.sin(2 * np.pi * 110 * np.arange(320) / 16000)
            ).astype(np.float32)
    feats5 = np.stack([_features(rng) for _ in range(5)])
    st.cont(pcm0, feats5)
    assert st.cont_initialized
    out = st.synthesize(_features(rng, period=120))
    assert out.shape == (FARGAN_FRAME_SIZE,)
    assert np.all(np.isfinite(out))
    # deterministic given identical state and inputs
    st2 = FarganState(model)
    st2.cont(pcm0, feats5)
    st3 = FarganState(model)
    st3.cont(pcm0, feats5)
    f = _features(np.random.default_rng(99))
    np.testing.assert_array_equal(st2.synthesize(f), st3.synthesize(f))
    np.testing.assert_array_equal(st2.synthesize(f), st3.synthesize(f))
    ints = st.synthesize_int(_features(rng))
    assert ints.dtype == np.int16 and ints.shape == (FARGAN_FRAME_SIZE,)


def test_fargan_period_decode():
    from opus_codec_tpu.dnn.fargan import features_to_period
    for period in (32, 60, 100, 180, 255):
        f = np.zeros(NB_FEATURES, np.float32)
        f[NB_BANDS] = np.log2(256.0 / period) - 1.5
        assert features_to_period(f) == period


def test_dred_synthetic_roundtrip():
    rng = np.random.default_rng(9)
    blob = _dred_blob(rng)
    enc = RDOVAEEncoder.from_blob(blob)
    dec = RDOVAEDecoder.from_blob(blob)
    assert enc.num_features == 20
    lat_list, states = [], []
    for i in range(4):
        dframe = (0.1 * rng.standard_normal(40)).astype(np.float32)
        lat, state = enc.encode_dframe(dframe)
        assert lat.shape == (enc.latent_dim,)
        assert state.shape == (enc.state_dim,)
        lat_list.append(lat)
        states.append(state)
    feats = dec.decode_all(states[-1], np.stack(lat_list), 4)
    assert feats.shape == (16, 20)
    assert np.all(np.isfinite(feats))
    # init_states is a reset: same inputs -> same outputs
    feats2 = dec.decode_all(states[-1], np.stack(lat_list), 4)
    np.testing.assert_array_equal(feats, feats2)


def test_dred_encoder_is_stateful():
    rng = np.random.default_rng(10)
    enc = RDOVAEEncoder.from_blob(_dred_blob(rng))
    x = (0.1 * rng.standard_normal(40)).astype(np.float32)
    l1, _ = enc.encode_dframe(x)
    l2, _ = enc.encode_dframe(x)
    assert not np.allclose(l1, l2)   # GRU/conv state advanced
    enc.reset()
    l3, _ = enc.encode_dframe(x)
    np.testing.assert_array_equal(l1, l3)


def test_lossgen_synthetic():
    """Loss simulator: loads by name, burn-in happens once, output is a
    0/1 sequence reproducible under a fixed seed."""
    from opus_codec_tpu.dnn.lossgen import LossGen
    rng = np.random.default_rng(12)
    arrays = []
    arrays += _dense_arrays("lossgen_dense_in", 2, 8, rng)
    arrays += _gru_arrays("lossgen_gru1", 8, 8, rng)
    arrays += _gru_arrays("lossgen_gru2", 8, 8, rng)
    arrays += _dense_arrays("lossgen_dense_out", 8, 1, rng)
    blob = wt.write_weights(arrays)
    g1 = LossGen.from_blob(blob, seed=7)
    trace = g1.trace(400, 0.2)
    assert set(np.unique(trace)).issubset({0, 1})
    g2 = LossGen.from_blob(blob, seed=7)
    np.testing.assert_array_equal(trace, g2.trace(400, 0.2))
    g2.reset()
    assert not g2.used
