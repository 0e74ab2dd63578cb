"""JAX NN runtime parity vs the NumPy ground truth (dnn/nnet.py)."""
import numpy as np

import jax.numpy as jnp

from opus_codec_tpu.dnn import nnet as nn
from opus_codec_tpu.dnn import nnet_jax as nj


def _rand_layer(rng, nin, nout, diag=False, int8=False):
    layer = nn.LinearLayer(
        W=rng.standard_normal((nout, nin)).astype(np.float32) * 0.3,
        bias=rng.standard_normal(nout).astype(np.float32) * 0.1,
        nb_inputs=nin, nb_outputs=nout,
        diag=(rng.standard_normal(nout).astype(np.float32) * 0.1
              if diag else None),
        scale=(rng.uniform(0.001, 0.01, nout).astype(np.float32)
               if int8 else None),
        quantized_input=int8)
    return layer


def test_dense_glu_parity():
    rng = np.random.default_rng(0)
    B = 7
    for int8 in (False, True):
        layer = _rand_layer(rng, 24, 40, int8=int8)
        jl = nj.from_numpy(layer)
        xs = rng.standard_normal((B, 24)).astype(np.float32)
        for act in (nn.ACTIVATION_LINEAR, nn.ACTIVATION_SIGMOID,
                    nn.ACTIVATION_TANH, nn.ACTIVATION_RELU,
                    nn.ACTIVATION_SWISH):
            want = np.stack([nn.compute_generic_dense(layer, x, act)
                             for x in xs])
            got = np.asarray(nj.dense(jl, jnp.asarray(xs), act))
            np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        g_layer = _rand_layer(rng, 24, 24, int8=int8)
        want = np.stack([nn.compute_glu(g_layer, x) for x in xs])
        got = np.asarray(nj.glu(nj.from_numpy(g_layer), jnp.asarray(xs)))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gru_parity():
    rng = np.random.default_rng(1)
    B, N, IN = 5, 16, 12
    win = _rand_layer(rng, IN, 3 * N)
    wrec = _rand_layer(rng, N, 3 * N, diag=False)
    jwin, jwrec = nj.from_numpy(win), nj.from_numpy(wrec)
    states = rng.standard_normal((B, N)).astype(np.float32) * 0.5
    st_j = jnp.asarray(states)
    for step in range(4):
        xs = rng.standard_normal((B, IN)).astype(np.float32)
        want = np.stack([nn.compute_generic_gru(win, wrec, states[b],
                                                xs[b]) for b in range(B)])
        st_j = nj.gru(jwin, jwrec, st_j, jnp.asarray(xs))
        np.testing.assert_allclose(np.asarray(st_j), want,
                                   rtol=3e-5, atol=3e-5)
        states = want


def test_conv1d_parity():
    rng = np.random.default_rng(2)
    B, IN, K = 4, 10, 3
    for dilation in (1, 2):
        layer = _rand_layer(rng, IN * K, 20)
        jl = nj.from_numpy(layer)
        sts = [nn.conv1d_state(layer, IN, dilation) for _ in range(B)]
        mem = nj.conv1d_init(B, IN * K, IN, dilation)
        for step in range(6):
            xs = rng.standard_normal((B, IN)).astype(np.float32)
            want = np.stack([
                nn.compute_generic_conv1d(layer, sts[b], xs[b], IN,
                                          nn.ACTIVATION_TANH, dilation)
                for b in range(B)])
            got, mem = nj.conv1d(jl, mem, jnp.asarray(xs), IN,
                                 nn.ACTIVATION_TANH, dilation)
            np.testing.assert_allclose(np.asarray(got), want,
                                       rtol=3e-5, atol=3e-5)
