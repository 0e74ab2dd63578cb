"""JAX FARGAN vs the scalar NumPy vocoder (ground truth)."""
import numpy as np

import jax.numpy as jnp

from opus_codec_tpu.dnn.fargan import (FARGAN_CONT_SAMPLES,
                                       FARGAN_FRAME_SIZE, FarganModel,
                                       FarganState)
from opus_codec_tpu.dnn import fargan_jax as fj

from test_dnn import _fargan_blob


def test_fargan_jax_matches_numpy():
    rng = np.random.default_rng(42)
    model = FarganModel.from_blob(_fargan_blob(rng))
    B = 3
    jm = fj.from_model(model)
    st = fj.init_state(model, B)

    # per-stream scalar references
    refs = [FarganState(model) for _ in range(B)]
    pcm0 = 0.1 * rng.standard_normal((B, FARGAN_CONT_SAMPLES)) \
        .astype(np.float32)
    feats0 = 0.3 * rng.standard_normal((B, 5, 36)).astype(np.float32)
    for b in range(B):
        refs[b].cont(pcm0[b], feats0[b].ravel())
    st = fj.fargan_cont_batch(jm, st, jnp.asarray(pcm0),
                              jnp.asarray(feats0), model.fconv1_input,
                              model.input_size, model.cond_size)
    np.testing.assert_allclose(np.asarray(st.pitch_buf),
                               np.stack([r.pitch_buf for r in refs]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(st.deemph_mem),
                               [r.deemph_mem for r in refs], atol=2e-5)
    assert [int(v) for v in st.last_period] == \
        [r.last_period for r in refs]

    for fi in range(3):
        feats = 0.3 * rng.standard_normal((B, 36)).astype(np.float32)
        want = np.stack([refs[b].synthesize(feats[b]) for b in range(B)])
        got, st = fj.fargan_frame_batch(jm, st, jnp.asarray(feats),
                                        model.fconv1_input,
                                        model.input_size,
                                        model.cond_size)
        assert got.shape == (B, FARGAN_FRAME_SIZE)
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)
