"""JAX RDO-VAE (DRED) vs the scalar NumPy models (ground truth)."""
import numpy as np

import jax.numpy as jnp

from opus_codec_tpu.dnn import dred_jax as dj
from opus_codec_tpu.dnn.dred import RDOVAEDecoder, RDOVAEEncoder

from test_dnn import _dred_blob


def test_dred_encoder_jax_matches_numpy():
    rng = np.random.default_rng(21)
    blob = _dred_blob(rng)
    model = RDOVAEEncoder.from_blob(blob)
    B, n_frames = 3, 4
    jm = dj.from_encoder(model)
    st = dj.enc_init_state(jm, B)
    refs = [RDOVAEEncoder.from_blob(blob) for _ in range(B)]
    F2 = 2 * model.num_features
    for fi in range(n_frames):
        dfr = 0.5 * rng.standard_normal((B, F2)).astype(np.float32)
        want_l, want_s = zip(*[refs[b].encode_dframe(dfr[b])
                               for b in range(B)])
        lat, ini, st = dj.encode_dframe_batch(jm, st, jnp.asarray(dfr))
        np.testing.assert_allclose(np.asarray(lat), np.stack(want_l),
                                   atol=2e-5, err_msg=f"frame {fi}")
        np.testing.assert_allclose(np.asarray(ini), np.stack(want_s),
                                   atol=2e-5, err_msg=f"frame {fi}")


def test_dred_decoder_jax_matches_numpy():
    rng = np.random.default_rng(23)
    blob = _dred_blob(rng)
    model = RDOVAEDecoder.from_blob(blob)
    B, n_frames = 2, 3
    jm = dj.from_decoder(model)
    refs = [RDOVAEDecoder.from_blob(blob) for _ in range(B)]
    S = 8
    init = 0.4 * rng.standard_normal((B, S)).astype(np.float32)
    for b in range(B):
        refs[b].init_states(init[b])
    st = dj.dec_init_states_batch(jm, B, jnp.asarray(init))
    L = model.latent_dim_net
    for fi in range(n_frames):
        lat = 0.5 * rng.standard_normal((B, L)).astype(np.float32)
        want = np.stack([refs[b].decode_qframe(lat[b])
                         for b in range(B)])
        got, st = dj.decode_qframe_batch(jm, st, jnp.asarray(lat))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5,
                                   err_msg=f"frame {fi}")
