"""JAX OSCE (LACE / NoLACE) vs the scalar NumPy models (ground truth)."""
import numpy as np

import jax.numpy as jnp

from opus_codec_tpu.dnn import osce_jax as oj
from opus_codec_tpu.dnn.osce import (LaceModel, NoLaceModel, NUM_FEATURES)

from test_osce import _lace_blob, _nolace_blob


def _inputs(rng, B, n_frames):
    feats = 0.4 * rng.standard_normal(
        (n_frames, B, 4, NUM_FEATURES)).astype(np.float32)
    numbits = rng.uniform(60, 600, (n_frames, B, 2)).astype(np.float32)
    periods = rng.integers(32, 300, (n_frames, B, 4)).astype(np.int32)
    x = 0.3 * rng.standard_normal((n_frames, B, 320)).astype(np.float32)
    return feats, numbits, periods, x


def test_lace_jax_matches_numpy():
    rng = np.random.default_rng(11)
    model = LaceModel.from_blob(_lace_blob(rng))
    B, n_frames = 3, 3
    jm = oj.from_lace(model)
    st = oj.lace_init_state(B, jm)
    refs = [model.make_state() for _ in range(B)]
    feats, numbits, periods, x = _inputs(rng, B, n_frames)
    for fi in range(n_frames):
        want = np.stack([
            model.process_20ms(refs[b], x[fi, b], feats[fi, b],
                               numbits[fi, b], periods[fi, b])
            for b in range(B)])
        got, st = oj.lace_frame_batch(
            jm, st, jnp.asarray(x[fi]), jnp.asarray(feats[fi]),
            jnp.asarray(numbits[fi]), jnp.asarray(periods[fi]))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4,
                                   err_msg=f"frame {fi}")


def test_nolace_jax_matches_numpy():
    rng = np.random.default_rng(13)
    model = NoLaceModel.from_blob(_nolace_blob(rng))
    B, n_frames = 2, 3
    jm = oj.from_nolace(model)
    st = oj.nolace_init_state(B, jm)
    refs = [model.make_state() for _ in range(B)]
    feats, numbits, periods, x = _inputs(rng, B, n_frames)
    for fi in range(n_frames):
        want = np.stack([
            model.process_20ms(refs[b], x[fi, b], feats[fi, b],
                               numbits[fi, b], periods[fi, b])
            for b in range(B)])
        got, st = oj.nolace_frame_batch(
            jm, st, jnp.asarray(x[fi]), jnp.asarray(feats[fi]),
            jnp.asarray(numbits[fi]), jnp.asarray(periods[fi]))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4,
                                   err_msg=f"frame {fi}")
