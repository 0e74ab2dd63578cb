"""TP (tensor-parallel) weight sharding over a virtual device mesh.

Validates SURVEY §2.6 TP: the DNN twins run with weight matrices
sharded over a mesh axis, XLA inserts the collectives, and the output
matches the unsharded model.  Runs on the CPU-mesh harness
(conftest.py forces 8 virtual devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opus_codec_tpu.dnn import fargan_jax as fj
from opus_codec_tpu.dnn import nnet_jax as nj
from opus_codec_tpu.dnn.fargan import FARGAN_CONT_SAMPLES, FarganModel
from opus_codec_tpu.parallel import tp

from test_dnn import _fargan_blob

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_dense_tp_matches_single_device():
    """One dense layer, both sharding directions, vs unsharded."""
    rng = np.random.default_rng(0)
    mesh = tp.make_tp_mesh(2, 4)
    B, IN, OUT = 8, 64, 128
    W = rng.standard_normal((OUT, IN)).astype(np.float32)
    b = rng.standard_normal(OUT).astype(np.float32)
    x = rng.standard_normal((B, IN)).astype(np.float32)
    layer = nj.JaxLinear(jnp.asarray(W), jnp.asarray(b), None, None,
                         False)
    want = np.asarray(nj.dense(layer, jnp.asarray(x), 1))

    from jax.sharding import NamedSharding, PartitionSpec as P
    xd = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("dp")))
    for dim in ("out", "in"):
        lsh = tp.shard_linear(layer, mesh, dim=dim)
        # the layer must be a jit ARGUMENT: closure constants lose
        # their committed shardings (quantized_input is pytree aux,
        # so the bool stays static)
        got = np.asarray(jax.jit(
            lambda l, v: nj.dense(l, v, 1))(lsh, xd))
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"dim={dim}")


def test_fargan_tp_matches_unsharded():
    """The full FARGAN synthesis step with TP-sharded weights equals
    the single-placement run (collectives inserted by XLA SPMD)."""
    rng = np.random.default_rng(42)
    model = FarganModel.from_blob(_fargan_blob(rng))
    B = 4
    jm = fj.from_model(model)
    mesh = tp.make_tp_mesh(2, 4)
    jm_sh = tp.shard_model(jm, mesh)
    st = fj.init_state(model, B)
    st_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("dp"))), st)

    pcm0 = 0.1 * rng.standard_normal((B, FARGAN_CONT_SAMPLES)) \
        .astype(np.float32)
    feats0 = 0.3 * rng.standard_normal((B, 5, 36)).astype(np.float32)
    st = fj.fargan_cont_batch(jm, st, jnp.asarray(pcm0),
                              jnp.asarray(feats0), model.fconv1_input,
                              model.input_size, model.cond_size)
    st_sh = fj.fargan_cont_batch(jm_sh, st_sh, jnp.asarray(pcm0),
                                 jnp.asarray(feats0),
                                 model.fconv1_input, model.input_size,
                                 model.cond_size)

    step = jax.jit(
        lambda m, s, f: fj.fargan_frame_batch(
            m, s, f, model.fconv1_input, model.input_size,
            model.cond_size))
    for fi in range(2):
        feats = 0.3 * rng.standard_normal((B, 36)).astype(np.float32)
        want, st = step(jm, st, jnp.asarray(feats))
        got, st_sh = step(jm_sh, st_sh, jnp.asarray(feats))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, err_msg=f"frame {fi}")


def test_tp_inserts_collectives():
    """A column(in)-sharded matmul must lower to an all-reduce over the
    tp axis — proof the partitioner is actually distributing work."""
    rng = np.random.default_rng(1)
    mesh = tp.make_tp_mesh(1, 8)
    W = rng.standard_normal((16, 64)).astype(np.float32)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    layer = nj.JaxLinear(jnp.asarray(W), None, None, None, False)
    lsh = tp.shard_linear(layer, mesh, dim="in")
    fn = jax.jit(lambda l, v: nj.linear(l, v))
    txt = fn.lower(lsh, jnp.asarray(x)).compile().as_text()
    assert "all-reduce" in txt or "all_reduce" in txt, \
        "no collective in the TP-sharded matmul"
