"""TP (tensor parallelism) for the DNN stack (SURVEY §2.6).

The reference scales only by thread-per-stream (tests/multhithread.rs);
its neural subsystems (opus/dnn/fargan.c, osce.c, dred_rdovae_*.c) run
single-threaded GEMVs.  On TPU the JAX twins (dnn/*_jax.py) are pytrees
of ``JaxLinear`` layers whose matmuls dominate, so tensor parallelism is
pure *placement*: shard each weight matrix over a mesh axis with
``NamedSharding`` and let XLA's SPMD partitioner insert the collectives
— an output(row)-sharded layer computes its slice of the activations
with no communication, an input(column)-sharded layer contributes a
partial product that XLA all-reduces over ICI (the scaling-book recipe:
pick a mesh, annotate shardings, let the compiler place the psums).

Composes with DP: build a 2-D mesh ``("dp", "tp")``, shard stream
batches over ``dp`` (parallel.mesh helpers) and weights over ``tp``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..dnn.nnet_jax import JaxLinear

__all__ = ["make_tp_mesh", "shard_linear", "shard_model",
           "replicate_model", "tp_axis_size"]


def make_tp_mesh(n_dp: int, n_tp: int, devices=None):
    """2-D ``("dp", "tp")`` mesh over the first n_dp*n_tp devices."""
    import jax
    from jax.sharding import Mesh

    devs = devices if devices is not None else jax.devices()
    need = n_dp * n_tp
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:need]).reshape(n_dp, n_tp),
                axis_names=("dp", "tp"))


def tp_axis_size(mesh, axis: str = "tp") -> int:
    return mesh.shape[axis]


def _put(x, mesh, spec):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    if x is None:
        return None
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def shard_linear(layer: JaxLinear, mesh, axis: str = "tp",
                 dim: Optional[str] = None) -> JaxLinear:
    """Place one layer's arrays on the mesh.

    ``dim``: "out" shards W's rows (bias/scale follow, no collective
    needed for the matmul), "in" shards W's columns (XLA inserts an
    all-reduce over ``axis``), None picks automatically — the first
    divisible dimension, falling back to replication.
    """
    n = tp_axis_size(mesh, axis)
    out_d, in_d = layer.W.shape[-2], layer.W.shape[-1]
    if dim is None:
        if out_d % n == 0 and layer.diag is None:
            dim = "out"
        elif in_d % n == 0:
            dim = "in"
        else:
            dim = "rep"
    if dim == "out":
        return JaxLinear(
            W=_put(layer.W, mesh, (axis, None)),
            bias=_put(layer.bias, mesh, (axis,)),
            diag=_put(layer.diag, mesh, (axis,)),
            scale=_put(layer.scale, mesh, (axis,)),
            quantized_input=layer.quantized_input)
    if dim == "in":
        return JaxLinear(
            W=_put(layer.W, mesh, (None, axis)),
            bias=_put(layer.bias, mesh, (None,)),
            diag=_put(layer.diag, mesh, (None,)),
            scale=_put(layer.scale, mesh, (None,)),
            quantized_input=layer.quantized_input)
    return JaxLinear(
        W=_put(layer.W, mesh, (None, None)),
        bias=_put(layer.bias, mesh, (None,)),
        diag=_put(layer.diag, mesh, (None,)),
        scale=_put(layer.scale, mesh, (None,)),
        quantized_input=layer.quantized_input)


def shard_model(tree, mesh, axis: str = "tp"):
    """Shard every JaxLinear in a model pytree (FARGAN/OSCE/DRED twins
    are NamedTuples of JaxLinear); non-layer leaves are replicated."""
    import jax

    def is_layer(x):
        return isinstance(x, JaxLinear)

    def map_leaf(x):
        if is_layer(x):
            return shard_linear(x, mesh, axis)
        return _put(x, mesh, (None,) * getattr(x, "ndim", 0)) \
            if hasattr(x, "ndim") else x

    return jax.tree_util.tree_map(map_leaf, tree, is_leaf=is_layer)


def replicate_model(tree, mesh):
    """Replicate a model pytree onto every device of the mesh."""
    import jax

    def map_leaf(x):
        if isinstance(x, JaxLinear):
            return JaxLinear(
                W=_put(x.W, mesh, (None, None)),
                bias=_put(x.bias, mesh, (None,)),
                diag=_put(x.diag, mesh, (None,)),
                scale=_put(x.scale, mesh, (None,)),
                quantized_input=x.quantized_input)
        return _put(x, mesh, (None,) * getattr(x, "ndim", 0)) \
            if hasattr(x, "ndim") else x

    return jax.tree_util.tree_map(
        map_leaf, tree, is_leaf=lambda x: isinstance(x, JaxLinear))
