"""Batched JAX NN runtime — the device twin of ``nnet.py``.

The scalar NumPy runtime (nnet.py) is the validated ground truth for the
reference blob semantics (opus/dnn/nnet.c, vec.h); this module lifts the
same primitives to jitted ``[B, ...]`` batches for TPU execution: every
layer is a dense matmul on the MXU (SURVEY §2.5: the sparse/int8 kernels
of vec.h exist only to make CPUs fast — on TPU the dense effective
matrix is the right representation, reconstructed once at load).

States (GRU, conv1d history) are carried functionally as arrays, so
whole model stacks compose into single jitted step functions.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nnet import (ACTIVATION_LINEAR, ACTIVATION_RELU, ACTIVATION_SIGMOID,
                   ACTIVATION_SOFTMAX, ACTIVATION_SWISH, ACTIVATION_TANH,
                   LinearLayer)

__all__ = ["JaxLinear", "from_numpy", "dense", "gru", "glu",
           "conv1d", "conv1d_init", "activation"]


@jax.tree_util.register_pytree_node_class
class JaxLinear:
    """Dense affine layer on device; mirrors LinearLayer.linear
    (nnet_arch.h:120-152).  ``quantized_input`` is trace-static: it is
    pytree *aux data*, so JaxLinear pytrees can be passed as jit
    arguments (e.g. TP-sharded models, parallel/tp.py) without tracing
    the flag."""

    __slots__ = ("W", "bias", "diag", "scale", "quantized_input")

    def __init__(self, W, bias=None, diag=None, scale=None,
                 quantized_input=False):
        self.W = W                      # [out, in]
        self.bias = bias                # [out] or None
        self.diag = diag                # [3N] or None (GRU recurrent)
        self.scale = scale              # [out] or None (int8 path)
        self.quantized_input = bool(quantized_input)

    def tree_flatten(self):
        return ((self.W, self.bias, self.diag, self.scale),
                self.quantized_input)

    @classmethod
    def tree_unflatten(cls, aux, children):
        W, bias, diag, scale = children
        obj = cls.__new__(cls)
        obj.W = W
        obj.bias = bias
        obj.diag = diag
        obj.scale = scale
        obj.quantized_input = aux
        return obj

    def __repr__(self):
        return (f"JaxLinear(W={getattr(self.W, 'shape', None)}, "
                f"bias={self.bias is not None}, "
                f"diag={self.diag is not None}, "
                f"scale={self.scale is not None}, "
                f"quantized_input={self.quantized_input})")


def from_numpy(layer: LinearLayer, dtype=jnp.float32) -> JaxLinear:
    return JaxLinear(
        W=jnp.asarray(layer.W, dtype),
        bias=None if layer.bias is None else jnp.asarray(layer.bias,
                                                         dtype),
        diag=None if layer.diag is None else jnp.asarray(layer.diag,
                                                         dtype),
        scale=None if layer.scale is None else jnp.asarray(layer.scale,
                                                           dtype),
        quantized_input=bool(layer.quantized_input))


def linear(layer: JaxLinear, x: jnp.ndarray) -> jnp.ndarray:
    """y = scale*(W q(x)) + bias (+ GRU diag term); x: [B, in]."""
    if layer.quantized_input:
        xq = jnp.floor(0.5 + 127.0 * x)
        out = xq @ layer.W.T
        if layer.scale is not None:
            out = out * layer.scale[None, :]
    else:
        out = x @ layer.W.T
    if layer.bias is not None:
        out = out + layer.bias[None, :]
    if layer.diag is not None:
        M = x.shape[-1]
        d = layer.diag
        out = out + jnp.concatenate(
            [d[:M] * x, d[M:2 * M] * x, d[2 * M:3 * M] * x], axis=-1)
    return out


def activation(x: jnp.ndarray, act: int) -> jnp.ndarray:
    """nnet_arch.h:69-117 (SOFTMAX_HACK: identity)."""
    if act == ACTIVATION_SIGMOID:
        return jax.nn.sigmoid(x)
    if act == ACTIVATION_TANH:
        return jnp.tanh(x)
    if act == ACTIVATION_SWISH:
        return x * jax.nn.sigmoid(x)
    if act == ACTIVATION_RELU:
        return jnp.maximum(x, 0)
    return x          # LINEAR / SOFTMAX(identity)


def dense(layer: JaxLinear, x: jnp.ndarray, act: int) -> jnp.ndarray:
    """compute_generic_dense (nnet.c:58-62), batched."""
    return activation(linear(layer, x), act)


def gru(input_weights: JaxLinear, recurrent_weights: JaxLinear,
        state: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """compute_generic_gru (nnet.c:71-100): returns new state [B, N]."""
    N = state.shape[-1]
    zrh = linear(input_weights, x)
    recur = linear(recurrent_weights, state)
    zr = jax.nn.sigmoid(zrh[:, :2 * N] + recur[:, :2 * N])
    z, r = zr[:, :N], zr[:, N:]
    h = jnp.tanh(zrh[:, 2 * N:3 * N] + recur[:, 2 * N:3 * N] * r)
    return z * state + (1 - z) * h


def glu(layer: JaxLinear, x: jnp.ndarray) -> jnp.ndarray:
    """compute_glu (nnet.c:102-115): x * sigmoid(W x)."""
    return x * jax.nn.sigmoid(linear(layer, x))


def conv1d_init(B: int, nb_inputs: int, input_size: int,
                dilation: int = 1, dtype=jnp.float32) -> jnp.ndarray:
    ksize = nb_inputs // input_size
    n = input_size * dilation * (ksize - 1) if dilation > 1 \
        else nb_inputs - input_size
    return jnp.zeros((B, max(n, 0)), dtype)


def conv1d(layer: JaxLinear, mem: jnp.ndarray, x: jnp.ndarray,
           input_size: int, act: int, dilation: int = 1
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """compute_generic_conv1d (nnet.c:119-150), batched + functional.

    Returns (out [B, out], new_mem)."""
    nb_inputs = layer.W.shape[1]
    ksize = nb_inputs // input_size
    if dilation == 1:
        if nb_inputs != input_size:
            tmp = jnp.concatenate([mem, x], axis=-1)
            new_mem = tmp[:, input_size:]
        else:
            tmp = x
            new_mem = mem
        return activation(linear(layer, tmp), act), new_mem
    cols = []
    for i in range(ksize - 1):
        s = i * input_size * dilation
        cols.append(mem[:, s:s + input_size])
    cols.append(x)
    tmp = jnp.concatenate(cols, axis=-1)
    out = activation(linear(layer, tmp), act)
    n = input_size * dilation * (ksize - 1)
    new_mem = jnp.concatenate([mem[:, input_size:n], x], axis=-1)
    return out, new_mem
