"""NN primitives with the exact semantics of the reference runtime
(opus/dnn/nnet.c, nnet_arch.h, vec.h).

Everything here is expressed as dense float matmuls over an effective
weight matrix W [nb_outputs, nb_inputs]:

* float dense weights are stored column-major (vec.h:110 sgemv:
  ``w[j*col_stride + i]``), so the blob array reshapes as [in, out].T;
* sparse float weights (vec.h:124 sparse_sgemv8x4) store 8x4 blocks
  column-major within the block (``w[c*8+r]``);
* int8 weights (vec.h cgemv8x4 / sparse_cgemv8x4) store 8x4 blocks
  row-major within the block (``w[r*4+c]``), the input is quantised to
  ``floor(0.5 + 127*x)`` and the product is scaled by the per-output
  ``scale`` array (which the exporter pre-divides by 127).

We reconstruct the dense effective matrix once at load time — on TPU
there is no reason to keep the sparse/int8 encodings at run time; the
MXU wants dense bf16/f32 matmuls.  The int8 *input quantisation* is
preserved (``quantized_input``) because it changes the numerics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

ACTIVATION_LINEAR = 0
ACTIVATION_SIGMOID = 1
ACTIVATION_TANH = 2
ACTIVATION_RELU = 3
ACTIVATION_SOFTMAX = 4
ACTIVATION_SWISH = 5

SPARSE_BLOCK_SIZE = 32


def sparse_idx_to_dense_float(idx: np.ndarray, w: np.ndarray,
                              nb_inputs: int, nb_outputs: int) -> np.ndarray:
    """Decode the sparse 8x4-block float layout (vec.h:124) to a dense
    [out, in] matrix.  Block elements are column-major: w[c*8+r]."""
    W = np.zeros((nb_outputs, nb_inputs), np.float32)
    p = 0
    k = 0
    for i in range(0, nb_outputs, 8):
        nb_blocks = int(idx[p]); p += 1
        for _ in range(nb_blocks):
            pos = int(idx[p]); p += 1
            blk = w[k:k + 32].reshape(4, 8)    # [c, r]
            W[i:i + 8, pos:pos + 4] = blk.T
            k += 32
    return W


def sparse_idx_to_dense_int8(idx: np.ndarray, w: np.ndarray,
                             nb_inputs: int, nb_outputs: int) -> np.ndarray:
    """Decode the sparse 8x4-block int8 layout (vec.h sparse_cgemv8x4) to
    a dense [out, in] matrix.  Block elements are row-major: w[r*4+c]."""
    W = np.zeros((nb_outputs, nb_inputs), np.float32)
    p = 0
    k = 0
    for i in range(0, nb_outputs, 8):
        nb_blocks = int(idx[p]); p += 1
        for _ in range(nb_blocks):
            pos = int(idx[p]); p += 1
            blk = w[k:k + 32].astype(np.float32).reshape(8, 4)   # [r, c]
            W[i:i + 8, pos:pos + 4] = blk
            k += 32
    return W


def dense_int8_to_dense(w: np.ndarray, nb_inputs: int,
                        nb_outputs: int) -> np.ndarray:
    """Decode the dense 8x4-block int8 layout (vec.h cgemv8x4): blocks
    iterate rows in steps of 8, cols in steps of 4, row-major inside."""
    W = np.zeros((nb_outputs, nb_inputs), np.float32)
    k = 0
    for i in range(0, nb_outputs, 8):
        for j in range(0, nb_inputs, 4):
            W[i:i + 8, j:j + 4] = w[k:k + 32].astype(np.float32).reshape(8, 4)
            k += 32
    return W


@dataclass
class LinearLayer:
    """Effective dense affine layer: y = scale_applied(W @ q(x)) + bias
    (+ diag term for GRU recurrent weights).  nnet.h:70-81."""
    W: np.ndarray                       # [nb_outputs, nb_inputs] float32
    bias: Optional[np.ndarray]          # [nb_outputs] or None
    nb_inputs: int
    nb_outputs: int
    diag: Optional[np.ndarray] = None   # [nb_outputs] = [3N], GRU only
    scale: Optional[np.ndarray] = None  # per-output scale (int8 path)
    quantized_input: bool = False       # int8 path quantises the input

    def linear(self, x: np.ndarray) -> np.ndarray:
        """compute_linear (nnet_arch.h:120-152)."""
        x = np.asarray(x, np.float32)
        if self.quantized_input:
            xq = np.floor(0.5 + 127.0 * x).astype(np.float32)
            out = self.W @ xq
            if self.scale is not None:
                out = out * self.scale
        else:
            out = self.W @ x
        if self.bias is not None:
            out = out + self.bias
        if self.diag is not None:
            M = self.nb_inputs
            d = self.diag
            out = out.copy()
            out[:M] += d[:M] * x
            out[M:2 * M] += d[M:2 * M] * x
            out[2 * M:3 * M] += d[2 * M:3 * M] * x
        return out.astype(np.float32)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def compute_activation(x: np.ndarray, activation: int) -> np.ndarray:
    """nnet_arch.h:69-117 (HIGH_ACCURACY variants; the table-driven
    vec_tanh/vec_sigmoid differ only at the 1e-7 level)."""
    x = np.asarray(x, np.float32)
    if activation == ACTIVATION_SIGMOID:
        return _sigmoid(x).astype(np.float32)
    if activation == ACTIVATION_TANH:
        return np.tanh(x).astype(np.float32)
    if activation == ACTIVATION_SWISH:
        return (x * _sigmoid(x)).astype(np.float32)
    if activation == ACTIVATION_RELU:
        return np.maximum(x, 0).astype(np.float32)
    if activation == ACTIVATION_SOFTMAX:
        # Reference compiles with SOFTMAX_HACK: identity (nnet_arch.h:96).
        return x.astype(np.float32)
    return x.astype(np.float32)


def compute_generic_dense(layer: LinearLayer, x: np.ndarray,
                          activation: int) -> np.ndarray:
    """nnet.c:58-62."""
    return compute_activation(layer.linear(x), activation)


def compute_generic_gru(input_weights: LinearLayer,
                        recurrent_weights: LinearLayer,
                        state: np.ndarray, x: np.ndarray) -> np.ndarray:
    """nnet.c:71-100 — returns the new state [N].

    zrh = W_in·x; recur = W_rec·state; zrh[:2N] += recur[:2N];
    z,r = sigmoid; h += recur[2N:]*r; h = tanh(h);
    state' = z*state + (1-z)*h.
    """
    N = recurrent_weights.nb_inputs
    zrh = input_weights.linear(x)
    recur = recurrent_weights.linear(state)
    zrh[:2 * N] += recur[:2 * N]
    zr = _sigmoid(zrh[:2 * N])
    z, r = zr[:N], zr[N:]
    h = zrh[2 * N:3 * N] + recur[2 * N:3 * N] * r
    h = np.tanh(h)
    return (z * state + (1 - z) * h).astype(np.float32)


def compute_glu(layer: LinearLayer, x: np.ndarray) -> np.ndarray:
    """nnet.c:102-115: out = x * sigmoid(W·x)."""
    gate = _sigmoid(layer.linear(x))
    return (np.asarray(x, np.float32) * gate).astype(np.float32)


@dataclass
class Conv1dState:
    """History memory for compute_generic_conv1d (nnet.c:119-128).

    The reference keeps mem = last (nb_inputs - input_size) samples of the
    concatenated input stream (dilation folds history with a stride)."""
    mem: np.ndarray
    initialized: bool = False


def conv1d_state(layer: LinearLayer, input_size: int,
                 dilation: int = 1) -> Conv1dState:
    ksize = layer.nb_inputs // input_size
    n = input_size * dilation * (ksize - 1) if dilation > 1 \
        else layer.nb_inputs - input_size
    return Conv1dState(np.zeros(max(n, 0), np.float32))


def compute_generic_conv1d(layer: LinearLayer, state: Conv1dState,
                           x: np.ndarray, input_size: int, activation: int,
                           dilation: int = 1) -> np.ndarray:
    """nnet.c:119-128 and :132-150 (dilation variant).  Updates state."""
    x = np.asarray(x, np.float32)
    ksize = layer.nb_inputs // input_size
    if dilation == 1:
        tmp = np.concatenate([state.mem, x]) if layer.nb_inputs != input_size \
            else x
        out = compute_activation(layer.linear(tmp), activation)
        if layer.nb_inputs != input_size:
            state.mem = tmp[input_size:].copy()
    else:
        tmp = np.empty(layer.nb_inputs, np.float32)
        for i in range(ksize - 1):
            tmp[i * input_size:(i + 1) * input_size] = \
                state.mem[i * input_size * dilation:
                          i * input_size * dilation + input_size]
        tmp[(ksize - 1) * input_size:] = x
        out = compute_activation(layer.linear(tmp), activation)
        mem = state.mem
        n = input_size * dilation * (ksize - 1)
        mem[:n - input_size] = mem[input_size:n]
        mem[n - input_size:n] = x
    return out
