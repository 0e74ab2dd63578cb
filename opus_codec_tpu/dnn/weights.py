"""Opus DNN weight-blob format: parser, writer, and layer binding.

Binary format (opus/dnn/nnet.h:62-75 WeightHead, parse_lpcnet_weights.c:
39-82): a sequence of records, each a 64-byte little-endian header

    char head[4];  int version;  int type;  int size;  int block_size;
    char name[44];

followed by ``block_size`` bytes of payload of which the first ``size``
bytes are the array (block_size is size rounded up to WEIGHT_BLOCK_SIZE).
Array types: 0=float32, 1=int32, 2=qweight, 3=int8
(nnet.h WEIGHT_TYPE_*).

Naming convention (dnn/torch/weight-exchange c_export/common.py:219-226):
``{layer}_bias``, ``{layer}_subias``, ``{layer}_weights_int8``,
``{layer}_weights_float``, ``{layer}_weights_idx``, ``{layer}_weights_diag``,
``{layer}_scale``; GRUs export two linear layers ``{gru}_input`` and
``{gru}_recurrent``.

Blobs produced by the reference export tooling load unchanged.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .nnet import (LinearLayer, SPARSE_BLOCK_SIZE, dense_int8_to_dense,
                   sparse_idx_to_dense_float, sparse_idx_to_dense_int8)

WEIGHT_BLOB_VERSION = 0
WEIGHT_BLOCK_SIZE = 64

WEIGHT_TYPE_float = 0
WEIGHT_TYPE_int = 1
WEIGHT_TYPE_qweight = 2
WEIGHT_TYPE_int8 = 3

_HEAD = struct.Struct("<4siiii44s")

_DTYPES = {
    WEIGHT_TYPE_float: np.dtype("<f4"),
    WEIGHT_TYPE_int: np.dtype("<i4"),
    WEIGHT_TYPE_qweight: np.dtype("<i1"),
    WEIGHT_TYPE_int8: np.dtype("<i1"),
}


@dataclass
class WeightArray:
    name: str
    type: int
    data: np.ndarray          # raw typed 1-D array

    @property
    def size(self) -> int:    # byte size, as the C side reports it
        return self.data.nbytes


def parse_weights(blob: bytes) -> Dict[str, WeightArray]:
    """parse_weights (parse_lpcnet_weights.c:57-82). Raises ValueError on
    a malformed blob (the C code returns -1)."""
    arrays: Dict[str, WeightArray] = {}
    pos = 0
    n = len(blob)
    while pos < n:
        if n - pos < WEIGHT_BLOCK_SIZE:
            raise ValueError("truncated weight header")
        head, version, wtype, size, block_size, name = \
            _HEAD.unpack_from(blob, pos)
        if version != WEIGHT_BLOB_VERSION:
            raise ValueError(f"bad blob version {version}")
        if block_size < size or block_size > n - pos - WEIGHT_BLOCK_SIZE:
            raise ValueError("bad record block size")
        if name[-1:] != b"\x00" or size < 0:
            raise ValueError("bad record name")
        sname = name.split(b"\x00", 1)[0].decode("ascii")
        dt = _DTYPES.get(wtype, np.dtype("<i1"))
        payload = blob[pos + WEIGHT_BLOCK_SIZE:
                       pos + WEIGHT_BLOCK_SIZE + size]
        arrays[sname] = WeightArray(
            sname, wtype, np.frombuffer(payload, dt).copy())
        pos += WEIGHT_BLOCK_SIZE + block_size
    return arrays


def write_weights(arrays: Sequence[WeightArray]) -> bytes:
    """Writer (the inverse of parse_weights; mirrors
    dnn/write_lpcnet_weights.c) — used to build test blobs and to
    repackage converted models."""
    out = bytearray()
    for a in arrays:
        data = np.ascontiguousarray(a.data)
        size = data.nbytes
        block = (size + WEIGHT_BLOCK_SIZE - 1) // WEIGHT_BLOCK_SIZE \
            * WEIGHT_BLOCK_SIZE
        name = a.name.encode("ascii")
        if len(name) > 43:
            raise ValueError(f"name too long: {a.name}")
        out += _HEAD.pack(b"DNNw", WEIGHT_BLOB_VERSION, a.type, size, block,
                          name)
        out += data.tobytes()
        out += b"\x00" * (block - size)
    return bytes(out)


def _get(arrays: Dict[str, WeightArray], name: str,
         nbytes: int) -> Optional[np.ndarray]:
    a = arrays.get(name)
    if a is not None and a.size == nbytes:
        return a.data
    return None


def _idx_total_blocks(idx: np.ndarray, nb_inputs: int,
                      nb_outputs: int) -> int:
    """find_idx_check (parse_lpcnet_weights.c:101-122)."""
    total = 0
    p = 0
    remain = len(idx)
    out = nb_outputs
    while remain > 0:
        nb_blocks = int(idx[p])
        if remain < nb_blocks + 1:
            raise ValueError("bad sparse index")
        for i in range(nb_blocks):
            pos = int(idx[p + 1 + i])
            if pos + 3 >= nb_inputs or (pos & 0x3):
                raise ValueError("bad sparse index position")
        p += nb_blocks + 1
        remain -= nb_blocks + 1
        out -= 8
        total += nb_blocks
    if out != 0:
        raise ValueError("sparse index does not cover outputs")
    return total


def linear_init(arrays: Dict[str, WeightArray], name: str,
                nb_inputs: int, nb_outputs: int,
                have_bias: bool = True, sparse: bool = False,
                diagonal: bool = False) -> LinearLayer:
    """Bind a LinearLayer by name (parse_lpcnet_weights.c:124-178
    linear_init + the naming of c_export/common.py:219-226).

    Prefers float weights when present (compute_linear does the same);
    otherwise decodes the int8 path, keeping its input quantisation.
    """
    bias = _get(arrays, name + "_bias", 4 * nb_outputs) if have_bias else None
    if have_bias and bias is None:
        raise KeyError(f"{name}_bias missing")
    diag = None
    scale = None
    if sparse:
        a_idx = arrays.get(name + "_weights_idx")
        if a_idx is None:
            raise KeyError(f"{name}_weights_idx missing")
        idx = a_idx.data.view("<i4") if a_idx.data.dtype != np.dtype("<i4") \
            else a_idx.data
        total = _idx_total_blocks(idx, nb_inputs, nb_outputs)
        wf = _get(arrays, name + "_weights_float", 4 * SPARSE_BLOCK_SIZE * total)
        if wf is not None:
            W = sparse_idx_to_dense_float(idx, wf.view("<f4"),
                                          nb_inputs, nb_outputs)
            quant = False
        else:
            wi = _get(arrays, name + "_weights_int8", SPARSE_BLOCK_SIZE * total)
            if wi is None:
                raise KeyError(f"{name}: no sparse weights in blob")
            W = sparse_idx_to_dense_int8(idx, wi, nb_inputs, nb_outputs)
            scale = _get(arrays, name + "_scale", 4 * nb_outputs)
            if scale is None:
                raise KeyError(f"{name}_scale missing")
            quant = True
        if diagonal:
            d = _get(arrays, name + "_weights_diag", 4 * nb_outputs)
            if d is None:
                raise KeyError(f"{name}_weights_diag missing")
            diag = d.view("<f4")
    else:
        wf = _get(arrays, name + "_weights_float",
                  4 * nb_inputs * nb_outputs)
        if wf is not None:
            # Column-major [in, out] on disk (vec.h sgemv) -> [out, in].
            W = wf.view("<f4").reshape(nb_inputs, nb_outputs).T.copy()
            quant = False
        else:
            wi = _get(arrays, name + "_weights_int8", nb_inputs * nb_outputs)
            if wi is None:
                raise KeyError(f"{name}: no weights in blob")
            W = dense_int8_to_dense(wi, nb_inputs, nb_outputs)
            scale = _get(arrays, name + "_scale", 4 * nb_outputs)
            if scale is None:
                raise KeyError(f"{name}_scale missing")
            quant = True
    return LinearLayer(W=np.asarray(W, np.float32),
                       bias=bias.view("<f4") if bias is not None else None,
                       nb_inputs=nb_inputs, nb_outputs=nb_outputs,
                       diag=diag,
                       scale=scale.view("<f4") if scale is not None else None,
                       quantized_input=quant)


def layer_dims(arrays: Dict[str, WeightArray], name: str,
               nb_inputs_hint: Optional[int] = None) -> Tuple[int, int]:
    """Derive (nb_inputs, nb_outputs) for a dense layer from its arrays:
    nb_outputs from the bias, nb_inputs from the weight size.  Lets the
    model graph be data-driven instead of hard-coding export dims."""
    a = arrays.get(name + "_bias")
    if a is None:
        raise KeyError(f"{name}_bias missing")
    nb_out = a.size // 4
    wf = arrays.get(name + "_weights_float")
    if wf is not None and (nb_inputs_hint is None
                           or wf.size == 4 * nb_inputs_hint * nb_out):
        return wf.size // (4 * nb_out), nb_out
    wi = arrays.get(name + "_weights_int8")
    if wi is not None:
        return wi.size // nb_out, nb_out
    if nb_inputs_hint is not None:
        return nb_inputs_hint, nb_out
    raise KeyError(f"{name}: cannot derive dims")


def pack_dense_float(name: str, W: np.ndarray,
                     bias: Optional[np.ndarray]) -> list:
    """Pack a dense float layer [out, in] into blob arrays using the
    reference's column-major layout (vec.h sgemv; c_export/common.py)."""
    out = [WeightArray(name + "_weights_float", WEIGHT_TYPE_float,
                       np.ascontiguousarray(W.T, "<f4").reshape(-1))]
    if bias is not None:
        out.append(WeightArray(name + "_bias", WEIGHT_TYPE_float,
                               np.asarray(bias, "<f4")))
    return out


def pack_dense_int8(name: str, W8: np.ndarray, scale: np.ndarray,
                    bias: Optional[np.ndarray]) -> list:
    """Pack an int8 dense layer: W8 [out, in] int8 (out%8==0, in%4==0),
    8x4 blocks row-major (vec.h cgemv8x4), per-output scale
    (already divided by 127 as the exporter does)."""
    nb_out, nb_in = W8.shape
    assert nb_out % 8 == 0 and nb_in % 4 == 0
    blocks = []
    for i in range(0, nb_out, 8):
        for j in range(0, nb_in, 4):
            blocks.append(W8[i:i + 8, j:j + 4].reshape(-1))
    out = [WeightArray(name + "_weights_int8", WEIGHT_TYPE_int8,
                       np.concatenate(blocks).astype("<i1")),
           WeightArray(name + "_scale", WEIGHT_TYPE_float,
                       np.asarray(scale, "<f4"))]
    if bias is not None:
        out.append(WeightArray(name + "_bias", WEIGHT_TYPE_float,
                               np.asarray(bias, "<f4")))
    return out


def pack_sparse_float(name: str, W: np.ndarray,
                      bias: Optional[np.ndarray],
                      keep: np.ndarray) -> list:
    """Pack a sparse float layer.  ``keep`` is a boolean block mask
    [out//8, in//4]; kept 8x4 blocks are stored column-major within the
    block (vec.h sparse_sgemv8x4)."""
    nb_out, nb_in = W.shape
    idx = []
    blocks = []
    for bi, i in enumerate(range(0, nb_out, 8)):
        cols = np.nonzero(keep[bi])[0]
        idx.append(len(cols))
        for bj in cols:
            idx.append(int(bj) * 4)
            blocks.append(np.ascontiguousarray(
                W[i:i + 8, bj * 4:bj * 4 + 4].T).reshape(-1))
    out = [WeightArray(name + "_weights_idx", WEIGHT_TYPE_int,
                       np.asarray(idx, "<i4")),
           WeightArray(name + "_weights_float", WEIGHT_TYPE_float,
                       np.concatenate(blocks).astype("<f4")
                       if blocks else np.zeros(0, "<f4"))]
    if bias is not None:
        out.append(WeightArray(name + "_bias", WEIGHT_TYPE_float,
                               np.asarray(bias, "<f4")))
    return out


def pack_sparse_int8(name: str, W8: np.ndarray, scale: np.ndarray,
                     bias: Optional[np.ndarray], keep: np.ndarray,
                     diag: Optional[np.ndarray] = None) -> list:
    """Pack a sparse int8 layer: kept 8x4 blocks row-major within the
    block (vec.h sparse_cgemv8x4)."""
    nb_out, nb_in = W8.shape
    idx = []
    blocks = []
    for bi, i in enumerate(range(0, nb_out, 8)):
        cols = np.nonzero(keep[bi])[0]
        idx.append(len(cols))
        for bj in cols:
            idx.append(int(bj) * 4)
            blocks.append(W8[i:i + 8, bj * 4:bj * 4 + 4].reshape(-1))
    out = [WeightArray(name + "_weights_idx", WEIGHT_TYPE_int,
                       np.asarray(idx, "<i4")),
           WeightArray(name + "_weights_int8", WEIGHT_TYPE_int8,
                       np.concatenate(blocks).astype("<i1")
                       if blocks else np.zeros(0, "<i1")),
           WeightArray(name + "_scale", WEIGHT_TYPE_float,
                       np.asarray(scale, "<f4"))]
    if bias is not None:
        out.append(WeightArray(name + "_bias", WEIGHT_TYPE_float,
                               np.asarray(bias, "<f4")))
    if diag is not None:
        out.append(WeightArray(name + "_weights_diag", WEIGHT_TYPE_float,
                               np.asarray(diag, "<f4")))
    return out


def embedding_init(arrays: Dict[str, WeightArray], name: str,
                   nb_rows: int) -> np.ndarray:
    """Embedding table stored row-major [nb_rows, dim]
    (fargan.c:54 indexes float_weights[row*OUT_SIZE])."""
    a = arrays.get(name + "_weights_float")
    if a is None:
        raise KeyError(f"{name}_weights_float missing")
    w = a.data.view("<f4")
    if len(w) % nb_rows:
        raise ValueError(f"{name}: size not divisible by {nb_rows}")
    return w.reshape(nb_rows, -1).copy()
