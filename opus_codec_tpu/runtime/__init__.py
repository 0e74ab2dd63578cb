"""Native host-lane runtime: compiled symbol-plan packer.

The batched device pipeline emits per-stream symbol plans; this module
compiles (once, at import, cached) the C range-coder lane from ec_lane.c
and exposes plan-level encode/decode. Falls back to None when no C
toolchain is available; callers then use the Python scalar coder.

Plan format: int32 [N, 4] rows (kind, a, b, c) — see ec_lane.c header.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

__all__ = ["native_available", "encode_plan", "decode_plan",
           "encode_plan_batch", "OP_ENCODE", "OP_ENCODE_BIN", "OP_BIT_LOGP",
           "OP_ICDF", "OP_UINT", "OP_BITS"]

OP_ENCODE = 0
OP_ENCODE_BIN = 1
OP_BIT_LOGP = 2
OP_ICDF = 3
OP_UINT = 4
OP_BITS = 5

_LIB = None


def _build() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "ec_lane.c")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(),
                         f"opus_codec_tpu_ec_lane_{tag}.so")
    if not os.path.exists(cache):
        cc = os.environ.get("CC", "cc")
        for flags in (["-O2", "-shared", "-fPIC", "-fopenmp"],
                      ["-O2", "-shared", "-fPIC"]):
            try:
                subprocess.run(
                    [cc, *flags, "-o", cache + ".tmp", src],
                    check=True, capture_output=True)
                os.replace(cache + ".tmp", cache)
                break
            except (subprocess.CalledProcessError, FileNotFoundError):
                continue
        else:
            return None
    try:
        lib = ctypes.CDLL(cache)
    except OSError:
        return None
    lib.ec_encode_plan.restype = ctypes.c_int
    lib.ec_encode_plan.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint32)]
    lib.ec_decode_plan.restype = ctypes.c_int
    lib.ec_decode_plan.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint32)]
    lib.ec_encode_plan_batch.restype = ctypes.c_int
    lib.ec_encode_plan_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.ec_encode_plan_batch_strided.restype = ctypes.c_int
    lib.ec_encode_plan_batch_strided.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None:
        _LIB = _build() or False
    return _LIB or None


def native_available() -> bool:
    return _lib() is not None


def encode_plan(ops: np.ndarray, size: int,
                tables: Optional[np.ndarray] = None
                ) -> Tuple[bytes, int]:
    """Execute an encode plan natively. ops: int32 [N,4]. Returns
    (packet_bytes, final_rng)."""
    lib = _lib()
    assert lib is not None
    ops = np.ascontiguousarray(ops, dtype=np.int32)
    tab = np.ascontiguousarray(tables if tables is not None
                               else np.zeros(1, np.uint8), dtype=np.uint8)
    out = np.zeros(size, np.uint8)
    rng = ctypes.c_uint32()
    r = lib.ec_encode_plan(
        ops.ctypes.data, len(ops), tab.ctypes.data, out.ctypes.data, size,
        ctypes.byref(rng))
    if r < 0:
        raise RuntimeError(f"native encode failed ({r})")
    return out.tobytes(), rng.value


def decode_plan(ops: np.ndarray, data: bytes,
                tables: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, int]:
    """Execute a decode plan; returns (ops with symbols in col 1, rng)."""
    lib = _lib()
    assert lib is not None
    ops = np.ascontiguousarray(ops, dtype=np.int32).copy()
    tab = np.ascontiguousarray(tables if tables is not None
                               else np.zeros(1, np.uint8), dtype=np.uint8)
    buf = np.frombuffer(data, np.uint8).copy()
    rng = ctypes.c_uint32()
    r = lib.ec_decode_plan(
        ops.ctypes.data, len(ops), tab.ctypes.data, buf.ctypes.data,
        len(buf), ctypes.byref(rng))
    if r < 0:
        raise RuntimeError(f"native decode failed ({r})")
    return ops, rng.value


def encode_plan_batch(ops: np.ndarray, op_offsets: np.ndarray,
                      out_capacity_each: int,
                      tables: Optional[np.ndarray] = None):
    """Encode B streams' plans in one native call.

    ops: int32 [sum_ops, 4]; op_offsets: int32 [B+1].
    Returns (list of packets, uint32 rngs)."""
    lib = _lib()
    assert lib is not None
    ops = np.ascontiguousarray(ops, dtype=np.int32)
    op_offsets = np.ascontiguousarray(op_offsets, dtype=np.int32)
    B = len(op_offsets) - 1
    tab = np.ascontiguousarray(tables if tables is not None
                               else np.zeros(1, np.uint8), dtype=np.uint8)
    out_offsets = np.arange(B + 1, dtype=np.int32) * out_capacity_each
    out = np.zeros(B * out_capacity_each, np.uint8)
    sizes = np.zeros(B, np.int32)
    rngs = np.zeros(B, np.uint32)
    r = lib.ec_encode_plan_batch(
        ops.ctypes.data, op_offsets.ctypes.data, B, tab.ctypes.data,
        out.ctypes.data, out_offsets.ctypes.data, sizes.ctypes.data,
        rngs.ctypes.data)
    if r < 0:
        raise RuntimeError(f"native batch encode failed ({r})")
    # The range coder writes raw bits from the END of each stream's
    # region, so the packet is the full fixed-size region (the caller
    # chooses capacity = target packet size, as the reference does via
    # ec_enc storage/shrink). ``sizes`` reports bytes actually used.
    pkts = [out[out_offsets[i]:out_offsets[i + 1]].tobytes()
            for i in range(B)]
    return pkts, rngs


def encode_plan_batch_strided(ops: np.ndarray, counts: np.ndarray,
                              sizes: np.ndarray):
    """Pack B independent plans: ops int32 [B, max_ops, 4], counts [B],
    sizes [B] (per-stream byte budgets = packet sizes, CBR).

    Returns (out uint8 [B, max(sizes)] — packet s is out[s, :sizes[s]] —
    and rngs uint32 [B])."""
    lib = _lib()
    assert lib is not None
    ops = np.ascontiguousarray(ops, dtype=np.int32)
    counts = np.ascontiguousarray(counts, dtype=np.int32)
    sizes = np.ascontiguousarray(sizes, dtype=np.int32)
    B, max_ops, four = ops.shape
    assert four == 4
    stride = int(sizes.max())
    out = np.zeros((B, stride), np.uint8)
    used = np.zeros(B, np.int32)
    rngs = np.zeros(B, np.uint32)
    r = lib.ec_encode_plan_batch_strided(
        ops.ctypes.data, max_ops, counts.ctypes.data, B,
        out.ctypes.data, stride, sizes.ctypes.data, used.ctypes.data,
        rngs.ctypes.data)
    if r < 0:
        raise RuntimeError(f"native batch encode failed ({r})")
    return out, rngs
