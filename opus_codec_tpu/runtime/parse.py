"""Native batched CELT dry parse — ctypes binding for dec_lane.c.

The batched decoder's host half (``celt.dec_parse.parse_frame``) is a
serial per-stream symbol walk; this lane runs it in C with OpenMP over
the stream batch (the decode-direction sibling of the ec_lane packer,
VERDICT r2 #6).  Mode tables are marshalled from ``celt.modes`` so the
tables live in exactly one place.

``dec_parse_batch(packets, lm, seeds)`` returns the same dict of
batched arrays as ``dec_parse.stack_syms`` (plus ``error``), or None
when no C toolchain is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from functools import lru_cache
from typing import List, Optional, Sequence

import numpy as np

__all__ = ["native_parse_available", "dec_parse_batch"]

_LIB = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    src = os.path.join(os.path.dirname(__file__), "dec_lane.c")
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(),
                         f"opus_codec_tpu_dec_lane_{tag}.so")
    if not os.path.exists(cache):
        cc = os.environ.get("CC", "cc")
        for flags in (["-O2", "-shared", "-fPIC", "-fopenmp"],
                      ["-O2", "-shared", "-fPIC"]):
            try:
                subprocess.run([cc, *flags, "-o", cache + ".tmp", src],
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
    lib.celt_dry_parse_batch.restype = ctypes.c_int
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def native_parse_available() -> bool:
    return _lib() is not None


@lru_cache(maxsize=None)
def _mode_blobs(lm: int):
    from ..celt.dec_parse import node_table
    from ..celt.modes import E_PROB_MODEL, standard_mode
    m = standard_mode()
    tab = node_table(lm)
    nb = m.nb_ebands
    e_bands = np.ascontiguousarray(np.asarray(m.e_bands, np.int32))
    alloc = np.ascontiguousarray(
        np.asarray(m.alloc_vectors, np.uint8).reshape(-1))
    log_n = np.ascontiguousarray(np.asarray(m.log_n, np.int32))
    cache_index = np.ascontiguousarray(
        np.asarray(m.cache_index, np.int32))
    cache_bits = np.ascontiguousarray(
        np.asarray(m.cache_bits, np.uint8))
    caps = np.ascontiguousarray(
        np.asarray(m.init_caps(lm, 1), np.int32))
    e_prob = np.ascontiguousarray(np.concatenate(
        [np.asarray(E_PROB_MODEL[lm][0], np.uint8),
         np.asarray(E_PROB_MODEL[lm][1], np.uint8)]))
    band_first = np.ascontiguousarray(
        np.asarray(tab.band_first, np.int32))
    node_child = np.ascontiguousarray(
        np.asarray(tab.node_child, np.int32).reshape(-1))
    return (m, tab, nb, e_bands, alloc, log_n, cache_index, cache_bits,
            caps, e_prob, band_first, node_child)


def dec_parse_batch(packets: Sequence[bytes], lm: int,
                    seeds: Optional[Sequence[int]] = None):
    """Dry-parse B raw CELT frames (no TOC byte) natively.

    Returns the ``stack_syms``-shaped dict (int32/uint32/bool arrays)
    plus ``error`` [B]; None when the native lane is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    (m, tab, nb, e_bands, alloc, log_n, cache_index, cache_bits, caps,
     e_prob, band_first, node_child) = _mode_blobs(lm)
    B = len(packets)
    n_nodes = tab.n_nodes
    if seeds is None:
        seeds = [0] * B
    data = b"".join(bytes(p) for p in packets)
    offs = np.zeros(B + 1, np.int64)
    np.cumsum([len(p) for p in packets], out=offs[1:])
    buf = np.frombuffer(data, np.uint8) if data else \
        np.zeros(1, np.uint8)
    seeds_a = np.asarray(seeds, np.uint32)

    scal = np.zeros((B, 13), np.int32)
    zi = lambda *s: np.zeros((B,) + s, np.int32)  # noqa: E731
    zu = lambda *s: np.zeros((B,) + s, np.uint32)  # noqa: E731
    qi, tf_res, fine_q, fine_bits = zi(nb), zi(nb), zi(nb), zi(nb)
    pulses, sign_n1 = zi(nb), zi(nb)
    finalise = zi(2, nb)
    band_B, band_rec, band_td, band_eff = zi(nb), zi(nb), zi(nb), zi(nb)
    cmasks = zi(nb)
    node_kind, node_k = zi(n_nodes), zi(n_nodes)
    node_itheta, node_fill = zi(n_nodes), zi(n_nodes)
    node_index, node_seed = zu(n_nodes), zu(n_nodes)

    def P(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    lib.celt_dry_parse_batch(
        P(buf), P(offs), P(seeds_a), ctypes.c_int(B), ctypes.c_int(lm),
        ctypes.c_int(nb), ctypes.c_int(n_nodes),
        ctypes.c_int(m.nb_alloc_vectors),
        P(e_bands), P(alloc), P(log_n), P(cache_index), P(cache_bits),
        P(caps), P(e_prob), P(band_first), P(node_child),
        P(scal), P(qi), P(tf_res), P(fine_q), P(fine_bits), P(pulses),
        P(sign_n1), P(finalise), P(band_B), P(band_rec), P(band_td),
        P(band_eff), P(cmasks), P(node_kind), P(node_k),
        P(node_itheta), P(node_fill), P(node_index), P(node_seed))

    return dict(
        silence=scal[:, 0].astype(bool),
        pf_pitch=scal[:, 1], pf_qg=scal[:, 2], pf_tapset=scal[:, 3],
        transient=scal[:, 4].astype(bool),
        intra=scal[:, 5].astype(bool), spread=scal[:, 6],
        dual_stereo=scal[:, 7], intensity=scal[:, 8],
        anti_collapse_on=scal[:, 9].astype(bool),
        final_range=scal[:, 10].astype(np.uint32),
        seed_after_bands=scal[:, 11].astype(np.uint32),
        error=scal[:, 12],
        qi=qi, tf_res=tf_res, fine_q=fine_q, fine_bits=fine_bits,
        finalise=finalise, pulses=pulses, sign_n1=sign_n1,
        node_kind=node_kind, node_k=node_k, node_index=node_index,
        node_itheta=node_itheta, node_fill=node_fill,
        node_seed=node_seed, band_B=band_B, band_recombine=band_rec,
        band_time_divide=band_td, band_eff_lowband=band_eff,
        collapse_masks=cmasks)
