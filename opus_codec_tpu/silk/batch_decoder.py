"""Batched SILK decoder — host symbol lane + device synthesis driver.

Splits ``silk_Decode`` (dec_API.c:132-455, mono path) the same way the
batched CELT decoder splits its frame decode: per stream, the host runs
the scalar entropy parse and parameter dequantization
(``decode_indices`` / ``decode_pulses`` / ``decode_parameters`` — all
table lookups and integer symbol math on a few hundred values), stacks
the per-frame control into ``[B, ...]`` record arrays, and the device
executes the whole batch's excitation + LTP/LPC synthesis in one jitted
int32 program (``silk.batch_core``) that is bit-exact vs the scalar
``decode_core``.

The host also pre-computes the exact gain recursion
(``INVERSE32_varQ`` / ``DIV32_varQ`` — CLZ + Newton steps on 4 scalars
per frame) so the device needs no integer division at all.

Scope (phase 1): mono, clean streams (no PLC/CNG — lost frames are the
scalar path's job), output at the SILK internal rate (the batched
resampler lane is the next milestone).

Behavioural parity: /root/reference/opus/silk/dec_API.c:132-455,
decode_frame.c, decode_core.c.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..bitstream.range_coder import RangeDecoder
from ..errors import OpusError
from . import tables as T
from .decoder import (CODE_CONDITIONALLY, CODE_INDEPENDENTLY,
                      TYPE_VOICED, SilkChannelState, _icdf,
                      decode_pulses)
from .sigproc import DIV32_varQ, INVERSE32_varQ, SMULWB, i32

__all__ = ["SilkBatchDecoder"]

MAX_LPC_ORDER = 16
LTP_ORDER = 5


class SilkBatchDecoder:
    """B concurrent mono SILK streams at one (internal rate, duration).

    decode(payloads) -> int16 PCM [B, n_frames * frame_length] at the
    internal rate.  ``payloads`` are raw SILK-layer bytes (the Opus
    frame data of SILK-only mono packets, without the TOC byte).
    """

    def __init__(self, batch: int, fs_khz: int = 16,
                 payload_ms: int = 20):
        import jax.numpy as jnp

        from . import batch_core as core
        if fs_khz not in (8, 12, 16):
            raise OpusError.bad_arg("internal rate must be 8/12/16 kHz")
        if payload_ms not in (10, 20, 40, 60):
            raise OpusError.bad_arg("payload must be 10/20/40/60 ms")
        self._jnp = jnp
        self._core = core
        self.batch = batch
        self.fs_khz = fs_khz
        self.payload_ms = payload_ms
        self.nb_subfr = 2 if payload_ms == 10 else 4
        self.frames_per_packet = max(1, payload_ms // 20)
        self.order = MAX_LPC_ORDER if fs_khz == 16 else 10
        self.chan: List[SilkChannelState] = []
        for _ in range(batch):
            cs = SilkChannelState()
            cs.nb_subfr = self.nb_subfr
            cs.nFramesPerPacket = self.frames_per_packet
            cs.set_fs(fs_khz, 48000)
            self.chan.append(cs)
        self.frame_length = self.chan[0].frame_length
        self.state = core.init_core_state(batch, fs_khz)
        self.final_ranges = np.zeros(batch, np.uint64)
        from . import batch_resampler as br
        self._br = br
        self.rs_state = br.init_resampler_state(batch)
        self._delay1 = jnp.zeros((batch, 1), jnp.int32)

    # -- host lane ---------------------------------------------------------

    def _parse_frame(self, cs: SilkChannelState, dec: RangeDecoder,
                     cond: int) -> dict:
        """One frame's symbols + exact gain math for one stream."""
        cs.decode_indices(dec, cs.nFramesDecoded, False, cond)
        ind = cs.indices
        pulses = decode_pulses(dec, ind.signalType, ind.quantOffsetType,
                               cs.frame_length)
        ctrl = cs.decode_parameters(cond)

        nb = self.nb_subfr
        inv_rw = [0] * nb
        adj = [0] * nb
        prev = cs.prev_gain_Q16
        for k in range(nb):
            g = ctrl["Gains_Q16"][k]
            inv = INVERSE32_varQ(g, 47)
            adj[k] = DIV32_varQ(prev, g, 16) if g != prev else (1 << 16)
            prev = g
            inv_rw[k] = i32(SMULWB(inv, ctrl["LTP_scale_Q14"]) << 2) \
                if k == 0 else inv
        cs.prev_gain_Q16 = prev

        offset_Q10 = int(T.Quantization_Offsets_Q10[
            ind.signalType >> 1][ind.quantOffsetType])
        A = np.zeros((2, MAX_LPC_ORDER), np.int32)
        for h in range(2):
            A[h, :self.order] = ctrl["PredCoef_Q12"][h]
        rec = {
            "pulses": np.asarray(pulses[:cs.frame_length], np.int32),
            "seed": np.int32(ind.Seed),
            "offset_Q10": np.int32(offset_Q10),
            "voiced": ind.signalType == TYPE_VOICED,
            "interp": ind.NLSFInterpCoef_Q2 < 4,
            "A_Q12": A,
            "B_Q14": np.asarray(ctrl["LTPCoef_Q14"],
                                np.int32).reshape(nb, LTP_ORDER),
            "pitchL": np.asarray(ctrl["pitchL"], np.int32),
            "Gain_Q10": np.asarray(
                [g >> 6 for g in ctrl["Gains_Q16"]], np.int32),
            "inv_gain_rw_Q31": np.asarray(inv_rw, np.int32),
            "gain_adj_Q16": np.asarray(adj, np.int32),
        }
        # state bookkeeping decode_frame would do (decode_frame.c:78-98);
        # outBuf/sLPC live on device
        cs.lossCnt = 0
        cs.prevSignalType = ind.signalType
        cs.first_frame_after_reset = False
        cs.lagPrev = ctrl["pitchL"][nb - 1]
        cs.nFramesDecoded += 1
        return rec

    def parse(self, payloads: Sequence[bytes]) -> List[dict]:
        """Host half: parse B payloads -> per-frame stacked params.
        Returns a list of ``n_frames`` dicts of [B, ...] arrays."""
        if len(payloads) != self.batch:
            raise OpusError.bad_arg("payload count != batch")
        per_frame: List[List[dict]] = \
            [[] for _ in range(self.frames_per_packet)]
        for b, data in enumerate(payloads):
            cs = self.chan[b]
            dec = RangeDecoder(data)
            cs.nFramesDecoded = 0
            # header flags (dec_API.c:252-280, mono)
            for i in range(self.frames_per_packet):
                cs.VAD_flags[i] = dec.dec_bit_logp(1)
            cs.LBRR_flag = dec.dec_bit_logp(1)
            cs.LBRR_flags = [0] * 3
            if cs.LBRR_flag:
                if self.frames_per_packet == 1:
                    cs.LBRR_flags[0] = 1
                else:
                    sym = _icdf(dec, (T.LBRR_flags_2_iCDF,
                                      T.LBRR_flags_3_iCDF)[
                        self.frames_per_packet - 2]) + 1
                    for i in range(self.frames_per_packet):
                        cs.LBRR_flags[i] = (sym >> i) & 1
                # skip LBRR frames (dec_API.c:281-306)
                for i in range(self.frames_per_packet):
                    if cs.LBRR_flags[i]:
                        cond = CODE_CONDITIONALLY if (
                            i > 0 and cs.LBRR_flags[i - 1]) \
                            else CODE_INDEPENDENTLY
                        cs.decode_indices(dec, i, True, cond)
                        decode_pulses(dec, cs.indices.signalType,
                                      cs.indices.quantOffsetType,
                                      cs.frame_length)
            for i in range(self.frames_per_packet):
                cond = CODE_INDEPENDENTLY if i == 0 \
                    else CODE_CONDITIONALLY
                per_frame[i].append(self._parse_frame(cs, dec, cond))
            self.final_ranges[b] = dec.rng
        out = []
        for frames in per_frame:
            stacked = {}
            for key in frames[0]:
                stacked[key] = self._jnp.asarray(
                    np.stack([f[key] for f in frames]))
            out.append(stacked)
        return out

    # -- device lane -------------------------------------------------------

    def decode_step_device(self, params_list):
        outs = []
        for params in params_list:
            xq, self.state = self._core.silk_decode_core_batch_jit(
                params, self.state, self.fs_khz, self.nb_subfr)
            outs.append(xq)
        return self._jnp.concatenate(outs, axis=1) if len(outs) > 1 \
            else outs[0]

    def decode(self, payloads: Sequence[bytes]) -> np.ndarray:
        """Payloads in, internal-rate int16 PCM [B, n*L] out."""
        return np.asarray(
            self.decode_step_device(self.parse(payloads)),
            np.int16)

    def resample_step_device(self, xq):
        """Internal-rate -> 48 kHz with the one-sample mono delay of
        dec_API.c:1121-1148 (sStereo.sMid carry)."""
        jnp = self._jnp
        inp = jnp.concatenate([self._delay1, xq[:, :-1]], axis=1)
        self._delay1 = xq[:, -1:]
        out, self.rs_state = self._br.resample_to48_batch_jit(
            inp, self.rs_state, self.fs_khz)
        return out

    def decode_48k(self, payloads: Sequence[bytes]) -> np.ndarray:
        """Payloads in, 48 kHz int16 PCM [B, n*L*48/fs] out."""
        xq = self.decode_step_device(self.parse(payloads))
        return np.asarray(self.resample_step_device(xq), np.int16)
