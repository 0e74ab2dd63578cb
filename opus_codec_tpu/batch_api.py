"""Batched public API: many-stream encode on device, packing on host.

This is the TPU-native entry point the reference has no analogue for
(SURVEY §2.6: the reference scales by thread-per-stream,
tests/multhithread.rs; here the unit of work is a stream *batch*): the
device computes every symbol for B streams in one jitted program
(celt.batch_encoder) and the native host lane (runtime/ec_lane.c,
OpenMP over streams) turns the symbol plans into packets, pipelined
behind the next frame's device step.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .bitstream import packet as pkt
from .errors import OpusError
from .types import Bandwidth, CodecMode

__all__ = ["CeltBatchEncoder", "CeltBatchDecoder", "OpusBatchEncoder"]


class CeltBatchEncoder:
    """CELT-only batched encoder: B concurrent 48 kHz mono or stereo
    streams (the flagship batched pipeline; mirrors the scalar
    Encoder's CELT mode at the given complexity (0-3: transients /
    short blocks / tf analysis / spreading), CBR or VBR, incl. the
    stereo theta/intensity/dual-stereo band tree for channels == 2).

    encode(pcm [B, frame_size] mono / [B, 2, frame_size] or interleaved
    [B, 2*frame_size] stereo) -> (packets, final_ranges).
    """

    def __init__(self, batch: int, bitrate: int = 64000,
                 sample_rate: int = 48000, frame_size: int = 960,
                 exact: bool = False, channels: int = 1,
                 complexity: int = 0, vbr: bool = False,
                 constrained_vbr: bool = True):
        import jax.numpy as jnp

        from .celt import batch_encoder as be
        if sample_rate != 48000:
            raise OpusError.bad_arg("batched path is 48 kHz")
        if channels not in (1, 2):
            raise OpusError.bad_arg("channels must be 1 or 2")
        lm = {120: 0, 240: 1, 480: 2, 960: 3}.get(frame_size)
        if lm is None:
            raise OpusError.bad_arg("bad frame size")
        self._be = be
        self._jnp = jnp
        self.batch = batch
        self.bitrate = bitrate
        self.frame_size = frame_size
        self.channels = channels
        self.complexity = int(complexity)
        self.vbr = bool(vbr)
        self.constrained_vbr = bool(constrained_vbr)
        self.lm = lm
        # CBR: the per-frame byte count; VBR: the byte CAP fed to the
        # plan (opus_encoder.c's 1275 >> (3-LM) ceiling applies inside)
        self.nbytes = 1275 >> (3 - lm) if vbr else be.cbr_bytes(
            bitrate, self.frame_size, sample_rate, 1275)
        self.exact = exact
        dtype = jnp.float64 if exact else jnp.float32
        self.state = be.init_stream_state(
            batch, dtype=dtype, complexity=self.complexity,
            vbr=self.vbr) \
            if channels == 1 else \
            be.init_stream_state_stereo(batch, dtype=dtype,
                                        complexity=self.complexity,
                                        vbr=self.vbr)
        self._nbytes_dev = jnp.full((batch,), self.nbytes, jnp.int32)
        self._bitrate_dev = jnp.full((batch,), bitrate, jnp.int32)
        self._toc = pkt.gen_toc(CodecMode.CELT_ONLY, 400 >> lm,
                                Bandwidth.FULLBAND, channels)
        self.final_ranges = np.zeros(batch, np.uint64)
        self._packed_fn = None
        self._frames_fn = None

    def _shape_pcm(self, pcm):
        """Accept [B, N] (mono), [B, C, N] (planar stereo) or
        interleaved [B, N*C] (the reference opus_encode layout,
        encoder.rs:80-126) and return the planner's layout."""
        jnp = self._jnp
        if self.channels == 1:
            return pcm
        if pcm.ndim == 3:
            return pcm
        N = self.frame_size
        return jnp.transpose(
            pcm.reshape(pcm.shape[0], N, 2), (0, 2, 1))

    def encode_step_device(self, pcm):
        """Device half only: returns (plan coder, updates state).
        ``pcm``: [B, 960] float array (jnp or np)."""
        pcm = self._shape_pcm(self._jnp.asarray(pcm))
        fn = self._be.celt_encode_batch_plan_jit if self.channels == 1 \
            else self._be.celt_encode_batch_plan_stereo_jit
        out = fn(
            pcm, self.state, self._nbytes_dev, self._bitrate_dev,
            lm=self.lm, exact=self.exact, complexity=self.complexity,
            vbr=self.vbr, constrained_vbr=self.constrained_vbr)
        if self.vbr:
            c, self.state, self._sizes = out
        else:
            c, self.state = out
            self._sizes = None
        return c

    def pack(self, c) -> Tuple[List[bytes], np.ndarray]:
        """Host half: native range coding of the symbol plans."""
        from . import runtime as rt
        ops = np.asarray(c.ops)
        counts = np.full(self.batch, ops.shape[1], np.int32)
        sizes = np.asarray(self._sizes, np.int32) \
            if getattr(self, "_sizes", None) is not None \
            else np.full(self.batch, self.nbytes, np.int32)
        if rt.native_available():
            out, rngs = rt.encode_plan_batch_strided(ops, counts, sizes)
            packets = [bytes([self._toc])
                       + out[b][:sizes[b]].tobytes()
                       for b in range(self.batch)]
        else:                      # scalar fallback lane
            from .bitstream.range_coder import RangeEncoder
            packets = []
            rngs = np.zeros(self.batch, np.uint32)
            for b in range(self.batch):
                enc = RangeEncoder(int(sizes[b]))
                for row in ops[b]:
                    kind, a, _bv, cv = (int(v) for v in row)
                    if kind < 0:
                        continue
                    if kind == 0:
                        enc.encode(a, int(row[2]), cv)
                    elif kind == 1:
                        enc.encode_bin(a, int(row[2]), cv)
                    elif kind == 2:
                        enc.enc_bit_logp(a, cv)
                    elif kind == 5:
                        enc.enc_bits(a, cv)
                enc.done()
                rngs[b] = enc.rng
                packets.append(bytes([self._toc]) + enc.data())
        self.final_ranges = rngs
        return packets, rngs

    def encode(self, pcm) -> List[bytes]:
        """PCM in, packets out (one device step + host packing)."""
        return self.pack(self.encode_step_device(pcm))[0]

    def encode_device_packed(self, pcm):
        """Fully device-resident encode: symbol planning AND range
        coding run in one jitted program (``celt.batch_pack``); only
        the finished packet payload crosses to the host — ~30x less
        transfer than shipping plans.  Returns ONE fused uint8
        [B, nbytes + 4] device array: packet bytes then the
        little-endian 32-bit final range (a single tunnel round trip
        fetches everything)."""
        import jax

        from .celt import batch_pack as bp
        pcm = self._shape_pcm(self._jnp.asarray(pcm))
        if self._packed_fn is None:
            be = self._be
            jnp = self._jnp
            lm, exact, nbytes = self.lm, self.exact, self.nbytes
            plan_fn = be.celt_encode_batch_plan if self.channels == 1 \
                else be.celt_encode_batch_plan_stereo

            cplx = self.complexity
            vbr = self.vbr
            cvbr = self.constrained_vbr

            def run(pcm, state, nb, br):
                if pcm.dtype == jnp.int16:
                    # int16 API lane: halves the host->device traffic
                    pcm = pcm.astype(jnp.float32) * (1.0 / 32768.0)
                pout = plan_fn(
                    pcm, state, nb, br, lm=lm, exact=exact,
                    complexity=cplx, vbr=vbr, constrained_vbr=cvbr)
                if vbr:
                    c, st2, sizes = pout
                else:
                    (c, st2), sizes = pout, nb
                out, rng = bp.pack_plan_device(c.ops, sizes, nbytes)
                # one fused uint8 payload: bytes + little-endian final
                # range + per-stream size per row — a single tunnel
                # round trip fetches everything
                rng_le = jnp.stack(
                    [(rng >> (8 * k)).astype(jnp.uint8)
                     for k in range(4)], axis=1)
                sz_le = jnp.stack(
                    [(sizes >> (8 * k)).astype(jnp.uint8)
                     for k in range(2)], axis=1)
                return jnp.concatenate([out, rng_le, sz_le],
                                       axis=1), st2

            self._packed_fn = jax.jit(run)
        payload, self.state = self._packed_fn(
            pcm, self.state, self._nbytes_dev, self._bitrate_dev)
        return payload

    def split_payload(self, payload_host: np.ndarray):
        """Fetched [B, nbytes+6] uint8 payload -> (packets, ranges):
        packet bytes, then LE32 final range, then LE16 per-stream
        size (== nbytes at CBR)."""
        ob = payload_host[:, :self.nbytes]
        tail = payload_host[:, self.nbytes:].astype(np.uint64)
        rngs = (tail[:, 0] | (tail[:, 1] << 8) | (tail[:, 2] << 16)
                | (tail[:, 3] << 24))
        sizes = (tail[:, 4] | (tail[:, 5] << 8)).astype(np.int64)
        self.final_ranges = rngs
        toc = bytes([self._toc])
        return ([toc + ob[b, :sizes[b]].tobytes()
                 for b in range(self.batch)], rngs)

    def encode_packed(self, pcm) -> Tuple[List[bytes], np.ndarray]:
        """PCM in, packets out via the device packer."""
        return self.split_payload(
            np.asarray(self.encode_device_packed(pcm)))

    def encode_frames_device(self, pcm_frames):
        """Sequence-parallel lane: T frames per stream in ONE device
        call — a ``lax.scan`` over frames wraps the full plan+pack
        step, so long signals amortize every host round trip (SURVEY
        §2.6 SP).  pcm_frames: [B, T, frame_size].  Returns
        (bytes [B, T, nbytes], rng [B, T]) device arrays."""
        import jax

        from .celt import batch_pack as bp
        if self.vbr:
            raise OpusError.bad_arg(
                "sequence-parallel frames lane is CBR-only")
        pcm_frames = self._jnp.asarray(pcm_frames)
        if self._frames_fn is None:
            import jax.numpy as jnp

            be = self._be
            lm, exact, nbytes = self.lm, self.exact, self.nbytes
            cplx = self.complexity
            plan_fn = be.celt_encode_batch_plan if self.channels == 1 \
                else be.celt_encode_batch_plan_stereo

            def run(pcm_frames, state, nb, br):
                if pcm_frames.dtype == jnp.int16:
                    # int16 API lane: halves the host->device traffic
                    pcm_frames = pcm_frames.astype(jnp.float32) \
                        * (1.0 / 32768.0)

                def body(st, pcm):
                    c, st = plan_fn(
                        pcm, st, nb, br, lm=lm, exact=exact,
                        complexity=cplx)   # CBR-only lane
                    out, rng = bp.pack_plan_device(c.ops, nb, nbytes)
                    return st, (out, rng)

                st, (outs, rngs) = jax.lax.scan(
                    body, state, jnp.moveaxis(pcm_frames, 1, 0))
                return outs, rngs, st

            self._frames_fn = jax.jit(run)
        outs, rngs, self.state = self._frames_fn(
            pcm_frames, self.state, self._nbytes_dev, self._bitrate_dev)
        # [T, B, ...] -> [B, T, ...]
        return (self._jnp.moveaxis(outs, 0, 1),
                self._jnp.moveaxis(rngs, 0, 1))

    def encode_frames(self, pcm_frames) -> Tuple[List[List[bytes]],
                                                 np.ndarray]:
        """[B, T, N] PCM in -> per-stream packet lists + ranges."""
        outs, rngs = self.encode_frames_device(pcm_frames)
        ob = np.asarray(outs).astype(np.uint8)
        rg = np.asarray(rngs).astype(np.uint64)
        self.final_ranges = rg[:, -1]
        toc = bytes([self._toc])
        pkts = [[toc + ob[b, t].tobytes() for t in range(ob.shape[1])]
                for b in range(ob.shape[0])]
        return pkts, rg


class CeltBatchDecoder:
    """CELT-only batched decoder: B concurrent 48 kHz mono streams.

    The host lane dry-parses each stream's frame symbols
    (``celt.dec_parse``, final_range-checked against the scalar
    decoder) and the device synthesizes PCM for the whole batch in one
    jitted program (``celt.batch_decoder``).

    decode(packets: list[bytes]) -> pcm [B, N] float.

    Scope: mono streams including transient/short-block frames, tf
    haar cascades, anti-collapse and the comb postfilter (``strict``
    is retained for API compatibility; nothing is rejected).
    """

    def __init__(self, batch: int, frame_size: int = 960,
                 sample_rate: int = 48000, strict: bool = True):
        import jax.numpy as jnp

        from .celt import batch_decoder as bdec
        from .celt import dec_parse as dparse
        if sample_rate != 48000:
            raise OpusError.bad_arg("batched path is 48 kHz")
        lm = {120: 0, 240: 1, 480: 2, 960: 3}.get(frame_size)
        if lm is None:
            raise OpusError.bad_arg("bad frame size")
        self._bd = bdec
        self._dp = dparse
        self._jnp = jnp
        self.batch = batch
        self.frame_size = frame_size
        self.lm = lm
        self.strict = strict
        self.state = bdec.init_dec_state(batch)
        self.seeds = [0] * batch
        self.final_ranges = np.zeros(batch, np.uint64)

    def parse(self, packets: List[bytes]):
        """Host half: dry symbol parse of B CELT frames.  ``packets``
        are raw CELT frames (no TOC byte).  Uses the native OpenMP
        lane (runtime/dec_lane.c) when a C toolchain is present; falls
        back to the per-stream Python parser."""
        from .runtime.parse import dec_parse_batch
        native = dec_parse_batch(packets, self.lm, list(self.seeds))
        if native is not None and not np.any(native["error"]):
            self.seeds = [int(r) for r in native["final_range"]]
            self.final_ranges = native["final_range"].astype(np.uint64)
            # match stack_syms' exact key set (the jitted decoder's
            # input pytree)
            for extra in ("error", "dual_stereo", "intensity"):
                native.pop(extra)
            return {k: self._jnp.asarray(v) for k, v in native.items()}
        syms_list = []
        for b, pkt in enumerate(packets):
            s = self._dp.parse_frame(pkt, self.lm, seed=self.seeds[b])
            self.seeds[b] = s.final_range
            self.final_ranges[b] = s.final_range
            syms_list.append(s)
        stacked = self._dp.stack_syms(syms_list)
        return {k: self._jnp.asarray(v) for k, v in stacked.items()}

    def decode_step_device(self, syms):
        """Device half: batched synthesis."""
        pcm, self.state = self._bd.celt_decode_batch_jit(
            syms, self.state, self.lm)
        return pcm

    def decode(self, packets: List[bytes]) -> np.ndarray:
        return np.asarray(self.decode_step_device(self.parse(packets)))


class OpusBatchEncoder:
    """Mixed-mode batched encoder: B streams with per-stream codec
    mode/bitrate, routed through per-bucket batched lanes (EP-style —
    SURVEY §2.6/§7 step 6: bucketing keeps the device lanes dense when
    a fleet mixes voice and music streams).

    configs: one dict per stream:
      {"mode": "celt" | "silk", "bitrate": int,
       "complexity": int?, "vbr": bool?, ...}
    Buckets form per distinct (mode, bitrate, complexity, vbr).  CELT
    buckets run the device lane (``CeltBatchEncoder`` — incl. the
    default-quality decision set and VBR); SILK buckets run
    ``SilkBatchEncoder`` (device NSQ/NLSF/LTP kernels, byte-identical
    to the scalar encoder).  ``encode`` scatters packets back to
    stream order.
    """

    def __init__(self, configs, sample_rate: int = 48000,
                 frame_size: int = 960, exact: bool = False):
        from .parallel.pipeline import bucket_by
        from .silk.batch_encoder import SilkBatchEncoder
        self.configs = list(configs)
        self.batch = len(self.configs)
        keys = [(c["mode"], int(c["bitrate"]),
                 int(c.get("complexity", 9 if c["mode"] == "silk"
                           else 0)),
                 bool(c.get("vbr", False))) for c in self.configs]
        self.buckets = bucket_by(keys)
        self.lanes = {}
        for key, idx in self.buckets.items():
            mode, bitrate, cplx, vbr = key
            if mode == "celt":
                self.lanes[key] = CeltBatchEncoder(
                    len(idx), bitrate=bitrate,
                    sample_rate=sample_rate, frame_size=frame_size,
                    exact=exact, complexity=cplx, vbr=vbr)
            elif mode == "silk":
                self.lanes[key] = SilkBatchEncoder(
                    len(idx), bitrate=bitrate,
                    sample_rate=sample_rate, frame_size=frame_size,
                    complexity=cplx, vbr=vbr)
            else:
                raise OpusError.bad_arg(f"unknown mode {mode!r}")

    def encode(self, pcm) -> List[bytes]:
        """pcm [B, frame_size] (float or int16) -> per-stream packets
        in the original stream order."""
        pcm = np.asarray(pcm)
        out: List[Optional[bytes]] = [None] * self.batch
        for key, idx in self.buckets.items():
            lane = self.lanes[key]
            sub = pcm[idx]
            if isinstance(lane, CeltBatchEncoder):
                pkts, _ = lane.encode_packed(sub)
            else:
                pkts = lane.encode(sub)
            for j, b in enumerate(idx):
                out[b] = pkts[j]
        return out


class OpusBatchDecoder:
    """Mixed-mode batched decoder: B streams routed by TOC to
    per-bucket device lanes (the decode-side mirror of
    ``OpusBatchEncoder``).

    configs: one dict per stream:
      {"mode": "celt", "frame_size": int}   -> CeltBatchDecoder lane
      {"mode": "silk", "fs_khz": int, "payload_ms": int}
                                            -> SilkBatchDecoder lane
                                               (bit-exact, 48 kHz out)
    decode(packets) -> pcm [B, frame_size] float32 in stream order.
    Packets carry their TOC byte (regular Opus packets).
    """

    def __init__(self, configs, sample_rate: int = 48000,
                 frame_size: int = 960):
        from .parallel.pipeline import bucket_by
        from .silk.batch_decoder import SilkBatchDecoder
        self.configs = list(configs)
        self.batch = len(self.configs)
        self.frame_size = frame_size

        def key_of(c):
            if c["mode"] == "celt":
                return ("celt", int(c.get("frame_size", frame_size)))
            return ("silk", int(c.get("fs_khz", 16)),
                    int(c.get("payload_ms", 20)))

        self.buckets = bucket_by([key_of(c) for c in self.configs])
        self.lanes = {}
        for key, idx in self.buckets.items():
            if key[0] == "celt":
                self.lanes[key] = CeltBatchDecoder(
                    len(idx), frame_size=key[1],
                    sample_rate=sample_rate)
            else:
                self.lanes[key] = SilkBatchDecoder(
                    len(idx), fs_khz=key[1], payload_ms=key[2])

    def decode(self, packets: List[bytes]) -> np.ndarray:
        out = np.zeros((self.batch, self.frame_size), np.float32)
        for key, idx in self.buckets.items():
            lane = self.lanes[key]
            subs = [packets[i] for i in idx]
            if key[0] == "celt":
                # strip the TOC byte: the CELT lane parses raw frames
                pcm = lane.decode([p[1:] for p in subs])
                out[idx, :pcm.shape[1]] = pcm[:, :self.frame_size]
            else:
                pcm = lane.decode_48k([p[1:] for p in subs])
                n = min(pcm.shape[1], self.frame_size)
                out[idx, :n] = pcm[:, :n].astype(np.float32) / 32768.0
        return out
