"""Public API surface mirroring the reference crate (src/*.rs).

Parity map:
  Encoder      <- src/encoder.rs   (CTL methods one-per-setting)
  Decoder      <- src/decoder.rs
  Repacketizer <- src/repacketizer.rs (repacketizer.c semantics)
  packet utils <- src/packet.rs    (re-exported from bitstream.packet)

``Encoder`` covers all three modes: CELT-only for music/low-delay,
SILK-only (mono + stereo, NB/MB/WB, DTX/LBRR) for voice, and hybrid
(SILK WB + CELT bands 17+) for SWB/FB voice.  The decoder handles all
modes bit-exactly against libopus.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .bitstream import packet as pkt
from .bitstream.range_coder import RangeEncoder
from .celt.encoder import CeltEncoder
from .constants import MAX_FRAME_BYTES, max_frame_samples_for
from .errors import ErrorCode, OpusError
from .opus.decoder import OpusDecoder
from .opus.hp_filter import dc_reject, hp_cutoff
from .silk.sigproc import SMLAWB, lin2log, log2lin
from .types import Application, Bandwidth, Bitrate, CodecMode, Signal

__all__ = ["Encoder", "Decoder", "Repacketizer"]

_CELT_END_BAND = {int(Bandwidth.NARROWBAND): 13, int(Bandwidth.WIDEBAND): 17,
                  int(Bandwidth.MEDIUMBAND): 17,
                  int(Bandwidth.SUPERWIDEBAND): 19,
                  int(Bandwidth.FULLBAND): 21}

_MAX_BANDWIDTH = {8000: Bandwidth.NARROWBAND, 12000: Bandwidth.WIDEBAND,
                  16000: Bandwidth.WIDEBAND, 24000: Bandwidth.SUPERWIDEBAND,
                  48000: Bandwidth.FULLBAND}


class Encoder:
    """Opus encoder (encoder.rs:40-707 surface)."""

    def __init__(self, sample_rate: int, channels: int,
                 application: Application):
        if sample_rate not in (8000, 12000, 16000, 24000, 48000):
            raise OpusError.bad_arg("bad sample rate")
        if channels not in (1, 2):
            raise OpusError.bad_arg("bad channels")
        self.sample_rate = sample_rate
        self.channels = channels
        self.application = Application(application)
        self.celt = CeltEncoder(sample_rate, channels)
        self._bitrate = Bitrate.AUTO
        self._vbr = True
        self._vbr_constraint = True
        self._complexity = 9
        self._max_bandwidth = _MAX_BANDWIDTH[sample_rate]
        self._bandwidth = Bandwidth.AUTO
        self._signal = Signal.AUTO
        self._inband_fec = False
        self._packet_loss_perc = 0
        self._dtx = False
        self._lsb_depth = 24
        self._force_channels: Optional[int] = None
        self._prediction_disabled = False
        self._phase_inversion_disabled = False
        self._in_dtx = False
        self.final_range = 0
        # input HP front-end state (opus_encoder.c:286, 1795-1830)
        self._hp_mem = np.zeros(4)
        self._variable_HP_smth2_Q15 = lin2log(60) << 8
        self._apply_settings()

    # -- settings plumbing -------------------------------------------------

    def _auto_bitrate(self) -> int:
        # opus_encoder.c user_bitrate_to_bitrate AUTO formula
        return 60 * self.sample_rate // 960 * self.channels \
            + self.sample_rate * self.channels

    def _bitrate_bps(self) -> int:
        if self._bitrate == Bitrate.AUTO:
            return self._auto_bitrate()
        if self._bitrate == Bitrate.MAX:
            return -1
        return self._bitrate.bps if isinstance(self._bitrate, Bitrate) \
            else int(self._bitrate)

    def _apply_settings(self):
        bw = self._bandwidth if self._bandwidth != Bandwidth.AUTO \
            else self._max_bandwidth
        bw = Bandwidth(min(int(bw), int(self._max_bandwidth)))
        self._effective_bw = bw
        self.celt.end = _CELT_END_BAND[int(bw)]
        bps = self._bitrate_bps()
        self.celt.bitrate = -1 if bps < 0 else bps
        self.celt.vbr = self._vbr
        self.celt.constrained_vbr = self._vbr_constraint
        self.celt.complexity = self._complexity
        self.celt.lsb_depth = self._lsb_depth
        self.celt.loss_rate = self._packet_loss_perc
        self.celt.disable_pf = self._prediction_disabled

    # -- encode ------------------------------------------------------------

    def _frame_ms_x4(self, samples: int) -> int:
        """Frame duration in quarter-milliseconds (validating)."""
        q = samples * 4000 // self.sample_rate
        if q not in (10, 20, 40, 80, 160, 240, 320, 400, 480) or \
                q * self.sample_rate != samples * 4000:
            raise OpusError.bad_arg(f"bad frame size {samples}")
        return q

    def encode_float(self, pcm: np.ndarray, max_bytes: int = 4000) -> bytes:
        """pcm: interleaved float [-1,1], len = frame*channels (or [C, N])."""
        if pcm.ndim == 1:
            if len(pcm) % self.channels:
                raise OpusError.bad_arg("pcm length % channels != 0")
            frames = pcm.reshape(-1, self.channels).T
        else:
            frames = pcm
        n = frames.shape[1]
        if n > max_frame_samples_for(self.sample_rate):
            raise OpusError.bad_arg("frame too long")
        qms = self._frame_ms_x4(n)
        f20 = self.sample_rate // 50
        bps = self._bitrate_bps()

        frames = self._hp_process(frames,
                                  celt_only=not self._use_silk_mode(qms, bps))
        if self._use_silk_mode(qms, bps):
            return self._encode_silk(frames, qms, bps, max_bytes)

        if qms <= 80:  # single CELT frame (2.5..20 ms)
            framerate = 4000 // qms
            nbytes = min(max_bytes, MAX_FRAME_BYTES)
            if not self._vbr:
                if bps <= 0:
                    bps = self._auto_bitrate()
                nbytes = min(nbytes, max(2, bps * n // (8 * self.sample_rate)))
            frame = self.celt.encode_with_ec(frames, n, nbytes)
            self.final_range = self.celt.rng
            toc = pkt.gen_toc(CodecMode.CELT_ONLY, framerate,
                              self._effective_bw, self.channels)
            out = bytes([toc]) + frame
        else:  # multiframe packet of 20 ms CELT frames
            nb = qms // 80
            per_budget = max_bytes // nb
            subs = []
            rng = 0
            for i in range(nb):
                sub = frames[:, i * f20:(i + 1) * f20]
                nbytes = min(per_budget, MAX_FRAME_BYTES)
                if not self._vbr:
                    if bps <= 0:
                        bps = self._auto_bitrate()
                    nbytes = min(nbytes, max(
                        2, bps * f20 // (8 * self.sample_rate)))
                subs.append(self.celt.encode_with_ec(sub, f20, nbytes))
                rng ^= self.celt.rng
            self.final_range = rng
            toc = pkt.gen_toc(CodecMode.CELT_ONLY, 50, self._effective_bw,
                              self.channels)
            out = pkt.build_packet(toc, subs, cbr=not self._vbr)
        if len(out) > max_bytes:
            raise OpusError.buffer_too_small()
        return out

    def _hp_process(self, frames: np.ndarray, celt_only: bool) -> np.ndarray:
        """Input HP front-end (opus_encoder.c:1795-1830): variable
        60-100 Hz high-pass for VOIP, 3 Hz DC rejection otherwise.
        The cutoff tracks the SILK pitch lag via variable_HP_smth1/2."""
        if celt_only or not getattr(self, "_silk", None):
            hp_smth1 = lin2log(60) << 8
        else:
            hp_smth1 = self._silk.ch.variable_HP_smth1_Q15
        self._variable_HP_smth2_Q15 = SMLAWB(
            self._variable_HP_smth2_Q15,
            hp_smth1 - self._variable_HP_smth2_Q15, 983)  # 0.015 in Q16
        cutoff_hz = log2lin(self._variable_HP_smth2_Q15 >> 8)
        if self.application == Application.VOIP:
            return hp_cutoff(frames, cutoff_hz, self._hp_mem,
                             self.sample_rate)
        return dc_reject(frames, 3, self._hp_mem, self.sample_rate)

    # -- SILK mode (opus_encoder.c:1329-1396 mode decision, simplified;
    # silk-only for mono voice at NB/MB/WB rates) -------------------------

    def _use_silk_mode(self, qms: int, bps: int) -> bool:
        if self.application != Application.VOIP:
            return False
        if qms not in (40, 80, 160, 240):   # 10/20/40/60 ms
            return False
        if bps <= 0:
            bps = self._auto_bitrate()
        # mode_thresholds (opus_encoder.c:174-178): voice stays in
        # SILK/hybrid up to ~64 kb/s mono / ~96 kb/s stereo
        if bps >= 64000 * self.channels or self._signal == Signal.MUSIC:
            return False
        if self.channels == 1 and self._use_hybrid(qms, bps):
            return True
        if bps >= 32000 * self.channels:
            return False
        if int(self._effective_bw) > int(Bandwidth.WIDEBAND) and \
                self._bandwidth != Bandwidth.AUTO:
            return False
        return True

    def _use_hybrid(self, qms: int, bps: int) -> bool:
        """Hybrid (SILK WB + CELT >=band 17) for SWB/FB voice at 10/20ms
        (opus_encoder.c bandwidth thresholds, coarse)."""
        if qms not in (40, 80):
            return False
        if self.sample_rate < 24000:
            return False
        if self._bandwidth != Bandwidth.AUTO:
            if int(self._effective_bw) < int(Bandwidth.SUPERWIDEBAND):
                return False
            return bps >= 18000
        return 20000 <= bps < 64000

    def _silk_internal_rate(self, bps: int) -> int:
        """Bandwidth selection (opus_encoder.c:145-168 thresholds,
        simplified to the coarse table)."""
        bw = self._effective_bw
        if self._bandwidth == Bandwidth.AUTO:
            if bps < 10000:
                bw = Bandwidth.NARROWBAND
            elif bps < 14000:
                bw = Bandwidth.MEDIUMBAND
            else:
                bw = Bandwidth.WIDEBAND
        bw = Bandwidth(min(int(bw), int(Bandwidth.WIDEBAND)))
        return {Bandwidth.NARROWBAND: 8000,
                Bandwidth.MEDIUMBAND: 12000}.get(bw, 16000), bw

    @staticmethod
    def _silk_rate_for_hybrid(rate: int, bw: Bandwidth, frame20ms: bool,
                              vbr: bool, fec: bool) -> int:
        """compute_silk_rate_for_hybrid (opus_encoder.c:844-897), mono."""
        table = ((0, 0, 0, 0, 0),
                 (12000, 10000, 10000, 11000, 11000),
                 (16000, 13500, 13500, 15000, 15000),
                 (20000, 16000, 16000, 18000, 18000),
                 (24000, 18000, 18000, 21000, 21000),
                 (32000, 22000, 22000, 28000, 28000),
                 (64000, 38000, 38000, 50000, 50000))
        entry = 1 + int(frame20ms) + 2 * int(fec)
        N = len(table)
        for i in range(1, N):
            if table[i][0] > rate:
                break
        else:
            i = N
        if i == N:
            silk_rate = table[N - 1][entry] + (rate - table[N - 1][0]) // 2
        else:
            lo, hi = table[i - 1][entry], table[i][entry]
            x0, x1 = table[i - 1][0], table[i][0]
            silk_rate = (lo * (x1 - rate) + hi * (rate - x0)) // (x1 - x0)
        if not vbr:
            silk_rate += 100
        if bw == Bandwidth.SUPERWIDEBAND:
            silk_rate += 300
        return silk_rate

    def _encode_hybrid(self, frames: np.ndarray, qms: int, bps: int,
                       max_bytes: int) -> bytes:
        """Hybrid frame: SILK (WB, 16 kHz internal) + CELT bands 17+
        sharing one range coder (opus_encoder.c:1878-2300)."""
        from .silk.encoder import EncControl, SilkEncoder
        if not hasattr(self, "_silk") or self._silk is None:
            self._silk = SilkEncoder()
        n = frames.shape[1]
        frame_ms = qms // 4
        bw = self._effective_bw if self._bandwidth != Bandwidth.AUTO \
            else (Bandwidth.FULLBAND if bps >= 30000
                  else Bandwidth.SUPERWIDEBAND)
        bw = Bandwidth(max(int(bw), int(Bandwidth.SUPERWIDEBAND)))
        fec = self._inband_fec and self._packet_loss_perc > 0
        silk_rate = self._silk_rate_for_hybrid(bps, bw, frame_ms == 20,
                                               self._vbr, fec)
        nbytes = min(max_bytes - 1, MAX_FRAME_BYTES)
        max_bits = nbytes * 8
        if self._vbr:
            max_silk_rate = self._silk_rate_for_hybrid(
                max_bits * 1000 // frame_ms, bw, frame_ms == 20,
                self._vbr, fec)
            silk_max_bits = max_silk_rate * frame_ms // 1000
        else:
            other = max(0, max_bits - silk_rate * frame_ms // 1000)
            silk_max_bits = max(0, max_bits - other * 3 // 4)
        ctl = EncControl(
            API_sampleRate=self.sample_rate, payloadSize_ms=frame_ms,
            bitRate=silk_rate,
            packetLossPercentage=self._packet_loss_perc,
            complexity=self._complexity, useInBandFEC=self._inband_fec,
            LBRR_coded=fec, useDTX=False, useCBR=False,
            desiredInternalSampleRate=16000, maxBits=silk_max_bits)
        enc = RangeEncoder(nbytes)
        pcm = np.clip(frames[0] * 32768.0, -32768, 32767) \
            if self.channels == 1 else np.clip(
                frames.mean(axis=0) * 32768.0, -32768, 32767)
        self._silk.encode(ctl, pcm, enc, nbytes)
        # redundancy flag (opus_encoder.c:2168-2173): none in round 1
        if enc.tell() + 17 + 20 <= max_bits:
            enc.enc_bit_logp(0, 12)
        # CELT half: bands 17+ (opus_encoder.c:2253-2264)
        celt = self.celt
        old = (celt.start, celt.end, celt.vbr, celt.constrained_vbr,
               celt.bitrate)
        try:
            celt.start = 17
            celt.end = 21 if bw == Bandwidth.FULLBAND else 19
            celt.vbr = self._vbr
            celt.constrained_vbr = False
            celt.bitrate = max(bps - silk_rate, 4000)
            celt.encode_with_ec(frames, n, nbytes, enc=enc)
        finally:
            (celt.start, celt.end, celt.vbr, celt.constrained_vbr,
             celt.bitrate) = old
        self.final_range = enc.rng & 0xFFFFFFFF
        framerate = 4000 // qms
        toc = pkt.gen_toc(CodecMode.HYBRID, framerate, bw, self.channels)
        out_bytes = (enc.tell() + 7) // 8
        out = bytes([toc]) + enc.data()[:out_bytes]
        if len(out) > max_bytes:
            raise OpusError.buffer_too_small()
        self._in_dtx = False
        return out

    def _encode_silk(self, frames: np.ndarray, qms: int, bps: int,
                     max_bytes: int) -> bytes:
        from .silk.encoder import EncControl, SilkEncoder
        if not hasattr(self, "_silk") or self._silk is None:
            self._silk = SilkEncoder()
        if bps <= 0:
            bps = self._auto_bitrate()
        if self.channels == 1 and self._use_hybrid(qms, bps):
            return self._encode_hybrid(frames, qms, bps, max_bytes)
        internal_hz, bw = self._silk_internal_rate(bps)
        frame_ms = qms // 4
        ctl = EncControl(
            API_sampleRate=self.sample_rate, payloadSize_ms=frame_ms,
            bitRate=min(bps, 40000),
            packetLossPercentage=self._packet_loss_perc,
            complexity=self._complexity,
            useInBandFEC=self._inband_fec,
            LBRR_coded=self._inband_fec and self._packet_loss_perc > 0,
            useDTX=self._dtx, useCBR=not self._vbr,
            desiredInternalSampleRate=internal_hz,
            maxBits=min(max_bytes - 1, MAX_FRAME_BYTES) * 8)
        enc = RangeEncoder(min(max_bytes - 1, MAX_FRAME_BYTES))
        if self.channels == 2:
            pcm = np.clip(frames.T * 32768.0, -32768, 32767)
        else:
            pcm = np.clip(frames[0] * 32768.0, -32768, 32767)
        bits = self._silk.encode(ctl, pcm, enc, max_bytes - 1,
                                 n_channels=self.channels)
        framerate = 4000 // qms      # 100/50/25/16 for 10-60 ms
        toc = pkt.gen_toc(CodecMode.SILK_ONLY, framerate, bw,
                          self.channels)
        self._in_dtx = bits == 0
        if bits == 0:
            self.final_range = 0
            return bytes([toc])    # DTX: TOC-only packet
        enc.done()
        self.final_range = enc.rng & 0xFFFFFFFF
        nbytes = (enc.tell() + 7) // 8
        out = bytes([toc]) + enc.data()[:nbytes]
        if len(out) > max_bytes:
            raise OpusError.buffer_too_small()
        return out

    def encode(self, pcm_i16: np.ndarray, max_bytes: int = 4000) -> bytes:
        """i16 input API (encoder.rs:80-126 validation semantics)."""
        pcm_i16 = np.asarray(pcm_i16)
        return self.encode_float(pcm_i16.astype(np.float64) / 32768.0,
                                 max_bytes)

    def encode_limited(self, pcm_i16: np.ndarray, max_bytes: int) -> bytes:
        return self.encode(pcm_i16, max_bytes)

    # -- CTLs (encoder.rs:249-698) ----------------------------------------

    def set_bitrate(self, bitrate):
        self._bitrate = bitrate
        self._apply_settings()

    def bitrate(self) -> int:
        return self._bitrate_bps()

    def set_vbr(self, vbr: bool):
        self._vbr = bool(vbr)
        self._apply_settings()

    def vbr(self) -> bool:
        return self._vbr

    def set_vbr_constraint(self, c: bool):
        self._vbr_constraint = bool(c)
        self._apply_settings()

    def vbr_constraint(self) -> bool:
        return self._vbr_constraint

    def set_complexity(self, c: int):
        if not 0 <= c <= 10:
            raise OpusError.bad_arg("complexity 0..=10")
        self._complexity = c
        self._apply_settings()

    def complexity(self) -> int:
        return self._complexity

    def set_max_bandwidth(self, bw: Bandwidth):
        self._max_bandwidth = Bandwidth(bw)
        self._apply_settings()

    def max_bandwidth(self) -> Bandwidth:
        return self._max_bandwidth

    def set_bandwidth(self, bw: Bandwidth):
        self._bandwidth = Bandwidth(bw)
        self._apply_settings()

    def bandwidth(self) -> Bandwidth:
        return self._effective_bw

    def set_signal(self, s: Signal):
        self._signal = Signal(s)

    def signal(self) -> Signal:
        return self._signal

    def set_inband_fec(self, fec: bool):
        self._inband_fec = bool(fec)

    def inband_fec(self) -> bool:
        return self._inband_fec

    def set_packet_loss_perc(self, p: int):
        if not 0 <= p <= 100:
            raise OpusError.bad_arg("loss perc 0..=100")
        self._packet_loss_perc = p
        self._apply_settings()

    def packet_loss_perc(self) -> int:
        return self._packet_loss_perc

    def set_dtx(self, dtx: bool):
        self._dtx = bool(dtx)

    def dtx(self) -> bool:
        return self._dtx

    def in_dtx(self) -> bool:
        return self._in_dtx

    def set_lsb_depth(self, depth: int):
        if not 8 <= depth <= 24:
            raise OpusError.bad_arg("lsb depth 8..=24")
        self._lsb_depth = depth
        self._apply_settings()

    def lsb_depth(self) -> int:
        return self._lsb_depth

    def set_force_channels(self, ch: Optional[int]):
        if ch is not None and ch not in (1, 2):
            raise OpusError.bad_arg()
        self._force_channels = ch

    def force_channels(self) -> Optional[int]:
        return self._force_channels

    def set_prediction_disabled(self, d: bool):
        self._prediction_disabled = bool(d)
        self._apply_settings()

    def prediction_disabled(self) -> bool:
        return self._prediction_disabled

    def set_phase_inversion_disabled(self, d: bool):
        self._phase_inversion_disabled = bool(d)
        self.celt.disable_inv = bool(d) or self.channels == 1

    def phase_inversion_disabled(self) -> bool:
        return self._phase_inversion_disabled

    def lookahead(self) -> int:
        # restricted-lowdelay lookahead: overlap only (Fs/400)
        return self.sample_rate // 400

    def get_final_range(self) -> int:
        return self.final_range

    def reset(self):
        self.celt = CeltEncoder(self.sample_rate, self.channels)
        self._apply_settings()


class Decoder:
    """Opus decoder (decoder.rs:35-385 surface)."""

    def __init__(self, sample_rate: int, channels: int):
        self._dec = OpusDecoder(sample_rate, channels)
        self.sample_rate = sample_rate
        self.channels = channels
        self._complexity = 0
        self._deep_plc = None        # dnn.DeepPLC when a blob is loaded
        self._dred_dec = None        # opus.dred_api.DredDecoder
        self._dred_duration_ms = 0
        self._up16 = None            # 16 kHz <-> Fs resamplers
        self._down16 = None

    def decode(self, data: Optional[bytes], frame_size: int,
               fec: bool = False) -> np.ndarray:
        """Empty/None input => PLC (decoder.rs:75-124). Returns int16
        [N, channels]."""
        if data is not None and len(data) == 0:
            data = None
        if data is None and self._use_deep_plc(frame_size):
            out = self._deep_conceal(frame_size)
            return np.clip(np.floor(0.5 + 32768.0 * out), -32768,
                           32767).astype(np.int16)
        out = self._dec.decode(data, frame_size, fec)
        self._deep_update(out.astype(np.float32) / 32768.0)
        return out

    def decode_float(self, data: Optional[bytes], frame_size: int,
                     fec: bool = False) -> np.ndarray:
        if data is not None and len(data) == 0:
            data = None
        if data is None and self._use_deep_plc(frame_size):
            return self._deep_conceal(frame_size)
        out = self._dec.decode_float(data, frame_size, fec)
        self._deep_update(out)
        return out

    # -- deep PLC / DRED (decoder.rs:348-385; opus_decoder.c:417-427,
    # 670-711, 1460-1507) ------------------------------------------------

    def set_complexity(self, c: int):
        """Decoder complexity: >=5 enables deep PLC when a DNN blob is
        loaded (opus_decoder.c:417-427)."""
        if not 0 <= c <= 10:
            raise OpusError.bad_arg("complexity out of range")
        self._complexity = c

    def complexity(self) -> int:
        return self._complexity

    def set_dnn_blob(self, blob: bytes):
        """Load PLC/FARGAN (+ RDO-VAE decoder when present) weights
        (decoder.rs:368-385 set_dnn_blob; opus_decoder.c:1050-1062)."""
        from .dnn import DeepPLC
        self._deep_plc = DeepPLC.from_blob(blob)
        try:
            from .opus.dred_api import DredDecoder
            self._dred_dec = DredDecoder.from_blob(blob)
        except KeyError:
            self._dred_dec = None   # blob has no RDO-VAE decoder
        from .silk.resampler import Resampler
        if self.sample_rate != 16000:
            self._up16 = Resampler(16000, self.sample_rate)
            self._down16 = Resampler(self.sample_rate, 16000,
                                     for_enc=True)

    def set_dred_duration(self, ms: int):
        """decoder.rs:348-366: how much DRED to request on parse."""
        if not 0 <= ms <= 104 * 10:
            raise OpusError.bad_arg("DRED duration out of range")
        self._dred_duration_ms = ms

    def dred_duration(self) -> int:
        return self._dred_duration_ms

    def dred_parse(self, data: bytes, defer_processing: bool = False):
        """opus_dred_parse convenience on this decoder's DRED decoder.
        Returns (dred, nb_samples_at_Fs, dred_end)."""
        if self._dred_dec is None:
            raise OpusError(ErrorCode.UNIMPLEMENTED, "no DNN blob loaded")
        max_samples = (self._dred_duration_ms * self.sample_rate // 1000
                       or 48000)
        return self._dred_dec.parse(data, max_samples, self.sample_rate,
                                    defer_processing)

    def dred_decode_float(self, dred, dred_offset: int,
                          frame_size: int) -> np.ndarray:
        """opus_decoder_dred_decode_float (opus_decoder.c:1494-1507):
        synthesise ``frame_size`` samples from DRED features via the
        deep-PLC vocoder.  ``dred_offset`` is in samples at Fs, counted
        back from the end of the lost region (decoder.rs:109-224)."""
        if self._deep_plc is None:
            raise OpusError(ErrorCode.UNIMPLEMENTED, "no DNN blob loaded")
        if frame_size <= 0 or frame_size % (self.sample_rate // 100):
            raise OpusError.bad_arg("frame size not a 10 ms multiple")
        if dred.process_stage != 2:
            self._dred_dec.process(dred)
        plc = self._deep_plc
        F10 = self.sample_rate // 100
        plc.fec_clear()
        init_frames = 2 if plc.blend == 0 else 0
        features_per_frame = max(1, frame_size // F10)
        needed = init_frames + features_per_frame
        for i in range(needed):
            # opus_decode_native:700-707 feature scheduling
            off = init_frames - i - 2 + int(np.floor(
                (dred_offset + dred.dred_offset * F10 / 4) / F10))
            if 0 <= off <= 4 * dred.nb_latents - 1:
                plc.fec_add(dred.features[off])
            elif off >= 0:
                plc.fec_add(None)
        return self._deep_conceal(frame_size)

    def dred_decode(self, dred, dred_offset: int,
                    frame_size: int) -> np.ndarray:
        out = self.dred_decode_float(dred, dred_offset, frame_size)
        return np.clip(np.floor(0.5 + 32768.0 * out), -32768,
                       32767).astype(np.int16)

    def _use_deep_plc(self, frame_size: int) -> bool:
        return (self._deep_plc is not None and self._complexity >= 5
                and frame_size % (self.sample_rate // 100) == 0)

    def _deep_update(self, pcm: np.ndarray):
        """Feed good decoded audio (mono-downmixed, 16 kHz) to the PLC
        history, in 10 ms steps."""
        if self._deep_plc is None or self._complexity < 5:
            return
        mono = pcm.mean(axis=1) if pcm.ndim == 2 else pcm
        x16 = self._to16k(mono)
        for i in range(len(x16) // 160):
            self._deep_plc.update(x16[i * 160:(i + 1) * 160])

    def _deep_conceal(self, frame_size: int) -> np.ndarray:
        n10 = frame_size // (self.sample_rate // 100)
        out = np.empty((frame_size, self.channels), np.float32)
        for i in range(n10):
            x16 = self._deep_plc.conceal()
            x = self._from16k(x16)
            sl = slice(i * self.sample_rate // 100,
                       (i + 1) * self.sample_rate // 100)
            out[sl] = x[:, None]
        self._dec.prev_mode = 0      # next real frame handles transition
        return out

    def _to16k(self, x: np.ndarray) -> np.ndarray:
        if self.sample_rate == 16000:
            return np.asarray(x, np.float32)
        y = self._down16.process(
            np.clip(32768.0 * np.asarray(x), -32768, 32767).astype(
                np.int64))
        return np.asarray(y, np.float32) / 32768.0

    def _from16k(self, x16: np.ndarray) -> np.ndarray:
        if self.sample_rate == 16000:
            return np.asarray(x16, np.float32)
        y = self._up16.process(
            np.clip(32768.0 * np.asarray(x16), -32768, 32767).astype(
                np.int64))
        return np.asarray(y, np.float32) / 32768.0

    def packet_samples(self, data: bytes) -> int:
        return pkt.packet_nb_samples(data, self.sample_rate)

    @staticmethod
    def packet_bandwidth(data: bytes) -> Bandwidth:
        if not data:
            raise OpusError.bad_arg()
        return pkt.packet_bandwidth(data[0])

    @staticmethod
    def packet_channels(data: bytes) -> int:
        if not data:
            raise OpusError.bad_arg()
        return pkt.packet_nb_channels(data[0])

    def reset(self):
        self._dec.reset()

    def get_sample_rate(self) -> int:
        return self.sample_rate

    def get_pitch(self) -> int:
        return self._dec.get_pitch()

    def get_last_packet_duration(self) -> int:
        return self._dec.get_last_packet_duration()

    def get_final_range(self) -> int:
        return self._dec.get_final_range()

    def gain(self) -> int:
        return self._dec.decode_gain

    def set_gain(self, gain_q8: int):
        self._dec.set_gain(gain_q8)

    def set_phase_inversion_disabled(self, d: bool):
        self._dec.celt.disable_inv = bool(d) or self.channels == 1

    def phase_inversion_disabled(self) -> bool:
        return self._dec.celt.disable_inv and self.channels != 1


class Repacketizer:
    """Merge/split packets (repacketizer.rs:23-93, repacketizer.c)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._toc = 0
        self._framesize = 0
        self._frames: List[bytes] = []

    def cat(self, data: bytes):
        """repacketizer.c:62-100."""
        if len(data) < 1:
            raise OpusError.invalid_packet()
        if not self._frames:
            self._toc = data[0]
            self._framesize = pkt.samples_per_frame(data[0], 8000)
        elif (self._toc & 0xFC) != (data[0] & 0xFC):
            raise OpusError.invalid_packet("toc mismatch")
        nb = pkt.packet_nb_frames(data)
        if (nb + len(self._frames)) * self._framesize > 960:
            raise OpusError.invalid_packet("exceeds 120 ms")
        parsed = pkt.parse_packet(data)
        self._frames.extend(parsed.frames)

    def get_nb_frames(self) -> int:
        return len(self._frames)

    def out_range(self, begin: int, end: int, maxlen: int = 65535) -> bytes:
        if begin < 0 or begin >= end or end > len(self._frames):
            raise OpusError.bad_arg()
        out = pkt.build_packet(self._toc, self._frames[begin:end])
        if len(out) > maxlen:
            raise OpusError.buffer_too_small()
        return out

    def out(self, maxlen: int = 65535) -> bytes:
        return self.out_range(0, len(self._frames), maxlen)
