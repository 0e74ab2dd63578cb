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
from .types import (Application, Bandwidth, Bitrate, CodecMode,
                    ExpertFrameDuration, Signal)

__all__ = ["Encoder", "Decoder", "Repacketizer"]

_CELT_END_BAND = {int(Bandwidth.NARROWBAND): 13, int(Bandwidth.WIDEBAND): 17,
                  int(Bandwidth.MEDIUMBAND): 17,
                  int(Bandwidth.SUPERWIDEBAND): 19,
                  int(Bandwidth.FULLBAND): 21}

_MAX_BANDWIDTH = {8000: Bandwidth.NARROWBAND, 12000: Bandwidth.WIDEBAND,
                  16000: Bandwidth.WIDEBAND, 24000: Bandwidth.SUPERWIDEBAND,
                  48000: Bandwidth.FULLBAND}

# SILK/hybrid vs CELT rate thresholds [mono/stereo][voice/music]
# (opus_encoder.c:174-178)
_MODE_THRESHOLDS = ((64000, 10000), (44000, 10000))
_STEREO_VOICE_THRESHOLD = 19000       # opus_encoder.c:170-171
_STEREO_MUSIC_THRESHOLD = 17000
# (threshold, hysteresis) pairs NB<->MB, MB<->WB, WB<->SWB, SWB<->FB
# (opus_encoder.c:145-168; mono == stereo in the reference)
_BW_THRESH_VOICE = (9000, 700, 9000, 700, 13500, 1000, 14000, 2000)
_BW_THRESH_MUSIC = (9000, 700, 9000, 700, 11000, 1000, 12000, 2000)
_FEC_THRESHOLDS = (12000, 1000, 14000, 1000, 16000, 1000,
                   20000, 1000, 22000, 1000)   # opus_encoder.c:180-186
_DTX_ACTIVITY_THRESHOLD = 0.1         # silk/define.h:58
_NB_SPEECH_FRAMES_BEFORE_DTX = 10
_MAX_CONSECUTIVE_DTX = 20
_PSEUDO_SNR_THRESHOLD = 316.23        # opus_encoder.c:65


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
        self._variable_duration = ExpertFrameDuration.ARG
        self._in_dtx = False
        self.final_range = 0
        # input HP front-end state (opus_encoder.c:286, 1795-1830)
        self._hp_mem = np.zeros(4)
        self._variable_HP_smth2_Q15 = lin2log(60) << 8
        # analysis + decision state (opus_encoder.c:100-140)
        self._tonality = None
        self._width_state = np.zeros(5)   # XX XY YY smoothed max_follower
        self._prev_mode = 0
        self._auto_bandwidth = int(Bandwidth.FULLBAND)
        self._first = True
        self._voice_ratio = -1
        self._detected_bandwidth = 0
        self._stream_channels = channels
        self._peak_signal_energy = 0.0
        self._nb_no_activity_ms_q1 = 0
        self._silk_dtx_blocked = False
        self._silk = None
        # surround plumbing (set by MSEncoder): per-channel 21-band SMR
        self._energy_masking = None
        self._lfe = False
        self._prev_tail = None
        self._silk_prefill_pending = False
        # DRED (opus_encoder.c:120-140 state; driver dnn/dred_encoder.py)
        self._dred_duration = 0
        self._dred_encoder = None
        self._activity_mem = np.zeros(4 * 104, np.uint8)  # DRED_MAX_FRAMES
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
        sel = self._frame_size_select(n)
        if sel != n:
            return self._encode_split(frames, sel, max_bytes)
        qms = self._frame_ms_x4(n)
        bps = self._bitrate_bps()
        if bps <= 0:   # AUTO / MAX
            bps = self._auto_bitrate() if self._bitrate == Bitrate.AUTO \
                else max_bytes * 8 * self.sample_rate // n

        mode, bw, stream_ch, activity, dtx_usable, redundancy, \
            celt_to_silk, to_celt = \
            self._decide(frames, qms, bps, max_bytes)
        self._silk_dtx_blocked = dtx_usable   # opus_encoder.c:1324-1328
        self._stream_channels = stream_ch
        self.celt.stream_channels = stream_ch   # CELT_SET_CHANNELS
        self.celt.energy_mask = self._energy_masking
        self.celt.lfe = self._lfe

        # DRED rate planning (opus_encoder.c:1198-1201)
        dred_on = self._dred_duration > 0 and self._dred_encoder is not None
        dred_params = None
        if dred_on:
            from .dnn.dred_encoder import compute_dred_bitrate
            dred_bitrate, q0, dq, qmax, chunks = compute_dred_bitrate(
                bps, n, self.sample_rate, self._dred_duration,
                self._inband_fec, self._packet_loss_perc)
            dred_params = (q0, dq, qmax, chunks)
            bps = max(5000, bps - dred_bitrate)

        frames = self._hp_process(
            frames, celt_only=mode == CodecMode.CELT_ONLY)

        # DRED latents + activity history (opus_encoder.c:1849-1862)
        if dred_on:
            fr400 = n * 400 // self.sample_rate
            self._dred_encoder.compute_latents(
                frames.T if self.channels == 2 else frames[0], n, 0)
            self._activity_mem[fr400:] = self._activity_mem[:-fr400].copy()
            self._activity_mem[:fr400] = int(activity)
        elif self._dred_encoder is not None:
            self._dred_encoder.latents_buffer_fill = 0
            self._activity_mem[:] = 0

        if mode != CodecMode.CELT_ONLY \
                and getattr(self, "_silk_prefill_pending", False) \
                and self._prev_tail is not None:
            self._silk_prefill(qms, bps, bw)
        self._silk_prefill_pending = False

        red_bytes = 0
        if redundancy:
            red_bytes = self._compute_redundancy_bytes(
                max_bytes, bps, self.sample_rate // n, self.channels)
            if red_bytes == 0:
                redundancy = False
        red = (redundancy, celt_to_silk, red_bytes)

        if mode == CodecMode.CELT_ONLY:
            out = self._encode_celt_mode(frames, qms, bps, max_bytes, bw)
        elif mode == CodecMode.HYBRID:
            out = self._encode_hybrid(frames, qms, bps, max_bytes, bw,
                                      red)
        elif qms > 240:
            out = self._encode_silk_long(frames, qms, bps, max_bytes, bw,
                                         stream_ch, red, to_celt)
        else:
            out = self._encode_silk(frames, qms, bps, max_bytes, bw,
                                    stream_ch, red)
        self._prev_mode = int(CodecMode.CELT_ONLY) if to_celt \
            else int(mode)
        self._first = False
        # keep the last 10 ms for prefill on a future CELT->SILK switch
        tail = self.sample_rate // 100
        self._prev_tail = frames[:, -tail:].copy()

        # generalized (opus-level) DTX (opus_encoder.c:2363-2379)
        if self._dtx and dtx_usable and self._dtx_decision(activity, qms):
            self.final_range = 0
            self._in_dtx = True
            return out[:1]     # TOC-only packet
        if dred_on:
            out = self._attach_dred(out, max_bytes, dred_params)
        if len(out) > max_bytes:
            raise OpusError.buffer_too_small()
        return out

    def _frame_size_select(self, frame_size: int) -> int:
        """frame_size_select (opus_encoder.c:704-727): the internal frame
        duration chosen by OPUS_SET_EXPERT_FRAME_DURATION."""
        fs = self.sample_rate
        if frame_size < fs // 400:
            raise OpusError.bad_arg("frame too short")
        vd = self._variable_duration
        if vd == ExpertFrameDuration.ARG:
            new_size = frame_size
        else:
            idx = int(vd) - int(ExpertFrameDuration.MS2_5)
            if vd <= ExpertFrameDuration.MS40:
                new_size = (fs // 400) << idx
            else:                      # 60/80/100/120 ms
                new_size = (idx - 2) * fs // 50
        if new_size > frame_size:
            raise OpusError.bad_arg("expert duration exceeds input")
        if (400 * new_size != fs and 200 * new_size != fs
                and 100 * new_size != fs and 50 * new_size != fs
                and 25 * new_size != fs and 50 * new_size != 3 * fs
                and 50 * new_size != 4 * fs and 50 * new_size != 5 * fs
                and 50 * new_size != 6 * fs):
            raise OpusError.bad_arg("bad internal frame size")
        return new_size

    def _encode_split(self, frames: np.ndarray, sel: int,
                      max_bytes: int) -> bytes:
        """Encode the input as multiple ``sel``-sample frames merged
        into one packet (the repacketizer loop in the tail of
        opus_encode_native, opus_encoder.c:1555-1697)."""
        n = frames.shape[1]
        if n % sel:
            raise OpusError.bad_arg("input not a multiple of the "
                                    "expert frame duration")
        nb = n // sel
        if nb > 48:
            raise OpusError.bad_arg("more than 48 frames")
        per = min(MAX_FRAME_BYTES + 1, max(3, max_bytes // nb))
        rp = Repacketizer()
        for i in range(nb):
            chunk = frames[:, i * sel:(i + 1) * sel]
            rp.cat(self.encode_float(chunk, per))
        out = rp.out(max_bytes)
        return out

    def _attach_dred(self, out: bytes, max_bytes: int,
                     params) -> bytes:
        """Write the DRED payload into packet-extension padding
        (opus_encoder.c:2405-2448)."""
        from .dnn.dred_encoder import (DRED_EXPERIMENTAL_BYTES,
                                       DRED_EXPERIMENTAL_VERSION,
                                       DRED_EXTENSION_ID,
                                       DRED_MAX_DATA_SIZE, DRED_MIN_BYTES,
                                       DRED_NUM_REDUNDANCY_FRAMES)
        from .opus.extensions import ExtensionData, extensions_generate
        q0, dq, qmax, target_chunks = params
        dred_chunks = min((self._dred_duration + 5) // 4,
                          DRED_NUM_REDUNDANCY_FRAMES // 2)
        if self._vbr:
            dred_chunks = min(dred_chunks, target_chunks)
        bytes_left = min(DRED_MAX_DATA_SIZE, max_bytes - len(out) - 3)
        bytes_left -= (bytes_left + 1 + DRED_EXPERIMENTAL_BYTES) // 255
        if dred_chunks < 1 \
                or bytes_left < DRED_MIN_BYTES + DRED_EXPERIMENTAL_BYTES:
            return out
        body = self._dred_encoder.encode_silk_frame(
            dred_chunks, bytes_left - DRED_EXPERIMENTAL_BYTES,
            q0, dq, qmax, self._activity_mem)
        if not body:
            return out
        payload = bytes([ord("D"), DRED_EXPERIMENTAL_VERSION]) + body
        ext = extensions_generate(
            [ExtensionData(DRED_EXTENSION_ID, 0, payload)],
            size=len(payload) + 2, pad=False)
        parsed = pkt.parse_packet(out)
        return pkt.build_packet(parsed.toc, parsed.frames,
                                padding_data=ext)

    def _encode_celt_mode(self, frames: np.ndarray, qms: int, bps: int,
                          max_bytes: int, bw: Bandwidth) -> bytes:
        """CELT-only packets, single or multi-frame (code 3)."""
        n = frames.shape[1]
        f20 = self.sample_rate // 50
        old_end = self.celt.end
        self.celt.end = _CELT_END_BAND[int(bw)]
        switched = self._celt_mode_switch_prefill(CodecMode.CELT_ONLY)
        try:
            if qms <= 80:  # single CELT frame (2.5..20 ms)
                framerate = 4000 // qms
                nbytes = min(max_bytes, MAX_FRAME_BYTES)
                if not self._vbr:
                    nbytes = min(nbytes,
                                 max(2, bps * n // (8 * self.sample_rate)))
                frame = self.celt.encode_with_ec(frames, n, nbytes)
                self.final_range = self.celt.rng
                toc = pkt.gen_toc(CodecMode.CELT_ONLY, framerate,
                                  bw, self._stream_channels)
                out = bytes([toc]) + frame
            else:  # multiframe packet of 20 ms CELT frames
                nb = qms // 80
                per_budget = max_bytes // nb
                subs = []
                for i in range(nb):
                    sub = frames[:, i * f20:(i + 1) * f20]
                    nbytes = min(per_budget, MAX_FRAME_BYTES)
                    if not self._vbr:
                        nbytes = min(nbytes, max(
                            2, bps * f20 // (8 * self.sample_rate)))
                    subs.append(self.celt.encode_with_ec(sub, f20, nbytes))
                # rangeFinal = last frame's rng (opus_encoder.c:2353)
                self.final_range = self.celt.rng
                toc = pkt.gen_toc(CodecMode.CELT_ONLY, 50, bw,
                                  self._stream_channels)
                out = pkt.build_packet(toc, subs, cbr=not self._vbr)
        finally:
            self.celt.end = old_end
            if switched:
                self.celt.disable_pf = self._prediction_disabled
                self.celt.force_intra = False
        if len(out) > max_bytes:
            raise OpusError.buffer_too_small()
        self._in_dtx = False
        return out

    def _celt_mode_switch_prefill(self, mode) -> bool:
        """On a non-redundant switch into a CELT-coded mode the reference
        resets the CELT encoder, prefills 2.5 ms from the buffered tail
        and disables prediction for the first frame
        (opus_encoder.c:2289-2297: OPUS_RESET_STATE + prefill +
        CELT_SET_PREDICTION(0) when mode != prev_mode && prev_mode > 0).
        Returns True when the switch handling was applied (caller must
        restore prediction CTLs afterwards)."""
        if self._prev_mode <= 0 or self._prev_mode == int(mode) \
                or self._prev_tail is None:
            return False
        n25 = self.sample_rate // 400
        self.celt.reset()
        self.celt.encode_with_ec(self._prev_tail[:, -n25:], n25, 2)
        self.celt.disable_pf = True      # CELT_SET_PREDICTION(0)
        self.celt.force_intra = True
        return True

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
            out = hp_cutoff(frames, cutoff_hz, self._hp_mem,
                            self.sample_rate)
        else:
            out = dc_reject(frames, 3, self._hp_mem, self.sample_rate)
        # NaN guard (opus_encoder.c:1832-1844)
        if not np.all(np.isfinite(out)):
            out = np.zeros_like(out)
            self._hp_mem[:] = 0
        return out

    # -- mode / bandwidth / channel decision (opus_encoder.c:1057-1553) ---

    @staticmethod
    def _equiv_rate(bitrate: int, channels: int, frame_rate: int,
                    vbr: bool, mode: int, complexity: int,
                    loss: int) -> int:
        """compute_equiv_rate (opus_encoder.c:898-930)."""
        equiv = bitrate
        if frame_rate > 50:
            equiv -= (40 * channels + 20) * (frame_rate - 50)
        if not vbr:
            equiv -= equiv // 12
        equiv = equiv * (90 + complexity) // 100
        if mode in (CodecMode.SILK_ONLY, CodecMode.HYBRID):
            if complexity < 2:
                equiv = equiv * 4 // 5
            equiv -= equiv * loss // (6 * loss + 10)
        elif mode == CodecMode.CELT_ONLY:
            if complexity < 5:
                equiv = equiv * 9 // 10
        else:
            equiv -= equiv * loss // (12 * loss + 20)
        return equiv

    def _stereo_width(self, frames: np.ndarray, n: int) -> float:
        """compute_stereo_width, float build (opus_encoder.c:729-808).
        State: [XX, XY, YY, smoothed_width, max_follower]."""
        m = self._width_state
        frame_rate = self.sample_rate // n
        short_alpha = 1.0 - 25.0 / max(50, frame_rate)
        n4 = (n - 3) // 4 * 4 + 4 if n >= 4 else 0
        x = frames[0, :n4]
        y = frames[1, :n4]
        xx, xy, yy = float(x @ x), float(x @ y), float(y @ y)
        if not (xx < 1e9 and yy < 1e9 and np.isfinite(xx)
                and np.isfinite(yy)):
            xx = xy = yy = 0.0
        m[0] += short_alpha * (xx - m[0])
        m[1] += short_alpha * (xy - m[1])
        m[2] += short_alpha * (yy - m[2])
        m[:3] = np.maximum(0.0, m[:3])
        if max(m[0], m[2]) > 8e-4:
            sqrt_xx, sqrt_yy = np.sqrt(m[0]), np.sqrt(m[2])
            qrrt_xx, qrrt_yy = np.sqrt(sqrt_xx), np.sqrt(sqrt_yy)
            m[1] = min(m[1], sqrt_xx * sqrt_yy)
            corr = m[1] / (1e-15 + sqrt_xx * sqrt_yy)
            ldiff = abs(qrrt_xx - qrrt_yy) / (1e-15 + qrrt_xx + qrrt_yy)
            width = np.sqrt(max(0.0, 1.0 - corr * corr)) * ldiff
            m[3] += (width - m[3]) / frame_rate
            m[4] = max(m[4] - 0.02 / frame_rate, m[3])
        return min(1.0, 20.0 * m[4])

    def _decide(self, frames: np.ndarray, qms: int, bps: int,
                max_bytes: int):
        """Analysis + voice_est + mode/channel/bandwidth decision
        (opus_encoder.c:1112-1553).  Returns (mode, bandwidth,
        stream_channels, activity, dtx_usable)."""
        n = frames.shape[1]
        frame_rate = self.sample_rate // n
        lsb_depth = min(self._lsb_depth, 24)
        is_silence = float(np.abs(frames).max(initial=0.0)) \
            <= 1.0 / (1 << lsb_depth)
        info = None
        if self._complexity >= 7 and self.sample_rate >= 16000:
            if self._tonality is None:
                from .opus.analysis import TonalityAnalysisState
                self._tonality = TonalityAnalysisState(self.sample_rate)
            info = self._tonality.run(frames, n, n, lsb_depth)
            if not is_silence and info.activity_probability \
                    > _DTX_ACTIVITY_THRESHOLD:
                self._peak_signal_energy = max(
                    0.999 * self._peak_signal_energy,
                    float((frames * frames).sum()) / (n * self.channels))
        elif self._tonality is not None:
            self._tonality.reset()
            self._tonality = None

        if not is_silence:
            self._voice_ratio = -1
        self._detected_bandwidth = 0
        if info is not None and info.valid:
            if self._signal == Signal.AUTO:
                if self._prev_mode == 0:
                    prob = info.music_prob
                elif self._prev_mode == CodecMode.CELT_ONLY:
                    prob = info.music_prob_max
                else:
                    prob = info.music_prob_min
                self._voice_ratio = int(np.floor(0.5 + 100 * (1 - prob)))
            ab = info.bandwidth
            self._detected_bandwidth = int(
                Bandwidth.NARROWBAND if ab <= 12 else
                Bandwidth.MEDIUMBAND if ab <= 14 else
                Bandwidth.WIDEBAND if ab <= 16 else
                Bandwidth.SUPERWIDEBAND if ab <= 18 else
                Bandwidth.FULLBAND)

        # voice_est (opus_encoder.c:1276-1289)
        if self._signal == Signal.VOICE:
            voice_est = 127
        elif self._signal == Signal.MUSIC:
            voice_est = 0
        elif self._voice_ratio >= 0:
            voice_est = self._voice_ratio * 327 >> 8
            if self.application == Application.AUDIO:
                voice_est = min(voice_est, 115)
        elif self.application == Application.VOIP:
            voice_est = 115
        else:
            voice_est = 48

        loss = self._packet_loss_perc
        equiv = self._equiv_rate(bps, self.channels, frame_rate,
                                 self._vbr, 0, self._complexity, loss)
        # mono/stereo decision (opus_encoder.c:1291-1316)
        if self._force_channels is not None and self.channels == 2:
            stream_channels = self._force_channels
        elif self.channels == 2:
            thr = _STEREO_MUSIC_THRESHOLD + (
                voice_est * voice_est
                * (_STEREO_VOICE_THRESHOLD - _STEREO_MUSIC_THRESHOLD) >> 14)
            thr += -1000 if self._stream_channels == 2 else 1000
            stream_channels = 2 if equiv > thr else 1
        else:
            stream_channels = self.channels
        equiv = self._equiv_rate(bps, stream_channels, frame_rate,
                                 self._vbr, 0, self._complexity, loss)

        dtx_usable = bool(info is not None and info.valid) or is_silence
        stereo_width = self._stereo_width(frames, n) \
            if self.channels == 2 and self._force_channels != 1 else 0.0

        # mode decision (opus_encoder.c:1330-1397)
        if self.application == Application.RESTRICTED_LOW_DELAY:
            mode = CodecMode.CELT_ONLY
        else:
            mode_voice = int((1 - stereo_width) * _MODE_THRESHOLDS[0][0]
                             + stereo_width * _MODE_THRESHOLDS[1][0])
            mode_music = _MODE_THRESHOLDS[1][1]
            threshold = mode_music + (
                voice_est * voice_est * (mode_voice - mode_music) >> 14)
            if self.application == Application.VOIP:
                threshold += 8000
            if self._prev_mode == CodecMode.CELT_ONLY:
                threshold -= 4000
            elif self._prev_mode > 0:
                threshold += 4000
            mode = CodecMode.CELT_ONLY if equiv >= threshold \
                else CodecMode.SILK_ONLY
            if self._inband_fec and loss > (128 - voice_est) >> 4:
                mode = CodecMode.SILK_ONLY
            if self._dtx and not dtx_usable and voice_est > 100:
                mode = CodecMode.SILK_ONLY
            if max_bytes < (9000 if frame_rate > 50 else 6000) * n \
                    // (self.sample_rate * 8):
                mode = CodecMode.CELT_ONLY
        if mode != CodecMode.CELT_ONLY and qms < 40:
            mode = CodecMode.CELT_ONLY      # <10 ms needs CELT
        if self._lfe:
            mode = CodecMode.CELT_ONLY      # opus_encoder.c:1395

        # mode-switch redundancy bookkeeping (opus_encoder.c:1398-1415)
        redundancy = False
        celt_to_silk = False
        to_celt = False
        if self._prev_mode > 0 and (
                (mode != CodecMode.CELT_ONLY
                 and self._prev_mode == int(CodecMode.CELT_ONLY))
                or (mode == CodecMode.CELT_ONLY
                    and self._prev_mode != int(CodecMode.CELT_ONLY))):
            redundancy = True
            celt_to_silk = mode != CodecMode.CELT_ONLY
            if not celt_to_silk and redundancy:
                if qms >= 40:   # >=10 ms: delay switch, send redundancy
                    mode = CodecMode(self._prev_mode)
                    to_celt = True
                else:
                    redundancy = False
        if qms > 80:            # multiframe packets carry no redundancy
            redundancy = False
            to_celt = False

        # CELT->SILK switch (opus_encoder.c:1433-1438): reinit SILK and
        # warm it with the previous frame's tail (prefill analogue)
        if self._prev_mode == CodecMode.CELT_ONLY \
                and mode != CodecMode.CELT_ONLY:
            self._silk = None    # fresh SILK state (silk_InitEncoder)
            self._silk_prefill_pending = True

        equiv = self._equiv_rate(bps, stream_channels, frame_rate,
                                 self._vbr, mode, self._complexity, loss)

        # automatic bandwidth selection is only re-evaluated when SILK
        # allows a bandwidth switch — i.e. during speech inactivity —
        # or in CELT mode / on the first frame (opus_encoder.c:1441)
        silk_allows = self._silk is None \
            or bool(getattr(self._silk, "allowBandwidthSwitch", 0))
        if mode == CodecMode.CELT_ONLY or self._first or silk_allows:
            thr_v, thr_m = _BW_THRESH_VOICE, _BW_THRESH_MUSIC
            ths = [thr_m[i] + (voice_est * voice_est
                               * (thr_v[i] - thr_m[i]) >> 14)
                   for i in range(8)]
            bandwidth = int(Bandwidth.FULLBAND)
            while bandwidth > int(Bandwidth.NARROWBAND):
                threshold = ths[2 * (bandwidth
                                     - int(Bandwidth.MEDIUMBAND))]
                hysteresis = ths[2 * (bandwidth
                                      - int(Bandwidth.MEDIUMBAND)) + 1]
                if not self._first:
                    if self._auto_bandwidth >= bandwidth:
                        threshold -= hysteresis
                    else:
                        threshold += hysteresis
                if equiv >= threshold:
                    break
                bandwidth -= 1
            if bandwidth == int(Bandwidth.MEDIUMBAND):
                bandwidth = int(Bandwidth.WIDEBAND)
            self._auto_bandwidth = bandwidth
        else:
            bandwidth = self._auto_bandwidth
        bandwidth = min(bandwidth, int(self._max_bandwidth))
        if self._bandwidth != Bandwidth.AUTO:
            bandwidth = int(self._bandwidth)
        max_rate = frame_rate * max_bytes * 8
        if mode != CodecMode.CELT_ONLY and max_rate < 15000:
            bandwidth = min(bandwidth, int(Bandwidth.WIDEBAND))
        # Nyquist caps (opus_encoder.c:1500-1507)
        fs = self.sample_rate
        if fs <= 24000:
            bandwidth = min(bandwidth, int(Bandwidth.SUPERWIDEBAND))
        if fs <= 16000:
            bandwidth = min(bandwidth, int(Bandwidth.WIDEBAND))
        if fs <= 12000:
            bandwidth = min(bandwidth, int(Bandwidth.MEDIUMBAND))
        if fs <= 8000:
            bandwidth = min(bandwidth, int(Bandwidth.NARROWBAND))
        # detected bandwidth reduction (opus_encoder.c:1508-1531)
        if self._detected_bandwidth and self._bandwidth == Bandwidth.AUTO:
            if equiv <= 18000 * stream_channels \
                    and mode == CodecMode.CELT_ONLY:
                min_det = int(Bandwidth.NARROWBAND)
            elif equiv <= 24000 * stream_channels \
                    and mode == CodecMode.CELT_ONLY:
                min_det = int(Bandwidth.MEDIUMBAND)
            elif equiv <= 30000 * stream_channels:
                min_det = int(Bandwidth.WIDEBAND)
            elif equiv <= 44000 * stream_channels:
                min_det = int(Bandwidth.SUPERWIDEBAND)
            else:
                min_det = int(Bandwidth.FULLBAND)
            bandwidth = min(bandwidth,
                            max(self._detected_bandwidth, min_det))
        if mode == CodecMode.CELT_ONLY \
                and bandwidth == int(Bandwidth.MEDIUMBAND):
            bandwidth = int(Bandwidth.WIDEBAND)
        if self._lfe:
            bandwidth = int(Bandwidth.NARROWBAND)   # opus_encoder.c:1540

        # in-band FEC decision, may reduce bandwidth to afford LBRR
        # (decide_fec, opus_encoder.c:811-842)
        bandwidth, lbrr = self._decide_fec(mode, bandwidth, equiv)
        self._lbrr_coded = lbrr

        # SILK <-> hybrid by bandwidth (opus_encoder.c:1544-1549)
        if mode == CodecMode.SILK_ONLY \
                and bandwidth > int(Bandwidth.WIDEBAND):
            mode = CodecMode.HYBRID
        if mode == CodecMode.HYBRID \
                and bandwidth <= int(Bandwidth.WIDEBAND):
            mode = CodecMode.SILK_ONLY
        if mode == CodecMode.HYBRID and self.channels == 2:
            mode = CodecMode.SILK_ONLY    # round-1: hybrid is mono-input
            bandwidth = min(bandwidth, int(Bandwidth.WIDEBAND))

        # activity for DTX (opus_encoder.c:1747-1761)
        activity = True
        if is_silence:
            activity = False
        elif info is not None and info.valid:
            activity = info.activity_probability \
                >= _DTX_ACTIVITY_THRESHOLD
            if not activity:
                noise_energy = float((frames * frames).sum()) \
                    / (n * self.channels)
                activity = self._peak_signal_energy \
                    < _PSEUDO_SNR_THRESHOLD * noise_energy
        return mode, Bandwidth(bandwidth), stream_channels, activity, \
            dtx_usable, redundancy, celt_to_silk, to_celt

    @staticmethod
    def _compute_redundancy_bytes(max_data_bytes: int, bitrate_bps: int,
                                  frame_rate: int, channels: int) -> int:
        """compute_redundancy_bytes (opus_encoder.c:1017-1043)."""
        base_bits = 40 * channels + 20
        red_rate = bitrate_bps + base_bits * (200 - frame_rate)
        red_rate = 3 * red_rate // 2
        red_bytes = red_rate // 1600
        available = max_data_bytes * 8 - 2 * base_bits
        cap = (available * 240 // (240 + 48000 // frame_rate)
               + base_bits) // 8
        red_bytes = min(red_bytes, cap)
        if red_bytes > 4 + 8 * channels:
            return min(257, red_bytes)
        return 0

    def _encode_redundant_celt(self, pcm: np.ndarray, nbytes: int,
                               bw: Bandwidth,
                               prefill: np.ndarray = None,
                               reset_first: bool = False,
                               reset_after: bool = True):
        """5 ms CELT redundant frame, start band 0, CBR at max rate
        (opus_encoder.c:2237-2253 and 2313-2341).  Returns (bytes, rng).

        For the CELT->SILK direction the reference resets the CELT state
        after the redundant frame (OPUS_RESET_STATE, opus_encoder.c:2252);
        for SILK->CELT (to_celt) it keeps the prefill+redundant-frame
        state so the next CELT-only frame continues from it — decoders
        likewise skip their reset after a packet that carried redundancy.
        """
        celt = self.celt
        saved = (celt.start, celt.end, celt.vbr, celt.constrained_vbr,
                 celt.bitrate, celt.disable_pf, celt.force_intra)
        try:
            if reset_first:
                celt.reset()
            celt.start = 0
            # end band follows the packet's TOC bandwidth — decoders
            # decode the redundant frame with CELT_SET_END_BAND(endband)
            # derived from the packet bandwidth (opus_decoder.c:446-453)
            celt.end = _CELT_END_BAND[int(bw)]
            celt.vbr = False
            celt.bitrate = -1
            if prefill is not None:
                celt.encode_with_ec(prefill, prefill.shape[1], 2)
                celt.disable_pf = True     # CELT_SET_PREDICTION(0)
                celt.force_intra = True
            frame = celt.encode_with_ec(pcm, pcm.shape[1], nbytes)
            rng = celt.rng
        finally:
            (celt.start, celt.end, celt.vbr, celt.constrained_vbr,
             celt.bitrate, celt.disable_pf, celt.force_intra) = saved
            if reset_after:
                celt.reset()
        return frame, rng

    def _new_silk(self):
        """Fresh SILK encoder, re-installing the batched-NSQ hook if a
        batch backend owns this stream (silk.batch_encoder)."""
        from .silk.encoder import SilkEncoder
        s = SilkEncoder()
        hook = getattr(self, "_nsq_hook", None)
        if hook is not None:
            s.ch.nsq_hook = hook
            s.ch2.nsq_hook = hook
            s.ch.nlsf_hook = hook.nlsf
            s.ch2.nlsf_hook = hook.nlsf
            s.ch.ltp_hook = hook.ltp
            s.ch2.ltp_hook = hook.ltp
        return s

    def _silk_prefill(self, qms: int, bps: int, bw: Bandwidth):
        """Warm a fresh SILK encoder with the previous frame's last
        10 ms (silk prefill analogue, opus_encoder.c:2013-2040) —
        output is discarded."""
        from .silk.encoder import EncControl, SilkEncoder
        self._silk = self._new_silk()
        bw = Bandwidth(min(int(bw), int(Bandwidth.WIDEBAND)))
        ctl = EncControl(
            API_sampleRate=self.sample_rate, payloadSize_ms=10,
            bitRate=min(bps, 40000), packetLossPercentage=0,
            complexity=self._complexity, useInBandFEC=False,
            LBRR_coded=False, useDTX=False, useCBR=False,
            desiredInternalSampleRate=self._SILK_INTERNAL_HZ.get(
                int(bw), 16000),
            maxBits=1275 * 8)
        enc = RangeEncoder(1275)
        pcm = self._prev_tail.mean(axis=0) if self.channels == 2 \
            else self._prev_tail[0]
        try:
            self._silk.encode(ctl, np.clip(pcm * 32768.0, -32768, 32767),
                              enc, 1275)
        except Exception:
            self._silk = self._new_silk()   # prefill is best-effort

    def _decide_fec(self, mode, bandwidth: int, rate: int):
        """decide_fec (opus_encoder.c:811-842): rate-gated LBRR with
        hysteresis; at >5% loss, reduce bandwidth until FEC fits."""
        loss = self._packet_loss_perc
        if not self._inband_fec or loss == 0 \
                or mode == CodecMode.CELT_ONLY:
            return bandwidth, 0
        orig = bandwidth
        last = getattr(self, "_last_fec", -1)
        while True:
            idx = 2 * (bandwidth - int(Bandwidth.NARROWBAND))
            thres = _FEC_THRESHOLDS[idx]
            hyst = _FEC_THRESHOLDS[idx + 1]
            if last == 1:
                thres -= hyst
            elif last == 0:
                thres += hyst
            thres = SMLAWB(0, thres * (125 - min(loss, 25)), 655)
            if rate > thres:
                self._last_fec = 1
                return bandwidth, 1
            if loss <= 5:
                self._last_fec = 0
                return bandwidth, 0
            if bandwidth > int(Bandwidth.NARROWBAND):
                bandwidth -= 1
            else:
                break
        self._last_fec = 0
        return orig, 0

    def _dtx_decision(self, activity: bool, qms: int) -> bool:
        """decide_dtx_mode (opus_encoder.c:988-1013)."""
        if activity:
            self._nb_no_activity_ms_q1 = 0
            return False
        self._nb_no_activity_ms_q1 += qms // 2
        if self._nb_no_activity_ms_q1 > _NB_SPEECH_FRAMES_BEFORE_DTX * 40:
            if self._nb_no_activity_ms_q1 <= (
                    _NB_SPEECH_FRAMES_BEFORE_DTX
                    + _MAX_CONSECUTIVE_DTX) * 40:
                return True
            self._nb_no_activity_ms_q1 = _NB_SPEECH_FRAMES_BEFORE_DTX * 40
        return False

    # -- SILK mode (opus_encoder.c:1329-1396 mode decision, simplified;
    # silk-only for mono voice at NB/MB/WB rates) -------------------------

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
                       max_bytes: int, bw: Bandwidth,
                       red=(False, False, 0)) -> bytes:
        """Hybrid: SILK (WB, 16 kHz internal) + CELT bands 17+ sharing
        one range coder (opus_encoder.c:1878-2300).  Frames >20 ms are
        split into 20 ms sub-frames and repacketized (code 3)."""
        if qms > 80:    # 40/60 ms: encode 20 ms hybrid frames
            f20 = self.sample_rate // 50
            nb = qms // 80
            subs = []
            per_budget = max_bytes // nb
            for i in range(nb):
                sub = self._encode_hybrid(frames[:, i * f20:(i + 1) * f20],
                                          80, bps, per_budget, bw)
                subs.append(sub[1:])     # strip per-frame TOC
            # rangeFinal = last frame's rng (opus_encoder.c:2353 per
            # frame; the decoder mirrors at opus_decoder.c:654)
            toc = pkt.gen_toc(CodecMode.HYBRID, 50, bw, 1)
            out = pkt.build_packet(toc, subs, cbr=not self._vbr)
            if len(out) > max_bytes:
                raise OpusError.buffer_too_small()
            return out
        from .silk.encoder import EncControl, SilkEncoder
        if self._silk is None:
            self._silk = self._new_silk()
        n = frames.shape[1]
        frame_ms = qms // 4
        bw = Bandwidth(max(int(bw), int(Bandwidth.SUPERWIDEBAND)))
        fec = bool(getattr(self, "_lbrr_coded", 0))
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
        # redundancy flag + length (opus_encoder.c:2167-2196)
        redundancy, celt_to_silk, red_bytes = red
        red_data = b""
        redundant_rng = 0
        if enc.tell() + 17 + 20 <= max_bits:
            enc.enc_bit_logp(1 if redundancy else 0, 12)
            if redundancy:
                enc.enc_bit_logp(1 if celt_to_silk else 0, 1)
                max_red = nbytes - ((enc.tell() + 8 + 3 + 7) >> 3)
                red_bytes = min(257, max(2, min(max_red, red_bytes)))
                enc.enc_uint(red_bytes - 2, 256)
        else:
            redundancy = False
        n5 = self.sample_rate // 200
        n25 = self.sample_rate // 400
        if redundancy and celt_to_silk:
            # CELT->SILK: redundant frame continues the old CELT state
            red_data, redundant_rng = self._encode_redundant_celt(
                frames[:, :n5], red_bytes, bw)
        # CELT half: bands 17+ (opus_encoder.c:2253-2264)
        celt = self.celt
        old = (celt.start, celt.end, celt.vbr, celt.constrained_vbr,
               celt.bitrate)
        switched = False
        try:
            celt.start = 17
            celt.end = 21 if bw == Bandwidth.FULLBAND else 19
            celt.vbr = self._vbr
            celt.constrained_vbr = False
            celt.bitrate = max(bps - silk_rate, 4000)
            switched = self._celt_mode_switch_prefill(CodecMode.HYBRID)
            celt.encode_with_ec(frames, n,
                                max(2, nbytes - (red_bytes
                                                 if redundancy else 0)),
                                enc=enc)
        finally:
            (celt.start, celt.end, celt.vbr, celt.constrained_vbr,
             celt.bitrate) = old
            if switched:
                celt.disable_pf = self._prediction_disabled
                celt.force_intra = False
        if redundancy and not celt_to_silk:
            # SILK->CELT: 2.5 ms prefill + 5 ms redundant frame; the
            # warmed CELT state carries into the next CELT-only frame
            red_data, redundant_rng = self._encode_redundant_celt(
                frames[:, -n5:], red_bytes, bw,
                prefill=frames[:, -(n5 + n25):-n5], reset_first=True,
                reset_after=False)
        self.final_range = (enc.rng ^ redundant_rng) & 0xFFFFFFFF
        framerate = 4000 // qms
        toc = pkt.gen_toc(CodecMode.HYBRID, framerate, bw, 1)
        # the main part is exactly the CELT-shrunk coder buffer — the
        # decoder recomputes the allocation from this byte count, and the
        # raw-bit tail is addressed from its end (opus_encoder.c:2345:
        # ret = nb_compr_bytes after celt's internal VBR shrink)
        out = bytes([toc]) + enc.data() + red_data
        if len(out) > max_bytes:
            raise OpusError.buffer_too_small()
        self._in_dtx = False
        return out

    _SILK_INTERNAL_HZ = {int(Bandwidth.NARROWBAND): 8000,
                         int(Bandwidth.MEDIUMBAND): 12000}

    def _silk_masking_rate_offset(self, silk_rate: int,
                                  bw: Bandwidth) -> int:
        """Surround masking rate reduction for the SILK layer
        (opus_encoder.c:1894-1933)."""
        if self._energy_masking is None or not self._vbr or self._lfe:
            return silk_rate
        end, srate = 17, 16000
        if bw == Bandwidth.NARROWBAND:
            end, srate = 13, 8000
        elif bw == Bandwidth.MEDIUMBAND:
            end, srate = 15, 12000
        em = np.asarray(self._energy_masking, np.float64).reshape(-1, 21)
        mask = np.clip(em[:self.channels, :end], -2.0, 0.5)
        mask = np.where(mask > 0, 0.5 * mask, mask)
        masking_depth = float(mask.sum()) / end * self.channels
        masking_depth += 0.2
        rate_offset = int(srate * masking_depth)
        rate_offset = max(rate_offset, -2 * silk_rate // 3)
        if bw in (Bandwidth.SUPERWIDEBAND, Bandwidth.FULLBAND):
            return silk_rate + 3 * rate_offset // 5
        return silk_rate + rate_offset

    def _encode_silk(self, frames: np.ndarray, qms: int, bps: int,
                     max_bytes: int, bw: Bandwidth,
                     stream_channels: int = None,
                     red=(False, False, 0)) -> bytes:
        from .silk.encoder import EncControl, SilkEncoder
        if self._silk is None:
            self._silk = self._new_silk()
        if stream_channels is None:
            stream_channels = self.channels
        celt_frames = frames    # full-width pcm for redundant CELT frames
        if self.channels == 2 and stream_channels == 1:
            # downmix decision from _decide; SILK's own toMono smoothing
            # is bypassed in favour of a direct mid downmix
            frames = frames.mean(axis=0, keepdims=True)
        bw = Bandwidth(min(int(bw), int(Bandwidth.WIDEBAND)))
        internal_hz = self._SILK_INTERNAL_HZ.get(int(bw), 16000)
        bps = self._silk_masking_rate_offset(bps, bw)
        frame_ms = qms // 4
        ctl = EncControl(
            API_sampleRate=self.sample_rate, payloadSize_ms=frame_ms,
            bitRate=min(bps, 40000),
            packetLossPercentage=self._packet_loss_perc,
            complexity=self._complexity,
            useInBandFEC=self._inband_fec,
            LBRR_coded=bool(getattr(self, "_lbrr_coded", 0)),
            useDTX=self._dtx and not self._silk_dtx_blocked,
            useCBR=not self._vbr,
            desiredInternalSampleRate=internal_hz,
            maxBits=min(max_bytes - 1, MAX_FRAME_BYTES) * 8)
        enc = RangeEncoder(min(max_bytes - 1, MAX_FRAME_BYTES))
        if stream_channels == 2:
            pcm = np.clip(frames.T * 32768.0, -32768, 32767)
        else:
            pcm = np.clip(frames[0] * 32768.0, -32768, 32767)
        bits = self._silk.encode(ctl, pcm, enc, max_bytes - 1,
                                 n_channels=stream_channels)
        # TOC signals SILK's ACTUAL internal rate — the bandwidth
        # transition can delay the switch (opus_encoder.c:2052-2060)
        bw = {8: Bandwidth.NARROWBAND, 12: Bandwidth.MEDIUMBAND,
              16: Bandwidth.WIDEBAND}.get(self._silk.ch.fs_kHz, bw)
        framerate = 4000 // qms      # 100/50/25/16 for 10-60 ms
        toc = pkt.gen_toc(CodecMode.SILK_ONLY, framerate, bw,
                          stream_channels)
        self._in_dtx = bits == 0
        if bits == 0:
            self.final_range = 0
            return bytes([toc])    # DTX: TOC-only packet
        # mode-switch redundancy (opus_encoder.c:2167-2200, 2236-2341):
        # in SILK-only mode the redundancy is inferred from the packet
        # length; only the celt_to_silk bit is range-coded
        redundancy, celt_to_silk, red_bytes = red
        red_data = b""
        redundant_rng = 0
        if redundancy and enc.tell() + 17 <= 8 * (max_bytes - 1):
            enc.enc_bit_logp(1 if celt_to_silk else 0, 1)
            max_red = (max_bytes - 1) - ((enc.tell() + 7) >> 3)
            red_bytes = min(257, max(2, min(max_red, red_bytes)))
            n5 = self.sample_rate // 200
            n25 = self.sample_rate // 400
            if celt_to_silk:
                red_data, redundant_rng = self._encode_redundant_celt(
                    celt_frames[:, :n5], red_bytes, bw)
            else:
                red_data, redundant_rng = self._encode_redundant_celt(
                    celt_frames[:, -n5:], red_bytes, bw,
                    prefill=celt_frames[:, -(n5 + n25):-n5],
                    reset_first=True, reset_after=False)
        enc.done()
        self.final_range = (enc.rng ^ redundant_rng) & 0xFFFFFFFF
        nbytes = (enc.tell() + 7) // 8
        out = bytes([toc]) + enc.data()[:nbytes] + red_data
        if len(out) > max_bytes:
            raise OpusError.buffer_too_small()
        return out

    def _encode_silk_long(self, frames: np.ndarray, qms: int, bps: int,
                          max_bytes: int, bw: Bandwidth, stream_ch: int,
                          red, to_celt: bool) -> bytes:
        """SILK-only frames beyond SILK's native 60 ms packet limit:
        80 ms -> 2x40, 120 ms -> 2x60, 100 ms -> 5x20, merged with the
        repacketizer (opus_encoder.c:1566-1578).  Redundancy rides the
        first sub-frame (celt_to_silk) or the last one (to_celt),
        mirroring the frame_redundancy gate in the reference loop."""
        sub = {320: 160, 400: 80, 480: 240}[qms]
        nbf = qms // sub
        nsub = frames.shape[1] // nbf
        redundancy, celt_to_silk, red_bytes = red
        max_header = 3 if nbf == 2 else 2 + (nbf - 1) * 2
        per = max(3, (max_bytes - max_header) // nbf)
        rp = Repacketizer()
        for i in range(nbf):
            fr = redundancy and (
                (to_celt and i == nbf - 1)
                or (not to_celt and celt_to_silk and i == 0))
            sub_red = (True, celt_to_silk, red_bytes) if fr \
                else (False, False, 0)
            rp.cat(self._encode_silk(frames[:, i * nsub:(i + 1) * nsub],
                                     sub, bps, per, bw, stream_ch,
                                     sub_red))
        return rp.out(max_bytes)

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

    def set_expert_frame_duration(self, dur):
        """OPUS_SET_EXPERT_FRAME_DURATION (encoder.rs:444-465)."""
        self._variable_duration = ExpertFrameDuration(dur)

    def expert_frame_duration(self) -> ExpertFrameDuration:
        return self._variable_duration

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

    def set_dred_duration(self, value: int):
        """OPUS_SET_DRED_DURATION (opus_encoder.c:2948-2957):
        redundancy depth in 10-ms frames, 0..104."""
        if not 0 <= value <= 104:
            raise OpusError.bad_arg("dred duration 0..=104")
        self._dred_duration = value

    def dred_duration(self) -> int:
        return self._dred_duration

    def set_dnn_blob(self, blob: bytes):
        """Load the DRED encoder model (dred_encoder_load_model)."""
        from .dnn.dred import RDOVAEEncoder
        from .dnn.dred_encoder import DredEncoder
        self._dred_encoder = DredEncoder(
            RDOVAEEncoder.from_blob(blob), self.sample_rate,
            self.channels)

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
