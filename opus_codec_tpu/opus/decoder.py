"""Opus top-level decoder: TOC-driven mode dispatch, SILK+CELT glue.

Behavioural parity: /root/reference/opus/src/opus_decoder.c
(opus_decode_frame :237, opus_decode_native :670, smooth_fade :205,
opus_pcm_soft_clip in opus.c). Float build semantics (celt_accum = 0).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from ..bitstream import packet as pkt
from ..bitstream.range_coder import RangeDecoder
from ..celt.decoder import CeltDecoder
from ..celt.modes import standard_mode
from ..errors import OpusError
from ..silk.decoder import DecControl, SilkDecoder
from ..types import Bandwidth, CodecMode

__all__ = ["OpusDecoder"]

_END_BAND = {int(Bandwidth.NARROWBAND): 13, int(Bandwidth.MEDIUMBAND): 17,
             int(Bandwidth.WIDEBAND): 17, int(Bandwidth.SUPERWIDEBAND): 19,
             int(Bandwidth.FULLBAND): 21}


def smooth_fade(in1, in2, overlap, channels, window, fs):
    """opus_decoder.c:205-222. in1/in2: [overlap*channels] flat float."""
    out = np.empty_like(in1)
    inc = 48000 // fs
    for c in range(channels):
        for i in range(overlap):
            w = window[i * inc] * window[i * inc]
            out[i * channels + c] = (w * in2[i * channels + c]
                                     + (1.0 - w) * in1[i * channels + c])
    return out


def pcm_soft_clip(x: np.ndarray, channels: int, declip_mem):
    """opus.c opus_pcm_soft_clip (float). x: [N, C] modified in place."""
    N = x.shape[0]
    if N * channels == 0:
        return
    for c in range(channels):
        a = declip_mem[c]
        # continue applying the previous frame's clipping correction
        for i in range(N):
            if x[i, c] * a >= 0:
                break
            x[i, c] = x[i, c] + a * x[i, c] * x[i, c]
        curr = 0
        x0 = x[0, c]
        while True:
            i = curr
            while i < N and abs(x[i, c]) <= 0.95:
                i += 1
            if i == N:
                a = 0.0
                break
            peak_pos = i
            start = end = i
            maxval = abs(x[i, c])
            while start > 0 and x[i, c] * x[start - 1, c] >= 0:
                start -= 1
            while end < N and x[i, c] * x[end, c] >= 0:
                if abs(x[end, c]) > maxval:
                    maxval = abs(x[end, c])
                    peak_pos = end
                end += 1
            special = (start == 0 and x[i, c] * x[0, c] >= 0)
            a = (maxval - 1) / (maxval * maxval)
            a += a * 2.4e-7
            if x[i, c] > 0:
                a = -a
            for j in range(start, end):
                x[j, c] = x[j, c] + a * x[j, c] * x[j, c]
            if special and peak_pos >= 2:
                offset = x0 - x[0, c]
                delta = offset / peak_pos
                for j in range(curr, peak_pos):
                    offset -= delta
                    x[j, c] += offset
                    x[j, c] = max(-1.0, min(1.0, x[j, c]))
            curr = end
            if curr == N:
                break
        declip_mem[c] = a


class OpusDecoder:
    """Mirror of OpusDecoder state + opus_decode API (src/decoder.rs
    surface)."""

    def __init__(self, fs: int = 48000, channels: int = 2):
        if fs not in (8000, 12000, 16000, 24000, 48000):
            raise OpusError.bad_arg("bad sample rate")
        if channels not in (1, 2):
            raise OpusError.bad_arg("bad channel count")
        self.Fs = fs
        self.channels = channels
        self.celt = CeltDecoder(fs, channels)
        self.silk = SilkDecoder()
        self.dec_control = DecControl(nChannelsAPI=channels,
                                      API_sampleRate=fs)
        self.decode_gain = 0
        self.complexity = 0
        self.stream_channels = channels
        self.bandwidth = 0
        self.mode = 0
        self.prev_mode = 0
        self.frame_size = fs // 400
        self.prev_redundancy = 0
        self.last_packet_duration = 0
        self.rangeFinal = 0
        self.softclip_mem = [0.0, 0.0]

    def reset(self):
        fs, ch = self.Fs, self.channels
        gain = self.decode_gain
        self.__init__(fs, ch)
        self.decode_gain = gain

    # -- opus_decode_frame (opus_decoder.c:237-667) -----------------------

    def _decode_frame(self, data: Optional[bytes], frame_size: int,
                      decode_fec: bool) -> np.ndarray:
        F20 = self.Fs // 50
        F10 = F20 >> 1
        F5 = F10 >> 1
        F2_5 = F5 >> 1
        if frame_size < F2_5:
            raise OpusError.buffer_too_small()
        frame_size = min(frame_size, self.Fs // 25 * 3)
        if data is not None and len(data) <= 1:
            data = None
            frame_size = min(frame_size, self.frame_size)
        if data is not None:
            audiosize = self.frame_size
            mode = self.mode
            bandwidth = self.bandwidth
            dec = RangeDecoder(data)
        else:
            audiosize = frame_size
            mode = CodecMode.CELT_ONLY if self.prev_redundancy \
                else self.prev_mode
            bandwidth = 0
            dec = None
            if mode == 0:
                return np.zeros((audiosize, self.channels))
            if audiosize > F20:
                out = []
                remaining = audiosize
                while remaining > 0:
                    part = self._decode_frame(None, min(remaining, F20),
                                              False)
                    out.append(part)
                    remaining -= part.shape[0]
                return np.concatenate(out, axis=0)
            elif audiosize < F20:
                if audiosize > F10:
                    audiosize = F10
                elif mode != CodecMode.SILK_ONLY and F5 < audiosize < F10:
                    audiosize = F5

        transition = 0
        pcm_transition = None
        if data is not None and self.prev_mode > 0 and (
                (mode == CodecMode.CELT_ONLY
                 and self.prev_mode != CodecMode.CELT_ONLY
                 and not self.prev_redundancy)
                or (mode != CodecMode.CELT_ONLY
                    and self.prev_mode == CodecMode.CELT_ONLY)):
            transition = 1
            if mode == CodecMode.CELT_ONLY:
                pcm_transition = self._decode_frame(None, min(F5, audiosize),
                                                    False)
        if audiosize > frame_size:
            raise OpusError.bad_arg("buffer too small for audiosize")
        frame_size = audiosize

        pcm_silk = None
        celt_ret_len = frame_size
        redundant_rng = 0
        length = len(data) if data is not None else 0

        # ---- SILK half ----
        if mode != CodecMode.CELT_ONLY:
            if self.prev_mode == CodecMode.CELT_ONLY:
                self.silk.reset()
            ctl = self.dec_control
            ctl.payloadSize_ms = max(10, 1000 * audiosize // self.Fs)
            if data is not None:
                ctl.nChannelsInternal = self.stream_channels
                if mode == CodecMode.SILK_ONLY:
                    if bandwidth == Bandwidth.NARROWBAND:
                        ctl.internalSampleRate = 8000
                    elif bandwidth == Bandwidth.MEDIUMBAND:
                        ctl.internalSampleRate = 12000
                    else:
                        ctl.internalSampleRate = 16000
                else:
                    ctl.internalSampleRate = 16000
            ctl.enable_deep_plc = 1 if self.complexity >= 5 else 0
            lost_flag = 1 if data is None else (2 if decode_fec else 0)
            decoded = []
            decoded_samples = 0
            while decoded_samples < frame_size:
                first = decoded_samples == 0
                samples = self.silk.decode(ctl, lost_flag, first, dec)
                n = len(samples) // ctl.nChannelsAPI
                decoded.append(samples)
                decoded_samples += n
            pcm_silk = np.concatenate(decoded)

        # ---- redundancy parse (opus_decoder.c:452-483) ----
        start_band = 0
        redundancy = 0
        redundancy_bytes = 0
        celt_to_silk = 0
        if not decode_fec and mode != CodecMode.CELT_ONLY and \
                data is not None and \
                dec.tell() + 17 + 20 * (mode == CodecMode.HYBRID) \
                <= 8 * length:
            if mode == CodecMode.HYBRID:
                redundancy = dec.dec_bit_logp(12)
            else:
                redundancy = 1
            if redundancy:
                celt_to_silk = dec.dec_bit_logp(1)
                redundancy_bytes = dec.dec_uint(256) + 2 \
                    if mode == CodecMode.HYBRID \
                    else length - ((dec.tell() + 7) >> 3)
                length -= redundancy_bytes
                if length * 8 < dec.tell():
                    length = 0
                    redundancy_bytes = 0
                    redundancy = 0
                dec.storage -= redundancy_bytes
        if mode != CodecMode.CELT_ONLY:
            start_band = 17
        if redundancy:
            transition = 0
        if transition and mode != CodecMode.CELT_ONLY:
            pcm_transition = self._decode_frame(None, min(F5, audiosize),
                                                False)

        if bandwidth:
            self.celt.end = _END_BAND[int(bandwidth)]
        self.celt.stream_channels = self.stream_channels

        window = standard_mode().window
        redundant_audio = None
        if redundancy and celt_to_silk:
            self.celt.start = 0
            redundant_audio = self.celt.decode_with_ec(
                data[length:length + redundancy_bytes], F5)
            redundant_rng = self.celt.rng
        self.celt.start = start_band

        # ---- CELT half ----
        if mode != CodecMode.SILK_ONLY:
            celt_frame_size = min(F20, frame_size)
            if mode != self.prev_mode and self.prev_mode > 0 and \
                    not self.prev_redundancy:
                self.celt.reset()
            cdata = None if decode_fec else \
                (data[:length] if data is not None else None)
            pcm = self.celt.decode_with_ec(cdata, celt_frame_size, dec).T
            if pcm.shape[0] < frame_size:
                pcm = np.concatenate(
                    [pcm, np.zeros((frame_size - pcm.shape[0],
                                    self.channels))])
        else:
            pcm = np.zeros((frame_size, self.channels))
            if self.prev_mode == CodecMode.HYBRID and not (
                    redundancy and celt_to_silk and self.prev_redundancy):
                self.celt.start = 0
                sil = self.celt.decode_with_ec(b"\xff\xff", F2_5).T
                pcm[:F2_5] = sil

        if mode != CodecMode.CELT_ONLY and pcm_silk is not None:
            silk2 = pcm_silk[:frame_size * self.channels].astype(
                np.float64).reshape(-1, self.channels) / 32768.0
            pcm[:silk2.shape[0]] += silk2

        # ---- redundancy crossfades ----
        if redundancy and not celt_to_silk:
            self.celt.reset()
            self.celt.start = 0
            redundant_audio = self.celt.decode_with_ec(
                data[length:length + redundancy_bytes], F5)
            redundant_rng = self.celt.rng
            ra = redundant_audio.T
            tail = pcm[frame_size - F2_5:frame_size].reshape(-1)
            mixed = smooth_fade(tail, ra[F2_5:F5].reshape(-1), F2_5,
                                self.channels, window, self.Fs)
            pcm[frame_size - F2_5:frame_size] = mixed.reshape(
                F2_5, self.channels)
        if redundancy and celt_to_silk and \
                (self.prev_mode != CodecMode.SILK_ONLY
                 or self.prev_redundancy):
            ra = redundant_audio.T
            pcm[:F2_5] = ra[:F2_5]
            mixed = smooth_fade(ra[F2_5:F5].reshape(-1),
                                pcm[F2_5:F5].reshape(-1), F2_5,
                                self.channels, window, self.Fs)
            pcm[F2_5:F5] = mixed.reshape(F2_5, self.channels)
        if transition and pcm_transition is not None:
            if audiosize >= F5:
                pcm[:F2_5] = pcm_transition[:F2_5]
                mixed = smooth_fade(
                    pcm_transition[F2_5:F5].reshape(-1),
                    pcm[F2_5:F5].reshape(-1), F2_5, self.channels, window,
                    self.Fs)
                pcm[F2_5:F5] = mixed.reshape(F2_5, self.channels)
            else:
                mixed = smooth_fade(pcm_transition[:F2_5].reshape(-1),
                                    pcm[:F2_5].reshape(-1), F2_5,
                                    self.channels, window, self.Fs)
                pcm[:F2_5] = mixed.reshape(F2_5, self.channels)

        if self.decode_gain:
            gain = math.exp(0.6931471805599453
                            * (6.48814081e-4 * self.decode_gain))
            pcm = np.clip(pcm * gain, -32768 / 32768.0, 32767 / 32768.0)

        if data is None or len(data) <= 1:
            self.rangeFinal = 0
        else:
            self.rangeFinal = dec.rng ^ redundant_rng
        self.prev_mode = mode
        self.prev_redundancy = 1 if (redundancy and not celt_to_silk) else 0
        return pcm[:audiosize]

    # -- opus_decode_native (opus_decoder.c:670-811) ----------------------

    def decode_float(self, data: Optional[bytes], frame_size: int,
                     decode_fec: bool = False,
                     soft_clip: bool = False) -> np.ndarray:
        """Returns [nb_samples, channels] float PCM in [-1, 1]."""
        if data is None or len(data) == 0:
            if frame_size % (self.Fs // 400) != 0:
                raise OpusError.bad_arg("PLC size must be multiple of 2.5ms")
            out = []
            count = 0
            while count < frame_size:
                part = self._decode_frame(None, frame_size - count, False)
                out.append(part)
                count += part.shape[0]
            pcm = np.concatenate(out, axis=0)
            self.last_packet_duration = pcm.shape[0]
            return pcm
        if decode_fec and frame_size % (self.Fs // 400) != 0:
            raise OpusError.bad_arg()

        packet_mode = pkt.packet_mode(data[0])
        packet_bandwidth = pkt.packet_bandwidth(data[0])
        packet_frame_size = pkt.samples_per_frame(data[0], self.Fs)
        packet_stream_channels = pkt.packet_nb_channels(data[0])
        parsed = pkt.parse_packet(data)
        frames = parsed.frames
        count = len(frames)

        if decode_fec:
            if frame_size < packet_frame_size or \
                    packet_mode == CodecMode.CELT_ONLY or \
                    self.mode == CodecMode.CELT_ONLY:
                return self.decode_float(None, frame_size, False)
            duration_copy = self.last_packet_duration
            parts = []
            if frame_size - packet_frame_size != 0:
                try:
                    plc = self.decode_float(None,
                                            frame_size - packet_frame_size,
                                            False)
                except OpusError:
                    self.last_packet_duration = duration_copy
                    raise
                parts.append(plc)
            self.mode = packet_mode
            self.bandwidth = packet_bandwidth
            self.frame_size = packet_frame_size
            self.stream_channels = packet_stream_channels
            fec = self._decode_frame(frames[0], packet_frame_size, True)
            parts.append(fec)
            pcm = np.concatenate(parts, axis=0)
            self.last_packet_duration = frame_size
            return pcm

        if count * packet_frame_size > frame_size:
            raise OpusError.buffer_too_small()
        self.mode = packet_mode
        self.bandwidth = packet_bandwidth
        self.frame_size = packet_frame_size
        self.stream_channels = packet_stream_channels

        out = []
        nb = 0
        for f in frames:
            part = self._decode_frame(f, frame_size - nb, False)
            out.append(part)
            nb += part.shape[0]
        pcm = np.concatenate(out, axis=0)
        self.last_packet_duration = nb
        if soft_clip:
            pcm_soft_clip(pcm, self.channels, self.softclip_mem)
        else:
            self.softclip_mem = [0.0, 0.0]
        return pcm

    def decode(self, data: Optional[bytes], frame_size: int,
               decode_fec: bool = False) -> np.ndarray:
        """int16 output API (FLOAT2INT16 with soft clip, decoder.rs:75)."""
        pcm = self.decode_float(data, frame_size, decode_fec,
                                soft_clip=True)
        return np.clip(np.round(pcm * 32768.0), -32768, 32767) \
            .astype(np.int16)

    # -- inspectors (decoder.rs surface) ----------------------------------

    def get_final_range(self) -> int:
        return self.rangeFinal

    def get_last_packet_duration(self) -> int:
        return self.last_packet_duration

    def get_pitch(self) -> int:
        if self.prev_mode == CodecMode.CELT_ONLY:
            return self.celt.postfilter_period
        return self.dec_control.prevPitchLag

    def get_bandwidth(self) -> int:
        return int(self.bandwidth)

    def set_gain(self, gain_q8: int):
        if not -32768 <= gain_q8 <= 32767:
            raise OpusError.bad_arg("gain out of range")
        self.decode_gain = gain_q8
