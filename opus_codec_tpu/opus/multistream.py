"""Multistream (surround) encoder/decoder.

Behavioural parity: /root/reference/opus/src/opus_multistream_decoder.c
(decode_native :178, channel routing via get_left/right_channel),
opus_multistream_encoder.c (self-delimited stream assembly :802; the
surround masking analysis is a quality refinement scheduled with the
encoder-analysis milestone), and the Rust surface src/multistream.rs
(Mapping validation :31-85, MSEncoder :108+, MSDecoder :657+).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..api import Decoder, Encoder
from ..bitstream import packet as pkt
from ..errors import OpusError
from ..types import Application, Bitrate

__all__ = ["Mapping", "MSEncoder", "MSDecoder", "default_surround_mapping",
           "surround_analysis"]


def _channel_pos(channels: int):
    """Mix position per channel: 0 none, 1 left, 2 centre, 3 right
    (opus_multistream_encoder.c:146-183)."""
    table = {4: [1, 3, 1, 3],
             3: [1, 2, 3],
             5: [1, 2, 3, 1, 3],
             6: [1, 2, 3, 1, 3, 0],
             7: [1, 2, 3, 1, 3, 2, 0],
             8: [1, 2, 3, 1, 3, 1, 3, 0]}
    pos = table.get(channels, [0] * channels)
    return pos + [0] * (channels - len(pos))


# 17 entries like the reference's diff_table[17]: only 9 initializers,
# C zero-fills the tail (diff in [4,8) lands there)
_LOGSUM_TAB = np.zeros(17)
_LOGSUM_TAB[:9] = [0.5000000, 0.2924813, 0.1609640, 0.0849625,
                   0.0437314, 0.0221971, 0.0111839, 0.0056136, 0.0028123]


def _log_sum(a, b):
    """log2(2^a + 2^b) approximation (opus_multistream_encoder.c:187)."""
    mx = max(a, b)
    diff = abs(a - b)
    if not diff < 8.0:
        return mx
    low = int(np.floor(2 * diff))
    frac = 2 * diff - low
    return mx + _LOGSUM_TAB[low] + frac * (_LOGSUM_TAB[low + 1]
                                           - _LOGSUM_TAB[low])


def surround_analysis(pcm: np.ndarray, mem: np.ndarray,
                      preemph_mem: np.ndarray) -> np.ndarray:
    """Per-channel 21-band signal-to-mask ratios for surround coding
    (opus_multistream_encoder.c:224-368; 48 kHz, float build).

    pcm: [N, channels] float in [-1, 1], N a multiple of 480.
    mem: [channels, 120] MDCT overlap state; preemph_mem: [channels].
    Returns bandSMR [channels, 21] in log2 units (dB/6.02).
    """
    from ..celt.bands import compute_band_energies
    from ..celt.energy import amp2_log2
    from ..celt.mdct import mdct_forward
    from ..celt.modes import standard_mode
    m = standard_mode()
    n, channels = pcm.shape
    overlap = len(m.window)
    freq_size = min(960, n)
    LM = 0
    while (120 << LM) != freq_size and LM < 3:
        LM += 1
    pos = _channel_pos(channels)
    maskLogE = np.full((3, 21), -28.0)
    bandLogE = np.zeros((channels, 21))
    coef = m.preemph
    for c in range(channels):
        x = pcm[:, c] * 32768.0           # CELT_SIG_SCALE
        # celt_preemphasis (celt_encoder.c:507, clip/upsample-free path)
        pre = x.copy()
        pre[1:] -= coef * x[:-1]
        pre[0] -= preemph_mem[c]
        preemph_mem[c] = coef * x[-1]
        buf = np.concatenate([mem[c], pre])
        s = float(buf @ buf)
        if not (s < 1e18) or not np.isfinite(s):
            buf[:] = 0.0
            preemph_mem[c] = 0.0
        bandE = np.full((1, 21), 1e-27)
        for frame in range(n // freq_size):
            block = buf[960 * frame:960 * frame + freq_size + overlap]
            freq = mdct_forward(block[None, :], m.window)
            e = compute_band_energies(m, freq, 21, LM)
            bandE = np.maximum(bandE, e)
        bandLogE[c] = amp2_log2(m, 21, 21, bandE)[0]
        # spreading: -6 dB/band up, -12 dB/band down
        for i in range(1, 21):
            bandLogE[c, i] = max(bandLogE[c, i], bandLogE[c, i - 1] - 1.0)
        for i in range(19, -1, -1):
            bandLogE[c, i] = max(bandLogE[c, i], bandLogE[c, i + 1] - 2.0)
        if pos[c] == 1:
            for i in range(21):
                maskLogE[0, i] = _log_sum(maskLogE[0, i], bandLogE[c, i])
        elif pos[c] == 3:
            for i in range(21):
                maskLogE[2, i] = _log_sum(maskLogE[2, i], bandLogE[c, i])
        elif pos[c] == 2:
            for i in range(21):
                maskLogE[0, i] = _log_sum(maskLogE[0, i],
                                          bandLogE[c, i] - 0.5)
                maskLogE[2, i] = _log_sum(maskLogE[2, i],
                                          bandLogE[c, i] - 0.5)
        mem[c] = buf[n:n + overlap]
    maskLogE[1] = np.minimum(maskLogE[0], maskLogE[2])
    channel_offset = 0.5 * np.log2(2.0 / (channels - 1))
    maskLogE += channel_offset
    bandSMR = np.zeros((channels, 21))
    for c in range(channels):
        if pos[c] != 0:
            bandSMR[c] = bandLogE[c] - maskLogE[pos[c] - 1]
    return bandSMR


@dataclass
class Mapping:
    """Channel layout (multistream.rs:31-85 validation)."""
    channels: int
    streams: int
    coupled_streams: int
    mapping: Sequence[int]

    def validate(self):
        if not 1 <= self.channels <= 255:
            raise OpusError.bad_arg("channels 1..=255")
        if not 1 <= self.streams <= 255:
            raise OpusError.bad_arg("streams 1..=255")
        if not 0 <= self.coupled_streams <= self.streams:
            raise OpusError.bad_arg("coupled > streams")
        if len(self.mapping) != self.channels:
            raise OpusError.bad_arg("mapping length != channels")
        n_inputs = self.streams + self.coupled_streams
        if n_inputs > 255:
            raise OpusError.bad_arg()
        counts = [0] * n_inputs
        for m in self.mapping:
            if m == 255:
                continue
            if not 0 <= m < n_inputs:
                raise OpusError.bad_arg(f"mapping entry {m} out of range")
            counts[m] += 1
        # every coded input channel must drive at least one output
        for i, c in enumerate(counts):
            if c == 0:
                raise OpusError.bad_arg(f"coded channel {i} unused")

    # channel-index helpers (opus_multistream.c get_left/right/mono)
    def left_channels(self, stream: int) -> List[int]:
        return [i for i, m in enumerate(self.mapping) if m == 2 * stream]

    def right_channels(self, stream: int) -> List[int]:
        return [i for i, m in enumerate(self.mapping) if m == 2 * stream + 1]

    def mono_channels(self, stream: int) -> List[int]:
        return [i for i, m in enumerate(self.mapping)
                if m == stream + self.coupled_streams]


def default_surround_mapping(channels: int) -> Mapping:
    """Vorbis-order surround layouts (opus_multistream_encoder.c surround
    init; family 1)."""
    layouts = {
        1: (1, 0, [0]),
        2: (1, 1, [0, 1]),
        3: (2, 1, [0, 2, 1]),
        4: (2, 2, [0, 1, 2, 3]),
        5: (3, 2, [0, 4, 1, 2, 3]),
        6: (4, 2, [0, 4, 1, 2, 3, 5]),
        7: (4, 3, [0, 6, 1, 2, 3, 4, 5]),
        8: (5, 3, [0, 6, 1, 2, 3, 4, 5, 7]),
    }
    if channels not in layouts:
        raise OpusError.bad_arg("surround layouts support 1..8 channels")
    s, c, m = layouts[channels]
    return Mapping(channels, s, c, m)


class MSEncoder:
    """Multistream encoder: per-stream Opus encoders + self-delimited
    packing."""

    def __init__(self, sample_rate: int, mapping: Mapping,
                 application: Application, surround: bool = False):
        mapping.validate()
        self.mapping = mapping
        self.sample_rate = sample_rate
        self.surround = surround and mapping.channels > 2
        self.lfe_stream = mapping.streams - 1 \
            if surround and mapping.channels >= 6 else -1
        self.encoders: List[Encoder] = []
        for s in range(mapping.streams):
            ch = 2 if s < mapping.coupled_streams else 1
            e = Encoder(sample_rate, ch, application)
            if s == self.lfe_stream:
                e._lfe = True
            self.encoders.append(e)
        self._bitrate = Bitrate.AUTO
        # surround_analysis state (opus_multistream_encoder.c:869)
        self._sa_mem = np.zeros((mapping.channels, 120))
        self._sa_preemph = np.zeros(mapping.channels)

    @classmethod
    def new_surround(cls, sample_rate: int, channels: int,
                     application: Application) -> "MSEncoder":
        return cls(sample_rate, default_surround_mapping(channels),
                   application, surround=True)

    def set_bitrate(self, bitrate):
        self._bitrate = bitrate

    def bitrate(self):
        return self._bitrate

    # ---- CTL surface (multistream.rs:232-483).  The reference's C
    # handler forwards setters to every stream encoder and answers
    # getters from the stream states (opus_multistream_encoder.c ctl
    # dispatcher); OPUS_GET_IN_DTX is the AND over streams.

    def _broadcast(self, name, *a):
        for e in self.encoders:
            getattr(e, name)(*a)

    def set_complexity(self, c: int):
        self._broadcast("set_complexity", c)

    def complexity(self) -> int:
        return self.encoders[0].complexity()

    def set_dtx(self, dtx: bool):
        self._broadcast("set_dtx", dtx)

    def dtx(self) -> bool:
        return self.encoders[0].dtx()

    def in_dtx(self) -> bool:
        return all(e.in_dtx() for e in self.encoders)

    def set_inband_fec(self, fec: bool):
        self._broadcast("set_inband_fec", fec)

    def inband_fec(self) -> bool:
        return self.encoders[0].inband_fec()

    def set_packet_loss_perc(self, p: int):
        self._broadcast("set_packet_loss_perc", p)

    def packet_loss_perc(self) -> int:
        return self.encoders[0].packet_loss_perc()

    def set_vbr(self, vbr: bool):
        self._broadcast("set_vbr", vbr)

    def vbr(self) -> bool:
        return self.encoders[0].vbr()

    def set_vbr_constraint(self, c: bool):
        self._broadcast("set_vbr_constraint", c)

    def vbr_constraint(self) -> bool:
        return self.encoders[0].vbr_constraint()

    def set_max_bandwidth(self, bw):
        self._broadcast("set_max_bandwidth", bw)

    def max_bandwidth(self):
        return self.encoders[0].max_bandwidth()

    def set_bandwidth(self, bw):
        self._broadcast("set_bandwidth", bw)

    def bandwidth(self):
        return self.encoders[0].bandwidth()

    def set_force_channels(self, ch):
        self._broadcast("set_force_channels", ch)

    def force_channels(self):
        return self.encoders[0].force_channels()

    def set_signal(self, s):
        self._broadcast("set_signal", s)

    def signal(self):
        return self.encoders[0].signal()

    def set_lsb_depth(self, depth: int):
        self._broadcast("set_lsb_depth", depth)

    def lsb_depth(self) -> int:
        return self.encoders[0].lsb_depth()

    def set_prediction_disabled(self, d: bool):
        self._broadcast("set_prediction_disabled", d)

    def prediction_disabled(self) -> bool:
        return self.encoders[0].prediction_disabled()

    def set_phase_inversion_disabled(self, d: bool):
        self._broadcast("set_phase_inversion_disabled", d)

    def phase_inversion_disabled(self) -> bool:
        return self.encoders[0].phase_inversion_disabled()

    def set_expert_frame_duration(self, dur):
        self._broadcast("set_expert_frame_duration", dur)

    def expert_frame_duration(self):
        return self.encoders[0].expert_frame_duration()

    def lookahead(self) -> int:
        return self.encoders[0].lookahead()

    def reset(self):
        """OPUS_RESET_STATE across every stream + analysis memories."""
        for e in self.encoders:
            e.reset()
        self._sa_mem[:] = 0.0
        self._sa_preemph[:] = 0.0

    def _rate_allocation(self, frame_size: int) -> List[int]:
        """surround_rate_allocation (opus_multistream_encoder.c:~700)."""
        m = self.mapping
        Fs = self.sample_rate
        nb_lfe = int(self.lfe_stream != -1)
        nb_coupled = m.coupled_streams
        nb_uncoupled = m.streams - nb_coupled - nb_lfe
        nb_normal = 2 * nb_coupled + nb_uncoupled
        channel_offset = 40 * max(50, Fs // frame_size)
        if self._bitrate == Bitrate.AUTO:
            bitrate = nb_normal * (channel_offset + Fs + 10000) \
                + 8000 * nb_lfe
        elif self._bitrate == Bitrate.MAX:
            bitrate = nb_normal * 300000 + nb_lfe * 128000
        else:
            bitrate = self._bitrate.bps \
                if isinstance(self._bitrate, Bitrate) \
                else int(self._bitrate)
        lfe_offset = min(bitrate // 20, 3000) \
            + 15 * max(50, Fs // frame_size)
        stream_offset = (bitrate - channel_offset * nb_normal
                         - lfe_offset * nb_lfe) // nb_normal // 2
        stream_offset = max(0, min(20000, stream_offset))
        coupled_ratio = 512        # Q8: stereo = 2x mono
        lfe_ratio = 32             # Q8: LFE = 1/8 mono
        total = (nb_uncoupled << 8) + coupled_ratio * nb_coupled \
            + nb_lfe * lfe_ratio
        channel_rate = 256 * (bitrate - lfe_offset * nb_lfe
                              - stream_offset * (nb_coupled + nb_uncoupled)
                              - channel_offset * nb_normal) // total
        rates = []
        for i in range(m.streams):
            if i < m.coupled_streams:
                r = 2 * channel_offset + max(
                    0, stream_offset + (channel_rate * coupled_ratio >> 8))
            elif i != self.lfe_stream:
                r = channel_offset + max(0, stream_offset + channel_rate)
            else:
                r = max(0, lfe_offset + (channel_rate * lfe_ratio >> 8))
            rates.append(max(500, r))
        return rates

    def encoder(self, stream: int) -> Encoder:
        """Per-stream CTL access (multistream.rs CTL forwarding)."""
        return self.encoders[stream]

    def encode_float(self, pcm: np.ndarray, max_bytes: int = 60000) -> bytes:
        """pcm: interleaved [N*channels] or [N, channels] float."""
        m = self.mapping
        if pcm.ndim == 1:
            if len(pcm) % m.channels:
                raise OpusError.bad_arg("pcm length % channels")
            pcm = pcm.reshape(-1, m.channels)
        if pcm.shape[1] != m.channels:
            raise OpusError.bad_arg("channel count mismatch")
        rates = self._rate_allocation(pcm.shape[0])
        band_smr = None
        if self.surround and self.sample_rate == 48000 \
                and pcm.shape[0] % 480 == 0:
            band_smr = surround_analysis(pcm, self._sa_mem,
                                         self._sa_preemph)
        subpackets = []
        for s in range(m.streams):
            enc = self.encoders[s]
            enc.set_bitrate(Bitrate(rates[s]))
            if s < m.coupled_streams:
                li = m.left_channels(s)
                ri = m.right_channels(s)
                left = pcm[:, li[0]] if li else np.zeros(pcm.shape[0])
                right = pcm[:, ri[0]] if ri else np.zeros(pcm.shape[0])
                sig = np.stack([left, right], axis=1).ravel()
                if band_smr is not None:
                    enc._energy_masking = np.concatenate(
                        [band_smr[li[0]] if li else np.zeros(21),
                         band_smr[ri[0]] if ri else np.zeros(21)])
            else:
                mi = m.mono_channels(s)
                sig = pcm[:, mi[0]] if mi else np.zeros(pcm.shape[0])
                if band_smr is not None and s != self.lfe_stream:
                    enc._energy_masking = band_smr[mi[0]] if mi \
                        else np.zeros(21)
            subpackets.append(enc.encode_float(sig, 1500))
        out = bytearray()
        for s, p in enumerate(subpackets):
            if s < m.streams - 1:
                out += pkt.build_self_delimited(p)
            else:
                out += p
        if len(out) > max_bytes:
            raise OpusError.buffer_too_small()
        return bytes(out)

    def encode(self, pcm_i16: np.ndarray, max_bytes: int = 60000) -> bytes:
        return self.encode_float(
            np.asarray(pcm_i16).astype(np.float64) / 32768.0, max_bytes)

    def get_final_range(self) -> int:
        r = 0
        for e in self.encoders:
            r ^= e.get_final_range()
        return r


class MSDecoder:
    """Multistream decoder (opus_multistream_decoder.c:178-280)."""

    def __init__(self, sample_rate: int, mapping: Mapping):
        mapping.validate()
        self.mapping = mapping
        self.sample_rate = sample_rate
        self.decoders: List[Decoder] = []
        for s in range(mapping.streams):
            ch = 2 if s < mapping.coupled_streams else 1
            self.decoders.append(Decoder(sample_rate, ch))

    @classmethod
    def new_surround(cls, sample_rate: int, channels: int) -> "MSDecoder":
        return cls(sample_rate, default_surround_mapping(channels))

    def decoder(self, stream: int) -> Decoder:
        return self.decoders[stream]

    def decode_float(self, data: Optional[bytes], frame_size: int,
                     decode_fec: bool = False) -> np.ndarray:
        """Returns [N, channels] float."""
        m = self.mapping
        frame_size = min(frame_size, self.sample_rate // 25 * 3)
        do_plc = data is None or len(data) == 0
        if not do_plc and len(data) < 2 * m.streams - 1:
            raise OpusError.invalid_packet("too short for stream count")
        out = None
        pos = 0
        n = None
        for s in range(m.streams):
            dec = self.decoders[s]
            if do_plc:
                part = dec.decode_float(None, frame_size, False)
            else:
                sub = data[pos:]
                if s != m.streams - 1:
                    parsed = pkt.parse_packet(sub, self_delimited=True)
                    consumed = parsed.packet_offset
                    rebuilt = pkt.build_packet(parsed.toc, parsed.frames)
                    part = dec.decode_float(rebuilt, frame_size, decode_fec)
                    pos += consumed
                else:
                    part = dec.decode_float(sub, frame_size, decode_fec)
            nf = part.shape[0]
            if out is None:
                n = nf
                out = np.zeros((n, m.channels))
            frame_size = nf
            if s < m.coupled_streams:
                for ch in m.left_channels(s):
                    out[:, ch] = part[:n, 0]
                for ch in m.right_channels(s):
                    out[:, ch] = part[:n, 1]
            else:
                for ch in m.mono_channels(s):
                    out[:, ch] = part[:n, 0]
        return out

    def decode(self, data: Optional[bytes], frame_size: int,
               decode_fec: bool = False) -> np.ndarray:
        pcm = self.decode_float(data, frame_size, decode_fec)
        return np.clip(np.round(pcm * 32768.0), -32768, 32767) \
            .astype(np.int16)

    def get_final_range(self) -> int:
        r = 0
        for d in self.decoders:
            r ^= d.get_final_range()
        return r

    # ---- CTL surface (multistream.rs:791-872): setters broadcast,
    # getters answer from the stream decoders.

    def set_gain(self, gain_q8: int):
        for d in self.decoders:
            d.set_gain(gain_q8)

    def gain(self) -> int:
        return self.decoders[0].gain()

    def set_phase_inversion_disabled(self, dis: bool):
        for d in self.decoders:
            d.set_phase_inversion_disabled(dis)

    def phase_inversion_disabled(self) -> bool:
        return self.decoders[0].phase_inversion_disabled()

    def get_sample_rate(self) -> int:
        return self.sample_rate

    def get_pitch(self) -> int:
        return self.decoders[0].get_pitch()

    def get_last_packet_duration(self) -> int:
        return self.decoders[0].get_last_packet_duration()

    def reset(self):
        for d in self.decoders:
            d.reset()
