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

__all__ = ["Mapping", "MSEncoder", "MSDecoder", "default_surround_mapping"]


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
                 application: Application):
        mapping.validate()
        self.mapping = mapping
        self.sample_rate = sample_rate
        self.encoders: List[Encoder] = []
        for s in range(mapping.streams):
            ch = 2 if s < mapping.coupled_streams else 1
            self.encoders.append(Encoder(sample_rate, ch, application))
        self._bitrate = Bitrate.AUTO

    @classmethod
    def new_surround(cls, sample_rate: int, channels: int,
                     application: Application) -> "MSEncoder":
        return cls(sample_rate, default_surround_mapping(channels),
                   application)

    def set_bitrate(self, bitrate):
        self._bitrate = bitrate
        bps = bitrate.bps if isinstance(bitrate, Bitrate) else int(bitrate)
        # simple per-stream split: coupled streams get 2 shares
        # (surround_rate_allocation refinement lands with the masking
        # analysis milestone)
        shares = self.mapping.streams + self.mapping.coupled_streams
        for s, e in enumerate(self.encoders):
            w = 2 if s < self.mapping.coupled_streams else 1
            e.set_bitrate(Bitrate(max(500, bps * w // shares)))

    def bitrate(self):
        return self._bitrate

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
        subpackets = []
        for s in range(m.streams):
            if s < m.coupled_streams:
                li = m.left_channels(s)
                ri = m.right_channels(s)
                left = pcm[:, li[0]] if li else np.zeros(pcm.shape[0])
                right = pcm[:, ri[0]] if ri else np.zeros(pcm.shape[0])
                sig = np.stack([left, right], axis=1).ravel()
            else:
                mi = m.mono_channels(s)
                sig = pcm[:, mi[0]] if mi else np.zeros(pcm.shape[0])
            subpackets.append(self.encoders[s].encode_float(sig, 1500))
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
