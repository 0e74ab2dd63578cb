"""Opus packet framing: TOC byte, frame packing codes 0-3, padding.

Behavioural parity: /root/reference/opus/src/opus.c (opus_packet_parse_impl
:194, encode_size/parse_size :140-171, samples_per_frame :173), TOC
generation opus_encoder.c:299-330, packet inspectors opus_decoder.c:1083-1162
and the Rust wrapper surface src/packet.rs.

Pure host logic, no device involvement — packets are variable-length byte
strings, produced/consumed at the batch boundary by the stream scheduler.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..errors import OpusError
from ..types import Bandwidth, CodecMode

__all__ = [
    "Toc", "ParsedPacket", "parse_packet", "build_packet",
    "packet_bandwidth", "packet_nb_channels", "packet_nb_frames",
    "packet_nb_samples", "samples_per_frame", "packet_mode", "gen_toc",
    "packet_pad", "packet_unpad", "packet_has_lbrr", "encode_size",
    "parse_size",
]


def samples_per_frame(toc0: int, fs: int) -> int:
    """Frame duration in samples at rate ``fs`` from the TOC byte (opus.c:173)."""
    if toc0 & 0x80:
        audiosize = (toc0 >> 3) & 0x3
        return (fs << audiosize) // 400
    elif (toc0 & 0x60) == 0x60:
        return fs // 50 if (toc0 & 0x08) else fs // 100
    else:
        audiosize = (toc0 >> 3) & 0x3
        if audiosize == 3:
            return fs * 60 // 1000
        return (fs << audiosize) // 100


def packet_mode(toc0: int) -> CodecMode:
    """Coding mode from the TOC byte (opus_private.h opus_packet_get_mode)."""
    if toc0 & 0x80:
        return CodecMode.CELT_ONLY
    elif (toc0 & 0x60) == 0x60:
        return CodecMode.HYBRID
    return CodecMode.SILK_ONLY


def packet_bandwidth(toc0: int) -> Bandwidth:
    """Audio bandwidth from the TOC byte (opus_decoder.c:1083-1099)."""
    if toc0 & 0x80:
        bw = Bandwidth.MEDIUMBAND + ((toc0 >> 5) & 0x3)
        if bw == Bandwidth.MEDIUMBAND:
            bw = Bandwidth.NARROWBAND
        return Bandwidth(bw)
    elif (toc0 & 0x60) == 0x60:
        return Bandwidth.FULLBAND if (toc0 & 0x10) else Bandwidth.SUPERWIDEBAND
    return Bandwidth(Bandwidth.NARROWBAND + ((toc0 >> 5) & 0x3))


def packet_nb_channels(toc0: int) -> int:
    return 2 if (toc0 & 0x4) else 1


def packet_nb_frames(packet: bytes) -> int:
    """opus_decoder.c:1106-1120."""
    if len(packet) < 1:
        raise OpusError.bad_arg("empty packet")
    count = packet[0] & 0x3
    if count == 0:
        return 1
    elif count != 3:
        return 2
    elif len(packet) < 2:
        raise OpusError.invalid_packet()
    return packet[1] & 0x3F


def packet_nb_samples(packet: bytes, fs: int) -> int:
    """opus_decoder.c:1122-1137."""
    count = packet_nb_frames(packet)
    samples = count * samples_per_frame(packet[0], fs)
    if samples * 25 > fs * 3:  # >120 ms
        raise OpusError.invalid_packet("packet exceeds 120 ms")
    return samples


def gen_toc(mode: CodecMode, framerate: int, bandwidth: Bandwidth,
            channels: int) -> int:
    """Build the TOC byte (opus_encoder.c:299-330).

    ``framerate`` is frames/second (400 for 2.5 ms ... 50 for 20 ms; multi-
    frame packets repeat the 20 ms config with code 3).
    """
    period = 0
    while framerate < 400:
        framerate <<= 1
        period += 1
    if mode == CodecMode.SILK_ONLY:
        toc = (bandwidth - Bandwidth.NARROWBAND) << 5
        toc |= (period - 2) << 3
    elif mode == CodecMode.CELT_ONLY:
        tmp = bandwidth - Bandwidth.MEDIUMBAND
        if tmp < 0:
            tmp = 0
        toc = 0x80 | (tmp << 5) | (period << 3)
    else:  # hybrid
        toc = 0x60
        toc |= (bandwidth - Bandwidth.SUPERWIDEBAND) << 4
        toc |= (period - 2) << 3
    toc |= (1 if channels == 2 else 0) << 2
    return toc & 0xFF


@dataclass
class Toc:
    """Decoded TOC byte."""
    mode: CodecMode
    bandwidth: Bandwidth
    frame_samples_48k: int
    channels: int
    code: int

    @classmethod
    def parse(cls, toc0: int) -> "Toc":
        return cls(
            mode=packet_mode(toc0),
            bandwidth=packet_bandwidth(toc0),
            frame_samples_48k=samples_per_frame(toc0, 48000),
            channels=packet_nb_channels(toc0),
            code=toc0 & 0x3,
        )


@dataclass
class ParsedPacket:
    toc: int
    frames: List[bytes]
    payload_offset: int
    packet_offset: int
    padding: bytes


def encode_size(size: int) -> bytes:
    """Frame-length field encoding (opus.c:140-151)."""
    if size < 252:
        return bytes([size])
    b0 = 252 + (size & 0x3)
    return bytes([b0, (size - b0) >> 2])


def parse_size(data: bytes, offset: int, length: int) -> Tuple[int, int]:
    """Return (size, bytes_consumed); size=-1 on error (opus.c:153-171)."""
    if length < 1:
        return -1, -1
    b0 = data[offset]
    if b0 < 252:
        return b0, 1
    if length < 2:
        return -1, -1
    return 4 * data[offset + 1] + b0, 2


def parse_packet(data: bytes, self_delimited: bool = False) -> ParsedPacket:
    """Split a packet into frames (opus.c:194-353). Raises on invalid input."""
    if len(data) == 0:
        raise OpusError.invalid_packet("empty")
    framesize = samples_per_frame(data[0], 48000)
    pad = 0
    cbr = False
    toc = data[0]
    pos = 1
    length = len(data) - 1
    last_size = length
    sizes: List[int] = []
    code = toc & 0x3

    if code == 0:
        count = 1
    elif code == 1:
        count = 2
        cbr = True
        if not self_delimited:
            if length & 0x1:
                raise OpusError.invalid_packet("odd length for code-1")
            last_size = length // 2
            sizes.append(last_size)
    elif code == 2:
        count = 2
        sz, nbytes = parse_size(data, pos, length)
        length -= nbytes
        if sz < 0 or sz > length:
            raise OpusError.invalid_packet("bad code-2 size")
        pos += nbytes
        sizes.append(sz)
        last_size = length - sz
    else:  # code 3
        if length < 1:
            raise OpusError.invalid_packet("truncated code-3")
        ch = data[pos]
        pos += 1
        count = ch & 0x3F
        if count <= 0 or framesize * count > 5760:
            raise OpusError.invalid_packet("bad frame count")
        length -= 1
        if ch & 0x40:  # padding flag
            while True:
                if length <= 0:
                    raise OpusError.invalid_packet("truncated padding")
                p = data[pos]
                pos += 1
                length -= 1
                tmp = 254 if p == 255 else p
                length -= tmp
                pad += tmp
                if p != 255:
                    break
        if length < 0:
            raise OpusError.invalid_packet("negative length after padding")
        cbr = not (ch & 0x80)
        if not cbr:  # VBR
            last_size = length
            for _ in range(count - 1):
                sz, nbytes = parse_size(data, pos, length)
                length -= nbytes
                if sz < 0 or sz > length:
                    raise OpusError.invalid_packet("bad VBR size")
                pos += nbytes
                sizes.append(sz)
                last_size -= nbytes + sz
            if last_size < 0:
                raise OpusError.invalid_packet("VBR sizes exceed packet")
        elif not self_delimited:  # CBR
            last_size = length // count
            if last_size * count != length:
                raise OpusError.invalid_packet("CBR not divisible")
            sizes = [last_size] * (count - 1)

    if self_delimited:
        sz, nbytes = parse_size(data, pos, length)
        length -= nbytes
        if sz < 0 or sz > length:
            raise OpusError.invalid_packet("bad self-delimited size")
        pos += nbytes
        if cbr:
            if sz * count > length:
                raise OpusError.invalid_packet("self-delimited CBR overflow")
            sizes = [sz] * count
        else:
            if nbytes + sz > last_size:
                raise OpusError.invalid_packet("self-delimited VBR overflow")
            sizes.append(sz)
    else:
        if last_size > 1275:
            raise OpusError.invalid_packet("frame exceeds 1275 bytes")
        sizes.append(last_size)

    payload_offset = pos
    frames = []
    for sz in sizes:
        frames.append(bytes(data[pos:pos + sz]))
        pos += sz
    padding = bytes(data[pos:pos + pad])
    return ParsedPacket(toc=toc, frames=frames, payload_offset=payload_offset,
                        packet_offset=pos + pad, padding=padding)


def build_packet(toc: int, frames: List[bytes], cbr: Optional[bool] = None,
                 pad_to: int = 0, self_delimited: bool = False,
                 padding_data: bytes = b"") -> bytes:
    """Assemble frames into a packet, choosing the smallest framing code.

    Mirrors opus_repacketizer_out_range_impl framing (repacketizer.c), which is
    also what the multi-frame encoder tail uses.
    """
    count = len(frames)
    if not 1 <= count <= 48:
        raise OpusError.bad_arg("1..=48 frames")
    sizes = [len(f) for f in frames]
    if max(sizes) > 1275:
        raise OpusError.bad_arg("frame exceeds 1275 bytes")
    if self_delimited:
        # Multistream self-delimited framing is produced by
        # build_self_delimited() once the multistream layer lands.
        raise OpusError(-5, "self-delimited build not implemented yet")
    all_equal = all(s == sizes[0] for s in sizes)
    if cbr is None:
        cbr = all_equal
    if cbr and not all_equal:
        raise OpusError.bad_arg("CBR requires equal frame sizes")

    out = bytearray()
    plain = not pad_to and not self_delimited and not padding_data
    if count == 1 and plain:
        out.append((toc & 0xFC) | 0)
        out += frames[0]
        return bytes(out)
    if count == 2 and all_equal and plain:
        out.append((toc & 0xFC) | 1)
        out += frames[0] + frames[1]
        return bytes(out)
    if count == 2 and plain:
        out.append((toc & 0xFC) | 2)
        out += encode_size(sizes[0])
        out += frames[0] + frames[1]
        return bytes(out)

    # code 3
    ch = count
    if not cbr:
        ch |= 0x80
    body = bytearray()
    if not cbr:
        for s in sizes[:-1]:
            body += encode_size(s)
    for f in frames:
        body += f

    out.append((toc & 0xFC) | 3)
    current = 2 + len(body)  # toc + count byte + body
    if padding_data:
        # padding that carries payload (extensions): the padding data
        # bytes are exactly ``padding_data`` (opus_packet_pad_impl with
        # extensions, repacketizer.c:329-360)
        ch |= 0x40
        # length coding: each 255-valued byte adds 254 data bytes
        n255 = 0
        rem = len(padding_data)
        while rem > 254:
            n255 += 1
            rem -= 254
        out.append(ch)
        out += bytes([255] * n255)
        out.append(rem)
        out += body
        out += padding_data
    elif pad_to > current:
        # ``extra`` bytes of padding machinery: length bytes (each 255-valued
        # one covers itself + 254 data bytes) followed by zero data bytes.
        ch |= 0x40
        extra = pad_to - current
        n255 = (extra - 1) // 255
        last = (extra - 1) % 255
        out.append(ch)
        out += bytes([255] * n255)
        out.append(last)
        out += body
        out += bytes(n255 * 254 + last)
    else:
        out.append(ch)
        out += body
    return bytes(out)


def packet_pad(packet: bytes, new_len: int) -> bytes:
    """Pad a packet to ``new_len`` bytes (opus_packet_pad semantics)."""
    if new_len < len(packet):
        raise OpusError.bad_arg("new_len smaller than packet")
    if new_len == len(packet):
        return packet
    parsed = parse_packet(packet)
    return build_packet(parsed.toc, parsed.frames, pad_to=new_len)


def packet_unpad(packet: bytes) -> bytes:
    """Remove padding (opus_packet_unpad semantics)."""
    parsed = parse_packet(packet)
    return build_packet(parsed.toc, parsed.frames)


def multistream_packet_pad(packet: bytes, new_len: int,
                           nb_streams: int) -> bytes:
    """opus_multistream_packet_pad (packet.rs:258-271,
    repacketizer.c:387-415): pad only the last stream's sub-packet."""
    if len(packet) < 1 or nb_streams < 1:
        raise OpusError.bad_arg()
    if new_len < len(packet):
        raise OpusError.bad_arg("new_len smaller than packet")
    if new_len == len(packet):
        return packet
    pos = 0
    for _ in range(nb_streams - 1):
        if pos >= len(packet):
            raise OpusError.invalid_packet()
        parsed = parse_packet(packet[pos:], self_delimited=True)
        pos += parsed.packet_offset
    last = packet[pos:]
    return packet[:pos] + packet_pad(last, len(last)
                                     + (new_len - len(packet)))


def multistream_packet_unpad(packet: bytes, nb_streams: int) -> bytes:
    """opus_multistream_packet_unpad (packet.rs:273-287,
    repacketizer.c:418-464): strip padding from every sub-packet."""
    if len(packet) < 1 or nb_streams < 1:
        raise OpusError.bad_arg()
    pos = 0
    out = bytearray()
    for s in range(nb_streams):
        if pos >= len(packet):
            raise OpusError.invalid_packet()
        self_del = s != nb_streams - 1
        parsed = parse_packet(packet[pos:], self_delimited=self_del)
        rebuilt = build_packet(parsed.toc, parsed.frames)
        if self_del:
            rebuilt = build_self_delimited(rebuilt)
        out += rebuilt
        pos += parsed.packet_offset
    return bytes(out)


def soft_clip(pcm: np.ndarray, channels: int,
              softclip_mem: np.ndarray) -> None:
    """opus_pcm_soft_clip exposed as a packet util (packet.rs:123-155).

    ``pcm``: interleaved float array of frame_size*channels samples
    (or [N, C]), clipped smoothly to [-1, 1] in place; ``softclip_mem``
    carries one float of state per channel across calls."""
    from ..opus.decoder import pcm_soft_clip
    pcm = np.asarray(pcm)
    if channels < 1 or len(softclip_mem) < channels:
        raise OpusError.bad_arg()
    if pcm.ndim == 1:
        if len(pcm) % channels:
            raise OpusError.bad_arg()
        view = pcm.reshape(-1, channels)
    else:
        view = pcm
    pcm_soft_clip(view, channels, softclip_mem)


def build_self_delimited(packet: bytes) -> bytes:
    """Convert a normal packet to self-delimited framing (RFC 6716 App. B;
    repacketizer.c out_range_impl self_delimited=1)."""
    parsed = parse_packet(packet)
    toc = parsed.toc
    frames = parsed.frames
    count = len(frames)
    sizes = [len(f) for f in frames]
    out = bytearray()
    if count == 1:
        out.append((toc & 0xFC) | 0)
        out += encode_size(sizes[0])
        out += frames[0]
    elif count == 2 and sizes[0] == sizes[1]:
        out.append((toc & 0xFC) | 1)
        out += encode_size(sizes[1])
        out += frames[0] + frames[1]
    elif count == 2:
        out.append((toc & 0xFC) | 2)
        out += encode_size(sizes[0])
        out += encode_size(sizes[1])
        out += frames[0] + frames[1]
    else:
        cbr = all(s == sizes[0] for s in sizes)
        ch = count | (0 if cbr else 0x80)
        out.append((toc & 0xFC) | 3)
        out.append(ch)
        if cbr:
            out += encode_size(sizes[-1])
        else:
            for s in sizes[:-1]:
                out += encode_size(s)
            out += encode_size(sizes[-1])
        for f in frames:
            out += f
    return bytes(out)


def packet_has_lbrr(packet: bytes) -> bool:
    """opus_packet_has_lbrr (opus_decoder.c:1139-1162): reads the
    SILK header's LBRR flag bit(s) from the first frame."""
    if not packet:
        raise OpusError.bad_arg("empty packet")
    config = packet[0] >> 3
    if config >= 16:          # CELT-only
        return False
    frame_size = samples_per_frame(packet[0], 48000)
    nb_frames = frame_size // 960 if frame_size > 960 else 1
    stream_channels = 2 if (packet[0] >> 2) & 1 else 1
    parsed = parse_packet(packet)
    if not parsed.frames or not parsed.frames[0]:
        return False
    b0 = parsed.frames[0][0]
    lbrr = (b0 >> (7 - nb_frames)) & 0x1
    if stream_channels == 2:
        lbrr = lbrr or ((b0 >> (6 - 2 * nb_frames)) & 0x1)
    return bool(lbrr)
