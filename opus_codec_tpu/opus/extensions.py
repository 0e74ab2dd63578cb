"""Opus packet extensions — structured data carried in packet padding.

Re-implements opus/src/extensions.c (the transport for DRED, ids
126/127, and any other id 2..127 payload):

wire format inside the padding area (extensions.c:41-92):
* byte0 = (id << 1) | L
* id 0, L 1: one-byte padding;  id 0, L 0: rest is padding (stop)
* id 1: frame separator — L=0 advances one frame, L=1 reads an extra
  byte with the frame increment
* id 2..31: short extension, L = payload length (0 or 1 byte)
* id 32..127: long extension; L=1 means a 255-escaped length chain
  follows, L=0 means "last extension — payload is the rest"

Frame indices cap at 48 (max frames per packet).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..errors import OpusError

MAX_FRAMES = 48


@dataclass
class ExtensionData:
    """opus_extension_data (opus_private.h)."""
    id: int
    frame: int
    data: bytes


def _skip_extension(data: bytes, pos: int, length: int) -> Tuple[int, int, int]:
    """skip_extension (extensions.c:41-92): returns
    (new_pos, remaining_len, header_size); remaining < 0 on error."""
    if length == 0:
        return pos, 0, 1
    b = data[pos]
    ext_id = b >> 1
    L = b & 1
    if ext_id == 0 and L == 1:
        return pos + 1, length - 1, 1
    if 0 < ext_id < 32:
        if length < 1 + L:
            return pos, -1, 1
        return pos + 1 + L, length - (1 + L), 1
    if L == 0:
        return pos + length, 0, 1
    # long extension with explicit length
    header = 1
    nbytes = 0
    while True:
        pos += 1
        length -= 1
        if length == 0:
            return pos, -1, header
        nbytes += data[pos]
        header += 1
        if data[pos] != 255:
            break
    pos += 1
    length -= 1
    if nbytes > length:
        return pos, -1, header
    return pos + nbytes, length - nbytes, header


def extensions_count(data: bytes) -> int:
    """opus_packet_extensions_count (extensions.c:95-117)."""
    pos = 0
    length = len(data)
    count = 0
    while length > 0:
        ext_id = data[pos] >> 1
        pos, length, _ = _skip_extension(data, pos, length)
        if length < 0:
            raise OpusError.invalid_packet("bad extension framing")
        if ext_id > 1:
            count += 1
    return count


def extensions_parse(data: bytes,
                     max_extensions: Optional[int] = None
                     ) -> List[ExtensionData]:
    """opus_packet_extensions_parse (extensions.c:120-171)."""
    pos = 0
    length = len(data)
    frame = 0
    out: List[ExtensionData] = []
    while length > 0:
        b = data[pos]
        ext_id = b >> 1
        start = pos
        if ext_id == 1:
            L = b & 1
            if L == 0:
                frame += 1
            elif length >= 2:
                frame += data[pos + 1]
            if frame >= MAX_FRAMES:
                raise OpusError.invalid_packet("extension frame >= 48")
        pos, length, header = _skip_extension(data, pos, length)
        if length < 0:
            raise OpusError.invalid_packet("bad extension framing")
        if ext_id > 1:
            if max_extensions is not None and len(out) == max_extensions:
                raise OpusError.buffer_too_small("too many extensions")
            out.append(ExtensionData(ext_id, frame,
                                     bytes(data[start + header:pos])))
    return out


def extensions_generate(extensions: List[ExtensionData], size: int,
                        pad: bool = True) -> bytes:
    """opus_packet_extensions_generate (extensions.c:174-283): serialise
    into exactly ``size`` bytes when pad=True (0x01 prefix padding)."""
    max_frame = 0
    for e in extensions:
        max_frame = max(max_frame, e.frame)
        if e.id < 2 or e.id > 127:
            raise OpusError.bad_arg("extension id out of range")
    if max_frame >= MAX_FRAMES:
        raise OpusError.bad_arg("extension frame out of range")
    out = bytearray()
    curr_frame = 0
    written = 0
    nb = len(extensions)
    for frame in range(max_frame + 1):
        for e in extensions:
            if e.frame != frame:
                continue
            if frame != curr_frame:
                diff = frame - curr_frame
                if size - len(out) < 2:
                    raise OpusError.buffer_too_small("extensions")
                if diff == 1:
                    out.append(0x02)
                else:
                    out.append(0x03)
                    out.append(diff)
                curr_frame = frame
            if e.id < 32:
                if len(e.data) > 1:
                    raise OpusError.bad_arg("short extension > 1 byte")
                if size - len(out) < len(e.data) + 1:
                    raise OpusError.buffer_too_small("extensions")
                out.append((e.id << 1) | len(e.data))
                out += e.data
            else:
                last = written == nb - 1
                length_bytes = 0 if last else 1 + len(e.data) // 255
                if size - len(out) < 1 + length_bytes + len(e.data):
                    raise OpusError.buffer_too_small("extensions")
                out.append((e.id << 1) | (0 if last else 1))
                if not last:
                    out += b"\xff" * (len(e.data) // 255)
                    out.append(len(e.data) % 255)
                out += e.data
            written += 1
    if pad and len(out) < size:
        out = bytearray(b"\x01" * (size - len(out))) + out
    return bytes(out)
