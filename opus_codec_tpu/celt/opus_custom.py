"""OpusCustom: CELT-only codec at non-standard rates/frame sizes.

Reference: opus/include/opus_custom.h + celt/modes.c
opus_custom_mode_create (:227) and the CUSTOM_MODES paths of
celt_encoder.c/celt_decoder.c.  Custom frames are raw CELT frames with
no Opus TOC; both ends must agree on (Fs, frame_size, channels).
"""

from __future__ import annotations

import numpy as np

from ..errors import OpusError
from .decoder import CeltDecoder
from .encoder import CeltEncoder
from .modes import CeltMode, mode_create

__all__ = ["CustomMode", "CustomEncoder", "CustomDecoder"]


def CustomMode(fs: int, frame_size: int) -> CeltMode:
    """opus_custom_mode_create."""
    try:
        return mode_create(fs, frame_size)
    except ValueError as e:
        raise OpusError.bad_arg(str(e))


class CustomEncoder:
    """opus_custom_encoder_create + opus_custom_encode[_float]."""

    def __init__(self, mode: CeltMode, channels: int):
        if channels not in (1, 2):
            raise OpusError.bad_arg("channels 1 or 2")
        self.mode = mode
        self.channels = channels
        self.frame_size = mode.short_mdct_size << mode.max_lm
        self.celt = CeltEncoder(mode.fs, channels, mode=mode)
        self.celt.vbr = False

    def encode_float(self, pcm: np.ndarray, max_bytes: int) -> bytes:
        """pcm: [N*channels] interleaved or [C, N] float in [-1, 1];
        returns a raw CELT frame of exactly max_bytes bytes (CBR)."""
        if not 2 <= max_bytes <= 1275:
            raise OpusError.bad_arg("bytes per packet 2..1275")
        pcm = np.asarray(pcm)
        if pcm.ndim == 1:
            frames = pcm.reshape(-1, self.channels).T
        else:
            frames = pcm
        n = frames.shape[1]
        if n != self.frame_size:
            raise OpusError.bad_arg(
                f"frame must be {self.frame_size} samples")
        # signalling header byte (celt_encoder.c:1547-1568):
        # band-trim | LM | stereo flag, then the raw CELT payload
        m = self.mode
        tmp = (m.eff_ebands - self.celt.end) >> 1
        self.celt.end = max(1, m.eff_ebands - tmp)
        lm = (n // m.short_mdct_size).bit_length() - 1
        hdr = (tmp << 5) | (lm << 3) | ((self.channels == 2) << 2)
        payload = self.celt.encode_with_ec(frames, n, max_bytes - 1)
        return bytes([hdr]) + payload

    def encode(self, pcm_i16: np.ndarray, max_bytes: int) -> bytes:
        return self.encode_float(
            np.asarray(pcm_i16).astype(np.float64) / 32768.0, max_bytes)

    def get_final_range(self) -> int:
        return self.celt.rng & 0xFFFFFFFF

    def reset(self):
        self.celt.reset()

    def set_complexity(self, c: int):
        if not 0 <= c <= 10:
            raise OpusError.bad_arg("complexity 0..10")
        self.celt.complexity = c

    def set_bitrate(self, bps: int):
        self.celt.bitrate = bps


class CustomDecoder:
    """opus_custom_decoder_create + opus_custom_decode[_float]."""

    def __init__(self, mode: CeltMode, channels: int):
        if channels not in (1, 2):
            raise OpusError.bad_arg("channels 1 or 2")
        self.mode = mode
        self.channels = channels
        self.frame_size = mode.short_mdct_size << mode.max_lm
        self.celt = CeltDecoder(mode.fs, channels, mode=mode)

    def decode_float(self, data: bytes | None,
                     frame_size: int = None) -> np.ndarray:
        """Returns [N, channels] float; data=None runs PLC."""
        n = frame_size or self.frame_size
        if n < self.frame_size:
            raise OpusError.buffer_too_small()
        m = self.mode
        if data is not None and len(data) >= 1:
            # signalling header (celt_decoder.c custom block)
            d0 = data[0]
            self.celt.end = max(1, m.eff_ebands - 2 * (d0 >> 5))
            lm = (d0 >> 3) & 0x3
            if lm > m.max_lm:
                raise OpusError.invalid_packet("bad LM")
            n = m.short_mdct_size << lm
            data = data[1:]
        out = self.celt.decode_with_ec(data, n)
        return out.T

    def decode(self, data: bytes | None,
               frame_size: int = None) -> np.ndarray:
        f = self.decode_float(data, frame_size)
        return np.clip(np.floor(0.5 + f * 32768.0), -32768,
                       32767).astype(np.int16)

    def get_final_range(self) -> int:
        return self.celt.rng & 0xFFFFFFFF

    def reset(self):
        self.celt.reset()
