"""Projection (ambisonics, mapping family 3) encoder/decoder.

Behavioural parity: /root/reference/opus/src/opus_projection_encoder.c
(:78-130 stream derivation, :243-320 matrix selection),
opus_projection_decoder.c, mapping_matrix.c (:86-230 multiplies — the
mixing is literally a matmul over the channel axis, which on TPU rides the
MXU for free) and the Rust surface src/projection.rs.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..errors import OpusError
from ..types import Application, Bitrate
from . import mapping_matrices as MM
from .multistream import Mapping, MSDecoder, MSEncoder

__all__ = ["ProjectionEncoder", "ProjectionDecoder"]

_MIX = {2: MM.foa_mixing, 3: MM.soa_mixing, 4: MM.toa_mixing,
        5: MM.fourthoa_mixing, 6: MM.fifthoa_mixing}
_DEMIX = {2: MM.foa_demixing, 3: MM.soa_demixing, 4: MM.toa_demixing,
          5: MM.fourthoa_demixing, 6: MM.fifthoa_demixing}


def _order_plus_one(channels: int) -> int:
    """opus_projection_encoder.c:78-99."""
    if channels < 1 or channels > 227:
        raise OpusError.bad_arg("channels 1..=227")
    opo = math.isqrt(channels)
    nondiegetic = channels - opo * opo
    if nondiegetic not in (0, 2):
        raise OpusError.bad_arg("channels must be (n+1)^2 [+2]")
    return opo


def _streams_from_channels(channels: int, mapping_family: int):
    """opus_projection_encoder.c:101-116."""
    if mapping_family != 3:
        raise OpusError.bad_arg("projection requires mapping family 3")
    opo = _order_plus_one(channels)
    return (channels + 1) // 2, channels // 2, opo


class ProjectionEncoder:
    """projection.rs:37-240 surface."""

    def __init__(self, sample_rate: int, channels: int, mapping_family: int,
                 application: Application):
        streams, coupled, opo = _streams_from_channels(channels,
                                                       mapping_family)
        if opo not in _MIX:
            raise OpusError.bad_arg("unsupported ambisonics order")
        self.channels = channels
        self.streams = streams
        self.coupled_streams = coupled
        self._mix = _MIX[opo]
        self._demix = _DEMIX[opo]
        # identity channel mapping into the mixed domain
        mapping = Mapping(channels, streams, coupled, list(range(channels)))
        self.ms = MSEncoder(sample_rate, mapping, application)

    def set_bitrate(self, bitrate):
        self.ms.set_bitrate(bitrate)

    def encode_float(self, pcm: np.ndarray, max_bytes: int = 60000) -> bytes:
        if pcm.ndim == 1:
            pcm = pcm.reshape(-1, self.channels)
        # premultiply by the mixing matrix (Q15) over the channel axis
        mat = self._mix["data"].astype(np.float64) / 32768.0
        mixed = pcm @ mat[:self.channels, :self.channels].T
        return self.ms.encode_float(mixed, max_bytes)

    def encode(self, pcm_i16: np.ndarray, max_bytes: int = 60000) -> bytes:
        return self.encode_float(
            np.asarray(pcm_i16).astype(np.float64) / 32768.0, max_bytes)

    # demixing-matrix CTLs (projection.rs:183-240)
    def demixing_matrix_size(self) -> int:
        return self.channels * (self.streams + self.coupled_streams) * 2

    def demixing_matrix_gain(self) -> int:
        return int(self._demix["gain"])

    def demixing_matrix(self) -> bytes:
        """Column-major int16 LE subset [channels x (streams+coupled)]
        (opus_projection_encoder.c GET_DEMIXING_MATRIX)."""
        cols = self.streams + self.coupled_streams
        sub = self._demix["data"][:self.channels, :cols]
        return sub.T.astype("<i2").tobytes()  # col-major

    def get_final_range(self) -> int:
        return self.ms.get_final_range()


class ProjectionDecoder:
    """projection.rs:311-450 surface."""

    def __init__(self, sample_rate: int, channels: int, streams: int,
                 coupled_streams: int, demixing_matrix: bytes):
        cols = streams + coupled_streams
        expect = channels * cols * 2
        if len(demixing_matrix) != expect:
            raise OpusError.bad_arg(
                f"demixing matrix must be {expect} bytes")
        self.channels = channels
        self.streams = streams
        self.coupled_streams = coupled_streams
        mat = np.frombuffer(demixing_matrix, dtype="<i2") \
            .reshape(cols, channels).T.astype(np.float64) / 32768.0
        self._demix = mat  # [channels, cols]
        mapping = Mapping(cols, streams, coupled_streams, list(range(cols)))
        self.ms = MSDecoder(sample_rate, mapping)

    def decode_float(self, data: Optional[bytes], frame_size: int,
                     decode_fec: bool = False) -> np.ndarray:
        mixed = self.ms.decode_float(data, frame_size, decode_fec)
        return mixed @ self._demix.T

    def decode(self, data: Optional[bytes], frame_size: int,
               decode_fec: bool = False) -> np.ndarray:
        pcm = self.decode_float(data, frame_size, decode_fec)
        return np.clip(np.round(pcm * 32768.0), -32768, 32767) \
            .astype(np.int16)

    def get_final_range(self) -> int:
        return self.ms.get_final_range()
