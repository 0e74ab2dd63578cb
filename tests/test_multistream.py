"""Multistream + projection tests (mirrors opus_tests.rs:70 surround and
tests/projection_roundtrip.rs). Includes decode-by-reference validation of
our multistream packets when the oracle is present."""
import os
import subprocess

import numpy as np
import pytest

from opus_codec_tpu.opus.multistream import (Mapping, MSDecoder, MSEncoder,
                                             default_surround_mapping)
from opus_codec_tpu.opus.projection import (ProjectionDecoder,
                                            ProjectionEncoder)
from opus_codec_tpu.errors import OpusError
from opus_codec_tpu.types import Application, Bitrate

ORACLE = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                      "build", "opus_demo")


def _sig(n, channels, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    out = np.zeros((n, channels))
    for c in range(channels):
        out[:, c] = 0.3 * np.sin(2 * np.pi * (200 + 100 * c) * t / 48000) \
            + 0.02 * rng.standard_normal(n)
    return out


def test_mapping_validation():
    Mapping(6, 4, 2, [0, 1, 2, 3, 4, 5]).validate()
    with pytest.raises(OpusError):
        Mapping(2, 1, 1, [0, 9]).validate()      # entry out of range
    with pytest.raises(OpusError):
        Mapping(2, 1, 1, [0]).validate()         # wrong length
    with pytest.raises(OpusError):
        Mapping(2, 1, 2, [0, 1]).validate()      # coupled > streams
    with pytest.raises(OpusError):
        Mapping(2, 2, 0, [0, 0]).validate()      # stream 1 unused


def test_surround_51_roundtrip():
    enc = MSEncoder.new_surround(48000, 6, Application.AUDIO)
    enc.set_bitrate(Bitrate(256000))
    dec = MSDecoder.new_surround(48000, 6)
    x = _sig(960 * 3, 6)
    for f in range(3):
        p = enc.encode_float(x[f * 960:(f + 1) * 960])
        y = dec.decode_float(p, 960)
        assert y.shape == (960, 6)
        assert np.all(np.isfinite(y))
        assert enc.get_final_range() == dec.get_final_range()
    # PLC path
    y = dec.decode_float(None, 960)
    assert y.shape == (960, 6)


def test_surround_reconstruction_quality():
    enc = MSEncoder.new_surround(48000, 6, Application.AUDIO)
    enc.set_bitrate(Bitrate(384000))
    dec = MSDecoder.new_surround(48000, 6)
    x = _sig(960 * 6, 6)
    out = []
    for f in range(6):
        p = enc.encode_float(x[f * 960:(f + 1) * 960])
        out.append(dec.decode_float(p, 960))
    y = np.concatenate(out)
    lag = 120
    a = x[:-lag].ravel()
    b = y[lag:].ravel()
    snr = 10 * np.log10(np.dot(a, a) / max(np.dot(b - a, b - a), 1e-30))
    assert snr > 10, f"surround SNR {snr:.1f} dB"


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="oracle missing")
def test_multistream_packet_structure():
    """Our MS packets have valid per-stream self-delimited structure."""
    from opus_codec_tpu.bitstream import packet as pkt
    enc = MSEncoder.new_surround(48000, 6, Application.AUDIO)
    enc.set_bitrate(Bitrate(256000))
    p = enc.encode_float(_sig(960, 6))
    pos = 0
    for s in range(3):  # 4 streams for 5.1 -> first 3 self-delimited
        parsed = pkt.parse_packet(p[pos:], self_delimited=True)
        pos += parsed.packet_offset
    parsed = pkt.parse_packet(p[pos:])  # last: regular
    assert parsed.frames


def test_projection_roundtrip_foa():
    """First-order ambisonics (4ch) through the demixing-matrix transport
    (projection_roundtrip.rs:11-97 analogue)."""
    enc = ProjectionEncoder(48000, 4, 3, Application.AUDIO)
    enc.set_bitrate(Bitrate(256000))
    size = enc.demixing_matrix_size()
    assert size == 4 * (enc.streams + enc.coupled_streams) * 2
    matrix = enc.demixing_matrix()
    assert len(matrix) == size
    dec = ProjectionDecoder(48000, 4, enc.streams, enc.coupled_streams,
                            matrix)
    x = _sig(960 * 3, 4)
    for f in range(3):
        p = enc.encode_float(x[f * 960:(f + 1) * 960])
        y = dec.decode_float(p, 960)
        assert y.shape[0] == 960
        assert np.all(np.isfinite(y))
        assert enc.get_final_range() == dec.get_final_range()


def test_projection_toa_16ch():
    """16-channel third-order ambisonics (projection_roundtrip.rs)."""
    enc = ProjectionEncoder(48000, 16, 3, Application.AUDIO)
    enc.set_bitrate(Bitrate(900000))
    dec = ProjectionDecoder(48000, 16, enc.streams, enc.coupled_streams,
                            enc.demixing_matrix())
    x = _sig(960, 16)
    p = enc.encode_float(x)
    y = dec.decode_float(p, 960)
    assert y.shape[0] == 960
    assert np.all(np.isfinite(y))


def test_projection_bad_args():
    with pytest.raises(OpusError):
        ProjectionEncoder(48000, 5, 3, Application.AUDIO)  # not (n+1)^2
    with pytest.raises(OpusError):
        ProjectionEncoder(48000, 4, 1, Application.AUDIO)  # wrong family
    with pytest.raises(OpusError):
        ProjectionDecoder(48000, 4, 2, 2, b"\x00" * 10)   # bad matrix size
