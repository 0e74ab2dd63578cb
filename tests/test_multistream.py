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
    if channels >= 6:
        # channel 3 of the vorbis order (mapping entry 5) is the LFE:
        # give it LFE-plausible content (coded NB at ~1/8 rate)
        out[:, 5] = 0.3 * np.sin(2 * np.pi * 60 * t / 48000)
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


@pytest.mark.skipif(not os.path.exists(os.path.join(
    os.path.dirname(__file__), "..", "tools", "oracle", "surround_check")),
    reason="surround oracle missing")
def test_surround_analysis_matches_reference(tmp_path):
    """Per-channel 21-band SMRs match surround_analysis
    (opus_multistream_encoder.c:224) to float precision."""
    from opus_codec_tpu.opus.multistream import surround_analysis
    oracle = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "oracle", "surround_check")
    fs, n, ch = 48000, 960 * 5, 6
    rng = np.random.default_rng(4)
    t = np.arange(n)
    x = np.zeros((n, ch), np.float32)
    for c in range(ch):
        x[:, c] = (0.25 * np.sin(2 * np.pi * (150 + 130 * c) * t / fs)
                   + 0.03 * rng.standard_normal(n))
    f = str(tmp_path / "s.f32")
    x.ravel().tofile(f)
    r = subprocess.run([oracle, str(ch), f], capture_output=True, text=True)
    ref = np.array([[float(v) for v in line.split()]
                    for line in r.stdout.splitlines()]).reshape(-1, ch, 21)
    mem = np.zeros((ch, 120))
    pre = np.zeros(ch)
    ours = np.stack([surround_analysis(x[960 * i:960 * (i + 1)], mem, pre)
                     for i in range(n // 960)])
    assert np.abs(ours - ref).max() < 1e-4


def test_surround_rate_allocation_shape():
    """LFE gets ~1/8 mono rate; coupled gets about twice mono
    (surround_rate_allocation semantics)."""
    enc = MSEncoder.new_surround(48000, 6, Application.AUDIO)
    enc.set_bitrate(Bitrate(256000))
    rates = enc._rate_allocation(960)
    assert len(rates) == 4
    assert enc.lfe_stream == 3
    coupled, mono, lfe = rates[0], rates[2], rates[3]
    assert lfe < mono < coupled
    assert coupled > 1.5 * mono
    assert sum(rates) <= 256000 * 1.05


def test_surround_masking_reduces_masked_stream_size():
    """A quiet channel masked by loud neighbours spends fewer bytes
    when the masking analysis is active."""
    fs = 48000
    t = np.arange(960 * 8)
    x = np.zeros((960 * 8, 6), np.float32)
    rng = np.random.default_rng(7)
    for c in range(5):
        x[:, c] = 0.4 * np.sin(2 * np.pi * (200 + 120 * c) * t / fs) \
            + 0.05 * rng.standard_normal(len(t))
    x[:, 5] = 0.2 * np.sin(2 * np.pi * 60 * t / fs)
    enc = MSEncoder.new_surround(48000, 6, Application.AUDIO)
    enc.set_bitrate(Bitrate(192000))
    dec = MSDecoder.new_surround(48000, 6)
    sizes = []
    for f in range(8):
        p = enc.encode_float(x[f * 960:(f + 1) * 960])
        y = dec.decode_float(p, 960)
        assert np.all(np.isfinite(y))
        sizes.append(len(p))
    assert all(s < 1200 for s in sizes)    # 192k/50 = 480B avg budget


def test_ms_ctl_roundtrip():
    """Set->get roundtrip of the full MS CTL surface, mirroring the
    reference crate's tests/encoder_ctls.rs over multistream.rs:232-483
    (setters broadcast to every stream; getters answer from the
    streams)."""
    from opus_codec_tpu.types import Bandwidth, Signal
    enc = MSEncoder.new_surround(48000, 6, Application.AUDIO)
    enc.set_complexity(7)
    assert enc.complexity() == 7
    enc.set_dtx(True)
    assert enc.dtx() is True
    assert enc.in_dtx() is False
    enc.set_inband_fec(True)
    assert enc.inband_fec() is True
    enc.set_packet_loss_perc(15)
    assert enc.packet_loss_perc() == 15
    enc.set_vbr(False)
    assert enc.vbr() is False
    enc.set_vbr_constraint(True)
    assert enc.vbr_constraint() is True
    enc.set_max_bandwidth(Bandwidth.SUPERWIDEBAND)
    assert enc.max_bandwidth() == Bandwidth.SUPERWIDEBAND
    enc.set_signal(Signal.MUSIC)
    assert enc.signal() == Signal.MUSIC
    enc.set_lsb_depth(16)
    assert enc.lsb_depth() == 16
    enc.set_prediction_disabled(True)
    assert enc.prediction_disabled() is True
    enc.set_phase_inversion_disabled(True)
    assert enc.phase_inversion_disabled() is True
    enc.set_force_channels(1)
    assert enc.force_channels() == 1
    enc.set_force_channels(None)
    assert enc.force_channels() is None
    assert enc.lookahead() == 48000 // 400
    # every stream encoder saw the broadcast
    assert all(e.complexity() == 7 for e in enc.encoders)
    assert all(e.inband_fec() for e in enc.encoders)
    enc.reset()
    assert enc.complexity() == 7          # settings survive reset

    dec = MSDecoder.new_surround(48000, 6)
    dec.set_gain(256)
    assert dec.gain() == 256
    dec.set_phase_inversion_disabled(True)
    assert dec.phase_inversion_disabled() is True
    assert dec.get_sample_rate() == 48000
    dec.reset()
    assert dec.gain() == 256              # gain survives reset (spec)
