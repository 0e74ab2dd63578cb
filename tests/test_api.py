"""Public API tests (mirrors tests/opus_tests.rs, encoder_ctls.rs,
decoder_ctls.rs, and the repacketizer merge test)."""
import numpy as np
import pytest

import opus_codec_tpu as oc


def _tone(n, fs=48000, ch=1):
    t = np.arange(n)
    x = 0.4 * np.sin(2 * np.pi * 440 * t / fs) \
        + 0.1 * np.sin(2 * np.pi * 1800 * t / fs)
    if ch == 2:
        return np.stack([x, 0.8 * x]).T.ravel()
    return x


def test_roundtrip_i16():
    enc = oc.Encoder(48000, 1, oc.Application.AUDIO)
    enc.set_bitrate(oc.Bitrate(64000))
    dec = oc.Decoder(48000, 1)
    x = np.clip(_tone(960 * 10) * 32767, -32767, 32767).astype(np.int16)
    out = []
    for f in range(10):
        p = enc.encode(x[f * 960:(f + 1) * 960], 1500)
        assert 1 < len(p) <= 1500
        y = dec.decode(p, 960)
        assert y.shape == (960, 1)
        out.append(y[:, 0].astype(np.float64))
        assert enc.get_final_range() == dec.get_final_range()
    y = np.concatenate(out) / 32768
    x = x.astype(np.float64) / 32768
    best = max(
        10 * np.log10(np.dot(x[:len(x) - l], x[:len(x) - l])
                      / max(np.dot(y[l:] - x[:len(x) - l],
                                   y[l:] - x[:len(x) - l]), 1e-30))
        for l in (120,))
    assert best > 12, f"roundtrip SNR {best:.1f}"


def test_roundtrip_float_stereo():
    enc = oc.Encoder(48000, 2, oc.Application.AUDIO)
    enc.set_bitrate(oc.Bitrate(96000))
    dec = oc.Decoder(48000, 2)
    x = _tone(960 * 5, ch=2)
    for f in range(5):
        p = enc.encode_float(x[f * 1920:(f + 1) * 1920], 4000)
        y = dec.decode_float(p, 960)
        assert y.shape == (960, 2)
        assert np.all(np.isfinite(y))


def test_empty_input_is_plc():
    dec = oc.Decoder(48000, 1)
    y = dec.decode(b"", 960)
    assert y.shape == (960, 1)
    assert np.all(y == 0)  # no packet yet -> silence


def test_multiframe_packet_40ms():
    enc = oc.Encoder(48000, 1, oc.Application.AUDIO)
    enc.set_bitrate(oc.Bitrate(64000))
    dec = oc.Decoder(48000, 1)
    x = _tone(1920)
    p = enc.encode_float(x, 4000)
    assert oc.packet.packet_nb_frames(p) == 2
    y = dec.decode_float(p, 1920)
    assert y.shape == (1920, 1)


def test_repacketizer_merge():
    """3 x 20 ms -> one 60 ms packet (opus_tests.rs:110)."""
    enc = oc.Encoder(48000, 1, oc.Application.AUDIO)
    enc.set_bitrate(oc.Bitrate(64000))
    x = _tone(960 * 3)
    rp = oc.Repacketizer()
    for f in range(3):
        rp.cat(enc.encode_float(x[f * 960:(f + 1) * 960], 1500))
    assert rp.get_nb_frames() == 3
    merged = rp.out()
    assert oc.packet.packet_nb_samples(merged, 48000) == 2880
    dec = oc.Decoder(48000, 1)
    y = dec.decode_float(merged, 2880)
    assert y.shape == (2880, 1)


def test_encoder_ctls_roundtrip():
    enc = oc.Encoder(48000, 2, oc.Application.VOIP)
    enc.set_bitrate(oc.Bitrate(32000))
    assert enc.bitrate() == 32000
    enc.set_vbr(False)
    assert not enc.vbr()
    enc.set_vbr_constraint(False)
    assert not enc.vbr_constraint()
    enc.set_complexity(5)
    assert enc.complexity() == 5
    enc.set_bandwidth(oc.Bandwidth.WIDEBAND)
    assert enc.bandwidth() == oc.Bandwidth.WIDEBAND
    enc.set_signal(oc.Signal.MUSIC)
    assert enc.signal() == oc.Signal.MUSIC
    enc.set_inband_fec(True)
    assert enc.inband_fec()
    enc.set_packet_loss_perc(15)
    assert enc.packet_loss_perc() == 15
    enc.set_dtx(True)
    assert enc.dtx()
    enc.set_lsb_depth(16)
    assert enc.lsb_depth() == 16
    enc.set_force_channels(1)
    assert enc.force_channels() == 1
    enc.set_force_channels(None)
    assert enc.force_channels() is None
    enc.set_prediction_disabled(True)
    assert enc.prediction_disabled()
    enc.set_phase_inversion_disabled(True)
    assert enc.phase_inversion_disabled()
    assert enc.lookahead() == 120
    with pytest.raises(oc.OpusError):
        enc.set_complexity(11)
    with pytest.raises(oc.OpusError):
        enc.set_packet_loss_perc(101)
    with pytest.raises(oc.OpusError):
        enc.set_lsb_depth(7)


def test_decoder_ctls_roundtrip():
    dec = oc.Decoder(48000, 2)
    assert dec.get_sample_rate() == 48000
    dec.set_gain(-256)
    assert dec.gain() == -256
    dec.set_phase_inversion_disabled(True)
    assert dec.phase_inversion_disabled()
    dec.reset()
    assert dec.get_last_packet_duration() == 0
    with pytest.raises(oc.OpusError):
        dec.set_gain(99999)


def test_packet_helpers():
    enc = oc.Encoder(48000, 2, oc.Application.AUDIO)
    p = enc.encode_float(_tone(960, ch=2), 4000)
    dec = oc.Decoder(48000, 2)
    assert dec.packet_samples(p) == 960
    assert oc.Decoder.packet_channels(p) == 2
    assert oc.Decoder.packet_bandwidth(p) == oc.Bandwidth.FULLBAND


def test_encode_validation():
    enc = oc.Encoder(48000, 2, oc.Application.AUDIO)
    with pytest.raises(oc.OpusError):
        enc.encode(np.zeros(961, np.int16), 1500)  # odd length
    with pytest.raises(oc.OpusError):
        enc.encode_float(np.zeros(2 * 7000), 1500)  # > 120 ms
    with pytest.raises(oc.OpusError):
        enc.encode_float(np.zeros(2 * 961), 1500)  # invalid duration


def test_version():
    assert oc.version() == "1.5.2"


def test_expert_frame_duration_ctl():
    enc = oc.Encoder(48000, 1, oc.Application.AUDIO)
    assert enc.expert_frame_duration() == oc.ExpertFrameDuration.ARG
    enc.set_expert_frame_duration(oc.ExpertFrameDuration.MS20)
    assert enc.expert_frame_duration() == oc.ExpertFrameDuration.MS20
    with pytest.raises(ValueError):
        enc.set_expert_frame_duration(1234)


def test_expert_frame_duration_splits_packet():
    """A 60 ms input with a 20 ms expert duration yields one packet of
    three 20 ms frames (opus_encoder.c frame_size_select + the
    repacketizer loop)."""
    enc = oc.Encoder(48000, 1, oc.Application.AUDIO)
    enc.set_bitrate(oc.Bitrate(64000))
    enc.set_expert_frame_duration(oc.ExpertFrameDuration.MS20)
    t = np.arange(2880) / 48000.0
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    out = enc.encode_float(pcm)
    assert oc.packet.packet_nb_frames(out) == 3
    assert oc.packet.packet_nb_samples(out, 48000) == 2880
    dec = oc.Decoder(48000, 1)
    pcm_out = dec.decode_float(out, 2880)
    assert pcm_out.shape[0] == 2880 * 1


def test_packet_soft_clip():
    mem = np.zeros(1)
    x = np.linspace(-1.4, 1.4, 480).astype(np.float32)
    oc.packet.soft_clip(x, 1, mem)
    assert np.all(np.abs(x) <= 1.0 + 1e-6)
    # monotonicity preserved in the clipped region's interior
    assert x[0] < 0 < x[-1]


def test_multistream_packet_pad_unpad():
    enc = oc.Encoder(48000, 1, oc.Application.AUDIO)
    enc.set_bitrate(oc.Bitrate(32000))
    t = np.arange(960) / 48000.0
    pcm = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    p1 = enc.encode_float(pcm)
    p2 = enc.encode_float(pcm)
    ms = oc.packet.build_self_delimited(p1) + p2
    padded = oc.packet.multistream_packet_pad(ms, len(ms) + 64, 2)
    assert len(padded) == len(ms) + 64
    unpadded = oc.packet.multistream_packet_unpad(padded, 2)
    assert unpadded == ms
    with pytest.raises(oc.OpusError):
        oc.packet.multistream_packet_pad(ms, len(ms) - 1, 2)
