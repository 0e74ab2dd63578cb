"""Automatic mode/bandwidth/channel/DTX decisions
(opus_encoder.c:1057-1553 engine driven by the tonality analysis)."""

import numpy as np
import pytest

import opus_codec_tpu as oc

from opus_codec_tpu import Decoder, Encoder
from opus_codec_tpu.types import Application, Bandwidth, Bitrate, Signal

FS = 48000


def _voice(seconds=2.0, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * FS)) / FS
    env = np.clip(np.sin(2 * np.pi * 4 * t), 0, 1)
    return (env * 0.3 * np.sin(2 * np.pi * 300 * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)


def _music(seconds=2.0):
    t = np.arange(int(seconds * FS)) / FS
    return sum(0.1 * np.sin(2 * np.pi * f * t + i) for i, f in
               enumerate([220, 277, 330, 415, 523, 622])).astype(np.float32)


def _modes(pkts):
    return ['SILK' if p[0] >> 3 < 12 else
            'HYB' if p[0] >> 3 < 16 else 'CELT' for p in pkts]


def _run(enc, sig, fsz=960, dec=None):
    pkts = []
    for i in range(len(sig) // fsz):
        p = enc.encode_float(sig[i * fsz:(i + 1) * fsz])
        if dec is not None:
            dec.decode_float(p, fsz)
            assert enc.get_final_range() == dec.get_final_range() \
                or enc.get_final_range() == 0
        pkts.append(p)
    return pkts


def test_auto_mode_voice_vs_music():
    """Analysis steers voice to SILK/hybrid and music to CELT at the
    same bitrate/application (verified against reference thresholds)."""
    enc_v = Encoder(FS, 1, Application.VOIP)
    enc_v.set_bitrate(Bitrate(24000))
    mv = _modes(_run(enc_v, _voice(), dec=Decoder(FS, 1)))
    enc_m = Encoder(FS, 1, Application.VOIP)
    enc_m.set_bitrate(Bitrate(24000))
    mm = _modes(_run(enc_m, _music(), dec=Decoder(FS, 1)))
    assert set(mv[-20:]) <= {'SILK', 'HYB'}
    assert set(mm[-20:]) == {'CELT'}


def test_mode_hysteresis_limits_switching():
    """One content change -> at most a couple of mode switches, and the
    mixed stream stays decodable with matching final_range."""
    sig = np.concatenate([_music(), _voice()])
    enc = Encoder(FS, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    modes = _modes(_run(enc, sig, dec=Decoder(FS, 1)))
    switches = sum(1 for a, b in zip(modes, modes[1:]) if a != b)
    assert switches <= 3


def test_forced_signal_overrides_analysis():
    enc = Encoder(FS, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    enc.set_signal(Signal.VOICE)
    m = _modes(_run(enc, _music(), dec=Decoder(FS, 1)))
    assert set(m[5:]) <= {'SILK', 'HYB'}   # music forced to voice modes
    enc2 = Encoder(FS, 1, Application.VOIP)
    enc2.set_bitrate(Bitrate(24000))
    enc2.set_signal(Signal.MUSIC)
    m2 = _modes(_run(enc2, _voice(), dec=Decoder(FS, 1)))
    assert set(m2[5:]) == {'CELT'}


def test_opus_level_dtx():
    """Speech then silence with DTX -> 1-byte TOC-only packets after
    ~400 ms of inactivity, bounded runs (decide_dtx_mode)."""
    enc = Encoder(FS, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    enc.set_dtx(True)
    sig = np.concatenate([_voice(1.0), np.zeros(2 * FS, np.float32)])
    sizes = [len(p) for p in _run(enc, sig)]
    n_dtx = sum(1 for s in sizes if s == 1)
    assert n_dtx > 40                      # most of the 100 silent frames
    assert any(s > 1 for s in sizes[50:])  # periodic refresh frames
    assert all(s > 1 for s in sizes[:51])  # no DTX during speech+hangover


def test_low_rate_stereo_folds_to_mono():
    """14 kb/s stereo input -> mono stream packets below the stereo
    threshold (opus_encoder.c:1302-1312), decodable as stereo."""
    enc = Encoder(FS, 2, Application.VOIP)
    enc.set_bitrate(Bitrate(14000))
    dec = Decoder(FS, 2)
    v = _voice()
    st = np.stack([v, 0.9 * v], 1).ravel()
    pkts = []
    for i in range(len(v) // 960):
        p = enc.encode_float(st[2 * i * 960:2 * (i + 1) * 960])
        y = dec.decode_float(p, 960)
        assert y.shape == (960, 2)
        assert enc.get_final_range() == dec.get_final_range()
        pkts.append(p)
    assert all((p[0] >> 2) & 1 == 0 for p in pkts)   # mono TOC
    # and a high-rate stereo encoder stays stereo
    enc2 = Encoder(FS, 2, Application.VOIP)
    enc2.set_bitrate(Bitrate(28000))
    enc2.set_signal(Signal.VOICE)
    p2 = [enc2.encode_float(st[2 * i * 960:2 * (i + 1) * 960])
          for i in range(20)]
    assert (p2[-1][0] >> 2) & 1 == 1


def test_hybrid_multiframe_40ms():
    """40 ms voice at hybrid rates -> code-3 packet of two 20 ms hybrid
    frames; final_range protocol (last frame's rng) matches decoder."""
    enc = Encoder(FS, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    enc.set_signal(Signal.VOICE)
    dec = Decoder(FS, 1)
    v = _voice()
    ok = 0
    n = len(v) // 1920
    for i in range(n):
        p = enc.encode_float(v[i * 1920:(i + 1) * 1920])
        dec.decode_float(p, 1920)
        ok += enc.get_final_range() == dec.get_final_range()
    assert ok == n


def test_detected_bandwidth_floor_in_silk_mode():
    """Narrowband noise at 24 kb/s: detected bandwidth caps coding
    bandwidth, but SILK mode never drops below WB
    (opus_encoder.c:1516-1521)."""
    rng = np.random.default_rng(5)
    n = 2 * FS
    spec = np.fft.rfft(rng.standard_normal(n))
    spec[np.fft.rfftfreq(n, 1 / FS) > 3000] = 0
    x = np.fft.irfft(spec)
    x = (np.round(0.25 * x / np.abs(x).max() * 32768) / 32768) \
        .astype(np.float32)
    enc = Encoder(FS, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    enc.set_lsb_depth(16)
    cfgs = {p[0] >> 3 for p in _run(enc, x, dec=Decoder(FS, 1))[10:]}
    assert cfgs <= {8, 9, 10, 11}          # SILK-WB configs


def test_user_bandwidth_still_wins():
    enc = Encoder(FS, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    enc.set_bandwidth(Bandwidth.NARROWBAND)
    pkts = _run(enc, _voice(1.0), dec=Decoder(FS, 1))
    assert {p[0] >> 3 for p in pkts[2:]} <= {0, 1, 2, 3}   # SILK-NB


def test_fec_decision_and_lbrr():
    """decide_fec: at 25% loss/16 kb/s, bandwidth drops until LBRR
    fits and packets carry LBRR (opus_encoder.c:811-842)."""
    from opus_codec_tpu.bitstream.packet import packet_has_lbrr
    enc = Encoder(FS, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(16000))
    enc.set_inband_fec(True)
    enc.set_packet_loss_perc(25)
    dec = Decoder(FS, 1)
    v = _voice()
    cfgs = set()
    lbrr = 0
    for i in range(len(v) // 960):
        p = enc.encode_float(v[i * 960:(i + 1) * 960])
        dec.decode_float(p, 960)
        cfgs.add(p[0] >> 3)
        lbrr += packet_has_lbrr(p)
    assert cfgs <= set(range(0, 8))        # NB/MB after FEC reduction
    assert lbrr > 30                       # LBRR on active frames
    # low rate where no bandwidth affords FEC -> FEC off, bw kept
    enc2 = Encoder(FS, 1, Application.VOIP)
    enc2.set_bitrate(Bitrate(9000))
    enc2.set_inband_fec(True)
    enc2.set_packet_loss_perc(25)
    p2 = [enc2.encode_float(v[i * 960:(i + 1) * 960]) for i in range(20)]
    from opus_codec_tpu.bitstream.packet import packet_has_lbrr as hl
    assert sum(hl(p) for p in p2) == 0


def test_forced_mode_switch_with_prefill():
    """CELT->SILK switch reinitializes+warms SILK; stream stays
    decodable with matching final_range through the transition."""
    enc = Encoder(FS, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    dec = Decoder(FS, 1)
    m = _music()
    v = _voice()
    modes = []
    for i in range(100):
        enc.set_signal(Signal.MUSIC if i < 50 else Signal.VOICE)
        sig = m if i < 50 else v
        p = enc.encode_float(sig[i * 960:(i + 1) * 960])
        dec.decode_float(p, 960)
        assert enc.get_final_range() in (0, dec.get_final_range())
        modes.append('C' if p[0] >> 3 >= 16 else 'S/H')
    assert modes[49] == 'C' and modes[55] == 'S/H'


def test_bandwidth_transition_lp_ramp():
    """Forcing NB on a running WB encoder ramps the variable LP over
    ~128 frames before switching one internal rate step at a time
    (silk/control_audio_bandwidth.c + LP_variable_cutoff.c)."""
    fs = 16000
    rng = np.random.default_rng(11)
    t = np.arange(5 * fs) / fs
    env = np.clip(np.sin(2 * np.pi * 4 * t), 0, 1)
    v = (env * 0.3 * np.sin(2 * np.pi * 250 * t)
         + 0.04 * rng.standard_normal(len(t))).astype(np.float32)
    enc = Encoder(fs, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    dec = Decoder(fs, 1)
    cfgs = []
    for i in range(len(t) // 320):
        if i == 30:
            enc.set_bandwidth(Bandwidth.NARROWBAND)
        p = enc.encode_float(v[i * 320:(i + 1) * 320])
        dec.decode_float(p, 320)
        assert enc.get_final_range() in (0, dec.get_final_range())
        cfgs.append(p[0] >> 3)
    # stays WB during the ramp, then steps down (WB configs 8-11,
    # MB 4-7); no immediate jump at frame 30
    assert cfgs[35] >= 8
    assert cfgs[-1] < 8
    first_drop = next(i for i, c in enumerate(cfgs) if c < 8)
    assert first_drop > 100        # LP ramp ran first (~128 frames)


def test_mode_switch_redundancy_frames():
    """Mode switches carry 5 ms redundant CELT frames in both
    directions; final_range = rng ^ redundant_rng matches between
    encoder and decoder, proving bit-exact redundancy decode
    (opus_encoder.c:2167-2341 / opus_decoder.c:453-480,654)."""
    enc = Encoder(FS, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    dec = Decoder(FS, 1)
    m = _music(4.0)
    v = _voice(4.0)
    modes = []
    sizes = []
    for i in range(200):
        voicey = 60 <= i < 130
        enc.set_signal(Signal.VOICE if voicey else Signal.MUSIC)
        sig = v if voicey else m
        p = enc.encode_float(sig[i * 960:(i + 1) * 960])
        dec.decode_float(p, 960)
        assert enc.get_final_range() in (0, dec.get_final_range()), i
        modes.append('C' if p[0] >> 3 >= 16 else 'V')
        sizes.append(len(p))
    # both switch directions happened
    assert modes[55] == 'C' and modes[65] == 'V'
    assert modes[125] == 'V' and modes[135] == 'C'
    # the switch frames are larger (carry the redundant CELT frame)
    sw1 = next(i for i in range(58, 70) if modes[i] == 'V')
    assert sizes[sw1] > np.mean(sizes[62:70]) * 1.2


# ---- mode-switch streams vs the reference decoder --------------------------

import os
import struct
import subprocess

_ORACLE = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                       "build")
_DEMO = os.path.join(_ORACLE, "opus_demo")


@pytest.mark.skipif(not os.path.exists(_DEMO),
                    reason="reference opus_demo oracle not built")
@pytest.mark.parametrize("channels", [1, 2])
def test_mode_switch_stream_reference_decode(channels):
    """Streams that switch CELT<->SILK/hybrid (with redundancy frames)
    must decode cleanly in the reference decoder with zero range-coder
    mismatches, and our decoder must reproduce every final_range
    (opus_encoder.c:2237-2341 redundancy, :2289-2297 prefill)."""
    enc = oc.Encoder(48000, channels, oc.Application.AUDIO)
    enc.set_bitrate(oc.Bitrate(26000 * channels))
    enc.set_complexity(2)
    n = 960
    packets = []
    nswitch = 0
    prev_celt = None
    for i in range(30):
        t = (np.arange(n) + i * n) / 48000.0
        if (i // 6) % 2 == 0:
            enc.set_signal(oc.Signal.MUSIC)
            seg = 0.4 * np.sin(2 * np.pi * 440 * t) \
                + 0.3 * np.sin(2 * np.pi * 1237 * t)
        else:
            enc.set_signal(oc.Signal.VOICE)
            seg = 0.3 * np.sin(2 * np.pi * 220 * t) \
                * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
        pcm = np.tile(seg.astype(np.float32), (channels, 1))
        if channels == 2:
            pcm[1] *= 0.8
        out = enc.encode_float(pcm.T.reshape(-1) if channels == 2
                               else pcm[0])
        is_celt = out[0] >> 3 >= 16
        if prev_celt is not None and is_celt != prev_celt:
            nswitch += 1
        prev_celt = is_celt
        packets.append((out, enc.final_range))
    assert nswitch >= 2, "stream did not provoke mode switches"
    bit = b"".join(struct.pack(">II", len(p), fr) + p
                   for p, fr in packets)
    bitf = f"/tmp/modeswitch_{channels}.bit"
    with open(bitf, "wb") as f:
        f.write(bit)
    r = subprocess.run(
        [_DEMO, "-d", "48000", str(channels), bitf,
         f"/tmp/modeswitch_{channels}.dec"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "error" not in (r.stdout + r.stderr).lower()
    dec = oc.Decoder(48000, channels)
    for j, (p, fr) in enumerate(packets):
        dec.decode_float(p, 5760)
        assert dec.get_final_range() == fr or fr == 0, f"packet {j}"
