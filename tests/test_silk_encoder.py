"""SILK encoder validation.

Stage 1 (this file, entropy half): BIT-EXACT re-encoding — decode
reference SILK packets with our bit-exact decoder, capture the
recovered side-info indices and pulses, re-encode them with
encode_entropy, and require byte-identical payloads.  This pins every
encoder-side entropy path (indices, gains, NLSF, pitch, LTP, shell
coder, LSBs, signs, rate levels, header flag patching) against
libopus-produced bitstreams.
"""
import os
import struct
import subprocess

import numpy as np
import pytest

from opus_codec_tpu.bitstream.range_coder import RangeEncoder
from opus_codec_tpu.opus.decoder import OpusDecoder
from opus_codec_tpu.silk import encode_entropy as ee

ORACLE = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                      "build")
DEMO = os.path.join(ORACLE, "opus_demo")

pytestmark = pytest.mark.skipif(not os.path.exists(DEMO),
                                reason="oracle binaries missing")

from test_silk_decoder_oracle import _read_bitstream, _speech


CASES = [
    ("wb20", ["-bandwidth", "WB"], "24000", 1),
    ("nb20", ["-bandwidth", "NB"], "16000", 1),
    ("mb20", ["-bandwidth", "MB"], "20000", 1),
    ("wb10", ["-bandwidth", "WB", "-framesize", "10"], "24000", 1),
    ("wb40", ["-bandwidth", "WB", "-framesize", "40"], "24000", 1),
    ("wb60", ["-bandwidth", "WB", "-framesize", "60"], "24000", 1),
]


@pytest.mark.parametrize("name,extra,bitrate,channels", CASES)
def test_reencode_bit_exact(tmp_path, name, extra, bitrate, channels):
    raw = str(tmp_path / "in.sw")
    bit = str(tmp_path / "out.bit")
    _speech(raw, channels=channels)
    subprocess.run([DEMO, "-e", "voip", "48000", str(channels), bitrate]
                   + extra + [raw, bit], check=True, capture_output=True)
    pkts = _read_bitstream(bit)

    dec = OpusDecoder(48000, channels)
    ch0 = dec.silk.channel_state[0]
    ec_prev_sig = 0
    ec_prev_lag = 0
    checked = 0
    for p, er in pkts:
        if len(p) < 2:
            continue
        ch0.trace = []
        dec.decode_float(p, 5760)
        trace = ch0.trace
        ch0.trace = None
        if not trace or any(ch0.LBRR_flags[:ch0.nFramesPerPacket]):
            # skip FEC-bearing packets in this stage-1 test
            ec_prev_sig = ch0.ec_prevSignalType
            ec_prev_lag = ch0.ec_prevLagIndex
            continue
        payload = p[1:]          # SILK-only code-0 packet: TOC + payload
        nfp = ch0.nFramesPerPacket
        fs_khz = ch0.fs_kHz
        nb_subfr = ch0.nb_subfr

        enc = RangeEncoder(len(payload) + 8)
        icdf0 = 256 - (256 >> ((nfp + 1) * 1))
        enc.enc_icdf(0, (icdf0, 0), 8)      # header placeholder
        for ind, pulses, cond in trace:
            ec_prev_lag = ee.encode_indices(
                enc, ind, ch0.psNLSF_CB, nb_subfr, fs_khz, cond,
                ec_prev_sig, ec_prev_lag)
            ec_prev_sig = ind.signalType
            ee.encode_pulses(enc, ind.signalType, ind.quantOffsetType,
                             pulses, ch0.frame_length)
        flags = 0
        for i in range(nfp):
            flags = (flags << 1) | int(ch0.VAD_flags[i])
        flags = (flags << 1) | int(ch0.LBRR_flag)
        enc.patch_initial_bits(flags, nfp + 1)
        enc.done()
        got = enc.data()[:len(payload)]
        assert got == payload, \
            f"{name}: payload mismatch at packet {checked}"
        assert enc.rng == er, f"{name}: final_range mismatch"
        checked += 1
    assert checked >= 10, f"{name}: only {checked} packets checked"


def test_gains_quant_roundtrip():
    """gains_quant o gains_dequant is the identity on the quantised
    values, matching the decoder's dequantiser exactly."""
    from opus_codec_tpu.silk.decoder import gains_dequant
    rng = np.random.default_rng(0)
    prev_q = 10
    prev_d = 10
    for trial in range(200):
        gains = [int(g) for g in
                 rng.integers(1 << 10, 1 << 24, 4)]
        conditional = bool(trial % 3) and trial > 0
        ind, qgains, prev_q = ee.gains_quant(gains, prev_q, conditional, 4)
        dgains, prev_d = gains_dequant(ind, prev_d, conditional, 4)
        assert qgains == dgains
        assert prev_q == prev_d
        for v in ind:
            assert 0 <= v < ee.N_LEVELS_QGAIN


def test_gains_id():
    assert ee.gains_id([1, 2, 3, 4], 4) == (((1 << 8 | 2) << 8 | 3)
                                            << 8 | 4)
    assert ee.gains_id([5], 1) == 5


# ----------------------------------------------------------------------
# Stage 2: full encoder — analysis + quantisation + NSQ

def _speech48(seconds=0.8, seed=3):
    fs = 48000
    t = np.arange(int(seconds * fs))
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.5 * t / fs)
    phase = np.cumsum(2 * np.pi * f0 / fs)
    sig = 0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase) \
        + 0.1 * np.sin(3 * phase)
    sig *= 0.5 + 0.5 * np.sin(2 * np.pi * 4 * t / fs) ** 2
    sig += 0.02 * np.random.default_rng(seed).standard_normal(len(t))
    return np.clip(sig * 20000, -32767, 32767)


@pytest.mark.parametrize("bw,internal,bitrate", [
    ("WB", 16000, 24000), ("MB", 12000, 16000), ("NB", 8000, 13000)])
def test_silk_encode_reference_decodes(tmp_path, bw, internal, bitrate):
    """Our SILK encoder's packets: (a) decode bit-exactly the same in
    our decoder and libopus (final_range protocol), (b) reconstruct the
    input with reasonable fidelity."""
    from opus_codec_tpu.silk.encoder import EncControl, SilkEncoder
    from opus_codec_tpu.bitstream import packet as pk
    from opus_codec_tpu.types import Bandwidth, CodecMode

    sw = _speech48()
    enc = SilkEncoder()
    ctl = EncControl(API_sampleRate=48000, payloadSize_ms=20,
                     bitRate=bitrate, complexity=9,
                     desiredInternalSampleRate=internal)
    bwe = {"NB": Bandwidth.NARROWBAND, "MB": Bandwidth.MEDIUMBAND,
           "WB": Bandwidth.WIDEBAND}[bw]
    toc = pk.gen_toc(CodecMode.SILK_ONLY, 50, bwe, 1)
    bit = bytearray()
    pkts = []
    for i in range(len(sw) // 960):
        re = RangeEncoder(1275)
        enc.encode(ctl, sw[i * 960:(i + 1) * 960], re, 1275)
        re.done()
        nb = (re.tell() + 7) // 8
        p = bytes([toc]) + re.data()[:nb]
        pkts.append((p, re.rng & 0xFFFFFFFF))
        bit += struct.pack(">II", len(p), re.rng & 0xFFFFFFFF) + p
    bitf = str(tmp_path / "our.bit")
    outf = str(tmp_path / "out.sw")
    open(bitf, "wb").write(bytes(bit))
    subprocess.run([DEMO, "-d", "48000", "1", bitf, outf], check=True,
                   capture_output=True)
    refout = np.fromfile(outf, dtype="<i2").astype(np.float64)

    dec = OpusDecoder(48000, 1)
    ours = []
    for p, er in pkts:
        pcm = dec.decode_float(p, 960)
        ours.append(pcm)
        assert dec.get_final_range() == er
    mine = np.concatenate(ours).ravel() * 32768
    n = min(len(mine), len(refout))
    assert int(np.abs(np.round(mine[:n]) - refout[:n]).max()) == 0, \
        "our decode != reference decode"
    # delay-aligned quality gate
    best = -99.0
    for lag in range(0, 1200, 7):
        a = sw[:n - lag]
        b = mine[lag:n]
        m = min(len(a), len(b))
        e = b[:m] - a[:m]
        s = 10 * np.log10(max(np.dot(a[:m], a[:m]), 1e-9)
                          / max(np.dot(e, e), 1e-9))
        best = max(best, s)
    assert best > 8.0, f"{bw}: aligned SNR {best:.1f} dB too low"


def test_silk_encode_frame_sizes(tmp_path):
    """10/40/60 ms payloads produce valid packets the reference
    decoder accepts (multi-frame SILK with LBRR-flag headers)."""
    from opus_codec_tpu.silk.encoder import EncControl, SilkEncoder
    from opus_codec_tpu.bitstream import packet as pk
    from opus_codec_tpu.types import Bandwidth, CodecMode
    sw = _speech48(0.96)
    for ms, framerate in ((10, 100), (40, 25), (60, 16)):
        enc = SilkEncoder()
        ctl = EncControl(API_sampleRate=48000, payloadSize_ms=ms,
                         bitRate=20000, complexity=9,
                         desiredInternalSampleRate=16000)
        toc = pk.gen_toc(CodecMode.SILK_ONLY, framerate,
                         Bandwidth.WIDEBAND, 1)
        spf = 48 * ms
        bit = bytearray()
        for i in range(len(sw) // spf):
            re = RangeEncoder(1275)
            enc.encode(ctl, sw[i * spf:(i + 1) * spf], re, 1275)
            re.done()
            nb = (re.tell() + 7) // 8
            p = bytes([toc]) + re.data()[:nb]
            bit += struct.pack(">II", len(p), re.rng & 0xFFFFFFFF) + p
        bitf = str(tmp_path / f"our{ms}.bit")
        outf = str(tmp_path / f"out{ms}.sw")
        open(bitf, "wb").write(bytes(bit))
        r = subprocess.run([DEMO, "-d", "48000", "1", bitf, outf],
                           capture_output=True)
        assert r.returncode == 0, f"{ms}ms: reference decoder rejected"
        out = np.fromfile(outf, dtype="<i2")
        assert np.abs(out.astype(np.int64)).mean() > 500, \
            f"{ms}ms: output implausibly quiet"


def test_opus_api_silk_mode():
    """Encoder selects SILK for mono VOIP at voice rates; DTX emits
    TOC-only packets; final_range agrees with the decoder."""
    from opus_codec_tpu import Decoder, Encoder
    from opus_codec_tpu.types import Application, Bitrate
    enc = Encoder(48000, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(24000))
    dec = Decoder(48000, 1)
    sw = _speech48(0.4) / 32768.0
    for i in range(len(sw) // 960):
        p = enc.encode_float(sw[i * 960:(i + 1) * 960].astype(np.float32))
        assert (p[0] >> 7) == 0, "expected SILK-mode TOC"
        y = dec.decode_float(p, 960)
        assert y.shape == (960, 1)
        assert enc.get_final_range() == dec.get_final_range()
    # music/audio app still uses CELT
    enc2 = Encoder(48000, 1, Application.AUDIO)
    p2 = enc2.encode_float(sw[:960].astype(np.float32))
    assert (p2[0] >> 7) == 1


def test_opus_api_hybrid_mode(tmp_path):
    """32 kb/s mono VOIP at 48 kHz -> hybrid packets (SILK WB + CELT
    bands 17+) that libopus decodes."""
    from opus_codec_tpu import Decoder, Encoder
    from opus_codec_tpu.types import Application, Bitrate
    fs = 48000
    t = np.arange(fs // 2)
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.5 * t / fs)
    phase = np.cumsum(2 * np.pi * f0 / fs)
    sig = (0.3 * np.sin(phase) + 0.1 * np.sin(5 * phase)
           + 0.05 * np.sin(2 * np.pi * 9000 * t / fs)).astype(np.float32)
    enc = Encoder(48000, 1, Application.VOIP)
    enc.set_bitrate(Bitrate(32000))
    from opus_codec_tpu.types import Signal
    enc.set_signal(Signal.VOICE)   # synthetic buzz reads as music
    dec = Decoder(48000, 1)
    bit = bytearray()
    for i in range(len(sig) // 960):
        p = enc.encode_float(sig[i * 960:(i + 1) * 960])
        assert (p[0] >> 5) == 0b011 or (p[0] >> 4) in (0b0110, 0b0111), \
            f"not hybrid TOC: {p[0]:#x}"
        y = dec.decode_float(p, 960)
        assert enc.get_final_range() == dec.get_final_range()
        bit += struct.pack(">II", len(p), enc.get_final_range()) + p
    bitf = str(tmp_path / "hyb.bit")
    outf = str(tmp_path / "hyb.sw")
    open(bitf, "wb").write(bytes(bit))
    r = subprocess.run([DEMO, "-d", "48000", "1", bitf, outf],
                       capture_output=True)
    assert r.returncode == 0
    out = np.fromfile(outf, dtype="<i2")
    assert np.abs(out.astype(np.int64)).mean() > 500


def test_silk_stereo_encode(tmp_path):
    """Stereo SILK (adaptive mid/side): libopus decodes our packets and
    our decoder reconstructs bit-exactly (final_range protocol)."""
    from opus_codec_tpu import Decoder, Encoder
    from opus_codec_tpu.types import Application, Bitrate
    fs = 48000
    t = np.arange(fs)
    # f0 well above the 60-100 Hz adaptive HP front-end
    f0 = 220 + 30 * np.sin(2 * np.pi * 2.5 * t / fs)
    phase = np.cumsum(2 * np.pi * f0 / fs)
    L = (0.35 * np.sin(phase) + 0.15 * np.sin(2 * phase)) \
        * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t / fs) ** 2)
    R = (0.30 * np.sin(phase + 0.3) + 0.12 * np.sin(2 * phase + 0.5)) \
        * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t / fs + 0.4) ** 2)
    sig = np.stack([L, R], 1).astype(np.float32)
    enc = Encoder(48000, 2, Application.VOIP)
    enc.set_bitrate(Bitrate(36000))
    from opus_codec_tpu.types import Signal
    enc.set_signal(Signal.VOICE)   # pin voice: tonal test signal
    dec = Decoder(48000, 2)
    bit = bytearray()
    for i in range(len(t) // 960):
        p = enc.encode_float(sig[i * 960:(i + 1) * 960].ravel())
        assert (p[0] >> 7) == 0 and ((p[0] >> 2) & 1) == 1
        y = dec.decode_float(p, 960)
        assert y.shape == (960, 2)
        assert enc.get_final_range() == dec.get_final_range()
        bit += struct.pack(">II", len(p), enc.get_final_range()) + p
    bitf = str(tmp_path / "st.bit")
    outf = str(tmp_path / "st.sw")
    open(bitf, "wb").write(bytes(bit))
    r = subprocess.run([DEMO, "-d", "48000", "2", bitf, outf],
                       capture_output=True)
    assert r.returncode == 0, "libopus rejected stereo stream"
    out = np.fromfile(outf, dtype="<i2").reshape(-1, 2).astype(np.float64)
    x = sig * 32768
    best = -99.0
    for lag in range(0, 1200, 7):
        n = min(len(out), len(x)) - lag
        a = x[:n].ravel()
        b = out[lag:lag + n].ravel()
        m = min(len(a), len(b))
        e = b[:m] - a[:m]
        s = 10 * np.log10(max(np.dot(a[:m], a[:m]), 1)
                          / max(np.dot(e, e), 1))
        best = max(best, s)
    assert best > 12.0, f"stereo SNR {best:.1f} dB"


def test_nsq_del_dec_improves_quality(tmp_path):
    """Delayed-decision NSQ (complexity >= 2) must not degrade vs the
    basic quantizer and all complexity tiers must produce valid
    reference-decodable streams."""
    from opus_codec_tpu.silk.encoder import EncControl, SilkEncoder
    from opus_codec_tpu.bitstream import packet as pk
    from opus_codec_tpu.types import Bandwidth, CodecMode
    sw = _speech48(0.6)
    toc = pk.gen_toc(CodecMode.SILK_ONLY, 50, Bandwidth.WIDEBAND, 1)

    def run(cx):
        enc = SilkEncoder()
        ctl = EncControl(API_sampleRate=48000, payloadSize_ms=20,
                         bitRate=24000, complexity=cx,
                         desiredInternalSampleRate=16000)
        bit = bytearray()
        for i in range(len(sw) // 960):
            re = RangeEncoder(1275)
            enc.encode(ctl, sw[i * 960:(i + 1) * 960], re, 1275)
            re.done()
            nb = (re.tell() + 7) // 8
            p = bytes([toc]) + re.data()[:nb]
            bit += struct.pack(">II", len(p), re.rng & 0xFFFFFFFF) + p
        bitf = str(tmp_path / f"cx{cx}.bit")
        outf = str(tmp_path / f"cx{cx}.sw")
        open(bitf, "wb").write(bytes(bit))
        r = subprocess.run([DEMO, "-d", "48000", "1", bitf, outf],
                           capture_output=True)
        assert r.returncode == 0, f"complexity {cx} stream rejected"
        out = np.fromfile(outf, dtype="<i2").astype(np.float64)
        best = -99.0
        for lag in range(0, 1200, 7):
            n = min(len(out), len(sw)) - lag
            a = sw[:n]
            b = out[lag:lag + n]
            e = b - a
            s = 10 * np.log10(max(np.dot(a, a), 1)
                              / max(np.dot(e, e), 1))
            best = max(best, s)
        return best

    s0 = run(0)
    s9 = run(9)
    assert s9 >= s0 - 0.5, f"del-dec ({s9:.1f}) worse than basic ({s0:.1f})"
    assert s9 > 10.0
