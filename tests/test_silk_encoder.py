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
