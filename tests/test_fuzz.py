"""Randomized robustness tests.

Mirrors the reference's fuzz strategy (SURVEY §4): fuzz_encoder_settings
(opus/tests/test_opus_encode.c:211-284 — randomized bitrate/channels/
complexity/FEC/DTX/frame size per iteration) and garbage-packet decoding
(test_opus_decode.c:51 test_decoder_code0 — the decoder must survive
arbitrary and structured-random packets without crashing).
"""
import numpy as np
import pytest

import opus_codec_tpu as oc
from opus_codec_tpu.errors import OpusError

RATES = [8000, 12000, 16000, 24000, 48000]
APPS = [oc.Application.VOIP, oc.Application.AUDIO,
        oc.Application.RESTRICTED_LOW_DELAY]
QMS = [10, 20, 40, 80, 160, 240, 320, 400, 480]


def test_fuzz_encoder_settings():
    """150 iterations of randomized settings; every encode must produce
    a packet our decoder accepts (or raise a typed OpusError)."""
    rng = np.random.default_rng(1234)
    encoded = 0
    for it in range(150):
        ch = int(rng.integers(1, 3))
        fs = int(rng.choice(RATES))
        enc = oc.Encoder(fs, ch, APPS[int(rng.integers(0, 3))])
        try:
            enc.set_complexity(int(rng.integers(0, 11)))
            enc.set_bitrate(oc.Bitrate(int(rng.integers(6000, 512001))))
            enc.set_vbr(bool(rng.integers(0, 2)))
            enc.set_vbr_constraint(bool(rng.integers(0, 2)))
            enc.set_inband_fec(bool(rng.integers(0, 2)))
            enc.set_dtx(bool(rng.integers(0, 2)))
            enc.set_packet_loss_perc(int(rng.integers(0, 101)))
            if ch == 2:
                enc.set_force_channels(
                    [None, 1, 2][int(rng.integers(0, 3))])
            qms = int(rng.choice(QMS))
            n = qms * fs // 4000
            pcm = (rng.standard_normal(n * ch) * 0.2).astype(np.float32)
            out = enc.encode_float(pcm, 1500)
            assert 1 <= len(out) <= 1500
            dec = oc.Decoder(fs, ch)
            res = dec.decode_float(out, n)
            assert res.shape[0] == n
            encoded += 1
        except OpusError:
            pass    # typed errors are part of the API contract
    assert encoded >= 100     # the vast majority must succeed


def test_decode_arbitrary_garbage():
    """Arbitrary byte strings never raise anything but OpusError."""
    rng = np.random.default_rng(99)
    dec = oc.Decoder(48000, 2)
    survived = 0
    for _ in range(300):
        ln = int(rng.integers(1, 400))
        data = bytes(rng.integers(0, 256, ln, dtype=np.uint8))
        try:
            out = dec.decode(data, 5760)
            assert out.shape[0] <= 5760
            survived += 1
        except OpusError:
            pass
    assert survived > 0


def test_decode_structured_garbage_code0():
    """test_decoder_code0 semantics: every TOC config with random
    payload must decode to the TOC-implied sample count or raise a
    typed error — never crash, never emit non-finite samples."""
    rng = np.random.default_rng(7)
    for config in range(32):
        for stereo in (0, 1):
            toc = (config << 3) | (stereo << 2)    # code 0
            dec = oc.Decoder(48000, 2)
            for ln in (1, 2, 10, 100):
                data = bytes([toc]) + bytes(
                    rng.integers(0, 256, ln - 1, dtype=np.uint8))
                try:
                    out = dec.decode_float(data, 5760)
                except OpusError:
                    continue
                assert np.all(np.isfinite(out))
                assert out.shape[0] <= 5760


def test_decode_zero_and_plc_interleaved():
    """Alternating valid packets, loss, and garbage keeps the decoder
    state machine alive (opus_decode_frame transitions + PLC)."""
    enc = oc.Encoder(48000, 1, oc.Application.VOIP)
    enc.set_bitrate(oc.Bitrate(16000))
    enc.set_complexity(2)
    dec = oc.Decoder(48000, 1)
    rng = np.random.default_rng(5)
    t = np.arange(960) / 48000.0
    for i in range(20):
        pcm = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
        pkt = enc.encode_float(pcm)
        r = rng.random()
        try:
            if r < 0.3:
                out = dec.decode_float(b"", 960)      # PLC
            elif r < 0.5:
                bad = bytes([pkt[0]]) + bytes(
                    rng.integers(0, 256, max(1, len(pkt) - 1),
                                 dtype=np.uint8))
                out = dec.decode_float(bad, 960)
            else:
                out = dec.decode_float(pkt, 960)
            assert np.all(np.isfinite(out))
        except OpusError:
            pass
