"""End-to-end CELT encoder validation.

Gates (SURVEY.md §7 phase 3):
  * our encode -> our decode roundtrip with enc/dec final_range equality
  * our encode -> REFERENCE decoder (opus_demo -d): decodes cleanly and
    matches our own decoder's output closely
  * quality parity: delay-aligned SNR vs the original within 1.5 dB of the
    reference encoder on the same signal
"""
import os
import struct
import subprocess

import numpy as np
import pytest

from opus_codec_tpu.bitstream import packet as pkt
from opus_codec_tpu.celt.decoder import CeltDecoder
from opus_codec_tpu.celt.encoder import CeltEncoder
from opus_codec_tpu.types import Bandwidth, CodecMode

ORACLE = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                      "build")
DEMO = os.path.join(ORACLE, "opus_demo")

pytestmark = pytest.mark.skipif(not os.path.exists(DEMO),
                                reason="oracle binaries missing")

FRAMERATE = {120: 400, 240: 200, 480: 100, 960: 50}


def _signal(n, channels, seed=21, transients=False):
    rng = np.random.default_rng(seed)
    fs = 48000
    t = np.arange(n)
    chans = []
    for c in range(channels):
        x = (0.4 * np.sin(2 * np.pi * 440 * (c + 1) * t / fs)
             + 0.25 * np.sin(2 * np.pi * 554.37 * t / fs)
             + 0.05 * rng.standard_normal(n))
        x *= (0.7 + 0.3 * np.sin(2 * np.pi * 3 * t / fs)) * 0.6
        if transients:
            for p in rng.integers(0, n - 600, 8):
                x[p:p + 400] += np.exp(-np.arange(400) / 35.0) \
                    * rng.standard_normal(400) * 0.5
        chans.append(x)
    return np.stack(chans)


def _aligned_snr(orig, dec, max_lag=400):
    best = -1e9
    n = orig.shape[-1]
    for lag in range(max_lag):
        nn = n - lag
        if dec.shape[-1] < lag + nn:
            nn = dec.shape[-1] - lag
        if nn <= 0:
            break
        a = orig[..., :nn].ravel()
        b = dec[..., lag:lag + nn].ravel()
        e = b - a
        snr = 10 * np.log10(np.dot(a, a) / max(np.dot(e, e), 1e-30))
        best = max(best, snr)
    return best


def _encode_ours(pcm, channels, fsize, bitrate, vbr):
    enc = CeltEncoder(48000, channels)
    enc.bitrate = bitrate
    enc.vbr = vbr
    toc0 = pkt.gen_toc(CodecMode.CELT_ONLY, FRAMERATE[fsize],
                       Bandwidth.FULLBAND, channels)
    n = pcm.shape[-1]
    nbytes_cap = 1275 if vbr else bitrate * fsize // (8 * 48000)
    packets = []
    for f in range(n // fsize):
        frame = enc.encode_with_ec(pcm[:, f * fsize:(f + 1) * fsize],
                                   fsize, nbytes_cap)
        packets.append((bytes([toc0]) + frame, enc.rng))
    return packets


def _decode_ours(packets, channels, fsize):
    dec = CeltDecoder(48000, channels)
    dec.end = 21
    out = []
    for p, enc_rng in packets:
        frame = pkt.parse_packet(p).frames[0]
        out.append(dec.decode_with_ec(frame, fsize))
        assert dec.rng == enc_rng, "enc/dec final_range mismatch"
    return np.concatenate(out, axis=-1)


def _decode_reference(packets, channels, fsize, tmp_path):
    bit = str(tmp_path / "ours.bit")
    with open(bit, "wb") as f:
        for p, rng in packets:
            f.write(struct.pack(">II", len(p), rng) + p)
    refpcm = str(tmp_path / "oursref.sw")
    r = subprocess.run([DEMO, "-d", "48000", str(channels), bit, refpcm],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "range mismatch" not in r.stderr.lower()
    raw = np.fromfile(refpcm, dtype="<i2").astype(np.float64) / 32768
    return raw.reshape(-1, channels).T


def _reference_encoder_snr(pcm, channels, fsize, bitrate, vbr, tmp_path):
    raw = str(tmp_path / "in.sw")
    np.clip(pcm.T.ravel() * 32768, -32767, 32767).astype("<i2").tofile(raw)
    bit = str(tmp_path / "refenc.bit")
    dec = str(tmp_path / "refdec.sw")
    fms = {120: "2.5", 240: "5", 480: "10", 960: "20"}[fsize]
    cmd = [DEMO, "-e", "restricted-lowdelay", "48000", str(channels),
           str(bitrate), "-framesize", fms]
    if not vbr:
        cmd.append("-cbr")
    subprocess.run(cmd + [raw, bit], check=True, capture_output=True)
    subprocess.run([DEMO, "-d", "48000", str(channels), bit, dec],
                   check=True, capture_output=True)
    r = np.fromfile(dec, dtype="<i2").astype(np.float64) / 32768
    return _aligned_snr(pcm, r.reshape(-1, channels).T)


@pytest.mark.parametrize("channels,bitrate,fsize,vbr,transients", [
    (1, 64000, 960, False, False),
    (1, 64000, 960, True, True),
    (2, 96000, 960, False, False),
    (2, 96000, 480, True, True),
    (1, 96000, 240, False, False),
    (1, 48000, 120, False, False),
    (1, 32000, 960, True, False),
])
def test_celt_encode(tmp_path, channels, bitrate, fsize, vbr, transients):
    pcm = _signal(24000, channels, transients=transients)
    packets = _encode_ours(pcm, channels, fsize, bitrate, vbr)

    # our decode, final ranges consistent
    ours = _decode_ours(packets, channels, fsize)
    # reference decoder agrees with ours
    refdec = _decode_reference(packets, channels, fsize, tmp_path)
    nn = min(ours.shape[-1], refdec.shape[-1])
    d = (ours[..., :nn] - refdec[..., :nn]).ravel()
    ref_pow = float(np.dot(ours[..., :nn].ravel(), ours[..., :nn].ravel()))
    cross_snr = 10 * np.log10(ref_pow / max(float(np.dot(d, d)), 1e-30))
    assert cross_snr > 35, f"decoders disagree on our stream: {cross_snr:.1f}"

    # quality parity with reference encoder
    snr_ours = _aligned_snr(pcm, refdec)
    snr_ref = _reference_encoder_snr(pcm, channels, fsize, bitrate, vbr,
                                     tmp_path)
    assert snr_ours > snr_ref - 1.5, \
        f"quality gap: ours {snr_ours:.1f} dB vs reference {snr_ref:.1f} dB"

    # bitrate sanity for CBR
    if not vbr:
        nbytes = bitrate * fsize // (8 * 48000)
        for p, _ in packets:
            assert len(p) == nbytes + 1


def test_celt_encode_silence():
    pcm = np.zeros((1, 960 * 5))
    enc = CeltEncoder(48000, 1)
    enc.bitrate = 64000
    enc.vbr = True
    dec = CeltDecoder(48000, 1)
    dec.end = 21
    for f in range(5):
        frame = enc.encode_with_ec(pcm[:, f * 960:(f + 1) * 960], 960, 1275)
        assert len(frame) <= 4, "silence frames should be tiny in VBR"
        out = dec.decode_with_ec(frame, 960)
        assert float(np.abs(out).max()) < 1e-4
