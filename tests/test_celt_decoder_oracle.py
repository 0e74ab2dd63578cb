"""End-to-end CELT decoder validation against the reference libopus.

Encodes test audio with the reference opus_demo (restricted-lowdelay =
CELT-only), decodes the bitstream with our decoder, and checks:
  * final_range equality on EVERY packet (bit-exact symbol parse — the
    protocol-level equivalence checksum, OPUS_GET_FINAL_RANGE)
  * SNR vs the reference decoder's own output
  * the official opus_compare 21-band spectral metric (conformance gate)

Mirrors the role of opus/tests/run_vectors.sh (SURVEY.md §4B) using locally
generated vectors (official RFC 8251 vectors are not redistributable).
"""
import os
import struct
import subprocess

import numpy as np
import pytest

from opus_codec_tpu.bitstream import packet as pkt
from opus_codec_tpu.celt.decoder import CeltDecoder

ORACLE = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                      "build")
DEMO = os.path.join(ORACLE, "opus_demo")
COMPARE = os.path.join(ORACLE, "opus_compare")

pytestmark = pytest.mark.skipif(not os.path.exists(DEMO),
                                reason="oracle binaries missing")


def _gen_audio(path, seconds, channels, seed=3):
    rng = np.random.default_rng(seed)
    fs = 48000
    n = int(seconds * fs)
    t = np.arange(n)
    chans = []
    for c in range(channels):
        x = (0.5 * np.sin(2 * np.pi * (220 * (c + 1)
                                       + 2000 * t / n) * t / fs)
             + 0.3 * np.sin(2 * np.pi * 700 * t / fs)
             + 0.04 * rng.standard_normal(n))
        # click transients
        clicks = np.zeros(n)
        for p in rng.integers(0, n - 500, 6):
            clicks[p:p + 300] += np.exp(-np.arange(300) / 30.0) \
                * rng.standard_normal(300) * 0.6
        chans.append(x * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t / fs))
                     + clicks)
    pcm = np.stack(chans, 1).ravel()
    np.clip(pcm * 16000, -32767, 32767).astype("<i2").tofile(path)


def _read_bitstream(path):
    data = open(path, "rb").read()
    pos = 0
    packets = []
    while pos < len(data):
        ln, rng = struct.unpack(">II", data[pos:pos + 8])
        pos += 8
        packets.append((data[pos:pos + ln], rng))
        pos += ln
    return packets


END_BAND = {1101: 13, 1102: 17, 1103: 17, 1104: 19, 1105: 21}


def _decode_ours(bitfile, channels, frame_size):
    dec = CeltDecoder(48000, channels)
    out = []
    for p, enc_rng in _read_bitstream(bitfile):
        parsed = pkt.parse_packet(p)
        toc = pkt.Toc.parse(parsed.toc)
        dec.end = END_BAND[int(toc.bandwidth)]
        dec.stream_channels = toc.channels
        pcm = dec.decode_with_ec(parsed.frames[0], frame_size)
        out.append(pcm.T)
        assert dec.rng == enc_rng, "final_range mismatch: symbol parse broken"
    return np.concatenate(out).ravel()


@pytest.mark.parametrize("channels,bitrate,fms,fsize,cbr", [
    (1, 64000, "20", 960, True),
    (2, 96000, "20", 960, False),
    (2, 96000, "10", 480, False),
    (2, 96000, "5", 240, False),
    (2, 96000, "2.5", 120, False),
    (1, 32000, "20", 960, False),    # low rate: folding/noise paths
    (2, 510000, "20", 960, False),   # max rate
])
def test_celt_decode_matches_reference(tmp_path, channels, bitrate, fms,
                                       fsize, cbr):
    raw = str(tmp_path / "in.sw")
    bit = str(tmp_path / "out.bit")
    refpcm = str(tmp_path / "ref.sw")
    _gen_audio(raw, 0.5, channels)
    cmd = [DEMO, "-e", "restricted-lowdelay", "48000", str(channels),
           str(bitrate), "-framesize", fms]
    if cbr:
        cmd.append("-cbr")
    subprocess.run(cmd + [raw, bit], check=True, capture_output=True)
    subprocess.run([DEMO, "-d", "48000", str(channels), bit, refpcm],
                   check=True, capture_output=True)

    mine = _decode_ours(bit, channels, fsize)
    ref = np.fromfile(refpcm, dtype="<i2").astype(np.float64) / 32768
    n = min(len(mine), len(ref))
    err = mine[:n] - ref[:n]
    snr = 10 * np.log10(np.dot(ref[:n], ref[:n])
                        / max(np.dot(err, err), 1e-30))
    assert snr > 40, f"SNR vs reference decoder too low: {snr:.1f} dB"

    # official conformance metric. opus_compare reads file1 as stereo
    # always (downmixing for mono tests, opus_compare.c:232-235), so
    # duplicate mono references into stereo.
    minepcm = str(tmp_path / "mine.sw")
    np.clip(np.round(mine * 32768), -32768, 32767).astype("<i2") \
        .tofile(minepcm)
    ref1 = str(tmp_path / "ref_st.sw")
    ref_i = np.fromfile(refpcm, dtype="<i2")
    if channels == 1:
        np.repeat(ref_i, 2).tofile(ref1)
    else:
        ref1 = refpcm
    cmd = [COMPARE] + (["-s"] if channels == 2 else []) + \
        ["-r", "48000", ref1, minepcm]
    r = subprocess.run(cmd, capture_output=True, text=True)
    assert r.returncode == 0, f"opus_compare failed:\n{r.stdout}{r.stderr}"


def test_celt_decode_plc_and_silence(tmp_path):
    """Lost packets and garbage don't crash; state machine stays sane."""
    raw = str(tmp_path / "in.sw")
    bit = str(tmp_path / "out.bit")
    _gen_audio(raw, 0.2, 1)
    subprocess.run([DEMO, "-e", "restricted-lowdelay", "48000", "1", "64000",
                    raw, bit], check=True, capture_output=True)
    packets = _read_bitstream(bit)
    dec = CeltDecoder(48000, 1)
    dec.end = 21
    rng = np.random.default_rng(0)
    for i, (p, _) in enumerate(packets):
        frame = pkt.parse_packet(p).frames[0]
        if i % 3 == 1:
            out = dec.decode_with_ec(None, 960)     # packet loss -> PLC
        elif i % 7 == 3:
            garbage = bytes(rng.integers(0, 256, len(frame), dtype=np.uint8))
            try:
                out = dec.decode_with_ec(garbage, 960)
            except Exception:
                pytest.fail("garbage packet must not raise")
        else:
            out = dec.decode_with_ec(frame, 960)
        assert out.shape == (1, 960)
        assert np.all(np.isfinite(out))
