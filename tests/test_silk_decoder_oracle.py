"""SILK + hybrid decoder validation against reference libopus.

Pure-SILK paths must be BIT-EXACT (the SILK decoder is defined in exact
fixed-point arithmetic); hybrid paths carry the CELT float half and are
checked at float-accuracy SNR. final_range must match on every packet
(OPUS_GET_FINAL_RANGE protocol checksum).
"""
import os
import struct
import subprocess

import numpy as np
import pytest

from opus_codec_tpu.opus.decoder import OpusDecoder

ORACLE = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                      "build")
DEMO = os.path.join(ORACLE, "opus_demo")

pytestmark = pytest.mark.skipif(not os.path.exists(DEMO),
                                reason="oracle binaries missing")


def _speech(path, seconds=0.6, channels=1, seed=3):
    fs = 48000
    n = int(seconds * fs)
    t = np.arange(n)
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.5 * t / fs)
    phase = np.cumsum(2 * np.pi * f0 / fs)
    sig = 0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase) \
        + 0.1 * np.sin(3 * phase)
    sig *= 0.5 + 0.5 * np.sin(2 * np.pi * 4 * t / fs) ** 2
    rng = np.random.default_rng(seed)
    sig += 0.02 * rng.standard_normal(n)
    pcm = np.clip(sig * 20000, -32767, 32767).astype("<i2")
    if channels == 2:
        pcm = np.stack([pcm, (pcm * 0.8).astype("<i2")], 1).ravel()
    pcm.tofile(path)


def _read_bitstream(path):
    data = open(path, "rb").read()
    pos = 0
    pkts = []
    while pos < len(data):
        ln, rng = struct.unpack(">II", data[pos:pos + 8])
        pos += 8
        pkts.append((data[pos:pos + ln], rng))
        pos += ln
    return pkts


CASES = [
    # name, extra args, channels, exact
    ("silk_nb", ["-bandwidth", "NB"], 1, True),
    ("silk_mb", ["-bandwidth", "MB"], 1, True),
    ("silk_wb", ["-bandwidth", "WB"], 1, True),
    ("silk_wb_st", ["-bandwidth", "WB"], 2, True),
    ("silk_10ms", ["-bandwidth", "WB", "-framesize", "10"], 1, True),
    ("silk_40ms", ["-bandwidth", "WB", "-framesize", "40"], 1, True),
    ("silk_60ms", ["-bandwidth", "WB", "-framesize", "60"], 1, True),
    ("silk_fec", ["-bandwidth", "WB", "-inbandfec", "-loss", "10"], 1, True),
    ("silk_dtx", ["-bandwidth", "WB", "-dtx"], 1, True),
    ("hybrid_swb", ["-bandwidth", "SWB"], 1, False),
    ("hybrid_fb", ["-bandwidth", "FB"], 2, False),
]


@pytest.mark.parametrize("name,extra,channels,exact", CASES)
def test_silk_decode(tmp_path, name, extra, channels, exact):
    raw = str(tmp_path / "in.sw")
    bit = str(tmp_path / "out.bit")
    refp = str(tmp_path / "ref.sw")
    _speech(raw, channels=channels)
    bitrate = "24000" if channels == 1 else "40000"
    app = "audio" if name.startswith("hybrid") else "voip"
    subprocess.run([DEMO, "-e", app, "48000", str(channels), bitrate]
                   + extra + [raw, bit], check=True, capture_output=True)
    subprocess.run([DEMO, "-d", "48000", str(channels), bit, refp],
                   check=True, capture_output=True)
    pkts = _read_bitstream(bit)
    dec = OpusDecoder(48000, channels)
    out = []
    for p, er in pkts:
        pcm = dec.decode_float(p, 5760)
        out.append(pcm)
        if len(p) > 1:
            assert dec.get_final_range() == er, \
                f"{name}: final_range mismatch"
    mine = np.concatenate(out).ravel()
    ref = np.fromfile(refp, dtype="<i2").astype(np.float64) / 32768
    n = min(len(mine), len(ref))
    err = mine[:n] - ref[:n]
    snr = 10 * np.log10(max(np.dot(ref[:n], ref[:n]), 1e-30)
                        / max(np.dot(err, err), 1e-30))
    if exact:
        maxdiff = int(np.abs(np.round(mine[:n] * 32768)
                             - np.round(ref[:n] * 32768)).max())
        assert maxdiff == 0, f"{name}: not bit-exact (maxdiff {maxdiff})"
    else:
        assert snr > 30, f"{name}: SNR {snr:.1f} dB too low"


def test_silk_plc(tmp_path):
    """Packet loss path: PLC + conditional-coding recovery stays sane."""
    raw = str(tmp_path / "in.sw")
    bit = str(tmp_path / "out.bit")
    _speech(raw)
    subprocess.run([DEMO, "-e", "voip", "48000", "1", "24000",
                    "-bandwidth", "WB", raw, bit], check=True,
                   capture_output=True)
    pkts = _read_bitstream(bit)
    dec = OpusDecoder(48000, 1)
    for i, (p, er) in enumerate(pkts):
        if i % 4 == 2:
            out = dec.decode_float(None, 960)  # lost
        else:
            out = dec.decode_float(p, 5760)
        assert np.all(np.isfinite(out))
        assert np.abs(out).max() < 2.0
