"""Framework CLIs: opus_codec_tpu.demo / opus_codec_tpu.compare.

The demo mirrors opus_demo (opus/src/opus_demo.c:116-144 usage surface and
bitstream framing) and compare mirrors opus_compare (opus_compare.c) — the
conformance gate runs without any reference-built binaries.  When the
reference oracle binaries are present, cross-check the metric against the
C tool.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

_ORACLE = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                       "build")
_C_COMPARE = os.path.join(_ORACLE, "opus_compare")
_C_DEMO = os.path.join(_ORACLE, "opus_demo")


def _gen_pcm(path, seconds=0.6, stereo=True):
    t = np.arange(int(48000 * seconds)) / 48000.0
    l = 0.5 * np.sin(2 * np.pi * 440 * t)
    r = 0.4 * np.sin(2 * np.pi * 554 * t)
    pcm = np.stack([l, r], 1).reshape(-1) if stereo else l
    np.clip(pcm * 32767, -32768, 32767).astype("<i2").tofile(path)


def _run(args):
    return subprocess.run([sys.executable, "-m"] + args,
                          capture_output=True, text=True)


def test_demo_encode_decode_roundtrip(tmp_path):
    pcm = tmp_path / "in.sw"
    bit = tmp_path / "out.bit"
    dec = tmp_path / "dec.sw"
    _gen_pcm(str(pcm))
    r = _run(["opus_codec_tpu.demo", "-e", "audio", "48000", "2",
              "96000", "-complexity", "2", str(pcm), str(bit)])
    assert r.returncode == 0, r.stderr
    assert bit.stat().st_size > 0
    r = _run(["opus_codec_tpu.demo", "-d", "48000", "2", str(bit),
              str(dec)])
    assert r.returncode == 0, r.stderr   # zero final_range mismatches
    assert dec.stat().st_size == pcm.stat().st_size


def test_demo_flag_surface(tmp_path):
    pcm = tmp_path / "in.sw"
    bit = tmp_path / "out.bit"
    _gen_pcm(str(pcm), seconds=0.2, stereo=False)
    r = _run(["opus_codec_tpu.demo", "-e", "voip", "48000", "1",
              "24000", "-cbr", "-complexity", "2", "-framesize", "10",
              "-bandwidth", "WB", "-inbandfec", "-loss", "5",
              str(pcm), str(bit)])
    assert r.returncode == 0, r.stderr
    r = _run(["opus_codec_tpu.demo", "-d", "48000", "1", str(bit),
              str(tmp_path / "dec.sw")])
    assert r.returncode == 0, r.stderr


def test_compare_self_passes(tmp_path):
    pcm = tmp_path / "in.sw"
    _gen_pcm(str(pcm))
    r = _run(["opus_codec_tpu.compare", "-s", str(pcm), str(pcm)])
    assert r.returncode == 0
    assert "PASSES" in r.stderr


def test_compare_detects_garbage(tmp_path):
    pcm = tmp_path / "in.sw"
    bad = tmp_path / "bad.sw"
    _gen_pcm(str(pcm))
    n = os.path.getsize(str(pcm)) // 2
    rng = np.random.default_rng(0)
    (rng.integers(-20000, 20000, n // 2)
     .astype("<i2").tofile(str(bad)))
    r = _run(["opus_codec_tpu.compare", "-s", str(pcm), str(bad)])
    assert r.returncode == 1


@pytest.mark.skipif(not os.path.exists(_C_COMPARE),
                    reason="reference opus_compare oracle not built")
def test_compare_matches_reference_tool(tmp_path):
    """Our metric must agree with the C opus_compare on the same inputs
    (same verdict, error within 0.1%)."""
    pcm = tmp_path / "in.sw"
    bit = tmp_path / "out.bit"
    dec = tmp_path / "dec.sw"
    _gen_pcm(str(pcm))
    r = _run(["opus_codec_tpu.demo", "-e", "audio", "48000", "2",
              "96000", "-complexity", "2", str(pcm), str(bit)])
    assert r.returncode == 0, r.stderr
    subprocess.run([_C_DEMO, "-d", "48000", "2", str(bit), str(dec)],
                   capture_output=True, check=True)
    rc = subprocess.run([_C_COMPARE, "-s", str(pcm), str(dec)],
                        capture_output=True, text=True)
    rp = _run(["opus_codec_tpu.compare", "-s", str(pcm), str(dec)])
    import re
    err_c = float(re.search(r"error is ([0-9.]+)", rc.stderr).group(1))
    err_p = float(re.search(r"error is ([0-9.]+)", rp.stderr).group(1))
    assert (rc.returncode == 0) == (rp.returncode == 0)
    assert abs(err_c - err_p) <= 2e-3 * max(err_c, 1e-6) + 1e-4


def test_compare_matches_oracle_binary(tmp_path):
    """compare.py's quality metric must agree with the reference
    opus_compare binary on identical PCM pairs (opus_compare.c:153-382)
    — both the printed percentage and the pass/fail exit status."""
    import re
    import subprocess

    import pytest

    binp = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "oracle", "build", "opus_compare")
    if not os.path.exists(binp):
        pytest.skip("oracle build absent")
    rng = np.random.default_rng(5)
    n = 48000  # 1 s
    t = np.arange(n) / 48000.0
    clean = (0.3 * np.sin(2 * np.pi * 440 * t)
             + 0.1 * np.sin(2 * np.pi * 1730 * t)
             + 0.02 * rng.standard_normal(n))
    for noise_amp in (0.001, 0.01):
        degr = clean + noise_amp * rng.standard_normal(n)
        a = tmp_path / f"a_{noise_amp}.sw"
        b = tmp_path / f"b_{noise_amp}.sw"
        # file1 is always stereo interleaved (opus_compare.c:231-236)
        st = np.stack([clean, clean], axis=1).ravel()
        (np.clip(st, -1, 1) * 32767).astype("<i2").tofile(a)
        (np.clip(degr, -1, 1) * 32767).astype("<i2").tofile(b)
        r = subprocess.run([binp, "-r", "48000", str(a), str(b)],
                           capture_output=True, text=True)
        m = re.search(r"weighted error is\s*([0-9.]+)",
                      r.stdout + r.stderr)
        assert m, (r.stdout, r.stderr)
        ref_err = float(m.group(1))

        from opus_codec_tpu import compare as cmod
        x = cmod.read_pcm16(str(a), 2)
        x = (0.5 * (x[:, 0] + x[:, 1]))[:, None]
        y = cmod.read_pcm16(str(b), 1)
        err, q = cmod.compare(x, y, 1, 48000)
        assert abs(err - ref_err) < 1e-3 * max(ref_err, 1e-6), \
            (err, ref_err, noise_amp)
        assert (q >= 0.0) == (r.returncode == 0), (q, r.returncode)
