"""OpusCustom: CELT-only codec at non-standard rates
(celt/modes.c opus_custom_mode_create + CUSTOM_MODES frame format).

Oracle: tools/oracle/custom_cross (libopus built with CUSTOM_MODES)."""

import os
import subprocess

import numpy as np
import pytest

from opus_codec_tpu.celt.modes import mode_create
from opus_codec_tpu.celt.opus_custom import (CustomDecoder, CustomEncoder,
                                             CustomMode)
from opus_codec_tpu.errors import OpusError

ORACLE = os.path.join(os.path.dirname(__file__), "..", "tools", "oracle",
                      "custom_cross")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="custom oracle missing")


def test_mode_validation():
    with pytest.raises(OpusError):
        CustomMode(7000, 256)      # Fs too low
    with pytest.raises(OpusError):
        CustomMode(48000, 30)      # frame too short
    with pytest.raises(OpusError):
        CustomMode(48000, 961)     # odd


def test_custom_mode_layouts():
    """Band layouts verified against opus_custom_mode_create (see
    custom_mode_check oracle runs): spot-check the derived tables."""
    m = mode_create(44100, 1024)
    assert m.nb_ebands == 22 and m.short_mdct_size == 128
    assert m.e_bands.tolist()[-3:] == [70, 90, 116]
    m16 = mode_create(16000, 320)
    assert m16.preemph1 != 0.0     # 2nd-order preemph family
    assert m16.e_bands.tolist()[-1] == 100


@pytest.mark.parametrize("fs,frame,ch", [(44100, 1024, 1), (32000, 640, 2),
                                         (11025, 256, 1)])
def test_custom_roundtrip(fs, frame, ch):
    mode = CustomMode(fs, frame)
    enc = CustomEncoder(mode, ch)
    dec = CustomDecoder(mode, ch)
    t = np.arange(frame * 15) / fs
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    if ch == 2:
        x = np.stack([x, 0.8 * x], 1)
    else:
        x = x[:, None]
    outs = []
    for i in range(15):
        f = enc.encode_float(x[i * frame:(i + 1) * frame].ravel(), 100)
        assert len(f) == 100
        y = dec.decode_float(f)
        assert enc.get_final_range() == dec.get_final_range()
        outs.append(y)
    y = np.concatenate(outs)
    lag = mode.overlap
    a = x[:len(y) - lag].ravel()
    b = y[lag:len(a) // ch * ch // ch + lag][:len(a) // ch].ravel()
    n = min(len(a), len(b))
    e = b[:n] - a[:n]
    snr = 10 * np.log10(np.dot(a[:n], a[:n]) / max(np.dot(e, e), 1e-12))
    assert snr > 15, f"custom roundtrip SNR {snr:.1f}"
    # PLC path
    y = dec.decode_float(None)
    assert y.shape == (frame, ch)


@needs_oracle
@pytest.mark.parametrize("fs,frame,ch,nbytes",
                         [(44100, 1024, 1, 120), (16000, 320, 1, 60),
                          (32000, 640, 2, 180)])
def test_custom_cross_validation(fs, frame, ch, nbytes, tmp_path):
    """Reference custom encoder -> our decoder matches the reference
    decoder (>60 dB); our encoder -> reference decoder is accepted and
    intelligible."""
    t = np.arange(frame * 20) / fs
    rng = np.random.default_rng(1)
    x = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(len(t))
    if ch == 2:
        x = np.stack([x, 0.8 * x], 1).ravel()
    pcm = np.clip(x * 32768, -32768, 32767).astype("<i2")
    fin = str(tmp_path / "in.s16")
    fbits = str(tmp_path / "a.bits")
    fref = str(tmp_path / "ref.s16")
    pcm.tofile(fin)
    mode = CustomMode(fs, frame)
    subprocess.run([ORACLE, "enc", str(fs), str(ch), str(frame),
                    str(nbytes), fin, fbits], check=True)
    bits = open(fbits, "rb").read()
    dec = CustomDecoder(mode, ch)
    ours = np.concatenate([dec.decode(bits[i * nbytes:(i + 1) * nbytes])
                           for i in range(len(bits) // nbytes)])
    subprocess.run([ORACLE, "dec", str(fs), str(ch), str(frame),
                    str(nbytes), fbits, fref], check=True)
    ref = np.fromfile(fref, "<i2").reshape(-1, ch)
    a = ref.astype(float).ravel()
    e = (ours.astype(float) - ref.astype(float)).ravel()
    snr = 10 * np.log10(max(np.dot(a, a), 1) / max(np.dot(e, e), 1e-9))
    assert snr > 60, f"decode parity {snr:.1f} dB"

    enc = CustomEncoder(mode, ch)
    fr = pcm.reshape(-1, ch)
    bits2 = b"".join(enc.encode(fr[i * frame:(i + 1) * frame].ravel(),
                                nbytes) for i in range(len(fr) // frame))
    f2 = str(tmp_path / "b.bits")
    fout = str(tmp_path / "out.s16")
    open(f2, "wb").write(bits2)
    r = subprocess.run([ORACLE, "dec", str(fs), str(ch), str(frame),
                        str(nbytes), f2, fout], capture_output=True)
    assert r.returncode == 0
    out = np.fromfile(fout, "<i2").astype(float).reshape(-1, ch)
    aa = fr.astype(float)
    best = -99.0
    for lag in range(0, 3 * mode.overlap, 4):
        n = min(len(out), len(aa)) - lag
        e = (out[lag:lag + n] - aa[:n]).ravel()
        s = 10 * np.log10(max((aa[:n] ** 2).sum(), 1)
                          / max((e * e).sum(), 1e-9))
        best = max(best, s)
    assert best > 12, f"our custom frames {best:.1f} dB via libopus"
