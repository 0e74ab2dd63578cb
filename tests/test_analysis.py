"""Tonality/music-speech analysis vs the reference (src/analysis.c).

The oracle harness tools/oracle/analysis_check.c runs the reference
run_analysis on raw f32 PCM and prints per-frame AnalysisInfo."""

import os
import subprocess

import numpy as np
import pytest

from opus_codec_tpu.opus.analysis import (DCT_TABLE, TonalityAnalysisState,
                                          _W, fast_atan2, sigmoid_approx,
                                          tansig_approx)

ORACLE = os.path.join(os.path.dirname(__file__), "..",
                      "tools", "oracle", "analysis_check")
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="oracle binary not built")


def test_tables_match_reference_literals():
    """analysis_window/dct_table equal the analysis.c:57-104 literals
    (closed forms: sin^2 window, scaled DCT-II, both rounded to 6dp)."""
    assert _W[79] == pytest.approx(0.25)
    assert _W[119] == pytest.approx(0.5)
    assert _W[239] == 1.0
    assert DCT_TABLE[0, 0] == pytest.approx(0.25)
    assert DCT_TABLE[1, 0] == pytest.approx(0.351851)
    assert DCT_TABLE[7, 15] == pytest.approx(-0.273300)


def test_mlp_weight_shapes():
    from opus_codec_tpu.opus import analysis_data as D
    assert D.LAYER0_WEIGHTS.shape == (800,) and D.LAYER0_BIAS.shape == (32,)
    assert D.LAYER1_WEIGHTS.shape == (2304,)
    assert D.LAYER1_RECUR_WEIGHTS.shape == (1728,)
    assert D.LAYER2_WEIGHTS.shape == (48,) and D.LAYER2_BIAS.shape == (2,)


def test_activation_approximations():
    x = np.linspace(-4, 4, 101)
    assert np.max(np.abs(tansig_approx(x) - np.tanh(x))) < 3e-3
    assert np.max(np.abs(sigmoid_approx(x) - 1 / (1 + np.exp(-x)))) < 2e-3
    # atan2 approx: max error ~0.005 rad over the plane
    ang = np.linspace(-np.pi, np.pi, 721)
    err = np.abs(fast_atan2(np.sin(ang).astype(np.float32),
                            np.cos(ang).astype(np.float32)) - ang)
    err = np.minimum(err, 2 * np.pi - err)
    assert err.max() < 0.01


def _run_ours(x, fs, frame):
    st = TonalityAnalysisState(fs)
    rows = []
    for i in range(len(x) // frame):
        info = st.run(x[None, i * frame:(i + 1) * frame], frame, frame, 24)
        rows.append([info.valid, info.tonality, info.tonality_slope,
                     info.noisiness, info.activity, info.music_prob,
                     info.activity_probability, info.bandwidth,
                     info.music_prob_min, info.music_prob_max])
    return np.array(rows)


def _run_oracle(x, fs, tmp_path):
    f = str(tmp_path / "a.f32")
    x.astype(np.float32).tofile(f)
    r = subprocess.run([ORACLE, str(fs), f], capture_output=True, text=True)
    return np.loadtxt(r.stdout.splitlines())


@needs_oracle
@pytest.mark.parametrize("fs", [48000, 24000, 16000])
def test_matches_reference_all_rates(fs, tmp_path):
    rng = np.random.default_rng(fs)
    t = np.arange(2 * fs) / fs
    x = (0.25 * np.sin(2 * np.pi * 440 * t)
         + 0.15 * np.sin(2 * np.pi * 662 * t)
         + 0.08 * rng.standard_normal(len(t))).astype(np.float32)
    ref = _run_oracle(x, fs, tmp_path)
    ours = _run_ours(x, fs, fs // 50)
    d = np.abs(ours - ref[:len(ours)])
    assert d[:, 0].max() == 0              # valid flag identical
    assert d[:, 7].max() == 0              # bandwidth identical
    assert d[:, 5].max() < 0.01            # music_prob
    assert d[:, 6].max() < 0.02            # activity_probability
    assert d[:, 1].max() < 0.05            # tonality
    assert d[:, [8, 9]].max() < 0.01       # music_prob_min/max


@needs_oracle
def test_matches_reference_music_speech_transition(tmp_path):
    """Mixed content: harmonic chord then syllabic buzz+noise."""
    fs = 48000
    rng = np.random.default_rng(3)
    t = np.arange(3 * fs) / fs
    music = sum(0.12 * np.sin(2 * np.pi * f * t + p) for f, p in
                [(220, 0), (277, 1), (330, 2), (440, .5), (554, 1.5)])
    env = np.clip(np.sin(2 * np.pi * 3.1 * t), 0, 1)
    f0 = 120 * (1 + 0.1 * np.sin(2 * np.pi * 2.7 * t))
    ph = np.cumsum(2 * np.pi * f0 / fs)
    speech = env * (0.3 * np.sin(ph) + 0.2 * np.sin(2 * ph)) \
        + 0.05 * rng.standard_normal(len(t)) * (1 - env)
    x = np.concatenate([music, speech]).astype(np.float32)
    ref = _run_oracle(x, fs, tmp_path)
    ours = _run_ours(x, fs, fs // 50)
    d = np.abs(ours - ref[:len(ours)])
    assert d[:, 5].max() < 0.01 and d[:, 7].max() == 0


def test_speech_vs_music_discrimination():
    """Syllabic gated voice-like input scores low music_prob; steady
    polyphonic chord scores high."""
    fs = 48000
    rng = np.random.default_rng(11)
    t = np.arange(2 * fs) / fs
    env = np.clip(np.sin(2 * np.pi * 4 * t), 0, 1)
    voice = (env * 0.3 * np.sin(2 * np.pi * 300 * t)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    chord = sum(0.1 * np.sin(2 * np.pi * f * t + i) for i, f in
                enumerate([220, 277, 330, 415, 523, 622])).astype(np.float32)
    frame = fs // 50
    v = _run_ours(voice, fs, frame)
    m = _run_ours(chord, fs, frame)
    assert v[40:, 5].mean() < 0.2      # voice -> low music_prob
    assert m[40:, 5].mean() > 0.8      # chord -> high music_prob
    assert m[40:, 7].min() >= 18       # full-band content detected


def test_bandwidth_detection_narrowband():
    """4 kHz-lowpassed 16-bit content is detected as narrow bandwidth
    (at lsb_depth=24 the noise floor sits below float32 quantization
    noise, so even the reference reports full band — use 16)."""
    fs = 48000
    rng = np.random.default_rng(5)
    n = 2 * fs
    spec = np.fft.rfft(rng.standard_normal(n))
    freqs = np.fft.rfftfreq(n, 1 / fs)
    spec[freqs > 3500] = 0
    x = np.fft.irfft(spec)
    x = np.round(0.3 * x / np.abs(x).max() * 32768) / 32768
    st = TonalityAnalysisState(fs)
    frame = fs // 50
    bws = [st.run(x[None, i * frame:(i + 1) * frame].astype(np.float32),
                  frame, frame, 16).bandwidth
           for i in range(len(x) // frame)]
    # skip the first frames (count<=2 forces bandwidth 20)
    assert max(bws[10:]) <= 12         # NB/MB detection range


def test_silence_copies_previous_info():
    fs = 48000
    t = np.arange(fs) / fs
    x = np.concatenate([0.3 * np.sin(2 * np.pi * 500 * t),
                        np.zeros(fs)]).astype(np.float32)
    rows = _run_ours(x, fs, fs // 50)
    assert rows[-1, 0] == 1            # still valid (copied)
