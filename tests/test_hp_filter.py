"""Input HP front-end: variable hp_cutoff (VOIP) and dc_reject.

Coefficient vectors below were produced by tools/oracle/hp_coef_check.c
(reference hp_cutoff Q28 math) and tools/oracle/hp_var_check.c
(silk_HP_variable_cutoff recurrence)."""

import numpy as np
import pytest

from opus_codec_tpu.opus.hp_filter import (dc_reject, hp_coeffs_q28,
                                           hp_cutoff)
from opus_codec_tpu.silk.encoder import (TYPE_VOICED, hp_variable_cutoff)

# (fs, cutoff_hz) -> (B0, B1, B2, A0, A1) from the reference oracle
_ORACLE_COEFS = {
    (48000, 59): (267005029, -534010058, 267005029, -534001072, 265582150),
    (48000, 94): (266156287, -532312574, 266156287, -532289794, 263896344),
    (16000, 59): (264144175, -528288350, 264144175, -528208528, 259921403),
    (16000, 94): (261597949, -523195898, 261597949, -522995258, 254934486),
    (24000, 3): (268290388, -536580776, 268290388, -536580673, 268145358),
}


def test_hp_coeffs_match_reference_oracle():
    for (fs, cutoff), want in _ORACLE_COEFS.items():
        b, a = hp_coeffs_q28(cutoff, fs)
        assert (b[0], b[1], b[2], a[0], a[1]) == want, (fs, cutoff)


def test_hp_cutoff_removes_dc_keeps_speech_band():
    fs = 16000
    t = np.arange(fs) / fs
    x = (0.25 + 0.5 * np.sin(2 * np.pi * 400 * t))[None, :]
    mem = np.zeros(4)
    y = hp_cutoff(x, 80, mem, fs)
    # DC gone after settling; 400 Hz essentially untouched
    tail = y[0, fs // 2:]
    assert abs(tail.mean()) < 1e-3
    assert np.std(tail) == pytest.approx(0.5 / np.sqrt(2), rel=0.05)


def test_hp_cutoff_state_continuity():
    """Filtering in two chunks == filtering in one."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 640))[:]
    m1, m2 = np.zeros(4), np.zeros(4)
    whole = hp_cutoff(x, 70, m1, 16000)
    parts = np.concatenate([hp_cutoff(x[:, :320], 70, m2, 16000),
                            hp_cutoff(x[:, 320:], 70, m2, 16000)], axis=1)
    np.testing.assert_allclose(whole, parts, atol=1e-12)
    np.testing.assert_allclose(m1, m2, atol=1e-12)


def test_dc_reject_removes_dc():
    fs = 48000
    x = np.full((1, 4 * fs), 0.3)
    mem = np.zeros(4)
    y = dc_reject(x, 3, mem, fs)
    assert abs(y[0, -fs:].mean()) < 1e-3
    assert y[0, 0] == pytest.approx(0.3)  # step passes instantaneously


def test_hp_variable_cutoff_matches_oracle_recurrence():
    """Replay tools/oracle/hp_var_check.c's first rows bit-exactly."""
    rows = [  # lag, quality_Q15, activity_Q8, smth1 after update
        (123, 1084, 139, 194244),
        (40, 26871, 28, 194386),
        (71, 3168, 152, 195161),
    ]

    class Stub:
        pass

    ch = Stub()
    ch.prevSignalType = TYPE_VOICED
    ch.fs_kHz = 16
    ch.variable_HP_smth1_Q15 = 193536
    for lag, q, act, want in rows:
        ch.prevLag = lag
        ch.input_quality_bands_Q15 = [q, 0, 0, 0]
        ch.speech_activity_Q8 = act
        hp_variable_cutoff(ch)
        assert ch.variable_HP_smth1_Q15 == want

    # unvoiced frames leave the state untouched
    ch.prevSignalType = 0
    hp_variable_cutoff(ch)
    assert ch.variable_HP_smth1_Q15 == rows[-1][3]


def test_voip_encoder_rejects_dc_end_to_end():
    """A DC-offset voice signal encodes to packets whose decode has
    (near-)zero DC — the front-end HP is actually in the loop."""
    from opus_codec_tpu.api import Application, Decoder, Encoder
    fs = 16000
    enc = Encoder(fs, 1, Application.VOIP)
    enc.set_bitrate(24000)
    dec = Decoder(fs, 1)
    t = np.arange(fs) / fs
    pitch = 150.0
    x = 0.2 + 0.3 * np.sin(2 * np.pi * pitch * t) * \
        (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    pcm = np.clip(x * 32768, -32768, 32767).astype(np.int16)
    outs = []
    for i in range(0, fs - 320, 320):
        pktb = enc.encode(pcm[i:i + 320])
        outs.append(dec.decode(pktb, 320))
    out = np.concatenate(outs[10:]).astype(np.float64) / 32768
    assert abs(out.mean()) < 0.02          # input had 0.2 DC
    assert out.std() > 0.05                # signal survived
    # cutoff state moved and stayed within the 60..100 Hz log range
    smth1 = enc._silk.ch.variable_HP_smth1_Q15
    assert 193536 <= smth1 <= 217856
