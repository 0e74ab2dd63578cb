"""Batched NLSF MSVQ+trellis vs the scalar quantizer.

Captures every silk_NLSF_encode call from real WB encodes and replays
them through the batched device kernel; the chosen stage-1 index, all
trellis residual indices and the RD ordering must match bit-exactly
(NLSF_encode.c:36-132, NLSF_del_dec_quant.c:34-220)."""
import numpy as np

import opus_codec_tpu.silk.encoder_analysis as ea
from opus_codec_tpu.silk import batch_nlsf as bnl
from opus_codec_tpu.silk.nlsf import nlsf_stabilize


def _speech(n, seed=0, f0=140.0):
    rng = np.random.default_rng(seed)
    fs = 48000
    t = np.arange(n) / fs
    x = 0.45 * np.sin(2 * np.pi * f0 * t)
    x += 0.2 * np.sin(2 * np.pi * 2.1 * f0 * t + 0.4)
    x += 0.035 * rng.standard_normal(n)
    env = 0.35 + 0.65 * 0.5 * (1 + np.sin(2 * np.pi * 2.8 * t))
    return (x * env).astype(np.float32)


def _capture(n_frames, seed, f0, complexity):
    from opus_codec_tpu import Encoder
    from opus_codec_tpu.types import (Application, Bandwidth, Bitrate,
                                      Signal)
    captured = []
    orig = ea.nlsf_encode

    def wrapper(nlsf_q15, cb, w_q2, mu_q20, n_survivors, signal_type):
        rec = dict(nlsf=list(map(int, nlsf_q15)), order=cb.order,
                   w_q2=list(map(int, w_q2)), mu=int(mu_q20),
                   ns=int(n_survivors), st=int(signal_type))
        indices, q = orig(nlsf_q15, cb, w_q2, mu_q20, n_survivors,
                          signal_type)
        rec["indices"] = list(map(int, indices))
        captured.append(rec)
        return indices, q

    ea.nlsf_encode = wrapper
    try:
        enc = Encoder(48000, 1, Application.VOIP)
        enc.set_bitrate(Bitrate(24000))
        enc.set_signal(Signal.VOICE)
        enc.set_max_bandwidth(Bandwidth.WIDEBAND)
        enc.set_complexity(complexity)
        sig = _speech(960 * n_frames, seed=seed, f0=f0)
        for i in range(n_frames):
            enc.encode_float(sig[i * 960:(i + 1) * 960])
    finally:
        ea.nlsf_encode = orig
    return captured


def test_nlsf_batch_bitexact():
    recs = _capture(6, seed=5, f0=130, complexity=9) \
        + _capture(6, seed=11, f0=180, complexity=9)
    assert len(recs) >= 8
    order = recs[0]["order"]
    ns = recs[0]["ns"]
    assert all(r["order"] == order and r["ns"] == ns for r in recs)
    from opus_codec_tpu.silk.nlsf import CB_NB_MB, CB_WB
    cb = CB_WB if order == 16 else CB_NB_MB

    B = len(recs)
    nlsf = np.zeros((B, order), np.int64)
    for b, r in enumerate(recs):
        v = list(r["nlsf"])
        nlsf_stabilize(v, cb.delta_min_q15, order)
        nlsf[b] = v
    w = np.asarray([r["w_q2"] for r in recs], np.int64)
    mu = np.asarray([r["mu"] for r in recs], np.int64)
    st = np.asarray([r["st"] for r in recs], np.int64)

    idx, _rd = bnl.nlsf_encode_batch_jit(
        nlsf.astype(np.int32), w.astype(np.int32), mu.astype(np.int32),
        st.astype(np.int32), n_survivors=ns, order=order)
    idx = np.asarray(idx)
    for b, r in enumerate(recs):
        np.testing.assert_array_equal(
            idx[b].astype(np.int64),
            np.asarray(r["indices"], np.int64),
            err_msg=f"call {b}")
