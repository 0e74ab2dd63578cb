"""Batched SILK NSQ vs the scalar noise-shaping quantizer.

The scalar `silk.nsq.nsq` runs inside real encodes (api.Encoder, SILK
WB mono at complexity 1 so the non-del-dec path is used); every call's
inputs are captured and replayed through the batched device NSQ, which
must reproduce the pulses and the carried state bit-exactly."""
import copy

import numpy as np
import pytest

import jax.numpy as jnp

import opus_codec_tpu.silk.encoder as se
from opus_codec_tpu.silk import batch_nsq as bn


def _speech(n, seed=0, f0=140.0):
    rng = np.random.default_rng(seed)
    fs = 48000
    t = np.arange(n)
    f = f0 * (1 + 0.06 * np.sin(2 * np.pi * 2.1 * t / fs))
    phase = np.cumsum(2 * np.pi * f / fs)
    saw = ((phase / (2 * np.pi)) % 1.0) - 0.5
    x = 0.45 * saw + 0.1 * np.sin(2 * phase) \
        + 0.02 * rng.standard_normal(n)
    env = 0.25 + 0.75 * np.clip(np.sin(2 * np.pi * 1.3 * t / fs), 0, 1)
    return (x * env).astype(np.float32)


def _capture_stream(n_frames, seed, f0):
    """Encode and capture each main-path scalar NSQ call's inputs and
    outputs."""
    from opus_codec_tpu import Encoder
    from opus_codec_tpu.types import (Application, Bandwidth, Bitrate,
                                      Signal)
    captured = []
    orig = se.run_nsq

    def wrapper(enc_ch, nsq_state, indices, x16, Pred_Q12, LTP_Q14,
                AR_Q13, Harm_Q14, Tilt_Q14, LF_shp_Q14, Gains_Q16,
                pitchL, Lambda_Q10, LTP_scale_Q14):
        is_main = nsq_state is enc_ch.sNSQ
        if is_main:
            rec = dict(
                x16=np.asarray(x16, np.int64).copy(),
                seed=int(indices.Seed),
                signal_type=int(indices.signalType),
                quant_offset_type=int(indices.quantOffsetType),
                interp_coef=int(indices.NLSFInterpCoef_Q2),
                A_Q12=[list(map(int, row)) for row in Pred_Q12],
                B_Q14=list(map(int, LTP_Q14)),
                AR_Q13=[list(map(int, row)) for row in AR_Q13],
                Harm_Q14=list(map(int, Harm_Q14)),
                Tilt_Q14=list(map(int, Tilt_Q14)),
                LF_shp_Q14=list(map(int, LF_shp_Q14)),
                Gains_Q16=list(map(int, Gains_Q16)),
                pitchL=list(map(int, pitchL)),
                Lambda_Q10=int(Lambda_Q10),
                LTP_scale_Q14=int(LTP_scale_Q14),
                nb_subfr=int(enc_ch.nb_subfr),
                fs_khz=int(enc_ch.fs_kHz),
                predict_order=int(enc_ch.predictLPCOrder),
                shaping_order=int(enc_ch.shapingLPCOrder),
            )
        pulses = orig(enc_ch, nsq_state, indices, x16, Pred_Q12,
                      LTP_Q14, AR_Q13, Harm_Q14, Tilt_Q14, LF_shp_Q14,
                      Gains_Q16, pitchL, Lambda_Q10, LTP_scale_Q14)
        if is_main:
            rec["pulses"] = list(map(int, pulses))
            rec["state_after"] = nsq_state.copy()
            captured.append(rec)
        return pulses

    se.run_nsq = wrapper
    try:
        enc = Encoder(48000, 1, Application.VOIP)
        enc.set_bitrate(Bitrate(24000))
        enc.set_signal(Signal.VOICE)
        enc.set_max_bandwidth(Bandwidth.WIDEBAND)
        enc.set_complexity(1)         # non-del-dec NSQ path
        sig = _speech(960 * n_frames, seed=seed, f0=f0)
        for i in range(n_frames):
            enc.encode_float(sig[i * 960:(i + 1) * 960])
    finally:
        se.run_nsq = orig
    return captured


def test_nsq_batch_bitexact():
    n_frames = 8
    streams = [_capture_stream(n_frames, seed=3, f0=120),
               _capture_stream(n_frames, seed=9, f0=175)]
    n_calls = min(len(s) for s in streams)
    assert n_calls >= 4, "expected several SILK frames"
    B = len(streams)
    fs = streams[0][0]["fs_khz"]
    nb = streams[0][0]["nb_subfr"]
    po = streams[0][0]["predict_order"]
    so = streams[0][0]["shaping_order"]
    assert fs == 16 and nb == 4

    st = bn.init_nsq_state(B, fs)
    prev_gains = [65536] * B
    for ci in range(n_calls):
        recs = [streams[b][ci] for b in range(B)]
        params, prev_gains = bn.assemble_params(recs, nb, prev_gains)
        pulses, xq_frame, st = bn.silk_nsq_batch_jit(
            params, st, fs, nb, po, so)
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(pulses[b]).astype(np.int64),
                np.asarray(recs[b]["pulses"], np.int64),
                err_msg=f"pulses call {ci} stream {b}")
            ref = recs[b]["state_after"]
            L = nb * 5 * fs
            ltp_mem = 20 * fs
            np.testing.assert_array_equal(
                np.asarray(st.xq[b]).astype(np.int64),
                np.asarray(ref.xq[:ltp_mem], np.int64),
                err_msg=f"xq call {ci} stream {b}")
            np.testing.assert_array_equal(
                np.asarray(st.sLTP_shp[b]).astype(np.int64),
                np.asarray(ref.sLTP_shp_Q14[:ltp_mem], np.int64),
                err_msg=f"shp call {ci} stream {b}")
            np.testing.assert_array_equal(
                np.asarray(st.sLPC[b]).astype(np.int64),
                np.asarray(ref.sLPC_Q14[:16], np.int64),
                err_msg=f"sLPC call {ci} stream {b}")
            np.testing.assert_array_equal(
                np.asarray(st.sAR2[b]).astype(np.int64),
                np.asarray(ref.sAR2_Q14, np.int64),
                err_msg=f"sAR2 call {ci} stream {b}")
            assert int(st.sLF_AR[b]) == ref.sLF_AR_shp_Q14, (ci, b)
            assert int(st.sDiff[b]) == ref.sDiff_shp_Q14, (ci, b)
            assert int(st.lagPrev[b]) == ref.lagPrev, (ci, b)
            assert prev_gains[b] == ref.prev_gain_Q16, (ci, b)
