"""Batched delayed-decision SILK NSQ vs the scalar trellis quantizer.

The scalar `silk.nsq.nsq_del_dec` runs inside real encodes (api.Encoder,
SILK WB mono at default-ish complexity so the del-dec path with multiple
survivor states and warping is used); every main-path call's inputs are
captured and replayed through the batched device kernel, which must
reproduce the pulses, the output seed, and the carried state bit-exactly
(NSQ_del_dec.c:117-733)."""
import numpy as np

import opus_codec_tpu.silk.encoder as se
from opus_codec_tpu.silk import batch_nsq as bn
from opus_codec_tpu.silk import batch_nsq_dd as bdd


def _speech(n, seed=0, f0=140.0):
    rng = np.random.default_rng(seed)
    fs = 48000
    t = np.arange(n) / fs
    x = 0.45 * np.sin(2 * np.pi * f0 * t)
    x += 0.2 * np.sin(2 * np.pi * 2.1 * f0 * t + 0.4)
    x += 0.035 * rng.standard_normal(n)
    env = 0.35 + 0.65 * 0.5 * (1 + np.sin(2 * np.pi * 2.8 * t))
    return (x * env).astype(np.float32)


def _capture_stream(n_frames, seed, f0, complexity):
    from opus_codec_tpu import Encoder
    from opus_codec_tpu.types import (Application, Bandwidth, Bitrate,
                                      Signal)
    captured = []
    orig = se.nsq_del_dec

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
                warping_Q16=int(enc_ch.warping_Q16),
                n_states=int(enc_ch.nStatesDelayedDecision),
                lag_prev_before=int(nsq_state.lagPrev),
            )
        pulses = orig(enc_ch, nsq_state, indices, x16, Pred_Q12,
                      LTP_Q14, AR_Q13, Harm_Q14, Tilt_Q14, LF_shp_Q14,
                      Gains_Q16, pitchL, Lambda_Q10, LTP_scale_Q14)
        if is_main:
            rec["pulses"] = list(map(int, pulses))
            rec["seed_after"] = int(indices.Seed)
            rec["state_after"] = nsq_state.copy()
            captured.append(rec)
        return pulses

    se.nsq_del_dec = wrapper
    try:
        enc = Encoder(48000, 1, Application.VOIP)
        enc.set_bitrate(Bitrate(24000))
        enc.set_signal(Signal.VOICE)
        enc.set_max_bandwidth(Bandwidth.WIDEBAND)
        enc.set_complexity(complexity)     # del-dec NSQ path
        sig = _speech(960 * n_frames, seed=seed, f0=f0)
        for i in range(n_frames):
            enc.encode_float(sig[i * 960:(i + 1) * 960])
    finally:
        se.nsq_del_dec = orig
    return captured


def test_nsq_del_dec_batch_bitexact():
    n_frames = 8
    streams = [_capture_stream(n_frames, seed=3, f0=120, complexity=9),
               _capture_stream(n_frames, seed=9, f0=175, complexity=9)]
    n_calls = min(len(s) for s in streams)
    assert n_calls >= 4, "expected several SILK frames"
    B = len(streams)
    fs = streams[0][0]["fs_khz"]
    nb = streams[0][0]["nb_subfr"]
    po = streams[0][0]["predict_order"]
    so = streams[0][0]["shaping_order"]
    ns = streams[0][0]["n_states"]
    assert fs == 16 and nb == 4 and ns > 1

    st = bn.init_nsq_state(B, fs)
    prev_gains = [65536] * B
    prev_lags = [streams[b][0]["lag_prev_before"] for b in range(B)]
    for ci in range(n_calls):
        recs = [streams[b][ci] for b in range(B)]
        params, prev_gains, prev_lags = bdd.assemble_params_dd(
            recs, nb, prev_gains, prev_lags)
        pulses, xq_frame, seed_out, st = bdd.silk_nsq_del_dec_batch_jit(
            params, st, fs, nb, ns, po, so)
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(pulses[b]).astype(np.int64),
                np.asarray(recs[b]["pulses"], np.int64),
                err_msg=f"pulses call {ci} stream {b}")
            assert int(seed_out[b]) == recs[b]["seed_after"], (ci, b)
            ref = recs[b]["state_after"]
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
            assert prev_lags[b] == ref.lagPrev, (ci, b)
