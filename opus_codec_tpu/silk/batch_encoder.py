"""Batched SILK encoder — device noise-shaping quantization for a
stream batch.

The SILK encode pipeline (float/encode_frame_FLP.c:76-330) spends its
serial per-sample time in ONE place: the noise-shaping quantizer
(NSQ.c:69 / NSQ_del_dec.c:117 — SURVEY hard part #1).  This module
batches exactly that seam: B per-stream scalar drivers (analysis,
control, rate loop, entropy coding — `silk.encoder`) run on host
worker threads, and every `run_nsq` call they make is intercepted by
``NsqBatchBackend`` and parked at a barrier; when the whole batch has
arrived (or finished its frame), the round's calls execute as ONE
jitted device kernel (``silk.batch_nsq`` / ``silk.batch_nsq_dd``, both
bit-exact vs the scalar quantizer) and the threads resume with the
device results written back into their scalar NSQ states.

Because the device quantizers are bit-exact, the produced packets are
byte-identical to the pure-scalar encoder's — the rate loop, LBRR and
prefill paths all flow through the same seam (encoder.py run_nsq).

This is the v1 of the batched SILK encoder lane: the analysis front
half (pitch search, Burg, noise shaping, NLSF trellis) still runs
per-stream on the host; its batched device twins are the next
milestone (VERDICT r2 #3).
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional

import numpy as np

from . import batch_ltp as blt
from . import batch_nlsf as bnl
from . import batch_nsq as bn
from . import batch_nsq_dd as bdd

__all__ = ["NsqBatchBackend", "SilkBatchEncoder"]


class _NsqCall:
    __slots__ = ("rec", "nsq_state", "indices", "key", "done",
                 "pulses", "result", "exc")

    def __init__(self, rec, nsq_state, indices, key):
        self.rec = rec
        self.nsq_state = nsq_state
        self.indices = indices
        self.key = key
        self.done = False
        self.pulses = None
        self.result = None
        self.exc = None


def _build_record(ch, nsq_state, indices, x16, Pred_Q12, LTP_Q14,
                  AR_Q13, Harm_Q14, Tilt_Q14, LF_shp_Q14, Gains_Q16,
                  pitchL, Lambda_Q10, LTP_scale_Q14) -> dict:
    """The Q-domain NSQ inputs, in `assemble_params` record form."""
    return dict(
        x16=np.asarray(x16, np.int64),
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
        fs_khz=int(ch.fs_kHz),
        warping_Q16=int(ch.warping_Q16),
    )


class NsqBatchBackend:
    """Barrier-batching NSQ backend (install as ``ch.nsq_hook``).

    Worker threads calling in are parked until ``flush_ready`` rounds
    them up; the orchestrator (SilkBatchEncoder.encode) executes each
    round as one device kernel per (fs, nb_subfr, kernel-variant)
    group, padded to a fixed batch so each variant compiles once."""

    def __init__(self, batch: int):
        self.batch = batch
        self.cond = threading.Condition()
        self.pending: List[_NsqCall] = []
        self.blocked = 0
        self.live = 0
        self.finished = 0
        self._jit_cache: Dict = {}

    # ---- hook entry (runs on worker threads)
    def __call__(self, ch, nsq_state, indices, x16, Pred_Q12, LTP_Q14,
                 AR_Q13, Harm_Q14, Tilt_Q14, LF_shp_Q14, Gains_Q16,
                 pitchL, Lambda_Q10, LTP_scale_Q14):
        use_dd = ch.nStatesDelayedDecision > 1 or ch.warping_Q16 > 0
        key = ("dd" if use_dd else "plain", int(ch.fs_kHz),
               int(ch.nb_subfr), int(ch.nStatesDelayedDecision),
               int(ch.predictLPCOrder), int(ch.shapingLPCOrder))
        rec = _build_record(ch, nsq_state, indices, x16, Pred_Q12,
                            LTP_Q14, AR_Q13, Harm_Q14, Tilt_Q14,
                            LF_shp_Q14, Gains_Q16, pitchL, Lambda_Q10,
                            LTP_scale_Q14)
        call = _NsqCall(rec, nsq_state, indices, key)
        with self.cond:
            self.pending.append(call)
            self.blocked += 1
            self.cond.notify_all()
            while not call.done:
                self.cond.wait()
            self.blocked -= 1
            self.cond.notify_all()
        if call.exc is not None:
            raise call.exc
        return call.pulses

    def nlsf(self, ch, nlsf_q15, w_qw, mu_q20):
        """NLSF-quantizer seam (encoder_analysis.process_nlsfs hook):
        park the call; the round executes silk.batch_nlsf for the
        whole batch.  Returns (indices, q_nlsf)."""
        from .nlsf import nlsf_stabilize
        cb = ch.psNLSF_CB
        stab = list(map(int, nlsf_q15))
        nlsf_stabilize(stab, cb.delta_min_q15, cb.order)
        rec = dict(nlsf=stab, w_q2=list(map(int, w_qw)),
                   mu=int(mu_q20), st=int(ch.indices.signalType))
        key = ("nlsf", int(cb.order), int(ch.NLSF_MSVQ_Survivors))
        call = _NsqCall(rec, None, None, key)
        with self.cond:
            self.pending.append(call)
            self.blocked += 1
            self.cond.notify_all()
            while not call.done:
                self.cond.wait()
            self.blocked -= 1
            self.cond.notify_all()
        if call.exc is not None:
            raise call.exc
        return call.result

    def ltp(self, ch, XX, xX):
        """LTP gain VQ seam (encoder.find_pred_coefs hook): park the
        call; the round executes silk.batch_ltp for the batch.
        Returns (B_Q14, cbk_index, per_index, slg, pred_gain)."""
        from .encoder_analysis import _f2i
        XXq = np.array([_f2i(v * 131072.0) for v in
                        np.asarray(XX).reshape(-1)], np.int64)
        xXq = np.array([_f2i(v * 131072.0) for v in
                        np.asarray(xX).reshape(-1)], np.int64)
        rec = dict(XX=XXq, xX=xXq, slg=int(ch.sum_log_gain_Q7))
        key = ("ltp", int(ch.nb_subfr), int(ch.subfr_length))
        call = _NsqCall(rec, None, None, key)
        with self.cond:
            self.pending.append(call)
            self.blocked += 1
            self.cond.notify_all()
            while not call.done:
                self.cond.wait()
            self.blocked -= 1
            self.cond.notify_all()
        if call.exc is not None:
            raise call.exc
        return call.result

    # ---- orchestrator side
    def run_rounds(self):
        """Drive barrier rounds until every live worker finished.
        Call with workers started; returns when all are done."""
        with self.cond:
            while self.finished < self.live:
                while (self.finished + self.blocked < self.live
                       and self.finished < self.live):
                    self.cond.wait()
                if self.pending:
                    calls = self.pending
                    self.pending = []
                    try:
                        self._execute(calls)
                    except BaseException as e:
                        # release the blocked workers with the error —
                        # never leave them parked (encode() would hang
                        # on join otherwise)
                        for c in calls:
                            c.exc = e
                    for c in calls:
                        c.done = True
                    self.cond.notify_all()
                elif self.finished < self.live:
                    self.cond.wait()

    def worker_done(self):
        with self.cond:
            self.finished += 1
            self.cond.notify_all()

    # ---- batched execution
    def _execute(self, calls: List[_NsqCall]):
        groups: Dict = {}
        for c in calls:
            groups.setdefault(c.key, []).append(c)
        for key, grp in groups.items():
            self._execute_group(key, grp)

    def _execute_group(self, key, grp: List[_NsqCall]):
        if key[0] == "nlsf":
            self._execute_nlsf(key, grp)
            return
        if key[0] == "ltp":
            self._execute_ltp(key, grp)
            return
        variant, fs, nb, n_states, po, so = key
        B = self.batch
        # pad to the fixed compile batch with copies of the first call
        recs = [c.rec for c in grp]
        states = [c.nsq_state for c in grp]
        while len(recs) < B:
            recs.append(grp[0].rec)
            states.append(grp[0].nsq_state)
        if len(recs) > B:                      # can't happen: <=1
            raise RuntimeError("more NSQ calls than streams")

        ltp_mem = 20 * fs
        prev_gains = [int(s.prev_gain_Q16) for s in states]
        prev_lags = [int(s.lagPrev) for s in states]
        st = bn.NsqBatchState(
            xq=_stack_i32([s.xq[:ltp_mem] for s in states]),
            sLTP_shp=_stack_i32([s.sLTP_shp_Q14[:ltp_mem]
                                 for s in states]),
            sLPC=_stack_i32([s.sLPC_Q14[:bn.NSQ_LPC_BUF_LENGTH]
                             for s in states]),
            sAR2=_stack_i32([s.sAR2_Q14 for s in states]),
            sLF_AR=_stack_i32([s.sLF_AR_shp_Q14 for s in states]),
            sDiff=_stack_i32([s.sDiff_shp_Q14 for s in states]),
            lagPrev=_stack_i32(prev_lags))

        if variant == "dd":
            params, new_prev, _new_lags = bdd.assemble_params_dd(
                recs, nb, prev_gains, prev_lags)
            pulses, _xq, seed_out, new_st = \
                bdd.silk_nsq_del_dec_batch_jit(
                    params, st, fs, nb, n_states, po, so)
            seed_out = np.asarray(seed_out)
        else:
            params, new_prev = bn.assemble_params(recs, nb, prev_gains)
            pulses, _xq, new_st = bn.silk_nsq_batch_jit(
                params, st, fs, nb, po, so)
            seed_out = None

        pulses = np.asarray(pulses)
        xq_h = np.asarray(new_st.xq)
        shp_h = np.asarray(new_st.sLTP_shp)
        lpc_h = np.asarray(new_st.sLPC)
        ar2_h = np.asarray(new_st.sAR2)
        lf_h = np.asarray(new_st.sLF_AR)
        df_h = np.asarray(new_st.sDiff)
        lag_h = np.asarray(new_st.lagPrev)

        for i, c in enumerate(grp):
            s = c.nsq_state
            s.xq[:ltp_mem] = [int(v) for v in xq_h[i]]
            s.sLTP_shp_Q14[:ltp_mem] = [int(v) for v in shp_h[i]]
            s.sLPC_Q14[:bn.NSQ_LPC_BUF_LENGTH] = \
                [int(v) for v in lpc_h[i]]
            s.sAR2_Q14 = [int(v) for v in ar2_h[i]]
            s.sLF_AR_shp_Q14 = int(lf_h[i])
            s.sDiff_shp_Q14 = int(df_h[i])
            s.lagPrev = int(lag_h[i])
            s.prev_gain_Q16 = int(new_prev[i])
            if seed_out is not None:
                c.indices.Seed = int(seed_out[i])
            c.pulses = [int(v) for v in pulses[i]]


    def _execute_nlsf(self, key, grp: List[_NsqCall]):
        _tag, order, ns = key
        from .nlsf import CB_NB_MB, CB_WB, nlsf_decode
        cb = CB_WB if order == 16 else CB_NB_MB
        recs = [c.rec for c in grp]
        while len(recs) < self.batch:
            recs.append(grp[0].rec)
        nlsf = _stack_i32([r["nlsf"] for r in recs])
        w = _stack_i32([r["w_q2"] for r in recs])
        mu = _stack_i32([r["mu"] for r in recs])
        st = _stack_i32([r["st"] for r in recs])
        idx, _rd = bnl.nlsf_encode_batch_jit(
            nlsf, w, mu, st, n_survivors=ns, order=order)
        idx = np.asarray(idx)
        for i, c in enumerate(grp):
            indices = [int(v) for v in idx[i]]
            c.result = (indices, nlsf_decode(indices, cb))


    def _execute_ltp(self, key, grp: List[_NsqCall]):
        _tag, nb, subfr_len = key
        recs = [c.rec for c in grp]
        while len(recs) < self.batch:
            recs.append(grp[0].rec)
        XX = _stack_i32([r["XX"] for r in recs]).reshape(
            len(recs), nb, 25)
        xX = _stack_i32([r["xX"] for r in recs]).reshape(
            len(recs), nb, 5)
        slg = _stack_i32([r["slg"] for r in recs])
        bq14, cbk, per, slg_o, pg = blt.quant_ltp_gains_batch_jit(
            XX, xX, slg, subfr_len=subfr_len, nb_subfr=nb)
        bq14 = np.asarray(bq14)
        cbk = np.asarray(cbk)
        per = np.asarray(per)
        slg_o = np.asarray(slg_o)
        pg = np.asarray(pg)
        for i, c in enumerate(grp):
            c.result = ([int(v) for v in bq14[i]],
                        [int(v) for v in cbk[i]], int(per[i]),
                        int(slg_o[i]), int(pg[i]))


def _stack_i32(rows) -> "np.ndarray":
    import jax.numpy as jnp
    return jnp.asarray(np.asarray(rows, np.int64).astype(np.int32))


class SilkBatchEncoder:
    """B concurrent SILK-mode (VoIP voice) mono streams with the
    noise-shaping quantizer executed on device for the whole batch.

    Packets are byte-identical to the scalar `api.Encoder` per stream
    (the quantizer kernels are bit-exact; everything else IS the
    scalar path).  encode(pcm [B, frame]) -> list of packets.
    """

    def __init__(self, batch: int, bitrate: int = 24000,
                 sample_rate: int = 48000, frame_size: int = 960,
                 complexity: int = 9, vbr: bool = False,
                 fec: bool = False, packet_loss: int = 0):
        from ..api import Encoder
        from ..types import Application, Bandwidth, Bitrate, Signal
        self.batch = batch
        self.frame_size = frame_size
        self.backend = NsqBatchBackend(batch)
        self.encoders = []
        for _ in range(batch):
            e = Encoder(sample_rate, 1, Application.VOIP)
            e.set_bitrate(Bitrate(bitrate))
            e.set_signal(Signal.VOICE)
            e.set_max_bandwidth(Bandwidth.WIDEBAND)
            e.set_complexity(complexity)
            e.set_vbr(vbr)
            if fec:
                e.set_inband_fec(True)
                e.set_packet_loss_perc(packet_loss)
            e._nsq_hook = self.backend   # picked up by _new_silk
            self.encoders.append(e)

    def encode(self, pcm) -> List[bytes]:
        """pcm: [B, frame_size] float32 in [-1, 1] (or int16)."""
        pcm = np.asarray(pcm)
        out: List[Optional[bytes]] = [None] * self.batch
        errs: List = []
        be = self.backend
        be.live = self.batch
        be.finished = 0

        def work(b):
            try:
                row = pcm[b]
                if row.dtype == np.int16:
                    out[b] = self.encoders[b].encode(row)
                else:
                    out[b] = self.encoders[b].encode_float(
                        np.asarray(row, np.float32))
            except BaseException as e:          # surfaced after join
                errs.append((b, e))
            finally:
                be.worker_done()

        threads = [threading.Thread(target=work, args=(b,))
                   for b in range(self.batch)]
        for t in threads:
            t.start()
        be.run_rounds()
        for t in threads:
            t.join()
        if errs:
            raise errs[0][1]
        return out
