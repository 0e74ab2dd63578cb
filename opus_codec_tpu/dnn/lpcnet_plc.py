"""Deep PLC: the LPCNet/FARGAN-based packet-loss concealment driver.

Re-implements opus/dnn/lpcnet_plc.c: a PLC prediction network
(dense -> GRU -> GRU -> dense over [burg cepstra(36), features(20),
flag(1)]) drives the FARGAN vocoder.  State machine:

* update() (lpcnet_plc.c:149-161): on every good 10 ms frame, slide the
  PCM history, reset loss counters.
* conceal() (lpcnet_plc.c:164-211): on the first lost frame, replay the
  buffered history through feature analysis to warm the PLC net
  (two-deep state backup plc_bak mirrors the reference's rewind), prime
  FARGAN with the last 320 samples, then per lost frame predict
  features (or consume FEC ones), attenuate after repeated losses
  (att_table), and synthesize 160 samples.
* fec_add()/fec_clear() (lpcnet_plc.c:91-108): queue decoder-supplied
  future features (DRED).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from . import weights as wt
from .nnet import (ACTIVATION_LINEAR, ACTIVATION_TANH,
                   compute_generic_dense, compute_generic_gru)
from .fargan import (FARGAN_CONT_SAMPLES, FarganModel, FarganState,
                     NB_FEATURES)
from .features import (FRAME_SIZE, LpcNetFeatures, NB_BANDS,
                       burg_cepstral_analysis)

CONT_VECTORS = 5                      # lpcnet_private.h:21
PLC_BUF_SIZE = (CONT_VECTORS + 10) * FRAME_SIZE
PLC_MAX_FEC = 100
PLC_FEATURE_DIM = 2 * NB_BANDS + NB_FEATURES + 1

ATT_TABLE = np.array([0, 0, -.2, -.2, -.4, -.4, -.8, -.8, -1.6, -1.6],
                     np.float32)     # lpcnet_plc.c:163


class PLCModel:
    """plc_dense_in -> gru1 -> gru2 -> plc_dense_out
    (lpcnet_plc.c:110-121 compute_plc_pred)."""

    def __init__(self, arrays: Dict[str, wt.WeightArray]):
        a = arrays
        d_in, d_out = wt.layer_dims(a, "plc_dense_in", PLC_FEATURE_DIM)
        self.dense_in = wt.linear_init(a, "plc_dense_in", d_in, d_out)
        g1, _ = wt.layer_dims(a, "plc_gru1_recurrent")
        self.gru1_input = wt.linear_init(a, "plc_gru1_input", d_out, 3 * g1)
        self.gru1_recurrent = wt.linear_init(a, "plc_gru1_recurrent",
                                             g1, 3 * g1)
        g2, _ = wt.layer_dims(a, "plc_gru2_recurrent")
        self.gru2_input = wt.linear_init(a, "plc_gru2_input", g1, 3 * g2)
        self.gru2_recurrent = wt.linear_init(a, "plc_gru2_recurrent",
                                             g2, 3 * g2)
        o_in, o_out = wt.layer_dims(a, "plc_dense_out", g2)
        self.dense_out = wt.linear_init(a, "plc_dense_out", o_in, o_out)

    @classmethod
    def from_blob(cls, blob: bytes) -> "PLCModel":
        return cls(wt.parse_weights(blob))


class _PLCNetState:
    def __init__(self, model: PLCModel):
        self.gru1 = np.zeros(model.gru1_recurrent.nb_inputs, np.float32)
        self.gru2 = np.zeros(model.gru2_recurrent.nb_inputs, np.float32)

    def copy(self) -> "_PLCNetState":
        s = object.__new__(_PLCNetState)
        s.gru1 = self.gru1.copy()
        s.gru2 = self.gru2.copy()
        return s


class DeepPLC:
    """LPCNetPLCState analogue (lpcnet_private.h:46-76).

    Operates at 16 kHz on float PCM in [-1, 1] (the reference stores
    1/32768-scaled int16); synthesize output is float at the same scale.
    """

    def __init__(self, plc_model: PLCModel, fargan_model: FarganModel,
                 pitchdnn=None):
        self.model = plc_model
        self.fargan_model = fargan_model
        self.enc = LpcNetFeatures(pitchdnn=pitchdnn)
        self.reset()

    @classmethod
    def from_blob(cls, blob: bytes, pitchdnn_blob: bytes = None
                  ) -> "DeepPLC":
        arrays = wt.parse_weights(blob)
        pit = None
        if pitchdnn_blob is not None:
            from .pitchdnn import PitchDNN
            pit = PitchDNN.from_blob(pitchdnn_blob)
        return cls(PLCModel(arrays), FarganModel(arrays), pitchdnn=pit)

    def reset(self):
        """lpcnet_plc_reset (lpcnet_plc.c:45-57)."""
        self.enc.reset()
        self.fargan = FarganState(self.fargan_model)
        self.pcm = np.zeros(PLC_BUF_SIZE, np.float32)
        self.blend = 0
        self.loss_count = 0
        self.analysis_gap = True
        self.analysis_pos = PLC_BUF_SIZE
        self.predict_pos = PLC_BUF_SIZE
        self.plc_net = _PLCNetState(self.model)
        self.plc_bak = [self.plc_net.copy(), self.plc_net.copy()]
        self.cont_features = np.zeros(CONT_VECTORS * NB_FEATURES,
                                      np.float32)
        self.features = np.zeros(36, np.float32)
        self.fec = np.zeros((PLC_MAX_FEC, NB_FEATURES), np.float32)
        self.fec_read_pos = 0
        self.fec_fill_pos = 0
        self.fec_skip = 0

    # -- FEC queue (lpcnet_plc.c:91-108) --------------------------------
    def fec_add(self, features: Optional[np.ndarray]):
        if features is None:
            self.fec_skip += 1
            return
        if self.fec_fill_pos == PLC_MAX_FEC:
            n = self.fec_fill_pos - self.fec_read_pos
            self.fec[:n] = self.fec[self.fec_read_pos:self.fec_fill_pos]
            self.fec_fill_pos = n
            self.fec_read_pos = 0
            if self.fec_fill_pos == PLC_MAX_FEC:
                # Queue full with nothing consumed: drop the oldest
                # entry.  (The reference would write out of bounds here,
                # lpcnet_plc.c:96-101.)
                self.fec[:-1] = self.fec[1:]
                self.fec_fill_pos -= 1
        self.fec[self.fec_fill_pos] = features[:NB_FEATURES]
        self.fec_fill_pos += 1

    def fec_clear(self):
        self.fec_read_pos = self.fec_fill_pos = self.fec_skip = 0

    # -------------------------------------------------------------------
    def _plc_pred(self, plc_features: np.ndarray) -> np.ndarray:
        """compute_plc_pred (lpcnet_plc.c:110-121)."""
        m = self.model
        net = self.plc_net
        t = compute_generic_dense(m.dense_in, plc_features,
                                  ACTIVATION_TANH)
        net.gru1 = compute_generic_gru(m.gru1_input, m.gru1_recurrent,
                                       net.gru1, t)
        net.gru2 = compute_generic_gru(m.gru2_input, m.gru2_recurrent,
                                       net.gru2, net.gru1)
        return compute_generic_dense(m.dense_out, net.gru2,
                                     ACTIVATION_LINEAR)

    def _get_fec_or_pred(self) -> bool:
        """lpcnet_plc.c:123-141; fills self.features[:20]."""
        if self.fec_read_pos != self.fec_fill_pos and self.fec_skip == 0:
            out = self.fec[self.fec_read_pos].copy()
            self.fec_read_pos += 1
            plc_features = np.zeros(PLC_FEATURE_DIM, np.float32)
            plc_features[2 * NB_BANDS:2 * NB_BANDS + NB_FEATURES] = out
            plc_features[-1] = -1
            self._plc_pred(plc_features)      # state update, discard
            self.features[:NB_FEATURES] = out
            return True
        self.features[:NB_FEATURES] = \
            self._plc_pred(np.zeros(PLC_FEATURE_DIM, np.float32))[
                :NB_FEATURES]
        if self.fec_skip > 0:
            self.fec_skip -= 1
        return False

    def _queue_features(self, features: np.ndarray):
        self.cont_features[:-NB_FEATURES] = self.cont_features[NB_FEATURES:]
        self.cont_features[-NB_FEATURES:] = features[:NB_FEATURES]

    def _backup(self):
        self.plc_bak[0] = self.plc_bak[1]
        self.plc_bak[1] = self.plc_net.copy()

    # -------------------------------------------------------------------
    def update(self, pcm: np.ndarray):
        """lpcnet_plc_update (lpcnet_plc.c:149-161): one good 160-sample
        frame (float, [-1,1])."""
        if self.analysis_pos - FRAME_SIZE >= 0:
            self.analysis_pos -= FRAME_SIZE
        else:
            self.analysis_gap = True
        if self.predict_pos - FRAME_SIZE >= 0:
            self.predict_pos -= FRAME_SIZE
        self.pcm[:-FRAME_SIZE] = self.pcm[FRAME_SIZE:]
        self.pcm[-FRAME_SIZE:] = np.asarray(pcm, np.float32)
        self.loss_count = 0
        self.blend = 0

    def conceal(self) -> np.ndarray:
        """lpcnet_plc_conceal (lpcnet_plc.c:164-211): synthesize one
        concealed 160-sample frame."""
        if self.blend == 0:
            count = 0
            self.plc_net = self.plc_bak[0].copy()
            while self.analysis_pos + FRAME_SIZE <= PLC_BUF_SIZE:
                x = 32768.0 * self.pcm[self.analysis_pos:
                                       self.analysis_pos + FRAME_SIZE]
                plc_features = np.zeros(PLC_FEATURE_DIM, np.float32)
                plc_features[:2 * NB_BANDS] = burg_cepstral_analysis(x)
                self.features = self.enc.compute(x)
                if ((not self.analysis_gap or count > 0)
                        and self.analysis_pos >= self.predict_pos):
                    self._queue_features(self.features)
                    plc_features[2 * NB_BANDS:
                                 2 * NB_BANDS + NB_FEATURES] = \
                        self.features[:NB_FEATURES]
                    plc_features[-1] = 1
                    self._backup()
                    self.features[:NB_FEATURES] = self._plc_pred(
                        plc_features)[:NB_FEATURES]
                self.analysis_pos += FRAME_SIZE
                count += 1
            self._backup()
            self._get_fec_or_pred()
            self._queue_features(self.features)
            self._backup()
            self._get_fec_or_pred()
            self._queue_features(self.features)
            self.fargan.cont(self.pcm[PLC_BUF_SIZE - FARGAN_CONT_SAMPLES:],
                             self.cont_features.reshape(CONT_VECTORS,
                                                        NB_FEATURES))
            self.analysis_gap = False
        self._backup()
        if self._get_fec_or_pred():
            self.loss_count = 0
        else:
            self.loss_count += 1
        if self.loss_count >= 10:
            self.features[0] = max(-10.0, self.features[0] + ATT_TABLE[9]
                                   - 2 * (self.loss_count - 9))
        else:
            self.features[0] = max(-10.0, self.features[0]
                                   + ATT_TABLE[self.loss_count])
        pcm = self.fargan.synthesize(self.features[:NB_FEATURES])
        self._queue_features(self.features)
        if self.analysis_pos - FRAME_SIZE >= 0:
            self.analysis_pos -= FRAME_SIZE
        else:
            self.analysis_gap = True
        self.predict_pos = PLC_BUF_SIZE
        self.pcm[:-FRAME_SIZE] = self.pcm[FRAME_SIZE:]
        self.pcm[-FRAME_SIZE:] = pcm
        self.blend = 1
        return pcm
