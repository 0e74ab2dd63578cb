"""OSCE — neural speech enhancement post-filters for SILK (LACE and
NoLACE), re-implementing opus/dnn/osce.c.

Both models share a feature net (per-subframe dense + frame conv +
tconv upsampler + GRU) conditioned on the 93-dim OSCE features, a
pitch embedding and a sinusoidal bit-rate embedding.  LACE applies two
adaptive comb stages and one adaptive conv; NoLACE extends this with
feature transforms between stages, 2-channel adaptive convs and three
temporal shaping (adashape) rounds (osce.c:178-321 lace,
:386-775 nolace).

Layer dims come from the weight blob; scalar hyperparameters
(gain transforms, kernel sizes, numbits scales) live in
:class:`LaceConfig`/:class:`NoLaceConfig` with the released models'
export defaults (the reference compiles them into generated
lace_data.h/nolace_data.h).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from . import weights as wt
from .nnet import (ACTIVATION_TANH, Conv1dState, LinearLayer,
                   compute_generic_conv1d, compute_generic_dense,
                   compute_generic_gru, conv1d_state)
from .nndsp import (AdaCombState, AdaConvState, AdaShapeState,
                    adacomb_process_frame, adaconv_process_frame,
                    adashape_process_frame, compute_overlap_window)
from .osce_features import (OSCE_FEATURE_DIM, OsceFeatureState,
                            SilkFrameInfo, cross_fade_10ms)

OSCE_METHOD_NONE = 0
OSCE_METHOD_LACE = 1
OSCE_METHOD_NOLACE = 2

NUM_FEATURES = OSCE_FEATURE_DIM
NUMBITS_EMBEDDING_DIM = 8
FRAME_SIZE = 80        # 5 ms subframe at 16 kHz
OVERLAP_SIZE = 40
PREEMPH = 0.85


@dataclass
class AdaFilterConfig:
    """Per adaptive-filter scalars from the export header
    (wexchange torch.py: FILTER_GAIN_A/B, LOG_GAIN_LIMIT...)."""
    kernel_size: int = 15
    filter_gain_a: float = 0.0
    filter_gain_b: float = 0.0
    log_gain_limit: float = 0.0
    in_channels: int = 1
    out_channels: int = 1


def _default_comb(kernel_size=40) -> AdaFilterConfig:
    # LimitedAdaptiveComb1d defaults: gain_limit_db=10 ->
    # log_gain_limit = 10*log(10)/20; global gains [-6, 6] dB ->
    # a = log(10)/20*(6-(-6))/2 = .69/2 etc.
    ln10_20 = np.log(10) / 20
    return AdaFilterConfig(kernel_size=kernel_size,
                           filter_gain_a=6.0 * ln10_20,
                           filter_gain_b=0.0,
                           log_gain_limit=10.0 * ln10_20)


def _default_conv(in_ch=1, out_ch=1, kernel_size=15) -> AdaFilterConfig:
    # LimitedAdaptiveConv1d gain_limits_db=[-6, 6]
    ln10_20 = np.log(10) / 20
    return AdaFilterConfig(kernel_size=kernel_size,
                           filter_gain_a=6.0 * ln10_20,
                           filter_gain_b=0.0,
                           in_channels=in_ch, out_channels=out_ch)


def _numbits_embedding(numbits: float, scales: np.ndarray,
                       lo: float, hi: float) -> np.ndarray:
    """compute_lace_numbits_embedding (osce.c:62-78), log scale."""
    x = np.clip(np.log(max(numbits, 1e-9)), np.log(lo), np.log(hi))
    x -= (np.log(hi) + np.log(lo)) / 2
    return np.sin(x * scales - 0.5).astype(np.float32)


def _default_numbits_scales(lo=50.0, hi=650.0) -> np.ndarray:
    """ScaleEmbedding init (models/scale_embedding.py:61-63)."""
    return ((np.arange(1, NUMBITS_EMBEDDING_DIM + 1) * np.pi)
            / (np.log(hi) - np.log(lo))).astype(np.float32)


class _FeatureNet:
    """lace_feature_net / nolace_feature_net (osce.c:103-177)."""

    def __init__(self, a: Dict[str, wt.WeightArray], prefix: str):
        def bind(name, nb_in=None, nb_out=None):
            if nb_out is None:
                nb_in, nb_out = wt.layer_dims(a, name, nb_in)
            return wt.linear_init(a, name, nb_in, nb_out,
                                  sparse=(name + "_weights_idx") in a)
        self.pitch_embedding = wt.embedding_init(
            a, prefix + "_pitch_embedding", 301)
        self.pitch_dim = self.pitch_embedding.shape[1]
        c1_in, c1_out = wt.layer_dims(a, prefix + "_fnet_conv1")
        self.conv1 = bind(prefix + "_fnet_conv1", c1_in, c1_out)
        self.hidden_dim = c1_out
        c2_in, c2_out = wt.layer_dims(a, prefix + "_fnet_conv2")
        self.conv2 = bind(prefix + "_fnet_conv2", c2_in, c2_out)
        self.cond_dim = c2_out // 4
        t_in, t_out = wt.layer_dims(a, prefix + "_fnet_tconv")
        self.tconv = bind(prefix + "_fnet_tconv", t_in, t_out)
        N = self.cond_dim
        self.gru_input = bind(prefix + "_fnet_gru_input", N, 3 * N)
        self.gru_recurrent = bind(prefix + "_fnet_gru_recurrent", N, 3 * N)
        self.numbits_scales = _default_numbits_scales()

    def make_state(self):
        return {"conv2": conv1d_state(self.conv2, 4 * self.hidden_dim),
                "gru": np.zeros(self.cond_dim, np.float32)}

    def run(self, state, features: np.ndarray, numbits: np.ndarray,
            periods: np.ndarray) -> np.ndarray:
        emb = np.concatenate([
            _numbits_embedding(float(numbits[0]), self.numbits_scales,
                               50.0, 650.0),
            _numbits_embedding(float(numbits[1]), self.numbits_scales,
                               50.0, 650.0)])
        hidden = np.empty((4, self.hidden_dim), np.float32)
        for k in range(4):
            row = np.concatenate([
                features[k][:NUM_FEATURES],
                self.pitch_embedding[int(periods[k])], emb])
            hidden[k] = compute_generic_dense(self.conv1, row,
                                              ACTIVATION_TANH)
        flat = compute_generic_conv1d(self.conv2, state["conv2"],
                                      hidden.reshape(-1),
                                      4 * self.hidden_dim,
                                      ACTIVATION_TANH)
        up = compute_generic_dense(self.tconv, flat, ACTIVATION_TANH)
        out = np.empty((4, self.cond_dim), np.float32)
        for k in range(4):
            state["gru"] = compute_generic_gru(
                self.gru_input, self.gru_recurrent, state["gru"],
                up[k * self.cond_dim:(k + 1) * self.cond_dim])
            out[k] = state["gru"]
        return out


def _bind_adaptive(a, name, cond_dim, cfg: AdaFilterConfig):
    """Bind {name}_kernel/_gain[/global_gain] dense layers."""
    out = {}
    k_in, k_out = wt.layer_dims(a, name + "_kernel", cond_dim)
    out["kernel"] = wt.linear_init(a, name + "_kernel", k_in, k_out)
    g_in, g_out = wt.layer_dims(a, name + "_gain", cond_dim)
    out["gain"] = wt.linear_init(a, name + "_gain", g_in, g_out)
    if (name + "_global_gain_bias") in a:
        out["global_gain"] = wt.linear_init(a, name + "_global_gain",
                                            cond_dim, 1)
    # derive kernel size / channels from the layer when possible
    if cfg.in_channels * cfg.out_channels:
        cfg.kernel_size = k_out // (cfg.in_channels * cfg.out_channels)
    return out


class LaceModel:
    """LACE (osce.c:81-321): fnet -> cf1 -> cf2 -> af1."""

    method = OSCE_METHOD_LACE

    def __init__(self, arrays: Dict[str, wt.WeightArray],
                 cf1: Optional[AdaFilterConfig] = None,
                 cf2: Optional[AdaFilterConfig] = None,
                 af1: Optional[AdaFilterConfig] = None):
        a = arrays
        self.fnet = _FeatureNet(a, "lace")
        cd = self.fnet.cond_dim
        self.cf1_cfg = cf1 or _default_comb()
        self.cf2_cfg = cf2 or _default_comb()
        self.af1_cfg = af1 or _default_conv()
        self.cf1 = _bind_adaptive(a, "lace_cf1", cd, self.cf1_cfg)
        self.cf2 = _bind_adaptive(a, "lace_cf2", cd, self.cf2_cfg)
        self.af1 = _bind_adaptive(a, "lace_af1", cd, self.af1_cfg)
        self.window = compute_overlap_window(OVERLAP_SIZE)

    @classmethod
    def from_blob(cls, blob: bytes, **kw) -> "LaceModel":
        return cls(wt.parse_weights(blob), **kw)

    def make_state(self):
        return {"fnet": self.fnet.make_state(),
                "cf1": AdaCombState(), "cf2": AdaCombState(),
                "af1": AdaConvState(),
                "preemph": 0.0, "deemph": 0.0}

    def process_20ms(self, state, x_in: np.ndarray, features: np.ndarray,
                     numbits: np.ndarray, periods: np.ndarray
                     ) -> np.ndarray:
        """lace_process_20ms_frame (osce.c:178-321)."""
        x = np.empty(320, np.float32)
        mem = state["preemph"]
        for i in range(320):
            x[i] = x_in[i] - PREEMPH * mem
            mem = x_in[i]
        state["preemph"] = mem
        cond = self.fnet.run(state["fnet"], features, numbits, periods)
        # comb stage 1
        for k in range(4):
            seg = slice(k * FRAME_SIZE, (k + 1) * FRAME_SIZE)
            x[seg] = adacomb_process_frame(
                state["cf1"], x[seg], cond[k], self.cf1["kernel"],
                self.cf1["gain"], self.cf1["global_gain"],
                int(periods[k]), FRAME_SIZE, OVERLAP_SIZE,
                self.cf1_cfg.kernel_size, self.cf1_cfg.filter_gain_a,
                self.cf1_cfg.filter_gain_b, self.cf1_cfg.log_gain_limit,
                self.window)
        # comb stage 2
        for k in range(4):
            seg = slice(k * FRAME_SIZE, (k + 1) * FRAME_SIZE)
            x[seg] = adacomb_process_frame(
                state["cf2"], x[seg], cond[k], self.cf2["kernel"],
                self.cf2["gain"], self.cf2["global_gain"],
                int(periods[k]), FRAME_SIZE, OVERLAP_SIZE,
                self.cf2_cfg.kernel_size, self.cf2_cfg.filter_gain_a,
                self.cf2_cfg.filter_gain_b, self.cf2_cfg.log_gain_limit,
                self.window)
        # adaptive conv
        for k in range(4):
            seg = slice(k * FRAME_SIZE, (k + 1) * FRAME_SIZE)
            x[seg] = adaconv_process_frame(
                state["af1"], x[seg], cond[k], self.af1["kernel"],
                self.af1["gain"], FRAME_SIZE, OVERLAP_SIZE, 1, 1,
                self.af1_cfg.kernel_size, self.af1_cfg.filter_gain_a,
                self.af1_cfg.filter_gain_b, self.window)
        out = np.empty(320, np.float32)
        mem = state["deemph"]
        for i in range(320):
            mem = x[i] + PREEMPH * mem
            out[i] = mem
        state["deemph"] = mem
        return out


class NoLaceModel:
    """NoLACE (osce.c:386-775): fnet -> cf1 -> cf2 -> af1(1->2) ->
    tdshape1+af2(2->2) -> tdshape2+af3(2->2) -> tdshape3+af4(2->1),
    with a post conv1d feature transform after every filter stage."""

    method = OSCE_METHOD_NOLACE

    def __init__(self, arrays: Dict[str, wt.WeightArray]):
        a = arrays
        self.fnet = _FeatureNet(a, "nolace")
        cd = self.fnet.cond_dim
        self.cf1_cfg = _default_comb()
        self.cf2_cfg = _default_comb()
        self.af_cfg = [_default_conv(1, 2), _default_conv(2, 2),
                       _default_conv(2, 2), _default_conv(2, 1)]
        self.cf1 = _bind_adaptive(a, "nolace_cf1", cd, self.cf1_cfg)
        self.cf2 = _bind_adaptive(a, "nolace_cf2", cd, self.cf2_cfg)
        self.af = [_bind_adaptive(a, f"nolace_af{i+1}", cd,
                                  self.af_cfg[i]) for i in range(4)]
        self.post = []
        for name in ("cf1", "cf2", "af1", "af2", "af3"):
            p_in, p_out = wt.layer_dims(a, f"nolace_post_{name}")
            self.post.append(wt.linear_init(
                a, f"nolace_post_{name}", p_in, p_out,
                sparse=(f"nolace_post_{name}_weights_idx") in a))
        self.tdshape = []
        for i in (1, 2, 3):
            t = {}
            for part in ("alpha1_f", "alpha1_t", "alpha2"):
                n_in, n_out = wt.layer_dims(a,
                                            f"nolace_tdshape{i}_{part}")
                t[part] = wt.linear_init(a, f"nolace_tdshape{i}_{part}",
                                         n_in, n_out)
            self.tdshape.append(t)
        self.window = compute_overlap_window(OVERLAP_SIZE)
        self.avg_pool_k = 4

    @classmethod
    def from_blob(cls, blob: bytes) -> "NoLaceModel":
        return cls(wt.parse_weights(blob))

    def make_state(self):
        cd = self.fnet.cond_dim
        return {"fnet": self.fnet.make_state(),
                "cf1": AdaCombState(), "cf2": AdaCombState(),
                "af": [AdaConvState() for _ in range(4)],
                "post": [conv1d_state(p, self.fnet.cond_dim)
                         for p in self.post],
                "tdshape": [AdaShapeState() for _ in range(3)],
                "preemph": 0.0, "deemph": 0.0}

    def _post(self, state, idx, cond):
        out = np.empty_like(cond)
        for k in range(4):
            out[k] = compute_generic_conv1d(
                self.post[idx], state["post"][idx], cond[k],
                self.fnet.cond_dim, ACTIVATION_TANH)
        return out

    def process_20ms(self, state, x_in: np.ndarray, features: np.ndarray,
                     numbits: np.ndarray, periods: np.ndarray
                     ) -> np.ndarray:
        x1 = np.empty(320, np.float32)
        mem = state["preemph"]
        for i in range(320):
            x1[i] = x_in[i] - PREEMPH * mem
            mem = x_in[i]
        state["preemph"] = mem
        cond = self.fnet.run(state["fnet"], features, numbits, periods)

        for ci, (name, cfg) in enumerate((("cf1", self.cf1_cfg),
                                          ("cf2", self.cf2_cfg))):
            lay = getattr(self, name)
            for k in range(4):
                seg = slice(k * FRAME_SIZE, (k + 1) * FRAME_SIZE)
                x1[seg] = adacomb_process_frame(
                    state[name], x1[seg], cond[k], lay["kernel"],
                    lay["gain"], lay["global_gain"], int(periods[k]),
                    FRAME_SIZE, OVERLAP_SIZE, cfg.kernel_size,
                    cfg.filter_gain_a, cfg.filter_gain_b,
                    cfg.log_gain_limit, self.window)
            cond = self._post(state, ci, cond)

        # af1: 1 -> 2 channels
        x2 = np.empty((4, 2, FRAME_SIZE), np.float32)
        for k in range(4):
            seg = slice(k * FRAME_SIZE, (k + 1) * FRAME_SIZE)
            x2[k] = adaconv_process_frame(
                state["af"][0], x1[seg], cond[k], self.af[0]["kernel"],
                self.af[0]["gain"], FRAME_SIZE, OVERLAP_SIZE, 1, 2,
                self.af_cfg[0].kernel_size, self.af_cfg[0].filter_gain_a,
                self.af_cfg[0].filter_gain_b, self.window
            ).reshape(2, FRAME_SIZE)
        cond = self._post(state, 2, cond)

        # shape-mix rounds: tdshape on channel 2, then 2->2 conv
        buf = x2
        for rnd in range(2):
            nxt = np.empty_like(buf)
            for k in range(4):
                td = self.tdshape[rnd]
                buf[k, 1] = adashape_process_frame(
                    state["tdshape"][rnd], buf[k, 1], cond[k],
                    td["alpha1_f"], td["alpha1_t"], td["alpha2"],
                    self.fnet.cond_dim, FRAME_SIZE, self.avg_pool_k)
                nxt[k] = adaconv_process_frame(
                    state["af"][rnd + 1], buf[k].reshape(-1), cond[k],
                    self.af[rnd + 1]["kernel"], self.af[rnd + 1]["gain"],
                    FRAME_SIZE, OVERLAP_SIZE, 2, 2,
                    self.af_cfg[rnd + 1].kernel_size,
                    self.af_cfg[rnd + 1].filter_gain_a,
                    self.af_cfg[rnd + 1].filter_gain_b, self.window
                ).reshape(2, FRAME_SIZE)
            cond = self._post(state, rnd + 3, cond)
            buf = nxt

        # final round: tdshape3 + af4 (2 -> 1)
        out = np.empty(320, np.float32)
        for k in range(4):
            td = self.tdshape[2]
            buf[k, 1] = adashape_process_frame(
                state["tdshape"][2], buf[k, 1], cond[k],
                td["alpha1_f"], td["alpha1_t"], td["alpha2"],
                self.fnet.cond_dim, FRAME_SIZE, self.avg_pool_k)
            out[k * FRAME_SIZE:(k + 1) * FRAME_SIZE] = \
                adaconv_process_frame(
                    state["af"][3], buf[k].reshape(-1), cond[k],
                    self.af[3]["kernel"], self.af[3]["gain"],
                    FRAME_SIZE, OVERLAP_SIZE, 2, 1,
                    self.af_cfg[3].kernel_size,
                    self.af_cfg[3].filter_gain_a,
                    self.af_cfg[3].filter_gain_b, self.window)
        mem = state["deemph"]
        for i in range(320):
            mem = out[i] + PREEMPH * mem
            out[i] = mem
        state["deemph"] = mem
        return out


class OsceEnhancer:
    """silk_OSCE_struct driver (osce.c:777-990 osce_reset /
    osce_enhance_frame): per-channel enhancement state machine with
    2-frame mute + 10 ms cross-fade after reset."""

    def __init__(self, model):
        self.model = model
        self.features = OsceFeatureState()
        self.reset()

    def reset(self):
        self.state = self.model.make_state()
        self.features.reset()
        self.reset_count = 2

    def enhance_frame(self, frame: SilkFrameInfo) -> np.ndarray:
        """Returns enhanced int16 xq (320 samples @16 kHz, 20 ms).
        Non-20ms/non-16kHz frames must reset instead (osce.c:933-937)."""
        feats, numbits, periods = self.features.calculate(frame)
        x_in = np.asarray(frame.xq[:320], np.float32) / 32768.0
        out = self.model.process_20ms(self.state, x_in, feats, numbits,
                                      periods)
        if self.reset_count > 1:
            out = x_in.copy()
            self.reset_count -= 1
        elif self.reset_count:
            out = cross_fade_10ms(out, x_in)
            self.reset_count = 0
        return np.clip(np.floor(0.5 + 32768.0 * out), -32767,
                       32767).astype(np.int16)
