"""Tonality / music-speech analysis (reference: src/analysis.c).

Runs a 20 ms-hop spectral analysis at a 24 kHz internal rate over a
30 ms buffer: per-bin tonality from FFT phase acceleration, 18-band
energies, bandwidth detection against a noise floor, band-leakage
boosts, and a 25-feature MLP (dense 32 → GRU 24 → dense 2, weights
src/mlp_data.c) producing music/activity probabilities.  The encoder
uses the output for mode (SILK/CELT), bandwidth and DTX decisions.

Structure mirrors run_analysis/tonality_analysis/tonality_get_info
(analysis.c:955/446/235); math is float32 like the reference float
build, vectorized over bins/bands with numpy.
"""

from __future__ import annotations

import numpy as np

from . import analysis_data as D

NB_FRAMES = 8
NB_TBANDS = 18
ANALYSIS_BUF_SIZE = 720          # 30 ms at 24 kHz
ANALYSIS_COUNT_MAX = 10000
DETECT_SIZE = 100
NB_TONAL_SKIP_BANDS = 9
LEAK_BANDS = 19
TRANSITION_PENALTY = 10.0
LEAKAGE_OFFSET = 2.5
LEAKAGE_SLOPE = 2.0

# tables (analysis.c:106-109; window/DCT reproduce the literal tables
# exactly — see tests)
TBANDS = np.array([4, 8, 12, 16, 20, 24, 28, 32, 40, 48, 56, 64,
                   80, 96, 112, 136, 160, 192, 240])
_W = np.round(np.sin(np.pi * (np.arange(240) + 1) / 480) ** 2,
              6).astype(np.float32)
_i = np.arange(8)[:, None]
_b = np.arange(16)[None, :]
DCT_TABLE = np.round(
    0.25 * np.where(_i == 0, 1, np.sqrt(2)) *
    np.cos(np.pi * _i * (_b + 0.5) / 16), 6).astype(np.float32)

STD_FEATURE_BIAS = np.array([5.684947, 3.475288, 1.770634, 1.599784,
                             3.773215, 2.163313, 1.260756, 1.116868,
                             1.918795], np.float32)

_f32 = np.float32


# -- fast_atan2f / tansig approximations (celt/mathops.h:38-66,
#    src/mlp.c:39-58) — must match the reference's rational approx --

def fast_atan2(y: np.ndarray, x: np.ndarray) -> np.ndarray:
    cA, cB, cC = _f32(0.43157974), _f32(0.67848403), _f32(0.08595542)
    cE = _f32(np.pi / 2)
    x = x.astype(np.float32)
    y = y.astype(np.float32)
    x2 = x * x
    y2 = y * y
    with np.errstate(divide="ignore", invalid="ignore"):
        den1 = (y2 + cB * x2) * (y2 + cC * x2)
        r1 = -x * y * (y2 + cA * x2) / den1 + np.where(y < 0, -cE, cE)
        den2 = (x2 + cB * y2) * (x2 + cC * y2)
        r2 = x * y * (x2 + cA * y2) / den2 + np.where(y < 0, -cE, cE) \
            - np.where(x * y < 0, -cE, cE)
    out = np.where(x2 < y2, r1, r2)
    return np.where(x2 + y2 < 1e-18, _f32(0), out).astype(np.float32)


def tansig_approx(x: np.ndarray) -> np.ndarray:
    N0, N1, N2 = _f32(952.52801514), _f32(96.39235687), _f32(0.60863042)
    D0, D1, D2 = _f32(952.72399902), _f32(413.36801147), _f32(11.88600922)
    x = np.asarray(x, np.float32)
    x2 = x * x
    num = (N2 * x2 + N1) * x2 + N0
    den = (D2 * x2 + D1) * x2 + D0
    return np.clip(num * x / den, -1.0, 1.0).astype(np.float32)


def sigmoid_approx(x: np.ndarray) -> np.ndarray:
    return _f32(0.5) + _f32(0.5) * tansig_approx(_f32(0.5) * np.asarray(x, np.float32))


WEIGHTS_SCALE = _f32(1.0 / 128)


def _dense(layer, x: np.ndarray) -> np.ndarray:
    bias, w, m, n, sigmoid = layer
    out = bias.astype(np.float32) + \
        w.astype(np.float32).reshape(m, n).T @ x
    out *= WEIGHTS_SCALE
    return sigmoid_approx(out) if sigmoid else tansig_approx(out)


def _gru(layer, state: np.ndarray, x: np.ndarray) -> np.ndarray:
    """analysis_compute_gru (src/mlp.c:92-131): z/r/h gates packed
    along the 3N column-stride axis."""
    bias, w, rw, m, n = layer
    W = w.astype(np.float32).reshape(m, 3 * n)
    R = rw.astype(np.float32).reshape(n, 3 * n)
    b = bias.astype(np.float32)
    z = sigmoid_approx(WEIGHTS_SCALE * (b[:n] + W[:, :n].T @ x
                                        + R[:, :n].T @ state))
    r = sigmoid_approx(WEIGHTS_SCALE * (b[n:2 * n] + W[:, n:2 * n].T @ x
                                        + R[:, n:2 * n].T @ state))
    h = b[2 * n:] + W[:, 2 * n:].T @ x + R[:, 2 * n:].T @ (state * r)
    return (z * state + (1 - z) * tansig_approx(WEIGHTS_SCALE * h)) \
        .astype(np.float32)


def _down2_hp(S: np.ndarray, x: np.ndarray):
    """silk_resampler_down2_hp float path (analysis.c:111-161):
    2x allpass decimator + complementary HP energy accumulator."""
    c0, c1 = _f32(0.6074371), _f32(0.15063)
    n2 = len(x) // 2
    out = np.empty(n2, np.float32)
    hp_ener = 0.0
    s0, s1, s2 = float(S[0]), float(S[1]), float(S[2])
    for k in range(n2):
        in32 = float(x[2 * k])
        X = c0 * (in32 - s0)
        o = s0 + X
        s0 = in32 + X
        ohp = o
        in32 = float(x[2 * k + 1])
        X = c1 * (in32 - s1)
        o = o + s1 + X
        s1 = in32 + X
        X = c1 * (-in32 - s2)
        ohp = ohp + s2 + X
        s2 = -in32 + X
        hp_ener += ohp * ohp
        out[k] = 0.5 * o
    S[0], S[1], S[2] = s0, s1, s2
    return out, _f32(hp_ener)


class AnalysisInfo:
    """celt/celt.h:59-73."""

    def __init__(self):
        self.valid = 0
        self.tonality = 0.0
        self.tonality_slope = 0.0
        self.noisiness = 0.0
        self.activity = 0.0
        self.music_prob = 0.0
        self.music_prob_min = 0.0
        self.music_prob_max = 0.0
        self.bandwidth = 0
        self.activity_probability = 0.0
        self.max_pitch_ratio = 1.0
        self.leak_boost = np.zeros(LEAK_BANDS, np.uint8)

    def copy_from(self, o: "AnalysisInfo"):
        self.__dict__.update({k: (v.copy() if isinstance(v, np.ndarray)
                                  else v) for k, v in o.__dict__.items()})


class TonalityAnalysisState:
    """analysis.h:76-100 state; 24 kHz internal analysis rate."""

    def __init__(self, Fs: int):
        self.Fs = Fs
        self.reset()

    def reset(self):
        self.angle = np.zeros(240, np.float32)
        self.d_angle = np.zeros(240, np.float32)
        self.d2_angle = np.zeros(240, np.float32)
        self.inmem = np.zeros(ANALYSIS_BUF_SIZE, np.float32)
        self.mem_fill = 0
        self.prev_band_tonality = np.zeros(NB_TBANDS, np.float32)
        self.prev_tonality = 0.0
        self.prev_bandwidth = 0
        self.E = np.zeros((NB_FRAMES, NB_TBANDS), np.float32)
        self.logE = np.zeros((NB_FRAMES, NB_TBANDS), np.float32)
        self.lowE = np.zeros(NB_TBANDS, np.float32)
        self.highE = np.zeros(NB_TBANDS, np.float32)
        self.meanE = np.zeros(NB_TBANDS + 1, np.float32)
        self.mem = np.zeros(32, np.float32)
        self.cmean = np.zeros(8, np.float32)
        self.std = np.zeros(9, np.float32)
        self.Etracker = 0.0
        self.lowECount = 0.0
        self.E_count = 0
        self.count = 0
        self.analysis_offset = 0
        self.write_pos = 0
        self.read_pos = 0
        self.read_subframe = 0
        self.hp_ener_accum = 0.0
        self.initialized = False
        self.rnn_state = np.zeros(24, np.float32)
        self.downmix_state = np.zeros(3, np.float32)
        self.info = [AnalysisInfo() for _ in range(DETECT_SIZE)]

    # -- input conditioning (analysis.c:163-216) -----------------------

    def _downmix_resample(self, frames: np.ndarray, out_off: int,
                          n: int, offset: int) -> float:
        """Mean-downmix [C, N] float frames (c1=0, c2=-2 semantics)
        and resample Fs→24 kHz into inmem[out_off:]; returns >12 kHz
        energy (48 kHz input only)."""
        if n == 0:
            return 0.0
        Fs = self.Fs
        if Fs == 48000:
            sub, off = 2 * n, 2 * offset
        elif Fs == 16000:
            sub, off = 2 * n // 3, 2 * offset // 3
        else:
            sub, off = n, offset
        x = frames[:, off:off + sub].mean(axis=0).astype(np.float32)
        if Fs == 48000:
            y, hp = _down2_hp(self.downmix_state, x)
        elif Fs == 24000:
            y, hp = x, 0.0
        else:  # 16000: naive 3x repeat then down2 (analysis.c:200-212)
            y, hp = _down2_hp(self.downmix_state, np.repeat(x, 3))
        self.inmem[out_off:out_off + len(y)] = y
        return float(hp)

    # -- one 20 ms analysis step (tonality_analysis, analysis.c:446) ---

    def _analysis_step(self, frames: np.ndarray, n24: int, offset24: int,
                       lsb_depth: int):
        if not self.initialized:
            self.mem_fill = 240
            self.initialized = True
        alpha = _f32(1.0 / min(10, 1 + self.count))
        alphaE = _f32(1.0 / min(25, 1 + self.count))
        alphaE2 = _f32(1.0 / min(100, 1 + self.count))
        if self.count <= 1:
            alphaE2 = _f32(1.0)

        take = min(n24, ANALYSIS_BUF_SIZE - self.mem_fill)
        self.hp_ener_accum += self._downmix_resample(
            frames, self.mem_fill, take, offset24)
        if self.mem_fill + n24 < ANALYSIS_BUF_SIZE:
            self.mem_fill += n24
            return
        hp_ener = self.hp_ener_accum
        info = self.info[self.write_pos]
        self.write_pos = (self.write_pos + 1) % DETECT_SIZE

        buf = self.inmem.copy()
        # is_digital_silence (opus_encoder.c:933-947, float build)
        is_silence = float(np.abs(buf).max(initial=0.0)) \
            <= 1.0 / (1 << lsb_depth)
        # two overlapping windowed 480-sample frames (offset 240 = 10 ms)
        # packed as real/imag of one complex FFT (analysis.c:540-547)
        N, N2 = 480, 240
        window = np.concatenate([_W, _W[::-1]])
        fin = np.empty(N, np.complex64)
        fin.real = window * buf[:N]
        fin.imag = window * buf[N2:N2 + N]
        self.inmem[:240] = self.inmem[ANALYSIS_BUF_SIZE - 240:]
        remaining = n24 - take
        self.hp_ener_accum = self._downmix_resample(
            frames, 240, remaining, offset24 + take)
        self.mem_fill = 240 + remaining
        if is_silence:
            info.copy_from(self.info[(self.write_pos - 2) % DETECT_SIZE])
            return

        out = np.fft.fft(fin).astype(np.complex64) / _f32(N)
        if not np.isfinite(out[0].real):
            info.valid = 0
            return

        # per-bin tonality from phase acceleration (analysis.c:571-614)
        i = np.arange(1, N2)
        X1r = out.real[i] + out.real[N - i]
        X1i = out.imag[i] - out.imag[N - i]
        X2r = out.imag[i] + out.imag[N - i]
        X2i = out.real[N - i] - out.real[i]
        inv2pi = _f32(0.5 / np.pi)
        angle = inv2pi * fast_atan2(X1i, X1r)
        d_angle = angle - self.angle[1:N2]
        d2_angle = d_angle - self.d_angle[1:N2]
        angle2 = inv2pi * fast_atan2(X2i, X2r)
        d_angle2 = angle2 - angle
        d2_angle2 = d_angle2 - d_angle
        mod1 = d2_angle - np.rint(d2_angle).astype(np.float32)
        noisiness = np.abs(mod1)
        mod1 = mod1 ** 4
        mod2 = d2_angle2 - np.rint(d2_angle2).astype(np.float32)
        noisiness = noisiness + np.abs(mod2)
        mod2 = mod2 ** 4
        avg_mod = _f32(0.25) * (self.d2_angle[1:N2] + mod1 + 2 * mod2)
        pi4 = _f32(np.pi ** 4)
        tonality = 1.0 / (1.0 + 40.0 * 16.0 * pi4 * avg_mod) - 0.015
        tonality2 = 1.0 / (1.0 + 40.0 * 16.0 * pi4 * mod2) - 0.015
        self.angle[1:N2] = angle2
        self.d_angle[1:N2] = d_angle2
        self.d2_angle[1:N2] = mod2
        # neighbour smoothing of the undelayed detector
        t2 = np.concatenate(([0.0], tonality2)).astype(np.float32)
        ton = np.concatenate(([0.0], tonality)).astype(np.float32)
        idx = np.arange(2, N2 - 1)
        tt = np.minimum(t2[idx], np.maximum(t2[idx - 1], t2[idx + 1]))
        ton[idx] = 0.9 * np.maximum(ton[idx], tt - 0.1)
        tonality = ton
        noise = np.concatenate(([0.0], noisiness)).astype(np.float32)

        if not self.count:
            self.lowE[:] = 1e10
            self.highE[:] = -1e10

        binE = (out.real ** 2)[:N2 + 1].copy()
        binE[1:N2] += out.real[N - 1:N2:-1] ** 2 \
            + out.imag[1:N2] ** 2 + out.imag[N - 1:N2:-1] ** 2
        # DC band (analysis.c:631-645)
        e0 = (2 * out.real[0]) ** 2 + (2 * out.imag[0]) ** 2 \
            + binE[1:4].sum()
        band_log2 = np.empty(NB_TBANDS + 1, np.float32)
        band_log2[0] = 0.5 * 1.442695 * np.log(e0 + 1e-10)

        E = np.empty(NB_TBANDS, np.float32)
        tE = np.empty(NB_TBANDS, np.float32)
        nE = np.empty(NB_TBANDS, np.float32)
        for b in range(NB_TBANDS):
            s = slice(TBANDS[b], TBANDS[b + 1])
            be = binE[s]
            E[b] = be.sum()
            tE[b] = (be * np.maximum(0, tonality[s])).sum()
            nE[b] = (be * 2.0 * (0.5 - noise[s])).sum()
        if not np.all(E < 1e9) or not np.all(np.isfinite(E)):
            info.valid = 0
            return

        self.E[self.E_count] = E
        frame_noisiness = float((nE / (1e-15 + E)).sum()) / NB_TBANDS
        frame_loudness = float(np.sqrt(E + 1e-10).sum())
        logE = np.log(E + 1e-10).astype(np.float32)
        band_log2[1:] = 0.5 * 1.442695 * logE
        self.logE[self.E_count] = logE
        if self.count == 0:
            self.highE[:] = self.lowE[:] = logE
        # low/high trackers (analysis.c:682-702)
        shrink = self.highE > self.lowE + 7.5
        toward_high = self.highE - logE > logE - self.lowE
        self.highE[shrink & toward_high] -= 0.01
        self.lowE[shrink & ~toward_high] += 0.01
        up = logE > self.highE
        self.highE[up] = logE[up]
        self.lowE[up] = np.maximum(self.highE[up] - 15, self.lowE[up])
        dn = (logE < self.lowE) & ~up
        self.lowE[dn] = logE[dn]
        self.highE[dn] = np.minimum(self.lowE[dn] + 15, self.highE[dn])
        relativeE = float(((logE - self.lowE)
                           / (1e-5 + self.highE - self.lowE)).sum()) \
            / NB_TBANDS

        L1 = np.sqrt(self.E).sum(axis=0)
        L2 = self.E.sum(axis=0)
        stationarity = np.minimum(
            0.99, L1 / np.sqrt(1e-15 + NB_FRAMES * L2)) ** 4
        frame_stationarity = float(stationarity.sum()) / NB_TBANDS
        band_tonality = np.maximum(tE / (1e-15 + E),
                                   stationarity * self.prev_band_tonality)
        # running sum over a sliding window of NB_TONAL_SKIP_BANDS bands
        ft = 0.0
        max_frame_tonality = 0.0
        slope = 0.0
        for b in range(NB_TBANDS):
            ft += band_tonality[b]
            if b >= NB_TBANDS - NB_TONAL_SKIP_BANDS:
                ft -= band_tonality[b - NB_TBANDS + NB_TONAL_SKIP_BANDS]
            max_frame_tonality = max(max_frame_tonality,
                                     (1.0 + 0.03 * (b - NB_TBANDS)) * ft)
            slope += band_tonality[b] * (b - 8)
        self.prev_band_tonality = band_tonality.astype(np.float32)

        # leakage boosts (analysis.c:729-764)
        leak_from = band_log2.copy()
        leak_to = band_log2 - LEAKAGE_OFFSET
        for b in range(1, NB_TBANDS + 1):
            ls = LEAKAGE_SLOPE * (TBANDS[b] - TBANDS[b - 1]) / 4
            leak_from[b] = min(leak_from[b - 1] + ls, band_log2[b])
            leak_to[b] = max(leak_to[b - 1] - ls,
                             band_log2[b] - LEAKAGE_OFFSET)
        for b in range(NB_TBANDS - 2, -1, -1):
            ls = LEAKAGE_SLOPE * (TBANDS[b + 1] - TBANDS[b]) / 4
            leak_from[b] = min(leak_from[b + 1] + ls, leak_from[b])
            leak_to[b] = max(leak_to[b + 1] - ls, leak_to[b])
        boost = np.maximum(0, leak_to - band_log2) \
            + np.maximum(0, band_log2 - (leak_from + LEAKAGE_OFFSET))
        info.leak_boost[:NB_TBANDS + 1] = np.minimum(
            255, np.floor(0.5 + 64.0 * boost)).astype(np.uint8)
        info.leak_boost[NB_TBANDS + 1:] = 0

        # spectral variability (analysis.c:766-785)
        d = self.logE[:, None, :] - self.logE[None, :, :]
        dist = (d * d).sum(axis=2)
        np.fill_diagonal(dist, 1e15)
        spec_variability = float(
            np.sqrt(dist.min(axis=1).sum() / NB_FRAMES / NB_TBANDS))

        # bandwidth detection (analysis.c:786-856)
        noise_floor = (5.7e-4 / (1 << max(0, lsb_depth - 8))) ** 2
        maxE = float(E.max())
        bandwidth = 0
        bandwidth_mask = 0.0
        below_max_pitch = float(E[TBANDS[:-1] < 64].sum())
        above_max_pitch = float(E[TBANDS[:-1] >= 64].sum())
        is_masked = np.zeros(NB_TBANDS + 1, bool)
        for b in range(NB_TBANDS):
            width = TBANDS[b + 1] - TBANDS[b]
            self.meanE[b] = max((1 - alphaE2) * self.meanE[b], E[b])
            Em = max(E[b], self.meanE[b])
            if E[b] * 1e9 > maxE and (Em > 3 * noise_floor * width
                                      or E[b] > noise_floor * width):
                bandwidth = b + 1
            thr = 0.01 if self.prev_bandwidth >= b + 1 else 0.05
            is_masked[b] = E[b] < thr * bandwidth_mask
            bandwidth_mask = max(0.05 * bandwidth_mask, E[b])
        if self.Fs == 48000:
            Ehp = hp_ener * (1.0 / (60 * 60))
            noise_ratio = 10.0 if self.prev_bandwidth == 20 else 30.0
            above_max_pitch += Ehp
            self.meanE[NB_TBANDS] = max(
                (1 - alphaE2) * self.meanE[NB_TBANDS], Ehp)
            Em = max(Ehp, self.meanE[NB_TBANDS])
            if Em > 3 * noise_ratio * noise_floor * 160 \
                    or Ehp > noise_ratio * noise_floor * 160:
                bandwidth = 20
            thr = 0.01 if self.prev_bandwidth == 20 else 0.05
            is_masked[NB_TBANDS] = Ehp < thr * bandwidth_mask
        info.max_pitch_ratio = (below_max_pitch / above_max_pitch
                                if above_max_pitch > below_max_pitch
                                else 1.0)
        if bandwidth == 20 and is_masked[NB_TBANDS]:
            bandwidth -= 2
        elif 0 < bandwidth <= NB_TBANDS and is_masked[bandwidth - 1]:
            bandwidth -= 1
        if self.count <= 2:
            bandwidth = 20

        # loudness tracking (analysis.c:857-862)
        frame_loudness = 20 * np.log10(frame_loudness)
        self.Etracker = max(self.Etracker - 0.003, frame_loudness)
        self.lowECount *= (1 - alphaE)
        if frame_loudness < self.Etracker - 30:
            self.lowECount += alphaE

        # BFCC + features (analysis.c:864-932)
        BFCC = DCT_TABLE @ logE[:16]
        midE = DCT_TABLE @ (0.5 * (self.highE[:16] + self.lowE[:16]))
        if self.count < 10:
            relativeE = 0.5
        info.activity = frame_noisiness \
            + (1 - frame_noisiness) * relativeE
        frame_tonality = max_frame_tonality \
            / (NB_TBANDS - NB_TONAL_SKIP_BANDS)
        frame_tonality = max(frame_tonality, self.prev_tonality * 0.8)
        self.prev_tonality = frame_tonality
        slope /= 8 * 8
        info.tonality_slope = slope
        self.E_count = (self.E_count + 1) % NB_FRAMES
        self.count = min(self.count + 1, ANALYSIS_COUNT_MAX)
        info.tonality = frame_tonality

        features = np.zeros(25, np.float32)
        m = self.mem
        features[:4] = -0.12299 * (BFCC[:4] + m[24:28]) \
            + 0.49195 * (m[:4] + m[16:20]) + 0.69693 * m[8:12] \
            - 1.4349 * self.cmean[:4]
        self.cmean[:] = (1 - alpha) * self.cmean + alpha * BFCC
        features[4:8] = 0.63246 * (BFCC[:4] - m[24:28]) \
            + 0.31623 * (m[:4] - m[16:20])
        features[8:11] = 0.53452 * (BFCC[:3] + m[24:27]) \
            - 0.26726 * (m[:3] + m[16:19]) - 0.53452 * m[8:11]
        if self.count > 5:
            self.std[:] = (1 - alpha) * self.std \
                + alpha * features[:9] ** 2
        features[:4] = BFCC[:4] - midE[:4]
        self.mem[24:32] = self.mem[16:24]
        self.mem[16:24] = self.mem[8:16]
        self.mem[8:16] = self.mem[:8]
        self.mem[:8] = BFCC
        features[11:20] = np.sqrt(self.std) - STD_FEATURE_BIAS
        features[18] = spec_variability - 0.78
        features[20] = info.tonality - 0.154723
        features[21] = info.activity - 0.724643
        features[22] = frame_stationarity - 0.743717
        features[23] = info.tonality_slope + 0.069216
        features[24] = self.lowECount - 0.067930

        layer_out = _dense(D.LAYER0, features)
        self.rnn_state = _gru(D.LAYER1, self.rnn_state, layer_out)
        frame_probs = _dense(D.LAYER2, self.rnn_state)
        info.activity_probability = float(frame_probs[1])
        info.music_prob = float(frame_probs[0])
        info.bandwidth = bandwidth
        self.prev_bandwidth = bandwidth
        info.noisiness = frame_noisiness
        info.valid = 1

    # -- lookahead buffering (run_analysis, analysis.c:955-981) --------

    def run(self, frames: np.ndarray, analysis_frame_size: int,
            frame_size: int, lsb_depth: int = 24) -> AnalysisInfo:
        """frames: [C, N] float in [-1, 1] at self.Fs; returns the
        AnalysisInfo aligned with the frame being encoded."""
        info = AnalysisInfo()
        analysis_frame_size -= analysis_frame_size & 1
        if frames is not None:
            Fs = self.Fs
            analysis_frame_size = min((DETECT_SIZE - 5) * Fs // 50,
                                      analysis_frame_size)
            pcm_len = analysis_frame_size - self.analysis_offset
            offset = self.analysis_offset
            while pcm_len > 0:
                n = min(Fs // 50, pcm_len)
                if Fs == 48000:
                    n24, off24 = n // 2, offset // 2
                elif Fs == 16000:
                    n24, off24 = 3 * n // 2, 3 * offset // 2
                else:
                    n24, off24 = n, offset
                self._analysis_step(frames, n24, off24, lsb_depth)
                offset += Fs // 50
                pcm_len -= Fs // 50
            self.analysis_offset = analysis_frame_size - frame_size
        self._get_info(info, frame_size)
        return info

    def _get_info(self, info_out: AnalysisInfo, length: int):
        """tonality_get_info (analysis.c:235-411)."""
        pos = self.read_pos
        curr_lookahead = self.write_pos - self.read_pos
        if curr_lookahead < 0:
            curr_lookahead += DETECT_SIZE
        self.read_subframe += length // (self.Fs // 400)
        while self.read_subframe >= 8:
            self.read_subframe -= 8
            self.read_pos += 1
        if self.read_pos >= DETECT_SIZE:
            self.read_pos -= DETECT_SIZE
        if length > self.Fs // 50 and pos != self.write_pos:
            pos = (pos + 1) % DETECT_SIZE
        if pos == self.write_pos:
            pos -= 1
        if pos < 0:
            pos = DETECT_SIZE - 1
        pos0 = pos
        info_out.copy_from(self.info[pos])
        if not info_out.valid:
            return
        tonality_max = tonality_avg = info_out.tonality
        tonality_count = 1
        bandwidth_span = 6
        for _ in range(3):
            pos = (pos + 1) % DETECT_SIZE
            if pos == self.write_pos:
                break
            tonality_max = max(tonality_max, self.info[pos].tonality)
            tonality_avg += self.info[pos].tonality
            tonality_count += 1
            info_out.bandwidth = max(info_out.bandwidth,
                                     self.info[pos].bandwidth)
            bandwidth_span -= 1
        pos = pos0
        for _ in range(bandwidth_span):
            pos -= 1
            if pos < 0:
                pos = DETECT_SIZE - 1
            if pos == self.write_pos:
                break
            info_out.bandwidth = max(info_out.bandwidth,
                                     self.info[pos].bandwidth)
        info_out.tonality = max(tonality_avg / tonality_count,
                                tonality_max - 0.2)

        mpos = vpos = pos0
        if curr_lookahead > 15:
            mpos = (mpos + 5) % DETECT_SIZE
            vpos = (vpos + 1) % DETECT_SIZE
        # switching-threshold minimization (analysis.c:305-383)
        prob_min, prob_max = 1.0, 0.0
        vad_prob = self.info[vpos].activity_probability
        prob_count = max(0.1, vad_prob)
        prob_avg = max(0.1, vad_prob) * self.info[mpos].music_prob
        while True:
            mpos = (mpos + 1) % DETECT_SIZE
            if mpos == self.write_pos:
                break
            vpos = (vpos + 1) % DETECT_SIZE
            if vpos == self.write_pos:
                break
            pos_vad = self.info[vpos].activity_probability
            prob_min = min((prob_avg - TRANSITION_PENALTY
                            * (vad_prob - pos_vad)) / prob_count, prob_min)
            prob_max = max((prob_avg + TRANSITION_PENALTY
                            * (vad_prob - pos_vad)) / prob_count, prob_max)
            prob_count += max(0.1, pos_vad)
            prob_avg += max(0.1, pos_vad) * self.info[mpos].music_prob
        info_out.music_prob = prob_avg / prob_count
        prob_min = max(min(prob_avg / prob_count, prob_min), 0.0)
        prob_max = min(max(prob_avg / prob_count, prob_max), 1.0)
        if curr_lookahead < 10:
            pmin, pmax = prob_min, prob_max
            pos = pos0
            for _ in range(min(self.count - 1, 15)):
                pos -= 1
                if pos < 0:
                    pos = DETECT_SIZE - 1
                pmin = min(pmin, self.info[pos].music_prob)
                pmax = max(pmax, self.info[pos].music_prob)
            pmin = max(0.0, pmin - 0.1 * vad_prob)
            pmax = min(1.0, pmax + 0.1 * vad_prob)
            prob_min += (1.0 - 0.1 * curr_lookahead) * (pmin - prob_min)
            prob_max += (1.0 - 0.1 * curr_lookahead) * (pmax - prob_max)
        info_out.music_prob_min = prob_min
        info_out.music_prob_max = prob_max
