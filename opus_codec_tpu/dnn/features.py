"""LPCNet feature extraction — the analysis front-end shared by deep
PLC, DRED and FARGAN.

Re-implements opus/dnn/freq.c + lpcnet_enc.c at 16 kHz:

* frame_analysis (lpcnet_enc.c:74-83): 320-sample window (160 overlap),
  Vorbis half-window (dump_lpcnet_tables.c:84), rFFT, 18 triangular
  bands on the eband5ms layout (freq.c:62-64 table, x2 edge bands);
* cepstrum: log10 band energies with (max-8, follow-2.5) clamping,
  DCT-II (sqrt(2/N) norm, sqrt(.5) DC), features[0] -= 4
  (lpcnet_enc.c:143-151);
* LPC from cepstrum (freq.c lpc_from_cepstrum: idct -> band gains ->
  interp -> inverse FFT autocorrelation -> noise floor + lag window ->
  Levinson);
* excitation/pitch buffers: celt_fir whitening, +0.7 tilt, low-pass
  biquad, running-energy-normalised cross-correlation features and
  instantaneous-frequency features for the pitch DNN
  (lpcnet_enc.c:109-197);
* burg_cepstral_analysis (freq.c:232-266): two half-frame Burg spectra
  (silk_burg_analysis, burg.c:88-246) -> cepstra -> sum/difference.

The pitch estimate uses the PitchDNN when weights are loaded and a
normalised-autocorrelation argmax otherwise (same lag grid), so the
driver logic is identical either way.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

NB_BANDS = 18
FRAME_SIZE = 160
OVERLAP_SIZE = 160
WINDOW_SIZE = 320
FREQ_SIZE = WINDOW_SIZE // 2 + 1
TRAINING_OFFSET = 80
LPC_ORDER = 16
PREEMPHASIS = 0.85
NB_FEATURES = 20
NB_TOTAL_FEATURES = 36
PITCH_MIN_PERIOD = 32
PITCH_MAX_PERIOD = 256
PITCH_BUF_SIZE = PITCH_MAX_PERIOD + 320
PITCH_IF_MAX_FREQ = 30
PITCH_IF_FEATURES = 3 * PITCH_IF_MAX_FREQ - 2
NB_XCORR_FEATURES = PITCH_MAX_PERIOD - PITCH_MIN_PERIOD

EBAND5MS = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24,
                     28, 34, 40], np.int32)
WINDOW_SIZE_5MS = 4       # freq.h:40: bins per eband5ms unit (40*4=160)

COMPENSATION = np.array([0.8, 1, 1, 1, 1, 1, 1, 1, 0.666667, 0.5, 0.5,
                         0.5, 0.333333, 0.25, 0.25, 0.2, 0.166667,
                         0.173913], np.float32)


def _half_window() -> np.ndarray:
    i = np.arange(OVERLAP_SIZE)
    s = np.sin(0.5 * np.pi * (i + 0.5) / OVERLAP_SIZE)
    return np.sin(0.5 * np.pi * s * s).astype(np.float32)


def _dct_table() -> np.ndarray:
    i = np.arange(NB_BANDS)[:, None]
    j = np.arange(NB_BANDS)[None, :]
    t = np.cos((i + 0.5) * j * np.pi / NB_BANDS)
    t[:, 0] *= np.sqrt(0.5)
    return t.astype(np.float32)


HALF_WINDOW = _half_window()
DCT_TABLE = _dct_table()     # [i, j] = cos((i+.5) j pi/N), j=0 scaled


def dct(x: np.ndarray) -> np.ndarray:
    """freq.c:262-271: out[i] = sum_j in[j]*T[j,i] * sqrt(2/N)."""
    return (x @ DCT_TABLE) * np.sqrt(2.0 / NB_BANDS)


def idct(x: np.ndarray) -> np.ndarray:
    return (DCT_TABLE @ x) * np.sqrt(2.0 / NB_BANDS)


def compute_band_energy(X: np.ndarray) -> np.ndarray:
    """lpcn_compute_band_energy (freq.c:119-141): triangular bands."""
    p = np.abs(X) ** 2
    return _bands(p)


def compute_band_energy_inverse(X: np.ndarray) -> np.ndarray:
    """freq.c:62-84: same, on 1/(|X|^2 + 1e-9)."""
    p = 1.0 / (np.abs(X) ** 2 + 1e-9)
    return _bands(p)


def _bands(p: np.ndarray) -> np.ndarray:
    s = np.zeros(NB_BANDS, np.float64)
    for i in range(NB_BANDS - 1):
        bs = (EBAND5MS[i + 1] - EBAND5MS[i]) * WINDOW_SIZE_5MS
        j = np.arange(bs)
        frac = j / bs
        seg = p[EBAND5MS[i] * WINDOW_SIZE_5MS:
                EBAND5MS[i] * WINDOW_SIZE_5MS + bs]
        s[i] += np.sum((1 - frac) * seg)
        s[i + 1] += np.sum(frac * seg)
    s[0] *= 2
    s[-1] *= 2
    return s.astype(np.float32)


def _log_clamp(E: np.ndarray) -> np.ndarray:
    """The (logMax-8, follow-2.5) double clamp (lpcnet_enc.c:143-150)."""
    Ly = np.empty(NB_BANDS, np.float32)
    logMax = -2.0
    follow = -2.0
    for i in range(NB_BANDS):
        v = np.log10(1e-2 + E[i])
        v = max(logMax - 8, max(follow - 2.5, v))
        logMax = max(logMax, v)
        follow = max(follow - 2.5, v)
        Ly[i] = v
    return Ly


def silk_burg_analysis(x: np.ndarray, min_inv_gain: float,
                       subfr_length: int, nb_subfr: int,
                       D: int) -> tuple:
    """Burg LPC (dnn/burg.c:88-246, double accumulators).
    Returns (A[D], residual_energy)."""
    x = np.asarray(x, np.float64)
    C0 = float(np.sum(x[:nb_subfr * subfr_length] ** 2))
    C_first = np.zeros(D)
    for s in range(nb_subfr):
        xs = x[s * subfr_length:(s + 1) * subfr_length]
        for n in range(1, D + 1):
            C_first[n - 1] += float(np.dot(xs[:subfr_length - n], xs[n:]))
    C_last = C_first.copy()
    CAf = np.zeros(D + 1)
    CAb = np.zeros(D + 1)
    CAf[0] = CAb[0] = C0 + 1e-5 * C0 + 1e-9
    Af = np.zeros(D)
    inv_gain = 1.0
    reached = False
    for n in range(D):
        for s in range(nb_subfr):
            xs = x[s * subfr_length:(s + 1) * subfr_length]
            tmp1 = xs[n]
            tmp2 = xs[subfr_length - n - 1]
            for k in range(n):
                C_first[k] -= xs[n] * xs[n - k - 1]
                C_last[k] -= xs[subfr_length - n - 1] * xs[subfr_length - n + k]
                tmp1 += xs[n - k - 1] * Af[k]
                tmp2 += xs[subfr_length - n + k] * Af[k]
            for k in range(n + 1):
                CAf[k] -= tmp1 * xs[n - k]
                CAb[k] -= tmp2 * xs[subfr_length - n + k - 1]
        tmp1 = C_first[n]
        tmp2 = C_last[n]
        for k in range(n):
            tmp1 += C_last[n - k - 1] * Af[k]
            tmp2 += C_first[n - k - 1] * Af[k]
        CAf[n + 1] = tmp1
        CAb[n + 1] = tmp2
        num = CAb[n + 1]
        nrg_b = CAb[0]
        nrg_f = CAf[0]
        for k in range(n):
            num += CAb[n - k] * Af[k]
            nrg_b += CAb[k + 1] * Af[k]
            nrg_f += CAf[k + 1] * Af[k]
        rc = -2.0 * num / (nrg_f + nrg_b)
        t = inv_gain * (1.0 - rc * rc)
        if t <= min_inv_gain:
            rc = np.sqrt(1.0 - min_inv_gain / inv_gain)
            if num > 0:
                rc = -rc
            inv_gain = min_inv_gain
            reached = True
        else:
            inv_gain = t
        for k in range((n + 1) >> 1):
            t1, t2 = Af[k], Af[n - k - 1]
            Af[k] = t1 + rc * t2
            Af[n - k - 1] = t2 + rc * t1
        Af[n] = rc
        if reached:
            Af[n + 1:] = 0
            break
        for k in range(n + 2):
            t1 = CAf[k]
            CAf[k] += rc * CAb[n - k + 1]
            CAb[n - k + 1] += rc * t1
    if reached:
        for s in range(nb_subfr):
            C0 -= float(np.sum(x[s * subfr_length:s * subfr_length + D] ** 2))
        nrg_f = C0 * inv_gain
    else:
        nrg_f = CAf[0]
        t1 = 1.0
        for k in range(D):
            nrg_f += CAf[k + 1] * Af[k]
            t1 += Af[k] * Af[k]
        nrg_f -= 1e-5 * C0 * t1
    return (-Af).astype(np.float32), max(0.0, float(nrg_f))


def _forward_transform(x: np.ndarray) -> np.ndarray:
    """freq.c:274-287 forward_transform with kiss 1/N scaling."""
    return np.fft.rfft(x, WINDOW_SIZE) / WINDOW_SIZE


def compute_burg_cepstrum(pcm: np.ndarray, length: int,
                          order: int) -> np.ndarray:
    """freq.c:232-256."""
    burg_in = pcm[1:length] - PREEMPHASIS * pcm[:length - 1]
    lpc, g = silk_burg_analysis(burg_in, 1e-3, length - 1, 1, order)
    g /= length - 2 * (order - 1)
    x = np.zeros(WINDOW_SIZE, np.float32)
    x[0] = 1
    x[1:order + 1] = -lpc * (0.995 ** np.arange(1, order + 1))
    X = _forward_transform(x)
    E = compute_band_energy_inverse(X)
    E *= 0.45 * g * (1.0 / WINDOW_SIZE ** 3)
    ceps = dct(_log_clamp(E))
    ceps[0] -= 4
    return ceps


def burg_cepstral_analysis(x: np.ndarray) -> np.ndarray:
    """freq.c:258-269: two half-frames -> mean / difference cepstra."""
    c0 = compute_burg_cepstrum(x[:FRAME_SIZE // 2], FRAME_SIZE // 2,
                               LPC_ORDER)
    c1 = compute_burg_cepstrum(x[FRAME_SIZE // 2:FRAME_SIZE],
                               FRAME_SIZE // 2, LPC_ORDER)
    return np.concatenate([0.5 * (c0 + c1), c0 - c1]).astype(np.float32)


def _levinson(ac: np.ndarray, p: int) -> np.ndarray:
    """lpcn_lpc (freq.c:86-117) with early bailout at 30 dB."""
    lpc = np.zeros(p, np.float64)
    error = float(ac[0])
    if ac[0] == 0:
        return lpc.astype(np.float32)
    for i in range(p):
        rr = float(np.dot(lpc[:i], ac[i:0:-1])) + ac[i + 1]
        r = -rr / error
        lpc[i] = r
        for j in range((i + 1) >> 1):
            t1, t2 = lpc[j], lpc[i - 1 - j]
            lpc[j] = t1 + r * t2
            lpc[i - 1 - j] = t2 + r * t1
        error -= r * r * error
        error -= r * r * error   # reference applies the update twice
        if error < 0.001 * float(ac[0]):
            break
    return lpc.astype(np.float32)


def _interp_band_gain(bandE: np.ndarray) -> np.ndarray:
    g = np.zeros(FREQ_SIZE, np.float32)
    for i in range(NB_BANDS - 1):
        bs = (EBAND5MS[i + 1] - EBAND5MS[i]) * WINDOW_SIZE_5MS
        j = np.arange(bs)
        frac = j / bs
        g[EBAND5MS[i] * WINDOW_SIZE_5MS:
          EBAND5MS[i] * WINDOW_SIZE_5MS + bs] = \
            (1 - frac) * bandE[i] + frac * bandE[i + 1]
    return g


def lpc_from_cepstrum(cepstrum: np.ndarray) -> np.ndarray:
    """freq.c:345-356 lpc_from_cepstrum -> LPC_ORDER coefficients."""
    tmp = cepstrum[:NB_BANDS].copy()
    tmp[0] += 4
    Ex = (10.0 ** idct(tmp)) * COMPENSATION
    Xr = _interp_band_gain(Ex)
    Xr[-1] = 0
    # inverse_transform of a real symmetric spectrum = scaled irfft
    x_auto = np.fft.irfft(Xr, WINDOW_SIZE).astype(np.float64) * WINDOW_SIZE
    ac = x_auto[:LPC_ORDER + 1].copy()
    ac[0] += ac[0] * 1e-4 + 320 / 12 / 38.0
    ac[1:] *= 1 - 6e-5 * np.arange(1, LPC_ORDER + 1) ** 2
    return _levinson(ac, LPC_ORDER)


class LpcNetFeatures:
    """LPCNetEncState analogue (lpcnet_private.h:24-44 +
    lpcnet_enc.c:109-230): streaming 36-feature extraction."""

    LP_B = np.array([-0.84946, 1.0])
    LP_A = np.array([-1.54220, 0.70781])

    def __init__(self, pitchdnn=None):
        self.pitchdnn = pitchdnn
        self.reset()

    def reset(self):
        self.analysis_mem = np.zeros(OVERLAP_SIZE, np.float32)
        self.mem_preemph = 0.0
        self.prev_if = np.zeros(PITCH_IF_MAX_FREQ, np.complex128)
        self.pitch_mem = np.zeros(LPC_ORDER, np.float32)
        self.pitch_filt = 0.0
        self.exc_buf = np.zeros(PITCH_BUF_SIZE, np.float32)
        self.lp_buf = np.zeros(PITCH_BUF_SIZE, np.float32)
        self.lp_mem = np.zeros(2, np.float64)
        if self.pitchdnn is not None:
            self.pitchdnn.reset()

    def _frame_analysis(self, frame: np.ndarray):
        x = np.concatenate([self.analysis_mem, frame]).astype(np.float32)
        self.analysis_mem = frame[-OVERLAP_SIZE:].copy()
        x[:OVERLAP_SIZE] *= HALF_WINDOW
        x[WINDOW_SIZE - OVERLAP_SIZE:] *= HALF_WINDOW[::-1]
        X = _forward_transform(x)
        return X, compute_band_energy(X)

    def _biquad(self, x: np.ndarray) -> np.ndarray:
        b, a = self.LP_B, self.LP_A
        y = np.empty_like(x)
        m0, m1 = self.lp_mem
        for i in range(len(x)):
            xi = x[i]
            yi = xi + m0
            m00 = m0
            m0 = (b[0] - a[0]) * xi + m1 - a[0] * m0
            m1 = (b[1] - a[1]) * xi - a[1] * m00
            y[i] = yi
        self.lp_mem[:] = (m0, m1)
        return y

    def compute(self, pcm: np.ndarray) -> np.ndarray:
        """lpcnet_compute_single_frame_features_float: 160 samples at
        16 kHz (int16 scale) -> 36 features."""
        pcm = np.asarray(pcm, np.float32)
        # preemphasis (lpcnet_enc.c:200-208): y[i] = x[i] - coef*x[i-1]
        x = np.empty(FRAME_SIZE, np.float32)
        x[0] = pcm[0] + self.mem_preemph
        x[1:] = pcm[1:] - PREEMPHASIS * pcm[:-1]
        self.mem_preemph = -PREEMPHASIS * float(pcm[-1])

        features = np.zeros(NB_TOTAL_FEATURES, np.float32)
        aligned = np.concatenate([
            self.analysis_mem[OVERLAP_SIZE - TRAINING_OFFSET:],
            x[:FRAME_SIZE - TRAINING_OFFSET]]).astype(np.float32)
        X, Ex = self._frame_analysis(x)

        # IF features for the pitch DNN (lpcnet_enc.c:129-141)
        if_f = np.zeros(PITCH_IF_FEATURES, np.float32)
        if_f[0] = np.clip((10 * np.log10(1e-15 + X[0].real ** 2) - 6) / 64,
                          -1, 1)
        prod = X[1:PITCH_IF_MAX_FREQ] * np.conj(self.prev_if[1:])
        norm = 1.0 / np.sqrt(1e-15 + np.abs(prod) ** 2)
        prod = prod * norm
        if_f[1:3 * PITCH_IF_MAX_FREQ - 2:3] = prod.real
        if_f[2:3 * PITCH_IF_MAX_FREQ - 2:3] = prod.imag
        if_f[3::3] = np.clip(
            (10 * np.log10(1e-15 + np.abs(X[1:PITCH_IF_MAX_FREQ]) ** 2) - 6)
            / 64, -1, 1)
        self.prev_if = X[:PITCH_IF_MAX_FREQ].copy()

        features[:NB_BANDS] = dct(_log_clamp(Ex))
        features[0] -= 4
        lpc = lpc_from_cepstrum(features[:NB_BANDS])
        features[NB_BANDS + 2:NB_BANDS + 2 + LPC_ORDER] = lpc

        # excitation + low-passed buffers (lpcnet_enc.c:154-166)
        self.exc_buf[:PITCH_MAX_PERIOD] = \
            self.exc_buf[FRAME_SIZE:FRAME_SIZE + PITCH_MAX_PERIOD]
        self.lp_buf[:PITCH_MAX_PERIOD] = \
            self.lp_buf[FRAME_SIZE:FRAME_SIZE + PITCH_MAX_PERIOD]
        xin = np.concatenate([self.pitch_mem, aligned])
        self.pitch_mem = aligned[-LPC_ORDER:].copy()
        # celt_fir: y[i] = x[i] + sum lpc[j]*x[i-j-1]
        fir = aligned.copy()
        for j in range(LPC_ORDER):
            fir += lpc[j] * xin[LPC_ORDER - j - 1:
                                LPC_ORDER - j - 1 + FRAME_SIZE]
        self.lp_buf[PITCH_MAX_PERIOD:PITCH_MAX_PERIOD + FRAME_SIZE] = fir
        for i in range(FRAME_SIZE):
            self.exc_buf[PITCH_MAX_PERIOD + i] = \
                self.lp_buf[PITCH_MAX_PERIOD + i] + 0.7 * self.pitch_filt
            self.pitch_filt = self.lp_buf[PITCH_MAX_PERIOD + i]
        self.lp_buf[PITCH_MAX_PERIOD:PITCH_MAX_PERIOD + FRAME_SIZE] = \
            self._biquad(self.lp_buf[PITCH_MAX_PERIOD:
                                     PITCH_MAX_PERIOD + FRAME_SIZE])

        # normalised xcorr features (lpcnet_enc.c:167-186)
        buf = self.exc_buf
        cur = buf[PITCH_MAX_PERIOD:PITCH_MAX_PERIOD + FRAME_SIZE]
        xcorr = np.array([
            np.dot(cur, buf[i:i + FRAME_SIZE])
            for i in range(NB_XCORR_FEATURES)])
        ener0 = float(np.dot(cur, cur))
        ener1 = float(np.dot(buf[:FRAME_SIZE], buf[:FRAME_SIZE]))
        xcf = np.empty(NB_XCORR_FEATURES, np.float32)
        for i in range(NB_XCORR_FEATURES):
            xcf[i] = 2 * xcorr[i] / (1 + ener0 + ener1)
            ener1 += (buf[i + FRAME_SIZE] * float(buf[i + FRAME_SIZE])
                      - buf[i] * float(buf[i]))

        # pitch (lpcnet_enc.c:187-197)
        if self.pitchdnn is not None:
            dnn_pitch = self.pitchdnn.compute(if_f, xcf)
        else:
            # Fallback lag estimate on the same grid when no pitch model
            # is loaded: normalised-xcorr peak, preferring the shortest
            # lag among near-maximal peaks to avoid octave doubling.
            # Feature index i corresponds to lag PITCH_MAX_PERIOD - i.
            best = float(np.max(xcf))
            cand = np.nonzero(xcf >= max(0.9 * best, best - 0.1))[0]
            lag = PITCH_MAX_PERIOD - int(cand[-1])
            dnn_pitch = float(np.log2(256.0 / lag) - 1.5)
        pitch = int(np.floor(0.5 + 256.0 / 2.0 **
                             ((1.0 / 60.0) * ((dnn_pitch + 1.5) * 60))))
        lp = self.lp_buf
        xx = float(np.dot(lp[PITCH_MAX_PERIOD:PITCH_MAX_PERIOD + FRAME_SIZE],
                          lp[PITCH_MAX_PERIOD:PITCH_MAX_PERIOD + FRAME_SIZE]))
        yy = float(np.dot(lp[PITCH_MAX_PERIOD - pitch:
                             PITCH_MAX_PERIOD - pitch + FRAME_SIZE],
                          lp[PITCH_MAX_PERIOD - pitch:
                             PITCH_MAX_PERIOD - pitch + FRAME_SIZE]))
        xy = float(np.dot(lp[PITCH_MAX_PERIOD:PITCH_MAX_PERIOD + FRAME_SIZE],
                          lp[PITCH_MAX_PERIOD - pitch:
                             PITCH_MAX_PERIOD - pitch + FRAME_SIZE]))
        frame_corr = xy / np.sqrt(1 + xx * yy)
        frame_corr = (np.log(1 + np.exp(5 * frame_corr))
                      / np.log(1 + np.exp(5.0)))
        features[NB_BANDS] = dnn_pitch
        features[NB_BANDS + 1] = frame_corr - 0.5
        return features
