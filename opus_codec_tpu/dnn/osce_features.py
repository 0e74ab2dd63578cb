"""OSCE feature extraction (opus/dnn/osce_features.c).

93-dim per-5ms-subframe features for the LACE/NoLACE speech enhancers:

* [0:64]   clean log spectrum from the SILK LPC filter (inverse
  magnitude response onto a 64-band triangular filterbank, 0.3*log)
* [64:82]  noisy 18-band cepstrum of the decoded signal (sine window,
  DCT-II with the LPCNet table)
* [82:87]  normalised autocorrelation at pitch lag -2..+2
* [87:92]  LTP coefficients (Q14 scaled)
* [92]     log subframe gain

plus pitch postprocessing (unvoiced -> OSCE_NO_PITCH_VALUE) and the
bit-count pair [num_bits, smoothed].
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import numpy as np

from .features import DCT_TABLE, dct

OSCE_FEATURES_MAX_HISTORY = 350
OSCE_FEATURE_DIM = 93
OSCE_CLEAN_SPEC_NUM_BANDS = 64
OSCE_NOISY_SPEC_NUM_BANDS = 18
OSCE_NO_PITCH_VALUE = 7
OSCE_PREEMPH = 0.85
OSCE_CLEAN_SPEC_START = 0
OSCE_NOISY_CEPSTRUM_START = 64
OSCE_ACORR_START = 82
OSCE_LTP_START = 87
OSCE_LOG_GAIN_START = 92
SPEC_WINDOW_SIZE = 320
SPEC_NUM_FREQS = 161
TYPE_VOICED = 2     # silk/define.h signal types: 0 no voice act., 1 unv, 2 v

CENTER_BINS_CLEAN = np.array([
    0, 2, 5, 8, 10, 12, 15, 18, 20, 22, 25, 28, 30, 33, 35, 38,
    40, 42, 45, 48, 50, 52, 55, 58, 60, 62, 65, 68, 70, 73, 75, 78,
    80, 82, 85, 88, 90, 92, 95, 98, 100, 102, 105, 108, 110, 112, 115,
    118, 120, 122, 125, 128, 130, 132, 135, 138, 140, 142, 145, 148,
    150, 152, 155, 160], np.int32)

CENTER_BINS_NOISY = np.array([0, 4, 8, 12, 16, 20, 24, 28, 32, 40, 48,
                              56, 64, 80, 96, 112, 136, 160], np.int32)

BAND_WEIGHTS_CLEAN = np.array([
    2/3, .4, 1/3, .4, .5, .4, 1/3, .4, .5, .4, 1/3, .4, .4, .4, .4, .4,
    .5, .4, 1/3, .4, .5, .4, 1/3, .4, .5, .4, 1/3, .4, .4, .4, .4, .4,
    .5, .4, 1/3, .4, .5, .4, 1/3, .4, .5, .4, 1/3, .4, .5, .4, 1/3, .4,
    .5, .4, 1/3, .4, .5, .4, 1/3, .4, .5, .4, 1/3, .4, .5, .4, .25, 1/3],
    np.float32)

BAND_WEIGHTS_NOISY = np.array([
    .4, .25, .25, .25, .25, .25, .25, .25, 1/6, .125, .125, .125,
    1/12, .0625, .0625, .05, 1/24, .08], np.float32)

# osce_features.c:83-167: sine window sin(pi*(i+0.5)/320)
OSCE_WINDOW = np.sin(np.pi * (np.arange(SPEC_WINDOW_SIZE) + 0.5)
                     / SPEC_WINDOW_SIZE).astype(np.float32)


def apply_filterbank(x: np.ndarray, center_bins: np.ndarray,
                     weights: np.ndarray) -> np.ndarray:
    """osce_features.c:169-192 triangular filterbank."""
    nb = len(center_bins)
    out = np.zeros(nb, np.float64)
    for b in range(nb - 1):
        i = np.arange(center_bins[b], center_bins[b + 1])
        frac = (center_bins[b + 1] - i) / (center_bins[b + 1]
                                           - center_bins[b])
        seg = x[center_bins[b]:center_bins[b + 1]]
        out[b] += weights[b] * np.sum(frac * seg)
        out[b + 1] += weights[b + 1] * np.sum((1 - frac) * seg)
    out[nb - 1] += weights[nb - 1] * x[center_bins[nb - 1]]
    return out.astype(np.float32)


def _mag_spec_320(x: np.ndarray) -> np.ndarray:
    """osce_features.c:194-207: |FFT| with the reference's scaling
    (kiss forward includes 1/N; multiplied back by N)."""
    return np.abs(np.fft.rfft(x, SPEC_WINDOW_SIZE)).astype(np.float32)


def log_spectrum_from_lpc(a_q12: np.ndarray, lpc_order: int) -> np.ndarray:
    """osce_features.c:209-233: 64-band 0.3*log inverse-LPC spectrum."""
    buf = np.zeros(SPEC_WINDOW_SIZE, np.float32)
    buf[0] = 1.0
    buf[1:lpc_order + 1] = -np.asarray(a_q12[:lpc_order],
                                       np.float32) / 4096.0
    mag = _mag_spec_320(buf)
    inv = 1.0 / (mag + 1e-9)
    spec = apply_filterbank(inv, CENTER_BINS_CLEAN, BAND_WEIGHTS_CLEAN)
    return (0.3 * np.log(spec + 1e-9)).astype(np.float32)


def noisy_cepstrum(signal: np.ndarray) -> np.ndarray:
    """osce_features.c:235-258: windowed 18-band log spectrum -> DCT."""
    x = OSCE_WINDOW * signal[:SPEC_WINDOW_SIZE]
    mag = _mag_spec_320(x)
    spec = apply_filterbank(mag, CENTER_BINS_NOISY, BAND_WEIGHTS_NOISY)
    return dct(np.log(spec + 1e-9).astype(np.float32))


def pitch_acorr(signal: np.ndarray, pos: int, lag: int) -> np.ndarray:
    """osce_features.c:260-276: normalised acorr at lag-2..lag+2;
    ``pos`` is the subframe start in ``signal``."""
    out = np.empty(5, np.float32)
    x = signal[pos:pos + 80]
    xx = float(np.dot(x, x))
    for k in range(-2, 3):
        y = signal[pos - lag + k:pos - lag + k + 80]
        yy = float(np.dot(y, y))
        xy = float(np.dot(x, y))
        out[k + 2] = xy / np.sqrt(xx * yy + 1e-9)
    return out


@dataclass
class SilkFrameInfo:
    """The slice of silk_decoder_state/control that OSCE features read
    (osce_features.c:303-312)."""
    xq: np.ndarray                 # int16 decoded speech, nb_subfr*80
    pitch_lags: np.ndarray         # [nb_subfr]
    ltp_coef_q14: np.ndarray       # [nb_subfr, 5]
    gains_q16: np.ndarray          # [nb_subfr]
    pred_coef_q12: np.ndarray      # [2, lpc_order]
    signal_type: int
    lpc_order: int = 16
    num_bits: int = 0


class OsceFeatureState:
    """OSCEFeatureState: signal history + pitch hangover + numbits."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.signal_history = np.zeros(OSCE_FEATURES_MAX_HISTORY,
                                       np.float32)
        self.numbits_smooth = 0.0
        self.last_type = 0
        self.last_lag = 0
        self.pitch_hangover_count = 0

    def _pitch_postprocessing(self, lag: int, sig_type: int) -> int:
        """osce_features.c:278-301 (hangover disabled, matching the
        reference's OSCE_HANGOVER_BUGFIX-off default)."""
        if sig_type != TYPE_VOICED:
            new_lag = OSCE_NO_PITCH_VALUE
            self.pitch_hangover_count = 0
        else:
            new_lag = lag
            self.last_lag = lag
            self.pitch_hangover_count = 0
        self.last_type = sig_type
        return new_lag

    def calculate(self, frame: SilkFrameInfo
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """osce_calculate_features (osce_features.c:303-380).

        Returns (features [nb_subfr, 93], numbits [2], periods
        [nb_subfr])."""
        nsub = len(frame.pitch_lags)
        nsamp = nsub * 80
        self.numbits_smooth = (0.9 * self.numbits_smooth
                               + 0.1 * frame.num_bits)
        numbits = np.array([frame.num_bits, self.numbits_smooth],
                           np.float32)
        buf = np.zeros(OSCE_FEATURES_MAX_HISTORY + nsamp, np.float32)
        buf[:OSCE_FEATURES_MAX_HISTORY] = self.signal_history
        buf[OSCE_FEATURES_MAX_HISTORY:] = \
            np.asarray(frame.xq[:nsamp], np.float32) / 32768.0

        features = np.zeros((nsub, OSCE_FEATURE_DIM), np.float32)
        periods = np.zeros(nsub, np.int32)
        for k in range(nsub):
            pos = OSCE_FEATURES_MAX_HISTORY + k * 80
            f = features[k]
            if k % 2 == 0:
                f[OSCE_CLEAN_SPEC_START:OSCE_CLEAN_SPEC_START + 64] = \
                    log_spectrum_from_lpc(frame.pred_coef_q12[k >> 1],
                                          frame.lpc_order)
                f[OSCE_NOISY_CEPSTRUM_START:
                  OSCE_NOISY_CEPSTRUM_START + 18] = \
                    noisy_cepstrum(buf[pos - 160:pos + 160])
            else:
                f[OSCE_CLEAN_SPEC_START:OSCE_CLEAN_SPEC_START + 64] = \
                    features[k - 1][OSCE_CLEAN_SPEC_START:
                                    OSCE_CLEAN_SPEC_START + 64]
                f[OSCE_NOISY_CEPSTRUM_START:
                  OSCE_NOISY_CEPSTRUM_START + 18] = \
                    features[k - 1][OSCE_NOISY_CEPSTRUM_START:
                                    OSCE_NOISY_CEPSTRUM_START + 18]
            periods[k] = self._pitch_postprocessing(
                int(frame.pitch_lags[k]), frame.signal_type)
            f[OSCE_ACORR_START:OSCE_ACORR_START + 5] = \
                pitch_acorr(buf, pos, int(periods[k]))
            f[OSCE_LTP_START:OSCE_LTP_START + 5] = \
                np.asarray(frame.ltp_coef_q14[k], np.float32) / 16384.0
            f[OSCE_LOG_GAIN_START] = np.log(
                float(frame.gains_q16[k]) / 65536.0 + 1e-9)
        self.signal_history = buf[nsamp:nsamp
                                  + OSCE_FEATURES_MAX_HISTORY].copy()
        return features, numbits, periods


def cross_fade_10ms(x_enhanced: np.ndarray,
                    x_in: np.ndarray) -> np.ndarray:
    """osce_features.c:382-390."""
    out = x_enhanced.copy()
    out[:160] = (OSCE_WINDOW[:160] * x_enhanced[:160]
                 + (1 - OSCE_WINDOW[:160]) * x_in[:160])
    return out
