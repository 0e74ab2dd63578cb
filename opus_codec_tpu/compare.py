"""Conformance quality metric — the framework's own ``opus_compare``.

Behavioural parity: /root/reference/opus/src/opus_compare.c:89-382 (the
RFC 8251 test-vector gate: a 21-band weighted log-spectral distortion over
480-sample Hann windows with 120-sample steps, with frequency/temporal
masking and a SILK/CELT crossover deadzone).  The DFT loop (band_energy,
opus_compare.c:89-151) is vectorized as an rfft over the window axis.

CLI:  python -m opus_codec_tpu.compare [-s] [-r rate2] file1.sw file2.sw
Exit status 0 = test vector PASSES (same contract as the C tool).
"""

from __future__ import annotations

import sys

import numpy as np

NBANDS = 21
NFREQS = 240
# Bark-derived CELT bands (opus_compare.c:158-161)
BANDS = np.array([0, 2, 4, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48,
                  56, 68, 80, 96, 120, 156, 200], np.int32)
TEST_WIN_SIZE = 480
TEST_WIN_STEP = 120

_YBANDS = {8000: 13, 12000: 15, 16000: 17, 24000: 19, 48000: NBANDS}


def read_pcm16(path: str, nchannels: int) -> np.ndarray:
    """read_pcm16 (opus_compare.c:55-86): little-endian s16 → float
    [N, nchannels] (values in full int16 range, not normalized)."""
    raw = np.fromfile(path, np.dtype("<i2"))
    n = len(raw) // nchannels
    return raw[:n * nchannels].astype(np.float32).reshape(n, nchannels)


def band_energy(sig: np.ndarray, nbands: int, nframes: int,
                window_sz: int, step: int, downsample: int):
    """band_energy (opus_compare.c:89-151).

    sig: [N, C].  Returns (xb [nframes, NBANDS, C] band means or None
    when nbands covers the y-signal, ps [nframes, window_sz//2, C]
    per-bin energies + 1e5 floor)."""
    nch = sig.shape[1]
    k = np.arange(window_sz, dtype=np.float64)
    window = (0.5 - 0.5 * np.cos((2 * np.pi / (window_sz - 1)) * k)
              ).astype(np.float32)
    idx = (np.arange(nframes)[:, None] * step
           + np.arange(window_sz)[None, :])
    x = sig[idx] * window[None, :, None]            # [F, W, C]
    spec = np.fft.rfft(x, axis=1)[:, :window_sz // 2, :]
    ps = ((spec.real * downsample) ** 2
          + (spec.imag * downsample) ** 2 + 100000.0).astype(np.float32)
    xb = np.empty((nframes, nbands, nch), np.float32)
    for bi in range(nbands):
        lo, hi = int(BANDS[bi]), int(BANDS[bi + 1])
        xb[:, bi, :] = ps[:, lo:hi, :].sum(axis=1) / (hi - lo)
    return xb, ps


def compare(x: np.ndarray, y: np.ndarray, nchannels: int,
            rate: int = 48000):
    """Weighted spectral distortion between reference ``x`` (always
    48 kHz) and test ``y`` (at ``rate``); both [N, C] int16-scaled
    floats.  Returns (err, Q) per opus_compare.c:262-369."""
    downsample = 48000 // rate
    ybands = _YBANDS[rate]
    yfreqs = NFREQS // downsample
    xlength = x.shape[0]
    if xlength != y.shape[0] * downsample:
        raise ValueError("Sample counts do not match "
                         f"({xlength}!={y.shape[0] * downsample})")
    if xlength < TEST_WIN_SIZE:
        raise ValueError("Insufficient sample data")
    nframes = (xlength - TEST_WIN_SIZE + TEST_WIN_STEP) // TEST_WIN_STEP

    xb, X = band_energy(x, NBANDS, nframes, TEST_WIN_SIZE,
                        TEST_WIN_STEP, 1)
    _, Y = band_energy(y, ybands, nframes, TEST_WIN_SIZE // downsample,
                       TEST_WIN_STEP // downsample, downsample)
    X = X[:, :NFREQS, :].astype(np.float64)
    Y = Y[:, :yfreqs, :].astype(np.float64)
    xb = xb.astype(np.float64)

    # frequency masking: 10 dB/Bark up-slope, 15 dB/Bark down-slope
    for bi in range(1, NBANDS):
        xb[:, bi, :] += 0.1 * xb[:, bi - 1, :]
    for bi in range(NBANDS - 2, -1, -1):
        xb[:, bi, :] += 0.03 * xb[:, bi + 1, :]
    # temporal masking: -3 dB/2.5 ms slope (sequential over frames)
    for xi in range(1, nframes):
        xb[xi] += 0.5 * xb[xi - 1]
    if nchannels == 2:
        l, r = xb[:, :, 0].copy(), xb[:, :, 1].copy()
        xb[:, :, 0] += 0.01 * r
        xb[:, :, 1] += 0.01 * l
    # apply masking to both spectra
    for bi in range(ybands):
        lo, hi = int(BANDS[bi]), int(BANDS[bi + 1])
        X[:, lo:hi, :] += 0.1 * xb[:, bi:bi + 1, :]
        Y[:, lo:hi, :] += 0.1 * xb[:, bi:bi + 1, :]

    # average consecutive frames (opus_compare.c:311-331)
    X[1:, :int(BANDS[ybands]), :] = (X[1:, :int(BANDS[ybands]), :]
                                     + X[:-1, :int(BANDS[ybands]), :])
    Y[1:, :int(BANDS[ybands]), :] = (Y[1:, :int(BANDS[ybands]), :]
                                     + Y[:-1, :int(BANDS[ybands]), :])

    if rate == 48000:
        max_compare = int(BANDS[NBANDS])
    elif rate == 12000:
        max_compare = int(BANDS[ybands])
    else:
        max_compare = int(BANDS[ybands]) - 3

    err = 0.0
    for xi in range(nframes):
        Ef = 0.0
        for bi in range(ybands):
            lo = int(BANDS[bi])
            hi = min(int(BANDS[bi + 1]), max_compare)
            if hi <= lo:
                continue
            re = Y[xi, lo:hi, :] / X[xi, lo:hi, :]
            im = re - np.log(re) - 1
            # SILK/CELT crossover deadzone (opus_compare.c:347-349)
            bins = np.arange(lo, hi)
            w = np.where((bins >= 79) & (bins <= 81), 0.1, 1.0)
            w = np.where(bins == 80, w * 0.1, w)
            im = im * w[:, None]
            Eb = im.sum() / ((int(BANDS[bi + 1]) - int(BANDS[bi]))
                             * nchannels)
            Ef += Eb * Eb
        Ef /= NBANDS
        Ef *= Ef
        err += Ef * Ef
    err = (err / nframes) ** (1.0 / 16)
    Q = 100 * (1 - 0.5 * np.log(1 + err) / np.log(1.13))
    return float(err), float(Q)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    nchannels = 1
    rate = 48000
    if argv and argv[0] == "-s":
        nchannels = 2
        argv.pop(0)
    if argv and argv[0] == "-r":
        rate = int(argv[1])
        if rate not in (8000, 12000, 16000, 24000, 48000):
            print("Sampling rate must be 8000, 12000, 16000, 24000, "
                  "or 48000", file=sys.stderr)
            return 1
        del argv[:2]
    if len(argv) != 2:
        print("Usage: opus_codec_tpu.compare [-s] [-r rate2] "
              "<file1.sw> <file2.sw>", file=sys.stderr)
        return 1
    # file1 is always read as stereo and downmixed for mono compares
    # (opus_compare.c:232-236)
    x = read_pcm16(argv[0], 2)
    if nchannels == 1:
        x = (0.5 * (x[:, 0] + x[:, 1]))[:, None]
    y = read_pcm16(argv[1], nchannels)
    try:
        err, q = compare(x, y, nchannels, rate)
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 1
    if q < 0:
        print("Test vector FAILS", file=sys.stderr)
        print(f"Internal weighted error is {err:f}", file=sys.stderr)
        return 1
    print("Test vector PASSES", file=sys.stderr)
    print(f"Opus quality metric: {q:.1f} % "
          f"(internal weighted error is {err:f})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
