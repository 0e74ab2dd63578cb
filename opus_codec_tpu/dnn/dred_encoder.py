"""DRED encoder driver (reference: dnn/dred_encoder.c).

Buffers input at 16 kHz, extracts LPCNet features per 10 ms frame, runs
the RDO-VAE encoder every 20 ms, and entropy-codes a variable number of
redundancy chunks with voice-activity trimming into a payload carried
in the packet-extension padding (ID 126).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..bitstream.range_coder import RangeEncoder
from .dred import RDOVAEEncoder
from .dred_coding import DredStats, _encode_latents, compute_quantizer
from .features import LpcNetFeatures

# dred_config.h:32-52
DRED_EXTENSION_ID = 126
DRED_EXPERIMENTAL_VERSION = 10
DRED_EXPERIMENTAL_BYTES = 2
DRED_MIN_BYTES = 8
DRED_SILK_ENCODER_DELAY = 79 + 12 - 80
DRED_FRAME_SIZE = 160
DRED_DFRAME_SIZE = 2 * DRED_FRAME_SIZE
DRED_MAX_DATA_SIZE = 1000
DRED_MAX_LATENTS = 26
DRED_NUM_REDUNDANCY_FRAMES = 2 * DRED_MAX_LATENTS
DRED_MAX_FRAMES = 4 * DRED_MAX_LATENTS
DRED_NUM_FEATURES = 20

RESAMPLING_ORDER = 8

# ellip(7, .2, 70, 7750/24000) for 48 kHz (dred_encoder.c:167-169)
_FILT_48 = (0.004523418224,
            np.array([0.005873358047, 0.012980854831, 0.014531340042,
                      0.014531340042, 0.012980854831, 0.005873358047,
                      0.004523418224, 0.0]),
            np.array([-3.878718597768, 7.748834257468, -9.653651699533,
                      8.007342726666, -4.379450178552, 1.463182111810,
                      -0.231720677804, 0.0]))
_FILT_12 = (0.002033596776,
            np.array([-0.001017101081, 0.003673127243, 0.001009165267,
                      0.001009165267, 0.003673127243, -0.001017101081,
                      0.002033596776, 0.0]),
            np.array([-4.930414411612, 11.291643096504, -15.322037343815,
                      13.216403930898, -7.220409219553, 2.310550142771,
                      -0.334338618782, 0.0]))
_FILT_8 = (0.020109185709,
           np.array([0.081670120929, 0.180401598565, 0.259391051971,
                     0.259391051971, 0.180401598565, 0.081670120929,
                     0.020109185709, 0.0]),
           np.array([-1.393651933659, 2.609789872676, -2.403541968806,
                     2.056814957331, -1.148908574570, 0.473001413788,
                     -0.110359852412, 0.0]))


def filter_df2t(x: np.ndarray, b0: float, b: np.ndarray, a: np.ndarray,
                mem: np.ndarray) -> np.ndarray:
    """Direct-form-II-transposed IIR (dred_encoder.c:103-130)."""
    order = RESAMPLING_ORDER
    out = np.empty_like(x)
    for i in range(len(x)):
        xi = x[i]
        yi = xi * b0 + mem[0]
        nyi = -yi
        for j in range(order):
            mem[j] = mem[j + 1] + b[j] * xi + a[j] * nyi
        out[i] = yi
    return out


def _float2int16(x: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(32768.0 * x), -32768, 32767)


class DredEncoder:
    """DREDEnc (dred_encoder.h); drives latents + payload coding."""

    def __init__(self, model: RDOVAEEncoder, Fs: int, channels: int,
                 stats: Optional[DredStats] = None,
                 features: Optional[LpcNetFeatures] = None):
        self.model = model
        self.Fs = Fs
        self.channels = channels
        self.stats = stats or DredStats.default(model.latent_dim,
                                                model.state_dim)
        self.features = features or LpcNetFeatures()
        self.loaded = True
        self.reset()

    def reset(self):
        self.input_buffer = np.zeros(2 * DRED_DFRAME_SIZE, np.float32)
        self.input_buffer_fill = DRED_SILK_ENCODER_DELAY
        self.latents_buffer = np.zeros(
            (DRED_MAX_FRAMES, self.model.latent_dim), np.float32)
        self.state_buffer = np.zeros(
            (DRED_MAX_FRAMES, self.model.state_dim), np.float32)
        self.latents_buffer_fill = 0
        self.dred_offset = 0
        self.latent_offset = 0
        self.last_extra_dred_offset = 0
        self.resample_mem = np.zeros(RESAMPLING_ORDER + 1)
        self.model.reset()
        self.features.reset()

    # -- 16 kHz conversion (dred_encoder.c:132-185) --------------------

    def _convert_to_16k(self, x: np.ndarray, out_len: int) -> np.ndarray:
        """x: [N] or [N, channels] float +-1 at self.Fs."""
        up = {8000: 2, 12000: 4, 16000: 1, 24000: 2, 48000: 1}[self.Fs]
        if x.ndim == 2:
            mono = 0.5 * (x[:, 0] + x[:, 1]) if x.shape[1] == 2 \
                else x[:, 0]
        else:
            mono = x
        down = np.zeros(up * len(mono))
        down[::up] = _float2int16(np.asarray(mono) * up)
        if self.Fs == 16000:
            return down[:out_len]
        if self.Fs in (48000, 24000):
            b0, b, a = _FILT_48
            y = filter_df2t(down, b0, b, a, self.resample_mem)
            return y[::3][:out_len]
        if self.Fs == 12000:
            b0, b, a = _FILT_12
            y = filter_df2t(down, b0, b, a, self.resample_mem)
            return y[::3][:out_len]
        b0, b, a = _FILT_8       # 8000
        return filter_df2t(down, b0, b, a, self.resample_mem)[:out_len]

    # -- latent computation (dred_encoder.c:187-222) -------------------

    def _process_dframe(self):
        self.latents_buffer[1:] = self.latents_buffer[:-1]
        self.state_buffer[1:] = self.state_buffer[:-1]
        f0 = self.features.compute(self.input_buffer[:DRED_FRAME_SIZE])
        f1 = self.features.compute(
            self.input_buffer[DRED_FRAME_SIZE:2 * DRED_FRAME_SIZE])
        dframe = np.concatenate([f0[:DRED_NUM_FEATURES],
                                 f1[:DRED_NUM_FEATURES]])
        lat, st = self.model.encode_dframe(dframe)
        self.latents_buffer[0] = lat
        self.state_buffer[0] = st
        self.latents_buffer_fill = min(self.latents_buffer_fill + 1,
                                       DRED_NUM_REDUNDANCY_FRAMES)

    def compute_latents(self, pcm: np.ndarray, frame_size: int,
                        extra_delay: int):
        """dred_compute_latents (dred_encoder.c:187-222).  pcm: float
        +-1, [frame_size] or [frame_size, channels] at self.Fs."""
        frame_size16k = frame_size * 16000 // self.Fs
        curr_offset16k = 40 + extra_delay * 16000 // self.Fs \
            - self.input_buffer_fill
        self.dred_offset = int(np.floor((curr_offset16k + 20.0) / 40.0))
        self.latent_offset = 0
        pos = 0
        while frame_size16k > 0:
            process16k = min(2 * DRED_FRAME_SIZE, frame_size16k)
            process = process16k * self.Fs // 16000
            self.input_buffer[self.input_buffer_fill:
                              self.input_buffer_fill + process16k] = \
                self._convert_to_16k(pcm[pos:pos + process], process16k)
            self.input_buffer_fill += process16k
            if self.input_buffer_fill >= 2 * DRED_FRAME_SIZE:
                curr_offset16k += 320
                self._process_dframe()
                self.input_buffer_fill -= 2 * DRED_FRAME_SIZE
                self.input_buffer[:self.input_buffer_fill] = \
                    self.input_buffer[2 * DRED_FRAME_SIZE:
                                      2 * DRED_FRAME_SIZE
                                      + self.input_buffer_fill]
                # 15 ms is the ideal offset (vocoder look-ahead)
                if self.dred_offset < 6:
                    self.dred_offset += 8
                else:
                    self.latent_offset += 1
            pos += process
            frame_size16k -= process16k

    # -- payload coding (dred_encode_silk_frame, :260-361) -------------

    def encode_silk_frame(self, max_chunks: int, max_bytes: int,
                          q0: int, dQ: int, qmax: int,
                          activity_mem) -> bytes:
        def voice_active(offset: int) -> bool:
            return any(activity_mem[8 * offset + i] for i in range(16))

        latent_offset = self.latent_offset
        extra_dred_offset = 0
        delayed_dred = False
        if activity_mem[0] and self.last_extra_dred_offset > 0:
            latent_offset = self.last_extra_dred_offset
            delayed_dred = True
            self.last_extra_dred_offset = 0
        while latent_offset < self.latents_buffer_fill \
                and not voice_active(latent_offset):
            latent_offset += 1
            extra_dred_offset += 1
        if not delayed_dred:
            self.last_extra_dred_offset = extra_dred_offset

        enc = RangeEncoder(max_bytes)
        enc.enc_uint(q0, 16)
        enc.enc_uint(dQ, 8)
        total_offset = 16 - (self.dred_offset - extra_dred_offset * 8)
        assert total_offset >= 0
        if total_offset > 31:
            enc.enc_uint(1, 2)
            enc.enc_uint(total_offset >> 5, 256)
            enc.enc_uint(total_offset & 31, 32)
        else:
            enc.enc_uint(0, 2)
            enc.enc_uint(total_offset, 32)
        if q0 < 14 and dQ > 0:
            nvals = 15 - (q0 + 1)
            if qmax >= 15:
                enc.encode(0, nvals, 2 * nvals)
            else:
                enc.encode(nvals + qmax - (q0 + 1), nvals + qmax - q0,
                           2 * nvals)
        st = self.stats
        _encode_latents(enc, self.state_buffer[latent_offset],
                        st.state_scale[q0], st.state_dead_zone[q0],
                        st.state_r[q0], st.state_p0[q0])
        if enc.tell() > 8 * max_bytes:
            return b""
        bak = enc.save()
        prev_active = False
        dred_encoded = 0
        for i in range(0, min(2 * max_chunks,
                              self.latents_buffer_fill - latent_offset
                              - 1), 2):
            q = compute_quantizer(q0, dQ, qmax, i // 2)
            _encode_latents(enc, self.latents_buffer[i + latent_offset],
                            st.latent_scale[q], st.latent_dead_zone[q],
                            st.latent_r[q], st.latent_p0[q])
            if enc.tell() > 8 * max_bytes:
                if i == 0:
                    return b""
                break
            active = voice_active(i + latent_offset)
            if active or prev_active:
                bak = enc.save()
                dred_encoded = i + 2
            prev_active = active
        if dred_encoded == 0 or (dred_encoded <= 2 and extra_dred_offset):
            return b""
        enc.restore(bak)
        nbytes = (enc.tell() + 7) // 8
        enc.shrink(nbytes)
        enc.done()
        return enc.data()[:nbytes]


# -- opus-level rate planning (opus_encoder.c:574-636) ----------------

_DRED_BITS_TABLE = [73.2, 68.1, 62.5, 57.0, 51.5, 45.7, 39.9, 32.4,
                    26.4, 20.4, 16.3, 13.0, 9.3, 8.2, 7.2, 6.4]


def estimate_dred_bitrate(q0: int, dQ: int, qmax: int, duration: int,
                          target_bits: int):
    """Returns (bits, target_chunks)."""
    bits = 8.0 * (3 + DRED_EXPERIMENTAL_BYTES)
    bits += 50.0 + _DRED_BITS_TABLE[q0]
    dred_chunks = min((duration + 5) // 4, DRED_NUM_REDUNDANCY_FRAMES // 2)
    target_chunks = 0
    for i in range(dred_chunks):
        q = compute_quantizer(q0, dQ, qmax, i)
        bits += _DRED_BITS_TABLE[q]
        if bits < target_bits:
            target_chunks = i + 1
    return int(np.floor(0.5 + bits)), target_chunks


def compute_dred_bitrate(bitrate_bps: int, frame_size: int, Fs: int,
                         dred_duration: int, use_fec: bool,
                         loss_perc: int):
    """Returns (dred_bitrate, q0, dQ, qmax, target_chunks)."""
    if use_fec:
        dred_frac = min(0.7, 3.0 * loss_perc / 100.0)
        bitrate_offset = 20000
    else:
        if loss_perc > 5:
            dred_frac = min(0.8, 0.55 + loss_perc / 100.0)
        else:
            dred_frac = 12 * loss_perc / 100.0
        bitrate_offset = 12000
    dred_frac = dred_frac / (dred_frac + (1 - dred_frac)
                             * (frame_size * 50.0) / Fs)
    q0 = min(15, max(4, 51 - 3 * max(1, bitrate_bps
                                     - bitrate_offset).bit_length()))
    dQ = 3 if bitrate_bps - bitrate_offset > 36000 else 5
    qmax = 15
    target = max(0, int(dred_frac * (bitrate_bps - bitrate_offset)))
    if dred_duration > 0:
        target_bits = target * frame_size // Fs
        max_bits, target_chunks = estimate_dred_bitrate(
            q0, dQ, qmax, dred_duration, target_bits)
    else:
        max_bits, target_chunks = 0, 0
    dred_bitrate = min(target, max_bits * Fs // frame_size)
    if target_chunks < 2:
        dred_bitrate = 0
    return dred_bitrate, q0, dQ, qmax, target_chunks
