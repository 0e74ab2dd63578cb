"""Batched SILK decode core vs the scalar decoder (ground truth,
itself bit-exact against libopus — test_silk_decoder_oracle).

The device synthesis must be *bit-exact*: SILK is defined in int32
arithmetic, so equality is exact, not approximate."""
import numpy as np
import pytest

import jax.numpy as jnp

from opus_codec_tpu.silk import batch_core as core
from opus_codec_tpu.silk.batch_decoder import SilkBatchDecoder
from opus_codec_tpu.silk.decoder import (CODE_CONDITIONALLY,
                                         CODE_INDEPENDENTLY,
                                         FLAG_DECODE_NORMAL,
                                         SilkChannelState, _icdf,
                                         decode_pulses)
from opus_codec_tpu.silk import tables as T
from opus_codec_tpu.bitstream.range_coder import RangeDecoder


def test_fixed32_matches_sigproc():
    """jnp int32 primitives == scalar sigproc on adversarial values."""
    from opus_codec_tpu.ops import fixed32 as fx
    from opus_codec_tpu.silk import sigproc as sp
    rng = np.random.default_rng(0)
    a = np.concatenate([
        rng.integers(-2**31, 2**31, 4000),
        [0, 1, -1, 2**31 - 1, -2**31, 0x7FFF, -0x8000, 0x10000,
         -0x10000]]).astype(np.int64)
    b = np.concatenate([
        rng.integers(-2**31, 2**31, 4000),
        [2**31 - 1, -2**31, 0x7FFF, -0x8000, -1, 1, 0, 0x12345678,
         -0x12345678]]).astype(np.int64)
    aj = jnp.asarray(a, jnp.int32)
    bj = jnp.asarray(b, jnp.int32)
    for name, jf, sf in [
        ("smulwb", fx.smulwb, sp.SMULWB),
        ("smulww", fx.smulww, sp.SMULWW),
        ("smulbb", fx.smulbb, sp.SMULBB),
        ("add_sat32", fx.add_sat32, sp.ADD_SAT32),
    ]:
        got = np.asarray(jf(aj, bj))
        want = np.asarray([sf(int(sp.i32(x)), int(sp.i32(y)))
                           for x, y in zip(a, b)], np.int64)
        np.testing.assert_array_equal(got.astype(np.int64), want, name)
    got = np.asarray(fx.silk_rand(aj)).astype(np.int64)
    want = np.asarray([sp.RAND(int(sp.i32(x))) for x in a])
    np.testing.assert_array_equal(got, want, "rand")
    for sh in (1, 2, 8, 12):
        got = np.asarray(fx.rshift_round(aj, sh)).astype(np.int64)
        want = np.asarray([sp.i32(sp.RSHIFT_ROUND(int(sp.i32(x)), sh))
                           for x in a])
        np.testing.assert_array_equal(got, want, f"rshift_round {sh}")
    for sh in (4, 7):
        got = np.asarray(fx.lshift_sat32(aj, sh)).astype(np.int64)
        want = np.asarray([sp.LSHIFT_SAT32(int(sp.i32(x)), sh)
                           for x in a])
        np.testing.assert_array_equal(got, want, f"lshift_sat {sh}")


def _speech(n, seed=0, f0=140.0):
    """Voiced-ish test signal: pitch pulses + formant-ish resonance."""
    rng = np.random.default_rng(seed)
    fs = 48000
    t = np.arange(n)
    f = f0 * (1 + 0.05 * np.sin(2 * np.pi * 2.7 * t / fs))
    phase = np.cumsum(2 * np.pi * f / fs)
    saw = ((phase / (2 * np.pi)) % 1.0) - 0.5
    x = 0.45 * saw + 0.08 * np.sin(3 * phase) \
        + 0.02 * rng.standard_normal(n)
    env = 0.3 + 0.7 * np.clip(np.sin(2 * np.pi * 1.9 * t / fs), 0, 1)
    return (x * env).astype(np.float32)


def _silk_payloads(n_packets, Bn, payload_ms=20, bitrate=24000):
    """Encode speech to SILK-only packets; return per-stream lists of
    raw SILK payloads (TOC stripped)."""
    from opus_codec_tpu import Encoder
    from opus_codec_tpu.types import (Application, Bandwidth, Bitrate,
                                      Signal)
    frame = 48 * payload_ms
    out = []
    for b in range(Bn):
        enc = Encoder(48000, 1, Application.VOIP)
        enc.set_bitrate(Bitrate(bitrate))
        enc.set_signal(Signal.VOICE)
        enc.set_max_bandwidth(Bandwidth.WIDEBAND)
        sig = _speech(frame * n_packets, seed=7 + b, f0=120 + 25 * b)
        plist = []
        for i in range(n_packets):
            p = enc.encode_float(sig[i * frame:(i + 1) * frame])
            assert (p[0] >> 7) == 0 and len(p) > 1, "expected SILK TOC"
            config = p[0] >> 3
            assert config in range(8, 12), "expected WB SILK"
            plist.append(p[1:])
        out.append(plist)
    return out


def _scalar_frames(payload, fs_khz, payload_ms, cs: SilkChannelState):
    """Reference: scalar parse + decode_frame per frame (mono path of
    dec_API.c), returning internal-rate samples."""
    fpp = max(1, payload_ms // 20)
    dec = RangeDecoder(payload)
    cs.nFramesDecoded = 0
    for i in range(fpp):
        cs.VAD_flags[i] = dec.dec_bit_logp(1)
    cs.LBRR_flag = dec.dec_bit_logp(1)
    cs.LBRR_flags = [0] * 3
    if cs.LBRR_flag:
        if fpp == 1:
            cs.LBRR_flags[0] = 1
        else:
            sym = _icdf(dec, (T.LBRR_flags_2_iCDF,
                              T.LBRR_flags_3_iCDF)[fpp - 2]) + 1
            for i in range(fpp):
                cs.LBRR_flags[i] = (sym >> i) & 1
        for i in range(fpp):
            if cs.LBRR_flags[i]:
                cond = CODE_CONDITIONALLY if (
                    i > 0 and cs.LBRR_flags[i - 1]) \
                    else CODE_INDEPENDENTLY
                cs.decode_indices(dec, i, True, cond)
                decode_pulses(dec, cs.indices.signalType,
                              cs.indices.quantOffsetType,
                              cs.frame_length)
    frames = []
    for i in range(fpp):
        cond = CODE_INDEPENDENTLY if i == 0 else CODE_CONDITIONALLY
        frame = cs.decode_frame(dec, FLAG_DECODE_NORMAL, cond)
        cs.nFramesDecoded += 1
        frames.append(frame)
    return np.concatenate(frames), dec.rng


@pytest.mark.parametrize("payload_ms", [20, 40])
def test_silk_batch_decode_bitexact(payload_ms):
    Bn = 3
    n_packets = 6 if payload_ms == 20 else 3
    payloads = _silk_payloads(n_packets, Bn, payload_ms)
    bd = SilkBatchDecoder(Bn, fs_khz=16, payload_ms=payload_ms)
    refs = []
    for b in range(Bn):
        cs = SilkChannelState()
        cs.nb_subfr = 4
        cs.nFramesPerPacket = max(1, payload_ms // 20)
        cs.set_fs(16, 48000)
        refs.append(cs)
    for pi in range(n_packets):
        batch = [payloads[b][pi] for b in range(Bn)]
        got = bd.decode(batch)
        for b in range(Bn):
            want, rng_final = _scalar_frames(batch[b], 16, payload_ms,
                                             refs[b])
            assert rng_final == bd.final_ranges[b], (pi, b)
            np.testing.assert_array_equal(
                got[b].astype(np.int64), np.asarray(want, np.int64),
                err_msg=f"packet {pi} stream {b}")


def test_batch_resampler_bitexact():
    """Batched IIR_FIR resampler vs the scalar Resampler (8/12/16 ->
    48 kHz), multi-frame to exercise all carried state."""
    from opus_codec_tpu.silk import batch_resampler as br
    from opus_codec_tpu.silk.resampler import Resampler
    rng = np.random.default_rng(5)
    for fs in (16, 12, 8):
        Bn, L = 3, fs * 20
        refs = [Resampler(fs * 1000, 48000, False) for _ in range(Bn)]
        st = br.init_resampler_state(Bn)
        for fi in range(4):
            x = rng.integers(-30000, 30000, size=(Bn, L)).astype(np.int32)
            got, st = br.resample_to48_batch_jit(jnp.asarray(x), st, fs)
            for b in range(Bn):
                want = refs[b].process(list(x[b]))
                np.testing.assert_array_equal(
                    np.asarray(got[b]).astype(np.int64), want,
                    err_msg=f"fs={fs} frame={fi} stream={b}")


def test_silk_batch_decode_48k():
    """End-to-end batched SILK decode at the API rate vs the scalar
    decoder + scalar resampler with the dec_API mono 1-sample delay."""
    from opus_codec_tpu.silk.resampler import Resampler
    Bn, n_packets = 2, 4
    payloads = _silk_payloads(n_packets, Bn, 20)
    bd = SilkBatchDecoder(Bn, fs_khz=16, payload_ms=20)
    refs, rs, last = [], [], [0] * Bn
    for b in range(Bn):
        cs = SilkChannelState()
        cs.nb_subfr = 4
        cs.nFramesPerPacket = 1
        cs.set_fs(16, 48000)
        refs.append(cs)
        rs.append(Resampler(16000, 48000, False))
    for pi in range(n_packets):
        batch = [payloads[b][pi] for b in range(Bn)]
        got = bd.decode_48k(batch)
        for b in range(Bn):
            want16, _ = _scalar_frames(batch[b], 16, 20, refs[b])
            inp = [last[b]] + list(want16[:-1])
            last[b] = int(want16[-1])
            want48 = rs[b].process(inp)
            np.testing.assert_array_equal(
                got[b].astype(np.int64), want48,
                err_msg=f"packet {pi} stream {b}")


def test_silk_batch_decode_10ms():
    """10 ms frames: nb_subfr == 2, no NLSF-interp rewhiten path."""
    Bn = 2
    payloads = _silk_payloads(8, Bn, payload_ms=10, bitrate=20000)
    bd = SilkBatchDecoder(Bn, fs_khz=16, payload_ms=10)
    refs = []
    for b in range(Bn):
        cs = SilkChannelState()
        cs.nb_subfr = 2
        cs.nFramesPerPacket = 1
        cs.set_fs(16, 48000)
        refs.append(cs)
    for pi in range(8):
        batch = [payloads[b][pi] for b in range(Bn)]
        got = bd.decode(batch)
        for b in range(Bn):
            want, rng_final = _scalar_frames(batch[b], 16, 10, refs[b])
            assert rng_final == bd.final_ranges[b]
            np.testing.assert_array_equal(
                got[b].astype(np.int64), np.asarray(want, np.int64))
