"""Batched CELT decoder (dry parse + device synthesis) vs the scalar
decoder (ground truth, itself oracle-validated against libopus).

The parse must consume the bitstream identically (final_range equality)
and the device synthesis must reproduce the scalar PCM to float32
accuracy for the supported configuration space (mono, long blocks,
tf_res == 0)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opus_codec_tpu.celt import batch_decoder as bd
from opus_codec_tpu.celt import dec_parse as dp
from opus_codec_tpu.celt.decoder import CeltDecoder
from opus_codec_tpu.celt.encoder import CeltEncoder

HEAVY = bool(os.environ.get("OPUS_TPU_HEAVY"))


def _roundtrip(lm, bitrate, complexity, n_frames=4, Bn=4, seed=11,
               tol=2e-3, dtype=jnp.float32):
    n = 120 << lm
    rng = np.random.default_rng(seed)
    encs, decs, seeds = [], [], [0] * Bn
    for b in range(Bn):
        e = CeltEncoder(48000, 1)
        e.complexity = complexity
        e.vbr = False
        e.bitrate = bitrate
        encs.append(e)
        decs.append(CeltDecoder(48000, 1))
    nbytes = max(2, min(1275, (bitrate * n + 4 * 48000) // (8 * 48000)))
    t = np.arange(n) / 48000.0
    st = bd.init_dec_state(Bn, dtype=dtype)
    worst = 0.0
    for fi in range(n_frames):
        refs, syms_list = [], []
        for b in range(Bn):
            pcm = 0.4 * np.sin(2 * np.pi * (150 + 170 * b + 60 * fi)
                               * (t + fi * n / 48000)) \
                + (0.05 + 0.02 * b) * rng.standard_normal(n)
            pkt = encs[b].encode_with_ec(pcm[None, :], n, nbytes)
            refs.append(decs[b].decode_with_ec(pkt, n)[0])
            s = dp.parse_frame(pkt, lm, seed=seeds[b])
            assert s.final_range == decs[b].rng
            assert not s.transient and int(np.abs(s.tf_res).max()) == 0, \
                "test signal hit an unsupported config"
            seeds[b] = s.final_range
            syms_list.append(s)
        syms = {k: jnp.asarray(v)
                for k, v in dp.stack_syms(syms_list).items()}
        out, st = bd.celt_decode_batch_jit(syms, st, lm)
        err = float(np.abs(np.asarray(out) - np.stack(refs)).max())
        worst = max(worst, err)
        assert err < tol, (lm, bitrate, fi, err)
    return worst


@pytest.mark.parametrize("lm,bitrate,complexity", [
    (0, 96000, 0),
    (0, 48000, 0),
    pytest.param(1, 64000, 0, marks=pytest.mark.skipif(
        not HEAVY, reason="set OPUS_TPU_HEAVY=1 for larger frames")),
    pytest.param(3, 64000, 0, marks=pytest.mark.skipif(
        not HEAVY, reason="set OPUS_TPU_HEAVY=1 for the 20 ms config")),
])
def test_batch_decode_matches_scalar(lm, bitrate, complexity):
    _roundtrip(lm, bitrate, complexity)


def test_batch_decode_exact_x64():
    """On a float64 backend the device synthesis reproduces the scalar
    decoder to transform-matrix precision (~1e-7)."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        worst = _roundtrip(0, 96000, 0, tol=1e-6, dtype=jnp.float64)
    finally:
        jax.config.update("jax_enable_x64", old)
    assert worst < 1e-6


def test_parse_final_range_all_configs():
    """The dry parse consumes every symbol identically to the scalar
    decoder (final_range is the bitstream checksum) — including
    transient/prefilter/tf configurations beyond the phase-1 device
    synthesis scope."""
    rng = np.random.default_rng(6)
    for lm in (0, 1, 2, 3):
        for comp, br in ((0, 64000), (10, 128000), (5, 48000)):
            n = 120 << lm
            enc = CeltEncoder(48000, 1)
            enc.complexity = comp
            enc.vbr = False
            enc.bitrate = br
            dec = CeltDecoder(48000, 1)
            t = np.arange(n) / 48000.0
            nbytes = max(2, min(1275,
                                (br * n + 4 * 48000) // (8 * 48000)))
            for fi in range(5):
                pcm = 0.5 * np.sin(2 * np.pi * 220 * (t + fi * n / 48000))
                if fi % 3 == 1:
                    pcm[n // 2:] += 0.9 * rng.standard_normal(n - n // 2)
                pkt = enc.encode_with_ec(pcm[None, :], n, nbytes)
                dec.decode_with_ec(pkt, n)
                s = dp.parse_frame(pkt, lm)
                assert s.final_range == dec.rng, (lm, comp, br, fi)


def test_batched_encode_to_batched_decode():
    """Full batched loop: CeltBatchEncoder packets -> CeltBatchDecoder
    PCM, cross-checked against the scalar decoder on every stream."""
    from opus_codec_tpu.batch_api import CeltBatchDecoder, CeltBatchEncoder

    Bn, n = 3, 120
    rng = np.random.default_rng(9)
    enc = CeltBatchEncoder(Bn, bitrate=96000, frame_size=n)
    dec = CeltBatchDecoder(Bn, frame_size=n)
    sdecs = [CeltDecoder(48000, 1) for _ in range(Bn)]
    t = np.arange(n) / 48000.0
    for fi in range(3):
        pcm = (0.4 * np.sin(2 * np.pi
                            * (200 + 150 * np.arange(Bn))[:, None]
                            * (t + fi * n / 48000)[None, :])
               + 0.05 * rng.standard_normal((Bn, n))).astype(np.float32)
        packets = enc.encode(pcm)
        frames = [p[1:] for p in packets]        # strip the TOC byte
        out = dec.decode(frames)
        for b in range(Bn):
            ref = sdecs[b].decode_with_ec(frames[b], n)[0]
            assert sdecs[b].rng == dec.final_ranges[b]
            assert float(np.abs(out[b] - ref).max()) < 2e-3


def test_cwrsi_batch_matches_scalar():
    from opus_codec_tpu.celt.cwrs import V, cwrsi, icwrs
    from opus_codec_tpu.celt.batch_encoder import make_tables
    t = make_tables(0, 1)
    rng = np.random.default_rng(3)
    for N in (2, 3, 4, 8, 16, 22):
        Ks, idxs, refs = [], [], []
        for _ in range(16):
            K = int(rng.integers(1, min(t.kmax_global, 2 * N) + 1))
            total = V(N, K)
            if total > 1 << 32:
                continue
            ix = int(rng.integers(0, total))
            y = cwrsi(N, K, ix)
            assert icwrs(y) == ix
            Ks.append(K)
            idxs.append(ix)
            refs.append(y)
        iy = bd.cwrsi_batch(jnp.asarray(np.asarray(idxs, np.uint32)),
                            jnp.asarray(np.asarray(Ks, np.int32)), N,
                            t.u_tab)
        np.testing.assert_array_equal(np.asarray(iy), np.asarray(refs))


def test_exp_rotation_dec_matches_scalar():
    from opus_codec_tpu.celt.bands import exp_rotation
    rng = np.random.default_rng(4)
    for N in (8, 16, 22, 44, 96):
        B = 6
        X = rng.standard_normal((B, N)).astype(np.float64)
        Ks = rng.integers(1, max(2, N // 2), size=B).astype(np.int32)
        spreads = rng.integers(0, 4, size=B).astype(np.int32)
        ref = X.copy()
        for b in range(B):
            row = list(ref[b])
            exp_rotation(row, 0, N, -1, 1, int(Ks[b]), int(spreads[b]))
            ref[b] = row
        out = bd.exp_rotation_dec(jnp.asarray(X), jnp.asarray(Ks),
                                  jnp.asarray(spreads), N)
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-6)
