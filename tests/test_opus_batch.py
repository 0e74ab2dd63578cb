"""Mixed-mode EP-bucketed batch encoder (SURVEY §7 step 6).

A batch mixing music (CELT lanes at two bitrates) and voice (SILK
lane) streams must produce packets byte-identical to the equivalent
per-stream encoders, with results scattered back to stream order."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import contextlib


@contextlib.contextmanager
def enable_x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", old)


def test_mixed_mode_bucketed_batch():
    from opus_codec_tpu.batch_api import (CeltBatchEncoder,
                                          OpusBatchEncoder)
    from opus_codec_tpu.api import Encoder
    from opus_codec_tpu.types import (Application, Bandwidth, Bitrate,
                                      Signal)

    N = 120                     # 2.5 ms keeps the CI compile light;
    lm_rate = 400 * 48000 // 48000   # noqa: identical code path as 20 ms
    configs = [
        {"mode": "celt", "bitrate": 64000},
        {"mode": "silk", "bitrate": 24000, "complexity": 2},
        {"mode": "celt", "bitrate": 96000},
        {"mode": "celt", "bitrate": 64000},
        {"mode": "silk", "bitrate": 16000, "complexity": 2},
        {"mode": "celt", "bitrate": 96000},
    ]
    B = len(configs)
    rng = np.random.default_rng(3)
    n_frames = 2
    t = np.arange(N * n_frames) / 48000.0
    pcm = np.stack([
        0.4 * np.sin(2 * np.pi * (200 + 90 * b) * t)
        + 0.04 * rng.standard_normal(len(t)) for b in range(B)
    ]).astype(np.float64)

    # eager: compiling the planner for tiny one-off batches is far
    # slower than eager execution on this host (see test_batch_encoder)
    with enable_x64(), jax.disable_jit():
        enc = OpusBatchEncoder(configs, frame_size=N, exact=True)
        got = [[] for _ in range(B)]
        for f in range(n_frames):
            pkts = enc.encode(pcm[:, f * N:(f + 1) * N])
            for b in range(B):
                got[b].append(pkts[b])

        # per-stream references: CELT streams through a B=1 batched
        # lane (proven byte-equal to the scalar CeltEncoder in
        # test_batch_encoder), SILK streams through the scalar Encoder
        for b, c in enumerate(configs):
            if c["mode"] == "celt":
                ref = CeltBatchEncoder(1, bitrate=c["bitrate"],
                                       frame_size=N, exact=True)
                for f in range(n_frames):
                    want, _ = ref.encode_packed(
                        pcm[b:b + 1, f * N:(f + 1) * N])
                    assert got[b][f] == want[0], (b, f)
            else:
                e = Encoder(48000, 1, Application.VOIP)
                e.set_bitrate(Bitrate(c["bitrate"]))
                e.set_signal(Signal.VOICE)
                e.set_max_bandwidth(Bandwidth.WIDEBAND)
                e.set_complexity(c["complexity"])
                e.set_vbr(False)
                for f in range(n_frames):
                    want = e.encode_float(
                        pcm[b, f * N:(f + 1) * N].astype(np.float32))
                    assert got[b][f] == want, (b, f)
