"""Parallelism lanes: DP sharding over the virtual 8-device mesh,
SP multi-frame scan, PP pipelining, EP-style bucketing.

conftest provisions 8 virtual CPU devices; these tests actually
consume them."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opus_codec_tpu.batch_api import CeltBatchEncoder
from opus_codec_tpu.parallel import (DevicePipeline, ShardedCeltBatchEncoder,
                                     bucket_by, make_mesh)


def _pcm_frames(B, T, n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000.0
    out = np.zeros((B, T, n), np.float32)
    for fi in range(T):
        out[:, fi] = (0.4 * np.sin(
            2 * np.pi * (200 + 130 * np.arange(B))[:, None]
            * (t + fi * n / 48000)[None, :])
            + 0.04 * rng.standard_normal((B, n)))
    return out


def test_sp_encode_frames_matches_per_frame():
    """The lax.scan-over-frames lane must emit the identical packets
    as frame-at-a-time encoding."""
    B, T, n = 3, 4, 120
    pcm = _pcm_frames(B, T, n)
    e1 = CeltBatchEncoder(B, bitrate=96000, frame_size=n)
    ref = [[] for _ in range(B)]
    for fi in range(T):
        pkts, rngs = e1.encode_packed(pcm[:, fi])
        for b in range(B):
            ref[b].append((pkts[b], int(rngs[b])))
    e2 = CeltBatchEncoder(B, bitrate=96000, frame_size=n)
    pkts2, rngs2 = e2.encode_frames(pcm)
    for b in range(B):
        for fi in range(T):
            assert pkts2[b][fi] == ref[b][fi][0], (b, fi)
            assert int(rngs2[b, fi]) == ref[b][fi][1], (b, fi)


def test_int16_api_lane_matches_float():
    """int16 PCM (the reference opus_encode() input layout,
    encoder.rs:80-126) must produce the identical packets as
    pre-scaled float input on both the per-frame and the SP lanes —
    the dtype conversion happens on device to halve tunnel traffic."""
    B, T, n = 2, 3, 120
    pcm = _pcm_frames(B, T, n, seed=7)
    pcm_i16 = np.clip(pcm * 32768.0, -32768, 32767).astype(np.int16)
    pcm_f = pcm_i16.astype(np.float32) / 32768.0
    ef = CeltBatchEncoder(B, bitrate=96000, frame_size=n)
    want = [ef.encode_packed(pcm_f[:, fi]) for fi in range(T)]
    ei = CeltBatchEncoder(B, bitrate=96000, frame_size=n)
    for fi in range(T):
        pkts, rngs = ei.encode_packed(pcm_i16[:, fi])
        assert pkts == want[fi][0]
        np.testing.assert_array_equal(rngs, want[fi][1])
    es = CeltBatchEncoder(B, bitrate=96000, frame_size=n)
    pkts2, rngs2 = es.encode_frames(pcm_i16)
    for fi in range(T):
        assert [pkts2[b][fi] for b in range(B)] == want[fi][0]
        np.testing.assert_array_equal(rngs2[:, fi], want[fi][1])


def test_dp_sharded_encoder_runs_on_mesh():
    """DP: the batched planner under XLA SPMD over the 8-device mesh
    produces the same packets as the single-device path."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device conftest mesh")
    B, n = 8, 120
    pcm = _pcm_frames(B, 1, n)[:, 0]
    ref_enc = CeltBatchEncoder(B, bitrate=96000, frame_size=n)
    ref_pkts, ref_rngs = ref_enc.pack(ref_enc.encode_step_device(pcm))
    mesh = make_mesh(8)
    se = ShardedCeltBatchEncoder(B, mesh=mesh, bitrate=96000,
                                 frame_size=n)
    pkts, rngs = se.pack(se.encode_step_device(pcm))
    assert pkts == ref_pkts
    np.testing.assert_array_equal(rngs, ref_rngs)


def test_pp_pipeline_matches_sequential():
    B, T, n = 2, 5, 120
    pcm = _pcm_frames(B, T, n, seed=3)
    e1 = CeltBatchEncoder(B, bitrate=96000, frame_size=n)
    want = [e1.encode_packed(pcm[:, fi])[0] for fi in range(T)]

    e2 = CeltBatchEncoder(B, bitrate=96000, frame_size=n)

    def host(pending):
        return e2.split_payload(np.asarray(pending))[0]

    pipe = DevicePipeline(e2.encode_device_packed, host)
    got = []
    for fi in range(T):
        r = pipe.feed(pcm[:, fi])
        if r is not None:
            got.append(r)
    got.append(pipe.drain())
    assert got == want


def test_ep_bucketing():
    keys = ["celt", "silk", "celt", "hybrid", "silk", "celt"]
    buckets = bucket_by(keys)
    assert sorted(buckets) == ["celt", "hybrid", "silk"]
    np.testing.assert_array_equal(buckets["celt"], [0, 2, 5])
    np.testing.assert_array_equal(buckets["silk"], [1, 4])
    # scatter/gather round trip
    order = np.concatenate([buckets[k] for k in sorted(buckets)])
    assert sorted(order.tolist()) == list(range(len(keys)))
