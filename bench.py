#!/usr/bin/env python
"""Benchmark: END-TO-END batched CELT encode — PCM in, valid packets out.

Measures the fully device-resident batched encoder on the live
accelerator: device symbol planning (preemphasis, MDCT, band energies,
coarse/fine energy quantization, tf/spread/dynalloc/trim coding,
allocation, PVQ search, CWRS indexing — celt/batch_encoder.py) AND the
device range coder (celt/batch_pack.py) in one jitted program per
frame; only finished packet bytes + final ranges cross to the host.

Configuration: B concurrent 48 kHz mono streams of int16 PCM (the
reference opus_encode() input format), 20 ms frames, CBR 64 kbps, CELT
mode (complexity-0 decision set).  Packets are spot-checked against
the scalar decoder (final_range equality) before timing.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is relative to the BASELINE.json north star (>=10,000x
aggregate realtime on a v5e-8 for 48 kHz stereo encode => 1,250x per
chip; this path is mono — the per-chip stereo equivalent is ~value/2,
which vs_baseline reflects).
"""
import json
import os
import time

import numpy as np


def main():
    os.environ.setdefault("OMP_NUM_THREADS", str(os.cpu_count() or 8))
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from opus_codec_tpu.batch_api import CeltBatchEncoder

    B = int(os.environ.get("BENCH_B", "4096"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    bitrate = 64000
    N = 960

    enc = CeltBatchEncoder(B, bitrate=bitrate)
    rng = np.random.default_rng(0)
    t = np.arange(N) / 48000.0
    freqs = 100.0 + rng.uniform(0, 4000, size=(B, 1))
    frames = []
    for k in range(4):
        ph = (t[None, :] + k * 0.02) * freqs
        pcm = 11000 * np.sin(2 * np.pi * ph) \
            + 1600 * rng.standard_normal((B, N))
        # int16 input — the reference opus_encode() API lane
        frames.append(np.clip(pcm, -32768, 32767).astype(np.int16))

    # warmup + compile + correctness spot check
    packets, rngs = enc.encode_packed(frames[0])
    from opus_codec_tpu.opus.decoder import OpusDecoder
    dec = OpusDecoder(48000, 1)
    for b in (0, B // 2, B - 1):
        dec.decode_float(packets[b], N)
        assert dec.get_final_range() == rngs[b], \
            "decode/final_range mismatch"
        dec.reset()

    # timed steady state: software-pipelined host loop.  dispatch for
    # frame s+LAG (which starts its async PCM upload through the
    # tunnel) is issued before frame s's finished payload is fetched,
    # so upload, device compute and fetch overlap — the axon tunnel is
    # full-duplex, so steady-state cost = max(upload, compute, fetch),
    # not the sum.
    from collections import deque

    LAG = 2
    inflight = deque()
    t0 = time.perf_counter()
    total_bytes = 0
    for s in range(steps):
        inflight.append(enc.encode_device_packed(frames[s % 4]))
        if len(inflight) > LAG:
            payload = np.asarray(inflight.popleft())
            pkts, _ = enc.split_payload(payload)
            total_bytes += sum(len(p) for p in pkts)
    while inflight:
        payload = np.asarray(inflight.popleft())
        pkts, _ = enc.split_payload(payload)
        total_bytes += sum(len(p) for p in pkts)
    dt = time.perf_counter() - t0

    audio_seconds = B * steps * (N / 48000.0)
    rtf = audio_seconds / dt
    baseline_per_chip_stereo = 10000.0 / 8.0
    print(json.dumps({
        "metric": "celt_encode_end_to_end_realtime_factor_per_chip",
        "value": round(rtf, 1),
        "unit": "x_realtime_48kHz_mono_20ms_cbr64k_pcm_to_packets",
        "vs_baseline": round((rtf / 2.0) / baseline_per_chip_stereo, 3),
    }))


if __name__ == "__main__":
    main()
