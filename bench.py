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

The timed loop software-pipelines three stages across the axon tunnel:
a prefetch thread uploads frame s+2's PCM while the device computes
frame s+1 and the host fetches/splits frame s's payload.  On this dev
harness the tunnel's ~20-40 MB/s host->device bandwidth — not the
codec — is the steady-state wall (7.9 MB of PCM per 82 s-of-audio
step), so the JSON line also reports the device-side codec throughput
(`device_rtf`, chained steps on device-resident input, the number a
production host with a real PCIe/DMA path would see) and the measured
tunnel bandwidth for the decomposition.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline is relative to the BASELINE.json north star (>=10,000x
aggregate realtime on a v5e-8 for 48 kHz stereo encode => 1,250x per
chip; this path is mono — the per-chip stereo equivalent is ~value/2,
which vs_baseline reflects).
"""
import json
import os
import subprocess
import sys
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor


import numpy as np


def probe_default_backend(timeout_s: float = 420.0) -> str:
    """Ask a subprocess which platform JAX's default backend resolves
    to, bounded by a timeout.  The dev harness's TPU attaches through
    a tunnel that can be slow to initialise or outright unavailable
    (BENCH_r03 died with 'Unable to initialize backend axon'); the
    bench must degrade to an honest CPU number instead of rc!=0."""
    code = ("import jax\n"
            "print('PLATFORM=' + jax.devices()[0].platform)\n")
    for attempt in range(2):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            for line in r.stdout.splitlines():
                if line.startswith("PLATFORM="):
                    return line.split("=", 1)[1]
        except subprocess.TimeoutExpired:
            pass
        timeout_s = 60.0  # one shorter retry
    return "cpu"


def main():
    os.environ.setdefault("OMP_NUM_THREADS", str(os.cpu_count() or 8))
    if os.environ.get("BENCH_FORCE_CPU") == "1":
        platform = "cpu"
    else:
        platform = probe_default_backend()
    cpu_fallback = platform == "cpu"

    import jax

    if cpu_fallback:
        # default backend is dead or already CPU: force CPU in-process
        # (the axon site hook overrides JAX_PLATFORMS, so use the
        # config knob) and shrink the workload to CPU scale.
        jax.config.update("jax_platforms", "cpu")

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from opus_codec_tpu.batch_api import CeltBatchEncoder

    B = int(os.environ.get("BENCH_B", "16" if cpu_fallback else "4096"))
    steps = int(os.environ.get("BENCH_STEPS",
                               "2" if cpu_fallback else "20"))

    if cpu_fallback:
        # Degraded-mode bench: the accelerator is unreachable.  The
        # jitted batched lane is not an option here — a fresh XLA:CPU
        # compile of the planner takes many minutes on this 1-core host
        # (cache hit not guaranteed) and eager execution crawls.  Emit
        # an honest number from the *scalar host lane* (our numpy
        # CeltEncoder, same mono/20 ms/CBR-64k/complexity-0 config) —
        # bounded seconds, zero compile risk, clearly labelled.
        import numpy as _np
        from opus_codec_tpu.bitstream import packet as _pkt
        from opus_codec_tpu.celt.encoder import CeltEncoder as _CE
        from opus_codec_tpu.opus.decoder import OpusDecoder
        from opus_codec_tpu.types import Bandwidth, CodecMode

        B = min(B, 8)
        rng = _np.random.default_rng(0)
        t = _np.arange(960) / 48000.0
        nbytes = 64000 * 960 // (8 * 48000)
        toc = _pkt.gen_toc(CodecMode.CELT_ONLY, 50, Bandwidth.FULLBAND, 1)
        encs = []
        for b in range(B):
            e = _CE(48000, 1)
            e.complexity = 0
            e.vbr = False
            e.bitrate = 64000
            encs.append(e)
        pcms = []
        for b in range(B):
            f0 = 100.0 + 450.0 * b
            pcms.append((0.33 * _np.sin(2 * _np.pi * f0 * t)
                         + 0.05 * rng.standard_normal(960))[None, :])
        # warmup + correctness spot check
        data = encs[0].encode_with_ec(pcms[0], 960, nbytes)
        dec = OpusDecoder(48000, 1)
        dec.decode_float(bytes([toc]) + data, 960)
        assert dec.get_final_range() == encs[0].rng
        n_frames = max(2, steps)
        t0 = time.perf_counter()
        for _ in range(n_frames):
            for b in range(B):
                encs[b].encode_with_ec(pcms[b], 960, nbytes)
        dt = time.perf_counter() - t0
        rtf = B * n_frames * (960 / 48000.0) / dt
        print(json.dumps({
            "metric": "celt_encode_end_to_end_realtime_factor_per_chip",
            "value": round(rtf, 1),
            "unit": "x_realtime_48kHz_mono_20ms_cbr64k_pcm_to_packets",
            "vs_baseline": round((rtf / 2.0) / (10000.0 / 8.0), 3),
            "platform": "cpu",
            "note": "degraded-mode bench: TPU unreachable; scalar host "
                    "lane (numpy CeltEncoder), not the accelerator path",
        }))
        return
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

    # tunnel upload bandwidth (host->device), materialised honestly
    d = jax.device_put(frames[0])
    np.asarray(d[:1, :1])
    t0 = time.perf_counter()
    for k in range(2):
        d = jax.device_put(frames[k])
        np.asarray(d[:1, :1])
    up_dt = (time.perf_counter() - t0) / 2
    upload_mbps = frames[0].nbytes / 1e6 / up_dt

    # device-side codec throughput: chained steps on device-resident
    # input (what a host with a real DMA path would sustain)
    dev = [jax.device_put(f) for f in frames]
    jax.block_until_ready(dev)
    t0 = time.perf_counter()
    outs = [enc.encode_device_packed(dev[s % 4]) for s in range(steps)]
    np.asarray(outs[-1][:1])
    dev_dt = (time.perf_counter() - t0) / steps
    device_rtf = B * (N / 48000.0) / dev_dt

    # timed steady state: three-stage software pipeline.  A prefetch
    # thread uploads frame s+2's PCM (jax.device_put releases the GIL
    # during the tunnel transfer) while the device computes s+1 and
    # the host fetches frame s's finished payload — steady-state cost
    # = max(upload, compute, fetch), not the sum.
    ex = ThreadPoolExecutor(2)
    LAG = 2
    inflight = deque()
    futs = deque()
    futs.append(ex.submit(jax.device_put, frames[0]))
    t0 = time.perf_counter()
    total_bytes = 0
    for s in range(steps):
        futs.append(ex.submit(jax.device_put, frames[(s + 1) % 4]))
        inflight.append(enc.encode_device_packed(futs.popleft().result()))
        # start the oldest payload's device->host copy now so it
        # overlaps the next upload/compute instead of serialising
        # behind them at np.asarray time
        if len(inflight) > LAG:
            inflight[0].copy_to_host_async()
        if len(inflight) > LAG:
            payload = np.asarray(inflight.popleft())
            pkts, _ = enc.split_payload(payload)
            total_bytes += sum(len(p) for p in pkts)
    while inflight:
        payload = np.asarray(inflight.popleft())
        pkts, _ = enc.split_payload(payload)
        total_bytes += sum(len(p) for p in pkts)
    dt = time.perf_counter() - t0
    ex.shutdown(wait=False)

    audio_seconds = B * steps * (N / 48000.0)
    rtf = audio_seconds / dt
    baseline_per_chip_stereo = 10000.0 / 8.0
    print(json.dumps({
        "metric": "celt_encode_end_to_end_realtime_factor_per_chip",
        "value": round(rtf, 1),
        "unit": "x_realtime_48kHz_mono_20ms_cbr64k_pcm_to_packets",
        "vs_baseline": round((rtf / 2.0) / baseline_per_chip_stereo, 3),
        "device_rtf": round(device_rtf, 1),
        "device_vs_baseline": round((device_rtf / 2.0)
                                    / baseline_per_chip_stereo, 3),
        "tunnel_upload_MBps": round(upload_mbps, 1),
        "platform": platform,
        "note": ("e2e is bounded by the dev-harness tunnel's host->"
                 "device bandwidth (7.9 MB PCM per 82 s-of-audio "
                 "step); device_rtf chains steps on device-resident "
                 "input"),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        if os.environ.get("BENCH_FORCE_CPU") != "1":
            # accelerator lane failed mid-run: retry once on CPU in a
            # fresh process (the dead backend is cached in-process)
            env = dict(os.environ, BENCH_FORCE_CPU="1")
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env)
            sys.exit(r.returncode)
        # terminal: still emit ONE parseable JSON line, rc 0
        print(json.dumps({
            "metric": "celt_encode_end_to_end_realtime_factor_per_chip",
            "value": 0.0,
            "unit": "x_realtime_48kHz_mono_20ms_cbr64k_pcm_to_packets",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:400],
        }))
        sys.exit(0)
