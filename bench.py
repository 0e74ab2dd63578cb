#!/usr/bin/env python
"""Benchmark: END-TO-END batched CELT encode — PCM in, valid packets out.

Headline config (round 5): the BASELINE.json north-star unit — 48 kHz
STEREO, 20 ms frames, CBR — measured end-to-end and device-side; the
mono lane from earlier rounds is reported as secondary fields.

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
    bitrate = int(os.environ.get("BENCH_BITRATE", "64000"))
    complexity = int(os.environ.get("BENCH_COMPLEXITY", "0"))
    N = 960

    def run_lane(channels, B, steps, measure_tunnel=False, cplx=None):
        """One config's bench: returns (e2e_rtf or None, device_rtf,
        upload_MBps or None)."""
        enc = CeltBatchEncoder(
            B, bitrate=bitrate, channels=channels,
            complexity=complexity if cplx is None else cplx)
        rng = np.random.default_rng(0)
        t = np.arange(N) / 48000.0
        freqs = 100.0 + rng.uniform(0, 4000, size=(B, 1))
        frames = []
        for k in range(4):
            ph = (t[None, :] + k * 0.02) * freqs
            if channels == 2:
                pcm = np.stack(
                    [11000 * np.sin(2 * np.pi * ph),
                     11000 * np.sin(2 * np.pi * ph * 1.01)], axis=1) \
                    + 1600 * rng.standard_normal((B, 2, N))
            else:
                pcm = 11000 * np.sin(2 * np.pi * ph) \
                    + 1600 * rng.standard_normal((B, N))
            frames.append(np.clip(pcm, -32768, 32767).astype(np.int16))

        # warmup + compile + correctness spot check
        packets, rngs = enc.encode_packed(frames[0])
        from opus_codec_tpu.opus.decoder import OpusDecoder
        dec = OpusDecoder(48000, channels)
        for b in (0, B // 2, B - 1):
            dec.decode_float(packets[b], N)
            assert dec.get_final_range() == rngs[b], \
                "decode/final_range mismatch"
            dec.reset()

        upload_mbps = None
        if measure_tunnel:
            d = jax.device_put(frames[0])
            np.asarray(d.ravel()[:1])
            t0 = time.perf_counter()
            for k in range(2):
                d = jax.device_put(frames[k])
                np.asarray(d.ravel()[:1])
            up_dt = (time.perf_counter() - t0) / 2
            upload_mbps = frames[0].nbytes / 1e6 / up_dt

        # device-side codec throughput (device-resident input)
        dev = [jax.device_put(f) for f in frames]
        jax.block_until_ready(dev)
        t0 = time.perf_counter()
        outs = [enc.encode_device_packed(dev[s % 4]) for s in range(steps)]
        np.asarray(outs[-1][:1])
        dev_dt = (time.perf_counter() - t0) / steps
        device_rtf = B * (N / 48000.0) / dev_dt

        e2e_rtf = None
        if measure_tunnel:
            # three-stage software pipeline (upload / compute / fetch)
            ex = ThreadPoolExecutor(2)
            LAG = 2
            inflight = deque()
            futs = deque()
            futs.append(ex.submit(jax.device_put, frames[0]))
            t0 = time.perf_counter()
            for s_i in range(steps):
                futs.append(ex.submit(jax.device_put,
                                      frames[(s_i + 1) % 4]))
                inflight.append(
                    enc.encode_device_packed(futs.popleft().result()))
                if len(inflight) > LAG:
                    inflight[0].copy_to_host_async()
                if len(inflight) > LAG:
                    payload = np.asarray(inflight.popleft())
                    enc.split_payload(payload)
            while inflight:
                payload = np.asarray(inflight.popleft())
                enc.split_payload(payload)
            dt = time.perf_counter() - t0
            ex.shutdown(wait=False)
            e2e_rtf = B * steps * (N / 48000.0) / dt
        return e2e_rtf, device_rtf, upload_mbps

    B = int(os.environ.get("BENCH_B", "16384"))
    B_e2e = min(B, int(os.environ.get("BENCH_B_E2E", "8192")))
    steps = int(os.environ.get("BENCH_STEPS", "8"))
    # headline: the north-star unit — stereo 20 ms.  The pipelined e2e
    # lane runs at B=8192 (smaller per-step uploads keep the tunnel
    # measurement steady); the device lanes run at B=16384 where the
    # codec step is ~6% faster per stream.
    e2e_st, _, up_st = run_lane(2, B_e2e, steps, measure_tunnel=True)
    _, dev_st, _ = run_lane(2, B, steps)
    # secondary: the mono lane tracked since round 2
    _, dev_mono, _ = run_lane(1, B, steps)
    # secondary: the default-quality tier (transients/tf/rotations)
    _, dev_dq, _ = run_lane(2, min(B, 4096), max(steps // 2, 4),
                            cplx=max(complexity, 2))

    baseline_per_chip_stereo = 10000.0 / 8.0
    print(json.dumps({
        "metric": "celt_encode_stereo_realtime_factor_per_chip",
        "value": round(e2e_st, 1),
        "unit": ("x_realtime_48kHz_stereo_20ms_cbr%dk_c%d_pcm_to_packets"
                 % (bitrate // 1000, complexity)),
        "vs_baseline": round(e2e_st / baseline_per_chip_stereo, 3),
        "device_rtf": round(dev_st, 1),
        "device_vs_baseline": round(dev_st / baseline_per_chip_stereo,
                                    3),
        "mono_device_rtf": round(dev_mono, 1),
        "dq_stereo_device_rtf": round(dev_dq, 1),
        "tunnel_upload_MBps": round(up_st, 1),
        "platform": platform,
        "note": ("north-star config (BASELINE.json: 10000x aggregate "
                 "stereo on v5e-8 = 1250x/chip); e2e is bounded by the "
                 "dev-harness tunnel's host->device bandwidth "
                 "(15.7 MB int16 stereo PCM per 82 s-of-audio step), "
                 "device_rtf chains steps on device-resident input"),
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
            "metric": "celt_encode_stereo_realtime_factor_per_chip",
            "value": 0.0,
            "unit": "x_realtime_48kHz_stereo_20ms_cbr64k_pcm_to_packets",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:400],
        }))
        sys.exit(0)
