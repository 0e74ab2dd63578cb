"""Time the stereo batched CELT encode device step on the live chip.

Usage: python tools/profiling/prof_stereo.py [B] [bitrate]
Prints per-step wall time and realtime factor for the device-resident
plan+pack step (the bench's device_rtf measurement, stereo config).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

sys.path.insert(0, "/root/repo")
from opus_codec_tpu.batch_api import CeltBatchEncoder  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
bitrate = int(sys.argv[2]) if len(sys.argv) > 2 else 64000
complexity = int(sys.argv[3]) if len(sys.argv) > 3 else 0
N = 960

enc = CeltBatchEncoder(B, bitrate=bitrate, channels=2,
                       complexity=complexity)
rng = np.random.default_rng(0)
t = np.arange(N) / 48000.0
freqs = 100.0 + rng.uniform(0, 4000, size=(B, 1))
frames = []
for k in range(4):
    ph = (t[None, :] + k * 0.02) * freqs
    left = 11000 * np.sin(2 * np.pi * ph)
    right = 11000 * np.sin(2 * np.pi * ph * 1.01)
    pcm = np.stack([left, right], axis=1) \
        + 1600 * rng.standard_normal((B, 2, N))
    frames.append(np.clip(pcm, -32768, 32767).astype(np.int16))

print("platform:", jax.devices()[0].platform)
t0 = time.perf_counter()
payload = enc.encode_device_packed(frames[0])
np.asarray(payload[:1])
print(f"compile+first step: {time.perf_counter() - t0:.1f}s")

# correctness spot check against the scalar decoder
pkts, rngs = enc.split_payload(np.asarray(payload))
from opus_codec_tpu.opus.decoder import OpusDecoder  # noqa: E402
dec = OpusDecoder(48000, 2)
for b in (0, B // 2, B - 1):
    dec.decode_float(pkts[b], N)
    assert dec.get_final_range() == rngs[b], f"final_range mismatch b={b}"
    dec.reset()
print("final_range spot check ok")

dev = [jax.device_put(f) for f in frames]
jax.block_until_ready(dev)
steps = 12
t0 = time.perf_counter()
outs = [enc.encode_device_packed(dev[s % 4]) for s in range(steps)]
np.asarray(outs[-1][:1])
dt = (time.perf_counter() - t0) / steps
rtf = B * (N / 48000.0) / dt
print(f"B={B} bitrate={bitrate} c={complexity} stereo: {dt*1e3:.1f} ms/step, "
      f"device_rtf={rtf:.1f}x  (north star 1250x/chip)")
