"""Capture an xplane trace of the stereo batched encode device step."""
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
N = 960
enc = CeltBatchEncoder(B, bitrate=64000, channels=2)
rng = np.random.default_rng(0)
t = np.arange(N) / 48000.0
freqs = 100.0 + rng.uniform(0, 4000, size=(B, 1))
pcm = np.stack([11000 * np.sin(2 * np.pi * t[None] * freqs),
                11000 * np.sin(2 * np.pi * t[None] * freqs * 1.01)],
               axis=1) + 1600 * rng.standard_normal((B, 2, N))
pcm = np.clip(pcm, -32768, 32767).astype(np.int16)
dev = jax.device_put(pcm)
payload = enc.encode_device_packed(dev)
np.asarray(payload[:1])

with jax.profiler.trace("/tmp/stereo_trace"):
    for _ in range(3):
        out = enc.encode_device_packed(dev)
    np.asarray(out[:1])
print("trace done")
