import time, json, sys
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
from opus_codec_tpu.celt import batch_encoder as be
from opus_codec_tpu.celt import batch_pack as bp
N, lm = 960, 3
nbytes = be.cbr_bytes(64000, N, 48000, 1275)
for B in (4096, 8192, 16384):
    rng = np.random.default_rng(0)
    t = np.arange(N)/48000.0
    freqs = 100.0 + rng.uniform(0, 4000, size=(B,1))
    pcm = (0.33*np.sin(2*np.pi*t[None]*freqs) + 0.05*rng.standard_normal((B,N))).astype(np.float32)
    pcm = jax.device_put(jnp.asarray(pcm)); st = jax.device_put(be.init_stream_state(B))
    nb = jax.device_put(jnp.full((B,), nbytes, jnp.int32)); br = jax.device_put(jnp.full((B,), 64000, jnp.int32))
    def full(p,s,n,b):
        c, st2 = be.celt_encode_batch_plan(p,s,n,b,lm=lm)
        out, r = bp.pack_plan_device(c.ops, n, nbytes)
        return out, r, st2
    fj = jax.jit(full)
    o = fj(pcm, st, nb, br); np.asarray(o[0][:1,:1])
    t0 = time.perf_counter(); reps = 6
    for _ in range(reps):
        o = fj(pcm, st, nb, br)
    np.asarray(o[0][:1,:1])
    dt = (time.perf_counter()-t0)/reps
    print(json.dumps({"B": B, "ms": round(dt*1e3,1), "rtf": round(B*N/48000.0/dt,1)}))
