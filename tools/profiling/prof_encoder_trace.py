import time, json
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from opus_codec_tpu.celt import batch_encoder as be
from opus_codec_tpu.celt import batch_pack as bp

B, N, lm = 4096, 960, 3
nbytes = be.cbr_bytes(64000, N, 48000, 1275)
rng = np.random.default_rng(0)
t = np.arange(N) / 48000.0
freqs = 100.0 + rng.uniform(0, 4000, size=(B, 1))
pcm = (0.33 * np.sin(2 * np.pi * t[None] * freqs)
       + 0.05 * rng.standard_normal((B, N))).astype(np.float32)
pcm = jax.device_put(jnp.asarray(pcm))
st = jax.device_put(be.init_stream_state(B))
nb = jax.device_put(jnp.full((B,), nbytes, jnp.int32))
br = jax.device_put(jnp.full((B,), 64000, jnp.int32))

plan_jit = jax.jit(lambda p, s, n, b: be.celt_encode_batch_plan(p, s, n, b, lm=lm))

def full(p, s, n, b):
    c, st2 = be.celt_encode_batch_plan(p, s, n, b, lm=lm)
    out, r = bp.pack_plan_device(c.ops, n, nbytes)
    return out, r, st2

full_jit = jax.jit(full)
c, st2 = plan_jit(pcm, st, nb, br)
np.asarray(c.ops[:1, :1])
o = full_jit(pcm, st, nb, br)
np.asarray(o[0][:1, :1])
pack_jit = jax.jit(lambda ops, n: bp.pack_plan_device(ops, n, nbytes))
po = pack_jit(c.ops, nb)
np.asarray(po[0][:1, :1])
print("ops shape:", c.ops.shape, c.ops.dtype)

def timeit(fetch, f, *a, reps=8):
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    np.asarray(fetch(r))
    return (time.perf_counter() - t0) / reps

tp = timeit(lambda r: r[0].ops[:1, :1], plan_jit, pcm, st, nb, br)
tf = timeit(lambda r: r[0][:1, :1], full_jit, pcm, st, nb, br)
tk = timeit(lambda r: r[0][:1, :1], pack_jit, c.ops, nb)
aud = B * N / 48000.0
print(json.dumps({
    "plan_ms": round(tp*1e3,1), "full_ms": round(tf*1e3,1),
    "pack_ms": round(tk*1e3,1),
    "plan_rtf": round(aud/tp,1), "full_rtf": round(aud/tf,1),
    "pack_rtf": round(aud/tk,1)}))
