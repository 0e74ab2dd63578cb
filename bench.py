#!/usr/bin/env python
"""Benchmark: aggregate realtime factor of the batched CELT device pipeline.

Runs on whatever accelerator JAX provides (the real TPU chip under the
driver). Measures the steady-state throughput of the device half of the
codec — preemphasis, forward MDCT (MXU matmul), band energies,
normalisation, denormalisation, inverse MDCT + TDAC, deemphasis — for a
batch of concurrent 48 kHz streams, 20 ms frames.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is relative to the north star in BASELINE.json: >=10,000x
aggregate realtime on a v5e-8, i.e. 1,250x per chip. The host symbol lane
(range coding) is not yet in this measurement; it moves to native code in a
later round and is pipelined behind the device compute.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from opus_codec_tpu.celt.batch import (celt_analysis_batch,
                                           celt_synthesis_batch)
    from opus_codec_tpu.celt.modes import standard_mode

    m = standard_mode()
    B = 2048          # concurrent streams per chip
    N = 960           # 20 ms frames
    steps = 50
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.standard_normal((B, N + m.overlap)) * 0.3,
                      jnp.float32)
    pmem = jnp.zeros(B, jnp.float32)
    tail = jnp.zeros((B, m.overlap // 2), jnp.float32)
    dmem = jnp.zeros(B, jnp.float32)

    def frame_step(carry, _):
        pcm, pmem, tail, dmem = carry
        X, bandE, bandLogE, pmem = celt_analysis_batch(pcm, pmem)
        out, tail, dmem = celt_synthesis_batch(X, bandLogE, tail, dmem)
        # chain the output into the next frame's input so consecutive
        # steps are strictly data-dependent (no pipelining artifacts)
        nxt = jnp.concatenate([pcm[:, N:], out], axis=1)
        return (nxt, pmem, tail, dmem), jnp.mean(out)

    @jax.jit
    def run(carry):
        return jax.lax.scan(frame_step, carry, None, length=steps)

    pcm2 = jnp.asarray(rng.standard_normal((B, N + m.overlap)) * 0.3,
                       jnp.float32)
    carry = (pcm, pmem, tail, dmem)
    carry2 = (pcm2, pmem, tail, dmem)
    # warmup / compile; the timed run uses DIFFERENT data because the
    # remote execution layer caches identical dispatches
    (c2, outs) = run(carry)
    float(outs[-1])          # force full execution + readback
    jax.block_until_ready(carry2)

    t0 = time.perf_counter()
    (c2, outs) = run(carry2)
    float(outs[-1])          # block_until_ready alone does not await the
    dt = time.perf_counter() - t0   # remote execution on this backend

    audio_seconds = B * steps * (N / 48000.0)
    rtf = audio_seconds / dt
    baseline_per_chip = 10000.0 / 8.0
    print(json.dumps({
        "metric": "celt_device_pipeline_realtime_factor_per_chip",
        "value": round(rtf, 1),
        "unit": "x_realtime_48kHz_mono_20ms",
        "vs_baseline": round(rtf / baseline_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
