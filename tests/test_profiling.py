"""StageTimer / device_trace harness (SURVEY §5: silk/debug.h analogue)."""
import time

from opus_codec_tpu.utils import StageTimer, device_trace


def test_stage_timer_tic_toc():
    t = StageTimer()
    t.tic("a")
    time.sleep(0.01)
    dt = t.toc("a")
    assert dt >= 0.009
    with t.stage("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["a"]["sum"] >= dt
    assert rep["a"]["min"] <= rep["a"]["mean"]
    assert "a" in t.format_report()
    t.reset()
    assert t.report() == {}


def test_stage_timer_blocks_on_device_work():
    import jax.numpy as jnp
    t = StageTimer()
    t.tic("matmul")
    x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    t.toc("matmul", block=x)
    assert t.report()["matmul"]["count"] == 1


def test_device_trace_noop():
    with device_trace(None):
        pass
