"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Bench runs happen on the real TPU chip; tests validate numerics and the
multi-chip sharding story on XLA:CPU with 8 virtual devices, mirroring the
reference's thread-smoke testing role (SURVEY.md §4, tests/multhithread.rs).
"""
import os

# Force CPU even if the session environment pins a TPU platform (the axon
# site hook re-sets JAX_PLATFORMS, so the config API is authoritative).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the batched planner is a large unrolled
# graph; cache compiles across test runs.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
