"""Multi-chip scale-out for the batched codec pipelines.

The unit of work is a stream batch ``[B, ...]``; streams are
independent, so the primary axis is **data parallelism**: shard B over
a ``jax.sharding.Mesh`` and let XLA's SPMD partitioner run the jitted
device passes (``celt.batch_encoder`` / ``celt.batch_decoder`` /
``dnn.*_jax``) on every chip with zero cross-chip traffic on the hot
path; the only mandatory collectives are metrics reductions (SURVEY
§2.6).  The reference scales by thread-per-stream
(tests/multhithread.rs) — this is its TPU-native replacement.

On a single-host test environment the same code runs against a virtual
CPU mesh (``XLA_FLAGS=--xla_force_host_platform_device_count=N``), which
is how tests/conftest.py and the driver's ``dryrun_multichip`` validate
the sharding story without N real chips.
"""

from .mesh import (make_mesh, shard_batch, replicate, batch_sharding,
                   ShardedCeltBatchEncoder)
from .pipeline import DevicePipeline, bucket_by

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding",
           "ShardedCeltBatchEncoder", "DevicePipeline", "bucket_by"]
