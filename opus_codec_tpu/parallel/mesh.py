"""Mesh construction + batch sharding helpers (DP over streams)."""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "replicate",
           "ShardedCeltBatchEncoder"]


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp"):
    """A 1-D device mesh over the first ``n_devices`` devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis,))


def batch_sharding(mesh, axis: str = "dp"):
    """NamedSharding that splits the leading (stream-batch) axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P(axis))


def replicate(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh, axis: str = "dp"):
    """device_put a pytree of [B, ...] arrays with B split over the
    mesh; rank-0 leaves are replicated."""
    import jax

    dp = batch_sharding(mesh, axis)
    rep = replicate(mesh)

    def put(x):
        import jax.numpy as jnp
        arr = jnp.asarray(x)
        return jax.device_put(arr, dp if arr.ndim >= 1 else rep)

    return jax.tree_util.tree_map(put, tree)


class ShardedCeltBatchEncoder:
    """CeltBatchEncoder with the stream batch sharded over a mesh.

    The device symbol-planning pass is identical code — XLA SPMD runs
    each chip's shard independently (streams never talk to each other);
    the host pack lane consumes the gathered plans.  B must divide by
    the mesh size.
    """

    def __init__(self, batch: int, mesh=None, bitrate: int = 64000,
                 frame_size: int = 960, **kw):
        from ..batch_api import CeltBatchEncoder

        self.mesh = mesh if mesh is not None else make_mesh()
        n = self.mesh.devices.size
        if batch % n:
            raise ValueError(f"batch {batch} not divisible by mesh size "
                             f"{n}")
        self.inner = CeltBatchEncoder(batch, bitrate=bitrate,
                                      frame_size=frame_size, **kw)
        self.inner.state = shard_batch(self.inner.state, self.mesh)
        import jax
        self.inner._nbytes_dev = jax.device_put(
            self.inner._nbytes_dev, batch_sharding(self.mesh))
        self.inner._bitrate_dev = jax.device_put(
            self.inner._bitrate_dev, batch_sharding(self.mesh))

    @property
    def final_ranges(self):
        return self.inner.final_ranges

    def encode_step_device(self, pcm):
        import jax
        pcm = jax.device_put(pcm, batch_sharding(self.mesh))
        return self.inner.encode_step_device(pcm)

    def pack(self, c):
        return self.inner.pack(c)

    def encode(self, pcm):
        return self.pack(self.encode_step_device(pcm))[0]
