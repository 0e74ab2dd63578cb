"""Host/device pipelining (PP) and mode bucketing (EP-style).

``DevicePipeline`` formalizes the two-stage pipeline the codec runs in
production: the device computes frame k+1 while the host consumes the
(already dispatched) results of frame k.  JAX's async dispatch provides
the overlap — the device call returns futures immediately; the host
stage only blocks when it materialises them — so the wall-clock per
frame is max(device, host) instead of their sum (SURVEY §2.6 PP;
replaces the reference's thread-per-stream pipelining,
e.g. opus_demo's encode/decode loop).

``bucket_by`` is the EP-style scatter/gather for mixed-mode batches:
group stream indices by a per-stream key (codec mode, bandwidth,
frame size), run each bucket through its own batched lane, and scatter
results back to stream order (SURVEY §7 step 6).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Hashable, List, Optional, Tuple

import numpy as np

__all__ = ["DevicePipeline", "bucket_by"]


class DevicePipeline:
    """Two-stage pipeline: ``device_fn`` (async jitted step) feeding
    ``host_fn`` (blocking consumer, e.g. packet assembly / IO).

    >>> pipe = DevicePipeline(enc.encode_device_packed, to_packets)
    >>> for pcm in frames:
    ...     done = pipe.feed(pcm)      # host result for frame k-1
    >>> tail = pipe.drain()            # host result for the last frame
    """

    def __init__(self, device_fn: Callable, host_fn: Callable):
        self.device_fn = device_fn
        self.host_fn = host_fn
        self._pending = None

    def feed(self, x) -> Optional[Any]:
        """Dispatch the device stage for ``x``; run the host stage on
        the previous dispatch (its device work has been overlapping
        this call).  Returns the previous frame's host result."""
        out = None
        nxt = self.device_fn(x)
        if self._pending is not None:
            out = self.host_fn(self._pending)
        self._pending = nxt
        return out

    def drain(self) -> Optional[Any]:
        out = None
        if self._pending is not None:
            out = self.host_fn(self._pending)
            self._pending = None
        return out


def bucket_by(keys) -> Dict[Hashable, np.ndarray]:
    """Group stream indices by a per-stream key.  Returns
    {key: indices} with indices in ascending stream order; the caller
    runs one batched lane per bucket and scatters outputs back with
    the same indices."""
    keys = list(keys)
    out: Dict[Hashable, List[int]] = {}
    for i, k in enumerate(keys):
        out.setdefault(k, []).append(i)
    return {k: np.asarray(v, np.int64) for k, v in out.items()}
