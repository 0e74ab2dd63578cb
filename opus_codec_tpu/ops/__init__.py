"""Device-side primitive ops shared across subsystems.

``fixed32``: wrap-exact int32 fixed-point arithmetic (the jnp mirror of
``silk.sigproc``) used by the batched SILK lanes.
"""

from . import fixed32

__all__ = ["fixed32"]
