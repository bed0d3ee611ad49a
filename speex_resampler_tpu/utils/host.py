"""Host transfer helper.

``jax.Array.__array__`` on a not-yet-ready result can deadlock on some
backends (observed with async CPU dispatch under the axon plugin); always
make readiness explicit before handing buffers to NumPy.
"""

from __future__ import annotations

import numpy as np

__all__ = ["to_host"]


def to_host(x) -> np.ndarray:
    """Block until ``x`` is ready, then view it as a NumPy array."""
    if hasattr(x, "block_until_ready"):
        x = x.block_until_ready()
    return np.asarray(x)
