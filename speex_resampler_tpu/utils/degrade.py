"""Shared engine-level zero-fill degradation.

The reference degrades to the zero-output resampler on alloc failure so
callers ignoring error codes can't deadlock: resampler_basic_zero emits
zeros while advancing state identically (resample.c:561-591), installed by
the fn-ptr swap at :785-791.  At engine scale the analogous failure is a
device fault inside a launch (synchronous dispatch error or asynchronous
readback error); this mixin holds the ONE implementation both
``BatchedResampler`` and ``FleetResampler`` use, so the two cannot drift
(round-3 review found exactly such a divergence in the duplicated code).

Host state contract while degraded: ``self._hist`` is a NumPy array (the
device may be unusable), every launch consumes/produces the exact sample
counts as zeros, and degradation is sticky like the C fn-ptr swap.

Requires on the subclass: ``_degraded`` (bool), ``_hist``, ``B``,
``_step.hist_rows``, ``bspec.in_per_launch`` / ``bspec.out_per_launch``.
"""

from __future__ import annotations

import numpy as np

from .host import to_host

__all__ = ["ZeroFillDegradation"]


class ZeroFillDegradation:
    """Mixin: engine-level zero-output degradation with exact accounting."""

    @property
    def degraded(self) -> bool:
        """True once a device failure swapped in the zero-output path."""
        return self._degraded

    def _enter_degraded(self) -> None:
        """Swap onto the host zero-output path (resample.c:785-791).
        Sticky: like the C core, reset_mem does not reinstall the real
        resampler.  The filter history is salvaged if the device can still
        be read, else zeroed — degraded output is all-zero either way, so
        accounting (the only remaining contract) is unaffected."""
        if self._degraded:
            return
        self._degraded = True
        try:
            h = to_host(self._hist)
        except Exception:
            h = np.zeros((self._step.hist_rows, self.B), dtype=np.int16)
        self._hist = np.array(h, dtype=np.int16)

    def _hist_host(self) -> np.ndarray:
        """Blocking host view of the filter history; a device failure
        surfacing here degrades the engine instead of raising out of a
        control-path operation (flush/skip_zeros/state_dict)."""
        try:
            return to_host(self._hist)
        except Exception:
            self._enter_degraded()
            return np.array(self._hist)

    def _zero_result(self) -> np.ndarray:
        return np.zeros((self.bspec.out_per_launch, self.B),
                        dtype=np.int16)

    def _advance_degraded_hist(self, chunk: np.ndarray) -> np.ndarray:
        """History advance identical to the healthy step: last H rows of
        hist ++ chunk[:q] (resampler_basic_zero advances state while
        writing zeros)."""
        q = self.bspec.in_per_launch
        H = self._step.hist_rows
        return np.concatenate([self._hist, chunk[:q]], axis=0)[-H:]

    def _recv(self, y) -> np.ndarray:
        """Blocking readback of a dispatched launch result; an async
        device failure surfacing here degrades the engine and substitutes
        the exact count of zero samples."""
        try:
            return to_host(y)
        except Exception:
            self._enter_degraded()
            return self._zero_result()
