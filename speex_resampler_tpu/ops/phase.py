"""Closed-form phase/index arithmetic for the resampler hot path.

The reference hot loops (resample.c:331-559) advance per output sample:
    last_sample += int_advance; samp_frac_num += frac_advance;
    if (samp_frac_num >= den) { samp_frac_num -= den; last_sample++; }
which has the closed form (with num = int_advance*den + frac_advance and
initial state (ls0, f0), f0 in [0, den)):
    window_start(k)  = ls0 + (f0 + k*num) // den
    phase(k)         = (f0 + k*num) %  den
Every output sample is therefore an independent dot product — the entire
sequential state machine disappears, which is what makes the TPU
formulation (one phase-indexed matmul per launch) possible.

All functions here are exact integer host math (Python ints / NumPy int64);
nothing runs on device.  Phase state evolves deterministically from chunk
sizes alone, so the host mirrors it and the device never syncs scalars back.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np

__all__ = [
    "producible_outputs",
    "advance",
    "block_constants",
    "build_padded_weights",
]


def producible_outputs(n_new: int, ls0: int, f0: int, num: int,
                       den: int) -> int:
    """Number of outputs the hot loop emits given ``n_new`` fresh input
    samples (loop condition ``last_sample < in_len``, resample.c:344)."""
    if n_new <= ls0:
        return 0
    # largest k with ls0 + (f0 + k*num)//den <= n_new - 1
    return ((n_new - ls0) * den - 1 - f0) // num + 1


def advance(n_out: int, ls0: int, f0: int, num: int,
            den: int) -> tuple[int, int]:
    """State after emitting ``n_out`` outputs: (last_sample, samp_frac_num)
    before the consumed-input subtraction (resample.c:891-894)."""
    t = f0 + n_out * num
    return ls0 + t // den, t % den


@dataclasses.dataclass(frozen=True)
class BlockConstants:
    """Per-launch constants for the block formulation.

    Outputs are laid out k = b*den + r (block b, sub-phase r).  Within a
    launch that starts at fractional phase f0:
        phase(b, r)  = p[r]            (independent of b)
        start(b, r)  = ls0 + o[r] + b*num
    so the whole launch is  Y[b, r] = dot(H[p[r]], X[ls0 + b*num + o[r] :]).
    """
    num: int
    den: int
    f0: int
    p: np.ndarray  # [den] int32 phase per sub-index
    o: np.ndarray  # [den] int32 window-start offset per sub-index, in [0, num]


@lru_cache(maxsize=256)
def block_constants(num: int, den: int, f0: int,
                    group: int = 1) -> BlockConstants:
    """Constants for super-blocks of R = group*den outputs (consuming exactly
    group*num inputs each, since den outputs always consume num inputs)."""
    r = np.arange(group * den, dtype=np.int64)
    t = f0 + r * num
    return BlockConstants(
        num=num, den=den, f0=f0,
        p=(t % den).astype(np.int32),
        o=(t // den).astype(np.int32),
    )


def build_padded_weights(phase_table: np.ndarray, num: int, den: int,
                         f0: int, group: int = 1) -> np.ndarray:
    """Scatter per-phase taps into the padded matmul weight matrix.

    With R = group*den output columns and stride = group*num inputs per
    super-block:  W[l, r] = H[p[r], l - o[r]] for l - o[r] in [0, filt_len),
    else 0, with L = filt_len + group*num rows.  A launch is then the single
    matmul / strided conv
        Y[B, R] = P[B, L] @ W[L, R],   P[b] = X[ls0 + b*stride : +L].
    ``group`` widens the matmul for small den so MXU lanes stay filled.
    W depends only on (phase_table, num, den, f0, group); callers cache it
    per f0 (steady-state serving feeds multiples of ``num`` inputs per
    launch, so f0 — and therefore W — never changes).
    """
    filt_len = phase_table.shape[1]
    bc = block_constants(num, den, f0, group)
    R = group * den
    L = filt_len + group * num
    W = np.zeros((L, R), dtype=phase_table.dtype)
    cols = np.arange(R)
    rows = bc.o[None, :] + np.arange(filt_len)[:, None]  # [filt_len, R]
    W[rows, cols[None, :]] = phase_table[bc.p].T
    return W
