"""Accumulation-order-faithful direct-path resampler (host, NumPy).

The batched TPU kernels regroup the f32 accumulation (MXU tree order), so
their outputs can differ from the reference by rounding ties within 1 LSB.
This module reproduces the reference's DIRECT-path hot loops with the
EXACT C arithmetic order, yielding bit-identical output — a strictly
stronger exactness claim, asserted with zero tolerated mismatches in
tests/test_exact_direct.py:

 - ``direct_single_exact``: resampler_basic_direct_single
   (resample.c:331-384): per output, serial f32 ``sum += sinct[j]*iptr[j]``
   over the filt_len taps (float build: MULT16_16 is a plain f32 multiply,
   SATURATE32PSHR an identity).  Vectorised over outputs, serial over taps
   — identical per-output rounding sequence.
 - ``direct_double_exact``: resampler_basic_direct_double
   (resample.c:389-436, selected when quality > 8): four f64 accumulators
   filled j%4-interleaved with f32 products (C computes float*float in
   float, then widens for +=), combined ((a0+a1)+a2)+a3 in f64, narrowed
   to f32 at the output store (spx_word16_t = float).

Both paths end in WORD2INT (arch.h:208-209) exactly as process_int does
(resample.c:1018-1023).  Only the DIRECT table layout (one row per phase,
reduced den phases) is order-reproducible this way; the interpolated path
mixes four sub-phase dots with cubic coefficients whose products our
collapsed table absorbs offline, so it keeps the <=1 LSB tie bound.
"""

from __future__ import annotations

import numpy as np

from . import filter_design as fd
from .convert import word2int

__all__ = ["direct_single_exact", "direct_double_exact",
           "resample_direct_exact"]


def _geometry(n_in: int, N: int, num: int, den: int):
    t = np.arange(0, n_in * den, num, dtype=np.int64)  # outputs' t = k*num
    starts = t // den          # window start within the padded stream
    phases = (t % den).astype(np.int64)
    return starts, phases


def direct_single_exact(x: np.ndarray, taps: np.ndarray, num: int,
                        den: int) -> np.ndarray:
    """x: f32 [n_in] fresh-stream channel samples; taps: f32 [den, N]
    (the direct sinc table, bit-identical to the C build).  Returns the
    one-shot output int16 [m] with C's serial-f32 accumulation order."""
    N = taps.shape[1]
    n_in = x.shape[0]
    xp = np.concatenate([np.zeros(N - 1, np.float32),
                         np.asarray(x, np.float32)])
    starts, phases = _geometry(n_in, N, num, den)
    acc = np.zeros(starts.shape[0], dtype=np.float32)
    tp = taps[phases]                     # [m, N] per-output tap rows
    for j in range(N):
        # one f32 product + one f32 add per output per tap, in tap order —
        # the exact rounding sequence of resample.c:352
        acc += tp[:, j] * xp[starts + j]
    return word2int(acc)


def direct_double_exact(x: np.ndarray, taps: np.ndarray, num: int,
                        den: int) -> np.ndarray:
    """Quality>8 variant: 4 interleaved f64 accumulators over f32 products
    (resample.c:409-417), combined in f64, narrowed to f32 at the store."""
    N = taps.shape[1]
    assert N % 4 == 0, N
    n_in = x.shape[0]
    xp = np.concatenate([np.zeros(N - 1, np.float32),
                         np.asarray(x, np.float32)])
    starts, phases = _geometry(n_in, N, num, den)
    tp = taps[phases]
    acc4 = np.zeros((4, starts.shape[0]), dtype=np.float64)
    for j in range(N):
        prod = (tp[:, j] * xp[starts + j]).astype(np.float64)  # f32 product
        acc4[j % 4] += prod
    s = ((acc4[0] + acc4[1]) + acc4[2]) + acc4[3]
    return word2int(s.astype(np.float32))


def resample_direct_exact(frames: np.ndarray, in_rate: int, out_rate: int,
                          quality: int) -> np.ndarray:
    """One-shot order-exact resample of int16 [n, C] interleaved frames on
    a DIRECT-path config; returns int16 [m, C]."""
    import math
    g = math.gcd(in_rate, out_rate)
    spec = fd.design_filter(in_rate // g, out_rate // g, quality)
    assert spec.use_direct, "order-exact mode covers the direct path only"
    taps = spec.phase_table.astype(np.float32)
    fn = direct_double_exact if quality > 8 else direct_single_exact
    outs = [fn(frames[:, c].astype(np.float32), taps, spec.num, spec.den)
            for c in range(frames.shape[1])]
    return np.stack(outs, axis=1)
