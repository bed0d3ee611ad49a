"""Property tests for the closed-form phase math and tiled weight builder.

The closed form must agree with the reference's sequential recurrence
(resample.c:372-378) for arbitrary ratios, and the phase-tiled weight set
must satisfy the alignment/periodicity invariants the v3 kernel assumes.
"""

import math

import numpy as np
import pytest

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.ops import phase as ph


def _sequential(n_out, ls0, f0, num, den):
    """The reference recurrence, literally."""
    int_advance, frac_advance = num // den, num % den
    ls, f = ls0, f0
    starts, phases = [], []
    for _ in range(n_out):
        starts.append(ls)
        phases.append(f)
        ls += int_advance
        f += frac_advance
        if f >= den:
            f -= den
            ls += 1
    return starts, phases, ls, f


@pytest.mark.parametrize("num,den", [(1, 2), (147, 160), (160, 147),
                                     (147, 80), (1, 1), (320, 147),
                                     (12345, 677), (7, 9973)])
def test_closed_form_matches_recurrence(num, den):
    g = math.gcd(num, den)
    num, den = num // g, den // g
    rng = np.random.default_rng(num * 31 + den)
    for _ in range(5):
        ls0 = int(rng.integers(0, 50))
        f0 = int(rng.integers(0, den))
        n_out = int(rng.integers(1, 500))
        starts, phases, ls_end, f_end = _sequential(n_out, ls0, f0, num, den)
        k = np.arange(n_out)
        t = f0 + k * num
        assert np.array_equal(ls0 + t // den, starts)
        assert np.array_equal(t % den, phases)
        assert ph.advance(n_out, ls0, f0, num, den) == (ls_end, f_end)
        # producible_outputs counts ALL outputs whose window starts within
        # n_new inputs (several outputs can share a start when upsampling)
        n_new = int(starts[-1]) + 1
        more, _, _, _ = _sequential(n_out + 2 * den, ls0, f0, num, den)
        expected = sum(1 for st in more if st < n_new)
        assert ph.producible_outputs(n_new, ls0, f0, num, den) == expected


@pytest.mark.parametrize("num,den,quality", [
    (147, 160, 7), (1, 2, 5), (147, 80, 5), (1, 1, 10), (3, 4, 0),
    (441, 480, 3), (2, 3, 8),
])
def test_phase_tiled_weight_invariants(num, den, quality):
    spec = fd.design_filter(num, den, quality)
    for shift in (0, 16 - ((spec.filt_len - 1) % 16) if
                  (spec.filt_len - 1) % 16 else 0):
        ptw = ph.build_phase_tiled_weights(spec.phase_table, num, den, 0,
                                           origin_shift=shift)
        # alignment invariants the v3 kernel relies on
        assert ptw.S % 16 == 0
        assert all(int(o) % 16 == 0 for o in ptw.offsets)
        assert ptw.K % 8 == 0
        # P*R outputs consume exactly S inputs and return to phase 0
        assert (ptw.P * ptw.R * num) % den == 0
        assert ptw.P * ptw.R * num // den == ptw.S
        # every output j reconstructs its exact taps from w
        R, K = ptw.R, ptw.K
        for j in (0, 1, R - 1, R, ptw.P * R - 1):
            k, r = divmod(j, R)
            t = j * num
            start, p = t // den + shift, t % den
            col = ptw.w[k % ptw.P, :, r]
            lo = start - int(ptw.offsets[k % ptw.P]) - (k // ptw.P) * ptw.S
            # row placement: taps occupy [lo, lo+filt_len) of the column
            assert lo >= 0 and lo + spec.filt_len <= K
            assert np.array_equal(col[lo:lo + spec.filt_len],
                                  spec.phase_table[p])
            assert not col[:lo].any()
            assert not col[lo + spec.filt_len:].any()


def test_tiled_weights_periodicity():
    spec = fd.design_filter(147, 160, 7)
    ptw = ph.build_phase_tiled_weights(spec.phase_table, 147, 160, 0)
    # block k+P uses the same weights at offset +S
    num, den, R = 147, 160, ptw.R
    for k in (0, 3, ptw.P - 1):
        t0 = (k * R) * num
        t1 = ((k + ptw.P) * R) * num
        assert t1 // den - t0 // den == ptw.S
        assert t0 % den == t1 % den
