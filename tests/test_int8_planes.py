"""Int8 digit-plane decomposition (ops/int8_planes.py).

Groundwork for an int8 fast kernel: the decomposition must reconstruct the
quantized weights exactly and its worst-case error certificate must be
tight enough for the ≤1 LSB contract on standard configs.  (The kernel
itself is shelved: a Mosaic probe measured int8 matmuls ~10x slower than
f32-HIGHEST on these shapes on the current toolchain — see
experiments/ and docs/design.md.)
"""

import numpy as np
import pytest

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.ops import int8_planes as ip
from speex_resampler_tpu.ops import phase as ph


@pytest.mark.parametrize("num,den,quality", [
    (147, 160, 7), (1, 2, 5), (147, 80, 5), (1, 1, 10),
])
def test_decomposition_reconstructs_and_bounds(num, den, quality):
    spec = fd.design_filter(num, den, quality)
    ptw = ph.build_phase_tiled_weights(spec.phase_table, num, den, 0)
    planes = ip.decompose(ptw.w)

    # exact reconstruction of the quantized weights
    W = sum(planes.planes[d].astype(np.int64) * 256 ** d
            for d in range(planes.D))
    assert np.array_equal(W, np.round(
        ptw.w.astype(np.float64) * 2.0 ** planes.sw).astype(np.int64))

    # the integer pipeline reproduces the quantized dot exactly
    rng = np.random.default_rng(0)
    K = ptw.K
    x = rng.integers(-32768, 32768, size=K, dtype=np.int64)
    xh, xl8 = x >> 8, (x & 255) - 128
    k = 0
    acc = np.zeros(ptw.R)
    for d in range(planes.D):
        dh = planes.planes[d, k].astype(np.int64).T @ xh
        dl = planes.planes[d, k].astype(np.int64).T @ xl8
        acc += (256 * dh + dl) * 2.0 ** (8 * d - planes.sw)
    acc += planes.bias[k]
    exact_q = (W[k].T @ x) / 2.0 ** planes.sw
    assert np.allclose(acc, exact_q, rtol=0, atol=1e-6)

    # certificate: small filters certify below half an LSB; long q>8
    # filters correctly exceed the gate (the fast path must refuse them)
    if spec.filt_len <= 160:
        assert planes.err_bound < 0.45, planes.err_bound
    else:
        assert planes.err_bound >= 0.45
