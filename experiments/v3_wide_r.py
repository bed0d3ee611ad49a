"""Does widening the tiled kernel's output block R fix the P=1 roofline gap?

BENCH r04: 24000->48000 q5 (tiled, P=1, S=64, K=144, R=128) sits at
roofline_frac_quiet 0.468 while the flagship (K=264) hits 0.947.
experiments/mxu_peak.py says why: an int8 dot at [128, 136] sustains only
~62 T MAC/s vs ~95 T at [128, 264] and ~143 T at [256, 520] — the per-block
GEMM is simply too small.  For P == 1 the weight cycle is ONE matrix, so R
(outputs per block) is a free knob: R=512 gives S=256, K=336 and a
[512, 336] dot at the same total output.

This experiment times resample_conv_tm_pallas_v3 on the SAME total work
(~same in-frames per launch) with weights built at R in {128, 256, 512},
int8 scheme (the production choice for this config), B = 2048 lanes,
lower-envelope slope between two scan lengths like bench.measure_config.

Run on the TPU: python experiments/v3_wide_r.py
"""
import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.ops import pallas_fir
from speex_resampler_tpu.ops import phase as ph
from speex_resampler_tpu.parallel.batch import _hist_rows_tiled

B = 2048
TARGET_IN = 8960          # the bench geometry's in_per_launch for this row
ITERS = (4, 24)
REPS = 4
N_SLOPES = 3


def build(R, in_rate, out_rate, q, fixed):
    g = math.gcd(in_rate, out_rate)
    spec = fd.design_filter(in_rate // g, out_rate // g, q,
                            fixed_point=fixed)
    H = _hist_rows_tiled(spec.filt_len)
    ptw = ph.build_phase_tiled_weights(
        spec.phase_table, spec.num, spec.den, 0, R=R,
        origin_shift=H - (spec.filt_len - 1))
    gp = pallas_fir._v3_periods_per_program(ptw.P)
    n_periods = max(gp, round(TARGET_IN / (ptw.S * gp)) * gp)
    n_blocks = n_periods * ptw.P
    back = pallas_fir._v3_back(ptw.S, H)
    V = pallas_fir._v3_views(ptw.S, ptw.K, H, ptw.offsets) + (gp - 1)
    chunk_rows = (n_periods - back + V) * ptw.S
    if fixed:
        assert spec.use_direct, "fixed interp not covered here"
        planes, bias = pallas_fir.fixed_weight_planes_tiled(ptw.w)
        w = (jnp.asarray(planes), jnp.asarray(bias))
        conv = functools.partial(
            pallas_fir.resample_conv_tm_pallas_v3,
            offsets=tuple(int(o) for o in ptw.offsets), S=ptw.S,
            n_blocks=n_blocks, scheme="fixed")
    else:
        int8p = pallas_fir.int8_weights_auto(ptw.w, 0.25)
        assert int8p is not None, "int8 certificate failed at this R"
        w = (jnp.asarray(int8p[0]), jnp.asarray(int8p[1]))
        conv = functools.partial(
            pallas_fir.resample_conv_tm_pallas_v3,
            offsets=tuple(int(o) for o in ptw.offsets), S=ptw.S,
            n_blocks=n_blocks, scheme="int8", scales=int8p[2])
    return spec, ptw, w, conv, H, chunk_rows, n_blocks, n_periods


def measure(R, in_rate=24000, out_rate=48000, q=5, fixed=False):
    spec, ptw, w, conv, H, chunk_rows, n_blocks, n_periods = build(
        R, in_rate, out_rate, q, fixed)
    n_in = n_periods * ptw.S
    rng = np.random.default_rng(0)
    x_np = np.zeros((chunk_rows, B), dtype=np.int16)
    x_np[:n_in] = (rng.integers(-32768, 32768, (n_in, B)) // 2
                   ).astype(np.int16)
    x = jnp.asarray(x_np)
    hist = jnp.zeros((H, B), dtype=jnp.int16)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(hist, x, w, salt, iters):
        def body(carry, _):
            xc, chk = carry
            xs = xc.at[0, :].add((chk + salt).astype(jnp.int16))
            y = conv(hist, xs, w)
            return (xs, chk + y[0, 0].astype(jnp.int32)), None
        (xc, chk), _ = lax.scan(body, (x, jnp.int32(0)), length=iters)
        return chk

    for it in ITERS:
        jax.device_get(rep(hist, x, w, jnp.int16(9), it))
    slopes = []
    for s in range(N_SLOPES):
        ts = {}
        for it in ITERS:
            best = 9e9
            for i in range(REPS):
                t0 = time.perf_counter()
                jax.device_get(rep(hist, x, w, jnp.int16(s * 7 + i), it))
                best = min(best, time.perf_counter() - t0)
            ts[it] = best
        slopes.append((ts[ITERS[1]] - ts[ITERS[0]]) / (ITERS[1] - ITERS[0]))
    slopes.sort()
    quiet = slopes[0]
    out = n_blocks * ptw.R * B
    # MXU model floor at the bench ladder (int8 digit = 1 bf16-pass;
    # fixed = 2 passes over the plane pair)
    D = np.asarray(w[0]).shape[0] if not fixed else 2
    flops = 2.0 * n_blocks * ptw.K * ptw.R * B * D
    roof_ms = flops / 197e12 * 1e3
    print(f"{in_rate}->{out_rate} q{q} {'fx' if fixed else 'i8'} "
          f"R={ptw.R:4d} P={ptw.P} S={ptw.S:4d} K={ptw.K:4d} "
          f"n_blocks={n_blocks:4d} in={n_in:6d} D={D} "
          f"quiet={quiet * 1e3:7.4f} ms roof={roof_ms:7.4f} ms "
          f"frac={roof_ms / (quiet * 1e3):5.3f} "
          f"out={out / quiet / 1e9:7.1f} G/s", flush=True)
    return quiet, out


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    cases = [(24000, 48000, 5, True, (128, 256)),
             (32000, 48000, 3, False, (128, 256)),
             (16000, 48000, 4, False, (128, 512))]
    for ir, orate, q, fx, rs in cases:
        for R in rs:
            try:
                measure(R, ir, orate, q, fx)
            except Exception as e:
                print(f"{ir}->{orate} fx={fx} R={R}: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
