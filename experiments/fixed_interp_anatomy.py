"""Where does the fixed-universe INTERPOLATED block's time go?

BENCH r05 probe: the fixed flagship (44100->48000 q7, tiled, n_accum=4)
sits at roofline_frac_quiet ~0.57 while the fixed DIRECT geometry
(24000->48000 q5, widened R) reaches 0.90.  The interp block's per-block
work is (C = 4R accumulator-major rows, K taps, lb lanes):

  1. xh/xl int8 plane extraction from the int16 scratch   [K, lb]   VPU
  2. 4 int8 MXU dots [C, K] @ [K, lb] (wh/wl x xh/xl)                MXU
  3. exact wrap combine (<<16, <<8 shifts + adds) + bias  [C, lb]   VPU
  4. Q15 cubic mix across the 4 accumulator groups
     (MULT16_32_Q15 per group: 2 int32 multiplies each)   [R, lb]   VPU
  5. SATURATE32PSHR(15) + int16 store                     [R, lb]   VPU

The datasheet roofline model prices ONLY step 2 (4 int8 dots = 2
bf16-equivalent passes).  This experiment measures the cumulative ladder
on the real chip at the production block shape so the gap is attributed,
not guessed: each variant adds one stage; the deltas are per-stage costs
and the full-ladder per-block time is compared against the production
kernel's own per-block quiet cost (bench sweep row / n_blocks).

Production epilogue helpers are imported from ops/pallas_fir (shared
definitions — the variants cannot drift from the kernel).

Run on the TPU: python experiments/fixed_interp_anatomy.py
"""
import functools
import math
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speex_resampler_tpu.ops.pallas_fir import (_dot_fixed, _fixed_mix_rows,
                                                _sat32pshr15)

R, K, LB = 128, 264, 128     # fixed flagship tiled block (C = 4R = 512)
C = 4 * R
N_REPS = 4                   # blocks per grid step
G1, G2 = 256, 2048


def timed(make, *args):
    ts = {}
    for G in (G1, G2):
        f = make(G)
        jax.device_get(f(*args)[-1, 0, 0])
        best = 9e9
        for _ in range(8):
            t0 = time.perf_counter()
            jax.device_get(f(*args)[-1, 0, 0])
            best = min(best, time.perf_counter() - t0)
        ts[G] = best
    return (ts[G2] - ts[G1]) / (G2 - G1) / N_REPS   # s per block


def run(name, kernel, operands, specs):
    def make(G):
        @jax.jit
        def fn(*ops):
            return pl.pallas_call(
                kernel,
                grid=(G,),
                in_specs=specs,
                out_specs=pl.BlockSpec((1, R, LB), lambda i: (i % 16, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((16, R, LB), jnp.int16),
            )(*ops)
        return fn
    per_block = timed(make, *operands)
    macs = 4 * C * K * LB            # the 4 int8 dots
    print(f"{name:12s} {per_block * 1e6:8.3f} us/block   "
          f"({macs / per_block / 1e12:6.1f} T MAC/s effective)", flush=True)
    return per_block


def main():
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.integers(-128, 128, (2, C, K)).astype(np.int8))
    bias = jnp.asarray(rng.integers(-2**20, 2**20, (C,)).astype(np.int32))
    coef = jnp.asarray(rng.integers(0, 32768, (4, R)).astype(np.int32))
    xh = jnp.asarray(rng.integers(-128, 128, (K, LB)).astype(np.int8))
    x16 = jnp.asarray(rng.integers(-32768, 32768, (K, LB)).astype(np.int16))

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    w_s, b_s, c_s, x_s = vspec, vspec, vspec, vspec

    # salt each rep through the first scratch row so Mosaic cannot hoist
    # the dots out of the rep loop (the bench learned this the hard way)
    def rep_loop(body, o_ref, seed_ref):
        acc16 = None
        for r in range(N_REPS):
            out = body(r, seed_ref)
            acc16 = out if acc16 is None else (acc16 + out).astype(jnp.int16)
        o_ref[0] = acc16

    # 1) mxu_only: 4 dots on PRE-EXTRACTED planes, raw int32 adds
    def k_mxu(w_ref, x_ref, o_ref):
        def body(r, x_ref):
            xs = x_ref[...].astype(jnp.int8)
            xs = xs.at[0, 0].add(jnp.int8(r))
            # two DISTINCT activation operands so Mosaic cannot CSE the
            # four dots down to two (xs2 is a 1-op VPU derivation, the
            # same order of cost as the real xl plane's source)
            xs2 = xs + jnp.int8(1)
            d = functools.partial(jnp.dot,
                                  preferred_element_type=jnp.int32)
            wh, wl = w_ref[0], w_ref[1]
            acc = d(wh, xs) + d(wh, xs2) + d(wl, xs) + d(wl, xs2)
            return acc[:R].astype(jnp.int16)
        rep_loop(body, o_ref, x_ref)

    t_mxu = run("mxu_only", k_mxu, (planes, xh), [w_s, x_s])

    # 2) + exact wrap combine and bias (production _dot_fixed, fed
    #    pre-extracted xh for BOTH planes: isolates combine, not extract)
    def k_comb(w_ref, b_ref, x_ref, o_ref):
        def body(r, x_ref):
            xs = x_ref[...].astype(jnp.int16)
            xs = xs.at[0, 0].add(jnp.int16(r))
            acc = _dot_fixed(lambda p: w_ref[p], b_ref[...], xs)
            return acc[:R].astype(jnp.int16)
        rep_loop(body, o_ref, x_ref)

    t_comb = run("+combine", k_comb, (planes, bias, xh.astype(jnp.int16)),
                 [w_s, b_s, x_s])

    # 3) + real int16 input (extraction now runs inside _dot_fixed's
    #    caller contract: int16 scratch -> xh/xl)
    t_ext = run("+extract", k_comb, (planes, bias, x16), [w_s, b_s, x_s])

    # 4) + Q15 cubic mix + saturating store (the full production epilogue)
    def k_full(w_ref, b_ref, c_ref, x_ref, o_ref):
        def body(r, x_ref):
            xs = x_ref[...]
            xs = xs.at[0, 0].add(jnp.int16(r))
            acc = _dot_fixed(lambda p: w_ref[p], b_ref[...], xs)
            return _fixed_mix_rows(acc, c_ref[...])
        rep_loop(body, o_ref, x_ref)

    t_full = run("full", k_full, (planes, bias, coef, x16),
                 [w_s, b_s, c_s, x_s])

    print(f"\nper-block attribution (us): dots {t_mxu*1e6:.3f}, "
          f"combine+bias +{(t_comb-t_mxu)*1e6:.3f}, "
          f"extract +{(t_ext-t_comb)*1e6:.3f}, "
          f"mix+sat +{(t_full-t_ext)*1e6:.3f}")
    print("compare: production per-block = bench fixed flagship "
          "launch_ms_quiet / n_blocks (bspec.n_blocks)")


if __name__ == "__main__":
    main()
