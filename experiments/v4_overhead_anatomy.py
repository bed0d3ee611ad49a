"""Decompose the v4 per-block cost: MXU dots vs VPU digit extraction.

The streamed kernel's per-block work is (int8 scheme, D=4):
  1. extract xh/xl int8 planes from the int16 patch  [K, lb]  (VPU)
  2. 2*D int8 MXU dots [R, K] @ [K, lb]
  3. digit combine + WORD2INT                        [R, lb]  (VPU)
Measured whole-block cost ~5.5-5.8 us (experiments/v4_k_layout.py and the
real launch: 0.85 ms / 147 blocks).  This bench isolates each part:
  - mxu_only: dots on PRE-EXTRACTED int8 planes (no per-rep extraction)
  - extract_i32+2: the xh/xl extraction feeding one dot pair
  - full: extraction + dots (what the kernel does today)
Calibrates whether pre-extracting planes (hoisting out of the per-block
loop) is worth restructuring the kernel.  (An int16-domain extraction
variant was tried and dropped: Mosaic fails to legalize arith shifts on
i16 vectors on this toolchain.)

RESULT (v5e, tunnel-noisy): full_i32 measures the same as mxu_only within
noise, and mxu_only alone runs ~206 T int8 MAC/s — extraction is free and
the MXU is at practical peak.  See docs/design.md "v4 overhead anatomy".
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, K, LB = 128, 512, 1024
G1, G2 = 512, 8192
D = 4  # digits (q10 streamed escalates to D=4)


def timed(fn, w, x):
    ts = {}
    for G in (G1, G2):
        f = fn(G)
        jax.device_get(f(w, x)[-1, 0, 0])
        best = 9e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_get(f(w, x)[-1, 0, 0])
            best = min(best, time.perf_counter() - t0)
        ts[G] = best
    return (ts[G2] - ts[G1]) / (G2 - G1)


def bench(name, kernel, w, x, x_spec):
    def make(G):
        @jax.jit
        def fn(w, x):
            return pl.pallas_call(
                kernel,
                grid=(G,),
                in_specs=[pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec(x_spec, lambda i: (0,) * len(x_spec),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, R, LB), lambda i: (i % 16, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((16, R, LB), jnp.int32),
            )(w, x)
        return fn
    per_step = timed(make, w, x)
    print(f"{name:14s} {per_step*1e6:8.2f} us/step", flush=True)
    return per_step


def main():
    rng = np.random.default_rng(0)
    w8 = jnp.asarray(rng.integers(-128, 128, (2 * D, R, K)).astype(np.int8))
    x16 = jnp.asarray(rng.integers(-32768, 32768, (K, LB)).astype(np.int16))
    x8 = jnp.asarray(rng.integers(-128, 128, (2, K, LB)).astype(np.int8))

    # MXU only: 2*D dots on pre-extracted planes
    def k_mxu(w_ref, x_ref, o_ref):
        acc = jnp.zeros((R, LB), jnp.int32)
        for d in range(D):
            acc += jnp.dot(w_ref[2 * d], x_ref[0],
                           preferred_element_type=jnp.int32)
            acc += jnp.dot(w_ref[2 * d + 1], x_ref[1],
                           preferred_element_type=jnp.int32)
        o_ref[0] = acc
    t_mxu = bench("mxu_only", k_mxu, w8, x8, (2, K, LB))

    # extraction only (current int32 path), result consumed by ONE dot so
    # it cannot be elided
    def k_ex32(w_ref, x_ref, o_ref):
        u32 = x_ref[...].astype(jnp.int32)
        xh = (u32 >> 8).astype(jnp.int8)
        xl = ((u32 & 255) - 128).astype(jnp.int8)
        o_ref[0] = (jnp.dot(w_ref[0], xh, preferred_element_type=jnp.int32)
                    + jnp.dot(w_ref[1], xl,
                              preferred_element_type=jnp.int32))
    t_ex32 = bench("extract_i32+2", k_ex32, w8, x16, (K, LB))

    # the full current block: extraction + 2*D dots (int32 path)
    def k_full(w_ref, x_ref, o_ref):
        u32 = x_ref[...].astype(jnp.int32)
        xh = (u32 >> 8).astype(jnp.int8)
        xl = ((u32 & 255) - 128).astype(jnp.int8)
        acc = jnp.zeros((R, LB), jnp.int32)
        for d in range(D):
            acc += jnp.dot(w_ref[2 * d], xh,
                           preferred_element_type=jnp.int32)
            acc += jnp.dot(w_ref[2 * d + 1], xl,
                           preferred_element_type=jnp.int32)
        o_ref[0] = acc
    t_full = bench("full_i32", k_full, w8, x16, (K, LB))

    two_dots = t_mxu / D  # cost of 2 dots
    print(f"\nper-2-dot MXU   {two_dots*1e6:6.2f} us  "
          f"({2*R*K*LB/two_dots/1e12:6.1f} T MAC/s)")
    print(f"extraction i32  {(t_ex32 - two_dots)*1e6:6.2f} us")
    print(f"full i32 vs mxu {(t_full - t_mxu)*1e6:6.2f} us overhead")


if __name__ == "__main__":
    main()
