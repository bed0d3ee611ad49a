"""Mosaic integer-dot micro-bench: what does an exact int16 dot cost?

The fixed universe needs exact int16 x int16 -> int32 (wrapping) dots.
The serving kernels decompose into 4 int8 MXU passes (ops/pallas_fir.
_dot_fixed).  IF Mosaic lowers a direct int16 dot at better than 4
int8-pass cost, the fixed interpolate flagship (currently ~2.5x the float
launch time, at its 16-int8-MAC floor) could drop.  This measures, at the
flagship fixed-interp block shape [C=512, K=264] @ [K, 128]:
  - i8i8:   one int8 dot (the building block; x4 = current formulation)
  - i16i16: direct int16 dot with preferred_element_type=int32
  - i16i8:  mixed-width dot
  - i32i32: direct int32 dot (XLA-style exactness, expected slow)
Each variant runs the dot N_REPS times per program over a G-step grid.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, K, LB = 512, 264, 128
G1, G2 = 256, 2048   # two grid lengths; the slope removes tunnel latency
N_REPS = 8           # dots per grid step (amortizes grid overhead)


def make_fn(wdt, xdt, G):
    acc_dt = (jnp.float32 if wdt == jnp.bfloat16 else jnp.int32)

    def kernel(w_ref, x_ref, o_ref):
        # one distinct x slab per rep — the dots cannot be hoisted or CSE'd
        acc = jnp.zeros((C, LB), acc_dt)
        for r in range(N_REPS):
            acc += jnp.dot(w_ref[...], x_ref[r],
                           preferred_element_type=acc_dt)
        o_ref[0] = acc.astype(jnp.int32)

    @jax.jit
    def fn(w, x):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((C, K), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((N_REPS, K, LB), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, C, LB),
                                   lambda i: (i % 16, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, C, LB), jnp.int32),
        )(w.astype(wdt), x.astype(xdt))
    return fn


def main():
    rng = np.random.default_rng(0)
    w16 = rng.integers(-128, 128, size=(C, K)).astype(np.int16)
    x16 = rng.integers(-128, 128, size=(N_REPS, K, LB)).astype(np.int16)
    macs_per_step = N_REPS * C * K * LB
    for name, wdt, xdt in [("i8i8", jnp.int8, jnp.int8),
                           ("i16i16", jnp.int16, jnp.int16),
                           ("i16i8", jnp.int16, jnp.int8),
                           ("i32i32", jnp.int32, jnp.int32),
                           ("bf16bf16", jnp.bfloat16, jnp.bfloat16)]:
        try:
            w = jnp.asarray(w16)
            x = jnp.asarray(x16)
            # device_get forces a real round-trip (block_until_ready can
            # return early through the tunnel); the two-grid-length slope
            # removes the ~35 ms tunnel latency
            ts = {}
            for G in (G1, G2):
                fn = make_fn(wdt, xdt, G)
                jax.device_get(fn(w, x)[-1, 0, 0])
                best = 9e9
                for _ in range(5):
                    t0 = time.perf_counter()
                    jax.device_get(fn(w, x)[-1, 0, 0])
                    best = min(best, time.perf_counter() - t0)
                ts[G] = best
            per_step = (ts[G2] - ts[G1]) / (G2 - G1)
            print(f"{name:10s} {per_step*1e6:8.2f} us/step   "
                  f"{macs_per_step/per_step/1e12:7.1f} T MAC/s", flush=True)
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()
