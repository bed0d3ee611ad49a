"""Does v4's K padding to 128 multiples cost real MXU time?

The streamed kernel (resample_conv_tm_pallas_v4) stores weight blocks as
[R, K] with K on the minor (lane) axis so one DMA fetches a block; the
minor axis forces K up to a 128 multiple (q10 48k->44.1k: K=440 -> 512,
+16% contraction depth).  IF the MXU contraction cost scales with the true
K (fine sublane granularity) rather than ceil(K/128)*128, then either
  (a) a non-128-multiple K minor dim ([R, 448]), or
  (b) a K-on-sublanes layout ([K, R], R=128 minor exactly, contraction via
      dot_general over dim 0 of both operands)
saves ~12.5% of every v4 pass.  This measures all forms at the v4 block
shape (R=128, q10 K variants, int8 operands, lb=1024 lanes).

RESULT (v5e): per-step cost is FLAT across K=512/448/440 in both layouts —
MXU occupancy quantizes to the 128-lane tile, so v4's K padding costs no
time and no layout change is warranted.  See docs/design.md
"v4 overhead anatomy".
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, LB = 128, 1024
G1, G2 = 512, 8192
N_REPS = 16


def make_fn(K, form, G):
    def kernel(w_ref, x_ref, o_ref):
        acc = jnp.zeros((R, LB), jnp.int32)
        for r in range(N_REPS):
            if form == "rk":
                acc += jnp.dot(w_ref[...], x_ref[r],
                               preferred_element_type=jnp.int32)
            else:  # "kr": w [K, R], contract over dim 0 of both
                acc += jax.lax.dot_general(
                    w_ref[...], x_ref[r], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        o_ref[0] = acc

    wshape = (R, K) if form == "rk" else (K, R)

    @jax.jit
    def fn(w, x):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec(wshape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((N_REPS, K, LB), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, LB), lambda i: (i % 16, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, R, LB), jnp.int32),
        )(w, x)
    return fn


def main():
    rng = np.random.default_rng(0)
    for K in (512, 448, 440):
        for form in ("rk", "kr"):
            w = jnp.asarray(rng.integers(
                -128, 128, size=(R, K) if form == "rk" else (K, R)
            ).astype(np.int8))
            x = jnp.asarray(rng.integers(
                -128, 128, size=(N_REPS, K, LB)).astype(np.int8))
            macs_per_step = N_REPS * R * K * LB
            try:
                ts = {}
                for G in (G1, G2):
                    fn = make_fn(K, form, G)
                    jax.device_get(fn(w, x)[-1, 0, 0])
                    best = 9e9
                    for _ in range(5):
                        t0 = time.perf_counter()
                        jax.device_get(fn(w, x)[-1, 0, 0])
                        best = min(best, time.perf_counter() - t0)
                    ts[G] = best
                per_step = (ts[G2] - ts[G1]) / (G2 - G1)
                print(f"K={K} {form}   {per_step*1e6:8.2f} us/step   "
                      f"{macs_per_step/per_step/1e12:7.1f} T MAC/s",
                      flush=True)
            except Exception as e:
                print(f"K={K} {form}   FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:110]}", flush=True)


if __name__ == "__main__":
    main()
