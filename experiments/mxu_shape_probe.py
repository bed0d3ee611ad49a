"""Why the flagship tiled kernel sits at ~0.48 of the datasheet model:
int8's 2x-over-bf16 MXU rate does NOT materialize at C=128 blocks.

experiments/v3_overhead_anatomy.py (round 5) showed the production launch
is MXU-bound: dots_only (no per-block assembly/extraction/epilogue) still
costs 0.31 ms vs the 0.169 ms model floor, and the implied per-dot rate
(~107 T int8 MAC/s at [128,264]) matches experiments/mxu_peak.py's
measured 98-107 T for that shape — i.e. HALF the 197 T the 2x assumption
promises, while [256,520]/[512,264] reach 135-137 T.

This probe maps the int8 sustained rate over (C, K, LB) to find which
axis buys the rate back: lane width LB (weight-stationary reuse across
output columns), block height C, or depth K.  bf16 at the same shapes
gives the true int8:bf16 ratio per shape.

Run: /opt/venv/bin/python experiments/mxu_shape_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_REPS = 8
DATASHEET_MACS = 98.5e12


def grids_for(C, K, LB):
    step_est = N_REPS * C * K * LB / DATASHEET_MACS
    g2 = max(2048, int(30e-3 / step_est))
    return g2 // 8, g2


def make_fn(wdt, C, K, LB, G):
    acc_dt = jnp.float32 if wdt == jnp.bfloat16 else jnp.int32

    def kernel(w_ref, x_ref, o_ref):
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
            out_specs=pl.BlockSpec((1, C, LB), lambda i: (i % 16, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, C, LB), jnp.int32),
        )(w.astype(wdt), x.astype(wdt))
    return fn


def measure(wdt, C, K, LB, n_samples=20):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-128, 128, size=(C, K)).astype(np.int16))
    x = jnp.asarray(rng.integers(-128, 128,
                                 size=(N_REPS, K, LB)).astype(np.int16))
    macs_per_step = N_REPS * C * K * LB
    g1, g2 = grids_for(C, K, LB)
    fns = {G: make_fn(wdt, C, K, LB, G) for G in (g1, g2)}
    for G in (g1, g2):
        jax.device_get(fns[G](w, x)[-1, 0, 0])
    lo = {g1: 9e9, g2: 9e9}
    for _ in range(n_samples):
        for G in (g1, g2):
            t0 = time.perf_counter()
            jax.device_get(fns[G](w, x)[-1, 0, 0])
            lo[G] = min(lo[G], time.perf_counter() - t0)
    s = (lo[g2] - lo[g1]) / (g2 - g1)
    return macs_per_step / s if s > 0 else None


CASES = [
    # flagship block, lane-width sweep
    ("int8", 128, 264, 128), ("int8", 128, 264, 256),
    ("int8", 128, 264, 512), ("int8", 128, 264, 1024),
    # height sweep at flagship depth
    ("int8", 256, 264, 128), ("int8", 256, 264, 256),
    ("int8", 512, 264, 256),
    # widened-R flagship geometry (R=256 -> K ~ 380)
    ("int8", 256, 384, 128), ("int8", 256, 384, 256),
    # bf16 ratio references
    ("bf16", 128, 264, 128), ("bf16", 128, 264, 256),
    ("bf16", 256, 264, 256),
]


def main():
    out = {}
    for name, C, K, LB in CASES:
        wdt = jnp.int8 if name == "int8" else jnp.bfloat16
        try:
            r = measure(wdt, C, K, LB)
        except Exception as e:
            print(f"{name} [{C},{K}]x{LB} FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        if r is None:
            print(f"{name} [{C},{K}]x{LB}: slopes inverted", flush=True)
            continue
        out[f"{name}_{C}x{K}_lb{LB}"] = r
        print(f"{name:5s} [{C:4d},{K:4d}] x LB={LB:4d}  "
              f"{r / 1e12:7.1f} T MAC/s", flush=True)
    path = os.path.join(os.path.dirname(__file__), os.pardir, "build",
                        "mxu_shape_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
