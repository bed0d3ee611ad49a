"""Probe: is the >2048-lane per-launch cliff per-pallas_call width?

experiments/lane_scaling.py measured per-lane launch cost stepping up
~60% above B=2048 (docs/design.md "Lane-axis scaling").  If the cliff is
a property of one wide pallas_call (grid shape / DMA scheduling), then
splitting a B=4096 launch into two sequential 2048-lane kernel calls
inside one jit should recover the optimum; if it is memory-system-level
(HBM pressure of the doubled working set), the split won't help.

Usage: python experiments/lane_split_probe.py
"""

import functools
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.parallel.batch import (_launch_geometry,
                                                make_batched_step)

ITERS_SHORT, ITERS_LONG, REPS = 4, 24, 4


def slope(fn, hist0, x, w):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(hist, x, w, salt, iters):
        def body(carry, _):
            h, chk = carry
            hs = h.at[0, :].add((chk + salt).astype(jnp.int16))
            h2, y = fn(hs, x, w)
            return (h2, chk + y[0, 0].astype(jnp.int32)), None
        (h, chk), _ = lax.scan(body, (hist, jnp.int32(0)), length=iters)
        return chk

    for it in (ITERS_SHORT, ITERS_LONG):
        jax.device_get(rep(hist0, x, w, jnp.int16(99), it))
    best = {}
    for it in (ITERS_SHORT, ITERS_LONG):
        b = float("inf")
        for i in range(REPS):
            t0 = time.perf_counter()
            jax.device_get(rep(hist0, x, w, jnp.int16(i), it))
            b = min(b, time.perf_counter() - t0)
        best[it] = b
    return (best[ITERS_LONG] - best[ITERS_SHORT]) / (ITERS_LONG
                                                     - ITERS_SHORT)


def main():
    g = math.gcd(44100, 48000)
    spec = fd.design_filter(44100 // g, 48000 // g, 7)
    bspec = _launch_geometry(spec, 9408, use_pallas=True)
    bstep = make_batched_step(spec, bspec, use_pallas=True)
    fn, w = bstep.fn, bstep.w
    rng = np.random.default_rng(0)

    def inputs(B):
        x = np.zeros((bstep.chunk_rows, B), dtype=np.int16)
        x[:bspec.in_per_launch] = (rng.integers(
            -32768, 32768, (bspec.in_per_launch, B)) // 2).astype(np.int16)
        h = jnp.zeros((bstep.hist_rows, B), dtype=jnp.int16)
        return h, jnp.asarray(x)

    for B in (2048, 4096):
        h, x = inputs(B)
        s = slope(fn, h, x, w)
        print(f"single call  B={B}: {s*1e3:7.4f} ms/launch", flush=True)

    half = 2048

    @jax.jit
    def fn_split(hist, x, w):
        h1, y1 = fn(hist[:, :half], x[:, :half], w)
        h2, y2 = fn(hist[:, half:], x[:, half:], w)
        return (jnp.concatenate([h1, h2], axis=1),
                jnp.concatenate([y1, y2], axis=1))

    h, x = inputs(4096)
    s = slope(fn_split, h, x, w)
    print(f"2x2048 split B=4096: {s*1e3:7.4f} ms/launch", flush=True)

    # sanity: identical outputs
    _, ya = fn(h, x, w)
    _, yb = fn_split(h, x, w)
    print("split == single:", bool(np.array_equal(np.asarray(ya),
                                                  np.asarray(yb))))


if __name__ == "__main__":
    main()
