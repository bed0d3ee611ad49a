"""On-chip A/B: dense (v1) vs phase-tiled (v2) kernels, slope-timed.

Usage: python experiments/v2_bench.py [lane_tile]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.parallel.batch import (_launch_geometry,
                                                make_batched_step)

LB = int(sys.argv[1]) if len(sys.argv) > 1 else 0
B = 2048
TARGET = 9408  # ~comparable input frames per launch for both kernels

spec = fd.design_filter(147, 160, 7)


def bench(kernel_name, use_pallas):
    bspec = _launch_geometry(spec, TARGET, use_pallas=use_pallas)
    if kernel_name == "dense-pallas":
        bspec = _launch_geometry(spec, TARGET, use_pallas=False)
    bstep = make_batched_step(spec, bspec, use_pallas=use_pallas)
    step, w = bstep.fn, bstep.w
    rng = np.random.default_rng(0)
    x_np = np.zeros((bstep.chunk_rows, B), dtype=np.int16)
    x_np[:bspec.in_per_launch] = (rng.integers(
        -32768, 32768, size=(bspec.in_per_launch, B)) // 2).astype(np.int16)
    x = jnp.asarray(x_np)
    hist0 = jnp.zeros((bstep.hist_rows, B), dtype=jnp.int16)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(hist, x, w, salt, iters):
        def body(carry, _):
            h, chk = carry
            h, y = step(h, x + salt, w)
            return (h, chk + y[0, 0].astype(jnp.int32)), None
        (h, chk), _ = lax.scan(body, (hist, jnp.int32(0)), length=iters)
        return chk

    for it in (4, 24):
        jax.device_get(rep(hist0, x, w, jnp.int16(99), it))
    ts = {}
    for it in (4, 24):
        best = 9e9
        for i in range(4):
            t0 = time.perf_counter()
            jax.device_get(rep(hist0, x, w, jnp.int16(i), it))
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    sl = (ts[24] - ts[4]) / 20
    out = bspec.out_per_launch * B
    print(f"{kernel_name} [{bspec.kernel}] in={bspec.in_per_launch} "
          f"out={bspec.out_per_launch}: {sl*1e3:.3f}ms/launch  "
          f"{out/sl/1e9:.1f} Gsample/s out", flush=True)


bench("tiled-pallas", True)
if len(sys.argv) > 2 and sys.argv[2] == "all":
    bench("dense-pallas", True)
    bench("dense-xla", False)

# pass-counting probe: same tiled kernel at DEFAULT precision (inaccurate,
# timing only) to infer how many bf16 MXU passes Precision.HIGHEST costs.
import speex_resampler_tpu.ops.pallas_fir as pf
import jax.numpy as _jnp


def patched_kernel(off_ref, w_ref, x_ref, o_ref, *, P, S, K):
    j = jax.experimental.pallas.program_id(1)


import jax.experimental.pallas as pl
_orig = pf._kernel_v2


def _kernel_default(off_ref, w_ref, x_ref, o_ref, *, P, S, K):
    j = pl.program_id(1)
    k = j % P
    off = (j // P) * S + off_ref[k]
    off = pl.multiple_of(off, 16)
    patch = x_ref[pl.ds(off, K), :].astype(jnp.float32)
    o_ref[0] = pf._word2int(jnp.dot(
        w_ref[k], patch, preferred_element_type=jnp.float32))


pf._kernel_v2 = _kernel_default
jax.clear_caches()  # bust the jit cache so the patched kernel recompiles
bench("tiled-DEFAULT(prec)", True)
pf._kernel_v2 = _orig
jax.clear_caches()
