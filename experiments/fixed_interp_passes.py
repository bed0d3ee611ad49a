"""A/B: the exact fixed-universe dot as 4 vs 3 int8 MXU passes.

The fixed interpolate kernel's per-block dot is
    acc = (wh.xh << 16) + ((wh.xl + wl.xh) << 8) + wl.xl + bias
(ops/pallas_fir._dot_fixed).  The two middle products share the <<8 scale,
so they can be ONE stacked dot over a 2K contraction:
    wmid = [wh | wl]  (C x 2K),  xmid = [xl ; xh]  (2K x lb)
MAC count is identical (exact int16 x int16 needs all four int8-plane
products; Karatsuba does not fit int8 operand range), so any win is
per-pass overhead only — this script measures whether it is real on the
chip.  Exactness is unaffected (wrapping int32 is order-independent);
asserted against the XLA dense fixed twin below.

Usage:  python experiments/fixed_interp_passes.py [4pass|3pass]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

MODE = sys.argv[1] if len(sys.argv) > 1 else "4pass"

import speex_resampler_tpu.ops.pallas_fir as pf

if MODE == "3pass":
    def _dot_fixed3(plane, bias_row, u16):
        u32 = u16.astype(jnp.int32)
        xh = (u32 >> 8).astype(jnp.int8)
        xl = ((u32 & 255) - 128).astype(jnp.int8)
        d = functools.partial(jnp.dot, preferred_element_type=jnp.int32)
        wh, wl = plane(0), plane(1)
        wmid = jnp.concatenate([wh, wl], axis=1)
        xmid = jnp.concatenate([xl, xh], axis=0)
        acc = ((d(wh, xh) << 16) + (d(wmid, xmid) << 8) + d(wl, xl))
        return acc + bias_row[:, None]
    pf._dot_fixed = _dot_fixed3

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.parallel.batch import (_launch_geometry,
                                                make_batched_step)

B = 2048
TARGET = 9408


def main():
    spec = fd.design_filter(147, 160, 7, fixed_point=True)
    bspec = _launch_geometry(spec, TARGET, use_pallas=True)
    assert bspec.kernel == "tiled", bspec
    step = make_batched_step(spec, bspec, use_pallas=True)
    rng = np.random.default_rng(0)
    h = jnp.asarray((rng.integers(-32768, 32768,
                                  (step.hist_rows, B)) // 2).astype(
        np.int16))
    x_np = np.zeros((step.chunk_rows, B), np.int16)
    x_np[:bspec.in_per_launch] = (rng.integers(
        -32768, 32768, (bspec.in_per_launch, B)) // 2).astype(np.int16)
    x = jnp.asarray(x_np)

    # exactness vs the XLA dense fixed twin
    dspec = _launch_geometry(spec, TARGET, use_pallas=False)
    dstep = make_batched_step(spec, dspec, use_pallas=False)
    _, y = step.fn(h, x, step.w)
    hd = jnp.asarray(np.asarray(h)[-(spec.filt_len - 1):])
    xd = jnp.asarray(x_np[:dstep.chunk_rows])
    _, yd = dstep.fn(hd, xd, dstep.w)
    n = min(y.shape[0], yd.shape[0])
    assert np.array_equal(np.asarray(y)[:n], np.asarray(yd)[:n]), "mismatch"
    print(f"{MODE}: bit-exact vs dense twin over {n} rows")

    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(hist, x, w, salt, iters):
        def body(carry, _):
            hh, chk = carry
            hs = hh.at[0, :].add((chk + salt).astype(jnp.int16))
            h2, yy = step.fn(hs, x, w)
            return (h2, chk + yy[0, 0].astype(jnp.int32)), None
        (_, chk), _ = lax.scan(body, (hist, jnp.int32(0)), length=iters)
        return chk

    for it in (4, 24):
        jax.device_get(rep(h, x, step.w, jnp.int16(9), it))
    best = {}
    for it in (4, 24):
        b = 9e9
        for i in range(6):
            t0 = time.perf_counter()
            jax.device_get(rep(h, x, step.w, jnp.int16(i), it))
            b = min(b, time.perf_counter() - t0)
        best[it] = b
    per = (best[24] - best[4]) / 20
    print(f"{MODE}: {per*1e3:.4f} ms/launch, "
          f"{bspec.out_per_launch * B / per / 1e9:.1f} G out/s")


if __name__ == "__main__":
    main()
