"""On-chip validation + timing of the FIXED_POINT device path.

1. Bit-exactness: the exact int8-plane matmul must produce IDENTICAL
   outputs on TPU and host (integers — no tolerance).
2. Timing: scan-slope per-launch time of the fixed step vs the float
   engine's production step, same geometry conventions as bench.py.
"""

import functools
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.ops import fir_fixed
from speex_resampler_tpu.parallel.batch import (_launch_geometry,
                                                make_batched_step)

B = 2048
TARGET = 9408


def build(ir, orr, q):
    g = math.gcd(ir, orr)
    spec = fd.design_filter(ir // g, orr // g, q, fixed_point=True)
    use_pallas = jax.default_backend() == "tpu"
    bspec = _launch_geometry(spec, TARGET, use_pallas=use_pallas)
    bstep = make_batched_step(spec, bspec, use_pallas=use_pallas)
    return spec, bspec, bstep


def slope(step, hist, x, w, iters=(4, 24), reps=4):
    @functools.partial(jax.jit, static_argnames=("n",))
    def rep(hist, x, w, salt, n):
        def body(carry, _):
            h, chk = carry
            hs = h.at[0, :].add((chk + salt).astype(jnp.int16))
            h2, y = step(hs, x, w)
            return (h2, chk + y[0, 0].astype(jnp.int32)), None
        (h, chk), _ = lax.scan(body, (hist, jnp.int32(0)), length=n)
        return chk

    for n in iters:
        jax.device_get(rep(hist, x, w, jnp.int16(99), n))
    ts = {}
    for n in iters:
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            jax.device_get(rep(hist, x, w, jnp.int16(7 + i), n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[iters[1]] - ts[iters[0]]) / (iters[1] - iters[0])


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    failures = []
    for (ir, orr, q) in [(44100, 48000, 7), (24000, 48000, 5),
                         (44100, 24000, 5), (48000, 44100, 10)]:
        spec, bspec, bstep = build(ir, orr, q)
        n_in = bspec.in_per_launch
        x_np = np.zeros((bstep.chunk_rows, B), dtype=np.int16)
        x_np[:n_in] = rng.integers(-32768, 32768,
                                   size=(n_in, B)).astype(np.int16)
        h_np = rng.integers(-32768, 32768,
                            size=(bstep.hist_rows, B)).astype(np.int16)
        h2, y = bstep.fn(jnp.asarray(h_np), jnp.asarray(x_np), bstep.w)
        y_np = np.asarray(jax.device_get(y))

        # host exact reference on a few lanes
        lanes = [0, 1, B // 2, B - 1]
        X = np.concatenate([h_np[-(spec.filt_len - 1):], x_np[:n_in]],
                           axis=0).T
        ref = fir_fixed.resample_fixed(X[lanes], 0, bspec.f0,
                                       bspec.out_per_launch, spec)
        exact = np.array_equal(y_np[:, lanes].T, ref)

        per_launch = sorted(slope(bstep.fn, jnp.asarray(h_np),
                                  jnp.asarray(x_np), bstep.w)
                            for _ in range(3))[1]
        gs = bspec.out_per_launch * B / per_launch / 1e9
        print(f"{ir}->{orr} q{q}: exact_vs_host={exact} "
              f"launch={per_launch*1e3:.3f} ms  out={gs:.1f} G/s "
              f"(in={bspec.in_per_launch*B/per_launch/1e9:.1f} G/s, "
              f"direct={spec.use_direct})")
        if not exact:
            failures.append((ir, orr, q))
    # this script is cited as the on-chip bit-equality gate for the fixed
    # universe (PARITY.md #23) — a mismatch must be a hard failure
    assert not failures, f"on-chip mismatch vs host exact: {failures}"


if __name__ == "__main__":
    main()
