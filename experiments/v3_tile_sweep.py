"""Flagship (44.1k->48k q7, int8 scheme) lane-tile sweep on the v3 kernel.

Round-1 measured lane_tile=128 best for the HIGHEST scheme; the int8
scheme moves less data per pass, so re-check 128/256/512 and report
scan-slope per-launch times.
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
from speex_resampler_tpu.ops import pallas_fir
from speex_resampler_tpu.parallel.batch import (_launch_geometry,
                                                _tiled_weights,
                                                _resolve_scheme,
                                                _hist_rows_tiled, _next_hist)

B = 2048
TARGET = 9408


def build_step(lane_tile):
    spec = fd.design_filter(147, 160, 7)
    bspec = _launch_geometry(spec, TARGET, use_pallas=True)
    assert bspec.kernel == "tiled"
    ptw = _tiled_weights(spec, 0)
    scheme, int8p, scales = _resolve_scheme(pallas_fir, ptw.w, "auto", False)
    assert scheme == "int8"
    H = _hist_rows_tiled(spec.filt_len)
    gp = pallas_fir._v3_periods_per_program(ptw.P)
    V = pallas_fir._v3_views(ptw.S, ptw.K, H, ptw.offsets) + (gp - 1)
    n_periods = bspec.n_blocks // ptw.P
    back = pallas_fir._v3_back(ptw.S, H)
    chunk_rows = (n_periods - back + V) * ptw.S
    w = (jnp.asarray(int8p[0]), jnp.asarray(int8p[1]))
    offsets = tuple(int(o) for o in ptw.offsets)
    n_in = bspec.in_per_launch
    n_out = bspec.out_per_launch

    @jax.jit
    def step(hist, x, wop):
        y = pallas_fir.resample_conv_tm_pallas_v3(
            hist, x, wop, offsets, S=ptw.S, n_blocks=bspec.n_blocks,
            scheme="int8", scales=scales, lane_tile=lane_tile)[:n_out]
        return _next_hist(hist, x, n_in, H), y

    return step, w, H, chunk_rows, n_in, n_out


def slope(step, hist, x, w):
    @functools.partial(jax.jit, static_argnames=("n",))
    def rep(hist, x, w, salt, n):
        def body(c, _):
            h, chk = c
            hs = h.at[0, :].add((chk + salt).astype(jnp.int16))
            h2, y = step(hs, x, w)
            return (h2, chk + y[0, 0].astype(jnp.int32)), None
        (h, chk), _ = lax.scan(body, (hist, jnp.int32(0)), length=n)
        return chk

    for n in (4, 24):
        jax.device_get(rep(hist, x, w, jnp.int16(99), n))
    ts = {}
    for n in (4, 24):
        best = float("inf")
        for i in range(4):
            t0 = time.perf_counter()
            jax.device_get(rep(hist, x, w, jnp.int16(3 + i), n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[24] - ts[4]) / 20


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    for lt in (None, 128, 256, 512):
        step, w, H, chunk_rows, n_in, n_out = build_step(lt)
        x_np = np.zeros((chunk_rows, B), np.int16)
        x_np[:n_in] = rng.integers(-32768, 32768,
                                   (n_in, B)).astype(np.int16)
        h = jnp.asarray(rng.integers(-32768, 32768,
                                     (H, B)).astype(np.int16))
        x = jnp.asarray(x_np)
        runs = sorted(slope(step, h, x, w) for _ in range(3))
        per = runs[1]
        print(f"lane_tile={lt}: {per*1e3:.3f} ms "
              f"({n_out*B/per/1e9:.1f} G out/s)  runs="
              f"{[round(r*1e3, 3) for r in runs]}")


if __name__ == "__main__":
    main()
