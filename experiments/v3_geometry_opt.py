"""Production v3 kernel at alternative block geometries (R, lane_tile).

experiments/mxu_shape_probe.py mapped the int8 MXU rate over block
shapes: the rate is ~197 T MAC/s x K_tile_utilization x f(C, LB), where
K_util = K / roundup(K, 128) and f penalizes 128-row blocks and 128-wide
lane tiles ([128,264]@lb128 = 92 T vs [256,384]@lb256 = 184 T).  The
flagship's R=128 geometry lands K=264 on 2.06 K-tiles (util 0.69) — the
kernel runs AT its shape's measured rate (v3_overhead_anatomy: dots_only
0.31 ms vs full 0.35) but the shape itself wastes a third of the MXU.

This experiment runs the PRODUCTION resample_conv_tm_pallas_v3 at
R in {128, 256} x lane_tile in {128, 256, 512}, checks outputs are
bit-identical across geometries (blocking does not change per-output
math), and reports honest scan-slope launch times.

Run: /opt/venv/bin/python experiments/v3_geometry_opt.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.ops import pallas_fir as pf
from speex_resampler_tpu.ops import phase as ph
from speex_resampler_tpu.parallel import batch as pb

B = 2048
ITERS_SHORT, ITERS_LONG = 4, 24
REPS = 4
N_SLOPES = 3
N_OUT = 10240      # flagship launch output rows (bench geometry)


def build(spec, R, lane_tile):
    H = pb._hist_rows_tiled(spec.filt_len)
    ptw = ph.build_phase_tiled_weights(spec.phase_table, spec.num, spec.den,
                                       0, R=R,
                                       origin_shift=H - (spec.filt_len - 1))
    P, K = ptw.w.shape[0], ptw.w.shape[1]
    n_blocks = N_OUT // R
    scheme, int8p, scales = pb._resolve_scheme(pf, ptw.w, "auto", False)
    assert scheme == "int8", scheme
    gp = pf._v3_periods_per_program(P)
    n_periods = n_blocks // P
    if n_periods % gp:
        gp = 1
    V = pf._v3_views(ptw.S, K, H, ptw.offsets) + (gp - 1)
    back = pf._v3_back(ptw.S, H)
    chunk_rows = (n_periods - back + V) * ptw.S
    w = (jnp.asarray(int8p[0]), jnp.asarray(int8p[1]))
    conv = functools.partial(
        pf.resample_conv_tm_pallas_v3, offsets=tuple(int(o) for o in
                                                     ptw.offsets),
        S=ptw.S, n_blocks=n_blocks, scheme="int8", scales=scales,
        lane_tile=lane_tile)
    return dict(conv=conv, w=w, H=H, chunk_rows=chunk_rows, P=P, K=K,
                S=ptw.S, gp=gp, n_periods=n_periods, R=R)


def measure(conv, hist0, x0, w):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(hist, x, w, salt, iters):
        def body(carry, _):
            h, xc, chk = carry
            s = (chk + salt).astype(jnp.int16)
            xs = xc.at[0, :].add(s)
            y = conv(h, xs, w)
            return (h, xs, chk + y[0, 0].astype(jnp.int32)), None
        (h, xc, chk), _ = lax.scan(body, (hist, x, jnp.int32(0)),
                                   length=iters)
        return chk

    for it in (ITERS_SHORT, ITERS_LONG):
        jax.device_get(rep(hist0, x0, w, jnp.int16(99), it))

    def one_slope(seed):
        ts = {}
        for it in (ITERS_SHORT, ITERS_LONG):
            best = float("inf")
            for i in range(REPS):
                t0 = time.perf_counter()
                jax.device_get(rep(hist0, x0, w, jnp.int16(seed + i), it))
                best = min(best, time.perf_counter() - t0)
            ts[it] = best
        return (ts[ITERS_LONG] - ts[ITERS_SHORT]) / (ITERS_LONG - ITERS_SHORT)

    slopes = sorted(max(one_slope(s), 0.0) for s in range(1, N_SLOPES + 1))
    slopes = [s for s in slopes if s > 0] or [float("nan")]
    mid = len(slopes) // 2
    med = (slopes[mid] if len(slopes) % 2
           else (slopes[mid - 1] + slopes[mid]) / 2)
    return med, slopes


def main():
    # argv: [num den quality [R:lb ...]]  (default: flagship, full sweep)
    if len(sys.argv) >= 4:
        num, den, q = (int(a) for a in sys.argv[1:4])
        cases = [tuple(int(v) for v in a.split(":"))
                 for a in sys.argv[4:]] or [(128, 128), (256, 128),
                                            (512, 128)]
    else:
        num, den, q = 147, 160, 7
        cases = [(128, 128), (128, 256), (128, 512),
                 (256, 128), (256, 256), (256, 512)]
    spec = fd.design_filter(num, den, q)
    rng = np.random.default_rng(0)
    out = {}
    ref_y = None
    for R, lb in cases:
        name = f"R{R}_lb{lb}"
        try:
            g = build(spec, R, lb)
            print(f"[{time.strftime('%H:%M:%S')}] {name}: P={g['P']} "
                  f"K={g['K']} S={g['S']} gp={g['gp']} "
                  f"n_periods={g['n_periods']} chunk_rows={g['chunk_rows']}",
                  flush=True)
            hist0 = jnp.zeros((g["H"], B), jnp.int16)
            n_real = 9408
            x_np = np.zeros((g["chunk_rows"], B), np.int16)
            x_np[:n_real] = (rng.integers(-32768, 32768, (n_real, B),
                                          ) // 2).astype(np.int16)
            # same seed -> same first n_real rows across geometries
            rng2 = np.random.default_rng(0)
            x_np[:n_real] = (rng2.integers(-32768, 32768, (n_real, B))
                             // 2).astype(np.int16)
            x0 = jnp.asarray(x_np)
            y = np.asarray(jax.device_get(g["conv"](hist0, x0, g["w"])))
            if ref_y is None:
                ref_y = y
                out["bit_identical_ref"] = name
            else:
                eq = bool(np.array_equal(y[:N_OUT], ref_y[:N_OUT]))
                out[f"{name}_bit_identical"] = eq
                print(f"  bit-identical to ref: {eq}", flush=True)
            med, runs = measure(g["conv"], hist0, x0, g["w"])
            out[name] = {"ms": round(med * 1e3, 4),
                         "runs": [round(v * 1e3, 4) for v in runs],
                         "K": g["K"], "P": g["P"]}
            print(f"  {name}: {med * 1e3:.4f} ms "
                  f"({N_OUT * B / med / 1e9:.1f} G out/s)", flush=True)
        except Exception as e:
            out[name] = {"error": str(e).splitlines()[0][:200]}
            print(f"  {name} FAILED: {str(e).splitlines()[0][:160]}",
                  flush=True)
        path = os.path.join(os.path.dirname(__file__), os.pardir, "build",
                            "v3_geometry_opt.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print("done")


if __name__ == "__main__":
    main()
