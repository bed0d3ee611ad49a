"""Measured MXU peaks (bf16 and int8) at the serving kernels' block shapes.

The bench roofline originally assumed the v5e datasheet ratio: int8 dots
run at 2x the bf16 MAC rate.  Measured on this chip (axon v5 lite) the
int8:bf16 ratio is ~2.8x, not 2x — which made the modeled int8 floor ~38%
too high and produced the "roofline_frac_quiet = 1.102" anomaly in
BENCH_r03/BENCH_LOCAL_r04 (a measured quiet launch FASTER than the modeled
physics floor, flagged by the round-3 review as dubious).

This experiment measures sustained MAC rates with weights+activations
VMEM-resident (pure MXU issue rate, no DMA) at the block shapes the tiled
and streamed kernels actually contract, and writes build/mxu_peaks.json.
bench._roofline_ms bakes the resulting peaks as calibrated constants with
this file as provenance.

Method per (dtype, shape): a pallas grid of G steps, each step issuing
N_REPS dependent dots; two grid lengths and a slope remove the tunnel
launch latency; best-of-5 per length.
"""
import functools
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_REPS = 8
LB = 128
DATASHEET_MACS = 98.5e12   # v5e bf16; only used to SIZE the grids


def grids_for(C, K):
    """Pick grid lengths so the long-short compute delta is ~30 ms —
    far above the tunnel's ms-level wall jitter even for tiny blocks."""
    step_est = N_REPS * C * K * LB / DATASHEET_MACS
    g2 = max(2048, int(30e-3 / step_est))
    return g2 // 8, g2

# [C, K] block operands actually contracted by the serving kernels:
#   [128, 264]  tiled flagship output block (R=128, K=filt_len+stride+pad)
#   [512, 264]  fixed interpolate block
#   [128, 136]  short-filter (q5 upsample) block
#   [256, 520]  long-filter (q10 decimate, streamed) block
#   [256, 208]  widened short-span block (24k->48k at R=256, _tiled_R)
#   [128, 400]  decimate tiled block (44.1k->24k q5, filt_len 152)
SHAPES = [(128, 264), (512, 264), (128, 136), (256, 520),
          (256, 208), (128, 400)]


def make_fn(wdt, C, K, G):
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
        )(w.astype(wdt), x.astype(xdt := wdt))
    return fn


def measure(wdt, C, K, n_samples=30):
    """Lower-envelope per-step MAC rate.  Contention on the shared chip
    only ever ADDS time to a wall sample, so with enough interleaved
    samples the minimum wall per grid length converges to the quiet
    floor; the slope of the two minima is then a clean per-step cost.
    (Paired-slope statistics are NOT robust here: a spike landing in the
    short-grid wall of a pair yields an understated slope, and quantile
    tricks over such pairs have produced rates 2-7x the datasheet.)"""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-128, 128, size=(C, K)).astype(np.int16))
    x = jnp.asarray(rng.integers(-128, 128,
                                 size=(N_REPS, K, LB)).astype(np.int16))
    macs_per_step = N_REPS * C * K * LB
    g1, g2 = grids_for(C, K)
    fns = {G: make_fn(wdt, C, K, G) for G in (g1, g2)}
    for G in (g1, g2):
        jax.device_get(fns[G](w, x)[-1, 0, 0])  # compile+warm
    lo = {g1: 9e9, g2: 9e9}
    for _ in range(n_samples):
        for G in (g1, g2):
            t0 = time.perf_counter()
            jax.device_get(fns[G](w, x)[-1, 0, 0])
            lo[G] = min(lo[G], time.perf_counter() - t0)
    s = (lo[g2] - lo[g1]) / (g2 - g1)
    if s <= 0:
        return None
    return macs_per_step / s


def measure_xla_gemm(precision, dt, M, K, N, n_samples=30):
    """Sustained MAC rate of the XLA (non-Pallas) GEMM the DENSE kernel
    family actually issues: jnp.dot(x[M,K], w[K,N], precision=...).  A
    lax.scan chains G dependent GEMMs (the carry re-seeds x's first row so
    XLA cannot hoist); two scan lengths + lower-envelope slope as above.
    This prices Precision.HIGHEST empirically — the bench roofline had
    assumed 6 bf16-equivalent passes and recorded hard_latency
    roofline_frac_quiet = 1.173, i.e. the assumption overprices the
    dense scheme by >=17% on this chip."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32) * .1,
                     dtype=dt)
    w = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * .1,
                    dtype=dt)
    macs_per_step = M * K * N
    step_est = macs_per_step / DATASHEET_MACS * 6
    g2 = max(64, int(30e-3 / step_est))
    g1 = g2 // 8

    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(x, w, iters):
        def body(carry, _):
            y = jnp.dot(carry, w, precision=precision,
                        preferred_element_type=jnp.float32)
            # feed the output back at matching dtype/shape: K == N here
            return y[:, :K].astype(dt), None
        out, _ = lax.scan(body, x, length=iters)
        return out[0, 0]

    for G in (g1, g2):
        jax.device_get(rep(x0, w, G))
    lo = {g1: 9e9, g2: 9e9}
    for _ in range(n_samples):
        for G in (g1, g2):
            t0 = time.perf_counter()
            jax.device_get(rep(x0, w, G))
            lo[G] = min(lo[G], time.perf_counter() - t0)
    s = (lo[g2] - lo[g1]) / (g2 - g1)
    return macs_per_step / s if s > 0 else None


def main():
    out = {"device": str(jax.devices()[0].device_kind),
           "shapes": {}, "peak_macs": {}}
    for name, wdt in [("int8", jnp.int8), ("bf16", jnp.bfloat16)]:
        best = 0.0
        for C, K in SHAPES:
            try:
                r = measure(wdt, C, K)
            except Exception as e:
                print(f"{name} [{C},{K}] FAILED: "
                      f"{str(e).splitlines()[0][:100]}", flush=True)
                continue
            if r is None:
                print(f"{name:5s} [{C:4d},{K:4d}]  all slopes inverted "
                      f"(chip busy)", flush=True)
                continue
            print(f"{name:5s} [{C:4d},{K:4d}]  {r/1e12:7.1f} T MAC/s",
                  flush=True)
            out["shapes"][f"{name}_{C}x{K}"] = r
            best = max(best, r)
        out["peak_macs"][name] = best
    # XLA-GEMM rates for the dense (non-Pallas) family: HIGHEST-precision
    # f32 (what resample_conv issues) and single-pass bf16 as the unit
    for name, prec, dt in [
            ("xla_f32_highest", jax.lax.Precision.HIGHEST, jnp.float32),
            ("xla_bf16", jax.lax.Precision.DEFAULT, jnp.bfloat16)]:
        try:
            r = measure_xla_gemm(prec, dt, 2048, 512, 512)
        except Exception as e:
            print(f"{name} FAILED: {str(e).splitlines()[0][:100]}",
                  flush=True)
            continue
        if r is None:
            print(f"{name}: slopes inverted (chip busy)", flush=True)
            continue
        print(f"{name:16s}  {r/1e12:7.1f} T MAC/s", flush=True)
        out["peak_macs"][name] = r
    i8, bf = out["peak_macs"].get("int8"), out["peak_macs"].get("bf16")
    if i8 and bf:
        print(f"int8:bf16 ratio = {i8/bf:.2f}x")
    xh, xb = (out["peak_macs"].get("xla_f32_highest"),
              out["peak_macs"].get("xla_bf16"))
    if xh and xb:
        print(f"HIGHEST costs {xb/xh:.2f} bf16-equivalent passes "
              f"(model had assumed 6)")
    path = os.path.join(os.path.dirname(__file__), os.pardir, "build",
                        "mxu_peaks.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
