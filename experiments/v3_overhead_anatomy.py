"""Anatomy of the v3 tiled kernel's launch cost at the flagship geometry.

Round 4's loop-hoisting fix (bench.py `rep`: the input is now a salted
loop-carried value, so XLA cannot elide per-iteration work) revealed the
honest flagship launch at ~0.355 ms against a 0.169 ms MXU model floor —
roofline_frac_quiet ~0.48 with shape_peak_frac ~1.0, i.e. the MXU block
dots themselves run at the measured speed of light but the LAUNCH costs
2.1x the dots.  This experiment attributes the other half.

Hypothesis: the per-block VPU work is comparable to the per-block MXU
time and does not fully overlap.  Per [R=128, K=264, lb=128] block the
int8 kernel does: scratch assembly (K*lb int16 copies), int32 widen +
hi/lo digit extraction (~7 VPU ops/element), the f32 digit combine
(3 FMAs over [R, lb]) and the WORD2INT epilogue — ~0.5M element-ops,
~0.13 us at the VPU's ~4 T op/s, vs 0.13 us of MXU per block.

Variants (all at the production flagship geometry, scheme int8 D=3):
  full          production kernel body (baseline == bench flagship row)
  no_assemble   scratch never rewritten per block (copies removed; DMA,
                extraction, dots, epilogue kept)   -> copy cost
  hoist         extraction hoisted per VIEW: each program extracts its
                V views (+hist) to int8 hi/lo planes ONCE, blocks
                assemble int8 scratch pairs and dot directly
                (bit-identical math: extraction is elementwise, so
                gather-then-extract == extract-then-gather)
  no_epilogue   per-digit int32 dots summed raw, no f32 combine / no
                word2int (not exact; times the epilogue)
  dots_only     assembly+extraction once per program, minimal epilogue
                -> MXU + grid + DMA floor of this launch structure

Methodology: bench.py's honest scan (salted carried input, checksum
carry), lower-envelope slope of two scan lengths, REPS samples/length,
median of slopes per variant (experiments/mxu_peak.py rationale).

Run: /opt/venv/bin/python experiments/v3_overhead_anatomy.py
"""
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.ops import pallas_fir as pf
from speex_resampler_tpu.parallel import batch as pb

B = 2048
TARGET_IN = 9408
ITERS_SHORT, ITERS_LONG = 4, 24
REPS = 4
N_SLOPES = 3
_LANE = 128


def _geometry():
    spec = fd.design_filter(147, 160, 7)
    bspec = pb._launch_geometry(spec, TARGET_IN, use_pallas=True)
    assert bspec.kernel == "tiled", bspec.kernel
    ptw = pb._tiled_weights(spec, bspec.f0)
    scheme, int8p, scales = pb._resolve_scheme(pf, ptw.w, "auto", False)
    assert scheme == "int8", scheme
    H = pb._hist_rows_tiled(spec.filt_len)
    gp = pf._v3_periods_per_program(ptw.P)
    V = pf._v3_views(ptw.S, ptw.K, H, ptw.offsets) + (gp - 1)
    n_periods = bspec.n_blocks // ptw.P
    chunk_rows = (n_periods - pf._v3_back(ptw.S, H) + V) * ptw.S
    return dict(spec=spec, bspec=bspec, ptw=ptw, int8p=int8p,
                scales=tuple(float(s) for s in int8p[2]), H=H, gp=gp, V=V,
                n_periods=n_periods, chunk_rows=chunk_rows,
                offsets=tuple(int(o) for o in ptw.offsets))


def _make_variant(g, variant):
    """A pallas_call mirroring resample_conv_tm_pallas_v3's int8 branch
    with the per-block body swapped per ``variant``.  Returns
    conv(hist, x, w_tuple) -> y[n_blocks*R, B]."""
    ptw, H, gp, V = g["ptw"], g["H"], g["gp"], g["V"]
    S, K, P, R = ptw.S, ptw.K, ptw.P, ptw.R
    offs = g["offsets"]
    scales = g["scales"]
    n_blocks = g["bspec"].n_blocks
    n_periods = g["n_periods"]
    back = pf._v3_back(S, H)
    lb = _LANE
    n_lane_tiles = B // lb
    D = 3

    def kernel(w_ref, b_ref, h_ref, *rest):
        view_refs = rest[:V]
        o_ref = rest[V]
        scratch = rest[V + 1]
        extra = rest[V + 2:]
        j = pl.program_id(1)

        def assemble(dst_ref, parts, extra_views, srcs=None, cast=None):
            for src, s0, dst, ln in parts:
                if srcs is None:
                    ref = h_ref if src == "h" else view_refs[src + extra_views]
                else:
                    ref = srcs["h"] if src == "h" else srcs["v"][
                        src + extra_views]
                blk = ref[pl.ds(s0, ln), :]
                dst_ref[pl.ds(dst, ln), :] = (blk if cast is None
                                              else blk.astype(cast))

        if variant == "hoist":
            # extract every view (+hist) to hi/lo int8 planes once per
            # program; elementwise, so gather-then-extract is identical
            vh, vl = extra[0], extra[1]
            hh, hl = extra[2], extra[3]
            for v in range(V):
                u = view_refs[v][...].astype(jnp.int32)
                vh[v] = (u >> 8).astype(jnp.int8)
                vl[v] = ((u & 255) - 128).astype(jnp.int8)
            uh = h_ref[...].astype(jnp.int32)
            hh[...] = (uh >> 8).astype(jnp.int8)
            hl[...] = ((uh & 255) - 128).astype(jnp.int8)
            scr_h, scr_l = scratch, extra[4]

        for gi in range(gp):
            for m, off_m in enumerate(offs):
                gen = pf._v3_parts(off_m, S, K, H, "general")
                cases = [(jc, pf._v3_parts(off_m, S, K, H, jc))
                         for jc in range(back)]
                cases = [(jc, p_) for jc, p_ in cases if p_ != gen]

                def do_assemble(dst_ref, srcs=None, cast=None):
                    if not cases or gi >= back:
                        assemble(dst_ref, gen, gi, srcs, cast)
                        return
                    period = j * gp + gi
                    cond = period != cases[0][0]
                    for jc, _ in cases[1:]:
                        cond = jnp.logical_and(cond, period != jc)

                    @pl.when(cond)
                    def _():
                        assemble(dst_ref, gen, gi, srcs, cast)

                    for jc, plan in cases:
                        @pl.when(period == jc)
                        def _(plan=plan):
                            assemble(dst_ref, plan, gi, srcs, cast)

                first = (gi == 0 and m == 0)
                if variant == "hoist":
                    srcs_h = {"h": hh, "v": [vh.at[v] for v in range(V)]}
                    srcs_l = {"h": hl, "v": [vl.at[v] for v in range(V)]}
                    do_assemble(scr_h, srcs_h)
                    do_assemble(scr_l, srcs_l)
                    xh = scr_h[...]
                    xl = scr_l[...]
                elif variant == "no_assemble":
                    if first:
                        do_assemble(scratch)
                    u32 = scratch[...].astype(jnp.int32)
                    xh = (u32 >> 8).astype(jnp.int8)
                    xl = ((u32 & 255) - 128).astype(jnp.int8)
                elif variant == "dots_only":
                    if first:
                        do_assemble(scratch)
                        u32 = scratch[...].astype(jnp.int32)
                        extra[0][...] = (u32 >> 8).astype(jnp.int8)
                        extra[1][...] = ((u32 & 255) - 128).astype(jnp.int8)
                    xh = extra[0][...]
                    xl = extra[1][...]
                else:  # full / no_epilogue
                    do_assemble(scratch)
                    u32 = scratch[...].astype(jnp.int32)
                    xh = (u32 >> 8).astype(jnp.int8)
                    xl = ((u32 & 255) - 128).astype(jnp.int8)

                if variant in ("no_epilogue", "dots_only"):
                    acc = jnp.zeros((R, lb), jnp.int32)
                    for d in range(D):
                        acc += jnp.dot(w_ref[d, m], xh,
                                       preferred_element_type=jnp.int32)
                        acc += jnp.dot(w_ref[d, m], xl,
                                       preferred_element_type=jnp.int32)
                    o_ref[gi * P + m] = acc.astype(jnp.int16)
                else:
                    acc = jnp.zeros((R, lb), jnp.float32)
                    for d in range(D):
                        ah = jnp.dot(w_ref[d, m], xh,
                                     preferred_element_type=jnp.int32)
                        al = jnp.dot(w_ref[d, m], xl,
                                     preferred_element_type=jnp.int32)
                        acc += (256 * ah + al).astype(jnp.float32) * scales[d]
                    acc = acc + b_ref[m][:, None]
                    y = jnp.floor(0.5 + acc)
                    y = jnp.where(acc < -32767.5, -32768.0, y)
                    y = jnp.where(acc > 32766.5, 32767.0, y)
                    o_ref[gi * P + m] = y.astype(jnp.int16)

    n_chunk_blocks = g["chunk_rows"] // S

    def view_spec(v):
        return pl.BlockSpec(
            (S, lb),
            lambda i, j, v=v: (jnp.clip(j * gp - back + v, 0,
                                        n_chunk_blocks - 1), i),
            memory_space=pltpu.VMEM)

    scratch_shapes = [pltpu.VMEM((K, lb), jnp.int16)]
    if variant == "hoist":
        scratch_shapes = [pltpu.VMEM((K, lb), jnp.int8),
                          pltpu.VMEM((V, S, lb), jnp.int8),
                          pltpu.VMEM((V, S, lb), jnp.int8),
                          pltpu.VMEM((H, lb), jnp.int8),
                          pltpu.VMEM((H, lb), jnp.int8),
                          pltpu.VMEM((K, lb), jnp.int8)]
    elif variant == "dots_only":
        scratch_shapes += [pltpu.VMEM((K, lb), jnp.int8),
                           pltpu.VMEM((K, lb), jnp.int8)]

    @jax.jit
    def conv(hist, x, w):
        planes, bias = w
        wT = planes.transpose(0, 1, 3, 2)  # [D, P, R, K]
        y = pl.pallas_call(
            kernel,
            grid=(n_lane_tiles, n_periods // gp),
            in_specs=[
                pl.BlockSpec((D, P, R, K), lambda i, j: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, R), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, lb), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ] + [view_spec(v) for v in range(V)],
            out_specs=pl.BlockSpec((P * gp, R, lb), lambda i, j: (j, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks, R, B), jnp.int16),
            scratch_shapes=scratch_shapes,
        )(wT, bias, hist, *([x] * V))
        return y.reshape(n_blocks * R, B)

    return conv


def _measure(conv, hist0, x0, w, roof_ms):
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

    floor_s = roof_ms / 1.3 * 1e-3
    slopes, attempts = [], 0
    while len(slopes) < N_SLOPES and attempts < N_SLOPES + 3:
        attempts += 1
        s = one_slope(attempts)
        if s > floor_s:
            slopes.append(s)
    slopes.sort()
    if not slopes:
        return None
    mid = len(slopes) // 2
    med = (slopes[mid] if len(slopes) % 2
           else (slopes[mid - 1] + slopes[mid]) / 2)
    return {"ms_median": round(med * 1e3, 4),
            "ms_best": round(slopes[0] * 1e3, 4),
            "runs": [round(v * 1e3, 4) for v in slopes]}


def main():
    g = _geometry()
    ptw = g["ptw"]
    print(f"flagship tiled geometry: P={ptw.P} S={ptw.S} R={ptw.R} "
          f"K={ptw.K} H={g['H']} V={g['V']} gp={g['gp']} "
          f"n_blocks={g['bspec'].n_blocks} grid=({B // _LANE},"
          f"{g['n_periods'] // g['gp']})", flush=True)
    roof_ms = (2.0 * g["bspec"].n_blocks * ptw.R * ptw.K * B * 3
               / 197e12 * 1e3)
    print(f"model MXU floor {roof_ms:.4f} ms", flush=True)

    rng = np.random.default_rng(0)
    hist0 = jnp.zeros((g["H"], B), jnp.int16)
    x_np = np.zeros((g["chunk_rows"], B), np.int16)
    n_real = g["bspec"].in_per_launch
    x_np[:n_real] = (rng.integers(-32768, 32768, (n_real, B)) // 2
                     ).astype(np.int16)
    x0 = jnp.asarray(x_np)
    w = (jnp.asarray(g["int8p"][0]), jnp.asarray(g["int8p"][1]))

    path = os.path.join(os.path.dirname(__file__), os.pardir, "build",
                        "v3_anatomy.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)

    def _flush(out):
        with open(path, "w") as f:
            json.dump(out, f, indent=1)

    out = {"roof_ms": round(roof_ms, 4)}
    ref_y = None
    for variant in ("full", "hoist", "no_assemble", "no_epilogue",
                    "dots_only"):
        print(f"[{time.strftime('%H:%M:%S')}] compiling {variant}",
              flush=True)
        try:
            conv = _make_variant(g, variant)
            y = np.asarray(jax.device_get(conv(hist0, x0, w)))
            if variant == "full":
                ref_y = y
                prod = pb.make_batched_step(g["spec"], g["bspec"],
                                            use_pallas=True)
                xp = jnp.asarray(x_np[:prod.chunk_rows]
                                 if prod.chunk_rows <= g["chunk_rows"]
                                 else np.pad(x_np, ((0, prod.chunk_rows
                                                     - g["chunk_rows"]),
                                                    (0, 0))))
                _, yp = prod.fn(jnp.zeros((prod.hist_rows, B), jnp.int16),
                                xp, prod.w)
                match = bool(np.array_equal(
                    np.asarray(jax.device_get(yp)),
                    y[:np.asarray(yp).shape[0]]))
                out["full_matches_production"] = match
                print(f"full == production kernel output: {match}",
                      flush=True)
            elif variant == "hoist" and ref_y is not None:
                out["hoist_bit_identical"] = bool(np.array_equal(y, ref_y))
                print(f"hoist bit-identical to full: "
                      f"{out['hoist_bit_identical']}", flush=True)
            r = _measure(conv, hist0, x0, w, roof_ms)
            out[variant] = r
            if r:
                print(f"{variant:12s} {r['ms_median']:.4f} ms "
                      f"(best {r['ms_best']:.4f}, frac "
                      f"{roof_ms / r['ms_median']:.3f})", flush=True)
            else:
                print(f"{variant:12s} all slopes rejected (chip busy)",
                      flush=True)
        except Exception as e:
            out[variant] = {"error": str(e).splitlines()[0][:200]}
            print(f"{variant:12s} FAILED: {str(e).splitlines()[0][:160]}",
                  flush=True)
        _flush(out)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
