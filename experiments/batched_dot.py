"""On-chip experiment: per-period batched dot vs the m-loop of v3.

Variant A (production v3): 20 sequential [128,K]x[K,lb] dots interleaved
with patch assembly.
Variant B: assemble all P patches into one [P,K,lb] scratch, then a single
batched dot_general [P,128,K]x[P,K,lb].

Usage: python experiments/batched_dot.py [lane_tile]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.ops import phase as ph
from speex_resampler_tpu.ops.pallas_fir import (_v3_back, _v3_parts,
                                                _v3_views, _word2int)

LB = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = 2048
N_PERIODS = 4

spec = fd.design_filter(147, 160, 7)
H = 128
ptw = ph.build_phase_tiled_weights(spec.phase_table, 147, 160, 0,
                                   origin_shift=H - (spec.filt_len - 1))
P, K, R, S = ptw.P, ptw.K, ptw.R, ptw.S
OFFS = tuple(int(o) for o in ptw.offsets)
back = _v3_back(S, H)
V = _v3_views(S, K, H, ptw.offsets)
n_blocks = N_PERIODS * P
n_in = N_PERIODS * S
T_c = (N_PERIODS - back + V) * S
n_chunk_blocks = T_c // S


def make(batched):
    def kern(w_ref, h_ref, *rest):
        view_refs = rest[:V]
        o_ref = rest[V]
        scratch = rest[V + 1]
        j = pl.program_id(1)

        def assemble(m, plan):
            for src, s0, dst, ln in plan:
                ref = h_ref if src == "h" else view_refs[src]
                if batched:
                    scratch[m, pl.ds(dst, ln), :] = \
                        ref[pl.ds(s0, ln), :].astype(jnp.float32)
                else:
                    scratch[pl.ds(dst, ln), :] = \
                        ref[pl.ds(s0, ln), :].astype(jnp.float32)

        for m, off_m in enumerate(OFFS):
            gen = _v3_parts(off_m, S, K, H, "general")
            cases = [(jc, _v3_parts(off_m, S, K, H, jc))
                     for jc in range(back)]
            cases = [(jc, pl_) for jc, pl_ in cases if pl_ != gen]
            if not cases:
                assemble(m, gen)
            else:
                @pl.when(j >= back)
                def _():
                    assemble(m, gen)
                for jc, plan in cases:
                    @pl.when(j == jc)
                    def _(plan=plan, m=m):
                        assemble(m, plan)
            if not batched:
                o_ref[m] = _word2int(jnp.dot(
                    w_ref[m], scratch[...],
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32))
        if batched:
            acc = jax.lax.dot_general(
                w_ref[...], scratch[...],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            o_ref[...] = _word2int(acc)

    scratch_shape = (pltpu.VMEM((P, K, LB), jnp.float32) if batched
                     else pltpu.VMEM((K, LB), jnp.float32))

    def view_spec(v):
        return pl.BlockSpec(
            (S, LB),
            lambda i, j, v=v: (jnp.clip(j - back + v, 0,
                                        n_chunk_blocks - 1), i),
            memory_space=pltpu.VMEM)

    @jax.jit
    def conv(hist, x, wT):
        return pl.pallas_call(
            kern,
            grid=(B // LB, N_PERIODS),
            in_specs=[pl.BlockSpec((P, R, K), lambda i, j: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((H, LB), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM)]
            + [view_spec(v) for v in range(V)],
            out_specs=pl.BlockSpec((P, R, LB), lambda i, j: (j, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks, R, B), jnp.int16),
            scratch_shapes=[scratch_shape],
        )(wT, hist, *([x] * V))
    return conv


wT = jnp.asarray(ptw.w.transpose(0, 2, 1).astype(np.float32))
rng = np.random.default_rng(0)
x_np = np.zeros((T_c, B), dtype=np.int16)
x_np[:n_in] = (rng.integers(-32768, 32768, size=(n_in, B)) // 2
               ).astype(np.int16)
x = jnp.asarray(x_np)
hist0 = jnp.zeros((H, B), dtype=jnp.int16)

ref = None
for name, batched in [("m-loop", False), ("batched", True)]:
    conv = make(batched)
    y = np.asarray(jax.device_get(conv(hist0, x, wT)))
    if ref is None:
        ref = y
    else:
        d = np.abs(y.astype(np.int32) - ref.astype(np.int32))
        print(f"{name} vs m-loop: max|d|={d.max()}", flush=True)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(hist, x, wT, salt, iters, conv=conv):
        def body(carry, _):
            h, chk = carry
            hs = h.at[0, :].add((chk + salt).astype(jnp.int16))
            yy = conv(hs, x, wT)
            h2 = lax.dynamic_slice_in_dim(x, n_in - H, H, axis=0)
            return (h2, chk + yy[0, 0, 0].astype(jnp.int32)), None
        (h, chk), _ = lax.scan(body, (hist, jnp.int32(0)), length=iters)
        return chk

    for it in (4, 24):
        jax.device_get(rep(hist0, x, wT, jnp.int16(99), it))
    ts = {}
    for it in (4, 24):
        best = 9e9
        for i in range(4):
            t0 = time.perf_counter()
            jax.device_get(rep(hist0, x, wT, jnp.int16(i), it))
            best = min(best, time.perf_counter() - t0)
        ts[it] = best
    sl = (ts[24] - ts[4]) / 20
    print(f"{name} lb={LB}: {sl*1e3:.3f}ms/launch "
          f"{n_blocks*R*B/sl/1e9:.1f} Gsample/s", flush=True)
