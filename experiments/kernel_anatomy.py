"""Where does the launch time go?  Strip the v2 kernel to components.

Variants (same grid/VMEM layout):
  full    : slice -> convert -> dot -> word2int -> store   (production)
  nodot   : slice -> convert -> reduce-sum epilogue        (no MXU)
  noslice : fixed patch (rows 0..K) -> convert -> dot      (no dynamic ds)
  nocvt   : slice f32 input -> dot                         (x pre-widened)
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

B = 2048
N_PERIODS = 4
LB = 256

spec = fd.design_filter(147, 160, 7)
ptw = ph.build_phase_tiled_weights(spec.phase_table, 147, 160, 0)
P, K, R, S = ptw.P, ptw.K, ptw.R, ptw.S
n_blocks = N_PERIODS * P
OFFS = tuple(int(o) for o in ptw.offsets)
T = -(-((N_PERIODS - 1) * S + OFFS[-1] + K) // 16) * 16


def _w2i(v):
    y = jnp.floor(0.5 + v)
    y = jnp.where(v < -32767.5, -32768.0, y)
    y = jnp.where(v > 32766.5, 32767.0, y)
    return y.astype(jnp.int16)


def make(variant, xdtype=jnp.int16):
    def kern(w_ref, x_ref, o_ref):
        j = pl.program_id(1)
        base = j * S
        for m, off_m in enumerate(OFFS):
            if variant == "noslice":
                patch = x_ref[pl.ds(0, K), :].astype(jnp.float32)
            else:
                patch = x_ref[pl.ds(base + off_m, K), :].astype(jnp.float32)
            if variant == "nodot":
                acc = jnp.broadcast_to(
                    jnp.sum(patch, axis=0, keepdims=True), (R, patch.shape[1]))
            else:
                acc = jnp.dot(w_ref[m], patch,
                              precision=lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
            o_ref[m] = _w2i(acc)

    @jax.jit
    def conv(x, wT):
        return pl.pallas_call(
            kern,
            grid=(B // LB, N_PERIODS),
            in_specs=[
                pl.BlockSpec((P, R, K), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, LB), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((P, R, LB), lambda i, j: (j, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks, R, B), jnp.int16),
        )(wT, x)
    return conv


wT = jnp.asarray(ptw.w.transpose(0, 2, 1).astype(np.float32))
rng = np.random.default_rng(0)
x16 = jnp.asarray((rng.integers(-32768, 32768, size=(T, B)) // 2
                   ).astype(np.int16))
x32 = x16.astype(jnp.float32)

for variant, x in [("full", x16), ("nodot", x16), ("noslice", x16),
                   ("nocvt", x32)]:
    conv = make(variant, x.dtype)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(x, wT, salt, iters, conv=conv):
        def body(chk, _):
            yy = conv(x + salt.astype(x.dtype), wT)
            return chk + yy[0, 0, 0].astype(jnp.int32), None
        chk, _ = lax.scan(body, jnp.int32(0), length=iters)
        return chk

    try:
        for it in (4, 24):
            jax.device_get(rep(x, wT, jnp.int16(99), it))
        ts = {}
        for it in (4, 24):
            best = 9e9
            for i in range(4):
                t0 = time.perf_counter()
                jax.device_get(rep(x, wT, jnp.int16(i), it))
                best = min(best, time.perf_counter() - t0)
            ts[it] = best
        sl = (ts[24] - ts[4]) / 20
        print(f"{variant:8s}: {sl*1e3:.3f}ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{variant:8s}: FAILED {type(e).__name__}: {e}", flush=True)
