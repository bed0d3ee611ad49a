"""On-chip experiment: v3 = one program per weight period (static offsets).

Compares against the production v2 path at equal launch geometry.
Usage: python experiments/v3_bench.py [lane_tile]
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

LB = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B = 2048
N_PERIODS = 4

spec = fd.design_filter(147, 160, 7)
ptw = ph.build_phase_tiled_weights(spec.phase_table, 147, 160, 0)
P, K, R, S = ptw.P, ptw.K, ptw.R, ptw.S
n_blocks = N_PERIODS * P
n_in = N_PERIODS * S
N = spec.filt_len
T_req = (N_PERIODS - 1) * S + int(ptw.offsets[-1]) + K
T = max(N - 1 + n_in, T_req)
T = -(-T // 16) * 16

OFFS = tuple(int(o) for o in ptw.offsets)


def _w2i(v):
    y = jnp.floor(0.5 + v)
    y = jnp.where(v < -32767.5, -32768.0, y)
    y = jnp.where(v > 32766.5, 32767.0, y)
    return y.astype(jnp.int16)


def kern(w_ref, x_ref, o_ref):
    j = pl.program_id(1)
    base = j * S
    for m in range(P):
        off = base + OFFS[m]
        patch = x_ref[pl.ds(off, K), :].astype(jnp.float32)
        o_ref[m] = _w2i(jnp.dot(w_ref[m], patch,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32))


@jax.jit
def conv_v3(x, wT):
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


wT = jnp.asarray(ptw.w.transpose(0, 2, 1).astype(np.float32))
rng = np.random.default_rng(0)
x_np = (rng.integers(-32768, 32768, size=(T, B)) // 2).astype(np.int16)
x = jnp.asarray(x_np)

# accuracy vs f64 gold on first period
y = np.asarray(jax.device_get(conv_v3(x, wT)))
t = np.arange(n_blocks * R, dtype=np.int64) * 147
starts = t // 160
taps = spec.phase_table[(t % 160)]
gold = np.empty((n_blocks * R,), dtype=np.float64)
xi = x_np[:, 0].astype(np.float64)
for i in range(n_blocks * R):
    gold[i] = xi[starts[i]:starts[i] + N] @ taps[i].astype(np.float64)
gi = np.clip(np.floor(0.5 + gold), -32768, 32767).astype(np.int32)
d = np.abs(y[:, :, 0].reshape(-1).astype(np.int32) - gi)
print(f"v3 lane0 max|d|={d.max()} rate={(d > 0).mean():.2e}", flush=True)


# production-shaped step: concat(hist, chunk, pad) -> conv -> new hist.
# Timed exactly like v2_bench (salt add inside the body) so the numbers are
# directly comparable.
pad_rows = T - (N - 1 + n_in)


@jax.jit
def step(hist, chunk, wT):
    X = jnp.concatenate(
        [hist, chunk, jnp.zeros((pad_rows, chunk.shape[1]), jnp.int16)],
        axis=0)
    y = conv_v3(X, wT)
    return lax.dynamic_slice_in_dim(X, n_in, N - 1, axis=0), y


@functools.partial(jax.jit, static_argnames=("iters",))
def rep(hist, chunk, wT, salt, iters):
    def body(carry, _):
        h, chk = carry
        h, yy = step(h, chunk + salt, wT)
        return (h, chk + yy[0, 0, 0].astype(jnp.int32)), None
    (h, chk), _ = lax.scan(body, (hist, jnp.int32(0)), length=iters)
    return chk


hist0 = jnp.zeros((N - 1, B), dtype=jnp.int16)
chunk = x[:n_in]
for it in (4, 24):
    jax.device_get(rep(hist0, chunk, wT, jnp.int16(99), it))
ts = {}
for it in (4, 24):
    best = 9e9
    for i in range(4):
        t0 = time.perf_counter()
        jax.device_get(rep(hist0, chunk, wT, jnp.int16(i), it))
        best = min(best, time.perf_counter() - t0)
    ts[it] = best
sl = (ts[24] - ts[4]) / 20
print(f"v3 lb={LB}: {sl*1e3:.3f}ms/launch  "
      f"{n_blocks*R*B/sl/1e9:.1f} Gsample/s out", flush=True)
