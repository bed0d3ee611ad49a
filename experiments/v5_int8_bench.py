"""v5 int8 digit-plane kernel: build, certify, validate, measure.

The 6-dot formulation (ops/int8_planes.py): per weight period m,
  y = sum_d scale_d * (256*<w_d, xh> + <w_d, xl8>) + bias[m]
with xh/xl8 the balanced base-256 digits of x+128, all dots int8xint8->i32
on the MXU.  Same launch geometry as the production v3 kernel (minus the
halo machinery — identical MXU work) so timing is directly comparable to
experiments/split5_bench.py.
"""
import functools, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.ops import phase as ph
from speex_resampler_tpu.ops import int8_planes
from speex_resampler_tpu.ops.pallas_fir import _word2int, split5_weights

B = 2048
LB = 128
N_PERIODS = 4
spec = fd.design_filter(147, 160, 7)
ptw = ph.build_phase_tiled_weights(spec.phase_table, 147, 160, 0)
P, K, R, S = ptw.P, ptw.K, ptw.R, ptw.S
n_blocks = N_PERIODS * P
OFFS = tuple(int(o) for o in ptw.offsets)
T = -(-((N_PERIODS - 1) * S + OFFS[-1] + K) // 16) * 16

pl8 = int8_planes.decompose(ptw.w, sw=23)
print(f"certificate: err_bound={pl8.err_bound:.4f} LSB  sw={pl8.sw}",
      flush=True)
assert pl8.err_bound <= 0.35, "certificate gate failed"
SCALES = tuple(float(s) for s in pl8.scales)

wT8 = jnp.asarray(pl8.planes.transpose(0, 1, 3, 2))      # [D, P, R, K] i8
bias = jnp.asarray(pl8.bias)                             # [P, R] f32
w_s5 = jnp.asarray(split5_weights(
    ptw.w.transpose(0, 2, 1)))                           # [3, P, R, K] bf16


def kern_int8(w_ref, b_ref, x_ref, o_ref):
    j = pl.program_id(1)
    base = j * S
    for m in range(P):
        u = x_ref[pl.ds(base + OFFS[m], K), :].astype(jnp.int32)
        xh = (u >> 8).astype(jnp.int8)            # floor(x/256) in [-128,127]
        xl = ((u & 255) - 128).astype(jnp.int8)   # x = 256*xh + xl + 128
        acc = jnp.zeros((R, u.shape[1]), jnp.float32)
        for d in range(3):
            ah = jnp.dot(w_ref[d, m], xh,
                         preferred_element_type=jnp.int32)
            al = jnp.dot(w_ref[d, m], xl,
                         preferred_element_type=jnp.int32)
            acc += (256 * ah + al).astype(jnp.float32) * SCALES[d]
        o_ref[m] = _word2int(acc + b_ref[m][:, None])


def kern_split5(w_ref, x_ref, o_ref):
    j = pl.program_id(1)
    base = j * S
    for m in range(P):
        xf = x_ref[pl.ds(base + OFFS[m], K), :].astype(jnp.float32)
        xh = xf.astype(jnp.bfloat16)
        xl = (xf - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        w_hi, w_mid, w_lo = w_ref[0, m], w_ref[1, m], w_ref[2, m]
        o_ref[m] = _word2int(d(w_hi, xh) + d(w_hi, xl) + d(w_mid, xh)
                             + d(w_mid, xl) + d(w_lo, xh))


@jax.jit
def conv_int8(x, w, b):
    return pl.pallas_call(
        kern_int8, grid=(B // LB, N_PERIODS),
        in_specs=[
            pl.BlockSpec((3, P, R, K), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, R), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LB), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, R, LB), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, R, B), jnp.int16),
    )(w, b, x)


@jax.jit
def conv_split5(x, w):
    return pl.pallas_call(
        kern_split5, grid=(B // LB, N_PERIODS),
        in_specs=[
            pl.BlockSpec((3, P, R, K), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LB), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, R, LB), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, R, B), jnp.int16),
    )(w, x)


rng = np.random.default_rng(0)
x_np = (rng.integers(-32768, 32768, size=(T, B)) // 2).astype(np.int16)
x = jnp.asarray(x_np)

# accuracy vs f64 gold, lane 0
y8 = np.asarray(jax.device_get(conv_int8(x, wT8, bias)))
y5 = np.asarray(jax.device_get(conv_split5(x, w_s5)))
t = np.arange(n_blocks * R, dtype=np.int64) * 147
starts = t // 160
taps = spec.phase_table[(t % 160)]
N = spec.filt_len
xi = x_np[:, 0].astype(np.float64)
gold = np.array([xi[starts[i]:starts[i] + N] @ taps[i].astype(np.float64)
                 for i in range(n_blocks * R)])
gi = np.clip(np.floor(0.5 + gold), -32768, 32767).astype(np.int32)
for name, y in (("int8x6", y8), ("split5", y5)):
    d = np.abs(y[:, :, 0].reshape(-1).astype(np.int32) - gi)
    print(f"{name}: max|d|={d.max()} tie rate={(d > 0).mean():.2e}",
          flush=True)

# timing: scan-slope over chained launches
def bench(name, fn, *args):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(x, salt, iters):
        def body(carry, _):
            xx, chk = carry
            xs = xx.at[0, :].add((chk + salt).astype(jnp.int16))
            y = fn(xs, *args)
            return (xx, chk + y[0, 0, 0].astype(jnp.int32)), None
        (_, chk), _ = lax.scan(body, (x, jnp.int32(0)), length=iters)
        return chk
    for it in (4, 24):
        jax.device_get(rep(x, jnp.int16(99), it))
    slopes = []
    for s in range(3):
        ts = {}
        for it in (4, 24):
            best = 9e9
            for i in range(4):
                t0 = time.perf_counter()
                jax.device_get(rep(x, jnp.int16(s * 7 + i), it))
                best = min(best, time.perf_counter() - t0)
            ts[it] = best
        slopes.append((ts[24] - ts[4]) / 20)
    slopes.sort()
    sl = slopes[1]
    print(f"{name}: {sl*1e3:.3f} ms/launch  "
          f"{n_blocks*R*B/sl/1e9:.1f} G out/s  "
          f"runs={[round(v*1e3, 3) for v in slopes]}", flush=True)

bench("int8x6", conv_int8, wT8, bias)
bench("split5", conv_split5, w_s5)

# interleaved A/B rounds to cancel tunnel/chip drift
print("interleaved:", flush=True)
for r in range(4):
    bench("int8x6", conv_int8, wT8, bias)
    bench("split5", conv_split5, w_s5)
