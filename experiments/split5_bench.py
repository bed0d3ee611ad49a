"""TPU timing: v3 kernel with HIGHEST vs split5 precision scheme."""
import functools, sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.ops import pallas_fir
from speex_resampler_tpu.parallel import batch as pb

B = 2048
spec = fd.design_filter(147, 160, 7)
bspec = pb._launch_geometry(spec, 9408, use_pallas=True)
ptw = pb._tiled_weights(spec)
H = pb._hist_rows_tiled(spec.filt_len)
n_in, n_out = bspec.in_per_launch, bspec.out_per_launch
n_periods = bspec.n_blocks // ptw.P
gp = pallas_fir._v3_periods_per_program(ptw.P)
V = pallas_fir._v3_views(ptw.S, ptw.K, H, ptw.offsets) + (gp - 1)
chunk_rows = (n_periods - pallas_fir._v3_back(ptw.S, H) + V) * ptw.S
offsets = tuple(int(o) for o in ptw.offsets)
print("P,K,R,S,n_blocks,chunk_rows =", ptw.P, ptw.K, ptw.R, ptw.S,
      bspec.n_blocks, chunk_rows, flush=True)

rng = np.random.default_rng(0)
x_np = np.zeros((chunk_rows, B), dtype=np.int16)
x_np[:n_in] = (rng.integers(-32768, 32768, size=(n_in, B)) // 2).astype(np.int16)
x = jnp.asarray(x_np)
hist0 = jnp.zeros((H, B), dtype=jnp.int16)

w_f32 = jnp.asarray(ptw.w)
w_s5 = jnp.asarray(pallas_fir.split5_weights(ptw.w))

ys = {}
for scheme, w in (("highest", w_f32), ("split5", w_s5)):
    conv = functools.partial(pallas_fir.resample_conv_tm_pallas_v3,
                             offsets=offsets, S=ptw.S,
                             n_blocks=bspec.n_blocks, scheme=scheme)

    @jax.jit
    def step(hist, x, w, conv=conv):
        y = conv(hist, x, w)[:n_out]
        return pb._next_hist(hist, x, n_in, H), y

    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(hist, x, w, salt, iters, step=step):
        def body(carry, _):
            h, chk = carry
            hs = h.at[0, :].add((chk + salt).astype(jnp.int16))
            h2, y = step(hs, x, w)
            return (h2, chk + y[0, 0].astype(jnp.int32)), None
        (h, chk), _ = lax.scan(body, (hist, jnp.int32(0)), length=iters)
        return chk

    h2, y = step(hist0, x, w)
    ys[scheme] = np.asarray(jax.device_get(y))
    for it in (4, 24):
        jax.device_get(rep(hist0, x, w, jnp.int16(99), it))
    slopes = []
    for s in range(3):
        ts = {}
        for it in (4, 24):
            best = 9e9
            for i in range(4):
                t0 = time.perf_counter()
                jax.device_get(rep(hist0, x, w, jnp.int16(s * 7 + i), it))
                best = min(best, time.perf_counter() - t0)
            ts[it] = best
        slopes.append((ts[24] - ts[4]) / 20)
    slopes.sort()
    sl = slopes[1]
    print(f"{scheme:8s}: {sl*1e3:.3f} ms/launch  "
          f"{n_out*B/sl/1e9:.1f} G out/s  runs={[round(v*1e3,3) for v in slopes]}",
          flush=True)

d = np.abs(ys["highest"].astype(np.int32) - ys["split5"].astype(np.int32))
print("split5 vs highest: max LSB diff", d.max(), "rate", (d > 0).mean())
