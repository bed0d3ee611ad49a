"""TPU timing: v4 streamed kernel HIGHEST vs split5 (48k->44.1k Q10)."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.parallel import batch as pb

B = 2048
spec = fd.design_filter(160, 147, 10)
bspec = pb._launch_geometry(spec, 9408, use_pallas=True)
assert bspec.kernel == "streamed", bspec
for scheme in ("highest", "split5", "int8", "split5", "int8"):
    bstep = pb.make_batched_step(spec, bspec, use_pallas=True, scheme=scheme)
    rng = np.random.default_rng(0)
    x_np = np.zeros((bstep.chunk_rows, B), dtype=np.int16)
    n_in = bspec.in_per_launch
    x_np[:n_in] = (rng.integers(-32768, 32768, size=(n_in, B)) // 2).astype(np.int16)
    x = jnp.asarray(x_np)
    hist0 = jnp.zeros((bstep.hist_rows, B), dtype=jnp.int16)
    step, w = bstep.fn, bstep.w

    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(hist, x, w, salt, iters, step=step):
        def body(carry, _):
            h, chk = carry
            hs = h.at[0, :].add((chk + salt).astype(jnp.int16))
            h2, y = step(hs, x, w)
            return (h2, chk + y[0, 0].astype(jnp.int32)), None
        (h, chk), _ = lax.scan(body, (hist, jnp.int32(0)), length=iters)
        return chk

    for it in (4, 24):
        jax.device_get(rep(hist0, x, w, jnp.int16(99), it))
    slopes = []
    for s in range(3):
        ts = {}
        for it in (4, 24):
            best = 9e9
            for i in range(4):
                t0 = time.perf_counter()
                jax.device_get(rep(hist0, x, w, jnp.int16(s*7+i), it))
                best = min(best, time.perf_counter() - t0)
            ts[it] = best
        slopes.append((ts[24]-ts[4])/20)
    slopes.sort()
    sl = slopes[1]
    print(f"v4 {scheme:8s}: {sl*1e3:.3f} ms/launch  "
          f"{bspec.out_per_launch*B/sl/1e9:.1f} G out/s  "
          f"runs={[round(v*1e3,3) for v in slopes]}", flush=True)
