"""Micro-bench: native stager gather/scatter throughput vs thread count.

Measures both slab layouts in int16 samples/sec:
- time-major (kernel-native): srt_fill_launch (per-stream FIFO -> slab
  transpose) and srt_unpack_all (slab -> per-stream PCM)
- lane-major (FleetResampler production path; transpose rides the
  device): srt_fill_launch_lm (contiguous deinterleave) and
  srt_unpack_all_lm (contiguous zip)
"""
import time
import numpy as np
from speex_resampler_tpu.runtime.native import NativeStager

S, C, N_IN = 1024, 2, 9408
K = 8  # launches per measurement

st = NativeStager(S, C, N_IN)
rng = np.random.default_rng(0)
frames = rng.integers(-32768, 32768, size=(S, K * N_IN, C)).astype(np.int16)
slab = np.empty((N_IN, S * C), dtype=np.int16)
slab_lm = np.zeros((S * C, N_IN), dtype=np.int16)
y = rng.integers(-32768, 32768, size=(10240, S * C)).astype(np.int16)
y_lm = np.ascontiguousarray(y.T)
dst = np.empty((S, 10240, C), dtype=np.int16)


def _best(fn, reps=3, k=K):
    best = 9e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            fn()
        best = min(best, (time.perf_counter() - t0) / k)
    return best


for n_threads in (1, 2, 4):
    eff = st.set_threads(n_threads)
    res = {}
    for name, fill in (("tm", lambda: st.fill_launch(out=slab)),
                       ("lm", lambda: st.fill_launch_lm(slab_lm))):
        best = 9e9
        for rep in range(3):
            for s in range(S):
                st.push(s, frames[s])
            t0 = time.perf_counter()
            for _ in range(K):
                fill()
            best = min(best, (time.perf_counter() - t0) / K)
        res[f"gather_{name}"] = N_IN * S * C / best
    res["scatter_tm"] = y.size / _best(lambda: st.unpack_all(y))
    res["scatter_lm"] = y.size / _best(lambda: st.unpack_all_lm(y_lm,
                                                                out=dst))
    print(f"threads={n_threads} (eff {eff}): "
          + "  ".join(f"{k} {v/1e9:.2f} G/s" for k, v in res.items()),
          flush=True)
