"""Micro-bench: native stager gather/scatter throughput vs thread count.

Measures srt_fill_launch (per-stream FIFO -> time-major slab transpose)
and srt_unpack_all (slab -> per-stream PCM) in int16 samples/sec.
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
y = rng.integers(-32768, 32768, size=(10240, S * C)).astype(np.int16)

for n_threads in (1, 2, 4):
    eff = st.set_threads(n_threads)
    # gather
    best = 9e9
    for rep in range(3):
        for s in range(S):
            st.push(s, frames[s])
        t0 = time.perf_counter()
        for _ in range(K):
            st.fill_launch(out=slab)
        best = min(best, (time.perf_counter() - t0) / K)
    g_sps = N_IN * S * C / best
    # scatter
    bests = 9e9
    for rep in range(3):
        t0 = time.perf_counter()
        for _ in range(K):
            st.unpack_all(y)
        bests = min(bests, (time.perf_counter() - t0) / K)
    s_sps = y.size / bests
    print(f"threads={n_threads} (eff {eff}): gather {g_sps/1e9:.2f} G/s  "
          f"scatter {s_sps/1e9:.2f} G/s", flush=True)
