"""Staging-cost micro-benchmark: many small pushes vs one bulk push.

Round-3 review: ``BatchedResampler.process`` staged input via
``np.concatenate([self._staged, x])`` per call — O(n^2) for the
Transform-style cadence of many small pushes.  The _HostFifo replacement
(parallel/batch.py) must make 10k x 64-frame pushes cost within ~2x of one
bulk push (the reference's staging through the wasm heap is O(1) per chunk,
src/index.ts:71-92).

Run: python experiments/staging_fifo_bench.py
"""

import time

import numpy as np

from speex_resampler_tpu.parallel.batch import _HostFifo

B = 2048            # 1024 stereo streams
PUSH = 64           # frames per small push
N_PUSHES = 10_000
Q = 9408            # launch quantum (flagship geometry)


def run_fifo(pushes):
    f = _HostFifo(B)
    slab = np.empty((Q, B), dtype=np.int16)
    t0 = time.perf_counter()
    for x in pushes:
        f.push(x)
        while len(f) >= Q:
            f.pop_into(slab, Q)
    # drain the remainder like flush would
    if len(f):
        f.pop_all()
    return time.perf_counter() - t0


def run_concat(pushes):
    """The round-3 implementation, for the before/after ratio."""
    staged = np.zeros((0, B), dtype=np.int16)
    t0 = time.perf_counter()
    for x in pushes:
        staged = np.concatenate([staged, x], axis=0)
        while staged.shape[0] >= Q:
            staged = staged[Q:]
    return time.perf_counter() - t0


def main():
    rng = np.random.default_rng(0)
    small = [rng.integers(-1000, 1000, size=(PUSH, B)).astype(np.int16)
             for _ in range(64)]
    pushes_small = [small[i % 64] for i in range(N_PUSHES)]
    total = PUSH * N_PUSHES
    bulk = rng.integers(-1000, 1000, size=(total, B)).astype(np.int16)

    t_small = min(run_fifo(pushes_small) for _ in range(3))
    t_bulk = min(run_fifo([bulk]) for _ in range(3))
    # the old path is so slow at this size that one rep suffices — scale
    # it down 10x and extrapolate linearly (it is superlinear, so this
    # UNDERSTATES the old cost)
    t_old = run_concat(pushes_small[:N_PUSHES // 10]) * 10

    print(f"fifo  {N_PUSHES}x{PUSH}-frame pushes: {t_small*1e3:8.1f} ms "
          f"({total * B / t_small / 1e9:.2f} Gsamples/s)")
    print(f"fifo  one {total}-frame bulk push:   {t_bulk*1e3:8.1f} ms")
    print(f"old concat staging (extrapolated):   {t_old*1e3:8.1f} ms")
    ratio = t_small / t_bulk
    print(f"small/bulk ratio: {ratio:.2f}x (target <= ~2x)")
    assert ratio < 2.5, ratio


if __name__ == "__main__":
    main()
