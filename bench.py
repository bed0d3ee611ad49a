"""Headline benchmark: batched Q7 44.1 kHz -> 48 kHz stereo serving.

BASELINE.json target: >= 1 Gsamples/sec/chip at quality 7 on batched
44.1k->48k stereo (1024 concurrent streams), <= 1 LSB vs the reference —
the LSB bound is enforced by tests/test_golden.py and tests/test_batch.py;
this script measures throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value = output samples/sec of the steady-state device step and vs_baseline
= value / 1e9 (the BASELINE north-star).

Methodology: ITERS chained launches run inside one lax.scan dispatch (a
y-derived checksum in the carry keeps every launch live), timed at two scan
lengths; the slope removes dispatch/tunnel round-trip latency, and
jax.device_get of the checksum forces a real value round-trip (plain
block_until_ready has been observed returning early through the tunnel).
Host-transfer-inclusive end-to-end throughput is reported as an extra key:
in production the host is co-located with the chip; in this harness the
device sits behind a network tunnel, so e2e is tunnel-bound, not chip-bound.
"""

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.parallel.batch import (_launch_geometry,
                                                make_batched_step,
                                                BatchedResampler)

N_STREAMS = 1024
CHANNELS = 2
IN_RATE, OUT_RATE, QUALITY = 44100, 48000, 7
TARGET_IN_FRAMES = 9408
ITERS_SHORT, ITERS_LONG = 4, 24
REPS = 4


def main():
    backend = jax.default_backend()
    B = N_STREAMS * CHANNELS
    use_pallas = backend == "tpu"

    spec = fd.design_filter(147, 160, QUALITY)
    bspec = _launch_geometry(spec, TARGET_IN_FRAMES, use_pallas=use_pallas)
    bstep = make_batched_step(spec, bspec, use_pallas=use_pallas)
    step, w = bstep.fn, bstep.w
    n_real = bspec.in_per_launch

    rng = np.random.default_rng(0)
    x_np = np.zeros((bstep.chunk_rows, B), dtype=np.int16)
    x_np[:n_real] = (rng.integers(-32768, 32768, size=(n_real, B))
                     // 2).astype(np.int16)
    x = jnp.asarray(x_np)
    hist0 = jnp.zeros((bstep.hist_rows, B), dtype=jnp.int16)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def rep(hist, x, w, salt, iters):
        # Each step must be genuinely iteration-dependent or XLA's
        # loop-invariant code motion elides it (hist2 is a slice of the
        # constant x, so the carried history alone is NOT enough).  Salting
        # the small history with the accumulating checksum creates a true
        # cross-iteration dependence at ~0.5 MB copy cost.
        def body(carry, _):
            h, chk = carry
            hs = h.at[0, :].add((chk + salt).astype(jnp.int16))
            h2, y = step(hs, x, w)
            return (h2, chk + y[0, 0].astype(jnp.int32)), None
        (h, chk), _ = lax.scan(body, (hist, jnp.int32(0)), length=iters)
        return chk

    for it in (ITERS_SHORT, ITERS_LONG):
        jax.device_get(rep(hist0, x, w, jnp.int16(99), it))  # compile+warm

    def one_slope(seed):
        ts = {}
        for it in (ITERS_SHORT, ITERS_LONG):
            best = float("inf")
            for i in range(REPS):
                t0 = time.perf_counter()
                jax.device_get(rep(hist0, x, w, jnp.int16(seed + i), it))
                best = min(best, time.perf_counter() - t0)
            ts[it] = best
        return (ts[ITERS_LONG] - ts[ITERS_SHORT]) / (ITERS_LONG
                                                     - ITERS_SHORT)

    # chip/tunnel load varies between sessions; take the median of several
    # independent slope measurements
    slopes = sorted(one_slope(s) for s in range(3))
    per_launch = slopes[len(slopes) // 2]
    device_sps = bspec.out_per_launch * B / per_launch

    # end-to-end through the public engine (host staging + transfers)
    eng = BatchedResampler(N_STREAMS, CHANNELS, IN_RATE, OUT_RATE, QUALITY,
                           target_chunk_frames=bspec.in_per_launch)
    chunk_np = x_np[:n_real]
    eng.process(chunk_np)  # warmup/compile
    t0 = time.perf_counter()
    e2e_iters = 5
    produced = 0
    for _ in range(e2e_iters):
        out = eng.process(chunk_np)
        produced += out.size
    e2e_sps = produced / (time.perf_counter() - t0)

    result = {
        "metric": "output samples/sec, batched q7 44.1k->48k stereo "
                  f"({N_STREAMS} streams, device-resident steady state)",
        "value": round(device_sps),
        "unit": "samples/sec",
        "vs_baseline": round(device_sps / 1e9, 3),
        "extra": {
            "backend": backend,
            "device_kind": jax.devices()[0].device_kind,
            "kernel": bspec.kernel,
            "launch_ms": round(per_launch * 1e3, 4),
            "launch_ms_runs": [round(v * 1e3, 4) for v in slopes],
            "input_samples_per_sec": round(bspec.in_per_launch * B
                                           / per_launch),
            "e2e_samples_per_sec_via_tunnel": round(e2e_sps),
            "streams": N_STREAMS, "channels": CHANNELS,
            "in_frames_per_launch": bspec.in_per_launch,
            "out_frames_per_launch": bspec.out_per_launch,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
