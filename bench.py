"""Headline benchmark: batched Q7 44.1 kHz -> 48 kHz stereo serving.

BASELINE.json target: >= 1 Gsamples/sec/chip at quality 7 on batched
44.1k->48k stereo (1024 concurrent streams), <= 1 LSB vs the reference —
the LSB bound is enforced by tests/test_golden.py and tests/test_batch.py;
this script measures throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value = output samples/sec of the steady-state device step (chained launches
with history carried on device, exactly the serving hot loop) and
vs_baseline = value / 1e9 (the BASELINE north-star).  Host-transfer-inclusive
end-to-end throughput is also measured and reported as an extra key: in
production the host is co-located with the chip; in this harness the device
sits behind a network tunnel, so e2e is tunnel-bound, not chip-bound.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.parallel.batch import (BatchSpec, make_batched_step,
                                                BatchedResampler)

N_STREAMS = 1024
CHANNELS = 2
IN_RATE, OUT_RATE, QUALITY = 44100, 48000, 7
N_BLOCKS = 64          # 9408 input / 10240 output frames per lane per launch
WARMUP = 3
ITERS = 30


def main():
    backend = jax.default_backend()
    B = N_STREAMS * CHANNELS

    spec = fd.design_filter(147, 160, QUALITY)
    bspec = BatchSpec(num=147, den=160, quality=QUALITY,
                      filt_len=spec.filt_len, group=1, n_blocks=N_BLOCKS,
                      f0=0)
    step, w = make_batched_step(spec, bspec)

    rng = np.random.default_rng(0)
    x_np = (rng.integers(-32768, 32768, size=(bspec.in_per_launch, B))
            // 2).astype(np.int16)
    x = jnp.asarray(x_np)
    hist = jnp.zeros((spec.filt_len - 1, B), dtype=jnp.int16)

    # Device-resident steady state (the serving hot loop): ITERS chained
    # launches inside ONE lax.scan dispatch, so the measurement is pure
    # device time — per-dispatch/tunnel latency can't inflate the rate.
    # The y-derived checksum in the carry keeps every launch live.
    @jax.jit
    def run(hist, x, w):
        def body(carry, _):
            h, chk = carry
            h, y = step(h, x, w)  # jit-of-jit inlines; donation is outer
            return (h, chk + y[0, 0].astype(jnp.int32)), None
        (h, chk), _ = jax.lax.scan(body, (hist, jnp.int32(0)),
                                   length=ITERS)
        return h, chk

    h, chk = run(hist, x, w)   # compile + warmup
    chk.block_until_ready()
    times = []
    for _ in range(WARMUP):
        t0 = time.perf_counter()
        h, chk = run(hist, x, w)
        chk.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    out_samples = ITERS * bspec.out_per_launch * B
    in_samples = ITERS * bspec.in_per_launch * B
    device_sps = out_samples / dt

    # end-to-end through the public engine (host staging + transfers)
    eng = BatchedResampler(N_STREAMS, CHANNELS, IN_RATE, OUT_RATE, QUALITY,
                           target_chunk_frames=bspec.in_per_launch)
    lanes = x_np  # time-major [n, B] fast path
    eng.process(lanes)  # warmup/compile
    t0 = time.perf_counter()
    e2e_iters = 5
    produced = 0
    for _ in range(e2e_iters):
        out = eng.process(lanes)
        produced += out.size
    e2e_dt = time.perf_counter() - t0
    e2e_sps = produced / e2e_dt

    result = {
        "metric": "output samples/sec, batched q7 44.1k->48k stereo "
                  f"({N_STREAMS} streams, device-resident steady state)",
        "value": round(device_sps),
        "unit": "samples/sec",
        "vs_baseline": round(device_sps / 1e9, 3),
        "extra": {
            "backend": backend,
            "device_kind": jax.devices()[0].device_kind,
            "input_samples_per_sec": round(in_samples / dt),
            "launch_ms": round(dt / ITERS * 1e3, 3),
            "e2e_samples_per_sec_via_tunnel": round(e2e_sps),
            "streams": N_STREAMS, "channels": CHANNELS,
            "in_frames_per_launch": bspec.in_per_launch,
            "out_frames_per_launch": bspec.out_per_launch,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
