"""Headline benchmark: batched Q7 44.1 kHz -> 48 kHz stereo serving.

BASELINE.json target: >= 1 Gsamples/sec/chip at quality 7 on batched
44.1k->48k stereo (1024 concurrent streams), <= 1 LSB vs the reference —
the LSB bound is enforced by tests/test_golden.py and tests/test_batch.py;
this script measures throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value = output samples/sec of the steady-state device step and vs_baseline
= value / 1e9 (the BASELINE north-star).  extra carries:
  - vs_reference_cpu: value / the *measured* throughput of the reference C
    core compiled -O3 on this host (SURVEY.md §6: the reference publishes
    no numbers, so the compiled oracle is the CPU baseline)
  - sweep: per-kernel-family configs (short-cycle tiled, streamed-weight
    v4, downsample) so regressions outside the flagship are visible

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
import math
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Persistent compilation cache: the shard_map check alone costs ~10 min of
# fresh compiles through the tunnel; cached reruns skip nearly all of it.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     str(Path(__file__).parent / "build"
                                         / "jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.parallel.batch import (_launch_geometry,
                                                make_batched_step,
                                                BatchedResampler)

N_STREAMS = 1024
CHANNELS = 2
FLAGSHIP = (44100, 48000, 7)
TARGET_IN_FRAMES = 9408
ITERS_SHORT, ITERS_LONG = 4, 24
REPS = 4
SWEEP = [
    # (in_rate, out_rate, quality)   kernel family exercised
    (24000, 48000, 5),   # tiled, short cycle (P=1, batched periods)
    (48000, 44100, 10),  # streamed-weight v4 (P=147), double-acc quality
    (44100, 24000, 5),   # downsample (longer filter, scaled cutoff)
]

REPO = Path(__file__).resolve().parent

# Wall-clock budget: the driver records bench.py's single stdout JSON line,
# so overruning its timeout loses EVERYTHING.  Optional sections check the
# remaining budget and record a skip marker instead of risking the run.
_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1000"))


def _time_left() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


# Hard watchdog: the in-line budget checks can only run between sections —
# a wedged device tunnel blocks the main thread INSIDE a native PJRT call
# (observed: backend init hanging >15 min with the relay down), where
# neither the checks nor signal handlers ever run.  A daemon thread that
# emits a JSON line and _exits guarantees the driver records SOMETHING no
# matter where the main thread is stuck — and it emits the partial result
# (every section measured so far) rather than discarding completed work.
# Armed only under __main__ so `import bench` never plants a process
# killer in the importing host.
_DONE = threading.Event()
_EMIT_LOCK = threading.Lock()
_EMIT_FIRED = False
# main() builds its result here progressively; the watchdog snapshots it
_PARTIAL: dict = {}


def _compact_summary(payload: dict) -> dict:
    """The driver records only the LAST ~2000 chars of stdout, and the full
    artifact outgrew that in round 3 (BENCH_r03/r04 ``parsed: null`` — the
    canonical record lost its headline for two rounds).  Emit a <=1500-char
    summary carrying every headline number; the full blob goes to
    BENCH_FULL_LOCAL.json (committed alongside as BENCH_LOCAL_r{N})."""
    ex = payload.get("extra", {})

    def _row(d, *keys):
        if not isinstance(d, dict):
            return d
        out = {}
        for k in keys:
            if d.get(k) is not None:
                out[k] = d[k]
        return out or (d.get("skipped") and {"skipped": d["skipped"]}) \
            or (d.get("error") and {"error": str(d["error"])[:120]}) or {}

    sweep = {cfg: _row(m, "out_samples_per_sec_quiet",
                       "roofline_frac_quiet",
                       "roofline_frac_of_shape_quiet")
             for cfg, m in (ex.get("sweep") or {}).items()}
    fixed = {cfg: _row(m, "out_samples_per_sec_quiet",
                       "roofline_frac_quiet",
                       "roofline_frac_of_shape_quiet")
             for cfg, m in (ex.get("fixed_point_universe") or {}).items()}
    sm = ex.get("on_chip_shardmap")
    compact = {
        "metric": payload.get("metric"),
        "value": payload.get("value"),
        "unit": payload.get("unit"),
        "vs_baseline": payload.get("vs_baseline"),
        "extra": {
            "backend": ex.get("backend"),
            "kernel": ex.get("kernel"), "scheme": ex.get("scheme"),
            "launch_ms_quiet": ex.get("launch_ms_quiet"),
            "roofline_frac_quiet": ex.get("roofline_frac_quiet"),
            "out_sps_quiet": ex.get("out_samples_per_sec_quiet"),
            "out_sps_best": ex.get("out_samples_per_sec_best"),
            "vs_reference_cpu": ex.get("vs_reference_cpu"),
            "single_stream": _row(ex.get("single_stream"),
                                  "out_samples_per_sec",
                                  "vs_reference_cpu",
                                  "fixed_out_samples_per_sec",
                                  "fixed_vs_reference_cpu"),
            "sweep_quiet": sweep,
            "fixed_quiet": fixed,
            "hard_latency": _row(ex.get("hard_latency"),
                                 "out_samples_per_sec_quiet",
                                 "roofline_frac_quiet"),
            "fleet_e2e": _row(ex.get("fleet_e2e"),
                              "out_samples_per_sec", "accounted_frac",
                              "colocated_proxy_out_samples_per_sec"),
            "multifleet": _row(ex.get("multifleet"),
                               "out_samples_per_sec", "accounted_frac"),
            "shardmap_all_equal": (sm.get("all_equal")
                                   if isinstance(sm, dict) else None),
            "watchdog": ex.get("watchdog"), "error": ex.get("error"),
            "full_artifact": "BENCH_FULL_LOCAL.json",
        },
    }
    compact["extra"] = {k: v for k, v in compact["extra"].items()
                        if v is not None}
    return compact


def _emit(payload: dict) -> None:
    """Write the full artifact to BENCH_FULL_LOCAL.json and print exactly
    ONE compact stdout JSON line process-wide (driver contract), whichever
    of main/watchdog gets here first."""
    global _EMIT_FIRED
    with _EMIT_LOCK:
        if _EMIT_FIRED:
            return
        _EMIT_FIRED = True
        try:
            (REPO / "BENCH_FULL_LOCAL.json").write_text(
                json.dumps(payload, indent=1))
        except Exception as e:
            _note(f"full-artifact write failed: {e!r}")
        line = json.dumps(_compact_summary(payload))
        if len(line) > 1900:  # hard driver-tail guard: drop sweeps first
            for victim in ("sweep_quiet", "fixed_quiet"):
                cut = json.loads(line)
                cut["extra"].pop(victim, None)
                line = json.dumps(cut)
                if len(line) <= 1900:
                    break
        print(line, flush=True)


def _hard_watchdog() -> None:
    if _DONE.wait(timeout=_BUDGET_S + 120):
        return
    err = ("hard watchdog: main thread stuck past budget+grace "
           "(wedged device tunnel?); emitting sections completed so far")
    if _PARTIAL.get("value"):
        payload = dict(_PARTIAL)
        payload["extra"] = dict(payload.get("extra", {}), watchdog=err)
    else:
        payload = {
            "metric": "bench failed", "value": 0, "unit": "samples/sec",
            "vs_baseline": 0.0, "extra": {"error": err}}
    _emit(payload)
    os._exit(0)


def _note(msg: str) -> None:
    print(f"[bench {time.monotonic() - _T0:6.0f}s] {msg}",
          file=sys.stderr, flush=True)


# v5e bf16 MXU peak used for the per-config roofline keys
# (docs/design.md "Roofline": ~197 bf16 TFLOP/s; int8 runs at 2x, so a
# D-digit int8 scheme costs D bf16-equivalent passes)
PEAK_BF16_FLOPS = 197e12

# Measured sustained MAC rates for the EXACT [C, K] block operands the
# Pallas kernels contract (experiments/mxu_peak.py on this chip, int16->
# int8-plane dots, VMEM-resident, slope-of-two-grids).  The datasheet
# model above is shape-blind; small blocks physically cannot sustain it
# ([128, 136] runs at 63% of [256, 520]'s rate on the same MXU).  These
# constants turn each row's roofline_frac into a second, shape-aware
# fraction: roofline_frac_of_shape ~ 1.0 means the kernel is at the
# measured speed of light FOR ITS GEOMETRY and the residual vs the
# datasheet model is the MXU's own shape behavior, not kernel overhead.
MODEL_PASS_MACS = PEAK_BF16_FLOPS / 2          # 98.5 T MAC/s per pass
MEASURED_SHAPE_MACS = {                         # (C, K) -> MAC/s
    (128, 264): 98.1e12,
    (512, 264): 135.7e12,
    (128, 136): 60.8e12,
    (256, 520): 137.4e12,
    (256, 208): 121.2e12,   # widened-R short-span block (_tiled_R)
    (128, 400): 116.6e12,   # decimate tiled block (44.1k->24k q5)
}
# measured rate of the XLA Precision.HIGHEST f32 GEMM the dense family
# issues (~15.0-15.3 T MAC/s across sessions; the 6-pass model prices it
# at 16.4 T, so dense floors run ~8% hot without this correction)
MEASURED_XLA_HIGHEST_MACS = 15.0e12


def _shape_peak_frac(C, K, scheme):
    """Measured-achievable fraction of the datasheet per-pass rate for
    this block shape, or None when no measurement covers it."""
    if scheme in ("highest", "split5") or C is None:
        return None
    best, bd = None, None
    for (c, k), rate in MEASURED_SHAPE_MACS.items():
        if rate is None:
            continue
        d = abs(c - C) / max(c, C) + abs(k - K) / max(k, K)
        if bd is None or d < bd:
            best, bd = rate, d
    if best is None or bd > 0.35:   # no measurement near this shape
        return None
    return best / MODEL_PASS_MACS


def _roofline_ms(bstep, bspec, B):
    info = _roofline_info(bstep, bspec, B)
    return info[0] if info else None


def _roofline_info(bstep, bspec, B):
    """Scheme-aware MXU floor for one launch: (ms, C, K, passes), or None
    where the config has no MXU formulation (gather geometry).  One
    bf16-rate pass over the launch is 2 * n_blocks * C * K * B FLOPs,
    where [C, K] is the per-block weight operand actually contracted
    (read from the weight shapes so padding and fixed-universe
    accumulator columns are counted); scheme ladder costs in
    bf16-equivalents: int8 = D digits, split5 = 5, highest = 6,
    fixed = 2 per column set."""
    import numpy as _np
    s, w = bstep.scheme, bstep.w
    try:
        if bspec.kernel in ("tiled", "streamed"):
            tiled = bspec.kernel == "tiled"
            if s == "fixed":
                p = _np.asarray(w[0])     # [2,P,C,K] / [P,2,C,K]
                C, K = p.shape[2], p.shape[3]
                passes = 2.0
            elif s == "int8":
                p = _np.asarray(w[0])     # [D,P,K,R] / [P,D,R,K]
                if tiled:
                    D, K, C = p.shape[0], p.shape[2], p.shape[3]
                else:
                    D, C, K = p.shape[1], p.shape[2], p.shape[3]
                passes = float(D)
            elif s == "split5":
                p = _np.asarray(w)        # [3,P,K,R] / [P,3,R,K]
                K, C = (p.shape[2], p.shape[3]) if tiled \
                    else (p.shape[3], p.shape[2])
                passes = 5.0
            else:                         # highest: [P,K,R] / [P,R,K]
                p = _np.asarray(w)
                K, C = (p.shape[1], p.shape[2]) if tiled \
                    else (p.shape[2], p.shape[1])
                passes = 6.0
            flops = 2.0 * bspec.n_blocks * C * K * B * passes
        elif bspec.kernel == "dense":
            if s == "fixed":
                L, C = _np.asarray(w[0]).shape[:2]
                passes = 2.0
            else:
                L, C = _np.asarray(w).shape[:2]
                passes = 6.0
            flops = 2.0 * bspec.n_blocks * L * C * B * passes
            return (flops / PEAK_BF16_FLOPS * 1e3, None, None, passes)
        else:
            return None
        return (flops / PEAK_BF16_FLOPS * 1e3, int(C), int(K), passes)
    except Exception:
        return None


def _quiet(slopes_sorted):
    """launch_ms_quiet: median of the best tercile — the chip-quiet
    statistic the round-3 review asked for (contention inflates the
    overall median; inverted/negative slopes are already rejected)."""
    k = max(1, -(-len(slopes_sorted) // 3))
    best = slopes_sorted[:k]
    return best[len(best) // 2]


def measure_config(in_rate, out_rate, quality, *, use_pallas,
                   target_in_frames=TARGET_IN_FRAMES, fixed_point=False,
                   n_slopes=3, max_latency_ms=None):
    """Median scan-slope per-launch seconds + geometry for one config."""
    B = N_STREAMS * CHANNELS
    g = math.gcd(in_rate, out_rate)
    spec = fd.design_filter(in_rate // g, out_rate // g, quality,
                            fixed_point=fixed_point)
    max_in = (None if max_latency_ms is None
              else int(max_latency_ms * in_rate / 1000))
    bspec = _launch_geometry(spec, target_in_frames, use_pallas=use_pallas,
                             max_in_frames=max_in)
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
        # loop-invariant code motion elides it.  Salting the carried
        # history is NOT enough for the XLA-transparent kernel families
        # (dense/gather): only the first blocks read hist, so XLA hoists
        # the x-only GEMM out of the scan and the "launch" times at a
        # physically impossible rate (round 4's hard_latency row recorded
        # roofline_frac_quiet = 1.173 quiet = 0.030 ms, i.e. 2x the
        # chip's SINGLE-pass bf16 peak for a 6-pass HIGHEST dot; the
        # honest cost re-measured with x salted is ~0.086 ms).  So x is
        # salted too — and carried through the scan so the row update
        # aliases in place instead of recopying the ~38 MB operand every
        # iteration (a +26%-of-flagship-launch artifact the other way).
        def body(carry, _):
            h, xc, chk = carry
            s = (chk + salt).astype(jnp.int16)
            xs = xc.at[0, :].add(s)   # carried: in-place on the scan buffer
            h2, y = step(h.at[0, :].add(s), xs, w)
            return (h2, xs, chk + y[0, 0].astype(jnp.int32)), None
        (h, xc, chk), _ = lax.scan(body, (hist, x, jnp.int32(0)),
                                   length=iters)
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

    def one_long_bound():
        t0 = time.perf_counter()
        jax.device_get(rep(hist0, x, w, jnp.int16(1), ITERS_LONG))
        return (time.perf_counter() - t0) / ITERS_LONG

    # chip/tunnel load varies between sessions; take the median of several
    # independent slope measurements, and record best + spread so a busy
    # chip can't masquerade as a kernel regression (BENCH is the driver's
    # only perf gate; the same compiled flagship config has measured
    # 0.13-0.44 ms/launch across contention windows).  Under heavy
    # contention one slope can cost minutes — bail once 2 are in hand if
    # the budget is running out.
    roof_info = _roofline_info(bstep, bspec, B)
    roof_ms, roof_C, roof_K = ((roof_info[0], roof_info[1], roof_info[2])
                               if roof_info else (None, None, None))
    shape_frac = (_shape_peak_frac(roof_C, roof_K, bstep.scheme)
                  if roof_info else None)
    if (shape_frac is None and bspec.kernel == "dense"
            and bstep.scheme == "highest"):
        # dense rows issue one XLA HIGHEST GEMM per block; its measured
        # rate vs the 6-pass model is shape-independent at these sizes
        shape_frac = MEASURED_XLA_HIGHEST_MACS / (MODEL_PASS_MACS / 6.0)
    # a slope can only be trusted between the physics floor and +inf: a
    # SHORT-scan contention spike makes it negative (observed -0.185 ms),
    # and the same spike in milder form yields a positive slope BELOW the
    # MXU roofline (observed 0.0154 ms against a 0.128 ms floor = "8.3x
    # speed of light").  Both are artifacts of differencing two noisy
    # walls, not measurements; reject either and retry.  The margin must
    # absorb the roofline MODEL's own same-direction error — real quiet
    # measurements have landed up to frac~=1.10 past the modeled floor
    # (44.1k->24k q5, BENCH_LOCAL_r04), i.e. the datasheet-peak model
    # under-floors some configs by ~10% — so /1.3 keeps ~18% of margin
    # beyond the demonstrated model error instead of the 9% that /1.2
    # left (which risked rejecting genuine fast slopes and silently
    # falling back to the one_long_bound upper bound for exactly the
    # fastest configs).
    floor_s = (roof_ms / 1.3) * 1e-3 if roof_ms else 0.0
    slopes, rejected = [], 0
    attempts = 0
    while len(slopes) < n_slopes and attempts < n_slopes + 3:
        attempts += 1
        s = one_slope(attempts)
        if s > floor_s:
            slopes.append(s)
        else:
            rejected += 1
        if len(slopes) >= 2 and _time_left() < 0.6 * _BUDGET_S:
            break
    if not slopes:
        # every attempt inverted (pathological contention): fall back to
        # the long-scan wall time per launch — an upper bound, but real
        slopes = [min(one_long_bound(), one_long_bound())]
    slopes = sorted(slopes)
    # true median: with an even count (e.g. the 2-sample budget bail),
    # average the middle two — picking slopes[n//2] would report the
    # WORSE of two samples, the exact contention bias this design avoids
    mid = len(slopes) // 2
    per_launch = (slopes[mid] if len(slopes) % 2
                  else (slopes[mid - 1] + slopes[mid]) / 2)
    best = slopes[0]
    quiet = _quiet(slopes)
    spread = (slopes[-1] - slopes[0]) / per_launch if per_launch else 0.0
    return {
        "kernel": bspec.kernel,
        "scheme": bstep.scheme,
        "launch_ms": round(per_launch * 1e3, 4),
        "launch_ms_best": round(best * 1e3, 4),
        "launch_ms_quiet": round(quiet * 1e3, 4),
        "launch_ms_spread": round(spread, 3),
        "launch_ms_runs": [round(v * 1e3, 4) for v in slopes],
        "slopes_rejected": rejected,
        # MXU floor of this config's scheme and the fraction of it the
        # QUIET statistic achieves (roofline_frac ~ 1.0 = speed of light;
        # >1 would flag a bogus measurement like round-3's 380 G outlier)
        "roofline_ms": (round(roof_ms, 4) if roof_ms else None),
        "roofline_frac_quiet": (round(roof_ms / (quiet * 1e3), 3)
                                if roof_ms and quiet else None),
        # shape-aware context: the measured MXU rate for this row's
        # [C, K] block (MEASURED_SHAPE_MACS) as a fraction of the
        # datasheet per-pass model, and the quiet launch as a fraction
        # of THAT — ~1.0 = speed of light for this geometry
        "mxu_block": ([roof_C, roof_K] if roof_C else None),
        "shape_peak_frac": (round(shape_frac, 3) if shape_frac else None),
        "roofline_frac_of_shape_quiet": (
            round(roof_ms / (quiet * 1e3) / shape_frac, 3)
            if roof_ms and quiet and shape_frac else None),
        "out_samples_per_sec": round(bspec.out_per_launch * B / per_launch),
        "out_samples_per_sec_best": round(bspec.out_per_launch * B / best),
        "out_samples_per_sec_quiet": round(bspec.out_per_launch * B
                                           / quiet),
        "in_samples_per_sec": round(bspec.in_per_launch * B / per_launch),
        "in_frames_per_launch": bspec.in_per_launch,
        "out_frames_per_launch": bspec.out_per_launch,
        "bspec": bspec, "x_np": x_np,
    }


def oracle_cpu_baseline(in_rate, out_rate, quality, seconds=1.5,
                        fixed_point=False):
    """Measured throughput of the reference C core, -O3, on this host."""
    define = "FIXED_POINT" if fixed_point else "FLOATING_POINT"
    exe = REPO / "build" / ("oracle_bench_fixed" if fixed_point
                            else "oracle_bench")
    src = REPO / "tests" / "oracle" / "oracle.c"
    try:
        if not (exe.exists() and exe.stat().st_mtime > src.stat().st_mtime):
            exe.parent.mkdir(exist_ok=True)
            subprocess.run(
                ["gcc", "-O3", f"-D{define}", "-DOUTSIDE_SPEEX",
                 "-I/root/reference/deps/speex", str(src), "-lm",
                 "-o", str(exe)], check=True)
        out = subprocess.run(
            [str(exe), "bench", str(CHANNELS), str(in_rate), str(out_rate),
             str(quality), str(seconds)],
            capture_output=True, check=True, timeout=120).stdout
        return json.loads(out)
    except Exception as e:  # no reference checkout / no gcc: skip, not fail
        return {"error": repr(e)}


def stager_bench():
    """Native host stager throughput (the host-path ceiling): gather
    (per-stream FIFOs -> launch slab) and scatter (result slab ->
    per-stream PCM) int16 samples/s at the flagship geometry, for BOTH
    slab layouts — lane-major (``*_lm``, the FleetResampler production
    path: contiguous per-stream rows, transpose rides the device) and
    time-major (the kernel-native layout).  This is the e2e bottleneck
    when host and chip are co-located; without it in BENCH, host-side
    regressions are invisible to the driver."""
    try:
        from speex_resampler_tpu.runtime.native import NativeStager
        S, C, n_in, n_out = N_STREAMS, CHANNELS, TARGET_IN_FRAMES, 10240
        K = 8
        st = NativeStager(S, C, n_in)
        threads = st.set_threads(4)
        rng = np.random.default_rng(0)
        frames = rng.integers(-32768, 32768,
                              size=(S, K * n_in, C)).astype(np.int16)
        slab = np.empty((n_in, S * C), dtype=np.int16)
        slab_lm = np.zeros((S * C, n_in), dtype=np.int16)
        y = rng.integers(-32768, 32768,
                         size=(n_out, S * C)).astype(np.int16)
        y_lm = np.ascontiguousarray(y.T)
        dst = np.empty((S, n_out, C), dtype=np.int16)
        g_best = s_best = gl_best = sl_best = 9e9
        for _ in range(3):
            for s in range(S):
                st.push(s, frames[s])
            t0 = time.perf_counter()
            for _ in range(K // 2):
                st.fill_launch(out=slab)
            g_best = min(g_best, (time.perf_counter() - t0) / (K // 2))
            t0 = time.perf_counter()
            for _ in range(K - K // 2):
                st.fill_launch_lm(slab_lm)
            gl_best = min(gl_best,
                          (time.perf_counter() - t0) / (K - K // 2))
            t0 = time.perf_counter()
            for _ in range(K):
                st.unpack_all(y)
            s_best = min(s_best, (time.perf_counter() - t0) / K)
            t0 = time.perf_counter()
            for _ in range(K):
                st.unpack_all_lm(y_lm, out=dst)
            sl_best = min(sl_best, (time.perf_counter() - t0) / K)
        return {"threads": threads,
                "gather_samples_per_sec": round(n_in * S * C / g_best),
                "scatter_samples_per_sec": round(y.size / s_best),
                "gather_lm_samples_per_sec": round(n_in * S * C / gl_best),
                "scatter_lm_samples_per_sec": round(y.size / sl_best)}
    except Exception as e:
        return {"error": repr(e)}


def single_stream_bench(seconds=0.8):
    """The reference's PRIMARY use case: ONE resampler per audio stream
    (Readme.md:20-21, src/index.ts:50-116), interactive chunks through
    SpeexResampler.process_chunk on the DEFAULT path (engine="auto" routes
    <=8-channel float cores to the native host hot loops — bit-identical to
    the reference; the fixed universe is host-native always).  Measured
    against the -O3 compiled reference C on the same host so the one place
    the framework could LOSE to the reference on its home turf is a
    recorded number, not a story."""
    from speex_resampler_tpu.api import SpeexResampler

    def _one(channels, in_rate, out_rate, q, fixed):
        r = SpeexResampler(channels, in_rate, out_rate, q,
                           fixed_point=fixed)
        rng = np.random.default_rng(0)
        frames = 1024
        chunk = rng.integers(-32768, 32768, (frames * channels,)) \
            .astype(np.int16).tobytes()
        for _ in range(8):
            r.process_chunk(chunk)
        best = 0.0
        for _ in range(3):
            n_out = 0
            t0 = time.perf_counter()
            while (dt := time.perf_counter() - t0) < seconds / 3:
                n_out += len(r.process_chunk(chunk)) // 2
            best = max(best, n_out / dt)
        return round(best)

    out = {"chunk_frames": 1024, "config": "44100->48000 q5"}
    try:
        ours = _one(1, 44100, 48000, 5, False)
        ref = oracle_cpu_baseline(44100, 48000, 5, seconds=1.0)
        out["out_samples_per_sec"] = ours
        out["reference_cpu_out_samples_per_sec"] = ref.get(
            "out_samples_per_sec")
        if ref.get("out_samples_per_sec"):
            out["vs_reference_cpu"] = round(
                ours / ref["out_samples_per_sec"], 2)
        ours2 = _one(2, 44100, 48000, 5, False)
        out["stereo_out_samples_per_sec"] = ours2
        # oracle_bench's channel arg: rerun at 2ch for an apples match
        try:
            exe = REPO / "build" / "oracle_bench"
            r2 = json.loads(subprocess.run(
                [str(exe), "bench", "2", "44100", "48000", "5", "1.0"],
                capture_output=True, check=True, timeout=120).stdout)
            out["stereo_reference_cpu_out_samples_per_sec"] = r2[
                "out_samples_per_sec"]
            out["stereo_vs_reference_cpu"] = round(
                ours2 / r2["out_samples_per_sec"], 2)
        except Exception:
            pass
        oursf = _one(1, 44100, 48000, 5, True)
        reff = oracle_cpu_baseline(44100, 48000, 5, seconds=1.0,
                                   fixed_point=True)
        out["fixed_out_samples_per_sec"] = oursf
        out["fixed_reference_cpu_out_samples_per_sec"] = reff.get(
            "out_samples_per_sec")
        if reff.get("out_samples_per_sec"):
            out["fixed_vs_reference_cpu"] = round(
                oursf / reff["out_samples_per_sec"], 2)
    except Exception as e:
        out["error"] = repr(e)
    return out


def fleet_e2e(fixed_point=False, n_streams=256, kernel_quiet_ms=None):
    """End-to-end through FleetResampler (ragged staging + native gather/
    scatter + device launches + readback), samples/s, WITH the per-phase
    breakdown (gather / dispatch / readback / unpack ms per launch) so
    the artifact explains its own number: through this harness's tunnel
    the readback phase dominates; a co-located host is bounded by
    gather+unpack+kernel, reported as ``predicted_colocated`` (this
    fleet's measured host phases composed with the flagship's quiet
    kernel launch scaled to the fleet's lane count).
    ``host_path_samples_per_sec`` (out samples over gather+unpack
    seconds) is the tunnel-independent host-side regression gate."""
    try:
        from speex_resampler_tpu.runtime.fleet import FleetResampler
        S, C = n_streams, CHANNELS
        fleet = FleetResampler(S, C, *FLAGSHIP[:2], FLAGSHIP[2],
                               target_chunk_frames=TARGET_IN_FRAMES,
                               fixed_point=fixed_point)
        q = fleet.bspec.in_per_launch
        rng = np.random.default_rng(0)
        frames = (rng.integers(-32768, 32768, size=(S, q, C)) // 2).astype(
            np.int16)
        for s in range(S):
            fleet.push(s, frames[s])
        fleet.poll()  # warmup/compile
        for s in range(S):
            fleet.pull(s)
        fleet.stats = type(fleet.stats)()  # fresh counters post-warmup
        produced = 0
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            for s in range(S):
                fleet.push(s, frames[s])
            fleet.poll()
            for s in range(S):
                produced += fleet.pull(s).size
        dt = time.perf_counter() - t0
        st = fleet.stats
        phases = st.phase_ms_per_launch()
        mins = st.phase_ms_min()
        phase_s = sum(st.phase_seconds.values())
        # host capability from per-launch MINIMA: this 1-core host also
        # services the device tunnel, so a mean absorbs descheduling
        # stalls from in-flight transfers (observed 6 ms vs 705 ms for
        # the same unpack); the min is the stable regression gate
        host_ms_min = mins.get("gather", 0.0) + mins.get("unpack", 0.0)
        per_launch_out = produced / st.launches if st.launches else 0
        out = {"out_samples_per_sec": round(produced / dt),
               "streams": S, "launches": st.launches,
               "degraded": fleet.degraded,
               "pipeline_depth": fleet._depth,
               "phase_ms_per_launch": phases,
               "phase_ms_min": mins,
               # phases must explain the wall time (~within 10%); the
               # remainder is python loop + push overhead
               "accounted_frac": round(phase_s / dt, 3) if dt else None,
               "host_path_samples_per_sec": (
                   round(per_launch_out / (host_ms_min * 1e-3))
                   if host_ms_min else None)}
        if kernel_quiet_ms and st.launches:
            # colocated prediction: serial host phases + the quiet kernel
            # launch scaled from the flagship's 1024 lanes to this fleet
            pred_ms = (mins.get("gather", 0.0) + mins.get("unpack", 0.0)
                       + kernel_quiet_ms * (S / N_STREAMS))
            out["predicted_colocated_out_samples_per_sec"] = round(
                fleet.bspec.out_per_launch * S * C / (pred_ms * 1e-3))
            out["predicted_colocated_ms_per_launch"] = round(pred_ms, 4)

        # MEASURED tunnel-free pipeline (round-4 review #5): the same REAL
        # poll loop (real stager gather, real dispatch, real jitted step)
        # with a DEVICE-RESIDENT consumer fused into the step — readback
        # transfers one int32 checksum per launch instead of the 10 MB
        # output slab, so the measurement no longer depends on this
        # harness's network tunnel.  This is a real serving topology
        # (resampler feeding an on-chip downstream), not a trick geometry.
        if not fixed_point:
            try:
                fl2 = FleetResampler(
                    S, C, *FLAGSHIP[:2], FLAGSHIP[2],
                    target_chunk_frames=TARGET_IN_FRAMES,
                    fixed_point=fixed_point,
                    device_consumer=lambda y: jnp.sum(
                        y.astype(jnp.int32)))
                for s in range(S):
                    fl2.push(s, frames[s])
                fl2.poll()  # warmup/compile the fused step
                fl2.stats = type(fl2.stats)()
                fl2.consumed.clear()
                best = None
                rounds = 6
                for _ in range(rounds):
                    for s in range(S):
                        fl2.push(s, frames[s])
                    t0 = time.perf_counter()
                    n = fl2.poll()
                    dtp = time.perf_counter() - t0
                    if n and (best is None or dtp / n < best):
                        best = dtp / n
                if best:
                    out["colocated_proxy_out_samples_per_sec"] = round(
                        fl2.bspec.out_per_launch * S * C / best)
                    out["colocated_proxy_ms_per_launch"] = round(
                        best * 1e3, 3)
                    out["colocated_proxy_rounds"] = rounds
                    out["colocated_proxy_checksums"] = len(fl2.consumed)
            except Exception as e:
                out["colocated_proxy_error"] = repr(e)
        return out
    except Exception as e:
        return {"error": repr(e)}


def multifleet_e2e(n_streams=1024, n_buckets=4, target_frames=2048):
    """MultiFleet at production scale: ``n_streams`` streams spread over
    heterogeneous config buckets, with a mid-run detach/attach and an
    exact rate switch mixed in (the round-3 review's missing scale
    measurement).  Records per-bucket launch counts/phases and aggregate
    out samples/s.  Smaller per-launch quantum than the flagship keeps
    tunnel payloads bounded (this is a scale/correctness section, not a
    kernel number — those are the sweep rows)."""
    try:
        from speex_resampler_tpu.runtime.multifleet import MultiFleet
        configs = [FLAGSHIP, (24000, 48000, 5), (48000, 44100, 10),
                   (44100, 24000, 5)][:n_buckets]
        per = n_streams // len(configs)
        # +1 headroom: the rate-switch below reserves a slot in its
        # DESTINATION bucket before the source lane is torn down
        mf = MultiFleet(channels=CHANNELS, capacity_per_bucket=per + 1,
                        target_chunk_frames=target_frames)
        rng = np.random.default_rng(1)
        sids = []
        for b, cfg in enumerate(configs):
            for i in range(per):
                sid = f"b{b}s{i}"
                mf.add_stream(sid, *cfg)
                sids.append((sid, cfg))
        # one quantum per stream per iteration, by bucket rate
        chunks = {cfg: (rng.integers(
            -32768, 32768,
            size=(mf._buckets[cfg].fleet.bspec.in_per_launch, CHANNELS))
            // 2).astype(np.int16) for cfg in configs}
        for sid, cfg in sids:
            mf.push(sid, chunks[cfg])
        mf.poll()   # warmup/compile all buckets
        for sid, _ in sids:
            mf.pull(sid)
        # dynamics: detach one stream, attach a fresh one, and run one
        # exact mid-stream rate switch (magic-sample migration path)
        mf.end_stream(sids[0][0]); mf.pull(sids[0][0])
        mf.add_stream("fresh", *configs[0]); sids[0] = ("fresh", configs[0])
        mf.set_stream_rate(sids[1][0], *configs[1][:2],
                           configs[1][2])
        sids[1] = (sids[1][0], configs[1])
        # steady-state only: the warmup polls and the dynamics above paid
        # every bucket's compile cost; without this reset the per-bucket
        # dispatch phase reads ~1.3 s/launch of amortized XLA compile.
        # Two more full warmup rounds so every bucket's steady launch path
        # (including the post-switch geometry) is hot before timing.
        for _ in range(2):
            for sid, cfg in sids:
                mf.push(sid, chunks[cfg])
            mf.poll()
            for sid, _ in sids:
                mf.pull(sid)
        mf.reset_stats()
        # the serving-tier discipline the kernel tier already has
        # (round-4 review #3/#7): >=10 timed rounds, per-round wall
        # recorded, host push/pull loops attributed as named phases so
        # accounted_frac covers the WHOLE loop, not just fleet internals
        produced = 0
        iters = 10
        push_s = pull_s = poll_s = 0.0
        iter_ms = []
        t0 = time.perf_counter()
        for _ in range(iters):
            ti = time.perf_counter()
            for sid, cfg in sids:
                mf.push(sid, chunks[cfg])
            tp = time.perf_counter()
            push_s += tp - ti
            mf.poll()
            tq = time.perf_counter()
            poll_s += tq - tp
            for sid, _ in sids:
                produced += mf.pull(sid).size
            te = time.perf_counter()
            pull_s += te - tq
            iter_ms.append(round((te - ti) * 1e3, 2))
        dt = time.perf_counter() - t0
        stats = mf.stats()
        phase_s = sum(sum(b.fleet.stats.phase_seconds.values())
                      for b in mf._buckets.values())
        # named phases: host push loop + host pull loop + the fleet's own
        # per-launch attribution inside poll (gather/dispatch/readback/
        # unpack); residual = poll wall the fleet phases don't cover
        # (bucket iteration, ready checks) — recorded, so nothing is
        # silently unattributed
        accounted = (push_s + pull_s + phase_s) / dt if dt else None
        srt = sorted(iter_ms)
        # host capability: total out samples over total MIN gather+unpack
        # time (min spans per bucket x its launch count — the mean
        # absorbs tunnel-descheduling stalls on this 1-core host, see
        # fleet_e2e; buckets share the core, so times add)
        cap_out, cap_s = 0, 0.0
        for b in mf._buckets.values():
            st = b.fleet.stats
            if not st.launches:
                continue
            m = st.phase_min_seconds
            cap_out += st.out_samples
            cap_s += (m.get("gather", 0.0)
                      + m.get("unpack", 0.0)) * st.launches
        return {"out_samples_per_sec": round(produced / dt),
                "streams": n_streams, "buckets": len(configs),
                "degraded": mf.degraded,
                "timed_rounds": iters,
                "iter_ms_median": srt[len(srt) // 2],
                "iter_ms_min": srt[0],
                "iter_ms_spread": (round((srt[-1] - srt[0]) / srt[0], 3)
                                   if srt[0] else None),
                "out_samples_per_sec_best": (round(
                    produced / iters / (srt[0] * 1e-3)) if srt[0]
                    else None),
                "phase_push_ms": round(push_s / iters * 1e3, 2),
                "phase_poll_ms": round(poll_s / iters * 1e3, 2),
                "phase_pull_ms": round(pull_s / iters * 1e3, 2),
                "phase_fleet_internal_ms": round(phase_s / iters * 1e3, 2),
                "poll_residual_ms": round((poll_s - phase_s) / iters * 1e3,
                                          2),
                "accounted_frac": (round(accounted, 3)
                                   if accounted is not None else None),
                "accounting_gate_0p9": (accounted is not None
                                        and accounted >= 0.9),
                "host_path_samples_per_sec": (round(cap_out / cap_s)
                                              if cap_s else None),
                "per_bucket": {k: {"launches": v["launches"],
                                   "phase_ms_per_launch":
                                       v["phase_ms_per_launch"],
                                   "phase_ms_min": v["phase_ms_min"]}
                               for k, v in stats.items()}}
    except Exception as e:
        return {"error": repr(e)}


def shardmap_onchip_check():
    """Mosaic-compiled Pallas kernels under jax.shard_map ON THE REAL
    CHIP: a 1-device Mesh is the multi-chip code path (shard_map wrapping
    an opaque pallas_call) minus the extra chips this harness doesn't
    have.  Asserts the sharded launch is bit-equal to the direct call at
    production geometry for the tiled (v3 int8) and streamed (v4) kernels
    in BOTH numeric universes — the one untested ingredient of the
    multi-chip story that CAN be tested here (streams are share-nothing:
    reference Readme.md:20-21)."""
    results = {}
    devs = jax.devices()
    mesh = jax.sharding.Mesh(np.array(devs[:1]), ("streams",))
    Pp = jax.sharding.PartitionSpec
    lane = jax.sharding.NamedSharding(mesh, Pp(None, "streams"))
    repl = jax.sharding.NamedSharding(mesh, Pp())
    B = N_STREAMS * CHANNELS
    cases = [
        ("tiled_int8_flagship", FLAGSHIP, False, TARGET_IN_FRAMES),
        ("streamed_int8_48k_44k_q10", (48000, 44100, 10), False, 4096),
        ("tiled_fixed_flagship", FLAGSHIP, True, TARGET_IN_FRAMES),
        ("streamed_fixed_48k_44k_q10", (48000, 44100, 10), True, 4096),
    ]
    rng = np.random.default_rng(7)
    sec_t0 = time.monotonic()
    for name, (ir, orr, q), fixed, target in cases:
        # section sub-cap: on a contended chip one case can cost ~6 min of
        # compiles; stop opening new cases once the section has spent half
        # the run budget so the fixed/sweep/stager sections still land
        if _time_left() < 120 or time.monotonic() - sec_t0 > 0.5 * _BUDGET_S:
            results[name] = {"skipped": "time budget"}
            continue
        _note(f"shardmap case {name}")
        try:
            g = math.gcd(ir, orr)
            spec = fd.design_filter(ir // g, orr // g, q,
                                    fixed_point=fixed)
            bspec = _launch_geometry(spec, target, use_pallas=True)
            expect = name.split("_")[0]
            assert bspec.kernel == expect, (name, bspec.kernel)
            direct = make_batched_step(spec, bspec, use_pallas=True)
            sharded = make_batched_step(spec, bspec, use_pallas=True,
                                        mesh=mesh)
            h_np = (rng.integers(-32768, 32768,
                                 size=(direct.hist_rows, B)) // 2).astype(
                np.int16)
            x_np = np.zeros((direct.chunk_rows, B), dtype=np.int16)
            x_np[:bspec.in_per_launch] = (rng.integers(
                -32768, 32768, size=(bspec.in_per_launch, B))
                // 2).astype(np.int16)
            _, y_d = direct.fn(jnp.asarray(h_np), jnp.asarray(x_np),
                               direct.w)
            _, y_s = sharded.fn(
                jax.device_put(jnp.asarray(h_np), lane),
                jax.device_put(jnp.asarray(x_np), lane),
                jax.device_put(sharded.w, repl))
            equal = bool(np.array_equal(np.asarray(y_d), np.asarray(y_s)))
            results[name] = {"equal": equal, "scheme": direct.scheme,
                             "in_frames": bspec.in_per_launch,
                             "lanes": B}
        except Exception as e:
            results[name] = {"error": repr(e)}
    # aggregate over EXECUTED cases only: a time-budget skip must not
    # masquerade as a bit-parity failure (null when nothing executed)
    executed = [v for k, v in results.items()
                if isinstance(v, dict) and "skipped" not in v]
    results["all_equal"] = (all(v.get("equal") is True for v in executed)
                            if executed else None)
    results["cases_skipped"] = sum(1 for v in results.values()
                                   if isinstance(v, dict)
                                   and "skipped" in v)
    return results


def main():
    backend = jax.default_backend()
    use_pallas = backend == "tpu"
    B = N_STREAMS * CHANNELS

    _note("flagship")
    flag = measure_config(*FLAGSHIP, use_pallas=use_pallas, n_slopes=5)
    device_sps = flag["out_samples_per_sec"]

    # Seed the progressive artifact the watchdog snapshots: from here on a
    # section that wedges the tunnel costs only its OWN keys, never the
    # sections already measured.
    extra = {
        "backend": backend,
        "device_kind": jax.devices()[0].device_kind,
        "kernel": flag["kernel"],
        "scheme": flag["scheme"],
        "launch_ms": flag["launch_ms"],
        "launch_ms_best": flag["launch_ms_best"],
        "launch_ms_quiet": flag["launch_ms_quiet"],
        "launch_ms_spread": flag["launch_ms_spread"],
        "slopes_rejected": flag["slopes_rejected"],
        "roofline_ms": flag["roofline_ms"],
        "roofline_frac_quiet": flag["roofline_frac_quiet"],
        "mxu_block": flag.get("mxu_block"),
        "shape_peak_frac": flag.get("shape_peak_frac"),
        "roofline_frac_of_shape_quiet": flag.get(
            "roofline_frac_of_shape_quiet"),
        "out_samples_per_sec_best": flag["out_samples_per_sec_best"],
        "out_samples_per_sec_quiet": flag["out_samples_per_sec_quiet"],
        "launch_ms_runs": flag["launch_ms_runs"],
        "input_samples_per_sec": flag["in_samples_per_sec"],
        "vs_reference_cpu": None,
        "reference_cpu_out_samples_per_sec": None,
        "e2e_samples_per_sec_via_tunnel": None,
        "streams": N_STREAMS, "channels": CHANNELS,
        "in_frames_per_launch": flag["in_frames_per_launch"],
        "out_frames_per_launch": flag["out_frames_per_launch"],
        "sweep": {}, "fixed_point_universe": {},
        "single_stream": {"skipped": "not reached"},
        "stager": {"skipped": "not reached"},
        "fleet_e2e": {"skipped": "not reached"},
        "fleet_e2e_fixed": {"skipped": "not reached"},
        "hard_latency": {"skipped": "not reached"},
        "multifleet": {"skipped": "not reached"},
        "on_chip_shardmap": {"skipped": "not reached"},
    }
    _PARTIAL.update({
        "metric": "output samples/sec, batched q7 44.1k->48k stereo "
                  f"({N_STREAMS} streams, device-resident steady state)",
        "value": device_sps,
        "unit": "samples/sec",
        "vs_baseline": round(device_sps / 1e9, 3),
        "extra": extra,
    })

    # roofline-model tolerance, recorded so frac > 1 rows in this artifact
    # are self-explaining: the floor is a datasheet-peak model
    # (PEAK_BF16_FLOPS with scheme-ladder pass counts), measured accurate
    # to ~±10% per config (quiet fracs 0.5-1.10 observed); slope rejection
    # uses floor/1.3 to stay clear of that model error
    extra["roofline_note"] = (
        "roofline_ms is a datasheet-peak MXU model (197 bf16 TFLOP/s, "
        "scheme-ladder passes; the HIGHEST f32 GEMM measured ~15 T MAC/s "
        "vs the 16.4 modeled, experiments/mxu_peak.py); the model is "
        "shape-blind, so each row also carries shape_peak_frac = the "
        "MEASURED sustained MAC rate for its [C,K] block as a fraction "
        "of the model rate, and roofline_frac_of_shape_quiet ~ 1.0 means "
        "the kernel is at the measured speed of light for its geometry; "
        "slope rejection floor = roofline/1.3")

    # single-stream home-turf number (pure host, ~4 s): the ONE place the
    # framework could lose to the reference C, so it runs before any
    # tunnel-bound section can eat the budget
    _note("single stream")
    extra["single_stream"] = single_stream_bench()

    # the round-3 headline artifact: run it FIRST among the optional
    # sections so a budget squeeze can never drop it
    _note("on-chip shardmap check")
    extra["on_chip_shardmap"] = (shardmap_onchip_check() if use_pallas
                                 else {"skipped": "no TPU backend"})

    # host-path + fixed e2e BEFORE the sweep: driver-visible host numbers
    # outrank a third sweep row if the budget squeezes
    _note("fleet e2e")
    extra["fleet_e2e"] = (
        fleet_e2e(kernel_quiet_ms=flag["launch_ms_quiet"])
        if _time_left() > 120 else {"skipped": "time budget"})
    _note("fleet e2e fixed")
    extra["fleet_e2e_fixed"] = (fleet_e2e(fixed_point=True)
                                if _time_left() > 100
                                else {"skipped": "time budget"})

    # the voip preset's hard 20 ms quantum (dense v1 fallback) — what the
    # latency guarantee costs vs the tiled flagship (round-3 review #4)
    if _time_left() > 180:
        _note("hard latency (voip 20ms)")
        try:
            m = measure_config(44100, 48000, 3, use_pallas=use_pallas,
                               max_latency_ms=20.0, n_slopes=3)
            extra["hard_latency"] = {
                k: m[k] for k in (
                    "kernel", "scheme", "launch_ms", "launch_ms_best",
                    "launch_ms_quiet", "launch_ms_spread",
                    "roofline_ms", "roofline_frac_quiet",
                              "mxu_block", "shape_peak_frac",
                              "roofline_frac_of_shape_quiet",
                    "out_samples_per_sec", "out_samples_per_sec_quiet",
                    "in_frames_per_launch", "out_frames_per_launch")
            } | {"quantum_ms": round(m["in_frames_per_launch"] / 44100
                                     * 1e3, 3)}
        except Exception as e:
            extra["hard_latency"] = {"error": repr(e)}
    else:
        extra["hard_latency"] = {"skipped": "time budget"}

    # MultiFleet at scale: 1024 streams / 4 heterogeneous buckets with
    # attach/detach + a rate switch mixed in (round-3 review #8)
    _note("multifleet 1024x4")
    extra["multifleet"] = (multifleet_e2e() if _time_left() > 150
                           else {"skipped": "time budget"})

    # FIXED_POINT universe (bit-exact Q15, scheme "fixed": exact int8-plane
    # MXU passes) — the flagship and the fastest direct-path family
    fixed = extra["fixed_point_universe"]
    for (ir, orate, q) in [FLAGSHIP, (24000, 48000, 5)]:
        if _time_left() < 240:
            fixed[f"{ir}->{orate} q{q}"] = {"skipped": "time budget"}
            continue
        _note(f"fixed {ir}->{orate} q{q}")
        m = measure_config(ir, orate, q, use_pallas=use_pallas,
                           fixed_point=True)
        ref = oracle_cpu_baseline(ir, orate, q, fixed_point=True)
        fixed[f"{ir}->{orate} q{q}"] = {
            k: m[k] for k in ("kernel", "scheme", "launch_ms",
                              "launch_ms_best", "launch_ms_quiet",
                              "launch_ms_spread", "slopes_rejected",
                              "roofline_ms", "roofline_frac_quiet",
                              "mxu_block", "shape_peak_frac",
                              "roofline_frac_of_shape_quiet",
                              "out_samples_per_sec",
                              "out_samples_per_sec_best",
                              "out_samples_per_sec_quiet",
                              "in_samples_per_sec")
        } | {"vs_reference_cpu": (
            round(m["out_samples_per_sec"]
                  / ref["out_samples_per_sec"], 1)
            if "out_samples_per_sec" in ref else None)}

    sweep = extra["sweep"]
    for (ir, orate, q) in SWEEP:
        if _time_left() < 240:
            sweep[f"{ir}->{orate} q{q}"] = {"skipped": "time budget"}
            continue
        _note(f"sweep {ir}->{orate} q{q}")
        m = measure_config(ir, orate, q, use_pallas=use_pallas)
        ref = oracle_cpu_baseline(ir, orate, q)
        sweep[f"{ir}->{orate} q{q}"] = {
            k: m[k] for k in ("kernel", "scheme", "launch_ms",
                              "launch_ms_best", "launch_ms_quiet",
                              "launch_ms_spread", "slopes_rejected",
                              "roofline_ms", "roofline_frac_quiet",
                              "mxu_block", "shape_peak_frac",
                              "roofline_frac_of_shape_quiet",
                              "out_samples_per_sec",
                              "out_samples_per_sec_best",
                              "out_samples_per_sec_quiet",
                              "in_samples_per_sec")
        } | {"vs_reference_cpu": (
            round(m["out_samples_per_sec"]
                  / ref["out_samples_per_sec"], 1)
            if "out_samples_per_sec" in ref else None)}

    # Contention self-defense: a wedged/busy tunnel window during the
    # FIRST section (observed: the relay hung ~10 min this round and the
    # flagship recorded frac 0.50 while the same build measured 0.95 in a
    # quiet window) would otherwise define the round's headline.  The
    # quiet statistic is a lower envelope — contention only ever ADDS
    # time — so re-measuring late and keeping the quieter window is
    # sound, and both windows are recorded.
    if (use_pallas and _time_left() > 300
            and (flag.get("roofline_frac_quiet") or 1.0) < 0.8):
        _note("flagship re-measure (first window was contended)")
        try:
            flag2 = measure_config(*FLAGSHIP, use_pallas=use_pallas,
                                   n_slopes=3)
            extra["flagship_first_window"] = {
                k: flag[k] for k in ("launch_ms", "launch_ms_quiet",
                                     "launch_ms_spread",
                                     "roofline_frac_quiet",
                                     "launch_ms_runs")}
            if flag2["launch_ms_quiet"] < flag["launch_ms_quiet"]:
                flag = flag2
                device_sps = flag["out_samples_per_sec"]
                for k in ("launch_ms", "launch_ms_best", "launch_ms_quiet",
                          "launch_ms_spread", "slopes_rejected",
                          "roofline_ms", "roofline_frac_quiet",
                          "mxu_block", "shape_peak_frac",
                          "roofline_frac_of_shape_quiet",
                          "out_samples_per_sec_best",
                          "out_samples_per_sec_quiet", "launch_ms_runs"):
                    if k in flag:
                        extra[k] = flag[k]
                extra["input_samples_per_sec"] = flag["in_samples_per_sec"]
                _PARTIAL["value"] = device_sps
                _PARTIAL["vs_baseline"] = round(device_sps / 1e9, 3)
        except Exception as e:
            extra["flagship_remeasure_error"] = repr(e)

    ref_flag = (oracle_cpu_baseline(*FLAGSHIP)
                if _time_left() > 30 else {"skipped": "time budget"})
    if "out_samples_per_sec" in ref_flag:
        extra["vs_reference_cpu"] = round(
            device_sps / ref_flag["out_samples_per_sec"])
        extra["reference_cpu_out_samples_per_sec"] = ref_flag[
            "out_samples_per_sec"]
    extra["stager"] = (stager_bench() if _time_left() > 45
                       else {"skipped": "time budget"})

    # end-to-end through the public engine (host staging + transfers);
    # budget-gated and iteration-adaptive — tunnel contention can stretch
    # one 21M-sample round-trip arbitrarily
    e2e_sps = None
    if _time_left() > 60:
        _note("e2e")
        try:
            eng = BatchedResampler(
                N_STREAMS, CHANNELS, *FLAGSHIP[:2], FLAGSHIP[2],
                target_chunk_frames=flag["in_frames_per_launch"])
            chunk_np = flag["x_np"][:flag["in_frames_per_launch"]]
            eng.process(chunk_np)  # warmup/compile
            t0 = time.perf_counter()
            produced = 0
            for _ in range(5):
                out = eng.process(chunk_np)
                produced += out.size
                if _time_left() < 30:
                    break
            e2e_sps = round(produced / (time.perf_counter() - t0))
        except Exception as exc:
            e2e_sps = repr(exc)
    extra["e2e_samples_per_sec_via_tunnel"] = e2e_sps

    _DONE.set()
    _emit(_PARTIAL)


if __name__ == "__main__":
    threading.Thread(target=_hard_watchdog, daemon=True).start()
    try:
        sys.exit(main())
    except Exception as exc:  # emit SOMETHING the driver can record
        import traceback
        traceback.print_exc()
        _DONE.set()
        if _PARTIAL.get("value"):  # keep sections measured before the crash
            _PARTIAL["extra"] = dict(_PARTIAL.get("extra", {}),
                                     error=repr(exc))
            _emit(_PARTIAL)
        else:
            _emit({"metric": "bench failed", "value": 0,
                   "unit": "samples/sec", "vs_baseline": 0.0,
                   "extra": {"error": repr(exc)}})
        sys.exit(0)
