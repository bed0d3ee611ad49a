"""Sub-quantum latency control (the voip preset's 20 ms budget).

The batch engine's launch quantum is also its availability latency: a
stream must stage in_per_launch frames before output appears (the
streaming role of src/index.ts:121-162).  ``max_latency_ms`` makes the
budget HARD: geometry falls back from the throughput-optimal tiled kernel
(min quantum S*gp frames, ~53 ms at the flagship ratio) to a dense
geometry with a capped group factor (min quantum = num frames, 3.3 ms at
44.1k->48k) when needed.  Outputs are chunking-invariant, so the
low-latency engine is bit-identical to the default one — only WHEN output
becomes available changes.
"""

import numpy as np
import pytest

from speex_resampler_tpu.models.presets import get_preset
from speex_resampler_tpu.parallel.batch import BatchedResampler
from speex_resampler_tpu.runtime.fleet import FleetResampler
from speex_resampler_tpu.utils.errors import ResamplerError


def _random_frames(S, n, C, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(-32768, 32768, size=(S, n, C)) // 2).astype(
        np.int16)


def test_voip_preset_quantum_under_budget():
    """The voip preset's engine kwargs produce a <= 20 ms launch quantum
    for the common rate pairs (the default tiled geometry would round the
    flagship up to ~53 ms)."""
    p = get_preset("voip")
    for ir, orr in [(44100, 48000), (48000, 44100), (24000, 48000),
                    (16000, 8000), (8000, 48000)]:
        eng = BatchedResampler(2, 1, ir, orr, use_pallas=False,
                               **p.engine_kwargs(ir))
        assert eng.launch_latency_ms <= 20.0 + 1e-9, (
            ir, orr, eng.launch_latency_ms)
        # the quantum stays a whole number of num-periods (f0-invariant)
        assert eng.in_frames_per_launch % eng.spec.num == 0


def test_low_latency_output_identical_to_default():
    """Chunking invariance: the 20 ms engine produces bit-identical
    output to the default (53 ms quantum) engine — only availability
    latency changes."""
    S, C = 2, 2
    frames = _random_frames(S, 12000, C, seed=3)
    fast = BatchedResampler(S, C, 44100, 48000, 7, use_pallas=False,
                            max_latency_ms=20.0)
    slow = BatchedResampler(S, C, 44100, 48000, 7, use_pallas=False)
    assert fast.launch_latency_ms <= 20.0
    assert slow.launch_latency_ms > 20.0  # the default rounds up
    a = np.concatenate([fast.process(frames), fast.flush()], axis=1)
    b = np.concatenate([slow.process(frames), slow.flush()], axis=1)
    assert np.array_equal(a, b)


def test_low_latency_availability():
    """Feeding exactly one 20 ms quantum must produce output immediately
    (the default engine would still be staging)."""
    S, C = 1, 1
    fast = BatchedResampler(S, C, 44100, 48000, 7, use_pallas=False,
                            max_latency_ms=20.0)
    q = fast.in_frames_per_launch
    assert q <= 882  # 20 ms at 44.1k
    y = fast.process(_random_frames(S, q, C, seed=5))
    assert y.shape[1] == fast.out_frames_per_launch > 0


def test_loose_budget_keeps_pallas_kernel():
    """A budget looser than the tiled kernel's natural quantum must keep
    the throughput-optimal kernel (floor-quantized under the cap), not
    fall to dense."""
    eng = BatchedResampler(2, 1, 44100, 48000, 7, use_pallas=True,
                           pallas_interpret=True, max_latency_ms=100.0)
    assert eng.bspec.kernel == "tiled"
    assert eng.launch_latency_ms <= 100.0


def test_infeasible_budget_raises():
    """Ratios whose single num-period exceeds the budget (44100->44101:
    num = 44100 frames = 1 s) cannot be served by f0-invariant batching;
    the engine must refuse rather than silently violate the budget (the
    single-stream ResamplerCore covers true sample-level latency)."""
    with pytest.raises(ResamplerError):
        BatchedResampler(2, 1, 44100, 44101, 1, use_pallas=False,
                         max_latency_ms=20.0)


def test_fleet_low_latency():
    """FleetResampler honors the hard budget: a stream that stages 20 ms
    of audio gets output on the next poll."""
    S, C = 3, 2
    fleet = FleetResampler(S, C, 44100, 48000, 7, use_pallas=False,
                           max_latency_ms=20.0)
    assert fleet.launch_latency_ms <= 20.0
    q = fleet.bspec.in_per_launch
    frames = _random_frames(S, q, C, seed=11)
    for s in range(S):
        fleet.push(s, frames[s])
    assert fleet.poll() == 1
    for s in range(S):
        assert fleet.pending(s) == fleet.bspec.out_per_launch


def test_multifleet_low_latency():
    """MultiFleet forwards the hard budget to every bucket's fleet."""
    from speex_resampler_tpu.runtime.multifleet import MultiFleet
    mf = MultiFleet(1, capacity_per_bucket=4, use_pallas=False,
                    max_latency_ms=20.0)
    mf.add_stream("a", 44100, 48000, 7)
    mf.add_stream("b", 24000, 48000, 5)
    for b in mf._buckets.values():
        assert b.fleet.launch_latency_ms <= 20.0


def test_permissive_budget_never_inflates_quantum():
    """A cap looser than the chosen geometry must be a no-op: same
    quantum as the uncapped engine (a cap may only ever shrink)."""
    plain = BatchedResampler(2, 1, 44100, 48000, 7, use_pallas=False,
                             target_chunk_frames=882)
    capped = BatchedResampler(2, 1, 44100, 48000, 7, use_pallas=False,
                              target_chunk_frames=882,
                              max_latency_ms=1000.0)
    assert capped.in_frames_per_launch == plain.in_frames_per_launch


def test_budget_holds_when_pallas_sizes_reject(monkeypatch):
    """The cap must hold even when the Pallas size gates reject every
    kernel downstream of the pre-check (the former fall-through reached
    an UNCAPPED dense geometry)."""
    import speex_resampler_tpu.parallel.batch as bm
    monkeypatch.setattr(bm, "_MAX_TILED_WEIGHT_BYTES", 0)
    monkeypatch.setattr(bm, "_MAX_STREAMED_WEIGHT_BYTES", 0)
    eng = BatchedResampler(2, 1, 44100, 48000, 7, use_pallas=True,
                           pallas_interpret=True, max_latency_ms=20.0)
    assert eng.bspec.kernel == "dense"
    assert eng.launch_latency_ms <= 20.0


def test_quantized_budget_keeps_family_and_cap():
    """A cap between one and two tiled periods floor-quantizes within the
    tiled family instead of falling to dense."""
    eng = BatchedResampler(2, 1, 44100, 48000, 7, use_pallas=True,
                           pallas_interpret=True,
                           target_chunk_frames=9408, max_latency_ms=80.0)
    assert eng.bspec.kernel == "tiled"
    assert eng.launch_latency_ms <= 80.0


def test_latency_cap_huge_den_dense_fallback_routes_to_gather():
    """A spec whose uncapped geometry is streamed (per-phase weights fit)
    but whose quantum unit S exceeds the cap must NOT fall through to a
    dense geometry whose padded L x group*den matrix busts
    MAX_PADDED_WEIGHT_BYTES (hundreds of MB for huge den) — the capped
    path re-applies the cap at the capped group and routes to the
    weight-free gather geometry, like the uncapped path would."""
    from speex_resampler_tpu.ops import filter_design as fd
    from speex_resampler_tpu.parallel.batch import _launch_geometry

    spec = fd.design_filter(513, 16384, 0)
    un = _launch_geometry(spec, 4096, use_pallas=True)
    assert un.kernel in ("tiled", "streamed")
    capped = _launch_geometry(spec, 4096, use_pallas=True,
                              max_in_frames=1000)
    assert capped.kernel == "gather", capped.kernel
    assert capped.n_blocks * spec.num <= 1000


def test_fuzz_latency_caps_random_configs():
    """Seeded sweep: for random (ratio, quality, cap) draws the capped
    engine must (a) keep its quantum under the cap or refuse cleanly when
    one period can't fit, and (b) match the uncapped engine to <= 1 LSB
    (a different launch quantum reshapes the dense matmul, so XLA may
    regroup the f32 accumulation — rounding-boundary ties only; see
    tests/test_batch.py module docstring) — hardening the round-3
    geometry wrapper beyond the hand-picked configs."""
    import math
    from conftest import assert_lsb_close

    rates = [8000, 11025, 16000, 22050, 24000, 32000, 44100, 48000]
    rng = np.random.default_rng(404)
    checked = 0
    while checked < 8:
        ir, orr = (int(r) for r in rng.choice(rates, size=2, replace=False))
        q = int(rng.integers(0, 11))
        cap_ms = float(rng.choice([5.0, 20.0, 60.0, 250.0]))
        num = ir // math.gcd(ir, orr)
        try:
            capped = BatchedResampler(2, 1, ir, orr, q, use_pallas=False,
                                      max_latency_ms=cap_ms)
        except ResamplerError:
            # legal only when one num-period exceeds the cap
            assert num > cap_ms * ir / 1000, (ir, orr, q, cap_ms)
            continue
        assert capped.launch_latency_ms <= cap_ms + 1e-9, (
            ir, orr, q, cap_ms, capped.launch_latency_ms)
        assert capped.in_frames_per_launch % num == 0
        plain = BatchedResampler(2, 1, ir, orr, q, use_pallas=False)
        frames = _random_frames(2, 9000, 1, seed=checked)
        a = np.concatenate([capped.process(frames), capped.flush()], axis=1)
        b = np.concatenate([plain.process(frames), plain.flush()], axis=1)
        assert_lsb_close(a, b)
        checked += 1
