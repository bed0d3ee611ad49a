"""Backpressure / bounded host memory for the serving engines.

The reference's streaming surface is a Node Transform
(src/index.ts:121-162): it inherits stream backpressure — a slow consumer
pauses the producer through the callback/highWaterMark machinery.  The
fleet engines' explicit analog (round-4): per-stream ``max_staged_frames``
(push raises ALLOC_FAILED past it; ``writable()`` is the pause signal) and
``max_banked_frames`` (``poll()`` stops launching while a stream's banked
output sits at the watermark).  The invariant under a push-only /
never-pull workload: staged <= max_staged, banked <= max_banked +
pipeline-depth * out_per_launch — memory bounded by config, forever.
"""

import numpy as np
import pytest

from speex_resampler_tpu.runtime.fleet import FleetResampler
from speex_resampler_tpu.runtime.multifleet import MultiFleet
from speex_resampler_tpu.utils.errors import (ResamplerError,
                                              ResamplerErrorCode)

S, C = 4, 2
RATES = (24000, 48000, 5)   # num=1, den=2: small dense quantum


def _fleet(**kw):
    return FleetResampler(S, C, *RATES, target_chunk_frames=256,
                          use_pallas=False, **kw)


def _frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(-32768, 32768, size=(n, C)) // 2).astype(np.int16)


def test_constructor_validation():
    with pytest.raises(ResamplerError) as e:
        _fleet(max_staged_frames=0)
    assert e.value.code == ResamplerErrorCode.INVALID_ARG
    with pytest.raises(ResamplerError):
        _fleet(max_banked_frames=-1)
    # a staging watermark below the launch quantum can never reach
    # lockstep readiness: config error
    q = _fleet().bspec.in_per_launch
    with pytest.raises(ResamplerError) as e:
        _fleet(max_staged_frames=q - 1)
    assert e.value.code == ResamplerErrorCode.INVALID_ARG


def test_push_only_never_pull_stays_bounded():
    """The round-3 incident scenario: a consumer that polls but never
    pulls.  Memory must stay bounded by the watermarks no matter how much
    the producer offers."""
    q = _fleet().bspec.in_per_launch
    fleet = _fleet(max_staged_frames=4 * q, max_banked_frames=3 * q)
    out_q = fleet.bspec.out_per_launch
    chunk = _frames(q)
    rejections = 0
    for _ in range(64):  # far more input than the bounds can hold
        for s in range(S):
            try:
                fleet.push(s, chunk)
            except ResamplerError as e:
                assert e.code == ResamplerErrorCode.ALLOC_FAILED
                rejections += 1
        fleet.poll()
        # the bound, every iteration: staged and banked never exceed
        # watermark (+ pipeline_depth in-flight launches for banked;
        # default depth 2)
        for s in range(S):
            assert fleet.staged()[s] <= 4 * q
            assert fleet.pending(s) <= 3 * q + 2 * out_q
    assert rejections > 0, "producer was never paused"
    # consumer wakes up: pulling drains the bank, poll resumes, pushes
    # are accepted again
    for s in range(S):
        assert fleet.pull(s).shape[0] > 0
    assert fleet.poll() > 0
    for s in range(S):
        assert fleet.writable(s) or fleet.staged()[s] >= 4 * q
    fleet.pull(0)
    fleet.push(0, chunk[:1])  # does not raise


def test_writable_signal_and_push_bytes():
    q = _fleet().bspec.in_per_launch
    fleet = _fleet(max_staged_frames=q)
    assert fleet.writable(0)
    fleet.push(0, _frames(q))
    assert not fleet.writable(0)
    with pytest.raises(ResamplerError):
        fleet.push(0, _frames(1))
    # push_bytes counts whole frames incl. the alignment carry
    fleet.push_bytes(1, _frames(q).tobytes()[:-1])  # q-1 frames + carry
    assert fleet.writable(1)
    with pytest.raises(ResamplerError):
        fleet.push_bytes(1, _frames(2).tobytes())  # carry completes 2 more
    fleet.push_bytes(1, b"\x00")  # completes exactly frame q: accepted
    assert not fleet.writable(1)


def test_outputs_identical_with_and_without_watermarks():
    """Backpressure must never change WHAT is produced, only when."""
    q = _fleet().bspec.in_per_launch
    a = _fleet()
    b = _fleet(max_staged_frames=2 * q, max_banked_frames=q)
    data = _frames(6 * q, seed=3)
    for s in range(S):
        a.push(s, data)
    a.poll()
    got_a = [a.pull(s) for s in range(S)]
    got_b = [[] for _ in range(S)]
    i = 0
    while i < 6 * q or any(b.staged()[s] for s in range(S)):
        n = min(q // 2, 6 * q - i)
        if n:
            for s in range(S):
                while not b.writable(s):
                    b.poll()
                    got_b[s].append(b.pull(s))
                b.push(s, data[i:i + n])
            i += n
        b.poll()
        for s in range(S):
            got_b[s].append(b.pull(s))
    for s in range(S):
        np.testing.assert_array_equal(got_a[s],
                                      np.concatenate(got_b[s], axis=0))


def test_multifleet_watermarks():
    mf = MultiFleet(channels=C, capacity_per_bucket=4,
                    target_chunk_frames=256, use_pallas=False,
                    max_staged_frames=600, max_banked_frames=600)
    mf.add_stream("a", *RATES)
    mf.add_stream("b", 44100, 48000, 7)
    q = mf._buckets[RATES].fleet.bspec.in_per_launch
    chunk = _frames(q)
    raised = False
    for _ in range(32):
        for sid in ("a", "b"):
            try:
                mf.push(sid, chunk)
            except ResamplerError as e:
                assert e.code == ResamplerErrorCode.ALLOC_FAILED
                raised = True
        mf.poll()
    assert raised
    assert not mf.writable("a") or mf.writable("a")  # no crash either way
    # pulling reopens the pipeline
    assert mf.pull("a").shape[0] > 0
    mf.poll()
    total = mf.pull("a").shape[0]
    assert total >= 0
