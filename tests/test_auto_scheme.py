"""The PRODUCTION scheme="auto" resolution path, exercised in CI.

On the real TPU, engine construction with scheme="auto" (the default)
resolves the matmul precision scheme via the digit-escalating certificate:
int8 D=3 when the worst-case bound clears the gate, else int8 D=4, else
split5 (the SSE/NEON auto-dispatch role, resample.c:99-105).  Under
interpret mode auto normally short-circuits to "highest" (CPU bf16/int8
matmuls are emulated and slow), which used to leave the escalation logic
untested through engine construction; AUTO_RESOLVE_UNDER_INTERPRET runs
the real resolution off-TPU.

Numeric correctness of each resolved scheme is pinned elsewhere
(test_batch.py int8/split5/int8x4 tests); these tests pin the RESOLUTION:
which scheme and digit count production engine construction picks.

Certificate facts pinned here (measured, ops/int8_planes.decompose):
  44100->48000 q7  tiled    D=3 cert 0.165  -> int8, 3 digits
  48000->44100 q10 streamed D=3 cert 0.309, D=4 cert 0.017 -> int8, 4
  96000->8000  q10 tiled    cert inf at D=3 AND D=4        -> split5
"""

import numpy as np
import pytest

from speex_resampler_tpu.parallel import batch as batch_mod
from speex_resampler_tpu.parallel.batch import BatchedResampler

from conftest import assert_lsb_close


@pytest.fixture
def auto_resolves():
    old = batch_mod.AUTO_RESOLVE_UNDER_INTERPRET
    batch_mod.AUTO_RESOLVE_UNDER_INTERPRET = True
    yield
    batch_mod.AUTO_RESOLVE_UNDER_INTERPRET = old


def _random_frames(S, n, C, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(-32768, 32768, size=(S, n, C)) // 2).astype(
        np.int16)


def _digits(step):
    """Digit-plane count D of a resolved int8 step's weight operand."""
    planes = step.w[0]
    assert planes.ndim == 4, planes.shape
    # tiled: [D, P, K, R]; streamed: [P, D, R, K] — D is the small axis
    return min(planes.shape[0], planes.shape[1])


def test_auto_flagship_resolves_int8_d3(auto_resolves):
    """Flagship tiled config: auto -> int8 with 3 digit planes, and the
    auto-constructed engine holds the oracle-pinned LSB bound."""
    S, C = 2, 1
    eng = BatchedResampler(S, C, 44100, 48000, 7, use_pallas=True,
                           pallas_interpret=True)  # scheme defaults "auto"
    assert eng.bspec.kernel == "tiled"
    assert eng._step.scheme == "int8"
    assert _digits(eng._step) == 3

    frames = _random_frames(S, 5000, C, seed=51)
    ref_eng = BatchedResampler(S, C, 44100, 48000, 7, use_pallas=False)
    ref = np.concatenate([ref_eng.process(frames), ref_eng.flush()], axis=1)
    got = np.concatenate([eng.process(frames), eng.flush()], axis=1)
    assert got.shape == ref.shape
    assert_lsb_close(got.ravel(), ref.ravel())


def test_auto_q10_escalates_to_d4(auto_resolves):
    """Long-filter streamed config (48k->44.1k q10): the D=3 certificate
    (0.309) fails the 0.20 gate; auto escalates to 4 digits.
    (Construction-only: int8 streamed numerics are pinned by
    test_batched_int8x4_long_filters_interpret.)"""
    eng = BatchedResampler(2, 1, 48000, 44100, 10, use_pallas=True,
                           pallas_interpret=True)
    assert eng.bspec.kernel == "streamed"
    assert eng._step.scheme == "int8"
    assert _digits(eng._step) == 4


def test_auto_uncertifiable_falls_to_split5(auto_resolves):
    """12:1 decimation at q10: the scaled filter's dynamic range defeats
    the certificate at every digit count (inf at D=3 and D=4); auto must
    refuse int8 and fall to split5 — never silently risk the LSB bound.
    (Construction-only: split5 numerics are pinned by the split5 tests.)"""
    eng = BatchedResampler(2, 1, 96000, 8000, 10, use_pallas=True,
                           pallas_interpret=True)
    assert eng._step.scheme == "split5"


def test_auto_interpret_default_still_highest():
    """Without the override the interpret-mode default stays 'highest'
    (fast CI) — the flag must not leak."""
    eng = BatchedResampler(2, 1, 44100, 48000, 7, use_pallas=True,
                           pallas_interpret=True)
    assert eng._step.scheme == "highest"
