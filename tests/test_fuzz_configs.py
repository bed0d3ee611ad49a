"""Differential fuzzing vs the compiled oracles + config-flag parity.

Seeded random (rate-pair, quality, channels, chunk-schedule) draws are run
through BOTH numeric universes and compared against the respective oracle:
float within the 1-LSB tie bound, fixed with zero mismatches.  This sweeps
corner cases the curated matrix misses (odd reduced ratios, q0/q9, tiny
chunks, extreme decimation with oversample halving).

Also covers the RESAMPLE_FULL_SINC_TABLE compile-flag analog
(resample.c:641-644): a third oracle build forces the direct table where
the interpolated one would normally win.
"""

import subprocess

import numpy as np
import pytest

from speex_resampler_tpu.core.resampler import ResamplerCore
from speex_resampler_tpu.ops import filter_design as fd

from conftest import (REFERENCE, REPO, assert_lsb_close, oracle_process,
                      oracle_tables)

import math

_RATES = [8000, 11025, 16000, 22050, 24000, 32000, 44100, 48000, 88200,
          96000]


def _draw_configs(seed, n):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ir, orr = rng.choice(_RATES, size=2, replace=False)
        q = int(rng.integers(0, 11))
        ch = int(rng.integers(1, 3))
        chunk = int(rng.choice([0, 160, 733, 1024]))
        out.append((int(ir), int(orr), q, ch, chunk))
    return out


def _run_ours(frames, ch, ir, orr, q, chunk, fixed):
    core = ResamplerCore(ch, ir, orr, ir, orr, q, fixed_point=fixed)
    total = len(frames)
    cf = chunk if chunk > 0 else total
    outs, cap_bytes = [], 0
    for pos in range(0, total, cf):
        fr = frames[pos:pos + cf]
        cap_bytes = max(cap_bytes,
                        (len(fr) * ch * 2 * orr + ir - 1) // ir)
        outs.append(core.process_interleaved(fr, cap_bytes // ch // 2))
    return np.concatenate(outs)


@pytest.mark.parametrize("ir,orr,q,ch,chunk", _draw_configs(2024, 10))
def test_fuzz_float_vs_oracle(oracle, tmp_path, ir, orr, q, ch, chunk):
    rng = np.random.default_rng(ir * 7 + orr + q)
    n = min(int(0.6 * ir), 28000)
    frames = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    golden = oracle_process(oracle, tmp_path, frames.tobytes(), ch, ir,
                            orr, q, chunk_frames=chunk)
    ours = _run_ours(frames, ch, ir, orr, q, chunk, fixed=False)
    assert ours.size == golden.size
    assert_lsb_close(ours.reshape(-1), golden)


@pytest.mark.parametrize("ir,orr,q,ch,chunk", _draw_configs(777, 10))
def test_fuzz_fixed_vs_oracle(oracle_fixed, tmp_path, ir, orr, q, ch,
                              chunk):
    rng = np.random.default_rng(ir + orr * 3 + q)
    n = min(int(0.6 * ir), 28000)
    frames = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    golden = oracle_process(oracle_fixed, tmp_path, frames.tobytes(), ch,
                            ir, orr, q, chunk_frames=chunk)
    ours = _run_ours(frames, ch, ir, orr, q, chunk, fixed=True)
    assert np.array_equal(ours.reshape(-1), golden)


# ---------------------------------------------------------------------------
# RESAMPLE_FULL_SINC_TABLE
# ---------------------------------------------------------------------------

@pytest.fixture(scope="session")
def oracle_fullsinc():
    exe = REPO / "build" / "oracle_fullsinc"
    src = REPO / "tests" / "oracle" / "oracle.c"
    exe.parent.mkdir(exist_ok=True)
    if not (exe.exists() and exe.stat().st_mtime > src.stat().st_mtime):
        subprocess.run(
            ["gcc", "-O2", "-DFLOATING_POINT", "-DOUTSIDE_SPEEX",
             "-DRESAMPLE_FULL_SINC_TABLE", f"-I{REFERENCE}/deps/speex",
             str(src), "-lm", "-o", str(exe)], check=True)
    return exe


def test_full_sinc_table_flag(oracle_fullsinc, tmp_path):
    """full_sinc_table=True matches the reference compiled with
    -DRESAMPLE_FULL_SINC_TABLE: direct table forced on a config that would
    normally interpolate (44.1k->48k q5), tables bit-identical, output
    within the float tie bound."""
    meta, table = oracle_tables(oracle_fullsinc, 2, 44100, 48000, 5)
    g = math.gcd(44100, 48000)
    spec = fd.design_filter(44100 // g, 48000 // g, 5,
                            full_sinc_table=True)
    assert spec.use_direct and meta["use_direct"] == 1
    assert np.array_equal(spec.sinc_table, table)

    rng = np.random.default_rng(0)
    frames = rng.integers(-32768, 32768, size=(9000, 2)).astype(np.int16)
    golden = oracle_process(oracle_fullsinc, tmp_path, frames.tobytes(),
                            2, 44100, 48000, 5)
    core = ResamplerCore(2, 44100, 48000, 44100, 48000, 5,
                         full_sinc_table=True)
    cap = (len(frames) * 2 * 2 * 48000 + 44099) // 44100 // 4
    ours = core.process_interleaved(frames, cap)
    assert_lsb_close(ours.reshape(-1), golden)


# ---------------------------------------------------------------------------
# Huge reduced denominators (den >= 65537): the SHL32(rem,15) wrap regime
# ---------------------------------------------------------------------------
# In the fixed build's interpolated table math, frac = PDIV32(SHL32(rem,15),
# den) where SHL32 wraps in int32 once den >= 65537 (rem can reach den-1, so
# rem<<15 can land exactly on -2^31).  An int32 |.| in pdiv32 used to wrap
# INT32_MIN back onto itself and flip the C truncating-division sign fixup,
# poisoning one Q15 cubic coefficient roughly every 2*den outputs (advisor
# round-2 finding).  These runs cross that phase (> 2*den outputs would be
# enormous; instead the poisoned phase index is hit well within ~den outputs
# because offsets stride by oversample) and must be zero-mismatch.

@pytest.mark.parametrize("ir,orr,q", [
    (44100, 65537, 7),    # den = 65537 (prime), the advisor reproducer
    (48000, 96001, 7),    # den = 96001
    (44100, 131071, 4),   # den = 131071 (Mersenne prime), low quality
])
def test_fixed_huge_den_vs_oracle(oracle_fixed, tmp_path, ir, orr, q):
    rng = np.random.default_rng(ir ^ orr)
    n = 30000
    frames = rng.integers(-32768, 32768, size=(n, 1)).astype(np.int16)
    golden = oracle_process(oracle_fixed, tmp_path, frames.tobytes(), 1,
                            ir, orr, q)
    ours = _run_ours(frames, 1, ir, orr, q, chunk=0, fixed=True)
    assert np.array_equal(ours.reshape(-1), golden)


def test_float_huge_den_vs_oracle(oracle, tmp_path):
    """Float universe sanity on the same wrap-regime ratio (the float table
    math never takes pdiv32, but the offset/rem uint32 wrap is shared)."""
    rng = np.random.default_rng(9)
    frames = rng.integers(-32768, 32768, size=(30000, 1)).astype(np.int16)
    golden = oracle_process(oracle, tmp_path, frames.tobytes(), 1,
                            44100, 65537, 7)
    ours = _run_ours(frames, 1, 44100, 65537, 7, chunk=0, fixed=False)
    assert ours.size == golden.size
    assert_lsb_close(ours.reshape(-1), golden)
