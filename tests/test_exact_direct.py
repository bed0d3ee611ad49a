"""Zero-mismatch golden tests for the order-faithful direct path.

A strictly stronger claim than the <=1 LSB tie bound used elsewhere: with
the C accumulation order reproduced exactly (ops/fir_exact.py), the output
must be BIT-IDENTICAL to the compiled reference oracle on every direct-path
row of the reference test matrix (24k->48k and 24k->24k,
src/test.ts:14-22)."""

import numpy as np
import pytest

from speex_resampler_tpu.ops import fir_exact

from conftest import oracle_process


@pytest.mark.parametrize("fixture,channels,in_rate,out_rate,quality", [
    ("24000hz_mono_test.pcm", 1, 24000, 48000, 5),
    ("24000hz_test.pcm", 2, 24000, 24000, 5),
    ("24000hz_test.pcm", 2, 24000, 48000, 10),  # double-accumulator path
])
def test_direct_path_bit_identical(oracle, fixture_pcm, tmp_path, fixture,
                                   channels, in_rate, out_rate, quality):
    pcm = np.frombuffer(fixture_pcm[fixture], dtype="<i2")
    frames = pcm.reshape(-1, channels)
    golden = oracle_process(oracle, tmp_path, frames.tobytes(), channels,
                            in_rate, out_rate, quality)
    got = fir_exact.resample_direct_exact(frames, in_rate, out_rate,
                                          quality).ravel()
    m = min(got.shape[0], golden.shape[0])
    assert abs(got.shape[0] - golden.shape[0]) <= channels
    assert np.array_equal(got[:m], golden[:m]), \
        f"{np.sum(got[:m] != golden[:m])} mismatches"


@pytest.mark.parametrize("fixture,channels,in_rate,out_rate,quality", [
    ("44100hz_test.pcm", 2, 44100, 48000, 7),    # interpolate_single
    ("44100hz_test.pcm", 2, 44100, 48000, 1),    # q1 kaiser6
    ("44100hz_test.pcm", 2, 44100, 24000, 5),    # decimating interpolate
    ("44100hz_test.pcm", 2, 44100, 48000, 10),   # interpolate_double
    ("44100hz_test.pcm", 2, 48000, 44100, 10),   # inverse double
])
def test_interpolated_path_bit_identical(oracle, fixture_pcm, tmp_path,
                                         fixture, channels, in_rate,
                                         out_rate, quality):
    """Round 2: the order-faithful mode covers the INTERPOLATED hot loops
    too (resample.c:438-559) — so EVERY reference config is reproducible
    BIT-IDENTICALLY, with zero tolerated mismatches.  1 s slices keep the
    serial-order host loops fast."""
    pcm = np.frombuffer(fixture_pcm[fixture],
                        dtype="<i2")[:in_rate * channels]
    frames = pcm.reshape(-1, channels)
    golden = oracle_process(oracle, tmp_path, frames.tobytes(), channels,
                            in_rate, out_rate, quality)
    got = fir_exact.resample_exact(frames, in_rate, out_rate,
                                   quality).ravel()
    m = min(got.shape[0], golden.shape[0])
    assert abs(got.shape[0] - golden.shape[0]) <= channels
    assert np.array_equal(got[:m], golden[:m]), \
        f"{np.sum(got[:m] != golden[:m])} mismatches"
