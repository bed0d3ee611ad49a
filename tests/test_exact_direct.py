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


@pytest.mark.parametrize("in_rate,out_rate,quality,chunk", [
    (44100, 48000, 7, 1000),    # interpolated, streamed
    (24000, 48000, 5, 733),     # direct, streamed
    (44100, 48000, 10, 1000),   # double-accumulator, streamed
])
def test_exact_streaming_mode(oracle, fixture_pcm, tmp_path, in_rate,
                              out_rate, quality, chunk):
    """SpeexResampler(exact=True): the order-faithful hot loops serving
    through the normal STATEFUL pipeline (history carry, JS capacity
    rule) — chunked output is bit-identical to the chunked oracle."""
    from speex_resampler_tpu import SpeexResampler
    name = ("44100hz_test.pcm" if in_rate == 44100
            else "24000hz_test.pcm")
    pcm = fixture_pcm[name][:in_rate * 2 * 2]  # 1 s stereo
    golden = oracle_process(oracle, tmp_path, pcm, 2, in_rate, out_rate,
                            quality, chunk_frames=chunk)
    r = SpeexResampler(2, in_rate, out_rate, quality, exact=True)
    outs = []
    step = chunk * 4
    for pos in range(0, len(pcm), step):
        outs.append(r.process_chunk(pcm[pos:pos + step]))
    got = np.frombuffer(b"".join(outs), dtype=np.int16)
    assert got.shape == golden.shape
    assert np.array_equal(got, golden)


def test_exact_mode_rejects_fixed_combo():
    from speex_resampler_tpu.core.resampler import ResamplerCore
    with pytest.raises(Exception):
        ResamplerCore(1, 1, 1, 44100, 48000, 7, fixed_point=True,
                      exact=True)
