"""Golden-output parity vs the reference (one-shot path).

Ports the reference integration matrix (src/test.ts:14-22) and its duration
invariant (:38-40), and adds the golden-exactness assertions the reference
lacks (SURVEY.md §4): outputs must match the natively-compiled reference
core within 1 LSB, with identical lengths.

Full 10-18 s fixtures are exercised for the default config; the rest of the
matrix runs on 2 s slices to keep CPU-mode compile times in check (values
are position-invariant, so slices lose no coverage).
"""

import numpy as np
import pytest

from speex_resampler_tpu import SpeexResampler

from conftest import AUDIO_TESTS, assert_lsb_close, oracle_process


def _run_config(oracle, fixture_pcm, tmp_path, name, in_rate, out_rate,
                channels, quality, seconds=None, engine="auto"):
    pcm = fixture_pcm[name]
    if seconds is not None:
        pcm = pcm[:seconds * in_rate * channels * 2]
    golden = oracle_process(oracle, tmp_path, pcm, channels, in_rate,
                            out_rate, quality)
    r = SpeexResampler(channels, in_rate, out_rate, quality, engine=engine)
    out = np.frombuffer(r.process_chunk(pcm), dtype=np.int16)
    if engine != "device" and channels <= 8:
        # the auto default routes small cores to the order-faithful host
        # loops: golden parity is BIT-EXACT there, not just <=1 LSB
        assert np.array_equal(out, golden)
    else:
        assert_lsb_close(out, golden)

    # duration invariant from src/test.ts:38-40
    in_dur = len(pcm) / in_rate / 2 / channels
    out_dur = len(out) * 2 / out_rate / 2 / channels
    assert abs(in_dur - out_dur) < 0.01


@pytest.mark.parametrize("engine", ["auto", "device"])
@pytest.mark.parametrize("name,in_rate,out_rate,channels,quality",
                         AUDIO_TESTS)
def test_reference_matrix_2s(oracle, fixture_pcm, tmp_path, name, in_rate,
                             out_rate, channels, quality, engine):
    _run_config(oracle, fixture_pcm, tmp_path, name, in_rate, out_rate,
                channels, quality, seconds=2, engine=engine)


def test_default_config_full_fixture(oracle, fixture_pcm, tmp_path):
    """The src/test.ts default row (44.1k→48k stereo q7), full 10 s file."""
    _run_config(oracle, fixture_pcm, tmp_path, "44100hz_test.pcm", 44100,
                48000, 2, 7)


def test_quality_zero(oracle, fixture_pcm, tmp_path):
    """Q0 is legal in the C core (speex_resampler.h:99) though the JS docs
    say 1-10; cover it."""
    _run_config(oracle, fixture_pcm, tmp_path, "24000hz_mono_test.pcm",
                24000, 48000, 1, 0, seconds=2)


def test_gather_fallback_path(oracle, fixture_pcm, tmp_path):
    """Near-prime ratio (huge reduced den) takes the gather fallback
    (pinned to the device engine: the auto default would route one
    channel to the host loops and never reach the gather kernel)."""
    _run_config(oracle, fixture_pcm, tmp_path, "24000hz_mono_test.pcm",
                24000, 31997, 1, 3, seconds=1, engine="device")


def test_extreme_downsample(oracle, fixture_pcm, tmp_path):
    """>4x decimation exercises the oversample-halving branches
    (resample.c:626-635)."""
    _run_config(oracle, fixture_pcm, tmp_path, "44100hz_test.pcm", 44100,
                8000, 2, 4, seconds=2)


def test_skip_zeros(oracle, fixture_pcm, tmp_path):
    """skip_zeros (resample.c:1200-1206) swallows the leading filter delay."""
    pcm = fixture_pcm["24000hz_mono_test.pcm"][:2 * 24000 * 2]
    golden = oracle_process(oracle, tmp_path, pcm, 1, 24000, 48000, 5,
                            skip_zeros=True)
    r = SpeexResampler(1, 24000, 48000, 5)
    r.skip_zeros()
    out = np.frombuffer(r.process_chunk(pcm), dtype=np.int16)
    assert_lsb_close(out, golden)
