"""Extended golden matrix: ratio/quality classes beyond the reference's
7-config harness (src/test.ts:14-22), asserted against the compiled oracle
on random program material.

Covers: telephony rates, extreme up/down ratios (oversample halving,
resample.c:627-634), coprime "ugly" ratios, identity, and the full quality
range — one-shot and streamed.
"""

import numpy as np
import pytest

from speex_resampler_tpu.core.resampler import ResamplerCore

from conftest import assert_lsb_close, oracle_process

MATRIX = [
    # (in_rate, out_rate, channels, quality)
    (8000, 48000, 1, 2),       # 1/6 upsample, low quality
    (48000, 8000, 1, 4),       # 6/1 downsample (oversample halves twice)
    (8000, 16000, 2, 0),       # minimum quality
    (22050, 44100, 2, 6),      # exact doubling
    (44100, 22050, 1, 9),      # exact halving, kaiser12
    (48000, 44100, 2, 10),     # inverse flagship at max quality
    (11025, 48000, 1, 7),      # 147/640
    (48000, 11025, 1, 3),      # 640/147 heavy decimation
    (32000, 44100, 2, 8),      # 160/441
    (44100, 44101, 1, 5),      # pathological coprime (gather fallback)
]


def _random_pcm(n_frames, channels, seed):
    rng = np.random.default_rng(seed)
    return (rng.integers(-32768, 32768, size=(n_frames, channels)) // 2
            ).astype(np.int16)


@pytest.mark.parametrize("in_rate,out_rate,channels,quality", MATRIX)
def test_extended_golden_one_shot(oracle, tmp_path, in_rate, out_rate,
                                  channels, quality):
    n = 40_000 if max(in_rate, out_rate) // min(in_rate, out_rate) < 4 \
        else 12_000
    frames = _random_pcm(n, channels, seed=quality * 7 + channels)
    pcm = frames.astype("<i2").tobytes()
    golden = oracle_process(oracle, tmp_path, pcm, channels, in_rate,
                            out_rate, quality)
    core = ResamplerCore(channels, in_rate, out_rate, in_rate, out_rate,
                         quality)
    cap = len(golden) // channels + 16
    got = core.process_interleaved(frames, cap).ravel()
    m = min(len(got), len(golden))
    assert abs(len(got) - len(golden)) <= channels
    assert_lsb_close(got[:m], golden[:m])


@pytest.mark.parametrize("in_rate,out_rate,channels,quality",
                         [(8000, 48000, 1, 2), (48000, 8000, 1, 4),
                          (32000, 44100, 2, 8)])
def test_extended_golden_streamed(oracle, tmp_path, in_rate, out_rate,
                                  channels, quality):
    """20 ms chunks with state carried across chunks (the JS wrapper loop)."""
    chunk = in_rate // 50
    frames = _random_pcm(8 * chunk, channels, seed=3)
    pcm = frames.astype("<i2").tobytes()
    golden = oracle_process(oracle, tmp_path, pcm, channels, in_rate,
                            out_rate, quality, chunk_frames=chunk)
    core = ResamplerCore(channels, in_rate, out_rate, in_rate, out_rate,
                         quality)
    outs = []
    for pos in range(0, len(frames), chunk):
        piece = frames[pos:pos + chunk]
        # the JS wrapper capacity rule (src/index.ts:80)
        cap_bytes = -(-piece.shape[0] * channels * 2 * out_rate // in_rate)
        cap = cap_bytes // channels // 2
        outs.append(core.process_interleaved(piece, cap))
    got = np.concatenate(outs).ravel()
    m = min(len(got), len(golden))
    assert abs(len(got) - len(golden)) <= 2 * channels
    assert_lsb_close(got[:m], golden[:m])
