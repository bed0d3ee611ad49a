"""Float-sample path (speex_resampler_process_float) and stride parity.

The float build's float API takes/returns f32 samples on the ±32768 scale
with no WORD2INT on output (resample.c:924-963, :1037-1059).  Goldens come
from the oracle's ``processf`` command.
"""

import subprocess

import numpy as np
import pytest

from speex_resampler_tpu.core.resampler import ResamplerCore

from conftest import AUDIO_TESTS, assert_lsb_close


def _oracle_processf(oracle, tmp_path, samples, channels, in_rate, out_rate,
                     quality, chunk_frames=0):
    inp = tmp_path / "in.f32"
    outp = tmp_path / "out.f32"
    np.ascontiguousarray(samples, dtype="<f4").tofile(inp)
    subprocess.run(
        [str(oracle), "processf", str(channels), str(in_rate),
         str(out_rate), str(quality), str(chunk_frames), str(inp),
         str(outp)], check=True)
    return np.fromfile(outp, dtype="<f4").reshape(-1, channels)


@pytest.mark.parametrize("name,in_rate,out_rate,channels,quality",
                         AUDIO_TESTS[:4])
def test_float_path_matches_oracle(oracle, fixture_pcm, tmp_path, name,
                                   in_rate, out_rate, channels, quality):
    pcm = np.frombuffer(fixture_pcm[name][:400_000], dtype="<i2")
    x = pcm.astype(np.float32).reshape(-1, channels)

    golden = _oracle_processf(oracle, tmp_path, x, channels, in_rate,
                              out_rate, quality)
    core = ResamplerCore(channels, in_rate, out_rate, in_rate, out_rate,
                         quality)
    got = core.process_interleaved_float(x, golden.shape[0] + 16)
    m = min(got.shape[0], golden.shape[0])
    assert abs(got.shape[0] - golden.shape[0]) <= 1
    d = np.abs(got[:m] - golden[:m])
    # raw float outputs: accumulation-order error, far below 0.5 LSB of s16
    # (q>8 configs use the reference's double accumulators, hence the slack)
    assert d.max() <= 0.1, d.max()
    # and the rounded s16 view stays within the 1 LSB contract
    def w2i(v):
        y = np.floor(0.5 + v.astype(np.float64))
        return np.clip(y, -32768, 32767).astype(np.int16)
    assert_lsb_close(w2i(got[:m]).ravel(), w2i(golden[:m]).ravel())


def test_float_path_streaming_matches_one_shot():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((9000, 2)) * 8000).astype(np.float32)
    a = ResamplerCore(2, 44100, 48000, 44100, 48000, 7)
    one = a.process_interleaved_float(x, 10**9)
    b = ResamplerCore(2, 44100, 48000, 44100, 48000, 7)
    outs, pos = [], 0
    while pos < len(x):
        n = int(rng.integers(50, 700))
        outs.append(b.process_interleaved_float(x[pos:pos + n], 10**9))
        pos += n
    chunked = np.concatenate(outs)
    m = min(len(one), len(chunked))
    # f32 reassociation across different chunkings; ~0.1 absolute on the
    # ±32768 scale is ~0.003 LSB of s16
    assert np.allclose(one[:m], chunked[:m], atol=0.1, rtol=0)


def test_float_and_int_paths_agree():
    """Int path == float path + WORD2INT when fed identical sample values."""
    rng = np.random.default_rng(1)
    xi = (rng.integers(-16000, 16000, size=(6000, 1))).astype(np.int16)
    a = ResamplerCore(1, 24000, 48000, 24000, 48000, 5)
    yi = a.process_interleaved(xi, 10**9)
    b = ResamplerCore(1, 24000, 48000, 24000, 48000, 5)
    yf = b.process_interleaved_float(xi.astype(np.float32), 10**9)
    y = np.floor(0.5 + yf.astype(np.float64))
    y = np.clip(y, -32768, 32767).astype(np.int16)
    m = min(len(yi), len(y))
    assert_lsb_close(yi[:m].ravel(), y[:m].ravel())


def test_strides():
    """in_stride reads every k-th sample; out_stride scatters every k-th."""
    rng = np.random.default_rng(2)
    dense = rng.integers(-20000, 20000, size=4000).astype(np.int16)
    k = 3
    strided = np.zeros(len(dense) * k, dtype=np.int16)
    strided[::k] = dense

    a = ResamplerCore(1, 24000, 48000, 24000, 48000, 5)
    ya = a.process_channel(0, dense, 10**9)

    b = ResamplerCore(1, 24000, 48000, 24000, 48000, 5)
    b.set_input_stride(k)
    b.set_output_stride(2)
    assert b.get_input_stride() == k and b.get_output_stride() == 2
    yb = b.process_channel(0, strided, 10**9)
    assert np.array_equal(yb[::2], ya)
    assert not yb[1::2].any()


def test_destroy():
    core = ResamplerCore(1, 24000, 48000, 24000, 48000, 5)
    core.process_channel(0, np.zeros(100, dtype=np.int16), 10**9)
    core.destroy()
    assert core.initialised is False
