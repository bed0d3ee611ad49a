"""Mid-stream reconfiguration parity: set_rate / set_quality while a stream
is live must migrate filter memory exactly like update_filter's
magic-sample machinery (resample.c:727-782, :904-922, :1107-1163)."""

import subprocess

import numpy as np
import pytest

from speex_resampler_tpu import SpeexResampler

from conftest import assert_lsb_close


def _oracle_setrate(oracle, tmp_path, pcm_bytes, channels, cfg0, chunk_frames,
                    switch_chunk, cfg1):
    """Returns (per-chunk counts, concatenated int16 output)."""
    inp = tmp_path / "in.pcm"
    outp = tmp_path / "out.pcm"
    inp.write_bytes(pcm_bytes)
    in0, out0, q0 = cfg0
    in1, out1, q1 = cfg1
    subprocess.run(
        [str(oracle), "setrate", str(channels), str(in0), str(out0), str(q0),
         str(chunk_frames), str(inp), str(outp), str(switch_chunk), str(in1),
         str(out1), str(q1)], check=True)
    raw = outp.read_bytes()
    counts, outs, pos = [], [], 0
    while pos < len(raw):
        n = int(np.frombuffer(raw[pos:pos + 4], dtype=np.uint32)[0])
        pos += 4
        outs.append(np.frombuffer(raw[pos:pos + n * channels * 2],
                                  dtype=np.int16))
        pos += n * channels * 2
        counts.append(n)
    return counts, np.concatenate(outs) if outs else np.zeros(0, np.int16)


def _ours_setrate(fixture_bytes, channels, cfg0, chunk_frames, switch_chunk,
                  cfg1):
    in0, out0, q0 = cfg0
    in1, out1, q1 = cfg1
    r = SpeexResampler(channels, in0, out0, q0)
    fb = channels * 2
    outs = []
    cur_in, cur_out = in0, out0
    for i, pos in enumerate(range(0, len(fixture_bytes), chunk_frames * fb)):
        if i == switch_chunk:
            r.set_rate(in1, out1)
            r.set_quality(q1)
            cur_in, cur_out = in1, out1
        chunk = fixture_bytes[pos:pos + chunk_frames * fb]
        # mimic the oracle's +64-frame capacity slack after reconfig
        frames = len(chunk) // fb
        import math
        cap = (math.ceil(len(chunk) * cur_out / cur_in) // fb) + 64
        x = np.frombuffer(chunk, dtype=np.int16).reshape(-1, channels)
        outs.append(r._core.process_interleaved(x, cap)
                    if r._core is not None else
                    _first(r, x, cap))
    return np.concatenate([o.reshape(-1) for o in outs])


def _first(r, x, cap):
    r._ensure_core()
    return r._core.process_interleaved(x, cap)


CASES = [
    # grow filt_len: quality up mid-stream
    ((24000, 48000, 3), (24000, 48000, 8)),
    # shrink filt_len: quality down mid-stream (magic samples stashed)
    ((24000, 48000, 8), (24000, 48000, 3)),
    # rate change, same quality: samp_frac_num rescaling + new tables
    ((24000, 48000, 5), (24000, 44100, 5)),
    # drastic: downsample -> upsample with quality change
    ((44100, 24000, 7), (44100, 48000, 2)),
]


@pytest.mark.parametrize("cfg0,cfg1", CASES)
def test_midstream_reconfig_matches_oracle(oracle, fixture_pcm, tmp_path,
                                           cfg0, cfg1):
    channels = 1
    pcm = fixture_pcm["24000hz_mono_test.pcm"][:2 * 24000 * 2]
    chunk_frames, switch_chunk = 600, 20
    counts, golden = _oracle_setrate(oracle, tmp_path, pcm, channels, cfg0,
                                     chunk_frames, switch_chunk, cfg1)
    ours = _ours_setrate(pcm, channels, cfg0, chunk_frames, switch_chunk,
                         cfg1)
    n = min(len(ours), len(golden))
    assert abs(len(ours) - len(golden)) <= 2, (len(ours), len(golden))
    assert_lsb_close(ours[:n], golden[:n])


def test_set_rate_noop_keeps_state(fixture_pcm):
    pcm = fixture_pcm["24000hz_mono_test.pcm"][:24000 * 2]
    r1 = SpeexResampler(1, 24000, 48000, 5)
    r2 = SpeexResampler(1, 24000, 48000, 5)
    half = len(pcm) // 2
    half -= half % 2
    a1 = r1.process_chunk(pcm[:half])
    r1.set_rate(24000, 48000)  # no-op (resample.c:1116-1117)
    b1 = r1.process_chunk(pcm[half:])
    a2 = r2.process_chunk(pcm[:half])
    b2 = r2.process_chunk(pcm[half:])
    assert a1 == a2 and b1 == b2


def test_zero_fill_degradation(monkeypatch):
    """resample.c:561-591/:785-791: after a device failure the core keeps
    consuming/producing the exact sample counts but emits zeros."""
    import numpy as np
    from speex_resampler_tpu.core.resampler import ResamplerCore
    from speex_resampler_tpu.ops import fir_matmul as fm

    x = (np.arange(4000, dtype=np.int64) % 251 - 125).astype(
        np.int16).reshape(-1, 1)
    # engine="device": the auto default routes 1-channel cores to the host
    # loops, where the simulated device OOM below could never fire
    ok = ResamplerCore(1, 44100, 48000, 44100, 48000, 7, engine="device")
    expected = ok.process_interleaved(x, 10**9)

    bad = ResamplerCore(1, 44100, 48000, 44100, 48000, 7, engine="device")

    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: simulated OOM")

    monkeypatch.setattr(fm, "resample_conv", boom)
    monkeypatch.setattr(fm, "resample_gather", boom)
    got = bad.process_interleaved(x[:2000], 10**9)
    assert bad.degraded
    assert got.shape[0] == ResamplerCore(
        1, 44100, 48000, 44100, 48000, 7).process_interleaved(
        x[:2000], 10**9).shape[0]
    assert not got.any()
    # still degraded on the next chunk, same counts as the healthy run
    got2 = bad.process_interleaved(x[2000:], 10**9)
    assert not got2.any()
    assert got.shape[0] + got2.shape[0] == expected.shape[0]
