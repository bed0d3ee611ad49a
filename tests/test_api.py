"""API-surface parity with the reference JS/TS layer (src/index.ts) and the
C runtime API (speex_resampler.h), incl. error messages and validation."""

import numpy as np
import pytest

from speex_resampler_tpu import (SpeexResampler, SpeexResamplerTransform,
                                 ResamplerError, ResamplerErrorCode,
                                 strerror, QUALITY_DEFAULT, QUALITY_MAX)

from conftest import assert_lsb_close, oracle_process


def test_alignment_validation():
    """src/index.ts:55-57 — identical message."""
    r = SpeexResampler(2, 44100, 48000)
    with pytest.raises(ValueError,
                       match=r"Chunk length should be a multiple of "
                             r"channels \* 2 bytes"):
        r.process_chunk(b"\x00\x01\x02")


def test_invalid_args_raise_c_error_strings():
    """resample.c:804 arg validation surfaces as the decoded C error string
    (src/index.ts:63-65)."""
    # channels == 0 mirrors the JS NaN-modulus quirk: alignment error wins
    with pytest.raises(ValueError, match="Chunk length"):
        SpeexResampler(0, 44100, 48000).process_chunk(b"")
    for bad in [dict(channels=1, in_rate=0, out_rate=48000),
                dict(channels=1, in_rate=44100, out_rate=0),
                dict(channels=1, in_rate=44100, out_rate=48000, quality=11),
                dict(channels=1, in_rate=44100, out_rate=48000, quality=-1)]:
        r = SpeexResampler(**bad)
        with pytest.raises(ResamplerError, match="Invalid argument."):
            r.process_chunk(b"\x00\x00" * (bad["channels"] or 1))


def test_strerror_messages():
    """resample.c:1222-1239 verbatim."""
    assert strerror(0) == "Success."
    assert strerror(1) == "Memory allocation failed."
    assert strerror(2) == "Bad resampler state."
    assert strerror(3) == "Invalid argument."
    assert strerror(4) == "Input and output buffers overlap."
    assert strerror(99) == ("Unknown error. Bad error code or strange "
                            "version mismatch.")


def test_default_quality_is_7():
    """JS default (src/index.ts:44), not the C QUALITY_DEFAULT of 4."""
    r = SpeexResampler(1, 24000, 48000)
    assert r.quality == 7
    assert QUALITY_DEFAULT == 4  # C constant preserved separately
    assert QUALITY_MAX == 10


def test_init_promise_analog():
    import asyncio
    assert asyncio.run(SpeexResampler.init_promise()) is SpeexResampler
    assert SpeexResampler.wait_ready() is SpeexResampler


def test_rate_and_ratio_getters():
    r = SpeexResampler(2, 44100, 48000, 7)
    r.process_chunk(b"\x00" * (44100 * 4 // 100))
    assert r.get_rate() == (44100, 48000)
    assert r.get_ratio() == (147, 160)
    assert r.get_quality() == 7


def test_latency_getters(oracle):
    from conftest import oracle_tables
    for (ir, orate, q) in [(44100, 48000, 7), (24000, 48000, 5),
                           (44100, 24000, 5), (48000, 44100, 10)]:
        meta, _ = oracle_tables(oracle, 1, ir, orate, q)
        r = SpeexResampler(1, ir, orate, q)
        assert r.get_input_latency() == meta["in_latency"]
        assert r.get_output_latency() == meta["out_latency"]


def test_reset_mem_restarts_stream(fixture_pcm):
    """reset_mem (resample.c:1208-1220): state after reset equals a fresh
    resampler."""
    pcm = fixture_pcm["24000hz_mono_test.pcm"][:24000 * 2]
    r = SpeexResampler(1, 24000, 48000, 5)
    first = r.process_chunk(pcm)
    r.reset_mem()
    again = r.process_chunk(pcm)
    assert first == again


def test_transform_carries_bytes():
    t = SpeexResamplerTransform(2, 24000, 48000, 5)
    out1 = t.transform(b"\x00" * 5)  # 1 frame + 1 carried byte
    assert t._alignment_buffer == b"\x00"
    out2 = t.transform(b"\x00" * 3)  # completes another frame
    assert t._alignment_buffer == b""
    assert t.flush() == b""


def test_zero_fill_null_input_equiv():
    """The C core accepts NULL input meaning 'feed zeros'
    (resample.c:1000-1009); explicit zeros give identical results, which is
    the API we expose."""
    r1 = SpeexResampler(1, 24000, 48000, 5)
    r2 = SpeexResampler(1, 24000, 48000, 5)
    z = b"\x00" * 2000
    assert r1.process_chunk(z) == r2.process_chunk(z)


def test_transform_async(fixture_pcm):
    """atransform/aiter_transform produce exactly the sync outputs."""
    import asyncio
    from speex_resampler_tpu import SpeexResamplerTransform

    pcm = fixture_pcm["24000hz_mono_test.pcm"][:100_001]  # odd byte count
    pieces = [pcm[i:i + 8191] for i in range(0, len(pcm), 8191)]

    sync_t = SpeexResamplerTransform(1, 24000, 48000, 5)
    want = b"".join(sync_t.transform(p) for p in pieces)

    async def run():
        t = SpeexResamplerTransform(1, 24000, 48000, 5)

        async def gen():
            for p in pieces:
                yield p

        outs = []
        async for out in t.aiter_transform(gen()):
            outs.append(out)
        return b"".join(outs)

    got = asyncio.run(run())
    assert got == want


def test_capacity_grows_monotonically_like_js(oracle, tmp_path):
    """The JS wrapper's retained output buffer only grows
    (src/index.ts:80-87), so a 1-frame chunk after a large one may emit 2
    frames at an upsampling ratio; per-chunk ceil capacity would clamp it
    to 1 and drop input where the JS would not.  Golden: the oracle's
    'chunks' mode replicating the JS loop for the same schedule."""
    rng = np.random.default_rng(3)
    n = 1300
    pcm = (rng.integers(-32768, 32768, size=n) // 2).astype("<i2")
    schedule = [1000] + [1] * (n - 1000)

    r = SpeexResampler(1, 44100, 48000, 7)
    parts = []
    pos = 0
    for c in schedule:
        parts.append(r.process_chunk(pcm[pos:pos + c].tobytes()))
        pos += c
    got = np.frombuffer(b"".join(parts), dtype="<i2")

    inp = tmp_path / "in.pcm"
    outp = tmp_path / "out.pcm"
    sched = tmp_path / "sched.txt"
    inp.write_bytes(pcm.tobytes())
    sched.write_text("1000\n" + "1\n" * (n - 1000))
    import subprocess
    subprocess.run([str(oracle), "chunks", "1", "44100", "48000", "7",
                    str(inp), str(outp), str(sched)], check=True)
    want = np.fromfile(outp, dtype=np.int16)
    assert got.shape == want.shape, (got.shape, want.shape)
    assert_lsb_close(got, want)
