"""Extended differential fuzzing (runs in the default suite — the whole
file is under a minute on the host paths).

Covers the surfaces the quick fuzz (test_fuzz_configs.py) does not:
  - arbitrary cyclic chunk schedules (oracle `chunks` command) incl. the
    JS retained-capacity drop behavior under ragged chunking
  - mid-stream set_rate + set_quality at random chunk indices (oracle
    `setrate` command; magic-sample migration both directions)
  - both numeric universes: float <=1 LSB, fixed ZERO mismatches
"""

import subprocess

import numpy as np
import pytest

from speex_resampler_tpu.core.resampler import ResamplerCore

from conftest import assert_lsb_close

_RATES = [8000, 11025, 16000, 22050, 24000, 32000, 44100, 48000, 88200,
          96000]


def _draw(seed, n):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ir, orr = (int(v) for v in rng.choice(_RATES, 2, replace=False))
        q = int(rng.integers(0, 11))
        ch = int(rng.integers(1, 3))
        out.append((ir, orr, q, ch, int(rng.integers(0, 2 ** 31))))
    return out


def _sched(rng, k=5):
    return [int(rng.integers(37, 1800)) for _ in range(k)]


@pytest.mark.parametrize("fixed", [False, True])
@pytest.mark.parametrize("ir,orr,q,ch,sub", _draw(31337, 30))
def test_fuzz_chunk_schedules(oracle, oracle_fixed, tmp_path, ir, orr, q,
                              ch, sub, fixed):
    """Ragged cyclic chunk schedules vs the oracle `chunks` command."""
    rng = np.random.default_rng(sub)
    n = min(int(0.5 * ir), 24000)
    frames = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    sched = _sched(rng)
    inp, outp = tmp_path / "i.pcm", tmp_path / "o.pcm"
    schedp = tmp_path / "s.txt"
    inp.write_bytes(frames.tobytes())
    schedp.write_text(" ".join(map(str, sched)))
    ob = oracle_fixed if fixed else oracle
    subprocess.run([str(ob), "chunks", str(ch), str(ir), str(orr), str(q),
                    str(inp), str(outp), str(schedp)], check=True)
    golden = np.fromfile(outp, dtype=np.int16)

    core = ResamplerCore(ch, ir, orr, ir, orr, q, fixed_point=fixed)
    outs, cap_bytes, pos, si = [], 0, 0, 0
    while pos < n:
        take = min(sched[si % len(sched)], n - pos)
        si += 1
        fr = frames[pos:pos + take]
        pos += take
        cap_bytes = max(cap_bytes, (take * ch * 2 * orr + ir - 1) // ir)
        outs.append(core.process_interleaved(fr, cap_bytes // ch // 2))
    ours = np.concatenate(outs).reshape(-1)
    assert ours.size == golden.size
    if fixed:
        assert np.array_equal(ours, golden)
    else:
        assert_lsb_close(ours, golden)


@pytest.mark.parametrize("fixed", [False, True])
@pytest.mark.parametrize("seed", range(12))
def test_fuzz_midstream_setrate(oracle, oracle_fixed, tmp_path, seed,
                                fixed):
    """Random mid-stream set_rate+set_quality vs the oracle `setrate`
    scenario (magic-sample migration, both grow and shrink)."""
    rng = np.random.default_rng(1000 + seed)
    ir0, or0 = (int(v) for v in rng.choice(_RATES, 2, replace=False))
    ir1, or1 = (int(v) for v in rng.choice(_RATES, 2, replace=False))
    q0, q1 = int(rng.integers(0, 11)), int(rng.integers(0, 11))
    ch = int(rng.integers(1, 3))
    chunk = int(rng.integers(200, 1500))
    n = min(int(0.5 * ir0), 20000)
    switch = int(rng.integers(1, max(2, n // chunk)))
    frames = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)

    inp, outp = tmp_path / "i.pcm", tmp_path / "o.pcm"
    inp.write_bytes(frames.tobytes())
    ob = oracle_fixed if fixed else oracle
    subprocess.run([str(ob), "setrate", str(ch), str(ir0), str(or0),
                    str(q0), str(chunk), str(inp), str(outp), str(switch),
                    str(ir1), str(or1), str(q1)], check=True)
    raw = outp.read_bytes()
    counts, outs, pos = [], [], 0
    while pos < len(raw):
        cnt = int(np.frombuffer(raw[pos:pos + 4], dtype=np.uint32)[0])
        pos += 4
        outs.append(np.frombuffer(raw[pos:pos + cnt * ch * 2],
                                  dtype=np.int16))
        pos += cnt * ch * 2
        counts.append(cnt)
    golden = np.concatenate(outs) if outs else np.zeros(0, np.int16)

    core = ResamplerCore(ch, ir0, or0, ir0, or0, q0, fixed_point=fixed)
    got, cur = [], (ir0, or0)
    for idx, p in enumerate(range(0, n, chunk)):
        if idx == switch:
            core.set_rate(ir1, or1)
            core.set_quality(q1)
            cur = (ir1, or1)
        fr = frames[p:p + chunk]
        cap = ((len(fr) * ch * 2 * cur[1] + cur[0] - 1) // cur[0]
               // ch // 2 + 64)
        y = core.process_interleaved(fr, cap)
        assert len(y) == counts[idx], (idx, len(y), counts[idx])
        got.append(y.reshape(-1))
    ours = np.concatenate(got)
    if fixed:
        assert np.array_equal(ours, golden)
    else:
        assert_lsb_close(ours, golden)
