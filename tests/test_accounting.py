"""Capacity-bound consumed/produced accounting parity vs the reference.

When the caller's output capacity binds, the reference's process entry
points stop mid-call: fresh input is offered to the hot loop in xlen-frame
bites (resample.c:929-963), the staging (ystack) entry additionally slots
output through a 1024-sample stack buffer per iteration (resample.c:971-
1035), and the magic-sample drain interleaves differently in the two
shapes.  The consumed-input count is therefore bite/slot-quantized — and
because the JS wrapper drops unconsumed input (src/index.ts:92-116) this
quantization is part of the observable streaming behavior: one desynced
sample persists forever.  ph.process_accounting mirrors the loops exactly;
these tests pin it (consumed AND produced, per call) plus the produced
waveform against the compiled oracle through the ``caps`` command, whose
explicit per-call capacity schedule forces the bind at and around every
internal boundary.  Both numeric universes × both API entry points are
covered — the #ifdef FIXED_POINT name swap (resample.c:924-928/:965-969)
maps the int/float APIs onto the native/ystack shapes oppositely in the
two builds, so the 2×2 grid exercises all four loop shapes.
"""

import subprocess

import zlib

import numpy as np
import pytest

from speex_resampler_tpu.core.resampler import ResamplerCore

from conftest import assert_lsb_close


def _oracle_caps(oracle_bin, tmp, pcm, ch, ir, orr, q, use_float, sched,
                 switch=None):
    """Run `oracle caps`; returns [(consumed, produced, payload)] per call."""
    inp = tmp / "in.pcm"
    outp = tmp / "out.bin"
    sp = tmp / "sched.txt"
    np.ascontiguousarray(pcm, dtype="<i2").tofile(inp)
    sp.write_text("\n".join(f"{a} {b}" for a, b in sched))
    cmd = [str(oracle_bin), "caps", str(ch), str(ir), str(orr), str(q),
           str(int(use_float)), str(inp), str(outp), str(sp)]
    if switch is not None:
        cmd += [str(v) for v in switch]
    subprocess.run(cmd, check=True, capture_output=True)
    raw = outp.read_bytes()
    recs, pos = [], 0
    dt, width = ("<f4", 4) if use_float else ("<i2", 2)
    while pos < len(raw):
        consumed, produced = np.frombuffer(raw[pos:pos + 8], dtype="<u4")
        pos += 8
        n = int(produced) * ch * width
        recs.append((int(consumed), int(produced),
                     np.frombuffer(raw[pos:pos + n], dtype=dt).copy()))
        pos += n
    return recs


def _ours_caps(pcm, ch, ir, orr, q, use_float, sched, switch, fixed):
    """Mirror cmd_caps through ResamplerCore; same record shape."""
    core = ResamplerCore(ch, ir, orr, ir, orr, q, fixed_point=fixed)
    x = np.asarray(pcm, dtype=np.int16).reshape(-1, ch)
    recs, pos, si = [], 0, 0
    while pos < x.shape[0]:
        if switch is not None and si == switch[0]:
            core.set_rate(switch[1], switch[2])
            core.set_quality(switch[3])
        f, cap = sched[si % len(sched)]
        si += 1
        f = min(f, x.shape[0] - pos)
        chunk = x[pos:pos + f]
        if use_float:
            y = core.process_interleaved_float(
                chunk.astype(np.float32), cap)
        else:
            y = core.process_interleaved(chunk, cap)
        acct = core.last_accounting
        recs.append((acct.fresh_consumed, y.shape[0], y.reshape(-1)))
        pos += f
    return recs


def _compare(golden, ours, fixed, use_float, label=""):
    assert len(golden) == len(ours)
    for i, (g, o) in enumerate(zip(golden, ours)):
        where = f"{label} call {i}"
        assert o[0] == g[0], f"{where}: consumed {o[0]} vs C {g[0]}"
        assert o[1] == g[1], f"{where}: produced {o[1]} vs C {g[1]}"
    # waveform over the whole stream (per-call payloads are too short for
    # the float universe's tie-rate bound to be meaningful)
    g_all = np.concatenate([g[2] for g in golden])
    o_all = np.concatenate([o[2] for o in ours])
    if fixed:
        n_bad = int((o_all != g_all).sum())
        assert n_bad == 0, f"{label}: {n_bad} waveform mismatches"
    elif use_float:
        if len(g_all):
            assert np.abs(o_all - g_all).max() <= 0.1, label
    else:
        assert_lsb_close(o_all, g_all)


# Deterministic bind-forcing scenarios.  Caps are chosen to land below,
# at, and above the per-call producible count, around the 160-frame input
# bites and the 1024-sample ystack slot, with and without magic samples.
_CASES = [
    # (name, ch, ir, orr, q, n, sched, switch)
    ("up-bites", 1, 44100, 48000, 4, 12000,
     [(700, 50), (700, 10**6), (160, 0), (333, 170)], None),
    ("down-bites", 2, 48000, 8000, 7, 14000,
     [(1000, 20), (500, 0), (160, 7), (950, 10**6)], None),
    ("ystack-slot", 1, 8000, 96000, 3, 4000,
     [(160, 1100), (160, 30), (320, 2500), (90, 1024)], None),
    ("int-ratio-f64", 1, 16000, 48000, 10, 6000,
     [(480, 1441), (160, 479), (160, 481)], None),
    ("magic-grow", 1, 44100, 48000, 5, 9000,
     [(500, 600), (500, 25), (500, 3)], (3, 44100, 32000, 8)),
    # quality shrink: mem_alloc_size stays at the q9 high-water mark so
    # the post-switch bite EXCEEDS 160 frames (resample.c:709-720)
    ("magic-shrink-xlen", 1, 48000, 44100, 9, 9000,
     [(700, 100), (700, 12), (700, 10**6)], (2, 48000, 44100, 1)),
    # started gate: C flips ``started`` only inside process_native
    # (resample.c:886), which a capacity-0 call never reaches (the
    # while(ilen && olen) gates, :941/:989) — so a rate+quality switch
    # after only capacity-0 calls must ZERO the memory (resample.c:721-726)
    # instead of stashing magic samples from the never-started history.
    # Caught by differential fuzzing (seed 31): an eager started flag
    # produced 1 output from phantom magic with consumed=0 vs C's 4.
    ("unstarted-switch", 1, 98325, 16000, 9, 400,
     [(160, 0), (1024, 1), (1023, 173), (1023, 166), (161, 0)],
     (1, 96000, 22141, 10)),
]


@pytest.mark.parametrize("use_float", [False, True],
                         ids=["int-api", "float-api"])
@pytest.mark.parametrize("name,ch,ir,orr,q,n,sched,switch", _CASES)
def test_caps_accounting_float_universe(oracle, tmp_path, name, ch, ir,
                                        orr, q, n, sched, switch,
                                        use_float):
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    pcm = rng.integers(-32768, 32768, size=n * ch).astype(np.int16)
    golden = _oracle_caps(oracle, tmp_path, pcm, ch, ir, orr, q,
                          use_float, sched, switch)
    ours = _ours_caps(pcm, ch, ir, orr, q, use_float, sched, switch,
                      fixed=False)
    _compare(golden, ours, fixed=False, use_float=use_float, label=name)


@pytest.mark.parametrize("use_float", [False, True],
                         ids=["int-api", "float-api"])
@pytest.mark.parametrize("name,ch,ir,orr,q,n,sched,switch", _CASES)
def test_caps_accounting_fixed_universe(oracle_fixed, tmp_path, name, ch,
                                        ir, orr, q, n, sched, switch,
                                        use_float):
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    pcm = rng.integers(-32768, 32768, size=n * ch).astype(np.int16)
    golden = _oracle_caps(oracle_fixed, tmp_path, pcm, ch, ir, orr, q,
                          use_float, sched, switch)
    ours = _ours_caps(pcm, ch, ir, orr, q, use_float, sched, switch,
                      fixed=True)
    _compare(golden, ours, fixed=True, use_float=use_float, label=name)


@pytest.mark.parametrize("use_float,fixed", [(False, False), (True, False),
                                             (False, True), (True, True)],
                         ids=["int-float", "float-float", "int-fixed",
                              "float-fixed"])
def test_caps_accounting_random(oracle, oracle_fixed, tmp_path, use_float,
                                fixed):
    """Seeded random schedules with caps drawn to bind ~half the time."""
    rng = np.random.default_rng(0xACC7 + use_float * 2 + fixed)
    rates = [8000, 16000, 22050, 24000, 32000, 44100, 48000, 96000]
    for draw in range(4):
        ir = int(rng.choice(rates))
        orr = int(rng.choice([r for r in rates if r != ir]))
        q = int(rng.integers(0, 11))
        ch = int(rng.integers(1, 3))
        n = int(min(9000, 40000 * ir // orr + 500))
        sched = []
        for _ in range(int(rng.integers(2, 6))):
            f = int(rng.choice([1, 37, 160, 161, 320, 700,
                                int(rng.integers(1, 1500))]))
            expect = f * orr // ir
            cap = int(rng.choice([0, 1, max(0, expect - 40),
                                  expect, expect + 10, 10**6]))
            sched.append((max(f, 1), cap))
        switch = None
        if rng.random() < 0.5:
            switch = (int(rng.integers(1, 6)), ir,
                      int(rng.choice([r for r in rates if r != ir])),
                      int(rng.integers(0, 11)))
        pcm = rng.integers(-32768, 32768, size=n * ch).astype(np.int16)
        ob = oracle_fixed if fixed else oracle
        golden = _oracle_caps(ob, tmp_path, pcm, ch, ir, orr, q,
                              use_float, sched, switch)
        ours = _ours_caps(pcm, ch, ir, orr, q, use_float, sched, switch,
                          fixed=fixed)
        _compare(golden, ours, fixed=fixed, use_float=use_float,
                 label=f"draw{draw} {ir}->{orr} q{q} sched={sched} "
                       f"switch={switch}")


def test_oracle_rejected_switch_parity(oracle, tmp_path):
    """The reference can REJECT a mid-stream rate switch: rescaling
    samp_frac_num runs through multiply_frac's uint32 overflow guard
    (resample.c:593-603, applied at :1134), which fails when
    samp_frac_num > UINT32_MAX / new_reduced_den.  Parity means our
    set_rate must raise on exactly the same call (the JS wrapper would
    turn the non-zero return into a throw).  Found by differential
    fuzzing (seed 31): 44483->44100 q2, one 1704-frame chunk
    (samp_frac_num = 29870), then set_rate(98607, 163246) with reduced
    den 163246 > UINT32_MAX / 29870."""
    from speex_resampler_tpu.utils.errors import ResamplerError

    inp = tmp_path / "in.pcm"
    rng = np.random.default_rng(7)
    frames = rng.integers(-32768, 32768, size=(4000, 1)).astype(np.int16)
    frames.tofile(inp)
    p = subprocess.run(
        [str(oracle), "setrate", "1", "44483", "44100", "2", "1704",
         str(inp), str(tmp_path / "out.pcm"), "1", "98607", "163246", "2"],
        capture_output=True)
    assert p.returncode != 0 and b"set_rate failed" in p.stderr, (
        p.returncode, p.stderr)

    core = ResamplerCore(1, 44483, 44100, 44483, 44100, 2)
    core.process_interleaved(frames[:1704], 10**6)
    assert int(core.samp_frac_num[0]) == 29870  # pin the trigger state
    with pytest.raises(ResamplerError):
        core.set_rate(98607, 163246)
