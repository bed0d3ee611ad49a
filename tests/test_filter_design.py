"""Filter designer bit-parity vs the reference oracle (SURVEY.md §7 step 2:
tables must be byte-identical to the C core's)."""

import math

import numpy as np
import pytest

from speex_resampler_tpu.ops import filter_design as fd
from speex_resampler_tpu.ops import phase as ph

from conftest import oracle_tables

RATIOS = [(24000, 48000), (24000, 24000), (44100, 48000), (44100, 24000),
          (48000, 44100), (44100, 16000), (8000, 48000), (96000, 8000),
          (44100, 44101)]
QUALITIES = [0, 1, 3, 5, 7, 8, 9, 10]


@pytest.mark.parametrize("in_rate,out_rate", RATIOS)
@pytest.mark.parametrize("quality", QUALITIES)
def test_tables_bit_identical(oracle, in_rate, out_rate, quality):
    meta, table = oracle_tables(oracle, 1, in_rate, out_rate, quality)
    g = math.gcd(in_rate, out_rate)
    spec = fd.design_filter(in_rate // g, out_rate // g, quality)
    assert spec.num == meta["num"]
    assert spec.den == meta["den"]
    assert spec.filt_len == meta["filt_len"]
    assert spec.oversample == meta["oversample"]
    assert spec.use_direct == bool(meta["use_direct"])
    assert spec.int_advance == meta["int_advance"]
    assert spec.frac_advance == meta["frac_advance"]
    assert np.float32(spec.cutoff) == np.float32(meta["cutoff"])
    assert spec.input_latency == meta["in_latency"]
    assert spec.output_latency == meta["out_latency"]
    assert len(spec.sinc_table) == meta["table_len"]
    assert np.array_equal(spec.sinc_table, table), "sinc table not bit-equal"


def test_quality_validation():
    with pytest.raises(ValueError):
        fd.design_filter(1, 2, -1)
    with pytest.raises(ValueError):
        fd.design_filter(1, 2, 11)


def test_overflow_guard():
    with pytest.raises(fd.OverflowArgError):
        fd.design_filter(2**31, 1, 5)


def test_phase_closed_form_matches_recurrence():
    """The closed form must reproduce the reference's sequential advance
    recurrence (resample.c:372-378) exactly."""
    rng = np.random.default_rng(0)
    for num, den in [(147, 160), (1, 2), (1, 1), (147, 80), (160, 147),
                     (441, 80), (44100, 44101)]:
        f0 = int(rng.integers(0, den))
        ls0 = int(rng.integers(0, 5))
        ia, fa = num // den, num % den
        ls, f = ls0, f0
        for k in range(200):
            t = f0 + k * num
            assert ls == ls0 + t // den - (f0 // den)
            assert f == t % den
            ls += ia
            f += fa
            if f >= den:
                f -= den
                ls += 1


def test_producible_and_advance():
    for num, den in [(147, 160), (1, 2), (147, 80)]:
        for n_new in [0, 1, 7, 160, 882]:
            for ls0 in [0, 3]:
                for f0 in [0, den - 1]:
                    n = ph.producible_outputs(n_new, ls0, f0, num, den)
                    # brute-force count
                    cnt = 0
                    while ls0 + (f0 + cnt * num) // den < n_new:
                        cnt += 1
                    assert n == cnt, (num, den, n_new, ls0, f0, n, cnt)
                    ls_a, f_a = ph.advance(n, ls0, f0, num, den)
                    assert ls_a == ls0 + (f0 + n * num) // den
                    assert f_a == (f0 + n * num) % den


def test_lazy_tables_huge_den():
    """Huge-den interpolated specs must never materialize the full
    [den, filt_len] collapsed table (the C reference interpolates on the
    fly, resample.c:438-559; our gather serving path needs only the rows
    of the phases in flight).  Bit-exactness of the lazily-computed rows
    is pinned end-to-end by the den>=65537 oracle runs in
    test_fuzz_configs.py; here we pin laziness itself plus the
    dedup/inverse bookkeeping of the accessors."""
    for fx in (False, True):
        spec = fd.design_filter(44100, 65537, 7, fixed_point=fx)
        assert not spec.use_direct
        assert spec.den * spec.filt_len > fd._LAZY_TABLE_ENTRIES
        phases = np.array([0, 1, 7, 65536, 32768, 7, 12345], dtype=np.int64)
        if fx:
            t, c = spec.interp_rows(phases)
            assert spec._interp_taps is None, "rows forced the full tensors"
            assert t.shape == (7, 4, spec.filt_len) and c.shape == (7, 4)
            assert np.array_equal(t[2], t[5]) and np.array_equal(c[2], c[5])
            t7, c7 = fd.fixed_interp_rows(spec.sinc_table, spec.filt_len,
                                          spec.oversample, spec.den,
                                          np.array([7]))
            assert np.array_equal(t[2], t7[0])
            assert np.array_equal(c[2], c7[0])
        else:
            r = spec.phase_rows(phases)
            assert spec._phase_table is None, "rows forced the full table"
            assert r.shape == (7, spec.filt_len)
            assert np.array_equal(r[2], r[5])
            r7 = fd.effective_phase_rows(spec.sinc_table, spec.filt_len,
                                         spec.oversample, spec.den,
                                         np.array([7]))
            assert np.array_equal(r[2], r7[0])


def test_lazy_rows_match_full_table_above_cutover(monkeypatch):
    """Lazily-computed rows must be bit-identical to slicing the eagerly
    built table.  The cutover is monkeypatched to 0 so a small (cheap)
    config exercises the lazy branch; the real huge-den regime is pinned
    end-to-end vs the C oracle in test_fuzz_configs.py."""
    monkeypatch.setattr(fd, "_LAZY_TABLE_ENTRIES", 0)
    for fx in (False, True):
        # fresh ratio so the lru_cached spec carries no materialized cache
        # from other tests (materialization would bypass the lazy branch)
        spec = fd.design_filter(149, 163, 5, fixed_point=fx)
        assert not spec.use_direct
        phases = np.array([0, 1, 162, 81, 1, 37], dtype=np.int64)
        if fx:
            assert spec._interp_taps is None
            t, c = spec.interp_rows(phases)
            full_t, full_c = fd.fixed_interp_tensors(
                spec.sinc_table, spec.filt_len, spec.oversample, spec.den)
            assert np.array_equal(t, full_t[phases])
            assert np.array_equal(c, full_c[phases])
        else:
            assert spec._phase_table is None
            rows = spec.phase_rows(phases)
            full = fd.effective_phase_table(spec.sinc_table, spec.filt_len,
                                            spec.oversample, spec.den)
            assert np.array_equal(rows, full[phases])


def test_lazy_tables_small_den_materialize_once():
    """Below the cutover the accessors materialize-and-cache (dense paths
    want the whole table anyway) and return identical rows."""
    spec = fd.design_filter(147, 160, 5)
    phases = np.array([0, 159, 80, 80], dtype=np.int64)
    r = spec.phase_rows(phases)
    assert spec._phase_table is not None
    assert np.array_equal(r, spec.phase_table[phases])


def test_padded_weights_layout():
    spec = fd.design_filter(147, 160, 7)
    for group in (1, 2):
        W = ph.build_padded_weights(spec.phase_table, 147, 160, f0=3,
                                    group=group)
        R = group * 160
        assert W.shape == (spec.filt_len + group * 147, R)
        bc = ph.block_constants(147, 160, 3, group)
        for r in [0, 1, R // 2, R - 1]:
            col = W[:, r]
            o, p = int(bc.o[r]), int(bc.p[r])
            assert np.array_equal(col[o:o + spec.filt_len],
                                  spec.phase_table[p])
            assert not col[:o].any()
            assert not col[o + spec.filt_len:].any()
