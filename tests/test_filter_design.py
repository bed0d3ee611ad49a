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
